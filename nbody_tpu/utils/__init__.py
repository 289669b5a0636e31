from nbody_tpu.utils.timing import sync

__all__ = ["sync"]
