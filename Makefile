# Convenience targets (the reference's Makefile builds binaries; here the
# "build" is the optional native library, everything else is Python).

.PHONY: all native test test-full test-fast bench bench-matrix nasa smoke clean

all: native

native:
	python native/build.py

# default suite skips slow per-body-traversal oracles + big overflow sweeps
# (~7 min on this box);
# test-full runs everything (CI-full mode)
test:
	python -m pytest tests/ -q -m "not slow"

test-full:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow" -k "not tooling and not sharding"

# post-run visual smoke test (the ci/run:186-189 GIF render analog)
smoke:
	python -m nbody_tpu.cli -n 256 -s 20 --workload galaxy --algorithm bvh \
	  --csv-detailed --save pos
	python scripts/plotter.py pos --galaxy --gif --every 2 --out smoke_animation
	@ls -la smoke_animation.gif

bench:
	python bench.py

# ci/thuering analog: synthetic SBDB dataset, octree vs all-pairs vs the
# g++-built reference binary, L1 final positions (docs/NASA_VALIDATION.md)
nasa:
	NBODY_TPU_PLATFORM=cpu python scripts/nasa.py --synthetic 20000 \
	  --steps 25 --workdir nasa_work

bench-matrix:
	python scripts/benchmark.py --quick --out benchmark_results.csv

clean:
	rm -f native/libnbody_native.so positions.bin energy.bin
