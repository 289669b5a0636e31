#!/usr/bin/env python
"""Trajectory animation / energy plotting for tpu-nbody output.

Reads the same binary formats as the reference tools (positions.bin:
u32{nbodies,nsteps,itemsize,dim} header then per-frame raw positions;
energy.bin: u32{nsteps,itemsize} then (KE,PE) pairs -- src/saving.h:85-122),
so it renders files produced by either implementation, and the reference's
plotter renders ours.

The rendering itself is structured around a small declarative layer: a
view is a list of Series (index subset + style) drawn frame-by-frame with
FuncAnimation scatter updates.  The galaxy view keeps the reference
tool's visual fixture -- bodies split into two halves, the first body of
each half highlighted as the central mass, halves colored red/blue, every
10th frame -- without reproducing its drawing mechanics.

Usage:
  plotter.py pos (--galaxy | --general) (--gif | --mp4)
             [--file positions.bin] [--out NAME] [--every K] [--fps F]
  plotter.py energy [--file energy.bin] [--out energy.png]
"""

from __future__ import annotations

import argparse
import dataclasses

import numpy as np


def read_points(file_name: str = "positions.bin") -> np.ndarray:
    """Frames of positions, shape (frames, dim, nbodies). The header's
    nsteps field caps the frame count (the writer emits one extra initial
    frame; like the reference we read exactly nsteps)."""
    header = np.fromfile(file_name, dtype=np.uint32, count=4)
    nbodies, nsteps, itemsize, dim = (int(v) for v in header)
    dtype = {4: np.float32, 8: np.float64}[itemsize]
    raw = np.memmap(file_name, dtype, "r", offset=16)
    nframes = min(nsteps, raw.size // (nbodies * dim))
    data = raw[: nframes * nbodies * dim].reshape(nframes, nbodies, dim)
    return np.transpose(data, (0, 2, 1))


def read_energy(file_name: str = "energy.bin") -> np.ndarray:
    """(2, frames) array of (KE, PE) series."""
    header = np.fromfile(file_name, dtype=np.uint32, count=2)
    nsteps, itemsize = (int(v) for v in header)
    dtype = {4: np.float32, 8: np.float64}[itemsize]
    raw = np.memmap(file_name, dtype, "r", offset=8)
    nframes = min(nsteps, raw.size // 2)
    return raw[: nframes * 2].reshape(nframes, 2).T


def _writer(mp4: bool, fps: float):
    import matplotlib.animation as animation

    meta = {"title": "n-body simulation", "comment": "Made with tpu-nbody"}
    if mp4:
        return animation.FFMpegWriter(fps=fps, metadata=meta), ".mp4"
    return animation.PillowWriter(fps=fps, metadata=meta), ".gif"


@dataclasses.dataclass
class Series:
    """One scatter layer: a body-index subset with a fixed style."""
    idx: np.ndarray       # body indices drawn by this layer
    color: str
    size: float           # marker area (pt^2)


def galaxy_series(nbodies: int) -> list[Series]:
    """The two-galaxy fixture: halves in red/blue, the first body of each
    half (the central mass, models.h:81-96) as a full-size marker."""
    half = nbodies // 2
    orbiters = 1.0
    central = 36.0
    return [
        Series(np.arange(1, half), "red", orbiters),
        Series(np.arange(half + 1, nbodies), "blue", orbiters),
        Series(np.array([0]), "red", central),
        Series(np.array([half]), "blue", central),
    ]


def general_series(nbodies: int) -> list[Series]:
    return [Series(np.arange(nbodies), "blue", 1.0)]


def _frame_axes(fig, dim: int, lo, hi):
    """Borderless square axes; 3-D gets an unlabeled cube."""
    if dim == 3:
        ax = fig.add_subplot(projection="3d")
        ax.set_zlim(lo[2], hi[2])
        for axis in (ax.xaxis, ax.yaxis, ax.zaxis):
            axis.set_ticklabels([])
    else:
        ax = fig.add_subplot()
        ax.set_axis_off()
    fig.subplots_adjust(left=0, right=1, top=1, bottom=0)
    ax.set_xlim(lo[0], hi[0])
    ax.set_ylim(lo[1], hi[1])
    return ax


def render_animation(data: np.ndarray, series: list[Series], lo, hi,
                     every: int = 1, interval_ms: int = 100):
    """FuncAnimation over frame strides: scatters are created once and
    repositioned per frame (set_offsets / _offsets3d), rather than
    pre-drawing an artist list per frame."""
    import matplotlib.pyplot as plt
    from matplotlib import animation

    frames = data[::every]
    dim = data.shape[1]
    fig = plt.figure(figsize=(6, 6))
    ax = _frame_axes(fig, dim, lo, hi)

    layers = [
        ax.scatter(*frames[0][:, s.idx], s=s.size, color=s.color, marker="o")
        for s in series
    ]

    def update(k):
        pts = frames[k]
        for art, s in zip(layers, series):
            sub = pts[:, s.idx]
            if dim == 3:
                art._offsets3d = (sub[0], sub[1], sub[2])
            else:
                art.set_offsets(sub.T)
        return layers

    return animation.FuncAnimation(
        fig, update, frames=len(frames), interval=interval_ms, blit=dim == 2
    )


def animate_galaxy(file_name: str, every: int = 10):
    data = read_points(file_name)
    dim = data.shape[1]
    extent = 500.0 / (3.0 if dim == 3 else 1.0)
    lo, hi = [-extent] * dim, [extent] * dim
    return render_animation(data, galaxy_series(data.shape[2]), lo, hi,
                            every=every)


def animate_general(file_name: str, every: int = 1):
    data = read_points(file_name)
    dim = data.shape[1]
    if dim not in (2, 3):
        raise ValueError("Can only support 2 or 3 dimensions in general plot")
    lo = data.min(axis=(0, 2))
    hi = data.max(axis=(0, 2))
    return render_animation(data, general_series(data.shape[2]), lo, hi,
                            every=every)


def plot_energy(file_name: str, out: str | None):
    import matplotlib.pyplot as plt

    ke, pe = read_energy(file_name)
    steps = np.arange(ke.size)
    fig, ax = plt.subplots()
    for values, label in ((ke, "Kinetic"), (pe, "Gravitational"),
                          (ke + pe, "Total")):
        ax.plot(steps, values, label=label)
    ax.set(xlabel="Timestep", ylabel="Energy",
           title="Energy by Time in n-body simulation")
    ax.grid(True)
    ax.legend()
    if out:
        fig.savefig(out, dpi=120)
        print(f"Saved {out}")
    else:
        plt.show()


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="Create animation from nbody output.")
    sub = parser.add_subparsers(dest="command")

    p_pos = sub.add_parser("pos", help="Animate positions")
    g = p_pos.add_mutually_exclusive_group(required=True)
    g.add_argument("--galaxy", action="store_true")
    g.add_argument("--general", action="store_true")
    f = p_pos.add_mutually_exclusive_group(required=True)
    f.add_argument("--mp4", action="store_true")
    f.add_argument("--gif", action="store_true")
    p_pos.add_argument("--file", default="positions.bin")
    p_pos.add_argument("--out", default="nbody_animation")
    p_pos.add_argument("--every", type=int, default=None,
                       help="frame stride (default: 10 galaxy, 1 general)")
    p_pos.add_argument("--fps", type=float, default=10.0)

    p_e = sub.add_parser("energy", help="Plot energy")
    p_e.add_argument("--file", default="energy.bin")
    p_e.add_argument("--out", default=None)

    args = parser.parse_args(argv)
    if args.command == "pos":
        if args.galaxy:
            ani = animate_galaxy(args.file, every=args.every or 10)
        else:
            ani = animate_general(args.file, every=args.every or 1)
        writer, ext = _writer(args.mp4, fps=args.fps)
        name = args.out + ext
        print(f"Saving animation to {name} ...")
        ani.save(name, writer=writer, savefig_kwargs={"pad_inches": 0})
    elif args.command == "energy":
        plot_energy(args.file, args.out)
    else:
        print("No plot selected")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
