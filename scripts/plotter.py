#!/usr/bin/env python
"""Trajectory animation / energy plotting for tpu-nbody output.

Capability-equivalent rewrite of the reference's scripts/plotter.py against
the same binary formats (positions.bin: u32{nbodies,nsteps,itemsize,dim}
header then per-frame raw positions; energy.bin: u32{nsteps,itemsize} then
(KE,PE) pairs -- src/saving.h:85-122). Because the formats are
byte-compatible, this tool also reads files produced by the reference
binary, and the reference's plotter reads ours.

Usage:
  plotter.py pos (--galaxy | --general) (--gif | --mp4) [--file positions.bin]
  plotter.py energy [--file energy.bin] [--out energy.png]
"""

from __future__ import annotations

import argparse

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


def animate_galaxy(file_name: str):
    """Two-galaxy view: bodies split into halves, first body of each half is
    the central mass, every 10th frame, red/blue scatter."""
    import matplotlib.pyplot as plt

    data = read_points(file_name)
    d3 = data.shape[1] == 3
    size = 500 / (3 if d3 else 1)

    fig = plt.figure(figsize=(6, 6))
    if d3:
        ax = fig.add_subplot(projection="3d")
        ax.set_zlim([-size, size])
        ax.set_xticklabels([])
        ax.set_yticklabels([])
        ax.set_zticklabels([])
    else:
        ax = fig.add_subplot()
        ax.set_axis_off()
        fig.tight_layout()
    fig.subplots_adjust(left=0, right=1, top=1, bottom=0)
    ax.set_xlim([-size, size])
    ax.set_ylim([-size, size])

    import matplotlib.animation as animation

    artists = []
    for frame in data[::10]:
        n = frame.shape[-1]
        half1, half2 = frame[:, : n // 2], frame[:, n // 2 :]
        c1, orb1 = half1[:, 0], half1[:, 1:]
        c2, orb2 = half2[:, 0], half2[:, 1:]
        artists.append(
            [
                ax.scatter(*orb1, marker="o", animated=True, color="red", s=1),
                ax.scatter(*orb2, marker="o", animated=True, color="blue", s=1),
                ax.scatter(*c1, animated=True, color="red"),
                ax.scatter(*c2, animated=True, color="blue"),
            ]
        )
    return animation.ArtistAnimation(
        fig=fig, artists=artists, interval=100, blit=True, repeat_delay=1000
    )


def animate_general(file_name: str):
    import matplotlib.pyplot as plt
    import matplotlib.animation as animation

    data = read_points(file_name)
    dim = data.shape[1]
    if dim not in (2, 3):
        raise ValueError("Can only support 2 or 3 dimensions in general plot")
    hi = data.max(axis=0).max(axis=1)
    lo = data.min(axis=0).min(axis=1)

    fig = plt.figure(figsize=(6, 6))
    if dim == 3:
        ax = fig.add_subplot(projection="3d")
        ax.set_zlim([lo[2], hi[2]])
        ax.set_xticklabels([])
        ax.set_yticklabels([])
        ax.set_zticklabels([])
    else:
        ax = fig.add_subplot()
        ax.set_axis_off()
        fig.tight_layout()
    fig.subplots_adjust(left=0, right=1, top=1, bottom=0)
    ax.set_xlim([lo[0], hi[0]])
    ax.set_ylim([lo[1], hi[1]])

    artists = [
        [ax.scatter(*frame, marker="o", animated=True, s=1, color="blue")]
        for frame in data
    ]
    return animation.ArtistAnimation(
        fig=fig, artists=artists, interval=100, blit=True, repeat_delay=1000
    )


def plot_energy(file_name: str, out: str | None):
    import matplotlib.pyplot as plt

    e = read_energy(file_name)
    plt.plot(e[0], label="Kinetic")
    plt.plot(e[1], label="Gravitational")
    plt.plot(e[0] + e[1], label="Total")
    plt.xlabel("Timestep")
    plt.ylabel("Energy")
    plt.title("Energy by Time in n-body simulation")
    plt.legend()
    plt.grid(True)
    if out:
        plt.savefig(out, dpi=120)
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

    p_e = sub.add_parser("energy", help="Plot energy")
    p_e.add_argument("--file", default="energy.bin")
    p_e.add_argument("--out", default=None)

    args = parser.parse_args(argv)
    if args.command == "pos":
        ani = animate_galaxy(args.file) if args.galaxy else animate_general(args.file)
        writer, ext = _writer(args.mp4, fps=1000 / ani.event_source.interval)
        name = "nbody_animation" + ext
        print(f"Saving animation to {name} ...")
        ani.save(name, writer=writer, savefig_kwargs={"pad_inches": 0})
    elif args.command == "energy":
        plot_energy(args.file, args.out)
    else:
        print("No plot selected")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
