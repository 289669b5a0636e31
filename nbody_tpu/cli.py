"""Command-line driver.

Same flag surface and defaults as the reference CLI (src/arguments.h:23-156,
src/main.cpp:67-74): -n, -s, --theta, --precision, --algorithm, --workload,
--print-state, --print-info, --save, --csv-detailed, --csv-total, --help.
Dimension is a runtime flag here (-d/--dim, default 2) instead of the
reference's compile-time -DDIM_SIZE; jit specialization plays the role of
template instantiation.

TPU-native extensions: --kernel (pallas|jnp|auto force backend), --mesh
(shard bodies over N devices), --chunk, --fix-collapsed-z, --sort-every,
--save-state/--load-state (symmetric checkpointing).
"""

from __future__ import annotations

import sys

from nbody_tpu.config import SimConfig, precision_dtype

_HELP = """Help:
-n size\t\tNumber of particles to simulate
-s steps\t\tNumber of steps to run simulation for
-d|--dim 2|3\t\tSpatial dimension (default 2)
--theta t\t\tTheta threshold parameter to use in Octree
--precision double|float(default)\t\tSelects floating-point precision
--algorithm all-pairs|all-pairs-collapsed|bvh|octree(default)\t\tSelects simulation algorithm
--workload plummer|galaxy|uniform(default)|load <file.bin>\t\tSelects workload
--print-state\t\tPrint the initial and final state of the simulation
--print-info\t\tPrint info every timestep
--save pos|energy|all|none(default) \t\tSelects what data to save every timestep
--csv-detailed\t\tPer-phase timing CSV, saves every step
--csv-total\t\tSingle-row timing CSV (excludes printing/saving)
--kernel auto|pallas|jnp\t\tForce-kernel backend (default auto)
--platform auto|cpu|tpu\t\tJAX backend (default auto; env NBODY_TPU_PLATFORM)
--mesh N\t\tShard bodies across N devices (default 1)
--mesh-layout L\treplicated (default) | partitioned (octree/bvh: sharded
\t\tbodies + distributed sort, O(n/S) per device)
--mesh-tile T\t\tPartitioned 2-D mesh: T tile-axis shards per body shard
\t\t(mesh x T devices total; row-shards the force evaluation)
--chunk N\t\tRow-chunk size for the jnp fallback kernels
--fix-collapsed-z\t\tFix the reference's frozen-z quirk in all-pairs-collapsed
--sort-every K\t\tRe-sort bodies every K steps in tree engines (default 1)
--traversal group|per-body\t\tTree traversal strategy (default group)
--group-tile N\t\tBodies per tile in group traversal (default 512)
--refine-levels N\t\tBVH residual refinement depth (default auto)
--window-tiles N\t\tBVH near-field window width in tiles (default 32)
--save-state file.bin\t\tWrite final state in the loadable format
--profile DIR\t\tCapture a jax.profiler trace of the run into DIR
--help\t\tDisplay this help message and quit
"""


def parse_args(argv: list[str]) -> dict:
    """Hand-rolled flag loop mirroring parse_args (arguments.h:40-156);
    raises SystemExit on unknown flags exactly like the reference."""
    args = {
        "size": 1000,
        "steps": 1,
        "warmup_steps": 10,
        "dim": 2,
        "precision": "float",
        "workload": "uniform",
        "algorithm": "octree",
        "theta": 0.5,
        "print_state": False,
        "print_info": False,
        "save_pos": False,
        "save_energy": False,
        "csv_detailed": False,
        "csv_total": False,
        "load_input": None,
        # TPU extensions
        "platform": None,
        "kernel": "auto",
        "mesh": 1,
        "mesh_layout": "replicated",
        "mesh_tile": 1,
        "chunk": 2048,
        "fix_z": False,
        "sort_every": 1,
        "traversal": "group",
        "group_tile": 512,
        "refine": -1,
        "window_tiles": 32,
        "save_state": None,
        "profile": None,
    }
    i = 0
    while i < len(argv):
        flag = argv[i]
        if flag == "-n":
            i += 1
            args["size"] = int(argv[i])
        elif flag == "-s":
            i += 1
            args["steps"] = int(argv[i])
        elif flag in ("-d", "--dim"):
            i += 1
            args["dim"] = int(argv[i])
        elif flag == "--theta":
            i += 1
            args["theta"] = float(argv[i])
        elif flag == "--csv-detailed":
            args["csv_detailed"] = True
        elif flag == "--csv-total":
            args["csv_total"] = True
        elif flag == "--precision":
            i += 1
            if argv[i] not in ("float", "double"):
                print(f'Unknown precision: "{argv[i]}".', file=sys.stderr)
                print("Options are: double, float (default).", file=sys.stderr)
                raise SystemExit(1)
            args["precision"] = argv[i]
        elif flag == "--algorithm":
            i += 1
            if argv[i] not in ("all-pairs", "all-pairs-collapsed", "octree", "bvh"):
                print(f'Unknown algorithm: "{argv[i]}".', file=sys.stderr)
                print(
                    "Options are: all-pairs, all-pairs-collapsed, bvh, octree (default).",
                    file=sys.stderr,
                )
                raise SystemExit(1)
            args["algorithm"] = argv[i]
        elif flag == "--workload":
            i += 1
            if argv[i] == "load":
                i += 1
                args["load_input"] = argv[i]
                args["workload"] = "load"
            elif argv[i] in ("plummer", "galaxy", "uniform"):
                args["workload"] = argv[i]
            else:
                print(f'Unknown workload: "{argv[i]}".', file=sys.stderr)
                print("Options are: plummer, galaxy, uniform (default).", file=sys.stderr)
                raise SystemExit(1)
        elif flag == "--print-state":
            args["print_state"] = True
        elif flag == "--print-info":
            args["print_info"] = True
        elif flag == "--save":
            i += 1
            if argv[i] == "pos":
                args["save_pos"] = True
            elif argv[i] == "energy":
                args["save_energy"] = True
            elif argv[i] == "all":
                args["save_pos"] = True
                args["save_energy"] = True
            elif argv[i] == "none":
                args["save_pos"] = False
                args["save_energy"] = False
            else:
                print(f'Unknown save options: "{argv[i]}".', file=sys.stderr)
                print("Options are: pos, energy, all, none (default).", file=sys.stderr)
                raise SystemExit(1)
        elif flag == "--kernel":
            i += 1
            args["kernel"] = argv[i]
        elif flag == "--platform":
            i += 1
            if argv[i] not in ("auto", "cpu", "tpu"):
                print(f'Unknown platform: "{argv[i]}".', file=sys.stderr)
                print("Options are: auto (default), cpu, tpu.", file=sys.stderr)
                raise SystemExit(1)
            args["platform"] = argv[i]
        elif flag == "--mesh":
            i += 1
            args["mesh"] = int(argv[i])
        elif flag == "--mesh-layout":
            i += 1
            if argv[i] not in ("replicated", "partitioned"):
                print(f'Unknown mesh layout: "{argv[i]}".', file=sys.stderr)
                print("Options are: replicated (default), partitioned.",
                      file=sys.stderr)
                raise SystemExit(1)
            args["mesh_layout"] = argv[i]
        elif flag == "--mesh-tile":
            i += 1
            args["mesh_tile"] = int(argv[i])
        elif flag == "--chunk":
            i += 1
            args["chunk"] = int(argv[i])
        elif flag == "--fix-collapsed-z":
            args["fix_z"] = True
        elif flag == "--sort-every":
            i += 1
            args["sort_every"] = int(argv[i])
        elif flag == "--traversal":
            i += 1
            if argv[i] not in ("group", "per-body"):
                print(f'Unknown traversal: "{argv[i]}".', file=sys.stderr)
                print("Options are: group (default), per-body.", file=sys.stderr)
                raise SystemExit(1)
            args["traversal"] = argv[i]
        elif flag == "--group-tile":
            i += 1
            args["group_tile"] = int(argv[i])
        elif flag == "--refine-levels":
            i += 1
            args["refine"] = int(argv[i])
        elif flag == "--window-tiles":
            i += 1
            args["window_tiles"] = int(argv[i])
        elif flag == "--save-state":
            i += 1
            args["save_state"] = argv[i]
        elif flag == "--profile":
            i += 1
            args["profile"] = argv[i]
        elif flag in ("--help", "-h"):
            print(_HELP, end="")
            raise SystemExit(0)
        else:
            print(f"Unknown argument: '{flag}'")
            raise SystemExit(1)
        i += 1

    if args["csv_detailed"] and args["csv_total"]:
        print(
            "Cannot capture a CSV detailed and coarse trace in the same run. "
            "Specify one or the other.",
            file=sys.stderr,
        )
        raise SystemExit(1)
    return args


def main(argv: list[str] | None = None, out=None) -> int:
    if argv is None:
        argv = sys.argv[1:]
    args = parse_args(list(argv))

    # Backend selection must precede any jax backend use (this jax build
    # ignores the JAX_PLATFORMS env var; only jax.config works, and only
    # before first backend init -- see CLAUDE.md).  The NBODY_TPU_PLATFORM
    # env var is read by us, not jax, so it works where JAX_PLATFORMS
    # doesn't.
    import os

    platform = args["platform"] or os.environ.get("NBODY_TPU_PLATFORM")
    if platform and platform != "auto":
        import jax

        jax.config.update("jax_platforms", platform)
        if platform == "cpu" and args["mesh"] * args["mesh_tile"] > 1:
            # --mesh on the CPU backend: provision enough virtual devices
            jax.config.update("jax_num_cpu_devices",
                              int(args["mesh"] * args["mesh_tile"]))

    if args["precision"] == "double":
        import jax

        jax.config.update("jax_enable_x64", True)

    from nbody_tpu.models import build_model
    from nbody_tpu.sim.engines import EngineOptions
    from nbody_tpu.sim.runner import RunOptions, run_simulation

    dtype = precision_dtype(args["precision"])
    cfg, state = build_model(
        args["workload"], args["size"], args["dim"], dtype, args["load_input"]
    )
    cfg = cfg.replace(theta=args["theta"])

    opts = RunOptions(
        steps=args["steps"],
        warmup_steps=args["warmup_steps"],
        print_state=args["print_state"],
        print_info=args["print_info"],
        save_pos=args["save_pos"],
        save_energy=args["save_energy"],
        csv_detailed=args["csv_detailed"],
        csv_total=args["csv_total"],
        engine_opts=EngineOptions(
            kernel=args["kernel"],
            chunk=args["chunk"],
            fix_z=args["fix_z"],
            mesh=args["mesh"],
            mesh_layout=args["mesh_layout"],
            mesh_tile=args["mesh_tile"],
            sort_every=args["sort_every"],
            traversal=args["traversal"],
            group_tile=args["group_tile"],
            refine=args["refine"],
            window_tiles=args["window_tiles"],
        ),
        out=out,
    )
    if args["profile"]:
        # TPU-native analog of the reference's nsys/ncu wrappers
        # (ci/run:167-172): capture an XLA trace viewable in TensorBoard /
        # Perfetto.
        import jax

        with jax.profiler.trace(args["profile"]):
            state = run_simulation(args["algorithm"], cfg, state, opts)
    else:
        state = run_simulation(args["algorithm"], cfg, state, opts)
    if args["save_state"]:
        from nbody_tpu.io.saving import save_system

        save_system(args["save_state"], state, cfg)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
