"""Experiment launcher: queue N repeat runs of experiment files,
optionally sweeping a parameter grid.

Capability parity with the reference runners
(reference: deepards/scripts/main/run_non_pretraining_experiments.py:17-39,
which queued runs through the `ts` task spooler and split them across
GPUs via --cuda-devices 0+1; and the ~20 shell grids under
scripts/exploratory/ and scripts/main/, whose nested for-loops sweep
network/base-network/batch-size combos).  ``--grid`` reproduces those
sweeps declaratively:

  python -m deepards_tpu.cli.run_experiments exp.yml -n 1 \
      --grid base-network=resnet18,senet18,densenet18 batch-size=16,32,64

TPU equivalent of the GPU split: runs execute sequentially per host (one
compiled program owns the chip); across hosts/slices, pass
``--device-assignment`` to pin each run's visible TPU via env, which is
how fold/run-level parallelism scales out (SURVEY.md §2.10 row
"multi-device experiment parallelism").
"""
import argparse
import os
import subprocess
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(prog="deepards-run-experiments")
    parser.add_argument("experiment_files", nargs="+")
    parser.add_argument("-n", "--n-runs", type=int, default=10)
    parser.add_argument("--device-assignment", default=None,
                        help="e.g. '0+1': round-robin runs across these "
                        "TPU process indices")
    parser.add_argument("--dry-run", action="store_true")
    parser.add_argument("--grid", nargs="*", default=[],
                        metavar="FLAG=V1,V2",
                        help="cartesian sweep of CLI flags, e.g. "
                        "base-network=resnet18,densenet18 batch-size=16,32")
    parser.add_argument("--extra-args", nargs=argparse.REMAINDER,
                        default=[])
    args = parser.parse_args(argv)

    devices = (
        args.device_assignment.split("+")
        if args.device_assignment
        else [None]
    )
    # grid: cartesian product of flag values (the shell-loop sweeps)
    import itertools

    grid_axes = []
    for spec in args.grid:
        flag, _, values = spec.partition("=")
        grid_axes.append([
            ("--" + flag.lstrip("-"), v) for v in values.split(",")
        ])
    grid_points = (
        list(itertools.product(*grid_axes)) if grid_axes else [()]
    )

    queue = []
    qi = 0
    for exp in args.experiment_files:
        for point in grid_points:
            for run in range(args.n_runs):
                dev = devices[qi % len(devices)]
                qi += 1
                queue.append((exp, run, dev, point))

    for exp, run, dev, point in queue:
        tag = "".join(
            "-{}".format(v) for _, v in point
        )
        cmd = [
            sys.executable, "-m", "deepards_tpu.cli.train",
            "-co", exp, "--seed", str(run),
            "-exp", "{}{}-run{}".format(
                os.path.splitext(os.path.basename(exp))[0], tag, run
            ),
        ]
        for flag, v in point:
            cmd.extend([flag, v])
        cmd += list(args.extra_args)
        env = dict(os.environ)
        if dev is not None:
            env["TPU_VISIBLE_DEVICES"] = dev
        print("run:", " ".join(cmd), "(device {})".format(dev))
        if not args.dry_run:
            subprocess.run(cmd, check=False, env=env)


if __name__ == "__main__":
    main()
