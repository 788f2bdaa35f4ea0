"""Multi-process training launcher.

Spawns N ranks of ``deepards_tpu.cli.train`` with a shared coordinator
so the trainer runs on ONE global mesh spanning all ranks (data-parallel
gradient all-reduce crosses process boundaries; eval predictions are
allgathered for patient voting).  On a TPU pod each host runs one rank
and collectives ride ICI/DCN; on CPU the ranks use gloo collectives
(see parallel/mesh.initialize_distributed).

The reference's closest analogue is experiment-level parallelism via
task-spooler across GPUs (reference:
scripts/main/run_non_pretraining_experiments.py:17-39) — this launcher
adds the stronger mode the reference never had: ONE training run spread
over multiple processes.

Usage:
  python -m deepards_tpu.cli.launch_distributed --num-processes 2 -- \\
      --data-path ... --cohort-file ... -n cnn_linear ...

Everything after ``--`` is passed to each rank's cli.train verbatim,
plus per-rank results dirs (``<results_dir>/rank<i>``) so ranks do not
clobber each other's (identical) outputs.
"""
import argparse
import os
import subprocess
import sys


def build_parser():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-n", "--num-processes", type=int, default=2)
    parser.add_argument("--coordinator", default="127.0.0.1:23456",
                        help="host:port of rank 0's coordinator")
    parser.add_argument("--platform", choices=["cpu", "tpu"],
                        help="force each rank's backend; REQUIRED as cpu "
                        "when running multiple ranks on one single-chip "
                        "host (two ranks cannot share one TPU)")
    parser.add_argument("--results-dir", default="results")
    parser.add_argument("train_args", nargs=argparse.REMAINDER,
                        help="arguments after -- go to cli.train")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    train_args = list(args.train_args)
    if train_args and train_args[0] == "--":
        train_args = train_args[1:]

    procs = []
    for rank in range(args.num_processes):
        rank_dir = os.path.join(args.results_dir, "rank{}".format(rank))
        os.makedirs(rank_dir, exist_ok=True)
        cmd = [
            sys.executable, "-m", "deepards_tpu.cli.train",
            "--distributed-coordinator", args.coordinator,
            "--num-processes", str(args.num_processes),
            "--process-id", str(rank),
            "--results-dir", rank_dir,
        ]
        if args.platform:
            cmd += ["--platform", args.platform]
        cmd += train_args
        env = dict(os.environ)
        # one local device per rank: a forced host-device count would
        # multiply the global mesh unexpectedly
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(cmd, env=env))

    rcs = [p.wait() for p in procs]
    if any(rcs):
        raise SystemExit(
            "distributed ranks failed: {}".format(rcs))
    print("all {} ranks completed".format(args.num_processes))


if __name__ == "__main__":
    main()
