"""Experiment launcher: queue N repeat runs of experiment files.

Capability parity with the reference runner
(reference: deepards/scripts/main/run_non_pretraining_experiments.py:17-39,
which queued runs through the `ts` task spooler and split them across
GPUs via --cuda-devices 0+1).  TPU equivalent: runs execute sequentially
per host (one compiled program owns the chip); across hosts/slices, pass
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
    parser.add_argument("--extra-args", nargs=argparse.REMAINDER,
                        default=[])
    args = parser.parse_args(argv)

    devices = (
        args.device_assignment.split("+")
        if args.device_assignment
        else [None]
    )
    queue = []
    for exp in args.experiment_files:
        for run in range(args.n_runs):
            dev = devices[run % len(devices)]
            queue.append((exp, run, dev))

    for exp, run, dev in queue:
        cmd = [
            sys.executable, "-m", "deepards_tpu.cli.train",
            "-co", exp, "--seed", str(run),
            "-exp", "{}-run{}".format(
                os.path.splitext(os.path.basename(exp))[0], run
            ),
        ] + list(args.extra_args)
        env = dict(os.environ)
        if dev is not None:
            env["TPU_VISIBLE_DEVICES"] = dev
        print("run:", " ".join(cmd), "(device {})".format(dev))
        if not args.dry_run:
            subprocess.run(cmd, check=False, env=env)


if __name__ == "__main__":
    main()
