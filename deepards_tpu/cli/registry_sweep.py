"""Health-sweep every generated experiment yml through a debug epoch +
eval on the current jax backend, recording a machine-readable artifact.

The generated registry (config/experiment_files/generated/, 228 files)
is diff-tested as *data* in test_experiment_registry.py; this runner is
the executable counterpart: each config trains one debug epoch and
evaluates one fold end-to-end via the real CLI path, exactly as a user
would run it (reference: deepards/experiment_files/* driven by
scripts/main/*.sh).  Output is a JSON map
``{config: {"ok": bool, "wall_s": float, "error": str|null}}`` written
incrementally so an interrupted sweep resumes where it left off.

Usage:
    python -m deepards_tpu.cli.registry_sweep --out SWEEP.json \
        [--cohort DIR] [--only NAME ...] [--start N] [--stop N]
"""
import argparse
import json
import os
import tempfile
import time
import traceback

GEN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "config", "experiment_files", "generated")


#: every holdout layout the generated registry exercises; all are
#: symlinks to all_data in the synthetic cohort (same patients, the
#: split protocol itself is what's under test here)
SUBDIRS = ("all_data", "aim1_70_30_training", "aim1_70_30_testing",
           "randomtrain", "randomval", "randomtest")


def ensure_cohort(path, n_patients=8, n_breaths=260):
    from deepards_tpu.data.synthetic import generate_cohort

    csv = os.path.join(path, "cohort-description.csv")
    if not os.path.exists(csv):
        os.makedirs(path, exist_ok=True)
        generate_cohort(
            path, n_patients=n_patients, n_breaths_per_patient=n_breaths,
            seed=7, subdirs=SUBDIRS,
        )
    else:
        # older sweep cohorts predate the random* subdirs — upgrade in
        # place by symlinking them the same way generate_cohort does
        exp = os.path.join(path, "experiment1")
        for sub in SUBDIRS[1:]:
            sub_dir = os.path.join(exp, sub)
            os.makedirs(sub_dir, exist_ok=True)
            for kind in ("raw", "meta"):
                dst = os.path.join(sub_dir, kind)
                if not os.path.exists(dst):
                    os.symlink(os.path.abspath(
                        os.path.join(exp, "all_data", kind)), dst)
    return csv


def run_one(name, cohort, csv):
    """One debug-epoch train+eval through the CLI. Returns error or None."""
    import yaml

    from deepards_tpu.cli.train import main as train_main

    with open(os.path.join(GEN, name)) as f:
        cfg = yaml.safe_load(f) or {}

    res_dir = tempfile.mkdtemp(prefix="regsweep_")
    argv = [
        "-co", os.path.join(GEN, name),
        "--data-path", cohort, "--cohort-file", csv,
        "--epochs", "1", "--debug",
        "-b", "4", "--n-sub-batches", "4",
        "--compute-dtype", "float32", "--results-dir", res_dir,
        "--seed", "5",
    ]
    # holdout-protocol configs (e.g. drop_if_under_r2 heterogeneity
    # filters) reject kfold mode by design — run them under their own
    # split protocol instead of forcing the sweep's 2-fold override
    if not (cfg.get("holdout_set_type") or cfg.get("drop_if_under_r2")):
        argv += ["--kfolds", "2", "--only-fold", "0"]
    if cfg.get("train_pt_frac") and float(cfg["train_pt_frac"]) < 0.5:
        # small fractions need a wide cohort: after the 2-fold split
        # halves the patient pool, floor(n_train*frac)//2 must stay >=1,
        # so frac=0.025 needs >=80 train patients -> 170 total
        wide = os.path.join(os.path.dirname(cohort), "regsweep_wide")
        csv_wide = ensure_cohort(wide, n_patients=170, n_breaths=40)
        argv[argv.index("--data-path") + 1] = wide
        argv[argv.index("--cohort-file") + 1] = csv_wide
    try:
        train_main(argv)
    except SystemExit as e:
        if e.code not in (0, None):
            return "SystemExit %s" % e.code
    except Exception as e:  # noqa: BLE001 - sweep must survive any config
        traceback.print_exc()
        return "%s: %s" % (type(e).__name__, str(e)[:300])
    return None


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--cohort", default="/tmp/regsweep_cohort")
    p.add_argument("--only", nargs="*")
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--stop", type=int, default=None)
    p.add_argument("--clear-caches-every", type=int, default=8,
                   help="jax.clear_caches() cadence to bound host memory "
                   "over a long sweep (the persistent compile cache on "
                   "disk keeps recompiles cheap)")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/deepards_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    csv = ensure_cohort(args.cohort)
    configs = sorted(f for f in os.listdir(GEN) if f.endswith(".yml"))
    if args.only:
        configs = [c for c in configs if c in set(args.only)]
    configs = configs[args.start: args.stop]

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)

    backend = jax.default_backend()
    for i, name in enumerate(configs):
        if results.get(name, {}).get("ok"):
            continue  # resumable: skip configs already clean
        t0 = time.perf_counter()
        err = run_one(name, args.cohort, csv)
        wall = round(time.perf_counter() - t0, 1)
        results[name] = {"ok": err is None, "wall_s": wall,
                         "error": err, "backend": backend}
        tag = "OK  " if err is None else "FAIL"
        print("%s %6.1fs [%d/%d] %s %s" % (
            tag, wall, i + 1, len(configs), name, err or ""), flush=True)
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        os.replace(tmp, args.out)
        if args.clear_caches_every and (i + 1) % args.clear_caches_every == 0:
            jax.clear_caches()

    n_ok = sum(1 for r in results.values() if r["ok"])
    print("SWEEP SUMMARY: %d ok / %d recorded" % (n_ok, len(results)),
          flush=True)


if __name__ == "__main__":
    main()
