"""Recover experiment names/uuids from a results directory
(reference: deepards/find_all_experiments.py)."""
import argparse
import glob
import os
import pickle


def find_experiments(results_dir="results"):
    out = []
    for path in sorted(glob.glob(os.path.join(results_dir, "*_*.pkl"))):
        base = os.path.basename(path)
        if base.endswith(("_patient_results.pkl", "_aggregate_results.pkl",
                          "_maximal_results.pkl")) or "_results_" in base:
            continue
        try:
            with open(path, "rb") as f:
                hp = pickle.load(f)
            if isinstance(hp, dict):
                out.append({
                    "file": base,
                    "experiment": hp.get("conf", {}).get("experiment_name"),
                    "network": hp.get("conf", {}).get("network"),
                    "start_time": hp.get("start_time"),
                })
        except Exception:
            continue
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(prog="deepards-find-experiments")
    parser.add_argument("--results-dir", default="results")
    args = parser.parse_args(argv)
    for row in find_experiments(args.results_dir):
        print(row)


if __name__ == "__main__":
    main()
