"""Rewrite a cohort CSV after dataset anonymization.

(reference: deepards/redo_cohort_desc_after_anonymization.py): merge the
anonymization shift file (patient_id -> new_patient_id, shift_hours) into
the non-anonymized cohort description, shift the Berlin-criteria and
vent-start timestamps by each patient's time shift, and emit a fresh
cohort CSV keyed by the anonymous ids.
"""
import argparse

import pandas as pd

PT_COL = "Patient Unique Identifier"
ARDS_TIME_COL = "Date when Berlin criteria first met (m/dd/yyy)"
OTHER_TIME_COL = "vent_start_time"
OUT_FMT = "%Y-%m-%d %H:%M:%S"


def anonymize_cohort(shift_file, cohort_file, out_path="anon-desc.csv"):
    shifts = pd.read_csv(shift_file)
    cohort = pd.read_csv(cohort_file).rename(
        columns={PT_COL: "patient_id"}
    )
    merged = shifts.merge(cohort, on="patient_id", how="outer")
    merged = merged[~merged.new_patient_id.isna()]
    merged = merged.drop_duplicates("patient_id")
    shift_dt = pd.to_timedelta(merged.shift_hours, unit="hours")
    for col in (OTHER_TIME_COL, ARDS_TIME_COL):
        merged[col] = (
            pd.to_datetime(merged[col]) + shift_dt
        ).dt.strftime(OUT_FMT)
    merged = merged.rename(columns={"new_patient_id": PT_COL})
    out = merged[[PT_COL, ARDS_TIME_COL, OTHER_TIME_COL, "Pathophysiology"]]
    out = out.copy()
    out[PT_COL] = out[PT_COL].astype(int)
    out.to_csv(out_path, index=False)
    return out_path


def main(argv=None):
    parser = argparse.ArgumentParser(prog="deepards-anonymize-cohort")
    parser.add_argument("--shift-file", required=True)
    parser.add_argument("--non-anon-cohort-desc", required=True)
    parser.add_argument("-o", "--output", default="anon-desc.csv")
    args = parser.parse_args(argv)
    path = anonymize_cohort(
        args.shift_file, args.non_anon_cohort_desc, args.output
    )
    print("wrote", path)


if __name__ == "__main__":
    main()
