#!/usr/bin/env python
"""Merge the all-data DL sweep against the reference's published
CharCNN/LSTM columns (results/spreadsheets/performance_results_summary
.csv) into one comparison table:

    experiments/results_dl/alldata_vs_published.csv

Columns: ours (auc_mean/auc_max at the recorded seeds x epochs budget)
vs published, with the delta on auc_max. The sweep's budget is
deliberately reduced (run_dl_alldata.py docstring); rows whose shortfall
exceeds --flag-delta are printed so a higher-budget rerun can target
exactly those (the summary CSV merge is keyed by dataset+model, so a
rerun refreshes rows in place with its own budget recorded).
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REF = "/root/reference/results/spreadsheets/performance_results_summary.csv"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--flag-delta", type=float, default=0.10)
    args = ap.parse_args()

    ours_path = os.path.join(HERE, "results_dl", "alldata_dl_summary.csv")
    with open(ours_path, newline="") as f:
        ours = {(r["dataset"], r["model"]): r for r in csv.DictReader(f)}
    with open(REF, newline="") as f:
        ref = {r["Dataset"]: r for r in csv.DictReader(f)}

    col = {"cnn": "charcnn auc", "lstm": "lstm auc"}
    rows, flagged = [], []
    for (ds, model), r in sorted(ours.items()):
        pub = ref.get(ds, {}).get(col[model], "")
        row = dict(
            dataset=ds, type=r["type"], model=model,
            seeds=r["seeds"], epochs=r["epochs"],
            ours_auc_mean=r["auc_mean"], ours_auc_max=r["auc_max"],
            published_auc=pub,
        )
        try:
            row["delta_max_vs_published"] = round(
                float(r["auc_max"]) - float(pub), 4
            )
            if float(pub) - float(r["auc_max"]) > args.flag_delta:
                flagged.append((ds, model, float(pub), float(r["auc_max"])))
        except ValueError:
            row["delta_max_vs_published"] = ""
        rows.append(row)

    if not rows:
        sys.exit("no rows in alldata_dl_summary.csv")
    out = os.path.join(HERE, "results_dl", "alldata_vs_published.csv")
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out} ({len(rows)} rows)", file=sys.stderr)
    for ds, model, pub, got in flagged:
        print(
            f"SHORTFALL {ds} {model}: published {pub:.3f} vs ours "
            f"{got:.3f} — candidate for a higher-budget rerun",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
