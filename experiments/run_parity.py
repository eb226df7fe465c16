#!/usr/bin/env python
"""AUC-parity validation against the reference's published results.

Runs the configurations from results/spreadsheets/performance_results_summary.csv
(quoted in BASELINE.md) through the published-numbers workflow (EKM +
calibrated linear SVM) and prints ours vs theirs. Used to produce
RESULTS.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# (dataset, g, m, C, published exact AUC, published approx-conv AUC)
PUBLISHED = [
    ("EP300", 10, 4, 1.0, 0.990724, 0.990707),
    ("EP300_47848", 11, 5, 1.0, 0.953283, 0.952817),
    ("CTCF", 13, 7, 1.0, 0.969578, None),
    ("1.1", 8, 4, 0.01, 0.853097, None),
    ("2.19", 8, 4, 0.01, 0.895062, None),
    ("MedLine", 5, 2, 1.0, 0.722526, None),
    ("2.31", 15, 10, 0.01, None, None),
    ("2.34", 6, 0, 10.0, None, None),
    ("3.25", 15, 9, 100.0, 0.962927, 0.890481),
    ("BioInfer", 11, 6, 1.0, None, None),
    ("AImed", 11, 4, 100.0, 0.716697, None),
]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--datasets", nargs="*", default=None)
    ap.add_argument("--mode", choices=["exact", "approx", "both"], default="both")
    ap.add_argument("--out", default="parity_results.json")
    args = ap.parse_args(argv)

    from fastsk_tpu.harness import FastskRunner

    rows = []
    for name, g, m, C, pub_exact, pub_approx in PUBLISHED:
        if args.datasets and name not in args.datasets:
            continue
        print(f"[parity] {name} g={g} m={m} C={C}", flush=True)
        runner = FastskRunner(name)
        entry = {"dataset": name, "g": g, "m": m, "C": C,
                 "published_exact": pub_exact, "published_approx": pub_approx}
        if args.mode in ("exact", "both"):
            t0 = time.time()
            res = runner.train_and_test(g=g, m=m, approx=False, C=C)
            entry["exact_auc"] = round(res["auc"], 6)
            entry["exact_acc"] = round(res["acc"], 6)
            entry["exact_time_s"] = round(time.time() - t0, 2)
            print(f"  exact: auc={res['auc']:.6f} (published {pub_exact}) "
                  f"in {entry['exact_time_s']}s", flush=True)
        if args.mode in ("approx", "both"):
            t0 = time.time()
            res = runner.train_and_test(g=g, m=m, approx=True, C=C)
            entry["approx_auc"] = round(res["auc"], 6)
            entry["approx_iters"] = res["iters"]
            entry["approx_time_s"] = round(time.time() - t0, 2)
            print(f"  approx: auc={res['auc']:.6f} iters={res['iters']} "
                  f"(published {pub_approx}) in {entry['approx_time_s']}s",
                  flush=True)
        rows.append(entry)
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
