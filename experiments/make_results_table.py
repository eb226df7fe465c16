#!/usr/bin/env python
"""Render parity-run JSON files into the RESULTS.md markdown table."""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("jsons", nargs="+")
    args = ap.parse_args(argv)

    rows = {}
    for path in args.jsons:
        for r in json.load(open(path)):
            rows.setdefault(r["dataset"], {}).update(r)

    print("| dataset | g,m,C | ours exact | published exact | Δ | "
          "ours approx (iters) | published approx | time (s) |")
    print("|---|---|---|---|---|---|---|---|")
    for name, r in rows.items():
        pe = r.get("published_exact")
        oe = r.get("exact_auc")
        delta = f"{oe - pe:+.6f}" if (pe is not None and oe is not None) else "—"
        oa = r.get("approx_auc")
        oa_s = f"{oa:.6f} ({r.get('approx_iters')})" if oa is not None else "—"
        pa = r.get("published_approx")
        print(
            f"| {name} | {r['g']},{r['m']},{r['C']} | "
            f"{oe if oe is not None else '—'} | {pe if pe is not None else '—'} | {delta} | "
            f"{oa_s} | {pa if pa is not None else '—'} | "
            f"{r.get('exact_time_s', '—')} |"
        )


if __name__ == "__main__":
    main()
