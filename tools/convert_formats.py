#!/usr/bin/env python
"""Dataset format converters for third-party gkm tools.

Covers the reference's conversion utilities
(results/other_scripts/gkmify.py — split a labeled FASTA pair into the
pos/neg file quartet gkmSVM-2.0 and LSGKM consume — and
results/other_scripts/gkm_formatter.py — normalize the bare-label
multi-line variant into the ``>label`` / one-line-sequence form the
FastSK readers expect), as one tool with subcommands:

  python tools/convert_formats.py gkmify --dir data/ --prefix EP300 --out-dir gkm_format/
  python tools/convert_formats.py normalize raw.fasta fastsk_format.fasta
"""

from __future__ import annotations

import argparse
import os
import sys


def split_pos_neg(fasta_path: str, start_id: int = 1):
    """Split a ``>label`` FASTA into (pos, neg) record lists, re-keyed with
    sequential ``>id`` headers (gkm tools require unique ids, not labels).
    Returns (pos_records, neg_records, next_id); label 1 is positive,
    -1/0 negative."""
    pos, neg = [], []
    uid = start_id
    label = None
    label_line = True  # alternating format, like io/fasta.py (sequences
    with open(fasta_path, encoding="utf-8") as fh:  # may contain '>')
        for raw in fh:
            line = raw.strip().lower()
            if not line:
                continue
            if label_line:
                parts = line.split(">")
                if len(parts) != 2:
                    raise ValueError(f"malformed label line: {line!r}")
                val = int(parts[1])
                if val not in (-1, 0, 1):
                    raise ValueError(f"label must be -1, 0, or 1; got {val}")
                label = val
                (pos if val == 1 else neg).append(f">{uid}")
                uid += 1
                label_line = False
            else:
                (pos if label == 1 else neg).append(line)
                label_line = True
    return pos, neg, uid


def gkmify(data_dir: str, prefix: str, out_dir: str) -> list:
    """Produce <prefix>.{train,test}.{pos,neg}.fasta under out_dir."""
    os.makedirs(out_dir, exist_ok=True)
    written = []
    uid = 1
    for split in ("train", "test"):
        src = os.path.join(data_dir, f"{prefix}.{split}.fasta")
        pos, neg, uid = split_pos_neg(src, uid)
        for tag, records in (("pos", pos), ("neg", neg)):
            dst = os.path.join(out_dir, f"{prefix}.{split}.{tag}.fasta")
            with open(dst, "w") as fh:
                fh.write("\n".join(records) + "\n")
            written.append(dst)
    return written


def normalize(src: str, dst: str) -> int:
    """Convert the bare-label multi-line layout (a line holding only
    -1/0/1 starts a record; following lines are sequence fragments until
    the next label) into ``>label`` / single-line-sequence FASTA.
    Returns the number of records written."""
    records = []
    label = None
    seq_parts: list = []

    def flush():
        if label is not None:
            records.append((label, "".join(seq_parts)))

    with open(src, encoding="utf-8") as fh:
        for raw in fh:
            token = "".join(raw.split())
            if not token:
                continue
            try:
                val = int(token)
                is_label = val in (-1, 0, 1)
            except ValueError:
                is_label = False
            if is_label:
                flush()
                label = val
                seq_parts = []
            else:
                if label is None:
                    raise ValueError("sequence data before the first label")
                seq_parts.append(token)
    flush()
    if not records:
        raise ValueError(f"no records found in {src}")
    with open(dst, "w") as fh:
        for lab, seq in records:
            fh.write(f">{lab}\n{seq}\n")
    return len(records)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gkmify", help="split labeled FASTA into gkm pos/neg files")
    g.add_argument("--dir", default="./", help="directory holding <prefix>.{train,test}.fasta")
    g.add_argument("--prefix", required=True, metavar="EP300")
    g.add_argument("--out-dir", default="gkm_format")

    n = sub.add_parser("normalize", help="bare-label multi-line -> fastsk FASTA")
    n.add_argument("src")
    n.add_argument("dst")

    args = ap.parse_args(argv)
    if args.cmd == "gkmify":
        for path in gkmify(args.dir, args.prefix, args.out_dir):
            print(path)
    else:
        count = normalize(args.src, args.dst)
        print(f"wrote {count} records to {args.dst}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
