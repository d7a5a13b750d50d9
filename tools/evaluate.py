#!/usr/bin/env python3
"""Accuracy evaluation against simulator ground truth.

Reproduces the reference's implied results workflow (SURVEY.md §4: generate
a simulated FASTA + ground-truth BED, run the detector, compare): computes
locus-level recall/precision by interval overlap with the simulator's
ground-truth loci.

A ground-truth locus counts as RECOVERED when a called repeat overlaps >=
--min-overlap of it (default 0.5); a call counts as a true positive when it
overlaps any ground-truth locus.  (ribbit calls can legitimately fragment
or extend loci, so exact-interval metrics would be misleading.)

Usage:
  python -m ribbit_tpu.sim -l 200 -o EVAL --seed 1
  python -m ribbit_tpu.cli -i sim_EVAL.fa -o sim_EVAL.ribbit.bed
  python tools/evaluate.py sim_EVAL.bed sim_EVAL.ribbit.bed
"""

from __future__ import annotations

import argparse
import sys
from collections import defaultdict


def _load_intervals(path, start_col=1, end_col=2):
    by_chrom = defaultdict(list)
    with open(path) as fh:
        for ln in fh:
            c = ln.rstrip("\n").split("\t")
            if len(c) <= end_col:
                continue
            by_chrom[c[0]].append((int(c[start_col]), int(c[end_col])))
    for v in by_chrom.values():
        v.sort()
    return by_chrom


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("truth_bed", help="simulator ground-truth BED")
    ap.add_argument("calls_bed", help="detector output BED")
    ap.add_argument("--min-overlap", type=float, default=0.5,
                    help="fraction of a truth locus that must be covered")
    args = ap.parse_args(argv)

    truth = _load_intervals(args.truth_bed)
    calls = _load_intervals(args.calls_bed)

    recovered = 0
    total_truth = 0
    for chrom, loci in truth.items():
        cl = calls.get(chrom, [])
        for s, e in loci:
            total_truth += 1
            covered = 0
            for cs, ce in cl:
                if cs >= e:
                    break
                if ce <= s:
                    continue
                covered += min(e, ce) - max(s, cs)
            if covered >= args.min_overlap * (e - s):
                recovered += 1

    tp_calls = 0
    total_calls = 0
    for chrom, cl in calls.items():
        tl = truth.get(chrom, [])
        for cs, ce in cl:
            total_calls += 1
            if any(ts < ce and te > cs for ts, te in tl):
                tp_calls += 1

    recall = recovered / total_truth if total_truth else 0.0
    precision = tp_calls / total_calls if total_calls else 0.0
    print(f"ground-truth loci: {total_truth}  recovered: {recovered}  "
          f"recall: {recall:.3f}")
    print(f"calls: {total_calls}  overlapping truth: {tp_calls}  "
          f"precision: {precision:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
