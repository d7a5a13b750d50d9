#!/usr/bin/env python3
"""BED comparison tool: exact-match plus near-miss classification
(SURVEY.md §7.8).

Compares two ribbit-format BED files (ours vs reference or ground truth)
and classifies every line:

  exact       identical line present in both
  coord-jitter  same chrom+motif class, interval within +-N bp (default 5)
  class-diff  overlapping interval but different repeat class
  only-a / only-b  no counterpart

Usage: python tools/bed_diff.py A.bed B.bed [--slop 5] [--summary-only]
Exit status 0 iff the files are line-identical.
"""

from __future__ import annotations

import argparse
import sys
from collections import defaultdict


def _load(path):
    rows = []
    with open(path) as fh:
        for ln in fh:
            ln = ln.rstrip("\n")
            if not ln:
                continue
            c = ln.split("\t")
            rows.append((c[0], int(c[1]), int(c[2]),
                         c[3] if len(c) > 3 else "", ln))
    return rows


def classify(a_rows, b_rows, slop):
    # multiset exact matching (repeat calls can legitimately duplicate)
    from collections import Counter
    a_cnt = Counter(r[4] for r in a_rows)
    b_cnt = Counter(r[4] for r in b_rows)
    exact_cnt = sum((a_cnt & b_cnt).values())

    def rest(rows, own, other):
        budget = {k: own[k] - min(own[k], other[k]) for k in own}
        out = []
        seen = Counter()
        for r in reversed(rows):
            if seen[r[4]] < budget.get(r[4], 0):
                seen[r[4]] += 1
                out.append(r)
        out.reverse()
        return out

    a_rest = rest(a_rows, a_cnt, b_cnt)
    b_rest = rest(b_rows, b_cnt, a_cnt)
    exact = exact_cnt
    b_by_chrom = defaultdict(list)
    for r in b_rest:
        b_by_chrom[r[0]].append(r)
    for v in b_by_chrom.values():
        v.sort(key=lambda r: r[1])

    jitter, class_diff, only_a = [], [], []
    matched_b = set()
    for r in a_rest:
        chrom, s, e, motif, line = r
        best = None
        for rb in b_by_chrom.get(chrom, []):
            if id(rb) in matched_b:
                continue
            if rb[1] > e + slop:
                break
            if rb[2] < s - slop:
                continue
            overlap = min(e, rb[2]) - max(s, rb[1])
            if overlap <= 0:
                continue
            kind = ("jitter" if motif == rb[3]
                    and abs(s - rb[1]) <= slop and abs(e - rb[2]) <= slop
                    else "class")
            if best is None or (best[0] == "class" and kind == "jitter"):
                best = (kind, rb)
        if best is None:
            only_a.append(line)
        else:
            matched_b.add(id(best[1]))
            (jitter if best[0] == "jitter" else class_diff).append(
                (line, best[1][4]))
    only_b = [r[4] for r in b_rest if id(r) not in matched_b]
    return exact, jitter, class_diff, only_a, only_b


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("a")
    ap.add_argument("b")
    ap.add_argument("--slop", type=int, default=5)
    ap.add_argument("--summary-only", action="store_true")
    args = ap.parse_args(argv)

    a_rows = _load(args.a)
    b_rows = _load(args.b)
    exact, jitter, class_diff, only_a, only_b = classify(a_rows, b_rows,
                                                         args.slop)
    identical = [r[4] for r in a_rows] == [r[4] for r in b_rows]
    print(f"A: {len(a_rows)} lines  B: {len(b_rows)} lines")
    print(f"exact: {exact}  coord-jitter(<= {args.slop}bp): {len(jitter)}"
          f"  class-diff: {len(class_diff)}  only-A: {len(only_a)}"
          f"  only-B: {len(only_b)}")
    print("VERDICT:", "IDENTICAL" if identical else "DIFFERENT")
    if not args.summary_only:
        for line, other in jitter[:20]:
            print(f"  ~ {line}\n    {other}")
        for line, other in class_diff[:20]:
            print(f"  C {line}\n    {other}")
        for line in only_a[:20]:
            print(f"  A {line}")
        for line in only_b[:20]:
            print(f"  B {line}")
    return 0 if identical else 1


if __name__ == "__main__":
    sys.exit(main())
