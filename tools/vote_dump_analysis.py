"""Classify vote-kernel miss cost by window periodicity.

The diagonal voter (csrc/ribbit_vote.c) is the largest single refinement
term after memoization (NOTES_ROUND3.md profile).  Round 4 asked whether an
exact fast path for EXACTLY periodic windows (orbit algebra over the period
ring: greedy-jitter walks become deterministic orbits in Z_q with O(1)
per-row cost) would pay.  This harness answers it with data:

  1. run any fixture with RIBBIT_VOTE_DUMP=<path> (env-gated in
     csrc/ribbit_refine.c: one "seed_start ssl m cycles" line per actual,
     non-memoized vote kernel run), e.g.

       RIBBIT_VOTE_DUMP=/tmp/vdump.txt python -m ribbit_tpu.cli \
           -i genome.fa -o /dev/null

  2. python tools/vote_dump_analysis.py genome.fa /tmp/vdump.txt

Measured on the 21.4 Mb chromosome fixture (round 4): 34.2 Gc over 45087
runs, 100.0% of cycles on APERIODIC windows (2 periodic runs, ~0.00 Gc) —
the periodic fast path was rejected; exactly-periodic content is already
fully absorbed by the content-addressed vote memo and the cheap perfect
paths upstream.
"""
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ribbit_tpu.encode import encode          # noqa: E402
from ribbit_tpu.fasta import read_fasta       # noqa: E402


def smallest_period(w) -> int:
    """Smallest string period via the KMP failure function.  A window is
    EXACTLY periodic with period q only when q also divides len(w); a q
    with len(w) % q != 0 means a partial trailing copy (weak period)."""
    n = len(w)
    if n == 0:
        return 0
    fail = np.zeros(n, dtype=np.int64)
    k = 0
    for i in range(1, n):
        while k and w[i] != w[k]:
            k = fail[k - 1]
        if w[i] == w[k]:
            k += 1
        fail[i] = k
    return int(n - fail[n - 1])


def main() -> None:
    fa, dump = sys.argv[1], sys.argv[2]
    seqs = dict(read_fasta(fa))
    if len(seqs) != 1:
        raise SystemExit("expected a single-contig fixture")
    code, n_mask = encode(next(iter(seqs.values())))
    L = len(code)

    tot = 0
    by = defaultdict(lambda: [0, 0])   # class -> [cycles, runs]
    cache = {}
    for line in open(dump):
        ss, ssl, m, cyc = map(int, line.split())
        tot += cyc
        key = (ss, ssl, m)
        if key not in cache:
            lo, hi = ss - 2, ss + ssl + 2
            if ssl == 0 or lo < 0 or hi > L or n_mask[lo:hi].any():
                cache[key] = "boundary_or_N"
            else:
                q = smallest_period(code[ss:ss + ssl])
                if q <= ssl // 2 and ssl % q == 0:
                    cache[key] = "periodic"        # exact: q | len
                elif q <= ssl // 2:
                    cache[key] = "weakly_periodic"  # partial trailing copy
                else:
                    cache[key] = "aperiodic"
        cls = cache[key]
        by[cls][0] += cyc
        by[cls][1] += 1

    print(f"total {tot / 1e9:.2f} Gc over {sum(v[1] for v in by.values())} "
          "vote kernel runs")
    for cls, (cyc, n) in sorted(by.items(), key=lambda kv: -kv[1][0]):
        print(f"  {cls:14s} {cyc / 1e9:8.2f} Gc "
              f"({100 * cyc / max(tot, 1):5.1f}%)  {n} runs")


if __name__ == "__main__":
    main()
