"""End-to-end per-sequence pipeline.

Mirrors processSequence (fasta_utils.cpp:59-250):
  encode -> shift-XOR scan -> perfect/substitution/anchored scanners ->
  merge lattices -> 3-pointer seed merge -> per-seed refinement -> BED.

Engines:
  core   (default) — native event-driven core (csrc/ribbit_core.c): the
         O(NSHIFTS*L) scan streams into compact events consumed by C
         scanners/lattices; overlay range queries are recomputed on demand.
         Events can also come from the TPU scan kernel (scan_backend="tpu").
  python — the oracle-validated pure-Python reference engine over full
         bitmaps (scan_host / events / lattice); used for cross-checking.
"""

from __future__ import annotations

import sys
from typing import List, Optional

import numpy as np

from .config import (RibbitConfig, RANK_P, RANK_S, RANK_A, RANK_N,
                     WINDOW_BITCOUNT_SUBSTITUTION, WINDOW_BITCOUNT_ANCHORED)
from . import scan_host
from .encode import encode
from .refine import (process_seed, process_seed_motifwise,
                     longest_continuous_matches)

# the lattices and processSeed recurse proportionally to local seed structure
sys.setrecursionlimit(1_000_000)


class _BitmapCounter:
    """bitcount(midx, start, end) over a bool [NSHIFTS, L] matrix."""

    def __init__(self, bitmaps: np.ndarray):
        self.bitmaps = bitmaps

    def __call__(self, midx: int, start: int, end: int) -> int:
        if start < 0:
            start = 0
        return int(np.count_nonzero(self.bitmaps[midx, start:end]))


def _refine_seeds(seeds, sequence_id: str, sequence: str, L: int,
                  code: np.ndarray, n_mask: np.ndarray, cfg: RibbitConfig,
                  emit, longest_run_for_channel) -> None:
    """Dispatch the merged seed stream into the two refinement paths
    (fasta_utils.cpp:224-240).  seeds: iterable of (start, end, mlen, rank);
    longest_run_for_channel(midx) -> callable(a, b) -> longest overlay run."""
    for seed_start, seed_end, seed_mlen, seed_type in seeds:
        if seed_type == RANK_N:
            continue
        if seed_end - seed_start >= 0.9 * seed_mlen:
            clr = longest_run_for_channel(cfg.motif_channel(seed_mlen))
            if seed_mlen <= 10:
                process_seed_motifwise(seed_start, seed_end, seed_mlen,
                                       seed_type, sequence_id, sequence, L,
                                       clr, code, n_mask, cfg, emit)
            else:
                process_seed(seed_start, seed_end, seed_mlen, seed_type,
                             sequence_id, sequence, L, clr, code, n_mask,
                             cfg, emit)


def _process_core(sequence_id: str, sequence: str, cfg: RibbitConfig,
                  emit, scan_backend: str, nthreads: int = 0) -> None:
    import os
    from .core import CoreSession
    L = len(sequence)
    code, n_mask = encode(sequence)
    sess = CoreSession(code, n_mask, cfg, nthreads=nthreads)
    try:
        if scan_backend == "tpu":
            from .scan_events_tpu import scan_events
            perf, q7, q6 = scan_events(code, n_mask, cfg)
            sess.set_events(perf, q7, q6)
        seeds = sess.scan()

        if os.environ.get("RIBBIT_PY_REFINE"):
            # python refinement over the native seed stream (debug/cross-check)
            def longest_run_for_channel(midx: int):
                return lambda a, b: sess.overlay_longest_run(midx, a, b)
            _refine_seeds(seeds.tolist(), sequence_id, sequence, L, code,
                          n_mask, cfg, emit, longest_run_for_channel)
        else:
            for line in sess.refine(seeds, sequence, sequence_id):
                emit(line)
    finally:
        sess.close()


def _process_python(sequence_id: str, sequence: str, cfg: RibbitConfig,
                    emit, scan_backend: str) -> None:
    from .events import (run_perfect_scan, run_substitution_scan,
                         run_anchored_scan)
    L = len(sequence)
    code, n_mask = encode(sequence)

    if scan_backend == "tpu":
        from . import scan_tpu
        eq, anchors, overlay, qual7, qual6 = scan_tpu.scan_arrays(
            code, n_mask, cfg)
    else:
        eq = scan_host.match_bitmaps(code, cfg)
        anchors = scan_host.anchor_bitmaps(eq, cfg)
        overlay = scan_host.overlay_bitmaps(eq, anchors, cfg)
        qual7 = scan_host.window_qualified(eq, n_mask,
                                           WINDOW_BITCOUNT_SUBSTITUTION)
        qual6 = scan_host.window_qualified(overlay, n_mask,
                                           WINDOW_BITCOUNT_ANCHORED)

    raw_bitcount = _BitmapCounter(eq)
    overlay_bitcount = _BitmapCounter(overlay)

    perfect = run_perfect_scan(eq, n_mask, raw_bitcount, cfg)
    substut = run_substitution_scan(qual7, n_mask, raw_bitcount, perfect, cfg)
    anchored = run_anchored_scan(qual6, n_mask, overlay_bitcount,
                                 perfect, substut, cfg)

    # final 3-pointer merge by seed start; P wins ties over S over A
    # (fasta_utils.cpp:181-242)
    def merged():
        pi = si = ai = 0
        smallest_type = -1
        while pi < len(perfect) or si < len(substut) or ai < len(anchored):
            smallest = (1 << 64) - 1
            if pi < len(perfect) and smallest > perfect[pi][0]:
                smallest = perfect[pi][0]
                smallest_type = RANK_P
            if si < len(substut) and smallest > substut[si][0]:
                smallest = substut[si][0]
                smallest_type = RANK_S
            if ai < len(anchored) and smallest > anchored[ai][0]:
                smallest = anchored[ai][0]
                smallest_type = RANK_A
            if smallest_type == RANK_P:
                seed = perfect[pi]
                pi += 1
            elif smallest_type == RANK_S:
                seed = substut[si]
                si += 1
            else:
                seed = anchored[ai]
                ai += 1
            yield seed

    def longest_run_for_channel(midx: int):
        ch = overlay[midx]
        return lambda a, b: longest_continuous_matches(ch[a:b])

    _refine_seeds(merged(), sequence_id, sequence, L, code, n_mask, cfg,
                  emit, longest_run_for_channel)


def process_sequence(sequence_id: str, sequence: str, cfg: RibbitConfig,
                     out: Optional[List[str]] = None,
                     scan_backend: str = "host",
                     engine: str = "core",
                     nthreads: int = 0) -> List[str]:
    """Returns the BED lines for one sequence (11 tab-separated columns,
    matching ribbit.cpp:199-204 / parse_seed.cpp:434-437)."""
    lines: List[str] = out if out is not None else []
    emit = lines.append
    if len(sequence) == 0:
        return lines

    if engine == "core":
        try:
            _process_core(sequence_id, sequence, cfg, emit, scan_backend,
                          nthreads=nthreads)
            return lines
        except RuntimeError:
            pass  # native core unavailable: fall back to python engine
    _process_python(sequence_id, sequence, cfg, emit, scan_backend)
    return lines


def process_fasta(path: str, cfg: RibbitConfig,
                  scan_backend: str = "host", engine: str = "core",
                  workers: Optional[int] = None) -> List[str]:
    """Process a whole FASTA: contigs are independent units in the reference
    (ribbit.cpp:269-280), so they fan out over a thread pool with
    byte-identical output (results concatenated in file order).  The native
    core releases the GIL, so Python threads scale; inner C pools shrink as
    outer parallelism grows."""
    import os
    from concurrent.futures import ThreadPoolExecutor
    from .fasta import read_fasta

    records = list(read_fasta(path))
    ncpu = os.cpu_count() or 1
    if workers is None:
        workers = min(ncpu, len(records)) or 1

    if engine != "core" or scan_backend == "tpu" or workers <= 1 \
            or len(records) <= 1:
        lines: List[str] = []
        for sid, seq in records:
            process_sequence(sid, seq, cfg, out=lines,
                             scan_backend=scan_backend, engine=engine)
        return lines

    # deliberately oversubscribe: every contig's inner pools use all cores;
    # contig sizes are highly imbalanced, and work-conserving scheduling
    # beats static core partitioning (measured 0.33s -> 0.19s on 4 cores)
    inner = ncpu

    def run_one(rec):
        sid, seq = rec
        return process_sequence(sid, seq, cfg, scan_backend=scan_backend,
                                engine=engine, nthreads=inner)

    with ThreadPoolExecutor(max_workers=workers) as ex:
        results = list(ex.map(run_one, records))
    lines = []
    for r in results:
        lines.extend(r)
    return lines
