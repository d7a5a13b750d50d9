"""End-to-end per-sequence pipeline (host reference path).

Mirrors processSequence (fasta_utils.cpp:59-250):
  encode -> shift-XOR bitmaps -> perfect scan -> substitution scan ->
  anchors -> overlay -> anchored scan -> 3-pointer seed merge ->
  per-seed refinement -> BED lines.

The scan arrays can come from the host numpy backend or the TPU backend
(scan_tpu.py); the scanner replays, lattices, and refinement are exact
host-side ports that consume the same compact structures either way.
"""

from __future__ import annotations

import sys
from typing import List, Optional

import numpy as np

from .config import (RibbitConfig, RANK_P, RANK_S, RANK_A, RANK_N,
                     WINDOW_BITCOUNT_SUBSTITUTION, WINDOW_BITCOUNT_ANCHORED)
from . import scan_host
from .encode import encode
from .events import run_perfect_scan, run_substitution_scan, run_anchored_scan
from .refine import process_seed, process_seed_motifwise

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


def process_sequence(sequence_id: str, sequence: str, cfg: RibbitConfig,
                     out: Optional[List[str]] = None,
                     scan_backend: str = "host") -> List[str]:
    """Returns the BED lines for one sequence (11 tab-separated columns,
    matching ribbit.cpp:199-204 / parse_seed.cpp:434-437)."""
    lines: List[str] = out if out is not None else []
    emit = lines.append

    L = len(sequence)
    if L == 0:
        return lines
    code, n_mask = encode(sequence)

    if scan_backend == "tpu":
        from . import scan_tpu
        eq, anchors, overlay, qual7, qual6 = scan_tpu.scan_arrays(code, n_mask, cfg)
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

    # phase 1: perfect seeds (raw bitmaps)
    perfect = run_perfect_scan(eq, n_mask, raw_bitcount, cfg)
    # phase 2: substitution seeds (raw bitmaps, window >= 7)
    substut = run_substitution_scan(qual7, n_mask, raw_bitcount, perfect, cfg)
    # phase 3: anchored seeds (overlay bitmaps, window >= 6)
    anchored = run_anchored_scan(qual6, n_mask, overlay_bitcount,
                                 perfect, substut, cfg)

    # final 3-pointer merge by seed start; P wins ties over S over A
    # (fasta_utils.cpp:181-242)
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

        seed_start, seed_end, seed_mlen, seed_type = seed
        if seed_type == RANK_N:
            continue

        if seed_end - seed_start >= 0.9 * seed_mlen:
            channel = overlay[cfg.motif_channel(seed_mlen)]
            if seed_mlen <= 10:
                process_seed_motifwise(seed_start, seed_end, seed_mlen,
                                       seed_type, sequence_id, sequence, L,
                                       channel, code, n_mask, cfg, emit)
            else:
                process_seed(seed_start, seed_end, seed_mlen, seed_type,
                             sequence_id, sequence, L, channel, code, n_mask,
                             cfg, emit)

    return lines
