"""Row-split manual-DMA scan generation: v3 compute, few rows per program.

v3 (scan_pallas_v3) holds every intermediate as an [nsp, EXT] int32 tensor;
at nsp=104 that caps the tile length at 3072 (TILE=4096 exceeds scoped VMEM
by ~2.1 MB) and, more importantly, keeps ~10 MB of live vectors per
program.  Shift rows are independent except the overlay's ±2-row anchor OR
(fasta_utils.cpp:146-160), so v4 runs the same kernel body over a ROW
WINDOW: ceil(nsp/OUT_ROWS) pallas calls, each computing OUT_ROWS rows plus
the 2-row halo per side.  The on-chip sweep was strongly monotone toward
FEWER rows per program and longer tiles — per-program live-set locality
dominates even the 2x row-recompute overhead at OUT_ROWS=4:

    TILE/OUT_ROWS  3072/104(v3)  6144/52  8192/32  10240/24  12288/8  16384/4  32768/4  40960/4
    Mbp/s/chip         244         396      483      543       796     963      1024     1031

TILE=32768 is the shipped config (40960 is within noise of it and sits at
the scoped-VMEM edge — 49152 is rejected by the compiler; 32768 keeps
margin).  Two measured-and-rejected follow-ups (round 4): packing the four
0/1 planes into bits 0-3 of ONE int8 store was a net LOSS (934/873 vs
963/1024 at TILE 16k/32k — the kernel is compute-bound, and a 1-store
ablation that suggested store savings was confounded by dead-code
elimination of the unstored planes' compute); a group-sequential
single-program variant with a rolling 3-group anchor window (no halo
recompute, one pallas call) compiled to a 14-group unrolled body that ran
4x SLOWER (229 Mbp/s, 117 s compile) — Mosaic's scheduling collapses at
that body size, so the 2x halo recompute stays.

ROUND-6 REDESIGN (two-pass, +110%): anchors are row-local, so the anchor
computation moved to a dedicated pass (scan_events_pallas._anchor_rows:
16 rows per int32 word, run-length ladders exactly once per shift row,
no halo).  This kernel is now LADDER-FREE with rb == OUT_ROWS == 8 (one
sublane tile, zero padding waste): the overlay's neighbor-row anchors
are read from the flattened anchor planes with static per-row bit
shifts.  57 -> 120 Mbp/s/chip honest all-call rate; outputs stay
bit-equal to scan_pallas_full.generate_masks_pallas (cross-checked in
tests/test_pallas.py, incl. the unpatched shipped geometry, and by an
on-chip diffcount).

Reference citations as v2/v3: fasta_utils.cpp:120-122, 146-160, 165,
parse_anchored_shiftxor.cpp:20-56, parse_substitute_shiftxor.cpp:391-577,
parse_perfect_shiftxor.cpp:146-226.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .config import RibbitConfig
from .scan_pallas_v2 import (CAP, LPAD, _row_iota, _lane_iota, _win8,
                             _lead_ones, _nsp_of)

TILE = 32768
RPAD = 768           # right context: max_shift + EXT overhang
EXT = LPAD + TILE + CAP + 128
CHUNK = LPAD + TILE + RPAD
OUT_ROWS = 8         # output rows per call == rb (round 6: the anchor
                     # pass moved to scan_events_pallas._anchor_rows, so
                     # this kernel has NO ladders and NO row halo — one
                     # full sublane tile per call, zero padding waste)
AROWS = 16           # anchor-plane packing (scan_events_pallas.AROWS)
HALO_R = 2           # overlay needs anchors of rows r-2..r+2


def _kernel(L_ref, comb_hbm, anch_hbm, q7_ref, q6_ref, ps_ref, pm_ref,
            eq_scr, nb_scr, cbuf, abuf0, abuf1, sems, *, rb, row0,
            min_shift, max_shift, p0, npad):
    """rb == OUT_ROWS rows of the shift space starting at global row
    `row0`, all useful (no halo): the overlay's neighbor-row anchors are
    read from the pass-1 anchor planes (scan_events_pallas._anchor_rows;
    flattened to (1, 8*npad) — Mosaic rejects size-1 leading-dim slices,
    but a 128-aligned lane slice at pi*npad + base is the comb stream's
    own DMA pattern), so this kernel runs NO run-length ladders."""
    L = L_ref[0, 0]
    i = pl.program_id(0)
    n = pl.num_programs(0)
    NS = max_shift - min_shift + 1
    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    def tile_dma(s, tidx):
        base = tidx * TILE
        return pltpu.make_async_copy(comb_hbm.at[:, pl.ds(base, CHUNK)],
                                     cbuf.at[s], sems.at[s, 0])

    def adma(s, tidx, which, buf):
        off = (p0 + which) * npad + tidx * TILE
        return pltpu.make_async_copy(
            anch_hbm.at[:, pl.ds(off, CHUNK)],
            buf.at[s], sems.at[s, 1 + which])

    def start_all(s, tidx):
        tile_dma(s, tidx).start()
        adma(s, tidx, 0, abuf0).start()
        adma(s, tidx, 1, abuf1).start()

    def wait_all(s, tidx):
        tile_dma(s, tidx).wait()
        adma(s, tidx, 0, abuf0).wait()
        adma(s, tidx, 1, abuf1).wait()

    @pl.when(i == 0)
    def _():
        start_all(0, 0)

    @pl.when(i + 1 < n)
    def _():
        start_all(nxt, i + 1)

    wait_all(slot, i)

    base = i * TILE
    # ONE combined int32 stream halves the kernel's HBM read bytes (it was
    # 74.7%% of the HBM roofline with separate code+mask streams): comb =
    # code + 125*n_mask, split with two cheap vector ops
    comb = cbuf[slot]
    nmv = (comb >= 125).astype(jnp.int32)
    buf = comb - 125 * nmv

    # raw eq rows into scratch: local row r = global shift min_shift+row0+r
    here = buf[:, :EXT]
    for r in range(rb):
        g = row0 + r
        if g < NS:
            s = min_shift + g
            eq_scr[r:r + 1, :] = (here == buf[:, s:s + EXT]).astype(jnp.int32)
        else:
            eq_scr[r:r + 1, :] = jnp.zeros((1, EXT), jnp.int32)

    # neighbor-row anchors from the packed planes: static plane/bit per
    # (r, d), one shift+mask each
    A0 = abuf0[slot][:, :EXT]
    A1 = abuf1[slot][:, :EXT]
    for r in range(rb):
        acc = None
        for d in (-2, -1, 1, 2):
            g = row0 + r + d
            if 0 <= g < NS:
                pi, bit = divmod(g, AROWS)
                assert p0 <= pi <= p0 + 1, (row0, r, d, pi, p0)
                src = A0 if pi == p0 else A1
                v = jax.lax.shift_right_logical(src, jnp.int32(bit)) & 1
                acc = v if acc is None else (acc | v)
        nb_scr[r:r + 1, :] = (acc if acc is not None
                              else jnp.zeros((1, EXT), jnp.int32))

    pos = _lane_iota(rb, EXT) + base - LPAD           # sequence position
    rr = _row_iota(rb, EXT) + row0                    # global row index
    valid_row = rr < NS

    eq = eq_scr[:, :] * ((pos < L) & valid_row)
    ov = eq | nb_scr[:, :]

    # N-free windows (shared across rows)
    nfree = (_win8(nmv[:, :EXT], 1, EXT)[:, LPAD:LPAD + TILE] == 0)

    # window popcounts on eq (threshold 7) and overlay (threshold 6);
    # every rb row is an output row (no halo since the two-pass redesign)
    s8 = _win8(eq, rb, EXT)[:, LPAD:LPAD + TILE]
    o8 = _win8(ov, rb, EXT)[:, LPAD:LPAD + TILE]
    q7_ref[:, :] = ((s8 >= 7) & nfree).astype(jnp.int8)
    q6_ref[:, :] = ((o8 >= 6) & nfree).astype(jnp.int8)

    # perfect runs: eq & ~N, start flags with len >= per-motif cutoff
    pm = eq * (nmv[:, :EXT] == 0)
    lead_pm = _lead_ones(pm, rb, EXT, steps=7)
    sl = slice(LPAD, LPAD + TILE)
    pm_t = pm[:, sl]
    prev = pm[:, LPAD - 1:LPAD + TILE - 1]
    m_row = _row_iota(rb, TILE) + row0 + min_shift
    cutoff = jnp.where(m_row <= 6, 12 - m_row, m_row)
    ps = pm_t * (1 - prev) * (lead_pm[:, sl] >= cutoff)
    ps_ref[:, :] = ps.astype(jnp.int8)
    pm_ref[:, :] = pm_t.astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("rb", "row0", "min_shift",
                                             "max_shift", "p0",
                                             "interpret"))
def _scan_rows(comb2d, anch2d, L, *, rb, row0, min_shift,
               max_shift, p0, interpret):
    Lp = comb2d.shape[1] - LPAD - RPAD
    grid = (Lp // TILE,)
    out_shape = [jax.ShapeDtypeStruct((rb, Lp), jnp.int8)
                 for _ in range(4)]
    out_specs = [pl.BlockSpec((rb, TILE), lambda i: (0, i),
                              memory_space=pltpu.VMEM) for _ in range(4)]
    kernel = functools.partial(_kernel, rb=rb, row0=row0,
                               min_shift=min_shift, max_shift=max_shift,
                               p0=p0, npad=comb2d.shape[1])
    L_arr = jnp.asarray(L, dtype=jnp.int32).reshape(1, 1)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((rb, EXT), jnp.int32),
                        pltpu.VMEM((rb, EXT), jnp.int32),
                        pltpu.VMEM((2, 1, CHUNK), jnp.int32),
                        pltpu.VMEM((2, 1, CHUNK), jnp.int32),
                        pltpu.VMEM((2, 1, CHUNK), jnp.int32),
                        pltpu.SemaphoreType.DMA((2, 3))],
        interpret=interpret,
    )(L_arr, comb2d, anch2d)


def _scan_all(comb2d, L, *, nsp, min_shift, max_shift, interpret):
    """Two-pass row-split sweep (round 6): the anchor planes come from
    scan_events_pallas._anchor_rows (16 rows/word, ladders once per shift
    row, no halo), then ceil(nsp / OUT_ROWS) ladder-free 8-row calls
    produce the four dense planes, concatenated to [nsp, Lp] like v3.

    row0/p0 are static, so the default config compiles ~20 kernel
    variants; Mosaic compiles each 8/16-row program in about a second
    (whole sweep cached thereafter)."""
    from . import scan_events_pallas as ev
    assert ev.TILE == TILE and ev.LPAD == LPAD and ev.RPAD == RPAD, \
        "anchor pass geometry must match (shared comb stream layout)"

    aplanes = []
    nap = (nsp + AROWS - 1) // AROWS
    for h in range(nap):
        arow0 = h * AROWS
        s_max = min(min_shift + arow0 + AROWS - 1, max_shift)
        lsteps = max(3, (2 * s_max - 1).bit_length())
        aplanes.append(ev._anchor_rows(comb2d, L, rb=AROWS, row0=arow0,
                                       min_shift=min_shift,
                                       max_shift=max_shift, lsteps=lsteps,
                                       interpret=interpret))
    anch2d = jnp.pad(jnp.concatenate(aplanes, axis=0),
                     ((0, 1), (LPAD, RPAD))).reshape(1, -1)

    halves = []
    nhalf = (nsp + OUT_ROWS - 1) // OUT_ROWS
    for h in range(nhalf):
        row0 = h * OUT_ROWS
        p0 = max(0, (row0 - HALO_R) // AROWS)
        outs = _scan_rows(comb2d, anch2d, L, rb=OUT_ROWS, row0=row0,
                          min_shift=min_shift, max_shift=max_shift,
                          p0=p0, interpret=interpret)
        halves.append(outs)
    return tuple(jnp.concatenate([halves[h][j] for h in range(nhalf)], axis=0)
                 for j in range(4))


def _pad_inputs(code: np.ndarray, n_mask: np.ndarray):
    """int32 padded (1, LPAD+Lp+RPAD) arrays with non-matching sentinels in
    the left pad (codes 5.. never equal a base) and N in the right pad."""
    L = code.shape[0]
    Lp = ((L + TILE - 1) // TILE) * TILE
    # ONE combined stream (code + 125 * n_mask): halves HBM read bytes
    code_p = np.zeros(LPAD + Lp + RPAD, dtype=np.int32)
    code_p[LPAD:LPAD + L] = code
    code_p[:LPAD] = (np.arange(-LPAD, 0) % 120) + 5
    nm_p = np.ones(LPAD + Lp + RPAD, dtype=np.int32)
    nm_p[LPAD:LPAD + L] = n_mask.astype(np.int32)
    return (code_p + 125 * nm_p).reshape(1, -1)


def generate_masks_pallas_v4(code: np.ndarray, n_mask: np.ndarray,
                             cfg: RibbitConfig, interpret: bool = False):
    """All-channels generation masks via the row-split manual-DMA kernel.
    Returns int8 [nmotifs, L]: (qual7, qual6, perfect_start, perfect_mask)
    bit-equal to scan_pallas_full.generate_masks_pallas."""
    L = code.shape[0]
    comb_p = _pad_inputs(code, n_mask)
    nsp = _nsp_of(cfg)
    res = _scan_all(jnp.asarray(comb_p), jnp.int32(L),
                    nsp=nsp, min_shift=cfg.min_shift,
                    max_shift=cfg.max_shift, interpret=interpret)
    r0 = cfg.min_motif - cfg.min_shift
    r1 = cfg.max_motif - cfg.min_shift + 1
    return tuple(np.asarray(r)[r0:r1, :L] for r in res)
