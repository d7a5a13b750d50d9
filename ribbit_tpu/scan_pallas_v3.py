"""Manual-DMA scan generation: v2 compute with HBM-resident inputs.

scan_pallas_v2 keeps the whole padded (code, nmask) arrays in VMEM
(`memory_space=VMEM` in_specs), which caps a single call at L <= ~1.5 Mbp
on a 16 MB-VMEM v5e core and leaves no headroom to lengthen the tile
(TILE 2048 OOMs).  v3 keeps the inputs in HBM (`memory_space=ANY`) and
copies each tile's halo'd slice into a double-buffered VMEM scratch with
`pltpu.make_async_copy`, prefetching tile i+1 while tile i computes
(NOTES_ROUND2 queue #6).  That removes the per-call length cap entirely
and frees ~8x L bytes of VMEM, which buys TILE=3072: the halo overhead
(LPAD+CAP+W extra lanes per tile) drops from 1.63x to 1.21x of the
output width (4096 exceeds scoped VMEM by 2.1 MB at nsp=104).

The compute body and all semantics are scan_pallas_v2's (same reference
citations: fasta_utils.cpp:120-122, 146-160, 165,
parse_anchored_shiftxor.cpp:20-56, parse_substitute_shiftxor.cpp:391-577,
parse_perfect_shiftxor.cpp:146-226); outputs are bit-equal to
scan_pallas_full.generate_masks_pallas.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .config import RibbitConfig, ANCHOR_SIZE, WINDOW_LENGTH
from .scan_pallas_v2 import (CAP, LPAD, _row_iota, _lane_iota, _win8,
                             _trail_ones, _lead_ones, _nsp_of)

TILE = 3072
RPAD = 768           # right context: max_shift + EXT overhang
# lane extent: >= LPAD + TILE + CAP + W, 128-multiple
EXT = LPAD + TILE + CAP + 128
CHUNK = LPAD + TILE + RPAD


def _kernel(L_ref, code_hbm, nmask_hbm, q7_ref, q6_ref, ps_ref, pm_ref,
            eq_scr, cbuf, nbuf, sems, *, nsp, min_shift, max_shift):
    L = L_ref[0, 0]
    i = pl.program_id(0)
    n = pl.num_programs(0)
    W = WINDOW_LENGTH
    NS = max_shift - min_shift + 1
    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    def tile_dma(s, tidx):
        base = tidx * TILE
        return (pltpu.make_async_copy(code_hbm.at[:, pl.ds(base, CHUNK)],
                                      cbuf.at[s], sems.at[s, 0]),
                pltpu.make_async_copy(nmask_hbm.at[:, pl.ds(base, CHUNK)],
                                      nbuf.at[s], sems.at[s, 1]))

    @pl.when(i == 0)
    def _():
        d0, d1 = tile_dma(0, 0)
        d0.start()
        d1.start()

    @pl.when(i + 1 < n)
    def _():
        d0, d1 = tile_dma(nxt, i + 1)
        d0.start()
        d1.start()

    w0, w1 = tile_dma(slot, i)
    w0.wait()
    w1.wait()

    base = i * TILE
    buf = cbuf[slot]
    nmv = nbuf[slot]

    # raw eq rows into scratch: row r = shift min_shift + r
    here = buf[:, :EXT]
    for r in range(NS):
        s = min_shift + r
        eq_scr[r:r + 1, :] = (here == buf[:, s:s + EXT]).astype(jnp.int32)
    if nsp > NS:
        eq_scr[NS:nsp, :] = jnp.zeros((nsp - NS, EXT), jnp.int32)

    pos = _lane_iota(nsp, EXT) + base - LPAD          # sequence position
    row_s = _row_iota(nsp, EXT) + min_shift           # row's shift value
    valid_row = _row_iota(nsp, EXT) < NS

    eq = eq_scr[:, :] * ((pos < L) & valid_row)

    # anchors: closed runs of length [ANCHOR_SIZE, 2s) within [0, L-1-s]
    hi = L - row_s                                    # per-row position bound
    b = eq * (pos < hi)
    trail = _trail_ones(b, nsp, EXT)
    lead = _lead_ones(b, nsp, EXT)
    rlen = trail + lead - 1
    run_end = pos + lead
    anch = b * ((run_end < hi) & (rlen >= ANCHOR_SIZE) & (rlen < 2 * row_s))

    # overlay: channel row r ORs anchors of rows r-2, r-1, r+1, r+2
    ov = eq
    rr = _row_iota(nsp, EXT)
    for d in (-2, -1, 1, 2):
        rolled = pltpu.roll(anch, (nsp - d) % nsp, 0)
        ok = (rr + d >= 0) & (rr + d < NS)
        ov = ov | (rolled * ok)

    # N-free windows (shared across rows)
    nfree = (_win8(nmv[:, :EXT], 1, EXT)[:, LPAD:LPAD + TILE] == 0)

    # window popcounts on eq (threshold 7) and overlay (threshold 6)
    s8 = _win8(eq, nsp, EXT)[:, LPAD:LPAD + TILE]
    o8 = _win8(ov, nsp, EXT)[:, LPAD:LPAD + TILE]
    q7_ref[:, :] = ((s8 >= 7) & nfree).astype(jnp.int8)
    q6_ref[:, :] = ((o8 >= 6) & nfree).astype(jnp.int8)

    # perfect runs: eq & ~N, start flags with len >= per-motif cutoff
    pm = eq * (nmv[:, :EXT] == 0)
    lead_pm = _lead_ones(pm, nsp, EXT, steps=7)
    sl = slice(LPAD, LPAD + TILE)
    pm_t = pm[:, sl]
    prev = pm[:, LPAD - 1:LPAD + TILE - 1]
    m_row = _row_iota(nsp, TILE) + min_shift          # motif value per row
    cutoff = jnp.where(m_row <= 6, 12 - m_row, m_row)
    ps = pm_t * (1 - prev) * (lead_pm[:, sl] >= cutoff)
    ps_ref[:, :] = ps.astype(jnp.int8)
    pm_ref[:, :] = pm_t.astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("nsp", "min_shift", "max_shift",
                                             "interpret"))
def _scan_all(code2d, nmask2d, L, *, nsp, min_shift, max_shift, interpret):
    Lp = code2d.shape[1] - LPAD - RPAD
    grid = (Lp // TILE,)
    out_shape = [jax.ShapeDtypeStruct((nsp, Lp), jnp.int8) for _ in range(4)]
    out_specs = [pl.BlockSpec((nsp, TILE), lambda i: (0, i),
                              memory_space=pltpu.VMEM) for _ in range(4)]
    kernel = functools.partial(_kernel, nsp=nsp, min_shift=min_shift,
                               max_shift=max_shift)
    L_arr = jnp.asarray(L, dtype=jnp.int32).reshape(1, 1)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((nsp, EXT), jnp.int32),
                        pltpu.VMEM((2, 1, CHUNK), jnp.int32),
                        pltpu.VMEM((2, 1, CHUNK), jnp.int32),
                        pltpu.SemaphoreType.DMA((2, 2))],
        interpret=interpret,
    )(L_arr, code2d, nmask2d)


def _pad_inputs(code: np.ndarray, n_mask: np.ndarray):
    """int32 padded (1, LPAD+Lp+RPAD) arrays with non-matching sentinels in
    the left pad (codes 5.. never equal a base) and N in the right pad."""
    L = code.shape[0]
    Lp = ((L + TILE - 1) // TILE) * TILE
    code_p = np.zeros(LPAD + Lp + RPAD, dtype=np.int32)
    code_p[LPAD:LPAD + L] = code
    code_p[:LPAD] = (np.arange(-LPAD, 0) % 120) + 5
    nm_p = np.ones(LPAD + Lp + RPAD, dtype=np.int32)
    nm_p[LPAD:LPAD + L] = n_mask.astype(np.int32)
    return code_p.reshape(1, -1), nm_p.reshape(1, -1)


def generate_masks_pallas_v3(code: np.ndarray, n_mask: np.ndarray,
                             cfg: RibbitConfig, interpret: bool = False):
    """All-channels generation masks via the manual-DMA kernel.  Returns
    int8 [nmotifs, L]: (qual7, qual6, perfect_start, perfect_mask)
    bit-equal to scan_pallas_full.generate_masks_pallas."""
    L = code.shape[0]
    code_p, nm_p = _pad_inputs(code, n_mask)
    nsp = _nsp_of(cfg)
    res = _scan_all(jnp.asarray(code_p), jnp.asarray(nm_p), jnp.int32(L),
                    nsp=nsp, min_shift=cfg.min_shift,
                    max_shift=cfg.max_shift, interpret=interpret)
    r0 = cfg.min_motif - cfg.min_shift
    r1 = cfg.max_motif - cfg.min_shift + 1
    return tuple(np.asarray(r)[r0:r1, :L] for r in res)
