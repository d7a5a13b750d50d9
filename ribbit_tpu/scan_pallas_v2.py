"""Sublane-parallel scan generation: ALL shift channels in one Pallas call.

Redesign of scan_pallas_full (same outputs, bit-equal) motivated by the
fetch-forced device benchmark: v1 keeps every value in a (1, W) layout —
one sublane of the VPU's eight — and issues one pallas_call per 8-channel
group, measuring ~1.4 Mbp/s for the full 99-channel generation.

v2 lays the SHIFT axis across sublanes: eq / anchors / overlay / windows
for every shift s in [min_shift, max_shift] live as rows of (NSP, EXT)
int32 arrays, so the run-length doubling, window popcounts and anchor
tests — the op-heavy part — run full-width on the 8x128 VPU.  The
neighbor-anchor overlay (fasta_utils.cpp:146-160) becomes four sublane
rolls instead of per-channel gathers.  One kernel instance computes every
channel for a TILE of positions; the grid walks the sequence.

Inputs are int8 (code, nmask) to cut VMEM residency and HBM traffic 4x;
outputs are int8 mask planes (qual7, qual6, perfect-start, perfect-mask)
identical in content to scan_pallas_full.generate_masks_pallas.

Semantics mirrored from the reference via scan_host.py:
  eq/shift-XOR        fasta_utils.cpp:120-122
  anchors             parse_anchored_shiftxor.cpp:20-56
  overlay             fasta_utils.cpp:146-160
  qualified windows   parse_substitute_shiftxor.cpp:391-577 (>=7),
                      threshold 6 overlay variant fasta_utils.cpp:165
  perfect runs        parse_perfect_shiftxor.cpp:146-226
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .config import RibbitConfig, ANCHOR_SIZE, WINDOW_LENGTH

TILE = 1024
CAP = 256            # run-length doubling cap (>= 2*max_shift)
LPAD = 256           # left context so trail-doubling sees CAP history
RPAD = 768           # right context: max_shift + EXT overhang
EXT = 1664           # computed lane extent: >= LPAD + TILE + CAP + W, 128-mult


def _row_iota(nrows, width):
    return jax.lax.broadcasted_iota(jnp.int32, (nrows, width), 0)


def _lane_iota(nrows, width):
    return jax.lax.broadcasted_iota(jnp.int32, (nrows, width), 1)


# The per-step circular-roll boundary masks are dropped from all three
# scan helpers (ablation: the doubling stages were 47%+21% of kernel time,
# and the masks are 1-2 vector ops of each ~5-op step).  Exactness is a
# dependency-cone argument on the tile geometry (LPAD = 256 left lanes,
# CAP + 128 = 384 right lanes beyond the [LPAD, LPAD+TILE) output slice,
# of which window sums read 7 lanes further right):
#
#   At doubling step 2^m, the only lanes reading circularly-wrapped values
#   are j < 2^m (trail: roll right) or j >= width - 2^m (lead/win8: roll
#   left).  The dependency cone of an output lane j at step m spans
#   [j - (256 - 2^m), j] for trail and [j, j + (R - 2^m + 1)] for
#   lead/win8 (R = total reach: 255, 127, or 7).  With j >= LPAD = 256 the
#   trail cone minimum is >= 2^m, and with j + 7 <= width - 378 the
#   lead/win8 cone maximum is < width - 2^m — so the cone never includes a
#   lane that performed a wrapped read at any step, and wrapped garbage
#   (which only ever lands outside every cone) cannot reach the output
#   slice.  Validated bit-equal to the masked scan_pallas_full spec on the
#   fixture suite (tests/test_pallas.py) and on-chip vs the oracle.


def _win8(x, nrows, width):
    for j in range(3):
        step = 1 << j
        x = x + pltpu.roll(x, width - step, 1)
    return x


def _trail_ones(t, nrows, width, steps=8):
    """t[r, p] = min(2**steps, consecutive 1s ending at p) per row."""
    for j in range(steps):
        step = 1 << j
        t = t + jnp.where(t == step, pltpu.roll(t, step, 1), 0)
    return t


def _lead_ones(t, nrows, width, steps=8):
    """t[r, p] = min(2**steps, consecutive 1s starting at p) per row.
    steps=7 (saturate at 128) is enough when the count is only compared
    against thresholds <= 128 (the perfect cutoffs max at 100)."""
    for j in range(steps):
        step = 1 << j
        t = t + jnp.where(t == step, pltpu.roll(t, width - step, 1), 0)
    return t


def _kernel(L_ref, code_ref, nmask_ref, q7_ref, q6_ref, ps_ref, pm_ref,
            eq_scr, *, nsp, min_shift, max_shift):
    L = L_ref[0, 0]
    base = pl.program_id(0) * TILE
    W = WINDOW_LENGTH
    NS = max_shift - min_shift + 1

    buf = code_ref[:, pl.ds(base, LPAD + TILE + RPAD)]
    nbuf = nmask_ref[:, pl.ds(base, LPAD + TILE + RPAD)]

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

    # overlay: channel row r (motif m = min_shift + r) ORs anchors of rows
    # r-2, r-1, r+1, r+2 (shifts m-2..m+2 except m, clipped to the shift
    # range -- row validity is exactly the reference's max(1, m-2) clip)
    ov = eq
    rr = _row_iota(nsp, EXT)
    for d in (-2, -1, 1, 2):
        rolled = pltpu.roll(anch, (nsp - d) % nsp, 0)
        ok = (rr + d >= 0) & (rr + d < NS)
        ov = ov | (rolled * ok)

    # N-free windows (shared across rows)
    nfree = (_win8(nbuf[:, :EXT], 1, EXT)[:, LPAD:LPAD + TILE] == 0)

    # window popcounts on eq (threshold 7) and overlay (threshold 6)
    s8 = _win8(eq, nsp, EXT)[:, LPAD:LPAD + TILE]
    o8 = _win8(ov, nsp, EXT)[:, LPAD:LPAD + TILE]
    q7_ref[:, :] = ((s8 >= 7) & nfree).astype(jnp.int8)
    q6_ref[:, :] = ((o8 >= 6) & nfree).astype(jnp.int8)

    # perfect runs: eq & ~N, start flags with len >= per-motif cutoff
    pm = eq * (nbuf[:, :EXT] == 0)
    lead_pm = _lead_ones(pm, nsp, EXT, steps=7)
    sl = slice(LPAD, LPAD + TILE)
    pm_t = pm[:, sl]
    prev = pm[:, LPAD - 1:LPAD + TILE - 1]
    # fresh iota: a lane-slice of the (nsp, EXT) iota aborts this Mosaic
    # toolchain's remote compile
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
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((nsp, EXT), jnp.int32)],
        interpret=interpret,
    )(L_arr, code2d, nmask2d)


def _pad_inputs(code: np.ndarray, n_mask: np.ndarray):
    """int8 padded (1, LPAD+Lp+RPAD) arrays with non-matching sentinels in
    the left pad (codes 5.. never equal a base) and N in the right pad."""
    L = code.shape[0]
    Lp = ((L + TILE - 1) // TILE) * TILE
    code_p = np.zeros(LPAD + Lp + RPAD, dtype=np.int32)
    code_p[LPAD:LPAD + L] = code
    code_p[:LPAD] = (np.arange(-LPAD, 0) % 120) + 5
    nm_p = np.ones(LPAD + Lp + RPAD, dtype=np.int32)
    nm_p[LPAD:LPAD + L] = n_mask.astype(np.int32)
    return code_p.reshape(1, -1), nm_p.reshape(1, -1)


def _nsp_of(cfg) -> int:
    ns = cfg.max_shift - cfg.min_shift + 1
    return max(32, ((ns + 7) // 8) * 8)


def generate_masks_pallas_v2(code: np.ndarray, n_mask: np.ndarray,
                             cfg: RibbitConfig, interpret: bool = False):
    """All-channels generation masks, one pallas_call per TILE row of the
    grid.  Returns int8 [nmotifs, L]: (qual7, qual6, perfect_start,
    perfect_mask) bit-equal to scan_pallas_full.generate_masks_pallas."""
    L = code.shape[0]
    code_p, nm_p = _pad_inputs(code, n_mask)
    nsp = _nsp_of(cfg)
    res = _scan_all(jnp.asarray(code_p), jnp.asarray(nm_p), jnp.int32(L),
                    nsp=nsp, min_shift=cfg.min_shift,
                    max_shift=cfg.max_shift, interpret=interpret)
    r0 = cfg.min_motif - cfg.min_shift
    r1 = cfg.max_motif - cfg.min_shift + 1
    return tuple(np.asarray(r)[r0:r1, :L] for r in res)
