"""Full scan generation as a Pallas TPU kernel.

Extends scan_pallas.py (match bitmaps + window sums) to the ENTIRE
O(NSHIFTS*L) generation pass: anchor runs, the anchored overlay, qualified
windows at both thresholds, and perfect-run start flags — everything the
event epilogue needs, computed per tile on the VPU with no data-dependent
control flow.

Key technique: run lengths by logarithmic doubling.  trail[p] = length of
the 1-run ending at p (capped at 256) computes in 8 select+shift steps:
with t_j[p] = min(trail[p], 2^j),
    t_{j+1}[p] = t_j[p] + (t_j[p] == 2^j ? t_j[p - 2^j] : 0).
lead[p] is the mirror.  The cap is sound: anchor-eligible runs are
< 2*max_shift = 204 < 256 (parse_anchored_shiftxor.cpp:20-56), and the
perfect-run cutoff test needs only len >= cutoff <= 100 — capped values
fail/pass those tests identically.

Per pallas_call: GROUP motif channels (static unroll; eq computed for the
GROUP+4 neighbor shifts the overlay needs), grid over TILE-lane tiles, one
lane-aligned load per program (the 256-lane left context for the doubling
is pre-padded so loads stay aligned).

Outputs per motif channel (int32 planes): qual7 mask, qual6 mask,
perfect-run start flags (len-filtered), perfect mask (eq & ~N, for the
end-finding suffix scan in the XLA epilogue).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .config import RibbitConfig, ANCHOR_SIZE, WINDOW_LENGTH

TILE = 512
GROUP = 8            # motif channels per pallas_call (eq rows = GROUP + 4)
CAP = 256            # run-length doubling cap (>= 2*max_shift)
LPAD = 256           # pre-pad so left-context loads stay lane-aligned
RPAD = 640           # right context: CAP + max_shift + window + slack


def _lane_iota(width):
    """(1, width) lane indices — all kernel values stay 2-D: this Mosaic
    toolchain lowers roll/concatenate only for >= 2-D operands."""
    return jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)


def _trail_ones(eq, width):
    """t[0, p] = min(256, # consecutive 1s ending at p).  eq: int32[1, width]
    with >= CAP valid context on the left of every queried position."""
    lane = _lane_iota(width)
    t = eq
    for j in range(8):                      # caps 1,2,4,...,256
        step = 1 << j
        shifted = jnp.where(lane < step, 0, pltpu.roll(t, step, 1))
        t = t + jnp.where(t == step, shifted, 0)
    return t


def _lead_ones(eq, width):
    """l[0, p] = min(256, # consecutive 1s starting at p)."""
    lane = _lane_iota(width)
    t = eq
    for j in range(8):
        step = 1 << j
        # left shift by `step` == circular right roll by width - step
        shifted = jnp.where(lane >= width - step, 0,
                            pltpu.roll(t, width - step, 1))
        t = t + jnp.where(t == step, shifted, 0)
    return t


def _gen_kernel_body(L_ref, code_ref, nmask_ref, q7_ref, q6_ref, ps_ref,
                     pm_ref, *, m0, nmot, min_shift):
    """Motif channels m0..m0+nmot-1.  code/nmask: int32[1, LPAD+Lp+RPAD]
    (index LPAD+p = position p).  Outputs: int32[GROUP, TILE] blocks."""
    L = L_ref[0, 0]
    i = pl.program_id(0)
    base = i * TILE                          # position of lane 0
    W = WINDOW_LENGTH

    # aligned load covering [base - LPAD, base + TILE + RPAD); all values
    # keep a leading (1,) dim (1-D roll/concat do not lower through Mosaic)
    buf = code_ref[:, pl.ds(base, LPAD + TILE + RPAD)]
    nbuf = nmask_ref[:, pl.ds(base, LPAD + TILE + RPAD)]

    # positions relative to this tile, for bounds tests
    ext_w = LPAD + TILE + CAP + W            # eq extent we compute per shift
    pos_ext = (jax.lax.broadcasted_iota(jnp.int32, (1, ext_w), 1)
               + base - LPAD)

    # n-window sums for the tile (shared): nfree[p] = no N in [p, p+8)
    nw = nbuf[:, LPAD:LPAD + TILE + W]
    nsum = nw[:, :TILE]
    for w in range(1, W):
        nsum = nsum + nw[:, w:TILE + w]
    nfree = nsum == 0

    # eq + anchors for the neighbor shift range [m0-2, m0+nmot+1]
    shifts = list(range(max(1, m0 - 2), m0 + nmot + 2))
    eq_rows = {}
    anch_rows = {}
    for s in shifts:
        here = buf[:, :ext_w]
        there = buf[:, s:s + ext_w]
        eq = ((here == there) & (pos_ext < L)).astype(jnp.int32)
        eq_rows[s] = eq
        # anchors: position p (tile-relative window [0, TILE+W)) lies in a
        # closed run of length in [ANCHOR_SIZE, 2s) within positions
        # [0, L-1-s] (parse_anchored_shiftxor.cpp:20-56)
        hi = L - s
        b = (eq == 1) & (pos_ext < hi)
        bi = b.astype(jnp.int32)
        trail = _trail_ones(bi, ext_w)
        lead = _lead_ones(bi, ext_w)
        # slice to the tile window [LPAD, LPAD+TILE+W)
        sl = slice(LPAD, LPAD + TILE + W)
        t_t, l_t, b_t = trail[:, sl], lead[:, sl], b[:, sl]
        p_t = pos_ext[:, sl]
        rlen = t_t + l_t - 1
        run_end = p_t + l_t                  # exclusive; exact when < cap
        anch = (b_t & (run_end < hi) & (rlen >= ANCHOR_SIZE)
                & (rlen < 2 * s))
        anch_rows[s] = anch.astype(jnp.int32)

    q7_out, q6_out, ps_out, pm_out = [], [], [], []
    zero = jnp.zeros((1, TILE), jnp.int32)
    for k in range(GROUP):
        if k >= nmot:
            q7_out.append(zero)
            q6_out.append(zero)
            ps_out.append(zero)
            pm_out.append(zero)
            continue
        m = m0 + k
        eq_t = eq_rows[m][:, LPAD:LPAD + TILE + W]

        # substitution windows: popcount8(eq) >= 7 & N-free
        s8 = eq_t[:, :TILE]
        for w in range(1, W):
            s8 = s8 + eq_t[:, w:TILE + w]
        q7_out.append(((s8 >= 7) & nfree).astype(jnp.int32))

        # anchored overlay: eq | anchors of neighbor shifts (clipped >= 1)
        ov = eq_t
        lo = m - 2 if m > 2 else 1
        for s in range(lo, m + 3):
            if s == m or s not in anch_rows:
                continue
            ov = ov | anch_rows[s][:, :TILE + W]
        o8 = ov[:, :TILE]
        for w in range(1, W):
            o8 = o8 + ov[:, w:TILE + w]
        q6_out.append(((o8 >= 6) & nfree).astype(jnp.int32))

        # perfect runs: eq & ~N, start flags with len >= branch-min cutoff
        pm_ext = (eq_rows[m] == 1) & (nbuf[:, :ext_w] == 0)
        pmi = pm_ext.astype(jnp.int32)
        lead_pm = _lead_ones(pmi, ext_w)
        sl = slice(LPAD, LPAD + TILE)
        pm_t = pmi[:, sl]
        prev = pmi[:, LPAD - 1:LPAD + TILE - 1]
        cutoff = 12 - m if m <= 6 else m
        ps = pm_t * (1 - prev) * (lead_pm[:, sl] >= cutoff).astype(jnp.int32)
        ps_out.append(ps)
        pm_out.append(pm_t)

    q7_ref[:, :] = jnp.concatenate(q7_out, axis=0)
    q6_ref[:, :] = jnp.concatenate(q6_out, axis=0)
    ps_ref[:, :] = jnp.concatenate(ps_out, axis=0)
    pm_ref[:, :] = jnp.concatenate(pm_out, axis=0)


@functools.partial(jax.jit, static_argnames=("m0", "nmot", "min_shift",
                                             "interpret"))
def _gen_group(code2d, nmask2d, L, *, m0, nmot, min_shift, interpret):
    Lp = code2d.shape[1] - LPAD - RPAD
    grid = (Lp // TILE,)
    out_shape = [jax.ShapeDtypeStruct((GROUP, Lp), jnp.int32)
                 for _ in range(4)]
    out_specs = [pl.BlockSpec((GROUP, TILE), lambda i: (0, i),
                              memory_space=pltpu.VMEM) for _ in range(4)]
    kernel = functools.partial(_gen_kernel_body, m0=m0, nmot=nmot,
                               min_shift=min_shift)
    L_arr = jnp.asarray(L, dtype=jnp.int32).reshape(1, 1)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(L_arr, code2d, nmask2d)


def generate_masks_pallas(code: np.ndarray, n_mask: np.ndarray,
                          cfg: RibbitConfig, interpret: bool = False):
    """All-channels generation masks via the Pallas kernel.

    Returns int8 arrays [nmotifs, L]: (qual7, qual6, perfect_start,
    perfect_mask) matching the host/XLA generation semantics.  qual*
    columns beyond L-8 are zero (no window)."""
    L = code.shape[0]
    Lp = ((L + TILE - 1) // TILE) * TILE
    code_p = np.zeros(LPAD + Lp + RPAD, dtype=np.int32)
    code_p[LPAD:LPAD + L] = code
    nm_p = np.ones(LPAD + Lp + RPAD, dtype=np.int32)
    nm_p[LPAD:LPAD + L] = n_mask.astype(np.int32)
    # pads behave as N everywhere; the LPAD prefix is N so runs cannot
    # extend left of position 0... but eq uses raw code: the prefix codes
    # are 0 which would fake matches at negative positions.  Positions < 0
    # are excluded by the pos < ... masks only for >= L; guard the left by
    # making prefix codes distinct sentinels that never match.
    code_p[:LPAD] = np.arange(-LPAD, 0) % 251 + 5   # non-matching sentinels
    c2 = jnp.asarray(code_p).reshape(1, -1)
    n2 = jnp.asarray(nm_p).reshape(1, -1)

    outs = [[] for _ in range(4)]
    m = cfg.min_motif
    while m <= cfg.max_motif:
        nmot = min(GROUP, cfg.max_motif - m + 1)
        res = _gen_group(c2, n2, jnp.int32(L), m0=m, nmot=nmot,
                         min_shift=cfg.min_shift, interpret=interpret)
        for o, r in zip(outs, res):
            o.append(np.asarray(r)[:nmot, :L])
        m += nmot
    return tuple(np.concatenate(o).astype(np.int8) for o in outs)


def scan_events_via_pallas(code: np.ndarray, n_mask: np.ndarray,
                           cfg: RibbitConfig, interpret: bool = False):
    """Event streams for CoreSession.set_events, produced by the Pallas
    generation kernel (mask planes) + a numpy run-compaction epilogue."""
    from .scan_host import _runs

    L = code.shape[0]
    q7, q6, ps, pm = generate_masks_pallas(code, n_mask, cfg,
                                           interpret=interpret)
    nm = cfg.nmotifs
    nw = max(L - WINDOW_LENGTH + 1, 0)

    def qual_group(q):
        starts, ends, offs = [], [], [0]
        for d in range(nm):
            s, e = _runs(q[d, :nw].astype(bool))
            starts.append(s)
            ends.append(e)
            offs.append(offs[-1] + s.shape[0])
        return (np.concatenate(starts).astype(np.int64),
                np.concatenate(ends).astype(np.int64),
                np.array(offs, dtype=np.int64))

    def perfect_group():
        starts, ends, offs = [], [], [0]
        for d in range(nm):
            rs, re = _runs(pm[d].astype(bool))
            flagged = np.flatnonzero(ps[d]).astype(np.int64)
            # every flagged position is a pm-run start; find its run end
            idx = np.searchsorted(rs, flagged)
            starts.append(flagged)
            ends.append(re[idx].astype(np.int64))
            offs.append(offs[-1] + flagged.shape[0])
        return (np.concatenate(starts), np.concatenate(ends),
                np.array(offs, dtype=np.int64))

    return perfect_group(), qual_group(q7), qual_group(q6)
