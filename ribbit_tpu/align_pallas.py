"""Batched SSW forward scoring as a Pallas TPU kernel.

The refinement stage aligns every seed against its pseudo-perfect repeat
(SURVEY.md §7.5: replace the SSE2 striped Smith-Waterman with a batched
banded/affine DP device kernel).  This kernel computes the exact forward
local-alignment pass of the SSW semantics (align.py / csrc/ribbit_align.c)
for a BATCH of (read, ref) pairs:

    per ref column i:
      diag[j] = H[j-1] + score(ref[i], read[j])   (clamped at 32767)
      h0      = max(diag, E, 0)
      F[j]    = max(0, P[j-1] - GAP_O - (j-1)*GAP_E),  P = prefix-max(h0+j)
      Hn      = max(h0, F);  E = max(E-GAP_E, Hn-GAP_O, 0)

with the reference's exact tie rules: best score takes the FIRST strictly
greater column (end_ref), and end_read is the SMALLEST read index reaching
the best score within that column.  An optional `terminate` reproduces the
reverse pass's early stop (first column whose max equals the target) by
masked tracking — no data-dependent loop bounds.

Mapping: 8 pairs per grid step ride the sublanes, read positions ride the
lanes; the column loop is a fori_loop carrying [8, R] H/E state; the
F prefix-max uses log-step lane rolls (2-D values only — this Mosaic
toolchain rejects 1-D roll).  The banded traceback stays on the host
(csrc/ribbit_align.c banded_sw): it is O(len * band) and sequential by
nature, while the two O(len^2) scoring passes are the device work.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GAP_O = 3
GAP_E = 1
WORD_MAX = 32767
BATCH = 8            # pairs per grid step (sublanes)
NEG = -(1 << 24)


def _prefix_max_lanes(x, width):
    """Inclusive prefix max along lanes of a (BATCH, width) int32 array."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (BATCH, width), 1)
    p = x
    step = 1
    while step < width:
        rolled = pltpu.roll(p, step, 1)
        rolled = jnp.where(lane < step, NEG, rolled)
        p = jnp.maximum(p, rolled)
        step *= 2
    return p


def _fwd_kernel(read_ref, ref_ref, rlen_ref, clen_ref, term_ref,
                score_ref, endref_ref, endread_ref, firsthit_ref, *, R, C):
    """One grid step: BATCH pairs.
    read/ref: int32[BATCH, R]/[BATCH, C] (padded with 4=N beyond lens);
    rlen/clen/term: int32[BATCH, 128] (lane 0 holds the value).
    Outputs int32[BATCH, 128]: lane 0 = score / end_ref / end_read /
    first column whose max equals terminate (or -1)."""
    reads = read_ref[:, :]
    rlen = rlen_ref[:, 0][:, None]
    clen = clen_ref[:, 0][:, None]
    term = term_ref[:, 0][:, None]

    lane = jax.lax.broadcasted_iota(jnp.int32, (BATCH, R), 1)
    read_valid = lane < rlen

    def body(i, carry):
        H, E, best, end_ref, end_read, first_hit = carry
        # refs live in SMEM: dynamic per-column scalar reads are legal there
        # (a dynamic lane index into VMEM is not, Mosaic alignment rule)
        rc = jnp.stack(
            [ref_ref[b, i] for b in range(BATCH)]).reshape(BATCH, 1)
        col_active = (i < clen)                           # [BATCH, 1]

        sc = jnp.where((rc == reads) & (rc < 4), 2, -2)
        Hshift = jnp.where(lane < 1, 0, pltpu.roll(H, 1, 1))
        diag = jnp.minimum(Hshift + sc, WORD_MAX)
        h0 = jnp.maximum(jnp.maximum(diag, E), 0)
        h0 = jnp.where(read_valid, h0, 0)

        A = h0 + lane * GAP_E
        P = _prefix_max_lanes(A, R)
        Pshift = jnp.where(lane < 1, NEG, pltpu.roll(P, 1, 1))
        F = jnp.maximum(Pshift - GAP_O - (lane - 1) * GAP_E, 0)
        F = jnp.where(lane < 1, 0, F)

        Hn = jnp.maximum(h0, F)
        Hn = jnp.where(read_valid, Hn, 0)
        En = jnp.maximum(jnp.maximum(E - GAP_E, Hn - GAP_O), 0)
        En = jnp.where(read_valid, En, 0)

        colmax = jnp.max(Hn, axis=1, keepdims=True)       # [BATCH, 1]
        improved = col_active & (colmax > best)
        # end_read: smallest j with Hn == colmax in an improving column
        jcand = jnp.where(Hn == colmax, lane, R + 1)
        jmin = jnp.min(jcand, axis=1, keepdims=True)
        best2 = jnp.where(improved, colmax, best)
        end_ref2 = jnp.where(improved, i, end_ref)
        end_read2 = jnp.where(improved, jmin, end_read)
        # terminate tracking: first column whose max equals `term`
        hit = col_active & (first_hit < 0) & (colmax == term) & (term >= 0)
        first_hit2 = jnp.where(hit, i, first_hit)
        # freeze state updates after the first hit (the reference breaks)
        frozen = (term >= 0) & (first_hit >= 0)
        H2 = jnp.where(frozen | ~col_active, H, Hn)
        E2 = jnp.where(frozen | ~col_active, E, En)
        best3 = jnp.where(frozen, best, best2)
        end_ref3 = jnp.where(frozen, end_ref, end_ref2)
        end_read3 = jnp.where(frozen, end_read, end_read2)
        return H2, E2, best3, end_ref3, end_read3, first_hit2

    zero = jnp.zeros((BATCH, R), jnp.int32)
    none1 = jnp.full((BATCH, 1), -1, jnp.int32)
    zero1 = jnp.zeros((BATCH, 1), jnp.int32)
    H, E, best, end_ref, end_read, first_hit = jax.lax.fori_loop(
        0, C, body, (zero, zero, zero1, none1, none1, none1))

    pad = jnp.zeros((BATCH, 128), jnp.int32)
    score_ref[:, :] = pad + best
    endref_ref[:, :] = pad + end_ref
    endread_ref[:, :] = pad + end_read
    firsthit_ref[:, :] = pad + first_hit


@functools.partial(jax.jit, static_argnames=("R", "C", "interpret"))
def _fwd_call(reads, refs, rlens, clens, terms, *, R, C, interpret):
    B = reads.shape[0]
    grid = (B // BATCH,)
    blk1 = lambda i: (i, 0)
    out_specs = [pl.BlockSpec((BATCH, 128), blk1, memory_space=pltpu.VMEM)
                 for _ in range(4)]
    out_shape = [jax.ShapeDtypeStruct((B, 128), jnp.int32) for _ in range(4)]
    kernel = functools.partial(_fwd_kernel, R=R, C=C)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BATCH, R), blk1, memory_space=pltpu.VMEM),
            pl.BlockSpec((BATCH, C), blk1, memory_space=pltpu.SMEM),
            pl.BlockSpec((BATCH, 128), blk1, memory_space=pltpu.VMEM),
            pl.BlockSpec((BATCH, 128), blk1, memory_space=pltpu.VMEM),
            pl.BlockSpec((BATCH, 128), blk1, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(reads, refs, rlens, clens, terms)


def batch_forward(reads: list, refs: list, terminates: list | None = None,
                  interpret: bool = False):
    """Exact SSW forward pass for a batch of (read, ref) code pairs.

    reads/refs: lists of int8 arrays (values 0..4).  terminates: optional
    per-pair early-stop targets (reverse-pass mode), -1/None = full scan.
    Returns (score, end_ref, end_read, first_hit_col) int arrays [n]."""
    n = len(reads)
    R = 128 * max(1, -(-max((r.shape[0] for r in reads), default=1) // 128))
    C = 128 * max(1, -(-max((r.shape[0] for r in refs), default=1) // 128))
    B = BATCH * -(-n // BATCH)

    rd = np.full((B, R), 4, dtype=np.int32)
    rf = np.full((B, C), 4, dtype=np.int32)
    rl = np.zeros((B, 128), dtype=np.int32)
    cl = np.zeros((B, 128), dtype=np.int32)
    tm = np.full((B, 128), -1, dtype=np.int32)
    for i in range(n):
        rd[i, :reads[i].shape[0]] = reads[i]
        rf[i, :refs[i].shape[0]] = refs[i]
        rl[i, 0] = reads[i].shape[0]
        cl[i, 0] = refs[i].shape[0]
        if terminates is not None and terminates[i] is not None:
            tm[i, 0] = terminates[i]

    score, end_ref, end_read, first_hit = _fwd_call(
        jnp.asarray(rd), jnp.asarray(rf), jnp.asarray(rl), jnp.asarray(cl),
        jnp.asarray(tm), R=R, C=C, interpret=interpret)
    return (np.asarray(score)[:n, 0], np.asarray(end_ref)[:n, 0],
            np.asarray(end_read)[:n, 0], np.asarray(first_hit)[:n, 0])
