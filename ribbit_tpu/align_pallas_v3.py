"""Inter-task batched SSW forward scoring — Pallas TPU kernel, v3.

Same one-pair-per-lane mapping and cell semantics as align_pallas_v2 (a
direct transliteration of align.py:_forward_pass / csrc/ribbit_align.c,
replacing the reference's SSE2 striped kernel, ssw.c:197-386), but the row
loop runs in UNROLLED BLOCKS of RB=8 rows: one dynamic sublane-group load /
store of [8, G, 128] per block instead of per-row VMEM traffic, and 8x
fewer fori_loop iterations — the v2 kernel spent most of its time in
per-row loop overhead (23 GCUPS at ~15 vector ops per 1024-lane cell).
The j-chain (h_old[j-1], h0[j-1], lazy-F) stays sequential across the 8
statically-indexed sub-rows, so tie-breaks and clamping are bit-identical.
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
NEG = -(1 << 24)
TILE = 1024                   # pairs per grid step, shaped (8, 128)
RB = 8                        # rows per unrolled block

# VMEM budget: read R + ref C + H/E scratch 2R rows of 4 KB each
MAX_ROWS = 2560               # (3R + C) cap, ~10.5 MB of the 16 MB VMEM


def _fwd_kernel(read_ref, ref_ref, rlen_ref, clen_ref, term_ref,
                score_ref, endref_ref, endread_ref, firsthit_ref,
                H_ref, E_ref, *, R, C, G):
    """One grid step: G*128 pairs, one per lane of a (G, 128) tile."""
    rlen = rlen_ref[:, :]
    clen = clen_ref[:, :]
    term = term_ref[:, :]

    H_ref[:, :, :] = jnp.zeros((R, G, 128), jnp.int32)
    E_ref[:, :, :] = jnp.zeros((R, G, 128), jnp.int32)
    # derive loop-carry inits from a real VMEM load: literal/folded zeros
    # get a replicated layout that Mosaic cannot re-materialize across a
    # fori_loop carry whose body yields concrete-layout values
    zero = H_ref[0, :, :]
    none1 = zero - 1

    nb = R // RB

    def col(i, carry):
        best, end_ref, end_read, first_hit = carry
        # the reference breaks AFTER the terminating column, so the freeze
        # mask for column i comes from hits in columns < i
        frozen = (term >= 0) & (first_hit >= 0)
        col_active = (i < clen) & ~frozen
        rc = ref_ref[i, :, :]
        is_base = rc < 4

        def row_block(jb, rcarry):
            h_old_jm1, h0_prev, f, colmax, argj = rcarry
            j0 = jb * RB
            Hblk = H_ref[pl.ds(j0, RB), :, :]
            Eblk = E_ref[pl.ds(j0, RB), :, :]
            rdblk = read_ref[pl.ds(j0, RB), :, :]
            newH = []
            newE = []
            for k in range(RB):
                j = j0 + k
                read_j = rdblk[k]
                h_old_j = Hblk[k]
                e_j = Eblk[k]
                f = jnp.maximum(f - GAP_E, h0_prev - GAP_O)
                sc = jnp.where((rc == read_j) & is_base, 2, -2)
                diag = jnp.minimum(h_old_jm1 + sc, WORD_MAX)
                h0 = jnp.maximum(jnp.maximum(diag, e_j), 0)
                read_valid = j < rlen
                h0 = jnp.where(read_valid, h0, 0)
                hn = jnp.maximum(h0, jnp.maximum(f, 0))
                hn = jnp.where(read_valid, hn, 0)
                en = jnp.maximum(jnp.maximum(e_j - GAP_E, hn - GAP_O), 0)
                en = jnp.where(read_valid, en, 0)
                newH.append(jnp.where(col_active, hn, h_old_j))
                newE.append(jnp.where(col_active, en, e_j))
                # strictly-greater update == smallest j attaining the max
                greater = hn > colmax
                colmax = jnp.where(greater, hn, colmax)
                argj = jnp.where(greater, j, argj)
                h_old_jm1 = h_old_j
                h0_prev = h0
            H_ref[pl.ds(j0, RB), :, :] = jnp.stack(newH)
            E_ref[pl.ds(j0, RB), :, :] = jnp.stack(newE)
            return h_old_jm1, h0_prev, f, colmax, argj

        _, _, _, colmax, argj = jax.lax.fori_loop(
            0, nb, row_block, (zero, zero + NEG, zero + NEG, zero, none1))

        improved = col_active & (colmax > best)
        best2 = jnp.where(improved, colmax, best)
        end_ref2 = jnp.where(improved, i, end_ref)
        end_read2 = jnp.where(improved, argj, end_read)
        hit = col_active & (first_hit < 0) & (colmax == term) & (term >= 0)
        first_hit2 = jnp.where(hit, i, first_hit)
        return best2, end_ref2, end_read2, first_hit2

    best, end_ref, end_read, first_hit = jax.lax.fori_loop(
        0, C, col, (zero, none1, none1, none1))
    score_ref[:, :] = best
    endref_ref[:, :] = end_ref
    endread_ref[:, :] = end_read
    firsthit_ref[:, :] = first_hit


@functools.partial(jax.jit, static_argnames=("R", "C", "G", "interpret"))
def _fwd_call(reads, refs, rlens, clens, terms, *, R, C, G=8,
              interpret=False):
    """reads [R, B/128, 128], refs [C, B/128, 128], scalars [B/128, 128]."""
    bs = reads.shape[1]
    grid = (bs // G,)
    scal = pl.BlockSpec((G, 128), lambda g: (g, 0), memory_space=pltpu.VMEM)
    out_specs = [scal] * 4
    out_shape = [jax.ShapeDtypeStruct((bs, 128), jnp.int32)
                 for _ in range(4)]
    kernel = functools.partial(_fwd_kernel, R=R, C=C, G=G)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((R, G, 128), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, G, 128), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
            scal, scal, scal,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((R, G, 128), jnp.int32),
                        pltpu.VMEM((R, G, 128), jnp.int32)],
        interpret=interpret,
    )(reads, refs, rlens, clens, terms)


def fits(max_read_len: int, max_ref_len: int) -> bool:
    """True when the batch's padded shapes fit this kernel's VMEM budget."""
    R = RB * max(1, -(-max_read_len // RB))
    C = 8 * max(1, -(-max_ref_len // 8))
    return 3 * R + C <= MAX_ROWS


def batch_forward(reads: list, refs: list, terminates: list | None = None,
                  interpret: bool = False):
    """Exact SSW forward pass for a batch of (read, ref) code pairs.

    Same contract as align_pallas.batch_forward: returns (score, end_ref,
    end_read, first_hit_col) int arrays [n]."""
    n = len(reads)
    R = RB * max(1, -(-max((r.shape[0] for r in reads), default=1) // RB))
    C = 8 * max(1, -(-max((r.shape[0] for r in refs), default=1) // 8))
    G = 1 if interpret else 8                  # pairs per tile = G * 128
    B = G * 128 * -(-n // (G * 128))

    rd = np.full((B, R), 4, dtype=np.int32)
    rf = np.full((B, C), 4, dtype=np.int32)
    rl = np.zeros(B, dtype=np.int32)
    cl = np.zeros(B, dtype=np.int32)
    tm = np.full(B, -1, dtype=np.int32)
    for i in range(n):
        rd[i, :reads[i].shape[0]] = reads[i]
        rf[i, :refs[i].shape[0]] = refs[i]
        rl[i] = reads[i].shape[0]
        cl[i] = refs[i].shape[0]
        if terminates is not None and terminates[i] is not None:
            tm[i] = terminates[i]

    score, end_ref, end_read, first_hit = _fwd_call(
        jnp.asarray(rd.T.reshape(R, B // 128, 128)),
        jnp.asarray(rf.T.reshape(C, B // 128, 128)),
        jnp.asarray(rl.reshape(B // 128, 128)),
        jnp.asarray(cl.reshape(B // 128, 128)),
        jnp.asarray(tm.reshape(B // 128, 128)),
        R=R, C=C, G=G, interpret=interpret)
    flat = lambda a: np.asarray(a).reshape(B)[:n]
    return flat(score), flat(end_ref), flat(end_read), flat(first_hit)
