"""Pallas TPU kernel for the shift-XOR periodicity scan core.

The O(NSHIFTS * L) hot loop of the engine computes, for every shift channel
and every position, the match bit eq[s, p] = (code[p] == code[p+s]) and the
8-window popcount sum8[s, p] = sum_{k<8} eq[s, p+k] (fasta_utils.cpp:120-122
+ the windowed scans).  This kernel evaluates it tiled for the TPU:

  - grid = sequence tiles of TILE lanes; each program writes an
    (SROWS, TILE) block — SROWS shift channels ride the sublanes
    (statically unrolled; shifts are compile-time constants), positions
    ride the lanes; the full channel set runs as ceil(NSHIFTS/SROWS)
    pallas_calls (larger unrolls abort the Mosaic backend)
  - the padded code vector stays whole in VMEM (int32, 4 B/base; sequences
    are chunk-bounded well under VMEM limits by the chunked pipeline); each
    program performs ONE lane-aligned pl.ds load of its haloed window
    (Mosaic requires 128-aligned dynamic lane offsets) and derives every
    shifted view as a static in-register slice
  - window sums are 8 static lane-shifted adds (VPU elementwise); there is
    no data-dependent control flow anywhere

Outputs feed the same XLA epilogue as scan_events_tpu (threshold + N-window
masks, run compaction); parity is asserted against the scan_host reference
in tests (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .config import RibbitConfig, WINDOW_LENGTH

TILE = 512          # positions per program (lane multiples of 128)
SROWS = 32          # shift channels per pallas_call (Mosaic compiles ~32
                    # statically unrolled rows comfortably; 128 aborts)
HALO = 128          # >= max_shift + WINDOW_LENGTH, lane-aligned


def _scan_kernel_body(L_ref, code_ref, eq_ref, sum8_ref, *, min_shift,
                      nshifts):
    """L_ref: int32[1,1] true length (SMEM); code_ref: int32[1, Lpad+PAD]
    whole array in VMEM.  eq_ref/sum8_ref: int32[SROWS, TILE] output blocks
    for tile i; rows beyond nshifts are zero."""
    L = L_ref[0, 0]
    i = pl.program_id(0)
    base = i * TILE

    # one aligned load; every shifted view is a static slice of it
    buf = code_ref[0, pl.ds(base, TILE + HALO)]
    here = buf[:TILE + WINDOW_LENGTH]

    rows_eq = []
    rows_s8 = []
    zero = jnp.zeros((TILE,), jnp.int32)
    for k in range(SROWS):
        if k < nshifts:
            shift = k + min_shift
            there = buf[shift:shift + TILE + WINDOW_LENGTH]
            # zero-tail rule: for p + shift >= L the reference compares
            # against shifted-in zero bits; the pad region of `code` is 0
            # and N encodes 0, so equality against the pad reproduces it —
            # positions p >= L themselves are masked below
            eq_full = (here == there).astype(jnp.int32)
            s8 = eq_full[:TILE]
            for w in range(1, WINDOW_LENGTH):
                s8 = s8 + eq_full[w:TILE + w]
            rows_eq.append(eq_full[:TILE])
            rows_s8.append(s8)
        else:
            rows_eq.append(zero)
            rows_s8.append(zero)

    pos = jax.lax.broadcasted_iota(jnp.int32, (SROWS, TILE), 1) + base
    valid = pos < L
    eq_ref[:, :] = jnp.where(valid, jnp.stack(rows_eq), 0)
    sum8_ref[:, :] = jnp.where(valid, jnp.stack(rows_s8), 0)


@functools.partial(jax.jit,
                   static_argnames=("min_shift", "nshifts", "interpret"))
def scan_pallas(code_padded: jax.Array, L, *, min_shift: int, nshifts: int,
                interpret: bool = False):
    """code_padded: int32[Lp] zero-padded (Lp a multiple of TILE).  Returns
    (eq, sum8) as int32[SROWS, Lp]; rows beyond nshifts and columns beyond
    L are zero.  sum8[s, w] is only meaningful for w <= L - 8 (later
    windows mix pad comparisons)."""
    assert nshifts <= SROWS
    assert min_shift + nshifts - 1 + WINDOW_LENGTH <= HALO
    Lp = code_padded.shape[0]
    code2d = jnp.concatenate(
        [code_padded,
         jnp.zeros(HALO + TILE, dtype=code_padded.dtype)]).reshape(1, -1)

    grid = (Lp // TILE,)
    out_shape = [
        jax.ShapeDtypeStruct((SROWS, Lp), jnp.int32),
        jax.ShapeDtypeStruct((SROWS, Lp), jnp.int32),
    ]
    out_specs = [
        pl.BlockSpec((SROWS, TILE), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((SROWS, TILE), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    kernel = functools.partial(_scan_kernel_body, min_shift=min_shift,
                               nshifts=nshifts)
    L_arr = jnp.asarray(L, dtype=jnp.int32).reshape(1, 1)
    eq, sum8 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(L_arr, code2d)
    return eq, sum8


def scan_arrays_pallas(code: np.ndarray, cfg: RibbitConfig,
                       interpret: bool = False):
    """Host wrapper: (eq bool[NSHIFTS, L], sum8 int32[NSHIFTS, L]) matching
    scan_host.match_bitmaps and its 8-window popcounts.  Shift channels are
    processed in SROWS-sized groups, one pallas_call each (static unroll)."""
    L = code.shape[0]
    Lp = ((L + TILE - 1) // TILE) * TILE
    code_p = np.zeros(Lp, dtype=np.int32)
    code_p[:L] = code
    cj = jnp.asarray(code_p)
    eqs, sums = [], []
    s = cfg.min_shift
    remaining = cfg.nshifts
    while remaining > 0:
        n = min(SROWS, remaining)
        eq, sum8 = scan_pallas(cj, jnp.int32(L), min_shift=s, nshifts=n,
                               interpret=interpret)
        eqs.append(np.asarray(eq)[:n, :L])
        sums.append(np.asarray(sum8)[:n, :L])
        s += n
        remaining -= n
    return (np.concatenate(eqs).astype(bool), np.concatenate(sums))
