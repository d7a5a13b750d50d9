"""Mesh-sharded refinement scoring (SURVEY §7 step 7: shard_map the DP
kernels, not just the scan).

The device-batched refinement path (refine_batched.py) scores each
alignment round as one [R, B/128, 128] Pallas batch — an embarrassingly
batch-parallel shape.  This module shards that batch's 128-lane group
axis over a 1-D device mesh with shard_map: every device runs the
one-pair-per-lane forward kernel (align_pallas_v3, ssw.c:197-386
replacement) on its group slice, with no collectives in the hot path (the
results concatenate along the sharded axis).  Oversized pairs that fall
back to the column-parallel v1 kernel stay single-device — they are rare
(beyond the v3 VMEM budget) and latency-bound, not throughput-bound.

Byte parity: the sharded forward returns bit-identical scores to the
single-device batch (tests/test_sharded_refine.py), so refine_batched's
output — already exactly the sequential path's — is unchanged.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .sharded_scan import make_mesh


def batch_forward_sharded(reads: list, refs: list,
                          terminates: Optional[list] = None,
                          mesh=None, n_devices: Optional[int] = None,
                          interpret: bool = False):
    """align_pallas_v3.batch_forward with the pair-group axis sharded over
    the mesh.  Same contract: (score, end_ref, end_read, first_hit) [n]."""
    from .. import align_pallas_v3 as v3

    if mesh is None:
        mesh = make_mesh(n_devices)
    ndev = mesh.devices.size
    axis = mesh.axis_names[0]

    n = len(reads)
    RB = v3.RB
    R = RB * max(1, -(-max((r.shape[0] for r in reads), default=1) // RB))
    C = 8 * max(1, -(-max((r.shape[0] for r in refs), default=1) // 8))
    G = 1 if interpret else 8                  # pairs per tile = G * 128
    # group count: multiple of (devices * G) so every shard's grid divides
    per = 128 * G * ndev
    B = per * -(-n // per)

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

    NG = B // 128

    def local(rd, rf, rl, cl, tm):
        return v3._fwd_call(rd, rf, rl, cl, tm, R=R, C=C, G=G,
                            interpret=interpret)

    sharded = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis, None),
                  P(axis, None), P(axis, None), P(axis, None)),
        out_specs=(P(axis, None),) * 4,
        check_vma=False))      # pallas_call outputs carry no vma metadata

    score, end_ref, end_read, first_hit = sharded(
        jnp.asarray(rd.T.reshape(R, NG, 128)),
        jnp.asarray(rf.T.reshape(C, NG, 128)),
        jnp.asarray(rl.reshape(NG, 128)),
        jnp.asarray(cl.reshape(NG, 128)),
        jnp.asarray(tm.reshape(NG, 128)))
    flat = lambda a: np.asarray(a).reshape(B)[:n]
    return flat(score), flat(end_ref), flat(end_read), flat(first_hit)


def refine_batched_sharded(seeds, sequence: str, sequence_id: str,
                           code, n_mask, sess, cfg,
                           mesh=None, n_devices: Optional[int] = None,
                           interpret: bool = False) -> List[str]:
    """refine_batched with the forward-scoring batches sharded over the
    mesh.  Output is byte-identical to the sequential refinement."""
    from .. import refine_batched as rb

    if mesh is None:
        mesh = make_mesh(n_devices)

    def fwd(reads, refs, terms, interp):
        return batch_forward_sharded(reads, refs, terms, mesh=mesh,
                                     interpret=interp)

    return rb.refine_batched(seeds, sequence, sequence_id, code, n_mask,
                             sess, cfg, interpret=interpret,
                             forward_override=fwd)
