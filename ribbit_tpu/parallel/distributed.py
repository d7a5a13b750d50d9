"""Distributed contig processing over a device mesh (config 5 of
BASELINE.md): the chunk axis of the sequence-parallel design IS the mesh
axis.

A long contig splits at big-N-run midpoints (exact; see
pipeline._choose_splits), chunks pad to a common bucket and stack into
[nchunks, Lp] arrays sharded over a 1-D mesh; every device runs the compact
event-extraction kernel (scan_events_tpu) for its chunks via shard_map —
the O(NSHIFTS * L) scan rides the chips, only sparse events come back.  The
host then replays the exact scanner/lattice/refinement core per chunk in a
thread pool and stitches results in coordinate order.

Output equals process_sequence_chunked(strict=True) — byte-identical to the
whole-contig run up to the reference's positional-index vote quirk.  Tested
on the virtual 8-device CPU mesh against the single-process path.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..config import RibbitConfig
from ..encode import encode
from ..scan_events_tpu import _event_kernel
from .sharded_scan import make_mesh


def _chunk_bounds(n_mask: np.ndarray, L: int, chunk_size: int):
    from ..pipeline import _choose_splits
    splits = _choose_splits(n_mask, chunk_size, strict=True)
    return [0] + splits + [L]


def distributed_process_contig(sequence_id: str, sequence: str,
                               cfg: RibbitConfig,
                               chunk_size: int = 8 << 20,
                               n_devices: Optional[int] = None,
                               workers: Optional[int] = None) -> List[str]:
    """Process one contig with device-sharded scan + host-exact seed core."""
    import os
    from concurrent.futures import ThreadPoolExecutor
    from ..core import CoreSession
    from ..pipeline import process_sequence

    L = len(sequence)
    code, n_mask = encode(sequence)
    bounds = _chunk_bounds(n_mask, L, chunk_size)
    nchunks = len(bounds) - 1
    if nchunks <= 1:
        return process_sequence(sequence_id, sequence, cfg)

    mesh = make_mesh(n_devices)
    ndev = mesh.devices.size

    # pad chunk count to a device multiple; dummy chunks are all-N (zero
    # events) and dropped after
    npad = (-nchunks) % ndev
    total = nchunks + npad
    Lp_max = max(b - a for a, b in zip(bounds[:-1], bounds[1:]))
    bucket = 1 << 14
    Lp = ((Lp_max + bucket - 1) // bucket) * bucket

    codes = np.zeros((total, Lp), dtype=np.int8)
    nmasks = np.ones((total, Lp), dtype=bool)
    lens = np.zeros((total,), dtype=np.int32)
    for i in range(nchunks):
        a, b = bounds[i], bounds[i + 1]
        codes[i, :b - a] = code[a:b]
        nmasks[i, :b - a] = n_mask[a:b]
        lens[i] = b - a

    cap_p = max(Lp // 8, 1 << 14)
    cap_q7 = max(Lp // 2, 1 << 14)
    cap_q6 = max(3 * Lp, 1 << 15)

    def one_chunk(c, n, ln):
        return _event_kernel(c, n, ln,
                             min_shift=cfg.min_shift, nshifts=cfg.nshifts,
                             min_motif=cfg.min_motif, max_motif=cfg.max_motif,
                             cap_p=cap_p, cap_q7=cap_q7, cap_q6=cap_q6)

    axis = mesh.axis_names[0]
    # out_specs: every leaf is sharded along the chunk axis
    sharded = jax.jit(jax.shard_map(
        jax.vmap(one_chunk), mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis)),
        out_specs=(
            (P(axis), P(axis), P(axis), P(axis)),
            (P(axis), P(axis), P(axis), P(axis)),
            (P(axis), P(axis), P(axis), P(axis)),
        )))

    perf_b, q7_b, q6_b = sharded(jnp.asarray(codes), jnp.asarray(nmasks),
                                 jnp.asarray(lens))

    groups = []
    for grp in (perf_b, q7_b, q6_b):
        groups.append(tuple(np.asarray(x) for x in grp))
    nm = cfg.nmotifs

    def events_for(i):
        out = []
        for ch_b, s_b, e_b, cnt_b in groups:
            n = int(cnt_b[i])
            cap = ch_b.shape[1]
            if n > cap:
                raise OverflowError("event capacity exceeded")
            ch = ch_b[i, :n].astype(np.int64)
            s = s_b[i, :n].astype(np.int64)
            e = e_b[i, :n].astype(np.int64)
            offsets = np.searchsorted(ch, np.arange(nm + 1)).astype(np.int64)
            out.append((s, e, offsets))
        return out

    ncpu = os.cpu_count() or 1
    if workers is None:
        workers = min(ncpu, nchunks)

    def run_chunk(i):
        a, b = bounds[i], bounds[i + 1]
        sub_code = np.ascontiguousarray(code[a:b])
        sub_n = np.ascontiguousarray(n_mask[a:b])
        sess = CoreSession(sub_code, sub_n, cfg, nthreads=ncpu)
        try:
            perf, q7, q6 = events_for(i)
            sess.set_events(perf, q7, q6)
            seeds = sess.scan()
            lines = sess.refine(seeds, sequence[a:b], sequence_id)
        finally:
            sess.close()
        out = []
        for line in lines:
            cols = line.split("\t")
            cols[1] = str(int(cols[1]) + a)
            cols[2] = str(int(cols[2]) + a)
            out.append("\t".join(cols))
        return out

    with ThreadPoolExecutor(max_workers=workers) as ex:
        results = list(ex.map(run_chunk, range(nchunks)))
    lines: List[str] = []
    for r in results:
        lines.extend(r)
    return lines
