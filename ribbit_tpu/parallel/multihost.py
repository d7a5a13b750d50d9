"""Multi-host distributed contig processing (SURVEY §5 distributed backend).

The reference holds a whole chromosome resident in one process
(fasta_utils.cpp:59-250); this module is the multi-host redesign: every
process calls `jax.distributed.initialize`, the contig's N-run-midpoint
chunks shard over a GLOBAL 1-D mesh spanning all processes' devices, each
process's chips run the compact event-extraction kernel for the chunk rows
they own (the O(nshifts * L) scan never leaves the devices), each host
replays the exact scanner/lattice/refinement core for its own chunks, and
the per-chunk output lines are exchanged with a cross-process allgather
(rides ICI within a slice, DCN across hosts) so every process holds the
full contig result in coordinate order.

Byte-semantics match `distributed_process_contig` / strict chunked mode:
exact up to the reference's positional-index vote quirk
(parse_anchored_shiftxor.cpp:511-522; see NOTES_ROUND1.md).

Launch (one command per host / process):

    ribbit-tpu -i g.fa -o out.bed --coordinator host0:8476 \
               --num-processes 2 --process-id {0,1}

Only process 0 writes output.  Tested by tests/test_multihost.py with two
CPU subprocesses (Gloo collectives) proving byte-identical output vs the
single-process path.
"""

from __future__ import annotations

import time
from typing import List, Optional

import numpy as np

from ..config import RibbitConfig
from ..encode import encode


def ensure_initialized(coordinator: str, num_processes: int,
                       process_id: int) -> None:
    """Idempotent jax.distributed.initialize wrapper."""
    import jax

    if getattr(ensure_initialized, "_done", False):
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    ensure_initialized._done = True


def _gather_lines_by_chunk(local: dict, total: int) -> List[List[str]]:
    """Allgather per-chunk output lines across processes.

    `local` maps chunk index -> list of lines (only chunks this process
    owns).  Contributions are disjoint across processes, so a stacked
    allgather + sum reconstructs the global byte stream on every process.
    """
    from jax.experimental import multihost_utils

    blobs = {i: ("\n".join(ls) + "\n" if ls else "").encode()
             for i, ls in local.items()}

    lens = np.zeros(total, dtype=np.int64)
    for i, b in blobs.items():
        lens[i] = len(b)
    lens = np.asarray(multihost_utils.process_allgather(lens)).sum(axis=0)

    offs = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    payload = np.zeros(int(offs[-1]), dtype=np.uint8)
    for i, b in blobs.items():
        payload[offs[i]:offs[i] + len(b)] = np.frombuffer(b, dtype=np.uint8)
    payload = np.asarray(
        multihost_utils.process_allgather(payload)).sum(axis=0,
                                                        dtype=np.uint8)

    out: List[List[str]] = []
    for i in range(total):
        blob = payload[offs[i]:offs[i + 1]].tobytes().decode()
        out.append(blob.split("\n")[:-1] if blob else [])
    return out


def multihost_process_contig(sequence_id: str, sequence: str,
                             cfg: RibbitConfig,
                             chunk_size: int = 8 << 20,
                             workers: Optional[int] = None,
                             timing: bool = False) -> List[str]:
    """Process one contig cooperatively across all initialized processes.

    Every process must call this with identical arguments (the chunk plan
    and the collective schedule are derived deterministically from them).
    Returns the full ordered line list on every process.
    """
    import os
    from concurrent.futures import ThreadPoolExecutor

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..core import CoreSession
    from ..pipeline import process_sequence
    from ..scan_events_tpu import _event_kernel
    from .distributed import _chunk_bounds
    from .sharded_scan import make_mesh

    L = len(sequence)
    code, n_mask = encode(sequence)
    bounds = _chunk_bounds(n_mask, L, chunk_size)
    nchunks = len(bounds) - 1
    if nchunks <= 1 or jax.process_count() == 1:
        # no collective schedule needed; every process computes (redundantly
        # for tiny contigs — the scalable path is the chunked one)
        from .distributed import distributed_process_contig
        if jax.process_count() == 1:
            return distributed_process_contig(sequence_id, sequence, cfg,
                                              chunk_size=chunk_size,
                                              workers=workers)
        return process_sequence(sequence_id, sequence, cfg)

    t0 = time.perf_counter()
    mesh = make_mesh()                       # GLOBAL mesh: all processes
    ndev = mesh.devices.size
    axis = mesh.axis_names[0]

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

    row_sh = NamedSharding(mesh, P(axis, None))
    vec_sh = NamedSharding(mesh, P(axis))

    # every process holds the full arrays; the callback materializes only
    # the shards addressable from this process
    g_codes = jax.make_array_from_callback(
        codes.shape, row_sh, lambda idx: codes[idx])
    g_nmasks = jax.make_array_from_callback(
        nmasks.shape, row_sh, lambda idx: nmasks[idx])
    g_lens = jax.make_array_from_callback(
        lens.shape, vec_sh, lambda idx: lens[idx])

    sharded = jax.jit(jax.shard_map(
        jax.vmap(one_chunk), mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis)),
        out_specs=(
            (P(axis), P(axis), P(axis), P(axis)),
            (P(axis), P(axis), P(axis), P(axis)),
            (P(axis), P(axis), P(axis), P(axis)),
        )))

    perf_b, q7_b, q6_b = sharded(g_codes, g_nmasks, g_lens)
    jax.block_until_ready((perf_b, q7_b, q6_b))
    t_scan = time.perf_counter() - t0

    # pull only the addressable (locally owned) chunk rows off the devices
    def local_rows(arr):
        rows = {}
        for s in arr.addressable_shards:
            r0 = s.index[0].start or 0
            data = np.asarray(s.data)
            for k in range(data.shape[0]):
                rows[r0 + k] = data[k]
        return rows

    groups = []
    owned: set = set()
    for grp in (perf_b, q7_b, q6_b):
        g = tuple(local_rows(x) for x in grp)
        groups.append(g)
        owned |= set(g[0].keys())
    owned = sorted(i for i in owned if i < nchunks)

    nm = cfg.nmotifs

    def events_for(i):
        out = []
        for ch_r, s_r, e_r, cnt_r in groups:
            n = int(cnt_r[i])
            cap = ch_r[i].shape[0]
            if n > cap:
                raise OverflowError("event capacity exceeded")
            ch = ch_r[i][:n].astype(np.int64)
            s = s_r[i][:n].astype(np.int64)
            e = e_r[i][:n].astype(np.int64)
            offsets = np.searchsorted(ch, np.arange(nm + 1)).astype(np.int64)
            out.append((s, e, offsets))
        return out

    ncpu = os.cpu_count() or 1
    if workers is None:
        workers = min(ncpu, max(len(owned), 1))

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

    local: dict = {}
    if owned:
        with ThreadPoolExecutor(max_workers=workers) as ex:
            for i, r in zip(owned, ex.map(run_chunk, owned)):
                local[i] = r
    t_replay = time.perf_counter() - t0 - t_scan

    per_chunk = _gather_lines_by_chunk(local, nchunks)
    t_gather = time.perf_counter() - t0 - t_scan - t_replay
    if timing:
        import sys
        print(f"[p{jax.process_index()}] {sequence_id}: "
              f"{len(owned)}/{nchunks} chunks  scan {t_scan:.2f}s  "
              f"replay {t_replay:.2f}s  gather {t_gather:.2f}s",
              file=sys.stderr)

    lines: List[str] = []
    for r in per_chunk:
        lines.extend(r)
    return lines
