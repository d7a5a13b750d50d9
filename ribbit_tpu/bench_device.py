"""On-device-resident TPU kernel benchmarks.

Times the two flagship device kernels with ALL data generated and kept on
the device — no host<->device transfers of the working set, so the numbers
are true per-chip kernel throughput even over the slow axon tunnel
(~1 MB/s), which forbids transfer-based benching.

  bench_scan  : scan_pallas_full full generation (eq + anchors + overlay +
                qualified windows + perfect flags for every motif channel,
                the O(NSHIFTS*L) pass replacing fasta_utils.cpp:120-161)
                -> Mbp/s per chip
  bench_align : align_pallas batched SSW forward scoring (replacing
                ssw.c:197-386) -> pairs/s and GCUPS

Methodology: the axon backend's block_until_ready can return before remote
execution completes (per-call wall times did not scale with kernel work),
so each measurement jits ONE fused computation covering the whole sweep
and returns a single scalar whose host fetch (float()) forces real
completion.  The scalar fetch + RPC adds ~15-25 ms, which only makes the
reported throughput conservative.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp


def bench_scan(cfg=None, L: int = 4 << 20, reps: int = 6) -> dict:
    """Full-generation scan throughput over all motif channels, Mbp/s/chip.

    Uses the row-split manual-DMA v4 kernel (scan_pallas_v4): HBM inputs
    stream through a double-buffered VMEM scratch and each program computes
    only OUT_ROWS=4 shift rows (+2-row halo) of a TILE=32768 tile — the
    sweep optimum; per-program live-set locality dominates even the 2x
    row-recompute overhead.  Measured on the v5e chip at L=4M:
    ~970-1030 Mbp/s (TILE=16384: ~963; v3 at TILE=3072: ~244; v2
    whole-input-in-VMEM: 95-121)."""
    import numpy as np
    from . import scan_pallas_v4 as v2              # kernel under test (v4)
    if cfg is None:
        from .config import RibbitConfig
        cfg = RibbitConfig.create()

    Lp = ((L + v2.TILE - 1) // v2.TILE) * v2.TILE
    total = v2.LPAD + Lp + v2.RPAD
    # device-resident synthetic genome; LPAD prefix stays non-matching
    # sentinels (values >= 5 never equal a base code)
    sent = jnp.asarray((np.arange(-v2.LPAD, 0) % 120) + 5, jnp.int32)
    code = jax.random.randint(jax.random.PRNGKey(0), (1, total), 0, 4,
                              dtype=jnp.int32).at[0, :v2.LPAD].set(sent)
    nmask = jnp.zeros((1, total), jnp.int32).at[0, v2.LPAD + L:].set(1)
    code, nmask = jax.block_until_ready((code, nmask))
    nsp = v2._nsp_of(cfg)

    # K chained invocations inside one jit: a single scalar fetch (~15-25 ms
    # RPC) then amortizes over K kernel executions instead of dominating a
    # single ~50 ms call.  Each iteration XORs the code with a DISTINCT
    # constant so XLA cannot CSE any pair of calls: an earlier revision
    # used `k & 3`, which repeats after 4 and would let HLO CSE collapse
    # duplicate dispatches (pure custom calls), inflating the number.
    K = 8

    @jax.jit
    def sweep(code):
        acc = jnp.int32(0)
        for k in range(K):
            perturbed = code ^ k
            outs = v2._scan_all(perturbed, nmask, jnp.int32(L), nsp=nsp,
                                min_shift=cfg.min_shift,
                                max_shift=cfg.max_shift, interpret=False)
            acc = acc + outs[0][0, :128].astype(jnp.int32).sum()
        return acc

    t0 = time.perf_counter()
    float(sweep(code))                        # compile + warmup
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(sweep(code))                    # fetch forces completion
        best = min(best, time.perf_counter() - t0)
    return {"tpu_scan_mbps": round(K * L / 1e6 / best, 2),
            "tpu_scan_channels": cfg.max_motif - cfg.min_motif + 1,
            "tpu_scan_compile_s": round(compile_s, 1)}


def bench_events(cfg=None, L: int = 4 << 20, reps: int = 4) -> dict:
    """PRODUCTION event-extraction kernel throughput (the kernel the
    pipeline's --backend tpu path actually calls): scan_events_pallas
    flagword generation for every motif channel, Mbp/s per chip.  Same
    fused-sweep + scalar-fetch methodology as bench_scan."""
    import numpy as np
    from . import scan_events_pallas as ev
    from .scan_pallas_v2 import _nsp_of
    if cfg is None:
        from .config import RibbitConfig
        cfg = RibbitConfig.create()

    Lp = ((L + ev.TILE - 1) // ev.TILE) * ev.TILE
    total = ev.LPAD + Lp + ev.RPAD
    sent = jnp.asarray((np.arange(-ev.LPAD, 0) % 120) + 5, jnp.int32)
    code = jax.random.randint(jax.random.PRNGKey(0), (1, total), 0, 4,
                              dtype=jnp.int32).at[0, :ev.LPAD].set(sent)
    nmask = jnp.zeros((1, total), jnp.int32).at[0, ev.LPAD + L:].set(1)
    code, nmask = jax.block_until_ready((code, nmask))
    nsp = _nsp_of(cfg)

    K = 8

    @jax.jit
    def sweep(code):
        acc = jnp.int32(0)
        for k in range(K):
            w = ev._scan_all(code ^ k, nmask, jnp.int32(L), nsp=nsp,
                             min_shift=cfg.min_shift,
                             max_shift=cfg.max_shift, interpret=False)
            acc = acc + w[0, :128].sum()
        return acc

    float(sweep(code))                        # compile + warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(sweep(code))
        best = min(best, time.perf_counter() - t0)
    return {"tpu_event_mbps": round(K * L / 1e6 / best, 2)}


def bench_event_decode(cfg=None, L: int = 1 << 22) -> dict:
    """Host-side flagword decode throughput (the C ctz decoder), Mbp/s on
    this host.  Runs on synthetic flagwords at chromosome-fixture event
    density (~2.1 q6 + 0.05 q7 + 0.001 perfect events/bp); part of the
    PCIe e2e model in BASELINE.md, not a device number."""
    import numpy as np
    from .scan_pallas_v2 import _nsp_of
    from . import scan_events_pallas as ev
    if cfg is None:
        from .config import RibbitConfig
        cfg = RibbitConfig.create()
    nsp = _nsp_of(cfg)
    ngroups = (nsp + 3) // 4
    rng = np.random.default_rng(0)
    w = np.zeros((ngroups, L), dtype=np.uint32)
    # paired start/end flags per channel row at realistic densities
    for dens, b_s, b_e in ((0.0052, 0, 4), (0.00013, 8, 12)):
        # per-row start density = stream density / nmotifs
        n = int(dens * L)
        for g in range(ngroups):
            for b in range(4):
                pos = np.sort(rng.choice(L, size=2 * n, replace=False))
                s, e = pos[0::2], pos[1::2]
                w[g, s] |= np.uint32(1 << (b_s + b))
                w[g, e] |= np.uint32(1 << (b_e + b))
    w = w.view(np.int32)
    ev._decode_c(w, cfg)                   # warm: lib load + thread pool
    t0 = time.perf_counter()
    ev._decode_c(w, cfg)
    dt = time.perf_counter() - t0
    return {"host_decode_mbps": round(L / 1e6 / dt, 1)}


def bench_align(B: int = 1024, R: int = 256, C: int = 384,
                reps: int = 4) -> dict:
    """Batched SSW forward scoring throughput at refinement-typical shapes.

    Uses the one-pair-per-lane v3 kernel (align_pallas_v3): each lane runs
    an independent DP, 1024 pairs per grid step, row loop in 8-row
    unrolled blocks — ~28 GCUPS on a v5e chip (v2: ~24, column-parallel
    v1: ~1).  Same amortized methodology as bench_scan: K chained
    perturbed invocations per scalar fetch."""
    from . import align_pallas_v3 as v2

    rd = jax.random.randint(jax.random.PRNGKey(1), (R, B // 128, 128),
                            0, 4, dtype=jnp.int32)
    rf = jax.random.randint(jax.random.PRNGKey(2), (C, B // 128, 128),
                            0, 4, dtype=jnp.int32)
    rl = jnp.full((B // 128, 128), R, jnp.int32)
    cl = jnp.full((B // 128, 128), C, jnp.int32)
    tm = jnp.full((B // 128, 128), -1, jnp.int32)
    jax.block_until_ready((rd, rf, rl, cl, tm))

    K = 8

    @jax.jit
    def align(rd, rf):
        acc = jnp.int32(0)
        for k in range(K):
            score, *_ = v2._fwd_call(rd ^ k, rf, rl, cl, tm,
                                     R=R, C=C, interpret=False)
            acc = acc + score.sum()
        return acc

    float(align(rd, rf))                      # compile + warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(align(rd, rf))
        best = min(best, time.perf_counter() - t0)
    return {"tpu_align_pairs_per_s": round(K * B / best),
            "tpu_align_gcups": round(K * B * R * C / best / 1e9, 2)}


def run_device_bench() -> dict:
    """Both kernel benches; {} when no TPU is reachable."""
    try:
        if jax.default_backend() not in ("tpu", "axon"):
            return {}
    except Exception:
        return {}
    out = {}
    out.update(bench_scan())
    out.update(bench_events())
    out.update(bench_align())
    try:
        out.update(bench_event_decode())
    except Exception:
        pass
    return out


if __name__ == "__main__":
    import json
    print(json.dumps(run_device_bench()))
