"""On-device-resident TPU kernel benchmarks.

Times the flagship device kernels with ALL data generated and kept on
the device — no host<->device transfers of the working set, so the numbers
are true per-chip kernel throughput even over the slow axon tunnel
(~1 MB/s), which forbids transfer-based benching.

  bench_scan  : scan_pallas_full full generation (eq + anchors + overlay +
                qualified windows + perfect flags for every motif channel,
                the O(NSHIFTS*L) pass replacing fasta_utils.cpp:120-161)
                -> Mbp/s per chip
  bench_events: the PRODUCTION flagword event-extraction kernel
                (scan_events_pallas, what --backend tpu actually runs)
  bench_align : align_pallas batched SSW forward scoring (replacing
                ssw.c:197-386) -> pairs/s and GCUPS

Methodology (three hard-won rules):
  1. The axon backend's block_until_ready can return before remote
     execution completes, so every measurement jits a fused computation
     returning one scalar whose host fetch forces real completion.
  2. MARGINAL two-point timing: each kernel is measured as K1 and K2
     chained invocations (every call XORing a DISTINCT constant into the
     input) and the rate is (K2-K1)*work / (t2-t1).  This cancels the
     ~25 ms dispatch/RPC floor AND any HLO CSE of repeated pure custom
     calls — an earlier revision perturbed with `k & 3` (only 4 distinct
     inputs at K=8), which let CSE collapse half the dispatches and
     inflate every reported number ~2x (caught round 5: an 8-call sweep
     with 4 distinct inputs cost the same wall clock as a 4-call sweep).
  3. Consume EVERY pallas call's output with a full reduce.  Slicing one
     plane out of a concatenated multi-call result lets XLA's
     slice-of-concat simplification DCE every other call: caught late
     round 5, the 26-call scan sweep compiled to ONE surviving
     custom-call and the "2.05 Gbp/s" scan / "1.45 Gbp/s" event numbers
     reported in rounds 4-5 were single-call rates, ~26x/11x inflated
     (real: ~56 / ~130 Mbp/s).  _assert_no_dce pins the surviving
     custom-call count on every bench run.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


K1, K2 = 4, 12


def _assert_no_dce(sweep_fn, arg, min_calls: int):
    """Fail loudly if the compiled sweep retains fewer pallas custom-calls
    than the kernel launches (the rule-3 DCE trap).  Mosaic lowers each
    pallas call to >= 1 "custom-call" line in compiled HLO text."""
    txt = jax.jit(sweep_fn).lower(arg).compile().as_text()
    n = txt.count("custom-call")
    if n < min_calls:
        raise RuntimeError(
            f"bench DCE guard: only {n} custom-calls survive compilation "
            f"(expected >= {min_calls}) — a slice is letting XLA drop "
            "kernel calls; the reported rate would be inflated")


def _marginal(make_sweep, arg, reps: int = 2, passes: int = 5):
    """(seconds per marginal call, t_K1, t_K2, compile_s).

    The K1/K2 timings are taken back-to-back inside each pass and the
    per-pass marginal rate is medianed across passes: single min-of-reps
    subtraction proved unstable on this (shared) chip — back-to-back
    pairing cancels slow drift, the median rejects interference spikes."""
    t0 = time.perf_counter()
    sweeps = {k: make_sweep(k) for k in (K1, K2)}
    for k in (K1, K2):
        float(sweeps[k](arg))                 # compile + warmup
    compile_s = time.perf_counter() - t0
    per = []
    last = {}
    for _ in range(passes):
        best = {}
        for k in (K1, K2):
            b = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(sweeps[k](arg))         # scalar fetch forces completion
                b = min(b, time.perf_counter() - t0)
            best[k] = b
        last = best
        per.append(max(best[K2] - best[K1], 1e-9) / (K2 - K1))
    per.sort()
    return per[len(per) // 2], last[K1], last[K2], compile_s


def bench_scan(cfg=None, L: int = 8 << 20, reps: int = 2) -> dict:
    """Full-generation scan throughput over all motif channels, Mbp/s/chip.

    Uses the row-split manual-DMA v4 kernel (scan_pallas_v4): HBM inputs
    stream through a double-buffered VMEM scratch and each program computes
    only OUT_ROWS=4 shift rows (+2-row halo) of a TILE=32768 tile — the
    sweep optimum; per-program live-set locality dominates even the 2x
    row-recompute overhead."""
    import numpy as np
    from . import scan_pallas_v4 as v2              # kernel under test (v4)
    if cfg is None:
        from .config import RibbitConfig
        cfg = RibbitConfig.create()

    Lp = ((L + v2.TILE - 1) // v2.TILE) * v2.TILE
    total = v2.LPAD + Lp + v2.RPAD
    # device-resident synthetic genome as the kernel's combined stream
    # (code + 125*n_mask); LPAD prefix stays non-matching sentinels
    # (values >= 5 never equal a base code)
    sent = jnp.asarray((np.arange(-v2.LPAD, 0) % 120) + 5, jnp.int32)
    code = jax.random.randint(jax.random.PRNGKey(0), (1, total), 0, 4,
                              dtype=jnp.int32).at[0, :v2.LPAD].set(sent)
    nmask = jnp.zeros((1, total), jnp.int32).at[0, v2.LPAD + L:].set(1)
    comb = jax.block_until_ready(code + 125 * nmask)
    nsp = v2._nsp_of(cfg)

    def make_sweep(K):
        @jax.jit
        def sweep(comb):
            acc = jnp.int32(0)
            for k in range(K):
                # truly distinct per-call input (k < K2=12 < 125 keeps the
                # XOR inside the code field; the distinct L - k operand is
                # a second, independent CSE guard)
                outs = v2._scan_all(comb ^ k, L=jnp.int32(L - k),
                                    nsp=nsp, min_shift=cfg.min_shift,
                                    max_shift=cfg.max_shift,
                                    interpret=False)
                # consume EVERY output fully: slicing one plane/row lets
                # XLA's slice-of-concat simplification DCE all the other
                # pallas calls (caught round 5: 26-call sweeps compiled to
                # ONE surviving custom-call, inflating the reported rate
                # ~26x); the full reduce adds only ~1% HBM traffic
                acc = acc + sum(o.astype(jnp.int32).sum() for o in outs)
            return acc
        return sweep

    ncalls = (nsp + v2.OUT_ROWS - 1) // v2.OUT_ROWS
    _assert_no_dce(make_sweep(K1), comb, K1 * ncalls)
    per_call, ta, tb, compile_s = _marginal(make_sweep, comb, reps)
    return {"tpu_scan_mbps": round(L / 1e6 / per_call, 2),
            "tpu_scan_channels": cfg.max_motif - cfg.min_motif + 1,
            "tpu_scan_compile_s": round(compile_s, 1)}


def bench_events(cfg=None, L: int = 8 << 20, reps: int = 2) -> dict:
    """PRODUCTION event-extraction kernel throughput (the kernel the
    pipeline's --backend tpu path actually calls): scan_events_pallas
    flagword generation for every motif channel, Mbp/s per chip."""
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
    comb = jax.block_until_ready(code + 125 * nmask)
    nsp = _nsp_of(cfg)

    def make_sweep(K):
        @jax.jit
        def sweep(comb):
            acc = jnp.int32(0)
            for k in range(K):
                # distinct per-call input (see bench_scan's note); full
                # reduce so no plane's call can be DCE'd (see bench_scan)
                w = ev._scan_all(comb ^ k, L=jnp.int32(L - k),
                                 nsp=nsp, min_shift=cfg.min_shift,
                                 max_shift=cfg.max_shift, interpret=False)
                acc = acc + w.sum()
            return acc
        return sweep

    ncalls = (nsp + ev.OUT_ROWS - 1) // ev.OUT_ROWS
    _assert_no_dce(make_sweep(K1), comb, K1 * ncalls)
    per_call, *_ = _marginal(make_sweep, comb, reps)
    return {"tpu_event_mbps": round(L / 1e6 / per_call, 2)}


def bench_event_decode(cfg=None, L: int = 1 << 22) -> dict:
    """Host-side bitmap decode throughput (the C transition decoder),
    Mbp/s on this host.  Runs on synthetic bitmap planes at
    chromosome-fixture run density (~0.0052 q6 + 0.00013 q7 runs/bp per
    row, mean run length ~60 bp); part of the PCIe e2e model in
    BASELINE.md, not a device number."""
    import numpy as np
    from .scan_pallas_v2 import _nsp_of
    from . import scan_events_pallas as ev
    if cfg is None:
        from .config import RibbitConfig
        cfg = RibbitConfig.create()
    nsp = _nsp_of(cfg)
    ngroups = (nsp + ev.OUT_ROWS - 1) // ev.OUT_ROWS
    rng = np.random.default_rng(0)
    w = np.zeros((ngroups, L), dtype=np.uint32)
    # non-touching runs per row: sorted distinct positions alternate
    # start/exclusive-end; run length distribution comes from pairing
    # adjacent order statistics (mean ~ L / (2n) capped by MEANLEN below)
    for dens, field in ((0.0052, 0), (0.00013, 1)):
        n = int(dens * L)
        MEANLEN = 60
        for g in range(ngroups):
            for r in range(ev.OUT_ROWS):
                s = np.sort(rng.choice(L - MEANLEN * 2, size=n,
                                       replace=False))
                ln = rng.geometric(1.0 / MEANLEN, size=n)
                e = np.minimum(s + ln, np.concatenate([s[1:], [L]]))
                e = np.maximum(e, s + 1)
                delta = np.zeros(L + 1, dtype=np.int32)
                np.add.at(delta, s, 1)
                np.add.at(delta, e, -1)
                bm = np.cumsum(delta[:L]) > 0
                w[g] |= (bm.astype(np.uint32)
                         << np.uint32(ev._bit_of(r, field)))
    w = w.view(np.int32)
    ev._decode_c(w, cfg)                   # warm: lib load + thread pool
    best = float("inf")
    for _ in range(4):                     # page-fault noise swings single
        t0 = time.perf_counter()           # calls ~3x; take the best
        ev._decode_c(w, cfg)
        best = min(best, time.perf_counter() - t0)
    return {"host_decode_mbps": round(L / 1e6 / best, 1)}


def bench_align(B: int = 4096, R: int = 256, C: int = 384,
                reps: int = 2) -> dict:
    """Batched SSW forward scoring throughput at refinement-typical shapes.

    Uses the one-pair-per-lane v3 kernel (align_pallas_v3): each lane runs
    an independent DP, 1024 pairs per grid step, row loop in 8-row
    unrolled blocks."""
    from . import align_pallas_v3 as v2

    rd = jax.random.randint(jax.random.PRNGKey(1), (R, B // 128, 128),
                            0, 4, dtype=jnp.int32)
    rf = jax.random.randint(jax.random.PRNGKey(2), (C, B // 128, 128),
                            0, 4, dtype=jnp.int32)
    rl = jnp.full((B // 128, 128), R, jnp.int32)
    cl = jnp.full((B // 128, 128), C, jnp.int32)
    tm = jnp.full((B // 128, 128), -1, jnp.int32)
    jax.block_until_ready((rd, rf, rl, cl, tm))

    def make_sweep(K):
        @jax.jit
        def align(rd):
            acc = jnp.int32(0)
            for k in range(K):
                score, *_ = v2._fwd_call(rd ^ k, rf, rl, cl, tm,
                                         R=R, C=C, interpret=False)
                acc = acc + score.sum()
            return acc
        return align

    per_call, *_ = _marginal(make_sweep, rd, reps)
    return {"tpu_align_pairs_per_s": round(B / per_call),
            "tpu_align_gcups": round(B * R * C / per_call / 1e9, 2)}


def run_device_bench() -> dict:
    """Kernel benches; host-only metrics (the bitmap decode) still run
    when no TPU is reachable (chip checks are time-boxed: a wedged
    tunnel hangs platform init rather than raising)."""
    from .backend import default_backend_or_none
    out = {}
    try:
        out.update(bench_event_decode())      # host-only: always runs
    except Exception:
        pass
    if default_backend_or_none() not in ("tpu", "axon"):
        return out
    out.update(bench_scan())
    out.update(bench_events())
    out.update(bench_align())
    try:
        from .bench_roofline import roofline_mfu
        out.update(roofline_mfu(out))
    except Exception:
        pass
    return out


if __name__ == "__main__":
    import json
    print(json.dumps(run_device_bench()))
