"""Differential tests for the device-batched diagonal voter
(vote_device.py) against the validated host implementations of
mostFrequentLongerMotif (parse_seed.cpp:153-256)."""

import numpy as np
import pytest

from ribbit_tpu.refine import _most_frequent_longer_motif_scalar


def _ref_index(code, n_mask, ss, ssl, m):
    """Winning row index via the native AVX-512 voter (falls back to the
    scalar spec when the native lib is unavailable)."""
    from ribbit_tpu.native import get_vote_lib
    lib = get_vote_lib()
    if lib is not None:
        import ctypes
        return int(lib.ribbit_vote_longer(
            code.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            n_mask.view(np.uint8).ctypes.data_as(
                ctypes.POINTER(ctypes.c_uint8)),
            code.shape[0], ss, ssl, m))
    # scalar spec returns the packed unit; recover the index by rescan
    unit = _most_frequent_longer_motif_scalar(code, n_mask, ss, ssl, m,
                                              code.shape[0])
    for row in range(code.shape[0] - m + 1):
        u = 0
        for c in code[row:row + m].tolist():
            u = (u << 2) | int(c)
        if (u & ((1 << 256) - 1)) == unit:
            return row
    return 0


def _repeatish(rng, L, m):
    """Tandem-repeat-heavy sequence: the workload the voter actually sees."""
    unit = rng.integers(0, 4, m, dtype=np.int8)
    code = np.tile(unit, L // m + 1)[:L].copy()
    nmut = max(1, L // 12)
    pos = rng.choice(L, size=nmut, replace=False)
    kind = rng.integers(0, 3, nmut)
    code[pos[kind == 0]] = rng.integers(0, 4, int((kind == 0).sum()))
    for p in pos[kind == 1][:4]:          # small indel-ish shifts
        code[p:] = np.roll(code[p:], 1)
    n_mask = np.zeros(L, dtype=bool)
    n_mask[pos[kind == 2]] = True
    return code, n_mask


@pytest.mark.parametrize("impl", ["banded", "spec"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_vote_device_matches_host_fuzz(cpu_jax, seed, impl):
    from ribbit_tpu.vote_device import vote_longer_batch

    rng = np.random.default_rng(seed)
    runs, codes = [], []
    for _ in range(40):
        m = int(rng.integers(11, 101))
        ssl = int(rng.integers(m + 2, 6 * m))
        pad = int(rng.integers(0, 30))
        L = ssl + 2 * pad + m + 4
        code, n_mask = _repeatish(rng, L, m)
        ss = pad
        codes.append((code, n_mask))
        runs.append((ss, ssl, m))

    for (code, n_mask), (ss, ssl, m) in zip(codes, runs):
        got = vote_longer_batch(code, n_mask, [(ss, ssl, m)], impl=impl)[0]
        want = _ref_index(code, n_mask, ss, ssl, m)
        assert got == want, (ss, ssl, m)


@pytest.mark.parametrize("impl", ["banded", "spec"])
def test_vote_device_batched_mixed_buckets(cpu_jax, impl):
    """One batched call over runs spanning several (ssl, m) buckets on one
    shared contig, including edge rows at the contig boundaries."""
    from ribbit_tpu.vote_device import vote_longer_batch

    rng = np.random.default_rng(7)
    L = 4096
    code, n_mask = _repeatish(rng, L, 17)
    runs = []
    for _ in range(30):
        m = int(rng.integers(11, 80))
        ssl = int(rng.integers(m + 2, 500))
        ss = int(rng.integers(0, max(1, L - ssl - m - 3)))
        runs.append((ss, ssl, m))
    runs.append((0, 60, 12))               # c0 < 0 upstream gate
    runs.append((L - 80 - 13, 80, 13))     # right boundary
    runs.append((5, 12, 12))               # single candidate row
    runs.append((5, 11, 12))               # no candidate rows -> 0

    got = vote_longer_batch(code, n_mask, runs, impl=impl)
    for (ss, ssl, m), g in zip(runs, got):
        if ssl - m + 1 <= 0:
            assert g == 0
            continue
        assert g == _ref_index(code, n_mask, ss, ssl, m), (ss, ssl, m)


def test_vote_device_all_zero_votes(cpu_jax):
    """All-N windows score zero everywhere; the spec leaves the index at 0
    (parse_seed.cpp:238-244)."""
    from ribbit_tpu.vote_device import vote_longer_batch

    L = 256
    code = np.zeros(L, dtype=np.int8)
    n_mask = np.ones(L, dtype=bool)
    assert vote_longer_batch(code, n_mask, [(64, 100, 12)]) == [0]


def test_prefix_counts_native_matches_numpy(cpu_jax):
    from ribbit_tpu.vote_device import _prefix_counts, _prefix_counts_np

    rng = np.random.default_rng(3)
    code, n_mask = _repeatish(rng, 600, 13)
    ss, ssl, m = 40, 300, 13
    R = ssl - m + 1
    # plausible final upstream cursors: at or below seed_start
    ustream = ss - rng.integers(0, m + 3, R).astype(np.int64)
    a = _prefix_counts(code, n_mask, ss, ssl, m, ustream)
    b = _prefix_counts_np(code, n_mask, ss, ssl, m, ustream)
    assert np.array_equal(a, b)


def test_vote_device_band_overflow_falls_back(cpu_jax):
    """A tiny band forces walk overflow; the run must re-vote on the host
    (exact) rather than return clamped garbage."""
    from ribbit_tpu.vote_device import vote_longer_batch

    rng = np.random.default_rng(11)
    # random (aperiodic) content makes the greedy jitters diverge across
    # rows, blowing past a tiny band
    code = rng.integers(0, 4, 900, dtype=np.int8)
    n_mask = np.zeros(900, dtype=bool)
    runs = [(10, 700, 13)]
    before = vote_longer_batch.overflows
    got = vote_longer_batch(code, n_mask, runs, w_band=8)[0]
    assert vote_longer_batch.overflows > before
    assert got == _ref_index(code, n_mask, 10, 700, 13)
