"""Replay semantics of the content-addressed vote memo (csrc/ribbit_refine.c).

The diagonal vote (reference parse_seed.cpp:153-256) returns the winning row
as an ABSOLUTE index, defaulting to 0 when no row strictly wins (e.g. the
N-trimmed ssl <= m case: the row loop is empty or the single ssl == m row
scores 0).  The memo stores winners seed-relative; the default-0 outcome is
content-determined but absolute, so it must replay as absolute 0 at any
address (sentinel VCMEMO_REL_ZERO), never as seed_start2 - seed_start1.

Driven through the exported ribbit_vote_memo_probe test hook because the
default-0 path has no known pipeline-reachable trigger (lattice seeds clip
at N runs, so n_trimmed_length < m never occurs through the scanner in
adversarial search) — but the memo must stay exact regardless.
"""

import ctypes

import numpy as np
import pytest

from ribbit_tpu.core import get_core_lib


@pytest.fixture(scope="module")
def probe():
    lib = get_core_lib()
    if lib is None:
        pytest.skip("no native lib")
    fn = lib.ribbit_vote_memo_probe
    fn.restype = ctypes.c_int32
    fn.argtypes = [
        ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    ]

    def call(code, nmask, seed_start, ssl, m):
        return fn(code.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
                  nmask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                  len(code), seed_start, ssl, m)

    return call


def _vote_ref(lib, code, nmask, seed_start, ssl, m):
    fn = lib.ribbit_vote_longer
    fn.restype = ctypes.c_int32
    fn.argtypes = [
        ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
    ]
    return fn(code.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
              nmask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
              len(code), seed_start, ssl, m)


def test_default_zero_replays_as_absolute_zero(probe):
    """ssl == m: single row scores 0, kernel returns absolute 0; a memo hit
    at a different seed_start must also return 0 (old bug: ss2 - ss1)."""
    rng = np.random.default_rng(42)
    L, m = 4096, 23
    ssl = m
    code = rng.integers(0, 4, L, dtype=np.int8)
    nmask = np.zeros(L, dtype=np.uint8)
    ss1, ss2 = 11, 700
    # identical window content [ss-1, ss+ssl) at both addresses
    code[ss2 - 1:ss2 + ssl] = code[ss1 - 1:ss1 + ssl]
    r1 = probe(code, nmask, ss1, ssl, m)
    assert r1 == 0
    r2 = probe(code, nmask, ss2, ssl, m)  # memo hit
    assert r2 == 0


def test_default_zero_empty_rows_replays_zero(probe):
    """ssl < m: row loop empty, default 0 at every address."""
    rng = np.random.default_rng(7)
    L, m, ssl = 4096, 31, 12
    code = rng.integers(0, 4, L, dtype=np.int8)
    nmask = np.zeros(L, dtype=np.uint8)
    ss1, ss2, ss3 = 900, 40, 2000   # ss2 < ss1: old code returned negative
    for ss in (ss2, ss3):
        code[ss - 1:ss + ssl] = code[ss1 - 1:ss1 + ssl]
    assert probe(code, nmask, ss1, ssl, m) == 0
    assert probe(code, nmask, ss2, ssl, m) == 0
    assert probe(code, nmask, ss3, ssl, m) == 0


def test_real_winner_replays_relative(probe):
    """A genuine winning row replays shifted by the new seed_start and
    agrees with the uncached kernel at every address."""
    lib = get_core_lib()
    rng = np.random.default_rng(3)
    L, m = 8192, 17
    ssl = 6 * m
    code = rng.integers(0, 4, L, dtype=np.int8)
    nmask = np.zeros(L, dtype=np.uint8)
    motif = rng.integers(0, 4, m, dtype=np.int8)
    ss1, ss2 = 100, 3000
    code[ss1:ss1 + ssl] = np.tile(motif, ssl // m + 1)[:ssl]
    # the vote reads only [seed_start-1, seed_start+ssl) for interior seeds
    # (the memo's exactness contract), so copying the window suffices
    code[ss2 - 1:ss2 + ssl] = code[ss1 - 1:ss1 + ssl]
    want1 = _vote_ref(lib, code, nmask, ss1, ssl, m)
    want2 = _vote_ref(lib, code, nmask, ss2, ssl, m)
    assert want1 >= ss1  # a real winner, not the default
    assert want2 - ss2 == want1 - ss1
    got1 = probe(code, nmask, ss1, ssl, m)
    got2 = probe(code, nmask, ss2, ssl, m)  # memo hit
    assert got1 == want1
    assert got2 == want2
