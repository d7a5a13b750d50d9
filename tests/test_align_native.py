"""Differential test: native ribbit_align (csrc/ribbit_align.c, including
the banded reverse pass) vs the oracle-validated align.py spec.

The reverse pass is restricted to an off-diagonal band derived from score1
(see ribbit_align.c); these shapes are chosen to stress it: pure repeats vs
their pseudo-perfect reference (narrow band), low-purity repeats (wide
band), N content, and tiny/edge sizes where the band formula's off-by-one
failure mode (terminate never reached -> wrong begin) was originally
caught."""

import ctypes
import random

import numpy as np
import pytest

from ribbit_tpu.align import ssw_align, translate
from ribbit_tpu.native import get_align_lib

BASES = "ACGT"


@pytest.fixture(scope="module")
def c_align():
    lib = get_align_lib()
    if lib is None:
        pytest.skip("no native lib")

    def call(q, r):
        qt = np.array(translate(q), dtype=np.int8)
        rt = np.array(translate(r), dtype=np.int8)
        out = (ctypes.c_int32 * 6)()
        buf = ctypes.create_string_buffer(4 * (len(q) + len(r)) + 64)
        rc = lib.ribbit_align(
            qt.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), len(qt),
            rt.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)), len(rt),
            out, buf, len(buf))
        return rc, list(out), buf.value.decode()

    return call


def _spec(q, r):
    al = ssw_align(translate(q), translate(r))
    if al is None:
        return 1, None, ""
    return 0, [al.sw_score, al.ref_begin, al.ref_end, al.query_begin,
               al.query_end, al.mismatches], al.cigar_string


def _pair(rng, mode):
    if mode == 0:       # pure random
        R = rng.randint(1, 150)
        C = rng.randint(1, 180)
        return ("".join(rng.choice(BASES) for _ in range(R)),
                "".join(rng.choice(BASES) for _ in range(C)))
    if mode == 1:       # repeat vs pseudo-perfect (the refinement shape)
        m = rng.randint(2, 40)
        motif = "".join(rng.choice(BASES) for _ in range(m))
        q = list(motif * rng.randint(2, 25))
        for _ in range(rng.randint(0, max(1, len(q) // 6))):
            p = rng.randrange(len(q))
            op = rng.random()
            if op < 0.6:
                q[p] = rng.choice(BASES)
            elif op < 0.8:
                q.insert(p, rng.choice(BASES))
            elif q:
                q.pop(p)
        q = "".join(q)
        ppr_len = int(len(q) * 1.15) + m
        return q, (motif * (ppr_len // m + 2))[:ppr_len]
    if mode == 2:       # with N
        R = rng.randint(5, 120)
        C = rng.randint(5, 150)
        return ("".join(rng.choice(BASES + "N") for _ in range(R)),
                "".join(rng.choice(BASES + "N") for _ in range(C)))
    # low purity (wide band)
    m = rng.randint(2, 12)
    motif = "".join(rng.choice(BASES) for _ in range(m))
    q = list((motif * 60)[:rng.randint(80, 300)])
    for _ in range(len(q) // 3):
        q[rng.randrange(len(q))] = rng.choice(BASES)
    q = "".join(q)
    return q, (motif * 200)[:int(len(q) * 1.15) + m]


def test_native_align_matches_spec(c_align):
    rng = random.Random(987)
    for trial in range(600):
        q, r = _pair(rng, trial % 4)
        rc_c, out_c, cg_c = c_align(q, r)
        rc_s, out_s, cg_s = _spec(q, r)
        assert (rc_c == 1) == (rc_s == 1), (q, r)
        if rc_s == 0:
            assert out_c == out_s, (q, r, out_c, out_s)
            assert cg_c == cg_s, (q, r, cg_c, cg_s)


def test_kmp_forward_shortcut_pure_occurrences(c_align):
    """The forward-pass occurrence shortcut (kmp_first_occurrence,
    ribbit_align.c): pure reads sliced out of the periodic reference at
    random offsets occur at many d — the shortcut must reproduce the full
    DP's first-best column/row exactly (end_ref = first occurrence end)."""
    rng = random.Random(321)
    for _ in range(200):
        m = rng.randint(2, 30)
        motif = "".join(rng.choice(BASES) for _ in range(m))
        ppr_len = rng.randint(m * 2, 400)
        r = (motif * (ppr_len // m + 3))[:ppr_len]
        off = rng.randrange(len(r) // 2 + 1)
        R = rng.randint(1, len(r) - off)
        q = r[off:off + R]
        rc_c, out_c, cg_c = c_align(q, r)
        rc_s, out_s, cg_s = _spec(q, r)
        assert (rc_c == 1) == (rc_s == 1), (q, r)
        if rc_s == 0:
            assert out_c == out_s, (q, r, out_c, out_s)
            assert cg_c == cg_s, (q, r, cg_c, cg_s)


def test_band_regression_tight_slack(c_align):
    """The pair that exposed the original band off-by-one: one deletion,
    slack == GAP_O exactly (band must be 1, not 0)."""
    q, r = "TCTCTCTCCTCTCTC", "TCTCTCTCTCTCTCTCTCT"
    rc, out, cg = c_align(q, r)
    assert rc == 0
    assert out == [27, 0, 15, 0, 14, 1]
    assert cg == "8=1D7="
