"""The production device event path (Pallas flagword kernel + C decoder)
must produce streams bit-identical to the proven XLA extractor
(scan_events_tpu), through to BED parity via the native core replay.

Interpret runs patch TILE down (interpret cost scales with EXT); the
kernel algebra is TILE-independent and the shipped geometry is validated
on-chip (EVIDENCE.md)."""

import numpy as np
import pytest

from ribbit_tpu.config import RibbitConfig
from ribbit_tpu.encode import encode
from ribbit_tpu.sim import simulate


@pytest.fixture()
def small_tile(monkeypatch):
    import ribbit_tpu.scan_events_pallas as m
    monkeypatch.setattr(m, "TILE", 4096)
    monkeypatch.setattr(m, "EXT", m.LPAD + 4096 + m.CAP + 128)
    monkeypatch.setattr(m, "CHUNK", m.LPAD + 4096 + m.RPAD)
    yield m
    import jax
    jax.clear_caches()   # drop traces captured at the patched geometry


def _assert_streams_equal(a, b):
    for ga, gb in zip(a, b):
        for xa, xb in zip(ga, gb):
            assert np.array_equal(np.asarray(xa, np.int64),
                                  np.asarray(xb, np.int64))


def test_flagword_events_match_xla(cpu_jax, small_tile):
    from ribbit_tpu.scan_events_tpu import scan_events
    from ribbit_tpu.scan_events_pallas import scan_events_device

    for cfg, seed, nb in ((RibbitConfig.create(), 7, 0.3),
                          (RibbitConfig.create(min_motif=4, max_motif=37),
                           8, 0.5)):
        sim = simulate(num_loci=2, seed=seed, name="ev", n_block_rate=nb)
        code, n_mask = encode(sim.sequence)
        want = scan_events(code, n_mask, cfg)
        got = scan_events_device(code, n_mask, cfg, interpret=True)
        _assert_streams_equal(want, got)


def test_numpy_and_c_decoders_agree(cpu_jax, small_tile):
    from ribbit_tpu.scan_events_pallas import (flagwords_pallas, _decode_c,
                                               _decode_numpy)

    cfg = RibbitConfig.create()
    sim = simulate(num_loci=3, seed=19, name="dec", n_block_rate=0.2)
    code, n_mask = encode(sim.sequence)
    w = flagwords_pallas(code, n_mask, cfg, interpret=True)
    _assert_streams_equal(_decode_numpy(w, cfg), _decode_c(w, cfg))


def test_flagword_bed_parity(cpu_jax, small_tile, golden_dir):
    from ribbit_tpu.fasta import read_fasta
    from ribbit_tpu.core import CoreSession
    from ribbit_tpu.scan_events_pallas import scan_events_device

    cfg = RibbitConfig.create()
    lines = []
    for sid, seq in read_fasta(str(golden_dir / "g3.fa")):
        code, n_mask = encode(seq)
        sess = CoreSession(code, n_mask, cfg)
        try:
            sess.set_events(*scan_events_device(code, n_mask, cfg,
                                                interpret=True))
            seeds = sess.scan()
            lines += sess.refine(seeds, seq, sid)
        finally:
            sess.close()
    expected = (golden_dir / "g3.oracle.bed").read_text().splitlines()
    assert lines == expected


def test_c_decoder_fuzz_and_cap_retry(cpu_jax):
    """Synthetic bitmap planes at adversarial densities: the C decoder
    must match the numpy spec, including when a row's run count overflows
    the initial bucket capacity (cap=4096 at small L) and the
    grow-and-retry path fires.  Covers runs open at the plane end (closed
    by the implicit zero word), perfect runs straddling the length
    cutoff, and long constant regions exercising the fast-skip."""
    import numpy as np
    from ribbit_tpu.config import RibbitConfig
    from ribbit_tpu.scan_events_pallas import _bit_of, _decode_c, \
        _decode_numpy

    from ribbit_tpu.scan_events_pallas import OUT_ROWS

    cfg = RibbitConfig.create()
    nsp = ((cfg.max_shift - cfg.min_shift + 1) + 7) & ~7
    nplanes = (nsp + OUT_ROWS - 1) // OUT_ROWS
    rng = np.random.default_rng(0)
    L = 16384                               # initial cap = 4096 buckets

    def runs_bitmap(n, long_runs=False):
        """Bitmap with exactly n non-touching runs (sorted distinct
        positions alternate start/exclusive-end, so gaps are >= 1)."""
        if n == 0:
            return np.zeros(L, dtype=bool)
        pos = np.sort(rng.choice(L, 2 * n, replace=False))
        if long_runs:     # stretch each run to its successor - 1
            pos[1::2] = np.concatenate([pos[2::2] - 1, [L]])
        delta = np.zeros(L + 1, dtype=np.int32)
        np.add.at(delta, pos[0::2], 1)
        np.add.at(delta, pos[1::2], -1)
        return np.cumsum(delta[:L]) > 0

    for trial, nevents in enumerate((8, 700, 6000)):  # 6000 > 4096: retry
        w = np.zeros((nplanes, L), dtype=np.uint32)
        for g in range(min(nplanes, 4)):
            for r in range(OUT_ROWS):
                for field in range(3):
                    n = nevents if (g, r, field) == (1, 2, 0) else \
                        int(rng.integers(0, 30))
                    bm = runs_bitmap(n, long_runs=(g, field) == (2, 0))
                    if (g, r, field) == (0, 1, 1):
                        bm[L - 5:] = True   # run open at the plane end
                    if field == 2 and r == 3:
                        # perfect runs hugging the cutoff on both sides
                        bm[:] = False
                        m = cfg.min_shift + OUT_ROWS * g + r
                        cut = 12 - m if m <= 6 else m
                        bm[100:100 + cut] = True          # exactly cutoff
                        bm[300:300 + max(cut - 1, 1)] = True  # below
                        bm[500:500 + cut + 3] = True      # above
                    w[g] |= (bm.astype(np.uint32) << np.uint32(
                        _bit_of(r, field)))
        wi = w.view(np.int32)
        got = _decode_c(wi, cfg)
        want = _decode_numpy(wi, cfg)
        for gs, ws in zip(got, want):
            for a, b in zip(gs, ws):
                assert np.array_equal(np.asarray(a), np.asarray(b)), trial
