"""Segment-streamed event extraction (eventstitch) must be bit-identical
to whole-contig extraction, including across segment cuts through repeat
arrays (no N-run split points needed), and must drive the native core to
the same BED output."""

import numpy as np
import pytest

from ribbit_tpu.config import RibbitConfig
from ribbit_tpu.encode import encode
from ribbit_tpu.sim import simulate


@pytest.fixture(scope="module")
def dense_genome():
    # repeat-dense, NO N gaps: segment cuts land inside/near repeat arrays,
    # the adversarial case for stitching
    return simulate(num_loci=40, seed=911, name="st").sequence


def _whole_and_segmented(seq, seg_size, halo=2048):
    from ribbit_tpu.scan_events_tpu import scan_events
    from ribbit_tpu.eventstitch import scan_events_segmented

    cfg = RibbitConfig.create()
    code, n_mask = encode(seq)
    whole = scan_events(code, n_mask, cfg)
    seg = scan_events_segmented(code, n_mask, cfg, seg_size=seg_size,
                                halo=halo)
    return cfg, code, n_mask, whole, seg


def test_segmented_events_bit_identical(cpu_jax, dense_genome):
    _, _, _, whole, seg = _whole_and_segmented(dense_genome, seg_size=40_000)
    for w, s in zip(whole, seg):
        for wa, sa in zip(w, s):
            assert np.array_equal(np.asarray(wa, np.int64),
                                  np.asarray(sa, np.int64))


def test_segmented_events_with_n_runs(cpu_jax):
    parts = []
    for ci in range(3):
        parts.append(simulate(num_loci=6, seed=30 + ci, name=f"n{ci}",
                              n_block_rate=0.3).sequence)
        parts.append("N" * 900)
    seq = "".join(parts)
    _, _, _, whole, seg = _whole_and_segmented(seq, seg_size=30_000)
    for w, s in zip(whole, seg):
        for wa, sa in zip(w, s):
            assert np.array_equal(np.asarray(wa, np.int64),
                                  np.asarray(sa, np.int64))


def test_segmented_bed_parity(cpu_jax, dense_genome):
    """Stitched events -> global replay -> BED must equal the host path."""
    from ribbit_tpu.core import CoreSession
    from ribbit_tpu.eventstitch import scan_events_segmented
    from ribbit_tpu.pipeline import process_sequence

    cfg = RibbitConfig.create()
    code, n_mask = encode(dense_genome)
    expected = process_sequence("st", dense_genome, cfg)

    sess = CoreSession(code, n_mask, cfg)
    try:
        sess.set_events(*scan_events_segmented(code, n_mask, cfg,
                                               seg_size=50_000))
        seeds = sess.scan()
        lines = sess.refine(seeds, dense_genome, "st")
    finally:
        sess.close()
    assert lines == expected


def test_host_capture_matches_device_extractor(cpu_jax, dense_genome):
    """The native run-capture generation must produce streams bit-identical
    to the device extractor (both are the raw qualified/perfect runs)."""
    from ribbit_tpu.scan_events_tpu import scan_events
    from ribbit_tpu.eventstitch import capture_runs_host

    cfg = RibbitConfig.create()
    code, n_mask = encode(dense_genome)
    want = scan_events(code, n_mask, cfg)
    got = capture_runs_host(code, n_mask, cfg)
    for w, s in zip(want, got):
        for wa, sa in zip(w, s):
            assert np.array_equal(np.asarray(wa, np.int64),
                                  np.asarray(sa, np.int64))


def test_host_capture_segmented_stitch(cpu_jax):
    """Segmented host capture + stitch == whole-contig capture, on a
    genome with N runs and repeat arrays crossing the cuts."""
    from ribbit_tpu.eventstitch import (capture_runs_host,
                                        scan_events_segmented)

    parts = []
    for ci in range(3):
        parts.append(simulate(num_loci=8, seed=60 + ci, name=f"hc{ci}",
                              n_block_rate=0.2).sequence)
    seq = "".join(parts)
    cfg = RibbitConfig.create()
    code, n_mask = encode(seq)
    whole = capture_runs_host(code, n_mask, cfg)
    seg = scan_events_segmented(code, n_mask, cfg,
                                extractor=capture_runs_host,
                                seg_size=37_000)
    for w, s in zip(whole, seg):
        for wa, sa in zip(w, s):
            assert np.array_equal(np.asarray(wa, np.int64),
                                  np.asarray(sa, np.int64))
