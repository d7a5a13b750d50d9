"""Chunked long-contig processing (sequence parallelism over the chunk
axis): strict mode splits only at big-N-run midpoints and must be
byte-identical to the whole-contig run; loose mode splits anywhere with a
halo and must agree away from the cuts."""

import numpy as np
import pytest

from ribbit_tpu.config import RibbitConfig
from ribbit_tpu.pipeline import (process_sequence, process_sequence_chunked,
                                 _choose_splits)
from ribbit_tpu.sim import simulate
from ribbit_tpu.encode import encode


@pytest.fixture(scope="module")
def gapped_genome():
    parts = []
    for ci in range(4):
        sim = simulate(num_loci=8, seed=400 + ci, name=f"p{ci}")
        parts.append(sim.sequence)
        parts.append("N" * 700)
    return "".join(parts)


def test_choose_splits_prefers_n_runs(gapped_genome):
    _code, n_mask = encode(gapped_genome)
    splits = _choose_splits(n_mask, chunk_size=40_000, strict=True)
    assert splits, "expected at least one split"
    for s in splits:
        assert n_mask[s], "strict split must land inside an N-run"


def test_chunked_equals_whole(gapped_genome):
    cfg = RibbitConfig.create()
    whole = process_sequence("chr", gapped_genome, cfg)
    chunked = process_sequence_chunked("chr", gapped_genome, cfg,
                                       chunk_size=40_000)
    assert chunked == whole


def test_chunked_exact_on_dense_contig():
    """Chunk cuts through repeat arrays with NO N-run split points must
    still be byte-exact (capture + stitch + global replay)."""
    sim = simulate(num_loci=24, seed=77, name="dense")  # no N gaps
    cfg = RibbitConfig.create()
    whole = process_sequence("chr", sim.sequence, cfg)
    chunked = process_sequence_chunked("chr", sim.sequence, cfg,
                                       chunk_size=30_000)
    assert chunked == whole


def test_over_cap_contig_auto_chunks(gapped_genome, monkeypatch):
    """Contigs past the native core's i32 position range must auto-chunk
    (strict N-run splits) instead of raising.  The cap is patched down so
    the over-cap branch is exercised at test scale."""
    import ribbit_tpu.core as core
    cfg = RibbitConfig.create()
    whole = process_sequence("chr", gapped_genome, cfg)
    # cap must exceed the strict chunk spans (N gaps sit ~52 kb apart in
    # the fixture) or the auto-chunked pieces would re-enter the over-cap
    # branch; the production cap is 4 orders of magnitude above chunk size
    monkeypatch.setattr(core, "MAX_CONTIG", 120_000)
    chunked = process_sequence("chr", gapped_genome, cfg)
    assert chunked == whole


def test_over_cap_contig_without_n_runs_degrades_gracefully(monkeypatch):
    """Over-cap contig with no big-N-run split points: raw-offset chunking
    (best-effort near cuts) instead of a hard RuntimeError."""
    import ribbit_tpu.core as core
    sim = simulate(num_loci=24, seed=77, name="dense")  # no N gaps
    cfg = RibbitConfig.create()
    whole = process_sequence("chr", sim.sequence, cfg)
    monkeypatch.setattr(core, "MAX_CONTIG", 60_000)
    chunked = process_sequence("chr", sim.sequence, cfg)
    inter = len(set(whole) & set(chunked))
    assert inter >= 0.9 * max(len(whole), 1)


def test_exact_path_fixes_split_divergence():
    """Pinned fixture where independent per-chunk replay (the pre-stitch
    design, now only used past the i32 cap) diverges from the whole-contig
    run at raw cuts, while the exact capture+stitch+global-replay path is
    byte-identical."""
    from ribbit_tpu.pipeline import _process_chunked_split

    sim = simulate(num_loci=24, seed=89, name="dense")  # no N gaps
    cfg = RibbitConfig.create()
    whole = process_sequence("chr", sim.sequence, cfg)
    old = _process_chunked_split("chr", sim.sequence, cfg,
                                 chunk_size=30_000, halo=16_384,
                                 strict=False)
    new = process_sequence_chunked("chr", sim.sequence, cfg,
                                   chunk_size=30_000)
    assert old != whole          # the motivating divergence
    assert new == whole          # fixed by the global replay
