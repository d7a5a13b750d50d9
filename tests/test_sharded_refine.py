"""Mesh-sharded refinement scoring (parallel/sharded_refine.py): the
forward batches shard over the 8-device CPU mesh and stay bit-identical to
the single-device kernel, so refinement output stays byte-exact."""

import numpy as np


def test_sharded_forward_matches_single_device(cpu_jax):
    from ribbit_tpu.align_pallas_v3 import batch_forward
    from ribbit_tpu.parallel.sharded_refine import batch_forward_sharded

    rng = np.random.default_rng(5)
    reads, refs, terms = [], [], []
    for i in range(137):                   # odd count: exercises padding
        reads.append(rng.integers(0, 4, int(rng.integers(4, 120)))
                     .astype(np.int32))
        refs.append(rng.integers(0, 4, int(rng.integers(4, 160)))
                    .astype(np.int32))
        terms.append(int(rng.integers(10, 60)) if i % 3 == 0 else None)

    want = batch_forward(reads, refs, terms, interpret=True)
    got = batch_forward_sharded(reads, refs, terms, n_devices=8,
                                interpret=True)
    for g, w in zip(got, want):
        assert np.array_equal(g, w)


def test_sharded_refinement_oracle_parity(cpu_jax, golden_dir):
    """refine_batched with the mesh-sharded forward must still reproduce
    the oracle BED byte-for-byte."""
    from ribbit_tpu.config import RibbitConfig
    from ribbit_tpu.fasta import read_fasta
    from ribbit_tpu.encode import encode
    from ribbit_tpu.core import CoreSession
    from ribbit_tpu.parallel.sharded_refine import refine_batched_sharded

    cfg = RibbitConfig.create()
    lines = []
    for sid, seq in read_fasta(str(golden_dir / "g3.fa")):
        code, n_mask = encode(seq)
        sess = CoreSession(code, n_mask, cfg)
        try:
            seeds = sess.scan()
            lines += refine_batched_sharded(seeds, seq, sid, code, n_mask,
                                            sess, cfg, n_devices=8,
                                            interpret=True)
        finally:
            sess.close()
    expected = (golden_dir / "g3.oracle.bed").read_text().splitlines()
    assert lines == expected
