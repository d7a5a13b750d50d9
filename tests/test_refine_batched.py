"""Device-batched refinement (alignment scoring through the Pallas kernel,
traceback on host) must reproduce the oracle BED exactly."""


def test_batched_refinement_oracle_parity(cpu_jax, golden_dir):
    from ribbit_tpu.config import RibbitConfig
    from ribbit_tpu.fasta import read_fasta
    from ribbit_tpu.encode import encode
    from ribbit_tpu.core import CoreSession
    from ribbit_tpu.refine_batched import refine_batched

    cfg = RibbitConfig.create()
    lines = []
    for sid, seq in read_fasta(str(golden_dir / "g3.fa")):
        code, n_mask = encode(seq)
        sess = CoreSession(code, n_mask, cfg)
        try:
            seeds = sess.scan()
            lines += refine_batched(seeds, seq, sid, code, n_mask, sess, cfg,
                                    interpret=True)
        finally:
            sess.close()
    expected = (golden_dir / "g3.oracle.bed").read_text().splitlines()
    assert lines == expected


def test_batched_refinement_via_pipeline_env(cpu_jax, golden_dir, monkeypatch):
    """The RIBBIT_BATCHED_REFINE pipeline integration point."""
    from ribbit_tpu.config import RibbitConfig
    from ribbit_tpu.fasta import read_fasta
    from ribbit_tpu.pipeline import process_sequence

    monkeypatch.setenv("RIBBIT_BATCHED_REFINE", "interpret")
    cfg = RibbitConfig.create()
    lines = []
    for sid, seq in read_fasta(str(golden_dir / "g1.fa")):
        process_sequence(sid, seq, cfg, out=lines)
    expected = (golden_dir / "g1.oracle.bed").read_text().splitlines()
    assert lines == expected
