"""Output must be byte-identical for any worker count (the contig fan-out
and inner-pool oversubscription reorder only execution, never emission)."""

from ribbit_tpu.config import RibbitConfig
from ribbit_tpu.pipeline import process_fasta
from ribbit_tpu.sim import simulate


def test_output_invariant_under_workers(tmp_path):
    fa = tmp_path / "w.fa"
    with open(fa, "w") as fh:
        for ci in range(4):
            sim = simulate(num_loci=4, seed=1400 + ci, name=f"w{ci}")
            fh.write(f">w{ci}\n")
            for i in range(0, len(sim.sequence), 80):
                fh.write(sim.sequence[i:i + 80] + "\n")
    cfg = RibbitConfig.create()
    base = process_fasta(str(fa), cfg, workers=1)
    assert base
    for w in (2, 3, 4):
        assert process_fasta(str(fa), cfg, workers=w) == base
