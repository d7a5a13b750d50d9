"""Golden BED parity: the full pipeline must reproduce the reference ribbit
binary's output byte-for-byte on committed simulated fixtures.

Fixtures were generated with ribbit_tpu.sim and annotated by the reference
oracle (tools/oracle/build.sh rebuilds reference sources against from-scratch
boost shims).  Regenerate with tools/golden_regen.py if thresholds change.

  g1: motifs 2-10   (small-motif refinement path, parse_smallmotif_seed.cpp)
  g2: motifs 11-60  (large-motif path: diagonal voting + SSW + CIGAR pruning)
  g3: motifs 2-100 with N blocks (N-handling in scanners and refinement)
"""

import pytest

from ribbit_tpu.config import RibbitConfig
from ribbit_tpu.fasta import read_fasta
from ribbit_tpu.pipeline import process_sequence


@pytest.mark.parametrize("name", ["g1", "g2", "g3"])
def test_golden_parity(golden_dir, name):
    cfg = RibbitConfig.create()
    lines = []
    for seq_id, seq in read_fasta(str(golden_dir / f"{name}.fa")):
        process_sequence(seq_id, seq, cfg, out=lines)
    expected = (golden_dir / f"{name}.oracle.bed").read_text().splitlines()
    assert lines == expected
