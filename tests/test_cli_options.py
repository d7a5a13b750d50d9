"""CLI option parity vs the reference oracle binary: non-default motif
ranges and dual-type (int or per-motif-size TSV) threshold options
(ribbit.cpp:25-64, 82-177).  Skipped when the oracle is not built."""

import pathlib
import subprocess
import sys

import pytest

ORACLE = pathlib.Path(__file__).parent.parent / "tools" / "oracle" / "ribbit_oracle"


def _run_pair(fa, tmp_path, extra):
    ours_bed = tmp_path / "ours.bed"
    orc_bed = tmp_path / "oracle.bed"
    r = subprocess.run([str(ORACLE), "-i", str(fa), "-o", str(orc_bed)] + extra,
                       capture_output=True)
    assert r.returncode == 0, r.stderr
    r = subprocess.run([sys.executable, "-m", "ribbit_tpu.cli", "-i", str(fa),
                        "-o", str(ours_bed)] + extra, capture_output=True)
    assert r.returncode == 0, r.stderr
    assert ours_bed.read_text() == orc_bed.read_text()


@pytest.mark.skipif(not ORACLE.exists(), reason="oracle not built")
@pytest.mark.parametrize("extra", [
    ["-m", "5", "-M", "40"],
    ["-m", "2", "-M", "15", "--min-units", "3"],
    ["-l", "20"],
    ["--perfect-units", "3"],
])
def test_flag_parity(golden_dir, tmp_path, extra):
    _run_pair(golden_dir / "g1.fa", tmp_path, extra)


@pytest.mark.skipif(not ORACLE.exists(), reason="oracle not built")
def test_tsv_minlength_parity(golden_dir, tmp_path):
    tsv = tmp_path / "minlen.tsv"
    tsv.write_text("".join(f"{m}\t{max(12, m * 3)}\n" for m in range(2, 101)))
    _run_pair(golden_dir / "g1.fa", tmp_path, ["-l", str(tsv)])


@pytest.mark.skipif(not ORACLE.exists(), reason="oracle not built")
def test_sparse_tsv_parity(golden_dir, tmp_path):
    """Sparse per-motif TSVs: sizes absent from the file take the reference's
    unordered_map operator[] default-insert-0 semantics during factor
    propagation (ribbit.cpp:219-235) and read as 0 at runtime.  Regression
    test: this used to KeyError in RibbitConfig.create."""
    units = tmp_path / "units.tsv"
    units.write_text("2\t3\n3\t2\n4\t2\n5\t4\n7\n")  # "7": no-tab quirk, key doubles as value
    punits = tmp_path / "punits.tsv"
    punits.write_text("2\t4\n6\t1\n")
    _run_pair(golden_dir / "g1.fa", tmp_path,
              ["--min-units", str(units), "--perfect-units", str(punits)])
    _run_pair(golden_dir / "g1.fa", tmp_path, ["-l", str(units)])


@pytest.mark.skipif(not ORACLE.exists(), reason="oracle not built")
def test_large_max_motif_parity(tmp_path):
    """-M above 127 with a long-motif repeat present: the native refiner's
    motif buffers must scale with max_motif (regression: fixed 128-byte
    stack buffers overflowed in the large-motif path)."""
    import random
    rng = random.Random(7)
    motif = "".join(rng.choice("ACGT") for _ in range(140))
    flank = "".join(rng.choice("ACGT") for _ in range(600))
    seq = flank + motif * 6 + flank
    fa = tmp_path / "longmotif.fa"
    fa.write_text(">lm\n" + "\n".join(seq[i:i + 80]
                                      for i in range(0, len(seq), 80)) + "\n")
    _run_pair(fa, tmp_path, ["-m", "100", "-M", "150"])
