"""Edge-case inputs through the real CLI, parity-checked against the oracle
where the oracle survives.  Notably the reference binary SEGFAULTS on a
contig with leading+trailing N runs (the perfect scanner's VLA/flush edge);
we handle it and still call the interior repeat."""

import pathlib
import subprocess
import sys

import pytest

ORACLE = pathlib.Path(__file__).parent.parent / "tools" / "oracle" / "ribbit_oracle"

CASES = {
    "empty_seq": ">a\n\n>b\nACGTACGTACGTACGTACGT\n",
    "all_n": ">a\n" + "N" * 500 + "\n",
    "tiny": ">a\nAC\n>b\nA\n>c\nACACACACACACAC\n",
    "lowercase": ">a\nacacacacacacacacacacac\n",
    "no_trailing_newline": ">a\nTTAGGGTTAGGGTTAGGGTTAGGGTTAGGG",
    "name_with_description": ">a desc here\nGATCGATCGATCGATCGATCGATCGATC\n",
}


def _ours(fa, out):
    r = subprocess.run([sys.executable, "-m", "ribbit_tpu.cli", "-i", str(fa),
                        "-o", str(out)], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    return out.read_text()


@pytest.mark.skipif(not ORACLE.exists(), reason="oracle not built")
@pytest.mark.parametrize("name", sorted(CASES))
def test_edge_parity(tmp_path, name):
    fa = tmp_path / "edge.fa"
    fa.write_text(CASES[name])
    orc = tmp_path / "oracle.bed"
    r = subprocess.run([str(ORACLE), "-i", str(fa), "-o", str(orc)],
                       capture_output=True)
    assert r.returncode == 0
    assert _ours(fa, tmp_path / "ours.bed") == orc.read_text()


def test_binary_bytes_treated_as_n(tmp_path):
    """Arbitrary bytes must behave like N (the reference's switch default),
    not crash the reader."""
    fa = tmp_path / "bin.fa"
    fa.write_text(">a\n\x00\x01\x7f\xffACGTACACACACACACACACAC\n",
                  encoding="latin-1")
    out = _ours(fa, tmp_path / "ours.bed")
    assert out == "a\t8\t25\tAC\t2 | 2\t17\t8\t1\t+\tSEED-1\t17=\n"


def test_n_flanked_contig_where_reference_segfaults(tmp_path):
    fa = tmp_path / "ne.fa"
    fa.write_text(">a\nNNNNNACACACACACACACACACACNNNNN\n")
    out = _ours(fa, tmp_path / "ours.bed")
    assert out == "a\t5\t25\tAC\t2 | 2\t20\t10\t1\t+\tSEED-5\t20=\n"
