"""Intermediate-state parity: the per-phase seed totals the reference logs
(fasta_utils.cpp:134,139,170,249) must match our lattice state exactly —
evidence the merge lattices agree internally, not just on final BED."""

import pathlib
import re
import subprocess
import sys

import pytest

ORACLE = pathlib.Path(__file__).parent.parent / "tools" / "oracle" / "ribbit_oracle"


@pytest.mark.skipif(not ORACLE.exists(), reason="oracle not built")
@pytest.mark.parametrize("name", ["g1", "g2", "g3"])
def test_phase_seed_counts_match_reference(golden_dir, name, tmp_path):
    fa = golden_dir / f"{name}.fa"
    r = subprocess.run([str(ORACLE), "-i", str(fa), "-o", "/dev/null"],
                       capture_output=True, text=True)
    ref = {}
    for line in r.stderr.splitlines():
        m = re.match(r"Total number of (perfect seeds|seeds considering "
                     r"substitutions|seeds considering indels|seeds that are "
                     r"processed for alignment): (\d+)", line)
        if m:
            ref[m.group(1)] = int(m.group(2))

    r = subprocess.run([sys.executable, "-m", "ribbit_tpu.cli", "-i", str(fa),
                        "--timing", "-o", str(tmp_path / "o.bed")],
                       capture_output=True, text=True)
    ours = {}
    for line in r.stderr.splitlines():
        m = re.match(r"\[core\] (perfect seeds|seeds considering "
                     r"substitutions|seeds considering indels|seeds processed "
                     r"for alignment): (\d+)", line)
        if m:
            ours[m.group(1)] = int(m.group(2))

    assert ours["perfect seeds"] == ref["perfect seeds"]
    assert ours["seeds considering substitutions"] == \
        ref["seeds considering substitutions"]
    assert ours["seeds considering indels"] == ref["seeds considering indels"]
    assert ours["seeds processed for alignment"] == \
        ref["seeds that are processed for alignment"]
