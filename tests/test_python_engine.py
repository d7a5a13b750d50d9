"""The pure-Python engine is the validated semantics specification that the
native core and device kernels are checked against — it must keep oracle
parity itself, including its two fallback modes."""

import os

import pytest

from ribbit_tpu.config import RibbitConfig
from ribbit_tpu.fasta import read_fasta
from ribbit_tpu.pipeline import process_sequence


def _expected(golden_dir, name):
    return (golden_dir / f"{name}.oracle.bed").read_text().splitlines()


def test_python_engine_parity(golden_dir):
    """Full Python engine: scan_host + events + lattice + refine."""
    cfg = RibbitConfig.create()
    lines = []
    for sid, seq in read_fasta(str(golden_dir / "g1.fa")):
        process_sequence(sid, seq, cfg, out=lines, engine="python")
    assert lines == _expected(golden_dir, "g1")


def test_python_refinement_over_native_seeds(golden_dir, monkeypatch):
    """RIBBIT_PY_REFINE: native scan/lattices + Python refinement."""
    monkeypatch.setenv("RIBBIT_PY_REFINE", "1")
    cfg = RibbitConfig.create()
    lines = []
    for sid, seq in read_fasta(str(golden_dir / "g1.fa")):
        process_sequence(sid, seq, cfg, out=lines, engine="core")
    assert lines == _expected(golden_dir, "g1")
