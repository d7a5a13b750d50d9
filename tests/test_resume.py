"""Per-contig checkpoint/resume via the output manifest (SURVEY.md §5:
the contig is the unit of restartability)."""

import json
import subprocess
import sys

import pytest

from ribbit_tpu.sim import simulate


@pytest.fixture(scope="module")
def multi_fa(tmp_path_factory):
    d = tmp_path_factory.mktemp("resume")
    fa = d / "multi.fa"
    with open(fa, "w") as fh:
        for ci in range(3):
            sim = simulate(num_loci=5, seed=500 + ci, name=f"c{ci}")
            fh.write(f">c{ci}\n")
            for i in range(0, len(sim.sequence), 80):
                fh.write(sim.sequence[i:i + 80] + "\n")
    return fa


def _run(fa, out, *extra):
    r = subprocess.run([sys.executable, "-m", "ribbit_tpu.cli", "-i", str(fa),
                        "-o", str(out), *extra], capture_output=True,
                       text=True)
    assert r.returncode == 0, r.stderr
    return r.stderr


def test_resume_skips_completed_and_reproduces(multi_fa, tmp_path):
    full = tmp_path / "full.bed"
    _run(multi_fa, full)
    expected = full.read_text()

    out = tmp_path / "resumable.bed"
    _run(multi_fa, out, "--resume")
    manifest = json.loads((tmp_path / "resumable.bed.manifest.json").read_text())
    assert set(manifest["contigs"]) == {"c0", "c1", "c2"}
    assert out.read_text() == expected

    # simulate a crash after contig c0: keep only c0's lines + manifest entry
    c0_lines = manifest["contigs"]["c0"]["lines"]
    partial_lines = expected.splitlines(keepends=True)[:c0_lines]
    out.write_text("".join(partial_lines))
    (tmp_path / "resumable.bed.manifest.json").write_text(
        json.dumps({"contigs": {"c0": manifest["contigs"]["c0"]}}))

    stderr = _run(multi_fa, out, "--resume")
    assert "Resuming: 1 contig(s)" in stderr
    assert out.read_text() == expected


def test_resume_truncates_unrecorded_partial_lines(multi_fa, tmp_path):
    """A crash between the output flush and the manifest update leaves
    unrecorded lines; resume must truncate them, never duplicate."""
    full = tmp_path / "full.bed"
    _run(multi_fa, full)
    expected = full.read_text()

    out = tmp_path / "r.bed"
    _run(multi_fa, out, "--resume")
    manifest_path = tmp_path / "r.bed.manifest.json"
    man = json.loads(manifest_path.read_text())
    keep = list(man["contigs"])[:1]
    lines_keep = sum(man["contigs"][n]["lines"] for n in keep)
    partial = expected.splitlines(keepends=True)[:lines_keep + 3]
    out.write_text("".join(partial))
    manifest_path.write_text(
        json.dumps({"contigs": {n: man["contigs"][n] for n in keep}}))

    _run(multi_fa, out, "--resume")
    assert out.read_text() == expected
