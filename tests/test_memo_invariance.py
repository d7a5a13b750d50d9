"""The content-addressed caches (align memo, vote memo) must be pure
accelerations: output with each memo disabled is byte-identical to the
default run.  The gates are read once per process (static init in
csrc/ribbit_refine.c), so each variant runs in a subprocess."""

import os
import subprocess
import sys

from ribbit_tpu.sim import simulate

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(fa, out, extra_env):
    env = dict(os.environ)
    env.update(extra_env)
    env["PYTHONPATH"] = REPO
    subprocess.run(
        [sys.executable, "-m", "ribbit_tpu.cli", "-i", str(fa),
         "-o", str(out)],
        check=True, env=env, cwd=REPO, capture_output=True)
    return open(out, "rb").read()


def test_memos_do_not_change_output(tmp_path):
    # large motifs (> 10) force the diagonal-vote path; repeat-dense so
    # both memos see duplicates
    fa = tmp_path / "m.fa"
    sim = simulate(num_loci=60, seed=9177, min_motif=2, max_motif=60,
                   name="m")
    with open(fa, "w") as fh:
        fh.write(">m\n")
        for i in range(0, len(sim.sequence), 80):
            fh.write(sim.sequence[i:i + 80] + "\n")

    default = _run_cli(fa, tmp_path / "d.bed", {})
    assert default  # non-trivial output
    no_vote = _run_cli(fa, tmp_path / "nv.bed", {"RIBBIT_VOTE_MEMO": "0"})
    no_align = _run_cli(fa, tmp_path / "na.bed", {"RIBBIT_ALIGN_MEMO": "0"})
    no_both = _run_cli(fa, tmp_path / "nb.bed",
                       {"RIBBIT_VOTE_MEMO": "0", "RIBBIT_ALIGN_MEMO": "0"})
    assert no_vote == default
    assert no_align == default
    assert no_both == default


def test_memos_invariant_with_n_blocks(tmp_path):
    """N-rich fixture: seeds adjacent to N blocks take the N-trimmed vote
    paths (small ssl / masked votes), where the memo's default-0 replay
    semantics matter (see tests/test_vote_memo.py for the unit-level
    regression).  The sequence is duplicated so identical content windows
    recur at two absolute addresses, forcing cross-address memo hits."""
    fa = tmp_path / "n.fa"
    sim = simulate(num_loci=40, seed=4242, min_motif=12, max_motif=80,
                   name="n", n_block_rate=0.8, buffer_range=(60, 400))
    seq = sim.sequence + sim.sequence
    with open(fa, "w") as fh:
        fh.write(">n\n")
        for i in range(0, len(seq), 80):
            fh.write(seq[i:i + 80] + "\n")

    default = _run_cli(fa, tmp_path / "d.bed", {})
    assert default
    no_vote = _run_cli(fa, tmp_path / "nv.bed", {"RIBBIT_VOTE_MEMO": "0"})
    no_both = _run_cli(fa, tmp_path / "nb.bed",
                       {"RIBBIT_VOTE_MEMO": "0", "RIBBIT_ALIGN_MEMO": "0"})
    assert no_vote == default
    assert no_both == default
