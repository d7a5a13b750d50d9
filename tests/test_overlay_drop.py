"""The large-contig memory policy (pipeline._process_core) frees the packed
overlay cache before refinement; the has-run-of-3 gate then recomputes with
early exit (csrc/ribbit_core.c:overlay_has_run3).  Forcing the policy on a
small fixture must leave the output byte-identical."""

import os
import subprocess
import sys


def _run(fa, out, env_extra):
    env = dict(os.environ, **env_extra)
    r = subprocess.run([sys.executable, "-m", "ribbit_tpu.cli", "-i", str(fa),
                        "-o", str(out)], capture_output=True, text=True,
                       env=env)
    assert r.returncode == 0, r.stderr
    return out.read_text()


def test_overlay_drop_byte_identical(tmp_path):
    from ribbit_tpu.sim import simulate

    fa = tmp_path / "g.fa"
    simulate(num_loci=40, seed=913, name="od").to_fasta(str(fa))
    base = _run(fa, tmp_path / "base.bed", {})
    dropped = _run(fa, tmp_path / "drop.bed", {"RIBBIT_OVERLAY_DROP_MIN": "0"})
    assert dropped == base
