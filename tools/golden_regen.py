#!/usr/bin/env python
"""Regenerate the committed golden fixtures under tests/golden/.

Each fixture is a seeded hermetic simulation (ribbit_tpu.sim) annotated by
the reference oracle binary (rebuilt by tools/oracle/build.sh):

  g1: motifs 2-10          — small-motif refinement path
  g2: motifs 11-60         — large-motif path (diagonal vote + SSW + CIGAR)
  g3: motifs 2-100, N rate — N handling in scanners and refinement

Run from the repo root:  python tools/golden_regen.py [--check]

--check regenerates into a temp dir and verifies the committed fixtures
are byte-identical (no write).  Without it, fixtures are rewritten in
place (do this only when sim.py or the fixture specs deliberately change).
"""

import argparse
import pathlib
import subprocess
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from ribbit_tpu.sim import simulate  # noqa: E402

ORACLE = REPO / "tools" / "oracle" / "ribbit_oracle"

# fixture name -> simulate() kwargs (seeds recorded at generation time)
SPECS = {
    "g1": dict(num_loci=6, seed=1, min_motif=2, max_motif=10),
    "g2": dict(num_loci=6, seed=2, min_motif=11, max_motif=60),
    "g3": dict(num_loci=5, seed=3, min_motif=2, max_motif=100,
               n_block_rate=0.3),
}


def write_fasta(path: pathlib.Path, name: str, seq: str) -> None:
    with open(path, "w") as fh:
        fh.write(f">{name}\n")
        for i in range(0, len(seq), 80):
            fh.write(seq[i:i + 80] + "\n")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="verify committed fixtures instead of rewriting")
    args = ap.parse_args()

    if not ORACLE.exists():
        subprocess.run(["bash", str(ORACLE.parent / "build.sh")], check=True)

    outdir = REPO / "tests" / "golden"
    workdir = pathlib.Path(tempfile.mkdtemp()) if args.check else outdir

    ok = True
    for name, kw in SPECS.items():
        sim = simulate(name=name, **kw)
        fa = workdir / f"{name}.fa"
        bed = workdir / f"{name}.oracle.bed"
        write_fasta(fa, name, sim.sequence)
        r = subprocess.run([str(ORACLE), "-i", str(fa), "-o", str(bed)],
                           capture_output=True)
        if r.returncode != 0:
            print(f"{name}: oracle FAILED rc={r.returncode}", file=sys.stderr)
            return 2
        if args.check:
            for suffix in (".fa", ".oracle.bed"):
                new = (workdir / f"{name}{suffix}").read_bytes()
                old = (outdir / f"{name}{suffix}").read_bytes()
                status = "identical" if new == old else "DIFFERS"
                ok &= new == old
                print(f"{name}{suffix}: {status}")
        else:
            print(f"{name}: regenerated ({len(sim.sequence)} bp)")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
