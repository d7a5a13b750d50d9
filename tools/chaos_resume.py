#!/usr/bin/env python
"""SIGKILL chaos driver for checkpoint/resume.

Repeatedly starts a multi-contig run, SIGKILLs it at a random point, then
resumes with --resume and verifies the final BED is byte-identical to an
uninterrupted run (and, when the oracle is present, to the oracle).  The
crash window — lines flushed but not yet recorded in the manifest — is the
interesting case; the resume path truncates it (see ribbit_tpu/cli.py).

Usage:  python tools/chaos_resume.py [--cycles 5] [--seed 0]
"""

import argparse
import os
import pathlib
import random
import signal
import subprocess
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from ribbit_tpu.sim import simulate  # noqa: E402

ORACLE = REPO / "tools" / "oracle" / "ribbit_oracle"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cycles", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--contigs", type=int, default=8)
    ap.add_argument("--loci", type=int, default=60)
    args = ap.parse_args()

    tmp = pathlib.Path(tempfile.mkdtemp(prefix="ribbit_chaos_"))
    fa = tmp / "genome.fa"
    with open(fa, "w") as fh:
        for ci in range(args.contigs):
            sim = simulate(num_loci=args.loci, seed=args.seed * 100 + ci,
                           name=f"c{ci}")
            fh.write(f">c{ci}\n")
            for i in range(0, len(sim.sequence), 80):
                fh.write(sim.sequence[i:i + 80] + "\n")

    # uninterrupted run = the expected output
    clean = tmp / "clean.bed"
    subprocess.run([sys.executable, "-m", "ribbit_tpu.cli", "-i", str(fa),
                    "-o", str(clean)], check=True, cwd=REPO)
    expected = clean.read_bytes()
    if ORACLE.exists():
        orc = tmp / "oracle.bed"
        subprocess.run([str(ORACLE), "-i", str(fa), "-o", str(orc)],
                       check=True, capture_output=True)
        assert orc.read_bytes() == expected, "clean run differs from oracle"
        print("clean run verified against oracle")

    rng = random.Random(args.seed)
    ok = 0
    for cyc in range(args.cycles):
        bed = tmp / f"chaos{cyc}.bed"
        for p in (bed, pathlib.Path(str(bed) + ".manifest")):
            if p.exists():
                p.unlink()
        # start, kill at a random moment mid-run, resume until done
        kills = 0
        while True:
            proc = subprocess.Popen(
                [sys.executable, "-m", "ribbit_tpu.cli", "-i", str(fa),
                 "-o", str(bed), "--resume"],
                cwd=REPO, stderr=subprocess.DEVNULL)
            # grow the window with each kill so progress is guaranteed even
            # when interpreter startup eats the first few hundred ms
            delay = rng.uniform(0.2, 2.5) + 0.15 * kills
            time.sleep(delay)
            if proc.poll() is not None:
                break  # finished before the kill — done
            os.kill(proc.pid, signal.SIGKILL)
            proc.wait()
            kills += 1
            if kills > 50:
                print("giving up: run never completes between kills")
                return 2
        same = bed.read_bytes() == expected
        ok += same
        print(f"cycle {cyc}: {kills} SIGKILLs -> "
              f"{'identical' if same else 'MISMATCH'}")
        if not same:
            return 1
    print(f"chaos: {ok}/{args.cycles} cycles byte-identical after SIGKILLs")
    return 0


if __name__ == "__main__":
    sys.exit(main())
