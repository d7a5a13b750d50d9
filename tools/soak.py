#!/usr/bin/env python
"""Randomized parity soak/fuzz driver: ours vs the reference oracle.

Every iteration generates a seeded input (and possibly a randomized CLI
config), runs BOTH the reference oracle binary and ribbit_tpu.cli on it,
and byte-compares the BED outputs (whole file, in order).  This is the
committed harness behind the EVIDENCE.md soak rows.

Modes
  content     simulated genomes with randomized purity bands / N blocks
  config      golden-style genomes under randomized -m/-M/-l/--min-units/
              --perfect-units (int form)
  sparse-tsv  randomized sparse per-motif TSV threshold files (incl. the
              reference's no-tab-row quirk)
  fuzz        adversarial small genomes: nested periods, indel-laden
              repeats, homopolymers, N patterns, random tails
  scale       0.7-2.5 Mb genomes, 1-2 contigs, varying --workers
  stream      5-15 Mb single-contig genomes, ours STREAMING vs ours BATCH
              (RIBBIT_STREAM=0) instead of the oracle — targets the
              streaming consume->refine machinery (watermark finality,
              restart-tombstone poison) at the scale where it triggers;
              the batch path is the oracle-validated reference here

Usage:  python tools/soak.py --mode fuzz --n 50 [--seed 0] [--keep-going]

Exit 0 = every compared case identical.  Iterations where the oracle
crashes (it SEGFAULTS on N-flanked contigs — a reference bug, see
tests/test_edge_cases.py) are counted as skipped, not failures.
"""

import argparse
import pathlib
import random
import subprocess
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from ribbit_tpu.sim import simulate  # noqa: E402

ORACLE = REPO / "tools" / "oracle" / "ribbit_oracle"


def write_fasta(path, records):
    with open(path, "w") as fh:
        for name, seq in records:
            fh.write(f">{name}\n")
            for i in range(0, len(seq), 80):
                fh.write(seq[i:i + 80] + "\n")


def _rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def _mutate(rng, s, rate):
    out = []
    for ch in s:
        r = rng.random()
        if r < rate * 0.8:
            out.append(rng.choice("ACGT"))          # substitution
        elif r < rate * 0.9:
            out.append(ch + rng.choice("ACGT"))     # insertion
        elif r < rate:
            pass                                    # deletion
        else:
            out.append(ch)
    return "".join(out)


def gen_fuzz(rng):
    """One adversarial genome: stacked pathological repeat structures."""
    parts = [_rand_seq(rng, rng.randint(100, 400))]
    for _ in range(rng.randint(2, 6)):
        kind = rng.randrange(5)
        if kind == 0:      # nested periods: motif whose unit is itself periodic
            inner = _rand_seq(rng, rng.randint(2, 6))
            motif = inner * rng.randint(2, 4) + _rand_seq(rng, rng.randint(0, 3))
            parts.append(_mutate(rng, motif * rng.randint(4, 20), 0.05))
        elif kind == 1:    # indel-laden long-motif repeat
            motif = _rand_seq(rng, rng.randint(11, 80))
            parts.append(_mutate(rng, motif * rng.randint(3, 8), 0.12))
        elif kind == 2:    # homopolymer / dinucleotide runs
            parts.append(rng.choice(["A", "T", "AC", "AG", "CT"])
                         * rng.randint(10, 120))
        elif kind == 3:    # N-interrupted repeat
            motif = _rand_seq(rng, rng.randint(2, 10))
            run = _mutate(rng, motif * rng.randint(6, 25), 0.08)
            cut = rng.randint(0, max(0, len(run) - 10))
            parts.append(run[:cut] + "N" * rng.randint(1, 30) + run[cut:])
        else:              # adjacent different-motif repeats (merge stress)
            for _ in range(rng.randint(2, 3)):
                motif = _rand_seq(rng, rng.randint(2, 15))
                parts.append(_mutate(rng, motif * rng.randint(4, 12), 0.06))
        parts.append(_rand_seq(rng, rng.randint(20, 200)))
    seq = "".join(parts)
    # oracle segfaults on N-flanked contigs: keep ACGT at both ends
    return "A" + seq.strip("N") + "A" if (seq.startswith("N")
                                          or seq.endswith("N")) else seq


def _write_sparse_tsv(rng, path, lo=0, hi=30):
    sizes = rng.sample(range(2, 101), rng.randint(2, 12))
    with open(path, "w") as fh:
        for m in sorted(sizes):
            if rng.random() < 0.15:
                fh.write(f"{m}\n")                 # no-tab-row quirk
            else:
                fh.write(f"{m}\t{rng.randint(lo, hi)}\n")
    return str(path)


def build_case(mode, it, seed, tmp):
    """Returns (fasta_path, extra_cli_args, ours_extra_args)."""
    rng = random.Random((seed << 20) + it)
    fa = tmp / f"case{it}.fa"
    extra, ours_extra = [], []

    if mode == "content":
        nrec = rng.randint(1, 3)
        recs = []
        for c in range(nrec):
            mmin = rng.choice([2, 2, 2, 5, 11])
            sim = simulate(num_loci=rng.randint(4, 25),
                           seed=rng.randrange(1 << 30),
                           min_motif=mmin,
                           max_motif=max(mmin, rng.choice([10, 40, 100, 100])),
                           min_purity=rng.choice([0.80, 0.85, 0.90]),
                           max_purity=rng.choice([0.95, 0.98, 1.0]),
                           n_block_rate=rng.choice([0.0, 0.2, 0.5]),
                           name=f"c{c}")
            recs.append((f"c{c}", sim.sequence))
        write_fasta(fa, recs)
    elif mode == "config":
        sim = simulate(num_loci=rng.randint(6, 20),
                       seed=rng.randrange(1 << 30), name="cfg")
        write_fasta(fa, [("cfg", sim.sequence)])
        mmin = rng.choice([1, 2, 2, 3, 5, 11])
        mmax = max(mmin, rng.choice([10, 25, 60, 100, 120]))
        extra = ["-m", str(mmin), "-M", str(mmax)]
        pick = rng.randrange(4)
        if pick == 1:
            extra += ["-l", str(rng.randint(6, 40))]
        elif pick == 2:
            extra += ["--min-units", str(rng.randint(2, 6))]
        elif pick == 3:
            extra += ["--perfect-units", str(rng.randint(1, 5))]
        if rng.random() < 0.3:
            extra += ["-p", str(rng.choice([0.5, 0.9]))]  # parsed-and-ignored
    elif mode == "sparse-tsv":
        sim = simulate(num_loci=rng.randint(6, 20),
                       seed=rng.randrange(1 << 30), name="tsv")
        write_fasta(fa, [("tsv", sim.sequence)])
        which = rng.randrange(3)
        flag = ["-l", "--min-units", "--perfect-units"][which]
        extra = [flag, _write_sparse_tsv(rng, tmp / f"t{it}.tsv",
                                         hi=30 if which == 0 else 6)]
    elif mode == "fuzz":
        write_fasta(fa, [("fz", gen_fuzz(rng))])
    elif mode == "stream":
        target = rng.randint(5_000_000, 15_000_000)
        sim = simulate(num_loci=target // 2660,
                       seed=rng.randrange(1 << 30),
                       n_block_rate=rng.choice([0.0, 0.1, 0.3]),
                       name="st0")
        write_fasta(fa, [("st0", sim.sequence)])
    elif mode == "scale":
        target = rng.randint(700_000, 2_500_000)
        nrec = rng.randint(1, 2)
        recs = []
        for c in range(nrec):
            # ~1100 bp/locus average incl. buffer
            sim = simulate(num_loci=target // nrec // 1100,
                           seed=rng.randrange(1 << 30),
                           n_block_rate=rng.choice([0.0, 0.3]),
                           name=f"s{c}")
            recs.append((f"s{c}", sim.sequence))
        write_fasta(fa, recs)
        ours_extra = ["--workers", str(rng.choice([1, 4, 8]))]
    else:
        raise SystemExit(f"unknown mode {mode}")
    return fa, extra, ours_extra


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", required=True,
                    choices=["content", "config", "sparse-tsv", "fuzz",
                             "scale", "stream"])
    ap.add_argument("--n", type=int, default=30)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--keep-going", action="store_true")
    args = ap.parse_args()

    if args.mode != "stream" and not ORACLE.exists():
        subprocess.run(["bash", str(ORACLE.parent / "build.sh")], check=True)

    tmp = pathlib.Path(tempfile.mkdtemp(prefix=f"ribbit_soak_{args.mode}_"))
    ident = failed = skipped = 0
    for it in range(args.n):
        fa, extra, ours_extra = build_case(args.mode, it, args.seed, tmp)
        obed = tmp / f"o{it}.bed"
        rbed = tmp / f"r{it}.bed"
        if args.mode == "stream":
            import os
            env = dict(os.environ)
            env["RIBBIT_STREAM"] = "0"
            r = subprocess.run([sys.executable, "-m", "ribbit_tpu.cli",
                                "-i", str(fa), "-o", str(obed)] + extra,
                               capture_output=True, cwd=REPO, env=env)
        else:
            r = subprocess.run([str(ORACLE), "-i", str(fa), "-o", str(obed)]
                               + extra, capture_output=True)
        if r.returncode != 0:
            skipped += 1
            print(f"[{it}] oracle rc={r.returncode} -> skipped")
            continue
        r = subprocess.run([sys.executable, "-m", "ribbit_tpu.cli",
                            "-i", str(fa), "-o", str(rbed)]
                           + extra + ours_extra,
                           capture_output=True, cwd=REPO)
        if r.returncode != 0:
            failed += 1
            print(f"[{it}] OURS FAILED rc={r.returncode}: "
                  f"{r.stderr.decode()[-400:]}")
            if not args.keep_going:
                return 1
            continue
        if obed.read_bytes() == rbed.read_bytes():
            ident += 1
            print(f"[{it}] identical ({obed.stat().st_size} B, "
                  f"args={extra + ours_extra})")
        else:
            failed += 1
            print(f"[{it}] MISMATCH: {fa} args={extra + ours_extra} "
                  f"(outputs kept in {tmp})")
            if not args.keep_going:
                return 1
    print(f"\n{args.mode}: {ident} identical, {failed} mismatched, "
          f"{skipped} skipped (oracle crash) of {args.n}")
    return 0 if failed == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
