#!/usr/bin/env python
"""Whole-genome capstone: hg38-proportioned synthetic genome, parity + perf.

Generates a multi-contig genome whose contig sizes follow the hg38
chromosome length ratios, runs ribbit_tpu.cli (threaded, resumable) and the
reference oracle on the same input, byte-compares per contig, and reports
Mbp/s for both.  The round-1 EVIDENCE.md run was the full scale:

    python tools/capstone.py --mb 3085        # ~186 min oracle, ~30 min ours

A scaled-down run (e.g. --mb 20) exercises the identical code paths in a
few minutes.  Contigs are compared one by one so a partial run still
verifies everything it produced.
"""

import argparse
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from ribbit_tpu.sim import simulate  # noqa: E402

ORACLE = REPO / "tools" / "oracle" / "ribbit_oracle"

# hg38 chromosome lengths (Mb, GRCh38) used as size proportions
HG38_MB = [248.9, 242.2, 198.3, 190.2, 181.5, 170.8, 159.3, 145.1, 138.4,
           133.8, 135.1, 133.3, 114.4, 107.0, 102.0, 90.3, 83.3, 80.4, 58.6,
           64.4, 46.7, 50.8, 156.0, 57.2]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=20.0,
                    help="total genome size in Mbp (3085 = full hg38 scale)")
    ap.add_argument("--contigs", type=int, default=24)
    ap.add_argument("--seed", type=int, default=38)
    ap.add_argument("--workdir", default="/tmp/ribbit_capstone")
    ap.add_argument("--skip-oracle", action="store_true",
                    help="only run ours (for timing without the baseline)")
    args = ap.parse_args()

    wd = pathlib.Path(args.workdir)
    wd.mkdir(parents=True, exist_ok=True)
    fa = wd / "genome.fa"

    props = HG38_MB[:args.contigs]
    scale = args.mb / sum(props)
    sizes = [max(100_000, int(p * scale * 1e6)) for p in props]

    if not fa.exists() or abs(fa.stat().st_size - sum(sizes) * 81 / 80) > \
            0.02 * sum(sizes):
        print(f"generating {sum(sizes)/1e6:.1f} Mbp over {len(sizes)} "
              f"contigs ...", file=sys.stderr)
        with open(fa, "w") as fh:
            for ci, size in enumerate(sizes):
                # ~2660 bp per simulated locus (measured; keeps --mb
                # equal to the actual generated genome size)
                sim = simulate(num_loci=size // 2660, seed=args.seed + ci,
                               n_block_rate=0.1, name=f"chr{ci+1}")
                fh.write(f">chr{ci+1}\n")
                s = sim.sequence
                for i in range(0, len(s), 80):
                    fh.write(s[i:i + 80] + "\n")
    total_bp = sum(len(l.strip()) for l in open(fa) if not l.startswith(">"))
    mbp = total_bp / 1e6
    print(f"genome: {mbp:.1f} Mbp, {len(sizes)} contigs", file=sys.stderr)

    ours_bed = wd / "ours.bed"
    # a COMPLETE manifest from a prior run in the same workdir would make
    # --resume skip every contig (a vacuous re-run that reports seconds
    # and trivially "identical" output); start fresh, keep --resume only
    # for crash recovery within THIS run
    for stale in (ours_bed, wd / "ours.bed.manifest.json"):
        stale.unlink(missing_ok=True)
    t0 = time.perf_counter()
    r = subprocess.run([sys.executable, "-m", "ribbit_tpu.cli", "-i", str(fa),
                        "-o", str(ours_bed), "--resume"], cwd=REPO)
    ours_s = time.perf_counter() - t0
    if r.returncode != 0:
        return 1
    print(f"ours : {ours_s:8.1f} s  ({mbp / ours_s:6.3f} Mbp/s)")

    if args.skip_oracle:
        return 0

    if not ORACLE.exists():
        subprocess.run(["bash", str(ORACLE.parent / "build.sh")], check=True)
    orc_bed = wd / "oracle.bed"
    t0 = time.perf_counter()
    r = subprocess.run([str(ORACLE), "-i", str(fa), "-o", str(orc_bed)],
                       capture_output=True)
    orc_s = time.perf_counter() - t0
    if r.returncode != 0:
        print(f"oracle FAILED rc={r.returncode}", file=sys.stderr)
        return 2
    print(f"oracle: {orc_s:8.1f} s  ({mbp / orc_s:6.3f} Mbp/s)  "
          f"speedup {orc_s / ours_s:.2f}x")

    # per-contig byte comparison
    def split_by_contig(path):
        per = {}
        for line in open(path):
            per.setdefault(line.split("\t", 1)[0], []).append(line)
        return per

    ours_per, orc_per = split_by_contig(ours_bed), split_by_contig(orc_bed)
    bad = 0
    for ci in range(len(sizes)):
        name = f"chr{ci+1}"
        same = ours_per.get(name, []) == orc_per.get(name, [])
        bad += not same
        print(f"  {name}: {'identical' if same else 'MISMATCH'} "
              f"({len(ours_per.get(name, []))} lines)")
    print(f"capstone: {len(sizes) - bad}/{len(sizes)} contigs byte-identical")
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
