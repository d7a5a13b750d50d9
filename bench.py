"""End-to-end throughput benchmark.

Runs the full pipeline (FASTA -> BED) on a seeded simulated genome and
reports Mbp/s.  Baseline is the reference ribbit binary (single-core C++)
timed on the same input in the same process environment; vs_baseline is the
throughput ratio (ours / reference).  Prints ONE JSON line.

Env knobs:
  RIBBIT_BENCH_LOCI     locus count for the simulated genome (default 120)
  RIBBIT_BENCH_BACKEND  'host' | 'tpu' scan backend (default host)
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ribbit_tpu.config import RibbitConfig
from ribbit_tpu.pipeline import process_fasta
from ribbit_tpu.sim import simulate


def main() -> None:
    loci = int(os.environ.get("RIBBIT_BENCH_LOCI", "120"))
    contigs = int(os.environ.get("RIBBIT_BENCH_CONTIGS", "4"))
    backend = os.environ.get("RIBBIT_BENCH_BACKEND", "host")

    # multi-contig genome (real genomes are; contigs are the reference's
    # independent unit of work, ribbit.cpp:269-280)
    fa = "/tmp/ribbit_bench.fa"
    total_bp = 0
    with open(fa, "w") as fh:
        for ci in range(contigs):
            sim = simulate(num_loci=loci // contigs, seed=42 + ci,
                           name=f"bench{ci}")
            fh.write(f">bench{ci}\n")
            for i in range(0, len(sim.sequence), 80):
                fh.write(sim.sequence[i:i + 80] + "\n")
            total_bp += len(sim.sequence)
    mbp = total_bp / 1e6

    # --- ours (best of 3: first call also warms the native lib) ---
    cfg = RibbitConfig.create()
    ours_s = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        lines = process_fasta(fa, cfg, scan_backend=backend)
        ours_s = min(ours_s, time.perf_counter() - t0)
    ours_mbps = mbp / ours_s

    if os.environ.get("RIBBIT_BENCH_SHUFFLE"):
        # test hook: deliberately break emission order so the parity gate's
        # order sensitivity is itself testable
        lines = lines[::-1]

    # --- reference baseline (single-core C++ oracle) ---
    oracle = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tools", "oracle", "ribbit_oracle")
    vs_baseline = None
    if not os.path.exists(oracle):
        subprocess.run(["bash", os.path.join(os.path.dirname(oracle),
                                             "build.sh")],
                       capture_output=True)
    if os.path.exists(oracle):
        ref_s = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            res = subprocess.run([oracle, "-i", fa,
                                  "-o", "/tmp/ribbit_bench_ref.bed"],
                                 capture_output=True)
            ref_s = min(ref_s, time.perf_counter() - t0)
        if res.returncode == 0:
            vs_baseline = round((mbp / ours_s) / (mbp / ref_s), 4)
            # sanity: outputs must match BYTE-FOR-BYTE IN ORDER (emission
            # order is part of the parity contract) or the speed is
            # meaningless
            ref = open("/tmp/ribbit_bench_ref.bed").read().splitlines()
            if lines != ref:
                print(json.dumps({"metric": "e2e_throughput", "value": 0.0,
                                  "unit": "Mbp/s", "vs_baseline": 0.0,
                                  "error": "parity_mismatch"}))
                return

    # --- on-device TPU kernel throughput (device-resident data; no
    # host<->device transfers in the timed region) ---
    device = {}
    if os.environ.get("RIBBIT_BENCH_DEVICE", "1") != "0":
        try:
            from ribbit_tpu.bench_device import run_device_bench
            device = run_device_bench()
        except Exception as exc:  # no TPU / Mosaic unavailable: e2e only
            print(f"device bench skipped: {exc}", file=sys.stderr)

    print(json.dumps({"metric": "e2e_throughput",
                      "value": round(ours_mbps, 4),
                      "unit": "Mbp/s",
                      "vs_baseline": vs_baseline,
                      **device}))


if __name__ == "__main__":
    main()
