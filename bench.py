"""End-to-end throughput benchmark.

Runs the full pipeline (FASTA -> BED) on a seeded simulated genome and
reports Mbp/s.  Baseline is the reference ribbit binary (single-core C++)
timed on the same input in the same process environment; vs_baseline is the
throughput ratio (ours / reference).  Prints ONE JSON line.

Metric notes (VERDICT r4 #7 — variance robustness):
  * `value` / `vs_baseline`: WALL-clock on the small fixture — the
    user-visible speedup, but it swings with box contention because ours
    uses all cores while the oracle is single-threaded.
  * `*_cpu` co-metrics: getrusage CPU-seconds (ours: RUSAGE_SELF across
    all threads incl. the native core's pthreads; oracle: RUSAGE_CHILDREN
    delta).  CPU time is the contention-robust work measure on this
    shared 4-core box (CLAUDE.md); `vs_baseline_cpu` is the load-bearing
    cross-round comparison and `chrom_vs_baseline_cpu` its at-scale twin.
  * dual-backend e2e (VERDICT r4 #1): `e2e_host_mbps` is the host path;
    `e2e_tpu_mbps` is a real measured --backend tpu run at the largest
    size the link tolerates (annotated `tunnel-bound` when the dev tunnel
    caps it); `e2e_tpu_model_mbps` is the PCIe-host MODEL (labeled, never
    a measurement) built from live kernel terms per BASELINE.md.

Env knobs:
  RIBBIT_BENCH_LOCI      locus count for the simulated genome (default 120)
  RIBBIT_BENCH_BACKEND   'host' | 'tpu' scan backend for the main fixtures
                         (default host)
  RIBBIT_BENCH_CHROM_MB  chromosome-scale fixture size (default 21.4; 0 = skip)
  RIBBIT_BENCH_TPU_E2E   0 disables the measured --backend tpu e2e run
  RIBBIT_BENCH_REF       force a fresh oracle timing run on the chrom fixture
                         (otherwise the cached /tmp timing+output are reused)
"""

import json
import os
import resource
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ribbit_tpu.config import RibbitConfig
from ribbit_tpu.pipeline import process_fasta
from ribbit_tpu.sim import simulate


def _self_cpu_s() -> float:
    r = resource.getrusage(resource.RUSAGE_SELF)
    return r.ru_utime + r.ru_stime


def _child_cpu_s() -> float:
    r = resource.getrusage(resource.RUSAGE_CHILDREN)
    return r.ru_utime + r.ru_stime


def _write_fasta(path: str, contigs) -> int:
    total = 0
    with open(path, "w") as fh:
        for name, seq in contigs:
            fh.write(f">{name}\n")
            for i in range(0, len(seq), 80):
                fh.write(seq[i:i + 80] + "\n")
            total += len(seq)
    return total


def main() -> None:
    loci = int(os.environ.get("RIBBIT_BENCH_LOCI", "120"))
    contigs = int(os.environ.get("RIBBIT_BENCH_CONTIGS", "4"))
    backend = os.environ.get("RIBBIT_BENCH_BACKEND", "host")

    # multi-contig genome (real genomes are; contigs are the reference's
    # independent unit of work, ribbit.cpp:269-280)
    fa = "/tmp/ribbit_bench.fa"
    total_bp = _write_fasta(fa, (
        (f"bench{ci}",
         simulate(num_loci=loci // contigs, seed=42 + ci,
                  name=f"bench{ci}").sequence)
        for ci in range(contigs)))
    mbp = total_bp / 1e6

    # --- ours (best of 3 by wall; CPU time reported from the same run) ---
    cfg = RibbitConfig.create()
    ours_s, ours_cpu_s = float("inf"), None
    for _ in range(3):
        c0 = _self_cpu_s()
        t0 = time.perf_counter()
        lines = process_fasta(fa, cfg, scan_backend=backend)
        wall = time.perf_counter() - t0
        if wall < ours_s:
            ours_s, ours_cpu_s = wall, _self_cpu_s() - c0
    ours_mbps = mbp / ours_s

    if os.environ.get("RIBBIT_BENCH_SHUFFLE"):
        # test hook: deliberately break emission order so the parity gate's
        # order sensitivity is itself testable
        lines = lines[::-1]

    # --- reference baseline (single-core C++ oracle) ---
    oracle = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tools", "oracle", "ribbit_oracle")
    vs_baseline = None
    cpu = {}
    if not os.path.exists(oracle):
        subprocess.run(["bash", os.path.join(os.path.dirname(oracle),
                                             "build.sh")],
                       capture_output=True)
    if os.path.exists(oracle):
        ref_s, ref_cpu_s = float("inf"), None
        for _ in range(2):
            c0 = _child_cpu_s()
            t0 = time.perf_counter()
            res = subprocess.run([oracle, "-i", fa,
                                  "-o", "/tmp/ribbit_bench_ref.bed"],
                                 capture_output=True)
            wall = time.perf_counter() - t0
            if wall < ref_s:
                ref_s, ref_cpu_s = wall, _child_cpu_s() - c0
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
            if ours_cpu_s and ref_cpu_s:
                cpu = {"ours_cpu_s": round(ours_cpu_s, 3),
                       "oracle_cpu_s": round(ref_cpu_s, 3),
                       "vs_baseline_cpu": round(ref_cpu_s / ours_cpu_s, 4)}

    # --- chromosome-scale workload (single 21.4 Mb chromosome-like contig:
    # repeats + random + 10% N gaps, same recipe as tools/capstone.py).
    # The small fixture above catches the reference at its slowest
    # (~0.10 Mbp/s); at scale it runs 0.20-0.28 Mbp/s, so the at-scale
    # ratio must be measured at scale.  Parity gate: ordered byte-exact. ---
    chrom = {}
    c_ours_s = None
    cbp = 0
    chrom_mb = float(os.environ.get("RIBBIT_BENCH_CHROM_MB", "21.4"))
    if chrom_mb > 0 and os.path.exists(oracle):
        cfa = f"/tmp/ribbit_bench_chrom_{chrom_mb:g}.fa"
        if not os.path.exists(cfa):
            # ~2660 bp/locus measured with n_block_rate=0.1 (includes
            # inter-locus random sequence and N gaps)
            sim = simulate(num_loci=int(chrom_mb * 1e6) // 2660, seed=38,
                           n_block_rate=0.1, name="chr1")
            _write_fasta(cfa + ".tmp", [("chr1", sim.sequence)])
            os.replace(cfa + ".tmp", cfa)
        cbp = sum(len(l.strip()) for l in open(cfa) if not l.startswith(">"))

        c0 = _self_cpu_s()
        t0 = time.perf_counter()
        clines = process_fasta(cfa, cfg, scan_backend=backend)
        c_ours_s = time.perf_counter() - t0
        c_ours_cpu_s = _self_cpu_s() - c0

        # oracle output + timings cached beside the fixture (deterministic
        # input); CPU seconds cached alongside wall so the contention-robust
        # ratio survives oracle-run reuse
        cref = cfa + ".oracle.bed"
        c_ref_s = c_ref_cpu_s = None
        if not os.path.exists(cref) or os.environ.get("RIBBIT_BENCH_REF"):
            cc0 = _child_cpu_s()
            t0 = time.perf_counter()
            res = subprocess.run([oracle, "-i", cfa, "-o", cref + ".tmp"],
                                 capture_output=True)
            c_ref_s = time.perf_counter() - t0
            c_ref_cpu_s = _child_cpu_s() - cc0
            if res.returncode == 0:
                os.replace(cref + ".tmp", cref)
                with open(cfa + ".oracle.secs", "w") as fh:
                    fh.write(f"{c_ref_s} {c_ref_cpu_s}")
        elif os.path.exists(cfa + ".oracle.secs"):
            parts = open(cfa + ".oracle.secs").read().split()
            c_ref_s = float(parts[0])
            c_ref_cpu_s = float(parts[1]) if len(parts) > 1 else None

        if os.path.exists(cref):
            if clines != open(cref).read().splitlines():
                print(json.dumps({"metric": "e2e_throughput", "value": 0.0,
                                  "unit": "Mbp/s", "vs_baseline": 0.0,
                                  "error": "chrom_parity_mismatch"}))
                return
            chrom = {"chrom_mb": round(cbp / 1e6, 2),
                     "chrom_mbps": round(cbp / 1e6 / c_ours_s, 4)}
            if c_ref_s:
                chrom["chrom_vs_baseline"] = round(c_ref_s / c_ours_s, 4)
            if c_ref_cpu_s and c_ours_cpu_s:
                chrom["chrom_ours_cpu_s"] = round(c_ours_cpu_s, 2)
                chrom["chrom_oracle_cpu_s"] = round(c_ref_cpu_s, 2)
                chrom["chrom_vs_baseline_cpu"] = round(
                    c_ref_cpu_s / c_ours_cpu_s, 4)

    # --- on-device TPU kernel throughput (device-resident data; no
    # host<->device transfers in the timed region) ---
    device = {}
    if os.environ.get("RIBBIT_BENCH_DEVICE", "1") != "0":
        try:
            from ribbit_tpu.bench_device import run_device_bench
            device = run_device_bench()
        except Exception as exc:  # no TPU / Mosaic unavailable: e2e only
            print(f"device bench skipped: {exc}", file=sys.stderr)

    # --- dual-backend e2e (VERDICT r4 #1): a real --backend tpu run at
    # the largest size the link tolerates, parity-gated against the host
    # path, plus what `--backend auto` would pick here and why ---
    tpu_e2e = {}
    chip = False
    if os.environ.get("RIBBIT_BENCH_TPU_E2E", "1") != "0":
        # check the knob BEFORE touching jax, and time-box the platform
        # check (a wedged dev tunnel HANGS initialization rather than
        # raising)
        from ribbit_tpu.backend import default_backend_or_none
        chip = default_backend_or_none() in ("tpu", "axon")
    if chip:
        try:
            from ribbit_tpu.backend import LINK_THRESHOLD_MBPS, probe_link_mbps
            link = probe_link_mbps()
            tunnel_bound = link < LINK_THRESHOLD_MBPS
            # the production bitmap stream is ~52 B/bp; size the fixture
            # so the D2H leg stays ~15 s at the MEASURED link rate (a dev
            # tunnel swings 1-6 MB/s between rounds; 0.13 MB was the 1 MB/s
            # floor, 8 MB assumes a real PCIe/ICI attach)
            tmb_default = (min(8.0, max(0.13, link * 15.0 / 52.0))
                           if tunnel_bound else 8.0)
            tmb = float(os.environ.get("RIBBIT_BENCH_TPU_MB",
                                       str(tmb_default)))
            tfa = "/tmp/ribbit_bench_tpu.fa"
            tbp = _write_fasta(tfa, (
                (f"t{ci}",
                 simulate(num_loci=max(1, int(tmb * 1e6 / 2 / 2660)),
                          seed=77 + ci, n_block_rate=0.1,
                          name=f"t{ci}").sequence)
                for ci in range(2)))
            host_lines = process_fasta(tfa, cfg, scan_backend="host")
            t0 = time.perf_counter()
            tlines = process_fasta(tfa, cfg, scan_backend="tpu")
            t_tpu_s = time.perf_counter() - t0
            if tlines != host_lines:
                print(json.dumps({"metric": "e2e_throughput", "value": 0.0,
                                  "unit": "Mbp/s", "vs_baseline": 0.0,
                                  "error": "tpu_backend_parity_mismatch"}))
                return
            tpu_e2e = {"e2e_tpu_mbps": round(tbp / 1e6 / t_tpu_s, 4),
                       "e2e_tpu_fixture_mb": round(tbp / 1e6, 3),
                       "link_mbps": round(link, 1),
                       "backend_auto": "host" if tunnel_bound else "tpu"}
            if tunnel_bound:
                tpu_e2e["e2e_tpu_note"] = (
                    f"tunnel-bound: {link:.1f} MB/s dev link caps the "
                    "~52 B/bp bitmap D2H; PCIe-host projection is "
                    "e2e_tpu_model_mbps")
        except Exception as exc:
            print(f"tpu e2e skipped: {exc}", file=sys.stderr)

    # --- PCIe-host --backend tpu e2e MODEL (labeled; never a measurement).
    # BASELINE.md derivation with live terms: the chip extraction and the
    # D2H leg hide under the multi-contig producer/consumer overlap, so
    # e2e = max(chip-side, host-side) per contig ---
    if c_ours_s and device.get("tpu_event_mbps") \
            and device.get("host_decode_mbps"):
        GEN_FRAC = 0.197     # host generate fraction of chrom wall
        # (RIBBIT_CORE_TIMING 2.43 s / 12.34 s, BASELINE.md PCIe model)
        cmbp = cbp / 1e6
        chip_s = cmbp / device["tpu_event_mbps"] + 52 * cbp / 12e9
        host_s = cmbp / device["host_decode_mbps"] \
            + c_ours_s * (1 - GEN_FRAC)
        tpu_e2e["e2e_tpu_model_mbps"] = round(cmbp / max(chip_s, host_s), 3)
        tpu_e2e["e2e_tpu_model_note"] = (
            "MODEL, not measured: PCIe gen4 host projection from live "
            "kernel terms (BASELINE.md)")

    print(json.dumps({"metric": "e2e_throughput",
                      "value": round(ours_mbps, 4),
                      "unit": "Mbp/s",
                      "vs_baseline": vs_baseline,
                      "e2e_host_mbps": round(ours_mbps, 4),
                      **cpu,
                      **chrom,
                      **device,
                      **tpu_e2e}))


if __name__ == "__main__":
    main()
