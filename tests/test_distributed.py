"""Distributed contig processing over the virtual 8-device CPU mesh:
device-sharded event extraction + host-exact seed core must reproduce the
single-process whole-contig output."""

from ribbit_tpu.config import RibbitConfig
from ribbit_tpu.sim import simulate


def test_distributed_matches_whole_contig(cpu_jax):
    from ribbit_tpu.pipeline import process_sequence
    from ribbit_tpu.parallel.distributed import distributed_process_contig

    parts = []
    for ci in range(4):
        sim = simulate(num_loci=4, seed=700 + ci, name=f"d{ci}")
        parts.append(sim.sequence)
        parts.append("N" * 800)
    genome = "".join(parts)
    cfg = RibbitConfig.create()

    whole = process_sequence("chr", genome, cfg)
    dist = distributed_process_contig("chr", genome, cfg, chunk_size=25_000,
                                      n_devices=8)
    assert dist == whole
