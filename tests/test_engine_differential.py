"""Direct differential between the native C engine and the pure-Python
specification engine (independent of the oracle axis)."""

from ribbit_tpu.config import RibbitConfig
from ribbit_tpu.pipeline import process_sequence
from ribbit_tpu.sim import simulate


def test_core_engine_equals_python_spec():
    cfg = RibbitConfig.create()
    for trial in range(6):
        sim = simulate(num_loci=4, seed=21000 + trial, name=f"d{trial}",
                       n_block_rate=0.3 if trial % 2 else 0.0)
        c = process_sequence("x", sim.sequence, cfg, engine="core")
        p = process_sequence("x", sim.sequence, cfg, engine="python")
        assert c == p
