"""Backend auto-selection (--backend auto, VERDICT r4 #1)."""

import numpy as np


def _reset():
    import ribbit_tpu.backend as b
    b._cached = None
    return b


def test_explicit_choices_pass_through(cpu_jax, monkeypatch):
    b = _reset()
    monkeypatch.delenv("RIBBIT_BACKEND", raising=False)
    assert b.resolve_backend("host") == "host"
    assert b.resolve_backend("tpu") == "tpu"


def test_auto_without_tpu_backend_is_host(cpu_jax, monkeypatch):
    b = _reset()
    monkeypatch.delenv("RIBBIT_BACKEND", raising=False)
    # the suite forces the CPU platform, so auto must land on host
    assert b.resolve_backend("auto", quiet=True) == "host"


def test_auto_env_override(cpu_jax, monkeypatch):
    b = _reset()
    monkeypatch.setenv("RIBBIT_BACKEND", "tpu")
    assert b.resolve_backend("auto", quiet=True) == "tpu"
    monkeypatch.setenv("RIBBIT_BACKEND", "host")
    assert b.resolve_backend("auto", quiet=True) == "host"


def test_auto_without_local_accelerator_short_circuits(cpu_jax, monkeypatch):
    """Without a local accelerator device node, auto resolves host
    instantly (no jax import, no probe — the round-6 fix for CLI
    subprocesses paying tunnel-session init per invocation)."""
    b = _reset()
    monkeypatch.delenv("RIBBIT_BACKEND", raising=False)
    monkeypatch.setattr(b, "_local_accelerator_present", lambda: False)
    monkeypatch.setattr(b, "_probe_choice",
                        lambda: (_ for _ in ()).throw(AssertionError))
    assert b.resolve_backend("auto", quiet=True) == "host"


def test_auto_probe_timeout_degrades_to_host(cpu_jax, monkeypatch):
    """A wedged driver/probe must time out to host, not hang the CLI."""
    import time
    b = _reset()
    monkeypatch.delenv("RIBBIT_BACKEND", raising=False)
    monkeypatch.setattr(b, "_local_accelerator_present", lambda: True)
    monkeypatch.setattr(b, "_PROBE_TIMEOUT_S", 0.2)
    monkeypatch.setattr(b, "probe_link_mbps",
                        lambda nbytes=0: time.sleep(30))
    assert b.resolve_backend("auto", quiet=True) == "host"


def test_auto_link_threshold(cpu_jax, monkeypatch):
    """auto picks tpu only when the probed link clears the flagword-stream
    threshold; a tunnel-class link must fall back to host."""
    import jax
    b = _reset()
    monkeypatch.delenv("RIBBIT_BACKEND", raising=False)
    monkeypatch.setattr(b, "_local_accelerator_present", lambda: True)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    monkeypatch.setattr(b, "probe_link_mbps", lambda nbytes=0: 12_000.0)
    assert b.resolve_backend("auto", quiet=True) == "tpu"

    b._cached = None
    monkeypatch.setattr(b, "probe_link_mbps", lambda nbytes=0: 1.0)
    assert b.resolve_backend("auto", quiet=True) == "host"

    # decision is cached per process
    monkeypatch.setattr(b, "probe_link_mbps",
                        lambda nbytes=0: (_ for _ in ()).throw(AssertionError))
    assert b.resolve_backend("auto", quiet=True) == "host"


def test_probe_measures_roundtrip(cpu_jax):
    """The probe must return a finite positive MB/s figure on any backend
    (CPU included) without touching global state."""
    b = _reset()
    mbps = b.probe_link_mbps(64 << 10)
    assert np.isfinite(mbps) and mbps > 0


def test_cli_auto_resolves_and_keeps_parity(cpu_jax, golden_dir, tmp_path,
                                            capsys):
    """End-to-end: the CLI default (--backend auto) resolves on a CPU-only
    host and produces oracle-identical output."""
    from ribbit_tpu.cli import main
    _reset()
    out = tmp_path / "out.bed"
    rc = main(["-i", str(golden_dir / "g3.fa"), "-o", str(out)])
    assert rc == 0
    expected = (golden_dir / "g3.oracle.bed").read_text()
    assert out.read_text() == expected
