"""Backend auto-selection (--backend auto, the default).

The reference is CPU-only (ribbit.cpp:180-297); ribbit-tpu adds a device
event-extraction path (--backend tpu) whose win condition depends on the
host<->device LINK, not just on chip presence: the production bitmap
stream costs ~52 B/bp D2H (scan_events_pallas docstring), so the link
must sustain that at >= the host pipeline's own e2e rate or the transfer
becomes the bottleneck and the host path is faster.

Derivation of the threshold (BASELINE.md "PCIe-host --backend tpu e2e
model", measured inputs): host e2e ~2.3 Mbp/s on a 4-core box ->
52 B/bp x 2.3 Mbp/s = 120 MB/s minimum useful link bandwidth.  We ship
LINK_THRESHOLD_MBPS = 250 (~2x margin: below that the D2H leg stops
hiding under the host consume even when it is not the strict
bottleneck).  Any real PCIe/ICI attachment (>= 8 GB/s) passes by 30x;
the ~1 MB/s axon development tunnel fails instantly, which is correct -
through that tunnel the TPU path measures ~100x slower than host.

Selection order for "auto":
  1. RIBBIT_BACKEND env override (host | tpu | auto), if set;
  2. no LOCAL accelerator device node (/dev/accel*, /dev/vfio) -> host
     WITHOUT importing jax: a locally-attached chip is a precondition
     for the link ever clearing the threshold, and this keeps the
     default host path free of jax/plugin initialization (remote-tunnel
     dev setups correctly land here — through a tunnel the TPU path
     always loses, and probing one costs seconds of session init per
     process, which round 6 measured hanging CLI test subprocesses);
  3. no jax / no TPU-class platform -> host;
  4. link probe >= threshold -> tpu, else host.

The probe is a one-time cost per process: a 128 KiB host->device->host
roundtrip (fast local links answer in ~1 ms), time-boxed by a daemon
thread so a wedged driver degrades to host instead of hanging.  The
decision is cached on first use.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Optional

LINK_THRESHOLD_MBPS = 250.0
_PROBE_BYTES = 128 << 10
_PROBE_TIMEOUT_S = 15.0

_cached: Optional[str] = None


def _local_accelerator_present() -> bool:
    """True when an accelerator device node is attached to THIS host."""
    import glob
    return bool(glob.glob("/dev/accel*") or glob.glob("/dev/vfio/*"))


def default_backend_or_none(timeout_s: float = 30.0):
    """jax.default_backend() on a daemon thread with a timeout, or None.

    Platform initialization can HANG (not raise) on a wedged remote
    tunnel; callers that merely want to know whether a chip is reachable
    must not inherit that hang (round 6: a wedged tunnel froze the
    device bench's backend guard)."""
    import queue as _queue
    import threading

    def work(q):
        try:
            import jax
            q.put(jax.default_backend())
        except Exception:
            q.put(None)

    q: _queue.Queue = _queue.Queue(maxsize=1)
    threading.Thread(target=work, args=(q,), daemon=True,
                     name="ribbit-backend-check").start()
    try:
        return q.get(timeout=timeout_s)
    except _queue.Empty:
        return None


def probe_link_mbps(nbytes: int = _PROBE_BYTES) -> float:
    """Measured host->device->host roundtrip bandwidth, MB/s.

    Returns the round-trip figure (bytes moved both ways / elapsed); the
    production stream is D2H-dominated but the probe only needs to
    separate ~1 MB/s tunnels from >=GB/s attachments, two decades away
    from the threshold on either side."""
    import jax
    import numpy as np

    host = np.zeros(nbytes, dtype=np.uint8)
    dev = jax.device_put(host)           # warm: allocator + any registration
    np.asarray(dev)
    t0 = time.perf_counter()
    dev = jax.device_put(host)
    back = np.asarray(dev)
    dt = time.perf_counter() - t0
    assert back.shape == host.shape
    return 2 * nbytes / 1e6 / max(dt, 1e-9)


def resolve_backend(requested: str = "auto", quiet: bool = False) -> str:
    """Resolve 'auto' to 'host' or 'tpu'; pass explicit choices through."""
    global _cached
    if requested != "auto":
        return requested
    env = os.environ.get("RIBBIT_BACKEND", "").strip().lower()
    if env in ("host", "tpu"):
        return env
    if _cached is not None:
        return _cached

    if not _local_accelerator_present():
        # host path stays free of jax/plugin init (and remote-tunnel dev
        # setups, where the TPU path always loses, land here instantly)
        choice, why = "host", "no local accelerator device"
    else:
        choice, why = _probe_choice()
    if not quiet:
        print(f"ribbit-tpu: backend auto -> {choice} ({why})",
              file=sys.stderr)
    _cached = choice
    return choice


def _probe_choice():
    """(choice, why) from the jax platform + time-boxed link probe."""
    import queue as _queue
    import threading

    def work(q):
        try:
            import jax
            if jax.default_backend() not in ("tpu", "axon"):
                q.put(("host", "no TPU-class jax backend"))
                return
            mbps = probe_link_mbps()
            if mbps >= LINK_THRESHOLD_MBPS:
                q.put(("tpu", f"link {mbps:,.0f} MB/s >= "
                       f"{LINK_THRESHOLD_MBPS:g} MB/s threshold"))
            else:
                q.put(("host", f"link {mbps:,.1f} MB/s < "
                       f"{LINK_THRESHOLD_MBPS:g} MB/s threshold (event "
                       "stream D2H would bottleneck)"))
        except Exception as exc:   # no jax / probe failure: host works
            q.put(("host", f"probe failed ({type(exc).__name__})"))

    q: _queue.Queue = _queue.Queue(maxsize=1)
    threading.Thread(target=work, args=(q,), daemon=True,
                     name="ribbit-backend-probe").start()
    try:
        return q.get(timeout=_PROBE_TIMEOUT_S)
    except _queue.Empty:
        return "host", f"probe timed out after {_PROBE_TIMEOUT_S:g}s"
