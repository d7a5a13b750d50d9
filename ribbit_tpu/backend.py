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
  2. no jax / no TPU-class platform -> host;
  3. link probe >= threshold -> tpu, else host.

The probe is a one-time cost per process: a 128 KiB host->device->host
roundtrip (fast links answer in ~1 ms; the tunnel takes ~0.25 s).  The
decision is cached on first use.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Optional

LINK_THRESHOLD_MBPS = 250.0
_PROBE_BYTES = 128 << 10

_cached: Optional[str] = None


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

    choice, why = "host", "no TPU-class jax backend"
    try:
        import jax
        if jax.default_backend() in ("tpu", "axon"):
            mbps = probe_link_mbps()
            if mbps >= LINK_THRESHOLD_MBPS:
                choice = "tpu"
                why = (f"link {mbps:,.0f} MB/s >= {LINK_THRESHOLD_MBPS:g} "
                       "MB/s threshold")
            else:
                why = (f"link {mbps:,.1f} MB/s < {LINK_THRESHOLD_MBPS:g} "
                       "MB/s threshold (flagword D2H would bottleneck)")
    except Exception as exc:  # no jax / probe failure: host always works
        why = f"probe failed ({type(exc).__name__})"
    if not quiet:
        print(f"ribbit-tpu: backend auto -> {choice} ({why})",
              file=sys.stderr)
    _cached = choice
    return choice
