"""Backend availability probe for host-side drivers (eval/bench/CLI).

The container's sitecustomize pins JAX_PLATFORMS to the single-chip TPU
tunnel; when the tunnel is down the first device op HANGS for minutes
(observed: init hangs >10 min — not a fast failure).  jax also caches a
failed backend for the life of the process, so the probe must run in a
subprocess with a hard timeout, BEFORE any in-process device op.
"""
from __future__ import annotations

import subprocess
import sys

import jax


def ensure_backend(probe_timeout_s: float = 120.0, announce=print) -> str:
    """If the pinned platform is the TPU tunnel, probe it in a subprocess;
    on failure/hang fall back to cpu.  Returns the platform string in
    effect.  No-op when the platform is already cpu (tests) or a backend is
    live in-process."""
    plats = jax.config.jax_platforms or ""
    if "axon" not in plats:
        return plats or "default"
    from jax._src import xla_bridge as _xb

    if _xb.backends_are_initialized():
        return plats
    code = "import jax; jax.devices()[0]"
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, timeout=probe_timeout_s)
        ok = r.returncode == 0
    except subprocess.TimeoutExpired:
        ok = False
    if not ok:
        announce("[backend] TPU tunnel unavailable; falling back to cpu")
        jax.config.update("jax_platforms", "cpu")
        return "cpu"
    return plats
