"""Dead-TPU-tunnel guard.

The axon TPU plugin registers itself at interpreter start (via a
sitecustomize on PYTHONPATH) and pins ``jax_platforms`` to the tunnel
backend.  When the tunnel is down, the FIRST backend initialization
(``jax.devices()``, any jit) blocks forever — even with
``JAX_PLATFORMS=cpu`` in the environment, because the plugin's config
update wins over the env var.  That turns every entry point (bench.py,
__graft_entry__, the CLI) into a hang instead of a clean CPU fallback.

``ensure_live_backend()`` probes the backend in a *subprocess* with a
timeout (so a dead tunnel cannot hang the caller), and on failure
removes the axon backend factory and re-points ``jax_platforms`` at the
CPU, all before this process initializes any backend.  Probe results
are cached on disk for a few minutes so repeated CLI invocations don't
each pay a probe.

Reference analogue: hardware/detecthardware.cpp gmx_detect_hardware —
the reference also decides CPU-vs-GPU duty up front and never lets a
broken device wedge the run (taskassignment/decidegpuusage.cpp).
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

_CACHE = "/tmp/tpumd_backend_probe"
_CACHE_TTL = 600.0          # seconds a probe verdict stays valid
_PROBE_TIMEOUT = 150.0      # generous: live-tunnel init takes 10-40 s


def _cached_verdict():
    try:
        with open(_CACHE) as f:
            stamp, verdict = f.read().split()
        if time.time() - float(stamp) < _CACHE_TTL:
            return verdict
    except (OSError, ValueError):
        pass
    return None


def _store_verdict(verdict: str) -> None:
    try:
        tmp = f"{_CACHE}.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(f"{time.time()} {verdict}")
        os.replace(tmp, _CACHE)
    except OSError:
        pass


def probe_backend(timeout: float = _PROBE_TIMEOUT) -> bool:
    """True iff ``jax.devices()`` completes in a fresh subprocess of the
    CURRENT environment within ``timeout`` seconds."""
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout, check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        return True
    except (subprocess.SubprocessError, OSError):
        return False


def ensure_live_backend(probe_timeout: float = _PROBE_TIMEOUT,
                        verbose: bool = True):
    """Call before the first jax backend use in any entry point.

    Returns the backend that will serve this process: "cpu" if we had
    to scrub a dead TPU plugin, otherwise None (environment untouched —
    either no TPU plugin is present or the tunnel answered the probe).
    No-op when backends are already initialized (too late to change).
    """
    import jax
    from jax._src import xla_bridge

    if getattr(xla_bridge, "_backends", None):
        return None                       # already initialized
    factories = getattr(xla_bridge, "_backend_factories", {})
    if os.environ.get("TPUMD_FORCE_CPU") == "1":
        # explicit CPU pin (bench.py's watchdog parent sets this after a
        # mid-run tunnel wedge: the probe cache may still say "live")
        factories.pop("axon", None)
        jax.config.update("jax_platforms", "cpu")
        return "cpu"
    if "axon" not in factories:
        return None                       # plain env (tests, CPU boxes)

    verdict = _cached_verdict()
    if verdict is None:
        verdict = "live" if probe_backend(probe_timeout) else "dead"
        _store_verdict(verdict)
    if verdict == "live":
        return None

    factories.pop("axon", None)
    jax.config.update("jax_platforms", "cpu")
    if verbose:
        print("tpumd: TPU tunnel unreachable — falling back to CPU",
              file=sys.stderr)
    return "cpu"
