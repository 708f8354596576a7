"""Fast TPU-reachability probe for the TPU-gated subprocess tests.

The suite's conftest forces the CPU backend, so TPU tests spawn children
without the override.  When the axon tunnel is WEDGED (a known failure
mode that self-recovers in minutes, see the verify skill notes),
``jax.devices()`` blocks forever in the child — without a cheap probe,
each gated test burns its full compile-sized timeout (up to 50 minutes)
just to discover the environment is down.  This probe asks a tiny child
for the device list with a short deadline and caches the verdict for the
whole pytest process.
"""

import subprocess
import sys

_PROBE = (
    "import jax, json; "
    "print(json.dumps([d.platform for d in jax.devices()]))"
)
_cached: bool | None = None


def tpu_reachable(timeout: float = 60.0) -> bool:
    """True when a child process (without the suite's CPU override) can
    enumerate a tpu/axon device within ``timeout`` seconds."""
    global _cached
    if _cached is not None:
        return _cached
    import json
    import os

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE],
            capture_output=True, text=True, timeout=timeout, env=env,
        )
        lines = [l for l in proc.stdout.strip().splitlines()
                 if l.startswith("[")]
        platforms = json.loads(lines[-1]) if lines else []
        _cached = proc.returncode == 0 and any(
            p in ("tpu", "axon") for p in platforms)
    except (subprocess.TimeoutExpired, Exception):
        _cached = False
    return _cached
