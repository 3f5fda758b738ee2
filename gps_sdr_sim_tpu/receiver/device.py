"""Backend capability probe for the receiver's complex-valued math.

Acquisition and tracking use complex64 (FFT correlation, carrier wipe).
Standard TPU XLA decomposes complex arithmetic; some experimental PJRT
backends (e.g. the tunneled single-chip 'axon' platform) reject complex
dtypes outright. The receiver is the framework's validation path, not its
throughput path, so when the default backend can't do complex we pin the
receiver's programs to the host CPU backend instead of failing.
"""

from __future__ import annotations

import contextlib
from functools import lru_cache


@lru_cache(maxsize=None)
def _complex_supported() -> bool:
    import jax

    if jax.default_backend() == "cpu":
        return True
    # Probe in a SUBPROCESS: on backends that reject complex (e.g. the
    # tunneled 'axon' plugin) a failed complex transfer poisons the live
    # client — every subsequent transfer errors — so the probe must not
    # run in this process. Complex compiles succeed even where execution
    # fails, so a compile-only probe can't detect this either.
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import numpy, jax.numpy as jnp; "
             "numpy.asarray(jnp.zeros((2,), jnp.complex64) + 1j)"],
            capture_output=True, timeout=300)
    except subprocess.TimeoutExpired:
        return False  # device stalled: the complex-free paths always work
    if r.returncode == 0:
        return True
    # Any failure falls back to the complex-free MXU/real paths, which are
    # correct everywhere; but only an Unimplemented error actually means
    # "no complex support" — exclusive-access devices (the child can't
    # grab the chip the parent holds) or transient errors land here too,
    # so say why.
    if b"nimplemented" not in r.stderr:
        print("note: complex-support probe failed for a reason other than "
              "Unimplemented; using the complex-free receiver paths.",
              file=sys.stderr)
    return False


def rx_device():
    """Context manager placing receiver programs on a complex-capable device."""
    import jax

    if _complex_supported():
        return contextlib.nullcontext()
    return jax.default_device(jax.local_devices(backend="cpu")[0])
