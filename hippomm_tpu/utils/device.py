"""Safe device→host materialization.

Two measured pathologies of the tunneled TPU transport (axon) make the naive
`np.asarray(device_array)` hazardous:

  1. A blocking read issued while the producing program is still in flight can
     stall ~60-90 s (transport timeout + retry) — `block_until_ready()` first,
     then reading, takes milliseconds for the same array.
  2. uint8/bool buffers read back pathologically (~8 s for sub-4MB fetches
     even when ready); int32/float32 reads of the same data are fast.

`fetch()` is the one correct way to bring a device array to host: wait for
readiness by POLLING `is_ready()` (block_until_ready itself has been observed
to return early right after a fresh compile, after which the read stalls),
widen u8/bool to int32 on device, read, cast back. On non-tunneled backends
(CPU tests, direct-attached TPU) it degrades to a plain asarray.
"""

from __future__ import annotations

import time

import numpy as np

_WIDEN = None  # lazily-built jitted u8/bool -> int32 cast


def _wait_ready(x, timeout_s: float = 120.0) -> None:
    if hasattr(x, "is_ready"):
        deadline = time.monotonic() + timeout_s
        sleep = 0.0005
        while not x.is_ready():
            if time.monotonic() > deadline:
                break
            time.sleep(sleep)
            sleep = min(sleep * 1.5, 0.01)
        return
    if hasattr(x, "block_until_ready"):
        x.block_until_ready()


def fetch(x, dtype=None) -> np.ndarray:
    """Materialize a (possibly in-flight) jax array as numpy, safely."""
    global _WIDEN
    if isinstance(x, np.ndarray):
        return x if dtype is None else np.asarray(x, dtype)
    orig_dtype = getattr(x, "dtype", None)
    narrow = orig_dtype is not None and orig_dtype.itemsize == 1  # bool / [u]int8
    if narrow:
        if _WIDEN is None:
            import jax
            import jax.numpy as jnp

            _WIDEN = jax.jit(lambda a: a.astype(jnp.int32))
        x = _WIDEN(x)
    _wait_ready(x)
    out = np.asarray(x)
    if narrow:
        out = out.astype(dtype if dtype is not None else orig_dtype)
    elif dtype is not None:
        out = np.asarray(out, dtype)
    return out
