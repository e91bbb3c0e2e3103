"""Transport diagnostic for remote/tunneled TPU deployments.

Measures the device-link properties that shaped this framework's design (see
docs/SCALING.md "Transport pathologies"): h2d/d2h bandwidth by dtype and size,
small-program round-trip latency, and the in-flight-read stall. Run it on a
new environment BEFORE trusting throughput numbers.

Usage: python scripts/transport_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from hippomm_tpu.utils.device import fetch

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '')}")

    # ---- h2d bandwidth ------------------------------------------------------
    for mb in (0.1, 1, 8, 32, 128):
        x = np.ones(int(mb * 1e6), np.uint8)
        jax.device_put(x).block_until_ready()
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            jax.device_put(x).block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        print(f"h2d {mb:6.1f} MB: {dt * 1000:7.1f} ms  ({mb / dt:8.1f} MB/s)")

    # ---- d2h bandwidth by dtype (u8 is pathological on some transports) ----
    for dtype, mb in ((np.float32, 1), (np.float32, 8), (np.int32, 1), (np.uint8, 1)):
        n = int(mb * 1e6 / np.dtype(dtype).itemsize)
        y = jax.device_put(np.ones(n, dtype))
        fetch(y)  # safe read (widens u8, polls readiness)
        t0 = time.perf_counter()
        for _ in range(3):
            fetch(y)
        dt = (time.perf_counter() - t0) / 3
        print(f"d2h {np.dtype(dtype).name:8s} {mb:4.1f} MB via fetch: {dt * 1000:7.1f} ms")

    # ---- tiny-program round trip -------------------------------------------
    f = jax.jit(lambda a: a + 1)
    z = jax.device_put(np.ones((8, 8), np.float32))
    fetch(f(z))
    t0 = time.perf_counter()
    for _ in range(10):
        fetch(f(z))
    print(f"tiny program dispatch+read: {(time.perf_counter() - t0) / 10 * 1000:.1f} ms")

    # ---- in-flight read hazard ---------------------------------------------
    # A raw np.asarray on a result whose program may still be running has been
    # measured to stall 60-90 s (or wedge for minutes) on tunneled transports;
    # fetch() polls readiness first. Compare both on a freshly dispatched op.
    g = jax.jit(lambda a: jnp.tanh(a @ a).sum(axis=0).astype(jnp.int32))
    big = jax.device_put(np.random.randn(2048, 2048).astype(np.float32))
    fetch(g(big))
    r = g(big)
    t0 = time.perf_counter()
    fetch(r)
    print(f"in-flight read via fetch(): {(time.perf_counter() - t0) * 1000:.1f} ms "
          f"(raw np.asarray of an in-flight result may stall for minutes — do not)")


if __name__ == "__main__":
    main()
