import sys, os, time, tempfile
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
# pure: does d2h of tiny bool arrays stall?
f = jax.jit(lambda x: (x > 0))
g32 = jax.jit(lambda x: (x > 0).astype(jnp.int32))
x = jax.device_put(np.random.randn(256).astype(np.float32))
for name, fn in (("bool", f), ("int32", g32)):
    fn(x).block_until_ready()
    t0=time.perf_counter()
    for _ in range(10): np.asarray(fn(x))
    print(f"{name} mask d2h x10: {(time.perf_counter()-t0)*1000:.1f}ms")
