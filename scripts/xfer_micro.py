import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
dev = jax.devices()[0]; print("dev:", dev.platform, getattr(dev, "device_kind", ""))
for mb in (0.1, 1, 8, 32, 128):
    x = np.ones(int(mb*1e6), np.uint8)
    jax.device_put(x).block_until_ready()  # warm
    t0=time.perf_counter(); n=5
    for _ in range(n): jax.device_put(x).block_until_ready()
    dt=(time.perf_counter()-t0)/n
    print(f"h2d {mb:6.1f}MB: {dt*1000:7.1f}ms  {mb/dt:8.1f} MB/s")
# d2h
y = jax.device_put(np.ones(int(32e6), np.uint8)); y.block_until_ready()
t0=time.perf_counter()
for _ in range(5): np.asarray(y)
print(f"d2h 32MB: {(time.perf_counter()-t0)/5*1000:.1f}ms")
# dispatch latency of a tiny jitted program
f = jax.jit(lambda a: a + 1)
z = jax.device_put(np.ones((8,8), np.float32)); f(z).block_until_ready()
t0=time.perf_counter()
for _ in range(20): f(z).block_until_ready()
print(f"tiny program roundtrip: {(time.perf_counter()-t0)/20*1000:.1f}ms")
