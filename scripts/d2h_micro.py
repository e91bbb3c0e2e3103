import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
for dtype, mb in ((np.uint8, 1), (np.uint8, 8), (np.float32, 1), (np.float32, 8), (np.float32, 32)):
    n = int(mb*1e6 / np.dtype(dtype).itemsize)
    y = jax.device_put(np.ones(n, dtype)); y.block_until_ready()
    t0=time.perf_counter(); reps=3
    for _ in range(reps): np.asarray(y)
    dt=(time.perf_counter()-t0)/reps
    print(f"d2h {np.dtype(dtype).name:8s} {mb:5.1f}MB: {dt*1000:8.1f}ms  {mb/dt:8.1f} MB/s")
