"""Is block_until_ready real on axon? Compare against np.asarray (host
fetch, necessarily synchronous) on a known-cost matmul chain."""
import time
import numpy as np
import jax
import jax.numpy as jnp

n = 8192
x = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.float32)
f = jax.jit(lambda a: (a @ a) * 1e-5)
np.asarray(f(x)[:1, :1])  # compile + settle

for tag, sync in (("block", lambda v: jax.block_until_ready(v)),
                  ("fetch1", lambda v: np.asarray(v[:1, :1])),
                  ("fetch_scalar", lambda v: float(jnp.sum(v)))):
    y = x
    t0 = time.perf_counter()
    for _ in range(5):
        y = f(y)
    sync(y)
    dt = (time.perf_counter() - t0) / 5 * 1e3
    print(tag, round(dt, 3), "ms/matmul")
