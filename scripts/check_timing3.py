"""Bisect the axon timing anomaly: which factor makes chained matmul
timing real vs ~0?"""
import time
import numpy as np
import jax
import jax.numpy as jnp

n = 8192
x = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.float32)

variants = {
    "sq": jax.jit(lambda a: a @ a),
    "sq_scaled": jax.jit(lambda a: (a @ a) * 1e-5),
    "two_ops": jax.jit(lambda a: a @ (a * 1e-3)),
}
for tag, f in variants.items():
    jax.block_until_ready(f(x))
    y = x
    t0 = time.perf_counter()
    for _ in range(5):
        y = f(y)
    jax.block_until_ready(y)
    print(tag, round((time.perf_counter() - t0) / 5 * 1e3, 3), "ms/call")
    # correctness spot check: result must be finite and change with input
    print("   val", float(jnp.mean(jnp.abs(y[:8, :8]))))
