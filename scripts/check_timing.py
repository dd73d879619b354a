"""Sanity-check the timing harness on the axon TPU backend: a known-cost
matmul timed with (a) same input every call, (b) fresh input every call,
(c) chained (output feeds input). If (a) is much cheaper than (c), the
backend memoizes identical dispatches and same-input timing is invalid.
"""
import time
import jax
import jax.numpy as jnp

n = 8192
x = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.float32)
f = jax.jit(lambda a: a @ a)
jax.block_until_ready(f(x))

# (a) same input
t0 = time.perf_counter()
for _ in range(10):
    out = f(x)
jax.block_until_ready(out)
print("same_input_ms", (time.perf_counter() - t0) / 10 * 1e3)

# (b) fresh inputs (pre-staged)
xs = [jax.device_put(x * (1 + i * 1e-6)) for i in range(10)]
jax.block_until_ready(xs)
t0 = time.perf_counter()
outs = [f(xi) for xi in xs]
jax.block_until_ready(outs)
print("fresh_input_ms", (time.perf_counter() - t0) / 10 * 1e3)

# (c) chained
y = x
t0 = time.perf_counter()
for _ in range(10):
    y = f(y * 1e-3)
jax.block_until_ready(y)
print("chained_ms", (time.perf_counter() - t0) / 10 * 1e3)
