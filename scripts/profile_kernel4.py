import os, time, json
import jax
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
import jax.numpy as jnp
from rl_mpc_locomotion_tpu.ops.pallas.admm_kernel import solve_scaled_batch, N, M, NB

B = 4096
ks = jax.random.split(jax.random.PRNGKey(0), 8)
a = jax.random.normal(ks[0], (B, N, N)) * 0.1
k_mat = jnp.einsum('bij,bkj->bik', a, a) + 5.0 * jnp.eye(N)

# (a) transpose cost alone, chained
f_t = jax.jit(lambda k, s: (jnp.moveaxis(k + s, 0, -1).sum(axis=(0, 1)), ))
s = jnp.zeros((B, 1, 1))
o, = f_t(k_mat, s); float(o.sum())
import time as _t
t0 = _t.perf_counter()
for i in range(10):
    o, = f_t(k_mat, o.reshape(B, 1, 1) * 1e-20)
tr = ( _t.perf_counter() - t0) / 10 * 1000 if float(o.sum()) == float(o.sum()) else -1

# (b) kernel with iters=0: transpose+DMA+GJ only
f0 = jax.jit(lambda x, z, y: solve_scaled_batch(
    k_mat, x * 0 + 1.0, jnp.ones((B, NB, 5, 3)), -jnp.ones((B, M)) * 9,
    jnp.ones((B, M)) * 9, jnp.full((B, M), 0.1), x, z, y,
    iters=0, sigma=1e-6, relax=1.6))
x = jnp.zeros((B, N)); z = jnp.zeros((B, M)); y = jnp.zeros((B, M))
x, z, y = f0(x, z, y); float(x.sum())
t0 = _t.perf_counter()
for _ in range(10):
    x, z, y = f0(x, z, y)
float(x.sum())
t_i0 = (_t.perf_counter() - t0) / 10 * 1000
print(json.dumps({"transpose_ms": round(tr,2), "kernel_iter0_ms": round(t_i0,2)}))
