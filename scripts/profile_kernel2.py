import os, time, json
import jax
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
import jax.numpy as jnp
from rl_mpc_locomotion_tpu.ops.pallas.admm_kernel import solve_scaled_batch, N, M, NB

B = 4096
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
a = jax.random.normal(ks[0], (B, N, N)) * 0.1
k_mat = jnp.einsum('bij,bkj->bik', a, a) + 5.0 * jnp.eye(N)
c = jax.random.normal(ks[2], (B, NB, 5, 3))
l = -jnp.abs(jax.random.normal(ks[3], (B, M))) - 1.0
u = jnp.abs(jax.random.normal(ks[4], (B, M))) + 1.0
rho = jnp.full((B, M), 0.1)
x = jnp.zeros((B, N)); z = jnp.zeros((B, M)); y = jnp.zeros((B, M))
qs = [jax.random.normal(jax.random.PRNGKey(100+i), (B, N)) for i in range(10)]

def run(iters, n=10):
    f = jax.jit(lambda *a: solve_scaled_batch(*a, iters=iters, sigma=1e-6, relax=1.6))
    o = f(k_mat, qs[0], c, l, u, rho, x, z, y); jax.block_until_ready(o)
    t0 = time.perf_counter()
    outs = [f(k_mat, qs[i], c, l, u, rho, x, z, y)[0] for i in range(n)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n * 1000.0

t50 = run(50); t10 = run(10)
per = (t50 - t10) / 40
print(json.dumps({"k50_ms": round(t50,2), "k10_ms": round(t10,2),
                  "per_iter_ms": round(per,3),
                  "base_dma_factor_transpose_ms": round(t10 - 10*per, 2)}))
