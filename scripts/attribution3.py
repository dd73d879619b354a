"""Batched (4096,120,120) SPD inverse: VPU Pallas GJ vs XLA options.
Scan-chained chip time."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
import jax.numpy as jnp

B, n = 4096, 120
key = jax.random.PRNGKey(0)
G = jax.random.normal(key, (B, n, n), jnp.float32) * 0.1
K = jnp.einsum('bij,bkj->bik', G, G) + 10.0 * jnp.eye(n)

def chain(fn, reps=5, L=8):
    """Chained across scan steps AND across reps: the axon relay memoizes
    byte-identical dispatches, so the carry must differ every call."""
    @jax.jit
    def run(K):
        def step(K, _):
            Kinv = fn(K)
            # feed back so the chain is serialized; keep SPD-ish
            return K + 1e-8 * Kinv, Kinv[0, 0, 0]
        return jax.lax.scan(step, K, None, length=L)
    Kc, p = run(K); jax.block_until_ready(p)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        Kc, p = run(Kc)
        jax.block_until_ready(p)
        best = min(best, (time.perf_counter() - t0) / L * 1000.0)
    return best

with jax.default_matmul_precision("float32"):
    out = {}
    out["linalg_inv"] = chain(jnp.linalg.inv)
    out["cholesky_only"] = chain(lambda K: jnp.linalg.cholesky(K) + 0.0)
    def cho_inv(K):
        L = jnp.linalg.cholesky(K)
        eye = jnp.broadcast_to(jnp.eye(n, dtype=K.dtype), K.shape)
        Linv = jax.lax.linalg.triangular_solve(L, eye, left_side=True, lower=True)
        return jnp.einsum('bki,bkj->bij', Linv, Linv)
    out["chol_triinv"] = chain(cho_inv)

    def blocked_gj(K, bs=24):
        """Right-looking blocked Gauss-Jordan inverse, batched matmuls."""
        A = K
        Inv = jnp.broadcast_to(jnp.eye(n, dtype=K.dtype), K.shape)
        # augmented [A | Inv]; eliminate block columns
        M = jnp.concatenate([A, Inv], axis=2)  # (B,n,2n)
        for k0 in range(0, n, bs):
            piv = M[:, k0:k0+bs, :]                      # (B,bs,2n)
            d = M[:, k0:k0+bs, k0:k0+bs]                 # (B,bs,bs)
            dinv = jnp.linalg.inv(d)
            piv = jnp.einsum('bij,bjk->bik', dinv, piv)  # normalized pivot rows
            rest = M - jnp.einsum('bik,bkj->bij', M[:, :, k0:k0+bs], piv)
            # restore pivot rows
            M = jnp.concatenate([rest[:, :k0], piv, rest[:, k0+bs:]], axis=1)
        return M[:, :, n:]
    out["blocked_gj24"] = chain(blocked_gj)
    out["blocked_gj40"] = chain(lambda K: blocked_gj(K, bs=40))
print(json.dumps({k: round(v, 3) for k, v in out.items()}))
