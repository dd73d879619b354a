"""Split the fixed solve-tick cost: Pallas kernel (DMA+mask+K+GJ+unscale)
vs XLA prep (condensation + Hessian build). Scan-chained, chip time."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
import jax.numpy as jnp
import numpy as np
from rl_mpc_locomotion_tpu.ops.qp import production_qp_config, init_qp_state, solve_qp
from rl_mpc_locomotion_tpu.ops import srb_dynamics as srb

B, H, n = 4096, 10, 120
key = jax.random.PRNGKey(0)
G = jax.random.normal(key, (B, n, n), jnp.float32) * 0.1
P = jnp.einsum('bij,bkj->bik', G, G) + 10.0 * jnp.eye(n)
q = jax.random.normal(jax.random.PRNGKey(1), (B, n), jnp.float32)
cb = jnp.tile(srb.friction_cone_block(0.4)[None, None], (B, H * 4, 1, 1))
lb = jnp.tile(jnp.array([0., 0., 0., 0., 0.], jnp.float32), (B, H * 4)).reshape(B, -1)
ub = jnp.tile(jnp.array([1e8, 1e8, 1e8, 1e8, 500.], jnp.float32), (B, H * 4)).reshape(B, -1)
state0 = jax.vmap(lambda _: init_qp_state(n, H * 4 * 5))(jnp.arange(B))

def make(cfg):
    @jax.jit
    def run(qv, st):
        def step(carry, _):
            qv, st = carry
            x, st2, diag = jax.vmap(lambda p, qq, c, l, u, s: solve_qp(p, qq, c, l, u, s, cfg))(P, qv, cb, lb, ub, st)
            return (qv + 1e-6 * x, st2), x[0, 0]
        (qv, st), probe = jax.lax.scan(step, (qv, st), None, length=8)
        return qv, st, probe
    return run

def measure(cfg, reps=5):
    """Chained across reps too: the axon relay memoizes byte-identical
    dispatches, so inputs must differ every call."""
    run = make(cfg)
    qv, st, probe = run(q, state0); jax.block_until_ready(probe)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        qv, st, probe = run(qv, st)
        jax.block_until_ready(probe)
        best = min(best, (time.perf_counter() - t0) / 8 * 1000.0)
    return best

prod = production_qp_config()
out = {}
out["kernel_full"] = measure(prod)                      # ruiz3 + 50 iters
out["kernel_i1r0"] = measure(prod._replace(iters=1, ruiz_iters=0))  # fixed: DMA+mask+K+GJ+unscale
out["kernel_i1r3"] = measure(prod._replace(iters=1))
print(json.dumps({k: round(v, 3) for k, v in out.items()}))
