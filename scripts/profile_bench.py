"""Break down the MPC period cost: no-solve tick vs solve tick vs QP phases."""
import os, time, json
import jax
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
import jax.numpy as jnp
from rl_mpc_locomotion_tpu.control import runner
from rl_mpc_locomotion_tpu.control.types import ControlConfig
from rl_mpc_locomotion_tpu.models import robots
from rl_mpc_locomotion_tpu.ops.qp import QPConfig, production_qp_config

BATCH = 4096

def setup(qp_cfg):
    params = robots.aliengo_params()
    cfg = ControlConfig(qp=qp_cfg)
    state = jax.vmap(lambda _: runner.init_state(params, cfg))(jnp.arange(BATCH))
    dof_q = jnp.tile(jnp.array([0.0, 0.8, -1.6], jnp.float32), (BATCH, 4)).reshape(BATCH, 12)
    dof_qd = jnp.zeros((BATCH, 12), jnp.float32)
    body = jnp.tile(jnp.array([0, 0, 0.35, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0], jnp.float32), (BATCH, 1))
    commands = jnp.tile(jnp.array([0.5, 0.0, 0.0], jnp.float32), (BATCH, 1))
    return params, cfg, state, (dof_q, dof_qd, body, commands)

def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0

def tick_time(qp_cfg, gate):
    params, cfg, state, io = setup(qp_cfg)
    @jax.jit
    def tick(state):
        s, tau, _ = jax.vmap(lambda s, q, qd, b, c: runner.min_step(
            params, cfg, s, q, qd, b, c, solve_gate=jnp.bool_(gate)))(state, *io)
        return s, tau
    return timeit(tick, state)

prod = production_qp_config()
res = {}
res["tick_nosolve_ms"] = tick_time(prod, False); print("nosolve", res, flush=True)
res["tick_solve_ms"] = tick_time(prod, True); print("solve", res, flush=True)
# single-ADMM-iteration tick: isolates QP prep (Ruiz/condense/K) + kernel overhead
res["tick_solve_iter1_ms"] = tick_time(prod._replace(iters=1), True); print("iter1", res, flush=True)
# xla path skipped: too slow to compile
# ruiz0 skipped
print(json.dumps({k: round(v, 2) for k, v in res.items()}))
