"""Scan-chained cost attribution for the MPC period at batch 4096.

Each variant is ONE jitted executable running K periods via lax.scan, so
numbers are chip time (no tunnel dispatch).  Variants:
  both_gated   gate=False on both ticks    -> 2x no-solve tick
  prod         normal period               -> no-solve + solve tick
  iters(n)     production with n ADMM iterations
"""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
import jax.numpy as jnp
from rl_mpc_locomotion_tpu.control import runner
from rl_mpc_locomotion_tpu.control.types import ControlConfig
from rl_mpc_locomotion_tpu.models import robots
from rl_mpc_locomotion_tpu.ops.qp import production_qp_config

B = 4096
K = 10
params = robots.aliengo_params()

def make(cfg, gates):
    state0 = jax.vmap(lambda _: runner.init_state(params, cfg))(jnp.arange(B))
    dof_q = jnp.tile(jnp.array([0.0, 0.8, -1.6], jnp.float32), (B, 4)).reshape(B, 12)
    dof_qd = jnp.zeros((B, 12), jnp.float32)
    body = jnp.tile(jnp.array([0, 0, 0.35, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0], jnp.float32), (B, 1))
    commands = jnp.tile(jnp.array([0.5, 0.0, 0.0], jnp.float32), (B, 1))
    def tick(state, gate):
        new_state, tau, _ = jax.vmap(
            lambda s, q, qd, b, c: runner.min_step(params, cfg, s, q, qd, b, c, solve_gate=gate))(
            state, dof_q, dof_qd, body, commands)
        return new_state, tau
    @jax.jit
    def run(state):
        def period(state, _):
            state, _ = tick(state, jnp.bool_(gates[0]))
            state, tau = tick(state, jnp.bool_(gates[1]))
            return state, tau[0, 0]
        return jax.lax.scan(period, state, None, length=K)
    return state0, run

def measure(cfg, gates, reps=6):
    state, run = make(cfg, gates)
    state, probe = run(state); jax.block_until_ready(probe)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        state, probe = run(state)
        jax.block_until_ready(probe)
        best = min(best, (time.perf_counter() - t0) / K * 1000.0)
    return best

prod = production_qp_config()
out = {}
out["no_solve_x2"] = measure(ControlConfig(qp=prod), (False, False))
out["prod"] = measure(ControlConfig(qp=prod), (False, True))
for n in (1, 10, 25, 50):
    out[f"iters{n}"] = measure(ControlConfig(qp=prod._replace(iters=n)), (False, True))
out["ruiz0"] = measure(ControlConfig(qp=prod._replace(ruiz_iters=0)), (False, True))
out["ruiz1"] = measure(ControlConfig(qp=prod._replace(ruiz_iters=1)), (False, True))
print(json.dumps({k: round(v, 3) for k, v in out.items()}))
