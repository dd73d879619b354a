"""ADMM iteration-budget sweep on the hardest-robot battery -> JSON.

VERDICT r4 #6: A1's campaign telemetry showed 2.6% of solves hitting the
divergence fallback at the r4 40-iteration budget; the r5 receding-horizon
warm-start shift cut the budget to 24 but rough-terrain full-magnitude
commands still produce ~1% fallback rates. This script measures the
divergence fraction and residual tails as a function of the iteration
budget on a fixed hard battery (A1 by default, rough terrain, DR on, the
trained weight policy driving, full command distribution), so the
production budget is chosen from closed-loop evidence instead of flat-trot
sweeps (ops/qp.py production_qp_config docstring).

Reference calibration: mpc_osqp.cc:710 adapts rho per solve; this repo
defers the rho rescale to the next solve (one factorization per solve) and
buys robustness with iterations instead.

Usage:
  python scripts/qp_budget_sweep.py [--robot a1] [--iters 24,28,32]
                                    [--envs 64] [--steps 1000]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

_CACHE = os.path.join(ROOT, ".jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np


def measure(robot: str, qp_iters: int, num_envs: int, num_steps: int,
            ckpt: str | None) -> dict:
    from rl_mpc_locomotion_tpu.control.types import ControlConfig
    from rl_mpc_locomotion_tpu.control.weight_policy import WeightPolicy
    from rl_mpc_locomotion_tpu.models import robots
    from rl_mpc_locomotion_tpu.ops.qp import production_qp_config
    from rl_mpc_locomotion_tpu.sim import env as env_mod, terrain
    from rl_mpc_locomotion_tpu.sim.env import EnvConfig
    from rl_mpc_locomotion_tpu.sim.randomize import DomainRandomization

    params = {"aliengo": robots.aliengo_params, "go1": robots.go1_params,
              "a1": robots.a1_params}[robot]()
    qp = production_qp_config()._replace(
        iters=qp_iters, use_pallas=jax.default_backend() == "tpu")
    kw = {"base_init_height": 0.3} if robot in ("a1", "go1") else {}
    cfg = EnvConfig(control=ControlConfig(qp=qp, flat_ground=False),
                    dr=DomainRandomization(), **kw)
    ter = terrain.random_uniform()
    policy = WeightPolicy(checkpoint=ckpt) if ckpt else None
    ipm = cfg.control.iterations_between_mpc

    @jax.jit
    def run(seed):
        keys = jax.random.split(jax.random.PRNGKey(seed), num_envs)
        state = jax.vmap(lambda k: env_mod.reset(params, cfg, k))(keys)
        obs = jax.vmap(lambda s: env_mod.observations(params, cfg, s))(state)

        def body(carry, t):
            state, obs = carry
            gate = ((t + 1) % ipm) == 0
            if policy is not None:
                mean, _, _ = policy.model.apply(policy.params, obs)
            else:
                mean = jnp.zeros((num_envs, env_mod.NUM_ACTIONS), jnp.float32)
            state, obs, _, _, info = jax.vmap(
                lambda s, a: env_mod.step(params, cfg, ter, s, a,
                                          solve_gate=gate))(state, mean)
            return (state, obs), (gate, info["qp_diverged"],
                                  info["qp_pri_res"], info["qp_dua_res"])

        (_, _), (gates, div, pri, dua) = jax.lax.scan(
            body, (state, obs), jnp.arange(num_steps))
        nsolve = jnp.maximum(jnp.sum(gates), 1) * num_envs
        solve_mask = gates[:, None]
        # residual tail over solve ticks only
        p_flat = jnp.where(solve_mask, pri, -jnp.inf).reshape(-1)
        d_flat = jnp.where(solve_mask, dua, -jnp.inf).reshape(-1)

        def pctl(v, p):
            v = jnp.sort(v)
            idx = jnp.clip(((1.0 - p) * nsolve).astype(jnp.int32),
                           0, v.shape[0] - 1)
            return v[v.shape[0] - 1 - idx]

        return {
            "diverged_frac": jnp.sum(jnp.where(solve_mask, div, 0)) / nsolve,
            "pri_p99": pctl(p_flat, 0.99),
            "dua_p99": pctl(d_flat, 0.99),
        }

    t0 = time.time()
    out = {k: float(v) for k, v in run(jnp.int32(0)).items()}
    out.update(robot=robot, qp_iters=qp_iters, num_envs=num_envs,
               num_steps=num_steps, wall_s=round(time.time() - t0, 1),
               policy="trained" if ckpt else "default")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--robot", default="a1")
    ap.add_argument("--iters", default="24,28,32")
    ap.add_argument("--envs", type=int, default=64)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--ckpt", default=os.path.join(
        ROOT, "artifacts", "a1_weight_policy_rough"))
    args = ap.parse_args()
    rows = []
    for it in (int(x) for x in args.iters.split(",")):
        row = measure(args.robot, it, args.envs, args.steps,
                      args.ckpt if os.path.isdir(args.ckpt) else None)
        print(json.dumps(row), flush=True)
        rows.append(row)
    path = os.path.join(ROOT, "artifacts", f"{args.robot}_qp_budget.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump({"rows": rows}, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
