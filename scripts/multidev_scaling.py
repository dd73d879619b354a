"""Weak-scaling measurement of the sharded PPO train step -> MULTIDEV.json.

The reference never measures multi-GPU scaling (its multi_gpu flag is
declared and never consumed, cfg/config.yaml:39-40); BASELINE.md's
"near-linear multi-host scaling" north star therefore needs a measured
bound from this repo's side. Real multi-chip hardware is not available in
this environment, so this runs the FULL sharded train step (shard_map over
a 1-D env mesh: MPC-in-the-loop rollout + pmean gradient/KL reduction,
rl/train.py:155-167) on a virtual CPU device mesh at n = 1, 2, 4, 8 with a
FIXED per-device env count and records time per PPO iteration.

What the curve bounds: the framework + collective overhead of the sharded
step — everything except real ICI latency. Virtual CPU devices share one
host's cores, so compute time itself is NOT expected to stay flat as n
grows (the host oversubscribes); to separate the two effects each row also
records the single-device time for the SAME GLOBAL batch, and reports
  overhead_pct = (t_sharded - t_single_global) / t_single_global
i.e. what sharding the identical computation over n virtual devices costs
on top of running it unsharded. On real hardware the compute term scales
with devices and only this overhead term remains.

Each device count runs in a fresh subprocess (the XLA host-device count is
fixed at backend init). Usage:
  python scripts/multidev_scaling.py            # all n -> MULTIDEV.json
  python scripts/multidev_scaling.py --worker N # one row, prints JSON
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ENVS_PER_DEVICE = 16        # sized for the 2-core CI box (wall time); the
                            # overhead ratio, not absolute time, is the result
ROLLOUT_STEPS = 24          # the production rsl_rl schedule
WARMUP_ITERS = 1
TIMED_ITERS = 5


def _worker(n_devices: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={n_devices}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, ROOT)
    from rl_mpc_locomotion_tpu.control.types import ControlConfig
    from rl_mpc_locomotion_tpu.models import robots
    from rl_mpc_locomotion_tpu.models.actor_critic import ActorCritic
    from rl_mpc_locomotion_tpu.ops.qp import QPConfig
    from rl_mpc_locomotion_tpu.parallel.mesh import ENV_AXIS
    from rl_mpc_locomotion_tpu.rl import ppo
    from rl_mpc_locomotion_tpu.rl import train as train_mod
    from rl_mpc_locomotion_tpu.sim import env as env_mod, terrain

    assert len(jax.devices()) >= n_devices, (len(jax.devices()), n_devices)

    # moderate QP budget: heavy enough that the step is dominated by real
    # MPC work (as in production), light enough for CPU wall time
    qp = QPConfig(iters=10, iters2=0, adaptive_rho=False, polish=False,
                  ruiz_iters=1)
    cfg = train_mod.TrainConfig(
        num_envs=ENVS_PER_DEVICE * n_devices,
        ppo=ppo.PPOConfig(num_steps=ROLLOUT_STEPS),
        env=env_mod.EnvConfig(control=ControlConfig(qp=qp)))
    params = robots.aliengo_params()
    ter = terrain.flat(extent=10.0, cell=0.5)
    model = ActorCritic(num_actions=env_mod.NUM_ACTIONS)
    train_state = ppo.init_train_state(jax.random.PRNGKey(1), model,
                                       env_mod.NUM_OBS, cfg.ppo)

    def timed(mesh):
        step_fn, reset_batch = train_mod.make_train_step(
            params, cfg, ter, model, mesh)
        env_state, obs = reset_batch(jax.random.PRNGKey(2))
        if mesh is not None:
            shard = NamedSharding(mesh, P(ENV_AXIS))
            env_state = jax.tree.map(lambda x: jax.device_put(x, shard),
                                     env_state)
            obs = jax.device_put(obs, shard)
        ts, es, ob, tick = train_state, env_state, obs, jnp.int32(0)
        for _ in range(WARMUP_ITERS):
            ts, es, ob, tick, metrics = step_fn(ts, es, ob, tick)
        jax.block_until_ready(metrics)
        samples = []
        for _ in range(TIMED_ITERS):
            t0 = time.perf_counter()
            ts, es, ob, tick, metrics = step_fn(ts, es, ob, tick)
            jax.block_until_ready(metrics)
            samples.append(time.perf_counter() - t0)
        return float(np.median(samples))

    mesh = Mesh(np.array(jax.devices()[:n_devices]).reshape(-1), (ENV_AXIS,))
    t_sharded = timed(mesh)
    # same global batch, unsharded on one device: isolates sharding overhead
    t_single = timed(None)

    row = {
        "n_devices": n_devices,
        "envs_per_device": ENVS_PER_DEVICE,
        "global_envs": cfg.num_envs,
        "rollout_steps": ROLLOUT_STEPS,
        "sharded_iter_ms": round(t_sharded * 1e3, 1),
        "single_device_same_global_batch_ms": round(t_single * 1e3, 1),
        "sharding_overhead_pct": round(100.0 * (t_sharded - t_single)
                                       / t_single, 1),
        "env_steps_per_s": round(cfg.num_envs * ROLLOUT_STEPS / t_sharded),
    }
    print("ROW " + json.dumps(row))


def main() -> None:
    rows = []
    for n in (1, 2, 4, 8):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(n)],
            capture_output=True, text=True, env=env, cwd=ROOT, timeout=3600)
        line = [l for l in out.stdout.splitlines() if l.startswith("ROW ")]
        if out.returncode != 0 or not line:
            print(out.stdout[-3000:])
            print(out.stderr[-3000:])
            raise RuntimeError(f"worker n={n} failed")
        rows.append(json.loads(line[-1][4:]))
        print(line[-1])
    result = {
        "description": "weak scaling of the sharded PPO train step on a "
                       "virtual CPU device mesh (fixed envs/device); "
                       "sharding_overhead_pct isolates shard_map+collective "
                       "cost vs the identical unsharded computation",
        "platform": "cpu (virtual devices; real ICI not available)",
        "cores": os.cpu_count(),
        "note": "rows with n_devices <= cores measure sharding overhead; "
                "rows with n_devices > cores are dominated by oversubscribed "
                "collective rendezvous on the shared host cores and bound "
                "nothing about real ICI",
        "rows": rows,
    }
    with open(os.path.join(ROOT, "MULTIDEV.json"), "w") as f:
        json.dump(result, f, indent=1)
    print("wrote MULTIDEV.json")


if __name__ == "__main__":
    if "--worker" in sys.argv:
        _worker(int(sys.argv[sys.argv.index("--worker") + 1]))
    else:
        main()
