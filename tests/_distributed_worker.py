"""Worker process for tests/test_distributed.py.

Launched twice (process_id 0/1) with 4 local CPU devices each; brings up
jax.distributed, builds the global 8-device env mesh across both processes,
and runs ONE sharded PPO train step (rollout + update with cross-process
pmean gradient reduction). The step uses the full rsl_rl minibatch schedule
(5 epochs x 4 minibatches) so the adaptive-KL lr path executes with
*different data per shard* — the regression this test locks down is
shard-local KL driving per-device learning rates (ppo.ppo_update
axis_name). Prints ``RESULT <pid> <mean_reward> <psum>`` and dumps the full
post-update params to ``<outdir>/params_<pid>.npz`` so the parent can
assert max-abs cross-process parameter difference == 0 (a sum fingerprint
can hide divergence).

Run directly:  python tests/_distributed_worker.py <pid> <port> <outdir>
"""
import sys


def main():
    pid = int(sys.argv[1])
    port = int(sys.argv[2])
    outdir = sys.argv[3]

    import jax
    # NOTE: with jax.distributed, --xla_force_host_platform_device_count is
    # ignored; local CPU device count must come from jax_num_cpu_devices.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)

    from rl_mpc_locomotion_tpu.parallel import distributed
    distributed.initialize(f"localhost:{port}", num_processes=2,
                           process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rl_mpc_locomotion_tpu.control.types import ControlConfig
    from rl_mpc_locomotion_tpu.models import robots
    from rl_mpc_locomotion_tpu.models.actor_critic import ActorCritic
    from rl_mpc_locomotion_tpu.ops.qp import QPConfig
    from rl_mpc_locomotion_tpu.parallel.mesh import ENV_AXIS
    from rl_mpc_locomotion_tpu.rl import ppo
    from rl_mpc_locomotion_tpu.rl import train as train_mod
    from rl_mpc_locomotion_tpu.sim import env as env_mod
    from rl_mpc_locomotion_tpu.sim import terrain

    mesh = distributed.global_env_mesh()
    env_shard = NamedSharding(mesh, P(ENV_AXIS))
    rep = NamedSharding(mesh, P())

    # cross-process collective sanity check first (cheap to compile)
    x = jax.device_put(np.arange(8, dtype=np.float32), env_shard)
    psum = jax.jit(jax.shard_map(lambda v: jax.lax.psum(v, ENV_AXIS),
                                 mesh=mesh, in_specs=P(ENV_AXIS),
                                 out_specs=P()))(x)
    psum_val = float(np.asarray(psum.addressable_data(0))[0])
    assert psum_val == 28.0, psum_val

    # one real sharded train step: 8 envs, 1 per device, 8 rollout steps,
    # full rsl_rl schedule (5 epochs x 4 minibatches) so each shard's
    # minibatches hold different data and the adaptive-KL lr path is
    # genuinely exercised (1 epoch x 1 minibatch has KL(old||old) == 0 on
    # every shard, which cannot catch shard-local-lr divergence)
    qp = QPConfig(iters=8, iters2=0, adaptive_rho=False, ruiz_iters=1,
                  polish=False)
    cfg = train_mod.TrainConfig(
        num_envs=8,
        ppo=ppo.PPOConfig(num_steps=8, num_epochs=5, num_minibatches=4),
        env=env_mod.EnvConfig(control=ControlConfig(qp=qp)))
    params = robots.aliengo_params()
    ter = terrain.flat()
    model = ActorCritic(num_actions=env_mod.NUM_ACTIONS)
    train_state = ppo.init_train_state(jax.random.PRNGKey(1), model,
                                       env_mod.NUM_OBS, cfg.ppo)
    step_fn, reset_batch = train_mod.make_train_step(params, cfg, ter, model,
                                                     mesh)
    env_state, obs = reset_batch(jax.random.PRNGKey(2))

    # host-local -> global arrays (every process computed identical values)
    glob = lambda sh: (lambda v: jax.device_put(np.asarray(v), sh))
    env_state = jax.tree.map(glob(env_shard), env_state)
    obs = glob(env_shard)(obs)
    train_state = jax.tree.map(glob(rep), train_state)
    tick = glob(rep)(np.int32(0))

    train_state, env_state, obs, tick, metrics = step_fn(
        train_state, env_state, obs, tick)
    mr = float(np.asarray(jax.device_get(metrics["mean_reward"])))
    assert np.isfinite(mr), mr
    # after 20 minibatch updates the lr must have actually moved off its
    # init (else the adaptive path was not exercised and the test is vacuous)
    lr = float(np.asarray(jax.device_get(train_state.lr)))
    assert lr != cfg.ppo.learning_rate, lr
    # replicated params must be identical across processes: dump them in
    # full for the parent's max-abs comparison, plus a summary line
    leaves = jax.tree.leaves(train_state.params)
    arrs = {f"p{i}": np.asarray(jax.device_get(l))
            for i, l in enumerate(leaves)}
    # the adaptive-lr input itself: metrics['kl'] is the mean over the 20
    # minibatch updates of the KL that drove each lr decision. Post-fix it
    # is pmean'd (identical across processes to the bit); pre-fix each
    # process reports its own shard-local value. Params can coincide even
    # with divergent KLs (the x1.5 buckets quantize), so this is the
    # sensitive invariant and the params check is the consequence check.
    kl = float(np.asarray(jax.device_get(metrics["kl"])))
    import os
    np.savez(os.path.join(outdir, f"params_{pid}.npz"), lr=lr, kl=kl, **arrs)

    # ---- multi-process orbax checkpoint roundtrip (VERDICT r4 #7) ------
    # every process participates in ONE coordinated save of the replicated
    # TrainState and the cross-process-SHARDED env snapshot, restores, and
    # asserts a bit-identical roundtrip of its local shards.
    from rl_mpc_locomotion_tpu.utils.checkpoint import (
        restore_checkpoint, restore_env_snapshot, save_checkpoint)
    ckdir = os.path.join(outdir, "ckpt")
    snap0 = {"env": env_state, "obs": obs, "tick": tick}
    path = save_checkpoint(ckdir, 1, train_state, env_snapshot=snap0)
    ts2 = restore_checkpoint(path, train_state)
    snap2 = restore_env_snapshot(path, snap0)
    assert snap2 is not None

    def local_shards(a):
        if hasattr(a, "addressable_shards"):
            return [np.asarray(s.data) for s in a.addressable_shards]
        return [np.asarray(a)]

    for tree_a, tree_b in ((train_state, ts2), (snap0, snap2)):
        for x, y in zip(jax.tree.leaves(tree_a), jax.tree.leaves(tree_b)):
            for sa, sb in zip(local_shards(x), local_shards(y)):
                assert sa.dtype == sb.dtype and (sa == sb).all(), \
                    "checkpoint roundtrip not bit-identical"

    fp = float(sum(a.sum() for a in arrs.values()))
    print(f"RESULT {pid} {mr:.6f} {fp:.6f}", flush=True)


if __name__ == "__main__":
    main()
