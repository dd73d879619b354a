"""Tests for filters, domain randomization, YAML config, checkpointing, and
the distributed helpers."""
import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rl_mpc_locomotion_tpu.ops import filters
from rl_mpc_locomotion_tpu.sim import physics, randomize
from rl_mpc_locomotion_tpu.utils import config as config_mod


class TestMovingWindowFilter:
    def test_matches_numpy_mean(self):
        rng = np.random.default_rng(0)
        data = rng.normal(size=50).astype(np.float32)
        state = filters.init_moving_window(10)
        for i, v in enumerate(data):
            state, avg = filters.moving_window_update(state, jnp.float32(v))
            lo = max(0, i - 9)
            want = data[lo:i + 1].mean()
            np.testing.assert_allclose(float(avg), want, atol=1e-5)

    def test_vector_values(self):
        state = filters.init_moving_window(4, shape=(3,))
        for i in range(8):
            state, avg = filters.moving_window_update(
                state, jnp.full(3, float(i)))
        np.testing.assert_allclose(np.asarray(avg), (4 + 5 + 6 + 7) / 4,
                                   atol=1e-5)

    def test_jittable_scan(self):
        def step(state, v):
            return filters.moving_window_update(state, v)
        data = jnp.arange(20, dtype=jnp.float32)
        state = filters.init_moving_window(5)
        _, avgs = jax.lax.scan(step, state, data)
        np.testing.assert_allclose(float(avgs[-1]), np.arange(15, 20).mean(),
                                   atol=1e-5)


class TestDomainRandomization:
    def test_sample_ranges(self):
        dr = randomize.DomainRandomization()
        cfg = physics.PhysicsConfig()
        keys = jax.random.split(jax.random.PRNGKey(0), 256)
        rps = jax.vmap(lambda k: randomize.sample(dr, cfg, k))(keys)
        mu = np.asarray(rps.friction_mu)
        assert mu.min() >= cfg.friction_mu * 0.6 - 1e-5
        assert mu.max() <= cfg.friction_mu * 1.3 + 1e-5
        assert mu.std() > 0.01  # actually randomized

    def test_apply(self):
        from rl_mpc_locomotion_tpu.models import robots
        dr = randomize.DomainRandomization()
        cfg = physics.PhysicsConfig()
        rp = randomize.sample(dr, cfg, jax.random.PRNGKey(1))
        new_cfg = randomize.apply_to_config(cfg, rp)
        assert float(new_cfg.friction_mu) != cfg.friction_mu
        params = robots.aliengo_params()
        new_params = randomize.apply_to_params(params, rp)
        assert float(new_params.body_mass) != float(params.body_mass)

    def test_randomized_physics_step_runs(self):
        from rl_mpc_locomotion_tpu.models import robots
        from rl_mpc_locomotion_tpu.sim import terrain
        params = robots.aliengo_params()
        dr = randomize.DomainRandomization()
        cfg = physics.PhysicsConfig()
        ter = terrain.flat(extent=10.0, cell=0.5)
        q0 = jnp.tile(jnp.array([0.0, 0.8, -1.6]), 4)

        def one(key):
            rp = randomize.sample(dr, cfg, key)
            rcfg = randomize.apply_to_config(cfg, rp)
            rparams = randomize.apply_to_params(params, rp)
            st = physics.init_state(rparams, q0, 0.345)
            st, _, _ = physics.step(rparams, rcfg, ter, st, jnp.zeros(12))
            return st.pos[2]

        zs = jax.jit(jax.vmap(one))(jax.random.split(jax.random.PRNGKey(2), 8))
        assert np.isfinite(np.asarray(zs)).all()


class TestYamlConfig:
    def test_overlay_and_overrides(self):
        from rl_mpc_locomotion_tpu.rl.train import TrainConfig
        cfg = config_mod.overlay(TrainConfig(), {"num_envs": 64})
        assert cfg.num_envs == 64
        cfg = config_mod.apply_overrides(
            TrainConfig(), {"ppo.learning_rate": 3e-4,
                            "env.control.qp.iters": 77})
        assert cfg.ppo.learning_rate == 3e-4
        assert cfg.env.control.qp.iters == 77

    def test_unknown_key_raises(self):
        from rl_mpc_locomotion_tpu.rl.train import TrainConfig
        with pytest.raises(KeyError, match="unknown config key"):
            config_mod.overlay(TrainConfig(), {"nmu_envs": 64})

    def test_yaml_file_roundtrip(self):
        from rl_mpc_locomotion_tpu.rl.train import TrainConfig
        path = tempfile.mktemp(suffix=".yaml")
        with open(path, "w") as f:
            f.write("num_envs: 32\nppo:\n  gamma: 0.95\n")
        cfg = config_mod.load_config(TrainConfig(), path)
        assert cfg.num_envs == 32
        assert cfg.ppo.gamma == 0.95


class TestCheckpoint:
    def test_save_restore_roundtrip(self):
        from rl_mpc_locomotion_tpu.models.actor_critic import ActorCritic
        from rl_mpc_locomotion_tpu.rl import ppo
        from rl_mpc_locomotion_tpu.utils import checkpoint as ckpt
        model = ActorCritic(num_actions=4, hidden=(8,))
        cfg = ppo.PPOConfig()
        ts = ppo.init_train_state(jax.random.PRNGKey(0), model, 6, cfg)
        d = tempfile.mkdtemp()
        ckpt.save_checkpoint(d, 100, ts)
        ckpt.save_checkpoint(d, 200, ts)
        assert ckpt.latest_checkpoint(d).endswith("model_200")
        restored = ckpt.restore_checkpoint(ckpt.latest_checkpoint(d), ts)
        orig = jax.tree.leaves(ts.params)
        rest = jax.tree.leaves(restored.params)
        for a, b in zip(orig, rest):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class TestDistributed:
    def test_single_process_noop_and_mesh(self):
        from rl_mpc_locomotion_tpu.parallel import distributed
        distributed.initialize()  # no-op without coordinator
        mesh = distributed.global_env_mesh()
        assert mesh.axis_names == ("env",)
        start, size = distributed.local_batch_slice(32)
        assert (start, size) == (0, 32)
