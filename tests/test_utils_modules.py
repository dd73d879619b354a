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
    def _params(self):
        from rl_mpc_locomotion_tpu.models import robots
        return robots.aliengo_params()

    def test_sample_ranges(self):
        dr = randomize.DomainRandomization()
        cfg = physics.PhysicsConfig()
        params = self._params()
        keys = jax.random.split(jax.random.PRNGKey(0), 256)
        rps = jax.vmap(lambda k: randomize.sample(dr, cfg, params, k))(keys)
        mu = np.asarray(rps["physics.friction_mu"])
        assert mu.min() >= cfg.friction_mu * 0.6 - 1e-5
        assert mu.max() <= cfg.friction_mu * 1.3 + 1e-5
        assert mu.std() > 0.01  # actually randomized

    def test_apply(self):
        dr = randomize.DomainRandomization()
        cfg = physics.PhysicsConfig()
        params = self._params()
        rp = randomize.sample(dr, cfg, params, jax.random.PRNGKey(1))
        new_cfg = randomize.apply_to_config(cfg, rp)
        assert float(new_cfg.friction_mu) != cfg.friction_mu
        new_params = randomize.apply_to_params(params, rp)
        assert float(new_params.body_mass) != float(params.body_mass)

    def test_randomized_physics_step_runs(self):
        from rl_mpc_locomotion_tpu.sim import terrain
        params = self._params()
        dr = randomize.DomainRandomization()
        cfg = physics.PhysicsConfig()
        ter = terrain.flat(extent=10.0, cell=0.5)
        q0 = jnp.tile(jnp.array([0.0, 0.8, -1.6]), 4)

        def one(key):
            rp = randomize.sample(dr, cfg, params, key)
            rcfg = randomize.apply_to_config(cfg, rp)
            rparams = randomize.apply_to_params(params, rp)
            st = physics.init_state(rparams, q0, 0.345)
            st, _, _ = physics.step(rparams, rcfg, ter, st, jnp.zeros(12))
            return st.pos[2]

        zs = jax.jit(jax.vmap(one))(jax.random.split(jax.random.PRNGKey(2), 8))
        assert np.isfinite(np.asarray(zs)).all()

    def test_generic_specs_gaussian_additive_and_robot_fields(self):
        """The generic engine: any physics.*/robot.* scalar with any
        distribution x operation combination (vec_task.py:449-705)."""
        params = self._params()
        cfg = physics.PhysicsConfig()
        dr = randomize.DomainRandomization(specs=(
            ("robot.body_height", randomize.RandomizationSpec(
                distribution="gaussian", operation="additive",
                range_=(0.0, 0.01))),
            ("physics.joint_friction", randomize.RandomizationSpec(
                operation="scaling", range_=(0.5, 2.0))),
        ))
        keys = jax.random.split(jax.random.PRNGKey(3), 128)
        rps = jax.vmap(lambda k: randomize.sample(dr, cfg, params, k))(keys)
        bh = np.asarray(rps["robot.body_height"])
        assert abs(bh.mean() - float(params.body_height)) < 0.01
        assert 0.002 < bh.std() < 0.03
        jf = np.asarray(rps["physics.joint_friction"])
        assert jf.min() >= cfg.joint_friction * 0.5 - 1e-5
        new_params = randomize.apply_to_params(
            params, jax.tree.map(lambda x: x[0], rps))
        assert float(new_params.body_height) != float(params.body_height)

    def test_schedule_ramps_noise(self):
        """linear schedule: zero noise at step 0, full at schedule_steps."""
        params = self._params()
        cfg = physics.PhysicsConfig()
        dr = randomize.DomainRandomization(specs=(
            ("physics.friction_mu", randomize.RandomizationSpec(
                range_=(0.5, 0.5), schedule="linear", schedule_steps=100)),
        ))
        k = jax.random.PRNGKey(0)
        at0 = randomize.sample(dr, cfg, params, k, jnp.int32(0))
        at50 = randomize.sample(dr, cfg, params, k, jnp.int32(50))
        at100 = randomize.sample(dr, cfg, params, k, jnp.int32(100))
        mu0 = float(at0["physics.friction_mu"])
        mu50 = float(at50["physics.friction_mu"])
        mu100 = float(at100["physics.friction_mu"])
        nom = cfg.friction_mu
        assert abs(mu0 - nom) < 1e-6                      # no noise yet
        np.testing.assert_allclose(mu100, nom * 0.5, rtol=1e-5)
        np.testing.assert_allclose(mu50 - nom, (mu100 - nom) / 2, rtol=1e-4)

    def test_from_dict_yaml_shape(self):
        dr = randomize.from_dict({
            "frequency": 7,
            "specs": {"physics.friction_mu": {
                "distribution": "uniform", "operation": "scaling",
                "range": [0.7, 1.2]}}})
        assert dr.frequency == 7
        assert dr.spec("physics.friction_mu").range_ == (0.7, 1.2)
        assert dr.spec("robot.body_mass") is None


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
