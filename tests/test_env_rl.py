"""Environment + PPO tests: obs/reward/reset semantics, physics sanity,
a full training step, and reward-improvement smoke."""
import numpy as np
import jax
import jax.numpy as jnp

from rl_mpc_locomotion_tpu.control.types import ControlConfig
from rl_mpc_locomotion_tpu.models import robots
from rl_mpc_locomotion_tpu.models.actor_critic import ActorCritic
from rl_mpc_locomotion_tpu.ops.qp import QPConfig
from rl_mpc_locomotion_tpu.rl import ppo, train as train_mod
from rl_mpc_locomotion_tpu.sim import env as env_mod
from rl_mpc_locomotion_tpu.sim import physics, terrain

CHEAP_QP = QPConfig(iters=8, iters2=0, adaptive_rho=False, polish=False,
                    ruiz_iters=1)
FAST_ENV = env_mod.EnvConfig(control=ControlConfig(qp=CHEAP_QP))


def make_env():
    params = robots.aliengo_params()
    ter = terrain.flat(extent=20.0, cell=0.2)
    return params, FAST_ENV, ter


class TestEnv:
    def test_reset_shapes_and_ranges(self):
        params, cfg, ter = make_env()
        state = env_mod.reset(params, cfg, jax.random.PRNGKey(0))
        obs = env_mod.observations(params, cfg, state)
        assert obs.shape == (env_mod.NUM_OBS,)
        assert cfg.command_x_range[0] <= float(state.commands[0]) <= \
            cfg.command_x_range[1]
        # dof pos is default * U[0.5, 1.5]; skip abad joints (default 0)
        default = np.asarray(env_mod.DEFAULT_DOF_POS)
        nonzero = np.abs(default) > 1e-6
        ratio = np.asarray(state.phys.q)[nonzero] / default[nonzero]
        assert np.all(ratio >= 0.5 - 1e-6) and np.all(ratio <= 1.5 + 1e-6)

    def test_step_runs_and_is_finite(self):
        params, cfg, ter = make_env()
        state = env_mod.reset(params, cfg, jax.random.PRNGKey(1))
        step = jax.jit(lambda s, a: env_mod.step(params, cfg, ter, s, a))
        action = jnp.zeros(12)
        for _ in range(5):
            state, obs, rew, done, info = step(state, action)
        assert np.isfinite(np.asarray(obs)).all()
        assert np.isfinite(float(rew))
        assert np.asarray(info["torques"]).shape == (12,)

    def test_action_rescale_matches_reference_mapping(self):
        # Parameters.py:25-33: [-1,1] -> scale*a + const, +0 placeholder
        w = np.asarray(env_mod.rescale_actions(jnp.ones(12)))
        np.testing.assert_allclose(w[:6], [9, 9, 9, 70, 70, 70], atol=1e-6)
        np.testing.assert_allclose(w[12], 0.0)
        w = np.asarray(env_mod.rescale_actions(-jnp.ones(12)))
        np.testing.assert_allclose(w[:6], [1, 1, 1, 30, 30, 30], atol=1e-6)
        # clipping
        w = np.asarray(env_mod.rescale_actions(jnp.full(12, 5.0)))
        np.testing.assert_allclose(w[3], 70, atol=1e-6)

    def test_episode_timeout_resets(self):
        params, cfg, ter = make_env()
        import dataclasses
        cfg = dataclasses.replace(cfg, episode_length=3)
        state = env_mod.reset(params, cfg, jax.random.PRNGKey(2))
        step = jax.jit(lambda s, a: env_mod.step(params, cfg, ter, s, a))
        dones = []
        for _ in range(6):
            state, obs, rew, done, info = step(state, jnp.zeros(12))
            dones.append(bool(done))
        assert any(dones)
        # after reset, progress restarted
        assert int(state.progress) <= 4

    def test_vmapped_batch(self):
        params, cfg, ter = make_env()
        keys = jax.random.split(jax.random.PRNGKey(3), 4)
        states = jax.vmap(lambda k: env_mod.reset(params, cfg, k))(keys)
        step = jax.jit(jax.vmap(
            lambda s, a: env_mod.step(params, cfg, ter, s, a)))
        actions = jnp.zeros((4, 12))
        states, obs, rew, done, info = step(states, actions)
        assert obs.shape == (4, env_mod.NUM_OBS)
        assert rew.shape == (4,)


class TestDomainRandomization:
    def test_reset_draws_differ_per_env(self):
        """Two envs in one batch get different physics draws (vec_task
        apply_randomizations per-env semantics)."""
        import dataclasses
        from rl_mpc_locomotion_tpu.sim import randomize
        params, _, ter = make_env()
        cfg = dataclasses.replace(FAST_ENV, dr=randomize.DomainRandomization())
        keys = jax.random.split(jax.random.PRNGKey(7), 4)
        states = jax.vmap(lambda k: env_mod.reset(params, cfg, k))(keys)
        mu = np.asarray(states.rand["physics.friction_mu"])
        assert np.unique(mu).size == 4
        lo, hi = cfg.dr.spec("physics.friction_mu").range_
        nominal = cfg.physics.friction_mu
        assert np.all(mu >= lo * nominal - 1e-6)
        assert np.all(mu <= hi * nominal + 1e-6)

    def test_different_draws_diverge_physics(self):
        """Identical initial state + action stream, different friction/mass
        draws -> trajectories diverge (DR actually reaches physics.step)."""
        import dataclasses
        from rl_mpc_locomotion_tpu.sim import randomize
        params, _, ter = make_env()
        cfg = dataclasses.replace(FAST_ENV, dr=randomize.DomainRandomization())
        s0 = env_mod.reset(params, cfg, jax.random.PRNGKey(3))
        s1 = s0._replace(rand=randomize.sample(cfg.dr, cfg.physics, params,
                                               jax.random.PRNGKey(99)))
        states = jax.tree.map(lambda a, b: jnp.stack([a, b]), s0, s1)
        step = jax.jit(jax.vmap(
            lambda s, a: env_mod.step(params, cfg, ter, s, a)))
        for _ in range(10):
            states, obs, rew, done, info = step(states, jnp.zeros((2, 12)))
        q = np.asarray(states.phys.q)
        assert np.abs(q[0] - q[1]).max() > 1e-4

    def test_dr_off_is_nominal(self):
        params, cfg, ter = make_env()  # FAST_ENV has dr=None
        state = env_mod.reset(params, cfg, jax.random.PRNGKey(0))
        assert state.rand == {}  # no draws -> physics runs nominal config

    def test_frequency_redraws_mid_episode(self):
        import dataclasses
        from rl_mpc_locomotion_tpu.sim import randomize
        params, _, ter = make_env()
        dr = randomize.DomainRandomization(frequency=3)
        cfg = dataclasses.replace(FAST_ENV, dr=dr)
        state = env_mod.reset(params, cfg, jax.random.PRNGKey(11))
        mu0 = float(state.rand["physics.friction_mu"])
        step = jax.jit(lambda s, a: env_mod.step(params, cfg, ter, s, a))
        mus = []
        for _ in range(4):
            state, *_ = step(state, jnp.zeros(12))
            mus.append(float(state.rand["physics.friction_mu"]))
        # redraw keys on the GLOBAL tick (vec_task rand_freq semantics)
        assert mus[0] == mu0 and mus[1] == mu0   # tick 1, 2: no redraw
        assert mus[2] != mu0                     # tick 3: redraw
        assert mus[3] == mus[2]


class TestResume:
    def test_resume_restores_params_and_step(self, tmp_path):
        """resume_train_state: latest-run discovery + orbax restore + start
        iteration parsing (reference train.py:63-72 / rsl_rl_utils:49-74)."""
        from rl_mpc_locomotion_tpu.utils.checkpoint import save_checkpoint
        model = ActorCritic(num_actions=12, hidden=(16,))
        cfg = ppo.PPOConfig()
        ts = ppo.init_train_state(jax.random.PRNGKey(5), model,
                                  env_mod.NUM_OBS, cfg)
        save_checkpoint(str(tmp_path), 3, ts)
        save_checkpoint(str(tmp_path), 7, ts)  # latest

        ts_fresh = ppo.init_train_state(jax.random.PRNGKey(6), model,
                                        env_mod.NUM_OBS, cfg)
        restored, start_it, path = train_mod.resume_train_state(
            str(tmp_path), ts_fresh, log_fn=lambda *_: None)
        assert start_it == 7
        assert path.endswith("model_7")
        want = jax.tree.leaves(ts.params)
        got = jax.tree.leaves(restored.params)
        for w, g in zip(want, got):
            np.testing.assert_allclose(np.asarray(w), np.asarray(g))

    def test_resume_missing_dir_raises(self, tmp_path):
        import pytest
        model = ActorCritic(num_actions=12, hidden=(16,))
        ts = ppo.init_train_state(jax.random.PRNGKey(0), model,
                                  env_mod.NUM_OBS, ppo.PPOConfig())
        with pytest.raises(FileNotFoundError):
            train_mod.resume_train_state(str(tmp_path / "nope"), ts,
                                         log_fn=lambda *_: None)


class TestPhysics:
    def test_energy_sanity_freefall(self):
        """No contact: body accelerates at -g."""
        params, _, ter = make_env()
        pcfg = physics.PhysicsConfig()
        q0 = jnp.tile(jnp.array([0.0, 0.8, -1.6]), 4)
        st = physics.init_state(params, q0, height=2.0)
        st, _, _ = physics.step(params, pcfg, ter, st, jnp.zeros(12))
        dt = pcfg.dt * pcfg.substeps
        assert abs(float(st.v[2]) - (-9.81 * dt)) < 1e-3

    def test_standing_with_gravity_compensation(self):
        from rl_mpc_locomotion_tpu.ops.leg_kinematics import leg_fk_jacobian
        params, _, ter = make_env()
        pcfg = physics.PhysicsConfig()
        q0 = jnp.tile(jnp.array([0.0, 0.8, -1.6]), 4)
        st = physics.init_state(params, q0, height=0.345)
        mg4 = float(params.body_mass) * 9.81 / 4

        @jax.jit
        def tick(st):
            q = st.q.reshape(4, 3)
            _, J = leg_fk_jacobian(q, params.abad_link_length,
                                   params.hip_link_length,
                                   params.knee_link_length)
            f = jnp.tile(jnp.array([0.0, 0.0, -mg4]), (4, 1))
            tau = jnp.einsum('lji,lj->li', J, f).reshape(12)
            tau += 30.0 * (q0 - st.q) - 1.0 * st.qd
            return physics.step(params, pcfg, ter, st, tau)[0]

        for _ in range(200):
            st = tick(st)
        assert 0.25 < float(st.pos[2]) < 0.4
        assert float(st.quat[0]) > 0.98  # upright


class TestLegInertiaCoupling:
    """PhysicsConfig.leg_coupling: swing-leg reaction forces couple into
    the trunk (VERDICT r3 missing #2 / SURVEY §7 stage 6 fidelity step)."""

    def _airborne(self, pcfg):
        params, _, ter = make_env()
        q0 = jnp.tile(jnp.array([0.0, 0.8, -1.6]), 4)
        st = physics.init_state(params, q0, height=5.0)  # no contact
        return params, ter, st

    def test_swing_reaction_pitches_trunk(self):
        """Airborne robot swings all legs forward (hip-pitch torque): with
        coupling the trunk must pitch back (momentum exchange); the pure
        SRB plant cannot react at all."""
        tau = jnp.tile(jnp.array([0.0, 8.0, 0.0]), 4)  # hip pitch torque

        def run(pcfg):
            params, ter, st = self._airborne(pcfg)
            step = jax.jit(lambda s: physics.step(params, pcfg, ter, s, tau))
            for _ in range(20):
                st = step(s=st)[0]
            return st

        st_srb = run(physics.PhysicsConfig())
        st_cpl = run(physics.PhysicsConfig(leg_coupling=True))
        # SRB: zero angular response to joint torques in free space
        assert abs(float(st_srb.omega[1])) < 1e-5
        # coupled: non-trivial pitch rate, opposite in sign to the leg
        # swing (legs forward under +hip-pitch => trunk pitches the other
        # way); just require a clearly nonzero response
        assert abs(float(st_cpl.omega[1])) > 1e-3
        for leaf in jax.tree.leaves(st_cpl):
            assert np.all(np.isfinite(np.asarray(leaf, dtype=np.float32)))

    def test_weightlessness_no_joint_load(self):
        """Free fall, zero torque: joints must feel NO load either way —
        with the coupling, a_p equals g so the reaction vanishes exactly
        (weightlessness). Guards against a sign/bookkeeping error that
        would make legs 'sag' in free fall."""
        for pcfg in (physics.PhysicsConfig(),
                     physics.PhysicsConfig(leg_coupling=True)):
            params, ter, st = self._airborne(pcfg)
            st2, _, _ = physics.step(params, pcfg, ter, st, jnp.zeros(12))
            assert np.abs(np.asarray(st2.qd)).max() < 1e-5

    def test_centrifugal_load_flings_legs(self):
        """Airborne robot spinning about z, zero torque: with coupling the
        centrifugal term omega x (omega x r_p) loads the joints and the
        legs get flung outward; the SRB plant keeps them frozen."""
        def run(pcfg):
            params, ter, st = self._airborne(pcfg)
            st = st._replace(omega=jnp.array([0.0, 0.0, 8.0], jnp.float32))
            step = jax.jit(lambda s: physics.step(params, pcfg, ter, s,
                                                  jnp.zeros(12)))
            for _ in range(10):
                st = step(s=st)[0]
            return st

        q0 = np.asarray(jnp.tile(jnp.array([0.0, 0.8, -1.6]), 4))
        dq_srb = np.abs(np.asarray(run(
            physics.PhysicsConfig()).q) - q0).max()
        dq_cpl = np.abs(np.asarray(run(
            physics.PhysicsConfig(leg_coupling=True)).q) - q0).max()
        assert dq_srb < 1e-4                    # massless legs: frozen
        assert dq_cpl > 5 * max(dq_srb, 1e-5)   # heavy legs: flung

    def test_total_mass_conserved_in_freefall(self):
        """Legs riding rigidly with the trunk: CoM acceleration must be -g
        (the trunk-mass split + reaction forces recover total mass)."""
        pcfg = physics.PhysicsConfig(leg_coupling=True,
                                     joint_damping=50.0)  # pin legs
        params, ter, st = self._airborne(pcfg)
        st2, _, _ = physics.step(params, pcfg, ter, st, jnp.zeros(12))
        dt = pcfg.dt * pcfg.substeps
        # trunk vertical accel within 15% of g (legs sag slightly, moving
        # CoM; exact -g holds only for the full system CoM)
        assert abs(float(st2.v[2]) / dt + 9.81) < 0.15 * 9.81

    def test_closed_loop_walks_with_coupling(self):
        """The MPC controller still walks the higher-fidelity plant: model
        mismatch (controller assumes SRB) stays within the controller's
        robustness margin."""
        from rl_mpc_locomotion_tpu.control import runner as runner_mod
        params, _, ter = make_env()
        pcfg = physics.PhysicsConfig(leg_coupling=True)
        # full-accuracy solver: the whip disturbance is a real model
        # mismatch, and the 8-iter CHEAP_QP test solver (fine for
        # API-shape tests) has no margin for it
        ccfg = ControlConfig()
        q0 = jnp.tile(jnp.array([0.0, 0.8, -1.6]), 4)
        pst = physics.init_state(params, q0, float(params.body_height) + 0.03)
        cst = runner_mod.init_state(params, ccfg)
        commands = jnp.array([0.4, 0.0, 0.0], jnp.float32)

        @jax.jit
        def tick(pst, cst):
            body = physics.root_state_vector(pst)
            cst, tau, _ = runner_mod.min_step(
                params, ccfg, cst, pst.q, pst.qd, body, commands)
            pst, _, _ = physics.step(params, pcfg, ter, pst, tau)
            return pst, cst

        for _ in range(300):  # 3 s
            pst, cst = tick(pst, cst)
        assert float(pst.pos[2]) > 0.22, "trunk collapsed under coupling"
        assert float(pst.pos[0]) > 0.5, "no forward progress"
        assert float(pst.quat[0]) > 0.95, "not upright"


class TestNaNContainment:
    def test_env_blowup_resets_and_zeroes_reward(self):
        """A non-finite physics state must be confined to its env: forced
        done, zero reward, and a finite post-reset state (the guard that
        kept a rare DR-draw blowup from NaN-poisoning a whole campaign)."""
        params, cfg, ter = make_env()
        state = env_mod.reset(params, cfg, jax.random.PRNGKey(2))
        bad = state._replace(phys=state.phys._replace(
            qd=state.phys.qd.at[3].set(jnp.nan),
            v=state.phys.v.at[0].set(jnp.inf)))
        step = jax.jit(lambda s, a: env_mod.step(params, cfg, ter, s, a))
        new_state, obs, rew, done, _ = step(bad, jnp.zeros(12))
        assert bool(done)
        assert float(rew) == 0.0
        for leaf in jax.tree.leaves(new_state.phys):
            assert np.isfinite(np.asarray(leaf)).all()
        assert np.isfinite(np.asarray(obs)).all()

    def test_ppo_update_skips_nonfinite_gradients(self):
        """A poisoned rollout (NaN reward -> NaN loss/grads) must leave
        params, optimizer state and lr untouched."""
        model = ActorCritic(num_actions=2, hidden=(16,))
        cfg = ppo.PPOConfig(num_steps=4, num_minibatches=1, num_epochs=1,
                            schedule="fixed", learning_rate=1e-2)
        rng = jax.random.PRNGKey(0)
        ts = ppo.init_train_state(rng, model, 4, cfg)
        t, b = 4, 2
        obs = jnp.ones((t, b, 4))
        action = jnp.zeros((t, b, 2))
        mean, log_std, value = jax.vmap(
            lambda o: model.apply(ts.params, o))(obs)
        lp = ppo.gaussian_log_prob(mean, log_std, action)
        reward = jnp.full((t, b), jnp.nan)
        traj = ppo.Transition(obs=obs, action=action, log_prob=lp,
                              value=value, reward=reward,
                              done=jnp.zeros((t, b)), mean=mean,
                              log_std=log_std)
        new_ts, _ = ppo.ppo_update(model, cfg, ts, traj, jnp.zeros(b))
        for old, new in zip(jax.tree.leaves(ts.params),
                            jax.tree.leaves(new_ts.params)):
            np.testing.assert_array_equal(np.asarray(old), np.asarray(new))
        assert float(new_ts.lr) == float(ts.lr)


class TestPPO:
    def test_gae_matches_manual(self):
        cfg = ppo.PPOConfig(gamma=0.9, lam=0.8)
        rewards = jnp.array([[1.0], [1.0], [1.0]])
        values = jnp.array([[0.5], [0.5], [0.5]])
        dones = jnp.zeros((3, 1))
        last_value = jnp.array([0.5])
        adv, ret = ppo.compute_gae(cfg, rewards, values, dones, last_value)
        # manual backward recursion
        want = np.zeros(3)
        gae = 0.0
        for t in reversed(range(3)):
            delta = 1.0 + 0.9 * 0.5 - 0.5
            gae = delta + 0.9 * 0.8 * gae
            want[t] = gae
        np.testing.assert_allclose(np.asarray(adv)[:, 0], want, atol=1e-5)

    def test_gae_done_masks_bootstrap(self):
        cfg = ppo.PPOConfig(gamma=0.9, lam=0.8)
        rewards = jnp.array([[1.0], [1.0]])
        values = jnp.array([[0.5], [0.5]])
        dones = jnp.array([[0.0], [1.0]])  # terminal at t=1
        adv, _ = ppo.compute_gae(cfg, rewards, values, dones,
                                 jnp.array([99.0]))
        # t=1 terminal: delta = 1 - 0.5 = 0.5 (no bootstrap from 99)
        np.testing.assert_allclose(float(adv[1, 0]), 0.5, atol=1e-5)

    def test_update_moves_policy_toward_advantage(self):
        model = ActorCritic(num_actions=2, hidden=(16,))
        cfg = ppo.PPOConfig(num_steps=8, num_minibatches=2, num_epochs=2,
                            schedule="fixed", learning_rate=1e-2)
        rng = jax.random.PRNGKey(0)
        ts = ppo.init_train_state(rng, model, 4, cfg)
        t, b = 8, 4
        obs = jnp.ones((t, b, 4))
        k1, k2 = jax.random.split(rng)
        action = jax.random.normal(k1, (t, b, 2))
        mean, log_std, value = jax.vmap(
            lambda o: model.apply(ts.params, o))(obs)
        lp = ppo.gaussian_log_prob(mean, log_std, action)
        # reward favors positive first action dim
        reward = action[..., 0]
        traj = ppo.Transition(obs=obs, action=action, log_prob=lp,
                              value=value, reward=reward,
                              done=jnp.zeros((t, b)), mean=mean,
                              log_std=log_std)
        new_ts, metrics = ppo.ppo_update(model, cfg, ts, traj,
                                         jnp.zeros(b))
        m0, _, _ = model.apply(ts.params, jnp.ones(4))
        m1, _, _ = model.apply(new_ts.params, jnp.ones(4))
        assert float(m1[0]) > float(m0[0])  # pushed toward +dim0
        assert np.isfinite(float(metrics["loss"]))


class TestTrainStep:
    def test_full_train_step_runs(self):
        params = robots.aliengo_params()
        cfg = train_mod.TrainConfig(
            num_envs=4,
            ppo=ppo.PPOConfig(num_steps=4, num_minibatches=2, num_epochs=1),
            env=FAST_ENV)
        ter = terrain.flat(extent=20.0, cell=0.2)
        model = ActorCritic(num_actions=12, hidden=(32, 32))
        rng = jax.random.PRNGKey(0)
        ts = ppo.init_train_state(rng, model, env_mod.NUM_OBS, cfg.ppo)
        step_fn, reset_batch = train_mod.make_train_step(params, cfg, ter,
                                                         model)
        env_state, obs = reset_batch(jax.random.PRNGKey(1))
        ts, env_state, obs, tick, metrics = step_fn(ts, env_state, obs,
                                                    jnp.int32(0))
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["mean_reward"]))
        assert int(tick) == 4

    def test_heterogeneous_robot_train_step(self):
        """One training batch mixing Aliengo+Go1+A1 (stacked per-env
        RobotParams, SURVEY §7 design stance): the rollout + PPO update
        must run with per-env robot constants and produce finite metrics,
        and physically distinct robots must see distinct dynamics."""
        robot_ids = [0, 1, 2, 0, 1, 2]
        params = train_mod.stacked_robot_params(robot_ids)
        assert train_mod.is_per_env(params)
        cfg = train_mod.TrainConfig(
            num_envs=6,
            ppo=ppo.PPOConfig(num_steps=4, num_minibatches=2, num_epochs=1),
            env=FAST_ENV)
        ter = terrain.flat(extent=20.0, cell=0.2)
        model = ActorCritic(num_actions=12, hidden=(32, 32))
        ts = ppo.init_train_state(jax.random.PRNGKey(0), model,
                                  env_mod.NUM_OBS, cfg.ppo)
        step_fn, reset_batch = train_mod.make_train_step(params, cfg, ter,
                                                         model)
        env_state, obs = reset_batch(jax.random.PRNGKey(1))
        # per-env masses really differ (Aliengo 18.1 / Go1 10.4 / A1 25.5)
        masses = np.asarray(params.body_mass)
        assert len(set(np.round(masses, 3))) == 3
        ts, env_state, obs, tick, metrics = step_fn(ts, env_state, obs,
                                                    jnp.int32(0))
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["mean_reward"]))
        assert np.isfinite(np.asarray(obs)).all()

    def test_heterogeneous_sharded_train_step(self):
        """Heterogeneous batch UNDER shard_map: per-env params shard over
        the env axis of the 8-device CPU mesh alongside the env state."""
        from jax.sharding import Mesh

        robot_ids = [0, 1, 2, 0, 1, 2, 1, 0]
        params = train_mod.stacked_robot_params(robot_ids)
        cfg = train_mod.TrainConfig(
            num_envs=8,
            ppo=ppo.PPOConfig(num_steps=4, num_minibatches=2, num_epochs=1),
            env=FAST_ENV)
        ter = terrain.flat(extent=20.0, cell=0.2)
        model = ActorCritic(num_actions=12, hidden=(32, 32))
        ts = ppo.init_train_state(jax.random.PRNGKey(0), model,
                                  env_mod.NUM_OBS, cfg.ppo)
        mesh = Mesh(np.array(jax.devices()).reshape(-1), ("env",))
        step_fn, reset_batch = train_mod.make_train_step(params, cfg, ter,
                                                         model, mesh)
        env_state, obs = reset_batch(jax.random.PRNGKey(1))
        ts, env_state, obs, tick, metrics = step_fn(ts, env_state, obs,
                                                    jnp.int32(0))
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["mean_reward"]))
