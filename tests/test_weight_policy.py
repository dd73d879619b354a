"""Weight-policy deployment tests: observation layout, action mapping, and
the Policy-mode FSM step (RobotRunnerPolicy semantics)."""
import numpy as np
import jax
import jax.numpy as jnp

from rl_mpc_locomotion_tpu.control import runner, state_estimator, weight_policy
from rl_mpc_locomotion_tpu.control.types import ControlConfig
from rl_mpc_locomotion_tpu.models import robots
from rl_mpc_locomotion_tpu.models.actor_critic import ActorCritic
from rl_mpc_locomotion_tpu.ops.qp import QPConfig

CHEAP_QP = QPConfig(iters=5, iters2=0, adaptive_rho=False, polish=False,
                    ruiz_iters=1)


def make_se(est):
    body = jnp.array([0, 0, 0.35, 0, 0, 0, 1, 0.3, 0.1, 0, 0.05, -0.02, 0.2],
                     jnp.float32)
    return state_estimator.update(est, body), body


class TestObservations:
    def test_layout_matches_reference(self):
        """WeightPolicy.compute_observations (:125-145): [vBody, omegaBody,
        -ground_normal_yaw, commands, dof_pos, dof_vel, prev_action]."""
        params = robots.aliengo_params()
        est = runner.init_state(params, ControlConfig()).est
        se, body = make_se(est)
        q = jnp.arange(12, dtype=jnp.float32) * 0.1
        qd = jnp.arange(12, dtype=jnp.float32) * 0.01
        cmds = jnp.array([0.5, 0.1, -0.2])
        prev = jnp.full(12, 0.3)
        obs = np.asarray(weight_policy.compute_observations(
            se, q, qd, cmds, prev))
        assert obs.shape == (48,)
        np.testing.assert_allclose(obs[0:3], np.asarray(se.v_body), atol=1e-6)
        np.testing.assert_allclose(obs[3:6], np.asarray(se.omega_body),
                                   atol=1e-6)
        np.testing.assert_allclose(obs[6:9], [0, 0, -1], atol=1e-6)
        np.testing.assert_allclose(obs[9:12], np.asarray(cmds), atol=1e-6)
        np.testing.assert_allclose(obs[12:24], np.asarray(q), atol=1e-6)
        np.testing.assert_allclose(obs[24:36], np.asarray(qd), atol=1e-6)
        np.testing.assert_allclose(obs[36:48], 0.3, atol=1e-6)

    def test_action_mapping(self):
        """[-1,1] -> scale*a + const + [0] (WeightPolicy :111-123)."""
        w = np.asarray(weight_policy.actions_to_weights(jnp.zeros(12)))
        np.testing.assert_allclose(w[:12],
                                   np.asarray(weight_policy.MPC_PARAM_CONST))
        assert w.shape == (13,) and w[12] == 0.0
        w = np.asarray(weight_policy.actions_to_weights(jnp.full(12, 2.0)))
        np.testing.assert_allclose(
            w[:12], np.asarray(weight_policy.MPC_PARAM_CONST)
            + np.asarray(weight_policy.MPC_PARAM_SCALE))  # clipped to 1


class TestStepBatch:
    def _setup(self):
        from rl_mpc_locomotion_tpu.sim import physics
        from rl_mpc_locomotion_tpu.control.weight_policy import WeightPolicy

        params = robots.aliengo_params()
        cfg = ControlConfig(qp=CHEAP_QP)
        q0 = jnp.tile(jnp.array([0.0, 0.8, -1.6], jnp.float32), 4)
        pstate = jax.vmap(lambda _: physics.init_state(params, q0, 0.345))(
            jnp.arange(2))
        cstate = jax.vmap(lambda _: runner.init_state(params, cfg))(
            jnp.arange(2))
        policy = WeightPolicy(hidden=(16,))
        return policy, pstate, cstate

    def test_prev_action_threads_into_obs(self):
        """Deployment obs must carry the true previous action (training obs
        include it, sim/env.py EnvState.actions); zeros vs the real value
        must change the policy output."""
        policy, pstate, cstate = self._setup()
        cmds = jnp.array([0.5, 0.0, 0.0], jnp.float32)
        w0, a0 = policy.step_batch(pstate, cstate, cmds)
        assert w0.shape == (2, 13) and a0.shape == (2, 12)
        # feeding the returned action back changes the next output
        w1, a1 = policy.step_batch(pstate, cstate, cmds, a0)
        assert np.abs(np.asarray(w1) - np.asarray(w0)).max() > 1e-6
        # explicit zeros reproduce the default
        z = jnp.zeros((2, 12), jnp.float32)
        w2, _ = policy.step_batch(pstate, cstate, cmds, z)
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w0), atol=1e-7)


class TestTrainDeployObsParity:
    def test_deployment_obs_equals_training_obs(self):
        """The deployment obs builder must produce EXACTLY the training
        env's observation for the same robot state (the reference ships a
        train/deploy obs mismatch — aliengo.py:410-444 vs
        WeightPolicy.py:125-145 — which this framework deliberately fixes;
        see control/weight_policy.py module docstring)."""
        from rl_mpc_locomotion_tpu.sim import env as env_mod, physics

        params = robots.aliengo_params()
        cfg = env_mod.EnvConfig()
        state = env_mod.reset(params, cfg, jax.random.PRNGKey(3))
        # non-trivial velocities/prev action
        state = state._replace(
            phys=state.phys._replace(
                v=jnp.array([0.4, -0.1, 0.05]),
                omega=jnp.array([0.1, 0.2, -0.3])),
            actions=jnp.arange(12, dtype=jnp.float32) * 0.1)
        want = env_mod.observations(params, cfg, state)
        body = physics.root_state_vector(state.phys)
        got = weight_policy.compute_observations_train_parity(
            body, state.phys.q, state.phys.qd, state.commands,
            state.actions)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)


class TestPolicyStep:
    def test_policy_fsm_step_runs(self):
        params = robots.aliengo_params()
        cfg = ControlConfig(qp=CHEAP_QP)
        model = ActorCritic(num_actions=12, hidden=(16,))
        pparams = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 48)))
        state = runner.init_state(params, cfg, fsm_initial=1)
        q = jnp.tile(jnp.array([0.0, 0.8, -1.6]), 4)
        qd = jnp.zeros(12)
        body = jnp.array([0, 0, 0.35, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0],
                         jnp.float32)
        cmds = jnp.zeros(3)
        prev = jnp.zeros(12)
        pi = jnp.int32(0)

        step = jax.jit(lambda s, pa, pi: weight_policy.policy_fsm_step(
            params, cfg, model, pparams, s, pa, q, qd, body, cmds,
            jnp.int32(0), jnp.int32(1), pi))
        for _ in range(4):
            state, tau, prev, pi, m = step(state, prev, pi)
        assert np.isfinite(np.asarray(tau)).all()
        assert np.asarray(m["policy_action"]).shape == (12,)
        # by tick 4 the FSM has entered locomotion and runs
        assert int(state.fsm.state) == 1

    def test_weights_flow_into_mpc(self):
        """Different policy weights must change the MPC solution."""
        params = robots.aliengo_params()
        cfg = ControlConfig(qp=CHEAP_QP)
        state = runner.init_state(params, cfg)
        q = jnp.tile(jnp.array([0.0, 0.8, -1.6]), 4)
        qd = jnp.zeros(12)
        body = jnp.array([0, 0, 0.33, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0],
                         jnp.float32)
        cmds = jnp.array([0.3, 0.0, 0.0])

        def run2(weights):
            s = state
            for _ in range(2):  # second tick solves
                s, tau, m = runner.min_step(params, cfg, s, q, qd, body,
                                            cmds, mpc_weights=weights)
            return np.asarray(m["f_ff"])

        w1 = weight_policy.actions_to_weights(jnp.zeros(12))
        w2 = weight_policy.actions_to_weights(jnp.full(12, 0.9))
        f1, f2 = run2(w1), run2(w2)
        # cheap 5-iteration solver -> small magnitudes; any clear difference
        # proves the weights reach the QP
        assert np.abs(f1 - f2).max() > 0.05
