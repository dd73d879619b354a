"""Closed-form trace test: the vectorized f32 control step vs the scalar
float64 oracle (tests/reference_oracle.py) over a multi-tick trajectory —
the 'golden trace' strategy SURVEY §4 prescribes (config 1: Aliengo Min-mode
trot, flat ground)."""
import numpy as np
import jax
import jax.numpy as jnp

from rl_mpc_locomotion_tpu.control import runner
from rl_mpc_locomotion_tpu.control.types import ControlConfig
from rl_mpc_locomotion_tpu.models import robots
from rl_mpc_locomotion_tpu.ops.qp import QPConfig

from reference_oracle import OracleController, OracleFSM

# 300+300 iterations: the offline-accuracy config (see tests/test_qp.py)
ACCURATE_QP = QPConfig(iters=300, iters2=300, adaptive_rho=True, polish=True)


def synthetic_trajectory(n_ticks, seed=0):
    """A plausible slowly-varying robot state stream (not a physics sim —
    we are testing the controller as a function of its inputs)."""
    rng = np.random.default_rng(seed)
    base_q = np.tile([0.0, 0.8, -1.6], 4)
    states = []
    for t in range(n_ticks):
        dof_q = base_q + 0.1 * np.sin(0.05 * t + np.arange(12))
        dof_qd = 0.1 * np.cos(0.05 * t + np.arange(12))
        rpy_pert = 0.03 * np.sin(0.02 * t + np.arange(3))
        # quaternion from small rpy (xyzw)
        from scipy.spatial.transform import Rotation
        q_xyzw = Rotation.from_euler("xyz", rpy_pert).as_quat()
        body = np.concatenate([
            [0.01 * t, 0.0, 0.33 + 0.01 * np.sin(0.1 * t)],
            q_xyzw,
            [0.3 + 0.05 * np.sin(0.1 * t), 0.02 * np.cos(0.1 * t), 0.0],
            [0.01, -0.01, 0.05 * np.sin(0.05 * t)],
        ])
        states.append((dof_q.astype(np.float32), dof_qd.astype(np.float32),
                       body.astype(np.float32)))
    return states


class TestControlTraceParity:
    def test_min_mode_trot_flat(self):
        n_ticks = 12
        commands = np.array([0.4, 0.1, 0.2], np.float32)
        traj = synthetic_trajectory(n_ticks)

        oracle = OracleController()
        oracle_taus = [oracle.run(q.astype(float), qd.astype(float),
                                  b.astype(float), commands.astype(float))
                       for q, qd, b in traj]

        params = robots.aliengo_params()
        cfg = ControlConfig(qp=ACCURATE_QP, flat_ground=True)
        state = runner.init_state(params, cfg)
        step = jax.jit(lambda s, q, qd, b: runner.min_step(
            params, cfg, s, q, qd, b, jnp.array(commands)))
        ours = []
        for q, qd, b in traj:
            state, tau, metrics = step(state, jnp.array(q), jnp.array(qd),
                                       jnp.array(b))
            ours.append(np.asarray(tau))

        for t, (got, want) in enumerate(zip(ours, oracle_taus)):
            scale = max(1.0, np.abs(want).max())
            err = np.abs(got - want).max()
            assert err / scale < 5e-4, (
                f"tick {t}: torque err {err:.4f} (scale {scale:.1f})\n"
                f"got  {got.round(3)}\nwant {want.round(3)}")

    def test_min_mode_bound_walk_gaits(self):
        """Trace parity for bound (gait 1) and walk (gait 6) — the oracle
        gait engine is parameterized by the ConvexMPCLocomotion.py:30-56
        offset/duration tables, matching ops/gait.py rows."""
        import pytest  # noqa: F401  (kept local; table-driven loop below)
        cases = [
            (1, (5, 5, 0, 0), (4, 4, 4, 4)),   # bounding
            (6, (0, 3, 5, 8), (5, 5, 5, 5)),   # walking
        ]
        n_ticks = 12
        commands = np.array([0.3, 0.0, 0.1], np.float32)
        traj = synthetic_trajectory(n_ticks, seed=9)
        params = robots.aliengo_params()
        cfg = ControlConfig(qp=ACCURATE_QP, flat_ground=True)
        for gait_id, offs, durs in cases:
            oracle = OracleController(gait=(offs, durs))
            oracle_taus = [oracle.run(q.astype(float), qd.astype(float),
                                      b.astype(float), commands.astype(float))
                           for q, qd, b in traj]
            state = runner.init_state(params, cfg)
            step = jax.jit(lambda s, q, qd, b: runner.min_step(
                params, cfg, s, q, qd, b, jnp.array(commands),
                gait_id=gait_id))
            for t, (q, qd, b) in enumerate(traj):
                state, tau, _ = step(state, jnp.array(q), jnp.array(qd),
                                     jnp.array(b))
                want = oracle_taus[t]
                scale = max(1.0, np.abs(want).max())
                err = np.abs(np.asarray(tau) - want).max()
                assert err / scale < 5e-4, (
                    f"gait {gait_id} tick {t}: err {err:.4f}\n"
                    f"got  {np.asarray(tau).round(3)}\nwant {want.round(3)}")

    def test_min_mode_nonflat_ground_normal(self):
        """Trace parity for flat_ground=False: the contact-history plane-fit
        normal (StateEstimator.py:120-144) and the slope-aware gravity
        column (mpc_osqp.cc:299-322). The synthetic trajectory's per-leg
        joint perturbations make the fitted normal deviate from vertical,
        so this genuinely exercises the non-flat path."""
        n_ticks = 12
        commands = np.array([0.4, 0.0, 0.0], np.float32)
        traj = synthetic_trajectory(n_ticks, seed=21)
        oracle = OracleController(flat_ground=False)
        oracle_taus = [oracle.run(q.astype(float), qd.astype(float),
                                  b.astype(float), commands.astype(float))
                       for q, qd, b in traj]
        # sanity: the oracle's estimated normal must have moved off vertical
        assert abs(oracle.ground_normal_yaw[0]) + \
            abs(oracle.ground_normal_yaw[1]) > 1e-4

        params = robots.aliengo_params()
        cfg = ControlConfig(qp=ACCURATE_QP, flat_ground=False)
        state = runner.init_state(params, cfg)
        step = jax.jit(lambda s, q, qd, b: runner.min_step(
            params, cfg, s, q, qd, b, jnp.array(commands)))
        for t, (q, qd, b) in enumerate(traj):
            state, tau, _ = step(state, jnp.array(q), jnp.array(qd),
                                 jnp.array(b))
            want = oracle_taus[t]
            scale = max(1.0, np.abs(want).max())
            err = np.abs(np.asarray(tau) - want).max()
            assert err / scale < 5e-4, (
                f"tick {t}: err {err:.4f}\n"
                f"got  {np.asarray(tau).round(3)}\nwant {want.round(3)}")
        # and the JAX estimator's normal agrees with the oracle's
        np.testing.assert_allclose(np.asarray(state.est.ground_normal_yaw),
                                   oracle.ground_normal_yaw, atol=1e-4)

    def test_grf_parity_single_solve(self):
        """GRF (f_ff) comparison right after the first MPC solve — the
        BASELINE '<1e-3 GRF deviation' criterion on identical inputs."""
        commands = np.array([0.5, 0.0, 0.0], np.float32)
        traj = synthetic_trajectory(4, seed=3)
        oracle = OracleController()
        params = robots.aliengo_params()
        cfg = ControlConfig(qp=ACCURATE_QP, flat_ground=True)
        state = runner.init_state(params, cfg)
        step = jax.jit(lambda s, q, qd, b: runner.min_step(
            params, cfg, s, q, qd, b, jnp.array(commands)))
        for t, (q, qd, b) in enumerate(traj):
            oracle.run(q.astype(float), qd.astype(float), b.astype(float),
                       commands.astype(float))
            state, tau, metrics = step(state, jnp.array(q), jnp.array(qd),
                                       jnp.array(b))
            if t == 1:  # first solve tick (counter 2 % 2 == 0)
                got = np.asarray(metrics["f_ff"])
                want = oracle.f_ff
                scale = max(1.0, np.abs(want).max())
                # north star (BASELINE) is <1e-3; measured 1.5e-5 at 300
                # iters — hold 1e-4
                assert np.abs(got - want).max() / scale < 1e-4, (
                    f"GRF mismatch:\n{got}\nvs\n{want}")

    def test_qp_divergence_fallback(self):
        """A solve flagged as diverged (primal violation > tol) must hold the
        previous f_ff and cold-start the solver state — the SURVEY §5
        fallback for mpc_osqp.cc:791-794's unhandled empty-vector case."""
        commands = np.array([0.5, 0.0, 0.0], np.float32)
        traj = synthetic_trajectory(4, seed=5)
        params = robots.aliengo_params()
        qp = QPConfig(iters=30, iters2=0, adaptive_rho=False, polish=False)

        def run(tol):
            cfg = ControlConfig(qp=qp, flat_ground=True,
                                qp_divergence_tol=tol)
            state = runner.init_state(params, cfg)
            step = jax.jit(lambda s, q, qd, b: runner.min_step(
                params, cfg, s, q, qd, b, jnp.array(commands)))
            mets = []
            for q, qd, b in traj:
                state, tau, metrics = step(state, jnp.array(q),
                                           jnp.array(qd), jnp.array(b))
                mets.append(metrics)
            return state, mets

        # tol = -1: every solve "diverges" -> f_ff pinned at its init (zeros)
        # and warm-start stays cold
        state, mets = run(-1.0)
        assert bool(np.asarray(mets[1]["qp_diverged"]))
        np.testing.assert_allclose(np.asarray(state.loco.f_ff), 0.0)
        np.testing.assert_allclose(np.asarray(state.loco.qp_state.x), 0.0)
        # generous tol: solves commit normally
        state, mets = run(1e6)
        assert not bool(np.asarray(mets[1]["qp_diverged"]))
        assert np.abs(np.asarray(state.loco.f_ff)).max() > 1.0

    def test_fsm_mode_trace(self):
        """FSM-mode trace parity vs the scalar OracleFSM: initial-recovery
        onEnter tick, StandUp ramp, the 2-tick transition protocol into
        LOCOMOTION, locomotion ticks with MPC solves, an injected >40 deg
        roll tripping the safety gate into RECOVERY_STAND, and the
        recovery re-entry ramp (ControlFSM.runFSM :78-138 semantics)."""
        from scipy.spatial.transform import Rotation

        params = robots.aliengo_params()
        cfg = ControlConfig(qp=ACCURATE_QP, flat_ground=True)
        oracle = OracleFSM()
        state = runner.init_state(params, cfg)
        passive_iter = jnp.int32(0)
        commands = np.array([0.3, 0.0, 0.0], np.float32)
        traj = synthetic_trajectory(40, seed=13)

        step = jax.jit(lambda s, pi, q, qd, b, mode: runner.fsm_step(
            params, cfg, s, pi, q, qd, b, jnp.array(commands),
            control_mode=mode))

        # schedule: recovery (ticks 0-9), request locomotion (10-24),
        # roll injection at tick 25 while still requesting locomotion,
        # then recovery hold (26-39)
        for t, (q, qd, b) in enumerate(traj):
            mode = 2 if t < 10 else (1 if t < 26 else 2)
            if t == 25:  # inject an unsafe roll > 40 deg
                b = b.copy()
                b[3:7] = Rotation.from_euler("xyz", [0.8, 0.0, 0.0]
                                             ).as_quat().astype(np.float32)
            want = oracle.run(q.astype(float), qd.astype(float),
                              b.astype(float), commands.astype(float), mode)
            state, tau, passive_iter, metrics = step(
                state, passive_iter, jnp.array(q), jnp.array(qd),
                jnp.array(b), mode)
            got = np.asarray(tau)
            scale = max(1.0, np.abs(want).max())
            err = np.abs(got - want).max()
            assert err / scale < 5e-4, (
                f"tick {t} (mode {mode}, oracle state {oracle.state}): "
                f"err {err:.4f}\ngot  {got.round(3)}\nwant {want.round(3)}")
        # both sides latched the unsafe flag and ended in recovery
        assert oracle.unsafe
        assert bool(np.asarray(state.fsm.locomotion_unsafe))
        assert int(np.asarray(state.fsm.state)) == 2 == oracle.state

    def test_batch_heterogeneous_robots(self):
        """A1+Go1+Aliengo in one vmapped batch (BASELINE config 3)."""
        registry = robots.robot_registry()
        ids = jnp.array([0, 1, 2, 0], jnp.int32)
        cfg = ControlConfig(qp=QPConfig(iters=20, iters2=0,
                                        adaptive_rho=False, polish=False,
                                        ruiz_iters=2))

        def one(rid):
            p = robots.select_robot(registry, rid)
            return runner.init_state(p, cfg)

        states = jax.vmap(one)(ids)
        q = jnp.tile(jnp.array([0.0, 0.8, -1.6], jnp.float32), (4, 4)
                     ).reshape(4, 12)
        qd = jnp.zeros((4, 12), jnp.float32)
        body = jnp.tile(jnp.array([0, 0, 0.3, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0],
                                  jnp.float32), (4, 1))
        cmds = jnp.tile(jnp.array([0.3, 0.0, 0.0], jnp.float32), (4, 1))

        @jax.jit
        def step(states):
            def one_step(rid, s, q1, qd1, b1, c1):
                p = robots.select_robot(registry, rid)
                return runner.min_step(p, cfg, s, q1, qd1, b1, c1)
            return jax.vmap(one_step)(ids, states, q, qd, body, cmds)

        for _ in range(4):
            states, taus, metrics = step(states)
        taus = np.asarray(taus)
        assert taus.shape == (4, 12)
        assert not np.any(np.isnan(taus))
        # robots 0 and 3 are both Aliengo with identical inputs -> identical
        np.testing.assert_allclose(taus[0], taus[3], atol=1e-5)
        # different robots produce different torques
        assert np.abs(taus[0] - taus[1]).max() > 0.1
