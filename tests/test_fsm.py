"""FSM-as-data tests: transition protocol, recovery-stand ramps, passive
state, safety triggering — against the reference semantics
(ControlFSM.py:78-138, FSM_State_RecoveryStand.py, FSM_State_Passive.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from rl_mpc_locomotion_tpu.control import fsm as fsm_mod
from rl_mpc_locomotion_tpu.control import leg_controller, state_estimator
from rl_mpc_locomotion_tpu.control import runner
from rl_mpc_locomotion_tpu.control.types import ControlConfig
from rl_mpc_locomotion_tpu.models import robots
from rl_mpc_locomotion_tpu.ops.qp import QPConfig

CHEAP_QP = QPConfig(iters=5, iters2=0, adaptive_rho=False, polish=False,
                    ruiz_iters=1)


def make_inputs(height=0.35, upside_down=False, roll=0.0):
    q = np.tile([0.0, 0.8, -1.6], 4).astype(np.float32)
    qd = np.zeros(12, np.float32)
    if upside_down:
        quat = [1.0, 0.0, 0.0, 0.0]  # xyzw: 180deg about x
        body = np.array([0, 0, height] + quat + [0] * 6, np.float32)
    else:
        from scipy.spatial.transform import Rotation
        qx = Rotation.from_euler("x", roll).as_quat()
        body = np.array([0, 0, height] + list(qx) + [0] * 6, np.float32)
    return q, qd, body


class FSMHarness:
    def __init__(self, fsm_initial=2, cfg=None):
        self.params = robots.aliengo_params()
        self.cfg = cfg or ControlConfig(qp=CHEAP_QP)
        self.state = runner.init_state(self.params, self.cfg,
                                       fsm_initial=fsm_initial)
        self.passive_iter = jnp.int32(0)
        params, cfg = self.params, self.cfg

        @jax.jit
        def step(state, passive_iter, q, qd, body, control_mode):
            leg_data = leg_controller.update_data(params, q, qd)
            se = state_estimator.update(state.est, body)
            weights = params.mpc_weights
            new_state, cmds, passive_iter, metrics = fsm_mod.fsm_step(
                params, cfg, state, se, leg_data,
                jnp.zeros(3, jnp.float32), weights, jnp.int32(0),
                jnp.asarray(control_mode, jnp.int32), passive_iter)
            tau = leg_controller.compute_torques(cmds, leg_data)
            return new_state, passive_iter, tau, metrics

        self._step = step

    def step(self, q, qd, body, control_mode):
        self.state, self.passive_iter, tau, metrics = self._step(
            self.state, self.passive_iter, jnp.array(q), jnp.array(qd),
            jnp.array(body), control_mode)
        return np.asarray(tau), metrics

    @property
    def fsm_state(self):
        return int(self.state.fsm.state)


class TestTransitions:
    def test_recovery_to_locomotion_two_tick_protocol(self):
        h = FSMHarness(fsm_initial=fsm_mod.RECOVERY_STAND)
        q, qd, body = make_inputs()
        # run recovery a few ticks
        for _ in range(3):
            tau, _ = h.step(q, qd, body, fsm_mod.RECOVERY_STAND)
        assert h.fsm_state == fsm_mod.RECOVERY_STAND
        # request locomotion: detection tick (zero torque)
        tau1, _ = h.step(q, qd, body, fsm_mod.LOCOMOTION)
        np.testing.assert_allclose(tau1, 0.0, atol=1e-6)
        assert h.fsm_state == fsm_mod.RECOVERY_STAND  # not switched yet
        # transitioning tick (zero torque, switch completes)
        tau2, _ = h.step(q, qd, body, fsm_mod.LOCOMOTION)
        np.testing.assert_allclose(tau2, 0.0, atol=1e-6)
        assert h.fsm_state == fsm_mod.LOCOMOTION
        # now locomotion runs
        tau3, m = h.step(q, qd, body, fsm_mod.LOCOMOTION)
        assert np.abs(tau3).max() > 0.01

    def test_passive_rejects_locomotion_request(self):
        h = FSMHarness(fsm_initial=fsm_mod.PASSIVE)
        q, qd, body = make_inputs()
        for _ in range(3):
            h.step(q, qd, body, fsm_mod.LOCOMOTION)
        # passive cannot go directly to locomotion (FSM_State_Passive:63-74)
        assert h.fsm_state == fsm_mod.PASSIVE

    def test_passive_to_recovery_allowed(self):
        h = FSMHarness(fsm_initial=fsm_mod.PASSIVE)
        q, qd, body = make_inputs()
        for _ in range(3):
            h.step(q, qd, body, fsm_mod.RECOVERY_STAND)
        assert h.fsm_state == fsm_mod.RECOVERY_STAND


class TestPassive:
    def test_small_pd_first_10_ticks_then_zero(self):
        h = FSMHarness(fsm_initial=fsm_mod.PASSIVE)
        q, qd, body = make_inputs()
        h.step(q, qd, body, fsm_mod.PASSIVE)  # onEnter tick (zero command)
        taus = [h.step(q, qd, body, fsm_mod.PASSIVE)[0] for _ in range(14)]
        # first ticks: small PD toward [0, 0.01, 0.01]
        assert np.abs(taus[0]).max() > 1.0
        # after 10 passive iterations: zero torque
        np.testing.assert_allclose(taus[-1], 0.0, atol=1e-6)


class TestRecoveryStand:
    def test_standup_ramp_converges_to_stand_pose(self):
        h = FSMHarness(fsm_initial=fsm_mod.RECOVERY_STAND)
        # initial q far from stand pose, healthy height -> StandUp branch
        q = np.tile([0.3, 1.1, -2.0], 4).astype(np.float32)
        qd = np.zeros(12, np.float32)
        _, _, body = make_inputs(height=0.3)
        # onEnter happens via init default; flag should interpolate toward
        # stand_jpos: torques should pull q toward [0, .8, -1.6]
        tau, _ = h.step(q, qd, body, fsm_mod.RECOVERY_STAND)
        # direction check: kp*(qdes - q): hip (idx1) qdes ramps from 1.1
        # toward 0.8 -> negative torque on hip joints eventually
        for _ in range(40):
            tau, _ = h.step(q, qd, body, fsm_mod.RECOVERY_STAND)
        q_des_implied = q + tau.reshape(4, 3).reshape(12) / 80.0
        np.testing.assert_allclose(q_des_implied.reshape(4, 3),
                                   np.tile([0, 0.8, -1.6], (4, 1)), atol=0.02)

    def test_fold_legs_when_upside_down(self):
        # NOTE: the onEnter height check reads the *estimator's* com_z (the
        # reference's StateEstimate.position[2]), which is body_height until
        # locomotion has run — so a "low" physical body doesn't trigger
        # FoldLegs; upside-down (rBody[2,2]<0) does.
        h = FSMHarness(fsm_initial=fsm_mod.RECOVERY_STAND)
        q, qd, body = make_inputs(upside_down=True)
        for _ in range(60):
            tau, _ = h.step(q, qd, body, fsm_mod.RECOVERY_STAND)
        q_des_implied = (q + tau / 80.0).reshape(4, 3)
        np.testing.assert_allclose(np.abs(q_des_implied[:, 1]), 1.4, atol=0.05)


class TestSafety:
    def test_unsafe_roll_forces_recovery(self):
        h = FSMHarness(fsm_initial=fsm_mod.RECOVERY_STAND)
        q, qd, body = make_inputs()
        # get into locomotion
        for _ in range(4):
            h.step(q, qd, body, fsm_mod.LOCOMOTION)
        assert h.fsm_state == fsm_mod.LOCOMOTION
        # now feed an unsafe roll (> 40 deg positive; reference quirk: only
        # positive direction triggers)
        _, _, bad_body = make_inputs(roll=0.9)
        h.step(q, qd, bad_body, fsm_mod.LOCOMOTION)
        h.step(q, qd, bad_body, fsm_mod.LOCOMOTION)
        assert h.fsm_state == fsm_mod.RECOVERY_STAND
        assert bool(h.state.fsm.locomotion_unsafe)

    def test_negative_roll_does_not_trigger(self):
        h = FSMHarness(fsm_initial=fsm_mod.RECOVERY_STAND)
        q, qd, body = make_inputs()
        for _ in range(4):
            h.step(q, qd, body, fsm_mod.LOCOMOTION)
        _, _, neg_body = make_inputs(roll=-0.9)
        h.step(q, qd, neg_body, fsm_mod.LOCOMOTION)
        h.step(q, qd, neg_body, fsm_mod.LOCOMOTION)
        # reference fabs-of-bool quirk: negative roll stays in locomotion
        assert h.fsm_state == fsm_mod.LOCOMOTION
