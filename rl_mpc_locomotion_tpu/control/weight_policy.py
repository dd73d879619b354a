"""Weight-policy inference for deployment (Policy mode).

Port of RL_Environment/WeightPolicy.py + robot_runner/RobotRunnerPolicy.py:
a trained actor-critic predicts the 12 MPC cost weights online from a 48-dim
observation assembled from the state estimate; the weights feed the MPC via
DesiredStateCommand (weights + [0] gravity placeholder).

Obs layout: the DEPLOYMENT path builds observations identical to the
TRAINING env's (sim/env.observations: base pos, body-frame velocities,
commands, dof offsets from stand pose, dof velocities, prev action) so a
trained checkpoint stays in-distribution. NOTE a deliberate fix over the
reference: its WeightPolicy.compute_observations (:125-145) assembles a
DIFFERENT layout than its training env (aliengo.py:410-444 — base_pos and
dof−default vs projected-gravity and raw dof), so its trained policy is
out-of-distribution at deployment. The reference layout is kept here as
``compute_observations`` for parity documentation.

Action mapping (:111-123 / Parameters.py:25-33):
  clip to [-1,1] -> scale * a + const.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models.actor_critic import ActorCritic
from ..models.robots import RobotParams
from ..ops import rotations as rot
from .types import ControlConfig, ControlState, StateEstimate
from . import fsm as fsm_mod
from . import leg_controller, state_estimator

# stand pose — must equal sim/env.DEFAULT_DOF_POS (obs parity); duplicated
# here because sim imports control (no back-edge)
STAND_DOF_POS = jnp.tile(jnp.array([0.0, 0.8, -1.6], jnp.float32), 4)

MPC_PARAM_SCALE = jnp.array([4, 4, 4, 20, 20, 20, 1, 1, 1, 1, 1, 1],
                            jnp.float32)
MPC_PARAM_CONST = jnp.array([5, 5, 5, 50, 50, 50, 1, 1, 1, 1, 1, 1],
                            jnp.float32)


class PolicyScales(NamedTuple):
    lin_vel: float = 1.0
    ang_vel: float = 1.0
    dof_pos: float = 1.0
    dof_vel: float = 1.0


def compute_observations(se: StateEstimate, dof_q, dof_qd, commands,
                         prev_action, scales: PolicyScales = PolicyScales()):
    """48-dim deployment observation (WeightPolicy.py:125-145).

    Projected gravity is -ground_normal_yaw, as the reference does."""
    cmd_scaled = commands * jnp.array(
        [scales.lin_vel, scales.lin_vel, scales.ang_vel], jnp.float32)
    return jnp.concatenate([
        se.v_body * scales.lin_vel,
        se.omega_body * scales.ang_vel,
        -se.ground_normal_yaw,
        cmd_scaled,
        dof_q * scales.dof_pos,
        dof_qd * scales.dof_vel,
        prev_action,
    ])


def compute_observations_train_parity(body_state, dof_q, dof_qd, commands,
                                      prev_action,
                                      scales: PolicyScales = PolicyScales(),
                                      clip_obs: float = 5.0):
    """48-dim observation in the TRAINING layout (sim/env.observations):
    [base pos(3), v_body(3), omega_body(3), commands(3),
     dof_pos - stand(12), dof_vel(12), prev_action(12)], clipped.

    body_state: (13,) [pos, quat xyzw, linvel, angvel] (root-state layout).
    """
    quat = jnp.stack([body_state[6], body_state[3], body_state[4],
                      body_state[5]])
    r_bw = rot.quat_to_rot(quat)
    lin = (r_bw @ body_state[7:10]) * scales.lin_vel
    ang = (r_bw @ body_state[10:13]) * scales.ang_vel
    cmd_scaled = commands * jnp.array(
        [scales.lin_vel, scales.lin_vel, scales.ang_vel], jnp.float32)
    obs = jnp.concatenate([
        body_state[0:3], lin, ang, cmd_scaled,
        (dof_q - STAND_DOF_POS) * scales.dof_pos,
        dof_qd * scales.dof_vel, prev_action])
    return jnp.clip(obs, -clip_obs, clip_obs)


def actions_to_weights(action):
    """clip + rescale to 12 MPC weights, append 0 gravity placeholder
    (WeightPolicy.py:105-123, DesiredStateCommand.py:17-22)."""
    a = jnp.clip(action, -1.0, 1.0)
    w = a * MPC_PARAM_SCALE + MPC_PARAM_CONST
    return jnp.concatenate([w, jnp.zeros(1, jnp.float32)])


def policy_step(model: ActorCritic, policy_params, body_state,
                dof_q, dof_qd, commands, prev_action,
                scales: PolicyScales = PolicyScales()):
    """Deterministic inference -> (weights (13,), raw action (12,)).

    Uses training-layout observations (see module docstring)."""
    obs = compute_observations_train_parity(body_state, dof_q, dof_qd,
                                            commands, prev_action, scales)
    mean, _, _ = model.apply(policy_params, obs)
    return actions_to_weights(mean), mean


def policy_fsm_step(params: RobotParams, cfg: ControlConfig,
                    model: ActorCritic, policy_params, state: ControlState,
                    prev_action, dof_q, dof_qd, body_state, commands,
                    gait_id, control_mode, passive_iter,
                    solve_gate: Optional[jnp.ndarray] = None):
    """One Policy-mode tick: FSM + NN weight inference
    (RobotRunnerPolicy.run :62-96).

    Returns (new_state, torques, new_prev_action, new_passive_iter, metrics).
    """
    leg_data = leg_controller.update_data(params, dof_q, dof_qd)
    se = state_estimator.update(state.est, body_state)
    weights, action = policy_step(model, policy_params, body_state, dof_q,
                                  dof_qd, commands, prev_action)
    new_state, cmds, passive_iter, metrics = fsm_mod.fsm_step(
        params, cfg, state, se, leg_data, commands, weights, gait_id,
        control_mode, passive_iter, solve_gate)
    torques = leg_controller.compute_torques(cmds, leg_data)
    metrics["policy_action"] = action
    return new_state, torques, action, passive_iter, metrics


class WeightPolicy:
    """Checkpoint-loading convenience wrapper for the play CLI
    (WeightPolicy.__init__ :35-92 equivalent, orbax instead of torch)."""

    def __init__(self, checkpoint: Optional[str] = None,
                 hidden=(512, 256, 128), num_obs: int = 48):
        """``num_obs``: observation width the checkpoint was trained with
        (48, or 48+3 for robot-one-hot conditioned heterogeneous policies —
        sim/env.num_obs)."""
        self.model = ActorCritic(num_actions=12, hidden=hidden)
        self.num_obs = num_obs
        rng = jax.random.PRNGKey(0)
        self.params = self.model.init(rng, jnp.zeros((1, num_obs)))
        if checkpoint:
            from ..utils.checkpoint import (latest_checkpoint,
                                            restore_checkpoint)
            import os
            path = checkpoint
            if os.path.isdir(checkpoint):
                found = latest_checkpoint(checkpoint)
                if found:
                    path = found
            try:
                from ..rl.ppo import PPOConfig, init_train_state
                ts = init_train_state(rng, self.model, num_obs, PPOConfig())
                ts = restore_checkpoint(path, ts)
                self.params = ts.params
            except Exception as exc:  # latest-run fallback failed too
                print(f"[WeightPolicy] checkpoint load failed ({exc}); "
                      "using random init")

    def step_batch(self, pstate, cstate, commands, prev_action=None):
        """(B,) physics+control states -> ((B, 13) weights, (B, 12) action).

        prev_action is the previous tick's raw action (B, 12) — training obs
        include it (sim/env.py EnvState.actions), so deployment must feed the
        true value, not zeros, for the policy to stay in-distribution."""
        from ..sim import physics

        if prev_action is None:
            batch = pstate.q.shape[0]
            prev_action = jnp.zeros((batch, 12), jnp.float32)

        def one(ps, cs, pa):
            body = physics.root_state_vector(ps)
            return policy_step(self.model, self.params, body, ps.q, ps.qd,
                               commands, pa)

        return jax.vmap(one)(pstate, cstate, prev_action)
