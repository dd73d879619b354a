"""RL environment: MPC-in-the-loop weight-policy training env, fully
on-device.

Replaces RL_Environment/tasks/{aliengo,a1,go1}.py + vec_task.py: the policy
action is the 12 MPC cost weights (rescaled from [-1,1],
aliengo.py:237-245 / Parameters.py:25-33), the controller runs inside the env
step (the reference's per-env *serial CPU loop*, aliengo.py:252-256, becomes
part of one jitted program), physics is sim.physics, and observations /
rewards / resets port compute_robot_observations / compute_robot_reward
(aliengo.py:357-444).

The env is a pure function pair (reset, step) over EnvState; vmap gives the
vectorized env, shard_map scales it over a mesh.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..control import runner
from ..control.types import ControlConfig, ControlState
from ..models.robots import RobotParams
from ..ops import rotations as rot
from . import physics, randomize as randomize_mod, terrain as terrain_mod

NUM_OBS = 48
NUM_ACTIONS = 12

# action -> MPC weight mapping (Parameters.py:25-33)
MPC_PARAM_SCALE = jnp.array([4, 4, 4, 20, 20, 20, 1, 1, 1, 1, 1, 1],
                            jnp.float32)
MPC_PARAM_CONST = jnp.array([5, 5, 5, 50, 50, 50, 1, 1, 1, 1, 1, 1],
                            jnp.float32)

DEFAULT_DOF_POS = jnp.tile(jnp.array([0.0, 0.8, -1.6], jnp.float32), 4)


NUM_ROBOT_TYPES = 3  # one-hot width for obs_robot_id (models/robots registry)


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """cfg/task/Aliengo.yaml equivalents."""
    episode_length: int = 2000           # 20 s / 0.01 (learn.episodeLength_s)
    command_x_range: tuple = (-2.5, 2.5)
    command_y_range: tuple = (-1.0, 1.0)
    command_yaw_range: tuple = (-2.5, 2.5)
    # command-magnitude curriculum: commands drawn at reset are scaled by
    # ramp(global_tick / curriculum_ticks) from curriculum_start_frac -> 1.
    # 0 disables. (Not in the reference — its fixed +-2.5 m/s draws on
    # rough terrain mean most early episodes end in a fall before PPO can
    # learn anything; the ramp restores a learnable early distribution.)
    command_curriculum_ticks: int = 0
    command_curriculum_start: float = 0.2
    # append a one-hot robot-type vector (params.robot_id) to observations
    # so ONE policy can serve heterogeneous batches without losing to
    # per-robot specialists (the reference trains one task class per robot,
    # tasks/__init__.py). Changes NUM_OBS -> num_obs(cfg).
    obs_robot_id: bool = False
    lin_vel_scale: float = 1.0
    ang_vel_scale: float = 1.0
    dof_pos_scale: float = 1.0
    dof_vel_scale: float = 1.0
    # reward scales (pre-dt, Aliengo.yaml:60-70); multiplied by dt like
    # aliengo.py:80-81
    rew_lin_vel_xy: float = 1.0
    rew_ang_vel_z: float = 0.5
    rew_torque: float = -0.000025
    rew_lin_vel_z: float = -4.0
    rew_ang_vel_xy: float = -0.05
    rew_collision: float = 0.0
    clip_obs: float = 5.0                # clipObservations (Aliengo.yaml:10)
    clip_actions: float = 1.0            # clipActions (Aliengo.yaml:11)
    base_init_height: float = 0.4
    gait_id: int = 0
    control: ControlConfig = ControlConfig()
    physics: physics.PhysicsConfig = physics.PhysicsConfig()
    # domain randomization (vec_task.py:449-705 engine, invoked at :310):
    # per-env friction/mass/damping/contact-stiffness draws applied to the
    # *simulated* physics only — the controller keeps the nominal model, so
    # training sees model mismatch. None disables (nominal draws).
    dr: Optional[randomize_mod.DomainRandomization] = None


class EnvState(NamedTuple):
    phys: physics.PhysState
    ctrl: ControlState
    commands: jnp.ndarray       # (3,)
    actions: jnp.ndarray        # (12,) last policy action
    torques: jnp.ndarray        # (12,) last applied torques
    progress: jnp.ndarray       # () int32
    global_tick: jnp.ndarray    # () int32 — aligned MPC schedule
    rand: dict                  # this env's DR draws {target: value}
    rng: jax.Array


def num_obs(cfg: EnvConfig) -> int:
    """Observation width for this config (NUM_OBS + optional robot one-hot)."""
    return NUM_OBS + (NUM_ROBOT_TYPES if cfg.obs_robot_id else 0)


def _sample_commands(rng, cfg: EnvConfig, global_tick=jnp.int32(0)):
    kx, ky, kw = jax.random.split(rng, 3)
    cmd = jnp.stack([
        jax.random.uniform(kx, (), minval=cfg.command_x_range[0],
                           maxval=cfg.command_x_range[1]),
        jax.random.uniform(ky, (), minval=cfg.command_y_range[0],
                           maxval=cfg.command_y_range[1]),
        jax.random.uniform(kw, (), minval=cfg.command_yaw_range[0],
                           maxval=cfg.command_yaw_range[1]),
    ])
    if cfg.command_curriculum_ticks > 0:
        s0 = cfg.command_curriculum_start
        ramp = s0 + (1.0 - s0) * jnp.clip(
            global_tick / float(cfg.command_curriculum_ticks), 0.0, 1.0)
        cmd = cmd * ramp
    return cmd


def reset(params: RobotParams, cfg: EnvConfig, rng,
          global_tick=jnp.int32(0)) -> EnvState:
    """reset_idx port (aliengo.py:321-349): dof pos scaled by U[0.5,1.5],
    vel U[-0.1,0.1], fresh commands, controller reset.

    The MPC iteration counter restarts aligned with the *global* solve
    schedule so a scalar solve_gate stays valid across resets (design
    deviation: the reference restarts gait phase at 0; here the phase
    restarts at the global tick — equivalent randomization strength).
    """
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    q0 = DEFAULT_DOF_POS * jax.random.uniform(r1, (12,), minval=0.5,
                                              maxval=1.5)
    qd0 = jax.random.uniform(r2, (12,), minval=-0.1, maxval=0.1)
    phys = physics.init_state(params, q0, cfg.base_init_height)
    phys = phys._replace(qd=qd0)
    ctrl = runner.init_state(params, cfg.control)
    ctrl = ctrl._replace(loco=ctrl.loco._replace(
        iteration_counter=jnp.int32(global_tick)))
    if cfg.dr is not None:
        rand = randomize_mod.sample(
            cfg.dr, cfg.physics, params, r4,
            jnp.asarray(global_tick, jnp.int32),
            stream_dims={"obs": num_obs(cfg), "action": NUM_ACTIONS})
    else:
        rand = {}
    return EnvState(
        phys=phys, ctrl=ctrl,
        commands=_sample_commands(r3, cfg, global_tick),
        actions=jnp.zeros(NUM_ACTIONS, jnp.float32),
        torques=jnp.zeros(12, jnp.float32),
        progress=jnp.int32(0),
        global_tick=jnp.asarray(global_tick, jnp.int32),
        rand=rand,
        rng=rng,
    )


def rescale_actions(actions):
    """[-1,1] -> MPC weights (aliengo.py:237-245), +0 gravity placeholder."""
    w = jnp.clip(actions, -1.0, 1.0) * MPC_PARAM_SCALE + MPC_PARAM_CONST
    return jnp.concatenate([w, jnp.zeros(1, jnp.float32)])


def observations(params: RobotParams, cfg: EnvConfig, state: EnvState):
    """compute_robot_observations port (aliengo.py:410-444): 48-dim."""
    ph = state.phys
    r_bw = rot.quat_to_rot(ph.quat)  # world->body
    base_lin_vel = (r_bw @ ph.v) * cfg.lin_vel_scale
    base_ang_vel = (r_bw @ ph.omega) * cfg.ang_vel_scale
    cmd_scaled = state.commands * jnp.array(
        [cfg.lin_vel_scale, cfg.lin_vel_scale, cfg.ang_vel_scale], jnp.float32)
    dof_pos_scaled = (ph.q - DEFAULT_DOF_POS) * cfg.dof_pos_scale
    obs = jnp.concatenate([
        ph.pos, base_lin_vel, base_ang_vel, cmd_scaled, dof_pos_scaled,
        ph.qd * cfg.dof_vel_scale, state.actions])
    obs = jnp.clip(obs, -cfg.clip_obs, cfg.clip_obs)
    if cfg.obs_robot_id:
        # heterogeneous-batch conditioning: which robot am I? (robot_id -1
        # = custom robot -> all-zeros one-hot, still in-distribution-ish)
        onehot = jax.nn.one_hot(params.robot_id, NUM_ROBOT_TYPES,
                                dtype=obs.dtype)
        obs = jnp.concatenate([obs, onehot])
    return obs


def _reward_and_reset(params: RobotParams, cfg: EnvConfig, state: EnvState,
                      knee_contact, base_contact):
    """compute_robot_reward port (aliengo.py:357-407). Scales are
    pre-multiplied by dt (aliengo.py:80-81)."""
    dt = cfg.control.dt
    ph = state.phys
    r_bw = rot.quat_to_rot(ph.quat)
    v_b = r_bw @ ph.v
    w_b = r_bw @ ph.omega
    cmd = state.commands

    lin_err = jnp.sum(jnp.square(cmd[:2] - v_b[:2]))
    ang_err = jnp.square(cmd[2] - w_b[2])
    rew = (jnp.exp(-lin_err / 0.25) * (cfg.rew_lin_vel_xy * dt)
           + jnp.exp(-ang_err / 0.25) * (cfg.rew_ang_vel_z * dt)
           + jnp.square(v_b[2]) * (cfg.rew_lin_vel_z * dt)
           + jnp.sum(jnp.square(w_b[:2])) * (cfg.rew_ang_vel_xy * dt)
           + jnp.sum(jnp.square(state.torques)) * (cfg.rew_torque * dt)
           + jnp.sum(knee_contact) * (cfg.rew_collision * dt))
    rew = jnp.maximum(rew, 0.0)

    fall = base_contact | jnp.any(knee_contact)
    timeout = state.progress > cfg.episode_length
    return rew, fall, timeout


def step(params: RobotParams, cfg: EnvConfig, ter: terrain_mod.Terrain,
         state: EnvState, action,
         solve_gate: Optional[jnp.ndarray] = None,
         weights: Optional[jnp.ndarray] = None):
    """One policy step = one controller tick + physics (vec_task.step
    :298-339 with bridge_MPC_to_RL, aliengo.py:227-263).

    ``weights``: optional raw (13,) MPC weights bypassing the action
    rescale — the A/B eval path (RL_MPC_show.py:73-84) drives one arm with
    ``params.mpc_weights`` directly, which the action box cannot represent
    (e.g. Aliengo's default yaw/roll/pitch weights of 0 sit below the
    [-1,1]->[1,9]/[30,70] rescale floor).

    Returns (new_state, obs, reward, done, info). Auto-reset on done.
    """
    # stream-noise DR (vec_task.py:308-310 randomizes actions before
    # pre_physics; :331-333 randomizes observations after post_physics).
    # Correlated components ride in state.rand; the uncorrelated part is
    # redrawn per step here.
    spec_a = cfg.dr.spec("action.noise") if cfg.dr is not None else None
    spec_o = cfg.dr.spec("obs.noise") if cfg.dr is not None else None
    key_o = None
    if spec_a is not None or spec_o is not None:
        rng, key_a, key_o = jax.random.split(state.rng, 3)
        state = state._replace(rng=rng)
        if spec_a is not None:
            action = randomize_mod.apply_stream(
                spec_a, state.rand["action.noise"], action, key_a,
                state.global_tick)
            action = jnp.clip(action, -cfg.clip_actions, cfg.clip_actions)

    if weights is None:
        weights = rescale_actions(action)
    dof_states = state.phys.q, state.phys.qd
    body_state = physics.root_state_vector(state.phys)

    new_ctrl, torques, ctrl_metrics = runner.min_step(
        params, cfg.control, state.ctrl, dof_states[0], dof_states[1],
        body_state, state.commands, mpc_weights=weights,
        gait_id=cfg.gait_id, solve_gate=solve_gate)

    # randomized physics: the simulator steps with this env's DR draw while
    # the controller above used the nominal model (vec_task.py:310 applies
    # randomization to sim properties, never to the MPC's model)
    phys_cfg = randomize_mod.apply_to_config(cfg.physics, state.rand)
    phys_params = randomize_mod.apply_to_params(params, state.rand)
    new_phys, foot_forces, foot_contact = physics.step(
        phys_params, phys_cfg, ter, state.phys, torques)

    # trunk/knee collision: any contact point below terrain
    pts = physics.body_contact_points(params, new_phys)
    ground = terrain_mod.sample_height(ter, pts[:, :2])
    pen = ground - pts[:, 2]
    base_contact = jnp.any(pen[:4] > 0.0)
    knee_contact = pen[4:] > 0.0

    state = state._replace(
        phys=new_phys, ctrl=new_ctrl, actions=action, torques=torques,
        progress=state.progress + 1, global_tick=state.global_tick + 1)

    # scheduled re-randomization every `frequency` GLOBAL steps (vec_task
    # rand_freq counts sim steps, not episode progress; reset always
    # re-draws via reset() below)
    if cfg.dr is not None and cfg.dr.frequency > 0:
        rng, dr_key = jax.random.split(state.rng)
        redraw = (state.global_tick % cfg.dr.frequency) == 0
        fresh_rand = randomize_mod.sample(
            cfg.dr, cfg.physics, params, dr_key, state.global_tick,
            stream_dims={"obs": num_obs(cfg), "action": NUM_ACTIONS})
        rand = jax.tree.map(lambda f, s: jnp.where(redraw, f, s),
                            fresh_rand, state.rand)
        state = state._replace(rand=rand, rng=rng)

    rew, fall, timeout = _reward_and_reset(params, cfg, state, knee_contact,
                                           base_contact)

    # NaN containment: a physics blowup (rare under aggressive DR draws +
    # penalty contacts) must stay confined to its env — force a reset and
    # zero the reward so one bad env can never poison the PPO update.
    # (The reference leans on PhysX's internal clamping here; the pure-JAX
    # integrator needs the guard to be explicit.)
    finite = jnp.all(jnp.stack([
        jnp.all(jnp.isfinite(state.phys.pos)),
        jnp.all(jnp.isfinite(state.phys.quat)),
        jnp.all(jnp.isfinite(state.phys.v)),
        jnp.all(jnp.isfinite(state.phys.omega)),
        jnp.all(jnp.isfinite(state.phys.q)),
        jnp.all(jnp.isfinite(state.phys.qd)),
    ]))
    rew = jnp.where(finite, rew, 0.0)
    fall = fall | jnp.logical_not(finite)
    done = fall | timeout

    # auto-reset (masked; rng split keeps streams independent)
    rng, rkey = jax.random.split(state.rng)
    state = state._replace(rng=rng)
    fresh = reset(params, cfg, rkey, state.global_tick)
    state = jax.tree.map(lambda f, s: jnp.where(done, f, s), fresh, state)

    obs = observations(params, cfg, state)
    if spec_o is not None:
        obs = randomize_mod.apply_stream(
            spec_o, state.rand["obs.noise"], obs, key_o, state.global_tick)
        obs = jnp.clip(obs, -cfg.clip_obs, cfg.clip_obs)
    # fall vs timeout are distinct terminations: eval survival must count
    # only true falls (an episode-length timeout in a >20 s eval is success,
    # not failure — see rl/evaluate.evaluate).
    info = {"torques": torques, "foot_contact": foot_contact,
            "f_ff": ctrl_metrics["f_ff"], "com_z": ctrl_metrics["com_z"],
            "fall": fall, "timeout": timeout,
            # QP convergence telemetry (0 on non-solve ticks)
            "qp_pri_res": ctrl_metrics["qp_pri_res"],
            "qp_dua_res": ctrl_metrics["qp_dua_res"],
            "qp_diverged": ctrl_metrics["qp_diverged"]}
    return state, obs, rew, done, info
