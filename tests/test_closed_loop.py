"""Closed-loop walking regression: controller + physics, full product path.

Locks the behavior previously only verified via the play CLI / examples
(VERDICT round 1): each robot steps the Min-mode controller against the
JAX physics for 3 simulated seconds on flat ground and must stay upright
and make forward progress. Mirrors the reference's interactive
MPC_terrain_show.py check (its only multi-robot integration test), but as
an assert-based CI test.

One jitted rollout is shared by all robots: RobotParams is a pytree of
arrays, so it is passed as a traced argument (heterogeneous-robot support
is a design requirement — SURVEY §7 'robot constants become vmappable
arrays').
"""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rl_mpc_locomotion_tpu.control import runner
from rl_mpc_locomotion_tpu.control.types import ControlConfig
from rl_mpc_locomotion_tpu.models import robots
from rl_mpc_locomotion_tpu.ops import rotations as rot
from rl_mpc_locomotion_tpu.sim import physics, terrain

CFG = ControlConfig()
PCFG = physics.PhysicsConfig()
TICKS = 300  # 3 s at 100 Hz
Q0 = jnp.tile(jnp.array([0.0, 0.8, -1.6], jnp.float32), 4)


@functools.cache
def _rollout_fn():
    ter = terrain.flat()

    @jax.jit
    def rollout(params, commands, init_h):
        pstate = physics.init_state(params, Q0, init_h)
        cstate = runner.init_state(params, CFG)

        def tick(carry, _):
            ps, cs = carry
            body = physics.root_state_vector(ps)
            cs, tau, _ = runner.min_step(params, CFG, cs, ps.q, ps.qd,
                                         body, commands)
            ps, _, _ = physics.step(params, PCFG, ter, ps, tau)
            rpy_mag = jnp.max(jnp.abs(rot.quat_to_rpy(ps.quat)[:2]))
            return (ps, cs), (ps.pos[2], rpy_mag)

        (pstate, _), (zs, rpys) = jax.lax.scan(tick, (pstate, cstate),
                                               None, length=TICKS)
        return pstate.pos, zs, rpys

    return rollout


CASES = [
    # (params_fn, vx, min_x_at_3s)
    ("aliengo", robots.aliengo_params, 0.5, 1.0),
    ("go1", robots.go1_params, 0.4, 0.5),
    ("a1", robots.a1_params, 0.4, 0.5),
]


@functools.cache
def _rollout_nonflat_fn():
    """Non-flat rollout: flat_ground=False runs the least-squares
    plane-fit ground estimator IN the loop (slope-aware MPC gravity,
    StateEstimator.py:120-144 / mpc_osqp.cc:299-322) — the reference's
    main integration demo path (test/MPC_terrain_show.py:26-37). Terrain
    is a traced pytree arg so slope and stairs share one compile."""
    cfg = ControlConfig(flat_ground=False)

    @jax.jit
    def rollout(params, ter, commands, start_x, init_h):
        pstate = physics.init_state(params, Q0, init_h)
        pstate = pstate._replace(pos=pstate.pos.at[0].set(start_x))
        cstate = runner.init_state(params, cfg)

        def tick(carry, _):
            ps, cs = carry
            body = physics.root_state_vector(ps)
            cs, tau, m = runner.min_step(params, cfg, cs, ps.q, ps.qd,
                                         body, commands)
            ps, _, _ = physics.step(params, PCFG, ter, ps, tau)
            ground = terrain.sample_height(ter, ps.pos[:2])
            rpy_mag = jnp.max(jnp.abs(rot.quat_to_rpy(ps.quat)[:2]))
            return (ps, cs), (ps.pos[2] - ground, rpy_mag, m["com_z"],
                              cs.est.ground_normal_yaw[0])

        (pstate, _), (clearance, rpys, com_z_est, normal_x) = jax.lax.scan(
            tick, (pstate, cstate), None, length=TICKS)
        return pstate.pos, clearance, rpys, com_z_est, normal_x

    return rollout


NONFLAT_CASES = [
    # (terrain_fn, vx, start_x, min_dx): spawn just before the feature at
    # x=2.0 so the robot actually climbs it during the rollout
    ("slope", terrain.slope_platform, 0.5, 1.5, 1.0),
    ("stairs", terrain.stairs, 0.4, 1.5, 0.8),
]


@pytest.mark.parametrize("name,ter_fn,vx,start_x,min_dx", NONFLAT_CASES,
                         ids=[c[0] for c in NONFLAT_CASES])
def test_walks_nonflat_with_ground_estimator(name, ter_fn, vx, start_x,
                                             min_dx):
    params = robots.aliengo_params()
    ter = ter_fn()
    commands = jnp.array([vx, 0.0, 0.0], jnp.float32)
    init_h = params.body_height + 0.03
    pos, clearance, rpys, com_z_est, normal_x = jax.block_until_ready(
        _rollout_nonflat_fn()(params, ter, commands,
                              jnp.float32(start_x), init_h))
    pos = np.asarray(pos)
    clearance = np.asarray(clearance)
    rpys = np.asarray(rpys)
    com_z_est = np.asarray(com_z_est)
    normal_x = np.asarray(normal_x)

    h = float(params.body_height)
    assert np.all(np.isfinite(clearance)) and np.all(np.isfinite(pos))
    assert np.all(np.isfinite(com_z_est))
    # upright relative to the LOCAL ground the whole climb
    assert clearance.min() > 0.6 * h, (
        f"{name} fell: min clearance {clearance.min():.3f}")
    assert clearance.max() < 1.4 * h + 0.05, (
        f"{name} flew: max clearance {clearance.max():.3f}")
    assert rpys.max() < 0.45, (
        f"{name} tipped: max |roll,pitch| {rpys.max():.2f}")
    # made it onto the feature
    dx = pos[0] - start_x
    assert dx >= min_dx, f"{name} advanced only {dx:.2f} m"
    assert pos[0] > 2.0, f"{name} never reached the feature at x=2"
    # the estimator saw the terrain: com_z (height above the FITTED stance
    # plane) stays near nominal all the way up — that is the slope-aware
    # path working; world z meanwhile rose with the ground (clearance
    # bounds above) — and the fitted ground normal tilted against the +x
    # grade (0.2 for both features -> normal_x ~ -0.2 once on it)
    assert abs(com_z_est[-10:].mean() - h) < 0.12, (
        f"{name} com_z estimate off nominal: {com_z_est[-10:].mean():.3f}")
    assert normal_x[-30:].mean() < -0.08, (
        f"{name} ground normal never tilted: {normal_x[-30:].mean():.3f}")


@pytest.mark.parametrize("name,params_fn,vx,min_x", CASES,
                         ids=[c[0] for c in CASES])
def test_walks_upright_and_advances(name, params_fn, vx, min_x):
    params = params_fn()
    commands = jnp.array([vx, 0.0, 0.0], jnp.float32)
    init_h = params.body_height + 0.03
    pos, zs, rpys = jax.block_until_ready(
        _rollout_fn()(params, commands, init_h))
    pos, zs, rpys = np.asarray(pos), np.asarray(zs), np.asarray(rpys)

    h = float(params.body_height)
    # upright the whole time: base height within +-35% of the nominal
    # standing height, roll/pitch under ~23 degrees
    assert np.all(np.isfinite(zs)) and np.all(np.isfinite(pos))
    assert zs.min() > 0.65 * h, f"{name} fell: min z {zs.min():.3f}"
    assert zs.max() < 1.35 * h + 0.05, f"{name} flew: max z {zs.max():.3f}"
    assert rpys.max() < 0.4, f"{name} tipped: max |roll,pitch| {rpys.max():.2f}"
    # forward progress at the commanded heading
    assert pos[0] >= min_x, f"{name} advanced only {pos[0]:.2f} m"
    assert abs(pos[1]) < 0.2, f"{name} drifted sideways {pos[1]:.2f} m"
