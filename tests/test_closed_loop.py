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
