"""Scalar solve-gate equivalence: gating the QP by a batch-level scalar
(lax.cond skips the whole solve) must be bit-for-bit equivalent to the
per-robot counter path (solve_gate=None), because per-robot counters mask
the commit. This is what bench.py, rl/train.py and the play CLI rely on —
including the FSM-fleet gate that skips the QP when nobody is in
LOCOMOTION.
"""
import numpy as np

import jax
import jax.numpy as jnp

from rl_mpc_locomotion_tpu.control import fsm as fsm_mod
from rl_mpc_locomotion_tpu.control import runner
from rl_mpc_locomotion_tpu.control.types import ControlConfig
from rl_mpc_locomotion_tpu.models import robots
from rl_mpc_locomotion_tpu.ops.qp import QPConfig

CFG = ControlConfig(qp=QPConfig(iters=10, iters2=0, adaptive_rho=False,
                                deferred_rho=True, ruiz_iters=2,
                                polish=False))


def _inputs(n):
    params = robots.aliengo_params()
    dof_q = jnp.tile(jnp.array([0.0, 0.8, -1.6], jnp.float32), (n, 4))
    dof_q = dof_q.reshape(n, 12)
    dof_qd = jnp.zeros((n, 12), jnp.float32)
    body = jnp.tile(jnp.array([0, 0, 0.35, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0],
                              jnp.float32), (n, 1))
    cmds = jnp.tile(jnp.array([0.4, 0.0, 0.0], jnp.float32), (n, 1))
    return params, dof_q, dof_qd, body, cmds


def test_min_step_gate_equivalence():
    n, ticks = 2, 6
    params, dof_q, dof_qd, body, cmds = _inputs(n)
    ipm = CFG.iterations_between_mpc

    def run(gated):
        state = jax.vmap(lambda _: runner.init_state(params, CFG))(
            jnp.arange(n))
        taus = []
        for t in range(ticks):
            gate = (jnp.any((state.loco.iteration_counter + 1) % ipm == 0)
                    if gated else None)
            state, tau, _ = jax.vmap(
                lambda s, q, qd, b, c: runner.min_step(
                    params, CFG, s, q, qd, b, c, solve_gate=gate))(
                state, dof_q, dof_qd, body, cmds)
            taus.append(np.asarray(tau))
        return np.stack(taus), state

    tau_g, st_g = run(True)
    tau_n, st_n = run(False)
    # the two programs compute the same solves; XLA's fusion differs between
    # the cond-branch and select forms, so allow f32 scheduling noise
    np.testing.assert_allclose(tau_g, tau_n, atol=2e-2)
    np.testing.assert_allclose(np.asarray(st_g.loco.f_ff),
                               np.asarray(st_n.loco.f_ff), atol=2e-2)


def test_fsm_recovery_fleet_skips_solve():
    """A fleet entirely in PASSIVE/RECOVERY with gate=False must match the
    ungated path exactly (the QP result is never committed there)."""
    n, ticks = 2, 8
    params, dof_q, dof_qd, body, cmds = _inputs(n)

    def run(gate_value):
        state = jax.vmap(lambda _: runner.init_state(params, CFG,
                                                     fsm_initial=2))(
            jnp.arange(n))
        pi = jnp.zeros(n, jnp.int32)
        outs = []
        for _ in range(ticks):
            any_loco = jnp.any(state.fsm.state == fsm_mod.LOCOMOTION)
            gate = any_loco if gate_value else None
            state, tau, pi, _ = jax.vmap(
                lambda s, p, q, qd, b, c: runner.fsm_step(
                    params, CFG, s, p, q, qd, b, c,
                    control_mode=2, solve_gate=gate))(
                state, pi, dof_q, dof_qd, body, cmds)
            outs.append(np.asarray(tau))
        return np.stack(outs), state

    tau_g, st_g = run(True)
    tau_n, st_n = run(False)
    # fleet stays in recovery the whole time -> gate stays False
    assert np.all(np.asarray(st_g.fsm.state) == fsm_mod.RECOVERY_STAND)
    np.testing.assert_allclose(tau_g, tau_n, rtol=0, atol=0)
