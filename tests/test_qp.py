"""Batched ADMM QP solver tests.

Oracle: scipy.optimize trust-constr (float64, tight tolerances) on the same
QP, plus direct KKT checks. This validates the solver independently of any
particular implementation, standing in for the reference's OSQP cross-check
(BASELINE: <1e-3 GRF deviation)."""
import numpy as np
import pytest
from scipy.optimize import LinearConstraint, minimize

import jax
import jax.numpy as jnp

from rl_mpc_locomotion_tpu.ops import qp as qp_mod
from rl_mpc_locomotion_tpu.ops import srb_dynamics as srb


def solve_oracle(P, q, C, lb, ub, mask=None):
    """High-accuracy float64 solve with scipy trust-constr.

    When a variable mask is given, swing variables and their (degenerate
    0=0) constraint rows are eliminated first — trust-constr produces
    garbage on the singular equality Jacobian otherwise — mirroring the
    reference's qpOASES variable elimination (mpc_osqp.cc:832-904).
    """
    P64, q64, C64 = P.astype(np.float64), q.astype(np.float64), C.astype(np.float64)
    lb64, ub64 = lb.astype(np.float64), ub.astype(np.float64)
    n = P.shape[0]
    if mask is not None:
        keep = mask > 0.5
        rows = np.repeat(keep.reshape(-1, 3)[:, 0], 5)
        Pr, qr = P64[np.ix_(keep, keep)], q64[keep]
        Cr = C64[np.ix_(rows, keep)]
        lbr, ubr = lb64[rows], ub64[rows]
    else:
        keep = np.ones(n, bool)
        Pr, qr, Cr, lbr, ubr = P64, q64, C64, lb64, ub64
    res = minimize(
        lambda x: 0.5 * x @ Pr @ x + qr @ x,
        np.zeros(Pr.shape[0]),
        jac=lambda x: Pr @ x + qr,
        hess=lambda x: Pr,
        method="trust-constr",
        constraints=[LinearConstraint(Cr, lbr, ubr)],
        options={"gtol": 1e-10, "xtol": 1e-12, "maxiter": 2000, "verbose": 0})
    x = np.zeros(n)
    x[keep] = res.x
    return x


def build_grf_qp(seed=0, horizon=10, contact=None):
    """A realistic GRF QP from the srb pipeline (Aliengo-ish numbers)."""
    rng = np.random.default_rng(seed)
    rpy = rng.uniform(-0.1, 0.1, 3).astype(np.float32)
    normal = np.array([0.0, 0.0, 1.0], np.float32)
    mass = 18.082
    inertia = np.diag([0.033260231, 0.16117211, 0.17460442]).astype(np.float32)
    foot_pos = np.array([[0.24, 0.13, -0.3], [0.24, -0.13, -0.3],
                         [-0.24, 0.13, -0.3], [-0.24, -0.13, -0.3]],
                        np.float32)
    foot_pos += rng.uniform(-0.03, 0.03, (4, 3)).astype(np.float32)
    a = srb.build_a_mat(jnp.array(rpy), jnp.array(normal))
    b = srb.build_b_mat(1.0 / mass, jnp.array(np.linalg.inv(inertia)),
                        jnp.array(foot_pos))
    a_exp, b_exp = srb.discretize_exact(a, b, 0.02)
    a_qp, b_qp = srb.condense(a_exp, b_exp, horizon=horizon)
    weights = jnp.array([1.0, 1.5, 0.0, 0.0, 0.0, 50, 0.0, 0.0, 0.1,
                         1.0, 1.0, 0.1, 0.0], jnp.float32)
    x0 = srb.build_state_vec(jnp.array(rpy), jnp.array([0, 0, 0.32], jnp.float32),
                             jnp.array(rng.uniform(-0.2, 0.2, 3), jnp.float32),
                             jnp.array(rng.uniform(-0.3, 0.3, 3), jnp.float32))
    x_des = srb.build_desired_states(
        jnp.array(rpy), jnp.array([0, 0, 0.32], jnp.float32),
        jnp.array([0, 0, 0.35], jnp.float32),
        jnp.array([0.5, 0.0, 0.0], jnp.float32), jnp.zeros(3),
        jnp.array([0.0, 0.0, 0.1], jnp.float32), 0.02, horizon)
    p_mat, q_vec = srb.build_qp_cost(a_qp, b_qp, x0, x_des, weights, 1e-5,
                                     horizon)
    if contact is None:
        # trot-like table
        contact = np.zeros((horizon, 4), np.float32)
        contact[:5, [0, 3]] = 1.0
        contact[5:, [1, 2]] = 1.0
    mu = 0.4
    lb, ub = srb.constraint_bounds(jnp.array(contact), mass, mu, horizon)
    p_m, q_m, mask = qp_mod.mask_swing_variables(p_mat, q_vec,
                                                 jnp.array(contact), horizon)
    c_blocks = jnp.tile(srb.friction_cone_block(mu)[None], (horizon * 4, 1, 1))
    return (np.asarray(p_m), np.asarray(q_m), np.asarray(c_blocks),
            np.asarray(lb), np.asarray(ub), np.asarray(mask))


# 300+300 iterations: measured worst-case rel err vs the f64 oracle is
# ~4e-5 across seeds (100+100 left seed 4 at 1.4e-3); this config is the
# offline-accuracy reference, not the real-time path.
ACCURATE = qp_mod.QPConfig(iters=300, iters2=300, adaptive_rho=True,
                           polish=True)


class TestGRFQP:
    def test_matches_scipy_oracle(self):
        for seed in range(3):
            P, q, C, lb, ub, mask = build_grf_qp(seed)
            state = qp_mod.init_qp_state(120, 200)
            x, _, diag = jax.jit(
                lambda *a: qp_mod.solve_qp(*a, cfg=ACCURATE))(
                    jnp.array(P), jnp.array(q), jnp.array(C),
                    jnp.array(lb), jnp.array(ub), state)
            x = np.asarray(x)
            g = np.asarray(srb.friction_cone_block(0.4))
            C_dense = np.kron(np.eye(40), g)
            want = solve_oracle(P, q, C_dense, lb, ub, mask)
            scale = max(1.0, np.abs(want).max())
            err = np.abs(x - want).max()
            # BASELINE north star is <1e-3; we hold 2e-4 (measured ~4e-5)
            assert err / scale < 2e-4, f"seed {seed}: err {err}, scale {scale}"
            # step-0 GRFs (the 12 numbers the controller consumes) tighter
            err0 = np.abs(x[:12] - want[:12]).max()
            assert err0 < 2e-4 * scale, f"seed {seed}: step0 err {err0}"

    def test_kkt_conditions(self):
        P, q, C, lb, ub, mask = build_grf_qp(7)
        state = qp_mod.init_qp_state(120, 200)
        x, new_state, diag = qp_mod.solve_qp(
            jnp.array(P), jnp.array(q), jnp.array(C), jnp.array(lb),
            jnp.array(ub), state, ACCURATE)
        x, y = np.asarray(x), np.asarray(new_state.y)
        g = np.asarray(srb.friction_cone_block(0.4))
        C_dense = np.kron(np.eye(40), g)
        z = C_dense @ x
        fscale = max(1.0, np.abs(x).max())
        # primal feasibility
        assert np.max(lb - z) < 1e-3 * fscale
        assert np.max(z - ub) < 1e-3 * fscale
        # stationarity: P x + q + C^T y = 0
        grad_scale = max(np.abs(P @ x).max(), np.abs(q).max())
        stat = np.abs(P @ x + q + C_dense.T @ y).max()
        assert stat < 5e-3 * grad_scale

    def test_swing_legs_pinned_to_zero(self):
        contact = np.zeros((10, 4), np.float32)
        contact[:, 0] = 1.0  # only leg 0 in contact
        P, q, C, lb, ub, mask = build_grf_qp(3, contact=contact)
        state = qp_mod.init_qp_state(120, 200)
        x, _, _ = qp_mod.solve_qp(jnp.array(P), jnp.array(q), jnp.array(C),
                                  jnp.array(lb), jnp.array(ub), state, ACCURATE)
        x = np.asarray(x).reshape(10, 4, 3)
        np.testing.assert_allclose(x[:, 1:], 0.0, atol=1e-4)
        # the contact leg must carry roughly the weight at each step
        assert np.all(x[:, 0, 2] > 0.1 * 18.0 * 9.8 - 1e-3)

    def test_warm_start_improves(self):
        P, q, C, lb, ub, mask = build_grf_qp(11)
        cold = qp_mod.init_qp_state(120, 200)
        fast_cfg = qp_mod.QPConfig(iters=15, iters2=0, adaptive_rho=False,
                                   polish=False)
        x1, s1, _ = qp_mod.solve_qp(jnp.array(P), jnp.array(q), jnp.array(C),
                                    jnp.array(lb), jnp.array(ub), cold,
                                    ACCURATE)
        # perturb the gradient slightly (next control tick)
        q2 = q * 1.01
        x_cold, _, _ = qp_mod.solve_qp(jnp.array(P), jnp.array(q2),
                                       jnp.array(C), jnp.array(lb),
                                       jnp.array(ub), cold, fast_cfg)
        x_warm, _, _ = qp_mod.solve_qp(jnp.array(P), jnp.array(q2),
                                       jnp.array(C), jnp.array(lb),
                                       jnp.array(ub), s1, fast_cfg)
        g = np.asarray(srb.friction_cone_block(0.4))
        want = solve_oracle(P, q2, np.kron(np.eye(40), g), lb, ub, mask)
        err_cold = np.abs(np.asarray(x_cold) - want).max()
        err_warm = np.abs(np.asarray(x_warm) - want).max()
        assert err_warm <= err_cold * 1.5
        assert err_warm < 1.0  # newtons; warm start after 15 iters is close

    def test_vmap_batch(self):
        probs = [build_grf_qp(s) for s in range(4)]
        P = jnp.array(np.stack([p[0] for p in probs]))
        q = jnp.array(np.stack([p[1] for p in probs]))
        C = jnp.array(np.stack([p[2] for p in probs]))
        lb = jnp.array(np.stack([p[3] for p in probs]))
        ub = jnp.array(np.stack([p[4] for p in probs]))
        states = jax.vmap(lambda _: qp_mod.init_qp_state(120, 200))(
            jnp.arange(4))
        fn = jax.jit(jax.vmap(lambda *a: qp_mod.solve_qp(*a, cfg=ACCURATE)))
        xs, _, _ = fn(P, q, C, lb, ub, states)
        for i, (Pn, qn, Cn, lbn, ubn, _) in enumerate(probs):
            g = np.asarray(srb.friction_cone_block(0.4))
            want = solve_oracle(Pn, qn, np.kron(np.eye(40), g), lbn, ubn, probs[i][5])
            scale = max(1.0, np.abs(want).max())
            assert np.abs(np.asarray(xs[i]) - want).max() / scale < 2e-4
