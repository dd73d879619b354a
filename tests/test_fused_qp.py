"""Fused whole-QP Pallas kernel vs the XLA reference path (interpret mode).

The fused kernel (ops/pallas/fused_qp.py) subsumes masking, Ruiz, K
assembly, warm-start scaling, Gauss-Jordan factorization, ADMM, the
deferred-rho rescale and unscaling. This compares it end-to-end against
ops/qp's XLA pipeline on identical inputs, at shrunken static sizes so the
interpreter is fast. GRF-shaped structure is preserved: block-diagonal
constraints, equality (masked/swing) rows, warm starts.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rl_mpc_locomotion_tpu.ops import qp as qp_mod
from rl_mpc_locomotion_tpu.ops.pallas import admm_kernel, fused_qp


@pytest.fixture
def small_sizes(monkeypatch):
    # NB=4 blocks -> N=12 vars, M=20 rows; TR=8 robots per tile
    monkeypatch.setattr(admm_kernel, "N", 12)
    monkeypatch.setattr(admm_kernel, "M", 20)
    monkeypatch.setattr(admm_kernel, "NB", 4)
    monkeypatch.setattr(admm_kernel, "TR", 8)
    return 12, 20, 4, 8


CFG = qp_mod.QPConfig(iters=30, iters2=0, adaptive_rho=False,
                      deferred_rho=True, ruiz_iters=3, polish=False,
                      use_pallas=False)


def make_problem(b, n, m, nb, seed=0, warm=False):
    """Random GRF-shaped QP batch: SPD P, per-block active/inactive masks
    with zero bounds on inactive blocks (the swing-leg equality rows)."""
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(b, n, n)).astype(np.float32)
    p = np.einsum('bij,bkj->bik', a, a) + 0.5 * np.eye(n, dtype=np.float32)
    q = rng.normal(size=(b, n)).astype(np.float32) * 3.0
    c = rng.normal(size=(b, nb, 5, 3)).astype(np.float32)
    active = (rng.random((b, nb)) > 0.3).astype(np.float32)
    # at least one active block per robot so the QP is non-trivial
    active[:, 0] = 1.0
    mask = np.repeat(active, 3, axis=1)                     # (b, n)
    rows = np.repeat(active, 5, axis=1)                     # (b, m)
    lo = -np.abs(rng.normal(size=(b, m))).astype(np.float32)
    hi = np.abs(rng.normal(size=(b, m))).astype(np.float32)
    lb = lo * rows
    ub = hi * rows
    if warm:
        x = rng.normal(size=(b, n)).astype(np.float32) * 0.1
        z = rng.normal(size=(b, m)).astype(np.float32) * 0.1
        y = rng.normal(size=(b, m)).astype(np.float32) * 0.1
        rm = rng.uniform(0.5, 2.0, size=(b,)).astype(np.float32)
    else:
        x = np.zeros((b, n), np.float32)
        z = np.zeros((b, m), np.float32)
        y = np.zeros((b, m), np.float32)
        rm = np.ones((b,), np.float32)
    return map(jnp.array, (p, q, c, lb, ub, mask, x, z, y, rm))


def xla_reference(p, q, c, lb, ub, mask, x, z, y, rm, cfg=CFG):
    def one(p1, q1, c1, l1, u1, m1, x1, z1, y1, rm1):
        pm = p1 * m1[:, None] * m1[None, :] + jnp.diag(1.0 - m1)
        qm = q1 * m1
        x_u, st, diag = qp_mod._solve_qp_impl(
            pm, qm, c1, l1, u1, qp_mod.QPState(x1, z1, y1, rm1), cfg)
        return (x_u, st.z, st.y, st.rho_mult, diag["primal_violation"],
                jnp.stack([diag["pri_res"], diag["dua_res"]]))
    return jax.vmap(one)(p, q, c, lb, ub, mask, x, z, y, rm)


def run_fused(p, q, c, lb, ub, mask, x, z, y, rm, cfg=CFG):
    return fused_qp.fused_solve_batch(
        p, q, c, lb, ub, mask, x, z, y, rm,
        iters=cfg.iters, sigma=cfg.sigma, relax=cfg.relax, rho_base=cfg.rho,
        rho_eq_scale=cfg.rho_eq_scale, ruiz_iters=cfg.ruiz_iters,
        deferred_rho=cfg.deferred_rho, interpret=True)


def check_close(got, want):
    names = ("x", "z", "y")
    tols = (2e-3, 1e-2, 1e-2)
    for g, w, name, tol in zip(got[:3], want[:3], names, tols):
        g, w = np.asarray(g), np.asarray(w)
        scale = max(1.0, np.abs(w).max())
        assert np.abs(g - w).max() / scale < tol, (
            f"{name}: max err {np.abs(g - w).max()} scale {scale}")
    # primal violation diagnostic matches (same unscaled z)
    np.testing.assert_allclose(np.asarray(got[4]), np.asarray(want[4]),
                               atol=1e-2)
    if len(got) > 5:
        # residual telemetry: finite, non-negative, same order of
        # magnitude as XLA (kernel evaluates at x_t, XLA at relaxed x —
        # a heuristic measurement point, not an invariant)
        res = np.asarray(got[5])
        assert res.shape[-1] == 2 and np.all(np.isfinite(res))
        assert np.all(res >= 0)
        w_res = np.asarray(want[5])
        assert np.all(res < np.maximum(w_res * 50.0, 1.0)), (res, w_res)


class TestFusedKernel:
    def test_cold_start_matches_xla(self, small_sizes):
        n, m, nb, tr = small_sizes
        b = 11  # not a multiple of TR: exercises padding
        args = list(make_problem(b, n, m, nb, seed=0))
        want = xla_reference(*args)
        got = run_fused(*args)
        check_close(got, want)

    def test_warm_start_and_rho_mult(self, small_sizes):
        n, m, nb, tr = small_sizes
        b = 8
        args = list(make_problem(b, n, m, nb, seed=5, warm=True))
        want = xla_reference(*args)
        got = run_fused(*args)
        check_close(got, want)
        # rho_mult: evaluated at x_t in-kernel vs relaxed x in XLA — a
        # heuristic, not an invariant. Pin its contract: positive, finite,
        # inside the clip bounds, and same order of magnitude as XLA.
        rm_g, rm_w = np.asarray(got[3]), np.asarray(want[3])
        assert np.all(np.isfinite(rm_g)) and np.all(rm_g > 0)
        assert np.all(rm_g >= 1e-3) and np.all(rm_g <= 1e3)
        ratio = rm_g / rm_w
        assert np.all(ratio > 0.05) and np.all(ratio < 20.0)

    def test_all_blocks_active(self, small_sizes):
        n, m, nb, tr = small_sizes
        b = 8
        p, q, c, lb, ub, mask, x, z, y, rm = make_problem(b, n, m, nb, seed=2)
        mask = jnp.ones_like(mask)
        lb = -jnp.abs(lb) - 0.1
        ub = jnp.abs(ub) + 0.1
        args = (p, q, c, lb, ub, mask, x, z, y, rm)
        check_close(run_fused(*args), xla_reference(*args))

    def test_solve_qp_routes_through_fused(self, small_sizes, monkeypatch):
        """The public solve_qp with a production-shaped config dispatches
        the vmapped batch to the fused kernel (verified by interception)."""
        n, m, nb, tr = small_sizes
        b = 8
        p, q, c, lb, ub, mask, x, z, y, rm = make_problem(b, n, m, nb, seed=3)
        calls = {}
        orig = fused_qp.fused_solve_batch

        def spy(*a, **kw):
            calls["hit"] = True
            kw["interpret"] = True
            return orig(*a, **kw)

        monkeypatch.setattr(fused_qp, "fused_solve_batch", spy)
        qp_mod._make_fused_solver.cache_clear()
        cfg = CFG._replace(use_pallas=True)
        states = qp_mod.QPState(x=x, z=z, y=y, rho_mult=rm)
        xs, new_state, diag = jax.vmap(
            lambda p1, q1, c1, l1, u1, s1, m1: qp_mod.solve_qp(
                p1, q1, c1, l1, u1, s1, cfg, mask=m1))(
                p, q, c, lb, ub, states, mask)
        qp_mod._make_fused_solver.cache_clear()
        assert calls.get("hit"), "vmapped solve_qp did not use fused kernel"
        want = xla_reference(p, q, c, lb, ub, mask, x, z, y, rm)
        check_close((xs, new_state.z, new_state.y, new_state.rho_mult,
                     diag["primal_violation"]), want)


class TestChainKernel:
    """Chain-input fused kernel (fused_solve_chain_batch): P is built
    in-VMEM from the A^k B chain (suffix-diagonal scheme) — compare
    against hessian_from_chain + the XLA pipeline on identical inputs."""

    def _chain_problem(self, b, h, sd, nb, seed=0):
        # n = h * ad must equal NB*3 (constraint block structure)
        n = nb * 3
        ad = n // h
        m = nb * 5
        rng = np.random.default_rng(seed)
        s = (rng.normal(size=(b, h, sd, ad)) * 0.4).astype(np.float32)
        w = (np.abs(rng.normal(size=(b, sd))) + 0.2).astype(np.float32)
        c = rng.normal(size=(b, nb, 5, 3)).astype(np.float32)
        active = (rng.random((b, nb)) > 0.3).astype(np.float32)
        active[:, 0] = 1.0
        mask = np.repeat(active, 3, axis=1)
        rows = np.repeat(active, 5, axis=1)
        lb = -np.abs(rng.normal(size=(b, m))).astype(np.float32) * rows
        ub = np.abs(rng.normal(size=(b, m))).astype(np.float32) * rows
        q = (rng.normal(size=(b, n)) * 2.0).astype(np.float32)
        x = np.zeros((b, n), np.float32)
        z = np.zeros((b, m), np.float32)
        y = np.zeros((b, m), np.float32)
        rm = np.ones((b,), np.float32)
        return map(jnp.array, (s, w, q, c, lb, ub, mask, x, z, y, rm))

    def test_chain_kernel_matches_xla(self, small_sizes):
        from rl_mpc_locomotion_tpu.ops.srb_dynamics import hessian_from_chain

        n, m, nb, tr = small_sizes
        b, h, sd = 11, 2, 7     # n=12 -> 2 blocks of 6 per step
        alpha = 1e-4
        s, w, q, c, lb, ub, mask, x, z, y, rm = self._chain_problem(
            b, h, sd, nb, seed=7)
        got = fused_qp.fused_solve_chain_batch(
            s, w, q, c, lb, ub, mask, x, z, y, rm, alpha=alpha,
            iters=CFG.iters, sigma=CFG.sigma, relax=CFG.relax,
            rho_base=CFG.rho, rho_eq_scale=CFG.rho_eq_scale,
            ruiz_iters=CFG.ruiz_iters, deferred_rho=CFG.deferred_rho,
            interpret=True)
        p = jax.vmap(lambda ss, ww: hessian_from_chain(ss, ww, alpha))(s, w)
        want = xla_reference(p, q, c, lb, ub, mask, x, z, y, rm)
        check_close(got, want)

    def test_solve_qp_chain_routes_through_kernel(self, small_sizes,
                                                  monkeypatch):
        n, m, nb, tr = small_sizes
        b, h, sd = 8, 2, 7
        alpha = 1e-4
        s, w, q, c, lb, ub, mask, x, z, y, rm = self._chain_problem(
            b, h, sd, nb, seed=9)
        calls = {}
        orig = fused_qp.fused_solve_chain_batch

        def spy(*a, **kw):
            calls["hit"] = True
            kw["interpret"] = True
            return orig(*a, **kw)

        monkeypatch.setattr(fused_qp, "fused_solve_chain_batch", spy)
        qp_mod._make_fused_chain_solver.cache_clear()
        cfg = CFG._replace(use_pallas=True)
        states = qp_mod.QPState(x=x, z=z, y=y, rho_mult=rm)
        xs, new_state, diag = jax.vmap(
            lambda s1, w1, q1, c1, l1, u1, st1, m1: qp_mod.solve_qp_chain(
                s1, q1, w1, alpha, c1, l1, u1, st1, cfg, mask=m1,
                horizon=h))(s, w, q, c, lb, ub, states, mask)
        qp_mod._make_fused_chain_solver.cache_clear()
        assert calls.get("hit"), "vmapped solve_qp_chain skipped the kernel"
        from rl_mpc_locomotion_tpu.ops.srb_dynamics import hessian_from_chain
        p = jax.vmap(lambda ss, ww: hessian_from_chain(ss, ww, alpha))(s, w)
        want = xla_reference(p, q, c, lb, ub, mask, x, z, y, rm)
        check_close((xs, new_state.z, new_state.y, new_state.rho_mult,
                     diag["primal_violation"]), want)
