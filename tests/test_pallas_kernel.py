"""Pallas ADMM kernel correctness in interpreter mode (CPU).

Shrinks the kernel's static sizes via monkeypatching so interpret mode is
fast, then checks: (1) the in-kernel Cholesky+L^-1 against numpy, via a
zero-iteration solve's fixed point behaviour, and (2) the full scaled-solve
against the XLA reference path on identical inputs.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rl_mpc_locomotion_tpu.ops import qp as qp_mod
from rl_mpc_locomotion_tpu.ops.pallas import admm_kernel


@pytest.fixture
def small_sizes(monkeypatch):
    # NB=4 blocks -> N=12 vars, M=20 rows; TR=8 robots per tile
    monkeypatch.setattr(admm_kernel, "N", 12)
    monkeypatch.setattr(admm_kernel, "M", 20)
    monkeypatch.setattr(admm_kernel, "NB", 4)
    monkeypatch.setattr(admm_kernel, "TR", 8)
    return 12, 20, 4, 8


def make_problem(b, n, m, nb, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(b, n, n)).astype(np.float32)
    k = np.einsum('bij,bkj->bik', a, a) + 0.5 * np.eye(n, dtype=np.float32)
    q = rng.normal(size=(b, n)).astype(np.float32)
    c = rng.normal(size=(b, nb, 5, 3)).astype(np.float32)
    lb = -np.abs(rng.normal(size=(b, m))).astype(np.float32)
    ub = np.abs(rng.normal(size=(b, m))).astype(np.float32)
    rho = np.full((b, m), 0.3, np.float32)
    return map(jnp.array, (k, q, c, lb, ub, rho))


def xla_reference(k, q, c, lb, ub, rho, x, z, y, iters, sigma, relax):
    def one(k1, q1, c1, l1, u1, r1, x1, z1, y1):
        k_inv = qp_mod._spd_inverse(k1)
        return qp_mod._admm_iters(k_inv, None, q1, c1, l1, u1, r1, sigma,
                                  relax, iters, x1, z1, y1)
    return jax.vmap(one)(k, q, c, lb, ub, rho, x, z, y)


class TestKernelInterpret:
    def test_matches_xla_reference(self, small_sizes):
        n, m, nb, tr = small_sizes
        b = 10  # not a multiple of TR: exercises padding
        k, q, c, lb, ub, rho = make_problem(b, n, m, nb)
        x = jnp.zeros((b, n))
        z = jnp.zeros((b, m))
        y = jnp.zeros((b, m))
        iters, sigma, relax = 30, 1e-6, 1.6
        want = xla_reference(k, q, c, lb, ub, rho, x, z, y, iters, sigma,
                             relax)
        got = admm_kernel.solve_scaled_batch(
            k, q, c, lb, ub, rho, x, z, y, iters=iters, sigma=sigma,
            relax=relax, interpret=True)
        # x to 1e-3; z/y looser — f32 summation-order noise gets amplified
        # when an iterate sits on a clip boundary
        for g, w, name, tol in zip(got, want, "xzy", (1e-3, 1e-2, 1e-2)):
            g, w = np.asarray(g), np.asarray(w)
            scale = max(1.0, np.abs(w).max())
            assert np.abs(g - w).max() / scale < tol, (
                f"{name}: max err {np.abs(g - w).max()} scale {scale}")

    def test_kinv_solve_accuracy(self, small_sizes):
        """One relaxation-free iteration from x=z=y=0 gives
        x1 = relax * K^-1(-q) exactly -> checks chol + L^-1 numerically."""
        n, m, nb, tr = small_sizes
        b = 8
        k, q, c, lb, ub, rho = make_problem(b, n, m, nb, seed=3)
        zeros_n = jnp.zeros((b, n))
        zeros_m = jnp.zeros((b, m))
        got_x, _, _ = admm_kernel.solve_scaled_batch(
            k, q, c, lb, ub, rho, zeros_n, zeros_m, zeros_m,
            iters=1, sigma=0.0, relax=1.0, interpret=True)
        want = np.stack([np.linalg.solve(np.asarray(k[i], np.float64),
                                         -np.asarray(q[i], np.float64))
                         for i in range(b)])
        np.testing.assert_allclose(np.asarray(got_x), want, atol=5e-4)
