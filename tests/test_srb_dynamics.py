"""SRB dynamics tests: the closed-form discretization against a true matrix
exponential, and the condensation against a NumPy float64 oracle that follows
the reference recursion (mpc_osqp.cc:353-435)."""
import numpy as np
from scipy.linalg import expm as scipy_expm

import jax.numpy as jnp

from rl_mpc_locomotion_tpu.ops import srb_dynamics as srb


def random_problem(seed=0):
    rng = np.random.default_rng(seed)
    rpy = rng.uniform(-0.3, 0.3, 3).astype(np.float32)
    normal = np.array([0.05, -0.02, 1.0], np.float32)
    normal /= np.linalg.norm(normal)
    mass = 18.0
    inertia = np.diag([0.033, 0.161, 0.174]).astype(np.float32)
    foot_pos = rng.uniform(-0.4, 0.4, (4, 3)).astype(np.float32)
    return rpy, normal, mass, inertia, foot_pos


class TestABMatrices:
    def test_a_mat_structure(self):
        rpy, normal, *_ = random_problem()
        a = np.asarray(srb.build_a_mat(jnp.array(rpy), jnp.array(normal)))
        # only the documented couplings are nonzero
        mask = np.zeros((13, 13), bool)
        mask[0:3, 6:9] = True
        mask[3, 9] = mask[4, 10] = mask[5, 11] = True
        mask[9:12, 12] = True
        assert np.all(a[~mask] == 0)
        np.testing.assert_allclose(a[9:12, 12], normal, atol=1e-6)
        # rpy-rate map at zero yaw/pitch is identity
        a0 = np.asarray(srb.build_a_mat(jnp.zeros(3), jnp.array([0, 0, 1.0])))
        np.testing.assert_allclose(a0[0:3, 6:9], np.eye(3), atol=1e-6)

    def test_a_is_nilpotent(self):
        rpy, normal, *_ = random_problem(1)
        a = np.asarray(srb.build_a_mat(jnp.array(rpy), jnp.array(normal)))
        np.testing.assert_allclose(a @ a @ a, 0, atol=1e-6)

    def test_b_mat(self):
        rpy, normal, mass, inertia, foot_pos = random_problem(2)
        inv_inertia = np.linalg.inv(inertia)
        b = np.asarray(srb.build_b_mat(1.0 / mass, jnp.array(inv_inertia),
                                       jnp.array(foot_pos)))
        for i in range(4):
            r = foot_pos[i]
            skew = np.array([[0, -r[2], r[1]], [r[2], 0, -r[0]], [-r[1], r[0], 0]])
            np.testing.assert_allclose(b[6:9, 3 * i:3 * i + 3],
                                       inv_inertia @ skew, atol=1e-5)
            np.testing.assert_allclose(b[9:12, 3 * i:3 * i + 3],
                                       np.eye(3) / mass, atol=1e-6)


class TestDiscretization:
    def test_matches_true_expm(self):
        """Closed form == exp([A B; 0 0] dt), the reference's
        CalculateExponentials (mpc_osqp.cc:338-351)."""
        for seed in range(5):
            rpy, normal, mass, inertia, foot_pos = random_problem(seed)
            a = np.asarray(srb.build_a_mat(jnp.array(rpy), jnp.array(normal)),
                           dtype=np.float64)
            b = np.asarray(srb.build_b_mat(1.0 / mass,
                                           jnp.array(np.linalg.inv(inertia)),
                                           jnp.array(foot_pos)), dtype=np.float64)
            dt = 0.02
            ab = np.zeros((25, 25))
            ab[:13, :13] = a * dt
            ab[:13, 13:] = b * dt
            full = scipy_expm(ab)
            a_exp, b_exp = srb.discretize_exact(jnp.array(a, jnp.float32),
                                                jnp.array(b, jnp.float32), dt)
            np.testing.assert_allclose(np.asarray(a_exp), full[:13, :13], atol=1e-6)
            np.testing.assert_allclose(np.asarray(b_exp), full[:13, 13:], atol=1e-6)


def condense_oracle(a_exp, b_exp, horizon, last_aqp_zero=True):
    """NumPy float64 oracle following mpc_osqp.cc:353-385 block-by-block."""
    sd, ad = 13, 12
    a_qp = np.zeros((sd * horizon, sd))
    a_qp[0:sd] = a_exp
    for i in range(1, horizon - 1):
        a_qp[i * sd:(i + 1) * sd] = a_exp @ a_qp[(i - 1) * sd:i * sd]
    if not last_aqp_zero:
        a_qp[(horizon - 1) * sd:] = a_exp @ a_qp[(horizon - 2) * sd:(horizon - 1) * sd]
    anb = np.zeros((sd * horizon, ad))
    anb[0:sd] = b_exp
    for i in range(1, horizon):
        anb[i * sd:(i + 1) * sd] = a_exp @ anb[(i - 1) * sd:i * sd]
    b_qp = np.zeros((sd * horizon, ad * horizon))
    for i in range(horizon):
        b_qp[i * sd:(i + 1) * sd, i * ad:(i + 1) * ad] = b_exp
        for j in range(i):
            p = i - j
            b_qp[i * sd:(i + 1) * sd, j * ad:(j + 1) * ad] = anb[p * sd:(p + 1) * sd]
    return a_qp, b_qp


class TestCondensation:
    def test_matches_reference_recursion(self):
        rpy, normal, mass, inertia, foot_pos = random_problem(3)
        a = srb.build_a_mat(jnp.array(rpy), jnp.array(normal))
        b = srb.build_b_mat(1.0 / mass, jnp.array(np.linalg.inv(inertia)),
                            jnp.array(foot_pos))
        a_exp, b_exp = srb.discretize_exact(a, b, 0.02)
        a_qp, b_qp = srb.condense(a_exp, b_exp, horizon=10)
        oa, ob = condense_oracle(np.asarray(a_exp, np.float64),
                                 np.asarray(b_exp, np.float64), 10)
        np.testing.assert_allclose(np.asarray(a_qp), oa, atol=1e-5)
        np.testing.assert_allclose(np.asarray(b_qp), ob, atol=1e-5)
        # the reference quirk: last block row of a_qp is zero
        assert np.all(np.asarray(a_qp)[9 * 13:] == 0)

    def test_cost_matches_reference_formula(self):
        """P and q against mpc_osqp.cc:387-435, 681-683 computed naively."""
        rpy, normal, mass, inertia, foot_pos = random_problem(4)
        a = srb.build_a_mat(jnp.array(rpy), jnp.array(normal))
        b = srb.build_b_mat(1.0 / mass, jnp.array(np.linalg.inv(inertia)),
                            jnp.array(foot_pos))
        a_exp, b_exp = srb.discretize_exact(a, b, 0.02)
        a_qp, b_qp = srb.condense(a_exp, b_exp, horizon=10)
        rng = np.random.default_rng(5)
        weights = rng.uniform(0.1, 10, 13).astype(np.float32)
        x0 = rng.normal(size=13).astype(np.float32)
        x_des = rng.normal(size=130).astype(np.float32)
        alpha = 1e-5
        p_mat, q_vec = srb.build_qp_cost(a_qp, b_qp, jnp.array(x0),
                                         jnp.array(x_des), jnp.array(weights),
                                         alpha)
        bq = np.asarray(b_qp, np.float64)
        aq = np.asarray(a_qp, np.float64)
        qw = np.diag(np.tile(weights, 10)).astype(np.float64)
        want_p = 2.0 * bq.T @ qw @ bq + alpha * np.eye(120)
        want_q = 2.0 * bq.T @ qw @ (aq @ x0 - x_des)
        np.testing.assert_allclose(np.asarray(p_mat), want_p, atol=2e-4)
        np.testing.assert_allclose(np.asarray(q_vec), want_q, atol=2e-3)

    def test_block_cost_path_matches_dense(self):
        """condense_blocks + build_qp_cost_blocks (the production path —
        skips materializing dense B_qp) == condense + build_qp_cost."""
        rpy, normal, mass, inertia, foot_pos = random_problem(6)
        a = srb.build_a_mat(jnp.array(rpy), jnp.array(normal))
        b = srb.build_b_mat(1.0 / mass, jnp.array(np.linalg.inv(inertia)),
                            jnp.array(foot_pos))
        a_exp, b_exp = srb.discretize_exact(a, b, 0.02)
        rng = np.random.default_rng(7)
        weights = jnp.array(rng.uniform(0.1, 10, 13).astype(np.float32))
        x0 = jnp.array(rng.normal(size=13).astype(np.float32))
        x_des = jnp.array(rng.normal(size=130).astype(np.float32))

        a_qp, b_qp = srb.condense(a_exp, b_exp, horizon=10)
        p_ref, q_ref = srb.build_qp_cost(a_qp, b_qp, x0, x_des, weights,
                                         1e-5)
        a_qp2, blocks = srb.condense_blocks(a_exp, b_exp, horizon=10)
        p_blk, q_blk = srb.build_qp_cost_blocks(a_qp2, blocks, x0, x_des,
                                                weights, 1e-5)
        np.testing.assert_allclose(np.asarray(a_qp2), np.asarray(a_qp),
                                   atol=0)
        np.testing.assert_allclose(np.asarray(p_blk), np.asarray(p_ref),
                                   rtol=1e-5, atol=1e-3)
        np.testing.assert_allclose(np.asarray(q_blk), np.asarray(q_ref),
                                   rtol=1e-5, atol=1e-3)


class TestDesiredStates:
    def test_layout(self):
        xd = np.asarray(srb.build_desired_states(
            com_rpy=jnp.array([0.01, -0.02, 0.5]),
            com_position=jnp.array([1.0, 2.0, 0.3]),
            desired_position=jnp.array([0.0, 0.0, 0.35]),
            desired_velocity=jnp.array([0.5, 0.1, 0.0]),
            desired_rpy=jnp.zeros(3),
            desired_omega=jnp.array([0.0, 0.0, 0.2]),
            dt=0.02)).reshape(10, 13)
        i1 = (np.arange(10) + 1) * 0.02
        np.testing.assert_allclose(xd[:, 2], 0.5 + i1 * 0.2, atol=1e-6)  # yaw
        np.testing.assert_allclose(xd[:, 3], 1.0 + i1 * 0.5, atol=1e-6)  # x
        np.testing.assert_allclose(xd[:, 5], 0.35, atol=1e-6)            # z held
        np.testing.assert_allclose(xd[:, 11], 0.0, atol=1e-6)            # vz 0
        np.testing.assert_allclose(xd[:, 12], -9.8, atol=1e-6)


class TestConstraints:
    def test_bounds(self):
        ct = np.zeros((10, 4), np.float32)
        ct[:, 0] = 1.0  # leg 0 always in contact
        lb, ub = srb.constraint_bounds(jnp.array(ct), mass=18.0, mu=0.4)
        lb, ub = np.asarray(lb).reshape(10, 4, 5), np.asarray(ub).reshape(10, 4, 5)
        mg = 18.0 * 9.8
        np.testing.assert_allclose(lb[:, 0, 4], 0.1 * mg, atol=1e-3)
        np.testing.assert_allclose(ub[:, 0, 4], 10 * mg, atol=1e-2)
        np.testing.assert_allclose(ub[:, 0, 0], 1.4 * 10 * mg, atol=1e-1)
        np.testing.assert_allclose(lb[:, 1:], 0, atol=1e-7)
        np.testing.assert_allclose(ub[:, 1:], 0, atol=1e-7)

    def test_apply_constraint_matches_dense(self):
        rng = np.random.default_rng(6)
        x = rng.normal(size=120).astype(np.float32)
        mu = 0.4
        got = np.asarray(srb.apply_constraint(jnp.array(x), mu))
        g = np.asarray(srb.friction_cone_block(mu))
        dense = np.kron(np.eye(40), g)
        np.testing.assert_allclose(got, dense @ x, atol=1e-5)
        y = rng.normal(size=200).astype(np.float32)
        gt = np.asarray(srb.apply_constraint_t(jnp.array(y), mu))
        np.testing.assert_allclose(gt, dense.T @ y, atol=1e-5)


class TestChainCondensation:
    def test_condense_cost_equals_dense_path(self):
        """The chain-form (P, q) (condense_chain + hessian/gradient_
        from_chain — the production path feeding the fused kernel) must
        equal condense() + build_qp_cost() to f32 precision."""
        import numpy as np
        rng = np.random.RandomState(3)
        for trial in range(3):
            a = (jnp.asarray(rng.randn(13, 13).astype(np.float32)) * 0.05
                 + jnp.eye(13))
            b = jnp.asarray(rng.randn(13, 12).astype(np.float32)) * 0.1
            x0 = jnp.asarray(rng.randn(13).astype(np.float32))
            xd = jnp.asarray(rng.randn(130).astype(np.float32))
            w = jnp.asarray(np.abs(rng.randn(13)).astype(np.float32))
            aq, bq = srb.condense(a, b, 10)
            p1, q1 = srb.build_qp_cost(aq, bq, x0, xd, w, 1e-5, 10)
            p2, q2 = srb.condense_cost(a, b, x0, xd, w, 1e-5, 10)
            prel = float(jnp.max(jnp.abs(p1 - p2)) / jnp.max(jnp.abs(p1)))
            qrel = float(jnp.max(jnp.abs(q1 - q2)) / jnp.max(jnp.abs(q1)))
            assert prel < 1e-5, prel
            assert qrel < 1e-5, qrel
