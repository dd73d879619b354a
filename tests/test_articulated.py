"""Articulated 18-DoF plant validation (sim/articulated.py).

The formulation is exact Lagrangian mechanics (Euler-Poincare with
AD-derived bias terms), so physics invariants are the oracle:
- H(q) symmetric positive definite; its v-block is total-mass * I,
- free fall conserves energy and follows d(P)/dt = M g exactly,
- angular momentum about the COM is conserved under gravity even while
  the legs pump (gravity is a uniform field),
- closed loop: the MPC controller walks the Aliengo on the articulated
  plant (the plant the reference trains on, sim_utils.py:16-43).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rl_mpc_locomotion_tpu.models import robots
from rl_mpc_locomotion_tpu.sim import articulated, physics, terrain

STAND_Q = jnp.tile(jnp.array([0.0, 0.8, -1.6], jnp.float32), 4)


@pytest.fixture(scope="module")
def art():
    return articulated.for_robot("aliengo")


@pytest.fixture(scope="module")
def params(art):
    return robots.aliengo_params()._replace(art=art)


def total_mass(art):
    return float(art.trunk_mass) + float(jnp.sum(art.link_mass))


class TestMassMatrix:
    def test_spd_and_vblock(self, art):
        for seed in range(3):
            q = jax.random.uniform(jax.random.PRNGKey(seed), (12,),
                                   minval=-1.2, maxval=1.2)
            h = np.asarray(articulated.mass_matrix(art, q),
                           dtype=np.float64)
            np.testing.assert_allclose(h, h.T, atol=1e-4)
            assert np.linalg.eigvalsh(h).min() > 0
            # linear-velocity block: sum of all Jv v-blocks = I per body
            np.testing.assert_allclose(
                h[0:3, 0:3], total_mass(art) * np.eye(3), rtol=1e-5)

    def test_urdf_masses_realistic(self, art):
        # Aliengo real robot is ~21-25 kg (trunk 11.6 + 4 legs w/ rotors)
        assert 18.0 < total_mass(art) < 28.0


def _freefall_rollout(params, torques_fn, steps=100, dt=0.001):
    cfg = physics.PhysicsConfig(dt=dt, articulated=True,
                                joint_damping=0.0, joint_friction=0.0)
    ter = terrain.flat(extent=10.0, cell=0.5)
    st = physics.init_state(params, STAND_Q, 50.0)  # far above ground
    st = st._replace(v=jnp.array([0.3, -0.2, 0.5], jnp.float32),
                     omega=jnp.array([0.4, 0.3, -0.2], jnp.float32),
                     qd=jnp.full(12, 0.5, jnp.float32))

    def tick(carry, t):
        st = carry
        st, _, _ = articulated.substep(params, cfg, ter, st,
                                       torques_fn(t))
        return st, (st.pos, st.quat, st.v, st.omega, st.q, st.qd)

    _, traj = jax.lax.scan(tick, st, jnp.arange(steps))
    return cfg, jax.tree.map(np.asarray, traj)


def _energy_momentum(art, traj):
    pos, quat, v, om, q, qd = traj
    m_tot = total_mass(art)
    es, ps, ls = [], [], []
    for t in range(len(pos)):
        from rl_mpc_locomotion_tpu.ops import rotations as rot
        r_wb = np.asarray(rot.quat_to_rot(jnp.asarray(quat[t]))).T
        u = np.concatenate([r_wb.T @ v[t], r_wb.T @ om[t], qd[t]])
        h = np.asarray(articulated.mass_matrix(art, jnp.asarray(q[t])),
                       dtype=np.float64)
        ke = 0.5 * u @ h @ u
        # potential: sum of m_i g z_i over bodies
        kin = jax.tree.map(np.asarray,
                           articulated.leg_kinematics(art, jnp.asarray(q[t])))
        coms_b = np.concatenate([kin["com"].reshape(12, 3),
                                 np.asarray(art.trunk_com)[None]], axis=0)
        masses = np.concatenate([np.asarray(art.link_mass).reshape(12),
                                 [float(art.trunk_mass)]])
        coms_w = pos[t][None] + coms_b @ r_wb.T
        pe = physics.GRAVITY * float(masses @ coms_w[:, 2])
        es.append(ke + pe)
        # momenta from the trunk-frame generalized momentum h = H u
        hu = h @ u
        p_w = r_wb @ hu[0:3]
        ps.append(p_w)
        # angular momentum about the world COM
        com_w = (masses @ coms_w) / m_tot
        l_w = r_wb @ hu[3:6] + np.cross(pos[t] - com_w, p_w)
        ls.append(l_w)
    return np.array(es), np.array(ps), np.array(ls)


class TestFreeFallInvariants:
    def test_energy_conserved(self, params, art):
        _, traj = _freefall_rollout(params, lambda t: jnp.zeros(12))
        es, _, _ = _energy_momentum(art, traj)
        scale = max(abs(es[0]), 1.0)
        assert abs(es[-1] - es[0]) / scale < 0.01, (es[0], es[-1])

    def test_linear_momentum_follows_gravity(self, params, art):
        cfg, traj = _freefall_rollout(params, lambda t: jnp.zeros(12))
        _, ps, _ = _energy_momentum(art, traj)
        m_tot = total_mass(art)
        steps = len(ps)
        expect = ps[0] + np.array([0, 0, -physics.GRAVITY * m_tot]) * \
            cfg.dt * (steps - 1)
        np.testing.assert_allclose(ps[-1], expect,
                                   atol=0.02 * abs(expect[2]))

    def test_angular_momentum_conserved_with_leg_pumping(self, params,
                                                         art):
        # internal torques + uniform gravity cannot change L about the COM
        torques = lambda t: 8.0 * jnp.sin(
            0.05 * t + jnp.arange(12, dtype=jnp.float32))
        _, traj = _freefall_rollout(params, torques, steps=150)
        _, _, ls = _energy_momentum(art, traj)
        drift = np.abs(ls[-1] - ls[0]).max()
        scale = max(np.abs(ls).max(), 1.0)
        assert drift / scale < 0.05, (ls[0], ls[-1])


class TestClosedLoop:
    def test_aliengo_trot_articulated_plant(self, params):
        """Min-mode MPC walks on the articulated plant: the controller's
        SRB model vs the full 18-DoF dynamics is exactly the reference's
        model-mismatch condition (PhysX articulated plant)."""
        from rl_mpc_locomotion_tpu.control import runner
        from rl_mpc_locomotion_tpu.control.types import ControlConfig
        from rl_mpc_locomotion_tpu.ops.qp import production_qp_config

        cfg = ControlConfig(qp=production_qp_config()._replace(
            use_pallas=False))
        pcfg = physics.PhysicsConfig(articulated=True)
        ter = terrain.flat(extent=10.0, cell=0.5)
        st = physics.init_state(params, STAND_Q,
                                float(params.body_height) + 0.03)
        cs = runner.init_state(params, cfg)
        cmd = jnp.array([0.4, 0.0, 0.0], jnp.float32)

        @jax.jit
        def tick(carry, _):
            ps, cs = carry
            body = physics.root_state_vector(ps)
            cs, tau, _ = runner.min_step(params, cfg, cs, ps.q, ps.qd,
                                         body, cmd)
            ps, _, _ = physics.step(params, pcfg, ter, ps, tau)
            return (ps, cs), (ps.pos, ps.v)

        n = 200  # 2 s
        (_, _), (pos, vel) = jax.lax.scan(tick, (st, cs), None, length=n)
        pos, vel = np.asarray(pos), np.asarray(vel)
        assert np.isfinite(pos).all()
        z_late = pos[n // 2:, 2]
        assert np.all(z_late > 0.6 * float(params.body_height)), \
            f"sank: {z_late.min():.3f}"
        vx_late = vel[n // 2:, 0].mean()
        assert 0.1 < vx_late < 0.8, f"vx {vx_late:.2f} for 0.4 cmd"
