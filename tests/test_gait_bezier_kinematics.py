"""Tests for gait phase arithmetic, swing Bezier, and leg kinematics against
independent NumPy ports of the reference semantics (Gait.py,
FootSwingTrajectory.py, LegController.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from rl_mpc_locomotion_tpu.ops import bezier, gait, leg_kinematics


# --- independent NumPy oracle of OffsetDurationGait (reference Gait.py) ----
class GaitOracle:
    # float32 throughout, mirroring the reference's DTYPE (utils.py:5) so
    # stance/swing boundary rounding matches bit-for-bit.
    def __init__(self, n, offsets, durations):
        self.n = n
        self.offsets = np.asarray(offsets, np.float32)
        self.durations = np.asarray(durations, np.float32)
        self.offsets_f = (self.offsets / n).astype(np.float32)
        self.durations_f = (self.durations / n).astype(np.float32)

    def set_iterations(self, ipm, counter):
        self.iteration = np.float32(counter / ipm) % self.n
        self.phase = np.float32(counter % (ipm * self.n)) / np.float32(ipm * self.n)

    def contact_state(self):
        out = np.zeros(4, np.float32)
        for i in range(4):
            p = np.float32(self.phase - self.offsets_f[i])
            if p < 0:
                p = np.float32(p + 1.0)
            out[i] = 0.0 if p > self.durations_f[i] else p / self.durations_f[i]
        return out

    def swing_state(self):
        out = np.zeros(4, np.float32)
        for i in range(4):
            so = np.float32(self.offsets_f[i] + self.durations_f[i])
            if so > 1:
                so = np.float32(so - 1.0)
            sd = np.float32(1.0 - self.durations_f[i])
            p = np.float32(self.phase - so)
            if p < 0:
                p = np.float32(p + 1.0)
            if p > sd or sd == 0.0:
                out[i] = 0.0
            else:
                out[i] = p / sd
        return out

    def mpc_table(self):
        table = np.zeros((self.n, 4))
        for i in range(self.n):
            it = (i + self.iteration + 1) % self.n
            for j in range(4):
                p = it - self.offsets[j]
                if p < 0:
                    p += self.n
                table[i, j] = 1.0 if p < self.durations[j] else 0.0
        return table


def gait_rows():
    return [(np.asarray(gait.GAIT_OFFSETS[g]), np.asarray(gait.GAIT_DURATIONS[g]))
            for g in range(gait.NUM_GAITS)]


class TestGait:
    def test_matches_oracle_over_full_cycle(self):
        ipm = 2
        counters = np.arange(45, dtype=np.int32)

        @jax.jit
        def all_states(offs, durs):
            def one(counter):
                it, ph = gait.gait_iteration_phase(counter, ipm)
                return (gait.contact_state(ph, offs, durs),
                        gait.swing_state(ph, offs, durs),
                        gait.mpc_table(it, offs, durs))
            return jax.vmap(one)(jnp.array(counters))

        for offs, durs in gait_rows():
            oracle = GaitOracle(10, offs, durs)
            cs_all, ss_all, mt_all = jax.tree.map(
                np.asarray, all_states(jnp.array(offs, jnp.float32),
                                       jnp.array(durs, jnp.float32)))
            for k, counter in enumerate(counters):
                oracle.set_iterations(ipm, int(counter))
                self._assert_phase_close(cs_all[k], oracle.contact_state(),
                                         offs, durs, oracle.phase,
                                         swing=False)
                self._assert_phase_close(ss_all[k], oracle.swing_state(),
                                         offs, durs, oracle.phase, swing=True)
                np.testing.assert_array_equal(mt_all[k], oracle.mpc_table())

    @staticmethod
    def _assert_phase_close(got, want, offs, durs, phase, swing):
        """Allow divergence only at exact stance/swing boundaries, where the
        real-number progress lands ON the duration boundary and any float
        realization is a coin flip (affects walk/gallop offsets only)."""
        for i in range(4):
            if abs(got[i] - want[i]) <= 1e-5:
                continue
            if swing:
                off = (offs[i] + durs[i]) % 10 / 10.0
                dur = 1.0 - durs[i] / 10.0
            else:
                off = offs[i] / 10.0
                dur = durs[i] / 10.0
            progress = (phase - off) % 1.0
            on_boundary = abs(progress - dur) < 1e-4 or progress < 1e-4
            assert on_boundary, (
                f"leg {i}: got {got[i]} want {want[i]} "
                f"(phase {phase}, progress {progress}, dur {dur})")

    def test_contact_swing_complementary(self):
        # a leg is either in stance or in swing, never both
        offs, durs = gait_rows()[0]
        for counter in range(0, 20):
            _, ph = gait.gait_iteration_phase(jnp.int32(counter), 2)
            cs = np.asarray(gait.contact_state(ph, jnp.array(offs), jnp.array(durs)))
            ss = np.asarray(gait.swing_state(ph, jnp.array(offs), jnp.array(durs)))
            assert np.all((cs > 0) != (ss > 0))


class TestBezier:
    def test_endpoints(self):
        p0 = jnp.array([0.1, -0.2, 0.0])
        pf = jnp.array([0.3, 0.1, -0.02])
        p, v, a = bezier.swing_trajectory(p0, pf, 0.1, jnp.float32(0.0), 0.25)
        np.testing.assert_allclose(np.asarray(p), np.asarray(p0), atol=1e-6)
        p, v, a = bezier.swing_trajectory(p0, pf, 0.1, jnp.float32(1.0), 0.25)
        np.testing.assert_allclose(np.asarray(p), np.asarray(pf), atol=1e-6)

    def test_apex_height(self):
        p0 = jnp.array([0.0, 0.0, -0.3])
        pf = jnp.array([0.2, 0.0, -0.3])
        p, _, _ = bezier.swing_trajectory(p0, pf, 0.1, jnp.float32(0.5), 0.25)
        np.testing.assert_allclose(float(p[2]), -0.2, atol=1e-5)

    def test_matches_reference_formulas(self):
        # independent scalar port of FootSwingTrajectory.py:54-70
        rng = np.random.default_rng(0)
        for _ in range(10):
            p0 = rng.uniform(-0.3, 0.3, 3)
            pf = rng.uniform(-0.3, 0.3, 3)
            h = 0.12
            st = 0.24
            phase = float(rng.uniform(0.01, 0.99))

            def cb(y0, yf, x):
                return y0 + (x**3 + 3 * x**2 * (1 - x)) * (yf - y0)

            def cb1(y0, yf, x):
                return 6 * x * (1 - x) * (yf - y0)

            want_p = cb(p0, pf, phase)
            want_v = cb1(p0, pf, phase) / st
            if phase < 0.5:
                want_p[2] = cb(p0[2], p0[2] + h, phase * 2)
                want_v[2] = cb1(p0[2], p0[2] + h, phase * 2) * 2 / st
            else:
                want_p[2] = cb(p0[2] + h, pf[2], phase * 2 - 1)
                want_v[2] = cb1(p0[2] + h, pf[2], phase * 2 - 1) * 2 / st
            p, v, _ = bezier.swing_trajectory(
                jnp.array(p0, jnp.float32), jnp.array(pf, jnp.float32),
                jnp.float32(h), jnp.float32(phase), jnp.float32(st))
            np.testing.assert_allclose(np.asarray(p), want_p, atol=1e-5)
            np.testing.assert_allclose(np.asarray(v), want_v, atol=1e-4)

    def test_velocity_is_position_derivative(self):
        p0 = jnp.array([0.0, 0.05, -0.3])
        pf = jnp.array([0.25, -0.05, -0.28])
        st = 0.3
        eps = 1e-3
        for phase in [0.2, 0.4, 0.6, 0.8]:
            p1, _, _ = bezier.swing_trajectory(p0, pf, 0.1, jnp.float32(phase - eps), st)
            p2, _, _ = bezier.swing_trajectory(p0, pf, 0.1, jnp.float32(phase + eps), st)
            _, v, _ = bezier.swing_trajectory(p0, pf, 0.1, jnp.float32(phase), st)
            fd = (np.asarray(p2) - np.asarray(p1)) / (2 * eps) / st
            np.testing.assert_allclose(np.asarray(v), fd, atol=1e-2)


# NumPy oracle of LegController.computeLegJacobianAndPosition (:135-171)
def leg_fk_oracle(q, leg, l1, l2, l3):
    side = [1, -1, 1, -1][leg]
    dy, dz1, dz2 = l1 * side, -l2, -l3
    s1, s2, s3 = np.sin(q[0]), np.sin(q[1]), np.sin(q[2])
    c1, c2, c3 = np.cos(q[0]), np.cos(q[1]), np.cos(q[2])
    c23 = c2 * c3 - s2 * s3
    s23 = s2 * c3 + c2 * s3
    p = np.array([dz2 * s23 + dz1 * s2,
                  dy * c1 - dz1 * c2 * s1 - dz2 * s1 * c23,
                  dy * s1 + dz1 * c1 * c2 + dz2 * c1 * c23])
    J = np.array([
        [0.0, dz2 * c23 + dz1 * c2, dz2 * c23],
        [-dy * s1 - dz2 * c1 * c23 - dz1 * c1 * c2,
         dz2 * s1 * s23 + dz1 * s1 * s2, dz2 * s1 * s23],
        [-dz2 * s1 * c23 + dy * c1 - dz1 * c2 * s1,
         -dz2 * c1 * s23 - dz1 * c1 * s2, -dz2 * c1 * s23],
    ])
    return p, J


class TestLegKinematics:
    def test_matches_oracle(self):
        rng = np.random.default_rng(1)
        l1, l2, l3 = 0.083, 0.25, 0.25
        for _ in range(10):
            q = rng.uniform(-1.5, 1.5, (4, 3)).astype(np.float32)
            p, J = leg_kinematics.leg_fk_jacobian(jnp.array(q), l1, l2, l3)
            for leg in range(4):
                pw, Jw = leg_fk_oracle(q[leg], leg, l1, l2, l3)
                np.testing.assert_allclose(np.asarray(p[leg]), pw, atol=1e-5)
                np.testing.assert_allclose(np.asarray(J[leg]), Jw, atol=1e-5)

    def test_jacobian_is_fk_derivative(self):
        l1, l2, l3 = 0.08, 0.213, 0.213
        q = jnp.array(np.random.default_rng(2).uniform(-1, 1, (4, 3)),
                      jnp.float32)
        p, J = leg_kinematics.leg_fk_jacobian(q, l1, l2, l3)
        jac = jax.jacobian(lambda qq: leg_kinematics.leg_fk_jacobian(qq, l1, l2, l3)[0])(q)
        # jac: (4,3,4,3); diagonal leg blocks should equal J
        for leg in range(4):
            np.testing.assert_allclose(np.asarray(jac[leg, :, leg, :]),
                                       np.asarray(J[leg]), atol=1e-4)

    def test_hip_locations_signs(self):
        hips = np.asarray(leg_kinematics.hip_locations(
            jnp.array([0.24, 0.05, 0.0])))
        np.testing.assert_allclose(hips, [[0.24, 0.05, 0], [0.24, -0.05, 0],
                                          [-0.24, 0.05, 0], [-0.24, -0.05, 0]],
                                   atol=1e-7)
