"""URDF loading tests: synthetic URDF roundtrip + (when available) the
upstream Unitree descriptions against the hardcoded constants."""
import os
import tempfile

import numpy as np
import pytest

from rl_mpc_locomotion_tpu.models import robots
from rl_mpc_locomotion_tpu.models.urdf import params_from_urdf

SYNTHETIC = """<?xml version="1.0"?>
<robot name="testbot">
  <link name="trunk">
    <inertial>
      <mass value="10.0"/>
      <inertia ixx="0.03" ixy="0" ixz="0" iyy="0.15" iyz="0" izz="0.17"/>
    </inertial>
  </link>
  <joint name="FL_hip_joint" type="revolute">
    <origin xyz="0.24 0.05 0"/>
    <parent link="trunk"/><child link="FL_hip"/>
  </joint>
  <link name="FL_hip"/>
  <joint name="FL_thigh_joint" type="continuous">
    <origin xyz="0 0.085 0"/>
    <parent link="FL_hip"/><child link="FL_thigh"/>
  </joint>
  <link name="FL_thigh"/>
  <joint name="FL_calf_joint" type="revolute">
    <origin xyz="0 0 -0.25"/>
    <parent link="FL_thigh"/><child link="FL_calf"/>
  </joint>
  <link name="FL_calf"/>
  <joint name="FL_foot_fixed" type="fixed">
    <origin xyz="0 0 -0.24"/>
    <parent link="FL_calf"/><child link="FL_foot"/>
  </joint>
  <link name="FL_foot"/>
</robot>
"""

UPSTREAM_ALIENGO = "/root/reference/assets/aliengo_description/urdf/aliengo.urdf"
ASSETS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "assets")


class TestSyntheticUrdf:
    def test_roundtrip(self):
        path = tempfile.mktemp(suffix=".urdf")
        with open(path, "w") as f:
            f.write(SYNTHETIC)
        p = params_from_urdf(path, body_height=0.3, mass_scale=2.0)
        assert float(p.abad_link_length) == pytest.approx(0.085)
        assert float(p.hip_link_length) == pytest.approx(0.25)
        assert float(p.knee_link_length) == pytest.approx(0.24)
        np.testing.assert_allclose(np.asarray(p.abad_location),
                                   [0.24, 0.05, 0], atol=1e-7)
        assert float(p.body_mass) == pytest.approx(20.0)
        assert float(p.body_height) == pytest.approx(0.3)

    def test_missing_joint_raises(self):
        path = tempfile.mktemp(suffix=".urdf")
        with open(path, "w") as f:
            f.write(SYNTHETIC.replace("FL_foot_fixed", "FL_toe_fixed"))
        with pytest.raises(KeyError):
            params_from_urdf(path, body_height=0.3)


class TestRealUnitreeAssets:
    """The VENDORED Unitree URDFs (assets/, in-repo) against the
    hand-entered controller constants in models/robots.py.

    Provenance of the constants (Quadruped.py:16-73): Go1's were derived
    from its URDF exactly (robots.go1 = urdf x {mass 2, inertia 5}), so
    the loader must reproduce them to the bit; Aliengo's and A1's are
    Cheetah-Software-style hand numbers (e.g. Aliengo mass 9.041*2 vs
    URDF trunk 11.644), so for those the geometry must agree to manual-
    rounding tolerance and the inertials must match the raw file."""

    def test_go1_reproduces_hardcoded_exactly(self):
        p = params_from_urdf(os.path.join(ASSETS, "go1.urdf"),
                             body_height=0.26, mass_scale=2.0,
                             inertia_scale=5.0,
                             mpc_weights=np.asarray(
                                 robots.go1_params().mpc_weights))
        ref = robots.go1_params()
        np.testing.assert_allclose(np.asarray(p.abad_location),
                                   np.asarray(ref.abad_location), atol=1e-7)
        assert float(p.abad_link_length) == pytest.approx(
            float(ref.abad_link_length), abs=1e-7)
        assert float(p.hip_link_length) == pytest.approx(
            float(ref.hip_link_length), abs=1e-7)
        assert float(p.knee_link_length) == pytest.approx(
            float(ref.knee_link_length), abs=1e-7)
        assert float(p.body_mass) == pytest.approx(float(ref.body_mass),
                                                   rel=1e-6)
        np.testing.assert_allclose(np.asarray(p.body_inertia),
                                   np.asarray(ref.body_inertia), rtol=1e-6)

    @pytest.mark.parametrize("name,ref_fn,geom_tol,loc_tol", [
        ("aliengo", robots.aliengo_params, 0.004, 0.001),
        ("a1", robots.a1_params, 0.0015, 0.003),
    ])
    def test_geometry_matches_hand_constants(self, name, ref_fn, geom_tol,
                                             loc_tol):
        p = params_from_urdf(os.path.join(ASSETS, f"{name}.urdf"),
                             body_height=float(ref_fn().body_height))
        ref = ref_fn()
        # hip/knee link lengths are exact in both files
        assert float(p.hip_link_length) == pytest.approx(
            float(ref.hip_link_length), abs=1e-6)
        assert float(p.knee_link_length) == pytest.approx(
            float(ref.knee_link_length), abs=1e-6)
        # abad offset/location: manual rounding in Quadruped.py
        assert abs(float(p.abad_link_length)
                   - float(ref.abad_link_length)) < geom_tol
        np.testing.assert_allclose(np.asarray(p.abad_location),
                                   np.asarray(ref.abad_location),
                                   atol=loc_tol)

    def test_raw_inertials_loaded(self):
        """Spot-check the parser reads the files' inertial blocks verbatim
        (no scales): values straight from the vendored XML."""
        p = params_from_urdf(os.path.join(ASSETS, "aliengo.urdf"),
                             body_height=0.35)
        assert float(p.body_mass) == pytest.approx(11.644)
        np.testing.assert_allclose(
            np.diag(np.asarray(p.body_inertia)),
            [0.051944892, 0.24693924, 0.270948307], rtol=1e-6)
        p = params_from_urdf(os.path.join(ASSETS, "a1.urdf"),
                             body_height=0.26)
        assert float(p.body_mass) == pytest.approx(6.0)

    def test_urdf_params_walk(self):
        """End-to-end: a robot built purely from the vendored Go1 URDF
        (reference scale factors applied) walks in the closed loop."""
        import jax
        import jax.numpy as jnp
        from rl_mpc_locomotion_tpu.control import runner
        from rl_mpc_locomotion_tpu.control.types import ControlConfig
        from rl_mpc_locomotion_tpu.ops import rotations as rot
        from rl_mpc_locomotion_tpu.sim import physics, terrain

        p = params_from_urdf(os.path.join(ASSETS, "go1.urdf"),
                             body_height=0.26, mass_scale=2.0,
                             inertia_scale=5.0,
                             mpc_weights=np.asarray(
                                 robots.go1_params().mpc_weights))
        cfg = ControlConfig()
        pcfg = physics.PhysicsConfig()
        ter = terrain.flat()
        q0 = jnp.tile(jnp.array([0.0, 0.8, -1.6], jnp.float32), 4)
        commands = jnp.array([0.4, 0.0, 0.0], jnp.float32)

        @jax.jit
        def rollout():
            ps = physics.init_state(p, q0, float(p.body_height) + 0.03)
            cs = runner.init_state(p, cfg)

            def tick(carry, _):
                ps, cs = carry
                body = physics.root_state_vector(ps)
                cs, tau, _ = runner.min_step(p, cfg, cs, ps.q, ps.qd, body,
                                             commands)
                ps, _, _ = physics.step(p, pcfg, ter, ps, tau)
                return (ps, cs), ps.pos[2]

            (ps, _), zs = jax.lax.scan(tick, (ps, cs), None, length=200)
            return ps.pos, zs

        pos, zs = jax.block_until_ready(rollout())
        pos, zs = np.asarray(pos), np.asarray(zs)
        assert np.isfinite(zs).all()
        assert zs.min() > 0.6 * 0.26
        assert pos[0] > 0.3


@pytest.mark.skipif(not os.path.exists(UPSTREAM_ALIENGO),
                    reason="upstream assets not mounted")
class TestUpstreamUrdf:
    def test_aliengo_matches_hardcoded(self):
        """The URDF-derived geometry must be close to the reference's
        hardcoded Quadruped constants (they differ by small manual
        rounding: 0.2407 vs 0.2399, 0.0868 vs 0.083)."""
        p = params_from_urdf(UPSTREAM_ALIENGO, body_height=0.35,
                             mass_scale=2.0)
        ref = robots.aliengo_params()
        assert abs(float(p.hip_link_length)
                   - float(ref.hip_link_length)) < 1e-6
        assert abs(float(p.knee_link_length)
                   - float(ref.knee_link_length)) < 1e-6
        assert abs(float(p.abad_link_length)
                   - float(ref.abad_link_length)) < 0.005
        np.testing.assert_allclose(np.asarray(p.abad_location),
                                   np.asarray(ref.abad_location), atol=0.002)
        # trunk mass 11.644 vs the controller's inflated 9.041*2: within 30%
        assert abs(float(p.body_mass) / float(ref.body_mass) - 1.0) < 0.35
