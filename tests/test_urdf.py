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
