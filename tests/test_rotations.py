"""Unit tests for ops.rotations against scipy.spatial.transform oracles and
the reference's conventions."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax
import jax.numpy as jnp

from rl_mpc_locomotion_tpu.ops import rotations as rot


def random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return q.astype(np.float32)  # (w,x,y,z)


def to_scipy(q_wxyz):
    w, x, y, z = q_wxyz
    return R.from_quat([x, y, z, w])


class TestQuatToRot:
    def test_vs_scipy(self):
        for q in random_quats(20):
            got = np.asarray(rot.quat_to_rot(jnp.array(q)))
            # reference convention: world->body = active matrix transposed
            want = to_scipy(q).as_matrix().T
            np.testing.assert_allclose(got, want, atol=1e-5)

    def test_rotates_world_to_body(self):
        # 90 deg yaw: world x axis appears as -y in body frame? Check via scipy
        q = R.from_euler("z", np.pi / 2).as_quat()  # x,y,z,w
        qw = jnp.array([q[3], q[0], q[1], q[2]], jnp.float32)
        v_world = jnp.array([1.0, 0.0, 0.0])
        v_body = rot.quat_to_rot(qw) @ v_world
        np.testing.assert_allclose(np.asarray(v_body), [0, -1, 0], atol=1e-6)


class TestRpy:
    def test_quat_to_rpy_vs_scipy(self):
        for q in random_quats(20, seed=1):
            got = np.asarray(rot.quat_to_rpy(jnp.array(q)))
            want = to_scipy(q).as_euler("xyz")  # extrinsic XYZ == rpy
            np.testing.assert_allclose(got, want, atol=2e-4)

    def test_rpy_roundtrip(self):
        rng = np.random.default_rng(2)
        for _ in range(20):
            rpy = rng.uniform([-np.pi, -np.pi / 2 + 0.1, -np.pi],
                              [np.pi, np.pi / 2 - 0.1, np.pi]).astype(np.float32)
            q = rot.rpy_to_quat(jnp.array(rpy))
            back = np.asarray(rot.quat_to_rpy(q))
            np.testing.assert_allclose(back, rpy, atol=1e-4)

    def test_rpy_to_rot_matches_quat_path(self):
        rng = np.random.default_rng(3)
        for _ in range(10):
            rpy = rng.uniform(-1.0, 1.0, 3).astype(np.float32)
            r1 = np.asarray(rot.rpy_to_rot(jnp.array(rpy)))
            r2 = np.asarray(rot.quat_to_rot(rot.rpy_to_quat(jnp.array(rpy))))
            np.testing.assert_allclose(r1, r2, atol=1e-5)


class TestRotToQuat:
    def test_roundtrip_all_branches(self):
        # rotations near 180 deg about each axis hit all 4 Shepperd branches
        cases = [R.identity()]
        for axis in ["x", "y", "z"]:
            cases.append(R.from_euler(axis, np.pi - 1e-3))
            cases.append(R.from_euler(axis, np.pi / 2))
        rng = np.random.default_rng(4)
        cases += [R.random(random_state=int(rng.integers(1e6))) for _ in range(10)]
        for rr in cases:
            m = rr.as_matrix().T.astype(np.float32)  # coordinate transform
            q = np.asarray(rot.rot_to_quat(jnp.array(m)))
            m2 = np.asarray(rot.quat_to_rot(jnp.array(q)))
            np.testing.assert_allclose(m2, m, atol=1e-3)


class TestCoordinateRotations:
    def test_rot_z_transforms_into_frame(self):
        # matches orientation_tools.py:20-26 semantics
        v = jnp.array([1.0, 0.0, 0.0])
        out = rot.rot_z(jnp.float32(np.pi / 2)) @ v
        np.testing.assert_allclose(np.asarray(out), [0, -1, 0], atol=1e-6)


class TestSkewAndNormals:
    def test_skew(self):
        v = np.array([1.0, 2.0, 3.0], np.float32)
        w = np.array([-0.3, 0.5, 0.1], np.float32)
        got = np.asarray(rot.skew(jnp.array(v))) @ w
        np.testing.assert_allclose(got, np.cross(v, w), atol=1e-6)

    def test_rot_from_normals_aligns(self):
        n1 = np.array([0, 0, 1.0], np.float32)
        n2 = np.array([0.1, -0.05, 1.0], np.float32)
        n2 /= np.linalg.norm(n2)
        m = np.asarray(rot.rot_from_normals(jnp.array(n1), jnp.array(n2)))
        # m is a coordinate transform (transposed active rotation)
        np.testing.assert_allclose(m.T @ n1, n2, atol=1e-5)

    def test_identity_when_aligned(self):
        n = jnp.array([0.0, 0.0, 1.0])
        m = np.asarray(rot.rot_from_normals(n, n))
        np.testing.assert_allclose(m, np.eye(3), atol=1e-5)


def test_everything_jits_and_vmaps():
    qs = jnp.array(random_quats(8, seed=5))
    f = jax.jit(jax.vmap(rot.quat_to_rpy))
    out = f(qs)
    assert out.shape == (8, 3)
    assert not np.any(np.isnan(np.asarray(out)))
