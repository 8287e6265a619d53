"""Initializer unit tests: essential RANSAC, gyro-bias LS, hand-eye extrinsic
calibration (the `initial/` package of the reference)."""
import jax.numpy as jnp
import numpy as np
import pytest

from plslam.models import initializer as ini
from plslam.utils.geometry import quat_conj, quat_exp, quat_mul, quat_to_rot, rot_to_quat


def test_essential_ransac_recovers_pose():
    rng = np.random.default_rng(0)
    n = 60
    pts = rng.uniform(-2, 2, (n, 3)) + [0, 0, 6]
    from plslam.utils.geometry import so3_exp

    R_gt = np.asarray(so3_exp(jnp.asarray([0.02, -0.05, 0.1])))
    t_gt = np.array([0.4, 0.1, -0.05])
    p1 = pts[:, :2] / pts[:, 2:3]
    pc2 = pts @ R_gt.T + t_gt
    p2 = pc2[:, :2] / pc2[:, 2:3]
    out = ini.essential_ransac(p1, p2)
    assert out is not None
    R, t, inl = out
    assert inl.sum() > n * 0.9
    np.testing.assert_allclose(R, R_gt, atol=1e-4)
    t_dir = t / np.linalg.norm(t)
    t_gt_dir = t_gt / np.linalg.norm(t_gt)
    assert abs(float(t_dir @ t_gt_dir)) > 0.9999


def test_hand_eye_extrinsic_calibration():
    """CalibrationExRotation recovers a known R_bc from rotation-delta pairs."""
    rng = np.random.default_rng(1)
    q_bc = np.asarray(rot_to_quat(jnp.asarray(
        np.asarray(quat_to_rot(quat_exp(jnp.asarray([0.3, -1.2, 0.5]))))
    )))
    q_bc_j = jnp.asarray(q_bc)
    q_imu, q_cam = [], []
    for _ in range(20):
        dq_b = quat_exp(jnp.asarray(rng.standard_normal(3) * 0.2))
        # camera delta: q_cam = q_bc⁻¹ ⊗ q_imu ⊗ q_bc
        dq_c = quat_mul(quat_mul(quat_conj(q_bc_j), dq_b), q_bc_j)
        q_imu.append(np.asarray(dq_b))
        q_cam.append(np.asarray(dq_c))
    q_est, ok = ini.calibrate_extrinsic_rotation(q_cam, q_imu)
    assert ok
    # same rotation up to sign
    d = abs(float(np.dot(q_est, q_bc)))
    assert d > 0.99999, (q_est, q_bc)
