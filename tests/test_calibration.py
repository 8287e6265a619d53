"""Intrinsic calibration (the `intrinsic_calib` offline tool): recover known
pinhole+radtan intrinsics from synthetic planar-target views."""
import jax.numpy as jnp
import numpy as np

from plslam.ops import cameras
from plslam.ops.calibration import calibrate_pinhole_radtan
from plslam.utils.geometry import quat_rotate, rot_to_quat, so3_exp


def test_calibrate_recovers_intrinsics():
    rng = np.random.default_rng(0)
    cam_gt = cameras.PinholeRadTan.create(
        460.0, 455.0, 370.0, 245.0, -0.25, 0.06, 5e-4, -3e-4, dtype=jnp.float64
    )
    # 9×6 chessboard, 4 cm squares
    gx, gy = np.meshgrid(np.arange(9) * 0.04, np.arange(6) * 0.04)
    obj = np.stack([gx.ravel(), gy.ravel()], axis=1)
    obj3 = jnp.asarray(np.concatenate([obj, np.zeros((len(obj), 1))], axis=1))

    views = []
    for k in range(8):
        R = np.asarray(so3_exp(jnp.asarray(rng.uniform(-0.4, 0.4, 3))))
        t = np.array([rng.uniform(-0.1, 0.1), rng.uniform(-0.1, 0.1), rng.uniform(0.5, 0.9)])
        q = rot_to_quat(jnp.asarray(R))
        p_c = quat_rotate(jnp.broadcast_to(q, (len(obj), 4)), obj3) + jnp.asarray(t)
        uv = np.array(cameras.project(cam_gt, p_c))
        uv += rng.standard_normal(uv.shape) * 0.1  # 0.1 px detector noise
        views.append(uv)

    cam_est, rms = calibrate_pinhole_radtan(obj, np.stack(views))
    assert rms < 0.2, rms
    assert abs(float(cam_est.fx) - 460.0) < 1.0
    assert abs(float(cam_est.fy) - 455.0) < 1.0
    assert abs(float(cam_est.cx) - 370.0) < 1.5
    assert abs(float(cam_est.cy) - 245.0) < 1.5
    assert abs(float(cam_est.k1) + 0.25) < 0.01
    assert abs(float(cam_est.k2) - 0.06) < 0.03
