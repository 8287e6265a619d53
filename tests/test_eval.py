"""Evaluation metric semantics (ATE/RPE — the benchmark_publisher → evo flow
of the reference, SURVEY.md §2.5/§4)."""
import numpy as np

from plslam.eval.metrics import ate_rmse, rpe
from plslam.utils import quat_np as qnp


def _traj(n=80, dt=0.1, seed=0):
    rng = np.random.default_rng(seed)
    ts = np.arange(n) * dt
    ps = np.cumsum(rng.standard_normal((n, 3)) * 0.1, axis=0)
    qs = np.zeros((n, 4))
    qs[:, 0] = 1.0
    for k in range(1, n):
        qs[k] = qnp.quat_normalize(qnp.quat_mul(qs[k - 1], qnp.quat_exp(rng.standard_normal(3) * 0.05)))
    return ts, ps, qs


def _apply_rigid(ps, qs, R, t):
    return ps @ R.T + t, np.stack([qnp.quat_mul(qnp.rot_to_quat(R), q) for q in qs])


def test_rpe_invariant_to_global_rigid_transform():
    """A globally rigid-transformed copy of GT has exactly zero RPE — the
    property the old delta-norm comparison did NOT have."""
    ts, ps, qs = _traj()
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    ps2, qs2 = _apply_rigid(ps, qs, R, np.array([5.0, -2.0, 1.0]))
    t_rmse, r_rmse = rpe(ts, ps2, ts, ps, est_q=qs2, gt_q=qs, delta=0.5)
    assert t_rmse < 1e-12
    assert r_rmse < 1e-4  # float64 quaternion round-trip noise (~1e-7 deg)


def test_rpe_detects_relative_error():
    """Injected per-pair relative translation error is measured at the right
    magnitude, and rotation drift shows in degrees."""
    ts, ps, qs = _traj()
    rng = np.random.default_rng(1)
    ps2 = ps + np.cumsum(rng.standard_normal((len(ts), 3)) * 0.01, axis=0)
    t_rmse, r_rmse = rpe(ts, ps2, ts, ps, est_q=qs, gt_q=qs, delta=0.5)
    assert 0.005 < t_rmse < 0.5
    assert r_rmse < 1e-4  # orientations identical

    # pure yaw drift: 0.01 rad per 0.1 s step → ~0.05 rad per 0.5 s window
    qs2 = qs.copy()
    dz = np.array([0.0, 0.0, 0.005])
    for k in range(1, len(ts)):
        qs2[k] = qnp.quat_normalize(qnp.quat_mul(qnp.quat_exp(dz * k), qs[k]))
    _, r_rmse2 = rpe(ts, ps, ts, ps, est_q=qs2, gt_q=qs, delta=0.5)
    assert 0.1 < r_rmse2 < 5.0  # ≈ 0.05 rad ≈ 2.9°... order right


def test_ate_zero_on_yaw_rotated_copy():
    ts, ps, qs = _traj()
    th = -0.4
    R = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    ps2, _ = _apply_rigid(ps, qs, R, np.array([1.0, 2.0, 3.0]))
    assert ate_rmse(ts, ps2, ts, ps, align="yaw") < 1e-9
