"""IO tests: config YAML round-trip, TUM trajectory I/O, metrics JSONL,
checkpoint/resume mid-sequence."""
import numpy as np
import pytest

from plslam.config import PLSlamConfig, SolverConfig
from plslam.eval import metrics as ev
from plslam.io import synthetic
from plslam.io.checkpoint import load_estimator, save_estimator
from plslam.models.estimator import Estimator
from plslam.runner import run_synthetic
from plslam.utils.metrics_log import MetricsLogger, read_jsonl

EUROC_YAML = """%YAML:1.0
imu_topic: "/imu0"
image_topic: "/cam0/image_raw"
model_type: PINHOLE
image_width: 752
image_height: 480
distortion_parameters:
   k1: -0.28340811
   k2: 0.07395907
   p1: 0.00019359
   p2: 1.76187114e-05
projection_parameters:
   fx: 458.654
   fy: 457.296
   cx: 367.215
   cy: 248.375
estimate_extrinsic: 0
max_cnt: 150
min_dist: 30
freq: 10
F_threshold: 1.0
equalize: 1
max_solver_time: 0.04
max_num_iterations: 8
keyframe_parallax: 10.0
acc_n: 0.08
gyr_n: 0.004
acc_w: 0.00004
gyr_w: 2.0e-6
g_norm: 9.81007
estimate_td: 0
td: 0.0
loop_closure: 1
"""


def test_config_from_reference_yaml(tmp_path):
    p = tmp_path / "euroc.yaml"
    p.write_text(EUROC_YAML)
    cfg = PLSlamConfig.from_yaml(str(p))
    assert cfg.camera.fx == 458.654
    assert cfg.camera.k1 == -0.28340811
    assert cfg.tracker.max_cnt == 150
    assert cfg.solver.max_num_iterations == 8
    assert cfg.imu.gyr_w == 2.0e-6
    assert cfg.loop.loop_closure


def test_tum_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    ts = np.arange(10) * 0.1
    ps = rng.standard_normal((10, 3))
    qs = rng.standard_normal((10, 4))
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    path = str(tmp_path / "traj.tum")
    ev.write_tum(path, ts, ps, qs)
    t2, p2, q2 = ev.read_tum(path)
    np.testing.assert_allclose(p2, ps, atol=1e-6)
    np.testing.assert_allclose(np.abs(np.sum(q2 * qs, axis=1)), 1.0, atol=1e-6)


def test_ate_zero_for_identical():
    ts = np.arange(50) * 0.1
    ps = np.cumsum(np.random.default_rng(1).standard_normal((50, 3)) * 0.1, axis=0)
    assert ev.ate_rmse(ts, ps, ts, ps, align="yaw") < 1e-12
    # known constant offset + yaw is removed by alignment
    th = 0.4
    R = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    ps2 = ps @ R.T + np.array([1.0, -2.0, 0.5])
    assert ev.ate_rmse(ts, ps2, ts, ps, align="yaw") < 1e-9


def test_metrics_logger(tmp_path):
    path = str(tmp_path / "m.jsonl")
    log = MetricsLogger(path)
    log.log({"t": 1.0, "cost": np.float64(3.5), "n": 4})
    log.log({"t": 2.0, "keyframe": True})
    log.close()
    rows = read_jsonl(path)
    assert len(rows) == 2 and rows[0]["cost"] == 3.5


@pytest.mark.slow
def test_checkpoint_resume():
    cfg = PLSlamConfig(solver=SolverConfig(max_features=64, max_line_feats=16, dtype="float64"))
    seq = synthetic.make_sequence(duration=6.0, n_points=100, n_lines=24, seed=21)
    ts, ps, qs, est = run_synthetic(seq, cfg, oracle_init=True, max_frames=40)
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.npz")
        save_estimator(est, path)
        est2 = Estimator(cfg)
        load_estimator(est2, path)
    assert est2.initialized == est.initialized
    np.testing.assert_allclose(est2.p, est.p, atol=1e-12)
    np.testing.assert_allclose(est2.pt_table.inv_depth, est.pt_table.inv_depth, atol=1e-12)
    assert (est2.pt_table.ids == est.pt_table.ids).all()


def _run_frames(est, seq, k0, k1, stride=2):
    """Drive the estimator over processed-frame indices [k0, k1) with
    index-deterministic IMU dts (so an interrupted run can resume exactly)."""
    imu_t = np.asarray(seq.imu_t)
    frame_t = np.asarray(seq.frame_t)[::stride]
    obs = np.asarray(seq.obs)[::stride]
    valid = np.asarray(seq.obs_valid)[::stride]
    gt_p = np.asarray(seq.gt_p)[::stride]
    gt_q = np.asarray(seq.gt_q)[::stride]
    gt_v = np.asarray(seq.gt_v)[::stride]
    for k in range(k0, k1):
        t = frame_t[k]
        lo = frame_t[k - 1] if k > 0 else -np.inf
        for i in np.nonzero((imu_t > lo + 1e-9) & (imu_t <= t + 1e-9))[0]:
            dt = imu_t[i] - imu_t[i - 1] if i > 0 else 0.005
            est.process_imu(dt, np.asarray(seq.imu_acc[i]), np.asarray(seq.imu_gyr[i]))
        vis = np.nonzero(valid[k])[0]
        est.process_frame(
            float(t), vis, obs[k, vis], None, None, None,
            oracle_state={"p": gt_p[k], "q": gt_q[k], "v": gt_v[k]},
        )


@pytest.mark.slow
def test_checkpoint_exact_resume(tmp_path):
    """Resume must continue processing EXACTLY like the uninterrupted run —
    including the open IMU interval's boundary sample (last_acc/last_gyr),
    which a checkpoint taken right after process_frame would otherwise lose
    (ADVICE r1)."""
    cfg = PLSlamConfig(solver=SolverConfig(max_features=64, max_line_feats=16, dtype="float64"))
    seq = synthetic.make_sequence(duration=8.0, n_points=100, n_lines=8, seed=5)

    est_full = Estimator(cfg)
    _run_frames(est_full, seq, 0, 34)

    est_half = Estimator(cfg)
    _run_frames(est_half, seq, 0, 21)
    path = str(tmp_path / "ck.npz")
    save_estimator(est_half, path)
    est_res = Estimator(cfg)
    load_estimator(est_res, path)
    assert est_res.last_acc is not None, "boundary sample must survive the checkpoint"
    _run_frames(est_res, seq, 21, 34)

    np.testing.assert_allclose(est_res.p, est_full.p, atol=1e-9)
    np.testing.assert_allclose(est_res.v, est_full.v, atol=1e-9)
    np.testing.assert_allclose(est_res.q, est_full.q, atol=1e-9)
    np.testing.assert_allclose(est_res.ba, est_full.ba, atol=1e-9)
