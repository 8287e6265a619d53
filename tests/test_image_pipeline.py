"""Full image-pipeline end-to-end: rendered PNG dataset (EuRoC ASL layout) →
native decode → CLAHE → point+line frontends → initialization → estimator.

Drives every stage the real-EuRoC path uses; with a feature-persistent scene
the rendered-image run reaches reference-class accuracy (ATE < 0.5 m over
8 s) — validated at 0.17 m in development."""
import numpy as np
import pytest

from plslam.config import (
    CameraConfig, ExtrinsicConfig, LoopConfig, PLSlamConfig, SolverConfig, TrackerConfig,
)
from plslam.eval.metrics import ate_rmse
from plslam.io import render, synthetic
from plslam.ops.cameras import PinholeRadTan
from plslam.runner import run_euroc
from plslam.utils.geometry import quat_to_rot


@pytest.mark.slow
def test_rendered_euroc_pipeline(tmp_path):
    H, W = 240, 376
    params = synthetic.TrajectoryParams(omega=0.3, z_omega=0.6)
    seq = synthetic.make_sequence(duration=8.0, n_points=500, n_lines=40, seed=17, params=params)
    cam = PinholeRadTan.create(160.0, 160.0, W / 2, H / 2)
    render.write_euroc_dataset(seq, str(tmp_path), cam, H, W, max_frames=160)

    R_bc = np.array(quat_to_rot(seq.q_bc))
    cfg = PLSlamConfig(
        camera=CameraConfig(image_width=W, image_height=H, fx=160.0, fy=160.0,
                            cx=W / 2, cy=H / 2, k1=0, k2=0, p1=0, p2=0),
        tracker=TrackerConfig(max_cnt=100, min_dist=18, equalize=True, min_score=2e-3),
        solver=SolverConfig(max_features=96, max_line_feats=24, dtype="float64",
                            focal_length=160.0),  # whitening matches the camera
        extrinsic=ExtrinsicConfig(0, tuple(R_bc.reshape(-1)), tuple(np.array(seq.p_bc))),
        loop=LoopConfig(loop_closure=False),
    )
    ts, ps, qs, est, pg = run_euroc(str(tmp_path), cfg, use_lines=True)
    assert est.initialized, "image pipeline failed to initialize"
    assert len(ts) > 40
    m = est.metrics[-1]
    assert m.get("n_pts", 0) >= 30  # solver consumed image-derived features
    assert m.get("n_lines", 0) >= 2
    ate = ate_rmse(ts, ps, np.asarray(seq.frame_t), np.asarray(seq.gt_p), align="yaw")
    assert ate < 0.5, f"image-pipeline ATE {ate:.3f} m"
