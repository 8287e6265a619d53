"""Full image-pipeline smoke test: rendered PNG dataset (EuRoC ASL layout) →
native decode → CLAHE → point+line frontends → initialization → estimator.

This drives every stage the real-EuRoC path uses. Accuracy on rendered blob
imagery is a smoke bound, not parity (frontend tuning on real imagery is the
next-round task — see STATUS.md)."""
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
    seq = synthetic.make_sequence(duration=7.0, n_points=400, n_lines=40, seed=17)
    cam = PinholeRadTan.create(180.0, 180.0, W / 2, H / 2)
    render.write_euroc_dataset(seq, str(tmp_path), cam, H, W, max_frames=130)

    R_bc = np.array(quat_to_rot(seq.q_bc))
    cfg = PLSlamConfig(
        camera=CameraConfig(image_width=W, image_height=H, fx=180.0, fy=180.0,
                            cx=W / 2, cy=H / 2, k1=0, k2=0, p1=0, p2=0),
        tracker=TrackerConfig(max_cnt=120, min_dist=20, equalize=True),
        solver=SolverConfig(max_features=96, max_line_feats=24, dtype="float64",
                            focal_length=180.0),  # whitening matches the camera
        extrinsic=ExtrinsicConfig(0, tuple(R_bc.reshape(-1)), tuple(np.array(seq.p_bc))),
        loop=LoopConfig(loop_closure=False),
    )
    ts, ps, qs, est, pg = run_euroc(str(tmp_path), cfg, use_lines=True)
    assert est.initialized, "image pipeline failed to initialize"
    assert len(ts) > 30
    m = est.metrics[-1]
    assert m.get("n_pts", 0) >= 5  # solver consumed image-derived features
    ate = ate_rmse(ts, ps, np.asarray(seq.frame_t), np.asarray(seq.gt_p), align="yaw")
    assert np.isfinite(ate) and ate < 8.0, f"smoke ATE {ate:.2f} m"
