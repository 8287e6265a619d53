"""Frontend→backend software pipelining (PP, SURVEY.md §2.6): the pipelined
runner must produce BIT-IDENTICAL outputs to the synchronous loop — the
pipeline overlaps image decode+CLAHE with the solve, it never changes what is
computed."""
import numpy as np
import pytest

from plslam.config import (
    CameraConfig, ExtrinsicConfig, LoopConfig, PLSlamConfig, SolverConfig, TrackerConfig,
)
from plslam.io import render, synthetic
from plslam.ops.cameras import PinholeRadTan
from plslam.runner import run_euroc
from plslam.utils.geometry import quat_to_rot


@pytest.mark.slow
def test_pipelined_runner_identical_to_synchronous(tmp_path):
    H, W = 160, 240
    params = synthetic.TrajectoryParams(omega=0.3, z_omega=0.6)
    seq = synthetic.make_sequence(duration=4.0, n_points=300, n_lines=0, seed=9,
                                  params=params)
    cam = PinholeRadTan.create(120.0, 120.0, W / 2, H / 2)
    render.write_euroc_dataset(seq, str(tmp_path), cam, H, W, max_frames=80,
                               blob_sigma=2.5, style="textured")

    R_bc = np.array(quat_to_rot(seq.q_bc))
    cfg = PLSlamConfig(
        camera=CameraConfig(image_width=W, image_height=H, fx=120.0, fy=120.0,
                            cx=W / 2, cy=H / 2, k1=0, k2=0, p1=0, p2=0),
        tracker=TrackerConfig(max_cnt=60, min_dist=16, equalize=True, min_score=2e-3),
        solver=SolverConfig(max_features=48, max_line_feats=8, dtype="float64",
                            focal_length=120.0),
        extrinsic=ExtrinsicConfig(0, tuple(R_bc.reshape(-1)), tuple(np.array(seq.p_bc))),
        loop=LoopConfig(loop_closure=False),
    )
    ts_p, ps_p, qs_p, est_p, _ = run_euroc(str(tmp_path), cfg, use_lines=False,
                                           pipeline=True)
    ts_s, ps_s, qs_s, est_s, _ = run_euroc(str(tmp_path), cfg, use_lines=False,
                                           pipeline=False)
    assert len(ts_p) == len(ts_s) > 0
    np.testing.assert_array_equal(ts_p, ts_s)
    np.testing.assert_array_equal(ps_p, ps_s)
    np.testing.assert_array_equal(qs_p, qs_s)
