"""Live large-window mode (SURVEY.md §5.7): the streamed sliding-window
trajectory refined by keyframe-partitioned consensus BA over the FULL
keyframe history must beat (or match) the sliding window on the same noisy
sequence — the beyond-reference capability as a runnable mode, not just a
tested solver."""
import numpy as np
import pytest

from plslam.config import PLSlamConfig, SolverConfig
from plslam.eval.metrics import ate_rmse
from plslam.io import synthetic
from plslam.runner import run_euroc_large_window, run_synthetic_large_window


@pytest.mark.slow
def test_large_window_refines_live_trajectory():
    seq = synthetic.make_sequence(
        duration=20.0, n_points=200, n_lines=0, seed=13,
        pix_noise=0.6, acc_noise=0.05, gyr_noise=0.003,
    )
    cfg = PLSlamConfig(solver=SolverConfig(max_features=96, max_line_feats=8,
                                           dtype="float64"))
    kf_t, live_p, ref_p, ref_q, est = run_synthetic_large_window(
        seq, cfg, rounds=3, num_iters=8)
    assert len(kf_t) >= 31  # a genuinely large window (3+ partitions)

    gt_t = np.asarray(seq.frame_t)
    gt_p = np.asarray(seq.gt_p)
    ate_live = ate_rmse(kf_t, live_p, gt_t, gt_p, align="yaw")
    ate_ref = ate_rmse(kf_t, ref_p, gt_t, gt_p, align="yaw")
    # the full-history BA must not be worse than the sliding window, and on a
    # noisy sequence it should measurably improve it
    assert ate_ref <= ate_live * 1.02, (ate_live, ate_ref)
    assert ate_ref < ate_live * 0.9 or ate_ref < 0.02, (ate_live, ate_ref)


@pytest.mark.slow
def test_distributed_large_window_from_images(tmp_path):
    """Distributed BA from IMAGES, not pre-packed windows (SURVEY.md §2.6
    TP/SP rows e2e): the rendered image pipeline streams with tracks
    recorded, then the full keyframe history re-solves as consensus BA with
    every partition's landmark system sharded over the ('kf_part','lmk')
    mesh — on the forced 8-device CPU mesh this runs 2 partitions × 4
    landmark shards as ONE SPMD program. Everything downstream of the
    frontends (observations, depths, initial states) comes from the live
    run; the refinement must not degrade the live trajectory."""
    import jax

    from plslam.config import (
        CameraConfig, ExtrinsicConfig, LoopConfig, TrackerConfig,
    )
    from plslam.io import render
    from plslam.ops.cameras import PinholeRadTan
    from plslam.utils.geometry import quat_to_rot

    assert len(jax.devices()) >= 8, "conftest should force 8 CPU devices"
    H, W, f = 480, 752, 460.0
    params = synthetic.TrajectoryParams(omega=0.4, z_omega=0.7, wiggle_amp=0.15,
                                        excite_amp=0.1)
    seq = synthetic.make_sequence(duration=12.0, n_points=500, n_lines=0,
                                  seed=31, params=params, acc_noise=0.18,
                                  gyr_noise=0.009, acc_bias=0.1, gyr_bias=0.004)
    cam = PinholeRadTan.create(f, f, W / 2, H / 2)
    render.write_euroc_dataset(seq, str(tmp_path), cam, H, W, max_frames=240,
                               blob_sigma=3.0, style="textured")
    R_bc = np.array(quat_to_rot(seq.q_bc))
    cfg = PLSlamConfig(
        camera=CameraConfig(image_width=W, image_height=H, fx=f, fy=f,
                            cx=W / 2, cy=H / 2, k1=0, k2=0, p1=0, p2=0),
        tracker=TrackerConfig(max_cnt=100, min_dist=30, equalize=True, min_score=2e-3),
        solver=SolverConfig(max_features=96, max_line_feats=24, dtype="float64",
                            focal_length=f),
        extrinsic=ExtrinsicConfig(0, tuple(R_bc.reshape(-1)), tuple(np.array(seq.p_bc))),
        loop=LoopConfig(loop_closure=False),
    )
    kf_t, live_p, ref_p, ref_q, est = run_euroc_large_window(
        str(tmp_path), cfg, kf_stride=2, rounds=3, num_iters=8)
    assert est.initialized
    assert len(kf_t) == 2 * cfg.solver.window_size + 1  # 2 mesh-row partitions

    gt_t = np.asarray(seq.frame_t)
    gt_p = np.asarray(seq.gt_p)
    ate_live = ate_rmse(kf_t, live_p, gt_t, gt_p, align="yaw")
    ate_ref = ate_rmse(kf_t, ref_p, gt_t, gt_p, align="yaw")
    assert np.isfinite(ate_ref)
    # real-track refinement must not degrade the live trajectory, and on
    # this noisy sequence it should improve it (measured: 0.042 → 0.037 m)
    assert ate_ref <= ate_live * 1.02, (ate_live, ate_ref)
    assert ate_ref < ate_live * 0.95 or ate_ref < 0.03, (ate_live, ate_ref)
