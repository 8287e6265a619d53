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
from plslam.runner import run_synthetic_large_window


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
