"""End-to-end golden tests: the estimator on synthetic sequences with a
perfect frontend — the fixed-capacity-table + solver + marginalization +
sliding machinery must track ground truth (the reference was only ever
validated end-to-end on EuRoC; this is the harnessed equivalent)."""
import numpy as np
import pytest

from plslam.config import PLSlamConfig, SolverConfig
from plslam.eval.metrics import ate_rmse
from plslam.io import synthetic
from plslam.runner import run_synthetic

CONFIG = PLSlamConfig(
    solver=SolverConfig(max_features=96, max_line_feats=24, dtype="float64"),
)


@pytest.fixture(scope="module")
def seq():
    return synthetic.make_sequence(duration=10.0, n_points=140, n_lines=48, seed=11)


def _ate(seq, ts, ps):
    return ate_rmse(ts, ps, np.asarray(seq.frame_t), np.asarray(seq.gt_p), align="yaw")


def test_vio_oracle_init_points_lines(seq):
    ts, ps, qs, est = run_synthetic(seq, CONFIG, oracle_init=True, use_lines=True)
    assert est.initialized
    assert len(ts) > 30
    ate = _ate(seq, ts, ps)
    assert ate < 0.05, f"ATE {ate:.4f} m"


def test_vio_with_pixel_noise(seq):
    noisy = synthetic.make_sequence(
        duration=10.0, n_points=140, n_lines=48, seed=11, pix_noise=0.5,
        acc_noise=0.02, gyr_noise=0.002,
    )
    ts, ps, qs, est = run_synthetic(noisy, CONFIG, oracle_init=True, use_lines=True)
    ate = _ate(noisy, ts, ps)
    assert ate < 0.15, f"ATE {ate:.4f} m"


def test_vio_real_initialization(seq):
    """Full `initialStructure` path: SFM + gyro bias + linear alignment.
    The SFM refinement pass (single-pose + depth-anchored gauge) removes the
    bootstrap scale bias; self-initialized accuracy matches oracle init."""
    ts, ps, qs, est = run_synthetic(seq, CONFIG, oracle_init=False, use_lines=False)
    assert est.initialized, "visual-inertial initialization failed"
    ate = _ate(seq, ts, ps)
    assert ate < 0.05, f"ATE {ate:.4f} m"
