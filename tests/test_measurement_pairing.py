"""Measurement alignment: the `getMeasurements` boundary-sample interpolation
(SURVEY.md §3.3 / :119) — each keyframe interval's preintegration must span
EXACTLY the (td-shifted) frame gap, with frame timestamps off the IMU grid."""
import numpy as np
import pytest

from plslam.config import PLSlamConfig, SolverConfig, TemporalConfig
from plslam.models.estimator import Estimator
from plslam.runner import ImuFeeder

IMU_HZ = 200.0


def _imu_stream(duration=3.0):
    """Smoothly varying IMU signal on an exact 200 Hz grid."""
    t = np.arange(0.0, duration, 1.0 / IMU_HZ)
    acc = np.stack([0.3 * np.sin(2.1 * t), 0.2 * np.cos(1.7 * t), 9.81 + 0.1 * np.sin(0.9 * t)], axis=1)
    gyr = np.stack([0.1 * np.sin(1.3 * t), 0.05 * np.cos(2.3 * t), 0.2 * np.sin(0.7 * t)], axis=1)
    return t, acc, gyr


def _run_frames(frame_t, td=0.0):
    cfg = PLSlamConfig(
        solver=SolverConfig(max_features=32, max_line_feats=8, dtype="float64"),
        temporal=TemporalConfig(td=td),
    )
    est = Estimator(cfg)
    imu_t, acc, gyr = _imu_stream()
    feeder = ImuFeeder(imu_t, acc, gyr)
    ids = np.arange(10)
    obs = np.tile(np.linspace(-0.3, 0.3, 10)[:, None], (1, 2))
    for t in frame_t:
        feeder.feed_until(est, t)
        est.process_frame(float(t), ids, obs, None)
    return est


def test_offgrid_boundary_interpolation():
    """Frame timestamps deliberately OFF the 5 ms IMU grid: every closed
    interval's dt_sum equals the frame gap to <1e-6 s (without interpolation
    it snaps to the grid — up to 2.5 ms error per interval)."""
    frame_t = 0.1234 + np.arange(8) * 0.1051  # irrational-ish w.r.t. 5 ms grid
    est = _run_frames(frame_t)
    for k in range(2, 8):
        pre = est.pres[k]
        assert pre is not None
        gap = frame_t[k] - frame_t[k - 1]
        assert abs(float(pre["dt_sum"]) - gap) < 1e-6, (k, float(pre["dt_sum"]), gap)


def test_td_shifts_pairing():
    """With td ≠ 0 the boundary sits at t_img + td; interval spans still equal
    the frame gaps (both boundaries shift together), and the buffered samples
    genuinely differ from the td=0 pairing."""
    frame_t = 0.1234 + np.arange(8) * 0.1051
    est0 = _run_frames(frame_t, td=0.0)
    est1 = _run_frames(frame_t, td=0.0123)
    for k in range(2, 8):
        gap = frame_t[k] - frame_t[k - 1]
        assert abs(float(est1.pres[k]["dt_sum"]) - gap) < 1e-6
        # shifted boundary → different preintegrated alpha
        assert not np.allclose(
            np.asarray(est0.pres[k]["alpha"]), np.asarray(est1.pres[k]["alpha"])
        )


def test_ongrid_frames_consume_boundary_sample_once():
    """Frames exactly ON the IMU grid: the boundary sample is consumed
    verbatim (no duplicate, no zero-dt step) — dt_sum still exact and every
    per-sample dt is one IMU period."""
    frame_t = np.arange(1, 9) * 0.1  # on-grid (every 20th sample)
    est = _run_frames(frame_t)
    for k in range(2, 8):
        pre = est.pres[k]
        assert abs(float(pre["dt_sum"]) - 0.1) < 1e-9
        dts = est.imu_bufs[k].dt if k < len(est.imu_bufs) else None
    # the estimator's live buffers slide; check the most recent closed one
    buf_dts = [d for d in est.imu_bufs[-2].dt]
    if buf_dts:
        assert all(abs(d - 1.0 / IMU_HZ) < 1e-9 for d in buf_dts)
