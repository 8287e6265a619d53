"""Sequence runners: drive the estimator over a dataset.

Replaces the reference's roslaunch graph + `estimator_node.cpp` callback
plumbing (SURVEY.md §3.3) with a synchronous host loop. The synthetic runner
uses ground-truth feature associations (a perfect frontend) — isolating
backend accuracy exactly the way the reference never could; the full runner
plugs in the real tracker frontends.
"""
from __future__ import annotations

import numpy as np

from plslam.config import PLSlamConfig
from plslam.io.synthetic import SyntheticSequence
from plslam.models.estimator import Estimator


def run_synthetic(
    seq: SyntheticSequence,
    config: PLSlamConfig | None = None,
    oracle_init: bool = False,
    use_lines: bool = True,
    max_frames: int | None = None,
    frame_stride: int = 2,
    progress: bool = False,
):
    """Feed a synthetic sequence through the estimator.

    frame_stride=2 turns the 20 Hz camera stream into the reference's 10 Hz
    processing rate (`FREQ` frequency control, SURVEY.md §2.1).
    Returns (ts, ps, qs, estimator)."""
    config = config or PLSlamConfig()
    est = Estimator(config)

    imu_t = np.asarray(seq.imu_t)
    frame_t = np.asarray(seq.frame_t)[::frame_stride]
    obs = np.asarray(seq.obs)[::frame_stride]
    obs_valid = np.asarray(seq.obs_valid)[::frame_stride]
    line_obs = np.asarray(seq.line_obs)[::frame_stride]
    line_obs_valid = np.asarray(seq.line_obs_valid)[::frame_stride]
    if max_frames is not None:
        frame_t = frame_t[:max_frames]

    gt_p = np.asarray(seq.gt_p)[::frame_stride]
    gt_q = np.asarray(seq.gt_q)[::frame_stride]
    gt_v = np.asarray(seq.gt_v)[::frame_stride]

    ts_out, ps_out, qs_out = [], [], []
    imu_idx = 0
    prev_t = None
    for k, t in enumerate(frame_t):
        # feed IMU samples up to and including t
        while imu_idx < len(imu_t) and imu_t[imu_idx] <= t + 1e-9:
            if prev_t is None:
                dt = 0.0
            else:
                dt = imu_t[imu_idx] - prev_t
            est.process_imu(dt if prev_t is not None else 0.005,
                            np.asarray(seq.imu_acc[imu_idx]),
                            np.asarray(seq.imu_gyr[imu_idx]))
            prev_t = imu_t[imu_idx]
            imu_idx += 1

        vis = np.nonzero(obs_valid[k])[0]
        pt_ids = vis
        pt_obs = obs[k, vis]
        ln_ids = ln_segs = None
        if use_lines:
            lvis = np.nonzero(line_obs_valid[k])[0]
            ln_ids = lvis
            ln_segs = line_obs[k, lvis]
        oracle = (
            {"p": gt_p[k], "q": gt_q[k], "v": gt_v[k]} if oracle_init else None
        )
        m = est.process_frame(float(t), pt_ids, pt_obs, None, ln_ids, ln_segs, oracle_state=oracle)
        if progress and k % 20 == 0:
            print(f"[{k}/{len(frame_t)}] t={t:.2f} init={est.initialized} m={ {kk: m[kk] for kk in ('cost','n_pts','n_lines') if kk in m} }")
        if est.initialized:
            tt, p, q = est.latest_pose()
            ts_out.append(tt)
            ps_out.append(p)
            qs_out.append(q)
    return np.asarray(ts_out), np.asarray(ps_out), np.asarray(qs_out), est
