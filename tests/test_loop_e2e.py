"""Appearance-level loop closure END-TO-END on rendered imagery — no
ground-truth edge injection anywhere.

The full reference chain runs from pixels (SURVEY.md §3.4): PNG decode →
CLAHE → LK frontend → estimator → keyframe DB → place recognition → BRIEF
matching (`searchByBRIEFDes`) → PnP RANSAC (≥25 inliers, the reference's
`findConnection` gate) → loop edge → 4-DoF PGO → drift correction.

Drift regime: the estimator is fed a miscalibrated camera-IMU extrinsic
(1.5° yaw + ~1 cm lever arm — the classic real-rig failure loop closure
exists to absorb) while the renderer uses the true one, producing ~0.5 m of
systematic drift over one 14 s circle; the appearance loop edges measure the
revisit error to ~0.1 m (validated against ground truth).

What is asserted — the reference capabilities, each where it is honest:
  * loops CONFIRM from appearance alone (BRIEF+PnP, no GT injection),
  * the PGO reconciles the map: the revisit gap (loop-edge residual at the
    corrected poses) collapses vs its raw-VIO value — map consistency, the
    purpose of `optimize4DoF`,
  * the correction does not distort the trajectory (bounded ATE ratio).
Pointwise-ATE *reduction* under drift is pinned separately at graph level by
test_pose_graph (drifting loop closed); on a 14 s sequence the loop edges
inherit the local reconstruction error (~0.1 m — they are built from the
session's own triangulated points, ref `KeyFrame::findConnection`), so
e2e ATE improvement only appears on drifts ≫ that, i.e. multi-minute runs."""
import numpy as np
import pytest

from plslam.config import (
    CameraConfig, ExtrinsicConfig, LoopConfig, PLSlamConfig, SolverConfig, TrackerConfig,
)
from plslam.eval.metrics import ate_rmse
from plslam.io import render, synthetic
from plslam.ops.cameras import PinholeRadTan
from plslam.runner import run_euroc
from plslam.utils.geometry import quat_to_rot, ypr_to_rot
import jax.numpy as jnp


def _loop_gaps(pg, xyz, yaw):
    """Loop-edge residual translations at poses (xyz, yaw) — the revisit
    gap each loop edge measures (optimize_4dof's r_t)."""
    gaps = []
    for e in pg.edges:
        if not e.get("loop"):
            continue
        i, j = e["i"], e["j"]
        Ri = np.asarray(ypr_to_rot(jnp.asarray([yaw[i], pg.pitch[i], pg.roll[i]])))
        gaps.append(np.linalg.norm(Ri.T @ (xyz[j] - xyz[i]) - np.asarray(e["t"])))
    return np.asarray(gaps)


@pytest.mark.slow
def test_appearance_loop_closure_end_to_end(tmp_path):
    # One full circle at ω=0.5 rad/s revisits the start after 2π/0.5 ≈ 12.6 s;
    # 14 s gives the detector a revisit window. EuRoC-class IMU noise.
    H, W, f = 480, 752, 460.0
    params = synthetic.TrajectoryParams(omega=0.5, z_omega=0.8)
    seq = synthetic.make_sequence(duration=14.0, n_points=500, n_lines=40, seed=23,
                                  params=params, acc_noise=0.1, gyr_noise=0.005,
                                  acc_bias=0.05, gyr_bias=0.002)
    cam = PinholeRadTan.create(f, f, W / 2, H / 2)
    render.write_euroc_dataset(seq, str(tmp_path), cam, H, W, max_frames=280,
                               blob_sigma=3.0, style="textured")

    # miscalibrated extrinsic fed to the estimator (true one renders)
    R_bc = np.array(quat_to_rot(seq.q_bc))
    a = np.radians(1.5)
    Rz = np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1.0]])
    R_bc = R_bc @ Rz
    p_bc = np.array(seq.p_bc) + np.array([0.01, -0.005, 0.008])

    cfg = PLSlamConfig(
        camera=CameraConfig(image_width=W, image_height=H, fx=f, fy=f,
                            cx=W / 2, cy=H / 2, k1=0, k2=0, p1=0, p2=0),
        tracker=TrackerConfig(max_cnt=100, min_dist=30, equalize=True, min_score=2e-3),
        solver=SolverConfig(max_features=96, max_line_feats=24, dtype="float64",
                            focal_length=f),
        extrinsic=ExtrinsicConfig(0, tuple(R_bc.reshape(-1)), tuple(p_bc)),
        loop=LoopConfig(loop_closure=True, min_loop_gap=40, max_keyframes=512),
    )
    ts, ps, qs, est, pg = run_euroc(str(tmp_path), cfg, use_lines=False)
    assert est.initialized
    assert pg is not None and pg.n > 80  # image-built keyframe graph
    assert pg.db.n > 80

    # ---- the reference capability: loops CONFIRM from pixels alone ----
    accepted = [r for r in pg.stats if r["outcome"] == "accepted"]
    assert pg.loop_count >= 1, pg.stats[-20:]
    assert all(r["inliers"] >= cfg.loop.min_pnp_inliers for r in accepted)

    gt_t = np.asarray(seq.frame_t)
    gt_p = np.asarray(seq.gt_p)
    n = pg.n
    raw_kf_ate = ate_rmse(pg.t_kf[:n], pg.vio_p[:n], gt_t, gt_p, align="yaw")
    assert raw_kf_ate > 0.25, raw_kf_ate  # the miscalibration DID create drift

    # ---- map consistency: the PGO collapses the revisit gap ----
    from plslam.utils.geometry import rot_to_ypr
    raw_yaw = np.array([
        float(np.asarray(rot_to_ypr(quat_to_rot(jnp.asarray(pg.vio_q[k]))))[0])
        for k in range(n)
    ])
    gap_raw = _loop_gaps(pg, pg.vio_p, raw_yaw)
    gap_corr = _loop_gaps(pg, pg.opt_p, pg.opt_yaw)
    assert gap_raw.max() > 0.4, gap_raw  # visible revisit error before
    assert gap_corr.max() < 0.35 * gap_raw.max(), (gap_raw, gap_corr)
    assert gap_corr.max() < 0.25, gap_corr  # edges reconciled in absolute terms

    # ---- and the correction does not distort the trajectory ----
    corr_kf_ate = ate_rmse(pg.t_kf[:n], pg.opt_p[:n], gt_t, gt_p, align="yaw")
    assert corr_kf_ate < raw_kf_ate * 1.3, (raw_kf_ate, corr_kf_ate)
    stream_ate = ate_rmse(ts, ps, gt_t, gt_p, align="yaw")
    assert np.isfinite(stream_ate) and stream_ate < 1.0, stream_ate

    # ---- relocalization round trip CLOSED (`updateKeyFrameLoop`): the PGO
    # consumed the estimator's BA-refined relative pose — and the refined
    # edge must beat the raw PnP edge against ground truth (SURVEY.md §3.4,
    # VERDICT r3 item 2) ----
    refined = [e for e in pg.edges if e.get("loop") and "t_pnp" in e]
    assert refined, "no loop edge was updated with the joint-solve result"
    gt_q = np.asarray(seq.gt_q)

    def _gt_rel_t(e):
        """GT loop-edge translation old→cur in the old body's ypr frame."""
        from plslam.utils import quat_np as qnp
        ki = np.argmin(np.abs(gt_t - pg.t_kf[e["i"]]))
        kj = np.argmin(np.abs(gt_t - pg.t_kf[e["j"]]))
        ypr = qnp.rot_to_ypr(qnp.quat_to_rot(gt_q[ki]))
        Ri = qnp.ypr_to_rot(ypr)
        return Ri.T @ (gt_p[kj] - gt_p[ki])

    err_pnp = [np.linalg.norm(np.asarray(e["t_pnp"]) - _gt_rel_t(e)) for e in refined]
    err_ref = [np.linalg.norm(np.asarray(e["t"]) - _gt_rel_t(e)) for e in refined]
    assert np.mean(err_ref) < np.mean(err_pnp), (err_pnp, err_ref)
