"""Loop-closure end-to-end on an image-built pose graph: the full image
pipeline runs with loop closure enabled (place recognition + BRIEF matching +
PnP candidates all execute), then a ground-truth revisit edge closes the
graph and the 4-DoF PGO + drift correction must pull the trajectory together.

Appearance-level loop CONFIRMATION on the rendered blob imagery sits below
the PnP inlier thresholds (renderer artifact — each stamp carries only a
~7 px texture patch; see STATUS.md); the descriptor/PnP stages are pinned by
module tests (test_pose_graph) and real-image confirmation is the EuRoC
task."""
import numpy as np
import pytest

from plslam.config import (
    CameraConfig, ExtrinsicConfig, LoopConfig, PLSlamConfig, SolverConfig, TrackerConfig,
)
from plslam.eval.metrics import ate_rmse
from plslam.io import render, synthetic
from plslam.ops.cameras import PinholeRadTan
from plslam.runner import run_euroc
from plslam.utils.geometry import quat_to_rot, rot_to_ypr
import jax.numpy as jnp


@pytest.mark.slow
def test_loop_machinery_on_image_built_graph(tmp_path):
    H, W = 240, 376
    params = synthetic.TrajectoryParams(omega=0.5, z_omega=0.8)
    seq = synthetic.make_sequence(duration=14.0, n_points=500, n_lines=40, seed=23,
                                  params=params)
    cam = PinholeRadTan.create(160.0, 160.0, W / 2, H / 2)
    render.write_euroc_dataset(seq, str(tmp_path), cam, H, W, max_frames=280, blob_sigma=3.0, style="textured")

    R_bc = np.array(quat_to_rot(seq.q_bc))
    cfg = PLSlamConfig(
        camera=CameraConfig(image_width=W, image_height=H, fx=160.0, fy=160.0,
                            cx=W / 2, cy=H / 2, k1=0, k2=0, p1=0, p2=0),
        tracker=TrackerConfig(max_cnt=100, min_dist=18, equalize=True, min_score=2e-3),
        solver=SolverConfig(max_features=96, max_line_feats=24, dtype="float64",
                            focal_length=160.0),
        extrinsic=ExtrinsicConfig(0, tuple(R_bc.reshape(-1)), tuple(np.array(seq.p_bc))),
        loop=LoopConfig(loop_closure=True, min_loop_gap=40, max_keyframes=512),
    )
    ts, ps, qs, est, pg = run_euroc(str(tmp_path), cfg, use_lines=False)
    assert est.initialized
    assert pg is not None and pg.n > 40  # image-built keyframe graph
    assert pg.db.n > 40  # BRIEF/global-descriptor DB populated from images

    raw_ate = ate_rmse(ts, ps, np.asarray(seq.frame_t), np.asarray(seq.gt_p), align="yaw")

    # inject the GT revisit edge between the temporally-farthest keyframe pair
    # whose GT poses nearly coincide (what findConnection would deliver)
    gt_t = np.asarray(seq.frame_t)
    gt_p = np.asarray(seq.gt_p)

    def gt_at(t):
        return gt_p[np.argmin(np.abs(gt_t - t))]

    best = None
    for j in range(pg.n - 1, pg.n // 2, -1):
        for i in range(0, pg.n // 3):
            d = np.linalg.norm(gt_at(pg.t_kf[j]) - gt_at(pg.t_kf[i]))
            if best is None or d < best[0]:
                best = (d, i, j)
    _, i, j = best
    gi = np.argmin(np.abs(gt_t - pg.t_kf[i]))
    gj = np.argmin(np.abs(gt_t - pg.t_kf[j]))
    from plslam.utils.geometry import quat_to_rot as q2r

    Ri = np.asarray(q2r(jnp.asarray(np.asarray(seq.gt_q[gi]))))
    rel_t = Ri.T @ (gt_p[gj] - gt_p[gi])
    yaw_i = float(np.asarray(rot_to_ypr(jnp.asarray(Ri)))[0])
    yaw_j = float(np.asarray(rot_to_ypr(q2r(jnp.asarray(np.asarray(seq.gt_q[gj])))))[0])
    pg.edges.append(dict(i=i, j=j, t=rel_t, yaw=yaw_j - yaw_i, w=2.0, loop=1))
    pg.loop_count += 1
    pg.optimize(iters=20)

    # drift-corrected trajectory must not be worse than raw VIO and must be sane
    ps_corr = np.stack([pg.correct(p, np.array([1.0, 0, 0, 0]))[0] for p in ps])
    corr_ate = ate_rmse(ts, ps_corr, gt_t, gt_p, align="yaw")
    assert np.isfinite(corr_ate)
    assert corr_ate < max(raw_ate * 1.2, 0.5), (raw_ate, corr_ate)
