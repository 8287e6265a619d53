"""Offline burst mode (models/burst.py): the scanned device pipeline must
reproduce the streaming loop on the SAME rendered dataset — same published
frames, near-identical trajectory (deviations bounded by float association
in the initial-guess path; see the module docstring's deviation list)."""
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


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    H, W, f = 480, 752, 460.0
    params = synthetic.TrajectoryParams(omega=0.3, z_omega=0.6)
    seq = synthetic.make_sequence(duration=6.0, n_points=500, n_lines=40,
                                  seed=17, params=params)
    cam = PinholeRadTan.create(f, f, W / 2, H / 2)
    path = tmp_path_factory.mktemp("burst_ds")
    render.write_euroc_dataset(seq, str(path), cam, H, W, max_frames=120,
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
    return seq, str(path), cfg


@pytest.mark.slow
def test_burst_matches_streaming(dataset):
    seq, path, cfg = dataset
    ts_s, ps_s, qs_s, est_s, _ = run_euroc(path, cfg, use_lines=True)
    assert est_s.initialized

    ts_b, ps_b, qs_b, est_b, _ = run_euroc(path, cfg, use_lines=True, burst=8)
    assert est_b.initialized
    n_burst = sum(1 for m in est_b.metrics if m.get("burst"))
    assert n_burst >= 16, f"burst mode barely engaged ({n_burst} frames)"

    # same published frames
    np.testing.assert_allclose(ts_b, ts_s, atol=1e-9)
    # near-identical trajectory: both paths run the same math; differences
    # enter through the initial-guess/linearization path (chunk-start-bias
    # preintegration with first-order correction vs per-frame host
    # dead-reckoning). A hard LM accept/reject can flip on such a
    # perturbation and cause a TRANSIENT excursion that re-converges (the
    # window solve is contractive) — so bound the excursion loosely and the
    # steady-state tightly
    dp = np.linalg.norm(np.asarray(ps_b) - np.asarray(ps_s), axis=1)
    assert dp.max() < 0.1, f"burst vs streaming max |Δp| {dp.max():.4f} m"
    assert np.median(dp) < 1e-2, f"burst vs streaming median |Δp| {np.median(dp):.4f} m"
    assert dp[-8:].max() < 2e-2, f"burst vs streaming did not re-converge: {dp[-8:]}"

    ate_s = ate_rmse(ts_s, ps_s, np.asarray(seq.frame_t), np.asarray(seq.gt_p), align="yaw")
    ate_b = ate_rmse(ts_b, ps_b, np.asarray(seq.frame_t), np.asarray(seq.gt_p), align="yaw")
    assert abs(ate_b - ate_s) < 5e-3, f"burst ATE {ate_b:.4f} vs streaming {ate_s:.4f}"

    # the handback leaves the estimator usable: window state matches the
    # last emitted pose
    t_last, p_last, _ = est_b.latest_pose()
    np.testing.assert_allclose(p_last, ps_b[-1], atol=1e-9)
    # PER-SLOT timestamps survive the handback (not a flattened copy):
    # checkpoint/save right after a burst stores true per-frame stamps
    np.testing.assert_allclose(est_b.timestamps, est_s.timestamps, atol=1e-9)


@pytest.mark.slow
def test_burst_handback_with_imu_noise(tmp_path):
    """The burst→streaming handback must restore the COMPLETE factor-side
    state. sync_back originally omitted `est.pres` (per-interval
    preintegrations), the newest raw interval buffer, and the boundary IMU
    sample — the streamed solves after handback then ran against the
    pre-burst IMU factors: first post-handback cost0 ≈ 8e5 and the
    trajectory walked off at ~0.27 m/frame (while burst-vs-streaming
    divergence up to the handback was ≤1.1 cm). Clean-IMU datasets hid it
    (steady-motion preintegrations are nearly interchangeable); this pins
    the noisy-IMU f32 case end-to-end, including streamed frames AFTER the
    burst."""
    H, W, f = 480, 752, 460.0
    params = synthetic.TrajectoryParams(omega=0.4, z_omega=0.7, wiggle_amp=0.15,
                                        excite_amp=0.1)
    seq = synthetic.make_sequence(duration=10.0, n_points=500, n_lines=40, seed=17,
                                  params=params, acc_noise=0.1, gyr_noise=0.005,
                                  acc_bias=0.05, gyr_bias=0.002)
    cam = PinholeRadTan.create(f, f, W / 2, H / 2)
    render.write_euroc_dataset(seq, str(tmp_path), cam, H, W, max_frames=200,
                               blob_sigma=3.0, style="textured")
    R_bc = np.array(quat_to_rot(seq.q_bc))
    cfg = PLSlamConfig(
        camera=CameraConfig(image_width=W, image_height=H, fx=f, fy=f,
                            cx=W / 2, cy=H / 2, k1=0, k2=0, p1=0, p2=0),
        tracker=TrackerConfig(max_cnt=100, min_dist=30, equalize=True, min_score=2e-3),
        solver=SolverConfig(max_features=96, max_line_feats=24, dtype="float32",
                            focal_length=f),
        extrinsic=ExtrinsicConfig(0, tuple(R_bc.reshape(-1)), tuple(np.array(seq.p_bc))),
        loop=LoopConfig(loop_closure=False),
    )
    ts_s, ps_s, _, _, _ = run_euroc(str(tmp_path), cfg, use_lines=True)
    ts_b, ps_b, _, est_b, _ = run_euroc(str(tmp_path), cfg, use_lines=True, burst=16)
    n_burst = sum(1 for m in est_b.metrics if m.get("burst"))
    assert n_burst >= 48, n_burst
    np.testing.assert_allclose(ts_b, ts_s, atol=1e-9)
    dp = np.linalg.norm(np.asarray(ps_b) - np.asarray(ps_s), axis=1)
    # the tail (streamed frames after the last chunk) must stay consistent
    assert dp[-6:].max() < 0.1, f"handback diverged: tail dp {dp[-6:]}"
    assert np.median(dp) < 0.02, np.median(dp)
    # post-handback streamed solves see a consistent factor stack
    post = [m for m in est_b.metrics if not m.get("burst") and "cost0" in m]
    if post:
        assert max(m["cost0"] for m in post[-4:]) < 1e4, post[-4:]
    gt_t, gt_p = np.asarray(seq.frame_t), np.asarray(seq.gt_p)
    ate_s = ate_rmse(ts_s, ps_s, gt_t, gt_p, align="yaw")
    ate_b = ate_rmse(ts_b, ps_b, gt_t, gt_p, align="yaw")
    assert abs(ate_b - ate_s) < 0.05, (ate_b, ate_s)
    # handback state is field-for-field usable: per-slot timestamps are the
    # true publish stamps (monotone non-decreasing window, newest == last
    # published frame) — NOT a flattened newest-stamp copy
    assert est_b.timestamps[-1] == pytest.approx(float(ts_b[-1]), abs=1e-9)
    win = est_b.timestamps
    assert np.all(np.diff(win) >= -1e-9), win
    assert win[0] < win[-1], f"timestamps flattened: {win}"


@pytest.mark.slow
def test_burst_with_estimate_td(tmp_path):
    """Burst + estimate_td: the chunk pairs IMU at the CHUNK-START td
    (streaming re-pairs per frame — the documented deviation in burst.py's
    list). This bounds the deviation: on a dataset with a real 12 ms camera
    latency, burst and streaming must recover the same td and the same
    trajectory. A 10 ms td drift across a 16-frame chunk shifts pairing by
    ~2 IMU samples; the first-order velocity term in ProjectionTdFactor
    absorbs it — this pins that claim with a measurement."""
    from plslam.config import TemporalConfig

    H, W, f = 480, 752, 460.0
    td_true = 0.012
    params = synthetic.TrajectoryParams(omega=0.5, z_omega=0.8, wiggle_amp=0.15,
                                        excite_amp=0.1)
    seq = synthetic.make_sequence(duration=14.0, n_points=500, n_lines=40,
                                  seed=29, params=params)
    cam = PinholeRadTan.create(f, f, W / 2, H / 2)
    # images stamped 12 ms EARLY relative to capture → td_true = +12 ms in
    # the estimator's t_img + td convention
    render.write_euroc_dataset(seq, str(tmp_path), cam, H, W, max_frames=280,
                               blob_sigma=3.0, style="textured",
                               cam_stamp_offset=-td_true)
    R_bc = np.array(quat_to_rot(seq.q_bc))
    cfg = PLSlamConfig(
        camera=CameraConfig(image_width=W, image_height=H, fx=f, fy=f,
                            cx=W / 2, cy=H / 2, k1=0, k2=0, p1=0, p2=0),
        tracker=TrackerConfig(max_cnt=100, min_dist=30, equalize=True, min_score=2e-3),
        solver=SolverConfig(max_features=96, max_line_feats=24, dtype="float64",
                            focal_length=f),
        extrinsic=ExtrinsicConfig(0, tuple(R_bc.reshape(-1)), tuple(np.array(seq.p_bc))),
        temporal=TemporalConfig(estimate_td=True, td=0.0),
        loop=LoopConfig(loop_closure=False),
    )
    ts_s, ps_s, _, est_s, _ = run_euroc(str(tmp_path), cfg, use_lines=True)
    ts_b, ps_b, _, est_b, _ = run_euroc(str(tmp_path), cfg, use_lines=True, burst=16)
    assert est_s.initialized and est_b.initialized
    n_burst = sum(1 for m in est_b.metrics if m.get("burst"))
    assert n_burst >= 48, n_burst
    np.testing.assert_allclose(ts_b, ts_s, atol=1e-9)

    # both paths converge toward the injected latency (td information rides
    # the FEJ prior, so recovery is a crawl bounded by prior stiffness —
    # measured 6.2 ms @14 s / 7.8 ms @20 s from cold start; the historical
    # bug this test guards: an ABSOLUTE td·vel residual shift double-counts
    # the live re-pairing and equilibrates at td_true/2)
    td_s, td_b = float(est_s.td), float(est_b.td)
    assert 4e-3 < td_s < 15e-3, f"streaming td {td_s*1e3:.1f} ms vs {td_true*1e3} ms"
    assert 4e-3 < td_b < 15e-3, f"burst td {td_b*1e3:.1f} ms vs {td_true*1e3} ms"
    # the chunk-start-td pairing deviation is bounded: burst tracks
    # streaming (measured 0.5 ms apart @20 s)
    assert abs(td_b - td_s) < 1.5e-3, f"burst td {td_b*1e3:.2f} vs streaming {td_s*1e3:.2f} ms"

    dp = np.linalg.norm(np.asarray(ps_b) - np.asarray(ps_s), axis=1)
    assert np.median(dp) < 0.03, np.median(dp)
    gt_t, gt_p = np.asarray(seq.frame_t), np.asarray(seq.gt_p)
    ate_s = ate_rmse(ts_s, ps_s, gt_t, gt_p, align="yaw")
    ate_b = ate_rmse(ts_b, ps_b, gt_t, gt_p, align="yaw")
    assert abs(ate_b - ate_s) < 0.05, (ate_b, ate_s)


def _loop_gaps(pg, xyz, yaw):
    """Loop-edge residual translations at poses (xyz, yaw) — the revisit gap
    each loop edge measures (same helper as test_loop_e2e)."""
    import jax.numpy as jnp

    from plslam.utils.geometry import ypr_to_rot

    gaps = []
    for e in pg.edges:
        if not e.get("loop"):
            continue
        i, j = e["i"], e["j"]
        Ri = np.asarray(ypr_to_rot(jnp.asarray([yaw[i], pg.pitch[i], pg.roll[i]])))
        gaps.append(np.linalg.norm(Ri.T @ (xyz[j] - xyz[i]) - np.asarray(e["t"])))
    return np.asarray(gaps)


@pytest.mark.slow
def test_burst_with_loop_closure(tmp_path):
    """Loop closure WORKS in burst mode: keyframe payloads ride the chunk
    readback, place recognition + PnP + 4-DoF PGO run per chunk on the host
    (the reference pose-graph thread's asynchronous cadence), drift
    correction applies to burst-published poses, and a loop that wants the
    relocalization round trip hands back to streaming and re-enters."""
    import jax.numpy as jnp

    from plslam.utils.geometry import quat_to_rot as q2r, rot_to_ypr

    H, W, f = 480, 752, 460.0
    params = synthetic.TrajectoryParams(omega=0.5, z_omega=0.8)
    seq = synthetic.make_sequence(duration=14.0, n_points=500, n_lines=40, seed=23,
                                  params=params, acc_noise=0.1, gyr_noise=0.005,
                                  acc_bias=0.05, gyr_bias=0.002)
    cam = PinholeRadTan.create(f, f, W / 2, H / 2)
    render.write_euroc_dataset(seq, str(tmp_path), cam, H, W, max_frames=280,
                               blob_sigma=3.0, style="textured")
    # miscalibrated extrinsic (true one renders) → ~0.5 m systematic drift
    # for the loop closure to absorb — the test_loop_e2e regime
    R_bc = np.array(quat_to_rot(seq.q_bc))
    a = np.radians(1.5)
    Rz = np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1.0]])
    cfg = PLSlamConfig(
        camera=CameraConfig(image_width=W, image_height=H, fx=f, fy=f,
                            cx=W / 2, cy=H / 2, k1=0, k2=0, p1=0, p2=0),
        tracker=TrackerConfig(max_cnt=100, min_dist=30, equalize=True, min_score=2e-3),
        solver=SolverConfig(max_features=96, max_line_feats=24, dtype="float64",
                            focal_length=f),
        extrinsic=ExtrinsicConfig(0, tuple((R_bc @ Rz).reshape(-1)),
                                  tuple(np.array(seq.p_bc) + [0.01, -0.005, 0.008])),
        loop=LoopConfig(loop_closure=True, min_loop_gap=40, max_keyframes=512),
    )
    ts, ps, qs, est, pg = run_euroc(str(tmp_path), cfg, use_lines=False, burst=8)
    assert est.initialized
    n_burst = sum(1 for m in est.metrics if m.get("burst"))
    assert n_burst >= 40, f"burst mode barely engaged with loops on ({n_burst})"

    # keyframes were built from burst chunk payloads and loops CONFIRMED
    # from appearance (BRIEF+PnP) on those payloads
    assert pg.n > 60 and pg.db.n > 60
    accepted = [r for r in pg.stats if r["outcome"] == "accepted"]
    assert pg.loop_count >= 1, pg.stats[-20:]
    assert all(r["inliers"] >= cfg.loop.min_pnp_inliers for r in accepted)

    # the PGO ran and its drift correction landed on published poses
    assert np.linalg.norm(pg.t_drift) > 1e-8 or abs(pg.yaw_drift) > 1e-10

    # map consistency: the revisit gap collapses at the optimized poses
    n = pg.n
    raw_yaw = np.array([
        float(np.asarray(rot_to_ypr(q2r(jnp.asarray(pg.vio_q[k]))))[0])
        for k in range(n)
    ])
    gap_raw = _loop_gaps(pg, pg.vio_p, raw_yaw)
    gap_corr = _loop_gaps(pg, pg.opt_p, pg.opt_yaw)
    assert gap_raw.max() > 0.3, gap_raw  # the miscalibration DID create drift
    assert gap_corr.max() < 0.5 * gap_raw.max(), (gap_raw, gap_corr)

    # trajectory sanity under correction
    ate = ate_rmse(ts, ps, np.asarray(seq.frame_t), np.asarray(seq.gt_p), align="yaw")
    assert np.isfinite(ate) and ate < 1.0, ate
