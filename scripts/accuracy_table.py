"""Accuracy table over diverse rendered EuRoC-style sequences.

Runs the full image pipeline (PNG → native decode → CLAHE → point[+line]
frontends → initialization → estimator [→ loop closure]) on several
trajectory/noise configurations at EuRoC resolution and prints an
ATE/RPE/scale table — the in-sandbox stand-in for the 11-sequence EuRoC
parity target while the dataset is absent (BASELINE.md; real-data hooks:
`plslam/io/euroc.py`).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/accuracy_table.py
"""
import tempfile

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from plslam.config import (
    CameraConfig, ExtrinsicConfig, LoopConfig, PLSlamConfig, SolverConfig, TrackerConfig,
)
from plslam.eval.metrics import ate_rmse, rpe
from plslam.io import render, synthetic
from plslam.ops.cameras import PinholeRadTan
from plslam.runner import run_euroc
from plslam.utils.geometry import quat_to_rot

H, W, F = 480, 752, 460.0

CASES = [
    # name, duration, trajectory params, sequence kwargs, loop closure, lines
    # wiggle_amp = EuRoC-style initialization-excitation preamble (every EuRoC
    # sequence starts with the pilot exciting the IMU; monocular VIO scale /
    # gravity need acceleration variation at init — see TrajectoryParams)
    ("gentle-arc", 8.0, dict(omega=0.3, z_omega=0.6, wiggle_amp=0.15), dict(), False, True),
    ("fast-circle", 8.0, dict(omega=0.5, z_omega=0.8, wiggle_amp=0.15), dict(), False, True),
    # excite_amp: persistent dynamic excitation (EuRoC flights are excited
    # throughout) — on a constant circle, body-frame centripetal acceleration
    # is constant and indistinguishable from accel bias, so scale/bias are
    # UNOBSERVABLE there and the residual bias drifts the scale (~1.11
    # measured); 10 cm of persistent wobble restores observability
    ("imu-noise", 10.0, dict(omega=0.4, z_omega=0.7, wiggle_amp=0.15, excite_amp=0.1),
     dict(acc_noise=0.1, gyr_noise=0.005, acc_bias=0.05, gyr_bias=0.002), False, True),
    ("loop-revisit", 14.0, dict(omega=0.5, z_omega=0.8, wiggle_amp=0.15),
     dict(acc_noise=0.1, gyr_noise=0.005, acc_bias=0.05, gyr_bias=0.002), True, False),
    # FULL-FEATURE row (VERDICT r3 item 4): the configuration the EuRoC
    # parity run will actually use — lines + loop closure + online td
    # estimation + in-solver extrinsic refinement (starting from a 1°/1 cm
    # miscalibration), EuRoC-class IMU noise, 60 s (≈5 revisits)
    ("full-feature-60s", 60.0,
     dict(omega=0.5, z_omega=0.8, wiggle_amp=0.15, excite_amp=0.1),
     dict(acc_noise=0.1, gyr_noise=0.005, acc_bias=0.05, gyr_bias=0.002), True, True,
     dict(estimate_td=True, estimate_extrinsic=1, ext_pert_deg=1.0)),
]


def run_case(name, dur, tp, skw, loop, lines, extras=None, seed=17):
    extras = extras or {}
    params = synthetic.TrajectoryParams(**tp)
    seq = synthetic.make_sequence(duration=dur, n_points=500, n_lines=40,
                                  seed=seed, params=params, **skw)
    cam = PinholeRadTan.create(F, F, W / 2, H / 2)
    tmp = tempfile.mkdtemp()
    render.write_euroc_dataset(seq, tmp, cam, H, W, max_frames=int(dur * 20),
                               blob_sigma=3.0, style="textured")
    R_bc = np.array(quat_to_rot(seq.q_bc))
    p_bc = np.array(seq.p_bc)
    if extras.get("ext_pert_deg"):
        a = np.radians(extras["ext_pert_deg"])
        Rz = np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1.0]])
        R_bc = R_bc @ Rz
        p_bc = p_bc + np.array([0.008, -0.005, 0.006])
    from plslam.config import TemporalConfig

    cfg = PLSlamConfig(
        camera=CameraConfig(image_width=W, image_height=H, fx=F, fy=F,
                            cx=W / 2, cy=H / 2, k1=0, k2=0, p1=0, p2=0),
        tracker=TrackerConfig(max_cnt=100, min_dist=30, equalize=True, min_score=2e-3),
        solver=SolverConfig(max_features=96, max_line_feats=24, dtype="float64",
                            focal_length=F),
        extrinsic=ExtrinsicConfig(extras.get("estimate_extrinsic", 0),
                                  tuple(R_bc.reshape(-1)), tuple(p_bc)),
        temporal=TemporalConfig(estimate_td=extras.get("estimate_td", False)),
        loop=LoopConfig(loop_closure=loop, min_loop_gap=40, max_keyframes=512),
    )
    ts, ps, qs, est, pg = run_euroc(tmp, cfg, use_lines=lines)
    gt_t = np.asarray(seq.frame_t)
    gt_p = np.asarray(seq.gt_p)
    ate = ate_rmse(ts, ps, gt_t, gt_p, align="yaw")
    rpe_t, rpe_r = rpe(ts, np.asarray(ps), gt_t, gt_p, est_q=np.asarray(qs),
                       gt_q=np.asarray(seq.gt_q), delta=1.0)
    # true metric scale via Umeyama sim3: s maps est→gt, so est/gt scale = 1/s
    # (a path-length ratio would conflate jitter with scale — noise always
    # inflates path length)
    from plslam.eval.metrics import associate, umeyama_alignment

    pa, ga = associate(ts, np.asarray(ps), gt_t, gt_p)
    s_ug, _, _ = umeyama_alignment(pa, ga, with_scale=True)
    loops = pg.loop_count if pg is not None else 0
    return ate, rpe_t, rpe_r, 1.0 / s_ug, len(ts), loops


def main():
    print(f"| case | frames | ATE yaw [m] | RPE-1s [m] | RPE-1s [deg] | scale | loops |")
    print(f"|---|---|---|---|---|---|---|")
    for case in CASES:
        ate, rpe_t, rpe_r, scale, nfr, loops = run_case(*case)
        print(f"| {case[0]} | {nfr} | {ate:.3f} | {rpe_t:.3f} | {rpe_r:.2f} | {scale:.3f} | {loops} |",
              flush=True)


if __name__ == "__main__":
    main()
