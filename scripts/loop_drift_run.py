"""Multi-minute loop-closure drift study on rendered imagery.

The reference dumps `vins_result_no_loop.csv` and `vins_result_loop.csv` and
the claim is that 4-DoF pose-graph correction reduces absolute drift on long
sequences. Short 14-s runs cannot show this (loop edges inherit the ~0.1 m
local reconstruction error — STATUS.md); this script runs a LONG rendered
circuit (default 150 s, ~12 revisits of the same wall) through the FULL image
pipeline twice — loop closure off, then on — and compares pointwise ATE.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/loop_drift_run.py
     [duration_s]   (background it: ~30–60 min on the 4-CPU box)
"""
import sys
import tempfile
import time

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


def main(duration=150.0):
    params = synthetic.TrajectoryParams(omega=0.5, z_omega=0.8, wiggle_amp=0.15)
    seq = synthetic.make_sequence(
        duration=duration, n_points=500, n_lines=40, seed=23, params=params,
        acc_noise=0.1, gyr_noise=0.005, acc_bias=0.05, gyr_bias=0.002,
    )
    cam = PinholeRadTan.create(F, F, W / 2, H / 2)
    tmp = tempfile.mkdtemp()
    t0 = time.time()
    render.write_euroc_dataset(seq, tmp, cam, H, W, max_frames=int(duration * 20),
                               blob_sigma=3.0, style="textured")
    print(f"rendered {int(duration*20)} frames in {time.time()-t0:.0f}s → {tmp}", flush=True)

    R_bc = np.array(quat_to_rot(seq.q_bc))
    base = dict(
        camera=CameraConfig(image_width=W, image_height=H, fx=F, fy=F,
                            cx=W / 2, cy=H / 2, k1=0, k2=0, p1=0, p2=0),
        tracker=TrackerConfig(max_cnt=100, min_dist=30, equalize=True, min_score=2e-3),
        solver=SolverConfig(max_features=96, max_line_feats=24, dtype="float64",
                            focal_length=F),
        extrinsic=ExtrinsicConfig(0, tuple(R_bc.reshape(-1)), tuple(np.array(seq.p_bc))),
    )
    gt_t = np.asarray(seq.frame_t)
    gt_p = np.asarray(seq.gt_p)
    gt_q = np.asarray(seq.gt_q)

    results = {}
    for name, loop in (("no_loop", False), ("loop", True)):
        cfg = PLSlamConfig(**base, loop=LoopConfig(
            loop_closure=loop, min_loop_gap=40, max_keyframes=2048))
        t0 = time.time()
        ts, ps, qs, est, pg = run_euroc(tmp, cfg, use_lines=False)
        wall = time.time() - t0
        ate = ate_rmse(ts, ps, gt_t, gt_p, align="yaw")
        rpe_t, rpe_r = rpe(ts, np.asarray(ps), gt_t, gt_p,
                           est_q=np.asarray(qs), gt_q=gt_q, delta=1.0)
        half = len(ts) // 2
        ate2 = ate_rmse(ts[half:], ps[half:], gt_t, gt_p, align="yaw")
        loops = pg.loop_count if pg is not None else 0
        results[name] = ate
        print(f"{name}: frames={len(ts)} ATE={ate:.3f} m (2nd half {ate2:.3f}) "
              f"RPE-1s={rpe_t:.3f} m/{rpe_r:.2f}° loops={loops} wall={wall:.0f}s",
              flush=True)
    if results.get("loop") is not None:
        gain = results["no_loop"] / max(results["loop"], 1e-9)
        print(f"loop-closure ATE gain: {gain:.2f}× "
              f"({results['no_loop']:.3f} → {results['loop']:.3f} m)")


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 150.0)
