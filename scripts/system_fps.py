"""Measure the REAL deployed system (`runner.run_euroc`) frames/s on the TPU.

This is the honest end-to-end number next to bench.py's fused-tick proxy:
PNG decode → CLAHE → point+line frontends → measurement pairing →
triangulation → window solve → outlier rejection → marginalization, with all
host bookkeeping and H2D/D2H traffic included (VERDICT r2 item #1).

Two phases:
  --render   (CPU subprocess, automatic): render the cached ASL dataset.
  default    (TPU): run run_euroc twice — first pass compiles, second pass
             is the measurement — and print a per-phase breakdown.

Run: cd /root/repo && timeout 1800 python scripts/system_fps.py
"""
import json
import os
import subprocess
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = "/tmp/plslam_fps_ds_v2"
H, W, F = 480, 752, 460.0
DURATION = 12.0


def render_dataset():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from plslam.io import render, synthetic
    from plslam.ops.cameras import PinholeRadTan
    from plslam.utils.geometry import quat_to_rot

    params = synthetic.TrajectoryParams(omega=0.4, z_omega=0.7, wiggle_amp=0.15, excite_amp=0.1)
    seq = synthetic.make_sequence(duration=DURATION, n_points=500, n_lines=40,
                                  seed=17, params=params,
                                  acc_noise=0.1, gyr_noise=0.005,
                                  acc_bias=0.05, gyr_bias=0.002)
    cam = PinholeRadTan.create(F, F, W / 2, H / 2)
    os.makedirs(CACHE, exist_ok=True)
    render.write_euroc_dataset(seq, CACHE, cam, H, W, max_frames=int(DURATION * 20),
                               blob_sigma=3.0, style="textured")
    R_bc = np.array(quat_to_rot(seq.q_bc))
    np.savez(os.path.join(CACHE, "meta.npz"),
             R_bc=R_bc, p_bc=np.array(seq.p_bc),
             gt_t=np.asarray(seq.frame_t), gt_p=np.asarray(seq.gt_p))
    print(f"rendered {int(DURATION*20)} frames -> {CACHE}")


def _config(np_, meta):
    from plslam.config import (
        CameraConfig, ExtrinsicConfig, LoopConfig, PLSlamConfig, SolverConfig,
        TrackerConfig,
    )

    return PLSlamConfig(
        camera=CameraConfig(image_width=W, image_height=H, fx=F, fy=F,
                            cx=W / 2, cy=H / 2, k1=0, k2=0, p1=0, p2=0),
        tracker=TrackerConfig(max_cnt=100, min_dist=30, equalize=True, min_score=2e-3),
        solver=SolverConfig(max_features=96, max_line_feats=24, dtype="float32",
                            focal_length=F),
        extrinsic=ExtrinsicConfig(0, tuple(meta["R_bc"].reshape(-1)),
                                  tuple(meta["p_bc"])),
        loop=LoopConfig(loop_closure=False),
    )


REC = defaultdict(list)


def _wrap(cls, name, tag):
    orig = getattr(cls, name)

    def f(self, *a, **k):
        t0 = time.perf_counter()
        out = orig(self, *a, **k)
        t1 = time.perf_counter()
        REC[tag].append(t1 - t0)
        REC[tag + "_at"].append(t1)
        return out

    setattr(cls, name, f)
    return orig


def measure():
    import numpy as np

    from plslam import runner
    from plslam.eval.metrics import ate_rmse
    from plslam.models.estimator import Estimator
    from plslam.models.frontend_lines import FrontendLines
    from plslam.models.frontend_points import FrontendPoints

    meta = np.load(os.path.join(CACHE, "meta.npz"))
    cfg = _config(np, meta)

    # warmup pass: compiles every executable (cached for the measured pass)
    t0 = time.perf_counter()
    ts, ps, qs, est, _ = runner.run_euroc(CACHE, cfg, use_lines=True, progress=True)
    warm_s = time.perf_counter() - t0
    assert est.initialized, "estimator failed to initialize on the fps dataset"
    ate = ate_rmse(ts, ps, meta["gt_t"], meta["gt_p"], align="yaw")

    # instrument phases for the measured pass
    from plslam.models.frontend_points import OutputHandle
    from plslam.runner import ImuFeeder

    _wrap(OutputHandle, "get", "handle_get(pull)")
    _wrap(ImuFeeder, "feed_until", "imu_feed")
    _wrap(FrontendPoints, "process", "frontend_points")
    _wrap(FrontendLines, "process", "frontend_lines")
    _wrap(Estimator, "process_frame", "process_frame")
    _wrap(Estimator, "_dispatch_solve", "  dispatch_solve")
    _wrap(Estimator, "_factors", "    pack_factors")
    _wrap(Estimator, "_device_state", "    device_state")
    _wrap(Estimator, "finalize", "  finalize(pull)")
    _wrap(Estimator, "_slide", "    slide")

    t0 = time.perf_counter()
    ts, ps, qs, est, _ = runner.run_euroc(CACHE, cfg, use_lines=True)
    wall = time.perf_counter() - t0
    n_cam = len([f for f in os.listdir(os.path.join(CACHE, "mav0", "cam0", "data"))])
    n_pub = len(est.metrics)
    n_solved = sum(1 for m in est.metrics if "cost" in m)


    print(f"\nwarmup pass: {warm_s:.1f} s   ATE(yaw) {ate:.3f} m", file=sys.stderr)
    print(f"measured pass: {wall:.2f} s  {n_cam} camera frames, "
          f"{n_pub} published, {n_solved} solved", file=sys.stderr)
    print("\nphase breakdown (measured pass):", file=sys.stderr)
    for tag in ("frontend_points", "frontend_lines", "handle_get(pull)",
                "imu_feed", "process_frame",
                "  dispatch_solve", "    pack_factors", "    device_state",
                "  finalize(pull)", "    slide"):
        v = REC.get(tag, [])
        if not v:
            continue
        v = np.asarray(v)
        print(f"  {tag:22s} n={len(v):4d} mean={1e3*v.mean():7.2f} ms "
              f"median={1e3*np.median(v):7.2f} ms total={v.sum():6.2f} s",
              file=sys.stderr)
    # steady-state fps over the second half of camera frames: excludes the
    # once-per-session initialization (`initialStructure` — a pull-heavy host
    # path) and any residual warm-up
    at = REC.get("frontend_points_at", [])
    steady = None
    if len(at) > 20:
        half = len(at) // 2
        steady = round((len(at) - half) / (at[-1] - at[half]), 2)
    result = {
        "metric": "run_euroc_camera_fps", "value": round(n_cam / wall, 2),
        "published_fps": round(n_pub / wall, 2),
        "solved_fps": round(n_solved / wall, 2),
        "steady_fps": steady,
        "ate_m": round(float(ate), 4), "wall_s": round(wall, 2),
    }
    print(json.dumps(result))

    # ---- offline burst mode (models/burst.py): the REAL data flow scanned
    # on device, ONE readback per 16 published frames — first pass compiles
    # the chunk program, second pass measures (VERDICT r3 item 1) ----
    from plslam.eval.metrics import ate_rmse as _ate

    t0 = time.perf_counter()
    runner.run_euroc(CACHE, cfg, use_lines=True, burst=16)
    burst_compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    ts_b, ps_b, _, est_b, _ = runner.run_euroc(CACHE, cfg, use_lines=True, burst=16)
    burst_wall = time.perf_counter() - t0
    n_burst = sum(1 for m in est_b.metrics if m.get("burst"))
    ate_b = _ate(ts_b, ps_b, meta["gt_t"], meta["gt_p"], align="yaw")
    # steady = the burst phase alone: published frames that ran in chunks,
    # excluding the streaming init prefix paid once per session
    bt = [m["t"] for m in est_b.metrics if m.get("burst")]
    print(f"\nburst pass: {burst_wall:.2f} s wall ({burst_compile_s:.1f} s first"
          f"-pass incl. compile), {n_burst} of {len(est_b.metrics)} published "
          f"frames in 16-frame chunks, ATE(yaw) {ate_b:.3f} m", file=sys.stderr)
    result_b = {
        "metric": "run_euroc_burst_camera_fps",
        "value": round(n_cam / burst_wall, 2),
        "published_fps": round(len(est_b.metrics) / burst_wall, 2),
        "burst_frames": n_burst,
        "ate_m": round(float(ate_b), 4), "wall_s": round(burst_wall, 2),
    }
    print(json.dumps(result_b))


def main():
    if "--render" in sys.argv:
        render_dataset()
        return
    if not os.path.exists(os.path.join(CACHE, "meta.npz")):
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   PYTHONPATH="/root/repo:/root/.axon_site")
        env.pop("PALLAS_AXON_POOL_IPS", None)
        subprocess.run([sys.executable, os.path.abspath(__file__), "--render"],
                       check=True, env=env)
    measure()


if __name__ == "__main__":
    main()
