"""CLI launcher (`python -m plslam`) — the roslaunch/evo analog."""
import json
import os

import numpy as np
import pytest

from plslam.__main__ import main
from plslam.eval.metrics import write_tum


def _make_traj(n=60, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    ts = np.arange(n) * 0.1
    ps = np.stack([np.cos(ts), np.sin(ts), 0.1 * ts], axis=1)
    ps = ps + noise * rng.standard_normal(ps.shape)
    qs = np.tile(np.array([1.0, 0, 0, 0]), (n, 1))
    return ts, ps, qs


def test_eval_subcommand(tmp_path, capsys):
    ts, ps, qs = _make_traj()
    gt = tmp_path / "gt.tum"
    est = tmp_path / "est.tum"
    write_tum(gt, ts, ps, qs)
    # estimate = ground truth rotated by 30° yaw + shifted (pure gauge offset)
    th = np.deg2rad(30)
    R = np.array([[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    write_tum(est, ts, ps @ R.T + np.array([5.0, -2.0, 0.3]), qs)
    main(["eval", "--est", str(est), "--gt", str(gt)])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ate_rmse_m"] < 1e-4  # yaw alignment removes the gauge offset
    assert out["frames"] == 60


def test_eval_against_euroc_gt_csv(tmp_path, capsys):
    ts, ps, qs = _make_traj()
    mav = tmp_path / "seq" / "mav0"
    for sub in ("imu0", "cam0", "state_groundtruth_estimate0"):
        os.makedirs(mav / sub)
    with open(mav / "imu0" / "data.csv", "w") as fh:
        fh.write("#t,wx,wy,wz,ax,ay,az\n")
        for t in ts:
            fh.write(f"{int(t*1e9)},0,0,0,0,0,9.81\n")
    with open(mav / "cam0" / "data.csv", "w") as fh:
        fh.write("#t,filename\n")
    with open(mav / "state_groundtruth_estimate0" / "data.csv", "w") as fh:
        fh.write("#t,px,py,pz,qw,qx,qy,qz,vx,vy,vz\n")
        for t, p in zip(ts, ps):
            fh.write(f"{int(t*1e9)},{p[0]},{p[1]},{p[2]},1,0,0,0,0,0,0\n")
    est = tmp_path / "est.tum"
    write_tum(est, ts, ps + 0.01, qs)
    main(["eval", "--est", str(est), "--data", str(tmp_path / "seq")])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ate_rmse_m"] < 0.02


def test_run_requires_data():
    with pytest.raises(SystemExit):
        main(["run"])


def _render_dataset(tmp_path):
    from plslam.io import render, synthetic
    from plslam.ops.cameras import PinholeRadTan

    H, W, F = 240, 376, 160.0
    seq = synthetic.make_sequence(duration=4.0, n_points=300, n_lines=0, seed=5,
                                  params=synthetic.TrajectoryParams(wiggle_amp=0.1))
    cam = PinholeRadTan.create(F, F, W / 2, H / 2)
    render.write_euroc_dataset(seq, str(tmp_path), cam, H, W, max_frames=60,
                               blob_sigma=2.0, style="textured")
    return seq, H, W, F


def test_run_subcommand_on_rendered_dataset(tmp_path, capsys):
    """`python -m plslam run` end-to-end on a small rendered ASL dataset."""
    from plslam.utils.geometry import quat_to_rot

    seq, H, W, F = _render_dataset(tmp_path)
    R_bc = np.array(quat_to_rot(seq.q_bc)).reshape(-1)
    p_bc = np.array(seq.p_bc)
    yaml_path = tmp_path / "cfg.yaml"
    yaml_path.write_text(
        f"""%YAML:1.0
image_width: {W}
image_height: {H}
projection_parameters:
   fx: {F}
   fy: {F}
   cx: {W/2}
   cy: {H/2}
max_cnt: 80
min_dist: 20
min_score: 0.002
equalize: 1
loop_closure: 0
extrinsicRotation: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [{", ".join(f"{v:.9f}" for v in R_bc)}]
extrinsicTranslation: !!opencv-matrix
   rows: 3
   cols: 1
   dt: d
   data: [{", ".join(f"{v:.9f}" for v in p_bc)}]
""")
    out = tmp_path / "out"
    main(["run", "--data", str(tmp_path), "--config", str(yaml_path),
          "--output", str(out), "--no-lines", "--max-frames", "25", "--quiet"])
    traj = out / "traj_vio.tum"
    assert traj.exists()
    body = np.loadtxt(traj)
    assert body.ndim == 2 and body.shape[1] == 8 and len(body) > 5
    score = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(score["ate_rmse_m"])


def test_parity_subcommand_autodetects_sequences(tmp_path, capsys):
    """`python -m plslam parity` discovers present EuRoC sequences under a
    root dir, runs them, and emits the table (BASELINE.md tier-0 protocol)."""
    from plslam.utils.geometry import quat_to_rot

    root = tmp_path / "euroc"
    seq_dir = root / "MH_01_easy"
    os.makedirs(seq_dir)
    seq, H, W, F = _render_dataset(seq_dir)
    R_bc = np.array(quat_to_rot(seq.q_bc)).reshape(-1)
    p_bc = np.array(seq.p_bc)
    yaml_path = tmp_path / "cfg.yaml"
    yaml_path.write_text(
        f"""%YAML:1.0
image_width: {W}
image_height: {H}
projection_parameters:
   fx: {F}
   fy: {F}
   cx: {W/2}
   cy: {H/2}
max_cnt: 80
min_dist: 20
min_score: 0.002
equalize: 1
loop_closure: 0
extrinsicRotation: !!opencv-matrix
   rows: 3
   cols: 3
   dt: d
   data: [{", ".join(f"{v:.9f}" for v in R_bc)}]
extrinsicTranslation: !!opencv-matrix
   rows: 3
   cols: 1
   dt: d
   data: [{", ".join(f"{v:.9f}" for v in p_bc)}]
""")
    out = tmp_path / "pout"
    main(["parity", "--data", str(root), "--config", str(yaml_path),
          "--output", str(out), "--no-lines", "--max-frames", "25"])
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["sequence"] == "MH_01_easy"
    assert "error" not in row, row
    assert np.isfinite(row["ate_rmse_m"])
    assert (out / "parity.md").exists()
    assert (out / "MH_01_easy.tum").exists()


def test_parity_no_sequences_exits(tmp_path):
    with pytest.raises(SystemExit):
        main(["parity", "--data", str(tmp_path)])
