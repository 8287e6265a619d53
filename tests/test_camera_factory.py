"""Camera-model factory: `model_type` dispatch end-to-end.

The reference's `CameraFactory` (camera_model/src/camera_models/
CameraFactory.cc lineage, SURVEY.md §2.5) constructs the camera named by the
YAML `model_type` and every node projects/lifts through the base-class
interface. Here `ops.cameras.make_camera` + the generic `lift` /
`normalized_to_pixel` / `project` dispatchers play that role; these tests pin
(a) the YAML→model mapping, (b) lift∘project identity per model, (c) the
FULL image pipeline running on a non-pinhole (Kannala-Brandt) camera — a
fisheye config must drive fisheye projection everywhere, not silently fall
back to pinhole."""
import numpy as np
import pytest

from plslam.config import (
    CameraConfig, ExtrinsicConfig, LoopConfig, PLSlamConfig, SolverConfig, TrackerConfig,
)
from plslam.ops import cameras as C


def test_make_camera_dispatch():
    base = dict(fx=400.0, fy=401.0, cx=376.0, cy=240.0)
    cc = CameraConfig(model_type="PINHOLE", k1=-0.28, k2=0.07, p1=1e-4, p2=1e-5, **base)
    assert isinstance(C.make_camera(cc), C.PinholeRadTan)
    cc = CameraConfig(model_type="KANNALA_BRANDT", kb2=0.01, kb3=-0.003, **base)
    cam = C.make_camera(cc)
    assert isinstance(cam, C.EquidistantCamera)
    assert float(cam.k2) == pytest.approx(0.01)
    cc = CameraConfig(model_type="MEI", xi=0.9, k1=-0.1, k2=0.02, **base)
    cam = C.make_camera(cc)
    assert isinstance(cam, C.MeiCamera)
    assert float(cam.xi) == pytest.approx(0.9)
    cc = CameraConfig(model_type="SCARAMUZZA", a0=300.0, a2=-1e-3, a3=1e-6,
                      a4=-1e-9, ac=1.0, ad=0.0, ae=0.0, cx=376.0, cy=240.0)
    assert isinstance(C.make_camera(cc), C.ScaramuzzaCamera)
    with pytest.raises(ValueError):
        C.make_camera(CameraConfig(model_type="NOPE"))


def test_yaml_model_type_round_trip(tmp_path):
    """camodocal YAML key sets reach the right model via from_yaml."""
    kb = tmp_path / "kb.yaml"
    kb.write_text(
        "model_type: KANNALA_BRANDT\n"
        "image_width: 752\nimage_height: 480\n"
        "projection_parameters:\n"
        "  k2: 0.011\n  k3: -0.0031\n  k4: 0.0006\n  k5: -0.0001\n"
        "  mu: 461.5\n  mv: 460.3\n  u0: 363.0\n  v0: 248.1\n")
    cfg = PLSlamConfig.from_yaml(str(kb))
    cam = C.make_camera(cfg.camera)
    assert isinstance(cam, C.EquidistantCamera)
    assert float(cam.fx) == pytest.approx(461.5)
    assert float(cam.k3) == pytest.approx(-0.0031)

    mei = tmp_path / "mei.yaml"
    mei.write_text(
        "model_type: MEI\n"
        "mirror_parameters:\n  xi: 1.94\n"
        "distortion_parameters:\n  k1: -0.35\n  k2: 0.15\n  p1: 0.0007\n  p2: 0.0002\n"
        "projection_parameters:\n  gamma1: 850.0\n  gamma2: 851.0\n  u0: 370.0\n  v0: 241.0\n")
    cam = C.make_camera(PLSlamConfig.from_yaml(str(mei)).camera)
    assert isinstance(cam, C.MeiCamera)
    assert float(cam.xi) == pytest.approx(1.94)
    assert float(cam.fx) == pytest.approx(850.0)

    sc = tmp_path / "scara.yaml"
    sc.write_text(
        "model_type: SCARAMUZZA\n"
        "poly_parameters:\n  p0: 300.0\n  p2: -0.001\n  p3: 1.0e-06\n  p4: -1.0e-09\n"
        "affine_parameters:\n  ac: 1.001\n  ad: 0.0002\n  ae: -0.0001\n  cx: 376.0\n  cy: 240.0\n")
    cam = C.make_camera(PLSlamConfig.from_yaml(str(sc)).camera)
    assert isinstance(cam, C.ScaramuzzaCamera)
    assert float(cam.a0) == pytest.approx(300.0)
    assert float(cam.cx) == pytest.approx(376.0)


def _roundtrip_err(cam, mn):
    import jax.numpy as jnp

    uv = C.normalized_to_pixel(cam, jnp.asarray(mn, jnp.float32))
    back = C.lift(cam, uv, iters=10)
    return float(np.max(np.abs(np.asarray(back) - mn)))


def test_generic_lift_project_identity():
    rng = np.random.default_rng(3)
    mn = rng.uniform(-0.45, 0.45, (64, 2))
    cams = [
        C.PinholeRadTan.euroc_cam0(),
        C.EquidistantCamera.create(460.0, 460.0, 376.0, 240.0, 0.01, -0.003, 0.0006, -1e-4),
        C.MeiCamera.create(0.9, 800.0, 800.0, 376.0, 240.0, -0.1, 0.02),
        C.ScaramuzzaCamera.create(300.0, -1e-3, 1e-6, -1e-9, 1.0, 0.0, 0.0, 376.0, 240.0),
    ]
    for cam in cams:
        err = _roundtrip_err(cam, mn)
        assert err < 2e-3, f"{type(cam).__name__}: lift∘project err {err}"


def test_cam_params_round_trip():
    """pose-graph persistence: every model survives (kind, params[9]) form."""
    cams = [
        C.PinholeRadTan.euroc_cam0(),
        C.EquidistantCamera.create(461.0, 460.0, 363.0, 248.0, 0.011, -0.003, 0.0006, -1e-4),
        C.MeiCamera.create(1.94, 850.0, 851.0, 370.0, 241.0, -0.35, 0.15, 7e-4, 2e-4),
        C.ScaramuzzaCamera.create(300.0, -1e-3, 1e-6, -1e-9, 1.001, 2e-4, -1e-4, 376.0, 240.0),
    ]
    for cam in cams:
        kind, params = C.cam_to_params(cam)
        cam2 = C.cam_from_params(kind, params)
        assert type(cam2) is type(cam)
        np.testing.assert_allclose([float(v) for v in cam2],
                                   [float(v) for v in cam], rtol=1e-6)


@pytest.mark.slow
def test_rendered_kb_pipeline(tmp_path):
    """Full image pipeline on a KANNALA_BRANDT camera: render fisheye
    imagery, configure model_type=KANNALA_BRANDT, and require bounded ATE.
    If the runner silently fell back to pinhole lifting, the equidistant
    r=f·θ vs pinhole r=f·tanθ mismatch (tens of px at the border) would
    destroy initialization/accuracy."""
    from plslam.eval.metrics import ate_rmse
    from plslam.io import render, synthetic
    from plslam.runner import run_euroc
    from plslam.utils.geometry import quat_to_rot

    H, W, f = 480, 752, 460.0
    kb = dict(kb2=0.011, kb3=-0.0031, kb4=0.0006, kb5=-0.0001)
    cam = C.EquidistantCamera.create(f, f, W / 2, H / 2,
                                     kb["kb2"], kb["kb3"], kb["kb4"], kb["kb5"])
    params = synthetic.TrajectoryParams(omega=0.3, z_omega=0.6)
    seq = synthetic.make_sequence(duration=6.0, n_points=500, n_lines=40,
                                  seed=21, params=params)
    render.write_euroc_dataset(seq, str(tmp_path), cam, H, W, max_frames=120,
                               blob_sigma=3.0, style="textured")

    R_bc = np.array(quat_to_rot(seq.q_bc))
    cfg = PLSlamConfig(
        camera=CameraConfig(model_type="KANNALA_BRANDT", image_width=W,
                            image_height=H, fx=f, fy=f, cx=W / 2, cy=H / 2, **kb),
        tracker=TrackerConfig(max_cnt=100, min_dist=30, equalize=True, min_score=2e-3),
        solver=SolverConfig(max_features=96, max_line_feats=24, dtype="float64",
                            focal_length=f),
        extrinsic=ExtrinsicConfig(0, tuple(R_bc.reshape(-1)), tuple(np.array(seq.p_bc))),
        loop=LoopConfig(loop_closure=False),
    )
    ts, ps, qs, est, pg = run_euroc(str(tmp_path), cfg, use_lines=True)
    assert est.initialized, "KB image pipeline failed to initialize"
    assert len(ts) > 30
    ate = ate_rmse(ts, ps, np.asarray(seq.frame_t), np.asarray(seq.gt_p), align="yaw")
    assert ate < 0.4, f"KB image-pipeline ATE {ate:.3f} m"
