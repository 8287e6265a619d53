import jax.numpy as jnp
import numpy as np
import pytest

from plslam.config import LoopConfig
from plslam.models import keyframe_db as kdb
from plslam.models import pose_graph as pg
from plslam.utils.geometry import rot_to_quat, ypr_to_rot


def make_drifting_loop(n=40, yaw_drift_total=0.15, pos_drift_total=0.5):
    """GT: square-ish loop. VIO: same with accumulated yaw+position drift."""
    rng = np.random.default_rng(0)
    t = np.linspace(0, 2 * np.pi, n, endpoint=False)
    gt_p = np.stack([3 * np.cos(t), 3 * np.sin(t), 0.2 * np.sin(2 * t)], axis=1)
    gt_yaw = t + np.pi / 2
    drift_yaw = np.linspace(0, yaw_drift_total, n)
    vio_p = np.zeros_like(gt_p)
    vio_yaw = gt_yaw + drift_yaw
    # integrate drifted odometry: each step rotated by accumulated yaw drift
    vio_p[0] = gt_p[0]
    for k in range(1, n):
        dp = gt_p[k] - gt_p[k - 1]
        Rz = np.asarray(ypr_to_rot(jnp.asarray([drift_yaw[k - 1], 0.0, 0.0])))
        vio_p[k] = vio_p[k - 1] + Rz @ dp
    return gt_p, gt_yaw, vio_p, vio_yaw


def test_optimize_4dof_closes_loop():
    n = 40
    gt_p, gt_yaw, vio_p, vio_yaw = make_drifting_loop(n)
    g = pg.PoseGraph(LoopConfig(max_keyframes=64))
    for k in range(n):
        q = np.asarray(rot_to_quat(ypr_to_rot(jnp.asarray([vio_yaw[k], 0.0, 0.0]))))
        g.add_keyframe(float(k), vio_p[k], q)
    # inject the loop edge (kf n-1 → kf 0 GT relative pose, as findConnection would)
    Ri = np.asarray(ypr_to_rot(jnp.asarray([gt_yaw[0], 0.0, 0.0])))
    rel_t = Ri.T @ (gt_p[n - 1] - gt_p[0])
    rel_yaw = gt_yaw[n - 1] - gt_yaw[0]
    g.edges.append(dict(i=0, j=n - 1, t=rel_t, yaw=rel_yaw, w=2.0, loop=1))

    err_before = np.linalg.norm(vio_p[n - 1] - gt_p[n - 1])
    g.optimize(iters=25)
    err_after = np.linalg.norm(g.opt_p[n - 1] - gt_p[n - 1])
    assert err_after < err_before * 0.35, (err_before, err_after)
    # drift correction maps live VIO poses near GT
    p_corr, q_corr = g.correct(vio_p[n - 1], np.array([1.0, 0, 0, 0]))
    assert np.linalg.norm(p_corr - gt_p[n - 1]) < err_before * 0.5


def test_save_load_roundtrip(tmp_path):
    n = 10
    gt_p, gt_yaw, vio_p, vio_yaw = make_drifting_loop(n)
    g = pg.PoseGraph(LoopConfig(max_keyframes=64))
    for k in range(n):
        q = np.asarray(rot_to_quat(ypr_to_rot(jnp.asarray([vio_yaw[k], 0.0, 0.0]))))
        g.add_keyframe(float(k), vio_p[k], q)
    path = str(tmp_path / "pg.npz")
    g.save(path)
    g2 = pg.PoseGraph(LoopConfig(max_keyframes=64))
    g2.load(path)
    assert g2.n == g.n
    np.testing.assert_allclose(g2.vio_p[: g.n], g.vio_p[: g.n])
    assert len(g2.edges) == len(g.edges)


def _texture(rng, h=240, w=320):
    from test_frontend import smooth_texture

    return smooth_texture(rng, h, w)


def test_brief_descriptors_discriminative():
    rng = np.random.default_rng(1)
    img = _texture(rng)
    img_j = jnp.asarray(img)
    uv, valid, desc, gdesc = kdb.extract_keyframe_features(img_j)
    # same keypoints, same image → distance 0; different keypoints → large
    d = np.asarray(kdb.hamming_matrix(jnp.asarray(desc), jnp.asarray(desc)))
    n = valid.sum()
    assert (np.diag(d)[: n] == 0).all()
    off = d[np.triu_indices(int(n), k=1)]
    assert np.median(off) > 60  # random pairs ~128


def test_global_descriptor_place_recognition():
    rng = np.random.default_rng(2)
    imgs = [_texture(np.random.default_rng(s)) for s in range(6)]
    descs = []
    for im in imgs:
        *_, g = kdb.extract_keyframe_features(jnp.asarray(im))
        descs.append(g)
    # a slightly shifted revisit of scene 0 should match scene 0 best
    from test_frontend import shift_image

    revisit = shift_image(imgs[0], 2.0, 1.0)
    *_, g_re = kdb.extract_keyframe_features(jnp.asarray(revisit))
    sims = np.asarray([g @ g_re for g in descs])
    assert sims.argmax() == 0
    assert sims[0] > 0.5


def test_pnp_ransac_with_outliers():
    rng = np.random.default_rng(4)
    n = 40
    pts_w = rng.uniform(-2, 2, (n, 3)) + [0, 0, 6]
    R_gt = np.asarray(ypr_to_rot(jnp.asarray([0.3, 0.1, -0.05])))
    t_gt = np.array([0.5, -0.2, 0.3])
    pc = pts_w @ R_gt.T + t_gt
    obs = pc[:, :2] / pc[:, 2:3]
    bad = rng.choice(n, 8, replace=False)
    obs[bad] += rng.uniform(0.05, 0.15, (8, 2)) * rng.choice([-1, 1], (8, 2))
    out = kdb.pnp_ransac(pts_w, obs, min_inliers=12)
    assert out is not None
    R, t, inl = out
    assert np.abs(R - R_gt).max() < 1e-2
    assert np.linalg.norm(t - t_gt) < 0.02
    assert inl[bad].sum() <= 2
