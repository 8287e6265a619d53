import jax.numpy as jnp
import numpy as np

from plslam.ops import cameras


def test_project_lift_roundtrip_euroc():
    cam = cameras.PinholeRadTan.euroc_cam0(jnp.float64)
    rng = np.random.default_rng(0)
    mn = jnp.asarray(rng.uniform(-0.55, 0.55, (200, 2)))
    p_c = jnp.concatenate([mn, jnp.ones((200, 1))], axis=-1) * rng.uniform(0.5, 10, (200, 1))
    uv = cameras.project(cam, p_c)
    mn2 = cameras.lift(cam, uv, iters=30)
    np.testing.assert_allclose(mn2, mn, atol=1e-9)
    # production default (8 iters) is sub-hundredth-pixel accurate
    mn8 = cameras.lift(cam, uv)
    assert float(jnp.max(jnp.abs(mn8 - mn))) * 460.0 < 5e-3


def test_zero_distortion_identity():
    cam = cameras.PinholeRadTan.create(400.0, 400.0, 320.0, 240.0, dtype=jnp.float64)
    mn = jnp.asarray([[0.3, -0.2]])
    np.testing.assert_allclose(cameras.distort(cam, mn), mn, atol=1e-14)
    uv = cameras.normalized_to_pixel(cam, mn)
    np.testing.assert_allclose(uv, [[320 + 0.3 * 400, 240 - 0.2 * 400]], atol=1e-10)


def test_project_batch_shapes():
    cam = cameras.PinholeRadTan.euroc_cam0(jnp.float32)
    p = jnp.ones((4, 7, 3))
    assert cameras.project(cam, p).shape == (4, 7, 2)
    assert cameras.lift(cam, jnp.ones((4, 7, 2))).shape == (4, 7, 2)


def test_equidistant_roundtrip():
    cam = cameras.EquidistantCamera.create(
        280.0, 280.0, 376.0, 240.0, -0.012, 0.021, -0.013, 0.002, dtype=jnp.float64
    )
    rng = np.random.default_rng(1)
    # rays up to ~60° off-axis (fisheye regime)
    mn = jnp.asarray(rng.uniform(-1.5, 1.5, (200, 2)))
    p_c = jnp.concatenate([mn, jnp.ones((200, 1))], axis=-1)
    uv = cameras.equi_project(cam, p_c)
    mn2 = cameras.equi_lift(cam, uv, iters=12)
    np.testing.assert_allclose(mn2, mn, atol=1e-8)


def test_scaramuzza_roundtrip():
    # typical ocam polynomial (z negative-at-center convention folded positive)
    cam = cameras.ScaramuzzaCamera.create(
        280.0, -1.5e-3, 6e-7, -2e-10, c=1.001, d=1e-4, e=-2e-4, cx=376.0, cy=240.0,
        dtype=jnp.float64,
    )
    rng = np.random.default_rng(3)
    mn = jnp.asarray(rng.uniform(-0.7, 0.7, (200, 2)))
    p_c = jnp.concatenate([mn, jnp.ones((200, 1))], axis=-1) * rng.uniform(1, 6, (200, 1))
    uv = cameras.scara_project(cam, p_c, iters=20)
    mn2 = cameras.scara_lift(cam, uv)
    np.testing.assert_allclose(mn2, mn, atol=1e-7)


def test_mei_roundtrip():
    cam = cameras.MeiCamera.create(
        0.9, 470.0, 470.0, 376.0, 240.0, -0.08, 0.02, 1e-4, -1e-4, dtype=jnp.float64
    )
    rng = np.random.default_rng(2)
    mn = jnp.asarray(rng.uniform(-0.6, 0.6, (200, 2)))
    p_c = jnp.concatenate([mn, jnp.ones((200, 1))], axis=-1) * rng.uniform(1, 8, (200, 1))
    uv = cameras.mei_project(cam, p_c)
    mn2 = cameras.mei_lift(cam, uv, iters=20)
    np.testing.assert_allclose(mn2, mn, atol=1e-6)
