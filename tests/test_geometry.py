import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plslam.utils import geometry as geo


def rand_quat(rng, n=None):
    q = rng.standard_normal((n, 4) if n else 4)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    return jnp.asarray(q)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def test_quat_mul_matches_rotation_composition(rng):
    q1, q2 = rand_quat(rng), rand_quat(rng)
    R12 = geo.quat_to_rot(geo.quat_mul(q1, q2))
    np.testing.assert_allclose(R12, geo.quat_to_rot(q1) @ geo.quat_to_rot(q2), atol=1e-12)


def test_quat_rotate_matches_matrix(rng):
    q = rand_quat(rng, 7)
    v = jnp.asarray(rng.standard_normal((7, 3)))
    np.testing.assert_allclose(
        geo.quat_rotate(q, v), jnp.einsum("nij,nj->ni", geo.quat_to_rot(q), v), atol=1e-12
    )


def test_rot_quat_roundtrip(rng):
    q = rand_quat(rng, 50)
    q = q * jnp.where(q[:, 0:1] < 0, -1.0, 1.0)
    q2 = geo.rot_to_quat(geo.quat_to_rot(q))
    np.testing.assert_allclose(q2, q, atol=1e-9)


def test_rot_quat_roundtrip_degenerate():
    # near-pi rotations around each axis hit the non-w branches
    for axis in np.eye(3):
        q = geo.quat_exp(jnp.asarray(axis * (np.pi - 1e-4)))
        R = geo.quat_to_rot(q)
        np.testing.assert_allclose(geo.quat_to_rot(geo.rot_to_quat(R)), R, atol=1e-9)


def test_exp_log_roundtrip(rng):
    th = jnp.asarray(rng.standard_normal((20, 3)) * 1.0)
    np.testing.assert_allclose(geo.quat_log(geo.quat_exp(th)), th, atol=1e-9)
    tiny = jnp.asarray(rng.standard_normal((5, 3)) * 1e-8)
    np.testing.assert_allclose(geo.quat_log(geo.quat_exp(tiny)), tiny, atol=1e-12)


def test_box_plus_minus_inverse(rng):
    q = rand_quat(rng)
    d = jnp.asarray(rng.standard_normal(3) * 0.3)
    q2 = geo.quat_box_plus(q, d)
    # box_minus is 2·vec(q⁻¹⊗q2) ≈ d to first order; exact via log
    np.testing.assert_allclose(
        geo.quat_log(geo.quat_mul(geo.quat_conj(q), q2)), d, atol=1e-9
    )


def test_ypr_roundtrip(rng):
    ypr = jnp.asarray(rng.uniform([-np.pi, -1.4, -np.pi], [np.pi, 1.4, np.pi], (30, 3)))
    np.testing.assert_allclose(geo.rot_to_ypr(geo.ypr_to_rot(ypr)), ypr, atol=1e-9)


def test_gravity_to_rot(rng):
    g = jnp.asarray(rng.standard_normal((10, 3)) * 0.3 + np.array([0.05, -0.02, 9.8]))
    for gi in g:
        R0 = geo.gravity_to_rot(gi)
        z = R0 @ (gi / jnp.linalg.norm(gi))
        np.testing.assert_allclose(z, [0, 0, 1], atol=1e-9)
        assert abs(float(geo.rot_to_ypr(R0)[0])) < 1e-9


def test_from_two_vectors_antiparallel():
    a = jnp.asarray([0.0, 0.0, 1.0])
    b = jnp.asarray([0.0, 0.0, -1.0])
    R = geo.rot_from_two_vectors(a, b)
    np.testing.assert_allclose(R @ a, b, atol=1e-7)


def test_skew(rng):
    a = jnp.asarray(rng.standard_normal(3))
    b = jnp.asarray(rng.standard_normal(3))
    np.testing.assert_allclose(geo.skew(a) @ b, jnp.cross(a, b), atol=1e-12)


def test_pose_inverse(rng):
    q = rand_quat(rng)
    p = jnp.asarray(rng.standard_normal(3))
    pi, qi = geo.pose_inverse(p, q)
    x = jnp.asarray(rng.standard_normal(3))
    y = geo.quat_rotate(q, x) + p
    np.testing.assert_allclose(geo.quat_rotate(qi, y) + pi, x, atol=1e-12)


def test_jit_and_vmap_compat(rng):
    q = rand_quat(rng, 16)
    f = jax.jit(jax.vmap(geo.quat_to_rot))
    np.testing.assert_allclose(f(q), geo.quat_to_rot(q), atol=1e-12)
