import jax.numpy as jnp
import numpy as np
import pytest

from plslam.ops import lines
from plslam.utils.geometry import quat_to_rot, so3_exp


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def rand_line(rng):
    p1 = jnp.asarray(rng.standard_normal(3) * 3)
    p2 = jnp.asarray(rng.standard_normal(3) * 3)
    return p1, p2, lines.plucker_from_points(p1, p2)


def point_line_dist(L, p):
    c = lines.closest_point_on_line(L, p)
    return float(jnp.linalg.norm(c - p))


def test_plucker_moment_property(rng):
    p1, p2, L = rand_line(rng)
    n, v = lines.plucker_split(L)
    np.testing.assert_allclose(n, jnp.cross(p1, v), atol=1e-12)
    # points on the line have zero distance
    for a in (0.0, 0.5, 1.0, 2.5, -1.0):
        assert point_line_dist(L, p1 + a * (p2 - p1)) < 1e-9


def test_orth_roundtrip(rng):
    _, _, L = rand_line(rng)
    U, w1, w2 = lines.plucker_to_orth(L)
    d = float(jnp.linalg.norm(L))
    L2 = d * lines.orth_to_plucker(U, w1, w2)
    np.testing.assert_allclose(L2, L, atol=1e-9)
    # U is a rotation
    np.testing.assert_allclose(U.T @ U, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(jnp.linalg.det(U), 1.0, atol=1e-12)


def test_orth_retract_zero_is_identity(rng):
    _, _, L = rand_line(rng)
    np.testing.assert_allclose(lines.orth_retract(L, jnp.zeros(4)), L, atol=1e-9)


def test_orth_retract_is_4dof_chart(rng):
    _, _, L = rand_line(rng)
    d = jnp.asarray(rng.standard_normal(4) * 0.2)
    L2 = lines.orth_retract(L, d)
    # scale preserved, still a valid plücker line (n ⟂ v)
    np.testing.assert_allclose(jnp.linalg.norm(L2), jnp.linalg.norm(L), atol=1e-9)
    n, v = lines.plucker_split(L2)
    assert abs(float(jnp.dot(n, v))) < 1e-9


def test_transform_matches_point_transform(rng):
    p1, p2, L = rand_line(rng)
    R = so3_exp(jnp.asarray(rng.standard_normal(3)))
    t = jnp.asarray(rng.standard_normal(3))
    Lt = lines.plucker_transform(L, R, t)
    Lt_ref = lines.plucker_from_points(R @ p1 + t, R @ p2 + t)
    # same line up to scale: compare normalized with sign fix
    a = Lt / jnp.linalg.norm(Lt)
    b = Lt_ref / jnp.linalg.norm(Lt_ref)
    sign = jnp.sign(jnp.dot(a, b))
    np.testing.assert_allclose(a, sign * b, atol=1e-9)


def test_triangulation_from_two_planes(rng):
    # ground-truth 3D segment observed from two camera poses
    p1 = jnp.asarray([2.0, 1.0, 3.0])
    p2 = jnp.asarray([2.5, -0.5, 4.0])
    poses = []
    for c in ([0.0, 0.0, 0.0], [1.0, 0.3, -0.2]):
        R_wc = so3_exp(jnp.asarray(rng.standard_normal(3) * 0.1))
        p_wc = jnp.asarray(c)
        poses.append((R_wc, p_wc))

    def normalized_obs(R_wc, p_wc, P):
        pc = R_wc.T @ (P - p_wc)
        return pc[0:2] / pc[2]

    planes = []
    for R_wc, p_wc in poses:
        s = normalized_obs(R_wc, p_wc, p1)
        e = normalized_obs(R_wc, p_wc, p2)
        planes.append(lines.plane_from_cam_segment(R_wc, p_wc, s, e))
    L = lines.plucker_from_planes(planes[0], planes[1])
    assert point_line_dist(L, p1) < 1e-8
    assert point_line_dist(L, p2) < 1e-8


def test_projection_residual_zero_for_exact(rng):
    p1 = jnp.asarray([1.0, 0.5, 4.0])
    p2 = jnp.asarray([0.2, -0.8, 5.0])
    L_c = lines.plucker_from_points(p1, p2)  # already in camera frame
    s = p1[0:2] / p1[2]
    e = p2[0:2] / p2[2]
    r = lines.line_projection_residual(L_c, s, e)
    np.testing.assert_allclose(r, 0.0, atol=1e-9)
    # perturbed endpoints give the perpendicular distance
    off = jnp.asarray([0.01, 0.0])
    r2 = lines.line_projection_residual(L_c, s + off, e)
    assert abs(float(r2[0])) > 1e-4
