"""Pallas kernel tests (interpret mode on CPU; compiled on TPU via bench)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plslam.models import frontend_points as fp
from plslam.models.keyframe_db import hamming_matrix
from plslam.ops.kernels.hamming import hamming_matrix_pallas
from plslam.ops.kernels.lk import lk_track_pallas


def test_hamming_pallas_matches_reference():
    rng = np.random.default_rng(0)
    d1 = jnp.asarray(rng.integers(0, 2**32, (150, 8), dtype=np.uint32))
    d2 = jnp.asarray(rng.integers(0, 2**32, (90, 8), dtype=np.uint32))
    ref = np.asarray(hamming_matrix(d1, d2))
    out = np.asarray(hamming_matrix_pallas(d1, d2, interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_lk_pallas_tracks_known_shift():
    from test_frontend import smooth_texture, shift_image

    rng = np.random.default_rng(3)
    img1 = smooth_texture(rng)
    dx, dy = 3.7, -2.3
    img2 = shift_image(img1, dx, dy)
    pyr1 = fp.build_pyramid(jnp.asarray(img1), levels=fp.auto_levels(img1.shape))
    pyr2 = fp.build_pyramid(jnp.asarray(img2), levels=fp.auto_levels(img2.shape))
    uv, score = fp.shi_tomasi_grid(
        jnp.asarray(img1), jnp.zeros((1, 2), jnp.float32), jnp.zeros((1,), jnp.float32),
        cell=24, max_out=40,
    )
    uv = np.asarray(uv)[np.asarray(score) > 1e-5][:24]
    keep = (uv[:, 0] > 30) & (uv[:, 0] < 290) & (uv[:, 1] > 30) & (uv[:, 1] < 210)
    uv = jnp.asarray(uv[keep], jnp.float32)

    out, status = lk_track_pallas(pyr1, pyr2, uv, jnp.ones(len(uv), bool), interpret=True)
    out = np.asarray(out)
    status = np.asarray(status)
    assert status.sum() >= len(uv) * 0.7, status
    flow = out[status] - np.asarray(uv)[status]
    err = np.linalg.norm(flow - np.array([dx, dy]), axis=1)
    assert np.median(err) < 0.3, (np.median(err), flow[:5])

    # agreement with the jnp reference tracker
    out_j, status_j = fp.lk_track(pyr1, pyr2, uv, jnp.ones(len(uv), bool))
    both = status & np.asarray(status_j)
    d = np.linalg.norm(out[both] - np.asarray(out_j)[both], axis=1)
    assert np.median(d) < 0.3, np.median(d)


def test_lk_fast_matches_reference():
    """The batched-matmul LK (production path) vs the per-feature reference."""
    from test_frontend import smooth_texture, shift_image

    rng = np.random.default_rng(5)
    img1 = smooth_texture(rng)
    dx, dy = 2.6, 3.1
    img2 = shift_image(img1, dx, dy)
    pyr1 = fp.build_pyramid(jnp.asarray(img1), levels=fp.auto_levels(img1.shape))
    pyr2 = fp.build_pyramid(jnp.asarray(img2), levels=fp.auto_levels(img2.shape))
    uv, score = fp.shi_tomasi_grid(
        jnp.asarray(img1), jnp.zeros((1, 2), jnp.float32), jnp.zeros((1,), jnp.float32),
        cell=24, max_out=40,
    )
    uv = np.asarray(uv)[np.asarray(score) > 1e-5][:24]
    keep = (uv[:, 0] > 30) & (uv[:, 0] < 290) & (uv[:, 1] > 30) & (uv[:, 1] < 210)
    uv = jnp.asarray(uv[keep], jnp.float32)

    out, status = fp.lk_track_fast(pyr1, pyr2, uv, jnp.ones(len(uv), bool))
    out = np.asarray(out)
    status = np.asarray(status)
    assert status.sum() >= len(uv) * 0.8
    flow = out[status] - np.asarray(uv)[status]
    err = np.linalg.norm(flow - np.array([dx, dy]), axis=1)
    assert np.median(err) < 0.25, np.median(err)
