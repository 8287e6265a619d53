"""Keyframe database: FAST-like corners + BRIEF descriptors, global place
-recognition descriptor, descriptor matching, and PnP-RANSAC geometric check.

TPU-native equivalent of the reference's `pose_graph/src/keyframe.cpp`
(`KeyFrame::computeBRIEFPoint`, `searchByBRIEFDes` Hamming<80,
`PnPRANSAC`, `findConnection`) and the vendored DBoW2 stack
(`BriefVocabulary/BriefDatabase` TF-IDF inverted index) — SURVEY.md §2.4.

Design deviation (documented, SURVEY.md §7 stage 4): DBoW2's 40 MB BRIEF
vocabulary + inverted index is replaced by a train-free global descriptor —
the mean of sign-random-projected local BRIEF descriptors, L2-normalised —
searched exhaustively on-device (one [K,D]·[D] matvec per query over ≤K
keyframes; at K≤2048 this is microseconds on the MXU and needs no vocabulary
file). Local BRIEF matching + PnP RANSAC gating mirror the reference's
thresholds.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from plslam.models.frontend_points import _bilinear, build_pyramid, shi_tomasi_grid

N_BRIEF_BITS = 256
N_BRIEF_WORDS = N_BRIEF_BITS // 32
GDESC_DIM = 128
MAX_KP = 256


def _brief_pattern(dtype=np.float32, seed=11, radius=15.0):
    """Fixed random BRIEF test pattern (the reference shipped
    `brief_pattern.yml`; ours is generated from a fixed seed)."""
    rng = np.random.default_rng(seed)
    a = rng.normal(0, radius / 2.5, (N_BRIEF_BITS, 2)).clip(-radius, radius)
    b = rng.normal(0, radius / 2.5, (N_BRIEF_BITS, 2)).clip(-radius, radius)
    return a.astype(dtype), b.astype(dtype)


_PAT_A, _PAT_B = _brief_pattern()
_PROJ = np.random.default_rng(23).choice([-1.0, 1.0], (N_BRIEF_BITS, GDESC_DIM)).astype(np.float32)


@jax.jit
def brief_descriptors(img, uv, valid):
    """Packed 256-bit BRIEF per keypoint → [N, 8] uint32 (+ bit matrix)."""
    pa = jnp.asarray(_PAT_A)
    pb = jnp.asarray(_PAT_B)

    def one(p):
        ax = p[0] + pa[:, 0]
        ay = p[1] + pa[:, 1]
        bx = p[0] + pb[:, 0]
        by = p[1] + pb[:, 1]
        va = _bilinear(img, ax, ay)
        vb = _bilinear(img, bx, by)
        return (va < vb)

    bits = jax.vmap(one)(uv)  # [N,256] bool
    bits = bits & (valid[:, None] > 0)
    words = bits.reshape(-1, N_BRIEF_WORDS, 32)
    packed = jnp.sum(words.astype(jnp.uint32) << jnp.arange(32, dtype=jnp.uint32)[None, None, :], axis=-1)
    return packed, bits


@jax.jit
def hamming_matrix(d1, d2):
    """[N1,8]u32 × [N2,8]u32 → Hamming distances [N1,N2] (XOR + popcount —
    the packed-bit matcher of SURVEY.md §2.2/§2.4)."""
    x = jnp.bitwise_xor(d1[:, None, :], d2[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


@jax.jit
def global_descriptor(bits, valid):
    """Mean sign-random-projection of local BRIEF bit vectors, L2-normalised."""
    f = (bits.astype(jnp.float32) * 2.0 - 1.0) * (valid[:, None] > 0)
    g = jnp.sum(f @ jnp.asarray(_PROJ), axis=0)
    return g / jnp.maximum(jnp.linalg.norm(g), 1e-9)


def extract_keyframe_features(img_j, extra_uv=None):
    """FAST/Shi-Tomasi corners + BRIEF for a new keyframe
    (`computeBRIEFPoint`; `computeWindowBRIEFPoint` when extra_uv carries the
    estimator's window points)."""
    uv, score = shi_tomasi_grid(
        img_j, jnp.zeros((1, 2), img_j.dtype), jnp.zeros((1,), img_j.dtype),
        cell=16, max_out=MAX_KP,
    )
    valid = (score > 1e-5).astype(img_j.dtype)
    if extra_uv is not None and len(extra_uv):
        n = min(len(extra_uv), MAX_KP // 4)
        uv = jnp.concatenate([jnp.asarray(extra_uv[:n], img_j.dtype), uv[: MAX_KP - n]])
        valid = jnp.concatenate([jnp.ones((n,), img_j.dtype), valid[: MAX_KP - n]])
    desc, bits = brief_descriptors(img_j, uv, valid)
    gdesc = global_descriptor(bits, valid)
    return np.asarray(uv), np.asarray(valid, bool), np.asarray(desc), np.asarray(gdesc)


# ----------------------------------------------------------------- PnP RANSAC
def pnp_ransac(pts3d, pts2d_norm, iters=120, thresh=8.0 / 460.0, seed=0, min_inliers=12):
    """`cv::solvePnPRansac` equivalent: DLT-6pt hypotheses + reprojection
    scoring + refit (host numpy — runs only on loop candidates).

    pts3d [N,3] world, pts2d_norm [N,2] normalized obs in query cam.
    Returns (R_cw, t_cw, inlier_mask) with x_c = R_cw x_w + t_cw, or None."""
    n = len(pts3d)
    if n < 6:
        return None
    rng = np.random.default_rng(seed)

    def dlt(idx):
        X = pts3d[idx]
        x = pts2d_norm[idx]
        A = []
        for k in range(len(idx)):
            Xk = np.append(X[k], 1.0)
            A.append(np.concatenate([Xk, np.zeros(4), -x[k, 0] * Xk]))
            A.append(np.concatenate([np.zeros(4), Xk, -x[k, 1] * Xk]))
        _, _, Vt = np.linalg.svd(np.asarray(A))
        P = Vt[-1].reshape(3, 4)
        M = P[:, :3]
        # orthonormalize: SVD projection to rotation
        U, S, Vt2 = np.linalg.svd(M)
        scale = np.mean(S)
        R = U @ Vt2
        if np.linalg.det(R) < 0:
            R = -R
            scale = -scale
        t = P[:, 3] / scale
        return R, t

    def score(R, t):
        pc = pts3d @ R.T + t
        z = pc[:, 2]
        proj = pc[:, :2] / np.where(np.abs(z[:, None]) > 1e-6, z[:, None], 1e-6)
        err = np.linalg.norm(proj - pts2d_norm, axis=1)
        return (err < thresh) & (z > 0.1)

    best = None
    for _ in range(iters):
        idx = rng.choice(n, 6, replace=False)
        try:
            R, t = dlt(idx)
        except np.linalg.LinAlgError:
            continue
        inl = score(R, t)
        if best is None or inl.sum() > best[2].sum():
            best = (R, t, inl)
    if best is None or best[2].sum() < min_inliers:
        return None
    R, t, inl = best
    try:
        R, t = dlt(np.nonzero(inl)[0][:24])
        inl = score(R, t)
    except np.linalg.LinAlgError:
        pass
    if inl.sum() < min_inliers:
        return None
    return R, t, inl


class KeyframeDB:
    """Fixed-capacity keyframe store + exhaustive global-descriptor search
    (`BriefDatabase::query` replacement, thresholds per `detectLoop`)."""

    def __init__(self, capacity=2048):
        self.capacity = capacity
        self.gdescs = np.zeros((capacity, GDESC_DIM), np.float32)
        self.n = 0
        self.entries = []  # per-kf dicts: uv, valid, desc, pts3d, pose

    def add(self, entry, gdesc):
        if self.n >= self.capacity:
            return -1
        self.gdescs[self.n] = gdesc
        self.entries.append(entry)
        self.n += 1
        return self.n - 1

    def query(self, gdesc, exclude_last=50, min_score=0.15, top_k=4):
        """Top-k cosine candidates older than `exclude_last` frames.
        Mirrors detectLoop's relative-threshold + temporal consistency: accept
        when the best is strong and a second candidate is also present."""
        hi = self.n - exclude_last
        if hi <= 0:
            return None
        sims = self.gdescs[:hi] @ gdesc
        order = np.argsort(-sims)[:top_k]
        if sims[order[0]] < min_score:
            return None
        if len(order) > 1 and sims[order[1]] < min_score * 0.45:
            return None
        return int(order[0])
