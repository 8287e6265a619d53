"""Builders that pack measurements into the fixed-shape `WindowFactors`.

Two producers exist: the live estimator (from its feature tables) and this
module's synthetic packer (ground-truth-exact windows for tests and benches
— replacing the reference's rosbag-replay validation, SURVEY.md §4).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from plslam.config import SolverConfig
from plslam.io.synthetic import SyntheticSequence, imu_between
from plslam.models.residuals import WindowFactors, empty_factors
from plslam.models.state import TangentLayout, WindowState, zero_state
from plslam.ops import imu as imu_ops
from plslam.ops.lines import plucker_from_points
from plslam.utils.geometry import quat_conj, quat_mul, quat_rotate


def _default_dtype(dtype):
    """f64 when the runtime has it, f32 otherwise — requesting jnp.float64
    under an f32-only runtime only produces warning spam + a silent cast."""
    if dtype is not None:
        return dtype
    import jax

    return jnp.float64 if jax.config.x64_enabled else jnp.float32


def gt_window_state(seq: SyntheticSequence, frames, cfg: SolverConfig, dtype=None) -> WindowState:
    dtype = _default_dtype(dtype)
    idx = np.asarray(frames)
    st = zero_state(cfg, dtype)
    return st._replace(
        p=seq.gt_p[idx].astype(dtype),
        q=seq.gt_q[idx].astype(dtype),
        v=seq.gt_v[idx].astype(dtype),
        p_bc=seq.p_bc.astype(dtype),
        q_bc=seq.q_bc.astype(dtype),
    )


def cam_pose_at(seq: SyntheticSequence, k):
    q_wc = quat_mul(seq.gt_q[k], seq.q_bc)
    p_wc = seq.gt_p[k] + quat_rotate(seq.gt_q[k], seq.p_bc)
    return p_wc, q_wc


def factors_from_synthetic(
    seq: SyntheticSequence,
    frames,
    cfg: SolverConfig,
    lay: TangentLayout,
    dtype=None,
    with_lines: bool = True,
    noise: imu_ops.ImuNoise | None = None,
):
    """Pack a ground-truth window over the given frame indices.

    Returns (gt_state, factors) where gt_state holds true poses, true inverse
    depths (anchored in each feature's first observing frame) and true world
    Plücker lines — the solver should reproduce it from perturbations."""
    dtype = _default_dtype(dtype)
    nw = lay.nw
    assert len(frames) == nw
    # dtype-aware throughout: explicit jnp.float64 requests under an f32-only
    # runtime (bench, dryrun) spam harmless-but-noisy x64 warnings
    noise = noise or imu_ops.ImuNoise.euroc(dtype)
    f = empty_factors(cfg, lay, dtype)
    state = gt_window_state(seq, frames, cfg, dtype)

    # --- IMU preintegrations ---
    pres = []
    for k in range(nw - 1):
        acc, gyr, dt = imu_between(seq, float(seq.frame_t[frames[k]]), float(seq.frame_t[frames[k + 1]]))
        pres.append(imu_ops.preintegrate(acc.astype(dtype), gyr.astype(dtype), dt.astype(dtype),
                                         jnp.zeros(3, dtype), jnp.zeros(3, dtype), noise))
    f = f._replace(
        imu_alpha=jnp.stack([p.alpha for p in pres]).astype(dtype),
        imu_beta=jnp.stack([p.beta for p in pres]).astype(dtype),
        imu_gamma=jnp.stack([p.gamma for p in pres]).astype(dtype),
        imu_jac=jnp.stack([p.jac for p in pres]).astype(dtype),
        imu_sqrt_info=jnp.stack([imu_ops.sqrt_info_from_cov(p.cov) for p in pres]).astype(dtype),
        imu_dt=jnp.stack([p.dt_sum for p in pres]).astype(dtype),
        imu_ba=jnp.zeros((nw - 1, 3), dtype),
        imu_bg=jnp.zeros((nw - 1, 3), dtype),
        imu_valid=jnp.ones((nw - 1,), dtype),
    )

    # --- points: choose landmarks observed in ≥2 window frames ---
    vis = np.asarray(seq.obs_valid[np.asarray(frames)])  # [nw, L]
    n_obs = vis.sum(axis=0)
    cand = np.nonzero(n_obs >= 2)[0][: lay.max_f]
    pt_obs = np.zeros((lay.max_f, nw, 2))
    pt_mask = np.zeros((lay.max_f, nw))
    pt_start = np.zeros(lay.max_f, np.int32)
    pt_valid = np.zeros(lay.max_f)
    inv_depth = np.full(lay.max_f, 0.2)
    obs_np = np.asarray(seq.obs[np.asarray(frames)])  # [nw, L, 2]
    for s, li in enumerate(cand):
        pt_obs[s] = obs_np[:, li]
        pt_mask[s] = vis[:, li]
        start = int(np.nonzero(vis[:, li])[0][0])
        pt_start[s] = start
        pt_valid[s] = 1.0
        # true inverse depth in anchor camera
        p_wc, q_wc = cam_pose_at(seq, frames[start])
        pc = quat_rotate(quat_conj(q_wc), seq.landmarks[li] - p_wc)
        inv_depth[s] = 1.0 / float(pc[2])
    f = f._replace(
        pt_obs=jnp.asarray(pt_obs, dtype),
        pt_mask=jnp.asarray(pt_mask, dtype),
        pt_start=jnp.asarray(pt_start),
        pt_valid=jnp.asarray(pt_valid, dtype),
    )
    state = state._replace(inv_depth=jnp.asarray(inv_depth, dtype))

    # --- lines ---
    if with_lines:
        lvis = np.asarray(seq.line_obs_valid[np.asarray(frames)])  # [nw, S]
        lcand = np.nonzero(lvis.sum(axis=0) >= 2)[0][: lay.max_l]
        ln_obs = np.zeros((lay.max_l, nw, 4))
        ln_mask = np.zeros((lay.max_l, nw))
        ln_valid = np.zeros(lay.max_l)
        ln_start = np.zeros(lay.max_l, np.int32)
        line_w = np.asarray(state.line).copy()
        lobs_np = np.asarray(seq.line_obs[np.asarray(frames)])
        for s, li in enumerate(lcand):
            ln_obs[s] = lobs_np[:, li]
            ln_mask[s] = lvis[:, li]
            ln_valid[s] = 1.0
            ln_start[s] = int(np.nonzero(lvis[:, li])[0][0])
            line_w[s] = np.asarray(plucker_from_points(seq.line_sp[li], seq.line_ep[li]))
        f = f._replace(
            ln_obs=jnp.asarray(ln_obs, dtype),
            ln_mask=jnp.asarray(ln_mask, dtype),
            ln_valid=jnp.asarray(ln_valid, dtype),
            ln_start=jnp.asarray(ln_start),
        )
        state = state._replace(line=jnp.asarray(line_w, dtype))

    f = f._replace(g=jnp.asarray([0.0, 0.0, 9.81007], dtype))
    return state, f


def _imu_slice_interp(imu_t, acc, gyr, t0: float, t1: float):
    """Samples covering [t0, t1] with linear interpolation AT both
    boundaries — the off-grid analog of `imu_between` (real camera stamps
    do not coincide with IMU ticks; `getMeasurements` pairing semantics)."""
    imu_t = np.asarray(imu_t, np.float64)
    acc = np.asarray(acc, np.float64)
    gyr = np.asarray(gyr, np.float64)

    def at(t):
        i = int(np.clip(np.searchsorted(imu_t, t), 1, len(imu_t) - 1))
        w = (t - imu_t[i - 1]) / max(imu_t[i] - imu_t[i - 1], 1e-12)
        w = float(np.clip(w, 0.0, 1.0))
        return (1 - w) * acc[i - 1] + w * acc[i], (1 - w) * gyr[i - 1] + w * gyr[i]

    lo = int(np.searchsorted(imu_t, t0 + 1e-9))
    hi = int(np.searchsorted(imu_t, t1 - 1e-9))
    a0, g0 = at(t0)
    a1, g1 = at(t1)
    ts = np.concatenate([[t0], imu_t[lo:hi], [t1]])
    accs = np.concatenate([[a0], acc[lo:hi], [a1]])
    gyrs = np.concatenate([[g0], gyr[lo:hi], [g1]])
    return accs, gyrs, np.diff(ts)


def factors_from_tracks(
    kf_t,          # [nw] keyframe timestamps
    kf_ids,        # list of nw int arrays: frontend feature ids per keyframe
    kf_obs,        # list of nw [n_k,2] arrays: normalized obs per keyframe
    imu_t, imu_acc, imu_gyr,   # raw IMU stream
    cfg: SolverConfig,
    lay: TangentLayout,
    ba, bg,        # bias linearization points (live estimates)
    dtype=None,
    noise: imu_ops.ImuNoise | None = None,
    g_norm: float = 9.81007,
):
    """Pack a window from REAL frontend tracks — the live-pipeline analog of
    `factors_from_synthetic` (no ground truth anywhere): feature ids +
    normalized observations recorded from the image frontends, IMU
    preintegrated over the actual keyframe gaps at the live biases. Depths
    are NOT set here (triangulate from the live poses; `pt_valid` marks
    rows observed ≥2×). Reference lineage: this is what the estimator's own
    `FeatureManager`+`IntegrationBase` hand the Ceres problem, rebuilt over
    an arbitrary keyframe subset for the large-window refinement mode."""
    dtype = _default_dtype(dtype)
    nw = lay.nw
    assert len(kf_t) == nw and len(kf_ids) == nw
    noise = noise or imu_ops.ImuNoise.euroc(dtype)
    f = empty_factors(cfg, lay, dtype)
    ba = np.asarray(ba, np.float64)
    bg = np.asarray(bg, np.float64)

    pres = []
    for k in range(nw - 1):
        acc, gyr, dts = _imu_slice_interp(imu_t, imu_acc, imu_gyr,
                                          float(kf_t[k]), float(kf_t[k + 1]))
        pres.append(imu_ops.preintegrate(
            jnp.asarray(acc, dtype), jnp.asarray(gyr, dtype),
            jnp.asarray(dts, dtype), jnp.asarray(ba, dtype),
            jnp.asarray(bg, dtype), noise))
    f = f._replace(
        imu_alpha=jnp.stack([p.alpha for p in pres]),
        imu_beta=jnp.stack([p.beta for p in pres]),
        imu_gamma=jnp.stack([p.gamma for p in pres]),
        imu_jac=jnp.stack([p.jac for p in pres]),
        imu_sqrt_info=jnp.stack([imu_ops.sqrt_info_from_cov(p.cov) for p in pres]),
        imu_dt=jnp.stack([p.dt_sum for p in pres]),
        imu_ba=jnp.asarray(np.tile(ba, (nw - 1, 1)), dtype),
        imu_bg=jnp.asarray(np.tile(bg, (nw - 1, 1)), dtype),
        imu_valid=jnp.ones((nw - 1,), dtype),
    )

    # --- points: tracks observed in ≥2 of these keyframes, longest first
    # (the best-constrained tracks claim the fixed capacity) ---
    count: dict = {}
    for ids_k in kf_ids:
        for i in np.asarray(ids_k, np.int64):
            count[int(i)] = count.get(int(i), 0) + 1
    cand = sorted((i for i, c in count.items() if c >= 2),
                  key=lambda i: -count[i])[: lay.max_f]
    slot_of = {i: s for s, i in enumerate(cand)}
    pt_obs = np.zeros((lay.max_f, nw, 2))
    pt_mask = np.zeros((lay.max_f, nw))
    for k in range(nw):
        ids_k = np.asarray(kf_ids[k], np.int64)
        obs_k = np.asarray(kf_obs[k], np.float64)
        for j, i in enumerate(ids_k):
            s = slot_of.get(int(i))
            if s is not None:
                pt_obs[s, k] = obs_k[j]
                pt_mask[s, k] = 1.0
    pt_start = np.where(pt_mask.any(axis=1), np.argmax(pt_mask > 0, axis=1), 0)
    pt_valid = (pt_mask.sum(axis=1) >= 2).astype(np.float64)
    f = f._replace(
        pt_obs=jnp.asarray(pt_obs, dtype),
        pt_mask=jnp.asarray(pt_mask, dtype),
        pt_start=jnp.asarray(pt_start, np.int32),
        pt_valid=jnp.asarray(pt_valid, dtype),
        g=jnp.asarray([0.0, 0.0, g_norm], dtype),
    )
    return f
