"""Whole-estimator checkpoint / resume.

The reference could not checkpoint its estimator at all — state died with the
process; only the pose graph had save/load (SURVEY.md §5.4). Here the entire
estimator state is host arrays + a Prior pytree, so a snapshot is one npz;
resume rebuilds the estimator mid-sequence (first-class replay/recovery the
reference lacked).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from plslam.models import marginalization as marg
from plslam.models.estimator import Estimator, ImuBuffer


def save_estimator(est: Estimator, path: str):
    d = dict(
        frame_count=est.frame_count, initialized=est.initialized,
        timestamps=est.timestamps, p=est.p, q=est.q, v=est.v, ba=est.ba, bg=est.bg,
        p_bc=est.p_bc, q_bc=est.q_bc, td=est.td, td_pair=est.td_pair,
        line_w=est.line_w,
        # point table
        pt_ids=est.pt_table.ids, pt_start=est.pt_table.start, pt_obs=est.pt_table.obs,
        pt_vel=est.pt_table.vel, pt_mask=est.pt_table.mask,
        pt_inv_depth=est.pt_table.inv_depth, pt_track=est.pt_table.track_cnt,
        # line table
        ln_ids=est.ln_table.ids, ln_start=est.ln_table.start, ln_obs=est.ln_table.obs,
        ln_mask=est.ln_table.mask, ln_solved=est.ln_table.solved,
        ln_track=est.ln_table.track_cnt,
        has_prior=est.prior is not None,
        # boundary sample of the open interval: without it the first
        # post-resume IMU sample would be treated as the session's first and
        # the interval would lose its seed sample + first dt
        has_last=est.last_acc is not None,
        last_acc=est.last_acc if est.last_acc is not None else np.zeros(3),
        last_gyr=est.last_gyr if est.last_gyr is not None else np.zeros(3),
    )
    if est.prior is not None:
        for name in marg.Prior._fields:
            d[f"prior_{name}"] = np.asarray(getattr(est.prior, name))
    # imu interval buffers + their preintegrations. The preintegrations MUST
    # be persisted, not recomputed on load: each was linearized at the bias
    # estimate current when its interval closed; recomputing against the
    # (later, solved) biases changes every IMU factor and breaks exact resume.
    d["n_bufs"] = len(est.imu_bufs)
    for k, buf in enumerate(est.imu_bufs):
        d[f"buf{k}_acc"] = np.asarray(buf.acc) if buf.acc else np.zeros((0, 3))
        d[f"buf{k}_gyr"] = np.asarray(buf.gyr) if buf.gyr else np.zeros((0, 3))
        d[f"buf{k}_dt"] = np.asarray(buf.dt)
    for k, pre in enumerate(est.pres):
        d[f"pre{k}_has"] = pre is not None
        if pre is not None:
            for name, v in pre.items():
                d[f"pre{k}_{name}"] = np.asarray(v)
    np.savez_compressed(path, **d)


def load_estimator(est: Estimator, path: str):
    """Restore into a freshly-constructed Estimator (same config)."""
    z = np.load(path, allow_pickle=False)
    est.clear_state()
    est.frame_count = int(z["frame_count"])
    est.initialized = bool(z["initialized"])
    est.timestamps = z["timestamps"]
    est.p, est.q, est.v, est.ba, est.bg = z["p"], z["q"], z["v"], z["ba"], z["bg"]
    est.p_bc, est.q_bc, est.td = z["p_bc"], z["q_bc"], float(z["td"])
    if "td_pair" in z.files:  # absent in pre-r5 checkpoints
        est.td_pair = z["td_pair"]
    est.line_w = z["line_w"]
    t = est.pt_table
    t.ids, t.start, t.obs = z["pt_ids"], z["pt_start"], z["pt_obs"]
    t.vel, t.mask = z["pt_vel"], z["pt_mask"]
    t.inv_depth, t.track_cnt = z["pt_inv_depth"], z["pt_track"]
    lt = est.ln_table
    lt.ids, lt.start, lt.obs = z["ln_ids"], z["ln_start"], z["ln_obs"]
    lt.mask, lt.solved, lt.track_cnt = z["ln_mask"], z["ln_solved"], z["ln_track"]
    if bool(z["has_prior"]):
        est.prior = marg.Prior(*[jnp.asarray(z[f"prior_{n}"]) for n in marg.Prior._fields])
    est.imu_bufs = []
    est.pres = []
    for k in range(int(z["n_bufs"])):
        buf = ImuBuffer()
        acc = z[f"buf{k}_acc"]
        if len(acc):
            buf.acc = list(acc)
            buf.gyr = list(z[f"buf{k}_gyr"])
            buf.dt = list(z[f"buf{k}_dt"])
        est.imu_bufs.append(buf)
        est.pres.append(None)
    _PRE_KEYS = ("alpha", "beta", "gamma", "jac", "sqrt_info", "dt_sum", "ba", "bg")
    for k in range(len(est.imu_bufs)):
        if f"pre{k}_has" in z.files and bool(z[f"pre{k}_has"]):
            est.pres[k] = {n: jnp.asarray(z[f"pre{k}_{n}"]) for n in _PRE_KEYS}
        elif f"pre{k}_has" not in z.files and 0 < k < len(est.imu_bufs) - 1:
            est._close_interval(k)  # legacy checkpoints: approximate resume
    if "has_last" in z.files and bool(z["has_last"]):
        est.last_acc = np.asarray(z["last_acc"], np.float64)
        est.last_gyr = np.asarray(z["last_gyr"], np.float64)
    elif len(est.imu_bufs) and len(est.imu_bufs[-1].dt) > 0:
        est.last_acc = est.imu_bufs[-1].acc[-1]
        est.last_gyr = est.imu_bufs[-1].gyr[-1]
    return est
