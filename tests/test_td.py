"""Temporal calibration: the solver must recover a known camera-IMU time
offset through the velocity-corrected projection factors
(`ProjectionTdFactor`, SURVEY.md §2.3 / §A.3)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plslam.config import SolverConfig
from plslam.io import synthetic
from plslam.models import packing, solver
from plslam.models.state import layout

CFG = SolverConfig(max_features=48, max_line_feats=8)
LAY = layout(CFG)


def test_solver_recovers_time_offset():
    td_true = 0.012  # 12 ms camera latency
    seq = synthetic.make_sequence(duration=6.0, n_points=120, n_lines=8, seed=3)
    frames = list(range(0, 55, 5))
    state, f = packing.factors_from_synthetic(seq, frames, CFG, LAY, with_lines=False)

    # regenerate observations at (frame time + td) + per-feature velocities:
    # the camera actually sampled later than its timestamp claims
    params = synthetic.TrajectoryParams()
    from plslam.utils.geometry import quat_conj, quat_mul, quat_rotate
    from plslam.io.synthetic import gt_pose

    obs = np.asarray(f.pt_obs).copy()
    vel = np.zeros_like(obs)
    mask = np.asarray(f.pt_mask)
    lm = np.asarray(seq.landmarks)
    # map table slots back to landmark rows by matching current obs columns
    for j, fr in enumerate(frames):
        t = float(seq.frame_t[fr])
        for dt_i, target in ((td_true, "obs"), (1e-3, "vp"), (-1e-3, "vm")):
            p_b, q_b = gt_pose(params, jnp.asarray(t + dt_i))
            q_wc = quat_mul(q_b, seq.q_bc)
            p_wc = p_b + quat_rotate(q_b, seq.p_bc)
            R = np.asarray(jnp.asarray(
                __import__("plslam.utils.geometry", fromlist=["quat_to_rot"]).quat_to_rot(q_wc)
            ))
            pc = (lm - np.asarray(p_wc)) @ R
            mn = pc[:, 0:2] / pc[:, 2:3]
            if target == "obs":
                shifted = mn
            elif target == "vp":
                vp = mn
            else:
                vm = mn
        dmn = (vp - vm) / 2e-3  # normalized-coordinate velocity
        # write into the slots that observe frame j (packing kept landmark order
        # in candidate selection — recover the mapping by nearest obs)
        for s in range(obs.shape[0]):
            if mask[s, j] > 0:
                li = int(np.argmin(np.sum((mn - obs[s, j]) ** 2, axis=1) + 1e9 * (pc[:, 2] < 0.1)))
                obs[s, j] = shifted[li]
                vel[s, j] = dmn[li]

    f = f._replace(pt_obs=jnp.asarray(obs), pt_vel=jnp.asarray(vel))
    st_out, stats = solver.optimize_window(
        state, f, LAY, CFG, estimate_td=True, num_iters=10
    )
    td_est = float(st_out.td)
    assert abs(td_est - td_true) < 2e-3, f"td {td_est:.4f} vs {td_true}"


def test_rolling_shutter_correction_wiring():
    """The TR·row/ROW term must undo a row-dependent observation shift
    (`ProjectionTdFactor` rolling-shutter path)."""
    import jax.numpy as jnp
    from plslam.models import residuals as res

    seq = synthetic.make_sequence(duration=6.0, n_points=120, n_lines=8, seed=3)
    frames = list(range(0, 55, 5))
    state, f = packing.factors_from_synthetic(seq, frames, CFG, LAY, with_lines=False)
    rng = np.random.default_rng(1)
    vel = jnp.asarray(rng.standard_normal(np.asarray(f.pt_obs).shape) * 0.3)
    rowf = jnp.asarray(rng.uniform(0, 1, np.asarray(f.pt_mask).shape))
    tr = 0.02
    # raw observations sampled later by tr*rowf → shifted along their velocity
    obs_shift = f.pt_obs + tr * rowf[..., None] * vel
    f_rs = f._replace(pt_obs=obs_shift, pt_vel=vel, pt_rowf=rowf,
                      rs_tr=jnp.asarray(tr, f.pt_obs.dtype))
    r = res.point_residuals(state, f_rs, CFG.focal_length)
    assert float(jnp.abs(r).max()) < 1e-9  # correction exactly undoes the shift
    # without the correction the residuals are large
    f_off = f_rs._replace(rs_tr=jnp.zeros((), f.pt_obs.dtype))
    r2 = res.point_residuals(state, f_off, CFG.focal_length)
    assert float(jnp.abs(r2).max()) > 0.1
