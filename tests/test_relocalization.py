"""Relocalization factors: the window solve must refine an old-keyframe pose
against matched window features (the reference's setReloFrame → relo
ProjectionFactors → relative-pose feedback, SURVEY.md §3.4)."""
import jax.numpy as jnp
import numpy as np
import pytest

from plslam.config import SolverConfig
from plslam.io import synthetic
from plslam.models import packing, residuals as res, solver
from plslam.models.state import layout
from plslam.utils.geometry import quat_box_minus, quat_box_plus, quat_conj, quat_mul, quat_rotate

CFG = SolverConfig(max_features=48, max_line_feats=12)
LAY = layout(CFG)


@pytest.fixture(scope="module")
def window_with_relo():
    seq = synthetic.make_sequence(duration=8.0, n_points=120, n_lines=24, seed=3)
    frames = list(range(20, 75, 5))  # window well after t=0
    state, f = packing.factors_from_synthetic(seq, frames, CFG, LAY)
    # "old keyframe" = the camera at t=0 (revisit geometry): project the
    # window's world points into it
    p_old = seq.gt_p[0]
    q_old = seq.gt_q[0]
    q_wc = quat_mul(q_old, seq.q_bc)
    p_wc = p_old + quat_rotate(q_old, seq.p_bc)
    p_w = res._world_points(state, f)
    x_c = quat_rotate(jnp.broadcast_to(quat_conj(q_wc), (p_w.shape[0], 4)), p_w - p_wc)
    obs = x_c[:, 0:2] / x_c[:, 2:3]
    vis = (x_c[:, 2] > 0.3) & (jnp.abs(obs[:, 0]) < 0.8) & (jnp.abs(obs[:, 1]) < 0.6)
    relo_mask = (vis & (f.pt_valid > 0)).astype(f.pt_valid.dtype)
    assert float(relo_mask.sum()) >= 10
    f = f._replace(relo_obs=obs, relo_mask=relo_mask, relo_valid=jnp.ones((), f.pt_valid.dtype))
    state = state._replace(relo_p=jnp.asarray(p_old), relo_q=jnp.asarray(q_old))
    return state, f, np.asarray(p_old), np.asarray(q_old)


def test_relo_residual_zero_at_truth(window_with_relo):
    state, f, p_old, q_old = window_with_relo
    r = res.relo_residuals(state, f, CFG.focal_length)
    assert float(jnp.max(jnp.abs(r))) < 1e-6


def test_solve_refines_relo_pose(window_with_relo):
    state, f, p_old, q_old = window_with_relo
    # perturb the relo pose guess (pose-graph drift scale)
    rng = np.random.default_rng(2)
    state_pert = state._replace(
        relo_p=state.relo_p + jnp.asarray(rng.standard_normal(3) * 0.1),
        relo_q=quat_box_plus(state.relo_q, jnp.asarray(rng.standard_normal(3) * 0.03)),
    )
    st_out, stats = solver.optimize_window(state_pert, f, LAY, CFG, num_iters=10)
    p_err = float(jnp.linalg.norm(st_out.relo_p - jnp.asarray(p_old)))
    q_err = float(jnp.linalg.norm(quat_box_minus(st_out.relo_q, jnp.asarray(q_old))))
    assert p_err < 5e-3, p_err
    assert q_err < 5e-3, q_err
    # the window itself must not be dragged away by the relo factors
    w_err = float(jnp.max(jnp.linalg.norm(st_out.p - state.p, axis=-1)))
    assert w_err < 5e-3, w_err


def test_relo_inactive_is_noop(window_with_relo):
    state, f, *_ = window_with_relo
    f_off = f._replace(relo_valid=jnp.zeros((), f.pt_valid.dtype))
    r = res.relo_residuals(state._replace(relo_p=state.relo_p + 5.0), f_off, CFG.focal_length)
    assert float(jnp.abs(r).max()) == 0.0
