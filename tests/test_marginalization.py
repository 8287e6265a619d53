import jax.numpy as jnp
import numpy as np
import pytest

from plslam.config import SolverConfig
from plslam.io import synthetic
from plslam.models import marginalization as marg
from plslam.models import packing, residuals as res
from plslam.models.state import layout

CFG = SolverConfig(max_features=48, max_line_feats=12)
LAY = layout(CFG)


@pytest.fixture(scope="module")
def window():
    seq = synthetic.make_sequence(duration=6.0, n_points=120, n_lines=40, seed=3)
    frames = list(range(0, 55, 5))
    return packing.factors_from_synthetic(seq, frames, CFG, LAY)


def test_marginalize_old_structure(window):
    state, f = window
    prior = marg.marginalize_old(state, f, LAY, CFG)
    J = np.asarray(prior.J)
    r0 = np.asarray(prior.r0)
    assert np.all(np.isfinite(J)) and np.all(np.isfinite(r0))
    assert float(prior.valid) == 1.0
    # after the shift the new last frame (slot NW-1) must be untouched by the prior
    nw = LAY.nw
    last_pose_cols = slice((nw - 1) * 6, nw * 6)
    assert np.abs(J[:, last_pose_cols]).max() < 1e-10
    sb_last = slice(LAY.off_sb + (nw - 1) * 9, LAY.off_sb + nw * 9)
    assert np.abs(J[:, sb_last]).max() < 1e-10
    # the prior carries real information about the kept frames
    assert np.abs(J[:, : (nw - 1) * 6]).max() > 1e-3
    # snapshot is the shifted state
    np.testing.assert_allclose(np.asarray(prior.p), np.asarray(state.p)[[*range(1, nw), 0]], atol=0)


def test_prior_residual_at_snapshot(window):
    state, f = window
    prior = marg.marginalize_old(state, f, LAY, CFG)
    f2 = marg.install_prior(f, prior)
    # evaluate prior residual at exactly the snapshot: box-minus = 0 → r = r0
    shifted = state._replace(
        p=jnp.asarray(prior.p), q=jnp.asarray(prior.q), v=jnp.asarray(prior.v),
        ba=jnp.asarray(prior.ba), bg=jnp.asarray(prior.bg),
    )
    r = res.prior_residual(shifted, f2, LAY)
    np.testing.assert_allclose(np.asarray(r), np.asarray(prior.r0), atol=1e-12)


def test_marginalize_second_new_drops_pose(window):
    state, f = window
    prior = marg.marginalize_old(state, f, LAY, CFG)
    f2 = marg.install_prior(f, prior)
    prior2 = marg.marginalize_second_new(state, f2, LAY, CFG)
    J2 = np.asarray(prior2.J)
    nw = LAY.nw
    dropped = slice((nw - 2) * 6, (nw - 1) * 6)
    assert np.abs(J2[:, dropped]).max() < 1e-8
    assert np.all(np.isfinite(J2))


def test_prior_keeps_information(window):
    """The marginalized prior must pull the kept states toward the values the
    dropped factors implied: H_prior = J0ᵀJ0 should have significant energy in
    the first kept pose block (it inherited IMU(0→1) + shared features)."""
    state, f = window
    prior = marg.marginalize_old(state, f, LAY, CFG)
    H = np.asarray(prior.J).T @ np.asarray(prior.J)
    blk = H[:6, :6]  # new frame 0 = old frame 1
    w = np.linalg.eigvalsh(blk)
    assert w.max() > 1.0  # information present
    assert w.min() > -1e-6  # PSD


def test_marginalize_old_with_solver_groups_is_exact(window):
    """The groups-reuse fast path (`marginalize_old(..., groups=stats.groups)`)
    must be bit-equal to the self-computed-weights path: the solver's carried
    final residuals ARE the residuals at the post-solve state (vision terms
    are gauge-invariant under the post-solve reanchor)."""
    from plslam.models import solver

    state, f = window
    st_out, stats = solver.optimize_window(state, f, LAY, CFG, num_iters=2)
    p_ref = marg.marginalize_old(st_out, f, LAY, CFG)
    p_fast = marg.marginalize_old(st_out, f, LAY, CFG, groups=stats.groups)
    np.testing.assert_allclose(np.asarray(p_fast.J), np.asarray(p_ref.J), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_fast.r0), np.asarray(p_ref.r0), atol=1e-6)
