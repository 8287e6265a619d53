"""Distributed BA on the forced-8-device CPU mesh must match the
single-device solver (SURVEY.md §4 multi-host test strategy)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plslam.config import SolverConfig
from plslam.io import synthetic
from plslam.models import packing, solver
from plslam.models.state import layout, retract
from plslam.parallel import distributed_ba as dba

CFG = SolverConfig(max_features=48, max_line_feats=16)
LAY = layout(CFG)


@pytest.fixture(scope="module")
def window():
    seq = synthetic.make_sequence(duration=6.0, n_points=120, n_lines=40, seed=3)
    frames = list(range(0, 55, 5))
    state, f = packing.factors_from_synthetic(seq, frames, CFG, LAY)
    rng = np.random.default_rng(9)
    nw = LAY.nw
    delta = np.zeros(LAY.dim)
    delta[6 : nw * 6] = rng.standard_normal((nw - 1) * 6) * 0.005
    sb = rng.standard_normal((nw, 9))
    sb[:, 0:3] *= 0.01
    sb[:, 3:6] *= 5e-5
    sb[:, 6:9] *= 5e-6
    delta[LAY.off_sb : LAY.off_ext] = sb.reshape(-1)
    pert = retract(state, jnp.asarray(delta), LAY)
    return state, pert, f


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("n_dev", [1, 4, 8])
def test_distributed_matches_single(window, n_dev):
    state_gt, pert, f = window
    mesh = dba.make_mesh(n_dev)
    st_d, cost_d = dba.distributed_optimize_window(pert, f, LAY, CFG, mesh, num_iters=8)
    st_s, stats = solver.optimize_window(pert, f, LAY, CFG, num_iters=8)
    # both must converge to ground truth
    for st, tag in ((st_d, f"dist{n_dev}"), (st_s, "single")):
        p_err = float(jnp.max(jnp.linalg.norm(st.p - state_gt.p, axis=-1)))
        assert p_err < 2e-3, (tag, p_err)
    # and agree with each other tightly (identical math, different reduction order)
    np.testing.assert_allclose(np.asarray(st_d.p), np.asarray(st_s.p), atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_d.v), np.asarray(st_s.v), atol=1e-4)
