"""DP sequence batching: batched window solves == per-item solves; device
-sharded batch == unsharded (SURVEY.md §2.6 DP row)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plslam.config import SolverConfig
from plslam.io import synthetic
from plslam.models import solver as solver_mod
from plslam.models.packing import factors_from_synthetic
from plslam.models.state import layout, retract
from plslam.parallel import dp
from plslam.parallel.distributed_ba import make_mesh


@pytest.fixture(scope="module")
def batch():
    cfg = SolverConfig(max_features=32, max_line_feats=8, dtype="float64")
    lay = layout(cfg)
    pairs = []
    rng = np.random.default_rng(5)
    for seed in (1, 2, 3, 4):
        seq = synthetic.make_sequence(duration=7.0, n_points=60, n_lines=24, seed=seed)
        st, f = factors_from_synthetic(seq, list(range(0, 22, 2)), cfg, lay)
        d = np.zeros(lay.dim)
        d[6 : lay.nw * 6] = rng.standard_normal((lay.nw - 1) * 6) * 0.005
        pairs.append((retract(st, jnp.asarray(d), lay), f))
    states, factors = dp.stack_windows(pairs)
    return cfg, lay, pairs, states, factors


def test_batched_equals_individual(batch):
    cfg, lay, pairs, states, factors = batch
    st_b, cost_b = dp.batched_optimize_windows(states, factors, lay, cfg, num_iters=4)
    for k, (st, f) in enumerate(pairs):
        st_k, stats_k = solver_mod.optimize_window(st, f, lay, cfg, num_iters=4)
        np.testing.assert_allclose(
            np.asarray(st_b.p[k]), np.asarray(st_k.p), atol=1e-8)
        np.testing.assert_allclose(float(cost_b[k]), float(stats_k.cost), rtol=1e-8)


def test_sharded_equals_unsharded(batch):
    cfg, lay, pairs, states, factors = batch
    st_ref, cost_ref = dp.batched_optimize_windows(states, factors, lay, cfg, num_iters=4)
    mesh = make_mesh(4)
    st_sh, cost_sh = dp.batched_optimize_windows(states, factors, lay, cfg,
                                                 num_iters=4, mesh=mesh)
    np.testing.assert_allclose(np.asarray(st_sh.p), np.asarray(st_ref.p), atol=1e-10)
    np.testing.assert_allclose(np.asarray(cost_sh), np.asarray(cost_ref), rtol=1e-10)
