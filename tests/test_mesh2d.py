"""Combined 2-D mesh ('kf_part' × 'lmk'): partitioned landmark-sharded BA
must match the single-device batched solve and close a long trajectory with
boundary consensus (SURVEY.md §5.7/§5.8 — the full scaling plan on one mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plslam.config import SolverConfig
from plslam.io import synthetic
from plslam.models import packing, solver as solver_mod
from plslam.models.state import layout, retract
from plslam.parallel import consensus, mesh2d

CFG = SolverConfig(max_features=48, max_line_feats=8)
LAY = layout(CFG)


@pytest.fixture(scope="module")
def partitioned():
    n_frames = 31
    seq = synthetic.make_sequence(duration=10.0, n_points=200, n_lines=24, seed=7)
    kf = list(range(0, n_frames * 3, 3))
    parts = consensus.partition_frames(n_frames, CFG.window_size)
    states, factors = [], []
    rng = np.random.default_rng(4)
    for pr in parts:
        frames = [kf[i] for i in pr]
        st_gt, f = packing.factors_from_synthetic(seq, frames, CFG, LAY, with_lines=False)
        delta = np.zeros(LAY.dim)
        delta[6 : LAY.nw * 6] = rng.standard_normal((LAY.nw - 1) * 6) * 0.01
        states.append(retract(st_gt, jnp.asarray(delta), LAY))
        factors.append(f)
    cast = lambda x: x.astype(jnp.float32) if x.dtype == jnp.float64 else x
    stack = lambda items: jax.tree.map(lambda *xs: jnp.stack([cast(x) for x in xs]), *items)
    return seq, kf, parts, stack(states), stack(factors), n_frames


def test_2d_solve_matches_batched_single_device(partitioned):
    """One round on the (2 partitions × 4 landmark shards) mesh == the vmapped
    single-device LM solve (same damping schedule, reduction-order tolerance)."""
    seq, kf, parts, st_p, f_p, n_frames = partitioned
    two = jax.tree.map(lambda a: a[:2], (st_p, f_p))
    mesh = mesh2d.make_mesh2d(2, 4)
    st_2d, costs = mesh2d.partitioned_distributed_solve(two[0], two[1], LAY, CFG, mesh,
                                                        num_iters=3)
    st_ref = jax.vmap(
        lambda s, f: solver_mod.optimize_window(s, f, LAY, CFG, num_iters=3)[0]
    )(two[0], two[1])
    assert np.isfinite(np.asarray(costs)).all()
    np.testing.assert_allclose(np.asarray(st_2d.p), np.asarray(st_ref.p), atol=2e-3)
    np.testing.assert_allclose(np.asarray(st_2d.inv_depth), np.asarray(st_ref.inv_depth),
                               atol=2e-3)


def test_consensus_on_2d_mesh_recovers_trajectory(partitioned):
    """Both scaling axes end-to-end on one mesh: P=3 partitions × 2 landmark
    shards (6 of the 8 forced CPU devices), consensus between rounds."""
    seq, kf, parts, st_p, f_p, n_frames = partitioned
    mesh = mesh2d.make_mesh2d(len(parts), 2)
    st_out = mesh2d.consensus_distributed_solve(st_p, f_p, LAY, CFG, mesh,
                                                rounds=3, num_iters=6)
    p_glob, q_glob = consensus.stitch_trajectory(st_out, parts, n_frames)
    gt_p = np.stack([np.asarray(seq.gt_p[kf[i]]) for i in range(n_frames)])
    err = np.linalg.norm(p_glob - (gt_p - gt_p[0] + p_glob[0]), axis=1)
    assert err.max() < 2e-2, err.max()  # f32 over the full 2-axis path
