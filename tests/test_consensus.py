"""Partitioned large-window BA with boundary consensus must recover a long
trajectory that no single window covers (the beyond-reference scaling mode,
SURVEY.md §5.7)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plslam.config import SolverConfig
from plslam.io import synthetic
from plslam.models import packing
from plslam.models.state import layout, retract
from plslam.parallel import consensus

CFG = SolverConfig(max_features=48, max_line_feats=8)
LAY = layout(CFG)


def test_partition_frames():
    parts = consensus.partition_frames(31, 10)
    assert parts[0] == list(range(0, 11))
    assert parts[1][0] == parts[0][-1]  # shared boundary
    assert parts[-1][-1] == 30
    assert all(len(p) == 11 for p in parts)


@pytest.mark.parametrize("n_frames", [31])
def test_consensus_recovers_long_trajectory(n_frames):
    seq = synthetic.make_sequence(duration=10.0, n_points=200, n_lines=24, seed=7)
    kf = list(range(0, n_frames * 3, 3))  # 31 keyframes, 0.15 s apart
    parts = consensus.partition_frames(n_frames, CFG.window_size)

    states, factors = [], []
    rng = np.random.default_rng(4)
    gt_states = []
    for pr in parts:
        frames = [kf[i] for i in pr]
        st_gt, f = packing.factors_from_synthetic(seq, frames, CFG, LAY, with_lines=False)
        gt_states.append(st_gt)
        # perturb every pose except the very first partition's anchor
        delta = np.zeros(LAY.dim)
        delta[6 : LAY.nw * 6] = rng.standard_normal((LAY.nw - 1) * 6) * 0.01
        states.append(retract(st_gt, jnp.asarray(delta), LAY))
        factors.append(f)

    stack = lambda items: jax.tree.map(lambda *xs: jnp.stack(xs), *items)
    st_out = consensus.consensus_solve(stack(states), stack(factors), LAY, CFG, rounds=3)

    p_glob, q_glob = consensus.stitch_trajectory(st_out, parts, n_frames)
    gt_p = np.stack([np.asarray(seq.gt_p[kf[i]]) for i in range(n_frames)])
    # align to the first partition's gauge (anchor frame 0)
    err = np.linalg.norm(p_glob - (gt_p - gt_p[0] + p_glob[0]), axis=1)
    assert err.max() < 5e-3, err.max()
