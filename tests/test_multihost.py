"""Multi-host entry helpers on the forced 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plslam.config import SolverConfig
from plslam.io import synthetic
from plslam.models import packing
from plslam.models.state import layout, retract
from plslam.parallel import mesh2d
from plslam.parallel.multihost import global_mesh_2d, init_distributed


def test_init_distributed_single_process_fallback():
    # in-sandbox there is no cluster: must degrade to single-process cleanly
    assert init_distributed() is False
    assert jax.process_count() == 1


def test_global_mesh_2d_shapes():
    mesh = global_mesh_2d(n_part=2, n_lmk=4)
    assert mesh.axis_names == ("kf_part", "lmk")
    assert mesh.devices.shape == (2, 4)
    with pytest.raises(ValueError):
        global_mesh_2d(n_part=3, n_lmk=4)


def test_global_mesh_drives_mesh2d_solve():
    """The mesh from the multihost helper must drive the 2-D SPMD solve."""
    cfg = SolverConfig(max_features=48, max_line_feats=8)
    lay = layout(cfg)
    seq = synthetic.make_sequence(duration=6.0, n_points=160, n_lines=16, seed=3)
    rng = np.random.default_rng(1)
    states, factors = [], []
    for frames in ([0, 3, 6, 9, 12, 15, 18, 21, 24, 27, 30],
                   [30, 33, 36, 39, 42, 45, 48, 51, 54, 57, 60]):
        st_gt, f = packing.factors_from_synthetic(seq, frames, cfg, lay, with_lines=False)
        delta = np.zeros(lay.dim)
        delta[6 : lay.nw * 6] = rng.standard_normal((lay.nw - 1) * 6) * 0.01
        states.append(retract(st_gt, jnp.asarray(delta), lay))
        factors.append(f)
    cast = lambda x: x.astype(jnp.float32) if x.dtype == jnp.float64 else x
    stack = lambda items: jax.tree.map(lambda *xs: jnp.stack([cast(x) for x in xs]), *items)
    st_p, f_p = stack(states), stack(factors)

    mesh = global_mesh_2d(n_part=2, n_lmk=4)
    st_out, costs = mesh2d.partitioned_distributed_solve(st_p, f_p, lay, cfg, mesh,
                                                         num_iters=3)
    assert np.isfinite(np.asarray(costs)).all()
    assert np.isfinite(np.asarray(st_out.p)).all()
