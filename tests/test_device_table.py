"""Device feature tables (models/device_table.py) must reproduce the host
FeatureManager tables (models/feature_table.py) operation-for-operation —
the burst scan's correctness rests on this equivalence."""
import numpy as np
import jax.numpy as jnp
import pytest

from plslam.config import SolverConfig
from plslam.models import device_table as dtab
from plslam.models.feature_table import LineTable, PointTable

CFG = SolverConfig(max_features=24, max_line_feats=12)
NW = CFG.window_size + 1


def _rand_frame(rng, pool, n):
    ids = rng.choice(pool, size=min(n, len(pool)), replace=False)
    obs = rng.standard_normal((len(ids), 2)) * 0.3
    vel = rng.standard_normal((len(ids), 2)) * 0.05
    return ids, obs, vel


def _pad_inputs(ids, obs, vel, cap):
    fid = np.full(cap, -1, np.int32)
    fobs = np.zeros((cap, 2))
    fvel = np.zeros((cap, 2))
    val = np.zeros(cap, bool)
    fid[: len(ids)] = ids
    fobs[: len(ids)] = obs
    fvel[: len(ids)] = vel
    val[: len(ids)] = True
    return (jnp.asarray(fid), jnp.asarray(fobs), jnp.asarray(fvel),
            jnp.asarray(val))


def _assert_tables_equal(host: PointTable, dev: dtab.DevPointTable):
    """Equality up to slot permutation (allocation order may differ)."""
    h_act = np.nonzero(host.ids >= 0)[0]
    d_ids = np.asarray(dev.ids)
    d_act = np.nonzero(d_ids >= 0)[0]
    assert sorted(host.ids[h_act]) == sorted(d_ids[d_act])
    d_slot = {int(i): s for s, i in enumerate(d_ids) if i >= 0}
    for s in h_act:
        ds = d_slot[int(host.ids[s])]
        np.testing.assert_allclose(np.asarray(dev.obs)[ds], host.obs[s], atol=1e-6)
        np.testing.assert_allclose(np.asarray(dev.vel)[ds], host.vel[s], atol=1e-6)
        np.testing.assert_array_equal(np.asarray(dev.mask)[ds] > 0.5, host.mask[s])
        assert int(np.asarray(dev.start)[ds]) == int(host.start[s])
        np.testing.assert_allclose(float(np.asarray(dev.inv_depth)[ds]),
                                   host.inv_depth[s], atol=1e-6)


def test_point_add_and_slides_match_host():
    rng = np.random.default_rng(3)
    host = PointTable(CFG)
    dev = dtab.empty_point_table(CFG.max_features, NW, jnp.float64)
    pool = np.arange(60)
    # fill the window
    for fc in range(NW):
        ids, obs, vel = _rand_frame(rng, pool[fc: fc + 30], 18)
        host.add_frame(fc, ids, obs, vel)
        dev = dtab.pt_add_frame(dev, fc, *_pad_inputs(ids, obs, vel, CFG.max_features))
    _assert_tables_equal(host, dev)

    # parallax decision must agree
    minp = CFG.keyframe_parallax / CFG.focal_length
    want = host.parallax_keyframe_decision(NW - 1)
    got = bool(dtab.pt_parallax_keyframe(dev, NW - 1, minp))
    assert want == got

    # give some features depths, slide_old with a real anchor change
    sel = np.nonzero(host.ids >= 0)[0][:8]
    host.inv_depth[sel] = 0.5
    d_slot = {int(i): s for s, i in enumerate(np.asarray(dev.ids)) if i >= 0}
    dinv = np.asarray(dev.inv_depth).copy()
    for s in sel:
        dinv[d_slot[int(host.ids[s])]] = 0.5
    dev = dev._replace(inv_depth=jnp.asarray(dinv))
    p0, q0 = np.array([0.1, 0.2, 0.0]), np.array([0.99875, 0.0, 0.0499792, 0.0])
    p1, q1 = np.array([0.3, 0.1, 0.05]), np.array([1.0, 0.0, 0.0, 0.0])
    host.slide_old(p0, q0, p1, q1)
    dev = dtab.pt_slide_old(dev, jnp.asarray(p0), jnp.asarray(q0),
                            jnp.asarray(p1), jnp.asarray(q1))
    _assert_tables_equal(host, dev)

    # slide_new
    ids, obs, vel = _rand_frame(rng, pool[20:50], 16)
    host.add_frame(NW - 1, ids, obs, vel)
    dev = dtab.pt_add_frame(dev, NW - 1, *_pad_inputs(ids, obs, vel, CFG.max_features))
    host.slide_new()
    dev = dtab.pt_slide_new(dev)
    _assert_tables_equal(host, dev)


def test_point_table_overflow_drops_new():
    rng = np.random.default_rng(5)
    host = PointTable(CFG)
    dev = dtab.empty_point_table(CFG.max_features, NW, jnp.float64)
    ids = np.arange(40)  # exceeds capacity 24
    obs = rng.standard_normal((40, 2))
    vel = np.zeros((40, 2))
    host.add_frame(0, ids, obs, vel)
    fid = jnp.asarray(ids, jnp.int32)
    dev = dtab.pt_add_frame(dev, 0, fid, jnp.asarray(obs), jnp.asarray(vel),
                            jnp.ones(40, bool))
    assert int(np.sum(np.asarray(dev.ids) >= 0)) == CFG.max_features
    _assert_tables_equal(host, dev)


def test_line_add_and_slides_match_host():
    rng = np.random.default_rng(7)
    host = LineTable(CFG)
    dev = dtab.empty_line_table(CFG.max_line_feats, NW, jnp.float64)
    pool = np.arange(30)
    for fc in range(NW):
        ids = rng.choice(pool[fc: fc + 14], size=8, replace=False)
        segs = rng.standard_normal((8, 4)) * 0.3
        host.add_frame(fc, ids, segs)
        cap = CFG.max_line_feats
        fid = np.full(cap, -1, np.int32)
        fsg = np.zeros((cap, 4))
        val = np.zeros(cap, bool)
        fid[:8] = ids
        fsg[:8] = segs
        val[:8] = True
        dev = dtab.ln_add_frame(dev, fc, jnp.asarray(fid), jnp.asarray(fsg),
                                jnp.asarray(val))
    d_ids = np.asarray(dev.ids)
    assert sorted(host.ids[host.ids >= 0]) == sorted(d_ids[d_ids >= 0])
    host.slide_old()
    dev = dtab.ln_slide_old(dev)
    d_ids = np.asarray(dev.ids)
    assert sorted(host.ids[host.ids >= 0]) == sorted(d_ids[d_ids >= 0])
    d_slot = {int(i): s for s, i in enumerate(d_ids) if i >= 0}
    for s in np.nonzero(host.ids >= 0)[0]:
        ds = d_slot[int(host.ids[s])]
        np.testing.assert_allclose(np.asarray(dev.obs)[ds], host.obs[s], atol=1e-6)
        np.testing.assert_array_equal(np.asarray(dev.mask)[ds] > 0.5, host.mask[s])
        assert int(np.asarray(dev.start)[ds]) == int(host.start[s])
    host.slide_new()
    dev = dtab.ln_slide_new(dev)
    d_ids = np.asarray(dev.ids)
    assert sorted(host.ids[host.ids >= 0]) == sorted(d_ids[d_ids >= 0])
