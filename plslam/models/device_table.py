"""Device-resident fixed-capacity feature tables (jitted FeatureManager).

The host tables in `feature_table.py` mirror the reference's
`FeatureManager` list surgery with numpy slot arrays; that is fine at
streaming rate but forces a host round trip per frame. This module is the
same state machine as PURE jittable functions over a pytree of device
arrays — `addFeatureCheckParallax` insertion + decision halves,
`removeBackShiftDepth`/`removeFront` slides, `removeFailures`/
`removeOutlier` drops — so the offline burst mode (`models/burst.py`) can
chain whole frames inside one `lax.scan` without the table ever leaving the
device (SURVEY.md §7 hard parts #2 and #4; reference
`vins_estimator/src/feature_manager.cpp`).

Semantics match `feature_table.PointTable`/`LineTable` exactly (slot
ALLOCATION order may differ — free slots fill in index order here too, but
relative to a different starting layout; the solver is slot-permutation
invariant). Every function is shape-static: capacities come from the arrays.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from plslam.utils.geometry import quat_to_rot


class DevPointTable(NamedTuple):
    ids: jnp.ndarray  # [MF] int32, -1 = free slot
    start: jnp.ndarray  # [MF] int32 first observing window frame
    obs: jnp.ndarray  # [MF,NW,2] normalized coords
    vel: jnp.ndarray  # [MF,NW,2]
    mask: jnp.ndarray  # [MF,NW] float 0/1
    inv_depth: jnp.ndarray  # [MF] (<0 = not solved)


class DevLineTable(NamedTuple):
    ids: jnp.ndarray  # [ML] int32
    start: jnp.ndarray  # [ML] int32
    obs: jnp.ndarray  # [ML,NW,4]
    mask: jnp.ndarray  # [ML,NW]
    line_w: jnp.ndarray  # [ML,6] world Plücker
    solved: jnp.ndarray  # [ML] float 0/1


def empty_point_table(mf: int, nw: int, dtype) -> DevPointTable:
    return DevPointTable(
        ids=jnp.full((mf,), -1, jnp.int32),
        start=jnp.zeros((mf,), jnp.int32),
        obs=jnp.zeros((mf, nw, 2), dtype),
        vel=jnp.zeros((mf, nw, 2), dtype),
        mask=jnp.zeros((mf, nw), dtype),
        inv_depth=jnp.full((mf,), -1.0, dtype),
    )


def empty_line_table(ml: int, nw: int, dtype) -> DevLineTable:
    L = jnp.zeros((ml, 6), dtype).at[:, 1].set(5.0).at[:, 5].set(1.0)
    return DevLineTable(
        ids=jnp.full((ml,), -1, jnp.int32),
        start=jnp.zeros((ml,), jnp.int32),
        obs=jnp.zeros((ml, nw, 4), dtype),
        mask=jnp.zeros((ml, nw), dtype),
        line_w=L,
        solved=jnp.zeros((ml,), dtype),
    )


def _slot_assign(tbl_ids, fe_ids, fe_valid):
    """id → slot resolution, fixed shape. Existing ids map to their slot; new
    ids take free slots in index order (host `add_frame` allocation rule);
    overflow drops (host: 'table full: drop new feature').

    Returns slot [N_in] int32 with CAP (=len(tbl_ids)) marking 'dropped' —
    usable directly in `.at[slot].set(..., mode="drop")` scatters — plus the
    is-new mask [N_in]."""
    cap = tbl_ids.shape[0]
    eq = (fe_ids[:, None] == tbl_ids[None, :]) & (fe_ids[:, None] >= 0) & (tbl_ids[None, :] >= 0)
    has = jnp.any(eq, axis=1)
    slot_exist = jnp.argmax(eq, axis=1).astype(jnp.int32)
    free = tbl_ids < 0
    n_free = jnp.sum(free)
    free_rank = jnp.cumsum(free) - 1  # [CAP] rank of each free slot
    # rank → slot lookup: scatter slot indices by their free rank
    rank_to_slot = jnp.full((cap,), cap, jnp.int32).at[
        jnp.where(free, free_rank, cap)
    ].set(jnp.arange(cap, dtype=jnp.int32), mode="drop")
    new = fe_valid & ~has & (fe_ids >= 0)
    new_rank = jnp.cumsum(new) - 1
    ok_new = new & (new_rank < n_free)
    slot_new = rank_to_slot[jnp.clip(new_rank, 0, cap - 1)]
    slot = jnp.where(fe_valid & has, slot_exist,
                     jnp.where(ok_new, slot_new, cap)).astype(jnp.int32)
    return slot, ok_new


def pt_add_frame(tbl: DevPointTable, frame_idx: int, fe_ids, fe_obs, fe_vel,
                 fe_valid) -> DevPointTable:
    """`PointTable.add_frame` on device: write frame `frame_idx`'s
    observations; newly-seen ids claim free slots (row reset: start=frame,
    inv_depth=-1, cleared obs window)."""
    cap = tbl.ids.shape[0]
    slot, ok_new = _slot_assign(tbl.ids, fe_ids, fe_valid)
    # reset rows claimed by NEW features (ids only change there)
    is_new_slot = jnp.zeros((cap,), bool).at[slot].set(ok_new, mode="drop")
    ids = jnp.where(is_new_slot,
                    jnp.zeros((cap,), jnp.int32).at[slot].set(
                        fe_ids.astype(jnp.int32), mode="drop"),
                    tbl.ids)
    start = jnp.where(is_new_slot, frame_idx, tbl.start)
    inv_depth = jnp.where(is_new_slot, -1.0, tbl.inv_depth)
    obs = jnp.where(is_new_slot[:, None, None], 0.0, tbl.obs)
    vel = jnp.where(is_new_slot[:, None, None], 0.0, tbl.vel)
    mask = jnp.where(is_new_slot[:, None], 0.0, tbl.mask)
    # write this frame's column
    obs = obs.at[slot, frame_idx].set(fe_obs, mode="drop")
    vel = vel.at[slot, frame_idx].set(fe_vel, mode="drop")
    mask = mask.at[slot, frame_idx].set(fe_valid.astype(mask.dtype), mode="drop")
    return DevPointTable(ids=ids, start=start, obs=obs, vel=vel, mask=mask,
                         inv_depth=inv_depth)


def ln_add_frame(tbl: DevLineTable, frame_idx: int, fe_ids, fe_segs,
                 fe_valid) -> DevLineTable:
    cap = tbl.ids.shape[0]
    slot, ok_new = _slot_assign(tbl.ids, fe_ids, fe_valid)
    is_new_slot = jnp.zeros((cap,), bool).at[slot].set(ok_new, mode="drop")
    ids = jnp.where(is_new_slot,
                    jnp.zeros((cap,), jnp.int32).at[slot].set(
                        fe_ids.astype(jnp.int32), mode="drop"),
                    tbl.ids)
    start = jnp.where(is_new_slot, frame_idx, tbl.start)
    solved = jnp.where(is_new_slot, 0.0, tbl.solved)
    obs = jnp.where(is_new_slot[:, None, None], 0.0, tbl.obs)
    mask = jnp.where(is_new_slot[:, None], 0.0, tbl.mask)
    obs = obs.at[slot, frame_idx].set(fe_segs, mode="drop")
    mask = mask.at[slot, frame_idx].set(fe_valid.astype(mask.dtype), mode="drop")
    return tbl._replace(ids=ids, start=start, obs=obs, mask=mask, solved=solved)


def pt_parallax_keyframe(tbl: DevPointTable, frame_idx: int, min_parallax):
    """`parallax_keyframe_decision` on device (frame_idx static). True →
    MARGIN_OLD."""
    both = ((tbl.ids >= 0) & (tbl.mask[:, frame_idx - 2] > 0)
            & (tbl.mask[:, frame_idx - 1] > 0) & (tbl.start <= frame_idx - 2))
    d = tbl.obs[:, frame_idx - 1] - tbl.obs[:, frame_idx - 2]
    dn = jnp.linalg.norm(d, axis=-1)
    n = jnp.sum(both)
    par = jnp.sum(jnp.where(both, dn, 0.0)) / jnp.maximum(n, 1)
    return jnp.where(n == 0, True, par >= min_parallax)


def _pt_clear_where(tbl: DevPointTable, dead) -> DevPointTable:
    return DevPointTable(
        ids=jnp.where(dead, -1, tbl.ids),
        start=jnp.where(dead, 0, tbl.start),
        obs=jnp.where(dead[:, None, None], 0.0, tbl.obs),
        vel=jnp.where(dead[:, None, None], 0.0, tbl.vel),
        mask=jnp.where(dead[:, None], 0.0, tbl.mask),
        inv_depth=jnp.where(dead, -1.0, tbl.inv_depth),
    )


def _ln_clear_where(tbl: DevLineTable, dead) -> DevLineTable:
    return tbl._replace(
        ids=jnp.where(dead, -1, tbl.ids),
        start=jnp.where(dead, 0, tbl.start),
        obs=jnp.where(dead[:, None, None], 0.0, tbl.obs),
        mask=jnp.where(dead[:, None], 0.0, tbl.mask),
        solved=jnp.where(dead, 0.0, tbl.solved),
    )


def pt_slide_old(tbl: DevPointTable, p_wc_old0, q_wc_old0, p_wc_new0,
                 q_wc_new0) -> DevPointTable:
    """`removeBackShiftDepth` on device (see PointTable.slide_old for the
    anchor-transfer semantics, incl. the gapped-track reset)."""
    active = tbl.ids >= 0
    starts0 = active & (tbl.start == 0) & (tbl.inv_depth > 0)
    gapped = starts0 & (tbl.mask[:, 1] <= 0)
    sel = starts0 & (tbl.mask[:, 1] > 0)
    uv = tbl.obs[:, 0]
    depth = 1.0 / jnp.where(tbl.inv_depth > 0, tbl.inv_depth, 1.0)
    pc0 = jnp.stack([uv[:, 0] * depth, uv[:, 1] * depth, depth], axis=-1)
    R_old = quat_to_rot(q_wc_old0)
    R_new = quat_to_rot(q_wc_new0)
    pw = pc0 @ R_old.T + p_wc_old0
    pc1 = (pw - p_wc_new0) @ R_new  # rowwise R_newᵀ(pw − p)
    z = pc1[:, 2]
    transferred = jnp.where(z > 0.1, 1.0 / jnp.maximum(z, 1e-9), -1.0)
    inv = jnp.where(sel, transferred, jnp.where(gapped, -1.0, tbl.inv_depth))
    # shift windows left
    obs = jnp.concatenate([tbl.obs[:, 1:], jnp.zeros_like(tbl.obs[:, :1])], axis=1)
    vel = jnp.concatenate([tbl.vel[:, 1:], jnp.zeros_like(tbl.vel[:, :1])], axis=1)
    mask = jnp.concatenate([tbl.mask[:, 1:], jnp.zeros_like(tbl.mask[:, :1])], axis=1)
    has = jnp.any(mask > 0, axis=1)
    start = jnp.where(has, jnp.argmax(mask > 0, axis=1), 0).astype(jnp.int32)
    inv = jnp.where(active & has, inv, -1.0)
    out = DevPointTable(ids=tbl.ids, start=start, obs=obs, vel=vel, mask=mask,
                        inv_depth=inv)
    return _pt_clear_where(out, active & ~has)


def pt_slide_new(tbl: DevPointTable) -> DevPointTable:
    """`removeFront` on device."""
    nw = tbl.obs.shape[1]
    obs = tbl.obs.at[:, nw - 2].set(tbl.obs[:, nw - 1]).at[:, nw - 1].set(0.0)
    vel = tbl.vel.at[:, nw - 2].set(tbl.vel[:, nw - 1]).at[:, nw - 1].set(0.0)
    mask = tbl.mask.at[:, nw - 2].set(tbl.mask[:, nw - 1]).at[:, nw - 1].set(0.0)
    start = jnp.where(tbl.start == nw - 1, nw - 2, tbl.start).astype(jnp.int32)
    has = jnp.any(mask > 0, axis=1)
    out = tbl._replace(obs=obs, vel=vel, mask=mask, start=start)
    return _pt_clear_where(out, (tbl.ids >= 0) & ~has)


def ln_slide_old(tbl: DevLineTable) -> DevLineTable:
    obs = jnp.concatenate([tbl.obs[:, 1:], jnp.zeros_like(tbl.obs[:, :1])], axis=1)
    mask = jnp.concatenate([tbl.mask[:, 1:], jnp.zeros_like(tbl.mask[:, :1])], axis=1)
    has = jnp.any(mask > 0, axis=1)
    start = jnp.where(has, jnp.argmax(mask > 0, axis=1), 0).astype(jnp.int32)
    out = tbl._replace(obs=obs, mask=mask, start=start)
    return _ln_clear_where(out, (tbl.ids >= 0) & ~has)


def ln_slide_new(tbl: DevLineTable) -> DevLineTable:
    nw = tbl.obs.shape[1]
    obs = tbl.obs.at[:, nw - 2].set(tbl.obs[:, nw - 1]).at[:, nw - 1].set(0.0)
    mask = tbl.mask.at[:, nw - 2].set(tbl.mask[:, nw - 1]).at[:, nw - 1].set(0.0)
    start = jnp.where(tbl.start == nw - 1, nw - 2, tbl.start).astype(jnp.int32)
    has = jnp.any(mask > 0, axis=1)
    out = tbl._replace(obs=obs, mask=mask, start=start)
    return _ln_clear_where(out, (tbl.ids >= 0) & ~has)


# ------------------------------------------------ host table interop helpers
def from_host_point_table(host, dtype) -> DevPointTable:
    return DevPointTable(
        ids=jnp.asarray(host.ids, jnp.int32),
        start=jnp.asarray(host.start, jnp.int32),
        obs=jnp.asarray(host.obs, dtype),
        vel=jnp.asarray(host.vel, dtype),
        mask=jnp.asarray(host.mask.astype(float), dtype),
        inv_depth=jnp.asarray(host.inv_depth, dtype),
    )


def from_host_line_table(host, line_w, dtype) -> DevLineTable:
    return DevLineTable(
        ids=jnp.asarray(host.ids, jnp.int32),
        start=jnp.asarray(host.start, jnp.int32),
        obs=jnp.asarray(host.obs, dtype),
        mask=jnp.asarray(host.mask.astype(float), dtype),
        line_w=jnp.asarray(line_w, dtype),
        solved=jnp.asarray(host.solved.astype(float), dtype),
    )


def to_host_point_table(host, pulled: "DevPointTable"):
    """Write a pulled (numpy-valued) DevPointTable back into a host
    PointTable in place (burst → streaming handback)."""
    import numpy as np

    host.ids[:] = np.asarray(pulled.ids).astype(np.int64)
    host.start[:] = np.asarray(pulled.start).astype(np.int32)
    host.obs[:] = np.asarray(pulled.obs)
    host.vel[:] = np.asarray(pulled.vel)
    host.mask[:] = np.asarray(pulled.mask) > 0.5
    host.inv_depth[:] = np.asarray(pulled.inv_depth)
    host.track_cnt[:] = host.mask.sum(axis=1)  # approx: window obs count


def to_host_line_table(host, pulled: "DevLineTable"):
    import numpy as np

    host.ids[:] = np.asarray(pulled.ids).astype(np.int64)
    host.start[:] = np.asarray(pulled.start).astype(np.int32)
    host.obs[:] = np.asarray(pulled.obs)
    host.mask[:] = np.asarray(pulled.mask) > 0.5
    host.solved[:] = np.asarray(pulled.solved) > 0.5
    host.track_cnt[:] = host.mask.sum(axis=1)
    return np.asarray(pulled.line_w)
