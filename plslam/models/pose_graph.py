"""Loop closure + 4-DoF pose-graph optimization + drift correction.

TPU-native equivalent of the reference's `pose_graph/src/pose_graph.cpp`
(`PoseGraph::addKeyFrame`, `detectLoop`, `optimize4DoF` with
`FourDOFError`/`FourDOFWeightError` + `AngleLocalParameterization`,
drift composition, `savePoseGraph`/`loadPoseGraph`) and
`KeyFrame::findConnection` — SURVEY.md §2.4 / §3.4 / §A.7.

The Ceres problem over per-keyframe (x, y, z, yaw) — pitch/roll frozen from
VIO (observable) — becomes a batched GN over a fixed-capacity [K,4] state:
per-edge residuals/jacobians evaluate in one vmap, scatter-add into a dense
(4K)² Hessian (K ≤ capacity, masked), damped-Cholesky solve, few iterations.
Sequential edges connect each keyframe to up to 5 predecessors (weight 1);
loop edges are Huber-weighted (IRLS). Yaw wrap-around is handled in the
residual (the reference's AngleLocalParameterization).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from plslam.config import LoopConfig
from plslam.models import keyframe_db as kdb
from plslam.utils.geometry import quat_mul, quat_rotate, quat_to_rot, rot_to_quat, rot_to_ypr, ypr_to_rot

MAX_EDGES_SEQ = 5


def _rot_ypr(yaw, pitch, roll):
    return ypr_to_rot(jnp.stack([yaw, pitch, roll], axis=-1))


def _wrap(a):
    return (a + jnp.pi) % (2 * jnp.pi) - jnp.pi


@partial(jax.jit, static_argnames=("iters",))
def optimize_4dof(
    xyz0, yaw0, pitch, roll, node_valid,
    e_i, e_j, e_t, e_yaw, e_w, e_valid, e_loop,
    iters: int = 12,
):
    """Batched GN over [K,4]: positions + yaw.

    Edges: r_t = R(ψᵢ,θᵢ,φᵢ)ᵀ(p_j − p_i) − t̂ᵢⱼ ;  r_ψ = wrap(ψⱼ − ψᵢ − Δψ̂).
    First valid node fixed (gauge). Returns (xyz [K,3], yaw [K])."""
    K = xyz0.shape[0]
    dtype = xyz0.dtype
    yaw_scale = 0.1  # the reference weighs yaw/10 vs translation

    first = jnp.argmax(node_valid)  # first valid keyframe is the gauge anchor
    free = node_valid.at[first].set(0.0)

    def edge_residual(xyz, yaw, k):
        i = e_i[k]
        j = e_j[k]
        Ri = _rot_ypr(yaw[i], pitch[i], roll[i])
        r_t = Ri.T @ (xyz[j] - xyz[i]) - e_t[k]
        r_y = _wrap(yaw[j] - yaw[i] - e_yaw[k]) * (1.0 / yaw_scale)
        return jnp.concatenate([r_t, r_y[None]]) * e_w[k] * e_valid[k]

    def all_residuals(xyz, yaw):
        return jax.vmap(lambda k: edge_residual(xyz, yaw, k))(jnp.arange(e_i.shape[0]))

    def gn_step(carry, _):
        xyz, yaw, lam = carry

        # per-edge jacobians wrt (xyz_i, yaw_i, xyz_j, yaw_j) via jacfwd
        def r_of(k, d):
            di = d[0:4]
            dj = d[4:8]
            xyz_k = xyz.at[e_i[k]].add(di[0:3]).at[e_j[k]].add(dj[0:3])
            yaw_k = yaw.at[e_i[k]].add(di[3]).at[e_j[k]].add(dj[3])
            return edge_residual(xyz_k, yaw_k, k)

        zero8 = jnp.zeros((8,), dtype)
        r = all_residuals(xyz, yaw)  # [E,4]
        Jk = jax.vmap(lambda k: jax.jacfwd(lambda d: r_of(k, d))(zero8))(jnp.arange(e_i.shape[0]))  # [E,4,8]

        # Huber IRLS on loop edges
        rn2 = jnp.sum(r * r, axis=-1)
        hub = jnp.where(rn2 > 1.0, 1.0 / jnp.sqrt(jnp.sqrt(rn2)), 1.0)
        w = jnp.where(e_loop > 0, hub, 1.0)
        r = r * w[:, None]
        Jk = Jk * w[:, None, None]

        # scatter-add into dense H [4K,4K], b [4K]
        H = jnp.zeros((4 * K, 4 * K), dtype)
        b = jnp.zeros((4 * K,), dtype)
        Ji = Jk[:, :, 0:4]
        Jj = Jk[:, :, 4:8]
        Hii = jnp.einsum("era,erb->eab", Ji, Ji)
        Hjj = jnp.einsum("era,erb->eab", Jj, Jj)
        Hij = jnp.einsum("era,erb->eab", Ji, Jj)
        bi = jnp.einsum("era,er->ea", Ji, r)
        bj = jnp.einsum("era,er->ea", Jj, r)

        def scatter(H, b, idx, blk_d, blk_b):
            rows = (idx[:, None] * 4 + jnp.arange(4)[None, :]).reshape(-1)
            return H, b, rows

        ri = (e_i[:, None] * 4 + jnp.arange(4)[None, :])  # [E,4]
        rj = (e_j[:, None] * 4 + jnp.arange(4)[None, :])
        H = H.at[ri[:, :, None], ri[:, None, :]].add(Hii)
        H = H.at[rj[:, :, None], rj[:, None, :]].add(Hjj)
        H = H.at[ri[:, :, None], rj[:, None, :]].add(Hij)
        H = H.at[rj[:, :, None], ri[:, None, :]].add(jnp.swapaxes(Hij, 1, 2))
        b = b.at[ri].add(bi)
        b = b.at[rj].add(bj)

        # free mask: invalid nodes + gauge anchor pinned
        fm = jnp.repeat(free, 4)
        dH = jnp.diag(H)
        sc = fm / jnp.sqrt(jnp.maximum(dH, 1e-6))
        Hs = H * sc[:, None] * sc[None, :] + jnp.diag(1.0 - fm + lam)
        bs = b * sc
        delta = -jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(Hs), bs) * sc

        xyz_new = xyz + delta.reshape(K, 4)[:, 0:3]
        yaw_new = yaw + delta.reshape(K, 4)[:, 3]
        cost0 = jnp.sum(r * r)
        r_new = all_residuals(xyz_new, yaw_new) * w[:, None]
        cost1 = jnp.sum(r_new * r_new)
        accept = cost1 < cost0
        xyz = jnp.where(accept, xyz_new, xyz)
        yaw = jnp.where(accept, yaw_new, yaw)
        lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-8), jnp.minimum(lam * 8.0, 1e2))
        return (xyz, yaw, lam), cost1

    (xyz, yaw, _), costs = jax.lax.scan(gn_step, (xyz0, yaw0, jnp.asarray(1e-4, dtype)), None, length=iters)
    return xyz, yaw, costs


class PoseGraph:
    """Host orchestration: keyframe insertion, loop detection, PGO trigger,
    drift composition (`PoseGraph` class equivalent)."""

    def __init__(self, cfg: LoopConfig, focal=460.0):
        self.cfg = cfg
        self.db = kdb.KeyframeDB(cfg.max_keyframes)
        K = cfg.max_keyframes
        self.vio_p = np.zeros((K, 3))
        self.vio_q = np.zeros((K, 4))
        self.opt_p = np.zeros((K, 3))
        self.opt_yaw = np.zeros(K)
        self.pitch = np.zeros(K)
        self.roll = np.zeros(K)
        self.t_kf = np.zeros(K)
        self.n = 0
        self.edges = []  # dicts: i, j, t, yaw, w, loop
        self.r_drift = np.eye(3)
        self.t_drift = np.zeros(3)
        self.yaw_drift = 0.0
        self.loop_count = 0
        self._pending_opt = False
        self.last_match = None  # match_points payload for the estimator

    # ------------------------------------------------------------- keyframes
    def add_keyframe(self, t, p_w, q_w, img=None, win_uv=None, win_pts3d=None, cam=None,
                     win_ids=None):
        """`addKeyFrame(cur_kf, detect_loop=1)`. p/q: VIO body pose (world).
        img: grayscale float image for BRIEF (optional → loop detection off).
        win_uv/win_pts3d/win_ids: the estimator's window points at this
        keyframe — pixel coords, world 3D, global feature ids (the
        `computeWindowBRIEFPoint` inputs; ids flow back via match_points)."""
        if self.n >= self.cfg.max_keyframes:
            return None
        k = self.n
        self.vio_p[k] = p_w
        self.vio_q[k] = q_w
        ypr = np.asarray(rot_to_ypr(quat_to_rot(jnp.asarray(q_w))))
        self.opt_yaw[k] = ypr[0]
        self.pitch[k] = ypr[1]
        self.roll[k] = ypr[2]
        self.opt_p[k] = p_w
        self.t_kf[k] = t
        self.n += 1

        # sequential edges to up to 5 predecessors (FourDOFError, weight 1)
        for back in range(1, MAX_EDGES_SEQ + 1):
            i = k - back
            if i < 0:
                break
            Ri = np.asarray(_rot_ypr(jnp.asarray(self.opt_yaw[i]), jnp.asarray(self.pitch[i]), jnp.asarray(self.roll[i])))
            rel_t = Ri.T @ (self.vio_p[k] - self.vio_p[i])
            rel_yaw = self.opt_yaw[k] - self.opt_yaw[i]
            self.edges.append(dict(i=i, j=k, t=rel_t, yaw=rel_yaw, w=1.0 if back == 1 else 0.6, loop=0))

        loop = None
        self.last_match = None
        if img is not None:
            img_j = jnp.asarray(img, jnp.float32)
            uv, valid, desc, gdesc = kdb.extract_keyframe_features(img_j)
            # window-point descriptors (`computeWindowBRIEFPoint`)
            win_desc = None
            if win_uv is not None and len(win_uv):
                wv = jnp.ones((len(win_uv),), jnp.float32)
                win_desc, _ = kdb.brief_descriptors(img_j, jnp.asarray(win_uv, jnp.float32), wv)
                win_desc = np.asarray(win_desc)
            entry = dict(uv=uv, valid=valid, desc=desc, cam=cam,
                         win_uv=win_uv, win_ids=win_ids, win_pts3d=win_pts3d,
                         win_desc=win_desc, img_shape=img.shape)
            old = self.db.query(gdesc, exclude_last=self.cfg.min_loop_gap)
            self.db.add(entry, gdesc)
            if old is not None:
                loop = self._find_connection(old, k, entry)
                if loop is not None:
                    self.edges.append(loop)
                    self.loop_count += 1
                    self._pending_opt = True
        return loop

    def _find_connection(self, old_idx, cur_idx, cur_entry):
        """`KeyFrame::findConnection`: the CURRENT keyframe's window points
        (with estimator feature ids + world 3D) match by BRIEF (Hamming<80)
        into the OLD keyframe's dense corners (`searchByBRIEFDes`); PnP RANSAC
        on (current world 3D ↔ old normalized 2D) recovers the OLD keyframe's
        pose in the current world → loop edge + `match_points` for the
        estimator's relocalization (stored in `self.last_match`)."""
        old = self.db.entries[old_idx]
        if cur_entry.get("win_desc") is None or cur_entry.get("win_pts3d") is None:
            return None
        cam = cur_entry.get("cam") or old.get("cam")
        if cam is None or old.get("desc") is None:
            return None
        d_cur = jnp.asarray(cur_entry["win_desc"])
        d_old = jnp.asarray(old["desc"])
        dist = np.array(kdb.hamming_matrix(d_cur, d_old))
        dist[:, ~old["valid"]] = 999
        best = dist.argmin(axis=1)
        bestd = dist.min(axis=1)
        good = bestd < self.cfg.desc_hamming_thresh
        if good.sum() < 8:
            return None
        from plslam.ops.cameras import lift

        pts3d = np.asarray(cur_entry["win_pts3d"])[good]
        uv_old = old["uv"][best[good]]
        norm_old = np.asarray(lift(cam, jnp.asarray(uv_old, jnp.float32)), np.float64)
        out = kdb.pnp_ransac(pts3d, norm_old, min_inliers=self.cfg.min_pnp_inliers)
        if out is None:
            return None
        R_cw, t_cw, inl = out
        # OLD keyframe's camera pose in the CURRENT world frame
        R_wc = R_cw.T
        p_wc = -R_cw.T @ t_cw
        # body ≈ cam for the keyframe pipeline (extrinsic absorbed by PGO loss)
        p_w_old = p_wc
        R_w_old = R_wc
        # loop edge old→cur: relative measured via the recovered old pose and
        # the CURRENT VIO pose
        j = cur_idx
        i = old_idx
        rel_t = R_w_old.T @ (self.vio_p[j] - p_w_old)
        yaw_old = float(np.asarray(rot_to_ypr(jnp.asarray(R_w_old)))[0])
        yaw_j = float(np.asarray(rot_to_ypr(quat_to_rot(jnp.asarray(self.vio_q[j]))))[0])
        rel_yaw = yaw_j - yaw_old
        # gates (`findConnection`)
        if abs(((rel_yaw - (self.opt_yaw[j] - self.opt_yaw[i])) + np.pi) % (2 * np.pi) - np.pi) > np.deg2rad(self.cfg.max_loop_yaw_deg):
            return None
        if np.linalg.norm(rel_t) > self.cfg.max_loop_translation:
            return None
        # match_points for the estimator (`/pose_graph/match_points`):
        # current-window feature ids + their normalized obs in the OLD camera
        ids = np.asarray(cur_entry["win_ids"]) if cur_entry.get("win_ids") is not None else None
        if ids is not None:
            sel = np.nonzero(good)[0][inl]
            self.last_match = dict(
                ids=ids[sel],
                obs_old=norm_old[inl],
                p_old=p_w_old,
                q_old=np.asarray(rot_to_quat(jnp.asarray(R_w_old))),
                old_idx=i, cur_idx=j,
            )
        return dict(i=i, j=j, t=rel_t, yaw=rel_yaw, w=2.0, loop=1)

    # ------------------------------------------------------------------- PGO
    def optimize(self, iters=12):
        """`optimize4DoF` + drift update."""
        if self.n < 2 or not self.edges:
            return
        K = self.cfg.max_keyframes
        E = len(self.edges)
        e_i = np.zeros(E, np.int32)
        e_j = np.zeros(E, np.int32)
        e_t = np.zeros((E, 3))
        e_yaw = np.zeros(E)
        e_w = np.zeros(E)
        e_loop = np.zeros(E)
        for m, e in enumerate(self.edges):
            e_i[m], e_j[m] = e["i"], e["j"]
            e_t[m] = e["t"]
            e_yaw[m] = e["yaw"]
            e_w[m] = e["w"]
            e_loop[m] = e["loop"]
        node_valid = np.zeros(K)
        node_valid[: self.n] = 1.0

        xyz, yaw, costs = optimize_4dof(
            jnp.asarray(self.opt_p), jnp.asarray(self.opt_yaw),
            jnp.asarray(self.pitch), jnp.asarray(self.roll), jnp.asarray(node_valid),
            jnp.asarray(e_i), jnp.asarray(e_j), jnp.asarray(e_t), jnp.asarray(e_yaw),
            jnp.asarray(e_w), jnp.asarray(e_valid := np.ones(E)), jnp.asarray(e_loop),
            iters=iters,
        )
        self.opt_p[: self.n] = np.asarray(xyz)[: self.n]
        self.opt_yaw[: self.n] = np.asarray(yaw)[: self.n]
        # drift: last keyframe optimized vs VIO (§A.7)
        k = self.n - 1
        vio_yaw = float(np.asarray(rot_to_ypr(quat_to_rot(jnp.asarray(self.vio_q[k]))))[0])
        self.yaw_drift = self.opt_yaw[k] - vio_yaw
        Rz = np.asarray(_rot_ypr(jnp.asarray(self.yaw_drift), jnp.asarray(0.0), jnp.asarray(0.0)))
        self.r_drift = Rz
        self.t_drift = self.opt_p[k] - Rz @ self.vio_p[k]
        self._pending_opt = False

    def correct(self, p_vio, q_vio):
        """Apply the current drift to a live VIO pose (`updatePath` output)."""
        p = self.r_drift @ np.asarray(p_vio) + self.t_drift
        q = np.asarray(quat_mul(rot_to_quat(jnp.asarray(self.r_drift)), jnp.asarray(q_vio)))
        return p, q

    # --------------------------------------------------------------- save/load
    def save(self, path):
        """`savePoseGraph` (npz instead of the reference's txt+per-kf files)."""
        np.savez_compressed(
            path,
            n=self.n, vio_p=self.vio_p[: self.n], vio_q=self.vio_q[: self.n],
            opt_p=self.opt_p[: self.n], opt_yaw=self.opt_yaw[: self.n],
            pitch=self.pitch[: self.n], roll=self.roll[: self.n],
            t_kf=self.t_kf[: self.n],
            edges_i=[e["i"] for e in self.edges], edges_j=[e["j"] for e in self.edges],
            edges_t=[e["t"] for e in self.edges], edges_yaw=[e["yaw"] for e in self.edges],
            edges_w=[e["w"] for e in self.edges], edges_loop=[e["loop"] for e in self.edges],
            gdescs=self.db.gdescs[: self.db.n],
        )

    def load(self, path):
        """`loadPoseGraph` + relocalize-against-saved-map support."""
        z = np.load(path, allow_pickle=True)
        n = int(z["n"])
        self.n = n
        self.vio_p[:n] = z["vio_p"]
        self.vio_q[:n] = z["vio_q"]
        self.opt_p[:n] = z["opt_p"]
        self.opt_yaw[:n] = z["opt_yaw"]
        self.pitch[:n] = z["pitch"]
        self.roll[:n] = z["roll"]
        self.t_kf[:n] = z["t_kf"]
        self.edges = [
            dict(i=int(i), j=int(j), t=np.asarray(t), yaw=float(y), w=float(w), loop=int(l))
            for i, j, t, y, w, l in zip(
                z["edges_i"], z["edges_j"], z["edges_t"], z["edges_yaw"], z["edges_w"], z["edges_loop"]
            )
        ]
        self.db.gdescs[: len(z["gdescs"])] = z["gdescs"]
        self.db.n = len(z["gdescs"])
        self.db.entries = [dict(pts3d=None) for _ in range(self.db.n)]
