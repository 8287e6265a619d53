"""Sliding-window visual-inertial estimator — the central state machine.

TPU-native equivalent of the reference's `vins_estimator/src/estimator.cpp`
(`Estimator::processIMU/processImage`, `solveOdometry`, `slideWindow`,
`failureDetection`, `clearState` — SURVEY.md §2.3 / §3.3) plus the
measurement-alignment host loop of `estimator_node.cpp`.

Split of responsibilities:
  host (this class, numpy): feature-table surgery, keyframe decision, window
    shifting, IMU buffering — cheap bookkeeping the reference also did on CPU.
  device (jitted fns): preintegration scan, triangulation, the LM/Schur
    window solve, marginalization — all fixed-shape, compiled once.

Asynchronous ROS callbacks collapse into a synchronous `process_imu` /
`process_frame` API (offline measurement pairing is array slicing —
SURVEY.md §2.3 row 'Estimator node').
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from plslam.config import PLSlamConfig
from plslam.models import marginalization as marg
from plslam.models import residuals as res
from plslam.models import solver as solver_mod
from plslam.models import triangulate
from plslam.models.feature_table import LineTable, PointTable
from plslam.models.state import WindowState, layout, zero_state
from plslam.ops import imu as imu_ops
from plslam.utils import quat_np as qnp
from plslam.utils.device import asdev
from plslam.utils.geometry import rot_to_quat

MARGIN_OLD = 0
MARGIN_SECOND_NEW = 1
IMU_PAD = 512  # max IMU samples per (possibly merged) keyframe interval


class ImuBuffer:
    """Samples of one keyframe interval, including the boundary sample of the
    previous interval (the reference's `IntegrationBase` ctor + push_back)."""

    def __init__(self):
        self.acc: list = []
        self.gyr: list = []
        self.dt: list = []  # len == len(acc) - 1 once seeded

    @property
    def seeded(self):
        return len(self.acc) > 0

    def seed(self, acc, gyr):
        self.acc = [np.asarray(acc, np.float64)]
        self.gyr = [np.asarray(gyr, np.float64)]
        self.dt = []

    def append(self, acc, gyr, dt):
        self.acc.append(np.asarray(acc, np.float64))
        self.gyr.append(np.asarray(gyr, np.float64))
        self.dt.append(float(dt))

    @staticmethod
    def merged(a: "ImuBuffer", b: "ImuBuffer") -> "ImuBuffer":
        m = ImuBuffer()
        if not a.seeded:
            return b
        m.acc = a.acc + b.acc[1:]
        m.gyr = a.gyr + b.gyr[1:]
        m.dt = a.dt + b.dt
        return m

    def padded(self, dtype):
        n = min(len(self.dt), IMU_PAD)
        acc = np.zeros((IMU_PAD + 1, 3))
        gyr = np.zeros((IMU_PAD + 1, 3))
        dts = np.zeros(IMU_PAD)
        if n > 0:
            acc[: n + 1] = np.stack(self.acc[: n + 1])
            gyr[: n + 1] = np.stack(self.gyr[: n + 1])
            acc[n + 1 :] = acc[n]
            gyr[n + 1 :] = gyr[n]
            dts[:n] = self.dt[:n]
        return jnp.asarray(acc, dtype), jnp.asarray(gyr, dtype), jnp.asarray(dts, dtype)


class Estimator:
    def __init__(self, config: PLSlamConfig, dtype=None):
        self.config = config
        self.cfg = config.solver
        self.lay = layout(self.cfg)
        self.dtype = dtype or (jnp.float64 if self.cfg.dtype == "float64" else jnp.float32)
        self.noise = imu_ops.ImuNoise(
            *[jnp.asarray(v, self.dtype) for v in
              (config.imu.acc_n, config.imu.gyr_n, config.imu.acc_w, config.imu.gyr_w)]
        )
        self.g = jnp.asarray([0.0, 0.0, config.imu.g_norm], self.dtype)
        self.clear_state()

    # ------------------------------------------------------------- state mgmt
    def clear_state(self):
        """`Estimator::clearState()` — full re-initialization."""
        nw = self.cfg.window_size + 1
        self.frame_count = 0  # slot index the NEXT frame occupies (0..nw-1)
        self.initialized = False
        self.timestamps = np.zeros(nw)
        self.p = np.zeros((nw, 3))
        self.q = np.tile([1.0, 0, 0, 0], (nw, 1)).astype(np.float64)
        self.v = np.zeros((nw, 3))
        self.ba = np.zeros((nw, 3))
        self.bg = np.zeros((nw, 3))
        ext = self.config.extrinsic
        R_bc = np.asarray(ext.rot).reshape(3, 3)
        self.q_bc = np.array(rot_to_quat(jnp.asarray(R_bc)))
        self.p_bc = np.array(ext.trans, np.float64)
        self.td = float(self.config.temporal.td)
        self.pt_table = PointTable(self.cfg)
        self.ln_table = LineTable(self.cfg)
        self.line_w = np.zeros((self.cfg.max_line_feats, 6))
        self.line_w[:, 1] = 5.0
        self.line_w[:, 5] = 1.0
        # imu_bufs[k] holds samples spanning (frame k-1 → frame k); [0] covers
        # the pre-first-frame samples and is never used as a factor
        self.imu_bufs: list[ImuBuffer] = [ImuBuffer()]
        self.pres: list[Optional[dict]] = [None]
        self.prior: Optional[marg.Prior] = None
        self.last_acc = None
        self.last_gyr = None
        self.metrics: list[dict] = []
        self._last_factors = None
        self._last_state = None
        self._last_groups = None
        self.relo: Optional[dict] = None  # pending relocalization frame
        self.relo_result: Optional[dict] = None  # refined relative pose out

    # ---------------------------------------------------------------- inputs
    def process_imu(self, dt: float, acc, gyr):
        """`Estimator::processIMU` — buffer the sample and dead-reckon the
        newest state slot (the solver's initial guess)."""
        acc = np.asarray(acc, np.float64)
        gyr = np.asarray(gyr, np.float64)
        first = self.last_acc is None
        buf = self.imu_bufs[-1]
        if not buf.seeded:
            # interval opens with the boundary sample (the reference passed
            # acc_0/gyr_0 into the IntegrationBase constructor)
            if first:
                buf.seed(acc, gyr)
                self.last_acc, self.last_gyr = acc, gyr
                return
            buf.seed(self.last_acc, self.last_gyr)
        buf.append(acc, gyr, dt)

        # midpoint dead-reckoning on the newest slot (pure numpy — this runs
        # at IMU rate on the host, no device dispatches)
        k = min(self.frame_count, self.cfg.window_size)
        ba, bg = self.ba[k], self.bg[k]
        g = np.array([0.0, 0.0, self.config.imu.g_norm])
        w_mid = 0.5 * (self.last_gyr + gyr) - bg
        q_old = self.q[k].copy()
        q_new = qnp.quat_normalize(qnp.quat_mul(q_old, qnp.quat_exp(w_mid * dt)))
        a0 = qnp.quat_rotate(q_old, self.last_acc - ba) - g
        a1 = qnp.quat_rotate(q_new, acc - ba) - g
        a_mid = 0.5 * (a0 + a1)
        self.p[k] += self.v[k] * dt + 0.5 * a_mid * dt * dt
        self.v[k] += a_mid * dt
        self.q[k] = q_new
        self.last_acc, self.last_gyr = acc, gyr

    def _close_interval(self, k: int):
        """Preintegrate the interval ending at frame slot k."""
        buf = self.imu_bufs[k]
        if len(buf.dt) == 0:
            self.pres[k] = None
            return
        acc, gyr, dts = buf.padded(self.dtype)
        kb = max(k - 1, 0)
        self.pres[k] = _preintegrate_padded(
            acc, gyr, dts,
            asdev(self.ba[kb], self.dtype),
            asdev(self.bg[kb], self.dtype),
            self.noise,
        )

    # ---------------------------------------------------------------- frames
    def process_frame(self, t: float, pt_ids, pt_obs, pt_vel=None, ln_ids=None, ln_obs=None,
                      oracle_state: Optional[dict] = None):
        """`Estimator::processImage`. Returns a per-frame metrics dict.

        oracle_state: optional {p,q,v} ground truth for the newest frame —
        bootstrap mode standing in for `initialStructure()` in tests."""
        fc = min(self.frame_count, self.cfg.window_size)
        # restart handshake (`feature_tracker_node` timestamp-jump detection →
        # estimator restart_callback): non-monotonic or >1 s gap ⇒ full reset
        last_t = self.timestamps[max(fc - 1, 0)] if self.frame_count > 0 else None
        if last_t is not None and (t < last_t - 1e-9 or t - last_t > 1.0):
            self.clear_state()
            fc = 0
        self.timestamps[fc] = t
        self._close_interval(fc)

        self.pt_table.add_frame(fc, pt_ids, pt_obs, pt_vel)
        if ln_ids is not None and len(ln_ids):
            self.ln_table.add_frame(fc, ln_ids, ln_obs)

        keyframe = self.pt_table.parallax_keyframe_decision(fc)
        marg_flag = MARGIN_OLD if keyframe else MARGIN_SECOND_NEW
        # MARGIN_SECOND_NEW merges interval (nw-1→nw) into (nw-2→nw-1); if the
        # merged sample count would overflow the fixed IMU_PAD bucket (long
        # hover/stationary runs of non-keyframes), force a keyframe instead of
        # silently truncating the preintegration (the factor would then span
        # less time than the frame gap).
        nw = self.cfg.window_size
        if (marg_flag == MARGIN_SECOND_NEW and self.frame_count >= nw
                and len(self.imu_bufs[nw - 1].dt) + len(self.imu_bufs[nw].dt) > IMU_PAD):
            keyframe = True
            marg_flag = MARGIN_OLD

        if oracle_state is not None and not self.initialized:
            self.p[fc] = oracle_state["p"]
            self.q[fc] = oracle_state["q"]
            self.v[fc] = oracle_state["v"]

        m = {"t": t, "frame": fc, "keyframe": bool(keyframe),
             "tracked": int(self.pt_table.active.sum())}

        if self.frame_count < self.cfg.window_size:
            # window still filling
            self.frame_count += 1
            self.imu_bufs.append(ImuBuffer())
            self.pres.append(None)
            self.p[self.frame_count] = self.p[self.frame_count - 1]
            self.q[self.frame_count] = self.q[self.frame_count - 1]
            self.v[self.frame_count] = self.v[self.frame_count - 1]
            self.metrics.append(m)
            return m

        if not self.initialized:
            if oracle_state is not None:
                self.initialized = True
            else:
                from plslam.models import initializer

                if initializer.try_initialize(self):
                    self.initialized = True
                else:
                    self._slide_uninitialized()
                    self.metrics.append(m)
                    return m

        # ------------------------------------------------ solve odometry
        self._triangulate()
        stats = self._optimize()
        m.update(
            cost0=float(stats.cost0), cost=float(stats.cost),
            cost_robust0=float(stats.cost_robust0),
            cost_robust=float(stats.cost_robust),
            iters_accepted=int(stats.accepted),
            n_pts=int(self.pt_table.used_in_solver().sum()),
            n_lines=int(self.ln_table.usable().sum()),
        )
        self._reject_outliers()

        if self._failure_detection():
            m["failure"] = True
            self.metrics.append(m)
            self.clear_state()
            return m

        self._marginalize_and_slide(marg_flag)
        self.metrics.append(m)
        return m

    # --------------------------------------------------------- relocalization
    def set_relo_frame(self, match_ids, match_obs_norm, relo_p, relo_q):
        """`Estimator::setReloFrame`: register an old keyframe's matched
        feature observations (by global feature id, normalized coords in the
        old camera) + its pose guess. The next window solve adds relo
        projection factors and refines the old pose jointly; the refined
        relative transform lands in `self.relo_result`."""
        mf = self.cfg.max_features
        obs = np.zeros((mf, 2))
        mask = np.zeros(mf)
        slot_of = {int(i): s for s, i in enumerate(self.pt_table.ids) if i >= 0}
        n = 0
        for fid, ob in zip(match_ids, match_obs_norm):
            s = slot_of.get(int(fid))
            if s is not None:
                obs[s] = ob
                mask[s] = 1.0
                n += 1
        if n < 8:
            return False
        self.relo = dict(obs=obs, mask=mask, p=np.asarray(relo_p, np.float64),
                         q=np.asarray(relo_q, np.float64))
        return True

    def _extract_relo_result(self, st: WindowState):
        """Relative pose old-kf ← newest window frame after the joint solve
        (the reference's `relo_relative_t/q` published back to the pose graph)."""
        from plslam.utils.geometry import quat_conj, quat_mul, quat_rotate

        nw = self.cfg.window_size
        q_old = np.array(st.relo_q, np.float64)
        p_old = np.array(st.relo_p, np.float64)
        q_cur = np.array(st.q[nw], np.float64)
        p_cur = np.array(st.p[nw], np.float64)
        q_rel = np.asarray(quat_mul(quat_conj(jnp.asarray(q_old)), jnp.asarray(q_cur)))
        t_rel = np.asarray(
            quat_rotate(quat_conj(jnp.asarray(q_old)), jnp.asarray(p_cur - p_old))
        )
        self.relo_result = dict(t=t_rel, q=q_rel, p_old=p_old, q_old=q_old)
        self.relo = None

    # ------------------------------------------------------------ device I/O
    def _device_state(self) -> WindowState:
        st = zero_state(self.cfg, self.dtype)
        return st._replace(
            p=asdev(self.p, self.dtype),
            q=asdev(self.q, self.dtype),
            v=asdev(self.v, self.dtype),
            ba=asdev(self.ba, self.dtype),
            bg=asdev(self.bg, self.dtype),
            p_bc=asdev(self.p_bc, self.dtype),
            q_bc=asdev(self.q_bc, self.dtype),
            td=asdev(self.td, self.dtype),
            relo_p=asdev(self.relo["p"] if self.relo else np.zeros(3), self.dtype),
            relo_q=asdev(self.relo["q"] if self.relo else np.array([1.0, 0, 0, 0]), self.dtype),
            inv_depth=jnp.asarray(
                np.where(self.pt_table.inv_depth > 0, self.pt_table.inv_depth, 0.2), self.dtype
            ),
            line=asdev(self.line_w, self.dtype),
        )

    def _factors(self) -> res.WindowFactors:
        lay, dtype = self.lay, self.dtype
        f = res.empty_factors(self.cfg, lay, dtype)
        W = lay.nw - 1
        al, be, ga, jc, si, dts, vb, bas, bgs = [], [], [], [], [], [], [], [], []
        for k in range(1, W + 1):
            pre = self.pres[k] if k < len(self.pres) else None
            if pre is None:
                al.append(jnp.zeros(3, dtype)); be.append(jnp.zeros(3, dtype))
                ga.append(jnp.asarray([1.0, 0, 0, 0], dtype))
                jc.append(jnp.eye(15, dtype=dtype)); si.append(jnp.eye(15, dtype=dtype))
                dts.append(jnp.zeros((), dtype)); vb.append(0.0)
                bas.append(jnp.zeros(3, dtype)); bgs.append(jnp.zeros(3, dtype))
            else:
                al.append(pre["alpha"]); be.append(pre["beta"]); ga.append(pre["gamma"])
                jc.append(pre["jac"]); si.append(pre["sqrt_info"]); dts.append(pre["dt_sum"])
                vb.append(1.0); bas.append(pre["ba"]); bgs.append(pre["bg"])
        f = f._replace(
            imu_alpha=jnp.stack(al), imu_beta=jnp.stack(be), imu_gamma=jnp.stack(ga),
            imu_jac=jnp.stack(jc), imu_sqrt_info=jnp.stack(si), imu_dt=jnp.stack(dts),
            imu_ba=jnp.stack(bas), imu_bg=jnp.stack(bgs),
            imu_valid=jnp.asarray(vb, dtype), g=self.g,
        )
        pt_used = self.pt_table.used_in_solver()
        camc = self.config.camera
        if self.config.temporal.rolling_shutter:
            # image-row fraction of each observation (row ≈ fy·y_norm + cy)
            rowf = np.clip(
                (camc.fy * self.pt_table.obs[..., 1] + camc.cy) / max(camc.image_height, 1),
                0.0, 1.0,
            )
            rs_tr = self.config.temporal.rolling_shutter_tr
        else:
            rowf = np.zeros_like(self.pt_table.obs[..., 1])
            rs_tr = 0.0
        f = f._replace(
            pt_obs=asdev(self.pt_table.obs, dtype),
            pt_vel=asdev(self.pt_table.vel, dtype),
            pt_rowf=jnp.asarray(rowf, dtype),
            rs_tr=jnp.asarray(rs_tr, dtype),
            pt_mask=asdev(self.pt_table.mask.astype(np.float64), dtype),
            pt_start=asdev(self.pt_table.start),
            pt_valid=jnp.asarray(pt_used.astype(np.float64), dtype),
        )
        ln_used = self.ln_table.usable()
        f = f._replace(
            ln_obs=asdev(self.ln_table.obs, dtype),
            ln_mask=asdev(self.ln_table.mask.astype(np.float64), dtype),
            ln_valid=jnp.asarray(ln_used.astype(np.float64), dtype),
            ln_start=asdev(self.ln_table.start),
        )
        if self.relo is not None:
            f = f._replace(
                relo_obs=asdev(self.relo["obs"], dtype),
                relo_mask=asdev(self.relo["mask"], dtype),
                relo_valid=jnp.ones((), dtype),
            )
        if self.prior is not None:
            f = marg.install_prior(f, self.prior)
        return f

    def _writeback(self, st: WindowState):
        # np.array (not asarray): device arrays view as read-only
        self.p = np.array(st.p, np.float64)
        self.q = np.array(st.q, np.float64)
        self.v = np.array(st.v, np.float64)
        self.ba = np.array(st.ba, np.float64)
        self.bg = np.array(st.bg, np.float64)
        self.p_bc = np.array(st.p_bc, np.float64)
        self.q_bc = np.array(st.q_bc, np.float64)
        self.td = float(st.td)
        inv = np.asarray(st.inv_depth, np.float64)
        used = self.pt_table.used_in_solver()
        self.pt_table.inv_depth[used] = inv[used]
        # `FeatureManager::removeFailures` (solve_flag == 2): a feature whose
        # SOLVED inverse depth comes back non-positive is geometrically
        # inconsistent — drop it entirely. Keeping it would re-triangulate it
        # from the current (drifted) poses every frame and feed the bad
        # geometry back into the next solve (and pin a table slot forever).
        failed = used & (inv <= 0)
        if np.any(failed):
            self.pt_table.drop(np.nonzero(failed)[0])
        self.line_w = np.array(st.line, np.float64)

    # --------------------------------------------------------------- solving
    def _cam_poses_np(self):
        q_wc = qnp.quat_mul(self.q, self.q_bc[None, :])
        p_wc = self.p + qnp.quat_rotate(self.q, np.broadcast_to(self.p_bc, self.p.shape))
        return p_wc, q_wc

    def _triangulate(self):
        """`FeatureManager::triangulate` + `triangulateLine`."""
        p_wc, q_wc = self._cam_poses_np()
        p_wc_j = jnp.asarray(p_wc, self.dtype)
        q_wc_j = jnp.asarray(q_wc, self.dtype)
        tbl = self.pt_table
        need = tbl.solvable() & (tbl.inv_depth <= 0)
        if np.any(need):
            inv_d, ok = triangulate.triangulate_points(
                p_wc_j, q_wc_j,
                asdev(tbl.obs, self.dtype),
                asdev(tbl.mask.astype(np.float64), self.dtype),
                asdev(tbl.start),
            )
            inv_d = np.asarray(inv_d, np.float64)
            ok = np.asarray(ok)
            commit = need & ok
            tbl.inv_depth[commit] = inv_d[commit]
            fallback = need & ~ok & (np.sum(tbl.mask, axis=1) >= 4)
            tbl.inv_depth[fallback] = 1.0 / 5.0  # INIT_DEPTH
        ltb = self.ln_table
        lneed = ltb.active & ~ltb.solved & (np.sum(ltb.mask, axis=1) >= 2)
        if np.any(lneed):
            L, ok = triangulate.triangulate_lines(
                p_wc_j, q_wc_j,
                asdev(ltb.obs, self.dtype),
                asdev(ltb.mask.astype(np.float64), self.dtype),
                asdev(ltb.start),
            )
            L = np.asarray(L, np.float64)
            ok = np.asarray(ok)
            commit = lneed & ok
            self.line_w[commit] = L[commit]
            ltb.solved[commit] = True

    def _optimize(self):
        st = self._device_state()
        f = self._factors()
        lp = self.cfg.line_param
        if lp != "world":
            # the estimator's canonical line store is world Plücker; anchored
            # variants (`…_incamera`/`…_instartframe`) solve in the anchor
            # chart and convert back with the UPDATED anchor poses — the line
            # rides its first-observing frame exactly like the reference's
            # factor variants
            st = st._replace(line=res.lines_from_world(st, st.line, f.ln_start, lp))
        st_out, stats = solver_mod.optimize_window(
            st, f, self.lay, self.cfg,
            estimate_extrinsic=self.config.extrinsic.estimate_extrinsic > 0,
            estimate_td=self.config.temporal.estimate_td,
            num_iters=self.cfg.max_num_iterations,
        )
        if lp != "world":
            st_out = st_out._replace(line=res.lines_to_world(st_out, f.ln_start, lp))
        self._writeback(st_out)
        self._last_factors = f
        self._last_state = st_out
        self._last_groups = stats.groups  # reused by marginalize_old's IRLS weights
        if self.relo is not None:
            self._extract_relo_result(st_out)
        return stats

    def _reject_outliers(self):
        """`removeOutlier` / `removeLineOutlier`: reprojection gating.

        Reuses the solver's carried residual groups (`SolveStats.groups` —
        the unweighted whitened residuals at the final state) instead of
        re-dispatching two residual-stack evaluations per frame: the vision
        residuals are gauge-invariant, so the solver's pre-reanchor carry is
        exactly `point_residuals(_last_state, …)` (anchored line charts match
        to f32 round-trip noise — harmless for a 10 px gate)."""
        f = self._last_factors
        _, _, r_pt_dev, r_ln_dev, _ = self._last_groups
        r_pt = np.asarray(r_pt_dev)
        err_px = np.linalg.norm(r_pt, axis=-1) * 1.5  # whitened → pixels
        per_feat = np.where(np.asarray(f.pt_mask) > 0, err_px, 0.0).max(axis=1)
        bad = (np.asarray(f.pt_valid) > 0) & (per_feat > 10.0)
        if np.any(bad):
            self.pt_table.drop(np.nonzero(bad)[0])
        r_ln = np.asarray(r_ln_dev)
        err_ln = np.abs(r_ln).max(axis=-1) * 1.5
        per_line = np.where(np.asarray(f.ln_mask) > 0, err_ln, 0.0).max(axis=1)
        badl = (np.asarray(f.ln_valid) > 0) & (per_line > 10.0)
        if np.any(badl):
            self.ln_table.drop(np.nonzero(badl)[0])

    def _failure_detection(self) -> bool:
        """`Estimator::failureDetection` (SURVEY.md §5.3)."""
        nw = self.cfg.window_size
        if np.linalg.norm(self.ba[nw]) > 2.5 or np.linalg.norm(self.bg[nw]) > 1.0:
            return True
        dp = self.p[nw] - self.p[nw - 1]
        if np.linalg.norm(dp) > 5.0 or abs(dp[2]) > 1.0:
            return True
        return False

    # ---------------------------------------------------------------- slide
    def _marginalize_and_slide(self, flag: int):
        st = self._last_state
        f = self._last_factors
        nw = self.cfg.window_size
        if flag == MARGIN_OLD:
            self.prior = marg.marginalize_old(
                st, f, self.lay, self.cfg, groups=self._last_groups)
            p_wc, q_wc = self._cam_poses_np()
            old0_p, old0_q = p_wc[0].copy(), q_wc[0].copy()
            self._roll_states()
            self.pt_table.slide_old(old0_p, old0_q, p_wc[1], q_wc[1])
            self.ln_table.slide_old()
            self.imu_bufs.pop(1)
            self.pres.pop(1)
        else:
            if self.prior is not None:
                self.prior = marg.marginalize_second_new(st, f, self.lay, self.cfg)
            # merge interval (nw-1→nw) into (nw-2→nw-1): frame nw-1 dies
            merged = ImuBuffer.merged(self.imu_bufs[nw - 1], self.imu_bufs[nw])
            self.imu_bufs[nw - 1] = merged
            self.imu_bufs.pop(nw)
            self.pres.pop(nw)
            acc, gyr, dts = merged.padded(self.dtype)
            self.pres[nw - 1] = _preintegrate_padded(
                acc, gyr, dts,
                asdev(self.ba[nw - 2], self.dtype),
                asdev(self.bg[nw - 2], self.dtype),
                self.noise,
            )
            for arr in (self.p, self.q, self.v, self.ba, self.bg):
                arr[nw - 1] = arr[nw]
            self.timestamps[nw - 1] = self.timestamps[nw]
            self.pt_table.slide_new()
            self.ln_table.slide_new()
        self.imu_bufs.append(ImuBuffer())
        self.pres.append(None)

    def _slide_uninitialized(self):
        """During failed initialization the reference always slides old."""
        p_wc, q_wc = self._cam_poses_np()
        old0_p, old0_q = p_wc[0].copy(), q_wc[0].copy()
        self._roll_states()
        self.pt_table.slide_old(old0_p, old0_q, p_wc[1], q_wc[1])
        self.ln_table.slide_old()
        self.imu_bufs.pop(1)
        self.pres.pop(1)
        self.imu_bufs.append(ImuBuffer())
        self.pres.append(None)

    def _roll_states(self):
        for name in ("p", "q", "v", "ba", "bg"):
            arr = getattr(self, name)
            arr[:-1] = arr[1:]
        self.timestamps[:-1] = self.timestamps[1:]

    # ---------------------------------------------------------------- output
    def window_points(self):
        """(ids, norm_obs [n,2], world_3d [n,3]) of triangulated features
        observed in the newest solved frame — the keyframe payload the
        reference published on `/keyframe_point` (SURVEY.md §3.3).

        Uses the PRE-slide solve snapshot (`_last_state`/`_last_factors`):
        after `process_frame` returns, the table has already slid and the
        newest column is cleared; feature SLOTS are stable across the slide,
        so current table ids still label the snapshot's rows."""
        f = self._last_factors
        st = self._last_state
        if f is None or st is None:
            return np.zeros(0, np.int64), np.zeros((0, 2)), np.zeros((0, 3))
        k = self.cfg.window_size
        ids = self.pt_table.ids
        m = (np.asarray(f.pt_valid) * np.asarray(f.pt_mask)[:, k] > 0) & (ids >= 0)
        sel = np.nonzero(m)[0]
        if len(sel) == 0:
            return np.zeros(0, np.int64), np.zeros((0, 2)), np.zeros((0, 3))
        p_w = np.asarray(_world_points_jit(st, f), np.float64)
        obs = np.asarray(f.pt_obs, np.float64)
        return ids[sel].copy(), obs[sel, k], p_w[sel]

    def latest_pose(self):
        k = self.cfg.window_size if self.initialized else max(min(self.frame_count, self.cfg.window_size) - 1, 0)
        return self.timestamps[k], self.p[k].copy(), self.q[k].copy()

    def imu_rate_pose(self):
        """IMU-rate propagated odometry — the newest slot as dead-reckoned by
        `process_imu` between solves (the reference's `predict()` →
        `pubLatestOdometry` high-rate output, SURVEY.md §2.3). Returns
        (p, q, v)."""
        k = min(self.frame_count, self.cfg.window_size)
        return self.p[k].copy(), self.q[k].copy(), self.v[k].copy()


def _preintegrate_padded(acc, gyr, dts, ba, bg, noise):
    pre = _preint_jit(acc, gyr, dts, ba, bg, noise)
    return {
        "alpha": pre.alpha, "beta": pre.beta, "gamma": pre.gamma, "jac": pre.jac,
        "sqrt_info": imu_ops.sqrt_info_from_cov(pre.cov), "dt_sum": pre.dt_sum,
        "ba": pre.ba, "bg": pre.bg,
    }


@jax.jit
def _preint_jit(acc, gyr, dts, ba, bg, noise):
    return imu_ops.preintegrate(acc, gyr, dts, ba, bg, noise)


@jax.jit
def _world_points_jit(st, f):
    # one dispatch per keyframe instead of the ~20-op eager chain
    return res._world_points(st, f)
