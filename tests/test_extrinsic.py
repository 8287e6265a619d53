"""Online camera-IMU extrinsic refinement (`ESTIMATE_EXTRINSIC=1`): the
window solver must pull a perturbed extrinsic back toward the truth through
the projection factors (ref: `estimator.cpp` adds the extrinsic parameter
block when ESTIMATE_EXTRINSIC; the rotation initializer
`calibrate_extrinsic_rotation` is tested in test_initializer)."""
import jax.numpy as jnp
import numpy as np

from plslam.config import SolverConfig
from plslam.io import synthetic
from plslam.models import packing, solver
from plslam.models.state import layout
from plslam.utils.geometry import quat_mul, quat_normalize

CFG = SolverConfig(max_features=96, max_line_feats=16)
LAY = layout(CFG)


def _ypr_quat(yaw, pitch, roll):
    cy, sy = np.cos(yaw / 2), np.sin(yaw / 2)
    cp, sp = np.cos(pitch / 2), np.sin(pitch / 2)
    cr, sr = np.cos(roll / 2), np.sin(roll / 2)
    return np.array([
        cy * cp * cr + sy * sp * sr,
        cy * cp * sr - sy * sp * cr,
        cy * sp * cr + sy * cp * sr,
        sy * cp * cr - cy * sp * sr,
    ])


def test_solver_refines_perturbed_extrinsic():
    seq = synthetic.make_sequence(duration=6.0, n_points=260, n_lines=16, seed=5)
    frames = list(range(0, 55, 5))
    state_gt, f = packing.factors_from_synthetic(seq, frames, CFG, LAY, with_lines=False)

    # perturb the extrinsic by 2° + 2 cm (a plausible hand-calibration error)
    dq = jnp.asarray(_ypr_quat(np.radians(2.0), np.radians(-1.2), np.radians(0.8)),
                     state_gt.q_bc.dtype)
    q_bc_pert = quat_normalize(quat_mul(state_gt.q_bc, dq))
    p_bc_pert = state_gt.p_bc + jnp.asarray([0.02, -0.012, 0.008], state_gt.p_bc.dtype)
    pert = state_gt._replace(q_bc=q_bc_pert, p_bc=p_bc_pert)

    ang0 = 2.0 * np.degrees(np.arccos(min(abs(float(jnp.dot(pert.q_bc, state_gt.q_bc))), 1.0)))
    t0 = float(jnp.linalg.norm(pert.p_bc - state_gt.p_bc))

    # frozen extrinsic: the error stays (sanity that the flag gates the dims)
    st_frozen, _ = solver.optimize_window(pert, f, LAY, CFG, num_iters=8)
    np.testing.assert_allclose(np.asarray(st_frozen.q_bc), np.asarray(pert.q_bc), atol=1e-12)

    # estimated extrinsic: rotation and lever arm pull back toward truth
    st, stats = solver.optimize_window(pert, f, LAY, CFG,
                                       estimate_extrinsic=True, num_iters=12)
    ang1 = 2.0 * np.degrees(np.arccos(min(abs(float(jnp.dot(st.q_bc, state_gt.q_bc))), 1.0)))
    t1 = float(jnp.linalg.norm(st.p_bc - state_gt.p_bc))
    assert ang1 < 0.25 * ang0, (ang0, ang1)
    assert t1 < 0.5 * t0, (t0, t1)
    # and the window itself must land on ground truth again
    p_err = np.asarray(jnp.linalg.norm(st.p - state_gt.p, axis=-1)).max()
    assert p_err < 2e-2, p_err


def test_estimate_extrinsic_2_live_flow():
    """ESTIMATE_EXTRINSIC=2 end-to-end (`CalibrationExRotation` per frame —
    SURVEY.md §2.3 init row): starting from a ~10°-wrong R_bc, the live
    hand-eye calibration must converge to <0.5° BEFORE initialization is
    allowed, and the system must then initialize and track."""
    import dataclasses

    from plslam.config import ExtrinsicConfig, PLSlamConfig
    from plslam.io import synthetic
    from plslam.runner import run_synthetic
    from plslam.utils import quat_np as qnp

    # a CALIBRATION-style trajectory: rotationally excited about all axes
    # (the reference's =2 mode assumes you wave the rig — its 0.25
    # singular-value gate never passes on gentle motion, by design)
    seq = synthetic.make_sequence(
        duration=12.0, n_points=260, n_lines=0, seed=9,
        params=synthetic.TrajectoryParams(omega=0.8, pitch_amp=0.3,
                                          roll_amp=0.25, wiggle_amp=0.3,
                                          excite_amp=0.1))
    R_true = qnp.quat_to_rot(np.asarray(seq.q_bc))
    dq = _ypr_quat(np.radians(7.0), np.radians(-5.0), np.radians(4.0))  # ≈9.5°
    R_pert = R_true @ qnp.quat_to_rot(dq)
    cfg = PLSlamConfig(
        solver=CFG,
        extrinsic=ExtrinsicConfig(estimate_extrinsic=2),
    )
    ts, ps, qs, est = run_synthetic(seq, cfg, oracle_init=False,
                                    use_lines=False,
                                    extrinsic_rot_override=R_pert)
    assert est.ex_calibrated, "hand-eye calibration never converged"
    ang = 2.0 * np.degrees(np.arccos(min(abs(float(
        np.dot(est.q_bc, np.asarray(seq.q_bc)))), 1.0)))
    assert ang < 0.5, f"calibrated extrinsic off by {ang:.2f}°"
    assert est.initialized, "system failed to initialize after calibration"
    assert len(ts) > 20
