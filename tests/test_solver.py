"""Batched LM solver + marginalization tests on synthetic ground truth."""

import numpy as np
import jax
import jax.numpy as jnp

from vins_rgbd_fast_tpu.backend.state import FRAMES, NX, WindowState, boxminus
from vins_rgbd_fast_tpu.ops import marginalization as marg
from vins_rgbd_fast_tpu.ops import solver as slv
from vins_rgbd_fast_tpu.utils import quaternion as quat

from tests.helpers import (
    G, make_imu_data, make_visual_data, perturb_state, simulate_window_trajectory,
)

MAXF = 32


def _align_to(ref: WindowState, x: WindowState) -> WindowState:
    """Anchor x so frame0 position+yaw matches ref (gauge-invariant compare)."""
    from vins_rgbd_fast_tpu.backend.state import yaw_gauge_fix

    return yaw_gauge_fix(x, ref)


def test_vo_ba_converges_to_ground_truth():
    gt, _ = simulate_window_trajectory(seed=0)
    vis, _ = make_visual_data(gt, maxf=MAXF, depth_fixed_frac=0.5)
    x0 = perturb_state(gt, keep_frame0=True)
    cfg = slv.SolverConfig(maxf=MAXF, use_imu=False, fix_pose0=True,
                           yaw_gauge=False, max_iters=8)
    res = slv.solve(cfg, x0, vis, None, slv.empty_prior(gt.P.dtype),
                    jnp.asarray(G))
    assert float(res.cost) < 1e-10 * max(1.0, float(res.cost0))
    perr = np.abs(np.asarray(res.x.P) - np.asarray(gt.P)).max()
    assert perr < 1e-4, perr
    # rotation error
    dq = quat.qmul(quat.qconj(gt.Q), res.x.Q)
    rerr = np.abs(np.asarray(dq)[:, 1:]).max()
    assert rerr < 1e-4, rerr
    # inverse depths recovered for the free features
    free = np.asarray(vis.depth_free)
    derr = np.abs(np.asarray(res.inv_depth) - np.asarray(vis.inv_depth))[free].max()
    assert derr < 1e-4, derr


def test_vio_ba_converges():
    gt, imu_arr = simulate_window_trajectory(seed=3)
    vis, _ = make_visual_data(gt, maxf=MAXF, depth_fixed_frac=0.5, seed=4)
    imu = make_imu_data(imu_arr)
    x0 = perturb_state(gt, seed=5, dp=0.03, dth=0.01, dv=0.03, dbias=0.005)
    cfg = slv.SolverConfig(maxf=MAXF, use_imu=True, yaw_gauge=True, max_iters=8)
    res = slv.solve(cfg, x0, vis, imu, slv.empty_prior(gt.P.dtype), jnp.asarray(G))
    assert float(res.cost) < float(res.cost0)
    # compare in the gauge of the ground truth
    xa = _align_to(gt, res.x)
    perr = np.abs(np.asarray(xa.P) - np.asarray(gt.P)).max()
    assert perr < 5e-3, perr
    verr = np.abs(np.asarray(xa.V) - np.asarray(gt.V)).max()
    assert verr < 2e-2, verr
    bgerr = np.abs(np.asarray(res.x.Bg) - np.asarray(gt.Bg)).max()
    assert bgerr < 5e-3, bgerr


def test_solver_is_jittable_and_f32_stable():
    gt, imu_arr = simulate_window_trajectory(seed=7)
    vis, _ = make_visual_data(gt, maxf=MAXF, seed=8)
    imu = make_imu_data(imu_arr)
    f32 = lambda t: jax.tree.map(lambda a: a.astype(jnp.float32)
                                 if a.dtype == jnp.float64 else a, t)
    gt32, vis32, imu32 = f32(gt), f32(vis), f32(imu)
    x0 = f32(perturb_state(gt, seed=9, dp=0.02, dth=0.01))
    cfg = slv.SolverConfig(maxf=MAXF, use_imu=True, max_iters=8)
    fn = jax.jit(lambda x, v, m, p, g: slv.solve(cfg, x, v, m, p, g))
    res = fn(x0, vis32, imu32, slv.empty_prior(jnp.float32), jnp.asarray(G, jnp.float32))
    assert res.x.P.dtype == jnp.float32
    assert bool(jnp.isfinite(res.cost)) and float(res.cost) < float(res.cost0)
    xa = _align_to(gt32, res.x)
    perr = np.abs(np.asarray(xa.P) - np.asarray(gt32.P)).max()
    assert perr < 2e-2, perr


def test_masked_rows_isolate_nonfinite_data():
    """Garbage (NaN) in masked-off feature rows must not leak into the
    system through 0·NaN (regression: verify-probe found multiply-masking)."""
    gt, imu_arr = simulate_window_trajectory(seed=21)
    vis, _ = make_visual_data(gt, maxf=MAXF, seed=22)
    imu = make_imu_data(imu_arr)
    bad_row = MAXF - 1
    assert not bool(vis.valid[bad_row])
    vis_bad = vis._replace(pts=vis.pts.at[bad_row].set(jnp.nan))
    cfg = slv.SolverConfig(maxf=MAXF, use_imu=True, max_iters=4)
    res = slv.solve(cfg, gt, vis_bad, imu, slv.empty_prior(gt.P.dtype), jnp.asarray(G))
    assert bool(jnp.isfinite(res.cost))


def test_relo_block_recovers_old_pose():
    """Fast-relocalization factors: matched old-keyframe observations must
    pull the extra relo pose onto its true value while the window stays."""
    gt, imu_arr = simulate_window_trajectory(seed=51)
    vis, L = make_visual_data(gt, maxf=MAXF, seed=52, depth_fixed_frac=0.7)
    imu = make_imu_data(imu_arr)
    # "old keyframe" ground-truth pose: offset from frame 3
    P_old = np.asarray(gt.P[3]) + np.array([0.15, -0.1, 0.05])
    Q_old = np.asarray(quat.qmul(gt.Q[3], quat.so3_exp(jnp.asarray([0.03, 0.02, -0.04]))))
    # exact observations of the landmarks from the old pose (identity extrinsic)
    R_old = np.asarray(quat.q2R(jnp.asarray(Q_old)))
    pc = (L - P_old) @ R_old
    obs = pc[:, :2] / pc[:, 2:3]
    match_valid = np.zeros(MAXF, bool)
    match_pts = np.zeros((MAXF, 2))
    n = L.shape[0]
    match_valid[:n] = pc[:, 2] > 0.5
    match_pts[:n] = obs
    relo = slv.ReloData(
        active=jnp.asarray(True),
        match_pts=jnp.asarray(match_pts),
        match_valid=jnp.asarray(match_valid),
        match_ids=jnp.arange(MAXF, dtype=jnp.int32),  # row-identity keys
        # perturbed initial guess of the old pose
        P=jnp.asarray(P_old + np.array([0.1, 0.08, -0.06])),
        Q=quat.qboxplus(jnp.asarray(Q_old), jnp.asarray([0.02, -0.03, 0.02])),
    )
    cfg = slv.SolverConfig(maxf=MAXF, use_imu=True, max_iters=8, with_relo=True)
    res = slv.solve(cfg, gt, vis, imu, slv.empty_prior(gt.P.dtype),
                    jnp.asarray(G), relo=relo)
    assert res.relo_P is not None
    perr = np.linalg.norm(np.asarray(res.relo_P) - P_old)
    assert perr < 5e-3, perr
    dq = quat.qmul(quat.qconj(jnp.asarray(Q_old)), res.relo_Q)
    assert np.abs(np.asarray(dq)[1:]).max() < 5e-3
    # inactive relo must be a no-op
    res2 = slv.solve(cfg, gt, vis, imu, slv.empty_prior(gt.P.dtype),
                     jnp.asarray(G), relo=slv.empty_relo(MAXF, gt.P.dtype))
    assert bool(jnp.isfinite(res2.cost))


def test_schur_prior_matches_dense_conditioning():
    """The eigendecomp square-root prior must reproduce the exact Schur
    complement of a random PSD system (numpy reference math)."""
    rng = np.random.default_rng(0)
    nt = NX + MAXF
    A = rng.normal(size=(nt + 40, nt))
    H = A.T @ A
    b = rng.normal(size=nt)
    drop, keep = marg.drop_keep_old(MAXF)
    new_pos = marg._shifted_positions_old(keep)
    # both square-root backends must reproduce the exact Schur complement
    for method in ("eigh", "chol"):
        J_new, r_new = marg._schur_sqrt_prior(
            jnp.asarray(H), jnp.asarray(b),
            jnp.asarray(drop), jnp.asarray(keep), jnp.asarray(new_pos),
            jnp.float64, method=method,
        )
        _check_schur(H, b, drop, keep, new_pos, J_new, r_new,
                     rtol=(1e-6 if method == "eigh" else 1e-5))


def _check_schur(H, b, drop, keep, new_pos, J_new, r_new, rtol=1e-6):
    # numpy dense Schur
    Hdd = H[np.ix_(drop, drop)]
    Hkd = H[np.ix_(keep, drop)]
    Hkk = H[np.ix_(keep, keep)]
    S = Hkk - Hkd @ np.linalg.inv(Hdd) @ Hkd.T
    g = b[keep] - Hkd @ np.linalg.inv(Hdd) @ b[drop]
    # prior must satisfy JᵀJ == S and Jᵀr == g (in shifted coordinates)
    Jn = np.asarray(J_new)
    rn = np.asarray(r_new)
    JtJ = Jn.T @ Jn
    Jtr = Jn.T @ rn
    S_embed = np.zeros((NX, NX))
    g_embed = np.zeros(NX)
    S_embed[np.ix_(new_pos, new_pos)] = S
    g_embed[new_pos] = g
    np.testing.assert_allclose(JtJ, S_embed, atol=rtol * np.abs(S).max())
    np.testing.assert_allclose(Jtr, g_embed, atol=rtol * np.abs(g).max())


def test_marginalize_old_keeps_window_consistent():
    """After marginalizing frame 0, a prior-only solve from a perturbed
    state should pull the kept frames back toward their marginalization-time
    values."""
    gt, imu_arr = simulate_window_trajectory(seed=11)
    vis, _ = make_visual_data(gt, maxf=MAXF, seed=12)
    imu = make_imu_data(imu_arr)
    cfg = slv.SolverConfig(maxf=MAXF, use_imu=True, max_iters=8)
    prior0 = slv.empty_prior(gt.P.dtype)
    gvec = jnp.asarray(G)

    prior = marg.marginalize_old(cfg, gt, vis, imu, prior0, gvec)
    assert bool(prior.valid)
    x_shift = marg.shift_state_old(gt)
    # residual at the linearization point: dx = 0 → r = r0 (finite)
    dx0 = boxminus(x_shift, prior.x0)
    np.testing.assert_allclose(np.asarray(dx0), 0.0, atol=1e-12)

    # prior-only GN pull-back: perturb kept frames, check gradient direction
    xp = perturb_state(x_shift, seed=13, dp=0.01, dth=0.005, dv=0.01, dbias=0.002)
    dx = boxminus(xp, prior.x0)
    r = prior.r0 + prior.J @ dx
    cost_pert = float(jnp.sum(r * r))
    cost_lin = float(jnp.sum(prior.r0 ** 2))
    assert cost_pert > cost_lin  # prior penalizes deviation


def test_marginalize_new_drops_pose_info():
    gt, imu_arr = simulate_window_trajectory(seed=15)
    vis, _ = make_visual_data(gt, maxf=MAXF, seed=16)
    imu = make_imu_data(imu_arr)
    cfg = slv.SolverConfig(maxf=MAXF, use_imu=True, max_iters=8)
    gvec = jnp.asarray(G)
    prior = marg.marginalize_old(cfg, gt, vis, imu, slv.empty_prior(gt.P.dtype), gvec)
    x1 = marg.shift_state_old(gt)
    prior2 = marg.marginalize_new(cfg, x1, prior)
    assert bool(prior2.valid)
    # the new prior carries no direct info on the (empty) newest slot
    J = np.asarray(prior2.J)
    from vins_rgbd_fast_tpu.backend.state import POSE_DIM, WINDOW_SIZE, NP, SB_DIM
    last_pose_cols = J[:, POSE_DIM * WINDOW_SIZE:POSE_DIM * (WINDOW_SIZE + 1)]
    np.testing.assert_allclose(last_pose_cols, 0.0, atol=1e-10)
    # info on the remaining frames is preserved (nonzero)
    assert np.abs(J[:, :POSE_DIM * WINDOW_SIZE]).max() > 1e-3


def test_relo_remap_by_feature_id():
    """Relo observations are keyed by FEATURE ID: rows recycled between
    keyframe export and relo injection must re-bind to wherever the id
    lives in the CURRENT table — and ids that left the table drop out
    (reference matches by id, estimator.cpp:1307-1346)."""
    import jax.numpy as jnp

    from vins_rgbd_fast_tpu.ops import solver as slv

    maxf = 6
    pts = np.zeros((maxf, 2))
    pts[0] = (0.5, 0.5)   # id 5
    pts[1] = (0.9, -0.1)  # id 9
    pts[2] = (0.7, 0.7)   # id 7 (will have left the table)
    relo = slv.ReloData(
        active=jnp.asarray(True),
        match_pts=jnp.asarray(pts),
        match_valid=jnp.asarray([True, True, True, False, False, False]),
        match_ids=jnp.asarray([5, 9, 7, -1, -1, -1], jnp.int32),
        P=jnp.zeros(3), Q=jnp.asarray([1.0, 0, 0, 0]),
    )
    # table since export: id 5 moved row 0 -> 2, id 9 -> row 0, id 7 gone,
    # row 1 recycled to a NEW feature id 12 (must NOT inherit id 7's obs)
    table_ids = jnp.asarray([9, 12, 5, -1, 3, -1], jnp.int32)
    out = slv.remap_relo_by_id(relo, table_ids)
    valid = np.asarray(out.match_valid)
    np.testing.assert_array_equal(valid, [True, False, True, False, False, False])
    np.testing.assert_allclose(np.asarray(out.match_pts)[0], (0.9, -0.1))
    np.testing.assert_allclose(np.asarray(out.match_pts)[2], (0.5, 0.5))
    np.testing.assert_allclose(np.asarray(out.match_pts)[1], (0.0, 0.0))
    ids = np.asarray(out.match_ids)
    assert ids[0] == 9 and ids[2] == 5 and ids[1] == -1
