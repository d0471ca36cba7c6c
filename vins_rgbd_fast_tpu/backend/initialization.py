"""Initialization layer (L4): gravity/bias bootstrap + visual-inertial
alignment.

Covers the reference's three init paths (``estimator.cpp:229-317``,
SURVEY §3.3):
  A. dynamic VINS-Mono-style SFM alignment (``visualInitialAlignWithDepth``)
  B. depth+static init (realsense default): triangulate-with-depth each
     frame, then gyro-bias least squares + full-window optimization
  C. VO mode: PnP per frame + optimization

This module provides the *pure math* pieces; orchestration lives in
``backend.estimator``:
  * ``init_first_imu_pose``   — gravity-aligned initial attitude from the
    averaged accelerometer (``estimator.cpp:1890-1915``)
  * ``solve_gyroscope_bias``  — least squares on preintegrated Δq vs frame
    rotations (``initial_aligment.cpp:3-36``)
  * ``linear_alignment_with_depth`` — per-frame velocities + gravity (no
    scale: depth provides metric scale; ``initial_aligment.cpp:337-405``)
  * ``refine_gravity_with_depth`` — 2-dof tangent refinement, 4 iterations
    (``initial_aligment.cpp:170-244``)
  * ``imu_excitation_ok``     — stddev-of-Δv/Δt motion check
    (``estimator.cpp:387-420``)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..utils import quaternion as quat
from .state import FRAMES, WINDOW_SIZE


def decompose_essential(E: jax.Array, pts1: jax.Array, pts2: jax.Array,
                        valid: jax.Array):
    """Essential matrix -> relative rotation with cheirality test.

    The reference reimplements cv::decomposeEssentialMat/recoverPose with
    cheirality checks (``solve_5pts.cpp:9-202``); here the four (R, t)
    candidates are scored by positive-depth counts from midpoint
    triangulation, all candidates evaluated in parallel.

    Convention: x2 ~ R·x1 + t (cam2 from cam1).  Returns (R, t, score).
    """
    dtype = E.dtype
    U, S, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t1 = U[:, 2]

    def depth_score(R, t):
        # midpoint triangulation depths for rays (x1, 1) and (x2, 1)
        r1 = jnp.concatenate([pts1, jnp.ones_like(pts1[:, :1])], axis=-1)
        r2 = jnp.concatenate([pts2, jnp.ones_like(pts2[:, :1])], axis=-1)
        Rr1 = r1 @ R.T  # rays of cam1 in cam2 frame
        # solve [Rr1, -r2] [d1; d2] = -t per point (least squares 3x2)
        A = jnp.stack([Rr1, -r2], axis=-1)  # (N,3,2)
        AtA = jnp.einsum("nia,nib->nab", A, A)
        Atb = jnp.einsum("nia,ni->na", A, -jnp.broadcast_to(t, r1.shape))
        det = AtA[:, 0, 0] * AtA[:, 1, 1] - AtA[:, 0, 1] * AtA[:, 1, 0]
        inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
        d1 = inv_det * (AtA[:, 1, 1] * Atb[:, 0] - AtA[:, 0, 1] * Atb[:, 1])
        d2 = inv_det * (-AtA[:, 1, 0] * Atb[:, 0] + AtA[:, 0, 0] * Atb[:, 1])
        return jnp.sum(((d1 > 0) & (d2 > 0) & valid).astype(dtype))

    cands = [(R1, t1), (R1, -t1), (R2, t1), (R2, -t1)]
    scores = jnp.stack([depth_score(R, t) for (R, t) in cands])
    best = jnp.argmax(scores)
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    return Rs[best], ts[best], scores[best]


def calibrate_extrinsic_rotation(
    q_cam: jax.Array,  # (K,4) camera relative rotations frame k-1 -> k
    q_imu: jax.Array,  # (K,4) imu preintegrated Δq for the same intervals
    ric_guess: jax.Array,  # (3,3) current estimate (for the Huber weighting)
    valid: jax.Array,  # (K,)
):
    """Hand-eye rotation from rotation pairs (``InitialEXRotation::
    CalibrationExRotation``, initial_ex_rotation.cpp:12-68): stack
    Huber-weighted (Qleft(q_cam) − Qright(ric⁻¹·q_imu·ric)) blocks and take
    the null quaternion; convergence when the residual spectrum separates.

    Returns (ric (3,3), ok).  The Huber weights depend on the current
    estimate, so the solve iterates a few rounds internally (the reference
    achieves the same by re-running per frame with the updated ric)."""
    dtype = q_cam.dtype
    L = quat.qleft(q_cam)  # (K,4,4)
    Rm = quat.qright(q_imu)

    def solve_round(q_guess):
        q_imu_c = quat.qmul(
            quat.qconj(q_guess)[None], quat.qmul(q_imu, q_guess[None]))
        dq = quat.qmul(quat.qconj(q_cam), q_imu_c)
        ang = jnp.degrees(jnp.linalg.norm(quat.so3_log(dq), axis=-1))
        w = jnp.where(ang > 5.0, 5.0 / jnp.maximum(ang, 1e-9), 1.0)
        w = w * valid.astype(dtype)
        A = (L - Rm) * w[:, None, None]
        M = jnp.einsum("kia,kib->ab", A, A)
        Mj = M + (1e-9 * jnp.trace(M) + 1e-20) * jnp.eye(4, dtype=dtype)
        Lc = jnp.linalg.cholesky(Mj)
        v = jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype)
        for _ in range(10):
            v = jax.scipy.linalg.cho_solve((Lc, True), v)
            v = v / jnp.maximum(jnp.linalg.norm(v), 1e-30)
        q_ic = quat.qnormalize(v)
        evals = jnp.linalg.eigvalsh(M)
        return quat.qconj(q_ic), evals[1]

    q_guess = quat.R2q(ric_guess)
    ev1 = jnp.zeros((), dtype)
    for _ in range(3):
        q_guess, ev1 = solve_round(q_guess)
    # reference threshold is on the stacked-A *singular* values (0.25,
    # initial_ex_rotation.cpp:58-64); ev1 is an eigenvalue of A'A = sigma^2
    ok = (jnp.sum(valid) >= 10) & (jnp.sqrt(jnp.maximum(ev1, 0.0)) > 0.25)
    return quat.q2R(q_guess), ok


def init_first_imu_pose(accs: jax.Array, valid: jax.Array) -> jax.Array:
    """Initial world-from-body quaternion aligning averaged measured
    acceleration with gravity, yaw-zeroed."""
    n = jnp.maximum(jnp.sum(valid), 1)
    aver = jnp.sum(accs * valid[:, None], axis=0) / n
    R0 = quat.g2R(aver)
    return quat.R2q(R0)


def solve_gyroscope_bias(
    dq_pre: jax.Array,  # (W, 4) preintegrated Δq per interval (at bg=bg_lin)
    J_q_bg: jax.Array,  # (W, 3, 3) ∂δθ/∂bg blocks of each preintegration
    Q: jax.Array,  # (FRAMES, 4) frame rotations (world-from-imu)
    valid: jax.Array,  # (W,) interval validity
) -> jax.Array:
    """Least-squares Δbg such that Δq(bg+Δbg) matches the frame rotations
    (``solveGyroscopeBias``).  Returns the bias *increment*."""
    q_ij = quat.qmul(quat.qconj(Q[:-1]), Q[1:])  # (W,4)
    resid = 2.0 * quat.qmul(quat.qconj(dq_pre), q_ij)[:, 1:4]  # (W,3)
    w = valid.astype(dq_pre.dtype)[:, None, None]
    A = jnp.sum(w * jnp.einsum("wij,wik->wjk", J_q_bg, J_q_bg), axis=0)
    b = jnp.sum(
        valid.astype(dq_pre.dtype)[:, None]
        * jnp.einsum("wij,wi->wj", J_q_bg, resid), axis=0
    )
    A = A + 1e-10 * jnp.eye(3, dtype=A.dtype)
    return jnp.linalg.solve(A, b)


def imu_excitation_ok(
    dv: jax.Array,  # (W,3) preintegrated Δv per interval
    sum_dt: jax.Array,  # (W,)
    valid: jax.Array,
    threshold: float = 0.25,
) -> jax.Array:
    """Variance-of-acceleration excitation test (``estimator.cpp:387-420``):
    init needs enough motion; returns True when std(Δv/Δt) > threshold."""
    n = jnp.maximum(jnp.sum(valid), 1)
    a = dv / jnp.maximum(sum_dt, 1e-6)[:, None]
    mean = jnp.sum(a * valid[:, None], axis=0) / n
    var = jnp.sum(jnp.sum((a - mean) ** 2, axis=-1) * valid) / n
    return jnp.sqrt(var) > threshold


def linear_alignment_with_depth(
    dp: jax.Array,  # (W,3) preintegrated Δp
    dv: jax.Array,  # (W,3) preintegrated Δv
    sum_dt: jax.Array,  # (W,)
    P: jax.Array,  # (FRAMES,3) frame positions (visual, metric via depth)
    Q: jax.Array,  # (FRAMES,4) frame rotations
    tic: jax.Array,  # (3,)
    valid: jax.Array,  # (W,)
    g_norm: float,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Solve per-frame velocities + gravity, no scale (depth gives metric
    scale) — dense fixed-shape port of ``LinearAlignmentWithDepth``.

    Returns (velocities (FRAMES,3) in the c0/body-ref frame convention of
    the solve, gravity (3,), ok flag)."""
    dtype = dp.dtype
    n_state = FRAMES * 3 + 3
    R = quat.q2R(Q)  # (F,3,3)

    A = jnp.zeros((n_state, n_state), dtype)
    b = jnp.zeros((n_state,), dtype)
    I3 = jnp.eye(3, dtype=dtype)

    def body(carry, i):
        A, b = carry
        dt = sum_dt[i]
        Ri = R[i]
        Rj = R[i + 1]
        RiT = Ri.T
        # rows: [Δp residual (3); Δv residual (3)]
        # cols: [v_i (3) | v_j (3) | g (3)]
        tA = jnp.zeros((6, 9), dtype)
        tA = tA.at[0:3, 0:3].set(-dt * I3)
        tA = tA.at[0:3, 6:9].set(RiT * (dt * dt / 2.0))
        tb0 = dp[i] + RiT @ Rj @ tic - tic - RiT @ (P[i + 1] - P[i])
        tA = tA.at[3:6, 0:3].set(-I3)
        tA = tA.at[3:6, 3:6].set(RiT @ Rj)
        tA = tA.at[3:6, 6:9].set(RiT * dt)
        tb = jnp.concatenate([tb0, dv[i]])
        w = valid[i].astype(dtype)
        rA = (tA.T @ tA) * w
        rb = (tA.T @ tb) * w
        # scatter into the global system
        s = 3 * i
        A = jax.lax.dynamic_update_slice(
            A, jax.lax.dynamic_slice(A, (s, s), (6, 6)) + rA[:6, :6], (s, s))
        b = jax.lax.dynamic_update_slice(
            b, jax.lax.dynamic_slice(b, (s,), (6,)) + rb[:6], (s,))
        A = A.at[n_state - 3:, n_state - 3:].add(rA[6:, 6:])
        b = b.at[n_state - 3:].add(rb[6:])
        c3 = jnp.asarray(n_state - 3, jnp.int32)
        A = jax.lax.dynamic_update_slice(
            A, jax.lax.dynamic_slice(A, (s, c3), (6, 3)) + rA[:6, 6:], (s, c3))
        A = jax.lax.dynamic_update_slice(
            A, jax.lax.dynamic_slice(A, (c3, s), (3, 6)) + rA[6:, :6], (c3, s))
        return (A, b), None

    (A, b), _ = jax.lax.scan(body, (A, b), jnp.arange(WINDOW_SIZE, dtype=jnp.int32))
    A = A * 1000.0
    b = b * 1000.0
    # unconstrained velocity blocks of invalid intervals: regularize
    A = A + 1e-8 * jnp.eye(n_state, dtype=dtype)
    x = jnp.linalg.solve(A, b)
    g = x[n_state - 3:]
    ok = jnp.abs(jnp.linalg.norm(g) - g_norm) < 1.0
    g, x = refine_gravity_with_depth(dp, dv, sum_dt, P, Q, tic, valid, g, g_norm)
    V = x[: FRAMES * 3].reshape(FRAMES, 3)
    return V, g, ok


def linear_alignment(
    dp: jax.Array,  # (W,3) preintegrated Δp
    dv: jax.Array,  # (W,3) preintegrated Δv
    sum_dt: jax.Array,  # (W,)
    P: jax.Array,  # (FRAMES,3) SFM camera positions (arbitrary scale!)
    Q: jax.Array,  # (FRAMES,4) frame rotations (world-from-imu)
    tic: jax.Array,  # (3,)
    valid: jax.Array,  # (W,)
    g_norm: float,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Monocular visual-inertial alignment WITH metric scale — the
    reference's legacy scale-solving ``LinearAlignment`` + ``RefineGravity``
    (``initial_aligment.cpp:94-168, 246-324``): solves per-frame body
    velocities, gravity in the SFM frame, and the scale s mapping SFM
    positions to meters.

    Returns (velocities (FRAMES,3) body-frame, gravity (3,), scale (),
    ok flag).  ok requires ‖g‖ close to g_norm and s > 0."""
    dtype = dp.dtype
    n_state = FRAMES * 3 + 3 + 1
    R = quat.q2R(Q)
    I3 = jnp.eye(3, dtype=dtype)

    def build(carry, i):
        A, b = carry
        dt = sum_dt[i]
        RiT = R[i].T
        # rows: [Δp (3); Δv (3)]; cols: [v_i | v_j | g | s]
        tA = jnp.zeros((6, 10), dtype)
        tA = tA.at[0:3, 0:3].set(-dt * I3)
        tA = tA.at[0:3, 6:9].set(RiT * (dt * dt / 2.0))
        tA = tA.at[0:3, 9].set(RiT @ (P[i + 1] - P[i]) / 100.0)
        tb0 = dp[i] + RiT @ R[i + 1] @ tic - tic
        tA = tA.at[3:6, 0:3].set(-I3)
        tA = tA.at[3:6, 3:6].set(RiT @ R[i + 1])
        tA = tA.at[3:6, 6:9].set(RiT * dt)
        tb = jnp.concatenate([tb0, dv[i]])
        w = valid[i].astype(dtype)
        rA = (tA.T @ tA) * w
        rb = (tA.T @ tb) * w
        s = 3 * i
        # velocity block (6x6 at s), tail block (g+s, 4x4), couplings
        A = jax.lax.dynamic_update_slice(
            A, jax.lax.dynamic_slice(A, (s, s), (6, 6)) + rA[:6, :6], (s, s))
        b = jax.lax.dynamic_update_slice(
            b, jax.lax.dynamic_slice(b, (s,), (6,)) + rb[:6], (s,))
        A = A.at[n_state - 4:, n_state - 4:].add(rA[6:, 6:])
        b = b.at[n_state - 4:].add(rb[6:])
        c4 = jnp.asarray(n_state - 4, jnp.int32)
        A = jax.lax.dynamic_update_slice(
            A, jax.lax.dynamic_slice(A, (s, c4), (6, 4)) + rA[:6, 6:], (s, c4))
        A = jax.lax.dynamic_update_slice(
            A, jax.lax.dynamic_slice(A, (c4, s), (4, 6)) + rA[6:, :6], (c4, s))
        return (A, b), None

    A0 = jnp.zeros((n_state, n_state), dtype)
    b0 = jnp.zeros((n_state,), dtype)
    (A, b), _ = jax.lax.scan(build, (A0, b0), jnp.arange(WINDOW_SIZE, dtype=jnp.int32))
    A = A * 1000.0 + 1e-8 * jnp.eye(n_state, dtype=dtype)
    b = b * 1000.0
    x = jnp.linalg.solve(A, b)
    s = x[n_state - 1] / 100.0
    g = x[n_state - 4:n_state - 1]
    ok = (jnp.abs(jnp.linalg.norm(g) - g_norm) < 1.0) & (s > 0)
    g, x = _refine_gravity_scale(dp, dv, sum_dt, P, Q, tic, valid, g, g_norm)
    s = x[-1] / 100.0
    ok = ok & (s > 0)
    V = x[: FRAMES * 3].reshape(FRAMES, 3)
    return V, g, s, ok


def _refine_gravity_scale(dp, dv, sum_dt, P, Q, tic, valid, g0, g_norm,
                          iters: int = 4):
    """Gravity tangent refinement keeping the scale variable
    (``RefineGravity``, initial_aligment.cpp:246-324)."""
    dtype = dp.dtype
    n_state = FRAMES * 3 + 2 + 1
    R = quat.q2R(Q)
    I3 = jnp.eye(3, dtype=dtype)

    def tangent_basis(g):
        a = g / jnp.linalg.norm(g)
        tmp = jnp.asarray([0.0, 0.0, 1.0], dtype)
        tmp = jnp.where(jnp.abs(a[2]) > 0.99, jnp.asarray([1.0, 0.0, 0.0], dtype), tmp)
        b1 = tmp - a * jnp.dot(a, tmp)
        b1 = b1 / jnp.linalg.norm(b1)
        b2 = jnp.cross(a, b1)
        return jnp.stack([b1, b2], axis=1)  # (3,2)

    def one_iter(g, _):
        g0u = g / jnp.linalg.norm(g) * g_norm
        lxly = tangent_basis(g0u)

        def body(carry, i):
            A, b = carry
            dt = sum_dt[i]
            RiT = R[i].T
            tA = jnp.zeros((6, 9), dtype)
            tA = tA.at[0:3, 0:3].set(-dt * I3)
            tA = tA.at[0:3, 6:8].set(RiT @ lxly * (dt * dt / 2.0))
            tA = tA.at[0:3, 8].set(RiT @ (P[i + 1] - P[i]) / 100.0)
            tb0 = (dp[i] + RiT @ R[i + 1] @ tic - tic
                   - RiT @ g0u * (dt * dt / 2.0))
            tA = tA.at[3:6, 0:3].set(-I3)
            tA = tA.at[3:6, 3:6].set(RiT @ R[i + 1])
            tA = tA.at[3:6, 6:8].set(RiT @ lxly * dt)
            tb1 = dv[i] - RiT @ g0u * dt
            tb = jnp.concatenate([tb0, tb1])
            w = valid[i].astype(dtype)
            rA = (tA.T @ tA) * w
            rb = (tA.T @ tb) * w
            s = 3 * i
            A = jax.lax.dynamic_update_slice(
                A, jax.lax.dynamic_slice(A, (s, s), (6, 6)) + rA[:6, :6], (s, s))
            b = jax.lax.dynamic_update_slice(
                b, jax.lax.dynamic_slice(b, (s,), (6,)) + rb[:6], (s,))
            A = A.at[n_state - 3:, n_state - 3:].add(rA[6:, 6:])
            b = b.at[n_state - 3:].add(rb[6:])
            c3 = jnp.asarray(n_state - 3, jnp.int32)
            A = jax.lax.dynamic_update_slice(
                A, jax.lax.dynamic_slice(A, (s, c3), (6, 3)) + rA[:6, 6:], (s, c3))
            A = jax.lax.dynamic_update_slice(
                A, jax.lax.dynamic_slice(A, (c3, s), (3, 6)) + rA[6:, :6], (c3, s))
            return (A, b), None

        A0 = jnp.zeros((n_state, n_state), dtype)
        b0 = jnp.zeros((n_state,), dtype)
        (A, b), _ = jax.lax.scan(body, (A0, b0), jnp.arange(WINDOW_SIZE, dtype=jnp.int32))
        A = A * 1000.0 + 1e-8 * jnp.eye(n_state, dtype=dtype)
        b = b * 1000.0
        x = jnp.linalg.solve(A, b)
        dg = x[n_state - 3:n_state - 1]
        g_new = g0u + lxly @ dg
        return g_new, x

    g, xs = jax.lax.scan(one_iter, g0, None, length=iters)
    x_last = jax.tree.map(lambda a: a[-1], xs)
    return g, x_last


def refine_gravity_with_depth(
    dp, dv, sum_dt, P, Q, tic, valid, g0, g_norm,
    iters: int = 4,
):
    """Refine gravity on its 2-dof tangent at fixed magnitude
    (``RefineGravityWithDepth``, ``initial_aligment.cpp:170-244``)."""
    dtype = dp.dtype
    n_state = FRAMES * 3 + 2
    R = quat.q2R(Q)
    I3 = jnp.eye(3, dtype=dtype)

    def tangent_basis(g):
        a = g / jnp.linalg.norm(g)
        tmp = jnp.asarray([0.0, 0.0, 1.0], dtype)
        tmp = jnp.where(jnp.abs(a[2]) > 0.99, jnp.asarray([1.0, 0.0, 0.0], dtype), tmp)
        b1 = tmp - a * jnp.dot(a, tmp)
        b1 = b1 / jnp.linalg.norm(b1)
        b2 = jnp.cross(a, b1)
        return jnp.stack([b1, b2], axis=1)  # (3,2)

    def one_iter(g, _):
        g0u = g / jnp.linalg.norm(g) * g_norm
        lxly = tangent_basis(g0u)
        A = jnp.zeros((n_state, n_state), dtype)
        b = jnp.zeros((n_state,), dtype)

        def body(carry, i):
            A, b = carry
            dt = sum_dt[i]
            RiT = R[i].T
            tA = jnp.zeros((6, 8), dtype)
            tA = tA.at[0:3, 0:3].set(-dt * I3)
            tA = tA.at[0:3, 6:8].set(RiT @ lxly * (dt * dt / 2.0))
            tb0 = (
                dp[i] + RiT @ R[i + 1] @ tic - tic
                - RiT @ (P[i + 1] - P[i]) - RiT @ g0u * (dt * dt / 2.0)
            )
            tA = tA.at[3:6, 0:3].set(-I3)
            tA = tA.at[3:6, 3:6].set(RiT @ R[i + 1])
            tA = tA.at[3:6, 6:8].set(RiT @ lxly * dt)
            tb1 = dv[i] - RiT @ g0u * dt
            tb = jnp.concatenate([tb0, tb1])
            w = valid[i].astype(dtype)
            rA = (tA.T @ tA) * w
            rb = (tA.T @ tb) * w
            s = 3 * i
            A = jax.lax.dynamic_update_slice(
                A, jax.lax.dynamic_slice(A, (s, s), (6, 6)) + rA[:6, :6], (s, s))
            b = jax.lax.dynamic_update_slice(
                b, jax.lax.dynamic_slice(b, (s,), (6,)) + rb[:6], (s,))
            A = A.at[n_state - 2:, n_state - 2:].add(rA[6:, 6:])
            b = b.at[n_state - 2:].add(rb[6:])
            c2 = jnp.asarray(n_state - 2, jnp.int32)
            A = jax.lax.dynamic_update_slice(
                A, jax.lax.dynamic_slice(A, (s, c2), (6, 2)) + rA[:6, 6:], (s, c2))
            A = jax.lax.dynamic_update_slice(
                A, jax.lax.dynamic_slice(A, (c2, s), (2, 6)) + rA[6:, :6], (c2, s))
            return (A, b), None

        (A, b), _ = jax.lax.scan(body, (A, b), jnp.arange(WINDOW_SIZE, dtype=jnp.int32))
        A = A * 1000.0 + 1e-8 * jnp.eye(n_state, dtype=dtype)
        b = b * 1000.0
        x = jnp.linalg.solve(A, b)
        dg = x[n_state - 2:]
        g_new = g0u + lxly @ dg
        return g_new, x

    g, x = jax.lax.scan(one_iter, g0, None, length=iters)
    # x from the scan is stacked; take the last iteration's solution
    x_last = jax.tree.map(lambda a: a[-1], x)
    # rebuild full (FRAMES*3+3) style vector: velocities + final g
    V = x_last[: FRAMES * 3]
    return g, jnp.concatenate([V, g])
