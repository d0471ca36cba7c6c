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
from ..ops import imu_preintegration as imupre
from .state import FRAMES, WINDOW_SIZE


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
        A = jax.lax.dynamic_update_slice(
            A, jax.lax.dynamic_slice(A, (s, n_state - 3), (6, 3)) + rA[:6, 6:],
            (s, n_state - 3))
        A = jax.lax.dynamic_update_slice(
            A, jax.lax.dynamic_slice(A, (n_state - 3, s), (3, 6)) + rA[6:, :6],
            (n_state - 3, s))
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
            A = jax.lax.dynamic_update_slice(
                A, jax.lax.dynamic_slice(A, (s, n_state - 2), (6, 2)) + rA[:6, 6:],
                (s, n_state - 2))
            A = jax.lax.dynamic_update_slice(
                A, jax.lax.dynamic_slice(A, (n_state - 2, s), (2, 6)) + rA[6:, :6],
                (n_state - 2, s))
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
