"""Sliding-window state: pytree, tangent-space layout, retraction.

The reference scatters window state across raw C arrays
(``para_Pose[11][7]``, ``para_SpeedBias[11][9]``, ``para_Ex_Pose``,
``para_Td``) converted back and forth by ``vector2double``/``double2vector``
(``/root/reference/vins_estimator/src/estimator/estimator.cpp:936-1111``).
Here the window is one immutable pytree with a *fixed global tangent
layout* used by the batched LM solver, the marginalization prior, and the
gauge fix:

    [ pose 0..10  : 6 each  ->   0..66   (δp, δθ) ]
    [ sb   0..10  : 9 each  ->  66..165  (δv, δba, δbg) ]
    [ extrinsic   : 6       -> 165..171 ]
    [ td          : 1       -> 171..172 ]
    [ inv-depths  : MAXF    -> 172..172+MAXF ]  (landmark tail, solver-only)

Window size is the reference's compile-time WINDOW_SIZE=10 (+1 slots,
``parameters.h:12``); everything here is shape-static for XLA.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import quaternion as quat

# Compile-time layout (reference parameters.h:11-14)
WINDOW_SIZE = 10
FRAMES = WINDOW_SIZE + 1
POSE_DIM = 6
SB_DIM = 9
NP = FRAMES * POSE_DIM  # 66
NSB = FRAMES * SB_DIM  # 99
EX_OFF = NP + NSB  # 165
TD_OFF = EX_OFF + 6  # 171
NX = TD_OFF + 1  # 172 pose-side tangent dims


class WindowState(NamedTuple):
    """All optimizable state of the sliding window."""

    P: jax.Array  # (FRAMES, 3) world positions of IMU frame
    Q: jax.Array  # (FRAMES, 4) world-from-imu quaternions (wxyz)
    V: jax.Array  # (FRAMES, 3) world velocities
    Ba: jax.Array  # (FRAMES, 3) accel biases
    Bg: jax.Array  # (FRAMES, 3) gyro biases
    tic: jax.Array  # (3,) imu<-cam translation
    qic: jax.Array  # (4,) imu<-cam rotation
    td: jax.Array  # () camera-imu time offset


def identity_state(dtype=jnp.float32) -> WindowState:
    return WindowState(
        P=jnp.zeros((FRAMES, 3), dtype),
        Q=jnp.tile(quat.q_identity(dtype), (FRAMES, 1)),
        V=jnp.zeros((FRAMES, 3), dtype),
        Ba=jnp.zeros((FRAMES, 3), dtype),
        Bg=jnp.zeros((FRAMES, 3), dtype),
        tic=jnp.zeros(3, dtype),
        qic=quat.q_identity(dtype),
        td=jnp.zeros((), dtype),
    )


def pose_offset(i) -> jax.Array:
    return POSE_DIM * i


def sb_offset(i) -> jax.Array:
    return NP + SB_DIM * i


def boxplus(x: WindowState, dx: jax.Array) -> WindowState:
    """Retract a 172-dim tangent step onto the window state.

    Rotations use the reference's quaternion box-plus
    (``pose_local_parameterization.cpp:3-18``); everything else is additive.
    """
    dpose = dx[:NP].reshape(FRAMES, POSE_DIM)
    dsb = dx[NP:EX_OFF].reshape(FRAMES, SB_DIM)
    return WindowState(
        P=x.P + dpose[:, 0:3],
        Q=quat.qboxplus(x.Q, dpose[:, 3:6]),
        V=x.V + dsb[:, 0:3],
        Ba=x.Ba + dsb[:, 3:6],
        Bg=x.Bg + dsb[:, 6:9],
        tic=x.tic + dx[EX_OFF:EX_OFF + 3],
        qic=quat.qboxplus(x.qic, dx[EX_OFF + 3:EX_OFF + 6]),
        td=x.td + dx[TD_OFF],
    )


def boxminus(x: WindowState, x0: WindowState) -> jax.Array:
    """172-dim tangent difference x ⊟ x0 used by the marginalization prior
    replay (same local difference as ``marginalization_factor.cpp:353-415``:
    additive for vectors, 2·vec(q0⁻¹ ⊗ q) for rotations, sign-fixed)."""

    def qdiff(q, q0):
        d = quat.qmul(quat.qconj(q0), q)
        d = quat.qpositify(d)
        return 2.0 * d[..., 1:4]

    dpose = jnp.concatenate([x.P - x0.P, qdiff(x.Q, x0.Q)], axis=-1)  # (F,6)
    dsb = jnp.concatenate([x.V - x0.V, x.Ba - x0.Ba, x.Bg - x0.Bg], axis=-1)  # (F,9)
    dex = jnp.concatenate([x.tic - x0.tic, qdiff(x.qic, x0.qic)])
    return jnp.concatenate(
        [dpose.reshape(-1), dsb.reshape(-1), dex, (x.td - x0.td)[None]]
    )


def yaw_gauge_fix(x_opt: WindowState, x_before: WindowState) -> WindowState:
    """Re-anchor the optimized window so frame 0 keeps its pre-optimization
    yaw and position (the unobservable gauge directions under IMU), the
    capability of the reference's ``double2vector`` yaw alignment
    (``estimator.cpp:985-1033``)."""
    ypr0 = quat.R2ypr(quat.q2R(x_before.Q[0]))
    ypr1 = quat.R2ypr(quat.q2R(x_opt.Q[0]))
    y_diff = ypr0[0] - ypr1[0]
    # near-singular pitch: fall back to full R0 Ropt⁻¹ like the reference
    singular = jnp.logical_or(jnp.abs(ypr1[1]) > 89.0, jnp.abs(ypr0[1]) > 89.0)
    rot_yaw = quat.yaw_R(y_diff)
    rot_full = jnp.matmul(quat.q2R(x_before.Q[0]), quat.q2R(x_opt.Q[0]).T)
    rot = jnp.where(singular, rot_full, rot_yaw)
    q_rot = quat.R2q(rot)

    P0 = x_opt.P[0]
    newP = quat.qrot(q_rot[None], x_opt.P - P0[None]) + x_before.P[0][None]
    newQ = quat.qnormalize(quat.qmul(q_rot[None], x_opt.Q))
    newV = quat.qrot(q_rot[None], x_opt.V)
    return x_opt._replace(P=newP, Q=newQ, V=newV)
