"""Factor library (layer L3): residuals + tangent-space Jacobians.

Covers the reference's Ceres cost functions —
``IMUFactor`` (15-dim preintegration residual,
``/root/reference/vins_estimator/src/factor/imu_factor.h:63-202``),
``ProjectionFactor`` (2-dim normalized-plane reprojection,
``projection_factor.cpp:22-130``) and ``ProjectionTdFactor`` (adds time
offset + rolling-shutter row compensation, ``projection_td_factor.cpp:34-120``)
— as pure residual functions on *retracted* states.

TPU-native design: instead of hand-coded analytic Jacobian blocks, each
residual is differentiated with ``jax.jacfwd`` through the box-plus
retraction at δ=0, which yields exactly the minimal-coordinate Jacobians a
marginalizing Gauss-Newton solver needs (the reference itself ships a
finite-difference checker for its analytic forms, ``projection_factor.cpp:
132-234`` — our tests FD-check the autodiff output the same way).  All
factors of a type evaluate as one ``vmap`` batch feeding a single MXU
Gram-matrix contraction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import quaternion as quat
from . import imu_preintegration as imupre

# Whitening used by the reference for visual factors: sqrt_info = F/1.5 · I
# (estimator.cpp:23-24 with FOCAL_LENGTH=460).
FOCAL_LENGTH = 460.0
PROJ_SQRT_INFO = FOCAL_LENGTH / 1.5


class ProjMeas(NamedTuple):
    """One reprojection measurement pair (first observation i -> frame j)."""

    pts_i: jax.Array  # (3,) normalized-plane obs in frame i (z=1)
    pts_j: jax.Array  # (3,)
    vel_i: jax.Array  # (3,) normalized-plane velocity (z component 0)
    vel_j: jax.Array  # (3,)
    td_i: jax.Array  # () per-obs td snapshot
    td_j: jax.Array  # ()
    row_i: jax.Array  # () image row (for rolling shutter), pre-scaled: TR/ROW·row
    row_j: jax.Array  # ()


def projection_residual(
    Pi, Qi, Pj, Qj, tic, qic, inv_dep_i, td, meas: ProjMeas
) -> jax.Array:
    """Whitened 2-dim reprojection residual with time-offset compensation.

    With vel=0 and td terms zeroed this reduces exactly to the plain
    ``ProjectionFactor``; otherwise it is the ``ProjectionTdFactor`` model
    ``pts - (td - td_obs + TR/ROW·row)·velocity``.
    """
    pts_i_td = meas.pts_i - (td - meas.td_i + meas.row_i) * meas.vel_i
    pts_j_td = meas.pts_j - (td - meas.td_j + meas.row_j) * meas.vel_j
    pts_cam_i = pts_i_td / inv_dep_i
    pts_imu_i = quat.qrot(qic, pts_cam_i) + tic
    pts_w = quat.qrot(Qi, pts_imu_i) + Pi
    pts_imu_j = quat.qrot_inv(Qj, pts_w - Pj)
    pts_cam_j = quat.qrot_inv(qic, pts_imu_j - tic)
    dep_j = pts_cam_j[2]
    r = pts_cam_j[:2] / dep_j - pts_j_td[:2]
    return PROJ_SQRT_INFO * r


# Tangent block layout of one projection factor:
#   δ = [pose_i(6), pose_j(6), ex(6), inv_dep(1), td(1)]  -> 20 dims
PROJ_TANGENT = 20


def projection_residual_retracted(dx, Pi, Qi, Pj, Qj, tic, qic, inv_dep_i, td, meas):
    return projection_residual(
        Pi + dx[0:3], quat.qboxplus(Qi, dx[3:6]),
        Pj + dx[6:9], quat.qboxplus(Qj, dx[9:12]),
        tic + dx[12:15], quat.qboxplus(qic, dx[15:18]),
        inv_dep_i + dx[18], td + dx[19], meas,
    )


def projection_factor(Pi, Qi, Pj, Qj, tic, qic, inv_dep_i, td, meas: ProjMeas):
    """Returns (residual (2,), J (2,20)) at the current state."""
    zeros = jnp.zeros(PROJ_TANGENT, dtype=Pi.dtype)
    r = projection_residual_retracted(zeros, Pi, Qi, Pj, Qj, tic, qic, inv_dep_i, td, meas)
    J = jax.jacfwd(projection_residual_retracted)(
        zeros, Pi, Qi, Pj, Qj, tic, qic, inv_dep_i, td, meas
    )
    return r, J


def cauchy_weight(r: jax.Array, c: float = 1.0) -> jax.Array:
    """IRLS row weight sqrt(ρ'(s)) for Ceres-style CauchyLoss(c), ρ(s)=c²·log(1+s/c²).

    Applied to the visual factors exactly where the reference attaches its
    robust loss (``estimator.cpp:1167,1277-1336``)."""
    s = jnp.sum(r * r, axis=-1, keepdims=True)
    return jnp.sqrt(1.0 / (1.0 + s / (c * c)))


# ---------------------------------------------------------------------------
# IMU factor
# ---------------------------------------------------------------------------

# δ = [pose_i(6), sb_i(9), pose_j(6), sb_j(9)] -> 30 dims
IMU_TANGENT = 30


def imu_residual_retracted(dx, pre, Pi, Qi, Vi, Bai, Bgi, Pj, Qj, Vj, Baj, Bgj, gravity, sqrt_info):
    r = imupre.evaluate(
        pre,
        Pi + dx[0:3], quat.qboxplus(Qi, dx[3:6]),
        Vi + dx[6:9], Bai + dx[9:12], Bgi + dx[12:15],
        Pj + dx[15:18], quat.qboxplus(Qj, dx[18:21]),
        Vj + dx[21:24], Baj + dx[24:27], Bgj + dx[27:30],
        gravity,
    )
    return sqrt_info @ r


def imu_factor(pre: imupre.Preintegrated, Pi, Qi, Vi, Bai, Bgi, Pj, Qj, Vj, Baj, Bgj, gravity):
    """Returns (whitened residual (15,), J (15,30)).

    Whitening via the preintegration covariance sqrt-information, as the
    reference's ``IMUFactor::Evaluate`` (``imu_factor.h:63-71``)."""
    sqrt_info = imupre.sqrt_information(pre)
    zeros = jnp.zeros(IMU_TANGENT, dtype=Pi.dtype)
    args = (pre, Pi, Qi, Vi, Bai, Bgi, Pj, Qj, Vj, Baj, Bgj, gravity, sqrt_info)
    r = imu_residual_retracted(zeros, *args)
    J = jax.jacfwd(imu_residual_retracted)(zeros, *args)
    return r, J
