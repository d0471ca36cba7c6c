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
    """Returns (residual (2,), J (2,20)) at the current state — the HOT
    path, via forward-mode autodiff through the retraction.

    MEASURED DESIGN DECISION (round 3): the hand-derived closed forms
    (``projection_factor_analytic`` below) made the fused batched scan
    2.3× SLOWER on TPU (141 vs 331 fps aggregate, min-of-4 single-process
    ablation, scripts/profile_jac_ablation.py): per-factor 3×3 block
    chains + (2,20) concats vmap into padding-heavy small-op layouts
    ((3,20)→(8,128) vregs), while ``jacfwd`` traces into the same large
    fused einsums as the residual itself.  On TPU, autodiff through the
    retraction IS the fast Jacobian — the analytic forms stay as a tested
    cross-check."""
    zeros = jnp.zeros(PROJ_TANGENT, dtype=Pi.dtype)
    r = projection_residual_retracted(zeros, Pi, Qi, Pj, Qj, tic, qic, inv_dep_i, td, meas)
    J = jax.jacfwd(projection_residual_retracted)(
        zeros, Pi, Qi, Pj, Qj, tic, qic, inv_dep_i, td, meas
    )
    return r, J


def projection_factor_analytic(Pi, Qi, Pj, Qj, tic, qic, inv_dep_i, td, meas: ProjMeas):
    """Closed-form twin of ``projection_factor`` (NOT the hot path — see
    the measurement note there).

    A 2×3 projection-reduction row times chained 3×3 rotation blocks (the
    reference hand-derives the same blocks for Ceres,
    ``projection_td_factor.cpp:34-120``; rederived in the local box-plus
    convention used here and FD/equivalence-checked in tests).

    Derivation sketch (δ right-perturbations, R e^{[δ]×}v ⇒ −R[v]×δ):
      p_ci = pts_i_td/λ,  p_ii = R_ic p_ci + t_ic,  p_w = R_i p_ii + P_i,
      p_ij = R_jᵀ(p_w − P_j),  p_cj = R_icᵀ(p_ij − t_ic),
      B = R_icᵀR_jᵀ (∂p_cj/∂p_w),  A = B R_i (∂p_cj/∂p_ii).
    """
    dtype = Pi.dtype
    lam = inv_dep_i
    pts_i_td = meas.pts_i - (td - meas.td_i + meas.row_i) * meas.vel_i
    pts_j_td = meas.pts_j - (td - meas.td_j + meas.row_j) * meas.vel_j
    p_ci = pts_i_td / lam
    p_ii = quat.qrot(qic, p_ci) + tic
    p_w = quat.qrot(Qi, p_ii) + Pi
    p_ij = quat.qrot_inv(Qj, p_w - Pj)
    p_cj = quat.qrot_inv(qic, p_ij - tic)
    x, y, z = p_cj
    r = PROJ_SQRT_INFO * (p_cj[:2] / z - pts_j_td[:2])

    Ric = quat.q2R(qic)
    Ri = quat.q2R(Qi)
    Rj = quat.q2R(Qj)
    B = Ric.T @ Rj.T
    A = B @ Ri
    ARic = A @ Ric
    # ∂(z-normalized projection)/∂p_cj, whitened
    reduce = (PROJ_SQRT_INFO / z) * jnp.asarray(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], dtype)
    reduce = reduce.at[:, 2].set(-PROJ_SQRT_INFO
                                 * jnp.asarray([x, y]) / (z * z))
    eye = jnp.eye(3, dtype=dtype)
    J3 = jnp.concatenate([
        B,                                       # δP_i
        -A @ quat.skew(p_ii),                    # δθ_i
        -B,                                      # δP_j
        Ric.T @ quat.skew(p_ij),                 # δθ_j
        Ric.T @ (Rj.T @ Ri - eye),               # δt_ic
        -ARic @ quat.skew(p_ci) + quat.skew(p_cj),  # δθ_ic
        (-(ARic @ p_ci) / lam)[:, None],         # δλ (p_ci = pts_i_td/λ)
        (-(ARic @ meas.vel_i) / lam)[:, None],   # δtd via pts_i_td
    ], axis=1)
    J = reduce @ J3
    # δtd also enters the residual directly through pts_j_td
    J = J.at[:, 19].add(PROJ_SQRT_INFO * meas.vel_j[:2])
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
    """Returns (whitened residual (15,), J (15,30)) — HOT path via
    autodiff (same measured rationale as ``projection_factor``)."""
    sqrt_info = imupre.sqrt_information(pre)
    return imu_factor_whitened(pre, Pi, Qi, Vi, Bai, Bgi,
                               Pj, Qj, Vj, Baj, Bgj, gravity, sqrt_info)


def imu_factor_whitened(pre: imupre.Preintegrated, Pi, Qi, Vi, Bai, Bgi,
                        Pj, Qj, Vj, Baj, Bgj, gravity, sqrt_info):
    """``imu_factor`` with a precomputed whitening factor (the solver and
    marginalization share ONE sqrt-information per interval)."""
    zeros = jnp.zeros(IMU_TANGENT, dtype=Pi.dtype)
    args = (pre, Pi, Qi, Vi, Bai, Bgi, Pj, Qj, Vj, Baj, Bgj, gravity, sqrt_info)
    r = imu_residual_retracted(zeros, *args)
    J = jax.jacfwd(imu_residual_retracted)(zeros, *args)
    return r, J


def imu_factor_analytic(pre: imupre.Preintegrated, Pi, Qi, Vi, Bai, Bgi, Pj, Qj, Vj, Baj, Bgj, gravity):
    """Closed-form twin of ``imu_factor`` (NOT the hot path — see the
    measured note on ``projection_factor``).

    Whitening via the preintegration covariance sqrt-information, as the
    reference's ``IMUFactor::Evaluate`` (``imu_factor.h:63-71``).

    CLOSED-FORM Jacobian blocks (the reference hand-derives the same for
    Ceres, ``imu_factor.h:73-202``; rederived in this codebase's local
    box-plus convention, first-order in the bias correction exactly like
    the residual itself):
      r_p = R_iᵀ(½g·T² + P_j − P_i − V_i·T) − δp(ba,bg)
      r_q = 2·vec(γ⁻¹ ⊗ Q_i⁻¹ ⊗ Q_j),   γ = δq ⊗ [1, ½J_q_bg·δbg]
      r_v = R_iᵀ(g·T + V_j − V_i) − δv(ba,bg)
    with the θ-blocks via quaternion left/right product matrices.
    δ layout: [P_i θ_i V_i Ba_i Bg_i | P_j θ_j V_j Ba_j Bg_j]."""
    sqrt_info = imupre.sqrt_information(pre)
    return imu_factor_whitened_analytic(pre, Pi, Qi, Vi, Bai, Bgi,
                                        Pj, Qj, Vj, Baj, Bgj, gravity,
                                        sqrt_info)


def imu_factor_whitened_analytic(pre: imupre.Preintegrated, Pi, Qi, Vi,
                                 Bai, Bgi, Pj, Qj, Vj, Baj, Bgj, gravity,
                                 sqrt_info):
    """``imu_factor_analytic`` with a precomputed whitening factor."""
    dtype = Pi.dtype
    dp, dq, dv = imupre.bias_corrected(pre, Bai, Bgi)
    sdt = pre.sum_dt
    yp = quat.qrot_inv(Qi, 0.5 * gravity * sdt * sdt + Pj - Pi - Vi * sdt)
    yv = quat.qrot_inv(Qi, gravity * sdt + Vj - Vi)
    Bq = quat.qmul(quat.qconj(Qi), Qj)
    q_err = quat.qmul(quat.qconj(dq), Bq)
    r = jnp.concatenate([yp - dp, 2.0 * q_err[1:4], yv - dv,
                         Baj - Bai, Bgj - Bgi])

    Jpre = pre.jacobian
    blk = lambda a, b: Jpre[a:a + 3, b:b + 3]
    dp_dba = blk(imupre.O_P, imupre.O_BA)
    dp_dbg = blk(imupre.O_P, imupre.O_BG)
    dv_dba = blk(imupre.O_V, imupre.O_BA)
    dv_dbg = blk(imupre.O_V, imupre.O_BG)
    dq_dbg = blk(imupre.O_R, imupre.O_BG)
    RiT = quat.q2R(Qi).T
    Z = jnp.zeros((3, 3), dtype)
    eye = jnp.eye(3, dtype=dtype)
    # θ-blocks: q_err(δθ_i) = γ⁻¹ ⊗ [1,−δ/2] ⊗ B;  q_err(δθ_j) = q_err ⊗ [1,δ/2];
    # q_err(δbg_i) = [1,−(J_q_bg δbg)/2] ⊗ δq⁻¹ ⊗ B
    M_thi = -(quat.qleft(quat.qconj(dq)) @ quat.qright(Bq))[1:4, 1:4]
    M_thj = quat.qleft(q_err)[1:4, 1:4]
    C = quat.qmul(quat.qconj(pre.delta_q), Bq)
    M_bgi = -quat.qright(C)[1:4, 1:4] @ dq_dbg

    def row(*cols):
        return jnp.concatenate(cols, axis=1)

    Jl = jnp.concatenate([
        row(-RiT, quat.skew(yp), -RiT * sdt, -dp_dba, -dp_dbg,
            RiT, Z, Z, Z, Z),
        row(Z, M_thi, Z, Z, M_bgi, Z, M_thj, Z, Z, Z),
        row(Z, quat.skew(yv), -RiT, -dv_dba, -dv_dbg, Z, Z, RiT, Z, Z),
        row(Z, Z, Z, -eye, Z, Z, Z, Z, eye, Z),
        row(Z, Z, Z, Z, -eye, Z, Z, Z, Z, eye),
    ], axis=0)
    return sqrt_info @ r, sqrt_info @ Jl
