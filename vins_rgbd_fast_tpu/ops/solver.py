"""Batched Levenberg-Marquardt sliding-window solver (the Ceres replacement).

The reference hands its window problem to Ceres (DENSE_SCHUR + DOGLEG,
≤8 iterations / ≤0.04 s, ``/root/reference/vins_estimator/src/estimator/
estimator.cpp:1161-1363``) with factors added per feature/frame in C++
loops; its marginalization Hessian is assembled by 4 pthreads
(``marginalization_factor.cpp:240-271``).

TPU-native design — the whole nonlinear solve is ONE fused XLA program and
the normal equations are assembled with **zero scatters**:

  * factor enumeration is a *static* (MAXF × FRAMES) grid for visual
    factors + WINDOW_SIZE IMU factors + one prior block, with validity
    masks instead of dynamic lists;
  * residuals/Jacobians evaluate as vmapped batches (autodiff through the
    box-plus retraction);
  * the only dynamic index in the problem — each feature's start frame —
    is handled by one-hot contraction: every H/g block accumulation is an
    einsum over the factor grid (MXU work), never a scatter (scatters
    serialize on TPU and made a first version ~100× slower);
  * the LM loop (damped GN with accept/reject) runs under ``lax.scan``
    with a fixed iteration budget (the reference's ≤8-iteration realtime
    envelope); candidate costs use residual-only evaluation;
  * gauge freedom: frame-0 position/yaw re-anchored post-solve
    (``double2vector``, estimator.cpp:985-1111) and/or frozen via the
    free-parameter mask (VO mode fixes pose 0 like the reference's
    ``SetParameterBlockConstant``).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..backend.state import (
    FRAMES, WINDOW_SIZE, NP, NX, EX_OFF, TD_OFF, POSE_DIM, SB_DIM,
    WindowState, boxplus, boxminus, yaw_gauge_fix,
)
from ..utils import quaternion as quat
from . import factors
from . import imu_preintegration as imupre


# ---------------------------------------------------------------------------
# Static solver configuration (trace-time)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    maxf: int
    max_iters: int = 8
    use_imu: bool = True
    estimate_td: bool = False
    estimate_extrinsic: bool = False
    fix_pose0: bool = False  # VO mode: anchor first pose like the reference
    cauchy_c: float = 1.0
    lm_lambda0: float = 1e-6
    lm_up: float = 10.0
    lm_down: float = 0.1
    yaw_gauge: bool = True  # IMU mode post-solve re-anchoring
    with_relo: bool = False  # append a relocalization pose block

    @property
    def nt(self) -> int:
        return NX + self.maxf + (6 if self.with_relo else 0)

    @property
    def relo_off(self) -> int:
        return NX + self.maxf


class PriorFactor(NamedTuple):
    """Linearized marginalization prior: r(x) = r0 + J·(x ⊟ x0)."""

    J: jax.Array  # (NX, NX)
    r0: jax.Array  # (NX,)
    x0: WindowState
    valid: jax.Array  # () bool


def empty_prior(dtype=jnp.float32) -> PriorFactor:
    from ..backend.state import identity_state

    return PriorFactor(
        J=jnp.zeros((NX, NX), dtype),
        r0=jnp.zeros((NX,), dtype),
        x0=identity_state(dtype),
        valid=jnp.asarray(False),
    )


class VisualData(NamedTuple):
    """Per-feature observation data for the solver (dense, masked)."""

    start: jax.Array  # (MAXF,) int32 first-obs slot
    pts: jax.Array  # (MAXF, FRAMES, 2) normalized xy
    vel: jax.Array  # (MAXF, FRAMES, 2) normalized-plane velocity
    td_obs: jax.Array  # (MAXF, FRAMES)
    row_scaled: jax.Array  # (MAXF, FRAMES) TR/ROW·row rolling-shutter term
    obs_mask: jax.Array  # (MAXF, FRAMES) bool
    inv_depth: jax.Array  # (MAXF,)
    depth_free: jax.Array  # (MAXF,) bool — inverse depth is a free variable
    valid: jax.Array  # (MAXF,) bool — feature participates at all


class ImuData(NamedTuple):
    """Batched preintegrations for the WINDOW_SIZE frame intervals."""

    pre: imupre.Preintegrated  # leaves stacked with leading dim WINDOW_SIZE
    valid: jax.Array  # (WINDOW_SIZE,) bool


class ReloData(NamedTuple):
    """Fast-relocalization constraint (the reference's ``setReloFrame`` +
    relo factors, estimator.cpp:1307-1346, 1728-1747): matched old-keyframe
    observations tie an extra optimizable pose to current-window landmarks.

    Rows are keyed by FEATURE ID (``match_ids``), not table row: the
    reference matches relo points to window features by id
    (estimator.cpp:1307-1346) — table rows can be freed and recycled
    between keyframe export and relo injection.  ``remap_relo_by_id``
    aligns the constraint to the CURRENT table inside the solve."""

    active: jax.Array  # () bool
    match_pts: jax.Array  # (MAXF, 2) old-frame normalized obs per entry
    match_valid: jax.Array  # (MAXF,) bool
    match_ids: jax.Array  # (MAXF,) int32 feature id per entry, -1 = unused
    P: jax.Array  # (3,) relo pose (optimized; init = old kf vio pose)
    Q: jax.Array  # (4,)


def empty_relo(maxf: int, dtype=jnp.float32) -> ReloData:
    return ReloData(
        active=jnp.asarray(False),
        match_pts=jnp.zeros((maxf, 2), dtype),
        match_valid=jnp.zeros((maxf,), bool),
        match_ids=jnp.full((maxf,), -1, jnp.int32),
        P=jnp.zeros(3, dtype),
        Q=quat.q_identity(dtype),
    )


def remap_relo_by_id(relo: ReloData, table_ids: jax.Array) -> ReloData:
    """Re-key the relo constraint onto the CURRENT feature table by id
    (one equality one-hot — the same trick as the tracker's velocity
    matching).  Entries whose id left the table drop out; rows recycled
    to a different feature since export never bind the wrong landmark."""
    dtype = relo.match_pts.dtype
    E = ((table_ids[:, None] == relo.match_ids[None, :])
         & (table_ids >= 0)[:, None] & relo.match_valid[None, :])
    pts = E.astype(dtype) @ relo.match_pts
    valid = jnp.any(E, axis=1)
    return relo._replace(match_pts=pts, match_valid=valid,
                         match_ids=jnp.where(valid, table_ids, -1))


# ---------------------------------------------------------------------------
# Projection factors: batched residuals (+ optional Jacobians)
# ---------------------------------------------------------------------------


def _proj_meas(cfg: SolverConfig, x: WindowState, vis: VisualData, f, j, dtype):
    i = vis.start[f]
    return i, factors.ProjMeas(
        pts_i=jnp.concatenate([vis.pts[f, i], jnp.ones((1,), dtype)]),
        pts_j=jnp.concatenate([vis.pts[f, j], jnp.ones((1,), dtype)]),
        vel_i=jnp.concatenate([vis.vel[f, i], jnp.zeros((1,), dtype)]),
        vel_j=jnp.concatenate([vis.vel[f, j], jnp.zeros((1,), dtype)]),
        td_i=vis.td_obs[f, i], td_j=vis.td_obs[f, j],
        row_i=vis.row_scaled[f, i], row_j=vis.row_scaled[f, j],
    )


def _proj_grid(cfg: SolverConfig, x: WindowState, vis: VisualData, with_jac: bool):
    """Evaluate all (MAXF × FRAMES) projection factors.

    Returns (r (MAXF,F,2), Jl (MAXF,F,2,20) or None), weighted by the
    Cauchy IRLS weight × validity, with masked factors hard-zeroed."""
    dtype = x.P.dtype

    def one(f, j):
        i, meas = _proj_meas(cfg, x, vis, f, j, dtype)
        args = (x.P[i], x.Q[i], x.P[j], x.Q[j], x.tic, x.qic,
                vis.inv_depth[f], x.td, meas)
        ok = vis.valid[f] & vis.obs_mask[f, i] & vis.obs_mask[f, j] & (j != i)
        if with_jac:
            r, Jl = factors.projection_factor(*args)
            r = jnp.where(ok, r, 0.0)
            Jl = jnp.where(ok, Jl, 0.0)
            w = factors.cauchy_weight(r[None], cfg.cauchy_c)[0, 0]
            return r * w, Jl * w
        r = factors.projection_residual(*args)
        r = jnp.where(ok, r, 0.0)
        w = factors.cauchy_weight(r[None], cfg.cauchy_c)[0, 0]
        return r * w, jnp.zeros((), dtype)

    f_idx = jnp.arange(cfg.maxf)
    j_idx = jnp.arange(FRAMES)
    r, Jl = jax.vmap(lambda f: jax.vmap(lambda j: one(f, j))(j_idx))(f_idx)
    return (r, Jl) if with_jac else (r, None)


class StructuredSystem(NamedTuple):
    """Normal equations in dense-Schur form: the landmark (inverse-depth)
    block is DIAGONAL — each λ_f couples only to poses/ex/td — so we never
    materialize the full (NX+MAXF)² Hessian.  ``p``-side dims are
    [NX pose-side | 6 relo (if with_relo)].

    This is the structure Ceres' DENSE_SCHUR exploits
    (estimator.cpp:1350 ``options.linear_solver_type``); on TPU it turns
    the per-iteration O((NX+MAXF)³) Cholesky into one (NXP,MAXF)×(MAXF,NXP)
    MXU matmul + an O(NXP³) Cholesky."""

    Hpp: jax.Array  # (NXP, NXP)
    Hpl: jax.Array  # (NXP, MAXF)
    dl: jax.Array   # (MAXF,) diagonal of the λ block
    gp: jax.Array   # (NXP,)
    gl: jax.Array   # (MAXF,)


def nxp(cfg: SolverConfig) -> int:
    return NX + (6 if cfg.with_relo else 0)


def _empty_system(cfg: SolverConfig, dtype) -> StructuredSystem:
    n = nxp(cfg)
    return StructuredSystem(
        Hpp=jnp.zeros((n, n), dtype), Hpl=jnp.zeros((n, cfg.maxf), dtype),
        dl=jnp.zeros((cfg.maxf,), dtype), gp=jnp.zeros((n,), dtype),
        gl=jnp.zeros((cfg.maxf,), dtype),
    )


def _accumulate_proj(cfg: SolverConfig, vis: VisualData, r, Jl, H, g):
    """Scatter-free accumulation of the projection-factor normal equations.

    Block layout of the local Jacobian (factors.py): pose_i [0:6],
    pose_j [6:12], ex [12:18], λ [18], td [19].  The dynamic pose_i index
    becomes a one-hot contraction; the pose_j and λ indices coincide with
    the grid axes, so their accumulations are plain axis reductions."""
    dtype = H.dtype
    maxf = cfg.maxf
    Oi = jax.nn.one_hot(vis.start, FRAMES, dtype=dtype)  # (MAXF, 11)

    Ji = Jl[..., 0:6]    # (F, J, 2, 6)
    Jj = Jl[..., 6:12]
    Je = Jl[..., 12:18]
    Jlam = Jl[..., 18]   # (F, J, 2)
    Jt = Jl[..., 19]

    def blk(A, B):  # (F,J,2,a) x (F,J,2,b) -> (F,J,a,b)
        return jnp.einsum("fjpa,fjpb->fjab", A, B)

    M_ii = blk(Ji, Ji)
    M_ij = blk(Ji, Jj)
    M_jj = blk(Jj, Jj)
    M_ie = blk(Ji, Je)
    M_je = blk(Jj, Je)
    M_ee = blk(Je, Je)

    # --- pose-pose 66×66 block grid ---
    Hpp = jnp.zeros((FRAMES, FRAMES, POSE_DIM, POSE_DIM), dtype)
    diag_ii = jnp.einsum("fa,fjxy->axy", Oi, M_ii)
    diag_jj = jnp.einsum("fjxy->jxy", M_jj)
    cross_ij = jnp.einsum("fa,fbxy->abxy", Oi, M_ij)
    eye_f = jnp.eye(FRAMES, dtype=dtype)
    Hpp = Hpp + cross_ij + jnp.swapaxes(jnp.swapaxes(cross_ij, 0, 1), 2, 3)
    Hpp = Hpp + jnp.einsum("ab,axy->abxy", eye_f, diag_ii + diag_jj)
    Hpp66 = Hpp.transpose(0, 2, 1, 3).reshape(NP, NP)
    H = H.at[:NP, :NP].add(Hpp66)

    # --- pose-ex ---
    Hpe = (jnp.einsum("fa,fjxy->axy", Oi, M_ie)
           + jnp.einsum("fjxy->jxy", M_je)).reshape(NP, 6)
    H = H.at[:NP, EX_OFF:EX_OFF + 6].add(Hpe)
    H = H.at[EX_OFF:EX_OFF + 6, :NP].add(Hpe.T)
    H = H.at[EX_OFF:EX_OFF + 6, EX_OFF:EX_OFF + 6].add(
        jnp.einsum("fjxy->xy", M_ee))

    # --- λ blocks (λ_f column index = NX + f; grid f axis = direct) ---
    lam_lam = jnp.einsum("fjp,fjp->f", Jlam, Jlam)
    H = H.at[jnp.arange(NX, NX + maxf), jnp.arange(NX, NX + maxf)].add(lam_lam)
    # pose-λ: contributions at (pose i_f, λ_f) and (pose j, λ_f)
    A_i = jnp.einsum("fjpx,fjp->fx", Ji, Jlam)  # (F,6) summed over j
    A_j = jnp.einsum("fjpx,fjp->fjx", Jj, Jlam)  # (F,J,6)
    Hplam = (jnp.einsum("fa,fx->axf", Oi, A_i)
             + jnp.einsum("fjx->jxf", A_j)).reshape(NP, maxf)
    H = H.at[:NP, NX:NX + maxf].add(Hplam)
    H = H.at[NX:NX + maxf, :NP].add(Hplam.T)
    # ex-λ
    Helam = jnp.einsum("fjpx,fjp->xf", Je, Jlam)
    H = H.at[EX_OFF:EX_OFF + 6, NX:NX + maxf].add(Helam)
    H = H.at[NX:NX + maxf, EX_OFF:EX_OFF + 6].add(Helam.T)

    # --- td row/col ---
    t_t = jnp.einsum("fjp,fjp->", Jt, Jt)
    H = H.at[TD_OFF, TD_OFF].add(t_t)
    t_pose = (jnp.einsum("fa,fjpx,fjp->ax", Oi, Ji, Jt)
              + jnp.einsum("fjpx,fjp->jx", Jj, Jt)).reshape(NP)
    H = H.at[TD_OFF, :NP].add(t_pose)
    H = H.at[:NP, TD_OFF].add(t_pose)
    t_ex = jnp.einsum("fjpx,fjp->x", Je, Jt)
    H = H.at[TD_OFF, EX_OFF:EX_OFF + 6].add(t_ex)
    H = H.at[EX_OFF:EX_OFF + 6, TD_OFF].add(t_ex)
    t_lam = jnp.einsum("fjp,fjp->f", Jlam, Jt)
    H = H.at[TD_OFF, NX:NX + maxf].add(t_lam)
    H = H.at[NX:NX + maxf, TD_OFF].add(t_lam)

    # --- gradient ---
    g_i = jnp.einsum("fjpx,fjp->fx", Ji, r)
    g_j = jnp.einsum("fjpx,fjp->fjx", Jj, r)
    g_pose = (jnp.einsum("fa,fx->ax", Oi, g_i)
              + jnp.einsum("fjx->jx", g_j)).reshape(NP)
    g = g.at[:NP].add(g_pose)
    g = g.at[EX_OFF:EX_OFF + 6].add(jnp.einsum("fjpx,fjp->x", Je, r))
    g = g.at[NX:NX + maxf].add(jnp.einsum("fjp,fjp->f", Jlam, r))
    g = g.at[TD_OFF].add(jnp.einsum("fjp,fjp->", Jt, r))
    return H, g


def _accumulate_proj_s(cfg: SolverConfig, vis: VisualData, r, Jl,
                       s: StructuredSystem) -> StructuredSystem:
    """Structured (Schur-form) accumulation of the projection factors —
    same math as ``_accumulate_proj`` with the λ row/column split out."""
    dtype = s.Hpp.dtype
    maxf = cfg.maxf
    Oi = jax.nn.one_hot(vis.start, FRAMES, dtype=dtype)  # (MAXF, 11)

    Ji = Jl[..., 0:6]    # (F, J, 2, 6)
    Jj = Jl[..., 6:12]
    Je = Jl[..., 12:18]
    Jlam = Jl[..., 18]   # (F, J, 2)
    Jt = Jl[..., 19]

    def blk(A, B):  # (F,J,2,a) x (F,J,2,b) -> (F,J,a,b)
        return jnp.einsum("fjpa,fjpb->fjab", A, B)

    M_ii = blk(Ji, Ji)
    M_ij = blk(Ji, Jj)
    M_jj = blk(Jj, Jj)
    M_ie = blk(Ji, Je)
    M_je = blk(Jj, Je)
    M_ee = blk(Je, Je)

    H = s.Hpp
    g = s.gp

    # --- pose-pose 66×66 block grid ---
    diag_ii = jnp.einsum("fa,fjxy->axy", Oi, M_ii)
    diag_jj = jnp.einsum("fjxy->jxy", M_jj)
    cross_ij = jnp.einsum("fa,fbxy->abxy", Oi, M_ij)
    eye_f = jnp.eye(FRAMES, dtype=dtype)
    Hpp = cross_ij + jnp.swapaxes(jnp.swapaxes(cross_ij, 0, 1), 2, 3)
    Hpp = Hpp + jnp.einsum("ab,axy->abxy", eye_f, diag_ii + diag_jj)
    H = H.at[:NP, :NP].add(Hpp.transpose(0, 2, 1, 3).reshape(NP, NP))

    # --- pose-ex ---
    Hpe = (jnp.einsum("fa,fjxy->axy", Oi, M_ie)
           + jnp.einsum("fjxy->jxy", M_je)).reshape(NP, 6)
    H = H.at[:NP, EX_OFF:EX_OFF + 6].add(Hpe)
    H = H.at[EX_OFF:EX_OFF + 6, :NP].add(Hpe.T)
    H = H.at[EX_OFF:EX_OFF + 6, EX_OFF:EX_OFF + 6].add(
        jnp.einsum("fjxy->xy", M_ee))

    # --- λ diagonal + couplings (structured: no scatter into a big H) ---
    dl = s.dl + jnp.einsum("fjp,fjp->f", Jlam, Jlam)
    A_i = jnp.einsum("fjpx,fjp->fx", Ji, Jlam)  # (F,6) summed over j
    A_j = jnp.einsum("fjpx,fjp->fjx", Jj, Jlam)  # (F,J,6)
    Hplam = (jnp.einsum("fa,fx->axf", Oi, A_i)
             + jnp.einsum("fjx->jxf", A_j)).reshape(NP, maxf)
    Hpl = s.Hpl.at[:NP, :].add(Hplam)
    Hpl = Hpl.at[EX_OFF:EX_OFF + 6, :].add(
        jnp.einsum("fjpx,fjp->xf", Je, Jlam))
    Hpl = Hpl.at[TD_OFF, :].add(jnp.einsum("fjp,fjp->f", Jlam, Jt))

    # --- td row/col ---
    t_t = jnp.einsum("fjp,fjp->", Jt, Jt)
    H = H.at[TD_OFF, TD_OFF].add(t_t)
    t_pose = (jnp.einsum("fa,fjpx,fjp->ax", Oi, Ji, Jt)
              + jnp.einsum("fjpx,fjp->jx", Jj, Jt)).reshape(NP)
    H = H.at[TD_OFF, :NP].add(t_pose)
    H = H.at[:NP, TD_OFF].add(t_pose)
    t_ex = jnp.einsum("fjpx,fjp->x", Je, Jt)
    H = H.at[TD_OFF, EX_OFF:EX_OFF + 6].add(t_ex)
    H = H.at[EX_OFF:EX_OFF + 6, TD_OFF].add(t_ex)

    # --- gradient ---
    g_i = jnp.einsum("fjpx,fjp->fx", Ji, r)
    g_j = jnp.einsum("fjpx,fjp->fjx", Jj, r)
    g_pose = (jnp.einsum("fa,fx->ax", Oi, g_i)
              + jnp.einsum("fjx->jx", g_j)).reshape(NP)
    g = g.at[:NP].add(g_pose)
    g = g.at[EX_OFF:EX_OFF + 6].add(jnp.einsum("fjpx,fjp->x", Je, r))
    g = g.at[TD_OFF].add(jnp.einsum("fjp,fjp->", Jt, r))
    gl = s.gl + jnp.einsum("fjp,fjp->f", Jlam, r)
    return StructuredSystem(Hpp=H, Hpl=Hpl, dl=dl, gp=g, gl=gl)


# ---------------------------------------------------------------------------
# Relocalization factors (extra pose block tied to window landmarks)
# ---------------------------------------------------------------------------


def _relo_grid(cfg: SolverConfig, x: WindowState, vis: VisualData,
               relo: ReloData, with_jac: bool):
    """One factor per matched feature: reprojection of the start-frame
    landmark into the relo pose (local tangent reuses the projection layout
    with pose_j := relo pose)."""
    dtype = x.P.dtype

    def one(f):
        i = vis.start[f]
        meas = factors.ProjMeas(
            pts_i=jnp.concatenate([vis.pts[f, i], jnp.ones((1,), dtype)]),
            pts_j=jnp.concatenate([relo.match_pts[f], jnp.ones((1,), dtype)]),
            vel_i=jnp.zeros(3, dtype), vel_j=jnp.zeros(3, dtype),
            td_i=x.td, td_j=x.td,
            row_i=jnp.zeros((), dtype), row_j=jnp.zeros((), dtype),
        )
        args = (x.P[i], x.Q[i], relo.P, relo.Q, x.tic, x.qic,
                vis.inv_depth[f], x.td, meas)
        ok = relo.active & vis.valid[f] & vis.obs_mask[f, i] & relo.match_valid[f]
        if with_jac:
            r, Jl = factors.projection_factor(*args)
            r = jnp.where(ok, r, 0.0)
            Jl = jnp.where(ok, Jl, 0.0)
            w = factors.cauchy_weight(r[None], cfg.cauchy_c)[0, 0]
            return r * w, Jl * w
        r = factors.projection_residual(*args)
        r = jnp.where(ok, r, 0.0)
        w = factors.cauchy_weight(r[None], cfg.cauchy_c)[0, 0]
        return r * w, jnp.zeros((), dtype)

    r, Jl = jax.vmap(one)(jnp.arange(cfg.maxf))
    return (r, Jl) if with_jac else (r, None)


def _accumulate_relo(cfg: SolverConfig, vis: VisualData, r, Jl, H, g):
    """Scatter-free accumulation of the relo factors.  Blocks: pose_i
    (one-hot over the feature's start frame), relo (static offset), ex,
    λ (grid axis), td."""
    dtype = H.dtype
    maxf = cfg.maxf
    RO = cfg.relo_off
    Oi = jax.nn.one_hot(vis.start, FRAMES, dtype=dtype)  # (MAXF, 11)

    Ji = Jl[..., 0:6]   # (F,2,6)
    Jr = Jl[..., 6:12]  # relo block
    Je = Jl[..., 12:18]
    Jlam = Jl[..., 18]  # (F,2)
    Jt = Jl[..., 19]

    def blk(A, B):
        return jnp.einsum("fpa,fpb->fab", A, B)

    # pose-pose diagonal blocks (i,i)
    Hpp = jnp.einsum("fa,fxy->axy", Oi, blk(Ji, Ji))
    Hpp66 = jnp.einsum("ab,axy->abxy", jnp.eye(FRAMES, dtype=dtype), Hpp)
    H = H.at[:NP, :NP].add(Hpp66.transpose(0, 2, 1, 3).reshape(NP, NP))
    # pose-relo
    Hpr = jnp.einsum("fa,fxy->axy", Oi, blk(Ji, Jr)).reshape(NP, 6)
    H = H.at[:NP, RO:RO + 6].add(Hpr)
    H = H.at[RO:RO + 6, :NP].add(Hpr.T)
    # relo-relo
    H = H.at[RO:RO + 6, RO:RO + 6].add(jnp.einsum("fxy->xy", blk(Jr, Jr)))
    # ex couplings
    Hpe = jnp.einsum("fa,fxy->axy", Oi, blk(Ji, Je)).reshape(NP, 6)
    H = H.at[:NP, EX_OFF:EX_OFF + 6].add(Hpe)
    H = H.at[EX_OFF:EX_OFF + 6, :NP].add(Hpe.T)
    Hre = jnp.einsum("fxy->xy", blk(Jr, Je))
    H = H.at[RO:RO + 6, EX_OFF:EX_OFF + 6].add(Hre)
    H = H.at[EX_OFF:EX_OFF + 6, RO:RO + 6].add(Hre.T)
    H = H.at[EX_OFF:EX_OFF + 6, EX_OFF:EX_OFF + 6].add(
        jnp.einsum("fxy->xy", blk(Je, Je)))
    # λ blocks (direct f axis)
    lam_lam = jnp.einsum("fp,fp->f", Jlam, Jlam)
    H = H.at[jnp.arange(NX, NX + maxf), jnp.arange(NX, NX + maxf)].add(lam_lam)
    A_i = jnp.einsum("fpx,fp->fx", Ji, Jlam)
    Hplam = jnp.einsum("fa,fx->axf", Oi, A_i).reshape(NP, maxf)
    H = H.at[:NP, NX:NX + maxf].add(Hplam)
    H = H.at[NX:NX + maxf, :NP].add(Hplam.T)
    Hrlam = jnp.einsum("fpx,fp->xf", Jr, Jlam)
    H = H.at[RO:RO + 6, NX:NX + maxf].add(Hrlam)
    H = H.at[NX:NX + maxf, RO:RO + 6].add(Hrlam.T)
    Helam = jnp.einsum("fpx,fp->xf", Je, Jlam)
    H = H.at[EX_OFF:EX_OFF + 6, NX:NX + maxf].add(Helam)
    H = H.at[NX:NX + maxf, EX_OFF:EX_OFF + 6].add(Helam.T)
    # td row
    H = H.at[TD_OFF, TD_OFF].add(jnp.einsum("fp,fp->", Jt, Jt))
    t_pose = jnp.einsum("fa,fpx,fp->ax", Oi, Ji, Jt).reshape(NP)
    H = H.at[TD_OFF, :NP].add(t_pose)
    H = H.at[:NP, TD_OFF].add(t_pose)
    t_relo = jnp.einsum("fpx,fp->x", Jr, Jt)
    H = H.at[TD_OFF, RO:RO + 6].add(t_relo)
    H = H.at[RO:RO + 6, TD_OFF].add(t_relo)
    t_lam = jnp.einsum("fp,fp->f", Jlam, Jt)
    H = H.at[TD_OFF, NX:NX + maxf].add(t_lam)
    H = H.at[NX:NX + maxf, TD_OFF].add(t_lam)
    # gradient
    g_i = jnp.einsum("fpx,fp->fx", Ji, r)
    g = g.at[:NP].add(jnp.einsum("fa,fx->ax", Oi, g_i).reshape(NP))
    g = g.at[RO:RO + 6].add(jnp.einsum("fpx,fp->x", Jr, r))
    g = g.at[EX_OFF:EX_OFF + 6].add(jnp.einsum("fpx,fp->x", Je, r))
    g = g.at[NX:NX + maxf].add(jnp.einsum("fp,fp->f", Jlam, r))
    g = g.at[TD_OFF].add(jnp.einsum("fp,fp->", Jt, r))
    return H, g


def _accumulate_relo_s(cfg: SolverConfig, vis: VisualData, r, Jl,
                       s: StructuredSystem) -> StructuredSystem:
    """Structured accumulation of the relo factors; the relo pose block
    lives at p-side offset NX (the λ tail is split out)."""
    dtype = s.Hpp.dtype
    RO = NX  # structured p-side offset of the relo block
    Oi = jax.nn.one_hot(vis.start, FRAMES, dtype=dtype)  # (MAXF, 11)

    Ji = Jl[..., 0:6]   # (F,2,6)
    Jr = Jl[..., 6:12]  # relo block
    Je = Jl[..., 12:18]
    Jlam = Jl[..., 18]  # (F,2)
    Jt = Jl[..., 19]

    def blk(A, B):
        return jnp.einsum("fpa,fpb->fab", A, B)

    H = s.Hpp
    g = s.gp
    # pose-pose diagonal blocks (i,i)
    Hpp = jnp.einsum("fa,fxy->axy", Oi, blk(Ji, Ji))
    Hpp66 = jnp.einsum("ab,axy->abxy", jnp.eye(FRAMES, dtype=dtype), Hpp)
    H = H.at[:NP, :NP].add(Hpp66.transpose(0, 2, 1, 3).reshape(NP, NP))
    # pose-relo
    Hpr = jnp.einsum("fa,fxy->axy", Oi, blk(Ji, Jr)).reshape(NP, 6)
    H = H.at[:NP, RO:RO + 6].add(Hpr)
    H = H.at[RO:RO + 6, :NP].add(Hpr.T)
    # relo-relo
    H = H.at[RO:RO + 6, RO:RO + 6].add(jnp.einsum("fxy->xy", blk(Jr, Jr)))
    # ex couplings
    Hpe = jnp.einsum("fa,fxy->axy", Oi, blk(Ji, Je)).reshape(NP, 6)
    H = H.at[:NP, EX_OFF:EX_OFF + 6].add(Hpe)
    H = H.at[EX_OFF:EX_OFF + 6, :NP].add(Hpe.T)
    Hre = jnp.einsum("fxy->xy", blk(Jr, Je))
    H = H.at[RO:RO + 6, EX_OFF:EX_OFF + 6].add(Hre)
    H = H.at[EX_OFF:EX_OFF + 6, RO:RO + 6].add(Hre.T)
    H = H.at[EX_OFF:EX_OFF + 6, EX_OFF:EX_OFF + 6].add(
        jnp.einsum("fxy->xy", blk(Je, Je)))
    # λ diagonal + couplings
    dl = s.dl + jnp.einsum("fp,fp->f", Jlam, Jlam)
    A_i = jnp.einsum("fpx,fp->fx", Ji, Jlam)
    Hpl = s.Hpl.at[:NP, :].add(
        jnp.einsum("fa,fx->axf", Oi, A_i).reshape(NP, cfg.maxf))
    Hpl = Hpl.at[RO:RO + 6, :].add(jnp.einsum("fpx,fp->xf", Jr, Jlam))
    Hpl = Hpl.at[EX_OFF:EX_OFF + 6, :].add(jnp.einsum("fpx,fp->xf", Je, Jlam))
    Hpl = Hpl.at[TD_OFF, :].add(jnp.einsum("fp,fp->f", Jlam, Jt))
    # td row
    H = H.at[TD_OFF, TD_OFF].add(jnp.einsum("fp,fp->", Jt, Jt))
    t_pose = jnp.einsum("fa,fpx,fp->ax", Oi, Ji, Jt).reshape(NP)
    H = H.at[TD_OFF, :NP].add(t_pose)
    H = H.at[:NP, TD_OFF].add(t_pose)
    t_relo = jnp.einsum("fpx,fp->x", Jr, Jt)
    H = H.at[TD_OFF, RO:RO + 6].add(t_relo)
    H = H.at[RO:RO + 6, TD_OFF].add(t_relo)
    # gradient
    g_i = jnp.einsum("fpx,fp->fx", Ji, r)
    g = g.at[:NP].add(jnp.einsum("fa,fx->ax", Oi, g_i).reshape(NP))
    g = g.at[RO:RO + 6].add(jnp.einsum("fpx,fp->x", Jr, r))
    g = g.at[EX_OFF:EX_OFF + 6].add(jnp.einsum("fpx,fp->x", Je, r))
    g = g.at[TD_OFF].add(jnp.einsum("fp,fp->", Jt, r))
    gl = s.gl + jnp.einsum("fp,fp->f", Jlam, r)
    return StructuredSystem(Hpp=H, Hpl=Hpl, dl=dl, gp=g, gl=gl)


# ---------------------------------------------------------------------------
# IMU factors (static placement — WINDOW_SIZE rows, no dynamic indices)
# ---------------------------------------------------------------------------


def _imu_sqrt_infos(imu: ImuData) -> jax.Array:
    return jax.vmap(imupre.sqrt_information)(imu.pre)


def _imu_batch(cfg: SolverConfig, x: WindowState, imu: ImuData, gravity,
               sqrt_infos, with_jac: bool):
    dtype = x.P.dtype

    def one(j, pre_j, W, ok):
        args = (pre_j,
                x.P[j], x.Q[j], x.V[j], x.Ba[j], x.Bg[j],
                x.P[j + 1], x.Q[j + 1], x.V[j + 1], x.Ba[j + 1], x.Bg[j + 1],
                gravity, W)
        if with_jac:
            r, Jl = factors.imu_factor_whitened(*args[:-1], sqrt_info=args[-1])
            r = jnp.where(ok, r, 0.0)
            Jl = jnp.where(ok, Jl, 0.0)
            return r, Jl
        zeros = jnp.zeros(factors.IMU_TANGENT, dtype)
        r = factors.imu_residual_retracted(zeros, *args)
        r = jnp.where(ok, r, 0.0)
        return r, jnp.zeros((), dtype)

    r, Jl = jax.vmap(one)(jnp.arange(WINDOW_SIZE), imu.pre, sqrt_infos, imu.valid)
    return (r, Jl) if with_jac else (r, None)


def _imu_rows(cfg: SolverConfig, Jl, dtype):
    """(W·15, NX) dense rows of the IMU factors (static pads, no scatter)."""
    rows = jnp.zeros((WINDOW_SIZE, 15, NX), dtype)
    for j in range(WINDOW_SIZE):  # static offsets — pure pads, no scatter
        rows = rows.at[j, :, POSE_DIM * j:POSE_DIM * (j + 1)].set(Jl[j, :, 0:6])
        rows = rows.at[j, :, NP + SB_DIM * j:NP + SB_DIM * (j + 1)].set(Jl[j, :, 6:15])
        rows = rows.at[j, :, POSE_DIM * (j + 1):POSE_DIM * (j + 2)].set(Jl[j, :, 15:21])
        rows = rows.at[j, :, NP + SB_DIM * (j + 1):NP + SB_DIM * (j + 2)].set(Jl[j, :, 21:30])
    return rows.reshape(-1, NX)


def _accumulate_imu(cfg: SolverConfig, r, Jl, H, g):
    """Static-slice accumulation of the 10 IMU factors (rows form)."""
    R = _imu_rows(cfg, Jl, H.dtype)
    H = H.at[:NX, :NX].add(R.T @ R)
    g = g.at[:NX].add(R.T @ r.reshape(-1))
    return H, g


def _accumulate_imu_s(cfg: SolverConfig, r, Jl, s: StructuredSystem) -> StructuredSystem:
    R = _imu_rows(cfg, Jl, s.Hpp.dtype)
    Hpp = s.Hpp.at[:NX, :NX].add(R.T @ R)
    gp = s.gp.at[:NX].add(R.T @ r.reshape(-1))
    return s._replace(Hpp=Hpp, gp=gp)


# ---------------------------------------------------------------------------
# Prior
# ---------------------------------------------------------------------------


def _prior_residual(cfg: SolverConfig, x: WindowState, prior: PriorFactor):
    dtype = x.P.dtype
    dx = boxminus(x, prior.x0)
    return (prior.r0 + prior.J @ dx) * prior.valid.astype(dtype)


# ---------------------------------------------------------------------------
# Assembly entry points
# ---------------------------------------------------------------------------


def free_mask(cfg: SolverConfig, vis: VisualData, dtype, td_free=None,
              relo_active=None) -> jax.Array:
    """(NT,) 1.0 for free tangent dims, 0.0 for frozen (the reference's
    SetParameterBlockConstant calls, estimator.cpp:1174-1212).

    ``td_free`` is the runtime gate mirroring the reference's
    ``Vs[0].norm() > 0.2`` condition on td estimation."""
    m = jnp.ones((cfg.nt,), dtype)
    if not cfg.use_imu:
        m = m.at[NP:EX_OFF].set(0.0)  # no speed/bias params in VO mode
    if cfg.fix_pose0:
        m = m.at[0:POSE_DIM].set(0.0)
    if not cfg.estimate_extrinsic:
        m = m.at[EX_OFF:EX_OFF + 6].set(0.0)
    if not cfg.estimate_td:
        m = m.at[TD_OFF].set(0.0)
    elif td_free is not None:
        m = m.at[TD_OFF].set(td_free.astype(dtype))
    m = m.at[NX:NX + cfg.maxf].set(vis.depth_free.astype(dtype))
    if cfg.with_relo:
        ra = jnp.asarray(1.0, dtype) if relo_active is None else relo_active.astype(dtype)
        m = m.at[cfg.relo_off:cfg.relo_off + 6].set(ra)
    return m


def normal_equations_structured(
    cfg: SolverConfig,
    x: WindowState,
    vis: VisualData,
    imu: Optional[ImuData],
    prior: PriorFactor,
    gravity: jax.Array,
    sqrt_infos: Optional[jax.Array] = None,
    relo: Optional[ReloData] = None,
) -> Tuple[StructuredSystem, jax.Array]:
    """Assemble the normal equations in dense-Schur form (landmark block
    split out as a diagonal) — one pass, scatter-free.  Returns (sys, cost)."""
    dtype = x.P.dtype
    s = _empty_system(cfg, dtype)

    rp = _prior_residual(cfg, x, prior)
    Jp = prior.J * prior.valid.astype(dtype)
    s = s._replace(
        Hpp=s.Hpp.at[:NX, :NX].add(Jp.T @ Jp),
        gp=s.gp.at[:NX].add(Jp.T @ rp),
    )
    cost = jnp.sum(rp * rp)

    r_proj, Jl_proj = _proj_grid(cfg, x, vis, with_jac=True)
    s = _accumulate_proj_s(cfg, vis, r_proj, Jl_proj, s)
    cost = cost + jnp.sum(r_proj * r_proj)

    if cfg.with_relo and relo is not None:
        r_rl, Jl_rl = _relo_grid(cfg, x, vis, relo, with_jac=True)
        s = _accumulate_relo_s(cfg, vis, r_rl, Jl_rl, s)
        cost = cost + jnp.sum(r_rl * r_rl)

    if cfg.use_imu and imu is not None:
        if sqrt_infos is None:
            sqrt_infos = _imu_sqrt_infos(imu)
        r_imu, Jl_imu = _imu_batch(cfg, x, imu, gravity, sqrt_infos, with_jac=True)
        s = _accumulate_imu_s(cfg, r_imu, Jl_imu, s)
        cost = cost + jnp.sum(r_imu * r_imu)

    return s, 0.5 * cost


def _full_from_structured(cfg: SolverConfig, s: StructuredSystem):
    """Expand the Schur-form system into the flat (NT,NT) layout
    [NX | MAXF λ | 6 relo] (compat path for marginalization/tests)."""
    nt = cfg.nt
    maxf = cfg.maxf
    dtype = s.Hpp.dtype
    H = jnp.zeros((nt, nt), dtype)
    g = jnp.zeros((nt,), dtype)
    H = H.at[:NX, :NX].set(s.Hpp[:NX, :NX])
    H = H.at[:NX, NX:NX + maxf].set(s.Hpl[:NX])
    H = H.at[NX:NX + maxf, :NX].set(s.Hpl[:NX].T)
    H = H.at[jnp.arange(NX, NX + maxf), jnp.arange(NX, NX + maxf)].set(s.dl)
    g = g.at[:NX].set(s.gp[:NX])
    g = g.at[NX:NX + maxf].set(s.gl)
    if cfg.with_relo:
        RO = cfg.relo_off
        H = H.at[RO:RO + 6, RO:RO + 6].set(s.Hpp[NX:NX + 6, NX:NX + 6])
        H = H.at[RO:RO + 6, :NX].set(s.Hpp[NX:NX + 6, :NX])
        H = H.at[:NX, RO:RO + 6].set(s.Hpp[:NX, NX:NX + 6])
        H = H.at[RO:RO + 6, NX:NX + maxf].set(s.Hpl[NX:NX + 6])
        H = H.at[NX:NX + maxf, RO:RO + 6].set(s.Hpl[NX:NX + 6].T)
        g = g.at[RO:RO + 6].set(s.gp[NX:NX + 6])
    return H, g


def normal_equations(
    cfg: SolverConfig,
    x: WindowState,
    vis: VisualData,
    imu: Optional[ImuData],
    prior: PriorFactor,
    gravity: jax.Array,
    sqrt_infos: Optional[jax.Array] = None,
    relo: Optional[ReloData] = None,
):
    """Assemble (H (NT,NT), g (NT,), cost) — flat-layout compat wrapper
    around ``normal_equations_structured``."""
    s, cost = normal_equations_structured(
        cfg, x, vis, imu, prior, gravity, sqrt_infos, relo)
    H, g = _full_from_structured(cfg, s)
    return H, g, cost


def total_cost(cfg, x, lam_vec, vis, imu, prior, gravity, sqrt_infos=None,
               relo=None):
    """Residual-only cost (no Jacobians) for LM accept/reject."""
    vis_c = vis._replace(inv_depth=lam_vec)
    rp = _prior_residual(cfg, x, prior)
    cost = jnp.sum(rp * rp)
    r_proj, _ = _proj_grid(cfg, x, vis_c, with_jac=False)
    cost = cost + jnp.sum(r_proj * r_proj)
    if cfg.with_relo and relo is not None:
        r_rl, _ = _relo_grid(cfg, x, vis_c, relo, with_jac=False)
        cost = cost + jnp.sum(r_rl * r_rl)
    if cfg.use_imu and imu is not None:
        if sqrt_infos is None:
            sqrt_infos = _imu_sqrt_infos(imu)
        r_imu, _ = _imu_batch(cfg, x, imu, gravity, sqrt_infos, with_jac=False)
        cost = cost + jnp.sum(r_imu * r_imu)
    return 0.5 * cost


def build_system(
    cfg: SolverConfig,
    x: WindowState,
    vis: VisualData,
    imu: Optional[ImuData],
    prior: PriorFactor,
    gravity: jax.Array,
):
    """Dense-row system (NR × NT) — kept for marginalization H/b assembly
    and testing; the hot LM path uses ``normal_equations`` instead.

    Note: H = JᵀJ, b = Jᵀr of this system equal the normal_equations
    output by construction."""
    H, g, _ = normal_equations(cfg, x, vis, imu, prior, gravity)
    return H, g


# ---------------------------------------------------------------------------
# LM driver
# ---------------------------------------------------------------------------


class SolveResult(NamedTuple):
    x: WindowState
    inv_depth: jax.Array  # (MAXF,)
    cost0: jax.Array
    cost: jax.Array
    iters_accepted: jax.Array
    relo_P: Optional[jax.Array] = None  # optimized relo pose (with_relo)
    relo_Q: Optional[jax.Array] = None


def solve(
    cfg: SolverConfig,
    x0: WindowState,
    vis: VisualData,
    imu: Optional[ImuData],
    prior: PriorFactor,
    gravity: jax.Array,
    td_free=None,
    relo: Optional[ReloData] = None,
    sqrt_infos: Optional[jax.Array] = None,
) -> SolveResult:
    """Damped Gauss-Newton with accept/reject, ≤``max_iters`` steps.

    Equivalent role to the reference's Ceres DOGLEG solve within its
    8-iteration/0.04 s budget (estimator.cpp:1348-1363); trust-region
    control via the LM multiplier."""
    dtype = x0.P.dtype
    if cfg.with_relo and relo is None:
        relo = empty_relo(cfg.maxf, dtype)
    relo_active = relo.active if (cfg.with_relo and relo is not None) else None
    fm = free_mask(cfg, vis, dtype, td_free, relo_active)
    if sqrt_infos is None:
        sqrt_infos = _imu_sqrt_infos(imu) if (cfg.use_imu and imu is not None) else None
    RO = cfg.relo_off
    nP = nxp(cfg)
    # p-side / λ split of the free mask (structured layout: relo after NX)
    fmp = jnp.concatenate([fm[:NX], fm[RO:RO + 6]]) if cfg.with_relo else fm[:NX]
    fml = fm[NX:NX + cfg.maxf]

    # Delayed-accept LM: ONE assembly per iteration.  The normal-equations
    # pass already yields the exact cost at its evaluation point, so
    # iteration k both (a) scores iteration k-1's candidate and (b)
    # provides the system for the next step — no separate residual-only
    # ``total_cost`` pass (which costs as much as the assembly itself in
    # the vmapped batched mode).  On reject, the stored best system is
    # re-solved with the increased damping (classic LM retry).
    def damped_step(s: StructuredSystem, lm):
        Hpp = s.Hpp * fmp[None, :] * fmp[:, None]
        Hpl = s.Hpl * fmp[:, None] * fml[None, :]
        dl = s.dl * fml
        gp = s.gp * fmp
        gl = s.gl * fml
        damp_p = lm * jnp.maximum(jnp.diagonal(Hpp), 1e-6) + (1.0 - fmp)
        damp_l = lm * jnp.maximum(dl, 1e-6) + (1.0 - fml)
        A = Hpp + jnp.diag(damp_p)
        D = dl + damp_l
        Dinv = 1.0 / D
        # dense Schur on the diagonal λ block (Ceres DENSE_SCHUR analog)
        S = A - (Hpl * Dinv[None, :]) @ Hpl.T
        gs = gp - Hpl @ (Dinv * gl)
        L = jnp.linalg.cholesky(S)
        dxp = -jax.scipy.linalg.cho_solve((L, True), gs)
        dxl = -Dinv * (gl + Hpl.T @ dxp)
        return dxp * fmp, dxl * fml

    def advance(x, lam_vec, rP, rQ, dxp, dxl):
        x_new = boxplus(x, dxp[:NX])
        lam_new = lam_vec + dxl
        if cfg.with_relo:
            rP_new = rP + dxp[NX:NX + 3]
            rQ_new = quat.qboxplus(rQ, dxp[NX + 3:NX + 6])
        else:
            rP_new, rQ_new = rP, rQ
        return x_new, lam_new, rP_new, rQ_new

    def step(carry, _):
        best, cost_b, sys_b, lm, cand = carry
        xc, lamc, rPc, rQc = cand
        vis_c = vis._replace(inv_depth=lamc)
        relo_c = relo._replace(P=rPc, Q=rQc) if cfg.with_relo else None
        s_c, cost_c = normal_equations_structured(
            cfg, xc, vis_c, imu, prior, gravity, sqrt_infos, relo_c)
        accept = (cost_c < cost_b) & jnp.isfinite(cost_c)
        sel = lambda a, b: jax.tree.map(
            lambda u, v: jnp.where(accept, u, v), a, b)
        cur = sel(cand, best)
        cost_cur = jnp.where(accept, cost_c, cost_b)
        sys_cur = sel(s_c, sys_b)
        # the bootstrap iteration (cost_b = inf) always accepts x0 — that is
        # not evidence about the damping, so leave lambda at lm_lambda0 for
        # the first real GN step
        bootstrap = ~jnp.isfinite(cost_b)
        lm = jnp.where(bootstrap, lm,
                       jnp.where(accept, lm * cfg.lm_down, lm * cfg.lm_up))
        dxp, dxl = damped_step(sys_cur, lm)
        cand_new = advance(*cur, dxp, dxl)
        return (cur, cost_cur, sys_cur, lm, cand_new), (accept, cost_c)

    rP0 = relo.P if cfg.with_relo else jnp.zeros(3, dtype)
    rQ0 = relo.Q if cfg.with_relo else quat.q_identity(dtype)
    cand0 = (x0, vis.inv_depth, rP0, rQ0)
    init = (cand0, jnp.asarray(jnp.inf, dtype), _empty_system(cfg, dtype),
            jnp.asarray(cfg.lm_lambda0, dtype), cand0)
    # +1: iteration k scores candidate k-1, so the last produced candidate
    # is never scored — run one extra iteration to match the old loop's
    # max_iters *scored* steps
    (best, cost, _, _, _), (accepts, costs) = jax.lax.scan(
        step, init, None, length=cfg.max_iters + 1)
    x, lam_vec, rP, rQ = best
    cost0 = costs[0]

    if cfg.yaw_gauge and cfg.use_imu and not cfg.fix_pose0:
        x = yaw_gauge_fix(x, x0)
    return SolveResult(
        x=x, inv_depth=lam_vec, cost0=cost0, cost=cost,
        # first accept is x0 itself; clamp so an all-reject run (non-finite
        # initial cost) reports 0, not -1
        iters_accepted=jnp.maximum(jnp.sum(accepts) - 1, 0),
        relo_P=rP if cfg.with_relo else None,
        relo_Q=rQ if cfg.with_relo else None,
    )
