"""Batched Levenberg-Marquardt sliding-window solver (the Ceres replacement).

The reference hands its window problem to Ceres (DENSE_SCHUR + DOGLEG,
≤8 iterations / ≤0.04 s, ``/root/reference/vins_estimator/src/estimator/
estimator.cpp:1161-1363``) with factors added per feature/frame in Python-
style loops.  Here the whole nonlinear solve is ONE fused XLA program:

  * factor enumeration is a *static* (MAXF × FRAMES) grid for visual
    factors + WINDOW_SIZE IMU factors + one prior block, with validity
    masks instead of dynamic lists;
  * all residuals/Jacobians evaluate as vmapped batches; each factor's
    local Jacobian is placed into a dense row of the global (NR × NT)
    Jacobian via ``dynamic_update_slice`` (the only dynamic index is the
    feature's start frame);
  * H = JᵀJ and g = Jᵀr are single MXU contractions — the reference's
    4-thread Hessian-assembly shard/reduce (``marginalization_factor.cpp:
    240-271``) collapses into one matmul;
  * the LM loop (damped GN with accept/reject) runs under ``lax.scan``
    with a fixed iteration budget, honoring the reference's realtime
    envelope semantics (≤8 iterations);
  * gauge freedom: frame-0 position/yaw re-anchored post-solve
    (``double2vector``, estimator.cpp:985-1111) and/or frozen via the
    free-parameter mask (VO mode fixes pose 0 like the reference's
    ``SetParameterBlockConstant``).

Marginalization (Schur-complement prior with eigendecomposition square
root, ``marginalization_factor.cpp:276-308``) lives in
``ops/marginalization.py`` and reuses this module's system builder.
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

    @property
    def nt(self) -> int:
        return NX + self.maxf

    @property
    def n_proj_rows(self) -> int:
        return 2 * self.maxf * FRAMES

    @property
    def n_imu_rows(self) -> int:
        return 15 * WINDOW_SIZE

    @property
    def nr(self) -> int:
        return NX + self.n_imu_rows + self.n_proj_rows


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


# ---------------------------------------------------------------------------
# System builder
# ---------------------------------------------------------------------------


def _proj_rows(cfg: SolverConfig, x: WindowState, vis: VisualData):
    """All (MAXF × FRAMES) projection factors -> (rows, residuals, weight)."""
    dtype = x.P.dtype
    nt = cfg.nt

    f_idx = jnp.arange(cfg.maxf)
    j_idx = jnp.arange(FRAMES)

    def one_factor(f, j):
        i = vis.start[f]
        meas = factors.ProjMeas(
            pts_i=jnp.concatenate([vis.pts[f, i], jnp.ones((1,), dtype)]),
            pts_j=jnp.concatenate([vis.pts[f, j], jnp.ones((1,), dtype)]),
            vel_i=jnp.concatenate([vis.vel[f, i], jnp.zeros((1,), dtype)]),
            vel_j=jnp.concatenate([vis.vel[f, j], jnp.zeros((1,), dtype)]),
            td_i=vis.td_obs[f, i], td_j=vis.td_obs[f, j],
            row_i=vis.row_scaled[f, i], row_j=vis.row_scaled[f, j],
        )
        r, Jl = factors.projection_factor(
            x.P[i], x.Q[i], x.P[j], x.Q[j], x.tic, x.qic,
            vis.inv_depth[f], x.td, meas,
        )
        ok = vis.valid[f] & vis.obs_mask[f, i] & vis.obs_mask[f, j] & (j != i)
        # hard-select (not multiply): masked rows must be exactly zero even if
        # the padded data produced NaN/inf in the factor evaluation
        r = jnp.where(ok, r, 0.0)
        Jl = jnp.where(ok, Jl, 0.0)
        w = factors.cauchy_weight(r[None], cfg.cauchy_c)[0, 0]
        # place local J (2,20) into global row (2, NT)
        zero = jnp.asarray(0, jnp.int32)
        row = jnp.zeros((2, nt), dtype)
        row = jax.lax.dynamic_update_slice(
            row, Jl[:, 0:6], (zero, (POSE_DIM * i).astype(jnp.int32)))
        row = jax.lax.dynamic_update_slice(
            row, Jl[:, 6:12], (zero, (POSE_DIM * j).astype(jnp.int32)))
        row = jax.lax.dynamic_update_slice(
            row, Jl[:, 12:18], (zero, jnp.asarray(EX_OFF, jnp.int32)))
        row = row.at[:, NX + f].set(Jl[:, 18])
        row = row.at[:, TD_OFF].set(Jl[:, 19])
        return row * w, r * w

    rows, res = jax.vmap(
        lambda f: jax.vmap(lambda j: one_factor(f, j))(j_idx)
    )(f_idx)
    return rows.reshape(-1, nt), res.reshape(-1)


def _imu_rows(cfg: SolverConfig, x: WindowState, imu: ImuData, gravity):
    dtype = x.P.dtype
    nt = cfg.nt

    def one_factor(j, pre_j, ok):
        r, Jl = factors.imu_factor(
            pre_j,
            x.P[j], x.Q[j], x.V[j], x.Ba[j], x.Bg[j],
            x.P[j + 1], x.Q[j + 1], x.V[j + 1], x.Ba[j + 1], x.Bg[j + 1],
            gravity,
        )
        w = ok.astype(dtype)
        r = jnp.where(ok, r, 0.0)
        Jl = jnp.where(ok, Jl, 0.0)
        zero = jnp.asarray(0, jnp.int32)
        ji = j.astype(jnp.int32)
        row = jnp.zeros((15, nt), dtype)
        row = jax.lax.dynamic_update_slice(row, Jl[:, 0:6], (zero, POSE_DIM * ji))
        row = jax.lax.dynamic_update_slice(row, Jl[:, 6:15], (zero, NP + SB_DIM * ji))
        row = jax.lax.dynamic_update_slice(row, Jl[:, 15:21], (zero, POSE_DIM * (ji + 1)))
        row = jax.lax.dynamic_update_slice(row, Jl[:, 21:30], (zero, NP + SB_DIM * (ji + 1)))
        return row * w, r * w

    rows, res = jax.vmap(one_factor)(jnp.arange(WINDOW_SIZE), imu.pre, imu.valid)
    return rows.reshape(-1, nt), res.reshape(-1)


def _prior_rows(cfg: SolverConfig, x: WindowState, prior: PriorFactor):
    dtype = x.P.dtype
    dx = boxminus(x, prior.x0)
    r = prior.r0 + prior.J @ dx
    w = prior.valid.astype(dtype)
    rows = jnp.concatenate(
        [prior.J, jnp.zeros((NX, cfg.maxf), dtype)], axis=1
    ) * w
    return rows, r * w


def free_mask(cfg: SolverConfig, vis: VisualData, dtype, td_free=None) -> jax.Array:
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
    return m.at[NX:].set(vis.depth_free.astype(dtype))


def build_system(
    cfg: SolverConfig,
    x: WindowState,
    vis: VisualData,
    imu: Optional[ImuData],
    prior: PriorFactor,
    gravity: jax.Array,
):
    """Assemble the dense whitened system: J (NR,NT), r (NR,)."""
    dtype = x.P.dtype
    pr_rows, pr_res = _prior_rows(cfg, x, prior)
    vi_rows, vi_res = _proj_rows(cfg, x, vis)
    if cfg.use_imu:
        im_rows, im_res = _imu_rows(cfg, x, imu, gravity)
    else:
        im_rows = jnp.zeros((cfg.n_imu_rows, cfg.nt), dtype)
        im_res = jnp.zeros((cfg.n_imu_rows,), dtype)
    J = jnp.concatenate([pr_rows, im_rows, vi_rows], axis=0)
    r = jnp.concatenate([pr_res, im_res, vi_res])
    return J, r


def _cost(cfg, x, lam_vec, vis, imu, prior, gravity):
    vis2 = vis._replace(inv_depth=lam_vec)
    _, r = build_system(cfg, x, vis2, imu, prior, gravity)
    return 0.5 * jnp.sum(r * r)


# ---------------------------------------------------------------------------
# LM driver
# ---------------------------------------------------------------------------


class SolveResult(NamedTuple):
    x: WindowState
    inv_depth: jax.Array  # (MAXF,)
    cost0: jax.Array
    cost: jax.Array
    iters_accepted: jax.Array


def solve(
    cfg: SolverConfig,
    x0: WindowState,
    vis: VisualData,
    imu: Optional[ImuData],
    prior: PriorFactor,
    gravity: jax.Array,
    td_free=None,
) -> SolveResult:
    """Damped Gauss-Newton with accept/reject, ≤``max_iters`` steps.

    Equivalent role to the reference's Ceres DOGLEG solve within its
    8-iteration/0.04 s budget (estimator.cpp:1348-1363); trust-region
    control via the LM multiplier."""
    dtype = x0.P.dtype
    fm = free_mask(cfg, vis, dtype, td_free)

    def eval_cost(x, lam_vec):
        return _cost(cfg, x, lam_vec, vis, imu, prior, gravity)

    def step(carry, _):
        x, lam_vec, lm, cost = carry
        vis_c = vis._replace(inv_depth=lam_vec)
        J, r = build_system(cfg, x, vis_c, imu, prior, gravity)
        J = J * fm[None, :]
        H = J.T @ J
        g = J.T @ r
        # LM damping on the diagonal (scale-aware) + unit diag for frozen dims
        diag = jnp.diagonal(H)
        damp = lm * jnp.maximum(diag, 1e-6) + (1.0 - fm)
        Hd = H + jnp.diag(damp)
        L = jnp.linalg.cholesky(Hd)
        dx = -jax.scipy.linalg.cho_solve((L, True), g)
        dx = dx * fm
        x_new = boxplus(x, dx[:NX])
        lam_new = lam_vec + dx[NX:]
        new_cost = eval_cost(x_new, lam_new)
        accept = (new_cost < cost) & jnp.isfinite(new_cost)
        x = jax.tree.map(lambda a, b: jnp.where(accept, b, a), x, x_new)
        lam_vec = jnp.where(accept, lam_new, lam_vec)
        lm = jnp.where(accept, lm * cfg.lm_down, lm * cfg.lm_up)
        cost = jnp.where(accept, new_cost, cost)
        return (x, lam_vec, lm, cost), accept

    cost0 = eval_cost(x0, vis.inv_depth)
    init = (x0, vis.inv_depth, jnp.asarray(cfg.lm_lambda0, dtype), cost0)
    (x, lam_vec, _, cost), accepts = jax.lax.scan(step, init, None, length=cfg.max_iters)

    if cfg.yaw_gauge and cfg.use_imu and not cfg.fix_pose0:
        x = yaw_gauge_fix(x, x0)
    return SolveResult(
        x=x, inv_depth=lam_vec, cost0=cost0, cost=cost,
        iters_accepted=jnp.sum(accepts),
    )
