"""Schur-complement marginalization prior (fixed-shape, MXU-friendly).

Replaces the reference's ``MarginalizationInfo`` machinery
(``/root/reference/vins_estimator/src/factor/marginalization_factor.{h,cpp}``):
collect the factors touching the dropped blocks, assemble (H, b), Schur-
eliminate the dropped dims with an eigendecomposition pseudo-inverse
(eps=1e-8 clamp, ``marginalization_factor.h:75``, ``.cpp:276-296``), store
the result as a linearized prior via the eigen square root (``.cpp:298-308``),
and re-map kept blocks to their post-slide slots (the address-shift map,
``estimator.cpp:1483-1497, 1545-1566``).

TPU-native design: because the window layout is static, BOTH drop sets are
*static index lists* —

  * marginalize-oldest: pose0 (6) + speedbias0 (9) + ALL landmark columns
    (non-participating landmarks have zero rows, so the pseudo-inverse
    ignores them for free);
  * marginalize-second-newest: pose[W-1] only, from a prior-only system
    (the reference asserts sb[W-1] never enters the prior).

The 4-pthread Hessian assembly of the reference collapses into the dense
JᵀJ contraction of ``ops.solver.build_system``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..backend.state import (
    WINDOW_SIZE, NP, NX, EX_OFF, POSE_DIM, SB_DIM, WindowState,
)
from ..utils import quaternion as quat
from . import solver as solver_mod
from .solver import PriorFactor, SolverConfig, VisualData

EIG_EPS = 1e-8  # reference marginalization_factor.h:75


# ---------------------------------------------------------------------------
# Static index bookkeeping
# ---------------------------------------------------------------------------


def _pose_dims(i):
    return list(range(POSE_DIM * i, POSE_DIM * (i + 1)))


def _sb_dims(i):
    return list(range(NP + SB_DIM * i, NP + SB_DIM * (i + 1)))


def drop_keep_old(maxf: int):
    """Drop pose0+sb0+all landmarks; keep the remaining pose-side dims."""
    drop = _pose_dims(0) + _sb_dims(0) + list(range(NX, NX + maxf))
    keep = [d for d in range(NX) if d not in set(_pose_dims(0) + _sb_dims(0))]
    return np.asarray(drop), np.asarray(keep)


def drop_keep_new(maxf: int):
    """Drop pose[W-1] only (prior-only problem)."""
    drop = _pose_dims(WINDOW_SIZE - 1)
    keep = [d for d in range(NX) if d not in set(drop)]
    return np.asarray(drop), np.asarray(keep)


def _shifted_positions_old(keep: np.ndarray) -> np.ndarray:
    """Post-slide position of each kept dim for marginalize-oldest:
    pose k -> pose k-1, sb k -> sb k-1, ex/td unchanged."""
    pos = []
    for d in keep:
        if d < NP:  # pose dim
            k, o = divmod(d, POSE_DIM)
            pos.append(POSE_DIM * (k - 1) + o)
        elif d < EX_OFF:  # sb dim
            k, o = divmod(d - NP, SB_DIM)
            pos.append(NP + SB_DIM * (k - 1) + o)
        else:
            pos.append(d)
    return np.asarray(pos)


def _shifted_positions_new(keep: np.ndarray) -> np.ndarray:
    """Post-slide position for marginalize-second-newest:
    pose/sb of slot W move to slot W-1; everything else unchanged."""
    pos = []
    for d in keep:
        if d < NP:
            k, o = divmod(d, POSE_DIM)
            k2 = WINDOW_SIZE - 1 if k == WINDOW_SIZE else k
            pos.append(POSE_DIM * k2 + o)
        elif d < EX_OFF:
            k, o = divmod(d - NP, SB_DIM)
            k2 = WINDOW_SIZE - 1 if k == WINDOW_SIZE else k
            pos.append(NP + SB_DIM * k2 + o)
        else:
            pos.append(d)
    return np.asarray(pos)


# ---------------------------------------------------------------------------
# State slide helpers (used by prior construction AND the estimator)
# ---------------------------------------------------------------------------


def shift_state_old(x: WindowState) -> WindowState:
    """Slide-out-oldest: slot i <- slot i+1; last slot duplicates the newest
    (the reference re-seeds slot W with the latest values, estimator.cpp:
    1580-1652)."""

    def roll(a):
        out = jnp.roll(a, -1, axis=0)
        return out.at[-1].set(a[-1])

    return WindowState(
        P=roll(x.P), Q=roll(x.Q), V=roll(x.V), Ba=roll(x.Ba), Bg=roll(x.Bg),
        tic=x.tic, qic=x.qic, td=x.td,
    )


def shift_state_new(x: WindowState) -> WindowState:
    """Slide-out-second-newest: slot W-1 <- slot W (estimator.cpp:1654-1716)."""

    def mv(a):
        return a.at[WINDOW_SIZE - 1].set(a[WINDOW_SIZE])

    return WindowState(
        P=mv(x.P), Q=mv(x.Q), V=mv(x.V), Ba=mv(x.Ba), Bg=mv(x.Bg),
        tic=x.tic, qic=x.qic, td=x.td,
    )


# ---------------------------------------------------------------------------
# Core Schur + square-root prior
# ---------------------------------------------------------------------------


def _schur_sqrt_prior(H, b, drop_idx, keep_idx, new_pos, dtype,
                      method: str = "chol"):
    """Eliminate drop dims; return (J', r') embedded in the post-slide NX
    layout.

    The index sets are STATIC (numpy): the selects/embeds are constant
    one-hot matmuls (MXU), not gathers/scatters — traced-index
    ``jnp.ix_`` gathers and the ``at[:, new_pos].set`` scatter cost
    ~13 ms/step of the batched scan (device-trace measured).

    method="eigh": the reference's eigendecomposition pseudo-inverse +
    eigen square root (exact rank handling; TPU eigh is Jacobi-slow).
    method="chol" (default): jittered Cholesky factors — (Hdd+ε)⁻¹ via
    triangular solves and J' = chol(A'+ε)ᵀ.  The jitter is *diagonal-
    relative* (information scales span ~10 orders between bias-walk and
    pose dims; an absolute εI would dump artificial information on the
    weak/gauge directions), which the per-solve yaw/position re-anchoring
    absorbs.  Much faster than eigh on TPU — and `vmap(lax.cond)` executes
    BOTH marginalization branches, so this runs every frame in batched
    mode."""
    drop_idx = np.asarray(drop_idx)
    keep_idx = np.asarray(keep_idx)
    new_pos = np.asarray(new_pos)
    nH = H.shape[0]
    nd = drop_idx.shape[0]
    nk = keep_idx.shape[0]
    Ed_np = np.zeros((nH, nd), np.float32)
    Ed_np[drop_idx, np.arange(nd)] = 1.0
    Ek_np = np.zeros((nH, nk), np.float32)
    Ek_np[keep_idx, np.arange(nk)] = 1.0
    Ed = jnp.asarray(Ed_np, dtype)
    Ek = jnp.asarray(Ek_np, dtype)

    HEd = H @ Ed
    HEk = H @ Ek
    Hdd = Ed.T @ HEd
    Hkd = Ek.T @ HEd
    Hkk = Ek.T @ HEk
    bd = Ed.T @ b
    bk = Ek.T @ b

    Hdd = 0.5 * (Hdd + Hdd.T)

    if method == "eigh":
        # eigendecomposition pseudo-inverse (reference .cpp:276-296)
        w, V = jnp.linalg.eigh(Hdd)
        winv = jnp.where(w > EIG_EPS, 1.0 / jnp.maximum(w, EIG_EPS), 0.0)
        Hdd_inv = (V * winv[None, :]) @ V.T
        A = Hkk - Hkd @ Hdd_inv @ Hkd.T
        g = bk - Hkd @ Hdd_inv @ bd
        A = 0.5 * (A + A.T)
        s, U = jnp.linalg.eigh(A)
        good = s > EIG_EPS
        ssqrt = jnp.where(good, jnp.sqrt(jnp.maximum(s, EIG_EPS)), 0.0)
        sinv = jnp.where(good, 1.0 / jnp.maximum(ssqrt, EIG_EPS), 0.0)
        Jp = ssqrt[:, None] * U.T  # (NK, NK)
        rp = (sinv[:, None] * (U.T @ g[:, None]))[:, 0]
    else:
        # diagonal-RELATIVE jitter: information scales differ by ~10 orders
        # between bias-walk and pose dims, so a trace-scaled εI would dump
        # massive artificial info on the weak (gauge) directions
        def jitter(M, n):
            d = jnp.diagonal(M)
            return M + jnp.diag(1e-6 * d + 1e-10 * jnp.max(d) + 1e-20)

        Ld = jnp.linalg.cholesky(jitter(Hdd, nd))
        X = jax.scipy.linalg.cho_solve((Ld, True), Hkd.T)  # Hdd⁻¹ Hdk
        A = Hkk - Hkd @ X
        g = bk - X.T @ bd
        A = 0.5 * (A + A.T)
        Lk = jnp.linalg.cholesky(jitter(A, nk))
        Jp = Lk.T  # (NK, NK) upper-triangular square root: JpᵀJp ≈ A
        # r' with Jpᵀ r' = g  ->  r' = Lk⁻¹ g
        rp = jax.scipy.linalg.solve_triangular(Lk, g, lower=True)

    # embed: rows 0..nk-1, columns at their post-slide positions — a
    # constant placement matmul, not a scatter
    P_np = np.zeros((nk, NX), np.float32)
    P_np[np.arange(nk), new_pos] = 1.0
    J_new = jnp.concatenate(
        [Jp @ jnp.asarray(P_np, dtype), jnp.zeros((NX - nk, NX), dtype)],
        axis=0)
    r_new = jnp.concatenate([rp, jnp.zeros((NX - nk,), dtype)])
    return J_new, r_new


def marginalize_old(
    cfg: SolverConfig,
    x: WindowState,
    vis: VisualData,
    imu,
    prior: PriorFactor,
    gravity: jax.Array,
    sqrt_infos=None,
) -> PriorFactor:
    """Build the new prior when the oldest frame is marginalized.

    Factor subset (exactly the blocks the reference collects,
    estimator.cpp:1376-1481): the previous prior, the IMU factor between
    frames 0-1, and every projection factor whose feature starts at
    frame 0.  Returns the prior already expressed in post-slide slots with
    x0 = slid state.
    """
    dtype = x.P.dtype
    # restrict the visual set to features rooted at frame 0
    vis_m = vis._replace(valid=vis.valid & (vis.start == 0))
    if cfg.use_imu and imu is not None:
        imu_m = imu._replace(
            valid=imu.valid & (jnp.arange(WINDOW_SIZE) == 0)
        )
    else:
        imu_m = imu
    s, _ = solver_mod.normal_equations_structured(
        cfg, x, vis_m, imu_m, prior, gravity, sqrt_infos=sqrt_infos)

    # Stage 1 — eliminate ALL landmark dims first.  The λ block is diagonal,
    # so its pseudo-inverse (the reference's eigendecomp pinv with the
    # EIG_EPS clamp, marginalization_factor.cpp:276-296) is elementwise;
    # Schur complements compose, so (λ then pose0/sb0) equals the joint
    # elimination.  Avoids ever forming the (NX+MAXF)² Hessian.
    Hpp = s.Hpp[:NX, :NX]
    Hpl = s.Hpl[:NX]
    dinv = jnp.where(s.dl > EIG_EPS, 1.0 / jnp.maximum(s.dl, EIG_EPS), 0.0)
    H = Hpp - (Hpl * dinv[None, :]) @ Hpl.T
    b = s.gp[:NX] - Hpl @ (dinv * s.gl)

    # Stage 2 — eliminate pose0+sb0 (15 static dims) and emit the sqrt prior.
    drop = np.asarray(_pose_dims(0) + _sb_dims(0))
    keep = np.asarray([d for d in range(NX) if d not in set(drop.tolist())])
    new_pos = _shifted_positions_old(keep)
    J_new, r_new = _schur_sqrt_prior(
        H, b, drop, keep, new_pos, dtype
    )
    return PriorFactor(J=J_new, r0=r_new, x0=shift_state_old(x), valid=jnp.asarray(True))


def marginalize_new(
    cfg: SolverConfig,
    x: WindowState,
    prior: PriorFactor,
) -> PriorFactor:
    """Prior update when the second-newest frame is discarded: re-linearize
    the prior alone and Schur-eliminate pose[W-1] (estimator.cpp:1504-1574)."""
    from ..backend.state import boxminus

    dtype = x.P.dtype
    dx = boxminus(x, prior.x0)
    r = (prior.r0 + prior.J @ dx) * prior.valid.astype(dtype)
    Jm = prior.J * prior.valid.astype(dtype)
    H = Jm.T @ Jm
    b = Jm.T @ r

    drop, keep = drop_keep_new(cfg.maxf)
    new_pos = _shifted_positions_new(keep)
    J_new, r_new = _schur_sqrt_prior(
        H, b, drop, keep, new_pos, dtype
    )
    return PriorFactor(
        J=J_new, r0=r_new, x0=shift_state_new(x), valid=prior.valid
    )
