"""IMU preintegration (layer L3).

Midpoint preintegration of Δp/Δq/Δv between image frames with first-order
bias Jacobians and covariance propagation — the capability of the
reference's ``IntegrationBase``
(``/root/reference/vins_estimator/src/factor/integration_base.h:56-216``):
15×15 state Jacobian, 15×18 noise mapping, bias-corrected residual
``evaluate``, and ``repropagate`` on bias updates.

TPU-native design:
  * one ``lax.scan`` over a *fixed-length, zero-padded* IMU sample buffer
    (padding steps have dt=0, which makes the midpoint update an exact
    identity — no masking branches needed in the integrals; the Jacobian/
    covariance update is likewise identity at dt=0);
  * the whole window's 10 preintegrations batch under ``vmap`` so the
    backend re-propagates all of them in one fused program when biases
    move;
  * state ordering [δp(0:3), δθ(3:6), δv(6:9), δba(9:12), δbg(12:15)].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import quaternion as quat

# State block offsets (same layout as the reference's O_P/O_R/O_V/O_BA/O_BG).
O_P, O_R, O_V, O_BA, O_BG = 0, 3, 6, 9, 12


class ImuNoise(NamedTuple):
    """Continuous-ish noise stds (config acc_n/gyr_n/acc_w/gyr_w)."""

    acc_n: jax.Array
    gyr_n: jax.Array
    acc_w: jax.Array
    gyr_w: jax.Array


class Preintegrated(NamedTuple):
    """Result of integrating one inter-frame IMU batch at linearization
    biases (ba, bg)."""

    delta_p: jax.Array  # (3,)
    delta_q: jax.Array  # (4,) wxyz
    delta_v: jax.Array  # (3,)
    jacobian: jax.Array  # (15,15) d(state)/d(state0 incl. biases)
    covariance: jax.Array  # (15,15)
    sum_dt: jax.Array  # ()
    linearized_ba: jax.Array  # (3,)
    linearized_bg: jax.Array  # (3,)


def _noise_diag(noise: ImuNoise, dtype) -> jax.Array:
    """Diagonal of the 18×18 noise covariance: [n_a0, n_g0, n_a1, n_g1, n_ba, n_bg]²."""
    def rep(v):
        return jnp.full((3,), v, dtype=dtype) ** 2

    return jnp.concatenate(
        [rep(noise.acc_n), rep(noise.gyr_n), rep(noise.acc_n), rep(noise.gyr_n),
         rep(noise.acc_w), rep(noise.gyr_w)]
    )


def midpoint_step(carry, dt, acc0, gyr0, acc1, gyr1, ba, bg, noise_diag):
    """One midpoint update of (Δp, Δq, Δv, J, P).

    Implements the discrete midpoint model of the reference's
    ``midPointIntegration`` (``integration_base.h:56-134``): the rotation
    advances by the first-order quaternion of the bias-corrected mean gyro,
    acceleration is averaged across the rotated endpoints, and the error
    state propagates as J ← F·J, P ← F·P·Fᵀ + V·Q·Vᵀ.
    """
    delta_p, delta_q, delta_v, J, P = carry
    dtype = delta_p.dtype
    dt = dt.astype(dtype)

    un_acc_0 = quat.qrot(delta_q, acc0 - ba)
    un_gyr = 0.5 * (gyr0 + gyr1) - bg
    dq_new = quat.qnormalize(quat.qmul(delta_q, quat.dq_small(un_gyr * dt)))
    un_acc_1 = quat.qrot(dq_new, acc1 - ba)
    un_acc = 0.5 * (un_acc_0 + un_acc_1)
    dp_new = delta_p + delta_v * dt + 0.5 * un_acc * dt * dt
    dv_new = delta_v + un_acc * dt

    # --- error-state transition F (15x15) and noise map V (15x18) ---
    I3 = jnp.eye(3, dtype=dtype)
    R0 = quat.q2R(delta_q)
    R1 = quat.q2R(dq_new)
    w_x = quat.skew(un_gyr)
    a0_x = quat.skew(acc0 - ba)
    a1_x = quat.skew(acc1 - ba)
    ImW = I3 - w_x * dt

    F = jnp.zeros((15, 15), dtype=dtype)
    F = F.at[O_P:O_P + 3, O_P:O_P + 3].set(I3)
    F = F.at[O_P:O_P + 3, O_R:O_R + 3].set(
        -0.25 * R0 @ a0_x * dt * dt - 0.25 * R1 @ a1_x @ ImW * dt * dt
    )
    F = F.at[O_P:O_P + 3, O_V:O_V + 3].set(I3 * dt)
    F = F.at[O_P:O_P + 3, O_BA:O_BA + 3].set(-0.25 * (R0 + R1) * dt * dt)
    F = F.at[O_P:O_P + 3, O_BG:O_BG + 3].set(0.25 * R1 @ a1_x * dt * dt * dt)
    F = F.at[O_R:O_R + 3, O_R:O_R + 3].set(ImW)
    F = F.at[O_R:O_R + 3, O_BG:O_BG + 3].set(-I3 * dt)
    F = F.at[O_V:O_V + 3, O_R:O_R + 3].set(
        -0.5 * R0 @ a0_x * dt - 0.5 * R1 @ a1_x @ ImW * dt
    )
    F = F.at[O_V:O_V + 3, O_V:O_V + 3].set(I3)
    F = F.at[O_V:O_V + 3, O_BA:O_BA + 3].set(-0.5 * (R0 + R1) * dt)
    F = F.at[O_V:O_V + 3, O_BG:O_BG + 3].set(0.5 * R1 @ a1_x * dt * dt)
    F = F.at[O_BA:O_BA + 3, O_BA:O_BA + 3].set(I3)
    F = F.at[O_BG:O_BG + 3, O_BG:O_BG + 3].set(I3)

    V = jnp.zeros((15, 18), dtype=dtype)
    v03 = -0.125 * R1 @ a1_x * dt * dt * dt  # 0.25 · R1·a1ₓ · dt² · 0.5dt with sign
    V = V.at[O_P:O_P + 3, 0:3].set(0.25 * R0 * dt * dt)
    V = V.at[O_P:O_P + 3, 3:6].set(v03)
    V = V.at[O_P:O_P + 3, 6:9].set(0.25 * R1 * dt * dt)
    V = V.at[O_P:O_P + 3, 9:12].set(v03)
    V = V.at[O_R:O_R + 3, 3:6].set(0.5 * I3 * dt)
    V = V.at[O_R:O_R + 3, 9:12].set(0.5 * I3 * dt)
    v63 = -0.25 * R1 @ a1_x * dt * dt
    V = V.at[O_V:O_V + 3, 0:3].set(0.5 * R0 * dt)
    V = V.at[O_V:O_V + 3, 3:6].set(v63)
    V = V.at[O_V:O_V + 3, 6:9].set(0.5 * R1 * dt)
    V = V.at[O_V:O_V + 3, 9:12].set(v63)
    V = V.at[O_BA:O_BA + 3, 12:15].set(I3 * dt)
    V = V.at[O_BG:O_BG + 3, 15:18].set(I3 * dt)

    J_new = F @ J
    P_new = F @ P @ F.T + (V * noise_diag[None, :]) @ V.T
    return (dp_new, dq_new, dv_new, J_new, P_new)


def preintegrate_serial(
    dts: jax.Array,  # (N,) zero-padded
    accs: jax.Array,  # (N+1, 3) sample i spans [i -> i+1]; accs[0] is acc_0
    gyrs: jax.Array,  # (N+1, 3)
    ba: jax.Array,
    bg: jax.Array,
    noise: ImuNoise,
) -> Preintegrated:
    """Reference-shaped serial integration (one ``lax.scan``).  Kept as the
    numerical ground truth for the parallel-prefix ``preintegrate`` below;
    not on the hot path."""
    dtype = accs.dtype
    nd = _noise_diag(noise, dtype)
    init = (
        jnp.zeros(3, dtype),
        quat.q_identity(dtype),
        jnp.zeros(3, dtype),
        jnp.eye(15, dtype=dtype),
        jnp.zeros((15, 15), dtype=dtype),
    )

    def step(carry, inp):
        dt, a0, g0, a1, g1 = inp
        return midpoint_step(carry, dt, a0, g0, a1, g1, ba, bg, nd), None

    xs = (dts, accs[:-1], gyrs[:-1], accs[1:], gyrs[1:])
    (dp, dq, dv, J, P), _ = jax.lax.scan(step, init, xs)
    return Preintegrated(
        delta_p=dp, delta_q=dq, delta_v=dv, jacobian=J, covariance=P,
        sum_dt=jnp.sum(dts.astype(dtype)),
        linearized_ba=ba, linearized_bg=bg,
    )


def _fv_step(dt, acc0, acc1, un_gyr, q0, q1, ba, dtype):
    """F (15,15) / V (15,18) of one midpoint step, given the *already
    integrated* attitudes q0 (before) and q1 (after) — identical math to
    ``midpoint_step``, assembled by 3×3-block concatenation (NOT
    ``.at[].set``: under vmap each dynamic-update-slice rewrites the whole
    (...,15,15) tensor — ~25 full-array round trips per build)."""
    I3 = jnp.eye(3, dtype=dtype)
    Z3 = jnp.zeros((3, 3), dtype=dtype)
    R0 = quat.q2R(q0)
    R1 = quat.q2R(q1)
    w_x = quat.skew(un_gyr)
    a0_x = quat.skew(acc0 - ba)
    a1_x = quat.skew(acc1 - ba)
    ImW = I3 - w_x * dt
    R1a1 = R1 @ a1_x

    def rows(*blks):
        return jnp.concatenate(blks, axis=1)

    F = jnp.concatenate([
        rows(I3,
             -0.25 * R0 @ a0_x * dt * dt - 0.25 * R1a1 @ ImW * dt * dt,
             I3 * dt,
             -0.25 * (R0 + R1) * dt * dt,
             0.25 * R1a1 * dt * dt * dt),
        rows(Z3, ImW, Z3, Z3, -I3 * dt),
        rows(Z3,
             -0.5 * R0 @ a0_x * dt - 0.5 * R1a1 @ ImW * dt,
             I3,
             -0.5 * (R0 + R1) * dt,
             0.5 * R1a1 * dt * dt),
        rows(Z3, Z3, Z3, I3, Z3),
        rows(Z3, Z3, Z3, Z3, I3),
    ], axis=0)

    v03 = -0.125 * R1a1 * dt * dt * dt
    v63 = -0.25 * R1a1 * dt * dt
    V = jnp.concatenate([
        rows(0.25 * R0 * dt * dt, v03, 0.25 * R1 * dt * dt, v03, Z3, Z3),
        rows(Z3, 0.5 * I3 * dt, Z3, 0.5 * I3 * dt, Z3, Z3),
        rows(0.5 * R0 * dt, v63, 0.5 * R1 * dt, v63, Z3, Z3),
        rows(Z3, Z3, Z3, Z3, I3 * dt, Z3),
        rows(Z3, Z3, Z3, Z3, Z3, I3 * dt),
    ], axis=0)
    return F, V


def preintegrate(
    dts: jax.Array,  # (N,) zero-padded
    accs: jax.Array,  # (N+1, 3) sample i spans [i -> i+1]; accs[0] is acc_0
    gyrs: jax.Array,  # (N+1, 3)
    ba: jax.Array,
    bg: jax.Array,
    noise: ImuNoise,
) -> Preintegrated:
    """Integrate a fixed-length padded IMU window — parallel-prefix form.

    Same midpoint model as the reference's ``midPointIntegration``
    (``integration_base.h:56-134``) but evaluated with log-depth parallel
    primitives instead of a serial recurrence (32 sequential scan steps of
    tiny 15×15 matmuls cost ~26 ms for one vmapped 8×10 interval batch —
    the sequential chain, not the FLOPs, is the cost on TPU):

      1. attitude: per-step Δq in parallel, prefix products via
         ``lax.associative_scan`` (quaternion product is associative);
      2. Δv/Δp: elementwise midpoint accelerations then two ``cumsum``s;
      3. J/P: per-step (F, V·Q·Vᵀ) built in one vmapped batch, then a
         binary tree reduction under the affine composition
         (F₂, Q₂)∘(F₁, Q₁) = (F₂F₁, F₂Q₁F₂ᵀ + Q₂) — J is the reduced F
         (J₀ = I) and P the reduced Q (P₀ = 0).

    Padded steps (dt = 0) are exact identities under all three.
    ``dts[i]`` spans samples i → i+1.  This is also ``repropagate``
    (``integration_base.h:40-54``): call again with new (ba, bg).
    """
    dtype = accs.dtype
    N = dts.shape[0]
    nd = _noise_diag(noise, dtype)
    dt = dts.astype(dtype)

    # 1. attitude chain (prefix quaternion products)
    un_gyr = 0.5 * (gyrs[:-1] + gyrs[1:]) - bg  # (N,3)
    dq = jax.vmap(quat.dq_small)(un_gyr * dt[:, None])  # (N,4)
    pref = jax.lax.associative_scan(jax.vmap(quat.qmul), dq)
    q_after = jax.vmap(quat.qnormalize)(pref)  # Δq after step k
    q_before = jnp.concatenate(
        [quat.q_identity(dtype)[None], q_after[:-1]], axis=0)

    # 2. velocity / position integrals (midpoint accel + cumsums)
    un_acc = 0.5 * (
        jax.vmap(quat.qrot)(q_before, accs[:-1] - ba)
        + jax.vmap(quat.qrot)(q_after, accs[1:] - ba)
    )  # (N,3)
    v_after = jnp.cumsum(un_acc * dt[:, None], axis=0)
    v_before = jnp.concatenate([jnp.zeros((1, 3), dtype), v_after[:-1]], axis=0)
    delta_p = jnp.sum(v_before * dt[:, None] + 0.5 * un_acc * dt[:, None] ** 2,
                      axis=0)
    delta_v = v_after[-1]
    delta_q = q_after[-1]

    # 3. error-state transition / noise, tree-reduced
    F, V = jax.vmap(
        lambda d, a0, a1, g, q0, q1: _fv_step(d, a0, a1, g, q0, q1, ba, dtype)
    )(dt, accs[:-1], accs[1:], un_gyr, q_before, q_after)
    Q = jnp.einsum("nij,j,nkj->nik", V, nd, V)

    M = 1
    while M < N:
        M *= 2
    if M != N:
        padF = jnp.broadcast_to(jnp.eye(15, dtype=dtype), (M - N, 15, 15))
        F = jnp.concatenate([F, padF], axis=0)
        Q = jnp.concatenate([Q, jnp.zeros((M - N, 15, 15), dtype)], axis=0)
    while F.shape[0] > 1:
        # reshape-pairing, NOT F[0::2]/F[1::2]: the strided-slice +
        # transpose pattern trips an XLA TPU compiler crash
        # (DynamicSliceOfTranspose INVALID_ARGUMENT) as of libtpu 2026-08
        K = F.shape[0] // 2
        Fr = F.reshape(K, 2, 15, 15)
        Qr = Q.reshape(K, 2, 15, 15)
        F1, F2 = Fr[:, 0], Fr[:, 1]
        Q1, Q2 = Qr[:, 0], Qr[:, 1]
        FQ = jnp.einsum("nij,njk->nik", F2, Q1)
        F = jnp.einsum("nij,njk->nik", F2, F1)
        Q = jnp.einsum("nij,nkj->nik", FQ, F2) + Q2
    return Preintegrated(
        delta_p=delta_p, delta_q=delta_q, delta_v=delta_v,
        jacobian=F[0], covariance=Q[0],
        sum_dt=jnp.sum(dt),
        linearized_ba=ba, linearized_bg=bg,
    )


def bias_corrected(pre: Preintegrated, bai: jax.Array, bgi: jax.Array):
    """First-order bias correction of (Δp, Δq, Δv) around the linearization
    biases, using the propagated Jacobian blocks (``integration_base.h:164-186``)."""
    dba = bai - pre.linearized_ba
    dbg = bgi - pre.linearized_bg
    J = pre.jacobian
    dq = quat.qnormalize(
        quat.qmul(pre.delta_q, quat.dq_small(J[O_R:O_R + 3, O_BG:O_BG + 3] @ dbg))
    )
    dv = pre.delta_v + J[O_V:O_V + 3, O_BA:O_BA + 3] @ dba + J[O_V:O_V + 3, O_BG:O_BG + 3] @ dbg
    dp = pre.delta_p + J[O_P:O_P + 3, O_BA:O_BA + 3] @ dba + J[O_P:O_P + 3, O_BG:O_BG + 3] @ dbg
    return dp, dq, dv


def evaluate(
    pre: Preintegrated,
    Pi, Qi, Vi, Bai, Bgi,
    Pj, Qj, Vj, Baj, Bgj,
    gravity: jax.Array,
) -> jax.Array:
    """15-dim preintegration residual between frames i and j
    (``integration_base.h:164-195``).  Gravity points *up-scaled* world +z:
    G = (0,0,g_norm) as in the reference's parameters."""
    dp, dq, dv = bias_corrected(pre, Bai, Bgi)
    sdt = pre.sum_dt
    r_p = quat.qrot_inv(Qi, 0.5 * gravity * sdt * sdt + Pj - Pi - Vi * sdt) - dp
    r_q = 2.0 * quat.qmul(quat.qconj(dq), quat.qmul(quat.qconj(Qi), Qj))[1:4]
    r_v = quat.qrot_inv(Qi, gravity * sdt + Vj - Vi) - dv
    return jnp.concatenate([r_p, r_q, r_v, Baj - Bai, Bgj - Bgi])


def _chol15_inv(cov: jax.Array) -> jax.Array:
    """L⁻¹ for cov = L·Lᵀ, statically unrolled over the 15 columns.

    NOT jnp.linalg.cholesky + solve_triangular: on TPU those lower to
    loop-heavy kernels that cost ~26 ms for the batched (8×10) 15×15
    whitening factors of one vmapped step; the unrolled form is ~200 fused
    vector ops that parallelize across the batch for free."""
    n = 15
    dtype = cov.dtype
    L = jnp.zeros_like(cov)
    Inv = jnp.zeros_like(cov)
    for j in range(n):
        # column j of the Cholesky factor
        s = cov[..., j:, j] - jnp.einsum(
            "...ik,...k->...i", L[..., j:, :j], L[..., j, :j])
        d = jnp.sqrt(jnp.maximum(s[..., 0], 1e-30))
        col = s / d[..., None]
        L = L.at[..., j:, j].set(col)
        # forward substitution for row j of L⁻¹:
        #   Inv[j, :j] = -(L[j, :j] @ Inv[:j, :j]) / L[j, j]
        rj = -jnp.einsum("...k,...ki->...i", L[..., j, :j], Inv[..., :j, :j]) / d[..., None]
        Inv = Inv.at[..., j, :j].set(rj)
        Inv = Inv.at[..., j, j].set(1.0 / d)
    return Inv


def sqrt_information(pre: Preintegrated, eps: float = 1e-12) -> jax.Array:
    """Whitening factor W with W·cov·Wᵀ = I (lower triangular).

    The reference forms an equivalent factor via LLT of the inverse
    (``imu_factor.h:63-71``); W = L⁻¹ from cov = L·Lᵀ is the same square
    root up to an orthogonal transform and numerically far better on the
    ill-conditioned preintegration covariance."""
    dtype = pre.covariance.dtype
    cov = pre.covariance + eps * jnp.eye(15, dtype=dtype)
    return _chol15_inv(cov)
