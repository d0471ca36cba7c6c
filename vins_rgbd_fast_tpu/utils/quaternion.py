"""Quaternion / SO(3) math substrate (layer L0).

Provides the rotation algebra the whole framework builds on, mirroring the
capability surface of the reference's static helper class
(``/root/reference/vins_estimator/src/utility/utility.h:8-140``:
``deltaQ``, ``skewSymmetric``, ``Qleft``, ``Qright``, ``R2ypr``, ``ypr2R``,
``g2R``, ``normalizeAngle``) — re-designed as pure, dtype-preserving,
vmappable JAX functions.

Conventions
-----------
* Quaternions are arrays ``[..., 4]`` in **wxyz** order, Hamilton
  convention (matches Eigen semantics used by the reference).
* Rotation matrices are ``[..., 3, 3]`` acting on column vectors.
* All functions broadcast over leading batch dims and preserve the input
  dtype (no silent float64 promotion — TPU production runs float32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Basic quaternion algebra
# ---------------------------------------------------------------------------


def qmul(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product q1 ⊗ q2 (both wxyz)."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def qconj(q: jax.Array) -> jax.Array:
    """Conjugate (= inverse for unit quaternions)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qnormalize(q: jax.Array) -> jax.Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def qpositify(q: jax.Array) -> jax.Array:
    """Flip sign so that w >= 0 (canonical double-cover representative)."""
    return jnp.where(q[..., :1] < 0, -q, q)


def qrot(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v by unit quaternion(s) q: returns R(q) @ v.

    Uses the expanded Rodrigues form (no matrix materialisation) so it
    fuses well inside scans/kernels.
    """
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def qrot_inv(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate v by q⁻¹."""
    return qrot(qconj(q), v)


def q_identity(dtype=jnp.float32) -> jax.Array:
    return jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype=dtype)


# ---------------------------------------------------------------------------
# Small-angle / tangent-space maps
# ---------------------------------------------------------------------------


def dq_small(theta: jax.Array) -> jax.Array:
    """First-order quaternion increment [1, θ/2] (*unnormalized*).

    Matches the reference's ``Utility::deltaQ`` first-order convention
    (``utility.h:11-24``) which the preintegration residual and the pose
    box-plus rely on.
    """
    half = 0.5 * theta
    one = jnp.ones_like(half[..., :1])
    return jnp.concatenate([one, half], axis=-1)


def so3_exp(theta: jax.Array) -> jax.Array:
    """Exact exponential map: rotation vector -> unit quaternion (wxyz)."""
    angle2 = jnp.sum(theta * theta, axis=-1, keepdims=True)
    angle = jnp.sqrt(jnp.maximum(angle2, jnp.finfo(theta.dtype).tiny))
    half = 0.5 * angle
    small = angle2 < jnp.asarray(1e-8, theta.dtype)
    # sin(x/2)/x with Taylor fallback  0.5 - angle²/48
    k = jnp.where(small, 0.5 - angle2 / 48.0, jnp.sin(half) / angle)
    w = jnp.where(small, 1.0 - angle2 / 8.0, jnp.cos(half))
    return jnp.concatenate([w, k * theta], axis=-1)


def so3_log(q: jax.Array) -> jax.Array:
    """Exact log map: unit quaternion -> rotation vector."""
    q = qpositify(q)
    w = jnp.clip(q[..., 0:1], -1.0, 1.0)
    v = q[..., 1:4]
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(vn, w)
    small = vn < jnp.asarray(1e-8, q.dtype)
    scale = jnp.where(small, 2.0 / jnp.maximum(w, 1e-3), angle / jnp.maximum(vn, jnp.finfo(q.dtype).tiny))
    return scale * v


def qboxplus(q: jax.Array, dtheta: jax.Array) -> jax.Array:
    """SE(3) local-parameterization rotation update: q ⊞ δθ = q ⊗ [1, δθ/2], renormalized.

    Same retraction as the reference's ``PoseLocalParameterization::Plus``
    (``pose_local_parameterization.cpp:3-18``).
    """
    return qnormalize(qmul(q, dq_small(dtheta)))


# ---------------------------------------------------------------------------
# Matrix forms
# ---------------------------------------------------------------------------


def skew(v: jax.Array) -> jax.Array:
    """Skew-symmetric (cross-product) matrix [v]ₓ, shape [...,3,3]."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )


def q2R(q: jax.Array) -> jax.Array:
    """Unit quaternion -> rotation matrix [...,3,3]."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return jnp.stack(
        [
            jnp.stack([ww + xx - yy - zz, 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), ww - xx + yy - zz, 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), ww - xx - yy + zz], axis=-1),
        ],
        axis=-2,
    )


def R2q(R: jax.Array) -> jax.Array:
    """Rotation matrix -> unit quaternion (wxyz), branchless Shepperd method.

    Selects the numerically best of the four candidate columns via
    ``argmax`` + one-hot contraction so it traces cleanly under jit/vmap.
    """
    d = jnp.diagonal(R, axis1=-2, axis2=-1)
    m00, m11, m22 = d[..., 0], d[..., 1], d[..., 2]
    tr = m00 + m11 + m22

    def g(i, j):
        return R[..., i, j]

    # Four candidate (unnormalized) quaternions, one per dominant component.
    qw = jnp.stack([1.0 + tr, g(2, 1) - g(1, 2), g(0, 2) - g(2, 0), g(1, 0) - g(0, 1)], axis=-1)
    qx = jnp.stack([g(2, 1) - g(1, 2), 1.0 + m00 - m11 - m22, g(0, 1) + g(1, 0), g(2, 0) + g(0, 2)], axis=-1)
    qy = jnp.stack([g(0, 2) - g(2, 0), g(0, 1) + g(1, 0), 1.0 - m00 + m11 - m22, g(1, 2) + g(2, 1)], axis=-1)
    qz = jnp.stack([g(1, 0) - g(0, 1), g(2, 0) + g(0, 2), g(1, 2) + g(2, 1), 1.0 - m00 - m11 + m22], axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # [...,4,4]
    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    sel = jax.nn.one_hot(jnp.argmax(scores, axis=-1), 4, dtype=R.dtype)
    q = jnp.einsum("...c,...cq->...q", sel, cands)
    return qpositify(qnormalize(q))


def qleft(q: jax.Array) -> jax.Array:
    """Left-multiplication matrix L(q): L(q) @ p == q ⊗ p (wxyz stacking)."""
    w = q[..., 0]
    v = q[..., 1:4]
    top = jnp.concatenate([w[..., None, None], -v[..., None, :]], axis=-1)
    bot = jnp.concatenate(
        [v[..., :, None], w[..., None, None] * jnp.eye(3, dtype=q.dtype) + skew(v)], axis=-1
    )
    return jnp.concatenate([top, bot], axis=-2)


def qright(p: jax.Array) -> jax.Array:
    """Right-multiplication matrix Rm(p): Rm(p) @ q == q ⊗ p."""
    w = p[..., 0]
    v = p[..., 1:4]
    top = jnp.concatenate([w[..., None, None], -v[..., None, :]], axis=-1)
    bot = jnp.concatenate(
        [v[..., :, None], w[..., None, None] * jnp.eye(3, dtype=p.dtype) - skew(v)], axis=-1
    )
    return jnp.concatenate([top, bot], axis=-2)


# ---------------------------------------------------------------------------
# Euler (yaw-pitch-roll, degrees) — used for the yaw-gauge fix and 4-DoF PGO
# ---------------------------------------------------------------------------


def R2ypr(R: jax.Array) -> jax.Array:
    """Rotation matrix -> [yaw, pitch, roll] in **degrees** (Z-Y-X)."""
    n = R[..., :, 0]
    o = R[..., :, 1]
    a = R[..., :, 2]
    y = jnp.arctan2(n[..., 1], n[..., 0])
    p = jnp.arctan2(-n[..., 2], n[..., 0] * jnp.cos(y) + n[..., 1] * jnp.sin(y))
    r = jnp.arctan2(
        a[..., 0] * jnp.sin(y) - a[..., 1] * jnp.cos(y),
        -o[..., 0] * jnp.sin(y) + o[..., 1] * jnp.cos(y),
    )
    rad2deg = jnp.asarray(180.0 / jnp.pi, R.dtype)
    return jnp.stack([y, p, r], axis=-1) * rad2deg


def ypr2R(ypr_deg: jax.Array) -> jax.Array:
    """[yaw, pitch, roll] in degrees -> rotation matrix Rz(y)Ry(p)Rx(r)."""
    deg2rad = jnp.asarray(jnp.pi / 180.0, ypr_deg.dtype)
    y, p, r = jnp.moveaxis(ypr_deg * deg2rad, -1, 0)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cr, sr = jnp.cos(r), jnp.sin(r)
    return jnp.stack(
        [
            jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], axis=-1),
            jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], axis=-1),
            jnp.stack([-sp, cp * sr, cp * cr], axis=-1),
        ],
        axis=-2,
    )


def yaw_R(yaw_deg: jax.Array) -> jax.Array:
    """Pure-yaw rotation matrix (degrees) — 4-DoF pose-graph building block."""
    zeros = jnp.zeros_like(yaw_deg)
    return ypr2R(jnp.stack([yaw_deg, zeros, zeros], axis=-1))


def normalize_angle_deg(a: jax.Array) -> jax.Array:
    """Wrap angle in degrees to (-180, 180]."""
    return a - 360.0 * jnp.floor((a + 180.0) / 360.0)


# ---------------------------------------------------------------------------
# Gravity alignment
# ---------------------------------------------------------------------------


def quat_from_two_vectors(a: jax.Array, b: jax.Array) -> jax.Array:
    """Minimal-angle unit quaternion rotating direction a onto direction b."""
    an = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    bn = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    c = jnp.sum(an * bn, axis=-1, keepdims=True)  # cos(angle)
    axis = jnp.cross(an, bn)
    # Halve the angle via the [1+c, axis] trick; degenerate antiparallel case
    # falls back to any orthogonal axis.
    q = jnp.concatenate([1.0 + c, axis], axis=-1)
    # antiparallel: pick axis orthogonal to a
    ortho = jnp.concatenate([jnp.zeros_like(c), _any_orthogonal(an)], axis=-1)
    q = jnp.where(1.0 + c < 1e-6, ortho, q)
    return qnormalize(q)


def _any_orthogonal(v: jax.Array) -> jax.Array:
    """A unit vector orthogonal to v (branchless)."""
    ex = jnp.zeros_like(v).at[..., 0].set(1.0)
    ey = jnp.zeros_like(v).at[..., 1].set(1.0)
    pick = jnp.abs(v[..., 0:1]) < 0.9
    u = jnp.where(pick, ex, ey)
    w = jnp.cross(v, u)
    return w / jnp.linalg.norm(w, axis=-1, keepdims=True)


def g2R(g: jax.Array) -> jax.Array:
    """World-from-body rotation aligning measured gravity g with +z, yaw-zeroed.

    Same capability as the reference's ``Utility::g2R``
    (``utility.cpp:3-14``): rotate ĝ onto (0,0,1), then remove the
    resulting yaw so the world frame starts yaw-aligned with the body.
    """
    ez = jnp.zeros_like(g).at[..., 2].set(1.0)
    R0 = q2R(quat_from_two_vectors(g, ez))
    yaw = R2ypr(R0)[..., 0]
    return jnp.matmul(yaw_R(-yaw), R0)


# ---------------------------------------------------------------------------
# Pose (p, q) helpers used across the estimator and pose graph
# ---------------------------------------------------------------------------


def pose_inverse(p: jax.Array, q: jax.Array):
    qi = qconj(q)
    return -qrot(qi, p), qi


def pose_compose(p1, q1, p2, q2):
    """T1 * T2 for T = (p, q)."""
    return p1 + qrot(q1, p2), qnormalize(qmul(q1, q2))


def pose_between(p1, q1, p2, q2):
    """T1⁻¹ * T2."""
    qi = qconj(q1)
    return qrot(qi, p2 - p1), qnormalize(qmul(qi, q2))
