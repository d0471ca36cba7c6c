"""Camera geometry models (layer L1).

TPU-native re-design of the reference's camodocal camera abstraction
(``/root/reference/camera_model/include/camodocal/camera_models/Camera.h:16-98``:
``ModelType {PINHOLE, KANNALA_BRANDT, MEI, SCARAMUZZA}``, virtuals
``liftProjective`` / ``spaceToPlane``).  Instead of a virtual-dispatch class
hierarchy, each model is a parameter pytree + pure ``lift`` / ``project``
functions that broadcast over arbitrary batches of points, so the whole
feature table is (un)projected as one fused XLA op.

All bundled reference configs use ``model_type: PINHOLE`` (e.g.
``config/realsense/vio.yaml``), so Pinhole is the hot path; Equidistant
(Kannala-Brandt fisheye) and Mei (unified catadioptric) are provided for
parity with the reference's model zoo.
"""

from __future__ import annotations

import dataclasses
from typing import Union

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Parameter pytrees
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PinholeParams:
    """Pinhole + radtan (k1 k2 p1 p2), reference ``PinholeCamera.cc``."""

    fx: float
    fy: float
    cx: float
    cy: float
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    width: int = 640
    height: int = 480

    @property
    def has_distortion(self) -> bool:
        return any(abs(v) > 0 for v in (self.k1, self.k2, self.p1, self.p2))


@dataclasses.dataclass(frozen=True)
class EquidistantParams:
    """Kannala-Brandt fisheye: d(θ)=θ+k2θ³+k3θ⁵+k4θ⁷+k5θ⁹ (camodocal naming,
    reference ``EquidistantCamera.cc``)."""

    mu: float
    mv: float
    u0: float
    v0: float
    k2: float = 0.0
    k3: float = 0.0
    k4: float = 0.0
    k5: float = 0.0
    width: int = 640
    height: int = 480


@dataclasses.dataclass(frozen=True)
class MeiParams:
    """Unified (Mei) catadioptric: mirror ξ + radtan, reference ``CataCamera.cc``."""

    xi: float
    gamma1: float
    gamma2: float
    u1: float
    v1: float
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    width: int = 640
    height: int = 480


@dataclasses.dataclass(frozen=True)
class ScaramuzzaParams:
    """Scaramuzza omnidirectional (OCAM) model, reference
    ``ScaramuzzaCamera.cc:599-653``: forward polynomial z = Σ poly_i·φ^i of
    the radial distance, inverse polynomial ρ = Σ inv_poly_i·θ^i of the
    incidence angle, plus the affine stretch [[C, D], [E, 1]] and center."""

    poly: tuple  # (5,) forward coefficients
    inv_poly: tuple  # up to (12,) inverse coefficients
    C: float = 1.0
    D: float = 0.0
    E: float = 0.0
    center_x: float = 320.0
    center_y: float = 240.0
    width: int = 640
    height: int = 480


CameraParams = Union[PinholeParams, EquidistantParams, MeiParams,
                     ScaramuzzaParams]


# ---------------------------------------------------------------------------
# Pinhole radtan
# ---------------------------------------------------------------------------


def _radtan_distort(p_u: jax.Array, k1, k2, p1, p2) -> jax.Array:
    """Additive radtan distortion d(p) with p on the normalized plane.

    Same polynomial as reference ``PinholeCamera::distortion``
    (``PinholeCamera.cc:545-562``).
    """
    x, y = p_u[..., 0], p_u[..., 1]
    x2, y2, xy = x * x, y * y, x * y
    rho2 = x2 + y2
    rad = k1 * rho2 + k2 * rho2 * rho2
    dx = x * rad + 2.0 * p1 * xy + p2 * (rho2 + 2.0 * x2)
    dy = y * rad + p1 * (rho2 + 2.0 * y2) + 2.0 * p2 * xy
    return jnp.stack([dx, dy], axis=-1)


def pinhole_lift(cam: PinholeParams, uv: jax.Array, iters: int = 8) -> jax.Array:
    """Pixel coords [...,2] -> normalized-plane ray [...,3] (z=1).

    Undistorts via the same 8-step fixed-point iteration the reference uses
    (``PinholeCamera.cc:489-505``): p_u ← p_d − d(p_u), unrolled statically
    so XLA fuses it into one elementwise chain.
    """
    dtype = uv.dtype
    inv_fx = jnp.asarray(1.0 / cam.fx, dtype)
    inv_fy = jnp.asarray(1.0 / cam.fy, dtype)
    mx_d = (uv[..., 0] - cam.cx) * inv_fx
    my_d = (uv[..., 1] - cam.cy) * inv_fy
    p_d = jnp.stack([mx_d, my_d], axis=-1)
    if cam.has_distortion:
        p_u = p_d - _radtan_distort(p_d, cam.k1, cam.k2, cam.p1, cam.p2)
        for _ in range(iters - 1):
            p_u = p_d - _radtan_distort(p_u, cam.k1, cam.k2, cam.p1, cam.p2)
    else:
        p_u = p_d
    return jnp.concatenate([p_u, jnp.ones_like(p_u[..., :1])], axis=-1)


def pinhole_project(cam: PinholeParams, P: jax.Array) -> jax.Array:
    """3D point [...,3] -> pixel coords [...,2] (reference ``spaceToPlane``,
    ``PinholeCamera.cc:520-543``).  z must be positive for a valid result."""
    z = P[..., 2:3]
    p_u = P[..., :2] / z
    if cam.has_distortion:
        p_d = p_u + _radtan_distort(p_u, cam.k1, cam.k2, cam.p1, cam.p2)
    else:
        p_d = p_u
    fxy = jnp.asarray([cam.fx, cam.fy], dtype=P.dtype)
    cxy = jnp.asarray([cam.cx, cam.cy], dtype=P.dtype)
    return p_d * fxy + cxy


# ---------------------------------------------------------------------------
# Equidistant (Kannala-Brandt)
# ---------------------------------------------------------------------------


def _kb_theta_poly(theta, k2, k3, k4, k5):
    t2 = theta * theta
    return theta * (1.0 + t2 * (k2 + t2 * (k3 + t2 * (k4 + t2 * k5))))


def equidistant_project(cam: EquidistantParams, P: jax.Array) -> jax.Array:
    r = jnp.linalg.norm(P[..., :2], axis=-1)
    theta = jnp.arctan2(r, P[..., 2])
    d = _kb_theta_poly(theta, cam.k2, cam.k3, cam.k4, cam.k5)
    scale = d / jnp.maximum(r, jnp.finfo(P.dtype).tiny)
    u = cam.mu * scale * P[..., 0] + cam.u0
    v = cam.mv * scale * P[..., 1] + cam.v0
    return jnp.stack([u, v], axis=-1)


def equidistant_lift(cam: EquidistantParams, uv: jax.Array, iters: int = 10) -> jax.Array:
    """Invert d(θ) by Newton iteration (statically unrolled)."""
    mx = (uv[..., 0] - cam.u0) / cam.mu
    my = (uv[..., 1] - cam.v0) / cam.mv
    d = jnp.sqrt(mx * mx + my * my)
    theta = d
    for _ in range(iters):
        f = _kb_theta_poly(theta, cam.k2, cam.k3, cam.k4, cam.k5) - d
        t2 = theta * theta
        fp = 1.0 + t2 * (3 * cam.k2 + t2 * (5 * cam.k3 + t2 * (7 * cam.k4 + t2 * 9 * cam.k5)))
        theta = theta - f / jnp.maximum(fp, 1e-12)
    scale = jnp.where(d > 1e-10, jnp.sin(theta) / d, jnp.ones_like(d))
    x = scale * mx
    y = scale * my
    z = jnp.cos(theta)
    ray = jnp.stack([x, y, z], axis=-1)
    # normalize to z=1 plane for downstream consistency
    return ray / jnp.maximum(ray[..., 2:3], 1e-6)


# ---------------------------------------------------------------------------
# Mei (unified catadioptric)
# ---------------------------------------------------------------------------


def mei_project(cam: MeiParams, P: jax.Array) -> jax.Array:
    norm = jnp.linalg.norm(P, axis=-1, keepdims=True)
    z = P[..., 2:3] + cam.xi * norm
    p_u = P[..., :2] / z
    p_d = p_u + _radtan_distort(p_u, cam.k1, cam.k2, cam.p1, cam.p2)
    g = jnp.asarray([cam.gamma1, cam.gamma2], dtype=P.dtype)
    c = jnp.asarray([cam.u1, cam.v1], dtype=P.dtype)
    return p_d * g + c


def mei_lift(cam: MeiParams, uv: jax.Array, iters: int = 8) -> jax.Array:
    mx_d = (uv[..., 0] - cam.u1) / cam.gamma1
    my_d = (uv[..., 1] - cam.v1) / cam.gamma2
    p_d = jnp.stack([mx_d, my_d], axis=-1)
    p_u = p_d - _radtan_distort(p_d, cam.k1, cam.k2, cam.p1, cam.p2)
    for _ in range(iters - 1):
        p_u = p_d - _radtan_distort(p_u, cam.k1, cam.k2, cam.p1, cam.p2)
    # back-project through the unified model sphere
    rho2 = jnp.sum(p_u * p_u, axis=-1)
    xi = cam.xi
    lam = (xi + jnp.sqrt(1.0 + (1.0 - xi * xi) * rho2)) / (1.0 + rho2)
    z = lam - xi
    ray = jnp.concatenate([lam[..., None] * p_u, z[..., None]], axis=-1)
    return ray / jnp.maximum(ray[..., 2:3], 1e-6)


# ---------------------------------------------------------------------------
# Scaramuzza (OCAM omnidirectional)
# ---------------------------------------------------------------------------


def scaramuzza_lift(cam: ScaramuzzaParams, uv: jax.Array) -> jax.Array:
    """``OCAMCamera::liftProjective`` (ScaramuzzaCamera.cc:599-622):
    un-stretch by inv([[C,D],[E,1]]), evaluate the forward polynomial on the
    radial distance, ray = (xc, yc, −z); normalized here to the z=1 plane."""
    dtype = uv.dtype
    xc0 = uv[..., 0] - cam.center_x
    xc1 = uv[..., 1] - cam.center_y
    inv_scale = 1.0 / (cam.C - cam.D * cam.E)
    xa0 = inv_scale * (xc0 - cam.D * xc1)
    xa1 = inv_scale * (-cam.E * xc0 + cam.C * xc1)
    phi = jnp.sqrt(xa0 * xa0 + xa1 * xa1)
    z = jnp.zeros_like(phi)
    phi_i = jnp.ones_like(phi)
    for c in cam.poly:
        z = z + phi_i * c
        phi_i = phi_i * phi
    ray = jnp.stack([xc0, xc1, -z], axis=-1)
    return ray / jnp.maximum(ray[..., 2:3], jnp.asarray(1e-6, dtype))


def scaramuzza_project(cam: ScaramuzzaParams, P: jax.Array) -> jax.Array:
    """``OCAMCamera::spaceToPlane`` (ScaramuzzaCamera.cc:632-653)."""
    norm = jnp.sqrt(P[..., 0] ** 2 + P[..., 1] ** 2)
    theta = jnp.arctan2(-P[..., 2], norm)
    rho = jnp.zeros_like(theta)
    theta_i = jnp.ones_like(theta)
    for c in cam.inv_poly:
        rho = rho + theta_i * c
        theta_i = theta_i * theta
    inv_norm = 1.0 / jnp.maximum(norm, 1e-12)
    xn0 = P[..., 0] * inv_norm * rho
    xn1 = P[..., 1] * inv_norm * rho
    u = xn0 * cam.C + xn1 * cam.D + cam.center_x
    v = xn0 * cam.E + xn1 + cam.center_y
    return jnp.stack([u, v], axis=-1)


# ---------------------------------------------------------------------------
# Unified front
# ---------------------------------------------------------------------------


class CameraModel:
    """Dispatch-free camera front: holds params, exposes lift/project.

    Replaces the reference's ``CameraFactory::generateCameraFromYamlFile`` +
    virtual Camera (``camera_model/src/camera_models/CameraFactory.cc``).
    Dispatch happens at trace time (Python), so jitted programs contain only
    the one model actually configured.
    """

    def __init__(self, params: CameraParams):
        self.params = params

    @property
    def width(self) -> int:
        return self.params.width

    @property
    def height(self) -> int:
        return self.params.height

    def lift(self, uv: jax.Array) -> jax.Array:
        """Pixels [...,2] -> unit-depth rays [...,3] (z=1 plane)."""
        p = self.params
        if isinstance(p, PinholeParams):
            return pinhole_lift(p, uv)
        if isinstance(p, EquidistantParams):
            return equidistant_lift(p, uv)
        if isinstance(p, MeiParams):
            return mei_lift(p, uv)
        if isinstance(p, ScaramuzzaParams):
            return scaramuzza_lift(p, uv)
        raise TypeError(f"unknown camera params {type(p)}")

    def project(self, P: jax.Array) -> jax.Array:
        """Camera-frame 3D points [...,3] -> pixels [...,2]."""
        p = self.params
        if isinstance(p, PinholeParams):
            return pinhole_project(p, P)
        if isinstance(p, EquidistantParams):
            return equidistant_project(p, P)
        if isinstance(p, MeiParams):
            return mei_project(p, P)
        if isinstance(p, ScaramuzzaParams):
            return scaramuzza_project(p, P)
        raise TypeError(f"unknown camera params {type(p)}")


def make_camera(model_type: str, **kwargs) -> CameraModel:
    mt = model_type.upper()
    if mt == "PINHOLE":
        return CameraModel(PinholeParams(**kwargs))
    if mt in ("KANNALA_BRANDT", "EQUIDISTANT"):
        return CameraModel(EquidistantParams(**kwargs))
    if mt == "MEI":
        return CameraModel(MeiParams(**kwargs))
    if mt == "SCARAMUZZA":
        return CameraModel(ScaramuzzaParams(**kwargs))
    raise ValueError(f"unsupported model_type {model_type!r}")
