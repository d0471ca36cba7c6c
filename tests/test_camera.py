"""Camera model tests: project/lift roundtrips with the real D435i
intrinsics from the reference's realsense rig."""

import numpy as np
import jax.numpy as jnp
import pytest

from vins_rgbd_fast_tpu.models import make_camera

D435I = dict(
    fx=604.5821781259577, fy=604.2544712985845,
    cx=321.2638233484251, cy=239.70969315130674,
    k1=0.13387871564774004, k2=-0.2731913133377051,
    p1=0.0020296263577681264, p2=-0.00044384544608203714,
)


def _grid_points(rng, n=200, zmin=0.5, zmax=5.0):
    z = rng.uniform(zmin, zmax, size=n)
    x = rng.uniform(-0.4, 0.4, size=n) * z
    y = rng.uniform(-0.3, 0.3, size=n) * z
    return np.stack([x, y, z], axis=-1)


def test_pinhole_roundtrip_distorted():
    cam = make_camera("PINHOLE", **D435I)
    rng = np.random.default_rng(0)
    P = _grid_points(rng)
    uv = np.asarray(cam.project(jnp.asarray(P)))
    # projected points of in-frustum geometry should land in-image
    assert (uv[:, 0] > -50).all() and (uv[:, 0] < 700).all()
    rays = np.asarray(cam.lift(jnp.asarray(uv)))
    np.testing.assert_allclose(rays[:, :2], P[:, :2] / P[:, 2:3], atol=1e-8)
    np.testing.assert_allclose(rays[:, 2], 1.0)


def test_pinhole_no_distortion_is_linear():
    cam = make_camera("PINHOLE", fx=500.0, fy=510.0, cx=320.0, cy=240.0)
    P = jnp.asarray([[1.0, 2.0, 4.0]])
    uv = np.asarray(cam.project(P))
    np.testing.assert_allclose(uv, [[500 * 0.25 + 320, 510 * 0.5 + 240]], atol=1e-12)


def test_pinhole_fixed_point_matches_newton_inverse():
    """The 8-step fixed point must invert distortion to sub-1e-6 normalized
    units over the usable FOV (same tolerance class the reference relies on)."""
    cam = make_camera("PINHOLE", **D435I)
    rng = np.random.default_rng(1)
    uv = np.stack([rng.uniform(30, 610, 500), rng.uniform(30, 450, 500)], axis=-1)
    rays = np.asarray(cam.lift(jnp.asarray(uv)))
    uv_back = np.asarray(cam.project(jnp.asarray(rays)))
    assert np.abs(uv_back - uv).max() < 1e-3  # pixels


def test_equidistant_roundtrip():
    cam = make_camera("EQUIDISTANT", mu=470.0, mv=471.0, u0=320.0, v0=240.0,
                      k2=-0.01, k3=0.003, k4=-0.001, k5=0.0002)
    rng = np.random.default_rng(2)
    P = _grid_points(rng, n=100)
    uv = cam.project(jnp.asarray(P))
    rays = np.asarray(cam.lift(uv))
    np.testing.assert_allclose(rays[:, :2], P[:, :2] / P[:, 2:3], atol=1e-6)


def test_mei_roundtrip():
    cam = make_camera("MEI", xi=0.8, gamma1=800.0, gamma2=805.0, u1=320.0, v1=240.0,
                      k1=-0.2, k2=0.05, p1=1e-4, p2=-2e-4)
    rng = np.random.default_rng(3)
    P = _grid_points(rng, n=100)
    uv = cam.project(jnp.asarray(P))
    rays = np.asarray(cam.lift(uv))
    np.testing.assert_allclose(rays[:, :2], P[:, :2] / P[:, 2:3], atol=1e-5)


def test_unknown_model_raises():
    with pytest.raises(ValueError):
        make_camera("SCARAMUZZA_TYPO")


def test_scaramuzza_roundtrip():
    """OCAM model: lift (forward poly) and project (inverse poly) must
    round-trip when the polynomials are consistent.  The inverse poly is
    fitted numerically from the forward one, as the reference's own
    calibration does (ScaramuzzaCamera.cc:560-572)."""
    # typical fisheye-ish forward poly: z = a0 + a2 phi^2 + a3 phi^3
    a0, a2, a3 = -250.0, 1.2e-3, -2.0e-7
    poly = (a0, 0.0, a2, a3, 0.0)
    phis = np.linspace(1.0, 300.0, 200)
    zs = -(a0 + a2 * phis ** 2 + a3 * phis ** 3)  # +P_z of the lifted ray
    thetas = np.arctan2(-zs, phis)  # theta = atan2(-P_z, norm) < 0 here
    coeff = np.polyfit(thetas, phis, 6)[::-1]  # rho(theta), ascending order
    cam = make_camera(
        "SCARAMUZZA", poly=poly, inv_poly=tuple(coeff.tolist()),
        C=1.0, D=0.0, E=0.0, center_x=320.0, center_y=240.0,
        width=640, height=480,
    )
    uv = jnp.asarray([[320.0, 240.0], [420.0, 300.0], [150.0, 100.0],
                      [600.0, 440.0]], jnp.float64)
    rays = cam.lift(uv)
    back = cam.project(rays)
    np.testing.assert_allclose(np.asarray(back), np.asarray(uv), atol=0.3)
