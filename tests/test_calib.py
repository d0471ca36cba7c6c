"""Intrinsic calibration suite: chessboard detection on rendered boards,
Zhang init + LM bundle refinement recovering known intrinsics, and the
CLI round trip (reference: camera_model/src/{calib,chessboard},
intrinsic_calib.cc)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from vins_rgbd_fast_tpu.models import camera as cm
from vins_rgbd_fast_tpu.calib import (board_points, calibrate,
                                      find_chessboard, write_camera_yaml)
from vins_rgbd_fast_tpu.calib.calibrate import (homography, zhang_intrinsics,
                                                pose_from_homography)

ROWS, COLS, SQ = 6, 8, 0.03
W, H = 640, 480
TRUE = cm.PinholeParams(fx=462.0, fy=458.5, cx=316.0, cy=243.5,
                        k1=-0.12, k2=0.04, p1=5e-4, p2=-3e-4,
                        width=W, height=H)


def _rotz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def _rotx(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def _roty(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def _view_poses(n=8, seed=3, z=(0.45, 0.7), xy=(0.04, 0.03), tilt=0.5):
    """Board-to-camera poses.  The defaults keep the full board in view
    for the render/detect tests; the calibration tests widen ``xy``/``z``
    so corners sample the full field (radial distortion is unidentifiable
    from center-only coverage — same reason real calibration sessions wave
    the board to the image edges)."""
    rng = np.random.default_rng(seed)
    cx_b, cy_b = (COLS - 1) * SQ / 2, (ROWS - 1) * SQ / 2
    poses = []
    for _ in range(n):
        R = (_rotx(rng.uniform(-tilt, tilt)) @ _roty(rng.uniform(-tilt, tilt))
             @ _rotz(rng.uniform(-0.4, 0.4)))
        zc = rng.uniform(*z)
        t = np.array([rng.uniform(-xy[0], xy[0]),
                      rng.uniform(-xy[1], xy[1]), zc])
        t = t - R @ np.array([cx_b, cy_b, 0.0])  # center the board
        poses.append((R, t))
    return poses


def _project_true(R, t, pts3):
    Pc = pts3 @ R.T + t
    return np.asarray(cm.pinhole_project(TRUE, jnp.asarray(Pc)))


def _render_view(R, t, ss=2):
    """Analytic chessboard render through the TRUE camera: lift every
    (supersampled) pixel, intersect the board plane, checker-color it."""
    us = (np.arange(W * ss) + 0.5) / ss - 0.5
    vs = (np.arange(H * ss) + 0.5) / ss - 0.5
    uu, vv = np.meshgrid(us, vs)
    uv = np.stack([uu.ravel(), vv.ravel()], axis=1)
    rays = np.asarray(cm.pinhole_lift(TRUE, jnp.asarray(uv)))  # (M,3)
    # board frame: X_b = R^T (lam*d - t); plane z_b = 0
    d_b = rays @ R  # R^T d
    o_b = -t @ R    # R^T (-t)
    lam = -o_b[2] / np.where(np.abs(d_b[:, 2]) > 1e-9, d_b[:, 2], 1e-9)
    xb = o_b[0] + lam * d_b[:, 0]
    yb = o_b[1] + lam * d_b[:, 1]
    on = ((lam > 0) & (xb > -SQ) & (xb < COLS * SQ)
          & (yb > -SQ) & (yb < ROWS * SQ))
    par = (np.floor(xb / SQ) + np.floor(yb / SQ)) % 2
    img = np.where(on, np.where(par > 0.5, 235.0, 25.0), 128.0)
    return img.reshape(H * ss, W * ss).reshape(H, ss, W, ss).mean(axis=(1, 3))


def test_detect_chessboard_subpixel():
    R, t = _view_poses(1, seed=11)[0]
    img = _render_view(R, t)
    got = find_chessboard(img, rows=ROWS, cols=COLS)
    assert got is not None, "board not found"
    truth = _project_true(R, t, board_points(ROWS, COLS, SQ))
    # detector recovers the grid up to the checkerboard's symmetry; align
    # by best of the 4 rotations/flips of the index grid
    idx = np.arange(ROWS * COLS).reshape(ROWS, COLS)
    best = np.inf
    for g in (idx, idx[::-1], idx[:, ::-1], idx[::-1, ::-1],
              idx.T, idx.T[::-1], idx.T[:, ::-1], idx.T[::-1, ::-1]):
        if g.shape != (ROWS, COLS):
            g = g.T
        err = np.linalg.norm(got[g.ravel()] - truth, axis=1).mean()
        best = min(best, err)
    assert best < 0.35, f"mean corner error {best:.3f} px"


def test_zhang_closed_form_on_exact_homographies():
    obj = board_points(ROWS, COLS, SQ)
    poses = _view_poses(6, seed=5)
    nodist = cm.PinholeParams(fx=TRUE.fx, fy=TRUE.fy, cx=TRUE.cx, cy=TRUE.cy,
                              width=W, height=H)
    Hs = []
    for R, t in poses:
        uv = np.asarray(cm.pinhole_project(
            nodist, jnp.asarray(obj @ R.T + t)))
        Hs.append(homography(obj[:, :2], uv))
    K4 = zhang_intrinsics(Hs)
    np.testing.assert_allclose(K4, [TRUE.fx, TRUE.fy, TRUE.cx, TRUE.cy],
                               rtol=5e-3)
    R0, t0 = poses[0]
    rv, tv = pose_from_homography(K4, Hs[0])
    np.testing.assert_allclose(tv, t0, atol=2e-3)


def test_calibrate_pinhole_recovers_truth():
    obj = board_points(ROWS, COLS, SQ)
    poses = _view_poses(16, seed=7, z=(0.3, 0.55), xy=(0.14, 0.1))
    rng = np.random.default_rng(0)
    views = [_project_true(R, t, obj) + rng.normal(0, 0.03, (len(obj), 2))
             for R, t in poses]
    res = calibrate("pinhole", views, ROWS, COLS, SQ, W, H)
    p = res.params
    assert res.rms_px < 0.08, res.rms_px
    np.testing.assert_allclose([p.fx, p.fy, p.cx, p.cy],
                               [TRUE.fx, TRUE.fy, TRUE.cx, TRUE.cy],
                               rtol=5e-3)
    np.testing.assert_allclose([p.k1, p.k2], [TRUE.k1, TRUE.k2], atol=5e-3)


def test_calibrate_kannala_brandt():
    kb = cm.EquidistantParams(mu=365.0, mv=363.0, u0=322.0, v0=238.0,
                              k2=0.02, k3=-0.005, k4=0.002, k5=-0.0005,
                              width=W, height=H)
    obj = board_points(ROWS, COLS, SQ)
    rng = np.random.default_rng(1)
    views = []
    for R, t in _view_poses(10, seed=9, z=(0.3, 0.55), xy=(0.14, 0.1)):
        uv = np.asarray(cm.equidistant_project(kb, jnp.asarray(obj @ R.T + t)))
        views.append(uv + rng.normal(0, 0.05, uv.shape))
    res = calibrate("kannala-brandt", views, ROWS, COLS, SQ, W, H)
    p = res.params
    assert res.rms_px < 0.08, res.rms_px
    np.testing.assert_allclose([p.mu, p.mv, p.u0, p.v0],
                               [kb.mu, kb.mv, kb.u0, kb.v0], rtol=5e-3)


def _ocam_project_exact(poly, affine, center, Pc):
    """Independent ground-truth OCAM projection: per-point exact quartic
    root of f(ρ) + (z/r)·ρ = 0 via np.roots (no Newton, no inv_poly)."""
    C, D, E = affine
    out = np.zeros((len(Pc), 2))
    for i, (x, y, z) in enumerate(Pc):
        r = np.hypot(x, y)
        m = z / r
        # a4 ρ⁴ + a3 ρ³ + a2 ρ² + m ρ + a0 = 0
        roots = np.roots([poly[4], poly[3], poly[2], m, poly[0]])
        rho = min((float(rt.real) for rt in roots
                   if abs(rt.imag) < 1e-9 and rt.real > 0), default=np.nan)
        u, v = x / r * rho, y / r * rho
        out[i] = (C * u + D * v + center[0], E * u + v + center[1])
    return out


def test_calibrate_scaramuzza():
    # OCAM forward polynomial in the reference's own ballpark
    # (ScaramuzzaCamera.cc:533-537 commented sample), scaled to 640x480
    poly = (-180.0, 0.0, 1.8e-3, -2.0e-6, 8.0e-9)
    affine = (1.001, 1e-4, -2e-4)
    center = (322.0, 238.0)
    obj = board_points(ROWS, COLS, SQ)
    rng = np.random.default_rng(4)
    views = []
    for R, t in _view_poses(12, seed=17, z=(0.25, 0.5), xy=(0.16, 0.12)):
        uv = _ocam_project_exact(poly, affine, center, obj @ R.T + t)
        assert np.isfinite(uv).all()
        views.append(uv + rng.normal(0, 0.05, uv.shape))
    res = calibrate("scaramuzza", views, ROWS, COLS, SQ, W, H)
    p = res.params
    assert res.rms_px < 0.1, res.rms_px
    np.testing.assert_allclose([p.center_x, p.center_y], center, atol=1.0)
    np.testing.assert_allclose(p.poly[0], poly[0], rtol=1e-2)

    # YAML round trip: the written OCAM file loads through config and
    # builds a working camera (project∘lift identity on interior pixels)
    import tempfile
    from vins_rgbd_fast_tpu.config import load_config
    with tempfile.TemporaryDirectory() as d:
        yml = os.path.join(d, "camera_scaramuzza.yaml")
        write_camera_yaml(yml, res)
        vc = load_config(yml)
        assert vc.model_type.upper() == "SCARAMUZZA"
        np.testing.assert_allclose(vc.ocam_poly, p.poly, rtol=1e-6)
        cam = vc.camera()
        uv0 = np.array([[250.0, 200.0], [400.0, 300.0], [322.0, 238.0]])
        rays = np.asarray(cam.lift(jnp.asarray(uv0)))
        uv1 = np.asarray(cam.project(jnp.asarray(rays)))
        # project∘lift is NOT exact under a non-identity affine even in
        # the reference: liftProjective builds the ray from the STRETCHED
        # centered coords while the polynomial uses the unstretched ones
        # (ScaramuzzaCamera.cc:599-622) — ~(C−1)·ρ ≈ 1 px here.  The
        # inverse-poly fit itself contributes <0.1 px.
        np.testing.assert_allclose(uv1, uv0, atol=1.5)


def test_calibrate_mei():
    mei = cm.MeiParams(xi=0.9, gamma1=860.0, gamma2=856.0, u1=318.0,
                       v1=242.0, k1=-0.05, k2=0.01, width=W, height=H)
    obj = board_points(ROWS, COLS, SQ)
    rng = np.random.default_rng(2)
    views = []
    for R, t in _view_poses(12, seed=13, z=(0.3, 0.55), xy=(0.14, 0.1)):
        uv = np.asarray(cm.mei_project(mei, jnp.asarray(obj @ R.T + t)))
        views.append(uv + rng.normal(0, 0.05, uv.shape))
    res = calibrate("mei", views, ROWS, COLS, SQ, W, H)
    # ξ/γ trade off along near-degenerate directions (the reference's mei
    # calibration has the same gauge); what must hold is the reprojection
    assert res.rms_px < 0.1, res.rms_px


@pytest.mark.slow
def test_calib_cli_roundtrip(tmp_path):
    from vins_rgbd_fast_tpu.io.writers import write_png
    from vins_rgbd_fast_tpu.calib.__main__ import main
    from vins_rgbd_fast_tpu.config import _parse_opencv_yaml

    d = tmp_path / "calibrationdata"
    d.mkdir()
    for i, (R, t) in enumerate(_view_poses(6, seed=21)):
        img = _render_view(R, t).astype(np.uint8)
        write_png(str(d / f"left-{i:02d}.png"), img)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        rc = main(["-w", str(COLS), "--bh", str(ROWS), "-s", str(SQ),
                   "-i", str(d), "-p", "left-", "--camera-model", "pinhole",
                   "--camera-name", "testcam"])
        assert rc == 0
        raw = _parse_opencv_yaml(open("testcam_camera_calib.yaml").read())
    finally:
        os.chdir(cwd)
    assert raw["model_type"] == "PINHOLE"
    fx = float(raw["projection_parameters"]["fx"])
    assert abs(fx - TRUE.fx) / TRUE.fx < 0.02, fx
