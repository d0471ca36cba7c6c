"""Pyramidal Lucas-Kanade optical flow, fully vectorized over points.

Replaces the reference's hottest frontend kernel, ``cv::calcOpticalFlowPyrLK``
(21×21 window, maxLevel 1 with IMU-predicted initial flow / maxLevel 3
without, 30 iterations, eps 0.01 —
``/root/reference/vins_estimator/src/feature_tracker/feature_tracker.cpp:
298-311``).  Design: per-point 21×21 patches are gathered with bilinear
sampling; the 2×2 normal equations solve in closed form; all points track
simultaneously under ``vmap``; pyramid levels are a static Python loop so
XLA sees a fixed program.
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .image import bilinear_sample


class LKResult(NamedTuple):
    pts: jax.Array  # (N,2) tracked positions in level-0 coords
    status: jax.Array  # (N,) bool
    err: jax.Array  # (N,) mean abs residual of final patch


def _patch_offsets(win: int, dtype):
    h = win // 2
    r = jnp.arange(-h, h + 1, dtype=dtype)
    oy, ox = jnp.meshgrid(r, r, indexing="ij")
    return ox.reshape(-1), oy.reshape(-1)  # (win²,)


def _track_level(
    prev_img: jax.Array,
    cur_img: jax.Array,
    pts_l: jax.Array,  # (N,2) template positions at this level
    flow: jax.Array,  # (N,2) current flow estimate at this level
    active: jax.Array,  # (N,) bool
    win: int,
    max_iters: int,
    eps: float,
    min_eig: float,
    check_border: bool,
):
    dtype = prev_img.dtype
    H, W = prev_img.shape
    ox, oy = _patch_offsets(win + 2, dtype)  # sample (win+2)² for gradients

    def one_point(p, u0, act):
        px = p[0] + ox
        py = p[1] + oy
        patch_ext = bilinear_sample(prev_img, jnp.stack([px, py], -1))  # ((win+2)²,)
        pe = patch_ext.reshape(win + 2, win + 2)
        tmpl = pe[1:-1, 1:-1].reshape(-1)
        Ix = ((pe[1:-1, 2:] - pe[1:-1, :-2]) * 0.5).reshape(-1)
        Iy = ((pe[2:, 1:-1] - pe[:-2, 1:-1]) * 0.5).reshape(-1)
        Gxx = jnp.sum(Ix * Ix)
        Gxy = jnp.sum(Ix * Iy)
        Gyy = jnp.sum(Iy * Iy)
        det = Gxx * Gyy - Gxy * Gxy
        tr = Gxx + Gyy
        eig_min = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))
        ok_eig = eig_min / (win * win) >= min_eig
        inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)

        oxs = ox.reshape(win + 2, win + 2)[1:-1, 1:-1].reshape(-1)
        oys = oy.reshape(win + 2, win + 2)[1:-1, 1:-1].reshape(-1)

        def body(k, carry):
            u, done = carry
            cx = p[0] + u[0] + oxs
            cy = p[1] + u[1] + oys
            curp = bilinear_sample(cur_img, jnp.stack([cx, cy], -1))
            dI = curp - tmpl
            bx = jnp.sum(dI * Ix)
            by = jnp.sum(dI * Iy)
            du = jnp.stack([
                inv_det * (Gyy * bx - Gxy * by),
                inv_det * (-Gxy * bx + Gxx * by),
            ])
            u_new = u - du
            small = jnp.sum(du * du) < eps * eps
            u = jnp.where(done, u, u_new)
            return (u, done | small)

        u, _ = jax.lax.fori_loop(0, max_iters, body, (u0, ~(act & ok_eig)))
        # final residual
        fx = p[0] + u[0] + oxs
        fy = p[1] + u[1] + oys
        dfin = bilinear_sample(cur_img, jnp.stack([fx, fy], -1)) - tmpl
        err = jnp.mean(jnp.abs(dfin))
        new_pos = p + u
        if check_border:
            # only meaningful at the finest level: coarse pyramid images can
            # be smaller than the window itself (sampling clamps at borders)
            half = win // 2
            inb = (
                (new_pos[0] >= half) & (new_pos[0] < W - half)
                & (new_pos[1] >= half) & (new_pos[1] < H - half)
            )
        else:
            inb = jnp.asarray(True)
        status = act & ok_eig & inb
        return u, status, err

    return jax.vmap(one_point)(pts_l, flow, active)


def pyramidal_lk(
    prev_pyr: List[jax.Array],
    cur_pyr: List[jax.Array],
    pts: jax.Array,  # (N,2) level-0 positions in prev image
    init_pts: jax.Array,  # (N,2) initial guess positions in cur image
    active: jax.Array,  # (N,) bool
    win: int = 21,
    max_iters: int = 30,
    eps: float = 0.01,
    min_eig: float = 1e-4,
) -> LKResult:
    """Track pts from prev to cur across the pyramid (coarse→fine).

    ``init_pts`` provides the IMU-predicted warm start (the reference's
    OPTFLOW_USE_INITIAL_FLOW path); pass ``init_pts = pts`` for the cold
    3-level mode.
    """
    levels = len(prev_pyr)
    dtype = prev_pyr[0].dtype
    scale_top = jnp.asarray(2.0 ** (levels - 1), dtype)
    flow = (init_pts - pts) / scale_top
    status = active
    err = jnp.zeros(pts.shape[0], dtype)
    for l in range(levels - 1, -1, -1):
        s = jnp.asarray(2.0 ** l, dtype)
        pts_l = pts / s
        flow, status_l, err = _track_level(
            prev_pyr[l], cur_pyr[l], pts_l, flow, active, win, max_iters, eps,
            min_eig, check_border=(l == 0),
        )
        status = status & status_l
        if l > 0:
            flow = flow * 2.0
    return LKResult(pts=pts + flow, status=status, err=err)
