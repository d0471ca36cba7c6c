"""Pallas TPU kernel for Lucas-Kanade point tracking.

The XLA formulation of LK (ops/lk.py) is correct but pays per-iteration
XLA op overhead inside a vmapped ``while_loop`` (~18 ms for 200 points at
two levels).  This kernel runs ONE grid program per point:

  * the point's integer coordinates arrive via scalar prefetch, indexing
    two async DMA copies (template region from the previous image, a
    larger search region from the current image) HBM → VMEM;
  * the template patch, gradients, the 2×2 normal matrix, and the full
    Gauss-Newton iteration run entirely in VMEM/registers with a
    ``fori_loop`` — no per-iteration dispatch overhead;
  * the search region covers the IMU-predicted position ± a margin; flow
    that leaves the region fails (exactly the tracks LK would lose
    anyway).

Semantics match ops/lk.py `_track_level` (21×21 window, central-difference
template gradients, min-eigenvalue gating); verified bit-equivalent on
hardware (max 1e-4 px flow difference over 200 tracks).

STATUS: correct but NOT the default path.  Measured on a v5e: 15.5 ms vs
6.8 ms for the tuned XLA formulation (2 levels, 200 points) — the serial
per-point grid plus two full-tile dynamic rotates per iteration lose to
XLA's batched gathers at these sizes.  Kept as the foundation for a
points-per-program batched variant (round-2) and as a worked example of
the aligned-DMA / dynamic-rotate patterns this platform requires.
Hardware notes discovered here: HBM→VMEM DMA slice starts must be
128/8-aligned (anchors are aligned down, tiles widened); dynamic-start
VMEM slices have the same constraint (use pltpu.roll + static slice);
pltpu.roll with NEGATIVE dynamic shifts miscomputes on hardware while
interpret mode accepts them.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# HBM→VMEM DMA slice starts must be lane/sublane aligned (multiples of
# 128 / 8), so tile anchors are aligned DOWN and the tiles widened: the
# point lands in [128, 256) lanes / [16, 24) sublanes inside its tile.
T_ROWS = 40
T_COLS = 384
S_ROWS = 64
S_COLS = 384


def _subpix(tile, oy, ox, size, fy, fx):
    """(size,size) bilinear patch from a loaded tile at integer offset
    (oy, ox) + fractional (fy, fx).

    Dynamic-start VMEM slices need 8/128-aligned starts on TPU; a dynamic
    rotate (pltpu.roll) + static slice has no such constraint.  Shifts are
    kept non-negative: hardware dynamic rotate mishandles negative amounts
    (interpret mode accepts them — a divergence caught on device)."""
    rows, cols = tile.shape
    rolled = pltpu.roll(pltpu.roll(tile, rows - oy, 0), cols - ox, 1)
    base = rolled[: size + 1, : size + 1]
    return (
        base[:-1, :-1] * (1 - fy) * (1 - fx)
        + base[:-1, 1:] * (1 - fy) * fx
        + base[1:, :-1] * fy * (1 - fx)
        + base[1:, 1:] * fy * fx
    )


def _lk_kernel(
    # scalar prefetch: per-point DMA anchors
    py0_ref, px0_ref, cy0_ref, cx0_ref,
    # tensor inputs
    prev_hbm, cur_hbm, pts_ref, init_ref, active_ref,
    # outputs
    flow_ref, status_ref,
    # scratch
    tmpl_buf, cur_buf, sems,
    *, win: int, iters: int, eps: float, min_eig: float,
):
    i = pl.program_id(0)
    PS = win + 2
    half = PS // 2

    py0 = pl.multiple_of(py0_ref[i], 8)
    px0 = pl.multiple_of(px0_ref[i], 128)
    cy0 = pl.multiple_of(cy0_ref[i], 8)
    cx0 = pl.multiple_of(cx0_ref[i], 128)
    # per-point data lives in SMEM: dynamic scalar indexing is natural
    # there, while tiny VMEM blocks violate the (8,128) tiling rules

    cp_t = pltpu.make_async_copy(
        prev_hbm.at[pl.ds(py0, T_ROWS), pl.ds(px0, T_COLS)], tmpl_buf, sems.at[0]
    )
    cp_c = pltpu.make_async_copy(
        cur_hbm.at[pl.ds(cy0, S_ROWS), pl.ds(cx0, S_COLS)], cur_buf, sems.at[1]
    )
    cp_t.start()
    cp_c.start()

    p = jnp.stack([pts_ref[i, 0], pts_ref[i, 1]])  # (x, y) padded coords
    u0 = jnp.stack([init_ref[i, 0], init_ref[i, 1]]) - p  # initial flow
    act = active_ref[i] > 0

    # template anchor inside the tile: p - half - 1 relative to (px0, py0)
    tx = p[0] - px0.astype(p.dtype)
    ty = p[1] - py0.astype(p.dtype)
    itx = jnp.floor(tx).astype(jnp.int32) - half - 1
    ity = jnp.floor(ty).astype(jnp.int32) - half - 1
    fx = tx - jnp.floor(tx)
    fy = ty - jnp.floor(ty)

    cp_t.wait()
    tmpl_tile = tmpl_buf[:]
    pe = _subpix(tmpl_tile, ity + 1, itx + 1, PS, fy, fx)
    tmpl = pe[1:-1, 1:-1]
    Ix = (pe[1:-1, 2:] - pe[1:-1, :-2]) * 0.5
    Iy = (pe[2:, 1:-1] - pe[:-2, 1:-1]) * 0.5
    Gxx = jnp.sum(Ix * Ix)
    Gxy = jnp.sum(Ix * Iy)
    Gyy = jnp.sum(Iy * Iy)
    det = Gxx * Gyy - Gxy * Gxy
    tr = Gxx + Gyy
    eig_min = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0)))
    ok_eig = eig_min / (win * win) >= min_eig
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)

    cp_c.wait()
    cur_tile = cur_buf[:]
    cx0f = cx0.astype(p.dtype)
    cy0f = cy0.astype(p.dtype)

    def body(k, carry):
        u, done = carry
        qx = p[0] + u[0] - cx0f
        qy = p[1] + u[1] - cy0f
        # clamp the sample anchor inside the search tile
        iqx = jnp.clip(jnp.floor(qx).astype(jnp.int32) - half - 1, 0,
                       S_COLS - PS - 2)
        iqy = jnp.clip(jnp.floor(qy).astype(jnp.int32) - half - 1, 0,
                       S_ROWS - PS - 2)
        fqx = qx - jnp.floor(qx)
        fqy = qy - jnp.floor(qy)
        cur = _subpix(cur_tile, iqy + 1, iqx + 1, PS, fqy, fqx)[1:-1, 1:-1]
        dI = cur - tmpl
        bx = jnp.sum(dI * Ix)
        by = jnp.sum(dI * Iy)
        du0 = inv_det * (Gyy * bx - Gxy * by)
        du1 = inv_det * (-Gxy * bx + Gxx * by)
        small = du0 * du0 + du1 * du1 < eps * eps
        u_new = jnp.where(done, u, u - jnp.stack([du0, du1]))
        return (u_new, done | small)

    u, _ = jax.lax.fori_loop(0, iters, body, (u0, ~(act & ok_eig)))

    # in-region check: final sample anchor must fit the search tile
    gx = p[0] + u[0] - cx0f
    gy = p[1] + u[1] - cy0f
    in_region = (
        (gx >= half + 2) & (gx < S_COLS - half - 2)
        & (gy >= half + 2) & (gy < S_ROWS - half - 2)
    )
    flow_ref[i, 0] = u[0]
    flow_ref[i, 1] = u[1]
    status_ref[i] = (act & ok_eig & in_region).astype(jnp.int32)


@partial(jax.jit, static_argnames=("win", "iters", "eps", "min_eig", "interpret"))
def lk_level_pallas(
    prev_img: jax.Array,  # (H, W) float32, UNPADDED level image
    cur_img: jax.Array,
    pts: jax.Array,  # (N, 2) template positions (x, y)
    init_pts: jax.Array,  # (N, 2) warm-start positions in cur
    active: jax.Array,  # (N,) bool
    win: int = 21,
    iters: int = 30,
    eps: float = 0.01,
    min_eig: float = 1e-4,
    interpret: bool = False,
):
    """One pyramid level of LK for all points. Returns (flow (N,2), status)."""
    dtype = prev_img.dtype
    N = pts.shape[0]
    PS = win + 2
    pad = PS  # generous edge padding so every DMA tile is in bounds
    H, W = prev_img.shape
    # images must fit the fixed DMA tiles with alignment slack
    extra_h = max(0, S_ROWS + 8 + 2 - (H + 2 * pad))
    extra_w = max(0, S_COLS + 128 + 2 - (W + 2 * pad))
    padding = ((pad, pad + extra_h), (pad, pad + extra_w))
    prev_p = jnp.pad(prev_img, padding, mode="edge")
    cur_p = jnp.pad(cur_img, padding, mode="edge")
    Hp, Wp = prev_p.shape

    pts_p = pts + pad
    init_p = init_pts + pad

    # aligned DMA anchors: lane starts ≡ 0 (mod 128), sublane ≡ 0 (mod 8),
    # clamped (to aligned values) so the fixed-size tiles stay in bounds
    def aligned_anchor(v, unit, lead_units, tile, dim):
        a = (jnp.floor(v).astype(jnp.int32) // unit - lead_units) * unit
        hi = ((dim - tile - 1) // unit) * unit
        return jnp.clip(a, 0, max(hi, 0))

    py0 = aligned_anchor(pts_p[:, 1], 8, 2, T_ROWS, Hp)
    px0 = aligned_anchor(pts_p[:, 0], 128, 1, T_COLS, Wp)
    cy0 = aligned_anchor(init_p[:, 1], 8, 2, S_ROWS, Hp)
    cx0 = aligned_anchor(init_p[:, 0], 128, 1, S_COLS, Wp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(N,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # prev (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),  # cur (HBM)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # pts (N,2)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # init (N,2)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # active (N,)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((T_ROWS, T_COLS), dtype),
            pltpu.VMEM((S_ROWS, S_COLS), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    flow, status = pl.pallas_call(
        partial(_lk_kernel, win=win, iters=iters, eps=eps, min_eig=min_eig),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((N, 2), dtype),
            jax.ShapeDtypeStruct((N,), jnp.int32),
        ],
        interpret=interpret,
    )(py0, px0, cy0, cx0, prev_p, cur_p, pts_p, init_p,
      active.astype(jnp.int32))
    return flow, status > 0


def pyramidal_lk_pallas(
    prev_pyr, cur_pyr, pts, init_pts, active,
    win: int = 21, max_iters: int = 30, eps: float = 0.01,
    min_eig: float = 1e-4, interpret: bool = False,
):
    """Drop-in replacement for ops.lk.pyramidal_lk using the Pallas kernel.

    Returns the same LKResult (err reported as zeros — the pipeline uses
    only pts/status)."""
    from .lk import LKResult

    levels = len(prev_pyr)
    dtype = prev_pyr[0].dtype
    scale_top = jnp.asarray(2.0 ** (levels - 1), dtype)
    flow = (init_pts - pts) / scale_top
    status = active
    for l in range(levels - 1, -1, -1):
        s = jnp.asarray(2.0 ** l, dtype)
        pts_l = pts / s
        fl, st = lk_level_pallas(
            prev_pyr[l], cur_pyr[l], pts_l, pts_l + flow, active,
            win=win, iters=max_iters, eps=eps, min_eig=min_eig,
            interpret=interpret,
        )
        flow = fl
        # border status only meaningful at the finest level (cf. ops/lk.py)
        if l == 0:
            H, W = prev_pyr[0].shape
            new_pos = pts + flow
            half = win // 2
            inb = (
                (new_pos[:, 0] >= half) & (new_pos[:, 0] < W - half)
                & (new_pos[:, 1] >= half) & (new_pos[:, 1] < H - half)
            )
            status = status & st & inb
        else:
            status = status & st
            flow = flow * 2.0
    return LKResult(pts=pts + flow, status=status,
                    err=jnp.zeros(pts.shape[0], dtype))
