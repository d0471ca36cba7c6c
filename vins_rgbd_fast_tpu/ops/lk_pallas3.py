"""Pallas LK v3: whole pyramid level — patch prep AND Gauss-Newton loop —
in one kernel, with per-point DMA of aligned image tiles HBM→VMEM.

Why: the XLA patch prep behind v2 (`lk._track_level_matmul`) materializes
row strips of the padded image per point — (N, WIN, Wp) plus (N, PS+1, Wp)
≈ 35 MB of HBM intermediates per level per frame per sequence (device-
trace: ~4 ms of the 24 ms B=8 step).  Here each grid program DMAs PN
points' aligned tiles (template region from the previous image, search
region from the current image) directly into VMEM scratch and builds the
template/gradients/window with the same bilinear-selector dot_generals —
no image-sized intermediate ever touches HBM.

Hardware rules honored (docs/ROADMAP.md, learned in v1/v2):
  * DMA slice starts aligned: rows to 8, lanes to 128 — anchors are
    aligned DOWN on host and the residual offset folded into the
    bilinear selectors (no in-kernel rolls at all);
  * every per-point vector stays 2-D (PN, 1);
  * the GN loop is statically unrolled; outputs packed (PN, 8);
  * memory-space-ANY refs must be whole-array with a trivial index map —
    ``jax.vmap``'s lifted block specs violate that, so batching goes
    through a ``custom_vmap`` rule onto an explicitly batch-aware kernel
    (grid (B, n), batch index applied inside the DMA source).

Equivalence: selectors are masked to the true WIN-window span, so results
are IDENTICAL to `_track_level_matmul` (and v2) — including zero-sample
behavior for diverged tracks — and are asserted so in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PN = 8          # points per grid program (VMEM ≈ 80 KB/point of tiles)
LANES = 256     # tile width: ≥ 128 (anchor residual) + window span
TROWS = 32      # template tile rows: PS+1 (≤24) + ≤7 alignment residual
WROWS = 48      # search tile rows: WIN (≤38) + 1 + ≤7 residual


def _kernel(anch_ref, sc_ref, prev_ref, cur_ref, out_ref,
            prev_t, cur_t, sems, *, w: int, PS: int, WIN: int,
            iters: int, eps: float, min_eig: float, Npad: int):
    # images arrive as 2-D (B·Hbig, Wbig) with ANY memory space and the
    # anchors as SCALAR-PREFETCH operands — the v1-proven combination that
    # keeps the image in HBM with real DMA descriptors (blocked-SMEM
    # anchors / 3-D refs made Mosaic stage the image through VMEM, where
    # the dynamic memref_slice fails to lower); the per-batch row offset
    # is folded into the anchors on host.
    b = pl.program_id(0)
    i = pl.program_id(1)
    base = b * Npad + i * PN

    # ---- per-point DMAs (issue all, then wait) ----
    def copies(k):
        # anchors arrive pre-aligned, but the (v // unit) * unit form is
        # re-derived HERE so Mosaic can symbolically prove the DMA start
        # divisible by the memref tiling ("Failed to prove that a tile
        # index ... is divisible" otherwise)
        ty = (anch_ref[base + k, 0] // 8) * 8
        tx = (anch_ref[base + k, 1] // 128) * 128
        wy = (anch_ref[base + k, 2] // 8) * 8
        wx = (anch_ref[base + k, 3] // 128) * 128
        return (
            pltpu.make_async_copy(
                prev_ref.at[pl.ds(ty, TROWS), pl.ds(tx, LANES)],
                prev_t.at[k], sems.at[k, 0]),
            pltpu.make_async_copy(
                cur_ref.at[pl.ds(wy, WROWS), pl.ds(wx, LANES)],
                cur_t.at[k], sems.at[k, 1]),
        )

    for k in range(PN):
        for c in copies(k):
            c.start()
    for k in range(PN):
        for c in copies(k):
            c.wait()

    sc = sc_ref[0]          # (PN, 12): see wrapper for column layout
    fxT = sc[:, 0:1]
    fyT = sc[:, 1:2]
    oyT = sc[:, 2:3]        # template origin row within prev tile (0..7)
    oxT = sc[:, 3:4]        # template origin col within prev tile (0..127)
    oyW = sc[:, 4:5]        # window origin within cur tile
    oxW = sc[:, 5:6]
    px = sc[:, 6:7]         # template position in WINDOW coords
    py = sc[:, 7:8]
    ux = sc[:, 8:9]
    uy = sc[:, 9:10]
    act = sc[:, 10:11] > 0.5

    def rsum(x):
        return jnp.sum(jnp.sum(x, axis=2), axis=1, keepdims=True)

    # ---- template + gradients from the prev tiles ----
    # E-row blend (rows oyT..oyT+PS, bilinear fyT) then col-select
    # (cols oxT..oxT+PS, bilinear fxT): _batched_subpix_patches twin.
    rt_i = jax.lax.broadcasted_iota(jnp.int32, (PN, PS, TROWS), 2)
    rt_o = jax.lax.broadcasted_iota(jnp.int32, (PN, PS, TROWS), 1)
    idy = oyT.astype(jnp.int32)[:, :, None] + rt_o
    Rt = ((rt_i == idy).astype(jnp.float32) * (1.0 - fyT[:, :, None])
          + (rt_i == idy + 1).astype(jnp.float32) * fyT[:, :, None])
    ct_i = jax.lax.broadcasted_iota(jnp.int32, (PN, LANES, PS), 1)
    ct_o = jax.lax.broadcasted_iota(jnp.int32, (PN, LANES, PS), 2)
    idx = oxT.astype(jnp.int32)[:, :, None] + ct_o
    Ct = ((ct_i == idx).astype(jnp.float32) * (1.0 - fxT[:, :, None])
          + (ct_i == idx + 1).astype(jnp.float32) * fxT[:, :, None])
    RE = jax.lax.dot_general(
        Rt, prev_t[:], dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)      # (PN, PS, LANES)
    pe = jax.lax.dot_general(
        RE, Ct, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)      # (PN, PS, PS)
    tmpl = pe[:, 1:-1, 1:-1]
    Ix = (pe[:, 1:-1, 2:] - pe[:, 1:-1, :-2]) * 0.5
    Iy = (pe[:, 2:, 1:-1] - pe[:, :-2, 1:-1]) * 0.5
    Gxx = rsum(Ix * Ix)
    Gxy = rsum(Ix * Iy)
    Gyy = rsum(Iy * Iy)
    det = Gxx * Gyy - Gxy * Gxy
    tr = Gxx + Gyy
    eig_min = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0)))
    ok_eig = eig_min * (1.0 / (w * w)) >= min_eig
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)

    # ---- GN iterations sampling the cur tiles ----
    # selectors span the full tile but are MASKED to the true WIN window
    # (exact `_track_level_matmul` semantics: samples outside the window
    # read as zero)
    iw_r = jax.lax.broadcasted_iota(jnp.int32, (PN, w, WROWS), 2)
    off_r = jax.lax.broadcasted_iota(jnp.int32, (PN, w, WROWS), 1)
    iw_c = jax.lax.broadcasted_iota(jnp.int32, (PN, LANES, w), 1)
    off_c = jax.lax.broadcasted_iota(jnp.int32, (PN, LANES, w), 2)
    oyWi = oyW.astype(jnp.int32)[:, :, None]
    oxWi = oxW.astype(jnp.int32)[:, :, None]
    rmask = ((iw_r >= oyWi) & (iw_r < oyWi + WIN)).astype(jnp.float32)
    cmask = ((iw_c >= oxWi) & (iw_c < oxWi + WIN)).astype(jnp.float32)

    def sample(ux, uy):
        sx = px + ux + oxW          # window coords -> tile coords
        sy = py + uy + oyW
        bx = jnp.floor(sx)
        by = jnp.floor(sy)
        fx = (sx - bx)[:, :, None]
        fy = (sy - by)[:, :, None]
        idy = by.astype(jnp.int32)[:, :, None] + off_r
        idx = bx.astype(jnp.int32)[:, :, None] + off_c
        R = ((iw_r == idy).astype(jnp.float32) * (1.0 - fy)
             + (iw_r == idy + 1).astype(jnp.float32) * fy) * rmask
        C = ((iw_c == idx).astype(jnp.float32) * (1.0 - fx)
             + (iw_c == idx + 1).astype(jnp.float32) * fx) * cmask
        RW = jax.lax.dot_general(
            R, cur_t[:], dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (PN, w, LANES)
        return jax.lax.dot_general(
            RW, C, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (PN, w, w)

    done = (~act) | (~ok_eig)
    for _ in range(iters):
        cur = sample(ux, uy)
        dI = cur - tmpl
        bxv = rsum(dI * Ix)
        byv = rsum(dI * Iy)
        dux = inv_det * (Gyy * bxv - Gxy * byv)
        duy = inv_det * (-Gxy * bxv + Gxx * byv)
        ux = jnp.where(done, ux, ux - dux)
        uy = jnp.where(done, uy, uy - duy)
        done = done | (dux * dux + duy * duy < eps * eps)
    fin = sample(ux, uy)
    err = rsum(jnp.abs(fin - tmpl)) * (1.0 / (w * w))
    out_ref[0] = jnp.concatenate(
        [ux, uy, err, ok_eig.astype(jnp.float32),
         jnp.zeros((PN, 4), jnp.float32)], axis=1)  # (PN, 8)


def _run_batch(prev_p, cur_p, pts_l, flow, active, *, win, search_margin,
               iters, eps, min_eig, interpret):
    """Batch-aware host wrapper: all inputs carry a leading B axis."""
    dtype = prev_p.dtype
    B, Hp, Wp = prev_p.shape
    N = pts_l.shape[1]
    PS = win + 2
    WIN = win + 1 + 2 * search_margin
    pad = WIN
    assert PS + 1 + 7 <= TROWS and WIN + 1 + 7 <= WROWS

    # template anchors (identical clamping to _batched_subpix_patches)
    half = (PS - 1) // 2
    base = jnp.floor(pts_l)
    fxT = pts_l[..., 0] - base[..., 0]
    fyT = pts_l[..., 1] - base[..., 1]
    x0t = jnp.clip(base[..., 0].astype(jnp.int32) + pad - half,
                   0, Wp - PS - 1)
    y0t = jnp.clip(base[..., 1].astype(jnp.int32) + pad - half,
                   0, Hp - PS - 1)
    # search-window anchors (identical to _track_level_matmul)
    q = pts_l + flow
    ax = jnp.clip(jnp.floor(q[..., 0]).astype(jnp.int32) + pad - win // 2
                  - search_margin, 0, Wp - WIN)
    ay = jnp.clip(jnp.floor(q[..., 1]).astype(jnp.int32) + pad - win // 2
                  - search_margin, 0, Hp - WIN)

    # aligned tile anchors + residuals
    tya = (y0t // 8) * 8
    txa = (x0t // 128) * 128
    wya = (ay // 8) * 8
    wxa = (ax // 128) * 128

    # pad the images so every aligned tile fits, then fold batch into the
    # row axis (2-D ANY refs DMA cleanly; Hbig is a multiple of 8 so the
    # absolute row anchors stay sublane-aligned)
    Hbig = ((Hp + 7) // 8) * 8 + TROWS + WROWS  # safe upper bound
    Wbig = ((Wp + 127) // 128) * 128 + LANES
    prev_b = jnp.zeros((B, Hbig, Wbig), jnp.float32
                       ).at[:, :Hp, :Wp].set(prev_p.astype(jnp.float32))
    cur_b = jnp.zeros((B, Hbig, Wbig), jnp.float32
                      ).at[:, :Hp, :Wp].set(cur_p.astype(jnp.float32))
    prev_b = prev_b.reshape(B * Hbig, Wbig)
    cur_b = cur_b.reshape(B * Hbig, Wbig)
    row_off = (jnp.arange(B, dtype=jnp.int32) * Hbig)[:, None]  # (B,1)

    n = pl.cdiv(N, PN)
    Np = n * PN

    def padN(a, fill=0.0):
        if a.shape[1] == Np:
            return a
        return jnp.concatenate(
            [a, jnp.full((B, Np - a.shape[1]) + a.shape[2:], fill, a.dtype)],
            axis=1)

    axf = ax.astype(dtype) - pad   # window origin, image coords
    ayf = ay.astype(dtype) - pad
    px = pts_l[..., 0] - axf - (win // 2)   # template pos in window coords
    py = pts_l[..., 1] - ayf - (win // 2)
    anch = jnp.stack([tya + row_off, txa, wya + row_off, wxa],
                     axis=-1).astype(jnp.int32)
    sc = jnp.stack([
        fxT, fyT,
        (y0t - tya).astype(dtype), (x0t - txa).astype(dtype),
        (ay - wya).astype(dtype), (ax - wxa).astype(dtype),
        px, py, flow[..., 0], flow[..., 1],
        active.astype(dtype), jnp.zeros((B, N), dtype),
    ], axis=-1)
    anch = padN(anch, 0)
    sc = padN(sc.astype(jnp.float32), 0.0)  # pad rows: active=0 (done)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n),
        in_specs=[
            pl.BlockSpec((1, PN, 12), lambda b, i, anch: (b, i, 0),
                         memory_space=pltpu.VMEM),
            # explicit HBM: with ANY, Mosaic promotes a small-enough level
            # image into VMEM and the dynamic-offset memref_slice for the
            # DMA source fails to lower
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((1, PN, 8), lambda b, i, anch: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((PN, TROWS, LANES), jnp.float32),
            pltpu.VMEM((PN, WROWS, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((PN, 2)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, w=win, PS=PS, WIN=WIN, iters=iters,
                          eps=float(eps), min_eig=float(min_eig), Npad=Np),
        out_shape=jax.ShapeDtypeStruct((B, Np, 8), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(anch.reshape(B * Np, 4), sc, prev_b, cur_b)
    u = out[:, :N, :2].astype(dtype)
    err = out[:, :N, 2].astype(dtype)
    ok_eig = out[:, :N, 3] > 0.5
    return u, ok_eig, err, axf, ayf


@functools.lru_cache(maxsize=None)
def _make_fused(win, search_margin, iters, eps, min_eig, interpret):
    kw = dict(win=win, search_margin=search_margin, iters=iters, eps=eps,
              min_eig=min_eig, interpret=interpret)

    @jax.custom_batching.custom_vmap
    def fused(prev_p, cur_p, pts_l, flow, active):
        u, ok, err, axf, ayf = _run_batch(
            prev_p[None], cur_p[None], pts_l[None], flow[None],
            active[None], **kw)
        return u[0], ok[0], err[0], axf[0], ayf[0]

    @fused.def_vmap
    def _rule(axis_size, in_batched, prev_p, cur_p, pts_l, flow, active):
        bc = lambda a, batched: a if batched else jnp.broadcast_to(
            a, (axis_size,) + a.shape)
        args = [bc(a, ib) for a, ib in zip(
            (prev_p, cur_p, pts_l, flow, active), in_batched)]
        outs = _run_batch(*args, **kw)
        return outs, tuple(True for _ in outs)

    return fused


def lk_level_fused(prev_p, cur_p, pts_l, flow, active, *, win: int,
                   search_margin: int, iters: int, eps: float,
                   min_eig: float, interpret: bool = False):
    """Fused Pallas pyramid level. ``prev_p``/``cur_p`` are the
    edge-padded level images (pad = WIN, `lk._track_level_matmul`
    convention); coordinates in the unpadded frame.

    Returns (u (N,2), ok_eig (N,), err (N,), ax (N,), ay (N,)) — the
    caller applies the in-window/border status checks (same as the XLA
    path).  Batching over sequences goes through a custom_vmap rule
    (see module docstring)."""
    f = _make_fused(win, search_margin, iters, float(eps), float(min_eig),
                    interpret)
    return f(prev_p, cur_p, pts_l, flow, active)
