"""Pyramidal Lucas-Kanade optical flow, fully vectorized over points.

Replaces the reference's hottest frontend kernel, ``cv::calcOpticalFlowPyrLK``
(21×21 window, maxLevel 1 with IMU-predicted initial flow / maxLevel 3
without, 30 iterations, eps 0.01 —
``/root/reference/vins_estimator/src/feature_tracker/feature_tracker.cpp:
298-311``).

TPU-native design: a naive formulation gathers every patch pixel
individually (~230k gathers/iteration — gathers serialize on TPU).  Here
each point's patch is ONE ``dynamic_slice`` of an integer-anchored tile;
the subpixel shift is applied inside the tile with four shifted-slab
multiplies (pure VPU work).  All points track simultaneously under
``vmap``; pyramid levels are a static Python loop.
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax
import jax.numpy as jnp


class LKResult(NamedTuple):
    pts: jax.Array  # (N,2) tracked positions in level-0 coords
    status: jax.Array  # (N,) bool
    err: jax.Array  # (N,) mean abs residual of final patch


def _subpix_patch(img_padded: jax.Array, p: jax.Array, size: int, pad: int):
    """(size, size) patch of bilinear samples at positions p + offsets,
    offsets ∈ {-(size-1)/2 .. +(size-1)/2}² — via one integer-anchored
    (size+1)² tile + fractional blend.

    ``img_padded`` is the level image edge-padded by ``pad`` on all sides
    (pad ≥ half+1), so in-image points never clamp-misalign; coordinates
    are in the *unpadded* frame.  Far-out-of-image positions (diverged
    tracks) clamp — their status dies anyway."""
    H, W = img_padded.shape
    half = (size - 1) // 2
    base = jnp.floor(p)
    fx = p[0] - base[0]
    fy = p[1] - base[1]
    x0 = jnp.clip(base[0].astype(jnp.int32) + pad - half, 0, W - size - 1)
    y0 = jnp.clip(base[1].astype(jnp.int32) + pad - half, 0, H - size - 1)
    tile = jax.lax.dynamic_slice(img_padded, (y0, x0), (size + 1, size + 1))
    return (
        tile[:-1, :-1] * (1 - fy) * (1 - fx)
        + tile[:-1, 1:] * (1 - fy) * fx
        + tile[1:, :-1] * fy * (1 - fx)
        + tile[1:, 1:] * fy * fx
    )


def _row_strips(img_padded, y0, nrows):
    """(N, nrows, Wp) row strips starting at integer rows y0 (N,) — ONE
    row-granular gather instead of N 2-D window gathers (TPU executes 2-D
    window gathers as serial per-row fragment copies; whole-row gathers
    move contiguous lanes)."""
    N = y0.shape[0]
    rows = y0[:, None] + jnp.arange(nrows, dtype=y0.dtype)[None, :]
    return jnp.take(img_padded, rows.reshape(-1), axis=0).reshape(
        N, nrows, img_padded.shape[1])


def _col_select(strips, x0, ncols, fx=None):
    """Select ``ncols`` columns starting at integer x0 (N,) from
    (N, R, Wp) strips via a one-hot selector einsum (MXU); with ``fx``
    (N,) the selector carries bilinear x-weights."""
    N, R, Wp = strips.shape
    dtype = strips.dtype
    iota = jnp.arange(Wp, dtype=jnp.int32)
    idx = x0[:, None] + jnp.arange(ncols, dtype=jnp.int32)[None, :]  # (N,C)
    hit = iota[None, :, None] == idx[:, None, :]
    if fx is None:
        C = hit.astype(dtype)
    else:
        f = fx[:, None, None]
        C = hit.astype(dtype) * (1.0 - f) + (
            iota[None, :, None] == idx[:, None, :] + 1).astype(dtype) * f
    return jnp.einsum("nrw,nwc->nrc", strips, C)


def _batched_subpix_patches(img_padded, pts, size, pad):
    """Batched twin of ``_subpix_patch`` — (N, size, size) bilinear patches
    via one row gather + fractional row blend + one weighted column-select
    einsum (identical clamping semantics)."""
    N = pts.shape[0]
    H, W = img_padded.shape
    half = (size - 1) // 2
    base = jnp.floor(pts)
    fx = pts[:, 0] - base[:, 0]
    fy = (pts[:, 1] - base[:, 1])[:, None, None]
    x0 = jnp.clip(base[:, 0].astype(jnp.int32) + pad - half, 0, W - size - 1)
    y0 = jnp.clip(base[:, 1].astype(jnp.int32) + pad - half, 0, H - size - 1)
    E = _row_strips(img_padded, y0, size + 1)
    Ey = E[:, :-1, :] * (1.0 - fy) + E[:, 1:, :] * fy  # (N, size, Wp)
    return _col_select(Ey, x0, size, fx)


def _track_level_matmul(
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
    search_margin: int = 8,
    engine: str = "xla",
    engine_interpret: bool = False,
):
    """Matmul-sampled LK level: ONE window gather per point, then every
    GN iteration samples the current patch by one-hot-selector einsums
    (bilinear weights folded into the selectors) — pure MXU/VPU work.

    In BATCHED (vmap-over-sequences) mode the per-iteration
    ``dynamic_slice`` of the gather formulation lowers to a TPU gather
    (~serial element rate); at 30 iterations × levels × points × 24²
    elements the gathers dominated the whole batched tracker (78 ms →
    ~16 ms for B=8 with this sampler).  In SINGLE-sequence mode the
    einsums lose to the gather path (~2× frame latency) — choose per mode
    via ``pyramidal_lk(sampler=...)``.  Flow beyond ±``search_margin`` px
    of the warm start fails status — the same tracks the reference's LK
    loses on unpredicted motion."""
    dtype = prev_img.dtype
    H, W = prev_img.shape
    PS = win + 2  # extended template for central-difference gradients
    WIN = win + 1 + 2 * search_margin  # sampled search-window side
    pad = WIN
    prev_p = jnp.pad(prev_img, pad, mode="edge")
    cur_p = jnp.pad(cur_img, pad, mode="edge")
    Hp, Wp = cur_p.shape

    # template patches + gradients — batched row-strip/einsum extraction
    pe = _batched_subpix_patches(prev_p, pts_l, PS, pad)  # (N, PS, PS)
    tmpl = pe[:, 1:-1, 1:-1]
    Ix = (pe[:, 1:-1, 2:] - pe[:, 1:-1, :-2]) * 0.5
    Iy = (pe[:, 2:, 1:-1] - pe[:, :-2, 1:-1]) * 0.5
    Gxx = jnp.sum(Ix * Ix, axis=(1, 2))
    Gxy = jnp.sum(Ix * Iy, axis=(1, 2))
    Gyy = jnp.sum(Iy * Iy, axis=(1, 2))
    # search windows around the warm starts
    q = pts_l + flow
    ax = jnp.clip(jnp.floor(q[:, 0]).astype(jnp.int32) + pad - win // 2
                  - search_margin, 0, Wp - WIN)
    ay = jnp.clip(jnp.floor(q[:, 1]).astype(jnp.int32) + pad - win // 2
                  - search_margin, 0, Hp - WIN)
    win_img = _col_select(_row_strips(cur_p, ay, WIN), ax, WIN)

    det = Gxx * Gyy - Gxy * Gxy
    tr = Gxx + Gyy
    eig_min = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))
    ok_eig = eig_min / (win * win) >= min_eig
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)

    axf = ax.astype(dtype) - pad  # window origin in image coords
    ayf = ay.astype(dtype) - pad
    iota = jnp.arange(WIN, dtype=jnp.int32)
    offs = jnp.arange(win, dtype=jnp.int32)

    def sample(u):
        """Bilinear win×win patches at pts+u via selector matmuls (N,...)"""
        sx = pts_l[:, 0] + u[:, 0] - axf - (win // 2)  # window coords of
        sy = pts_l[:, 1] + u[:, 1] - ayf - (win // 2)  # patch origin
        bx = jnp.floor(sx)
        by = jnp.floor(sy)
        fx = (sx - bx)[:, None, None]
        fy = (sy - by)[:, None, None]
        idx = bx.astype(jnp.int32)[:, None, None] + offs[None, :, None]
        idy = by.astype(jnp.int32)[:, None, None] + offs[None, :, None]
        # C (N, WIN, win): column selector w/ bilinear x-weights
        C = ((iota[None, :, None] == idx.transpose(0, 2, 1)) * (1.0 - fx)
             + (iota[None, :, None] == idx.transpose(0, 2, 1) + 1) * fx
             ).astype(dtype)
        # R (N, win, WIN): row selector w/ bilinear y-weights
        R = ((iota[None, None, :] == idy) * (1.0 - fy)
             + (iota[None, None, :] == idy + 1) * fy).astype(dtype)
        return jnp.einsum("nrw,nwv,nvc->nrc", R, win_img, C)

    done0 = ~(active & ok_eig)
    if engine == "pallas":
        # VMEM-resident iteration kernel — identical selectors/updates,
        # fixed iteration count with done-masking (≡ the all-done early
        # exit of the while_loop)
        from . import lk_pallas2
        u, err = lk_pallas2.lk_iterate(
            tmpl, Ix, Iy, win_img,
            pts_l[:, 0] - axf - (win // 2), pts_l[:, 1] - ayf - (win // 2),
            flow, done0, inv_det, Gxx, Gxy, Gyy,
            w=win, WIN=WIN, iters=max_iters, eps=eps,
            interpret=engine_interpret)
    else:
        def cond(carry):
            k, u, done = carry
            return (k < max_iters) & ~jnp.all(done)

        def body(carry):
            k, u, done = carry
            cur = sample(u)
            dI = cur - tmpl
            bx = jnp.einsum("nij,nij->n", dI, Ix)
            by = jnp.einsum("nij,nij->n", dI, Iy)
            du = jnp.stack([
                inv_det * (Gyy * bx - Gxy * by),
                inv_det * (-Gxy * bx + Gxx * by),
            ], axis=-1)
            u_new = jnp.where(done[:, None], u, u - du)
            small = jnp.sum(du * du, axis=-1) < eps * eps
            return (k + 1, u_new, done | small)

        _, u, _ = jax.lax.while_loop(
            cond, body, (jnp.asarray(0, jnp.int32), flow, done0))

        fin = sample(u)
        err = jnp.mean(jnp.abs(fin - tmpl), axis=(1, 2))
    new_pos = pts_l + u
    # flow must stay inside the sampled window (replaces divergence the
    # gather formulation caught by clamping)
    in_win = (
        (new_pos[:, 0] - (win // 2) >= axf)
        & (new_pos[:, 0] + (win // 2) + 1 < axf + WIN)
        & (new_pos[:, 1] - (win // 2) >= ayf)
        & (new_pos[:, 1] + (win // 2) + 1 < ayf + WIN)
    )
    if check_border:
        hb = win // 2
        inb = (
            (new_pos[:, 0] >= hb) & (new_pos[:, 0] < W - hb)
            & (new_pos[:, 1] >= hb) & (new_pos[:, 1] < H - hb)
        )
    else:
        inb = jnp.ones_like(in_win)
    status = active & ok_eig & in_win & inb
    return u, status, err


def _track_level_gather(
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
    PS = win + 2  # extended patch for central-difference gradients
    pad = PS // 2 + 2
    prev_p = jnp.pad(prev_img, pad, mode="edge")
    cur_p = jnp.pad(cur_img, pad, mode="edge")

    def one_point(p, u0, act):
        pe = _subpix_patch(prev_p, p, PS, pad)
        tmpl = pe[1:-1, 1:-1]
        Ix = (pe[1:-1, 2:] - pe[1:-1, :-2]) * 0.5
        Iy = (pe[2:, 1:-1] - pe[:-2, 1:-1]) * 0.5
        Gxx = jnp.sum(Ix * Ix)
        Gxy = jnp.sum(Ix * Iy)
        Gyy = jnp.sum(Iy * Iy)
        det = Gxx * Gyy - Gxy * Gxy
        tr = Gxx + Gyy
        eig_min = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))
        ok_eig = eig_min / (win * win) >= min_eig
        inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)

        def cond(carry):
            k, u, done = carry
            return (k < max_iters) & ~done

        def body(carry):
            k, u, done = carry
            cur = _subpix_patch(cur_p, p + u, PS, pad)[1:-1, 1:-1]
            dI = cur - tmpl
            bx = jnp.sum(dI * Ix)
            by = jnp.sum(dI * Iy)
            du = jnp.stack([
                inv_det * (Gyy * bx - Gxy * by),
                inv_det * (-Gxy * bx + Gxx * by),
            ])
            u_new = u - du
            small = jnp.sum(du * du) < eps * eps
            return (k + 1, u_new, small)

        # early-exit while_loop: LK typically converges in <10 iterations;
        # a fixed fori would pay full per-iteration overhead 30× per level
        _, u, _ = jax.lax.while_loop(
            cond, body, (jnp.asarray(0, jnp.int32), u0, ~(act & ok_eig))
        )
        fin = _subpix_patch(cur_p, p + u, PS, pad)[1:-1, 1:-1]
        err = jnp.mean(jnp.abs(fin - tmpl))
        new_pos = p + u
        if check_border:
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


def _track_level_fused(
    prev_img, cur_img, pts_l, flow, active, win, max_iters, eps, min_eig,
    check_border, search_margin: int = 8, engine_interpret: bool = False,
):
    """Pallas v3 level: patch prep + GN iterations fused in one kernel
    with per-point HBM→VMEM tile DMA (`ops/lk_pallas3.py`) — no
    image-sized intermediates.  Status semantics identical to
    ``_track_level_matmul``."""
    from . import lk_pallas3

    dtype = prev_img.dtype
    H, W = prev_img.shape
    WIN = win + 1 + 2 * search_margin
    pad = WIN
    prev_p = jnp.pad(prev_img, pad, mode="edge")
    cur_p = jnp.pad(cur_img, pad, mode="edge")
    u, ok_eig, err, axf, ayf = lk_pallas3.lk_level_fused(
        prev_p, cur_p, pts_l, flow, active, win=win,
        search_margin=search_margin, iters=max_iters, eps=eps,
        min_eig=min_eig, interpret=engine_interpret)
    u = u.astype(dtype)
    new_pos = pts_l + u
    in_win = (
        (new_pos[:, 0] - (win // 2) >= axf)
        & (new_pos[:, 0] + (win // 2) + 1 < axf + WIN)
        & (new_pos[:, 1] - (win // 2) >= ayf)
        & (new_pos[:, 1] + (win // 2) + 1 < ayf + WIN)
    )
    if check_border:
        hb = win // 2
        inb = (
            (new_pos[:, 0] >= hb) & (new_pos[:, 0] < W - hb)
            & (new_pos[:, 1] >= hb) & (new_pos[:, 1] < H - hb)
        )
    else:
        inb = jnp.ones_like(in_win)
    status = active & ok_eig & in_win & inb
    return u, status, err.astype(dtype)


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
    coarse_iters: int = 0,  # 0 -> same as max_iters
    sampler: str = "gather",
    engine: str = "auto",  # matmul sampler: "pallas" iteration kernel on
    # TPU, the XLA while_loop elsewhere; "xla"/"pallas" force
    engine_interpret: bool = False,  # pallas interpret mode (tests)
) -> LKResult:
    """Track pts from prev to cur across the pyramid (coarse→fine).

    ``init_pts`` provides the IMU-predicted warm start (the reference's
    OPTFLOW_USE_INITIAL_FLOW path); pass ``init_pts = pts`` for the cold
    3-level mode.

    ``coarse_iters`` caps the iteration budget at levels > 0: the vmapped
    while_loop runs in lockstep to the WORST lane, and a coarse level only
    needs to land within ~1-2 px for the fine level to finish — a single
    oscillating track otherwise drags every level to ``max_iters``.

    ``sampler`` picks the per-iteration patch-resampling strategy:
    "gather" (per-iteration dynamic_slice — fastest single-sequence) or
    "matmul" (one window gather + selector einsums — ~5× faster when the
    whole tracker is vmapped over a sequence batch, where batched gathers
    serialize).  See ``_track_level_matmul``.
    """
    levels = len(prev_pyr)
    dtype = prev_pyr[0].dtype
    if sampler == "matmul":
        import functools as _ft
        eng = engine
        if eng == "auto":
            # the VMEM-resident Pallas iteration kernel (lk_pallas2) is
            # numerically equivalent but not yet proven on-device through
            # the remote-compile tunnel — opt in with engine="pallas";
            # "pallas3" fuses patch prep + iterations with per-point DMA
            eng = "xla"
        if eng == "pallas3":
            level_fn = _ft.partial(_track_level_fused,
                                   engine_interpret=engine_interpret)
        else:
            level_fn = _ft.partial(_track_level_matmul, engine=eng,
                                   engine_interpret=engine_interpret)
    else:
        level_fn = _track_level_gather
    scale_top = jnp.asarray(2.0 ** (levels - 1), dtype)
    flow = (init_pts - pts) / scale_top
    status = active
    err = jnp.zeros(pts.shape[0], dtype)
    for l in range(levels - 1, -1, -1):
        s = jnp.asarray(2.0 ** l, dtype)
        pts_l = pts / s
        iters_l = max_iters if (l == 0 or coarse_iters <= 0) else min(
            coarse_iters, max_iters)
        flow, status_l, err = level_fn(
            prev_pyr[l], cur_pyr[l], pts_l, flow, active, win, iters_l, eps,
            min_eig, check_border=(l == 0),
        )
        status = status & status_l
        if l > 0:
            flow = flow * 2.0
    return LKResult(pts=pts + flow, status=status, err=err)
