"""Pallas LK v2: all Gauss-Newton iterations of one pyramid level run
with every point's search window RESIDENT IN VMEM.

The XLA matmul-sampler formulation (`lk._track_level_matmul`) re-reads
each point's (WIN, WIN) window and materializes (N, w, WIN)/(N, w, w)
intermediates to HBM every iteration; at 12 fine + 6 coarse iterations
that is the largest remaining tracker cost in the batched runner
(~8 ms/step for B=8, device-trace measured).  Here a grid program loads a
block of PN points' templates/gradients/windows into VMEM once and runs
the whole iteration loop on-chip: the bilinear sample is the same
one-hot selector pair contracted by *batched* `dot_general` (Mosaic
supports leading batch dims), so results are IDENTICAL to the XLA loop
(same selectors, same masked updates — a fixed iteration count with
done-masking equals the early-exit while_loop's output).

v1 (`lk_pallas.py`, one point per program, per-iteration DMA) lost to
XLA and is retired; this version is ~point-batched and DMA-free inside
the loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PN = 32  # points per grid program


def _lk_iter_kernel(tmpl_ref, ix_ref, iy_ref, win_ref, scal_ref,
                    out_ref, *, w: int, WIN: int, iters: int,
                    eps: float):
    # all per-point vectors stay 2-D (PN, 1): Mosaic's layout engine
    # aborts on 1-D values (layout.h Check arr.size() >= 2)
    tmpl = tmpl_ref[:]   # (PN, w, w)
    Ix = ix_ref[:]
    Iy = iy_ref[:]
    win = win_ref[:]     # (PN, WIN, WIN)
    sc = scal_ref[:]     # (PN, 9): px py u0x u0y inv_det Gxx Gxy Gyy done
    done0 = sc[:, 8:9] > 0.5

    px, py = sc[:, 0:1], sc[:, 1:2]
    inv_det = sc[:, 4:5]
    Gxx, Gxy, Gyy = sc[:, 5:6], sc[:, 6:7], sc[:, 7:8]

    iw_r = jax.lax.broadcasted_iota(jnp.int32, (PN, w, WIN), 2)
    iw_c = jax.lax.broadcasted_iota(jnp.int32, (PN, WIN, w), 1)
    off_r = jax.lax.broadcasted_iota(jnp.int32, (PN, w, WIN), 1)
    off_c = jax.lax.broadcasted_iota(jnp.int32, (PN, WIN, w), 2)

    def rsum(x):  # (PN, a, b) -> (PN, 1) without 1-D intermediates
        return jnp.sum(jnp.sum(x, axis=2), axis=1, keepdims=True)

    def sample(ux, uy):  # ux/uy (PN, 1)
        sx = px + ux
        sy = py + uy
        bx = jnp.floor(sx)
        by = jnp.floor(sy)
        fx = (sx - bx)[:, :, None]  # (PN, 1, 1)
        fy = (sy - by)[:, :, None]
        idy = by.astype(jnp.int32)[:, :, None] + off_r  # (PN, w, WIN)
        idx = bx.astype(jnp.int32)[:, :, None] + off_c  # (PN, WIN, w)
        R = ((iw_r == idy).astype(jnp.float32) * (1.0 - fy)
             + (iw_r == idy + 1).astype(jnp.float32) * fy)  # (PN, w, WIN)
        C = ((iw_c == idx).astype(jnp.float32) * (1.0 - fx)
             + (iw_c == idx + 1).astype(jnp.float32) * fx)  # (PN, WIN, w)
        RW = jax.lax.dot_general(
            R, win, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (PN, w, WIN)
        return jax.lax.dot_general(
            RW, C, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (PN, w, w)

    # statically unrolled: an scf.for with these (PN,1) carries fails
    # Mosaic legalization (mismatched vreg pad layouts across the yield)
    ux, uy, done = sc[:, 2:3], sc[:, 3:4], done0
    for _ in range(iters):
        cur = sample(ux, uy)
        dI = cur - tmpl
        bxv = rsum(dI * Ix)  # (PN, 1)
        byv = rsum(dI * Iy)
        dux = inv_det * (Gyy * bxv - Gxy * byv)
        duy = inv_det * (-Gxy * bxv + Gxx * byv)
        ux = jnp.where(done, ux, ux - dux)
        uy = jnp.where(done, uy, uy - duy)
        done = done | (dux * dux + duy * duy < eps * eps)
    fin = sample(ux, uy)
    err = rsum(jnp.abs(fin - tmpl)) * (1.0 / (w * w))
    out_ref[:] = jnp.concatenate([ux, uy, err, err], axis=1)  # (PN, 4)


@functools.partial(jax.jit, static_argnames=("w", "WIN", "iters", "eps",
                                             "interpret"))
def lk_iterate(tmpl, Ix, Iy, win, px, py, u0, done0,
               inv_det, Gxx, Gxy, Gyy, *, w: int, WIN: int, iters: int,
               eps: float, interpret: bool = False):
    """Run the LK GN loop for N points; returns (u (N,2), err (N,)).

    Exact twin of the while_loop + ``sample`` in
    ``lk._track_level_matmul`` (the fixed-count loop with done-masking
    produces the same result as the all-done early exit).
    """
    N = tmpl.shape[0]
    n = pl.cdiv(N, PN)
    Np = n * PN

    def padN(a, fill=0.0):
        if a.shape[0] == Np:
            return a
        pad = jnp.full((Np - N,) + a.shape[1:], fill, a.dtype)
        return jnp.concatenate([a, pad], axis=0)

    scal = jnp.stack([px, py, u0[:, 0], u0[:, 1], inv_det, Gxx, Gxy, Gyy,
                      done0.astype(jnp.float32)], axis=1)  # (N, 9)
    scal = padN(scal, 1.0)  # padded rows: done=1 (never iterate)
    args = (padN(tmpl), padN(Ix), padN(Iy), padN(win), scal)
    out = pl.pallas_call(
        functools.partial(_lk_iter_kernel, w=w, WIN=WIN, iters=iters,
                          eps=float(eps)),
        out_shape=jax.ShapeDtypeStruct((Np, 4), jnp.float32),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((PN, w, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PN, w, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PN, w, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PN, WIN, WIN), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PN, 9), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((PN, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)
    return out[:N, :2], out[:N, 2]
