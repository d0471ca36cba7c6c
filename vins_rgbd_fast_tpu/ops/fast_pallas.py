"""Fused FAST-9/16 score + 3×3 NMS as ONE Pallas stencil pass.

The XLA formulation (`ops/fast.py`) materializes a (16→24, H, W) ring
stack plus arc-min intermediates — ~100 MB of HBM round trips per batched
frame and ~8.7 ms/step of the B=8 scanned runner.  Here each grid program
holds one (TH+8, W) row band in VMEM and produces its (TH, W) band of the
final NMS'd score map: the 16 circle taps are static row slices + lane
rolls of the resident band, the contiguous-9 arc minima use a
log-doubling sliding min, and the 3×3 NMS reads the score at ±1 rows
computed inside the same band (halo 4 = FAST radius 3 + NMS 1).  Data
crosses HBM exactly twice: image in, score map out.

Semantics match ``fast.nms3(fast.fast_score(img, thr))`` exactly (same
V-measure score, same strict-maximum NMS, same 3-px border
invalidation); equivalence is asserted in tests (interpret mode) and was
checked on-device against the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fast import ARC_LEN, FAST_OFFSETS

HALO = 4  # FAST circle radius (3) + NMS neighborhood (1)


def _fast_nms_kernel(img_ref, out_ref, *, threshold: float, H: int, W: int,
                     TH: int):
    i = pl.program_id(0)
    # (TH + 2*HALO, W) band, rows [i·TH − 4, i·TH + TH + 4) of the real
    # image (input is pre-padded by HALO rows, so band row 0 = real i·TH−4)
    band = img_ref[pl.ds(i * TH, TH + 2 * HALO), :]

    # score rows computed: band rows [3, TH+5) → out rows [-1, TH+1)
    SR = TH + 2  # scored rows (one extra above/below for NMS)
    c = band[HALO - 1:HALO - 1 + SR, :]  # centers at out rows -1..TH

    # ring taps: static row slice + lane roll (wrap-around columns land in
    # the 3-px border that is invalidated below)
    diffs = []
    for dy, dx in FAST_OFFSETS:
        t = band[HALO - 1 + dy:HALO - 1 + dy + SR, :]
        if dx:
            t = pltpu.roll(t, (-dx) % W, 1)  # pltpu.roll: shift >= 0 only
        diffs.append(t - c)

    # contiguous-9 arc minima over the 16 cyclic positions (log doubling)
    def arc_scores(ds):
        m1 = [jnp.minimum(ds[k], ds[(k + 1) % 16]) for k in range(16)]
        m2 = [jnp.minimum(m1[k], m1[(k + 2) % 16]) for k in range(16)]
        m4 = [jnp.minimum(m2[k], m2[(k + 4) % 16]) for k in range(16)]
        # m4[k] = min(ds[k..k+7]); arc of 9 = min(m4[k], ds[k+8])
        best = jnp.minimum(m4[0], ds[8])
        for k in range(1, 16):
            best = jnp.maximum(best, jnp.minimum(m4[k], ds[(k + 8) % 16]))
        return best

    bright = arc_scores(diffs)
    dark = arc_scores([-d for d in diffs])
    score = jnp.maximum(bright, dark)
    score = jnp.where(score > threshold, score, 0.0)

    # border invalidation in REAL image coordinates
    y0 = i * TH - 1  # real y of score row 0
    yy = y0 + jax.lax.broadcasted_iota(jnp.int32, (SR, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (SR, W), 1)
    inb = (yy >= 3) & (yy < H - 3) & (xx >= 3) & (xx < W - 3)
    score = jnp.where(inb, score, 0.0)

    # 3×3 strict-maximum NMS on the interior TH rows
    s = score[1:TH + 1, :]
    m = s
    for dy in (-1, 0, 1):
        row = score[1 + dy:TH + 1 + dy, :]
        for dx in (-1, 0, 1):
            m = jnp.maximum(m, pltpu.roll(row, (-dx) % W, 1) if dx else row)
    out_ref[:] = jnp.where((s >= m) & (s > 0), s, 0.0)


@functools.partial(jax.jit, static_argnames=("threshold", "interpret"))
def fast_score_nms(img: jax.Array, threshold: float = 10.0,
                   interpret: bool = False) -> jax.Array:
    """NMS'd FAST-9/16 score map (H, W) — Pallas TPU path.

    Drop-in for ``nms3(fast_score(img, threshold))``.
    """
    H, W = img.shape
    TH = 48
    n = pl.cdiv(H, TH)
    Hp = n * TH
    img_p = jnp.pad(img.astype(jnp.float32),
                    ((HALO, HALO + (Hp - H)), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_fast_nms_kernel, threshold=float(threshold),
                          H=H, W=W, TH=TH),
        out_shape=jax.ShapeDtypeStruct((Hp, W), jnp.float32),
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],  # whole padded img
        out_specs=pl.BlockSpec((TH, W), lambda i: (i, 0),  # BLOCK units
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(img_p)
    return out[:H]
