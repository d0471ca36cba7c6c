"""On-device validation + timing of the fused Pallas LK v3 level kernel.

1. correctness: pallas3 vs XLA matmul path, plain and vmapped (B=8)
2. perf: min-of-N pyramidal_lk timing at production shapes, one process

Usage: python scripts/profile_lk3.py [N_pts] [B] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

bench._setup_jax()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vins_rgbd_fast_tpu.ops import image as image_ops  # noqa: E402
from vins_rgbd_fast_tpu.ops import lk as lk_ops  # noqa: E402


def make_pair(H, W, shift, seed):
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.arange(H, dtype=np.float64),
                         np.arange(W, dtype=np.float64), indexing="ij")
    img = 120 + 45 * np.sin(xx / 7.0) * np.cos(yy / 9.0)
    for _ in range(6):
        fx, fy = rng.uniform(0.05, 0.6, 2)
        ph = rng.uniform(0, 2 * np.pi)
        img = img + rng.uniform(8, 20) * np.sin(fx * xx + fy * yy + ph)
    img2 = 120 + 45 * np.sin((xx - shift[0]) / 7.0) * np.cos(
        (yy - shift[1]) / 9.0)
    rng = np.random.default_rng(seed)
    for _ in range(6):
        fx, fy = rng.uniform(0.05, 0.6, 2)
        ph = rng.uniform(0, 2 * np.pi)
        img2 = img2 + rng.uniform(8, 20) * np.sin(
            fx * (xx - shift[0]) + fy * (yy - shift[1]) + ph)
    return img.astype(np.float32), img2.astype(np.float32)


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    H, W = 480, 640
    rng = np.random.default_rng(0)

    def batch(seed_off):
        i0s, i1s, ptss = [], [], []
        for b in range(B):
            i0, i1 = make_pair(H, W, (2.0 + 0.3 * b, -1.5), seed=b + seed_off)
            pts = np.stack([rng.uniform(30, W - 30, N),
                            rng.uniform(30, H - 30, N)], -1).astype(np.float32)
            i0s.append(i0); i1s.append(i1); ptss.append(pts)
        return (jnp.asarray(np.stack(i0s)), jnp.asarray(np.stack(i1s)),
                jnp.asarray(np.stack(ptss)))

    def track(engine):
        @jax.jit
        def f(i0, i1, pts):
            def one(a, b, p):
                p0 = tuple(image_ops.build_pyramid(a, 2))
                p1 = tuple(image_ops.build_pyramid(b, 2))
                return lk_ops.pyramidal_lk(
                    p0, p1, p, p + 2.0, jnp.ones(p.shape[0], bool),
                    max_iters=12, coarse_iters=6, sampler="matmul",
                    engine=engine)
            return jax.vmap(one)(i0, i1, pts)
        return f

    d0 = batch(0)
    d1 = batch(100)

    # correctness on-device
    ra = track("xla")(*d0)
    jax.block_until_ready(ra.pts)
    rb = track("pallas3")(*d0)
    jax.block_until_ready(rb.pts)
    ok = np.asarray(ra.status)
    same_status = bool((ra.status == rb.status).all())
    dmax = float(np.abs(np.asarray(ra.pts) - np.asarray(rb.pts))[ok].max())
    print(f"on-device equivalence: status_equal={same_status} "
          f"max_pt_diff={dmax:.2e} tracked={ok.mean():.2f}", flush=True)

    for engine in ("xla", "pallas3", "xla"):
        f = track(engine)
        f(*d0).pts.block_until_ready()  # compile+warm
        ts = []
        for r in range(reps):
            d = (d0, d1)[r % 2]
            t0 = time.perf_counter()
            jax.block_until_ready(f(*d).pts)
            ts.append(time.perf_counter() - t0)
        print(f"{engine}: min {1000 * min(ts):.2f} ms  (all: "
              + " ".join(f"{1000 * t:.1f}" for t in ts) + ")", flush=True)


if __name__ == "__main__":
    main()
