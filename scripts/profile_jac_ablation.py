"""Ablation: analytic vs autodiff factor Jacobians in the batched scan.

Round-3 measurement discipline (docs/ROADMAP.md): single process, caches
cleared between variants (inner-jit trace caches silently defeat
monkeypatches otherwise), varied inputs (axon result-cache), min-of-sets.

Usage: python scripts/profile_jac_ablation.py [T] [B] [reps]
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

from vins_rgbd_fast_tpu.io import synthetic as syn  # noqa: E402
from vins_rgbd_fast_tpu.pipeline import VinsPipeline  # noqa: E402
from vins_rgbd_fast_tpu.parallel import batched_pipeline as bp  # noqa: E402
from vins_rgbd_fast_tpu.ops import factors  # noqa: E402


def imu_factor_whitened_ad(pre, Pi, Qi, Vi, Bai, Bgi,
                           Pj, Qj, Vj, Baj, Bgj, gravity, sqrt_info):
    zeros = jnp.zeros(factors.IMU_TANGENT, dtype=Pi.dtype)
    args = (pre, Pi, Qi, Vi, Bai, Bgi, Pj, Qj, Vj, Baj, Bgj, gravity,
            sqrt_info)
    r = factors.imu_residual_retracted(zeros, *args)
    J = jax.jacfwd(factors.imu_residual_retracted)(zeros, *args)
    return r, J


def setup(T, B):
    rig = bench._rig()
    seqs = [syn.make_trajectory(14 + 2 * T, rig, seed=100 + b,
                                omega_scale=0.15, acc_scale=0.3)
            for b in range(B)]
    frames = [list(syn.frames(s, rig)) for s in seqs]
    pipes = []
    for b in range(B):
        p = VinsPipeline(bench._cfg(rig, seqs[b]), dtype=jnp.float32,
                         eager_outputs=False, failure_check_interval=10 ** 9)
        p = bench._apply_envelope(p)
        for (t, a, w) in seqs[b].imu:
            p.push_imu(t, a, w)
        for (t, img, depth) in frames[b][:14]:
            p.push_image(t, img)
            p.push_depth(t, depth)
            p.spin_once()
        pipes.append(p)
    jax.block_until_ready(pipes[-1].estimator.state.x.P)
    _ = np.asarray(pipes[-1].estimator.state.x.P)
    batches = [bp.stage_frames(pipes, frames, 14 + k * T, 14 + (k + 1) * T)
               for k in range(2)]
    jax.block_until_ready([b.imgs for b in batches])
    return pipes, batches


def run_variant(name, pipes, batches, reps):
    trk, st = bp.stack_states(pipes)
    runner = bp.BatchedVioRunner(pipes[0].tcfg, pipes[0].cam,
                                 pipes[0].estimator.cfg)
    trk, st, _ = runner.run(trk, st, batches[0])  # compile + warm
    jax.block_until_ready(st.x.P)
    times = []
    for r in range(reps):
        b = batches[(r + 1) % 2]  # vary inputs across calls
        t0 = time.perf_counter()
        trk, st, outs = runner.run(trk, st, b)
        jax.block_until_ready(st.x.P)
        times.append(time.perf_counter() - t0)
    T = batches[0].ts.shape[0]
    B = batches[0].ts.shape[1]
    best = min(times)
    print(f"{name}: min {1000 * best:.1f} ms / {T} frames x {B} seqs "
          f"-> {T * B / best:.1f} fps  (all: "
          + " ".join(f"{1000 * t:.0f}" for t in times) + ")", flush=True)
    return best


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    pipes, batches = setup(T, B)

    run_variant("analytic", pipes, batches, reps)

    # swap to autodiff, clear traces, rebuild everything that jits
    jax.clear_caches()
    factors.projection_factor = factors.projection_factor_ad
    factors.imu_factor_whitened = imu_factor_whitened_ad
    run_variant("autodiff", pipes, batches, reps)

    jax.clear_caches()
    run_variant("autodiff2", pipes, batches, reps)


if __name__ == "__main__":
    main()
