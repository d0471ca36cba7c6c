"""Full fused batched-step ablation: LK engine xla vs pallas3.

Same discipline as profile_jac_ablation.py: one process, min-of-sets,
varied inputs, jax.clear_caches() between variants.
"""

import dataclasses as dc
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
from vins_rgbd_fast_tpu.io import stream as io_stream  # noqa: E402
from vins_rgbd_fast_tpu.pipeline import VinsPipeline  # noqa: E402
from vins_rgbd_fast_tpu.parallel import batched_pipeline as bp  # noqa: E402


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
    return pipes, batches, seqs, frames


def run_variant(name, engine, pipes, batches, seqs, frames, reps, T):
    tcfg = dc.replace(pipes[0].tcfg, lk_engine=engine)
    trk, st = bp.stack_states(pipes)
    runner = bp.BatchedVioRunner(tcfg, pipes[0].cam, pipes[0].estimator.cfg)
    trk, st, _ = runner.run(trk, st, batches[0])
    jax.block_until_ready(st.x.P)
    times = []
    outs = None
    for r in range(reps):
        b = batches[(r + 1) % 2]
        t0 = time.perf_counter()
        trk, st, outs = runner.run(trk, st, b)
        jax.block_until_ready(st.x.P)
        times.append(time.perf_counter() - t0)
    B = batches[0].ts.shape[1]
    best = min(times)
    # sanity: ATE of seq 0 on the last segment
    host = jax.device_get(outs)
    ts = [frames[0][k][0] for k in range(14 + T, 14 + 2 * T)]
    P0 = [np.asarray(host.P[i, 0]) for i in range(T)]
    ate = io_stream.ate_rmse(ts, P0, seqs[0].times, seqs[0].P, align=False)
    print(f"{name}: min {1000 * best:.1f} ms / {T}x{B} "
          f"-> {T * B / best:.1f} fps  ate0={ate:.4f}  (all: "
          + " ".join(f"{1000 * t:.0f}" for t in times) + ")", flush=True)


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    pipes, batches, seqs, frames = setup(T, B)
    for name, eng in (("xla", "xla"), ("pallas3", "pallas3"),
                      ("xla2", "xla")):
        run_variant(name, eng, pipes, batches, seqs, frames, reps, T)
        jax.clear_caches()


if __name__ == "__main__":
    main()
