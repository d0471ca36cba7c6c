"""Split the fused latency frame time into device-program time vs host
overhead: (1) back-to-back redispatch of the compiled fused step with fixed
inputs, (2) the real spin_once loop, (3) optional cProfile of the loop.

Usage: python scripts/profile_latency.py [--cprofile] [--trace]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    from vins_rgbd_fast_tpu.io import synthetic as syn
    from vins_rgbd_fast_tpu.pipeline import VinsPipeline

    n_frames = 80
    warmup = 16
    rig = bench._rig()
    seq = syn.make_trajectory(n_frames, rig, seed=7, omega_scale=0.15,
                              acc_scale=0.3)
    cfg = bench._cfg(rig, seq)
    frames = []
    for (t, img, depth) in syn.frames(seq, rig):
        jax.block_until_ready(img)
        frames.append((t, img, depth))

    pipe = VinsPipeline(cfg, dtype=jnp.float32, eager_outputs=False,
                        failure_check_interval=10 ** 9, fused_steady_state=True)
    pipe = bench._apply_envelope(pipe)
    for (t, a, w) in seq.imu:
        pipe.push_imu(t, a, w)
    for (t, img, depth) in frames[:warmup]:
        pipe.push_image(t, img)
        pipe.push_depth(t, depth)
        pipe.spin_once()
    jax.block_until_ready(pipe.estimator.state.x.P)
    _ = np.asarray(pipe.estimator.state.x.P)

    # --- (1) pure device redispatch of the fused program -----------------
    est_ = pipe.estimator
    if pipe._fused_fn is None:
        pipe._build_fused()
    fn = pipe._fused_fn
    img, depth = frames[warmup][1], frames[warmup][2]
    dts, acc, gyr = est_._collect_interval_np(
        est_.prev_time, frames[warmup][0] + est_._td_cache)
    maxi = est_.cfg.max_imu
    packed = np.zeros(1 + maxi + 6 * (maxi + 1), np.float32)
    packed[0] = frames[warmup][0]
    packed[1:1 + maxi] = dts
    packed[1 + maxi:1 + maxi + 3 * (maxi + 1)] = acc.ravel()
    packed[1 + maxi + 3 * (maxi + 1):] = gyr.ravel()
    packed_dev = jnp.asarray(packed)
    bk, sc = pipe._fused_base_key, pipe._fused_step_ctr
    trk, st = pipe.tracker_state, est_.state
    # warm
    o = fn(trk, st, img, depth, packed_dev, bk, sc)
    jax.block_until_ready(o[1].x.P)
    N = 50
    t0 = time.perf_counter()
    trk2, st2 = trk, st
    for _ in range(N):
        trk2, st2, so, sc = fn(trk2, st2, img, depth, packed_dev, bk, sc)
    jax.block_until_ready(st2.x.P)
    dt_chain = (time.perf_counter() - t0) / N * 1000
    # same-state redispatch (no carry dependency — measures queue throughput)
    t0 = time.perf_counter()
    for _ in range(N):
        o = fn(trk, st, img, depth, packed_dev, bk, sc)
    jax.block_until_ready(o[1].x.P)
    dt_indep = (time.perf_counter() - t0) / N * 1000
    print(f"fused program, carried chain : {dt_chain:.2f} ms/frame")
    print(f"fused program, independent   : {dt_indep:.2f} ms/frame")

    # --- (2) real spin_once loop -----------------------------------------
    def timed_loop():
        t0 = time.perf_counter()
        for (t, img, depth) in frames[warmup:]:
            pipe.push_image(t, img)
            pipe.push_depth(t, depth)
            pipe.spin_once()
        jax.block_until_ready(pipe.estimator.state.x.P)
        return (time.perf_counter() - t0) / (len(frames) - warmup) * 1000

    dt_loop = timed_loop()
    print(f"spin_once loop               : {dt_loop:.2f} ms/frame")
    print(f"  -> host overhead ≈ {dt_loop - dt_chain:.2f} ms/frame")

    if "--cprofile" in sys.argv:
        import cProfile
        import pstats

        # refill stream
        for (t, a, w) in seq.imu:
            pipe.push_imu(t, a, w)
        for (t, img, depth) in frames[warmup:]:
            pipe.push_image(t, img)
            pipe.push_depth(t, depth)
        pr = cProfile.Profile()
        pr.enable()
        while True:
            if pipe.spin_once() is None:
                break
        pr.disable()
        pstats.Stats(pr).sort_stats("cumulative").print_stats(25)

    if "--trace" in sys.argv:
        with jax.profiler.trace("/tmp/jax_trace_latency"):
            for (t, img, depth) in frames[warmup:]:
                pipe.push_image(t, img)
                pipe.push_depth(t, depth)
                pipe.spin_once()
            jax.block_until_ready(pipe.estimator.state.x.P)
        print("trace written to /tmp/jax_trace_latency")


if __name__ == "__main__":
    main()
