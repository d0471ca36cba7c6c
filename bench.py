"""Benchmark harness: VIO frames/sec/chip at 640×480 RGB-D + ATE vs ground
truth on a synthetic D435i-like sequence.

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "frames/s", "vs_baseline": x}

Baseline: the reference (VINS-RGBD-FAST) is engineered to run real-time at
its frontend input cap — 20-30 Hz on embedded CPUs (config
frontend_freq, BASELINE.md).  vs_baseline = fps / 30.

Modes (BENCH_MODE env):
  batched  (default) — BENCH_BATCH independent sequences, whole per-frame
                       pipeline fused + vmapped + scanned (the
                       framework's throughput-scaling axis); fps =
                       aggregate frames/sec/chip
  latency            — one sequence, per-frame dispatch; fps = 1/latency
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_FPS = 30.0


def main():
    import jax

    # persistent compile cache: first-run compiles of the big fused programs
    # take minutes through the remote-compile tunnel; cache them per repo
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    from vins_rgbd_fast_tpu.config import VinsConfig
    from vins_rgbd_fast_tpu.io import synthetic as syn
    from vins_rgbd_fast_tpu.io import stream as io_stream
    from vins_rgbd_fast_tpu.pipeline import VinsPipeline

    n_frames = int(os.environ.get("BENCH_FRAMES", "80"))
    warmup = 16

    rig = syn.SyntheticRig(width=640, height=480, fx=460.0, fy=460.0,
                           cx=320.0, cy=240.0, imu_rate=200.0, frame_rate=20.0)
    seq = syn.make_trajectory(n_frames, rig, seed=7, omega_scale=0.15,
                              acc_scale=0.3)
    cfg = VinsConfig(
        imu=True, static_init=True,
        image_width=640, image_height=480,
        intrinsics=(rig.fx, rig.fy, rig.cx, rig.cy), distortion=(0, 0, 0, 0),
        ric=tuple(seq.ric.ravel().tolist()), tic=tuple(seq.tic.tolist()),
        max_cnt=130, min_dist=30, num_grid_rows=7, num_grid_cols=8,
        frontend_freq=0.0, freq=0.0,
        fix_depth=True, depth_max_dist=12.0,
        acc_n=0.1, gyr_n=0.01, acc_w=1e-4, gyr_w=1e-5,
        max_imu_per_frame=32,
    )

    # pre-render and KEEP frames on device: in production the sensor feed
    # DMAs into HBM; the remote tunnel's ~50 ms/MB host->device path is not
    # what we are measuring
    frames = []
    for (t, img, depth) in syn.frames(seq, rig):
        jax.block_until_ready(img)
        frames.append((t, img, depth))

    pipe = VinsPipeline(cfg, dtype=jnp.float32, eager_outputs=False,
                        failure_check_interval=10 ** 9)
    for (t, a, w) in seq.imu:
        pipe.push_imu(t, a, w)

    # warm-up: compile all programs + establish the (lazy, potentially very
    # slow first-use) device->host readback path before timing
    for (t, img, depth) in frames[:warmup]:
        pipe.push_image(t, img)
        pipe.push_depth(t, depth)
        pipe.spin_once()
    jax.block_until_ready(pipe.estimator.state.x.P)
    _ = np.asarray(pipe.estimator.state.x.P)  # readback handshake

    t0 = time.perf_counter()
    for (t, img, depth) in frames[warmup:]:
        pipe.push_image(t, img)
        pipe.push_depth(t, depth)
        pipe.spin_once()
    jax.block_until_ready(pipe.estimator.state.x.P)
    elapsed = time.perf_counter() - t0
    n_timed = len(frames) - warmup
    fps = n_timed / elapsed if elapsed > 0 else 0.0

    traj = pipe.estimator.trajectory
    ate = float("nan")
    if len(traj) >= 5:
        ate = io_stream.ate_rmse(
            [r["t"] for r in traj], [r["P"] for r in traj],
            seq.times, seq.P, align=False,
        )

    result = {
        "metric": "vio_fps_per_chip_640x480_rgbd",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "backend": jax.default_backend(),
        "ate_m": round(ate, 4) if np.isfinite(ate) else None,
        "frames": len(traj),
    }
    print(json.dumps(result))


def main_batched():
    """Throughput mode: B independent synthetic sequences, the WHOLE
    per-frame pipeline (tracker + depth + backend) fused, vmapped over B
    and lax.scan-ned over frames — one dispatch for the entire timed run.

    Per-sequence warmup runs the normal host pipeline until steady state;
    the scanned runner then takes over with zero host work per frame."""
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    from vins_rgbd_fast_tpu.config import VinsConfig
    from vins_rgbd_fast_tpu.io import synthetic as syn
    from vins_rgbd_fast_tpu.io import stream as io_stream
    from vins_rgbd_fast_tpu.pipeline import VinsPipeline
    from vins_rgbd_fast_tpu.parallel import batched_pipeline as bp

    B = int(os.environ.get("BENCH_BATCH", "8"))
    n_frames = int(os.environ.get("BENCH_FRAMES", "64"))
    warmup = 14  # fill window + init + settle

    rig = syn.SyntheticRig(width=640, height=480, fx=460.0, fy=460.0,
                           cx=320.0, cy=240.0, imu_rate=200.0, frame_rate=20.0)
    seqs = [syn.make_trajectory(n_frames, rig, seed=100 + b, omega_scale=0.15,
                                acc_scale=0.3) for b in range(B)]
    cfgs = [VinsConfig(
        imu=True, static_init=True,
        image_width=640, image_height=480,
        intrinsics=(rig.fx, rig.fy, rig.cx, rig.cy), distortion=(0, 0, 0, 0),
        ric=tuple(s.ric.ravel().tolist()), tic=tuple(s.tic.tolist()),
        max_cnt=130, min_dist=30, num_grid_rows=7, num_grid_cols=8,
        frontend_freq=0.0, freq=0.0, fix_depth=True, depth_max_dist=12.0,
        acc_n=0.1, gyr_n=0.01, acc_w=1e-4, gyr_w=1e-5, max_imu_per_frame=32,
    ) for s in seqs]

    # pre-render device-resident frames per sequence
    frames = []
    for s in seqs:
        fr = []
        for (t, img, depth) in syn.frames(s, rig):
            fr.append((t, img, depth))
        frames.append(fr)

    # per-sequence warmup through the normal pipeline
    pipes = []
    for b in range(B):
        p = VinsPipeline(cfgs[b], dtype=jnp.float32, eager_outputs=False,
                         failure_check_interval=10 ** 9)
        for (t, a, w) in seqs[b].imu:
            p.push_imu(t, a, w)
        for (t, img, depth) in frames[b][:warmup]:
            p.push_image(t, img)
            p.push_depth(t, depth)
            p.spin_once()
        pipes.append(p)
    jax.block_until_ready(pipes[-1].estimator.state.x.P)
    _ = np.asarray(pipes[-1].estimator.state.x.P)  # readback handshake

    trk_states, est_states = bp.stack_states(pipes)

    # tuning knobs for throughput/accuracy sweeps (0 = keep config value).
    # Batched default: 4 scored LM candidates — the delayed-accept loop
    # converges like Ceres' early-terminated 8-iteration budget on the
    # bench sequences (ATE identical at 4 vs 8 in the sweep); the ATE
    # printed below keeps this honest.
    import dataclasses as dc
    tcfg = pipes[0].tcfg
    ecfg = pipes[0].estimator.cfg
    si = int(os.environ.get("BENCH_SOLVER_ITERS", "4"))
    if si:
        ecfg = dc.replace(ecfg, max_iters=si)
    lkf = int(os.environ.get("BENCH_LK_ITERS", "0"))
    if lkf:
        tcfg = dc.replace(tcfg, lk_max_iters=lkf)
    lkc = int(os.environ.get("BENCH_LK_COARSE", "0"))
    if lkc:
        tcfg = dc.replace(tcfg, lk_coarse_iters=lkc)
    runner = bp.BatchedVioRunner(tcfg, pipes[0].cam, ecfg)

    # two equal-length staged segments: the first compiles+warms the scan
    # program, the second (different data, same shapes) is the timed run
    T = (n_frames - warmup) // 2
    batch_warm = bp.stage_frames(pipes, frames, warmup, warmup + T)
    batch_timed = bp.stage_frames(pipes, frames, warmup + T, warmup + 2 * T)
    jax.block_until_ready((batch_warm.imgs, batch_timed.imgs))

    trk_states, est_states, _ = runner.run(trk_states, est_states, batch_warm)
    jax.block_until_ready(est_states.x.P)

    t0 = time.perf_counter()
    trk_states, est_states, outs = runner.run(trk_states, est_states, batch_timed)
    jax.block_until_ready(est_states.x.P)
    elapsed = time.perf_counter() - t0
    n_timed = T * B
    fps = n_timed / elapsed if elapsed > 0 else 0.0

    # accuracy: ATE of sequence 0 over the timed span
    host = jax.device_get(outs)
    ts0 = [frames[0][k][0] for k in range(warmup + T, warmup + 2 * T)]
    P0 = [np.asarray(host.P[i, 0]) for i in range(T)]
    ate = io_stream.ate_rmse(ts0, P0, seqs[0].times, seqs[0].P, align=False)

    result = {
        "metric": "vio_fps_per_chip_640x480_rgbd_batched",
        "value": round(fps, 2),
        "unit": "frames/s (aggregate, %d sequences)" % B,
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "backend": jax.default_backend(),
        "ate_m": round(float(ate), 4) if np.isfinite(ate) else None,
        "frames": n_timed,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    if os.environ.get("BENCH_MODE", "batched") == "batched":
        main_batched()
    else:
        main()
