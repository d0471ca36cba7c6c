"""Profile the fused batched scan runner: ms/step at several scan lengths,
vs an eagerly-chained single-step jit of the same body."""
import os, sys, time
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from vins_rgbd_fast_tpu.config import VinsConfig
from vins_rgbd_fast_tpu.io import synthetic as syn
from vins_rgbd_fast_tpu.pipeline import VinsPipeline
from vins_rgbd_fast_tpu.parallel import batched_pipeline as bp

B = int(os.environ.get("B", "8"))
warmup = 14
n_frames = warmup + 20

rig = syn.SyntheticRig(width=640, height=480, fx=460.0, fy=460.0,
                       cx=320.0, cy=240.0, imu_rate=200.0, frame_rate=20.0)
seqs = [syn.make_trajectory(n_frames, rig, seed=100 + b, omega_scale=0.15,
                            acc_scale=0.3) for b in range(B)]
cfgs = [VinsConfig(
    imu=True, static_init=True, image_width=640, image_height=480,
    intrinsics=(rig.fx, rig.fy, rig.cx, rig.cy), distortion=(0, 0, 0, 0),
    ric=tuple(s.ric.ravel().tolist()), tic=tuple(s.tic.tolist()),
    max_cnt=130, min_dist=30, num_grid_rows=7, num_grid_cols=8,
    frontend_freq=0.0, freq=0.0, fix_depth=True, depth_max_dist=12.0,
    acc_n=0.1, gyr_n=0.01, acc_w=1e-4, gyr_w=1e-5, max_imu_per_frame=32,
) for s in seqs]
frames = [list(syn.frames(s, rig)) for s in seqs]
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

trk, st = bp.stack_states(pipes)
runner = bp.BatchedVioRunner(pipes[0].tcfg, pipes[0].cam,
                             pipes[0].estimator.cfg)

MODES = os.environ.get("MODES", "scan,chained").split(",")
for T in (2, 8):
    b1 = bp.stage_frames(pipes, frames, warmup, warmup + T)
    b2 = bp.stage_frames(pipes, frames, warmup + T, warmup + 2 * T)
    jax.block_until_ready((b1.imgs, b2.imgs))
    for mode in MODES:
        fn = runner.run if mode == "scan" else runner.run_chained
        t_, s_, o = fn(trk, st, b1)
        jax.block_until_ready(s_.x.P)
        t0 = time.perf_counter()
        t_, s_, o = fn(trk, st, b2)
        jax.block_until_ready(s_.x.P)
        dt = time.perf_counter() - t0
        print(f"{mode} T={T}: total {dt*1e3:.1f} ms, {dt/T*1e3:.2f} ms/step, "
              f"{T*B/dt:.1f} fps aggregate")
