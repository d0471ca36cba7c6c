"""Ablate the batched frame_step to find what costs 150 ms/step."""
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
from vins_rgbd_fast_tpu.backend import estimator as est
from vins_rgbd_fast_tpu.backend.state import WINDOW_SIZE
from vins_rgbd_fast_tpu.frontend import feature_tracker as ft

B = 8
warmup = 14
n_frames = warmup + 8

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

trk0, st0 = bp.stack_states(pipes)
tcfg = pipes[0].tcfg
cam = pipes[0].cam
ecfg = pipes[0].estimator.cfg
batch = bp.stage_frames(pipes, frames, warmup, warmup + 8)
jax.block_until_ready(batch.imgs)
keys = jax.random.split(jax.random.PRNGKey(3), B)

REPS = 8


def timeit(name, fn, args_list):
    out = fn(*args_list[0]); jax.block_until_ready(out)
    out = fn(*args_list[1 % len(args_list)]); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for k in range(REPS):
        out = fn(*args_list[k % len(args_list)])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:34s} {dt:8.2f} ms")


# 1. gyro relR alone
f_rel = jax.jit(lambda idts, igyr, bg, qic: jax.vmap(bp.gyro_relative_R)(
    idts, igyr, bg, qic))
timeit("vmap gyro_relative_R", f_rel,
       [(batch.imu_dts[k], batch.imu_gyr[k], st0.x.Bg[:, WINDOW_SIZE],
         st0.x.qic) for k in range(8)])

# 2. tracker alone (same states/images as frame_step would see)
f_trk = jax.jit(lambda s, im, tt, r, k: jax.vmap(
    lambda a, b, c, d, e: ft.track_frame(tcfg, cam, a, b, c, d, e)
)(s, im, tt, r, k))
eyeB = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (B, 1, 1))
timeit("vmap track_frame (real states)", f_trk,
       [(trk0, batch.imgs[k], batch.ts[k], eyeB, keys) for k in range(8)])

# 3. depth lookup
_, tout = f_trk(trk0, batch.imgs[0], batch.ts[0], eyeB, keys)
feats0 = tout.features
f_dep = jax.jit(lambda d, uv, v: jax.vmap(ft.lookup_depth)(d, uv, v))
timeit("vmap lookup_depth", f_dep,
       [(batch.depths[k], feats0.uv, feats0.ids >= 0) for k in range(8)])

# 4. backend alone (real states)
f_be = jax.jit(lambda s, f, i, k: jax.vmap(
    lambda a, b, c, d: est.vio_step(ecfg, a, b, c, d))(s, f, i, k))
iv = est.ImuInterval(dts=batch.imu_dts[0], acc=batch.imu_acc[0],
                     gyr=batch.imu_gyr[0])
timeit("vmap vio_step (real states)", f_be,
       [(st0, feats0._replace(pts=feats0.pts + k * 1e-4), iv, keys)
        for k in range(8)])

# 5. full one_step
runner = bp.BatchedVioRunner(tcfg, cam, ecfg)
carry0 = (trk0, st0, keys, jnp.asarray(0, jnp.int32))
f_full = runner._one_step
timeit("one_step (full fused)", f_full,
       [(carry0, batch.imgs[k], batch.depths[k], batch.ts[k],
         batch.imu_dts[k], batch.imu_acc[k], batch.imu_gyr[k])
        for k in range(8)])
