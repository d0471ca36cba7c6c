"""Device-op trace of the single-sequence (latency-mode) per-frame path."""
import os, sys, gzip, json, glob, collections
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

warmup = 16
n_frames = warmup + 8
rig = syn.SyntheticRig(width=640, height=480, fx=460.0, fy=460.0,
                       cx=320.0, cy=240.0, imu_rate=200.0, frame_rate=20.0)
seq = syn.make_trajectory(n_frames, rig, seed=7, omega_scale=0.15,
                          acc_scale=0.3)
cfg = VinsConfig(
    imu=True, static_init=True, image_width=640, image_height=480,
    intrinsics=(rig.fx, rig.fy, rig.cx, rig.cy), distortion=(0, 0, 0, 0),
    ric=tuple(seq.ric.ravel().tolist()), tic=tuple(seq.tic.tolist()),
    max_cnt=130, min_dist=30, num_grid_rows=7, num_grid_cols=8,
    frontend_freq=0.0, freq=0.0, fix_depth=True, depth_max_dist=12.0,
    acc_n=0.1, gyr_n=0.01, acc_w=1e-4, gyr_w=1e-5, max_imu_per_frame=32)
frames = []
for (t, img, depth) in syn.frames(seq, rig):
    jax.block_until_ready(img)
    frames.append((t, img, depth))
pipe = VinsPipeline(cfg, dtype=jnp.float32, eager_outputs=False,
                    failure_check_interval=10 ** 9)
for (t, a, w) in seq.imu:
    pipe.push_imu(t, a, w)
for (t, img, depth) in frames[:warmup]:
    pipe.push_image(t, img)
    pipe.push_depth(t, depth)
    pipe.spin_once()
jax.block_until_ready(pipe.estimator.state.x.P)

tdir = "/tmp/jaxtrace_lat"
os.system(f"rm -rf {tdir}")
with jax.profiler.trace(tdir):
    for (t, img, depth) in frames[warmup:]:
        pipe.push_image(t, img)
        pipe.push_depth(t, depth)
        pipe.spin_once()
    jax.block_until_ready(pipe.estimator.state.x.P)

fn = sorted(glob.glob(tdir + "/plugins/profile/*/*.trace.json.gz"))[-1]
d = json.load(gzip.open(fn))
ev = [e for e in d["traceEvents"]
      if e.get("ph") == "X" and "device_duration_ps" in e.get("args", {})]
src = collections.Counter()
cat = collections.Counter()
top = collections.Counter()
for e in ev:
    dur = int(e["args"]["device_duration_ps"]) / 1e9
    cat[e["args"].get("hlo_category", "?")] += dur
    src[e["args"].get("source", "?")] += dur
    top[e["name"].rstrip("0123456789.")] += dur
print("total device ms (8 frames):", round(sum(cat.values()), 1))
print("\n--- by category ---")
for k, v in cat.most_common(12):
    print(f"{k:30s} {v:8.2f}")
print("\n--- by source (top 25) ---")
for k, v in src.most_common(25):
    print(f"{k[:66]:66s} {v:8.2f}")
