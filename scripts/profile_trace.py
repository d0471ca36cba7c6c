"""Device-op-level profile of the batched scanned runner (jax.profiler
trace -> aggregate HLO op durations by name/source)."""
import os, sys, time, gzip, json, glob, collections
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np
import dataclasses

from vins_rgbd_fast_tpu.config import VinsConfig
from vins_rgbd_fast_tpu.io import synthetic as syn
from vins_rgbd_fast_tpu.pipeline import VinsPipeline
from vins_rgbd_fast_tpu.parallel import batched_pipeline as bp

B = int(__import__('os').environ.get('TRACE_B', '8'))
warmup = 14
T = 8
n_frames = warmup + T

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
runner = bp.BatchedVioRunner(pipes[0].tcfg, pipes[0].cam,
                             pipes[0].estimator.cfg)
batch = bp.stage_frames(pipes, frames, warmup, warmup + T)
jax.block_until_ready(batch.imgs)

# warm
trk, st, outs = runner.run(trk0, st0, batch)
jax.block_until_ready(st.x.P)

tdir = "/tmp/jaxtrace_vio"
os.system(f"rm -rf {tdir}")
b2 = batch._replace(imgs=batch.imgs + 1e-3)
jax.block_until_ready(b2.imgs)
with jax.profiler.trace(tdir):
    trk, st, outs = runner.run(trk0, st0, b2)
    jax.block_until_ready(st.x.P)

fn = sorted(glob.glob(tdir + "/plugins/profile/*/*.trace.json.gz"))[-1]
d = json.load(gzip.open(fn))
ev = [e for e in d["traceEvents"]
      if e.get("ph") == "X" and "device_duration_ps" in e.get("args", {})]
tot = collections.Counter()
cat = collections.Counter()
src = collections.Counter()
n = collections.Counter()
for e in ev:
    dur = int(e["args"]["device_duration_ps"]) / 1e9  # ms
    name = e["name"]
    # strip trailing .N suffixes for grouping
    base = name.rstrip("0123456789.")
    tot[base] += dur
    n[base] += 1
    cat[e["args"].get("hlo_category", "?")] += dur
    s = e["args"].get("source", "?")
    src[s] += dur
print("total device ms:", round(sum(tot.values()), 2), " events:", len(ev))
print("\n--- by HLO category ---")
for k, v in cat.most_common(18):
    print(f"{k:34s} {v:9.2f} ms")
print("\n--- by op group (top 30) ---")
for k, v in tot.most_common(30):
    print(f"{k[:56]:56s} {v:8.2f} ms  x{n[k]}")
print("\n--- by source line (top 25) ---")
for k, v in src.most_common(25):
    print(f"{k[:66]:66s} {v:8.2f} ms")
