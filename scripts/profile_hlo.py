"""Compile the batched one-step program and histogram its optimized HLO ops
(diagnosing an op-count floor: per-op overhead × thousands of ops)."""
import os, sys, re, collections
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
from vins_rgbd_fast_tpu.backend import estimator as est
from vins_rgbd_fast_tpu.frontend import feature_tracker as ft

B = 8
warmup = 14
rig = syn.SyntheticRig(width=640, height=480, fx=460.0, fy=460.0,
                       cx=320.0, cy=240.0, imu_rate=200.0, frame_rate=20.0)
seq = syn.make_trajectory(warmup + 2, rig, seed=100, omega_scale=0.15,
                          acc_scale=0.3)
cfg = VinsConfig(
    imu=True, static_init=True, image_width=640, image_height=480,
    intrinsics=(rig.fx, rig.fy, rig.cx, rig.cy), distortion=(0, 0, 0, 0),
    ric=tuple(seq.ric.ravel().tolist()), tic=tuple(seq.tic.tolist()),
    max_cnt=130, min_dist=30, num_grid_rows=7, num_grid_cols=8,
    frontend_freq=0.0, freq=0.0, fix_depth=True, depth_max_dist=12.0,
    acc_n=0.1, gyr_n=0.01, acc_w=1e-4, gyr_w=1e-5, max_imu_per_frame=32)
p = VinsPipeline(cfg, dtype=jnp.float32, eager_outputs=False,
                 failure_check_interval=10 ** 9)
for (t, a, w) in seq.imu:
    p.push_imu(t, a, w)
frames = list(syn.frames(seq, rig))
for (t, img, depth) in frames[:warmup]:
    p.push_image(t, img)
    p.push_depth(t, depth)
    p.spin_once()

trk0, st0 = bp.stack_states([p] * B)
tcfg = dataclasses.replace(p.tcfg, lk_sampler="matmul")
runner = bp.BatchedVioRunner(tcfg, p.cam, p.estimator.cfg)
img = jnp.broadcast_to(jnp.asarray(frames[warmup][1]), (B, 480, 640))
dep = jnp.broadcast_to(jnp.asarray(frames[warmup][2]), (B, 480, 640))
ts = jnp.full((B,), float(frames[warmup][0]), jnp.float32)
iv = p.estimator._collect_interval(frames[warmup - 1][0], frames[warmup][0])
idts = jnp.broadcast_to(iv.dts, (B,) + iv.dts.shape)
iacc = jnp.broadcast_to(iv.acc, (B,) + iv.acc.shape)
igyr = jnp.broadcast_to(iv.gyr, (B,) + iv.gyr.shape)
keys = jax.random.split(jax.random.PRNGKey(17), B)
carry = (trk0, st0, keys, jnp.asarray(0, jnp.int32))

low = runner._one_step.lower(carry, img, dep, ts, idts, iacc, igyr)
comp = low.compile()
txt = comp.as_text()
ca = comp.cost_analysis()
print("cost_analysis flops=%.3g bytes=%.3g" % (
    ca.get("flops", -1), ca.get("bytes accessed", -1)))
ops = collections.Counter()
fusion_sizes = []
for line in txt.splitlines():
    m = re.match(r"\s*(?:ROOT )?%?[\w.\-]+ = \S+ ([a-z\-]+)[(.]", line)
    if m:
        ops[m.group(1)] += 1
print("total instructions:", sum(ops.values()))
for op, n in ops.most_common(25):
    print(f"  {op:28s} {n}")

# per-subprogram instruction counts
def count_ops(lowered):
    txt2 = lowered.compile().as_text()
    n = 0
    for line in txt2.splitlines():
        if re.match(r"\s*(?:ROOT )?%?[\w.\-]+ = ", line):
            n += 1
    return n

ecfg = p.estimator.cfg
iv_b = est.ImuInterval(dts=idts, acc=iacc, gyr=igyr)
_, tout = jax.jit(lambda s, im, tt: jax.vmap(
    lambda a, b, c, d, e: ft.track_frame(tcfg, p.cam, a, b, c, d, e)
)(s, im, tt, jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (B, 1, 1)), keys)
)(trk0, img, ts)
feats = tout.features
f_tr = jax.jit(lambda s, im, tt: jax.vmap(
    lambda a, b, c, d, e: ft.track_frame(tcfg, p.cam, a, b, c, d, e)
)(s, im, tt, jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (B, 1, 1)), keys))
print("track_frame ops:", count_ops(f_tr.lower(trk0, img, ts)))
f_be = jax.jit(lambda s, f, i, k: jax.vmap(
    lambda a, b, c, d: est.vio_step(ecfg, a, b, c, d))(s, f, i, k))
print("vio_step ops:", count_ops(f_be.lower(st0, feats, iv_b, keys)))
