"""Decompose vio_step's HLO op count by sub-function (B=8 vmapped)."""
import os, sys, re
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
from vins_rgbd_fast_tpu.backend import feature_table as ftab
from vins_rgbd_fast_tpu.ops import solver as slv
from vins_rgbd_fast_tpu.ops import marginalization as marg
from vins_rgbd_fast_tpu.ops import imu_preintegration as imupre

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

_, st0 = bp.stack_states([p] * B)
ecfg = p.estimator.cfg
g = ecfg.gravity(jnp.float32)


def count_ops(lowered):
    txt = lowered.compile().as_text()
    return sum(1 for line in txt.splitlines()
               if re.match(r"\s*(?:ROOT )?%?[\w.\-]+ = ", line))


def rep(name, fn, *args):
    try:
        print(f"{name:34s} {count_ops(jax.jit(fn).lower(*args))}")
    except Exception as e:
        print(f"{name:34s} ERR {type(e).__name__}: {e}")
    sys.stdout.flush()


vb = lambda f: jax.vmap(f)
st = st0

rep("preints(all fields)", lambda s: jax.tree.map(
    lambda a: a.sum(), vb(lambda x: est._make_preints(ecfg, x))(s)), st)
rep("preints+sqrtinfo", lambda s: vb(
    lambda x: slv._imu_sqrt_infos(est._make_preints(ecfg, x)))(s).sum(), st)
rep("triangulate", lambda s: jax.tree.map(lambda a: a.sum(), vb(
    lambda x: ftab.triangulate_with_depth(
        x.table, x.x.P, x.x.Q, x.x.tic, x.x.qic,
        ecfg.depth_min_dist, ecfg.depth_max_dist))(s)), st)
rep("visual_data", lambda s: jax.tree.map(lambda a: a.sum(), vb(
    lambda x: est._visual_data(ecfg, x.table))(s)), st)


def one_assembly(x):
    vis = est._visual_data(ecfg, x.table)
    imud = est._make_preints(ecfg, x)
    s_, c = slv.normal_equations_structured(ecfg.solver, x.x, vis, imud,
                                            x.prior, g)
    return s_.Hpp.sum() + c


rep("assembly(+preints)", lambda s: vb(one_assembly)(s).sum(), st)


def full_solve(x):
    vis = est._visual_data(ecfg, x.table)
    imud = est._make_preints(ecfg, x)
    return slv.solve(ecfg.solver, x.x, vis, imud, x.prior, g).cost


rep("solve(8 iters,+preints)", lambda s: vb(full_solve)(s).sum(), st)


def m_old(x):
    vis = est._visual_data(ecfg, x.table)
    imud = est._make_preints(ecfg, x)
    return marg.marginalize_old(ecfg.solver, x.x, vis, imud, x.prior, g).r0


rep("marginalize_old(+preints)", lambda s: vb(m_old)(s).sum(), st)
rep("marginalize_new", lambda s: vb(
    lambda x: marg.marginalize_new(ecfg.solver, x.x, x.prior).r0)(s).sum(), st)
rep("moving_consistency", lambda s: jax.tree.map(lambda a: a.sum(), vb(
    lambda x: est._moving_consistency(ecfg, x.x, x.table))(s)), st)
rep("slide(old)", lambda s: jax.tree.map(lambda a: a.sum(), vb(
    lambda x: est._slide(ecfg, x, jnp.asarray(True)))(s)), st)
rep("window_points", lambda s: jax.tree.map(lambda a: a.sum(), vb(
    lambda x: est._window_points(x.x, x.table))(s)), st)
