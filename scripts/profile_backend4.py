"""Fine-grained batched-backend breakdown (cache-busted inputs)."""
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
from vins_rgbd_fast_tpu.ops import solver as slv
from vins_rgbd_fast_tpu.ops import imu_preintegration as imupre
from vins_rgbd_fast_tpu.ops import lk as lk_ops
from vins_rgbd_fast_tpu.ops import image as image_ops
from vins_rgbd_fast_tpu.frontend import feature_tracker as ft

SEED = int.from_bytes(os.urandom(4), "little")
rng = np.random.default_rng(SEED)
print("seed", SEED)

B = 8
warmup = 14
rig = syn.SyntheticRig(width=640, height=480, fx=460.0, fy=460.0,
                       cx=320.0, cy=240.0, imu_rate=200.0, frame_rate=20.0)
seqs = [syn.make_trajectory(warmup + 2, rig, seed=100 + b, omega_scale=0.15,
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
ecfg = pipes[0].estimator.cfg
g = ecfg.gravity(jnp.float32)
REPS = 10


def timeit(name, fn, make_args):
    out = fn(*make_args()); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*make_args())
    jax.block_until_ready(out)
    print(f"{name:40s} {(time.perf_counter()-t0)/REPS*1e3:8.2f} ms")


def perturbB(st):
    d = jnp.asarray(rng.normal(0, 1e-5, (B, 1, 3)).astype(np.float32))
    return st._replace(x=st.x._replace(P=st.x.P + d),
                       imu_acc=st.imu_acc + float(rng.normal(0, 1e-7)))


# 1. preintegration (vmapped scan over raw buffers)
f_pre = jax.jit(jax.vmap(lambda st: est._make_preints(ecfg, st).pre.delta_p))
timeit("B=8 make_preints (10 intervals)", f_pre, lambda: (perturbB(st0),))

# 2. sqrt infos (15x15 chol + triangular solve x10)
f_si = jax.jit(jax.vmap(
    lambda st: slv._imu_sqrt_infos(est._make_preints(ecfg, st))))
timeit("B=8 preints + sqrt_infos", f_si, lambda: (perturbB(st0),))

# 3. one normal-equations assembly
def f_ne_(st):
    vis = jax.vmap(lambda t: est._visual_data(ecfg, t))(st.table)
    def one(x, v, pr):
        s, c = slv.normal_equations_structured(ecfg.solver, x, v, None, pr, g)
        return s.Hpp
    return jax.vmap(one)(st.x, vis, st.prior)
f_ne = jax.jit(f_ne_)
timeit("B=8 normal_equations (no imu)", f_ne, lambda: (perturbB(st0),))

# 4. residual-only cost
def f_tc_(st):
    vis = jax.vmap(lambda t: est._visual_data(ecfg, t))(st.table)
    def one(x, v, pr):
        return slv.total_cost(ecfg.solver, x, v.inv_depth, v, None, pr, g)
    return jax.vmap(one)(st.x, vis, st.prior)
f_tc = jax.jit(f_tc_)
timeit("B=8 total_cost (no imu)", f_tc, lambda: (perturbB(st0),))

# 5. batched Schur solve of a damped system
NXP = slv.NX
Hs = jnp.asarray(rng.normal(0, 1, (B, NXP, NXP)).astype(np.float32))
Hs = jnp.einsum("bij,bkj->bik", Hs, Hs) + 10.0 * jnp.eye(NXP)[None]
gs = jnp.asarray(rng.normal(0, 1, (B, NXP)).astype(np.float32))
f_ch = jax.jit(lambda H, v: jax.scipy.linalg.cho_solve(
    (jnp.linalg.cholesky(H), True), v))
timeit("B=8 cholesky+solve 172^2", f_ch,
       lambda: (Hs + float(rng.normal(0, 1e-6)) * jnp.eye(NXP)[None], gs))

# 6. new matmul-sampler LK, batched
imgsA = jnp.stack([jnp.asarray(frames[b][warmup][1]) for b in range(B)])
imgsB_ = jnp.stack([jnp.asarray(frames[b][warmup + 1][1]) for b in range(B)])
pyrA = jax.vmap(lambda im: tuple(image_ops.build_pyramid(im, 2)))(imgsA)
pyrB = jax.vmap(lambda im: tuple(image_ops.build_pyramid(im, 2)))(imgsB_)
pts = trk0.pts
act = trk0.ids >= 0
f_lk = jax.jit(lambda pa, pb, p: jax.vmap(
    lambda a0, a1, b0, b1, pp, aa: lk_ops.pyramidal_lk(
        (a0, a1), (b0, b1), pp, pp, aa, max_iters=20, coarse_iters=10)
)(pa[0], pa[1], pb[0], pb[1], p, act).pts)
timeit("B=8 pyramidal_lk (matmul sampler)", f_lk,
       lambda: (pyrA, pyrB, pts + float(rng.normal(0, 1e-4))))

# 7. full batched tracker
keysB = jax.random.split(jax.random.PRNGKey(1), B)
eyeB = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (B, 1, 1))
tcfg = pipes[0].tcfg
cam = pipes[0].cam
f_tr = jax.jit(lambda s, im, tt: jax.vmap(
    lambda a, b, c, d, e: ft.track_frame(tcfg, cam, a, b, c, d, e)
)(s, im, tt, eyeB, keysB)[1].n_tracked)
timeit("B=8 track_frame (full)", f_tr,
       lambda: (trk0, imgsB_ + float(rng.normal(0, 1e-3)),
                jnp.full((B,), 0.7, jnp.float32)))
