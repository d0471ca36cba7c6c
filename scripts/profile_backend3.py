"""Trustworthy backend timings: cache-busting random perturbations (the
axon platform serves identical-input executions from a result cache, and
deterministic profile scripts re-hit it across runs), real pipeline states,
iteration sweeps."""
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
from vins_rgbd_fast_tpu.ops import marginalization as marg
import dataclasses

SEED = int.from_bytes(os.urandom(4), "little")  # cache-buster
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
st1 = pipes[0].estimator.state  # single-sequence state
g = ecfg.gravity(jnp.float32)
REPS = 10


def timeit(name, fn, make_args):
    out = fn(*make_args()); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*make_args())
    jax.block_until_ready(out)
    print(f"{name:38s} {(time.perf_counter()-t0)/REPS*1e3:8.2f} ms")


def perturb(st):
    d = jnp.asarray(rng.normal(0, 1e-5, (3,)).astype(np.float32))
    return st._replace(x=st.x._replace(P=st.x.P + d[None]))


def perturbB(st):
    d = jnp.asarray(rng.normal(0, 1e-5, (B, 1, 3)).astype(np.float32))
    return st._replace(x=st.x._replace(P=st.x.P + d))


# single-seq components
def mk_solve(iters):
    cfg_i = dataclasses.replace(ecfg, max_iters=iters)

    def f(st):
        vis = est._visual_data(cfg_i, st.table)
        imud = est._make_preints(cfg_i, st)
        return slv.solve(cfg_i.solver, st.x, vis, imud, st.prior, g).cost
    return jax.jit(f)


for it in (1, 2, 8):
    timeit(f"solve iters={it} (single)", mk_solve(it), lambda: (perturb(st1),))

fm_old = jax.jit(lambda st: marg.marginalize_old(
    ecfg.solver, st.x, est._visual_data(ecfg, st.table),
    est._make_preints(ecfg, st), st.prior, g).r0)
timeit("marginalize_old (single)", fm_old, lambda: (perturb(st1),))

fstep = jax.jit(lambda st, f, i, k: est.vio_step(ecfg, st, f, i, k)[1].cost)
feats1 = pipes[0].estimator  # build a features example from the table
from vins_rgbd_fast_tpu.backend.feature_table import FrameFeatures
maxc = ecfg.maxf
f_ex = FrameFeatures(
    ids=jnp.arange(maxc, dtype=jnp.int32),
    pts=jnp.asarray(rng.uniform(-0.4, 0.4, (maxc, 2)).astype(np.float32)),
    uv=jnp.asarray(rng.uniform(50, 400, (maxc, 2)).astype(np.float32)),
    vel=jnp.zeros((maxc, 2), jnp.float32),
    depth=jnp.asarray(rng.uniform(1, 8, (maxc,)).astype(np.float32)),
)
iv = est.ImuInterval(dts=st1.imu_dts[-1], acc=st1.imu_acc[-1], gyr=st1.imu_gyr[-1])
key = jax.random.PRNGKey(0)
timeit("vio_step (single, real)", fstep, lambda: (perturb(st1), f_ex, iv, key))

# batched
fstepB = jax.jit(jax.vmap(lambda st, f, i, k: est.vio_step(ecfg, st, f, i, k)[1].cost))
f_exB = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), f_ex)
ivB = est.ImuInterval(dts=st0.imu_dts[:, -1], acc=st0.imu_acc[:, -1],
                      gyr=st0.imu_gyr[:, -1])
keysB = jax.random.split(key, B)
timeit("vmap vio_step B=8 (real)", fstepB, lambda: (perturbB(st0), f_exB, ivB, keysB))


def mk_solveB(iters):
    cfg_i = dataclasses.replace(ecfg, max_iters=iters)

    def f(st):
        vis = est._visual_data(cfg_i, st.table)
        imud = est._make_preints(cfg_i, st)
        return slv.solve(cfg_i.solver, st.x, vis, imud, st.prior, g).cost
    return jax.jit(jax.vmap(f))


for it in (1, 8):
    timeit(f"vmap solve iters={it} B=8", mk_solveB(it), lambda: (perturbB(st0),))
