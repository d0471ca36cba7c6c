"""Focused backend ablations on CURRENT code (post ingest rewrite)."""
import os, sys, time
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
from vins_rgbd_fast_tpu.backend.state import WINDOW_SIZE
from vins_rgbd_fast_tpu.frontend import feature_tracker as ft

SEED = int.from_bytes(os.urandom(4), "little")
rng = np.random.default_rng(SEED)
B = 8
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
tcfg = dataclasses.replace(pipes[0].tcfg, lk_sampler="matmul")
cam = pipes[0].cam
ecfg0 = pipes[0].estimator.cfg
batch = bp.stage_frames(pipes, frames, warmup, warmup + T)
jax.block_until_ready(batch.imgs)

# a dummy feature set for tracker-ablated mode
keysB = jax.random.split(jax.random.PRNGKey(3), B)
eyeB = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (B, 1, 1))
_, tout0 = jax.jit(lambda s, im, tt: jax.vmap(
    lambda a, b, c, d, e: ft.track_frame(tcfg, cam, a, b, c, d, e)
)(s, im, tt, eyeB, keysB))(trk0, batch.imgs[0], batch.ts[0])
feats0 = tout0.features



def make_run(mode, ecfg=ecfg0):
    def frame_step(carry, inp):
        trk, st, base_keys, step_idx = carry
        img, depth, t, idts, iacc, igyr = inp
        imu = est.ImuInterval(dts=idts, acc=iacc, gyr=igyr)
        keys = jax.vmap(jax.random.fold_in, in_axes=(0, None))(
            base_keys, step_idx)
        feats = jax.tree.map(
            lambda a: a + 0 * jnp.float32(step_idx)
            if a.dtype != jnp.int32 else a, feats0)
        st, sout = jax.vmap(
            lambda s, f, i, k: est.vio_step(ecfg, s, f, i, k)
        )(st, feats, imu, keys)
        return (trk, st, base_keys, step_idx + 1), sout.P

    @jax.jit
    def run(trk_states, est_states, batch):
        Bn = batch.ts.shape[1]
        base_keys = jax.random.split(jax.random.PRNGKey(17), Bn)
        with jax.default_matmul_precision("float32"):
            (trk, st, _, _), outs = jax.lax.scan(
                frame_step, (trk_states, est_states, base_keys,
                             jnp.asarray(0, jnp.int32)),
                (batch.imgs, batch.depths, batch.ts,
                 batch.imu_dts, batch.imu_acc, batch.imu_gyr))
        return outs

    return run


REPS = 6


def timeit(name, fn):
    jax.clear_caches()
    out = fn(trk0, st0, batch); jax.block_until_ready(out)
    ts = []
    for _ in range(REPS):
        b2 = batch._replace(imgs=batch.imgs + jnp.float32(rng.normal(0, 1e-3)),
                            imu_acc=batch.imu_acc + jnp.float32(rng.normal(0, 1e-6)))
        jax.block_until_ready(b2.imgs)
        t0 = time.perf_counter()
        out = fn(trk0, st0, b2)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / T * 1e3)
    print(f"{name:30s} {min(ts):8.2f} ms/step")
    import sys as _s; _s.stdout.flush()


from vins_rgbd_fast_tpu.backend import feature_table as ftab_mod
from vins_rgbd_fast_tpu.ops import marginalization as marg_mod
from vins_rgbd_fast_tpu.ops import solver as slv_mod
from vins_rgbd_fast_tpu.ops import imu_preintegration as ip_mod

print(f"seed {SEED}")
timeit("backend base", make_run("x"))
timeit("backend iters=1",
       make_run("x", ecfg=dataclasses.replace(ecfg0, max_iters=1)))

_oi = ftab_mod.ingest_frame
ftab_mod.ingest_frame = lambda t, j, feats, td, dmin, mp: (
    t, jnp.asarray(True), jnp.asarray(100, jnp.int32))
timeit("backend no-ingest", make_run("x"))
ftab_mod.ingest_frame = _oi

_om, _on = marg_mod.marginalize_old, marg_mod.marginalize_new
marg_mod.marginalize_old = lambda cfg, x, vis, imu, prior, g, **kw: prior
marg_mod.marginalize_new = lambda cfg, x, prior: prior
timeit("backend no-marg", make_run("x"))
marg_mod.marginalize_old, marg_mod.marginalize_new = _om, _on

_ot = ftab_mod.triangulate_with_depth
ftab_mod.triangulate_with_depth = lambda t, P, Q, tic, qic, dmin, dmax: t
timeit("backend no-triangulate", make_run("x"))
ftab_mod.triangulate_with_depth = _ot

# stub preintegrate with a cheap fake (identity-ish)
_op = ip_mod.preintegrate
def _fake_pre(dts, accs, gyrs, ba, bg, noise):
    dt = jnp.sum(dts.astype(accs.dtype))
    return ip_mod.Preintegrated(
        delta_p=jnp.zeros(3, accs.dtype) + 1e-6 * accs[0],
        delta_q=jnp.asarray([1.0, 0, 0, 0], accs.dtype),
        delta_v=jnp.zeros(3, accs.dtype),
        jacobian=jnp.eye(15, dtype=accs.dtype),
        covariance=1e-4 * jnp.eye(15, dtype=accs.dtype),
        sum_dt=dt, linearized_ba=ba, linearized_bg=bg)
ip_mod.preintegrate = _fake_pre
timeit("backend fake-preint", make_run("x"))
ip_mod.preintegrate = _op

# stub the whole solve (keep state, zero cost)
_os = slv_mod.solve
def _fake_solve(cfg, x0, vis, imu, prior, g, td_free=None, relo=None, sqrt_infos=None):
    return slv_mod.SolveResult(
        x=x0, inv_depth=vis.inv_depth, cost0=jnp.float32(1.0),
        cost=jnp.float32(1.0), iters_accepted=jnp.asarray(0),
        relo_P=(jnp.zeros(3) if cfg.with_relo else None),
        relo_Q=(jnp.asarray([1.0,0,0,0]) if cfg.with_relo else None))
slv_mod.solve = _fake_solve
timeit("backend no-solve", make_run("x"))
slv_mod.solve = _os
