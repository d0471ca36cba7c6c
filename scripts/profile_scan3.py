"""Ablate the SCANNED batched runner (one dispatch over T frames) to
attribute per-step cost: full vs frontend-only vs backend-only, and
backend internals (no-marg / no-triangulate / solver iters)."""
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


def make_run(mode, ecfg=ecfg0, tcfg=tcfg):
    def frame_step(carry, inp):
        trk, st, base_keys, step_idx = carry
        img, depth, t, idts, iacc, igyr = inp
        imu = est.ImuInterval(dts=idts, acc=iacc, gyr=igyr)
        keys = jax.vmap(jax.random.fold_in, in_axes=(0, None))(
            base_keys, step_idx)
        if mode == "none":
            # carry/scan floor: touch inputs, change nothing
            return (trk, st, base_keys, step_idx + 1), jnp.mean(img, (1, 2))
        if mode == "glue":
            bg = st.x.Bg[:, WINDOW_SIZE]
            relR = jax.vmap(bp.gyro_relative_R)(idts, igyr, bg, st.x.qic)
            d = jax.vmap(ft.lookup_depth)(depth, feats0.uv, feats0.ids >= 0)
            return (trk, st, base_keys, step_idx + 1), (
                jnp.mean(d, -1) + relR[:, 0, 0])
        if mode != "backend":
            bg = st.x.Bg[:, WINDOW_SIZE]
            relR = jax.vmap(bp.gyro_relative_R)(idts, igyr, bg, st.x.qic)
            trk, tout = jax.vmap(
                lambda s, im, tt, r, k: ft.track_frame(tcfg, cam, s, im, tt, r, k)
            )(trk, img, t, relR, keys)
            feats = tout.features
            d = jax.vmap(ft.lookup_depth)(depth, feats.uv, feats.ids >= 0)
            feats = feats._replace(depth=d)
        else:
            feats = jax.tree.map(
                lambda a: a + 0 * jnp.float32(step_idx)
                if a.dtype != jnp.int32 else a, feats0)
        if mode != "frontend":
            st, sout = jax.vmap(
                lambda s, f, i, k: est.vio_step(ecfg, s, f, i, k)
            )(st, feats, imu, keys)
            out = sout.P
        else:
            out = feats.pts[:, 0]
        return (trk, st, base_keys, step_idx + 1), out

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
import re as _re


def _nops(fn):
    comp = fn.lower(trk0, st0, batch).compile()
    txt = comp.as_text()
    n = sum(1 for line in txt.splitlines()
            if _re.match(r"\s*(?:ROOT )?%?[\w.\-]+ = ", line))
    ca = comp.cost_analysis()
    return n, ca.get("flops", 0), ca.get("bytes accessed", 0)


def timeit(name, fn):
    # the library's track_frame/vio_step are themselves jitted: their traced
    # jaxprs are CACHED per (static cfg, shapes), so module monkeypatches
    # are invisible unless the trace caches are dropped first
    jax.clear_caches()
    nops, fl, by = _nops(fn)
    print(f"{name:34s} ops={nops} flops={fl/1e9:.2f}G bytes={by/1e9:.2f}G")
    out = fn(trk0, st0, batch); jax.block_until_ready(out)
    ts = []
    for _ in range(REPS):
        b2 = batch._replace(imgs=batch.imgs + jnp.float32(rng.normal(0, 1e-3)))
        jax.block_until_ready(b2.imgs)
        t0 = time.perf_counter()
        out = fn(trk0, st0, b2)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / T * 1e3)
    print(f"{name:34s} {min(ts):8.2f} ms/step  (med {sorted(ts)[len(ts)//2]:.2f})")


print(f"seed {SEED}  B={B} T={T}")
timeit("scan NONE (carry floor)", make_run("none"))
timeit("scan glue (relR+depth)", make_run("glue"))
timeit("scan FULL", make_run("full"))
timeit("scan frontend-only", make_run("frontend"))
timeit("scan backend-only", make_run("backend"))
timeit("scan backend iters=1",
       make_run("backend", ecfg=dataclasses.replace(ecfg0, max_iters=1)))

# covariance-propagation ablation: stub the preintegration covariance with
# a constant (DCEs the (F,Q) tree reduction; J still propagates)
_orig_mp = est._make_preints


def _fake_preints(cfg, st):
    d = _orig_mp(cfg, st)
    pre = d.pre._replace(covariance=jnp.broadcast_to(
        1e-4 * jnp.eye(15, dtype=jnp.float32), d.pre.covariance.shape))
    return d._replace(pre=pre)


est._make_preints = _fake_preints
timeit("scan backend cov-stubbed", make_run("backend"))
est._make_preints = _orig_mp

# ---- frontend internals ------------------------------------------------
from vins_rgbd_fast_tpu.ops import ransac as ransac_ops
from vins_rgbd_fast_tpu.ops import fast as fast_ops_mod

# (call sites resolve module attributes at call time — no reload needed)
_orig_fr = ransac_ops.fundamental_ransac
ransac_ops.fundamental_ransac = lambda key, p1, p2, valid, **kw: (
    ransac_ops.RansacResult(inliers=valid, model=jnp.zeros((3, 3), p1.dtype),
                            n_inliers=jnp.sum(valid), ok=jnp.asarray(True)))
timeit("scan frontend no-RANSAC", make_run("frontend"))
ransac_ops.fundamental_ransac = _orig_fr

_orig_fs = fast_ops_mod.fast_score
fast_ops_mod.fast_score = lambda img, thr: jnp.zeros_like(img)
timeit("scan frontend no-FAST", make_run("frontend"))
fast_ops_mod.fast_score = _orig_fs

_orig_lk = lk_ops_mod.pyramidal_lk if 'lk_ops_mod' in dir() else None
from vins_rgbd_fast_tpu.ops import lk as lk_ops_mod
_orig_lk = lk_ops_mod.pyramidal_lk
lk_ops_mod.pyramidal_lk = lambda pp, cp, pts, init_pts, act, **kw: (
    lk_ops_mod.LKResult(pts=init_pts, status=act,
                        err=jnp.zeros(pts.shape[0], pts.dtype)))
timeit("scan frontend no-LK", make_run("frontend"))
lk_ops_mod.pyramidal_lk = _orig_lk

# ---- backend internals -------------------------------------------------
from vins_rgbd_fast_tpu.ops import marginalization as marg_mod

_orig_mo, _orig_mn = marg_mod.marginalize_old, marg_mod.marginalize_new
marg_mod.marginalize_old = lambda cfg, x, vis, imu, prior, g, **kw: prior
marg_mod.marginalize_new = lambda cfg, x, prior: prior
timeit("scan backend no-marg", make_run("backend"))
marg_mod.marginalize_old, marg_mod.marginalize_new = _orig_mo, _orig_mn

# ---- deeper frontend: admission / pyramid ------------------------------
from vins_rgbd_fast_tpu.ops import image as image_mod

_orig_adm = ft._parallel_admission
ft._parallel_admission = (
    lambda cfg, xy, eligible, blocker_only, cand_grid, grid_need, is_new,
    rounds=16: eligible & ~blocker_only)
timeit("scan frontend no-admission", make_run("frontend"))
ft._parallel_admission = _orig_adm

_orig_pyr = image_mod.build_pyramid


def _cheap_pyr(img, levels):
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(pyr[-1][..., ::2, ::2])
    return pyr


image_mod.build_pyramid = _cheap_pyr
ft.image_ops.build_pyramid = _cheap_pyr
timeit("scan frontend cheap-pyramid", make_run("frontend"))
image_mod.build_pyramid = _orig_pyr
ft.image_ops.build_pyramid = _orig_pyr

# ---- deeper backend: triangulate / consistency / ingest / wp -----------
from vins_rgbd_fast_tpu.backend import feature_table as ftab_mod

_orig_tri = ftab_mod.triangulate_with_depth
ftab_mod.triangulate_with_depth = lambda t, P, Q, tic, qic, dmin, dmax: t
est.ftab.triangulate_with_depth = ftab_mod.triangulate_with_depth
timeit("scan backend no-triangulate", make_run("backend"))
ftab_mod.triangulate_with_depth = _orig_tri
est.ftab.triangulate_with_depth = _orig_tri

_orig_mc = est._moving_consistency
est._moving_consistency = lambda cfg, x, t: t
timeit("scan backend no-consistency", make_run("backend"))
est._moving_consistency = _orig_mc

_orig_wp = est._window_points


def _fake_wp(x, t):
    n = t.ids.shape[0]
    return (jnp.zeros((n, 3), x.P.dtype), jnp.zeros((n, 2), x.P.dtype),
            jnp.zeros((n, 2), x.P.dtype), jnp.zeros((n,), bool))


est._window_points = _fake_wp
timeit("scan backend no-windowpts", make_run("backend"))
est._window_points = _orig_wp

_orig_ing = ftab_mod.ingest_frame
ftab_mod.ingest_frame = lambda t, j, feats, td, dmin, mp: (
    t, jnp.asarray(True), jnp.asarray(100, jnp.int32))
est.ftab.ingest_frame = ftab_mod.ingest_frame
timeit("scan backend no-ingest", make_run("backend"))
ftab_mod.ingest_frame = _orig_ing
est.ftab.ingest_frame = _orig_ing
