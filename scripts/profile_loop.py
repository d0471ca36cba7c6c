"""Per-dispatch device-time profile of the batched loop-closure path.

Times (blocked, min-of-N with varied inputs) each device program the
BatchedLoopCloser dispatches per segment: batched keyframe extraction,
cross-sequence retrieval scoring, device-resident verification, the
vmapped PGO, and the block DB appends — so perf work targets the real
cost, not a guess.
"""
import os, sys, time
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
import numpy as np

from vins_rgbd_fast_tpu.loop.pose_graph import (
    PoseGraphConfig, make_batch_extractor, _db_query_all,
    verify_loops_device, optimize_4dof, _db_update_block)
from vins_rgbd_fast_tpu.models.camera import PinholeCamera

B, Kp, CAP, QP = 8, 32, 128, 32
cfg = PoseGraphConfig(max_wp=96, pad_nodes_min=128, pad_edges_min=1024)
cam = PinholeCamera(460.0, 460.0, 320.0, 240.0, 640, 480)
extract = make_batch_extractor(cfg, cam)

rng = np.random.default_rng(0)


def timeit(name, fn, n=6):
    outs = [fn(i) for i in range(2)]  # compile + settle
    jax.block_until_ready(outs)
    ts = []
    for i in range(n):
        a = fn(i)
        t0 = time.perf_counter()
        jax.block_until_ready(a)
        ts.append(time.perf_counter() - t0)
    # dispatch-inclusive: time a fresh call start-to-blocked
    ts2 = []
    for i in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(i + 100))
        ts2.append(time.perf_counter() - t0)
    print(f"{name:28s} exec={1e3*min(ts2):8.2f} ms")
    return min(ts2)


imgs = [jnp.asarray(rng.integers(0, 255, (Kp, 480, 640)), jnp.float32)
        for _ in range(110)]
wp_uv = jnp.asarray(rng.uniform(10, 470, (Kp, cfg.max_wp, 2)), jnp.float32)
wp_valid = jnp.ones((Kp, cfg.max_wp), bool)

t_ext = timeit("extract (Kp=32, 640x480)", lambda i: extract(imgs[i % len(imgs)], wp_uv, wp_valid))

dbs = jnp.asarray(rng.integers(-1, 2, (B, CAP, cfg.max_kp, 256)), jnp.int8)
dbvs = jnp.ones((B, CAP, cfg.max_kp), bool)
qs = [jnp.asarray(rng.integers(-1, 2, (B, QP, cfg.max_kp, 256)), jnp.int8)
      for _ in range(8)]
qvs = jnp.ones((B, QP, cfg.max_kp), bool)
t_q = timeit("query_all (B=8,qp=32,cap=128)",
             lambda i: _db_query_all(dbs, dbvs, qs[i % len(qs)], qvs, 60.0))

dbns = jnp.zeros((B, CAP, cfg.max_kp, 2), jnp.float32)
ints = jnp.zeros((64, 4), jnp.int32)
flts_l = [jnp.asarray(rng.normal(size=(64, 24)), jnp.float32) for _ in range(8)]
wldc = jnp.asarray(rng.normal(size=(Kp, cfg.max_wp, 3)), jnp.float32)
wdc = jnp.asarray(rng.integers(-1, 2, (Kp, cfg.max_wp, 256)), jnp.int8)
wvc = jnp.ones((Kp, cfg.max_wp), bool)
t_v = timeit("verify_device (C=64)",
             lambda i: verify_loops_device(ints, flts_l[i % 8], wldc, wdc, wvc,
                                           dbs, dbvs, dbns, 80.0, 25))

Kn, Ep = 128, 1024
yaw = [jnp.asarray(rng.normal(size=(B, Kn)), jnp.float32) for _ in range(8)]
tt = jnp.asarray(rng.normal(size=(B, Kn, 3)), jnp.float32)
zer = jnp.zeros((B, Kn))
valid = jnp.ones((B, Kn), bool)
fixed = jnp.zeros((B, Kn), bool).at[:, 0].set(True)
ei = jnp.asarray(rng.integers(0, Kn - 1, (B, Ep)), jnp.int32)
ej = ei + 1
ert = jnp.asarray(rng.normal(size=(B, Ep, 3)), jnp.float32)
ery = jnp.asarray(rng.normal(size=(B, Ep)), jnp.float32)
ew = jnp.ones((B, Ep))
elo = jnp.zeros((B, Ep), bool)
evl = jnp.ones((B, Ep), bool)


def pgo(i):
    def solve(yaw, tt, pitch, roll, valid, fixed, ei, ej, ert, ery, ew, elo, evl):
        return optimize_4dof(yaw, tt, pitch, roll, valid, fixed, ei, ej,
                             ert, ery, ew, elo, evl, n_nodes_static=Kn,
                             iters=cfg.pg_iters, huber=cfg.huber)
    return _vf(yaw[i % 8], tt, zer, zer, valid, fixed, ei, ej, ert, ery, ew,
               elo, evl)


def _mk():
    def solve(yaw, tt, pitch, roll, valid, fixed, ei, ej, ert, ery, ew, elo, evl):
        return optimize_4dof(yaw, tt, pitch, roll, valid, fixed, ei, ej,
                             ert, ery, ew, elo, evl, n_nodes_static=Kn,
                             iters=cfg.pg_iters, huber=cfg.huber)
    return jax.jit(jax.vmap(solve))


_vf = _mk()
t_p = timeit("pgo vmapped (B=8,K=128,E=1024)", pgo)

descs = [jnp.asarray(rng.integers(-1, 2, (QP, cfg.max_kp, 256)), jnp.int8)
         for _ in range(8)]
vals = jnp.ones((QP, cfg.max_kp), bool)
norms = jnp.zeros((QP, cfg.max_kp, 2), jnp.float32)
state = [jnp.zeros((CAP, cfg.max_kp, 256), jnp.int8),
         jnp.zeros((CAP, cfg.max_kp), bool),
         jnp.zeros((CAP, cfg.max_kp, 2), jnp.float32)]


def app(i):
    state[0], state[1], state[2] = _db_update_block(
        state[0], state[1], state[2], descs[i % 8], vals, norms,
        jnp.asarray(0, jnp.int32))
    return state[0]


t_a = timeit("db_append_block (32 rows)", app)

tot = t_ext + t_q + t_v + t_p + t_a
print(f"{'TOTAL per segment':28s} exec={1e3*tot:8.2f} ms")
