"""Per-stage TPU timing harness (round-2 perf work).

Times the tracker's component ops and the backend step in isolation, with
VARYING inputs (the axon platform serves identical-input executions from a
result cache) and no per-iteration host syncs (chain K dispatches, sync
once, divide).

Usage: python scripts/profile_stages.py [stage ...]
  stages: track lk fast ransac admission backend batched_backend batched_track
"""

import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
cache_dir = os.path.join(_REPO, ".jax_cache")
os.makedirs(cache_dir, exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp

REPS = int(os.environ.get("PROF_REPS", "30"))


def timeit(name, fn, inputs):
    """fn(x) -> y chained over varying inputs; one sync at the end."""
    outs = fn(inputs[0])
    jax.block_until_ready(outs)  # compile + handshake
    outs = fn(inputs[1 % len(inputs)])
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    for k in range(REPS):
        outs = fn(inputs[k % len(inputs)])
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name:28s} {dt:8.3f} ms")
    return dt


def make_imgs(n, H=480, W=640, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (H, W)).astype(np.float32)
    imgs = []
    for k in range(n):
        img = np.roll(base, k + 1, axis=1) + rng.normal(0, 1, (H, W)).astype(np.float32)
        imgs.append(jax.device_put(jnp.asarray(img)))
    jax.block_until_ready(imgs)
    return imgs


def main():
    stages = sys.argv[1:] or ["track", "lk", "fast", "ransac", "admission", "backend"]
    from vins_rgbd_fast_tpu.frontend import feature_tracker as ft
    from vins_rgbd_fast_tpu.models.camera import make_camera
    from vins_rgbd_fast_tpu.ops import fast as fast_ops
    from vins_rgbd_fast_tpu.ops import lk as lk_ops
    from vins_rgbd_fast_tpu.ops import ransac as ransac_ops
    from vins_rgbd_fast_tpu.ops import image as image_ops

    H, W = 480, 640
    cfg = ft.TrackerConfig(width=W, height=H, max_cnt=130, min_dist=30,
                           grid_rows=7, grid_cols=8)
    cam = make_camera("PINHOLE", fx=460.0, fy=460.0, cx=320.0, cy=240.0,
                      k1=0, k2=0, p1=0, p2=0, width=W, height=H)
    maxc = cfg.maxc
    rng = np.random.default_rng(1)
    imgs = make_imgs(8)
    pts = jnp.asarray(rng.uniform(30, 400, (maxc, 2)).astype(np.float32))
    ids = jnp.asarray(np.arange(maxc, dtype=np.int32))
    keys = jax.random.split(jax.random.PRNGKey(0), 64)

    if "track" in stages:
        st = ft.init_state(cfg, jnp.float32)
        st = st._replace(pts=pts, ids=ids,
                         track_cnt=jnp.full((maxc,), 5, jnp.int32),
                         has_prev=jnp.asarray(True))
        # seed pyramid with a real image
        st, _ = ft.track_frame(cfg, cam, st, imgs[0], jnp.asarray(0.0, jnp.float32),
                               jnp.eye(3, dtype=jnp.float32), keys[0])
        jax.block_until_ready(st.pts)
        states = [st]

        def step(k):
            s = states[0]
            s, out = ft.track_frame(cfg, cam, s, imgs[k % 8],
                                    jnp.asarray(0.05 * (k + 1), jnp.float32),
                                    jnp.eye(3, dtype=jnp.float32), keys[k % 64])
            states[0] = s
            return out.n_tracked

        timeit("track_frame (full)", step, list(range(32)))

    if "lk" in stages:
        pyr_a = tuple(image_ops.build_pyramid(imgs[0], 2))
        pyrs = [tuple(image_ops.build_pyramid(im, 2)) for im in imgs]
        act = jnp.ones(maxc, bool)
        f = jax.jit(lambda pb, p: lk_ops.pyramidal_lk(pyr_a, pb, p, p, act))
        timeit("pyramidal_lk 2-level", lambda k: f(pyrs[k % 8], pts + k * 0.01),
               list(range(32)))

    if "fast" in stages:
        f = jax.jit(lambda im: fast_ops.grid_topk(
            fast_ops.nms3(fast_ops.fast_score(im, 10.0)),
            cfg.grid_rows, cfg.grid_cols, cfg.cand_per_grid))
        timeit("fast_score+nms+grid_topk", lambda k: f(imgs[k % 8]), list(range(32)))

    if "ransac" in stages:
        p2 = pts + 1.0
        f = jax.jit(lambda key, a: ransac_ops.fundamental_ransac(
            key, a, p2, jnp.ones(maxc, bool), threshold=1.0, n_trials=200))
        timeit("fundamental_ransac 200t",
               lambda k: f(keys[k % 64], pts + k * 0.01), list(range(32)))

    if "admission" in stages:
        ncand = cfg.num_grids * cfg.cand_per_grid
        M = maxc + ncand
        xy = jnp.asarray(rng.uniform(0, 600, (M, 2)).astype(np.float32))
        elig = jnp.ones(M, bool)
        blk = jnp.zeros(M, bool)
        grids = jnp.asarray(rng.integers(0, cfg.num_grids, M, dtype=np.int32))
        need = jnp.full(cfg.num_grids, 4, jnp.int32)
        isnew = jnp.asarray(np.arange(M) >= maxc)
        f = jax.jit(lambda xy: ft._greedy_admission(cfg, xy, elig, blk, grids, need, isnew))
        timeit("greedy_admission", lambda k: f(xy + k * 0.01), list(range(32)))

    if "backend" in stages or "batched_backend" in stages:
        import __graft_entry__ as g
        from vins_rgbd_fast_tpu.backend import estimator as est

        ecfg = g._example_cfg(maxf=192, maxi=32)
        state, feats, imu, key = g._example_inputs(ecfg)
        sts = [state]

        def bstep(k):
            s, out = est.vio_step(ecfg, sts[0],
                                  feats._replace(pts=feats.pts + k * 1e-4),
                                  imu, keys[k % 64])
            sts[0] = s
            return out.cost

        if "backend" in stages:
            timeit("vio_step maxf=192", bstep, list(range(32)))

        if "batched_backend" in stages:
            B = 8
            stateb, featsb, imub, keyb = g._example_inputs(ecfg, batch=B)
            stsb = [stateb]
            vstep = jax.jit(jax.vmap(lambda s, f, i, k: est.vio_step(ecfg, s, f, i, k)))

            def bbstep(k):
                s, out = vstep(stsb[0],
                               featsb._replace(pts=featsb.pts + k * 1e-4),
                               imub, jax.random.split(keys[k % 64], B))
                stsb[0] = s
                return out.cost

            timeit("vmap(vio_step) B=8", bbstep, list(range(32)))

    if "solve" in stages or "marg" in stages or "pre" in stages:
        import __graft_entry__ as g
        from vins_rgbd_fast_tpu.backend import estimator as est
        from vins_rgbd_fast_tpu.backend import feature_table as ftab
        from vins_rgbd_fast_tpu.ops import marginalization as marg
        from vins_rgbd_fast_tpu.ops import solver as slv

        ecfg = g._example_cfg(maxf=192, maxi=32)
        state, feats, imu2, key = g._example_inputs(ecfg)
        # run a couple steps to get a realistic state
        for k in range(3):
            state, _ = est.vio_step(ecfg, state, feats, imu2, keys[k])
        jax.block_until_ready(state.x.P)
        gvec = ecfg.gravity(jnp.float32)

        if "pre" in stages:
            f = jax.jit(lambda st: est._make_preints(ecfg, st).pre.delta_p)
            timeit("make_preints", lambda k: f(state._replace(
                imu_acc=state.imu_acc + k * 1e-6)), list(range(32)))
            f2 = jax.jit(lambda st: ftab.triangulate_with_depth(
                st.table, st.x.P, st.x.Q, st.x.tic, st.x.qic,
                ecfg.depth_min_dist, ecfg.depth_max_dist).est_depth)
            timeit("triangulate", lambda k: f2(state._replace(
                x=state.x._replace(P=state.x.P + k * 1e-6))), list(range(32)))

        if "solve" in stages:
            def fsolve(st):
                vis = est._visual_data(ecfg, st.table)
                imud = est._make_preints(ecfg, st)
                return slv.solve(ecfg.solver, st.x, vis, imud, st.prior,
                                 gvec).cost
            f = jax.jit(fsolve)
            timeit("solve (8 LM iters)", lambda k: f(state._replace(
                x=state.x._replace(P=state.x.P + k * 1e-6))), list(range(32)))

        if "marg" in stages:
            def fmo(st):
                vis = est._visual_data(ecfg, st.table)
                imud = est._make_preints(ecfg, st)
                return marg.marginalize_old(
                    ecfg.solver, st.x, vis, imud, st.prior, gvec).r0
            f = jax.jit(fmo)
            timeit("marginalize_old", lambda k: f(state._replace(
                x=state.x._replace(P=state.x.P + k * 1e-6))), list(range(32)))
            f2 = jax.jit(lambda st: marg.marginalize_new(
                ecfg.solver, st.x, st.prior).r0)
            timeit("marginalize_new", lambda k: f2(state._replace(
                x=state.x._replace(P=state.x.P + k * 1e-6))), list(range(32)))

    if "batched_track" in stages:
        B = 8
        st = ft.init_state(cfg, jnp.float32)
        st = st._replace(pts=pts, ids=ids,
                         track_cnt=jnp.full((maxc,), 5, jnp.int32),
                         has_prev=jnp.asarray(True))
        stb = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), st)
        imgb = jnp.stack([imgs[b] for b in range(B)])
        vt = jax.jit(jax.vmap(
            lambda s, im, t, key: ft.track_frame(
                cfg, cam, s, im, t, jnp.eye(3, dtype=jnp.float32), key)))
        stbs = [stb]

        def btstep(k):
            s, out = vt(stbs[0], imgb + k * 0.01,
                        jnp.full((B,), 0.05 * k, jnp.float32),
                        jax.random.split(keys[k % 64], B))
            stbs[0] = s
            return out.n_tracked

        timeit("vmap(track_frame) B=8", btstep, list(range(16)))


if __name__ == "__main__":
    main()
