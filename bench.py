"""Benchmark harness: VIO frames/sec/chip at 640×480 RGB-D + ATE vs ground
truth on synthetic D435i-like sequences.

Prints ONE JSON line covering BOTH execution modes:
  - batched throughput (primary metric): B independent sequences, whole
    per-frame pipeline fused + vmapped + lax.scan-ned — aggregate fps/chip
  - latency: one sequence, fused single-dispatch-per-frame steady state —
    the robot-facing per-frame mode (the reference is a latency system,
    estimator_nodelet.cpp:61-62)

Baseline: the reference (VINS-RGBD-FAST) is engineered to run real-time at
its frontend input cap — 20-30 Hz on embedded CPUs (config frontend_freq,
BASELINE.md).  vs_baseline = fps / 30.

Env knobs: BENCH_MODE=both|batched|latency|recovery, BENCH_BATCH,
BENCH_FRAMES, BENCH_SEGMENTS, BENCH_SOLVER_ITERS, BENCH_LK_ITERS,
BENCH_LK_COARSE, BENCH_FAILURE_CHECK, BENCH_LOOP (batched loop closure
on/off, default on), BENCH_REVISIT (revisit-trajectory count, default
B/2), BENCH_KF_PARALLAX (default 10 px, the reference's
config/realsense/vio.yaml:72), BENCH_SKIP_DIS, BENCH_RECENCY,
BENCH_PGO_PERIOD (PGO wakeup cadence in stream seconds, default 2.0 =
the reference's optimize4DoF thread), BENCH_THREAD (worker-thread loop
closer, default on), BENCH_OVERLAP (in-thread 5-stage pipelined closer
when BENCH_THREAD=0), BENCH_DEGRADE=off|mild|harsh (sensor-realism
presets), BENCH_DISTORT (radtan rig, default on), BENCH_DRIFT (gyro
pulse rad/s injected into revisit sequences, default 0.2),
BENCH_LAT_LOOP (pose graph in latency mode, default on),
BENCH_SCORE_BEST/BENCH_SCORE_SECOND (retrieval double threshold,
defaults 0.08/0.02 — PnP verification gates precision).
"""

import dataclasses as dc
import json
import os
import sys
import time

import numpy as np

BASELINE_FPS = 30.0
_T0 = time.time()


def _log(msg: str):
    """Progress to stderr (the metric line on stdout stays parseable)."""
    print(f"[bench {time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _setup_jax():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return jax


def _rig():
    """D435i-like 640x480 rig.  By default it carries the reference's
    realsense radtan distortion (config/realsense/vio.yaml
    distortion_parameters) — the renderer produces DISTORTED frames and
    the pipeline's 8-iteration fixed-point undistort
    (models/camera.py pinhole_lift, PinholeCamera.cc:489-505) runs on
    every tracked feature INSIDE the timed region.  BENCH_DISTORT=0
    reverts to the ideal-pinhole rig."""
    from vins_rgbd_fast_tpu.io import synthetic as syn

    kw = {}
    if os.environ.get("BENCH_DISTORT", "1") != "0":
        kw = dict(k1=0.13387871564774004, k2=-0.2731913133377051,
                  p1=0.0020296263577681264, p2=-0.00044384544608203714)
    return syn.SyntheticRig(width=640, height=480, fx=460.0, fy=460.0,
                            cx=320.0, cy=240.0, imu_rate=200.0,
                            frame_rate=20.0, **kw)


def _cfg(rig, seq, keyframe_parallax: float = 10.0):
    from vins_rgbd_fast_tpu.config import VinsConfig

    return VinsConfig(
        imu=True, static_init=True,
        image_width=640, image_height=480,
        intrinsics=(rig.fx, rig.fy, rig.cx, rig.cy),
        distortion=(rig.k1, rig.k2, rig.p1, rig.p2),
        ric=tuple(seq.ric.ravel().tolist()), tic=tuple(seq.tic.tolist()),
        max_cnt=130, min_dist=30, num_grid_rows=7, num_grid_cols=8,
        frontend_freq=0.0, freq=0.0,
        fix_depth=True, depth_max_dist=12.0,
        acc_n=0.1, gyr_n=0.01, acc_w=1e-4, gyr_w=1e-5,
        max_imu_per_frame=32,
        keyframe_parallax=keyframe_parallax,
    )


def _degradation():
    """BENCH_DEGRADE=off|mild|harsh: sensor-realism presets (D435i-like
    quadratic depth noise, block/edge holes, exposure drift, read noise,
    rolling-shutter shear, a moving sphere) — io/synthetic.py."""
    from vins_rgbd_fast_tpu.io import synthetic as syn

    name = os.environ.get("BENCH_DEGRADE", "off")
    presets = {
        "off": None,
        "mild": syn.SensorDegradation(
            depth_sigma=0.002, hole_p=0.03, exposure_amp=0.15,
            read_noise=1.5),
        "harsh": syn.SensorDegradation(
            depth_sigma=0.006, hole_p=0.10, edge_hole=True,
            exposure_amp=0.3, read_noise=3.0, rs_shear_px=2.0,
            dyn_radius=0.5),
    }
    return presets[name]


def _render(seq, rig, seed=0):
    from vins_rgbd_fast_tpu.io import synthetic as syn

    deg = _degradation()
    if deg is None:
        return syn.frames(seq, rig)
    return syn.frames_degraded(seq, rig, deg, seed=seed)


def _render_batch(seq, rig, seed=0):
    """Render the whole sequence in vmapped chunks — a handful of device
    dispatches instead of one per frame (each launch + sync pays a full
    RTT through the remote-TPU tunnel)."""
    from vins_rgbd_fast_tpu.io import synthetic as syn

    return syn.render_sequence_batch(seq, rig, deg=_degradation(), seed=seed)


def _apply_envelope(pipe):
    """Throughput envelope shared by both modes: 2 scored LM candidates +
    LK 12/6 iteration caps — validated ATE-neutral across the full
    degradation grid (scripts/sweep_ate.py → sweep_ate.json: LM∈{2,4,8}
    identical ATE at off/mild/harsh sensor degradation; LK 12 beats 8 and
    matches 16 in the mean), NOT just on the clean bench scene."""
    si = int(os.environ.get("BENCH_SOLVER_ITERS", "2"))
    if si:
        pipe.estimator.cfg = dc.replace(pipe.estimator.cfg, max_iters=si)
    lkf = int(os.environ.get("BENCH_LK_ITERS", "12"))
    if lkf:
        pipe.tcfg = dc.replace(pipe.tcfg, lk_max_iters=lkf)
    lkc = int(os.environ.get("BENCH_LK_COARSE", "6"))
    if lkc:
        pipe.tcfg = dc.replace(pipe.tcfg, lk_coarse_iters=lkc)
    return pipe


def run_latency() -> dict:
    """Single-sequence fused steady state: ONE dispatch per frame.

    The pose graph runs CONCURRENTLY by default (BENCH_LAT_LOOP=0 reverts
    to VIO-only) — the reference never runs without its pose_graph nodelet
    (launch/realsense/realsense_vio.launch).  The scene is a REVISIT
    trajectory with a mid-outbound gyro pulse (BENCH_DRIFT), so loops
    actually fire inside the timed region and the corrected path must BEAT
    raw VIO
    (`latency_loop_ate_m` < `latency_ate_m`)."""
    import jax
    import jax.numpy as jnp

    from vins_rgbd_fast_tpu.io import synthetic as syn
    from vins_rgbd_fast_tpu.io import stream as io_stream
    from vins_rgbd_fast_tpu.pipeline import VinsPipeline

    n_frames = int(os.environ.get("BENCH_FRAMES", "112"))
    warmup = 16
    fci = int(os.environ.get("BENCH_FAILURE_CHECK", str(10 ** 9)))
    with_loop = os.environ.get("BENCH_LAT_LOOP", "1") != "0"
    drift = float(os.environ.get("BENCH_DRIFT", "0.2"))

    rig = _rig()
    if with_loop:
        seq = syn.make_revisit_trajectory(n_frames, rig, seed=207,
                                          accel=1.5, axis=(0.0, 1.0, 0.0),
                                          cycles=2)
        if drift > 0:
            # fast gyro pulse about gravity: unobservable yaw drift the
            # window can't absorb — the error class the pose graph cancels
            seq = syn.corrupt_imu(seq, seed=307, gyr_noise=0.003,
                                  gyr_pulse=drift, pulse_frac=(0.18, 0.3))
    else:
        seq = syn.make_trajectory(n_frames, rig, seed=7, omega_scale=0.15,
                                  acc_scale=0.3)
    cfg = _cfg(rig, seq)
    pg_cfg = None
    if with_loop:
        from vins_rgbd_fast_tpu.loop.pose_graph import PoseGraphConfig

        cfg = dc.replace(cfg, loop_closure=True, fast_relocalization=True)
        pg_cfg = PoseGraphConfig(
            max_wp=cfg.feature_capacity,
            recency_exclusion=int(os.environ.get("BENCH_RECENCY", "8")),
            score_best=float(os.environ.get("BENCH_SCORE_BEST", "0.08")),
            score_second=float(os.environ.get("BENCH_SCORE_SECOND", "0.02")),
            pad_nodes_min=128, pad_edges_min=1024)

    # pre-render and KEEP frames on device: in production the sensor feed
    # DMAs into HBM; the remote tunnel's ~50 ms/MB host->device path is not
    # what we are measuring.  Batched rendering + pre-slicing: launches are
    # asynchronous and cheap, SYNCS pay a full tunnel RTT — so sync once.
    _log("latency: rendering")
    ts_all, imgs_d, deps_d = _render_batch(seq, rig, seed=7)
    jax.block_until_ready((imgs_d, deps_d))
    frames = [(float(ts_all[k]), imgs_d[k], deps_d[k])
              for k in range(len(ts_all))]
    _log("latency: rendered; warming up pipeline")

    pipe = VinsPipeline(cfg, dtype=jnp.float32, eager_outputs=False,
                        failure_check_interval=fci, fused_steady_state=True,
                        pose_graph_config=pg_cfg)
    pipe = _apply_envelope(pipe)
    for (t, a, w) in seq.imu:
        pipe.push_imu(t, a, w)

    # warm-up: compile all programs + establish the (lazy, potentially very
    # slow first-use) device->host readback path before timing
    for (t, img, depth) in frames[:warmup]:
        pipe.push_image(t, img)
        pipe.push_depth(t, depth)
        pipe.spin_once()
    if pipe._loop_stager is not None:
        # settle the worker, then pre-trace extraction/retrieval/
        # find-connection/PGO on a ghost graph so no one-time compile
        # lands in the timed region
        pipe._loop_stager.drain()
        pipe._loop_stager.compile_warmup(frames[0][1])
    jax.block_until_ready(pipe.estimator.state.x.P)
    _ = np.asarray(pipe.estimator.state.x.P)  # readback handshake
    _log("latency: warm; timing")

    t0 = time.perf_counter()
    for (t, img, depth) in frames[warmup:]:
        pipe.push_image(t, img)
        pipe.push_depth(t, depth)
        pipe.spin_once()
    if pipe._loop_stager is not None:
        pipe._loop_stager.drain()
    jax.block_until_ready(pipe.estimator.state.x.P)
    elapsed = time.perf_counter() - t0
    n_timed = len(frames) - warmup
    fps = n_timed / elapsed if elapsed > 0 else 0.0
    _log(f"latency: timed {n_timed} frames, {fps:.1f} fps")

    traj = pipe.estimator.trajectory
    ate = float("nan")
    if len(traj) >= 5:
        ate = io_stream.ate_rmse(
            [r["t"] for r in traj], [r["P"] for r in traj],
            seq.times, seq.P, align=False,
        )
    out = {
        "latency_fps": round(fps, 2),
        "latency_ms_per_frame": round(1000.0 * elapsed / n_timed, 3),
        "latency_ate_m": round(float(ate), 4) if np.isfinite(ate) else None,
        "latency_frames": n_timed,
        "latency_loop_closure": with_loop,
    }
    if with_loop and pipe.pose_graph is not None:
        g = pipe.pose_graph
        out["latency_kf"] = len(g.keyframes)
        out["latency_loops"] = len(g.loops)
        path = g.path()
        if len(path) >= 5:
            a = io_stream.ate_rmse([p[0] for p in path], [p[1] for p in path],
                                   seq.times, seq.P, align=False)
            if np.isfinite(a):
                out["latency_loop_ate_m"] = round(float(a), 4)
            av = io_stream.ate_rmse([k.t for k in g.keyframes],
                                    [k.P_vio for k in g.keyframes],
                                    seq.times, seq.P, align=False)
            if np.isfinite(av):
                out["latency_vio_kf_ate_m"] = round(float(av), 4)
    return out


def run_batched() -> dict:
    """Throughput mode: B independent synthetic sequences, the WHOLE
    per-frame pipeline (tracker + depth + backend) fused, vmapped over B
    and lax.scan-ned over frames — one dispatch for the entire timed run.

    Loop closure is priced HONESTLY: half the batch flies revisit
    trajectories so loops actually fire inside the timed region
    (find-connection PnP + PGO included), every one-time program is
    compiled during the UNTIMED warm segment (``compile_warmup``), and the
    headline is total timed frames / total wall time INCLUDING the final
    loop-closure drain — nothing is excluded; `seg_fps` host intervals are
    diagnostics only (pipeline-shifted).

    Per-sequence warmup runs the normal host pipeline until steady state;
    the scanned runner then takes over with zero host work per frame."""
    import jax
    import jax.numpy as jnp

    from vins_rgbd_fast_tpu.io import synthetic as syn
    from vins_rgbd_fast_tpu.io import stream as io_stream
    from vins_rgbd_fast_tpu.pipeline import VinsPipeline
    from vins_rgbd_fast_tpu.parallel import batched_pipeline as bp

    B = int(os.environ.get("BENCH_BATCH", "8"))
    # default keeps T = (frames - warmup) / n_seg = 18 frames/segment — the
    # scanned program compiles per static T, so tweaks to segment count
    # should preserve T to reuse the compile cache.  11 segments (1 warm +
    # 10 timed) amortize the loop-closure pipeline's drain tail the same
    # way a real mapping run does — the drain is a fixed ~4-stage cost
    # regardless of run length
    n_frames = int(os.environ.get("BENCH_FRAMES", "212"))
    warmup = 14  # fill window + init + settle
    with_loop = os.environ.get("BENCH_LOOP", "1") != "0"
    # 1 warm + (n_seg-1) timed segments
    n_seg = max(int(os.environ.get("BENCH_SEGMENTS", "11")), 2)
    # revisit sequences: out-and-back sideways sweeps that re-observe
    # earlier regions, so loop detection + find-connection + PGO run (and
    # are priced) inside the timed region — without them "loop closure on"
    # only prices extraction + retrieval scoring
    n_revisit = int(os.environ.get("BENCH_REVISIT", str(B // 2))) \
        if with_loop else 0
    # keyframe cadence: the reference ships keyframe_parallax=10 px on every
    # realsense rig (config/realsense/vio.yaml:72) — run the same default.
    # The revisit sweeps still admit a steady keyframe stream (~20/segment)
    # and fire real loops; BENCH_KF_PARALLAX=3 stress-tests a ~3x denser
    # pose-graph feed
    kf_parallax = float(os.environ.get("BENCH_KF_PARALLAX", "10.0"))
    # reference nodelet default SKIP_DIS=0: every estimator keyframe feeds
    # the pose graph
    skip_dis = float(os.environ.get("BENCH_SKIP_DIS", "0.0"))

    rig = _rig()
    seqs = [
        syn.make_revisit_trajectory(n_frames, rig, seed=200 + b, accel=1.5,
                                    axis=(0.0, 1.0, 0.0), cycles=2)
        if b < n_revisit else
        syn.make_trajectory(n_frames, rig, seed=100 + b, omega_scale=0.15,
                            acc_scale=0.3)
        for b in range(B)
    ]
    # the REVISIT sequences fly with IMU noise + a fast mid-outbound gyro
    # pulse about gravity (BENCH_DRIFT = pulse rad/s, 0 disables): the
    # pulse injects global-yaw error the window can NEVER observe, so VIO
    # carries real heading/position drift into the revisit — the error the
    # pose graph exists to cancel (pose_graph.cpp:410-581).  `loop_ate_m`
    # below must BEAT `loop_vio_ate_m`, not merely match it.  Clean
    # sequences keep exact IMU so `ate_m` still reports pure-VIO accuracy.
    drift = float(os.environ.get("BENCH_DRIFT", "0.2"))
    if drift > 0:
        seqs = [syn.corrupt_imu(s, seed=300 + b, gyr_noise=0.003,
                                gyr_pulse=drift, pulse_frac=(0.18, 0.3))
                if b < n_revisit else s
                for b, s in enumerate(seqs)]
    cfgs = [_cfg(rig, s, keyframe_parallax=kf_parallax) for s in seqs]

    # pre-render device-resident frames per sequence — vmapped chunks, a
    # handful of launches per sequence and ONE sync at the end (per-frame
    # rendering pays a tunnel RTT per frame: ~45 min of launch latency at
    # 8x212 frames on the remote-TPU bench host)
    _log(f"batched: rendering {B}x{n_frames}")
    seq_ts, seq_imgs, seq_deps = [], [], []
    for bi, s in enumerate(seqs):
        ts_b, im_b, dp_b = _render_batch(s, rig, seed=bi)
        seq_ts.append(ts_b)
        seq_imgs.append(im_b)
        seq_deps.append(dp_b)
    jax.block_until_ready((seq_imgs, seq_deps))
    _log("batched: rendered; warming up pipelines")

    # per-sequence warmup through the normal pipeline (per-frame slices
    # are dispatch-only)
    pipes = []
    for b in range(B):
        p = VinsPipeline(cfgs[b], dtype=jnp.float32, eager_outputs=False,
                         failure_check_interval=10 ** 9)
        p = _apply_envelope(p)
        for (t, a, w) in seqs[b].imu:
            p.push_imu(t, a, w)
        for k in range(warmup):
            p.push_image(float(seq_ts[b][k]), seq_imgs[b][k])
            p.push_depth(float(seq_ts[b][k]), seq_deps[b][k])
            p.spin_once()
        pipes.append(p)
    jax.block_until_ready(pipes[-1].estimator.state.x.P)
    _ = np.asarray(pipes[-1].estimator.state.x.P)  # readback handshake
    _log("batched: pipelines warm")

    trk_states, est_states = bp.stack_states(pipes)
    runner = bp.BatchedVioRunner(pipes[0].tcfg, pipes[0].cam,
                                 pipes[0].estimator.cfg)

    closer = None
    if with_loop:
        # loop closure rides the batched path: keyframes exported by the
        # scan feed per-sequence pose graphs between segments (the
        # reference's concurrent pose_graph nodelet) — its cost is INSIDE
        # the timed region.  Fixed pads + PGO floors keep every segment on
        # the SAME compiled programs; thresholds follow the loop tests
        # (recency 8 suits the short synthetic runs; reference default 50
        # stands for real maps).
        from vins_rgbd_fast_tpu.loop.pose_graph import PoseGraphConfig
        from vins_rgbd_fast_tpu.parallel.loop_closer import BatchedLoopCloser

        ecfg = pipes[0].estimator.cfg
        # pad floors must cover the RUN's maximum per-graph node/edge
        # counts — crossing a power-of-two mid-run recompiles the PGO
        # (tens of seconds through the remote-compile tunnel) and forks
        # the graphs onto diverging shapes
        pg_cfg = PoseGraphConfig(
            max_wp=ecfg.maxf,
            recency_exclusion=int(os.environ.get("BENCH_RECENCY", "8")),
            score_best=float(os.environ.get("BENCH_SCORE_BEST", "0.08")),
            score_second=float(os.environ.get("BENCH_SCORE_SECOND", "0.02")),
            pad_nodes_min=128, pad_edges_min=1024,
        )
        closer = BatchedLoopCloser(
            pipes[0].cam, pipes[0].vcfg.ric_matrix(),
            pipes[0].vcfg.tic_vector(), B, pg_cfg,
            skip_dis=skip_dis,
            # chunk pad sized to the keyframe flow at the reference
            # keyframe_parallax (≈20-25/segment): extraction compute scales
            # linearly with the pad
            k_pad=int(os.environ.get("BENCH_KPAD", "32")),
            seq_pad=32, db_capacity=128,
            pgo_period=float(os.environ.get("BENCH_PGO_PERIOD", "2.0")))

    # staged segments: segment 0 compiles+warms the scan program; later
    # segments (different data, same shapes) are timed; the LAST is the
    # reported steady state
    T = (n_frames - warmup) // n_seg
    batches = [bp.stage_frames_arrays(pipes, seq_ts, seq_imgs, seq_deps,
                                      warmup + k * T, warmup + (k + 1) * T)
               for k in range(n_seg)]
    jax.block_until_ready([b.imgs for b in batches])
    # free the whole-run render stacks: the staged batches hold the data
    # and only timestamps are needed below — holding both doubles the
    # bench's HBM footprint (8 seqs x 212 frames x 640x480 f32 img+depth
    # ~4 GB each way) and OOMs the chip
    frame_ts = [[float(t) for t in ts_b] for ts_b in seq_ts]
    del seq_imgs, seq_deps
    _log("batched: segments staged; warming scan")

    trk_states, est_states, outs_w = runner.run(trk_states, est_states,
                                                batches[0])
    jax.block_until_ready(est_states.x.P)
    if closer is not None:
        # warm segment: real consume (compiles extraction/scoring at the
        # production pads) + ghost replay compiling the non-empty-DB query,
        # padded appends, find-connection PnP, and the PGO — so ZERO
        # one-time compiles land in the timed region
        closer.consume(batches[0], outs_w)
        closer.compile_warmup(batches[0], outs_w)
    # honest counters: report only what the TIMED region processed
    kf_warm = closer.n_keyframes if closer is not None else 0
    loops_warm = closer.n_loops if closer is not None else 0

    threaded = os.environ.get("BENCH_THREAD", "1") != "0" and closer is not None
    overlap = os.environ.get("BENCH_OVERLAP", "1") != "0" and closer is not None
    seg_fps, seg_loop_ms = [], []
    loop_stats = None
    if threaded:
        # WORKER-THREAD steady state (the reference's second nodelet): the
        # scan loop only dispatches + enqueues — zero host syncs — while
        # the closer's gating readbacks, extraction fetches, verification
        # and PGO round trips all run on the worker, overlapped under the
        # in-flight scans.  HONEST headline: total timed frames / total
        # wall INCLUDING the final worker drain — nothing is excluded.
        from vins_rgbd_fast_tpu.parallel.loop_closer import ThreadedLoopCloser

        tc = ThreadedLoopCloser(closer)
        _log("batched: timing (threaded closer)")
        t_all0 = time.perf_counter()
        t_seg = t_all0
        for k in range(1, n_seg):
            trk_states, est_states, outs = runner.run(trk_states, est_states,
                                                      batches[k])
            tc.submit(batches[k], outs)
            now = time.perf_counter()
            seg_fps.append(T * B / (now - t_seg))
            t_seg = now
        jax.block_until_ready(est_states.x.P)  # all scans complete
        t_drain = time.perf_counter()
        stats_acc = tc.drain()  # worker tail beyond the last scan
        elapsed_all = time.perf_counter() - t_all0
        loop_ms = 1000.0 * (time.perf_counter() - t_drain)  # exposed tail
        loop_stats = stats_acc[-1] if stats_acc else None
        n_timed = T * B * (n_seg - 1)
        fps = n_timed / elapsed_all  # drain-inclusive aggregate
        fps_all = fps
        # host-side enqueue intervals — diagnostics only (dispatch is
        # asynchronous; the device pipeline runs behind)
        seg_fps = seg_fps[1:]
        _log(f"batched: timed {n_timed} frames, {fps:.1f} fps "
             f"(drain {loop_ms:.0f} ms)")
    elif overlap:
        # 5-stage pipelined steady state (the reference's concurrent
        # pose_graph nodelet): the gating pack for scan k is enqueued
        # right behind scan k and read back only AFTER scan k+1 is
        # dispatched — so in the steady state no host fetch waits on an
        # incomplete device op and every loop-closure dispatch queues
        # behind an in-flight scan; the device never idles.
        #
        # HONEST headline: total timed frames / total wall INCLUDING the
        # final drain (the last segments' loop-closure tail) — nothing is
        # excluded.  Host-loop intervals are device-pipeline-shifted, so
        # `seg_fps` is a diagnostic, not the metric.
        stats_acc = []
        t_all0 = time.perf_counter()
        t_seg = t_all0
        for k in range(1, n_seg):
            trk_states, est_states, outs = runner.run(trk_states, est_states,
                                                      batches[k])
            tok = closer.pack_dispatch(batches[k], outs)
            st = closer.pipeline_advance_packed(tok)
            if st is not None and st.get("n_keyframes"):
                stats_acc.append(st)
            now = time.perf_counter()
            seg_fps.append(T * B / (now - t_seg))
            t_seg = now
        # drain: the in-flight pipeline stages (exposed tail)
        t_drain = time.perf_counter()
        stats_acc.extend(s for s in closer.pipeline_drain()
                         if s.get("n_keyframes"))
        elapsed_all = time.perf_counter() - t_all0
        loop_ms = 1000.0 * (time.perf_counter() - t_drain)  # exposed tail
        loop_stats = stats_acc[-1] if stats_acc else None
        n_timed = T * B * (n_seg - 1)
        fps = n_timed / elapsed_all  # drain-inclusive aggregate
        fps_all = fps
        seg_fps = seg_fps[1:]  # first host interval is pure dispatch
    else:
        for k in range(1, n_seg):
            t0 = time.perf_counter()
            trk_states, est_states, outs = runner.run(trk_states, est_states,
                                                      batches[k])
            jax.block_until_ready(est_states.x.P)
            t_scan = time.perf_counter()
            if closer is not None:
                loop_stats = closer.consume(batches[k], outs)
            elapsed = time.perf_counter() - t0
            seg_fps.append(T * B / elapsed if elapsed > 0 else 0.0)
            seg_loop_ms.append(1000.0 * (time.perf_counter() - t_scan))
        fps = seg_fps[-1]
        fps_all = None
        loop_ms = seg_loop_ms[-1] if seg_loop_ms else 0.0
        n_timed = T * B

    # accuracy: VIO ATE of every CLEAN-IMU sequence over the last timed
    # span (mean/max); the drift-injected revisit sequences are assessed
    # below as corrected-vs-uncorrected (their raw VIO error is the
    # INTENDED drift, not an accuracy defect)
    host = jax.device_get(outs)
    ates = []
    clean = range(n_revisit if drift > 0 else 0, B)
    for b in clean:
        ts = [frame_ts[b][k]
              for k in range(warmup + (n_seg - 1) * T, warmup + n_seg * T)]
        Pb = [np.asarray(host.P[i, b]) for i in range(T)]
        a = io_stream.ate_rmse(ts, Pb, seqs[b].times, seqs[b].P, align=False)
        if np.isfinite(a):
            ates.append(float(a))
    out = {
        "value": round(fps, 2),
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "batched_sequences": B,
        "ate_m": round(float(np.mean(ates)), 4) if ates else None,
        "ate_max_m": round(float(np.max(ates)), 4) if ates else None,
        "frames": n_timed,
        "loop_closure": bool(closer is not None),
    }

    if loop_stats is not None:
        # honest counters: only what the TIMED region processed (the warm
        # segment's consume() is excluded from the timing, so from these)
        out["loop_kf"] = int(closer.n_keyframes - kf_warm)
        out["loop_ms"] = round(loop_ms, 1)
        out["loops_found"] = int(closer.n_loops - loops_warm)
        out["revisit_sequences"] = n_revisit
        out["seg_fps"] = [round(f, 1) for f in seg_fps]
        out["loop_phase_ms"] = {k[3:]: v for k, v in loop_stats.items()
                                if k.startswith("ms_")}
        # loop-corrected keyframe trajectory accuracy vs ground truth on
        # the revisit sequences (the VIO `ate_m` above never sees the
        # pose-graph corrections)
        lates, vlates = [], []
        for b in range(n_revisit):
            g = closer.graphs[b]
            path = g.path()
            if len(path) >= 5:
                a = io_stream.ate_rmse(
                    [p[0] for p in path], [p[1] for p in path],
                    seqs[b].times, seqs[b].P, align=False)
                if np.isfinite(a):
                    lates.append(float(a))
                # uncorrected keyframe poses at the same stamps, for
                # context (on a near-drift-free synthetic scene the loop
                # corrections can only add PnP measurement noise)
                av = io_stream.ate_rmse(
                    [k.t for k in g.keyframes],
                    [k.P_vio for k in g.keyframes],
                    seqs[b].times, seqs[b].P, align=False)
                if np.isfinite(av):
                    vlates.append(float(av))
        if lates:
            out["loop_ate_m"] = round(float(np.mean(lates)), 4)
        if vlates:
            out["loop_vio_ate_m"] = round(float(np.mean(vlates)), 4)
    return out


def run_recovery() -> dict:
    """Failure-recovery cost (the reference reboots in-line on
    failureDetection, estimator.cpp:345-353,1113-1159): latency mode with
    per-frame failure checks, a burst of black frames injected mid-run, and
    the reboot measured — frames and wall time from the triggered reset
    until the estimator is back in NON_LINEAR."""
    import jax
    import jax.numpy as jnp

    from vins_rgbd_fast_tpu.io import synthetic as syn
    from vins_rgbd_fast_tpu.pipeline import VinsPipeline

    n_frames = int(os.environ.get("BENCH_FRAMES", "80"))
    inject_at, inject_n = 40, 3
    rig = _rig()
    seq = syn.make_trajectory(n_frames, rig, seed=7, omega_scale=0.15,
                              acc_scale=0.3)
    cfg = _cfg(rig, seq)
    ts_all, imgs_d, deps_d = syn.render_sequence_batch(seq, rig)
    jax.block_until_ready((imgs_d, deps_d))
    frames = [(float(ts_all[k]), imgs_d[k], deps_d[k])
              for k in range(len(ts_all))]
    black = jnp.zeros_like(frames[0][1])

    pipe = VinsPipeline(cfg, dtype=jnp.float32, eager_outputs=False,
                        failure_check_interval=1, fused_steady_state=True)
    pipe = _apply_envelope(pipe)
    for (t, a, w) in seq.imu:
        pipe.push_imu(t, a, w)

    est = pipe.estimator
    steady_t, steady_n = 0.0, 0
    fail_seen_at = None
    recover_t0 = recover_ms = None
    recover_frames = 0
    for k, (t, img, depth) in enumerate(frames):
        use_img = black if inject_at <= k < inject_at + inject_n else img
        t0 = time.perf_counter()
        pipe.push_image(t, use_img)
        pipe.push_depth(t, depth)
        pipe.spin_once()
        jax.block_until_ready(est.state.x.P)
        dt = time.perf_counter() - t0
        if fail_seen_at is None:
            if k >= 16 and k < inject_at and est.solver_flag == est.NON_LINEAR:
                steady_t += dt
                steady_n += 1
            if k >= inject_at and est.solver_flag != est.NON_LINEAR:
                fail_seen_at = k
                recover_t0 = time.perf_counter() - dt
        elif recover_ms is None:
            recover_frames += 1
            if est.solver_flag == est.NON_LINEAR:
                recover_ms = 1000.0 * (time.perf_counter() - recover_t0)
    return {
        "recovery_steady_fps": round(steady_n / steady_t, 2) if steady_t else None,
        "recovery_triggered": fail_seen_at is not None,
        "recovery_frames": recover_frames if recover_ms is not None else None,
        "recovery_ms": round(recover_ms, 1) if recover_ms is not None else None,
    }


def main():
    jax = _setup_jax()
    mode = os.environ.get("BENCH_MODE", "both")
    result = {
        "metric": "vio_fps_per_chip_640x480_rgbd_batched",
        "unit": "frames/s (aggregate)",
        "backend": jax.default_backend(),
    }
    if mode in ("both", "batched"):
        result.update(run_batched())
    if mode in ("both", "latency"):
        result.update(run_latency())
    if mode == "recovery":
        result.update(run_recovery())
        result["metric"] = "vio_failure_recovery"
    if mode == "latency":
        result["metric"] = "vio_fps_640x480_rgbd_latency"
        result["unit"] = "frames/s (single sequence)"
        result["value"] = result["latency_fps"]
        result["vs_baseline"] = round(result["latency_fps"] / BASELINE_FPS, 3)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
