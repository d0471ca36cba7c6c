"""Loop closure on the batched throughput path: scan segments feed
per-sequence pose graphs via BatchedLoopCloser (the reference runs
pose_graph concurrently with the estimator, pose_graph_nodelet.cpp:449-566).

Asserts (a) the revisit sequence closes loops through the batched path,
(b) the batched closer is EQUIVALENT to sequential PoseGraph.add_keyframe
on the same keyframes (segment-deferred appends are exact while segments
are shorter than the recency exclusion)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vins_rgbd_fast_tpu.config import VinsConfig
from vins_rgbd_fast_tpu.io import synthetic as syn
from vins_rgbd_fast_tpu.loop.pose_graph import PoseGraph, PoseGraphConfig
from vins_rgbd_fast_tpu.pipeline import VinsPipeline
from vins_rgbd_fast_tpu.parallel import batched_pipeline as bp
from vins_rgbd_fast_tpu.parallel.loop_closer import BatchedLoopCloser

from test_pipeline_loop import _revisit_trajectory, RIG, W, H


def _make_cfg(seq):
    return VinsConfig(
        imu=True, static_init=True,
        image_width=W, image_height=H,
        intrinsics=(RIG.fx, RIG.fy, RIG.cx, RIG.cy), distortion=(0, 0, 0, 0),
        ric=tuple(seq.ric.ravel().tolist()), tic=tuple(seq.tic.tolist()),
        max_cnt=60, max_features=96, max_imu_per_frame=16,
        min_dist=16, num_grid_rows=4, num_grid_cols=5,
        frontend_freq=0.0, freq=0.0,
        fix_depth=True, depth_min_dist=0.3, depth_max_dist=12.0,
        acc_n=0.1, gyr_n=0.01, acc_w=1e-4, gyr_w=1e-5,
        keyframe_parallax=0.8,  # slow trajectory: keep most frames keyframes
    )


@pytest.mark.slow
def test_batched_loop_closure_equivalent_to_sequential():
    B = 2
    n_frames = 40
    warmup = 14
    seg_len = 6  # < recency_exclusion: deferred appends are exact
    seqs = [_revisit_trajectory(n_frames),
            syn.make_trajectory(n_frames, RIG, seed=55, omega_scale=0.15,
                                acc_scale=0.3)]
    frames = [list(syn.frames(s, RIG)) for s in seqs]

    pipes = []
    for b in range(B):
        p = VinsPipeline(_make_cfg(seqs[b]), dtype=jnp.float32,
                         eager_outputs=False, failure_check_interval=10 ** 9)
        for (t, a, w) in seqs[b].imu:
            p.push_imu(t, a, w)
        for (t, img, depth) in frames[b][:warmup]:
            p.push_image(t, np.asarray(img))
            p.push_depth(t, np.asarray(depth))
            p.spin_once()
        pipes.append(p)
    assert all(p.estimator.solver_flag == p.estimator.NON_LINEAR for p in pipes)

    trk, st = bp.stack_states(pipes)
    runner = bp.BatchedVioRunner(pipes[0].tcfg, pipes[0].cam,
                                 pipes[0].estimator.cfg)
    pg_cfg = PoseGraphConfig(
        max_wp=pipes[0].estimator.cfg.maxf, max_kp=128,
        recency_exclusion=8, min_loop_num=12,
        score_best=0.10, score_second=0.03)
    closer = BatchedLoopCloser(
        pipes[0].cam, pipes[0].vcfg.ric_matrix(),
        pipes[0].vcfg.tic_vector(), B, pg_cfg)

    # drive segments in the bench's PIPELINED pattern: segment k+1's scan
    # is dispatched between consume_dispatch(k) and consume_finish(k) (the
    # pose graph runs concurrently with the estimator, as the reference's
    # two nodelets do) — results must be identical to serial consume()
    segments = []
    pend = None
    dev_segments = []
    for s0 in range(warmup, n_frames, seg_len):
        s1 = min(s0 + seg_len, n_frames)
        batch = bp.stage_frames(pipes, frames, s0, s1)
        trk, st, outs = runner.run(trk, st, batch)
        if pend is not None:
            closer.consume_finish(pend)
        pend = closer.consume_dispatch(batch, outs)
        segments.append((batch, jax.device_get(outs), None))
        dev_segments.append((batch, outs))
    closer.consume_finish(pend)
    closer.flush()

    # (a) the revisit sequence must close loops through the batched path
    g0 = closer.graphs[0]
    assert len(g0.keyframes) >= 10
    assert len(g0.loops) >= 1, "revisit sequence found no loops"
    for lp in g0.loops:
        assert np.linalg.norm(lp["rel_t"]) < 3.0
    for (t, P, Q) in g0.path():
        assert np.isfinite(P).all() and np.isfinite(Q).all()
    # drift correction must engage after a loop
    assert np.isfinite(g0.t_drift).all()

    # (b) equivalence: feed the SAME keyframes sequentially through
    # PoseGraph.add_keyframe (per-keyframe extraction + immediate appends)
    ref = PoseGraph(pg_cfg, pipes[0].cam,
                    pipes[0].vcfg.ric_matrix(), pipes[0].vcfg.tic_vector())
    for (batch, host, _) in segments:
        T = host.P.shape[0]
        for k in range(T):
            if not bool(host.is_keyframe[k, 0]):
                continue
            ref.add_keyframe(
                np.asarray(jax.device_get(batch.imgs)[k, 0]),
                float(np.asarray(jax.device_get(batch.ts))[k, 0]),
                np.asarray(host.P[k, 0]), np.asarray(host.Q[k, 0]),
                np.asarray(host.wp_world[k, 0]), np.asarray(host.wp_uv[k, 0]),
                np.asarray(host.wp_norm[k, 0]), np.asarray(host.wp_valid[k, 0]),
                # same inputs as the batched path: it samples keypoint depth
                # for the depth-aided loop PnP, so the sequential reference
                # must too or marginal loops diverge
                depth=np.asarray(jax.device_get(batch.depths)[k, 0]))
    assert len(ref.keyframes) == len(g0.keyframes)
    assert [(lp["cur"], lp["old"]) for lp in ref.loops] == \
        [(lp["cur"], lp["old"]) for lp in g0.loops]
    for lp_ref, lp_b in zip(ref.loops, g0.loops):
        # the batched closer's device-resident verification runs PnP in
        # f32 (production dtype); the sequential path under the test
        # harness's x64 runs f64 — identical geometry, float rounding only
        np.testing.assert_allclose(lp_ref["rel_t"], lp_b["rel_t"], atol=5e-5)

    # (c) the bench's 5-stage packed pipeline (pack_dispatch right after
    # each scan, gating readback one segment later, drain at the end) must
    # find the SAME keyframes and loops as the dispatch/finish split above
    closer2 = BatchedLoopCloser(
        pipes[0].cam, pipes[0].vcfg.ric_matrix(),
        pipes[0].vcfg.tic_vector(), B, pg_cfg)
    closer2._extract = closer._extract  # share the compiled extractor
    for (batch, outs) in dev_segments:
        closer2.pipeline_advance_packed(closer2.pack_dispatch(batch, outs))
    closer2.pipeline_drain()
    g2 = closer2.graphs[0]
    assert len(g2.keyframes) == len(g0.keyframes)
    assert [(lp["cur"], lp["old"]) for lp in g2.loops] == \
        [(lp["cur"], lp["old"]) for lp in g0.loops]
    for lp_a, lp_b in zip(g0.loops, g2.loops):
        np.testing.assert_allclose(lp_a["rel_t"], lp_b["rel_t"], atol=5e-5)
