"""shard_map execution of the full fused BatchedVioRunner: each device
runs its sequence slice as a complete local program (the real multi-chip
path — pallas_call has no SPMD rule, so plain jit sharding propagation
cannot partition the kernel-bearing scan).  Must equal the vmap path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vins_rgbd_fast_tpu.config import VinsConfig
from vins_rgbd_fast_tpu.io import synthetic as syn
from vins_rgbd_fast_tpu.pipeline import VinsPipeline
from vins_rgbd_fast_tpu.parallel import batched_pipeline as bp
from vins_rgbd_fast_tpu.parallel import throughput as tp

W, H = 160, 120
RIG = syn.SyntheticRig(width=W, height=H, fx=115.0, fy=115.0, cx=80.0,
                       cy=60.0, imu_rate=200.0, frame_rate=20.0)


@pytest.mark.slow
def test_sharded_scan_equals_vmap_scan():
    B = 8
    n_warm, n_scan = 14, 4
    n_frames = n_warm + n_scan
    seqs = [syn.make_trajectory(n_frames, RIG, seed=5, omega_scale=0.12,
                                acc_scale=0.25, diverge_seed=b,
                                diverge_after=n_warm - 1) for b in range(B)]
    cfg = VinsConfig(
        imu=True, static_init=True, image_width=W, image_height=H,
        intrinsics=(RIG.fx, RIG.fy, RIG.cx, RIG.cy),
        ric=tuple(seqs[0].ric.ravel().tolist()),
        tic=tuple(seqs[0].tic.tolist()),
        max_cnt=40, max_features=64, max_imu_per_frame=16,
        min_dist=12, num_grid_rows=3, num_grid_cols=4,
        frontend_freq=0.0, freq=0.0, fix_depth=True, depth_max_dist=12.0,
        acc_n=0.1, gyr_n=0.01, acc_w=1e-4, gyr_w=1e-5,
    )
    # warm ONE pipeline on the shared prefix, broadcast to lanes
    t_cut = float(seqs[0].times[n_warm - 1]) + 1e-9
    pipe = VinsPipeline(cfg, dtype=jnp.float32, eager_outputs=False,
                        failure_check_interval=10 ** 9)
    for (t, a, w) in seqs[0].imu:
        if t <= t_cut:
            pipe.push_imu(t, a, w)
    for k in range(n_warm):
        t, img, depth = next(
            x for i, x in enumerate(syn.frames(seqs[0], RIG)) if i == k)
        pipe.push_image(t, np.asarray(img))
        pipe.push_depth(t, np.asarray(depth))
        pipe.spin_once()
    assert pipe.estimator.solver_flag == pipe.estimator.NON_LINEAR

    bc = lambda tree: jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), tree)
    trk0 = bc(pipe.tracker_state)
    st0 = bc(pipe.estimator.state)

    lane_pipes = []
    for b in range(B):
        p = VinsPipeline(cfg, dtype=jnp.float32, eager_outputs=False,
                         failure_check_interval=10 ** 9)
        for (t, a, w) in seqs[b].imu:
            p.push_imu(t, a, w)
        lane_pipes.append(p)
    frame_lists = []
    for b in range(B):
        fl = list(syn.frames(seqs[b], RIG))
        frame_lists.append(fl)
    batch = bp.stage_frames(lane_pipes, frame_lists, n_warm, n_frames)

    mesh = tp.make_mesh(8)
    runner = bp.BatchedVioRunner(pipe.tcfg, pipe.cam, pipe.estimator.cfg,
                                 mesh=mesh)
    # vmap path (jit sharding propagation)
    _, _, outs_v = runner.run(trk0, st0, batch)
    # shard_map path
    trk_s = runner.put_states(trk0)
    st_s = runner.put_states(st0)
    batch_s = runner.put_batch(batch)
    _, _, outs_s = runner.run_sharded(trk_s, st_s, batch_s)

    assert np.asarray(outs_s.P).shape == np.asarray(outs_v.P).shape
    np.testing.assert_allclose(np.asarray(outs_s.P), np.asarray(outs_v.P),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(outs_s.cost),
                               np.asarray(outs_v.cost), rtol=5e-3)
    assert bool((np.asarray(outs_s.is_keyframe)
                 == np.asarray(outs_v.is_keyframe)).all())
