"""Batched scan-runner tests: the fused (tracker+backend) per-frame step
vmapped over sequences and lax.scan-ned over frames must track the same
trajectories the per-frame host pipeline does."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vins_rgbd_fast_tpu.config import VinsConfig
from vins_rgbd_fast_tpu.io import synthetic as syn
from vins_rgbd_fast_tpu.io import stream as io_stream
from vins_rgbd_fast_tpu.pipeline import VinsPipeline
from vins_rgbd_fast_tpu.parallel import batched_pipeline as bp
from vins_rgbd_fast_tpu.utils import quaternion as quat

W, H = 320, 240
RIG = syn.SyntheticRig(width=W, height=H, fx=230.0, fy=230.0, cx=160.0,
                       cy=120.0, imu_rate=200.0, frame_rate=20.0)


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
        keyframe_parallax=10.0,
    )


def test_gyro_relative_R_matches_host():
    """Device gyro integration == host _predict_relative_R on the same
    samples (zero bias)."""
    rng = np.random.default_rng(0)
    n = 10
    dts = np.zeros(16)
    gyr = np.zeros((17, 3))
    dts[:n] = 0.005
    gyr[1:n + 1] = rng.normal(0, 0.4, (n, 3))
    qic = quat.q_identity(jnp.float64)
    R_dev = np.asarray(bp.gyro_relative_R(
        jnp.asarray(dts), jnp.asarray(gyr), jnp.zeros(3), qic))
    # host twin (pipeline.py:_predict_relative_R semantics, ric=I)
    R = np.eye(3)
    for k in range(n):
        th = gyr[k + 1] * dts[k]
        a = np.linalg.norm(th)
        kv = th / a
        K = np.array([[0, -kv[2], kv[1]], [kv[2], 0, -kv[0]], [-kv[1], kv[0], 0]])
        R = R @ (np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * (K @ K))
    R_host = R.T  # camera-frame: ric.T @ R.T @ ric with ric = I
    np.testing.assert_allclose(R_dev, R_host, atol=1e-9)


@pytest.mark.slow
def test_batched_scan_runner_tracks_ground_truth():
    """Two distinct sequences through warmup (host pipeline) then the
    fused scanned runner; both trajectories must stay near ground truth."""
    B = 2
    n_frames = 22
    warmup = 14
    seqs = [syn.make_trajectory(n_frames, RIG, seed=31 + b, omega_scale=0.15,
                                acc_scale=0.3) for b in range(B)]
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
    batch = bp.stage_frames(pipes, frames, warmup, n_frames)
    trk, st, outs = runner.run(trk, st, batch)

    assert bool(jnp.isfinite(outs.cost).all())
    host = jax.device_get(outs)
    T = n_frames - warmup
    for b in range(B):
        ts = [frames[b][k][0] for k in range(warmup, n_frames)]
        P = [np.asarray(host.P[i, b]) for i in range(T)]
        ate = io_stream.ate_rmse(ts, P, seqs[b].times, seqs[b].P, align=False)
        travelled = np.sum(np.linalg.norm(np.diff(seqs[b].P, axis=0), axis=1))
        assert np.isfinite(ate)
        assert ate < max(0.05 * travelled, 0.08), (b, ate, travelled)
    # sequences must actually differ (no accidental broadcast)
    assert not np.allclose(host.P[:, 0], host.P[:, 1], atol=1e-3)
