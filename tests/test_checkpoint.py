"""Checkpoint/resume: a mid-stream save + load must continue EXACTLY the
uninterrupted run (same device state round-tripped bit-for-bit, same host
scalars), so the resumed trajectory equals the original's.

The reference persists only the pose graph (pose_graph.cpp:849-1044); the
rebuild checkpoints the whole pipeline (io/checkpoint.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vins_rgbd_fast_tpu.config import VinsConfig
from vins_rgbd_fast_tpu.io import synthetic as syn
from vins_rgbd_fast_tpu.io import checkpoint as ckpt
from vins_rgbd_fast_tpu.pipeline import VinsPipeline

W, H = 320, 240
RIG = syn.SyntheticRig(width=W, height=H, fx=230.0, fy=230.0, cx=160.0,
                       cy=120.0, imu_rate=200.0, frame_rate=20.0)


def _cfg(seq):
    return VinsConfig(
        imu=True, static_init=True,
        image_width=W, image_height=H,
        intrinsics=(RIG.fx, RIG.fy, RIG.cx, RIG.cy), distortion=(0, 0, 0, 0),
        ric=tuple(seq.ric.ravel().tolist()), tic=tuple(seq.tic.tolist()),
        max_cnt=60, max_features=96, max_imu_per_frame=16,
        min_dist=16, num_grid_rows=4, num_grid_cols=5,
        frontend_freq=0.0, freq=0.0,
        fix_depth=True, depth_max_dist=12.0,
        acc_n=0.1, gyr_n=0.01, acc_w=1e-4, gyr_w=1e-5,
    )


@pytest.mark.slow
def test_checkpoint_resume_matches_uninterrupted(tmp_path):
    n = 26
    cut = 17  # checkpoint after this many frames (well past init)
    seq = syn.make_trajectory(n, RIG, seed=31, omega_scale=0.15,
                              acc_scale=0.3)
    frames = list(syn.frames(seq, RIG))
    cfg = _cfg(seq)

    def feed(pipe, k0, k1, outs):
        for (t, img, depth) in frames[k0:k1]:
            pipe.push_image(t, np.asarray(img))
            pipe.push_depth(t, np.asarray(depth))
            o = pipe.spin_once()
            if o is not None:
                outs.append((float(t), np.asarray(o["P"]),
                             np.asarray(o["Q"])))

    # uninterrupted reference run
    pipe = VinsPipeline(cfg, dtype=jnp.float32, eager_outputs=True,
                        failure_check_interval=10 ** 9)
    for (t, a, w) in seq.imu:
        pipe.push_imu(t, a, w)
    ref_tail: list = []
    feed(pipe, 0, cut, [])
    assert pipe.estimator.solver_flag == pipe.estimator.NON_LINEAR

    path = str(tmp_path / "vins.ckpt.npz")
    ckpt.save_pipeline(pipe, path)
    feed(pipe, cut, n, ref_tail)
    assert len(ref_tail) == n - cut

    # resume from the checkpoint in a FRESH pipeline: no IMU re-push (the
    # checkpoint carries the raw buffers), only the remaining frames
    pipe2 = ckpt.load_pipeline(cfg, path, dtype=jnp.float32,
                               eager_outputs=True,
                               failure_check_interval=10 ** 9)
    assert pipe2.estimator.solver_flag == pipe2.estimator.NON_LINEAR
    res_tail: list = []
    feed(pipe2, cut, n, res_tail)

    assert len(res_tail) == len(ref_tail)
    for (t_a, P_a, Q_a), (t_b, P_b, Q_b) in zip(ref_tail, res_tail):
        assert t_a == t_b
        np.testing.assert_allclose(P_a, P_b, atol=1e-6)
        np.testing.assert_allclose(Q_a, Q_b, atol=1e-6)

    # config mismatch must be rejected, not silently misload
    import dataclasses as dc
    bad = dc.replace(cfg, max_features=64)
    with pytest.raises(ValueError, match="config mismatch"):
        ckpt.load_pipeline(bad, path, dtype=jnp.float32,
                           eager_outputs=True,
                           failure_check_interval=10 ** 9)
