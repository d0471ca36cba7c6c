"""Crown integration test: rendered RGB-D frames + IMU through the FULL
pipeline (tracker -> estimator), trajectory compared to ground truth."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vins_rgbd_fast_tpu.config import VinsConfig
from vins_rgbd_fast_tpu.io import synthetic as syn
from vins_rgbd_fast_tpu.io import stream as io_stream
from vins_rgbd_fast_tpu.pipeline import VinsPipeline

W, H = 320, 240
RIG = syn.SyntheticRig(width=W, height=H, fx=230.0, fy=230.0, cx=160.0, cy=120.0,
                       imu_rate=200.0, frame_rate=20.0)


def _make_cfg(imu=True):
    return VinsConfig(
        imu=imu, static_init=True, estimate_td=False, rolling_shutter=False,
        image_width=W, image_height=H,
        intrinsics=(RIG.fx, RIG.fy, RIG.cx, RIG.cy), distortion=(0, 0, 0, 0),
        max_cnt=60, max_features=96, max_imu_per_frame=16,
        min_dist=16, num_grid_rows=4, num_grid_cols=5,
        frontend_freq=0.0, freq=0.0,  # no rate gating in offline test
        fix_depth=True, depth_min_dist=0.3, depth_max_dist=12.0,
        acc_n=0.1, gyr_n=0.01, acc_w=1e-4, gyr_w=1e-5,
        keyframe_parallax=10.0,
    )


@pytest.mark.slow
def test_full_pipeline_synthetic_sequence():
    seq = syn.make_trajectory(24, RIG, seed=3, omega_scale=0.15, acc_scale=0.3)
    cfg = _make_cfg()
    # wire the synthetic rig extrinsics into the config
    cfg = cfg.__class__(**{**cfg.__dict__,
                           "ric": tuple(seq.ric.ravel().tolist()),
                           "tic": tuple(seq.tic.tolist())})
    pipe = VinsPipeline(cfg, dtype=jnp.float32)

    for (t, a, w) in seq.imu:
        pipe.push_imu(t, a, w)
    for (t, img, depth) in syn.frames(seq, RIG):
        pipe.push_image(t, np.asarray(img))
        pipe.push_depth(t, np.asarray(depth))

    traj = pipe.run()
    assert len(traj) >= 12, f"only {len(traj)} odometry outputs"

    est_t = [r["t"] for r in traj]
    est_P = [r["P"] for r in traj]
    ate = io_stream.ate_rmse(est_t, est_P, seq.times, seq.P, align=False)
    travelled = np.sum(np.linalg.norm(np.diff(seq.P, axis=0), axis=1))
    print(f"full-pipeline ATE: {ate:.4f} m over {travelled:.2f} m travelled")
    assert np.isfinite(ate)
    assert ate < max(0.03 * travelled, 0.06), (ate, travelled)


@pytest.mark.slow
def test_live_imu_jitter_holds_frame_instead_of_dropping():
    """Live-ordering: images can arrive AHEAD of their IMU coverage (sensor
    jitter).  The pipeline must HOLD the paired frame until IMU for t+td is
    available — the reference blocks on IMUAvailable
    (estimator_nodelet.cpp:462-509) — never silently drop it."""
    n = 20
    seq = syn.make_trajectory(n, RIG, seed=3, omega_scale=0.15, acc_scale=0.3)
    cfg = _make_cfg()
    cfg = cfg.__class__(**{**cfg.__dict__,
                           "ric": tuple(seq.ric.ravel().tolist()),
                           "tic": tuple(seq.tic.tolist())})
    pipe = VinsPipeline(cfg, dtype=jnp.float32)

    frames = list(syn.frames(seq, RIG))
    # interleave: push each frame, then spin BEFORE its IMU has arrived —
    # the frame must be held, then processed once IMU lands
    imu = list(seq.imu)
    imu_i = 0
    outs = []
    for k, (t, img, depth) in enumerate(frames):
        pipe.push_image(t, np.asarray(img))
        pipe.push_depth(t, np.asarray(depth))
        # spin with IMU lagging a full frame behind: frame k is paired but
        # has no IMU coverage yet
        out = pipe.spin_once()
        if out is not None:
            outs.append(out)
        # now deliver IMU up to just past this frame's stamp (+td margin)
        while imu_i < len(imu) and imu[imu_i][0] <= t + 0.5 / RIG.frame_rate:
            ti, a, w = imu[imu_i]
            pipe.push_imu(ti, a, w)
            imu_i += 1
        out = pipe.spin_once()
        if out is not None:
            outs.append(out)
    # every frame except at most the trailing one must have been PROCESSED
    # (early init frames return None but still consume the frame; a dropped
    # frame would leave a gap in the processed count)
    assert pipe.estimator._step >= n - 1, (
        f"{pipe.estimator._step} frames processed of {n}: frames lost")
