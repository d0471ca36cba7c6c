"""Fused steady-state latency path: one dispatch per frame must track the
unfused three-dispatch pipeline (same programs, same math — the fused jit
only removes host boundaries; gyro prediction moves on-device)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vins_rgbd_fast_tpu.config import VinsConfig
from vins_rgbd_fast_tpu.io import synthetic as syn
from vins_rgbd_fast_tpu.io import stream as io_stream
from vins_rgbd_fast_tpu.pipeline import VinsPipeline

W, H = 320, 240
RIG = syn.SyntheticRig(width=W, height=H, fx=230.0, fy=230.0, cx=160.0,
                       cy=120.0, imu_rate=200.0, frame_rate=20.0)


def _make_cfg(seq):
    return VinsConfig(
        imu=True, static_init=True, estimate_td=False, rolling_shutter=False,
        image_width=W, image_height=H,
        intrinsics=(RIG.fx, RIG.fy, RIG.cx, RIG.cy), distortion=(0, 0, 0, 0),
        max_cnt=60, max_features=96, max_imu_per_frame=16,
        min_dist=16, num_grid_rows=4, num_grid_cols=5,
        frontend_freq=0.0, freq=0.0,
        fix_depth=True, depth_min_dist=0.3, depth_max_dist=12.0,
        acc_n=0.1, gyr_n=0.01, acc_w=1e-4, gyr_w=1e-5,
        keyframe_parallax=10.0,
        ric=tuple(seq.ric.ravel().tolist()), tic=tuple(seq.tic.tolist()),
    )


def _run(cfg, seq, fused):
    pipe = VinsPipeline(cfg, dtype=jnp.float32, fused_steady_state=fused)
    for (t, a, w) in seq.imu:
        pipe.push_imu(t, a, w)
    for (t, img, depth) in syn.frames(seq, RIG):
        pipe.push_image(t, np.asarray(img))
        pipe.push_depth(t, np.asarray(depth))
    traj = pipe.run()
    return pipe, traj


@pytest.mark.slow
def test_fused_matches_unfused_accuracy():
    seq = syn.make_trajectory(24, RIG, seed=3, omega_scale=0.15, acc_scale=0.3)
    cfg = _make_cfg(seq)
    _, traj_f = _run(cfg, seq, fused=True)
    assert len(traj_f) >= 12, f"only {len(traj_f)} odometry outputs"
    ate_f = io_stream.ate_rmse(
        [r["t"] for r in traj_f], [r["P"] for r in traj_f],
        seq.times, seq.P, align=False)
    travelled = np.sum(np.linalg.norm(np.diff(seq.P, axis=0), axis=1))
    print(f"fused-pipeline ATE: {ate_f:.4f} m over {travelled:.2f} m")
    # same accuracy envelope as the unfused crown test
    assert np.isfinite(ate_f)
    assert ate_f < max(0.03 * travelled, 0.06), (ate_f, travelled)

    # and the steady-state frames really took the fused path
    _, traj_u = _run(cfg, seq, fused=False)
    assert len(traj_f) == len(traj_u)
    # trajectories agree closely frame-by-frame (gyro prediction moves from
    # a host float64 loop to the on-device f32 quaternion tree — only the
    # LK initial guess differs, so poses track within mm on this scene)
    dP = np.max(np.linalg.norm(
        np.stack([r["P"] for r in traj_f]) - np.stack([r["P"] for r in traj_u]),
        axis=1))
    assert dP < 0.02, dP


@pytest.mark.slow
def test_fused_failure_reset():
    """Failure detection still works through the fused path (host check is
    amortized at failure_check_interval=1 here)."""
    seq = syn.make_trajectory(20, RIG, seed=5, omega_scale=0.15, acc_scale=0.3)
    cfg = _make_cfg(seq)
    pipe = VinsPipeline(cfg, dtype=jnp.float32, fused_steady_state=True)
    for (t, a, w) in seq.imu:
        pipe.push_imu(t, a, w)
    frames = list(syn.frames(seq, RIG))
    for (t, img, depth) in frames[:16]:
        pipe.push_image(t, np.asarray(img))
        pipe.push_depth(t, np.asarray(depth))
        pipe.spin_once()
    assert pipe.estimator.solver_flag == pipe.estimator.NON_LINEAR
    # poison the state -> next fused step must detect failure and reboot
    st = pipe.estimator.state
    pipe.estimator.state = st._replace(
        x=st.x._replace(Ba=st.x.Ba + 100.0))
    (t, img, depth) = frames[16]
    pipe.push_image(t, np.asarray(img))
    pipe.push_depth(t, np.asarray(depth))
    out = pipe.spin_once()
    assert out is None
    assert pipe.estimator.solver_flag == pipe.estimator.INITIAL
