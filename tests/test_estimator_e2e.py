"""End-to-end estimator tests: full synthetic VIO/VO sequences through the
fill → init → steady-state pipeline with sliding window + marginalization."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vins_rgbd_fast_tpu.config import VinsConfig
from vins_rgbd_fast_tpu.backend import estimator as est
from vins_rgbd_fast_tpu.utils import quaternion as quat

from tests.helpers import (
    simulate_long_trajectory, make_landmark_field, project_frame_features,
)

MAXC = 48


def _run_vio(n_frames=25, depth_noise=0.0, px_noise=0.0, seed=0, imu=True):
    cfg = VinsConfig(
        imu=imu, static_init=True, estimate_td=False, rolling_shutter=False,
        max_cnt=MAXC, max_features=MAXC, max_imu_per_frame=16,
        fix_depth=True, depth_min_dist=0.3, depth_max_dist=10.0,
        keyframe_parallax=10.0,
        acc_n=0.1, gyr_n=0.01, acc_w=1e-4, gyr_w=1e-5,
    )
    traj = simulate_long_trajectory(n_frames, seed=seed)
    L = make_landmark_field(traj, n_landmarks=500, seed=seed + 1)
    rng = np.random.default_rng(seed + 2)

    e = est.VinsEstimator(cfg, dtype=jnp.float64)
    for (t, a, w) in traj["imu"]:
        e.push_imu(t, a, w)

    outs = []
    for k in range(n_frames):
        feats = project_frame_features(
            traj["P"][k], traj["Q"][k], L, MAXC,
            depth_noise=depth_noise, px_noise=px_noise, rng=rng,
        )
        out = e.process_features(feats, float(traj["times"][k]))
        if out is not None:
            outs.append((k, out))
    return traj, outs, e


def test_vio_e2e_exact_measurements():
    """With exact measurements the estimated trajectory must match ground
    truth to millimetres across the whole run (window slides ~14 times)."""
    traj, outs, e = _run_vio(n_frames=25)
    assert len(outs) >= 14, f"only {len(outs)} solved frames"
    errs = []
    for k, out in outs:
        errs.append(np.linalg.norm(out["P"] - traj["P"][k]))
    errs = np.asarray(errs)
    assert errs.max() < 2e-2, errs
    assert errs[-1] < 2e-2, errs[-1]
    # velocity sanity at the last frame
    k, out = outs[-1]
    assert np.linalg.norm(out["V"] - traj["V"][k]) < 5e-2


def test_vio_e2e_noisy_measurements():
    """1px-class pixel noise + 2% depth noise: drift stays bounded."""
    traj, outs, e = _run_vio(n_frames=25, depth_noise=0.02, px_noise=1.0, seed=5)
    assert len(outs) >= 14
    k, out = outs[-1]
    travelled = np.sum(np.linalg.norm(np.diff(traj["P"][:k + 1], axis=0), axis=1))
    err = np.linalg.norm(out["P"] - traj["P"][k])
    assert err < max(0.05 * travelled, 0.05), (err, travelled)


def test_vo_mode_e2e():
    """VO mode (no IMU): PnP init + depth-anchored BA."""
    traj, outs, e = _run_vio(n_frames=20, imu=False, seed=7)
    assert len(outs) >= 9
    k, out = outs[-1]
    err = np.linalg.norm(out["P"] - traj["P"][k])
    assert err < 0.05, err


def test_dynamic_init_e2e():
    """Dynamic (in-motion) initialization path: static_init=0 like the
    OpenLORIS rig — depth-PnP chain + gyro-bias/velocity/gravity alignment."""
    cfg = VinsConfig(
        imu=True, static_init=False, estimate_td=False,
        max_cnt=MAXC, max_features=MAXC, max_imu_per_frame=16,
        fix_depth=True, depth_min_dist=0.3, depth_max_dist=10.0,
        acc_n=0.1, gyr_n=0.01, acc_w=1e-4, gyr_w=1e-5,
    )
    traj = simulate_long_trajectory(25, seed=31, omega_scale=0.3, acc_scale=0.6)
    L = make_landmark_field(traj, n_landmarks=500, seed=32)
    e = est.VinsEstimator(cfg, dtype=jnp.float64)
    for (t, a, w) in traj["imu"]:
        e.push_imu(t, a, w)
    outs = []
    for k in range(25):
        feats = project_frame_features(traj["P"][k], traj["Q"][k], L, MAXC)
        out = e.process_features(feats, float(traj["times"][k]))
        if out is not None:
            outs.append((k, out))
    assert len(outs) >= 10, f"dynamic init produced {len(outs)} outputs"
    # the dynamic-init world is anchored at the init window's first frame
    # with yaw-zeroed gravity alignment — compare relative motion
    k0, o0 = outs[0]
    k1, o1 = outs[-1]
    d_est = np.linalg.norm(o1["P"] - o0["P"])
    d_gt = np.linalg.norm(traj["P"][k1] - traj["P"][k0])
    assert abs(d_est - d_gt) < max(0.1 * d_gt, 0.08), (d_est, d_gt)


def test_mono_init_e2e_no_depth():
    """Monocular (depth-less) initialization: with every depth measurement
    zeroed during the fill phase, the dynamic path must fall back to the
    essential-RANSAC + SFM + scale-solving alignment (``GlobalSFM::construct``
    + ``LinearAlignment``) and still bootstrap a metric trajectory."""
    cfg = VinsConfig(
        imu=True, static_init=False, estimate_td=False,
        max_cnt=MAXC, max_features=MAXC, max_imu_per_frame=16,
        fix_depth=True, depth_min_dist=0.3, depth_max_dist=10.0,
        acc_n=0.1, gyr_n=0.01, acc_w=1e-4, gyr_w=1e-5,
    )
    traj = simulate_long_trajectory(25, seed=31, omega_scale=0.3, acc_scale=0.6)
    L = make_landmark_field(traj, n_landmarks=500, seed=32)
    e = est.VinsEstimator(cfg, dtype=jnp.float64)
    for (t, a, w) in traj["imu"]:
        e.push_imu(t, a, w)
    outs = []
    for k in range(25):
        feats = project_frame_features(traj["P"][k], traj["Q"][k], L, MAXC)
        feats = feats._replace(depth=jnp.zeros_like(feats.depth))
        out = e.process_features(feats, float(traj["times"][k]))
        if out is not None:
            outs.append((k, out))
    assert len(outs) >= 8, f"mono init produced {len(outs)} outputs"
    # metric scale must be recovered from the IMU: compare relative motion
    k0, o0 = outs[0]
    k1, o1 = outs[-1]
    d_est = np.linalg.norm(o1["P"] - o0["P"])
    d_gt = np.linalg.norm(traj["P"][k1] - traj["P"][k0])
    assert abs(d_est - d_gt) < max(0.15 * d_gt, 0.1), (d_est, d_gt)


def test_latest_odometry_fast_path():
    """IMU-rate propagated odometry between frames (inputIMU->predict fast
    path): propagating half a frame ahead must land near ground truth."""
    cfg = VinsConfig(
        imu=True, static_init=True, max_cnt=MAXC, max_features=MAXC,
        max_imu_per_frame=16, acc_n=0.1, gyr_n=0.01, acc_w=1e-4, gyr_w=1e-5,
    )
    traj = simulate_long_trajectory(20, seed=61)
    L = make_landmark_field(traj, seed=62)
    e = est.VinsEstimator(cfg, dtype=jnp.float64)
    for (t, a, w) in traj["imu"]:
        e.push_imu(t, a, w)
    # process all but the last frame: IMU samples beyond the last processed
    # frame remain buffered for fast propagation
    last_out = None
    for k in range(19):
        feats = project_frame_features(traj["P"][k], traj["Q"][k], L, MAXC)
        out = e.process_features(feats, float(traj["times"][k]))
        last_out = out or last_out
    assert last_out is not None
    t18 = float(traj["times"][18])
    t_half = t18 + 0.05  # half a frame interval ahead
    fast = e.latest_odometry(t_half)
    assert fast is not None and fast["t"] > t18
    gt_P = traj["P"][18] + traj["V"][18] * (fast["t"] - t18)
    err = np.linalg.norm(fast["P"] - gt_P)
    assert err < 0.05, err
    assert np.isfinite(fast["V"]).all()


def test_failure_reset_on_garbage():
    """A burst of absurd depth should not crash; failure detection may
    reboot the estimator and the host keeps running."""
    cfg = VinsConfig(
        imu=True, static_init=True, max_cnt=MAXC, max_features=MAXC,
        max_imu_per_frame=16, acc_n=0.1, gyr_n=0.01,
    )
    traj = simulate_long_trajectory(18, seed=11)
    L = make_landmark_field(traj, seed=12)
    e = est.VinsEstimator(cfg, dtype=jnp.float64)
    for (t, a, w) in traj["imu"]:
        e.push_imu(t, a, w)
    for k in range(18):
        feats = project_frame_features(traj["P"][k], traj["Q"][k], L, MAXC)
        if k == 13:  # inject garbage observations
            feats = feats._replace(pts=feats.pts + 5.0)
        e.process_features(feats, float(traj["times"][k]))
    # survived without exceptions; estimator still has finite state
    assert bool(jnp.isfinite(e.state.x.P).all())
