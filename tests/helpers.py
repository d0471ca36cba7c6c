"""Shared synthetic-scene generators for backend tests: analytic window
trajectories with exact IMU measurements and exact landmark projections."""

import numpy as np
import jax.numpy as jnp

from vins_rgbd_fast_tpu.utils import quaternion as quat
from vins_rgbd_fast_tpu.backend.state import FRAMES, WINDOW_SIZE, WindowState
from vins_rgbd_fast_tpu.ops import imu_preintegration as imupre
from vins_rgbd_fast_tpu.ops.solver import VisualData, ImuData

G = np.array([0.0, 0.0, 9.805])


def simulate_window_trajectory(seed=0, T_per=0.1, rate=100, omega_scale=0.3, acc_scale=0.5):
    """Piecewise-constant body-rate / world-acceleration trajectory over the
    11 window frames.  Returns ground-truth WindowState arrays + per-interval
    IMU sample batches (exact closed forms)."""
    rng = np.random.default_rng(seed)
    n = int(T_per * rate)

    P = [np.zeros(3)]
    Q = [np.array([1.0, 0, 0, 0])]
    V = [np.array([0.3, 0.1, 0.05])]
    dts, accs, gyrs = [], [], []

    for k in range(WINDOW_SIZE):
        w_b = rng.normal(size=3) * omega_scale
        a_w = rng.normal(size=3) * acc_scale
        P0, Q0, V0 = P[-1], Q[-1], V[-1]

        ts = np.linspace(0, T_per, n + 1)
        # closed forms
        Qt = [np.asarray(quat.qmul(jnp.asarray(Q0), quat.so3_exp(jnp.asarray(w_b * t)))) for t in ts]
        acc_meas = np.stack([
            np.asarray(quat.qrot_inv(jnp.asarray(q), jnp.asarray(a_w + G))) for q in Qt
        ])
        gyr_meas = np.tile(w_b, (n + 1, 1))

        P.append(P0 + V0 * T_per + 0.5 * a_w * T_per ** 2)
        V.append(V0 + a_w * T_per)
        Q.append(Qt[-1])
        dts.append(np.diff(ts))
        accs.append(acc_meas)
        gyrs.append(gyr_meas)

    gt = WindowState(
        P=jnp.asarray(np.stack(P)), Q=jnp.asarray(np.stack(Q)),
        V=jnp.asarray(np.stack(V)),
        Ba=jnp.zeros((FRAMES, 3)), Bg=jnp.zeros((FRAMES, 3)),
        tic=jnp.zeros(3), qic=jnp.asarray([1.0, 0, 0, 0]), td=jnp.zeros(()),
    )
    return gt, (np.stack(dts), np.stack(accs), np.stack(gyrs))


def make_imu_data(imu_arrays, noise=None):
    dts, accs, gyrs = imu_arrays
    if noise is None:
        noise = imupre.ImuNoise(jnp.asarray(0.1), jnp.asarray(0.01),
                                jnp.asarray(1e-3), jnp.asarray(1e-4))
    import jax

    pre = jax.vmap(
        lambda d, a, g: imupre.preintegrate(d, a, g, jnp.zeros(3), jnp.zeros(3), noise)
    )(jnp.asarray(dts), jnp.asarray(accs), jnp.asarray(gyrs))
    return ImuData(pre=pre, valid=jnp.ones(WINDOW_SIZE, bool))


def make_visual_data(gt: WindowState, maxf=32, n_feat=24, seed=1, depth_fixed_frac=0.5,
                     noise_px=0.0):
    """Project random landmarks into every window frame with the GT poses.

    Returns (VisualData, landmarks_world).  ``depth_fixed_frac`` of features
    get depth_free=False (RGB-D anchored scale)."""
    rng = np.random.default_rng(seed)
    # landmarks in front of the camera path
    L = np.stack([
        rng.uniform(-2.0, 2.0, n_feat),
        rng.uniform(-1.5, 1.5, n_feat),
        rng.uniform(3.0, 8.0, n_feat),
    ], axis=-1)

    Pw = np.asarray(gt.P)
    Rw = np.asarray(quat.q2R(gt.Q))
    obs = np.zeros((maxf, FRAMES, 2))
    mask = np.zeros((maxf, FRAMES), bool)
    inv_depth = np.ones(maxf)
    for f in range(n_feat):
        for j in range(FRAMES):
            pc = Rw[j].T @ (L[f] - Pw[j])  # identity extrinsic
            if pc[2] > 0.5:
                o = pc[:2] / pc[2]
                if noise_px > 0:
                    o = o + rng.normal(size=2) * noise_px / 460.0
                obs[f, j] = o
                mask[f, j] = True
        pc0 = Rw[0].T @ (L[f] - Pw[0])
        inv_depth[f] = 1.0 / pc0[2]

    valid = np.zeros(maxf, bool)
    valid[:n_feat] = True
    depth_free = valid.copy()
    fixed = rng.random(maxf) < depth_fixed_frac
    depth_free = valid & ~fixed

    vis = VisualData(
        start=jnp.zeros(maxf, jnp.int32),
        pts=jnp.asarray(obs),
        vel=jnp.zeros((maxf, FRAMES, 2)),
        td_obs=jnp.zeros((maxf, FRAMES)),
        row_scaled=jnp.zeros((maxf, FRAMES)),
        obs_mask=jnp.asarray(mask),
        inv_depth=jnp.asarray(inv_depth),
        depth_free=jnp.asarray(depth_free),
        valid=jnp.asarray(valid),
    )
    return vis, L


def simulate_long_trajectory(n_frames, T_per=0.1, rate=100, seed=0,
                             omega_scale=0.25, acc_scale=0.4):
    """Smooth piecewise-constant-rate trajectory over n_frames frames.
    Returns dict with frame times/states and the raw IMU sample stream."""
    rng = np.random.default_rng(seed)
    n = int(T_per * rate)
    P = [np.zeros(3)]
    Q = [np.array([1.0, 0, 0, 0])]
    V = [np.array([0.25, 0.1, 0.0])]
    times = [0.0]
    imu_stream = []  # (t, acc, gyr)
    # emit the boundary sample at t=0
    a_w0 = np.zeros(3)
    imu_stream.append((0.0, np.asarray(quat.qrot_inv(jnp.asarray(Q[0]), jnp.asarray(a_w0 + G))), np.zeros(3)))

    w_b = rng.normal(size=3) * omega_scale
    a_w = rng.normal(size=3) * acc_scale
    for k in range(n_frames - 1):
        # smooth variation of rates between intervals
        w_b = 0.8 * w_b + 0.2 * rng.normal(size=3) * omega_scale
        a_w = 0.8 * a_w + 0.2 * rng.normal(size=3) * acc_scale
        P0, Q0, V0 = P[-1], Q[-1], V[-1]
        t0 = times[-1]
        ts = np.linspace(0, T_per, n + 1)
        for t in ts[1:]:
            q_t = np.asarray(quat.qmul(jnp.asarray(Q0), quat.so3_exp(jnp.asarray(w_b * t))))
            acc_meas = np.asarray(quat.qrot_inv(jnp.asarray(q_t), jnp.asarray(a_w + G)))
            imu_stream.append((t0 + t, acc_meas, w_b.copy()))
        P.append(P0 + V0 * T_per + 0.5 * a_w * T_per ** 2)
        V.append(V0 + a_w * T_per)
        Q.append(np.asarray(quat.qmul(jnp.asarray(Q0), quat.so3_exp(jnp.asarray(w_b * T_per)))))
        times.append(t0 + T_per)
    return dict(times=np.asarray(times), P=np.stack(P), Q=np.stack(Q),
                V=np.stack(V), imu=imu_stream)


def make_landmark_field(traj, n_landmarks=400, seed=1):
    """Landmarks scattered around/ahead of the trajectory."""
    rng = np.random.default_rng(seed)
    Pmin = traj["P"].min(axis=0) - np.array([4.0, 4.0, 1.0])
    Pmax = traj["P"].max(axis=0) + np.array([4.0, 4.0, 8.0])
    return np.stack([rng.uniform(Pmin[i], Pmax[i], n_landmarks) for i in range(3)], -1)


def project_frame_features(P, Q, L, maxc, depth_noise=0.0, px_noise=0.0,
                           focal=460.0, center=(320.0, 240.0), rng=None,
                           ric=None, tic=None):
    """Exact projections of the landmark field from IMU pose (P, Q) into a
    FrameFeatures batch; ids = landmark indices.  Optional camera extrinsic
    (ric imu<-cam rotation, tic translation), identity by default."""
    from vins_rgbd_fast_tpu.backend.feature_table import FrameFeatures

    Rw = np.asarray(quat.q2R(jnp.asarray(Q)))
    if ric is not None:
        t_wc = P + Rw @ (tic if tic is not None else np.zeros(3))
        Rw = Rw @ ric
        P = t_wc
    pc = (L - P) @ Rw  # world -> cam (R^T (L - P))
    z = pc[:, 2]
    xy = pc[:, :2] / np.where(np.abs(z) > 1e-6, z, 1e-6)[:, None]
    vis = (z > 0.7) & (z < 9.0) & (np.abs(xy[:, 0]) < 0.55) & (np.abs(xy[:, 1]) < 0.42)
    idx = np.nonzero(vis)[0][:maxc]
    k = len(idx)
    ids = np.full(maxc, -1, np.int32)
    pts = np.zeros((maxc, 2))
    uv = np.zeros((maxc, 2))
    depth = np.zeros(maxc)
    ids[:k] = idx
    obs = xy[idx]
    if px_noise > 0 and rng is not None:
        obs = obs + rng.normal(size=obs.shape) * px_noise / focal
    pts[:k] = obs
    uv[:k] = obs * focal + np.asarray(center)
    d = z[idx]
    if depth_noise > 0 and rng is not None:
        d = d * (1.0 + rng.normal(size=d.shape) * depth_noise)
    depth[:k] = d
    return FrameFeatures(
        ids=jnp.asarray(ids), pts=jnp.asarray(pts), uv=jnp.asarray(uv),
        vel=jnp.zeros((maxc, 2)), depth=jnp.asarray(depth),
    )


def perturb_state(gt: WindowState, seed=2, dp=0.05, dth=0.02, dv=0.05, dbias=0.01,
                  keep_frame0=False):
    rng = np.random.default_rng(seed)

    def noise(shape, s):
        return jnp.asarray(rng.normal(size=shape) * s)

    dP = noise((FRAMES, 3), dp)
    dTh = noise((FRAMES, 3), dth)
    if keep_frame0:
        dP = dP.at[0].set(0.0)
        dTh = dTh.at[0].set(0.0)
    return WindowState(
        P=gt.P + dP,
        Q=quat.qboxplus(gt.Q, dTh),
        V=gt.V + noise((FRAMES, 3), dv),
        Ba=gt.Ba + noise((FRAMES, 3), dbias),
        Bg=gt.Bg + noise((FRAMES, 3), dbias),
        tic=gt.tic, qic=gt.qic, td=gt.td,
    )
