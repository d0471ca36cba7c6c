"""Initialization-layer unit tests: essential decomposition, hand-eye
extrinsic rotation calibration, linear alignment."""

import numpy as np
import jax
import jax.numpy as jnp

from vins_rgbd_fast_tpu.backend import initialization as init_ops
from vins_rgbd_fast_tpu.utils import quaternion as quat


def test_decompose_essential_recovers_rotation():
    rng = np.random.default_rng(0)
    R = np.asarray(quat.q2R(quat.so3_exp(jnp.asarray([0.06, -0.1, 0.04]))))
    t = np.array([0.3, -0.1, 0.15])
    t = t / np.linalg.norm(t)
    # points in cam1; x2 = R x1 + t
    P1 = np.stack([rng.uniform(-1.5, 1.5, 60), rng.uniform(-1, 1, 60),
                   rng.uniform(3, 8, 60)], -1)
    P2 = P1 @ R.T + t
    x1 = P1[:, :2] / P1[:, 2:3]
    x2 = P2[:, :2] / P2[:, 2:3]
    # essential from R,t: E = [t]x R
    tx = np.asarray(quat.skew(jnp.asarray(t)))
    E = tx @ R
    R_est, t_est, score = init_ops.decompose_essential(
        jnp.asarray(E), jnp.asarray(x1), jnp.asarray(x2), jnp.ones(60, bool))
    np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(t_est) / np.linalg.norm(np.asarray(t_est)), t, atol=1e-6)
    assert float(score) >= 55


def test_extrinsic_rotation_calibration():
    """Known hand-eye rotation recovered from synthetic rotation pairs."""
    rng = np.random.default_rng(1)
    ric_true = np.asarray(quat.q2R(quat.so3_exp(jnp.asarray([0.3, -0.5, 0.8]))))
    q_ic = quat.R2q(jnp.asarray(ric_true))
    K = 24
    q_cam, q_imu = [], []
    for _ in range(K):
        w = rng.normal(size=3) * 0.2
        qi = quat.so3_exp(jnp.asarray(w))  # imu relative rotation
        # camera rotation: q_cam = q_ic^-1 * q_imu * q_ic
        qc = quat.qmul(quat.qconj(q_ic), quat.qmul(qi, q_ic))
        q_imu.append(np.asarray(qi))
        q_cam.append(np.asarray(qc))
    ric_est, ok = init_ops.calibrate_extrinsic_rotation(
        jnp.asarray(np.stack(q_cam)), jnp.asarray(np.stack(q_imu)),
        jnp.eye(3), jnp.ones(K, bool),
    )
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(ric_est), ric_true, atol=1e-6)


def test_online_extrinsic_calibration_in_estimator():
    """ESTIMATE_EXTRINSIC==2 end-to-end: the estimator must recover a
    non-trivial imu<-cam rotation from feature+IMU streams alone."""
    from vins_rgbd_fast_tpu.config import VinsConfig
    from vins_rgbd_fast_tpu.backend import estimator as est
    from tests.helpers import (
        simulate_long_trajectory, make_landmark_field, project_frame_features)

    ric_true = np.asarray(quat.q2R(quat.so3_exp(jnp.asarray([0.25, -0.4, 0.6]))))
    tic_true = np.zeros(3)
    cfg = VinsConfig(
        imu=True, static_init=True, estimate_extrinsic=2,
        max_cnt=48, max_features=48, max_imu_per_frame=16,
        ric=tuple(np.eye(3).ravel()),  # start from identity (unknown)
        acc_n=0.1, gyr_n=0.01, acc_w=1e-4, gyr_w=1e-5,
    )
    traj = simulate_long_trajectory(30, seed=41, omega_scale=1.6, acc_scale=0.3)
    L = make_landmark_field(traj, n_landmarks=600, seed=42)
    e = est.VinsEstimator(cfg, dtype=jnp.float64)
    for (t, a, w) in traj["imu"]:
        e.push_imu(t, a, w)
    for k in range(30):
        feats = project_frame_features(traj["P"][k], traj["Q"][k], L, 48,
                                       ric=ric_true, tic=tic_true)
        e.process_features(feats, float(traj["times"][k]))
        if not e._ex_calibrating:
            break
    assert not e._ex_calibrating, "extrinsic calibration did not converge"
    ric_est = np.asarray(quat.q2R(e.state.x.qic))
    err_deg = np.degrees(np.linalg.norm(np.asarray(
        quat.so3_log(quat.R2q(jnp.asarray(ric_est.T @ ric_true))))))
    # initial hand-eye estimate; the solver then refines it online with
    # estimate_extrinsic=1 (reference does the same hand-off)
    assert err_deg < 4.0, err_deg


def test_extrinsic_calibration_rejects_insufficient_motion():
    """Rotations around a single axis leave the hand-eye underdetermined —
    the convergence check must say not-ok."""
    q_ic = quat.so3_exp(jnp.asarray([0.2, 0.1, -0.3]))
    K = 24
    q_cam, q_imu = [], []
    for k in range(K):
        qi = quat.so3_exp(jnp.asarray([0.15 * ((k % 3) + 1), 0.0, 0.0]))
        qc = quat.qmul(quat.qconj(q_ic), quat.qmul(qi, q_ic))
        q_imu.append(np.asarray(qi))
        q_cam.append(np.asarray(qc))
    _, ok = init_ops.calibrate_extrinsic_rotation(
        jnp.asarray(np.stack(q_cam)), jnp.asarray(np.stack(q_imu)),
        jnp.eye(3), jnp.ones(K, bool),
    )
    assert not bool(ok)
