"""Factor tests: zero residual on perfect geometry, finite-difference
Jacobian verification (mirroring the reference's ``ProjectionFactor::check``
FD-checker idiom, projection_factor.cpp:132-234)."""

import numpy as np
import jax.numpy as jnp

from vins_rgbd_fast_tpu.ops import factors
from vins_rgbd_fast_tpu.ops import imu_preintegration as imupre
from vins_rgbd_fast_tpu.utils import quaternion as quat

from tests.test_imu_preintegration import simulate_imu, NOISE, G


def _zero_meas_at(pts_i, pts_j):
    z = jnp.zeros(())
    v = jnp.zeros(3)
    return factors.ProjMeas(pts_i=jnp.asarray(pts_i), pts_j=jnp.asarray(pts_j),
                            vel_i=v, vel_j=v, td_i=z, td_j=z, row_i=z, row_j=z)


def _random_geometry(seed=0):
    """Two camera poses observing one world point; returns exact
    measurements and states."""
    rng = np.random.default_rng(seed)
    Pw = np.array([0.5, -0.3, 4.0])
    Pi = np.zeros(3)
    Qi = np.asarray(quat.so3_exp(jnp.asarray(rng.normal(size=3) * 0.1)))
    Pj = np.array([0.3, 0.1, 0.05])
    Qj = np.asarray(quat.so3_exp(jnp.asarray(rng.normal(size=3) * 0.1)))
    tic = np.array([0.02, -0.01, 0.03])
    qic = np.asarray(quat.so3_exp(jnp.asarray([0.01, -0.02, 0.015])))

    def cam_obs(P, Q):
        # world -> imu -> cam
        p_imu = np.asarray(quat.qrot_inv(jnp.asarray(Q), jnp.asarray(Pw - P)))
        p_cam = np.asarray(quat.qrot_inv(jnp.asarray(qic), jnp.asarray(p_imu - tic)))
        return p_cam / p_cam[2], p_cam[2]

    obs_i, dep_i = cam_obs(Pi, Qi)
    obs_j, _ = cam_obs(Pj, Qj)
    return dict(Pi=Pi, Qi=Qi, Pj=Pj, Qj=Qj, tic=tic, qic=qic,
                inv_dep=1.0 / dep_i, obs_i=obs_i, obs_j=obs_j)


def test_projection_zero_residual_on_exact_geometry():
    g = _random_geometry()
    meas = _zero_meas_at(g["obs_i"], g["obs_j"])
    r, J = factors.projection_factor(
        jnp.asarray(g["Pi"]), jnp.asarray(g["Qi"]),
        jnp.asarray(g["Pj"]), jnp.asarray(g["Qj"]),
        jnp.asarray(g["tic"]), jnp.asarray(g["qic"]),
        jnp.asarray(g["inv_dep"]), jnp.zeros(()), meas,
    )
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-7)
    assert J.shape == (2, factors.PROJ_TANGENT)


def test_projection_jacobian_fd():
    g = _random_geometry(seed=3)
    # perturb the state so the residual is nonzero (Jacobian generic)
    meas = _zero_meas_at(g["obs_i"] + np.array([2e-3, -1e-3, 0]), g["obs_j"])
    args = (
        jnp.asarray(g["Pi"]), jnp.asarray(g["Qi"]),
        jnp.asarray(g["Pj"]), jnp.asarray(g["Qj"]),
        jnp.asarray(g["tic"]), jnp.asarray(g["qic"]),
        jnp.asarray(g["inv_dep"]), jnp.asarray(0.01), meas,
    )
    r0, J = factors.projection_factor(*args)
    J = np.asarray(J)
    eps = 1e-7
    for k in range(factors.PROJ_TANGENT):
        dx = jnp.zeros(factors.PROJ_TANGENT).at[k].set(eps)
        r1 = factors.projection_residual_retracted(dx, *args)
        fd = (np.asarray(r1) - np.asarray(r0)) / eps
        np.testing.assert_allclose(J[:, k], fd, atol=1e-4, rtol=1e-4)


def test_projection_analytic_equals_autodiff():
    """The closed-form Jacobian must match the hot path (forward-mode
    autodiff through the retraction) to machine precision on generic
    random states, including the td/rolling-shutter terms.  The analytic
    form is a cross-check, not the hot path — see the measured note in
    factors.projection_factor."""
    rng = np.random.default_rng(11)
    for _ in range(20):
        Pi, Pj, tic = (jnp.asarray(rng.normal(0, 1, 3)) for _ in range(3))
        Qi, Qj, qic = (quat.qnormalize(jnp.asarray(rng.normal(0, 1, 4)))
                       for _ in range(3))
        lam = jnp.asarray(rng.uniform(0.2, 2.0))
        td = jnp.asarray(rng.normal(0, 0.01))
        meas = factors.ProjMeas(
            pts_i=jnp.asarray([*rng.uniform(-0.5, 0.5, 2), 1.0]),
            pts_j=jnp.asarray([*rng.uniform(-0.5, 0.5, 2), 1.0]),
            vel_i=jnp.asarray([*rng.normal(0, 0.5, 2), 0.0]),
            vel_j=jnp.asarray([*rng.normal(0, 0.5, 2), 0.0]),
            td_i=jnp.asarray(rng.normal(0, 0.01)),
            td_j=jnp.asarray(rng.normal(0, 0.01)),
            row_i=jnp.asarray(rng.uniform(0, 0.03)),
            row_j=jnp.asarray(rng.uniform(0, 0.03)))
        args = (Pi, Qi, Pj, Qj, tic, qic, lam, td, meas)
        r_a, J_a = factors.projection_factor(*args)
        r_d, J_d = factors.projection_factor_analytic(*args)
        np.testing.assert_allclose(np.asarray(r_a), np.asarray(r_d),
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(J_a), np.asarray(J_d),
                                   atol=1e-9 * (1 + np.abs(J_d).max()))


def test_projection_td_velocity_compensation():
    """Residual with td offset + matching velocity compensation must equal the
    residual at the uncompensated point (self-consistency of the td model)."""
    g = _random_geometry(seed=5)
    vel = np.array([0.1, -0.2, 0.0])
    td = 0.02
    # observation shifted by +td·vel so that compensation brings it back
    meas = factors.ProjMeas(
        pts_i=jnp.asarray(g["obs_i"] + td * vel), pts_j=jnp.asarray(g["obs_j"]),
        vel_i=jnp.asarray(vel), vel_j=jnp.zeros(3),
        td_i=jnp.zeros(()), td_j=jnp.zeros(()),
        row_i=jnp.zeros(()), row_j=jnp.zeros(()),
    )
    r = factors.projection_residual(
        jnp.asarray(g["Pi"]), jnp.asarray(g["Qi"]),
        jnp.asarray(g["Pj"]), jnp.asarray(g["Qj"]),
        jnp.asarray(g["tic"]), jnp.asarray(g["qic"]),
        jnp.asarray(g["inv_dep"]), jnp.asarray(td), meas,
    )
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-9)


def test_cauchy_weight():
    r_small = jnp.asarray([[1e-4, 0.0]])
    r_big = jnp.asarray([[10.0, 0.0]])
    w_small = np.asarray(factors.cauchy_weight(r_small))
    w_big = np.asarray(factors.cauchy_weight(r_big))
    assert w_small[0, 0] > 0.999
    assert w_big[0, 0] < 0.15


def test_imu_analytic_equals_autodiff():
    """Closed-form IMU Jacobian vs autodiff on generic random states with
    LARGE bias deltas: residuals identical; Jacobians agree to first order
    (the analytic form drops the same second-order bias/normalization terms
    the reference's hand derivation does, imu_factor.h:73-202)."""
    rng = np.random.default_rng(4)
    n = 20
    dt = np.full(n, 0.005)
    accs = rng.normal(0, 1, (n + 1, 3)) + np.asarray([0, 0, 9.8])
    gyrs = rng.normal(0, 0.3, (n + 1, 3))
    pre = imupre.preintegrate(jnp.asarray(dt), jnp.asarray(accs),
                              jnp.asarray(gyrs), jnp.zeros(3), jnp.zeros(3),
                              NOISE)
    for _ in range(8):
        Pi, Vi, Pj, Vj = (jnp.asarray(rng.normal(0, 1, 3)) for _ in range(4))
        Qi, Qj = (quat.qnormalize(jnp.asarray(rng.normal(0, 1, 4)))
                  for _ in range(2))
        Bai, Bgi, Baj, Bgj = (jnp.asarray(rng.normal(0, 0.05, 3))
                              for _ in range(4))
        args = (pre, Pi, Qi, Vi, Bai, Bgi, Pj, Qj, Vj, Baj, Bgj,
                jnp.asarray(G))
        r_a, J_a = factors.imu_factor(*args)
        r_d, J_d = factors.imu_factor_analytic(*args)
        np.testing.assert_allclose(np.asarray(r_a), np.asarray(r_d),
                                   atol=1e-10)
        scale = 1 + np.abs(np.asarray(J_d)).max()
        np.testing.assert_allclose(np.asarray(J_a) / scale,
                                   np.asarray(J_d) / scale, atol=1e-4)


def test_imu_factor_zero_residual_and_fd_jacobian():
    dt, accs, gyrs, si, sj = simulate_imu(T=0.25, omega=(0.4, 0.1, -0.3))
    pre = imupre.preintegrate(jnp.asarray(dt), jnp.asarray(accs), jnp.asarray(gyrs),
                              jnp.zeros(3), jnp.zeros(3), NOISE)
    args = (
        pre,
        jnp.asarray(si["P"]), jnp.asarray(si["Q"]), jnp.asarray(si["V"]),
        jnp.zeros(3), jnp.zeros(3),
        jnp.asarray(sj["P"]), jnp.asarray(sj["Q"]), jnp.asarray(sj["V"]),
        jnp.zeros(3), jnp.zeros(3),
        jnp.asarray(G),
    )
    r, J = factors.imu_factor(*args)
    assert np.abs(np.asarray(r)).max() < 0.2  # whitened near-zero
    # FD check at a perturbed state
    sqrt_info = imupre.sqrt_information(pre)
    dx0 = jnp.zeros(factors.IMU_TANGENT)
    retr_args = args + (sqrt_info,)
    r0 = factors.imu_residual_retracted(dx0, *retr_args)
    J = np.asarray(jnp.asarray(J))
    eps = 1e-6
    for k in range(factors.IMU_TANGENT):
        dx = dx0.at[k].set(eps)
        r1 = factors.imu_residual_retracted(dx, *retr_args)
        fd = (np.asarray(r1) - np.asarray(r0)) / eps
        np.testing.assert_allclose(J[:, k], fd, atol=5e-3, rtol=5e-3)
