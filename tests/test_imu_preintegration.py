"""IMU preintegration tests: ground-truth simulated motion, bias-Jacobian
finite-difference checks (the reference's own verification idiom, cf. its
``checkJacobian``/FD-checker patterns), padding no-op, covariance sanity."""

import numpy as np
import jax
import jax.numpy as jnp

from vins_rgbd_fast_tpu.ops import imu_preintegration as pre
from vins_rgbd_fast_tpu.utils import quaternion as quat

G = np.array([0.0, 0.0, 9.805])
NOISE = pre.ImuNoise(
    acc_n=jnp.asarray(0.1), gyr_n=jnp.asarray(0.01),
    acc_w=jnp.asarray(1e-3), gyr_w=jnp.asarray(1e-4),
)


def simulate_imu(T=0.5, rate=200.0, omega=(0.3, -0.2, 0.5), seed=0):
    """Simulate a body with constant angular rate and a smooth world-frame
    acceleration; returns IMU samples + ground-truth start/end states."""
    n = int(T * rate)
    ts = np.linspace(0.0, T, n + 1)
    dt = np.diff(ts)
    omega = np.asarray(omega)

    def R_of_t(t):
        return np.asarray(quat.q2R(quat.so3_exp(jnp.asarray(omega * t))))

    def a_w(t):  # smooth world acceleration
        return np.array([0.4 * np.sin(3 * t), -0.3 * np.cos(2 * t), 0.2 * np.sin(t)])

    # fine integration of V, P ground truth
    fine = np.linspace(0.0, T, 20000 + 1)
    aw = np.stack([a_w(t) for t in fine])
    V = np.concatenate([[np.zeros(3)], np.cumsum(0.5 * (aw[1:] + aw[:-1]) * np.diff(fine)[:, None], axis=0)])
    P = np.concatenate([[np.zeros(3)], np.cumsum(0.5 * (V[1:] + V[:-1]) * np.diff(fine)[:, None], axis=0)])

    accs = np.stack([R_of_t(t).T @ (a_w(t) + G) for t in ts])
    gyrs = np.tile(omega, (n + 1, 1))

    state_i = dict(P=np.zeros(3), Q=np.array([1.0, 0, 0, 0]), V=np.zeros(3))
    state_j = dict(
        P=P[-1], Q=np.asarray(quat.so3_exp(jnp.asarray(omega * T))), V=V[-1]
    )
    return dt, accs, gyrs, state_i, state_j


def test_residual_zero_on_ground_truth():
    dt, accs, gyrs, si, sj = simulate_imu()
    p = pre.preintegrate(
        jnp.asarray(dt), jnp.asarray(accs), jnp.asarray(gyrs),
        jnp.zeros(3), jnp.zeros(3), NOISE,
    )
    r = pre.evaluate(
        p,
        jnp.asarray(si["P"]), jnp.asarray(si["Q"]), jnp.asarray(si["V"]),
        jnp.zeros(3), jnp.zeros(3),
        jnp.asarray(sj["P"]), jnp.asarray(sj["Q"]), jnp.asarray(sj["V"]),
        jnp.zeros(3), jnp.zeros(3),
        jnp.asarray(G),
    )
    r = np.asarray(r)
    assert np.abs(r[0:3]).max() < 2e-5   # position (midpoint O(dt²) error)
    assert np.abs(r[3:6]).max() < 1e-6   # rotation
    assert np.abs(r[6:9]).max() < 1e-4   # velocity
    assert np.abs(r[9:15]).max() == 0.0  # bias walk


def test_padding_is_noop():
    dt, accs, gyrs, *_ = simulate_imu(T=0.2)
    p1 = pre.preintegrate(jnp.asarray(dt), jnp.asarray(accs), jnp.asarray(gyrs),
                          jnp.zeros(3), jnp.zeros(3), NOISE)
    # pad with 8 zero-dt samples repeating the last measurement
    pad = 8
    dtp = np.concatenate([dt, np.zeros(pad)])
    accp = np.concatenate([accs, np.tile(accs[-1], (pad, 1))])
    gyrp = np.concatenate([gyrs, np.tile(gyrs[-1], (pad, 1))])
    p2 = pre.preintegrate(jnp.asarray(dtp), jnp.asarray(accp), jnp.asarray(gyrp),
                          jnp.zeros(3), jnp.zeros(3), NOISE)
    np.testing.assert_allclose(p2.delta_p, p1.delta_p, atol=1e-14)
    np.testing.assert_allclose(p2.delta_q, p1.delta_q, atol=1e-14)
    np.testing.assert_allclose(p2.delta_v, p1.delta_v, atol=1e-14)
    np.testing.assert_allclose(p2.covariance, p1.covariance, atol=1e-14)
    np.testing.assert_allclose(p2.jacobian, p1.jacobian, atol=1e-14)


def test_bias_jacobian_fd():
    """The propagated J blocks must match finite differences of
    re-propagation w.r.t. the linearization biases."""
    dt, accs, gyrs, *_ = simulate_imu(T=0.3, omega=(0.8, -0.5, 0.3))
    dt, accs, gyrs = jnp.asarray(dt), jnp.asarray(accs), jnp.asarray(gyrs)
    ba0, bg0 = jnp.asarray([0.05, -0.02, 0.03]), jnp.asarray([0.01, 0.02, -0.015])
    p0 = pre.preintegrate(dt, accs, gyrs, ba0, bg0, NOISE)
    J = np.asarray(p0.jacobian)
    eps = 1e-6
    for k in range(3):
        e = np.zeros(3); e[k] = eps
        pba = pre.preintegrate(dt, accs, gyrs, ba0 + e, bg0, NOISE)
        pbg = pre.preintegrate(dt, accs, gyrs, ba0, bg0 + e, NOISE)
        dp_dba_fd = (np.asarray(pba.delta_p) - np.asarray(p0.delta_p)) / eps
        dv_dba_fd = (np.asarray(pba.delta_v) - np.asarray(p0.delta_v)) / eps
        dp_dbg_fd = (np.asarray(pbg.delta_p) - np.asarray(p0.delta_p)) / eps
        dv_dbg_fd = (np.asarray(pbg.delta_v) - np.asarray(p0.delta_v)) / eps
        dq_fd = 2.0 * np.asarray(
            quat.qmul(quat.qconj(p0.delta_q), pbg.delta_q))[1:4] / eps
        np.testing.assert_allclose(J[0:3, 9 + k], dp_dba_fd, atol=2e-4)
        np.testing.assert_allclose(J[6:9, 9 + k], dv_dba_fd, atol=2e-4)
        np.testing.assert_allclose(J[0:3, 12 + k], dp_dbg_fd, atol=2e-3)
        np.testing.assert_allclose(J[6:9, 12 + k], dv_dbg_fd, atol=2e-3)
        np.testing.assert_allclose(J[3:6, 12 + k], dq_fd, atol=2e-3)


def test_bias_corrected_matches_repropagate():
    """First-order bias correction ≈ full re-propagation for small dbias."""
    dt, accs, gyrs, *_ = simulate_imu(T=0.3)
    dt, accs, gyrs = jnp.asarray(dt), jnp.asarray(accs), jnp.asarray(gyrs)
    ba0, bg0 = jnp.zeros(3), jnp.zeros(3)
    p0 = pre.preintegrate(dt, accs, gyrs, ba0, bg0, NOISE)
    dba = jnp.asarray([3e-3, -2e-3, 1e-3])
    dbg = jnp.asarray([-1e-3, 2e-3, 3e-3])
    dp_c, dq_c, dv_c = pre.bias_corrected(p0, ba0 + dba, bg0 + dbg)
    p1 = pre.preintegrate(dt, accs, gyrs, ba0 + dba, bg0 + dbg, NOISE)
    # first-order correction has O(dbias²) error ≈ 1e-5; it must also beat
    # the uncorrected value by a wide margin
    np.testing.assert_allclose(dp_c, p1.delta_p, atol=1e-4)
    np.testing.assert_allclose(dv_c, p1.delta_v, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dq_c), np.asarray(p1.delta_q), atol=1e-5)
    err_corr = np.linalg.norm(np.asarray(dp_c) - np.asarray(p1.delta_p))
    err_raw = np.linalg.norm(np.asarray(p0.delta_p) - np.asarray(p1.delta_p))
    assert err_corr < 0.05 * err_raw


def test_covariance_psd_and_growing():
    dt, accs, gyrs, *_ = simulate_imu(T=0.5)
    p = pre.preintegrate(jnp.asarray(dt), jnp.asarray(accs), jnp.asarray(gyrs),
                         jnp.zeros(3), jnp.zeros(3), NOISE)
    C = np.asarray(p.covariance)
    np.testing.assert_allclose(C, C.T, atol=1e-12)
    w = np.linalg.eigvalsh(C)
    assert (w > -1e-12).all()
    assert w.max() > 0
    # sqrt information whitens: W C Wᵀ = I
    W = np.asarray(pre.sqrt_information(p))
    # W whitens the (eps-regularized) covariance exactly; vs the raw C the
    # deviation is the benign eps/λ_min under-weighting of bias-walk dims
    np.testing.assert_allclose(W @ (C + 1e-12 * np.eye(15)) @ W.T, np.eye(15), atol=1e-8)
    assert np.allclose(np.triu(W, 1), 0)


def test_vmap_batches():
    """The window's per-frame preintegrations batch under vmap (used by the
    backend to re-propagate all 10 intervals in one program)."""
    dt, accs, gyrs, *_ = simulate_imu(T=0.1)
    B = 4
    dts = jnp.tile(jnp.asarray(dt)[None], (B, 1))
    accb = jnp.tile(jnp.asarray(accs)[None], (B, 1, 1))
    gyrb = jnp.tile(jnp.asarray(gyrs)[None], (B, 1, 1))
    bab = jnp.zeros((B, 3))
    bgb = jnp.zeros((B, 3))
    out = jax.vmap(lambda d, a, g, ba, bg: pre.preintegrate(d, a, g, ba, bg, NOISE))(
        dts, accb, gyrb, bab, bgb
    )
    assert out.delta_p.shape == (B, 3)
    single = pre.preintegrate(jnp.asarray(dt), jnp.asarray(accs), jnp.asarray(gyrs),
                              jnp.zeros(3), jnp.zeros(3), NOISE)
    np.testing.assert_allclose(out.delta_p[0], single.delta_p, atol=1e-12)
