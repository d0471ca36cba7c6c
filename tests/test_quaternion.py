"""Unit tests for the L0 rotation algebra, checked against scipy-free
closed forms and self-consistency identities."""

import numpy as np
import jax.numpy as jnp

from vins_rgbd_fast_tpu.utils import quaternion as quat


def rand_q(rng, n=()):
    q = rng.normal(size=n + (4,))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_qmul_identity():
    rng = np.random.default_rng(0)
    q = rand_q(rng, (5,))
    e = np.tile([1.0, 0, 0, 0], (5, 1))
    np.testing.assert_allclose(quat.qmul(q, e), q, atol=1e-12)
    np.testing.assert_allclose(quat.qmul(e, q), q, atol=1e-12)


def test_qmul_vs_matrix():
    rng = np.random.default_rng(1)
    q1, q2 = rand_q(rng), rand_q(rng)
    R12 = quat.q2R(jnp.asarray(quat.qmul(q1, q2)))
    np.testing.assert_allclose(R12, quat.q2R(q1) @ quat.q2R(q2), atol=1e-12)


def test_qrot_matches_matrix():
    rng = np.random.default_rng(2)
    q = rand_q(rng, (7,))
    v = rng.normal(size=(7, 3))
    out = quat.qrot(q, v)
    expect = np.einsum("nij,nj->ni", np.asarray(quat.q2R(q)), v)
    np.testing.assert_allclose(out, expect, atol=1e-12)


def test_R2q_roundtrip():
    rng = np.random.default_rng(3)
    # include near-degenerate cases: identity, 180-degree rotations
    qs = [rand_q(rng) for _ in range(20)]
    qs += [np.array([1.0, 0, 0, 0]), np.array([0.0, 1, 0, 0]),
           np.array([0.0, 0, 1, 0]), np.array([0.0, 0, 0, 1])]
    for q in qs:
        R = quat.q2R(q)
        q2 = np.asarray(quat.R2q(R))
        # sign ambiguity: compare rotation matrices
        np.testing.assert_allclose(quat.q2R(q2), R, atol=1e-9)


def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(4)
    # log returns the principal representative, so restrict |theta| < pi
    theta = rng.normal(size=(10, 3))
    theta *= (rng.uniform(0.01, 3.1, size=(10, 1)) / np.linalg.norm(theta, axis=-1, keepdims=True))
    q = quat.so3_exp(jnp.asarray(theta))
    back = np.asarray(quat.so3_log(q))
    np.testing.assert_allclose(back, theta, atol=1e-9)
    # and exp(log(q)) == q up to sign for arbitrary unit quaternions
    qs = rand_q(rng, (10,))
    q2 = np.asarray(quat.so3_exp(quat.so3_log(jnp.asarray(qs))))
    np.testing.assert_allclose(np.asarray(quat.q2R(jnp.asarray(q2))), np.asarray(quat.q2R(jnp.asarray(qs))), atol=1e-9)
    # small-angle branch
    tiny = np.array([[1e-10, -2e-10, 5e-11]])
    np.testing.assert_allclose(np.asarray(quat.so3_log(quat.so3_exp(jnp.asarray(tiny)))), tiny, atol=1e-15)


def test_exp_matches_rodrigues():
    theta = np.array([0.3, -0.2, 0.5])
    R = np.asarray(quat.q2R(quat.so3_exp(jnp.asarray(theta))))
    a = np.linalg.norm(theta)
    k = theta / a
    K = np.asarray(quat.skew(jnp.asarray(k)))
    R_rod = np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * (K @ K)
    np.testing.assert_allclose(R, R_rod, atol=1e-12)


def test_qleft_qright():
    rng = np.random.default_rng(5)
    q, p = rand_q(rng), rand_q(rng)
    qp = quat.qmul(q, p)
    np.testing.assert_allclose(np.asarray(quat.qleft(q)) @ p, qp, atol=1e-12)
    np.testing.assert_allclose(np.asarray(quat.qright(p)) @ q, qp, atol=1e-12)


def test_ypr_roundtrip():
    ypr = np.array([35.0, -20.0, 64.0])
    R = quat.ypr2R(jnp.asarray(ypr))
    np.testing.assert_allclose(np.asarray(quat.R2ypr(R)), ypr, atol=1e-9)


def test_g2R_aligns_gravity():
    rng = np.random.default_rng(6)
    for _ in range(5):
        g = rng.normal(size=3)
        g = 9.8 * g / np.linalg.norm(g)
        R0 = np.asarray(quat.g2R(jnp.asarray(g)))
        aligned = R0 @ (g / np.linalg.norm(g))
        np.testing.assert_allclose(aligned, [0, 0, 1], atol=1e-9)
        # yaw of result is zero
        assert abs(np.asarray(quat.R2ypr(jnp.asarray(R0)))[0]) < 1e-4


def test_normalize_angle():
    a = jnp.asarray([0.0, 179.0, 181.0, 360.0, -181.0, 540.0])
    out = np.asarray(quat.normalize_angle_deg(a))
    # matches the reference's normalizeAngle convention: 540 wraps to -180
    np.testing.assert_allclose(out, [0.0, 179.0, -179.0, 0.0, 179.0, -180.0], atol=1e-9)


def test_pose_compose_between():
    rng = np.random.default_rng(7)
    p1, p2 = rng.normal(size=3), rng.normal(size=3)
    q1, q2 = rand_q(rng), rand_q(rng)
    pr, qr = quat.pose_between(jnp.asarray(p1), jnp.asarray(q1), jnp.asarray(p2), jnp.asarray(q2))
    pc, qc = quat.pose_compose(jnp.asarray(p1), jnp.asarray(q1), pr, qr)
    np.testing.assert_allclose(pc, p2, atol=1e-12)
    np.testing.assert_allclose(np.asarray(quat.q2R(qc)), np.asarray(quat.q2R(jnp.asarray(q2))), atol=1e-12)


def test_dtype_preserved():
    q = jnp.asarray([1.0, 0, 0, 0], dtype=jnp.float32)
    v = jnp.ones(3, dtype=jnp.float32)
    assert quat.qrot(q, v).dtype == jnp.float32
    assert quat.q2R(q).dtype == jnp.float32
    assert quat.so3_exp(v).dtype == jnp.float32


def test_numpy_twins_match_jnp():
    """utils.quaternion_np (host pose-graph math, dispatch-free) must be
    bit-compatible with the jnp helpers in f64."""
    from vins_rgbd_fast_tpu.utils import quaternion_np as nq

    rng = np.random.default_rng(3)
    for _ in range(20):
        q1 = np.asarray(rand_q(rng))
        q2 = np.asarray(rand_q(rng))
        np.testing.assert_allclose(
            nq.qmul(q1, q2),
            np.asarray(quat.qmul(jnp.asarray(q1), jnp.asarray(q2))),
            atol=1e-12)
        R = nq.q2R(q1)
        np.testing.assert_allclose(R, np.asarray(quat.q2R(jnp.asarray(q1))),
                                   atol=1e-12)
        # R2q up to sign
        qb = nq.R2q(R)
        qj = np.asarray(quat.R2q(jnp.asarray(R)))
        if np.dot(qb, qj) < 0:
            qb = -qb
        np.testing.assert_allclose(qb, qj, atol=1e-9)
        np.testing.assert_allclose(
            nq.R2ypr(R), np.asarray(quat.R2ypr(jnp.asarray(R))), atol=1e-9)
        ypr = rng.uniform(-170, 170, 3) * np.asarray([1.0, 0.49, 0.49])
        np.testing.assert_allclose(
            nq.ypr2R(ypr), np.asarray(quat.ypr2R(jnp.asarray(ypr))),
            atol=1e-12)
        a = rng.uniform(-720, 720)
        np.testing.assert_allclose(
            nq.normalize_angle_deg(a),
            np.asarray(quat.normalize_angle_deg(jnp.asarray(a))), atol=1e-12)
        np.testing.assert_allclose(
            nq.yaw_R(a), np.asarray(quat.yaw_R(jnp.asarray(a))), atol=1e-12)
