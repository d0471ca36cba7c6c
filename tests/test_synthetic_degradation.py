"""Synthetic sensor-degradation realism (io/synthetic.py): no-op configs
are exact no-ops, each degradation visibly engages, and the dynamic sphere
occludes scene geometry with consistent depth."""

import numpy as np
import jax.numpy as jnp

from vins_rgbd_fast_tpu.io import synthetic as syn

RIG = syn.SyntheticRig(width=160, height=120, fx=115.0, fy=115.0,
                       cx=80.0, cy=60.0)


def test_noop_degradation_is_exact():
    seq = syn.make_trajectory(3, RIG, seed=1)
    plain = list(syn.frames(seq, RIG))
    deg = list(syn.frames_degraded(seq, RIG, syn.SensorDegradation()))
    for ((_, i0, d0), (_, i1, d1)) in zip(plain, deg):
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))


def test_degradations_engage():
    seq = syn.make_trajectory(3, RIG, seed=1)
    plain = list(syn.frames(seq, RIG))
    cfg = syn.SensorDegradation(depth_sigma=0.01, hole_p=0.08,
                                exposure_amp=0.25, read_noise=2.0,
                                rs_shear_px=3.0)
    deg = list(syn.frames_degraded(seq, RIG, cfg, seed=3))
    i0, d0 = np.asarray(plain[1][1]), np.asarray(plain[1][2])
    ia, da = np.asarray(deg[1][1]), np.asarray(deg[1][2])
    assert np.isfinite(ia).all() and np.isfinite(da).all()
    assert not np.allclose(i0, ia)
    # holes appear
    assert (da == 0).mean() > (d0 == 0).mean()
    # depth noise is depth-dependent but preserves validity mask modulo holes
    valid = (d0 > 0) & (da > 0)
    assert np.abs(da - d0)[valid].max() > 0
    assert ia.min() >= 0 and ia.max() <= 255


def test_dynamic_sphere_occludes_consistently():
    seq = syn.make_trajectory(2, RIG, seed=2)
    cfg = syn.SensorDegradation(dyn_radius=0.6, dyn_orbit=1.5)
    # place camera facing the sphere: frame 0 at origin looking +x
    plain = list(syn.frames(seq, RIG))
    deg = list(syn.frames_degraded(seq, RIG, cfg, seed=0))
    d0 = np.asarray(plain[0][2])
    da = np.asarray(deg[0][2])
    changed = ~np.isclose(d0, da)
    if changed.any():  # sphere in view: its depth must be closer than scene
        assert (da[changed] < d0[changed] + 1e-3).all()
        # image must change where depth changed (textured sphere)
        i0 = np.asarray(plain[0][1])
        ia = np.asarray(deg[0][1])
        assert not np.allclose(i0[changed], ia[changed])


def test_divergent_prefix_trajectories():
    s1 = syn.make_trajectory(10, RIG, seed=5, diverge_seed=1, diverge_after=5)
    s2 = syn.make_trajectory(10, RIG, seed=5, diverge_seed=2, diverge_after=5)
    base = syn.make_trajectory(10, RIG, seed=5)
    np.testing.assert_allclose(s1.P[:6], s2.P[:6])
    np.testing.assert_allclose(s1.P[:6], base.P[:6])
    assert not np.allclose(s1.P[9], s2.P[9])
    # IMU shared through the prefix cut
    t_cut = s1.times[5]
    imu1 = [(t, a, w) for (t, a, w) in s1.imu if t <= t_cut]
    imu2 = [(t, a, w) for (t, a, w) in s2.imu if t <= t_cut]
    assert len(imu1) == len(imu2)
    for (t1, a1, w1), (t2, a2, w2) in zip(imu1, imu2):
        assert t1 == t2
        np.testing.assert_allclose(a1, a2)
        np.testing.assert_allclose(w1, w2)
