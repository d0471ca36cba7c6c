"""Pallas LK kernel tests (interpret mode on CPU): equivalence with the
XLA LK implementation on synthetic translations."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vins_rgbd_fast_tpu.ops import image as image_ops
from vins_rgbd_fast_tpu.ops import lk as lk_ops
from vins_rgbd_fast_tpu.ops import lk_pallas

from tests.test_frontend_ops import _pair


def test_pallas_lk_small_translation_interpret():
    shift = np.array([1.7, -2.3])
    img, img2 = _pair(120, 160, shift, seed=0)
    pts = jnp.asarray(np.array([[40.0, 40.0], [80.0, 60.0], [120.0, 90.0],
                                [60.0, 30.0]], np.float32))
    pyr1 = [jnp.asarray(img)]
    pyr2 = [jnp.asarray(img2)]
    res = lk_pallas.pyramidal_lk_pallas(pyr1, pyr2, pts, pts,
                                        jnp.ones(4, bool), interpret=True)
    assert bool(res.status.all())
    flow = np.asarray(res.pts) - np.asarray(pts)
    np.testing.assert_allclose(flow, np.tile(shift, (4, 1)), atol=0.2)


def test_pallas_lk_matches_xla_two_level():
    shift = np.array([11.0, -7.0])
    img, img2 = _pair(120, 160, shift, seed=5)
    pts = jnp.asarray(np.array([[50.0, 50.0], [90.0, 70.0]], np.float32))
    init = pts + jnp.asarray((shift + np.array([0.8, -0.6])).astype(np.float32))
    pyr1 = [jnp.asarray(a) for a in image_ops.build_pyramid(jnp.asarray(img), 2)]
    pyr2 = [jnp.asarray(a) for a in image_ops.build_pyramid(jnp.asarray(img2), 2)]
    res_x = lk_ops.pyramidal_lk(pyr1, pyr2, pts, init, jnp.ones(2, bool))
    res_p = lk_pallas.pyramidal_lk_pallas(pyr1, pyr2, pts, init,
                                          jnp.ones(2, bool), interpret=True)
    assert bool(res_p.status.all())
    np.testing.assert_allclose(np.asarray(res_p.pts), np.asarray(res_x.pts),
                               atol=0.1)


def test_pallas_lk_inactive_and_flat_points():
    img, img2 = _pair(120, 160, np.array([1.0, 1.0]), seed=7)
    flat = np.full((120, 160), 50.0, np.float32)  # no gradient
    pts = jnp.asarray(np.array([[60.0, 60.0], [80.0, 80.0]], np.float32))
    active = jnp.asarray([True, False])
    res = lk_pallas.pyramidal_lk_pallas([jnp.asarray(flat)], [jnp.asarray(flat)],
                                        pts, pts, active, interpret=True)
    # flat image: min-eig gate kills the active point; inactive stays dead
    assert not bool(res.status.any())
