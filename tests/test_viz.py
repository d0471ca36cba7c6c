"""Diagnostics tests (io/viz.py): track overlay, margin cloud, extrinsic
YAML dump — the visualization.cpp parity utilities."""

import numpy as np
import jax.numpy as jnp

from vins_rgbd_fast_tpu.io import viz


def test_track_overlay_colors_by_maturity():
    img = np.full((60, 80), 100.0, np.float32)
    uv = np.asarray([[20.0, 30.0], [60.0, 10.0], [200.0, 200.0]])
    valid = np.asarray([True, True, True])  # third is out of image
    cnt = np.asarray([0, 40, 5])  # new vs long-lived
    vel = np.asarray([[1.0, 0.0], [0.0, -1.0], [0.0, 0.0]])
    out = viz.draw_track_overlay(img, uv, valid, cnt, vel=vel)
    assert out.shape == (60, 80, 3) and out.dtype == np.uint8
    # new point red-ish, old point green-ish
    assert out[30, 20, 0] > 200 and out[30, 20, 1] < 50
    assert out[10, 60, 1] > 200 and out[10, 60, 0] < 50
    # untouched background stays gray (all channels equal)
    assert len(set(out[50, 50].tolist())) == 1


def test_margin_cloud_world_points():
    from vins_rgbd_fast_tpu.backend import estimator as est

    cfg = est.EstimatorConfig(maxf=16, max_imu=8, use_imu=True,
                              static_init=True, acc_n=0.1, gyr_n=0.01,
                              acc_w=1e-4, gyr_w=1e-5)
    state = est.init_estimator_state(cfg, np.eye(3), np.zeros(3), 0.0,
                                     jnp.float64)

    class FakeEst:
        pass

    fe = FakeEst()
    t = state.table
    ids = np.asarray(t.ids).copy()
    start = np.asarray(t.start).copy()
    dep = np.asarray(t.est_depth).copy()
    pts = np.asarray(t.pts).copy()
    ids[0], start[0], dep[0] = 7, 0, 2.0
    pts[0, 0] = [0.1, -0.2]
    ids[1], start[1], dep[1] = 8, 3, 1.0  # anchored later: not margined
    fe.state = state._replace(table=t._replace(
        ids=jnp.asarray(ids), start=jnp.asarray(start),
        est_depth=jnp.asarray(dep), pts=jnp.asarray(pts)))
    cloud = viz.margin_cloud(fe)
    assert cloud.shape == (1, 3)
    # identity pose + identity extrinsics: world = ray * depth
    np.testing.assert_allclose(cloud[0], [0.2, -0.4, 2.0], atol=1e-9)


def test_extrinsic_yaml_dump(tmp_path):
    path = str(tmp_path / "extrinsic.yaml")
    ric = np.asarray([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
    tic = np.asarray([0.05, 0.02, 0.01])
    viz.write_extrinsic_yaml(path, ric, tic, td=0.003)
    text = open(path).read()
    assert "extrinsicRotation" in text and "extrinsicTranslation" in text
    # every matrix entry appears with full precision
    nums = [float(x) for x in
            text.split("data: [")[1].split("]")[0].replace("\n", " ")
            .split(",")]
    np.testing.assert_allclose(np.asarray(nums).reshape(3, 3), ric)
    assert "td: 0.003000" in text
