"""Config loader tests against the reference's bundled rig files."""

import os

import numpy as np
import pytest

from vins_rgbd_fast_tpu.config import VinsConfig, load_config

REF = "/root/reference/config"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference configs not mounted")
def test_load_realsense():
    cfg = load_config(f"{REF}/realsense/vio.yaml")
    assert cfg.imu and cfg.static_init
    assert cfg.image_width == 640 and cfg.image_height == 480
    assert cfg.num_grid_rows == 5 and cfg.num_grid_cols == 6
    assert cfg.max_cnt == 30 and cfg.min_dist == 30
    assert cfg.max_num_iterations == 8
    np.testing.assert_allclose(cfg.intrinsics[0], 604.5821781259577)
    R = cfg.ric_matrix()
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(cfg.tic_vector(), [0.17336835, 0.049596, -0.10574841])
    assert cfg.estimate_td and cfg.rolling_shutter
    assert cfg.rolling_shutter_tr == pytest.approx(0.033)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference configs not mounted")
def test_load_tum_vo_mode():
    cfg = load_config(f"{REF}/tum_rgbd/tum_fr3.yaml")
    assert not cfg.imu  # VO mode
    assert cfg.max_cnt >= 100


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference configs not mounted")
def test_load_openloris():
    cfg = load_config(f"{REF}/openloris/openloris_vio.yaml")
    assert cfg.image_width == 848
    assert not cfg.static_init


def test_static_shape_knobs():
    cfg = VinsConfig(max_cnt=30)
    assert cfg.feature_capacity % 8 == 0
    assert cfg.feature_capacity >= 30
    assert cfg.frames == 11
    cam = cfg.camera()
    assert cam.width == 640
