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


def test_load_calibrated_kb_and_mei_yaml(tmp_path):
    """write_camera_yaml output for NON-pinhole models must round-trip
    through load_config + VinsConfig.camera() (camodocal writers emit
    model-specific projection_parameters keys — no fx/fy for KB/Mei)."""
    from vins_rgbd_fast_tpu.models import camera as cm

    kb = tmp_path / "kb.yaml"
    kb.write_text(
        "%YAML:1.0\n---\nmodel_type: KANNALA_BRANDT\ncamera_name: kb\n"
        "image_width: 640\nimage_height: 480\n"
        "projection_parameters:\n"
        "   k2: -0.01\n   k3: 0.002\n   k4: -0.0003\n   k5: 0.00004\n"
        "   mu: 350.0\n   mv: 352.0\n   u0: 321.0\n   v0: 239.0\n")
    cfg = load_config(str(kb))
    assert cfg.intrinsics == (350.0, 352.0, 321.0, 239.0)
    assert cfg.kb_distortion == (-0.01, 0.002, -0.0003, 0.00004)
    cam = cfg.camera()
    assert isinstance(cam.params, cm.EquidistantParams)
    assert cam.params.mu == 350.0 and cam.params.k5 == 0.00004

    mei = tmp_path / "mei.yaml"
    mei.write_text(
        "%YAML:1.0\n---\nmodel_type: MEI\ncamera_name: mei\n"
        "image_width: 640\nimage_height: 480\n"
        "mirror_parameters:\n   xi: 0.9\n"
        "distortion_parameters:\n"
        "   k1: -0.05\n   k2: 0.01\n   p1: 0.0\n   p2: 0.0\n"
        "projection_parameters:\n"
        "   gamma1: 860.0\n   gamma2: 856.0\n   u0: 318.0\n   v0: 242.0\n")
    cfg = load_config(str(mei))
    assert cfg.intrinsics == (860.0, 856.0, 318.0, 242.0)
    assert cfg.mirror_xi == 0.9
    cam = cfg.camera()
    assert isinstance(cam.params, cm.MeiParams)
    assert cam.params.xi == 0.9 and cam.params.gamma1 == 860.0
