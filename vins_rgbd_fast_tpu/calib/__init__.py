"""Intrinsic calibration suite (chessboard detection + Zhang init + device
LM bundle refinement) — capability twin of the reference's
``camera_model/src/{calib,chessboard}`` + ``intrinsic_calib.cc`` CLI.

Run as ``python -m vins_rgbd_fast_tpu.calib -w 8 -h 12 -s 7 -i dir/``.
"""

from .chessboard import detect_corners, find_chessboard, order_grid
from .calibrate import (CalibrationResult, board_points, calibrate,
                        homography, refine, write_camera_yaml,
                        zhang_intrinsics)

__all__ = [
    "CalibrationResult", "board_points", "calibrate", "detect_corners",
    "find_chessboard", "homography", "order_grid", "refine",
    "write_camera_yaml", "zhang_intrinsics",
]
