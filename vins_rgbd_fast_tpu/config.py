"""Configuration system (layer L8).

Replaces the reference's two-stage config (roslaunch private params + OpenCV
``FileStorage`` YAML, ``vins_estimator/src/utility/parameters.cpp:81-243``)
with a frozen dataclass loaded from the *same YAML files* the reference
ships (``config/realsense/vio.yaml`` etc.), so reference rigs run unchanged.
Instead of ~40 mutable globals, the config is an immutable value threaded
through program builders; anything that affects traced shapes (window size,
feature caps, grid dims) is a static field here.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Optional, Tuple

import numpy as np

from .models.camera import CameraModel, make_camera


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class VinsConfig:
    """All knobs of the system. Field names follow the reference YAML keys."""

    # --- sensors / mode (parameters.cpp:118-141) ---
    imu: bool = True
    static_init: bool = True
    image_topic: str = "/camera/color/image_raw"
    depth_topic: str = "/camera/aligned_depth_to_color/image_raw"
    imu_topic: str = "/imu"

    # --- depth validity range (parameters.cpp:126-132) ---
    depth_min_dist: float = 0.3
    depth_max_dist: float = 6.0
    fix_depth: bool = True

    # --- frontend (parameters.cpp:92-116,150-165) ---
    frontend_freq: float = 20.0
    freq: float = 10.0
    num_grid_rows: int = 5
    num_grid_cols: int = 6
    max_cnt: int = 30
    min_dist: int = 30
    f_threshold: float = 1.0
    equalize: bool = False
    fisheye: bool = False
    fast_threshold: int = 20

    # --- camera intrinsics ---
    model_type: str = "PINHOLE"
    image_width: int = 640
    image_height: int = 480
    intrinsics: Tuple[float, ...] = (604.58, 604.25, 321.26, 239.71)  # fx fy cx cy
    distortion: Tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)  # k1 k2 p1 p2

    # --- extrinsics imu^T_cam (parameters.cpp:182-215) ---
    estimate_extrinsic: int = 0
    ric: Tuple[float, ...] = (1, 0, 0, 0, 1, 0, 0, 0, 1)  # row-major 3x3
    tic: Tuple[float, ...] = (0.0, 0.0, 0.0)

    # --- solver budget (parameters.cpp:99-101) ---
    max_solver_time: float = 0.04
    max_num_iterations: int = 8
    keyframe_parallax: float = 10.0  # pixels, / FOCAL_LENGTH at use site

    # --- IMU noise (parameters.cpp:146-152) ---
    acc_n: float = 1.0
    gyr_n: float = 0.01
    acc_w: float = 0.001
    gyr_w: float = 0.0001
    g_norm: float = 9.805

    # --- time offset / rolling shutter (parameters.cpp:217-239) ---
    estimate_td: bool = False
    td: float = 0.0
    rolling_shutter: bool = False
    rolling_shutter_tr: float = 0.0

    # --- loop closure ---
    loop_closure: bool = False
    fast_relocalization: bool = False
    pose_graph_save_path: str = "output/pose_graph"
    # keyframe gating before the pose graph (the reference reads these as
    # ROS private params, pose_graph_nodelet.cpp:77-78; default 0 = off)
    skip_dis: float = 0.0
    skip_cnt: int = 0

    # --- outputs ---
    output_path: str = "output"

    # --- compile-time constants of the reference (parameters.h:11-14) ---
    window_size: int = 10
    focal_length: float = 460.0

    # --- fisheye mask (reference FISHEYE_MASK, parameters.cpp) ---
    fisheye_mask: str = ""  # mask image path; "" + fisheye=1 -> analytic circle

    # --- non-pinhole camera extras (camodocal YAML passthrough) ---
    # KANNALA_BRANDT: intrinsics = (mu, mv, u0, v0), kb_distortion = (k2..k5)
    # MEI: intrinsics = (gamma1, gamma2, u0, v0), distortion = radtan, + xi
    kb_distortion: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0)
    mirror_xi: float = 0.0
    # SCARAMUZZA (OCAM): forward poly p0..p4, inverse poly p0..p11, affine
    # (ac, ad, ae, cx, cy) — ScaramuzzaCamera.cc:64-140 YAML layout
    ocam_poly: Tuple[float, ...] = ()
    ocam_inv_poly: Tuple[float, ...] = ()
    ocam_affine: Tuple[float, ...] = (1.0, 0.0, 0.0, 320.0, 240.0)

    # --- TPU-specific static shape knobs (no reference analog) ---
    max_features: int = 0  # 0 -> derived: max_cnt rounded up to a lane multiple
    max_imu_per_frame: int = 32  # IMU samples per image interval (200Hz/20Hz=10; padded)
    dtype: str = "float32"

    # ------------------------------------------------------------------
    @property
    def num_grids(self) -> int:
        return self.num_grid_rows * self.num_grid_cols

    @property
    def feature_capacity(self) -> int:
        """Static feature-table row count (lane-friendly)."""
        if self.max_features:
            return self.max_features
        return max(_round_up(int(self.max_cnt * 1.5), 8), 32)

    @property
    def frames(self) -> int:
        """Window frame count = WINDOW_SIZE + 1 (slots 0..10)."""
        return self.window_size + 1

    def camera(self) -> CameraModel:
        mt = self.model_type.upper()
        a, b, c, d = self.intrinsics
        if mt == "PINHOLE":
            k1, k2, p1, p2 = self.distortion
            return make_camera(
                "PINHOLE", fx=a, fy=b, cx=c, cy=d, k1=k1, k2=k2, p1=p1, p2=p2,
                width=self.image_width, height=self.image_height,
            )
        if mt in ("KANNALA_BRANDT", "EQUIDISTANT"):
            k2, k3, k4, k5 = self.kb_distortion
            return make_camera(
                "KANNALA_BRANDT", mu=a, mv=b, u0=c, v0=d,
                k2=k2, k3=k3, k4=k4, k5=k5,
                width=self.image_width, height=self.image_height,
            )
        if mt == "MEI":
            k1, k2, p1, p2 = self.distortion
            return make_camera(
                "MEI", xi=self.mirror_xi, gamma1=a, gamma2=b, u1=c, v1=d,
                k1=k1, k2=k2, p1=p1, p2=p2,
                width=self.image_width, height=self.image_height,
            )
        if mt == "SCARAMUZZA":
            C, D, E, cx, cy = self.ocam_affine
            return make_camera(
                "SCARAMUZZA", poly=tuple(self.ocam_poly),
                inv_poly=tuple(self.ocam_inv_poly),
                C=C, D=D, E=E, center_x=cx, center_y=cy,
                width=self.image_width, height=self.image_height,
            )
        raise NotImplementedError(
            f"unknown model_type {self.model_type!r}; expected PINHOLE, "
            f"KANNALA_BRANDT, MEI, or SCARAMUZZA"
        )

    def ric_matrix(self) -> np.ndarray:
        return np.asarray(self.ric, dtype=np.float64).reshape(3, 3)

    def tic_vector(self) -> np.ndarray:
        return np.asarray(self.tic, dtype=np.float64)


# ---------------------------------------------------------------------------
# OpenCV-flavoured YAML loading
# ---------------------------------------------------------------------------


def _parse_opencv_yaml(text: str) -> dict:
    """Parse OpenCV ``FileStorage`` YAML (the reference's config format).

    Handles the ``%YAML:1.0`` directive and ``!!opencv-matrix`` tags that
    standard YAML parsers reject, then defers to PyYAML.
    """
    import yaml

    text = re.sub(r"^%YAML:.*$", "", text, flags=re.MULTILINE)
    text = text.replace("!!opencv-matrix", "")
    data = yaml.safe_load(text)
    return data or {}


def _as_matrix(node) -> np.ndarray:
    arr = np.asarray(node["data"], dtype=np.float64)
    return arr.reshape(int(node["rows"]), int(node["cols"]))


def load_config(path: str) -> VinsConfig:
    """Load a reference-format YAML rig file into a VinsConfig."""
    with open(path) as f:
        raw = _parse_opencv_yaml(f.read())

    def get(key, default):
        return raw.get(key, default)

    proj = raw.get("projection_parameters", {})
    dist = raw.get("distortion_parameters", {})
    kwargs = dict(
        imu=bool(get("imu", 1)),
        static_init=bool(get("static_init", 0)),
        image_topic=get("image_topic", "/camera/color/image_raw"),
        depth_topic=get("depth_topic", "/camera/depth/image_raw"),
        imu_topic=get("imu_topic", "/imu"),
        depth_min_dist=float(get("depth_min_dist", 0.3)),
        depth_max_dist=float(get("depth_max_dist", 6.0)),
        fix_depth=bool(get("fix_depth", 1)),
        frontend_freq=float(get("frontend_freq", 20)),
        freq=float(get("freq", 10)),
        num_grid_rows=int(get("num_grid_rows", 5)),
        num_grid_cols=int(get("num_grid_cols", 6)),
        max_cnt=int(get("max_cnt", 150)),
        min_dist=int(get("min_dist", 30)),
        f_threshold=float(get("F_threshold", 1.0)),
        equalize=bool(get("equalize", 0)),
        fisheye=bool(get("fisheye", 0)),
        fisheye_mask=str(get("fisheye_mask", "")),
        model_type=str(get("model_type", "PINHOLE")),
        image_width=int(get("image_width", 640)),
        image_height=int(get("image_height", 480)),
        max_solver_time=float(get("max_solver_time", 0.04)),
        max_num_iterations=int(get("max_num_iterations", 8)),
        keyframe_parallax=float(get("keyframe_parallax", 10.0)),
        acc_n=float(get("acc_n", 1.0)),
        gyr_n=float(get("gyr_n", 0.01)),
        acc_w=float(get("acc_w", 0.001)),
        gyr_w=float(get("gyr_w", 0.0001)),
        g_norm=float(get("g_norm", 9.805)),
        estimate_extrinsic=int(get("estimate_extrinsic", 0)),
        estimate_td=bool(get("estimate_td", 0)),
        td=float(get("td", 0.0)),
        rolling_shutter=bool(get("rolling_shutter", 0)),
        rolling_shutter_tr=float(get("rolling_shutter_tr", 0.0)),
        fast_threshold=int(get("fast_threshold", 20)),
        loop_closure=bool(get("loop_closure", 0)),
        fast_relocalization=bool(get("fast_relocalization", 0)),
        pose_graph_save_path=str(get("pose_graph_save_path", "output/pose_graph")),
        skip_dis=float(get("skip_dis", 0.0)),
        skip_cnt=int(get("skip_cnt", 0)),
        output_path=str(get("output_path", "output")),
    )
    # intrinsics mapping is model-dependent (camodocal YAML writers emit
    # different projection_parameters keys per model — PinholeCamera /
    # EquidistantCamera / CataCamera ::writeParametersToYamlFile)
    if proj:
        if "fx" in proj:  # PINHOLE
            kwargs["intrinsics"] = (
                float(proj["fx"]), float(proj["fy"]),
                float(proj["cx"]), float(proj["cy"]),
            )
        elif "mu" in proj:  # KANNALA_BRANDT
            kwargs["intrinsics"] = (
                float(proj["mu"]), float(proj["mv"]),
                float(proj["u0"]), float(proj["v0"]),
            )
            kwargs["kb_distortion"] = (
                float(proj.get("k2", 0)), float(proj.get("k3", 0)),
                float(proj.get("k4", 0)), float(proj.get("k5", 0)),
            )
        elif "gamma1" in proj:  # MEI
            kwargs["intrinsics"] = (
                float(proj["gamma1"]), float(proj["gamma2"]),
                float(proj["u0"]), float(proj["v0"]),
            )
    if dist:
        kwargs["distortion"] = (
            float(dist.get("k1", 0)), float(dist.get("k2", 0)),
            float(dist.get("p1", 0)), float(dist.get("p2", 0)),
        )
    mirror = raw.get("mirror_parameters", {})
    if mirror:
        kwargs["mirror_xi"] = float(mirror.get("xi", 0.0))
    opoly = raw.get("poly_parameters", {})
    oinv = raw.get("inv_poly_parameters", {})
    oaff = raw.get("affine_parameters", {})
    if opoly and oinv:  # SCARAMUZZA (ScaramuzzaCamera.cc:64-140)
        kwargs["ocam_poly"] = tuple(
            float(opoly[f"p{i}"]) for i in range(len(opoly)))
        kwargs["ocam_inv_poly"] = tuple(
            float(oinv[f"p{i}"]) for i in range(len(oinv)))
        kwargs["ocam_affine"] = (
            float(oaff.get("ac", 1.0)), float(oaff.get("ad", 0.0)),
            float(oaff.get("ae", 0.0)),
            float(oaff.get("cx", kwargs["image_width"] / 2.0)),
            float(oaff.get("cy", kwargs["image_height"] / 2.0)))
    if kwargs["fisheye"] and not kwargs["fisheye_mask"]:
        import os
        d = os.path.dirname(os.path.abspath(path))
        for cand in (os.path.join(d, "fisheye_mask.jpg"),
                     os.path.join(os.path.dirname(d), "fisheye_mask.jpg")):
            if os.path.exists(cand):
                kwargs["fisheye_mask"] = cand
                break
    if "extrinsicRotation" in raw and raw.get("estimate_extrinsic", 0) != 2:
        kwargs["ric"] = tuple(_as_matrix(raw["extrinsicRotation"]).ravel().tolist())
    if "extrinsicTranslation" in raw and raw.get("estimate_extrinsic", 0) != 2:
        kwargs["tic"] = tuple(_as_matrix(raw["extrinsicTranslation"]).ravel().tolist())
    return VinsConfig(**kwargs)
