"""Deterministic sensor-stream runtime (layer L6, host side).

Replaces the ROS nodelet dataflow (``/root/reference/vins_estimator/src/
estimator_nodelet.cpp``): callback queues + condvar threads become a
deterministic pull loop over a time-ordered message iterator.  Ported
behaviors, cited:

  * RGB-D stamp pairing within ±3 ms           (:209-225)
  * frontend input-rate gate FRONTEND_FREQ     (:265-271)
  * publish-rate gate FREQ -> PUB_THIS_FRAME   (:274-286)
  * stream-discontinuity detection (>1 s gap or
    backwards time) -> tracker+estimator reset (:243-262)
  * IMU disorder dropping                      (:110-114, in estimator)
  * depth decode mono16/16UC1 (mm) / 32FC1 (m) (:511-533)
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, NamedTuple, Optional, Tuple

import numpy as np


class ImuMsg(NamedTuple):
    t: float
    acc: np.ndarray
    gyr: np.ndarray


class ImageMsg(NamedTuple):
    t: float
    image: np.ndarray  # (H, W) grayscale float32 [0,255]


class DepthMsg(NamedTuple):
    t: float
    depth: np.ndarray  # (H, W) float32 meters


class RgbdFrame(NamedTuple):
    t: float
    image: np.ndarray
    depth: np.ndarray
    publish: bool  # PUB_THIS_FRAME


def decode_depth(raw: np.ndarray, encoding: str) -> np.ndarray:
    """Depth image to meters (estimator_nodelet.cpp:511-533)."""
    if encoding in ("mono16", "16UC1"):
        return raw.astype(np.float32) / 1000.0
    if encoding == "32FC1":
        return raw.astype(np.float32)
    raise ValueError(f"unsupported depth encoding {encoding}")


@dataclasses.dataclass
class StreamPairer:
    """Pairs RGB and depth by stamp, applies rate gates, flags resets."""

    frontend_freq: float = 20.0
    publish_freq: float = 10.0
    pair_tol: float = 0.003  # ±3 ms (:216)
    gap_reset: float = 1.0  # >1 s gap -> reset (:245)

    def __post_init__(self):
        self._img_buf: list = []
        self._depth_buf: list = []
        self.last_image_time: Optional[float] = None
        self.first_image_time: Optional[float] = None
        self.last_pub_time: Optional[float] = None
        self.pub_count = 0
        self.reset_flag = False

    def push_image(self, msg: ImageMsg):
        self._img_buf.append(msg)

    def push_depth(self, msg: DepthMsg):
        self._depth_buf.append(msg)

    def _pop_pair(self) -> Optional[Tuple[ImageMsg, DepthMsg]]:
        while self._img_buf and self._depth_buf:
            img = self._img_buf[0]
            dep = self._depth_buf[0]
            if img.t < dep.t - self.pair_tol:
                self._img_buf.pop(0)  # drop unmatched old image
            elif dep.t < img.t - self.pair_tol:
                self._depth_buf.pop(0)
            else:
                self._img_buf.pop(0)
                self._depth_buf.pop(0)
                return img, dep
        return None

    def next_frame(self) -> Optional[RgbdFrame]:
        """Returns the next paired + rate-gated frame, or None."""
        while True:
            pair = self._pop_pair()
            if pair is None:
                return None
            img, dep = pair
            t = img.t

            # discontinuity detection (:243-262)
            if self.last_image_time is not None and (
                t < self.last_image_time or t - self.last_image_time > self.gap_reset
            ):
                self.reset_flag = True
                self.first_image_time = None
                self.last_pub_time = None
                self.pub_count = 0
            self.last_image_time = t

            if self.first_image_time is None:
                self.first_image_time = t
                self.last_pub_time = t

            # frontend input gate (:265-271): keep at most frontend_freq Hz
            if self.frontend_freq > 0:
                elapsed = t - self.first_image_time
                if elapsed > 0 and (self.pub_count + 1) / elapsed > self.frontend_freq * 1.15:
                    continue  # skip frame entirely

            # publish gate (:274-286): PUB_THIS_FRAME at publish_freq
            publish = True
            if self.publish_freq > 0:
                elapsed = max(t - self.first_image_time, 1e-9)
                rate = self.pub_count / elapsed
                publish = rate <= self.publish_freq
                if publish and abs(rate - self.publish_freq) < 0.01 * self.publish_freq:
                    self.first_image_time = t
                    self.pub_count = 0
            if publish:
                self.pub_count += 1
            return RgbdFrame(t=t, image=img.image, depth=dep.depth, publish=publish)

    def consume_reset(self) -> bool:
        r = self.reset_flag
        self.reset_flag = False
        return r


def write_trajectory_csv(path: str, trajectory: Iterable[dict]):
    """``vins_result_no_loop.csv`` format (visualization.cpp:215-225):
    stamp_ns,x,y,z,qw,qx,qy,qz,vx,vy,vz,"""
    with open(path, "w") as f:
        for rec in trajectory:
            Q = rec["Q"]
            P = rec["P"]
            V = rec["V"]
            f.write(
                f"{rec['t'] * 1e9:.0f},{P[0]:.5f},{P[1]:.5f},{P[2]:.5f},"
                f"{Q[0]:.5f},{Q[1]:.5f},{Q[2]:.5f},{Q[3]:.5f},"
                f"{V[0]:.5f},{V[1]:.5f},{V[2]:.5f},\n"
            )


def write_tum_trajectory(path: str, trajectory: Iterable[dict]):
    """rpg_trajectory_evaluation / TUM format: t x y z qx qy qz qw
    (the reference's ``stamped_traj_estimate``, pose_graph.cpp:855-864)."""
    with open(path, "w") as f:
        for rec in trajectory:
            Q = rec["Q"]
            P = rec["P"]
            f.write(
                f"{rec['t']:.6f} {P[0]:.6f} {P[1]:.6f} {P[2]:.6f} "
                f"{Q[1]:.6f} {Q[2]:.6f} {Q[3]:.6f} {Q[0]:.6f}\n"
            )


def ate_rmse(est_t, est_P, gt_t, gt_P, align=True) -> float:
    """Absolute trajectory error RMSE after stamp association (±10 ms) and
    optional SE(3) (Umeyama, no scale) alignment — the evaluation metric of
    the reference's workflow (rpg_trajectory_evaluation)."""
    est_t = np.asarray(est_t)
    gt_t = np.asarray(gt_t)
    pairs = []
    j = 0
    for i, t in enumerate(est_t):
        j = int(np.argmin(np.abs(gt_t - t)))
        if abs(gt_t[j] - t) < 0.01:
            pairs.append((i, j))
    if len(pairs) < 3:
        return float("nan")
    E = np.asarray([est_P[i] for i, _ in pairs])
    Gt = np.asarray([gt_P[j] for _, j in pairs])
    if align:
        mu_e = E.mean(0)
        mu_g = Gt.mean(0)
        H = (E - mu_e).T @ (Gt - mu_g)
        U, _, Vt = np.linalg.svd(H)
        S = np.diag([1.0, 1.0, np.sign(np.linalg.det(Vt.T @ U.T))])
        R = Vt.T @ S @ U.T
        E = (E - mu_e) @ R.T + mu_g
    return float(np.sqrt(np.mean(np.sum((E - Gt) ** 2, axis=1))))
