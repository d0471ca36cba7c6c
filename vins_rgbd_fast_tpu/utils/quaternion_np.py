"""Host-side (pure numpy) twins of the small quaternion/Euler helpers.

The pose graph's bookkeeping (drift composition, sequence alignment, node
setup) runs on host between device programs.  Calling the jnp helpers
there makes every tiny op an EAGER dispatch to the default device — on a
tunneled TPU that is ~0.3–1 ms each, and ``PoseGraph.optimize`` touches
every node (hundreds of dispatches per loop closure: measured ~9.7 s of
"loop time" in the round-3 bench before this module existed).  These
numpy forms are bit-equivalent in f64 and dispatch-free.

Conventions identical to utils/quaternion.py: wxyz, Hamilton product,
yaw-pitch-roll in DEGREES (Z-Y-X intrinsic, the reference's
``Utility::R2ypr``).
"""

from __future__ import annotations

import numpy as np


def qmul(q1: np.ndarray, q2: np.ndarray) -> np.ndarray:
    w1, x1, y1, z1 = q1
    w2, x2, y2, z2 = q2
    return np.asarray([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


def qconj(q: np.ndarray) -> np.ndarray:
    return q * np.asarray([1.0, -1.0, -1.0, -1.0])


def q2R(q: np.ndarray) -> np.ndarray:
    w, x, y, z = np.asarray(q, np.float64)
    n = w * w + x * x + y * y + z * z
    s = 0.0 if n == 0 else 2.0 / n
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return np.asarray([
        [1.0 - (yy + zz), xy - wz, xz + wy],
        [xy + wz, 1.0 - (xx + zz), yz - wx],
        [xz - wy, yz + wx, 1.0 - (xx + yy)],
    ])


def R2q(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> wxyz quaternion (Shepperd's branch method)."""
    R = np.asarray(R, np.float64)
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2.0
        return np.asarray([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                           (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    i = int(np.argmax(np.diag(R)))
    if i == 0:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2.0
        return np.asarray([(R[2, 1] - R[1, 2]) / s, 0.25 * s,
                           (R[0, 1] + R[1, 0]) / s, (R[0, 2] + R[2, 0]) / s])
    if i == 1:
        s = np.sqrt(1.0 - R[0, 0] + R[1, 1] - R[2, 2]) * 2.0
        return np.asarray([(R[0, 2] - R[2, 0]) / s, (R[0, 1] + R[1, 0]) / s,
                           0.25 * s, (R[1, 2] + R[2, 1]) / s])
    s = np.sqrt(1.0 - R[0, 0] - R[1, 1] + R[2, 2]) * 2.0
    return np.asarray([(R[1, 0] - R[0, 1]) / s, (R[0, 2] + R[2, 0]) / s,
                       (R[1, 2] + R[2, 1]) / s, 0.25 * s])


def R2ypr(R: np.ndarray) -> np.ndarray:
    """Rotation -> (yaw, pitch, roll) degrees (``Utility::R2ypr``)."""
    R = np.asarray(R, np.float64)
    n, o, a = R[:, 0], R[:, 1], R[:, 2]
    y = np.arctan2(n[1], n[0])
    p = np.arctan2(-n[2], n[0] * np.cos(y) + n[1] * np.sin(y))
    r = np.arctan2(a[0] * np.sin(y) - a[1] * np.cos(y),
                   -o[0] * np.sin(y) + o[1] * np.cos(y))
    return np.degrees(np.asarray([y, p, r]))


def ypr2R(ypr_deg) -> np.ndarray:
    y, p, r = np.radians(np.asarray(ypr_deg, np.float64))
    cy, sy = np.cos(y), np.sin(y)
    cp, sp = np.cos(p), np.sin(p)
    cr, sr = np.cos(r), np.sin(r)
    Rz = np.asarray([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1.0]])
    Ry = np.asarray([[cp, 0, sp], [0, 1.0, 0], [-sp, 0, cp]])
    Rx = np.asarray([[1.0, 0, 0], [0, cr, -sr], [0, sr, cr]])
    return Rz @ Ry @ Rx


def yaw_R(yaw_deg: float) -> np.ndarray:
    return ypr2R([yaw_deg, 0.0, 0.0])


def normalize_angle_deg(a):
    return (np.asarray(a) + 180.0) % 360.0 - 180.0
