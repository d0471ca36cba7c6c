"""Synthetic RGB-D + IMU sequence generator (analytic textured-room
renderer).

The reference is validated on D435i rosbags / TUM / OpenLORIS sequences
(``README.md:60-67``).  This environment has no datasets, so the framework
ships a deterministic generator producing the same sensor suite: grayscale
frames, aligned metric depth, 200 Hz IMU, and ground-truth trajectory —
all from closed forms (band-limited plane textures, exact ray-plane
depth), so frontend/backend accuracy is measurable against exact truth.

The renderer is a jitted JAX program (rays × 6 box planes) and doubles as
the frame source for the benchmark harness.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Iterator, List, NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import quaternion as quat

G = np.array([0.0, 0.0, 9.805])


# ---------------------------------------------------------------------------
# Room geometry: axis-aligned box, 6 textured planes
# ---------------------------------------------------------------------------

# plane: (normal, offset, u-axis, v-axis) with x·n = offset
_PLANES = [
    (np.array([0.0, 0.0, 1.0]), -1.5, np.array([1.0, 0, 0]), np.array([0.0, 1, 0])),  # floor
    (np.array([0.0, 0.0, 1.0]), 3.0, np.array([1.0, 0, 0]), np.array([0.0, 1, 0])),  # ceiling
    (np.array([1.0, 0.0, 0.0]), -6.0, np.array([0.0, 1, 0]), np.array([0.0, 0, 1])),
    (np.array([1.0, 0.0, 0.0]), 6.0, np.array([0.0, 1, 0]), np.array([0.0, 0, 1])),
    (np.array([0.0, 1.0, 0.0]), -6.0, np.array([1.0, 0, 0]), np.array([0.0, 0, 1])),
    (np.array([0.0, 1.0, 0.0]), 6.0, np.array([1.0, 0, 0]), np.array([0.0, 0, 1])),
]


def _plane_texture(u, v, seed):
    """Band-limited corner-rich texture: coarse + fine sharp blob grids +
    sinusoids.  The fine grid (≈0.25 m period, steep tanh) produces strong
    FAST corners at typical indoor viewing distances."""
    rng = np.random.default_rng(seed)
    # warp coordinates to break periodicity (distinct local appearance ->
    # BRIEF descriptors can disambiguate corners for loop closure)
    uw = u + 0.11 * jnp.sin(2.9 * v + 1.3) + 0.07 * jnp.sin(7.1 * v)
    vw = v + 0.11 * jnp.sin(3.7 * u + 0.7) + 0.07 * jnp.sin(6.3 * u)
    out = 60.0 * jnp.tanh(2.0 * jnp.sin(2 * jnp.pi * uw / 0.9)) * jnp.tanh(
        2.0 * jnp.sin(2 * jnp.pi * vw / 0.9)
    )
    ph_u, ph_v = rng.uniform(0, 2 * np.pi, 2)
    # amplitude-modulated sharp blob grid: strong corners, varying contrast
    mod = 0.55 + 0.45 * jnp.sin(1.91 * u + 3.07 * v + 0.9) * jnp.sin(
        0.83 * u - 2.11 * v + 2.2)
    out = out + 55.0 * mod * jnp.tanh(
        6.0 * jnp.sin(2 * jnp.pi * uw / 0.27 + ph_u)) * jnp.tanh(
        6.0 * jnp.sin(2 * jnp.pi * vw / 0.27 + ph_v))
    for _ in range(5):
        fu, fv = rng.uniform(2.0, 9.0, 2)
        ph = rng.uniform(0, 2 * np.pi)
        out = out + rng.uniform(10, 26) * jnp.sin(fu * u + fv * v + ph)
    return out


@dataclasses.dataclass(frozen=True)
class SyntheticRig:
    width: int = 640
    height: int = 480
    fx: float = 460.0
    fy: float = 460.0
    cx: float = 320.0
    cy: float = 240.0
    imu_rate: float = 200.0
    frame_rate: float = 20.0


@partial(jax.jit, static_argnames=("rig",))
def render_frame(rig: SyntheticRig, P_w: jax.Array, q_wc: jax.Array):
    """Render grayscale + depth for camera pose (position, world-from-cam
    quaternion).  Returns (image (H,W) f32 0..255, depth (H,W) f32 m)."""
    H, W = rig.height, rig.width
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    xn = (xx - rig.cx) / rig.fx
    yn = (yy - rig.cy) / rig.fy
    d_cam = jnp.stack([xn, yn, jnp.ones_like(xn)], axis=-1)  # (H,W,3), z=1
    R_wc = quat.q2R(q_wc)
    d_w = jnp.einsum("ij,hwj->hwi", R_wc, d_cam)

    best_t = jnp.full((H, W), 1e9, jnp.float32)
    best_i = jnp.full((H, W), 255.0, jnp.float32)
    for k, (n, off, ua, va) in enumerate(_PLANES):
        nj = jnp.asarray(n, jnp.float32)
        denom = jnp.einsum("hwi,i->hw", d_w, nj)
        t = (off - jnp.dot(P_w, nj)) / jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)
        hit = P_w[None, None, :] + t[..., None] * d_w
        u = jnp.einsum("hwi,i->hw", hit, jnp.asarray(ua, jnp.float32))
        v = jnp.einsum("hwi,i->hw", hit, jnp.asarray(va, jnp.float32))
        tex = _plane_texture(u, v, seed=k) + 128.0
        ok = (t > 0.05) & (t < best_t)
        best_t = jnp.where(ok, t, best_t)
        best_i = jnp.where(ok, tex, best_i)
    depth = jnp.where(best_t < 1e8, best_t, 0.0)
    img = jnp.clip(best_i, 0.0, 255.0)
    return img, depth


# ---------------------------------------------------------------------------
# Trajectory + sensor stream
# ---------------------------------------------------------------------------


class SyntheticSequence(NamedTuple):
    times: np.ndarray  # (N,) frame stamps
    P: np.ndarray  # (N,3) imu positions (world)
    Q: np.ndarray  # (N,4) world-from-imu quats
    V: np.ndarray  # (N,3)
    imu: List[Tuple[float, np.ndarray, np.ndarray]]  # (t, acc, gyr) @ imu_rate
    ric: np.ndarray  # (3,3) imu<-cam rotation
    tic: np.ndarray  # (3,)


def make_trajectory(
    n_frames: int, rig: SyntheticRig = SyntheticRig(), seed: int = 0,
    omega_scale: float = 0.25, acc_scale: float = 0.4,
    v0=(0.25, 0.1, 0.0),
) -> SyntheticSequence:
    """Smooth random walk in body rates, exact closed-form integration per
    frame interval; IMU sampled at rig.imu_rate with exact specific force."""
    rng = np.random.default_rng(seed)
    T_per = 1.0 / rig.frame_rate
    n_sub = max(int(round(rig.imu_rate / rig.frame_rate)), 1)

    P = [np.zeros(3)]
    Q = [np.array([1.0, 0, 0, 0])]
    V = [np.asarray(v0, np.float64)]
    times = [0.0]
    imu = [(0.0, np.asarray(quat.qrot_inv(jnp.asarray(Q[0]), jnp.asarray(G))), np.zeros(3))]

    w_b = rng.normal(size=3) * omega_scale
    a_w = rng.normal(size=3) * acc_scale
    for k in range(n_frames - 1):
        w_b = 0.8 * w_b + 0.2 * rng.normal(size=3) * omega_scale
        a_w = 0.8 * a_w + 0.2 * rng.normal(size=3) * acc_scale
        # softly steer back toward the room center
        a_w = a_w - 0.08 * P[-1] - 0.15 * V[-1]
        P0, Q0, V0 = P[-1], Q[-1], V[-1]
        t0 = times[-1]
        for s in range(1, n_sub + 1):
            t = T_per * s / n_sub
            q_t = np.asarray(quat.qmul(jnp.asarray(Q0), quat.so3_exp(jnp.asarray(w_b * t))))
            acc = np.asarray(quat.qrot_inv(jnp.asarray(q_t), jnp.asarray(a_w + G)))
            imu.append((t0 + t, acc, w_b.copy()))
        P.append(P0 + V0 * T_per + 0.5 * a_w * T_per ** 2)
        V.append(V0 + a_w * T_per)
        Q.append(np.asarray(quat.qmul(jnp.asarray(Q0), quat.so3_exp(jnp.asarray(w_b * T_per)))))
        times.append(t0 + T_per)

    # camera looks forward along +x of the body: R_ic maps cam axes
    # (z forward, x right, y down) to imu axes (x forward, y left, z up)
    ric = np.array([
        [0.0, 0.0, 1.0],
        [-1.0, 0.0, 0.0],
        [0.0, -1.0, 0.0],
    ])
    tic = np.array([0.05, 0.02, 0.01])
    return SyntheticSequence(
        times=np.asarray(times), P=np.stack(P), Q=np.stack(Q), V=np.stack(V),
        imu=imu, ric=ric, tic=tic,
    )


def camera_pose(seq: SyntheticSequence, k: int):
    """World-from-camera pose of frame k."""
    R_wi = np.asarray(quat.q2R(jnp.asarray(seq.Q[k])))
    R_wc = R_wi @ seq.ric
    t_wc = seq.P[k] + R_wi @ seq.tic
    return t_wc, np.asarray(quat.R2q(jnp.asarray(R_wc)))


def frames(seq: SyntheticSequence, rig: SyntheticRig) -> Iterator[Tuple[float, jax.Array, jax.Array]]:
    """Yield (t, image, depth) for each frame."""
    for k in range(len(seq.times)):
        t_wc, q_wc = camera_pose(seq, k)
        img, depth = render_frame(rig, jnp.asarray(t_wc, jnp.float32),
                                  jnp.asarray(q_wc, jnp.float32))
        yield float(seq.times[k]), img, depth
