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
from typing import Iterator, List, NamedTuple, Optional, Tuple

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
    # radtan distortion (reference rigs all carry it, e.g.
    # config/realsense/vio.yaml distortion_parameters): the renderer then
    # produces DISTORTED images/depth consistent with a PinholeCamera of
    # the same coefficients, so the pipeline's 8-iteration fixed-point
    # undistort (models/camera.py lift) runs — and is priced — on every
    # tracked feature
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0

    @property
    def has_distortion(self) -> bool:
        return any(abs(v) > 0 for v in (self.k1, self.k2, self.p1, self.p2))


@partial(jax.jit, static_argnames=("rig",))
def render_frame(rig: SyntheticRig, P_w: jax.Array, q_wc: jax.Array):
    """Render grayscale + depth for camera pose (position, world-from-cam
    quaternion).  Returns (image (H,W) f32 0..255, depth (H,W) f32 m)."""
    return _render_core(rig, P_w, q_wc,
                        jnp.zeros(3, jnp.float32), jnp.float32(0.0))


@partial(jax.jit, static_argnames=("rig",))
def render_frame_dynamic(rig: SyntheticRig, P_w: jax.Array, q_wc: jax.Array,
                         dyn_center: jax.Array, dyn_radius: jax.Array):
    """``render_frame`` plus a moving textured sphere (radius ≤ 0 disables)
    — the scene-level stressor for ``movingConsistencyCheck``-style dynamic
    -point rejection (the reference motivates it at estimator.cpp:1965-2008)."""
    return _render_core(rig, P_w, q_wc, dyn_center, dyn_radius)


def _render_core(rig: SyntheticRig, P_w, q_wc, dyn_center, dyn_radius):
    H, W = rig.height, rig.width
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    xn = (xx - rig.cx) / rig.fx
    yn = (yy - rig.cy) / rig.fy
    if rig.has_distortion:
        # each DISTORTED pixel receives the ray of its undistorted
        # normalized point: the SAME fixed-point inversion the pipeline's
        # camera lift runs (models/camera.py `_lift_pinhole`), so rendered
        # geometry and the estimator's camera model agree exactly
        from ..models.camera import _radtan_distort

        p_d = jnp.stack([xn, yn], axis=-1)
        p_u = p_d - _radtan_distort(p_d, rig.k1, rig.k2, rig.p1, rig.p2)
        for _ in range(7):
            p_u = p_d - _radtan_distort(p_u, rig.k1, rig.k2, rig.p1, rig.p2)
        xn, yn = p_u[..., 0], p_u[..., 1]
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
    # moving sphere: ray-sphere intersection, textured by surface normal
    # (|d_w| is not normalized: solve ‖P + t·d − c‖ = r in the scaled t)
    oc = P_w - dyn_center
    a = jnp.sum(d_w * d_w, axis=-1)
    bq = 2.0 * jnp.einsum("hwi,i->hw", d_w, oc)
    cq = jnp.dot(oc, oc) - dyn_radius * dyn_radius
    disc = bq * bq - 4.0 * a * cq
    t_s = (-bq - jnp.sqrt(jnp.maximum(disc, 0.0))) / (2.0 * a)
    hit_s = P_w[None, None, :] + t_s[..., None] * d_w
    nrm = (hit_s - dyn_center) / jnp.maximum(dyn_radius, 1e-6)
    tex_s = 128.0 + 70.0 * jnp.tanh(3.0 * jnp.sin(9.0 * nrm[..., 0]) *
                                    jnp.sin(9.0 * nrm[..., 1]) +
                                    2.0 * jnp.sin(7.0 * nrm[..., 2]))
    ok_s = (dyn_radius > 0) & (disc > 0) & (t_s > 0.05) & (t_s < best_t)
    best_t = jnp.where(ok_s, t_s, best_t)
    best_i = jnp.where(ok_s, tex_s, best_i)
    depth = jnp.where(best_t < 1e8, best_t, 0.0)
    img = jnp.clip(best_i, 0.0, 255.0)
    return img, depth


# ---------------------------------------------------------------------------
# Sensor degradation (real-failure-mode realism for the synthetic bench)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SensorDegradation:
    """Models the D435i failure modes the reference's robustness machinery
    exists for (depth fallbacks in triangulateWithDepth, dynamic-point
    rejection, CLAHE against exposure): quadratic-in-z depth noise, block
    dropouts + edge holes, exposure drift, image read noise, a rolling-
    shutter shear, and a moving sphere in the scene."""

    depth_sigma: float = 0.0   # σ(z) = depth_sigma · z² (m), D435i-like
    hole_p: float = 0.0        # per 16×16 block dropout probability
    edge_hole: bool = False    # zero depth at depth discontinuities
    exposure_amp: float = 0.0  # gain oscillation amplitude (e.g. 0.25)
    exposure_period: float = 4.0  # s
    read_noise: float = 0.0    # grayscale σ
    rs_shear_px: float = 0.0   # max horizontal shift across the frame height
    dyn_radius: float = 0.0    # moving sphere radius (m); 0 = off
    dyn_orbit: float = 2.0     # sphere orbit radius around room center (m)
    dyn_omega: float = 0.8     # sphere angular rate (rad/s)


@partial(jax.jit, static_argnames=("rig", "deg"))
def degrade_frame(rig: SyntheticRig, deg: SensorDegradation,
                  img: jax.Array, depth: jax.Array, key: jax.Array,
                  t: jax.Array):
    """Apply the configured degradations to one rendered frame."""
    H, W = rig.height, rig.width
    k1, k2, k3 = jax.random.split(key, 3)
    # exposure drift (CLAHE in the tracker must absorb this)
    if deg.exposure_amp > 0:
        gain = 1.0 + deg.exposure_amp * jnp.sin(
            2 * jnp.pi * t / deg.exposure_period)
        img = img * gain
    if deg.read_noise > 0:
        img = img + deg.read_noise * jax.random.normal(k1, img.shape)
    if deg.rs_shear_px > 0:
        # rolling-shutter approximation: per-row horizontal shift growing
        # down the frame (linear in readout time), linear interp
        rows = jnp.arange(H, dtype=jnp.float32)
        shift = deg.rs_shear_px * (rows / H - 0.5)
        x = jnp.arange(W, dtype=jnp.float32)[None, :] - shift[:, None]
        x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
        fx = x - x0
        img = (jnp.take_along_axis(img, x0, axis=1) * (1 - fx)
               + jnp.take_along_axis(img, x0 + 1, axis=1) * fx)
    img = jnp.clip(img, 0.0, 255.0)
    if deg.depth_sigma > 0:
        depth = jnp.where(
            depth > 0,
            depth + deg.depth_sigma * depth * depth
            * jax.random.normal(k2, depth.shape), depth)
    if deg.hole_p > 0:
        bh, bw = (H + 15) // 16, (W + 15) // 16
        drop = jax.random.bernoulli(k3, deg.hole_p, (bh, bw))
        drop = jnp.repeat(jnp.repeat(drop, 16, 0), 16, 1)[:H, :W]
        depth = jnp.where(drop, 0.0, depth)
    if deg.edge_hole:
        gy = jnp.abs(jnp.diff(depth, axis=0, prepend=depth[:1]))
        gx = jnp.abs(jnp.diff(depth, axis=1, prepend=depth[:, :1]))
        depth = jnp.where((gy > 0.3) | (gx > 0.3), 0.0, depth)
    return img, jnp.maximum(depth, 0.0)


def dyn_sphere_center(deg: SensorDegradation, t: float) -> np.ndarray:
    """The moving sphere's world position at time t (horizontal orbit)."""
    th = deg.dyn_omega * float(t)
    return np.array([deg.dyn_orbit * np.cos(th),
                     deg.dyn_orbit * np.sin(th), 0.6])


def frames_degraded(seq: SyntheticSequence, rig: SyntheticRig,
                    deg: SensorDegradation, seed: int = 0
                    ) -> Iterator[Tuple[float, jax.Array, jax.Array]]:
    """Yield (t, image, depth) with scene + sensor degradations applied."""
    key = jax.random.PRNGKey(seed)
    for k in range(len(seq.times)):
        t = float(seq.times[k])
        t_wc, q_wc = camera_pose(seq, k)
        if deg.dyn_radius > 0:
            img, depth = render_frame_dynamic(
                rig, jnp.asarray(t_wc, jnp.float32),
                jnp.asarray(q_wc, jnp.float32),
                jnp.asarray(dyn_sphere_center(deg, t), jnp.float32),
                jnp.float32(deg.dyn_radius))
        else:
            img, depth = render_frame(rig, jnp.asarray(t_wc, jnp.float32),
                                      jnp.asarray(q_wc, jnp.float32))
        img, depth = degrade_frame(rig, deg, img, depth,
                                   jax.random.fold_in(key, k),
                                   jnp.float32(t))
        yield t, img, depth


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
    diverge_seed=None, diverge_after: int = 0,
) -> SyntheticSequence:
    """Smooth random walk in body rates, exact closed-form integration per
    frame interval; IMU sampled at rig.imu_rate with exact specific force.

    ``diverge_seed``/``diverge_after``: with the same base ``seed``, two
    sequences share an IDENTICAL prefix through frame ``diverge_after`` and
    then follow per-``diverge_seed`` random walks — lets multi-sequence
    harnesses warm ONE pipeline on the common prefix and fan the state out
    to lanes that genuinely diverge afterwards (used by the multichip
    dryrun)."""
    rng = np.random.default_rng(seed)
    rng2 = (np.random.default_rng((seed, diverge_seed))
            if diverge_seed is not None else rng)
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
        r = rng2 if (diverge_seed is not None and k >= diverge_after) else rng
        w_b = 0.8 * w_b + 0.2 * r.normal(size=3) * omega_scale
        a_w = 0.8 * a_w + 0.2 * r.normal(size=3) * acc_scale
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


def make_revisit_trajectory(
    n_frames: int, rig: SyntheticRig = SyntheticRig(), seed: int = 0,
    accel: float = 1.6, axis=(1.0, 0.0, 0.0), cycles: int = 1,
    tic=(0.0, 0.0, 0.0),
) -> SyntheticSequence:
    """Oscillating out-and-back path that re-observes earlier regions —
    the loop-closure scenario (the reference's pose graph only earns its
    keep on revisits, ``pose_graph.cpp:308-393``).

    Bang-bang world acceleration along ``axis``: each cycle is four equal
    quarters (+A, −A, −A, +A), a triangle-wave position that returns to the
    start with zero velocity every cycle.  Zero body rotation keeps the
    analytically integrated IMU exact.  ``axis=(0,1,0)`` sweeps sideways
    relative to the forward-looking camera (strong parallax → keyframes;
    full view overlap on revisit → retrieval hits); the default +x moves
    along the view axis like the pipeline-loop tests."""
    rng = np.random.default_rng(seed)
    T_per = 1.0 / rig.frame_rate
    n_sub = max(int(round(rig.imu_rate / rig.frame_rate)), 1)
    ax = np.asarray(axis, np.float64)
    ax = ax / max(np.linalg.norm(ax), 1e-9)
    A = accel * (0.85 + 0.3 * rng.random())  # per-seed amplitude variation
    q = max(n_frames // (4 * cycles), 1)

    P = [np.zeros(3)]
    Q = [np.array([1.0, 0, 0, 0])]
    V = [np.zeros(3)]
    times = [0.0]
    imu = [(0.0, G.copy(), np.zeros(3))]
    for k in range(n_frames - 1):
        sign = (1.0, -1.0, -1.0, 1.0)[(k // q) % 4]
        a_w = sign * A * ax
        P0, V0, t0 = P[-1], V[-1], times[-1]
        for s in range(1, n_sub + 1):
            t = T_per * s / n_sub
            imu.append((t0 + t, a_w + G, np.zeros(3)))
        P.append(P0 + V0 * T_per + 0.5 * a_w * T_per ** 2)
        V.append(V0 + a_w * T_per)
        Q.append(Q[-1].copy())
        times.append(t0 + T_per)
    return SyntheticSequence(
        times=np.asarray(times), P=np.stack(P), Q=np.stack(Q), V=np.stack(V),
        imu=imu,
        ric=np.array([[0.0, 0, 1], [-1, 0, 0], [0, -1, 0]]),
        tic=np.asarray(tic, np.float64),
    )


def corrupt_imu(seq: SyntheticSequence, seed: int = 0,
                gyr_noise: float = 0.0, acc_noise: float = 0.0,
                gyr_bias_ramp: float = 0.0, acc_bias: float = 0.0,
                gyr_pulse: float = 0.0, pulse_frac=(0.25, 0.4),
                pulse_axis=(0.0, 0.0, 1.0),
                ) -> SyntheticSequence:
    """Return ``seq`` with CORRUPTED IMU measurements (ground-truth poses
    unchanged) — the drift source for loop-closure benches and tests.

    ``gyr_noise``/``acc_noise``: white noise σ per sample (rad/s, m/s²).
    ``gyr_bias_ramp``: a slowly RAMPING gyro bias reaching this magnitude
    (rad/s) at the end of the sequence, split across axes — it ramps faster
    than the estimator's random-walk prior (gyr_w) tracks, so heading error
    accumulates exactly the way the pose graph's 4-DoF correction exists to
    cancel (``pose_graph.cpp:410-581``).  ``acc_bias``: constant
    accelerometer bias magnitude (m/s²).

    ``gyr_pulse``: a gyro disturbance of this magnitude (rad/s) about
    ``pulse_axis`` (body frame) during the ``pulse_frac`` fraction of the
    sequence.  A fast pulse about the GRAVITY axis is the canonical
    drift source a tightly-coupled VIO cannot absorb: the bias
    random-walk prior can't track it, the induced global-yaw error is
    unobservable (the window's landmarks are marginalized within 10
    frames), so the estimator carries a PERMANENT heading+position offset
    afterward — the exact error class loop closure exists to remove."""
    rng = np.random.default_rng((seed, 77))
    t_end = max(float(seq.imu[-1][0]), 1e-9)
    gdir = rng.normal(size=3)
    gdir /= np.linalg.norm(gdir)
    adir = rng.normal(size=3)
    adir /= np.linalg.norm(adir)
    ab = acc_bias * adir
    pdir = np.asarray(pulse_axis, np.float64)
    pdir /= max(np.linalg.norm(pdir), 1e-9)
    p0, p1 = pulse_frac[0] * t_end, pulse_frac[1] * t_end
    out = []
    for (t, acc, gyr) in seq.imu:
        gn = gyr_noise * rng.normal(size=3) if gyr_noise else 0.0
        an = acc_noise * rng.normal(size=3) if acc_noise else 0.0
        gb = (gyr_bias_ramp * (t / t_end)) * gdir
        if gyr_pulse and p0 <= t < p1:
            gb = gb + gyr_pulse * pdir
        out.append((t, np.asarray(acc) + an + ab, np.asarray(gyr) + gn + gb))
    return seq._replace(imu=out)


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


@partial(jax.jit, static_argnames=("rig",))
def render_poses_batch(rig: SyntheticRig, P_w: jax.Array, q_wc: jax.Array):
    """Render N camera poses in ONE dispatch: (N,3),(N,4) -> (N,H,W)×2.

    The per-frame ``render_frame`` costs one tunneled dispatch each on the
    remote-TPU bench host (the axon transport serializes every launch over
    a stdio relay); pre-rendering a 212-frame × 8-sequence bench run frame
    by frame spends ~45 min in launch latency alone.  Batched it is ~10
    dispatches."""
    return jax.vmap(lambda P, q: _render_core(
        rig, P, q, jnp.zeros(3, jnp.float32), jnp.float32(0.0)))(P_w, q_wc)


def render_sequence_batch(seq: SyntheticSequence, rig: SyntheticRig,
                          k0: int = 0, k1: Optional[int] = None,
                          deg: Optional[SensorDegradation] = None,
                          seed: int = 0, chunk: int = 32):
    """Render frames [k0, k1) of ``seq`` in vmapped chunks; returns
    (times (T,), imgs (T,H,W), depths (T,H,W)) with the arrays on device.
    ``deg`` applies the sensor-degradation stack per frame (vmapped)."""
    if k1 is None:
        k1 = len(seq.times)
    poses = [camera_pose(seq, k) for k in range(k0, k1)]
    P = np.stack([p[0] for p in poses]).astype(np.float32)
    Q = np.stack([p[1] for p in poses]).astype(np.float32)
    ts = np.asarray(seq.times[k0:k1], np.float64)
    imgs, depths = [], []
    key = jax.random.PRNGKey(seed)
    for j0 in range(0, len(P), chunk):
        j1 = min(j0 + chunk, len(P))
        if deg is not None and deg.dyn_radius > 0:
            ctr = jnp.asarray(np.stack(
                [dyn_sphere_center(deg, float(t)) for t in ts[j0:j1]]),
                jnp.float32)
            im, dp = jax.vmap(lambda p, q, c: _render_core(
                rig, p, q, c, jnp.float32(deg.dyn_radius)))(
                    jnp.asarray(P[j0:j1]), jnp.asarray(Q[j0:j1]), ctr)
        else:
            im, dp = render_poses_batch(rig, jnp.asarray(P[j0:j1]),
                                        jnp.asarray(Q[j0:j1]))
        if deg is not None:
            keys = jnp.stack([jax.random.fold_in(key, k0 + j)
                              for j in range(j0, j1)])
            im, dp = jax.vmap(lambda i, d, k, t: degrade_frame(
                rig, deg, i, d, k, t))(
                    im, dp, keys, jnp.asarray(ts[j0:j1], jnp.float32))
        imgs.append(im)
        depths.append(dp)
    return ts, jnp.concatenate(imgs), jnp.concatenate(depths)
