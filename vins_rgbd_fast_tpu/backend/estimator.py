"""Sliding-window VIO estimator (layer L5/L6): device programs + host shell.

Re-designs the reference's ``Estimator`` state machine
(``/root/reference/vins_estimator/src/estimator/estimator.{h,cpp}``:
INITIAL→NON_LINEAR, ``processIMU`` midpoint propagation, ``processImage``
keyframe decision → MARGIN_OLD/MARGIN_SECOND_NEW, the Ceres
``optimization()``, ``slideWindow``, ``failureDetection`` + auto-reboot,
``movingConsistencyCheck``) plus the nodelet's processing thread
(``estimator_nodelet.cpp:462-568``) as:

  * THREE jitted device programs —
      ``fill_step``  (window-filling phase, one trace for all slots),
      ``init_full``  (static/VO initialization at window-full),
      ``vio_step``   (steady state: ingest → propagate → triangulate →
                      solve → checks → marginalize → slide, ONE program)
  * a thin host class ``VinsEstimator`` owning the tiny amount of genuinely
    sequential state (frame counter, solver phase, reset logic) and the
    IMU interval bookkeeping.

All per-frame device state lives in one ``EstimatorState`` pytree; raw IMU
sample buffers are kept per interval so preintegrations are *re-propagated
from raw measurements at the current bias linearization every frame* (the
reference only repropagates at init — recomputing is cheap on TPU and
strictly more accurate).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import VinsConfig
from ..ops import imu_preintegration as imupre
from ..ops import marginalization as marg
from ..ops import ransac as ransac_ops
from ..ops import solver as slv
from ..utils import quaternion as quat
from . import feature_table as ftab
from . import initialization as init_ops
from .feature_table import FeatureTable, FrameFeatures
from .state import FRAMES, WINDOW_SIZE, WindowState, identity_state

FOCAL_LENGTH = 460.0


@dataclasses.dataclass(frozen=True)
class EstimatorConfig:
    """Static (trace-time) estimator configuration."""

    maxf: int
    max_imu: int = 32
    use_imu: bool = True
    static_init: bool = True
    estimate_td: bool = False
    estimate_extrinsic: bool = False
    fix_depth: bool = True
    depth_min_dist: float = 0.3
    depth_max_dist: float = 6.0
    min_parallax: float = 10.0 / FOCAL_LENGTH
    g_norm: float = 9.805
    acc_n: float = 1.0
    gyr_n: float = 0.01
    acc_w: float = 0.001
    gyr_w: float = 0.0001
    tr_over_row: float = 0.0  # rolling_shutter_tr / image_height
    max_iters: int = 8
    fast_relo: bool = False  # fast relocalization (relo factors in the BA)

    @classmethod
    def from_vins(cls, cfg: VinsConfig) -> "EstimatorConfig":
        return cls(
            maxf=cfg.feature_capacity,
            max_imu=cfg.max_imu_per_frame,
            use_imu=cfg.imu,
            static_init=cfg.static_init,
            estimate_td=cfg.estimate_td,
            estimate_extrinsic=cfg.estimate_extrinsic > 0,
            fix_depth=cfg.fix_depth,
            depth_min_dist=cfg.depth_min_dist,
            depth_max_dist=cfg.depth_max_dist,
            min_parallax=cfg.keyframe_parallax / cfg.focal_length,
            g_norm=cfg.g_norm,
            acc_n=cfg.acc_n, gyr_n=cfg.gyr_n, acc_w=cfg.acc_w, gyr_w=cfg.gyr_w,
            tr_over_row=(cfg.rolling_shutter_tr / cfg.image_height
                         if cfg.rolling_shutter else 0.0),
            max_iters=cfg.max_num_iterations,
            fast_relo=cfg.fast_relocalization,
        )

    @property
    def solver(self) -> slv.SolverConfig:
        return slv.SolverConfig(
            maxf=self.maxf,
            max_iters=self.max_iters,
            use_imu=self.use_imu,
            estimate_td=self.estimate_td,
            estimate_extrinsic=self.estimate_extrinsic,
            fix_pose0=not self.use_imu,
            yaw_gauge=self.use_imu,
            with_relo=self.fast_relo,
        )

    @property
    def noise(self) -> imupre.ImuNoise:
        return imupre.ImuNoise(
            acc_n=jnp.asarray(self.acc_n), gyr_n=jnp.asarray(self.gyr_n),
            acc_w=jnp.asarray(self.acc_w), gyr_w=jnp.asarray(self.gyr_w),
        )

    def gravity(self, dtype=jnp.float32) -> jax.Array:
        return jnp.asarray([0.0, 0.0, self.g_norm], dtype)


class EstimatorState(NamedTuple):
    """Complete device-side state of the backend."""

    x: WindowState
    table: FeatureTable
    prior: slv.PriorFactor
    # raw IMU buffers: slot j spans (frame j-1, frame j]; slot 0 unused
    imu_dts: jax.Array  # (FRAMES, MAXI)
    imu_acc: jax.Array  # (FRAMES, MAXI+1, 3)
    imu_gyr: jax.Array  # (FRAMES, MAXI+1, 3)
    # failure-detection anchors (reference last_P/last_R)
    last_P: jax.Array  # (3,)
    last_Q: jax.Array  # (4,)


def init_estimator_state(cfg: EstimatorConfig, ric: np.ndarray, tic: np.ndarray,
                         td: float, dtype=jnp.float32) -> EstimatorState:
    x = identity_state(dtype)
    x = x._replace(
        qic=quat.R2q(jnp.asarray(ric, dtype)),
        tic=jnp.asarray(tic, dtype),
        td=jnp.asarray(td, dtype),
    )
    return EstimatorState(
        x=x,
        table=ftab.empty_table(cfg.maxf, dtype),
        prior=slv.empty_prior(dtype),
        imu_dts=jnp.zeros((FRAMES, cfg.max_imu), dtype),
        imu_acc=jnp.zeros((FRAMES, cfg.max_imu + 1, 3), dtype),
        imu_gyr=jnp.zeros((FRAMES, cfg.max_imu + 1, 3), dtype),
        last_P=jnp.zeros(3, dtype),
        last_Q=quat.q_identity(dtype),
    )


class ImuInterval(NamedTuple):
    """One frame interval of IMU samples (fixed capacity, zero-padded)."""

    dts: jax.Array  # (MAXI,)
    acc: jax.Array  # (MAXI+1, 3)
    gyr: jax.Array  # (MAXI+1, 3)


def empty_interval(cfg: EstimatorConfig, dtype=jnp.float32) -> ImuInterval:
    return ImuInterval(
        dts=jnp.zeros((cfg.max_imu,), dtype),
        acc=jnp.zeros((cfg.max_imu + 1, 3), dtype),
        gyr=jnp.zeros((cfg.max_imu + 1, 3), dtype),
    )




def _f32_matmul(fn):
    """Trace the wrapped program under float32 matmul precision.

    TPU matmuls default to bf16 multiplications; the Schur/normal-equation
    chains amplify that (measured: ATE 0.44 m vs 0.0065 m on the bench
    sequence).  Accuracy is a correctness requirement for the solver, so
    the backend programs force full f32 (≈8% fps cost)."""
    import functools

    @functools.wraps(fn)
    def wrapped(*a, **k):
        with jax.default_matmul_precision("float32"):
            return fn(*a, **k)

    return wrapped


# ---------------------------------------------------------------------------
# Shared device helpers
# ---------------------------------------------------------------------------


def _make_preints(cfg: EstimatorConfig, st: EstimatorState) -> slv.ImuData:
    """Re-propagate all window preintegrations from raw buffers at the
    current per-frame bias linearization (vmapped scan)."""
    ba = st.x.Ba[:-1]  # interval i -> i+1 linearizes at frame i biases
    bg = st.x.Bg[:-1]
    pre = jax.vmap(
        lambda d, a, g, b1, b2: imupre.preintegrate(d, a, g, b1, b2, cfg.noise)
    )(st.imu_dts[1:], st.imu_acc[1:], st.imu_gyr[1:], ba, bg)
    valid = (jnp.sum(st.imu_dts[1:], axis=1) > 0) & (
        jnp.sum(st.imu_dts[1:], axis=1) < 10.0
    )
    return slv.ImuData(pre=pre, valid=valid)


def _visual_data(cfg: EstimatorConfig, t: FeatureTable) -> slv.VisualData:
    inv_depth, free, valid = ftab.solver_depth_view(t, cfg.fix_depth)
    return slv.VisualData(
        start=t.start,
        pts=t.pts,
        vel=t.vel,
        td_obs=t.td_obs,
        row_scaled=t.uv[..., 1] * cfg.tr_over_row,
        obs_mask=t.obs_mask,
        inv_depth=inv_depth,
        depth_free=free,
        valid=valid,
    )


def _propagate_newest(cfg: EstimatorConfig, st: EstimatorState, j: jax.Array) -> WindowState:
    """IMU-propagate frame j's state from frame j-1 through slot-j samples
    (the reference's per-sample ``processIMU`` integration, collapsed to
    one preintegration compose)."""
    x = st.x
    dtype = x.P.dtype
    i = j - 1
    pre = imupre.preintegrate(
        st.imu_dts[j], st.imu_acc[j], st.imu_gyr[j], x.Ba[i], x.Bg[i], cfg.noise
    )
    g = cfg.gravity(dtype)
    dt = pre.sum_dt
    Qi = x.Q[i]
    Pj = x.P[i] + x.V[i] * dt - 0.5 * g * dt * dt + quat.qrot(Qi, pre.delta_p)
    Vj = x.V[i] - g * dt + quat.qrot(Qi, pre.delta_v)
    Qj = quat.qnormalize(quat.qmul(Qi, pre.delta_q))
    return x._replace(
        P=x.P.at[j].set(Pj),
        Q=x.Q.at[j].set(Qj),
        V=x.V.at[j].set(Vj),
        Ba=x.Ba.at[j].set(x.Ba[i]),
        Bg=x.Bg.at[j].set(x.Bg[i]),
    )


def _store_interval(st: EstimatorState, j: jax.Array, imu: ImuInterval) -> EstimatorState:
    return st._replace(
        imu_dts=st.imu_dts.at[j].set(imu.dts),
        imu_acc=st.imu_acc.at[j].set(imu.acc),
        imu_gyr=st.imu_gyr.at[j].set(imu.gyr),
    )


def _pnp_newest(cfg: EstimatorConfig, st: EstimatorState, key) -> WindowState:
    """VO-mode pose init for the newest frame by PnP on depth-anchored
    landmarks (``initFramePoseByPnP``, feature_manager.cpp:545-642)."""
    x = st.x
    t = st.table
    dtype = x.P.dtype
    j = FRAMES - 1
    # world points from start-frame estimated depth
    s = t.start
    pts_s = jnp.take_along_axis(t.pts, s[:, None, None], axis=1)[:, 0]  # (MAXF,2)
    rays = jnp.concatenate([pts_s, jnp.ones_like(pts_s[:, :1])], axis=-1)
    p_cam = rays * t.est_depth[:, None]
    t_wc, R_wc = ftab.cam_poses(x.P, x.Q, x.tic, x.qic)
    Rs = R_wc[s]
    ts = t_wc[s]
    p_w = jnp.einsum("nij,nj->ni", Rs, p_cam) + ts
    obs_j = t.pts[:, j]
    ok = (
        ftab.active_rows(t) & (t.est_depth > 0) & t.obs_mask[:, j] & ~t.is_dynamic
    )
    # initial guess: previous frame's camera pose (the reference seeds
    # solvePnP with it, feature_manager.cpp:560-588)
    R_prev = R_wc[j - 1]
    t_prev = t_wc[j - 1]
    res = ransac_ops.pnp_ransac_guess(
        key, p_w, obs_j, ok, R_prev.T, -R_prev.T @ t_prev,
        threshold=10.0 / 460.0,
    )
    R_cw = res.model[:, :3]
    t_cw = res.model[:, 3]
    # cam pose -> imu pose
    R_wc_j = R_cw.T
    t_wc_j = -R_cw.T @ t_cw
    R_wi = R_wc_j @ quat.q2R(x.qic).T
    P_wi = t_wc_j - R_wi @ x.tic
    use = res.ok
    return x._replace(
        P=x.P.at[j].set(jnp.where(use, P_wi, x.P[j])),
        Q=x.Q.at[j].set(jnp.where(use, quat.R2q(R_wi), x.Q[j])),
    )


def _moving_consistency(cfg: EstimatorConfig, x: WindowState, t: FeatureTable) -> FeatureTable:
    """Vectorized ``movingConsistencyCheck`` (estimator.cpp:1965-2008):
    mark features whose mean reprojection error exceeds 10px@460 or whose
    3D relative error exceeds 2.0 as dynamic."""
    t_wc, R_wc = ftab.cam_poses(x.P, x.Q, x.tic, x.qic)
    s = t.start
    pts_s = jnp.take_along_axis(t.pts, s[:, None, None], axis=1)[:, 0]
    rays_s = jnp.concatenate([pts_s, jnp.ones_like(pts_s[:, :1])], axis=-1)
    p_cam = rays_s * t.est_depth[:, None]
    p_w = jnp.einsum("nij,nj->ni", R_wc[s], p_cam) + t_wc[s]

    # project into every frame
    p_in_j = jnp.einsum("fji,nj->nfi", R_wc, p_w) - jnp.einsum(
        "fji,fj->fi", R_wc, t_wc
    )[None]
    z = p_in_j[..., 2]
    proj = p_in_j[..., :2] / jnp.where(jnp.abs(z) > 1e-6, z, 1e-6)[..., None]
    obs = t.pts  # (MAXF, F, 2)
    err2d = jnp.linalg.norm(proj - obs, axis=-1)
    rays_obs = jnp.concatenate([obs, jnp.ones_like(obs[..., :1])], axis=-1)
    err3d = jnp.linalg.norm(p_in_j - rays_obs, axis=-1) / jnp.maximum(
        t.est_depth[:, None], 1e-6
    )
    cnt_mask = t.obs_mask & (jnp.arange(FRAMES)[None, :] != s[:, None])
    n = jnp.maximum(jnp.sum(cnt_mask, axis=1), 1)
    mean2d = jnp.sum(jnp.where(cnt_mask, err2d, 0.0), axis=1) / n
    mean3d = jnp.sum(jnp.where(cnt_mask, err3d, 0.0), axis=1) / n
    checked = (
        ftab.active_rows(t) & (ftab.obs_count(t) >= 2)
        & (t.start < WINDOW_SIZE - 2) & (t.est_depth > 0)
        & (jnp.sum(cnt_mask, axis=1) > 0)
    )
    dynamic = checked & ((FOCAL_LENGTH * mean2d > 10.0) | (mean3d > 2.0))
    is_dyn = jnp.where(checked, dynamic, t.is_dynamic)
    return t._replace(is_dynamic=is_dyn)


def _failure_flags(cfg: EstimatorConfig, st: EstimatorState, x_new: WindowState,
                   last_track_num) -> jax.Array:
    """failureDetection (estimator.cpp:1113-1159) — returns a bool."""
    # "little feature": the visual front end collapsed (blackout, fast
    # motion), estimator.cpp:1115 — IMU coasting hides this from the
    # jump criteria for many frames
    few_tracks = last_track_num < 2
    big_ba = jnp.linalg.norm(x_new.Ba[WINDOW_SIZE]) > 2.5
    big_bg = jnp.linalg.norm(x_new.Bg[WINDOW_SIZE]) > 1.0
    dp = x_new.P[WINDOW_SIZE] - st.last_P
    big_t = jnp.linalg.norm(dp) > 5.0
    big_z = jnp.abs(dp[2]) > 1.0
    fail = few_tracks | big_ba | big_bg | big_t | big_z
    if not cfg.use_imu:
        fail = few_tracks | big_t | big_z
    return fail


def _slide(cfg: EstimatorConfig, st: EstimatorState, is_kf: jax.Array) -> EstimatorState:
    """Window slide, both flavors under lax.cond (slideWindow,
    estimator.cpp:1580-1716)."""
    def old(st):
        x0_t_wc, x0_R_wc = ftab.cam_poses(st.x.P, st.x.Q, st.x.tic, st.x.qic)
        table = ftab.slide_old(
            st.table, x0_t_wc[0], x0_R_wc[0], x0_t_wc[1], x0_R_wc[1]
        )
        x = marg.shift_state_old(st.x)

        def roll(a):
            out = jnp.roll(a, -1, axis=0)
            return out.at[-1].set(jnp.zeros_like(a[-1]))

        return st._replace(
            x=x, table=table,
            imu_dts=roll(st.imu_dts), imu_acc=roll(st.imu_acc), imu_gyr=roll(st.imu_gyr),
        )

    def new(st):
        table = ftab.slide_new(st.table)
        x = marg.shift_state_new(st.x)
        # merge interval (8,9] + (9,10] into slot 9 (slideWindowNew merges
        # preintegration buffers, estimator.cpp:1654-1680).  The merged
        # sample list can exceed the fixed capacity (chained non-keyframes);
        # rather than truncating (which silently drops integration time) we
        # decimate 2:1 — pair-summed dts with every-other sample values —
        # which preserves total time and low-frequency content.
        maxi = cfg.max_imu
        dtype = st.imu_dts.dtype
        n9 = jnp.sum(st.imu_dts[WINDOW_SIZE - 1] > 0).astype(jnp.int32)
        n10 = jnp.sum(st.imu_dts[WINDOW_SIZE] > 0).astype(jnp.int32)
        # build double-capacity merged buffers
        dts2 = jnp.zeros((2 * maxi,), dtype)
        acc2 = jnp.zeros((2 * maxi + 1, 3), dtype)
        gyr2 = jnp.zeros((2 * maxi + 1, 3), dtype)
        dts2 = jax.lax.dynamic_update_slice(dts2, st.imu_dts[WINDOW_SIZE - 1], (0,))
        acc2 = jax.lax.dynamic_update_slice(acc2, st.imu_acc[WINDOW_SIZE - 1], (0, 0))
        gyr2 = jax.lax.dynamic_update_slice(gyr2, st.imu_gyr[WINDOW_SIZE - 1], (0, 0))
        idx = jnp.arange(maxi)
        tgt = n9 + idx
        dts2 = dts2.at[tgt].set(st.imu_dts[WINDOW_SIZE], mode="drop")
        tgt1 = n9 + 1 + idx
        acc2 = acc2.at[tgt1].set(st.imu_acc[WINDOW_SIZE][1:], mode="drop")
        gyr2 = gyr2.at[tgt1].set(st.imu_gyr[WINDOW_SIZE][1:], mode="drop")
        total = n9 + n10
        fits = total <= maxi

        direct = (dts2[:maxi], acc2[: maxi + 1], gyr2[: maxi + 1])
        dec_dts = dts2[0::2] + dts2[1::2]  # (maxi,)
        dec_acc = jnp.concatenate([acc2[:1], acc2[2::2]], axis=0)  # (maxi+1,3)
        dec_gyr = jnp.concatenate([gyr2[:1], gyr2[2::2]], axis=0)
        decimated = (dec_dts, dec_acc, dec_gyr)
        m_dts, m_acc, m_gyr = jax.tree.map(
            lambda a, b: jnp.where(fits, a, b), direct, decimated
        )

        imu_dts = st.imu_dts.at[WINDOW_SIZE - 1].set(m_dts)
        imu_acc = st.imu_acc.at[WINDOW_SIZE - 1].set(m_acc)
        imu_gyr = st.imu_gyr.at[WINDOW_SIZE - 1].set(m_gyr)
        imu_dts = imu_dts.at[WINDOW_SIZE].set(0.0)
        return st._replace(x=x, table=table, imu_dts=imu_dts,
                           imu_acc=imu_acc, imu_gyr=imu_gyr)

    return jax.lax.cond(is_kf, old, new, st)


# ---------------------------------------------------------------------------
# Device programs
# ---------------------------------------------------------------------------


class StepOutput(NamedTuple):
    P: jax.Array  # newest pose (pre-slide)
    Q: jax.Array
    V: jax.Array
    Ba: jax.Array  # newest accel/gyro bias (pre-slide) for the fast IMU path
    Bg: jax.Array
    is_keyframe: jax.Array
    failure: jax.Array
    cost: jax.Array
    n_features: jax.Array
    n_dynamic: jax.Array  # features currently flagged by the moving-
    # consistency check (diagnostic; estimator.cpp:1965-2008)
    last_track_num: jax.Array
    relo_P: jax.Array  # optimized relocalization pose (zeros if unused)
    relo_Q: jax.Array
    relo_used: jax.Array
    # pose of the relocalized window frame (slot W-1: the keyframe whose
    # match points were injected last step, post-slide position) — the
    # host computes the refined loop-relative pose relo->cur from this
    # pair, the reference's relo_relative_t/q/yaw (estimator.cpp:1034-1057)
    relo_cur_P: jax.Array  # (3,)
    relo_cur_Q: jax.Array  # (4,)
    # newest frame's depth-anchored landmarks, exported PRE-slide (the
    # reference's pubKeyframe point cloud, visualization.cpp:454-520); the
    # slide clears the newest slot's obs_mask so a post-slide export would
    # always be empty
    wp_world: jax.Array  # (MAXF, 3)
    wp_uv: jax.Array  # (MAXF, 2)
    wp_norm: jax.Array  # (MAXF, 2)
    wp_valid: jax.Array  # (MAXF,) bool
    wp_ids: jax.Array  # (MAXF,) int32 feature ids (relo round-trip key)


@partial(jax.jit, static_argnames=("cfg",))
@_f32_matmul
def fill_step(
    cfg: EstimatorConfig,
    st: EstimatorState,
    frame_idx: jax.Array,  # scalar int32 in [0, WINDOW_SIZE]
    feats: FrameFeatures,
    imu: ImuInterval,
) -> Tuple[EstimatorState, jax.Array]:
    """Window-filling phase: store IMU, propagate, ingest, triangulate."""
    st = _store_interval(st, frame_idx, imu)
    if cfg.use_imu:
        # first frame: gravity-align initial attitude (initFirstIMUPose)
        q0 = init_ops.init_first_imu_pose(imu.acc, jnp.ones(imu.acc.shape[0], bool))
        x = st.x
        x_first = x._replace(Q=x.Q.at[0].set(q0))
        x_prop = _propagate_newest(cfg, st, frame_idx)
        x = jax.tree.map(
            lambda a, b: jnp.where(frame_idx == 0, a, b), x_first, x_prop
        )
        st = st._replace(x=x)
    else:
        x = st.x
        prev = jnp.maximum(frame_idx - 1, 0)
        st = st._replace(x=x._replace(
            P=x.P.at[frame_idx].set(x.P[prev]),
            Q=x.Q.at[frame_idx].set(x.Q[prev]),
        ))

    table, is_kf, _ = ftab.ingest_frame(
        st.table, frame_idx, feats, st.x.td, cfg.depth_min_dist, cfg.min_parallax
    )
    st = st._replace(table=table)
    if cfg.static_init or not cfg.use_imu:
        table = ftab.triangulate_with_depth(
            st.table, st.x.P, st.x.Q, st.x.tic, st.x.qic,
            cfg.depth_min_dist, cfg.depth_max_dist,
        )
        st = st._replace(table=table)
    return st, is_kf


def _solve_and_slide(
    cfg: EstimatorConfig,
    st: EstimatorState,
    is_kf: jax.Array,
    last_track_num: jax.Array,
    relo: Optional[slv.ReloData] = None,
) -> Tuple[EstimatorState, StepOutput]:
    """Shared tail: triangulate → solve → write-back → checks → marginalize
    → slide.  Used by both ``init_full`` and ``vio_step``."""
    dtype = st.x.P.dtype
    g = cfg.gravity(dtype)

    table = ftab.triangulate_with_depth(
        st.table, st.x.P, st.x.Q, st.x.tic, st.x.qic,
        cfg.depth_min_dist, cfg.depth_max_dist,
    )
    st = st._replace(table=table)

    vis = _visual_data(cfg, st.table)
    imu_data = _make_preints(cfg, st) if cfg.use_imu else None
    # one whitening pass shared by the solve AND the marginalization —
    # preintegration covariance propagation is the most expensive fixed
    # cost of a step, and the reference likewise marginalizes with the
    # same pre_integrations objects the solve used (estimator.cpp:
    # 1376-1481), relying on the first-order bias correction in evaluate
    sqrt_infos = (slv._imu_sqrt_infos(imu_data)
                  if (cfg.use_imu and imu_data is not None) else None)
    td_free = (jnp.linalg.norm(st.x.V[0]) > 0.2).astype(dtype) if cfg.use_imu else None

    if relo is not None:
        # bind the relo observations to the CURRENT table rows by feature
        # id (rows freed/recycled since keyframe export must not bind the
        # wrong landmark — reference matches by id, estimator.cpp:1307-1346)
        relo = slv.remap_relo_by_id(relo, st.table.ids)
    res = slv.solve(cfg.solver, st.x, vis, imu_data, st.prior, g, td_free,
                    relo, sqrt_infos=sqrt_infos)
    x_new = res.x
    table = ftab.update_depths_from_solver(st.table, res.inv_depth, vis.depth_free)
    table = _moving_consistency(cfg, x_new, table)

    failure = _failure_flags(cfg, st, x_new, last_track_num)
    st = st._replace(x=x_new, table=table)

    # marginalization (at the optimized state, pre-slide)
    vis_post = _visual_data(cfg, st.table)

    def m_old(st):
        return marg.marginalize_old(cfg.solver, st.x, vis_post, imu_data,
                                    st.prior, g, sqrt_infos=sqrt_infos)

    def m_new(st):
        return marg.marginalize_new(cfg.solver, st.x, st.prior)

    prior = jax.lax.cond(is_kf, m_old, m_new, st)
    st = st._replace(prior=prior)

    wp_world, wp_uv, wp_norm, wp_valid, wp_ids = _window_points(st.x, st.table)
    out = StepOutput(
        P=x_new.P[WINDOW_SIZE], Q=x_new.Q[WINDOW_SIZE], V=x_new.V[WINDOW_SIZE],
        Ba=x_new.Ba[WINDOW_SIZE], Bg=x_new.Bg[WINDOW_SIZE],
        is_keyframe=is_kf, failure=failure, cost=res.cost,
        n_features=jnp.sum(vis.valid),
        n_dynamic=jnp.sum(st.table.is_dynamic),
        last_track_num=last_track_num,
        relo_P=(res.relo_P if res.relo_P is not None else jnp.zeros(3, dtype)),
        relo_Q=(res.relo_Q if res.relo_Q is not None
                else jnp.asarray([1.0, 0, 0, 0], dtype)),
        relo_used=(relo.active if (cfg.fast_relo and relo is not None)
                   else jnp.asarray(False)),
        relo_cur_P=x_new.P[WINDOW_SIZE - 1], relo_cur_Q=x_new.Q[WINDOW_SIZE - 1],
        wp_world=wp_world, wp_uv=wp_uv, wp_norm=wp_norm, wp_valid=wp_valid,
        wp_ids=wp_ids,
    )
    st = st._replace(last_P=x_new.P[WINDOW_SIZE], last_Q=x_new.Q[WINDOW_SIZE])
    st = _slide(cfg, st, is_kf)
    return st, out


@partial(jax.jit, static_argnames=("cfg",))
@_f32_matmul
def init_dynamic(
    cfg: EstimatorConfig, st: EstimatorState, key: jax.Array
) -> Tuple[EstimatorState, StepOutput, jax.Array]:
    """Dynamic (in-motion) initialization at window-full — the capability of
    the reference's ``initialStructure`` + ``visualInitialAlignWithDepth``
    (estimator.cpp:384-579, 799-872), re-designed for RGB-D:

      1. IMU excitation check (std of Δv/Δt > 0.25);
      2. visual pose bootstrap: instead of the monocular 5-point + global
         SFM + PnP chain of the reference (whose ``relativePose`` already
         prefers depth-PnP, solve_5pts.cpp:251-294), poses are chained by
         depth-anchored PnP frame-to-frame — exact metric scale from the
         depth image, no scale variable to align;
      3. depth-validated triangulation over the bootstrapped window;
      4. gyro-bias least squares + per-frame velocity/gravity linear
         alignment (no scale), gravity-aligning the world frame;
      5. the standard solve/marginalize/slide tail.

    Returns (state, output, ok).  On ok=False the host slides the window
    and retries next frame (the reference's failed-init path).
    """
    dtype = st.x.P.dtype
    pre0 = _make_preints(cfg, st)
    excited = init_ops.imu_excitation_ok(
        pre0.pre.delta_v, pre0.pre.sum_dt, pre0.valid
    )

    # --- depth-PnP chain: camera poses in the frame-0 camera world -------
    t = st.table
    x = st.x
    rays_all = jnp.concatenate([t.pts, jnp.ones_like(t.pts[..., :1])], axis=-1)

    R_wc = jnp.tile(jnp.eye(3, dtype=dtype)[None], (FRAMES, 1, 1))
    t_wc = jnp.zeros((FRAMES, 3), dtype)
    chain_ok = jnp.asarray(True)
    for j in range(1, FRAMES):  # static chain, one PnP per link
        i = j - 1
        has_d = t.obs_mask[:, i] & t.obs_mask[:, j] & (t.depth_meas[:, i] > 0)
        p_cam_i = rays_all[:, i] * t.depth_meas[:, i][:, None]
        p_w = jnp.einsum("ab,nb->na", R_wc[i], p_cam_i) + t_wc[i]
        res = ransac_ops.pnp_ransac_guess(
            jax.random.fold_in(key, j), p_w, t.pts[:, j], has_d,
            R_wc[i].T, -R_wc[i].T @ t_wc[i],
            threshold=10.0 / 460.0, n_trials=8, refine_iters=6, min_inliers=8,
        )
        Rj = res.model[:, :3]
        tj = res.model[:, 3]
        R_wc = R_wc.at[j].set(jnp.where(res.ok, Rj.T, R_wc[i]))
        t_wc = t_wc.at[j].set(jnp.where(res.ok, -Rj.T @ tj, t_wc[i]))
        chain_ok = chain_ok & res.ok

    # camera chain -> imu poses (world = frame-0 camera frame for now)
    R_ic = quat.q2R(x.qic)
    R_wi = jnp.einsum("fab,cb->fac", R_wc, R_ic)  # R_wc @ R_ic^T
    P_wi = t_wc - jnp.einsum("fab,b->fa", R_wi, x.tic)
    Q_wi = quat.R2q(R_wi)

    # --- gyro bias + velocity/gravity alignment --------------------------
    dbg = init_ops.solve_gyroscope_bias(
        pre0.pre.delta_q,
        pre0.pre.jacobian[:, imupre.O_R:imupre.O_R + 3, imupre.O_BG:imupre.O_BG + 3],
        Q_wi, pre0.valid,
    )
    st1 = st._replace(x=x._replace(Bg=x.Bg + dbg[None, :]))
    pre1 = _make_preints(cfg, st1)
    V_c0, g_c0, align_ok = init_ops.linear_alignment_with_depth(
        pre1.pre.delta_p, pre1.pre.delta_v, pre1.pre.sum_dt,
        P_wi, Q_wi, st1.x.tic, pre1.valid, cfg.g_norm,
    )

    # rotate everything so gravity is world -z-up (g2R, yaw-zeroed)
    R0 = quat.g2R(g_c0)
    P_new = jnp.einsum("ab,fb->fa", R0, P_wi)
    P_new = P_new - P_new[0][None]
    R_new = jnp.einsum("ab,fbc->fac", R0, R_wi)
    # the alignment solves per-frame velocities in each frame's BODY frame
    # (estimator.cpp:850 rotates by frame_i->second.R before rot_diff)
    V_new = jnp.einsum("ab,fbc,fc->fa", R0, R_wi, V_c0)
    x_new = st1.x._replace(P=P_new, Q=quat.R2q(R_new), V=V_new)
    st1 = st1._replace(x=x_new)

    ok = excited & chain_ok & align_ok
    st2, out = _solve_and_slide(cfg, st1, jnp.asarray(True), jnp.asarray(50))
    # on failure: keep the ORIGINAL (un-rotated, un-marginalized) state,
    # merely slid — the reference's failed-init path (estimator.cpp:253-256)
    st_fail = _slide(cfg, st, jnp.asarray(True))
    st_out = jax.tree.map(lambda a, b: jnp.where(ok, a, b), st2, st_fail)
    return st_out, out, ok


def _dlt_triangulate(pts, obs_mask, R_cw, t_cw, pose_known):
    """Multiview DLT triangulation of every feature from the frames with
    known camera poses (the capability of ``GlobalSFM::triangulatePoint``,
    initial_sfm.cpp:16-36, batched).

    pts (MAXF, F, 2) normalized obs; R_cw/t_cw (F,3,3)/(F,3) world->cam.
    Returns (points_w (MAXF,3), n_obs (MAXF,), ok (MAXF,))."""
    dtype = pts.dtype
    # projection rows per (feature, frame): x·P[2] − P[0], y·P[2] − P[1]
    Pmat = jnp.concatenate([R_cw, t_cw[:, :, None]], axis=-1)  # (F,3,4)
    use = obs_mask & pose_known[None, :]  # (MAXF, F)
    x = pts[..., 0]
    y = pts[..., 1]
    r0 = x[..., None] * Pmat[None, :, 2, :] - Pmat[None, :, 0, :]  # (MAXF,F,4)
    r1 = y[..., None] * Pmat[None, :, 2, :] - Pmat[None, :, 1, :]
    w = use.astype(dtype)[..., None]
    A = jnp.concatenate([r0 * w, r1 * w], axis=1)  # (MAXF, 2F, 4)
    M = jnp.einsum("nia,nib->nab", A, A)  # (MAXF,4,4)
    # smallest eigvec by inverse iteration (batched 4x4)
    n_obs = jnp.sum(use, axis=1)
    tr = jnp.trace(M, axis1=1, axis2=2)
    Mj = M + (1e-9 * tr[:, None, None] + 1e-12) * jnp.eye(4, dtype=dtype)[None]
    B = jnp.linalg.inv(Mj)
    v = jnp.ones((M.shape[0], 4), dtype) * 0.5
    for _ in range(4):
        v = jnp.einsum("nab,nb->na", B, v)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)
    pw = v[:, :3] / jnp.where(jnp.abs(v[:, 3:4]) > 1e-9, v[:, 3:4], 1e-9)
    # cheirality: positive depth in the frames used
    depths = jnp.einsum("fab,nb->nfa", R_cw, pw)[..., 2] + t_cw[None, :, 2]
    pos = jnp.sum((depths > 0.05) & use, axis=1)
    ok = (n_obs >= 2) & (pos >= jnp.maximum(n_obs - 1, 2))
    return pw, n_obs, ok


@partial(jax.jit, static_argnames=("cfg",))
@_f32_matmul
def init_mono(
    cfg: EstimatorConfig, st: EstimatorState, key: jax.Array
) -> Tuple[EstimatorState, StepOutput, jax.Array]:
    """Monocular (depth-less) SFM initialization — the capability of the
    reference's ``GlobalSFM::construct`` + scale-solving ``LinearAlignment``
    (initial_sfm.cpp:184-414, initial_aligment.cpp:94-168), used when the
    window has no usable depth measurements:

      1. IMU excitation check;
      2. reference-frame search: the earliest frame l with ≥30px@460 mean
         parallax against the newest frame (``relativePose``,
         estimator.cpp:884-920), relative pose by essential-matrix RANSAC
         with cheirality (``solveRelativeRT``);
      3. two-view DLT triangulation seeded from (l, newest), then rounds of
         {batched PnP of every frame against the current structure →
         multiview re-triangulation} (the PnP chain of ``construct``);
      4. windowed visual BA re-using the LM solver in VO mode;
      5. gyro-bias LS, then velocity/gravity/SCALE linear alignment
         (monocular: scale is a state), rescale + gravity-align the window;
      6. the standard solve/marginalize/slide tail.

    Returns (state, output, ok); on ok=False the host slides and retries.
    """
    dtype = st.x.P.dtype
    t = st.table
    x = st.x
    jW = FRAMES - 1
    pre0 = _make_preints(cfg, st)
    excited = init_ops.imu_excitation_ok(
        pre0.pre.delta_v, pre0.pre.sum_dt, pre0.valid
    )

    # --- 2. reference-frame search + essential RANSAC ---------------------
    common = t.obs_mask & t.obs_mask[:, jW][:, None] & ftab.active_rows(t)[:, None]
    par = jnp.linalg.norm(t.pts - t.pts[:, jW][:, None, :], axis=-1)  # (MAXF,F)
    n_common = jnp.sum(common, axis=0)  # (F,)
    mean_par = jnp.sum(jnp.where(common, par, 0.0), axis=0) / jnp.maximum(n_common, 1)
    cand = (n_common >= 20) & (mean_par * 460.0 > 30.0)
    cand = cand.at[jW].set(False)
    l = jnp.argmax(cand)  # earliest True (argmax of bool picks first)
    have_l = jnp.any(cand)

    pts_l = jnp.take_along_axis(t.pts, l[None, None, None].repeat(cfg.maxf, 0), axis=1)[:, 0]
    pts_W = t.pts[:, jW]
    pair_ok = jnp.take_along_axis(common, l[None, None].repeat(cfg.maxf, 0), axis=1)[:, 0]
    fm = ransac_ops.fundamental_ransac(
        key, pts_l, pts_W, pair_ok, threshold=0.3 / 460.0, n_trials=64,
        min_valid=15,
    )
    R_rel, t_rel, cheir = init_ops.decompose_essential(
        fm.model, pts_l, pts_W, fm.inliers)
    rel_ok = fm.ok & (fm.n_inliers > 12) & (cheir > 8)

    # --- 3. structure bootstrap: world = camera frame of l ----------------
    eyeF = jnp.tile(jnp.eye(3, dtype=dtype)[None], (FRAMES, 1, 1))
    R_cw = eyeF
    t_cw = jnp.zeros((FRAMES, 3), dtype)
    R_cw = R_cw.at[jW].set(R_rel)
    t_cw = t_cw.at[jW].set(t_rel)
    anchors = (jnp.arange(FRAMES) == l) | (jnp.arange(FRAMES) == jW)
    pose_known = anchors

    chain_ok = rel_ok
    for rnd in range(3):
        pw, n_obs, tri_ok = _dlt_triangulate(
            t.pts, t.obs_mask & ftab.active_rows(t)[:, None], R_cw, t_cw,
            pose_known)

        def pnp_frame(j, Rj, tj, kj):
            ok_j = t.obs_mask[:, j] & tri_ok & ftab.active_rows(t)
            res = ransac_ops.pnp_ransac_guess(
                kj, pw, t.pts[:, j], ok_j, Rj, tj,
                threshold=10.0 / 460.0, n_trials=8, refine_iters=8,
                min_inliers=10,
            )
            return res.model[:, :3], res.model[:, 3], res.ok

        keys_f = jax.random.split(jax.random.fold_in(key, rnd), FRAMES)
        Rn, tn, okn = jax.vmap(pnp_frame)(
            jnp.arange(FRAMES), R_cw, t_cw, keys_f)
        # only l and W anchor the gauge; every other frame (including ones
        # solved in earlier rounds) refines against the re-triangulated
        # structure each round
        upd = okn & ~anchors
        R_cw = jnp.where(upd[:, None, None], Rn, R_cw)
        t_cw = jnp.where(upd[:, None], tn, t_cw)
        pose_known = pose_known | okn
    chain_ok = chain_ok & jnp.all(pose_known)

    # camera chain -> imu rotations (positions stay camera, for alignment)
    R_wc = jnp.swapaxes(R_cw, 1, 2)
    t_wc = -jnp.einsum("fab,fb->fa", R_wc, t_cw)
    R_ic = quat.q2R(x.qic)
    R_wi = jnp.einsum("fab,cb->fac", R_wc, R_ic)
    Q_wi = quat.R2q(R_wi)

    # --- 4. visual-only BA over the bootstrapped window -------------------
    pw, _, tri_ok = _dlt_triangulate(
        t.pts, t.obs_mask & ftab.active_rows(t)[:, None], R_cw, t_cw,
        pose_known)
    s_all = t.start
    d_start = (jnp.einsum("nab,nb->na",
                          R_cw[s_all], pw) + t_cw[s_all])[:, 2]
    inv_d = 1.0 / jnp.maximum(d_start, 0.1)
    ba_cfg = dataclasses.replace(
        cfg, use_imu=False, fix_depth=False)
    x_ba = x._replace(P=t_wc - jnp.einsum("fab,b->fa", R_wi, x.tic),
                      Q=Q_wi)
    vis = slv.VisualData(
        start=t.start, pts=t.pts, vel=t.vel, td_obs=t.td_obs,
        row_scaled=t.uv[..., 1] * cfg.tr_over_row,
        obs_mask=t.obs_mask,
        inv_depth=inv_d,
        depth_free=tri_ok & ftab.active_rows(t),
        valid=tri_ok & ftab.active_rows(t),
    )
    res_ba = slv.solve(ba_cfg.solver, x_ba, vis, None, slv.empty_prior(dtype),
                       cfg.gravity(dtype))
    x_ba = res_ba.x
    # back to camera positions for the alignment
    t_wc_ba = x_ba.P + jnp.einsum("fab,b->fa", quat.q2R(x_ba.Q), x.tic)
    Q_ba = x_ba.Q

    # --- 5. gyro bias + scale/velocity/gravity alignment ------------------
    dbg = init_ops.solve_gyroscope_bias(
        pre0.pre.delta_q,
        pre0.pre.jacobian[:, imupre.O_R:imupre.O_R + 3, imupre.O_BG:imupre.O_BG + 3],
        Q_ba, pre0.valid,
    )
    st1 = st._replace(x=x._replace(Bg=x.Bg + dbg[None, :]))
    pre1 = _make_preints(cfg, st1)
    V_body, g_c0, s_scale, align_ok = init_ops.linear_alignment(
        pre1.pre.delta_p, pre1.pre.delta_v, pre1.pre.sum_dt,
        t_wc_ba, Q_ba, st1.x.tic, pre1.valid, cfg.g_norm,
    )

    # rescale to meters + convert camera->imu positions (visualInitialAlign)
    P_imu = s_scale * t_wc_ba - jnp.einsum(
        "fab,b->fa", quat.q2R(Q_ba), st1.x.tic)
    P_imu = P_imu - P_imu[0][None]
    R0 = quat.g2R(g_c0)
    P_new = jnp.einsum("ab,fb->fa", R0, P_imu)
    R_new = jnp.einsum("ab,fbc->fac", R0, quat.q2R(Q_ba))
    V_new = jnp.einsum("ab,fbc,fc->fa", R0, quat.q2R(Q_ba), V_body)
    x_new = st1.x._replace(P=P_new, Q=quat.R2q(R_new), V=V_new)
    # seed the table with the scaled structure so the tail's SVD fallback
    # starts from a consistent estimate
    table1 = st1.table._replace(
        est_depth=jnp.where(tri_ok, s_scale * d_start, st1.table.est_depth))
    st1 = st1._replace(x=x_new, table=table1)

    ok = excited & have_l & chain_ok & align_ok & jnp.isfinite(s_scale)
    st2, out = _solve_and_slide(cfg, st1, jnp.asarray(True), jnp.asarray(50))
    st_fail = _slide(cfg, st, jnp.asarray(True))
    st_out = jax.tree.map(lambda a, b: jnp.where(ok, a, b), st2, st_fail)
    return st_out, out, ok


@partial(jax.jit, static_argnames=("cfg",))
@_f32_matmul
def slide_only(cfg: EstimatorConfig, st: EstimatorState, is_kf: jax.Array) -> EstimatorState:
    """Window slide without a solve — the failed-initialization retry path
    (estimator.cpp:253-256)."""
    return _slide(cfg, st, is_kf)


@partial(jax.jit, static_argnames=("cfg",))
@_f32_matmul
def init_full(cfg: EstimatorConfig, st: EstimatorState) -> Tuple[EstimatorState, StepOutput]:
    """Initialization at window-full for the static-init / VO paths
    (estimator.cpp:262-316): gyro-bias LS (+implicit repropagation), then
    the standard solve/marginalize/slide tail.  The first frame is always
    treated as a keyframe margin (MARGIN_OLD)."""
    if cfg.use_imu:
        pre0 = _make_preints(cfg, st)
        dbg = init_ops.solve_gyroscope_bias(
            pre0.pre.delta_q,
            pre0.pre.jacobian[:, imupre.O_R:imupre.O_R + 3, imupre.O_BG:imupre.O_BG + 3],
            st.x.Q, pre0.valid,
        )
        st = st._replace(x=st.x._replace(Bg=st.x.Bg + dbg[None, :]))
    return _solve_and_slide(cfg, st, jnp.asarray(True), jnp.asarray(50))


@partial(jax.jit, static_argnames=("cfg",))
@_f32_matmul
def vio_step(
    cfg: EstimatorConfig,
    st: EstimatorState,
    feats: FrameFeatures,
    imu: ImuInterval,
    key: jax.Array,
    relo: Optional[slv.ReloData] = None,
) -> Tuple[EstimatorState, StepOutput]:
    """Steady-state NON_LINEAR per-frame program (the ``train_step`` analog)."""
    # STATIC slot index: a traced j turns every .at[j].set into a
    # dynamic-update-slice (~8 ms/step in the batched scan, measured by
    # device trace); the steady-state slot is always WINDOW_SIZE
    j = WINDOW_SIZE
    st = _store_interval(st, j, imu)
    if cfg.use_imu:
        st = st._replace(x=_propagate_newest(cfg, st, j))
    else:
        x = st.x
        st = st._replace(x=x._replace(
            P=x.P.at[j].set(x.P[j - 1]), Q=x.Q.at[j].set(x.Q[j - 1])
        ))

    table, is_kf, ltn = ftab.ingest_frame(
        st.table, j, feats, st.x.td, cfg.depth_min_dist, cfg.min_parallax
    )
    st = st._replace(table=table)

    if not cfg.use_imu:
        st = st._replace(x=_pnp_newest(cfg, st, key))

    return _solve_and_slide(cfg, st, is_kf, ltn, relo)


def _window_points(x: WindowState, t: FeatureTable):
    """Newest frame's depth-anchored landmarks (must run PRE-slide: the
    slide clears the newest slot's observations).  Returns
    (wp_world (MAXF,3), wp_uv (MAXF,2), wp_norm (MAXF,2), valid, ids)."""
    j = FRAMES - 1
    t_wc, R_wc = ftab.cam_poses(x.P, x.Q, x.tic, x.qic)
    s = t.start
    pts_s = jnp.take_along_axis(t.pts, s[:, None, None], axis=1)[:, 0]
    rays = jnp.concatenate([pts_s, jnp.ones_like(pts_s[:, :1])], axis=-1)
    p_cam = rays * t.est_depth[:, None]
    p_w = jnp.einsum("nij,nj->ni", R_wc[s], p_cam) + t_wc[s]
    valid = (
        ftab.active_rows(t) & (t.est_depth > 0) & t.obs_mask[:, j] & ~t.is_dynamic
    )
    return p_w, t.uv[:, j], t.pts[:, j], valid, t.ids


@partial(jax.jit, static_argnames=("cfg",))
@_f32_matmul
def keyframe_points(cfg: EstimatorConfig, st: EstimatorState):
    """Export the newest frame's depth-anchored landmarks for the pose
    graph (the reference's ``pubKeyframe`` point cloud: world position +
    per-point [x_norm y_norm u v id], visualization.cpp:454-520).

    NOTE: only meaningful on a PRE-slide state; the per-step exports in
    ``StepOutput.wp_*`` are the supported path."""
    return _window_points(st.x, st.table)


# ---------------------------------------------------------------------------
# Host shell
# ---------------------------------------------------------------------------


class VinsEstimator:
    """Host orchestration: sequencing, IMU pairing, phases, failure reset.

    Replaces the nodelet's ``process`` thread + the Estimator's host-side
    state machine; owns only genuinely sequential scalar state."""

    INITIAL = 0
    NON_LINEAR = 1

    def __init__(self, vcfg: VinsConfig, dtype=jnp.float32,
                 eager_outputs: bool = True, failure_check_interval: int = 1):
        self.vcfg = vcfg
        self.cfg = EstimatorConfig.from_vins(vcfg)
        self.dtype = dtype
        # eager_outputs=False defers ALL device->host reads (trajectory is
        # accumulated as device arrays and fetched once) — essential when
        # host readback is expensive (remote-tunnel TPUs: ~30 ms/sync)
        self.eager_outputs = eager_outputs
        self.failure_check_interval = failure_check_interval
        self._imu_buf: list = []  # (t, acc(3,), gyr(3,)) host floats
        self.prev_time: Optional[float] = None
        # extrinsic rotation self-calibration (ESTIMATE_EXTRINSIC==2)
        self._ex_calibrating = vcfg.estimate_extrinsic == 2
        self._ex_pairs: list = []  # (q_cam (4,), q_imu (4,))
        self._prev_feats_host: Optional[tuple] = None
        self._pending_relo: Optional[slv.ReloData] = None
        self._keys = jax.random.split(jax.random.PRNGKey(1), 4096)
        self.reset()

    def reset(self):
        self.state = init_estimator_state(
            self.cfg, self.vcfg.ric_matrix(), self.vcfg.tic_vector(),
            self.vcfg.td, self.dtype,
        )
        self.frame_count = 0
        self.solver_flag = self.INITIAL
        self.headers = [0.0] * FRAMES
        self._step = 0
        self._td_cache = float(self.vcfg.td)
        if not hasattr(self, "_pending"):
            self._pending: list = []  # (t, StepOutput device handles)

    # -- IMU ----------------------------------------------------------------
    def push_imu(self, t: float, acc, gyr):
        if self._imu_buf and t <= self._imu_buf[-1][0]:
            return  # disordered sample dropped (estimator_nodelet.cpp:110-114)
        self._imu_buf.append((float(t), np.asarray(acc, np.float64),
                              np.asarray(gyr, np.float64)))

    def imu_available(self, t: float) -> bool:
        return bool(self._imu_buf) and self._imu_buf[-1][0] >= t

    def _collect_interval(self, t0: float, t1: float) -> ImuInterval:
        dts, acc, gyr = self._collect_interval_np(t0, t1)
        return ImuInterval(jnp.asarray(dts, self.dtype),
                           jnp.asarray(acc, self.dtype),
                           jnp.asarray(gyr, self.dtype))

    def _collect_interval_np(self, t0: float, t1: float):
        """Gather samples spanning (t0, t1] into fixed numpy buffers
        (``getIMUInterval`` semantics incl. boundary handling).  Kept in
        numpy so the fused latency path can pack them into its single
        per-frame upload."""
        maxi = self.cfg.max_imu
        dts = np.zeros(maxi)
        acc = np.zeros((maxi + 1, 3))
        gyr = np.zeros((maxi + 1, 3))
        buf = self._imu_buf
        # drop samples at or before t0, keeping the last one as boundary
        while len(buf) > 1 and buf[1][0] <= t0:
            buf.pop(0)
        if not buf:
            return dts, acc, gyr
        acc[0] = buf[0][1]
        gyr[0] = buf[0][2]
        t_prev = t0
        k = 0
        idx = 1
        while idx < len(buf) and k < maxi:
            ts, a, w = buf[idx]
            if ts >= t1:
                break
            dts[k] = ts - t_prev
            acc[k + 1] = a
            gyr[k + 1] = w
            t_prev = ts
            k += 1
            idx += 1
        # final partial step to t1 using the next sample's values (the
        # reference takes the first sample at/after t1)
        if k < maxi and idx < len(buf):
            ts, a, w = buf[idx]
            dts[k] = t1 - t_prev
            acc[k + 1] = a
            gyr[k + 1] = w
            k += 1
        # replicate last sample into padding (harmless with dt=0)
        if k > 0:
            acc[k + 1:] = acc[k]
            gyr[k + 1:] = gyr[k]
        # consumed samples before t1 stay for the boundary of next interval
        while len(buf) > 1 and buf[1][0] < t1:
            buf.pop(0)
        return dts, acc, gyr

    # -- frames -------------------------------------------------------------
    def process_features(self, feats: FrameFeatures, t: float) -> Optional[dict]:
        """One backend step for a tracked feature frame at time t.

        Returns odometry dict once the solver is NON_LINEAR (or during
        late fill), else None."""
        cfg = self.cfg
        if cfg.estimate_td and self._step % max(self.failure_check_interval, 4) == 0:
            self._td_cache = float(jax.device_get(self.state.x.td))
        cur_time = t + self._td_cache
        if cfg.use_imu:
            imu = self._collect_interval(
                self.prev_time if self.prev_time is not None else cur_time - 1e-3,
                cur_time,
            )
        else:
            imu = empty_interval(cfg, self.dtype)
        self.prev_time = cur_time

        if self._ex_calibrating:
            self._update_ex_calibration(feats, imu)

        out = None
        if self.solver_flag == self.INITIAL:
            self.state, is_kf = fill_step(
                cfg, self.state, jnp.asarray(self.frame_count, jnp.int32), feats, imu
            )
            self.headers[self.frame_count] = t
            if self.frame_count == WINDOW_SIZE:
                if cfg.use_imu and not cfg.static_init:
                    # dynamic initialization; on failure fall back to the
                    # monocular (depth-less) SFM path, then retry-after-slide
                    st_before = self.state
                    self.state, step_out, ok = init_dynamic(
                        cfg, self.state, self._keys[self._step % 4096]
                    )
                    if not bool(jax.device_get(ok)):
                        st_mono, out_mono, ok_mono = init_mono(
                            cfg, st_before, self._keys[(self._step + 1) % 4096]
                        )
                        if bool(jax.device_get(ok_mono)):
                            self.state, step_out, ok = st_mono, out_mono, ok_mono
                    if bool(jax.device_get(ok)):
                        self.solver_flag = self.NON_LINEAR
                        out = self._emit(step_out, t)
                    else:
                        # state was already slid by the init program's tail;
                        # stay INITIAL, window keeps sliding until init works
                        self.headers = self.headers[1:] + [t]
                else:
                    self.state, step_out = init_full(cfg, self.state)
                    self.solver_flag = self.NON_LINEAR
                    out = self._emit(step_out, t)
            else:
                self.frame_count += 1
        else:
            key = self._keys[self._step % 4096]
            relo = None
            if cfg.fast_relo:
                relo = self._pending_relo or slv.empty_relo(cfg.maxf, self.dtype)
                self._pending_relo = None
            self.state, step_out = vio_step(cfg, self.state, feats, imu, key, relo)
            self.headers = self.headers[1:] + [t]
            # failure detection sync is amortized: scalar readback is
            # expensive on tunneled devices (estimator.cpp:345-353 reboots
            # synchronously; a few frames of latency is benign)
            if self._step % self.failure_check_interval == 0:
                if bool(jax.device_get(step_out.failure)):
                    self.reset()
                    self.prev_time = None
                    return None
            out = self._emit(step_out, t)
        self._step += 1
        return out

    def latest_odometry(self, t: Optional[float] = None) -> Optional[dict]:
        """Low-latency IMU-rate odometry: midpoint-propagate the newest
        solved state through the buffered IMU samples up to ``t`` (the
        reference's fast path ``inputIMU → predict → pubLatestOdometry``,
        estimator.cpp:1749-1888, ~200 Hz).

        Pure numpy on cached host values — no device round trip."""
        if self.solver_flag != self.NON_LINEAR or not self._pending:
            return None
        t_last, out = self._pending[-1]
        # memoize the (one sync per solved frame) host copy of the base state
        cached = getattr(self, "_latest_base", None)
        if cached is not None and cached[0] == t_last:
            base = cached[1]
        else:
            base = self._materialize(t_last, out)
            self._latest_base = (t_last, base)
        P = np.asarray(base["P"], np.float64).copy()
        Q = np.asarray(base["Q"], np.float64).copy()
        V = np.asarray(base["V"], np.float64).copy()
        g = np.array([0.0, 0.0, self.cfg.g_norm])
        # bias-corrected propagation (reference predict uses acc - tmp_Ba,
        # gyr - tmp_Bg, estimator.cpp:1862-1880); biases ride StepOutput
        ba = np.asarray(base.get("Ba", np.zeros(3)), np.float64)
        bg = np.asarray(base.get("Bg", np.zeros(3)), np.float64)
        samples = [s for s in self._imu_buf
                   if s[0] > t_last and (t is None or s[0] <= t)]
        t_prev = t_last
        acc_prev = None
        gyr_prev = None
        for (ts, acc, gyr) in samples:
            dt = ts - t_prev
            if acc_prev is None:
                acc_prev, gyr_prev = acc, gyr
            w = 0.5 * (gyr_prev + gyr) - bg
            # quaternion update q <- q ⊗ [1, w dt/2]
            half = 0.5 * w * dt
            dq = np.array([1.0, half[0], half[1], half[2]])
            Qn = np.array([
                Q[0] * dq[0] - Q[1] * dq[1] - Q[2] * dq[2] - Q[3] * dq[3],
                Q[0] * dq[1] + Q[1] * dq[0] + Q[2] * dq[3] - Q[3] * dq[2],
                Q[0] * dq[2] - Q[1] * dq[3] + Q[2] * dq[0] + Q[3] * dq[1],
                Q[0] * dq[3] + Q[1] * dq[2] - Q[2] * dq[1] + Q[3] * dq[0],
            ])
            Qn /= np.linalg.norm(Qn)

            def rot(q, v):
                w0, x, y, z = q
                R = np.array([
                    [1 - 2 * (y * y + z * z), 2 * (x * y - w0 * z), 2 * (x * z + w0 * y)],
                    [2 * (x * y + w0 * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w0 * x)],
                    [2 * (x * z - w0 * y), 2 * (y * z + w0 * x), 1 - 2 * (x * x + y * y)],
                ])
                return R @ v

            a0 = rot(Q, acc_prev - ba) - g
            a1 = rot(Qn, acc - ba) - g
            a = 0.5 * (a0 + a1)
            P = P + V * dt + 0.5 * a * dt * dt
            V = V + a * dt
            Q = Qn
            acc_prev, gyr_prev = acc, gyr
            t_prev = ts
        return dict(t=t_prev, P=P, Q=Q, V=V)

    def set_relo_frame(self, match_pts: np.ndarray, match_valid: np.ndarray,
                       match_ids: np.ndarray,
                       P_old: np.ndarray, Q_old: np.ndarray):
        """Queue a relocalization constraint for the next solve (the
        reference's ``setReloFrame``, estimator.cpp:1728-1747).

        ``match_ids`` are the FEATURE IDS of the matched points (exported
        as ``StepOutput.wp_ids`` at keyframe time); the solve re-keys them
        onto the current table by id — never by a possibly-recycled row
        (reference matches by id, estimator.cpp:1307-1346)."""
        self._pending_relo = slv.ReloData(
            active=jnp.asarray(True),
            match_pts=jnp.asarray(match_pts, self.dtype),
            match_valid=jnp.asarray(match_valid),
            match_ids=jnp.asarray(match_ids, jnp.int32),
            P=jnp.asarray(P_old, self.dtype),
            Q=jnp.asarray(Q_old, self.dtype),
        )

    def _update_ex_calibration(self, feats: FrameFeatures, imu: ImuInterval):
        """Online imu-camera rotation calibration (the reference's
        ``CalibrationExRotation`` hook in processImage, estimator.cpp:
        208-226): accumulate (camera, imu) relative-rotation pairs, solve
        hand-eye when enough are collected, then free the extrinsic."""
        ids = np.asarray(jax.device_get(feats.ids))
        pts = np.asarray(jax.device_get(feats.pts))
        cur = (ids, pts)
        prev = self._prev_feats_host
        self._prev_feats_host = cur
        if prev is None:
            return
        pids, ppts = prev
        common = {int(i): k for k, i in enumerate(pids) if i >= 0}
        m1, m2 = [], []
        for k, i in enumerate(ids):
            if i >= 0 and int(i) in common:
                m1.append(ppts[common[int(i)]])
                m2.append(pts[k])
        if len(m1) < 9:
            return
        m1 = np.asarray(m1)
        m2 = np.asarray(m2)
        from ..ops import ransac as ransac_ops
        res = ransac_ops.fundamental_ransac(
            self._keys[(self._step + 2048) % 4096],
            jnp.asarray(m1), jnp.asarray(m2), jnp.ones(len(m1), bool),
            threshold=1.0 / 460.0, n_trials=64,
        )
        R_cam, _, score = init_ops.decompose_essential(
            res.model, jnp.asarray(m1), jnp.asarray(m2), res.inliers)
        # q_cam convention for hand-eye: rotation of frame k in frame k-1
        q_cam = quat.R2q(R_cam.T)
        # imu Δq from the raw interval via gyro integration (host-cheap)
        pre = imupre.preintegrate(
            imu.dts, imu.acc, imu.gyr, jnp.zeros(3, imu.acc.dtype),
            jnp.zeros(3, imu.acc.dtype), self.cfg.noise)
        self._ex_pairs.append((np.asarray(jax.device_get(q_cam)),
                               np.asarray(jax.device_get(pre.delta_q))))
        if len(self._ex_pairs) < 12:
            return
        # keep a long history: the reference accumulates pairs unboundedly and
        # its 0.25 spectrum threshold needs the excitation to integrate up
        self._ex_pairs = self._ex_pairs[-100:]
        qc = jnp.asarray(np.stack([p[0] for p in self._ex_pairs]))
        qi = jnp.asarray(np.stack([p[1] for p in self._ex_pairs]))
        ric_now = quat.q2R(self.state.x.qic)
        ric_new, ok = init_ops.calibrate_extrinsic_rotation(
            qc, qi, ric_now, jnp.ones(qc.shape[0], bool))
        if bool(jax.device_get(ok)):
            self.state = self.state._replace(
                x=self.state.x._replace(qic=quat.R2q(ric_new)))
            # calibrated: switch to refine-online mode (reference sets
            # ESTIMATE_EXTRINSIC=1)
            self._ex_calibrating = False
            self.cfg = dataclasses.replace(self.cfg, estimate_extrinsic=True)

    def _emit(self, step_out: StepOutput, t: float):
        self._pending.append((t, step_out))
        if self.eager_outputs:
            return self._materialize(t, step_out)
        return step_out

    @staticmethod
    def _materialize(t: float, step_out: StepOutput) -> dict:
        host = jax.device_get(step_out)  # ONE readback for the whole pytree
        return dict(
            t=t,
            P=np.asarray(host.P),
            Q=np.asarray(host.Q),
            V=np.asarray(host.V),
            Ba=np.asarray(host.Ba),
            Bg=np.asarray(host.Bg),
            is_keyframe=bool(host.is_keyframe),
            cost=float(host.cost),
            n_features=int(host.n_features),
            relo_P=np.asarray(host.relo_P),
            relo_Q=np.asarray(host.relo_Q),
            relo_used=bool(host.relo_used),
            relo_cur_P=np.asarray(host.relo_cur_P),
            relo_cur_Q=np.asarray(host.relo_cur_Q),
            wp_world=np.asarray(host.wp_world),
            wp_uv=np.asarray(host.wp_uv),
            wp_norm=np.asarray(host.wp_norm),
            wp_valid=np.asarray(host.wp_valid),
            wp_ids=np.asarray(host.wp_ids),
        )

    @property
    def trajectory(self) -> list:
        """Materialized odometry records; one batched device fetch."""
        if not self._pending:
            return []
        ts = [t for t, _ in self._pending]
        outs = [o for _, o in self._pending]
        stacked = jax.tree.map(lambda *a: jnp.stack(a), *outs)
        host = jax.device_get(stacked)
        recs = []
        for i, t in enumerate(ts):
            recs.append(dict(
                t=t, P=np.asarray(host.P[i]), Q=np.asarray(host.Q[i]),
                V=np.asarray(host.V[i]),
                is_keyframe=bool(host.is_keyframe[i]),
                cost=float(host.cost[i]),
                n_features=int(host.n_features[i]),
            ))
        return recs
