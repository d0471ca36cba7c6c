"""Frontend feature tracker (layer L2) — one fused XLA program per frame.

Re-designs ``FeatureTracker::readImage`` (``/root/reference/vins_estimator/
src/feature_tracker/feature_tracker.cpp:263-439``) with fixed shapes:

  pipeline: CLAHE? → pyramid → IMU-predicted LK → border/status cull →
            F-matrix RANSAC → min-dist occupancy selection (long-tracked
            first) → grid-quota FAST detection → undistort + velocities

Differences from the reference that are *design*, not omissions:
  * detection runs on the whole image in one FAST pass; the per-grid
    thread-pool fan-out (``gridDetect`` + ThreadPool) becomes a per-grid
    top-k on the shared score map, so grid-boundary corners and the 3px
    overlap handling disappear;
  * the sequential ``cv::circle`` occupancy mask becomes a greedy
    admission scan over a pairwise-distance matrix (same keep-long-tracks
    priority, same MIN_DIST radius semantics);
  * the textureless-grid skip flag (a CPU-work optimization,
    ``feature_tracker.cpp:120-124``) is unnecessary — whole-image
    detection has no per-grid cost to save;
  * RANSAC uses fixed trials + fixed seed (deterministic, batched) rather
    than cv::RNG.

All state lives in an explicit ``TrackerState`` pytree; the tracker is a
pure function and jit/vmap-compatible (batched sequences in throughput
mode vmap over it).
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..backend.feature_table import FrameFeatures
from ..models.camera import CameraModel
from ..ops import fast as fast_ops
from ..ops import image as image_ops
from ..ops import lk as lk_ops
from ..ops import ransac as ransac_ops
from ..utils import quaternion as quat

FOCAL_LENGTH = 460.0  # virtual focal for RANSAC mapping (parameters.h:13)
BORDER_SIZE = 1  # inBorder margin (feature_tracker.cpp:97-103)


@functools.lru_cache(maxsize=8)
def _fisheye_mask(path: str, height: int, width: int) -> np.ndarray:
    """Cached (H,W) bool FOV mask from an image file (loaded once per
    config; embedded as a constant at trace time)."""
    from ..io.images import load_mask

    return load_mask(path, height, width)


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    width: int
    height: int
    max_cnt: int = 150
    capacity: int = 0  # feature slots; 0 -> derived
    min_dist: int = 30
    grid_rows: int = 5
    grid_cols: int = 6
    f_threshold: float = 1.0
    fast_threshold: float = 10.0  # OpenCV FastFeatureDetector default
    equalize: bool = False
    fisheye: bool = False  # FOV mask (reference fisheye_mask.jpg)
    fisheye_radius_frac: float = 0.5  # analytic-circle radius (no mask file)
    fisheye_mask_path: str = ""  # mask image path; "" -> analytic circle.
    # The array is embedded as a trace-time constant (configs are static)
    use_imu_prediction: bool = True
    pyr_levels_predicted: int = 2  # cv maxLevel=1 (feature_tracker.cpp:302)
    pyr_levels_cold: int = 4  # cv maxLevel=3 (feature_tracker.cpp:309)
    ransac_trials: int = 64  # LK-tracked sets are ~85%+ inliers; 64 fixed
    # trials beat OpenCV's 0.99-confidence adaptive loop at that rate
    admission_rounds: int = 16  # parallel-admission fixed-point rounds
    lk_max_iters: int = 20  # fine-level LK budget (reference caps at 30;
    # the vmapped while_loop runs to the worst lane, so the cap is the cost)
    lk_coarse_iters: int = 10  # coarse levels only need ~1-2 px accuracy
    lk_sampler: str = "gather"  # "gather" = single-seq latency mode;
    # "matmul" = sequence-batched mode (see ops.lk.pyramidal_lk)
    lk_engine: str = "auto"  # matmul sampler backend: "xla" | "pallas" |
    # "pallas3" (fused patch-DMA level kernel, ops/lk_pallas3.py)

    @property
    def maxc(self) -> int:
        if self.capacity:
            return self.capacity
        return max(((int(self.max_cnt * 1.5) + 7) // 8) * 8, 32)

    @property
    def num_grids(self) -> int:
        return self.grid_rows * self.grid_cols

    @property
    def grid_quota(self) -> int:
        return max(self.max_cnt // self.num_grids, 1)

    @property
    def cand_per_grid(self) -> int:
        return self.grid_quota + 2  # reference's +2 slack (:133)

    @property
    def pyr_levels(self) -> int:
        return max(self.pyr_levels_predicted, self.pyr_levels_cold)


class TrackerState(NamedTuple):
    pyramid: Tuple[jax.Array, ...]  # previous-frame pyramid
    pts: jax.Array  # (MAXC,2) pixel positions in prev frame
    ids: jax.Array  # (MAXC,) int32, -1 empty
    track_cnt: jax.Array  # (MAXC,) int32
    un_pts: jax.Array  # (MAXC,2) normalized coords of prev frame
    prev_time: jax.Array  # ()
    next_id: jax.Array  # () int32
    has_prev: jax.Array  # () bool


def init_state(cfg: TrackerConfig, dtype=jnp.float32) -> TrackerState:
    maxc = cfg.maxc
    pyr = tuple(
        jnp.zeros((cfg.height // (2 ** l), cfg.width // (2 ** l)), dtype)
        for l in range(cfg.pyr_levels)
    )
    return TrackerState(
        pyramid=pyr,
        pts=jnp.zeros((maxc, 2), dtype),
        ids=jnp.full((maxc,), -1, jnp.int32),
        track_cnt=jnp.zeros((maxc,), jnp.int32),
        un_pts=jnp.zeros((maxc, 2), dtype),
        prev_time=jnp.zeros((), dtype),
        next_id=jnp.zeros((), jnp.int32),
        has_prev=jnp.asarray(False),
    )


def _grid_id(cfg: TrackerConfig, xy: jax.Array) -> jax.Array:
    """Grid cell index of pixel positions (reference :376-384 semantics)."""
    gw = cfg.width // cfg.grid_cols
    gh = cfg.height // cfg.grid_rows
    col = jnp.clip((xy[..., 0] // gw).astype(jnp.int32), 0, cfg.grid_cols - 1)
    row = jnp.clip((xy[..., 1] // gh).astype(jnp.int32), 0, cfg.grid_rows - 1)
    return col + cfg.grid_cols * row


def _in_border(cfg: TrackerConfig, xy: jax.Array) -> jax.Array:
    x = jnp.round(xy[..., 0])
    y = jnp.round(xy[..., 1])
    return (
        (x >= BORDER_SIZE) & (x < cfg.width - BORDER_SIZE)
        & (y >= BORDER_SIZE) & (y < cfg.height - BORDER_SIZE)
    )


def _greedy_admission(
    cfg: TrackerConfig,
    xy: jax.Array,  # (M,2) candidate positions, priority-ordered
    eligible: jax.Array,  # (M,) may be admitted as a feature
    blocker_only: jax.Array,  # (M,) occupies space but is not admitted (unstable)
    cand_grid: jax.Array,  # (M,) grid id
    grid_need: jax.Array,  # (G,) remaining per-grid quota for *new* slots (big for tracked)
    is_new: jax.Array,  # (M,) counts against grid_need
):
    """Sequential min-dist admission — the fixed-shape equivalent of the
    reference's ``setMask``/``addPoints`` circle mask painting
    (feature_tracker.cpp:173-236)."""
    M = xy.shape[0]
    d2 = jnp.sum((xy[:, None, :] - xy[None, :, :]) ** 2, axis=-1)  # (M,M)
    min_d2 = jnp.asarray(float(cfg.min_dist) ** 2, xy.dtype)

    def body(carry, i):
        occupied, admitted, need = carry  # (M,), (M,), (G,)
        # distance to any previously occupied entry
        blocked = jnp.any(occupied & (d2[i] < min_d2))
        g = cand_grid[i]
        quota_ok = jnp.where(is_new[i], need[g] > 0, True)
        adm = eligible[i] & ~blocked & quota_ok
        occ = adm | (blocker_only[i])
        occupied = occupied.at[i].set(occ)
        admitted = admitted.at[i].set(adm)
        need = need.at[g].add(-(adm & is_new[i]).astype(need.dtype))
        return (occupied, admitted, need), None

    occ0 = jnp.zeros(M, bool)
    adm0 = jnp.zeros(M, bool)
    (occupied, admitted, _), _ = jax.lax.scan(
        body, (occ0, adm0, grid_need), jnp.arange(M)
    )
    return admitted


def _parallel_admission(
    cfg: TrackerConfig,
    xy: jax.Array,  # (M,2) candidate positions, priority-ordered
    eligible: jax.Array,  # (M,)
    blocker_only: jax.Array,  # (M,) occupies space but is never admitted
    cand_grid: jax.Array,  # (M,) grid id
    grid_need: jax.Array,  # (G,) per-grid quota for new admissions
    is_new: jax.Array,  # (M,) counts against grid_need
    rounds: int = 16,
):
    """Fixed-point parallel evaluation of the greedy min-dist admission.

    Computes the SAME result as ``_greedy_admission``'s sequential scan
    (the lexicographically-first admission set) without M sequential steps:
    an entry's fate only depends on *earlier* entries within ``min_dist``
    (and earlier same-grid new candidates for the quota), so each round
    decides every entry whose earlier dependencies are already decided.
    Dependency chains longer than ``rounds`` are geometrically rare
    (requires a >min_dist-spaced domino of alternating admits/rejects);
    leftovers are conservatively rejected.

    M sequential scan steps (~10 µs each on TPU) become ``rounds`` rounds
    of (M,M) masked reductions (pure VPU), ~10x faster at M≈420.
    """
    M = xy.shape[0]
    d2 = jnp.sum((xy[:, None, :] - xy[None, :, :]) ** 2, axis=-1)
    min_d2 = jnp.asarray(float(cfg.min_dist) ** 2, xy.dtype)
    idx = jnp.arange(M)
    earlier = idx[:, None] > idx[None, :]  # [i, j]: j comes before i
    nb = earlier & (d2 < min_d2)  # earlier in-radius neighbor
    # earlier same-grid new candidate (quota dependency)
    sgn = earlier & (cand_grid[:, None] == cand_grid[None, :]) & is_new[None, :]

    decided0 = ~eligible | blocker_only  # blockers/ineligible: decided at once
    admitted0 = jnp.zeros(M, bool)

    def round_fn(carry, _):
        decided, admitted = carry
        occ = admitted | blocker_only
        blocked = jnp.any(nb & occ[None, :], axis=1)
        undecided_elig = (~decided & eligible)[None, :]
        wait_d = jnp.any(nb & undecided_elig, axis=1)
        used = jnp.sum(sgn & admitted[None, :], axis=1)
        wait_q = jnp.any(sgn & undecided_elig, axis=1) & is_new
        quota_ok = jnp.where(is_new, used < grid_need[cand_grid], True)
        # an already-admitted earlier neighbor rejects i regardless of
        # still-undecided ones (admission is monotone)
        can_decide = ~decided & eligible & (blocked | (~wait_d & ~wait_q))
        admitted = admitted | (can_decide & ~blocked & quota_ok)
        decided = decided | can_decide
        return (decided, admitted), None

    (decided, admitted), _ = jax.lax.scan(
        round_fn, (decided0, admitted0), None, length=rounds
    )
    return admitted


def _compact(values, mask, capacity, fill):
    """Pack masked rows to the front of a fixed-capacity array."""
    idx = jnp.cumsum(mask) - 1
    target = jnp.where(mask, idx, capacity)  # drop sink
    out = jnp.full((capacity + 1,) + values.shape[1:], fill, values.dtype)
    out = out.at[target].set(values)
    return out[:capacity]


class TrackerOutput(NamedTuple):
    features: FrameFeatures
    n_tracked: jax.Array
    n_total: jax.Array


@partial(jax.jit, static_argnames=("cfg", "cam", "pub_this_frame"))
def track_frame(
    cfg: TrackerConfig,
    cam: CameraModel,
    state: TrackerState,
    img: jax.Array,  # (H, W) grayscale float
    t: jax.Array,  # () timestamp (seconds)
    relative_R: jax.Array,  # (3,3) predicted rotation cam_cur <- cam_prev
    key: jax.Array,  # PRNG for RANSAC
    pub_this_frame: bool = True,
) -> Tuple[TrackerState, TrackerOutput]:
    """Process one frame; returns updated state + (maybe) published features."""
    dtype = img.dtype
    maxc = cfg.maxc

    if cfg.equalize:
        img = image_ops.clahe(img).astype(dtype)

    pyr = tuple(image_ops.build_pyramid(img, cfg.pyr_levels))

    active = state.ids >= 0

    # ---- LK tracking with IMU-aided prediction -------------------------
    if cfg.use_imu_prediction:
        rays = cam.lift(state.pts)
        pred = cam.project(
            jnp.einsum("ij,nj->ni", relative_R, rays)
        )
        # only trust predictions that land in-frame; else start at prev pos
        pred = jnp.where(_in_border(cfg, pred)[:, None], pred, state.pts)
        levels = cfg.pyr_levels_predicted
    else:
        pred = state.pts
        levels = cfg.pyr_levels_cold

    lk = lk_ops.pyramidal_lk(
        state.pyramid[:levels], pyr[:levels], state.pts, pred,
        active & state.has_prev,
        max_iters=cfg.lk_max_iters, coarse_iters=cfg.lk_coarse_iters,
        sampler=cfg.lk_sampler, engine=cfg.lk_engine,
    )
    in_b = _in_border(cfg, lk.pts)
    tracked = lk.status & in_b
    # failed-but-inbounds points still occupy space this frame (:313-323)
    unstable = active & state.has_prev & ~lk.status & in_b

    cur_pts = lk.pts
    track_cnt = jnp.where(tracked, state.track_cnt + 1, 0)

    # ---- fundamental-matrix RANSAC on virtual-460 coords (:441-473) ----
    rays_prev = cam.lift(state.pts)
    rays_cur = cam.lift(cur_pts)
    center = jnp.asarray([cfg.width / 2.0, cfg.height / 2.0], dtype)
    un_prev_px = rays_prev[:, :2] * FOCAL_LENGTH + center
    un_cur_px = rays_cur[:, :2] * FOCAL_LENGTH + center
    if pub_this_frame:
        fm = ransac_ops.fundamental_ransac(
            key, un_prev_px, un_cur_px, tracked,
            threshold=cfg.f_threshold, n_trials=cfg.ransac_trials,
        )
        tracked = tracked & fm.inliers

    # ---- FAST detection over the whole image ---------------------------
    if jax.default_backend() == "tpu":
        # fused Pallas stencil (ONE HBM pass); exact-equivalent to the
        # XLA formulation, which stays the CPU/other-backend path
        from ..ops import fast_pallas
        score = fast_pallas.fast_score_nms(img, cfg.fast_threshold)
    else:
        score = fast_ops.nms3(fast_ops.fast_score(img, cfg.fast_threshold))
    if cfg.fisheye:
        # FOV mask: suppress detections and kill tracks outside.  With a
        # mask file configured this is the reference's FISHEYE_MASK
        # intersected in setMask (feature_tracker.cpp:173-208); otherwise
        # an analytic circle.  Either way the (H,W) mask is a trace-time
        # constant — zero runtime cost beyond the elementwise select.
        if cfg.fisheye_mask_path:
            in_fov = jnp.asarray(_fisheye_mask(
                cfg.fisheye_mask_path, cfg.height, cfg.width))
        else:
            yy = jnp.arange(cfg.height, dtype=dtype)[:, None] - cfg.height / 2.0
            xx = jnp.arange(cfg.width, dtype=dtype)[None, :] - cfg.width / 2.0
            rad = cfg.fisheye_radius_frac * min(cfg.height, cfg.width)
            in_fov = (yy * yy + xx * xx) < rad * rad
        score = jnp.where(in_fov, score, 0.0)
        pxi = jnp.clip(jnp.round(cur_pts).astype(jnp.int32),
                       jnp.zeros(2, jnp.int32),
                       jnp.asarray([cfg.width - 1, cfg.height - 1], jnp.int32))
        tracked = tracked & in_fov[pxi[:, 1], pxi[:, 0]]
    cand_xy, cand_resp = fast_ops.grid_topk(
        score, cfg.grid_rows, cfg.grid_cols, cfg.cand_per_grid
    )
    ncand = cand_xy.shape[0]

    # ---- unified greedy admission (setMask + addPoints) ----------------
    # priority order: tracked sorted by track_cnt desc, then unstable
    # blockers, then candidates sorted by response desc.  Tracked and
    # unstable entries share the cur_pts block (one scan slot each).
    prio = jnp.where(tracked, track_cnt.astype(jnp.int32),
                     jnp.where(unstable, 0, -1))
    order_tr = jnp.argsort(-prio)
    tr_xy = cur_pts[order_tr]
    tr_ok = tracked[order_tr]
    tr_block = unstable[order_tr]
    order_cand = jnp.argsort(-cand_resp)
    cd_xy = cand_xy[order_cand]
    cd_ok = cand_resp[order_cand] > 0

    all_xy = jnp.concatenate([tr_xy, cd_xy], axis=0)
    eligible = jnp.concatenate(
        [tr_ok, cd_ok if pub_this_frame else jnp.zeros(ncand, bool)]
    )
    blocker = jnp.concatenate([tr_block, jnp.zeros(ncand, bool)])
    is_new = jnp.concatenate([jnp.zeros(maxc, bool), jnp.ones(ncand, bool)])
    grids = _grid_id(cfg, all_xy)

    # per-grid need for new detections: quota − tracked-in-grid (+2 slack)
    tr_grid = _grid_id(cfg, cur_pts)
    grid_track = jnp.zeros(cfg.num_grids, jnp.int32).at[tr_grid].add(
        tracked.astype(jnp.int32)
    )
    under = grid_track < cfg.grid_quota
    grid_need = jnp.where(under, cfg.grid_quota - grid_track + 2, 0)
    # global budget: never exceed max_cnt total features
    n_tracked = jnp.sum(tracked)
    budget = jnp.maximum(cfg.max_cnt - n_tracked, 0)

    admitted = _parallel_admission(
        cfg, all_xy, eligible, blocker, grids, grid_need, is_new,
        rounds=cfg.admission_rounds,
    )
    # enforce the global cap on new admissions (detection gate :361-365)
    new_rank = jnp.cumsum(admitted & is_new) - 1
    admitted = admitted & jnp.where(is_new, new_rank < budget, True)

    # ---- build the new fixed-capacity point set ------------------------
    adm_tr = admitted[:maxc]
    adm_cd = admitted[maxc:]
    keep_xy = jnp.concatenate([tr_xy, cd_xy], axis=0)
    keep_mask = jnp.concatenate([adm_tr, adm_cd])
    keep_ids = jnp.concatenate([state.ids[order_tr], jnp.full((ncand,), -1, jnp.int32)])
    keep_cnt = jnp.concatenate([track_cnt[order_tr], jnp.ones((ncand,), jnp.int32)])

    new_rank_all = jnp.cumsum(keep_mask & (keep_ids < 0)) - 1
    assigned_ids = jnp.where(
        keep_mask & (keep_ids < 0), state.next_id + new_rank_all.astype(jnp.int32), keep_ids
    )
    n_new = jnp.sum(keep_mask & (keep_ids < 0)).astype(jnp.int32)

    pts_new = _compact(keep_xy, keep_mask, maxc, 0.0)
    ids_new = _compact(assigned_ids, keep_mask, maxc, -1)
    cnt_new = _compact(keep_cnt, keep_mask, maxc, 0)

    # ---- undistort + per-id velocity (:542-593) ------------------------
    rays_new = cam.lift(pts_new)
    un_new = rays_new[:, :2]
    dt = jnp.maximum(t - state.prev_time, 1e-6)
    # match prev ids
    eq = (ids_new[:, None] == state.ids[None, :]) & (ids_new >= 0)[:, None] & (
        state.ids >= 0
    )[None, :]
    has_prev_obs = jnp.any(eq, axis=1) & state.has_prev
    prev_idx = jnp.argmax(eq, axis=1)
    vel = jnp.where(
        has_prev_obs[:, None],
        (un_new - state.un_pts[prev_idx]) / dt,
        0.0,
    )

    valid_new = ids_new >= 0
    feats = FrameFeatures(
        ids=ids_new,
        pts=un_new * valid_new[:, None],
        uv=pts_new,
        vel=vel * valid_new[:, None],
        depth=jnp.zeros((maxc,), dtype),
    )

    new_state = TrackerState(
        pyramid=pyr,
        pts=pts_new,
        ids=ids_new,
        track_cnt=cnt_new,
        un_pts=un_new,
        prev_time=t.astype(dtype),
        next_id=state.next_id + n_new,
        has_prev=jnp.asarray(True),
    )
    out = TrackerOutput(
        features=feats,
        n_tracked=n_tracked,
        n_total=jnp.sum(valid_new),
    )
    return new_state, out


def lookup_depth(
    depth_m: jax.Array, uv: jax.Array, valid: jax.Array
) -> jax.Array:
    """Nearest-pixel depth lookup in meters (the reference reads the
    aligned mono16 depth image at (v,u), estimator side)."""
    H, W = depth_m.shape
    x = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0, W - 1)
    y = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0, H - 1)
    d = depth_m[y, x]
    return jnp.where(valid, d, 0.0)
