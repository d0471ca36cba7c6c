"""Dense fixed-shape landmark database (the reference's ``FeatureManager``).

The reference keeps a ``list<FeaturePerId>`` of per-landmark observation
vectors mutated in place
(``/root/reference/vins_estimator/src/feature_manager/feature_manager.{h,cpp}``).
That is hostile to XLA, so here the landmark DB is a dense table of
capacity ``MAXF`` rows × ``FRAMES`` window slots with validity masks:

  * births  = row allocation via ranked free slots (no list append);
  * deaths  = mask clears (no erase);
  * window slide = an axis-1 roll + mask update (no per-feature erase);
  * every per-feature loop (parallax check, depth-validated triangulation,
    outlier checks) = one ``vmap`` over rows.

Covered reference capabilities, cited per function: ingest + keyframe
parallax test (feature_manager.cpp:56-123), depth cross-validated
triangulation with SVD fallback (:386-543), inverse-depth get/set with
estimate flags (:197-324), window-shift bookkeeping (:660-730), outlier /
dynamic removal (:235-282, :644-658).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..utils import quaternion as quat
from .state import FRAMES, WINDOW_SIZE

INIT_DEPTH = 5.0  # reference parameters.cpp INIT_DEPTH
MIN_OBS_FOR_DEPTH = 2

# estimate_flag semantics (feature_manager.h / :197-324):
FLAG_NONE = 0  # rough / fallback depth — free variable, loosely initialized
FLAG_MEASURED = 1  # verified depth-image depth — held constant if fix_depth
FLAG_TRIANGULATED = 2  # multiview triangulated — free variable


class FeatureTable(NamedTuple):
    ids: jax.Array  # (MAXF,) int32 global track id, -1 = empty row
    start: jax.Array  # (MAXF,) int32 window slot of first observation
    obs_mask: jax.Array  # (MAXF, FRAMES) bool
    pts: jax.Array  # (MAXF, FRAMES, 2) normalized-plane xy
    uv: jax.Array  # (MAXF, FRAMES, 2) raw pixel coords
    vel: jax.Array  # (MAXF, FRAMES, 2) normalized-plane velocity
    td_obs: jax.Array  # (MAXF, FRAMES) td snapshot at observation time
    depth_meas: jax.Array  # (MAXF, FRAMES) depth-image depth [m], 0 = none
    est_depth: jax.Array  # (MAXF,) estimated depth at start frame, <=0 = none
    flag: jax.Array  # (MAXF,) estimate_flag (see above)
    is_dynamic: jax.Array  # (MAXF,) bool — moving-consistency rejection


class FrameFeatures(NamedTuple):
    """One frontend output frame (fixed capacity MAXC)."""

    ids: jax.Array  # (MAXC,) int32, -1 = invalid slot
    pts: jax.Array  # (MAXC, 2) normalized xy
    uv: jax.Array  # (MAXC, 2)
    vel: jax.Array  # (MAXC, 2)
    depth: jax.Array  # (MAXC,) metres, 0 = no depth


def empty_table(maxf: int, dtype=jnp.float32) -> FeatureTable:
    return FeatureTable(
        ids=jnp.full((maxf,), -1, jnp.int32),
        start=jnp.zeros((maxf,), jnp.int32),
        obs_mask=jnp.zeros((maxf, FRAMES), bool),
        pts=jnp.zeros((maxf, FRAMES, 2), dtype),
        uv=jnp.zeros((maxf, FRAMES, 2), dtype),
        vel=jnp.zeros((maxf, FRAMES, 2), dtype),
        td_obs=jnp.zeros((maxf, FRAMES), dtype),
        depth_meas=jnp.zeros((maxf, FRAMES), dtype),
        est_depth=jnp.full((maxf,), -1.0, dtype),
        flag=jnp.zeros((maxf,), jnp.int32),
        is_dynamic=jnp.zeros((maxf,), bool),
    )


def active_rows(t: FeatureTable) -> jax.Array:
    return t.ids >= 0


def end_frame(t: FeatureTable) -> jax.Array:
    """Last observed slot per feature (−1 for empty rows)."""
    slots = jnp.arange(FRAMES)[None, :]
    return jnp.max(jnp.where(t.obs_mask, slots, -1), axis=1)


def obs_count(t: FeatureTable) -> jax.Array:
    return jnp.sum(t.obs_mask, axis=1)


# ---------------------------------------------------------------------------
# Ingest + keyframe parallax decision
# ---------------------------------------------------------------------------


def ingest_frame(
    t: FeatureTable,
    frame_idx: jax.Array,  # scalar int: window slot receiving the frame
    feats: FrameFeatures,
    td: jax.Array,
    depth_min_dist: float,
    min_parallax: float,  # normalized-plane units (= keyframe_parallax/FOCAL)
) -> Tuple[FeatureTable, jax.Array, jax.Array]:
    """Insert one frame of tracked features; decide keyframe-ness.

    Mirrors ``addFeatureCheckParallax`` (feature_manager.cpp:56-123):
    too-close depths are rejected outright, existing tracks get a new
    observation, unseen ids get a fresh row, and the keyframe decision is
    the mean compensated parallax between slots fc-2 and fc-1 (or forced
    when tracking is short).  Returns (table, is_keyframe, last_track_num).
    """
    maxf = t.ids.shape[0]
    maxc = feats.ids.shape[0]

    valid_in = feats.ids >= 0
    too_close = (feats.depth > 0) & (feats.depth < depth_min_dist)
    valid_in = valid_in & ~too_close

    act = active_rows(t)
    # (MAXF, MAXC) match matrix — ids are unique per side, so each column has
    # at most one hit.
    match = (t.ids[:, None] == feats.ids[None, :]) & act[:, None] & valid_in[None, :]
    col_has_match = jnp.any(match, axis=0)
    col_row = jnp.argmax(match, axis=0)  # row index for matched columns

    # --- allocation of new rows for unmatched valid features ---
    is_new = valid_in & ~col_has_match
    free = ~act
    free_rank = jnp.cumsum(free) - 1  # rank of each free row among free rows
    new_rank = jnp.cumsum(is_new) - 1  # rank of each new feature
    num_free = jnp.sum(free)
    can_alloc = is_new & (new_rank < num_free)
    # row r takes new feature c iff free[r] & can_alloc[c] & free_rank[r]==new_rank[c]
    assign = free[:, None] & can_alloc[None, :] & (free_rank[:, None] == new_rank[None, :])

    # --- scatter-free row-space update ---------------------------------
    # TPU scatters/gathers serialize per index (the .at[target_row].set
    # formulation cost ~15 ms / 5.3 GB of traffic per batched step).  In
    # row space everything collapses: a MATCHED row r satisfies
    # t.ids[r] == feats.ids[c], so "gather row-carried fields via col_row
    # and scatter back to target_row" is the identity — only the incoming
    # per-frame slot values ever cross the column→row boundary, and that
    # is ONE one-hot contraction per field (MXU work).
    matched_r = jnp.any(match, axis=1)  # (MAXF,) row re-observed this frame
    alloc_r = jnp.any(assign, axis=1)  # (MAXF,) row allocated to a new feat
    hit_r = matched_r | alloc_r
    S = (match | assign).astype(t.pts.dtype)  # (MAXF, MAXC) one-hot per row

    def pull(values):  # (MAXC, ...) -> (MAXF, ...) incoming value per row
        return jnp.einsum("rc,c...->r...", S, values)

    new_ids = jnp.where(
        alloc_r, jnp.einsum("rc,c->r", S.astype(jnp.int32),
                            feats.ids.astype(jnp.int32)), t.ids)
    new_start = jnp.where(alloc_r, frame_idx, t.start).astype(jnp.int32)
    fh = jax.nn.one_hot(frame_idx, FRAMES, dtype=t.pts.dtype)  # frame slot
    fh_b = fh > 0.5
    new_obs_mask = jnp.where(
        hit_r[:, None], (t.obs_mask & matched_r[:, None]) | fh_b[None, :],
        t.obs_mask)

    def set_frame2(field, values):
        """Matched rows keep history, allocated rows clear it; both write
        the incoming value at slot frame_idx; unhit rows unchanged.
        field (MAXF, FRAMES[, D]); values (MAXC[, D])."""
        nd = field.ndim
        rshape = (maxf,) + (1,) * (nd - 1)
        hist = jnp.where(matched_r.reshape(rshape), field,
                         jnp.zeros_like(field))
        fslot = fh.reshape((1, FRAMES) + (1,) * (nd - 2))
        vin = pull(values)[:, None] if nd == 3 else pull(values)[:, None]
        upd = hist * (1.0 - fslot) + vin * fslot
        return jnp.where(hit_r.reshape(rshape), upd, field)

    new_pts = set_frame2(t.pts, feats.pts)
    new_uv = set_frame2(t.uv, feats.uv)
    new_vel = set_frame2(t.vel, feats.vel)
    new_td = set_frame2(t.td_obs, jnp.full((maxc,), td, t.td_obs.dtype))
    new_depth = set_frame2(t.depth_meas, feats.depth)

    new_est = jnp.where(alloc_r, -1.0, t.est_depth).astype(t.est_depth.dtype)
    new_flag = jnp.where(alloc_r, FLAG_NONE, t.flag).astype(jnp.int32)
    new_dyn = jnp.where(alloc_r, False, t.is_dynamic)

    t2 = FeatureTable(
        ids=new_ids, start=new_start, obs_mask=new_obs_mask, pts=new_pts,
        uv=new_uv, vel=new_vel, td_obs=new_td, depth_meas=new_depth,
        est_depth=new_est, flag=new_flag, is_dynamic=new_dyn,
    )

    last_track_num = jnp.sum(col_has_match)

    # --- parallax keyframe test between slots fc-2 and fc-1 ---
    fi = frame_idx - 2
    fj = frame_idx - 1
    act2 = active_rows(t2)
    ok = (
        act2
        & (t2.start <= fi)
        & t2.obs_mask[:, jnp.clip(fi, 0, FRAMES - 1)]
        & t2.obs_mask[:, jnp.clip(fj, 0, FRAMES - 1)]
    )
    pi = t2.pts[:, jnp.clip(fi, 0, FRAMES - 1)]
    pj = t2.pts[:, jnp.clip(fj, 0, FRAMES - 1)]
    para = jnp.linalg.norm(pi - pj, axis=-1)
    parallax_num = jnp.sum(ok)
    parallax_mean = jnp.sum(jnp.where(ok, para, 0.0)) / jnp.maximum(parallax_num, 1)

    is_kf = jnp.where(
        (frame_idx < 2) | (last_track_num < 20),
        True,
        jnp.where(parallax_num == 0, True, parallax_mean >= min_parallax),
    )
    return t2, is_kf, last_track_num


# ---------------------------------------------------------------------------
# Depth-validated triangulation
# ---------------------------------------------------------------------------


def cam_poses(P, Q, tic, qic):
    """World-from-camera poses for every window slot: (t_wc (F,3), R_wc (F,3,3))."""
    R_wi = quat.q2R(Q)
    t_wc = P + jnp.einsum("fij,j->fi", R_wi, tic)
    R_wc = jnp.einsum("fij,jk->fik", R_wi, quat.q2R(qic))
    return t_wc, R_wc


def triangulate_with_depth(
    t: FeatureTable,
    P: jax.Array, Q: jax.Array, tic: jax.Array, qic: jax.Array,
    depth_min_dist: float, depth_max_dist: float,
) -> FeatureTable:
    """Vectorized ``triangulateWithDepth`` (feature_manager.cpp:386-543).

    For every feature without an estimated depth: cross-validate each
    depth-carrying observation against every other observation by
    reprojection (<10/460 on the normalized plane); average validated
    depths expressed in the start frame.  In-range depths are 'verified'
    (flag 1), beyond-max depths 'rough' (flag 0); if no depth observations
    exist at all, fall back to multiview SVD-DLT (flag 2, clamped to the
    valid range).  All features and all O(F²) pairs evaluate as one fused
    batch.
    """
    dtype = t.pts.dtype
    t_wc, R_wc = cam_poses(P, Q, tic, qic)

    pts_h = jnp.concatenate([t.pts, jnp.ones_like(t.pts[..., :1])], axis=-1)  # (MAXF,F,3)

    def per_feature(start, obs_mask, pts3, depth_meas):
        # camera-frame 3D points from measured depth, world coords
        has_d = obs_mask & (depth_meas > 0)
        p_cam = pts3 * depth_meas[:, None]  # (F,3)
        p_w = jnp.einsum("fij,fj->fi", R_wc, p_cam) + t_wc  # (F,3)

        # reproject obs k's depth-point into frame j
        p_in_j = jnp.einsum("fji,kj->kfi", R_wc, p_w - 0.0) - jnp.einsum(
            "fji,fj->fi", R_wc, t_wc
        )[None, :, :]
        # p_in_j[k, j] = R_wc[j]^T (p_w[k] - t_wc[j])
        p_in_j = jnp.einsum("jli,kl->kji", R_wc, p_w) - jnp.einsum("jli,jl->ji", R_wc, t_wc)[None]
        zj = p_in_j[..., 2]
        proj = p_in_j[..., :2] / jnp.where(jnp.abs(zj) > 1e-6, zj, 1e-6)[..., None]
        resid = jnp.linalg.norm(proj - pts3[None, :, :2], axis=-1)  # (k,j)

        pair_ok = (
            has_d[:, None]
            & obs_mask[None, :]
            & (jnp.arange(FRAMES)[:, None] != jnp.arange(FRAMES)[None, :])
            & (resid < 10.0 / 460.0)
            & (zj > 0)
        )
        # depth of obs-k's point in the start frame
        s = start
        p_in_ref = jnp.einsum("i,ki->k", jnp.zeros(3, dtype), p_w) * 0.0  # placeholder
        R_r = R_wc[s]
        t_r = t_wc[s]
        depth_ref = jnp.einsum("ki,i->k", p_w - t_r[None], R_r[:, 2])  # z in ref cam

        in_range = depth_meas <= depth_max_dist
        k_valid = jnp.any(pair_ok, axis=1)
        verified_k = k_valid & in_range
        rough_k = k_valid & ~in_range
        n_ver = jnp.sum(verified_k)
        n_rough = jnp.sum(rough_k)
        ver_avg = jnp.sum(jnp.where(verified_k, depth_ref, 0.0)) / jnp.maximum(n_ver, 1)
        rough_avg = jnp.sum(jnp.where(rough_k, depth_ref, 0.0)) / jnp.maximum(n_rough, 1)

        # --- SVD-DLT fallback (only when NO obs has measured depth) ---
        no_depth_at_all = ~jnp.any(has_d & obs_mask)
        # build rows: for each frame f, P_f = [R^T | -R^T t] relative to start cam
        R_rel = jnp.einsum("li,flj->fij", R_r, R_wc)  # R_r^T R_f  (ref<-f? see below)
        t_rel = jnp.einsum("li,fl->fi", R_r, t_wc - t_r[None])  # ref-frame pos of cam f
        # projection of ref-frame point X into cam f: R_rel[f]^T (X - t_rel[f])
        Pmat = jnp.concatenate(
            [jnp.swapaxes(R_rel, 1, 2), -jnp.einsum("fij,fj->fi", jnp.swapaxes(R_rel, 1, 2), t_rel)[..., None]],
            axis=-1,
        )  # (F,3,4)
        fdir = pts3 / jnp.linalg.norm(pts3, axis=-1, keepdims=True)
        row0 = fdir[:, 0:1] * Pmat[:, 2] - fdir[:, 2:3] * Pmat[:, 0]
        row1 = fdir[:, 1:2] * Pmat[:, 2] - fdir[:, 2:3] * Pmat[:, 1]
        w = obs_mask.astype(dtype)[:, None]
        A = jnp.concatenate([row0 * w, row1 * w], axis=0)  # (2F,4)
        # smallest right singular vector of A via inverse iteration on the
        # jittered 4×4 normal matrix.  NOT jnp.linalg.eigh: TPU eigh lowers
        # to an iterative QDWH with data-dependent while_loops — vmapped
        # over the feature table it made vio_step ~30x slower on real data
        # (while_loops run to the worst lane across the whole batch)
        AtA = A.T @ A
        Mj = AtA + (1e-9 * jnp.trace(AtA) + 1e-12) * jnp.eye(4, dtype=dtype)
        Binv = jnp.linalg.inv(Mj)
        v = jnp.full((4,), 0.5, dtype)
        for _ in range(4):
            v = Binv @ v
            v = v / jnp.maximum(jnp.linalg.norm(v), 1e-30)
        svd_depth = v[2] / jnp.where(jnp.abs(v[3]) > 1e-12, v[3], 1e-12)
        svd_depth = jnp.where(svd_depth < depth_min_dist, depth_max_dist, svd_depth)

        depth = jnp.where(
            n_ver > 0, ver_avg,
            jnp.where(n_rough > 0, rough_avg,
                      jnp.where(no_depth_at_all, svd_depth, -1.0)),
        )
        flag = jnp.where(
            n_ver > 0, FLAG_MEASURED,
            jnp.where(n_rough > 0, FLAG_NONE,
                      jnp.where(no_depth_at_all, FLAG_TRIANGULATED, FLAG_NONE)),
        )
        # clamp tiny/negative depths to INIT_DEPTH (flag 0)
        bad = (depth > -0.5) & (depth < 0.1)
        depth = jnp.where(bad, INIT_DEPTH, depth)
        flag = jnp.where(bad, FLAG_NONE, flag)
        return depth, flag

    depth_new, flag_new = jax.vmap(per_feature)(t.start, t.obs_mask, pts_h, t.depth_meas)

    eligible = (
        active_rows(t)
        & (t.est_depth <= 0)
        & ~t.is_dynamic
        & (obs_count(t) >= MIN_OBS_FOR_DEPTH)
        & (t.start < WINDOW_SIZE - 2)
        & (depth_new > 0)
    )
    return t._replace(
        est_depth=jnp.where(eligible, depth_new, t.est_depth),
        flag=jnp.where(eligible, flag_new, t.flag),
    )


# ---------------------------------------------------------------------------
# Solver interface: inverse depths in/out
# ---------------------------------------------------------------------------


def solver_depth_view(t: FeatureTable, fix_depth: bool):
    """Returns (inv_depth (MAXF,), free_mask, valid_mask) for the BA.

    A feature enters the problem when it has ≥2 obs and a depth estimate
    (``getFeatureCount``-style gating, feature_manager.cpp:197-230); its
    inverse depth is a *free* variable unless flag==FLAG_MEASURED and the
    rig fixes verified depths (config ``fix_depth``, reference
    ``para_Feature`` constancy, estimator.cpp:1267-1346 semantics).
    """
    valid = (
        active_rows(t)
        & (obs_count(t) >= 2)
        & (t.start < WINDOW_SIZE - 2)
        & (t.est_depth > 0)
        & ~t.is_dynamic
    )
    inv_depth = jnp.where(valid, 1.0 / jnp.maximum(t.est_depth, 1e-6), 1.0)
    free = valid & ~(fix_depth & (t.flag == FLAG_MEASURED))
    return inv_depth, free, valid


def update_depths_from_solver(t: FeatureTable, inv_depth: jax.Array, free_mask: jax.Array) -> FeatureTable:
    """Write optimized inverse depths back; negative results mark failures
    (reference ``setDepth`` solve_flag==2 → ``removeFailures``)."""
    new_depth = 1.0 / jnp.where(jnp.abs(inv_depth) > 1e-8, inv_depth, 1e-8)
    est = jnp.where(free_mask, new_depth, t.est_depth)
    failed = free_mask & (new_depth <= 0)
    # failed features are dropped entirely
    return drop_rows(t._replace(est_depth=est), failed)


def drop_rows(t: FeatureTable, mask: jax.Array) -> FeatureTable:
    keep = ~mask
    return t._replace(
        ids=jnp.where(keep, t.ids, -1),
        obs_mask=t.obs_mask & keep[:, None],
        est_depth=jnp.where(keep, t.est_depth, -1.0),
        flag=jnp.where(keep, t.flag, 0),
        is_dynamic=t.is_dynamic & keep,
    )


# ---------------------------------------------------------------------------
# Window slide
# ---------------------------------------------------------------------------


def slide_old(
    t: FeatureTable,
    marg_t_wc: jax.Array, marg_R_wc: jax.Array,
    new_t_wc: jax.Array, new_R_wc: jax.Array,
) -> FeatureTable:
    """Marginalize-oldest shift (``removeBackShiftDepth``,
    feature_manager.cpp:660-691): every slot moves left by one; features
    that started at slot 0 lose that observation and get their depth
    re-projected from the marginalized camera into the new start camera;
    features left with <2 observations die."""
    started0 = active_rows(t) & (t.start == 0)

    # re-project depth for features that started at slot 0
    pts0 = jnp.concatenate([t.pts[:, 0], jnp.ones_like(t.pts[:, 0, :1])], axis=-1)
    p_cam0 = pts0 * t.est_depth[:, None]
    p_w = p_cam0 @ marg_R_wc.T + marg_t_wc[None]
    p_new = (p_w - new_t_wc[None]) @ new_R_wc
    dep_j = p_new[:, 2]
    shifted_depth = jnp.where(dep_j > 0, dep_j, INIT_DEPTH)
    has_depth = t.est_depth > 0
    new_est = jnp.where(started0 & has_depth, shifted_depth, t.est_depth)

    # roll window left
    rolled = _roll_left(t)
    new_start = jnp.maximum(t.start - 1, 0)
    t2 = rolled._replace(start=new_start, est_depth=new_est)

    # drop features that fell below 2 observations after losing slot 0
    dead = active_rows(t2) & (jnp.sum(t2.obs_mask, axis=1) < 2) & started0
    # also features with no observations at all
    dead = dead | (active_rows(t2) & ~jnp.any(t2.obs_mask, axis=1))
    return drop_rows(t2, dead)


def slide_new(t: FeatureTable) -> FeatureTable:
    """Marginalize-second-newest shift (``removeFront``,
    feature_manager.cpp:710-730): the newest observation (slot F-1) moves
    into slot F-2; features that started at F-1 start at F-2 now; features
    whose only observation was slot F-2 die."""
    last, second = FRAMES - 1, FRAMES - 2
    had_last = t.obs_mask[:, last]

    def move(field):
        f = field.at[:, second].set(jnp.where(
            had_last[(...,) + (None,) * (field.ndim - 2)] if field.ndim > 2 else had_last,
            field[:, last], field[:, second]))
        return f.at[:, last].set(jnp.zeros_like(field[:, last]))

    obs = t.obs_mask.at[:, second].set(
        jnp.where(had_last, True, False)
    ).at[:, last].set(False)
    # features that didn't reach slot `second` keep their mask minus last
    obs = jnp.where(
        (t.obs_mask[:, second] | had_last)[:, None],
        obs,
        t.obs_mask.at[:, last].set(False),
    )
    t2 = t._replace(
        obs_mask=obs,
        pts=move(t.pts), uv=move(t.uv), vel=move(t.vel),
        td_obs=move(t.td_obs), depth_meas=move(t.depth_meas),
        start=jnp.where(t.start == last, second, t.start).astype(t.start.dtype),
    )
    dead = active_rows(t2) & ~jnp.any(t2.obs_mask, axis=1)
    return drop_rows(t2, dead)


def _roll_left(t: FeatureTable) -> FeatureTable:
    def roll(field):
        out = jnp.roll(field, -1, axis=1)
        return out.at[:, -1].set(jnp.zeros_like(field[:, -1]))

    return t._replace(
        obs_mask=roll(t.obs_mask),
        pts=roll(t.pts), uv=roll(t.uv), vel=roll(t.vel),
        td_obs=roll(t.td_obs), depth_meas=roll(t.depth_meas),
    )
