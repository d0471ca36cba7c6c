"""Feature tracker integration tests on synthetic translating scenes."""

import numpy as np
import jax
import jax.numpy as jnp

from vins_rgbd_fast_tpu.frontend import feature_tracker as ft
from vins_rgbd_fast_tpu.models import make_camera

H, W = 240, 320
CAM = make_camera("PINHOLE", fx=460.0, fy=460.0, cx=W / 2.0, cy=H / 2.0,
                  width=W, height=H)
CFG = ft.TrackerConfig(width=W, height=H, max_cnt=60, min_dist=20,
                       grid_rows=4, grid_cols=5, use_imu_prediction=False,
                       fast_threshold=12.0)


def _scene(t, seed=0):
    """Corner-rich checkerboard texture translating at 30 px/s."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.arange(H, dtype=np.float64),
                         np.arange(W, dtype=np.float64), indexing="ij")
    shift = 30.0 * t
    x = xx - shift
    y = yy - 0.5 * shift
    img = np.zeros((H, W))
    # smooth corner-rich blob grid (band-limited — no hard-edge aliasing,
    # so subpixel scene motion is observable) + texture
    img += 110.0 * np.tanh(2.5 * np.sin(2 * np.pi * x / 24)) * np.tanh(
        2.5 * np.sin(2 * np.pi * y / 24))
    for _ in range(6):
        fy, fx = rng.uniform(0.05, 0.25, 2)
        img += rng.uniform(10, 25) * np.sin(fy * y + fx * x)
    return jnp.asarray(np.clip(img + 128, 0, 255).astype(np.float32))


def _run_sequence(n_frames=5, dt=0.1):
    state = ft.init_state(CFG)
    eye = jnp.eye(3)
    outs = []
    for k in range(n_frames):
        img = _scene(k * dt)
        state, out = ft.track_frame(
            CFG, CAM, state, img, jnp.asarray(k * dt), eye,
            jax.random.PRNGKey(k),
        )
        outs.append(out)
    return state, outs


def test_detection_fills_feature_budget():
    _, outs = _run_sequence(1)
    n = int(outs[0].n_total)
    assert 20 <= n <= CFG.max_cnt


def test_min_dist_respected():
    _, outs = _run_sequence(1)
    f = outs[0].features
    ids = np.asarray(f.ids)
    uv = np.asarray(f.uv)[ids >= 0]
    d = np.linalg.norm(uv[:, None] - uv[None, :], axis=-1)
    np.fill_diagonal(d, 1e9)
    assert d.min() >= CFG.min_dist - 1e-3


def test_tracking_persists_ids_and_counts():
    state, outs = _run_sequence(4)
    f0, f3 = outs[0].features, outs[3].features
    ids0 = set(np.asarray(f0.ids)[np.asarray(f0.ids) >= 0].tolist())
    ids3 = np.asarray(f3.ids)
    survived = [i for i in ids3 if i >= 0 and i in ids0]
    assert len(survived) >= 10  # most features track across 3 steps
    cnt = np.asarray(state.track_cnt)
    assert cnt.max() >= 4


def test_flow_matches_scene_motion():
    _, outs = _run_sequence(3, dt=0.1)
    f1, f2 = outs[1].features, outs[2].features
    ids1, ids2 = np.asarray(f1.ids), np.asarray(f2.ids)
    uv1, uv2 = np.asarray(f1.uv), np.asarray(f2.uv)
    common = {}
    for k, i in enumerate(ids1):
        if i >= 0:
            common[i] = k
    flows = []
    for k, i in enumerate(ids2):
        if i >= 0 and i in common:
            flows.append(uv2[k] - uv1[common[i]])
    flows = np.asarray(flows)
    assert len(flows) >= 10
    med = np.median(flows, axis=0)
    np.testing.assert_allclose(med, [3.0, 1.5], atol=0.3)  # 30px/s·0.1s


def test_velocity_output_normalized_units():
    _, outs = _run_sequence(3, dt=0.1)
    f2 = outs[2].features
    ids = np.asarray(f2.ids)
    vel = np.asarray(f2.vel)[ids >= 0]
    # expected: 30 px/s horizontally -> 30/460 per second on normalized plane
    med = np.median(vel, axis=0)
    np.testing.assert_allclose(med, [30.0 / 460.0, 15.0 / 460.0], atol=0.02)


def test_fisheye_mask_limits_detection():
    cfg = ft.TrackerConfig(width=W, height=H, max_cnt=60, min_dist=12,
                           grid_rows=4, grid_cols=5, use_imu_prediction=False,
                           fast_threshold=12.0, fisheye=True,
                           fisheye_radius_frac=0.35)
    state = ft.init_state(cfg)
    state, out = ft.track_frame(cfg, CAM, state, _scene(0.0), jnp.asarray(0.0),
                                jnp.eye(3), jax.random.PRNGKey(0))
    f = out.features
    ids = np.asarray(f.ids)
    uv = np.asarray(f.uv)[ids >= 0]
    rad = 0.35 * min(H, W)
    d = np.linalg.norm(uv - np.asarray([W / 2, H / 2]), axis=-1)
    assert len(uv) > 5
    assert (d < rad + 1e-3).all()


def test_imu_prediction_mode_runs():
    cfg = ft.TrackerConfig(width=W, height=H, max_cnt=40, min_dist=20,
                           grid_rows=4, grid_cols=5, use_imu_prediction=True,
                           fast_threshold=12.0)
    state = ft.init_state(cfg)
    eye = jnp.eye(3)
    for k in range(3):
        img = _scene(k * 0.1, seed=7)
        state, out = ft.track_frame(cfg, CAM, state, img, jnp.asarray(k * 0.1),
                                    eye, jax.random.PRNGKey(k))
    assert int(out.n_tracked) >= 10


def test_parallel_admission_matches_sequential_greedy():
    """The fixed-point parallel admission must reproduce the sequential
    greedy scan (lexicographically-first min-dist admission set) exactly."""
    cfg = ft.TrackerConfig(width=640, height=480, max_cnt=130, min_dist=30,
                           grid_rows=7, grid_cols=8)
    G = cfg.num_grids
    for seed in range(8):
        rng = np.random.default_rng(seed)
        M = 420
        xy = jnp.asarray(rng.uniform(0, 600, (M, 2)))
        eligible = jnp.asarray(rng.random(M) < 0.8)
        blocker = jnp.asarray(rng.random(M) < 0.1) & ~eligible
        grids = jnp.asarray(rng.integers(0, G, M, dtype=np.int32))
        need = jnp.asarray(rng.integers(0, 5, G, dtype=np.int32))
        isnew = jnp.asarray(np.arange(M) >= 196)
        a = ft._greedy_admission(cfg, xy, eligible, blocker, grids, need, isnew)
        b = ft._parallel_admission(cfg, xy, eligible, blocker, grids, need,
                                   isnew, rounds=16)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f"seed {seed}")


def test_fisheye_mask_file_non_circular(tmp_path):
    """A mask IMAGE (not the analytic circle) must gate detections and
    kill tracks — the reference loads config/fisheye_mask.jpg and
    intersects it in setMask (feature_tracker.cpp:173-208).  Uses a
    non-circular (left-half-valid) mask so the analytic-circle fallback
    cannot pass by accident."""
    import dataclasses

    from vins_rgbd_fast_tpu.io.writers import write_png

    mask = np.zeros((H, W), np.uint8)
    mask[:, : W // 2] = 255  # left half valid
    path = str(tmp_path / "mask.png")
    write_png(path, mask)
    cfg = dataclasses.replace(CFG, fisheye=True, fisheye_mask_path=path)
    state = ft.init_state(cfg)
    eye = jnp.eye(3)
    for k in range(3):
        state, out = ft.track_frame(cfg, CAM, state, _scene(k * 0.1),
                                    jnp.asarray(k * 0.1), eye,
                                    jax.random.PRNGKey(k))
    ids = np.asarray(out.features.ids)
    uv = np.asarray(out.features.uv)
    sel = ids >= 0
    assert sel.sum() >= 10, "mask killed everything"
    assert np.all(uv[sel, 0] < W // 2 + 1), "feature outside the mask"


def test_fisheye_mask_resize_to_frame():
    """Reference masks ship at 512x512; loading must resize to the rig
    frame with a crisp boundary."""
    from vins_rgbd_fast_tpu.io.images import load_mask, resize_nearest

    m = np.zeros((512, 512), np.float32)
    m[:, :256] = 255.0
    r = resize_nearest(m, H, W)
    assert r.shape == (H, W)
    assert (r[:, : W // 2 - 2] > 127).all()
    assert (r[:, W // 2 + 2:] <= 127).all()
