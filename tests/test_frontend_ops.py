"""Frontend op tests: FAST corners, CLAHE, pyramidal LK, RANSAC."""

import numpy as np
import jax
import jax.numpy as jnp

from vins_rgbd_fast_tpu.ops import fast as fast_ops
from vins_rgbd_fast_tpu.ops import image as image_ops
from vins_rgbd_fast_tpu.ops import lk as lk_ops
from vins_rgbd_fast_tpu.ops import ransac as ransac_ops
from vins_rgbd_fast_tpu.utils import quaternion as quat


def _checker_corner_img(H=120, W=160):
    """Black image with a bright rectangle — strong corners at its 4 corners."""
    img = np.zeros((H, W), np.float32)
    img[40:80, 50:110] = 200.0
    return img


def _texture(H, W, seed=0, shift=(0.0, 0.0)):
    """Smooth analytic sinusoid texture, optionally evaluated at coordinates
    shifted by (dx, dy) — giving an exactly-translated second frame with no
    resampling error."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.arange(H, dtype=np.float64),
                         np.arange(W, dtype=np.float64), indexing="ij")
    yy = yy - shift[1]
    xx = xx - shift[0]
    img = np.zeros((H, W))
    for _ in range(12):
        fy, fx = rng.uniform(0.02, 0.2, 2)
        ph = rng.uniform(0, 2 * np.pi)
        img += rng.uniform(20, 60) * np.sin(fy * yy + fx * xx + ph)
    return (img + 400.0) * 0.25


def _pair(H, W, shift, seed):
    return (_texture(H, W, seed).astype(np.float32),
            _texture(H, W, seed, shift=shift).astype(np.float32))


def test_fast_detects_rect_corners():
    img = _checker_corner_img()
    score = np.asarray(fast_ops.nms3(fast_ops.fast_score(jnp.asarray(img), 20.0)))
    ys, xs = np.nonzero(score)
    assert len(ys) >= 4
    # every detection within 3px of one of the 4 true corners
    corners = np.array([[40, 50], [40, 109], [79, 50], [79, 109]])
    for y, x in zip(ys, xs):
        d = np.abs(corners - np.array([y, x])).max(axis=1).min()
        assert d <= 3, (y, x)
    # flat interior has no response
    assert score[55:70, 60:100].max() == 0


def test_fast_border_is_clean():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (64, 96)).astype(np.float32)
    score = np.asarray(fast_ops.fast_score(jnp.asarray(img), 10.0))
    assert score[:3].max() == 0 and score[-3:].max() == 0
    assert score[:, :3].max() == 0 and score[:, -3:].max() == 0


def test_grid_topk_shapes_and_positions():
    img = _checker_corner_img()
    score = fast_ops.nms3(fast_ops.fast_score(jnp.asarray(img), 20.0))
    xy, resp = fast_ops.grid_topk(score, rows=3, cols=4, per_grid=2)
    assert xy.shape == (24, 2) and resp.shape == (24,)
    live = np.asarray(resp) > 0
    pts = np.asarray(xy)[live]
    for x, y in pts:
        assert np.asarray(score)[int(y), int(x)] > 0


def test_clahe_preserves_range_and_boosts_contrast():
    rng = np.random.default_rng(1)
    # low-contrast image
    img = (rng.uniform(100, 140, (128, 128))).astype(np.float32)
    out = np.asarray(image_ops.clahe(jnp.asarray(img)))
    assert out.min() >= -1e-3 and out.max() <= 255.001
    assert out.std() > np.asarray(img).std() * 1.5


def test_lk_small_translation():
    shift = np.array([1.7, -2.3])  # (dx, dy)
    img, img2 = _pair(120, 160, shift, seed=0)
    pts = jnp.asarray(np.array([[40.0, 40.0], [80.0, 60.0], [120.0, 90.0], [60.0, 30.0]]))
    pyr1 = image_ops.build_pyramid(jnp.asarray(img), 2)
    pyr2 = image_ops.build_pyramid(jnp.asarray(img2), 2)
    res = lk_ops.pyramidal_lk(pyr1, pyr2, pts, pts, jnp.ones(4, bool))
    assert bool(res.status.all())
    flow = np.asarray(res.pts) - np.asarray(pts)
    # per-point subpixel accuracy ~0.15px (LK template-gradient model error),
    # mean bias well under 0.1px
    np.testing.assert_allclose(flow, np.tile(shift, (4, 1)), atol=0.2)
    assert np.abs(flow.mean(0) - shift).max() < 0.1


def test_lk_large_translation_needs_pyramid():
    shift = np.array([14.0, 9.0])
    img, img2 = _pair(160, 200, shift, seed=3)
    pts = jnp.asarray(np.array([[60.0, 60.0], [100.0, 80.0], [140.0, 100.0]]))
    pyr1 = image_ops.build_pyramid(jnp.asarray(img), 4)
    pyr2 = image_ops.build_pyramid(jnp.asarray(img2), 4)
    res = lk_ops.pyramidal_lk(pyr1, pyr2, pts, pts, jnp.ones(3, bool))
    flow = np.asarray(res.pts) - np.asarray(pts)
    ok = np.asarray(res.status)
    assert ok.all()
    np.testing.assert_allclose(flow[ok], np.tile(shift, (ok.sum(), 1)), atol=0.3)


def test_lk_initial_flow_single_level():
    """With a good warm start (the IMU-predicted path) one level suffices."""
    shift = np.array([11.0, -7.0])
    img, img2 = _pair(120, 160, shift, seed=5)
    pts = jnp.asarray(np.array([[50.0, 50.0], [90.0, 70.0]]))
    init = pts + jnp.asarray(shift + np.array([0.8, -0.6]))  # imperfect prediction
    pyr1 = image_ops.build_pyramid(jnp.asarray(img), 2)
    pyr2 = image_ops.build_pyramid(jnp.asarray(img2), 2)
    res = lk_ops.pyramidal_lk(pyr1, pyr2, pts, init, jnp.ones(2, bool))
    flow = np.asarray(res.pts) - np.asarray(pts)
    assert bool(res.status.all())
    np.testing.assert_allclose(flow, np.tile(shift, (2, 1)), atol=0.2)


def _two_view_scene(n=60, n_out=10, seed=0):
    rng = np.random.default_rng(seed)
    Pw = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                   rng.uniform(3, 9, n)], -1)
    R = np.asarray(quat.q2R(quat.so3_exp(jnp.asarray([0.05, -0.08, 0.03]))))
    t = np.array([0.4, -0.1, 0.2])
    p1 = Pw[:, :2] / Pw[:, 2:3]
    Pc2 = (Pw - t) @ R  # world->cam2 with R = R_wc
    p2 = Pc2[:, :2] / Pc2[:, 2:3]
    # focal-460 pixel coords (reference convention for rejectWithF)
    p1px = p1 * 460.0 + np.array([320.0, 240.0])
    p2px = p2 * 460.0 + np.array([320.0, 240.0])
    out_idx = rng.choice(n, n_out, replace=False)
    p2px[out_idx] += rng.uniform(15, 60, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    gt_inlier = np.ones(n, bool)
    gt_inlier[out_idx] = False
    return p1px, p2px, gt_inlier, (R, t, Pw, p2)


def test_fundamental_ransac_rejects_outliers():
    p1, p2, gt_in, _ = _two_view_scene()
    res = ransac_ops.fundamental_ransac(
        jax.random.PRNGKey(0), jnp.asarray(p1), jnp.asarray(p2),
        jnp.ones(len(p1), bool), threshold=1.0,
    )
    inl = np.asarray(res.inliers)
    assert bool(res.ok)
    # all true inliers kept, all outliers rejected
    assert inl[gt_in].mean() > 0.95
    assert inl[~gt_in].sum() == 0


def test_fundamental_ransac_recall_under_noise():
    """Noisy-inlier recall in float32 (regression: without the consensus
    refit a single 8-point sample misclassifies most noisy inliers at the
    1px threshold, silently killing ~85% of tracks every frame)."""
    rng = np.random.default_rng(3)
    p1, p2, gt_in, _ = _two_view_scene(n=130, n_out=20, seed=3)
    p1 = p1 + rng.normal(0, 0.3, p1.shape)
    p2 = p2 + rng.normal(0, 0.3, p2.shape)
    res = ransac_ops.fundamental_ransac(
        jax.random.PRNGKey(0), jnp.asarray(p1, jnp.float32),
        jnp.asarray(p2, jnp.float32), jnp.ones(len(p1), bool),
        threshold=1.0, n_trials=64,
    )
    inl = np.asarray(res.inliers)
    assert bool(res.ok)
    assert inl[gt_in].mean() > 0.9, f"recall {inl[gt_in].mean():.2f}"
    assert inl[~gt_in].mean() < 0.1


def test_pnp_ransac_recovers_pose():
    _, _, gt_in, (R, t, Pw, p2) = _two_view_scene(seed=2)
    p2n = p2.copy()
    p2n[~gt_in] += 0.2  # outliers in normalized coords
    res = ransac_ops.pnp_ransac(
        jax.random.PRNGKey(1), jnp.asarray(Pw), jnp.asarray(p2n),
        jnp.ones(len(Pw), bool),
    )
    assert bool(res.ok)
    M = np.asarray(res.model)
    R_est, t_est = M[:, :3], M[:, 3]
    # model maps world -> cam2: x_c = R_est x_w + t_est ; ground truth is
    # x_c = R.T (x_w - t)
    np.testing.assert_allclose(R_est, R.T, atol=2e-2)
    np.testing.assert_allclose(t_est, -R.T @ t, atol=2e-2)
    inl = np.asarray(res.inliers)
    assert inl[~gt_in].sum() == 0


def test_fast_pallas_matches_xla():
    """The fused Pallas FAST+NMS stencil is exact-equivalent to the XLA
    formulation (interpret mode here; checked on-device too)."""
    import numpy as np
    from vins_rgbd_fast_tpu.ops import fast as fast_ops
    from vins_rgbd_fast_tpu.ops import fast_pallas

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 255, (100, 128)).astype(np.float32))
    ref = fast_ops.nms3(fast_ops.fast_score(img, 20.0))
    out = fast_pallas.fast_score_nms(img, 20.0, interpret=True)
    assert np.array_equal(np.asarray(ref), np.asarray(out))


def test_lk_pallas2_matches_xla_loop():
    """The VMEM-resident Pallas LK iteration kernel (interpret mode) is
    numerically equivalent to the XLA while_loop formulation."""
    import numpy as np
    H, W = 120, 160
    yy, xx = np.meshgrid(np.arange(H, dtype=np.float64),
                         np.arange(W, dtype=np.float64), indexing="ij")
    img0 = (120 + 50 * np.sin(xx / 7.0) * np.cos(yy / 9.0)).astype(np.float32)
    img1 = (120 + 50 * np.sin((xx - 1.4) / 7.0)
            * np.cos((yy + 0.8) / 9.0)).astype(np.float32)
    p0 = tuple(image_ops.build_pyramid(jnp.asarray(img0), 2))
    p1 = tuple(image_ops.build_pyramid(jnp.asarray(img1), 2))
    rng = np.random.default_rng(5)
    pts = jnp.asarray(np.stack([rng.uniform(25, 135, 24),
                                rng.uniform(25, 95, 24)], -1).astype(np.float32))
    act = jnp.ones(24, bool)
    a = lk_ops.pyramidal_lk(p0, p1, pts, pts, act, max_iters=8,
                            coarse_iters=4, sampler="matmul", engine="xla")
    b = lk_ops.pyramidal_lk(p0, p1, pts, pts, act, max_iters=8,
                            coarse_iters=4, sampler="matmul",
                            engine="pallas", engine_interpret=True)
    assert np.abs(np.asarray(a.pts) - np.asarray(b.pts)).max() < 1e-3
    assert bool((a.status == b.status).all())


def test_lk_pallas3_matches_xla_loop():
    """The fused DMA+iteration Pallas level kernel (v3, interpret mode)
    is numerically equivalent to the XLA matmul-sampler formulation —
    including status semantics (eig gate, window containment, border)."""
    import numpy as np
    H, W = 120, 160
    yy, xx = np.meshgrid(np.arange(H, dtype=np.float64),
                         np.arange(W, dtype=np.float64), indexing="ij")
    img0 = (120 + 50 * np.sin(xx / 7.0) * np.cos(yy / 9.0)).astype(np.float32)
    img1 = (120 + 50 * np.sin((xx - 1.4) / 7.0)
            * np.cos((yy + 0.8) / 9.0)).astype(np.float32)
    p0 = tuple(image_ops.build_pyramid(jnp.asarray(img0), 2))
    p1 = tuple(image_ops.build_pyramid(jnp.asarray(img1), 2))
    rng = np.random.default_rng(5)
    # include near-border points and one far-out (diverged-track) point
    pts = np.stack([rng.uniform(15, 145, 24), rng.uniform(15, 105, 24)], -1)
    pts[0] = [11.0, 11.0]
    pts[1] = [-40.0, 200.0]
    pts = jnp.asarray(pts.astype(np.float32))
    act = jnp.ones(24, bool).at[2].set(False)
    a = lk_ops.pyramidal_lk(p0, p1, pts, pts, act, max_iters=8,
                            coarse_iters=4, sampler="matmul", engine="xla")
    b = lk_ops.pyramidal_lk(p0, p1, pts, pts, act, max_iters=8,
                            coarse_iters=4, sampler="matmul",
                            engine="pallas3", engine_interpret=True)
    ok = np.asarray(a.status)
    assert bool((a.status == b.status).all())
    assert np.abs(np.asarray(a.pts) - np.asarray(b.pts))[ok].max() < 1e-3
    assert np.abs(np.asarray(a.err) - np.asarray(b.err))[ok].max() < 1e-3
