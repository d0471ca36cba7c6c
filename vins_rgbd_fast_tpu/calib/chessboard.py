"""Chessboard corner detection for intrinsic calibration.

Capability twin of the reference's ``camera_model/src/calib/Chessboard.cc``
(camodocal's OpenCV-style detector: adaptive threshold → quad extraction →
corner linking → sub-pixel refinement).  TPU-native redesign: the whole
per-image detection is ONE jitted program — two checkerboard response
convolutions (axis-aligned and 45°-rotated quadrant kernels), local-mean
removal, NMS, a global ``top_k``, and quadratic sub-pixel refinement — and
only the final grid ORDERING (a few hundred points) runs on host, where it
is a 4-correspondence homography fit instead of quad-graph traversal.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Response + refinement (device)
# ---------------------------------------------------------------------------


def _quadrant_kernels(r: int) -> np.ndarray:
    """(2, 2r+1, 2r+1) checkerboard response kernels: sign(x̃·ỹ) fires on
    axis-aligned saddle corners, sign(|x̃|−|ỹ|) on 45°-rotated ones (the
    ChESS-style pair; together they cover any board orientation)."""
    xs = np.arange(-r, r + 1, dtype=np.float32)
    X, Y = np.meshgrid(xs, xs)
    a = np.sign(X * Y)
    b = np.sign(np.abs(X) - np.abs(Y))
    a /= np.abs(a).sum() or 1.0
    b /= np.abs(b).sum() or 1.0
    return np.stack([a, b]).astype(np.float32)


def _conv2(img: jax.Array, k: jax.Array) -> jax.Array:
    return jax.lax.conv_general_dilated(
        img[None, None], k[None, None], (1, 1), "SAME")[0, 0]


@functools.partial(jax.jit, static_argnames=("max_corners", "radius"))
def detect_corners(img: jax.Array, max_corners: int, radius: int = 4):
    """Checkerboard corner candidates: (uv (M,2) float32 subpixel,
    score (M,)) sorted by response, M = max_corners.  One dispatch."""
    img = img.astype(jnp.float32)
    ka, kb = (jnp.asarray(k) for k in _quadrant_kernels(radius))
    mean_k = jnp.ones((2 * radius + 1, 2 * radius + 1), jnp.float32)
    mean_k = mean_k / mean_k.size
    z = img - _conv2(img, mean_k)  # local-mean removal
    resp = jnp.maximum(jnp.abs(_conv2(z, ka)), jnp.abs(_conv2(z, kb)))

    # NMS over a (2radius+1)² window, border suppressed
    H, W = img.shape
    mx = jax.lax.reduce_window(resp, -jnp.inf, jax.lax.max,
                               (2 * radius + 1, 2 * radius + 1),
                               (1, 1), "SAME")
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    border = ((yy >= radius + 1) & (yy < H - radius - 1)
              & (xx >= radius + 1) & (xx < W - radius - 1))
    peaks = jnp.where((resp >= mx) & border, resp, 0.0)

    vals, idx = jax.lax.top_k(peaks.reshape(-1), max_corners)
    ys = idx // W
    xs = idx % W

    # quadratic sub-pixel refinement on the response surface
    def quad(c_m, c_0, c_p):
        denom = c_m - 2.0 * c_0 + c_p
        return jnp.where(jnp.abs(denom) > 1e-9,
                         0.5 * (c_m - c_p) / denom, 0.0)

    g = lambda dy, dx: resp[jnp.clip(ys + dy, 0, H - 1),
                            jnp.clip(xs + dx, 0, W - 1)]
    dx = jnp.clip(quad(g(0, -1), g(0, 0), g(0, 1)), -0.5, 0.5)
    dy = jnp.clip(quad(g(-1, 0), g(0, 0), g(1, 0)), -0.5, 0.5)
    uv = jnp.stack([xs.astype(jnp.float32) + dx,
                    ys.astype(jnp.float32) + dy], axis=-1)
    return uv, vals


# ---------------------------------------------------------------------------
# Grid ordering (host; few hundred points)
# ---------------------------------------------------------------------------


def _h_from_4(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Homography from exactly 4 correspondences (plain DLT)."""
    A = []
    for (x, y), (u, v) in zip(src, dst):
        A.append([x, y, 1, 0, 0, 0, -u * x, -u * y, -u])
        A.append([0, 0, 0, x, y, 1, -v * x, -v * y, -v])
    _, _, Vt = np.linalg.svd(np.asarray(A, np.float64))
    H = Vt[-1].reshape(3, 3)
    return H / H[2, 2]


def _apply_h(H: np.ndarray, pts: np.ndarray) -> np.ndarray:
    ph = np.concatenate([pts, np.ones_like(pts[:, :1])], axis=1) @ H.T
    return ph[:, :2] / ph[:, 2:3]


def order_grid(uv: np.ndarray, rows: int, cols: int,
               tol: float = 0.25) -> np.ndarray | None:
    """Order rows*cols detected corners into board-index order
    (row-major, like the reference's ``Chessboard::getCorners``).

    Picks the 4 extreme corners (max/min of x±y), tries the 8 assignments
    of them to the board's rectangle corners (4 rotations × transpose),
    keeps the homography under which every point snaps to a distinct
    integer grid node within ``tol`` (grid units).  Returns (rows*cols, 2)
    or None if no consistent ordering exists.  Board orientation is
    recovered up to the checkerboard's own symmetry — exactly the
    ambiguity every chessboard detector has."""
    uv = np.asarray(uv, np.float64)
    n = rows * cols
    if uv.shape[0] < n:
        return None
    s, d = uv[:, 0] + uv[:, 1], uv[:, 0] - uv[:, 1]
    ext = uv[[np.argmin(s), np.argmax(d), np.argmax(s), np.argmin(d)]]
    if len({tuple(p) for p in map(tuple, ext)}) < 4:
        return None

    corners = [(0.0, 0.0), (cols - 1.0, 0.0),
               (cols - 1.0, rows - 1.0), (0.0, rows - 1.0)]
    best = None
    for rot in range(4):
        for flip in (False, True):
            tgt = corners[rot:] + corners[:rot]
            if flip:
                tgt = tgt[::-1]
            H = _h_from_4(ext, np.asarray(tgt))
            g = _apply_h(H, uv)
            gi = np.round(g)
            res = np.abs(g - gi).max(axis=1)
            ok = ((res < tol) & (gi[:, 0] >= 0) & (gi[:, 0] < cols)
                  & (gi[:, 1] >= 0) & (gi[:, 1] < rows))
            if ok.sum() < n:
                continue
            keys = (gi[ok, 1] * cols + gi[ok, 0]).astype(int)
            if len(np.unique(keys)) != n:
                continue
            # clutter can snap onto an occupied node (ok.sum() > n with
            # unique count still n): keep the LOWEST-residual point per
            # node, never last-write-wins
            res_ok = res[ok]
            order = np.argsort(-res_ok)  # worst first -> best written last
            out = np.zeros((n, 2))
            out[keys[order]] = uv[ok][order]
            kept = np.full(n, np.inf)
            np.minimum.at(kept, keys, res_ok)
            err = float(kept.mean())
            if best is None or err < best[0]:
                best = (err, out)
    return None if best is None else best[1]


def find_chessboard(img, rows: int, cols: int,
                    radius: int = 4) -> np.ndarray | None:
    """Detect + order a (rows×cols inner corner) chessboard.  Returns
    (rows*cols, 2) pixel corners in row-major board order, or None."""
    n = rows * cols
    uv, score = detect_corners(jnp.asarray(img), max_corners=n + n // 2,
                               radius=radius)
    uv, score = np.asarray(uv), np.asarray(score)
    # adaptive cut: corners of a real board have comparable response;
    # clutter tails off
    thresh = 0.35 * score[: n].mean()
    uv = uv[score > thresh]
    for take in (n, min(len(uv), n + n // 4), len(uv)):
        if take >= n:
            got = order_grid(uv[:take], rows, cols)
            if got is not None:
                return got
    return None
