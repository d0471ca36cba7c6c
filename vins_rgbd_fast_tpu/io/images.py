"""Host-side image file loading (fisheye masks, calibration inputs,
compressed-bag payloads).

The reference reads its mask images with ``cv::imread``
(``feature_tracker/parameters.cpp`` FISHEYE_MASK); here PIL decodes on the
host — these are one-time config loads or bag-replay decodes, never on the
device hot path.
"""

from __future__ import annotations

import io as _io

import numpy as np


def load_gray(path: str) -> np.ndarray:
    """Decode an image file to grayscale float32 (H, W) in [0, 255]."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("L"), np.float32)


def decode_gray(data: bytes) -> np.ndarray:
    """Decode an in-memory PNG/JPEG payload to grayscale float32 (H, W)
    (``sensor_msgs/CompressedImage`` replay)."""
    from PIL import Image

    with Image.open(_io.BytesIO(data)) as im:
        return np.asarray(im.convert("L"), np.float32)


def decode_depth(data: bytes) -> np.ndarray:
    """Decode an in-memory 16-bit PNG depth payload to float32 millimetres
    (the reference's compressedDepth transport re-encodes mono16 as PNG)."""
    from PIL import Image

    with Image.open(_io.BytesIO(data)) as im:
        arr = np.asarray(im)
    return arr.astype(np.float32)


def resize_nearest(img: np.ndarray, height: int, width: int) -> np.ndarray:
    """Nearest-neighbour resize (mask images: interpolation would blur the
    valid/invalid boundary)."""
    H, W = img.shape[:2]
    ys = np.clip((np.arange(height) * H) // height, 0, H - 1)
    xs = np.clip((np.arange(width) * W) // width, 0, W - 1)
    return img[ys[:, None], xs[None, :]]


def load_mask(path: str, height: int, width: int) -> np.ndarray:
    """Load a fisheye-mask image as (height, width) bool: nonzero = valid
    FOV (the reference intersects FISHEYE_MASK in setMask,
    ``feature_tracker.cpp:173-208``)."""
    m = load_gray(path)
    if m.shape != (height, width):
        m = resize_nearest(m, height, width)
    return m > 127.0
