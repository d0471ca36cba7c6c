"""TUM RGB-D dataset reader (the reference's third evaluation suite,
``config/tum_rgbd/tum_fr3.yaml`` — VO mode, 30 Hz RGB-D).

Format: per-sequence directory with ``rgb.txt`` / ``depth.txt`` listing
``timestamp filename`` pairs, ``groundtruth.txt`` with ``t tx ty tz qx qy
qz qw``, and optionally ``accelerometer.txt``.  Depth PNGs are 16-bit with
scale 1/5000 m.  Images load via imageio/PIL if present, else a minimal
16-bit/8-bit PNG decoder (pure Python) keeps the reader dependency-free.
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import Iterator, List, Optional, Tuple

import numpy as np

DEPTH_SCALE = 1.0 / 5000.0  # TUM convention


def _read_list_file(path: str) -> List[Tuple[float, str]]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            out.append((float(parts[0]), parts[1]))
    return out


def _decode_png(path: str) -> np.ndarray:
    """Minimal PNG decoder (grayscale 8/16-bit, RGB 8-bit; filters 0-4)."""
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    off = 8
    idat = b""
    width = height = bitdepth = colortype = None
    while off < len(data):
        (length,) = struct.unpack_from(">I", data, off)
        ctype = data[off + 4:off + 8]
        chunk = data[off + 8:off + 8 + length]
        if ctype == b"IHDR":
            width, height, bitdepth, colortype = struct.unpack_from(">IIBB", chunk, 0)
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
        off += 12 + length
    raw = zlib.decompress(idat)
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[colortype]
    bpp = channels * (bitdepth // 8)
    stride = width * bpp
    img = np.zeros((height, stride), np.uint8)
    pos = 0
    prev = np.zeros(stride, np.uint8)
    for y in range(height):
        filt = raw[pos]
        pos += 1
        line = np.frombuffer(raw, np.uint8, stride, pos).copy()
        pos += stride
        if filt == 0:
            pass
        elif filt == 1:
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif filt == 2:
            line = (line.astype(np.int32) + prev).astype(np.uint8)
        elif filt == 3:
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((int(a) + int(prev[x])) >> 1)) & 0xFF
        elif filt == 4:
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        img[y] = line
        prev = line
    if bitdepth == 16:
        arr = img.reshape(height, width, channels, 2)
        out = (arr[..., 0].astype(np.uint16) << 8) | arr[..., 1]
        return out[..., 0] if channels == 1 else out
    arr = img.reshape(height, width, channels)
    return arr[..., 0] if channels == 1 else arr


def load_image(path: str) -> np.ndarray:
    try:
        import imageio.v3 as iio  # fast path if available

        return np.asarray(iio.imread(path))
    except Exception:
        return _decode_png(path)


class TumSequence:
    """Associates rgb/depth by stamp and iterates pipeline-ready frames."""

    def __init__(self, root: str, max_dt: float = 0.02):
        self.root = root
        self.rgb = _read_list_file(os.path.join(root, "rgb.txt"))
        self.depth = _read_list_file(os.path.join(root, "depth.txt"))
        gt_path = os.path.join(root, "groundtruth.txt")
        self.groundtruth: Optional[np.ndarray] = None
        if os.path.exists(gt_path):
            rows = []
            with open(gt_path) as f:
                for line in f:
                    if line.startswith("#") or not line.strip():
                        continue
                    rows.append([float(x) for x in line.split()])
            self.groundtruth = np.asarray(rows)
        # associate
        self.pairs: List[Tuple[float, str, str]] = []
        di = 0
        for t, rgb_file in self.rgb:
            best, best_dt = None, max_dt
            for j in range(max(di - 3, 0), min(di + 10, len(self.depth))):
                dt = abs(self.depth[j][0] - t)
                if dt < best_dt:
                    best, best_dt = j, dt
            if best is not None:
                di = best
                self.pairs.append((t, rgb_file, self.depth[best][1]))

    def __len__(self):
        return len(self.pairs)

    def frames(self) -> Iterator[Tuple[float, np.ndarray, np.ndarray]]:
        for t, rgb_file, depth_file in self.pairs:
            rgb = load_image(os.path.join(self.root, rgb_file))
            if rgb.ndim == 3:
                rgb = rgb.astype(np.float32) @ np.asarray([0.299, 0.587, 0.114], np.float32)
            depth = load_image(os.path.join(self.root, depth_file)).astype(np.float32) * DEPTH_SCALE
            yield t, rgb.astype(np.float32), depth
