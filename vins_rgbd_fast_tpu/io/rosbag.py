"""rosbag v2.0 replay (data loader) — native parser + message decoding.

The reference consumes its D435i/OpenLORIS datasets via live ROS topics;
this module replays the same ``.bag`` files standalone: the container is
parsed by the native C++ reader (``runtime/csrc/bag_reader.cpp``) and the
ROS 1 serialized messages (sensor_msgs/Image, sensor_msgs/Imu) are decoded
here into numpy arrays, feeding the deterministic stream runtime.
"""

from __future__ import annotations

import ctypes
import struct
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from ..runtime import bag_lib


class BagReader:
    """Iterates (topic, stamp, raw_payload) over a rosbag v2.0 file."""

    def __init__(self, path: str):
        lib = bag_lib()
        if lib is None:
            raise RuntimeError("native bag reader unavailable (g++ build failed)")
        self._lib = lib
        self._ctx = lib.vins_bag_open(path.encode())
        err = lib.vins_bag_error(self._ctx).decode()
        if err:
            raise IOError(f"bag open failed: {err}")
        self._conn_topic: Dict[int, str] = {}
        self._conn_type: Dict[int, str] = {}
        n = lib.vins_bag_num_connections(self._ctx)
        for i in range(n):
            topic = ctypes.create_string_buffer(256)
            typ = ctypes.create_string_buffer(256)
            conn = lib.vins_bag_connection(self._ctx, i, topic, 256, typ, 256)
            if conn >= 0:
                self._conn_topic[conn] = topic.value.decode()
                self._conn_type[conn] = typ.value.decode()

    def __del__(self):
        try:
            self._lib.vins_bag_close(self._ctx)
        except Exception:
            pass

    def topics(self) -> Dict[str, str]:
        return {t: self._conn_type[c] for c, t in self._conn_topic.items()}

    def __len__(self) -> int:
        return self._lib.vins_bag_num_messages(self._ctx)

    def messages(self) -> Iterator[Tuple[str, float, bytes]]:
        n = len(self)
        conn = ctypes.c_int()
        stamp = ctypes.c_double()
        for i in range(n):
            size = self._lib.vins_bag_message_info(
                self._ctx, i, ctypes.byref(conn), ctypes.byref(stamp))
            if size < 0:
                continue
            buf = (ctypes.c_uint8 * size)()
            self._lib.vins_bag_message_data(self._ctx, i, buf, size)
            topic = self._conn_topic.get(conn.value, "?")
            yield topic, stamp.value, bytes(buf)


# ---------------------------------------------------------------------------
# ROS 1 message decoding (little-endian serialized streams)
# ---------------------------------------------------------------------------


def _read_string(buf: bytes, off: int) -> Tuple[str, int]:
    (n,) = struct.unpack_from("<I", buf, off)
    off += 4
    return buf[off:off + n].decode(errors="replace"), off + n


def _read_header(buf: bytes, off: int) -> Tuple[float, str, int]:
    """std_msgs/Header: seq(u32), stamp(sec u32, nsec u32), frame_id(string)."""
    seq, sec, nsec = struct.unpack_from("<III", buf, off)
    off += 12
    frame_id, off = _read_string(buf, off)
    return sec + 1e-9 * nsec, frame_id, off


def decode_imu(payload: bytes):
    """sensor_msgs/Imu -> (stamp, acc (3,), gyr (3,))."""
    stamp, _, off = _read_header(payload, 0)
    # orientation (4 f64) + cov (9 f64)
    off += 4 * 8 + 9 * 8
    gyr = np.frombuffer(payload, np.float64, 3, off)
    off += 3 * 8 + 9 * 8
    acc = np.frombuffer(payload, np.float64, 3, off)
    return stamp, np.asarray(acc), np.asarray(gyr)


def decode_image(payload: bytes):
    """sensor_msgs/Image -> (stamp, encoding, array (H,W) or (H,W,C))."""
    stamp, _, off = _read_header(payload, 0)
    height, width = struct.unpack_from("<II", payload, off)
    off += 8
    encoding, off = _read_string(payload, off)
    off += 1 + 4  # is_bigendian (u8) + step (u32)
    (n,) = struct.unpack_from("<I", payload, off)
    off += 4
    raw = payload[off:off + n]
    if encoding in ("mono8", "8UC1"):
        img = np.frombuffer(raw, np.uint8).reshape(height, width)
    elif encoding in ("mono16", "16UC1"):
        img = np.frombuffer(raw, np.uint16).reshape(height, width)
    elif encoding == "32FC1":
        img = np.frombuffer(raw, np.float32).reshape(height, width)
    elif encoding in ("rgb8", "bgr8"):
        img = np.frombuffer(raw, np.uint8).reshape(height, width, 3)
    else:
        raise ValueError(f"unsupported image encoding {encoding}")
    return stamp, encoding, img


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_compressed_image(payload: bytes):
    """sensor_msgs/CompressedImage -> (stamp, format, array).

    The reference's documented multi-machine transport (Atlas200 replays
    compressed topics, ``doc/RUNNING_PROCEDURE.md``,
    ``launch/atlas200/{img2compressed,compressed2img}.launch``).  Handles
    both plain image_transport payloads (JPEG/PNG bytes) and
    compressed_depth_image_transport ("...; compressedDepth png"), whose
    data prepends a 12-byte ConfigHeader before the PNG stream."""
    from .images import decode_depth as _decode_png16
    from .images import decode_gray

    stamp, _, off = _read_header(payload, 0)
    fmt, off = _read_string(payload, off)
    (n,) = struct.unpack_from("<I", payload, off)
    off += 4
    data = payload[off:off + n]
    if "compressedDepth" in fmt:
        # compressed_depth_image_transport: ConfigHeader (format enum u32 +
        # 2 f32 quantization params) then PNG-encoded 16UC1
        body = data[12:] if not data.startswith(_PNG_MAGIC) else data
        if not body.startswith(_PNG_MAGIC):
            raise ValueError(f"compressedDepth payload is not PNG ({fmt!r})")
        return stamp, fmt, _decode_png16(body)
    return stamp, fmt, decode_gray(data)


def to_grayscale(img: np.ndarray, encoding: str) -> np.ndarray:
    if img.ndim == 2:
        return img.astype(np.float32)
    # rgb8/bgr8: luminance (the reference converts with cv_bridge mono8)
    w = np.asarray([0.299, 0.587, 0.114], np.float32)
    if encoding == "bgr8":
        w = w[::-1]
    return (img.astype(np.float32) @ w)


def replay_into_pipeline(bag: BagReader, pipeline, image_topic: str,
                         depth_topic: str, imu_topic: str,
                         max_messages: Optional[int] = None):
    """Feed a bag into a VinsPipeline (offline, deterministic order).

    Raw AND compressed transports replay: topics typed
    ``sensor_msgs/CompressedImage`` are decoded via PNG/JPEG (the
    reference's Atlas200 compressed-topic deployment); matching also
    accepts the ``<topic>/compressed`` naming convention."""
    from .stream import decode_depth

    types = bag.topics()

    def _match(topic, want):
        return topic == want or topic == want + "/compressed" \
            or topic == want + "/compressedDepth"

    count = 0
    for topic, stamp, payload in bag.messages():
        if max_messages is not None and count >= max_messages:
            break
        count += 1
        compressed = types.get(topic, "") == "sensor_msgs/CompressedImage"
        if topic == imu_topic:
            t, acc, gyr = decode_imu(payload)
            pipeline.push_imu(t, acc, gyr)
        elif _match(topic, image_topic):
            if compressed:
                t, _, img = decode_compressed_image(payload)
                pipeline.push_image(t, img.astype(np.float32))
            else:
                t, enc, img = decode_image(payload)
                pipeline.push_image(t, to_grayscale(img, enc))
        elif _match(topic, depth_topic):
            if compressed:
                t, _, img = decode_compressed_image(payload)
                pipeline.push_depth(t, decode_depth(img.astype(np.uint16),
                                                    "16UC1"))
            else:
                t, enc, img = decode_image(payload)
                pipeline.push_depth(t, decode_depth(img, enc))
            pipeline.spin_once()
