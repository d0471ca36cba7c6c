"""Golden-bytes rosbag fixture: a minimal bag hand-assembled byte-by-byte
from the rosbag v2.0 spec (http://wiki.ros.org/Bags/Format/2.0) — NOT via
io/writers.py — so symmetric writer/reader bugs cannot cancel (the round-1
time-field endianness bug would fail this test).

Covers: record framing, connection records (header + embedded type header),
uncompressed chunks, top-level message records, the secs-low/nsecs-high
packing of the 'time' field, time-ordered iteration, and exact
sensor_msgs/Imu + sensor_msgs/Image payload decoding."""

import struct

import numpy as np
import pytest

from vins_rgbd_fast_tpu.io import rosbag as rb
from vins_rgbd_fast_tpu.runtime import bag_lib


def _field(name: str, value: bytes) -> bytes:
    f = name.encode() + b"=" + value
    return struct.pack("<I", len(f)) + f


def _record(fields: bytes, data: bytes) -> bytes:
    return struct.pack("<I", len(fields)) + fields + \
        struct.pack("<I", len(data)) + data


def _time_field(secs: int, nsecs: int) -> bytes:
    # rosbag packs time as uint32 secs (LOW bytes) then uint32 nsecs (HIGH)
    return struct.pack("<II", secs, nsecs)


GOLD_ACC = (0.1, 0.2, 9.8)
GOLD_GYR = (0.01, -0.02, 0.03)


def _imu_payload(seq: int, sec: int, nsec: int) -> bytes:
    out = struct.pack("<III", seq, sec, nsec)
    out += struct.pack("<I", 4) + b"imu0"      # frame_id
    out += struct.pack("<4d", 1.0, 0.0, 0.0, 0.0)   # orientation
    out += struct.pack("<9d", *([0.0] * 9))         # orientation cov
    out += struct.pack("<3d", *GOLD_GYR)            # angular_velocity
    out += struct.pack("<9d", *([0.0] * 9))         # gyr cov
    out += struct.pack("<3d", *GOLD_ACC)            # linear_acceleration
    out += struct.pack("<9d", *([0.0] * 9))         # acc cov
    return out


def _image_payload(sec: int, nsec: int, h: int, w: int) -> bytes:
    out = struct.pack("<III", 0, sec, nsec)
    out += struct.pack("<I", 3) + b"cam"
    out += struct.pack("<II", h, w)
    out += struct.pack("<I", 5) + b"mono8"
    out += struct.pack("<B", 0)        # is_bigendian
    out += struct.pack("<I", w)        # step
    pix = bytes(range(h * w))
    out += struct.pack("<I", len(pix)) + pix
    return out


def _build_golden_bag(path: str):
    bag = b"#ROSBAG V2.0\n"
    # bag header record (op=0x03) — ignored by the reader but spec'd first
    bh = _field("op", b"\x03") + _field("index_pos", struct.pack("<Q", 0)) + \
        _field("conn_count", struct.pack("<I", 2)) + \
        _field("chunk_count", struct.pack("<I", 1))
    bag += _record(bh, b"\x20" * 8)  # spec pads the header record

    # connection records: conn 0 = /imu0, conn 1 = /cam0
    c0h = _field("op", b"\x07") + _field("conn", struct.pack("<I", 0)) + \
        _field("topic", b"/imu0")
    c0d = _field("topic", b"/imu0") + _field("type", b"sensor_msgs/Imu") + \
        _field("md5sum", b"0" * 32) + _field("message_definition", b"")
    bag += _record(c0h, c0d)
    c1h = _field("op", b"\x07") + _field("conn", struct.pack("<I", 1)) + \
        _field("topic", b"/cam0")
    c1d = _field("topic", b"/cam0") + _field("type", b"sensor_msgs/Image") + \
        _field("md5sum", b"0" * 32) + _field("message_definition", b"")
    bag += _record(c1h, c1d)

    # chunk (op=0x05, compression=none) with two messages WRITTEN OUT OF
    # TIME ORDER: msg A t=(101 s, 0 ns) before msg B t=(100 s, 999999999 ns).
    # A raw-uint64 sort of the time field would keep A first; the correct
    # secs-low decode must order B first.
    mAh = _field("op", b"\x02") + _field("conn", struct.pack("<I", 0)) + \
        _field("time", _time_field(101, 0))
    mA = _record(mAh, _imu_payload(1, 101, 0))
    mBh = _field("op", b"\x02") + _field("conn", struct.pack("<I", 0)) + \
        _field("time", _time_field(100, 999999999))
    mB = _record(mBh, _imu_payload(0, 100, 999999999))
    inner = mA + mB
    ch = _field("op", b"\x05") + _field("compression", b"none") + \
        _field("size", struct.pack("<I", len(inner)))
    bag += _record(ch, inner)

    # a top-level (unchunked) image message at t=102.5
    mIh = _field("op", b"\x02") + _field("conn", struct.pack("<I", 1)) + \
        _field("time", _time_field(102, 500000000))
    bag += _record(mIh, _image_payload(102, 500000000, 3, 4))

    with open(path, "wb") as f:
        f.write(bag)


@pytest.mark.skipif(bag_lib() is None, reason="native bag reader unavailable")
def test_golden_bag_decodes_exactly(tmp_path):
    path = str(tmp_path / "golden.bag")
    _build_golden_bag(path)
    reader = rb.BagReader(path)

    assert reader.topics() == {"/imu0": "sensor_msgs/Imu",
                               "/cam0": "sensor_msgs/Image"}
    msgs = list(reader.messages())
    assert len(msgs) == 3

    # time-ordered: 100.999999999 < 101.0 < 102.5 (catches raw-uint64 sort)
    topics = [m[0] for m in msgs]
    stamps = [m[1] for m in msgs]
    assert topics == ["/imu0", "/imu0", "/cam0"]
    np.testing.assert_allclose(
        stamps, [100.999999999, 101.0, 102.5], rtol=0, atol=1e-9)

    # exact IMU decode (in-message header stamp, not the record stamp)
    t0, acc0, gyr0 = rb.decode_imu(msgs[0][2])
    assert abs(t0 - 100.999999999) < 1e-9
    np.testing.assert_array_equal(acc0, np.asarray(GOLD_ACC))
    np.testing.assert_array_equal(gyr0, np.asarray(GOLD_GYR))
    t1, acc1, gyr1 = rb.decode_imu(msgs[1][2])
    assert abs(t1 - 101.0) < 1e-9

    # exact image decode
    ti, enc, img = rb.decode_image(msgs[2][2])
    assert abs(ti - 102.5) < 1e-9
    assert enc == "mono8"
    np.testing.assert_array_equal(
        img, np.arange(12, dtype=np.uint8).reshape(3, 4))
