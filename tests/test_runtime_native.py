"""Native C++ runtime tests: behavioral equivalence with the Python
stream pairer, IMU interval assembly, and rosbag parsing."""

import struct

import numpy as np
import pytest

from vins_rgbd_fast_tpu.io import stream as pystream

native = pytest.importorskip("vins_rgbd_fast_tpu.runtime")


def _have_native():
    return native.stream_lib() is not None


pytestmark = pytest.mark.skipif(not _have_native(), reason="g++ build failed")


def _feed_sequences(py, nat, times, skew=0.001):
    for k, t in enumerate(times):
        img = np.full((2, 2), k, np.float32)
        dep = np.ones((2, 2), np.float32)
        py.push_image(pystream.ImageMsg(t=t, image=img))
        py.push_depth(pystream.DepthMsg(t=t + skew, depth=dep))
        nat.push_image(t, img)
        nat.push_depth(t + skew, dep)


def test_pairer_equivalence_with_gates():
    py = pystream.StreamPairer(frontend_freq=20.0, publish_freq=10.0)
    nat = native.NativeStreamRuntime(frontend_freq=20.0, publish_freq=10.0)
    times = [k / 30.0 for k in range(40)]  # 30 Hz input vs 20 Hz gate
    _feed_sequences(py, nat, times)
    py_frames, nat_frames = [], []
    while True:
        f = py.next_frame()
        if f is None:
            break
        py_frames.append((round(f.t, 6), f.publish))
    while True:
        f = nat.next_frame()
        if f is None:
            break
        nat_frames.append((round(f["t"], 6), f["publish"]))
    assert py_frames == nat_frames
    assert 0 < len(py_frames) < len(times)  # gate actually dropped frames


def test_pairer_discontinuity_reset():
    nat = native.NativeStreamRuntime(frontend_freq=0, publish_freq=0)
    img = np.zeros((2, 2), np.float32)
    for t in (0.0, 0.05, 5.0):  # 5-second gap
        nat.push_image(t, img)
        nat.push_depth(t, img)
    f1 = nat.next_frame()
    f2 = nat.next_frame()
    f3 = nat.next_frame()
    assert not f1["reset"] and not f2["reset"]
    assert f3["reset"]


def test_interval_matches_python_collector():
    """The C++ interval assembly must match the Python VinsEstimator logic."""
    from vins_rgbd_fast_tpu.config import VinsConfig
    from vins_rgbd_fast_tpu.backend.estimator import VinsEstimator

    rng = np.random.default_rng(0)
    ts = np.cumsum(rng.uniform(0.004, 0.006, 40))
    accs = rng.normal(0, 1, (40, 3))
    gyrs = rng.normal(0, 0.1, (40, 3))

    est = VinsEstimator(VinsConfig(max_imu_per_frame=32))
    nat = native.NativeStreamRuntime()
    for t, a, g in zip(ts, accs, gyrs):
        est.push_imu(t, a, g)
        nat.push_imu(t, a, g)

    t0, t1 = float(ts[5]), float(ts[25])
    iv = est._collect_interval(t0, t1)
    dts, acc, gyr = nat.collect_interval(t0, t1, 32)
    np.testing.assert_allclose(np.asarray(iv.dts), dts, atol=1e-12)
    np.testing.assert_allclose(np.asarray(iv.acc), acc, atol=1e-6)
    np.testing.assert_allclose(np.asarray(iv.gyr), gyr, atol=1e-6)


# ---------------------------------------------------------------------------
# rosbag parsing
# ---------------------------------------------------------------------------


def _bag_record(header_fields: dict, data: bytes) -> bytes:
    hdr = b""
    for k, v in header_fields.items():
        field = k.encode() + b"=" + v
        hdr += struct.pack("<I", len(field)) + field
    return struct.pack("<I", len(hdr)) + hdr + struct.pack("<I", len(data)) + data


def _write_tiny_bag(path):
    """Construct a minimal uncompressed rosbag v2.0 with one IMU connection
    and two messages."""
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        # bag header record (op=0x03) with padding data
        f.write(_bag_record({"op": b"\x03", "index_pos": struct.pack("<Q", 0),
                             "conn_count": struct.pack("<I", 1),
                             "chunk_count": struct.pack("<I", 1)}, b" " * 8))
        # connection record (op=0x07)
        conn_data = b""
        for k, v in {"topic": b"/imu", "type": b"sensor_msgs/Imu",
                     "md5sum": b"0", "message_definition": b""}.items():
            field = k.encode() + b"=" + v
            conn_data += struct.pack("<I", len(field)) + field
        conn = _bag_record({"op": b"\x07", "conn": struct.pack("<I", 0),
                            "topic": b"/imu"}, conn_data)
        # two message records (op=0x02) inside an uncompressed chunk
        def msg(t_sec, payload):
            time = struct.pack("<II", t_sec, 0)
            return _bag_record({"op": b"\x02", "conn": struct.pack("<I", 0),
                                "time": time}, payload)

        inner = conn + msg(10, b"payload-a") + msg(11, b"payload-bb")
        f.write(_bag_record({"op": b"\x05", "compression": b"none",
                             "size": struct.pack("<I", len(inner))}, inner))


def test_bag_reader_orders_across_seconds(tmp_path):
    """The packed 'time' field stores secs in the LOW word and nsecs in the
    HIGH word; a raw uint64 sort would order by nanoseconds and put t=101.1
    before t=100.9.  Replay order must be by (secs, nsecs)."""
    if native.bag_lib() is None:
        pytest.skip("bag lib build failed")
    path = str(tmp_path / "order.bag")
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        conn_data = b""
        for k, v in {"topic": b"/imu", "type": b"sensor_msgs/Imu",
                     "md5sum": b"0", "message_definition": b""}.items():
            field = k.encode() + b"=" + v
            conn_data += struct.pack("<I", len(field)) + field
        conn = _bag_record({"op": b"\x07", "conn": struct.pack("<I", 0),
                            "topic": b"/imu"}, conn_data)

        def msg(secs, nsecs, payload):
            time = struct.pack("<II", secs, nsecs)
            return _bag_record({"op": b"\x02", "conn": struct.pack("<I", 0),
                                "time": time}, payload)

        inner = (conn
                 + msg(101, 100_000_000, b"late")    # t = 101.1
                 + msg(100, 900_000_000, b"early"))  # t = 100.9
        f.write(_bag_record({"op": b"\x05", "compression": b"none",
                             "size": struct.pack("<I", len(inner))}, inner))
    from vins_rgbd_fast_tpu.io.rosbag import BagReader

    msgs = list(BagReader(path).messages())
    assert [m[2] for m in msgs] == [b"early", b"late"]
    assert msgs[0][1] == pytest.approx(100.9)
    assert msgs[1][1] == pytest.approx(101.1)


def test_bag_reader_parses_synthetic_bag(tmp_path):
    if native.bag_lib() is None:
        pytest.skip("bag lib build failed")
    path = str(tmp_path / "tiny.bag")
    _write_tiny_bag(path)
    from vins_rgbd_fast_tpu.io.rosbag import BagReader

    bag = BagReader(path)
    assert bag.topics() == {"/imu": "sensor_msgs/Imu"}
    msgs = list(bag.messages())
    assert len(msgs) == 2
    topic, stamp, payload = msgs[0]
    assert topic == "/imu"
    assert stamp == pytest.approx(10.0)
    assert payload == b"payload-a"
    assert msgs[1][2] == b"payload-bb"
