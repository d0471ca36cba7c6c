"""Real-data plumbing proof: render a synthetic sequence, write it in the
exact on-disk formats the reference consumes (rosbag v2.0 with chunked
sensor_msgs, TUM RGB-D directory), then drive the FULL ingestion path —
native bag parser / TUM loader → message decode → stream pairing →
pipeline → trajectory CSV — and ATE the result."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vins_rgbd_fast_tpu.config import VinsConfig
from vins_rgbd_fast_tpu.io import stream as io_stream
from vins_rgbd_fast_tpu.io import synthetic as syn
from vins_rgbd_fast_tpu.io import writers
from vins_rgbd_fast_tpu.pipeline import VinsPipeline

W, H = 320, 240
RIG = syn.SyntheticRig(width=W, height=H, fx=230.0, fy=230.0, cx=160.0,
                       cy=120.0, imu_rate=200.0, frame_rate=20.0)


def _cfg(seq, imu=True, **kw):
    return VinsConfig(
        imu=imu, static_init=True, image_width=W, image_height=H,
        intrinsics=(RIG.fx, RIG.fy, RIG.cx, RIG.cy), distortion=(0, 0, 0, 0),
        ric=tuple(seq.ric.ravel().tolist()), tic=tuple(seq.tic.tolist()),
        max_cnt=60, max_features=96, max_imu_per_frame=16,
        min_dist=16, num_grid_rows=4, num_grid_cols=5,
        frontend_freq=0.0, freq=0.0,
        fix_depth=True, depth_min_dist=0.3, depth_max_dist=12.0,
        acc_n=0.1, gyr_n=0.01, acc_w=1e-4, gyr_w=1e-5,
        keyframe_parallax=10.0, **kw,
    )


def test_png_roundtrip(tmp_path):
    from vins_rgbd_fast_tpu.io.tum import _decode_png

    rng = np.random.default_rng(0)
    g8 = rng.integers(0, 255, (24, 32), dtype=np.uint8)
    writers.write_png(str(tmp_path / "g8.png"), g8)
    np.testing.assert_array_equal(_decode_png(str(tmp_path / "g8.png")), g8)
    g16 = rng.integers(0, 65535, (24, 32), dtype=np.uint16)
    writers.write_png(str(tmp_path / "g16.png"), g16)
    np.testing.assert_array_equal(_decode_png(str(tmp_path / "g16.png")), g16)


@pytest.mark.slow
def test_rosbag_roundtrip_to_trajectory(tmp_path):
    from vins_rgbd_fast_tpu.io.rosbag import BagReader, replay_into_pipeline
    from vins_rgbd_fast_tpu.runtime import bag_lib

    if bag_lib() is None:
        pytest.skip("native bag reader unavailable")

    n = 22
    seq = syn.make_trajectory(n, RIG, seed=9, omega_scale=0.15, acc_scale=0.3)
    # serialize EVERYTHING through the bag: mono8 gray, 16UC1 depth in mm
    msgs = []
    for (t, a, w) in seq.imu:
        msgs.append(("/imu", "sensor_msgs/Imu", t, writers.serialize_imu(t, a, w)))
    for (t, img, depth) in syn.frames(seq, RIG):
        gray = np.clip(np.asarray(img), 0, 255).astype(np.uint8)
        dmm = np.clip(np.asarray(depth) * 1000.0, 0, 65535).astype(np.uint16)
        msgs.append(("/cam/image", "sensor_msgs/Image", t,
                     writers.serialize_image(t, gray, "mono8")))
        msgs.append(("/cam/depth", "sensor_msgs/Image", t,
                     writers.serialize_image(t, dmm, "16UC1")))
    msgs.sort(key=lambda m: m[2])
    bag_path = str(tmp_path / "synthetic.bag")
    writers.write_rosbag(bag_path, msgs, chunk_size=256 * 1024)

    bag = BagReader(bag_path)
    assert set(bag.topics()) == {"/imu", "/cam/image", "/cam/depth"}
    assert len(bag) == len(msgs)

    cfg = _cfg(seq)
    pipe = VinsPipeline(cfg, dtype=jnp.float32, eager_outputs=False,
                        failure_check_interval=10 ** 9)
    replay_into_pipeline(bag, pipe, "/cam/image", "/cam/depth", "/imu")
    while pipe.spin_once() is not None:
        pass
    traj = pipe.estimator.trajectory
    assert len(traj) >= 10, f"only {len(traj)} outputs from bag replay"

    csv_path = str(tmp_path / "vins_result_no_loop.csv")
    io_stream.write_trajectory_csv(csv_path, traj)
    rows = np.loadtxt(csv_path, delimiter=",", usecols=range(11))
    assert rows.shape[0] == len(traj)
    ate = io_stream.ate_rmse(rows[:, 0] * 1e-9, rows[:, 1:4],
                             seq.times, seq.P, align=False)
    travelled = np.sum(np.linalg.norm(np.diff(seq.P, axis=0), axis=1))
    assert np.isfinite(ate)
    assert ate < max(0.05 * travelled, 0.08), (ate, travelled)


@pytest.mark.slow
def test_tum_directory_roundtrip(tmp_path):
    from vins_rgbd_fast_tpu.io.tum import TumSequence

    n = 18
    seq = syn.make_trajectory(n, RIG, seed=11, omega_scale=0.12, acc_scale=0.25)
    frames = [(t, np.asarray(img), np.asarray(depth))
              for (t, img, depth) in syn.frames(seq, RIG)]
    gt = [(seq.times[k], seq.P[k], seq.Q[k]) for k in range(n)]
    root = str(tmp_path / "tumseq")
    writers.write_tum_sequence(root, frames, gt=gt)

    tum = TumSequence(root)
    assert len(tum) == n

    # VO mode like the reference's tum_fr3 rig (imu: 0)
    cfg = _cfg(seq, imu=False)
    pipe = VinsPipeline(cfg, dtype=jnp.float32, eager_outputs=False,
                        failure_check_interval=10 ** 9)
    for (t, gray, depth_m) in tum.frames():
        pipe.push_image(t, gray)
        pipe.push_depth(t, depth_m)
        pipe.spin_once()
    while pipe.spin_once() is not None:
        pass
    traj = pipe.estimator.trajectory
    assert len(traj) >= 6, f"only {len(traj)} outputs from TUM replay"
    est_P = [r["P"] for r in traj]
    ate = io_stream.ate_rmse([r["t"] for r in traj], est_P,
                             seq.times, seq.P, align=False)
    travelled = np.sum(np.linalg.norm(np.diff(seq.P, axis=0), axis=1))
    assert np.isfinite(ate)
    assert ate < max(0.06 * travelled, 0.1), (ate, travelled)


def test_compressed_bag_roundtrip_to_trajectory(tmp_path):
    """CompressedImage transport end-to-end: PNG-compressed gray +
    compressedDepth PNG payloads through the native bag parser →
    decode_compressed_image → pipeline → trajectory (the reference's
    Atlas200 compressed-topic deployment, doc/RUNNING_PROCEDURE.md,
    launch/atlas200/{img2compressed,compressed2img}.launch)."""
    from vins_rgbd_fast_tpu.io.rosbag import (BagReader,
                                              decode_compressed_image,
                                              replay_into_pipeline)
    from vins_rgbd_fast_tpu.runtime import bag_lib

    if bag_lib() is None:
        pytest.skip("native bag reader unavailable")

    n = 22
    seq = syn.make_trajectory(n, RIG, seed=9, omega_scale=0.15, acc_scale=0.3)
    msgs = []
    for (t, a, w) in seq.imu:
        msgs.append(("/imu", "sensor_msgs/Imu", t,
                     writers.serialize_imu(t, a, w)))
    first_gray = None
    for (t, img, depth) in syn.frames(seq, RIG):
        gray = np.clip(np.asarray(img), 0, 255).astype(np.uint8)
        if first_gray is None:
            first_gray = gray
        dmm = np.clip(np.asarray(depth) * 1000.0, 0, 65535).astype(np.uint16)
        msgs.append(("/cam/image/compressed", "sensor_msgs/CompressedImage",
                     t, writers.serialize_compressed_image(t, gray)))
        msgs.append(("/cam/depth/compressedDepth",
                     "sensor_msgs/CompressedImage", t,
                     writers.serialize_compressed_image(
                         t, dmm, depth_transport=True)))
    msgs.sort(key=lambda m: m[2])
    bag_path = str(tmp_path / "compressed.bag")
    writers.write_rosbag(bag_path, msgs, chunk_size=256 * 1024)

    bag = BagReader(bag_path)
    assert bag.topics()["/cam/image/compressed"] == "sensor_msgs/CompressedImage"
    # exact decode: PNG round trip is lossless
    for topic, stamp, payload in bag.messages():
        if topic == "/cam/image/compressed":
            t0, fmt, img0 = decode_compressed_image(payload)
            assert fmt == "png"
            np.testing.assert_array_equal(img0.astype(np.uint8), first_gray)
            break

    pipe = VinsPipeline(_cfg(seq), dtype=jnp.float32, eager_outputs=False,
                        failure_check_interval=10 ** 9)
    replay_into_pipeline(bag, pipe, "/cam/image", "/cam/depth", "/imu")
    while pipe.spin_once() is not None:
        pass
    traj = pipe.estimator.trajectory
    assert len(traj) >= 10, f"only {len(traj)} outputs from compressed replay"
    ate = io_stream.ate_rmse(
        [r["t"] for r in traj], [r["P"] for r in traj],
        seq.times, seq.P, align=False)
    assert np.isfinite(ate) and ate < 0.1, ate
