#!/usr/bin/env python
"""Run the VIO pipeline on a dataset — the roslaunch-equivalent entry point.

Examples:
  # reference rig config + rosbag (native parser, no ROS)
  python scripts/run_vio.py --config /root/reference/config/realsense/vio.yaml \
      --bag handheld.bag --output out/

  # TUM RGB-D sequence (VO mode per the tum_fr3 rig)
  python scripts/run_vio.py --config /root/reference/config/tum_rgbd/tum_fr3.yaml \
      --tum rgbd_dataset_freiburg3_walking_xyz --output out/

  # synthetic self-test sequence (no dataset required)
  python scripts/run_vio.py --synthetic 100 --output out/

Outputs: ``vins_result_no_loop.csv`` (reference format), TUM-format
``stamped_traj_estimate.txt``, and with loop closure enabled also
``vins_result_loop.csv``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", help="reference-format YAML rig file")
    ap.add_argument("--bag", help="rosbag v2.0 file")
    ap.add_argument("--tum", help="TUM RGB-D sequence directory")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="run N frames of the synthetic room instead")
    ap.add_argument("--output", default="output")
    ap.add_argument("--max-frames", type=int, default=10 ** 9)
    args = ap.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)

    import numpy as np
    import jax.numpy as jnp

    from vins_rgbd_fast_tpu.config import VinsConfig, load_config
    from vins_rgbd_fast_tpu.io import stream as io_stream
    from vins_rgbd_fast_tpu.pipeline import VinsPipeline

    os.makedirs(args.output, exist_ok=True)

    gt = None
    if args.synthetic:
        from vins_rgbd_fast_tpu.io import synthetic as syn

        rig = syn.SyntheticRig()
        seq = syn.make_trajectory(args.synthetic, rig, seed=7,
                                  omega_scale=0.15, acc_scale=0.3)
        cfg = VinsConfig(
            imu=True, static_init=True, image_width=rig.width,
            image_height=rig.height,
            intrinsics=(rig.fx, rig.fy, rig.cx, rig.cy),
            ric=tuple(seq.ric.ravel().tolist()), tic=tuple(seq.tic.tolist()),
            max_cnt=130, num_grid_rows=7, num_grid_cols=8,
            frontend_freq=0.0, freq=0.0, acc_n=0.1, gyr_n=0.01,
            acc_w=1e-4, gyr_w=1e-5, max_imu_per_frame=32, depth_max_dist=12.0,
        )
        pipe = VinsPipeline(cfg, dtype=jnp.float32)
        for (t, a, w) in seq.imu:
            pipe.push_imu(t, a, w)
        for (t, img, depth) in syn.frames(seq, rig):
            pipe.push_image(t, np.asarray(img))
            pipe.push_depth(t, np.asarray(depth))
        gt = (seq.times, seq.P)
    elif args.bag:
        cfg = load_config(args.config)
        pipe = VinsPipeline(cfg, dtype=jnp.float32)
        from vins_rgbd_fast_tpu.io.rosbag import BagReader, replay_into_pipeline

        bag = BagReader(args.bag)
        print(f"bag topics: {bag.topics()}", file=sys.stderr)
        replay_into_pipeline(bag, pipe, cfg.image_topic, cfg.depth_topic,
                             cfg.imu_topic)
    elif args.tum:
        cfg = load_config(args.config)
        pipe = VinsPipeline(cfg, dtype=jnp.float32)
        from vins_rgbd_fast_tpu.io.tum import TumSequence

        seq = TumSequence(args.tum)
        print(f"TUM sequence: {len(seq)} paired frames", file=sys.stderr)
        for (t, img, depth) in seq.frames():
            pipe.push_image(t, img)
            pipe.push_depth(t, depth)
            pipe.spin_once()
        if seq.groundtruth is not None:
            gt = (seq.groundtruth[:, 0], seq.groundtruth[:, 1:4])
    else:
        ap.error("one of --bag / --tum / --synthetic is required")

    traj = pipe.run(max_frames=args.max_frames)
    print(f"{len(traj)} odometry outputs", file=sys.stderr)

    io_stream.write_trajectory_csv(
        os.path.join(args.output, "vins_result_no_loop.csv"), traj)
    io_stream.write_tum_trajectory(
        os.path.join(args.output, "stamped_traj_estimate.txt"), traj)
    corrected = pipe.corrected_trajectory()
    if corrected:
        io_stream.write_trajectory_csv(
            os.path.join(args.output, "vins_result_loop.csv"), corrected)

    if gt is not None and traj:
        ate = io_stream.ate_rmse([r["t"] for r in traj],
                                 [r["P"] for r in traj], gt[0], gt[1])
        print(f"ATE RMSE vs ground truth: {ate:.4f} m", file=sys.stderr)
    print(pipe.timer.report(), file=sys.stderr)


if __name__ == "__main__":
    main()
