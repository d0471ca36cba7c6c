"""vins_rgbd_fast_tpu — a TPU-native RGB-D inertial odometry / SLAM framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
jianhengLiu/VINS-RGBD-FAST (an RGB-D + IMU sliding-window VIO system with
grid-FAST feature tracking, depth-aided initialization, marginalization
priors, and BRIEF loop closure; see /root/reference).

Design stance (TPU-first, not a port):
  * fixed shapes everywhere: dense feature tables + validity masks replace
    the reference's dynamic ``list<FeaturePerId>``;
  * three compiled programs: frontend (image -> feature table update),
    backend (feature frame + IMU batch -> window state), loop closure
    (retrieval + pose-graph optimization); a thin host shell replaces ROS;
  * batched Levenberg-Marquardt with dense Schur complement on the MXU
    replaces Ceres; ``lax.scan`` replaces per-sample C++ loops;
  * throughput scaling via ``jax.sharding.Mesh`` + ``shard_map`` over
    batched independent sequences.
"""

__version__ = "0.1.0"
