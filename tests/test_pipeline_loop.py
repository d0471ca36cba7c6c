"""Full pipeline with loop closure enabled: rendered revisit trajectory
through tracker -> estimator -> pose graph, corrected path produced."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vins_rgbd_fast_tpu.config import VinsConfig
from vins_rgbd_fast_tpu.io import synthetic as syn
from vins_rgbd_fast_tpu.loop.pose_graph import PoseGraphConfig
from vins_rgbd_fast_tpu.pipeline import VinsPipeline
from vins_rgbd_fast_tpu.utils import quaternion as quat

W, H = 320, 240
RIG = syn.SyntheticRig(width=W, height=H, fx=230.0, fy=230.0, cx=160.0,
                       cy=120.0, imu_rate=200.0, frame_rate=20.0)


def _revisit_trajectory(n_frames):
    """Out-and-back path that re-observes its start region, with exact IMU."""
    T_per = 1.0 / RIG.frame_rate
    n_sub = int(RIG.imu_rate / RIG.frame_rate)
    G = np.array([0.0, 0.0, 9.805])
    half = n_frames // 2
    # piecewise-constant world acceleration: accelerate out, decelerate back
    P = [np.zeros(3)]
    V = [np.zeros(3)]
    Q = [np.array([1.0, 0, 0, 0])]
    times = [0.0]
    imu = [(0.0, G.copy(), np.zeros(3))]
    for k in range(n_frames - 1):
        a_w = np.array([1.6, 0.0, 0.0]) if k < half // 2 else (
            np.array([-1.6, 0.0, 0.0]) if k < half + half // 2 else
            np.array([1.6, 0.0, 0.0]))
        P0, V0, t0 = P[-1], V[-1], times[-1]
        for s in range(1, n_sub + 1):
            t = T_per * s / n_sub
            imu.append((t0 + t, a_w + G, np.zeros(3)))
        P.append(P0 + V0 * T_per + 0.5 * a_w * T_per ** 2)
        V.append(V0 + a_w * T_per)
        Q.append(Q[-1].copy())
        times.append(t0 + T_per)
    return syn.SyntheticSequence(
        times=np.asarray(times), P=np.stack(P), Q=np.stack(Q), V=np.stack(V),
        imu=imu,
        ric=np.array([[0.0, 0, 1], [-1, 0, 0], [0, -1, 0]]),
        tic=np.zeros(3),
    )


@pytest.mark.slow
def test_pipeline_with_loop_closure_and_fast_relo():
    """Rendered revisit through the full stack with fast relocalization ON:
    loops MUST fire, the estimator must consume the relo factors, and the
    refined relative pose must round-trip into the pose graph's drift
    (``updateKeyFrameLoop``)."""
    n = 34
    seq = _revisit_trajectory(n)
    cfg = VinsConfig(
        imu=True, static_init=True, image_width=W, image_height=H,
        intrinsics=(RIG.fx, RIG.fy, RIG.cx, RIG.cy),
        ric=tuple(seq.ric.ravel().tolist()), tic=tuple(seq.tic.tolist()),
        max_cnt=60, max_features=96, min_dist=16,
        num_grid_rows=4, num_grid_cols=5,
        frontend_freq=0.0, freq=0.0, depth_max_dist=12.0,
        acc_n=0.1, gyr_n=0.01, acc_w=1e-4, gyr_w=1e-5, max_imu_per_frame=16,
        loop_closure=True, fast_relocalization=True,
        keyframe_parallax=0.8,  # slow trajectory: keep most frames keyframes
    )
    pg_cfg = PoseGraphConfig(max_wp=cfg.feature_capacity, max_kp=128,
                             recency_exclusion=8, min_loop_num=12,
                             score_best=0.10, score_second=0.03)
    pipe = VinsPipeline(cfg, dtype=jnp.float32, pose_graph_config=pg_cfg)
    relo_events = []
    orig_update = None

    for (t, a, w) in seq.imu:
        pipe.push_imu(t, a, w)
    for (t, img, depth) in syn.frames(seq, RIG):
        pipe.push_image(t, np.asarray(img))
        pipe.push_depth(t, np.asarray(depth))

    orig_update = pipe.pose_graph.update_keyframe_loop

    def spy(index, rel_t, rel_q, rel_yaw, **kw):
        relo_events.append((index, float(np.linalg.norm(rel_t)), rel_yaw))
        return orig_update(index, rel_t, rel_q, rel_yaw, **kw)

    pipe.pose_graph.update_keyframe_loop = spy

    traj = pipe.run()
    assert len(traj) >= 15
    assert pipe.pose_graph is not None
    assert len(pipe.pose_graph.keyframes) >= 10
    corrected = pipe.corrected_trajectory()
    assert len(corrected) == len(pipe.pose_graph.keyframes)
    for rec in corrected:
        assert np.isfinite(rec["P"]).all()
    # the revisit must close loops — this is the point of the test
    assert len(pipe.pose_graph.loops) >= 1
    for lp in pipe.pose_graph.loops:
        assert np.linalg.norm(lp["rel_t"]) < 3.0
    # and the fast-relocalization feedback must have fired with a sane
    # refined relative pose (the revisit's true relative distance is small)
    assert len(relo_events) >= 1
    for (_, rel_norm, rel_yaw) in relo_events:
        assert rel_norm < 3.0
        assert abs(rel_yaw) < 30.0
    assert np.isfinite(pipe.pose_graph.t_drift).all()


@pytest.mark.slow
def test_loop_closure_reduces_drift_ate():
    """THE loop-closure value proposition (pose_graph.cpp:410-581): on a
    scene where VIO accumulates real drift, the corrected trajectory must
    BEAT raw VIO — not merely stay sane.

    Drift source: a fast gyro pulse about the gravity axis mid-outbound
    (io/synthetic.corrupt_imu gyr_pulse).  The bias random walk can't track
    it and the induced global-yaw error is unobservable to the window, so
    the estimator carries a permanent ~10 cm offset into the revisit —
    which the 4-DoF pose graph then cancels."""
    from vins_rgbd_fast_tpu.io.stream import ate_rmse

    n = 72
    seq = syn.make_revisit_trajectory(n, RIG, seed=11, accel=1.5,
                                      axis=(0.0, 1.0, 0.0), cycles=2)
    seq = syn.corrupt_imu(seq, seed=31, gyr_noise=0.003, gyr_pulse=0.06,
                          pulse_frac=(0.18, 0.3))
    cfg = VinsConfig(
        imu=True, static_init=True, image_width=W, image_height=H,
        intrinsics=(RIG.fx, RIG.fy, RIG.cx, RIG.cy),
        ric=tuple(seq.ric.ravel().tolist()), tic=tuple(seq.tic.tolist()),
        max_cnt=60, max_features=96, min_dist=16,
        num_grid_rows=4, num_grid_cols=5,
        frontend_freq=0.0, freq=0.0, depth_max_dist=12.0,
        acc_n=0.1, gyr_n=0.01, acc_w=1e-4, gyr_w=1e-5, max_imu_per_frame=16,
        loop_closure=True, fast_relocalization=True,
        keyframe_parallax=0.8,
    )
    pg_cfg = PoseGraphConfig(max_wp=cfg.feature_capacity, max_kp=128,
                             recency_exclusion=8, min_loop_num=12,
                             score_best=0.10, score_second=0.03)
    pipe = VinsPipeline(cfg, dtype=jnp.float32, pose_graph_config=pg_cfg)
    for (t, a, w) in seq.imu:
        pipe.push_imu(t, a, w)
    for (t, img, depth) in syn.frames(seq, RIG):
        pipe.push_image(t, np.asarray(img))
        pipe.push_depth(t, np.asarray(depth))
    pipe.run()
    g = pipe.pose_graph
    assert len(g.loops) >= 3, "drifted revisit closed too few loops"

    path = g.path()
    ate_corr = ate_rmse([p[0] for p in path], [p[1] for p in path],
                        seq.times, seq.P, align=False)
    ate_vio = ate_rmse([k.t for k in g.keyframes],
                       [k.P_vio for k in g.keyframes],
                       seq.times, seq.P, align=False)
    # the pulse must have produced REAL drift (else the assertion below
    # proves nothing), and the corrections must remove most of it
    assert ate_vio > 0.05, f"drift source too weak: VIO ATE {ate_vio:.4f}"
    assert ate_corr < 0.7 * ate_vio, (
        f"loop closure failed to reduce drift: VIO {ate_vio:.4f} m -> "
        f"corrected {ate_corr:.4f} m")
