"""Full VIO pipeline: stream pairing → frontend tracking → backend solve.

This is the process-level composition the reference spreads across two
nodelet worker threads and ROS topics (``estimator_nodelet.cpp:61-62,
192-568``).  On TPU the two "threads" are two compiled programs dispatched
back-to-back per frame; the host shell only decodes/pairs/buffers.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .backend import estimator as est
from .config import VinsConfig
from .frontend import feature_tracker as ft
from .io import stream as io_stream
from .utils import quaternion as quat
from .utils.timing import StageTimer


class VinsPipeline:
    """End-to-end RGB-D inertial odometry over a sensor stream."""

    def __init__(self, vcfg: VinsConfig, dtype=jnp.float32,
                 eager_outputs: bool = True, failure_check_interval: int = 1,
                 pose_graph_config=None, fused_steady_state: bool = False):
        self.vcfg = vcfg
        self.dtype = dtype
        self.cam = vcfg.camera()
        self.tcfg = ft.TrackerConfig(
            width=vcfg.image_width, height=vcfg.image_height,
            max_cnt=vcfg.max_cnt, capacity=vcfg.feature_capacity,
            min_dist=vcfg.min_dist,
            grid_rows=vcfg.num_grid_rows, grid_cols=vcfg.num_grid_cols,
            f_threshold=vcfg.f_threshold,
            fast_threshold=float(vcfg.fast_threshold),
            equalize=vcfg.equalize,
            fisheye=vcfg.fisheye,
            fisheye_mask_path=vcfg.fisheye_mask,
            use_imu_prediction=vcfg.imu,
            lk_sampler="matmul",
        )
        self.tracker_state = ft.init_state(self.tcfg, dtype)
        self.estimator = est.VinsEstimator(
            vcfg, dtype, eager_outputs=eager_outputs,
            failure_check_interval=failure_check_interval,
        )
        self.pairer = io_stream.StreamPairer(
            frontend_freq=vcfg.frontend_freq, publish_freq=vcfg.freq,
        )
        self.timer = StageTimer()
        self._frame_idx = 0
        self._held_frame = None  # paired frame waiting on IMU coverage
        self._last_frame_time: Optional[float] = None
        self._imu_for_predict: list = []  # (t, gyr)
        self._bg_cache = np.zeros(3)
        self._depth_lookup = jax.jit(ft.lookup_depth)
        # pre-split key pool: eager PRNGKey(int) per frame costs ~90 ms on
        # tunneled TPUs (new constant -> new program); indexing is ~free
        self._keys = jax.random.split(jax.random.PRNGKey(0), 4096)
        # fused steady-state: once NON_LINEAR, a frame is ONE compiled
        # program (gyro predict + track + depth + solve) — built lazily on
        # first use so config tweaks after construction are honored
        self._fused_enabled = fused_steady_state
        self._fused_fn = None

        # loop closure (the reference's second nodelet), optional
        self.pose_graph = None
        self._loop_stager = None
        if vcfg.loop_closure:
            from .loop.pose_graph import PoseGraph, PoseGraphConfig

            pg_cfg = pose_graph_config or PoseGraphConfig(
                max_wp=vcfg.feature_capacity,
                use_6dof=not vcfg.imu,  # VO mode: full SE(3) graph
            )
            self.pose_graph = PoseGraph(
                pg_cfg, self.cam, vcfg.ric_matrix(), vcfg.tic_vector(),
            )
            self._kf_travel_anchor: Optional[np.ndarray] = None
            self._kf_skip_count = 0
            self._relo_sent_kf: Optional[int] = None  # kf index awaiting relo
            if not eager_outputs:
                # async pose graph (the reference's concurrent nodelet):
                # keyframe gating reads back one frame LATE, extraction +
                # retrieval dispatch behind the next frame's fused step —
                # zero added syncs on the frame path
                from .parallel.loop_closer import AsyncLoopStager

                self._loop_stager = AsyncLoopStager(
                    self.pose_graph, self.estimator,
                    skip_cnt=vcfg.skip_cnt, skip_dis=vcfg.skip_dis,
                    fast_relocalization=vcfg.fast_relocalization)

    # ------------------------------------------------------------------
    def push_imu(self, t: float, acc, gyr):
        self.estimator.push_imu(t, acc, gyr)
        self._imu_for_predict.append((float(t), np.asarray(gyr, np.float64)))
        if len(self._imu_for_predict) > 4000:
            del self._imu_for_predict[:2000]

    def push_image(self, t: float, image: np.ndarray):
        self.pairer.push_image(io_stream.ImageMsg(t=float(t), image=image))

    def push_depth(self, t: float, depth: np.ndarray):
        self.pairer.push_depth(io_stream.DepthMsg(t=float(t), depth=depth))

    # ------------------------------------------------------------------
    def _predict_relative_R(self, t0: float, t1: float) -> np.ndarray:
        """Gyro-only camera-frame relative rotation R_c1<-c0 for tracker
        prediction (``Estimator::predictMotion``, estimator.cpp:1790-1860).

        Pure numpy — per-sample device dispatches would dominate frame time
        on tunneled devices.  The gyro bias uses a host-cached value (updated
        with the same cadence as the td cache)."""
        samples = [s for s in self._imu_for_predict if t0 < s[0] <= t1]
        if len(samples) < 1:
            return np.eye(3)
        bg = self._bg_cache
        R = np.eye(3)
        t_prev = t0
        for (ts, w) in samples:
            dt = ts - t_prev
            th = (w - bg) * dt
            a = np.linalg.norm(th)
            if a > 1e-12:
                k = th / a
                K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
                R = R @ (np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * (K @ K))
            t_prev = ts
        ric = self.vcfg.ric_matrix()
        return ric.T @ R.T @ ric

    # ------------------------------------------------------------------
    def spin_once(self) -> Optional[dict]:
        """Process at most one paired frame; returns odometry or None."""
        frame = self._held_frame
        self._held_frame = None
        if frame is None:
            frame = self.pairer.next_frame()
        if frame is None:
            return None
        if self.pairer.consume_reset():
            self.tracker_state = ft.init_state(self.tcfg, self.dtype)
            self.estimator.reset()
            self.estimator.prev_time = None
            if self.pose_graph is not None:
                # stream discontinuity starts a new pose-graph sequence
                # (pose_graph_nodelet.cpp:263-271)
                self.pose_graph.new_sequence()

        t = frame.t
        if self.vcfg.imu:
            # backend needs IMU coverage up to t+td (the reference BLOCKS on
            # IMUAvailable, estimator_nodelet.cpp:462-509): HOLD the frame
            # and retry next spin — live streams with IMU jitter must not
            # lose the frame (it is already popped from the pairer)
            if not self.estimator.imu_available(t + self.vcfg.td):
                self._held_frame = frame
                return None
            rel_R = self._predict_relative_R(
                self._last_frame_time if self._last_frame_time else t - 1e-3, t
            )
        else:
            rel_R = np.eye(3)
        self._last_frame_time = t

        if (self._fused_enabled and frame.publish
                and self.estimator.solver_flag == est.VinsEstimator.NON_LINEAR):
            out = self._spin_fused(frame)
            if self.pose_graph is not None and out is not None:
                if isinstance(out, dict):
                    self._consume_relo_result(out)
                    self._maybe_add_keyframe(out, frame, t)
                elif self._loop_stager is not None:
                    self._loop_stager.on_frame(
                        out, jnp.asarray(frame.image, self.dtype), t,
                        depth=jnp.asarray(frame.depth, self.dtype))
            return out

        with self.timer.stage("frontend"):
            img = jnp.asarray(frame.image, self.dtype)
            self.tracker_state, tout = ft.track_frame(
                self.tcfg, self.cam, self.tracker_state, img,
                jnp.asarray(t, self.dtype), jnp.asarray(rel_R, self.dtype),
                self._keys[self._frame_idx % 4096],
                pub_this_frame=True,
            )
        self._frame_idx += 1

        if not frame.publish:
            return None

        with self.timer.stage("depth_lookup"):
            feats = tout.features
            depth = self._depth_lookup(
                jnp.asarray(frame.depth, self.dtype), feats.uv, feats.ids >= 0
            )
            feats = feats._replace(depth=depth)

        with self.timer.stage("backend"):
            out = self.estimator.process_features(feats, t)

        if self.pose_graph is not None and out is not None and isinstance(out, dict):
            self._consume_relo_result(out)
            self._maybe_add_keyframe(out, frame, t)
        return out

    # ------------------------------------------------------------------
    def _build_fused(self):
        """Compile the single-dispatch steady-state frame program (shared
        core with the batched runner, ``parallel.batched_pipeline.
        fused_frame_step``).

        Per-frame host↔device traffic is ONE small packed f32 upload
        (timestamp + IMU interval) besides the image/depth: on tunneled
        TPUs each small transfer costs ~1 ms, and the naive path's five
        (t scalar, 3 IMU arrays, PRNG key slice) were ~60% of frame time.
        The PRNG key is derived on device from a carried step counter."""
        from .parallel.batched_pipeline import fused_frame_step
        from .ops import solver as slv

        tcfg, cam, ecfg = self.tcfg, self.cam, self.estimator.cfg
        maxi = ecfg.max_imu
        with_relo = ecfg.fast_relo

        @jax.jit
        def fused(trk, st, img, depth, packed, base_key, step, relo=None):
            t = packed[0]
            dts = packed[1:1 + maxi]
            acc = packed[1 + maxi:1 + maxi + 3 * (maxi + 1)].reshape(maxi + 1, 3)
            gyr = packed[1 + maxi + 3 * (maxi + 1):].reshape(maxi + 1, 3)
            imu = est.ImuInterval(dts=dts, acc=acc, gyr=gyr)
            key = jax.random.fold_in(base_key, step)
            with jax.default_matmul_precision("float32"):
                trk, st, sout = fused_frame_step(
                    tcfg, cam, ecfg, trk, st, img, depth, t, imu, key, relo)
            return trk, st, sout, step + 1

        if with_relo:
            self._fused_fn = fused
        else:
            self._fused_fn = lambda trk, st, img, depth, packed, bk, sc: fused(
                trk, st, img, depth, packed, bk, sc)
        self._fused_base_key = jax.random.PRNGKey(2)
        self._fused_step_ctr = jnp.asarray(0, jnp.int32)
        self._fused_empty_relo = (slv.empty_relo(ecfg.maxf, self.dtype)
                                  if with_relo else None)
        self._fused_packed = np.zeros(1 + maxi + 6 * (maxi + 1), np.float32)
        self._fused_ecfg = ecfg

    def _spin_fused(self, frame) -> Optional[object]:
        """Steady-state frame as ONE device dispatch + one small upload.
        Mirrors the bookkeeping of ``VinsEstimator.process_features``
        (NON_LINEAR arm)."""
        est_ = self.estimator
        cfg = est_.cfg
        if self._fused_fn is None or self._fused_ecfg is not cfg:
            self._build_fused()
        t = frame.t
        if cfg.estimate_td and est_._step % max(est_.failure_check_interval, 4) == 0:
            est_._td_cache = float(jax.device_get(est_.state.x.td))
        cur_time = t + est_._td_cache
        maxi = cfg.max_imu
        packed = self._fused_packed
        packed[0] = t
        if cfg.use_imu:
            dts, acc, gyr = est_._collect_interval_np(
                est_.prev_time if est_.prev_time is not None else cur_time - 1e-3,
                cur_time)
            packed[1:1 + maxi] = dts
            packed[1 + maxi:1 + maxi + 3 * (maxi + 1)] = acc.ravel()
            packed[1 + maxi + 3 * (maxi + 1):] = gyr.ravel()
        est_.prev_time = cur_time

        img = jnp.asarray(frame.image, self.dtype)
        depth = jnp.asarray(frame.depth, self.dtype)
        packed_dev = jnp.asarray(packed)
        with self.timer.stage("fused"):
            if cfg.fast_relo:
                relo = est_._pending_relo or self._fused_empty_relo
                est_._pending_relo = None
                (self.tracker_state, est_.state, step_out,
                 self._fused_step_ctr) = self._fused_fn(
                    self.tracker_state, est_.state, img, depth, packed_dev,
                    self._fused_base_key, self._fused_step_ctr, relo)
            else:
                (self.tracker_state, est_.state, step_out,
                 self._fused_step_ctr) = self._fused_fn(
                    self.tracker_state, est_.state, img, depth, packed_dev,
                    self._fused_base_key, self._fused_step_ctr)
        self._frame_idx += 1
        est_.headers = est_.headers[1:] + [t]
        if est_._step % est_.failure_check_interval == 0:
            if bool(jax.device_get(step_out.failure)):
                est_.reset()
                est_.prev_time = None
                self.tracker_state = ft.init_state(self.tcfg, self.dtype)
                est_._step += 1
                return None
        out = est_._emit(step_out, t)
        est_._step += 1
        return out

    # ------------------------------------------------------------------
    def _consume_relo_result(self, out: dict):
        """Second half of the fast-relocalization round trip: the solver
        optimized the relo pose block alongside the window — derive the
        refined loop-relative pose (the reference's relo_relative_t/q/yaw,
        estimator.cpp:1034-1057) and feed it back into the pose graph's
        drift (``PoseGraph::updateKeyFrameLoop``)."""
        if not out.get("relo_used") or self._relo_sent_kf is None:
            return
        kf_index = self._relo_sent_kf
        self._relo_sent_kf = None
        from .utils import quaternion_np as nq

        P_relo = np.asarray(out["relo_P"], np.float64)
        Q_relo = np.asarray(out["relo_Q"], np.float64)
        P_cur = np.asarray(out["relo_cur_P"], np.float64)
        Q_cur = np.asarray(out["relo_cur_Q"], np.float64)
        R_relo = nq.q2R(Q_relo)
        rel_t = R_relo.T @ (P_cur - P_relo)
        rel_q = nq.qmul(nq.qconj(Q_relo), Q_cur)
        yaw_cur = float(nq.R2ypr(nq.q2R(Q_cur))[0])
        yaw_relo = float(nq.R2ypr(R_relo)[0])
        rel_yaw = float(nq.normalize_angle_deg(yaw_cur - yaw_relo))
        self.pose_graph.update_keyframe_loop(kf_index, rel_t, rel_q, rel_yaw)

    # ------------------------------------------------------------------
    def _maybe_add_keyframe(self, out: dict, frame, t: float):
        """Feed a keyframe to the pose graph (skip-count + travel-distance
        gated like ``pose_graph_nodelet.cpp:501,522``); publishes the
        drift-corrected path."""
        if not out.get("is_keyframe"):
            return
        if self.vcfg.skip_cnt > 0:
            self._kf_skip_count += 1
            if self._kf_skip_count < self.vcfg.skip_cnt:
                return
            self._kf_skip_count = 0
        P = np.asarray(out["P"])
        if self._kf_travel_anchor is not None and self.vcfg.skip_dis > 0:
            if np.linalg.norm(P - self._kf_travel_anchor) < self.vcfg.skip_dis:
                return
        self._kf_travel_anchor = P
        # window points ride StepOutput (exported pre-slide inside vio_step;
        # the post-slide table has the newest slot cleared)
        wp_world, wp_uv, wp_norm, valid = (
            out["wp_world"], out["wp_uv"], out["wp_norm"], out["wp_valid"]
        )
        with self.timer.stage("pose_graph"):
            info = self.pose_graph.add_keyframe(
                np.asarray(jnp.asarray(frame.image, self.dtype)), t,
                P, np.asarray(out["Q"]),
                np.asarray(wp_world), np.asarray(wp_uv), np.asarray(wp_norm),
                np.asarray(valid),
                depth=jnp.asarray(frame.depth, self.dtype),
            )
        if info is not None and self.vcfg.fast_relocalization:
            # feed the matched old-keyframe observations back into the
            # sliding window as relo factors (the reference's
            # /pose_graph/match_points round trip)
            old = self.pose_graph.keyframes[info["old"]]
            self.estimator.set_relo_frame(
                info["matched_old_norm"], info["inlier_mask"],
                np.asarray(out["wp_ids"]),  # id-keyed: rows may recycle
                old.P_vio, old.Q_vio,
            )
            self._relo_sent_kf = info["cur"]

    def corrected_trajectory(self) -> list:
        """Loop-corrected keyframe path (the reference's
        ``vins_result_loop.csv`` analog); empty when loop closure is off."""
        if self.pose_graph is None:
            return []
        return [dict(t=t, P=P, Q=Q, V=np.zeros(3))
                for (t, P, Q) in self.pose_graph.path()]

    def run(self, max_frames: int = 10 ** 9) -> list:
        """Drain the stream; returns the trajectory list."""
        n = 0
        while n < max_frames:
            out = self.spin_once()
            if out is None and self.pairer._img_buf == []:
                break
            if out is not None:
                n += 1
        if self._loop_stager is not None:
            self._loop_stager.drain()
        return self.estimator.trajectory
