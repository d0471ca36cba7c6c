"""Fused batched throughput runner: the WHOLE per-frame pipeline
(IMU-aided prediction → tracker → depth lookup → backend solve) as one
compiled program, vmapped over B independent sequences and ``lax.scan``-ned
over T frames — zero host work and zero dispatches inside the loop.

This is the TPU-native replacement for the reference's multi-machine story
(two ROS nodelets over TCPROS, ``doc/RUNNING_PROCEDURE.md``): the scaling
axis is sequence-parallel throughput (robot fleets, bag replays, eval
sweeps).  Across chips the batch axis shards over a ``jax.sharding.Mesh``
— sequences are independent, so XLA inserts no collectives and scaling is
linear by construction.

Design notes
  * All per-frame sensor data is STAGED on device up front (images (T,B,H,W),
    depths, IMU interval buckets).  In production this is the sensor DMA
    path; in the bench it removes the host→device tunnel from the measured
    loop.  Memory: T·B·H·W·4 B ≈ 1.2 MB/frame/seq — chunk T if needed.
  * The gyro-only relative-rotation prediction (``Estimator::predictMotion``,
    estimator.cpp:1790-1860) runs ON DEVICE from the staged interval and the
    current per-sequence gyro bias — the host pipeline computes it from its
    own IMU buffer instead (pipeline.py:_predict_relative_R).
  * ``vmap`` turns the solver's ``lax.cond`` branches into both-execute
    selects; the marginalization/solve path is structured (dense Schur on
    the diagonal landmark block) so both branches stay cheap.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..backend import estimator as est
from ..backend.state import WINDOW_SIZE
from ..frontend import feature_tracker as ft
from ..models.camera import CameraModel
from ..utils import quaternion as quat


class FrameBatch(NamedTuple):
    """Per-frame staged inputs with leading axes (T, B, ...)."""

    imgs: jax.Array    # (T, B, H, W)
    depths: jax.Array  # (T, B, H, W)
    ts: jax.Array      # (T, B)
    imu_dts: jax.Array  # (T, B, MAXI)
    imu_acc: jax.Array  # (T, B, MAXI+1, 3)
    imu_gyr: jax.Array  # (T, B, MAXI+1, 3)


class ScanOutputs(NamedTuple):
    """Per-frame per-sequence outputs of the scanned runner (T, B, ...).

    The ``wp_*`` fields are the newest frame's depth-anchored landmarks
    (pre-slide) — everything the pose graph needs to build a keyframe, so
    loop closure runs against the batched path too (the reference's
    ``pubKeyframe`` → pose_graph_nodelet feed)."""

    P: jax.Array
    Q: jax.Array
    V: jax.Array
    cost: jax.Array
    is_keyframe: jax.Array
    n_features: jax.Array
    wp_world: jax.Array  # (T, B, MAXF, 3)
    wp_uv: jax.Array     # (T, B, MAXF, 2)
    wp_norm: jax.Array   # (T, B, MAXF, 2)
    wp_valid: jax.Array  # (T, B, MAXF)
    wp_ids: jax.Array    # (T, B, MAXF) int32 feature ids


def gyro_relative_R(dts: jax.Array, gyr: jax.Array, bg: jax.Array,
                    qic: jax.Array) -> jax.Array:
    """Camera-frame relative rotation R_{c1<-c0} from one interval's raw
    gyro samples (device twin of ``VinsPipeline._predict_relative_R``).

    ``dts (MAXI,)``, ``gyr (MAXI+1, 3)`` zero-padded; sample k spans dt[k]
    ending at gyr[k+1] (the host path integrates each sample's own rate
    over its dt).  The quaternion chain is a log-depth pairwise tree
    product, not a serial scan — padded steps contribute exact identities
    (so3_exp(0) = identity), and a 32-step sequential chain of tiny qmuls
    costs ~5 ms/step in the vmapped batched runner."""
    dtype = gyr.dtype
    n = dts.shape[0]
    dq = jax.vmap(quat.so3_exp)((gyr[1:] - bg) * dts[:, None])  # (N,4)
    m = 1
    while m < n:
        m *= 2
    if m != n:
        padq = jnp.broadcast_to(quat.q_identity(dtype), (m - n, 4))
        dq = jnp.concatenate([dq, padq], axis=0)
    while dq.shape[0] > 1:
        pair = dq.reshape(dq.shape[0] // 2, 2, 4)
        dq = jax.vmap(quat.qmul)(pair[:, 0], pair[:, 1])
    R_imu = quat.q2R(quat.qnormalize(dq[0]))  # body rotation over interval
    R_ic = quat.q2R(qic)
    return R_ic.T @ R_imu.T @ R_ic


def fused_frame_step(tcfg: ft.TrackerConfig, cam: CameraModel,
                     ecfg: est.EstimatorConfig, trk, st,
                     img, depth, t, imu: "est.ImuInterval", key,
                     relo=None):
    """ONE sequence's whole per-frame pipeline as a single traced program:
    on-device gyro prediction → tracker → depth lookup → backend solve.

    This is the shared core of both execution modes: the batched runner
    vmaps it over B sequences; the latency pipeline jits it directly so a
    steady-state frame is ONE host dispatch (vs three + a host gyro loop in
    the unfused path — the reference's per-frame hot loop is
    ``estimator_nodelet.cpp:192-459``)."""
    bg = st.x.Bg[WINDOW_SIZE]  # newest solved gyro bias
    relR = gyro_relative_R(imu.dts, imu.gyr, bg, st.x.qic)
    trk, tout = ft.track_frame(tcfg, cam, trk, img, t, relR, key)
    feats = tout.features
    d = ft.lookup_depth(depth, feats.uv, feats.ids >= 0)
    feats = feats._replace(depth=d)
    st, sout = est.vio_step(ecfg, st, feats, imu, key, relo)
    return trk, st, sout


class BatchedVioRunner:
    """Compiled batched multi-sequence VIO (steady-state NON_LINEAR phase).

    Usage: warm each sequence up through the normal host ``VinsPipeline``
    until NON_LINEAR, stack the states (``stack_states``), stage frames
    (``stage_frames``), then ``run(states, batch)`` processes all frames of
    all sequences in one dispatch.
    """

    def __init__(self, tcfg: ft.TrackerConfig, cam: CameraModel,
                 ecfg: est.EstimatorConfig, mesh: Optional[Mesh] = None,
                 axis: str = "batch", unroll: int = 1):
        # batched mode wants the matmul LK sampler: per-iteration patch
        # gathers serialize across the sequence batch (78 ms vs ~16 ms for
        # B=8 tracking), while selector einsums batch for free.  Iteration
        # caps are tighter than single-sequence mode: the vmapped
        # while_loop runs to the worst lane across B×N tracks, and the
        # per-iteration sampling einsums are the dominant tracker cost —
        # 12/6 was ATE-neutral on the bench sweep.
        import dataclasses as _dc
        # LK engine: the fused patch-DMA Pallas level kernel wins ~10% on
        # the whole step on TPU (scripts/profile_lk3_step.py: 362 vs 328
        # fps, identical trajectories); on CPU (tests, multichip dryrun)
        # Pallas would need interpret mode — keep XLA.  NOTE: pallas_call
        # has no SPMD partitioning rule, so a REAL multi-chip mesh run
        # should shard_map the runner (sequences are independent) or set
        # lk_engine="xla"; the CPU dryrun takes the xla path already.
        eng = tcfg.lk_engine
        if eng == "auto":
            eng = "pallas3" if jax.default_backend() == "tpu" else "xla"
        tcfg = _dc.replace(tcfg, lk_sampler="matmul", lk_engine=eng,
                           lk_max_iters=min(tcfg.lk_max_iters, 12),
                           lk_coarse_iters=min(tcfg.lk_coarse_iters, 6))
        self.tcfg = tcfg
        self.cam = cam
        self.ecfg = ecfg
        self.mesh = mesh
        self.axis = axis

        tcfg_ = tcfg
        cam_ = cam
        ecfg_ = ecfg

        def frame_step(carry, inp):
            trk, st, base_keys, step_idx = carry
            img, depth, t, idts, iacc, igyr = inp  # (B, ...) each
            imu = est.ImuInterval(dts=idts, acc=iacc, gyr=igyr)
            keys = jax.vmap(jax.random.fold_in, in_axes=(0, None))(
                base_keys, step_idx)
            trk, st, sout = jax.vmap(
                lambda tr, s, im, dp, tt, iv, k: fused_frame_step(
                    tcfg_, cam_, ecfg_, tr, s, im, dp, tt, iv, k)
            )(trk, st, img, depth, t, imu, keys)
            out = ScanOutputs(P=sout.P, Q=sout.Q, V=sout.V, cost=sout.cost,
                              is_keyframe=sout.is_keyframe,
                              n_features=sout.n_features,
                              wp_world=sout.wp_world, wp_uv=sout.wp_uv,
                              wp_norm=sout.wp_norm, wp_valid=sout.wp_valid,
                              wp_ids=sout.wp_ids)
            return (trk, st, base_keys, step_idx + 1), out

        def run_impl(trk_states, est_states, batch: FrameBatch, base_keys):
            with jax.default_matmul_precision("float32"):
                (trk, st, _, _), outs = jax.lax.scan(
                    frame_step,
                    (trk_states, est_states, base_keys, jnp.asarray(0, jnp.int32)),
                    (batch.imgs, batch.depths, batch.ts,
                     batch.imu_dts, batch.imu_acc, batch.imu_gyr),
                    unroll=unroll,
                )
            return trk, st, outs

        @partial(jax.jit, static_argnames=())
        def run(trk_states, est_states, batch: FrameBatch):
            B = batch.ts.shape[1]
            base_keys = jax.random.split(jax.random.PRNGKey(17), B)
            return run_impl(trk_states, est_states, batch, base_keys)

        @partial(jax.jit, static_argnames=())
        def one_step(carry, img, depth, t, idts, iacc, igyr):
            with jax.default_matmul_precision("float32"):
                return frame_step(carry, (img, depth, t, idts, iacc, igyr))

        self._run = run
        self._run_impl = run_impl
        self._one_step = one_step
        self._run_sharded = None

    def run_chained(self, trk_states, est_states, batch: FrameBatch):
        """Same per-frame program as ``run`` but dispatched once per frame
        from the host (no lax.scan) — no host syncs, outputs stacked on
        device at the end."""
        B = batch.ts.shape[1]
        base_keys = jax.random.split(jax.random.PRNGKey(17), B)
        carry = (trk_states, est_states, base_keys, jnp.asarray(0, jnp.int32))
        outs = []
        T = batch.ts.shape[0]
        for k in range(T):
            carry, out = self._one_step(
                carry, batch.imgs[k], batch.depths[k], batch.ts[k],
                batch.imu_dts[k], batch.imu_acc[k], batch.imu_gyr[k])
            outs.append(out)
        trk, st, _, _ = carry
        stacked = jax.tree.map(lambda *a: jnp.stack(a), *outs)
        return trk, st, stacked

    # -- staging helpers -------------------------------------------------
    def shard_spec(self, ndim_batch_axis: int = 0):
        if self.mesh is None:
            return None
        return NamedSharding(self.mesh, P(*([None] * ndim_batch_axis + [self.axis])))

    def put_batch(self, tree):
        """Shard a (T, B, ...) pytree's B axis over the mesh (no-op without
        a mesh)."""
        if self.mesh is None:
            return tree
        sh = NamedSharding(self.mesh, P(None, self.axis))
        return jax.tree.map(lambda a: jax.device_put(a, sh), tree)

    def put_states(self, tree):
        if self.mesh is None:
            return tree
        sh = NamedSharding(self.mesh, P(self.axis))
        return jax.tree.map(lambda a: jax.device_put(a, sh), tree)

    def run(self, trk_states, est_states, batch: FrameBatch):
        """Process all T frames of all B sequences; returns
        (tracker_states, estimator_states, ScanOutputs (T,B,...))."""
        return self._run(trk_states, est_states, batch)

    def run_sharded(self, trk_states, est_states, batch: FrameBatch):
        """``run`` under ``shard_map`` over the mesh: each device executes
        its own B/n-sequence slice of the scan as a complete local program.

        This is the REAL multi-chip execution path: sequences are
        independent so no collectives are needed, and — unlike plain
        ``jit`` sharding propagation — every op inside (including
        ``pallas_call`` kernels, which have no SPMD partitioning rule)
        runs shard-locally.  Requires B divisible by the mesh size and
        inputs placed with put_states/put_batch."""
        assert self.mesh is not None, "run_sharded needs a mesh"
        if self._run_sharded is None:
            try:
                from jax import shard_map
                vma_kw = {"check_vma": False}
            except ImportError:  # older jax
                from jax.experimental.shard_map import shard_map
                vma_kw = {"check_rep": False}
            from jax.sharding import PartitionSpec as P_

            ax = self.axis
            sB = P_(ax)
            sTB = P_(None, ax)
            # vma/rep checking off: inner lax.scan carries start as
            # unvarying constants and become axis-varying after step 1,
            # which the strict VMA type check rejects
            f = shard_map(
                self._run_impl, mesh=self.mesh,
                in_specs=(sB, sB, sTB, sB),
                out_specs=(sB, sB, sTB),
                **vma_kw,
            )
            self._run_sharded = jax.jit(f)
        B = batch.ts.shape[1]
        # globally distinct per-sequence keys, built OUTSIDE the shard
        base_keys = jax.random.split(jax.random.PRNGKey(17), B)
        if self.mesh is not None:
            base_keys = jax.device_put(
                base_keys, NamedSharding(self.mesh, P(self.axis)))
        return self._run_sharded(trk_states, est_states, batch, base_keys)


def stack_states(pipes) -> Tuple:
    """Stack per-sequence host pipelines' device states into batched pytrees."""
    stack = lambda trees: jax.tree.map(lambda *a: jnp.stack(a), *trees)
    trk = stack([p.tracker_state for p in pipes])
    st = stack([p.estimator.state for p in pipes])
    return trk, st


def stage_frames_arrays(pipes, seq_ts, seq_imgs, seq_depths,
                        t_start: int, t_end: int,
                        dtype=jnp.float32) -> FrameBatch:
    """Build a FrameBatch from per-sequence PRE-RENDERED device stacks
    (``io.synthetic.render_sequence_batch`` output) in O(1) device ops:
    one (T,B) gather per image/depth field and one host->device put for
    the IMU buckets (assembled in numpy via the estimators' pairing
    logic).  The per-frame ``stage_frames`` costs ~6 tunneled dispatches
    per frame — ~1200 launches per bench run through the axon relay."""
    B = len(pipes)
    T = t_end - t_start
    imgs = jnp.stack([jnp.asarray(seq_imgs[b][t_start:t_end], dtype)
                      for b in range(B)], axis=1)
    depths = jnp.stack([jnp.asarray(seq_depths[b][t_start:t_end], dtype)
                        for b in range(B)], axis=1)
    ts_np = np.stack([np.asarray(seq_ts[b][t_start:t_end])
                      for b in range(B)], axis=1)
    maxi = pipes[0].estimator.cfg.max_imu
    dts = np.zeros((T, B, maxi))
    acc = np.zeros((T, B, maxi + 1, 3))
    gyr = np.zeros((T, B, maxi + 1, 3))
    for b in range(B):
        for i, k in enumerate(range(t_start, t_end)):
            d, a, g = pipes[b].estimator._collect_interval_np(
                float(seq_ts[b][k - 1]), float(seq_ts[b][k]))
            dts[i, b], acc[i, b], gyr[i, b] = d, a, g
    return FrameBatch(
        imgs=imgs, depths=depths, ts=jnp.asarray(ts_np, dtype),
        imu_dts=jnp.asarray(dts, dtype), imu_acc=jnp.asarray(acc, dtype),
        imu_gyr=jnp.asarray(gyr, dtype),
    )


def stage_frames(pipes, frame_lists, t_start: int, t_end: int,
                 dtype=jnp.float32) -> FrameBatch:
    """Build a FrameBatch covering frames [t_start, t_end) from per-sequence
    (t, img, depth) lists, collecting each frame's IMU interval via the
    host estimator's pairing logic (one-time staging cost, outside the
    measured loop)."""
    B = len(pipes)
    imgs, depths, ts = [], [], []
    dts, acc, gyr = [], [], []
    for k in range(t_start, t_end):
        imgs.append(jnp.stack([jnp.asarray(frame_lists[b][k][1], dtype)
                               for b in range(B)]))
        depths.append(jnp.stack([jnp.asarray(frame_lists[b][k][2], dtype)
                                 for b in range(B)]))
        ts.append(jnp.asarray([frame_lists[b][k][0] for b in range(B)], dtype))
        ivs = [pipes[b].estimator._collect_interval(
            frame_lists[b][k - 1][0], frame_lists[b][k][0]) for b in range(B)]
        dts.append(jnp.stack([iv.dts for iv in ivs]))
        acc.append(jnp.stack([iv.acc for iv in ivs]))
        gyr.append(jnp.stack([iv.gyr for iv in ivs]))
    return FrameBatch(
        imgs=jnp.stack(imgs), depths=jnp.stack(depths), ts=jnp.stack(ts),
        imu_dts=jnp.stack(dts), imu_acc=jnp.stack(acc), imu_gyr=jnp.stack(gyr),
    )
