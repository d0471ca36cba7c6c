"""Whole-pipeline checkpoint & resume (single ``.npz`` file).

The reference persists only the pose graph across runs
(``pose_graph/src/pose_graph/pose_graph.cpp:849-1044``); estimator state
dies with the nodelet and a restart re-initializes from scratch.  The
rebuild's complete VIO state is two fixed-shape device pytrees (tracker
state + estimator window/table/prior/IMU buffers) plus a handful of host
scalars, so a FULL mid-stream checkpoint is cheap and exact: resuming
from it and replaying the remaining frames produces the same trajectory
as the uninterrupted run (``tests/test_checkpoint.py``).

Checkpoint at a quiescent point — after a ``spin_once`` that consumed a
frame, with no image queued in the pairer.  Raw IMU buffers (both the
estimator's interval buffer and the pipeline's prediction cache) are
saved, so IMU samples already pushed survive the round trip; transient
in-flight relocalization data does not (re-sent by the pose graph on the
next loop, as in the reference).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

FORMAT_VERSION = 1


def _pack_tree(prefix: str, tree) -> dict:
    leaves = jax.device_get(jax.tree.leaves(tree))
    return {f"{prefix}{i}": np.asarray(a) for i, a in enumerate(leaves)}


def _unpack_tree(z, prefix: str, template):
    leaves, treedef = jax.tree.flatten(template)
    new = []
    for i, old in enumerate(leaves):
        a = z[f"{prefix}{i}"]
        if tuple(a.shape) != tuple(old.shape):
            raise ValueError(
                f"checkpoint leaf {prefix}{i}: shape {a.shape} != "
                f"{tuple(old.shape)} — config mismatch with the checkpoint")
        new.append(jnp.asarray(a, old.dtype))
    return jax.tree.unflatten(treedef, new)


def save_pipeline(pipe, path: str) -> None:
    """Serialize a :class:`~vins_rgbd_fast_tpu.pipeline.VinsPipeline` to
    ``path`` (npz).  The pose graph, if enabled, is saved alongside as
    ``<path>.pg.npz`` via :meth:`PoseGraph.save`."""
    e = pipe.estimator
    arrs = _pack_tree("trk_", pipe.tracker_state)
    arrs.update(_pack_tree("est_", e.state))
    arrs["imu_buf"] = (
        np.asarray([[t, *a, *g] for (t, a, g) in e._imu_buf], np.float64)
        .reshape(-1, 7))
    arrs["imu_pred"] = (
        np.asarray([[t, *g] for (t, g) in pipe._imu_for_predict], np.float64)
        .reshape(-1, 4))
    arrs["bg_cache"] = np.asarray(pipe._bg_cache, np.float64)
    meta = dict(
        version=FORMAT_VERSION,
        frame_count=int(e.frame_count),
        solver_flag=int(e.solver_flag),
        headers=[float(h) for h in e.headers],
        step=int(e._step),
        td_cache=float(e._td_cache),
        prev_time=None if e.prev_time is None else float(e.prev_time),
        ex_calibrating=bool(e._ex_calibrating),
        frame_idx=int(pipe._frame_idx),
        last_frame_time=(None if pipe._last_frame_time is None
                         else float(pipe._last_frame_time)),
    )
    np.savez(path, __meta__=np.frombuffer(
        json.dumps(meta).encode(), np.uint8), **arrs)
    if pipe.pose_graph is not None:
        pipe.pose_graph.save(path + ".pg.npz")


def load_pipeline(vcfg, path: str, dtype=jnp.float32, **pipeline_kwargs):
    """Reconstruct a pipeline from :func:`save_pipeline` output.  ``vcfg``
    must describe the same rig/shapes the checkpoint was taken with (leaf
    shapes are validated)."""
    from ..pipeline import VinsPipeline

    pipe = VinsPipeline(vcfg, dtype=dtype, **pipeline_kwargs)
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode())
        if meta.get("version") != FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version: {meta}")
        pipe.tracker_state = _unpack_tree(z, "trk_", pipe.tracker_state)
        e = pipe.estimator
        e.state = _unpack_tree(z, "est_", e.state)
        e._imu_buf = [(float(r[0]), r[1:4].copy(), r[4:7].copy())
                      for r in np.asarray(z["imu_buf"], np.float64)]
        pipe._imu_for_predict = [(float(r[0]), r[1:4].copy())
                                 for r in np.asarray(z["imu_pred"], np.float64)]
        pipe._bg_cache = np.asarray(z["bg_cache"], np.float64)
    e.frame_count = int(meta["frame_count"])
    e.solver_flag = int(meta["solver_flag"])
    e.headers = [float(h) for h in meta["headers"]]
    e._step = int(meta["step"])
    e._td_cache = float(meta["td_cache"])
    e.prev_time = meta["prev_time"]
    e._ex_calibrating = bool(meta["ex_calibrating"])
    pipe._frame_idx = int(meta["frame_idx"])
    pipe._last_frame_time = meta["last_frame_time"]
    pg_path = path + ".pg.npz"
    if pipe.pose_graph is not None and os.path.exists(pg_path):
        pipe.pose_graph.load(pg_path)
    return pipe
