"""Reference-format pose-graph interop (pose_graph.cpp:849-1044): a map
dumped in the C++ system's directory layout (pose_graph.txt + per-keyframe
keypoints/BRIEF files) must round-trip through save/load, and a LOADED map
must relocalize a live sequence — keyframes join as fixed sequence 0 and a
revisit closes a loop against a loaded keyframe."""

import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vins_rgbd_fast_tpu.loop import pose_graph as pg
from vins_rgbd_fast_tpu.loop.interop import (load_reference_pose_graph,
                                             save_reference_pose_graph)
from vins_rgbd_fast_tpu.models import make_camera
from vins_rgbd_fast_tpu.io import synthetic as syn
from vins_rgbd_fast_tpu.utils import quaternion as quat


def _build_rendered_graph():
    """A pose graph over a rendered sweep-and-revisit path (the
    test_loop.py place-recognition scenario) — returns (graph, add_fn)."""
    rig = syn.SyntheticRig(width=320, height=240, fx=230.0, fy=230.0,
                           cx=160.0, cy=120.0)
    cam = make_camera("PINHOLE", fx=rig.fx, fy=rig.fy, cx=rig.cx, cy=rig.cy,
                      width=320, height=240)
    cfg = pg.PoseGraphConfig(max_kp=128, max_wp=64, recency_exclusion=6,
                             min_loop_num=15, score_best=0.10,
                             score_second=0.03)
    graph = pg.PoseGraph(cfg, cam, np.eye(3), np.zeros(3))
    from vins_rgbd_fast_tpu.ops import fast as fast_ops

    def add(g, k, P, q):
        img, depth = syn.render_frame(rig, jnp.asarray(P, jnp.float32),
                                      jnp.asarray(q, jnp.float32))
        score = fast_ops.nms3(fast_ops.fast_score(img, 20.0))
        _, idxs = jax.lax.top_k(score.reshape(-1), g.cfg.max_wp)
        uv = np.stack([np.asarray(idxs) % 320, np.asarray(idxs) // 320],
                      -1).astype(float)
        d = np.asarray(depth)[uv[:, 1].astype(int), uv[:, 0].astype(int)]
        rays = np.asarray(g.cam.lift(jnp.asarray(uv)))
        Rwc = np.asarray(quat.q2R(jnp.asarray(q)))
        wp_world = (rays * d[:, None]) @ Rwc.T + P
        return g.add_keyframe(np.asarray(img), float(k), P, q,
                              wp_world, uv, rays[:, :2], d > 0.2)

    def pose(k):
        if k < 10:
            P = np.array([-2.0 + 0.45 * k, 0.3 * np.sin(k), 0.0])
        else:
            P = np.array([-2.0 + 0.05 * (k - 10), 0.02 * (k - 10), 0.0])
        return P, np.array([1.0, 0, 0, 0])

    found = []
    for k in range(14):
        P, q = pose(k)
        info = add(graph, k, P, q)
        if info is not None:
            found.append(info)
    assert found, "fixture graph closed no loop"
    return graph, add


@pytest.mark.slow
def test_reference_format_roundtrip_and_live_relocalization():
    graph, add = _build_rendered_graph()
    n = len(graph.keyframes)
    assert graph.loops and graph.corrected

    with tempfile.TemporaryDirectory() as d:
        save_reference_pose_graph(d, graph)
        # the directory layout is the reference's
        assert os.path.exists(os.path.join(d, "pose_graph.txt"))
        for kf in graph.keyframes:
            assert os.path.exists(os.path.join(d, f"{kf.index}_keypoints.txt"))
            assert os.path.exists(os.path.join(d, f"{kf.index}_briefdes.dat"))
        # descriptor lines are dynamic_bitset-style 256-char bit strings
        with open(os.path.join(d, "0_briefdes.dat")) as f:
            line = f.readline().strip()
        assert len(line) == 256 and set(line) <= {"0", "1"}

        fresh = pg.PoseGraph(graph.cfg, graph.cam, np.eye(3), np.zeros(3))
        n_loaded = load_reference_pose_graph(d, fresh)
        assert n_loaded == n and len(fresh.keyframes) == n

        for a, b in zip(graph.keyframes, fresh.keyframes):
            assert b.sequence == 0  # loaded map is the fixed base sequence
            np.testing.assert_allclose(b.P_vio, a.P_vio, atol=1e-8)
            np.testing.assert_allclose(b.Q_vio, a.Q_vio, atol=1e-8)
            # valid keypoints round-trip front-packed, bit-exact descriptors
            va = np.asarray(a.kp_valid, bool)
            k = int(va.sum())
            np.testing.assert_allclose(b.kp_uv[:k], np.asarray(a.kp_uv)[va],
                                       atol=1e-8)
            np.testing.assert_allclose(
                b.kp_norm[:k, :2], np.asarray(a.kp_norm)[va][:, :2], atol=1e-8)
            np.testing.assert_array_equal(
                b.kp_desc[:k], np.asarray(a.kp_desc)[va])
            assert int(b.kp_valid.sum()) == k
            # corrected (PG) poses survive
            Pa, Qa = graph.corrected.get(a.index, (a.P_vio, a.Q_vio))
            Pb, Qb = fresh.corrected[b.index]
            np.testing.assert_allclose(Pb, np.asarray(Pa), atol=1e-8)
            np.testing.assert_allclose(Qb, np.asarray(Qa), atol=1e-8)

        # loop edges re-enter the optimization structure (the reference
        # stores one loop per cur-keyframe; ours may hold re-verified
        # duplicates — compare against the per-cur latest)
        latest = {}
        for lp in graph.loops:
            latest[int(lp["cur"])] = lp
        assert len(fresh.loops) == len(latest)
        for lp in fresh.loops:
            ref = latest[int(lp["cur"])]
            assert lp["old"] == ref["old"]
            np.testing.assert_allclose(lp["rel_t"], ref["rel_t"], atol=1e-8)
            np.testing.assert_allclose(lp["rel_yaw"], ref["rel_yaw"],
                                       atol=1e-8)
        assert fresh.earliest_loop_index is not None

        # live relocalization against the LOADED map: a new session
        # (sequence 1) revisits the mapped region and must close a loop
        # onto a loaded keyframe, triggering cross-sequence alignment
        assert fresh.sequence == 1 and not fresh.sequence_aligned[1]
        hits = []
        for j in range(3):
            P = np.array([-2.0 + 0.45 * j + 0.05, 0.3 * np.sin(j) - 0.03,
                          0.01])
            info = add(fresh, 100.0 + j, P, np.array([1.0, 0, 0, 0]))
            if info is not None:
                hits.append(info)
        assert hits, "loaded map failed to relocalize a live revisit"
        assert hits[0]["old"] < n  # matched a LOADED keyframe
        assert fresh.sequence_aligned[1]
