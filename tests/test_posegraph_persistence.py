"""Pose-graph persistence: save must capture the FULL loop structure
(rel_t, rel_q, rel_yaw, inliers, earliest_loop_index) and load must rebuild
it so a loaded map (a) re-enters its old loop edges into optimization and
(b) serves as a relocalization target — a live sequence's first loop
against it performs the cross-sequence world merge.

Reference: ``savePoseGraph``/``loadPoseGraph`` rebuild per-keyframe
loop_index + loop_info and re-add every keyframe to the retrieval DB
(``pose_graph/src/pose_graph/pose_graph.cpp:849-1044``, load-ctor
``keyframe.cpp:47-77``)."""

import numpy as np
import pytest

from vins_rgbd_fast_tpu.loop import pose_graph as pg
from vins_rgbd_fast_tpu.models.camera import make_camera

MAX_KP = 32


def _cam():
    return make_camera("PINHOLE", fx=100.0, fy=100.0, cx=64.0, cy=48.0,
                       width=128, height=96)


def _cfg():
    return pg.PoseGraphConfig(
        max_kp=MAX_KP, max_wp=MAX_KP, recency_exclusion=2, min_loop_num=20,
        score_best=0.10, score_second=0.03)


def _landmarks(rng):
    """3D points in front of the origin camera (z in [2, 4])."""
    L = np.stack([rng.uniform(-1.0, 1.0, MAX_KP),
                  rng.uniform(-0.8, 0.8, MAX_KP),
                  rng.uniform(2.0, 4.0, MAX_KP)], axis=1)
    return L


def _kf_fields(L, P_kf, desc):
    """KeyFrameData kwargs for a keyframe at position ``P_kf`` (identity
    rotation, ric=I, tic=0) observing world landmarks ``L``."""
    Pc = L - P_kf  # camera frame (identity orientation)
    norm = Pc[:, :2] / Pc[:, 2:3]
    return dict(
        kp_uv=np.zeros((MAX_KP, 2)), kp_norm=norm,
        kp_valid=np.ones(MAX_KP, bool), kp_desc=desc,
        wp_world=L.copy(), wp_norm=norm,
        wp_valid=np.ones(MAX_KP, bool), wp_desc=desc,
    )


def _build_map():
    """A 6-keyframe map along +x with one in-map loop (4 -> 0), optimized."""
    rng = np.random.default_rng(0)
    L = _landmarks(rng)
    desc = rng.choice(np.asarray([-1, 1], np.int8), (MAX_KP, 256))
    g = pg.PoseGraph(_cfg(), _cam(), np.eye(3), np.zeros(3))
    for i in range(6):
        P = np.array([0.1 * i, 0.0, 0.0])
        g.keyframes.append(pg.KeyFrameData(
            index=i, t=float(i), sequence=1, P_vio=P,
            Q_vio=np.array([1.0, 0, 0, 0]), **_kf_fields(L, P, desc)))
        g._db_append(desc)
    g.loops.append(dict(cur=4, old=0, rel_t=np.array([0.4, 0.0, 0.0]),
                        rel_yaw=0.0, rel_q=np.array([1.0, 0, 0, 0]),
                        n_inliers=30))
    g.earliest_loop_index = 0
    g.optimize()
    return g, L, desc


def test_save_load_roundtrip_restores_loop_structure(tmp_path):
    g, L, desc = _build_map()
    path = str(tmp_path / "map.npz")
    g.save(path)

    g2 = pg.PoseGraph(_cfg(), _cam(), np.eye(3), np.zeros(3))
    g2.load(path)
    assert len(g2.keyframes) == 6
    assert all(k.sequence == 0 for k in g2.keyframes)
    assert g2._db_size == 6
    # loop edges fully restored — rel_q included (6-DoF graphs need it)
    assert len(g2.loops) == 1
    lp = g2.loops[0]
    assert (lp["cur"], lp["old"]) == (4, 0)
    np.testing.assert_allclose(lp["rel_t"], [0.4, 0.0, 0.0])
    np.testing.assert_allclose(lp["rel_q"], [1.0, 0, 0, 0])
    assert lp["n_inliers"] == 30
    assert g2.earliest_loop_index == 0
    # corrected poses carried over
    for k in g.keyframes:
        P1, _ = g.corrected.get(k.index, (k.P_vio, k.Q_vio))
        P2, _ = g2.corrected.get(k.index, (k.P_vio, k.Q_vio))
        np.testing.assert_allclose(P1, P2, atol=1e-9)


def test_loaded_map_relocalizes_live_sequence(tmp_path):
    """Load a saved map, then feed live keyframes whose VIO world is
    SHIFTED from the map world: the revisit must fire a loop against a
    LOADED keyframe, the cross-sequence merge must recover the shift, and
    the PGO must run over a graph containing the OLD loop edge."""
    g, L, desc = _build_map()
    path = str(tmp_path / "map.npz")
    g.save(path)

    g2 = pg.PoseGraph(_cfg(), _cam(), np.eye(3), np.zeros(3))
    g2.load(path)
    assert g2.sequence == 1 and not g2.sequence_aligned.get(1, False)

    # live keyframe truly at (0.5, 0, 0) in MAP frame, but its own VIO
    # world is offset by t_shift (accumulated drift / new session origin)
    t_shift = np.array([0.3, -0.2, 0.0])
    P_true = np.array([0.5, 0.0, 0.0])
    P_vio = P_true - t_shift
    fields = _kf_fields(L - t_shift, P_vio, desc)  # landmarks in live world
    info = g2.add_keyframe_extracted(
        10.0, P_vio, np.array([1.0, 0, 0, 0]),
        fields["wp_world"], fields["wp_norm"], fields["wp_valid"],
        fields["kp_uv"], fields["kp_norm"], fields["kp_valid"],
        fields["kp_desc"], fields["wp_desc"],
    )
    assert info is not None, "revisit must close a loop against the loaded map"
    assert info["old"] < 6, "loop target must be a LOADED keyframe"
    # the old in-map loop edge is still in the graph alongside the new one
    assert len(g2.loops) == 2
    assert (g2.loops[0]["cur"], g2.loops[0]["old"]) == (4, 0)
    # cross-sequence merge: live world mapped onto the map frame
    assert g2.sequence_aligned[1]
    np.testing.assert_allclose(g2.w_t_vio, t_shift, atol=1e-2)
    # the live keyframe's stored pose is now in map frame ≈ truth
    kf = g2.keyframes[-1]
    np.testing.assert_allclose(kf.P_vio, P_true, atol=1e-2)
    # PGO ran (triggered by the loop): corrected pose present and finite,
    # loaded keyframes (sequence 0) stayed anchored
    P_corr, _ = g2.corrected.get(kf.index, (kf.P_vio, None))
    assert np.isfinite(np.asarray(P_corr)).all()
    np.testing.assert_allclose(np.asarray(P_corr), P_true, atol=5e-2)


def test_load_into_nonempty_graph_offsets_indices(tmp_path):
    g, L, desc = _build_map()
    path = str(tmp_path / "map.npz")
    g.save(path)

    g2 = pg.PoseGraph(_cfg(), _cam(), np.eye(3), np.zeros(3))
    # pre-existing keyframe before the load
    g2.keyframes.append(pg.KeyFrameData(
        index=0, t=0.0, sequence=1, P_vio=np.zeros(3),
        Q_vio=np.array([1.0, 0, 0, 0]), **_kf_fields(L, np.zeros(3), desc)))
    g2._db_append(desc)
    g2.load(path)
    assert len(g2.keyframes) == 7
    assert [k.index for k in g2.keyframes] == list(range(7))
    assert (g2.loops[0]["cur"], g2.loops[0]["old"]) == (5, 1)
    assert g2.earliest_loop_index == 1
