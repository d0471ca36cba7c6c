"""Loop closure for the batched throughput path.

The reference runs its pose graph CONCURRENTLY with the estimator — a second
nodelet consuming keyframes over TCPROS (``pose_graph_nodelet.cpp:449-566``).
The batched runner's TPU-native equivalent: the scanned per-frame program
exports everything a keyframe needs (``ScanOutputs.wp_*``, poses, keyframe
flags), and between scan segments this closer feeds per-sequence
:class:`~vins_rgbd_fast_tpu.loop.pose_graph.PoseGraph` instances from those
outputs with BOUNDED host work:

  * ONE batched feature-extraction dispatch per keyframe chunk of the
    segment (``make_batch_extractor``);
  * ONE retrieval-scoring dispatch per sequence (``_db_query_multi``
    against that sequence's device-resident descriptor DB);
  * ONE deferred block append per sequence (``_db_append_block``).

Compile stability: ``k_pad``/``seq_pad`` fix the padded chunk and
per-sequence shapes so every segment reuses the SAME compiled programs —
a mid-run recompile (tens of seconds through the remote-compile tunnel)
costs more than any amount of padding.  ``compile_warmup`` traces the
programs that only compile once DBs are non-empty or a loop fires.

Exactness: deferring DB appends to segment end is *identical* to sequential
processing as long as a segment contributes fewer keyframes per sequence
than the recency exclusion — a query only ever sees keyframes older than
the exclusion window, which are all pre-segment.  Longer segments clamp the
detection horizon at the segment start (strictly conservative: never a
false loop).

Unlike the latency pipeline, the fast-relocalization feedback (loop →
estimator relo factors) is NOT wired into the scanned program: the scan has
already consumed its frames by the time loops are found.  Corrections apply
as per-sequence drift on the pose-graph path — the reference's behavior
with ``fast_relocalization: 0``.
"""

from __future__ import annotations

import time as _time
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..loop.pose_graph import (PoseGraph, PoseGraphConfig, _db_query_multi,
                               make_batch_extractor)
from ..models.camera import CameraModel
from .batched_pipeline import FrameBatch, ScanOutputs


def _pad_pow2(n: int, lo: int = 4) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


@jax.jit
def _pack_gating(is_kf, P, ts):
    """Pack the gating inputs into ONE small device array so sync 1 is a
    single tunneled readback (is_keyframe, position, stamp per frame)."""
    return jnp.concatenate(
        [is_kf[..., None].astype(P.dtype), P, ts[..., None].astype(P.dtype)],
        axis=-1)


class BatchedLoopCloser:
    """Per-sequence pose graphs fed from batched scan segments."""

    def __init__(self, cam: CameraModel, ric: np.ndarray, tic: np.ndarray,
                 batch: int, pg_cfg: Optional[PoseGraphConfig] = None,
                 skip_cnt: int = 0, skip_dis: float = 0.0,
                 k_pad: int = 0, seq_pad: int = 0):
        self.cfg = pg_cfg or PoseGraphConfig()
        self.cam = cam
        self.ric = np.asarray(ric)
        self.tic = np.asarray(tic)
        self.graphs: List[PoseGraph] = [
            PoseGraph(self.cfg, cam, ric, tic) for _ in range(batch)]
        self._extract = make_batch_extractor(self.cfg, cam)
        self.skip_cnt = skip_cnt
        self.skip_dis = skip_dis
        # fixed padded shapes (0 -> per-call power-of-two): set these for
        # timed runs so every segment hits the same compiled programs
        self.k_pad = int(k_pad)
        self.seq_pad = int(seq_pad)
        self._skip_count = [0] * batch
        self._travel_anchor: List[Optional[np.ndarray]] = [None] * batch
        # previous segments' descriptors, still device-resident: flushed
        # into the per-sequence DBs at the START of the next dispatch (same
        # one-segment scoring deferral as before, zero host round-trip)
        self._pending_append: list = []
        self.n_keyframes = 0
        self.n_loops = 0

    # ------------------------------------------------------------------
    def clone(self) -> "BatchedLoopCloser":
        """Copy for ghost replay (compile warm-up): shares the compiled
        extractor but nothing mutable — per-sequence graphs are cloned
        (device DBs copied; appends donate their buffers)."""
        c = BatchedLoopCloser.__new__(BatchedLoopCloser)
        c.cfg = self.cfg
        c.cam, c.ric, c.tic = self.cam, self.ric, self.tic
        c._extract = self._extract
        c.skip_cnt, c.skip_dis = self.skip_cnt, self.skip_dis
        c.k_pad, c.seq_pad = self.k_pad, self.seq_pad
        c._skip_count = list(self._skip_count)
        c._travel_anchor = [None if a is None else np.asarray(a).copy()
                            for a in self._travel_anchor]
        c._pending_append = []
        c.n_keyframes, c.n_loops = self.n_keyframes, self.n_loops
        c.graphs = [g.clone() for g in self.graphs]
        return c

    # ------------------------------------------------------------------
    def compile_warmup(self, batch: FrameBatch, outs: ScanOutputs):
        """Pre-trace every program that only compiles once the retrieval
        DBs are non-empty or a loop actually fires — DB query, padded
        block appends, find-connection (Hamming match + PnP-RANSAC), and
        the PGO LM — on a throwaway clone, so no one-time compile lands in
        a caller's timed region.  Call AFTER a real ``consume()`` +
        ``flush()`` of the (untimed) warm segment.

        The pose-graph LM compiles per padded (node, edge) shape; with
        ``PoseGraphConfig.pad_nodes_min/pad_edges_min`` floors covering the
        run, the single trace here serves every later optimize()."""
        ghost = self.clone()
        # reset the ghost's admission gates: replaying the SAME segment
        # against cloned travel anchors would admit nothing and trace
        # nothing
        ghost._skip_count = [0] * len(ghost.graphs)
        ghost._travel_anchor = [None] * len(ghost.graphs)
        ghost.consume(batch, outs)  # DB non-empty -> query path traces
        cfg = self.cfg
        g = ghost.graphs[0]
        if len(g.keyframes) < 2:
            return
        old, cur = g.keyframes[0], g.keyframes[-1]
        # fabricate a perfectly matching pair: Hamming gate passes, so the
        # PnP-RANSAC program traces (its accept/reject outcome is ignored)
        n = min(cfg.max_wp, cfg.max_kp)
        wp_desc = cur.wp_desc.copy()
        wp_desc[:n] = old.kp_desc[:n]
        wp_valid = np.zeros(cfg.max_wp, bool)
        wp_valid[:n] = np.asarray(old.kp_valid[:n], bool)
        g._find_connection(cur._replace(wp_desc=wp_desc, wp_valid=wp_valid),
                           old)
        # PGO trace at the padded-floor shapes
        g.loops.append(dict(cur=cur.index, old=old.index,
                            rel_t=np.zeros(3), rel_yaw=0.0,
                            rel_q=np.array([1.0, 0.0, 0.0, 0.0]),
                            n_inliers=cfg.min_loop_num))
        if g.earliest_loop_index is None:
            g.earliest_loop_index = old.index
        g.optimize()

    # ------------------------------------------------------------------
    def flush(self):
        """Flush deferred descriptor-DB appends (automatic at the start of
        the next dispatch; call once after the final consume_finish if the
        per-sequence graphs will be saved or queried directly)."""
        pend, self._pending_append = self._pending_append, []
        for (desc_d, valid_d, by_seq) in pend:
            for b, idxs in by_seq.items():
                k = len(idxs)
                qp = self.seq_pad or _pad_pow2(k)
                for j0 in range(0, k, qp):
                    part = list(idxs[j0:j0 + qp])
                    idxp = jnp.asarray(part + [0] * (qp - len(part)))
                    d = desc_d[idxp]
                    v = valid_d[idxp] & (jnp.arange(qp) < len(part))[:, None]
                    self.graphs[b]._db_append_block(d, v, count=len(part))

    # ------------------------------------------------------------------
    def _gate(self, b: int, is_kf: bool, P: np.ndarray) -> bool:
        """Keyframe admission: skip-count + travel-distance gates
        (``pose_graph_nodelet.cpp:501,522``)."""
        if not is_kf:
            return False
        if self.skip_cnt > 0:
            self._skip_count[b] += 1
            if self._skip_count[b] < self.skip_cnt:
                return False
            self._skip_count[b] = 0
        if (self._travel_anchor[b] is not None and self.skip_dis > 0
                and np.linalg.norm(P - self._travel_anchor[b]) < self.skip_dis):
            return False
        self._travel_anchor[b] = P
        return True

    # ------------------------------------------------------------------
    def consume(self, batch: FrameBatch, outs: ScanOutputs) -> dict:
        """Feed one scan segment's keyframes to the per-sequence graphs.

        Split into :meth:`consume_dispatch` (sync 1 + device dispatches)
        and :meth:`consume_finish` (sync 2 + host pose-graph work) so a
        caller can interleave the NEXT segment's scan dispatch between the
        two halves — the pose graph then runs concurrently with the
        estimator exactly like the reference's two nodelets
        (``pose_graph_nodelet.cpp:449-566``): the device executes segment
        k+1 while the host closes loops on segment k.

        Serial ``consume()`` flushes its own DB appends before returning,
        so the per-sequence graphs are immediately saveable/queryable;
        only pipelined dispatch/finish callers carry pending appends
        (and must call :meth:`flush` after the final finish)."""
        out = self.consume_finish(self.consume_dispatch(batch, outs))
        self.flush()
        return out

    # ------------------------------------------------------------------
    def consume_dispatch(self, batch: FrameBatch, outs: ScanOutputs):
        """First half: gating readback (sync 1: ONE packed array) + all
        device dispatches (keyframe gather, batched extraction,
        per-sequence retrieval scoring) in compile-stable chunks.  Returns
        an opaque pending token for :meth:`consume_finish`; device work
        proceeds asynchronously."""
        _t0 = _time.perf_counter()
        # flush the PREVIOUS segment's deferred DB appends before scoring —
        # scoring therefore always sees segments ≤ k-1, exactly as the
        # serial consume() did when appends ran at finish-time
        self.flush()
        # sync 1: gating inputs (is_keyframe flags + positions + stamps)
        packed = np.asarray(jax.device_get(
            _pack_gating(outs.is_keyframe, outs.P, batch.ts)))
        is_kf = packed[..., 0] > 0.5
        P_all = packed[..., 1:4]
        ts = packed[..., 4]
        T, B = ts.shape
        _t_sync1 = _time.perf_counter()

        sel = []  # (k, b) in frame order
        for b in range(B):
            for k in range(T):
                if self._gate(b, bool(is_kf[k, b]), P_all[k, b]):
                    sel.append((k, b))
        if not sel:
            return None
        Kp = self.k_pad or _pad_pow2(len(sel))
        chunks = [sel[i:i + Kp] for i in range(0, len(sel), Kp)]
        pends = [self._dispatch_chunk(batch, outs, c, Kp, ts, P_all)
                 for c in chunks]
        _t_disp = _time.perf_counter()
        return dict(pends=pends, t0=_t0, t_sync1=_t_sync1, t_disp=_t_disp)

    # ------------------------------------------------------------------
    def _dispatch_chunk(self, batch: FrameBatch, outs: ScanOutputs,
                        sel, Kp: int, ts, P_all):
        """Device dispatches for one ≤Kp keyframe chunk: gather the
        selected keyframes' data, extract features (one dispatch), score
        retrieval per sequence — all WITHOUT host syncs."""
        K = len(sel)
        ks = np.asarray([s[0] for s in sel] + [0] * (Kp - K))
        bs = np.asarray([s[1] for s in sel] + [0] * (Kp - K))
        imgs = jnp.asarray(batch.imgs)[ks, bs]
        wp_uv_d = jnp.asarray(outs.wp_uv)[ks, bs]
        wp_valid_d = jnp.asarray(outs.wp_valid)[ks, bs]
        wp_world_d = jnp.asarray(outs.wp_world)[ks, bs]
        wp_norm_d = jnp.asarray(outs.wp_norm)[ks, bs]
        Q_d = jnp.asarray(outs.Q)[ks, bs]
        ext = self._extract(imgs, wp_uv_d, wp_valid_d)
        kp_desc_d, kp_valid_d = ext[3], ext[2]
        by_seq: dict = {}
        for i in range(K):
            by_seq.setdefault(int(bs[i]), []).append(i)
        scores_d: dict = {}
        for b, idxs in by_seq.items():
            g = self.graphs[b]
            if g._dev_db is None or g._db_size == 0:
                scores_d[b] = None
                continue
            qp = min(self.seq_pad or _pad_pow2(len(idxs)), Kp)
            parts = []
            for j0 in range(0, len(idxs), qp):
                part = idxs[j0:j0 + qp]
                idxp = jnp.asarray(list(part) + [0] * (qp - len(part)))
                s = _db_query_multi(
                    g._dev_db, g._dev_valid,
                    kp_desc_d[idxp], kp_valid_d[idxp],
                    float(self.cfg.score_dist))
                parts.append((s, len(part)))
            scores_d[b] = parts
        return dict(
            ext=ext, wp_world_d=wp_world_d, wp_norm_d=wp_norm_d,
            wp_valid_d=wp_valid_d, Q_d=Q_d, scores_d=scores_d,
            by_seq=by_seq, ks=ks, bs=bs, K=K, ts=ts, P_all=P_all,
        )

    # ------------------------------------------------------------------
    def consume_finish(self, pend) -> dict:
        """Second half: the bulk readback (sync 2) + sequential host
        pose-graph processing, deferred DB appends, and one PGO per
        sequence-with-loops."""
        if pend is None:
            return dict(n_keyframes=0, n_loops=0)
        _t0, _t_sync1, _t_disp = pend["t0"], pend["t_sync1"], pend["t_disp"]
        _t_sync2 = _t_disp
        n_loops = 0
        n_kf = 0
        looped: set = set()
        for chunk in pend["pends"]:
            dn, dl = self._finish_chunk(chunk, looped)
            n_kf += dn
            n_loops += dl
            _t_sync2 = max(_t_sync2, chunk.pop("_t_sync2", _t_sync2))
        for b in looped:
            self.graphs[b].optimize()
        self.n_keyframes += n_kf
        self.n_loops += n_loops
        _t_end = _time.perf_counter()
        return dict(
            n_keyframes=n_kf, n_loops=n_loops,
            # phase breakdown (ms): sync1 = gating readback (includes
            # waiting out the scan), dispatch = gather+extract+score
            # dispatch (async), sync2 = bulk readback (includes waiting
            # out the extraction), host = pose-graph bookkeeping + PGO +
            # deferred DB appends
            ms_sync1=round(1e3 * (_t_sync1 - _t0), 1),
            ms_dispatch=round(1e3 * (_t_disp - _t_sync1), 1),
            ms_sync2=round(1e3 * (_t_sync2 - _t_disp), 1),
            ms_host=round(1e3 * (_t_end - _t_sync2), 1),
        )

    # ------------------------------------------------------------------
    def _finish_chunk(self, chunk: dict, looped: set):
        ext, scores_d, by_seq = chunk["ext"], chunk["scores_d"], chunk["by_seq"]
        ks, bs, K = chunk["ks"], chunk["bs"], chunk["K"]
        ts, P_all = chunk["ts"], chunk["P_all"]
        # sync 2: everything the host path needs, in one fetch
        (kp_uv, kp_norm, kp_valid, kp_desc, wp_desc), wp_world, wp_norm, \
            wp_valid, Qh, scores_h = jax.device_get(
                (ext, chunk["wp_world_d"], chunk["wp_norm_d"],
                 chunk["wp_valid_d"], chunk["Q_d"], scores_d))
        chunk["_t_sync2"] = _time.perf_counter()
        kp_uv, kp_norm, kp_valid = (np.asarray(a) for a in
                                    (kp_uv, kp_norm, kp_valid))
        kp_desc, wp_desc = np.asarray(kp_desc), np.asarray(wp_desc)
        scores: dict = {}
        for b, idxs in by_seq.items():
            parts = scores_h[b]
            if parts is None:
                scores[b] = {i: None for i in idxs}
            else:
                rows = np.concatenate(
                    [np.asarray(s)[:n] for (s, n) in parts], axis=0)
                scores[b] = {i: rows[j] for j, i in enumerate(idxs)}

        # sequential host processing (cheap: poses + thresholds; PnP only on
        # retrieval hits), then ONE deferred DB append per sequence and ONE
        # deferred PGO per sequence-with-loops (each optimize() costs a
        # dispatch + readback; the reference's optimize4DoF thread batches
        # loop events on a 2 s cadence the same way)
        n_loops = 0
        for i in range(K):
            k, b = int(ks[i]), int(bs[i])
            g = self.graphs[b]
            info = g.add_keyframe_extracted(
                float(ts[k, b]),
                P_all[k, b], np.asarray(Qh[i]),
                np.asarray(wp_world[i]), np.asarray(wp_norm[i]),
                np.asarray(wp_valid[i]),
                kp_uv[i], kp_norm[i], kp_valid[i], kp_desc[i], wp_desc[i],
                scores=scores[b][i], append_db=False, optimize_now=False,
            )
            if info is not None:
                n_loops += 1
                looped.add(b)
        # defer this chunk's DB appends (device-resident descriptors) to
        # the next dispatch's flush() — or an explicit final flush()
        self._pending_append.append((ext[3], ext[2], by_seq))
        return K, n_loops

    # ------------------------------------------------------------------
    def corrected_path(self, b: int) -> list:
        """Loop-corrected keyframe trajectory [(t, P, Q)] of sequence b."""
        return self.graphs[b].path()
