"""Loop closure for the batched throughput path.

The reference runs its pose graph CONCURRENTLY with the estimator — a second
nodelet consuming keyframes over TCPROS (``pose_graph_nodelet.cpp:449-566``).
The batched runner's TPU-native equivalent: the scanned per-frame program
exports everything a keyframe needs (``ScanOutputs.wp_*``, poses, keyframe
flags), and between scan segments this closer feeds per-sequence
:class:`~vins_rgbd_fast_tpu.loop.pose_graph.PoseGraph` instances from those
outputs with BOUNDED host work:

  * ONE batched feature-extraction dispatch for every keyframe of every
    sequence in the segment (``make_batch_extractor``);
  * ONE retrieval-scoring dispatch per sequence (``detect_scores_batch``
    against that sequence's device-resident descriptor DB);
  * ONE deferred block append per sequence (``_db_append_block``).

Exactness: deferring DB appends to segment end is *identical* to sequential
processing as long as a segment contributes fewer keyframes per sequence
than the recency exclusion (50) — a query only ever sees keyframes ≥50
older, which are all pre-segment.  Longer segments clamp the detection
horizon at the segment start (strictly conservative: never a false loop).

Unlike the latency pipeline, the fast-relocalization feedback (loop →
estimator relo factors) is NOT wired into the scanned program: the scan has
already consumed its frames by the time loops are found.  Corrections apply
as per-sequence drift on the pose-graph path — the reference's behavior
with ``fast_relocalization: 0``.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..loop.pose_graph import PoseGraph, PoseGraphConfig, make_batch_extractor
from ..models.camera import CameraModel
from .batched_pipeline import FrameBatch, ScanOutputs


def _pad_pow2(n: int, lo: int = 4) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


class BatchedLoopCloser:
    """Per-sequence pose graphs fed from batched scan segments."""

    def __init__(self, cam: CameraModel, ric: np.ndarray, tic: np.ndarray,
                 batch: int, pg_cfg: Optional[PoseGraphConfig] = None,
                 skip_cnt: int = 0, skip_dis: float = 0.0):
        self.cfg = pg_cfg or PoseGraphConfig()
        self.graphs: List[PoseGraph] = [
            PoseGraph(self.cfg, cam, ric, tic) for _ in range(batch)]
        self._extract = make_batch_extractor(self.cfg, cam)
        self.skip_cnt = skip_cnt
        self.skip_dis = skip_dis
        self._skip_count = [0] * batch
        self._travel_anchor: List[Optional[np.ndarray]] = [None] * batch
        # previous segment's descriptors, still device-resident: flushed
        # into the per-sequence DBs at the START of the next dispatch (same
        # one-segment scoring deferral as before, zero host round-trip)
        self._pending_append = None
        self.n_keyframes = 0
        self.n_loops = 0

    # ------------------------------------------------------------------
    def flush(self):
        """Flush the last segment's deferred descriptor-DB appends (call
        once after the final consume/consume_finish if the per-sequence
        graphs will be saved or queried directly)."""
        if self._pending_append is None:
            return
        desc_d, valid_d, by_seq = self._pending_append
        self._pending_append = None
        for b, idxs in by_seq.items():
            self.graphs[b]._db_append_block(
                desc_d[jnp.asarray(idxs)], valid_d[jnp.asarray(idxs)])

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

        Exactly TWO device→host syncs per segment: the tunneled readback
        costs ~30 ms per device_get regardless of size, and the first
        version of this method paid ~15 of them (measured 1.1 s/segment
        steady-state with ZERO loops) — (1) the small gating inputs, then
        (2) one fetch of the gathered keyframe subset + extraction +
        per-sequence retrieval scores together.

        Split into :meth:`consume_dispatch` (sync 1 + device dispatches)
        and :meth:`consume_finish` (sync 2 + host pose-graph work) so a
        caller can interleave the NEXT segment's scan dispatch between the
        two halves — the pose graph then runs concurrently with the
        estimator exactly like the reference's two nodelets
        (``pose_graph_nodelet.cpp:449-566``): the device executes segment
        k+1 while the host closes loops on segment k.

        Serial ``consume()`` flushes its own DB appends before returning,
        so the per-sequence graphs are immediately saveable/queryable;
        only pipelined dispatch/finish callers carry a pending append
        (and must call :meth:`flush` after the final finish)."""
        out = self.consume_finish(self.consume_dispatch(batch, outs))
        self.flush()
        return out

    # ------------------------------------------------------------------
    def consume_dispatch(self, batch: FrameBatch, outs: ScanOutputs):
        """First half: gating readback (sync 1) + all device dispatches
        (keyframe gather, batched extraction, per-sequence retrieval
        scoring).  Returns an opaque pending token for
        :meth:`consume_finish`; device work proceeds asynchronously."""
        import time as _time

        _t0 = _time.perf_counter()
        # flush the PREVIOUS segment's deferred DB appends before scoring —
        # scoring therefore always sees segments ≤ k-1, exactly as the
        # serial consume() did when appends ran at finish-time
        self.flush()
        # sync 1: gating inputs (is_keyframe flags + positions + stamps)
        is_kf, P_all, ts = jax.device_get(
            (outs.is_keyframe, outs.P, batch.ts))
        is_kf, P_all, ts = np.asarray(is_kf), np.asarray(P_all), np.asarray(ts)
        T, B = ts.shape

        _t_sync1 = _time.perf_counter()

        sel = []  # (k, b) in frame order
        for b in range(B):
            for k in range(T):
                if self._gate(b, bool(is_kf[k, b]), P_all[k, b]):
                    sel.append((k, b))
        if not sel:
            return None
        K = len(sel)
        Kp = _pad_pow2(K)
        ks = np.asarray([s[0] for s in sel] + [0] * (Kp - K))
        bs = np.asarray([s[1] for s in sel] + [0] * (Kp - K))

        # device work: gather the selected keyframes' data, extract
        # features (one dispatch), score retrieval per sequence — all
        # WITHOUT host syncs
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
            else:
                from ..loop.pose_graph import _db_query_multi
                scores_d[b] = _db_query_multi(
                    g._dev_db, g._dev_valid,
                    kp_desc_d[jnp.asarray(idxs)],
                    kp_valid_d[jnp.asarray(idxs)],
                    float(self.cfg.score_dist))

        _t_disp = _time.perf_counter()
        return dict(
            ext=ext, wp_world_d=wp_world_d, wp_norm_d=wp_norm_d,
            wp_valid_d=wp_valid_d, Q_d=Q_d, scores_d=scores_d,
            by_seq=by_seq, ks=ks, bs=bs, K=K, ts=ts, P_all=P_all,
            t0=_t0, t_sync1=_t_sync1, t_disp=_t_disp,
        )

    # ------------------------------------------------------------------
    def consume_finish(self, pend) -> dict:
        """Second half: the bulk readback (sync 2) + sequential host
        pose-graph processing, deferred DB appends, and one PGO per
        sequence-with-loops."""
        import time as _time

        if pend is None:
            return dict(n_keyframes=0, n_loops=0)
        ext, scores_d, by_seq = pend["ext"], pend["scores_d"], pend["by_seq"]
        ks, bs, K = pend["ks"], pend["bs"], pend["K"]
        ts, P_all = pend["ts"], pend["P_all"]
        _t0, _t_sync1, _t_disp = pend["t0"], pend["t_sync1"], pend["t_disp"]
        # sync 2: everything the host path needs, in one fetch
        (kp_uv, kp_norm, kp_valid, kp_desc, wp_desc), wp_world, wp_norm, \
            wp_valid, Qh, scores_h = jax.device_get(
                (ext, pend["wp_world_d"], pend["wp_norm_d"],
                 pend["wp_valid_d"], pend["Q_d"], scores_d))
        _t_sync2 = _time.perf_counter()
        kp_uv, kp_norm, kp_valid = (np.asarray(a) for a in
                                    (kp_uv, kp_norm, kp_valid))
        kp_desc, wp_desc = np.asarray(kp_desc), np.asarray(wp_desc)
        scores: dict = {}
        for b, idxs in by_seq.items():
            s = scores_h[b]
            scores[b] = {i: (None if s is None else np.asarray(s)[j])
                         for j, i in enumerate(idxs)}

        # sequential host processing (cheap: poses + thresholds; PnP only on
        # retrieval hits), then ONE deferred DB append per sequence and ONE
        # deferred PGO per sequence-with-loops (each optimize() costs a
        # dispatch + readback; the reference's optimize4DoF thread batches
        # loop events on a 2 s cadence the same way)
        n_loops = 0
        looped: set = set()
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
        # defer this segment's DB appends (device-resident descriptors) to
        # the next dispatch's flush() — or an explicit final flush().  If a
        # pending append is still queued (two finishes without an
        # intervening dispatch), flush it first instead of dropping it.
        self.flush()
        self._pending_append = (ext[3], ext[2], by_seq)
        for b in looped:
            self.graphs[b].optimize()

        self.n_keyframes += K
        self.n_loops += n_loops
        _t_end = _time.perf_counter()
        return dict(
            n_keyframes=K, n_loops=n_loops,
            # phase breakdown (ms): sync1 = gating readback, dispatch =
            # gather+extract+score dispatch (async), sync2 = bulk readback
            # (includes waiting out the device work), host = pose-graph
            # bookkeeping + PGO + deferred DB appends
            ms_sync1=round(1e3 * (_t_sync1 - _t0), 1),
            ms_dispatch=round(1e3 * (_t_disp - _t_sync1), 1),
            ms_sync2=round(1e3 * (_t_sync2 - _t_disp), 1),
            ms_host=round(1e3 * (_t_end - _t_sync2), 1),
        )

    # ------------------------------------------------------------------
    def corrected_path(self, b: int) -> list:
        """Loop-corrected keyframe trajectory [(t, P, Q)] of sequence b."""
        return self.graphs[b].path()
