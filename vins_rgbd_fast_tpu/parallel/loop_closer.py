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

from ..loop.pose_graph import (LazyRow, PoseGraph, PoseGraphConfig,
                               _db_query_all, _db_query_multi,
                               combine_db_rows, combined_old_host,
                               make_batch_extractor, verify_loops_device)
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

    CAND_PAD = 64  # loop-candidate verification group size (one compile;
    # = the keyframe chunk pad, so a chunk's candidates verify in ONE call)

    def _dispatch_verify(self, group):
        """Batched find-connection device half for ≤CAND_PAD candidates:
        pads to the fixed group size and dispatches ONE
        ``verify_loops_batch`` (results sliced by the caller)."""
        from ..loop.pose_graph import verify_loops_batch

        cc = group + [group[0]] * (self.CAND_PAD - len(group))
        seeds = np.asarray([c[1].index for c in cc], np.int32)
        # f32/int8 casts BEFORE upload: the tunneled host->device path runs
        # ~50 ms/MB, so float64 stacks double the dispatch cost
        wld = np.stack([c[1].wp_world for c in cc]).astype(np.float32)
        wd = np.stack([c[1].wp_desc for c in cc]).astype(np.int8)
        wv = np.stack([c[1].wp_valid for c in cc])
        olds = [self.graphs[b].keyframes[cand] for (b, _, cand, *_) in cc]
        combined = [combined_old_host(o) for o in olds]
        okd = np.stack([c[0] for c in combined]).astype(np.int8)
        okv = np.stack([c[1] for c in combined])
        okn = np.stack([c[2] for c in combined]).astype(np.float32)
        guesses = [self.graphs[b]._pnp_init_guess(o)
                   for (b, *_), o in zip(cc, olds)]
        R0 = np.stack([gu[0] for gu in guesses]).astype(np.float32)
        t0 = np.stack([gu[1] for gu in guesses]).astype(np.float32)
        out = verify_loops_batch(
            jnp.asarray(seeds), jnp.asarray(wld), jnp.asarray(wd),
            jnp.asarray(wv), jnp.asarray(okd), jnp.asarray(okv),
            jnp.asarray(okn), jnp.asarray(R0), jnp.asarray(t0),
            float(self.cfg.match_thresh), int(self.cfg.min_loop_num))
        return out, len(group)

    def _dispatch_verify_dev(self, group):
        """Device-resident batched find-connection: ONE jitted call per
        chunk group — cur side gathered in-kernel from the chunk's
        still-resident arrays, old side from the stacked DBs; the host
        uploads two packed arrays (~10 KB).  Returns (padded outputs,
        real count): outputs are NOT sliced on device — a per-count eager
        slice would recompile through the remote-compile tunnel every time
        the candidate count changes (~2 s/segment measured)."""
        chunk = group[0][3]
        cc = group + [group[0]] * (self.CAND_PAD - len(group))
        ints = np.zeros((self.CAND_PAD, 4), np.int32)
        flts = np.zeros((self.CAND_PAD, 24), np.float32)
        for j, (b, kf, cand, _, i_row, w_r, w_t) in enumerate(cc):
            g = self.graphs[b]
            # resolve the slot against the index map SNAPSHOTTED with the
            # stacked DBs (a compaction after the snapshot re-maps the live
            # g._db_index but not the snapshot rows we read from)
            idx_map = self._dbs_index_snap[b]
            slot = int(np.searchsorted(idx_map, cand))
            if not (slot < len(idx_map) and idx_map[slot] == cand):
                # old keyframe not retrieval-resident (evicted between
                # detection and verify — cannot happen in-segment, but be
                # safe): host fallback for the whole group
                return self._dispatch_verify(group)
            old = g.keyframes[cand]
            R0, t0 = g._pnp_init_guess(old)
            ints[j] = (kf.index, b, slot, i_row)
            flts[j, 0:9] = np.asarray(R0, np.float32).ravel()
            flts[j, 9:12] = np.asarray(t0, np.float32)
            flts[j, 12:21] = np.asarray(w_r, np.float32).ravel()
            flts[j, 21:24] = np.asarray(w_t, np.float32)
        dbs, dbvs, dbns = self._dbs_stacked
        out = verify_loops_device(
            jnp.asarray(ints), jnp.asarray(flts),
            chunk["wp_world_d"], chunk["ext"][4], chunk["wp_valid_d"],
            dbs, dbvs, dbns,
            float(self.cfg.match_thresh), int(self.cfg.min_loop_num))
        return out, len(group)

    def __init__(self, cam: CameraModel, ric: np.ndarray, tic: np.ndarray,
                 batch: int, pg_cfg: Optional[PoseGraphConfig] = None,
                 skip_cnt: int = 0, skip_dis: float = 0.0,
                 k_pad: int = 0, seq_pad: int = 0, db_capacity: int = 0,
                 pgo_period: float = 0.0):
        self.cfg = pg_cfg or PoseGraphConfig()
        self.cam = cam
        self.ric = np.asarray(ric)
        self.tic = np.asarray(tic)
        self.graphs: List[PoseGraph] = [
            PoseGraph(self.cfg, cam, ric, tic) for _ in range(batch)]
        if db_capacity:
            # pre-size every graph's retrieval DB to a COMMON capacity: the
            # merged cross-sequence query and the device-resident verifier
            # require equal caps, and doubling-at-different-times would
            # silently fork the graphs onto the slow per-sequence fallback
            for g in self.graphs:
                g._ensure_capacity(min(db_capacity, self.cfg.max_keyframes),
                                   (self.cfg.max_kp + self.cfg.max_wp, 256))
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
        # PGO cadence in STREAM seconds (reference optimize4DoF thread
        # wakes every 2 s, pose_graph.cpp:410-581); 0 = every segment.
        # Pending loops between wakeups ride the drift composition exactly
        # like the reference
        self.pgo_period = float(pgo_period)
        self._pgo_last_t: dict = {}
        self._pgo_backlog: set = set()
        self._pgo_vfns: dict = {}
        self._dbs_stacked = None  # stacked DB snapshot for device verify
        self._dbs_index_snap = None  # slot->kf-index maps, same snapshot
        # pipeline stage slots (st0 = packed gating token, newest)
        self._st0 = self._st1 = self._st2 = self._st3 = None
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
        c.pgo_period = self.pgo_period
        c._pgo_last_t = dict(self._pgo_last_t)
        c._pgo_backlog = set(self._pgo_backlog)
        c._pgo_vfns = self._pgo_vfns  # shared compiled-solver cache
        c._dbs_stacked = None
        c._dbs_index_snap = None
        c._st0 = c._st1 = c._st2 = c._st3 = None
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
        # PnP-RANSAC programs trace (accept/reject outcomes are ignored)
        n = min(cfg.max_wp, cfg.max_kp)
        wp_desc = np.array(cur.wp_desc)  # host copy (field may be a device array)
        wp_desc[:n] = np.asarray(old.kp_desc)[:n]
        wp_valid = np.zeros(cfg.max_wp, bool)
        wp_valid[:n] = np.asarray(old.kp_valid[:n], bool)
        cur_fake = cur._replace(wp_desc=wp_desc, wp_valid=wp_valid)
        fake = (0, cur_fake, old.index, None, 0, np.eye(3), np.zeros(3))
        # host-stacked verifier (fallback path) ...
        jax.device_get(ghost._dispatch_verify([fake]))
        # ... the DEVICE-resident verifier at its fixed shapes ...
        if ghost._dbs_stacked is not None and self.k_pad:
            from ..loop.pose_graph import verify_loops_device as _vld

            dbs, dbvs, dbns = ghost._dbs_stacked
            Cp, mwp = self.CAND_PAD, cfg.max_wp
            Kp = self.k_pad
            jax.device_get(_vld(
                jnp.zeros((Cp, 4), jnp.int32), jnp.zeros((Cp, 24), jnp.float32),
                jnp.zeros((Kp, mwp, 3), jnp.float32),
                jnp.zeros((Kp, mwp, 256), jnp.int8), jnp.zeros((Kp, mwp), bool),
                dbs, dbvs, dbns,
                float(cfg.match_thresh), int(cfg.min_loop_num)))
        # ... and the sequential form (realignment escape hatch / latency
        # pipeline)
        g._find_connection(cur_fake, old)
        # PGO trace at the padded-floor shapes
        g.loops.append(dict(cur=cur.index, old=old.index,
                            rel_t=np.zeros(3), rel_yaw=0.0,
                            rel_q=np.array([1.0, 0.0, 0.0, 0.0]),
                            n_inliers=cfg.min_loop_num))
        if g.earliest_loop_index is None:
            g.earliest_loop_index = old.index
        ghost._optimize_graphs({0})  # compiles the fixed-width vmapped PGO

    # ------------------------------------------------------------------
    def flush(self):
        """Flush deferred descriptor-DB appends (automatic at the start of
        the next dispatch; call once after the final consume_finish if the
        per-sequence graphs will be saved or queried directly)."""
        pend, self._pending_append = self._pending_append, []
        for (desc_d, valid_d, norm_d, by_seq, kf_rows) in pend:
            for b, idxs in by_seq.items():
                k = len(idxs)
                qp = self.seq_pad or _pad_pow2(k)
                for j0 in range(0, k, qp):
                    part = list(idxs[j0:j0 + qp])
                    idxp = jnp.asarray(part + [0] * (qp - len(part)))
                    d = desc_d[idxp]
                    v = valid_d[idxp] & (jnp.arange(qp) < len(part))[:, None]
                    self.graphs[b]._db_append_block(
                        d, v, count=len(part), norms=norm_d[idxp],
                        kf_indices=[kf_rows[i] for i in part])

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
        return self._gate_dispatch(self.pack_dispatch(batch, outs))

    # ------------------------------------------------------------------
    def pack_dispatch(self, batch: FrameBatch, outs: ScanOutputs):
        """Enqueue the tiny gating pack (is_keyframe, P, ts -> one (T,B,5)
        array) IMMEDIATELY after its scan and before the next segment's
        scan is dispatched: the pack then completes together with its scan,
        so the later gating readback never waits out a newer scan.  Returns
        the stage-0 token for :meth:`pipeline_advance` /
        :meth:`_gate_dispatch` (device refs retained)."""
        if batch is None:
            return None
        packed_d = _pack_gating(outs.is_keyframe, outs.P, batch.ts)
        try:
            packed_d.copy_to_host_async()
        except AttributeError:
            pass
        return dict(batch=batch, outs=outs, packed=packed_d)

    # ------------------------------------------------------------------
    def _gate_dispatch(self, tok, packed_h=None):
        """Stage 1: gating readback (sync 1) + all device dispatches
        (keyframe gather, batched extraction, per-sequence retrieval
        scoring) in compile-stable chunks.  ``packed_h``: prefetched host
        copy of the gating pack (the merged-fetch worker reads all stages'
        pending device results in ONE ``device_get`` — separate fetches
        each pay a full tunnel RTT)."""
        if tok is None:
            return None
        batch, outs = tok["batch"], tok["outs"]
        _t0 = _time.perf_counter()
        # flush the PREVIOUS segment's deferred DB appends before scoring —
        # scoring therefore always sees segments ≤ k-1, exactly as the
        # serial consume() did when appends ran at finish-time
        self.flush()
        # sync 1: gating inputs (is_keyframe flags + positions + stamps)
        packed = np.asarray(jax.device_get(tok["packed"])
                            if packed_h is None else packed_h)
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
        depths = jnp.asarray(batch.depths)[ks, bs]
        wp_uv_d = jnp.asarray(outs.wp_uv)[ks, bs]
        wp_valid_d = jnp.asarray(outs.wp_valid)[ks, bs]
        wp_world_d = jnp.asarray(outs.wp_world)[ks, bs]
        wp_norm_d = jnp.asarray(outs.wp_norm)[ks, bs]
        Q_d = jnp.asarray(outs.Q)[ks, bs]
        ext = self._extract(imgs, wp_uv_d, wp_valid_d, depths)
        kp_desc_d, kp_valid_d = ext[3], ext[2]
        by_seq: dict = {}
        for i in range(K):
            by_seq.setdefault(int(bs[i]), []).append(i)
        scores_d = self._dispatch_queries(by_seq, kp_desc_d, kp_valid_d, Kp)
        chunk = dict(
            ext=ext, wp_world_d=wp_world_d, wp_norm_d=wp_norm_d,
            wp_valid_d=wp_valid_d, Q_d=Q_d, scores_d=scores_d,
            by_seq=by_seq, ks=ks, bs=bs, K=K, ts=ts, P_all=P_all,
        )
        # start the device->host copies NOW: by the time the insert stage
        # fetches (one scan later), the bytes are already on host — the
        # tunneled readback otherwise costs ~50 ms/MB of blocking
        for leaf in jax.tree.leaves((ext, wp_world_d, wp_norm_d,
                                     wp_valid_d, Q_d, scores_d)):
            try:
                leaf.copy_to_host_async()
            except AttributeError:
                break
        return chunk

    # ------------------------------------------------------------------
    def _dispatch_queries(self, by_seq, kp_desc_d, kp_valid_d, Kp):
        """Retrieval scoring for this chunk.  Fast path: ONE cross-sequence
        dispatch against the stacked DBs (per-sequence dispatches cost
        ~24 ms launch overhead each); falls back to per-sequence queries
        when DB capacities diverge or a sequence overflows the pad."""
        maxlen = max((len(v) for v in by_seq.values()), default=1)
        qp = min(max(self.seq_pad, _pad_pow2(maxlen)), Kp)
        caps = {0 if g._dev_db is None else int(g._dev_db.shape[0])
                for g in self.graphs}
        mergeable = len(caps) == 1 and 0 not in caps
        if not mergeable:
            self._dbs_stacked = None
            self._dbs_index_snap = None
        if mergeable:
            B = len(self.graphs)
            qidx = np.zeros((B, qp), np.int64)
            qcnt = np.zeros(B, np.int64)
            for b, idxs in by_seq.items():
                qidx[b, :len(idxs)] = idxs
                qcnt[b] = len(idxs)
            dbs = jnp.stack([g._dev_db for g in self.graphs])
            dbvs = jnp.stack([g._dev_valid for g in self.graphs])
            dbns = jnp.stack([g._dev_norm for g in self.graphs])
            # retained for the device-resident loop verification (valid for
            # this segment: appends are deferred until the NEXT dispatch).
            # The slot->keyframe index maps are snapshotted WITH the stack:
            # a compaction between this dispatch and the verify would
            # otherwise silently re-map slots under the snapshot's feet
            self._dbs_stacked = (dbs, dbvs, dbns)
            self._dbs_index_snap = [g._db_index.copy() for g in self.graphs]
            qsel = jnp.asarray(qidx)
            qs = kp_desc_d[qsel]  # (B, qp, max_kp, 256)
            qvs = (kp_valid_d[qsel]
                   & (jnp.arange(qp)[None, :, None]
                      < jnp.asarray(qcnt)[:, None, None]))
            sc = _db_query_all(dbs, dbvs, qs, qvs, float(self.cfg.score_dist))
            return {b: (None if self.graphs[b]._db_size == 0
                        else [(sc[b], len(by_seq[b]))])
                    for b in by_seq}
        scores_d: dict = {}
        for b, idxs in by_seq.items():
            g = self.graphs[b]
            if g._dev_db is None or g._db_size == 0:
                scores_d[b] = None
                continue
            qp_b = min(self.seq_pad or _pad_pow2(len(idxs)), Kp)
            parts = []
            for j0 in range(0, len(idxs), qp_b):
                part = idxs[j0:j0 + qp_b]
                idxp = jnp.asarray(list(part) + [0] * (qp_b - len(part)))
                sq = _db_query_multi(
                    g._dev_db, g._dev_valid,
                    kp_desc_d[idxp], kp_valid_d[idxp],
                    float(self.cfg.score_dist))
                parts.append((sq, len(part)))
            scores_d[b] = parts
        return scores_d

    # ------------------------------------------------------------------
    def consume_finish(self, pend) -> dict:
        """Second half, synchronous: bulk readback + host pose-graph work +
        batched verification + PGO in one call.  The bench's pipelined
        steady state instead drives :meth:`pipeline_advance`, which spreads
        these stages across segments so every device_get targets work that
        completed under an already-dispatched scan."""
        if pend is None:
            return dict(n_keyframes=0, n_loops=0)
        st2 = self._stage_insert(pend)
        st3 = self._stage_accept(st2)
        return self._stage_pgo(st3)

    # ------------------------------------------------------------------
    def pipeline_advance(self, batch=None, outs=None):
        """Advance the 4-stage software pipeline by one segment.  Call
        immediately AFTER dispatching the next segment's scan: every
        device_get here targets work dispatched ≥1 segment ago (completed
        while the previous scan ran), and every new device dispatch queues
        behind the scan just issued — the device never idles and the host
        never waits out a scan inside loop-closure work.

        Stages per segment k (oldest first): PGO fetch+apply (k-4),
        verification fetch + loop acceptance + PGO dispatch (k-3),
        extraction fetch + keyframe insertion + detection + verification
        dispatch (k-2), gating readback + extraction/scoring dispatch
        (k-1), gating pack retained (k).

        The gating pack for segment k is enqueued by :meth:`pack_dispatch`
        right after scan k (call it BEFORE this method, which dispatches
        behind scan k) and read back only on the NEXT advance — by then
        scan k has completed under scan k+1, so no host fetch in the
        steady state ever waits on an incomplete device op and every new
        dispatch queues behind the in-flight scan: the device never
        idles, the host never stalls.

        Loop corrections therefore land 3-4 segments after detection —
        the reference's optimize4DoF thread applies them on a 2 s wakeup
        cadence the same way (pose_graph.cpp:410-581).

        Pass ``batch=None`` to drain one stage.  Returns the completed
        (oldest) segment's stats dict, or None."""
        tok = (self.pack_dispatch(batch, outs)
               if batch is not None else None)
        return self.pipeline_advance_packed(tok)

    def pipeline_advance_packed(self, tok):
        """Advance the 5-stage pipeline with an already-packed stage-0
        token from :meth:`pack_dispatch` (None to drain one stage)."""
        stats = self._stage_pgo(self._st3) if self._st3 is not None else None
        self._st3 = self._stage_accept(self._st2)
        self._st2 = self._stage_insert(self._st1)
        self._st1 = self._gate_dispatch(self._st0)
        self._st0 = tok
        return stats

    def pipeline_drain(self) -> list:
        """Drain all in-flight pipeline stages (call after the last
        segment's scan has been dispatched + advanced); flushes deferred
        DB appends.  Returns the remaining segments' stats dicts."""
        out = []
        while (self._st0 is not None or self._st1 is not None
               or self._st2 is not None or self._st3 is not None):
            st = self.pipeline_advance(None, None)
            if st is not None:
                out.append(st)
        self.flush()
        # final PGO wakeup: solve any sequences still deferred by the
        # cadence gate (the reference thread's next 2 s tick would)
        if self._pgo_backlog:
            due, self._pgo_backlog = set(self._pgo_backlog), set()
            for b in due:
                g = self.graphs[b]
                self._pgo_last_t[b] = g.keyframes[-1].t if g.keyframes else 0.0
            self._optimize_graphs(due)
        return out

    # ------------------------------------------------------------------
    def _stage_insert(self, pend, pre=None):
        """Stage 2: fetch extraction/scores, insert keyframes + detect
        candidates (host), dispatch batched verification, queue DB
        appends.  ``pre``: per-chunk prefetched host trees (merged-fetch
        worker)."""
        if pend is None:
            return None
        _t0 = _time.perf_counter()
        n_kf = 0
        cands = []  # (b, kf, old_index) in keyframe order
        for ci, chunk in enumerate(pend["pends"]):
            dn, dc = self._chunk_insert(
                chunk, pre=None if pre is None else pre[ci])
            n_kf += dn
            cands += dc
        _t_fetch = _time.perf_counter()
        # groups are per source chunk (the device path gathers the cur side
        # from that chunk's still-resident arrays)
        groups = []
        run = []
        for c in cands:
            if run and (c[3] is not run[0][3] or len(run) == self.CAND_PAD):
                groups.append(run)
                run = []
            run.append(c)
        if run:
            groups.append(run)
        pend_v = [self._dispatch_verify_dev(gr)
                  if self._dbs_stacked is not None
                  else self._dispatch_verify(gr) for gr in groups]
        self.n_keyframes += n_kf
        return dict(
            cands=cands, pend_v=pend_v, n_kf=n_kf,
            ms_sync1=round(1e3 * (pend["t_sync1"] - pend["t0"]), 1),
            ms_dispatch=round(1e3 * (pend["t_disp"] - pend["t_sync1"]), 1),
            ms_sync2=round(1e3 * (_t_fetch - _t0), 1),
            ms_vdisp=round(1e3 * (_time.perf_counter() - _t_fetch), 1),
        )

    def _chunk_fetch_tree(self, chunk: dict):
        """Device handles _chunk_insert reads — exposed so the merged-
        fetch worker can device_get EVERY pending stage's results in ONE
        round trip."""
        return (chunk["ext"][:3], chunk["wp_world_d"], chunk["wp_norm_d"],
                chunk["wp_valid_d"], chunk["Q_d"], chunk["scores_d"])

    def _chunk_insert(self, chunk: dict, pre=None):
        """Fetch one chunk + Pass A: insert every keyframe, detect loop
        candidates from the prefetched retrieval scores (host numpy), and
        queue the chunk's deferred DB append.

        The DESCRIPTORS are never fetched: they stay device-resident
        (per-row device slices in the stored ``KeyFrameData``) — the
        verification path reads them from the chunk/DB device arrays
        anyway, and host copies were ~90% of this stage's readback bytes
        (~2.4 MB/chunk through the ~50 ms/MB tunnel)."""
        ext, by_seq = chunk["ext"], chunk["by_seq"]
        ks, bs, K = chunk["ks"], chunk["bs"], chunk["K"]
        ts, P_all = chunk["ts"], chunk["P_all"]
        kp_desc_d, wp_desc_d = ext[3], ext[4]
        if pre is None:
            pre = jax.device_get(self._chunk_fetch_tree(chunk))
        (kp_uv, kp_norm, kp_valid), wp_world, wp_norm, \
            wp_valid, Qh, scores_h = pre
        kp_uv, kp_norm, kp_valid = (np.asarray(a) for a in
                                    (kp_uv, kp_norm, kp_valid))
        scores: dict = {}
        for b, idxs in by_seq.items():
            parts = scores_h[b]
            if parts is None:
                scores[b] = {i: None for i in idxs}
            else:
                rows = np.concatenate(
                    [np.asarray(sc)[:n] for (sc, n) in parts], axis=0)
                scores[b] = {i: rows[j] for j, i in enumerate(idxs)}

        cands = []
        kf_rows: dict = {}  # chunk row -> keyframe index (for the append)
        for i in range(K):
            k, b = int(ks[i]), int(bs[i])
            g = self.graphs[b]
            w_r, w_t = g.w_r_vio.copy(), g.w_t_vio.copy()  # as-of-insert
            kf, cand = g.insert_keyframe(
                float(ts[k, b]),
                P_all[k, b], np.asarray(Qh[i]),
                np.asarray(wp_world[i]), np.asarray(wp_norm[i]),
                np.asarray(wp_valid[i]),
                kp_uv[i], kp_norm[i], kp_valid[i],
                LazyRow(kp_desc_d, i), LazyRow(wp_desc_d, i),
                scores=scores[b][i],
            )
            kf_rows[i] = kf.index
            if cand is not None:
                cands.append((b, kf, cand, chunk, i, w_r, w_t))
        # defer this chunk's DB appends (device-resident descriptors) to
        # the next dispatch's flush() — or an explicit final flush().  Rows
        # are the COMBINED kp∪wp set (verification matches cur windows
        # against it; see pose_graph.combine_db_rows)
        desc_c, valid_c, norm_c = combine_db_rows(
            ext[3], ext[2], ext[1], ext[4], chunk["wp_valid_d"],
            chunk["wp_norm_d"])
        self._pending_append.append((desc_c, valid_c, norm_c, by_seq,
                                     kf_rows))
        return K, cands

    # ------------------------------------------------------------------
    def _stage_accept(self, st2, pre=None):
        """Stage 3: fetch verification results, accept loops in keyframe
        order (host gates; a cross-sequence realignment re-verifies later
        candidates of that graph eagerly), dispatch the vmapped PGO.
        ``pre``: prefetched host verification results (merged-fetch
        worker)."""
        if st2 is None:
            return None
        _t0 = _time.perf_counter()
        cands, pend_v = st2["cands"], st2["pend_v"]
        n_loops = 0
        looped: set = set()
        if cands:
            host_v = (jax.device_get([o for (o, _) in pend_v])
                      if pre is None else pre)
            ns = [n for (_, n) in pend_v]
            idx_b = np.concatenate([np.asarray(h[0])[:n]
                                    for h, n in zip(host_v, ns)])
            okf = np.concatenate([np.asarray(h[1])[:n]
                                  for h, n in zip(host_v, ns)])
            models = np.concatenate([np.asarray(h[2])[:n]
                                     for h, n in zip(host_v, ns)])
            ninl = np.concatenate([np.asarray(h[3])[:n]
                                   for h, n in zip(host_v, ns)])
            inls = np.concatenate([np.asarray(h[4])[:n]
                                   for h, n in zip(host_v, ns)])
            realigned: set = set()
            for j in range(len(cands)):
                b, kf, cand = cands[j][:3]
                g = self.graphs[b]
                cur = g.keyframes[kf.index]
                old = g.keyframes[cand]
                if b in realigned:
                    info = g._find_connection(cur, old)
                else:
                    info = g._loop_from_pnp(
                        cur, old, bool(okf[j]), models[j], int(ninl[j]),
                        idx_b[j], inls[j])
                if info is not None:
                    if g.accept_loop(cur, cand, info):
                        realigned.add(b)
                    n_loops += 1
                    looped.add(b)
        self.n_loops += n_loops
        # PGO cadence gate (stream time): defer sequences whose last solve
        # is newer than pgo_period; deferred loops stay in the backlog and
        # ride the drift composition until the next wakeup
        self._pgo_backlog |= looped
        due = set()
        for b in self._pgo_backlog:
            g = self.graphs[b]
            t_now = g.keyframes[-1].t if g.keyframes else 0.0
            if (self.pgo_period <= 0
                    or t_now - self._pgo_last_t.get(b, -1e18) >= self.pgo_period):
                due.add(b)
                self._pgo_last_t[b] = t_now
        self._pgo_backlog -= due
        pgo = self._pgo_dispatch(due)
        st3 = dict(st2)
        st3.pop("cands"); st3.pop("pend_v")
        st3.update(pgo=pgo, n_loops=n_loops,
                   ms_accept=round(1e3 * (_time.perf_counter() - _t0), 1))
        return st3

    # ------------------------------------------------------------------
    def _stage_pgo(self, st3, pre=None) -> dict:
        """Stage 4: fetch + apply the PGO results; emits the completed
        segment's stats.  ``pre``: prefetched host (yaw_o, t_o)."""
        if st3 is None:
            return dict(n_keyframes=0, n_loops=0)
        _t0 = _time.perf_counter()
        self._pgo_apply(st3.get("pgo"), pre=pre)
        stats = dict(
            n_keyframes=st3["n_kf"], n_loops=st3["n_loops"],
            ms_sync1=st3["ms_sync1"], ms_dispatch=st3["ms_dispatch"],
            ms_sync2=st3["ms_sync2"], ms_vdisp=st3["ms_vdisp"],
            ms_accept=st3["ms_accept"],
            ms_pgo=round(1e3 * (_time.perf_counter() - _t0), 1),
        )
        return stats

    # ------------------------------------------------------------------
    def _optimize_graphs(self, looped):
        """Synchronous PGO for every looped sequence (serial consume())."""
        self._pgo_apply(self._pgo_dispatch(looped))

    def _pgo_dispatch(self, looped):
        """Build + dispatch PGO for every looped sequence in ONE vmapped
        LM call at a FIXED batch width (problem shapes are shared under
        the config's pad floors, so the whole run reuses one compiled
        solver).  Falls back to eager per-graph optimize() on shape
        mismatch or 6-DoF.  Returns a pending token for
        :meth:`_pgo_apply` (device work proceeds asynchronously)."""
        from ..loop.pose_graph import optimize_4dof

        probs = []
        for b in sorted(looped):
            g = self.graphs[b]
            pr = g._build_4dof()
            if pr is None:
                continue
            if pr == "6dof":
                g.optimize()
                continue
            probs.append((b, pr))
        if not probs:
            return None
        shapes = {(pr["yaw"].shape[0], pr["ei"].shape[0]) for _, pr in probs}
        if len(shapes) > 1:
            for b, pr in probs:
                self.graphs[b]._solve_apply_4dof(pr)
            return None
        Kpad = probs[0][1]["yaw"].shape[0]
        Epad = probs[0][1]["ei"].shape[0]
        n_real = len(probs)
        # pad the problem batch to a FIXED width (the sequence count) so
        # every segment reuses one compiled vmapped solver
        while len(probs) < len(self.graphs):
            probs.append((-1, probs[0][1]))
        cfg = self.cfg
        key = (Kpad, Epad)
        vf = self._pgo_vfns.get(key)
        if vf is None:
            def solve(yaw, tt, pitch, roll, valid, fixed,
                      ei, ej, ert, ery, ew, elo, evl):
                return optimize_4dof(
                    yaw, tt, pitch, roll, valid, fixed, ei, ej, ert, ery,
                    ew, elo, evl, n_nodes_static=Kpad, iters=cfg.pg_iters,
                    huber=cfg.huber)

            vf = jax.jit(jax.vmap(solve))
            self._pgo_vfns[key] = vf
        st = lambda k: jnp.asarray(np.stack([pr[k] for _, pr in probs]))
        yaw_o, t_o, _, _ = vf(st("yaw"), st("tt"), st("pitch"), st("roll"),
                              st("valid"), st("fixed"), st("ei"), st("ej"),
                              st("ert"), st("ery"),
                              jnp.ones((len(probs), Epad)), st("elo"),
                              st("evl"))
        return dict(probs=probs[:n_real], yaw_o=yaw_o, t_o=t_o)

    def _pgo_apply(self, pend, pre=None):
        """Fetch + write back a dispatched PGO (corrected poses, drift)."""
        if pend is None:
            return
        yaw_h, t_h = (jax.device_get((pend["yaw_o"], pend["t_o"]))
                      if pre is None else pre)
        for (b, pr), y, t in zip(pend["probs"], np.asarray(yaw_h),
                                 np.asarray(t_h)):
            self.graphs[b]._apply_4dof(pr, y, t)

    # ------------------------------------------------------------------
    def corrected_path(self, b: int) -> list:
        """Loop-corrected keyframe trajectory [(t, P, Q)] of sequence b."""
        return self.graphs[b].path()


class ThreadedLoopCloser:
    """Drives a :class:`BatchedLoopCloser` on a WORKER THREAD — the
    reference's architecture exactly: a second nodelet process consumes
    keyframes concurrently and the estimator pays nothing
    (``pose_graph_nodelet.cpp:449-566``).

    The main (scan) thread per segment only enqueues ``(batch, outs)``
    device handles — zero device syncs, zero blocking.  The worker runs
    the closer's serial ``consume`` per segment: its gating readback,
    extraction fetch, verification and PGO round trips (each a full
    tunnel RTT on the remote-TPU bench host) all overlap the main
    thread's next scan dispatches.  The closer's own 5-stage in-thread
    pipeline is unnecessary here — the thread IS the overlap.

    ``drain()`` joins the queue, flushes deferred DB appends and runs the
    final PGO wakeup; worker exceptions re-raise there."""

    def __init__(self, closer: BatchedLoopCloser):
        import queue
        import threading

        self.closer = closer
        self.stats: list = []
        self._q: "queue.Queue" = queue.Queue()
        self._exc: Optional[BaseException] = None
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="loop-closer")
        self._worker.start()

    def submit(self, batch: FrameBatch, outs: ScanOutputs):
        """Enqueue one scan segment's outputs (device handles; no sync)."""
        self._q.put((batch, outs))

    def _advance_merged(self, tok):
        """One 5-stage pipeline advance with every pending stage's device
        results fetched in ONE multi-leaf ``device_get`` — the per-stage
        fetches each pay a full tunnel RTT (measured: six separate fetches
        182 ms vs 46 ms batched), and at a congested ~0.5 s RTT the
        unmerged worker spent ~1.3 s/segment purely waiting."""
        c = self.closer
        fetch = {}
        if c._st0 is not None:
            fetch["gate"] = c._st0["packed"]
        if c._st1 is not None:
            fetch["chunks"] = [c._chunk_fetch_tree(ch)
                               for ch in c._st1["pends"]]
        if c._st2 is not None and c._st2["cands"]:
            fetch["verify"] = [o for (o, _) in c._st2["pend_v"]]
        if c._st3 is not None and c._st3.get("pgo") is not None:
            fetch["pgo"] = (c._st3["pgo"]["yaw_o"], c._st3["pgo"]["t_o"])
        host = jax.device_get(fetch) if fetch else {}
        stats = c._stage_pgo(c._st3, pre=host.get("pgo")) \
            if c._st3 is not None else None
        c._st3 = c._stage_accept(c._st2, pre=host.get("verify"))
        c._st2 = c._stage_insert(c._st1, pre=host.get("chunks"))
        c._st1 = c._gate_dispatch(c._st0, packed_h=host.get("gate"))
        c._st0 = tok
        return stats

    def _run(self):
        while True:
            batch, outs = self._q.get()
            try:
                tok = self.closer.pack_dispatch(batch, outs)
                st = self._advance_merged(tok)
                if st and st.get("n_keyframes"):
                    self.stats.append(st)
            except BaseException as e:  # noqa: BLE001 — reported at drain
                self._exc = e
            finally:
                self._q.task_done()

    def drain(self) -> list:
        """Wait for all queued segments, drain the in-flight pipeline
        stages, flush appends, run the final PGO wakeup; returns the
        per-segment stats list."""
        self._q.join()
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc
        c = self.closer
        while (c._st0 is not None or c._st1 is not None
               or c._st2 is not None or c._st3 is not None):
            st = self._advance_merged(None)
            if st and st.get("n_keyframes"):
                self.stats.append(st)
        c.flush()
        if c._pgo_backlog:
            due, c._pgo_backlog = set(c._pgo_backlog), set()
            for b in due:
                g = c.graphs[b]
                c._pgo_last_t[b] = g.keyframes[-1].t if g.keyframes else 0.0
            c._optimize_graphs(due)
        return self.stats


# ---------------------------------------------------------------------------
# Latency-mode async loop closer
# ---------------------------------------------------------------------------


@jax.jit
def _pack_latency_gating(sout):
    """One ~26-float device pack per frame (is_keyframe, pose, relo round
    trip) so the latency pipeline reads its pose-graph gating with ONE
    small readback one frame later — never a blocking sync on the frame it
    was produced by."""
    f32 = sout.P.dtype
    return jnp.concatenate([
        sout.is_keyframe.astype(f32)[None], sout.P, sout.Q,
        sout.relo_used.astype(f32)[None], sout.relo_P, sout.relo_Q,
        sout.relo_cur_P, sout.relo_cur_Q,
    ])


class AsyncLoopStager:
    """Pose graph for the LATENCY pipeline without ANY host syncs on the
    frame path — the TPU-native equivalent of the reference's concurrent
    pose_graph nodelet (``pose_graph_nodelet.cpp:449-566``), realized as a
    WORKER THREAD (the reference's model exactly: the estimator nodelet
    costs nothing for the pose graph's work).

    The main (frame) thread per frame only packs a ~26-float gating row
    (one tiny device dispatch — launches are asynchronous) and appends the
    token to a buffer; every ``fetch_every`` frames the buffered rows are
    stacked (one dispatch) and handed to the worker.  The worker pays the
    blocking device->host round trips (each sync costs a full tunnel RTT
    on the remote-TPU bench host): ONE stacked gating fetch per
    ``fetch_every`` frames, plus extraction/retrieval/verification/PGO
    work for admitted keyframes — all concurrent with the main thread's
    fused dispatches, which never wait.

    Loop corrections land ≤ ``fetch_every`` frames + worker backlog after
    the keyframe — the reference's loop thread has the same queue latency
    under load (``pose_graph.cpp:308-393``)."""

    def __init__(self, pose_graph: PoseGraph, estimator=None,
                 skip_cnt: int = 0, skip_dis: float = 0.0,
                 fast_relocalization: bool = False, fetch_every: int = 8):
        # fetch_every must stay under the 10-slot window span: the
        # fast-relo observations a loop sends back bind window features by
        # id (ops.solver.remap_relo_by_id), and a gating batch longer than
        # the window guarantees they have been marginalized out by the
        # time the loop is verified
        import queue
        import threading

        self.g = pose_graph
        self.est = estimator
        self.cfg = pose_graph.cfg
        self.skip_cnt = skip_cnt
        self.skip_dis = skip_dis
        self.fast_relo = fast_relocalization
        self.fetch_every = max(int(fetch_every), 1)
        self._extract = make_batch_extractor(self.cfg, pose_graph.cam)
        self._skip_count = 0
        self._travel_anchor: Optional[np.ndarray] = None
        self._relo_sent_kf: Optional[int] = None
        self.n_keyframes = 0
        self.n_loops = 0
        self._buf: list = []  # [(packed_d, t, sout, img_d, depth_d)]
        self._q: "queue.Queue" = queue.Queue()
        self._exc: Optional[BaseException] = None
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="loop-stager")
        self._worker.start()

    # ------------------------------------------------------------------
    def on_frame(self, sout, img, t: float, depth=None):
        """Record this frame's gating token (``sout`` = the StepOutput
        device pytree, ``img``/``depth`` device images).  Dispatch-only:
        never blocks on the device."""
        packed = _pack_latency_gating(sout)
        self._buf.append((packed, float(t), sout, img, depth))
        if len(self._buf) >= self.fetch_every:
            self._flush_buf()

    def _flush_buf(self):
        if not self._buf:
            return
        toks, self._buf = self._buf, []
        stacked = jnp.stack([tk[0] for tk in toks])  # one dispatch
        self._q.put((stacked, toks))

    def drain(self):
        """Flush buffered tokens and wait for the worker to finish all
        queued work (end of stream, or before reading the pose graph)."""
        self._flush_buf()
        self._q.join()
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc

    # ------------------------------------------------------------------
    def _run(self):
        while True:
            item = self._q.get()
            try:
                self._process(*item)
            except BaseException as e:  # noqa: BLE001 — reported at drain
                self._exc = e
            finally:
                self._q.task_done()

    def _process(self, stacked, toks):
        rows = np.asarray(jax.device_get(stacked), np.float64)  # ONE sync
        for row, (_, t, sout, img, depth) in zip(rows, toks):
            if row[8] > 0.5 and self._relo_sent_kf is not None:
                self._consume_relo(row)
            if not self._gate(bool(row[0] > 0.5), row[1:4]):
                continue
            self._handle_keyframe(t, row[1:4], row[4:8], sout, img, depth)

    # ------------------------------------------------------------------
    def _gate(self, is_kf: bool, P: np.ndarray) -> bool:
        if not is_kf:
            return False
        if self.skip_cnt > 0:
            self._skip_count += 1
            if self._skip_count < self.skip_cnt:
                return False
            self._skip_count = 0
        if (self._travel_anchor is not None and self.skip_dis > 0
                and np.linalg.norm(P - self._travel_anchor) < self.skip_dis):
            return False
        self._travel_anchor = P
        return True

    # ------------------------------------------------------------------
    def _handle_keyframe(self, t, P, Q, sout, img, depth):
        """Worker-side keyframe: extraction + retrieval dispatch, fetch,
        insert + detect; on a candidate verify + accept + PGO + fast-relo
        feedback.  All blocking syncs happen on the worker thread."""
        g = self.g
        ext = self._extract(img[None], sout.wp_uv[None], sout.wp_valid[None],
                            None if depth is None else depth[None])
        sc = None
        if g._dev_db is not None and g._db_size > 0:
            sc = _db_query_multi(g._dev_db, g._dev_valid, ext[3], ext[2],
                                 float(self.cfg.score_dist))
        (kp_uv, kp_norm, kp_valid), sc_h, wp_world, wp_norm, wp_valid = \
            jax.device_get((ext[:3], sc, sout.wp_world, sout.wp_norm,
                            sout.wp_valid))
        scores = np.asarray(sc_h[0]) if sc_h is not None else None
        kf, cand = g.insert_keyframe(
            t, P, Q,
            np.asarray(wp_world), np.asarray(wp_norm), np.asarray(wp_valid),
            np.asarray(kp_uv[0]), np.asarray(kp_norm[0]),
            np.asarray(kp_valid[0]), ext[3][0], ext[4][0],
            detect_loop=scores is not None, scores=scores,
        )
        self.n_keyframes += 1
        # append AFTER this keyframe's own query was dispatched: the next
        # keyframe's query sees it, this one's did not — recency exclusion
        # makes both equivalent to the serial order.  Rows are the combined
        # kp∪wp set (pose_graph.combine_db_rows)
        d_c, v_c, n_c = combine_db_rows(
            ext[3], ext[2], ext[1], ext[4], sout.wp_valid[None],
            sout.wp_norm[None])
        g._db_append_block(d_c, v_c, count=1, norms=n_c,
                           kf_indices=[kf.index])
        if cand is None:
            return
        info = g._find_connection(kf, g.keyframes[cand])
        if info is None:
            return
        self.n_loops += 1
        g.accept_loop(kf, cand, info)
        g.optimize()
        if self.fast_relo and self.est is not None:
            # set_relo_frame swaps one reference read by the frame thread's
            # next solve (GIL-atomic swap — the reference's relo_buf mutex,
            # estimator_nodelet.cpp:523-539)
            old = g.keyframes[info["old"]]
            self.est.set_relo_frame(
                info["matched_old_norm"], info["inlier_mask"],
                np.asarray(jax.device_get(sout.wp_ids)),
                old.P_vio, old.Q_vio)
            self._relo_sent_kf = info["cur"]

    # ------------------------------------------------------------------
    def _consume_relo(self, p: np.ndarray):
        """Fast-relocalization feedback from the packed gating row (the
        estimator optimized the relo pose alongside the window,
        estimator.cpp:1034-1057 -> PoseGraph.update_keyframe_loop)."""
        from ..utils import quaternion_np as nq

        kf_index, self._relo_sent_kf = self._relo_sent_kf, None
        P_relo, Q_relo = p[9:12], p[12:16]
        P_cur, Q_cur = p[16:19], p[19:23]
        R_relo = nq.q2R(Q_relo)
        rel_t = R_relo.T @ (P_cur - P_relo)
        rel_q = nq.qmul(nq.qconj(Q_relo), Q_cur)
        yaw_cur = float(nq.R2ypr(nq.q2R(Q_cur))[0])
        yaw_relo = float(nq.R2ypr(R_relo)[0])
        rel_yaw = float(nq.normalize_angle_deg(yaw_cur - yaw_relo))
        self.g.update_keyframe_loop(kf_index, rel_t, rel_q, rel_yaw)

    # ------------------------------------------------------------------
    def compile_warmup(self, img):
        """Pre-trace the stager's device programs (extraction, retrieval
        query, find-connection PnP, PGO) on a THROWAWAY graph clone so no
        one-time compile lands in a timed steady state.  ``img``: a sample
        frame."""
        cfg = self.cfg
        g = self.g.clone()
        uv = jnp.zeros((1, cfg.max_wp, 2), jnp.float32) + 50.0
        wv = jnp.ones((1, cfg.max_wp), bool)
        img_d = jnp.asarray(img)
        ext = self._extract(img_d[None], uv, wv,
                            jnp.ones_like(img_d)[None] * 3.0)
        g._ensure_capacity(2, (cfg.max_kp + cfg.max_wp, 256))
        jax.device_get(_db_query_multi(g._dev_db, g._dev_valid, ext[3],
                                       ext[2], float(cfg.score_dist)))
        # find-connection + PGO trace on fabricated matching keyframes
        kp_uv, kp_norm, kp_valid, kp_desc, wp_desc = jax.device_get(ext)
        wpw = np.zeros((cfg.max_wp, 3))
        wpw[:, 2] = 3.0
        n = min(cfg.max_wp, cfg.max_kp)
        wpd = np.zeros((cfg.max_wp, 256), np.int8)
        wpd[:n] = np.asarray(kp_desc[0])[:n]
        wvn = np.zeros(cfg.max_wp, bool)
        wvn[:n] = np.asarray(kp_valid[0])[:n]
        q0 = np.array([1.0, 0, 0, 0])
        kf0, _ = g.insert_keyframe(0.0, np.zeros(3), q0, wpw,
                                   np.asarray(kp_norm[0])[:cfg.max_wp], wvn,
                                   kp_uv[0], kp_norm[0], kp_valid[0],
                                   kp_desc[0], wpd, detect_loop=False)
        kf1, _ = g.insert_keyframe(1.0, np.zeros(3) + 0.01, q0, wpw,
                                   np.asarray(kp_norm[0])[:cfg.max_wp], wvn,
                                   kp_uv[0], kp_norm[0], kp_valid[0],
                                   kp_desc[0], wpd, detect_loop=False)
        info = g._find_connection(kf1, kf0)
        g.loops.append(info if info is not None else dict(
            cur=kf1.index, old=kf0.index, rel_t=np.zeros(3), rel_yaw=0.0,
            rel_q=q0, n_inliers=cfg.min_loop_num))
        if g.earliest_loop_index is None:
            g.earliest_loop_index = kf0.index
        g.optimize()
