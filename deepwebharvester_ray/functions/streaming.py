"""Streaming (micro-batch) operators over keyed actor-shard pools.

Six arrival-order twins of batch operators, each emitting continuously
with BOUNDED state and proving plan equivalence against the batch
answer (shared SQL oracles where one exists): gap sessionization
(:func:`streaming_sessionize`), exact first-occurrence dedup
(:func:`streaming_dedup`), Misra–Gries heavy hitters
(:func:`streaming_topk`), the interval join
(:func:`streaming_interval_join`, watermark-evicted open windows), the
backward as-of join (:func:`streaming_asof_join`, latest-view-per-user
floor) and the tumbling-window aggregate
(:func:`streaming_tumbling_agg`, watermark-closed hourly windows).  All share one topology, detailed below for the
sessionizer and reused verbatim by the others; event-time ties at
micro-batch boundaries are kept together by :func:`_ts_aligned_batches`
(an inclusive-predicate tie split across batches is silently missed
otherwise).

The batch sessionizer (queries.q_event_sessions) needs the WHOLE event
log before it can sort; a crawler/telemetry pipeline sees events as an
ordered stream and must emit per-user session aggregates continuously
with BOUNDED state.  This module is that operator, Ray-native:

* **Shards are Ray actors** keyed by ``hash(user) % n_shards`` — each
  holds only its users' OPEN-session state (last_ts, event/session
  counters) as sorted numpy arrays, updated per micro-batch with one
  searchsorted + reduceat pass (no per-user Python in the hot loop).
* **The stream is event-time ordered** (the standard watermark contract;
  the simulator below produces it with one ``sort("ts")``).  Per-user
  order then holds per shard automatically.
* **Watermark eviction makes state bounded** — and for GAP
  sessionization it is exactly correct: once ``watermark - gap`` passes
  a user's last event, NO future event can extend that session (any
  later event is > gap away by definition), so the user's aggregate is
  frozen, emitted, and dropped.  A returning user simply opens a new
  session; the final per-user totals are the grouped SUM of emitted
  partials + residual state, bit-equal to the batch answer.

Driver state is one micro-batch at a time (the driver plays the stream
SOURCE here — in production that role belongs to the ingest system);
per-shard state is O(open users on that shard); emitted partials flow
to the result incrementally.

Design parity: the same fetch-task→shard-actor topology as the crawl
frontier (state/pqueue.ShardedFrontierQueue) — reference semantics from
crawler.py's per-site session bookkeeping, re-expressed for streams.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pyarrow as pa

from .. import runtime_env

SESSION_GAP_US = 1800 * 1_000_000  # 30 virtual minutes, as the batch op


def _empty_state() -> Tuple[np.ndarray, ...]:
    z = np.empty(0, np.int64)
    return z.copy(), z.copy(), z.copy(), z.copy()


class _ShardState:
    """Per-shard open-session state + vectorized micro-batch update.

    Plain object (not itself an actor) so the same code drives both the
    Ray actor wrapper and in-process tests.
    """

    def __init__(self, gap_us: int = SESSION_GAP_US) -> None:
        self.gap_us = gap_us
        # sorted by uid; last_ts of the OPEN session, running counters
        self.uids, self.last_ts, self.n_events, self.n_sessions = \
            _empty_state()

    def ingest(self, uids: np.ndarray, ts_us: np.ndarray) -> None:
        """Fold one event-time-ordered micro-batch into the state."""
        if len(uids) == 0:
            return
        order = np.lexsort((ts_us, uids))
        u, t = uids[order], ts_us[order]
        # in-batch session starts (same kernel as the batch operator)
        new_sess = np.ones(len(u), np.int64)
        if len(u) > 1:
            cont = (u[1:] == u[:-1]) & ((t[1:] - t[:-1]) <= self.gap_us)
            new_sess[1:] = (~cont).astype(np.int64)
        heads = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
        run_ev = np.add.reduceat(np.ones(len(u), np.int64), heads)
        run_sess = np.add.reduceat(new_sess, heads)
        run_uid = u[heads]
        run_last = t[np.concatenate([heads[1:] - 1, [len(u) - 1]])]
        run_first = t[heads]

        # stitch run heads onto stored open sessions
        pos = np.searchsorted(self.uids, run_uid)
        pos_c = np.minimum(pos, max(len(self.uids) - 1, 0))
        if len(self.uids):
            seen = self.uids[pos_c] == run_uid
            cont = seen & ((run_first - self.last_ts[pos_c]) <= self.gap_us)
        else:
            seen = np.zeros(len(run_uid), bool)
            cont = seen
        # a continuing head merges its first session with the open one
        run_sess = run_sess - cont.astype(np.int64)

        # update existing users in place
        upd = np.flatnonzero(seen)
        if len(upd):
            tgt = pos_c[upd]
            self.last_ts[tgt] = run_last[upd]
            self.n_events[tgt] += run_ev[upd]
            self.n_sessions[tgt] += run_sess[upd]
        # merge new users (sorted insert)
        new = np.flatnonzero(~seen)
        if len(new):
            ins = pos[new]
            self.uids = np.insert(self.uids, ins, run_uid[new])
            self.last_ts = np.insert(self.last_ts, ins, run_last[new])
            self.n_events = np.insert(self.n_events, ins, run_ev[new])
            self.n_sessions = np.insert(self.n_sessions, ins,
                                        run_sess[new])

    def evict(self, watermark_us: int) -> pa.Table:
        """Emit and drop every user whose open session is CLOSED by the
        watermark (last_ts + gap < watermark) — exact for gap
        sessionization: no future event can extend those sessions."""
        closed = (self.last_ts + self.gap_us) < watermark_us
        out = pa.table({
            "user_id": pa.array(self.uids[closed], pa.int64()),
            "n_events": pa.array(self.n_events[closed], pa.int64()),
            "n_sessions": pa.array(self.n_sessions[closed], pa.int64()),
        })
        keep = ~closed
        self.uids, self.last_ts = self.uids[keep], self.last_ts[keep]
        self.n_events, self.n_sessions = (self.n_events[keep],
                                          self.n_sessions[keep])
        return out

    def finalize(self) -> pa.Table:
        return self.evict(np.iinfo(np.int64).max)

    def state_rows(self) -> int:
        return len(self.uids)


def streaming_sessionize(ds, gap_us: int = SESSION_GAP_US,
                         n_shards: int = 4, micro_batch: int = 32768,
                         evict_every: int = 4,
                         return_stats: bool = False):
    """Run gap sessionization as a micro-batched stream over ``ds``
    (columns ``user_id``, ``ts``) and return a Dataset of
    (user_id, n_events, n_sessions) — bit-equal to the batch operator.

    The event-time-ordered stream is simulated with ONE ``sort("ts")``;
    each micro-batch is hash-routed to shard actors; every
    ``evict_every`` chunks the watermark advances and each shard evicts
    its closed users, so emitted partials leave actor memory
    continuously and per-shard state tracks only OPEN sessions
    (eviction frequency trades RPC rounds against state peak —
    correctness is cadence-independent).  The final table is the
    grouped sum of partials — eviction can split a user only at a >gap
    boundary, where session counts are additive by construction.
    """
    import ray

    from .. import runtime_env
    from .agg import grouped_agg

    Shard = ray.remote(num_cpus=0.5, runtime_env=runtime_env())(_ShardState)
    shards: List = [Shard.remote(gap_us) for _ in range(n_shards)]
    # emitted partials are held as OBJECT REFS, never materialized on
    # the driver — actor returns live in the (spillable) object store,
    # so total emitted volume is bounded by cluster memory, not driver
    # heap
    emitted: List = []
    max_state = 0

    stream = ds.sort("ts")
    for i, chunk in enumerate(stream.iter_batches(batch_size=micro_batch,
                                                  batch_format="pyarrow")):
        if chunk.num_rows == 0:
            continue
        uids = chunk.column("user_id").combine_chunks().to_numpy(
            zero_copy_only=False)
        ts_col = chunk.column("ts")
        if isinstance(ts_col, pa.ChunkedArray):
            ts_col = ts_col.combine_chunks()
        ts_us = ts_col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        sh = (uids % np.int64(n_shards)).astype(np.int64)
        pend = [shards[s].ingest.remote(uids[sh == s], ts_us[sh == s])
                for s in range(n_shards) if np.any(sh == s)]
        ray.get(pend)
        if (i + 1) % evict_every:
            continue
        # watermark = max event time seen (ordered stream ⇒ monotone)
        wm = int(ts_us.max())
        emitted.extend(s.evict.remote(wm) for s in shards)
        if return_stats:  # stats barrier only when the caller wants them
            max_state = max(max_state,
                            sum(ray.get([s.state_rows.remote()
                                         for s in shards])))

    emitted.extend(s.finalize.remote() for s in shards)
    ray.wait(emitted, num_returns=len(emitted))
    for s in shards:
        ray.kill(s)
    partials = ray.data.from_arrow_refs(emitted)
    out = grouped_agg(partials, ["user_id"],
                      [("n_events", "n_events", "sum"),
                       ("n_sessions", "n_sessions", "sum")])
    if return_stats:
        stats = {"max_open_state_rows": max_state,
                 "emitted_partials": len(emitted)}
        return out, stats
    return out


# ── streaming heavy hitters (token-partitioned Misra–Gries shards) ───────────


class _MGShardState:
    """Per-shard bounded Misra–Gries summary over ITS hash-partition of
    the token space.  Because tokens are hash-routed, a shard sees EVERY
    occurrence of its tokens, so its (est, dec) pair carries the full MG
    guarantee for those tokens: ``est ≤ true ≤ est + dec`` for held
    tokens, ``true ≤ dec`` for dropped ones — state is ≤ k counters
    regardless of stream length."""

    def __init__(self, k: int = 256) -> None:
        self.k = int(k)
        self.toks = np.empty(0, dtype=object)
        self.cnts = np.empty(0, np.int64)
        self.dec = 0
        self.w = 0

    def ingest(self, tokens: np.ndarray, counts: np.ndarray) -> None:
        from .sketch import mg_prune

        if not len(tokens):
            return
        self.w += int(counts.sum())
        allt = np.concatenate([self.toks, tokens])
        allc = np.concatenate([self.cnts, counts])
        uniq, inv = np.unique(allt, return_inverse=True)
        summed = np.zeros(len(uniq), np.int64)
        np.add.at(summed, inv, allc)
        t, c, d = mg_prune(uniq, summed, self.k)
        self.toks, self.cnts = t, c
        self.dec += d

    def state_rows(self) -> int:
        return len(self.toks)

    def finalize(self) -> pa.Table:
        return pa.table({
            "token": pa.array(self.toks.tolist(), pa.string()),
            "est_n": pa.array(self.cnts, pa.int64()),
            "err_ub": pa.array(np.full(len(self.toks), self.dec,
                                       np.int64), pa.int64()),
        })


def streaming_topk(ds, text_column: str = "text", top_n: int = 50,
                   k_per_shard: int = 256, n_shards: int = 4,
                   micro_batch: int = 4096, return_stats: bool = False):
    """Streaming heavy-hitter tokens over a document stream: micro-batch
    tokenize → per-batch local ``np.unique`` collapse → hash-route each
    token to its Misra–Gries shard actor → final union of the (disjoint)
    shard summaries, globally top-``top_n`` by estimate.

    The batch twin is ``sketch.mg_topk`` (heavy_tokens_mg); this is the
    arrival-order formulation with per-shard state bounded at
    ``k_per_shard`` counters no matter how long the stream runs — the
    trending-vocabulary monitor a crawl pipeline keeps alive
    continuously.  Token-partitioning makes the per-shard error bound
    per-token exact: ``est ≤ true ≤ est + err_ub`` for every emitted
    token, ``true ≤ err_ub(shard(t))`` for absent ones."""
    import ray

    from .sketch import _hash64

    from .textops import WORD_RE

    Shard = ray.remote(num_cpus=0.5, runtime_env=runtime_env())(_MGShardState)
    shards: List = [Shard.remote(k_per_shard) for _ in range(n_shards)]
    max_state = 0

    for chunk in ds.iter_batches(batch_size=micro_batch,
                                 batch_format="pyarrow"):
        texts = chunk.column(text_column).to_pylist()
        toks: List[str] = []
        for t in texts:
            toks.extend(WORD_RE.findall((t or "").lower()))
        if not toks:
            continue
        uniq, cnt = np.unique(np.asarray(toks, dtype=object),
                              return_counts=True)
        sh = (_hash64(uniq.tolist()) % np.uint64(n_shards)).astype(np.int64)
        pend = [shards[s].ingest.remote(uniq[sh == s],
                                        cnt[sh == s].astype(np.int64))
                for s in range(n_shards) if np.any(sh == s)]
        ray.get(pend)
        if return_stats:  # per-micro-batch actor barrier only when asked
            max_state = max(max_state,
                            sum(ray.get([s.state_rows.remote()
                                         for s in shards])))

    parts = [s.finalize.remote() for s in shards]
    ray.wait(parts, num_returns=len(parts))
    for s in shards:
        ray.kill(s)
    merged = pa.concat_tables(ray.get(parts))
    out = merged.sort_by([("est_n", "descending"),
                          ("token", "ascending")]).slice(0, top_n)
    if return_stats:
        return out, {"max_state_rows": max_state}
    return out


class _DedupShardState:
    """Exact seen-set shard over ITS hash-partition of the content-hash
    space.  Because hashes are hash-routed, a shard sees EVERY
    occurrence of its hashes, and the driver barriers micro-batches in
    stream order — so the accepted set is EXACTLY the stream-order
    first occurrences (exactly-once emission per distinct content).
    State is a sorted string array, O(distinct-on-shard) — exact
    dedup's inherent floor (the BOUNDED alternative is the Bloom
    novelty screen, ``functions.bloom``, which trades exactness for a
    constant-size bitmap + verification pass)."""

    def __init__(self) -> None:
        self.seen = np.empty(0, dtype=object)

    def ingest(self, hashes: np.ndarray, ids: np.ndarray) -> pa.Table:
        # within-batch first occurrence: np.unique's return_index is the
        # SMALLEST index per value — stream order makes that the winner
        uniq, first = np.unique(hashes, return_index=True)
        if len(self.seen):
            pos = np.searchsorted(self.seen, uniq)
            pos_c = np.minimum(pos, len(self.seen) - 1)
            new = self.seen[pos_c] != uniq
        else:
            pos = np.zeros(len(uniq), np.int64)
            new = np.ones(len(uniq), bool)
        acc_h, acc_i = uniq[new], ids[first][new]
        # O(n) sorted-merge insert (acc_h is sorted; pos nondecreasing)
        self.seen = np.insert(self.seen, pos[new], acc_h)
        return pa.table({
            "content_hash": pa.array(acc_h.tolist(), pa.string()),
            "doc_id": pa.array(acc_i, pa.int64()),
        })

    def state_rows(self) -> int:
        return len(self.seen)

    def snapshot(self) -> list:
        """Checkpoint: the shard's full state is its sorted seen-hash
        array — returning it IS the exactly-once resume token (state
        is deterministic given the prefix of the stream processed)."""
        return self.seen.tolist()

    def restore(self, seen: list) -> None:
        self.seen = np.asarray(seen, dtype=object)


def streaming_dedup(ds, id_column: str = "doc_id",
                    text_column: str = "text", n_shards: int = 4,
                    micro_batch: int = 4096, return_stats: bool = False,
                    resume_from: list | None = None,
                    return_state: bool = False):
    """Streaming exact content dedup: the arrival-order twin of
    ``dedup.exact_dedup_ids`` — emit each distinct content's FIRST
    stream occurrence as ``(content_hash, doc_id)`` rows, continuously,
    with per-shard state = its partition's distinct hashes.  On a
    stream ordered by id, the emitted set is bit-equal to the batch
    keep-min-id answer (shared SQL oracle), while an unordered stream
    still yields exactly-once first-arrival semantics — the live-crawl
    formulation of the reference's global content-hash seen set
    (crawler.py:184-191).

    Topology: micro-batch → per-batch ``content_hash_hex`` → hash-route
    each hash to its seen-set shard actor (a shard sees every
    occurrence of its hashes; the driver barriers per micro-batch so
    stream order is preserved) → accepted rows flow back incrementally
    and concatenate in stream order."""
    import ray

    from .dedup import add_content_hash
    from .sketch import _hash64

    Shard = ray.remote(num_cpus=0.5, runtime_env=runtime_env())(_DedupShardState)
    shards: List = [Shard.remote() for _ in range(n_shards)]
    if resume_from is not None:
        # exactly-once resume: restore each shard's seen-set checkpoint
        # BEFORE any batch flows — re-arrivals of already-emitted
        # content are then rejected exactly as in the original run
        assert len(resume_from) == n_shards, "snapshot/shard mismatch"
        ray.get([s.restore.remote(snap)
                 for s, snap in zip(shards, resume_from)])
    accepted: List[pa.Table] = []
    max_state = 0

    for chunk in ds.iter_batches(batch_size=micro_batch,
                                 batch_format="pyarrow"):
        if chunk.num_rows == 0:
            continue
        hashed = add_content_hash(chunk, text_column)
        h = np.asarray(hashed.column("content_hash").to_pylist(),
                       dtype=object)
        ids = hashed.column(id_column).combine_chunks().to_numpy(
            zero_copy_only=False)
        sh = (_hash64(h.tolist()) % np.uint64(n_shards)).astype(np.int64)
        pend = [shards[s].ingest.remote(h[sh == s], ids[sh == s])
                for s in range(n_shards) if np.any(sh == s)]
        accepted.extend(ray.get(pend))   # per-micro-batch barrier
        if return_stats:
            max_state = max(max_state,
                            sum(ray.get([s.state_rows.remote()
                                         for s in shards])))

    state = (ray.get([s.snapshot.remote() for s in shards])
             if return_state else None)
    for s in shards:
        ray.kill(s)
    out = (pa.concat_tables(accepted) if accepted
           else pa.table({"content_hash": pa.array([], pa.string()),
                          "doc_id": pa.array([], pa.int64())}))
    extras = ()
    if return_stats:
        extras += ({"state_rows": max_state},)
    if return_state:
        extras += (state,)
    return (out, *extras) if extras else out


class _IvShardState:
    """Open view-WINDOW state for a streaming interval join shard:
    arrays sorted by user.  On an event-time-ordered stream every view
    whose window could contain a click arrives BEFORE that click (a
    window opens at the view's own event ts), so clicks never buffer —
    a batch ingests its views first, then matches its clicks against
    the predicate ``start ≤ ts < end`` (a same-batch view with a later
    start simply fails the predicate).  Watermark eviction is exactly
    correct: once the watermark (max seen ts; the stream is ordered)
    reaches ``end``, no future click can satisfy ``ts < end``."""

    def __init__(self) -> None:
        z = np.empty(0, np.int64)
        self.user, self.vid = z.copy(), z.copy()
        self.start, self.end = z.copy(), z.copy()

    def ingest(self, vu, vi, vs, ve, cu, ci, ct, watermark: int):
        if len(vu):
            pos = np.searchsorted(self.user, vu)
            self.user = np.insert(self.user, pos, vu)
            self.vid = np.insert(self.vid, pos, vi)
            self.start = np.insert(self.start, pos, vs)
            self.end = np.insert(self.end, pos, ve)
        if len(cu):
            lo = np.searchsorted(self.user, cu, "left")
            hi = np.searchsorted(self.user, cu, "right")
            cnt = hi - lo
            total = int(cnt.sum())
            if total:
                base = np.repeat(lo, cnt)
                offs = np.arange(total) - np.repeat(
                    np.cumsum(cnt) - cnt, cnt)
                idx = base + offs
                cli = np.repeat(np.arange(len(cu)), cnt)
                ok = ((self.start[idx] <= ct[cli])
                      & (ct[cli] < self.end[idx]))
                idx, cli = idx[ok], cli[ok]
            else:
                idx = cli = np.empty(0, np.int64)
            out = pa.table({
                "event_id": pa.array(ci[cli], pa.int64()),
                "user_id": pa.array(cu[cli], pa.int64()),
                "ts": pa.array(ct[cli], pa.int64()),
                "view_id": pa.array(self.vid[idx], pa.int64()),
                "view_start": pa.array(self.start[idx], pa.int64()),
                "view_end": pa.array(self.end[idx], pa.int64()),
            })
        else:
            out = pa.table({
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.int64()),
                "view_id": pa.array([], pa.int64()),
                "view_start": pa.array([], pa.int64()),
                "view_end": pa.array([], pa.int64()),
            })
        keep = self.end > watermark  # ts < end can never hold again
        if not keep.all():
            self.user, self.vid = self.user[keep], self.vid[keep]
            self.start, self.end = self.start[keep], self.end[keep]
        return out

    def state_rows(self) -> int:
        return len(self.user)


def streaming_interval_join(ds, window_fn, n_shards: int = 4,
                            micro_batch: int = 65536,
                            return_stats: bool = False):
    """Streaming interval (range) join — the arrival-order twin of
    ``functions.interval.interval_join``: an event-time-ordered stream
    of rows is split per micro-batch by ``window_fn(batch) → (views,
    clicks)`` where views carry ``(user_id, view_id, view_start,
    view_end)`` int64 µs columns and clicks ``(user_id, event_id,
    ts)``; each click is emitted joined to EVERY open window of its
    user containing it, continuously, with per-shard state bounded by
    the windows still open under the watermark (max window span of
    data, never the stream length).  On an ordered stream the emitted
    set is row-identical to the batch interval join (shared SQL
    oracle — the batch/stream plan-equivalence contract).

    Topology is the streaming_dedup one: hash-route by user to shard
    actors, per-micro-batch barrier preserving stream order, matched
    rows flowing back incrementally."""
    import ray

    from ..sinks import _shard_of

    Shard = ray.remote(num_cpus=0.5, runtime_env=runtime_env())(_IvShardState)
    shards: List = [Shard.remote() for _ in range(n_shards)]
    out: List[pa.Table] = []
    max_state = 0

    for chunk in _ts_aligned_batches(ds, micro_batch):
        views, clicks = window_fn(chunk)
        vu = views.column("user_id").to_numpy(zero_copy_only=False)
        vi = views.column("view_id").to_numpy(zero_copy_only=False)
        vs = views.column("view_start").to_numpy(zero_copy_only=False)
        ve = views.column("view_end").to_numpy(zero_copy_only=False)
        cu = clicks.column("user_id").to_numpy(zero_copy_only=False)
        ci = clicks.column("event_id").to_numpy(zero_copy_only=False)
        ct = clicks.column("ts").to_numpy(zero_copy_only=False)
        wm = int(max(vs.max() if len(vs) else -2**62,
                     ct.max() if len(ct) else -2**62))
        vsh = _shard_of(vu, n_shards)
        csh = _shard_of(cu, n_shards)
        vo = np.argsort(vu, kind="stable")  # insert order: sorted users
        vu, vi, vs, ve = vu[vo], vi[vo], vs[vo], ve[vo]
        vsh = vsh[vo]
        pend = []
        for s in range(n_shards):
            vm, cm = vsh == s, csh == s
            # every shard sees every watermark (an empty ingest costs
            # one RPC inside the existing barrier): an idle shard must
            # still evict expired windows, or the documented peak-state
            # bound loosens on skewed streams
            pend.append(shards[s].ingest.remote(
                vu[vm], vi[vm], vs[vm], ve[vm],
                cu[cm], ci[cm], ct[cm], wm))
        out.extend(ray.get(pend))        # per-micro-batch barrier
        if return_stats:
            max_state = max(max_state,
                            sum(ray.get([s.state_rows.remote()
                                         for s in shards])))

    for s in shards:
        ray.kill(s)
    res = (pa.concat_tables(out) if out else pa.table({
        "event_id": pa.array([], pa.int64()),
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.int64()),
        "view_id": pa.array([], pa.int64()),
        "view_start": pa.array([], pa.int64()),
        "view_end": pa.array([], pa.int64()),
    }))
    if return_stats:
        return res, {"state_rows": max_state}
    return res


class _AsofShardState:
    """Latest-view-per-user state for a streaming BACKWARD as-of join:
    two sorted-by-user arrays (user, last view ts).  On an event-time-
    ordered stream every view at-or-before a click arrived in an
    earlier batch (→ the state row) or earlier in THIS batch — the
    in-batch candidate is found with a fully vectorized rebased-key
    searchsorted (rank(user)·SPAN + (ts − base): one composite int64
    key per row, overflow asserted), and since batch views are never
    older than state views, the in-batch candidate wins whenever it
    exists.  State is one row per user ever seen — the as-of join's
    inherent floor (no window ⇒ no eviction), same class as streaming
    dedup's distinct-hash state."""

    def __init__(self) -> None:
        self.user = np.empty(0, np.int64)
        self.last = np.empty(0, np.int64)

    def ingest(self, vu, vt, cu, ci, ct):
        out_i, out_u, out_p = [], [], []
        if len(cu):
            # candidate from THIS batch's views (vu sorted, vt within)
            cand = np.full(len(cu), np.int64(-(2 ** 62)))
            have = np.zeros(len(cu), bool)
            if len(vu):
                uniq = np.unique(vu)
                vrank = np.searchsorted(uniq, vu)
                crank = np.searchsorted(uniq, cu)
                crank_c = np.minimum(crank, len(uniq) - 1)
                known = uniq[crank_c] == cu
                base = min(int(vt.min()), int(ct.min()))
                span = max(int(vt.max()), int(ct.max())) - base + 2
                assert (len(uniq)) * span < 2 ** 62, "rebase overflow"
                vkey = vrank * span + (vt - base) + 1
                ckey = crank_c * span + (ct - base) + 1
                pos = np.searchsorted(vkey, ckey, "right") - 1
                ok = known & (pos >= 0)
                pos_c = np.maximum(pos, 0)
                ok &= vrank[pos_c] == crank_c
                cand[ok] = vt[pos_c[ok]]
                have |= ok
            # fall back to the state row (always ≤ any current ts)
            if len(self.user):
                sp = np.searchsorted(self.user, cu)
                sp_c = np.minimum(sp, len(self.user) - 1)
                s_ok = (self.user[sp_c] == cu) & ~have
                cand[s_ok] = self.last[sp_c[s_ok]]
                have |= s_ok
            out_i = ci[have]
            out_u = cu[have]
            out_p = cand[have]
            out_g = ct[have] - cand[have]
        else:
            out_i = out_u = out_p = out_g = np.empty(0, np.int64)
        # state update: last view per user in this batch replaces/joins
        if len(vu):
            u_last, idx_last = np.unique(vu[::-1], return_index=True)
            t_last = vt[::-1][idx_last]  # last occurrence = max ts/user
            pos = np.searchsorted(self.user, u_last)
            if len(self.user):
                pos_c = np.minimum(pos, len(self.user) - 1)
                exists = self.user[pos_c] == u_last
            else:
                pos_c = pos
                exists = np.zeros(len(u_last), bool)
            if np.any(exists):
                self.last[pos_c[exists]] = t_last[exists]
            new = ~exists
            if np.any(new):
                self.user = np.insert(self.user, pos[new], u_last[new])
                self.last = np.insert(self.last, pos[new], t_last[new])
        return pa.table({
            "event_id": pa.array(np.asarray(out_i, np.int64)),
            "user_id": pa.array(np.asarray(out_u, np.int64)),
            "prev_view_ts": pa.array(np.asarray(out_p, np.int64)),
            "gap_us": pa.array(np.asarray(out_g, np.int64)),
        })

    def state_rows(self) -> int:
        return len(self.user)


def streaming_asof_join(ds, split_fn, n_shards: int = 4,
                        micro_batch: int = 65536,
                        return_stats: bool = False):
    """Streaming backward as-of join — the arrival-order twin of
    ``functions.asof.asof_join``: each click emitted with its user's
    most recent view at-or-before it, continuously.  ``split_fn(batch)
    → (views, clicks)`` with views ``(user_id, ts)`` and clicks
    ``(user_id, event_id, ts)`` int64 µs columns; the stream must be
    event-time ordered.  Emitted rows are identical to the batch as-of
    join (shared SQL oracle).  State: ONE (user, last ts) row per user
    per shard — the operator's inherent floor; no window, no
    eviction."""
    import ray

    from ..sinks import _shard_of

    Shard = ray.remote(num_cpus=0.5, runtime_env=runtime_env())(_AsofShardState)
    shards: List = [Shard.remote() for _ in range(n_shards)]
    out: List[pa.Table] = []
    max_state = 0

    for chunk in _ts_aligned_batches(ds, micro_batch):
        views, clicks = split_fn(chunk)
        vu = views.column("user_id").to_numpy(zero_copy_only=False)
        vt = views.column("ts").to_numpy(zero_copy_only=False)
        cu = clicks.column("user_id").to_numpy(zero_copy_only=False)
        ci = clicks.column("event_id").to_numpy(zero_copy_only=False)
        ct = clicks.column("ts").to_numpy(zero_copy_only=False)
        vo = np.lexsort((vt, vu))  # per-shard slices stay (user, ts)-sorted
        vu, vt = vu[vo], vt[vo]
        vsh = _shard_of(vu, n_shards)
        csh = _shard_of(cu, n_shards)
        pend = []
        for s in range(n_shards):
            vm, cm = vsh == s, csh == s
            if vm.any() or cm.any():
                pend.append(shards[s].ingest.remote(
                    vu[vm], vt[vm], cu[cm], ci[cm], ct[cm]))
        out.extend(ray.get(pend))      # per-micro-batch barrier
        if return_stats:
            max_state = max(max_state,
                            sum(ray.get([s.state_rows.remote()
                                         for s in shards])))

    for s in shards:
        ray.kill(s)
    res = (pa.concat_tables(out) if out else pa.table({
        "event_id": pa.array([], pa.int64()),
        "user_id": pa.array([], pa.int64()),
        "prev_view_ts": pa.array([], pa.int64()),
        "gap_us": pa.array([], pa.int64()),
    }))
    if return_stats:
        return res, {"state_rows": max_state}
    return res


def _ts_aligned_batches(ds, micro_batch: int, ts_col: str = "ts"):
    """Micro-batches that never split an event-time TIE across a
    boundary: rows sharing the boundary timestamp are carried into the
    next batch, so inclusive predicates (``view.ts ≤ click.ts``) see
    tied rows together — otherwise a view tied with a click but landing
    one batch later is silently missed by both streaming joins.  A tie
    run longer than the batch size flushes whole (correctness first;
    the stream contract makes monster tie runs a data bug — and a tie
    run that SPANS a whole-chunk flush raises rather than silently
    dropping inclusive-predicate matches)."""
    import pyarrow.compute as pc

    carry = None
    flushed_tie = None   # ts of a tie run flushed whole last chunk
    for chunk in ds.iter_batches(batch_size=micro_batch,
                                 batch_format="pyarrow"):
        if chunk.num_rows == 0:
            continue
        if carry is not None:
            chunk = pa.concat_tables([carry, chunk])
            carry = None
        ts = chunk.column(ts_col)
        if flushed_tie is not None:
            if ts[0].as_py() == flushed_tie:
                raise ValueError(
                    f"_ts_aligned_batches: event-time tie at "
                    f"{ts_col}={flushed_tie} exceeds the micro-batch "
                    f"size ({micro_batch}) and was already flushed — "
                    "tied rows would be split across micro-batches, "
                    "silently losing inclusive-predicate join matches; "
                    "raise micro_batch above the largest tie run"
                )
            flushed_tie = None
        last = ts[chunk.num_rows - 1]
        first_of_tie = pc.index(ts, last).as_py()
        if first_of_tie > 0:
            carry = chunk.slice(first_of_tie)
            chunk = chunk.slice(0, first_of_tie)
        else:
            # the whole chunk is one tie run: flush it whole, but fail
            # loudly if the same timestamp continues into the next chunk
            flushed_tie = last.as_py()
        if chunk.num_rows:
            yield chunk
    if carry is not None and carry.num_rows:
        yield carry


US_PER_HOUR = 3_600_000_000
MS_PER_HOUR = 3_600_000


class _WindowShardState:
    """Open window aggregates for one streaming shard:
    {(event_type, window_start_ms): [n, cents]}.  On an event-time-
    ordered stream a window closes as soon as the watermark reaches
    its end (an event AT the boundary belongs to the next window, so
    ``window_end ≤ watermark`` can never lose a row) — each
    (type, window) lives on exactly one shard and is emitted exactly
    once; state is bounded by types × concurrently-open windows
    (1 for tumbling, window/hop for hopping), never stream length.
    Parametric over the window length, the output key name and
    whether a cents sum rides along (tumbling carries it, the hopping
    count twin does not)."""

    def __init__(self, window_ms: int = MS_PER_HOUR,
                 key_name: str = "hour_ms",
                 with_cents: bool = True) -> None:
        self.window_ms = window_ms
        self.key_name = key_name
        self.with_cents = with_cents
        self.open: dict = {}

    def ingest(self, types, wins, ns, cents, watermark_us: int):
        if cents is None:
            cents = [0] * len(ns)
        for t, h, n, c in zip(types, wins, ns, cents):
            key = (t, int(h))
            acc = self.open.get(key)
            if acc is None:
                self.open[key] = [int(n), int(c)]
            else:
                acc[0] += int(n)
                acc[1] += int(c)
        closed = [k for k in self.open
                  if (k[1] + self.window_ms) * 1000 <= watermark_us]
        return self._emit(closed)

    def flush(self):
        return self._emit(sorted(self.open))

    def _emit(self, keys) -> pa.Table:
        rows = [(k, self.open.pop(k)) for k in keys]
        out = {
            self.key_name: pa.array([k[1] for k, _ in rows],
                                    pa.int64()),
            "event_type": pa.array([k[0] for k, _ in rows],
                                   pa.string()),
            "n_events": pa.array([a[0] for _, a in rows], pa.int64()),
        }
        if self.with_cents:
            out["total_cents"] = pa.array(
                [a[1] for _, a in rows], pa.int64())
        return pa.table(out)

    def state_rows(self) -> int:
        return len(self.open)


# backward-compatible alias (the tumbling twin's original name)
_TumblingShardState = _WindowShardState


def streaming_tumbling_agg(ds, n_shards: int = 4,
                           micro_batch: int = 65536,
                           return_stats: bool = False):
    """Streaming TUMBLING-WINDOW aggregate — the arrival-order twin of
    the batch hourly rollup (events per (hour, type) with integer
    cents): each micro-batch is pre-aggregated to (type, hour)
    partials IN the batch (one vectorized ``pyarrow`` group-by — the
    combiner discipline applied to a stream: shard RPCs carry window
    partials, never rows), partials hash-route by event type to shard
    actors, and the advancing watermark closes finished windows
    continuously — per-shard state is the OPEN windows only (types ×
    ~1 open hour on an ordered stream, never stream length).  Every
    shard sees every watermark (empty ingests included — the
    idle-shard eviction lesson from the interval join).

    On an event-time-ordered stream the emitted windows are exactly
    the batch aggregate's rows (shared SQL oracle — the batch/stream
    plan-equivalence contract; window assignment at the boundary is
    half-open, so ties never straddle a window).  ``ds`` needs
    columns (ts, event_type, value).  Returns a Dataset sorted by
    (hour_ms, event_type); with ``return_stats``, also
    {"state_rows": peak open windows}."""
    import ray

    from .. import runtime_env
    from ..urlops import url_hash64
    from .agg import grouped_agg

    Shard = ray.remote(num_cpus=0.5, runtime_env=runtime_env())(_TumblingShardState)
    shards: List = [Shard.remote() for _ in range(n_shards)]
    emitted: List = []
    max_state = 0

    stream = ds.sort("ts")
    for chunk in stream.iter_batches(batch_size=micro_batch,
                                     batch_format="pyarrow"):
        if chunk.num_rows == 0:
            continue
        ts = chunk.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        us = ts.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        vals = chunk.column("value").to_numpy(zero_copy_only=False)
        part = pa.table({
            "event_type": chunk.column("event_type"),
            "hour_ms": pa.array(
                (us // US_PER_HOUR) * MS_PER_HOUR, pa.int64()),
            "n": pa.array(np.ones(len(us), np.int64), pa.int64()),
            "cents": pa.array(
                np.floor(vals * 100.0).astype(np.int64), pa.int64()),
        }).group_by(["event_type", "hour_ms"]).aggregate(
            [("n", "sum"), ("cents", "sum")])
        types = part.column("event_type").to_pylist()
        hours = part.column("hour_ms").to_numpy(zero_copy_only=False)
        ns = part.column("n_sum").to_numpy(zero_copy_only=False)
        cs = part.column("cents_sum").to_numpy(zero_copy_only=False)
        sh = np.array([url_hash64(t) % n_shards for t in types],
                      np.int64)
        wm = int(us.max())
        pend = []
        for s in range(n_shards):
            m = sh == s
            # every shard sees every watermark: idle shards must still
            # close their finished windows
            pend.append(shards[s].ingest.remote(
                [t for t, k in zip(types, m) if k],
                hours[m], ns[m], cs[m], wm))
        emitted.extend(pend)
        if return_stats:
            max_state = max(max_state,
                            sum(ray.get([s.state_rows.remote()
                                         for s in shards])))

    emitted.extend([s.flush.remote() for s in shards])
    tables = [t for t in ray.get(emitted) if t.num_rows]
    for s in shards:
        ray.kill(s)
    if not tables:
        out = ray.data.from_arrow(pa.table({
            "hour_ms": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
            "n_events": pa.array([], pa.int64()),
            "total_cents": pa.array([], pa.int64()),
        }))
    else:
        # windows close exactly once, but the final grouped sum makes
        # the result robust to any emission split and returns the
        # canonical sorted shape in one step
        out = grouped_agg(
            ray.data.from_arrow(tables),
            ["hour_ms", "event_type"],
            [("n_events", "n_events", "sum"),
             ("total_cents", "total_cents", "sum")],
        )
    if return_stats:
        return out, {"state_rows": max_state}
    return out


def streaming_hopping_agg(ds, window_ms: int, hop_ms: int,
                          n_shards: int = 4, micro_batch: int = 65536,
                          return_stats: bool = False):
    """Streaming HOPPING-window count — the arrival-order twin of the
    batch overlapping-window aggregate: each event expands to its
    ``window_ms / hop_ms`` overlapping windows INSIDE the micro-batch
    (vectorized repeat/tile, exactly the batch operator's flat-map),
    partials collapse to (type, window) rows with one vectorized
    group-by, route by type to shard actors, and the watermark closes
    each window at its end — per-shard state is the open windows only
    (types × window/hop concurrently-open, never stream length).
    Every shard sees every watermark (idle-shard eviction lesson).

    Emitted rows equal the batch aggregate exactly on an event-time-
    ordered stream (shared SQL oracle).  ``ds`` needs columns
    (ts, event_type).  Returns a Dataset (win_ms, event_type,
    n_events) sorted by keys; with ``return_stats`` also
    {"state_rows": peak}."""
    import ray

    from ..urlops import url_hash64
    from .agg import grouped_agg

    assert window_ms % hop_ms == 0, "window must be a hop multiple"
    k_hops = window_ms // hop_ms
    Shard = ray.remote(num_cpus=0.5, runtime_env=runtime_env())(_WindowShardState)
    shards: List = [Shard.remote(window_ms, "win_ms", False)
                    for _ in range(n_shards)]
    emitted: List = []
    max_state = 0

    stream = ds.sort("ts")
    for chunk in stream.iter_batches(batch_size=micro_batch,
                                     batch_format="pyarrow"):
        if chunk.num_rows == 0:
            continue
        ts = chunk.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        us = ts.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        n = len(us)
        hop_idx = us // (hop_ms * 1000)
        ks = np.tile(np.arange(k_hops, dtype=np.int64), n)
        win_ms = (np.repeat(hop_idx, k_hops) - ks) * hop_ms
        etypes = chunk.column("event_type").combine_chunks()
        part = pa.table({
            "event_type": etypes.take(
                pa.array(np.repeat(np.arange(n), k_hops))),
            "win_ms": pa.array(win_ms, pa.int64()),
            "n": pa.array(np.ones(n * k_hops, np.int64), pa.int64()),
        }).group_by(["event_type", "win_ms"]).aggregate([("n", "sum")])
        types = part.column("event_type").to_pylist()
        wins = part.column("win_ms").to_numpy(zero_copy_only=False)
        ns = part.column("n_sum").to_numpy(zero_copy_only=False)
        sh = np.array([url_hash64(t) % n_shards for t in types],
                      np.int64)
        wm = int(us.max())
        pend = []
        for s in range(n_shards):
            m = sh == s
            pend.append(shards[s].ingest.remote(
                [t for t, keep in zip(types, m) if keep],
                wins[m], ns[m], None, wm))
        emitted.extend(pend)
        if return_stats:
            max_state = max(max_state,
                            sum(ray.get([s.state_rows.remote()
                                         for s in shards])))

    emitted.extend([s.flush.remote() for s in shards])
    tables = [t for t in ray.get(emitted) if t.num_rows]
    for s in shards:
        ray.kill(s)
    if not tables:
        out = ray.data.from_arrow(pa.table({
            "win_ms": pa.array([], pa.int64()),
            "event_type": pa.array([], pa.string()),
            "n_events": pa.array([], pa.int64()),
        }))
    else:
        out = grouped_agg(
            ray.data.from_arrow(tables), ["win_ms", "event_type"],
            [("n_events", "n_events", "sum")],
        )
    if return_stats:
        return out, {"state_rows": max_state}
    return out


class _DDRegisterShardState:
    """Disjoint DDSketch bucket-count registers for one streaming shard
    (buckets hash-route by id, so no bucket lives on two shards).  Each
    ingest folds a micro-batch's (bucket, count) partials in with one
    concatenate + unique + exact int64 scatter-add; state is bounded by
    the BUCKET DOMAIN (log_gamma(max/min) ≈ a few thousand rows
    regardless of stream length) — the one streaming twin that needs no
    watermark: registers never close, they just stay small."""

    def __init__(self) -> None:
        self.buckets = np.empty(0, np.int64)
        self.counts = np.empty(0, np.int64)

    def ingest(self, buckets: np.ndarray, counts: np.ndarray) -> int:
        if len(buckets):
            allb = np.concatenate([self.buckets, buckets])
            allc = np.concatenate([self.counts, counts])
            ub, inv = np.unique(allb, return_inverse=True)
            nc = np.zeros(len(ub), np.int64)
            np.add.at(nc, inv, allc)     # exact int64 (never bincount)
            self.buckets, self.counts = ub, nc
        return len(self.buckets)

    def state_rows(self) -> int:
        return len(self.buckets)

    def flush(self) -> pa.Table:
        return pa.table({
            "bucket": pa.array(self.buckets, pa.int64()),
            "n": pa.array(self.counts, pa.int64()),
        })


def streaming_dd_quantiles(ds, value_column: str, ps, alpha: float = 0.01,
                           n_shards: int = 4, micro_batch: int = 65536,
                           order_by: str | None = "ts",
                           return_stats: bool = False):
    """Streaming DDSketch quantiles — the arrival-order twin of the
    batch :func:`~deepwebharvester_ray.functions.sketch.dd_quantiles`:
    each micro-batch pre-aggregates to (bucket, count) partials IN the
    batch (np.unique — the combiner-on-a-stream discipline: shard RPCs
    carry register deltas, never rows), partials hash-route by BUCKET id
    to shard actors holding disjoint register subsets, and the final
    quantile walk merges the disjoint registers with one sort + cumsum.

    Register addition is commutative, so the emitted sketch — and the
    picked quantiles — are BIT-EQUAL to the batch operator's under ANY
    arrival order or micro-batch split (pinned in tests): plan
    equivalence holds without a watermark, because per-shard state is
    bounded by the bucket domain, not stream length.  ``order_by``
    sorts the stream simulation in event time like the other twins
    (pass None to consume raw block order — the answer is identical).
    Returns the same one-row {q_<p>} table as the batch op; with
    ``return_stats`` also {"state_rows": peak total registers}."""
    import ray

    from .sketch import dd_bucket_indices, dd_bucket_value

    Shard = ray.remote(num_cpus=0.5, runtime_env=runtime_env())(_DDRegisterShardState)
    shards: List = [Shard.remote() for _ in range(n_shards)]
    max_state = 0

    stream = ds.sort(order_by) if order_by else ds
    for chunk in stream.iter_batches(batch_size=micro_batch,
                                     batch_format="pyarrow"):
        if chunk.num_rows == 0:
            continue
        v = chunk.column(value_column).combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64)
        u, c = np.unique(dd_bucket_indices(v, alpha), return_counts=True)
        sh = u % n_shards                 # numpy mod: non-negative
        pend = []
        for s in range(n_shards):
            m = sh == s
            if m.any():
                pend.append(shards[s].ingest.remote(
                    u[m], c[m].astype(np.int64)))
        ray.get(pend)                     # per-micro-batch barrier
        if return_stats:
            max_state = max(max_state,
                            sum(ray.get([s.state_rows.remote()
                                         for s in shards])))

    tables = [t for t in ray.get([s.flush.remote() for s in shards])
              if t.num_rows]
    for s in shards:
        ray.kill(s)
    if tables:
        merged = pa.concat_tables(tables)
        buckets = merged.column("bucket").to_numpy(zero_copy_only=False)
        counts = merged.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(buckets, kind="stable")  # shards are disjoint
        buckets, counts = buckets[order], counts[order]
    else:
        buckets = np.empty(0, np.int64)
        counts = np.empty(0, np.int64)
    cum = np.cumsum(counts)
    total = cum[-1] if len(cum) else 0
    cols = {}
    for p in ps:
        if total == 0:
            cols[f"q_{p}"] = [float("nan")]
            continue
        i = int(np.searchsorted(cum, p * total, side="left"))
        i = min(i, len(buckets) - 1)
        cols[f"q_{p}"] = [float(dd_bucket_value(
            np.asarray([buckets[i]]), alpha)[0])]
    out = pa.table({k: pa.array(vv, pa.float64()) for k, vv in cols.items()})
    if return_stats:
        return out, {"state_rows": max_state}
    return out


class _MinKHashShardState:
    """k smallest (hash, id) pairs seen by one streaming shard — min-k
    of a set is arrival-order-free and mergeable, so state is k rows per
    shard FOREVER and the merged answer is bit-equal to the batch
    two-level partial-top-k plan (the sample_k operator)."""

    def __init__(self, k: int) -> None:
        self.k = k
        self.hv = np.empty(0, np.uint64)
        self.ids = np.empty(0, np.int64)

    def ingest(self, hv: np.ndarray, ids: np.ndarray) -> int:
        if len(hv):
            allh = np.concatenate([self.hv, hv])
            alli = np.concatenate([self.ids, ids])
            # distinct ids ⇒ distinct hashes (odd multiplier is a
            # bijection mod 2^64); the id tiebreak only guards dup rows
            order = np.lexsort((alli, allh))[:self.k]
            self.hv, self.ids = allh[order], alli[order]
        return len(self.hv)

    def state_rows(self) -> int:
        return len(self.hv)

    def flush(self) -> pa.Table:
        return pa.table({
            "hv": pa.array(self.hv, pa.uint64()),
            "doc_id": pa.array(self.ids, pa.int64()),
        })


def streaming_sample_k(ds, id_column: str = "doc_id", k: int = 100,
                       mult: int = 0x9E3779B97F4A7C15,
                       n_shards: int = 4, micro_batch: int = 65536,
                       return_stats: bool = False):
    """Streaming fixed-size uniform sample — the arrival-order twin of
    the batch k-smallest-multiplicative-hash sample (q_sample_k, SHARED
    SQL oracle): each micro-batch hashes its ids, pre-prunes to its own
    k smallest per shard route (combiner discipline: RPCs carry ≤ k
    rows), shard actors keep their local k smallest forever (min-k is
    order-free and mergeable — no watermark, state k·shards rows), and
    the final merge picks the global k.  Bit-equal to the batch sample
    under ANY arrival order, micro-batch split or shard count; the
    subset-chain-in-k property carries over unchanged.  Returns the
    sampled ids sorted ascending; with ``return_stats`` also
    {"state_rows": k·shards}."""
    import ray

    Shard = ray.remote(num_cpus=0.5, runtime_env=runtime_env())(_MinKHashShardState)
    shards: List = [Shard.remote(k) for _ in range(n_shards)]
    max_state = 0

    for chunk in ds.iter_batches(batch_size=micro_batch,
                                 batch_format="pyarrow"):
        if chunk.num_rows == 0:
            continue
        ids = chunk.column(id_column).combine_chunks().to_numpy(
            zero_copy_only=False)
        with np.errstate(over="ignore"):
            hv = ids.astype(np.uint64) * np.uint64(mult)
        sh = hv % np.uint64(n_shards)
        pend = []
        for s in range(n_shards):
            m = sh == s
            if m.any():
                hs, is_ = hv[m], ids[m]
                keep = np.lexsort((is_, hs))[:k]   # in-batch pre-prune
                pend.append(shards[s].ingest.remote(hs[keep], is_[keep]))
        ray.get(pend)
        if return_stats:
            max_state = max(max_state,
                            sum(ray.get([s.state_rows.remote()
                                         for s in shards])))

    tables = [t for t in ray.get([s.flush.remote() for s in shards])
              if t.num_rows]
    for s in shards:
        ray.kill(s)
    if tables:
        merged = pa.concat_tables(tables)
        hv = merged.column("hv").to_numpy(zero_copy_only=False)
        ids = merged.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, hv))[:k]
        out_ids = np.sort(ids[order])
    else:
        out_ids = np.empty(0, np.int64)
    out = pa.table({"doc_id": pa.array(out_ids, pa.int64())})
    if return_stats:
        return out, {"state_rows": max_state}
    return out


class _HLLShardState:
    """One shard's slice of the HyperLogLog register array: registers
    are position-addressed, so shard s owns range [lo, hi) and merges
    incoming slices with an elementwise max — idempotent and
    commutative, CONSTANT state (its share of the 2^p bytes) forever."""

    def __init__(self, lo: int, hi: int) -> None:
        self.lo, self.hi = lo, hi
        self.regs = np.zeros(hi - lo, np.uint8)

    def ingest(self, regs_slice: bytes) -> int:
        self.regs = np.maximum(
            self.regs, np.frombuffer(regs_slice, dtype=np.uint8))
        return len(self.regs)

    def state_rows(self) -> int:
        return len(self.regs)

    def flush(self) -> bytes:
        return self.regs.tobytes()


def streaming_hll_distinct(ds, extract, label: str = "n_distinct_est",
                           n_shards: int = 4, micro_batch: int = 65536,
                           return_stats: bool = False):
    """Streaming HyperLogLog distinct count — the register-stream twin
    of the batch :func:`~deepwebharvester_ray.functions.sketch.hll_distinct`
    (same ``extract`` contract): each micro-batch collapses to one
    2^p-byte register array (the combiner discipline — RPCs carry
    registers, never values), register POSITION ranges partition across
    shard actors, and each shard folds its slice with an elementwise
    max.  Max is idempotent and commutative, so the merged registers —
    and the estimate — are BIT-EQUAL to the batch sketch under any
    arrival order or micro-batch split, with CONSTANT total state
    (2^p bytes across all shards, forever).  Returns the same one-row
    {label} table; with ``return_stats`` also {"state_rows": 2^p}."""
    import ray

    from .sketch import _M, _hash60, hll_estimate, hll_registers

    bounds = np.linspace(0, _M, n_shards + 1).astype(int)
    Shard = ray.remote(num_cpus=0.5, runtime_env=runtime_env())(_HLLShardState)
    shards: List = [Shard.remote(int(bounds[s]), int(bounds[s + 1]))
                    for s in range(n_shards)]

    for chunk in ds.iter_batches(batch_size=micro_batch,
                                 batch_format="pyarrow"):
        if chunk.num_rows == 0:
            continue
        regs = hll_registers(_hash60(set(extract(chunk))))
        ray.get([shards[s].ingest.remote(
            regs[bounds[s]:bounds[s + 1]].tobytes())
            for s in range(n_shards)])

    slices = ray.get([s.flush.remote() for s in shards])
    for s in shards:
        ray.kill(s)
    merged = np.frombuffer(b"".join(slices), dtype=np.uint8)
    out = pa.table({label: pa.array([int(np.floor(hll_estimate(merged) + 0.5))],
                                    pa.int64())})
    if return_stats:
        return out, {"state_rows": int(_M)}
    return out


class _CMSShardState:
    """One shard's COLUMN slice [lo, hi) of the Count-Min matrix:
    incoming micro-batch partials arrive pre-sliced, fold with exact
    int64 addition (commutative ⇒ bit-equal to the batch matrix under
    any split); state is the shard's share of depth × width counters,
    CONSTANT forever."""

    def __init__(self, depth: int, lo: int, hi: int) -> None:
        self.lo, self.hi = lo, hi
        self.mat = np.zeros((depth, hi - lo), np.int64)

    def ingest(self, blob: bytes) -> int:
        self.mat += np.frombuffer(blob, np.int64).reshape(self.mat.shape)
        return self.mat.size

    def state_rows(self) -> int:
        return self.mat.size

    def flush(self) -> bytes:
        return self.mat.tobytes()


def streaming_cms(ds, value_column: str, width: int = 1 << 14,
                  n_shards: int = 4, micro_batch: int = 65536,
                  return_stats: bool = False) -> np.ndarray:
    """Streaming Count-Min sketch — the register-stream twin of the
    batch :func:`~deepwebharvester_ray.functions.sketch.cms_build`:
    each micro-batch collapses to one (depth × width) partial matrix
    (the combiner discipline), COLUMN ranges partition across shard
    actors folding exact int64 adds.  Addition commutes, so the merged
    matrix — and every estimate — is BIT-EQUAL to the batch sketch
    under any arrival order or micro-batch split, with CONSTANT total
    state (depth × width counters).  Completes the register-twin family
    (HLL max-registers, DDSketch count-registers, min-k sample, CMS
    count-matrix).  Returns the merged numpy matrix; with
    ``return_stats`` also {"state_rows": depth × width}."""
    import ray

    from .sketch import CMS_DEPTH, _cms_positions, _hash60

    bounds = np.linspace(0, width, n_shards + 1).astype(int)
    Shard = ray.remote(num_cpus=0.5, runtime_env=runtime_env())(_CMSShardState)
    shards: List = [Shard.remote(CMS_DEPTH, int(bounds[s]),
                                 int(bounds[s + 1]))
                    for s in range(n_shards)]

    for chunk in ds.iter_batches(batch_size=micro_batch,
                                 batch_format="pyarrow"):
        if chunk.num_rows == 0:
            continue
        mat = np.zeros((CMS_DEPTH, width), np.int64)
        vals = chunk.column(value_column).to_pylist()
        if vals:
            pos = _cms_positions(_hash60(vals), width)
            for d in range(CMS_DEPTH):
                np.add.at(mat[d], pos[d], 1)
        ray.get([shards[s].ingest.remote(
            mat[:, bounds[s]:bounds[s + 1]].copy().tobytes())
            for s in range(n_shards)])

    slices = [np.frombuffer(b, np.int64).reshape(CMS_DEPTH, -1)
              for b in ray.get([s.flush.remote() for s in shards])]
    for s in shards:
        ray.kill(s)
    merged = np.concatenate(slices, axis=1)
    if return_stats:
        return merged, {"state_rows": int(CMS_DEPTH * width)}
    return merged
