"""Streaming (micro-batch) sessionization: equality with the batch
operator, watermark-eviction boundedness, and the in-process shard
kernel's stitching rules."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from deepwebharvester_ray.functions.streaming import (
    SESSION_GAP_US,
    _ShardState,
    streaming_sessionize,
)

SF_SMOKE = "/root/testdata/sf0.001"

MIN30 = SESSION_GAP_US
US = 1_000_000


def _table(rows):
    uids = np.array([r[0] for r in rows], np.int64)
    ts = np.array([r[1] for r in rows], np.int64)
    return uids, ts


class TestShardKernel:
    def test_single_burst_one_session(self):
        st = _ShardState()
        st.ingest(*_table([(1, 0), (1, 10 * US), (1, MIN30)]))
        out = st.finalize()
        assert out.to_pydict() == {
            "user_id": [1], "n_events": [3], "n_sessions": [1]}

    def test_gap_splits_sessions_within_batch(self):
        st = _ShardState()
        st.ingest(*_table([(1, 0), (1, MIN30 + 1)]))
        assert st.finalize().column("n_sessions").to_pylist() == [2]

    def test_cross_batch_stitching_continues_session(self):
        st = _ShardState()
        st.ingest(*_table([(1, 0)]))
        st.ingest(*_table([(1, MIN30)]))  # exactly at the gap: continues
        assert st.finalize().column("n_sessions").to_pylist() == [1]

    def test_cross_batch_gap_opens_new_session(self):
        st = _ShardState()
        st.ingest(*_table([(1, 0)]))
        st.ingest(*_table([(1, MIN30 + 1)]))
        assert st.finalize().column("n_sessions").to_pylist() == [2]

    def test_eviction_is_exact_for_returning_user(self):
        st = _ShardState()
        st.ingest(*_table([(1, 0), (2, 0)]))
        ev = st.evict(MIN30 + 2)  # both open sessions are closed
        assert ev.num_rows == 2 and st.state_rows() == 0
        st.ingest(*_table([(1, 10 * MIN30)]))  # user 1 returns
        fin = st.finalize()
        assert fin.column("user_id").to_pylist() == [1]
        # partial + residual sum to 2 sessions for user 1
        total = {u: s for u, s in zip(ev.column("user_id").to_pylist(),
                                      ev.column("n_sessions").to_pylist())}
        total[1] = total.get(1, 0) + fin.column("n_sessions").to_pylist()[0]
        assert total == {1: 2, 2: 1}

    def test_unsorted_batch_is_ordered_internally(self):
        st = _ShardState()
        st.ingest(*_table([(2, 5), (1, MIN30 + 1), (1, 0), (2, 0)]))
        out = st.finalize()
        assert out.column("user_id").to_pylist() == [1, 2]
        assert out.column("n_sessions").to_pylist() == [2, 1]


def test_stream_equals_batch(ray_session):
    import ray

    from deepwebharvester_ray.pipelines.queries import q_event_sessions

    ds = ray.data.read_parquet(f"{SF_SMOKE}/events.parquet",
                               columns=["user_id", "ts"])
    got, stats = streaming_sessionize(ds, micro_batch=512, evict_every=2,
                                      return_stats=True)
    got = got.to_pandas().sort_values("user_id").reset_index(drop=True)
    want = (q_event_sessions(SF_SMOKE).to_pandas()
            .sort_values("user_id").reset_index(drop=True))
    assert got.equals(want)
    n_users = len(want)
    # boundedness: eviction kept open state below the full user set
    assert 0 < stats["max_open_state_rows"] <= n_users
    assert stats["emitted_partials"] >= 1


def test_eviction_bounds_state_on_bursty_stream(ray_session):
    import ray

    # 200 users active in week 1 only, 200 different users in week 9:
    # with eviction the open state never holds both populations.
    rows_u, rows_t = [], []
    for u in range(200):
        rows_u += [u, u]
        rows_t += [u * US, u * US + 5 * US]
    for u in range(1000, 1200):
        rows_u += [u, u]
        rows_t += [10 * MIN30 + u * US, 10 * MIN30 + u * US + 5 * US]
    t = pa.table({"user_id": pa.array(rows_u, pa.int64()),
                  "ts": pa.array(np.array(rows_t, np.int64),
                                 pa.timestamp("us"))})
    ds = ray.data.from_arrow(t)
    out, stats = streaming_sessionize(ds, micro_batch=100, evict_every=1,
                                      return_stats=True)
    pdf = out.to_pandas()
    assert len(pdf) == 400
    assert (pdf["n_sessions"] == 1).all() and (pdf["n_events"] == 2).all()
    assert stats["max_open_state_rows"] < 400


def test_streaming_topk_guarantees(ray_session):
    """MG guarantee per emitted token (est <= true <= est + err_ub) and
    guaranteed presence of every token whose true count exceeds its
    shard's error bound, on a synthetic Zipf-ish stream."""
    import collections

    import ray

    from deepwebharvester_ray.functions.sketch import _hash64
    from deepwebharvester_ray.functions.streaming import streaming_topk
    from deepwebharvester_ray.functions.textops import WORD_RE

    rng = np.random.default_rng(9)
    vocab = [f"w{i}" for i in range(400)]
    docs = []
    for _ in range(300):
        # skewed draw: low indices dominate
        idx = np.minimum((rng.pareto(1.2, 40) * 3).astype(int),
                         len(vocab) - 1)
        docs.append(" ".join(vocab[i] for i in idx))
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    ds = ray.data.from_arrow(t)
    n_shards, k = 4, 64
    out, stats = streaming_topk(ds, top_n=30, k_per_shard=k,
                                n_shards=n_shards, micro_batch=37,
                                return_stats=True)

    true = collections.Counter()
    for d in docs:
        true.update(WORD_RE.findall(d.lower()))
    # per-shard error bound = max err_ub emitted by that shard
    shard_err = {}
    for r in out.to_pylist():
        s = int(_hash64([r["token"]])[0] % np.uint64(n_shards))
        shard_err[s] = max(shard_err.get(s, 0), r["err_ub"])
        assert r["est_n"] <= true[r["token"]] <= r["est_n"] + r["err_ub"], \
            r["token"]
    # state stayed bounded by shards x k
    assert stats["max_state_rows"] <= n_shards * k
    # any token with true count > its shard's err bound among the top
    # (with margin) must be present in the emitted top-30
    emitted = {r["token"] for r in out.to_pylist()}
    top_true = sorted(true, key=lambda w: -true[w])[:10]
    for w in top_true:
        s = int(_hash64([w])[0] % np.uint64(n_shards))
        if true[w] > 2 * shard_err.get(s, 0):
            assert w in emitted, w


def test_streaming_dedup_first_arrival_across_batches(ray_session):
    """Duplicates in LATER micro-batches are rejected; the accepted set
    is exactly the stream-order first occurrences, and state counts the
    distinct contents."""
    import ray

    from deepwebharvester_ray.functions.streaming import streaming_dedup

    texts = [f"text {i % 7}" for i in range(40)]   # 7 distinct, many dups
    ds = ray.data.from_items(
        [{"doc_id": i, "text": texts[i]} for i in range(40)])
    out, stats = streaming_dedup(ds, micro_batch=6, return_stats=True)
    got = {r["doc_id"] for r in out.to_pylist()}
    assert got == set(range(7))          # first occurrence of each content
    assert out.num_rows == 7
    assert stats["state_rows"] == 7


def test_streaming_dedup_unordered_stream_keeps_first_arrival(ray_session):
    """On an UNORDERED stream the winner is the first ARRIVAL (not the
    min id) — exactly-once per content regardless of id order."""
    import ray

    from deepwebharvester_ray.functions.streaming import streaming_dedup

    rows = [{"doc_id": 10, "text": "a"}, {"doc_id": 3, "text": "a"},
            {"doc_id": 7, "text": "b"}, {"doc_id": 1, "text": "b"}]
    ds = ray.data.from_items(rows)
    out = streaming_dedup(ds, micro_batch=1)
    got = {r["doc_id"] for r in out.to_pylist()}
    assert got == {10, 7}


def test_streaming_dedup_equals_batch_on_ordered_stream(ray_session):
    """Id-ordered stream ⇒ first arrival == keep-min-id: bit-equal to
    dedup.exact_dedup_ids on the same input."""
    import ray

    from deepwebharvester_ray.functions.dedup import exact_dedup_ids
    from deepwebharvester_ray.functions.streaming import streaming_dedup

    rng = np.random.default_rng(3)
    rows = [{"doc_id": i, "text": f"t {int(x)}"}
            for i, x in enumerate(rng.integers(0, 25, 120))]
    ds = ray.data.from_items(rows).repartition(5)

    stream = {(r["content_hash"], r["doc_id"]) for r in
              streaming_dedup(ds.sort("doc_id"), micro_batch=17)
              .to_pylist()}
    batch = {(r["content_hash"], r["doc_id"]) for r in
             exact_dedup_ids(ds).take_all()}
    assert stream == batch


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))


def test_streaming_interval_join_bounded_state(ray_session):
    """Watermark eviction bounds shard state by the open-window span,
    not the stream length: a 100-day ordered stream of 1-day windows
    must never hold more than ~a few micro-batches' worth of views,
    and the emitted rows equal the brute-force interval join."""
    import numpy as np
    import pyarrow as pa
    import ray

    from deepwebharvester_ray.functions.streaming import (
        streaming_interval_join)

    rng_n = 4000
    day = 86_400_000_000
    # deterministic interleaved stream: event i at ts = i hours
    ts = np.arange(rng_n, dtype=np.int64) * 3_600_000_000
    user = np.arange(rng_n, dtype=np.int64) % 10  # same user every 10 h
    kind = np.where(np.arange(rng_n) % 3 == 0, "view", "click")
    t = pa.table({"event_id": pa.array(np.arange(rng_n, dtype=np.int64)),
                  "user_id": pa.array(user),
                  "ts": pa.array(ts, pa.int64()),
                  "event_type": pa.array(kind.tolist(), pa.string())})

    def window_fn(chunk):
        import pyarrow.compute as pc

        v = chunk.filter(pc.equal(chunk.column("event_type"), "view"))
        c = chunk.filter(pc.equal(chunk.column("event_type"), "click"))
        vs = v.column("ts").to_numpy(zero_copy_only=False)
        views = pa.table({"user_id": v.column("user_id"),
                          "view_id": v.column("event_id"),
                          "view_start": pa.array(vs, pa.int64()),
                          "view_end": pa.array(vs + day, pa.int64())})
        clicks = pa.table({"user_id": c.column("user_id"),
                           "event_id": c.column("event_id"),
                           "ts": c.column("ts")})
        return views, clicks

    ds = ray.data.from_arrow(t)
    res, stats = streaming_interval_join(
        ds, window_fn, n_shards=3, micro_batch=256, return_stats=True)

    # brute-force truth
    vi = np.arange(rng_n) % 3 == 0
    ci = ~vi
    truth = set()
    for ve, vu, vt in zip(np.arange(rng_n)[vi], user[vi], ts[vi]):
        for ce, cu, ct in zip(np.arange(rng_n)[ci], user[ci], ts[ci]):
            if cu == vu and vt <= ct < vt + day:
                truth.add((int(ce), int(ve)))
    got = set(zip(res.column("event_id").to_pylist(),
                  res.column("view_id").to_pylist()))
    assert got == truth and len(truth) > 100
    # 1-day windows at 1 event/hour: ≲ 24 open views + one batch slack;
    # total stream holds 1334 views — state must be far below that
    n_views = int(vi.sum())
    assert stats["state_rows"] < n_views // 4
    assert stats["state_rows"] <= 24 + 256


def test_streaming_interval_join_idle_shard_evicts(ray_session):
    """A shard that stops receiving rows must still see the advancing
    watermark and evict its expired windows (empty ingest per
    micro-batch): after user A goes silent, later micro-batches of
    user B (a different shard) must not leave A's dead window counted
    in state_rows."""
    import numpy as np
    import pyarrow as pa
    import ray

    from deepwebharvester_ray.functions.streaming import (
        streaming_interval_join)
    from deepwebharvester_ray.sinks import _shard_of

    ua = 1
    ub = next(u for u in range(2, 64)
              if _shard_of(np.array([u], np.int64), 2)[0]
              != _shard_of(np.array([ua], np.int64), 2)[0])

    # micro_batch=2 → batch 1: user A opens window [0, 10); batches
    # 2..3: user B views at ts ≥ 100 (short windows, ≤1 open at once).
    # With idle-shard watermark advance, peak state = 1; without it,
    # A's expired window lingers and the peak reads 2.
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "user_id": pa.array([ua, ua, ub, ub, ub, ub], pa.int64()),
        "ts": pa.array([0, 5, 100, 105, 200, 205], pa.int64()),
        "event_type": pa.array(
            ["view", "click", "view", "click", "view", "click"]),
    })

    def window_fn(chunk):
        import pyarrow.compute as pc

        v = chunk.filter(pc.equal(chunk.column("event_type"), "view"))
        c = chunk.filter(pc.equal(chunk.column("event_type"), "click"))
        vs = v.column("ts").to_numpy(zero_copy_only=False)
        views = pa.table({"user_id": v.column("user_id"),
                          "view_id": v.column("event_id"),
                          "view_start": pa.array(vs, pa.int64()),
                          "view_end": pa.array(vs + 10, pa.int64())})
        clicks = pa.table({"user_id": c.column("user_id"),
                           "event_id": c.column("event_id"),
                           "ts": c.column("ts")})
        return views, clicks

    res, stats = streaming_interval_join(
        ray.data.from_arrow(t), window_fn, n_shards=2, micro_batch=2,
        return_stats=True)
    pairs = set(zip(res.column("event_id").to_pylist(),
                    res.column("view_id").to_pylist()))
    assert pairs == {(2, 1), (4, 3), (6, 5)}
    # peak = 1 open window; a lingering expired window on the idle
    # shard would read 2
    assert stats["state_rows"] == 1


def test_streaming_joins_tie_at_batch_boundary(ray_session):
    """A view and a click sharing one timestamp must match (inclusive
    ≤) even when a naive fixed-size micro-batch would split the tie
    across a boundary — the ts-aligned rebatcher carries tied rows
    together.  micro_batch=2 forces boundaries everywhere."""
    import numpy as np
    import pyarrow as pa
    import ray

    from deepwebharvester_ray.functions.streaming import (
        streaming_asof_join, streaming_interval_join)

    # stream: filler, filler, then CLICK and VIEW tied at ts=100
    # (click row first in stream order — the hazardous layout)
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "user_id": pa.array([7, 7, 7, 7], pa.int64()),
        "ts": pa.array([10, 20, 100, 100], pa.int64()),
        "event_type": pa.array(["view", "view", "click", "view"]),
    })

    def split(chunk):
        import pyarrow.compute as pc

        v = chunk.filter(pc.equal(chunk.column("event_type"), "view"))
        c = chunk.filter(pc.equal(chunk.column("event_type"), "click"))
        views = pa.table({"user_id": v.column("user_id"),
                          "ts": v.column("ts")})
        clicks = pa.table({"user_id": c.column("user_id"),
                           "event_id": c.column("event_id"),
                           "ts": c.column("ts")})
        return views, clicks

    res = streaming_asof_join(ray.data.from_arrow(t), split,
                              n_shards=2, micro_batch=2)
    rows = {r["event_id"]: r["prev_view_ts"]
            for r in res.to_pylist()}
    assert rows == {3: 100}  # the TIED view wins, not ts=20

    def window(chunk):
        import pyarrow.compute as pc

        v = chunk.filter(pc.equal(chunk.column("event_type"), "view"))
        c = chunk.filter(pc.equal(chunk.column("event_type"), "click"))
        vs = v.column("ts").to_numpy(zero_copy_only=False)
        views = pa.table({"user_id": v.column("user_id"),
                          "view_id": v.column("event_id"),
                          "view_start": pa.array(vs, pa.int64()),
                          "view_end": pa.array(vs + 50, pa.int64())})
        clicks = pa.table({"user_id": c.column("user_id"),
                           "event_id": c.column("event_id"),
                           "ts": c.column("ts")})
        return views, clicks

    res = streaming_interval_join(ray.data.from_arrow(t), window,
                                  n_shards=2, micro_batch=2)
    pairs = set(zip(res.column("event_id").to_pylist(),
                    res.column("view_id").to_pylist()))
    assert pairs == {(3, 4)}  # start==ts inclusive, tied across boundary


def test_ts_aligned_batches_raises_on_tie_spanning_flush(ray_session):
    """A tie run longer than the micro-batch flushes whole; if the SAME
    timestamp then continues into the next chunk the rebatcher must
    fail loudly (tied rows split across micro-batches silently lose
    inclusive-predicate join matches) — and a tie run that merely ENDS
    at a chunk boundary must still pass."""
    import pyarrow as pa
    import pytest
    import ray

    from deepwebharvester_ray.functions.streaming import (
        _ts_aligned_batches)

    # 6 rows all ts=5, micro_batch=3: chunk 1 is one whole tie run,
    # chunk 2 starts with the same ts -> must raise
    t = pa.table({"ts": pa.array([5] * 6, pa.int64()),
                  "event_id": pa.array(range(6), pa.int64())})
    with pytest.raises(ValueError, match="tie"):
        list(_ts_aligned_batches(ray.data.from_arrow(t), 3))

    # tie run exactly filling chunk 1, new ts in chunk 2: fine, and no
    # row is lost or duplicated
    t2 = pa.table({"ts": pa.array([5, 5, 5, 6, 7, 7], pa.int64()),
                   "event_id": pa.array(range(6), pa.int64())})
    got = [eid for c in _ts_aligned_batches(ray.data.from_arrow(t2), 3)
           for eid in c.column("event_id").to_pylist()]
    assert got == list(range(6))


def test_streaming_dedup_checkpoint_resume(ray_session):
    """Exactly-once resume: run the stream's first half, checkpoint the
    shard states, restore into FRESH actors, run the second half — the
    two phases' emissions together equal the uninterrupted run exactly
    (no duplicate emission of content already accepted before the
    kill, no loss)."""
    import pyarrow as pa
    import ray

    from deepwebharvester_ray.functions.streaming import streaming_dedup

    n = 600
    texts = [f"content {i % 150}" for i in range(n)]  # 4× duplication
    t = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "text": pa.array(texts, pa.string())})

    full = streaming_dedup(ray.data.from_arrow(t), n_shards=3,
                           micro_batch=64)
    full_pairs = sorted(zip(full.column("content_hash").to_pylist(),
                            full.column("doc_id").to_pylist()))
    assert len(full_pairs) == 150

    half = 300
    p1, state = streaming_dedup(
        ray.data.from_arrow(t.slice(0, half)), n_shards=3,
        micro_batch=64, return_state=True)
    p2 = streaming_dedup(
        ray.data.from_arrow(t.slice(half)), n_shards=3,
        micro_batch=64, resume_from=state)
    got = sorted(
        zip(p1.column("content_hash").to_pylist()
            + p2.column("content_hash").to_pylist(),
            p1.column("doc_id").to_pylist()
            + p2.column("doc_id").to_pylist()))
    assert got == full_pairs  # exactly-once across the kill point
    # and phase 2 emitted ONLY content unseen in phase 1
    seen1 = set(p1.column("content_hash").to_pylist())
    assert not (seen1 & set(p2.column("content_hash").to_pylist()))


def test_streaming_tumbling_agg_bounded_state_and_equality(ray_session):
    """The tumbling-aggregate twin: emitted windows equal the batch
    group-by exactly, and peak open-window state is bounded by
    types × ~1 open hour — never the stream length."""
    import numpy as np
    import pyarrow as pa
    import ray

    from deepwebharvester_ray.functions.streaming import (
        streaming_tumbling_agg)

    n = 20_000
    rng = np.random.default_rng(5)
    ts = np.sort(rng.integers(0, 200 * 3_600_000_000, n))
    types = np.array(["a", "b", "c", "d"])[
        rng.integers(0, 4, n)]
    vals = rng.integers(0, 10_000, n) / 100.0
    t = pa.table({
        "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
        "event_type": pa.array(types.tolist(), pa.string()),
        "value": pa.array(vals, pa.float64()),
    })
    ds = ray.data.from_arrow(t).repartition(8).materialize()
    out, stats = streaming_tumbling_agg(
        ds, n_shards=3, micro_batch=1024, return_stats=True)
    got = {(r["hour_ms"], r["event_type"]):
           (r["n_events"], r["total_cents"])
           for r in out.take_all()}

    hours = (ts // 3_600_000_000) * 3_600_000
    cents = np.floor(vals * 100.0).astype(np.int64)
    want: dict = {}
    for h, ty, c in zip(hours, types, cents):
        k = (int(h), str(ty))
        n0, c0 = want.get(k, (0, 0))
        want[k] = (n0 + 1, c0 + int(c))
    assert got == want
    assert len(want) > 500
    # 4 types × at most ~2 concurrently-open hours across shards
    assert stats["state_rows"] <= 4 * 2


def test_streaming_hopping_agg_bounded_state_and_equality(ray_session):
    """The hopping twin: emitted overlapping windows equal the batch
    expansion exactly; peak open state bounded by types × window/hop."""
    import numpy as np
    import pyarrow as pa
    import ray

    from deepwebharvester_ray.functions.streaming import (
        streaming_hopping_agg)

    W, H = 3_600_000, 900_000        # 1 h window, 15 min hop
    n = 10_000
    rng = np.random.default_rng(13)
    ts = np.sort(rng.integers(0, 100 * 3_600_000_000, n))
    types = np.array(["x", "y", "z"])[rng.integers(0, 3, n)]
    t = pa.table({
        "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
        "event_type": pa.array(types.tolist(), pa.string()),
    })
    ds = ray.data.from_arrow(t).repartition(6).materialize()
    out, stats = streaming_hopping_agg(
        ds, window_ms=W, hop_ms=H, n_shards=3, micro_batch=777,
        return_stats=True)
    got = {(r["win_ms"], r["event_type"]): r["n_events"]
           for r in out.take_all()}

    want: dict = {}
    for u, ty in zip(ts, types):
        hop_idx = u // (H * 1000)
        for k in range(W // H):
            key = (int((hop_idx - k) * H), str(ty))
            want[key] = want.get(key, 0) + 1
    assert got == want
    assert len(want) > 1000
    # 3 types × 4 hops/window × ~2 open spans
    assert stats["state_rows"] <= 3 * (W // H) * 2


def test_streaming_dd_quantiles_bit_equal_to_batch(ray_session):
    """The register stream is commutative: streaming DDSketch quantiles
    are BIT-EQUAL to the batch dd_quantiles under event-time order, a
    permuted arrival order, and different micro-batch sizes; total
    register state is bounded by the bucket domain."""
    import ray

    from deepwebharvester_ray.functions.sketch import dd_quantiles
    from deepwebharvester_ray.functions.streaming import (
        streaming_dd_quantiles)

    n = 20_000
    rng = np.random.default_rng(31)
    vals = np.concatenate([
        rng.lognormal(3.0, 2.0, n // 2),          # heavy positive tail
        -rng.lognormal(1.0, 1.5, n // 4),         # negatives
        np.zeros(n // 4),                          # zero bucket
    ])
    ts = np.arange(len(vals), dtype=np.int64) * 1_000_000
    ps = [0.1, 0.5, 0.9, 0.99]
    t = pa.table({
        "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
        "value": pa.array(vals, pa.float64()),
    })
    ds = ray.data.from_arrow(t).repartition(7).materialize()
    batch = dd_quantiles(ds, "value", ps, alpha=0.01).to_pylist()[0]

    out, stats = streaming_dd_quantiles(
        ds, "value", ps, alpha=0.01, n_shards=3, micro_batch=1234,
        return_stats=True)
    assert out.to_pylist()[0] == batch           # bit-equal, not approx
    assert 0 < stats["state_rows"] < 5000        # bucket domain, not n

    # permuted arrival + different micro-batch: same registers
    perm = rng.permutation(len(vals))
    t2 = pa.table({
        "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
        "value": pa.array(vals[perm], pa.float64()),
    })
    ds2 = ray.data.from_arrow(t2).repartition(4).materialize()
    out2 = streaming_dd_quantiles(ds2, "value", ps, alpha=0.01,
                                  n_shards=2, micro_batch=333)
    assert out2.to_pylist()[0] == batch

    # relative-error guarantee vs the exact quantiles (positive tail)
    import numpy as _np
    exact = _np.quantile(vals, 0.9)
    assert abs(batch["q_0.9"] - exact) <= 0.03 * abs(exact)


def test_streaming_dd_quantiles_empty_stream(ray_session):
    import math

    import ray

    from deepwebharvester_ray.functions.streaming import (
        streaming_dd_quantiles)

    t = pa.table({
        "ts": pa.array([], pa.int64()).cast(pa.timestamp("us")),
        "value": pa.array([], pa.float64()),
    })
    ds = ray.data.from_arrow(t)
    out = streaming_dd_quantiles(ds, "value", [0.5], alpha=0.01)
    assert math.isnan(out.to_pylist()[0]["q_0.5"])


def test_streaming_sample_k_bit_equal_and_order_free(ray_session):
    """Min-k-hash sample: streaming result equals the batch two-level
    plan under ordered AND shuffled arrival; subset chain in k; state
    is k rows per shard forever."""
    import ray

    from deepwebharvester_ray.functions.streaming import streaming_sample_k

    MULT = 0xC2B2AE3D27D4EB4F
    ids = np.arange(1, 5001, dtype=np.int64)

    def batch_ref(k):
        with np.errstate(over="ignore"):
            hv = ids.astype(np.uint64) * np.uint64(MULT)
        return np.sort(ids[np.argsort(hv, kind="stable")[:k]])

    rng = np.random.default_rng(5)
    for arrival in (ids, rng.permutation(ids)):
        ds = ray.data.from_arrow(
            pa.table({"doc_id": pa.array(arrival, pa.int64())})
        ).repartition(6).materialize()
        out, stats = streaming_sample_k(
            ds, k=50, mult=MULT, n_shards=3, micro_batch=617,
            return_stats=True)
        got = out.column("doc_id").to_numpy()
        assert np.array_equal(got, batch_ref(50))
        assert stats["state_rows"] <= 3 * 50
    # subset chain: k=20 sample ⊂ k=50 sample
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64())})).repartition(4)
    s20 = set(streaming_sample_k(ds, k=20, mult=MULT).column(
        "doc_id").to_pylist())
    s50 = set(streaming_sample_k(ds, k=50, mult=MULT).column(
        "doc_id").to_pylist())
    assert s20 <= s50 and len(s20) == 20 and len(s50) == 50


def test_streaming_hll_bit_equal_to_batch(ray_session):
    """Register-position-sharded streaming HLL: estimate bit-equal to
    the batch sketch under ordered and permuted arrival and different
    micro-batch/shard counts; total state constant at 2^p registers."""
    import ray

    from deepwebharvester_ray.functions.sketch import hll_distinct
    from deepwebharvester_ray.functions.streaming import (
        streaming_hll_distinct)

    def extract(batch):
        return [t for t in batch.column("tok").to_pylist()]

    rng = np.random.default_rng(11)
    toks = [f"w{v}" for v in rng.integers(0, 3000, 30_000)]
    t = pa.table({"tok": pa.array(toks, pa.string())})
    ds = ray.data.from_arrow(t).repartition(5).materialize()
    batch_est = hll_distinct(ds, extract).to_pylist()[0]["n_distinct_est"]

    out, stats = streaming_hll_distinct(
        ds, extract, n_shards=3, micro_batch=1777, return_stats=True)
    assert out.to_pylist()[0]["n_distinct_est"] == batch_est
    assert stats["state_rows"] == 4096        # p=12: constant, not n

    perm = pa.table({"tok": pa.array(
        [toks[i] for i in rng.permutation(len(toks))], pa.string())})
    ds2 = ray.data.from_arrow(perm).repartition(2).materialize()
    out2 = streaming_hll_distinct(ds2, extract, n_shards=5,
                                  micro_batch=433)
    assert out2.to_pylist()[0]["n_distinct_est"] == batch_est
    assert abs(batch_est - 3000) / 3000 < 0.05


def test_streaming_cms_bit_equal_to_batch(ray_session):
    """Column-sharded streaming CMS matrix equals the batch build
    exactly under ordered and permuted arrival; estimates never
    underestimate true counts."""
    import ray

    from deepwebharvester_ray.functions.sketch import (cms_build,
                                                       cms_estimate)
    from deepwebharvester_ray.functions.streaming import streaming_cms

    rng = np.random.default_rng(21)
    toks = [f"t{v}" for v in rng.zipf(1.6, 20_000) if v < 5_000]
    t = pa.table({"token": pa.array(toks, pa.string())})
    ds = ray.data.from_arrow(t).repartition(5).materialize()
    batch_mat = cms_build(ds, "token", width=1 << 10)

    got, stats = streaming_cms(ds, "token", width=1 << 10, n_shards=3,
                               micro_batch=999, return_stats=True)
    assert np.array_equal(got, batch_mat)
    assert stats["state_rows"] == 5 * (1 << 10)

    perm = pa.table({"token": pa.array(
        [toks[i] for i in rng.permutation(len(toks))], pa.string())})
    ds2 = ray.data.from_arrow(perm).repartition(2).materialize()
    got2 = streaming_cms(ds2, "token", width=1 << 10, n_shards=5,
                         micro_batch=333)
    assert np.array_equal(got2, batch_mat)

    import collections
    true = collections.Counter(toks)
    probe = list(true)[:50]
    est = cms_estimate(got, probe)
    assert all(e >= true[p] for e, p in zip(est, probe))
