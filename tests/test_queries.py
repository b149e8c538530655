"""Driver-contract tests: queries() / oracle_sql() consistency plus
spot-checks of representative queries against their DuckDB oracles at
sf0.001 (the full sweep runs via tools/check_oracle.py at sf0.01)."""
from __future__ import annotations

import hashlib
from pathlib import Path

import pytest

SF_SMOKE = "/root/testdata/sf0.001"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

SPOT_CHECKED = [
    "extract_pages", "exact_dedup", "token_counts", "threat_scores",
    "lang_id", "events_by_type", "event_sessions",
    "event_sessions_stream",
    "events_hourly_stream",
    "events_hopping_stream", "ann_topk",
    "knn_graph",
    "ngram_overlap",
    "containment_pairs",
    "passage_profile",
    "price_quantiles",
    "value_outliers",
    "winsorized_mean",
    "value_hour_cov",
    "clicks_asof_views",
    "clicks_asof_next",
    "split_assign",
    "subsample_stability",
    "forecast_baseline",
    "median_micros",
    "sample_k",
    "top_tokens",
    "top_tokens_by_source",
    "trending_tokens",
    "ioc_cooccurrence",
    "bpe_pair_counts",
    "cohort_retention",
    "recrawl_schedule",
    "crawl_budget",
    "incr_crawl_round",
    "host_sample",
    "host_dup_stats",
    "source_overlap",
    "politeness_audit",
    "politeness_budget",
    "gopher_rules",
    "c4_filters",
    "bootstrap_means",
    "host_freshness",
    "cluster_sizes",
    "snapshot_diff",
    "upsert_apply",
    "table_checksum",
    "user_top_type",
    "filled_no_pending",
    "value_percentile",
    "dedup_keep_best",
    "rolling_distinct_users",
    "zorder_layout",
    "oov_rate",
    "token_packing",
    "stratified_sample",
    "top_terms_tfidf",
    "jaccard_pairs",
    "cosine_pairs",
    "dsir_weights",
    "url_templates",
    "mv_refresh",
    "diverse_top_risk",
    "link_reciprocity",
    "drift_tvd",
    "cheapest_paths",
    "source_percentiles",
    "exact_dedup_stream",
    "training_pairs",
    "bm25_search",
    "cocitation",
    "top_customers_q10",
    "big_order_customers",
    "orders_join_merge",
    "source_divergence",
    "square_count",
    "kmv_overlap",
    "retrieval_eval",
    "user_cusum",
    "view_overlap_pairs",
    "best_split",
    "loo_encoding",
    "zipf_spectrum",
    "benford_audit",
    "auc_score",
    "lateness_audit",
    "frequent_pairs",
    "jsonl_roundtrip",
    "warc_roundtrip",
    "sitemap_roundtrip",
    "cdx_diff",
    "robots_filter",
    "policy_gate",
    "index_merge",
    "index_merge_purge",
    "phrase_search",
    "doc_search_indexed",
    "search_snippets",
    "shard_rebalance",
    "image_dims",
    "audio_meta",
    "video_meta",
    "html_meta",
    "http_policy",
    "feed_roundtrip",
    "url_normalize",
    "link_pagination",
    "readability",
    "skipgram_counts",
    "source_modularity",
    "ks_test",
    "mutual_info",
    "chi2_tokens",
    "local_clustering",
    "adamic_adar",
    "csv_roundtrip",
    "value_gini",
    "welch_ttest",
    "mann_whitney",
    "kendall_tau",
    "kruskal_h",
    "doc_chunks",
    "k_anonymity",
    "spearman_corr",
    "quote_spans",
    "fingerprints",
    "systematic_resample",
    "user_rfm",
    "conversion_curve",
    "bot_score",
    "edge_embeddedness",
    "user_window_1h",
    "host_link_flow",
    "pretrain_prep",
    "quantile_map",
    "bibcoupling",
    "random_walks",
    "top_passages",
    "lineitem_orders_join",
    "promo_revenue",
    "mv_join_refresh",
    "clicks_nearest_view",
    "dlq_parse",
    "encoding_audit",
    "script_profile",
    "homoglyph_hosts",
    "idn_decode",
    "data_uri_images",
    "hreflang_map",
    "jsonld_types",
    "og_cards",
    "geo_rollup",
    "runtime_filter_join",
    "local_supplier_revenue",
    "skewed_orders_join",
    "clicks_in_views",
    "clicks_in_views_stream",
    "clicks_asof_stream",
    "user_deltas",
    "event_transitions",
    "user_value_share",
    "user_paths",
    "value_ntile",
    "orders_rollup",
    "orders_cube",
    "events_pivot",
    "dynamic_pivot",
    "above_avg_orders",
    "tree_depth",
    "lineitem_unpivot",
    "user_moving_sum",
    "top_orders_q3",
    "pagerank",
    "hits_scores",
    "two_hop_counts",
    "link_authority",
    "rank_agreement",
    "rank_fusion",
    "triangle_count",
    "link_richclub",
    "degree_assortativity",
    "inverted_index",
    "doc_search",
    "pmi_bigrams",
    "doc_surprisal",
    "bigram_surprisal",
    "host_boilerplate",
    "bucketed_join",
    "novelty_filter",
    "distinct_users_by_type",
    "value_stats",
    "orders_with_late_items",
    "customer_order_counts",
    "funnel_users",
    "pii_redact",
    "clean_text",
    "line_filter",
    "line_dedup",
    "source_entropy",
    "user_state_ranges",
    "view_coverage",
    "view_concurrency",
    "user_value_trend",
    "user_autocorr",
    "inlink_anchors",
    "dq_checks",
    "pagerank_seeded",
    "ml_quality_score",
    "repetition_filter",
    "domain_mix",
    "domain_upsample",
    "epoch_shuffle",
    "curriculum_order",
    "contamination",
    "full_prep",
]


def _norm(v):
    import numpy as np

    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.floating):
        return float(v)
    if isinstance(v, np.bool_):
        return bool(v)
    return v


def _value_hash(df) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = sorted(
        repr(tuple(_norm(v) for v in tup)) for tup in df.itertuples(index=False)
    )
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


def _to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


@pytest.fixture(scope="module")
def entrymod():
    import __ray_entry__

    return __ray_entry__


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = Path(SF_SMOKE) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def test_registry_consistency(entrymod):
    from deepwebharvester_ray.pipelines.queries import ROWS_ONLY

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert set(qs) == set(oracles) | set(ROWS_ONLY)
    assert not (set(oracles) & set(ROWS_ONLY))


def test_prefix_sample_spans_families(entrymod):
    """Any driver prefix-sample of queries() must cover the operator
    families (VERDICT r03 item 5): the first 50 entries contain at
    least one member of each of ≥8 families."""
    first50 = list(entrymod.queries())[:50]
    families = {
        "crawl": {"crawl_bfs", "crawl_intel"},
        "extract": {"extract_pages", "anchor_stats"},
        "intel": {"ioc_counts", "threat_scores"},
        "dedup": {"exact_dedup", "minhash_pairs", "dedup_spans"},
        "ann": {"ann_topk", "knn_graph", "neardup_embeddings"},
        "graph": {"pagerank", "link_scc", "link_bowtie"},
        "sketch": {"vocab_hll", "token_freq_cms",
                   "value_quantiles_sketch"},
        "streaming": {"events_hourly_stream", "exact_dedup_stream",
                      "sample_k_stream"},
        "join": {"orders_join_native", "lineitem_orders_join",
                 "runtime_filter_join"},
        "asof": {"clicks_asof_views", "clicks_in_views",
                 "clicks_asof_next"},
        "sink_roundtrip": {"jsonl_roundtrip", "warc_roundtrip",
                           "sitemap_roundtrip"},
        "search": {"doc_search", "bm25_search", "inverted_index"},
        "multimodal": {"png_roundtrip", "wav_roundtrip",
                       "binary_metadata"},
        "mixture": {"mixture_weights", "ccnet_buckets", "domain_mix"},
    }
    covered = {f for f, names in families.items()
               if names & set(first50)}
    assert len(covered) >= 8, covered
    # stronger pin: every family above is represented
    missing = set(families) - covered
    assert not missing, missing


@pytest.mark.parametrize("name", SPOT_CHECKED)
def test_query_matches_oracle(ray_session, entrymod, duck, name):
    qs = entrymod.queries()
    mine = _to_pandas(qs[name](SF_SMOKE))
    theirs = duck.sql(entrymod.oracle_sql()[name]).df()
    assert len(mine) == len(theirs), f"{name}: {len(mine)} vs {len(theirs)} rows"
    assert sorted(mine.columns) == sorted(theirs.columns)
    assert _value_hash(mine) == _value_hash(theirs), f"{name}: value mismatch"


def test_entry_smoke(ray_session, entrymod):
    res = entrymod.entry()
    assert res.num_rows >= 0
    assert "url" in res.column_names


def test_fetch_extract_task_empty_frontier(ray_session):
    import pyarrow as pa

    from deepwebharvester_ray.pipelines.crawl import (
        broadcast_frontier_hashes,
        fetch_extract_task,
    )

    batch = pa.table(
        {
            "url": ["http://x.onion/d/1"],
            "html": [b"<html><title>T</title><body>hi</body></html>"],
        }
    )
    out = fetch_extract_task(batch, hashes_ref=broadcast_frontier_hashes([]))
    assert out.num_rows == 0

    hit = fetch_extract_task(
        batch, hashes_ref=broadcast_frontier_hashes(["http://x.onion/d/1"])
    )
    assert hit.num_rows == 1
    assert hit.column("title")[0].as_py() == "T"


def test_stratified_sample_awkward_strata(ray_session, tmp_path):
    """The two-pass hash-cutoff sampler takes exactly ceil(n_g/10) from
    EVERY stratum, including 1-row and non-multiple-of-10 strata, and
    picks exactly the quota smallest hash values (reshard-stable)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import (
        _SPLIT_MULT,
        q_stratified_sample,
    )

    sizes = {"a": 1, "b": 9, "c": 10, "d": 11, "e": 95}
    ids, types = [], []
    nxt = 1000
    for t, n in sizes.items():
        for _ in range(n):
            ids.append(nxt)
            types.append(t)
            nxt += 7
    pq.write_table(
        pa.table({"event_id": pa.array(ids, pa.int64()),
                  "event_type": pa.array(types, pa.string())}),
        str(tmp_path / "events.parquet"),
    )
    out = q_stratified_sample(str(tmp_path)).to_pandas()
    got = out.groupby("event_type")["event_id"].apply(set).to_dict()
    with np.errstate(over="ignore"):
        hv = {i: int(np.uint64(i) * np.uint64(_SPLIT_MULT)) for i in ids}
    for t, n in sizes.items():
        quota = -(-n // 10)
        members = [i for i, ty in zip(ids, types) if ty == t]
        expect = set(sorted(members, key=lambda i: hv[i])[:quota])
        assert got.get(t, set()) == expect, t


def test_flog2_exact_boundaries():
    """frexp-based floor-log2 must be exact at power-of-two boundaries
    (where float log2 flips in the last ulp) up to the 2**53 bound."""
    import numpy as np

    from deepwebharvester_ray.pipelines.queries import _flog2

    xs = np.array(
        [1, 2, 3, 4, 7, 8, 2**31 - 1, 2**31, 2**31 + 1,
         2**52 - 1, 2**52, 2**53 - 1],
        dtype=np.int64,
    )
    assert _flog2(xs).tolist() == [
        int(x).bit_length() - 1 for x in xs.tolist()
    ]
    assert _flog2(np.array([], dtype=np.int64)).size == 0


def test_politeness_audit_boundary_merge_many_blocks(ray_session, tmp_path):
    """The composite-sort + range-disjoint-summary plan must recover
    gaps hidden by block cuts: force many tiny blocks and compare against
    a direct per-host adjacent-diff reference."""
    import collections

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.corpus import HOSTS
    from deepwebharvester_ray.pipelines.queries import q_politeness_audit

    rng = np.random.default_rng(7)
    ids = np.sort(rng.choice(5000, size=700, replace=False)).astype(np.int64)
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64())}),
                   str(tmp_path / "documents.parquet"))
    out = {r["host_idx"]: (r["n_fetches"], r["min_gap_s"])
           for r in q_politeness_audit(str(tmp_path)).take_all()}

    ref = collections.defaultdict(list)
    for i in ids:
        ref[int(i) % HOSTS].append(int(i))
    maxi = np.iinfo(np.int64).max
    for h, ts in ref.items():
        ts.sort()
        gaps = [b - a for a, b in zip(ts, ts[1:])]
        assert out[h] == (len(ts), min(gaps) if gaps else maxi), h
    assert set(out) == set(ref)


def test_line_dedup_cross_block_first_occurrence(ray_session, tmp_path):
    """Global first-occurrence must hold ACROSS blocks: duplicates of one
    line planted in both halves of a 2-block read may only survive at the
    minimal (doc_id, pos) — compared against a direct Python reference of
    the same planting rule."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import q_line_dedup

    n = 1000
    texts = ["shared content line" if i % 50 == 0 else f"uniq {i}"
             for i in range(n)]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        str(tmp_path / "documents.parquet"))

    out = {r["doc_id"]: (r["kept_text"], r["n_kept"])
           for r in q_line_dedup(str(tmp_path)).take_all()}

    seen: set = set()
    ref: dict = {}
    for d in range(n):
        lines = [texts[d] + ("." if d % 2 == 0 else ""),
                 "too few",
                 "this line mentions javascript libraries everywhere."]
        if d % 3 == 0:
            lines.append("a clean second sentence with enough words.")
        kept = [ln for ln in lines if ln not in seen]
        seen.update(lines)
        if kept:
            ref[d] = ("\n".join(kept), len(kept))
    assert out == ref
    # the planted duplicate line must have been dropped everywhere but doc 0
    assert all("shared content line." not in out.get(d, ("", 0))[0]
               for d in range(1, n) if d % 50 == 0)


def test_source_entropy_extremes(ray_session, tmp_path):
    """Entropy envelope pins: a source whose tokens are all identical has
    h_raw = 0; a source of N all-distinct tokens has h_raw = N*floor(log2 N)
    (here 8*3 = 24)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import q_source_entropy

    pq.write_table(
        pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "source": pa.array(["mono", "vary"], pa.string()),
            "text": pa.array(["tok tok tok tok tok tok tok tok",
                              "a1 b2 c3 d4 e5 f6 g7 h8"], pa.string()),
        }),
        str(tmp_path / "documents.parquet"))
    out = {r["source"]: r for r in q_source_entropy(str(tmp_path)).take_all()}
    assert out["mono"]["h_raw"] == 0
    assert out["mono"]["n_distinct"] == 1
    assert out["vary"]["h_raw"] == 8 * 3
    assert out["vary"]["h_milli_per_tok"] == 3000


def test_kmv_overlap_exact_below_k_and_tolerant_above(ray_session, tmp_path):
    """|A∪B| ≤ k ⇒ the KMV sketch IS the set and Jaccard is exact;
    above k the bottom-k estimate must land within the sketch's
    standard-error envelope."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import (_KMV_K,
                                                        q_kmv_overlap)

    # source X/Y: 50 tokens each, exactly 20 shared → union 80 ≤ k,
    # J = 20/80 = 0.25 exactly
    shared = [f"sh{i}" for i in range(20)]
    x_only = [f"xx{i}" for i in range(30)]
    y_only = [f"yy{i}" for i in range(30)]
    # source P/Q: unions far above k → estimate, not exact
    rng = np.random.default_rng(9)
    p_voc = [f"p{i}" for i in range(1500)]
    q_voc = [f"p{i}" for i in range(750, 2250)]   # J = 750/2250 = 1/3
    rows = [
        {"doc_id": 0, "source": "x", "text": " ".join(shared + x_only)},
        {"doc_id": 1, "source": "y", "text": " ".join(shared + y_only)},
        {"doc_id": 2, "source": "p", "text": " ".join(p_voc)},
        {"doc_id": 3, "source": "q", "text": " ".join(q_voc)},
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "source": pa.array([r["source"] for r in rows], pa.string()),
        "text": pa.array([r["text"] for r in rows], pa.string()),
    }), str(tmp_path / "documents.parquet"))

    out = {(r["src_a"], r["src_b"]): r
           for r in q_kmv_overlap(str(tmp_path)).take_all()}
    xy = out[("x", "y")]
    assert xy["k_used"] == 80 and xy["n_common"] == 20
    assert xy["jaccard_ppm"] == 250_000          # exact below k
    pq_row = out[("p", "q")]
    assert pq_row["k_used"] == _KMV_K
    se = 3 * (1 / 3 * 2 / 3 / _KMV_K) ** 0.5     # 3σ envelope
    assert abs(pq_row["jaccard_ppm"] / 1e6 - 1 / 3) < se


def test_retrieval_eval_planted_metrics(ray_session, tmp_path):
    """15 equal-length docs containing 'vector' with tf = 15-i (ranking
    = doc_id order); docs 0, 4, 12 also contain 'stream' (relevant).
    Top-10 catches ranks 1 and 5 -> hits 2/3, MRR 1, P@10 0.2."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import q_retrieval_eval

    rows = []
    for i in range(15):
        tf = 15 - i
        words = ["vector"] * tf
        if i in (0, 4, 12):
            words.append("stream")
        words += ["pad"] * (20 - len(words))
        rows.append({"doc_id": i, "text": " ".join(words)})
    pq.write_table(pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "text": pa.array([r["text"] for r in rows], pa.string()),
    }), str(tmp_path / "documents.parquet"))

    out = {r["query"]: r
           for r in q_retrieval_eval(str(tmp_path)).take_all()}
    v = out["vector"]
    assert v["n_rel"] == 3
    assert v["first_rank"] == 1 and v["rr_ppm"] == 1_000_000
    assert v["prec_ppm"] == 200_000
    assert v["recall_ppm"] == 666_666
    # 'stream' docs never contain 'filter' -> no relevant docs at all
    s = out["stream"]
    assert s["n_rel"] == 0 and s["first_rank"] == 0
    assert s["rr_ppm"] == 0 and s["recall_ppm"] == 0


def test_user_cusum_planted_shift_and_tie(ray_session, tmp_path):
    """User 1: level shift 10c->20c at k=5 of 10 -> D_5 = |10*50-5*150|
    = 250, the unique max.  User 2: constant series -> every interior D
    is 0 and the smallest-k tie rule gives cp_k = 1.  User 3: single
    event -> dropped."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import q_user_cusum

    rows = []
    eid = 0
    for i in range(10):
        rows.append((eid, 1, i, 0.10 if i < 5 else 0.20))
        eid += 1
    for i in range(3):
        rows.append((eid, 2, i, 0.07))
        eid += 1
    rows.append((eid, 3, 0, 5.00))
    base = 1_700_000_000_000_000
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([base + r[2] * 1_000_000 for r in rows],
                       pa.timestamp("us")),
        "value": pa.array([r[3] for r in rows], pa.float64()),
    }), str(tmp_path / "events.parquet"))

    out = {r["user_id"]: r
           for r in q_user_cusum(str(tmp_path)).take_all()}
    assert set(out) == {1, 2}
    u1 = out[1]
    assert u1["n"] == 10 and u1["s_total"] == 150
    assert u1["cusum_max"] == 250 and u1["cp_k"] == 5
    assert u1["cp_ts_us"] == base + 4 * 1_000_000
    u2 = out[2]
    assert u2["cusum_max"] == 0 and u2["cp_k"] == 1


def test_view_overlap_pairs_planted(ray_session, tmp_path):
    """Hand-built windows: chain overlap, containment, equal starts,
    and a disjoint interval — exact pair set and overlap lengths.
    Durations are forced via event_id % 14."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import q_view_overlap_pairs

    DAY = 86_400_000_000
    base = 1_700_000_000_000_000
    # event_id picks duration 1 + eid % 14 days
    rows = [
        # user 1: A=[0,3d) eid=2, B=[1d,2d) eid=14 (contained, 1d),
        # C=[2d,4d) eid=15 -> A∩C=[2d,3d), B∩C=∅ (half-open)
        (2, 1, 0, "view"),      # dur 3d
        (14, 1, 1, "view"),     # dur 1d
        (15, 1, 2, "view"),     # dur 2d
        # user 2: equal starts D eid=28 (dur 1d), E eid=30 (dur 3d)
        (28, 2, 10, "view"),
        (30, 2, 10, "view"),
        # user 2: far-away disjoint F
        (42, 2, 100, "view"),
        # non-view noise
        (50, 1, 0, "click"),
    ]
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([base + r[2] * DAY for r in rows],
                       pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    }), str(tmp_path / "events.parquet"))

    out = {(r["user_id"], r["eid_a"], r["eid_b"]): r["overlap_us"]
           for r in q_view_overlap_pairs(str(tmp_path)).take_all()}
    assert out == {
        (1, 2, 14): 1 * DAY,    # B inside A
        (1, 2, 15): 1 * DAY,    # A∩C
        (2, 28, 30): 1 * DAY,   # equal start, shorter first by eid
    }


def test_best_split_perfect_separation(ray_session, tmp_path):
    """4 short 'en' docs (bin 0) vs 6 long 'xx' docs (bin 3): the stump
    must cut at bin 0 and a perfect split scores exactly n * 10^6."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import q_best_split

    langs = ["en"] * 4 + ["xx"] * 6
    ncs = [100] * 4 + [1000] * 6
    pq.write_table(pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "text": pa.array(["t"] * 10, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(["s"] * 10, pa.string()),
        "n_chars": pa.array(ncs, pa.int64()),
    }), str(tmp_path / "documents.parquet"))

    out = q_best_split(str(tmp_path)).take_all()
    assert len(out) == 1
    r = out[0]
    assert r["split_bin"] == 0
    assert r["n_left"] == 4 and r["pos_left"] == 4
    assert r["n_right"] == 6 and r["pos_right"] == 0
    assert r["score_ppm"] == 10 * 10**6     # perfect split == n * 1e6


def test_loo_encoding_exact_and_singleton_fallback(ray_session, tmp_path):
    """Type 'a': values 1.00/2.00/3.00 -> LOO means 2.50/2.00/1.50.
    Type 'b' is a singleton -> global LOO fallback over all 4 rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import q_loo_encoding

    rows = [(0, "a", 1.00), (1, "a", 2.00), (2, "a", 3.00),
            (3, "b", 10.00)]
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "value": pa.array([r[2] for r in rows], pa.float64()),
    }), str(tmp_path / "events.parquet"))

    out = {r["event_id"]: r["enc_milli"]
           for r in q_loo_encoding(str(tmp_path)).take_all()}
    assert out[0] == 250_000   # (200+300)c * 1000 // 2 = 2.50 in milli-cents
    assert out[1] == 200_000
    assert out[2] == 150_000
    # singleton 'b': (100+200+300)c * 1000 // 3 = 2.00
    assert out[3] == 200_000


def test_zipf_spectrum_planted_line(ray_session, tmp_path):
    """Planted spectrum: 1 token at freq 16 (bin 4), 4 at freq 4
    (bin 2), 16 at freq 1 (bin 0) -> y = 4 - x exactly -> slope -1
    (num/den = -24/24)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import q_zipf_spectrum

    words = (["aa"] * 16
             + [f"b{i}" for i in range(4) for _ in range(4)]
             + [f"c{i}" for i in range(16)])
    pq.write_table(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array([" ".join(words)], pa.string()),
    }), str(tmp_path / "documents.parquet"))

    out = {r["bin"]: r for r in q_zipf_spectrum(str(tmp_path)).take_all()}
    assert {b: r["n_tokens"] for b, r in out.items()} == {0: 16, 2: 4, 4: 1}
    r = out[0]
    assert r["slope_num"] == -24 and r["slope_den"] == 24


def test_benford_audit_planted(ray_session, tmp_path):
    """Type 'a': values with leading digits 1,1,2,9 (incl. a multi-digit
    1234.56 -> digit 1) -> obs 500000/250000/250000 ppm; zero/negative
    rows excluded by definition."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import (_BENFORD_PPM,
                                                        q_benford_audit)

    vals = [1.00, 1234.56, 2.50, 95.00, 0.00, -3.00]
    pq.write_table(pa.table({
        "event_type": pa.array(["a"] * 6, pa.string()),
        "value": pa.array(vals, pa.float64()),
    }), str(tmp_path / "events.parquet"))

    out = {r["digit"]: r for r in q_benford_audit(str(tmp_path)).take_all()}
    assert {d: r["n"] for d, r in out.items()} == {1: 2, 2: 1, 9: 1}
    assert out[1]["obs_ppm"] == 500_000
    assert out[1]["benford_ppm"] == _BENFORD_PPM[0] == 301_030
    assert out[1]["dev_ppm"] == 500_000 - 301_030
    assert out[9]["obs_ppm"] == 250_000
    assert sum(_BENFORD_PPM) == 1_000_000


def test_auc_score_known_cases(ray_session, tmp_path):
    """Perfect separation -> AUC 1; one inversion among 2x2 -> 3/4;
    all-tied scores -> exactly 1/2 via the ties term."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import q_auc_score

    def write(ncs, langs):
        pq.write_table(pa.table({
            "doc_id": pa.array(range(len(ncs)), pa.int64()),
            "text": pa.array(["t"] * len(ncs), pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(["s"] * len(ncs), pa.string()),
            "n_chars": pa.array(ncs, pa.int64()),
        }), str(tmp_path / "documents.parquet"))

    # perfect: all en longer than all xx
    write([10, 20, 100, 200], ["xx", "xx", "en", "en"])
    r = q_auc_score(str(tmp_path)).take_all()[0]
    assert (r["n_pos"], r["n_neg"]) == (2, 2)
    assert r["auc_num2"] == r["auc_den2"] == 8          # AUC = 1

    # one inversion: en at 10 loses to both negs... use en=[50,200],
    # xx=[100,20] -> pairs: (50>20)W (50<100)L (200>100)W (200>20)W
    write([50, 200, 100, 20], ["en", "en", "xx", "xx"])
    r = q_auc_score(str(tmp_path)).take_all()[0]
    assert (r["auc_num2"], r["auc_den2"]) == (6, 8)     # AUC = 3/4

    # all tied -> AUC exactly 1/2
    write([7, 7, 7, 7], ["en", "en", "xx", "xx"])
    r = q_auc_score(str(tmp_path)).take_all()[0]
    assert (r["auc_num2"], r["auc_den2"]) == (4, 8)


def test_raking_weights_two_marginal_attainment(ray_session, tmp_path):
    """Skewed 2x2 contingency ([30,10],[10,50]): after raking, the
    WEIGHTED source marginals and lang marginals are each within 0.1 %
    of uniform — which no single-marginal rebalance achieves — and the
    run is deterministic."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import (_RAKE_SCALE,
                                                        q_raking_weights)

    counts = {("s0", "en"): 30, ("s0", "fr"): 10,
              ("s1", "en"): 10, ("s1", "fr"): 50}
    rows = []
    did = 0
    for (s, lg), n in counts.items():
        for _ in range(n):
            rows.append((did, s, lg))
            did += 1
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array(["t"] * len(rows), pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[1] for r in rows], pa.string()),
        "n_chars": pa.array([1] * len(rows), pa.int64()),
    }), str(tmp_path / "documents.parquet"))

    out = q_raking_weights(str(tmp_path)).take_all()
    assert len(out) == 100
    n_tot = 100
    tgt = n_tot * _RAKE_SCALE // 2
    src_m, lang_m = {}, {}
    for r in out:
        src_m[r["source"]] = src_m.get(r["source"], 0) + r["weight_ppb"]
        lang_m[r["lang"]] = lang_m.get(r["lang"], 0) + r["weight_ppb"]
    for m in (src_m, lang_m):
        assert len(m) == 2
        for v in m.values():
            assert abs(v - tgt) < tgt // 500   # within 0.2 % (floor slack)
    # docs in the same cell share one weight; determinism across runs
    w_cell = {}
    for r in out:
        w_cell.setdefault((r["source"], r["lang"]), set()).add(
            r["weight_ppb"])
    assert all(len(v) == 1 for v in w_cell.values())
    again = {r["doc_id"]: r["weight_ppb"]
             for r in q_raking_weights(str(tmp_path)).take_all()}
    assert all(again[r["doc_id"]] == r["weight_ppb"] for r in out)


def test_lateness_audit_planted_watermark(ray_session, tmp_path):
    """Arrival order 0..4 with event times (hours) 10, 0.5, 9.5, 12, 12:
    wm before each = -inf, 10, 10, 10, 12.  With 1 h allowed lag only
    the 0.5 h event (arrival 1) is late (9.5 >= 10-1 is on time; the
    first arrival can never be late)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import q_lateness_audit

    H = 3_600 * 10**6
    base = 1_700_000_000_000_000
    times_h = [10.0, 0.5, 9.5, 12.0, 12.0]
    pq.write_table(pa.table({
        "event_id": pa.array(range(5), pa.int64()),
        "event_type": pa.array(["a"] * 5, pa.string()),
        "ts": pa.array([base + int(h * H) for h in times_h],
                       pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))

    out = q_lateness_audit(str(tmp_path)).take_all()
    assert len(out) == 1
    r = out[0]
    assert r["n_events"] == 5 and r["n_late"] == 1
    assert r["late_ppm"] == 200_000


def test_frequent_pairs_apriori_planted(ray_session, tmp_path):
    """10 docs, min_support = 2: tokens x,y co-occur in 3 docs (pair
    kept, support 3); y,z co-occur once (pruned); token 'rare' appears
    once so no pair containing it ever reaches counting (a-priori
    pruning)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import q_frequent_pairs

    texts = [
        "x y", "x y", "x y z", "z w", "z w",
        "w q", "q rare", "q", "w", "z",
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), str(tmp_path / "documents.parquet"))

    out = {(r["token_a"], r["token_b"]): r["n_docs"]
           for r in q_frequent_pairs(str(tmp_path)).take_all()}
    assert out == {("x", "y"): 3, ("w", "z"): 2}


def test_skipgram_counts_window_semantics(ray_session, tmp_path):
    """'a b c d': window 3 pairs = ab,ac,ad,bc,bd,cd each once; doc
    boundary blocks cross-doc pairs; canonical min/max merges both
    directions ('b a' again -> ab count 2)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import q_skipgram_counts

    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["a b c d", "b a"], pa.string()),
    }), str(tmp_path / "documents.parquet"))

    out = {(r["token_a"], r["token_b"]): r["n"]
           for r in q_skipgram_counts(str(tmp_path)).take_all()}
    assert out == {("a", "b"): 2, ("a", "c"): 1, ("a", "d"): 1,
                   ("b", "c"): 1, ("b", "d"): 1, ("c", "d"): 1}


def test_dedup_eval_planted_counts(ray_session, tmp_path):
    """Two identical pairs (J=1 -> in truth AND guaranteed found: every
    band collides) plus two disjoint docs (J=0, excluded) -> all
    metrics exact."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import q_dedup_eval

    t1 = "alpha beta gamma delta epsilon zeta eta theta " * 4
    t2 = "one two three four five six seven eight nine " * 4
    t3 = "red green blue cyan magenta yellow black white " * 4
    texts = [t1, t1, t2, t2, t3, "totally different words here now"]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), str(tmp_path / "documents.parquet"))

    r = q_dedup_eval(str(tmp_path)).take_all()[0]
    assert r["n_truth"] == 2 and r["n_found"] == 2 and r["n_hit"] == 2
    assert r["recall_ppm"] == 1_000_000
    assert r["precision_ppm"] == 1_000_000


def test_ks_test_planted_distributions(ray_session, tmp_path):
    """Identical samples -> D = 0; disjoint supports -> D = 1 (d_num ==
    d_den); a half-shifted sample -> the exact rational in between."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import q_ks_test

    def write(vals_a, vals_b):
        n = len(vals_a) + len(vals_b)
        ts = [datetime.datetime(2025, 1, 1)] * n
        pq.write_table(pa.table({
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([0] * n, pa.int64()),
            "event_type": pa.array(
                ["click"] * len(vals_a) + ["purchase"] * len(vals_b)),
            "value": pa.array(vals_a + vals_b, pa.float64()),
            "props": pa.array([""] * n, pa.string()),
        }), str(tmp_path / "events.parquet"))

    write([1.0, 2.0, 3.0], [1.0, 2.0, 3.0])
    r = q_ks_test(str(tmp_path)).to_pylist()[0]
    assert (r["n_a"], r["n_b"], r["d_num"], r["ks_ppm"]) == (3, 3, 0, 0)

    write([1.0, 2.0], [10.0, 20.0, 30.0])
    r = q_ks_test(str(tmp_path)).to_pylist()[0]
    assert r["d_num"] == r["d_den"] == 6 and r["ks_ppm"] == 1_000_000

    # a={1,2,3,4}, b={3,4,5,6}: D = max|F_a-F_b| = 1/2 -> 8/16
    write([1.0, 2.0, 3.0, 4.0], [3.0, 4.0, 5.0, 6.0])
    r = q_ks_test(str(tmp_path)).to_pylist()[0]
    assert (r["d_num"], r["d_den"], r["ks_ppm"]) == (8, 16, 500_000)


def test_mutual_info_planted_tables(ray_session, tmp_path):
    """A perfectly independent 2×2 table -> every chi2_num = 0 and
    pmi_flog2 = 0; a perfectly dependent (diagonal) one -> positive
    diagonal PMI; marginals always re-sum to n."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import q_mutual_info

    def write(langs, sources):
        n = len(langs)
        pq.write_table(pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["x"] * n, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([1] * n, pa.int64()),
        }), str(tmp_path / "documents.parquet"))

    # independent: each (lang, source) cell = product of marginals
    write(["en", "en", "fr", "fr"], ["s1", "s2", "s1", "s2"])
    rows = q_mutual_info(str(tmp_path)).to_pylist()
    assert len(rows) == 4
    assert all(r["chi2_num"] == 0 for r in rows)
    assert all(r["pmi_flog2"] == 0 for r in rows)
    assert sum(r["n_xy"] for r in rows) == 4

    # dependent: lang determines source exactly
    write(["en", "en", "fr", "fr"], ["s1", "s1", "s2", "s2"])
    rows = {(r["lang"], r["source"]): r
            for r in q_mutual_info(str(tmp_path)).to_pylist()}
    assert set(rows) == {("en", "s1"), ("fr", "s2")}
    r = rows[("en", "s1")]
    # n_xy*n = 8, n_x*n_y = 4 -> flog2 envelope = 1 bit
    assert r["pmi_flog2"] == 1 and r["g_part"] == 2
    assert r["chi2_num"] == (4 * 2 - 2 * 2) ** 2 and r["chi2_den"] == 4 * 2 * 2


def test_chi2_tokens_planted_discriminator(ray_session, tmp_path):
    """A token appearing in EVERY en doc and NO fr doc is the top en
    feature with the hand-computed exact rational; a token in every doc
    (tot_t = N) is excluded (den = 0); shared-but-balanced tokens score
    num = 0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import q_chi2_tokens

    texts = ["common engword x", "common engword y",
             "common frword x", "common frword y"]
    langs = ["en", "en", "fr", "fr"]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(["s"] * 4, pa.string()),
        "n_chars": pa.array([1] * 4, pa.int64()),
    }), str(tmp_path / "documents.parquet"))

    rows = {(r["lang"], r["token"]): r
            for r in q_chi2_tokens(str(tmp_path)).take_all()}
    assert all(tok != "common" for (_, tok) in rows)  # den = 0 excluded
    r = rows[("en", "engword")]
    # a=2 b=0 c=0 d=2, N=4: num = 4*(2*2)^2 = 64; den = 2*2*2*2 = 16
    assert (r["chi2_num"], r["chi2_den"]) == (64, 16)
    # balanced tokens (x in one en + one fr doc): ad - bc = 1*1 - 1*1 = 0
    assert rows[("en", "x")]["chi2_num"] == 0


def test_local_clustering_invariants(ray_session):
    """Exact rational invariants vs the global statistic: Σ tri over
    nodes = 3 · n_triangles (each triangle touches 3 nodes), Σ deg =
    2m (restricted to the deg ≥ 2 output this is ≤ 2m), and 0 ≤ cc ≤ 1
    as num/den bounds."""
    from deepwebharvester_ray.pipelines.queries import (
        q_local_clustering,
        q_triangle_count,
    )

    out = q_local_clustering("/root/testdata/sf0.001").take_all()
    n_tri = q_triangle_count("/root/testdata/sf0.001").to_pylist()[0][
        "n_triangles"]
    assert sum(r["tri"] for r in out) == 3 * n_tri
    assert all(0 <= r["cc_num"] <= r["cc_den"] for r in out)
    assert all(r["cc_den"] == r["deg"] * (r["deg"] - 1) for r in out)
    assert all(r["deg"] >= 2 for r in out)


def test_value_gini_planted_distributions(ray_session, tmp_path):
    """Equal values -> G = 0; maximal concentration (one event holds
    all mass) -> G = (n-1)/n as the exact rational."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import q_value_gini

    def write(vals):
        n = len(vals)
        pq.write_table(pa.table({
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array([datetime.datetime(2025, 1, 1)] * n,
                           pa.timestamp("us")),
            "user_id": pa.array([0] * n, pa.int64()),
            "event_type": pa.array(["click"] * n, pa.string()),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array([""] * n, pa.string()),
        }), str(tmp_path / "events.parquet"))

    write([5.0, 5.0, 5.0, 5.0])
    r = q_value_gini(str(tmp_path)).take_all()[0]
    assert r["gini_num"] == 0 and r["gini_ppm"] == 0
    assert r["n"] == 4 and r["sum_cents"] == 2000

    # one event holds all mass (others get the 0.00 floor): x = (0,0,0,K)
    # -> num = (2*4-4-1)*K = 3K, den = 4K -> G = 3/4
    write([0.001, 0.001, 0.001, 10.0])
    r = q_value_gini(str(tmp_path)).take_all()[0]
    assert r["gini_num"] * 4 == r["gini_den"] * 3
    assert r["gini_ppm"] == 750_000


def test_doc_chunks_window_boundaries(ray_session, tmp_path):
    """Window emission rule pinned at the exact boundaries: a 64-token
    doc emits ONE chunk (the stride-48 tail would lie wholly inside
    window 0 — pure duplicate, excluded); 65 tokens emit two (the tail
    adds one new token); 200 tokens emit starts 0/48/96/144 and stop
    (start 192 + overlap 16 ≥ 200); empty docs emit nothing."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import q_doc_chunks

    def toks(d, n):
        return " ".join(f"d{d}t{i}" for i in range(n))

    texts = [toks(0, 200), toks(1, 64), toks(2, 65), "", toks(4, 1)]
    n = len(texts)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(["s"] * n, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), str(tmp_path / "documents.parquet"))

    rows = q_doc_chunks(str(tmp_path)).take_all()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {0, 1, 2, 4}
    assert [r["chunk_id"] for r in by_doc[0]] == [0, 1, 2, 3]
    assert [r["n_tokens"] for r in by_doc[0]] == [64, 64, 64, 56]
    # chunk 3 of doc 0 covers tokens 144..199 (tail kept, truncation-free)
    assert by_doc[0][3]["chunk_text"].split()[-1] == "d0t199"
    assert by_doc[0][3]["chunk_text"].split()[0] == "d0t144"
    assert [r["n_tokens"] for r in by_doc[1]] == [64]
    assert [r["n_tokens"] for r in by_doc[2]] == [64, 17]
    assert by_doc[2][1]["chunk_text"].split()[0] == "d2t48"
    assert [r["n_tokens"] for r in by_doc[4]] == [1]


def test_spearman_corr_planted_monotone(ray_session, tmp_path):
    """Values rising with time -> rho = +1 exactly (d2 = 0); values
    falling -> rho = -1 exactly (d2 = n(n^2-1)/3) — the two closed-form
    endpoints of the rank statistic, one type each."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import q_spearman_corr

    n_per = 7
    base = datetime.datetime(2025, 1, 1)
    ts, vals, types, eids = [], [], [], []
    for i in range(n_per):            # up: value rank == time rank
        ts.append(base + datetime.timedelta(minutes=i))
        vals.append(1.0 + i)
        types.append("up")
        eids.append(i)
    for i in range(n_per):            # down: value rank reverses time
        ts.append(base + datetime.timedelta(minutes=i))
        vals.append(float(n_per - i))
        types.append("down")
        eids.append(100 + i)
    n = len(vals)
    pq.write_table(pa.table({
        "event_id": pa.array(eids, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([0] * n, pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array([""] * n, pa.string()),
    }), str(tmp_path / "events.parquet"))

    rows = {r["event_type"]: r
            for r in q_spearman_corr(str(tmp_path)).take_all()}
    den = n_per * (n_per * n_per - 1)
    up = rows["up"]
    assert (up["n"], up["d2"]) == (n_per, "0")
    assert up["rho_num"] == up["rho_den"] == str(den)
    down = rows["down"]
    assert down["d2"] == str(den // 3)          # sum of (2i-n-1)^2
    assert int(down["rho_num"]) == -den and int(down["rho_den"]) == den


def test_quote_spans_random_vs_bruteforce(ray_session, tmp_path):
    """Seeded random corpus with injected shared runs: the hash-based
    engine must match a pure-Python STRING-equality reference (gram
    dict → diagonal runs) on every pair's (span_tokens, n_matches)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import q_quote_spans

    rng = np.random.default_rng(42)
    k = 8
    docs = []
    for d in range(24):
        n = int(rng.integers(10, 60))
        toks = [f"d{d}w{int(rng.integers(0, 30))}" for _ in range(n)]
        docs.append(toks)
    # inject shared runs of random lengths at random offsets
    for (a, b) in [(0, 5), (3, 9), (3, 17), (11, 12)]:
        ln = int(rng.integers(k, 25))
        run = [f"s{a}_{b}_{j}" for j in range(ln)]
        pa_ = int(rng.integers(0, max(1, len(docs[a]) - 1)))
        pb_ = int(rng.integers(0, max(1, len(docs[b]) - 1)))
        docs[a][pa_:pa_] = run
        docs[b][pb_:pb_] = run

    texts = [" ".join(t) for t in docs]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), str(tmp_path / "documents.parquet"))

    # string-equality reference: gram -> [(doc, pos)], diagonal runs
    from collections import defaultdict
    grams = defaultdict(list)
    for d, toks in enumerate(docs):
        for i in range(len(toks) - k + 1):
            grams[" ".join(toks[i:i + k])].append((d, i))
    matches = defaultdict(list)   # (a,b) -> [(pa, diag)]
    for occ in grams.values():
        for x in range(len(occ)):
            for y in range(x + 1, len(occ)):
                (da, ia), (db, ib) = occ[x], occ[y]
                if da == db:
                    continue
                if da > db:
                    (da, ia), (db, ib) = (db, ib), (da, ia)
                matches[(da, db)].append((ia, ia - ib))
    expect = {}
    for pair, ms in matches.items():
        by_diag = defaultdict(set)
        for p, dg in ms:
            by_diag[dg].add(p)
        best = 0
        for dg, ps in by_diag.items():
            ps = sorted(ps)
            run = 1
            for i in range(1, len(ps)):
                run = run + 1 if ps[i] == ps[i - 1] + 1 else 1
                best = max(best, run)
            best = max(best, 1)
        expect[pair] = (k + best - 1, len(ms))

    got = {(r["id_a"], r["id_b"]): (r["span_tokens"], r["n_matches"])
           for r in q_quote_spans(str(tmp_path)).take_all()}
    assert got == expect


def test_user_window_1h_random_vs_bruteforce(ray_session, tmp_path):
    """Seeded random events (clustered timestamps so windows overlap
    richly, with exact-boundary and same-ts peers): every row's engine
    window sum must equal the brute-force trailing-hour sum."""
    import datetime

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import q_user_window_1h

    rng = np.random.default_rng(7)
    base = datetime.datetime(2025, 1, 1)
    rows = []
    for eid in range(300):
        uid = int(rng.integers(0, 12))
        # cluster offsets so 1h windows overlap; multiples of 15 min
        # produce exact-boundary hits, duplicates produce ts peers
        off_s = int(rng.integers(0, 16)) * 900
        rows.append((eid, uid, base + datetime.timedelta(seconds=off_s),
                     float(rng.integers(0, 500)) / 100.0))
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array(["click"] * len(rows), pa.string()),
        "value": pa.array([r[3] for r in rows], pa.float64()),
        "props": pa.array([""] * len(rows), pa.string()),
    }), str(tmp_path / "events.parquet"))

    import math
    cents = {r[0]: math.floor(r[3] * 100.0) for r in rows}
    expect = {}
    for eid, uid, ts, _ in rows:
        lo = ts - datetime.timedelta(hours=1)
        expect[eid] = sum(
            cents[e2] for e2, u2, t2, _v in rows
            if u2 == uid and lo <= t2 <= ts)

    got = {r["event_id"]: r["win_sum_1h"]
           for r in q_user_window_1h(str(tmp_path)).take_all()}
    assert got == expect


def test_bot_score_planted_cadence(ray_session, tmp_path):
    """Metronome user (6 events exactly 60 s apart) -> m2 = 0, flagged;
    irregular user -> not flagged; 2-event user -> one gap, below
    BOT_MIN_GAPS; single-event user -> no row at all."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import q_bot_score

    base = datetime.datetime(2025, 1, 1)
    rows = []
    for i in range(6):                        # user 1: metronome
        rows.append((1, base + datetime.timedelta(seconds=60 * i)))
    for off in (0, 10, 500, 505, 2000, 9000):  # user 2: human-ragged
        rows.append((2, base + datetime.timedelta(seconds=off)))
    rows.append((3, base))                     # user 3: one gap only
    rows.append((3, base + datetime.timedelta(seconds=60)))
    rows.append((4, base))                     # user 4: no gaps
    # user 5: a same-second burst then a 5-year hiatus — m2 = 4G² ≈
    # 1.02e17, where the pre-fix 100·m2 wrapped int64 negative and
    # self-flagged the maximally-irregular user
    off = 0
    for gap in (0, 0, 0, 0, 0, 160_000_000):
        off += gap
        rows.append((5, base + datetime.timedelta(seconds=off)))
    n = len(rows)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array(["click"] * n, pa.string()),
        "value": pa.array([1.0] * n, pa.float64()),
        "props": pa.array([""] * n, pa.string()),
    }), str(tmp_path / "events.parquet"))

    out = {r["user_id"]: r for r in q_bot_score(str(tmp_path)).take_all()}
    assert set(out) == {1, 2, 3, 5}
    assert (out[1]["n_gaps"], out[1]["m2"], out[1]["is_bot"]) == (5, 0, 1)
    assert out[2]["n_gaps"] == 5 and out[2]["is_bot"] == 0
    assert out[3]["n_gaps"] == 1 and out[3]["is_bot"] == 0
    assert out[5]["m2"] > 2**63 // 100 and out[5]["is_bot"] == 0


def test_conversion_curve_planted_censoring(ray_session, tmp_path):
    """Hand-built cohort: u1 converts at lag 2 (2.5d floored); u2 never
    converts (censored at 9d); u3's purchase PREDATES the first view ->
    censored at 7d (the funnel ordering rule); u4 has no view ->
    excluded but its click defines 'now'.  Suffix n_risk pinned."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import q_conversion_curve

    base = datetime.datetime(2025, 1, 1)

    def at(days):
        return base + datetime.timedelta(days=days)

    rows = [
        (1, at(0), "view"), (1, at(2.5), "purchase"),
        (2, at(1), "view"),
        (3, at(0), "purchase"), (3, at(3), "view"),
        (4, at(10), "click"),
    ]
    n = len(rows)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([1.0] * n, pa.float64()),
        "props": pa.array([""] * n, pa.string()),
    }), str(tmp_path / "events.parquet"))

    out = [(r["day"], r["n_risk"], r["n_conv"], r["n_cens"])
           for r in q_conversion_curve(str(tmp_path)).take_all()]
    assert out == [(2, 3, 1, 0), (7, 2, 0, 1), (9, 1, 0, 1)]


def test_systematic_resample_exact_total(ray_session, tmp_path):
    """Hand-computed grid on weights (1,1,2), N=3, W=4: copies =
    (0,1,2) — and the hard invariant Sigma copies == N at an awkward
    size (17 docs, ragged weights)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import q_systematic_resample

    def write(weights):
        n = len(weights)
        pq.write_table(pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["x"] * n, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array(["s"] * n, pa.string()),
            "n_chars": pa.array(weights, pa.int64()),
        }), str(tmp_path / "documents.parquet"))

    write([1, 1, 2])
    out = q_systematic_resample(str(tmp_path)).take_all()
    assert [r["copies"] for r in out] == [0, 1, 2]

    ragged = [3, 0, 7, 1, 1, 5, 2, 9, 4, 1, 6, 2, 8, 1, 3, 5, 2]
    write(ragged)
    out = q_systematic_resample(str(tmp_path)).take_all()
    assert sum(r["copies"] for r in out) == len(ragged)
    assert all(r["copies"] >= 0 for r in out)


def test_quote_spans_planted_geometry(ray_session, tmp_path):
    """Known span geometry: a 20-token copied run -> span 20 with 13
    matched windows on one diagonal; two disjoint 10-token runs ->
    span 10 with 6 matches; an exactly-8-token share -> span 8 / 1
    match; a doc whose only repetition is INTERNAL pairs with nobody."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import q_quote_spans

    share20 = [f"s{i}" for i in range(20)]
    run10a = [f"a{i}" for i in range(10)]
    run10b = [f"b{i}" for i in range(10)]
    share8 = [f"e{i}" for i in range(8)]
    rep8 = [f"r{i}" for i in range(8)]

    def words(prefix, n):
        return [f"{prefix}{i}" for i in range(n)]

    texts = [
        " ".join(words("p", 10) + share20 + words("q", 10)),       # 0
        " ".join(words("u", 5) + share20 + words("v", 15)),        # 1
        " ".join(run10a + words("m", 9) + run10b),                 # 2
        " ".join(words("n", 7) + run10b + words("o", 9) + run10a), # 3
        " ".join(share8 + words("g", 12)),                         # 4
        " ".join(words("h", 12) + share8),                         # 5
        " ".join(rep8 + words("j", 9) + rep8),                     # 6 internal only
    ]
    n = len(texts)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(["s"] * n, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), str(tmp_path / "documents.parquet"))

    rows = {(r["id_a"], r["id_b"]): (r["span_tokens"], r["n_matches"])
            for r in q_quote_spans(str(tmp_path)).take_all()}
    assert rows == {
        (0, 1): (20, 13),
        (2, 3): (10, 6),
        (4, 5): (8, 1),
    }


def test_k_anonymity_planted_cells(ray_session, tmp_path):
    """Three planted quasi-identifier cells pin both flags: 4 members
    one bucket (fails k and l), 5 members two buckets (passes k, fails
    l), 6 members three buckets (passes both)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import q_k_anonymity

    bals, nats, segs = [], [], []

    def cell(nat, seg, balances):
        for b in balances:
            nats.append(nat)
            segs.append(seg)
            bals.append(b)

    cell(1, "AUTO", [1500.0] * 4)                       # n=4, l=1
    cell(2, "AUTO", [500.0, 500.0, 500.0, 2500.0, 2500.0])   # n=5, l=2
    cell(3, "HOME", [0.0, 0.0, 1200.0, 1200.0, 3400.0, 3400.0])  # n=6, l=3
    n = len(bals)
    pq.write_table(pa.table({
        "c_custkey": pa.array(range(n), pa.int64()),
        "c_name": pa.array([f"c{i}" for i in range(n)], pa.string()),
        "c_nationkey": pa.array(nats, pa.int32()),
        "c_acctbal": pa.array(bals, pa.float64()),
        "c_mktsegment": pa.array(segs, pa.string()),
    }), str(tmp_path / "customer.parquet"))

    rows = {(r["nation"], r["segment"]):
            (r["n"], r["l_distinct"], r["k_ok"], r["l_ok"])
            for r in q_k_anonymity(str(tmp_path)).take_all()}
    assert rows == {
        (1, "AUTO"): (4, 1, 0, 0),
        (2, "AUTO"): (5, 2, 1, 0),
        (3, "HOME"): (6, 3, 1, 1),
    }


def test_welch_ttest_known_value(ray_session, tmp_path):
    """Hand-computed Welch t² on a tiny planted sample, exact rational:
    a = (1, 3) cents (100, 300), b = (2, 2, 8) cents (200, 200, 800)."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import q_welch_ttest

    vals = [1.0, 3.0] + [2.0, 2.0, 8.0]
    types = ["click"] * 2 + ["purchase"] * 3
    n = len(vals)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([datetime.datetime(2025, 1, 1)] * n,
                       pa.timestamp("us")),
        "user_id": pa.array([0] * n, pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array([""] * n, pa.string()),
    }), str(tmp_path / "events.parquet"))

    r = q_welch_ttest(str(tmp_path)).to_pylist()[0]
    n1, s1, q1 = 2, 400, 100**2 + 300**2
    n2, s2, q2 = 3, 1200, 2 * 200**2 + 800**2
    d = s1 * n2 - s2 * n1
    num = d * d * (n1 - 1) * (n2 - 1)
    den = ((n1 * q1 - s1 * s1) * n2 * n2 * (n2 - 1)
           + (n2 * q2 - s2 * s2) * n1 * n1 * (n1 - 1))
    assert (r["n_a"], r["n_b"], r["sum_a"], r["sum_b"]) == (n1, n2, s1, s2)
    assert (r["t2_num"], r["t2_den"]) == (str(num), str(den))
    assert r["t2_milli"] == 1000 * num // den


def test_mann_whitney_brute_force(ray_session, tmp_path):
    """Brute-force doubled-U pair count (wins·2 + ties) on a planted
    tied sample must equal the histogram-identity engine output, and
    the z² rational must match the hand formula — covering ties ACROSS
    the two groups (the midrank case a tie-free sample cannot)."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import q_mann_whitney

    a = [1.0, 2.0, 2.0, 5.0]          # clicks
    b = [2.0, 3.0, 5.0, 5.0, 7.0]     # purchases
    vals = a + b
    types = ["click"] * len(a) + ["purchase"] * len(b)
    n = len(vals)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([datetime.datetime(2025, 1, 1)] * n,
                       pa.timestamp("us")),
        "user_id": pa.array([0] * n, pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array([""] * n, pa.string()),
    }), str(tmp_path / "events.parquet"))

    r = q_mann_whitney(str(tmp_path)).to_pylist()[0]
    u2 = sum(2 if x > y else (1 if x == y else 0) for x in a for y in b)
    n1, n2 = len(a), len(b)
    nn = n1 + n2
    from collections import Counter
    t = Counter([int(v * 100) for v in vals])
    tsum = sum(c**3 - c for c in t.values())
    d = u2 - n1 * n2
    z2_num = 3 * nn * (nn - 1) * d * d
    z2_den = n1 * n2 * ((nn + 1) * nn * (nn - 1) - tsum)
    assert (r["n_a"], r["n_b"], r["u2_a"]) == (n1, n2, u2)
    assert (r["tsum"], r["z2_num"], r["z2_den"]) == (
        str(tsum), str(z2_num), str(z2_den))
    assert r["z2_milli"] == 1000 * z2_num // z2_den


def test_kruskal_h_brute_force(ray_session, tmp_path):
    """Direct midrank computation (scipy-style, exact fractions) on a
    planted 3-group sample with cross-group ties must equal the
    histogram-identity engine output — including the tie-corrected
    exact rational and the k=2 consistency check against the
    mann_whitney z² (H with k=2 equals z² exactly)."""
    import datetime
    from collections import Counter
    from fractions import Fraction

    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import q_kruskal_h

    groups = {
        "click": [1.0, 2.0, 2.0, 5.0],
        "purchase": [2.0, 3.0, 5.0, 5.0, 7.0],
        "view": [1.0, 4.0, 7.0, 7.0],
    }
    vals, types = [], []
    for t, vs in groups.items():
        vals += vs
        types += [t] * len(vs)
    n = len(vals)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([datetime.datetime(2025, 1, 1)] * n,
                       pa.timestamp("us")),
        "user_id": pa.array([0] * n, pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array([""] * n, pa.string()),
    }), str(tmp_path / "events.parquet"))

    r = q_kruskal_h(str(tmp_path)).to_pylist()[0]

    # direct midranks over the pooled sample (exact fractions)
    cents = sorted(int(v * 100) for v in vals)
    mid = {}
    i = 0
    while i < len(cents):
        j = i
        while j < len(cents) and cents[j] == cents[i]:
            j += 1
        mid[cents[i]] = Fraction(i + 1 + j, 2)  # avg of ranks i+1..j
        i = j
    rs = {t: sum(mid[int(v * 100)] for v in vs)
          for t, vs in groups.items()}
    h_u = Fraction(12, n * (n + 1)) * sum(
        rs[t] ** 2 / len(vs) for t, vs in groups.items()) - 3 * (n + 1)
    t = Counter(cents)
    tsum = sum(c ** 3 - c for c in t.values())
    h = h_u / (1 - Fraction(tsum, n ** 3 - n))
    assert r["k"] == len(groups) and r["n"] == n
    assert r["tsum"] == str(tsum)
    assert Fraction(int(r["h_num"]), int(r["h_den"])) == h
    assert r["h_milli"] == (1000 * h.numerator) // h.denominator

    # k=2 degenerate case: H equals the mann_whitney tie-corrected z²
    for fn in (tmp_path / "events.parquet",):
        a, b = groups["click"], groups["purchase"]
        vals2 = a + b
        types2 = ["click"] * len(a) + ["purchase"] * len(b)
        pq.write_table(pa.table({
            "event_id": pa.array(range(len(vals2)), pa.int64()),
            "ts": pa.array([datetime.datetime(2025, 1, 1)] * len(vals2),
                           pa.timestamp("us")),
            "user_id": pa.array([0] * len(vals2), pa.int64()),
            "event_type": pa.array(types2, pa.string()),
            "value": pa.array(vals2, pa.float64()),
            "props": pa.array([""] * len(vals2), pa.string()),
        }), str(fn))
    from deepwebharvester_ray.pipelines.queries import q_mann_whitney
    r2 = q_kruskal_h(str(tmp_path)).to_pylist()[0]
    mw = q_mann_whitney(str(tmp_path)).to_pylist()[0]
    assert (Fraction(int(r2["h_num"]), int(r2["h_den"]))
            == Fraction(int(mw["z2_num"]), int(mw["z2_den"])))


def test_kendall_tau_brute_force(ray_session, tmp_path):
    """Brute-force O(n²) concordant/discordant pair count on a planted
    sample with ties in BOTH variables (same hour, same cents, and
    doubly-tied pairs) must equal the 2-D histogram-identity engine
    output, including the tau-b tie terms and the exact rational."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import q_kendall_tau

    # (hour, cents): hours repeat (ties in x), cents repeat (ties in y),
    # one pair tied on both; values chosen so C ≠ D with a clear sign.
    pts = [(0, 100), (0, 100), (0, 300), (1, 200), (1, 100),
           (2, 300), (2, 500), (5, 500), (5, 700), (5, 250)]
    n = len(pts)
    base = datetime.datetime(2025, 1, 1)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([base + datetime.timedelta(hours=int(h))
                        for h, _ in pts], pa.timestamp("us")),
        "user_id": pa.array([0] * n, pa.int64()),
        "event_type": pa.array(["purchase"] * n, pa.string()),
        "value": pa.array([c / 100.0 for _, c in pts], pa.float64()),
        "props": pa.array([""] * n, pa.string()),
    }), str(tmp_path / "events.parquet"))

    r = q_kendall_tau(str(tmp_path)).to_pylist()[0]
    c = d = 0
    for i in range(n):
        for j in range(i + 1, n):
            prod = ((pts[i][0] - pts[j][0]) * (pts[i][1] - pts[j][1]))
            c += prod > 0
            d += prod < 0
    from collections import Counter

    n1 = sum(f * (f - 1) // 2 for f in Counter(h for h, _ in pts).values())
    n2 = sum(f * (f - 1) // 2 for f in Counter(y for _, y in pts).values())
    n0 = n * (n - 1) // 2
    s = c - d
    den = (n0 - n1) * (n0 - n2)
    assert r["event_type"] == "purchase" and r["n"] == n
    assert (r["c_pairs"], r["d_pairs"]) == (str(c), str(d))
    assert (r["tied_x"], r["tied_y"]) == (str(n1), str(n2))
    assert r["s_sign"] == (0 if s == 0 else (1 if s > 0 else -1))
    assert r["tau2_b_e6"] == 10**6 * s * s // den


def test_adamic_adar_brute_force(ray_session):
    """Recompute the integer-envelope AA top-50 by brute force over the
    sf0.001 corpus link rule (500 nodes) and pin the distributed
    result set exactly — including non-edge filtering and the
    (score DESC, a, b) tie order."""
    import pyarrow.parquet as pq

    from deepwebharvester_ray.corpus import DUP_MOD, DUP_REMAINDER, LINK_OFFSETS
    from deepwebharvester_ray.pipelines.queries import AA_TOPK, q_adamic_adar

    n = pq.ParquetFile(
        "/root/testdata/sf0.001/documents.parquet").metadata.num_rows
    adj = {i: set() for i in range(n)}
    for d in range(n):
        e = d - 1 if d > 0 and d % DUP_MOD == DUP_REMAINDER else d
        for off in LINK_OFFSETS:
            t = (e + off) % n
            if t != d:
                adj[d].add(t)
                adj[t].add(d)
    w = {z: 1_000_000 // max(int(len(adj[z])).bit_length() - 1, 1)
         for z in adj if len(adj[z]) >= 2}
    scores = {}
    for z, nbrs in adj.items():
        nb = sorted(nbrs)
        for i in range(len(nb)):
            for j in range(i + 1, len(nb)):
                a, b = nb[i], nb[j]
                if b in adj[a]:
                    continue
                s, c = scores.get((a, b), (0, 0))
                scores[(a, b)] = (s + w[z], c + 1)
    expect = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[:AA_TOPK]
    expect = {(a, b, s, c) for (a, b), (s, c) in expect}

    got = {(r["a"], r["b"], r["aa_score"], r["n_common"])
           for r in q_adamic_adar("/root/testdata/sf0.001").take_all()}
    assert got == expect


def test_source_modularity_known_partitions(ray_session, tmp_path):
    """Hand-checkable modularity cases need a hand-built graph, but the
    query's graph is the corpus link rule — so verify the exact
    RATIONAL invariants instead: Sigma l_intra <= m, Sigma d = 2m, and
    Q in (-1/2, 1] as q_num/q_den bounds."""
    from deepwebharvester_ray.pipelines.queries import q_source_modularity

    out = q_source_modularity("/root/testdata/sf0.001").take_all()
    assert len(out) >= 2
    q_num = out[0]["q_num"]
    q_den = out[0]["q_den"]
    assert all(r["q_num"] == q_num and r["q_den"] == q_den for r in out)
    two_m_sq = q_den          # 4m^2
    m = int(round((two_m_sq // 4) ** 0.5))
    assert 4 * m * m == q_den
    assert sum(r["l_intra"] for r in out) <= m
    assert sum(r["d_total"] for r in out) == 2 * m
    assert -q_den // 2 <= q_num <= q_den    # -1/2 < Q <= 1


def test_link_stress_matches_sequential_brandes(ray_session):
    """End-to-end pin of the link_stress catalog query at sf0.001: pull
    the corpus edge multiset, run the sequential sampled-Brandes stress
    reference (tests/test_functions._stress_ref), and require the
    engine's top-50 — values AND (stress DESC, doc_id) tie order — to
    match exactly."""
    from deepwebharvester_ray.pipelines.queries import (
        STRESS_DEPTH, STRESS_SEED_K, STRESS_SEED_MOD, _corpus_link_edges,
        q_link_stress)
    from tests.test_functions import _stress_ref

    _, edges_ds = _corpus_link_edges("/root/testdata/sf0.001")
    edges = [(r["src"], r["dst"]) for r in edges_ds.take_all()]
    seeds = [k * STRESS_SEED_MOD for k in range(STRESS_SEED_K)]
    ref = _stress_ref(edges, seeds, max_depth=STRESS_DEPTH)
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:50]

    got = [(r["doc_id"], r["stress"])
           for r in q_link_stress("/root/testdata/sf0.001").take_all()]
    assert got == want


def test_link_mst_matches_kruskal_corpus(ray_session):
    """End-to-end catalog pin: q_link_mst over the sf0.001 corpus link
    rule must equal sequential Kruskal under the same derived-hash
    (w, ukey) total order — spanning-forest size = n − #components."""
    import numpy as np
    import pyarrow.parquet as pq

    from deepwebharvester_ray.corpus import (DUP_MOD, DUP_REMAINDER,
                                             LINK_OFFSETS)
    from deepwebharvester_ray.functions.graph import _splitmix64
    from deepwebharvester_ray.pipelines.queries import q_link_mst
    from tests.test_functions import _kruskal_ref

    n = pq.ParquetFile(
        SF_SMOKE + "/documents.parquet").metadata.num_rows
    d = np.arange(n, dtype=np.int64)
    eff = np.where((d > 0) & (d % DUP_MOD == DUP_REMAINDER), d - 1, d)
    src = np.repeat(d, len(LINK_OFFSETS))
    dst = (np.repeat(eff, len(LINK_OFFSETS))
           + np.tile(np.asarray(LINK_OFFSETS, np.int64), n)) % n
    a, b = np.minimum(src, dst), np.maximum(src, dst)
    ukey = (a << np.int64(31)) | b
    w = (_splitmix64(ukey.view(np.uint64)) >> np.uint64(1)) \
        .astype(np.int64)
    ref = _kruskal_ref(src, dst, w, n)

    got = [(r["src"], r["dst"], r["weight"])
           for r in q_link_mst(SF_SMOKE).take_all()]
    assert got == ref  # q sorts by (src, dst); ref is sorted too

    # forest invariant: edges = n − #components (union-find count)
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, t in zip(src, dst):
        rs, rt = find(int(s)), find(int(t))
        if rs != rt:
            parent[rs] = rt
    n_comp = len({find(i) for i in range(n)})
    assert len(got) == n - n_comp


def test_link_bowtie_residue_pin(ray_session):
    """End-to-end catalog pin: q_link_bowtie over the sf0.001 corpus
    must land every part at its residue-arithmetic count — the planted
    construction makes each page's class a pure function of
    doc_id mod 8 (d ≥ 64) with the 64-page de Bruijn core on top."""
    import numpy as np
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import q_link_bowtie

    n = pq.ParquetFile(
        SF_SMOKE + "/documents.parquet").metadata.num_rows
    d = np.arange(64, n, dtype=np.int64)
    r = d % 8
    exp = {
        "CORE": 64,
        "IN": int((r == 0).sum()),
        "OUT": int((r == 1).sum()),
        "TENDRIL_IN": int((r == 2).sum()),
        "TUBE": int((r == 3).sum()),
        "OTHER": int((r == 4).sum()),
        "TENDRIL_OUT": int((r == 5).sum()),
        "DISCONNECTED": int((r == 6).sum() + (r == 7).sum()),
    }
    got = {row["part"]: row["nodes"]
           for row in q_link_bowtie(SF_SMOKE).to_pylist()}
    assert got == exp


def test_big_order_customers_join_path(ray_session, monkeypatch):
    """The size-gated attach's two paths must agree exactly: forcing
    the qualifying-set broadcast cutoff to 0 routes through the native
    hash join and must reproduce the broadcast path's table."""
    import deepwebharvester_ray.pipelines.queries as q

    bcast = q.q_big_order_customers(SF_SMOKE).take_all()
    monkeypatch.setattr(q, "_Q18_BCAST", 0)
    joined = q.q_big_order_customers(SF_SMOKE).take_all()
    assert bcast == joined
    assert len(bcast) > 0
    tot = [r["total_c"] for r in bcast]
    assert tot == sorted(tot, reverse=True)


def test_link_richclub_brute_force(ray_session):
    """Direct edge-set computation of φ(k) on the sf0.001 corpus graph
    must equal the two-histogram fold — covering canonical dedup,
    degree counting and the min-endpoint-degree suffix identity."""
    from collections import Counter

    import numpy as np
    import pyarrow.parquet as pq

    from deepwebharvester_ray.corpus import (DUP_MOD, DUP_REMAINDER,
                                             LINK_OFFSETS)
    from deepwebharvester_ray.pipelines.queries import (_RICHCLUB_KS,
                                                        q_link_richclub)

    n = pq.ParquetFile(
        SF_SMOKE + "/documents.parquet").metadata.num_rows
    d = np.arange(n, dtype=np.int64)
    eff = np.where((d > 0) & (d % DUP_MOD == DUP_REMAINDER), d - 1, d)
    src = np.repeat(d, len(LINK_OFFSETS))
    dst = (np.repeat(eff, len(LINK_OFFSETS))
           + np.tile(np.asarray(LINK_OFFSETS, np.int64), n)) % n
    pairs = {(min(a, b), max(a, b))
             for a, b in zip(src.tolist(), dst.tolist()) if a != b}
    deg = Counter()
    for u, v in pairs:
        deg[u] += 1
        deg[v] += 1
    got = {r["k"]: (r["n_k"], r["e_k"], r["phi_e6"])
           for r in q_link_richclub(SF_SMOKE).to_pylist()}
    assert set(got) == set(_RICHCLUB_KS)
    for k in _RICHCLUB_KS:
        club = {x for x, dx in deg.items() if dx > k}
        e_k = sum(1 for u, v in pairs if u in club and v in club)
        n_k = len(club)
        phi = (2 * 10**6 * e_k // (n_k * (n_k - 1))) if n_k >= 2 else 0
        assert got[k] == (n_k, e_k, phi), k


def test_link_harmonic_corpus_pin(ray_session):
    """End-to-end catalog pin: q_link_harmonic's top-50 over the
    sf0.001 corpus graph must equal the fold of 8 sequential BFS runs
    under the same (harmonic DESC, doc_id) order."""
    from collections import defaultdict

    import numpy as np
    import pyarrow.parquet as pq

    from deepwebharvester_ray.corpus import (DUP_MOD, DUP_REMAINDER,
                                             LINK_OFFSETS)
    from deepwebharvester_ray.pipelines.queries import (
        _HARMONIC_SCALE, STRESS_DEPTH, STRESS_SEED_K, STRESS_SEED_MOD,
        STRESS_TOPK, q_link_harmonic)
    from tests.test_functions import _bfs_seq

    n = pq.ParquetFile(
        SF_SMOKE + "/documents.parquet").metadata.num_rows
    d = np.arange(n, dtype=np.int64)
    eff = np.where((d > 0) & (d % DUP_MOD == DUP_REMAINDER), d - 1, d)
    adj = defaultdict(list)
    for off in LINK_OFFSETS:
        for a, b in zip(d.tolist(), ((eff + off) % n).tolist()):
            adj[a].append(b)
    seeds = [int(k * STRESS_SEED_MOD) for k in range(STRESS_SEED_K)]
    h = defaultdict(int)
    for s in seeds:
        for v, dd in _bfs_seq(adj, s, STRESS_DEPTH).items():
            if 1 <= dd <= STRESS_DEPTH:
                h[v] += _HARMONIC_SCALE // dd
    exp = sorted(h.items(), key=lambda kv: (-kv[1], kv[0]))[:STRESS_TOPK]
    got = [(r["doc_id"], r["harmonic"])
           for r in q_link_harmonic(SF_SMOKE).take_all()]
    assert got == exp


def test_subsample_stability_brute_force(ray_session, tmp_path):
    """A planted 6-row sample must reproduce the hand-computed replicate
    sums: every D_b = 2·S_b − S from explicit per-row hash bits, the
    squared sum and the max deviation."""
    import datetime

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import (
        _SSTAB_B, _SSTAB_MULT, q_subsample_stability)

    ids = [3, 17, 42, 99, 100, 123456]
    cents = [100, 250, 999, 5, 40, 7]
    n = len(ids)
    pq.write_table(pa.table({
        "event_id": pa.array(ids, pa.int64()),
        "ts": pa.array([datetime.datetime(2025, 1, 1)] * n,
                       pa.timestamp("us")),
        "user_id": pa.array([0] * n, pa.int64()),
        "event_type": pa.array(["click"] * n, pa.string()),
        "value": pa.array([c / 100.0 for c in cents], pa.float64()),
        "props": pa.array([""] * n, pa.string()),
    }), str(tmp_path / "events.parquet"))

    s = sum(cents)
    devs = []
    for b in range(_SSTAB_B):
        sb = sum(c for i, c in zip(ids, cents)
                 if ((i * _SSTAB_MULT) % 2**64) >> (48 + b) & 1)
        devs.append(2 * sb - s)
    r = q_subsample_stability(str(tmp_path)).to_pylist()
    assert len(r) == 1
    row = r[0]
    assert (row["n"], row["s_cents"]) == (n, s)
    assert row["dev_sumsq"] == str(sum(d * d for d in devs))
    assert row["max_dev"] == max(abs(d) for d in devs)


def test_forecast_baseline_hand_series(ray_session, tmp_path):
    """A hand-built 26-hour single-type series with one missing hour
    must evaluate ONLY the hours whose h−1 and h−24 both exist, with
    exact absolute-error sums for both baselines."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from deepwebharvester_ray.pipelines.queries import q_forecast_baseline

    base = datetime.datetime(2025, 1, 1)
    # hours 0..25 with hour 24 missing: eval hours need h-1 and h-24
    # present -> only h=25 qualifies via h-1=24? no (24 missing) -> none
    # then add hour 24 back in a second table? build two cases instead
    hours = [h for h in range(26) if h != 3]
    vals = {h: 100 + 7 * h for h in hours}
    rows_h, rows_v = [], []
    for h in hours:
        rows_h.append(base + datetime.timedelta(hours=h, minutes=30))
        rows_v.append(vals[h] / 100.0)
    n = len(rows_h)
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(rows_h, pa.timestamp("us")),
        "user_id": pa.array([0] * n, pa.int64()),
        "event_type": pa.array(["click"] * n, pa.string()),
        "value": pa.array(rows_v, pa.float64()),
        "props": pa.array([""] * n, pa.string()),
    }), str(tmp_path / "events.parquet"))

    # eligible: h with h, h-1, h-24 all present.  hours = 0..25 minus 3
    # -> h=24 needs 23,0 ok; h=25 needs 24,1 ok.  h=4 lacks 3.
    exp_hours = [24, 25]
    e1 = sum(abs(vals[h] - vals[h - 1]) for h in exp_hours)
    e24 = sum(abs(vals[h] - vals[h - 24]) for h in exp_hours)
    r = q_forecast_baseline(str(tmp_path)).to_pylist()
    assert len(r) == 1
    row = r[0]
    assert row["n_eval"] == len(exp_hours)
    assert (row["sae_naive"], row["sae_seasonal"]) == (e1, e24)
    assert row["better"] == ("seasonal" if e24 < e1 else "naive")


def test_adaptive_revisit_policy_convergence(ray_session):
    """AIMD semantics pinned by hand: a page changing every epoch
    (f = 1) converges to interval 1 with zero missed changes after
    warm-up; the schedule columns are internally consistent."""
    from deepwebharvester_ray.pipelines.queries import q_adaptive_revisit

    rows = {r["doc_id"]: r for r in
            q_adaptive_revisit("/root/testdata/sf0.001").take_all()}
    # doc 5: f = 1 + 5 % 5 = 1 → changes EVERY epoch; visits at
    # e=2 (dirty, i 2→1), then every epoch from 3 on, all dirty
    r5 = rows[5]
    assert r5["final_interval"] == 1
    assert r5["n_visits"] == 1 + 6        # baseline + e=2..7
    assert r5["n_dirty"] == 6
    assert r5["n_missed"] == 7 - 6        # change at e=1 preceded visit 1
    for r in rows.values():
        assert r["n_missed"] >= 0
        assert 1 <= r["final_interval"] <= 8
        assert r["n_dirty"] <= r["n_visits"]


def test_linkpred_dataset_contract(ray_session):
    """Negative samples never collide with true edges, each test
    positive yields at most one negative, the split is the md5 rule,
    and the forced-join membership path equals the broadcast path."""
    from deepwebharvester_ray.pipelines.queries import (
        _q_linkpred_dataset_impl)

    sf = "/root/testdata/sf0.001"
    rows = _q_linkpred_dataset_impl(sf).take_all()
    rows_j = _q_linkpred_dataset_impl(sf, broadcast_cutoff=0).take_all()
    key = lambda r: (r["split"], r["label"], r["src"], r["dst"])
    assert sorted(map(key, rows)) == sorted(map(key, rows_j))

    pos = {(r["src"], r["dst"]) for r in rows if r["label"] == 1}
    negs = [(r["src"], r["dst"]) for r in rows if r["label"] == 0]
    assert negs and not (set(negs) & pos)
    n_test_pos = sum(1 for r in rows
                     if r["label"] == 1 and r["split"] == "test")
    assert len(negs) <= n_test_pos
    assert all(r["split"] == "test" for r in rows if r["label"] == 0)


def test_dict_compression_contract(ray_session):
    """Shared-dictionary compression: the corpus-trained zdict beats
    plain zlib on every source of the templated corpus, totals are
    internally consistent, and the whole table is reshard-stable
    (deterministic dictionary + deterministic zlib)."""
    from deepwebharvester_ray.pipelines.queries import q_dict_compression

    sf = "/root/testdata/sf0.001"
    rows = q_dict_compression(sf).take_all()
    assert rows
    for r in rows:
        assert 0 < r["bytes_zdict"] < r["bytes_zlib"] <= r["bytes_raw"]
        assert r["saved_ppm"] == (1_000_000
                                  * (r["bytes_zlib"] - r["bytes_zdict"])
                                  // r["bytes_zlib"])
    again = q_dict_compression(sf).take_all()
    assert rows == again
