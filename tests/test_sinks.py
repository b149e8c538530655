"""Sink round-trips + report aggregates (reference storage.py / report.py)."""
import csv
import json
import sqlite3

import pytest

from deepwebharvester_ray import corpus, report, sinks
from deepwebharvester_ray.config import CrawlSettings
from deepwebharvester_ray.pipelines.crawl import run_crawl

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def crawl_run(smoke_corpus, tmp_path_factory):
    cfg = CrawlSettings(max_depth=2, seen_shards=2)
    return run_crawl(
        smoke_corpus,
        corpus.seed_urls(4),
        cfg,
        run_dir=str(tmp_path_factory.mktemp("sinkrun")),
        with_intel=True,
    )


def test_json_sink(crawl_run, tmp_path):
    path = sinks.save_to_json(crawl_run.results_table(), str(tmp_path), "r.json")
    data = json.loads(path.read_text())
    assert len(data) == crawl_run.stats["pages_crawled"]
    assert set(data[0]) == {
        "url", "site", "title", "depth", "crawl_time_s", "links_found",
        "content_hash", "text",
    }
    assert isinstance(data[0]["crawl_time_s"], float)


def test_csv_sink_scrubs_newlines(crawl_run, tmp_path):
    path = sinks.save_to_csv(crawl_run.results_table(), str(tmp_path), "r.csv")
    with open(path, newline="") as fh:
        rows = list(csv.reader(fh))
    assert rows[0] == ["URL", "Site", "Title", "Depth", "CrawlTime(s)",
                       "LinksFound", "ContentHash", "Text"]
    assert len(rows) == 1 + crawl_run.stats["pages_crawled"]
    for row in rows[1:]:
        assert "\n" not in row[7] and "\r" not in row[7]


def test_sqlite_sink_url_unique_and_resume(crawl_run, tmp_path):
    t = crawl_run.results_table()
    n = sinks.save_to_sqlite(t, str(tmp_path))
    assert n == t.num_rows
    # duplicate insert ignored
    n2 = sinks.save_to_sqlite(t, str(tmp_path))
    assert n2 == 0
    known = sinks.get_known_urls(str(tmp_path))
    assert known == set(t.column("url").to_pylist())
    # ioc_data JSON present and well-formed
    with sqlite3.connect(tmp_path / "deepwebharvester.db") as conn:
        ioc = conn.execute("SELECT ioc_data FROM crawl_results LIMIT 1").fetchone()[0]
    d = json.loads(ioc)
    assert "total" in d and "urls" in d


def test_save_all(crawl_run, tmp_path):
    paths = sinks.save_all(crawl_run.results_table(), str(tmp_path))
    assert set(paths) == {"sqlite", "json", "csv"}
    for p in paths.values():
        assert p.exists()


def test_report_aggregates_and_html(crawl_run, tmp_path):
    ds = crawl_run.results_dataset()
    stats = report.aggregate_report_stats(ds)
    assert stats["totals"]["pages"] == crawl_run.stats["pages_crawled"]
    assert sum(stats["risk_hist"].values()) == stats["totals"]["pages"]
    assert len(stats["sites"]) <= crawl_run.stats["sites_crawled"] + 10
    assert stats["top_risk"] and stats["top_risk"][0]["risk_score"] == max(
        r["risk_score"] for r in stats["top_risk"]
    )
    path = report.generate(ds, str(tmp_path), "rep.html")
    html = path.read_text()
    assert "Executive summary" in html and "Risk distribution" in html
    assert "<script" not in html  # no JS, reference test_report.py parity


def test_graph_png(crawl_run, tmp_path):
    """Dependency-free graph sink: a valid PNG with the right dimensions
    (decoded with the stdlib, no matplotlib required)."""
    import struct
    import zlib

    p = report.save_graph_png(crawl_run.results_dataset(), str(tmp_path),
                              size=320)
    assert p is not None and p.exists()
    data = p.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    w, h = struct.unpack(">II", data[16:24])
    assert (w, h) == (320, 320)
    # IDAT payload inflates to H scanlines of 1 filter byte + W*3 pixels
    idat_off = data.index(b"IDAT") + 4
    idat_len = struct.unpack(">I", data[idat_off - 8:idat_off - 4])[0]
    raw = zlib.decompress(data[idat_off:idat_off + idat_len])
    assert len(raw) == h * (1 + w * 3)
    # something was actually drawn (not a blank background)
    assert len(set(raw)) > 3


def test_write_partitioned_parquet_resume(tmp_path):
    """Committed partitions are skipped (files untouched), uncommitted
    leftovers are swept and rewritten, and the final tree reads back to
    exactly the input rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    rows = [{"doc_id": i, "source": f"src{i % 3}"} for i in range(90)]
    ds = ray.data.from_items(rows)
    out = tmp_path / "part_out"

    r1 = sinks.write_partitioned_parquet(ds, str(out), "source")
    assert sorted(r1["written"]) == ["src0", "src1", "src2"]
    assert r1["skipped"] == []
    for v in range(3):
        assert (out / f"source=src{v}" / "_COMPLETE").exists()

    # simulate a crashed attempt: src1 loses its marker (uncommitted)
    (out / "source=src1" / "_COMPLETE").unlink()
    src0_files = {p.name: p.stat().st_mtime_ns
                  for p in (out / "source=src0").glob("*.parquet")}

    r2 = sinks.write_partitioned_parquet(ray.data.from_items(rows),
                                         str(out), "source")
    assert r2["written"] == ["src1"]          # only the swept partition
    assert sorted(r2["skipped"]) == ["src0", "src2"]
    # committed partitions were not rewritten
    assert src0_files == {p.name: p.stat().st_mtime_ns
                          for p in (out / "source=src0").glob("*.parquet")}

    back = pq.read_table(str(out)).to_pydict()
    assert len(back["doc_id"]) == 90
    assert sorted(back["doc_id"]) == list(range(90))

    # third run: everything committed -> nothing written, tree unchanged
    r3 = sinks.write_partitioned_parquet(ray.data.from_items(rows),
                                         str(out), "source")
    assert r3["written"] == []
    assert sorted(r3["skipped"]) == ["src0", "src1", "src2"]
    back3 = pq.read_table(str(out)).to_pydict()
    assert sorted(back3["doc_id"]) == list(range(90))


def test_jsonl_source_roundtrip(ray_session, tmp_path):
    """Source-format flexibility: a JSONL export of the documents table
    reads back through ray.data.read_json with identical rows, and the
    standard token-count stage runs over it unchanged — pipelines are
    source-agnostic (any ray.data reader feeds the same batch stages)."""
    import json as _json

    import pyarrow.parquet as _pq
    import ray

    from deepwebharvester_ray.functions.textops import token_count_batch

    src = _pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    p = tmp_path / "docs.jsonl"
    with open(p, "w") as f:
        for did, txt in zip(src.column("doc_id").to_pylist(),
                            src.column("text").to_pylist()):
            f.write(_json.dumps({"doc_id": did, "text": txt}) + "\n")

    ds = ray.data.read_json(str(p))
    assert ds.count() == src.num_rows
    out = ds.map_batches(token_count_batch,
                         batch_format="pyarrow").to_pandas()
    want = ray.data.from_arrow(src).map_batches(
        token_count_batch, batch_format="pyarrow").to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    want = want.sort_values("doc_id").reset_index(drop=True)
    assert out.equals(want)


def test_compact_parquet_roundtrip(ray_session, tmp_path):
    """Compaction: 40 fragment files collapse to the byte-sized target
    count with every row preserved (order-invariant equality via sorted
    doc_id + checksum of text lengths)."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from deepwebharvester_ray.sinks import compact_parquet

    frag = tmp_path / "frag"
    frag.mkdir()
    for i in range(40):
        _pq.write_table(
            pa.table({"doc_id": pa.array(range(i * 10, i * 10 + 10),
                                         pa.int64()),
                      "text": pa.array([f"doc {j}" for j in
                                        range(i * 10, i * 10 + 10)],
                                       pa.string())}),
            frag / f"part-{i:03d}.parquet")
    out = tmp_path / "compact"
    stats = compact_parquet(str(frag), str(out), target_bytes=1 << 20)
    assert stats["files_in"] == 40 and stats["rows"] == 400
    assert stats["files_out"] < 40
    got = _pq.read_table(str(out)).sort_by("doc_id")
    assert got.column("doc_id").to_pylist() == list(range(400))
    assert got.column("text").to_pylist() == [f"doc {j}" for j in range(400)]


def test_bucketed_layout_shuffle_free_agg(ray_session, tmp_path):
    """Hash-bucketed layout: buckets partition the key space exactly
    (disjoint, complete), and a PER-BUCKET local grouped aggregate
    concatenated across buckets equals the global groupby — the
    zero-shuffle aggregation the layout exists to enable."""
    import collections

    import pyarrow as pa
    import ray

    from deepwebharvester_ray.sinks import read_bucket, write_bucketed_parquet

    n = 1000
    t = pa.table({
        "doc_id": pa.array([i % 97 for i in range(n)], pa.int64()),
        "v": pa.array([i % 7 for i in range(n)], pa.int64()),
    })
    out = tmp_path / "bucketed"
    stats = write_bucketed_parquet(ray.data.from_arrow(t).repartition(8),
                                   str(out), key="doc_id", n_buckets=8)
    assert stats["rows"] == n

    # global truth
    truth = collections.Counter()
    sums = collections.Counter()
    for i in range(n):
        truth[i % 97] += 1
        sums[i % 97] += i % 7

    seen_keys = set()
    got_n: dict = {}
    got_s: dict = {}
    for b in range(8):
        rows = read_bucket(str(out), b).take_all()
        keys_here = {r["doc_id"] for r in rows}
        assert not (keys_here & seen_keys), "key split across buckets"
        seen_keys |= keys_here
        # LOCAL per-bucket aggregation — no shuffle, no cross-bucket state
        for r in rows:
            got_n[r["doc_id"]] = got_n.get(r["doc_id"], 0) + 1
            got_s[r["doc_id"]] = got_s.get(r["doc_id"], 0) + r["v"]
    assert seen_keys == set(truth)
    assert got_n == dict(truth)
    assert got_s == dict(sums)


def test_bucketed_layout_strided_keys_spread(ray_session, tmp_path):
    """Keys sharing a stride divisible by n_buckets must still spread:
    a low-bit `hash % n` bucket rule degenerates to `key % n` for
    power-of-two n (odd multipliers never mix low bits upward), putting
    every strided key in ONE bucket — the high-bit multiply-shift rule
    must not."""
    import pyarrow as pa
    import ray

    from deepwebharvester_ray.sinks import read_bucket, write_bucketed_parquet

    n_buckets = 16
    keys = [i * n_buckets for i in range(512)]  # all ≡ 0 (mod 16)
    t = pa.table({"doc_id": pa.array(keys, pa.int64())})
    out = tmp_path / "strided"
    write_bucketed_parquet(ray.data.from_arrow(t), str(out),
                           key="doc_id", n_buckets=n_buckets)
    sizes = [read_bucket(str(out), b).count()
             for b in range(n_buckets)
             if (out / f"bucket={b}").exists()]
    assert sum(sizes) == len(keys)
    assert len(sizes) >= n_buckets // 2, f"skewed layout: {sizes}"
    assert max(sizes) < len(keys) // 2, f"one hot bucket: {sizes}"


def test_partitioned_parquet_hive_encoded_values_pruned(ray_session, tmp_path):
    """String partition values needing hive escaping (spaces) must be
    pruned on re-run — comparing raw values against ENCODED dir names
    re-appended duplicate rows into committed partitions."""
    import pyarrow as pa
    import pyarrow.parquet as _pq
    import ray

    from deepwebharvester_ray.sinks import write_partitioned_parquet

    t = pa.table({
        "seg": pa.array(["a b", "a b", "plain"], pa.string()),
        "v": pa.array([1, 2, 3], pa.int64()),
    })
    out = tmp_path / "parts"
    write_partitioned_parquet(ray.data.from_arrow(t), str(out), "seg")
    res2 = write_partitioned_parquet(ray.data.from_arrow(t), str(out), "seg")
    assert res2["written"] == []
    total = sum(_pq.ParquetFile(str(f)).metadata.num_rows
                for f in out.rglob("*.parquet"))
    assert total == 3, "duplicate rows appended into committed partitions"


def test_bucketed_layout_rerun_replaces(ray_session, tmp_path):
    """A re-run of write_bucketed_parquet must REPLACE the layout, not
    append beside stale files (double-counted rows, mixed versions)."""
    import pyarrow as pa
    import ray

    from deepwebharvester_ray.sinks import write_bucketed_parquet

    t = pa.table({"doc_id": pa.array(range(100), pa.int64())})
    out = tmp_path / "b"
    s1 = write_bucketed_parquet(ray.data.from_arrow(t), str(out), "doc_id")
    s2 = write_bucketed_parquet(ray.data.from_arrow(t), str(out), "doc_id")
    assert s1["rows"] == s2["rows"] == 100


def test_wds_shards_roundtrip_deterministic_resume(ray_session, tmp_path):
    """WebDataset tar-shard export: (a) byte-identical shards across
    different input block layouts (sha256 manifest is a real content
    address — shard membership is the key hash, member order sorted,
    tar headers normalized), (b) full round-trip through the tar source
    including canonical-JSON metadata, (c) resumable: committed shards
    are skipped, a missing tar (crash between rename and manifest) is
    rewritten."""
    import json as _json

    import pyarrow as pa
    import ray

    from deepwebharvester_ray.sinks import read_wds_shards, write_wds_shards

    n = 200
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array([f"document body {i} — café" for i in
                          range(n)], pa.string()),
        "source": pa.array([f"s{i % 3}" for i in range(n)], pa.string()),
        "score": pa.array([i * 7 % 13 for i in range(n)], pa.int64()),
    })
    out_a = tmp_path / "a"
    out_b = tmp_path / "b"
    sa = write_wds_shards(ray.data.from_arrow(t).repartition(7), str(out_a),
                          n_shards=4)
    sb = write_wds_shards(ray.data.from_arrow(t).repartition(2), str(out_b),
                          n_shards=4)
    assert sa["n_samples"] == sb["n_samples"] == n
    man_a = _json.loads((out_a / "manifest.json").read_text())
    man_b = _json.loads((out_b / "manifest.json").read_text())
    assert man_a == man_b  # byte-identical shards, layout-independent
    assert sum(v["n_samples"] for v in man_a.values()) == n

    back = read_wds_shards(str(out_a)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert back["doc_id"].tolist() == list(range(n))
    assert back["text"].tolist() == t.column("text").to_pylist()
    metas = [_json.loads(m) for m in back["meta"]]
    assert [m["source"] for m in metas] == t.column("source").to_pylist()
    assert [m["score"] for m in metas] == t.column("score").to_pylist()

    # resume: everything committed → nothing rewritten
    s2 = write_wds_shards(ray.data.from_arrow(t), str(out_a), n_shards=4)
    assert s2["written"] == [] and len(s2["skipped"]) == len(man_a)
    # crash hole: tar missing but manifest row present → that shard only
    victim = sorted(int(k) for k in man_a)[0]
    (out_a / man_a[str(victim)]["file"]).unlink()
    s3 = write_wds_shards(ray.data.from_arrow(t), str(out_a), n_shards=4)
    assert s3["written"] == [victim]
    man_r = _json.loads((out_a / "manifest.json").read_text())
    assert man_r == man_a  # rewritten shard byte-identical again


def test_retention_sweep_metadata_only_drops(ray_session, tmp_path):
    """TTL sweep: wholly-expired partitions drop WITHOUT being read or
    rewritten, wholly-retained partitions are untouched (same inode —
    proof no rewrite happened), only the boundary partition rewrites,
    and surviving rows are exactly ts >= cutoff."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from deepwebharvester_ray.sinks import retention_sweep

    day = 86_400_000_000
    base = tmp_path / "events"
    rows_all = []
    for d in range(5):  # 5 day-partitions, 10 rows each, hourly
        p = base / f"day={d}"
        p.mkdir(parents=True)
        ts = [d * day + h * 3_600_000_000 for h in range(10)]
        ids = [d * 100 + h for h in range(10)]
        _pq.write_table(
            pa.table({"event_id": pa.array(ids, pa.int64()),
                      "ts_us": pa.array(ts, pa.int64())}),
            p / "part-0.parquet")
        rows_all += list(zip(ids, ts))

    cutoff = 2 * day + 5 * 3_600_000_000  # mid-day-2
    before = {f: f.stat().st_ino
              for f in base.glob("day=*/[!.]*.parquet")}
    res = retention_sweep(str(base), "day", "ts_us", cutoff)
    assert res["dropped"] == [0, 1]
    assert res["rewritten"] == [2]
    assert res["kept"] == [3, 4]
    assert res["rows_deleted"] == 25  # 2 full days + 5 boundary hours

    got = sorted(
        (r["event_id"], r["ts_us"])
        for f in base.glob("day=*/[!.]*.parquet")
        for r in _pq.read_table(str(f)).to_pylist())
    want = sorted((i, t) for i, t in rows_all if t >= cutoff)
    assert got == want
    # kept partitions: identical inodes ⇒ genuinely untouched
    for f, ino in before.items():
        if f.parent.name in ("day=3", "day=4"):
            assert f.exists() and f.stat().st_ino == ino


def test_retention_sweep_statless_files_degrade_to_rewrite(
        ray_session, tmp_path):
    """Files written with statistics DISABLED have no footer min/max:
    the sweep must degrade those partitions to a boundary rewrite
    (correct regardless of the true range) instead of crashing on
    col.statistics.min mid-sweep."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from deepwebharvester_ray.sinks import retention_sweep

    day = 86_400_000_000
    base = tmp_path / "events"
    for d in range(2):
        p = base / f"day={d}"
        p.mkdir(parents=True)
        ts = [d * day + h * 3_600_000_000 for h in range(10)]
        _pq.write_table(
            pa.table({"event_id": pa.array(
                [d * 100 + h for h in range(10)], pa.int64()),
                "ts_us": pa.array(ts, pa.int64())}),
            p / "part-0.parquet", write_statistics=False)

    cutoff = 1 * day + 5 * 3_600_000_000  # mid-day-1
    res = retention_sweep(str(base), "day", "ts_us", cutoff)
    # without stats nothing can be metadata-only dropped or kept:
    # every partition rewrites, but survivors are exactly ts >= cutoff
    assert res["dropped"] == [] and res["kept"] == []
    assert sorted(res["rewritten"]) == [0, 1]
    assert res["rows_deleted"] == 15
    got = sorted(
        r["ts_us"]
        for f in base.glob("day=*/[!.]*.parquet")
        for r in _pq.read_table(str(f)).to_pylist())
    assert got == [1 * day + h * 3_600_000_000 for h in range(5, 10)]


def test_merge_on_read_deletes(ray_session, tmp_path):
    """Lakehouse-style equality deletes: (a) delete commits are tiny
    key files beside the data, (b) the MOR scan equals full-minus-
    deleted across multiple accumulated commits, (c) compaction
    rewrites ONLY footer-range-intersecting files (others keep their
    inode), removes the delete files, and leaves the physical state
    equal to the MOR view."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from pathlib import Path

    from deepwebharvester_ray.sinks import (apply_deletes,
                                            read_with_deletes,
                                            write_delete_file)

    base = tmp_path / "tbl"
    base.mkdir()
    # 4 files with DISJOINT key ranges (footer pruning is meaningful)
    for f in range(4):
        ids = list(range(f * 100, f * 100 + 100))
        _pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "v": pa.array([i * 3 for i in ids], pa.int64())}),
            base / f"data-{f}.parquet")

    write_delete_file(str(base), "doc_id", [5, 17, 150])
    write_delete_file(str(base), "doc_id", [150, 199, 23])  # overlap ok
    deleted = {5, 17, 23, 150, 199}

    mor = sorted(r["doc_id"]
                 for r in read_with_deletes(str(base), "doc_id")
                 .take_all())
    assert mor == sorted(set(range(400)) - deleted)

    before = {f.name: f.stat().st_ino
              for f in base.glob("data-*.parquet")}
    res = apply_deletes(str(base), "doc_id")
    assert res["rows_deleted"] == 5
    assert sorted(Path(p).name for p in res["rewritten"]) == \
        ["data-0.parquet", "data-1.parquet"]
    # files 2 and 3 hold keys 200-399: no delete intersects → untouched
    for name in ("data-2.parquet", "data-3.parquet"):
        assert (base / name).stat().st_ino == before[name]
    assert not list(base.glob("deletes-*.parquet"))
    phys = sorted(r["doc_id"]
                  for f in base.glob("data-*.parquet")
                  for r in _pq.read_table(str(f)).to_pylist())
    assert phys == mor


def test_read_evolved_mixed_schemas(ray_session, tmp_path):
    """Schema evolution on read: v1 files (doc_id, text) and v2 files
    (+lang, +score) read as ONE uniform Dataset — v1 rows fill lang
    with the declared default and score with null; column order
    canonical; grouping is footer-metadata-only."""
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from deepwebharvester_ray.sinks import read_evolved

    base = tmp_path / "tbl"
    base.mkdir()
    for f in range(2):  # v1: two files
        ids = list(range(f * 10, f * 10 + 10))
        _pq.write_table(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array([f"t{i}" for i in ids], pa.string())}),
            base / f"v1-{f}.parquet")
    ids = list(range(20, 30))  # v2: one file with two new columns
    _pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([f"t{i}" for i in ids], pa.string()),
        "lang": pa.array(["en"] * 10, pa.string()),
        "score": pa.array([i * 2 for i in ids], pa.int64())}),
        base / "v2-0.parquet")

    ds = read_evolved(str(base), defaults={"lang": "und"})
    assert ds.schema().names == ["doc_id", "lang", "score", "text"]
    rows = sorted(ds.take_all(), key=lambda r: r["doc_id"])
    assert len(rows) == 30
    assert all(r["lang"] == "und" and r["score"] is None
               for r in rows[:20])
    assert all(r["lang"] == "en" and r["score"] == 2 * r["doc_id"]
               for r in rows[20:])
    assert [r["text"] for r in rows] == [f"t{i}" for i in range(30)]


def test_token_shards_roundtrip_and_determinism(ray_session, tmp_path):
    """Indexed token-shard export: byte-identical manifests across
    block layouts (shard membership is the id hash, samples sorted),
    lossless roundtrip incl. empty docs, and committed shards are
    skipped on re-run."""
    import json

    import numpy as np
    import ray

    from deepwebharvester_ray.sinks import (read_token_shards,
                                            write_token_shards)

    rng = np.random.default_rng(17)
    rows = [{"doc_id": i,
             "token_ids": rng.integers(0, 50000, rng.integers(0, 40),
                                       dtype=np.int32)
             .astype("<i4").tobytes()}
            for i in range(120)]
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    info = write_token_shards(
        ray.data.from_items(rows).repartition(3), a, n_shards=4)
    write_token_shards(
        ray.data.from_items(rows).repartition(7), b, n_shards=4)
    ma = json.loads((tmp_path / "a" / "manifest.json").read_text())
    mb = json.loads((tmp_path / "b" / "manifest.json").read_text())
    assert ma == mb                       # layout-independent bytes
    assert info["n_samples"] == 120
    assert info["n_tokens"] == sum(len(r["token_ids"]) // 4 for r in rows)

    got = {r["doc_id"]: r["token_ids"]
           for r in read_token_shards(a).take_all()}
    assert got == {r["doc_id"]: r["token_ids"] for r in rows}

    # committed shards are pruned at the scan on re-run
    info2 = write_token_shards(
        ray.data.from_items(rows).repartition(2), a, n_shards=4)
    assert info2["written"] == []
    assert info2["n_samples"] == 120
