"""Result sinks: partitioned Parquet (primary) + JSON/CSV/SQLite parity.

The reference persists to JSON + CSV + SQLite simultaneously
(storage.py:236-261).  At 100 TB the primary store is partitioned Parquet
written by the crawl pipeline itself (one directory per generation —
pipelines/crawl.py); these writers exist for small-scale parity and for
the same downstream consumers the reference serves:

* JSON — array of 8 projected fields, crawl_time rounded to 3 dp
  (storage.py:175-187)
* CSV — fixed header, newlines scrubbed from text (storage.py:218-228)
* SQLite — ``crawl_results`` schema with URL uniqueness + ioc_data JSON
  (storage.py:25-41, 107-154); powers ``get_known_urls`` resume parity
  (storage.py:94-105)

All writers stream ``iter_batches`` off the Dataset — results are
append-serialised without materialising the full dataset in driver memory.
"""
from __future__ import annotations

import json
import logging
import sqlite3
from datetime import datetime, timezone
from pathlib import Path
from typing import Dict, Optional, Set

import numpy as np
import pyarrow as pa

from .intelligence import IOC_FIELDS

logger = logging.getLogger(__name__)

_SQLITE_SCHEMA = """
CREATE TABLE IF NOT EXISTS crawl_results (
    id            INTEGER PRIMARY KEY AUTOINCREMENT,
    url           TEXT    UNIQUE NOT NULL,
    title         TEXT,
    text          TEXT,
    content_hash  TEXT,
    depth         INTEGER,
    crawl_time    REAL,
    links_found   INTEGER,
    site          TEXT,
    ioc_data      TEXT,
    crawled_at    TEXT    NOT NULL DEFAULT (strftime('%Y-%m-%dT%H:%M:%SZ', 'now'))
);
CREATE INDEX IF NOT EXISTS idx_site ON crawl_results(site);
CREATE INDEX IF NOT EXISTS idx_hash ON crawl_results(content_hash);
"""

_JSON_FIELDS = [
    "url", "site", "title", "depth", "crawl_time_s", "links_found",
    "content_hash", "text",
]

_CSV_HEADER = [
    "URL", "Site", "Title", "Depth", "CrawlTime(s)", "LinksFound",
    "ContentHash", "Text",
]


def _timestamped(prefix: str, suffix: str, filename: Optional[str]) -> str:
    if filename:
        return filename
    ts = datetime.now(tz=timezone.utc).strftime("%Y%m%d_%H%M%S")
    return f"{prefix}_{ts}.{suffix}"


def _iter_batches(results) -> "iter":
    """Yield pyarrow record batches from a Dataset or a pyarrow Table."""
    if isinstance(results, pa.Table):
        yield from results.to_batches(max_chunksize=4096)
        return
    for batch in results.iter_batches(batch_format="pyarrow", batch_size=4096):
        yield from batch.to_batches()


def save_to_json(results, output_dir: str, filename: Optional[str] = None) -> Path:
    """JSON array of the reference's 8 projected fields (storage.py:158-194)."""
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    path = out / _timestamped("results", "json", filename)
    n = 0
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("[")
        first = True
        for batch in _iter_batches(results):
            cols = {c: batch.column(c).to_pylist() for c in
                    ("url", "site", "title", "depth", "crawl_time", "links_found",
                     "content_hash", "text")}
            for i in range(batch.num_rows):
                rec = {
                    "url": cols["url"][i],
                    "site": cols["site"][i],
                    "title": cols["title"][i],
                    "depth": cols["depth"][i],
                    "crawl_time_s": round(cols["crawl_time"][i], 3),
                    "links_found": cols["links_found"][i],
                    "content_hash": cols["content_hash"][i],
                    "text": cols["text"][i],
                }
                fh.write(("" if first else ",") + "\n  ")
                json.dump(rec, fh, ensure_ascii=False)
                first = False
                n += 1
        fh.write("\n]")
    logger.info("JSON: %d result(s) → %s", n, path)
    return path


def save_to_csv(results, output_dir: str, filename: Optional[str] = None) -> Path:
    """CSV with the reference header; newlines scrubbed (storage.py:198-232)."""
    import csv

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    path = out / _timestamped("results", "csv", filename)
    n = 0
    with open(path, "w", newline="", encoding="utf-8") as fh:
        writer = csv.writer(fh)
        writer.writerow(_CSV_HEADER)
        for batch in _iter_batches(results):
            cols = {c: batch.column(c).to_pylist() for c in
                    ("url", "site", "title", "depth", "crawl_time", "links_found",
                     "content_hash", "text")}
            for i in range(batch.num_rows):
                clean = cols["text"][i].replace("\n", " ").replace("\r", " ")
                writer.writerow(
                    [cols["url"][i], cols["site"][i], cols["title"][i],
                     cols["depth"][i], round(cols["crawl_time"][i], 3),
                     cols["links_found"][i], cols["content_hash"][i], clean]
                )
                n += 1
    logger.info("CSV: %d result(s) → %s", n, path)
    return path


def _ioc_json_from_batch(batch: pa.RecordBatch, i: int) -> Optional[str]:
    """Serialize a row's IOC columns like the reference IOCs.as_dict
    (intelligence.py:164-179: urls capped at 20 in serialized output)."""
    if "ioc_total" not in batch.schema.names:
        return None
    d = {}
    for f in IOC_FIELDS:
        vals = batch.column(f)[i].as_py()
        d[f] = vals[:20] if f == "urls" else vals
    d["pgp_present"] = batch.column("pgp_present")[i].as_py()
    d["total"] = batch.column("ioc_total")[i].as_py()
    return json.dumps(d)


def save_to_sqlite(
    results, output_dir: str, db_name: str = "deepwebharvester.db"
) -> int:
    """INSERT OR IGNORE into the reference schema; returns rows inserted."""
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    db_path = out / db_name
    inserted = 0
    with sqlite3.connect(db_path, timeout=10.0) as conn:
        conn.executescript(_SQLITE_SCHEMA)
        for batch in _iter_batches(results):
            cols = {c: batch.column(c).to_pylist() for c in
                    ("url", "title", "text", "content_hash", "depth",
                     "crawl_time", "links_found", "site")}
            for i in range(batch.num_rows):
                cur = conn.execute(
                    "INSERT OR IGNORE INTO crawl_results"
                    " (url, title, text, content_hash, depth, crawl_time,"
                    "  links_found, site, ioc_data)"
                    " VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?)",
                    (cols["url"][i], cols["title"][i], cols["text"][i],
                     cols["content_hash"][i], cols["depth"][i],
                     cols["crawl_time"][i], cols["links_found"][i],
                     cols["site"][i], _ioc_json_from_batch(batch, i)),
                )
                inserted += cur.rowcount if cur.rowcount > 0 else 0
        conn.commit()
    logger.info("SQLite: %d new row(s) → %s", inserted, db_path)
    return inserted


def get_known_urls(output_dir: str, db_name: str = "deepwebharvester.db") -> Set[str]:
    """Resume-parity source (storage.py:94-105)."""
    db_path = Path(output_dir) / db_name
    if not db_path.exists():
        return set()
    with sqlite3.connect(db_path, timeout=10.0) as conn:
        rows = conn.execute("SELECT url FROM crawl_results").fetchall()
    return {r[0] for r in rows}


def write_partitioned_parquet(
    ds,
    out_dir: str,
    partition_col: str,
    skip_existing: bool = True,
) -> Dict[str, list]:
    """Resumable partitioned-Parquet sink: hive layout (one directory
    per ``partition_col`` value), each partition COMMITTED by a
    ``_COMPLETE`` marker written only after its files land.  A re-run

    * prunes committed partitions from the INPUT (broadcast membership
      mask inside map_batches — the skipped data is filtered at the
      scan, not rewritten), and
    * deletes uncommitted partition directories before writing (a
      crashed attempt leaves files but no marker; without the sweep a
      retry would APPEND duplicate rows to them).

    This is the "failed 100-TB run restarts where it stopped"
    contract: work lost on failure is bounded by the in-flight
    partitions, and the driver state is one marker check per partition.
    Returns ``{"written": [...], "skipped": [...]}`` partition values
    (as strings, hive-encoded)."""
    import shutil

    import ray

    from . import runtime_env
    from .broadcast import cached_get

    base = Path(out_dir)
    base.mkdir(parents=True, exist_ok=True)
    done, stale = [], []
    for p in sorted(base.glob(f"{partition_col}=*")):
        if (p / "_COMPLETE").exists():
            done.append(p.name.split("=", 1)[1])
        else:
            stale.append(p)
    for p in stale:  # uncommitted leftovers from a crashed attempt
        shutil.rmtree(p, ignore_errors=True)

    if skip_existing and done:
        # directory names are hive-ENCODED (Arrow percent-escapes
        # spaces/'='/slashes); decode before comparing against raw
        # str(value) or escaped partitions are never pruned and a re-run
        # appends duplicate rows into the committed dir
        from urllib.parse import unquote

        done_ref = ray.put(np.sort(np.asarray(
            [unquote(d) for d in done], dtype=object)))

        def prune(batch: pa.Table) -> pa.Table:
            vals = np.asarray(
                [str(v) for v in batch.column(partition_col).to_pylist()],
                dtype=object)
            d = cached_get(done_ref)
            pos = np.searchsorted(d, vals)
            pos[pos >= len(d)] = len(d) - 1
            return batch.filter(pa.array(d[pos] != vals))

        ds = ds.map_batches(prune, batch_format="pyarrow",
                            runtime_env=runtime_env())

    # ONE streaming pass: the write itself discovers the partitions (a
    # pre-count groupby would force a second pass / a materialization of
    # the full input); freshly-written partitions are exactly the
    # marker-less hive dirs afterwards (stale ones were swept above).
    ds.write_parquet(str(base), partition_cols=[partition_col])
    written = []
    for p in sorted(base.glob(f"{partition_col}=*")):
        if not (p / "_COMPLETE").exists():
            (p / "_COMPLETE").touch()
            written.append(p.name.split("=", 1)[1])
    logger.info("partitioned parquet: %d written, %d skipped → %s",
                len(written), len(done), base)
    return {"written": written, "skipped": done}


def save_all(
    results,
    output_dir: str,
    json_output: bool = True,
    csv_output: bool = True,
    sqlite_output: bool = True,
) -> Dict[str, Path]:
    """Fan-out to all enabled sinks (storage.py:236-261)."""
    paths: Dict[str, Path] = {}
    if sqlite_output:
        save_to_sqlite(results, output_dir)
        paths["sqlite"] = Path(output_dir) / "deepwebharvester.db"
    if json_output:
        paths["json"] = save_to_json(results, output_dir)
    if csv_output:
        paths["csv"] = save_to_csv(results, output_dir)
    return paths


def compact_parquet(input_dir: str, output_dir: str,
                    target_bytes: int = 128 << 20) -> dict:
    """Small-files compaction (table maintenance): rewrite a fragmented
    Parquet directory into ~``target_bytes`` files, preserving every
    row.  A long-running crawl's per-generation / per-partition writes
    accumulate thousands of small files whose per-file open cost
    eventually dominates scans; periodic compaction is the standard
    fix (the layout twin of the resumable sink's commit markers).

    Shape: one streaming read (file count = input fragmentation), a
    metadata-only repartition sized from the TOTAL INPUT BYTES (no
    shuffle — Ray's repartition without shuffle only splits/merges
    block boundaries), one streaming write.  Returns
    {files_in, files_out, rows} for the caller's maintenance log."""
    import ray

    in_files = [p for p in Path(input_dir).rglob("*.parquet")]
    total = sum(p.stat().st_size for p in in_files)
    n_out = max(1, int(np.ceil(total / target_bytes)))
    ds = ray.data.read_parquet(input_dir)
    rows = ds.count()
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    ds.repartition(n_out).write_parquet(str(out))
    files_out = len(list(out.rglob("*.parquet")))
    return {"files_in": len(in_files), "files_out": files_out,
            "rows": rows, "bytes_in": total}


_BUCKET_MULT = 0x9E3779B97F4A7C15  # odd 64-bit multiplier (bijective)


def write_bucketed_parquet(ds, out_dir: str, key: str,
                           n_buckets: int = 16) -> dict:
    """Hash-BUCKETED Parquet layout: rows land in
    ``bucket=<hash(key) % n>`` hive directories, so every future
    key-equijoin / grouped aggregate / dedup on ``key`` can run
    PER-BUCKET with zero shuffle (both sides of a join bucketed the
    same way co-locate by construction — the "pick ONE partitioning
    key and reuse it" discipline made physical).  The bucket id is a
    64-bit multiplicative hash of the int64 key mapped through its
    HIGH 32 bits (multiply-shift ``((hv >> 32) · n) >> 32``) —
    low-bit ``hv % n`` would make the bucket a bijection of
    ``key % n`` for power-of-two n (an odd multiplier never mixes the
    low bits upward), so strided keys would all land in one bucket.
    Reshard-stable, same high-bit discipline as the split/sample
    hash cutoffs.

    Returns {n_buckets, rows}.  Composes with ``compact_parquet`` per
    bucket for file sizing."""
    import numpy as np
    import pyarrow as pa

    from . import runtime_env

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch.column(key).combine_chunks().to_numpy(
            zero_copy_only=False)
        with np.errstate(over="ignore"):
            hv = ids.astype(np.uint64) * np.uint64(_BUCKET_MULT)
        b = ((hv >> np.uint64(32)) * np.uint64(n_buckets)) >> np.uint64(32)
        return batch.append_column(
            "bucket", pa.array(b.astype(np.int64), pa.int64()))

    tagged = ds.map_batches(tag, batch_format="pyarrow",
                            runtime_env=runtime_env())
    import shutil

    out_p = Path(out_dir)
    if out_p.exists():
        # a re-run must REPLACE the layout: write_parquet appends new
        # files beside stale ones inside existing bucket dirs, so old+new
        # rows would both be read and the footer row count double-counts
        shutil.rmtree(out_p)
    out_p.mkdir(parents=True, exist_ok=True)
    tagged.write_parquet(out_dir, partition_cols=["bucket"])
    # one streaming execution only; the row count comes from the written
    # parquet footers (metadata-only — never a second pass over the data)
    import pyarrow.parquet as _pq

    rows = sum(_pq.ParquetFile(str(f)).metadata.num_rows
               for f in Path(out_dir).rglob("*.parquet"))
    return {"n_buckets": n_buckets, "rows": rows}


def read_bucket(out_dir: str, bucket: int):
    """One bucket of a :func:`write_bucketed_parquet` layout as a
    Dataset — the unit a shuffle-free per-bucket job iterates over."""
    import ray

    return ray.data.read_parquet(str(Path(out_dir) / f"bucket={bucket}"))


def _shard_of(ids: np.ndarray, n: int) -> np.ndarray:
    """Multiply-shift shard id of int64 keys (high-bit discipline shared
    with :func:`write_bucketed_parquet` — low-bit ``% n`` degenerates on
    strided keys for power-of-two n)."""
    with np.errstate(over="ignore"):
        hv = ids.astype(np.uint64) * np.uint64(_BUCKET_MULT)
    return (((hv >> np.uint64(32)) * np.uint64(n)) >> np.uint64(32)).astype(
        np.int64)


def write_wds_shards(ds, out_dir: str, key: str = "doc_id",
                     text_col: str = "text", n_shards: int = 16,
                     skip_existing: bool = True) -> dict:
    """Training-export sink: WebDataset-layout tar shards (the public
    convention every large-scale loader — webdataset, torchdata, Mosaic
    streaming readers — consumes: one ``.tar`` per shard, each sample a
    ``{key}.txt`` text member plus a ``{key}.json`` metadata member
    sharing the basename).

    Deterministic BYTES, not just deterministic rows: shard membership
    is the multiply-shift hash of ``key`` (reshard/resume-stable — a row
    lands in the same shard regardless of input block layout), members
    are emitted in sorted-key order, and every tar header is normalized
    (mtime=0, uid/gid=0, empty uname/gname, mode 0644) so two runs over
    the same data produce byte-identical shards and the manifest's
    sha256 is a real content address.  JSON metadata is canonical
    (sorted keys, no whitespace).

    Resumable: shards already committed in ``manifest.json`` are pruned
    AT THE SCAN (same contract as :func:`write_partitioned_parquet`) and
    each shard writes to a ``.tmp`` then atomically renames — a crashed
    run leaves no partial ``.tar`` behind.

    Distributed shape: one vectorized shard-tag map, ONE all-to-all
    (``groupby(shard).map_groups`` — the unavoidable exchange any
    bucketed layout pays), each shard serialized inside its own task and
    only the (shard, n_samples, bytes, sha256) summary row returned.
    Size ``n_shards`` so data_bytes / n_shards fits a worker heap (the
    ~1 GB WebDataset shard convention): ``map_groups`` holds one whole
    shard in memory by design.  Non-key/text columns ride along as the
    JSON metadata of each sample."""
    import hashlib
    import io
    import tarfile

    import pyarrow.compute as pc

    from . import runtime_env

    base = Path(out_dir)
    base.mkdir(parents=True, exist_ok=True)
    man_path = base / "manifest.json"
    manifest = {}
    if man_path.exists():
        manifest = {int(k): v for k, v in
                    json.loads(man_path.read_text()).items()}
    # sweep uncommitted leftovers (tmp files, tars absent from the
    # manifest — a crash between rename and manifest write)
    for p in base.glob("shard-*.tar.tmp"):
        p.unlink()
    committed = {s for s, v in manifest.items()
                 if (base / v["file"]).exists()} if skip_existing else set()
    for p in base.glob("shard-*.tar"):
        s = int(p.stem.split("-", 1)[1])
        if s not in committed:
            p.unlink()

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch.column(key).combine_chunks().to_numpy(
            zero_copy_only=False)
        sh = _shard_of(ids, n_shards)
        batch = batch.append_column("_shard", pa.array(sh, pa.int64()))
        if committed:
            keep = ~np.isin(sh, np.fromiter(committed, np.int64))
            batch = batch.filter(pa.array(keep))
        return batch

    meta_cols = [c for c in ds.schema().names if c not in (key, text_col)]

    def write_shard(group: pa.Table) -> pa.Table:
        sh = int(group.column("_shard")[0].as_py())
        order = pc.sort_indices(group, sort_keys=[(key, "ascending")])
        group = group.take(order)
        ids = group.column(key).to_pylist()
        texts = group.column(text_col).to_pylist()
        metas = [group.column(c).to_pylist() for c in meta_cols]
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for i, (rid, txt) in enumerate(zip(ids, texts)):
                stem = f"{rid:012d}"
                payload = (txt or "").encode("utf-8")
                meta = json.dumps(
                    {c: vals[i] for c, vals in zip(meta_cols, metas)},
                    sort_keys=True, separators=(",", ":"),
                    default=str).encode("utf-8")
                for name, data in ((f"{stem}.txt", payload),
                                   (f"{stem}.json", meta)):
                    ti = tarfile.TarInfo(name)
                    ti.size = len(data)
                    ti.mtime = 0
                    ti.uid = ti.gid = 0
                    ti.uname = ti.gname = ""
                    ti.mode = 0o644
                    tar.addfile(ti, io.BytesIO(data))
        raw = buf.getvalue()
        fname = f"shard-{sh:05d}.tar"
        tmp = base / (fname + ".tmp")
        tmp.write_bytes(raw)
        tmp.rename(base / fname)
        return pa.table({
            "shard": pa.array([sh], pa.int64()),
            "file": pa.array([fname], pa.string()),
            "n_samples": pa.array([len(ids)], pa.int64()),
            "bytes": pa.array([len(raw)], pa.int64()),
            "sha256": pa.array([hashlib.sha256(raw).hexdigest()],
                               pa.string()),
        })

    rows = (ds.map_batches(tag, batch_format="pyarrow", batch_size=None,
                           runtime_env=runtime_env())
            .groupby("_shard")
            .map_groups(write_shard, batch_format="pyarrow")
            .take_all())  # ≤ n_shards summary rows — never sample data
    written = []
    for r in rows:
        manifest[int(r["shard"])] = {
            "file": r["file"], "n_samples": int(r["n_samples"]),
            "bytes": int(r["bytes"]), "sha256": r["sha256"],
        }
        written.append(int(r["shard"]))
    man_path.write_text(json.dumps(
        {str(k): manifest[k] for k in sorted(manifest)},
        sort_keys=True, indent=1))
    logger.info("wds shards: %d written, %d skipped → %s",
                len(written), len(committed), base)
    return {"written": sorted(written), "skipped": sorted(committed),
            "n_shards": n_shards,
            "n_samples": sum(v["n_samples"] for v in manifest.values())}


def read_wds_shards(out_dir: str, text_col: str = "text"):
    """Source twin of :func:`write_wds_shards`: every ``shard-*.tar``
    back as a Dataset of ``(<key as 'doc_id'>, <text_col>, meta)`` rows
    — ``meta`` is the sample's canonical-JSON metadata string (callers
    project typed columns out of it as needed).  One task per shard
    file (``read_binary_files`` keeps each tar a single block); parsing
    is pure per-file work, no shuffle."""
    import io
    import tarfile

    import ray

    from . import runtime_env

    paths = sorted(str(p) for p in Path(out_dir).glob("shard-*.tar"))
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      text_col: pa.array([], pa.string()),
                      "meta": pa.array([], pa.string())})
    if not paths:
        return ray.data.from_arrow(empty)
    files = ray.data.read_binary_files(paths)

    def parse(batch: pa.Table) -> pa.Table:
        ids, texts, metas = [], [], []
        for blob in batch.column("bytes").to_pylist():
            samples = {}
            with tarfile.open(fileobj=io.BytesIO(blob)) as tar:
                for m in tar:
                    stem, ext = m.name.rsplit(".", 1)
                    samples.setdefault(stem, {})[ext] = (
                        tar.extractfile(m).read())
            for stem in sorted(samples):
                ids.append(int(stem))
                texts.append(samples[stem].get("txt", b"").decode("utf-8"))
                metas.append(
                    samples[stem].get("json", b"{}").decode("utf-8"))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         text_col: pa.array(texts, pa.string()),
                         "meta": pa.array(metas, pa.string())})

    return files.map_batches(parse, batch_format="pyarrow",
                             batch_size=None, runtime_env=runtime_env())


def retention_sweep(data_dir: str, partition_col: str, ts_col: str,
                    cutoff_us: int) -> dict:
    """Retention / TTL sweep over a hive-partitioned layout (the GDPR
    "delete everything older than T" op a 100-TB store runs nightly):
    partitions WHOLLY before the cutoff are dropped as METADATA-ONLY
    directory removals (no data read, no rewrite — the reason
    time-partitioned layouts exist), the single BOUNDARY partition
    containing the cutoff is rewritten with only its surviving rows,
    and partitions at-or-after the cutoff are untouched (verifiably:
    their files are not replaced).  ``partition_col`` values must be
    integers that ORDER WITH TIME (e.g. epoch days) and
    ``cutoff_us // unit`` semantics are the caller's: this function
    compares ``ts_col`` (int64 µs) row values only inside the boundary
    partition.

    Returns ``{dropped, rewritten, kept, rows_deleted}`` (partition
    value lists / counts).  Crash-safe like the partitioned writer:
    the boundary rewrite lands in a tmp dir and renames over."""
    import shutil

    import pyarrow.parquet as _pq

    base = Path(data_dir)
    parts = {}
    for p in sorted(base.glob(f"{partition_col}=*")):
        parts[int(p.name.split("=", 1)[1])] = p
    if not parts:
        return {"dropped": [], "rewritten": [], "kept": [],
                "rows_deleted": 0}

    # which partition holds the cutoff? callers partition by a
    # time-derived integer; the boundary is the max partition whose
    # MINIMUM row ts is below the cutoff while its max reaches it
    dropped, rewritten, kept = [], [], []
    rows_deleted = 0
    for val, p in parts.items():
        files = sorted(p.glob("*.parquet"))
        mins, maxs = [], []
        for f in files:  # footer statistics only — no data read
            md = _pq.ParquetFile(str(f)).metadata
            for rg in range(md.num_row_groups):
                col = md.row_group(rg).column(
                    next(i for i in range(md.num_columns)
                         if md.row_group(rg).column(i).path_in_schema
                         == ts_col))
                st = col.statistics
                if st is None:   # stats-disabled writer: range unknown
                    # degrade to the boundary rewrite (filter is
                    # correct regardless of the true range) instead of
                    # crashing mid-sweep after partitions were dropped
                    mins.append(-(2 ** 62))
                    maxs.append(2 ** 62)
                else:
                    mins.append(st.min)
                    maxs.append(st.max)
        lo, hi = min(mins), max(maxs)
        if hi < cutoff_us:  # wholly expired: metadata-only drop
            rows_deleted += sum(
                _pq.ParquetFile(str(f)).metadata.num_rows
                for f in files)
            shutil.rmtree(p)
            dropped.append(val)
        elif lo >= cutoff_us:  # wholly retained: untouched
            kept.append(val)
        else:  # the boundary: rewrite surviving rows only
            t = _pq.read_table(str(p))
            import pyarrow.compute as pc

            keep_mask = pc.greater_equal(t.column(ts_col),
                                         pa.scalar(cutoff_us))
            survived = t.filter(keep_mask)
            rows_deleted += t.num_rows - survived.num_rows
            tmp = base / (p.name + ".tmp")
            if tmp.exists():
                shutil.rmtree(tmp)
            tmp.mkdir()
            _pq.write_table(survived, tmp / "part-0.parquet")
            shutil.rmtree(p)
            tmp.rename(p)
            rewritten.append(val)
    logger.info("retention sweep: %d dropped, %d rewritten, %d kept",
                len(dropped), len(rewritten), len(kept))
    return {"dropped": dropped, "rewritten": rewritten, "kept": kept,
            "rows_deleted": rows_deleted}


def write_delete_file(layout_dir: str, key: str, keys) -> str:
    """Merge-on-read DELETE (the Iceberg-style equality-delete half of
    lakehouse mutation): deleting rows from an immutable columnar
    layout writes a tiny sorted key file BESIDE the data — O(deleted
    keys) I/O instead of rewriting terabytes — and readers subtract it
    at scan time (:func:`read_with_deletes`) until a compaction
    (:func:`apply_deletes`) folds it in physically.  Multiple delete
    files accumulate (one per delete commit).  Returns the file path."""
    import pyarrow.parquet as _pq

    base = Path(layout_dir)
    existing = sorted(base.glob("deletes-*.parquet"))
    seq = (int(existing[-1].stem.split("-")[1]) + 1) if existing else 0
    arr = np.unique(np.asarray(list(keys), np.int64))
    path = base / f"deletes-{seq:04d}.parquet"
    tmp = base / (path.name + ".tmp")
    _pq.write_table(pa.table({key: pa.array(arr, pa.int64())}),
                    str(tmp))
    tmp.rename(path)
    return str(path)


def _delete_set(layout_dir: str, key: str) -> np.ndarray:
    import pyarrow.parquet as _pq

    base = Path(layout_dir)
    parts = [
        _pq.read_table(str(f), columns=[key]).column(key)
        .to_numpy(zero_copy_only=False)
        for f in sorted(base.glob("deletes-*.parquet"))
    ]
    return (np.unique(np.concatenate(parts)) if parts
            else np.empty(0, np.int64))


def read_with_deletes(layout_dir: str, key: str):
    """The merge-on-read SCAN: data files minus the accumulated delete
    files' keys — the union of delete keys broadcasts once (delete sets
    are mutation-bounded, not data-bounded) and every batch subtracts
    it with one searchsorted.  Returns a Dataset."""
    import ray

    from . import runtime_env
    from .broadcast import cached_get

    base = Path(layout_dir)
    data_files = sorted(
        str(f) for f in base.rglob("*.parquet")
        if not f.name.startswith("deletes-"))
    dels = _delete_set(layout_dir, key)
    ds = ray.data.read_parquet(data_files)
    if not len(dels):
        return ds
    ref = ray.put(dels)

    def subtract(batch: pa.Table) -> pa.Table:
        d = cached_get(ref)
        k = batch.column(key).combine_chunks().to_numpy(
            zero_copy_only=False)
        pos = np.searchsorted(d, k)
        pos[pos >= len(d)] = 0
        return batch.filter(pa.array(d[pos] != k))

    return ds.map_batches(subtract, batch_format="pyarrow",
                          batch_size=None, runtime_env=runtime_env())


def apply_deletes(layout_dir: str, key: str) -> dict:
    """Delete compaction (merge-on-read → copy-on-write): physically
    rewrite ONLY the data files whose footer key range intersects the
    delete set (row-group min/max statistics — untouched files keep
    their inodes, the no-rewrite proof), then remove the delete files.
    Returns {rewritten, skipped, rows_deleted}."""
    import pyarrow.parquet as _pq

    base = Path(layout_dir)
    dels = _delete_set(layout_dir, key)
    rewritten, skipped = [], []
    rows_deleted = 0
    for f in sorted(base.rglob("*.parquet")):
        if f.name.startswith("deletes-"):
            continue
        md = _pq.ParquetFile(str(f)).metadata
        ki = next(i for i in range(md.num_columns)
                  if md.row_group(0).column(i).path_in_schema == key)
        sts = [md.row_group(g).column(ki).statistics
               for g in range(md.num_row_groups)]
        if any(st is None for st in sts):
            # stats-disabled writer: cannot prune by footer range —
            # rewrite unconditionally (the subtract is correct either
            # way) instead of crashing on st.min
            span = dels
        else:
            lo = min(st.min for st in sts)
            hi = max(st.max for st in sts)
            span = dels[(dels >= lo) & (dels <= hi)]
        if not len(span):
            skipped.append(str(f))
            continue
        t = _pq.read_table(str(f))
        k = t.column(key).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(dels, k)
        pos[pos >= len(dels)] = 0
        keep = dels[pos] != k
        survived = t.filter(pa.array(keep))
        rows_deleted += t.num_rows - survived.num_rows
        tmp = f.with_name(f.name + ".tmp")
        _pq.write_table(survived, str(tmp))
        tmp.rename(f)
        rewritten.append(str(f))
    for df in sorted(base.glob("deletes-*.parquet")):
        df.unlink()
    logger.info("delete compaction: %d rewritten, %d skipped, %d rows",
                len(rewritten), len(skipped), rows_deleted)
    return {"rewritten": rewritten, "skipped": skipped,
            "rows_deleted": rows_deleted}


def read_evolved(layout_dir: str, defaults: Dict[str, object] | None
                 = None):
    """Schema-evolution-on-read: one Dataset over a layout whose files
    were written under DIFFERENT schema versions (the lake reality —
    a column added in March exists only in files written since March).
    File footers are grouped by schema signature (metadata-only), each
    group gets ONE ``read_parquet``, missing columns are filled with
    the caller's typed default (or null) inside a per-batch map, and
    the groups union into a single uniform-schema Dataset — columns
    ordered canonically so downstream schema checks are stable.

    ``defaults`` maps column name → fill value for files predating the
    column; columns absent from it fill with nulls.  Types come from
    the newest file that HAS the column."""
    import pyarrow.parquet as _pq
    import ray

    from . import runtime_env

    files = sorted(str(f) for f in Path(layout_dir).rglob("*.parquet")
                   if not f.name.startswith("deletes-"))
    groups: Dict[tuple, list] = {}
    field_types: Dict[str, pa.DataType] = {}
    for f in files:  # footers only — no data read
        sch = _pq.ParquetFile(f).schema_arrow
        sig = tuple(sorted(sch.names))
        groups.setdefault(sig, []).append(f)
        for name in sch.names:
            field_types[name] = sch.field(name).type  # newest wins
    all_cols = sorted(field_types)
    defaults = defaults or {}

    def widen(batch: pa.Table) -> pa.Table:
        cols = {}
        for name in all_cols:
            if name in batch.column_names:
                cols[name] = batch.column(name)
            else:
                fill = defaults.get(name)
                cols[name] = pa.array(
                    [fill] * batch.num_rows, field_types[name])
        return pa.table(cols)

    parts = []
    for sig, fs in sorted(groups.items()):
        parts.append(ray.data.read_parquet(fs).map_batches(
            widen, batch_format="pyarrow", batch_size=None,
            runtime_env=runtime_env()))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


# ── indexed binary token-shard export (Megatron-style .bin/.idx) ─────────────

_TOKIDX_MAGIC = b"DWHIDX01"


def write_token_shards(ds, out_dir: str, id_column: str = "doc_id",
                       tokens_column: str = "token_ids",
                       n_shards: int = 8,
                       skip_existing: bool = True) -> dict:
    """Training-export sink in the Megatron-LM indexed-dataset SHAPE
    (public format family: one ``.bin`` of concatenated token-id arrays
    + one ``.idx`` of per-sample offsets, so a loader memory-maps the
    ``.bin`` and random-accesses sample i as
    ``bin[4·off[i] : 4·off[i+1]]`` without parsing): ``tokens_column``
    is a ``large_binary`` blob of little-endian int32 ids per doc (the
    LIST-free exchange discipline).  ``.idx`` layout:
    magic ``DWHIDX01`` + int64 n_samples + int64 doc_ids[n] +
    int64 element_offsets[n+1].

    Deterministic-bytes sink discipline (write_wds_shards): shard
    membership = multiply-shift hash of the id (reshard/resume-stable),
    samples in sorted-id order, tmp-write + atomic rename, committed
    shards pruned at the scan, sha256 manifest per file.  ONE
    groupby(shard) exchange; only summary rows reach the driver.
    Returns {written, n_shards, n_samples, n_tokens}."""
    import hashlib

    import pyarrow.compute as pc

    from . import runtime_env

    base = Path(out_dir)
    base.mkdir(parents=True, exist_ok=True)
    man_path = base / "manifest.json"
    manifest = {}
    if man_path.exists():
        manifest = {int(k): v for k, v in
                    json.loads(man_path.read_text()).items()}
    for p in list(base.glob("shard-*.bin.tmp")) + list(
            base.glob("shard-*.idx.tmp")):
        p.unlink()
    committed = {s for s, v in manifest.items()
                 if (base / v["file_bin"]).exists()
                 and (base / v["file_idx"]).exists()} \
        if skip_existing else set()
    for p in list(base.glob("shard-*.bin")) + list(base.glob("shard-*.idx")):
        s = int(p.stem.split("-", 1)[1].split(".")[0])
        if s not in committed:
            p.unlink()

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).combine_chunks().to_numpy(
            zero_copy_only=False)
        sh = _shard_of(ids, n_shards)
        batch = batch.append_column("_shard", pa.array(sh, pa.int64()))
        if committed:
            keep = ~np.isin(sh, np.fromiter(committed, np.int64))
            batch = batch.filter(pa.array(keep))
        return batch

    def write_shard(group: pa.Table) -> pa.Table:
        sh = int(group.column("_shard")[0].as_py())
        group = group.take(pc.sort_indices(
            group, sort_keys=[(id_column, "ascending")]))
        ids = group.column(id_column).to_pylist()
        blobs = group.column(tokens_column).to_pylist()
        bad = [i for i, b in zip(ids, blobs) if len(b) % 4]
        assert not bad, (
            f"write_token_shards: token blobs must be little-endian "
            f"int32 (length % 4 == 0); offending ids: {bad[:5]}")
        lens = np.asarray([len(b) // 4 for b in blobs], np.int64)
        offs = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=offs[1:])
        bin_bytes = b"".join(blobs)
        idx_bytes = (_TOKIDX_MAGIC
                     + np.int64(len(ids)).tobytes()
                     + np.asarray(ids, "<i8").tobytes()
                     + offs.astype("<i8").tobytes())
        fbin, fidx = f"shard-{sh:05d}.bin", f"shard-{sh:05d}.idx"
        for fname, data in ((fbin, bin_bytes), (fidx, idx_bytes)):
            tmp = base / (fname + ".tmp")
            tmp.write_bytes(data)
            tmp.rename(base / fname)
        return pa.table({
            "shard": pa.array([sh], pa.int64()),
            "file_bin": pa.array([fbin], pa.string()),
            "file_idx": pa.array([fidx], pa.string()),
            "n_samples": pa.array([len(ids)], pa.int64()),
            "n_tokens": pa.array([int(lens.sum())], pa.int64()),
            "sha256_bin": pa.array(
                [hashlib.sha256(bin_bytes).hexdigest()], pa.string()),
            "sha256_idx": pa.array(
                [hashlib.sha256(idx_bytes).hexdigest()], pa.string()),
        })

    rows = (ds.map_batches(tag, batch_format="pyarrow", batch_size=None,
                           runtime_env=runtime_env())
            .groupby("_shard")
            .map_groups(write_shard, batch_format="pyarrow")
            .take_all())  # ≤ n_shards summary rows
    for r in rows:
        manifest[int(r["shard"])] = {
            "file_bin": r["file_bin"], "file_idx": r["file_idx"],
            "n_samples": int(r["n_samples"]),
            "n_tokens": int(r["n_tokens"]),
            "sha256_bin": r["sha256_bin"], "sha256_idx": r["sha256_idx"],
        }
    man_path.write_text(json.dumps(
        {str(k): v for k, v in sorted(manifest.items())},
        sort_keys=True, indent=1))
    logger.info("token-shard export: %d shards → %s", len(rows), base)
    return {
        "written": sorted(int(r["shard"]) for r in rows),
        "n_shards": n_shards,
        "n_samples": sum(v["n_samples"] for v in manifest.values()),
        "n_tokens": sum(v["n_tokens"] for v in manifest.values()),
    }


def read_token_shards(out_dir: str):
    """A :func:`write_token_shards` layout back as a Dataset of
    ``(doc_id, token_ids)`` rows (blob of little-endian int32 ids per
    doc) — one task per shard, pure per-file parse, no shuffle; the
    random-access contract (idx offsets into the bin) is exercised by
    slicing per sample rather than bulk-splitting."""
    import ray

    from . import runtime_env

    pairs = sorted(str(f) for f in Path(out_dir).glob("shard-*.idx"))
    empty = pa.table({
        "doc_id": pa.array([], pa.int64()),
        "token_ids": pa.array([], pa.large_binary()),
    })
    if not pairs:
        return ray.data.from_arrow(empty)
    files = ray.data.read_binary_files(pairs, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        out_id, out_tok = [], []
        for path, idx in zip(batch.column("path").to_pylist(),
                             batch.column("bytes").to_pylist()):
            assert idx[:8] == _TOKIDX_MAGIC, f"bad idx magic in {path}"
            n = int(np.frombuffer(idx, "<i8", 1, 8)[0])
            ids = np.frombuffer(idx, "<i8", n, 16)
            offs = np.frombuffer(idx, "<i8", n + 1, 16 + 8 * n)
            bin_bytes = Path(path[:-4] + ".bin").read_bytes()
            for i in range(n):
                out_id.append(int(ids[i]))
                out_tok.append(bin_bytes[4 * offs[i]:4 * offs[i + 1]])
        if not out_id:
            return empty
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "token_ids": pa.array(out_tok, pa.large_binary()),
        })

    return files.map_batches(parse, batch_format="pyarrow",
                             batch_size=None, runtime_env=runtime_env())
