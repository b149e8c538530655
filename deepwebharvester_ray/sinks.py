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
