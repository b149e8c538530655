"""WARC source + sink — the web-archive format of the public crawl world
(ISO 28500; Common Crawl publishes its entire corpus this way).

A webtext engine that cannot read WARC cannot ingest the one corpus every
large-scale training pipeline actually starts from, so this is a
first-class source: ``read_warc`` turns a directory of ``*.warc`` /
``*.warc.gz`` shards into the SAME (url, warc_ts, html, text, …) Dataset
the synthetic corpus produces — every downstream stage (extract, intel,
dedup, …) runs over Common-Crawl-shaped input unchanged.

Stdlib-only (no warcio): the format is length-prefixed records —
``WARC/1.1`` + header lines + blank line + ``Content-Length`` payload +
``\\r\\n\\r\\n`` — and Common Crawl's gzip convention is one gzip MEMBER
per record, members concatenated (``gzip.decompress`` consumes multi-member
streams natively, so a whole shard decodes in one call).

Two record types cover the two Common Crawl products:

* ``response`` (``.warc``) — payload is a full HTTP response; the reader
  splits status line / headers / body and surfaces the body as ``html``.
* ``conversion`` (``.wet``) — payload is extracted plain text, surfaced
  as ``text``.

The writer exists for round-trip testing and for EXPORTING a crawl in the
interchange format other tools consume.  Deterministic bytes, same
discipline as the WebDataset sink: shard membership is the multiply-shift
hash of the url's blake2b-64 (reshard-stable), records emit in sorted-url
order, ``WARC-Record-ID`` is the RFC-4122 uuid5 of the url (not a random
uuid), gzip members carry ``mtime=0`` — the manifest sha256 is a content
address and two runs over the same data are byte-identical.

Distributed shape: the reader is one task per shard file
(``read_binary_files``) + a pure per-file parse, no shuffle; the writer is
one vectorized shard-tag map + ONE ``groupby(shard).map_groups`` exchange
(the all-to-all any deterministic sharded layout pays), summary rows only
to the driver.  Size ``n_shards`` so a shard fits a worker heap — the
~1 GB Common Crawl shard convention.
"""
from __future__ import annotations

import gzip
import hashlib
import io
import json
import logging
import uuid
from datetime import datetime, timezone
from pathlib import Path

import numpy as np
import pyarrow as pa

logger = logging.getLogger(__name__)

_CRLF = b"\r\n"


def _warc_date(ts_us: int) -> str:
    """WARC-Date with microseconds (WARC/1.1 allows fractional seconds;
    second-truncation would break the warc_ts round-trip)."""
    dt = datetime.fromtimestamp(ts_us / 1_000_000, tz=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%S.%fZ")


def _parse_warc_date(s: str) -> int:
    """Inverse of :func:`_warc_date`; tolerates the second-precision form
    real Common Crawl files carry."""
    import calendar

    s = s.strip()
    fmt = "%Y-%m-%dT%H:%M:%S.%fZ" if "." in s else "%Y-%m-%dT%H:%M:%SZ"
    dt = datetime.strptime(s, fmt)
    # exact integer epoch — float timestamp() loses microseconds past 2^53 ns
    return calendar.timegm(dt.timetuple()) * 1_000_000 + dt.microsecond


def surt(url: str) -> str:
    """Sort-friendly URI Reordering Transform — the CDX index key
    convention (public: Internet Archive / Common Crawl index format).
    Host labels reverse so one host's (and one domain's) records sort
    CONTIGUOUSLY: ``http://sub.example.com/a?b=1`` →
    ``com,example,sub)/a?b=1``.  Lowercased, scheme and a default port
    dropped, bare root path normalized to ``/``."""
    from urllib.parse import urlsplit

    parts = urlsplit(url.strip().lower())
    host = parts.netloc.split("@")[-1]
    for dp in (":80", ":443"):
        if host.endswith(dp):
            host = host[: -len(dp)]
    key = ",".join(reversed(host.split("."))) + ")" + (parts.path or "/")
    if parts.query:
        key += "?" + parts.query
    return key


def _ts14(ts_us: int) -> str:
    """CDX 14-digit timestamp (YYYYMMDDhhmmss)."""
    return datetime.fromtimestamp(
        ts_us / 1_000_000, tz=timezone.utc).strftime("%Y%m%d%H%M%S")


_REVISIT_PROFILE = b"http://netpreserve.org/warc/1.1/revisit/identical-payload-digest"


def _record_bytes(url: str, ts_us: int, payload: bytes,
                  record_type: str,
                  refers_to_url: str | None = None,
                  refers_to_ts_us: int | None = None,
                  payload_digest: str | None = None) -> bytes:
    """One WARC/1.1 record.  ``response`` wraps the payload in a minimal
    HTTP/1.1 200 envelope (the msgtype the spec mandates for responses);
    ``conversion`` carries it raw (the WET convention); ``revisit``
    (ISO 28500 §6.7.2, identical-payload-digest profile) carries NO
    payload — only the digest and the WARC-Refers-To* pointers at the
    record it duplicates (the recrawl storage-dedup mechanism real
    archives use; the referred record id is reconstructible because the
    writer's ids are uuid5(url))."""
    if record_type == "response":
        http = (b"HTTP/1.1 200 OK" + _CRLF
                + b"Content-Type: text/html; charset=utf-8" + _CRLF
                + b"Content-Length: " + str(len(payload)).encode() + _CRLF
                + _CRLF + payload)
        body, ctype = http, b"application/http; msgtype=response"
    elif record_type == "conversion":
        body, ctype = payload, b"text/plain"
    elif record_type == "revisit":
        body, ctype = b"", b"application/http; msgtype=response"
    else:  # pragma: no cover - caller validates
        raise ValueError(f"unsupported record_type {record_type!r}")
    rid = uuid.uuid5(uuid.NAMESPACE_URL, url)
    head = (b"WARC/1.1" + _CRLF
            + b"WARC-Type: " + record_type.encode() + _CRLF
            + b"WARC-Record-ID: <urn:uuid:" + str(rid).encode() + b">"
            + _CRLF
            + b"WARC-Date: " + _warc_date(ts_us).encode() + _CRLF
            + b"WARC-Target-URI: " + url.encode("utf-8") + _CRLF)
    if record_type == "revisit":
        ref_id = uuid.uuid5(uuid.NAMESPACE_URL, refers_to_url or url)
        head += (b"WARC-Profile: " + _REVISIT_PROFILE + _CRLF
                 + b"WARC-Payload-Digest: sha1:"
                 + (payload_digest or "").encode() + _CRLF
                 + b"WARC-Refers-To: <urn:uuid:" + str(ref_id).encode()
                 + b">" + _CRLF
                 + b"WARC-Refers-To-Target-URI: "
                 + (refers_to_url or url).encode("utf-8") + _CRLF
                 + b"WARC-Refers-To-Date: "
                 + _warc_date(refers_to_ts_us or ts_us).encode() + _CRLF)
    head += (b"Content-Type: " + ctype + _CRLF
             + b"Content-Length: " + str(len(body)).encode() + _CRLF
             + _CRLF)
    return head + body + _CRLF + _CRLF


def _parse_records(raw: bytes) -> list:
    """Parse every record of one (already-decompressed) WARC stream into
    ``(url, ts_us, record_type, http_status, html, text)`` tuples.
    Record types other than response/conversion (warcinfo, request,
    metadata — all present in real Common Crawl files) are skipped."""
    out = []
    pos = 0
    n = len(raw)
    while pos < n:
        if raw.startswith(b"\r\n", pos):  # inter-record separators
            pos += 2
            continue
        head_end = raw.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        headers = {}
        lines = raw[pos:head_end].split(_CRLF)
        for ln in lines[1:]:  # lines[0] is the WARC/1.x version
            k, _, v = ln.partition(b":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers.get(b"content-length", b"0"))
        body = raw[head_end + 4:head_end + 4 + length]
        pos = head_end + 4 + length
        rtype = headers.get(b"warc-type", b"").decode()
        if rtype not in ("response", "conversion", "revisit"):
            continue
        url = headers.get(b"warc-target-uri", b"").decode("utf-8")
        ts_us = _parse_warc_date(headers.get(b"warc-date",
                                             b"1970-01-01T00:00:00Z")
                                 .decode())
        if rtype == "revisit":
            # payload lives in the referred record (fetch_records on the
            # base archive resolves it); the row carries only identity
            out.append((url, ts_us, rtype, 0, b"", ""))
        elif rtype == "response":
            split = body.find(b"\r\n\r\n")
            http_head = body[:max(split, 0)]
            status = 0
            first = http_head.split(_CRLF, 1)[0].split(b" ")
            if len(first) >= 2 and first[1].isdigit():
                status = int(first[1])
            out.append((url, ts_us, rtype, status,
                        body[split + 4:] if split >= 0 else b"", ""))
        else:
            out.append((url, ts_us, rtype, 0, b"",
                        body.decode("utf-8", errors="replace")))
    return out


_EMPTY = pa.table({
    "url": pa.array([], pa.string()),
    "warc_ts": pa.array([], pa.timestamp("us")),
    "record_type": pa.array([], pa.string()),
    "http_status": pa.array([], pa.int64()),
    "html": pa.array([], pa.binary()),
    "text": pa.array([], pa.string()),
})


def read_warc(path: str):
    """Every ``*.warc`` / ``*.warc.gz`` under ``path`` (a directory, or
    one file) as a Dataset of
    ``(url, warc_ts, record_type, http_status, html, text)`` rows —
    ``html`` filled for response records, ``text`` for conversion (WET)
    records.  One read task per shard file; parsing is pure per-file
    work, no shuffle.  Feed the result straight into the extract/intel
    stages — they are source-agnostic by construction."""
    import ray

    from . import runtime_env

    p = Path(path)
    if p.is_dir():
        paths = sorted(str(f) for pat in ("*.warc", "*.warc.gz")
                       for f in p.glob(pat))
    else:
        paths = [str(p)]
    if not paths:
        return ray.data.from_arrow(_EMPTY)
    files = ray.data.read_binary_files(paths)

    def parse(batch: pa.Table) -> pa.Table:
        rows = []
        for blob in batch.column("bytes").to_pylist():
            if blob[:2] == b"\x1f\x8b":  # multi-member gzip shard
                blob = gzip.decompress(blob)
            rows.extend(_parse_records(blob))
        if not rows:
            return _EMPTY
        cols = list(zip(*rows))
        return pa.table({
            "url": pa.array(cols[0], pa.string()),
            "warc_ts": pa.array(
                np.asarray(cols[1], np.int64)).cast(pa.timestamp("us")),
            "record_type": pa.array(cols[2], pa.string()),
            "http_status": pa.array(cols[3], pa.int64()),
            "html": pa.array(cols[4], pa.binary()),
            "text": pa.array(cols[5], pa.string()),
        })

    return files.map_batches(parse, batch_format="pyarrow",
                             batch_size=None, runtime_env=runtime_env())


def write_warc(ds, out_dir: str, record_type: str = "response",
               n_shards: int = 16, gzip_records: bool = True) -> dict:
    """Export a pages Dataset (``url``, ``warc_ts``, and ``html`` or
    ``text`` per ``record_type``) as ``n_shards`` WARC shard files with
    a sha256 ``manifest.json`` — deterministic bytes (see module
    docstring).  Returns {written, n_shards, n_samples}."""
    import pyarrow.compute as pc
    import ray  # noqa: F401  (Dataset ops only)

    from . import runtime_env
    from .sinks import _shard_of
    from .urlops import url_hash64

    if record_type not in ("response", "conversion"):
        raise ValueError(f"unsupported record_type {record_type!r}")
    payload_col = "html" if record_type == "response" else "text"
    base = Path(out_dir)
    base.mkdir(parents=True, exist_ok=True)
    suffix = ".warc.gz" if gzip_records else ".warc"
    for pat in ("shard-*.warc*", "shard-*.cdx"):  # replace-the-layout
        for stale in base.glob(pat):
            stale.unlink()

    def tag(batch: pa.Table) -> pa.Table:
        hv = np.asarray(
            [url_hash64(u) for u in batch.column("url").to_pylist()],
            np.uint64).astype(np.int64)
        return pa.table({
            "url": batch.column("url"),
            "ts_us": batch.column("warc_ts").combine_chunks()
            .cast(pa.timestamp("us")).cast(pa.int64()),
            "payload": batch.column(payload_col),
            "_shard": pa.array(_shard_of(hv, n_shards), pa.int64()),
        })

    def write_shard(group: pa.Table) -> pa.Table:
        sh = int(group.column("_shard")[0].as_py())
        group = group.take(
            pc.sort_indices(group, sort_keys=[("url", "ascending")]))
        fname = f"shard-{sh:05d}{suffix}"
        buf = io.BytesIO()
        index = []
        for url, ts_us, payload in zip(group.column("url").to_pylist(),
                                       group.column("ts_us").to_pylist(),
                                       group.column("payload").to_pylist()):
            if isinstance(payload, str):
                payload = payload.encode("utf-8")
            rec = _record_bytes(url, ts_us, payload or b"", record_type)
            off = buf.tell()
            buf.write(gzip.compress(rec, mtime=0) if gzip_records else rec)
            # CDXJ line: urlkey ts14 {json} — (offset, length) of this
            # record's own gzip member = the Common Crawl random-access
            # contract (seek + read length + decompress ONE member)
            index.append(
                f"{surt(url)} {_ts14(ts_us)} " + json.dumps(
                    {"url": url, "filename": fname, "offset": off,
                     "length": buf.tell() - off,
                     "digest": hashlib.sha1(payload or b"").hexdigest()},
                    sort_keys=True, separators=(",", ":")))
        raw = buf.getvalue()
        tmp = base / (fname + ".tmp")
        tmp.write_bytes(raw)
        tmp.rename(base / fname)
        cdx = base / f"shard-{sh:05d}.cdx"
        cdx_tmp = base / (cdx.name + ".tmp")
        cdx_tmp.write_text("\n".join(sorted(index)) + "\n")
        cdx_tmp.rename(cdx)
        return pa.table({
            "shard": pa.array([sh], pa.int64()),
            "file": pa.array([fname], pa.string()),
            "n_samples": pa.array([group.num_rows], pa.int64()),
            "bytes": pa.array([len(raw)], pa.int64()),
            "sha256": pa.array([hashlib.sha256(raw).hexdigest()],
                               pa.string()),
        })

    rows = (ds.map_batches(tag, batch_format="pyarrow", batch_size=None,
                           runtime_env=runtime_env())
            .groupby("_shard")
            .map_groups(write_shard, batch_format="pyarrow")
            .take_all())  # ≤ n_shards summary rows
    manifest = {str(r["shard"]): {
        "file": r["file"], "n_samples": int(r["n_samples"]),
        "bytes": int(r["bytes"]), "sha256": r["sha256"]} for r in rows}
    (base / "manifest.json").write_text(json.dumps(
        manifest, sort_keys=True, indent=1))
    logger.info("warc export: %d shards → %s", len(rows), base)
    return {"written": sorted(int(r["shard"]) for r in rows),
            "n_shards": n_shards,
            "n_samples": sum(int(r["n_samples"]) for r in rows)}


def write_warc_delta(ds, out_dir: str, base_dir: str,
                     n_shards: int = 16, gzip_records: bool = True,
                     broadcast_cutoff: int = 2_000_000,
                     num_partitions: int = 8) -> dict:
    """Snapshot export with ISO 28500 §6.7.2 REVISIT dedup against a
    BASE archive: pages whose payload sha1 equals the base CDX digest
    for the same URL are written as header-only ``WARC-Type: revisit``
    records (identical-payload-digest profile, WARC-Refers-To* pointing
    at the base record); changed/new pages are full response records —
    how a recrawl snapshot of a 100-TB archive stores only its deltas.

    The base is consulted through its CDX INDEX only (url → digest,
    ts14) — index-sized I/O, never base payload bytes; the lookup is
    size-gated (broadcast url→(digest, ts) map below the cutoff, native
    left-outer hash join on the url key above).  Delta CDX lines keep
    ``digest`` = the PAYLOAD digest for revisit records too, so a
    second delta against THIS archive still dedups (chained-delta
    contract, pinned in tests); each line also carries ``rtype``.
    Same byte-determinism discipline as :func:`write_warc`.  The base
    CDX must be url-unique (the write_warc contract: one record per
    url per export).  Returns {written, n_shards, n_samples,
    n_revisit, n_response}."""
    import calendar

    import pyarrow.compute as pc
    import ray

    from . import runtime_env
    from .broadcast import cached_get
    from .sinks import _shard_of
    from .urlops import url_hash64

    base = Path(out_dir)
    base.mkdir(parents=True, exist_ok=True)
    suffix = ".warc.gz" if gzip_records else ".warc"
    for pat in ("shard-*.warc*", "shard-*.cdx"):
        for stale in base.glob(pat):
            stale.unlink()

    def _ts14_to_us(ts14: str) -> int:
        import time as _time

        st = _time.strptime(ts14, "%Y%m%d%H%M%S")
        return calendar.timegm(st) * 1_000_000

    idx = read_cdx(base_dir)

    def digest_rows(batch: pa.Table) -> pa.Table:
        texts = batch.column("html").to_pylist()
        payloads = [(t.encode("utf-8") if isinstance(t, str) else (t or b""))
                    for t in texts]
        return pa.table({
            "url": batch.column("url"),
            "ts_us": batch.column("warc_ts").combine_chunks()
            .cast(pa.timestamp("us")).cast(pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "digest": pa.array(
                [hashlib.sha1(p).hexdigest() for p in payloads],
                pa.string()),
        })

    pages = ds.map_batches(digest_rows, batch_format="pyarrow",
                           batch_size=None, runtime_env=runtime_env())

    n_idx = idx.count()
    if n_idx <= broadcast_cutoff:
        tbls = ray.get(idx.to_arrow_refs())
        lut = {}
        for t in tbls:
            if t.num_rows == 0:   # schema-less empty blocks exist
                continue
            for u, d, ts14 in zip(t.column("url").to_pylist(),
                                  t.column("digest").to_pylist(),
                                  t.column("ts14").to_pylist()):
                lut[u] = (d, _ts14_to_us(ts14))
        ref = ray.put(lut)

        def classify(batch: pa.Table) -> pa.Table:
            table = cached_get(ref)
            urls = batch.column("url").to_pylist()
            digs = batch.column("digest").to_pylist()
            hits = [table.get(u) for u in urls]
            revisit = [h is not None and h[0] == d
                       for h, d in zip(hits, digs)]
            return pa.table({
                "url": batch.column("url"),
                "ts_us": batch.column("ts_us"),
                "payload": batch.column("payload"),
                "digest": batch.column("digest"),
                "revisit": pa.array(revisit, pa.bool_()),
                "ref_ts_us": pa.array(
                    [(h[1] if r else 0)
                     for h, r in zip(hits, revisit)], pa.int64()),
            })

        classified = pages.map_batches(classify, batch_format="pyarrow",
                                       runtime_env=runtime_env())
    else:
        from .functions.partition import coalesce_nonempty

        marker = idx.map_batches(
            lambda b: pa.table({
                "__b_url": b.column("url"),
                "__b_digest": b.column("digest"),
                "__b_ts14": b.column("ts14"),
            }), batch_format="pyarrow", runtime_env=runtime_env())
        pages_nz = coalesce_nonempty(pages)
        if pages_nz is None:
            classified = None
        else:
            joined = pages_nz.join(
                coalesce_nonempty(marker), "left_outer",
                num_partitions=num_partitions,
                on=("url",), right_on=("__b_url",))

            def classify_joined(batch: pa.Table) -> pa.Table:
                bd = batch.column("__b_digest").to_pylist()
                bt = batch.column("__b_ts14").to_pylist()
                digs = batch.column("digest").to_pylist()
                revisit = [b is not None and b == d
                           for b, d in zip(bd, digs)]
                return pa.table({
                    "url": batch.column("url"),
                    "ts_us": batch.column("ts_us"),
                    "payload": batch.column("payload"),
                    "digest": batch.column("digest"),
                    "revisit": pa.array(revisit, pa.bool_()),
                    "ref_ts_us": pa.array(
                        [(_ts14_to_us(t) if r else 0)
                         for t, r in zip(bt, revisit)], pa.int64()),
                })

            classified = joined.map_batches(
                classify_joined, batch_format="pyarrow",
                runtime_env=runtime_env())
    if classified is None:
        (base / "manifest.json").write_text(json.dumps({}, sort_keys=True,
                                                       indent=1))
        return {"written": [], "n_shards": n_shards, "n_samples": 0,
                "n_revisit": 0, "n_response": 0}

    def tag(batch: pa.Table) -> pa.Table:
        hv = np.asarray(
            [url_hash64(u) for u in batch.column("url").to_pylist()],
            np.uint64).astype(np.int64)
        return batch.append_column(
            "_shard", pa.array(_shard_of(hv, n_shards), pa.int64()))

    def write_shard(group: pa.Table) -> pa.Table:
        sh = int(group.column("_shard")[0].as_py())
        group = group.take(
            pc.sort_indices(group, sort_keys=[("url", "ascending")]))
        fname = f"shard-{sh:05d}{suffix}"
        buf = io.BytesIO()
        index = []
        n_rev = 0
        for url, ts_us, payload, digest, revisit, ref_ts in zip(
                group.column("url").to_pylist(),
                group.column("ts_us").to_pylist(),
                group.column("payload").to_pylist(),
                group.column("digest").to_pylist(),
                group.column("revisit").to_pylist(),
                group.column("ref_ts_us").to_pylist()):
            if revisit:
                rec = _record_bytes(url, ts_us, b"", "revisit",
                                    refers_to_url=url,
                                    refers_to_ts_us=ref_ts,
                                    payload_digest=digest)
                n_rev += 1
            else:
                rec = _record_bytes(url, ts_us, payload or b"", "response")
            off = buf.tell()
            buf.write(gzip.compress(rec, mtime=0) if gzip_records else rec)
            index.append(
                f"{surt(url)} {_ts14(ts_us)} " + json.dumps(
                    {"url": url, "filename": fname, "offset": off,
                     "length": buf.tell() - off, "digest": digest,
                     "rtype": "revisit" if revisit else "response"},
                    sort_keys=True, separators=(",", ":")))
        raw = buf.getvalue()
        tmp = base / (fname + ".tmp")
        tmp.write_bytes(raw)
        tmp.rename(base / fname)
        cdx = base / f"shard-{sh:05d}.cdx"
        cdx_tmp = base / (cdx.name + ".tmp")
        cdx_tmp.write_text("\n".join(sorted(index)) + "\n")
        cdx_tmp.rename(cdx)
        return pa.table({
            "shard": pa.array([sh], pa.int64()),
            "file": pa.array([fname], pa.string()),
            "n_samples": pa.array([group.num_rows], pa.int64()),
            "n_revisit": pa.array([n_rev], pa.int64()),
            "bytes": pa.array([len(raw)], pa.int64()),
            "sha256": pa.array([hashlib.sha256(raw).hexdigest()],
                               pa.string()),
        })

    rows = (classified.map_batches(tag, batch_format="pyarrow",
                                   batch_size=None,
                                   runtime_env=runtime_env())
            .groupby("_shard")
            .map_groups(write_shard, batch_format="pyarrow")
            .take_all())  # ≤ n_shards summary rows
    manifest = {str(r["shard"]): {
        "file": r["file"], "n_samples": int(r["n_samples"]),
        "bytes": int(r["bytes"]), "sha256": r["sha256"]} for r in rows}
    (base / "manifest.json").write_text(json.dumps(
        manifest, sort_keys=True, indent=1))
    n_samples = sum(int(r["n_samples"]) for r in rows)
    n_revisit = sum(int(r["n_revisit"]) for r in rows)
    logger.info("warc delta export: %d shards, %d/%d revisit → %s",
                len(rows), n_revisit, n_samples, base)
    return {"written": sorted(int(r["shard"]) for r in rows),
            "n_shards": n_shards, "n_samples": n_samples,
            "n_revisit": n_revisit,
            "n_response": n_samples - n_revisit}


def read_cdx(path: str):
    """Every ``shard-*.cdx`` under ``path`` as a Dataset of
    ``(urlkey, ts14, url, filename, offset, length, digest)`` rows —
    the archive's URL index, scanned WITHOUT touching any WARC bytes.
    One task per index file, pure per-file parse; index volume is
    O(records), never O(payload bytes), so host/domain selection over a
    100-TB archive reads only the index (SURT keys make a domain one
    contiguous key range)."""
    import ray

    from . import runtime_env

    paths = sorted(str(f) for f in Path(path).glob("shard-*.cdx"))
    empty = pa.table({
        "urlkey": pa.array([], pa.string()),
        "ts14": pa.array([], pa.string()),
        "url": pa.array([], pa.string()),
        "filename": pa.array([], pa.string()),
        "offset": pa.array([], pa.int64()),
        "length": pa.array([], pa.int64()),
        "digest": pa.array([], pa.string()),
        "rtype": pa.array([], pa.string()),
    })
    if not paths:
        return ray.data.from_arrow(empty)
    files = ray.data.read_binary_files(paths)

    def parse(batch: pa.Table) -> pa.Table:
        cols = {k: [] for k in empty.column_names}
        for blob in batch.column("bytes").to_pylist():
            for ln in blob.decode("utf-8").splitlines():
                if not ln.strip():
                    continue
                key, ts, js = ln.split(" ", 2)
                meta = json.loads(js)
                cols["urlkey"].append(key)
                cols["ts14"].append(ts)
                cols["url"].append(meta["url"])
                cols["filename"].append(meta["filename"])
                cols["offset"].append(meta["offset"])
                cols["length"].append(meta["length"])
                cols["digest"].append(meta["digest"])
                # pre-revisit archives carry no rtype field
                cols["rtype"].append(meta.get("rtype", "response"))
        return pa.table({
            "urlkey": pa.array(cols["urlkey"], pa.string()),
            "ts14": pa.array(cols["ts14"], pa.string()),
            "url": pa.array(cols["url"], pa.string()),
            "filename": pa.array(cols["filename"], pa.string()),
            "offset": pa.array(cols["offset"], pa.int64()),
            "length": pa.array(cols["length"], pa.int64()),
            "digest": pa.array(cols["digest"], pa.string()),
            "rtype": pa.array(cols["rtype"], pa.string()),
        })

    return files.map_batches(parse, batch_format="pyarrow",
                             batch_size=None, runtime_env=runtime_env())


def fetch_records(archive_dir: str, urls):
    """Point lookups into a WARC archive: resolve ``urls`` through the
    CDX index and read ONLY their byte ranges — never a shard scan.
    This is how a 100-TB archive serves a recrawl diff / contamination
    probe / spot audit: index filter (broadcast sorted urlkeys — the
    requested set is small by definition), then per-task
    ``seek(offset); read(length)`` and a single-member gzip decompress
    per record.  Returns the same schema as :func:`read_warc`."""
    import ray

    from . import runtime_env
    from .broadcast import cached_get

    base = Path(archive_dir)
    keys_ref = ray.put(np.sort(np.asarray(
        [surt(u) for u in urls], dtype=object)))

    def pick(batch: pa.Table) -> pa.Table:
        wanted = cached_get(keys_ref)
        ks = np.asarray(batch.column("urlkey").to_pylist(), dtype=object)
        if not len(wanted) or not len(ks):
            return batch.slice(0, 0)
        pos = np.searchsorted(wanted, ks)
        pos[pos >= len(wanted)] = 0
        return batch.filter(pa.array(wanted[pos] == ks))

    hits = read_cdx(str(base)).map_batches(
        pick, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env())

    def fetch(batch: pa.Table) -> pa.Table:
        rows = []
        fnames = batch.column("filename").to_pylist()
        offs = batch.column("offset").to_pylist()
        lens = batch.column("length").to_pylist()
        # group by file so each shard opens once per batch (point-lookup
        # batches are small by definition — a Python sort is fine here)
        order = sorted(range(batch.num_rows),
                       key=lambda i: (fnames[i], offs[i]))
        fh, open_name = None, None
        for i in order:
            if fnames[i] != open_name:
                if fh:
                    fh.close()
                open_name = fnames[i]
                fh = open(base / open_name, "rb")
            fh.seek(offs[i])
            raw = fh.read(lens[i])
            if raw[:2] == b"\x1f\x8b":
                raw = gzip.decompress(raw)
            rows.extend(_parse_records(raw))
        if fh:
            fh.close()
        if not rows:
            return _EMPTY
        cols = list(zip(*rows))
        return pa.table({
            "url": pa.array(cols[0], pa.string()),
            "warc_ts": pa.array(
                np.asarray(cols[1], np.int64)).cast(pa.timestamp("us")),
            "record_type": pa.array(cols[2], pa.string()),
            "http_status": pa.array(cols[3], pa.int64()),
            "html": pa.array(cols[4], pa.binary()),
            "text": pa.array(cols[5], pa.string()),
        })

    return hits.map_batches(fetch, batch_format="pyarrow",
                            batch_size=None, runtime_env=runtime_env())
