"""Sitemap source + sink (sitemaps.org protocol 0.9 — the standard seed
and recrawl feed).

Sitemaps are how real crawls bootstrap and stay fresh without
re-discovering every URL by link traversal: ``<urlset>`` files list one
``<url>`` entry per page with optional ``lastmod`` / ``changefreq`` /
``priority`` hints, and a ``<sitemapindex>`` fans out to child sitemap
files (the spec caps each file at 50,000 URLs / 50 MB, so any real site
is an index + shards).  Discovery is the ``Sitemap:`` directive in
robots.txt — a GLOBAL directive per the protocol, valid outside any
user-agent group, which is why it is parsed here and not in the
per-agent rule parser (:mod:`..state.robots`).

Reader output is crawl-ready: ``url`` rows flow straight into the seed
validity filter / frontier (urlops), ``lastmod_us`` feeds recrawl
scheduling, and ``priority_ppm`` is an exact integer (Decimal-parsed —
float ``0.1*1e6`` would be 100000.00000000001 on one engine and not the
other).  One read task per sitemap file, pure per-file XML parse, no
shuffle; ``.xml.gz`` handled (the protocol explicitly allows gzip).

The writer is the publishing side (a crawler republishing its URL set
for OTHER crawlers is the protocol's own use case) with the engine's
deterministic-layout discipline: multiply-shift url-hash shard
membership, sorted ``<loc>`` entries, a ``sitemapindex`` root, the
50,000-URL spec cap ASSERTED per shard, sha256 manifest.
"""
from __future__ import annotations

import gzip
import hashlib
import json
import logging
import re
from datetime import datetime, timezone
from decimal import Decimal
from pathlib import Path
from xml.etree import ElementTree

import numpy as np
import pyarrow as pa

logger = logging.getLogger(__name__)

_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"
SPEC_MAX_URLS = 50_000  # per-file cap, sitemaps.org protocol


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_w3c_datetime(s: str) -> int:
    """W3C datetime (the lastmod format) → epoch microseconds.
    Accepts date-only (midnight UTC) and full datetimes with ``Z`` or
    ``±hh:mm`` offsets.  Exact integer epoch math (no float round-trip).
    Returns -1 on an unparseable value (lenient, like real crawlers)."""
    import calendar

    s = (s or "").strip()
    if not s:
        return -1
    try:
        dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
    except ValueError:
        return -1
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    utc = dt.astimezone(timezone.utc)
    return (calendar.timegm(utc.timetuple()) * 1_000_000
            + utc.microsecond)


def parse_sitemap_xml(blob: bytes):
    """One sitemap document → ``(kind, entries)``.

    ``kind`` is ``"urlset"`` (entries =
    ``[(url, lastmod_us, changefreq, priority_ppm), …]``) or
    ``"sitemapindex"`` (entries = ``[(child_loc, lastmod_us), …]``).
    Namespace-agnostic tag matching — real sitemaps appear with and
    without the 0.9 namespace, with prefixes, or with none at all."""
    if blob[:2] == b"\x1f\x8b":
        blob = gzip.decompress(blob)
    root = ElementTree.fromstring(blob)
    kind = _strip_ns(root.tag)
    entries = []
    if kind == "urlset":
        for el in root:
            if _strip_ns(el.tag) != "url":
                continue
            loc, lastmod, freq, prio = "", -1, "", -1
            for ch in el:
                t = _strip_ns(ch.tag)
                v = (ch.text or "").strip()
                if t == "loc":
                    loc = v
                elif t == "lastmod":
                    lastmod = parse_w3c_datetime(v)
                elif t == "changefreq":
                    freq = v.lower()
                elif t == "priority":
                    try:
                        prio = int(Decimal(v) * 1_000_000)
                    except ArithmeticError:
                        prio = -1
            if loc:
                entries.append((loc, lastmod, freq, prio))
    elif kind == "sitemapindex":
        for el in root:
            if _strip_ns(el.tag) != "sitemap":
                continue
            loc, lastmod = "", -1
            for ch in el:
                t = _strip_ns(ch.tag)
                v = (ch.text or "").strip()
                if t == "loc":
                    loc = v
                elif t == "lastmod":
                    lastmod = parse_w3c_datetime(v)
            if loc:
                entries.append((loc, lastmod))
    else:
        raise ValueError(f"not a sitemap document: root <{kind}>")
    return kind, entries


def sitemap_urls_from_robots(text: str) -> list:
    """``Sitemap:`` directives of a robots.txt body, in file order.
    Global per the protocol — valid anywhere in the file, NOT scoped to
    a user-agent group (which is why the per-agent rule parser doesn't
    return them)."""
    out = []
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        m = re.match(r"(?i)sitemap\s*:\s*(\S+)", line)
        if m:
            out.append(m.group(1))
    return out


_EMPTY = pa.table({
    "url": pa.array([], pa.string()),
    "lastmod_us": pa.array([], pa.int64()),
    "changefreq": pa.array([], pa.string()),
    "priority_ppm": pa.array([], pa.int64()),
    "sitemap": pa.array([], pa.string()),
})


def read_sitemaps(path: str, follow_index: bool = True):
    """Every sitemap under ``path`` (a directory of ``*.xml`` /
    ``*.xml.gz``, or one file) as a Dataset of
    ``(url, lastmod_us, changefreq, priority_ppm, sitemap)`` rows —
    ``sitemap`` names the source file, absent hints are -1 / "".

    ``sitemapindex`` files are expanded DRIVER-SIDE first (an index is
    one row per child FILE — thousands of entries, never page-scale —
    so expansion is metadata work; child locs resolve to local files by
    basename, the offline mirror convention).  The page-scale work — the
    urlset parses — runs one task per file, no shuffle.  Feed the
    result straight into the seed validity filter / frontier."""
    import ray

    from . import runtime_env

    p = Path(path)
    if p.is_dir():
        paths = sorted(str(f) for pat in ("*.xml", "*.xml.gz")
                       for f in p.glob(pat))
    else:
        paths = [str(p)]

    # driver-side index expansion: indexes are tiny by construction
    files, seen = [], set()
    queue = list(paths)
    while queue:
        f = queue.pop(0)
        if f in seen:
            continue
        seen.add(f)
        blob = Path(f).read_bytes()
        if blob[:2] == b"\x1f\x8b":
            blob = gzip.decompress(blob)
        # cheap root sniff — full parse only for indexes
        head = blob[:256].lstrip()
        if b"<sitemapindex" in head:
            if not follow_index:
                continue
            _, children = parse_sitemap_xml(blob)
            base_dir = Path(f).parent
            for loc, _lm in children:
                child = base_dir / loc.rsplit("/", 1)[-1]
                if child.exists():
                    queue.append(str(child))
                else:
                    logger.warning("sitemap index child not found: %s", loc)
        else:
            files.append(f)

    if not files:
        return ray.data.from_arrow(_EMPTY)
    ds = ray.data.read_binary_files(files, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        urls, lastmods, freqs, prios, srcs = [], [], [], [], []
        for path_, blob in zip(batch.column("path").to_pylist(),
                               batch.column("bytes").to_pylist()):
            kind, entries = parse_sitemap_xml(blob)
            if kind != "urlset":  # an index that slipped past the sniff
                continue
            name = Path(path_).name
            for loc, lm, fr, pr in entries:
                urls.append(loc)
                lastmods.append(lm)
                freqs.append(fr)
                prios.append(pr)
                srcs.append(name)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "lastmod_us": pa.array(lastmods, pa.int64()),
            "changefreq": pa.array(freqs, pa.string()),
            "priority_ppm": pa.array(prios, pa.int64()),
            "sitemap": pa.array(srcs, pa.string()),
        })

    return ds.map_batches(parse, batch_format="pyarrow",
                          batch_size=None, runtime_env=runtime_env())


def write_sitemaps(ds, out_dir: str, base_url: str = "",
                   n_shards: int = 4, gzip_files: bool = False) -> dict:
    """Publish a Dataset with ``url`` (and optional ``lastmod_us`` /
    ``changefreq`` / ``priority_ppm`` columns) as ``n_shards`` urlset
    files plus a ``sitemap_index.xml`` root.  Deterministic bytes
    (hash-shard membership, sorted locs, canonical formatting); the
    spec's 50,000-URL per-file cap is ASSERTED — size ``n_shards`` for
    your URL count.  Returns {written, n_shards, n_urls}."""
    import pyarrow.compute as pc

    from . import runtime_env
    from .sinks import _shard_of
    from .urlops import url_hash64

    base = Path(out_dir)
    base.mkdir(parents=True, exist_ok=True)
    suffix = ".xml.gz" if gzip_files else ".xml"
    for pat in ("sitemap-*.xml*", "sitemap_index.xml"):
        for stale in base.glob(pat):
            stale.unlink()
    have = set(ds.schema().names)

    def tag(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        hv = np.asarray(
            [url_hash64(u) for u in batch.column("url").to_pylist()],
            np.uint64).astype(np.int64)
        cols = {"url": batch.column("url"),
                "_shard": pa.array(_shard_of(hv, n_shards), pa.int64())}
        cols["lastmod_us"] = (batch.column("lastmod_us")
                              if "lastmod_us" in have else
                              pa.array(np.full(n, -1, np.int64)))
        cols["changefreq"] = (batch.column("changefreq")
                              if "changefreq" in have else
                              pa.array([""] * n, pa.string()))
        cols["priority_ppm"] = (batch.column("priority_ppm")
                                if "priority_ppm" in have else
                                pa.array(np.full(n, -1, np.int64)))
        return pa.table(cols)

    def write_shard(group: pa.Table) -> pa.Table:
        sh = int(group.column("_shard")[0].as_py())
        assert group.num_rows <= SPEC_MAX_URLS, (
            f"shard {sh} has {group.num_rows} urls > spec cap "
            f"{SPEC_MAX_URLS}; raise n_shards")
        group = group.take(
            pc.sort_indices(group, sort_keys=[("url", "ascending")]))
        parts = [f'<?xml version="1.0" encoding="UTF-8"?>\n'
                 f'<urlset xmlns="{_NS}">']
        for url, lm, fr, pr in zip(
                group.column("url").to_pylist(),
                group.column("lastmod_us").to_pylist(),
                group.column("changefreq").to_pylist(),
                group.column("priority_ppm").to_pylist()):
            e = ["<url><loc>"
                 + url.replace("&", "&amp;").replace("<", "&lt;")
                 + "</loc>"]
            if lm is not None and lm >= 0:
                dt = datetime.fromtimestamp(lm / 1_000_000,
                                            tz=timezone.utc)
                e.append("<lastmod>"
                         + dt.strftime("%Y-%m-%dT%H:%M:%S+00:00")
                         + "</lastmod>")
            if fr:
                e.append(f"<changefreq>{fr}</changefreq>")
            if pr is not None and pr >= 0:
                e.append(f"<priority>{Decimal(pr) / 1_000_000}</priority>")
            e.append("</url>")
            parts.append("".join(e))
        parts.append("</urlset>\n")
        raw = "\n".join(parts).encode("utf-8")
        if gzip_files:
            raw = gzip.compress(raw, mtime=0)
        fname = f"sitemap-{sh:05d}{suffix}"
        tmp = base / (fname + ".tmp")
        tmp.write_bytes(raw)
        tmp.rename(base / fname)
        return pa.table({
            "shard": pa.array([sh], pa.int64()),
            "file": pa.array([fname], pa.string()),
            "n_urls": pa.array([group.num_rows], pa.int64()),
            "sha256": pa.array([hashlib.sha256(raw).hexdigest()],
                               pa.string()),
        })

    rows = (ds.map_batches(tag, batch_format="pyarrow", batch_size=None,
                           runtime_env=runtime_env())
            .groupby("_shard")
            .map_groups(write_shard, batch_format="pyarrow")
            .take_all())  # ≤ n_shards summary rows
    rows.sort(key=lambda r: int(r["shard"]))
    idx = [f'<?xml version="1.0" encoding="UTF-8"?>\n'
           f'<sitemapindex xmlns="{_NS}">']
    for r in rows:
        idx.append(f"<sitemap><loc>{base_url}{r['file']}</loc></sitemap>")
    idx.append("</sitemapindex>\n")
    (base / "sitemap_index.xml").write_text("\n".join(idx))
    (base / "manifest.json").write_text(json.dumps(
        {str(r["shard"]): {"file": r["file"], "n_urls": int(r["n_urls"]),
                           "sha256": r["sha256"]} for r in rows},
        sort_keys=True, indent=1))
    return {"written": [int(r["shard"]) for r in rows],
            "n_shards": n_shards,
            "n_urls": sum(int(r["n_urls"]) for r in rows)}
