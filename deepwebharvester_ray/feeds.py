"""RSS / Atom feed source + publisher — the FRESHNESS discovery feed
(sitemaps enumerate a site's whole URL space; feeds announce what just
changed — a news/blog crawl polls feeds between sitemap passes).

Two public formats, both parsed namespace-agnostically with stdlib
``xml.etree``:

* **RSS 2.0** — ``<rss><channel><item>`` with ``link`` / ``title`` /
  ``pubDate`` in RFC 822 date form (``Wed, 21 Oct 2015 07:28:00 GMT``),
  parsed exactly via ``email.utils.parsedate_to_datetime`` + integer
  epoch math;
* **Atom** — ``<feed><entry>`` where the link is an ``href`` ATTRIBUTE
  (rel="alternate" or unstated per the spec; other rels skipped — the
  classic mistake is taking rel="self", the feed's own URL) and
  ``updated`` is ISO 8601.

Reader output is crawl-ready ``(url, title, published_us, feed_kind,
feed)`` rows; one task per feed file, pure per-file parse, no shuffle.
The publisher writes both formats deterministically (sorted entries,
canonical date rendering) for round-trip testing and for the real
publishing use (a crawler exposing its fresh finds to downstream
consumers).
"""
from __future__ import annotations

import calendar
import logging
from datetime import datetime, timezone
from pathlib import Path
from xml.etree import ElementTree

import pyarrow as pa

logger = logging.getLogger(__name__)

_ATOM_NS = "http://www.w3.org/2005/Atom"


def _strip_ns(tag) -> str:
    return tag.rsplit("}", 1)[-1] if isinstance(tag, str) else ""


def _rfc822_us(s: str) -> int:
    """RFC 822 date (the RSS pubDate form) → epoch µs; -1 if bad."""
    from email.utils import parsedate_to_datetime

    try:
        dt = parsedate_to_datetime((s or "").strip())
    except (TypeError, ValueError):
        return -1
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    utc = dt.astimezone(timezone.utc)
    return calendar.timegm(utc.timetuple()) * 1_000_000 + utc.microsecond


def _iso_us(s: str) -> int:
    """ISO 8601 (the Atom updated form) → epoch µs; -1 if bad."""
    try:
        dt = datetime.fromisoformat((s or "").strip().replace("Z", "+00:00"))
    except ValueError:
        return -1
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    utc = dt.astimezone(timezone.utc)
    return calendar.timegm(utc.timetuple()) * 1_000_000 + utc.microsecond


def parse_feed(blob: bytes):
    """One feed document → ``(kind, [(url, title, published_us), …])``
    with ``kind`` ∈ {"rss", "atom"}.  Raises ``ValueError`` on
    non-feed XML."""
    root = ElementTree.fromstring(blob)
    kind = _strip_ns(root.tag)
    out = []
    if kind == "rss":
        for ch in root:
            if _strip_ns(ch.tag) != "channel":
                continue
            for item in ch:
                if _strip_ns(item.tag) != "item":
                    continue
                url = title = ""
                ts = -1
                for el in item:
                    t = _strip_ns(el.tag)
                    v = (el.text or "").strip()
                    if t == "link":
                        url = v
                    elif t == "title":
                        title = v
                    elif t == "pubdate" or t == "pubDate":
                        ts = _rfc822_us(v)
                if url:
                    out.append((url, title, ts))
        return "rss", out
    if kind == "feed":
        for entry in root:
            if _strip_ns(entry.tag) != "entry":
                continue
            url = title = ""
            ts = -1
            for el in entry:
                t = _strip_ns(el.tag)
                if t == "link":
                    rel = el.get("rel") or "alternate"
                    if rel == "alternate" and not url:
                        url = (el.get("href") or "").strip()
                elif t == "title":
                    title = (el.text or "").strip()
                elif t == "updated":
                    ts = _iso_us(el.text or "")
            if url:
                out.append((url, title, ts))
        return "atom", out
    raise ValueError(f"not a feed document: root <{kind}>")


_EMPTY = pa.table({
    "url": pa.array([], pa.string()),
    "title": pa.array([], pa.string()),
    "published_us": pa.array([], pa.int64()),
    "feed_kind": pa.array([], pa.string()),
    "feed": pa.array([], pa.string()),
})


def read_feeds(path: str):
    """Every ``*.rss`` / ``*.atom`` / ``*.xml`` feed under ``path`` as
    a Dataset of ``(url, title, published_us, feed_kind, feed)`` rows.
    One task per feed file, pure per-file parse, no shuffle; feeds
    whose root is neither rss nor atom are skipped with a warning
    (discovery sources are best-effort by nature)."""
    import ray

    from . import runtime_env

    p = Path(path)
    if p.is_dir():
        paths = sorted(str(f) for pat in ("*.rss", "*.atom", "*.xml")
                       for f in p.glob(pat))
    else:
        paths = [str(p)]
    if not paths:
        return ray.data.from_arrow(_EMPTY)
    files = ray.data.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        cols = {k: [] for k in _EMPTY.column_names}
        for path_, blob in zip(batch.column("path").to_pylist(),
                               batch.column("bytes").to_pylist()):
            try:
                kind, entries = parse_feed(blob)
            except (ValueError, ElementTree.ParseError):
                logger.warning("skipping non-feed file: %s", path_)
                continue
            name = Path(path_).name
            for url, title, ts in entries:
                cols["url"].append(url)
                cols["title"].append(title)
                cols["published_us"].append(ts)
                cols["feed_kind"].append(kind)
                cols["feed"].append(name)
        return pa.table({
            "url": pa.array(cols["url"], pa.string()),
            "title": pa.array(cols["title"], pa.string()),
            "published_us": pa.array(cols["published_us"], pa.int64()),
            "feed_kind": pa.array(cols["feed_kind"], pa.string()),
            "feed": pa.array(cols["feed"], pa.string()),
        })

    return files.map_batches(parse, batch_format="pyarrow",
                             batch_size=None, runtime_env=runtime_env())


def _esc(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def write_feed(rows, out_path: str, kind: str = "rss",
               feed_title: str = "export") -> int:
    """Publish ``rows`` (an iterable of ``(url, title, published_us)``)
    as ONE deterministic feed file (sorted by url, canonical date
    rendering).  Driver-side by design — a feed is a bounded freshness
    window (the newest N items), never a corpus dump; corpus-scale
    publication is the sitemap sink's job.  Returns the entry count."""
    from email.utils import format_datetime

    rows = sorted(rows)
    parts = ['<?xml version="1.0" encoding="UTF-8"?>']
    if kind == "rss":
        parts.append("<rss version=\"2.0\"><channel>"
                     f"<title>{_esc(feed_title)}</title>")
        for url, title, ts in rows:
            dt = datetime.fromtimestamp(ts / 1_000_000, tz=timezone.utc)
            parts.append(
                "<item>"
                f"<title>{_esc(title)}</title>"
                f"<link>{_esc(url)}</link>"
                f"<pubDate>{format_datetime(dt)}</pubDate>"
                "</item>")
        parts.append("</channel></rss>")
    elif kind == "atom":
        parts.append(f'<feed xmlns="{_ATOM_NS}">'
                     f"<title>{_esc(feed_title)}</title>")
        for url, title, ts in rows:
            dt = datetime.fromtimestamp(ts / 1_000_000, tz=timezone.utc)
            iso = dt.strftime("%Y-%m-%dT%H:%M:%SZ")
            parts.append(
                "<entry>"
                f"<title>{_esc(title)}</title>"
                f'<link rel="self" href="http://feed.example/self"/>'
                f'<link href="{_esc(url)}"/>'
                f"<updated>{iso}</updated>"
                "</entry>")
        parts.append("</feed>")
    else:
        raise ValueError(f"unsupported feed kind {kind!r}")
    Path(out_path).write_text("\n".join(parts))
    return len(rows)
