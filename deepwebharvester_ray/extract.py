"""HTML content extraction: title, visible text, content hash, links.

Re-implements the reference extraction semantics
(/root/reference/deepwebharvester/extractor.py:95-133) on the standard
library ``html.parser`` (bs4/lxml are not available in this environment):

* title = first ``<title>`` text, stripped, else ``"No Title"``
  (extractor.py:116-118)
* visible text = document-order text nodes OUTSIDE the noise tags
  ``script, style, noscript, head, meta, link`` (extractor.py:20,121-122),
  each node ``strip()``-ed, empties dropped, joined with ``"\\n"``
  (bs4 ``get_text(separator="\\n", strip=True)`` semantics,
  extractor.py:123), then runs of 3+ newlines collapsed to a blank line
  (extractor.py:125)
* content_hash = sha256 of the utf-8 (errors=replace) encoded text
  (extractor.py:128)
* links = ``<a href>`` outside noise tags; drop ``#``/``javascript:``/
  ``mailto:`` prefixes; urljoin against the page URL; strip fragment; keep
  valid .onion; canonicalize; dedupe (extractor.py:74-93).  The reference
  returns a Python ``set`` (iteration order depends on PYTHONHASHSEED —
  SURVEY §2.9); this engine defines the canonical order as **sorted**, a
  documented deterministic deviation.

The batch entry point :func:`extract_batch` is the hot stage of the crawl
pipeline: one call per Arrow batch inside ``map_batches``.  HTML parsing is
inherently per-document (same as the reference's bs4+lxml per-page parse);
throughput comes from Ray fanning batches across cores.
"""
from __future__ import annotations

import re
import time
from html.parser import HTMLParser
from typing import Dict, List, Tuple
from urllib.parse import urljoin

import pyarrow as pa

from .urlops import (
    canonicalize_url,
    content_hash_hex,
    get_base_domain,
    is_valid_onion_url,
)

# Tags whose content is discarded entirely (reference extractor.py:20).
# meta/link are void elements — handled as attribute-only tags below.
_NOISE_CONTAINERS = frozenset({"script", "style", "noscript", "head"})

# HTML void elements: never pushed on the open-tag stack.
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

_BLANKS_RE = re.compile(r"\n{3,}")


class _PageParser(HTMLParser):
    """Single-pass HTML parser collecting title, text segments and hrefs.

    Text segments break at every tag boundary (matching bs4's per-NavigableString
    stripping in ``get_text``); consecutive character data (including entity
    refs) coalesces into one segment.
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.segments: List[str] = []
        self.hrefs: List[str] = []
        self.title: str | None = None
        self._noise = 0          # depth inside noise containers
        self._in_title = False
        self._title_buf: List[str] = []
        self._buf: List[str] = []

    # -- helpers ------------------------------------------------------------
    def _flush(self) -> None:
        if self._buf:
            seg = "".join(self._buf).strip()
            self._buf.clear()
            if seg:
                self.segments.append(seg)

    # -- parser callbacks ---------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        self._flush()
        if tag == "body":
            # Browsers (and lxml) implicitly close <head> at <body>; guards
            # against a missing </head> leaking head content into the body.
            self._noise = 0
        if tag in _NOISE_CONTAINERS:
            self._noise += 1
        if tag == "title" and self.title is None:
            self._in_title = True
            self._title_buf = []
        if tag == "a" and self._noise == 0:
            for name, value in attrs:
                if name == "href" and value is not None:
                    self.hrefs.append(value)
                    break

    def handle_startendtag(self, tag: str, attrs) -> None:
        # a self-closing tag opens AND closes: undo any state the start
        # handler toggled (noise depth, title capture) or the rest of the
        # page would be swallowed into the wrong buffer
        self.handle_starttag(tag, attrs)
        if tag not in _VOID and tag in _NOISE_CONTAINERS:
            self._noise -= 1
        if tag == "title" and self._in_title:
            self._in_title = False
            if self.title is None:
                self.title = "".join(self._title_buf)

    def handle_endtag(self, tag: str) -> None:
        self._flush()
        if tag in _NOISE_CONTAINERS and self._noise > 0:
            self._noise -= 1
        if tag == "title" and self._in_title:
            self._in_title = False
            if self.title is None:
                self.title = "".join(self._title_buf)

    def handle_data(self, data: str) -> None:
        if self._in_title:
            self._title_buf.append(data)
        elif self._noise == 0:
            self._buf.append(data)

    def close(self) -> None:
        super().close()
        self._flush()


def extract_links(base_url: str, hrefs: List[str]) -> List[str]:
    """Resolve + filter + canonicalize harvested hrefs (extractor.py:74-93).

    Returns canonically **sorted** unique links (deterministic deviation from
    the reference's set order).
    """
    links = set()
    for href in hrefs:
        href = href.strip()
        if not href or href.startswith(("#", "javascript:", "mailto:")):
            continue
        full_url = urljoin(base_url, href).split("#")[0]
        if is_valid_onion_url(full_url):
            links.add(canonicalize_url(full_url))
    return sorted(links)


def extract_content(html: str, url: str) -> Tuple[str, str, str, List[str]]:
    """Parse *html* → ``(title, text, content_hash, links)``.

    Mirrors reference ``PageExtractor.extract_content`` (extractor.py:95-133)
    with sorted canonical link order.
    """
    parser = _PageParser()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        # Malformed beyond recovery: keep whatever was collected (lxml is
        # similarly lenient; it never raises on bad HTML).
        pass

    title = "No Title"
    if parser.title is not None:
        stripped = parser.title.strip()
        if stripped:
            title = stripped

    raw_text = "\n".join(parser.segments)
    text = _BLANKS_RE.sub("\n\n", raw_text)
    chash = content_hash_hex(text)
    links = extract_links(url, parser.hrefs)
    return title, text, chash, links


# ── Ray Data batch stage ─────────────────────────────────────────────────────

def extract_batch(batch: pa.Table) -> pa.Table:
    """map_batches fn: ``(url, html[, …])`` → extracted page columns.

    ``html`` may be binary (decoded utf-8, errors=replace — matching the
    reference's ``resp.text`` lenient decode) or string.  Extra input columns
    are passed through (e.g. ``depth`` from the frontier).
    """
    urls = batch.column("url").to_pylist()
    html_col = batch.column("html")
    if pa.types.is_binary(html_col.type) or pa.types.is_large_binary(html_col.type):
        htmls = [
            (b.decode("utf-8", errors="replace") if b is not None else "")
            for b in html_col.to_pylist()
        ]
    else:
        htmls = [(h if h is not None else "") for h in html_col.to_pylist()]

    titles: List[str] = []
    texts: List[str] = []
    hashes: List[str] = []
    links_col: List[List[str]] = []
    sites: List[str] = []
    crawl_times: List[float] = []
    clock = time.monotonic
    for url, html in zip(urls, htmls):
        t0 = clock()
        title, text, chash, links = extract_content(html, url)
        crawl_times.append(clock() - t0)
        titles.append(title)
        texts.append(text)
        hashes.append(chash)
        links_col.append(links)
        sites.append(get_base_domain(url))

    out: Dict[str, pa.Array] = {
        "url": pa.array(urls, pa.string()),
        "site": pa.array(sites, pa.string()),
        "title": pa.array(titles, pa.string()),
        "text": pa.array(texts, pa.large_string()),
        "content_hash": pa.array(hashes, pa.string()),
        "links": pa.array(links_col, pa.large_list(pa.string())),
        "links_found": pa.array([len(l) for l in links_col], pa.int32()),
        "crawl_time": pa.array(crawl_times, pa.float64()),
    }
    # Pass through any extra frontier columns (depth, seed_id, …).
    for name in batch.column_names:
        if name not in out and name != "html":
            out[name] = batch.column(name)
    return pa.table(out)
