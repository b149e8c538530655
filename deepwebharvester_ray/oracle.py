"""Single-process reference-semantics crawl oracle.

A direct, row-at-a-time transcription of the reference BFS loop
(crawler.py:214-273, _crawl_page crawler.py:155-203, crawl_all
crawler.py:275-321) over an in-memory page corpus, used by the test suite
as the conformance ground truth for the distributed pipeline
(FIXTURES.md §5 "crawl trace").  It shares only the leaf extraction
function with the engine (extraction itself is verified independently
against generator-constructed expectations in test_extract.py); all BFS /
dedup / budget / politeness control flow here is written directly from the
reference, deliberately NOT via the engine's scheduler/replay.

Canonicalization of nondeterminism: the reference's within-page link order
comes from a Python set (extractor.py:85, PYTHONHASHSEED-dependent —
SURVEY §2.9).  The oracle enqueues links in sorted order, and seeds are
"crawled" in canonical global interleaving: at each step the next URL
processed is the queue-front with the smallest (seed_id, url) among seeds
whose virtual clocks tie — implemented as sorted processing per BFS depth,
matching the engine's canonical order.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set, Tuple

import pyarrow.parquet as pq

from .config import CrawlSettings
from .extract import extract_content
from .urlops import get_base_domain, is_blacklisted, is_valid_onion_url, normalize_blacklist


@dataclass
class OracleResult:
    url: str
    seed_id: int
    title: str
    text: str
    content_hash: str
    depth: int
    links_found: int
    site: str


@dataclass
class OracleTrace:
    results: List[OracleResult] = field(default_factory=list)
    # status → {(seed_id, url)} across the whole crawl (not per-depth)
    by_status: Dict[str, Set[Tuple[int, str]]] = field(default_factory=dict)
    marks: Set[Tuple[int, str]] = field(default_factory=set)
    stats: Dict[str, int] = field(default_factory=dict)
    vclock: Dict[int, float] = field(default_factory=dict)
    epochs: Dict[int, int] = field(default_factory=dict)

    def add_status(self, status: str, seed_id: int, url: str) -> None:
        self.by_status.setdefault(status, set()).add((seed_id, url))


def load_corpus_map(corpus_dir: str) -> Dict[str, bytes]:
    """url → html for the whole corpus (oracle is small-scale only)."""
    from pathlib import Path

    import pyarrow as pa

    files = sorted(str(p) for p in Path(corpus_dir).rglob("*.parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet files under corpus dir: {corpus_dir}")
    t = pa.concat_tables(pq.read_table(f, columns=["url", "html"]) for f in files)
    return dict(zip(t.column("url").to_pylist(), t.column("html").to_pylist()))


def crawl_oracle(
    corpus: Dict[str, bytes],
    seed_urls: List[str],
    cfg: Optional[CrawlSettings] = None,
) -> OracleTrace:
    """Replay the reference crawl over *corpus* in canonical order."""
    cfg = cfg or CrawlSettings()
    blacklist = normalize_blacklist(cfg.blacklist_paths)
    from .state.robots import RobotsTable

    robots = (
        RobotsTable.from_texts(cfg.robots_rules)
        if cfg.robots_rules
        else RobotsTable()
    )
    trace = OracleTrace()
    stats = {"crawled": 0, "failed": 0, "skipped": 0, "deduplicated": 0, "sites": 0}
    global_hashes: Set[str] = set()
    retry_cost = cfg.backoff_factor * ((1 << cfg.retry_count) - 1)

    valid_seeds = [u for u in seed_urls if is_valid_onion_url(u)]  # crawler.py:293

    # Per-seed BFS state; processed depth-synchronously in canonical order.
    from .urlops import get_host as _gh

    seeds = []
    for sid, seed in enumerate(valid_seeds):
        seeds.append(
            {
                "sid": sid,
                "delay": robots.crawl_delay_for(_gh(seed), cfg.crawl_delay),
                "crawled": set(),        # per-seed marks (crawler.py:230)
                "queue": [(seed, 0)],    # FIFO (deque) — kept as list
                "pages": 0,
                "done": False,
                "vclock": 0.0,
                "epochs": 0,
            }
        )

    depth = 0
    while True:
        # candidates of this BFS generation across all seeds, canonical order
        gen: List[Tuple[int, str]] = []
        for s in seeds:
            if s["done"]:
                continue
            for url, d in s["queue"]:
                if d == depth:
                    gen.append((s["sid"], url))
        if not gen:
            break
        gen.sort()

        for sid, url in gen:
            s = seeds[sid]
            if s["done"]:
                continue
            # loop-top budget check (crawler.py:237)
            if s["pages"] >= cfg.max_pages:
                s["done"] = True
                trace.add_status("abandoned", sid, url)
                continue
            # pop-checks (crawler.py:240)
            if url in s["crawled"] or depth > cfg.max_depth:
                trace.add_status("already", sid, url)
                continue
            s["crawled"].add(url)
            trace.marks.add((sid, url))

            links: List[str] = []
            if is_blacklisted(url, blacklist) or not robots.is_allowed(url):
                # blacklist: crawler.py:167-171; robots: engine extension
                stats["skipped"] += 1
                trace.add_status("blacklisted", sid, url)
            elif url not in corpus:                     # fetch failure
                stats["failed"] += 1
                s["vclock"] += retry_cost
                trace.add_status("failed", sid, url)
            else:
                html = corpus[url].decode("utf-8", errors="replace")
                title, text, chash, links = extract_content(html, url)
                if chash in global_hashes:              # crawler.py:184-191
                    stats["deduplicated"] += 1
                    trace.add_status("dup", sid, url)
                else:
                    global_hashes.add(chash)
                    s["pages"] += 1
                    stats["crawled"] += 1
                    trace.add_status("success", sid, url)
                    trace.results.append(
                        OracleResult(
                            url=url,
                            seed_id=sid,
                            title=title,
                            text=text,
                            content_hash=chash,
                            depth=depth,
                            links_found=len(links),
                            site=get_base_domain(url),
                        )
                    )

            # enqueue links (success or dup propagate; crawler.py:258-262)
            if depth < cfg.max_depth:
                for link in links:                      # canonical sorted order
                    if link not in s["crawled"]:
                        s["queue"].append((link, depth + 1))

            # crawler.py:264; robots Crawl-delay overrides per SEED host
            # (the reference's delay is per site thread, crawler.py:229-264)
            s["vclock"] += s["delay"]
            if s["pages"] > 0 and s["pages"] % cfg.renew_circuit_every == 0:
                s["epochs"] += 1                        # crawler.py:205-210 quirk
                s["vclock"] += cfg.renew_pause

        # drop this depth's entries from queues
        for s in seeds:
            s["queue"] = [(u, d) for (u, d) in s["queue"] if d > depth]
        depth += 1
        if depth > cfg.max_depth:
            break

    for s in seeds:
        stats["sites"] += 1
        trace.vclock[s["sid"]] = s["vclock"]
        trace.epochs[s["sid"]] = s["epochs"]
    trace.stats = stats
    return trace
