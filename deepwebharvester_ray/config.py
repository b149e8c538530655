"""Layered configuration: defaults → YAML → env → explicit overrides.

Mirrors the reference's AppConfig layering (config.py:83-123) minus the
live-Tor fields, plus engine-specific knobs (shard counts, batch sizes).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field, fields, replace
from pathlib import Path
from typing import Dict, List, Optional

try:
    import yaml
except ImportError:  # pragma: no cover
    yaml = None


@dataclass(frozen=True)
class CrawlSettings:
    """Crawl behavior settings (reference CrawlerConfig, config.py:34-50)."""

    max_depth: int = 2
    max_pages: int = 20
    crawl_delay: float = 7.0        # virtual seconds between fetches per seed
    request_timeout: int = 30
    retry_count: int = 3
    backoff_factor: float = 4.0     # sleep = backoff * 2^(attempt-1)
    renew_circuit_every: int = 10   # identity-epoch cadence (tor_manager.py:131-171)
    renew_pause: float = 5.0        # virtual pause per renewal (tor_manager.py:161)
    blacklist_paths: List[str] = field(
        default_factory=lambda: ["/register", "/login", "/signup", "/auth"]
    )
    # Per-host robots.txt bodies (host → robots.txt text).  Parsed into a
    # RobotsTable (state/robots.py): Allow/Disallow longest-match rules and
    # Crawl-delay politeness overrides.  None → no robots restrictions
    # (reference behavior; its only robots-like rule is blacklist_paths,
    # extractor.py:40-43).
    robots_rules: Optional[Dict[str, str]] = None

    # ── engine knobs (no reference equivalent — Ray-scale parameters) ──────
    seen_shards: int = 4            # seen-set actor shards; O(cores/4) on a cluster
    seen_mode: str = "exact"        # "exact" | "cuckoo" (10^10-scale path)
    seen_capacity: int = 1 << 20    # cuckoo filter capacity PER SHARD — size
                                    # to expected_keys/shards or the filter
                                    # saturates and spills to exact sets
    # Priority-queue frontier (state/pqueue.py).  max_fetch_per_gen caps how
    # many URLs each seed schedules per generation (politeness pacing);
    # overflow DEFERS to later generations instead of the reference's
    # abandon-at-budget.  None → schedule everything (reference semantics).
    max_fetch_per_gen: Optional[int] = None
    # Bounded per-seed frontier capacity; worst-first deterministic drops,
    # counted in queue.dropped.  None → unbounded (reference deque).
    frontier_max_per_seed: Optional[int] = None
    # Politeness-paced generations (SURVEY §4: "tokens = generation
    # wallclock / crawl_delay").  When set, each seed's per-generation
    # pop budget becomes max(1, floor(gen_wallclock_s / crawl_delay)) —
    # robots Crawl-delay overrides the default per host — enforced AT
    # POP TIME inside the frontier queue (per shard actor on the
    # sharded path, zero driver involvement), so a slow-delay host is
    # paced while fast hosts proceed.  min-combines with
    # max_fetch_per_gen.  None → uniform max_fetch_per_gen only.
    gen_wallclock_s: Optional[float] = None
    # Control-plane replay sharding: None → sequential driver replay;
    # N → seed-sharded Ray-actor claims chain (state/scheduler.py,
    # bit-identical output — the cluster path).
    replay_shards: Optional[int] = None
    # Frontier sharding: N → ShardedFrontierQueue actor pool AND
    # data-plane link expansion (links flow fetch-task → frontier shard
    # as batches; the driver pulls only (url, content_hash) metadata per
    # generation — the 10^10-frontier path, SURVEY §4); 0 → force the
    # driver-local priority queue; None (default) → AUTO, the size-gated
    # discipline used everywhere else in this repo: driver queue below
    # FRONTIER_AUTO_SEEDS seeds (actor round-trips cost more than they
    # save on a small run), sharded at or above it (the scale path must
    # be the default where scale begins, not an opt-in).  Results are
    # identical either way: staged pushes commit in canonical sorted
    # order (equivalence pinned by test_crawl).
    frontier_shards: Optional[int] = None
    extract_batch_size: int = 128   # pages per Arrow batch in the extract stage
    # Fetch-membership broadcast cutoff: a generation whose scheduled
    # fetch set exceeds this many URLs stops ray.put-ing ONE sorted
    # hash array (every worker would deserialize the whole set) and
    # instead co-partitions the hashes with the corpus's host_bucket
    # layout — each per-bucket read gets only ITS bucket's hash ref,
    # a partitioned semi-join on the partitioning key the corpus
    # already has (per-worker memory O(fetch/buckets)).  None →
    # pipelines.crawl.FETCH_BROADCAST_CUTOFF; 0 forces the bucketed
    # path (tests).
    fetch_broadcast_cutoff: Optional[int] = None
    extract_concurrency: Optional[int] = None  # None → Ray decides (task pool)
    # Fault injection (chaos tests only): path to a marker file.  The
    # FIRST sharded replay task to find it absent creates it atomically
    # and SIGKILLs its own worker process mid-generation — AFTER the
    # seen/hash pool inserts, BEFORE its checkpoint delta writes — the
    # nastiest window; Ray's task retry must heal the generation with
    # no re-fetches and an unchanged trace (pinned in test_crawl).
    # None (default) → no injection.
    chaos_kill_marker: Optional[str] = None


def load_settings(
    config_path: Optional[str] = None, **overrides
) -> CrawlSettings:
    """defaults → YAML ``crawler:`` section → env DWH_* → overrides."""
    cfg = CrawlSettings()
    valid = {f.name for f in fields(CrawlSettings)}

    if config_path:
        path = Path(config_path)
        if yaml is None:
            raise RuntimeError(
                f"config file given ({config_path}) but PyYAML is not installed"
            )
        if not path.exists():
            raise FileNotFoundError(f"config file not found: {config_path}")
        with open(path, encoding="utf-8") as fh:
            data = yaml.safe_load(fh) or {}
        if not isinstance(data, dict):
            raise ValueError(f"config file must be a YAML mapping: {config_path}")
        section = data.get("crawler", data) or {}
        if not isinstance(section, dict):
            raise ValueError(f"'crawler:' section must be a mapping: {config_path}")
        unknown = sorted(set(section) - valid)
        if unknown:
            # a misspelled setting must FAIL, not silently run with the
            # default (max_dept: 3 → a depth-2 crawl nobody asked for)
            raise ValueError(
                f"unknown crawler setting(s) in {config_path}: {unknown}")
        cfg = replace(cfg, **section)

    env_map = {
        "DWH_MAX_DEPTH": ("max_depth", int),
        "DWH_MAX_PAGES": ("max_pages", int),
        "DWH_CRAWL_DELAY": ("crawl_delay", float),
        "DWH_SEEN_SHARDS": ("seen_shards", int),
        "DWH_SEEN_MODE": ("seen_mode", str),
        "DWH_GEN_WALLCLOCK_S": ("gen_wallclock_s", float),
    }
    env_overrides = {}
    for env, (name, cast) in env_map.items():
        if os.getenv(env):
            env_overrides[name] = cast(os.environ[env])
    if env_overrides:
        cfg = replace(cfg, **env_overrides)

    if overrides:
        unknown = sorted(set(overrides) - valid)
        if unknown:
            raise ValueError(f"unknown crawler setting(s): {unknown}")
        cfg = replace(cfg, **overrides)
    return cfg
