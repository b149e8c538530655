"""The generation-loop BFS crawl pipeline (SURVEY §7.2 M4).

Data plane (Ray Data, fully parallel per generation):

    read_parquet(corpus buckets of the frontier's hosts)   ← pruned read
      → map_batches(fetch_extract_task pool)               ← url∈frontier filter + HTML extract
      → write_parquet(run_dir/results/gen=K)               ← accepted pages (+ optional intel)

Control plane (driver + actors, cheap metadata only):

    frontier candidates → seen-set pool contains() →
    sequential replay of the reference control flow (state.scheduler) →
    marks/hashes insert() → next-generation frontier

"Fetch" is a partition-pruned lookup join of the scheduled frontier
against the page corpus (SURVEY §2.4 J3): the frontier's sorted hash
array is broadcast once per generation via ``ray.put`` and deserialized
once per worker — never re-shipped per batch.  A URL absent from the
corpus is a fetch failure and is charged the reference's full
retry/backoff cost in virtual time (crawler.py:123-153).

Checkpoint/resume (SURVEY §7.2 M7): every generation writes results +
next frontier + seen-set snapshots + scheduler state + a lineage manifest
entry; ``resume=True`` restores the newest complete generation and
continues without re-fetching any URL.
"""
from __future__ import annotations

import hashlib
import json
import logging
import shutil
import time
from dataclasses import asdict, dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Set, Tuple

import pyarrow as pa
import pyarrow.parquet as pq

from .. import runtime_env
from ..config import CrawlSettings
from ..corpus import host_bucket_of
from ..extract import extract_batch
from ..intelligence import intelligence_batch
from ..state.scheduler import (
    Candidate,
    ReplayResult,
    SeedState,
    replay_generation,
    replay_generation_sharded,
)
from ..state.pqueue import FrontierQueue, ShardedFrontierQueue
from ..state.robots import RobotsTable
from ..state.seen import SeenSetPool
from ..urlops import (
    get_host,
    is_blacklisted,
    is_valid_onion_url,
    normalize_blacklist,
)

logger = logging.getLogger(__name__)

# AUTO frontier-sharding cutoff: below this many valid seeds the driver
# queue wins (actor round-trips cost more than they save; measured in
# BASELINE.md's 10k-seed frontier stress), at or above it link expansion
# must stay in the data plane (frontier_shards=None picks per this)
FRONTIER_AUTO_SEEDS = 5_000


def frontier_shard_count(cfg: CrawlSettings, n_valid_seeds: int) -> int:
    """Resolve ``cfg.frontier_shards`` to a shard count: explicit N → N,
    explicit 0 → driver queue, None → AUTO (shard once the seed list is
    big enough that link expansion shouldn't transit the driver — the
    scale path is the default where scale begins, not an opt-in)."""
    if cfg.frontier_shards is None:
        return (max(4, cfg.seen_shards)
                if n_valid_seeds >= FRONTIER_AUTO_SEEDS else 0)
    return cfg.frontier_shards


def _mark_key(seed_id: int, url: str) -> str:
    return f"{seed_id}|{url}"


def _write_delta(path: str, keys: List[str]) -> None:
    pq.write_table(pa.table({"key": pa.array(sorted(keys), pa.string())}), path)


def _read_delta(path: str) -> List[str]:
    """Read a seen-set checkpoint delta: either a single file (driver
    path) or per-replay-shard files ``<path>.shard<k>`` (data-plane
    path writes them from the replay tasks)."""
    import glob as _glob

    files = sorted(_glob.glob(path + ".shard*"))
    if not files:
        files = [path] if Path(path).exists() else []
    keys: List[str] = []
    for f in files:
        keys.extend(pq.read_table(f).column("key").to_pylist())
    return keys


# The frontier is broadcast as a SORTED uint64 array of url_hash64 values
# (columnar, ~8 bytes/URL — the 10^10-frontier representation from SURVEY
# §4: "frontier kept columnar, never a Python set"); the task ships only
# the ObjectRef and the worker-local broadcast cache (broadcast.cached_get)
# deserializes it once per worker.  Plain TASK pool (no actor ramp-up;
# warm workers) measures ~5s faster per generation than an actor pool on a
# fresh session.  Membership is a vectorized np.searchsorted per batch.  A
# 64-bit hash collision can only admit an extra corpus row into the fetch
# (harmless: the control-plane replay consumes only scheduled URLs), never
# drop a scheduled one.


def broadcast_frontier_hashes(urls) -> "object":
    """ray.put a sorted uint64 hash array for *urls* (broadcast once)."""
    import numpy as np
    import ray

    from ..urlops import batch_url_hash64

    return ray.put(np.sort(batch_url_hash64(list(urls))))


# Above this many scheduled fetch URLs per generation, the membership
# filter stops broadcasting ONE hash array (every worker deserializes
# the whole set — ~8 bytes/URL each, but per-WORKER) and co-partitions
# the hashes with the corpus's host_bucket layout instead: each
# per-bucket read ships only its bucket's sorted hash ref — a
# partitioned semi-join on the partitioning key the corpus already has
# (the VERIFY_BROADCAST_CUTOFF idiom, functions/dedup.py).  Per-worker
# memory drops to O(fetch / N_BUCKETS); results are identical (same
# searchsorted membership, just against the only hashes that can match
# the bucket's rows).
FETCH_BROADCAST_CUTOFF = 2_000_000


def _fetch_cutoff(cfg: CrawlSettings) -> int:
    return (FETCH_BROADCAST_CUTOFF if cfg.fetch_broadcast_cutoff is None
            else cfg.fetch_broadcast_cutoff)


def _fetch_extract_bucketed(
    corpus_dir: str,
    bucket_refs: Dict[int, "object"],
    cfg: CrawlSettings,
    bucket_filter_urls: Optional[Dict[int, List[str]]] = None,
):
    """Per-host-bucket fetch+extract: one pruned read per bucket, each
    carrying only ITS bucket's sorted-hash ref (``bucket_refs``), the
    per-bucket datasets unioned into one.  ``bucket_filter_urls``
    optionally pushes the bucket's URL list into the Arrow scanner
    (same ≤100k cap semantics as the single-broadcast path).  Returns
    the materialized fetched dataset, or None when no bucket has
    corpus files."""
    import pyarrow.compute as _pc
    import ray

    parts = []
    for b, ref in sorted(bucket_refs.items()):
        root = Path(corpus_dir) / f"host_bucket={b}"
        if not root.exists():
            continue
        paths = sorted(str(f) for f in root.rglob("*.parquet"))
        if not paths:
            continue
        read_kwargs = {}
        if bucket_filter_urls is not None and b in bucket_filter_urls:
            read_kwargs["filter"] = _pc.field("url").isin(
                bucket_filter_urls[b])
        ds_b = ray.data.read_parquet(
            paths, columns=["url", "html"], **read_kwargs
        ).map_batches(
            fetch_extract_task,
            fn_kwargs={"hashes_ref": ref},
            batch_format="pyarrow",
            batch_size=cfg.extract_batch_size,
            runtime_env=runtime_env(),
        )
        parts.append(ds_b)
    if not parts:
        return None
    ds = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
    return ds.materialize()


def fetch_extract_task(
    batch: pa.Table, hashes_ref=None, with_intel: bool = False,
    drop_links: bool = False,
) -> pa.Table:
    """Fused task-pool fetch → extract (→ intelligence) stage.

    Single pass per batch: vectorized frontier-membership filter, then HTML
    extraction (and optionally the IOC/threat stage) without intermediate
    Arrow materialization between stages (extract_batch +
    intelligence_batch semantics, fused).
    ``drop_links=True`` drops the link-list column in-task (saves an
    inter-stage — potentially cross-node — block handoff when the caller
    doesn't need the frontier expansion).
    """
    import numpy as np

    from ..urlops import batch_url_hash64

    from ..broadcast import cached_get

    h = cached_get(hashes_ref)
    bh = batch_url_hash64(batch.column("url").to_pylist())
    idx = np.searchsorted(h, bh)
    idx[idx >= len(h)] = max(len(h) - 1, 0)
    mask = (h[idx] == bh) if len(h) else np.zeros(len(bh), dtype=bool)
    if not mask.all():
        batch = batch.filter(pa.array(mask))
    out = extract_batch(batch)
    if with_intel:
        out = intelligence_batch(out)
    if drop_links:
        out = out.drop_columns(["links"])
    return out


def _finalize_accepted(batch: pa.Table, acc_ref=None) -> pa.Table:
    """Accepted-row filter for the results write: broadcast PARALLEL
    ARRAYS sorted by url hash — membership and (seed_id, depth) lookup
    are one vectorized searchsorted per batch (same idiom as
    fetch_extract_task; a 64-bit hash collision between a fetched-but-
    rejected and an accepted URL is the only way to misroute a row —
    negligible and bounded)."""
    import numpy as np

    from ..broadcast import cached_get
    from ..urlops import batch_url_hash64

    h, sids, depths = cached_get(acc_ref)
    bh = batch_url_hash64(batch.column("url").to_pylist())
    idx = np.searchsorted(h, bh)
    idx[idx >= len(h)] = max(len(h) - 1, 0)
    mask = (h[idx] == bh) if len(h) else np.zeros(len(bh), bool)
    kept = batch.filter(pa.array(mask)).drop_columns(["links"])
    sel = idx[mask]
    kept = kept.append_column("depth", pa.array(depths[sel], pa.int32()))
    kept = kept.append_column("seed_id", pa.array(sids[sel], pa.int32()))
    return kept


def _push_links_csr(fetched_ds, ref, frontier) -> int:
    """Stage link expansion onto the frontier shards from a prebuilt CSR
    broadcast ``ref`` — see :func:`_push_links_dataplane` (which builds
    the CSR driver-side for the legacy call shape; the data-plane
    control path builds it in a task from propagate-table refs)."""
    import ray

    handles = frontier.shard_handles
    n_sh = frontier.n_shards

    def expand_task(batch: pa.Table, _ref=ref, _handles=handles,
                    _n=n_sh) -> pa.Table:
        import numpy as np
        import ray as _ray

        from ..broadcast import cached_get
        from ..urlops import batch_url_hash64 as _bh

        h_s, starts, counts, sids, deps = cached_get(_ref)
        bh = _bh(batch.column("url").to_pylist())
        idx = np.searchsorted(h_s, bh)
        idx[idx >= len(h_s)] = max(len(h_s) - 1, 0)
        mask = (h_s[idx] == bh) if len(h_s) else np.zeros(len(bh), bool)
        n_links = 0
        if mask.any():
            hit = batch.filter(pa.array(mask))
            hit_idx = idx[mask]
            routed: Dict[int, list] = {}
            for row, links in enumerate(hit.column("links").to_pylist()):
                s0 = int(starts[hit_idx[row]])
                for k in range(int(counts[hit_idx[row]])):
                    sid = int(sids[s0 + k])
                    nd = int(deps[s0 + k])
                    lst = routed.setdefault(sid % _n, [])
                    for link in links:
                        lst.append((sid, nd, link))
                n_links += len(links) * int(counts[hit_idx[row]])
            _ray.get(
                [_handles[s].stage.remote(es) for s, es in routed.items()]
            )
        return pa.table({"n_links": pa.array([n_links], pa.int64())})

    counts_ds = (
        fetched_ds.select_columns(["url", "links"])
        .map_batches(
            expand_task, batch_format="pyarrow", runtime_env=runtime_env()
        )
        .materialize()  # barrier: every stage() RPC has been ray.get-ed
    )
    total = sum(r["n_links"] for r in counts_ds.take_all())
    frontier.commit_staged()
    return total


def _push_links_dataplane(fetched_ds, expand, frontier) -> int:
    """Expand propagated pages' links INSIDE the data plane (SURVEY §4:
    "frontier kept columnar, never a Python set" — the 10^10-frontier
    path).

    ``expand`` is [(url, seed_id, next_depth)] for this generation's
    propagated pages.  It is broadcast as CSR arrays keyed by sorted url
    hash; each fetch block finds its propagated rows with one vectorized
    searchsorted, builds (seed_id, depth, link) entries, and ``stage()``s
    them straight onto the owning frontier shard — link bytes flow
    worker→shard, never through the driver, which sees only per-block
    counts.  ``commit_staged()`` then applies every shard's staged
    entries in canonical sorted order (deterministic regardless of task
    interleaving — see ShardedFrontierQueue docstring)."""
    import numpy as np
    import ray

    from ..urlops import batch_url_hash64

    by_url: Dict[str, List[Tuple[int, int]]] = {}
    for u, sid, nd in expand:
        by_url.setdefault(u, []).append((sid, nd))
    urls = list(by_url)
    h = batch_url_hash64(urls)
    order = np.argsort(h)
    counts = np.array([len(by_url[urls[i]]) for i in order], np.int64)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    sids = np.array(
        [s for i in order for s, _ in by_url[urls[i]]], np.int64
    )
    deps = np.array(
        [d for i in order for _, d in by_url[urls[i]]], np.int64
    )
    ref = ray.put((h[order], starts, counts, sids, deps))
    return _push_links_csr(fetched_ds, ref, frontier)


@dataclass
class GenerationMetrics:
    generation: int
    candidates: int = 0
    fetched: int = 0
    success: int = 0
    failed: int = 0
    blacklisted: int = 0
    dup: int = 0
    robots_blocked: int = 0
    deferred: int = 0
    abandoned: int = 0
    already: int = 0
    wall_time_s: float = 0.0

    def as_dict(self) -> dict:
        return asdict(self)


@dataclass
class CrawlRun:
    """Handle over a finished (or resumed) crawl."""

    run_dir: str
    results_path: str
    stats: Dict[str, int]
    states: Dict[int, SeedState]
    metrics: List[GenerationMetrics]
    generations: int
    fetched_urls_per_gen: List[Set[str]] = field(default_factory=list)

    def results_dataset(self):
        """The crawl results as a streaming Ray Dataset."""
        import ray

        if not any(Path(self.results_path).rglob("*.parquet")):
            return ray.data.from_arrow(_empty_results_table())
        return ray.data.read_parquet(self.results_path)

    def results_table(self) -> pa.Table:
        files = sorted(str(p) for p in Path(self.results_path).rglob("*.parquet"))
        if not files:
            return _empty_results_table()
        return pa.concat_tables([pq.read_table(f) for f in files], promote_options="default")


def _empty_results_table() -> pa.Table:
    return pa.table(
        {
            "url": pa.array([], pa.string()),
            "site": pa.array([], pa.string()),
            "title": pa.array([], pa.string()),
            "text": pa.array([], pa.large_string()),
            "content_hash": pa.array([], pa.string()),
            "links_found": pa.array([], pa.int32()),
            "crawl_time": pa.array([], pa.float64()),
            "depth": pa.array([], pa.int32()),
            "seed_id": pa.array([], pa.int32()),
        }
    )


def _config_digest(cfg: CrawlSettings, seeds: Sequence[str]) -> str:
    payload = json.dumps({"cfg": asdict(cfg), "seeds": list(seeds)}, sort_keys=True)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def _corpus_paths_for_hosts(corpus_dir: str, hosts: Set[str]) -> List[str]:
    """Partition pruning: only the buckets holding the frontier's hosts."""
    buckets = sorted({host_bucket_of(h) for h in hosts})
    paths: List[str] = []
    for b in buckets:
        p = Path(corpus_dir) / f"host_bucket={b}"
        if p.exists():
            paths.extend(sorted(str(f) for f in p.rglob("*.parquet")))
    return paths


def _checkpoint_generation(
    frontier,
    use_sharded: bool,
    state_root: Path,
    manifest: dict,
    manifest_path: Path,
    metrics: List["GenerationMetrics"],
    states: Dict[int, SeedState],
    gm: "GenerationMetrics",
    gen: int,
    fetch_digest: str,
) -> None:
    """Per-generation checkpoint: frontier snapshot (per-shard files on
    the sharded queue — frontier bytes never transit the driver) + the
    O(1)-per-generation lineage manifest entry, atomically renamed.
    Seen-set deltas are written separately by whichever path ran the
    replay (driver loop or the data-plane replay tasks)."""
    frontier.snapshot_parquet(str(state_root / f"frontier_gen{gen}.parquet"))
    manifest["generations"] = [
        g for g in manifest["generations"] if g["generation"] < gen
    ]
    manifest["generations"].append(
        {
            "generation": gen,
            "complete": True,
            # lineage: exactly which URLs this generation's partition
            # was built from (digest of the scheduled fetch set)
            "fetch_digest": fetch_digest,
            "counts": gm.as_dict(),
            "seed_states": {str(k): v.as_dict() for k, v in states.items()},
            "frontier_size": len(frontier),
            "frontier_dropped": (
                frontier.dropped() if use_sharded else frontier.dropped
            ),
        }
    )
    manifest["metrics"] = [m.as_dict() for m in metrics]
    tmp = manifest_path.with_suffix(".tmp")
    tmp.write_text(json.dumps(manifest, indent=1))
    tmp.rename(manifest_path)


def _generation_dataplane(
    corpus_dir: str,
    cfg: CrawlSettings,
    frontier,
    marks_pool: SeenSetPool,
    hash_pool: SeenSetPool,
    states: Dict[int, SeedState],
    seed_delays: Dict[int, float],
    blacklist,
    robots: RobotsTable,
    gm: GenerationMetrics,
    gen: int,
    results_root: Path,
    state_root: Path,
    with_intel: bool,
    on_page_crawled,
    track_fetched_urls: bool,
    fetched_urls_per_gen: List[Set[str]],
    purged_pre: int,
    pop_budget=None,
) -> str:
    """One generation on the sharded (data-plane control) path.

    The driver materializes only counters, per-seed states, and the
    bounded pruning info (distinct hosts; the fetch URL list only below
    the scanner-filter cap) — popped entries, mark keys, fetched
    metadata, replay candidates, accepted/propagate rows and checkpoint
    delta keys all flow between tasks and shard actors as ObjectRefs
    (see pipelines/crawl_plane.py).  Returns the fetch-set digest for
    the lineage manifest.  Decision semantics are bit-identical to the
    driver path (same ``replay_generation`` core in the tasks, same
    canonical order; pinned by test_crawl's sharded-vs-driver and
    oracle conformance tests)."""
    import glob as _glob

    import numpy as np
    import ray

    from .crawl_plane import _remote_tasks

    tasks = _remote_tasks()

    inactive = frozenset(
        sid for sid, st in states.items()
        if st.exhausted or st.pages >= cfg.max_pages
    )
    # replay seed ranges first: prep tasks split candidates by range
    n_replay = max(1, cfg.replay_shards or 1)
    seed_ids = sorted(states)
    chunk = ((len(seed_ids) + n_replay - 1) // n_replay
             if seed_ids else 1)
    ranges = [frozenset(seed_ids[i * chunk:(i + 1) * chunk])
              for i in range(n_replay)]

    # one parallel prep task PER FRONTIER SHARD (a single
    # whole-generation prep would itself be the bottleneck at scale)
    pop_refs = frontier.pop_budget_refs(pop_budget)
    info_refs, shard_hash_refs = [], []
    range_refs: List[list] = [[] for _ in range(n_replay)]
    for pref in pop_refs:
        outs = tasks["prep"].options(num_returns=2 + n_replay).remote(
            blacklist, robots, inactive, marks_pool.shard_handles,
            100_000, ranges, pref)
        info_refs.append(outs[0])
        shard_hash_refs.append(outs[1])
        for k in range(n_replay):
            range_refs[k].append(outs[2 + k])

    import hashlib as _hl

    info_list = ray.get(info_refs)
    gm.already = sum(i["already"] for i in info_list)
    gm.candidates = sum(i["n_candidates"] for i in info_list)
    small_lists = [i["fetch_urls_small"] for i in info_list]
    union_small = (sorted({u for lst in small_lists for u in lst})
                   if all(x is not None for x in small_lists)
                   else None)
    info = {
        "n_fetch": sum(i["n_fetch"] for i in info_list),
        "aband_pre": sum(i["aband_pre"] for i in info_list),
        "hosts": sorted({h for i in info_list for h in i["hosts"]}),
        # generation digest = digest of per-shard fetch-set digests
        # (shard order) — lineage identity without a global URL gather
        "fetch_digest": _hl.sha256(
            "".join(i["fetch_digest"] for i in info_list).encode()
        ).hexdigest()[:16],
        "fetch_urls_small": (
            union_small
            if union_small is not None and len(union_small) <= 100_000
            else None),
    }

    gen_results_dir = results_root / f"gen={gen}"
    if gen_results_dir.exists():
        shutil.rmtree(gen_results_dir)  # idempotent partition overwrite

    fetched_ds = None
    if info["n_fetch"] and info["n_fetch"] > _fetch_cutoff(cfg):
        # size-gated bucketed membership (FETCH_BROADCAST_CUTOFF): the
        # per-shard (hash, bucket) pairs split into per-host-bucket
        # sorted arrays IN A TASK, each bucket's pruned read carrying
        # only its own ref — per-worker memory O(fetch / buckets)
        buckets = sorted({host_bucket_of(h) for h in info["hosts"]})
        if buckets:
            refs = tasks["splith"].options(
                num_returns=len(buckets)).remote(
                buckets, *shard_hash_refs)
            if len(buckets) == 1:
                refs = [refs]
            filt = None
            if info["fetch_urls_small"] is not None:
                filt = {}
                for u in info["fetch_urls_small"]:
                    filt.setdefault(
                        host_bucket_of(get_host(u)), []).append(u)
            fetched_ds = _fetch_extract_bucketed(
                corpus_dir, dict(zip(buckets, refs)), cfg,
                bucket_filter_urls=filt)
    elif info["n_fetch"]:
        hashes_ref = tasks["mergeh"].remote(*shard_hash_refs)
        paths = _corpus_paths_for_hosts(corpus_dir, set(info["hosts"]))
        if paths:
            import pyarrow.compute as _pc

            read_kwargs = {}
            if info["fetch_urls_small"] is not None:
                read_kwargs["filter"] = _pc.field("url").isin(
                    info["fetch_urls_small"])
            ds = ray.data.read_parquet(
                paths, columns=["url", "html"], **read_kwargs
            )
            fetched_ds = ds.map_batches(
                fetch_extract_task,
                fn_kwargs={"hashes_ref": hashes_ref},
                batch_format="pyarrow",
                batch_size=cfg.extract_batch_size,
                runtime_env=runtime_env(),
            ).materialize()

    if fetched_ds is not None:
        meta_blocks = fetched_ds.select_columns(
            ["url", "content_hash"]).to_arrow_refs()
        meta_ref, n_fetched_ref, urls_ref = tasks["meta"].remote(
            *meta_blocks)
        gm.fetched = ray.get(n_fetched_ref)
    else:
        meta_ref = ray.put((np.empty(0, np.uint64), np.empty(0, object)))
        urls_ref = None
        gm.fetched = 0
    if track_fetched_urls:
        # O(total pages) driver memory — conformance/test aid only,
        # gated on the flag (never on the production path)
        fetched_urls_per_gen.append(
            set(ray.get(urls_ref)) if urls_ref is not None else set())

    # replay claims chain over the contiguous seed ranges (chain order
    # == canonical order; each link starts when its predecessor's
    # claims arrive — state/scheduler.py's sharded-replay discipline,
    # as tasks; each link's candidates arrive pre-split per frontier
    # shard from the prep tasks)
    for stale in _glob.glob(
            str(state_root / f"*_delta_gen{gen}.parquet.shard*")):
        Path(stale).unlink()  # a longer previous run's shards
    claims_ref = ray.put(set())
    counter_futs, state_futs, acc_refs, prop_refs = [], [], [], []
    commit_key_refs: list = []
    for k, sids_k in enumerate(ranges):
        sub_states = {sid: states[sid] for sid in sids_k}
        sub_delays = {
            sid: seed_delays[sid] for sid in sids_k
            if sid in seed_delays
        } or None
        (c_ref, st_ref, a_ref, p_ref, claims_ref,
         mk_ref, nh_ref) = tasks["replay"].remote(
            meta_ref, claims_ref, sub_states, cfg, sub_delays,
            hash_pool.shard_handles, marks_pool.shard_handles,
            str(state_root / f"marks_delta_gen{gen}.parquet.shard{k}"),
            str(state_root / f"hashes_delta_gen{gen}.parquet.shard{k}"),
            *range_refs[k],
        )
        counter_futs.append(c_ref)
        state_futs.append(st_ref)
        acc_refs.append(a_ref)
        prop_refs.append(p_ref)
        commit_key_refs.append((mk_ref, nh_ref))
    # pool commits launch only now, each gated on the chain's FINAL
    # claims_ref (an ordering-only argument): Ray cannot schedule any
    # commit until every replay link has returned, so no
    # same-generation pool_contains read can observe the inserts — the
    # invariant _commit_shard's retry-safety argument documents, made
    # structural.  A killed-and-retried commit stays idempotent.
    commit_futs = [
        tasks["commit"].remote(
            cfg, marks_pool.shard_handles, hash_pool.shard_handles,
            mk_ref, nh_ref, claims_ref)
        for mk_ref, nh_ref in commit_key_refs
    ]

    agg: Dict[str, int] = {}
    for c in ray.get(counter_futs):
        for key, v in c.items():
            agg[key] = agg.get(key, 0) + v
    ray.get(commit_futs)  # pools updated before the next generation reads
    for st_map in ray.get(state_futs):
        states.update(st_map)
    gm.success = agg.get("success", 0)
    gm.failed = agg.get("failed", 0)
    gm.dup = agg.get("dup", 0)
    gm.robots_blocked = agg.get("robots_blocked", 0)
    gm.blacklisted = agg.get("blacklisted", 0) - gm.robots_blocked
    gm.abandoned = (agg.get("abandoned", 0) + info["aband_pre"]
                    + purged_pre)

    if on_page_crawled is not None:
        # per-record callback contract (reference crawler.py:96): a
        # documented driver pull, gated on the hook being installed
        rows = []
        for t in ray.get(acc_refs):
            rows.extend(zip(
                t.column("sid").to_pylist(),
                t.column("url").to_pylist(),
                t.column("depth").to_pylist(),
                t.column("content_hash").to_pylist(),
            ))
        for sid, u, d, h in sorted(rows):
            on_page_crawled({
                "url": u, "seed_id": sid, "depth": d,
                "content_hash": h,
            })

    if gm.success and fetched_ds is not None:
        acc_arrays_ref = tasks["accept"].remote(*acc_refs)
        out_ds = fetched_ds.map_batches(
            _finalize_accepted,
            fn_kwargs={"acc_ref": acc_arrays_ref},
            batch_format="pyarrow",
            batch_size=cfg.extract_batch_size,
            runtime_env=runtime_env(),
        )
        if with_intel:
            out_ds = out_ds.map_batches(
                intelligence_batch,
                batch_format="pyarrow",
                batch_size=cfg.extract_batch_size,
                runtime_env=runtime_env(),
            )
        out_ds.write_parquet(str(gen_results_dir))

    csr_ref, n_exp_ref = tasks["expand"].remote(
        cfg.max_depth, *prop_refs)
    if ray.get(n_exp_ref) and fetched_ds is not None:
        _push_links_csr(fetched_ds, csr_ref, frontier)
    return info["fetch_digest"]


def run_crawl(
    corpus_dir: str,
    seed_urls: Sequence[str],
    cfg: Optional[CrawlSettings] = None,
    run_dir: Optional[str] = None,
    resume: bool = False,
    with_intel: bool = False,
    on_page_crawled=None,
    track_fetched_urls: bool = False,
) -> CrawlRun:
    """Run (or resume) the full BFS crawl over *corpus_dir*.

    Ray must already be initialised by the caller.

    *on_page_crawled* mirrors the reference's per-record callback hook
    (crawler.py:96, fired crawler.py:252-253): called once per ACCEPTED
    page with a dict ``{url, seed_id, depth, content_hash}``, in canonical
    (seed_id, url) order within each generation.  Driver-side and
    metadata-only — the page body stays in the data plane.
    """
    import ray

    cfg = cfg or CrawlSettings()
    run_dir = run_dir or f"/tmp/dwh_run_{int(time.time() * 1e6)}"
    run_path = Path(run_dir)
    results_root = run_path / "results"
    state_root = run_path / "state"
    results_root.mkdir(parents=True, exist_ok=True)
    state_root.mkdir(parents=True, exist_ok=True)

    blacklist = normalize_blacklist(cfg.blacklist_paths)
    robots = (
        RobotsTable.from_texts(cfg.robots_rules)
        if cfg.robots_rules
        else RobotsTable()
    )
    digest = _config_digest(cfg, seed_urls)

    # seed validation (crawler.py:293-299); invalid seeds logged, not marked
    valid_seeds = [u for u in seed_urls if is_valid_onion_url(u)]
    dropped = [u for u in seed_urls if not is_valid_onion_url(u)]
    if dropped:
        logger.warning("Dropping %d invalid seed URL(s): %s", len(dropped), dropped[:3])

    # robots Crawl-delay overrides politeness per seed host
    seed_delays = {
        sid: robots.crawl_delay_for(get_host(u), cfg.crawl_delay)
        for sid, u in enumerate(valid_seeds)
    }
    marks_pool = SeenSetPool(cfg.seen_shards, cfg.seen_mode, cfg.seen_capacity)
    hash_pool = SeenSetPool(cfg.seen_shards, cfg.seen_mode, cfg.seen_capacity)
    states: Dict[int, SeedState] = {
        sid: SeedState(seed_id=sid, seed_url=u) for sid, u in enumerate(valid_seeds)
    }
    metrics: List[GenerationMetrics] = []
    fetched_urls_per_gen: List[Set[str]] = []

    manifest_path = run_path / "manifest.json"
    start_gen = 0
    n_shards = frontier_shard_count(cfg, len(valid_seeds))
    if resume and manifest_path.exists():
        # a checkpoint's queue LAYOUT is part of its state: prefer the
        # shard count the manifest recorded; for pre-recording manifests
        # infer it from the last snapshot's file layout — otherwise a
        # later change to the AUTO cutoff/formula (or this release's
        # introduction of AUTO itself) would make an old driver-queue
        # checkpoint unresumable (restore_parquet refuses on a shard-
        # count mismatch by design)
        _peek = json.loads(manifest_path.read_text())
        if "frontier_shards_resolved" in _peek:
            n_shards = int(_peek["frontier_shards_resolved"])
        else:
            _done = [g for g in _peek.get("generations", [])
                     if g.get("complete")]
            if _done:
                import glob as _glob

                _snap = str(run_path / "state" /
                            f"frontier_gen{_done[-1]['generation']}.parquet")
                _shard_files = _glob.glob(_snap + ".shard*")
                n_shards = len(_shard_files)
    use_sharded = bool(n_shards)
    if use_sharded:
        frontier = ShardedFrontierQueue(
            n_shards, max_per_seed=cfg.frontier_max_per_seed
        )
    else:
        frontier = FrontierQueue(max_per_seed=cfg.frontier_max_per_seed)
    frontier.push([(sid, 0, u) for sid, u in enumerate(valid_seeds)])

    if resume and manifest_path.exists():
        from ..corpus import corpus_digest as _cdigest

        manifest = json.loads(manifest_path.read_text())
        # upgrade pre-recording manifests with the layout resolved above
        manifest["frontier_shards_resolved"] = n_shards
        if manifest.get("config_digest") != digest:
            raise ValueError("resume config/seeds mismatch with checkpoint manifest")
        if manifest.get("corpus_digest") and manifest["corpus_digest"] != _cdigest(corpus_dir):
            raise ValueError(
                "resume corpus mismatch: checkpoint was built from a "
                "different corpus than the one supplied"
            )
        complete = [g for g in manifest["generations"] if g.get("complete")]
        if complete:
            last = complete[-1]
            start_gen = last["generation"] + 1
            # replay per-generation seen-set deltas 0..last.  Sharded
            # path: one restore TASK per (kind, generation) reads its
            # delta file(s) and inserts straight into the pool actors —
            # keys never transit the driver (at a 10^10 frontier the
            # cumulative delta set is the frontier itself).  Driver
            # path keeps the in-process insert (small runs by
            # definition).
            if use_sharded:
                from .crawl_plane import _remote_tasks as _rt

                _restore = _rt()["restore"]
                ray.get([
                    _restore.remote(
                        handles,
                        str(state_root / f"{kind}_delta_gen{g}.parquet"))
                    for g in range(start_gen)
                    for kind, handles in (
                        ("marks", marks_pool.shard_handles),
                        ("hashes", hash_pool.shard_handles))
                ])
            else:
                for g in range(start_gen):
                    marks_pool.insert(_read_delta(
                        str(state_root / f"marks_delta_gen{g}.parquet")))
                    hash_pool.insert(_read_delta(
                        str(state_root / f"hashes_delta_gen{g}.parquet")))
            states = {
                int(k): SeedState.from_dict(v)
                for k, v in last["seed_states"].items()
            }
            frontier.restore_parquet(
                str(state_root / f"frontier_gen{last['generation']}.parquet")
            )
            if use_sharded:
                frontier.set_dropped(int(last.get("frontier_dropped", 0)))
            else:
                frontier.dropped = int(last.get("frontier_dropped", 0))
            metrics = [GenerationMetrics(**m) for m in manifest.get("metrics", [])]
            logger.info("Resuming from generation %d (%d frontier entries)", start_gen, len(frontier))
    else:
        # fresh run: purge stale partitions/state a previous (longer or
        # differently-configured) run may have left in this run_dir —
        # results_table() globs every gen=* dir, so leftovers would
        # silently contaminate the output
        if results_root.exists():
            shutil.rmtree(results_root)
            results_root.mkdir(parents=True)
        if state_root.exists():
            shutil.rmtree(state_root)
            state_root.mkdir(parents=True)
        from ..corpus import corpus_digest

        manifest = {
            "config_digest": digest,
            "corpus_dir": corpus_dir,
            "corpus_digest": corpus_digest(corpus_dir),
            # pin the resolved queue layout: resume must rebuild the SAME
            # shape even if the AUTO cutoff/formula changes later
            "frontier_shards_resolved": n_shards,
            "generations": [],
            "metrics": [],
        }

    # Without a per-generation fetch budget, generation index == BFS depth
    # and the loop ends at max_depth exactly as the reference does; with a
    # budget, deferred entries extend the run (hard safety cap only).
    budgeted = (cfg.max_fetch_per_gen is not None
                or cfg.gen_wallclock_s is not None)
    gen_cap = 1_000_000 if budgeted else cfg.max_depth
    # Politeness token budgets (per-seed pop caps enforced inside the
    # frontier — shard actors on the sharded path): a host with
    # crawl-delay D schedules ⌊gen_wallclock_s / D⌋ fetches/generation.
    if cfg.gen_wallclock_s is not None:
        pop_budget: object = {}
        for _sid, _delay in seed_delays.items():
            _b = max(1, int(cfg.gen_wallclock_s // max(_delay, 1e-9)))
            if cfg.max_fetch_per_gen is not None:
                _b = min(_b, cfg.max_fetch_per_gen)
            pop_budget[_sid] = _b
    else:
        pop_budget = cfg.max_fetch_per_gen
    gen = start_gen
    while len(frontier) and gen <= gen_cap:
        t_gen = time.monotonic()
        gm = GenerationMetrics(generation=gen)

        # ── control plane: budgeted pop from the priority-queue frontier ──
        # Exhausted seeds' queued entries can never be scheduled — purge
        # them in ONE step instead of draining max_fetch_per_gen per
        # generation (each no-op generation would pay a full O(frontier)
        # checkpoint); purged entries count as abandoned, exactly as they
        # would if popped.
        ex_sids = [
            sid for sid, st in states.items()
            if st.exhausted or st.pages >= cfg.max_pages
        ]
        purged_pre = frontier.drop_seeds(ex_sids) if ex_sids else 0

        if use_sharded:
            # data-plane control: the driver sees only counters/states;
            # candidates, metadata, replay rows and delta keys flow as
            # ObjectRefs between tasks and shard actors
            fetch_digest = _generation_dataplane(
                corpus_dir, cfg, frontier, marks_pool, hash_pool,
                states, seed_delays, blacklist, robots, gm, gen,
                results_root, state_root, with_intel, on_page_crawled,
                track_fetched_urls, fetched_urls_per_gen, purged_pre,
                pop_budget,
            )
            gm.deferred = len(frontier)
            gm.wall_time_s = time.monotonic() - t_gen
            metrics.append(gm)
            _checkpoint_generation(
                frontier, use_sharded, state_root, manifest,
                manifest_path, metrics, states, gm, gen, fetch_digest)
            gen += 1
            continue

        popped = frontier.pop_budget(pop_budget)

        # prior-mark filter (pop-check, crawler.py:240)
        keys = [_mark_key(sid, u) for sid, _, u in popped]
        marked = marks_pool.contains(keys)
        gm.already = int(marked.sum())
        cands_meta = [fr for fr, m in zip(popped, marked) if not m]

        # exhausted seeds' candidates never fetch (their replay abandons them)
        active = [
            (sid, d, u)
            for sid, d, u in cands_meta
            if not states[sid].exhausted and states[sid].pages < cfg.max_pages
        ]
        active_set = set(active)
        aband_pre = [x for x in cands_meta if x not in active_set]
        black = {u for _, _, u in active if is_blacklisted(u, blacklist)}
        robots_hits = robots.blocked_set(
            {u for _, _, u in active if u not in black}
        )
        black |= robots_hits
        fetch_urls = sorted({u for _, _, u in active if u not in black})
        gm.candidates = len(cands_meta)

        # ── data plane: pruned corpus read → broadcast-filter → extract ──
        extracted: Dict[str, dict] = {}
        gen_results_dir = results_root / f"gen={gen}"
        if gen_results_dir.exists():
            shutil.rmtree(gen_results_dir)  # idempotent partition overwrite
        if fetch_urls:
            hosts = {get_host(u) for u in fetch_urls}
            paths = _corpus_paths_for_hosts(corpus_dir, hosts)
            if paths and len(fetch_urls) > _fetch_cutoff(cfg):
                # size-gated bucketed membership (FETCH_BROADCAST_CUTOFF):
                # hashes co-partitioned with the corpus host_bucket layout,
                # each bucket's read carrying only its own hash ref
                from ..urlops import batch_url_hash64 as _bh64
                import numpy as _np

                by_bucket: Dict[int, List[str]] = {}
                for u in fetch_urls:
                    by_bucket.setdefault(
                        host_bucket_of(get_host(u)), []).append(u)
                bucket_refs = {
                    b: ray.put(_np.sort(_bh64(us)))
                    for b, us in by_bucket.items()
                }
                filt = (by_bucket if len(fetch_urls) <= 100_000 else None)
                fetched_ds = _fetch_extract_bucketed(
                    corpus_dir, bucket_refs, cfg, bucket_filter_urls=filt)
            elif paths:
                hashes_ref = broadcast_frontier_hashes(fetch_urls)
                # For modest frontiers, push the membership filter into the
                # Arrow scanner: non-frontier rows are dropped before their
                # html bytes ever reach the object store.  Beyond the cap
                # the filter expression itself would be the bottleneck —
                # the hash-broadcast filter in fetch_extract_task is the
                # 10^10-scale path either way (it always applies too).
                import pyarrow.compute as _pc

                read_kwargs = {}
                if len(fetch_urls) <= 100_000:
                    read_kwargs["filter"] = _pc.field("url").isin(fetch_urls)
                ds = ray.data.read_parquet(
                    paths, columns=["url", "html"], **read_kwargs
                )
                fetched_ds = ds.map_batches(
                    fetch_extract_task,
                    fn_kwargs={"hashes_ref": hashes_ref},
                    batch_format="pyarrow",
                    batch_size=cfg.extract_batch_size,
                    runtime_env=runtime_env(),
                ).materialize()
            else:
                fetched_ds = None
            if fetched_ds is not None:
                # control-plane metadata pull: the driver-queue path
                # replays in driver memory by design (small runs below
                # the frontier-sharding cutoff; the sharded path above
                # took the _generation_dataplane branch instead)
                meta = fetched_ds.select_columns(
                    ["url", "content_hash", "links"]).take_all()
                extracted = {
                    r["url"]: {
                        "content_hash": r["content_hash"],
                        "links": list(r["links"]),
                    }
                    for r in meta
                }
        else:
            fetched_ds = None
        gm.fetched = len(extracted)
        if track_fetched_urls:
            # O(total pages) driver memory — conformance/test aid only
            fetched_urls_per_gen.append(set(extracted))

        # ── replay the reference control flow in canonical order ──────────
        candidates = [
            Candidate(
                seed_id=sid,
                url=u,
                depth=d,
                blacklisted=u in black,
                fetched=u in extracted,
                content_hash=extracted[u]["content_hash"] if u in extracted else None,
            )
            for sid, d, u in active
        ]
        cand_depth = {(sid, u): d for sid, d, u in active}
        cand_hashes = sorted({c.content_hash for c in candidates if c.content_hash})
        known = hash_pool.contains(cand_hashes)
        known_hashes = {h for h, k in zip(cand_hashes, known) if k}
        if cfg.replay_shards:
            replay: ReplayResult = replay_generation_sharded(
                candidates, states, known_hashes, cfg,
                seed_delays=seed_delays, n_shards=cfg.replay_shards,
            )
        else:
            replay = replay_generation(
                candidates, states, known_hashes, cfg, seed_delays=seed_delays
            )
        gm.abandoned = (replay.status.count("abandoned") + len(aband_pre)
                        + purged_pre)
        gm.success = replay.status.count("success")
        gm.failed = replay.status.count("failed")
        gm.dup = replay.status.count("dup")
        # split the skip reason: robots_blocked counts pops skipped by a
        # robots rule, blacklisted counts path-blacklist skips — disjoint
        gm.robots_blocked = sum(
            1
            for c, st_ in zip(candidates, replay.status)
            if st_ == "blacklisted" and c.url in robots_hits
        )
        gm.blacklisted = replay.status.count("blacklisted") - gm.robots_blocked

        marks_pool.insert([_mark_key(s, u) for s, u in replay.new_marks])
        hash_pool.insert(replay.new_hashes)

        # ── persist accepted results (partitioned per generation) ─────────
        if on_page_crawled is not None:
            for sid, u in sorted(replay.accepted):
                on_page_crawled(
                    {
                        "url": u,
                        "seed_id": sid,
                        "depth": cand_depth[(sid, u)],
                        "content_hash": extracted[u]["content_hash"],
                    }
                )

        accepted_by_url = {
            u: (sid, cand_depth[(sid, u)]) for sid, u in replay.accepted
        }
        if accepted_by_url and fetched_ds is not None:
            # broadcast as PARALLEL ARRAYS sorted by url hash — membership
            # and (seed_id, depth) lookup are one vectorized searchsorted
            # per batch (same idiom as fetch_extract_task; a 64-bit hash
            # collision between a fetched-but-rejected and an accepted URL
            # is the only way to misroute a row — negligible and bounded)
            from ..urlops import batch_url_hash64 as _bh64
            import numpy as _np

            _acc_urls = sorted(accepted_by_url)
            _h = _bh64(_acc_urls)
            _order = _np.argsort(_h)
            acc_ref = ray.put(
                (
                    _h[_order],
                    _np.array([accepted_by_url[u][0] for u in _acc_urls],
                              _np.int32)[_order],
                    _np.array([accepted_by_url[u][1] for u in _acc_urls],
                              _np.int32)[_order],
                )
            )

            out_ds = fetched_ds.map_batches(
                _finalize_accepted,
                fn_kwargs={"acc_ref": acc_ref},
                batch_format="pyarrow",
                batch_size=cfg.extract_batch_size,
                runtime_env=runtime_env(),
            )
            if with_intel:
                out_ds = out_ds.map_batches(
                    intelligence_batch,
                    batch_format="pyarrow",
                    batch_size=cfg.extract_batch_size,
                    runtime_env=runtime_env(),
                )
            out_ds.write_parquet(str(gen_results_dir))

        # ── next-generation frontier (enqueue guard depth < max_depth) ────
        # collect, then push in canonical (sid, depth, url) order — the
        # queue's first-push-wins dedup must see the SHALLOWEST
        # discovery of a url first (BFS invariant).  Iterating parents
        # by (sid, url) could push a deep parent's link before a
        # shallow parent's in budget mode (mixed-depth generations),
        # permanently recording the deeper depth and diverging from
        # the sharded path, whose commit() sorts staged entries.
        entries = []
        for sid, u in sorted(replay.propagate):
            d = cand_depth[(sid, u)]
            if d < cfg.max_depth:
                entries.extend(
                    (sid, d + 1, link) for link in extracted[u]["links"]
                )
        entries.sort()
        frontier.push(entries)
        gm.deferred = len(frontier)
        gm.wall_time_s = time.monotonic() - t_gen
        metrics.append(gm)

        # ── checkpoint: O(generation-delta) state + lineage manifest ──────
        # Seen-set DELTAS: the driver already knows exactly which keys this
        # generation added (replay.new_marks / new_hashes), so checkpoint
        # I/O is O(new keys) per generation, not O(all keys) — at a 10^10
        # frontier a full-set snapshot per generation would be the
        # dominant cost.  Resume replays deltas 0..K into the pools.
        # (On the data-plane path the replay TASKS write these files.)
        _write_delta(
            str(state_root / f"marks_delta_gen{gen}.parquet"),
            [_mark_key(s_, u_) for s_, u_ in replay.new_marks],
        )
        _write_delta(
            str(state_root / f"hashes_delta_gen{gen}.parquet"),
            list(replay.new_hashes),
        )
        _checkpoint_generation(
            frontier, use_sharded, state_root, manifest, manifest_path,
            metrics, states, gm, gen,
            hashlib.sha256("\n".join(fetch_urls).encode()).hexdigest()[:16],
        )

        gen += 1

    stats = {
        "sites_crawled": len(states),
        "pages_crawled": sum(s.crawled for s in states.values()),
        "pages_failed": sum(s.failed for s in states.values()),
        "pages_skipped": sum(s.skipped for s in states.values()),
        "pages_deduplicated": sum(s.deduplicated for s in states.values()),
        "frontier_dropped": (
            frontier.dropped() if use_sharded else frontier.dropped
        ),
        "generations": gen,
    }
    return CrawlRun(
        run_dir=run_dir,
        results_path=str(results_root),
        stats=stats,
        states=states,
        metrics=metrics,
        generations=gen,
        fetched_urls_per_gen=fetched_urls_per_gen,
    )
