"""Data-plane generation control for the sharded crawl path.

The driver-queue path (pipelines/crawl.py, small runs) replays the
reference control flow (crawler.py:237-265 semantics) in driver memory —
fine below the frontier-sharding cutoff, a driver OOM at a 10^10
frontier, where one BFS generation is billions of URLs.  This module
moves the whole per-generation control plane into Ray tasks + the
existing shard actors so the driver holds only O(seeds) state and
per-generation COUNTERS:

* ``pop`` stays on the frontier shard actors; each shard's popped
  entries are handed to its own :func:`_prep_shard` task as an
  ObjectRef (never ``ray.get`` on the driver).
* :func:`_prep_shard` (one PARALLEL task per frontier shard — a
  single whole-generation prep would itself be the bottleneck at
  scale) runs the mark filter against the seen-shard actors plus the
  blacklist/robots checks, and splits survivors by replay seed range;
  the driver receives only the small per-shard info dicts and combines
  counters/hosts/digests; :func:`_merge_hashes` builds the fetch-hash
  broadcast from the per-shard arrays in a task.
* :func:`_replay_shard` — the seed-range claims chain of
  ``state.scheduler.replay_generation_sharded``, as tasks whose
  candidate/meta inputs and accepted/propagate outputs are ObjectRefs;
  each link writes its checkpoint delta file and hands its new
  marks/hashes as refs to a per-shard :func:`_commit_shard` task that
  inserts them into the seen pools after the generation's replay
  completes, so neither keys nor rows transit the driver and a
  killed-and-retried link stays idempotent.  Output is bit-identical
  to the driver replay (same ``replay_generation`` core, same
  canonical order).
* :func:`_build_accept_arrays` / :func:`_build_expand_csr` assemble the
  broadcast structures for the finalize filter and the data-plane link
  expansion from those refs, in tasks.

The driver's per-generation residency is: counters, per-seed states,
the distinct-host list for partition pruning (bounded by corpus host
cardinality), and — only below the scanner-filter cap — the fetch URL
list for the parquet reader's ``isin`` pushdown.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Set, Tuple

import numpy as np
import pyarrow as pa

from ..config import CrawlSettings
from ..state.scheduler import (
    BLACKLISTED,
    Candidate,
    replay_generation,
)
from ..urlops import batch_url_hash64, get_host, is_blacklisted, url_hash64


# ── task-side seen-pool access (same routing rule as SeenSetPool) ────────────


def pool_contains(handles, keys: Sequence[str]) -> np.ndarray:
    """Batched membership query against seen-shard actor handles from
    INSIDE a task — one RPC per shard, same ``url_hash64(k) % n``
    routing as ``SeenSetPool._route``."""
    import ray

    if not len(keys):
        return np.zeros(0, bool)
    n = len(handles)
    groups: Dict[int, List[int]] = {}
    for i, k in enumerate(keys):
        groups.setdefault(url_hash64(k) % n, []).append(i)
    futs = {
        s: handles[s].contains.remote([keys[i] for i in idxs])
        for s, idxs in groups.items()
    }
    out = np.zeros(len(keys), bool)
    for s, fut in futs.items():
        for i, v in zip(groups[s], ray.get(fut)):
            out[i] = v
    return out


def pool_insert(handles, keys: Sequence[str]) -> None:
    import ray

    if not len(keys):
        return
    n = len(handles)
    groups: Dict[int, List[int]] = {}
    for i, k in enumerate(keys):
        groups.setdefault(url_hash64(k) % n, []).append(i)
    ray.get([
        handles[s].insert.remote([keys[i] for i in idxs])
        for s, idxs in groups.items()
    ])


# ── generation tasks ─────────────────────────────────────────────────────────


def _prep_shard(
    blacklist,
    robots,
    inactive_sids: frozenset,
    marks_handles,
    scanner_cap: int,
    seed_ranges,
    pop_part,
):
    """Per-FRONTIER-SHARD candidate preparation (one parallel task per
    shard — a single whole-generation prep task would itself be the
    memory/straggler bottleneck at a 10^10 frontier).  Takes this
    shard's popped entry list (auto-resolved ObjectRef), runs the mark
    filter against the seen-shard actors plus the blacklist/robots
    flags, and SPLITS the surviving candidates by replay seed range so
    each replay-chain link later receives exactly its seeds' rows.

    Returns ``(info, fetch_hashes, *range_tables)`` via
    ``num_returns = 2 + len(seed_ranges)``; the driver materializes
    only ``info``:

    * info: this shard's counters (popped/already/aband_pre), its
      distinct HOST list (partition pruning; bounded by host
      cardinality), a shard fetch-set digest (the generation digest is
      the driver's digest-of-shard-digests), and — iff ≤
      ``scanner_cap`` — this shard's fetch URL list for the reader's
      ``isin`` pushdown (the driver uses the union only when every
      shard stayed under the cap).
    * fetch_hashes: this shard's sorted uint64 url hashes (merged
      across shards by :func:`_merge_hashes` into the broadcast).
    * range_tables: per-seed-range candidate tables
      (sid, depth, url, black, robots), each sorted canonically.
    """
    import hashlib

    entries = sorted(pop_part)  # canonical (sid, depth, url)
    n_popped = len(entries)

    keys = [f"{sid}|{u}" for sid, _, u in entries]
    marked = pool_contains(marks_handles, keys)
    already = int(marked.sum())
    cands = [e for e, m in zip(entries, marked) if not m]

    active = [e for e in cands if e[0] not in inactive_sids]
    aband_pre = len(cands) - len(active)

    black_flags = [is_blacklisted(u, blacklist) for _, _, u in active]
    robots_hits = robots.blocked_set(
        {e[2] for e, b in zip(active, black_flags) if not b})
    robots_flags = [
        (not b) and (u in robots_hits)
        for (_, _, u), b in zip(active, black_flags)
    ]

    fetch_urls = sorted({
        u for (_, _, u), b, r in zip(active, black_flags, robots_flags)
        if not b and not r
    })
    info = {
        "n_popped": n_popped,
        "already": already,
        "aband_pre": aband_pre,
        "n_candidates": len(cands),
        "n_active": len(active),
        "n_fetch": len(fetch_urls),
        "hosts": sorted({get_host(u) for u in fetch_urls}),
        "fetch_digest": hashlib.sha256(
            "\n".join(fetch_urls).encode()
        ).hexdigest()[:16],
        "fetch_urls_small": (
            fetch_urls if len(fetch_urls) <= scanner_cap else None
        ),
    }
    range_tables = []
    for sids_k in seed_ranges:
        rows = [
            (e, b, r)
            for e, b, r in zip(active, black_flags, robots_flags)
            if e[0] in sids_k
        ]
        range_tables.append(pa.table({
            "sid": pa.array([e[0] for e, _, _ in rows], pa.int32()),
            "depth": pa.array([e[1] for e, _, _ in rows], pa.int32()),
            "url": pa.array([e[2] for e, _, _ in rows], pa.string()),
            "black": pa.array([b for _, b, _ in rows], pa.bool_()),
            "robots": pa.array([r for _, _, r in rows], pa.bool_()),
        }))
    from ..corpus import host_bucket_of

    h = batch_url_hash64(fetch_urls)
    order = np.argsort(h)
    bks = np.array([host_bucket_of(get_host(u)) for u in fetch_urls],
                   np.int32)
    # (sorted hashes, aligned host buckets): the merge task consumes
    # the hashes; the bucket-split task (above the fetch-broadcast
    # cutoff) consumes both
    fetch_hb = (h[order], bks[order])
    return (info, fetch_hb, *range_tables)


def _merge_hashes(*pairs):
    """One sorted uint64 broadcast array from the per-shard
    (hashes, buckets) pairs (duplicates across shards are harmless to
    searchsorted membership).  Linear in the generation's FETCH set —
    which is bounded by the politeness token budgets (hosts × tokens),
    not the frontier — and 8 bytes/URL, the SURVEY §4 columnar
    frontier representation."""
    if not pairs:
        return np.empty(0, np.uint64)
    return np.sort(np.concatenate([np.asarray(p[0], np.uint64)
                                   for p in pairs]))


def _split_hashes_by_bucket(buckets, *pairs):
    """Per-host-bucket sorted hash arrays from the per-shard
    (hashes, buckets) pairs — the above-cutoff fetch-membership
    structure (pipelines.crawl.FETCH_BROADCAST_CUTOFF): each corpus
    bucket's read ships only its own array, so per-worker membership
    memory is O(fetch / buckets), not O(fetch).  Called with
    ``num_returns=len(buckets)``; returns one array per entry of
    *buckets* (same order)."""
    if not pairs:
        out = [np.empty(0, np.uint64) for _ in buckets]
        return out[0] if len(buckets) == 1 else tuple(out)
    h = np.concatenate([np.asarray(p[0], np.uint64) for p in pairs])
    b = np.concatenate([np.asarray(p[1], np.int32) for p in pairs])
    out = [np.sort(h[b == bk]) for bk in buckets]
    return out[0] if len(buckets) == 1 else tuple(out)


def _build_meta(*blocks):
    """(url, content_hash) lookup arrays, hash-sorted, from the fetched
    dataset's metadata blocks.  Returns ``(meta, n_fetched, urls)`` —
    the driver materializes only ``n_fetched`` (``urls`` only for the
    documented test aids).

    Scale bound: the FETCHED set, like the scheduled set, is bounded
    per generation by the politeness token budgets (hosts x tokens),
    never by the frontier — the same envelope as the fetch-hash
    broadcast (:func:`_merge_hashes`), which is what makes this a
    broadcast-side structure rather than a join."""
    tbls = [b for b in blocks if b.num_rows]
    if not tbls:
        empty = (np.empty(0, np.uint64), np.empty(0, object))
        return empty, 0, []
    t = pa.concat_tables(tbls)
    urls = t.column("url").to_pylist()
    hashes = np.asarray(t.column("content_hash").to_pylist(), object)
    h = batch_url_hash64(urls)
    order = np.argsort(h)
    return (h[order], hashes[order]), len(urls), urls


def _replay_shard(
    meta,
    claims: Set[str],
    shard_states: dict,
    cfg: CrawlSettings,
    delays: Optional[Dict[int, float]],
    hash_handles,
    marks_handles,
    marks_delta_path: str,
    hashes_delta_path: str,
    *cand_tables,
):
    """One seed-range link of the replay claims chain (Ray task).

    Receives its seeds' candidate tables (one piece per frontier
    shard, pre-split by :func:`_prep_shard`), restores the canonical
    (sid, depth, url) order across pieces, attaches fetch outcomes
    from the meta lookup, queries prior-generation content hashes from
    the hash pool, runs the UNCHANGED ``replay_generation`` core, and
    writes its checkpoint delta files — the driver gets back
    ``(counters, shard_states, accepted, propagate, claims_out,
    mark_keys, new_hashes)`` via ``num_returns=7`` and materializes
    only the first two (counters + O(seeds/shard) states); the
    mark/hash key refs feed :func:`_commit_shard` tasks that insert
    into the pools AFTER the whole generation's replay completes
    (keeping a killed-and-retried replay task idempotent — its own
    inserts can never masquerade as prior-generation dups)."""
    from .crawl import _write_delta

    pieces = [t for t in cand_tables if t.num_rows]
    if pieces:
        sub = pa.concat_tables(pieces).sort_by(
            [("sid", "ascending"), ("depth", "ascending"),
             ("url", "ascending")])
    else:
        sub = cand_tables[0] if cand_tables else pa.table({
            "sid": pa.array([], pa.int32()),
            "depth": pa.array([], pa.int32()),
            "url": pa.array([], pa.string()),
            "black": pa.array([], pa.bool_()),
            "robots": pa.array([], pa.bool_()),
        })

    urls = sub.column("url").to_pylist()
    h_meta, hash_meta = meta
    bh = batch_url_hash64(urls)
    idx = np.searchsorted(h_meta, bh)
    idx[idx >= len(h_meta)] = max(len(h_meta) - 1, 0)
    fetched = (
        (h_meta[idx] == bh) if len(h_meta) else np.zeros(len(bh), bool)
    )

    sub_sids = sub.column("sid").to_pylist()
    sub_depths = sub.column("depth").to_pylist()
    black = sub.column("black").to_pylist()
    robots = sub.column("robots").to_pylist()
    cands = [
        Candidate(
            seed_id=s,
            url=u,
            depth=d,
            blacklisted=b or r,
            fetched=bool(f) and not (b or r),
            content_hash=(
                str(hash_meta[i]) if (f and not (b or r)) else None
            ),
        )
        for s, d, u, b, r, f, i in zip(
            sub_sids, sub_depths, urls, black, robots, fetched, idx
        )
    ]

    cand_hashes = sorted({c.content_hash for c in cands if c.content_hash})
    known = pool_contains(hash_handles, cand_hashes)
    known_hashes = {
        h for h, k in zip(cand_hashes, known) if k
    } | set(claims)

    res = replay_generation(cands, shard_states, known_hashes, cfg, delays)

    mark_keys = [f"{s}|{u}" for s, u in res.new_marks]
    # pool inserts do NOT happen here: a replay task killed after
    # inserting would poison its own Ray retry (the re-run's
    # pool_contains would see the dead attempt's hashes as
    # prior-generation dups — the exact failure the chaos test pins).
    # Intra-generation dedup is fully carried by the claims chain;
    # pools only need the new keys before the NEXT generation's
    # prep/replay reads, so the inserts run in :func:`_commit_shard`
    # tasks after this generation's replay links all complete.
    if cfg.chaos_kill_marker:
        # fault injection (chaos tests): exactly one replay task dies
        # by SIGKILL here — AFTER computing its results, BEFORE its
        # checkpoint delta writes.  Ray's task retry re-runs the link
        # from its unchanged input refs; the delta rewrite is
        # deterministic, so the healed generation must be
        # bit-identical (test_crawl pins it).
        _chaos_kill_once(cfg.chaos_kill_marker + ".replay")
    _write_delta(marks_delta_path, mark_keys)
    _write_delta(hashes_delta_path, list(res.new_hashes))

    counters = {
        st: res.status.count(st)
        for st in set(res.status)
    }
    # robots split: BLACKLISTED status whose flag source was robots
    rob = {c.url for c, r in zip(cands, robots) if r}
    counters["robots_blocked"] = sum(
        1 for c, st in zip(cands, res.status)
        if st == BLACKLISTED and c.url in rob
    )

    cand_depth = {(c.seed_id, c.url): c.depth for c in cands}
    cand_hash = {(c.seed_id, c.url): c.content_hash for c in cands}
    acc = sorted(res.accepted)
    accepted_t = pa.table({
        "sid": pa.array([s for s, _ in acc], pa.int32()),
        "url": pa.array([u for _, u in acc], pa.string()),
        "depth": pa.array(
            [cand_depth[k] for k in acc], pa.int32()),
        "content_hash": pa.array(
            [cand_hash[k] for k in acc], pa.string()),
    })
    prop = sorted(res.propagate)
    propagate_t = pa.table({
        "sid": pa.array([s for s, _ in prop], pa.int32()),
        "url": pa.array([u for _, u in prop], pa.string()),
        "depth": pa.array([cand_depth[k] for k in prop], pa.int32()),
    })
    claims_out = set(claims) | set(res.new_hashes)
    return (counters, shard_states, accepted_t, propagate_t, claims_out,
            mark_keys, list(res.new_hashes))


def _chaos_kill_once(marker_path: str) -> None:
    """Fault injection for chaos tests: atomically create the marker
    and SIGKILL this worker process — exactly once per marker across
    all parallel tasks (O_EXCL)."""
    import os
    import signal

    try:
        os.close(os.open(marker_path,
                         os.O_CREAT | os.O_EXCL | os.O_WRONLY))
        os.kill(os.getpid(), signal.SIGKILL)
    except FileExistsError:
        pass


def _commit_shard(cfg: CrawlSettings, marks_handles, hash_handles,
                  mark_keys, new_hashes, _all_links_done=None) -> int:
    """Post-replay pool commit for one replay shard (Ray task): insert
    the generation's new marks/hashes into the seen pools.

    ``_all_links_done`` is an ordering dependency only — the caller
    passes the generation's FINAL claims ref, so Ray cannot schedule
    any commit until every replay link of the generation has returned
    (the claims chain completes in link order).  That enforces the
    invariant the safety argument rests on: no same-generation
    pool_contains read can observe these inserts, which makes a
    SIGKILL-and-retry of this task safe — set-inserts are idempotent
    and nothing consults the pools again until the next generation's
    prep/replay tasks (all gated on this task's completion).  Even
    without the gate the decisions would be unchanged (each link's
    known_hashes is pool ∪ claims, and the claims chain already
    carries every same-generation hash), but the gate makes the
    documented ordering structural rather than incidental."""
    pool_insert(marks_handles, mark_keys)
    pool_insert(hash_handles, new_hashes)
    if cfg.chaos_kill_marker:
        # the nastiest window: pools mutated, commit unacknowledged —
        # the retry re-inserts the same keys (idempotent) and returns
        _chaos_kill_once(cfg.chaos_kill_marker + ".commit")
    return len(mark_keys) + len(new_hashes)


def _build_accept_arrays(*acc_tables):
    """Broadcast arrays for the finalize filter: (url-hash sorted,
    seed_id, depth) parallel arrays from the replay shards' accepted
    tables (ObjectRefs; the result ref feeds ``_finalize`` directly)."""
    tbls = [t for t in acc_tables if t.num_rows]
    if not tbls:
        return (np.empty(0, np.uint64), np.empty(0, np.int32),
                np.empty(0, np.int32))
    t = pa.concat_tables(tbls)
    urls = t.column("url").to_pylist()
    h = batch_url_hash64(urls)
    order = np.argsort(h)
    return (
        h[order],
        t.column("sid").to_numpy(zero_copy_only=False).astype(
            np.int32)[order],
        t.column("depth").to_numpy(zero_copy_only=False).astype(
            np.int32)[order],
    )


def _build_expand_csr(max_depth: int, *prop_tables):
    """CSR broadcast arrays for the data-plane link expansion (the
    exact structure ``_push_links_dataplane``'s expand_task consumes),
    built from the replay shards' propagate tables.  Returns
    ``(csr, n_expand)`` — the driver materializes only the count."""
    tbls = [t for t in prop_tables if t.num_rows]
    if not tbls:
        empty = (np.empty(0, np.uint64), np.empty(0, np.int64),
                 np.empty(0, np.int64), np.empty(0, np.int64),
                 np.empty(0, np.int64))
        return empty, 0
    t = pa.concat_tables(tbls)
    depths = t.column("depth").to_numpy(zero_copy_only=False).astype(
        np.int64)
    keep = depths < max_depth
    if not keep.any():
        empty = (np.empty(0, np.uint64), np.empty(0, np.int64),
                 np.empty(0, np.int64), np.empty(0, np.int64),
                 np.empty(0, np.int64))
        return empty, 0
    kept = t.filter(pa.array(keep))
    sids_all = kept.column("sid").to_numpy(
        zero_copy_only=False).astype(np.int64)
    deps_all = kept.column("depth").to_numpy(
        zero_copy_only=False).astype(np.int64) + 1
    h_all = batch_url_hash64(kept.column("url").to_pylist())
    # group by url HASH (the key expand_task probes): one argsort, run
    # boundaries, CSR starts/counts — fully vectorized, and hash-keyed
    # grouping means a 64-bit collision merges buckets instead of
    # shadowing the second one behind searchsorted's first match
    order = np.argsort(h_all, kind="stable")
    h_s = h_all[order]
    sids = sids_all[order]
    deps = deps_all[order]
    run_start = np.flatnonzero(
        np.concatenate(([True], h_s[1:] != h_s[:-1])))
    counts = np.diff(np.concatenate((run_start, [len(h_s)])))
    return (h_s[run_start], run_start.astype(np.int64),
            counts.astype(np.int64), sids, deps), int(len(h_s))


def _restore_delta(handles, path: str) -> int:
    """Resume-side delta restore (runs as a Ray task): read one
    generation's seen-set delta file(s) — single-file or per-shard
    layout — and insert the keys straight into the pool actors.  Keys
    never transit the driver; the driver holds only file paths and
    per-task counts."""
    from .crawl import _read_delta

    keys = _read_delta(path)
    pool_insert(handles, keys)
    return len(keys)


def _remote_tasks():
    """Ray-remote wrappers, created lazily (module import must not
    require an initialized Ray)."""
    import ray

    from .. import runtime_env

    env = runtime_env()
    return {
        # prep's num_returns is 2 + n_replay — set per call via
        # .options(num_returns=...)
        "prep": ray.remote(num_cpus=0, runtime_env=env)(_prep_shard),
        "mergeh": ray.remote(num_cpus=0, runtime_env=env)(
            _merge_hashes),
        # num_returns is len(buckets) — set per call via .options(...)
        "splith": ray.remote(num_cpus=0, runtime_env=env)(
            _split_hashes_by_bucket),
        "meta": ray.remote(num_cpus=0, num_returns=3,
                           runtime_env=env)(_build_meta),
        "replay": ray.remote(num_cpus=0, num_returns=7,
                             runtime_env=env)(_replay_shard),
        "commit": ray.remote(num_cpus=0, runtime_env=env)(
            _commit_shard),
        "accept": ray.remote(num_cpus=0, runtime_env=env)(
            _build_accept_arrays),
        "expand": ray.remote(num_cpus=0, num_returns=2,
                             runtime_env=env)(_build_expand_csr),
        "restore": ray.remote(num_cpus=0, runtime_env=env)(
            _restore_delta),
    }
