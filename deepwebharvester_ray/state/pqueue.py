"""Frontier priority queue (north-rule component: "priority queue").

Holds not-yet-scheduled frontier entries ``(seed_id, depth, url)`` with
deterministic priority ``(depth, url)`` per seed — BFS order first, then
lexicographic URL (the engine's canonical order, SURVEY §2.9).  Supports

* per-seed **budgeted pops** (politeness: schedule at most k URLs per seed
  per generation, defer the rest — the reference instead abandons overflow
  at the ``max_pages`` cutoff, crawler.py:237),
* **bounded capacity** per seed with deterministic worst-first overflow
  drops (bounded per-actor queues from the north star; drops are counted,
  never silent),
* **snapshot / restore** for checkpointing alongside the seen-set shards.

``FrontierQueue`` is the single-process core; ``ShardedFrontierQueue``
wraps it in a Ray actor pool sharded by ``seed_id`` (at 10^10-frontier
scale: by ``hash(host)``, co-partitioned with the corpus buckets so a
shard's pops feed its own fetch partition — SURVEY §7.4).
"""
from __future__ import annotations

import heapq
from typing import Dict, Iterable, List, Optional, Set, Tuple

import pyarrow as pa
import pyarrow.parquet as pq

Entry = Tuple[int, int, str]  # (seed_id, depth, url)


def _entries_to_parquet(rows: List[Entry], path: str) -> None:
    pq.write_table(
        pa.table(
            {
                "seed_id": pa.array([r[0] for r in rows], pa.int32()),
                "depth": pa.array([r[1] for r in rows], pa.int32()),
                "url": pa.array([r[2] for r in rows], pa.string()),
            }
        ),
        path,
    )


def _parquet_to_entries(path: str) -> List[Entry]:
    t = pq.read_table(path)
    return list(
        zip(
            t.column("seed_id").to_pylist(),
            t.column("depth").to_pylist(),
            t.column("url").to_pylist(),
        )
    )


class FrontierQueue:
    """Deterministic per-seed priority queue over frontier entries."""

    def __init__(self, max_per_seed: Optional[int] = None) -> None:
        self._heaps: Dict[int, List[Tuple[int, str]]] = {}
        self._members: Set[Tuple[int, str]] = set()
        self._max = max_per_seed
        self.dropped = 0

    def __len__(self) -> int:
        return sum(len(h) for h in self._heaps.values())

    def push(self, entries: Iterable[Entry]) -> None:
        over: Set[int] = set()
        for sid, depth, url in entries:
            key = (sid, url)
            if key in self._members:
                continue  # frontier dedup: first push wins (lowest depth)
            heap = self._heaps.setdefault(sid, [])
            heapq.heappush(heap, (depth, url))
            self._members.add(key)
            if self._max is not None and len(heap) > self._max:
                over.add(sid)
        # Bounded-capacity overflow: trim ONCE per batch per seed.
        # Keeping the max_per_seed SMALLEST of the union is
        # order-independent and equals per-push evict-worst, but costs
        # O(n log n) per batch instead of O(cap) scan + O(cap) heapify
        # per push (quadratic under sustained mega-host ingestion inside
        # a num_cpus=0 control-plane actor).  Callers push canonically
        # sorted batches (commit()/the driver loop), so the shallowest
        # duplicate of a url still wins the first-push dedup above.
        for sid in over:
            srt = sorted(self._heaps[sid])
            keep, drop = srt[: self._max], srt[self._max:]
            self._heaps[sid] = keep  # ascending list IS a valid heap
            for _, u in drop:
                self._members.discard((sid, u))
            self.dropped += len(drop)

    def pop_budget(
        self, budget_per_seed: Optional[int] | Dict[int, int] = None
    ) -> List[Entry]:
        """Pop up to *budget_per_seed* entries per seed (all if None), in
        canonical (seed_id, depth, url) order.

        A ``dict`` budget maps seed_id → that seed's budget (politeness
        tokens: a host with crawl-delay D gets ⌊generation_wallclock/D⌋
        scheduled fetches per generation — SURVEY §4); seeds absent from
        the map are unbudgeted.  The budget is enforced HERE, at pop
        time, so on the sharded queue each shard actor paces its own
        hosts without any driver involvement."""
        out: List[Entry] = []
        is_map = isinstance(budget_per_seed, dict)
        for sid in sorted(self._heaps):
            heap = self._heaps[sid]
            b = budget_per_seed.get(sid) if is_map else budget_per_seed
            n = len(heap) if b is None else min(b, len(heap))
            for _ in range(n):
                depth, url = heapq.heappop(heap)
                self._members.discard((sid, url))
                out.append((sid, depth, url))
            if not heap:
                del self._heaps[sid]
        out.sort()
        return out

    def drop_seeds(self, sids: Iterable[int]) -> int:
        """Remove ALL queued entries for the given seeds in one step (an
        exhausted seed's entries can never be scheduled — draining them
        at budget pace would cost O(queue/budget) no-op generations,
        each paying a full frontier checkpoint).  Returns the number
        removed; callers count them as abandoned."""
        n = 0
        for sid in sids:
            heap = self._heaps.pop(sid, None)
            if heap:
                for _, u in heap:
                    self._members.discard((sid, u))
                n += len(heap)
        return n

    def snapshot_list(self) -> List[Entry]:
        out: List[Entry] = []
        for sid, heap in self._heaps.items():
            out.extend((sid, d, u) for d, u in heap)
        out.sort()
        return out

    def restore_list(self, entries: Iterable[Entry]) -> None:
        self._heaps.clear()
        self._members.clear()
        self.push([tuple(e) for e in entries])

    def snapshot_parquet(self, path: str) -> None:
        _entries_to_parquet(self.snapshot_list(), path)

    def restore_parquet(self, path: str) -> None:
        self.restore_list(_parquet_to_entries(path))


class ShardedFrontierQueue:
    """Ray-actor shard pool over :class:`FrontierQueue` (cluster path).

    Sharded by ``seed_id % n_shards`` (single-node tests) — at full scale
    the shard key is ``hash(host)`` so each shard co-locates with its
    corpus partition.  All actor calls are batched; pops merge-sort across
    shards deterministically.

    **Staged pushes** are the data-plane link-expansion protocol: fetch
    tasks call ``stage()`` on shard handles concurrently (arrival order is
    nondeterministic), and the driver's ``commit_staged()`` barrier makes
    each shard SORT its staging buffer before pushing — so the applied
    order is canonical (depth-then-url, lowest depth winning frontier
    dedup) no matter how tasks interleaved.  Link entries therefore flow
    worker→shard as batches; the driver sees only counts.

    **Checkpointing is per-shard**: ``snapshot_parquet(path)`` has every
    shard write its own ``<path>.shard<i>`` file — frontier bytes never
    transit the driver (at a 10^10 frontier a driver gather would be the
    dominant checkpoint cost).
    """

    def __init__(self, n_shards: int = 2, max_per_seed: Optional[int] = None) -> None:
        import ray

        from .. import runtime_env

        @ray.remote(num_cpus=0, runtime_env=runtime_env())
        class _Shard:
            def __init__(self, max_per_seed):
                self._q = FrontierQueue(max_per_seed)
                self._staged: List[Entry] = []

            def push(self, entries):
                self._q.push(entries)
                return len(self._q)

            def stage(self, entries):
                self._staged.extend(tuple(e) for e in entries)
                return len(self._staged)

            def commit(self):
                ents = sorted(self._staged)
                self._staged.clear()
                self._q.push(ents)
                return len(self._q)

            def pop_budget(self, budget):
                return self._q.pop_budget(budget)

            def drop_seeds(self, sids):
                return self._q.drop_seeds(sids)

            def size(self):
                return len(self._q)

            def dropped(self):
                return self._q.dropped

            def set_dropped(self, n):
                self._q.dropped = n

            def snapshot(self):
                return self._q.snapshot_list()

            def snapshot_file(self, path):
                _entries_to_parquet(self._q.snapshot_list(), path)
                return len(self._q)

            def restore(self, entries):
                self._q.restore_list(entries)
                return len(self._q)

            def restore_file(self, path):
                self._q.restore_list(_parquet_to_entries(path))
                return len(self._q)

        self._n = n_shards
        self._shards = [_Shard.remote(max_per_seed) for _ in range(n_shards)]

    @property
    def n_shards(self) -> int:
        return self._n

    @property
    def shard_handles(self):
        """Actor handles for data-plane tasks to ``stage()`` against
        (route by ``seed_id % n_shards``)."""
        return list(self._shards)

    def commit_staged(self) -> int:
        import ray

        return sum(ray.get([s.commit.remote() for s in self._shards]))

    def set_dropped(self, n: int) -> None:
        import ray

        ray.get(self._shards[0].set_dropped.remote(n))

    def snapshot_parquet(self, path: str) -> None:
        import ray

        ray.get(
            [
                s.snapshot_file.remote(f"{path}.shard{i}")
                for i, s in enumerate(self._shards)
            ]
        )

    def restore_parquet(self, path: str) -> None:
        import glob as _glob

        import ray

        files = sorted(_glob.glob(f"{path}.shard*"))
        if len(files) != self._n:
            raise ValueError(
                f"frontier shard count changed across resume: "
                f"{len(files)} snapshot files for {self._n} shards"
            )
        ray.get(
            [
                self._shards[i].restore_file.remote(f"{path}.shard{i}")
                for i in range(self._n)
            ]
        )

    def _route(self, entries: Iterable[Entry]) -> Dict[int, List[Entry]]:
        routed: Dict[int, List[Entry]] = {}
        for e in entries:
            routed.setdefault(e[0] % self._n, []).append(e)
        return routed

    def push(self, entries: Iterable[Entry]) -> None:
        import ray

        routed = self._route(entries)
        ray.get([self._shards[i].push.remote(es) for i, es in routed.items()])

    def _split_budget(self, budget):
        """Route a per-seed budget map to owning shards (whole scalar /
        None passes through) so each RPC carries only its shard's
        entries."""
        if not isinstance(budget, dict):
            return [budget] * self._n
        parts: List[Dict[int, int]] = [{} for _ in range(self._n)]
        for sid, b in budget.items():
            parts[sid % self._n][sid] = b
        return parts

    def pop_budget(
        self, budget_per_seed: Optional[int] | Dict[int, int] = None
    ) -> List[Entry]:
        import ray

        split = self._split_budget(budget_per_seed)
        parts = ray.get(
            [s.pop_budget.remote(b)
             for s, b in zip(self._shards, split)]
        )
        out = [tuple(e) for part in parts for e in part]
        out.sort()
        return out

    def pop_budget_refs(
        self, budget_per_seed: Optional[int] | Dict[int, int] = None
    ):
        """Per-shard budgeted pops as ObjectRefs — the data-plane control
        path: popped entries never transit the driver; downstream tasks
        receive the refs and Ray resolves them in place.  Per-seed
        budget maps (politeness tokens) are enforced INSIDE each shard
        actor."""
        split = self._split_budget(budget_per_seed)
        return [s.pop_budget.remote(b)
                for s, b in zip(self._shards, split)]

    def drop_seeds(self, sids: Iterable[int]) -> int:
        import ray

        routed: Dict[int, List[int]] = {}
        for sid in sids:
            routed.setdefault(sid % self._n, []).append(sid)
        if not routed:
            return 0
        return sum(ray.get(
            [self._shards[i].drop_seeds.remote(ss)
             for i, ss in routed.items()]
        ))

    def __len__(self) -> int:
        import ray

        return sum(ray.get([s.size.remote() for s in self._shards]))

    def dropped(self) -> int:
        import ray

        return sum(ray.get([s.dropped.remote() for s in self._shards]))

    def snapshot_list(self) -> List[Entry]:
        import ray

        parts = ray.get([s.snapshot.remote() for s in self._shards])
        out = [tuple(e) for part in parts for e in part]
        out.sort()
        return out

    def restore_list(self, entries: Iterable[Entry]) -> None:
        import ray

        routed = self._route(entries)
        ray.get(
            [self._shards[i].restore.remote(es) for i, es in routed.items()]
        )
