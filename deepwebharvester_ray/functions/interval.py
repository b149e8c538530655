"""Distributed interval (range) join: left points matched to every right
interval on the same key with ``start <= ts < end``.

Ray Data has no native range join; a hash join cannot express the
inequality predicate and a naive key-only join explodes on hot keys
before filtering.  The composition here is bucketed sort-merge, the
standard shape for bounded-selectivity range joins:

1. pick a time-bucket width ``bucket_us``; each LEFT point lands in
   exactly one bucket, each RIGHT interval is replicated into every
   bucket it overlaps (vectorized repeat/cumsum expansion — intervals
   much longer than the bucket width fan out proportionally, so size
   ``bucket_us`` near the typical interval length);
2. tag + union both sides and run ONE all-to-all sort on
   ``(key, bucket)`` — equal composite keys land in one sort partition
   (range partitioner), so a (key, bucket) group is never split;
3. one vectorized block pass: lexsort puts each group's intervals
   (by start) and points (by ts) in one timeline with a right row
   sorting first at equal time (inclusive ``start <= ts``); an
   exclusive prefix-count of right rows gives, for every left point,
   how many in-group intervals have ``start <= ts``; pairs are emitted
   with one repeat/arange expansion and filtered on ``end > ts``.

A left point in bucket ``b`` only matches interval copies in bucket
``b``, and an interval overlapping ``b`` has exactly one copy there —
so every qualifying (point, interval) pair is emitted exactly once, no
dedup pass.

Scale guard: a (key, bucket) group with more than ``max_run`` interval
copies is SKIPPED (its points emit nothing) — same documented
hot-bucket contract as simhash/ngram pair emission; the expansion is
otherwise O(matching-candidate pairs) within a bucket, which is the
join's own output order of magnitude.

Reference parity: the reference engine has no range join; this is part
of the training-data operator library (event attribution / session
containment) the survey scopes in alongside the as-of join
(functions/asof.py).
"""
from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa

from .. import runtime_env

US_PER_DAY = 86_400_000_000


def interval_join(
    left_ds,
    right_ds,
    key: str,
    ts: str,
    start: str,
    end: str,
    left_cols: List[str],
    right_cols: List[str],
    bucket_us: int = US_PER_DAY,
    shuffle_partitions: int = None,
    max_run: int = 65536,
):
    """Inner range join: for each left row, every right row with the same
    ``key`` and ``start <= ts < end`` (end exclusive).

    Returns ``left_cols + [key, ts] + right_cols + [start, end]``.
    ``ts``/``start``/``end`` must be Arrow timestamp columns (normalized
    to microseconds); rows with a null key/time and degenerate intervals
    (``end <= start``) are dropped — they cannot match.
    """
    l_payload = [c for c in left_cols if c not in (key, ts)]
    r_payload = [c for c in right_cols if c not in (key, start, end)]
    overlap = set(l_payload) & set(r_payload)
    if overlap:
        raise ValueError(f"ambiguous output columns: {sorted(overlap)}")

    from .partition import pa_type_of as _pa_type

    lsch = left_ds.schema()
    rsch = right_ds.schema()
    ltypes = dict(zip(lsch.names, lsch.types))
    rtypes = dict(zip(rsch.names, rsch.types))
    ptypes = {c: _pa_type(ltypes[c]) for c in l_payload}
    ptypes.update({c: _pa_type(rtypes[c]) for c in r_payload})
    ktype = _pa_type(ltypes[key])

    US = pa.timestamp("us")

    def tag_left(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(
            pc.and_(pc.is_valid(batch.column(key)),
                    pc.is_valid(batch.column(ts)))
        )
        t = (batch.column(ts).combine_chunks().cast(US).cast(pa.int64())
             .to_numpy(zero_copy_only=False))
        out = {key: batch.column(key).cast(ktype)}
        out["__b"] = pa.array(t // bucket_us, pa.int64())
        out["__t"] = pa.array(t, pa.int64())
        out["__e"] = pa.nulls(batch.num_rows, pa.int64())
        out["__side"] = pa.array(
            np.ones(batch.num_rows, dtype=np.int8), pa.int8()
        )
        for c in l_payload:
            out[c] = batch.column(c).cast(ptypes[c])
        for c in r_payload:
            out[c] = pa.nulls(batch.num_rows, ptypes[c])
        return pa.table(out)

    def tag_right(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(
            pc.and_(
                pc.and_(pc.is_valid(batch.column(key)),
                        pc.is_valid(batch.column(start))),
                pc.is_valid(batch.column(end)),
            )
        )
        s = (batch.column(start).combine_chunks().cast(US).cast(pa.int64())
             .to_numpy(zero_copy_only=False))
        e = (batch.column(end).combine_chunks().cast(US).cast(pa.int64())
             .to_numpy(zero_copy_only=False))
        live = e > s  # degenerate [s, e<=s) can never contain a point
        if not live.all():
            batch = batch.filter(pa.array(live))
            s, e = s[live], e[live]
        # replicate into every overlapped bucket (end exclusive)
        b0 = s // bucket_us
        nb = ((e - 1) // bucket_us - b0 + 1).astype(np.int64)
        tot = int(nb.sum())
        if tot == 0:  # batch filtered empty — skip the repeat expansion
            return pa.table(
                {key: pa.array([], ktype),
                 "__b": pa.array([], pa.int64()),
                 "__t": pa.array([], pa.int64()),
                 "__e": pa.array([], pa.int64()),
                 "__side": pa.array([], pa.int8())}
                | {c: pa.array([], ptypes[c]) for c in l_payload}
                | {c: pa.array([], ptypes[c]) for c in r_payload}
            )
        ri = np.repeat(np.arange(len(s), dtype=np.int64), nb)
        off = np.concatenate(([0], np.cumsum(nb)[:-1]))
        slot = np.arange(tot, dtype=np.int64) - np.repeat(off, nb)
        rep = batch.take(pa.array(ri))
        out = {key: rep.column(key).cast(ktype)}
        out["__b"] = pa.array(b0[ri] + slot, pa.int64())
        out["__t"] = pa.array(s[ri], pa.int64())  # sort time = start
        out["__e"] = pa.array(e[ri], pa.int64())
        out["__side"] = pa.array(np.zeros(tot, dtype=np.int8), pa.int8())
        for c in l_payload:
            out[c] = pa.nulls(tot, ptypes[c])
        for c in r_payload:
            out[c] = rep.column(c).cast(ptypes[c])
        return pa.table(out)

    l_tagged = left_ds.map_batches(
        tag_left, batch_format="pyarrow", runtime_env=runtime_env()
    )
    r_tagged = right_ds.map_batches(
        tag_right, batch_format="pyarrow", runtime_env=runtime_env()
    )
    merged = l_tagged.union(r_tagged)
    if shuffle_partitions:
        # the sort is O(partitions²) block exchanges — coalesce
        # many-tiny-block inputs first (CLAUDE.md discipline)
        merged = merged.repartition(shuffle_partitions)
    merged = merged.sort([key, "__b"])

    empty = pa.table(
        {c: pa.array([], ptypes[c]) for c in l_payload}
        | {key: pa.array([], ktype), ts: pa.array([], US)}
        | {c: pa.array([], ptypes[c]) for c in r_payload}
        | {start: pa.array([], US), end: pa.array([], US)}
    )

    def match_block(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return empty
        keys = batch.column(key).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        b = batch.column("__b").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        t = batch.column("__t").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        e = batch.column("__e").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        side = batch.column("__side").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        # groups = (key, __b) runs; within a run order by time with the
        # right side (0) first at equal time → inclusive start <= ts
        order = np.lexsort((side, t, b, keys))
        keys, b, t, e, side = (
            keys[order], b[order], t[order], e[order], side[order]
        )
        newg = np.empty(n, dtype=bool)
        newg[0] = True
        newg[1:] = (keys[1:] != keys[:-1]) | (b[1:] != b[:-1])
        rid = np.cumsum(newg) - 1  # run id per position
        run_start = np.flatnonzero(newg)  # position of each run's start
        is_right = side == 0
        # exclusive prefix-count of right rows
        cr = np.cumsum(is_right) - is_right
        run_base = cr[run_start]  # rights before each run
        n_runs = len(run_start)
        run_rights = np.empty(n_runs, dtype=np.int64)
        run_rights[:-1] = run_base[1:] - run_base[:-1]
        run_rights[-1] = cr[-1] + int(is_right[-1]) - run_base[-1]
        rpos = np.flatnonzero(is_right)  # rights in (group, start) order

        lefts = np.flatnonzero(~is_right)
        if len(lefts) == 0:
            return empty
        # hot-group guard: skip groups with more interval copies than
        # max_run (documented contract; emission is O(candidates) within
        # a group, quadratic only if every interval covers every point)
        lefts = lefts[run_rights[rid[lefts]] <= max_run]
        k = cr[lefts] - run_base[rid[lefts]]  # rights with start <= ts
        pos = k > 0
        lefts, k = lefts[pos], k[pos]
        if len(lefts) == 0:
            return empty
        tot = int(k.sum())
        li = np.repeat(lefts, k)
        off = np.concatenate(([0], np.cumsum(k)[:-1]))
        slot = np.arange(tot, dtype=np.int64) - np.repeat(off, k)
        ri = rpos[np.repeat(run_base[rid[lefts]], k) + slot]
        live = e[ri] > t[li]  # end exclusive
        li, ri = li[live], ri[live]
        if len(li) == 0:
            return empty
        ltab = batch.take(pa.array(order[li]))
        rtab = batch.take(pa.array(order[ri]))
        return pa.table(
            {c: ltab.column(c).cast(ptypes[c]) for c in l_payload}
            | {
                key: ltab.column(key).cast(ktype),
                ts: pa.array(t[li], pa.int64()).cast(US),
            }
            | {c: rtab.column(c).cast(ptypes[c]) for c in r_payload}
            | {
                start: pa.array(t[ri], pa.int64()).cast(US),
                end: pa.array(e[ri], pa.int64()).cast(US),
            }
        )

    return merged.map_batches(
        match_block, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    )
