"""Distributed as-of join (point-in-time lookup).

Ray Data has no native as-of/range join; the composition here is the
sort-merge form the Dataset API *can* express:

1. tag each side (`right = 0, left = 1`) and union — no join shuffle,
   ONE all-to-all on ``(key, ts, side)``;
2. the sort co-locates every key's rows, time-ordered, with a right row
   at ts == left ts sorting first (inclusive ``right.ts <= left.ts``);
3. one vectorized block pass forward-fills the index of the last right
   row and validates it belongs to the same key — no per-group Python.

Partitioning assumption (documented per the custom-operator contract):
equal sort keys land in one sort partition (Ray's range partitioner
assigns equal keys to one side of every boundary), so a key's timeline
is never split mid-run across the ``batch_size=None`` block boundary.
The output carries the matched right timestamp, which is deterministic
even when several right rows share the greatest qualifying ts.
"""
from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa

from .. import runtime_env


def asof_join(
    left_ds,
    right_ds,
    key: str,
    ts: str,
    left_cols: List[str],
    shuffle_partitions: int = None,
):
    """For each left row, find the greatest ``right.ts <= left.ts`` within
    the same ``key``.  Returns ``left_cols + [key, ts, prev_ts, gap_us]``
    for left rows that matched (inner as-of semantics).

    ``ts`` must be an Arrow timestamp column on both sides (normalized
    to microseconds internally); rows with a null key or ts are dropped
    on both sides — they cannot participate in a point-in-time match.
    """

    def tag(side: int, cols: List[str]):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            # rows with a null key or ts can't participate in a
            # point-in-time match — drop them (documented contract)
            batch = batch.filter(
                pc.and_(
                    pc.is_valid(batch.column(key)),
                    pc.is_valid(batch.column(ts)),
                )
            )
            out = {c: batch.column(c) for c in cols}
            out["__side"] = pa.array(
                np.full(batch.num_rows, side, dtype=np.int8), pa.int8()
            )
            return pa.table(out)

        return fn

    # carry left payload columns through the union; right contributes none
    payload = [c for c in left_cols if c not in (key, ts)]
    wrapper = left_ds.schema()
    types = dict(zip(wrapper.names, wrapper.types))

    from .partition import pa_type_of as _pa_type

    ptypes = {c: _pa_type(types[c]) for c in payload}
    ktype = _pa_type(types[key])
    l_tagged = left_ds.map_batches(
        tag(1, [key, ts] + payload), batch_format="pyarrow",
        runtime_env=runtime_env(),
    )

    def tag_right(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(
            pc.and_(
                pc.is_valid(batch.column(key)),
                pc.is_valid(batch.column(ts)),
            )
        )
        out = {key: batch.column(key), ts: batch.column(ts)}
        for c in payload:  # null-typed filler so union schemas align
            out[c] = pa.nulls(batch.num_rows, ptypes[c])
        out["__side"] = pa.array(
            np.zeros(batch.num_rows, dtype=np.int8), pa.int8()
        )
        return pa.table(out)

    r_tagged = right_ds.map_batches(
        tag_right, batch_format="pyarrow", runtime_env=runtime_env()
    )

    # sort on the key ALONE: equal keys land in one sort partition (range
    # partitioner), so a key's whole timeline is in one block — a composite
    # (key, ts) sort would let a range boundary split a timeline mid-run.
    # (ts, side) ordering happens vectorized inside the block.
    merged = l_tagged.union(r_tagged)
    if shuffle_partitions:
        # the sort is O(partitions²) block exchanges — coalesce
        # many-tiny-block inputs (e.g. a union of wide reads) first
        merged = merged.repartition(shuffle_partitions)
    merged = merged.sort(key)

    def fill_block(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {c: pa.array([], ptypes[c]) for c in payload}
            | {
                key: pa.array([], ktype),
                ts: pa.array([], pa.timestamp("us")),
                "prev_ts": pa.array([], pa.timestamp("us")),
                "gap_us": pa.array([], pa.int64()),
            }
        )
        n = batch.num_rows
        if n == 0:
            return empty
        keys = batch.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        tvals = (
            batch.column(ts).combine_chunks()
            .cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        side = batch.column("__side").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((side, tvals, keys))
        keys, tvals, side = keys[order], tvals[order], side[order]
        idx = np.arange(n, dtype=np.int64)
        # forward-fill the index of the last right-side row; valid iff it
        # shares the key (input is key-sorted, so the last right row before
        # i is in-key exactly when its key matches)
        last_right = np.maximum.accumulate(np.where(side == 0, idx, -1))
        is_left = side == 1
        j = last_right[is_left]
        ok = j >= 0
        ok[ok] &= keys[j[ok]] == keys[is_left][ok]
        sel = idx[is_left][ok]
        jj = j[ok]
        prev = tvals[jj]
        taken = batch.take(pa.array(order[sel]))  # map back to input order
        # canonical output schema for EVERY block (a pandas-block input can
        # surface int64+null payloads as float64 and ts as timestamp[ns];
        # an empty block emits the `empty` types — cast so all agree)
        return pa.table(
            {c: taken.column(c).cast(ptypes[c]) for c in payload}
            | {
                key: taken.column(key).cast(ktype),
                ts: taken.column(ts).cast(pa.timestamp("us")),
                "prev_ts": pa.array(prev, pa.int64()).cast(pa.timestamp("us")),
                "gap_us": pa.array(tvals[sel] - prev, pa.int64()),
            }
        )

    return merged.map_batches(
        fill_block, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    )


def asof_join_forward(
    left_ds,
    right_ds,
    key: str,
    ts: str,
    left_cols: List[str],
    shuffle_partitions: int = None,
):
    """FORWARD as-of: for each left row, the SMALLEST ``right.ts >=
    left.ts`` within the same ``key`` — the LEAD/next-event lookup
    (recrawl "next fetch after this change", attribution "next
    conversion after this click").

    Implemented by TIME NEGATION over :func:`asof_join`: with
    ``ts' = -ts`` the forward condition ``right.ts >= left.ts`` is
    exactly the backward ``right.ts' <= left.ts'`` — inclusivity, key
    scoping, tie behavior and the partitioning contract all carry over
    unchanged, so there is ONE sort-merge kernel to maintain.  Output:
    ``left_cols + [key, ts, next_ts, gap_us]`` with ``gap_us =
    next_ts − ts ≥ 0`` (inner semantics: unmatched left rows drop)."""
    import pyarrow.compute as pc

    def neg(batch: pa.Table) -> pa.Table:
        col = (batch.column(ts).combine_chunks()
               .cast(pa.timestamp("us")).cast(pa.int64()))
        return batch.set_column(
            batch.schema.get_field_index(ts), ts,
            pc.multiply(col, -1).cast(pa.timestamp("us")))

    l_neg = left_ds.map_batches(neg, batch_format="pyarrow",
                                runtime_env=runtime_env())
    r_neg = right_ds.map_batches(neg, batch_format="pyarrow",
                                 runtime_env=runtime_env())
    out = asof_join(l_neg, r_neg, key, ts, left_cols,
                    shuffle_partitions=shuffle_partitions)

    def unneg(batch: pa.Table) -> pa.Table:
        res = {}
        for c in batch.column_names:
            if c == ts or c == "prev_ts":
                col = (batch.column(c).combine_chunks()
                       .cast(pa.timestamp("us")).cast(pa.int64()))
                res["next_ts" if c == "prev_ts" else c] = (
                    pc.multiply(col, -1).cast(pa.timestamp("us")))
            else:
                res[c] = batch.column(c)
        return pa.table(res)

    return out.map_batches(unneg, batch_format="pyarrow",
                           runtime_env=runtime_env())
