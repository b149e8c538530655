"""Distributed prefix-scan (running total) and operators built on it.

Ray Data has no scan primitive; the classic two-phase plan the Dataset
API can express:

1. order the input on the scan key (one sort — equal keys co-locate and
   each output partition is one block);
2. a LIGHT pass collects each block's (first_key, block_total) — one tiny
   row per block to the driver;
3. the driver computes exclusive block offsets (a prefix sum over
   #blocks numbers) and broadcasts the first_key→offset map;
4. the final pass adds the block offset to each block's local cumsum —
   no second shuffle, no driver pass over the data.

Driver state is O(#blocks), data passes are two (the stats pass and the
scan pass over the materialized sorted table).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import runtime_env
from ..broadcast import cached_get


def prefix_scan(ds, key: str, value_col, out_col="running",
                shuffle_partitions: int = None):
    """Add ``out_col`` = inclusive running sum of ``value_col`` in global
    ``key`` order.  ``key`` values must be unique (they define the scan
    order, any orderable Arrow type); ``value_col`` must be integral.
    ``value_col`` / ``out_col`` may be parallel LISTS to scan several
    columns in ONE sort + one stats pass (same blocks, same offsets map).
    ``shuffle_partitions`` coalesces a many-tiny-block input before the
    sort (which is O(partitions²) block exchanges)."""
    import ray

    value_cols = [value_col] if isinstance(value_col, str) else list(value_col)
    out_cols = [out_col] if isinstance(out_col, str) else list(out_col)
    assert len(value_cols) == len(out_cols)

    if shuffle_partitions:
        ds = ds.repartition(shuffle_partitions)
    srt = ds.sort(key).materialize()

    def block_stats(batch: pa.Table) -> pa.Table:
        ktype = batch.schema.field(key).type
        if batch.num_rows == 0:
            return pa.table(
                {"first_key": pa.array([], ktype)}
                | {f"total{i}": pa.array([], pa.int64())
                   for i in range(len(value_cols))}
            )
        keys = batch.column(key)
        cols = {"first_key": pa.array([keys[0].as_py()], ktype)}
        for i, vc in enumerate(value_cols):
            vals = batch.column(vc).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            cols[f"total{i}"] = pa.array([int(vals.sum())], pa.int64())
        return pa.table(cols)

    stats = srt.map_batches(
        block_stats, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    ).take_all()  # one tiny row per block
    stats.sort(key=lambda r: r["first_key"])
    offsets = {}
    acc = [0] * len(value_cols)
    for r in stats:
        offsets[r["first_key"]] = tuple(acc)
        acc = [a + r[f"total{i}"] for i, a in enumerate(acc)]
    off_ref = ray.put(offsets)

    def add_scan(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            for oc in out_cols:
                batch = batch.append_column(oc, pa.array([], pa.int64()))
            return batch
        offs = cached_get(off_ref)[batch.column(key)[0].as_py()]
        for vc, oc, off in zip(value_cols, out_cols, offs):
            vals = batch.column(vc).combine_chunks().to_numpy(
                zero_copy_only=False
            )
            running = np.cumsum(vals, dtype=np.int64) + off
            batch = batch.append_column(oc, pa.array(running, pa.int64()))
        return batch

    return srt.map_batches(
        add_scan, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    )


def pack_sequences(
    ds,
    key: str,
    tokens_col: str,
    capacity: int,
    bin_col: str = "bin_id",
    shuffle_partitions: int = None,
):
    """Sequential sequence packing: documents in global ``key`` order are
    laid head-to-tail and cut into fixed-``capacity`` token bins; a doc's
    bin is where its FIRST token lands (``floor(exclusive_prefix /
    capacity)``) — the deterministic streaming form of training-corpus
    context packing, computed with ONE distributed prefix-scan."""

    scanned = prefix_scan(ds, key, tokens_col, out_col="__incl",
                          shuffle_partitions=shuffle_partitions)

    def to_bin(batch: pa.Table) -> pa.Table:
        incl = batch.column("__incl").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        vals = batch.column(tokens_col).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        bins = (incl - vals) // capacity
        return batch.drop_columns(["__incl"]).append_column(
            bin_col, pa.array(bins, pa.int64())
        )

    return scanned.map_batches(
        to_bin, batch_format="pyarrow", runtime_env=runtime_env()
    )


def grouped_prefix_scan(ds, key, group: str, value_col: str,
                        out_col: str = "running",
                        shuffle_partitions: int = None):
    """Add ``out_col`` = inclusive running sum of ``value_col`` in global
    ``key`` order **within each ``group``** — the distributed form of
    ``SUM(v) OVER (PARTITION BY group ORDER BY key)`` without a window
    materialization or a sort on the (possibly low-cardinality) group
    key.  ``key`` may be one column name or a LIST of names (the
    standard ``ORDER BY ts, id`` window form — composite keys that
    don't pack into one int64, e.g. epoch-µs × id); the combined key
    tuple must be globally unique.  ``value_col`` integral.

    Shape: ONE sort on the high-cardinality ``key`` (groups interleave
    freely across blocks — deliberately: a sort on the group key is the
    stratified_sample anti-pattern), a per-(block, group) totals pass
    (one tiny row per group PRESENT in each block), a driver offset
    accumulation in block order, and a broadcast + segmented in-block
    cumsum (argsort on group, run-relative cumulative sums — no Python
    per row).  Driver state is O(blocks × groups-present-per-block):
    sized for low-to-moderate group cardinality (sources, languages,
    event types); vocabulary-sized groups belong in ``grouped_agg``
    pipelines instead (documented envelope)."""
    import ray

    keys = [key] if isinstance(key, str) else list(key)
    if shuffle_partitions:
        ds = ds.repartition(shuffle_partitions)
    srt = ds.sort(keys).materialize()

    def _first_key(batch: pa.Table):
        # lexicographic block position; tuples compare like the sort
        return tuple(batch.column(k)[0].as_py() for k in keys)

    def block_stats(batch: pa.Table) -> pa.Table:
        ktypes = [batch.schema.field(k).type for k in keys]
        gtype = batch.schema.field(group).type
        if batch.num_rows == 0:
            return pa.table(
                {f"fk{i}": pa.array([], t) for i, t in enumerate(ktypes)}
                | {"grp": pa.array([], gtype),
                   "total": pa.array([], pa.int64())})
        g = batch.column(group).to_numpy(zero_copy_only=False)
        v = batch.column(value_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        uniq, inv = np.unique(g, return_inverse=True)
        totals = np.bincount(inv, weights=v).astype(np.int64)
        fk = _first_key(batch)
        return pa.table(
            {f"fk{i}": pa.array([fk[i]] * len(uniq), t)
             for i, t in enumerate(ktypes)}
            | {"grp": pa.array(uniq.tolist(), gtype),
               "total": pa.array(totals, pa.int64())})

    stats = srt.map_batches(
        block_stats, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    ).take_all()  # O(blocks × groups-present) tiny rows
    by_block: dict = {}
    for r in stats:
        fk = tuple(r[f"fk{i}"] for i in range(len(keys)))
        by_block.setdefault(fk, []).append((r["grp"], r["total"]))
    acc: dict = {}
    offsets = {}
    for fk in sorted(by_block):
        offsets[fk] = {g: acc.get(g, 0) for g, _ in by_block[fk]}
        for g, t in by_block[fk]:
            acc[g] = acc.get(g, 0) + t
    off_ref = ray.put(offsets)

    def add_scan(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(out_col, pa.array([], pa.int64()))
        off_map = cached_get(off_ref)[_first_key(batch)]
        g = batch.column(group).to_numpy(zero_copy_only=False)
        v = batch.column(value_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        order = np.argsort(g, kind="stable")
        gs, vs = g[order], v[order]
        csum = np.cumsum(vs, dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])
        sizes = np.diff(np.r_[starts, len(gs)])
        seg_base = np.repeat(
            np.r_[0, csum[starts[1:] - 1]] if len(starts) > 1
            else np.zeros(1, np.int64), sizes)
        seg_off = np.repeat(
            np.asarray([off_map.get(x, 0) for x in gs[starts].tolist()],
                       np.int64), sizes)
        out_sorted = csum - seg_base + seg_off
        out = np.empty(len(g), np.int64)
        out[order] = out_sorted
        return batch.append_column(out_col, pa.array(out, pa.int64()))

    return srt.map_batches(
        add_scan, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    )


SCAN_NEG_INF = -(2**63)   # strict-prefix-max sentinel for "no prefix yet"


def prefix_max_scan(ds, key: str, value_col: str,
                    out_col: str = "running_max", exclusive: bool = False,
                    shuffle_partitions: int = None):
    """Add ``out_col`` = running MAX of ``value_col`` in global ``key``
    order — the max twin of :func:`prefix_scan` (same two-phase
    O(#blocks)-driver-state shape: per-block max stats, driver prefix
    over the tiny block table, broadcast offsets, in-block accumulate).

    ``exclusive=True`` yields the STRICT-prefix max (``SCAN_NEG_INF``
    for the globally first row) — exactly the streaming-watermark
    shape: at each arrival, the largest event time seen in all EARLIER
    arrivals."""
    import ray

    if shuffle_partitions:
        ds = ds.repartition(shuffle_partitions)
    srt = ds.sort(key).materialize()

    def block_stats(batch: pa.Table) -> pa.Table:
        ktype = batch.schema.field(key).type
        if batch.num_rows == 0:
            return pa.table({"first_key": pa.array([], ktype),
                             "bmax": pa.array([], pa.int64())})
        vals = batch.column(value_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        return pa.table({
            "first_key": pa.array([batch.column(key)[0].as_py()], ktype),
            "bmax": pa.array([int(vals.max())], pa.int64()),
        })

    stats = srt.map_batches(
        block_stats, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    ).take_all()
    stats.sort(key=lambda r: r["first_key"])
    offsets = {}
    acc = SCAN_NEG_INF
    for r in stats:
        offsets[r["first_key"]] = acc
        acc = max(acc, int(r["bmax"]))
    off_ref = ray.put(offsets)

    def add_scan(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(out_col, pa.array([], pa.int64()))
        off = cached_get(off_ref)[batch.column(key)[0].as_py()]
        vals = batch.column(value_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        incl = np.maximum.accumulate(vals)
        if exclusive:
            run = np.concatenate(
                ([SCAN_NEG_INF], incl[:-1].astype(np.int64)))
        else:
            run = incl.astype(np.int64)
        run = np.maximum(run, off)
        return batch.append_column(out_col, pa.array(run, pa.int64()))

    return srt.map_batches(
        add_scan, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    )
