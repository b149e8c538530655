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


def prefix_scan(ds, key: str, value_col: str, out_col: str = "running",
                shuffle_partitions: int = None):
    """Add ``out_col`` = inclusive running sum of ``value_col`` in global
    ``key`` order.  ``key`` values must be unique (they define the scan
    order, any orderable Arrow type); ``value_col`` must be integral.
    ``shuffle_partitions`` coalesces a many-tiny-block input before the
    sort (which is O(partitions²) block exchanges)."""
    import ray

    if shuffle_partitions:
        ds = ds.repartition(shuffle_partitions)
    srt = ds.sort(key).materialize()

    def block_stats(batch: pa.Table) -> pa.Table:
        ktype = batch.schema.field(key).type
        if batch.num_rows == 0:
            return pa.table(
                {
                    "first_key": pa.array([], ktype),
                    "total": pa.array([], pa.int64()),
                }
            )
        keys = batch.column(key)
        vals = batch.column(value_col).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "first_key": pa.array([keys[0].as_py()], ktype),
                "total": pa.array([int(vals.sum())], pa.int64()),
            }
        )

    stats = srt.map_batches(
        block_stats, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    ).take_all()  # one tiny row per block
    stats.sort(key=lambda r: r["first_key"])
    offsets = {}
    acc = 0
    for r in stats:
        offsets[r["first_key"]] = acc
        acc += r["total"]
    off_ref = ray.put(offsets)

    def add_scan(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(out_col, pa.array([], pa.int64()))
        off = cached_get(off_ref)[batch.column(key)[0].as_py()]
        vals = batch.column(value_col).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        running = np.cumsum(vals, dtype=np.int64) + off
        return batch.append_column(out_col, pa.array(running, pa.int64()))

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
