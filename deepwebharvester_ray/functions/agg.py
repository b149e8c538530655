"""Combiner-style grouped aggregation (partial aggregation before the
shuffle).

Ray Data's native ``groupby().aggregate()`` sort-shuffles EVERY input row
on the group key before reducing.  For bounded-cardinality keys (report
rollups: risk labels, event types, market segments, (hour, type) windows
— reference report.py:315-320, cli.py:305-320) that is an all-to-all
exchange of N rows to produce a handful of groups.  The scale-correct
plan is the classic combiner:

1. **partial** — inside ``map_batches``, collapse each batch to one row
   per key with ``pyarrow.TableGroupBy`` (vectorized C++ hash
   aggregation, zero Python per row);
2. **final** — coalesce the tiny partials (``repartition``) and run one
   more vectorized group-by to merge them (sum of sums, sum of counts,
   min of mins, max of maxes).

Shuffle volume drops from O(rows) to O(blocks × distinct_keys).  The
single-block final is valid while distinct keys fit one block (≲10⁷ —
true for every report/rollup aggregate here even at 100 TB input, where
keys are enums/hours/users).  For genuinely high-cardinality keys
(content_hash exact dedup, candidate pairs) use the native groupby — a
combiner cannot shrink those.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import pyarrow as pa

from .. import runtime_env

# spec: (output_column, input_column, kind); kind ∈ {sum, count, min, max}.
# count ignores input_column (counts rows).
AggSpec = Tuple[str, str, str]

_FINAL_KIND = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def _apply(batch: pa.Table, keys: Sequence[str], aggs, out_names) -> pa.Table:
    """One vectorized hash-aggregation pass; output = out_names + keys."""
    res = batch.group_by(list(keys)).aggregate(aggs)
    # pyarrow returns key columns first, then aggregates in request order
    return res.rename_columns(list(keys) + list(out_names))


def grouped_agg(ds, keys: Sequence[str], specs: Sequence[AggSpec]):
    """ds.groupby(keys).aggregate(...) with partial (per-batch) combining.

    Returns a Dataset with columns ``keys + [out for out, _, _ in specs]``,
    sorted by ``keys`` (deterministic output order).  The final merge runs
    in ONE block — see module docstring for the cardinality cutoff (a
    multi-block final would split keys across blocks and double-count).
    """
    keys = list(keys)
    part_cols = [f"__p{i}" for i in range(len(specs))]

    partial_aggs = [
        ([], "count_all") if kind == "count" else (col, kind)
        for (_, col, kind) in specs
    ]
    final_aggs = [
        (p, _FINAL_KIND[kind]) for p, (_, _, kind) in zip(part_cols, specs)
    ]
    out_cols = [out for (out, _, _) in specs]

    def partial(batch: pa.Table) -> pa.Table:
        return _apply(batch, keys, partial_aggs, part_cols)

    def final(batch: pa.Table) -> pa.Table:
        merged = _apply(batch, keys, final_aggs, out_cols)
        merged = merged.sort_by([(k, "ascending") for k in keys])
        return merged.select(keys + out_cols)

    partials = ds.map_batches(
        partial, batch_format="pyarrow", runtime_env=runtime_env()
    )
    return partials.repartition(1).map_batches(
        final, batch_format="pyarrow", batch_size=None, runtime_env=runtime_env()
    )
