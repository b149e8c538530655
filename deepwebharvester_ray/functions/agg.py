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


def grouped_quantiles(
    ds,
    key: str,
    value_col: str,
    ps: Sequence[float],
    out_cols: Sequence[str],
):
    """Exact per-group discrete quantiles (``percentile_disc`` semantics:
    smallest value whose cumulative fraction ≥ p) over an integer value
    column, without ever collecting a group's raw rows.

    Scale shape: the combiner collapses each batch to a (key, value,
    count) histogram, the single shuffled merge is bounded by the VALUE
    DOMAIN (distinct (key, value) pairs — e.g. prices in cents), not the
    row count, and the quantile pick is one cumsum + searchsorted per
    group.  Cumulative fractions are compared as IEEE doubles
    (``count/n >= p``), matching DuckDB's ``cume_dist`` rule exactly.
    """
    import numpy as np

    assert len(ps) == len(out_cols)

    hist = grouped_agg(ds, [key, value_col], [("__n", "", "count")])

    def pick(batch: pa.Table) -> pa.Table:
        # input sorted by (key, value) — grouped_agg's deterministic order
        keys_arr = batch.column(key).combine_chunks()
        vals = batch.column(value_col).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        cnts = batch.column("__n").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        n_rows = len(vals)
        if n_rows == 0:
            return pa.table(
                {key: keys_arr}
                | {c: pa.array([], pa.int64()) for c in out_cols}
            )
        from .dedup import _run_bounds

        starts, ends = _run_bounds(
            keys_arr.to_numpy(zero_copy_only=False)
        )
        out_keys = keys_arr.take(pa.array(starts))
        cols = {c: [] for c in out_cols}
        for s, e in zip(starts, ends):
            cum = np.cumsum(cnts[s:e], dtype=np.float64)
            frac = cum / cum[-1]
            for p, c in zip(ps, out_cols):
                i = int(np.searchsorted(frac, p, side="left"))
                cols[c].append(int(vals[s:e][min(i, e - s - 1)]))
        return pa.table(
            {key: out_keys}
            | {c: pa.array(v, pa.int64()) for c, v in cols.items()}
        )

    return hist.map_batches(
        pick, batch_format="pyarrow", batch_size=None, runtime_env=runtime_env()
    )
