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
keys are enums/hours/users).  For genuinely high-cardinality keys the
final merge AUTO-SWITCHES to Ray's native hash-shuffle groupby over the
(already combined) partials: :func:`grouped_agg` counts the partial rows
(that count IS the size the single merged block would be) and, above
``SINGLE_BLOCK_CUTOFF``, runs the distributed final instead — same
result, sorted by keys either way.  Callers whose downstream pass needs
the one-block guarantee (grouped_quantiles' per-group cumsum) pin
``final_mode="single"``.
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
    """One vectorized hash-aggregation pass; output = keys + out_names."""
    res = batch.group_by(list(keys)).aggregate(aggs)
    # select columns BY NAME (pyarrow's documented "{col}_{kind}" naming),
    # not positionally — the key/aggregate column order has differed across
    # pyarrow versions, and a positional rename would silently mislabel
    # keys as aggregate values while keeping oracle-matching names
    agg_names = [
        kind if col == [] else f"{col}_{kind}" for (col, kind) in aggs
    ]
    res = res.select(list(keys) + agg_names)
    return res.rename_columns(list(keys) + list(out_names))


# Above this many partial rows the single merged final block would be too
# large (10⁷ keys × ~50 B ≈ 500 MB); the final merge switches to the
# native hash-shuffle groupby over the partials instead.
SINGLE_BLOCK_CUTOFF = 4_000_000


def grouped_agg(ds, keys: Sequence[str], specs: Sequence[AggSpec],
                final_mode: str = "auto", sorted_output: bool = True):
    """ds.groupby(keys).aggregate(...) with partial (per-batch) combining.

    Returns a Dataset with columns ``keys + [out for out, _, _ in specs]``,
    sorted by ``keys`` (deterministic output order).  Pass
    ``sorted_output=False`` when a downstream order-insensitive consumer
    (a top-k, a count, another aggregate) follows — the native path's
    trailing key sort is a full all-to-all of the RESULT table and at
    ~10⁷ groups costs as much as the aggregation itself (measured on
    the adamic_adar 800k-node stress: the pairs table's final sort
    dominated the stage).

    ``final_mode``:

    * ``"single"`` — merge all partials in ONE block (valid while partial
      rows fit one block; required by downstream passes that assume the
      whole result is one key-sorted batch, e.g. grouped_quantiles).
    * ``"native"`` — Ray's hash-shuffle groupby over the partials (the
      high-cardinality path; shuffle volume is the combined partials, not
      the input rows).
    * ``"auto"`` (default) — materialize the (tiny) partials, count their
      rows — that count is exactly the single merged block's size — and
      pick ``single`` below :data:`SINGLE_BLOCK_CUTOFF`, else ``native``.
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
        partial, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    )

    mode = final_mode
    if mode == "auto":
        # partials are O(blocks × keys-per-block) — tiny vs the input —
        # so materializing them to learn the merge size is cheap, and the
        # single-block path re-reads them from the object store for free
        partials = partials.materialize()
        mode = "single" if partials.count() <= SINGLE_BLOCK_CUTOFF else "native"

    if mode == "single":
        return partials.repartition(1).map_batches(
            final, batch_format="pyarrow", batch_size=None,
            runtime_env=runtime_env(),
        )

    # native final: hash-shuffle groupby over the combined partials, then a
    # rename (Ray names outputs "sum(__p0)") and a key sort for the same
    # deterministic order as the single-block path
    import ray.data.aggregate as ray_agg

    _CLS = {"sum": ray_agg.Sum, "min": ray_agg.Min, "max": ray_agg.Max}
    native_aggs = [_CLS[fk](p) for (p, fk) in final_aggs]
    res = partials.groupby(keys).aggregate(*native_aggs)
    ray_names = [f"{fk}({p})" for (p, fk) in final_aggs]

    def rename(batch: pa.Table) -> pa.Table:
        m = dict(zip(ray_names, out_cols))
        return batch.rename_columns(
            [m.get(c, c) for c in batch.column_names]
        ).select(keys + out_cols)

    out = res.map_batches(
        rename, batch_format="pyarrow", runtime_env=runtime_env()
    )
    return out.sort(keys) if sorted_output else out


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

    # "single" pinned: pick() needs the whole key-sorted histogram in ONE
    # block (the value-domain bound is this operator's documented contract)
    hist = grouped_agg(ds, [key, value_col], [("__n", "", "count")],
                       final_mode="single")

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


def column_profile(ds, int_cols: Sequence[str], str_cols: Sequence[str]):
    """Per-column profiling audit — the ANALYZE / data-quality sweep run
    before committing a table to a training pipeline: for each column,
    ``(col, n_rows, n_null, n_distinct, min_s, max_s)`` with min/max
    compared in the NATIVE domain (int64 for ``int_cols`` — a
    lexicographic string min would rank "10" < "9") and rendered as
    canonical strings only at the end (``str(int)`` == SQL
    ``CAST(BIGINT AS VARCHAR)``).

    Shape: one combiner pass emits ONE stats row per column per block
    (shuffle volume O(blocks × columns)); exact ``n_distinct`` is the
    two-level-distinct plan (per-block distinct values → grouped count),
    whose exchange is the per-block distinct stream — profiling a unique
    key therefore costs a full exchange of that column, exactly what SQL
    ``COUNT(DISTINCT pk)`` costs.  Returns a driver-side
    ``pyarrow.Table`` (one row per column — bounded).

    Caller pre-normalizes ``int_cols`` to int64 (cents/epoch-days) so
    engine and oracle agree bit-for-bit.
    """
    import numpy as np
    import pyarrow.compute as pc

    int_cols, str_cols = list(int_cols), list(str_cols)
    all_cols = int_cols + str_cols

    def stats_partial(batch: pa.Table) -> pa.Table:
        names, ns, nulls = [], [], []
        mins_i, maxs_i, mins_s, maxs_s = [], [], [], []
        for c in all_cols:
            col = batch.column(c)
            names.append(c)
            ns.append(batch.num_rows)
            nulls.append(col.null_count)
            if col.length() == col.null_count:
                mm = {"min": None, "max": None}
            else:
                s = pc.min_max(col)
                mm = {"min": s["min"].as_py(), "max": s["max"].as_py()}
            if c in int_cols:
                mins_i.append(mm["min"]); maxs_i.append(mm["max"])
                mins_s.append(None); maxs_s.append(None)
            else:
                mins_i.append(None); maxs_i.append(None)
                mins_s.append(mm["min"]); maxs_s.append(mm["max"])
        return pa.table({
            "col": pa.array(names, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "n_null": pa.array(nulls, pa.int64()),
            "min_i": pa.array(mins_i, pa.int64()),
            "max_i": pa.array(maxs_i, pa.int64()),
            "min_s": pa.array(mins_s, pa.string()),
            "max_s": pa.array(maxs_s, pa.string()),
        })

    def distinct_partial(batch: pa.Table) -> pa.Table:
        names, vals = [], []
        for c in all_cols:
            col = batch.column(c).combine_chunks().drop_null()
            if len(col) == 0:
                continue
            if c in int_cols:
                u = np.unique(col.cast(pa.int64()).to_numpy(
                    zero_copy_only=False))
                sv = np.char.mod("%d", u).tolist()
            else:
                sv = pc.unique(col).to_pylist()
            names.extend([c] * len(sv))
            vals.extend(sv)
        return pa.table({
            "col": pa.array(names, pa.string()),
            "v": pa.array(vals, pa.string()),
        })

    stats = grouped_agg(
        ds.map_batches(stats_partial, batch_format="pyarrow",
                       batch_size=None, runtime_env=runtime_env()),
        ["col"],
        [("n_rows", "n", "sum"), ("n_null", "n_null", "sum"),
         ("min_i", "min_i", "min"), ("max_i", "max_i", "max"),
         ("min_s", "min_s", "min"), ("max_s", "max_s", "max")],
    )
    pairs = ds.map_batches(distinct_partial, batch_format="pyarrow",
                           batch_size=None, runtime_env=runtime_env())
    ndv = grouped_agg(
        grouped_agg(pairs, ["col", "v"], [("n", "", "count")]),
        ["col"], [("n_distinct", "", "count")],
    )
    srows = {r["col"]: r for r in stats.take_all()}
    drows = {r["col"]: r["n_distinct"] for r in ndv.take_all()}
    out = {"col": [], "n_rows": [], "n_null": [], "n_distinct": [],
           "min_s": [], "max_s": []}
    for c in sorted(all_cols):
        r = srows[c]
        out["col"].append(c)
        out["n_rows"].append(r["n_rows"])
        out["n_null"].append(r["n_null"])
        out["n_distinct"].append(drows.get(c, 0))
        if c in int_cols:
            out["min_s"].append(
                None if r["min_i"] is None else str(int(r["min_i"])))
            out["max_s"].append(
                None if r["max_i"] is None else str(int(r["max_i"])))
        else:
            out["min_s"].append(r["min_s"])
            out["max_s"].append(r["max_s"])
    return pa.table({
        "col": pa.array(out["col"], pa.string()),
        "n_rows": pa.array(out["n_rows"], pa.int64()),
        "n_null": pa.array(out["n_null"], pa.int64()),
        "n_distinct": pa.array(out["n_distinct"], pa.int64()),
        "min_s": pa.array(out["min_s"], pa.string()),
        "max_s": pa.array(out["max_s"], pa.string()),
    })


def grouped_median_bisect(ds, key: str, value_col: str,
                          fanout: int = 16, max_rounds: int = 40):
    """Exact per-group lower median by DISTRIBUTED MULTI-WAY BISECTION
    — the selection algorithm for value domains too large to
    histogram: :func:`grouped_quantiles` ships the whole (key, value,
    count) histogram through one exchange, which is right when values
    are prices in cents (bounded domain) and wrong when they are
    64-bit measurements — this never materializes a histogram at all.

    Parallel quickselect by range partitioning: every group g keeps an
    integer bracket ``[lo_g, hi_g]`` guaranteed to contain its answer;
    each round ONE combiner pass bins every row into its own group's
    ``fanout`` evenly-spaced sub-ranges (ALL groups narrow in the SAME
    pass) and the driver keeps the sub-range containing the k-th order
    statistic (k = (n_g + 1) // 2, the lower median —
    ``percentile_disc(0.5)`` / DuckDB ``quantile_disc`` semantics).
    Convergence in ⌈log_fanout(max − min)⌉ rounds — a 64-bit domain at
    the default fanout is ≤ 16 counting passes, each shuffling
    |groups| × fanout int64 rows, never a histogram, never raw values.

    Driver state: one (lo, hi, k) triple per group — O(|groups|),
    independent of rows AND of the value domain.  Initial brackets
    from one grouped MIN/MAX/COUNT pass.  Integer values only
    (exactness is the point); returns a ``(key, median)`` table sorted
    by key."""
    import numpy as np
    import ray

    ds = ds.materialize()   # scanned once per round: pin the blocks
    base = grouped_agg(ds, [key], [
        ("lo", value_col, "min"), ("hi", value_col, "max"),
        ("n", "", "count")]).take_all()
    if not base:
        return pa.table({key: pa.array([], pa.string()),
                         "median": pa.array([], pa.int64())})
    groups = sorted(r[key] for r in base)
    lo = {r[key]: int(r["lo"]) for r in base}
    hi = {r[key]: int(r["hi"]) for r in base}
    kth = {r[key]: (int(r["n"]) + 1) // 2 for r in base}
    rank = dict(kth)  # remaining rank inside the current bracket

    for _ in range(max_rounds):
        open_g = sorted(g for g in groups if lo[g] < hi[g])
        if not open_g:
            break
        garr = np.asarray(open_g, dtype=object)
        # per-group pivot matrix: fanout−1 interior cut points, upper
        # bound of sub-range j is pivots[:, j] (last sub-range → hi)
        piv = np.empty((len(open_g), fanout - 1), np.int64)
        for gi, g in enumerate(open_g):
            span = hi[g] - lo[g]
            piv[gi] = lo[g] + (span * np.arange(1, fanout)) // fanout
        loarr = np.fromiter((lo[g] for g in open_g), np.int64,
                            len(open_g))
        hiarr = np.fromiter((hi[g] for g in open_g), np.int64,
                            len(open_g))
        ref = ray.put((garr, piv, loarr, hiarr))

        def bucket_counts(batch: pa.Table, _ref=ref) -> pa.Table:
            from ..broadcast import cached_get

            ga, pv, glo, ghi = cached_get(_ref)
            kv = np.asarray(batch.column(key).to_pylist(), dtype=object)
            v = batch.column(value_col).combine_chunks().to_numpy(
                zero_copy_only=False)
            pos = np.searchsorted(ga, kv)
            pos_c = np.minimum(pos, len(ga) - 1)
            # rows eliminated in earlier rounds (outside the bracket)
            # must NOT be rebinned — the rank bookkeeping assumes every
            # counted row is inside [lo, hi]
            hit = (ga[pos_c] == kv) & (v >= glo[pos_c]) & (v <= ghi[pos_c])
            F = pv.shape[1] + 1
            counts = np.zeros((len(ga), F), np.int64)
            for gi in range(len(ga)):      # ≤ |open groups| small loop
                m = hit & (pos_c == gi)
                if m.any():
                    b = np.searchsorted(pv[gi], v[m], side="left")
                    counts[gi] = np.bincount(b, minlength=F)
            gi_idx, b_idx = np.nonzero(counts)
            return pa.table({
                key: pa.array(ga[gi_idx].tolist()),
                "b": pa.array(b_idx.astype(np.int64), pa.int64()),
                "c": pa.array(counts[gi_idx, b_idx], pa.int64()),
            })

        rows = grouped_agg(
            ds.map_batches(bucket_counts, batch_format="pyarrow",
                           batch_size=None, runtime_env=runtime_env()),
            [key, "b"], [("c", "c", "sum")],
            sorted_output=False).take_all()
        cmat = {g: np.zeros(fanout, np.int64) for g in open_g}
        for r in rows:
            cmat[r[key]][int(r["b"])] = int(r["c"])
        gpos = {g: i for i, g in enumerate(open_g)}
        for g in open_g:
            cum = np.cumsum(cmat[g])
            j = int(np.searchsorted(cum, rank[g]))
            # sub-range j: (pivots[j-1], pivots[j]] with lo/hi at ends;
            # values v in it satisfy pv[j-1] < v <= pv[j]
            pv = piv[gpos[g]]
            new_lo = lo[g] if j == 0 else int(pv[j - 1]) + 1
            new_hi = int(pv[j]) if j < fanout - 1 else hi[g]
            rank[g] -= int(cum[j - 1]) if j > 0 else 0
            lo[g], hi[g] = new_lo, new_hi
    else:
        raise RuntimeError(
            "grouped_median_bisect did not converge within max_rounds")

    return pa.table({
        key: pa.array(groups),
        "median": pa.array([lo[g] for g in groups], pa.int64()),
    })
