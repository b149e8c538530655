"""Ordered per-key window functions: lag-delta and running (cumulative)
sum — the ``LAG(...) OVER (PARTITION BY k ORDER BY ...)`` /
``SUM(...) OVER (... ROWS UNBOUNDED PRECEDING)`` family.

Ray Data has no window operator.  The composition is the repo's standard
ordered-run shape (same co-location guarantee event_sessions /
latest_events / asof rely on): ONE all-to-all sort on the high-cardinality
partition key puts every key's rows in one block, then a single vectorized
block pass lexsorts each run by the order columns and computes the window
frames with cumsum/shift arithmetic — no per-group Python, no
row_number materialization.

Values must be integers (the repo's determinism rule: running float sums
are order-dependent; convert to cents first).  Skew note: one partition
key's rows must fit a block — true for per-user/per-session streams; a
single key carrying a 100-TB stream needs range-bucketed frames instead
(the hopping-window operator covers that shape).

Reference parity: the reference engine has no window functions; this is
part of the training-data/event-stream operator library (SURVEY §2.9
scopes the streaming semantics).
"""
from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa

from .. import runtime_env


def run_starts_mask(keys: np.ndarray) -> np.ndarray:
    """Boolean mask of run starts in a key-sorted array."""
    n = len(keys)
    mask = np.empty(n, dtype=bool)
    if n:
        mask[0] = True
        mask[1:] = keys[1:] != keys[:-1]
    return mask


def ordered_deltas(
    ds,
    key: str,
    order_cols: List[str],
    value_col: str,
    out_delta: str = "delta",
    out_running: str = "running",
):
    """Per-``key`` ordered windows over an INTEGER ``value_col``:

    * ``out_delta``   — value minus the previous row's value within the
      key (0 for each key's first row: ``LAG(v, 1, v)`` semantics);
    * ``out_running`` — running sum of the value within the key
      (``ROWS UNBOUNDED PRECEDING``).

    Rows keep all input columns; ordering within a key follows
    ``order_cols`` ascending (make the combination unique — e.g. append
    an id column — so the frame is deterministic).
    """

    def window_block(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.append_column(
                out_delta, pa.array([], pa.int64())
            ).append_column(out_running, pa.array([], pa.int64()))
        keys = batch.column(key).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        ords = [
            batch.column(c).combine_chunks().cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            for c in order_cols
        ]
        vals = batch.column(value_col).combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        # one lexsort: key, then order columns (last key = primary)
        order = np.lexsort(tuple(reversed(ords)) + (keys,))
        ks, vs = keys[order], vals[order]
        starts = run_starts_mask(ks)
        # delta: v - previous v, run-start rows reset to 0
        prev = np.empty(n, dtype=np.int64)
        prev[0] = 0
        prev[1:] = vs[:-1]
        delta = vs - prev
        delta[starts] = 0
        # running: global cumsum minus the cumsum just before each run
        cum = np.cumsum(vs)
        base = np.zeros(n, dtype=np.int64)
        start_pos = np.flatnonzero(starts)
        base_vals = np.where(start_pos > 0, cum[start_pos - 1], 0)
        lens = np.diff(np.append(start_pos, n))
        base = np.repeat(base_vals, lens)
        running = cum - base
        # scatter back to the batch's original row order
        inv_delta = np.empty(n, dtype=np.int64)
        inv_running = np.empty(n, dtype=np.int64)
        inv_delta[order] = delta
        inv_running[order] = running
        return batch.append_column(
            out_delta, pa.array(inv_delta, pa.int64())
        ).append_column(out_running, pa.array(inv_running, pa.int64()))

    return ds.sort(key).map_batches(
        window_block, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    )


def ordered_moving_sum(
    ds,
    key: str,
    order_cols: List[str],
    value_col: str,
    frame_rows: int,
    out_col: str = "moving",
):
    """Per-``key`` moving sum over a bounded ROWS frame —
    ``SUM(v) OVER (PARTITION BY key ORDER BY ... ROWS BETWEEN
    frame_rows-1 PRECEDING AND CURRENT ROW)``.

    Same one-sort + one-block-pass shape as :func:`ordered_deltas`; the
    bounded frame is cumsum differencing with the lower bound clamped to
    each run's start (vectorized: per-row run-start index via
    repeat(start_pos, run_lens), then two cumsum lookups) — no per-group
    Python, no frame materialization."""

    def window_block(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.append_column(out_col, pa.array([], pa.int64()))
        keys = batch.column(key).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        ords = [
            batch.column(c).combine_chunks().cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            for c in order_cols
        ]
        vals = batch.column(value_col).combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        order = np.lexsort(tuple(reversed(ords)) + (keys,))
        ks, vs = keys[order], vals[order]
        starts = run_starts_mask(ks)
        start_pos = np.flatnonzero(starts)
        lens = np.diff(np.append(start_pos, n))
        run_start = np.repeat(start_pos, lens)          # per-row run start
        idx = np.arange(n)
        lo = np.maximum(idx - (frame_rows - 1), run_start)
        cum = np.cumsum(vs)
        moving = cum - np.where(lo > 0, cum[lo - 1], 0)
        inv = np.empty(n, dtype=np.int64)
        inv[order] = moving
        return batch.append_column(out_col, pa.array(inv, pa.int64()))

    return ds.sort(key).map_batches(
        window_block, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    )


def resample_ffill(
    ds,
    key: str,
    bucket_col: str,
    order_cols: List[str],
    value_col: str,
    out_value: str = "filled",
    out_observed: str = "observed",
):
    """Per-``key`` gap-fill + forward-fill resample over an INTEGER
    bucket column (e.g. epoch-hours): emit one row per bucket from each
    key's first observed bucket through its last, carrying the latest
    observation forward across gaps — the ``generate_series`` +
    ``ASOF JOIN`` time-series densification every metrics/feature
    pipeline needs before frame-aligned math.

    Semantics (deterministic): the observation for a (key, bucket) is
    the ``value_col`` of its row with the greatest ``order_cols`` tuple
    (make it unique — e.g. ``[ts, event_id]``); a bucket with no row
    reports the nearest earlier bucket's observation with
    ``out_observed = False``.  The first output bucket per key is always
    observed, so no NULLs exist.

    Shape: the repo's standard ordered-run composition — ONE all-to-all
    sort on the high-cardinality partition key (equal keys co-locate per
    the single-key-sort rule), then one vectorized block pass does the
    (bucket, order) lexsort, last-per-bucket pick, span expansion and a
    ``maximum.accumulate`` index fill — no per-key Python, no join.
    Output volume is data-driven (sum of per-key bucket spans, exactly
    what the SQL emits); a single key's whole span materializes in its
    block's output, so a key spanning decades at second-granularity
    buckets needs a coarser bucket, same as the SQL shape.
    """

    def fill_block(batch: pa.Table) -> pa.Table:
        ktype = batch.schema.field(key).type
        if batch.num_rows == 0:
            return pa.table({
                key: pa.array([], ktype),
                bucket_col: pa.array([], pa.int64()),
                out_value: pa.array([], pa.int64()),
                out_observed: pa.array([], pa.bool_()),
            })
        keys = batch.column(key).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        buckets = batch.column(bucket_col).combine_chunks().cast(
            pa.int64()
        ).to_numpy(zero_copy_only=False)
        ords = [
            batch.column(c).combine_chunks().cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            for c in order_cols
        ]
        vals = batch.column(value_col).combine_chunks().to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        order = np.lexsort(tuple(reversed(ords)) + (buckets, keys))
        ks, bs, vs = keys[order], buckets[order], vals[order]
        n = len(ks)
        # last row of each (key, bucket) run = that bucket's observation
        last = np.empty(n, dtype=bool)
        last[-1] = True
        last[:-1] = (ks[1:] != ks[:-1]) | (bs[1:] != bs[:-1])
        ok, ob, ov = ks[last], bs[last], vs[last]
        # per-key runs over the observation table (sorted by key, bucket)
        starts = run_starts_mask(ok)
        start_pos = np.flatnonzero(starts)
        lens = np.diff(np.append(start_pos, len(ok)))
        mn = ob[start_pos]
        mx = ob[start_pos + lens - 1]
        spans = mx - mn + 1
        total = int(spans.sum())
        offsets = np.concatenate([[0], np.cumsum(spans)[:-1]])
        out_key = np.repeat(ok[start_pos], spans)
        out_bucket = (np.arange(total, dtype=np.int64)
                      - np.repeat(offsets, spans)
                      + np.repeat(mn, spans))
        # scatter observation indices into the dense span, forward-fill
        # with maximum.accumulate — each key's first slot is always an
        # observation (mn IS the first observed bucket), so the fill
        # never bleeds across keys
        rep_run = np.repeat(np.arange(len(start_pos)), lens)
        pos = offsets[rep_run] + ob - mn[rep_run]
        fidx = np.full(total, -1, dtype=np.int64)
        fidx[pos] = np.arange(len(ob))
        observed = fidx >= 0
        ff = np.maximum.accumulate(fidx)
        try:
            key_arr = pa.array(out_key, type=ktype)
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            key_arr = pa.array(out_key.tolist(), type=ktype)
        return pa.table({
            key: key_arr,
            bucket_col: pa.array(out_bucket, pa.int64()),
            out_value: pa.array(ov[ff], pa.int64()),
            out_observed: pa.array(observed, pa.bool_()),
        })

    return ds.sort(key).map_batches(
        fill_block, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    )
