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
