"""2-D skyline (Pareto frontier) — the maximal-vector operator.

A row (x, y) is on the skyline iff no other row dominates it: dominator
``(x', y')`` has ``x' ≤ x`` and ``y' ≥ y`` with at least one strict
(minimize x, maximize y; negate a column to flip its direction).  Rows
that tie on BOTH coordinates dominate neither — all stay.  The classic
"best trade-off" query (cheapest-newest, fastest-smallest…), SQL's
``NOT EXISTS`` anti-join over an inequality pair — O(n²) there.

Distributed shape: the skyline operator is a COMBINER — a global
skyline point must survive its own block's skyline (domination inside a
block already eliminates it otherwise) — so one vectorized per-block
pass prunes each block to its partial frontier, and the tiny union of
partials is re-run through the same kernel in a single merged block.
Per-block work is one lexsort + a run-max prefix scan, O(n log n), no
pairwise compare.  The merge block is bounded by the sum of partial
frontier sizes — O(blocks · frontier) — small for real data (random
data has O(log n) frontiers); a fully anti-correlated dataset whose
frontier IS the dataset degenerates to its own output size, the same
bound the SQL has.

Reference parity: the reference has no preference queries; part of the
analytical operator library.
"""
from __future__ import annotations

from typing import List

import numpy as np
import pyarrow as pa

from .. import runtime_env
from .window import run_starts_mask


def _skyline_mask(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean mask of skyline rows (minimize x, maximize y), exact.

    Sort by (x asc, y desc); within an x-run the first row holds the
    run's max y; a row survives iff it ties its run's max y AND beats
    the running max y of all STRICTLY smaller x (ties on both
    coordinates survive together).
    """
    n = len(x)
    if n == 0:
        return np.zeros(0, bool)
    order = np.lexsort((-y, x))
    xs, ys = x[order], y[order]
    starts = run_starts_mask(xs)
    start_pos = np.flatnonzero(starts)
    lens = np.diff(np.append(start_pos, n))
    run_idx = np.repeat(np.arange(len(start_pos)), lens)
    run_max = ys[start_pos]                       # max y per x-run
    pref = np.empty(len(run_max), np.int64)       # max y of earlier runs
    if len(run_max) > 1:
        pref[1:] = np.maximum.accumulate(run_max)[:-1]
    pref[0] = np.iinfo(np.int64).min
    keep_sorted = (ys == run_max[run_idx]) & (ys > pref[run_idx])
    keep = np.empty(n, bool)
    keep[order] = keep_sorted
    return keep


def skyline2d(ds, x_col: str, y_col: str, keep_cols: List[str] = None):
    """Skyline of ``ds`` minimizing ``x_col`` and maximizing ``y_col``
    (both INTEGER columns — the repo's determinism rule), carrying
    ``keep_cols`` through.  Two passes of one shared kernel: per-block
    partial frontier, then the merged partials once more.
    """
    cols = ([x_col, y_col] + [c for c in (keep_cols or [])
                              if c not in (x_col, y_col)])

    def block_skyline(batch: pa.Table) -> pa.Table:
        batch = batch.select(cols)
        if batch.num_rows == 0:
            return batch
        x = batch.column(x_col).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        y = batch.column(y_col).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return batch.filter(pa.array(_skyline_mask(x, y)))

    partial = ds.map_batches(block_skyline, batch_format="pyarrow",
                             batch_size=None, runtime_env=runtime_env())
    return partial.repartition(1).map_batches(
        block_skyline, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    )
