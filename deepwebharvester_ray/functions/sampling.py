"""Distributed weighted sampling without replacement.

Efraimidis–Spirakis (2006, public algorithm): give every row the key
``u^(1/w)`` with ``u`` uniform in (0,1) and keep the k LARGEST keys —
the result is an exact weighted sample without replacement.  With ``u``
derived from a seeded 64-bit hash of the row id the sample is fully
deterministic, reshard-stable, and composes with the same two-level
top-k plan as the uniform ``sample_k``: per-block partial top-k (≤ k
rows leave each block) then one bounded merge — shuffle volume
O(blocks × k), never the corpus.

This is the quality-weighted data-mixing primitive (sample documents
∝ quality score / length / domain weight) that fractional-rate
filters (domain_mix) can't express when an EXACT output size is
required.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import runtime_env


def _es_keys(ids: np.ndarray, weights: np.ndarray, seed: int) -> np.ndarray:
    """log-space Efraimidis–Spirakis keys: log(u)/w (keep the LARGEST,
    i.e. closest to 0) — log-space avoids u^(1/w) underflow for big
    weights and is order-isomorphic to the textbook key.

    SQL-reproducible by construction (the weighted_sample oracle): u
    derives from the md5-60-bit parity hash of ``"{seed}|{id}"`` and
    the log runs libm scalars (numpy's SIMD log differs from
    libm/DuckDB by 1 ulp on ~23% of inputs — the
    sketch.dd_bucket_indices finding), so engine and DuckDB rank the
    identical key vector."""
    from .sketch import _hash60, _libm_log

    h = _hash60([f"{seed}|{i}" for i in ids])
    # uniform in (0,1): map the 60-bit hash into the open interval
    u = (h.astype(np.float64) + 0.5) / 2.0 ** 60
    w = np.maximum(weights.astype(np.float64), 1e-300)
    return _libm_log(u) / w


def weighted_sample_k(ds, k: int, id_column: str, weight_column: str,
                      seed: int = 0):
    """Exact-size weighted sample without replacement: the k rows with
    the largest seeded ES keys.  Deterministic for a (seed, id, weight)
    triple regardless of blocking; rows with weight ≤ 0 are excluded."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).combine_chunks().to_numpy(
            zero_copy_only=False)
        w = batch.column(weight_column).combine_chunks().to_numpy(
            zero_copy_only=False)
        pos = w > 0
        keys = np.full(len(ids), -np.inf)
        if pos.any():
            keys[pos] = _es_keys(ids[pos], w[pos], seed)
        order = np.argsort(-keys)[:k]
        order = order[np.isfinite(keys[order])]
        out = batch.take(pa.array(np.sort(order)))
        return out.append_column(
            "__es", pa.array(keys[np.sort(order)], pa.float64()))

    def merge(batch: pa.Table) -> pa.Table:
        keys = batch.column("__es").combine_chunks().to_numpy(
            zero_copy_only=False)
        order = np.sort(np.argsort(-keys)[:k])
        return batch.take(pa.array(order)).drop_columns(["__es"])

    part = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None, runtime_env=runtime_env())
    return part.repartition(1).map_batches(
        merge, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env())
