"""Approximate-nearest-neighbor search over an embedding column.

* :func:`brute_topk` — the exact baseline: broadcast the (few) query
  vectors once via ``ray.put``; every batch does one numpy matmul against
  them; per-batch partial top-k then a tiny global merge.  Scales linearly
  in corpus size with zero shuffle.
* :func:`lsh_topk` — the scale path: random-hyperplane signatures bucket
  the corpus (one shuffle on the bucket key); queries probe their own
  bucket plus ``n_probe`` nearest buckets by signature hamming distance.
"""
from __future__ import annotations

import heapq
from typing import List, Optional, Sequence

import numpy as np
import pyarrow as pa

from .. import runtime_env

_HYPERPLANE_SEED = 0xA11CE


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=-1, keepdims=True), 1e-12)


class BruteScore:
    """Actor-pool stage: cosine scores of each row against broadcast queries,
    emitting only the per-batch top-k (combiner before the global merge)."""

    def __init__(self, query_ref, k: int, id_column: str, vec_column: str) -> None:
        import ray

        q = ray.get(query_ref)
        self._q = _normalize(np.asarray(q, dtype=np.float64))
        self._k = k
        self._id = id_column
        self._vec = vec_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self._id).to_pylist(), dtype=np.int64)
        mat = np.asarray(
            [list(v) for v in batch.column(self._vec).to_pylist()], dtype=np.float64
        )
        mat = _normalize(mat)
        sims = mat @ self._q.T  # (batch, n_queries)
        out_q, out_id, out_s = [], [], []
        for qi in range(sims.shape[1]):
            col = sims[:, qi]
            top = np.argsort(-col, kind="stable")[: self._k]
            for t in top:
                out_q.append(qi)
                out_id.append(int(ids[t]))
                out_s.append(float(col[t]))
        return pa.table(
            {
                "query_idx": pa.array(out_q, pa.int32()),
                "id": pa.array(out_id, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )


def brute_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
) -> pa.Table:
    """Exact cosine top-k per query; returns (query_idx, rank, id, score).

    Deterministic tie-break: (-score, id).
    """
    import ray

    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    qref = ray.put(queries)
    partials = ds.map_batches(
        BruteScore,
        fn_constructor_args=(qref, k, id_column, vec_column),
        batch_format="pyarrow",
        concurrency=(1, 8),
        runtime_env=runtime_env(),
    ).take_all()

    out_q, out_rank, out_id, out_s = [], [], [], []
    for qi in range(len(queries)):
        rows = [(-(r["score"]), r["id"]) for r in partials if r["query_idx"] == qi]
        for rank, (neg_s, rid) in enumerate(heapq.nsmallest(k, rows)):
            out_q.append(qi)
            out_rank.append(rank + 1)
            out_id.append(rid)
            out_s.append(-neg_s)
    return pa.table(
        {
            "query_idx": pa.array(out_q, pa.int32()),
            "rank": pa.array(out_rank, pa.int32()),
            "id": pa.array(out_id, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        }
    )


def _signatures(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (mat @ planes.T) > 0
    sig = np.zeros(len(mat), dtype=np.int64)
    for b in range(planes.shape[0]):
        sig |= bits[:, b].astype(np.int64) << b
    return sig


def lsh_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    n_bits: int = 8,
    n_probe: int = 4,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    dim: Optional[int] = None,
) -> pa.Table:
    """Approximate top-k: random-hyperplane LSH buckets + multi-probe.

    One shuffle (groupby bucket); each query searches only the vectors in
    its ``n_probe`` nearest buckets by signature hamming distance.
    """
    import ray

    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    dim = dim or queries.shape[1]
    rng = np.random.default_rng(_HYPERPLANE_SEED)
    planes = rng.standard_normal((n_bits, dim))
    planes_ref = ray.put(planes)

    def sig_batch(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        mat = np.asarray(
            [list(v) for v in batch.column(vec_column).to_pylist()], dtype=np.float64
        )
        sig = _signatures(_normalize(mat), pl)
        return pa.table(
            {
                "id": batch.column(id_column),
                "bucket": pa.array(sig, pa.int64()),
                vec_column: batch.column(vec_column),
            }
        )

    bucketed = ds.map_batches(
        sig_batch, batch_format="pyarrow", runtime_env=runtime_env()
    )

    qsigs = _signatures(_normalize(queries), planes)
    # nearest buckets by hamming distance, deterministic
    wanted: dict = {}
    for qi, qs in enumerate(qsigs):
        cand = sorted(
            range(1 << n_bits),
            key=lambda b: (bin(b ^ int(qs)).count("1"), b),
        )[:n_probe]
        for b in cand:
            wanted.setdefault(b, []).append(qi)
    wanted_ref = ray.put(wanted)
    qref = ray.put(queries)

    class ProbeScore:
        def __init__(self, wanted_ref, qref, k):
            self._wanted = ray.get(wanted_ref)
            self._q = _normalize(np.asarray(ray.get(qref), dtype=np.float64))
            self._k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch.column("id").to_pylist(), dtype=np.int64)
            buckets = batch.column("bucket").to_pylist()
            mat = _normalize(
                np.asarray(
                    [list(v) for v in batch.column(vec_column).to_pylist()],
                    dtype=np.float64,
                )
            )
            out_q, out_id, out_s = [], [], []
            for qi in range(len(self._q)):
                mask = np.array([qi in self._wanted.get(b, ()) for b in buckets])
                if not mask.any():
                    continue
                sims = mat[mask] @ self._q[qi]
                sel_ids = ids[mask]
                top = np.argsort(-sims, kind="stable")[: self._k]
                for t in top:
                    out_q.append(qi)
                    out_id.append(int(sel_ids[t]))
                    out_s.append(float(sims[t]))
            return pa.table(
                {
                    "query_idx": pa.array(out_q, pa.int32()),
                    "id": pa.array(out_id, pa.int64()),
                    "score": pa.array(out_s, pa.float64()),
                }
            )

    partials = bucketed.map_batches(
        ProbeScore,
        fn_constructor_args=(wanted_ref, qref, k),
        batch_format="pyarrow",
        concurrency=(1, 8),
        runtime_env=runtime_env(),
    ).take_all()

    out_q, out_rank, out_id, out_s = [], [], [], []
    for qi in range(len(queries)):
        rows = [(-(r["score"]), r["id"]) for r in partials if r["query_idx"] == qi]
        for rank, (neg_s, rid) in enumerate(heapq.nsmallest(k, rows)):
            out_q.append(qi)
            out_rank.append(rank + 1)
            out_id.append(rid)
            out_s.append(-neg_s)
    return pa.table(
        {
            "query_idx": pa.array(out_q, pa.int32()),
            "rank": pa.array(out_rank, pa.int32()),
            "id": pa.array(out_id, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        }
    )
