"""Approximate-nearest-neighbor search over an embedding column.

* :func:`brute_topk` — the exact baseline: broadcast the (few) query
  vectors once via ``ray.put``; every batch does one numpy matmul against
  them; per-batch partial top-k then a tiny global merge.  Scales linearly
  in corpus size with zero shuffle.
* :func:`lsh_topk` — the scale path: random-hyperplane signatures bucket
  the corpus (one shuffle on the bucket key); queries probe their own
  bucket plus ``n_probe`` nearest buckets by signature hamming distance.

Both run as plain map TASKS with the worker-local broadcast cache
(``broadcast.cached_get``) — no actor ramp-up cost; vectors are pulled
out of Arrow list columns via flatten().to_numpy() (no per-row Python
lists).
"""
from __future__ import annotations

import heapq
from typing import Optional

import numpy as np
import pyarrow as pa

from .. import runtime_env
from ..broadcast import cached_get

_HYPERPLANE_SEED = 0xA11CE


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=-1, keepdims=True), 1e-12)


def _vec_matrix(col) -> np.ndarray:
    """(n, dim) float64 matrix from an Arrow list<float> column, vectorized."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, 0), dtype=np.float64)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(n, -1)


def _ids_array(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False).astype(np.int64)


def _empty_scores() -> pa.Table:
    return pa.table(
        {
            "query_idx": pa.array([], pa.int32()),
            "id": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }
    )


def _merge_topk(partials, n_queries: int, k: int) -> pa.Table:
    """Merge per-batch partial top-k rows into the global (query_idx, rank,
    id, score) table with the deterministic (-score, id) tie-break."""
    by_q: dict = {qi: [] for qi in range(n_queries)}
    for r in partials:
        by_q[r["query_idx"]].append((-(r["score"]), r["id"]))
    out_q, out_rank, out_id, out_s = [], [], [], []
    for qi in range(n_queries):
        for rank, (neg_s, rid) in enumerate(heapq.nsmallest(k, by_q[qi])):
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


def brute_score_task(
    batch: pa.Table, query_ref=None, k: int = 10,
    id_column: str = "vec_id", vec_column: str = "embedding",
) -> pa.Table:
    """Per-batch cosine scores against broadcast queries, emitting only the
    per-batch top-k (combiner before the tiny global merge)."""
    if len(batch) == 0:
        return _empty_scores()
    q = _normalize(np.asarray(cached_get(query_ref), dtype=np.float64))
    ids = _ids_array(batch.column(id_column))
    mat = _normalize(_vec_matrix(batch.column(vec_column)))
    sims = mat @ q.T  # (batch, n_queries)
    out_q, out_id, out_s = [], [], []
    for qi in range(sims.shape[1]):
        col = sims[:, qi]
        # deterministic (-score, id) ordering INSIDE the partial too, so a
        # tied smaller id is never cut at the per-batch k boundary
        top = np.lexsort((ids, -col))[:k]
        out_q.extend([qi] * len(top))
        out_id.extend(int(ids[t]) for t in top)
        out_s.extend(float(col[t]) for t in top)
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
        brute_score_task,
        fn_kwargs={"query_ref": qref, "k": k, "id_column": id_column,
                   "vec_column": vec_column},
        batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    ).take_all()

    return _merge_topk(partials, len(queries), k)


def _signatures(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (mat @ planes.T) > 0
    return (bits.astype(np.int64) << np.arange(planes.shape[0], dtype=np.int64)).sum(
        axis=1
    )


def _probe_score_task(
    batch: pa.Table, qbuckets_ref=None, qref=None, k: int = 10,
    vec_column: str = "embedding",
) -> pa.Table:
    """Score a bucketed batch against every query probing one of its
    buckets.  Membership is a vectorized ``np.isin`` of the batch's bucket
    array against the query's (tiny, sorted) probe list — no per-row
    Python."""
    if len(batch) == 0:
        return _empty_scores()
    qbuckets = cached_get(qbuckets_ref)  # list of sorted int64 arrays
    q = _normalize(np.asarray(cached_get(qref), dtype=np.float64))
    ids = _ids_array(batch.column("id"))
    buckets = _ids_array(batch.column("bucket"))
    mat = _normalize(_vec_matrix(batch.column(vec_column)))
    out_q, out_id, out_s = [], [], []
    for qi in range(len(q)):
        mask = np.isin(buckets, qbuckets[qi])
        if not mask.any():
            continue
        sims = mat[mask] @ q[qi]
        sel_ids = ids[mask]
        top = np.lexsort((sel_ids, -sims))[:k]
        out_q.extend([qi] * len(top))
        out_id.extend(int(sel_ids[t]) for t in top)
        out_s.extend(float(sims[t]) for t in top)
    return pa.table(
        {
            "query_idx": pa.array(out_q, pa.int32()),
            "id": pa.array(out_id, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        }
    )


def lsh_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    n_bits: int = 8,
    n_probe: int = 4,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    dim: Optional[int] = None,
    index_dir: Optional[str] = None,
) -> pa.Table:
    """Approximate top-k: random-hyperplane LSH buckets + multi-probe.

    Each query searches only the vectors in its ``n_probe`` nearest
    buckets by signature hamming distance.  With ``index_dir`` the bucket
    assignment is materialized hive-partitioned by bucket and query time
    reads only probed buckets' partitions (physical pruning — same layout
    as :func:`ivf_topk`); without it the probe is a single filtered scan.
    """
    import ray

    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    dim = dim or queries.shape[1]
    if index_dir is not None:
        # build-once / probe-many split: materialize the hive index,
        # then answer this call through the pure probe path
        lsh_build_index(ds, index_dir, n_bits=n_bits,
                        id_column=id_column, vec_column=vec_column,
                        dim=dim)
        return lsh_probe_index(index_dir, queries, k=k, n_probe=n_probe)
    rng = np.random.default_rng(_HYPERPLANE_SEED)
    planes = rng.standard_normal((n_bits, dim))
    planes_ref = ray.put(planes)

    def sig_batch(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "id": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                    vec_column: pa.array(
                        [], batch.schema.field(vec_column).type
                    ),
                }
            )
        pl = cached_get(planes_ref)
        mat = _vec_matrix(batch.column(vec_column))
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
    # per-query probe list: n_probe nearest buckets by hamming distance,
    # deterministic tie-break on bucket id
    qbuckets = [
        np.sort(
            np.asarray(
                sorted(
                    range(1 << n_bits),
                    key=lambda b: (bin(b ^ int(qs)).count("1"), b),
                )[:n_probe],
                dtype=np.int64,
            )
        )
        for qs in qsigs
    ]

    qbuckets_ref = ray.put(qbuckets)
    qref = ray.put(queries)

    partials = bucketed.map_batches(
        _probe_score_task,
        fn_kwargs={"qbuckets_ref": qbuckets_ref, "qref": qref, "k": k,
                   "vec_column": vec_column},
        batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    ).take_all()

    return _merge_topk(partials, len(queries), k)


def _write_index_manifest(index_dir: str, meta: dict) -> None:
    import json
    from pathlib import Path

    p = Path(index_dir) / "manifest.json"
    tmp = p.with_suffix(".tmp")
    tmp.write_text(json.dumps(meta, sort_keys=True))
    tmp.rename(p)


def _read_index_manifest(index_dir: str) -> dict:
    import json
    from pathlib import Path

    return json.loads((Path(index_dir) / "manifest.json").read_text())


def lsh_build_index(
    ds,
    index_dir: str,
    n_bits: int = 8,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    dim: Optional[int] = None,
) -> dict:
    """Build a PERSISTENT LSH index: bucket every vector by its
    random-hyperplane signature and write the assignment hive-partitioned
    by ``cell`` (one directory per bucket) plus the hyperplanes
    (``planes.npz``) and a ``manifest.json`` — the build-once /
    probe-many contract every retrieval pipeline needs at 100 TB: a
    later session calls :func:`lsh_probe_index` with only the directory,
    and each probe physically reads ONLY the probed buckets' files.

    The directory is cleared first (idempotent rebuild).  Returns the
    manifest dict."""
    import shutil as _shutil
    from pathlib import Path

    import ray

    from .partition import coalesce_by_bytes

    if dim is None:
        first = ds.take(1)
        if not first:
            dim = 2  # empty dataset: any plane dim works
        else:
            dim = len(first[0][vec_column])
    rng = np.random.default_rng(_HYPERPLANE_SEED)
    planes = rng.standard_normal((n_bits, dim))
    planes_ref = ray.put(planes)

    def sig_cell(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({
                "id": pa.array([], pa.int64()),
                "bucket": pa.array([], pa.int64()),
                vec_column: pa.array(
                    [], batch.schema.field(vec_column).type),
                "cell": pa.array([], pa.int64()),
            })
        pl = cached_get(planes_ref)
        mat = _vec_matrix(batch.column(vec_column))
        sig = _signatures(_normalize(mat), pl)
        return pa.table({
            "id": batch.column(id_column),
            "bucket": pa.array(sig, pa.int64()),
            vec_column: batch.column(vec_column),
            # "cell" duplicates "bucket": partition_cols strips the
            # partition column from the data files
            "cell": pa.array(sig, pa.int64()),
        })

    if Path(index_dir).exists():
        _shutil.rmtree(index_dir)
    coalesce_by_bytes(ds.map_batches(
        sig_cell, batch_format="pyarrow", runtime_env=runtime_env()
    )).write_parquet(index_dir, partition_cols=["cell"])
    np.savez(str(Path(index_dir) / "planes.npz"), planes=planes)
    meta = {"kind": "lsh", "n_bits": n_bits, "dim": dim,
            "vec_column": vec_column}
    _write_index_manifest(index_dir, meta)
    return meta


def lsh_probe_index(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
) -> pa.Table:
    """Probe a prebuilt :func:`lsh_build_index` directory: load the
    hyperplanes + manifest, compute each query's ``n_probe`` nearest
    buckets by signature hamming distance, and score ONLY those buckets'
    parquet files (:func:`_cell_paths` — non-probed cells never leave
    storage).  No training, no full scan; safe to call many times
    against one build."""
    from pathlib import Path

    import ray

    meta = _read_index_manifest(index_dir)
    assert meta["kind"] == "lsh", meta
    planes = np.load(str(Path(index_dir) / "planes.npz"))["planes"]
    n_bits = int(meta["n_bits"])
    vec_column = meta["vec_column"]

    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    qsigs = _signatures(_normalize(queries), planes)
    qbuckets = [
        np.sort(
            np.asarray(
                sorted(
                    range(1 << n_bits),
                    key=lambda b: (bin(b ^ int(qs)).count("1"), b),
                )[:n_probe],
                dtype=np.int64,
            )
        )
        for qs in qsigs
    ]
    paths = _cell_paths(index_dir, np.concatenate(qbuckets))
    if not paths:
        return _merge_topk([], len(queries), k)
    bucketed = ray.data.read_parquet(paths)

    qbuckets_ref = ray.put(qbuckets)
    qref = ray.put(queries)
    partials = bucketed.map_batches(
        _probe_score_task,
        fn_kwargs={"qbuckets_ref": qbuckets_ref, "qref": qref, "k": k,
                   "vec_column": vec_column},
        batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    ).take_all()
    return _merge_topk(partials, len(queries), k)


# ── IVF (inverted-file) ANN ──────────────────────────────────────────────────

_IVF_SEED = 0x1FF


def _spherical_kmeans(sample: np.ndarray, n_cells: int, n_iters: int = 10):
    """Deterministic spherical k-means on a driver-side sample (the coarse
    quantizer is tiny — centroids, not data, are what the cluster shares).

    A cell that empties during iteration is RESEEDED to the sample point
    worst-served by the current centroids (largest distance to its nearest
    centroid) — deterministic, and avoids carrying a stale/duplicate
    centroid that would waste a probe cell."""
    sample = _normalize(sample)
    rng = np.random.default_rng(_IVF_SEED)
    cents = sample[rng.choice(len(sample), size=min(n_cells, len(sample)),
                              replace=False)]
    for _ in range(n_iters):
        sims = sample @ cents.T
        assign = np.argmax(sims, axis=1)
        empties = []
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.sum(axis=0)
            else:
                empties.append(c)
        if empties:
            # worst-served points first; ties broken by index (determinism)
            worst = np.argsort(sims.max(axis=1), kind="stable")
            for c, p in zip(empties, worst[: len(empties)]):
                cents[c] = sample[p]
        cents = _normalize(cents)
    return cents


def _cell_paths(index_dir: str, cells) -> list:
    """Parquet files of the probed cells' hive partitions ONLY (the
    physical pruning step: non-probed cells never leave storage).
    File-level paths because read_parquet does not expand directories
    inside a multi-path list."""
    from pathlib import Path

    paths = []
    for c in sorted({int(c) for c in cells}):
        p = Path(index_dir) / f"cell={c}"
        if p.exists():
            paths.extend(sorted(str(f) for f in p.glob("*.parquet")))
    return paths


def hash_rank_sample(ds, train_sample: int = 2048,
                     id_column: str = "vec_id",
                     vec_column: str = "embedding"):
    """Deterministic training sample: the ``train_sample`` rows with the
    SMALLEST 64-bit multiplicative id hashes — order-free and unbiased
    by storage layout (a storage-order prefix, or random_sample followed
    by a positional limit, excludes the dataset tail and trains a
    degenerate quantizer on clustered/sorted inputs).  Per-block partial
    top-k keeps the driver pull at O(blocks × train_sample).  Returns
    the (s, dim) float64 matrix, or None on an empty dataset.  Shared by
    every quantizer trainer (IVF, k-means sharding, PQ, IVF-PQ)."""

    def hash_candidates(batch: pa.Table, k=train_sample) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {"h": pa.array([], pa.uint64()),
                 vec_column: pa.array(
                     [], batch.schema.field(vec_column).type)}
            )
        ids = _ids_array(batch.column(id_column))
        with np.errstate(over="ignore"):
            h = ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        top = np.argsort(h, kind="stable")[:k]
        return pa.table(
            {
                "h": pa.array(h[top], pa.uint64()),
                vec_column: batch.column(vec_column).combine_chunks().take(
                    pa.array(top)
                ),
            }
        )

    cand = ds.map_batches(
        hash_candidates, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    ).take_all()
    if not cand:
        return None
    cand.sort(key=lambda r: r["h"])
    return np.asarray(
        [list(r[vec_column]) for r in cand[:train_sample]], dtype=np.float64
    )


def train_centroids(ds, n_cells: int, train_sample: int = 2048,
                    id_column: str = "vec_id",
                    vec_column: str = "embedding"):
    """Spherical-k-means centroids from the deterministic
    :func:`hash_rank_sample`.  Returns None on an empty/fully-filtered
    dataset.  Shared by :func:`ivf_topk` and :func:`kmeans_assign`."""
    sample = hash_rank_sample(ds, train_sample, id_column, vec_column)
    if sample is None:
        return None
    return _spherical_kmeans(sample, n_cells)


def kmeans_assign(
    ds,
    n_cells: int = 16,
    train_sample: int = 2048,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
):
    """Semantic sharding: (id, cell) spherical-k-means assignment for
    every vector — the corpus-organization step behind SemDeDup cells,
    IVF partitions, per-topic mixture weighting and cluster-balanced
    sampling, exposed as a first-class product.

    Scale shape: centroids train on the bounded hash-rank sample
    (:func:`train_centroids`), then ONE broadcast matmul per batch —
    no shuffle at all; the (n_cells × dim) centroid matrix is the only
    shared state.  Deterministic: same corpus → same assignment,
    independent of block layout."""
    import ray

    cents = train_centroids(ds, n_cells, train_sample, id_column, vec_column)
    empty = pa.table({"vec_id": pa.array([], pa.int64()),
                      "cell": pa.array([], pa.int64())})
    if cents is None:
        return ray.data.from_arrow(empty)
    cents_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty
        mat = _normalize(_vec_matrix(batch.column(vec_column)))
        cell = np.argmax(mat @ cached_get(cents_ref).T, axis=1)
        return pa.table({
            "vec_id": pa.array(_ids_array(batch.column(id_column)),
                               pa.int64()),
            "cell": pa.array(cell.astype(np.int64), pa.int64()),
        })

    return ds.map_batches(assign, batch_format="pyarrow",
                          runtime_env=runtime_env())


def kmeans_lloyd(
    ds,
    n_cells: int = 16,
    iters: int = 5,
    train_sample: int = 2048,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
):
    """FULL-CORPUS spherical Lloyd refinement — the scale path beyond
    :func:`train_centroids`'s sample-trained quantizer: starting from
    the sample centroids, run ``iters`` exact rounds over EVERY vector.
    Each round is ONE combiner pass emitting per-(block, cell) moment
    rows — ``(cell, block_key, n, Σx as a binary blob, Σ max-sim)`` —
    so O(blocks × cells) tiny rows reach the driver (the pca_project
    moment discipline; vectors never leave the data plane), merged in
    sorted (cell, block_key) order so float summation order is FIXED
    for a given block layout (bit-deterministic per layout; a reshard
    moves ulps — documented, the float twin of the integer rule).
    Empty cells reseed to the sample point worst-served by the current
    centroids (the :func:`_spherical_kmeans` policy).

    Returns ``(centroids, assign_ds, sim_totals)``: the refined
    (n_cells × dim) matrix, a lazy (id, cell) assignment dataset, and
    the per-round Σ max-similarity — nondecreasing for spherical
    Lloyd, which the tests pin.  Returns ``(None, empty_ds, [])`` on
    an empty input."""
    import ray

    from ..broadcast import cached_get

    cents = train_centroids(ds, n_cells, train_sample, id_column,
                            vec_column)
    empty = pa.table({"vec_id": pa.array([], pa.int64()),
                      "cell": pa.array([], pa.int64())})
    if cents is None:
        return None, ray.data.from_arrow(empty), []
    sample = hash_rank_sample(ds, train_sample, id_column, vec_column)
    sample = _normalize(sample)
    ds = ds.materialize()
    dim = cents.shape[1]
    sim_totals = []

    for _ in range(iters):
        ref = ray.put(cents)

        def moments(batch: pa.Table, _ref=ref) -> pa.Table:
            if len(batch) == 0:
                return pa.table({
                    "cell": pa.array([], pa.int64()),
                    "block_key": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "s": pa.array([], pa.large_binary()),
                    "simsum": pa.array([], pa.float64()),
                })
            c = cached_get(_ref)
            mat = _normalize(_vec_matrix(batch.column(vec_column)))
            ids = _ids_array(batch.column(id_column))
            sims = mat @ c.T
            assign = np.argmax(sims, axis=1)
            best = sims[np.arange(len(mat)), assign]
            bkey = int(ids.min())
            order = np.argsort(assign, kind="stable")
            a_s = assign[order]
            run_starts = np.flatnonzero(np.r_[True, a_s[1:] != a_s[:-1]])
            run_ends = np.r_[run_starts[1:], len(a_s)]
            out_c, out_n, out_s, out_sim = [], [], [], []
            for rs, re_ in zip(run_starts, run_ends):
                sel = order[rs:re_]
                out_c.append(int(a_s[rs]))
                out_n.append(len(sel))
                out_s.append(mat[sel].sum(axis=0).tobytes())
                out_sim.append(float(best[sel].sum()))
            return pa.table({
                "cell": pa.array(out_c, pa.int64()),
                "block_key": pa.array(
                    [bkey] * len(out_c), pa.int64()),
                "n": pa.array(out_n, pa.int64()),
                "s": pa.array(out_s, pa.large_binary()),
                "simsum": pa.array(out_sim, pa.float64()),
            })

        rows = ds.map_batches(moments, batch_format="pyarrow",
                              batch_size=None,
                              runtime_env=runtime_env()).take_all()
        rows.sort(key=lambda r: (r["cell"], r["block_key"]))
        sums = np.zeros((len(cents), dim), np.float64)
        counts = np.zeros(len(cents), np.int64)
        total_sim = 0.0
        for r in rows:
            sums[r["cell"]] += np.frombuffer(r["s"], np.float64)
            counts[r["cell"]] += r["n"]
            total_sim += r["simsum"]
        sim_totals.append(total_sim)
        empties = np.flatnonzero(counts == 0)
        new_cents = sums.copy()
        if len(empties):
            worst = np.argsort((sample @ cents.T).max(axis=1),
                               kind="stable")
            for c, p in zip(empties.tolist(), worst[:len(empties)]):
                new_cents[c] = sample[p]
        cents = _normalize(new_cents)

    cents_ref = ray.put(cents)

    def assign_final(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return empty
        mat = _normalize(_vec_matrix(batch.column(vec_column)))
        cell = np.argmax(mat @ cached_get(cents_ref).T, axis=1)
        return pa.table({
            "vec_id": pa.array(_ids_array(batch.column(id_column)),
                               pa.int64()),
            "cell": pa.array(cell.astype(np.int64), pa.int64()),
        })

    return cents, ds.map_batches(assign_final, batch_format="pyarrow",
                                 runtime_env=runtime_env()), sim_totals


def ivf_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    train_sample: int = 2048,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    index_dir: Optional[str] = None,
) -> pa.Table:
    """IVF ANN: spherical-k-means coarse quantizer; each vector is assigned
    to its nearest centroid cell, each query scans only its ``n_probe``
    nearest cells.

    Scale shape: training touches a driver-side sample only; assignment is
    one matmul per batch against the broadcast centroids.  With
    ``index_dir`` set, the assignment is materialized as parquet
    partitioned by ``cell`` (hive layout) and query time reads ONLY the
    probed cells' partitions — non-probed data never leaves storage
    (:func:`_cell_paths` is the pruning step).  Without it, cells are
    carried as a column and filtered per batch (single-shot mode: the
    corpus is scanned once but only probed rows are scored).
    """
    import ray

    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))

    if index_dir is not None:
        # build-once / probe-many split: materialize the hive index,
        # then answer this call through the pure probe path
        meta = ivf_build_index(ds, index_dir, n_cells=n_cells,
                               train_sample=train_sample,
                               id_column=id_column,
                               vec_column=vec_column)
        if meta is None:  # empty dataset: empty result, not a crash
            return _merge_topk([], len(queries), k)
        return ivf_probe_index(index_dir, queries, k=k, n_probe=n_probe)

    cents = train_centroids(ds, n_cells, train_sample, id_column, vec_column)
    if cents is None:  # empty / fully-filtered dataset: empty, not a crash
        return _merge_topk([], len(queries), k)
    cents_ref = ray.put(cents)

    def assign_batch(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "id": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int64()),
                    vec_column: pa.array(
                        [], batch.schema.field(vec_column).type
                    ),
                }
            )
        c = cached_get(cents_ref)
        mat = _normalize(_vec_matrix(batch.column(vec_column)))
        cell = np.argmax(mat @ c.T, axis=1).astype(np.int64)
        return pa.table(
            {
                "id": batch.column(id_column),
                "bucket": pa.array(cell, pa.int64()),
                vec_column: batch.column(vec_column),
            }
        )

    assigned = ds.map_batches(
        assign_batch, batch_format="pyarrow", runtime_env=runtime_env()
    )

    qn = _normalize(queries)
    qcells = np.argsort(-(qn @ cents.T), axis=1)[:, :n_probe]
    qbuckets = [np.sort(qcells[qi].astype(np.int64))
                for qi in range(len(queries))]

    qbuckets_ref = ray.put(qbuckets)
    qref = ray.put(queries)

    partials = assigned.map_batches(
        _probe_score_task,
        fn_kwargs={"qbuckets_ref": qbuckets_ref, "qref": qref, "k": k,
                   "vec_column": vec_column},
        batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    ).take_all()

    return _merge_topk(partials, len(queries), k)


def ivf_build_index(
    ds,
    index_dir: str,
    n_cells: int = 16,
    train_sample: int = 2048,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
) -> Optional[dict]:
    """Build a PERSISTENT IVF index: train the spherical-k-means coarse
    quantizer on a deterministic hash-rank sample, assign every vector
    to its nearest centroid cell, and write the assignment
    hive-partitioned by ``cell`` plus ``centroids.npz`` and a
    ``manifest.json`` — build once, probe many times via
    :func:`ivf_probe_index` (each probe reads ONLY probed cells' files;
    non-probed data never leaves storage).  The directory is cleared
    first (idempotent rebuild).  Returns the manifest dict, or None on
    an empty dataset (nothing written)."""
    import shutil as _shutil
    from pathlib import Path

    import ray

    from .partition import coalesce_by_bytes

    cents = train_centroids(ds, n_cells, train_sample, id_column,
                            vec_column)
    if cents is None:
        return None
    cents_ref = ray.put(cents)

    def assign_cell(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({
                "id": pa.array([], pa.int64()),
                "bucket": pa.array([], pa.int64()),
                vec_column: pa.array(
                    [], batch.schema.field(vec_column).type),
                "cell": pa.array([], pa.int64()),
            })
        c = cached_get(cents_ref)
        mat = _normalize(_vec_matrix(batch.column(vec_column)))
        cell = np.argmax(mat @ c.T, axis=1).astype(np.int64)
        return pa.table({
            "id": batch.column(id_column),
            "bucket": pa.array(cell, pa.int64()),
            vec_column: batch.column(vec_column),
            "cell": pa.array(cell, pa.int64()),
        })

    if Path(index_dir).exists():
        _shutil.rmtree(index_dir)
    coalesce_by_bytes(ds.map_batches(
        assign_cell, batch_format="pyarrow", runtime_env=runtime_env()
    )).write_parquet(index_dir, partition_cols=["cell"])
    np.savez(str(Path(index_dir) / "centroids.npz"), cents=cents)
    meta = {"kind": "ivf", "n_cells": int(len(cents)),
            "vec_column": vec_column}
    _write_index_manifest(index_dir, meta)
    return meta


def ivf_probe_index(
    index_dir: str,
    queries: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
) -> pa.Table:
    """Probe a prebuilt :func:`ivf_build_index` directory: load the
    centroids + manifest, pick each query's ``n_probe`` nearest cells,
    and score ONLY those cells' parquet files.  No re-training, no full
    scan; safe to call many times against one build."""
    from pathlib import Path

    import ray

    meta = _read_index_manifest(index_dir)
    assert meta["kind"] == "ivf", meta
    cents = np.load(str(Path(index_dir) / "centroids.npz"))["cents"]
    vec_column = meta["vec_column"]

    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    qn = _normalize(queries)
    qcells = np.argsort(-(qn @ cents.T), axis=1)[:, :n_probe]
    qbuckets = [np.sort(qcells[qi].astype(np.int64))
                for qi in range(len(queries))]
    paths = _cell_paths(index_dir, np.concatenate(qbuckets))
    if not paths:
        return _merge_topk([], len(queries), k)
    assigned = ray.data.read_parquet(paths)

    qbuckets_ref = ray.put(qbuckets)
    qref = ray.put(queries)
    partials = assigned.map_batches(
        _probe_score_task,
        fn_kwargs={"qbuckets_ref": qbuckets_ref, "qref": qref, "k": k,
                   "vec_column": vec_column},
        batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    ).take_all()
    return _merge_topk(partials, len(queries), k)


# ── PQ (product-quantization) ANN ────────────────────────────────────────────

_PQ_SEED = 0x90D


def _euclidean_kmeans(sample: np.ndarray, k: int, n_iters: int = 10,
                      seed: int = _PQ_SEED):
    """Deterministic Euclidean k-means on a driver-side sample — the
    per-subspace codebook trainer for PQ (reconstruction error, not
    angle, is what PQ minimizes, so this is NOT the spherical variant).
    Empty cells reseed to the worst-served sample point, same policy as
    :func:`_spherical_kmeans`."""
    rng = np.random.default_rng(seed)
    cents = sample[rng.choice(len(sample), size=min(k, len(sample)),
                              replace=False)].copy()
    for _ in range(n_iters):
        d2 = (
            (sample * sample).sum(axis=1)[:, None]
            - 2.0 * (sample @ cents.T)
            + (cents * cents).sum(axis=1)[None, :]
        )
        assign = np.argmin(d2, axis=1)
        empties = []
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
            else:
                empties.append(c)
        if empties:
            worst = np.argsort(-d2.min(axis=1), kind="stable")
            for c, p in zip(empties, worst[: len(empties)]):
                cents[c] = sample[p]
    return cents


def train_pq_codebooks(sample: np.ndarray, m_subspaces: int,
                       n_codes: int) -> np.ndarray:
    """(M, K, sub_dim) per-subspace Euclidean codebooks from a
    NORMALIZED driver-side sample."""
    if n_codes > 256:
        # codes are stored uint8: a larger codebook would silently WRAP
        # indices modulo 256 at encode time (garbage ADC scores, no error)
        raise ValueError(f"n_codes must be <= 256 (uint8 codes), "
                         f"got {n_codes}")
    dim = sample.shape[1]
    if dim % m_subspaces:
        raise ValueError(
            f"dim {dim} not divisible by m_subspaces {m_subspaces}")
    sd = dim // m_subspaces
    return np.stack([
        _euclidean_kmeans(sample[:, j * sd:(j + 1) * sd], n_codes,
                          seed=_PQ_SEED + j)
        for j in range(m_subspaces)
    ])


def pq_encode(ds, books: np.ndarray, id_column: str = "vec_id",
              vec_column: str = "embedding"):
    """Encode every vector to its (id, codes) PQ row — ``M`` one-byte
    codes per vector (the 32× compression that makes the code table the
    persistable scan index).  One broadcast matmul per batch."""
    import ray

    m_subspaces, _, sd = books.shape
    books_ref = ray.put(books)

    def encode(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"id": pa.array([], pa.int64()),
                             "codes": pa.array([], pa.large_binary())})
        b = cached_get(books_ref)
        mat = _normalize(_vec_matrix(batch.column(vec_column)))
        n = len(mat)
        codes = np.empty((n, m_subspaces), np.uint8)
        for j in range(m_subspaces):
            sub = mat[:, j * sd:(j + 1) * sd]
            cj = b[j]
            # argmin ||sub - c||² == argmax (sub·c - |c|²/2)
            codes[:, j] = np.argmax(
                sub @ cj.T - 0.5 * (cj * cj).sum(axis=1)[None, :], axis=1
            ).astype(np.uint8)
        return pa.table({
            "id": pa.array(_ids_array(batch.column(id_column)), pa.int64()),
            "codes": pa.array([codes[i].tobytes() for i in range(n)],
                              pa.large_binary()),
        })

    return ds.map_batches(encode, batch_format="pyarrow",
                          runtime_env=runtime_env())


def pq_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    m_subspaces: int = 8,
    n_codes: int = 64,
    train_sample: int = 2048,
    rerank_factor: int = 4,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
):
    """Product-quantization ANN with asymmetric distance computation
    (Jégou et al. 2011, "Product Quantization for Nearest Neighbor
    Search") — THE compressed-domain scan behind web-scale vector
    search: each normalized vector is encoded as ``m_subspaces`` one-byte
    codes (64-dim float32 → 8 bytes, a 32× compression), and a query
    scores a vector as ``Σ_j LUT[j, code_j]`` — one table gather per
    subspace, never touching the original floats.

    Scale shape: codebooks train on the bounded hash-rank sample (same
    discipline as :func:`train_centroids`); encoding is one broadcast
    matmul per batch and MATERIALIZES the compact code table (the point
    of PQ — the scan working set shrinks 32×); the ADC scan computes
    per-query LUTs once, gathers per batch, and emits per-batch partial
    top-k into the tiny global merge.  Approximate by construction
    (quantization error bounds recall) — rows-only, recall pinned vs
    brute in tests."""
    import ray

    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))

    sample = hash_rank_sample(ds, train_sample, id_column, vec_column)
    if sample is None:
        return _merge_topk([], len(queries), k)
    books = train_pq_codebooks(_normalize(sample), m_subspaces, n_codes)
    m_subspaces, _, sd = books.shape

    code_ds = pq_encode(ds, books, id_column=id_column,
                        vec_column=vec_column).materialize()

    qn = _normalize(queries)
    # LUT[qi, j, c] = q_sub_j · centroid_c  →  score = Σ_j LUT[qi, j, code_j]
    lut = np.einsum("qjd,jkd->qjk",
                    qn.reshape(len(qn), m_subspaces, sd), books)
    lut_ref = ray.put(lut)

    def scan(batch: pa.Table, kk=k) -> pa.Table:
        if len(batch) == 0:
            return _empty_scores()
        lt = cached_get(lut_ref)
        ids = batch.column("id").combine_chunks().to_numpy(
            zero_copy_only=False)
        codes = np.frombuffer(
            b"".join(batch.column("codes").to_pylist()), dtype=np.uint8
        ).reshape(len(ids), m_subspaces)
        cols = np.arange(m_subspaces)
        out_q, out_id, out_s = [], [], []
        for qi in range(lt.shape[0]):
            scores = lt[qi][cols[None, :], codes].sum(axis=1)
            top = np.lexsort((ids, -scores))[:kk]
            out_q.extend([qi] * len(top))
            out_id.extend(int(ids[t]) for t in top)
            out_s.extend(float(scores[t]) for t in top)
        return pa.table({
            "query_idx": pa.array(out_q, pa.int32()),
            "id": pa.array(out_id, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        })

    short = max(k, k * rerank_factor)
    partials = code_ds.map_batches(
        scan, fn_kwargs={"kk": short},
        batch_format="pyarrow", batch_size=None, runtime_env=runtime_env()
    ).take_all()
    if rerank_factor <= 1:
        return _merge_topk(partials, len(queries), k)

    shortlist = _merge_topk(partials, len(queries), short)
    return _exact_rerank(ds, shortlist, queries, k,
                         id_column=id_column, vec_column=vec_column)


def _exact_rerank(ds, shortlist: pa.Table, queries: np.ndarray, k: int,
                  id_column: str = "vec_id",
                  vec_column: str = "embedding") -> pa.Table:
    """Exact re-rank of an approximate shortlist (the deployed ANN
    shape: compressed/pruned scan for the 99.9 %, float math for the
    survivors): the per-query shortlists union into one bounded id set,
    broadcast as a sorted array, and one masked pass over the ORIGINAL
    vectors scores just those rows.  Shared by pq_topk and
    ivfpq_topk."""
    import ray

    cand_ids = np.unique(np.asarray(
        shortlist.column("id").to_pylist(), dtype=np.int64))
    cand_ref = ray.put(cand_ids)
    qref = ray.put(queries)

    def exact_on_shortlist(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _empty_scores()
        ids = _ids_array(batch.column(id_column))
        cids = cached_get(cand_ref)
        pos = np.searchsorted(cids, ids)
        pos[pos >= len(cids)] = len(cids) - 1 if len(cids) else 0
        keep = cids[pos] == ids if len(cids) else np.zeros(len(ids), bool)
        if not keep.any():
            return _empty_scores()
        return brute_score_task(
            batch.filter(pa.array(keep)), query_ref=qref, k=k,
            id_column=id_column, vec_column=vec_column)

    exact_partials = ds.map_batches(
        exact_on_shortlist, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    ).take_all()
    return _merge_topk(exact_partials, len(queries), k)


def ivfpq_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    m_subspaces: int = 8,
    n_codes: int = 64,
    train_sample: int = 2048,
    rerank_factor: int = 4,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
):
    """IVF-PQ — the canonical web-scale ANN stack (faiss "IVFx,PQy"):
    coarse cells PRUNE the scan (only ``n_probe`` of ``n_cells`` cells
    are scored per query), PQ codes COMPRESS it (8 bytes/vector), and
    the exact re-rank restores precision on the bounded shortlist.
    Codes quantize the raw normalized vectors (the ``by_residual=False``
    variant — residual encoding would add a second codebook pass for
    extra recall; documented trade-off, not an omission).

    One hash-rank sample trains BOTH quantizers; one map assigns cell +
    code per vector into the materialized compact index table
    (id, cell, codes); the ADC scan masks each batch to each query's
    probed cells before the LUT gather — shuffle-free end to end."""
    import ray

    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))

    sample = hash_rank_sample(ds, train_sample, id_column, vec_column)
    if sample is None:
        return _merge_topk([], len(queries), k)
    cents = _spherical_kmeans(sample, n_cells)
    books = train_pq_codebooks(_normalize(sample), m_subspaces, n_codes)
    m_subspaces, _, sd = books.shape
    cents_ref = ray.put(cents)
    books_ref = ray.put(books)

    def assign_encode(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"id": pa.array([], pa.int64()),
                             "cell": pa.array([], pa.int64()),
                             "codes": pa.array([], pa.large_binary())})
        mat = _normalize(_vec_matrix(batch.column(vec_column)))
        cell = np.argmax(mat @ cached_get(cents_ref).T, axis=1)
        b = cached_get(books_ref)
        n = len(mat)
        codes = np.empty((n, m_subspaces), np.uint8)
        for j in range(m_subspaces):
            sub = mat[:, j * sd:(j + 1) * sd]
            cj = b[j]
            codes[:, j] = np.argmax(
                sub @ cj.T - 0.5 * (cj * cj).sum(axis=1)[None, :], axis=1
            ).astype(np.uint8)
        return pa.table({
            "id": pa.array(_ids_array(batch.column(id_column)), pa.int64()),
            "cell": pa.array(cell.astype(np.int64), pa.int64()),
            "codes": pa.array([codes[i].tobytes() for i in range(n)],
                              pa.large_binary()),
        })

    index_ds = ds.map_batches(
        assign_encode, batch_format="pyarrow", runtime_env=runtime_env()
    ).materialize()

    qn = _normalize(queries)
    qcells = np.argsort(-(qn @ cents.T), axis=1)[:, :n_probe]
    probed = [np.sort(qcells[qi]) for qi in range(len(queries))]
    lut = np.einsum("qjd,jkd->qjk",
                    qn.reshape(len(qn), m_subspaces, sd), books)
    state_ref = ray.put((lut, probed))

    short = max(k, k * rerank_factor)

    def scan(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return _empty_scores()
        lt, pb = cached_get(state_ref)
        ids = batch.column("id").combine_chunks().to_numpy(
            zero_copy_only=False)
        cell = batch.column("cell").combine_chunks().to_numpy(
            zero_copy_only=False)
        codes = np.frombuffer(
            b"".join(batch.column("codes").to_pylist()), dtype=np.uint8
        ).reshape(len(ids), m_subspaces)
        cols = np.arange(m_subspaces)
        out_q, out_id, out_s = [], [], []
        for qi in range(lt.shape[0]):
            pos = np.searchsorted(pb[qi], cell)
            pos[pos >= len(pb[qi])] = len(pb[qi]) - 1
            mask = pb[qi][pos] == cell  # this query's probed cells only
            if not mask.any():
                continue
            mids, mcodes = ids[mask], codes[mask]
            scores = lt[qi][cols[None, :], mcodes].sum(axis=1)
            top = np.lexsort((mids, -scores))[:short]
            out_q.extend([qi] * len(top))
            out_id.extend(int(mids[t]) for t in top)
            out_s.extend(float(scores[t]) for t in top)
        if not out_q:
            return _empty_scores()
        return pa.table({
            "query_idx": pa.array(out_q, pa.int32()),
            "id": pa.array(out_id, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        })

    partials = index_ds.map_batches(
        scan, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env()
    ).take_all()
    if rerank_factor <= 1:
        return _merge_topk(partials, len(queries), k)
    shortlist = _merge_topk(partials, len(queries), short)
    return _exact_rerank(ds, shortlist, queries, k,
                         id_column=id_column, vec_column=vec_column)


def knn_graph(
    ds,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    k: int = 3,
    target_block_bytes: int = 64 << 20,
):
    """EXACT cosine k-NN graph: for every vector its ``k`` nearest
    neighbors (self excluded), ``(vec_id, rank, nbr_id)`` — the
    construction step behind SemDeDup-style pruning, kNN-classifier
    features and graph-based clustering.

    Same block-pair plan as ``dedup.embedding_neardup_pairs`` (one task
    per (block_i, block_j), two blocks resident per task), but each
    task emits a PER-ROW partial top-k against the paired block in BOTH
    directions — task output is O(rows·k + ties), never the O(rows²)
    sim matrix.  The per-row selection is the O(cols) k-th-value
    threshold (``np.partition``) with ALL ties of the boundary value
    kept — a guaranteed superset of the true (sim DESC, id ASC) top-k,
    so the single-key lexsort/run-rank merge is exact (a full per-row
    argsort would cost an extra log-factor that dominates the matmul
    at block widths ≥ ~4k)."""
    import ray

    from .dedup import run_rank

    proj = ds.select_columns([id_column, vec_column]).materialize()
    # chunk by bytes, but never below ~(k+1) rows per chunk — the pair
    # grid is K(K+1)/2 tasks, and sliver blocks would drown the matmuls
    # in scheduling (and make within-block self-exclusion degenerate)
    row_cap = max(1, proj.count() // max(16, k + 1))
    n_chunks = max(1, min(-(-proj.size_bytes() // target_block_bytes),
                          row_cap))
    if n_chunks != proj.num_blocks():
        # both directions: coalesce tiny read blocks AND split a
        # single-block in-memory table so the pair grid has parallelism
        proj = proj.repartition(n_chunks).materialize()
    blocks = proj.to_arrow_refs()
    k_blocks = len(blocks)
    refs_ref = ray.put(blocks)
    idx_ds = ray.data.from_items(
        [{"i": i, "j": j} for i in range(k_blocks) for j in range(i, k_blocks)]
    )

    def _load(refs, idx):
        t = ray.get(refs[idx])
        ids = _ids_array(t.column(id_column))
        mat = _normalize(_vec_matrix(t.column(vec_column)))
        return ids, mat

    def _row_topk(row_ids, col_ids, sims, self_mask: bool):
        if self_mask:
            eq = row_ids[:, None] == col_ids[None, :]
            sims = np.where(eq, -np.inf, sims)
        c = sims.shape[1]
        if c <= k:
            mask = np.isfinite(sims)
        else:
            # k-th largest value per row; keep EVERY column at or above
            # it — ties included, so the superset is exact under any
            # tie-break the merge later applies
            kth = np.partition(sims, c - k, axis=1)[:, c - k]
            mask = (sims >= kth[:, None]) & np.isfinite(sims)
        ri, ci = np.nonzero(mask)
        return row_ids[ri], col_ids[ci], sims[ri, ci]

    def chunk_topk(batch: pa.Table) -> pa.Table:
        refs = cached_get(refs_ref)
        vs, ns, ss = [], [], []
        for i, j in zip(batch.column("i").to_pylist(),
                        batch.column("j").to_pylist()):
            ids_a, ma = _load(refs, i)
            if not len(ids_a):
                continue
            if i == j:
                ids_b, mb = ids_a, ma
            else:
                ids_b, mb = _load(refs, j)
                if not len(ids_b):
                    continue
            sims = ma @ mb.T
            v, nb, s = _row_topk(ids_a, ids_b, sims, self_mask=(i == j))
            vs.append(v); ns.append(nb); ss.append(s)
            if i != j:
                v, nb, s = _row_topk(ids_b, ids_a, sims.T, self_mask=False)
                vs.append(v); ns.append(nb); ss.append(s)
        if not vs:
            return pa.table({
                "vec_id": pa.array([], pa.int64()),
                "nbr_id": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            })
        return pa.table({
            "vec_id": pa.array(np.concatenate(vs), pa.int64()),
            "nbr_id": pa.array(np.concatenate(ns), pa.int64()),
            "sim": pa.array(np.concatenate(ss), pa.float64()),
        })

    part = idx_ds.map_batches(chunk_topk, batch_format="pyarrow",
                              runtime_env=runtime_env())

    def merge(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "vec_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "nbr_id": pa.array([], pa.int64()),
            })
        vid = batch.column("vec_id").combine_chunks().to_numpy(
            zero_copy_only=False)
        nbr = batch.column("nbr_id").combine_chunks().to_numpy(
            zero_copy_only=False)
        sim = batch.column("sim").combine_chunks().to_numpy(
            zero_copy_only=False)
        order = np.lexsort((nbr, -sim, vid))
        rr = run_rank(vid[order])
        keep = order[rr < k]
        ranks = rr[rr < k] + 1
        return pa.table({
            "vec_id": pa.array(vid[keep], pa.int64()),
            "rank": pa.array(ranks, pa.int64()),
            "nbr_id": pa.array(nbr[keep], pa.int64()),
        })

    return part.sort("vec_id").map_batches(
        merge, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env())


def mmr_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    pool: int = 100,
    lam: float = 0.7,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
) -> pa.Table:
    """Diversified retrieval — Maximal Marginal Relevance (Carbonell &
    Goldstein '98): greedily select ``k`` results maximizing
    ``lam·rel(q, d) − (1−lam)·max_sim(d, selected)`` so near-duplicate
    hits don't crowd the result list.  Returns ``(query_idx, rank,
    id)`` — rank is the greedy selection order (rank 1 is always the
    plain relevance argmax).

    Distributed shape: relevance is the exact distributed top-``pool``
    scan (:func:`brute_topk` — per-block partial top-k, tiny merge);
    only the POOL re-enters the driver: pool ids fetch their vectors
    through a broadcast-mask batch filter, and the greedy loop runs on
    a pool×pool similarity matrix bounded by the ``pool`` knob — never
    the corpus.  An incremental running max-sim-to-selected keeps the
    loop O(k·pool) after the one O(pool²) matmul.  Ties break
    ``(-mmr, id)`` deterministically (same rule as brute_topk)."""
    import ray

    from .. import runtime_env
    from ..broadcast import cached_get

    queries = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    nq = len(queries)
    cand = brute_topk(ds, queries, k=pool,
                      id_column=id_column, vec_column=vec_column)

    pool_ids = np.unique(
        cand.column("id").combine_chunks().to_numpy(zero_copy_only=False))
    if pool_ids.size == 0:
        return pa.table({"query_idx": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "id": pa.array([], pa.int64())})
    ref = ray.put(pool_ids)  # sorted (np.unique)

    def pool_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select([id_column, vec_column])
        wanted = cached_get(ref)
        ids = batch.column(id_column).combine_chunks().to_numpy(
            zero_copy_only=False)
        pos = np.searchsorted(wanted, ids)
        pos[pos == len(wanted)] = 0
        hit = wanted[pos] == ids
        return batch.filter(pa.array(hit)).select([id_column, vec_column])

    # ≤ nq·pool rows — bounded by the knobs, documented driver residency
    fetched = ds.map_batches(pool_rows, batch_format="pyarrow",
                             runtime_env=runtime_env()).take_all()
    vec_of = {int(r[id_column]): np.asarray(r[vec_column], np.float64)
              for r in fetched}

    out_q, out_r, out_id = [], [], []
    for qi in range(nq):
        mask = cand.column("query_idx").combine_chunks().to_numpy(
            zero_copy_only=False) == qi
        ids = cand.column("id").combine_chunks().to_numpy(
            zero_copy_only=False)[mask]
        rel = cand.column("score").combine_chunks().to_numpy(
            zero_copy_only=False)[mask]
        if ids.size == 0:
            continue
        mat = _normalize(np.stack([vec_of[int(i)] for i in ids]))
        sims = mat @ mat.T
        m = len(ids)
        max_sim = np.zeros(m)          # max sim to the selected set
        taken = np.zeros(m, dtype=bool)
        for rank in range(1, min(k, m) + 1):
            mmr = lam * rel - (1.0 - lam) * max_sim
            mmr[taken] = -np.inf
            best = np.lexsort((ids, -mmr))[0]
            out_q.append(qi)
            out_r.append(rank)
            out_id.append(int(ids[best]))
            taken[best] = True
            max_sim = np.maximum(max_sim, sims[:, best])
    return pa.table({
        "query_idx": pa.array(out_q, pa.int64()),
        "rank": pa.array(out_r, pa.int64()),
        "id": pa.array(out_id, pa.int64()),
    })


def pca_project(
    ds,
    n_components: int = 2,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
):
    """Distributed PCA projection: ``(id, pc0..pc{n-1})`` — the
    feature-reduction / visualization primitive (and the whitening
    step in front of IVF/PQ indexing).

    Two-pass moment shape: pass 1 is a per-block COMBINER emitting one
    ``(n, Σx, ΣxᵀX)`` row per block (d + d² floats as large_binary
    blobs — the Arrow LIST-payload rule); the driver merges O(blocks)
    partials into the covariance, one ``eigh`` of the d×d matrix (d is
    the embedding width — driver-trivial), sign-fixes each component
    (largest-|coordinate| positive, lowest index on ties) so the basis
    is deterministic up to float-sum ulps; pass 2 broadcasts the
    component matrix and projects every batch with one matmul.
    Returns the lazy projected Dataset and the (components, mean,
    explained_var) model triple."""
    import ray

    from .. import runtime_env
    from ..broadcast import cached_get

    def moments(batch: pa.Table) -> pa.Table:
        mat = _vec_matrix(batch.column(vec_column)) \
            if batch.num_rows else None
        if mat is None or len(mat) == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.large_binary()),
                             "ss": pa.array([], pa.large_binary())})
        return pa.table({
            "n": pa.array([len(mat)], pa.int64()),
            "s": pa.array([mat.sum(axis=0).tobytes()], pa.large_binary()),
            "ss": pa.array([(mat.T @ mat).tobytes()], pa.large_binary()),
        })

    parts = ds.map_batches(moments, batch_format="pyarrow",
                           batch_size=None,
                           runtime_env=runtime_env()).take_all()
    parts = [p for p in parts if p["n"]]
    if not parts:
        empty = pa.table(
            {id_column: pa.array([], pa.int64()),
             **{f"pc{i}": pa.array([], pa.float64())
                for i in range(n_components)}})
        return ray.data.from_arrow(empty), None

    n = sum(int(p["n"]) for p in parts)
    s0 = np.frombuffer(parts[0]["s"], np.float64)
    d = len(s0)
    tot_s = np.zeros(d)
    tot_ss = np.zeros((d, d))
    for p in parts:  # fixed driver order → deterministic float merge
        tot_s += np.frombuffer(p["s"], np.float64)
        tot_ss += np.frombuffer(p["ss"], np.float64).reshape(d, d)
    mean = tot_s / n
    cov = tot_ss / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    comp = evecs[:, ::-1][:, :n_components].T.copy()
    explained = evals[::-1][:n_components].copy()
    for i in range(len(comp)):  # deterministic sign: peak coord positive
        j = int(np.argmax(np.abs(comp[i])))
        if comp[i, j] < 0:
            comp[i] = -comp[i]
    ref = ray.put((comp, mean))

    def project(batch: pa.Table) -> pa.Table:
        cmat, mu = cached_get(ref)
        mat = _vec_matrix(batch.column(vec_column)) \
            if batch.num_rows else None
        cols = {id_column: batch.column(id_column)}
        proj = (mat - mu) @ cmat.T if mat is not None and len(mat) else \
            np.empty((0, len(cmat)))
        for i in range(len(cmat)):
            cols[f"pc{i}"] = pa.array(proj[:, i], pa.float64())
        return pa.table(cols)

    out = ds.map_batches(project, batch_format="pyarrow",
                         runtime_env=runtime_env())
    return out, (comp, mean, explained)
