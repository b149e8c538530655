"""Connected components over a pair graph — the clustering step of
near-duplicate dedup (group mutually-similar docs, keep one
representative per cluster).

Iterative dataflow (Ray Data has no loop operator, so the driver drives
the fixpoint — the same pattern as the BFS generation loop):

* state = labels dataset ``(id, label)``, label starts as the id;
* one round = hash-join edges with labels on the source endpoint,
  re-key the propagated label to the destination, union with the
  current labels, and take the native grouped MIN — labels only ever
  decrease toward the component's minimum id;
* convergence check = ``sum(label)``: strictly decreasing while any
  label changes (integer, monotone), so fixpoint == unchanged sum —
  an O(1)-row aggregate per round, no driver pass over the labels.

Each round is one shuffle join + one grouped aggregate; rounds needed =
graph diameter (near-dup clusters are shallow — a handful of rounds).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import runtime_env


def _unionfind_labels(a: "np.ndarray", b: "np.ndarray"):
    """Linear-ish-time union-find over int64 edge endpoint arrays:
    ``(sorted_ids, min_id_of_component)`` — the LOCAL finish of
    :func:`connected_components`, run inside one Ray task on a
    size-gated graph."""
    ids = np.unique(np.concatenate((a, b)))
    ai = np.searchsorted(ids, a)
    bi = np.searchsorted(ids, b)
    parent = np.arange(len(ids), dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for x, y in zip(ai.tolist(), bi.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            # union by MIN root index: ids is sorted, so the root with
            # the smaller index has the smaller id — the component's
            # final label falls out of the union rule directly
            if rx < ry:
                parent[ry] = rx
            else:
                parent[rx] = ry
    roots = np.array([find(x) for x in range(len(ids))], np.int64)
    return ids, ids[roots]


def connected_components(
    pairs_ds, max_rounds: int = 50, broadcast_below: int = 2_000_000,
    local_cutoff: int = 2_000_000,
):
    """(id, cluster_id=min id in component) for every id appearing in the
    ``(id_a, id_b)`` pair dataset.

    Size-gated LOCAL finish first: below ``local_cutoff`` pair rows the
    edge blocks ship as refs to ONE union-find task (linear time; the
    same below-cutoff discipline as every broadcast gate here — a
    min-label round costs O(diameter) exchanges that a subgraph fitting
    one worker never needs; ``local_cutoff=0`` forces the distributed
    rounds, which tests pin).  Above it: when the label table is small
    (< ``broadcast_below`` nodes — the common case: near-dup graphs are
    a sliver of the corpus), each round propagates via a broadcast
    (id → label) lookup inside ``map_batches`` over the distributed
    edges — no join shuffle at all.  Larger graphs fall back to the
    native hash-shuffle join per round."""
    import ray
    import ray.data.aggregate as agg_mod

    from ..broadcast import cached_get

    def to_edges(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").combine_chunks().to_numpy(zero_copy_only=False)
        b = batch.column("id_b").combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": pa.array(np.concatenate([a, b]), pa.int64()),
                "v": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    edges = pairs_ds.map_batches(
        to_edges, batch_format="pyarrow", runtime_env=runtime_env()
    ).materialize()

    if edges.count() <= 2 * local_cutoff:  # edges carry both directions
        edge_refs = edges.to_arrow_refs()

        @ray.remote(runtime_env=runtime_env())
        def _local(erefs):
            import ray as _r
            etbls = _r.get(list(erefs))

            def col(name):
                arrs = [t.column(name).combine_chunks().to_numpy(
                    zero_copy_only=False) for t in etbls if t.num_rows]
                return (np.concatenate(arrs) if arrs
                        else np.empty(0, np.int64))

            ids, labels = _unionfind_labels(col("u"), col("v"))
            return pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "cluster_id": pa.array(labels, pa.int64())})

        return ray.data.from_arrow_refs([_local.remote(edge_refs)])

    def min_labels(ds):
        # (id, label) -> one row per id with the min label; only the
        # aggregate column needs renaming back
        agg = ds.groupby("id").aggregate(agg_mod.Min("label"))

        def rename(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(
                ["label" if c == "min(label)" else c for c in batch.column_names]
            )

        return agg.map_batches(
            rename, batch_format="pyarrow", runtime_env=runtime_env()
        )

    # labels0: every endpoint labeled with itself (u covers both
    # directions since edges are symmetric)
    labels = min_labels(
        edges.map_batches(
            lambda b: pa.table({"id": b.column("u"), "label": b.column("u")}),
            batch_format="pyarrow", runtime_env=runtime_env(),
        )
    ).materialize()
    prev_sum = labels.sum("label")

    small = labels.count() < broadcast_below
    # join inputs must be empty-block-free (CLAUDE.md: Ray 2.49's acero
    # join crashes on ANY empty block); edges is materialized, so this
    # is a one-time metadata check
    from .partition import coalesce_nonempty

    edges_j = None if small else coalesce_nonempty(edges)

    def propagate(labels_ds):
        if not small:
            labels_nz = coalesce_nonempty(labels_ds)
            if edges_j is None or labels_nz is None:
                return labels_ds  # nothing to propagate
            # large-graph path: hash-shuffle join per round
            return edges_j.join(
                labels_nz, "inner",
                num_partitions=max(2, edges.num_blocks() // 4),
                on=("u",), right_on=("id",),
            ).map_batches(
                lambda b: pa.table(
                    {"id": b.column("v"), "label": b.column("label")}
                ),
                batch_format="pyarrow", runtime_env=runtime_env(),
            )
        rows = labels_ds.take_all()
        ids = np.fromiter((r["id"] for r in rows), np.int64, len(rows))
        lbl = np.fromiter((r["label"] for r in rows), np.int64, len(rows))
        order = np.argsort(ids)
        ref = ray.put((ids[order], lbl[order]))

        def lookup(batch: pa.Table, _ref=ref) -> pa.Table:
            sids, slbl = cached_get(_ref)
            u = batch.column("u").combine_chunks().to_numpy(zero_copy_only=False)
            pos = np.searchsorted(sids, u)  # every u is in the label table
            return pa.table(
                {
                    "id": batch.column("v"),
                    "label": pa.array(slbl[pos], pa.int64()),
                }
            )

        return edges.map_batches(
            lookup, batch_format="pyarrow", runtime_env=runtime_env()
        )

    converged = False
    for _ in range(max_rounds):
        # propagate: neighbor candidates (v, label(u))
        labels = min_labels(labels.union(propagate(labels))).materialize()
        new_sum = labels.sum("label")
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within {max_rounds} "
            "rounds (component diameter exceeds the bound); raise max_rounds"
        )

    def out(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("id"),
                "cluster_id": batch.column("label"),
            }
        )

    return labels.map_batches(
        out, batch_format="pyarrow", runtime_env=runtime_env()
    )


def pagerank(
    edges_ds,
    nodes_ds,
    iters: int = 5,
    scale: int = 10**12,
    damping_pct: int = 85,
    broadcast_below: int = 2_000_000,
    shuffle_partitions: int | None = None,
    seed_ids=None,
    local_cutoff: int = 2_000_000,
):
    """Integer-deterministic PageRank over an ``(src, dst)`` edge dataset:
    ``(id, score)`` for every node in ``nodes_ds`` (column ``id``) after a
    FIXED number of power iterations.

    All arithmetic is integer (scores scaled by ``scale``; contribution =
    ``score // outdeg``; update = ``((100-d)·init + d·Σcontrib) // 100``)
    so the result is bit-identical regardless of summation order — the
    same determinism rule the cents aggregates follow, and what lets a
    SQL engine reproduce the scores exactly.  Dangling nodes (no
    out-edges) leak their mass — the classic simplification; documented,
    mirrored by the oracle.

    Iterative dataflow, one round per iteration (the connected_components
    pattern): contribution = score lookup on the edge's src — a broadcast
    sorted-array searchsorted while the node count is below
    ``broadcast_below``, a native hash-shuffle join beyond — then ONE
    grouped sum on dst (grouped_agg's partial combiner keeps the shuffle
    at O(blocks × nodes-with-inlinks)), unioned with a zero row per node
    so zero-indegree nodes keep their base score.

    ``seed_ids`` (optional int64 array) switches to PERSONALIZED
    PageRank: teleport mass lands only on the seed set (``init_i =
    scale // |seeds|`` for members, 0 elsewhere) — the crawl-side
    "related pages / recrawl priority from these seeds" ranking.  The
    seed set broadcasts as one sorted array probed with searchsorted
    (a seed set beyond the broadcast cutoff should ship as a
    dataset-side join — documented knob, same gate as subtract_ids).
    """
    import ray

    from ..broadcast import cached_get
    from .agg import grouped_agg
    from .partition import coalesce_nonempty

    # num_blocks() is unavailable on lazy datasets — default the join
    # width to the cluster CPU count instead
    n_parts = shuffle_partitions or max(
        2, int(ray.cluster_resources().get("CPU", 8))
    )

    # out-degree per source, attached to each edge ONCE (not per round)
    deg = grouped_agg(edges_ds, ["src"], [("outdeg", "", "count")])
    edges_nz = coalesce_nonempty(edges_ds)
    deg_nz = coalesce_nonempty(deg)
    n_nodes = nodes_ds.count()
    if seed_ids is None:
        init = scale // max(n_nodes, 1)
        seed_ref = None
        seed_init = 0
    else:
        seeds_sorted = np.sort(np.asarray(seed_ids, np.int64))
        seed_init = scale // max(len(seeds_sorted), 1)
        seed_ref = ray.put(seeds_sorted)
        init = 0  # non-seed teleport mass

    def init_vec(ids: np.ndarray) -> np.ndarray:
        """Per-node teleport mass: uniform, or seed-membership-gated."""
        if seed_ref is None:
            return np.full(len(ids), init, np.int64)
        seeds = cached_get(seed_ref)
        if not len(seeds) or not len(ids):
            return np.zeros(len(ids), np.int64)
        pos = np.searchsorted(seeds, ids)
        pos[pos == len(seeds)] = 0
        return np.where(seeds[pos] == ids, seed_init, 0).astype(np.int64)

    base = (100 - damping_pct) * init

    zeros = nodes_ds.map_batches(
        lambda b: pa.table(
            {"id": b.column("id"),
             "c": pa.array(np.zeros(b.num_rows, np.int64), pa.int64())}
        ),
        batch_format="pyarrow", runtime_env=runtime_env(),
    ).materialize()

    if edges_nz is None or deg_nz is None:
        # no edges: every node keeps the base score ((100-d)·init + 0)//100
        def base_only(b: pa.Table) -> pa.Table:
            ids = b.column("id").combine_chunks().to_numpy(
                zero_copy_only=False)
            iv = init_vec(ids)
            return pa.table(
                {"id": b.column("id"),
                 "score": pa.array(
                     (100 - damping_pct) * iv // 100, pa.int64())})

        return zeros.map_batches(
            base_only, batch_format="pyarrow", runtime_env=runtime_env(),
        )

    edges_w = edges_nz.join(
        deg_nz, "inner", num_partitions=n_parts, on=("src",),
    ).materialize()
    # a join OUTPUT routinely carries empty blocks (hash partitions with
    # no keys) — re-coalesce before edges_w feeds the per-round join
    # below (CLAUDE.md empty-block rule); non-None by construction here
    # (edges_nz is non-empty and every src has a degree row)
    edges_w = coalesce_nonempty(edges_w) or edges_w

    # size-gated LOCAL finish (scc/cc/ktruss/msf discipline): the
    # integer update is bit-identical in any execution, so below the
    # cutoff ONE task runs the whole power iteration over numpy arrays
    # instead of paying iters × (join + grouped-sum) exchanges.  The
    # distributed rounds stay pinned by local_cutoff=0 forced-path
    # tests AND by the SQL oracle (pagerank is hash-checked).
    if n_nodes + edges_w.count() <= local_cutoff:
        node_refs = zeros.to_arrow_refs()
        edge_refs = edges_w.to_arrow_refs()
        seeds_arr = None if seed_ref is None else seeds_sorted

        @ray.remote(runtime_env=runtime_env())
        def _local(nrefs, erefs, _seeds=seeds_arr, _iters=iters,
                   _damp=damping_pct, _init=init, _sinit=seed_init):
            import ray as _r
            ntbls = _r.get(list(nrefs))
            etbls = _r.get(list(erefs))

            def col(tbls, name):
                arrs = [t.column(name).combine_chunks().to_numpy(
                    zero_copy_only=False) for t in tbls if t.num_rows]
                return (np.concatenate(arrs) if arrs
                        else np.empty(0, np.int64))

            src = col(etbls, "src")
            dst = col(etbls, "dst")
            odeg = col(etbls, "outdeg")
            # distributed semantics: score rows exist for nodes ∪ dsts
            # (the contribution union); srcs are nodes by contract
            ids = np.unique(np.concatenate((col(ntbls, "id"), dst)))
            si = np.searchsorted(ids, src)
            di = np.searchsorted(ids, dst)
            if _seeds is None:
                iv = np.full(len(ids), _init, np.int64)
            elif len(_seeds):
                pos = np.minimum(np.searchsorted(_seeds, ids),
                                 len(_seeds) - 1)
                iv = np.where(_seeds[pos] == ids, _sinit, 0).astype(
                    np.int64)
            else:
                iv = np.zeros(len(ids), np.int64)
            base_v = (100 - _damp) * iv
            s = iv.copy()
            for _ in range(_iters):
                csum = np.zeros(len(ids), np.int64)
                if len(src):
                    np.add.at(csum, di, s[si] // odeg)
                s = (base_v + _damp * csum) // 100
            return pa.table({"id": pa.array(ids, pa.int64()),
                             "score": pa.array(s, pa.int64())})

        return ray.data.from_arrow_refs(
            [_local.remote(node_refs, edge_refs)])

    small = n_nodes < broadcast_below

    # scores start at the teleport vector: uniform init, or seed-gated
    def start(b: pa.Table) -> pa.Table:
        ids = b.column("id").combine_chunks().to_numpy(
            zero_copy_only=False)
        return pa.table(
            {"id": b.column("id"),
             "s": pa.array(init_vec(ids), pa.int64())})

    scores = zeros.map_batches(
        start, batch_format="pyarrow", runtime_env=runtime_env(),
    ).materialize()

    def contributions(scores_ds):
        """(id=dst, c=score[src] // outdeg) for every edge."""
        if small:
            rows = scores_ds.take_all()
            ids = np.fromiter((r["id"] for r in rows), np.int64, len(rows))
            s = np.fromiter((r["s"] for r in rows), np.int64, len(rows))
            order = np.argsort(ids)
            ref = ray.put((ids[order], s[order]))

            def lookup(batch: pa.Table, _ref=ref) -> pa.Table:
                sids, sv = cached_get(_ref)
                src = batch.column("src").combine_chunks().to_numpy(
                    zero_copy_only=False
                )
                deg_v = batch.column("outdeg").combine_chunks().to_numpy(
                    zero_copy_only=False
                )
                pos = np.searchsorted(sids, src)  # every src is a node
                return pa.table(
                    {
                        "id": batch.column("dst"),
                        "c": pa.array(sv[pos] // deg_v, pa.int64()),
                    }
                )

            return edges_w.map_batches(
                lookup, batch_format="pyarrow", runtime_env=runtime_env()
            )
        sc_nz = coalesce_nonempty(scores_ds)
        return edges_w.join(
            sc_nz, "inner", num_partitions=n_parts,
            on=("src",), right_on=("id",),
        ).map_batches(
            lambda b: pa.table(
                {
                    "id": b.column("dst"),
                    "c": pa.array(
                        b.column("s").combine_chunks().to_numpy(
                            zero_copy_only=False
                        )
                        // b.column("outdeg").combine_chunks().to_numpy(
                            zero_copy_only=False
                        ),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow", runtime_env=runtime_env(),
        )

    def update(batch: pa.Table) -> pa.Table:
        csum = batch.column("csum").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        if seed_ref is None:
            base_v = base
        else:
            ids = batch.column("id").combine_chunks().to_numpy(
                zero_copy_only=False)
            base_v = (100 - damping_pct) * init_vec(ids)
        return pa.table(
            {
                "id": batch.column("id"),
                "s": pa.array((base_v + damping_pct * csum) // 100,
                              pa.int64()),
            }
        )

    for _ in range(iters):
        summed = grouped_agg(
            contributions(scores).union(zeros), ["id"],
            [("csum", "c", "sum")],
        )
        scores = summed.map_batches(
            update, batch_format="pyarrow", runtime_env=runtime_env()
        ).materialize()

    return scores.map_batches(
        lambda b: pa.table(
            {"id": b.column("id"), "score": b.column("s")}
        ),
        batch_format="pyarrow", runtime_env=runtime_env(),
    )


def hits(
    edges_ds,
    nodes_ds,
    iters: int = 2,
    scale: int = 10**9,
    broadcast_below: int = 2_000_000,
    shuffle_partitions: int | None = None,
):
    """Integer-deterministic HITS hubs & authorities over an
    ``(src, dst)`` edge dataset: ``(id, hub, auth)`` per node after a
    FIXED number of mutual-reinforcement iterations (Kleinberg 1999,
    public algorithm) — the second classic link-analysis scorer beside
    :func:`pagerank` (authorities = heavily pointed-to pages counted by
    GOOD hubs, not raw in-degree).

    Determinism rule: all arithmetic is int64 (scores scaled by
    ``scale``); each half-step's L1 normalization is the exact integer
    rescale ``s·scale // Σs`` — summation-order-independent, so a SQL
    engine reproduces every score bit-for-bit.  Overflow bound: a raw
    per-node sum never exceeds ``scale`` (each neighbor contributes once
    from an L1-normalized vector), so the rescale product is ≤ scale²
    = 10¹⁸ < 2⁶³ for ANY graph shape; the default keeps score
    resolution to ~10⁹/n (raise scale only with a narrower int128
    plan).  Each half-step is one
    score attach on the propagating endpoint (broadcast sorted-array
    searchsorted below ``broadcast_below`` nodes, native hash join
    beyond — the pagerank duality) + ONE combiner grouped sum on the
    receiving endpoint, unioned with a zero row per node so isolated
    nodes stay at zero; the normalizing total is a single-scalar
    aggregate (O(1) driver state per half-step)."""
    import ray

    from ..broadcast import cached_get
    from .agg import grouped_agg
    from .partition import coalesce_nonempty

    n_parts = shuffle_partitions or max(
        2, int(ray.cluster_resources().get("CPU", 8))
    )
    n_nodes = nodes_ds.count()
    init = scale // max(n_nodes, 1)
    small = n_nodes < broadcast_below

    zeros = nodes_ds.map_batches(
        lambda b: pa.table(
            {"id": b.column("id"),
             "c": pa.array(np.zeros(b.num_rows, np.int64), pa.int64())}
        ),
        batch_format="pyarrow", runtime_env=runtime_env(),
    ).materialize()

    edges_nz = coalesce_nonempty(edges_ds)
    if edges_nz is None:
        return zeros.map_batches(
            lambda b: pa.table(
                {"doc_id": b.column("id"), "hub": b.column("c"),
                 "auth": b.column("c")}
            ),
            batch_format="pyarrow", runtime_env=runtime_env(),
        )
    edges_m = edges_nz.materialize()

    def propagate(scores_ds, from_col: str, to_col: str):
        """(id=to, c=score[from]) per edge → grouped sum ∪ zeros."""
        if small:
            rows = scores_ds.take_all()
            ids = np.fromiter((r["id"] for r in rows), np.int64, len(rows))
            s = np.fromiter((r["s"] for r in rows), np.int64, len(rows))
            order = np.argsort(ids)
            ref = ray.put((ids[order], s[order]))

            def lookup(batch: pa.Table, _ref=ref) -> pa.Table:
                sids, sv = cached_get(_ref)
                src = batch.column(from_col).combine_chunks().to_numpy(
                    zero_copy_only=False
                )
                pos = np.searchsorted(sids, src)  # every endpoint is a node
                return pa.table(
                    {"id": batch.column(to_col),
                     "c": pa.array(sv[pos], pa.int64())}
                )

            contrib = edges_m.map_batches(
                lookup, batch_format="pyarrow", runtime_env=runtime_env()
            )
        else:
            sc_nz = coalesce_nonempty(scores_ds)
            contrib = edges_m.join(
                sc_nz, "inner", num_partitions=n_parts,
                on=(from_col,), right_on=("id",),
            ).map_batches(
                lambda b: pa.table(
                    {"id": b.column(to_col), "c": b.column("s")}
                ),
                batch_format="pyarrow", runtime_env=runtime_env(),
            )
        return grouped_agg(contrib.union(zeros), ["id"],
                           [("raw", "c", "sum")])

    def normalize(raw_ds):
        raw_ds = raw_ds.materialize()
        total = int(raw_ds.sum("raw") or 0)
        if total == 0:
            return raw_ds.map_batches(
                lambda b: pa.table({"id": b.column("id"),
                                    "s": b.column("raw")}),
                batch_format="pyarrow", runtime_env=runtime_env(),
            ).materialize()

        def rescale(batch: pa.Table) -> pa.Table:
            raw = batch.column("raw").combine_chunks().to_numpy(
                zero_copy_only=False)
            return pa.table({
                "id": batch.column("id"),
                "s": pa.array(raw * scale // total, pa.int64()),
            })

        return raw_ds.map_batches(
            rescale, batch_format="pyarrow", runtime_env=runtime_env()
        ).materialize()

    hub = zeros.map_batches(
        lambda b: pa.table(
            {"id": b.column("id"),
             "s": pa.array(np.full(b.num_rows, init, np.int64), pa.int64())}
        ),
        batch_format="pyarrow", runtime_env=runtime_env(),
    ).materialize()
    auth = hub
    for _ in range(iters):
        auth = normalize(propagate(hub, "src", "dst"))
        hub = normalize(propagate(auth, "dst", "src"))

    from .dedup import attach_id_labels

    hub_t = hub.map_batches(
        lambda b: pa.table({"doc_id": b.column("id"),
                            "hub": b.column("s")}),
        batch_format="pyarrow", runtime_env=runtime_env())
    auth_t = auth.map_batches(
        lambda b: pa.table({"doc_id": b.column("id"),
                            "auth": b.column("s")}),
        batch_format="pyarrow", runtime_env=runtime_env())
    return attach_id_labels(hub_t, auth_t, id_column="doc_id",
                            label_id_column="doc_id",
                            label_column="auth")


def bfs_distances(
    edges_ds,
    seeds_ds,
    max_depth: int,
    broadcast_below: int = 2_000_000,
    local_cutoff: int = 2_000_000,
):
    """Multi-source BFS: ``(id, dist)`` — the minimum hop distance from
    any seed to every node reachable within ``max_depth`` hops (the
    oracle-checkable core of the crawl's depth-bounded frontier
    expansion: crawl_bfs replays the full engine; this is the distance
    LABELING as a first-class graph operator, reference crawler.py's
    ``depth`` bookkeeping as data instead of control flow).

    Iterative dataflow, FRONTIER-ONLY expansion: each round expands only
    the nodes settled in the previous round (BFS settles a node at its
    final distance, so re-expanding old rounds can never improve a
    label) — per-round EMITTED candidate volume is O(frontier
    out-edges), never O(reachable set).  (The edge table itself is
    still scanned — broadcast path — or shuffled — join path — once
    per round, as in every dataflow BFS without a partitioned edge
    index; the frontier restriction bounds what flows DOWNSTREAM of
    that scan, which is where per-round all-to-all cost lives.)  The
    per-round merge is the grouped-MIN combiner over
    ``settled ∪ (candidates, k)``; newly-settled rows (dist == k) form
    the next frontier, and an empty frontier short-circuits before
    ``max_depth``.

    Propagation has the same size-gated dual as
    :func:`connected_components`: below ``broadcast_below`` frontier
    nodes each round broadcasts the sorted frontier ids and masks the
    distributed edge table in ``map_batches`` (no join shuffle); above
    it, a native hash join edges⋈frontier.  Inputs: ``edges_ds`` with
    ``(src, dst)`` int64 columns, ``seeds_ds`` with an ``id`` column.
    """
    import ray

    from ..broadcast import cached_get
    from .agg import grouped_agg
    from .partition import coalesce_nonempty

    settled = seeds_ds.map_batches(
        lambda b: pa.table({
            "id": b.column("id"),
            "dist": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
        }),
        batch_format="pyarrow", runtime_env=runtime_env(),
    ).materialize()
    frontier = settled
    # materialize + empty-coalesce the edge table ONCE: a lazy edges_ds
    # would re-run its producing transforms every round (siblings
    # connected_components/pagerank/hits all materialize before their
    # loops), and Ray 2.49's num_blocks() raises on lazy datasets
    edges_m = edges_ds.materialize()
    edges_nz = coalesce_nonempty(edges_m)  # None ⇔ 0-row edge table

    # size-gated LOCAL finish (scc/cc/ktruss/msf/pagerank discipline):
    # hop distances are integers, so one CSR BFS task is bit-identical
    # to the per-round grouped-MIN exchanges; below the cutoff the
    # whole fixpoint collapses into it.  Distributed rounds stay
    # pinned by local_cutoff=0 forced-path tests and the callers'
    # reference pins (bowtie's sequential-equality test rides this).
    if settled.count() + edges_m.count() <= local_cutoff:
        import ray as _ray

        seed_refs = settled.to_arrow_refs()
        edge_refs = edges_m.to_arrow_refs()

        @_ray.remote
        def _local(srefs, erefs, _depth=max_depth):
            import ray as _r
            stbls = _r.get(list(srefs))
            etbls = _r.get(list(erefs))

            def col(tbls, name):
                arrs = [t.column(name).combine_chunks().to_numpy(
                    zero_copy_only=False) for t in tbls if t.num_rows]
                return (np.concatenate(arrs) if arrs
                        else np.empty(0, np.int64))

            seeds = np.unique(col(stbls, "id"))
            src = col(etbls, "src")
            dst = col(etbls, "dst")
            ids = np.unique(np.concatenate((seeds, src, dst)))
            si = np.searchsorted(ids, src)
            di = np.searchsorted(ids, dst)
            order = np.argsort(si, kind="stable")
            s2, d2 = si[order], di[order]
            starts = np.searchsorted(s2, np.arange(len(ids)))
            ends = np.searchsorted(s2, np.arange(len(ids)),
                                   side="right")
            dist = np.full(len(ids), -1, np.int64)
            frontier = np.searchsorted(ids, seeds)
            dist[frontier] = 0
            for k in range(1, _depth + 1):
                if not len(frontier):
                    break
                # all out-neighbors of the frontier, vectorized gather
                spans = [d2[starts[v]:ends[v]] for v in frontier.tolist()]
                if spans:
                    nbrs = np.unique(np.concatenate(spans)
                                     if spans else np.empty(0, np.int64))
                else:
                    nbrs = np.empty(0, np.int64)
                new = nbrs[dist[nbrs] == -1] if len(nbrs) else nbrs
                dist[new] = k
                frontier = new
            reached = dist >= 0
            return pa.table({
                "id": pa.array(ids[reached], pa.int64()),
                "dist": pa.array(dist[reached], pa.int64()),
            })

        return ray.data.from_arrow_refs(
            [_local.remote(seed_refs, edge_refs)])

    for k in range(1, max_depth + 1):
        n_frontier = frontier.count()
        if n_frontier == 0:
            break
        if n_frontier < broadcast_below:
            ids = np.sort(np.fromiter(
                (r["id"] for r in frontier.take_all()), np.int64,
                n_frontier))
            ref = ray.put(ids)

            def expand(batch: pa.Table, _ref=ref, _k=k) -> pa.Table:
                sids = cached_get(_ref)
                src = batch.column("src").combine_chunks().to_numpy(
                    zero_copy_only=False)
                dst = batch.column("dst").combine_chunks().to_numpy(
                    zero_copy_only=False)
                pos = np.searchsorted(sids, src)
                pos_c = np.minimum(pos, max(len(sids) - 1, 0))
                hit = (sids[pos_c] == src) if len(sids) else \
                    np.zeros(len(src), bool)
                cand = np.unique(dst[hit])  # per-block dedup
                return pa.table({
                    "id": pa.array(cand, pa.int64()),
                    "dist": pa.array(np.full(len(cand), _k, np.int64),
                                     pa.int64()),
                })

            cands = edges_m.map_batches(
                expand, batch_format="pyarrow", runtime_env=runtime_env())
        else:
            kk = k

            def rekey(batch: pa.Table, _k=kk) -> pa.Table:
                return pa.table({
                    "id": batch.column("dst"),
                    "dist": pa.array(
                        np.full(batch.num_rows, _k, np.int64), pa.int64()),
                })

            frontier_nz = coalesce_nonempty(frontier.select_columns(["id"]))
            if edges_nz is None or frontier_nz is None:
                break  # 0-row edge table (or frontier): nothing expands
            cands = edges_nz.join(
                frontier_nz,
                "inner",
                num_partitions=max(2, edges_m.num_blocks() // 4),
                on=("src",), right_on=("id",),
            ).map_batches(rekey, batch_format="pyarrow",
                          runtime_env=runtime_env())

        settled = grouped_agg(
            settled.union(cands), ["id"], [("dist", "dist", "min")],
        ).materialize()

        def new_only(batch: pa.Table, _k=k) -> pa.Table:
            d = batch.column("dist").combine_chunks().to_numpy(
                zero_copy_only=False)
            return batch.filter(pa.array(d == _k))

        frontier = settled.map_batches(
            new_only, batch_format="pyarrow", runtime_env=runtime_env(),
        ).materialize()

    return settled


_WD_INF = 2**62  # unreached sentinel; min-safe, never summed


def weighted_distances(
    edges_ds,
    seeds_ds,
    rounds: int,
    broadcast_below: int = 2_000_000,
    local_cutoff: int = 2_000_000,
):
    """Bounded multi-source WEIGHTED shortest paths: ``(id, cost)`` —
    the minimum total edge weight over paths of **at most** ``rounds``
    edges from any seed (the Bellman-Ford invariant after ``rounds``
    relaxation rounds; well-defined on cyclic graphs without a
    negative-cycle caveat because weights here are non-negative and
    the hop bound closes the semantics).  Generalizes
    :func:`bfs_distances` (all weights 1 ⇒ hop distance).

    DELTA relaxation, exact: each round expands only the nodes whose
    label IMPROVED in the previous round — a path prefix whose node
    didn't improve was already extended in an earlier round, so
    per-round candidate volume is O(improved-frontier out-edges),
    never O(label table).  The merge is ONE tagged-union combiner
    grouped-MIN carrying two columns: ``cost`` (new label) and
    ``cost_old`` (previous label, sentinel-INF on candidate rows) —
    improvement detection rides the same shuffle, no second pass.
    Same size-gated frontier dual as the siblings: broadcast sorted
    (id, cost) arrays + searchsorted mask below ``broadcast_below``,
    native hash join edges⋈frontier above.

    Inputs: ``edges_ds`` with ``(src, dst, w)`` int64 columns
    (non-negative w), ``seeds_ds`` with an ``id`` column."""
    import ray

    from ..broadcast import cached_get
    from .agg import grouped_agg
    from .dedup import run_rank
    from .partition import coalesce_nonempty

    labels = seeds_ds.map_batches(
        lambda b: pa.table({
            "id": b.column("id"),
            "cost": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
        }),
        batch_format="pyarrow", runtime_env=runtime_env(),
    ).materialize()
    frontier = labels
    edges_m = edges_ds.materialize()
    edges_nz = coalesce_nonempty(edges_m)
    if edges_nz is None:
        return labels

    # size-gated LOCAL finish (the bfs_distances discipline): the
    # hop-bounded Bellman-Ford labels are integers and the relaxation
    # is a pure min-fold, so ``rounds`` vectorized np.minimum.at
    # sweeps in one task are bit-identical to the per-round
    # grouped-MIN exchanges (delta restriction is an optimization,
    # not a semantic); distributed rounds stay pinned by
    # local_cutoff=0 forced-path tests.
    if labels.count() + edges_m.count() <= local_cutoff:
        seed_refs = labels.to_arrow_refs()
        edge_refs = edges_m.to_arrow_refs()

        @ray.remote(runtime_env=runtime_env())
        def _local(srefs, erefs, _rounds=rounds):
            import ray as _r
            stbls = _r.get(list(srefs))
            etbls = _r.get(list(erefs))

            def col(tbls, name):
                arrs = [t.column(name).combine_chunks().to_numpy(
                    zero_copy_only=False) for t in tbls if t.num_rows]
                return (np.concatenate(arrs) if arrs
                        else np.empty(0, np.int64))

            seeds = np.unique(col(stbls, "id"))
            src = col(etbls, "src")
            dst = col(etbls, "dst")
            w = col(etbls, "w")
            ids = np.unique(np.concatenate((seeds, src, dst)))
            si = np.searchsorted(ids, src)
            di = np.searchsorted(ids, dst)
            INF = np.int64(2**62)
            d = np.full(len(ids), INF, np.int64)
            d[np.searchsorted(ids, seeds)] = 0
            for _ in range(_rounds):
                nd = d.copy()
                live = d[si] < INF
                if live.any():
                    np.minimum.at(nd, di[live], d[si[live]] + w[live])
                if np.array_equal(nd, d):
                    break
                d = nd
            reached = d < INF
            return pa.table({
                "id": pa.array(ids[reached], pa.int64()),
                "cost": pa.array(d[reached], pa.int64()),
            })

        return ray.data.from_arrow_refs(
            [_local.remote(seed_refs, edge_refs)])

    for _ in range(rounds):
        n_frontier = frontier.count()
        if n_frontier == 0:
            break
        if n_frontier < broadcast_below:
            rows = frontier.take_all()
            ids = np.fromiter((r["id"] for r in rows), np.int64,
                              n_frontier)
            costs = np.fromiter((r["cost"] for r in rows), np.int64,
                                n_frontier)
            order = np.argsort(ids)
            ids, costs = ids[order], costs[order]
            ref = ray.put((ids, costs))

            def expand(batch: pa.Table, _ref=ref) -> pa.Table:
                sids, scosts = cached_get(_ref)
                src = batch.column("src").combine_chunks().to_numpy(
                    zero_copy_only=False)
                dst = batch.column("dst").combine_chunks().to_numpy(
                    zero_copy_only=False)
                w = batch.column("w").combine_chunks().to_numpy(
                    zero_copy_only=False)
                pos = np.searchsorted(sids, src)
                pos_c = np.minimum(pos, max(len(sids) - 1, 0))
                hit = (sids[pos_c] == src) if len(sids) else \
                    np.zeros(len(src), bool)
                d, c = dst[hit], scosts[pos_c[hit]] + w[hit]
                # per-block min per dst (combiner discipline)
                o = np.lexsort((c, d))
                keep = run_rank(d[o]) == 0
                return pa.table({
                    "id": pa.array(d[o][keep], pa.int64()),
                    "cost": pa.array(c[o][keep], pa.int64()),
                })

            cands = edges_m.map_batches(
                expand, batch_format="pyarrow", runtime_env=runtime_env())
        else:
            def rekey(batch: pa.Table) -> pa.Table:
                w = batch.column("w").combine_chunks().to_numpy(
                    zero_copy_only=False)
                c = batch.column("cost").combine_chunks().to_numpy(
                    zero_copy_only=False)
                return pa.table({
                    "id": batch.column("dst"),
                    "cost": pa.array(c + w, pa.int64()),
                })

            frontier_nz = coalesce_nonempty(frontier)
            if frontier_nz is None:
                break
            cands = edges_nz.join(
                frontier_nz,
                "inner",
                num_partitions=max(2, edges_m.num_blocks() // 4),
                on=("src",), right_on=("id",),
            ).map_batches(rekey, batch_format="pyarrow",
                          runtime_env=runtime_env())

        def tag_old(batch: pa.Table) -> pa.Table:
            return batch.append_column("cost_old", batch.column("cost"))

        def tag_new(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "cost_old",
                pa.array(np.full(batch.num_rows, _WD_INF, np.int64),
                         pa.int64()))

        merged = grouped_agg(
            labels.map_batches(tag_old, batch_format="pyarrow",
                               runtime_env=runtime_env()).union(
                cands.map_batches(tag_new, batch_format="pyarrow",
                                  runtime_env=runtime_env())),
            ["id"],
            [("cost", "cost", "min"), ("cost_old", "cost_old", "min")],
        ).materialize()

        def improved(batch: pa.Table) -> pa.Table:
            c = batch.column("cost").combine_chunks().to_numpy(
                zero_copy_only=False)
            o = batch.column("cost_old").combine_chunks().to_numpy(
                zero_copy_only=False)
            return batch.filter(pa.array(c < o)).select(["id", "cost"])

        frontier = merged.map_batches(
            improved, batch_format="pyarrow", runtime_env=runtime_env(),
        ).materialize()
        labels = merged.select_columns(["id", "cost"])

    return labels


def kcore_nodes(
    edges_ds,
    k: int,
    max_rounds: int = 200,
):
    """Nodes of the **k-core** — the maximal induced subgraph where
    every node has degree ≥ k — of the UNDIRECTED simple graph built
    from ``edges_ds`` ``(src, dst)``; self-loops drop, duplicate and
    reverse edges collapse.  Returns ``(id, deg)`` rows, one per
    surviving node with its degree INSIDE the core, key-sorted.  The
    web-graph dense-community / link-farm primitive (and the standard
    graph-ML preprocessing peel).

    Iterative PARALLEL peeling: each round removes ALL currently-under-k
    nodes at once — same fixpoint as sequential peeling (the k-core is
    the unique maximal subgraph fixpoint), rounds = peeling depth (≈
    longest chain of cascading removals; ~log n for hierarchy-shaped
    webgraphs, bounded by max_rounds — raises on non-convergence like
    connected_components).

    Per-round distributed shape: degrees are ONE combiner grouped COUNT
    per endpoint over the symmetric edge table (the only corpus-sized
    exchange — and only in round 1; later rounds count the shrunken
    table); removals leave through the size-gated
    :func:`~deepwebharvester_ray.functions.dedup.subtract_ids` applied
    to BOTH endpoint columns (broadcast sorted-array anti below the
    cutoff — a peel round usually sheds a sliver — native left-outer
    marker join above).  Driver state is one removed-count scalar per
    round, never a node list."""
    import ray

    from .agg import grouped_agg
    from .dedup import subtract_ids

    def symmetrize(batch: pa.Table) -> pa.Table:
        s = batch.column("src").combine_chunks().to_numpy(
            zero_copy_only=False)
        d = batch.column("dst").combine_chunks().to_numpy(
            zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({
            "u": pa.array(np.concatenate([s, d]), pa.int64()),
            "v": pa.array(np.concatenate([d, s]), pa.int64()),
        })

    # distinct symmetric edges: one all-to-all, combiner-collapsed
    sym = grouped_agg(
        edges_ds.map_batches(symmetrize, batch_format="pyarrow",
                             runtime_env=runtime_env()),
        ["u", "v"], [("n", "", "count")],
    ).map_batches(lambda b: b.select(["u", "v"]),
                  batch_format="pyarrow",
                  runtime_env=runtime_env()).materialize()

    empty = pa.table({"id": pa.array([], pa.int64()),
                      "deg": pa.array([], pa.int64())})

    for _ in range(max_rounds):
        deg = grouped_agg(sym, ["u"], [("deg", "", "count")]).materialize()
        if deg.count() == 0:
            return ray.data.from_arrow(empty)

        def under(batch: pa.Table, _k=k) -> pa.Table:
            d = batch.column("deg").combine_chunks().to_numpy(
                zero_copy_only=False)
            return batch.filter(pa.array(d < _k))

        removed = deg.map_batches(under, batch_format="pyarrow",
                                  runtime_env=runtime_env()).materialize()
        if removed.count() == 0:
            return deg.map_batches(
                lambda b: pa.table({"id": b.column("u"),
                                    "deg": b.column("deg")}),
                batch_format="pyarrow", runtime_env=runtime_env(),
            )
        sym = subtract_ids(
            subtract_ids(sym, removed, id_column="u", drop_column="u"),
            removed, id_column="v", drop_column="u",
        ).materialize()
    raise RuntimeError(
        f"kcore_nodes: no fixpoint within {max_rounds} rounds")


def densest_subgraph(edges_ds, eps_num: int = 1, eps_den: int = 10,
                     max_rounds: int = 200):
    """Densest-subgraph 2(1+ε)-approximation by parallel peeling
    (Charikar 2000 greedy, parallelized à la Bahmani–Kumar–
    Vassilvitskii 2012): over the UNDIRECTED simple graph from
    ``(src, dst)`` edges (self-loops drop, duplicates/reverses
    collapse), find the node subset S maximizing edge density
    ``|E(S)| / |S|`` — the link-farm / spam-core / boilerplate-ring
    detector (k-core certifies a DEGREE floor; the densest subgraph
    maximizes the AVERAGE — a farm can hide from one but not the
    other).  Returns ``(members_ds(id), n_best, m_best)`` with density
    ``m_best / n_best ≥ ρ* / (2(1+ε))`` guaranteed.

    Why rounds-of-removals and not the sequential greedy: Charikar
    peels ONE min-degree node per step — O(n) serial steps; removing
    ALL nodes with ``deg ≤ (1+ε)·2m/n`` per round keeps the guarantee
    (the classic averaging argument: the best subset can't lose more
    than the factor) and finishes in O(log₁₊ε n) rounds, each a
    combiner-sized exchange — the dataflow form.  Every comparison is
    exact integers: the round threshold is ``T = ⌊2(eps_den+eps_num)·m
    / (eps_den·n)⌋`` computed in Python bigints (``deg ≤ x ⟺ deg ≤
    ⌊x⌋`` for integer deg), and round densities compare by
    cross-multiplication — no float ever decides membership, so the
    output is deterministic across engines and block layouts.

    Per-round shape (the kcore_nodes peel discipline): degrees = ONE
    combiner grouped COUNT over the symmetric edge table (corpus-sized
    only in round 1 — later rounds count the shrunken residual);
    removals leave through the size-gated ``subtract_ids`` anti on both
    endpoint columns; the driver sees two scalars per round (n, m) plus
    the removed-round parts list — never a node list.  Membership
    reconstructs from removal rounds: nodes removed at round ≥ argmax
    round ARE the best prefix (every node is eventually removed, so the
    parts partition the node set)."""
    import ray

    from .agg import grouped_agg
    from .dedup import subtract_ids

    def symmetrize(batch: pa.Table) -> pa.Table:
        s = batch.column("src").combine_chunks().to_numpy(
            zero_copy_only=False)
        d = batch.column("dst").combine_chunks().to_numpy(
            zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({
            "u": pa.array(np.concatenate([s, d]), pa.int64()),
            "v": pa.array(np.concatenate([d, s]), pa.int64()),
        })

    sym = grouped_agg(
        edges_ds.map_batches(symmetrize, batch_format="pyarrow",
                             runtime_env=runtime_env()),
        ["u", "v"], [("n", "", "count")],
    ).map_batches(lambda b: b.select(["u", "v"]),
                  batch_format="pyarrow",
                  runtime_env=runtime_env()).materialize()

    empty = pa.table({"id": pa.array([], pa.int64())})
    parts: list = []          # (round, removed-members dataset)
    best = (0, 0, -1)         # (m, n, round) — density m/n, cross-mult
    for r in range(max_rounds):
        deg = grouped_agg(sym, ["u"], [("deg", "", "count")],
                          sorted_output=False).materialize()
        n_r = deg.count()
        if n_r == 0:
            break
        m_r = sym.count() // 2
        if best[2] < 0 or m_r * best[1] > best[0] * n_r:
            best = (m_r, n_r, r)   # strict > keeps the EARLIEST (largest)
                                   # subgraph on density ties
        thresh = (2 * (eps_den + eps_num) * m_r) // (eps_den * n_r)

        def under(batch: pa.Table, _t=thresh) -> pa.Table:
            d = batch.column("deg").combine_chunks().to_numpy(
                zero_copy_only=False)
            return batch.filter(pa.array(d <= _t))

        removed = deg.map_batches(under, batch_format="pyarrow",
                                  runtime_env=runtime_env()).materialize()
        parts.append((r, removed.map_batches(
            lambda b: pa.table({"id": b.column("u")}),
            batch_format="pyarrow", batch_size=None,
            runtime_env=runtime_env()).materialize()))
        # min degree ≤ average ≤ threshold ⇒ the round always removes
        sym = subtract_ids(
            subtract_ids(sym, removed, id_column="u", drop_column="u"),
            removed, id_column="v", drop_column="u",
        ).materialize()
    else:
        if sym.count() > 0:
            raise RuntimeError(
                f"densest_subgraph: not peeled within {max_rounds} "
                "rounds — every round removes at least the below-"
                "average-degree nodes, so this means a broken input")

    members = [ds for r, ds in parts if r >= best[2]]
    if not members:
        return ray.data.from_arrow(empty), 0, 0
    out = members[0]
    for part in members[1:]:
        out = out.union(part)
    return out, best[1], best[0]


def _tarjan_labels(node_ids: "np.ndarray", src: "np.ndarray",
                   dst: "np.ndarray"):
    """Linear-time iterative Tarjan over a CSR built with numpy:
    ``(sorted_node_ids, scc_label_per_node)`` with the canonical
    max-id-in-component label.  The LOCAL finish of
    :func:`scc_labels` — runs inside one Ray task on a size-gated
    subgraph, never on the driver."""
    order = np.argsort(node_ids)
    nid = node_ids[order]
    s = np.searchsorted(nid, src)
    d = np.searchsorted(nid, dst)
    perm = np.argsort(s, kind="stable")
    s2, d2 = s[perm], d[perm]
    n = len(nid)
    starts = np.searchsorted(s2, np.arange(n))
    ends = np.searchsorted(s2, np.arange(n), side="right")
    index = np.full(n, -1, np.int64)
    low = np.zeros(n, np.int64)
    onstk = np.zeros(n, bool)
    comp = np.full(n, -1, np.int64)
    counter = 0
    ncomp = 0
    stack: list = []
    for root in range(n):
        if index[root] != -1:
            continue
        index[root] = low[root] = counter
        counter += 1
        stack.append(root)
        onstk[root] = True
        frames = [(root, int(starts[root]))]
        while frames:
            v, ptr = frames[-1]
            if ptr < ends[v]:
                frames[-1] = (v, ptr + 1)
                w = int(d2[ptr])
                if index[w] == -1:
                    index[w] = low[w] = counter
                    counter += 1
                    stack.append(w)
                    onstk[w] = True
                    frames.append((w, int(starts[w])))
                elif onstk[w] and index[w] < low[v]:
                    low[v] = index[w]
            else:
                frames.pop()
                if frames and low[v] < low[frames[-1][0]]:
                    low[frames[-1][0]] = low[v]
                if low[v] == index[v]:
                    while True:
                        w = stack.pop()
                        onstk[w] = False
                        comp[w] = ncomp
                        if w == v:
                            break
                    ncomp += 1
    maxlab = np.full(max(ncomp, 1), -1, np.int64)
    np.maximum.at(maxlab, comp, nid)
    return nid, maxlab[comp]


def scc_labels(
    edges_ds,
    nodes_ds,
    max_rounds: int = 100,
    broadcast_cutoff: int | None = None,
    local_cutoff: int = 2_000_000,
):
    """Strongly connected components of the DIRECTED graph: ``(id,
    scc)`` rows where ``scc`` is the **maximum node id in the
    component** (canonical, engine-independent).  The directed twin of
    :func:`connected_components` — mutual-reachability clusters (link
    rings, redirect cycles, spam loops), which undirected CC
    over-merges.

    FW-BW-Trim with doubled-world max-coloring, iterative dataflow
    (the r03 VERDICT constant-factor fix, replacing the earlier
    two-fixpoint Orzan pass), plus a size-gated LOCAL finish: once the
    active subgraph is below ``local_cutoff`` rows+edges it ships as
    block refs to ONE linear-time iterative-Tarjan Ray task (the same
    below-cutoff discipline as the broadcast gates; set
    ``local_cutoff=0`` to force the distributed passes).  Each
    distributed pass:

    0. **Trim to fixpoint**: nodes lacking an in- OR out-edge in the
       active induced subgraph settle as singletons at once (they
       cannot belong to a multi-node SCC) — without this, IN/OUT
       chain graphs peel one node per coloring pass.
    1. Node ``2u`` lives in the FORWARD world (original edges), node
       ``2u+1`` in the BACKWARD world (reversed edges); both start
       with ``color = u``.  One tagged-union combiner grouped-MAX
       fixpoint over the doubled active subgraph propagates
       ``color(v) = max(color(v), color(u) for u→v)`` — DELTA
       restricted: only colors that improved last round feed the next
       round's candidate attach (sound by induction: a max can only
       improve through an improved in-neighbor).  At fixpoint,
       world-0 color = max id that can REACH u; world-1 color = max
       id u CAN REACH.
    2. **Settle where the worlds agree**: ``cf(u) == cb(u) == c``
       means c reaches u and u reaches c, so u ∈ SCC(c); and c is
       then the canonical (maximum) id of that SCC.  One bounded
       grouped-MAX over ``(u, cf, cb)`` rows folds the worlds.
    3. Settled nodes leave with ``scc = cf``; the active subgraph
       shrinks (size-gated ``subtract_ids`` on both endpoint columns,
       the kcore peel), and the loop repeats on the remainder.

    Each pass settles at least the globally-largest active id's whole
    SCC (its colors are its own id in both worlds), so passes ≤
    #SCCs (typically ≪: every locally-maximal component settles per
    pass); raises on non-convergence within ``max_rounds`` (outer and
    inner).  All label attaches go through the size-gated
    :func:`~deepwebharvester_ray.functions.dedup.attach_id_labels`
    (broadcast sorted arrays below the cutoff, native hash join
    above); ``broadcast_cutoff`` is plumbed for tests.  Inputs:
    ``edges_ds`` ``(src, dst)`` int64, ``nodes_ds`` ``(id,)``.
    Assumes node ids < 2^62 (doc-id / row-id graphs)."""
    import pyarrow.compute as pc

    from .agg import grouped_agg
    from .dedup import attach_id_labels, semi_join_ids, subtract_ids

    kw = ({} if broadcast_cutoff is None
          else {"broadcast_cutoff": broadcast_cutoff})

    # collapse duplicate edges once; self-loops are harmless but dead
    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").combine_chunks().to_numpy(
            zero_copy_only=False)
        d = batch.column("dst").combine_chunks().to_numpy(
            zero_copy_only=False)
        keep = s != d
        return pa.table({"src": pa.array(s[keep], pa.int64()),
                         "dst": pa.array(d[keep], pa.int64())})

    edges = grouped_agg(
        edges_ds.map_batches(canon, batch_format="pyarrow",
                             runtime_env=runtime_env()),
        ["src", "dst"], [("__n", "", "count")],
    ).select_columns(["src", "dst"]).materialize()
    active = nodes_ds.select_columns(["id"]).materialize()
    finished = []

    def _rename(ds, old, new):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(
                [new if c == old else c for c in batch.column_names])
        return ds.map_batches(fn, batch_format="pyarrow",
                              runtime_env=runtime_env())

    def _double_edges(batch: pa.Table) -> pa.Table:
        s = batch.column("src").combine_chunks().to_numpy(
            zero_copy_only=False)
        d = batch.column("dst").combine_chunks().to_numpy(
            zero_copy_only=False)
        return pa.table({
            "src": pa.array(np.concatenate((2 * s, 2 * d + 1)), pa.int64()),
            "dst": pa.array(np.concatenate((2 * d, 2 * s + 1)), pa.int64()),
        })

    def _seed_colors(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").combine_chunks().to_numpy(
            zero_copy_only=False)
        return pa.table({
            "id": pa.array(np.concatenate((2 * ids, 2 * ids + 1)),
                           pa.int64()),
            "color": pa.array(np.concatenate((ids, ids)), pa.int64()),
        })

    def tag_old(batch: pa.Table) -> pa.Table:
        return batch.append_column("color_old", batch.column("color"))

    def tag_new(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "color_old",
            pa.array(np.full(batch.num_rows, -1, np.int64), pa.int64()))

    def _fold_worlds(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").combine_chunks().to_numpy(
            zero_copy_only=False)
        col = batch.column("color").combine_chunks().to_numpy(
            zero_copy_only=False)
        bwd = (ids & 1) == 1
        return pa.table({
            "id": pa.array(ids >> 1, pa.int64()),
            "cf": pa.array(np.where(bwd, -1, col), pa.int64()),
            "cb": pa.array(np.where(bwd, col, -1), pa.int64()),
        })

    def _singleton_labels(batch: pa.Table) -> pa.Table:
        return pa.table({"id": batch.column("id"),
                         "scc": batch.column("id")})

    for _ in range(max_rounds):
        n_active = active.count()
        if n_active == 0:
            break

        # -- 0. size-gated LOCAL finish: once the active subgraph fits
        # one worker, a single linear-time iterative-Tarjan task beats
        # any number of O(diameter)-round exchanges (the same
        # below-cutoff discipline as every broadcast gate here; the
        # distributed passes below exist for subgraphs that DON'T fit
        # and are exercised by tests via ``local_cutoff=0``).  The
        # subgraph ships as block refs and the label table returns as
        # one Arrow ref — nothing lands on the driver.
        if n_active + edges.count() <= local_cutoff:
            import ray

            node_refs = active.to_arrow_refs()
            edge_refs = edges.to_arrow_refs()

            @ray.remote(runtime_env=runtime_env())
            def _local(nrefs, erefs):
                import ray as _r
                ntbls = _r.get(list(nrefs))
                etbls = _r.get(list(erefs))

                def col(tbls, name):
                    arrs = [t.column(name).combine_chunks().to_numpy(
                        zero_copy_only=False) for t in tbls if t.num_rows]
                    return (np.concatenate(arrs) if arrs
                            else np.empty(0, np.int64))

                src = col(etbls, "src")
                dst = col(etbls, "dst")
                ids = np.unique(np.concatenate(
                    (col(ntbls, "id"), src, dst)))
                nid, lab = _tarjan_labels(ids, src, dst)
                return pa.table({"id": pa.array(nid, pa.int64()),
                                 "scc": pa.array(lab, pa.int64())})

            finished.append(ray.data.from_arrow_refs(
                [_local.remote(node_refs, edge_refs)]).materialize())
            active = active.limit(0).materialize()
            break

        # -- 0b. trim to fixpoint: a node without BOTH an in- and an
        # out-edge in the ACTIVE induced subgraph cannot sit in a
        # multi-node SCC → settle all sources/sinks/isolated nodes as
        # singletons at once (FW-BW-Trim; without it, IN/OUT-chain
        # graphs peel one node per coloring pass)
        for _inner in range(max_rounds):
            core_nodes = semi_join_ids(
                semi_join_ids(active, edges, id_column="id",
                              keep_column="src", **kw),
                edges, id_column="id", keep_column="dst",
                **kw).materialize()
            n_core = core_nodes.count()
            if n_core == n_active:
                break
            finished.append(
                subtract_ids(active, core_nodes, id_column="id",
                             drop_column="id", **kw)
                .map_batches(_singleton_labels, batch_format="pyarrow",
                             runtime_env=runtime_env()).materialize())
            active = core_nodes
            n_active = n_core
            if n_active == 0:
                break
            edges = semi_join_ids(
                semi_join_ids(edges, active, id_column="src",
                              keep_column="id", **kw),
                active, id_column="dst", keep_column="id",
                **kw).materialize()
        else:
            raise RuntimeError(
                f"scc_labels: trim fixpoint not reached in "
                f"{max_rounds} rounds")
        if n_active == 0:
            continue

        # -- 1. fused fwd+bwd max-color fixpoint on the doubled graph --
        dedges = edges.map_batches(
            _double_edges, batch_format="pyarrow", batch_size=None,
            runtime_env=runtime_env()).materialize()
        colors = active.map_batches(
            _seed_colors, batch_format="pyarrow", batch_size=None,
            runtime_env=runtime_env()).materialize()
        delta = colors
        for _inner in range(max_rounds):
            cand = _rename(
                attach_id_labels(dedges, delta, id_column="src",
                                 label_id_column="id",
                                 label_column="color", **kw)
                .select_columns(["dst", "color"]),
                "dst", "id")
            merged = grouped_agg(
                colors.map_batches(tag_old, batch_format="pyarrow",
                                   runtime_env=runtime_env()).union(
                    cand.map_batches(tag_new, batch_format="pyarrow",
                                     runtime_env=runtime_env())),
                ["id"],
                [("color", "color", "max"),
                 ("color_old", "color_old", "max")],
            ).materialize()
            delta = merged.map_batches(
                lambda b: b.filter(pc.greater(
                    b.column("color"), b.column("color_old")))
                .select(["id", "color"]),
                batch_format="pyarrow", runtime_env=runtime_env(),
            ).materialize()
            colors = merged.select_columns(["id", "color"]).materialize()
            if delta.count() == 0:
                break
        else:
            raise RuntimeError(
                f"scc_labels: color fixpoint not reached in "
                f"{max_rounds} rounds")

        # -- 2. settle nodes whose forward/backward maxima agree --------
        pairs = grouped_agg(
            colors.map_batches(_fold_worlds, batch_format="pyarrow",
                               batch_size=None,
                               runtime_env=runtime_env()),
            ["id"], [("cf", "cf", "max"), ("cb", "cb", "max")],
            sorted_output=False)
        settled = pairs.map_batches(
            lambda b: pa.table({
                "id": b.filter(pc.equal(b.column("cf"),
                                        b.column("cb"))).column("id"),
                "scc": b.filter(pc.equal(b.column("cf"),
                                         b.column("cb"))).column("cf"),
            }),
            batch_format="pyarrow", runtime_env=runtime_env(),
        ).materialize()

        # -- 3. shrink the active subgraph ------------------------------
        finished.append(settled)
        active = subtract_ids(active, settled, id_column="id",
                              drop_column="id", **kw).materialize()
        edges = subtract_ids(
            subtract_ids(edges, settled, id_column="src",
                         drop_column="id", **kw),
            settled, id_column="dst", drop_column="id",
            **kw).materialize()
    else:
        raise RuntimeError(
            f"scc_labels: not settled within {max_rounds} passes")

    if not finished:
        return nodes_ds.limit(0).map_batches(
            lambda b: pa.table({"id": pa.array([], pa.int64()),
                                "scc": pa.array([], pa.int64())}),
            batch_format="pyarrow", runtime_env=runtime_env())
    out = finished[0]
    for f in finished[1:]:
        out = out.union(f)
    return out


# Bijective (odd-constant multiplicative) priority hash for MIS: distinct
# ids ALWAYS get distinct priorities, so the greedy order is a strict
# total order and no tie-break branch ever executes.
_MIS_MULT = np.uint64(0x9E3779B97F4A7C15)


def _mis_priority(ids: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        return ids.astype(np.uint64) * _MIS_MULT


def _mis_select_large(nodes_ds, live_edges, max_rounds: int):
    """Large-graph path of :func:`mis_select`: identical fixed-priority
    Luby rounds (hence bit-identical output — the lexicographically-first
    MIS under ascending (priority(id), id)), but every per-round set
    (winners, killed neighborhoods, the shrinking live edge table) stays
    a Dataset and membership runs through the size-gated
    :func:`~.dedup.subtract_ids` / :func:`~.dedup.semi_join_ids`
    primitives — broadcast sorted-array probes while a round's dead set
    is below the 2M cutoff, hash anti/semi joins above it, so nothing is
    unconditionally driver-resident (the connected-components
    large-graph discipline the broadcast path's error message used to
    name).  ``live_edges`` must already be symmetrized, self-loop-free
    and materialized."""
    from .agg import grouped_agg
    from .dedup import semi_join_ids, subtract_ids

    def rename(ds, old, new):
        return ds.map_batches(
            lambda b: b.rename_columns(
                [new if c == old else c for c in b.column_names]),
            batch_format="pyarrow", runtime_env=runtime_env())

    def min_nbr(batch: pa.Table) -> pa.Table:
        v = batch.column("v").combine_chunks().to_numpy(
            zero_copy_only=False)
        return pa.table({
            "u": batch.column("u"),
            "pv": pa.array(_mis_priority(v), pa.uint64()),
        })

    def winners_fn(batch: pa.Table) -> pa.Table:
        u = batch.column("u").combine_chunks().to_numpy(
            zero_copy_only=False)
        pu = _mis_priority(u)
        mp = batch.column("min_pv").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.uint64)
        return pa.table({"id": pa.array(u[pu < mp], pa.int64())})

    mis_acc = None   # Dataset (id): MIS members found so far
    dead_acc = None  # Dataset (id): settled (winner or killed) vertices
    converged = False
    for _ in range(max_rounds):
        if live_edges.count() == 0:
            converged = True
            break
        mins = grouped_agg(
            live_edges.map_batches(min_nbr, batch_format="pyarrow",
                                   batch_size=None,
                                   runtime_env=runtime_env()),
            ["u"], [("min_pv", "pv", "min")], sorted_output=False,
        )
        winners = mins.map_batches(
            winners_fn, batch_format="pyarrow",
            runtime_env=runtime_env()).materialize()
        # fixed priorities guarantee >=1 winner per round (the global
        # min-priority live vertex always wins), so progress is certain
        nbrs = rename(
            semi_join_ids(live_edges, winners, id_column="u",
                          keep_column="id").select_columns(["v"]),
            "v", "id")
        round_dead = grouped_agg(
            winners.union(nbrs), ["id"], [("__n", "", "count")],
            sorted_output=False,
        ).select_columns(["id"]).materialize()
        mis_acc = (winners if mis_acc is None
                   else mis_acc.union(winners))
        dead_acc = (round_dead if dead_acc is None
                    else dead_acc.union(round_dead))
        live_edges = subtract_ids(
            subtract_ids(live_edges, round_dead, id_column="u",
                         drop_column="id"),
            round_dead, id_column="v", drop_column="id",
        ).materialize()
    if not converged:
        raise RuntimeError(
            f"mis_select did not converge within {max_rounds} rounds "
            "(pathological priority chain); raise max_rounds"
        )

    # still-live after the loop == isolated == in the MIS
    if dead_acc is None:
        in_set = nodes_ds.select_columns(["id"])
    else:
        alive = subtract_ids(nodes_ds.select_columns(["id"]), dead_acc,
                             id_column="id", drop_column="id")
        in_set = (alive if mis_acc is None
                  else mis_acc.union(alive)).materialize()

    def tag(flag: int):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch.column("id")
            return pa.table({
                "doc_id": ids,
                "in_mis": pa.array(
                    np.full(len(ids), flag, np.int64), pa.int64()),
            })
        return fn

    ones = semi_join_ids(nodes_ds.select_columns(["id"]), in_set,
                         id_column="id", keep_column="id").map_batches(
        tag(1), batch_format="pyarrow", runtime_env=runtime_env())
    zeros = subtract_ids(nodes_ds.select_columns(["id"]), in_set,
                         id_column="id", drop_column="id").map_batches(
        tag(0), batch_format="pyarrow", runtime_env=runtime_env())
    return ones.union(zeros)


def mis_select(nodes_ds, edges_ds, max_rounds: int = 128,
               broadcast_below: int = 2_000_000):
    """Maximal independent set of the undirected graph — Luby's parallel
    symmetry-breaking primitive with priorities FIXED across rounds,
    which makes the result exactly the lexicographically-first MIS under
    ascending ``(priority(id), id)``: identical to the sequential greedy
    scan, hence exactly testable against it (no distributional check).

    One round: per live vertex, the min neighbor priority via ONE
    grouped-MIN combiner pass over the live edges; a vertex wins iff its
    own priority beats that min (a pure vectorized map over the reduced
    table — no join); winners and their neighborhoods leave the live
    set.  With hash (pseudo-random) priorities the expected round count
    is O(log n); the round bound raises rather than returning a
    non-maximal set.  Vertices that lose every neighbor simply wait —
    once the live edge set is empty, every still-live vertex is isolated
    and joins the MIS in one final step (so isolated input nodes are
    handled with zero special casing).

    Driver state is O(newly-dead ids) per round (the winner/neighbor
    membership arrays broadcast for the live-set filter; Σ over rounds =
    O(n)) — the same broadcast-propagation envelope as
    :func:`connected_components`.  Beyond ``broadcast_below`` live
    edges the identical rounds run through
    :func:`_mis_select_large` — all membership via the size-gated
    anti/semi-join primitives, nothing unconditionally driver-resident
    — producing a bit-identical result (same fixed priorities, same
    round semantics).

    ``nodes_ds``: (id); ``edges_ds``: (src, dst) directed or undirected
    — symmetrized and self-loop-stripped here.  Returns (id, in_mis).
    """
    import ray

    from ..broadcast import cached_get

    def symmetrize(batch: pa.Table) -> pa.Table:
        s = batch.column("src").combine_chunks().to_numpy(
            zero_copy_only=False)
        d = batch.column("dst").combine_chunks().to_numpy(
            zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({
            "u": pa.array(np.concatenate([s, d]), pa.int64()),
            "v": pa.array(np.concatenate([d, s]), pa.int64()),
        })

    live_edges = edges_ds.map_batches(
        symmetrize, batch_format="pyarrow", runtime_env=runtime_env()
    ).materialize()
    if live_edges.count() >= broadcast_below:
        # Same rounds, same fixed priorities — bit-identical result —
        # but all membership through the size-gated anti/semi-join
        # primitives; nothing unconditionally driver-resident.
        return _mis_select_large(nodes_ds, live_edges, max_rounds)

    def min_nbr(batch: pa.Table) -> pa.Table:
        v = batch.column("v").combine_chunks().to_numpy(
            zero_copy_only=False)
        return pa.table({
            "u": batch.column("u"),
            "pv": pa.array(_mis_priority(v), pa.uint64()),
        })

    mis_parts: list = []
    dead_sorted = np.empty(0, np.int64)
    converged = False
    for _ in range(max_rounds):
        if live_edges.count() == 0:
            converged = True
            break
        from .agg import grouped_agg

        mins = grouped_agg(
            live_edges.map_batches(min_nbr, batch_format="pyarrow",
                                   batch_size=None,
                                   runtime_env=runtime_env()),
            ["u"], [("min_pv", "pv", "min")],
        )

        def winners_fn(batch: pa.Table) -> pa.Table:
            u = batch.column("u").combine_chunks().to_numpy(
                zero_copy_only=False)
            pu = _mis_priority(u)
            mp = batch.column("min_pv").combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.uint64)
            return pa.table({"id": pa.array(u[pu < mp], pa.int64())})

        winners = np.fromiter(
            (r["id"] for r in mins.map_batches(
                winners_fn, batch_format="pyarrow",
                runtime_env=runtime_env()).take_all()),
            np.int64)
        # fixed priorities guarantee >=1 winner per round (the global
        # min-priority live vertex always wins), so progress is certain
        w_sorted = np.sort(winners)
        w_ref = ray.put(w_sorted)

        def nbrs_fn(batch: pa.Table, _ref=w_ref) -> pa.Table:
            w = cached_get(_ref)
            u = batch.column("u").combine_chunks().to_numpy(
                zero_copy_only=False)
            v = batch.column("v").combine_chunks().to_numpy(
                zero_copy_only=False)
            pos = np.searchsorted(w, u)
            hit = (pos < len(w)) & (w[np.minimum(pos, len(w) - 1)] == u)
            return pa.table({"id": pa.array(v[hit], pa.int64())})

        nbrs = np.fromiter(
            (r["id"] for r in live_edges.map_batches(
                nbrs_fn, batch_format="pyarrow",
                runtime_env=runtime_env()).take_all()),
            np.int64)
        round_dead = np.union1d(w_sorted, nbrs)
        dead_sorted = np.union1d(dead_sorted, round_dead)
        mis_parts.append(w_sorted)
        d_ref = ray.put(round_dead)

        def prune(batch: pa.Table, _ref=d_ref) -> pa.Table:
            d = cached_get(_ref)
            u = batch.column("u").combine_chunks().to_numpy(
                zero_copy_only=False)
            v = batch.column("v").combine_chunks().to_numpy(
                zero_copy_only=False)

            def member(x):
                pos = np.searchsorted(d, x)
                return (pos < len(d)) & (
                    d[np.minimum(pos, len(d) - 1)] == x)

            keep = ~member(u) & ~member(v)
            return pa.table({"u": pa.array(u[keep], pa.int64()),
                             "v": pa.array(v[keep], pa.int64())})

        live_edges = live_edges.map_batches(
            prune, batch_format="pyarrow", runtime_env=runtime_env()
        ).materialize()
    if not converged:
        raise RuntimeError(
            f"mis_select did not converge within {max_rounds} rounds "
            "(pathological priority chain); raise max_rounds"
        )

    mis_sorted = np.sort(np.concatenate(mis_parts)
                         if mis_parts else np.empty(0, np.int64))
    dead_ref = ray.put((mis_sorted, dead_sorted))

    def label(batch: pa.Table, _ref=dead_ref) -> pa.Table:
        mis, dead = cached_get(_ref)
        ids = batch.column("id").combine_chunks().to_numpy(
            zero_copy_only=False)

        def member(arr, x):
            if not len(arr):
                return np.zeros(len(x), bool)
            pos = np.searchsorted(arr, x)
            return (pos < len(arr)) & (
                arr[np.minimum(pos, len(arr) - 1)] == x)

        # still-live after the loop == isolated == in the MIS
        in_mis = member(mis, ids) | ~member(dead, ids)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "in_mis": pa.array(in_mis.astype(np.int64), pa.int64()),
        })

    return nodes_ds.map_batches(
        label, batch_format="pyarrow", runtime_env=runtime_env()
    )


_BRIDGE_MULT = np.uint64(0x9E3779B97F4A7C15)


def _bridge_edge_hashes(u: np.ndarray, v: np.ndarray):
    """Two independent 32-bit nonzero hashes per canonical edge (u<v),
    derived from the packed pair by the splitmix-style finalizer."""
    with np.errstate(over="ignore"):
        h = (u.astype(np.uint64) * np.uint64(2654435761)
             + v.astype(np.uint64)) * _BRIDGE_MULT
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(29)
    h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.int64) | 1
    h2 = ((h >> np.uint64(32)) & np.uint64(0xFFFFFFFF)).astype(
        np.int64) | 1
    return h1, h2


def _bridges_sequential(u: np.ndarray, v: np.ndarray):
    """Iterative Tarjan low-link bridge finder over canonical (u<v)
    edge arrays — the exact small-graph path."""
    ids = np.unique(np.concatenate([u, v]))
    idx = {int(x): i for i, x in enumerate(ids)}
    n = len(ids)
    adj: list = [[] for _ in range(n)]
    for e, (a, b) in enumerate(zip(u, v)):
        ai, bi = idx[int(a)], idx[int(b)]
        adj[ai].append((bi, e))
        adj[bi].append((ai, e))
    disc = [-1] * n
    low = [0] * n
    out_u, out_v = [], []
    timer = 0
    for s in range(n):
        if disc[s] != -1:
            continue
        stack = [(s, -1, iter(adj[s]))]
        disc[s] = low[s] = timer
        timer += 1
        while stack:
            x, pe, it = stack[-1]
            advanced = False
            for w, eidx in it:
                if eidx == pe:
                    continue
                if disc[w] == -1:
                    disc[w] = low[w] = timer
                    timer += 1
                    stack.append((w, eidx, iter(adj[w])))
                    advanced = True
                    break
                low[x] = min(low[x], disc[w])
            if not advanced:
                stack.pop()
                if stack:
                    p = stack[-1][0]
                    low[p] = min(low[p], low[x])
                    if low[x] > disc[p]:
                        a, b = int(ids[p]), int(ids[x])
                        out_u.append(min(a, b))
                        out_v.append(max(a, b))
    return out_u, out_v


def bridge_edges(nodes_ds, edges_ds, max_rounds: int = 64,
                 broadcast_below: int = 2_000_000):
    """Bridges (cut edges) of the undirected graph — the 2-edge-
    connectivity member of the connectivity family (components = CC,
    strong = SCC, cohesion = k-core/k-truss; this finds the SINGLE
    POINTS OF FAILURE: the links whose loss disconnects discovery,
    what a crawl scheduler re-fetches first and an archive snapshots
    redundantly).

    Size gate: below ``broadcast_below`` canonical edges the edge list
    is pulled ONCE (the same ≤-cutoff envelope every broadcast join
    uses — ~16 MB at the 2M default) and the exact sequential Tarjan
    low-link pass answers in milliseconds; both bridge phases of the
    distributed path are diameter-bound rounds, so ~40 scheduling
    floors on a sliver-sized graph would be pure overhead.  Above the
    cutoff the distributed forest+covering path below takes over
    (pinned equal to the sequential path in tests via
    ``broadcast_below=1``).

    Distributed shape — spanning-forest covering with signed hashes
    (the classic XOR-covering bridge technique, carried in the signed-
    sum group so plain grouped SUM works): build a BFS forest rooted
    at each component's min id (parents = grouped-MIN over the
    frontier, rounds = diameter); every NON-tree edge contributes
    +hash at its min endpoint and −hash at its max endpoint, so a
    subtree's sum cancels edges fully inside it and keeps exactly the
    COVERING edges; subtree sums fold bottom-up one depth layer per
    round (size-gated semi-join/attach + ONE combiner grouped sum per
    round — the connected_components envelope).  A tree edge
    (parent, c) is a bridge iff subtree(c)'s sum is zero on BOTH
    independent 32-bit hash channels (a false bridge needs a signed
    collision on both — probability ≈ 2⁻⁶⁴ per edge; false NON-bridges
    never occur).  Non-tree edges are never bridges (they close a
    cycle by construction).

    ``nodes_ds``: (id); ``edges_ds``: (src, dst) directed or
    undirected.  Returns canonical bridge edges (u, v), u < v.
    Rows-only (no non-recursive SQL form); pinned against a sequential
    Tarjan reference in tests."""
    import ray

    from .agg import grouped_agg
    from .dedup import attach_id_labels, semi_join_ids, subtract_ids

    def rename(ds, old, new):
        return ds.map_batches(
            lambda b: b.rename_columns(
                [new if c == old else c for c in b.column_names]),
            batch_format="pyarrow", runtime_env=runtime_env())

    # canonical undirected edge set (u < v, deduped, self-loop-free)
    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").combine_chunks().to_numpy(
            zero_copy_only=False)
        d = batch.column("dst").combine_chunks().to_numpy(
            zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({"u": pa.array(np.minimum(s, d), pa.int64()),
                         "v": pa.array(np.maximum(s, d), pa.int64())})

    ue = grouped_agg(
        edges_ds.map_batches(canon, batch_format="pyarrow",
                             runtime_env=runtime_env()),
        ["u", "v"], [("__n", "", "count")], sorted_output=False,
    ).select_columns(["u", "v"]).materialize()

    if ue.count() < broadcast_below:
        tbls = ray.get(ue.to_arrow_refs())
        uu = np.concatenate(
            [t.column("u").combine_chunks().to_numpy(
                zero_copy_only=False) for t in tbls if t.num_rows]
            or [np.empty(0, np.int64)])
        vv = np.concatenate(
            [t.column("v").combine_chunks().to_numpy(
                zero_copy_only=False) for t in tbls if t.num_rows]
            or [np.empty(0, np.int64)])
        out_u, out_v = _bridges_sequential(uu, vv)
        return ray.data.from_arrow(pa.table({
            "u": pa.array(out_u, pa.int64()),
            "v": pa.array(out_v, pa.int64()),
        }))

    def symmetrize(batch: pa.Table) -> pa.Table:
        u = batch.column("u").combine_chunks().to_numpy(
            zero_copy_only=False)
        v = batch.column("v").combine_chunks().to_numpy(
            zero_copy_only=False)
        return pa.table({
            "u": pa.array(np.concatenate([u, v]), pa.int64()),
            "v": pa.array(np.concatenate([v, u]), pa.int64()),
        })

    sym = ue.map_batches(symmetrize, batch_format="pyarrow",
                         runtime_env=runtime_env()).materialize()

    # component roots (min id per component) seed the BFS forest
    cc = connected_components(
        rename(rename(ue, "u", "id_a"), "v", "id_b"))
    roots = grouped_agg(
        rename(cc.select_columns(["cluster_id"]), "cluster_id", "id"),
        ["id"], [("__n", "", "count")], sorted_output=False,
    ).select_columns(["id"])
    # isolated nodes (no edges) are their own roots too — harmless:
    # they produce no tree edges
    touched = grouped_agg(rename(sym.select_columns(["u"]), "u", "id"),
                          ["id"], [("__n", "", "count")],
                          sorted_output=False).select_columns(["id"])
    iso = subtract_ids(nodes_ds.select_columns(["id"]), touched,
                       id_column="id", drop_column="id")
    frontier = roots.union(iso).materialize()

    def with_parent_depth(ds, parent, depth):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table({
                "id": batch.column("id"),
                "parent": pa.array(
                    np.full(n, parent, np.int64), pa.int64()),
                "depth": pa.array(
                    np.full(n, depth, np.int64), pa.int64()),
            })
        return ds.map_batches(fn, batch_format="pyarrow",
                              runtime_env=runtime_env())

    visited = with_parent_depth(frontier, -1, 0).materialize()
    depth = 0
    for _ in range(max_rounds):
        if frontier.count() == 0:
            break
        depth += 1
        cand = rename(
            semi_join_ids(sym, frontier, id_column="u",
                          keep_column="id"), "v", "id")
        fresh = subtract_ids(cand, visited, id_column="id",
                             drop_column="id")
        newly = grouped_agg(
            fresh.select_columns(["id", "u"]),
            ["id"], [("parent", "u", "min")], sorted_output=False,
        )

        def stamp(batch: pa.Table, _d=depth) -> pa.Table:
            return batch.append_column(
                "depth", pa.array(
                    np.full(batch.num_rows, _d, np.int64), pa.int64()))

        newly = newly.map_batches(stamp, batch_format="pyarrow",
                                  runtime_env=runtime_env()
                                  ).materialize()
        if newly.count() == 0:
            frontier = newly.select_columns(["id"])
            break
        visited = visited.union(newly).materialize()
        frontier = newly.select_columns(["id"]).materialize()
    else:
        raise RuntimeError(
            f"bridge_edges: BFS forest not settled in {max_rounds} "
            "rounds (diameter exceeds bound); raise max_rounds")
    max_depth = depth

    # non-tree edges: canonical edges minus {canonical(parent, child)}
    PACK = np.int64(1) << np.int64(32)

    def pack_cols(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        assert (hi < (1 << 31)).all(), "bridge_edges: ids exceed pack"
        return lo * PACK + hi

    def key_edges(batch: pa.Table) -> pa.Table:
        u = batch.column("u").combine_chunks().to_numpy(
            zero_copy_only=False)
        v = batch.column("v").combine_chunks().to_numpy(
            zero_copy_only=False)
        return pa.table({
            "key": pa.array(pack_cols(u, v), pa.int64()),
            "u": batch.column("u"), "v": batch.column("v"),
        })

    def key_tree(batch: pa.Table) -> pa.Table:
        c = batch.column("id").combine_chunks().to_numpy(
            zero_copy_only=False)
        p = batch.column("parent").combine_chunks().to_numpy(
            zero_copy_only=False)
        keep = p >= 0
        c, p = c[keep], p[keep]
        return pa.table({"key": pa.array(pack_cols(p, c), pa.int64())})

    keyed = ue.map_batches(key_edges, batch_format="pyarrow",
                           runtime_env=runtime_env())
    tree_keys = visited.map_batches(key_tree, batch_format="pyarrow",
                                    runtime_env=runtime_env())
    nontree = subtract_ids(keyed, tree_keys, id_column="key",
                           drop_column="key").materialize()

    # signed hash contributions: +h at min endpoint, −h at max endpoint
    def contrib(batch: pa.Table) -> pa.Table:
        u = batch.column("u").combine_chunks().to_numpy(
            zero_copy_only=False)
        v = batch.column("v").combine_chunks().to_numpy(
            zero_copy_only=False)
        h1, h2 = _bridge_edge_hashes(u, v)
        return pa.table({
            "id": pa.array(np.concatenate([u, v]), pa.int64()),
            "s1": pa.array(np.concatenate([h1, -h1]), pa.int64()),
            "s2": pa.array(np.concatenate([h2, -h2]), pa.int64()),
        })

    acc = grouped_agg(
        nontree.map_batches(contrib, batch_format="pyarrow",
                            runtime_env=runtime_env()),
        ["id"], [("s1", "s1", "sum"), ("s2", "s2", "sum")],
        sorted_output=False,
    ).materialize()

    # bottom-up subtree folding, one depth layer per round
    tree = visited.materialize()

    def depth_eq(batch: pa.Table, d: int = 0) -> pa.Table:
        dep = batch.column("depth").combine_chunks().to_numpy(
            zero_copy_only=False)
        return batch.filter(pa.array(dep == d)).select(["id"])

    for d in range(max_depth, 0, -1):
        layer_ids = tree.map_batches(
            depth_eq, fn_kwargs={"d": d}, batch_format="pyarrow",
            runtime_env=runtime_env())
        layer_acc = semi_join_ids(acc, layer_ids, id_column="id",
                                  keep_column="id")
        contribs = rename(
            attach_id_labels(
                layer_acc, tree, id_column="id",
                label_id_column="id", label_column="parent",
            ).select_columns(["parent", "s1", "s2"]), "parent", "id")
        acc = grouped_agg(
            acc.union(contribs), ["id"],
            [("s1", "s1", "sum"), ("s2", "s2", "sum")],
            sorted_output=False,
        ).materialize()

    # bridge test: tree edge (parent, c) with zero subtree sum on both
    # channels
    def zeros_only(batch: pa.Table) -> pa.Table:
        s1 = batch.column("s1").combine_chunks().to_numpy(
            zero_copy_only=False)
        s2 = batch.column("s2").combine_chunks().to_numpy(
            zero_copy_only=False)
        return batch.filter(
            pa.array((s1 == 0) & (s2 == 0))).select(["id"])

    def nonroot(batch: pa.Table) -> pa.Table:
        p = batch.column("parent").combine_chunks().to_numpy(
            zero_copy_only=False)
        return batch.filter(pa.array(p >= 0))

    zero_ids = acc.map_batches(zeros_only, batch_format="pyarrow",
                               runtime_env=runtime_env())
    cand_tree = tree.map_batches(nonroot, batch_format="pyarrow",
                                 runtime_env=runtime_env())
    # nodes with NO accumulator row (no non-tree edge anywhere below)
    # also have zero subtree sum — their tree edge is a bridge
    acc_ids = acc.select_columns(["id"])
    no_acc = subtract_ids(cand_tree, acc_ids, id_column="id",
                          drop_column="id")
    zero_tree = semi_join_ids(cand_tree, zero_ids, id_column="id",
                              keep_column="id").union(no_acc)

    def out(batch: pa.Table) -> pa.Table:
        c = batch.column("id").combine_chunks().to_numpy(
            zero_copy_only=False)
        p = batch.column("parent").combine_chunks().to_numpy(
            zero_copy_only=False)
        return pa.table({
            "u": pa.array(np.minimum(p, c), pa.int64()),
            "v": pa.array(np.maximum(p, c), pa.int64()),
        })

    return zero_tree.map_batches(out, batch_format="pyarrow",
                                 runtime_env=runtime_env())


def _concat_aranges(counts: "np.ndarray") -> "np.ndarray":
    """``[0..c0-1, 0..c1-1, ...]`` concatenated — the offset vector for
    vectorized CSR slice gathers (one arange + one repeat, no loop)."""
    total = int(counts.sum())
    out = np.arange(total, dtype=np.int64)
    if len(counts):
        starts = np.cumsum(counts) - counts
        out -= np.repeat(starts, counts)
    return out


def _enumerate_triangles(u: "np.ndarray", v: "np.ndarray",
                         chunk_wedges: int = 20_000_000):
    """Every triangle ``a<b<c`` of a DEDUPED canonical ``u<v`` edge
    list, fully vectorized (no per-edge Python loop): wedge expansion
    on the middle vertex (for edge (a,b), candidates c ∈ N+(b)) plus
    one sorted-edge-key searchsorted membership probe per wedge — the
    same u<v<w ordered-wedge semantics as the distributed plan, so
    each triangle is found exactly once.  Edges are processed in
    chunks so the wedge expansion never materializes more than
    ~``chunk_wedges`` rows at a time (bounds the task's memory on
    skewed graphs near the local cutoff).

    Returns ``(ids, ui, vi, ta, tb, tc)``: compacted node ids, the
    edge endpoints as indices into ``ids``, and one (a,b,c) index
    triple per triangle."""
    ids = np.unique(np.concatenate((u, v))) if len(u) else np.empty(
        0, np.int64)
    ui = np.searchsorted(ids, u)
    vi = np.searchsorted(ids, v)
    n = len(ids)
    empty = np.empty(0, np.int64)
    if not len(ui):
        return ids, ui, vi, empty, empty, empty
    order = np.argsort(ui, kind="stable")
    s2, d2 = ui[order], vi[order]
    starts = np.searchsorted(s2, np.arange(n))
    cnt = np.searchsorted(s2, np.arange(n), side="right") - starts
    ekeys = np.sort(ui.astype(np.uint64) * np.uint64(n)
                    + vi.astype(np.uint64))
    m_all = cnt[vi]
    cum = np.cumsum(m_all)
    tas, tbs, tcs = [], [], []
    lo = 0
    while lo < len(ui):
        base = int(cum[lo - 1]) if lo else 0
        hi = int(np.searchsorted(cum, base + chunk_wedges)) + 1
        hi = min(max(hi, lo + 1), len(ui))
        a, b, m = ui[lo:hi], vi[lo:hi], m_all[lo:hi]
        off = np.repeat(starts[b], m) + _concat_aranges(m)
        wc = d2[off]
        wa = np.repeat(a, m)
        keys = wa.astype(np.uint64) * np.uint64(n) + wc.astype(np.uint64)
        pos = np.searchsorted(ekeys, keys)
        pos[pos >= len(ekeys)] = len(ekeys) - 1
        closed = ekeys[pos] == keys
        tas.append(wa[closed])
        tbs.append(np.repeat(b, m)[closed])
        tcs.append(wc[closed])
        lo = hi
    return (ids, ui, vi, np.concatenate(tas), np.concatenate(tbs),
            np.concatenate(tcs))


def _ktruss_local(u: "np.ndarray", v: "np.ndarray", min_sup: int):
    """LOCAL k-truss peel (one Ray task, size-gated): simultaneous
    removal of every edge with triangle support < min_sup until
    fixpoint.  The k-truss is the UNIQUE maximal subgraph with the
    property, so any peel order — this one, or the distributed
    wedge-join rounds — converges to the same edge set.

    Vectorized (no per-round Python set rebuild): the triangle list is
    enumerated once (:func:`_enumerate_triangles`), each triangle is
    mapped to its three edge ids, and the peel maintains per-edge
    support incrementally — a killed edge retires its triangles and
    decrements the surviving edges' support via ``np.bincount``, so
    total peel work is O(triangles + rounds·edges) numpy, not
    O(rounds·E·deg) Python."""
    if not len(u):
        return u.astype(np.int64), v.astype(np.int64)
    ids, ui, vi, ta, tb, tc = _enumerate_triangles(u, v)
    n = len(ids)
    E = len(ui)
    ekeys = ui.astype(np.uint64) * np.uint64(n) + vi.astype(np.uint64)
    eorder = np.argsort(ekeys)
    ekeys_s = ekeys[eorder]

    def eid(x, y):  # edge index of (x, y), x < y — always present here
        return eorder[np.searchsorted(ekeys_s, x.astype(np.uint64)
                                      * np.uint64(n)
                                      + y.astype(np.uint64))]

    e1, e2, e3 = eid(ta, tb), eid(ta, tc), eid(tb, tc)
    alive_e = np.ones(E, bool)
    tri_alive = np.ones(len(ta), bool)
    sup = (np.bincount(e1, minlength=E) + np.bincount(e2, minlength=E)
           + np.bincount(e3, minlength=E))
    while True:
        kill = alive_e & (sup < min_sup)
        if not kill.any():
            break
        alive_e &= ~kill
        dead_t = tri_alive & ~(alive_e[e1] & alive_e[e2] & alive_e[e3])
        if dead_t.any():
            retired = np.concatenate([e1[dead_t], e2[dead_t], e3[dead_t]])
            sup -= np.bincount(retired, minlength=E)
            tri_alive &= ~dead_t
    keep = np.flatnonzero(alive_e)
    order = np.lexsort((vi[keep], ui[keep]))
    keep = keep[order]
    return ids[ui[keep]], ids[vi[keep]]


def ktruss_edges(edges_ds, k: int, max_rounds: int = 64,
                 local_cutoff: int = 2_000_000):
    """k-truss of the undirected graph: the maximal subgraph in which
    EVERY edge closes ≥ k−2 triangles (within the subgraph) — the
    edge-cohesion strengthening of the k-core (degree can be faked by a
    star; triangle support cannot), the standard dense-community /
    link-farm certificate on web graphs.

    Iterative peel, fully in the data plane: per round ONE
    wedge join on the middle vertex (u<v<w ordered — each triangle
    found once) + ONE closing-edge join, per-triangle emission of its
    three edge-support rows, a combiner count, and the survivor filter
    ``support ≥ k−2`` IS the next round's edge set (edges outside any
    triangle never appear in the support table, so they drop without a
    join-back or an anti-join).  Converges when the edge count is
    stable; raises at the round bound (the peel is monotone decreasing,
    so rounds ≤ initial edges).  Driver sees one scalar per round.

    ``edges_ds``: (src, dst), directed or undirected — canonicalized
    (u<v, self-loops dropped, deduped) here.  Returns (u, v)."""
    from .agg import grouped_agg
    from .partition import coalesce_nonempty

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").combine_chunks().to_numpy(
            zero_copy_only=False)
        d = batch.column("dst").combine_chunks().to_numpy(
            zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({"u": pa.array(np.minimum(s, d), pa.int64()),
                         "v": pa.array(np.maximum(s, d), pa.int64())})

    ue = grouped_agg(
        edges_ds.map_batches(canon, batch_format="pyarrow",
                             runtime_env=runtime_env()),
        ["u", "v"], [("__n", "", "count")],
    ).map_batches(
        lambda b: b.select(["u", "v"]),
        batch_format="pyarrow", runtime_env=runtime_env(),
    ).materialize()
    n_edges = ue.count()
    min_sup = k - 2

    # size-gated LOCAL finish (the scc_labels / connected_components
    # discipline): below the cutoff the canonical edge set ships as
    # block refs to one peel task — the k-truss is unique, so the
    # result is identical to the distributed rounds, which stay
    # pinned by ``local_cutoff=0`` forced-path tests.
    if n_edges <= local_cutoff:
        import ray

        edge_refs = ue.to_arrow_refs()

        @ray.remote(runtime_env=runtime_env())
        def _local(erefs, _ms=min_sup):
            import ray as _r
            tbls = _r.get(list(erefs))

            def col(name):
                arrs = [t.column(name).combine_chunks().to_numpy(
                    zero_copy_only=False) for t in tbls if t.num_rows]
                return (np.concatenate(arrs) if arrs
                        else np.empty(0, np.int64))

            uu, vv = _ktruss_local(col("u"), col("v"), _ms)
            return pa.table({"u": pa.array(uu, pa.int64()),
                             "v": pa.array(vv, pa.int64())})

        return ray.data.from_arrow_refs([_local.remote(edge_refs)])

    for _ in range(max_rounds):
        if n_edges == 0:
            return ue
        parts = max(2, ue.num_blocks() // 4)
        e_nz = coalesce_nonempty(ue)
        b = coalesce_nonempty(ue.map_batches(
            lambda t: pa.table({"u2": t.column("u"), "w": t.column("v")}),
            batch_format="pyarrow", runtime_env=runtime_env()))
        wedges = e_nz.join(b, "inner", num_partitions=parts,
                           on=("v",), right_on=("u2",))
        c = coalesce_nonempty(ue.map_batches(
            lambda t: pa.table({"cu": t.column("u"), "cv": t.column("v")}),
            batch_format="pyarrow", runtime_env=runtime_env()))
        w_nz = coalesce_nonempty(wedges.select_columns(["u", "v", "w"]))
        if w_nz is None:
            tri = None
        else:
            tri = w_nz.join(c, "inner", num_partitions=parts,
                            on=("u", "w"), right_on=("cu", "cv"))

        def supports(batch: pa.Table) -> pa.Table:
            un = batch.column("u").combine_chunks().to_numpy(
                zero_copy_only=False)
            vn = batch.column("v").combine_chunks().to_numpy(
                zero_copy_only=False)
            wn = batch.column("w").combine_chunks().to_numpy(
                zero_copy_only=False)
            return pa.table({
                "u": pa.array(np.concatenate([un, vn, un]), pa.int64()),
                "v": pa.array(np.concatenate([vn, wn, wn]), pa.int64()),
            })

        if tri is None:
            sup_rows = 0
            nxt = ue.limit(0)
        else:
            sup = grouped_agg(
                tri.map_batches(supports, batch_format="pyarrow",
                                batch_size=None,
                                runtime_env=runtime_env()),
                ["u", "v"], [("n", "", "count")],
            )

            def keep_fn(batch: pa.Table) -> pa.Table:
                n = batch.column("n").combine_chunks().to_numpy(
                    zero_copy_only=False)
                return batch.filter(
                    pa.array(n >= min_sup)).select(["u", "v"])

            nxt = sup.map_batches(keep_fn, batch_format="pyarrow",
                                  runtime_env=runtime_env()).materialize()
            sup_rows = nxt.count()
        if sup_rows == n_edges:
            return nxt if tri is not None else ue
        ue, n_edges = (nxt if tri is not None else ue.limit(0)
                       .materialize()), sup_rows
    raise RuntimeError(
        f"ktruss_edges did not stabilize within {max_rounds} rounds; "
        "raise max_rounds (peel removes >= 1 edge per round, so this "
        "indicates an extreme cascade depth)")


def resolve_pointers(
    edges_ds,
    broadcast_below: int = 2_000_000,
    max_rounds: int = 40,
):
    """Functional-graph resolution by POINTER DOUBLING (Wyllie 1979
    list ranking): ``(src, dst)`` edges with at most one out-edge per
    ``src`` and no cycles → ``(id, final_id, hops)`` for every src —
    the terminal node its chain reaches and the exact chain length
    (redirect-chain / alias-chain resolution: canonical target per URL).

    Why doubling and not one-step following: state is ``(id, ptr,
    hops)``; each round every still-unresolved row jumps ``ptr ←
    ptr(ptr)``, ``hops += hops(ptr)`` — after round r each ptr has
    advanced min(2^r, chain length) steps, so chains collapse in
    ceil(log2(max chain length)) rounds instead of O(length) rounds.
    At a 10^10-URL frontier redirect chains are short but the TABLE is
    enormous — the round count is what an iterative dataflow pays the
    per-round shuffle for, and doubling makes it logarithmic.

    Per round: ONE lookup of ptr against the state table itself,
    size-gated like the other fixpoints here — broadcast sorted
    ``(id → ptr, hops)`` arrays + searchsorted below
    ``broadcast_below`` state rows, native LEFT-OUTER hash join above
    (both join inputs routed through ``coalesce_nonempty`` per the
    empty-block rule) — plus an O(1)-row updated-count aggregate for
    convergence (0 updates ⇔ every ptr is terminal).

    Raises on non-convergence within ``max_rounds``: a functional graph
    only fails to resolve when a chain exceeds 2^max_rounds hops or the
    "no cycles" precondition is violated — so the bound doubles as the
    cycle guard (a cycle never resolves).
    """
    import ray
    import pyarrow.compute as pc

    from ..broadcast import cached_get
    from .partition import coalesce_nonempty

    state = edges_ds.map_batches(
        lambda b: pa.table({
            "id": b.column("src"),
            "ptr": b.column("dst"),
            "hops": pa.array(np.ones(b.num_rows, np.int64), pa.int64()),
        }),
        batch_format="pyarrow", runtime_env=runtime_env(),
    ).materialize()
    n_state = state.count()
    if n_state == 0:
        return state.map_batches(
            lambda b: b.rename_columns(["id", "final_id", "hops"]),
            batch_format="pyarrow", runtime_env=runtime_env())

    for _ in range(max_rounds):
        if n_state < broadcast_below:
            rows = state.take_all()
            ids = np.fromiter((r["id"] for r in rows), np.int64, n_state)
            ptrs = np.fromiter((r["ptr"] for r in rows), np.int64, n_state)
            hps = np.fromiter((r["hops"] for r in rows), np.int64, n_state)
            order = np.argsort(ids)
            ref = ray.put((ids[order], ptrs[order], hps[order]))

            def jump(batch: pa.Table, _ref=ref) -> pa.Table:
                sids, sptr, shp = cached_get(_ref)
                p = batch.column("ptr").combine_chunks().to_numpy(
                    zero_copy_only=False)
                h = batch.column("hops").combine_chunks().to_numpy(
                    zero_copy_only=False)
                pos = np.searchsorted(sids, p)
                pos_c = np.minimum(pos, len(sids) - 1)
                hit = sids[pos_c] == p  # ptr is itself a src → jump
                new_p = np.where(hit, sptr[pos_c], p)
                new_h = np.where(hit, h + shp[pos_c], h)
                return pa.table({
                    "id": batch.column("id"),
                    "ptr": pa.array(new_p, pa.int64()),
                    "hops": pa.array(new_h, pa.int64()),
                    "upd": pa.array(hit.astype(np.int64), pa.int64()),
                })

            nxt = state.map_batches(
                jump, batch_format="pyarrow", runtime_env=runtime_env(),
            ).materialize()
        else:
            state_nz = coalesce_nonempty(state).materialize()
            lookup = state_nz.map_batches(
                lambda b: pa.table({
                    "lid": b.column("id"),
                    "lptr": b.column("ptr"),
                    "lhops": b.column("hops"),
                }),
                batch_format="pyarrow", runtime_env=runtime_env(),
            ).materialize()
            joined = state_nz.join(
                coalesce_nonempty(lookup), "left_outer",
                num_partitions=max(2, state_nz.num_blocks() // 4),
                on=("ptr",), right_on=("lid",),
            )

            def merge(batch: pa.Table) -> pa.Table:
                hit_m = pc.is_valid(batch.column("lptr"))
                hit = hit_m.combine_chunks().to_numpy(
                    zero_copy_only=False).astype(bool)
                p = batch.column("ptr").combine_chunks().to_numpy(
                    zero_copy_only=False)
                h = batch.column("hops").combine_chunks().to_numpy(
                    zero_copy_only=False)
                lp = pc.fill_null(batch.column("lptr"), 0)\
                    .combine_chunks().to_numpy(zero_copy_only=False)
                lh = pc.fill_null(batch.column("lhops"), 0)\
                    .combine_chunks().to_numpy(zero_copy_only=False)
                return pa.table({
                    "id": batch.column("id"),
                    "ptr": pa.array(np.where(hit, lp, p), pa.int64()),
                    "hops": pa.array(np.where(hit, h + lh, h), pa.int64()),
                    "upd": pa.array(hit.astype(np.int64), pa.int64()),
                })

            nxt = joined.map_batches(
                merge, batch_format="pyarrow", runtime_env=runtime_env(),
            ).materialize()
        n_upd = nxt.sum("upd")
        state = nxt.select_columns(["id", "ptr", "hops"]).materialize()
        if n_upd == 0:
            return state.map_batches(
                lambda b: b.rename_columns(["id", "final_id", "hops"]),
                batch_format="pyarrow", runtime_env=runtime_env())
    raise RuntimeError(
        f"resolve_pointers did not converge within {max_rounds} rounds: "
        "either a chain exceeds 2^max_rounds hops (raise max_rounds) or "
        "the input violates the acyclic functional-graph precondition "
        "(a redirect cycle never resolves)")


_MSF_B = np.int64(31)               # endpoint bits in the packed edge key
_MSF_MASK = np.int64((1 << 31) - 1)


def boruvka_msf(edges_ds, weight_col: str | None = None,
                broadcast_below: int = 2_000_000, max_rounds: int = 40,
                local_cutoff: int = 2_000_000):
    """Minimum spanning FOREST by Borůvka rounds (Borůvka 1926; the
    component-hooking formulation of Awerbuch–Shiloach): ``(src, dst)``
    edges (directions/parallels/self-loops tolerated — canonicalized,
    min-weight-deduped, self-loops dropped) → the unique MSF edge table
    ``(src, dst, weight)`` under the strict total order ``(weight,
    canonical edge key)``.  With ``weight_col=None`` weights are the
    splitmix64 mix of the canonical key — a deterministic pseudo-random
    order, making the output THE canonical spanning forest of the graph:
    the minimal link subset certifying every page's reachability inside
    its component (what an incremental re-validation pass walks — n−c
    fetches instead of m), reproducible across engines, block layouts
    and merge orders.

    Why Borůvka and not Kruskal/Prim: Kruskal needs a GLOBAL edge sort
    plus a sequential union–find, Prim grows one tree serially; Borůvka
    is the dataflow-native MST — every component picks its minimum
    incident edge SIMULTANEOUSLY, components merge along picks, and the
    number of components with edges at least halves per round, so
    ⌈log₂ n⌉ rounds of combiner-sized exchanges replace the sort.
    Distinct total order ⇒ pointer cycles among picks are exactly the
    mutual pairs (a cycle's strictly-decreasing pick weights contradict
    themselves beyond length 2 — docstring proof standing in for the
    classic one), so breaking ``comp < other`` mutual rows leaves an
    acyclic hook forest that :func:`resolve_pointers` collapses by
    doubling.

    Per round (every exchange combiner-reduced, comp-cardinality —
    never an edge sort):

    * doubled emission ``(comp, other, w, ukey)`` per live edge;
    * grouped MIN w per comp; size-gated attach back (broadcast sorted
      arrays below ``broadcast_below``, native hash join above with
      ``coalesce_nonempty``) filters the candidates, grouped MIN ukey
      breaks w-ties, one more comp-sized attach recovers the argmin
      row — the strict (w, ukey) selection;
    * mutual-pair break via a per-ukey count, hooks resolved to roots
      by :func:`resolve_pointers` (log-hop doubling), and ONE
      comp→root lookup rewrites both edge endpoints; self-edges drop.

    Requires ``0 ≤ id < 2³¹`` (packed edge key — asserted, densify ids
    upstream) and int64 weights.  Raises at ``max_rounds`` (a graph
    needs ≤ ⌈log₂ n⌉; non-termination means a broken precondition)."""
    import ray

    from ..broadcast import cached_get
    from .agg import grouped_agg
    from .partition import coalesce_nonempty

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        d = batch.column("dst").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        if len(s) and (min(s.min(), d.min()) < 0
                       or max(s.max(), d.max()) > int(_MSF_MASK)):
            raise ValueError(
                "boruvka_msf packed-key bound: needs 0 <= id < 2^31 — "
                "densify node ids upstream")
        a, b = np.minimum(s, d), np.maximum(s, d)
        keep = a != b
        a, b = a[keep], b[keep]
        ukey = (a << _MSF_B) | b
        if weight_col is None:
            w = (_splitmix64(ukey.view(np.uint64)) >> np.uint64(1)) \
                .astype(np.int64)
        else:
            w = batch.column(weight_col).combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)[keep]
        return pa.table({"ukey": pa.array(ukey, pa.int64()),
                         "w": pa.array(w, pa.int64())})

    dedup = grouped_agg(
        edges_ds.map_batches(canon, batch_format="pyarrow",
                             batch_size=None,
                             runtime_env=runtime_env()),
        ["ukey"], [("w", "w", "min")], sorted_output=False)

    def decode(batch: pa.Table) -> pa.Table:
        u = batch.column("ukey").combine_chunks().to_numpy(
            zero_copy_only=False)
        return pa.table({
            "ukey": batch.column("ukey"), "w": batch.column("w"),
            "cu": pa.array(u >> _MSF_B, pa.int64()),
            "cv": pa.array(u & _MSF_MASK, pa.int64()),
        })

    state = dedup.map_batches(decode, batch_format="pyarrow",
                              batch_size=None,
                              runtime_env=runtime_env()).materialize()

    # size-gated LOCAL finish (scc_labels / connected_components /
    # ktruss discipline): under the strict (w, ukey) total order the
    # MSF is unique, so a one-task Kruskal over the deduped canonical
    # edges returns exactly what the Borůvka rounds return (which stay
    # pinned by ``local_cutoff=0`` forced-path tests).
    if state.count() <= local_cutoff:
        edge_refs = state.to_arrow_refs()

        @ray.remote(runtime_env=runtime_env())
        def _local_kruskal(erefs):
            import ray as _r
            tbls = _r.get(list(erefs))

            def col(name):
                arrs = [t.column(name).combine_chunks().to_numpy(
                    zero_copy_only=False) for t in tbls if t.num_rows]
                return (np.concatenate(arrs) if arrs
                        else np.empty(0, np.int64))

            ukey = col("ukey")
            w = col("w")
            order = np.lexsort((ukey, w))  # strict (w, ukey)
            u = ukey >> _MSF_B
            v = ukey & _MSF_MASK
            ids = np.unique(np.concatenate((u, v)))
            ui = np.searchsorted(ids, u)
            vi = np.searchsorted(ids, v)
            parent = np.arange(len(ids), dtype=np.int64)

            def find(x: int) -> int:
                root = x
                while parent[root] != root:
                    root = parent[root]
                while parent[x] != root:
                    parent[x], x = root, parent[x]
                return root

            keep = []
            for e in order.tolist():
                ra, rb = find(int(ui[e])), find(int(vi[e]))
                if ra != rb:
                    parent[rb] = ra
                    keep.append(e)
            keep = np.asarray(keep, np.int64)
            return pa.table({
                "src": pa.array(u[keep], pa.int64()),
                "dst": pa.array(v[keep], pa.int64()),
                "weight": pa.array(w[keep], pa.int64()),
            })

        return ray.data.from_arrow_refs(
            [_local_kruskal.remote(edge_refs)])

    empty_msf = pa.table({"src": pa.array([], pa.int64()),
                          "dst": pa.array([], pa.int64()),
                          "weight": pa.array([], pa.int64())})

    def lookup(ds, key_col, map_ds, mkey, mval, out_col, n_map):
        """Size-gated (mkey→mval) attach: misses keep the key itself
        (root-of-itself semantics)."""
        if n_map < broadcast_below:
            rows = map_ds.take_all()
            ids = np.fromiter((r[mkey] for r in rows), np.int64, n_map)
            vals = np.fromiter((r[mval] for r in rows), np.int64, n_map)
            order = np.argsort(ids)
            ref = ray.put((ids[order], vals[order]))

            def att(batch: pa.Table, _ref=ref, _k=key_col,
                    _o=out_col) -> pa.Table:
                sids, svals = cached_get(_ref)
                k = batch.column(_k).combine_chunks().to_numpy(
                    zero_copy_only=False)
                if len(sids) == 0:
                    return batch.append_column(
                        _o, pa.array(k, pa.int64()))
                pos = np.minimum(np.searchsorted(sids, k), len(sids) - 1)
                hit = sids[pos] == k
                return batch.append_column(
                    _o, pa.array(np.where(hit, svals[pos], k), pa.int64()))

            return ds.map_batches(att, batch_format="pyarrow",
                                  batch_size=None,
                                  runtime_env=runtime_env())
        ds_nz = coalesce_nonempty(ds)
        if ds_nz is None:
            return ds
        ds_nz = ds_nz.materialize()
        map_nz = coalesce_nonempty(map_ds.map_batches(
            lambda b, _mk=mkey, _v=mval: pa.table(
                {"__mid": b.column(_mk), "__mval": b.column(_v)}),
            batch_format="pyarrow", batch_size=None,
            runtime_env=runtime_env()).materialize())
        joined = ds_nz.join(map_nz, "left_outer",
                            num_partitions=max(2, ds_nz.num_blocks() // 4),
                            on=(key_col,), right_on=("__mid",))

        def fill(batch: pa.Table, _k=key_col, _o=out_col) -> pa.Table:
            import pyarrow.compute as pc

            v = pc.coalesce(batch.column("__mval"), batch.column(_k))
            return batch.drop_columns(
                [c for c in ("__mid", "__mval") if c in batch.column_names]
            ).append_column(_o, v.cast(pa.int64()))

        return joined.map_batches(fill, batch_format="pyarrow",
                                  runtime_env=runtime_env())

    msf_parts = []
    for _ in range(max_rounds):
        if state.count() == 0:
            break
        def dbl(b: pa.Table) -> pa.Table:
            fwd = pa.table({"comp": b.column("cu"), "other": b.column("cv"),
                            "w": b.column("w"), "ukey": b.column("ukey")})
            rev = pa.table({"comp": b.column("cv"), "other": b.column("cu"),
                            "w": b.column("w"), "ukey": b.column("ukey")})
            return pa.concat_tables([fwd, rev]).combine_chunks()

        doubled = state.map_batches(
            dbl, batch_format="pyarrow", batch_size=None,
            runtime_env=runtime_env()).materialize()
        mins = grouped_agg(doubled, ["comp"], [("mw", "w", "min")],
                           sorted_output=False).materialize()
        n_comp = mins.count()

        def keep_eq(col_a, col_b):
            def f(b: pa.Table, _a=col_a, _b=col_b) -> pa.Table:
                import pyarrow.compute as pc

                return b.filter(pc.equal(b.column(_a), b.column(_b))) \
                    .drop_columns([_b])
            return f

        cand = lookup(doubled, "comp", mins, "comp", "mw", "__mw",
                      n_comp).map_batches(
            keep_eq("w", "__mw"), batch_format="pyarrow",
            runtime_env=runtime_env()).materialize()
        if cand.count() == n_comp:
            # tie-free round (the norm under hash weights): the min-w
            # candidate IS the argmin — skip the ukey tiebreak stages
            winners = cand
        else:
            best = grouped_agg(cand, ["comp"], [("mu", "ukey", "min")],
                               sorted_output=False).materialize()
            winners = lookup(cand, "comp", best, "comp", "mu", "__mu",
                             n_comp).map_batches(
                keep_eq("ukey", "__mu"), batch_format="pyarrow",
                runtime_env=runtime_env()).materialize()

        msf_parts.append(grouped_agg(
            winners, ["ukey"], [("w", "w", "min")], sorted_output=False,
        ).materialize())

        ucnt = grouped_agg(
            winners, ["ukey"], [("c", "", "count")],
            sorted_output=False).materialize()

        def to_hooks(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            mutual_small = pc.and_(
                pc.equal(b.column("__c"), 2),
                pc.less(b.column("comp"), b.column("other")))
            kept = b.filter(pc.invert(mutual_small))
            return pa.table({"src": kept.column("comp"),
                             "dst": kept.column("other")})

        hooks = lookup(winners, "ukey", ucnt, "ukey", "c", "__c",
                       ucnt.count()).map_batches(
            to_hooks, batch_format="pyarrow",
            runtime_env=runtime_env()).materialize()

        n_hooks = hooks.count()
        if n_hooks < broadcast_below:
            # comp-sized hook forest: pointer-double on the driver —
            # the same size gate as the attaches (numpy log-hop chase
            # beats a distributed fixpoint's per-round scheduling here)
            rows = hooks.take_all()
            hsrc = np.fromiter((r["src"] for r in rows), np.int64,
                               n_hooks)
            ptr = np.fromiter((r["dst"] for r in rows), np.int64,
                              n_hooks)
            order = np.argsort(hsrc)
            hsrc, ptr = hsrc[order], ptr[order]
            for _ in range(max_rounds):
                pos = np.minimum(np.searchsorted(hsrc, ptr),
                                 max(n_hooks - 1, 0))
                hit = hsrc[pos] == ptr if n_hooks else \
                    np.zeros(0, bool)
                if not hit.any():
                    break
                ptr = np.where(hit, ptr[pos], ptr)
            else:
                raise RuntimeError(
                    "boruvka_msf hook resolution did not converge — "
                    "broken acyclicity precondition")
            import ray.data as rd

            roots = rd.from_arrow(pa.table({
                "id": pa.array(hsrc, pa.int64()),
                "root": pa.array(ptr, pa.int64())}))
            n_roots = n_hooks
        else:
            roots = resolve_pointers(
                hooks, broadcast_below=broadcast_below,
                max_rounds=max_rounds,
            ).map_batches(
                lambda b: pa.table({"id": b.column("id"),
                                    "root": b.column("final_id")}),
                batch_format="pyarrow", batch_size=None,
                runtime_env=runtime_env()).materialize()
            n_roots = roots.count()

        def relabel(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            live = b.filter(pc.invert(pc.equal(b.column("__ru"),
                                               b.column("__rv"))))
            return pa.table({
                "ukey": live.column("ukey"), "w": live.column("w"),
                "cu": live.column("__ru"), "cv": live.column("__rv")})

        state = lookup(
            lookup(state, "cu", roots, "id", "root", "__ru", n_roots),
            "cv", roots, "id", "root", "__rv", n_roots,
        ).map_batches(relabel, batch_format="pyarrow",
                      runtime_env=runtime_env()).materialize()
    else:
        raise RuntimeError(
            f"boruvka_msf did not converge within {max_rounds} rounds — "
            "a graph needs <= ceil(log2 n); check the id bound and "
            "weight column for the broken precondition")

    def emit(batch: pa.Table) -> pa.Table:
        u = batch.column("ukey").combine_chunks().to_numpy(
            zero_copy_only=False)
        return pa.table({
            "src": pa.array(u >> _MSF_B, pa.int64()),
            "dst": pa.array(u & _MSF_MASK, pa.int64()),
            "weight": batch.column("w").cast(pa.int64()),
        })

    if not msf_parts:
        import ray.data as rd

        return rd.from_arrow(empty_msf)
    out = msf_parts[0]
    for part in msf_parts[1:]:
        out = out.union(part)
    return out.map_batches(emit, batch_format="pyarrow",
                           batch_size=None, runtime_env=runtime_env())


def label_propagation(nodes_ds, edges_ds, rounds: int = 4,
                      broadcast_below: int = 2_000_000):
    """Synchronous label-propagation communities (Raghavan 2007) over an
    undirected edge MULTISET ``(u, v)`` (both directions present;
    parallel edges count with multiplicity): ``label₀(v) = v``; each
    round every node adopts the MOST FREQUENT label among its
    neighbors, ties → smallest label; nodes with no incident edge keep
    their label.  Returns ``(id, label)`` after exactly ``rounds``
    rounds — fixed-K because synchronous LPA has no convergence
    guarantee (2-coloring oscillation is a known property), and a fixed
    round count is the deterministic, SQL-unrollable form.

    Distributed shape, per round (all exchanges combiner-reduced, no
    low-cardinality sorts):

    * attach ``label(u)`` to each edge — size-gated like the other
      fixpoints here: broadcast sorted ``(id → label)`` arrays +
      searchsorted below ``broadcast_below`` label rows, native hash
      join above (``coalesce_nonempty`` on both inputs);
    * frequency = ONE :func:`~.agg.grouped_agg` count at ``(v, label)``
      cardinality;
    * argmax-with-min-tie = pack ``count·2³² + (2³² − 1 − label)`` into
      one int64 and take ONE grouped MAX at node cardinality (requires
      ``label < 2³²`` and per-node-label multiplicity ``< 2³¹`` —
      asserted, densify ids upstream if violated);
    * merge with non-participating nodes = tagged-union packed grouped
      MAX (new rows outrank old by the 2³² tag bit).
    """
    from .agg import grouped_agg
    from .partition import coalesce_nonempty

    import ray

    from ..broadcast import cached_get

    _TAG = np.int64(1) << np.int64(32)
    _LMAX = (1 << 32) - 1

    labels = nodes_ds.map_batches(
        lambda b: pa.table({"id": b.column("id"),
                            "label": b.column("id")}),
        batch_format="pyarrow", runtime_env=runtime_env(),
    ).materialize()
    edges_m = edges_ds.materialize()
    edges_nz = coalesce_nonempty(edges_m)
    if edges_nz is None:
        return labels

    for _ in range(rounds):
        n_labels = labels.count()
        if n_labels < broadcast_below:
            rows = labels.take_all()
            ids = np.fromiter((r["id"] for r in rows), np.int64, n_labels)
            lbl = np.fromiter((r["label"] for r in rows), np.int64,
                              n_labels)
            order = np.argsort(ids)
            ref = ray.put((ids[order], lbl[order]))

            def attach(batch: pa.Table, _ref=ref) -> pa.Table:
                sids, slbl = cached_get(_ref)
                u = batch.column("u").combine_chunks().to_numpy(
                    zero_copy_only=False)
                pos = np.searchsorted(sids, u)  # every u is a node id
                return pa.table({
                    "v": batch.column("v"),
                    "lab": pa.array(slbl[pos], pa.int64()),
                })

            inc = edges_m.map_batches(
                attach, batch_format="pyarrow", runtime_env=runtime_env())
        else:
            labels_nz = coalesce_nonempty(labels)
            inc = edges_nz.join(
                labels_nz, "inner",
                num_partitions=max(2, edges_m.num_blocks() // 4),
                on=("u",), right_on=("id",),
            ).map_batches(
                lambda b: pa.table({"v": b.column("v"),
                                    "lab": b.column("label")}),
                batch_format="pyarrow", runtime_env=runtime_env())

        counts = grouped_agg(inc, ["v", "lab"], [("c", "", "count")],
                             sorted_output=False)

        def pack(batch: pa.Table) -> pa.Table:
            lab = batch.column("lab").combine_chunks().to_numpy(
                zero_copy_only=False)
            c = batch.column("c").combine_chunks().to_numpy(
                zero_copy_only=False)
            if len(lab) and (lab.min() < 0 or lab.max() > _LMAX - 1
                             or c.max() >= (1 << 31)):
                raise ValueError(
                    "label_propagation packing bound exceeded: needs "
                    "0 <= label < 2^32-1 and per-(node,label) count < "
                    "2^31 — densify node ids upstream")
            return pa.table({
                "id": batch.column("v"),
                "p": pa.array(c * (_TAG) + (_LMAX - lab), pa.int64()),
            })

        winners = grouped_agg(
            counts.map_batches(pack, batch_format="pyarrow",
                               batch_size=None,
                               runtime_env=runtime_env()),
            ["id"], [("p", "p", "max")], sorted_output=False)

        def tag_new(batch: pa.Table) -> pa.Table:
            p = batch.column("p").combine_chunks().to_numpy(
                zero_copy_only=False)
            lab = _LMAX - (p % _TAG)
            return pa.table({
                "id": batch.column("id"),
                "t": pa.array(_TAG + lab, pa.int64()),
            })

        def tag_old(batch: pa.Table) -> pa.Table:
            return pa.table({
                "id": batch.column("id"),
                "t": batch.column("label"),
            })

        merged = grouped_agg(
            winners.map_batches(tag_new, batch_format="pyarrow",
                                batch_size=None,
                                runtime_env=runtime_env()).union(
                labels.map_batches(tag_old, batch_format="pyarrow",
                                   batch_size=None,
                                   runtime_env=runtime_env())),
            ["id"], [("t", "t", "max")], sorted_output=False)

        labels = merged.map_batches(
            lambda b: pa.table({
                "id": b.column("id"),
                "label": pa.array(
                    b.column("t").combine_chunks().to_numpy(
                        zero_copy_only=False) % _TAG, pa.int64()),
            }),
            batch_format="pyarrow", runtime_env=runtime_env(),
        ).materialize()

    return labels


def greedy_coloring(nodes_ds, edges_ds, max_colors: int = 64):
    """Distance-1 graph coloring by ITERATED maximal independent set
    (Luby-MIS coloring): color c = the lexicographically-first MIS
    (under :func:`mis_select`'s fixed hash priorities) of the residual
    graph after colors < c are removed.  Partitions EVERY node into
    conflict-free waves — where :func:`mis_select` yields only the
    first batch a snapshot/archival pass can run concurrently, this
    schedules the WHOLE corpus: wave c contains no two linked pages.
    Deterministic end to end (fixed priorities ⇒ each wave is exactly
    the sequential greedy MIS of its residual).

    Bound: a node still uncolored after round c lost to a distinct
    colored NEIGHBOR in every prior round (MIS maximality), and
    colored neighbors leave the residual — so color(v) ≤ deg(v) and
    #colors ≤ Δ+1.  ``max_colors`` therefore only trips on Δ ≥
    max_colors graphs (raise it, or cap hub degrees upstream).

    Driver traffic per wave = O(|wave|) colored ids (the residual
    edge/node filter broadcast), Σ = O(n) — the same envelope as
    ``mis_select``'s own dead-set pruning, with the hash-anti-join
    variant the documented path past broadcast scale.

    ``nodes_ds``: (id); ``edges_ds``: (src, dst).  Returns (id, color).
    """
    import ray

    from ..broadcast import cached_get

    parts: list = []
    live_nodes = nodes_ds.materialize()
    live_edges = edges_ds.materialize()
    for c in range(max_colors):
        if live_nodes.count() == 0:
            out = parts[0]
            for p in parts[1:]:
                out = out.union(p)
            return out
        lab = mis_select(live_nodes, live_edges).materialize()

        def take_wave(batch: pa.Table, _c=c) -> pa.Table:
            m = batch.column("in_mis").combine_chunks().to_numpy(
                zero_copy_only=False).astype(bool)
            ids = batch.column("doc_id").combine_chunks().to_numpy(
                zero_copy_only=False)[m]
            return pa.table({
                "id": pa.array(ids, pa.int64()),
                "color": pa.array(np.full(len(ids), _c, np.int64),
                                  pa.int64()),
            })

        wave = lab.map_batches(take_wave, batch_format="pyarrow",
                               runtime_env=runtime_env()).materialize()
        parts.append(wave)
        wave_ids = np.sort(np.fromiter(
            (r["id"] for r in wave.take_all()), np.int64))
        w_ref = ray.put(wave_ids)

        def drop_nodes(batch: pa.Table) -> pa.Table:
            m = batch.column("in_mis").combine_chunks().to_numpy(
                zero_copy_only=False).astype(bool)
            return pa.table({
                "id": batch.column("doc_id").filter(pa.array(~m)),
            })

        def drop_edges(batch: pa.Table, _ref=w_ref) -> pa.Table:
            w = cached_get(_ref)
            s = batch.column("src").combine_chunks().to_numpy(
                zero_copy_only=False)
            d = batch.column("dst").combine_chunks().to_numpy(
                zero_copy_only=False)

            def member(x):
                if not len(w):
                    return np.zeros(len(x), bool)
                pos = np.searchsorted(w, x)
                return (pos < len(w)) & (
                    w[np.minimum(pos, len(w) - 1)] == x)

            keep = ~member(s) & ~member(d)
            return pa.table({"src": pa.array(s[keep], pa.int64()),
                             "dst": pa.array(d[keep], pa.int64())})

        live_nodes = lab.map_batches(
            drop_nodes, batch_format="pyarrow", runtime_env=runtime_env()
        ).materialize()
        live_edges = live_edges.map_batches(
            drop_edges, batch_format="pyarrow", runtime_env=runtime_env()
        ).materialize()
    raise RuntimeError(
        f"greedy_coloring needed more than {max_colors} colors "
        "(graph max degree >= max_colors); raise max_colors or cap "
        "hub degrees upstream")


_ANF_P = 5                      # per-node registers m = 2^p = 32
_ANF_M = 1 << _ANF_P
_ANF_COLS = [f"r{j:02d}" for j in range(_ANF_M)]


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — full-avalanche 64-bit mix (the
    diffusion HLL register assignment needs; a bare multiplicative hash
    leaves low bits structured)."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _anf_init(ids: np.ndarray) -> dict:
    """Per-node singleton-set HLL registers as m uint8 column arrays:
    exactly one register per node is nonzero (its own hash's rho)."""
    h = _splitmix64(ids)
    idx = (h >> np.uint64(64 - _ANF_P)).astype(np.int64)
    rest = (h << np.uint64(_ANF_P)) | np.uint64((1 << _ANF_P) - 1)
    rho = np.zeros(len(ids), np.uint8)
    cur = rest
    for shift in (32, 16, 8, 4, 2, 1):
        mask = cur < (np.uint64(1) << np.uint64(64 - shift))
        rho[mask] += shift
        cur = np.where(mask, cur << np.uint64(shift), cur)
    rho += 1
    return {c: np.where(idx == j, rho, 0).astype(np.uint8)
            for j, c in enumerate(_ANF_COLS)}


def _anf_estimate(regs: np.ndarray) -> np.ndarray:
    """Row-wise HLL estimate of an (n, m) uint8 register matrix —
    standard estimator with the linear-counting small range (the regime
    the first few radii live in)."""
    m = float(_ANF_M)
    alpha = 0.697 / (1 + 1.213 / m)  # alpha_32
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)),
                                 axis=1)
    zeros = np.count_nonzero(regs == 0, axis=1)
    small = (est <= 2.5 * m) & (zeros > 0)
    lin = m * np.log(m / np.maximum(zeros, 1))
    return np.where(small, lin, est)


def neighborhood_function(nodes_ds, edges_ds, rounds: int,
                          broadcast_below: int = 2_000_000,
                          local_cutoff: int = 2_000_000):
    """HyperANF (Boldi–Rosa–Vigna 2011) — the approximate NEIGHBORHOOD
    FUNCTION of a directed graph: for r = 0..rounds, N(r) ≈ the number
    of (source, reachable-node) pairs within ≤ r hops, from which the
    distance distribution and the EFFECTIVE DIAMETER (smallest r with
    N(r) ≥ 0.9·N(max)) read off directly — the canonical web-graph
    measurement, computable where exact all-pairs BFS (O(n²)) is
    absurd.

    Each node carries a 2^{_ANF_P}-register HLL sketch of its ball;
    round r merges every node's sketch with its IN-neighbors' (so
    per-node balls are in-balls — the aggregate N(r) = #ordered pairs
    within ≤ r hops is identical under either orientation, since
    Σ_v |ball_out(v,r)| = Σ_w |ball_in(w,r)| = #pairs) —
    register-wise max is idempotent/associative, so the merge is ONE
    :func:`~.agg.grouped_agg` MAX over the m uint8 register COLUMNS at
    node cardinality (combiner-reduced; registers stay uint8 on the
    wire), fed by a size-gated sketch attach (broadcast sorted id rows
    + an (n, m) register matrix below ``broadcast_below`` nodes, native
    hash join above — the m fixed-width columns join natively, no LIST
    payload).  Per round the driver sees ONE scalar: Σ_v estimate(ball
    v), computed block-wise.  Relative error ≈ 1.04/√m (~18 % at m=32;
    raise ``_ANF_P`` for tighter curves — cost is linear in m).

    Returns a ``(r, reach_est)`` pyarrow Table with rounds+1 rows
    (float64 estimates; deterministic — splitmix64-hashed registers).
    """
    import ray

    from ..broadcast import cached_get
    from .agg import grouped_agg

    def init(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").combine_chunks().to_numpy(
            zero_copy_only=False)
        cols = _anf_init(ids)
        return pa.table({"id": pa.array(ids, pa.int64()),
                         **{c: pa.array(v, pa.uint8())
                            for c, v in cols.items()}})

    state = nodes_ds.map_batches(
        init, batch_format="pyarrow", runtime_env=runtime_env(),
    ).materialize()
    edges_m = edges_ds.materialize()

    def block_sum(batch: pa.Table) -> pa.Table:
        regs = np.column_stack([
            batch.column(c).combine_chunks().to_numpy(
                zero_copy_only=False) for c in _ANF_COLS
        ]) if batch.num_rows else np.zeros((0, _ANF_M), np.uint8)
        return pa.table({"s": pa.array(
            [float(np.sum(_anf_estimate(regs)))], pa.float64())})

    curve = [(0, state.map_batches(
        block_sum, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env()).sum("s"))]

    n_nodes = state.count()

    # size-gated LOCAL finish (bfs-family discipline): the register
    # merge is an idempotent per-register MAX, so one task iterates
    # the whole HyperANF recurrence over an (n, m) uint8 matrix —
    # registers bit-identical to the grouped-MAX rounds (the curve's
    # float SUM may differ in final ulps from the blockwise
    # distributed sum; the estimator's error is ~18 %, and the
    # operator is rows-only by contract).  Distributed rounds stay
    # pinned by local_cutoff=0 forced-path tests.
    if n_nodes + edges_m.count() <= local_cutoff:
        state_refs = state.to_arrow_refs()
        edge_refs = edges_m.to_arrow_refs()

        @ray.remote(runtime_env=runtime_env())
        def _local(srefs, erefs, _rounds=rounds):
            import ray as _r
            stbls = [t for t in _r.get(list(srefs)) if t.num_rows]
            etbls = [t for t in _r.get(list(erefs)) if t.num_rows]

            def col(tbls, name, dt):
                arrs = [t.column(name).combine_chunks().to_numpy(
                    zero_copy_only=False) for t in tbls]
                return (np.concatenate(arrs) if arrs
                        else np.empty(0, dt))

            ids = col(stbls, "id", np.int64)
            regs = (np.column_stack([col(stbls, c, np.uint8)
                                     for c in _ANF_COLS])
                    if len(ids) else np.zeros((0, _ANF_M), np.uint8))
            order = np.argsort(ids)
            ids, regs = ids[order], regs[order]
            src = col(etbls, "src", np.int64)
            dst = col(etbls, "dst", np.int64)
            si = np.searchsorted(ids, src)
            di = np.searchsorted(ids, dst)
            rs = [0]
            ests = [float(np.sum(_anf_estimate(regs)))]
            for r in range(1, _rounds + 1):
                new = regs.copy()
                if len(si):
                    np.maximum.at(new, di, regs[si])
                regs = new
                rs.append(r)
                ests.append(float(np.sum(_anf_estimate(regs))))
            return pa.table({
                "r": pa.array(rs, pa.int64()),
                "reach_est": pa.array(ests, pa.float64()),
            })

        return ray.get(_local.remote(state_refs, edge_refs))

    for r in range(1, rounds + 1):
        if n_nodes < broadcast_below:
            rows = state.take_all()
            ids = np.fromiter((row["id"] for row in rows), np.int64,
                              n_nodes)
            order = np.argsort(ids)
            mat = np.column_stack([
                np.fromiter((row[c] for row in rows), np.uint8, n_nodes)
                for c in _ANF_COLS])[order]
            ref = ray.put((ids[order], mat))

            def attach(batch: pa.Table, _ref=ref) -> pa.Table:
                sids, smat = cached_get(_ref)
                u = batch.column("src").combine_chunks().to_numpy(
                    zero_copy_only=False)
                pos = np.searchsorted(sids, u)  # every u is a node
                sub = smat[pos]
                return pa.table({
                    "id": batch.column("dst"),
                    **{c: pa.array(sub[:, j], pa.uint8())
                       for j, c in enumerate(_ANF_COLS)}})

            cands = edges_m.map_batches(
                attach, batch_format="pyarrow", runtime_env=runtime_env())
        else:
            from .partition import coalesce_nonempty

            lookup = coalesce_nonempty(state.map_batches(
                lambda b: b.rename_columns(
                    ["lid" if c == "id" else c for c in b.column_names]),
                batch_format="pyarrow", runtime_env=runtime_env(),
            ).materialize())
            cands = coalesce_nonempty(edges_m).join(
                lookup, "inner",
                num_partitions=max(2, edges_m.num_blocks() // 4),
                on=("src",), right_on=("lid",),
            ).map_batches(
                lambda b: b.rename_columns(
                    ["id" if c == "dst" else c
                     for c in b.column_names]).select(
                    ["id"] + _ANF_COLS),
                batch_format="pyarrow", runtime_env=runtime_env())

        state = grouped_agg(
            state.union(cands), ["id"],
            [(c, c, "max") for c in _ANF_COLS],
            sorted_output=False,
        ).materialize()
        curve.append((r, state.map_batches(
            block_sum, batch_format="pyarrow", batch_size=None,
            runtime_env=runtime_env()).sum("s")))

    return pa.table({
        "r": pa.array([r for r, _ in curve], pa.int64()),
        "reach_est": pa.array([s for _, s in curve], pa.float64()),
    })


_STRESS_GB = 46                 # sigma bits inside the packed (d, g) key
_STRESS_DINF = 63               # unreached distance sentinel (6 bits)


def stress_centrality(edges_ds, seeds: "np.ndarray", max_depth: int,
                      broadcast_below: int = 2_000_000,
                      local_cutoff: int = 2_000_000):
    """Sampled stress centrality (Shimbel 1953 / the integer-exact
    member of the Brandes pivot family, Brandes–Pich 2007): for every
    node v, the NUMBER of shortest-path triples (s, t, π) with s in the
    fixed ``seeds`` set and v strictly interior to π, within a
    ``max_depth`` hop horizon — which pages sit ON the corpus's link
    routes (pagerank scores where walks LAND; this scores what they
    must pass THROUGH: the bottleneck/bridge load signal a crawl
    scheduler protects).  Betweenness divides each term by σ_st and
    goes float; stress keeps the raw path count, so the whole
    computation stays EXACT integers — deterministic across engines,
    block layouts and merge orders, the repo's house requirement.

    Algorithm — both Brandes phases as iterative dataflow over ALL K
    seeds at once (one fixed-width column per seed, the HyperANF
    layout; no per-seed re-scan):

    * forward: per node and seed the packed key ``(d << GB) | σ``
      (d = hop distance, σ = #shortest s→v paths).  Round r expands
      only the r−1 frontier: ONE size-gated attach (broadcast sorted
      frontier ids + the per-seed contribution matrix
      ``where(d == r−1, σ, 0)`` below ``broadcast_below`` state rows;
      native hash join above, zero rows filtered in the map), ONE
      combiner grouped SUM at candidate cardinality, and the
      settle-merge as a grouped MIN over the packed columns (settled
      d < r always beats a round-r candidate; unreached = sentinel) —
      σ sums over ALL r−1 predecessors in one aggregate, the classic
      layer recurrence.
    * backward: P(v) = #BFS-DAG paths starting at v
      (``P(v) = Σ_{(v,w) DAG} (1 + P(w))``), layers processed deepest
      first so every gathered P is final.  Per round ONE size-gated
      attach of the dst layer's (d, P) to the edge table, contributions
      ``d(dst) == r+1 ? 1 + P(dst) : 0`` grouped-SUMMED by src as a
      TAGGED column, and the src-side DAG check (``d(src) == r``)
      applied AFTER the merge as a vectorized mask — state and
      candidate q ride separate aggregate outputs, so no second
      (src-side) attach is ever needed.
    * stress(v) = Σ_k σ_k(v)·P_k(v), zeroing v == seed_k terms (the
      endpoint exclusion).

    Both phases ship per round: the attach (bounded by edges), one
    combiner aggregate at node cardinality, one O(1) frontier-count
    scalar.  Nothing row-wise ever reaches the driver on the join
    path; the broadcast path's per-round take_all is the documented
    sub-cutoff envelope (the connected_components contract).

    Truncation semantics: paths are counted within the ``max_depth``
    horizon (the depth-bounded crawl frontier's own reachability) —
    the standard sampled-centrality horizon; raise it for full-graph
    stress on shallow web graphs (effective diameter ~6).

    Envelopes asserted, never wrapped: σ < 2^{GB}=2^46 per node,
    P and σ < 2^31 entering the final product (Σ_k σ·P < K·2^62).
    Returns an ``(id, stress)`` Dataset at node cardinality.

    Reference parity: the reference's crawler has no centrality pass —
    this extends the graph family (SURVEY §2 training-data ops) with
    the standard web-graph bottleneck measurement.
    """
    import ray

    from ..broadcast import cached_get
    from .agg import grouped_agg
    from .partition import coalesce_nonempty

    seeds = np.sort(np.asarray(seeds, np.int64))
    K = len(seeds)
    assert 0 < K <= 32, "stress_centrality: 1..32 seeds"
    assert max_depth < _STRESS_DINF, "max_depth must be < 63"
    P_COLS = [f"p{k}" for k in range(K)]       # packed (d << GB) | sigma
    C_COLS = [f"c{k}" for k in range(K)]       # candidate sigma sums
    Q_COLS = [f"q{k}" for k in range(K)]       # backward path counts
    QC_COLS = [f"qc{k}" for k in range(K)]     # candidate q sums
    G_COLS = [f"g{k}" for k in range(K)]       # sigma carried backward
    D_COLS = [f"d{k}" for k in range(K)]       # unpacked distances
    SENT = np.int64(_STRESS_DINF) << np.int64(_STRESS_GB)
    GMASK = (np.int64(1) << np.int64(_STRESS_GB)) - np.int64(1)

    edges_m = edges_ds.materialize()
    edges_nz = coalesce_nonempty(edges_m)

    # size-gated LOCAL finish (the bfs-family discipline): both
    # Brandes phases are exact-integer layer recurrences, so one task
    # runs them per seed over raw edge arrays (multi-edge
    # multiplicities preserved — the distributed grouped-SUM counts
    # every edge row) bit-identically; distributed rounds stay pinned
    # by local_cutoff=0 forced-path tests and the sequential-reference
    # equality tests.
    if K + edges_m.count() <= local_cutoff:
        edge_refs = edges_m.to_arrow_refs()

        @ray.remote(runtime_env=runtime_env())
        def _local(erefs, _seeds=seeds, _depth=max_depth, _K=K):
            import ray as _r
            etbls = _r.get(list(erefs))

            def col(name):
                arrs = [t.column(name).combine_chunks().to_numpy(
                    zero_copy_only=False) for t in etbls if t.num_rows]
                return (np.concatenate(arrs) if arrs
                        else np.empty(0, np.int64))

            src = col("src")
            dst = col("dst")
            ids = np.unique(np.concatenate((_seeds, src, dst)))
            si = np.searchsorted(ids, src)
            di = np.searchsorted(ids, dst)
            n = len(ids)
            INF = np.int64(2**62)
            stress = np.zeros(n, np.int64)
            reached_any = np.zeros(n, bool)
            for k in range(_K):
                d = np.full(n, INF, np.int64)
                sig = np.zeros(n, np.int64)
                root = int(np.searchsorted(ids, _seeds[k]))
                d[root] = 0
                sig[root] = 1
                for r in range(1, _depth + 1):
                    mask = d[si] == r - 1
                    if not mask.any():
                        break
                    cand = np.zeros(n, np.int64)
                    np.add.at(cand, di[mask], sig[si[mask]])
                    new = (d == INF) & (cand > 0)
                    d[new] = r
                    sig[new] = cand[new]
                # backward: P(v) = Σ_{(v,w): d(w)=d(v)+1} (1 + P(w)),
                # deepest layer first
                P = np.zeros(n, np.int64)
                top = int(d[d < INF].max()) if (d < INF).any() else 0
                for r in range(top - 1, -1, -1):
                    mask = (d[si] == r) & (d[di] == r + 1)
                    if mask.any():
                        np.add.at(P, si[mask], 1 + P[di[mask]])
                term = sig * P
                term[root] = 0                 # endpoint exclusion
                stress += term
                reached_any |= d < INF
            return pa.table({
                "id": pa.array(ids[reached_any], pa.int64()),
                "stress": pa.array(stress[reached_any], pa.int64()),
            })

        return ray.data.from_arrow_refs([_local.remote(edge_refs)])

    # ---- forward: seed rows (d=0, sigma=1) for each seed's own column
    init_cols = {}
    for k in range(K):
        col = np.full(K, SENT, np.int64)
        col[k] = np.int64(1)                   # d=0, sigma=1
        init_cols[P_COLS[k]] = col
    state = ray.data.from_arrow(pa.table({
        "id": pa.array(seeds, pa.int64()),
        **{c: pa.array(v, pa.int64()) for c, v in init_cols.items()},
    })).materialize()

    def _np(batch, col):
        return batch.column(col).combine_chunks().to_numpy(
            zero_copy_only=False)

    r_max = 0
    for r in range(1, max_depth + 1):
        rr = np.int64(r)

        def is_frontier(pmat, _r=rr):
            return (pmat >> np.int64(_STRESS_GB)) == (_r - 1)

        n_state = state.count()
        if n_state < broadcast_below:
            rows = state.take_all()
            ids = np.fromiter((x["id"] for x in rows), np.int64, n_state)
            pmat = np.column_stack([
                np.fromiter((x[c] for x in rows), np.int64, n_state)
                for c in P_COLS]) if n_state else np.zeros((0, K), np.int64)
            fmask = is_frontier(pmat)
            live = fmask.any(axis=1)
            if not live.any():
                break
            f_ids = ids[live]
            order = np.argsort(f_ids)
            contrib = np.where(fmask[live], pmat[live] & GMASK, 0)[order]
            f_ids = f_ids[order]
            ref = ray.put((f_ids, contrib))

            def expand(batch: pa.Table, _ref=ref) -> pa.Table:
                sids, cmat = cached_get(_ref)
                src = batch.column("src").combine_chunks().to_numpy(
                    zero_copy_only=False)
                pos = np.searchsorted(sids, src)
                pos_c = np.minimum(pos, max(len(sids) - 1, 0))
                hit = (sids[pos_c] == src) if len(sids) else \
                    np.zeros(len(src), bool)
                sub = cmat[pos_c[hit]]
                keep = sub.any(axis=1)
                dst = batch.column("dst").combine_chunks().to_numpy(
                    zero_copy_only=False)[hit][keep]
                sub = sub[keep]
                return pa.table({
                    "id": pa.array(dst, pa.int64()),
                    **{c: pa.array(sub[:, k], pa.int64())
                       for k, c in enumerate(C_COLS)}})

            cands = edges_m.map_batches(
                expand, batch_format="pyarrow", runtime_env=runtime_env())
        else:
            n_frontier = state.map_batches(
                lambda b, _r=rr: pa.table({"n": pa.array([int(np.any(
                    np.column_stack([_np(b, c) for c in P_COLS])
                    >> np.int64(_STRESS_GB) == (_r - 1), axis=1).sum())],
                    pa.int64())}),
                batch_format="pyarrow", batch_size=None,
                runtime_env=runtime_env()).sum("n")
            if not n_frontier:
                break
            lookup = coalesce_nonempty(state.map_batches(
                lambda b: b.rename_columns(
                    ["lid" if c == "id" else c for c in b.column_names]),
                batch_format="pyarrow", runtime_env=runtime_env(),
            ).materialize())
            if edges_nz is None or lookup is None:
                break

            def rekey(batch: pa.Table, _r=rr) -> pa.Table:
                pmat = np.column_stack([_np(batch, c) for c in P_COLS]) \
                    if batch.num_rows else np.zeros((0, K), np.int64)
                contrib = np.where(is_frontier(pmat, _r), pmat & GMASK, 0)
                keep = contrib.any(axis=1)
                dst = _np(batch, "dst")[keep]
                contrib = contrib[keep]
                return pa.table({
                    "id": pa.array(dst, pa.int64()),
                    **{c: pa.array(contrib[:, k], pa.int64())
                       for k, c in enumerate(C_COLS)}})

            cands = edges_nz.join(
                lookup, "inner",
                num_partitions=max(2, edges_m.num_blocks() // 4),
                on=("src",), right_on=("lid",),
            ).map_batches(rekey, batch_format="pyarrow",
                          runtime_env=runtime_env())

        # drop empty candidate blocks (schema-less empty bundles confuse
        # downstream union/aggregate schema tracking; metadata-only check)
        cands = coalesce_nonempty(cands)
        if cands is None:
            break     # frontier had no out-edges at all: done
        summed = grouped_agg(cands, ["id"],
                             [(c, c, "sum") for c in C_COLS],
                             sorted_output=False)

        def pack_cand(batch: pa.Table, _r=rr) -> pa.Table:
            cmat = np.column_stack([_np(batch, c) for c in C_COLS]) \
                if batch.num_rows else np.zeros((0, K), np.int64)
            assert cmat.size == 0 or cmat.max() < (1 << _STRESS_GB), (
                "stress_centrality sigma envelope (2^46) exceeded — "
                "reduce max_depth or seed count")
            packed = np.where(cmat > 0,
                              (_r << np.int64(_STRESS_GB)) | cmat, SENT)
            return pa.table({
                "id": batch.column("id"),
                **{c: pa.array(packed[:, k], pa.int64())
                   for k, c in enumerate(P_COLS)}})

        cand_packed = summed.map_batches(
            pack_cand, batch_format="pyarrow", batch_size=None,
            runtime_env=runtime_env())
        state = grouped_agg(
            state.union(cand_packed), ["id"],
            [(c, c, "min") for c in P_COLS], sorted_output=False,
        ).materialize()
        r_max = r

    # ---- backward: state → (id, d_k, g_k, q_k=0); layers deepest-first
    def unpack(batch: pa.Table) -> pa.Table:
        pmat = np.column_stack([_np(batch, c) for c in P_COLS]) \
            if batch.num_rows else np.zeros((0, K), np.int64)
        d = pmat >> np.int64(_STRESS_GB)
        g = np.where(d < _STRESS_DINF, pmat & GMASK, 0)
        zero = np.zeros(batch.num_rows, np.int64)
        return pa.table({
            "id": batch.column("id"),
            **{c: pa.array(d[:, k], pa.int64())
               for k, c in enumerate(D_COLS)},
            **{c: pa.array(g[:, k], pa.int64())
               for k, c in enumerate(G_COLS)},
            **{c: pa.array(zero, pa.int64()) for c in Q_COLS}})

    bstate = state.map_batches(unpack, batch_format="pyarrow",
                               batch_size=None,
                               runtime_env=runtime_env()).materialize()

    for r in range(r_max - 1, -1, -1):
        rr = np.int64(r)
        n_state = bstate.count()
        if n_state < broadcast_below:
            rows = bstate.take_all()
            ids = np.fromiter((x["id"] for x in rows), np.int64, n_state)
            order = np.argsort(ids)
            dmat = np.column_stack([
                np.fromiter((x[c] for x in rows), np.int64, n_state)
                for c in D_COLS])[order]
            qmat = np.column_stack([
                np.fromiter((x[c] for x in rows), np.int64, n_state)
                for c in Q_COLS])[order]
            ids = ids[order]
            # restrict the broadcast to the r+1 layer (per-seed), the
            # frontier-only discipline: contributions can only come
            # from dsts settled at exactly r+1
            layer = (dmat == rr + 1)
            live = layer.any(axis=1)
            l_ids = ids[live]
            l_contrib = np.where(layer[live], 1 + qmat[live], 0)
            ref = ray.put((l_ids, l_contrib))

            def gather(batch: pa.Table, _ref=ref) -> pa.Table:
                sids, cmat = cached_get(_ref)
                dst = batch.column("dst").combine_chunks().to_numpy(
                    zero_copy_only=False)
                pos = np.searchsorted(sids, dst)
                pos_c = np.minimum(pos, max(len(sids) - 1, 0))
                hit = (sids[pos_c] == dst) if len(sids) else \
                    np.zeros(len(dst), bool)
                sub = cmat[pos_c[hit]]
                keep = sub.any(axis=1)
                src = batch.column("src").combine_chunks().to_numpy(
                    zero_copy_only=False)[hit][keep]
                sub = sub[keep]
                return pa.table({
                    "id": pa.array(src, pa.int64()),
                    **{c: pa.array(sub[:, k], pa.int64())
                       for k, c in enumerate(QC_COLS)}})

            qcands = edges_m.map_batches(
                gather, batch_format="pyarrow", runtime_env=runtime_env())
        else:
            lookup = coalesce_nonempty(bstate.map_batches(
                lambda b: b.rename_columns(
                    ["lid" if c == "id" else c for c in b.column_names]),
                batch_format="pyarrow", runtime_env=runtime_env(),
            ).materialize())
            if edges_nz is None or lookup is None:
                qcands = None
            else:
                def gather_j(batch: pa.Table, _r=rr) -> pa.Table:
                    dmat = np.column_stack(
                        [_np(batch, c) for c in D_COLS]) \
                        if batch.num_rows else np.zeros((0, K), np.int64)
                    qmat = np.column_stack(
                        [_np(batch, c) for c in Q_COLS]) \
                        if batch.num_rows else np.zeros((0, K), np.int64)
                    contrib = np.where(dmat == _r + 1, 1 + qmat, 0)
                    keep = contrib.any(axis=1)
                    src = _np(batch, "src")[keep]
                    contrib = contrib[keep]
                    return pa.table({
                        "id": pa.array(src, pa.int64()),
                        **{c: pa.array(contrib[:, k], pa.int64())
                           for k, c in enumerate(QC_COLS)}})

                qcands = edges_nz.join(
                    lookup, "inner",
                    num_partitions=max(2, edges_m.num_blocks() // 4),
                    on=("dst",), right_on=("lid",),
                ).map_batches(gather_j, batch_format="pyarrow",
                              runtime_env=runtime_env())
        if qcands is None:
            continue
        qcands = coalesce_nonempty(qcands)
        if qcands is None:
            continue  # no DAG edges into the r+1 layer: nothing to add

        # tagged-union merge: state rows carry (d, g, q, qc=0); cand
        # rows carry (d=DINF, g=0, q=0, qc) — min(d)/max(g)/sum pick the
        # state values through, then the src-side DAG mask applies
        def tag_state(batch: pa.Table) -> pa.Table:
            zero = np.zeros(batch.num_rows, np.int64)
            return pa.table({
                **{c: batch.column(c)
                   for c in ["id"] + D_COLS + G_COLS + Q_COLS},
                **{c: pa.array(zero, pa.int64()) for c in QC_COLS}})

        def tag_cand(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            dinf = np.full(n, _STRESS_DINF, np.int64)
            zero = np.zeros(n, np.int64)
            return pa.table({
                "id": batch.column("id"),
                **{c: pa.array(dinf, pa.int64()) for c in D_COLS},
                **{c: pa.array(zero, pa.int64()) for c in G_COLS},
                **{c: pa.array(zero, pa.int64()) for c in Q_COLS},
                **{c: batch.column(c) for c in QC_COLS}})

        merged = grouped_agg(
            bstate.map_batches(tag_state, batch_format="pyarrow",
                               batch_size=None,
                               runtime_env=runtime_env()).union(
                qcands.map_batches(tag_cand, batch_format="pyarrow",
                                   batch_size=None,
                                   runtime_env=runtime_env())),
            ["id"],
            [(c, c, "min") for c in D_COLS]
            + [(c, c, "max") for c in G_COLS]
            + [(c, c, "sum") for c in Q_COLS]
            + [(c, c, "sum") for c in QC_COLS],
            sorted_output=False)

        def apply_mask(batch: pa.Table, _r=rr) -> pa.Table:
            dmat = np.column_stack([_np(batch, c) for c in D_COLS]) \
                if batch.num_rows else np.zeros((0, K), np.int64)
            qmat = np.column_stack([_np(batch, c) for c in Q_COLS]) \
                if batch.num_rows else np.zeros((0, K), np.int64)
            qcm = np.column_stack([_np(batch, c) for c in QC_COLS]) \
                if batch.num_rows else np.zeros((0, K), np.int64)
            q = qmat + np.where(dmat == _r, qcm, 0)
            return pa.table({
                **{c: batch.column(c) for c in ["id"] + D_COLS + G_COLS},
                **{c: pa.array(q[:, k], pa.int64())
                   for k, c in enumerate(Q_COLS)}})

        bstate = merged.map_batches(
            apply_mask, batch_format="pyarrow", batch_size=None,
            runtime_env=runtime_env()).materialize()

    seeds_ref = ray.put(seeds)

    def finish(batch: pa.Table) -> pa.Table:
        sds = cached_get(seeds_ref)
        ids = _np(batch, "id")
        gmat = np.column_stack([_np(batch, c) for c in G_COLS]) \
            if batch.num_rows else np.zeros((0, K), np.int64)
        qmat = np.column_stack([_np(batch, c) for c in Q_COLS]) \
            if batch.num_rows else np.zeros((0, K), np.int64)
        assert gmat.size == 0 or (gmat.max() < 2**31
                                  and qmat.max() < 2**31), (
            "stress_centrality product envelope (2^31 each) exceeded")
        for k in range(K):                     # endpoint exclusion
            gmat[ids == sds[k], k] = 0
        return pa.table({
            "id": pa.array(ids, pa.int64()),
            "stress": pa.array((gmat * qmat).sum(axis=1), pa.int64())})

    return bstate.map_batches(finish, batch_format="pyarrow",
                              batch_size=None, runtime_env=runtime_env())


BOWTIE_PARTS = ("CORE", "IN", "OUT", "TUBE", "TENDRIL_IN",
                "TENDRIL_OUT", "OTHER", "DISCONNECTED")


def bowtie_decomposition(nodes_ds, edges_ds, max_rounds: int = 100):
    """Broder bowtie decomposition of the directed web graph: every
    node assigned to exactly one of the eight macro-structure parts
    (Broder et al. 2000, "Graph structure in the Web" — the canonical
    map of a crawl's reachability anatomy; what fraction of the corpus
    a seed inside the core can EVER discover is read straight off
    these counts):

    * ``CORE``  — the giant strongly connected component (largest SCC,
      ties broken toward the smallest canonical SCC label);
    * ``IN``    — reaches the core, not reached from it (new-site
      frontier: pages linking in that nobody links back to);
    * ``OUT``   — reached from the core, does not reach back
      (content sinks: archives, leaf articles);
    * ``TUBE``  — on an IN→OUT path that AVOIDS the core;
    * ``TENDRIL_IN``  — reachable from IN but neither core-reaching
      nor core-reachable;
    * ``TENDRIL_OUT`` — reaches OUT but neither core-reaching nor
      core-reachable;
    * ``OTHER`` — weakly connected to the core but none of the above
      (e.g. a page pointing INTO a tendril; Broder's published
      counts lump these into TENDRILS — kept separate here because
      the split is free and strictly more informative);
    * ``DISCONNECTED`` — not even weakly connected to the core.

    Composition of the repo's existing fixpoints, all size-gated:
    :func:`scc_labels` (giant-SCC core), then the five reachability
    closures — forward/backward/UNDIRECTED from the core for
    OUT/IN/weak, and forward from the core-REACHING set plus backward
    from the core-REACHED set for tubes/tendrils (seeding with the
    full closed sets rather than IN/OUT alone is sound because the
    extra reach lands only on CORE∪OUT / CORE∪IN rows, which the
    higher-priority mask bits already own) — fused into just TWO
    :func:`bfs_distances` fixpoints via world-tripling (node 4u+w,
    worlds = forward / backward / undirected edge copies; the loops
    short-circuit on an empty frontier, so the nominal depth bound is
    free).  The weak component needs no label-propagation
    connected_components pass: undirected reachability from the core
    is exactly membership in its weak component.  The giant
    SCC is picked by a per-block (size, −scc) argmax over the grouped
    SCC sizes — O(#blocks) driver rows, never the SCC count — and the
    core's weak-component label is ONE row (the canonical SCC label is
    the max node id in the component, so the giant label IS a core
    member's id).

    The final classification is ONE combiner grouped-SUM exchange over
    node cardinality: each membership set ships ``(id, bit)`` rows
    (core=1, fwd=2, bwd=4, F=8, B=16, weak=32; every set emits an id
    at most once, so SUM == OR), the bitmask classifies vectorized,
    and a bounded 8-row grouped count leaves the data plane.  No
    per-node state ever lands on the driver.

    Returns an 8-row ``(part, nodes)`` table (every part present,
    zero-filled), plus the classification closure over
    ``(id, mask)`` is internal.  Empty node table → all-zero counts.
    """
    import ray

    from .agg import grouped_agg

    reach_depth = 1 << 30  # fixpoint bound; BFS stops at empty frontier

    scc = scc_labels(edges_ds, nodes_ds, max_rounds=max_rounds)
    scc = scc.materialize()

    sizes = grouped_agg(scc, ["scc"], [("n", "", "count")],
                        sorted_output=False)

    def block_argmax(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"scc": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        s = batch.column("scc").combine_chunks().to_numpy(
            zero_copy_only=False)
        n = batch.column("n").combine_chunks().to_numpy(
            zero_copy_only=False)
        # max size, ties toward the SMALLEST scc label: lexsort keys
        best = np.lexsort((s, -n))[0]
        return pa.table({"scc": pa.array(s[best:best + 1], pa.int64()),
                         "n": pa.array(n[best:best + 1], pa.int64())})

    tops = sizes.map_batches(block_argmax, batch_format="pyarrow",
                             batch_size=None,
                             runtime_env=runtime_env()).take_all()
    if not tops:  # empty graph
        return pa.table({
            "part": pa.array(list(BOWTIE_PARTS), pa.string()),
            "nodes": pa.array([0] * len(BOWTIE_PARTS), pa.int64())})
    giant = min((r for r in tops), key=lambda r: (-int(r["n"]),
                                                  int(r["scc"])))
    giant = int(giant["scc"])

    def _ids_where_scc(batch: pa.Table, _g=giant) -> pa.Table:
        lab = batch.column("scc").combine_chunks().to_numpy(
            zero_copy_only=False)
        return pa.table({"id": batch.column("id").filter(
            pa.array(lab == _g))})

    core = scc.map_batches(_ids_where_scc, batch_format="pyarrow",
                           runtime_env=runtime_env()).materialize()

    edges_m = edges_ds.materialize()

    # World-tripling closure fusion: node 4u+w lives in world w —
    # w=0 FORWARD (original edges), w=1 BACKWARD (reversed edges),
    # w=2 UNDIRECTED (both directions).  The worlds share no edges, so
    # ONE BFS fixpoint over the tripled graph computes the forward,
    # backward AND weak-connectivity closures from the core
    # simultaneously (the weak closure previously cost a full
    # connected_components label-propagation fixpoint — ~40% of this
    # operator's wall at sf0.1; undirected reachability from the core
    # IS membership in the core's weak component, and frontier-BFS
    # converges in diameter rounds instead of label-propagation
    # rounds).  Each round's fixed per-stage cost is the smoke-scale
    # bottleneck, and at real scale the rounds run over one edge table
    # instead of three.  Assumes node ids < 2^61 (doc-id / row-id
    # graphs; url_hash64 keys must be remapped first — same contract
    # as the previous world-doubling).
    def _triple(batch: pa.Table) -> pa.Table:
        s = batch.column("src").combine_chunks().to_numpy(
            zero_copy_only=False)
        d = batch.column("dst").combine_chunks().to_numpy(
            zero_copy_only=False)
        return pa.table({
            "src": pa.array(np.concatenate(
                (4 * s, 4 * d + 1, 4 * s + 2, 4 * d + 2)), pa.int64()),
            "dst": pa.array(np.concatenate(
                (4 * d, 4 * s + 1, 4 * d + 2, 4 * s + 2)), pa.int64()),
        })

    dedges = edges_m.map_batches(_triple, batch_format="pyarrow",
                                 batch_size=None,
                                 runtime_env=runtime_env()).materialize()

    def _all_worlds(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").combine_chunks().to_numpy(
            zero_copy_only=False)
        return pa.table({"id": pa.array(
            np.concatenate((4 * ids, 4 * ids + 1, 4 * ids + 2)),
            pa.int64())})

    def _flip_world(batch: pa.Table) -> pa.Table:
        # the second closure's seeds ARE the first closure's
        # directed-world reach with the world bit flipped: fwd-reached
        # o seeds the backward world (bfar = "reaches OUT∪CORE"),
        # bwd-reached i seeds the forward world (ffar = "reachable
        # from IN∪CORE"); the undirected world (w=2) stays out
        ids = batch.column("id").combine_chunks().to_numpy(
            zero_copy_only=False)
        sel = ids[(ids & 3) != 2]
        return pa.table({"id": pa.array(sel ^ 1, pa.int64())})

    def _world(ds, w: int):
        def pick(batch: pa.Table, _w=w) -> pa.Table:
            ids = batch.column("id").combine_chunks().to_numpy(
                zero_copy_only=False)
            sel = ids[(ids & 3) == _w]
            return pa.table({"id": pa.array(sel >> 2, pa.int64())})
        return ds.map_batches(pick, batch_format="pyarrow",
                              batch_size=None, runtime_env=runtime_env())

    reach1 = bfs_distances(
        dedges,
        core.map_batches(_all_worlds, batch_format="pyarrow",
                         batch_size=None, runtime_env=runtime_env()),
        max_depth=reach_depth,
    ).materialize()
    reach2 = bfs_distances(
        dedges,
        reach1.map_batches(_flip_world, batch_format="pyarrow",
                           batch_size=None, runtime_env=runtime_env()),
        max_depth=reach_depth,
    )
    fwd, bwd, weak = (_world(reach1, 0), _world(reach1, 1),
                      _world(reach1, 2))
    ffar, bfar = _world(reach2, 0), _world(reach2, 1)

    def _bit(bit):
        def tag(batch: pa.Table, _b=bit) -> pa.Table:
            return pa.table({
                "id": batch.column("id"),
                "bit": pa.array(np.full(batch.num_rows, _b, np.int64),
                                pa.int64())})
        return tag

    parts = nodes_ds.map_batches(_bit(0), batch_format="pyarrow",
                                 runtime_env=runtime_env())
    for src_ds, bit in ((core, 1), (fwd, 2), (bwd, 4),
                        (ffar, 8), (bfar, 16), (weak, 32)):
        parts = parts.union(src_ds.map_batches(
            _bit(bit), batch_format="pyarrow", runtime_env=runtime_env()))

    masks = grouped_agg(parts, ["id"], [("m", "bit", "sum")],
                        sorted_output=False)

    def classify(batch: pa.Table) -> pa.Table:
        m = batch.column("m").combine_chunks().to_numpy(
            zero_copy_only=False)
        part = np.full(len(m), 7, np.int64)          # DISCONNECTED
        part[(m & 32) != 0] = 6                      # OTHER
        part[((m & 16) != 0) & ((m & 8) == 0)] = 5   # TENDRIL_OUT
        part[((m & 8) != 0) & ((m & 16) == 0)] = 4   # TENDRIL_IN
        part[((m & 8) != 0) & ((m & 16) != 0)] = 3   # TUBE
        part[(m & 2) != 0] = 2                       # OUT
        part[(m & 4) != 0] = 1                       # IN
        part[(m & 1) != 0] = 0                       # CORE
        return pa.table({"part": pa.array(part, pa.int64())})

    counts = grouped_agg(
        masks.map_batches(classify, batch_format="pyarrow",
                          batch_size=None, runtime_env=runtime_env()),
        ["part"], [("nodes", "", "count")]).take_all()  # ≤ 8 rows
    out = {i: 0 for i in range(len(BOWTIE_PARTS))}
    for r in counts:
        out[int(r["part"])] = int(r["nodes"])
    return pa.table({
        "part": pa.array(list(BOWTIE_PARTS), pa.string()),
        "nodes": pa.array([out[i] for i in range(len(BOWTIE_PARTS))],
                          pa.int64())})


def triangle_tallies_local(ue_ds, local_cutoff: int = 2_000_000):
    """Below-cutoff branch for the ordered-wedge triangle family
    (triangle_count / local_clustering): ONE task computes per-node
    ``(node, deg, tri)`` and the global triangle count from a
    materialized canonical ``u<v`` edge Dataset — each triangle found
    once at its lowest edge via higher-neighbor sorted-array
    intersections, exactly the u<v<w wedge-join semantics.  Returns a
    ``(per_node_dataset, n_triangles)`` pair, or ``None`` above the
    cutoff (callers fall through to the distributed wedge plan, which
    stays pinned by the shared SQL oracles)."""
    import ray

    if ue_ds.count() > local_cutoff:
        return None
    edge_refs = ue_ds.to_arrow_refs()

    @ray.remote(num_returns=2, runtime_env=runtime_env())
    def _local(erefs):
        import ray as _r
        etbls = _r.get(list(erefs))

        def col(name):
            arrs = [t.column(name).combine_chunks().to_numpy(
                zero_copy_only=False) for t in etbls if t.num_rows]
            return (np.concatenate(arrs) if arrs
                    else np.empty(0, np.int64))

        u = col("u")
        v = col("v")
        ids, ui, vi, ta, tb, tc = _enumerate_triangles(u, v)
        n = len(ids)
        deg = (np.bincount(ui, minlength=n)
               + np.bincount(vi, minlength=n)).astype(np.int64)
        tri = (np.bincount(ta, minlength=n)
               + np.bincount(tb, minlength=n)
               + np.bincount(tc, minlength=n)).astype(np.int64)
        tbl = pa.table({
            "node": pa.array(ids, pa.int64()),
            "deg": pa.array(deg, pa.int64()),
            "tri": pa.array(tri, pa.int64()),
        })
        return tbl, len(ta)

    # two returns: the per-node block stays in the object store (it
    # feeds the Dataset directly); only the scalar triangle count is
    # ray.get-ed on the driver — never the table (ADVICE r4).
    tbl_ref, total_ref = _local.remote(edge_refs)
    ds = ray.data.from_arrow_refs([tbl_ref])
    return ds, int(ray.get(total_ref))


_MSD_INF = np.int64(2**62)  # unreached sentinel; min-safe, never summed


def multi_source_distances(edges_ds, seeds: "np.ndarray", max_depth: int,
                           broadcast_below: int = 2_000_000,
                           local_cutoff: int = 2_000_000):
    """Per-seed hop distances from K fixed seeds in ONE fixpoint:
    ``(id, d0..d{K-1})`` rows with ``dk`` = hop distance from
    ``seeds[k]`` (``_MSD_INF`` sentinel when unreached within
    ``max_depth``) — the distance MATRIX slice every pivot-sampled
    centrality consumes.  :func:`bfs_distances` collapses all seeds to
    one MIN column; :func:`stress_centrality` carries (d, σ) packed —
    this is the distance-only member: K BFS labelings for the price
    of one driver loop (the HyperANF fixed-width-column layout), not
    K sequential fixpoints.

    Per round: frontier = rows with any ``dk == r−1``; ONE size-gated
    attach (below ``broadcast_below`` state rows, broadcast the sorted
    frontier ids + per-seed boolean frontier matrix and expand inside
    ``map_batches`` over the distributed edges; above, native hash
    join edges⋈state with the frontier test applied post-join), a
    grouped-MIN combiner collapses duplicate candidates at candidate
    cardinality, and the settle-merge is a grouped MIN over the K
    distance columns (settled d < r always beats a round-r candidate).
    Empty frontier short-circuits; candidate emission is bounded by
    frontier out-edges, never the reachable set."""
    import ray

    from ..broadcast import cached_get
    from .agg import grouped_agg
    from .partition import coalesce_nonempty

    seeds = np.sort(np.asarray(seeds, np.int64))
    K = len(seeds)
    assert 0 < K <= 32, "multi_source_distances: 1..32 seeds"
    D_COLS = [f"d{k}" for k in range(K)]

    edges_m = edges_ds.materialize()
    edges_nz = coalesce_nonempty(edges_m)

    # size-gated LOCAL finish (the bfs_distances discipline): K CSR
    # BFS passes in one task — integer hops, bit-identical to the
    # per-round grouped-MIN exchanges, which stay pinned by
    # local_cutoff=0 forced-path tests
    if K + edges_m.count() <= local_cutoff:
        edge_refs = edges_m.to_arrow_refs()

        @ray.remote(runtime_env=runtime_env())
        def _local(erefs, _seeds=seeds, _depth=max_depth, _K=K):
            import ray as _r
            etbls = _r.get(list(erefs))

            def col(name):
                arrs = [t.column(name).combine_chunks().to_numpy(
                    zero_copy_only=False) for t in etbls if t.num_rows]
                return (np.concatenate(arrs) if arrs
                        else np.empty(0, np.int64))

            src = col("src")
            dst = col("dst")
            ids = np.unique(np.concatenate((_seeds, src, dst)))
            si = np.searchsorted(ids, src)
            di = np.searchsorted(ids, dst)
            order = np.argsort(si, kind="stable")
            s2, d2 = si[order], di[order]
            starts = np.searchsorted(s2, np.arange(len(ids)))
            ends = np.searchsorted(s2, np.arange(len(ids)),
                                   side="right")
            dists = np.full((_K, len(ids)), _MSD_INF, np.int64)
            for k in range(_K):
                root = int(np.searchsorted(ids, _seeds[k]))
                dists[k, root] = 0
                frontier = [root]
                for r in range(1, _depth + 1):
                    if not frontier:
                        break
                    spans = [d2[starts[v]:ends[v]] for v in frontier]
                    nbrs = (np.unique(np.concatenate(spans))
                            if spans else np.empty(0, np.int64))
                    new = nbrs[dists[k, nbrs] == _MSD_INF] \
                        if len(nbrs) else nbrs
                    dists[k, new] = r
                    frontier = new.tolist()
            reached = (dists < _MSD_INF).any(axis=0)
            out = {"id": pa.array(ids[reached], pa.int64())}
            for k in range(_K):
                out[f"d{k}"] = pa.array(dists[k, reached], pa.int64())
            return pa.table(out)

        return ray.data.from_arrow_refs([_local.remote(edge_refs)])

    init = {}
    for k in range(K):
        col = np.full(K, _MSD_INF, np.int64)
        col[k] = 0
        init[D_COLS[k]] = col
    state = ray.data.from_arrow(pa.table({
        "id": pa.array(seeds, pa.int64()),
        **{c: pa.array(v, pa.int64()) for c, v in init.items()},
    })).materialize()

    def _np(batch, col):
        return batch.column(col).combine_chunks().to_numpy(
            zero_copy_only=False)

    for r in range(1, max_depth + 1):
        rr = np.int64(r)
        n_state = state.count()
        if n_state < broadcast_below:
            rows = state.take_all()
            ids = np.fromiter((x["id"] for x in rows), np.int64, n_state)
            dmat = np.column_stack([
                np.fromiter((x[c] for x in rows), np.int64, n_state)
                for c in D_COLS]) if n_state else np.zeros((0, K),
                                                           np.int64)
            fmask = dmat == (rr - 1)
            live = fmask.any(axis=1)
            if not live.any():
                break
            f_ids = ids[live]
            order = np.argsort(f_ids)
            fmat = fmask[live][order]
            f_ids = f_ids[order]
            ref = ray.put((f_ids, fmat))

            def expand(batch: pa.Table, _ref=ref, _r=rr) -> pa.Table:
                sids, m = cached_get(_ref)
                src = batch.column("src").combine_chunks().to_numpy(
                    zero_copy_only=False)
                pos = np.searchsorted(sids, src)
                pos_c = np.minimum(pos, max(len(sids) - 1, 0))
                hit = (sids[pos_c] == src) if len(sids) else \
                    np.zeros(len(src), bool)
                sub = m[pos_c[hit]]
                dst = batch.column("dst").combine_chunks().to_numpy(
                    zero_copy_only=False)[hit]
                cand = np.where(sub, _r, _MSD_INF)
                return pa.table({
                    "id": pa.array(dst, pa.int64()),
                    **{c: pa.array(cand[:, k], pa.int64())
                       for k, c in enumerate(D_COLS)}})

            cands = edges_m.map_batches(
                expand, batch_format="pyarrow", runtime_env=runtime_env())
        else:
            n_frontier = state.map_batches(
                lambda b, _r=rr: pa.table({"n": pa.array([int(np.any(
                    np.column_stack([_np(b, c) for c in D_COLS])
                    == (_r - 1), axis=1).sum())], pa.int64())}),
                batch_format="pyarrow", batch_size=None,
                runtime_env=runtime_env()).sum("n")
            if not n_frontier:
                break
            lookup = coalesce_nonempty(state.map_batches(
                lambda b: b.rename_columns(
                    ["lid" if c == "id" else c for c in b.column_names]),
                batch_format="pyarrow", runtime_env=runtime_env(),
            ).materialize())
            if edges_nz is None or lookup is None:
                break

            def rekey(batch: pa.Table, _r=rr) -> pa.Table:
                dmat = np.column_stack([_np(batch, c) for c in D_COLS]) \
                    if batch.num_rows else np.zeros((0, K), np.int64)
                f = dmat == (_r - 1)
                keep = f.any(axis=1)
                dst = _np(batch, "dst")[keep]
                cand = np.where(f[keep], _r, _MSD_INF)
                return pa.table({
                    "id": pa.array(dst, pa.int64()),
                    **{c: pa.array(cand[:, k], pa.int64())
                       for k, c in enumerate(D_COLS)}})

            cands = edges_nz.join(
                lookup, "inner",
                num_partitions=max(2, edges_m.num_blocks() // 4),
                on=("src",), right_on=("lid",),
            ).map_batches(rekey, batch_format="pyarrow",
                          runtime_env=runtime_env())

        cands = coalesce_nonempty(cands)
        if cands is None:
            break
        state = grouped_agg(
            state.union(cands), ["id"],
            [(c, c, "min") for c in D_COLS], sorted_output=False,
        ).materialize()

    return state


def harmonic_centrality(edges_ds, seeds: "np.ndarray", max_depth: int,
                        scale: int | None = None,
                        broadcast_below: int = 2_000_000):
    """Sampled harmonic closeness (Marchiori–Latora 2000 / Boldi–Vigna
    2014's recommended centrality; pivot sampling per Eppstein–Wang
    2004): for every node v, ``h(v) = Σ_s scale // d(s, v)`` over the
    K fixed seed pivots with 1 ≤ d ≤ ``max_depth`` — the PROXIMITY
    member of the centrality family (pagerank scores where walks
    LAND, stress what routes pass THROUGH; harmonic scores what is
    CLOSE to everywhere: the few-hops-from-any-seed pages a crawl
    reaches first, with the 1/d weighting that handles unreachable
    pairs gracefully — closeness' Σd diverges on them, 1/∞ = 0 does
    not).  ``scale`` defaults to lcm(1..max_depth), making every term
    — hence the whole statistic — an EXACT integer, deterministic
    across engines, block layouts and merge orders; an explicit scale
    must keep that divisibility (asserted).

    One :func:`multi_source_distances` fixpoint (K labelings, one
    driver loop), then a single vectorized fold per block: sum
    ``scale // d`` over the seed columns, d = 0 (self) and unreached
    excluded.  Returns ``(id, harmonic)`` at reached-node cardinality
    (unreached-by-every-seed nodes score 0 and are omitted)."""
    if scale is None:
        scale = 1
        for d in range(2, max_depth + 1):
            g, a, b = 1, scale, d
            while b:
                a, b = b, a % b
            g = a
            scale = scale * d // g
    for d in range(1, max_depth + 1):
        assert scale % d == 0, "harmonic scale must clear every 1/d"

    state = multi_source_distances(edges_ds, seeds, max_depth,
                                   broadcast_below=broadcast_below)
    K = len(np.asarray(seeds))
    D_COLS = [f"d{k}" for k in range(K)]

    def fold(batch: pa.Table, _s=np.int64(scale)) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"id": pa.array([], pa.int64()),
                             "harmonic": pa.array([], pa.int64())})
        dmat = np.column_stack([
            batch.column(c).combine_chunks().to_numpy(
                zero_copy_only=False) for c in D_COLS])
        ok = (dmat >= 1) & (dmat <= max_depth)
        h = np.where(ok, _s // np.maximum(dmat, 1), 0).sum(axis=1)
        return pa.table({"id": batch.column("id"),
                         "harmonic": pa.array(h, pa.int64())})

    return state.map_batches(fold, batch_format="pyarrow",
                             batch_size=None, runtime_env=runtime_env())


def opic(edges_ds, nodes_ds, rounds: int = 4, budget: int | None = None,
         scale: int = 10**12, broadcast_below: int = 2_000_000,
         shuffle_partitions: int | None = None):
    """Budgeted synchronous OPIC — Adaptive On-line Page Importance
    Computation (Abiteboul, Preda & Cobéna, WWW 2003; public method):
    the importance estimator a crawler maintains WHILE crawling, without
    waiting for pagerank's full power iterations.  Every page holds
    ``cash`` and ``hist``; each round the ``budget`` pages with the most
    cash "fire" — exactly the pages a cash-greedy crawler fetches next,
    tie-broken (cash DESC, id ASC) — banking their cash into their
    history and distributing ``⌊cash/outdeg⌋`` along each out-edge;
    floor-division residue and dangling-page cash bank in a virtual
    root pool redistributed ``⌊R/n⌋`` per page next round (mass is
    conserved exactly).  Importance estimate after any round =
    ``cash + hist``; pagerank scores the limit, OPIC scores the
    crawl-so-far.  Integer end-to-end — bit-identical across engines
    and summation orders (the pagerank determinism rule), so the
    fixed-round run unrolls into SQL.

    Returns ``(id, cash, hist)`` for every node.

    Scale shape: out-degrees attach to edges ONCE (size-gated broadcast
    below ``broadcast_below``, native hash join above — the pagerank
    discipline); per round the fired set is an exact two-level partial
    top-B (O(blocks × B) rows — the fired rows ARE the crawler's fetch
    list, so B driver rows is the operator's contract, not a leak), one
    broadcast of B (id, cash) pairs, one edge map + combiner grouped
    sum at in-linked-node cardinality, one state map, one grouped merge
    at node cardinality.  The root pool is two driver integers."""
    import ray

    from ..broadcast import cached_get
    from .agg import grouped_agg
    from .partition import coalesce_nonempty

    n_parts = shuffle_partitions or max(
        2, int(ray.cluster_resources().get("CPU", 8)))

    n_nodes = nodes_ds.count()
    if n_nodes == 0:
        return ray.data.from_arrow(pa.table({
            "id": pa.array([], pa.int64()),
            "cash": pa.array([], pa.int64()),
            "hist": pa.array([], pa.int64()),
        }))
    B = budget if budget is not None else max(1, n_nodes // 4)

    deg = grouped_agg(edges_ds, ["src"], [("outdeg", "", "count")])
    deg_nz = coalesce_nonempty(deg)

    # outdeg onto nodes (LEFT semantics: no out-edges → 0) and onto
    # edges (every edge's src has outdeg ≥ 1 by construction)
    n_deg = 0 if deg_nz is None else deg_nz.count()
    if deg_nz is None or n_deg <= broadcast_below:
        tbls = [] if deg_nz is None else ray.get(deg_nz.to_arrow_refs())
        srcs = np.concatenate(
            [t.column("src").combine_chunks().to_numpy(zero_copy_only=False)
             for t in tbls if t.num_rows] or [np.empty(0, np.int64)])
        degs = np.concatenate(
            [t.column("outdeg").combine_chunks().to_numpy(
                zero_copy_only=False)
             for t in tbls if t.num_rows] or [np.empty(0, np.int64)])
        order = np.argsort(srcs, kind="stable")
        dref = ray.put((srcs[order], degs[order]))

        def _lookup_deg(ids: np.ndarray) -> np.ndarray:
            ss, dd = cached_get(dref)
            if not len(ss):
                return np.zeros(len(ids), np.int64)
            pos = np.searchsorted(ss, ids)
            pos[pos == len(ss)] = 0
            hit = ss[pos] == ids
            return np.where(hit, dd[pos], np.int64(0))

        def node_init(batch: pa.Table) -> pa.Table:
            ids = batch.column("id").combine_chunks().to_numpy(
                zero_copy_only=False)
            return pa.table({
                "id": pa.array(ids, pa.int64()),
                "cash": pa.array(
                    np.full(len(ids), scale // n_nodes, np.int64)),
                "hist": pa.array(np.zeros(len(ids), np.int64)),
                "outdeg": pa.array(_lookup_deg(ids), pa.int64()),
            })

        state = nodes_ds.map_batches(node_init, batch_format="pyarrow",
                                     runtime_env=runtime_env())

        def edge_deg(batch: pa.Table) -> pa.Table:
            src = batch.column("src").combine_chunks().to_numpy(
                zero_copy_only=False)
            return pa.table({
                "src": pa.array(src, pa.int64()),
                "dst": batch.column("dst"),
                "outdeg": pa.array(_lookup_deg(src), pa.int64()),
            })

        edges_deg = edges_ds.map_batches(
            edge_deg, batch_format="pyarrow", runtime_env=runtime_env())
    else:
        marker = deg_nz.map_batches(
            lambda b: pa.table({"__d_src": b.column("src"),
                                "outdeg": b.column("outdeg")}),
            batch_format="pyarrow", runtime_env=runtime_env())
        nodes_nz = coalesce_nonempty(nodes_ds)
        nj = nodes_nz.join(marker, "left_outer", num_partitions=n_parts,
                           on=("id",), right_on=("__d_src",))

        def node_init_j(batch: pa.Table) -> pa.Table:
            ids = batch.column("id").combine_chunks().to_numpy(
                zero_copy_only=False)
            od = batch.column("outdeg").combine_chunks().to_numpy(
                zero_copy_only=False)
            od = (np.nan_to_num(od).astype(np.int64)
                  if od.dtype.kind == "f" else od.astype(np.int64))
            return pa.table({
                "id": pa.array(ids, pa.int64()),
                "cash": pa.array(
                    np.full(len(ids), scale // n_nodes, np.int64)),
                "hist": pa.array(np.zeros(len(ids), np.int64)),
                "outdeg": pa.array(od, pa.int64()),
            })

        state = nj.map_batches(node_init_j, batch_format="pyarrow",
                               runtime_env=runtime_env())
        ej = coalesce_nonempty(edges_ds).join(
            marker, "inner", num_partitions=n_parts,
            on=("src",), right_on=("__d_src",))
        edges_deg = ej.map_batches(
            lambda b: b.select(["src", "dst", "outdeg"]),
            batch_format="pyarrow", runtime_env=runtime_env())

    state = state.materialize()
    edges_deg = edges_deg.materialize()
    root = scale - n_nodes * (scale // n_nodes)

    def block_topb(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "id": pa.array([], pa.int64()),
                "cash": pa.array([], pa.int64()),
                "outdeg": pa.array([], pa.int64()),
            })
        ids = batch.column("id").combine_chunks().to_numpy(
            zero_copy_only=False)
        cash = batch.column("cash").combine_chunks().to_numpy(
            zero_copy_only=False)
        od = batch.column("outdeg").combine_chunks().to_numpy(
            zero_copy_only=False)
        top = np.lexsort((ids, -cash))[:B]
        return pa.table({
            "id": pa.array(ids[top], pa.int64()),
            "cash": pa.array(cash[top], pa.int64()),
            "outdeg": pa.array(od[top], pa.int64()),
        })

    for _ in range(rounds):
        fired_rows = (state.map_batches(
            block_topb, batch_format="pyarrow", batch_size=None,
            runtime_env=runtime_env())
            .repartition(1)
            .map_batches(block_topb, batch_format="pyarrow",
                         batch_size=None, runtime_env=runtime_env())
            .take_all())  # exactly B rows: the round's fetch list
        f_ids = np.asarray([r["id"] for r in fired_rows], np.int64)
        f_cash = np.asarray([r["cash"] for r in fired_rows], np.int64)
        f_deg = np.asarray([r["outdeg"] for r in fired_rows], np.int64)
        order = np.argsort(f_ids, kind="stable")
        f_ids, f_cash, f_deg = f_ids[order], f_cash[order], f_deg[order]

        share = root // n_nodes
        residue = np.where(f_deg > 0,
                           f_cash - f_deg * (f_cash // np.maximum(f_deg, 1)),
                           f_cash)
        root = root - n_nodes * share + int(residue.sum())
        fref = ray.put((f_ids, f_cash))

        def contrib(batch: pa.Table) -> pa.Table:
            fids, fcash = cached_get(fref)
            src = batch.column("src").combine_chunks().to_numpy(
                zero_copy_only=False)
            dst = batch.column("dst").combine_chunks().to_numpy(
                zero_copy_only=False)
            od = batch.column("outdeg").combine_chunks().to_numpy(
                zero_copy_only=False)
            if not len(fids):
                hit = np.zeros(len(src), bool)
                pos = np.zeros(len(src), np.int64)
            else:
                pos = np.searchsorted(fids, src)
                pos[pos == len(fids)] = 0
                hit = fids[pos] == src
            c = fcash[pos] // np.maximum(od, 1)
            return pa.table({
                "id": pa.array(dst[hit], pa.int64()),
                "cash": pa.array(c[hit], pa.int64()),
                "hist": pa.array(np.zeros(int(hit.sum()), np.int64)),
                "outdeg": pa.array(np.zeros(int(hit.sum()), np.int64)),
            })

        inc = edges_deg.map_batches(contrib, batch_format="pyarrow",
                                    runtime_env=runtime_env())

        def fire(batch: pa.Table, sh=share) -> pa.Table:
            fids, _ = cached_get(fref)
            ids = batch.column("id").combine_chunks().to_numpy(
                zero_copy_only=False)
            cash = batch.column("cash").combine_chunks().to_numpy(
                zero_copy_only=False)
            hist = batch.column("hist").combine_chunks().to_numpy(
                zero_copy_only=False)
            od = batch.column("outdeg").combine_chunks().to_numpy(
                zero_copy_only=False)
            if len(fids):
                pos = np.searchsorted(fids, ids)
                pos[pos == len(fids)] = 0
                fired = fids[pos] == ids
            else:
                fired = np.zeros(len(ids), bool)
            return pa.table({
                "id": pa.array(ids, pa.int64()),
                "cash": pa.array(
                    np.where(fired, 0, cash) + sh, pa.int64()),
                "hist": pa.array(hist + np.where(fired, cash, 0),
                                 pa.int64()),
                "outdeg": pa.array(od, pa.int64()),
            })

        kept = state.map_batches(fire, batch_format="pyarrow",
                                 runtime_env=runtime_env())
        state = grouped_agg(
            kept.union(inc), ["id"],
            [("cash", "cash", "sum"), ("hist", "hist", "sum"),
             ("outdeg", "outdeg", "max")],
            sorted_output=False,
        ).materialize()

    return state.map_batches(
        lambda b: b.select(["id", "cash", "hist"]),
        batch_format="pyarrow", runtime_env=runtime_env())


def random_walks(edges_ds, seeds_ds, steps: int = 4,
                 broadcast_below: int = 2_000_000,
                 shuffle_partitions: int | None = None):
    """Deterministic unbiased random-walk corpus (DeepWalk — Perozzi et
    al., KDD 2014; public method): one walk per seed node, ``steps``
    hops, the step-s choice from node u being out-edge rank
    ``md5int(f"{walk_id}-{s}") % outdeg(u)`` — the repo's shared
    engine/SQL parity hash, so the walk table is bit-identical across
    engines and is SQL-unrollable.  Walks terminate early at dangling
    nodes (the classic convention).  Returns ``(walk_id, step, node)``
    — the sequence corpus skip-gram graph-embedding training consumes.

    Scale shape: the out-edge RANK table is built once — ONE single-key
    src sort, in-block (src, dst) lexsort + run arithmetic (tied
    duplicate edges get distinct ranks but identical dst, so the chosen
    node is tie-order-free); each round attaches outdeg and the chosen
    edge to the walk frontier, size-gated (both tables broadcast as
    sorted arrays below ``broadcast_below`` — rank lookups are one
    packed-key searchsorted — native hash joins above); frontier rows
    are one per live walk, materialized per round."""
    import ray

    from ..broadcast import cached_get
    from .agg import grouped_agg
    from .partition import coalesce_nonempty

    n_parts = shuffle_partitions or max(
        2, int(ray.cluster_resources().get("CPU", 8)))

    def _md5_choice(walk_ids: np.ndarray, step: int) -> np.ndarray:
        import hashlib

        return np.asarray(
            [int(hashlib.md5(f"{int(w)}-{step}".encode())
                 .hexdigest()[:15], 16) for w in walk_ids], np.int64)

    # out-edge rank table: (src, rank, dst)
    def rank_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "src": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "dst": pa.array([], pa.int64()),
            })
        src = batch.column("src").combine_chunks().to_numpy(
            zero_copy_only=False)
        dst = batch.column("dst").combine_chunks().to_numpy(
            zero_copy_only=False)
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        starts = np.flatnonzero(
            np.concatenate([[True], src[1:] != src[:-1]]))
        rank = np.arange(len(src), dtype=np.int64)
        rank -= np.repeat(rank[starts], np.diff(
            np.append(starts, len(src))))
        return pa.table({
            "src": pa.array(src, pa.int64()),
            "rank": pa.array(rank, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
        })

    er = edges_ds.sort("src").map_batches(
        rank_block, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env()).materialize()
    deg = grouped_agg(edges_ds, ["src"], [("outdeg", "", "count")])
    er_nz = coalesce_nonempty(er)
    deg_nz = coalesce_nonempty(deg)
    n_edges = 0 if er_nz is None else er_nz.count()

    frontier = seeds_ds.map_batches(
        lambda b: pa.table({
            "walk_id": b.column("id"),
            "node": b.column("id"),
        }), batch_format="pyarrow", runtime_env=runtime_env(),
    ).materialize()
    out_parts = [frontier.map_batches(
        lambda b: pa.table({
            "walk_id": b.column("walk_id"),
            "step": pa.array(np.zeros(b.num_rows, np.int64)),
            "node": b.column("node"),
        }), batch_format="pyarrow", runtime_env=runtime_env())]

    if n_edges and n_edges <= broadcast_below:
        tbls = ray.get(er_nz.to_arrow_refs())
        srcs = np.concatenate(
            [t.column("src").combine_chunks().to_numpy(zero_copy_only=False)
             for t in tbls if t.num_rows])
        rnks = np.concatenate(
            [t.column("rank").combine_chunks().to_numpy(
                zero_copy_only=False) for t in tbls if t.num_rows])
        dsts = np.concatenate(
            [t.column("dst").combine_chunks().to_numpy(zero_copy_only=False)
             for t in tbls if t.num_rows])
        # pack (src, rank) — rank < outdeg ≤ 2^20 asserted
        assert int(rnks.max(initial=0)) < (1 << 20), "outdeg beyond pack"
        key = srcs * (1 << 20) + rnks
        order = np.argsort(key, kind="stable")
        key, dsts_s = key[order], dsts[order]
        # outdeg per src as a sorted lookup too
        dtbls = [] if deg_nz is None else ray.get(deg_nz.to_arrow_refs())
        dsrc = np.concatenate(
            [t.column("src").combine_chunks().to_numpy(zero_copy_only=False)
             for t in dtbls if t.num_rows] or [np.empty(0, np.int64)])
        ddeg = np.concatenate(
            [t.column("outdeg").combine_chunks().to_numpy(
                zero_copy_only=False)
             for t in dtbls if t.num_rows] or [np.empty(0, np.int64)])
        dorder = np.argsort(dsrc, kind="stable")
        ref = ray.put((key, dsts_s, dsrc[dorder], ddeg[dorder]))

        for s in range(1, steps + 1):
            def hop(batch: pa.Table, step=s) -> pa.Table:
                if batch.num_rows == 0:
                    return pa.table({
                        "walk_id": pa.array([], pa.int64()),
                        "node": pa.array([], pa.int64()),
                    })
                key_s, dsts_l, dsrc_l, ddeg_l = cached_get(ref)
                w = batch.column("walk_id").combine_chunks().to_numpy(
                    zero_copy_only=False)
                cur = batch.column("node").combine_chunks().to_numpy(
                    zero_copy_only=False)
                if len(dsrc_l):
                    pos = np.searchsorted(dsrc_l, cur)
                    pos[pos == len(dsrc_l)] = 0
                    hit = dsrc_l[pos] == cur
                    od = np.where(hit, ddeg_l[pos], np.int64(0))
                else:
                    od = np.zeros(len(cur), np.int64)
                live = od > 0           # dangling → walk terminates
                if not live.any():
                    return pa.table({
                        "walk_id": pa.array([], pa.int64()),
                        "node": pa.array([], pa.int64()),
                    })
                w, cur, od = w[live], cur[live], od[live]
                r = _md5_choice(w, step) % od
                k = cur * (1 << 20) + r
                loc = np.searchsorted(key_s, k)
                nxt = dsts_l[loc]       # rank < outdeg ⇒ always present
                return pa.table({
                    "walk_id": pa.array(w, pa.int64()),
                    "node": pa.array(nxt, pa.int64()),
                })

            frontier = frontier.map_batches(
                hop, batch_format="pyarrow",
                runtime_env=runtime_env()).materialize()
            out_parts.append(frontier.map_batches(
                lambda b, step=s: pa.table({
                    "walk_id": b.column("walk_id"),
                    "step": pa.array(np.full(b.num_rows, step, np.int64)),
                    "node": b.column("node"),
                }), batch_format="pyarrow", runtime_env=runtime_env()))
    else:
        deg_marker = deg_nz.map_batches(
            lambda b: pa.table({"__d_src": b.column("src"),
                                "outdeg": b.column("outdeg")}),
            batch_format="pyarrow", runtime_env=runtime_env())
        er_marker = er_nz.map_batches(
            lambda b: pa.table({"__e_src": b.column("src"),
                                "__e_rank": b.column("rank"),
                                "__e_dst": b.column("dst")}),
            batch_format="pyarrow", runtime_env=runtime_env())
        for s in range(1, steps + 1):
            f_nz = coalesce_nonempty(frontier)
            if f_nz is None:
                break
            wd = f_nz.join(deg_marker, "inner", num_partitions=n_parts,
                           on=("node",), right_on=("__d_src",))

            def pick(batch: pa.Table, step=s) -> pa.Table:
                w = batch.column("walk_id").combine_chunks().to_numpy(
                    zero_copy_only=False)
                od = batch.column("outdeg").combine_chunks().to_numpy(
                    zero_copy_only=False)
                return pa.table({
                    "walk_id": pa.array(w, pa.int64()),
                    "node": batch.column("node"),
                    "__r": pa.array(_md5_choice(w, step) % od, pa.int64()),
                })

            wd = coalesce_nonempty(wd.map_batches(
                pick, batch_format="pyarrow", runtime_env=runtime_env()))
            if wd is None:
                break
            hopd = wd.join(er_marker, "inner", num_partitions=n_parts,
                           on=("node", "__r"),
                           right_on=("__e_src", "__e_rank"))
            frontier = hopd.map_batches(
                lambda b: pa.table({
                    "walk_id": b.column("walk_id"),
                    "node": b.column("__e_dst"),
                }), batch_format="pyarrow",
                runtime_env=runtime_env()).materialize()
            out_parts.append(frontier.map_batches(
                lambda b, step=s: pa.table({
                    "walk_id": b.column("walk_id"),
                    "step": pa.array(np.full(b.num_rows, step, np.int64)),
                    "node": b.column("node"),
                }), batch_format="pyarrow", runtime_env=runtime_env()))

    out = out_parts[0]
    if len(out_parts) > 1:
        out = out.union(*out_parts[1:])
    return out
