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


def connected_components(
    pairs_ds, max_rounds: int = 50, broadcast_below: int = 2_000_000
):
    """(id, cluster_id=min id in component) for every id appearing in the
    ``(id_a, id_b)`` pair dataset.

    When the label table is small (< ``broadcast_below`` nodes — the
    common case: near-dup graphs are a sliver of the corpus), each round
    propagates via a broadcast (id → label) lookup inside ``map_batches``
    over the distributed edges — no join shuffle at all.  Larger graphs
    fall back to the native hash-shuffle join per round."""
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

    def propagate(labels_ds):
        if not small:
            # large-graph path: hash-shuffle join per round
            return edges.join(
                labels_ds, "inner",
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
