"""Edit-distance-1 fuzzy string-pair join — SymSpell deletion bucketing.

Finds every unordered pair of distinct vocabulary tokens at Levenshtein
distance exactly 1 (one substitution, insertion or deletion) WITHOUT the
O(V²) cross join: each token emits itself plus its ``len(token)``
single-character-deletion variants as bucket keys, and only tokens
sharing a bucket are compared.  The candidate set is provably complete
for distance ≤ 1 — a substitution pair shares the deletion at the
substituted position, an indel pair shares the shorter token itself —
and an exact vectorized verification pass removes the false candidates
(same-length pairs whose shared deletion sits at different positions,
e.g. ``ab``/``ba``, and any hash-collision bucket mates).

This is the typo-variant vocabulary clustering step of a training-data
normalization pipeline (merge OCR/typo variants before counting); the
reference engine has no fuzzy matching — part of the LLM-data operator
library.  Distance is byte-level over UTF-8 (identical to
character-level for ASCII vocabularies; pre-normalize non-ASCII).

Shape: candidate emission is a stateless vectorized ``map_batches``
(per-length fixed-width byte matrices, one numpy slice per deletion
position — no per-token Python); bucket keys are vectorized FNV-1a
64-bit hashes (collisions only ADD candidates, never lose pairs); ONE
all-to-all sort on the hash key co-locates buckets; pair emission +
verification run in-block (the size-grouped triu gather shared with the
dedup kernels); a grouped count dedups pair emissions across buckets.
Shuffle volume is O(V · avg_len) candidate rows — the vocabulary
stream, never the corpus.  Buckets above ``max_bucket`` are skipped
(hot-bucket guard, same documented cap as simhash/ngram pair emission —
a degenerate vocabulary of one-character tokens puts the whole alphabet
in the empty-string bucket).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import runtime_env
from .agg import grouped_agg
from .dedup import _run_bounds

_FNV_OFF = np.uint64(14695981039346656037)
_FNV_PRM = np.uint64(1099511628211)

_EMPTY_PAIRS = pa.table({
    "token_a": pa.array([], pa.string()),
    "token_b": pa.array([], pa.string()),
})


def _fnv64_rows(mat: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a over the rows of an (n, L) uint8 matrix."""
    h = np.full(mat.shape[0], _FNV_OFF, np.uint64)
    with np.errstate(over="ignore"):
        for j in range(mat.shape[1]):
            h = (h ^ mat[:, j].astype(np.uint64)) * _FNV_PRM
    return h


def _byte_matrix(arr: np.ndarray, width: int) -> np.ndarray:
    """Exact-width (n, width) uint8 view of an S-dtype array slice."""
    if width == 0:
        return np.zeros((len(arr), 0), np.uint8)
    return arr.astype(f"S{width}").view(np.uint8).reshape(len(arr), width)


def ed1_mask(a_str: np.ndarray, b_str: np.ndarray) -> np.ndarray:
    """Boolean mask: byte-level Levenshtein(a, b) == 1, vectorized.

    Rows are grouped by (shorter-len, longer-len); same-length pairs
    check Hamming == 1, length-diff-1 pairs check the single-deletion
    alignment via prefix/suffix equality — no per-pair Python DP.
    """
    n = len(a_str)
    out = np.zeros(n, bool)
    if n == 0:
        return out
    A = np.char.encode(a_str.astype("U"), "utf-8")
    B = np.char.encode(b_str.astype("U"), "utf-8")
    la = np.char.str_len(A).astype(np.int64)
    lb = np.char.str_len(B).astype(np.int64)
    sw = la > lb
    U = np.where(sw, B, A)          # shorter
    V = np.where(sw, A, B)          # longer
    lu, lv = np.minimum(la, lb), np.maximum(la, lb)
    combo = (lu << 32) | lv
    for c in np.unique(combo):
        sel = np.flatnonzero(combo == c)
        m, big = int(c >> 32), int(c & 0xFFFFFFFF)
        if big - m > 1:
            continue                # distance ≥ |len diff| > 1
        Mu = _byte_matrix(U[sel], m)
        Mv = _byte_matrix(V[sel], big)
        if big == m:
            out[sel] = (Mu != Mv).sum(axis=1) == 1
        elif m == 0:
            out[sel] = True         # "" vs one char
        else:
            eq = Mu == Mv[:, :m]
            all_eq = eq.all(axis=1)         # deletion at the end
            shifted = Mu == Mv[:, 1:]
            suf_all = np.flip(
                np.logical_and.accumulate(np.flip(shifted, 1), axis=1), 1
            )
            i0 = np.argmax(~eq, axis=1)     # first mismatch position
            out[sel] = all_eq | suf_all[np.arange(len(sel)), i0]
    return out


def edit1_pairs(vocab, col: str = "token", max_bucket: int = 1024,
                shuffle_partitions: int | None = None):
    """All unordered pairs of distinct ``col`` values at byte-level
    Levenshtein distance exactly 1, as columns ``(token_a, token_b)``
    with ``token_a < token_b`` — the SQL
    ``JOIN ... ON a < b AND levenshtein(a, b) = 1`` without the cross
    join (see module docstring for the plan and its completeness
    argument).  Input values are expected distinct (a vocabulary);
    duplicate inputs only waste work, they cannot emit self-pairs.
    """

    def candidates(batch: pa.Table) -> pa.Table:
        toks = batch.column(col).to_pylist()
        if not toks:
            return pa.table({
                "k": pa.array([], pa.uint64()),
                "token": pa.array([], pa.string()),
            })
        arr = np.char.encode(np.asarray(toks, dtype="U"), "utf-8")
        lens = np.char.str_len(arr)
        tok_obj = np.asarray(toks, dtype=object)
        keys_out, idx_out = [], []
        for L in np.unique(lens):
            L = int(L)
            sel = np.flatnonzero(lens == L)
            M = _byte_matrix(arr[sel], L)
            keys_out.append(_fnv64_rows(M))          # self key
            idx_out.append(sel)
            for i in range(L):                        # each deletion
                V = np.concatenate([M[:, :i], M[:, i + 1:]], axis=1)
                keys_out.append(_fnv64_rows(V))
                idx_out.append(sel)
        idx = np.concatenate(idx_out)
        return pa.table({
            "k": pa.array(np.concatenate(keys_out), pa.uint64()),
            "token": pa.array(tok_obj[idx], pa.string()),
        })

    def bucket_pairs_verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY_PAIRS
        k = batch.column("k").combine_chunks().to_numpy(
            zero_copy_only=False)
        toks = np.asarray(batch.column("token").to_pylist(), dtype=object)
        starts, ends = _run_bounds(k)
        sizes = ends - starts
        ok = (sizes >= 2) & (sizes <= max_bucket)
        starts, sizes = starts[ok], sizes[ok]
        out_a, out_b = [], []
        size_order = np.argsort(sizes, kind="stable")
        s_sorted, sz_sorted = starts[size_order], sizes[size_order]
        g_starts, g_ends = _run_bounds(sz_sorted)
        for gs, ge in zip(g_starts, g_ends):
            m = int(sz_sorted[gs])
            s_m = s_sorted[gs:ge]
            mat = np.sort(toks[s_m[:, None] + np.arange(m)[None, :]],
                          axis=1)
            ii, jj = np.triu_indices(m, 1)
            out_a.append(mat[:, ii].ravel())
            out_b.append(mat[:, jj].ravel())
        if not out_a:
            return _EMPTY_PAIRS
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        keep = a != b                       # duplicate-input guard
        a, b = a[keep], b[keep]
        mask = ed1_mask(a, b)               # exact distance == 1
        return pa.table({
            "token_a": pa.array(a[mask], pa.string()),
            "token_b": pa.array(b[mask], pa.string()),
        })

    cand = vocab.map_batches(candidates, batch_format="pyarrow",
                             runtime_env=runtime_env())
    if shuffle_partitions:
        cand = cand.repartition(shuffle_partitions)
    pairs = cand.sort("k").map_batches(
        bucket_pairs_verify, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    )
    # a pair can surface from several shared buckets → grouped distinct
    out = grouped_agg(pairs, ["token_a", "token_b"], [("n", "", "count")])
    return out.select_columns(["token_a", "token_b"])
