"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale notes (these run against 100 TB corpora):

* **exact_dedup / exact_dedup_ids** — hash-partitioned groupby on the
  64-char content hash; the only all-to-all is on that key.  The *_ids
  variant is a pure native aggregate (min doc_id per hash) with no
  per-group Python.
* **minhash_lsh_pairs** — shingle→minhash→band; the shuffle key is
  ``(band_id, band_hash)`` so only near-identical docs co-locate;
  candidate verification is a distributed double hash-join against the
  shingle table (nothing driver-resident).
* **jaccard_pairs_exact** — the EXACT set-similarity join via prefix
  filtering (AllPairs/PPJoin): df-ordered prefixes bound the inverted
  buckets, size-ratio pruning cuts candidates, the same double-join
  verification computes exact Jaccard.
* **embedding_neardup_pairs** — exact cosine all-pairs as a distributed
  blocked pairwise matmul (two object-store blocks per task).

All similarity kernels are vectorized numpy (no per-word Python bit
loops); all broadcast stages are plain map TASKS (warm workers, no actor
ramp-up).
"""
from __future__ import annotations

import hashlib
from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa

from .. import runtime_env
from ..broadcast import cached_get
from ..urlops import content_hash_hex
from .textops import WORD_RE  # single canonical word-token rule

_MERSENNE = (1 << 61) - 1
_POLY = np.uint64(0x9E3779B97F4A7C15)  # odd golden-ratio multiplier


_WORD_HASH_MEMO: Dict[str, int] = {}


def _word_hash64(w: str) -> int:
    h = _WORD_HASH_MEMO.get(w)
    if h is None:
        h = int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
        if len(_WORD_HASH_MEMO) > 1_000_000:  # bound worker memory
            _WORD_HASH_MEMO.clear()
        _WORD_HASH_MEMO[w] = h
    return h


def _word_hashes(words: List[str]) -> np.ndarray:
    return np.fromiter((_word_hash64(w) for w in words), dtype=np.uint64,
                       count=len(words))


def token_set(text: str) -> List[str]:
    return sorted(set(WORD_RE.findall((text or "").lower())))


def shingle_set(text: str, k: int = 3) -> List[int]:
    """Hashed word k-gram shingles (vectorized rolling polynomial hash)."""
    words = WORD_RE.findall((text or "").lower())
    if not words:
        return []
    h = _word_hashes(words)
    with np.errstate(over="ignore"):  # uint64 wraparound is the hash
        if len(words) < k:
            acc = h[0]
            for j in range(1, len(h)):
                acc = acc * _POLY + h[j]
            return [int(acc)]
        n_out = len(words) - k + 1
        acc = h[:n_out].copy()
        for j in range(1, k):
            acc = acc * _POLY + h[j : n_out + j]
    return sorted(int(x) for x in np.unique(acc))


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


# ── exact dedup ──────────────────────────────────────────────────────────────


def add_content_hash(batch: pa.Table, text_column: str = "text") -> pa.Table:
    # the ONE canonical content hash (urlops.content_hash_hex — also used
    # by the extract stage, so dedup joins against crawl results hold)
    hashes = [content_hash_hex(t or "") for t in batch.column(text_column).to_pylist()]
    return batch.append_column("content_hash", pa.array(hashes, pa.string()))


def exact_dedup(ds, id_column: str = "doc_id", text_column: str = "text"):
    """Keep the minimum-id row per sha256(text): hash-partitioned groupby +
    per-group first-wins (the Ray-native form of the reference's global
    content-hash set, crawler.py:184-191).  Returns full rows."""

    def keep_min(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = group.column(id_column)
        idx = pc.index(ids, pc.min(ids)).as_py()
        return group.slice(idx, 1)

    hashed = ds.map_batches(
        lambda b: add_content_hash(b, text_column),
        batch_format="pyarrow", runtime_env=runtime_env(),
    )
    return hashed.groupby("content_hash").map_groups(
        keep_min, batch_format="pyarrow", runtime_env=runtime_env()
    )


def exact_dedup_ids(ds, id_column: str = "doc_id", text_column: str = "text",
                    shuffle_partitions: int = None):
    """(content_hash, doc_id=min id per hash) via a native aggregate —
    no per-group Python, one shuffle on the hash key (the scale path).

    Each batch is pre-combined locally (min id per hash within the batch)
    before the shuffle, so on duplicate-heavy corpora only one row per
    distinct hash per block crosses the wire; the hash itself (32 bytes)
    replaces the text, so shuffle volume is O(distinct-per-block), not
    O(text bytes)."""
    import ray.data.aggregate as agg_mod

    def hash_and_combine(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = pa.table(
            {
                "content_hash": add_content_hash(b, text_column).column("content_hash"),
                id_column: b.column(id_column),
            }
        )
        # local combiner: first row per hash after sort(hash, id) = min id
        t = t.sort_by([("content_hash", "ascending"), (id_column, "ascending")])
        keys = t.column("content_hash")
        first = np.ones(len(keys), dtype=bool)
        if len(keys) > 1:
            eq = pc.equal(keys.slice(1), keys.slice(0, len(keys) - 1))
            first[1:] = ~eq.combine_chunks().to_numpy(zero_copy_only=False)
        return t.filter(pa.array(first))

    hashed = ds.map_batches(
        hash_and_combine, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    )
    if shuffle_partitions:
        # combined rows are tiny (hash + id); coalesce many-tiny-block
        # inputs before the O(partitions²) groupby sort shuffle
        hashed = hashed.repartition(shuffle_partitions)
    agg = hashed.groupby("content_hash").aggregate(agg_mod.Min(id_column))

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            [id_column if c == f"min({id_column})" else c for c in batch.column_names]
        )

    return agg.map_batches(rename, batch_format="pyarrow", runtime_env=runtime_env())


# ── MinHash + LSH ────────────────────────────────────────────────────────────

NUM_PERM = 64
BANDS = 16
ROWS_PER_BAND = NUM_PERM // BANDS
_PERM_SEED = 0x5EED


def _perm_params(num_perm: int = NUM_PERM) -> Tuple[np.ndarray, np.ndarray]:
    # a,b < 2^31 and shingles reduced to 32 bits → a*x+b < 2^63 fits uint64,
    # so the whole K×n permutation matrix is computed vectorized in numpy.
    rng = np.random.default_rng(_PERM_SEED)
    a = rng.integers(1, 1 << 31, num_perm, dtype=np.uint64)
    b = rng.integers(0, 1 << 31, num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: List[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """K minhashes via universal hashing (a*x+b mod Mersenne prime),
    fully vectorized: one (K, n_shingles) uint64 matrix per document."""
    if not len(shingles):
        return np.zeros(len(a), dtype=np.uint64)
    x = np.asarray(shingles, dtype=np.uint64) & np.uint64(0xFFFFFFFF)
    m = (a[:, None] * x[None, :] + b[:, None]) % np.uint64(_MERSENNE)
    return m.min(axis=1)


def _band_hashes(sig: np.ndarray) -> np.ndarray:
    """Fold each band's rows into one 64-bit key (vectorized mix)."""
    chunks = sig.reshape(BANDS, ROWS_PER_BAND)
    acc = chunks[:, 0].copy()
    for j in range(1, ROWS_PER_BAND):
        acc = (acc * _POLY) ^ chunks[:, j]
    # splitmix-style finalizer to spread the fold
    acc ^= acc >> np.uint64(31)
    acc *= np.uint64(0xBF58476D1CE4E5B9)
    acc ^= acc >> np.uint64(27)
    return acc


def _run_bounds(*key_arrays: np.ndarray):
    """Start/end offsets of equal-key runs in arrays sorted by the keys."""
    n = len(key_arrays[0])
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for k in key_arrays:
        change[1:] |= k[1:] != k[:-1]
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)
    return starts, ends


_EMPTY_PAIRS = pa.table(
    {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
)


def _size_grouped_index(starts: np.ndarray, sizes: np.ndarray):
    """Yield ``(m, idx)`` per DISTINCT run size over pre-selected runs —
    ``idx`` is the (runs_of_size_m, m) row-index matrix into the
    underlying run-sorted arrays, ready for one vectorized gather +
    ``np.triu_indices(m, 1)`` per size.  ONE argsort groups the runs, so
    a corpus with millions of small buckets costs ≤ #distinct-sizes
    Python iterations, never a per-run loop.  THE shared pair/wedge
    emission discipline — used by :func:`_gram_bucket_pairs`,
    :func:`quote_span_pairs`, adamic_adar's wedge stage and the
    source-pair queries; fix behavior here, not in a copy."""
    size_order = np.argsort(sizes, kind="stable")
    s_sorted = starts[size_order]
    sz_sorted = sizes[size_order]
    g_starts, g_ends = _run_bounds(sz_sorted)
    for gs, ge in zip(g_starts.tolist(), g_ends.tolist()):
        m = int(sz_sorted[gs])
        s_m = s_sorted[gs:ge]
        yield m, s_m[:, None] + np.arange(m)[None, :]


def run_rank(sorted_keys: np.ndarray) -> np.ndarray:
    """0-based rank of each element within its equal-key run (input must
    be sorted by the key).  Companion to :func:`_run_bounds`."""
    n = len(sorted_keys)
    if n == 0:
        return np.empty(0, np.int64)
    starts = np.flatnonzero(
        np.concatenate(([True], sorted_keys[1:] != sorted_keys[:-1]))
    )
    return np.arange(n, dtype=np.int64) - np.repeat(
        starts, np.diff(np.append(starts, n))
    )


def _band_sig_table(ids_in: np.ndarray, bh_mat: np.ndarray) -> pa.Table:
    """Explode an (n_docs, n_bands) band-hash matrix into per-band
    signature rows (id, band, band_hash, bands) — the carried ``bands``
    fixed-size-list lets the pair-emission pass dedupe across bands."""
    n, n_bands = bh_mat.shape
    vec = pa.FixedSizeListArray.from_arrays(
        pa.array(np.repeat(bh_mat, n_bands, axis=0).reshape(-1), pa.uint64()),
        n_bands,
    )
    return pa.table(
        {
            "id": pa.array(np.repeat(ids_in.astype(np.int64), n_bands),
                           pa.int64()),
            "band": pa.array(np.tile(np.arange(n_bands, dtype=np.int32), n),
                             pa.int32()),
            "band_hash": pa.array(bh_mat.reshape(-1), pa.uint64()),
            "bands": vec,
        }
    )


def _band_block_pairs(n_bands: int, max_bucket: int):
    """Vectorized per-block candidate-pair emission over
    (band, band_hash)-sorted signature rows.

    Each bucket (equal-key run) emits its pairs exactly once — from the
    FIRST band on which the pair collides (the carried ``bands`` vectors
    let later bands detect the earlier match and skip) — so no global
    distinct-pairs aggregate is needed.  Singleton runs are masked and
    buckets above ``max_bucket`` skipped (hot-bucket guard) OUTSIDE the
    Python loop.  Shared by minhash_lsh_pairs and
    embedding_neardup_lsh."""

    def block_pairs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _EMPTY_PAIRS
        band = batch.column("band").combine_chunks().to_numpy(zero_copy_only=False)
        bh = batch.column("band_hash").combine_chunks().to_numpy(zero_copy_only=False)
        ids = batch.column("id").combine_chunks().to_numpy(zero_copy_only=False)
        vec = batch.column("bands")
        if isinstance(vec, pa.ChunkedArray):
            vec = vec.combine_chunks()
        bands_mat = vec.flatten().to_numpy(zero_copy_only=False).reshape(-1, n_bands)
        starts, ends = _run_bounds(band, bh)
        sizes = ends - starts
        # singleton skip + hot-bucket guard, both OUTSIDE the Python loop
        sel = (sizes >= 2) & (sizes <= max_bucket)
        out_a, out_b = [], []
        for s, e in zip(starts[sel], ends[sel]):
            m = int(e - s)
            order = np.argsort(ids[s:e], kind="stable")
            seg_ids = ids[s:e][order]
            seg_bands = bands_mat[s:e][order]
            k = int(band[s])
            ii, jj = np.triu_indices(m, 1)
            if k > 0:
                prev_eq = (seg_bands[ii][:, :k] == seg_bands[jj][:, :k]).any(axis=1)
                ii, jj = ii[~prev_eq], jj[~prev_eq]
            neq = seg_ids[ii] != seg_ids[jj]
            out_a.append(seg_ids[ii][neq])
            out_b.append(seg_ids[jj][neq])
        if not out_a:
            return _EMPTY_PAIRS
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a), pa.int64()),
                "id_b": pa.array(np.concatenate(out_b), pa.int64()),
            }
        )

    return block_pairs


def minhash_lsh_pairs(
    ds,
    id_column: str = "doc_id",
    text_column: str = "text",
    threshold: float = 0.8,
    shingle_k: int = 3,
    shuffle_partitions: int | None = None,
    max_bucket: int = 4096,
    verify_broadcast_cutoff: int | None = None,
):
    """Near-duplicate candidate pairs via MinHash banding, verified with
    exact shingle Jaccard.  Returns a Dataset of (id_a, id_b, jaccard).

    Candidate generation is one shuffle: sort on ``(band, band_hash)``
    co-locates each LSH bucket in one block (the same guarantee
    groupby().map_groups relies on), then a VECTORIZED block pass emits
    each candidate pair exactly once — from the first band on which the
    pair collides (every later colliding band sees the earlier match in
    the carried band vectors and skips the pair) — so no global
    distinct-pairs aggregate is needed.  ``shuffle_partitions`` optionally
    coalesces the signature table before the sort (the sig table is
    ~BANDS×24B+vec per doc, far smaller than the corpus; at small scale
    the read's block count would otherwise make the sort
    scheduling-bound).  Buckets larger than ``max_bucket`` are skipped
    (hot-bucket guard, same contract as simhash_pairs: a band hash shared
    by thousands of docs — e.g. the constant signature of empty/boilerplate
    pages — would allocate O(m²) pair indices in one block; with
    first-match emission a pair is missed only if its FIRST shared band's
    bucket is over-populated).

    Verification is the size-gated hybrid of
    :func:`_join_verify_jaccard`: beyond the measured candidate-count
    cutoff, candidate pairs hash-join the (id → shingles) table twice
    (on id_a, then id_b), so shingles of candidate docs travel the wire
    per pair but never all land on the driver — on a dup-heavy raw
    crawl the candidate set is O(dups), and driver memory stays O(1).
    Below the cutoff the bounded broadcast path skips the join
    operators' ramp-up.  Exact Jaccard is a sorted-array intersection
    per pair either way.
    """
    a_perm, b_perm = _perm_params()

    def shingles_batch(batch: pa.Table) -> pa.Table:
        # shingles as raw uint64 little-endian bytes (large_binary): Arrow's
        # acero hash join rejects nested (list) payload columns, and a
        # binary blob ships/joins just as zero-copy
        return pa.table(
            {
                "id": batch.column(id_column),
                "sh": pa.array(
                    [
                        np.asarray(shingle_set(t, shingle_k),
                                   np.uint64).tobytes()
                        for t in batch.column(text_column).to_pylist()
                    ],
                    pa.large_binary(),
                ),
            }
        )

    # shingles are computed ONCE and reused by both the signature stage and
    # the verification broadcast (previously two full passes over the text)
    sh_ds = ds.map_batches(
        shingles_batch, batch_format="pyarrow", runtime_env=runtime_env()
    )
    if shuffle_partitions:
        sh_ds = sh_ds.repartition(shuffle_partitions)
    sh_ds = sh_ds.materialize()

    def sig_batch(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids_in = batch.column("id").to_numpy(zero_copy_only=False)
        blobs = batch.column("sh").to_pylist()
        bh_mat = np.empty((n, BANDS), dtype=np.uint64)
        for i in range(n):
            sh = np.frombuffer(blobs[i], dtype=np.uint64)
            bh_mat[i] = _band_hashes(minhash_signature(sh, a_perm, b_perm))
        return _band_sig_table(ids_in, bh_mat)

    sig_ds = sh_ds.map_batches(
        sig_batch, batch_format="pyarrow", runtime_env=runtime_env()
    )

    cand = sig_ds.sort(["band", "band_hash"]).map_batches(
        _band_block_pairs(BANDS, max_bucket),
        batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    )

    return _join_verify_jaccard(cand, sh_ds, threshold,
                                max(2, shuffle_partitions or 8),
                                broadcast_cutoff=verify_broadcast_cutoff)


def _jaccard_decode(blob: bytes) -> np.ndarray:
    return np.frombuffer(blob, dtype=np.uint64)


def _jaccard_score(sa: np.ndarray, sb: np.ndarray) -> float:
    if not len(sa) and not len(sb):
        return 1.0
    # blobs are sorted+unique → sorted-array intersection
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    return inter / (len(sa) + len(sb) - inter)


def _cosine_decode(blob: bytes) -> np.ndarray:
    return np.frombuffer(blob, dtype=np.float64)


def _cosine_score(sa: np.ndarray, sb: np.ndarray) -> float:
    # blobs are pre-normalized float64 vectors → cosine is a dot product
    if not len(sa) or not len(sb):
        return 0.0
    return float(sa @ sb)


# similarity "kind" → (blob decoder, pair scorer, output score column).
# The verification machinery below is shared by every candidate-pair
# near-dup path: the only per-path variation is how a doc's blob decodes
# and how two decoded blobs score.
_PAIR_KINDS = {
    "jaccard": (_jaccard_decode, _jaccard_score, "jaccard"),
    "cosine": (_cosine_decode, _cosine_score, "cosine"),
}


def _empty_verified(score_col: str) -> pa.Table:
    return pa.table(
        {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            score_col: pa.array([], pa.float64()),
        }
    )


# Below this many candidate pairs, verification uses the broadcast path
# (restricted blob pull, bounded driver memory ≈ cutoff × blob size);
# above it, the distributed double hash-join.  Each Ray join operator
# costs seconds of aggregator ramp-up, so joining 25 pairs is pure
# overhead — but a dup-heavy raw crawl's candidate set must never be
# driver-resident, hence the measured switch, not an assumption.
VERIFY_BROADCAST_CUTOFF = 100_000


def _verify_broadcast(cand, blob_ds, threshold: float, kind: str = "jaccard"):
    """Small-candidate-set verification: pull ONLY candidate docs' blobs
    (restricted by a broadcast sorted-id filter), broadcast the dict,
    verify per pair inside map tasks.  Driver memory is O(candidates)."""
    import ray

    decode, score, score_col = _PAIR_KINDS[kind]
    cand_rows = cand.take_all()
    cand_ids = np.unique(
        np.fromiter(
            (i for r in cand_rows for i in (r["id_a"], r["id_b"])),
            dtype=np.int64, count=2 * len(cand_rows),
        )
    )
    ids_ref = ray.put(cand_ids)

    def only_candidates(batch: pa.Table, ref=ids_ref) -> pa.Table:
        wanted = cached_get(ref)
        ids = batch.column("id").combine_chunks().to_numpy(zero_copy_only=False)
        if not len(wanted):
            return batch.filter(pa.array(np.zeros(len(ids), dtype=bool)))
        pos = np.searchsorted(wanted, ids)
        pos[pos >= len(wanted)] = 0
        return batch.filter(pa.array(wanted[pos] == ids))

    blob_map = {
        r["id"]: decode(r["sh"])
        for r in blob_ds.map_batches(
            only_candidates, batch_format="pyarrow",
            runtime_env=runtime_env(),
        ).take_all()
    }
    blob_ref = ray.put(blob_map)
    _empty = decode(b"")

    def verify(batch: pa.Table, ref=blob_ref, thr=threshold) -> pa.Table:
        m = cached_get(ref)
        keep_a, keep_b, vals = [], [], []
        for a_id, b_id in zip(batch.column("id_a").to_pylist(),
                              batch.column("id_b").to_pylist()):
            j = score(m.get(a_id, _empty), m.get(b_id, _empty))
            if j >= thr:
                keep_a.append(a_id)
                keep_b.append(b_id)
                vals.append(j)
        return pa.table(
            {
                "id_a": pa.array(keep_a, pa.int64()),
                "id_b": pa.array(keep_b, pa.int64()),
                score_col: pa.array(vals, pa.float64()),
            }
        )

    return cand.map_batches(
        verify, batch_format="pyarrow", runtime_env=runtime_env()
    )


def _join_verify_jaccard(cand, blob_ds, threshold: float, n_parts: int,
                         broadcast_cutoff: int | None = None,
                         kind: str = "jaccard"):
    """Exact similarity verification of candidate (id_a, id_b) pairs
    (``kind`` picks the blob decoder + pair scorer: sorted-uint64-hash
    Jaccard or normalized-float64 cosine).

    Size-gated hybrid: the candidate count is MEASURED, and below
    :data:`VERIFY_BROADCAST_CUTOFF` the broadcast path runs (bounded
    O(candidates) driver memory, no join-operator ramp-up); above it,
    the fully distributed double hash-join against the
    (id, blob-of-sorted-uint64-hashes) table (the join drops the right
    "id" key and suffixes the colliding payload column → id_a, id_b,
    sh, sh_b) — the join's all-to-all moves only candidate docs' hash
    blobs, nothing driver-resident.  Shared by minhash_lsh_pairs
    (shingle blobs) and jaccard_pairs_exact (token-hash blobs).

    Every join input passes through ``coalesce_nonempty`` — see that
    helper's docstring for the Ray empty-block join failure it guards."""
    import ray

    from .partition import coalesce_nonempty

    decode, score, score_col = _PAIR_KINDS[kind]
    cand = coalesce_nonempty(cand)
    blob_nz = coalesce_nonempty(blob_ds)
    if cand is None or blob_nz is None:
        return ray.data.from_arrow(_empty_verified(score_col))

    cutoff = (VERIFY_BROADCAST_CUTOFF if broadcast_cutoff is None
              else broadcast_cutoff)
    if cand.count() <= cutoff:
        return _verify_broadcast(cand, blob_nz, threshold, kind=kind)

    j1 = cand.join(
        blob_nz, "inner", num_partitions=n_parts,
        on=("id_a",), right_on=("id",),
    )
    j1 = coalesce_nonempty(j1)
    if j1 is None:
        return ray.data.from_arrow(_empty_verified(score_col))
    j2 = j1.join(
        blob_nz, "inner", num_partitions=n_parts,
        on=("id_b",), right_on=("id",), right_suffix="_b",
    )

    def verify(batch: pa.Table, thr=threshold) -> pa.Table:
        keep_a, keep_b, vals = [], [], []
        if batch.num_rows:
            a_ids = batch.column("id_a").to_pylist()
            b_ids = batch.column("id_b").to_pylist()
            blobs_a = batch.column("sh").to_pylist()
            blobs_b = batch.column("sh_b").to_pylist()
            for a_id, b_id, ba, bb in zip(a_ids, b_ids, blobs_a, blobs_b):
                j = score(decode(ba), decode(bb))
                if j >= thr:
                    keep_a.append(a_id)
                    keep_b.append(b_id)
                    vals.append(j)
        return pa.table(
            {
                "id_a": pa.array(keep_a, pa.int64()),
                "id_b": pa.array(keep_b, pa.int64()),
                score_col: pa.array(vals, pa.float64()),
            }
        )

    return j2.map_batches(
        verify, batch_format="pyarrow", runtime_env=runtime_env()
    )


# ── token-set Jaccard (exact, prefix-filtering join) ─────────────────────────


def jaccard_pairs_exact(
    ds, id_column: str = "doc_id", text_column: str = "text",
    threshold: float = 0.8, shuffle_partitions: int | None = None,
    max_bucket: int = 65536,
):
    """ALL pairs with token-set Jaccard ≥ threshold — EXACT, via the
    prefix-filtering set-similarity join (AllPairs / PPJoin family,
    Bayardo et al. 2007 / Xiao et al. 2008, public algorithms).

    Filter: order every document's tokens by the GLOBAL (df, hash) total
    order; any two docs with J ≥ t must share a token among each doc's
    first ``|d| - ceil(t*|d|) + 1`` tokens under that order (pigeonhole
    on the required overlap ``|x∩y| ≥ t/(1+t)(|x|+|y|)``) — so indexing
    only those prefix tokens finds every qualifying pair.  df-ascending
    ordering puts the RAREST tokens in prefixes, keeping the inverted
    buckets small; a size-ratio prune (``min ≥ t·max``) drops impossible
    pairs before verification.

    Scale shape (nothing driver-resident): token blobs materialized once
    → distributed df count → hash-join token→df → doc-id sort + per-run
    prefix pick → token sort + in-bucket pair emission (``max_bucket``
    guard, same contract as the other pair generators) → pair distinct →
    the shared double-join exact verification (:func:`_join_verify_jaccard`).
    Tokens travel as 8-byte blake2b hashes; a cross-doc collision (odds
    ~V²/2⁶⁴) is the only approximation.
    """
    from .agg import grouped_agg

    n_parts = max(2, shuffle_partitions or 8)

    def tok_batch(batch: pa.Table) -> pa.Table:
        blobs = []
        for t in batch.column(text_column).to_pylist():
            h = np.sort(_word_hashes(token_set(t)))
            blobs.append(h.tobytes())
        return pa.table(
            {
                "id": batch.column(id_column),
                "sh": pa.array(blobs, pa.large_binary()),
            }
        )

    tok_ds = ds.map_batches(
        tok_batch, batch_format="pyarrow", runtime_env=runtime_env()
    ).materialize()  # reused: df explode, prefix pick, double verify join

    def explode(batch: pa.Table) -> pa.Table:
        ids_in = batch.column("id").to_numpy(zero_copy_only=False)
        blobs = batch.column("sh").to_pylist()
        out_id, out_th = [], []
        for i, b in enumerate(blobs):
            th = np.frombuffer(b, dtype=np.uint64)
            if len(th):
                out_id.append(np.full(len(th), ids_in[i], np.int64))
                out_th.append(th)
        if not out_id:
            return pa.table(
                {"id": pa.array([], pa.int64()),
                 "th": pa.array([], pa.uint64())}
            )
        return pa.table(
            {
                "id": pa.array(np.concatenate(out_id), pa.int64()),
                "th": pa.array(np.concatenate(out_th), pa.uint64()),
            }
        )

    exploded = tok_ds.map_batches(
        explode, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    )
    df_ds = grouped_agg(exploded, ["th"], [("df", "", "count")])
    from .partition import coalesce_nonempty

    exploded_nz = coalesce_nonempty(exploded)
    df_nz = coalesce_nonempty(df_ds)
    if exploded_nz is None or df_nz is None:
        import ray

        return ray.data.from_arrow(_empty_verified("jaccard"))
    jdf = exploded_nz.join(df_nz, "inner", num_partitions=n_parts,
                           on=("th",))

    _empty_prefix = pa.table(
        {
            "th": pa.array([], pa.uint64()),
            "id": pa.array([], pa.int64()),
            "m": pa.array([], pa.int64()),
        }
    )

    def prefix_pick(batch: pa.Table, thr=threshold) -> pa.Table:
        # input sorted by id: each doc's rows are one run in-block
        if batch.num_rows == 0:
            return _empty_prefix
        ids = batch.column("id").combine_chunks().to_numpy(zero_copy_only=False)
        th = batch.column("th").combine_chunks().to_numpy(zero_copy_only=False)
        df = batch.column("df").combine_chunks().to_numpy(zero_copy_only=False)
        # order: doc, then GLOBAL (df asc, hash asc) within the doc
        order = np.lexsort((th, df, ids))
        ids_s, th_s = ids[order], th[order]
        starts, ends = _run_bounds(ids_s)
        lens = ends - starts
        m = np.repeat(lens, lens)          # each row's doc token count
        rank = run_rank(ids_s)
        # prefix length p = m - ceil(t*m) + 1
        p = m - np.ceil(thr * m).astype(np.int64) + 1
        mask = rank < p
        return pa.table(
            {
                "th": pa.array(th_s[mask], pa.uint64()),
                "id": pa.array(ids_s[mask], pa.int64()),
                "m": pa.array(m[mask], pa.int64()),
            }
        )

    prefixes = jdf.sort("id").map_batches(
        prefix_pick, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    )

    _empty = pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
    )

    def bucket_pairs(batch: pa.Table, thr=threshold) -> pa.Table:
        # input sorted by th: each prefix-token bucket is one run
        if batch.num_rows == 0:
            return _empty
        th = batch.column("th").combine_chunks().to_numpy(zero_copy_only=False)
        ids = batch.column("id").combine_chunks().to_numpy(zero_copy_only=False)
        ms = batch.column("m").combine_chunks().to_numpy(zero_copy_only=False)
        starts, ends = _run_bounds(th)
        sizes = ends - starts
        sel = (sizes >= 2) & (sizes <= max_bucket)
        out_a, out_b = [], []
        for s, e in zip(starts[sel], ends[sel]):
            seg_ids = ids[s:e]
            seg_ms = ms[s:e]
            o = np.argsort(seg_ids, kind="stable")
            seg_ids, seg_ms = seg_ids[o], seg_ms[o]
            ii, jj = np.triu_indices(int(e - s), 1)
            keep = seg_ids[ii] != seg_ids[jj]
            # size-ratio prune: J ≥ t requires min(|x|,|y|) ≥ t·max
            mi = np.minimum(seg_ms[ii], seg_ms[jj])
            ma = np.maximum(seg_ms[ii], seg_ms[jj])
            keep &= mi >= thr * ma
            out_a.append(seg_ids[ii][keep])
            out_b.append(seg_ids[jj][keep])
        if not out_a:
            return _empty
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a), pa.int64()),
                "id_b": pa.array(np.concatenate(out_b), pa.int64()),
            }
        )

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty
        a = batch.column("id_a").combine_chunks().to_numpy(zero_copy_only=False)
        b = batch.column("id_b").combine_chunks().to_numpy(zero_copy_only=False)
        keep = np.ones(len(a), dtype=bool)
        keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return batch.filter(pa.array(keep))

    cand = (
        prefixes.sort("th")
        .map_batches(bucket_pairs, batch_format="pyarrow", batch_size=None,
                     runtime_env=runtime_env())
        .sort(["id_a", "id_b"])
        .map_batches(distinct_pairs, batch_format="pyarrow",
                     batch_size=None, runtime_env=runtime_env())
    )

    return _join_verify_jaccard(cand, tok_ds, threshold, n_parts)


# ── weighted (TF-IDF) cosine all-pairs similarity join ──────────────────────


def cosine_pairs_exact(
    ds, id_column: str = "doc_id", text_column: str = "text",
    tau: tuple = (4, 5), n_docs: int | None = None,
    shuffle_partitions: int | None = None, max_bucket: int = 65536,
):
    """ALL pairs with idf-weighted (binary-tf) cosine ≥ tau — EXACT and
    INTEGER-DETERMINISTIC.  The sparse twin of the embedding near-dup:
    each doc is the set-indicator vector of its distinct tokens scaled
    by the integer idf envelope ``w(t) = ⌊log2 N⌋ − ⌊log2 df(t)⌋``
    (the doc_surprisal convention — bit-identical across engines;
    tokens in the top df band carry weight 0 and are DROPPED, the
    stopword prune built into the weighting).  cos ≥ τ = TN/TD is
    decided entirely in integers: ``num²·TD² ≥ TN²·‖a‖²·‖b‖²`` —
    no square root ever crosses an engine boundary.  Returns
    (id_a, id_b, num, norm_a, norm_b), all exact int64.

    Candidate filter (probe–index prefix filtering adapted to weighted
    cosine): order every doc's tokens by the global (df asc, hash)
    order and INDEX the minimal prefix whose remaining norm² drops
    below ``τ²·‖d‖²``; every token row PROBES.  A pair is emitted when
    a shared token is in either side's index prefix — if no shared
    token is in a's prefix, the whole intersection sits in a's suffix
    and Cauchy–Schwarz gives ``num ≤ ‖suff_a‖·‖b‖ < τ·‖a‖·‖b‖``, so
    every qualifying pair is found (symmetrically for b).  The prefix
    test is integer too: index position i while ``TD²·R_i ≥ TN²·‖d‖²``
    (R = suffix sum of w²) — for τ = 0.8 only the rarest ~36% of each
    doc's norm² is indexed, and tokens too common to enter ANY prefix
    never pair at all (probe rows meet an empty index side).

    Scale shape (nothing driver-resident): one tokenize/explode pass
    (tokens travel as 8-byte hashes); distributed df combiner count;
    native hash-join df attach; ONE single-key id sort feeding two
    in-block passes (blob assembly + prefix pick); token sort +
    in-bucket pair emission (``max_bucket`` hot-bucket guard); pair
    distinct; size-gated verification — broadcast restricted blob
    pull below :data:`VERIFY_BROADCAST_CUTOFF`, distributed double
    hash-join above, exactly the minhash/jaccard contract.
    Verification scoring is the fully vectorized segmented
    lexsort-merge of :func:`_cosine_batch_check` — never per-pair
    Python.  Cross-doc 64-bit hash collisions (odds ~V²/2⁶⁴) are the
    only approximation.

    Degenerate-input note: a corpus whose WHOLE vocabulary is
    near-universal (every token in >N/2 docs) has no rare tokens for
    prefixes to exploit — most doc pairs genuinely exceed τ and ANY
    exact all-pairs algorithm emits Ω(qualifying pairs).  The
    synthetic sf0.1 table is exactly this shape (31 distinct w>0
    tokens; ~43% of all pairs pass τ=0.8), so this query is
    correctness-benchmarked at oracle scale, not wall-clocked there —
    same policy as jaccard_pairs.
    """
    import ray

    from .agg import grouped_agg
    from .partition import coalesce_nonempty

    tn, td = int(tau[0]), int(tau[1])
    n_parts = max(2, shuffle_partitions or 8)
    if n_docs is None:
        n_docs = ds.count()

    _empty_out = pa.table(
        {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "num": pa.array([], pa.int64()),
            "norm_a": pa.array([], pa.int64()),
            "norm_b": pa.array([], pa.int64()),
        }
    )
    if n_docs <= 1:
        return ray.data.from_arrow(_empty_out)
    log_n = int(n_docs).bit_length() - 1

    def explode(batch: pa.Table) -> pa.Table:
        ids_in = batch.column(id_column).to_numpy(zero_copy_only=False)
        out_id, out_th = [], []
        for i, t in enumerate(batch.column(text_column).to_pylist()):
            th = _word_hashes(token_set(t))
            if len(th):
                out_id.append(np.full(len(th), ids_in[i], np.int64))
                out_th.append(th)
        if not out_id:
            return pa.table(
                {"id": pa.array([], pa.int64()),
                 "th": pa.array([], pa.uint64())}
            )
        return pa.table(
            {
                "id": pa.array(np.concatenate(out_id), pa.int64()),
                "th": pa.array(np.concatenate(out_th), pa.uint64()),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow",
                              batch_size=None,
                              runtime_env=runtime_env()).materialize()
    df_ds = grouped_agg(exploded, ["th"], [("df", "", "count")])
    exploded_nz = coalesce_nonempty(exploded)
    df_nz = coalesce_nonempty(df_ds)
    if exploded_nz is None or df_nz is None:
        return ray.data.from_arrow(_empty_out)
    jdf = exploded_nz.join(df_nz, "inner", num_partitions=n_parts,
                           on=("th",))

    def weigh(batch: pa.Table) -> pa.Table:
        df = batch.column("df").combine_chunks().to_numpy(
            zero_copy_only=False
        )
        # floor-log2 via frexp (the _flog2 convention; df ≥ 1 always)
        ldf = (np.frexp(df.astype(np.float64))[1] - 1).astype(np.int64)
        w = log_n - ldf
        keep = w > 0
        mask = pa.array(keep)
        return pa.table(
            {
                "id": batch.column("id").combine_chunks().filter(mask),
                "th": batch.column("th").combine_chunks().filter(mask),
                "df": pa.array(df[keep], pa.int64()),
                "w": pa.array(w[keep], pa.int64()),
            }
        )

    wtab = jdf.map_batches(weigh, batch_format="pyarrow",
                           runtime_env=runtime_env())
    wtab_nz = coalesce_nonempty(wtab)
    if wtab_nz is None:
        return ray.data.from_arrow(_empty_out)
    sorted_w = wtab_nz.sort("id").materialize()

    def make_blobs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"id": pa.array([], pa.int64()),
                             "sh": pa.array([], pa.large_binary())})
        ids = batch.column("id").combine_chunks().to_numpy(
            zero_copy_only=False)
        th = batch.column("th").combine_chunks().to_numpy(
            zero_copy_only=False)
        w = batch.column("w").combine_chunks().to_numpy(
            zero_copy_only=False)
        order = np.lexsort((th, ids))        # hash-ascending per doc
        ids_s, th_s, w_s = ids[order], th[order], w[order]
        starts, ends = _run_bounds(ids_s)
        blobs = [
            th_s[s:e].tobytes() + w_s[s:e].astype(np.uint16).tobytes()
            for s, e in zip(starts, ends)
        ]
        return pa.table(
            {
                "id": pa.array(ids_s[starts], pa.int64()),
                "sh": pa.array(blobs, pa.large_binary()),
            }
        )

    blob_ds = sorted_w.map_batches(make_blobs, batch_format="pyarrow",
                                   batch_size=None,
                                   runtime_env=runtime_env())

    _empty_tok = pa.table(
        {"th": pa.array([], pa.uint64()), "id": pa.array([], pa.int64()),
         "ix": pa.array([], pa.int8())}
    )

    def flag_prefix(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_tok
        ids = batch.column("id").combine_chunks().to_numpy(
            zero_copy_only=False)
        th = batch.column("th").combine_chunks().to_numpy(
            zero_copy_only=False)
        df = batch.column("df").combine_chunks().to_numpy(
            zero_copy_only=False)
        w = batch.column("w").combine_chunks().to_numpy(
            zero_copy_only=False)
        order = np.lexsort((th, df, ids))    # rare-first per doc
        ids_s, th_s, w2 = ids[order], th[order], w[order] ** 2
        starts, ends = _run_bounds(ids_s)
        # per-run suffix sums of w² and run totals, vectorized:
        cum = np.concatenate(([0], np.cumsum(w2)))
        run_total = np.repeat(cum[ends] - cum[starts],
                              ends - starts)       # ‖d‖² per row
        run_end = np.repeat(cum[ends], ends - starts)
        suffix = run_end - cum[:-1]                 # R_i (includes i)
        ix = (td * td * suffix >= tn * tn * run_total)
        return pa.table(
            {
                "th": pa.array(th_s, pa.uint64()),
                "id": pa.array(ids_s, pa.int64()),
                "ix": pa.array(ix.astype(np.int8), pa.int8()),
            }
        )

    tok_rows = sorted_w.map_batches(flag_prefix, batch_format="pyarrow",
                                    batch_size=None,
                                    runtime_env=runtime_env())

    _empty_pair = pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
    )

    def bucket_pairs(batch: pa.Table) -> pa.Table:
        # index rows × probe rows within each token bucket
        if batch.num_rows == 0:
            return _empty_pair
        th = batch.column("th").combine_chunks().to_numpy(
            zero_copy_only=False)
        ids = batch.column("id").combine_chunks().to_numpy(
            zero_copy_only=False)
        ix = batch.column("ix").combine_chunks().to_numpy(
            zero_copy_only=False)
        starts, ends = _run_bounds(th)
        sizes = ends - starts
        sel = (sizes >= 2) & (sizes <= max_bucket)
        out_a, out_b = [], []
        for s, e in zip(starts[sel], ends[sel]):
            seg_ids = ids[s:e]
            idx_ids = seg_ids[ix[s:e] == 1]
            if not len(idx_ids):
                continue
            a = np.repeat(idx_ids, len(seg_ids))
            b = np.tile(seg_ids, len(idx_ids))
            keep = a != b
            a, b = a[keep], b[keep]
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
        if not out_a:
            return _empty_pair
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a), pa.int64()),
                "id_b": pa.array(np.concatenate(out_b), pa.int64()),
            }
        )

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_pair
        a = batch.column("id_a").combine_chunks().to_numpy(
            zero_copy_only=False)
        b = batch.column("id_b").combine_chunks().to_numpy(
            zero_copy_only=False)
        keep = np.ones(len(a), dtype=bool)
        keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return batch.filter(pa.array(keep))

    cand = (
        tok_rows.sort("th")
        .map_batches(bucket_pairs, batch_format="pyarrow",
                     batch_size=None, runtime_env=runtime_env())
        .sort(["id_a", "id_b"])
        .map_batches(distinct_pairs, batch_format="pyarrow",
                     batch_size=None, runtime_env=runtime_env())
    )
    return _verify_cosine(cand, blob_ds, tn, td, n_parts)


def _cosine_batch_check(blobs_a, blobs_b, tn: int, td: int):
    """Vectorized exact scoring of a BATCH of blob pairs: one segmented
    lexsort-merge over the concatenated (pair, token, side) rows finds
    every shared token (distinct per side, so matches are exactly
    adjacent A/B duos), products and norms reduce by pair via bincount
    (float64 bincount is exact for integer sums < 2⁵³ — norms are
    ≤ 2809·tokens).  The threshold test is a float64 pre-test with an
    exact Python-int re-check of the ±1e-9 borderline band — never a
    per-pair Python scoring loop.  Returns (num, na, nb, ok) arrays."""
    k = len(blobs_a)
    if k == 0:
        z = np.zeros(0, np.int64)
        return z, z, z, np.zeros(0, bool)
    tha = [np.frombuffer(b[: 8 * (len(b) // 10)], np.uint64)
           for b in blobs_a]
    wa = [np.frombuffer(b[8 * (len(b) // 10):], np.uint16)
          for b in blobs_a]
    thb = [np.frombuffer(b[: 8 * (len(b) // 10)], np.uint64)
           for b in blobs_b]
    wb = [np.frombuffer(b[8 * (len(b) // 10):], np.uint16)
          for b in blobs_b]
    ca = np.fromiter((len(t) for t in tha), np.int64, k)
    cb = np.fromiter((len(t) for t in thb), np.int64, k)
    THA = (np.concatenate(tha) if ca.sum() else np.zeros(0, np.uint64))
    WA = (np.concatenate(wa).astype(np.int64) if ca.sum()
          else np.zeros(0, np.int64))
    THB = (np.concatenate(thb) if cb.sum() else np.zeros(0, np.uint64))
    WB = (np.concatenate(wb).astype(np.int64) if cb.sum()
          else np.zeros(0, np.int64))
    PA = np.repeat(np.arange(k, dtype=np.int64), ca)
    PB = np.repeat(np.arange(k, dtype=np.int64), cb)
    na = np.bincount(PA, weights=WA * WA, minlength=k).astype(np.int64)
    nb = np.bincount(PB, weights=WB * WB, minlength=k).astype(np.int64)

    p = np.concatenate([PA, PB])
    th = np.concatenate([THA, THB])
    w = np.concatenate([WA, WB])
    side = np.concatenate([np.zeros(len(PA), np.int8),
                           np.ones(len(PB), np.int8)])
    order = np.lexsort((side, th, p))
    p, th, w, side = p[order], th[order], w[order], side[order]
    eq = np.zeros(len(p), dtype=bool)
    if len(p) > 1:
        eq[:-1] = ((p[:-1] == p[1:]) & (th[:-1] == th[1:])
                   & (side[:-1] == 0) & (side[1:] == 1))
    idx = np.flatnonzero(eq)
    prod = w[idx] * w[idx + 1]
    num = np.bincount(p[idx], weights=prod, minlength=k).astype(np.int64)

    lhs = (num.astype(np.float64) ** 2) * (td * td)
    rhs = (tn * tn) * na.astype(np.float64) * nb.astype(np.float64)
    ok = (num > 0) & (lhs >= rhs * (1.0 - 1e-9))
    border = ok & (lhs <= rhs * (1.0 + 1e-9))
    for i in np.flatnonzero(border):
        ok[i] = (int(num[i]) ** 2 * td * td
                 >= tn * tn * int(na[i]) * int(nb[i]))
    return num, na, nb, ok


def _verify_cosine(cand, blob_ds, tn: int, td: int, n_parts: int,
                   broadcast_cutoff: int | None = None):
    """Exact integer cosine verification of candidate pairs — the
    size-gated hybrid of :func:`_join_verify_jaccard` with integer
    (num, norm_a, norm_b) outputs instead of a float score."""
    import ray

    from .partition import coalesce_nonempty

    _empty_out = pa.table(
        {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "num": pa.array([], pa.int64()),
            "norm_a": pa.array([], pa.int64()),
            "norm_b": pa.array([], pa.int64()),
        }
    )
    cand = coalesce_nonempty(cand)
    blob_nz = coalesce_nonempty(blob_ds)
    if cand is None or blob_nz is None:
        return ray.data.from_arrow(_empty_out)

    def emit(a_ids, b_ids, blobs_a, blobs_b):
        num, na, nb, ok = _cosine_batch_check(blobs_a, blobs_b, tn, td)
        return pa.table(
            {
                "id_a": pa.array(np.asarray(a_ids, np.int64)[ok],
                                 pa.int64()),
                "id_b": pa.array(np.asarray(b_ids, np.int64)[ok],
                                 pa.int64()),
                "num": pa.array(num[ok], pa.int64()),
                "norm_a": pa.array(na[ok], pa.int64()),
                "norm_b": pa.array(nb[ok], pa.int64()),
            }
        )

    cutoff = (VERIFY_BROADCAST_CUTOFF if broadcast_cutoff is None
              else broadcast_cutoff)
    if cand.count() <= cutoff:
        cand_rows = cand.take_all()
        cand_ids = np.unique(
            np.fromiter(
                (i for r in cand_rows for i in (r["id_a"], r["id_b"])),
                dtype=np.int64, count=2 * len(cand_rows),
            )
        )
        ids_ref = ray.put(cand_ids)

        def only_candidates(batch: pa.Table, ref=ids_ref) -> pa.Table:
            wanted = cached_get(ref)
            ids = batch.column("id").combine_chunks().to_numpy(
                zero_copy_only=False)
            if not len(wanted):
                return batch.filter(
                    pa.array(np.zeros(len(ids), dtype=bool)))
            pos = np.searchsorted(wanted, ids)
            pos[pos >= len(wanted)] = 0
            return batch.filter(pa.array(wanted[pos] == ids))

        blob_map = {
            r["id"]: r["sh"]
            for r in blob_nz.map_batches(
                only_candidates, batch_format="pyarrow",
                runtime_env=runtime_env(),
            ).take_all()
        }
        blob_ref = ray.put(blob_map)

        def verify_bc(batch: pa.Table, ref=blob_ref) -> pa.Table:
            m = cached_get(ref)
            a_ids = batch.column("id_a").to_pylist()
            b_ids = batch.column("id_b").to_pylist()
            return emit(a_ids, b_ids,
                        [m.get(a, b"") for a in a_ids],
                        [m.get(b, b"") for b in b_ids])

        return cand.map_batches(verify_bc, batch_format="pyarrow",
                                runtime_env=runtime_env())

    j1 = coalesce_nonempty(cand.join(
        blob_nz, "inner", num_partitions=n_parts,
        on=("id_a",), right_on=("id",),
    ))
    if j1 is None:
        return ray.data.from_arrow(_empty_out)
    j2 = j1.join(
        blob_nz, "inner", num_partitions=n_parts,
        on=("id_b",), right_on=("id",), right_suffix="_b",
    )

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_out
        return emit(batch.column("id_a").to_pylist(),
                    batch.column("id_b").to_pylist(),
                    batch.column("sh").to_pylist(),
                    batch.column("sh_b").to_pylist())

    return j2.map_batches(verify, batch_format="pyarrow",
                          runtime_env=runtime_env())


# ── SimHash ──────────────────────────────────────────────────────────────────

_BIT_RANGE = np.arange(64, dtype=np.uint64)


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (Charikar 2002, public) —
    vectorized: one (n_words × 64) bit matrix per document."""
    words = set(WORD_RE.findall((text or "").lower()))
    if not words:
        return 0
    hs = _word_hashes(sorted(words))
    bits = ((hs[:, None] >> _BIT_RANGE) & np.uint64(1)).astype(np.int64)
    acc = (bits * 2 - 1).sum(axis=0)
    return int(((acc > 0).astype(np.uint64) << _BIT_RANGE).sum())


# 16-bit popcount table (64 KB, built once per worker process import)
_POP16 = np.array([bin(i).count("1") for i in range(1 << 16)], dtype=np.uint8)


def _hamming64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of uint64 xor values via 4×16-bit table lookups."""
    lo = (x & np.uint64(0xFFFF)).astype(np.int64)
    m1 = ((x >> np.uint64(16)) & np.uint64(0xFFFF)).astype(np.int64)
    m2 = ((x >> np.uint64(32)) & np.uint64(0xFFFF)).astype(np.int64)
    hi = (x >> np.uint64(48)).astype(np.int64)
    return (
        _POP16[lo].astype(np.int32) + _POP16[m1] + _POP16[m2] + _POP16[hi]
    )


def simhash_pairs(
    ds, id_column: str = "doc_id", text_column: str = "text",
    max_hamming: int = 3, max_bucket: int = 512,
    shuffle_partitions: int | None = None,
):
    """Near-dup pairs by SimHash: band on 4×16-bit chunks (any pair within
    hamming ≤ 3 of a 64-bit hash shares at least one exact 16-bit chunk —
    pigeonhole), verify hamming distance in-bucket.

    One shuffle total: sort on ``(chunk, chunk_val)`` co-locates each
    bucket in one block, then a vectorized block pass emits each pair
    exactly once — from the FIRST chunk on which the two signatures agree
    (later agreeing chunks recompute the earlier match from the carried
    sig and skip) — so no distinct-pairs aggregate is needed.

    Buckets larger than ``max_bucket`` are skipped entirely (hot-bucket
    guard: a 16-bit chunk shared by thousands of docs is a weak signal,
    and enumerating its O(B²) pairs dominates the stage on
    near-homogeneous corpora).  Deterministic, documented cap.  With
    first-match emission the guard is slightly stricter than the old
    emit-everywhere+distinct plan: a pair is missed if its FIRST shared
    chunk's bucket is over-populated (previously: only if EVERY shared
    chunk was) — the trade buys the removal of a full all-to-all."""

    def sig_batch(batch: pa.Table) -> pa.Table:
        ids_in = batch.column(id_column).to_pylist()
        texts = batch.column(text_column).to_pylist()
        n = len(ids_in)
        sigs = np.fromiter(
            (simhash64(t) for t in texts), dtype=np.uint64, count=n
        )
        ids = np.repeat(np.asarray(ids_in, dtype=np.int64), 4)
        chunks = np.tile(np.arange(4, dtype=np.int32), n)
        sig_rep = np.repeat(sigs, 4)
        shifts = (chunks.astype(np.uint64)) * np.uint64(16)
        chunk_vals = ((sig_rep >> shifts) & np.uint64(0xFFFF)).astype(np.int32)
        return pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "chunk": pa.array(chunks, pa.int32()),
                "chunk_val": pa.array(chunk_vals, pa.int32()),
                "sig": pa.array(sig_rep, pa.uint64()),
            }
        )

    def block_pairs(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "hamming": pa.array([], pa.int32()),
            }
        )
        if batch.num_rows == 0:
            return empty
        chunk = batch.column("chunk").combine_chunks().to_numpy(zero_copy_only=False)
        cval = batch.column("chunk_val").combine_chunks().to_numpy(zero_copy_only=False)
        ids = batch.column("id").combine_chunks().to_numpy(zero_copy_only=False)
        sigs = batch.column("sig").combine_chunks().to_numpy(zero_copy_only=False)
        starts, ends = _run_bounds(chunk, cval)
        sizes = ends - starts
        # hot-bucket guard (see docstring) + singleton skip, vectorized
        sel = (sizes >= 2) & (sizes <= max_bucket)
        out_a, out_b, out_h = [], [], []
        for s, e in zip(starts[sel], ends[sel]):
            m = int(e - s)
            order = np.argsort(ids[s:e], kind="stable")
            seg_ids = ids[s:e][order]
            seg_sigs = sigs[s:e][order]
            c = int(chunk[s])
            ii, jj = np.triu_indices(m, 1)
            xor = seg_sigs[ii] ^ seg_sigs[jj]
            keep = np.ones(len(ii), dtype=bool)
            for j in range(c):  # first-match: skip if an earlier chunk agrees
                keep &= ((xor >> np.uint64(16 * j)) & np.uint64(0xFFFF)) != 0
            ham = _hamming64(xor)
            keep &= ham <= max_hamming
            keep &= seg_ids[ii] != seg_ids[jj]
            out_a.append(seg_ids[ii][keep])
            out_b.append(seg_ids[jj][keep])
            out_h.append(ham[keep])
        if not out_a:
            return empty
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a), pa.int64()),
                "id_b": pa.array(np.concatenate(out_b), pa.int64()),
                "hamming": pa.array(
                    np.concatenate(out_h).astype(np.int32), pa.int32()
                ),
            }
        )

    sig = ds.map_batches(sig_batch, batch_format="pyarrow", runtime_env=runtime_env())
    if shuffle_partitions:
        sig = sig.repartition(shuffle_partitions)
    return sig.sort(["chunk", "chunk_val"]).map_batches(
        block_pairs, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    )


# ── embedding near-dup ───────────────────────────────────────────────────────


def embedding_neardup_pairs(
    ds, id_column: str = "vec_id", vec_column: str = "embedding",
    threshold: float = 0.95, target_block_bytes: int = 64 << 20,
):
    """ALL pairs with cosine ≥ threshold — EXACT, via distributed blocked
    pairwise matmul.

    Exact all-pairs similarity is inherently O(n²) similarity evaluations;
    the scale question is *where* that work runs.  Shape: the (id, vec)
    projection is materialized into object-store blocks, and one Ray task
    per (block_i, block_j) pair (i ≤ j) pulls exactly TWO blocks and
    computes their cross matmul — per-task memory is two blocks, the
    driver holds only block refs, and the K(K+1)/2 tasks stream through
    the task pool with full parallelism.  Each unordered doc pair lives in
    exactly one block pair, so no dedup pass is needed.  (For corpus-scale
    near-dup where approximation is acceptable, minhash_lsh_pairs /
    simhash_pairs are the sub-quadratic paths.)"""
    import ray

    from .ann import _ids_array, _normalize, _vec_matrix

    proj = ds.select_columns([id_column, vec_column]).materialize()
    # coalesce to ~target_block_bytes chunks: the task count is
    # K(K+1)/2, so tiny input blocks would drown the matmuls in
    # scheduling overhead (a small-sf read yields 16 ~8 KB blocks)
    n_chunks = max(1, -(-proj.size_bytes() // target_block_bytes))
    if n_chunks < proj.num_blocks():
        proj = proj.repartition(n_chunks).materialize()
    blocks = proj.to_arrow_refs()
    k_blocks = len(blocks)
    refs_ref = ray.put(blocks)
    idx_ds = ray.data.from_items(
        [{"i": i, "j": j} for i in range(k_blocks) for j in range(i, k_blocks)]
    )

    def chunk_pairs(batch: pa.Table, thr=threshold) -> pa.Table:
        refs = cached_get(refs_ref)
        a_out, b_out, cs = [], [], []
        for i, j in zip(batch.column("i").to_pylist(),
                        batch.column("j").to_pylist()):
            ta = ray.get(refs[i])
            ids_a = _ids_array(ta.column(id_column))
            ma = _normalize(_vec_matrix(ta.column(vec_column)))
            if i == j:
                ids_b, mb = ids_a, ma
            else:
                tb = ray.get(refs[j])
                ids_b = _ids_array(tb.column(id_column))
                mb = _normalize(_vec_matrix(tb.column(vec_column)))
            if not len(ids_a) or not len(ids_b):
                continue
            sims = ma @ mb.T
            if i == j:
                # within-block: strict upper triangle by id (no self/dup)
                ii, jj = np.nonzero(
                    (sims >= thr) & (ids_a[:, None] < ids_b[None, :])
                )
                a_ids, b_ids = ids_a[ii], ids_b[jj]
            else:
                # cross-block: ids interleave — emit every hit once,
                # normalized to (min, max)
                ii, jj = np.nonzero(sims >= thr)
                a_ids = np.minimum(ids_a[ii], ids_b[jj])
                b_ids = np.maximum(ids_a[ii], ids_b[jj])
            a_out.append(a_ids)
            b_out.append(b_ids)
            cs.append(sims[ii, jj])
        if not a_out:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(a_out), pa.int64()),
                "id_b": pa.array(np.concatenate(b_out), pa.int64()),
                "cosine": pa.array(np.concatenate(cs), pa.float64()),
            }
        )

    # batch_size=1 → one task per block pair (each task is one matmul)
    return idx_ds.map_batches(
        chunk_pairs, batch_format="pyarrow", batch_size=1,
        runtime_env=runtime_env(),
    )


_EMB_PLANE_SEED = 0xD0C5
_PLANE_MEMO: Dict[Tuple[int, int, int], np.ndarray] = {}


def _emb_blob_batch(id_column: str, vec_column: str):
    """Batch fn projecting (id, vec) rows to (id int64, sh large_binary)
    where ``sh`` is the L2-normalized float64 vector's raw bytes.  Blobs
    (not Arrow lists) because acero joins reject LIST payload columns
    (CLAUDE.md), and because one contiguous buffer round-trips through
    np.frombuffer with zero per-row Python.  Shared by
    embedding_neardup_lsh and semantic_dedup_pairs."""
    from .ann import _ids_array, _normalize, _vec_matrix

    def blob_batch(batch: pa.Table) -> pa.Table:
        ids_in = _ids_array(batch.column(id_column))
        mat = _normalize(_vec_matrix(batch.column(vec_column)))
        return pa.table(
            {
                "id": pa.array(ids_in, pa.int64()),
                "sh": pa.array([mat[i].tobytes() for i in range(len(ids_in))],
                               pa.large_binary()),
            }
        )

    return blob_batch


def _blob_matrix(col) -> np.ndarray:
    """(n, dim) float64 matrix from a large_binary column of equal-length
    normalized-vector blobs."""
    blobs = col.to_pylist()
    if not blobs:
        return np.empty((0, 0), np.float64)
    return np.frombuffer(b"".join(blobs), dtype=np.float64).reshape(
        len(blobs), -1)


def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    """Deterministic (n_bits, dim) hyperplane matrix, memoized per worker
    — every task regenerates the SAME planes from the seed, so nothing
    needs broadcasting and no driver-side dim discovery pass is needed."""
    key = (dim, n_bits, seed)
    mat = _PLANE_MEMO.get(key)
    if mat is None:
        mat = np.random.default_rng(seed).standard_normal((n_bits, dim))
        _PLANE_MEMO[key] = mat
    return mat


def lsh_bits_per_band(threshold: float, n_bands: int,
                      target_recall: float = 0.99) -> int:
    """Widest band (most selective bucketing) that still reaches
    ``target_recall`` for pairs AT the cosine threshold, from the
    Charikar sign-agreement probability ``p = 1 - arccos(t)/π``:
    recall = 1-(1-p^r)^b  ⇒  r = ⌊log(1-(1-R)^(1/b)) / log(p)⌋.
    Lower thresholds force narrower bands (coarser buckets, more
    candidates) — that cost is inherent to LSH, not a tuning choice."""
    p = 1.0 - np.arccos(np.clip(threshold, -1.0, 1.0)) / np.pi
    p_band = 1.0 - (1.0 - target_recall) ** (1.0 / n_bands)
    if not (0.0 < p < 1.0):
        return 20
    return int(np.clip(np.floor(np.log(p_band) / np.log(p)), 1, 20))


def embedding_neardup_lsh(
    ds, id_column: str = "vec_id", vec_column: str = "embedding",
    threshold: float = 0.95, n_bands: int = 16,
    bits_per_band: int | None = None,
    shuffle_partitions: int | None = None, max_bucket: int = 4096,
    verify_broadcast_cutoff: int | None = None,
    fallback_below_bits: int = 8,
):
    """Embedding-cosine near-dup pairs, SUB-QUADRATIC — the corpus-scale
    companion to the exact :func:`embedding_neardup_pairs` blocked
    matmul (which evaluates all O(n²) pairs, distributed).

    Random-hyperplane LSH with band-OR amplification: each vector gets
    ``n_bands × bits_per_band`` sign bits; a pair is a candidate iff
    some band's ``bits_per_band`` bits all agree.  For cosine ≥ t the
    per-bit agreement probability is ``1 - arccos(t)/π`` (Charikar
    2002); ``bits_per_band`` defaults to the widest band that keeps
    recall ≥ 0.99 for pairs AT the threshold
    (:func:`lsh_bits_per_band` — e.g. 13 bits at t=0.95, where an
    unrelated pair (cos≈0) survives a band with probability 2^-13 and
    pair work stays near-linear; at loose thresholds the derived bands
    are narrow and the candidate rate rises — inherent to LSH, and
    still exact-verified).

    Shape mirrors :func:`minhash_lsh_pairs` exactly: one sort on
    ``(band, band_hash)`` co-locates buckets, the shared vectorized
    block pass emits each candidate pair once (first-colliding-band
    dedup, hot-bucket guard), and the shared size-gated hybrid
    verification computes EXACT cosine per candidate from normalized
    float64 blobs — so emitted pairs are never false positives; the
    banding only bounds recall.  Nothing is driver-resident beyond the
    gated candidate sample.

    **Loose-threshold gate.** Below ≈0.9 the band width the recall
    target demands collapses (8 bits at t=0.9, 3 bits at t=0.45 — 8
    buckets per band) and "LSH" degenerates to near-all-pairs with
    banding overhead on top: strictly worse than the exact blocked
    matmul.  That is the LSH s-curve, not a tuning artifact — no
    hyperplane scheme is selective at cosine 0.45.  So when the derived
    width falls below ``fallback_below_bits`` the operator runs
    :func:`embedding_neardup_pairs` instead (recall becomes exactly 1.0
    — a strict superset of the contract).  Passing ``bits_per_band``
    explicitly bypasses the gate."""
    if bits_per_band is None:
        derived = lsh_bits_per_band(threshold, n_bands)
        if derived < fallback_below_bits:
            return embedding_neardup_pairs(
                ds, id_column=id_column, vec_column=vec_column,
                threshold=threshold,
            )
        bits_per_band = derived

    proj = ds.select_columns([id_column, vec_column])
    if shuffle_partitions:
        proj = proj.repartition(shuffle_partitions)

    # normalized float64 blobs, computed ONCE — reused by the signature
    # stage and the verification (broadcast or double-join) stage
    blob_ds = proj.map_batches(
        _emb_blob_batch(id_column, vec_column),
        batch_format="pyarrow", runtime_env=runtime_env()
    ).materialize()

    total_bits = n_bands * bits_per_band
    weights = (np.uint64(1) << np.arange(bits_per_band, dtype=np.uint64))

    def sig_batch(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids_in = batch.column("id").combine_chunks().to_numpy(zero_copy_only=False)
        if n == 0:
            return _band_sig_table(ids_in, np.empty((0, n_bands), np.uint64))
        mat = np.frombuffer(
            b"".join(batch.column("sh").to_pylist()), dtype=np.float64
        ).reshape(n, -1)
        planes = _hyperplanes(mat.shape[1], total_bits, _EMB_PLANE_SEED)
        bits = (mat @ planes.T) > 0.0  # (n, total_bits)
        bh_mat = bits.reshape(n, n_bands, bits_per_band).astype(np.uint64) @ weights
        return _band_sig_table(ids_in, bh_mat)

    sig_ds = blob_ds.map_batches(
        sig_batch, batch_format="pyarrow", runtime_env=runtime_env()
    )

    cand = sig_ds.sort(["band", "band_hash"]).map_batches(
        _band_block_pairs(n_bands, max_bucket),
        batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    )

    return _join_verify_jaccard(cand, blob_ds, threshold,
                                max(2, shuffle_partitions or 8),
                                broadcast_cutoff=verify_broadcast_cutoff,
                                kind="cosine")


# ── semantic dedup (cluster-then-prune, SemDeDup-style) ──────────────────────


def semantic_dedup_pairs(
    ds,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    threshold: float = 0.95,
    n_cells: int = 16,
    train_sample: int = 2048,
    shuffle_partitions: int | None = None,
    tile: int = 2048,
    max_cell: int = 65536,
):
    """Within-cluster embedding near-dup pairs — the cluster-then-prune
    shape of SemDeDup (Abbas et al. 2023, arXiv:2303.09540): spherical
    k-means partitions the corpus into ``n_cells`` cells, and exact
    pairwise cosine runs ONLY inside each cell, so total similarity work
    drops from O(n²) to O(Σ|cell|²) ≈ O(n²/n_cells).  Returns
    (id_a, id_b, cosine) with id_a < id_b and cosine ≥ threshold.

    Contract: emitted pairs are EXACT (float64 cosine of the normalized
    vectors — no false positives); recall is bounded to same-cell pairs,
    the documented SemDeDup approximation (a near-dup pair at cosine ≥
    0.9 lands in one cell for any quantizer whose cell diameter exceeds
    the pair's angle — with n_cells=1 the operator degenerates to the
    exact all-pairs matmul, which tests pin).

    Scale shape: the quantizer trains on a deterministic hash-rank
    sample (O(blocks × train_sample) driver pull — same discipline as
    ivf_topk); assignment is one matmul per batch against the broadcast
    centroids; ONE all-to-all sort on ``cell`` co-locates each cell
    (equal keys land in one sort partition — the guarantee every
    run-pass operator here relies on); the per-cell pairwise matmul is
    tiled (``tile``×``tile`` blocks) so peak memory is O(tile²) however
    large the cell, and cells above ``max_cell`` rows are skipped (the
    hot-bucket guard shared with minhash/simhash/jaccard — a degenerate
    quantizer cell is a boilerplate bucket by another name).  At 100 TB
    n_cells scales with the corpus (the SemDeDup paper uses ~100k), so
    cells stay block-sized; centroids (n_cells × dim float64) are the
    only broadcast state."""
    import ray

    from .ann import _spherical_kmeans

    proj = ds.select_columns([id_column, vec_column])
    if shuffle_partitions:
        proj = proj.repartition(shuffle_partitions)

    blob_ds = proj.map_batches(
        _emb_blob_batch(id_column, vec_column),
        batch_format="pyarrow", runtime_env=runtime_env()
    ).materialize()

    # hash-rank training sample (order-free, unbiased by storage layout;
    # per-block partial top-k keeps the driver pull small)
    def hash_candidates(batch: pa.Table, k=train_sample) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"h": pa.array([], pa.uint64()),
                             "sh": pa.array([], pa.large_binary())})
        ids = batch.column("id").combine_chunks().to_numpy(
            zero_copy_only=False)
        with np.errstate(over="ignore"):
            h = ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        top = np.argsort(h, kind="stable")[:k]
        return pa.table({
            "h": pa.array(h[top], pa.uint64()),
            "sh": batch.column("sh").combine_chunks().take(pa.array(top)),
        })

    cand = blob_ds.map_batches(
        hash_candidates, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    ).take_all()
    if not cand:
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
        }))
    cand.sort(key=lambda r: r["h"])
    sample = np.frombuffer(
        b"".join(r["sh"] for r in cand[:train_sample]), dtype=np.float64
    ).reshape(min(len(cand), train_sample), -1)
    cents = _spherical_kmeans(sample, n_cells)
    cents_ref = ray.put(cents)

    def assign_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "cell": pa.array([], pa.int32()),
                "id": pa.array([], pa.int64()),
                "sh": pa.array([], pa.large_binary()),
            })
        mat = _blob_matrix(batch.column("sh"))
        cells = np.argmax(mat @ cached_get(cents_ref).T, axis=1)
        return pa.table({
            "cell": pa.array(cells.astype(np.int32), pa.int32()),
            "id": batch.column("id"),
            "sh": batch.column("sh"),
        })

    assigned = blob_ds.map_batches(
        assign_batch, batch_format="pyarrow", runtime_env=runtime_env()
    ).sort("cell")

    def cell_pairs(batch: pa.Table, thr=threshold) -> pa.Table:
        empty = pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
        })
        if batch.num_rows == 0:
            return empty
        cells = batch.column("cell").combine_chunks().to_numpy(
            zero_copy_only=False)
        ids = batch.column("id").combine_chunks().to_numpy(
            zero_copy_only=False)
        blob_col = batch.column("sh").combine_chunks()
        starts, ends = _run_bounds(cells)
        sizes = ends - starts
        sel = (sizes >= 2) & (sizes <= max_cell)
        out_a, out_b, out_c = [], [], []
        for s, e in zip(starts[sel], ends[sel]):
            m = int(e - s)
            seg_ids = ids[s:e]
            mat = _blob_matrix(blob_col.slice(s, m))
            # tiled upper-triangle pairwise matmul: O(tile²) peak memory
            for ti in range(0, m, tile):
                a = mat[ti:ti + tile]
                for tj in range(ti, m, tile):
                    sims = a @ mat[tj:tj + tile].T
                    ii, jj = np.nonzero(sims >= thr)
                    pi, pj = ii + ti, jj + tj
                    # position AND id inequality: duplicate ids in the
                    # input (re-ingested embedding) must not emit an
                    # id_a == id_b self-pair (the documented contract;
                    # same guard as embedding_neardup_pairs)
                    keep = (pi < pj) & (seg_ids[pi] != seg_ids[pj])
                    pi, pj, sv = pi[keep], pj[keep], sims[ii, jj][keep]
                    if not len(pi):
                        continue
                    out_a.append(np.minimum(seg_ids[pi], seg_ids[pj]))
                    out_b.append(np.maximum(seg_ids[pi], seg_ids[pj]))
                    out_c.append(sv)
        if not out_a:
            return empty
        return pa.table({
            "id_a": pa.array(np.concatenate(out_a), pa.int64()),
            "id_b": pa.array(np.concatenate(out_b), pa.int64()),
            "cosine": pa.array(np.concatenate(out_c), pa.float64()),
        })

    return assigned.map_batches(
        cell_pairs, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    )


# ── exact k-token-window (passage) overlap ───────────────────────────────────
#
# Document pairs sharing at least one EXACT k-token window — the
# passage-level form of exact substring dedup used for training corpora
# (cf. "Deduplicating Training Data Makes Language Models Better"; the
# reference engine has only whole-page content-hash dedup,
# crawler.py:184-191 — this is the finer-grained extension).
#
# Scale shape: one map emits 128-bit window keys (two independent rolling
# polynomial hashes over per-token blake2b ids — collision odds ~2^-128,
# so no verification pass is needed), one all-to-all on the key
# co-locates buckets, one vectorized block pass emits per-bucket pairs,
# and a final sort on (id_a, id_b) dedupes pairs that share several
# windows.  Shuffle volume is O(windows) 24-byte rows, never text.

_GRAM_P2 = np.uint64(0xC6A4A7935BD1E995)  # second, independent multiplier
_TOKID2_MIX = np.uint64(0xD6E8FEB86659FD93)  # odd → bijective token remap


def _gram_hashes(tok1: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """POSITIONAL (h1, h2) 64-bit key pairs — entry i is the window
    starting at token i (length n-k+1, duplicates kept)."""
    n_out = len(tok1) - k + 1
    if n_out <= 0:
        return np.empty(0, np.uint64), np.empty(0, np.uint64)
    tok2 = tok1 * _TOKID2_MIX
    h1 = tok1[:n_out].copy()
    h2 = tok2[:n_out].copy()
    for j in range(1, k):
        h1 = h1 * _POLY + tok1[j : n_out + j]
        h2 = h2 * _GRAM_P2 + tok2[j : n_out + j]
    return h1, h2


def _gram_keys(tok1: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Unique (h1, h2) 64-bit key pairs for every k-token window."""
    h1, h2 = _gram_hashes(tok1, k)
    n_out = len(h1)
    if n_out == 0:
        return h1, h2
    order = np.lexsort((h2, h1))
    h1, h2 = h1[order], h2[order]
    keep = np.ones(n_out, dtype=bool)
    keep[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
    return h1[keep], h2[keep]


def _gram_key_table(ds, id_column: str, text_column: str, k: int):
    """(h1, h2, id) rows — one per DISTINCT k-token window per doc (the
    :func:`_gram_keys` dedup), shared by :func:`ngram_overlap_pairs` and
    :func:`containment_pairs`."""
    from .textops import TOKEN_RE

    def keys_batch(batch: pa.Table) -> pa.Table:
        ids_in = batch.column(id_column).to_numpy(zero_copy_only=False)
        texts = batch.column(text_column).to_pylist()
        h1s, h2s, ids = [], [], []
        for i, t in enumerate(texts):
            u1 = _word_hashes(TOKEN_RE.findall(t or ""))
            with np.errstate(over="ignore"):
                h1, h2 = _gram_keys(u1, k)
            if len(h1):
                h1s.append(h1)
                h2s.append(h2)
                ids.append(np.full(len(h1), ids_in[i], np.int64))
        if not h1s:
            return pa.table(
                {
                    "h1": pa.array([], pa.uint64()),
                    "h2": pa.array([], pa.uint64()),
                    "id": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "h1": pa.array(np.concatenate(h1s), pa.uint64()),
                "h2": pa.array(np.concatenate(h2s), pa.uint64()),
                "id": pa.array(np.concatenate(ids), pa.int64()),
            }
        )

    return ds.map_batches(keys_batch, batch_format="pyarrow",
                          runtime_env=runtime_env())


def _gram_bucket_pairs(max_bucket: int):
    """Batch fn over a (h1, h2, id)-SORTED gram-key stream: one output
    pair row per (window, unordered doc pair) within each window bucket,
    buckets above ``max_bucket`` skipped (hot-window guard) — the shared
    pair-emission kernel of :func:`ngram_overlap_pairs` (which dedups
    the emissions downstream) and :func:`containment_pairs` (which
    COUNTS them as shared-window counts).  Same factory pattern as
    :func:`_band_block_pairs` — one copy of the size-grouped triu
    gather, so a future fix cannot silently miss a twin."""
    _empty_pairs = pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
    )

    def bucket_pairs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_pairs
        h1 = batch.column("h1").combine_chunks().to_numpy(zero_copy_only=False)
        h2 = batch.column("h2").combine_chunks().to_numpy(zero_copy_only=False)
        ids = batch.column("id").combine_chunks().to_numpy(zero_copy_only=False)
        starts, ends = _run_bounds(h1, h2)
        sizes = ends - starts
        sel = (sizes >= 2) & (sizes <= max_bucket)
        starts, sizes = starts[sel], sizes[sel]
        # fully vectorized pair emission via the shared size-grouped
        # gather (see _size_grouped_index): all same-size buckets become
        # one (R, m) id matrix, row-sorted, one triu gather
        out_a, out_b = [], []
        for m, idx in _size_grouped_index(starts, sizes):
            mat = np.sort(ids[idx], axis=1)
            ii, jj = np.triu_indices(m, 1)
            out_a.append(mat[:, ii].ravel())
            out_b.append(mat[:, jj].ravel())
        if not out_a:
            return _empty_pairs
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a), pa.int64()),
                "id_b": pa.array(np.concatenate(out_b), pa.int64()),
            }
        )

    return bucket_pairs


def ngram_overlap_pairs(
    ds,
    id_column: str = "doc_id",
    text_column: str = "text",
    k: int = 8,
    max_bucket: int = 1024,
    shuffle_partitions: int = None,
):
    """All (id_a < id_b) pairs of docs sharing ≥1 exact k-token window.

    Tokens are whitespace runs (``\\S+`` — same rule as token_counts), so
    the DuckDB oracle is a plain list-slice self-join.  ``max_bucket``
    guards a boilerplate window shared by ~everything from an O(m²) pair
    blowup (guard is deterministic and logged in the docstring contract;
    set it above the corpus size for exact-oracle runs).
    """
    _empty_pairs = pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
    )

    bucket_pairs = _gram_bucket_pairs(max_bucket)

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        # input sorted by (id_a, id_b); equal keys co-locate per sort
        # partition, so first-of-run per block is globally distinct
        if batch.num_rows == 0:
            return _empty_pairs
        a = batch.column("id_a").combine_chunks().to_numpy(zero_copy_only=False)
        b = batch.column("id_b").combine_chunks().to_numpy(zero_copy_only=False)
        keep = np.ones(len(a), dtype=bool)
        keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return batch.filter(pa.array(keep))

    keyed = _gram_key_table(ds, id_column, text_column, k)
    if shuffle_partitions:
        # the sort is O(partitions^2) block exchanges — coalesce a
        # many-tiny-block input before it (the window-key table is ~5x
        # smaller than the text it came from)
        keyed = keyed.repartition(shuffle_partitions)
    pairs = keyed.sort(["h1", "h2"]).map_batches(
        bucket_pairs, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    )
    if shuffle_partitions:
        pairs = pairs.repartition(max(2, shuffle_partitions // 4))
    return pairs.sort(["id_a", "id_b"]).map_batches(
        distinct_pairs, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    )


def quote_span_pairs(
    ds,
    id_column: str = "doc_id",
    text_column: str = "text",
    k: int = 8,
    max_bucket: int = 1024,
    shuffle_partitions: int = None,
):
    """Longest shared token SPAN per overlapping doc pair — the
    contamination-span member of the dedup family: ngram_overlap says
    WHICH pairs share a window and containment says HOW MUCH of each doc
    is shared, this says HOW LONG the longest verbatim quote is (the
    statistic an eval-contamination audit reports: a 9-token overlap is
    a common phrase, a 200-token span is a copied document).  Returns
    ``(id_a, id_b, span_tokens, n_matches)`` with ``span_tokens = k +
    longest_diagonal_run − 1`` (exact longest common token substring ≥ k
    via matched-window diagonals) and ``n_matches`` = matched window
    position pairs.

    Scale shape: positioned gram keys (``_gram_hashes`` — duplicates
    KEPT, position matters) → ONE (h1, h2) sort → in-bucket cross-doc
    occurrence-pair emission (the size-grouped matrix discipline of
    :func:`_gram_bucket_pairs`, positions riding the same per-row id
    argsort; ``max_bucket`` hot-window guard counts OCCURRENCES here) →
    ONE sort on the packed pair key ALONE (equal keys co-locate in one
    block — sorting on a composite could split a pair across blocks,
    the passage_dup_profile lesson) with the in-block (diag, pos)
    lexsort and a vectorized consecutive-run scan.  Two all-to-alls
    total, both at matched-window (not token) cardinality.  Doc ids
    must fit 2³¹ (packed-key envelope, asserted)."""
    from .textops import TOKEN_RE

    _empty_keys = pa.table({
        "h1": pa.array([], pa.uint64()),
        "h2": pa.array([], pa.uint64()),
        "id": pa.array([], pa.int64()),
        "pos": pa.array([], pa.int64()),
    })
    _empty_occ = pa.table({
        "pk": pa.array([], pa.int64()),
        "diag": pa.array([], pa.int64()),
        "pa_": pa.array([], pa.int64()),
    })
    _empty_out = pa.table({
        "id_a": pa.array([], pa.int64()),
        "id_b": pa.array([], pa.int64()),
        "span_tokens": pa.array([], pa.int64()),
        "n_matches": pa.array([], pa.int64()),
    })

    def pos_keys(batch: pa.Table) -> pa.Table:
        ids_in = batch.column(id_column).to_numpy(zero_copy_only=False)
        texts = batch.column(text_column).to_pylist()
        h1s, h2s, ids, poss = [], [], [], []
        for i, t in enumerate(texts):
            u1 = _word_hashes(TOKEN_RE.findall(t or ""))
            with np.errstate(over="ignore"):
                h1, h2 = _gram_hashes(u1, k)
            if len(h1):
                h1s.append(h1)
                h2s.append(h2)
                ids.append(np.full(len(h1), ids_in[i], np.int64))
                poss.append(np.arange(len(h1), dtype=np.int64))
        if not h1s:
            return _empty_keys
        return pa.table({
            "h1": pa.array(np.concatenate(h1s), pa.uint64()),
            "h2": pa.array(np.concatenate(h2s), pa.uint64()),
            "id": pa.array(np.concatenate(ids), pa.int64()),
            "pos": pa.array(np.concatenate(poss), pa.int64()),
        })

    def bucket_occ_pairs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_occ
        h1 = batch.column("h1").combine_chunks().to_numpy(
            zero_copy_only=False)
        h2 = batch.column("h2").combine_chunks().to_numpy(
            zero_copy_only=False)
        ids = batch.column("id").combine_chunks().to_numpy(
            zero_copy_only=False)
        pos = batch.column("pos").combine_chunks().to_numpy(
            zero_copy_only=False)
        assert ids.size == 0 or (ids.min() >= 0 and ids.max() < 2**31)
        starts, ends = _run_bounds(h1, h2)
        sizes = ends - starts
        sel = (sizes >= 2) & (sizes <= max_bucket)
        starts, sizes = starts[sel], sizes[sel]
        out_k, out_d, out_p = [], [], []
        for m, idx in _size_grouped_index(starts, sizes):
            mid = ids[idx]
            mpos = pos[idx]
            row_order = np.argsort(mid, axis=1, kind="stable")
            mid = np.take_along_axis(mid, row_order, axis=1)
            mpos = np.take_along_axis(mpos, row_order, axis=1)
            ii, jj = np.triu_indices(m, 1)
            a, b = mid[:, ii].ravel(), mid[:, jj].ravel()
            pa1, pb1 = mpos[:, ii].ravel(), mpos[:, jj].ravel()
            keep = a != b  # same-doc repeated window: not a pair
            if not keep.any():
                continue
            a, b, pa1, pb1 = a[keep], b[keep], pa1[keep], pb1[keep]
            out_k.append((a << np.int64(31)) | b)
            out_d.append(pa1 - pb1)
            out_p.append(pa1)
        if not out_k:
            return _empty_occ
        return pa.table({
            "pk": pa.array(np.concatenate(out_k), pa.int64()),
            "diag": pa.array(np.concatenate(out_d), pa.int64()),
            "pa_": pa.array(np.concatenate(out_p), pa.int64()),
        })

    def spans(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_out
        pk = batch.column("pk").combine_chunks().to_numpy(
            zero_copy_only=False)
        dg = batch.column("diag").combine_chunks().to_numpy(
            zero_copy_only=False)
        pp = batch.column("pa_").combine_chunks().to_numpy(
            zero_copy_only=False)
        order = np.lexsort((pp, dg, pk))
        pk, dg, pp = pk[order], dg[order], pp[order]
        brk = np.ones(len(pk), bool)
        brk[1:] = ((pk[1:] != pk[:-1]) | (dg[1:] != dg[:-1])
                   | (pp[1:] != pp[:-1] + 1))
        r_starts = np.flatnonzero(brk)
        r_lens = np.diff(np.r_[r_starts, len(pk)])
        r_pk = pk[r_starts]
        # per pair: longest run + total matches (pairs co-locate: the
        # upstream sort is on pk ALONE)
        p_starts = np.flatnonzero(np.r_[True, r_pk[1:] != r_pk[:-1]])
        p_ends = np.r_[p_starts[1:], len(r_pk)]
        max_run = np.maximum.reduceat(r_lens, p_starts)
        n_match = np.add.reduceat(r_lens, p_starts)
        u_pk = r_pk[p_starts]
        assert len(p_ends) == len(p_starts)
        return pa.table({
            "id_a": pa.array(u_pk >> np.int64(31), pa.int64()),
            "id_b": pa.array(u_pk & np.int64((1 << 31) - 1), pa.int64()),
            "span_tokens": pa.array(max_run + (k - 1), pa.int64()),
            "n_matches": pa.array(n_match, pa.int64()),
        })

    keyed = ds.map_batches(pos_keys, batch_format="pyarrow",
                           runtime_env=runtime_env())
    if shuffle_partitions:
        keyed = keyed.repartition(shuffle_partitions)
    occ = keyed.sort(["h1", "h2"]).map_batches(
        bucket_occ_pairs, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env())
    return occ.sort("pk").map_batches(
        spans, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env())


def containment_pairs(
    ds,
    id_column: str = "doc_id",
    text_column: str = "text",
    k: int = 8,
    tau_pct: int = 50,
    max_bucket: int = 1024,
    shuffle_partitions: int = None,
):
    """ASYMMETRIC overlap (containment) pairs: (id_a < id_b) doc pairs
    where the shared distinct k-token windows cover ≥ ``tau_pct`` % of
    EITHER doc's windows — the quote/boilerplate/subset detector that
    Jaccard misses (a page fully quoted inside a much longer page has
    tiny Jaccard but 100% containment one way).  Returns
    ``(id_a, id_b, n_shared, pct_a, pct_b)`` with integer-floor
    percentages (``n_shared·100 // n_windows`` — exact on both engines).

    Scale shape on top of the ngram plan: the per-(pair) shared-window
    counts are a ``grouped_agg`` over the bucketed pair stream (pair
    cardinality, combiner-collapsed); per-doc window counts are a second
    grouped count over the SAME materialized key table (tokenize once —
    the tfidf discipline); both sides attach via the size-gated
    :func:`attach_id_labels` (broadcast below cutoff, hash join above);
    the τ filter is a pure vectorized map."""
    from .agg import grouped_agg

    keyed = _gram_key_table(ds, id_column, text_column, k)
    if shuffle_partitions:
        keyed = keyed.repartition(shuffle_partitions)
    keyed = keyed.materialize()

    w_tbl = grouped_agg(
        keyed.map_batches(
            lambda b: pa.table({"doc_id": b.column("id")}),
            batch_format="pyarrow", runtime_env=runtime_env()),
        ["doc_id"], [("n_grams", "", "count")],
    )

    bucket_pairs = _gram_bucket_pairs(max_bucket)

    pair_stream = keyed.sort(["h1", "h2"]).map_batches(
        bucket_pairs, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    )
    shared = grouped_agg(pair_stream, ["id_a", "id_b"],
                         [("n_shared", "", "count")])
    shared = attach_id_labels(
        shared,
        w_tbl.map_batches(
            lambda b: b.rename_columns(["doc_id", "w_a"]),
            batch_format="pyarrow", runtime_env=runtime_env()),
        id_column="id_a", label_id_column="doc_id", label_column="w_a")
    shared = attach_id_labels(
        shared,
        w_tbl.map_batches(
            lambda b: b.rename_columns(["doc_id", "w_b"]),
            batch_format="pyarrow", runtime_env=runtime_env()),
        id_column="id_b", label_id_column="doc_id", label_column="w_b")

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "n_shared": pa.array([], pa.int64()),
                "pct_a": pa.array([], pa.int64()),
                "pct_b": pa.array([], pa.int64()),
            })
        n = batch.column("n_shared").combine_chunks().to_numpy(
            zero_copy_only=False)
        wa = batch.column("w_a").combine_chunks().to_numpy(
            zero_copy_only=False)
        wb = batch.column("w_b").combine_chunks().to_numpy(
            zero_copy_only=False)
        pct_a = n * 100 // wa
        pct_b = n * 100 // wb
        keep = np.maximum(pct_a, pct_b) >= tau_pct
        return pa.table({
            "id_a": batch.column("id_a").filter(pa.array(keep)),
            "id_b": batch.column("id_b").filter(pa.array(keep)),
            "n_shared": pa.array(n[keep], pa.int64()),
            "pct_a": pa.array(pct_a[keep], pa.int64()),
            "pct_b": pa.array(pct_b[keep], pa.int64()),
        })

    return shared.map_batches(score, batch_format="pyarrow",
                              runtime_env=runtime_env()).sort(
        ["id_a", "id_b"])


_PROF_S1 = np.uint64(0xA24BAED4963EE407)  # per-doc sentinel-key multipliers
_PROF_S2 = np.uint64(0x9FB21C651E98DF25)


def passage_dup_profile(
    ds,
    id_column: str = "doc_id",
    text_column: str = "text",
    k: int = 8,
    shuffle_partitions: int | None = None,
):
    """Per-doc duplicated-passage coverage — for every doc, how many of
    its token positions are covered by at least one exact k-token window
    that also appears in ANOTHER doc.  Returns
    ``(doc_id, tokens_total, tokens_dup)``: the per-document trim/drop
    statistic of exact-substring dedup (the "what fraction of this page
    is boilerplate/copied text" number used to drop or trim docs —
    :func:`ngram_overlap_pairs` says WHICH docs collide; this says HOW
    MUCH of each doc is duplicated).

    Scale shape: one map emits POSITIONAL window keys (duplicates kept —
    coverage needs every start) plus one per-doc sentinel row carrying
    the token count; ONE all-to-all sort on the 128-bit key; the run
    pass marks windows whose run spans ≥2 distinct docs via per-run
    min≠max (two reduceats — O(run) per run with NO pair emission, so a
    boilerplate window shared by millions of docs costs O(m), not O(m²):
    this operator needs no hot-bucket guard); a second, much smaller
    sort on (doc, pos) turns marked window starts into an exact
    interval-union token count (first window k + Σ min(gap, k), one
    cumsum); counts and coverage then merge as a tagged union through
    one per-doc grouped sum.  Shuffle volume is O(windows) fixed-width
    rows — text never moves."""
    from .agg import grouped_agg
    from .textops import TOKEN_RE

    _empty_keys = pa.table({
        "h1": pa.array([], pa.uint64()),
        "h2": pa.array([], pa.uint64()),
        "id": pa.array([], pa.int64()),
        "pos": pa.array([], pa.int32()),
        "n_tok": pa.array([], pa.int32()),
    })

    def keys_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_keys
        ids_in = batch.column(id_column).to_numpy(zero_copy_only=False)
        texts = batch.column(text_column).to_pylist()
        h1s, h2s, ids, poss, ntoks = [], [], [], [], []
        for i, t in enumerate(texts):
            toks = TOKEN_RE.findall(t or "")
            u1 = _word_hashes(toks)
            with np.errstate(over="ignore"):
                h1, h2 = _gram_hashes(u1, k)
                sent1 = np.uint64(ids_in[i]) * _PROF_S1
                sent2 = np.uint64(ids_in[i]) * _PROF_S2
            n_win = len(h1)
            h1s.append(np.append(h1, sent1).astype(np.uint64))
            h2s.append(np.append(h2, sent2).astype(np.uint64))
            ids.append(np.full(n_win + 1, ids_in[i], np.int64))
            poss.append(np.append(np.arange(n_win, dtype=np.int32),
                                  np.int32(-1)))
            ntoks.append(np.append(np.zeros(n_win, np.int32),
                                   np.int32(len(toks))))
        return pa.table({
            "h1": pa.array(np.concatenate(h1s), pa.uint64()),
            "h2": pa.array(np.concatenate(h2s), pa.uint64()),
            "id": pa.array(np.concatenate(ids), pa.int64()),
            "pos": pa.array(np.concatenate(poss), pa.int32()),
            "n_tok": pa.array(np.concatenate(ntoks), pa.int32()),
        })

    keyed = ds.map_batches(
        keys_batch, batch_format="pyarrow", runtime_env=runtime_env()
    )
    if shuffle_partitions:
        keyed = keyed.repartition(shuffle_partitions)
    # materialized ONCE: feeds both the gram sort and the counts filter
    keyed = keyed.materialize()

    _empty_dup = pa.table({
        "id": pa.array([], pa.int64()), "pos": pa.array([], pa.int32()),
    })

    def dup_windows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_dup
        h1 = batch.column("h1").combine_chunks().to_numpy(zero_copy_only=False)
        h2 = batch.column("h2").combine_chunks().to_numpy(zero_copy_only=False)
        ids = batch.column("id").combine_chunks().to_numpy(zero_copy_only=False)
        pos = batch.column("pos").combine_chunks().to_numpy(zero_copy_only=False)
        starts, ends = _run_bounds(h1, h2)
        # ≥2 distinct docs in the run ⟺ per-run min(id) ≠ max(id); the
        # sentinel rows are singleton runs and never qualify
        mins = np.minimum.reduceat(ids, starts)
        maxs = np.maximum.reduceat(ids, starts)
        keep = np.repeat(mins != maxs, ends - starts) & (pos >= 0)
        if not keep.any():
            return _empty_dup
        return pa.table({
            "id": pa.array(ids[keep], pa.int64()),
            "pos": pa.array(pos[keep], pa.int32()),
        })

    dup = keyed.sort(["h1", "h2"]).map_batches(
        dup_windows, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    )
    if shuffle_partitions:
        dup = dup.repartition(max(2, shuffle_partitions // 4))

    _empty_prof = pa.table({
        "doc_id": pa.array([], pa.int64()),
        "tokens_total": pa.array([], pa.int64()),
        "tokens_dup": pa.array([], pa.int64()),
    })

    def cover_batch(batch: pa.Table) -> pa.Table:
        # sorted on id ALONE (a (id, pos) sort key is unique per row, so
        # the range partitioner could split one doc across blocks and
        # each fragment would re-add the first-window k); equal ids
        # co-locate, and pos is ordered with one in-block lexsort
        if batch.num_rows == 0:
            return _empty_prof
        ids = batch.column("id").combine_chunks().to_numpy(zero_copy_only=False)
        pos = batch.column("pos").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.lexsort((pos, ids))
        ids, pos = ids[order], pos[order]
        starts, _ = _run_bounds(ids)
        d = np.zeros(len(ids), np.int64)
        d[starts] = k
        if len(ids) > 1:
            inner = np.minimum(pos[1:] - pos[:-1], k)
            nonstart = np.ones(len(ids), bool)
            nonstart[starts] = False
            idx = np.nonzero(nonstart)[0]
            d[idx] = inner[idx - 1]
        return pa.table({
            "doc_id": pa.array(ids[starts], pa.int64()),
            "tokens_total": pa.array(np.zeros(len(starts), np.int64)),
            "tokens_dup": pa.array(np.add.reduceat(d, starts), pa.int64()),
        })

    covered = dup.sort("id").map_batches(
        cover_batch, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    )

    def tag_counts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_prof
        n = batch.num_rows
        return pa.table({
            "doc_id": batch.column("id"),
            "tokens_total": batch.column("n_tok").cast(pa.int64()),
            "tokens_dup": pa.array(np.zeros(n, np.int64)),
        })

    counts = keyed.filter(expr="pos < 0").map_batches(
        tag_counts, batch_format="pyarrow", runtime_env=runtime_env()
    )
    return grouped_agg(
        counts.union(covered), ["doc_id"],
        [("tokens_total", "tokens_total", "sum"),
         ("tokens_dup", "tokens_dup", "sum")],
    )


def remove_dup_spans(
    ds,
    id_column: str = "doc_id",
    text_column: str = "text",
    k: int = 8,
    shuffle_partitions: int | None = None,
    broadcast_cutoff: int | None = None,
    num_partitions: int = 8,
):
    """Exact-substring dedup as a TRANSFORM (ExactSubstr, Lee et al. 2021
    "Deduplicating Training Data Makes Language Models Better" §4.1,
    public method): every exact ``k``-token window that occurs in ≥2
    distinct docs keeps exactly ONE canonical occurrence — the globally
    first by ``(doc_id, pos)`` — and every OTHER occurrence's token span
    is excised; each doc is rewritten from its surviving tokens.
    :func:`passage_dup_profile` measures how much of each doc is
    duplicated; this is the operator that actually removes it.  Returns
    ``(doc_id, text_clean, tokens_total, tokens_removed)`` for every
    input doc (``text_clean`` is the surviving tokens re-joined with
    single spaces — a token-sequence-level rewrite, whitespace-normalized
    by contract).

    Scale shape: one map emits positional 128-bit window keys; ONE
    all-to-all sort on the key; the run pass marks every non-canonical
    occurrence of a cross-doc gram via per-run min≠max + first-row drop —
    O(run) per run with NO pair emission, so boilerplate shared by
    millions of docs costs O(m), not O(m²); a second much smaller sort on
    the doc id groups marked starts into ONE ``large_binary`` positions
    blob per doc (the acero LIST-payload discipline); the blob table
    attaches back to the docs size-gated — broadcast sorted
    (ids, offsets, positions) arrays below the cutoff, native left-outer
    hash join above (both inputs through ``coalesce_nonempty``) — and the
    rewrite is a pure per-batch map.  Text crosses the wire exactly once
    (the final attach on the join path; never on the broadcast path)."""
    import ray

    from .partition import coalesce_nonempty
    from .textops import TOKEN_RE

    _empty_keys = pa.table({
        "h1": pa.array([], pa.uint64()),
        "h2": pa.array([], pa.uint64()),
        "id": pa.array([], pa.int64()),
        "pos": pa.array([], pa.int32()),
    })

    def keys_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_keys
        ids_in = batch.column(id_column).to_numpy(zero_copy_only=False)
        texts = batch.column(text_column).to_pylist()
        h1s, h2s, ids, poss = [], [], [], []
        for i, t in enumerate(texts):
            toks = TOKEN_RE.findall(t or "")
            u1 = _word_hashes(toks)
            with np.errstate(over="ignore"):
                h1, h2 = _gram_hashes(u1, k)
            n_win = len(h1)
            if n_win == 0:
                continue
            h1s.append(h1)
            h2s.append(h2)
            ids.append(np.full(n_win, ids_in[i], np.int64))
            poss.append(np.arange(n_win, dtype=np.int32))
        if not h1s:
            return _empty_keys
        return pa.table({
            "h1": pa.array(np.concatenate(h1s), pa.uint64()),
            "h2": pa.array(np.concatenate(h2s), pa.uint64()),
            "id": pa.array(np.concatenate(ids), pa.int64()),
            "pos": pa.array(np.concatenate(poss), pa.int32()),
        })

    keyed = ds.map_batches(
        keys_batch, batch_format="pyarrow", runtime_env=runtime_env()
    )
    if shuffle_partitions:
        keyed = keyed.repartition(shuffle_partitions)

    _empty_marked = pa.table({
        "id": pa.array([], pa.int64()), "pos": pa.array([], pa.int32()),
    })

    def marked_occurrences(batch: pa.Table) -> pa.Table:
        # sorted globally on (h1, h2) — the FULL run key, so equal keys
        # co-locate in one block; the in-block lexsort adds (id, pos)
        # order so the first row of each run IS the global canonical
        if batch.num_rows == 0:
            return _empty_marked
        h1 = batch.column("h1").combine_chunks().to_numpy(zero_copy_only=False)
        h2 = batch.column("h2").combine_chunks().to_numpy(zero_copy_only=False)
        ids = batch.column("id").combine_chunks().to_numpy(zero_copy_only=False)
        pos = batch.column("pos").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, ids, h2, h1))
        h1, h2, ids, pos = h1[order], h2[order], ids[order], pos[order]
        starts, ends = _run_bounds(h1, h2)
        cross = (np.minimum.reduceat(ids, starts)
                 != np.maximum.reduceat(ids, starts))
        keep = np.repeat(cross, ends - starts)
        keep[starts] = False          # canonical first occurrence survives
        if not keep.any():
            return _empty_marked
        return pa.table({
            "id": pa.array(ids[keep], pa.int64()),
            "pos": pa.array(pos[keep], pa.int32()),
        })

    marked = keyed.sort(["h1", "h2"]).map_batches(
        marked_occurrences, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    )
    if shuffle_partitions:
        marked = marked.repartition(max(2, shuffle_partitions // 4))

    _empty_blob = pa.table({
        "__span_id": pa.array([], pa.int64()),
        "__span_pos": pa.array([], pa.large_binary()),
    })

    def blob_batch(batch: pa.Table) -> pa.Table:
        # single-key id sort ⇒ each doc's marked rows land in one block;
        # pos ordered by an in-block lexsort (the passage_dup_profile rule)
        if batch.num_rows == 0:
            return _empty_blob
        ids = batch.column("id").combine_chunks().to_numpy(zero_copy_only=False)
        pos = batch.column("pos").combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, ids))
        ids, pos = ids[order], pos[order]
        starts, ends = _run_bounds(ids)
        return pa.table({
            "__span_id": pa.array(ids[starts], pa.int64()),
            "__span_pos": pa.array(
                [pos[s:e].astype("<i4").tobytes()
                 for s, e in zip(starts, ends)], pa.large_binary()),
        })

    def _rewrite_rows(ids_np, texts, pos_arrays):
        out_clean, out_total, out_removed = [], [], []
        for t, p in zip(texts, pos_arrays):
            toks = TOKEN_RE.findall(t or "")
            n = len(toks)
            if p is None or len(p) == 0:
                out_clean.append(" ".join(toks))
                out_total.append(n)
                out_removed.append(0)
                continue
            diff = np.zeros(n + 1, np.int32)
            np.add.at(diff, p, 1)
            np.add.at(diff, np.minimum(p.astype(np.int64) + k, n), -1)
            covered = np.cumsum(diff[:n]) > 0
            out_clean.append(
                " ".join(w for w, c in zip(toks, covered) if not c))
            out_total.append(n)
            out_removed.append(int(covered.sum()))
        return pa.table({
            "doc_id": pa.array(ids_np, pa.int64()),
            "text_clean": pa.array(out_clean, pa.string()),
            "tokens_total": pa.array(out_total, pa.int64()),
            "tokens_removed": pa.array(out_removed, pa.int64()),
        })

    _empty_out = _rewrite_rows(np.empty(0, np.int64), [], [])

    # single-key id sort ⇒ ONE blob row per doc (equal ids co-locate;
    # a (id, pos) composite key could split a doc across blocks)
    blob_nz = coalesce_nonempty(marked.sort("id").map_batches(
        blob_batch, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env()))

    cutoff = (SUBTRACT_BROADCAST_CUTOFF if broadcast_cutoff is None
              else broadcast_cutoff)
    if blob_nz is None or blob_nz.count() <= cutoff:
        if blob_nz is None:
            ref = ray.put((np.empty(0, np.int64),
                           np.zeros(1, np.int64), np.empty(0, np.int32)))
        else:
            tbls = ray.get(blob_nz.to_arrow_refs())
            sids, blobs = [], []
            for t in tbls:
                if t.num_rows:
                    sids.append(t.column("__span_id").combine_chunks()
                                .to_numpy(zero_copy_only=False))
                    blobs.extend(t.column("__span_pos").to_pylist())
            sids = (np.concatenate(sids) if sids else np.empty(0, np.int64))
            order = np.argsort(sids, kind="stable")
            sids = sids[order]
            pos_all = [np.frombuffer(blobs[j], dtype="<i4") for j in order]
            offsets = np.zeros(len(pos_all) + 1, np.int64)
            if pos_all:
                offsets[1:] = np.cumsum([len(p) for p in pos_all])
                pos_cat = (np.concatenate(pos_all) if offsets[-1]
                           else np.empty(0, np.int32))
            else:
                pos_cat = np.empty(0, np.int32)
            ref = ray.put((sids, offsets, pos_cat))

        def rewrite_bcast(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _empty_out
            sids, offsets, pos_cat = cached_get(ref)
            bids = batch.column(id_column).combine_chunks().to_numpy(
                zero_copy_only=False)
            texts = batch.column(text_column).to_pylist()
            if len(sids):
                loc = np.searchsorted(sids, bids)
                loc[loc == len(sids)] = 0
                hit = sids[loc] == bids
            else:
                loc = np.zeros(len(bids), np.int64)
                hit = np.zeros(len(bids), bool)
            pos_arrays = [
                (pos_cat[offsets[j]:offsets[j + 1]] if h else None)
                for j, h in zip(loc, hit)]
            return _rewrite_rows(bids, texts, pos_arrays)

        return ds.map_batches(rewrite_bcast, batch_format="pyarrow",
                              runtime_env=runtime_env())

    ds_nz = coalesce_nonempty(ds.select_columns([id_column, text_column]))
    if ds_nz is None:
        return ds.limit(0).map_batches(
            lambda b: _empty_out, batch_format="pyarrow",
            runtime_env=runtime_env())
    joined = ds_nz.join(
        blob_nz, "left_outer", num_partitions=num_partitions,
        on=(id_column,), right_on=("__span_id",),
    )

    def rewrite_joined(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_out
        bids = batch.column(id_column).combine_chunks().to_numpy(
            zero_copy_only=False)
        texts = batch.column(text_column).to_pylist()
        blobs = batch.column("__span_pos").to_pylist()
        pos_arrays = [
            (np.frombuffer(b, dtype="<i4") if b is not None else None)
            for b in blobs]
        return _rewrite_rows(bids, texts, pos_arrays)

    return joined.map_batches(rewrite_joined, batch_format="pyarrow",
                              runtime_env=runtime_env())


# ── persistent exact-dedup index (build once, probe per delta batch) ─────────


def _fp60_batch(texts) -> np.ndarray:
    """60-bit md5 text fingerprints as int64 — THE engine/DuckDB parity
    hash (``CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT)``)."""
    import hashlib

    return np.asarray(
        [int(hashlib.md5((t or "").encode()).hexdigest()[:15], 16)
         for t in texts], dtype=np.int64)


def dedup_index_build(ds, index_dir: str, id_column: str = "doc_id",
                      text_column: str = "text",
                      n_buckets: int = 16) -> dict:
    """Persist the corpus content-fingerprint index so later delta
    batches dedup against 100 TB WITHOUT re-reading it: one
    ``(fp, base_doc_id)`` row per doc, hash-BUCKETED by fingerprint via
    :func:`~deepwebharvester_ray.sinks.write_bucketed_parquet` — the
    build-once/probe-many contract the persistent ANN index follows
    (``functions/ann.py``), applied to exact dedup.  A probe touches
    only the bucket directories its delta fingerprints hash into."""
    from ..sinks import write_bucketed_parquet

    def fp_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).combine_chunks().to_numpy(
            zero_copy_only=False)
        return pa.table({
            "fp": pa.array(_fp60_batch(batch.column(text_column).to_pylist()),
                           pa.int64()),
            "base_doc_id": pa.array(ids, pa.int64()),
        })

    fp_ds = ds.map_batches(fp_batch, batch_format="pyarrow",
                           runtime_env=runtime_env())
    return write_bucketed_parquet(fp_ds, index_dir, key="fp",
                                  n_buckets=n_buckets)


def dedup_index_probe(delta_ds, index_dir: str, id_column: str = "doc_id",
                      text_column: str = "text",
                      broadcast_cutoff: int | None = None,
                      num_partitions: int = 8):
    """Dedup a delta batch against a PREBUILT corpus fingerprint index:
    returns ``(doc_id, is_dup, base_doc_id)`` per delta doc
    (``base_doc_id`` = MIN base id sharing the fingerprint, ``-1`` when
    new; delta-internal duplicates are NOT folded — the incremental
    contract dedups against the corpus, the delta itself then joins it).

    Scale shape: delta fingerprints materialize ONCE (feeds the bucket
    census and the final attach); the census is a per-block distinct-
    bucket map pulled to the driver (≤ blocks × n_buckets rows); ONLY
    the touched bucket directories are read back — the probe's I/O is
    delta-proportional, never index-proportional.  Membership is
    size-gated on the DELTA (the small side by construction): below the
    cutoff its sorted fingerprint array broadcasts and a vectorized
    searchsorted filter prunes index rows map-side before a combiner
    grouped-MIN at matched-fingerprint cardinality; above it, native
    hash joins keep everything off the driver."""
    import glob as _glob
    import os

    import ray

    from ..sinks import _shard_of
    from .agg import grouped_agg
    from .partition import coalesce_nonempty

    _empty_out = pa.table({
        "doc_id": pa.array([], pa.int64()),
        "is_dup": pa.array([], pa.int64()),
        "base_doc_id": pa.array([], pa.int64()),
    })

    n_buckets = len(_glob.glob(os.path.join(index_dir, "bucket=*")))
    if n_buckets == 0:
        raise FileNotFoundError(
            f"dedup_index_probe: no bucket=* directories under "
            f"{index_dir} — run dedup_index_build first")

    def fp_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).combine_chunks().to_numpy(
            zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "fp": pa.array(_fp60_batch(batch.column(text_column).to_pylist()),
                           pa.int64()),
        })

    fp_ds = delta_ds.map_batches(fp_batch, batch_format="pyarrow",
                                 runtime_env=runtime_env()).materialize()

    def block_buckets(batch: pa.Table) -> pa.Table:
        fps = batch.column("fp").combine_chunks().to_numpy(
            zero_copy_only=False)
        return pa.table({"bucket": pa.array(
            np.unique(_shard_of(fps, n_buckets)), pa.int64())})

    touched = sorted({r["bucket"] for r in fp_ds.map_batches(
        block_buckets, batch_format="pyarrow",
        runtime_env=runtime_env()).take_all()})
    touched_dirs = [d for d in
                    (os.path.join(index_dir, f"bucket={b}") for b in touched)
                    if os.path.isdir(d)]
    if not touched_dirs:
        return fp_ds.map_batches(
            lambda b: pa.table({
                "doc_id": b.column("doc_id"),
                "is_dup": pa.array(np.zeros(b.num_rows, np.int64)),
                "base_doc_id": pa.array(np.full(b.num_rows, -1, np.int64)),
            }), batch_format="pyarrow", runtime_env=runtime_env())

    touched_files = sorted(
        f for d in touched_dirs
        for f in _glob.glob(os.path.join(d, "*.parquet")))
    base = ray.data.read_parquet(touched_files, columns=["fp", "base_doc_id"])
    cutoff = (SUBTRACT_BROADCAST_CUTOFF if broadcast_cutoff is None
              else broadcast_cutoff)

    if fp_ds.count() <= cutoff:
        tbls = ray.get(fp_ds.to_arrow_refs())
        probe_fps = np.unique(np.concatenate(
            [t.column("fp").combine_chunks().to_numpy(zero_copy_only=False)
             for t in tbls if t.num_rows] or [np.empty(0, np.int64)]))
        pref = ray.put(probe_fps)

        def hit_filter(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            pf = cached_get(pref)
            fps = batch.column("fp").combine_chunks().to_numpy(
                zero_copy_only=False)
            if not len(pf):
                return batch.slice(0, 0)
            loc = np.searchsorted(pf, fps)
            loc[loc == len(pf)] = 0
            return batch.filter(pa.array(pf[loc] == fps))

        matched = grouped_agg(
            base.map_batches(hit_filter, batch_format="pyarrow",
                             runtime_env=runtime_env()),
            ["fp"], [("base_doc_id", "base_doc_id", "min")])
        mtbls = ray.get(matched.to_arrow_refs())
        mfp, mid = [], []
        for t in mtbls:
            if t.num_rows:
                mfp.append(t.column("fp").combine_chunks().to_numpy(
                    zero_copy_only=False))
                mid.append(t.column("base_doc_id").combine_chunks().to_numpy(
                    zero_copy_only=False))
        mfp = np.concatenate(mfp) if mfp else np.empty(0, np.int64)
        mid = np.concatenate(mid) if mid else np.empty(0, np.int64)
        order = np.argsort(mfp, kind="stable")
        mref = ray.put((mfp[order], mid[order]))

        def attach(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _empty_out
            sfp, sid = cached_get(mref)
            fps = batch.column("fp").combine_chunks().to_numpy(
                zero_copy_only=False)
            if len(sfp):
                loc = np.searchsorted(sfp, fps)
                loc[loc == len(sfp)] = 0
                hit = sfp[loc] == fps
            else:
                loc = np.zeros(len(fps), np.int64)
                hit = np.zeros(len(fps), bool)
            return pa.table({
                "doc_id": batch.column("doc_id"),
                "is_dup": pa.array(hit.astype(np.int64), pa.int64()),
                "base_doc_id": pa.array(
                    np.where(hit, sid[loc], np.int64(-1)), pa.int64()),
            })

        return fp_ds.map_batches(attach, batch_format="pyarrow",
                                 runtime_env=runtime_env())

    # delta above the cutoff: native hash joins, nothing driver-resident
    base_nz = coalesce_nonempty(base)
    fp_nz = coalesce_nonempty(fp_ds)
    if fp_nz is None:
        return ray.data.from_arrow(_empty_out)
    probe_keys = grouped_agg(fp_nz.map_batches(
        lambda b: pa.table({"__p_fp": b.column("fp")}),
        batch_format="pyarrow", runtime_env=runtime_env()),
        ["__p_fp"], [("__n", "", "count")])
    if base_nz is not None:
        hits = base_nz.join(
            coalesce_nonempty(probe_keys), "inner",
            num_partitions=num_partitions,
            on=("fp",), right_on=("__p_fp",))
        matched = grouped_agg(hits, ["fp"],
                              [("base_doc_id", "base_doc_id", "min")])
        matched = coalesce_nonempty(matched.map_batches(
            lambda b: pa.table({"__m_fp": b.column("fp"),
                                "__m_id": b.column("base_doc_id")}),
            batch_format="pyarrow", runtime_env=runtime_env()))
    else:
        matched = None
    if matched is None:
        return fp_nz.map_batches(
            lambda b: pa.table({
                "doc_id": b.column("doc_id"),
                "is_dup": pa.array(np.zeros(b.num_rows, np.int64)),
                "base_doc_id": pa.array(np.full(b.num_rows, -1, np.int64)),
            }), batch_format="pyarrow", runtime_env=runtime_env())
    joined = fp_nz.join(matched, "left_outer",
                        num_partitions=num_partitions,
                        on=("fp",), right_on=("__m_fp",))

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_out
        mid = batch.column("__m_id").combine_chunks().to_numpy(
            zero_copy_only=False)
        if mid.dtype.kind == "f":     # nulls present → float64 + NaN
            hit = ~np.isnan(mid)
            mid_i = np.where(hit, np.nan_to_num(mid), -1.0).astype(np.int64)
        else:                         # no nulls in this block → all hits
            hit = np.ones(len(mid), bool)
            mid_i = mid.astype(np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "is_dup": pa.array(hit.astype(np.int64), pa.int64()),
            "base_doc_id": pa.array(mid_i, pa.int64()),
        })

    return joined.map_batches(finish, batch_format="pyarrow",
                              runtime_env=runtime_env())


# ── size-gated id anti-filter (corpus purge) ─────────────────────────────────

# Below this many drop-ids the anti-filter broadcasts one sorted uint64
# array (searchsorted membership inside map tasks — no shuffle at all);
# above it, a distributed left-outer hash join + null filter keeps the
# drop set off the driver entirely.  Mirrors VERIFY_BROADCAST_CUTOFF's
# measured-size gating.
SUBTRACT_BROADCAST_CUTOFF = 2_000_000


def subtract_ids(ds, drop_ds, id_column: str = "doc_id",
                 drop_column: str = "doc_id",
                 broadcast_cutoff: int | None = None,
                 num_partitions: int = 8):
    """``ds`` minus rows whose ``id_column`` appears in ``drop_ds`` —
    the distributed anti-join every dedup pipeline ends with (drop the
    non-canonical cluster members, keep the corpus).

    Size-gated on the MEASURED drop count: a dedup drop-set is usually a
    sliver of the corpus (broadcast as a sorted int64 array, vectorized
    ``searchsorted`` membership per batch), but a dup-heavy raw crawl can
    shed half its rows — beyond the cutoff a left-outer hash join with a
    marker column does the same subtraction with nothing driver-resident."""
    import ray

    from .partition import coalesce_nonempty

    drop_nz = coalesce_nonempty(drop_ds.select_columns([drop_column]))
    if drop_nz is None:
        return ds
    cutoff = (SUBTRACT_BROADCAST_CUTOFF if broadcast_cutoff is None
              else broadcast_cutoff)
    if drop_nz.count() <= cutoff:
        drop_tbls = ray.get(drop_nz.to_arrow_refs())
        drop_ids = np.unique(np.concatenate(
            [t.column(drop_column).combine_chunks().to_numpy(zero_copy_only=False)
             for t in drop_tbls if t.num_rows] or [np.empty(0, np.int64)]))
        ref = ray.put(drop_ids)

        def anti(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            wanted = cached_get(ref)
            ids = batch.column(id_column).combine_chunks().to_numpy(
                zero_copy_only=False)
            pos = np.searchsorted(wanted, ids)
            pos[pos == len(wanted)] = 0
            hit = (len(wanted) > 0) & (wanted[pos] == ids)
            return batch.filter(pa.array(~hit))

        return ds.map_batches(anti, batch_format="pyarrow",
                              runtime_env=runtime_env())

    marker = drop_nz.map_batches(
        lambda b: pa.table({
            "__drop_id": b.column(drop_column),
            "__drop_mark": pa.array(np.ones(b.num_rows, np.int8)),
        }),
        batch_format="pyarrow", runtime_env=runtime_env(),
    )
    ds_nz = coalesce_nonempty(ds)
    if ds_nz is None:
        return ds
    joined = ds_nz.join(
        marker, "left_outer", num_partitions=num_partitions,
        on=(id_column,), right_on=("__drop_id",),
    )

    def keep_unmatched(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mark = batch.column("__drop_mark")
        keep = pc.is_null(mark)
        cols = [c for c in batch.column_names
                if c not in ("__drop_mark", "__drop_id")]
        return batch.filter(keep).select(cols)

    return joined.map_batches(keep_unmatched, batch_format="pyarrow",
                              runtime_env=runtime_env())


def semi_join_ids(ds, keep_ds, id_column: str = "doc_id",
                  keep_column: str = "doc_id",
                  broadcast_cutoff: int | None = None,
                  num_partitions: int = 8):
    """``ds`` restricted to rows whose ``id_column`` appears in
    ``keep_ds`` — the distributed SEMI-join (EXISTS), complementing
    :func:`subtract_ids`'s anti-join with the identical size gate:
    below the measured key count the keep-set broadcasts as a sorted
    int64 array (vectorized searchsorted membership, zero shuffle of
    ``ds``); above it, an inner hash join against the DEDUPLICATED key
    set — keys only, never the probe payload twice (a raw inner join
    against a non-distinct right side would duplicate matching rows)."""
    import ray

    from .agg import grouped_agg
    from .partition import coalesce_nonempty

    keep_nz = coalesce_nonempty(keep_ds.select_columns([keep_column]))
    if keep_nz is None:
        return ds.limit(0)
    cutoff = (SUBTRACT_BROADCAST_CUTOFF if broadcast_cutoff is None
              else broadcast_cutoff)
    if keep_nz.count() <= cutoff:
        keep_tbls = ray.get(keep_nz.to_arrow_refs())
        keep_ids = np.unique(np.concatenate(
            [t.column(keep_column).combine_chunks().to_numpy(
                zero_copy_only=False)
             for t in keep_tbls if t.num_rows] or [np.empty(0, np.int64)]))
        ref = ray.put(keep_ids)

        def semi(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            wanted = cached_get(ref)
            ids = batch.column(id_column).combine_chunks().to_numpy(
                zero_copy_only=False)
            if not len(wanted):
                return batch.slice(0, 0)
            pos = np.searchsorted(wanted, ids)
            pos[pos == len(wanted)] = 0
            return batch.filter(pa.array(wanted[pos] == ids))

        return ds.map_batches(semi, batch_format="pyarrow",
                              runtime_env=runtime_env())

    # distinct keys first: a semi-join must not duplicate probe rows
    distinct = grouped_agg(
        keep_nz.map_batches(
            lambda b: pa.table({"__keep_id": b.column(keep_column)}),
            batch_format="pyarrow", runtime_env=runtime_env(),
        ),
        ["__keep_id"], [("__n", "", "count")],
    ).select_columns(["__keep_id"])
    ds_nz = coalesce_nonempty(ds)
    distinct_nz = coalesce_nonempty(distinct)
    if ds_nz is None or distinct_nz is None:
        return ds.limit(0)
    joined = ds_nz.join(
        distinct_nz, "inner", num_partitions=num_partitions,
        on=(id_column,), right_on=("__keep_id",),
    )

    def drop_marker(batch: pa.Table) -> pa.Table:
        return batch.select(
            [c for c in batch.column_names if c != "__keep_id"]
        )

    return joined.map_batches(drop_marker, batch_format="pyarrow",
                              runtime_env=runtime_env())


def attach_id_labels(ds, labels_ds, id_column: str = "doc_id",
                     label_id_column: str = "doc_id",
                     label_column: str = "cluster_id",
                     broadcast_cutoff: int | None = None,
                     num_partitions: int = 8):
    """Inner-attach one int64 label per id: rows of ``ds`` whose
    ``id_column`` appears in ``labels_ds`` come back with ``label_column``
    appended; unlabeled rows are dropped (inner semantics).  ``labels_ds``
    must be UNIQUE on its id (one label per id — e.g. connected-component
    output), so the attach never duplicates probe rows.

    Same size gate as :func:`subtract_ids` / :func:`semi_join_ids`: a
    label table below the cutoff broadcasts as a PAIR of aligned sorted
    arrays (ids, labels) probed with vectorized ``searchsorted`` — zero
    shuffle of ``ds``; above it, the native hash join on the
    high-cardinality id key with both inputs routed through
    ``coalesce_nonempty`` (CLAUDE.md empty-block join rule)."""
    import ray

    from .partition import coalesce_nonempty

    lab_nz = coalesce_nonempty(
        labels_ds.select_columns([label_id_column, label_column]))
    if lab_nz is None:
        return ds.limit(0)
    cutoff = (SUBTRACT_BROADCAST_CUTOFF if broadcast_cutoff is None
              else broadcast_cutoff)
    if lab_nz.count() <= cutoff:
        tbls = ray.get(lab_nz.to_arrow_refs())
        ids = np.concatenate(
            [t.column(label_id_column).combine_chunks().to_numpy(
                zero_copy_only=False) for t in tbls if t.num_rows]
            or [np.empty(0, np.int64)])
        labs = np.concatenate(
            [t.column(label_column).combine_chunks().to_numpy(
                zero_copy_only=False) for t in tbls if t.num_rows]
            or [np.empty(0, np.int64)])
        order = np.argsort(ids, kind="stable")
        ref = ray.put((ids[order], labs[order]))

        def attach(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch.append_column(
                    label_column, pa.array([], pa.int64()))
            sids, slabs = cached_get(ref)
            bids = batch.column(id_column).combine_chunks().to_numpy(
                zero_copy_only=False)
            if not len(sids):
                return batch.slice(0, 0).append_column(
                    label_column, pa.array([], pa.int64()))
            pos = np.searchsorted(sids, bids)
            pos[pos == len(sids)] = 0
            hit = sids[pos] == bids
            out = batch.filter(pa.array(hit))
            return out.append_column(
                label_column, pa.array(slabs[pos[hit]], pa.int64()))

        return ds.map_batches(attach, batch_format="pyarrow",
                              runtime_env=runtime_env())

    marker = lab_nz.map_batches(
        lambda b: pa.table({
            "__lab_id": b.column(label_id_column),
            label_column: b.column(label_column),
        }),
        batch_format="pyarrow", runtime_env=runtime_env(),
    )
    ds_nz = coalesce_nonempty(ds)
    if ds_nz is None:
        return ds.limit(0)
    joined = ds_nz.join(
        marker, "inner", num_partitions=num_partitions,
        on=(id_column,), right_on=("__lab_id",),
    )
    return joined.map_batches(
        lambda b: b.select(
            [c for c in b.column_names if c != "__lab_id"]),
        batch_format="pyarrow", runtime_env=runtime_env())


# ── benchmark decontamination screen ─────────────────────────────────────────


def contaminated_ids(
    corpus_ds,
    bench_ds,
    id_column: str = "doc_id",
    text_column: str = "text",
    k: int = 8,
    shuffle_partitions: int | None = None,
):
    """Ids of corpus docs sharing ≥1 exact k-token window with ANY
    benchmark doc — the GPT-3/PaLM-style eval-set decontamination screen
    run before training (Brown et al. 2020 §C; public method).

    Scale shape: ONE all-to-all (the (h1, h2) gram-key sort over the
    tagged union of corpus + benchmark windows), then per-sort-partition
    run scans — no join, no driver state.  Within a key run, rows are
    emitted iff the run contains a benchmark row (vectorized
    ``np.add.reduceat`` over the bench flags, ``np.repeat`` row mask).
    Window keys are the same 128-bit rule as :func:`ngram_overlap_pairs`
    (collision-free in practice; the oracle treats them as exact).  The
    benchmark side is typically a sliver, but nothing here requires it —
    both sides stream through the same sort."""
    from .textops import TOKEN_RE

    def keyer(bench_flag: int):
        def keys_batch(batch: pa.Table) -> pa.Table:
            ids_in = batch.column(id_column).to_numpy(zero_copy_only=False)
            texts = batch.column(text_column).to_pylist()
            h1s, h2s, ids = [], [], []
            for i, t in enumerate(texts):
                u1 = _word_hashes(TOKEN_RE.findall(t or ""))
                with np.errstate(over="ignore"):
                    h1, h2 = _gram_keys(u1, k)
                if len(h1):
                    h1s.append(h1)
                    h2s.append(h2)
                    ids.append(np.full(len(h1), ids_in[i], np.int64))
            if not h1s:
                h1s = [np.empty(0, np.uint64)]
                h2s = [np.empty(0, np.uint64)]
                ids = [np.empty(0, np.int64)]
            n = sum(len(x) for x in ids)
            return pa.table(
                {
                    "h1": pa.array(np.concatenate(h1s), pa.uint64()),
                    "h2": pa.array(np.concatenate(h2s), pa.uint64()),
                    "id": pa.array(np.concatenate(ids), pa.int64()),
                    "bench": pa.array(
                        np.full(n, bench_flag, np.int8), pa.int8()),
                }
            )

        return keys_batch

    _empty_ids = pa.table({id_column: pa.array([], pa.int64())})

    def run_scan(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_ids
        h1 = batch.column("h1").combine_chunks().to_numpy(zero_copy_only=False)
        h2 = batch.column("h2").combine_chunks().to_numpy(zero_copy_only=False)
        ids = batch.column("id").combine_chunks().to_numpy(zero_copy_only=False)
        bench = batch.column("bench").combine_chunks().to_numpy(
            zero_copy_only=False)
        starts, ends = _run_bounds(h1, h2)
        has_bench = np.add.reduceat(bench, starts) > 0
        row_hit = np.repeat(has_bench, ends - starts)
        out = np.unique(ids[row_hit & (bench == 0)])
        return pa.table({id_column: pa.array(out, pa.int64())})

    def distinct_ids(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_ids
        a = batch.column(id_column).combine_chunks().to_numpy(
            zero_copy_only=False)
        keep = np.ones(len(a), dtype=bool)
        keep[1:] = a[1:] != a[:-1]
        return batch.filter(pa.array(keep))

    keyed = corpus_ds.map_batches(
        keyer(0), batch_format="pyarrow", runtime_env=runtime_env()
    ).union(bench_ds.map_batches(
        keyer(1), batch_format="pyarrow", runtime_env=runtime_env()
    ))
    if shuffle_partitions:
        keyed = keyed.repartition(shuffle_partitions)
    hits = keyed.sort(["h1", "h2"]).map_batches(
        run_scan, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    )
    if shuffle_partitions:
        hits = hits.repartition(max(2, shuffle_partitions // 4))
    return hits.sort(id_column).map_batches(
        distinct_ids, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    )


def contamination_profile(
    corpus_ds,
    bench_ds,
    id_column: str = "doc_id",
    text_column: str = "text",
    k: int = 8,
    shuffle_partitions: int | None = None,
):
    """Per-BENCHMARK-doc token-level contamination fraction (the Llama 2
    decontamination rule, Touvron et al. 2023 §A.6 — public method): for
    every benchmark doc, how many of its token positions are covered by
    at least one exact ``k``-token window that also appears ANYWHERE in
    the training corpus.  :func:`contaminated_ids` answers the binary
    screen (which corpus docs touch the eval set); this grades each EVAL
    item — the number reported as "% clean / % contaminated" in model
    cards, where an item is flagged once its covered fraction crosses a
    threshold.  Returns ``(doc_id, tokens_total, tokens_contaminated)``
    for every bench doc.

    Scale shape: :func:`passage_dup_profile`'s plan with a side flag —
    positional window keys for the bench side (+ one per-doc sentinel
    carrying the token count), positionless keys for the corpus side;
    ONE all-to-all sort on the 128-bit gram key; the run pass emits
    bench positions in runs containing ≥1 corpus row (O(run), no pair
    emission — corpus boilerplate costs O(m)); a second, bench-sized
    sort turns marked starts into the exact interval-union coverage.
    Shuffle volume is O(windows) fixed-width rows — text never moves."""
    from .agg import grouped_agg
    from .textops import TOKEN_RE

    _empty_keys = pa.table({
        "h1": pa.array([], pa.uint64()),
        "h2": pa.array([], pa.uint64()),
        "id": pa.array([], pa.int64()),
        "pos": pa.array([], pa.int32()),
        "n_tok": pa.array([], pa.int32()),
        "bench": pa.array([], pa.int8()),
    })

    def keyer(bench_flag: int):
        def keys_batch(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _empty_keys
            ids_in = batch.column(id_column).to_numpy(zero_copy_only=False)
            texts = batch.column(text_column).to_pylist()
            h1s, h2s, ids, poss, ntoks = [], [], [], [], []
            for i, t in enumerate(texts):
                toks = TOKEN_RE.findall(t or "")
                u1 = _word_hashes(toks)
                with np.errstate(over="ignore"):
                    h1, h2 = _gram_hashes(u1, k)
                    sent1 = np.uint64(ids_in[i]) * _PROF_S1
                    sent2 = np.uint64(ids_in[i]) * _PROF_S2
                n_win = len(h1)
                if bench_flag:
                    # sentinel row carries the token count (singleton
                    # run: never marks)
                    h1s.append(np.append(h1, sent1).astype(np.uint64))
                    h2s.append(np.append(h2, sent2).astype(np.uint64))
                    ids.append(np.full(n_win + 1, ids_in[i], np.int64))
                    poss.append(np.append(
                        np.arange(n_win, dtype=np.int32), np.int32(-1)))
                    ntoks.append(np.append(np.zeros(n_win, np.int32),
                                           np.int32(len(toks))))
                elif n_win:
                    h1s.append(h1)
                    h2s.append(h2)
                    ids.append(np.full(n_win, ids_in[i], np.int64))
                    poss.append(np.zeros(n_win, np.int32))
                    ntoks.append(np.zeros(n_win, np.int32))
            if not h1s:
                return _empty_keys
            n = sum(len(a) for a in h1s)
            return pa.table({
                "h1": pa.array(np.concatenate(h1s), pa.uint64()),
                "h2": pa.array(np.concatenate(h2s), pa.uint64()),
                "id": pa.array(np.concatenate(ids), pa.int64()),
                "pos": pa.array(np.concatenate(poss), pa.int32()),
                "n_tok": pa.array(np.concatenate(ntoks), pa.int32()),
                "bench": pa.array(
                    np.full(n, bench_flag, np.int8), pa.int8()),
            })

        return keys_batch

    keyed = corpus_ds.map_batches(
        keyer(0), batch_format="pyarrow", runtime_env=runtime_env()
    ).union(bench_ds.map_batches(
        keyer(1), batch_format="pyarrow", runtime_env=runtime_env()))
    if shuffle_partitions:
        keyed = keyed.repartition(shuffle_partitions)
    # materialized ONCE: feeds both the gram sort and the counts filter
    keyed = keyed.materialize()

    _empty_dup = pa.table({
        "id": pa.array([], pa.int64()), "pos": pa.array([], pa.int32()),
    })

    def hit_windows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_dup
        h1 = batch.column("h1").combine_chunks().to_numpy(zero_copy_only=False)
        h2 = batch.column("h2").combine_chunks().to_numpy(zero_copy_only=False)
        ids = batch.column("id").combine_chunks().to_numpy(zero_copy_only=False)
        pos = batch.column("pos").combine_chunks().to_numpy(zero_copy_only=False)
        bench = batch.column("bench").combine_chunks().to_numpy(
            zero_copy_only=False)
        starts, ends = _run_bounds(h1, h2)
        # run contains ≥1 corpus row ⟺ per-run min(bench) == 0; the
        # sentinel rows are singleton bench runs and never qualify
        has_corpus = np.minimum.reduceat(bench, starts) == 0
        keep = (np.repeat(has_corpus, ends - starts)
                & (bench == 1) & (pos >= 0))
        if not keep.any():
            return _empty_dup
        return pa.table({
            "id": pa.array(ids[keep], pa.int64()),
            "pos": pa.array(pos[keep], pa.int32()),
        })

    hits = keyed.sort(["h1", "h2"]).map_batches(
        hit_windows, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    )
    if shuffle_partitions:
        hits = hits.repartition(max(2, shuffle_partitions // 4))

    _empty_prof = pa.table({
        "doc_id": pa.array([], pa.int64()),
        "tokens_total": pa.array([], pa.int64()),
        "tokens_contaminated": pa.array([], pa.int64()),
    })

    def cover_batch(batch: pa.Table) -> pa.Table:
        # single-key id sort + in-block (id, pos) lexsort — the
        # passage_dup_profile interval-union kernel
        if batch.num_rows == 0:
            return _empty_prof
        ids = batch.column("id").combine_chunks().to_numpy(zero_copy_only=False)
        pos = batch.column("pos").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.lexsort((pos, ids))
        ids, pos = ids[order], pos[order]
        starts, _ = _run_bounds(ids)
        d = np.zeros(len(ids), np.int64)
        d[starts] = k
        if len(ids) > 1:
            inner = np.minimum(pos[1:] - pos[:-1], k)
            nonstart = np.ones(len(ids), bool)
            nonstart[starts] = False
            idx = np.nonzero(nonstart)[0]
            d[idx] = inner[idx - 1]
        return pa.table({
            "doc_id": pa.array(ids[starts], pa.int64()),
            "tokens_total": pa.array(np.zeros(len(starts), np.int64)),
            "tokens_contaminated": pa.array(
                np.add.reduceat(d, starts), pa.int64()),
        })

    covered = hits.sort("id").map_batches(
        cover_batch, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    )

    def tag_counts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_prof
        n = batch.num_rows
        return pa.table({
            "doc_id": batch.column("id"),
            "tokens_total": batch.column("n_tok").cast(pa.int64()),
            "tokens_contaminated": pa.array(np.zeros(n, np.int64)),
        })

    counts = keyed.filter(expr="pos < 0").map_batches(
        tag_counts, batch_format="pyarrow", runtime_env=runtime_env())
    return grouped_agg(
        counts.union(covered), ["doc_id"],
        [("tokens_total", "tokens_total", "sum"),
         ("tokens_contaminated", "tokens_contaminated", "sum")],
    )


# ── content-defined chunking (CDC) storage dedup ─────────────────────────────

CDC_WINDOW = 16
_CDC_PRIME = 1099511628211          # FNV-64 prime
CDC_MASK = 0xFF                     # 8 zero bits → expected chunk ≈ 256 B


def cdc_cut_points(data: np.ndarray) -> np.ndarray:
    """Content-defined cut positions (inclusive chunk-end byte indices)
    of a uint8 byte array: a boundary lands wherever the 16-byte
    polynomial rolling hash ``H_i = Σ_{k<16} b[i−k]·P^k (mod 2⁶⁴)`` has
    its low 8 bits zero.  Because H_i depends only on the trailing
    window, an insertion/deletion perturbs just the chunks it touches —
    the shift-resistance fixed-size chunking lacks, and the reason
    recrawl snapshots dedup at chunk level even when every page gained
    a byte.  Fully vectorized: 16 aligned multiply-adds in wrapping
    uint64 (no per-byte Python).  Pure content-defined form WITHOUT
    FastCDC's min/max clamps — the clamp is a sequential suppression
    rule; expected-size tuning via CDC_MASK replaces it (documented
    deviation).  A vacuous cut at the final byte is dropped (it would
    split off an empty chunk)."""
    n = len(data)
    if n < CDC_WINDOW:
        return np.empty(0, np.int64)
    b = data.astype(np.uint64)
    acc = np.zeros(n - CDC_WINDOW + 1, np.uint64)
    pw = 1
    for k in range(CDC_WINDOW):
        acc += b[CDC_WINDOW - 1 - k: n - k] * np.uint64(pw)
        pw = (pw * _CDC_PRIME) % (1 << 64)
    cuts = np.flatnonzero((acc & np.uint64(CDC_MASK)) == 0) \
        + CDC_WINDOW - 1
    return cuts[cuts < n - 1].astype(np.int64)


def cdc_chunk_batch(batch: pa.Table, id_column: str = "doc_id",
                    text_column: str = "text") -> pa.Table:
    """Map stage of chunk-level storage dedup: every doc in the batch
    explodes into (id, chunk_ord, chunk_hash, chunk_len) rows, one per
    CDC chunk of its UTF-8 bytes.  chunk_hash is the repo's shared
    60-bit md5-prefix rule (textops.py quality-scorer convention), so
    equal byte runs collide across documents, hosts and snapshots.
    Empty documents emit no rows.  The outer loop is per DOCUMENT (the
    regex/np boundary-scan inside is vectorized); per-chunk md5 is
    O(bytes) like any digest."""
    ids = batch.column(id_column).to_pylist()
    texts = batch.column(text_column).to_pylist()
    out_id, out_ord, out_h, out_len = [], [], [], []
    for i, t in zip(ids, texts):
        raw = (t or "").encode("utf-8")
        if not raw:
            continue
        arr = np.frombuffer(raw, np.uint8)
        cuts = cdc_cut_points(arr)
        starts = np.concatenate([np.zeros(1, np.int64), cuts + 1])
        ends = np.concatenate([cuts + 1,
                               np.asarray([len(arr)], np.int64)])
        for j, (s, e) in enumerate(zip(starts, ends)):
            out_id.append(i)
            out_ord.append(j)
            out_h.append(
                int(hashlib.md5(raw[s:e]).hexdigest()[:15], 16))
            out_len.append(int(e - s))
    return pa.table({
        id_column: pa.array(out_id, batch.column(id_column).type),
        "chunk_ord": pa.array(out_ord, pa.int64()),
        "chunk_hash": pa.array(out_h, pa.int64()),
        "chunk_len": pa.array(out_len, pa.int64()),
    })
