"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale notes (these run against 100 TB corpora):

* **exact_dedup** — hash-partitioned ``groupby(content_hash)`` + first-wins
  per group; the only all-to-all is on the 64-char hash key.
* **minhash_lsh_pairs** — shingle→minhash→band; the shuffle key is
  ``(band_id, band_hash)`` so only near-identical docs co-locate; candidate
  verification is per-bucket.
* **token-set Jaccard / embedding near-dup** — implemented here with the
  broadcast-small-side pattern (``ray.put`` the comparison side once, read
  per actor in ``__init__``): exact and cheap when one side fits memory.
  For large×large, switch to the inverted-index join with hot-token
  salting (the minhash path above is the recommended approximation).
"""
from __future__ import annotations

import hashlib
import re
from typing import List, Tuple

import numpy as np
import pyarrow as pa

from .. import runtime_env

WORD_RE = re.compile(r"[a-z0-9]+")

_MERSENNE = (1 << 61) - 1


def _word_hash64(w: str) -> int:
    return int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")


def token_set(text: str) -> List[str]:
    return sorted(set(WORD_RE.findall((text or "").lower())))


def shingle_set(text: str, k: int = 3) -> List[int]:
    """Hashed word k-gram shingles."""
    words = WORD_RE.findall((text or "").lower())
    if len(words) < k:
        return [_word_hash64(" ".join(words))] if words else []
    return sorted({_word_hash64(" ".join(words[i : i + k])) for i in range(len(words) - k + 1)})


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


# ── exact dedup ──────────────────────────────────────────────────────────────


def exact_dedup(ds, id_column: str = "doc_id", text_column: str = "text"):
    """Keep the minimum-id row per sha256(text): hash-partitioned groupby +
    per-group first-wins (the Ray-native form of the reference's global
    content-hash set, crawler.py:184-191)."""

    def add_hash(batch: pa.Table) -> pa.Table:
        hashes = [
            hashlib.sha256((t or "").encode("utf-8", errors="replace")).hexdigest()
            for t in batch.column(text_column).to_pylist()
        ]
        return batch.append_column("content_hash", pa.array(hashes, pa.string()))

    def keep_min(group: pa.Table) -> pa.Table:
        ids = group.column(id_column)
        import pyarrow.compute as pc

        idx = pc.index(ids, pc.min(ids)).as_py()
        return group.slice(idx, 1)

    hashed = ds.map_batches(
        add_hash, batch_format="pyarrow", runtime_env=runtime_env()
    )
    return hashed.groupby("content_hash").map_groups(
        keep_min, batch_format="pyarrow", runtime_env=runtime_env()
    )


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
    if not shingles:
        return np.zeros(len(a), dtype=np.uint64)
    x = (np.array(shingles, dtype=np.uint64) & np.uint64(0xFFFFFFFF))
    m = (a[:, None] * x[None, :] + b[:, None]) % np.uint64(_MERSENNE)
    return m.min(axis=1)


class MinHashStage:
    """Actor-pool stage: text → minhash signature + LSH band keys.

    Permutation parameters are built once per actor in ``__init__``."""

    def __init__(self, id_column: str = "doc_id", text_column: str = "text",
                 shingle_k: int = 3) -> None:
        self._a, self._b = _perm_params()
        self._id = id_column
        self._text = text_column
        self._k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, bands, band_hashes = [], [], []
        for rid, text in zip(
            batch.column(self._id).to_pylist(), batch.column(self._text).to_pylist()
        ):
            sig = minhash_signature(shingle_set(text, self._k), self._a, self._b)
            for band in range(BANDS):
                chunk = sig[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
                ids.append(rid)
                bands.append(band)
                band_hashes.append(int.from_bytes(h, "big"))
        return pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "band": pa.array(bands, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.uint64()),
            }
        )


def minhash_lsh_pairs(
    ds,
    id_column: str = "doc_id",
    text_column: str = "text",
    threshold: float = 0.8,
    shingle_k: int = 3,
):
    """Near-duplicate candidate pairs via MinHash banding, verified with
    exact shingle Jaccard.  Returns a Dataset of (id_a, id_b, jaccard).

    The broadcast verification side is the (id → shingles) map — fine while
    candidates' docs fit memory; at larger scale verify per-bucket instead.
    """
    import ray

    sig_ds = ds.map_batches(
        MinHashStage,
        fn_constructor_args=(id_column, text_column, shingle_k),
        batch_format="pyarrow",
        concurrency=(1, 8),
        runtime_env=runtime_env(),
    )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(set(group.column("id").to_pylist()))
        a_out, b_out = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_out.append(ids[i])
                b_out.append(ids[j])
        return pa.table(
            {"id_a": pa.array(a_out, pa.int64()), "id_b": pa.array(b_out, pa.int64())}
        )

    cand = sig_ds.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pyarrow",
        runtime_env=runtime_env(),
    )
    # distinct candidate pairs (a second small shuffle on the pair key)
    cand = cand.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow",
        runtime_env=runtime_env(),
    )

    # broadcast shingle sets for exact verification
    sh_tbl = ds.map_batches(
        lambda b: pa.table(
            {
                "id": b.column(id_column),
                "sh": pa.array(
                    [shingle_set(t, shingle_k) for t in b.column(text_column).to_pylist()],
                    pa.large_list(pa.uint64()),
                ),
            }
        ),
        batch_format="pyarrow",
        runtime_env=runtime_env(),
    ).take_all()
    sh_map_ref = ray.put({r["id"]: set(r["sh"]) for r in sh_tbl})

    class Verify:
        def __init__(self, ref, thr):
            self._m = ray.get(ref)
            self._thr = thr

        def __call__(self, batch: pa.Table) -> pa.Table:
            a_ids = batch.column("id_a").to_pylist()
            b_ids = batch.column("id_b").to_pylist()
            keep_a, keep_b, jac = [], [], []
            for a_id, b_id in zip(a_ids, b_ids):
                j = jaccard(self._m.get(a_id, set()), self._m.get(b_id, set()))
                if j >= self._thr:
                    keep_a.append(a_id)
                    keep_b.append(b_id)
                    jac.append(j)
            return pa.table(
                {
                    "id_a": pa.array(keep_a, pa.int64()),
                    "id_b": pa.array(keep_b, pa.int64()),
                    "jaccard": pa.array(jac, pa.float64()),
                }
            )

    return cand.map_batches(
        Verify,
        fn_constructor_args=(sh_map_ref, threshold),
        batch_format="pyarrow",
        concurrency=(1, 4),
        runtime_env=runtime_env(),
    )


# ── token-set Jaccard (exact, broadcast) ─────────────────────────────────────


def jaccard_pairs_exact(
    ds, id_column: str = "doc_id", text_column: str = "text", threshold: float = 0.8
):
    """ALL pairs with token-set Jaccard ≥ threshold (exact).

    Broadcast-small-side: the full (id → token set) map is put in the
    object store once; each batch compares its rows against all ids > own
    (dedup by id_a < id_b).  Exact counterpart to minhash_lsh_pairs.
    """
    import ray

    tok_tbl = ds.map_batches(
        lambda b: pa.table(
            {
                "id": b.column(id_column),
                "tok": pa.array(
                    [token_set(t) for t in b.column(text_column).to_pylist()],
                    pa.large_list(pa.string()),
                ),
            }
        ),
        batch_format="pyarrow",
        runtime_env=runtime_env(),
    ).take_all()
    tok_ref = ray.put([(r["id"], frozenset(r["tok"])) for r in tok_tbl])

    class PairScan:
        def __init__(self, ref, thr):
            self._all = ray.get(ref)
            self._thr = thr

        def __call__(self, batch: pa.Table) -> pa.Table:
            a_out, b_out, jac = [], [], []
            ids = batch.column(id_column).to_pylist()
            texts = batch.column(text_column).to_pylist()
            for rid, text in zip(ids, texts):
                mine = frozenset(token_set(text))
                for oid, other in self._all:
                    if oid <= rid:
                        continue
                    j = jaccard(mine, other)
                    if j >= self._thr:
                        a_out.append(rid)
                        b_out.append(oid)
                        jac.append(j)
            return pa.table(
                {
                    "id_a": pa.array(a_out, pa.int64()),
                    "id_b": pa.array(b_out, pa.int64()),
                    "jaccard": pa.array(jac, pa.float64()),
                }
            )

    return ds.map_batches(
        PairScan,
        fn_constructor_args=(tok_ref, threshold),
        batch_format="pyarrow",
        concurrency=(1, 8),
        runtime_env=runtime_env(),
    )


# ── SimHash ──────────────────────────────────────────────────────────────────


def simhash64(text: str) -> int:
    """64-bit SimHash over word tokens (Charikar 2002, public)."""
    acc = np.zeros(64, dtype=np.int64)
    for w in set(WORD_RE.findall((text or "").lower())):
        h = _word_hash64(w)
        bits = np.array([(h >> i) & 1 for i in range(64)], dtype=np.int64)
        acc += bits * 2 - 1
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_pairs(
    ds, id_column: str = "doc_id", text_column: str = "text", max_hamming: int = 3
):
    """Near-dup pairs by SimHash: band on 4×16-bit chunks (any pair within
    hamming ≤ 3 of a 64-bit hash shares at least one exact 16-bit chunk —
    pigeonhole), verify hamming distance in-bucket."""

    def sig_batch(batch: pa.Table) -> pa.Table:
        ids, chunk_ids, chunk_vals, sigs = [], [], [], []
        for rid, text in zip(
            batch.column(id_column).to_pylist(), batch.column(text_column).to_pylist()
        ):
            s = simhash64(text)
            for c in range(4):
                ids.append(rid)
                chunk_ids.append(c)
                chunk_vals.append((s >> (16 * c)) & 0xFFFF)
                sigs.append(s)
        return pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "chunk": pa.array(chunk_ids, pa.int32()),
                "chunk_val": pa.array(chunk_vals, pa.int32()),
                "sig": pa.array(sigs, pa.uint64()),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        rows = sorted(
            {(i, s) for i, s in zip(group.column("id").to_pylist(),
                                    group.column("sig").to_pylist())}
        )
        a_out, b_out, ham = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                d = bin(int(rows[i][1]) ^ int(rows[j][1])).count("1")
                if d <= max_hamming:
                    a_out.append(rows[i][0])
                    b_out.append(rows[j][0])
                    ham.append(d)
        return pa.table(
            {
                "id_a": pa.array(a_out, pa.int64()),
                "id_b": pa.array(b_out, pa.int64()),
                "hamming": pa.array(ham, pa.int32()),
            }
        )

    sig = ds.map_batches(sig_batch, batch_format="pyarrow", runtime_env=runtime_env())
    pairs = sig.groupby(["chunk", "chunk_val"]).map_groups(
        bucket_pairs, batch_format="pyarrow",
        runtime_env=runtime_env(),
    )
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow",
        runtime_env=runtime_env(),
    )


# ── embedding near-dup ───────────────────────────────────────────────────────


def embedding_neardup_pairs(
    ds, id_column: str = "vec_id", vec_column: str = "embedding",
    threshold: float = 0.95,
):
    """Pairs with cosine ≥ threshold (exact, broadcast matmul).

    The normalized embedding matrix is broadcast once; each batch computes
    a (batch × all) matmul in numpy — the brute-force baseline.  The scale
    path buckets by LSH hyperplane signature first (see functions.ann)."""
    import ray

    rows = ds.select_columns([id_column, vec_column]).take_all()
    ids = np.array([r[id_column] for r in rows], dtype=np.int64)
    mat = np.array([r[vec_column] for r in rows], dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    class NearDup:
        def __init__(self, ref, thr):
            self._ids, self._mat = ray.get(ref)
            self._thr = thr

        def __call__(self, batch: pa.Table) -> pa.Table:
            bids = np.array(batch.column(id_column).to_pylist(), dtype=np.int64)
            bm = np.array(
                [list(v) for v in batch.column(vec_column).to_pylist()],
                dtype=np.float64,
            )
            bm /= np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
            sims = bm @ self._mat.T
            a_out, b_out, cs = [], [], []
            for i, rid in enumerate(bids):
                hits = np.nonzero((sims[i] >= self._thr) & (self._ids > rid))[0]
                for h in hits:
                    a_out.append(int(rid))
                    b_out.append(int(self._ids[h]))
                    cs.append(float(sims[i, h]))
            return pa.table(
                {
                    "id_a": pa.array(a_out, pa.int64()),
                    "id_b": pa.array(b_out, pa.int64()),
                    "cosine": pa.array(cs, pa.float64()),
                }
            )

    return ds.map_batches(
        NearDup,
        fn_constructor_args=(ref, threshold),
        batch_format="pyarrow",
        concurrency=(1, 8),
        runtime_env=runtime_env(),
    )
