"""Distributed Bloom filter: build over a 64-bit key column, broadcast,
probe — the semi-join pruning primitive for incremental-crawl novelty
screens ("is this content hash already in the corpus index?") and
join-input reduction.

The build is combiner-shaped, the only shape that scales: every block
produces a PARTIAL bitmap (one ``large_binary`` row), and partial bitmaps
merge by bitwise OR — associative and commutative, so merge order is
irrelevant and a tree merge works at any scale.  The driver here
OR-reduces the O(#blocks) partials sequentially (two bitmaps resident at
a time); a 256-node cluster would tree-reduce per node first.

Probe semantics are the Bloom contract: ``False`` is definitive
(key NOT in the set), ``True`` is a candidate that needs exact
verification — the caller routes probe-positives through an exact
anti-join (see ``novelty_filter`` in pipelines/queries.py) and
probe-negatives straight through, so the exact join only ever sees the
(tiny) candidate slice.  With k=7 hashes and 10 bits/key the false-hit
rate is <1%, i.e. the exact join's input shrinks ~100× on disjoint keys.

Bits are set/tested vectorized (positions via double hashing
``h1 + i·h2 mod m`` — Kirsch-Mitzenmacher, public construction);
``np.bitwise_or.at`` handles duplicate positions within a batch.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import runtime_env

_H2_MULT = np.uint64(0x9E3779B97F4A7C15)  # odd → bijective second hash


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer: raw keys (ids, truncated digests) carry
    low-bit structure that power-of-two modulo would expose directly."""
    with np.errstate(over="ignore"):
        x = x.copy()
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
    return x


def _positions(keys: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """(k, n) bit positions for each uint64 key (double hashing)."""
    with np.errstate(over="ignore"):
        u = keys.astype(np.uint64)
        h1 = _mix(u)
        # h2 must be INDEPENDENT of h1 (Kirsch-Mitzenmacher requires two
        # independent hash functions): deriving h2 from h1 makes the whole
        # progression a function of h1 alone and measured 30× the
        # theoretical false-positive rate.  Mix a keyed variant instead.
        h2 = _mix(u ^ _H2_MULT) | np.uint64(1)  # odd → full-period probe
        idx = np.arange(k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + idx * h2[None, :]) % np.uint64(n_bits))


def _set_bits(words: np.ndarray, pos: np.ndarray) -> None:
    flat = pos.reshape(-1)
    np.bitwise_or.at(
        words, (flat >> np.uint64(6)).astype(np.int64),
        np.uint64(1) << (flat & np.uint64(63)),
    )


def _test_bits(words: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """True where ALL k positions are set (candidate membership)."""
    bits = (
        words[(pos >> np.uint64(6)).astype(np.int64)]
        >> (pos & np.uint64(63))
    ) & np.uint64(1)
    return bits.all(axis=0)


def bloom_build(ds, key_column: str, n_bits: int = 1 << 23, k: int = 7
                ) -> np.ndarray:
    """Bitmap (uint64 word array) over a dataset's uint64/int64 key
    column.  Size ``n_bits`` at ~10 bits per expected distinct key for a
    <1% false-hit rate; the bitmap itself is ``n_bits/8`` bytes
    (1 MiB at the default) regardless of row count."""
    assert n_bits % 64 == 0
    n_words = n_bits // 64

    def partial(batch: pa.Table) -> pa.Table:
        words = np.zeros(n_words, dtype=np.uint64)
        if batch.num_rows:
            keys = batch.column(key_column).combine_chunks().to_numpy(
                zero_copy_only=False
            ).astype(np.uint64)
            _set_bits(words, _positions(keys, n_bits, k))
        return pa.table({"bm": pa.array([words.tobytes()], pa.large_binary())})

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None,
        runtime_env=runtime_env(),
    )

    def merge(blobs):
        acc = np.frombuffer(blobs[0], dtype=np.uint64).copy()
        for b in blobs[1:]:
            acc |= np.frombuffer(b, dtype=np.uint64)
        return acc.tobytes()

    # associative tree OR-reduce: fanin bitmaps per task, log-depth —
    # the driver only ever folds the final ≤fanin blobs
    from .partition import tree_merge_blobs

    blob = tree_merge_blobs(parts, "bm", merge)
    if blob is None:
        return np.zeros(n_words, dtype=np.uint64)
    return np.frombuffer(blob, dtype=np.uint64).copy()


def bloom_probe(words: np.ndarray, keys: np.ndarray, k: int = 7
                ) -> np.ndarray:
    """Candidate-membership mask for uint64 ``keys`` (False = definitely
    absent; True = verify exactly)."""
    n_bits = len(words) * 64
    if not len(keys):
        return np.zeros(0, dtype=bool)
    return _test_bits(words, _positions(keys.astype(np.uint64), n_bits, k))
