"""A compact cuckoo filter for the 10^10-entry URL-seen set.

Replaces the reference's in-memory Python sets (``Crawler._global_hashes``,
crawler.py:111; per-site ``crawled``, crawler.py:230) with an
approximate-membership structure at ~2 bytes/key/shard: a Python set of
10^10 URL strings needs ~1 TB of RAM, a cuckoo filter shard fits the same
keys in a few GB across actors (SURVEY §4 scale ceiling).

Standard design (Fan et al., "Cuckoo Filter: Practically Better Than
Bloom", CoNLL'14 — public): 4-slot buckets, 16-bit fingerprints,
partial-key cuckoo hashing with bounded eviction.  False-positive rate
≈ 2·4/2^16 ≈ 0.012% — positives can be confirmed against an exact
per-shard spill set when exactness is required (SURVEY §7.5 hard part 4).
"""
from __future__ import annotations

import numpy as np

_SLOTS = 4
_MAX_KICKS = 500
_FP_BITS = 16
_FP_MASK = (1 << _FP_BITS) - 1
_MAX_STASH = 1024  # kick-failure victim stash bound per filter


def _mix_vec(h: np.ndarray) -> np.ndarray:
    """Vectorized :func:`_mix` over a uint64 array — bit-identical to
    the scalar finalizer (pinned by test_state)."""
    h = np.asarray(h, dtype=np.uint64).copy()
    with np.errstate(over="ignore"):
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xC4CEB9FE1A85EC53)
        h ^= h >> np.uint64(33)
    return h


def _mix(h: np.uint64 | int) -> int:
    """64-bit finalizer (splitmix64-style) for deriving independent hashes."""
    h = int(h) & 0xFFFFFFFFFFFFFFFF
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) & 0xFFFFFFFFFFFFFFFF
    h ^= h >> 33
    h = (h * 0xC4CEB9FE1A85EC53) & 0xFFFFFFFFFFFFFFFF
    h ^= h >> 33
    return h


class CuckooFilter:
    """Approximate membership over 64-bit keys."""

    def __init__(self, capacity: int = 1 << 20) -> None:
        # Size to ~95% max load: buckets = next pow2 ≥ capacity / (slots * 0.95)
        nb = 1
        while nb * _SLOTS * 0.95 < capacity:
            nb <<= 1
        self._nb = nb
        self._table = np.zeros((nb, _SLOTS), dtype=np.uint16)
        self._count = 0
        # Victim stash: (bucket_idx, fp) pairs displaced by a failed kick
        # loop.  Without it a failed eviction would silently DROP another
        # key's fingerprint → false negatives, which the filter must never
        # produce.  Checked by contains(); bounded by _MAX_STASH.
        self._stash: set = set()
        self._rng = np.random.default_rng(0xC0FFEE)  # deterministic evictions

    def __len__(self) -> int:
        return self._count + len(self._stash)

    @property
    def load_factor(self) -> float:
        return self._count / (self._nb * _SLOTS)

    def _fingerprint(self, key: int) -> int:
        fp = _mix(key) & _FP_MASK
        return fp or 1  # 0 means empty slot

    def _index1(self, key: int) -> int:
        # mix BEFORE masking: raw high bits of a low-entropy key (counters,
        # sequential ids < 2^32) are all zero, which would map every key to
        # bucket 0 and degenerate the filter to its stash.  The high 32
        # bits of the mix decorrelate from the fingerprint (low 16 bits of
        # the same mix).
        return (_mix(key) >> 32) & (self._nb - 1)

    def _alt_index(self, idx: int, fp: int) -> int:
        return (idx ^ _mix(fp)) & (self._nb - 1)

    def add(self, key: int) -> bool:
        """Insert *key*; False if the filter is too full (caller should
        spill to the exact set / grow the shard count)."""
        fp = self._fingerprint(key)
        i1 = self._index1(key)
        i2 = self._alt_index(i1, fp)
        for idx in (i1, i2):
            row = self._table[idx]
            empty = np.nonzero(row == 0)[0]
            if empty.size:
                row[empty[0]] = fp
                self._count += 1
                return True
        # Evict: bounded random-walk cuckoo kicks.  If the stash is full,
        # refuse WITHOUT displacing anything (caller spills the new key
        # exactly; no resident key may ever be lost).
        if len(self._stash) >= _MAX_STASH:
            return False
        idx = i1 if (self._rng.integers(2)) else i2
        for _ in range(_MAX_KICKS):
            slot = int(self._rng.integers(_SLOTS))
            fp, self._table[idx, slot] = int(self._table[idx, slot]), fp
            idx = self._alt_index(idx, fp)
            row = self._table[idx]
            empty = np.nonzero(row == 0)[0]
            if empty.size:
                row[empty[0]] = fp
                self._count += 1
                return True
        # Kick budget exhausted: the NEW key was swapped into the table on
        # the first kick; stash the final displaced victim so its key still
        # answers contains() == True.  _count tracks TABLE slots only (the
        # new key occupies the victim's slot); the stash adds via __len__.
        self._stash.add((int(idx), int(fp)))
        return True

    def contains(self, key: int) -> bool:
        fp = self._fingerprint(key)
        i1 = self._index1(key)
        if fp in self._table[i1]:
            return True
        i2 = self._alt_index(i1, fp)
        if fp in self._table[i2]:
            return True
        return bool(self._stash) and (
            (i1, fp) in self._stash or (i2, fp) in self._stash
        )

    def _derive(self, keys: np.ndarray):
        """Vectorized (fingerprint, bucket1, bucket2) for a uint64 key
        array — same values as the scalar _fingerprint/_index1/
        _alt_index chain."""
        m = _mix_vec(keys)
        fp = (m & np.uint64(_FP_MASK)).astype(np.int64)
        fp[fp == 0] = 1
        i1 = ((m >> np.uint64(32)) & np.uint64(self._nb - 1)).astype(
            np.int64)
        fpm = _mix_vec(fp.astype(np.uint64))
        i2 = ((i1.astype(np.uint64) ^ fpm)
              & np.uint64(self._nb - 1)).astype(np.int64)
        return fp.astype(np.uint16), i1, i2

    def contains_batch(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership for a uint64 key array: two gathered
        row-compares against the table plus the (tiny, bounded) stash."""
        keys = np.asarray(keys, dtype=np.uint64)
        if not len(keys):
            return np.zeros(0, bool)
        fp, i1, i2 = self._derive(keys)
        hit = ((self._table[i1] == fp[:, None]).any(axis=1)
               | (self._table[i2] == fp[:, None]).any(axis=1))
        if self._stash:
            miss = np.flatnonzero(~hit)
            st = self._stash
            for j in miss:
                if ((int(i1[j]), int(fp[j])) in st
                        or (int(i2[j]), int(fp[j])) in st):
                    hit[j] = True
        return hit

    def _place_first_empty(self, buckets: np.ndarray,
                           fps: np.ndarray) -> np.ndarray:
        """Vectorized append into the first empty slot of each key's
        bucket.  Correct only for buckets whose filled slots are
        CONTIGUOUS from slot 0 (always true for an append-only filter;
        delete() can make holes) — keys landing in a non-contiguous or
        full bucket are left unplaced (False) for the caller's
        fallback."""
        if not len(buckets):
            return np.zeros(0, bool)
        order = np.argsort(buckets, kind="stable")
        b = buckets[order]
        f = fps[order]
        # within-batch rank among keys targeting the same bucket
        starts = np.flatnonzero(
            np.concatenate(([True], b[1:] != b[:-1])))
        runlen = np.diff(np.concatenate((starts, [len(b)])))
        rank = np.arange(len(b)) - np.repeat(starts, runlen)
        rows = self._table[b]
        filled = rows != 0
        occ = filled.sum(axis=1)
        contiguous = (filled == (np.arange(_SLOTS) < occ[:, None])).all(
            axis=1)
        slot = occ + rank
        ok = contiguous & (slot < _SLOTS)
        self._table[b[ok], slot[ok]] = f[ok]
        self._count += int(ok.sum())
        placed = np.zeros(len(buckets), bool)
        placed[order] = ok
        return placed

    def bulk_add(self, keys: np.ndarray) -> int:
        """Vectorized insert of a uint64 key array (the 10^8-key bulk-
        load path: the per-key Python add() is ~10^5 keys/s, this is
        ~10^7/s).  Placement rule matches add() — bucket 1's first
        empty slot, else bucket 2's — with eviction-needing leftovers
        falling back to the scalar add().  Duplicate keys in the batch
        place duplicate fingerprints, exactly as repeated add() calls
        would; callers wanting set semantics dedupe first.  Returns the
        number of keys that did NOT fit (caller spills them exactly,
        same contract as add() == False)."""
        keys = np.asarray(keys, dtype=np.uint64)
        if not len(keys):
            return 0
        fp, i1, i2 = self._derive(keys)
        placed = self._place_first_empty(i1, fp)
        rem = ~placed
        if rem.any():
            placed2 = self._place_first_empty(i2[rem], fp[rem])
            rem_idx = np.flatnonzero(rem)[~placed2]
        else:
            rem_idx = np.empty(0, np.int64)
        failed = 0
        for j in rem_idx:
            if not self.add(int(keys[j])):
                failed += 1
        return failed

    def delete(self, key: int) -> bool:
        fp = self._fingerprint(key)
        i1 = self._index1(key)
        for idx in (i1, self._alt_index(i1, fp)):
            row = self._table[idx]
            hit = np.nonzero(row == fp)[0]
            if hit.size:
                row[hit[0]] = 0
                self._count -= 1
                return True
            if (idx, fp) in self._stash:
                self._stash.discard((idx, fp))
                return True
        return False

    # -- snapshot ------------------------------------------------------------
    def state(self) -> dict:
        return {
            "table": self._table.copy(),
            "count": self._count,
            "stash": sorted(self._stash),
        }

    def restore(self, state: dict) -> None:
        self._table = np.asarray(state["table"], dtype=np.uint16).copy()
        self._nb = self._table.shape[0]
        self._count = int(state["count"])
        self._stash = {tuple(int(v) for v in x) for x in state.get("stash", [])}
