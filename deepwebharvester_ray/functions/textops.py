"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

All operate as vectorized/batched ``map_batches`` functions over a text
column.  The token/lang/quality formulas are deliberately simple enough to
be re-expressed in ANSI SQL so the driver's DuckDB oracle can verify them
independently (see pipelines/queries.py).
"""
from __future__ import annotations

import re
from typing import Dict, List

import numpy as np
import pyarrow as pa

TOKEN_RE = re.compile(r"\S+")
WORD_RE = re.compile(r"[a-z0-9]+")
# BPE-ish subword splitter: letter runs, digit runs, single punctuation
BPE_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")

# Tiny stopword profiles for the n-gram/stopword language heuristic.
# Deliberately small + deterministic (SQL-expressible).
LANG_STOPWORDS: Dict[str, List[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "de": ["der", "die", "und", "das", "ist", "nicht"],
    "es": ["el", "la", "de", "que", "los", "una"],
    "fr": ["le", "la", "et", "les", "des", "une"],
}
LANG_ORDER = ["en", "de", "es", "fr"]  # tie-break: first in this order wins


def batch_word_tokens(batch: pa.Table, text_column: str = "text"):
    """All lowercased word tokens of a batch, flattened (the ONE
    canonical WORD_RE rule — keep in sync with the SQL oracles'
    regexp_extract_all(lower(text), '[a-z0-9]+'))."""
    out = []
    for t in batch.column(text_column).to_pylist():
        out.extend(WORD_RE.findall((t or "").lower()))
    return out


def token_count_batch(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """Whitespace tokens + BPE-ish subword token counts per row."""
    texts = batch.column(text_column).to_pylist()
    ws = [len(TOKEN_RE.findall(t or "")) for t in texts]
    bpe = [len(BPE_RE.findall(t or "")) for t in texts]
    out = {n: batch.column(n) for n in batch.column_names}
    out["n_tokens"] = pa.array(ws, pa.int64())
    out["n_bpe_tokens"] = pa.array(bpe, pa.int64())
    return pa.table(out)


def compressibility_batch(batch: pa.Table,
                          text_column: str = "text") -> pa.Table:
    """Byte-level compressibility quality signal: per row, UTF-8 byte
    count, zlib(level=6) compressed size, and the integer-floor
    compressed-percentage ``n_compressed·100 // n_bytes`` (empty text →
    100).  Highly compressible pages (low pct) are repetitive
    boilerplate/spam — the bytes-level cousin of the Gopher repetition
    rules (public heuristic family; no SQL oracle since the ratio is a
    zlib artifact — determinism and ordering properties are pinned in
    tests instead).  zlib is C-speed per row; the Python loop is only
    the dispatch."""
    import zlib

    n_bytes, n_comp = [], []
    for t in batch.column(text_column).to_pylist():
        raw = (t or "").encode()
        n_bytes.append(len(raw))
        n_comp.append(len(zlib.compress(raw, 6)))
    nb = np.asarray(n_bytes, np.int64)
    nc = np.asarray(n_comp, np.int64)
    pct = np.where(nb > 0, nc * 100 // np.maximum(nb, 1), 100)
    out = {n: batch.column(n) for n in batch.column_names
           if n != text_column}
    out["n_bytes"] = pa.array(nb, pa.int64())
    out["n_compressed"] = pa.array(nc, pa.int64())
    out["comp_pct"] = pa.array(pct, pa.int64())
    return pa.table(out)


def quality_batch(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """Quality metrics: length, token stats, punctuation/alnum ratios.

    mean_token_len uses non-whitespace chars / tokens (SQL-expressible as
    length(replace-spaces)/tokens).
    """
    texts = batch.column(text_column).to_pylist()
    n_chars, n_tok, mean_len, alnum_ratio = [], [], [], []
    for t in texts:
        t = t or ""
        toks = TOKEN_RE.findall(t)
        nonspace = sum(len(x) for x in toks)
        n_chars.append(len(t))
        n_tok.append(len(toks))
        mean_len.append(nonspace / len(toks) if toks else 0.0)
        alnum = sum(c.isalnum() for c in t)
        alnum_ratio.append(alnum / len(t) if t else 0.0)
    out = {n: batch.column(n) for n in batch.column_names}
    out["n_chars"] = pa.array(n_chars, pa.int64())
    out["n_tokens"] = pa.array(n_tok, pa.int64())
    out["mean_token_len"] = pa.array(mean_len, pa.float64())
    out["alnum_ratio"] = pa.array(alnum_ratio, pa.float64())
    return pa.table(out)


def lang_id_batch(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """Stopword-profile language ID.

    score(lang) = number of stopword OCCURRENCES among the text's lowercase
    word tokens; predict argmax (ties + zero → "und" = undetermined...
    actually ties broken by LANG_ORDER; all-zero → "und").
    """
    texts = batch.column(text_column).to_pylist()
    preds = []
    stopsets = {l: set(ws) for l, ws in LANG_STOPWORDS.items()}
    for t in texts:
        words = WORD_RE.findall((t or "").lower())
        best_lang, best_score = "und", 0
        for lang in LANG_ORDER:
            score = sum(1 for w in words if w in stopsets[lang])
            if score > best_score:
                best_lang, best_score = lang, score
        preds.append(best_lang)
    out = {n: batch.column(n) for n in batch.column_names}
    out["pred_lang"] = pa.array(preds, pa.string())
    return pa.table(out)


def fingerprint_batch(
    batch: pa.Table, text_column: str = "text", k: int = 5
) -> pa.Table:
    """Min-sampled document fingerprint (winnowing-style; Schleimer et
    al. 2003, public): minimum 60-bit md5 integer over space-joined word
    k-grams — md5 is the one deterministic hash both engines share
    (DuckDB ``CAST(concat('0x', substr(md5(g),1,15)) AS BIGINT)`` parses
    to the identical integer), so the fingerprint is oracle-checkable
    end to end.  Docs shorter than ``k`` words hash their full joined
    word sequence (the space join keeps 'ab c' / 'a bc' / 'abc'
    distinct)."""
    import hashlib

    md5 = hashlib.md5
    texts = batch.column(text_column).to_pylist()
    fps = []
    for t in texts:
        words = WORD_RE.findall((t or "").lower())
        if len(words) < k:
            fps.append(int(
                md5(" ".join(words).encode()).hexdigest()[:15], 16))
            continue
        fps.append(min(
            int(md5(" ".join(words[i:i + k]).encode()).hexdigest()[:15], 16)
            for i in range(len(words) - k + 1)))
    out = {n: batch.column(n) for n in batch.column_names}
    out["fingerprint"] = pa.array(fps, pa.int64())
    return pa.table(out)


# ── PII redaction ────────────────────────────────────────────────────────────

# RE2-compatible patterns (no lookarounds) — evaluated by Arrow's
# replace_substring_regex / count_substring_regex kernels here and by
# DuckDB's regexp_replace / regexp_extract_all in the oracle; both
# engines are RE2, so match semantics (leftmost, non-overlapping) are
# identical by construction.  Families mirror the reference IOC KB
# (scraper/intelligence.py:29-47) narrowed to the redaction set a
# training-data pipeline scrubs (Llama/C4-style PII pass).
PII_EMAIL_PAT = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4_PAT = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_redact_batch(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """Redact emails then IPv4 literals from ``text_column``; adds
    ``n_emails`` / ``n_ipv4`` (pre-redaction match counts) and
    ``redacted``.  Fully vectorized: both the counting and the rewrite
    are Arrow C++ RE2 kernels — zero Python per row (this is the hot
    full-corpus scrub pass)."""
    import pyarrow.compute as pc

    t = batch.column(text_column)
    n_emails = pc.count_substring_regex(t, PII_EMAIL_PAT).cast(pa.int64())
    red = pc.replace_substring_regex(t, pattern=PII_EMAIL_PAT,
                                     replacement="<EMAIL>")
    n_ipv4 = pc.count_substring_regex(red, PII_IPV4_PAT).cast(pa.int64())
    red = pc.replace_substring_regex(red, pattern=PII_IPV4_PAT,
                                     replacement="<IP>")
    out = {n: batch.column(n) for n in batch.column_names
           if n != text_column}
    out["n_emails"] = n_emails
    out["n_ipv4"] = n_ipv4
    out["redacted"] = red
    return pa.table(out)


# ── text cleaning (normalization pass) ───────────────────────────────────────

# ASCII whitespace + C0/C1 control runs (RE2 POSIX classes — identical
# semantics in Arrow's and DuckDB's RE2, both ASCII-only here, which is
# what makes the oracle exact)
CLEAN_WS_PAT = r"[[:space:][:cntrl:]]+"


def clean_text_batch(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """Canonical text cleaning for a training corpus: Unicode NFC
    normalization, control-character removal, whitespace collapse to
    single spaces, edge trim.  Adds ``clean``, ``n_chars_before``,
    ``n_chars_after``; drops nothing (filtering is a separate policy
    step).  The regex collapse, trim and both length counts are Arrow
    C++ kernels; NFC runs through ``unicodedata`` ONLY on rows an RE2
    mask flags as non-ASCII (pyarrow 16.1's ``utf8_normalize`` performs
    canonical DEcomposition but never composition — NFC('e'+U+0301)
    comes back decomposed — so the kernel cannot be used for NFC; the
    ASCII fast path keeps the common row zero-Python)."""
    import unicodedata

    import pyarrow.compute as pc

    t = batch.column(text_column)
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    nonascii = pc.match_substring_regex(t, "[^[:ascii:]]")
    if pc.any(nonascii).as_py():
        vals = t.to_pylist()
        for i in np.nonzero(nonascii.to_numpy(zero_copy_only=False))[0]:
            if vals[i] is not None:
                vals[i] = unicodedata.normalize("NFC", vals[i])
        norm = pa.array(vals, pa.string())
    else:
        norm = t
    collapsed = pc.replace_substring_regex(norm, pattern=CLEAN_WS_PAT,
                                           replacement=" ")
    clean = pc.utf8_trim(collapsed, characters=" ")
    out = {n: batch.column(n) for n in batch.column_names
           if n != text_column}
    out["clean"] = clean
    out["n_chars_before"] = pc.utf8_length(t).cast(pa.int64())
    out["n_chars_after"] = pc.utf8_length(clean).cast(pa.int64())
    return pa.table(out)


# ── hashed-feature linear scorer (model-inference actor pool) ────────────────

ML_W_MOD = 2001     # weights in [-1000, 1000] — signed, integer-exact
ML_W_SHIFT = 1000


class HashedLinearScorer:
    """Actor-pool "model inference" stage: per-doc integer score
    ``Σ count(token) × w(token)`` with token weights derived from
    ``md5(token)`` — the fasttext-style hashed-bag-of-words linear
    scorer used for corpus quality classification, with the md5
    derivation standing in for a trained weight table so the score is
    deterministic AND byte-reproducible in SQL (DuckDB's md5 hex parses
    to the identical integer).

    This is the model-state-per-actor pattern the engine uses for real
    classifiers: the weight cache lives on the ACTOR (built once,
    warmed across batches — swap ``_weight`` for an embedding-table /
    ONNX-session lookup and nothing else changes); scoring is one
    np.unique + vectorized dot per doc."""

    def __init__(self, text_column: str = "text") -> None:
        import hashlib

        self._col = text_column
        self._md5 = hashlib.md5
        self._cache: dict = {}  # token → weight; per-actor, cross-batch

    def _weight(self, tok: str) -> int:
        w = self._cache.get(tok)
        if w is None:
            w = (int(self._md5(tok.encode()).hexdigest()[:15], 16)
                 % ML_W_MOD) - ML_W_SHIFT
            self._cache[tok] = w
        return w

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self._col).to_pylist()
        scores = np.zeros(len(texts), np.int64)
        for i, t in enumerate(texts):
            toks = WORD_RE.findall((t or "").lower())
            if not toks:
                continue
            uniq, counts = np.unique(np.asarray(toks, dtype=object),
                                     return_counts=True)
            w = np.fromiter((self._weight(u) for u in uniq), np.int64,
                            len(uniq))
            scores[i] = int(counts @ w)
        out = {n: batch.column(n) for n in batch.column_names
               if n != self._col}
        out["score"] = pa.array(scores, pa.int64())
        return pa.table(out)


# ── line-level filtering (C4-style rules) ────────────────────────────────────

LINE_MIN_WORDS = 3
LINE_TERMINALS = (".", "!", "?", '"')
LINE_BANNED = "javascript"


def line_filter_batch(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """C4-style line filtering (Raffel et al. 2020 §2.2): keep a line
    iff it has ≥ ``LINE_MIN_WORDS`` whitespace tokens, ends in terminal
    punctuation, and doesn't mention ``javascript`` (case-insensitive).
    Adds ``kept_text`` (surviving lines re-joined with \\n), ``n_lines``
    and ``n_kept``.  Line-level scrubbing is the step BETWEEN whole-doc
    quality filters (repetition/quality) and passage dedup — boilerplate
    navigation/code lines die here without dropping the whole page.
    Per-row Python over a handful of lines each (same cost class as
    repetition_batch's Counter pass); the op itself is embarrassingly
    parallel — no shuffle."""
    texts = batch.column(text_column).to_pylist()
    kept_texts, n_lines, n_kept = [], [], []
    for t in texts:
        lines = (t or "").split("\n")
        kept = [
            ln for ln in lines
            if len(TOKEN_RE.findall(ln)) >= LINE_MIN_WORDS
            and ln.rstrip().endswith(LINE_TERMINALS)
            and LINE_BANNED not in ln.lower()
        ]
        kept_texts.append("\n".join(kept))
        n_lines.append(len(lines))
        n_kept.append(len(kept))
    out = {n: batch.column(n) for n in batch.column_names
           if n != text_column}
    out["kept_text"] = pa.array(kept_texts, pa.string())
    out["n_lines"] = pa.array(n_lines, pa.int64())
    out["n_kept"] = pa.array(n_kept, pa.int64())
    return pa.table(out)


# ── repetition metrics (Gopher-style quality rules) ──────────────────────────

# keep iff most-frequent 2-gram ≤ 10% of 2-grams AND distinct words ≥
# 50% of words — exact integer comparisons (max2*10 <= n_words-1,
# n_distinct*2 >= n_words) so both engines agree bit-for-bit.
REP_MAX_2GRAM_NUM = 10
REP_MIN_DISTINCT_NUM = 2


def repetition_batch(batch: pa.Table, text_column: str = "text") -> pa.Table:
    """Per-doc repetition metrics over lowercase WORD_RE tokens:
    ``n_words``, ``n_distinct``, ``max_2gram_n`` (count of the most
    frequent adjacent word 2-gram) and the Gopher-style ``keep``
    verdict.  Exact string comparisons (set / Counter) — no hashed
    approximation, so the SQL oracle matches by construction."""
    from collections import Counter

    texts = batch.column(text_column).to_pylist()
    n_words, n_distinct, max2, keep = [], [], [], []
    for t in texts:
        words = WORD_RE.findall((t or "").lower())
        n = len(words)
        nd = len(set(words))
        m2 = max(Counter(zip(words, words[1:])).values(), default=0)
        n_words.append(n)
        n_distinct.append(nd)
        max2.append(m2)
        keep.append(m2 * REP_MAX_2GRAM_NUM <= n - 1
                    and nd * REP_MIN_DISTINCT_NUM >= n)
    out = {n: batch.column(n) for n in batch.column_names
           if n != text_column}
    out["n_words"] = pa.array(n_words, pa.int64())
    out["n_distinct"] = pa.array(n_distinct, pa.int64())
    out["max_2gram_n"] = pa.array(max2, pa.int64())
    out["keep"] = pa.array(keep, pa.bool_())
    return pa.table(out)


# ── BPE tokenizer: bounded-table training + distributed apply ────────────────
#
# The training side of BPE iterates over the WORD-FREQUENCY table, not
# the corpus (Sennrich et al. 2016 — the table is what GPT-2-era
# tokenizers trained on), so the scale split is: the corpus collapses to
# word counts DISTRIBUTED (the heavy-hitters combiner), a bounded top-K
# slice of that table trains the merges in-process, and the ENCODE runs
# back over the corpus as an actor pool with the merge ranks broadcast
# once and a per-actor word→length memo (Zipf makes the memo hit rate
# ≈ the corpus/vocab ratio).


def train_bpe_merges(word_counts, n_merges: int = 50):
    """Greedy BPE merge training over a (word, count) table: each round
    merges the most frequent adjacent symbol pair (ties broken
    lexicographically — deterministic).  Pure in-process; callers pass a
    BOUNDED table (top-K words by frequency)."""
    from collections import Counter

    words = {tuple(w): int(n) for w, n in word_counts if len(w) >= 2}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for sym, n in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0][::-1]))
        # deterministic: max count, then lexicographically LAST pair —
        # any fixed rule works, it just has to be one rule
        (a, b), _cnt = best
        merges.append((a, b))
        merged = a + b
        nxt = {}
        for sym, n in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + n
        words = nxt
    return merges


def bpe_encode_word(word: str, ranks: dict) -> int:
    """Number of BPE symbols for *word* under merge ``ranks``
    (pair → rank): repeatedly apply the LOWEST-rank applicable merge —
    the canonical BPE apply loop."""
    sym = list(word)
    while len(sym) >= 2:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return len(sym)


class BPEEncodeStage:
    """Actor-pool BPE encoder: merge ranks deserialized ONCE per actor
    (broadcast ref), per-actor word→symbol-count memo warmed across
    batches.  Output: (doc_id, n_bpe_tokens) per doc."""

    def __init__(self, merges_ref) -> None:
        from ..broadcast import cached_get

        merges = cached_get(merges_ref)
        self._ranks = {tuple(p): i for i, p in enumerate(merges)}
        self._memo: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        counts = np.zeros(batch.num_rows, np.int64)
        memo, ranks = self._memo, self._ranks
        for i, t in enumerate(batch.column("text").to_pylist()):
            n = 0
            for w in WORD_RE.findall((t or "").lower()):
                c = memo.get(w)
                if c is None:
                    c = bpe_encode_word(w, ranks)
                    memo[w] = c
                n += c
            counts[i] = n
        return pa.table({"doc_id": ids,
                         "n_bpe_tokens": pa.array(counts, pa.int64())})


def bpe_encode_counts(ds, merges, batch_size=None, concurrency=(1, 8)):
    """Distributed BPE token counts: ``merges`` broadcast once, encode
    as an actor pool over (doc_id, text) batches."""
    import ray

    from .. import runtime_env

    merges_ref = ray.put(list(merges))
    return ds.map_batches(
        BPEEncodeStage,
        fn_constructor_args=(merges_ref,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        runtime_env=runtime_env(),
    )
