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
    """Rolling-hash document fingerprint: min polynomial hash over word
    k-grams (winnowing-style min-sampling; Schleimer et al. 2003, public)."""
    texts = batch.column(text_column).to_pylist()
    B, M = 1_000_003, (1 << 61) - 1
    fps = []
    for t in texts:
        words = WORD_RE.findall((t or "").lower())
        if len(words) < k:
            h = 0
            for w in words:
                for c in w:
                    h = (h * B + ord(c)) % M
            fps.append(h)
            continue
        best = M
        for i in range(len(words) - k + 1):
            h = 0
            for w in words[i : i + k]:
                for c in w:
                    h = (h * B + ord(c)) % M
                h = (h * B + 32) % M
            best = min(best, h)
        fps.append(best)
    out = {n: batch.column(n) for n in batch.column_names}
    out["fingerprint"] = pa.array(fps, pa.uint64())
    return pa.table(out)
