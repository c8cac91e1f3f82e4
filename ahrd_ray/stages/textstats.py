"""Text-analysis operators over ``documents``: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

All hot paths are vectorized (Arrow regex split + numpy); the language-ID
profile table and stopword set are tiny constants compiled into the stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ahrd_ray.config import TOKEN_SPLITTER_REGEX, q20
from ahrd_ray.stages.dedup import MERSENNE61, _POLY_BASE

STOPWORDS = ("a", "the")


def _split_counts(batch: pa.Table):
    low = pc.utf8_lower(batch["text"])
    splits = pc.split_pattern_regex(low, pattern=TOKEN_SPLITTER_REGEX)
    if isinstance(splits, pa.ChunkedArray):
        splits = splits.combine_chunks()
    lengths = pc.list_value_length(splits).to_numpy(zero_copy_only=False)
    flat = splits.flatten().to_numpy(zero_copy_only=False)
    row = np.repeat(np.arange(len(batch)), lengths)
    mask = flat != ""
    return row[mask], flat[mask]


def token_count_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens, n_distinct) — raw token counts (duplicates kept
    for n_tokens, set size for n_distinct)."""
    row, toks = _split_counts(batch)
    n = len(batch)
    n_tokens = np.bincount(row, minlength=n).astype(np.int64)
    df = pd.DataFrame({"row": row, "tok": toks}).drop_duplicates()
    n_distinct = np.bincount(df["row"].to_numpy(), minlength=n).astype(np.int64)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tokens, type=pa.int64()),
            "n_distinct": pa.array(n_distinct, type=pa.int64()),
        }
    )


def token_counts(sf_dir: str) -> ray.data.Dataset:
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(token_count_batch, batch_format="pyarrow")


def quality_batch(batch: pa.Table) -> pa.Table:
    """Heuristic quality score per doc.

    quality = q20((1 - stopword_ratio) * 0.6 + ttr * 0.4) where ttr is the
    type-token ratio; every term is a ratio of exact integers, the final
    combination is a fixed-order expression mirrored in the oracle SQL.
    """
    row, toks = _split_counts(batch)
    n = len(batch)
    n_tokens = np.bincount(row, minlength=n).astype(np.float64)
    stop_mask = np.isin(toks, STOPWORDS)
    n_stop = np.bincount(row[stop_mask], minlength=n).astype(np.float64)
    df = pd.DataFrame({"row": row, "tok": toks}).drop_duplicates()
    n_distinct = np.bincount(df["row"].to_numpy(), minlength=n).astype(np.float64)
    n_chars = pc.utf8_length(batch["text"]).to_numpy(zero_copy_only=False).astype(np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        stop_ratio = n_stop / n_tokens
        ttr = n_distinct / n_tokens
    stop_ratio = np.where(n_tokens == 0, 0.0, stop_ratio)
    ttr = np.where(n_tokens == 0, 0.0, ttr)
    quality = q20((1.0 - stop_ratio) * 0.6 + ttr * 0.4)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pa.array(n_chars, type=pa.int64()),
            "n_tokens": pa.array(n_tokens.astype(np.int64), type=pa.int64()),
            "stopword_ratio": pa.array(stop_ratio, type=pa.float64()),
            "type_token_ratio": pa.array(ttr, type=pa.float64()),
            "quality": pa.array(quality, type=pa.float64()),
        }
    )


def quality_scores(sf_dir: str) -> ray.data.Dataset:
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(quality_batch, batch_format="pyarrow")


# Character-bigram profiles for a tiny language-ID heuristic.  The synthetic
# corpus has random lang labels over identical English-ish word soup, so
# accuracy on it is meaningless — the operator is exercised structurally
# (deterministic output, full coverage) and unit-tested on real phrases.
_LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("th", "he", "in", "er", "an", "the "),
    "de": ("ch", "ei", "de", "en", "un", " und "),
    "es": ("de", "la", "os", "el", "ón", " de "),
    "fr": ("le", "es", "de", "on", "nt", " le "),
    "zh": ("zh", "sh", "ng", "xi", "ao", " de "),
}


def langid_score(text: str) -> str:
    low = text.lower()
    best, best_score = "en", -1.0
    for lang in sorted(_LANG_PROFILES):
        score = 0.0
        for i, gram in enumerate(_LANG_PROFILES[lang]):
            score += low.count(gram) * (2.0 if " " in gram else 1.0) / (i + 1.0)
        if score > best_score:
            best, best_score = lang, score
    return best


def langid(sf_dir: str) -> ray.data.Dataset:
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        preds = [langid_score(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {"doc_id": batch["doc_id"], "pred_lang": pa.array(preds, type=pa.string())}
        )

    return docs.map_batches(f, batch_format="pyarrow")


def rolling_fingerprint(text: str, window: int = 16) -> int:
    """Winnowing-style fingerprint: min of Karp-Rabin window hashes mod
    2^61-1 (deterministic, seedless)."""
    data = text.encode("utf-8")
    if len(data) <= window:
        h = 0
        for b in data:
            h = (h * _POLY_BASE + b) % MERSENNE61
        return h
    base_pow = pow(_POLY_BASE, window - 1, MERSENNE61)
    h = 0
    best = MERSENNE61
    for i, b in enumerate(data):
        if i >= window:
            h = (h - data[i - window] * base_pow) % MERSENNE61
        h = (h * _POLY_BASE + b) % MERSENNE61
        if i >= window - 1 and h < best:
            best = h
    return best


def fingerprints(sf_dir: str) -> ray.data.Dataset:
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        vals = [rolling_fingerprint(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {"doc_id": batch["doc_id"], "fingerprint": pa.array(vals, type=pa.int64())}
        )

    return docs.map_batches(f, batch_format="pyarrow")
