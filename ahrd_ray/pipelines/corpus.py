"""End-to-end LLM pretraining-corpus composition.

The cleaning pipeline every web-scale training-data run executes —
exact dedup -> Gopher quality gate -> benchmark decontamination (-> near-dup
removal) — chained over ONE corpus as a single Dataset pipeline.  Each
stage is the SAME code the standalone registry queries run (``dd_exact``,
``tx_filtered_docs``, ``dd_decontaminate``, ``dd_dedup_docs``); this module
only wires their outputs together, so the composed result is oracle-gated
end-to-end by composing the same SQL.

Output manifest: (doc_id, n_tokens, quality) of documents that
  1. are the exact-dedup representative of their byte-identical group
     (lowest doc_id per sha256),
  2. pass the Gopher gate (length / stopword-ratio / TTR bounds),
  3. are not benchmark docs and share no word-shingle with any benchmark
     doc (zero-tolerance decontamination).

Scale shape: the quality gate is a pure map-side filter; the dedup
survivors arrive by one hash join on doc_id; contamination is removed by a
distributed left-anti join against the (small) contaminated-doc table.
EVERY join in the composition — including decontaminate's internal one —
shares a single ``n_joins`` budget equal to the pipeline's total open join
count (3 here, 4 with near-dup removal), so the up-front aggregator
reservation respects the per-pipeline cap ``join_parts`` documents.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data

# open joins held by each composition (decontaminate's internal join +
# dedup-survivors join + left-anti; +1 for the near-dup representatives)
N_JOINS_CLEAN = 3
N_JOINS_NEARDUP = 4


def clean_corpus(sf_dir: str, n_joins: int = N_JOINS_CLEAN) -> ray.data.Dataset:
    from ahrd_ray.stages.dedup import BENCH_DOC_MOD, _join, decontaminate, exact_dedup
    from ahrd_ray.stages.textstats import filtered_docs

    def not_bench(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return t.filter(pa.array(ids % BENCH_DOC_MOD != 0)).select(
            ["doc_id", "n_tokens", "quality"]
        )

    feats = filtered_docs(sf_dir).map_batches(
        not_bench, batch_format="pyarrow", zero_copy_batch=True
    )

    survivors = exact_dedup(sf_dir).map_batches(
        lambda df: df[["doc_id"]], batch_format="pandas"
    )

    deduped = _join(
        feats, survivors, on=("doc_id",), right_on=("doc_id",), n_joins=n_joins
    )

    contaminated = decontaminate(sf_dir, n_joins=n_joins).map_batches(
        lambda df: df[["doc_id"]], batch_format="pandas"
    )

    clean = _join(
        deduped,
        contaminated,
        on=("doc_id",),
        right_on=("doc_id",),
        n_joins=n_joins,
        join_type="left_anti",
    )

    return clean.map_batches(
        lambda df: df[["doc_id", "n_tokens", "quality"]], batch_format="pandas"
    )


def clean_corpus_neardup(sf_dir: str) -> ray.data.Dataset:
    """``clean_corpus`` plus near-duplicate REMOVAL: only the SimHash
    cluster representatives survive (``dedup_docs`` semantics — smallest
    doc_id per transitive near-dup cluster).  The full production cleaning
    chain: exact dedup -> quality gate -> decontamination -> near-dup
    removal, one Dataset pipeline."""
    from ahrd_ray.stages.dedup import _join, dedup_docs

    base = clean_corpus(sf_dir, n_joins=N_JOINS_NEARDUP)
    reps = dedup_docs(sf_dir).map_batches(
        lambda df: df[["doc_id"]], batch_format="pandas"
    )
    kept = _join(
        base, reps, on=("doc_id",), right_on=("doc_id",), n_joins=N_JOINS_NEARDUP
    )
    return kept.map_batches(
        lambda df: df[["doc_id", "n_tokens", "quality"]], batch_format="pandas"
    )
