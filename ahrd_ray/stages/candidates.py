"""Mention detection — candidate-link generation (operators S3/S6 analogue).

A stateful actor-pool stage: each actor holds the broadcast tokenized catalog
+ alias index (loaded ONCE in ``__init__`` via ``ray.get`` of a shared
ObjectRef — the catalog is put in the object store once and mapped zero-copy
into every worker, never re-shipped per batch).  ``__call__`` is vectorized:
Arrow regex split for tokens, pandas merges against the alias table, numpy
arithmetic for the link features.

Output is the slim ``candidates`` table (FIXTURES.md F2): token lists never
travel with candidate rows — the scoring stage looks them up from the same
broadcast catalog by ``cand_ord``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ahrd_ray.config import TOKEN_SPLITTER_REGEX, EngineConfig
from ahrd_ray.sources import spec
from ahrd_ray.sources.synth import CatalogBundle

CANDIDATE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("lang", pa.string()),
        ("source", pa.string()),
        ("cand_ord", pa.int64()),
        ("e_rank", pa.float64()),
        ("match_score", pa.float64()),
        ("span_start", pa.int32()),
        ("span_end", pa.int32()),
        ("cand_start", pa.int32()),
        ("cand_end", pa.int32()),
        ("ingest_seq", pa.int64()),
        ("doc_len", pa.int64()),
        ("spart", pa.int32()),
    ]
)


class MentionDetector:
    """map_batches actor: pages/documents batch -> candidate links."""

    def __init__(self, catalog_ref, cfg: EngineConfig):
        import ray

        bundle: CatalogBundle = (
            ray.get(catalog_ref) if not isinstance(catalog_ref, CatalogBundle) else catalog_ref
        )
        self.bundle = bundle
        self.cfg = cfg
        self.num_parts = cfg.num_score_partitions
        # exploded alias table for vectorized merge
        toks, ords = [], []
        for w, arr in bundle.alias_index.items():
            toks.extend([w] * len(arr))
            ords.extend(arr.tolist())
        self.alias_df = pd.DataFrame(
            {"token": np.asarray(toks, dtype=object), "cand_ord": np.asarray(ords, dtype=np.int64)}
        )
        self.sources = bundle.arrays.source
        self.alias_tokens = self.alias_df["token"].unique()

    def __call__(self, batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(batch["text"])
        splits = pc.split_pattern_regex(low, pattern=TOKEN_SPLITTER_REGEX)
        if isinstance(splits, pa.ChunkedArray):
            splits = splits.combine_chunks()
        lengths = pc.list_value_length(splits).to_numpy(zero_copy_only=False)
        flat = splits.flatten().to_numpy(zero_copy_only=False)
        row_idx = np.repeat(np.arange(len(batch)), lengths)
        mask = flat != ""
        pairs = pd.DataFrame({"row": row_idx[mask], "token": flat[mask]}).drop_duplicates()
        # restrict to mention-lexicon tokens BEFORE any per-pair work
        pairs = pairs[pairs["token"].isin(self.alias_tokens)]
        if len(pairs) == 0:
            return CANDIDATE_SCHEMA.empty_table()

        doc_ids = batch["doc_id"].to_numpy()
        langs = np.asarray(batch["lang"].to_pylist(), dtype=object)
        low_py = np.asarray(low.to_pylist(), dtype=object)
        doc_lens = pc.utf8_length(batch["text"]).to_numpy(zero_copy_only=False).astype(np.int64)

        # per (doc, token) pair (small table): reading-order ingest position —
        # 1-based first occurrence of the mention in the lowercased text
        # (== DuckDB strpos) — and token length, computed BEFORE the alias
        # fan-out so the per-candidate hits table only does integer math.
        p_row = pairs["row"].to_numpy()
        p_tok = pairs["token"].to_numpy()
        pairs = pairs.assign(
            ingest=np.fromiter(
                (low_py[r].find(t) + 1 for r, t in zip(p_row, p_tok)),
                dtype=np.int64,
                count=len(p_row),
            ),
            tok_len=np.fromiter(
                (len(t) for t in p_tok), dtype=np.int64, count=len(p_tok)
            ),
        )
        hits = pairs.merge(self.alias_df, on="token", how="inner", sort=False)
        if len(hits) == 0:
            return CANDIDATE_SCHEMA.empty_table()

        row = hits["row"].to_numpy()
        ords = hits["cand_ord"].to_numpy()
        tok_len = hits["tok_len"].to_numpy()
        d = doc_ids[row].astype(np.int64)
        ingest = hits["ingest"].to_numpy()

        e_rank = ((ords * spec.E_RANK_MULT_P + d * spec.E_RANK_MULT_D) % spec.E_RANK_MOD).astype(
            np.float64
        ) / spec.E_RANK_DIV
        match_score = (
            (ords * spec.MS_MULT_P + d * spec.MS_MULT_D + tok_len) % spec.MS_MOD + spec.MS_OFF
        ).astype(np.float64)
        span_start = ingest
        span_end = ingest + tok_len
        cand_start = 1 + (ords % spec.CSTART_MOD)
        cand_end = cand_start + 1 + ((ords + d) % spec.CEND_MOD)

        return pa.table(
            {
                "doc_id": pa.array(d, type=pa.int64()),
                "lang": pa.array(langs[row], type=pa.string()),
                "source": pa.array(self.sources[ords], type=pa.string()),
                "cand_ord": pa.array(ords, type=pa.int64()),
                "e_rank": pa.array(e_rank, type=pa.float64()),
                "match_score": pa.array(match_score, type=pa.float64()),
                "span_start": pa.array(span_start, type=pa.int32()),
                "span_end": pa.array(span_end, type=pa.int32()),
                "cand_start": pa.array(cand_start, type=pa.int32()),
                "cand_end": pa.array(cand_end, type=pa.int32()),
                "ingest_seq": pa.array(ingest, type=pa.int64()),
                "doc_len": pa.array(doc_lens[row], type=pa.int64()),
                "spart": pa.array((d % self.num_parts).astype(np.int32), type=pa.int32()),
            }
        )
