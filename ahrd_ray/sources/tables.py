"""Ray Dataset readers over the corpus Parquet tables.

Always pass ``columns=[...]`` so only needed columns leave storage (read
pruning — a read that loads all columns for a 2-column transform is wrong at
100 TB).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ahrd_ray.config import TOKEN_SPLITTER_REGEX


def read_table(sf_dir: str, name: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def read_documents(sf_dir: str) -> ray.data.Dataset:
    return read_table(sf_dir, "documents", columns=["doc_id", "text", "lang"])


def doc_token_batch(batch: pa.Table) -> pa.Table:
    """Distinct (doc_id, token) pairs per document — vectorized Arrow kernel.

    Tokens use the AHRD splitter + lowercase WITHOUT a blacklist (document
    tokens are the mention-detection probe set, not description tokens).
    """
    import numpy as np
    import pandas as pd

    low = pc.utf8_lower(batch["text"])
    splits = pc.split_pattern_regex(low, pattern=TOKEN_SPLITTER_REGEX)
    flat = splits.combine_chunks().flatten() if isinstance(splits, pa.ChunkedArray) else splits.flatten()
    lengths = pc.list_value_length(splits).to_numpy(zero_copy_only=False)
    doc_ids = np.repeat(batch["doc_id"].to_numpy(), lengths)
    toks = flat.to_numpy(zero_copy_only=False)
    mask = toks != ""
    df = pd.DataFrame({"doc_id": doc_ids[mask], "token": toks[mask]})
    df = df.drop_duplicates()
    return pa.table(
        {
            "doc_id": pa.array(df["doc_id"].to_numpy(), type=pa.int64()),
            "token": pa.array(df["token"].to_numpy(), type=pa.string()),
        }
    )


def doc_tokens(sf_dir: str) -> ray.data.Dataset:
    """Distinct (doc_id, token) pairs over the corpus (operator S3 analogue:
    the mention stream the hit-table parser would read)."""
    return read_documents(sf_dir).map_batches(
        doc_token_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def corpus_vocab(sf_dir: str) -> list[str]:
    """Sorted distinct tokens of the corpus.

    Small-result aggregate: the distinct set is collected to the driver and
    broadcast into the catalog alias builder (SURVEY.md §2 S5-style unique
    collector).  At 100 TB the per-batch distinct keeps the shuffled volume
    at |vocab| x num_blocks, not corpus size.

    Only the ``kg_vocab`` registry query uses the FULL distinct set (its
    result IS the vocabulary table); the flagship pipeline setup uses the
    bounded :func:`corpus_vocab_bottomk` instead, which holds O(k) driver
    state at any corpus size.
    """

    def batch_distinct(batch: pa.Table) -> pa.Table:
        t = pc.unique(batch["token"])
        return pa.table({"token": t})

    ds = doc_tokens(sf_dir).map_batches(batch_distinct, batch_format="pyarrow")
    return sorted(ds.unique("token"))


def corpus_vocab_bottomk(sf_dir: str, k: int) -> list[str]:
    """First ``k`` tokens of the sorted distinct corpus vocabulary, as a
    distributed bottom-k — bit-identical to ``corpus_vocab(sf_dir)[:k]``
    with O(k) state everywhere.

    The flagship setup's only vocabulary consumer is the synthetic alias
    pick ``vocab[pk % ALIAS_MOD]`` guarded by ``r < len(vocab)``
    (sources/synth.py build_catalog), so the first ALIAS_MOD sorted tokens
    fully determine the catalog.  Round 3's ``sorted(ds.unique("token"))``
    collected the WHOLE distinct token set to the driver — billions of
    strings at web scale.  Shape here: per-block distinct + bottom-k partial
    (≤ k rows leave each block), then an AggregateFn whose accumulator is a
    sorted ≤k-element list merged pairwise — the driver only ever sees one
    O(k) list.  ``len(result) = min(|vocab|, k)`` so the ``r < len(vocab)``
    guard behaves identically on sub-k corpora.
    """
    import numpy as np

    from ray.data.aggregate import AggregateFn

    def batch_bottomk(batch: pa.Table) -> pa.Table:
        u = pc.unique(batch["token"])
        arr = np.sort(u.to_numpy(zero_copy_only=False))[:k]
        return pa.table({"token": pa.array(arr, type=pa.string())})

    def merge(a: list, b: list) -> list:
        return sorted(set(a) | set(b))[:k]

    def acc_block(a: list, block: pa.Table) -> list:
        return merge(a, block["token"].to_pylist())

    agg = AggregateFn(
        init=lambda _: [],
        merge=merge,
        accumulate_block=acc_block,
        finalize=lambda a: a,
        name="bottomk",
    )
    ds = doc_tokens(sf_dir).map_batches(batch_bottomk, batch_format="pyarrow")
    out = ds.aggregate(agg)
    return list(out["bottomk"]) if out else []
