"""Deduplication operators over the ``documents`` table.

Five dedup families, all expressed Ray-Data-first:

* exact (sha256 hash-partition + per-group min) — SQL-oracle-checked;
* word-n-gram Jaccard near-dup pairs (exact, shingle-explode + self-join) —
  SQL-oracle-checked, and the ground truth for the approximate methods;
* MinHash + LSH banding (shingle -> minhash -> band buckets -> candidate
  pairs -> exact-verify) — approximate, validated in pytest against the
  exact pairs (recall at high threshold);
* SimHash (64-bit, 4-band blocking, Hamming <= radius);
* embedding-cosine near-dup (quantized-exact dot products) —
  SQL-oracle-checked.

Scale notes: every stage shuffles only (key, doc_id) pairs or band buckets —
never full documents; shingle hashing is vectorized numpy; hot buckets are
bounded by banding width.  Deterministic hashing uses a fixed-coefficient
polynomial over utf-8 bytes (no Python ``hash``, no seeds).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ahrd_ray.config import QUANT

MERSENNE61 = (1 << 61) - 1
_POLY_BASE = 1000003


def polyhash_tokens(tokens: list[str]) -> np.ndarray:
    """Deterministic 61-bit hash per token (vector-friendly, seedless)."""
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        h = 0
        for b in t.encode("utf-8"):
            h = (h * _POLY_BASE + b) % MERSENNE61
        out[i] = h
    return out


def shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Distinct hashed word n-grams of a document."""
    words = text.split(" ")
    if len(words) < n:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
    return np.unique(polyhash_tokens(grams))


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def _sha_batch(batch: pa.Table) -> pa.Table:
    shas = [hashlib.sha256(t.encode("utf-8")).hexdigest() for t in batch["text"].to_pylist()]
    return pa.table({"doc_id": batch["doc_id"], "text_sha": pa.array(shas, type=pa.string())})


def _min_per_sha(df: pd.DataFrame) -> pd.DataFrame:
    keep = df.groupby("text_sha", as_index=False)["doc_id"].min()
    return keep[["doc_id", "text_sha"]]


def exact_dedup(sf_dir: str) -> ray.data.Dataset:
    """Keep the lowest doc_id per byte-identical text.

    Hash-partition by sha256(text) (shuffling 64-byte keys, not documents),
    per-group first — the canonical exact-dedup shape at 100 TB.
    """
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    hashed = docs.map_batches(_sha_batch, batch_format="pyarrow")
    # map-side partial: one candidate per sha per block before the shuffle
    partial = hashed.map_batches(_min_per_sha, batch_format="pandas")
    return partial.groupby("text_sha").map_groups(_min_per_sha, batch_format="pandas")


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard pairs (ground truth)
# ---------------------------------------------------------------------------

def _shingle_batch(batch: pa.Table, n: int) -> pa.Table:
    ids, hs = [], []
    for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        sh = shingle_hashes(t, n)
        ids.extend([d] * len(sh))
        hs.extend(sh.tolist())
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "sh": pa.array(np.asarray(hs, dtype=np.uint64).astype(np.int64), type=pa.int64()),
        }
    )


N_PAIR_PARTS = 32


def _empty_pairs(a: str = "doc_a", b: str = "doc_b") -> pd.DataFrame:
    return pd.DataFrame({a: pd.Series([], dtype="int64"), b: pd.Series([], dtype="int64")})


def _self_join_pairs(key_cols: list[str], id_col: str, a: str = "doc_a", b: str = "doc_b"):
    """Vectorized within-partition self-join: all (x < y) id pairs sharing a
    key.  Called once per hash PARTITION (few, large groups), never per key."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return _empty_pairs(a, b)
        m = df.merge(df, on=key_cols, suffixes=("_x", "_y"))
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        out = m.rename(columns={f"{id_col}_x": a, f"{id_col}_y": b})[[a, b]]
        return out.astype({a: "int64", b: "int64"})

    return f


def ngram_jaccard_pairs(
    sf_dir: str, n: int = 3, threshold: float = 0.5
) -> ray.data.Dataset:
    """All doc pairs with word-n-gram Jaccard >= threshold (doc_a < doc_b).

    Shape: shingle-explode -> hash-partition by shingle -> vectorized
    within-partition self-join (pairs per co-occurring shingle) ->
    hash-partition by pair -> intersection counts -> sizes lookup -> filter.
    Shuffles only integer ids; per-partition work is pandas merges, not
    per-key Python.  Output: (doc_a, doc_b, jaccard).
    """
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    shingles = docs.map_batches(lambda b: _shingle_batch(b, n), batch_format="pyarrow")

    def add_spart(batch: pa.Table) -> pa.Table:
        sp = (batch["sh"].to_numpy() % N_PAIR_PARTS).astype(np.int32)
        return batch.append_column("spart", pa.array(sp, type=pa.int32()))

    co = (
        shingles.map_batches(add_spart, batch_format="pyarrow")
        .groupby("spart")
        .map_groups(_self_join_pairs(["sh"], "doc_id"), batch_format="pandas")
    )

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["doc_a", "doc_b"], as_index=False).size()
        out = out.rename(columns={"size": "inter"})
        out["ppart"] = ((out["doc_a"] * 1000003 + out["doc_b"]) % N_PAIR_PARTS).astype(
            "int32"
        )
        return out

    inter = (
        co.map_batches(partial_counts, batch_format="pandas")
        .groupby("ppart")
        .map_groups(
            lambda df: df.groupby(["doc_a", "doc_b"], as_index=False)["inter"].sum(),
            batch_format="pandas",
        )
    )

    # doc shingle-set sizes: small per-doc aggregate, broadcast to the
    # finisher (at 100 TB this becomes a co-partitioned join on doc_a/doc_b)
    def size_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("doc_id", as_index=False).size().rename(columns={"size": "n_sh"})
        out["dpart"] = (out["doc_id"] % N_PAIR_PARTS).astype("int32")
        return out

    sizes_df = (
        shingles.map_batches(size_partial, batch_format="pandas")
        .groupby("dpart")
        .map_groups(
            lambda df: df.groupby("doc_id", as_index=False)["n_sh"].sum(),
            batch_format="pandas",
        )
        .to_pandas()
    )
    sizes = dict(zip(sizes_df["doc_id"].astype(int), sizes_df["n_sh"].astype(int)))
    sizes_ref = ray.put(sizes)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        from ahrd_ray.stages.score import get_broadcast

        sz = get_broadcast(sizes_ref)
        na = df["doc_a"].map(sz).to_numpy(dtype=np.float64)
        nb = df["doc_b"].map(sz).to_numpy(dtype=np.float64)
        inter_ = df["inter"].to_numpy(dtype=np.float64)
        j = inter_ / (na + nb - inter_)
        out = df.assign(jaccard=j)
        return out[out["jaccard"] >= threshold][["doc_a", "doc_b", "jaccard"]]

    return inter.map_batches(finish, batch_format="pandas")


def _dedup_bucket_pairs(
    banded: ray.data.Dataset, key_cols: list[str], part_col: str, id_col: str
) -> ray.data.Dataset:
    """banded (id, *key_cols) -> distinct candidate (doc_a < doc_b) pairs.

    Hash-partition by the bucket key, vectorized self-join per PARTITION,
    partial pair-dedup map-side, exact dedup in a pair-keyed partition —
    never a per-bucket or per-pair Python call.
    """

    def add_part(batch: pa.Table) -> pa.Table:
        sp = (batch[part_col].to_numpy() % N_PAIR_PARTS).astype(np.int32)
        return batch.append_column("bpart", pa.array(sp, type=pa.int32()))

    co = (
        banded.map_batches(add_part, batch_format="pyarrow")
        .groupby("bpart")
        .map_groups(_self_join_pairs(key_cols, id_col), batch_format="pandas")
    )

    def partial_dedup(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop_duplicates(["doc_a", "doc_b"])
        out = out.assign(
            ppart=((out["doc_a"] * 1000003 + out["doc_b"]) % N_PAIR_PARTS).astype("int32")
        )
        return out

    return (
        co.map_batches(partial_dedup, batch_format="pandas")
        .groupby("ppart")
        .map_groups(
            lambda df: df.drop_duplicates(["doc_a", "doc_b"])[["doc_a", "doc_b"]],
            batch_format="pandas",
        )
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

N_HASHES = 64
N_BANDS = 16  # 16 bands x 4 rows
ROWS_PER_BAND = N_HASHES // N_BANDS
# fixed odd multipliers/addends (split-mix style, seedless/deterministic)
_A = (np.arange(1, N_HASHES + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
_B = np.arange(1, N_HASHES + 1, dtype=np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)


def minhash_signature(sh: np.ndarray) -> np.ndarray:
    """64 minhashes of a shingle-hash set (universal-hash family)."""
    if len(sh) == 0:
        return np.full(N_HASHES, np.iinfo(np.uint64).max, dtype=np.uint64)
    # (n_hashes, n_shingles): h_i(x) = (a_i * x + b_i) mod 2^64
    v = _A[:, None] * sh[None, :] + _B[:, None]
    return v.min(axis=1)


def minhash_lsh_pairs(
    sf_dir: str, n: int = 3, threshold: float = 0.5
) -> ray.data.Dataset:
    """Approximate near-dup pairs: minhash -> band buckets -> candidate pairs
    -> exact Jaccard verify.  Output: (doc_a, doc_b, jaccard) with
    jaccard >= threshold for pairs surfaced by any band collision."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def sig_batch(batch: pa.Table) -> pa.Table:
        ids, bands, buckets = [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sig = minhash_signature(shingle_hashes(t, n))
            for band in range(N_BANDS):
                chunk = sig[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]
                digest = hashlib.sha1(chunk.tobytes()).digest()[:8]
                ids.append(d)
                bands.append(band)
                buckets.append(int.from_bytes(digest, "little", signed=True))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "band": pa.array(bands, type=pa.int32()),
                "bucket": pa.array(buckets, type=pa.int64()),
            }
        )

    banded = docs.map_batches(sig_batch, batch_format="pyarrow")
    cand = _dedup_bucket_pairs(banded, ["band", "bucket"], "bucket", "doc_id")

    # exact verify against broadcast shingle sets (documents are the small
    # side at test scale; at 100 TB verification joins shingle sets by pair
    # partition instead)
    texts = {
        int(r["doc_id"]): r["text"]
        for r in docs.take_all()
    }
    texts_ref = ray.put(texts)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        from ahrd_ray.stages.score import get_broadcast

        tx = get_broadcast(texts_ref)
        rows = []
        for a, b in zip(df["doc_a"], df["doc_b"]):
            sa = shingle_hashes(tx[int(a)], n)
            sb = shingle_hashes(tx[int(b)], n)
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            j = inter / (len(sa) + len(sb) - inter)
            if j >= threshold:
                rows.append((int(a), int(b), j))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"]).astype(
            {"doc_a": "int64", "doc_b": "int64", "jaccard": "float64"}
        )

    return cand.map_batches(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(tokens: list[str]) -> int:
    """Classic 64-bit simhash over token hashes (unweighted)."""
    if not tokens:
        return 0
    hs = polyhash_tokens(tokens)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out.astype(np.int64))


def simhash_table(sf_dir: str) -> ray.data.Dataset:
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        vals = [simhash64(t.split(" ")) for t in batch["text"].to_pylist()]
        return pa.table(
            {"doc_id": batch["doc_id"], "simhash": pa.array(vals, type=pa.int64())}
        )

    return docs.map_batches(f, batch_format="pyarrow")


def simhash_pairs(sf_dir: str, radius: int = 3) -> ray.data.Dataset:
    """Near-dup pairs with Hamming distance <= radius via 4-band blocking
    (any pair within radius 3 shares at least one exact 16-bit band)."""
    sh = simhash_table(sf_dir)

    def band_batch(batch: pa.Table) -> pa.Table:
        ids, bands, keys = [], [], []
        for d, v in zip(batch["doc_id"].to_pylist(), batch["simhash"].to_pylist()):
            u = np.uint64(np.int64(v).astype(np.uint64))
            for band in range(4):
                ids.append(d)
                bands.append(band)
                keys.append(int((u >> np.uint64(16 * band)) & np.uint64(0xFFFF)))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "band": pa.array(bands, type=pa.int32()),
                "key": pa.array(keys, type=pa.int64()),
            }
        )

    banded = sh.map_batches(band_batch, batch_format="pyarrow")
    hashes = {int(r["doc_id"]): int(r["simhash"]) for r in sh.take_all()}
    hashes_ref = ray.put(hashes)
    cand = _dedup_bucket_pairs(banded, ["band", "key"], "key", "doc_id")

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        from ahrd_ray.stages.score import get_broadcast

        hmap = get_broadcast(hashes_ref)
        rows = []
        for a, b in zip(df["doc_a"], df["doc_b"]):
            x = np.uint64(np.int64(hmap[int(a)]).astype(np.uint64)) ^ np.uint64(
                np.int64(hmap[int(b)]).astype(np.uint64)
            )
            dist = bin(int(x)).count("1")
            if dist <= radius:
                rows.append((int(a), int(b), dist))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"]).astype(
            {"doc_a": "int64", "doc_b": "int64", "hamming": "int64"}
        )

    return cand.map_batches(verify, batch_format="pandas")
