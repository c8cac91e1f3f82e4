"""Shared one-sided Bloom-filter helpers for semi-join prefilters.

The 100-TB pattern: before a partitioned hash join whose probe side is huge
but whose build-side key set is comparatively small, reduce the build side
to ONE fixed-size bitmap (per-block partial bitmaps OR-reduced on the
driver — a constant-size reduction regardless of data size), broadcast it
once (``ray.put``), and drop probe rows MAP-SIDE before they enter the
shuffle.  Bloom filters are one-sided (no false negatives), so the
downstream join removes the false positives and the result stays EXACT —
the SQL oracle is the plain join.

Bitmap sizing: the filter only helps while the false-positive rate stays
low, so ``build_bloom_ref`` scales the bitmap to the build-side key count
when the caller knows it (materialized build sides make ``count()`` a
metadata read): ~16 bits/key, power-of-two, floor 2^17 (16 KiB), cap 2^27
(16 MiB — still broadcast-cheap).  The test/insert kernels derive the size
from the bitmap length, so a bitmap built at any size keeps working at
every probe site.

Used by ``generic.bloom_semi_join_revenue`` (urgent-order lineitems),
``dedup.minhash_lsh_pairs`` / ``dedup.substring_spans`` (candidate-doc /
duplicated-gram prefilters before the verify joins), ``dedup.decontaminate``
(benchmark-shingle prefilter) and ``simsearch.embedding_near_dup_pairs``.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

import ray

BLOOM_M_BITS = 1 << 17  # default/floor bitmap size in bits
BLOOM_M_BITS_MAX = 1 << 27  # 16 MiB cap — still broadcast-cheap
BLOOM_BITS_PER_KEY = 16  # target load factor (k=4 -> fp ~ 2e-3)
BLOOM_K = 4
# splitmix64/wyhash-style odd multipliers (public constants)
_BLOOM_MULTS = (
    0x9E3779B97F4A7C15,
    0xC2B2AE3D27D4EB4F,
    0xD6E8FEB86659FD93,
    0xA0761D6478BD642F,
)


def bloom_positions(keys: np.ndarray, j: int, m_bits: int = BLOOM_M_BITS) -> np.ndarray:
    """Bit position of hash j for each key: top log2(M) bits of the
    multiplicative hash (uint64 wraparound both sides)."""
    h = keys.astype(np.uint64) * np.uint64(_BLOOM_MULTS[j])
    return (h >> np.uint64(64 - m_bits.bit_length() + 1)).astype(np.int64)


def _m_bits_of(bitmap: np.ndarray) -> int:
    return len(bitmap) * 64


def bloom_insert(bitmap: np.ndarray, keys: np.ndarray) -> None:
    """Set the K bits of each key; bitmap size derived from the array."""
    if len(keys) == 0:
        return
    m_bits = _m_bits_of(bitmap)
    for j in range(BLOOM_K):
        pos = bloom_positions(keys, j, m_bits)
        np.bitwise_or.at(
            bitmap, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64)
        )


def bloom_test(bitmap: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Boolean keep-mask: True where all K bits are set (maybe-member)."""
    m_bits = _m_bits_of(bitmap)
    keep = np.ones(len(keys), dtype=bool)
    for j in range(BLOOM_K):
        pos = bloom_positions(keys, j, m_bits)
        keep &= (
            bitmap[pos >> 6] >> (pos & 63).astype(np.uint64) & np.uint64(1)
        ).astype(bool)
    return keep


def _size_bits(n_keys: int | None) -> int:
    if not n_keys or n_keys <= 0:
        return BLOOM_M_BITS
    want = n_keys * BLOOM_BITS_PER_KEY
    m = BLOOM_M_BITS
    while m < want and m < BLOOM_M_BITS_MAX:
        m <<= 1
    return m


def build_bloom_ref(
    ds: "ray.data.Dataset", cols: Sequence[str], n_keys: int | None = None
):
    """Distributed bitmap build: one fixed-size partial per block,
    OR-reduced on the driver (constant-size regardless of ``ds`` size),
    broadcast once.

    ``cols`` may name several integer key columns (e.g. both ends of a pair
    table); every column's values are inserted.  Pass ``n_keys`` (e.g.
    ``ds.count()`` on a materialized build side — a metadata read) so the
    bitmap scales with the key set instead of saturating past ~20k keys."""
    cols = list(cols)
    m_bits = _size_bits(n_keys)
    n_words = m_bits // 64

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        bm = np.zeros(n_words, dtype=np.uint64)
        for c in cols:
            bloom_insert(bm, df[c].to_numpy())
        return pd.DataFrame({"bm": [bm.tobytes()]})

    parts = ds.map_batches(partial, batch_format="pandas").take_all()
    bitmap = np.zeros(n_words, dtype=np.uint64)
    for r in parts:
        bitmap |= np.frombuffer(r["bm"], dtype=np.uint64)
    return ray.put(bitmap)
