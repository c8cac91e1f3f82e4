"""Shared one-sided Bloom-filter helpers for semi-join prefilters.

The 100-TB pattern: before a partitioned hash join whose probe side is huge
but whose build-side key set is comparatively small, reduce the build side
to ONE fixed-size bitmap (per-block partial bitmaps OR-reduced on the
driver — a constant-size reduction regardless of data size), broadcast it
once (``ray.put``), and drop probe rows MAP-SIDE before they enter the
shuffle.  Bloom filters are one-sided (no false negatives), so the
downstream join removes the false positives and the result stays EXACT —
the SQL oracle is the plain join.

Used by ``generic.bloom_semi_join_revenue`` (urgent-order lineitems) and
``dedup.minhash_lsh_pairs`` (candidate-doc shingle prefilter before the
Jaccard verify joins).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

import ray

BLOOM_M_BITS = 1 << 17  # 16 KiB bitmap
BLOOM_K = 4
# splitmix64/wyhash-style odd multipliers (public constants)
_BLOOM_MULTS = (
    0x9E3779B97F4A7C15,
    0xC2B2AE3D27D4EB4F,
    0xD6E8FEB86659FD93,
    0xA0761D6478BD642F,
)

_N_WORDS = BLOOM_M_BITS // 64
_SHIFT = np.uint64(64 - BLOOM_M_BITS.bit_length() + 1)


def bloom_positions(keys: np.ndarray, j: int) -> np.ndarray:
    """Bit position of hash j for each key: top log2(M) bits of the
    multiplicative hash (uint64 wraparound both sides)."""
    h = keys.astype(np.uint64) * np.uint64(_BLOOM_MULTS[j])
    return (h >> _SHIFT).astype(np.int64)


def bloom_insert(bitmap: np.ndarray, keys: np.ndarray) -> None:
    """Set the K bits of each key in a (BLOOM_M_BITS/64,) uint64 bitmap."""
    if len(keys) == 0:
        return
    for j in range(BLOOM_K):
        pos = bloom_positions(keys, j)
        np.bitwise_or.at(
            bitmap, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64)
        )


def bloom_test(bitmap: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Boolean keep-mask: True where all K bits are set (maybe-member)."""
    keep = np.ones(len(keys), dtype=bool)
    for j in range(BLOOM_K):
        pos = bloom_positions(keys, j)
        keep &= (
            bitmap[pos >> 6] >> (pos & 63).astype(np.uint64) & np.uint64(1)
        ).astype(bool)
    return keep


def build_bloom_ref(ds: "ray.data.Dataset", cols: Sequence[str]):
    """Distributed bitmap build: one 16 KiB partial per block, OR-reduced on
    the driver (constant-size regardless of ``ds`` size), broadcast once.

    ``cols`` may name several integer key columns (e.g. both ends of a pair
    table); every column's values are inserted."""
    cols = list(cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        bm = np.zeros(_N_WORDS, dtype=np.uint64)
        for c in cols:
            bloom_insert(bm, df[c].to_numpy())
        return pd.DataFrame({"bm": [bm.tobytes()]})

    parts = ds.map_batches(partial, batch_format="pandas").take_all()
    bitmap = np.zeros(_N_WORDS, dtype=np.uint64)
    for r in parts:
        bitmap |= np.frombuffer(r["bm"], dtype=np.uint64)
    return ray.put(bitmap)
