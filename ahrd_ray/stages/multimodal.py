"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed —
``decode_image`` raises ``NotImplementedError`` unless the deterministic
fake decoder is selected — but everything Ray-side is real and tested:
binary-column schema, actor-pool stage with per-actor model/codec setup,
small-batch sizing for large payloads, and the typed feature output layout.

``payloads_dataset`` manufactures a binary column from the corpus (documents
text bytes wrapped in a tiny header) purely so the plumbing has bytes to
move; a real deployment points ``read_parquet`` at a table with
(id, media:binary, media_type, width, height) columns instead.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

import ray.data

MAGIC = b"ARIM"  # fake media container magic


def payloads_dataset(sf_dir: str) -> ray.data.Dataset:
    """documents -> (doc_id, media:binary, media_type) opaque payloads."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def wrap(batch: pa.Table) -> pa.Table:
        blobs = []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            body = t.encode("utf-8")
            w = 32 + (d % 97)
            h = 16 + (d % 53)
            blobs.append(MAGIC + struct.pack("<iii", int(d), w, h) + body)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media": pa.array(blobs, type=pa.binary()),
                "media_type": pa.array(["image/fake"] * len(batch), type=pa.string()),
            }
        )

    return docs.map_batches(wrap, batch_format="pyarrow")


def decode_image(blob: bytes, allow_fake: bool = False) -> np.ndarray:
    """STUB — real image decoding needs an image codec library that is not
    available in this container.  ``allow_fake=True`` selects the
    deterministic fake decoder (byte-histogram 'pixels') used to exercise
    the pipeline plumbing end-to-end."""
    if not allow_fake:
        raise NotImplementedError(
            "image decode requires an image codec library (not in this container); "
            "pass allow_fake=True for the deterministic stub decoder"
        )
    if blob[:4] != MAGIC:
        raise ValueError("bad media container")
    _doc, w, h = struct.unpack("<iii", blob[4:16])
    body = np.frombuffer(blob[16:], dtype=np.uint8)
    pad = (-len(body)) % (w * h) if w * h else 0
    body = np.pad(body, (0, pad))[: w * h]
    return body.reshape(h, w) if len(body) == w * h else np.zeros((h, w), dtype=np.uint8)


class MediaFeatureExtractor:
    """Actor-pool stage: per-actor 'model' setup in __init__, small batches
    because payloads are large.  Emits fixed-width feature vectors +
    dimensions — the real output layout a CLIP/whisper-style stage
    would produce."""

    N_FEATURES = 16

    def __init__(self, allow_fake: bool = True):
        # per-actor setup (once): bin edges of the byte histogram 'model'
        self.allow_fake = allow_fake
        self.bins = np.linspace(0, 256, self.N_FEATURES + 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, widths, heights = [], [], []
        for blob in batch["media"].to_pylist():
            img = decode_image(blob, allow_fake=self.allow_fake)
            h, w = img.shape
            hist, _ = np.histogram(img, bins=self.bins)
            total = hist.sum()
            feats.append((hist / total if total else hist).astype(np.float32))
            widths.append(w)
            heights.append(h)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "width": pa.array(widths, type=pa.int32()),
                "height": pa.array(heights, type=pa.int32()),
                "features": pa.array(
                    [f.tolist() for f in feats], type=pa.list_(pa.float32())
                ),
            }
        )


def media_features(
    sf_dir: str, concurrency: int | tuple = 2, batch_size: int = 64
) -> ray.data.Dataset:
    """payloads -> features via the actor-pool stage (small batch_size: a
    batch x concurrency of decoded media must fit a worker's heap)."""
    return payloads_dataset(sf_dir).map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"allow_fake": True},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
