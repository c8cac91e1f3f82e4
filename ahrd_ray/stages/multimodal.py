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


def _encode_fake(doc_id: int, img: np.ndarray) -> bytes:
    h, w = img.shape
    return MAGIC + struct.pack("<iii", int(doc_id), w, h) + img.tobytes()


class ImageResizer:
    """Actor-pool stage: decode (stub codec) -> nearest-neighbor resize
    (real numpy math — only the codec is faked) -> re-encoded payload.

    The resample index math is the exact shape a Pillow/opencv stage has;
    swapping the stub decoder for a real one changes no Ray-side plumbing."""

    def __init__(self, out_w: int = 16, out_h: int = 8, allow_fake: bool = True):
        self.out_w, self.out_h = out_w, out_h
        self.allow_fake = allow_fake
        # per-actor setup (once): resample index grids
        self._col_of = None
        self._row_of = None

    def _grids(self, w: int, h: int) -> tuple[np.ndarray, np.ndarray]:
        cols = (np.arange(self.out_w) * w) // self.out_w
        rows = (np.arange(self.out_h) * h) // self.out_h
        return rows, cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs, widths, heights = [], [], []
        for d, blob in zip(batch["doc_id"].to_pylist(), batch["media"].to_pylist()):
            img = decode_image(blob, allow_fake=self.allow_fake)
            h, w = img.shape
            rows, cols = self._grids(w, h)
            small = img[rows][:, cols]
            blobs.append(_encode_fake(d, small))
            heights.append(small.shape[0])
            widths.append(small.shape[1])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media": pa.array(blobs, type=pa.binary()),
                "width": pa.array(widths, type=pa.int32()),
                "height": pa.array(heights, type=pa.int32()),
            }
        )


def resized_images(
    sf_dir: str, out_w: int = 16, out_h: int = 8,
    concurrency: int | tuple = 2, batch_size: int = 64,
) -> ray.data.Dataset:
    return payloads_dataset(sf_dir).map_batches(
        ImageResizer,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h, "allow_fake": True},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampler:
    """Video analogue: the payload body is a sequence of h x w frames;
    emit every Nth frame as its own row (doc_id, frame_idx, frame:binary).

    Row-exploding map_batches with small batches — the layout a real
    ffmpeg-backed sampler produces; only the demux is faked."""

    def __init__(
        self, every_n: int = 4, frame_w: int = 8, frame_h: int = 8,
        allow_fake: bool = True,
    ):
        self.every_n = every_n
        self.frame_w, self.frame_h = frame_w, frame_h
        self.allow_fake = allow_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for d, blob in zip(batch["doc_id"].to_pylist(), batch["media"].to_pylist()):
            if blob[:4] != MAGIC:
                raise ValueError("bad media container")
            if not self.allow_fake:
                raise NotImplementedError(
                    "video demux requires a media library (not in this container)"
                )
            body = np.frombuffer(blob[16:], dtype=np.uint8)
            fsize = self.frame_w * self.frame_h
            n_frames = len(body) // fsize if fsize else 0
            for fi in range(0, n_frames, self.every_n):
                ids.append(d)
                idxs.append(fi)
                frames.append(body[fi * fsize : (fi + 1) * fsize].tobytes())
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "frame_idx": pa.array(idxs, type=pa.int32()),
                "frame": pa.array(frames, type=pa.binary()),
            }
        )


def sampled_frames(
    sf_dir: str, every_n: int = 4, frame_w: int = 8, frame_h: int = 8,
    concurrency: int | tuple = 2, batch_size: int = 64,
) -> ray.data.Dataset:
    return payloads_dataset(sf_dir).map_batches(
        FrameSampler,
        fn_constructor_kwargs={
            "every_n": every_n, "frame_w": frame_w, "frame_h": frame_h,
            "allow_fake": True,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
