"""Line-oriented source formats: JSONL and CSV readers.

Web-text corpora arrive as JSONL shards at least as often as Parquet
(Common-Crawl-derived sets, exported crawl logs), so the engine reads both.
Fixtures are rendered ONCE per sf_dir from the canonical parquet tables with
the engine's own distributed writers (Dataset.write_json / write_csv — one
file per block, the resumable-output layout), then read back with
``ray.data.read_json`` / ``read_csv``; the paired oracle selects straight
from the parquet view, so the correctness gate proves the full
write->read roundtrip is value-exact (doubles survive via shortest-roundtrip
formatting; timestamps via explicit Arrow column_types on the CSV reader
rather than inference).

Scale: both readers stream file-per-block with column projection pushed to
the Arrow readers; nothing driver-side.
"""

from __future__ import annotations

import hashlib
import os
import struct

import pyarrow as pa
import pyarrow.csv as pacsv

import ray.data

FIXTURE_VERSION = "1"

DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]
# the real shard schema — empty-batch fallbacks must emit THIS, not
# all-string columns, or an empty binary-files block poisons downstream
# schema unification (doc_id/n_chars are int64 in every real shard)
DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
        ("n_chars", pa.int64()),
    ]
)
EVENT_SCHEMA = {
    "event_id": pa.int64(),
    "ts": pa.timestamp("us"),
    "user_id": pa.int64(),
    "event_type": pa.string(),
    "value": pa.float64(),
    "props": pa.string(),
}


def _fixture_dir(sf_dir: str, kind: str) -> str:
    tag = hashlib.sha1(f"{sf_dir}:{kind}:v{FIXTURE_VERSION}".encode()).hexdigest()[:12]
    return f"/tmp/ahrd_ray_formats/{kind}-{tag}"


def _render(sf_dir: str, kind: str, write) -> str:
    out_dir = _fixture_dir(sf_dir, kind)
    # marker lives BESIDE the data dir so format readers never see it
    done = out_dir + ".done"
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    write(out_dir)
    with open(done, "w") as f:
        f.write("ok")
    return out_dir


def documents_jsonl_dir(sf_dir: str) -> str:
    """Documents as JSONL shards (one file per input block)."""

    def write(out_dir: str) -> None:
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=DOC_COLS).write_json(
            out_dir
        )

    return _render(sf_dir, "docs-jsonl", write)


def read_documents_jsonl(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_json(documents_jsonl_dir(sf_dir))
    return ds.select_columns(DOC_COLS)


def events_csv_dir(sf_dir: str) -> str:
    """Events as CSV shards."""

    def write(out_dir: str) -> None:
        ray.data.read_parquet(f"{sf_dir}/events.parquet").write_csv(out_dir)

    return _render(sf_dir, "events-csv", write)


def read_events_csv(sf_dir: str) -> ray.data.Dataset:
    # explicit column types: CSV carries no schema, and inferring timestamps
    # or wide ints per file invites per-shard divergence at scale
    convert = pacsv.ConvertOptions(column_types=EVENT_SCHEMA)
    ds = ray.data.read_csv(events_csv_dir(sf_dir), convert_options=convert)
    return ds.select_columns(list(EVENT_SCHEMA))


def documents_partitioned_dir(sf_dir: str) -> str:
    """Documents as hive-partitioned parquet (one directory per lang) —
    the resumable-output layout this engine writes at scale: a failed run
    re-lists finished partition directories and skips them."""

    def write(out_dir: str) -> None:
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=DOC_COLS).write_parquet(
            out_dir, partition_cols=["lang"]
        )

    return _render(sf_dir, "docs-part", write)


def read_documents_partitioned(sf_dir: str) -> ray.data.Dataset:
    ds = ray.data.read_parquet(documents_partitioned_dir(sf_dir))

    def fix(batch: "pa.Table") -> "pa.Table":
        # hive partition values come back dictionary-encoded; restore the
        # plain string column and the canonical column order
        lang = batch["lang"]
        if pa.types.is_dictionary(lang.type):
            lang = lang.cast(pa.string())
        cols = {c: batch[c] for c in DOC_COLS if c != "lang"}
        cols["lang"] = lang
        return pa.table({c: cols[c] for c in DOC_COLS})

    return ds.map_batches(fix, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Schema evolution: mixed-schema shard directory unified at the read
# ---------------------------------------------------------------------------

# legacy shard column names -> canonical (the v1 -> v2 rename a long-lived
# corpus accumulates; shards from both eras coexist in one directory)
LEGACY_DOC_MAP = {"id": "doc_id", "body": "text", "language": "lang"}


def documents_evolved_dir(sf_dir: str) -> str:
    """A shard directory spanning a schema migration: even doc_ids written
    with the CANONICAL schema (doc_id, text, lang), odd doc_ids with the
    LEGACY one (id, body, language) — the mixed layout a real corpus has
    mid-migration."""

    def write(out_dir: str) -> None:
        import pyarrow as pa_

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
        )

        def new_half(t: "pa.Table") -> "pa.Table":
            import pyarrow.compute as pc_

            return t.filter(pc_.equal(pc_.bit_wise_and(t["doc_id"], 1), 0))

        def old_half(t: "pa.Table") -> "pa.Table":
            import pyarrow.compute as pc_

            t = t.filter(pc_.equal(pc_.bit_wise_and(t["doc_id"], 1), 1))
            return t.rename_columns(["id", "body", "language"])

        docs.map_batches(new_half, batch_format="pyarrow").write_parquet(
            f"{out_dir}/new"
        )
        docs.map_batches(old_half, batch_format="pyarrow").write_parquet(
            f"{out_dir}/old"
        )

    return _render(sf_dir, "docs-evolved", write)


def read_documents_evolved(
    sf_dir: str, column_map: dict[str, str] | None = None
) -> ray.data.Dataset:
    """Unified read over a mixed-schema shard directory: files are grouped
    by schema signature (one cheap footer read per file — metadata only,
    no data IO), each group streams through its own ``read_parquet``, legacy
    groups rename to canonical, and the union is one Dataset with ONE
    schema.  A plain ``read_parquet`` over such a directory fails on the
    schema mismatch; this is the migration-tolerant read path."""
    import pyarrow.parquet as pq_

    column_map = column_map or LEGACY_DOC_MAP
    root = documents_evolved_dir(sf_dir)
    files_by_sig: dict[tuple, list[str]] = {}
    for dirpath, _, names in os.walk(root):
        for n in sorted(names):
            if not n.endswith(".parquet"):
                continue
            p = os.path.join(dirpath, n)
            sig = tuple(pq_.read_schema(p).names)
            files_by_sig.setdefault(sig, []).append(p)

    parts = []
    for sig, files in sorted(files_by_sig.items()):
        ds = ray.data.read_parquet(files)
        rename = {c: column_map[c] for c in sig if c in column_map}
        if rename:
            canonical = [column_map.get(c, c) for c in sig]
            ds = ds.map_batches(
                lambda t, _names=canonical: t.rename_columns(_names),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        ds = ds.select_columns(["doc_id", "text", "lang"])
        parts.append(ds)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def read_documents_pruned(sf_dir: str, lang: str = "en") -> ray.data.Dataset:
    """Partition-pruned read: only the ``lang=<x>`` directory of the
    hive-partitioned layout is listed and read — the other partitions'
    bytes never leave storage (prune-at-the-read, the 100-TB rule).  The
    partition value returns as a constant column."""
    ds = ray.data.read_parquet(f"{documents_partitioned_dir(sf_dir)}/lang={lang}")

    def fix(batch: "pa.Table") -> "pa.Table":
        cols = {c: batch[c] for c in DOC_COLS if c != "lang"}
        cols["lang"] = pa.array([lang] * len(batch), type=pa.string())
        return pa.table({c: cols[c] for c in DOC_COLS})

    return ds.map_batches(fix, batch_format="pyarrow")


def documents_ipc_dir(sf_dir: str) -> str:
    """Documents as Arrow IPC (Feather v2) shards — the zero-copy
    interchange format Arrow-native pipelines hand each other.  Written
    one file per block by the map tasks themselves (deterministic
    min-doc_id names — the same resumable file-per-partition layout as the
    other sinks); uncompressed so the reader needs no codec."""
    import pyarrow.feather as feather

    def write(out_dir: str) -> None:
        ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=DOC_COLS)

        def write_block(batch: pa.Table) -> pa.Table:
            if not len(batch):  # over-parallel reads can emit empty blocks
                return batch.select(["doc_id"]).slice(0, 0)
            lo = min(batch["doc_id"].to_pylist())
            feather.write_feather(
                batch, f"{out_dir}/part-{lo:012d}.arrow", compression="uncompressed"
            )
            return batch.select(["doc_id"]).slice(0, 0)

        ds.map_batches(write_block, batch_format="pyarrow").materialize()

    return _render(sf_dir, "docs-ipc", write)


def read_documents_ipc(sf_dir: str) -> ray.data.Dataset:
    """IPC shard reader: binary files stream one-per-task, each task maps
    the buffer with the Arrow IPC reader (zero-copy for uncompressed
    files) — no whole-directory driver materialization."""
    ds = ray.data.read_binary_files(documents_ipc_dir(sf_dir))

    def parse(batch: pa.Table) -> pa.Table:
        import pyarrow.feather as feather

        tables = [
            feather.read_table(pa.BufferReader(b)).select(DOC_COLS)
            for b in batch["bytes"].to_pylist()
        ]
        return pa.concat_tables(tables) if tables else DOC_SCHEMA.empty_table()

    return ds.map_batches(parse, batch_format="pyarrow")


def documents_orc_dir(sf_dir: str) -> str:
    """Documents as ORC shards — the columnar interchange format of the
    Hive/Trino lakehouse world.  Same resumable file-per-block layout as
    the IPC sink (deterministic min-doc_id names)."""
    import pyarrow.orc as orc

    def write(out_dir: str) -> None:
        ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=DOC_COLS)

        def write_block(batch: pa.Table) -> pa.Table:
            if not len(batch):  # over-parallel reads can emit empty blocks
                return batch.select(["doc_id"]).slice(0, 0)
            lo = min(batch["doc_id"].to_pylist())
            orc.write_table(batch, f"{out_dir}/part-{lo:012d}.orc")
            return batch.select(["doc_id"]).slice(0, 0)

        ds.map_batches(write_block, batch_format="pyarrow").materialize()

    return _render(sf_dir, "docs-orc", write)


def read_documents_orc(sf_dir: str) -> ray.data.Dataset:
    """ORC shard reader: binary files stream one-per-task, each task maps
    the buffer with the Arrow ORC reader — no whole-directory driver
    materialization (the read_documents_ipc shape)."""
    ds = ray.data.read_binary_files(documents_orc_dir(sf_dir))

    def parse(batch: pa.Table) -> pa.Table:
        import pyarrow.orc as orc

        tables = [
            orc.ORCFile(pa.BufferReader(b)).read(columns=DOC_COLS)
            for b in batch["bytes"].to_pylist()
        ]
        return pa.concat_tables(tables) if tables else DOC_SCHEMA.empty_table()

    return ds.map_batches(parse, batch_format="pyarrow")


def _warc_record(doc_id: int, text: str, lang: str, source: str, n_chars: int) -> bytes:
    """One WARC/1.0 'conversion' record (the record type Common Crawl's
    WET text extracts use): named headers + Content-Length-framed payload,
    CRLF line endings, blank-line separator, double-CRLF record trailer."""
    payload = text.encode("utf-8")
    headers = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Record-ID: <urn:ahrd:doc:{doc_id}>\r\n"
        f"WARC-AHRD-Lang: {lang}\r\n"
        f"WARC-AHRD-Source: {source}\r\n"
        f"WARC-AHRD-NChars: {n_chars}\r\n"
        "Content-Type: text/plain\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode("ascii")
    return headers + payload + b"\r\n\r\n"


def _parse_warc(buf: bytes) -> pa.Table:
    """Parse one WARC shard back into DOC_COLS rows.  Payloads are
    consumed by Content-Length (the only correct WARC framing — a payload
    may legally contain the record separator bytes)."""
    ids, texts, langs, sources, ncs = [], [], [], [], []
    pos, n = 0, len(buf)
    while pos < n:
        if buf[pos : pos + 8] != b"WARC/1.0":
            raise ValueError(f"bad WARC version line at offset {pos}")
        head_end = buf.index(b"\r\n\r\n", pos)
        headers = {}
        for line in buf[pos:head_end].decode("utf-8").split("\r\n")[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers["content-length"])
        body = buf[head_end + 4 : head_end + 4 + length]
        rid = headers["warc-record-id"]
        ids.append(int(rid[rid.rindex(":") + 1 : rid.rindex(">")]))
        texts.append(body.decode("utf-8"))
        langs.append(headers["warc-ahrd-lang"])
        sources.append(headers["warc-ahrd-source"])
        ncs.append(int(headers["warc-ahrd-nchars"]))
        pos = head_end + 4 + length
        if buf[pos : pos + 4] != b"\r\n\r\n":
            raise ValueError(f"missing WARC record trailer at offset {pos}")
        pos += 4
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
            "source": pa.array(sources, type=pa.string()),
            "n_chars": pa.array(ncs, type=pa.int64()),
        }
    )


def documents_warc_dir(sf_dir: str) -> str:
    """Documents as WARC/1.0 shards — the Common Crawl container itself
    (conversion records, the WET layout).  Same resumable file-per-block
    layout as the IPC/ORC sinks (deterministic min-doc_id names); doc
    metadata rides WARC-* named headers so the roundtrip is lossless."""

    def write(out_dir: str) -> None:
        ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=DOC_COLS)

        def write_block(batch: pa.Table) -> pa.Table:
            rows = batch.to_pylist()
            if not rows:  # over-parallel reads can emit empty blocks
                return batch.select(["doc_id"]).slice(0, 0)
            lo = min(r["doc_id"] for r in rows)
            with open(f"{out_dir}/part-{lo:012d}.warc", "wb") as f:
                for r in rows:
                    f.write(
                        _warc_record(
                            r["doc_id"], r["text"], r["lang"], r["source"],
                            r["n_chars"],
                        )
                    )
            return batch.select(["doc_id"]).slice(0, 0)

        ds.map_batches(write_block, batch_format="pyarrow").materialize()

    return _render(sf_dir, "docs-warc", write)


def read_documents_warc(sf_dir: str) -> ray.data.Dataset:
    """WARC shard reader: binary files stream one-per-task, each task
    parses its shard's records by Content-Length framing — no
    whole-directory driver materialization (the read_documents_ipc
    shape)."""
    ds = ray.data.read_binary_files(documents_warc_dir(sf_dir))

    def parse(batch: pa.Table) -> pa.Table:
        tables = [_parse_warc(bytes(b)) for b in batch["bytes"].to_pylist()]
        return pa.concat_tables(tables) if tables else DOC_SCHEMA.empty_table()

    return ds.map_batches(parse, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Avro Object Container Files (stdlib-only: json schema + zlib deflate)
# ---------------------------------------------------------------------------
# Implements the OCF framing from the public Avro 1.11 spec: "Obj\x01"
# magic, an avro-map of metadata (avro.schema / avro.codec), a random
# 16-byte sync marker, then length-prefixed blocks of zigzag-varint-coded
# records.  The reader is SCHEMA-DRIVEN (it decodes whatever record schema
# the file header declares, for the primitive types below), not a
# fixture-only parser.

_AVRO_MAGIC = b"Obj\x01"


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _avro_bytes(payload: bytes) -> bytes:
    return _zigzag_encode(len(payload)) + payload


_AVRO_DOC_SCHEMA = (
    '{"type":"record","name":"doc","fields":['
    '{"name":"doc_id","type":"long"},'
    '{"name":"text","type":"string"},'
    '{"name":"lang","type":"string"},'
    '{"name":"source","type":"string"},'
    '{"name":"n_chars","type":"long"}]}'
)


def _avro_header(schema_json: str, codec: str, sync: bytes) -> bytes:
    meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    out = bytearray(_AVRO_MAGIC)
    out += _zigzag_encode(len(meta))
    for k, v in meta.items():
        out += _avro_bytes(k.encode()) + _avro_bytes(v)
    out += _zigzag_encode(0)  # map terminator
    out += sync
    return bytes(out)


def _avro_write_shard(path: str, rows: list[dict], codec: str = "deflate") -> None:
    import zlib

    sync = hashlib.sha1(path.encode()).digest()[:16]
    body = bytearray()
    for r in rows:
        body += _zigzag_encode(int(r["doc_id"]))
        body += _avro_bytes(r["text"].encode("utf-8"))
        body += _avro_bytes(r["lang"].encode("utf-8"))
        body += _avro_bytes(r["source"].encode("utf-8"))
        body += _zigzag_encode(int(r["n_chars"]))
    data = bytes(body)
    if codec == "deflate":  # raw deflate per the spec (no zlib wrapper)
        c = zlib.compressobj(9, zlib.DEFLATED, -15)
        data = c.compress(data) + c.flush()
    with open(path, "wb") as f:
        f.write(_avro_header(_AVRO_DOC_SCHEMA, codec, sync))
        f.write(_zigzag_encode(len(rows)) + _zigzag_encode(len(data)))
        f.write(data)
        f.write(sync)


def _avro_read_value(typ, buf: bytes, pos: int):
    """Decode one value of an Avro primitive (or nullable-union) type."""
    if isinstance(typ, list):  # union: long branch index, then the value
        idx, pos = _zigzag_decode(buf, pos)
        return _avro_read_value(typ[idx], buf, pos)
    if typ in ("long", "int"):
        return _zigzag_decode(buf, pos)
    if typ in ("string", "bytes"):
        n, pos = _zigzag_decode(buf, pos)
        raw = buf[pos : pos + n]
        return (raw.decode("utf-8") if typ == "string" else raw), pos + n
    if typ == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if typ == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if typ == "boolean":
        return bool(buf[pos]), pos + 1
    if typ == "null":
        return None, pos
    raise NotImplementedError(f"avro type {typ!r} not supported")


def _parse_avro(buf: bytes) -> pa.Table:
    """Schema-driven OCF reader: header metadata map, deflate/null codecs,
    multi-block files, sync-marker validation after every block."""
    import json
    import zlib

    if buf[:4] != _AVRO_MAGIC:
        raise ValueError("not an Avro object container file")
    pos, meta = 4, {}
    while True:
        n, pos = _zigzag_decode(buf, pos)
        if n == 0:
            break
        if n < 0:  # spec: negative count is followed by a block byte size
            n, (_, pos) = -n, _zigzag_decode(buf, pos)
        for _ in range(n):
            klen, pos = _zigzag_decode(buf, pos)
            key = buf[pos : pos + klen].decode()
            pos += klen
            vlen, pos = _zigzag_decode(buf, pos)
            meta[key] = buf[pos : pos + vlen]
            pos += vlen
    sync = buf[pos : pos + 16]
    pos += 16
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if schema.get("type") != "record":
        raise NotImplementedError("only record schemas supported")
    fields = [(f["name"], f["type"]) for f in schema["fields"]]
    cols: dict[str, list] = {name: [] for name, _ in fields}
    while pos < len(buf):
        n_rec, pos = _zigzag_decode(buf, pos)
        n_bytes, pos = _zigzag_decode(buf, pos)
        block = buf[pos : pos + n_bytes]
        pos += n_bytes
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise NotImplementedError(f"avro codec {codec!r} not supported")
        bpos = 0
        for _ in range(n_rec):
            for name, typ in fields:
                v, bpos = _avro_read_value(typ, block, bpos)
                cols[name].append(v)
        if buf[pos : pos + 16] != sync:
            raise ValueError("avro block sync-marker mismatch")
        pos += 16
    arrays = {}
    for name, typ in fields:
        if typ in ("long", "int"):
            arrays[name] = pa.array(cols[name], type=pa.int64())
        elif typ == "double" or typ == "float":
            arrays[name] = pa.array(cols[name], type=pa.float64())
        else:
            arrays[name] = pa.array(cols[name])
    return pa.table(arrays)


def documents_avro_dir(sf_dir: str) -> str:
    """Documents as Avro OCF shards (deflate codec) — the Hadoop-ecosystem
    row container, written file-per-block like the IPC/ORC/WARC sinks."""

    def write(out_dir: str) -> None:
        ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=DOC_COLS)

        def write_block(batch: pa.Table) -> pa.Table:
            rows = batch.to_pylist()
            if not rows:  # over-parallel reads can emit empty blocks
                return batch.select(["doc_id"]).slice(0, 0)
            lo = min(r["doc_id"] for r in rows)
            _avro_write_shard(f"{out_dir}/part-{lo:012d}.avro", rows)
            return batch.select(["doc_id"]).slice(0, 0)

        ds.map_batches(write_block, batch_format="pyarrow").materialize()

    return _render(sf_dir, "docs-avro", write)


def read_documents_avro(sf_dir: str) -> ray.data.Dataset:
    """Avro shard reader: binary files stream one-per-task, each task runs
    the schema-driven OCF decode (the read_documents_ipc shape)."""
    ds = ray.data.read_binary_files(documents_avro_dir(sf_dir))

    def parse(batch: pa.Table) -> pa.Table:
        tables = [_parse_avro(bytes(b)).select(DOC_COLS) for b in batch["bytes"].to_pylist()]
        return pa.concat_tables(tables) if tables else DOC_SCHEMA.empty_table()

    return ds.map_batches(parse, batch_format="pyarrow")


def documents_warc_gz_dir(sf_dir: str) -> str:
    """Documents as .warc.gz shards in the Common Crawl on-disk
    convention: EVERY record is its own gzip member, so a reader can seek
    to a member boundary and decompress one record without touching the
    rest of the shard.  mtime is pinned to 0 for byte-deterministic
    shards."""
    import gzip
    import io

    def write(out_dir: str) -> None:
        ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=DOC_COLS)

        def write_block(batch: pa.Table) -> pa.Table:
            rows = batch.to_pylist()
            if not rows:  # over-parallel reads can emit empty blocks
                return batch.select(["doc_id"]).slice(0, 0)
            lo = min(r["doc_id"] for r in rows)
            with open(f"{out_dir}/part-{lo:012d}.warc.gz", "wb") as f:
                for r in rows:
                    buf = io.BytesIO()
                    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                        gz.write(
                            _warc_record(
                                r["doc_id"], r["text"], r["lang"], r["source"],
                                r["n_chars"],
                            )
                        )
                    f.write(buf.getvalue())
            return batch.select(["doc_id"]).slice(0, 0)

        ds.map_batches(write_block, batch_format="pyarrow").materialize()

    return _render(sf_dir, "docs-warc-gz", write)


def _split_gzip_members(buf: bytes) -> list[bytes]:
    """Decompress a multi-member gzip stream member-by-member (the WARC
    random-access contract), returning one decompressed payload per
    member."""
    import zlib

    out, pos = [], 0
    while pos < len(buf):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out.append(d.decompress(buf[pos:]))
        remainder = d.unused_data
        if not d.eof:
            raise ValueError("truncated gzip member")
        pos = len(buf) - len(remainder)
    return out


def read_documents_warc_gz(sf_dir: str) -> ray.data.Dataset:
    """Member-split .warc.gz reader: each task splits its shard at gzip
    member boundaries (one member == one record per the Common Crawl
    layout) and parses each record independently.

    Files are opened directly inside the map task (paths fan out through
    ``from_items``): ``read_binary_files`` transparently gunzips anything
    named ``*.gz`` (Ray treats ``compression=None`` in the open args as
    "auto-detect from path"), which would destroy the member boundaries
    this format's random-access contract is built on — and renaming the
    shards would break the Common Crawl ``.warc.gz`` convention."""
    root = documents_warc_gz_dir(sf_dir)
    paths = sorted(
        os.path.join(root, n) for n in os.listdir(root) if n.endswith(".warc.gz")
    )
    ds = ray.data.from_items([{"path": p} for p in paths])

    def parse(batch: pa.Table) -> pa.Table:
        tables = []
        for p in batch["path"].to_pylist():
            with open(p, "rb") as f:
                members = _split_gzip_members(f.read())
            tables.extend(_parse_warc(m) for m in members)
        return pa.concat_tables(tables) if tables else DOC_SCHEMA.empty_table()

    return ds.map_batches(parse, batch_format="pyarrow")


def documents_sqlite_dir(sf_dir: str) -> str:
    """Documents as SQLite shard files (stdlib ``sqlite3``) — the
    app-data container a crawler of mobile/desktop exports meets; one
    .sqlite file per input block with a typed ``documents`` table and an
    index on doc_id (exercising a real DB file, not a dump)."""
    import sqlite3

    def write(out_dir: str) -> None:
        ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=DOC_COLS)

        def write_block(batch: pa.Table) -> pa.Table:
            rows = batch.to_pylist()
            if not rows:  # over-parallel reads can emit empty blocks
                return batch.select(["doc_id"]).slice(0, 0)
            lo = min(r["doc_id"] for r in rows)
            path = f"{out_dir}/part-{lo:012d}.sqlite"
            con = sqlite3.connect(path)
            try:
                con.execute(
                    "CREATE TABLE documents ("
                    "doc_id INTEGER PRIMARY KEY, text TEXT NOT NULL,"
                    "lang TEXT NOT NULL, source TEXT NOT NULL,"
                    "n_chars INTEGER NOT NULL)"
                )
                con.executemany(
                    "INSERT INTO documents VALUES (?, ?, ?, ?, ?)",
                    [
                        (r["doc_id"], r["text"], r["lang"], r["source"], r["n_chars"])
                        for r in rows
                    ],
                )
                con.execute("CREATE INDEX ix_lang ON documents(lang)")
                con.commit()
            finally:
                con.close()
            return batch.select(["doc_id"]).slice(0, 0)

        ds.map_batches(write_block, batch_format="pyarrow").materialize()

    return _render(sf_dir, "docs-sqlite", write)


def read_documents_sqlite(sf_dir: str) -> ray.data.Dataset:
    """SQLite shard reader: file paths fan out through ``from_items``,
    each task opens its shard read-only (URI mode) and streams the
    ``documents`` table out in one query — the per-shard DB never lands
    on the driver."""
    root = documents_sqlite_dir(sf_dir)
    paths = sorted(
        os.path.join(root, n) for n in os.listdir(root) if n.endswith(".sqlite")
    )
    ds = ray.data.from_items([{"path": p} for p in paths])

    def parse(batch: pa.Table) -> pa.Table:
        import sqlite3

        tables = []
        for p in batch["path"].to_pylist():
            con = sqlite3.connect(f"file:{p}?mode=ro", uri=True)
            try:
                rows = con.execute(
                    "SELECT doc_id, text, lang, source, n_chars"
                    " FROM documents ORDER BY doc_id"
                ).fetchall()
            finally:
                con.close()
            tables.append(
                pa.table(
                    {
                        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                        "text": pa.array([r[1] for r in rows], type=pa.string()),
                        "lang": pa.array([r[2] for r in rows], type=pa.string()),
                        "source": pa.array([r[3] for r in rows], type=pa.string()),
                        "n_chars": pa.array([r[4] for r in rows], type=pa.int64()),
                    }
                )
            )
        return pa.concat_tables(tables) if tables else DOC_SCHEMA.empty_table()

    return ds.map_batches(parse, batch_format="pyarrow")


def read_documents_filtered(sf_dir: str) -> ray.data.Dataset:
    """Row-filter pushdown read: the predicate travels INTO the parquet
    scan as an Arrow dataset expression, so row groups whose column
    statistics exclude the range are never decoded — the row-level
    companion to the partition pruning of ``read_documents_pruned``
    ("prune at the read": only matching rows leave storage)."""
    import pyarrow.dataset as pads

    expr = (pads.field("lang") == "en") & (pads.field("n_chars") >= 200)
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=DOC_COLS, filter=expr
    )
