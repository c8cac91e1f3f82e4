"""Small-file Parquet compaction.

Streaming writes at 100 TB produce one file per block; after a skewed or
finely-partitioned run, a stage directory holds thousands of KB-sized files
whose open/footer costs dominate every downstream read.  The standard fix is
a compaction pass: coalesce consecutive small files into ~target-size files
without changing content or relative row order.

Scale shape: planning reads only directory metadata (names + byte sizes —
no data); each output file is produced by ONE independent Ray task that
reads exactly its input group and writes exactly one file, so the pass is
embarrassingly parallel, resumable per group (an existing non-empty output
file skips its group), and moves every byte exactly once.  Raw ``@ray.remote``
is deliberate here — this is one of the few jobs the Dataset API cannot
express, because ``write_parquet`` controls file boundaries by block, not by
the input-group contract compaction must honor.

The registry gates the compactor end-to-end: ``snk_compacted_docs`` writes a
many-file copy of ``documents``, compacts it, reads the compacted directory
back and must hash bit-equal to ``SELECT`` over the original table — the
lossless-ness proof, not just a file-count assertion.
"""

from __future__ import annotations

import os

import ray

COMPACT_TARGET_BYTES = 128 << 20  # ~one HDFS/S3-friendly block per file


def plan_groups(paths: list[str], sizes: list[int], target_bytes: int) -> list[list[str]]:
    """Greedy first-fit over name-sorted files: consecutive files join a
    group until adding the next would exceed ``target_bytes`` (a group
    always takes at least one file, so oversized inputs pass through 1:1).
    Name order preserves the writer's partition order."""
    order = sorted(range(len(paths)), key=lambda i: paths[i])
    groups: list[list[str]] = []
    cur: list[str] = []
    cur_bytes = 0
    for i in order:
        if cur and cur_bytes + sizes[i] > target_bytes:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(paths[i])
        cur_bytes += sizes[i]
    if cur:
        groups.append(cur)
    return groups


@ray.remote
def _compact_group(group: list[str], out_path: str) -> dict:
    import pyarrow.parquet as pq

    if os.path.exists(out_path) and os.path.getsize(out_path) > 0:
        return {"out": out_path, "rows": pq.read_metadata(out_path).num_rows,
                "skipped": True}
    import pyarrow as pa

    tables = [pq.read_table(p) for p in group]
    merged = pa.concat_tables(tables, promote_options="none")
    tmp = out_path + ".tmp"
    pq.write_table(merged, tmp)
    os.replace(tmp, out_path)  # atomic: a crashed task leaves no torn file
    return {"out": out_path, "rows": merged.num_rows, "skipped": False}


def compact_parquet_dir(
    src_dir: str, dst_dir: str, target_bytes: int = COMPACT_TARGET_BYTES
) -> dict:
    """Compact every ``.parquet`` file under ``src_dir`` into ~target-size
    files ``part-NNNNN.parquet`` under ``dst_dir``.  Returns a manifest
    dict (files in/out, rows).  Re-running after a crash skips finished
    output files (size > 0) — per-group resume."""
    names = [n for n in os.listdir(src_dir) if n.endswith(".parquet")]
    paths = [os.path.join(src_dir, n) for n in names]
    sizes = [os.path.getsize(p) for p in paths]
    groups = plan_groups(paths, sizes, target_bytes)
    os.makedirs(dst_dir, exist_ok=True)
    futs = [
        _compact_group.remote(g, os.path.join(dst_dir, f"part-{i:05d}.parquet"))
        for i, g in enumerate(groups)
    ]
    results = ray.get(futs)
    return {
        "files_in": len(paths),
        "files_out": len(groups),
        "rows": int(sum(r["rows"] for r in results)),
        "skipped": int(sum(r["skipped"] for r in results)),
    }


def compacted_docs(sf_dir: str, scratch: str | None = None) -> "ray.data.Dataset":
    """End-to-end gate pipeline: write ``documents`` (doc_id, lang, n_chars)
    as MANY small files, compact them, read the compacted directory back.
    The registry oracle compares the result against the source table —
    proving the compactor preserved every row and value."""
    import ray.data

    scratch = scratch or f"/tmp/ahrd_ray_compact/{abs(hash(sf_dir)) % (1 << 32)}"
    raw_dir = os.path.join(scratch, "raw")
    out_dir = os.path.join(scratch, "compact")
    import shutil

    shutil.rmtree(scratch, ignore_errors=True)
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    # deliberately fragment: many tiny blocks -> many tiny files
    docs.repartition(32).write_parquet(raw_dir)
    manifest = compact_parquet_dir(raw_dir, out_dir, target_bytes=1 << 20)
    assert manifest["files_out"] <= manifest["files_in"]
    return ray.data.read_parquet(out_dir)
