"""Checkpoint-resumable stage boundaries with per-partition lineage.

The reference's only resume story is "skip completed batch outputs"
(Batcher.java:225-230).  Here every checkpointed stage writes partitioned
Parquet under ``<root>/stage=<name>/`` plus a ``manifest.json`` recording:

* a params hash (config + stage code version) — a changed config invalidates
  the checkpoint;
* an input fingerprint (path, size, mtime of every input file);
* per-output-file lineage (path, rows, bytes) harvested from the Parquet
  footers;
* total rows and wall time.

``run_stage`` returns the cached Dataset when the manifest matches
(params + inputs unchanged), otherwise recomputes and atomically replaces
the stage directory — a failed run can therefore resume, skipping every
finished stage.  Output is always many files (one per block), never one
giant file.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from collections.abc import Callable
from typing import Any

ENGINE_VERSION = "1"


def params_hash(params: Any) -> str:
    blob = json.dumps(params, sort_keys=True, default=repr).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def input_fingerprint(paths: list[str]) -> str:
    h = hashlib.sha256()
    for p in sorted(paths):
        st = os.stat(p)
        h.update(f"{p}:{st.st_size}:{int(st.st_mtime)}|".encode())
    return h.hexdigest()[:16]


def _stage_dir(root: str, name: str) -> str:
    return os.path.join(root, f"stage={name}")


def manifest_path(root: str, name: str) -> str:
    return os.path.join(_stage_dir(root, name), "manifest.json")


def load_manifest(root: str, name: str) -> dict | None:
    try:
        with open(manifest_path(root, name), encoding="utf-8") as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


def _collect_lineage(data_dir: str) -> tuple[list[dict], int]:
    import pyarrow.parquet as pq

    files = []
    total = 0
    for dirpath, _dirs, names in os.walk(data_dir):
        for n in sorted(names):
            if not n.endswith(".parquet"):
                continue
            p = os.path.join(dirpath, n)
            rows = pq.read_metadata(p).num_rows
            files.append(
                {
                    "path": os.path.relpath(p, data_dir),
                    "rows": rows,
                    "bytes": os.path.getsize(p),
                }
            )
            total += rows
    return files, total


def run_stage(
    name: str,
    root: str,
    build: Callable[[], "Any"],
    params: Any,
    input_paths: list[str],
    min_rows_per_file: int | None = None,
):
    """Build-or-reuse one checkpointed stage; returns a ray Dataset reading
    the stage's Parquet output."""
    import ray.data

    ph = params_hash({"params": params, "engine": ENGINE_VERSION})
    fp = input_fingerprint(input_paths)
    sdir = _stage_dir(root, name)
    ddir = os.path.join(sdir, "data")

    m = load_manifest(root, name)
    if m and m.get("params_hash") == ph and m.get("input_fingerprint") == fp and m.get("complete"):
        return ray.data.read_parquet(ddir)

    # (re)compute: write to a tmp dir, then atomically swap in
    tmp = os.path.join(sdir, f".tmp-{int(time.time() * 1000)}")
    if os.path.exists(sdir):
        shutil.rmtree(sdir)
    os.makedirs(tmp, exist_ok=True)
    t0 = time.perf_counter()
    ds = build()
    kwargs = {}
    if min_rows_per_file:
        kwargs["min_rows_per_file"] = min_rows_per_file
    ds.write_parquet(tmp, **kwargs)
    wall = time.perf_counter() - t0

    os.makedirs(sdir, exist_ok=True)
    os.replace(tmp, ddir)
    files, total_rows = _collect_lineage(ddir)
    manifest = {
        "stage": name,
        "params_hash": ph,
        "input_fingerprint": fp,
        "engine_version": ENGINE_VERSION,
        "complete": True,
        "total_rows": total_rows,
        "wall_sec": round(wall, 3),
        "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "files": files,
    }
    with open(manifest_path(root, name), "w", encoding="utf-8") as f:
        json.dump(manifest, f, indent=1)
    return ray.data.read_parquet(ddir)
