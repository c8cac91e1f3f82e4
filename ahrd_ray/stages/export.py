"""Text export of the annotation table (reference operator W2).

``view/FastaOutputWriter.java:18-31`` writes one FASTA record per protein:
``>`` + accession, best-hit accession, quality code and description on the
header line, then the sequence.  Graft: one record per DOCUMENT — header
``>doc:<doc_id> <cand_id> <quality_code> <description>`` and the document
text as the body; docs without a winner get the reference's "Unknown
protein" description (``AbstractOutputWriter.java:50-57``) and an empty hit
accession.

The export is a distributed write (one shard per block, quoting-free CSV
writer used as a line sink) — never a driver-side loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

UNKNOWN_QUALITY = "---"


def export_lines(ctx) -> ray.data.Dataset:
    """One row per output LINE (header, body alternating per doc)."""
    from ahrd_ray.pipelines import kg
    from ahrd_ray.sources import spec

    docs = ray.data.read_parquet(
        f"{ctx.sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    winners = kg.winners_dataset(ctx).select_columns(
        ["doc_id", "cand_id", "quality_code", "description"]
    )
    cpus = int(ray.cluster_resources().get("CPU", 8))
    joined = docs.join(
        winners,
        "left_outer",
        num_partitions=max(2, min(16, cpus // 2)),
        on=("doc_id",),
        aggregator_ray_remote_args={"num_cpus": 0.5},
    )

    def fmt(df: pd.DataFrame) -> pa.Table:
        cand = df["cand_id"].fillna("").astype(str)
        qual = df["quality_code"].fillna(UNKNOWN_QUALITY).astype(str)
        desc = df["description"].fillna(spec.UNKNOWN_DESC).astype(str)
        headers = (
            ">doc:"
            + df["doc_id"].astype(np.int64).astype(str)
            + " "
            + cand
            + " "
            + qual
            + " "
            + desc
        )
        lines = np.empty(2 * len(df), dtype=object)
        lines[0::2] = headers.to_numpy(dtype=object)
        lines[1::2] = df["text"].astype(str).to_numpy(dtype=object)
        return pa.table({"line": pa.array(lines, type=pa.string())})

    return joined.map_batches(fmt, batch_format="pandas")


def write_text_export(ctx, out_dir: str) -> str:
    """Distributed line-oriented write (W2 sink)."""

    def csv_args() -> dict:
        from pyarrow import csv as pacsv

        return {
            "write_options": pacsv.WriteOptions(include_header=False, quoting_style="none")
        }

    export_lines(ctx).write_csv(out_dir, arrow_csv_args_fn=csv_args)
    return out_dir
