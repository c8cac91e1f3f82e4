"""Canonicalization + graph materialization (operators A11, A13, W1).

winners -> attribute transfer (broadcast map lookup, analogue of the GOA
join AHRD.java:233-240) -> explode to (subj, pred, obj) -> exact dedup inside
carried-key partitions -> global sort -> Parquet edge table.

Partitioning: every triple carries ``tpart`` from emit time — doc-scoped
triples use ``doc_id % P``, entity-scoped triples use ``cand_ord % P`` — so
identical triples always share a partition and dedup needs NO extra key
derivation pass.  Entity-side heat (one entity linked from millions of docs)
is bounded because per (entity, pred) only one distinct obj exists per
catalog version; the dedup group is wide but collapses to O(1) rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ahrd_ray.config import EngineConfig
from ahrd_ray.sources import spec
from ahrd_ray.stages.score import get_broadcast

TRIPLE_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("tpart", pa.int32()),
    ]
)


def make_triple_emitter(catalog_ref, attrs_ref, cfg: EngineConfig):
    """map_batches fn: winners batch (pandas) -> triples (arrow)."""

    P = cfg.num_score_partitions

    def emit(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0:
            return TRIPLE_SCHEMA.empty_table()
        bundle = get_broadcast(catalog_ref)
        attrs: dict[str, list[str]] = get_broadcast(attrs_ref) if attrs_ref is not None else {}
        cand_index = {c: i for i, c in enumerate(bundle.arrays.cand_id)}

        subj, pred, obj, tpart = [], [], [], []

        def add(s, p, o, t):
            subj.append(s)
            pred.append(p)
            obj.append(o)
            tpart.append(t)

        for row in batch.itertuples(index=False):
            url = spec.url_of(int(row.doc_id), row.lang)
            dpart = int(row.doc_id) % P
            epart = cand_index[row.cand_id] % P
            add(url, spec.PRED_LINKED, row.cand_id, dpart)
            add(url, spec.PRED_DESC, row.description, dpart)
            add(url, spec.PRED_QUALITY, row.quality_code, dpart)
            # entity-side label: canonical across docs -> deduped downstream
            add(row.cand_id, spec.PRED_LABEL, row.description, epart)
            for a in attrs.get(row.cand_short, ()):
                # doc-side transfer (protein.goResults analogue)
                add(url, spec.PRED_ATTR, a, dpart)
                add(row.cand_id, spec.PRED_ATTR, a, epart)
        return pa.table(
            {
                "subj": pa.array(subj, type=pa.string()),
                "pred": pa.array(pred, type=pa.string()),
                "obj": pa.array(obj, type=pa.string()),
                "tpart": pa.array(np.asarray(tpart, dtype=np.int32), type=pa.int32()),
            }
        )

    return emit


def _dedup_group(df: pd.DataFrame) -> pd.DataFrame:
    return df.drop_duplicates(["subj", "pred", "obj"])


def materialize_graph(
    winners: "ray.data.Dataset",
    catalog_ref,
    attrs_ref,
    cfg: EngineConfig,
    sort: bool = True,
) -> "ray.data.Dataset":
    """winners -> deduplicated (sorted) triple Dataset."""
    triples = winners.map_batches(
        make_triple_emitter(catalog_ref, attrs_ref, cfg), batch_format="pandas"
    )
    deduped = triples.groupby("tpart").map_groups(_dedup_group, batch_format="pandas")
    deduped = deduped.drop_columns(["tpart"])
    if sort:
        deduped = deduped.sort(["subj", "pred", "obj"])
    return deduped
