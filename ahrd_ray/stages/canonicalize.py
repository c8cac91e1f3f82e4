"""Canonicalization + graph materialization (operators A11, A13, W1).

winners -> attribute transfer (broadcast map lookup, analogue of the GOA
join AHRD.java:233-240) -> (subj, pred, obj) edge table -> global sort ->
partitioned Parquet.

Dedup by construction (no dedup shuffle):

* doc-scoped triples (subj = url) are emitted once per winner row and are
  unique because a doc has exactly one winner;
* entity-scoped triples (labels, entity attrs) are generated from
  ``distinct winner entities x broadcast catalog/attrs`` — the distinct set
  is obtained with ``unique("cand_ord")`` (per-block combiner + tiny merge),
  so a hot entity linked from millions of docs contributes one row per block
  to the aggregate, never a skewed dedup group.  Output cardinality is
  bounded by the catalog dimension, not the corpus.

The only remaining all-to-all is the required global sort of the edge table.
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
    ]
)


def make_doc_triple_emitter(attrs_ref, cfg: EngineConfig):
    """map_batches fn: winners batch (pandas) -> doc-scoped triples (arrow).

    Emits (url, linked_entity/description/quality/attr, ...) — unique per
    construction (one winner per doc; attr set per cand_short is a set)."""

    attrs_df_cache: list[pd.DataFrame] = []

    def emit(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0:
            return TRIPLE_SCHEMA.empty_table()
        if not attrs_df_cache:
            attrs: dict[str, list[str]] = (
                get_broadcast(attrs_ref) if attrs_ref is not None else {}
            )
            attrs_df_cache.append(
                pd.DataFrame(
                    [(s, a) for s, vals in attrs.items() for a in vals],
                    columns=["cand_short", "attr"],
                )
            )
        attrs_df = attrs_df_cache[0]

        url = (
            spec.URL_PREFIX
            + batch["lang"].astype(str)
            + "/"
            + batch["doc_id"].astype("int64").astype(str)
        )

        def frame(s, p, o):
            return pd.DataFrame(
                {"subj": np.asarray(s, dtype=object), "pred": p,
                 "obj": np.asarray(o, dtype=object)}
            )

        frames = [
            frame(url, spec.PRED_LINKED, batch["cand_id"]),
            frame(url, spec.PRED_DESC, batch["description"]),
            frame(url, spec.PRED_QUALITY, batch["quality_code"]),
        ]
        if len(attrs_df):
            w = batch.assign(url=url)
            m = w.merge(attrs_df, on="cand_short", how="inner", sort=False)
            if len(m):
                # doc-side transfer (protein.goResults analogue, A11)
                frames.append(frame(m["url"], spec.PRED_ATTR, m["attr"]))
        out = pd.concat(frames, ignore_index=True)
        return pa.table(
            {
                "subj": pa.array(out["subj"], type=pa.string()),
                "pred": pa.array(out["pred"], type=pa.string()),
                "obj": pa.array(out["obj"], type=pa.string()),
            }
        )

    return emit


def entity_triples_table(
    winner_ords: list[int], catalog_ref, attrs_ref
) -> pa.Table:
    """Entity-scoped triples for the distinct winning entities: canonical
    (cand_id, label, description) + (cand_id, attr, value)."""
    bundle = get_broadcast(catalog_ref)
    attrs = get_broadcast(attrs_ref) if attrs_ref is not None else {}
    subj, pred, obj = [], [], []
    for o in sorted(int(x) for x in winner_ords):
        cid = bundle.arrays.cand_id[o]
        subj.append(cid)
        pred.append(spec.PRED_LABEL)
        obj.append(bundle.arrays.description[o])
        for a in attrs.get(bundle.arrays.cand_short[o], ()):
            subj.append(cid)
            pred.append(spec.PRED_ATTR)
            obj.append(a)
    return pa.table(
        {
            "subj": pa.array(subj, type=pa.string()),
            "pred": pa.array(pred, type=pa.string()),
            "obj": pa.array(obj, type=pa.string()),
        }
    )


def materialize_graph(
    winners: "ray.data.Dataset",
    catalog_ref,
    attrs_ref,
    cfg: EngineConfig,
    sort: bool = True,
) -> "ray.data.Dataset":
    """winners -> deduplicated (sorted) triple Dataset.

    ``winners`` is consumed twice (doc triples + distinct entity set), so it
    is materialized here; the checkpointed pipeline variant persists it to
    Parquet instead (state/checkpoint.py)."""
    import ray.data

    # coalesce the many small fused-stage output blocks first — sort cost on
    # tiny blocks is scheduling-bound and grows with cluster size otherwise
    winners = winners.repartition(target_num_rows_per_block=250_000).materialize()
    doc_triples = winners.map_batches(
        make_doc_triple_emitter(attrs_ref, cfg), batch_format="pandas"
    )
    ent_tbl = entity_triples_table(
        winners.unique("cand_ord"), catalog_ref, attrs_ref
    )
    triples = doc_triples.union(ray.data.from_arrow(ent_tbl))
    if sort:
        triples = triples.sort(["subj", "pred", "obj"])
        # the sort leaves pandas-formatted blocks; normalize to Arrow so the
        # edge table's schema is (subj: string, pred: string, obj: string)
        triples = triples.map_batches(
            lambda t: t.select(["subj", "pred", "obj"]), batch_format="pyarrow"
        )
    return triples
