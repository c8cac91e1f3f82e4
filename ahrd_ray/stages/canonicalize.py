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
        dpart = (batch["doc_id"].to_numpy() % P).astype(np.int32)
        epart = (batch["cand_ord"].to_numpy() % P).astype(np.int32)
        cid = batch["cand_id"]
        desc = batch["description"]

        def frame(s, p, o, t):
            return pd.DataFrame(
                {"subj": np.asarray(s, dtype=object), "pred": p,
                 "obj": np.asarray(o, dtype=object), "tpart": t}
            )

        frames = [
            frame(url, spec.PRED_LINKED, cid, dpart),
            frame(url, spec.PRED_DESC, desc, dpart),
            frame(url, spec.PRED_QUALITY, batch["quality_code"], dpart),
            # entity-side label: canonical across docs -> deduped downstream
            frame(cid, spec.PRED_LABEL, desc, epart),
        ]
        if len(attrs_df):
            w = batch.assign(url=url, dpart=dpart, epart=epart)
            m = w.merge(attrs_df, on="cand_short", how="inner", sort=False)
            if len(m):
                # doc-side transfer (protein.goResults analogue) + entity-side
                frames.append(frame(m["url"], spec.PRED_ATTR, m["attr"], m["dpart"].to_numpy()))
                frames.append(frame(m["cand_id"], spec.PRED_ATTR, m["attr"], m["epart"].to_numpy()))
        out = pd.concat(frames, ignore_index=True)
        return pa.table(
            {
                "subj": pa.array(out["subj"], type=pa.string()),
                "pred": pa.array(out["pred"], type=pa.string()),
                "obj": pa.array(out["obj"], type=pa.string()),
                "tpart": pa.array(out["tpart"].to_numpy().astype(np.int32), type=pa.int32()),
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
