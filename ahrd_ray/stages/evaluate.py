"""Evaluator pipeline (reference operators E1-E6, Evaluator.java:51-109).

Per document:

* ``eval_score`` — F-beta of the winner's evaluation tokens (tokenized
  WITHOUT the token blacklist, E1) against the gold token set;
* ``best_comp_score`` — best unchanged competitor: per source the max-
  match-score candidate over ALL deduped candidates (blacklist/validity
  ignored, clone semantics BlastResult.java:494-504), scored with F-beta,
  maxed over sources (E4);
* ``delta`` = eval_score - best_comp_score (the "Germany's Next Top Score"
  subtraction, EvaluationScoreCalculator.java:175-229);
* ``highest_possible`` — max F-beta over the doc's top-k valid candidates
  (E5, java :237-251).

Gold derivation (F7 stand-in): the gold token set of a doc is the distinct
AHRD-token set of the first 40 characters of its lowercased text —
deterministic and oracle-expressible.

E6 (mean scores over docs, Trainer.java:215-245) is ``eval_summary``: means
of 2^-20-quantized per-doc scores, so the distributed sum is exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ahrd_ray.config import EngineConfig, q20
from ahrd_ray.functions.scoring import (
    dedup_valid_candidates,
    score_partition,
    top_k_mask,
)
from ahrd_ray.functions.tokenize import tokenize
from ahrd_ray.stages.score import get_broadcast

GOLD_PREFIX_CHARS = 40


def gold_tokens_of(text: str) -> frozenset[str]:
    return frozenset(tokenize(text[:GOLD_PREFIX_CHARS].lower(), []))


def _fbeta(assigned: frozenset[str], gold: frozenset[str]) -> float:
    """E3 with beta=1, written with the exact operand order the SQL uses.

    Deviation from the reference for the PIPELINE path only: an empty gold
    set scores 0.0 instead of NaN (the pure kernel in functions/evalx.py
    keeps the NaN semantics); synthetic gold sets are never empty.
    """
    if not gold:
        return 0.0
    if not assigned:
        return 0.0
    tp = float(len(assigned & gold))
    if tp == 0.0:
        return 0.0
    pr = tp / len(assigned)
    rc = tp / len(gold)
    return 2.0 * (pr * rc) / (pr + rc)


def eval_lists_partition(
    df: pd.DataFrame, catalog, cfg: EngineConfig
) -> pd.DataFrame:
    """Per doc: winner ord (-1 if none), top-k ord list, per-source best
    unchanged ord list — the candidate sets the F-beta stage needs."""
    raw = df
    rows: dict[int, list] = {}

    # winner over valid candidates
    winners = score_partition(df, catalog, cfg, carry_cols=())
    win_of = dict(zip(winners["doc_id"].astype(int), winners["cand_ord"].astype(int)))

    # top-k over valid candidates
    vdf = dedup_valid_candidates(raw, catalog)
    if len(vdf):
        doc_codes, _ = pd.factorize(vdf["doc_id"].to_numpy(), sort=True)
        mask = top_k_mask(vdf, doc_codes, vdf["source"].to_numpy(), cfg)
        topk = vdf.loc[mask].groupby("doc_id")["cand_ord"].agg(list).to_dict()
    else:
        topk = {}

    # unchanged best per (doc, source) over ALL candidates (HSP-deduped,
    # validity ignored): max match_score, tie -> min cand_ord
    d_all = raw.sort_values(
        ["doc_id", "cand_ord", "match_score", "ingest_seq"],
        ascending=[True, True, False, True],
        kind="mergesort",
    ).drop_duplicates(["doc_id", "cand_ord"], keep="first")
    d_all = d_all.sort_values(
        ["doc_id", "source", "match_score", "cand_ord"],
        ascending=[True, True, False, True],
        kind="mergesort",
    ).drop_duplicates(["doc_id", "source"], keep="first")
    unchanged = d_all.groupby("doc_id")["cand_ord"].agg(list).to_dict()

    def enc(v: list) -> str:
        # CSV-encoded ord lists: hash-join-friendly (no Arrow list columns
        # through the shuffle)
        return ",".join(str(int(x)) for x in v)

    for doc in sorted(set(raw["doc_id"].astype(int))):
        rows.setdefault(
            doc, [win_of.get(doc, -1), enc(topk.get(doc, [])), enc(unchanged.get(doc, []))]
        )
    return pd.DataFrame(
        [(d, w, t, u) for d, (w, t, u) in rows.items()],
        columns=["doc_id", "winner_ord", "topk_ords", "unchanged_ords"],
    ).astype({"doc_id": "int64", "winner_ord": "int64"})


def eval_scores(ctx, from_pages: bool = False) -> ray.data.Dataset:
    """Per-doc evaluation table over ALL documents (docs without candidates
    score 0 everywhere)."""
    from ahrd_ray.pipelines.kg import candidates_dataset

    catalog_ref = ctx.catalog_ref
    cfg = ctx.cfg

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        bundle = get_broadcast(catalog_ref)
        return eval_lists_partition(df, bundle.arrays, cfg)

    lists = (
        candidates_dataset(ctx, from_pages=from_pages)
        .groupby("spart")
        .map_groups(fn, batch_format="pandas")
    )

    docs = ray.data.read_parquet(f"{ctx.sf_dir}/documents.parquet", columns=["doc_id", "text"])
    cpus = int(ray.cluster_resources().get("CPU", 8))
    joined = docs.join(
        lists,
        "left_outer",
        num_partitions=max(2, min(16, cpus // 2)),
        on=("doc_id",),
        aggregator_ray_remote_args={"num_cpus": 0.5},
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        bundle = get_broadcast(catalog_ref)
        ev = bundle.eval_tokens
        out = []
        for row in df.itertuples(index=False):
            gold = gold_tokens_of(row.text)
            w = int(row.winner_ord) if pd.notna(row.winner_ord) else -1
            e = _fbeta(ev[w], gold) if w >= 0 else 0.0

            def dec(v) -> list[int]:
                if not isinstance(v, str) or not v:
                    return []
                return [int(x) for x in v.split(",")]

            unch = dec(row.unchanged_ords)
            topk = dec(row.topk_ords)
            best = 0.0
            for o in unch:
                best = max(best, _fbeta(ev[int(o)], gold))
            hp = 0.0
            for o in topk:
                hp = max(hp, _fbeta(ev[int(o)], gold))
            out.append((int(row.doc_id), e, best, e - best, hp))
        return pd.DataFrame(
            out,
            columns=[
                "doc_id",
                "eval_score",
                "best_comp_score",
                "delta",
                "highest_possible",
            ],
        ).astype({"doc_id": "int64"})

    return joined.map_batches(finish, batch_format="pandas")


_SUMMARY_COLS = ["eval_score", "best_comp_score", "delta", "highest_possible"]


def eval_summary(ctx) -> pa.Table:
    """E6: means of quantized per-doc scores (single small row).

    Streaming: each batch reduces to one partial-sums row (quantized values
    sum exactly in any order), the driver only folds the tiny per-block
    partials — the per-doc table is never materialized (VERDICT round-1
    item #6)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = {("sum_" + c): [float(q20(df[c].to_numpy()).sum())] for c in _SUMMARY_COLS}
        out["n_docs"] = [np.int64(len(df))]
        return pd.DataFrame(out)

    parts = eval_scores(ctx).map_batches(partial, batch_format="pandas").to_pandas()
    n = float(parts["n_docs"].sum())
    out = {}
    for c in _SUMMARY_COLS:
        out["mean_" + c] = [float(parts["sum_" + c].sum() / n)]
    out["n_docs"] = [int(n)]
    return pa.table(out)
