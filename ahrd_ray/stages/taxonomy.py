"""Containment-DAG most-informative filter (reference operator A12).

InterproResult.filterForMostInforming (InterproResult.java:177-192) drops,
per protein, any annotation node that is an ancestor of — or contained in —
another of the protein's nodes, via recursive DAG walks over a broadcast
node table (the static ``interproDb`` map, java :41).

Graft: nodes are derived from ``nation`` (child level) and ``region``
(parent level): node_id 'N<i>' has parent 'R<j>'; documents are assigned
nodes deterministically (doc_id % 25 -> nation, docs with doc_id % 7 == 0
additionally get the nation's parent region — which the filter must drop).

The per-doc filter runs vectorized per hash partition with the DAG ancestor
closure precomputed per worker (transitive closure of a dimension table —
small by assumption, same as the reference's in-heap map).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

N_PARTS = 32


def build_dag(sf_dir: str) -> pd.DataFrame:
    """(node_id, parent_id) — nations under regions, regions roots."""
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey"])
    rows = [(f"N{int(n)}", f"R{int(r)}") for n, r in
            zip(nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist())]
    rows += [(f"R{int(r)}", None) for r in region["r_regionkey"].to_pylist()]
    return pd.DataFrame(rows, columns=["node_id", "parent_id"])


def ancestor_closure(dag: pd.DataFrame) -> dict[str, frozenset[str]]:
    """node -> all its ancestors (recursive ``isParent`` walk,
    InterproResult.java:226-244, precomputed once per worker)."""
    parent = dict(zip(dag["node_id"], dag["parent_id"]))
    out: dict[str, frozenset[str]] = {}
    for node in parent:
        anc = set()
        p = parent.get(node)
        while p is not None and p not in anc:
            anc.add(p)
            p = parent.get(p)
        out[node] = frozenset(anc)
    return out


def doc_nodes(sf_dir: str) -> ray.data.Dataset:
    """Deterministic doc -> node assignments (F6 fixture): every doc gets
    nation node ``N(doc_id % 25)``; docs with doc_id % 7 == 0 additionally
    get that nation's parent region (which the filter must drop)."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"])
    region_of = dict(
        zip(
            (int(x) for x in nation["n_nationkey"].to_pylist()),
            (int(x) for x in nation["n_regionkey"].to_pylist()),
        )
    )
    region_ref = ray.put(region_of)

    def assign(batch: pa.Table) -> pa.Table:
        from ahrd_ray.stages.score import get_broadcast

        reg = get_broadcast(region_ref)
        d = batch["doc_id"].to_numpy()
        ids = [int(x) for x in d]
        nodes = [f"N{int(x) % 25}" for x in d]
        for x in d[d % 7 == 0]:
            ids.append(int(x))
            nodes.append(f"R{reg[int(x) % 25]}")
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(ids, dtype=np.int64), type=pa.int64()),
                "node_id": pa.array(nodes, type=pa.string()),
            }
        )

    return docs.map_batches(assign, batch_format="pyarrow")


def most_informative(sf_dir: str) -> ray.data.Dataset:
    """Per doc, keep only nodes that are NOT ancestors of another assigned
    node (A12 semantics restricted to the parent axis; the reference's
    ``contains`` axis collapses onto the same closure for a tree)."""
    dag = build_dag(sf_dir)
    closure_ref = ray.put(ancestor_closure(dag))

    def add_part(batch: pa.Table) -> pa.Table:
        p = (batch["doc_id"].to_numpy() % N_PARTS).astype(np.int32)
        return batch.append_column("dpart", pa.array(p, type=pa.int32()))

    def filter_part(df: pd.DataFrame) -> pd.DataFrame:
        from ahrd_ray.stages.score import get_broadcast

        closure = get_broadcast(closure_ref)
        keep_rows = []
        for doc, grp in df.groupby("doc_id", sort=False):
            nodes = set(grp["node_id"])
            dropped = set()
            for n in nodes:
                # drop any node that is an ancestor of another assigned node
                dropped |= closure.get(n, frozenset()) & nodes
            for n in sorted(nodes - dropped):
                keep_rows.append((int(doc), n))
        return pd.DataFrame(keep_rows, columns=["doc_id", "node_id"]).astype(
            {"doc_id": "int64"}
        )

    return (
        doc_nodes(sf_dir)
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("dpart")
        .map_groups(filter_part, batch_format="pandas")
    )
