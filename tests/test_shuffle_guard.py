"""Regression test for the hash-shuffle schema-broadcast guard.

Ray 2.49's hash join broadcasts each input's schema to its aggregators
piggybacked on the FIRST block bundle per input, but the remote shuffle task
drops empty blocks before fanning the schema out — so an empty first block
consumes the one-shot broadcast and any aggregator partition that receives
no real rows finalizes a zero-column table, crashing the join with
ArrowInvalid "No match or multiple matches for key field".  This was the
round-3 flaky ``kg_kcore`` CORRECTNESS failure.

``ahrd_ray`` installs a driver-side guard at import
(``stages/partitioning.py::install_shuffle_schema_guard``) that strips empty
blocks from bundles before the shuffle operator sees them.  Without the
guard, the construction below — 20 empty blocks ahead of one data block —
fails the join 10/10 times; with it, 0/10.
"""

import numpy as np
import pyarrow as pa
import pytest


def _empty_heavy_left():
    import ray

    empty = pa.table(
        {"node": pa.array([], pa.string()), "v": pa.array([], pa.int64())}
    )
    full = pa.table(
        {
            "node": pa.array(["a", "b", "c"] * 10),
            "v": pa.array(np.arange(30, dtype=np.int64)),
        }
    )
    return ray.data.from_arrow([empty] * 20 + [full])


def test_guard_installed():
    import ahrd_ray  # noqa: F401  (import installs the guard)
    from ray.data._internal.execution.operators.hash_shuffle import (
        HashShufflingOperatorBase,
    )

    assert getattr(HashShufflingOperatorBase, "_ahrd_schema_guard", False)


@pytest.mark.parametrize("attempt", range(3))
def test_join_survives_empty_first_blocks(ray_session, attempt):
    import ray

    import ahrd_ray  # noqa: F401

    left = _empty_heavy_left()
    right = ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(["a", "b", "c"]),
                "w": pa.array([1, 2, 3], pa.int64()),
            }
        )
    )
    joined = left.join(
        right, "inner", num_partitions=8, on=("node",), right_on=("node",)
    )
    assert joined.count() == 30


@pytest.mark.parametrize(
    "join_type,empty_side,expect",
    [
        ("inner", "left", 0),
        ("inner", "right", 0),
        ("left_semi", "right", 0),
        ("left_anti", "right", 30),
        ("left_outer", "right", 30),
        ("inner", "both", 0),
    ],
)
def test_join_survives_genuinely_empty_input(
    ray_session, join_type, empty_side, expect
):
    """A join input with ZERO blocks (converged peel / exhausted frontier)
    used to crash Acero with a zero-column table; the SchemaSafeJoinAggregation
    finalize yields the row-correct result per join type."""
    import ray

    import ahrd_ray  # noqa: F401

    full = ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(["a", "b", "c"] * 10),
                "v": pa.array(np.arange(30, dtype=np.int64)),
            }
        )
    )
    small = ray.data.from_arrow(
        pa.table({"node": pa.array(["a", "b", "c"]), "w": pa.array([1, 2, 3])})
    )
    left = full.filter(lambda r: False) if empty_side in ("left", "both") else full
    right = small.filter(lambda r: False) if empty_side in ("right", "both") else small
    joined = left.join(
        right, join_type, num_partitions=4, on=("node",), right_on=("node",)
    )
    assert joined.count() == expect


def test_budgeted_join_survives_empty_blocks(ray_session):
    import ray

    from ahrd_ray.stages.partitioning import budgeted_join

    left = _empty_heavy_left()
    right = ray.data.from_arrow(
        pa.table(
            {
                "node2": pa.array(["a", "c"]),
                "w": pa.array([1.0, 3.0], pa.float64()),
            }
        )
    )
    joined = budgeted_join(left, right, on=("node",), right_on=("node2",))
    out = joined.to_pandas()
    assert len(out) == 20
    assert set(out["node"]) == {"a", "c"}
