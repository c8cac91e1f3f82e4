"""Left-outer join and the chained two-join Q3 query (stages/generic,
round 3).

The outer-join's null-preserving branch is proven on a fixture where some
customers have NO orders (the sf tables may not contain any such customer),
and the Q3 revenue quantization is checked against DuckDB computing the
same int64-unit sum.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orphan_dir(tmp_path_factory):
    """customers 1..20, orders only for even custkeys — half the customers
    must surface with n_orders = 0."""
    d = tmp_path_factory.mktemp("orphans")
    cust = pd.DataFrame({"c_custkey": np.arange(1, 21, dtype=np.int64)})
    ok = np.arange(100, dtype=np.int64)
    orders = pd.DataFrame(
        {"o_orderkey": ok, "o_custkey": (ok % 10 + 1) * 2}  # even keys 2..20
    )
    cust.to_parquet(d / "customer.parquet", index=False)
    orders.to_parquet(d / "orders.parquet", index=False)
    return str(d)


@pytest.mark.usefixtures("ray_session")
def test_left_join_keeps_zero_order_customers(orphan_dir):
    from ahrd_ray.stages.generic import customer_order_counts

    got = (
        customer_order_counts(orphan_dir)
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    want = (
        duckdb.connect()
        .execute(
            f"""SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
            FROM '{orphan_dir}/customer.parquet' c
            LEFT JOIN '{orphan_dir}/orders.parquet' o ON o.o_custkey = c.c_custkey
            GROUP BY c.c_custkey ORDER BY c.c_custkey"""
        )
        .df()
        .astype({"c_custkey": "int64", "n_orders": "int64"})
    )
    # the fixture really exercises the outer branch: odd custkeys have no
    # orders and MUST appear with a zero count
    assert (want["n_orders"] == 0).sum() == 10
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_q3_matches_duckdb_at_sf0001():
    from ahrd_ray.pipelines.oracle import sql_q3_top_orders
    from ahrd_ray.stages.generic import q3_top_orders

    got = got_raw = q3_top_orders(SF).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    for t in ["customer", "orders", "lineitem"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    want = con.execute(sql_q3_top_orders()).df()
    got = got[want.columns].reset_index(drop=True)
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(got, want)
    # revenue is an exact unit-sum: repeated runs are bit-identical
    again = q3_top_orders(SF).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got_raw, again)
