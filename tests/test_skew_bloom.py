"""Skew-aware join and Bloom-prefiltered semi-join (stages/generic, round 3).

The sf fixtures only exercise the degenerate ends of the skew join (all
keys hot at sf0.001, none hot at sf0.01), so the mixed hot+cold split is
proven here on a synthetic skewed corpus against DuckDB.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def skewed_dir(tmp_path_factory):
    """events with ONE dominant key (60% of rows) + a cold tail, customer
    dim covering most keys (one hot and one cold key deliberately missing
    from the dimension to pin inner-join semantics)."""
    d = tmp_path_factory.mktemp("skewed")
    rows = 2000
    n_hot = int(rows * 0.6)
    hot_user = 7
    cold = 100 + (np.arange(rows - n_hot, dtype=np.int64) % 50)
    user = np.concatenate([np.full(n_hot, hot_user, dtype=np.int64), cold])
    ev = pd.DataFrame({"event_id": np.arange(rows, dtype=np.int64), "user_id": user})
    custkeys = [hot_user] + [100 + k for k in range(50)]
    custkeys.remove(100 + 13)  # cold key without a dim row
    cust = pd.DataFrame(
        {
            "c_custkey": np.asarray(custkeys, dtype=np.int64),
            "c_name": [f"Customer#{k}" for k in custkeys],
        }
    )
    ev.to_parquet(d / "events.parquet", index=False)
    cust.to_parquet(d / "customer.parquet", index=False)
    return str(d)


@pytest.mark.usefixtures("ray_session")
def test_skew_join_mixed_hot_cold_matches_duckdb(skewed_dir):
    from ahrd_ray.stages.generic import HOT_KEY_DIVISOR, skew_join_events_customers

    got = (
        skew_join_events_customers(skewed_dir)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    want = con.execute(
        f"""SELECT e.event_id, e.user_id, c.c_name
            FROM '{skewed_dir}/events.parquet' e
            JOIN '{skewed_dir}/customer.parquet' c ON e.user_id = c.c_custkey
            ORDER BY e.event_id"""
    ).df()
    # the fixture really is mixed: the hot key exceeds the threshold, the
    # tail does not
    assert 2000 * 0.6 > 2000 / HOT_KEY_DIVISOR > 2000 * 0.4 / 50
    pd.testing.assert_frame_equal(
        got.astype({"event_id": "int64", "user_id": "int64"}),
        want.astype({"event_id": "int64", "user_id": "int64"}),
    )


@pytest.mark.usefixtures("ray_session")
def test_bloom_prefilter_keeps_all_true_matches():
    """The bitmap may pass false positives (removed by the verify join)
    but must NEVER drop a true key — one-sidedness is what makes the
    operator exact."""
    from ahrd_ray.stages.generic import (
        BLOOM_K,
        BLOOM_M_BITS,
        _bloom_positions,
    )

    keys = np.arange(0, 200_000, 7, dtype=np.int64)
    n_words = BLOOM_M_BITS // 64
    bm = np.zeros(n_words, dtype=np.uint64)
    for j in range(BLOOM_K):
        pos = _bloom_positions(keys, j)
        np.bitwise_or.at(bm, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64))
    ok = np.ones(len(keys), dtype=bool)
    for j in range(BLOOM_K):
        pos = _bloom_positions(keys, j)
        ok &= ((bm[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)).astype(
            bool
        )
    assert ok.all()


@pytest.mark.usefixtures("ray_session")
def test_bloom_semi_join_matches_duckdb():
    from ahrd_ray.stages.generic import bloom_semi_join_revenue
    from ahrd_ray.pipelines.oracle import sql_bloom_semi_join_revenue

    got = (
        bloom_semi_join_revenue(SF)
        .to_pandas()
        .sort_values("l_suppkey")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    want = (
        con.execute(sql_bloom_semi_join_revenue())
        .df()
        .sort_values("l_suppkey")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"l_suppkey": "int64", "n_items": "int64"}), want
    )


@pytest.mark.usefixtures("ray_session")
def test_dedup_docs_reps_are_cluster_members():
    from ahrd_ray.stages.dedup import dedup_docs, dup_clusters

    labels = dup_clusters(SF).to_pandas()
    survivors = dedup_docs(SF).to_pandas()
    # survivors = distinct cluster reps; sizes sum to the corpus
    assert set(survivors.doc_id) == set(labels.cluster_rep)
    assert survivors.cluster_size.sum() == len(labels)
    # every rep is the min doc_id of its cluster
    mins = labels.groupby("cluster_rep")["doc_id"].min()
    assert (mins.index.to_numpy() == mins.to_numpy()).all()
