"""HyperLogLog sketch: hash quality, estimator accuracy, exact-unit sums."""

import numpy as np
import pandas as pd
import pytest

from ahrd_ray.stages.generic import (
    HLL_BUCKET_SHIFT,
    HLL_LINEAR_COUNT,
    HLL_M,
    HLL_NUM,
    HLL_RHO_CAP,
    _bitlen_u64,
    splitmix64,
)


def _estimate(user_ids: np.ndarray) -> int:
    h = splitmix64(user_ids.astype(np.uint64))
    bucket = (h >> np.uint64(HLL_BUCKET_SHIFT)).astype(np.int64)
    r = h & np.uint64((1 << HLL_BUCKET_SHIFT) - 1)
    rho = np.minimum(1 + HLL_BUCKET_SHIFT - _bitlen_u64(r), HLL_RHO_CAP)
    regs = pd.DataFrame({"b": bucket, "rho": rho}).groupby("b")["rho"].max()
    units = (np.int64(1) << (HLL_RHO_CAP - regs.to_numpy())).sum() + (
        HLL_M - len(regs)
    ) * (1 << HLL_RHO_CAP)
    est = int(np.floor(HLL_NUM / np.float64(units)))
    v = HLL_M - len(regs)
    if est <= (5 * HLL_M) // 2 and v > 0:
        est = HLL_LINEAR_COUNT[v - 1]
    return est


def test_bitlen_exact_against_python():
    rng = np.random.default_rng(3)
    xs = rng.integers(0, 1 << 58, size=2000, dtype=np.uint64)
    xs[:3] = [0, 1, (1 << 58) - 1]
    got = _bitlen_u64(xs)
    want = np.array([int(x).bit_length() for x in xs])
    assert (got == want).all()


@pytest.mark.parametrize("true_n", [15, 100, 10_000, 1_000_000])
def test_estimate_within_expected_error(true_n):
    # sequential ids are the adversarial case that exposed the
    # multiplicative-only hash bias (+80%, measured); splitmix64 + the
    # linear-counting small-range path keep error within ~3 sigma of the
    # published 1.04/sqrt(m) standard error
    est = _estimate(np.arange(true_n, dtype=np.uint64))
    rel_err = abs(est - true_n) / true_n
    assert rel_err < 3 * 1.04 / np.sqrt(HLL_M), (true_n, est)


@pytest.mark.usefixtures("ray_session")
def test_hll_operator_matches_driver_side_kernel():
    from ahrd_ray.stages.generic import hll_distinct_users
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    got = hll_distinct_users(sf).to_pandas().sort_values("event_type")
    ev = pq.read_table(f"{sf}/events.parquet", columns=["event_type", "user_id"]).to_pandas()
    for t, g in ev.groupby("event_type"):
        want = _estimate(g["user_id"].unique().astype(np.uint64))
        assert int(got.loc[got.event_type == t, "est_users"].iloc[0]) == want


def test_kmv_matches_brute_force_and_exact_fallback():
    """kmv_distinct_users == the k-th-smallest-hash estimate computed
    driver-side from the exact distinct sets; below k distinct values the
    sketch returns the exact count (n_kept < k)."""
    import pyarrow.parquet as pq

    from ahrd_ray.stages.generic import KMV_K, kmv_distinct_users, splitmix64

    sf = "/root/testdata/sf0.001"
    got = (
        kmv_distinct_users(sf)
        .to_pandas()
        .sort_values("event_type")
        .set_index("event_type")
    )
    ev = pq.read_table(
        f"{sf}/events.parquet", columns=["event_type", "user_id"]
    ).to_pandas()
    for t, g in ev.groupby("event_type"):
        hs = np.sort(np.unique(splitmix64(g["user_id"].unique().astype(np.uint64))))
        if len(hs) < KMV_K:
            want, kept = len(hs), len(hs)
        else:
            want = ((KMV_K - 1) << 64) // int(hs[KMV_K - 1])
            kept = KMV_K
        assert int(got.loc[t, "est_users"]) == want
        assert int(got.loc[t, "n_kept"]) == kept
    # sketch accuracy sanity: within 2/sqrt(k) relative error on this corpus
    true = ev.groupby("event_type")["user_id"].nunique()
    for t in true.index:
        if int(got.loc[t, "n_kept"]) == KMV_K:
            rel = abs(int(got.loc[t, "est_users"]) - true[t]) / true[t]
            assert rel < 2 / np.sqrt(KMV_K), (t, rel)


def test_kmv_overlap_exact_below_k_and_bounded_above():
    """At sf0.001 every pair's union is below k, so all three outputs are
    EXACT set sizes; at sf0.01 the sketch branch engages and the
    intersection estimate stays within the KMV error envelope."""
    import duckdb

    from ahrd_ray.stages.generic import KMV_K, kmv_overlap

    got = kmv_overlap("/root/testdata/sf0.001").to_pandas()
    truth = {}
    con = duckdb.connect()
    rows = con.sql(
        "SELECT a.event_type, b.event_type,"
        " count(DISTINCT CASE WHEN a.user_id = b.user_id THEN a.user_id END)"
        " FROM (SELECT DISTINCT event_type, user_id FROM"
        " '/root/testdata/sf0.001/events.parquet') a"
        " JOIN (SELECT DISTINCT event_type, user_id FROM"
        " '/root/testdata/sf0.001/events.parquet') b"
        " ON a.event_type < b.event_type"
        " GROUP BY 1, 2"
    ).fetchall()
    for ta, tb, inter in rows:
        truth[(ta, tb)] = inter
    uni = {}
    for ta, tb, u in con.sql(
        "SELECT x.ta, x.tb, count(DISTINCT y.user_id) FROM"
        " (SELECT a.event_type ta, b.event_type tb FROM"
        "  (SELECT DISTINCT event_type FROM '/root/testdata/sf0.001/events.parquet') a"
        "  JOIN (SELECT DISTINCT event_type FROM '/root/testdata/sf0.001/events.parquet') b"
        "  ON a.event_type < b.event_type) x"
        " JOIN (SELECT DISTINCT event_type, user_id FROM"
        "  '/root/testdata/sf0.001/events.parquet') y"
        " ON y.event_type IN (x.ta, x.tb) GROUP BY 1, 2"
    ).fetchall():
        uni[(ta, tb)] = u
    for r in got.itertuples():
        key = (r.type_a, r.type_b)
        assert uni[key] < KMV_K  # sf0.001 is the exact regime
        assert r.est_union == uni[key]
        assert r.est_inter == truth[key] == r.n_common

    got01 = kmv_overlap("/root/testdata/sf0.01").to_pandas()
    assert (got01["est_union"] > 0).all()
    assert (got01["est_inter"] <= got01["est_union"]).all()
    assert (got01["n_common"] <= KMV_K).all()
