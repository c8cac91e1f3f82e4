"""Grouped regression + Gopher-gate filter + partitioned sink."""

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_regression_matches_lstsq():
    from ahrd_ray.stages.generic import events_regression

    got = events_regression(SF).to_pandas().set_index("event_type")
    ev = pq.read_table(f"{SF}/events.parquet", columns=["ts", "event_type", "value"]).to_pandas()
    for t, g in ev.groupby("event_type"):
        x = g["ts"].dt.hour.to_numpy(np.float64)
        # same q20 rounding of y the sufficient statistics apply
        y = np.floor(g["value"].to_numpy() * (1 << 20) + 0.5) / (1 << 20)
        slope, intercept = np.polyfit(x, y, 1)
        assert got.loc[t, "slope"] == pytest.approx(slope, rel=1e-9)
        assert got.loc[t, "intercept"] == pytest.approx(intercept, rel=1e-9)
        assert got.loc[t, "n"] == len(g)


@pytest.mark.usefixtures("ray_session")
def test_filtered_docs_is_subset_with_gates_satisfied():
    from ahrd_ray.stages.textstats import (
        FILTER_MAX_STOPWORD_RATIO,
        FILTER_MIN_TOKENS,
        FILTER_MIN_TTR,
        filtered_docs,
    )

    df = filtered_docs(SF).to_pandas()
    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert 0 < len(df) < n_docs  # gates drop some docs, keep others
    assert (df.n_tokens >= FILTER_MIN_TOKENS).all()
    assert (df.stopword_ratio <= FILTER_MAX_STOPWORD_RATIO).all()
    assert (df.type_token_ratio >= FILTER_MIN_TTR).all()


@pytest.mark.usefixtures("ray_session")
def test_partitioned_sink_layout_is_resumable():
    import os

    from ahrd_ray.sources.formats import documents_partitioned_dir

    d = documents_partitioned_dir(SF)
    parts = sorted(p for p in os.listdir(d) if p.startswith("lang="))
    # one directory per partition key value — a failed run can skip
    # finished partitions by listing
    assert parts, d
    assert all("=" in p for p in parts)
