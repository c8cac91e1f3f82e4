"""Posting-list and length-gate semantics (stages/textstats.postings /
length_gate)."""

import numpy as np
import pytest


@pytest.mark.usefixtures("ray_session")
def test_postings_rank_and_truncation():
    import pyarrow.parquet as pq

    from ahrd_ray.stages.textstats import POSTINGS_TOP, _split_counts, postings

    sf = "/root/testdata/sf0.001"
    df = postings(sf).to_pandas()
    assert (df["rank"] >= 1).all() and (df["rank"] <= POSTINGS_TOP).all()
    # exact recount for one token: highest-tf docs, ties to lower doc_id
    tbl = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    row, toks = _split_counts(tbl)
    ids = tbl["doc_id"].to_numpy()
    import collections

    tok = df["token"].iloc[0]
    tf = collections.Counter(ids[row[toks == tok]])
    want = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:POSTINGS_TOP]
    got = df[df["token"] == tok].sort_values("rank")
    assert list(zip(got["doc_id"], got["tf"])) == want
    # ranks are dense per token starting at 1
    for _, g in df.groupby("token"):
        assert sorted(g["rank"]) == list(range(1, len(g) + 1))


@pytest.mark.usefixtures("ray_session")
def test_length_gate_is_exact_quantile_window():
    import pyarrow.parquet as pq

    from ahrd_ray.stages.textstats import (
        LENGTH_GATE_HI,
        LENGTH_GATE_LO,
        _split_counts,
        length_gate,
    )

    sf = "/root/testdata/sf0.001"
    df = length_gate(sf).to_pandas()
    tbl = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    row, _ = _split_counts(tbl)
    nt = np.bincount(row, minlength=tbl.num_rows)
    s = np.sort(nt)
    n = len(s)
    lo = s[(LENGTH_GATE_LO[0] * n + LENGTH_GATE_LO[1] - 1) // LENGTH_GATE_LO[1] - 1]
    hi = s[(LENGTH_GATE_HI[0] * n + LENGTH_GATE_HI[1] - 1) // LENGTH_GATE_HI[1] - 1]
    want = set(tbl["doc_id"].to_numpy()[(nt >= lo) & (nt <= hi)])
    assert set(df["doc_id"]) == want
    assert (df["n_tokens"] >= lo).all() and (df["n_tokens"] <= hi).all()
