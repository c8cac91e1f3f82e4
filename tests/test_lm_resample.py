"""Language-balanced resampling and bigram-LM scoring semantics
(stages/textstats.lang_resample / lm_score)."""

import numpy as np
import pytest


@pytest.mark.usefixtures("ray_session")
def test_lang_resample_balances_to_minority():
    import pyarrow.parquet as pq

    from ahrd_ray.stages.generic import SAMPLE_MOD, SAMPLE_MULT
    from ahrd_ray.stages.textstats import lang_resample

    sf = "/root/testdata/sf0.001"
    df = lang_resample(sf).to_pandas()
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "lang"]).to_pandas()
    counts = docs.groupby("lang").size()
    mn = counts.min()
    # exact recount of the deterministic filter
    h = (docs["doc_id"].to_numpy(np.uint64) * np.uint64(SAMPLE_MULT)) % np.uint64(SAMPLE_MOD)
    limit = docs["lang"].map(
        {l: (SAMPLE_MOD * mn) // c for l, c in counts.items()}
    ).to_numpy(np.uint64)
    want = docs[h < limit]
    got = df.sort_values(["doc_id"]).reset_index(drop=True)
    assert got["doc_id"].tolist() == sorted(want["doc_id"].tolist())
    # every language is downsampled to ~the minority count (expectation);
    # the minority language itself is kept in full
    kept = df.groupby("lang").size()
    assert kept[counts.idxmin()] == mn


@pytest.mark.usefixtures("ray_session")
def test_lm_score_matches_direct_recount():
    import pyarrow.parquet as pq

    from ahrd_ray.stages.textstats import LM_QUANT, _split_counts, lm_score

    sf = "/root/testdata/sf0.001"
    df = lm_score(sf).to_pandas().set_index("doc_id")
    tbl = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    row, toks = _split_counts(tbl)
    ids = tbl["doc_id"].to_numpy()
    adj = row[1:] == row[:-1]
    import collections

    bg = collections.Counter(zip(toks[:-1][adj], toks[1:][adj]))
    pre = collections.Counter()
    for (a, _), n in bg.items():
        pre[a] += n
    per_doc_units = collections.Counter()
    per_doc_n = collections.Counter()
    for r, a, b in zip(row[:-1][adj], toks[:-1][adj], toks[1:][adj]):
        u = int(np.floor(bg[(a, b)] / pre[a] * LM_QUANT + 0.5))
        per_doc_units[ids[r]] += u
        per_doc_n[ids[r]] += 1
    for doc_id in ids:
        assert df.loc[doc_id, "n_bigrams"] == per_doc_n.get(doc_id, 0)
        n = per_doc_n.get(doc_id, 0)
        want = per_doc_units[doc_id] / (LM_QUANT * n) if n else 0.0
        assert df.loc[doc_id, "lm_q"] == want
    # a probability-weighted average of quantized MLE probs stays in [0, 1]
    assert ((df["lm_q"] >= 0) & (df["lm_q"] <= 1.0 + 1e-9)).all()


@pytest.mark.usefixtures("ray_session")
def test_lm_score_join_path_equals_broadcast_path(monkeypatch):
    from ahrd_ray.stages import textstats as tx

    sf = "/root/testdata/sf0.001"
    base = tx.lm_score(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    monkeypatch.setattr(tx, "DF_BROADCAST_MAX_ROWS", 0)  # force the join path
    joined = tx.lm_score(sf).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert base.equals(joined)


def test_temperature_sample_properties(ray_session):
    """tau=1/2 sampling: the most-upweighted language keeps ALL docs, keep
    rates follow w_l/c_l ordering (rarer languages keep proportionally
    more), and the kept set is a subset selected by the deterministic
    hash (re-running yields the identical sample)."""
    import numpy as np
    import pandas as pd

    from ahrd_ray.stages.textstats import temperature_sample

    sf = "/root/testdata/sf0.001"
    kept = temperature_sample(sf).to_pandas()
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "lang"])
    total = docs.groupby("lang").size()
    got = kept.groupby("lang").size().reindex(total.index, fill_value=0)
    rate = got / total
    # no language upsampled; at least one kept in full
    assert (got <= total).all()
    assert np.isclose(rate.max(), 1.0)
    # monotone: rarer language -> keep rate >= that of any more common one
    # (r_l ∝ 1/sqrt(c_l); allow hash noise at these tiny counts)
    by_count = total.sort_values()
    expected = 1 / np.sqrt(by_count.to_numpy(float))
    expected = expected / expected.max()
    assert np.corrcoef(rate[by_count.index].to_numpy(float), expected)[0, 1] > 0.9
    # determinism
    again = temperature_sample(sf).to_pandas()
    pd.testing.assert_frame_equal(
        kept.sort_values("doc_id").reset_index(drop=True),
        again.sort_values("doc_id").reset_index(drop=True),
    )
