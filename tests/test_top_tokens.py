"""Exact heavy hitters (stages/textstats.top_tokens, round 3).

The sf corpora have tiny vocabularies (every token is a candidate, bound
0), so the lossy-sketch path and the certificate are proven here on a
Zipfian fixture where per-block capacity genuinely drops tokens.
"""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def zipf_dir(tmp_path_factory):
    """400 docs over a Zipf-ish vocabulary: head tokens hugely frequent, a
    long tail of rare tokens so a capacity-16 sketch must drop some."""
    d = tmp_path_factory.mktemp("zipf")
    rng = np.random.RandomState(7)
    vocab = [f"tok{i:04d}" for i in range(400)]
    probs = 1.0 / np.arange(1, len(vocab) + 1) ** 1.3
    probs /= probs.sum()
    texts = [
        " ".join(rng.choice(vocab, size=120, p=probs)) for _ in range(400)
    ]
    pd.DataFrame(
        {"doc_id": np.arange(400, dtype=np.int64), "text": texts}
    ).to_parquet(d / "documents.parquet", index=False)
    return str(d)


@pytest.mark.usefixtures("ray_session")
def test_lossy_sketch_still_exact(zipf_dir):
    from ahrd_ray.stages.textstats import top_tokens

    # capacity 64 < the 400-token vocabulary: every block's sketch drops
    # tail tokens (bound > 0), yet the head counts dwarf the bound so the
    # certificate passes and the result must equal the full exact counts
    got = top_tokens(zipf_dir, k=10, capacity=64).to_pandas().reset_index(drop=True)

    want = (
        pd.read_parquet(f"{zipf_dir}/documents.parquet")["text"]
        .str.split(" ")
        .explode()
        .value_counts()
        .rename_axis("token")
        .reset_index(name="n")
        .sort_values(["n", "token"], ascending=[False, True], kind="mergesort")
        .head(10)
        .reset_index(drop=True)
        .astype({"n": "int64"})
    )
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_certificate_refuses_unprovable_result(zipf_dir):
    from ahrd_ray.stages.textstats import top_tokens

    # k deep into the tail with a tiny capacity: the k-th count cannot beat
    # the missed-count bound, so the operator must REFUSE, not approximate
    with pytest.raises(Exception, match="certificate failed"):
        top_tokens(zipf_dir, k=200, capacity=8).to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_sf_corpus_matches_tokenizer_semantics():
    from ahrd_ray.stages.textstats import top_tokens

    got = top_tokens(SF, k=5).to_pandas()
    assert len(got) == 5
    assert (got["n"].to_numpy()[:-1] >= got["n"].to_numpy()[1:]).all()


@pytest.mark.usefixtures("ray_session")
def test_certificate_sees_complete_topk(tmp_path):
    """Regression: the certificate must evaluate the COMPLETE k-row result.
    When the post-sort limit output spans multiple blocks, a per-batch
    check saw partial row sets and spuriously refused (review repro:
    k=1500 over a 3000-token vocabulary raised with '590 candidates')."""
    from ahrd_ray.stages.textstats import top_tokens

    rng = np.random.RandomState(3)
    vocab = [f"w{i:04d}" for i in range(3000)]
    probs = 1.0 / np.arange(1, len(vocab) + 1) ** 0.7
    probs /= probs.sum()
    text = " ".join(rng.choice(vocab, size=450_000, p=probs))
    d = tmp_path / "bigdoc"
    d.mkdir()
    pd.DataFrame({"doc_id": [0], "text": [text]}).to_parquet(
        d / "documents.parquet", index=False
    )
    got = top_tokens(str(d), k=1500, capacity=2048).to_pandas()
    assert len(got) == 1500
    n = got["n"].to_numpy()
    assert (n[:-1] >= n[1:]).all()
