"""Composed cleaning pipeline (pipelines/corpus.clean_corpus, round 3)."""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_clean_corpus_composes_its_stages():
    from ahrd_ray.pipelines.corpus import clean_corpus
    from ahrd_ray.stages.dedup import BENCH_DOC_MOD, decontaminate, exact_dedup
    from ahrd_ray.stages.textstats import filtered_docs

    got = clean_corpus(SF).to_pandas()
    gated = filtered_docs(SF).to_pandas()
    survivors = set(exact_dedup(SF).to_pandas()["doc_id"])
    contaminated = set(decontaminate(SF).to_pandas()["doc_id"])

    want = gated[
        gated["doc_id"].isin(survivors)
        & (gated["doc_id"] % BENCH_DOC_MOD != 0)
        & ~gated["doc_id"].isin(contaminated)
    ][["doc_id", "n_tokens", "quality"]]

    got = got.sort_values("doc_id").reset_index(drop=True)
    want = want.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)

    # the composition must actually remove something at every stage on the
    # fixture corpus — otherwise the test proves nothing
    n_all = len(gated)
    assert len(got) < n_all
    assert contaminated, "fixture corpus has no contaminated docs"
    assert (gated["doc_id"] % BENCH_DOC_MOD == 0).any()
