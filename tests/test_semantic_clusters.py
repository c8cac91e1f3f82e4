"""Semantic near-dup clustering + fused doc features."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_semantic_clusters_are_transitive_closure():
    from ahrd_ray.stages.simsearch import embedding_near_dup_pairs, semantic_clusters

    labels = semantic_clusters(SF).to_pandas().set_index("vec_id")["cluster_rep"]
    pairs = embedding_near_dup_pairs(SF).to_pandas()
    # every directly-connected pair shares a label
    assert (labels.loc[pairs.vec_a].to_numpy() == labels.loc[pairs.vec_b].to_numpy()).all()
    # each rep is the min id of its cluster and labels itself
    for rep, grp in labels.groupby(labels):
        assert rep == grp.index.min()
        assert labels.loc[rep] == rep


@pytest.mark.usefixtures("ray_session")
def test_doc_features_matches_individual_operators():
    from ahrd_ray.stages.textstats import doc_features, fingerprints, langid, quality_scores

    fused = doc_features(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    q = quality_scores(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    l = langid(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    f = fingerprints(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (fused.quality.to_numpy() == q.quality.to_numpy()).all()
    assert (fused.pred_lang.to_numpy() == l.pred_lang.to_numpy()).all()
    assert (fused.fingerprint.to_numpy() == f.fingerprint.to_numpy()).all()
    assert (fused.n_distinct.to_numpy() >= 1).all()
