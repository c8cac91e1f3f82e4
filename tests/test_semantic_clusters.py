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


def test_knn_join_tie_break(ray_session, tmp_path):
    """Two exactly-equidistant neighbors: the LOWER id must win; self is
    excluded even at cosine 1.0 with itself."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    # vec 0 = [1,0]; vecs 1 and 2 both [0.5, 0.5] (same cosine to 0);
    # vec 3 = [0,1].  NN(0) -> tie between 1 and 2 -> 1.  NN(1) -> 2
    # (identical vector, cosine 1).  NN(3) -> tie 1/2 -> 1.
    vecs = [[1.0, 0.0], [0.5, 0.5], [0.5, 0.5], [0.0, 1.0]]
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(4, dtype=np.int64)),
            "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
        }
    )
    pq.write_table(tbl, tmp_path / "embeddings.parquet")

    from ahrd_ray.stages.simsearch import knn_join

    got = (
        knn_join(str(tmp_path))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert got["vec_id"].tolist() == [0, 1, 2, 3]
    assert got["nn_id"].tolist() == [1, 2, 1, 1]
    assert abs(got.loc[1, "cosine"] - 1.0) < 1e-12
    assert got.loc[1, "cosine"] == got.loc[2, "cosine"]


@pytest.mark.usefixtures("ray_session")
def test_min_label_components_long_chain_converges_flat():
    """A 160-node path graph needs ~8 pointer-doubled rounds — the shape
    that exposed the round-4 per-round blowup (union block-count growth +
    DatasetStats parent-DAG doubling, >600 s at sf0.1 on a constant
    1.5k-edge graph).  Asserts the exact fixpoint (every node labeled by
    the path's min id) and that per-round state keeps a BOUNDED block
    count; the suite timeout is the canary for any reintroduced
    exponential per-round cost."""
    import pandas as pd
    import ray

    from ahrd_ray.stages.dedup import min_label_components

    n = 160
    pairs = ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_a": np.arange(n - 1, dtype=np.int64),
                "doc_b": np.arange(1, n, dtype=np.int64),
            }
        )
    )
    ids = ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(n + 5, dtype=np.int64)})
    )
    out = (
        min_label_components(pairs, ids)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) == n + 5
    # chain nodes collapse to min id 0; the 5 isolated ids self-label
    assert (out.loc[: n - 1, "cluster_rep"].to_numpy() == 0).all()
    assert (
        out.loc[n:, "cluster_rep"].to_numpy() == out.loc[n:, "doc_id"].to_numpy()
    ).all()
