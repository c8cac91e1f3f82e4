"""Evaluator + trainer + taxonomy pipeline tests (sf0.001)."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_most_informative_drops_ancestors(ray_session):
    from ahrd_ray.stages.taxonomy import doc_nodes, most_informative

    before = doc_nodes(SF).to_pandas()
    after = most_informative(SF).to_pandas()
    # docs with doc_id % 7 == 0 carry the parent region, which must be gone
    assert len(after) < len(before)
    assert not after["node_id"].str.startswith("R").any()
    # every doc keeps its nation node
    assert after["doc_id"].nunique() == 500


def test_eval_scores_bounds(ray_session):
    from ahrd_ray.pipelines.kg import PipelineContext
    from ahrd_ray.stages.evaluate import eval_scores

    df = eval_scores(PipelineContext(SF)).to_pandas()
    assert len(df) == 500
    for c in ["eval_score", "best_comp_score", "highest_possible"]:
        assert (df[c] >= 0).all() and (df[c] <= 1).all()
    # the best unchanged competitor / highest-possible dominate structure:
    # highest_possible >= eval_score (winner is one of the top-k candidates)
    assert (df["highest_possible"] >= df["eval_score"] - 1e-12).all()
    assert np.allclose(df["delta"], df["eval_score"] - df["best_comp_score"])


def test_trainer_deterministic_and_logs(ray_session):
    from ahrd_ray.pipelines.trainer import train

    a = train(SF, iterations=3, temperature=200.0, cool_down_by=50.0, seed=11)
    b = train(SF, iterations=3, temperature=200.0, cool_down_by=50.0, seed=11)
    assert a.equals(b)  # seeded -> fully reproducible
    assert list(a["iteration"]) == [0, 1, 2]
    assert (a["temperature"].diff().dropna() == -50.0).all()
    assert (a["best_score"] >= 0).all()


def test_random_start_configs_are_valid():
    from ahrd_ray.pipelines.trainer import random_start_configs

    cfgs = random_start_configs(5)
    assert len(cfgs) == 5
    for c in cfgs:
        s = (
            c.token_score_bit_score_weight
            + c.token_score_database_score_weight
            + c.token_score_overlap_score_weight
        )
        assert 0.999 <= round(s, 9) <= 1.001
