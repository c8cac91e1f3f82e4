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


# ---------------------------------------------------------------------------
# S10/S11 file form: gold references FASTA + competitor .annot readers
# ---------------------------------------------------------------------------


def test_gold_reference_parser_semantics(ray_session):
    """ReferenceDescription.constructFromFastaEntry fidelity: accession =
    first space token; description = header minus EVERY accession
    occurrence (Java replace-all), trimmed; blacklist empties (does not
    drop); filter chain rewrites; body lines ignored."""
    import pyarrow as pa

    from ahrd_ray.sources.goldfiles import GoldReferenceParser

    batch = pa.table(
        {
            "text": [
                ">7 alpha beta a7b",  # '7' removed everywhere: 'a7b' -> 'ab'
                "SEQSEQSEQ",  # body line: ignored
                ">8 putative kinase protein",
                ">9 DUF1234 domain thing",
            ]
        }
    )
    plain = GoldReferenceParser()(batch).to_pandas().set_index("doc_id")
    assert set(plain.loc[7, "gold"].split(" ")) == {"alpha", "beta", "ab"}
    assert plain.loc[8, "n_gold"] == 3

    # blacklist hit -> empty gold set, record kept
    bl = GoldReferenceParser(description_blacklist=("^DUF\\d+",))(batch)
    bl = bl.to_pandas().set_index("doc_id")
    assert bl.loc[9, "gold"] == "" and bl.loc[9, "n_gold"] == 0
    assert bl.loc[8, "n_gold"] == 3

    # filter chain applies only to blacklist survivors
    fl = GoldReferenceParser(
        description_blacklist=("^DUF\\d+",), description_filter=("putative",)
    )(batch).to_pandas().set_index("doc_id")
    assert set(fl.loc[8, "gold"].split(" ")) == {"kinase", "protein"}

    # token blacklist drops individual tokens
    tb = GoldReferenceParser(token_blacklist=("^beta$",))(batch)
    tb = tb.to_pandas().set_index("doc_id")
    assert set(tb.loc[7, "gold"].split(" ")) == {"alpha", "ab"}


def test_competitor_annot_parser_semantics(ray_session, tmp_path):
    """Blast2GoAnnot fidelity: cols 0/2, GO accession ignored, rows with
    empty accession/description dropped, dedup BY DESCRIPTION per doc,
    short lines error (the reference crashes on vals[2])."""
    import pytest

    from ahrd_ray.sources.goldfiles import read_competitor_annots

    p = tmp_path / "x.annot"
    p.write_text(
        "3\tGO:1\tAlpha beta\n"
        "3\tGO:2\tAlpha beta\n"  # same description -> one annot
        "3\tGO:3\tgamma\n"
        "3\tGO:4\t\t-\n"  # empty description cell -> dropped
        "\tGO:5\tdelta\n"  # empty accession -> dropped
    )
    out = read_competitor_annots(str(p)).to_pandas()
    assert len(out) == 1 and out["doc_id"].iloc[0] == 3
    anns = out["anns"].iloc[0].split("|")
    assert sorted(anns) == ["alpha beta", "gamma"]

    bad = tmp_path / "bad.annot"
    bad.write_text("3\tGO:1\n")
    with pytest.raises(Exception):
        read_competitor_annots(str(bad)).to_pandas()


def test_eval_scores_file_matches_duckdb(ray_session):
    """ev_scores_file fixture path end-to-end vs its DuckDB oracle."""
    import duckdb

    from ahrd_ray.pipelines import oracle
    from ahrd_ray.pipelines.queriesdef import registry

    fn, osql = registry()["ev_scores_file"]
    got = fn(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    want = (
        con.execute(osql).fetchdf().sort_values("doc_id").reset_index(drop=True)
    )
    import numpy as np

    assert len(got) == len(want)
    for c in ["eval_score", "best_comp_score", "delta", "highest_possible"]:
        assert np.allclose(got[c].to_numpy(), want[c].to_numpy(), atol=1e-12), c


@pytest.mark.usefixtures("ray_session")
def test_grid_search_objective_matches_eval_summary():
    """tr_grid combo 0 (the default weights) must equal the ORACLE-GATED
    eval_summary mean_eval_score exactly — the indirect SQL gate for the
    grid sweep (the direct 4-chain UNION oracle is too slow for the
    per-round driver gate; see queriesdef).  The grid must also be
    deterministic and carry one row per combo."""
    from ahrd_ray.pipelines import kg
    from ahrd_ray.pipelines.trainer import GRID_COMBOS, grid_search
    from ahrd_ray.stages.evaluate import eval_summary

    sf = "/root/testdata/sf0.001"
    g = grid_search(sf).to_pandas()
    assert len(g) == len(GRID_COMBOS)
    assert g["combo_id"].tolist() == list(range(len(GRID_COMBOS)))
    es = eval_summary(kg.cached_context(sf)).to_pandas()
    assert float(g.loc[0, "objective"]) == float(es["mean_eval_score"].iloc[0])
    # weights rows mirror the grid constants
    for i, (wb, wd, wo) in enumerate(GRID_COMBOS):
        assert (g.loc[i, ["w_bit", "w_db", "w_ov"]].to_numpy() == [wb, wd, wo]).all()


def test_eval_threshold_curve_monotone_and_anchored(ray_session):
    """The acceptance curve is monotone non-increasing in n_ge, thr=0
    counts every doc, and each row's score mass is bounded by the total."""
    from ahrd_ray.pipelines.kg import cached_context
    from ahrd_ray.stages.evaluate import eval_threshold_curve

    sf = "/root/testdata/sf0.001"
    got = (
        eval_threshold_curve(cached_context(sf))
        .to_pandas()
        .sort_values("thr")
        .reset_index(drop=True)
    )
    assert got["thr"].tolist() == list(range(11))
    n = got["n_ge"].to_numpy()
    assert (n[:-1] >= n[1:]).all()
    import duckdb

    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{sf}/documents.parquet'"
    ).fetchone()[0]
    assert int(n[0]) == n_docs  # every score >= 0.0
    total = got["sum_score"].iloc[0]
    assert (got["sum_score"] <= total + 1e-12).all()


@pytest.mark.usefixtures("ray_session")
def test_bootstrap_scores_distribution():
    """B exact resample rows; weights are genuinely Poisson-ish (mean draw
    count ~ n docs, all four weight values realized); the distribution
    brackets the plain mean."""
    import numpy as np

    from ahrd_ray.pipelines import kg
    from ahrd_ray.stages.evaluate import BOOT_B, _poisson_w, bootstrap_scores, eval_scores

    sf = "/root/testdata/sf0.001"
    ctx = kg.cached_context(sf)
    got = bootstrap_scores(ctx).to_pandas().sort_values("resample_id")
    assert len(got) == BOOT_B
    ev = eval_scores(ctx).to_pandas()
    n = len(ev)
    # mean draws per resample ~ n (Poisson(1) surrogate has mean 15/16)
    assert 0.7 * n < got["n_draws"].mean() < 1.1 * n
    ids = ev["doc_id"].to_numpy()
    all_w = np.concatenate([_poisson_w(ids, b) for b in range(8)])
    assert set(np.unique(all_w)) == {0, 1, 2, 3}
    mu = ev["eval_score"].mean()
    assert got["mean_score"].min() <= mu <= got["mean_score"].max()
