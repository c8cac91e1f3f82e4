"""M1/M2/M4 regex-chain conformance.

Mirrors the reference's interactive regex harness (TestRegexs.java:19-34) and
the blacklist/filter semantics of DescriptionScoreCalculator.java:25-55 using
the verbatim regex-list contract files shipped in ahrd_ray/data/.
"""

from ahrd_ray.config import DEFAULT_CONFIG, load_regex_list
from ahrd_ray.functions.regexes import (
    apply_filters,
    passes_blacklist,
    token_passes_blacklist,
)

BLACKLIST = load_regex_list("blacklist_descline.txt")
TOKEN_BLACKLIST = load_regex_list("blacklist_token.txt")
FILTER_WIDE = load_regex_list("filter_descline_wide.txt")
FILTER_MID = load_regex_list("filter_descline_mid.txt")


def test_regex_lists_loaded_in_file_order():
    assert len(BLACKLIST) == 10
    assert len(TOKEN_BLACKLIST) == 26
    assert BLACKLIST[0] == "(?i)^similar\\s+to"
    assert TOKEN_BLACKLIST[-1] == "(?i)\\b\\w?orf(\\w?|\\d+)\\b"


def test_description_blacklist():
    # DescriptionScoreCalculator.java:25-33 — fail on first find()
    assert not passes_blacklist("Putative sheep horn protein", BLACKLIST)
    assert not passes_blacklist("probable membrane protein", BLACKLIST)
    assert not passes_blacklist("Uncharacterized protein At1g01010", BLACKLIST)
    assert not passes_blacklist("whole genome shotgun sequence", BLACKLIST)
    assert passes_blacklist("Flavohemoprotein-1", BLACKLIST)
    # empty / None never pass
    assert not passes_blacklist("", BLACKLIST)
    assert not passes_blacklist(None, BLACKLIST)
    # mid-string 'putative' passes the ^-anchored description blacklist
    assert passes_blacklist("sheep putative horn", BLACKLIST)


def test_description_filter_strips_and_condenses():
    # filter semantics: replace match with ' ', condense \s{2,}, trim
    # (DescriptionScoreCalculator.java:45-55)
    assert (
        apply_filters("Flavohemoprotein OS=Arabidopsis thaliana GN=HBL1", FILTER_WIDE)
        == "Flavohemoprotein"
    )
    assert apply_filters("DCL2 (Fragment)", FILTER_WIDE) == "DCL2"
    # pipe-triple (sp|Q9SXB8|Y1133_ARATH) removed by \b\S+\|\S+\|\S+
    assert apply_filters("x sp|Q9SXB8|Y1133_ARATH y", FILTER_WIDE) == "x y"
    # all-punctuation lines collapse to empty
    assert apply_filters("( ) - + * , ; . : | 0 1 2", FILTER_WIDE) == ""
    # TAIR symbols block (filter_descline_tair.txt ->
    # ahrd_ray/data/filter_descline_mid.txt)
    assert (
        apply_filters("DCL1 | Symbols: EMB76 | dicer-like 1", FILTER_MID)
        == "DCL1 dicer-like 1"
    )


def test_token_blacklist():
    # TokenScoreCalculator.tokenPassesBlacklist (java :32-43)
    for bad in ["protein", "family", "activity", "putative", "orf2", "Borf1"]:
        assert not token_passes_blacklist(bad, TOKEN_BLACKLIST), bad
    for good in ["flavohemoprotein", "dicer", "1", "kinase"]:
        assert token_passes_blacklist(good, TOKEN_BLACKLIST), good
    assert not token_passes_blacklist("", TOKEN_BLACKLIST)
    assert not token_passes_blacklist(None, TOKEN_BLACKLIST)


def test_config_source_regex_sets():
    cfg = DEFAULT_CONFIG
    assert [s.name for s in cfg.sources] == ["wide", "mid", "niche"]
    assert cfg.weights_by_source() == {"wide": 100, "mid": 50, "niche": 10}
    assert cfg.dsbs_by_source() == {"wide": 0.2, "mid": 0.4, "niche": 0.4}
    for s in cfg.sources:
        assert len(s.blacklist()) == 10
        assert len(s.token_blacklist()) == 26
        assert len(s.filters()) >= 10


def test_mojibake_repair_discriminates():
    """The repair fixes cp1252- and latin-1-shaped mojibake, refuses to
    touch clean text (including text whose real characters are outside
    latin-1), and is idempotent."""
    from ahrd_ray.stages.textstats import mojibake_suffix, repair_mojibake

    orig = "scan merge row" + mojibake_suffix(5)
    cp = orig.encode("utf-8").decode("cp1252")
    assert cp != orig
    assert repair_mojibake(cp) == orig
    assert repair_mojibake(repair_mojibake(cp)) == orig  # idempotent
    # latin-1-shaped corruption (C1 controls where cp1252 is unmapped)
    lat = "x\N{LATIN SMALL LETTER U WITH DIAERESIS}".encode("utf-8").decode(
        "latin-1"
    )
    assert repair_mojibake(lat) == "xü"
    # clean text with chars outside latin-1 must NOT be "repaired"
    clean = "em — dash № real"
    assert repair_mojibake(clean) == clean
    assert repair_mojibake("ascii only") == "ascii only"
