"""Unit tests for the round-2 additions: vectorized hash61 kernels,
validateDouble (M7), YAML config ingestion (S1).  No Ray needed."""

from __future__ import annotations

import numpy as np
import pytest

M = (1 << 61) - 1
B = 1000003


def ref_hash(s: str) -> int:
    h = 0
    for b in s.encode("utf-8"):
        h = (h * B + b) % M
    return h


def test_polyhash_arr_matches_scalar():
    from ahrd_ray.functions.hash61 import polyhash_arr

    strs = ["", "a", "hello world", "x" * 300, "üñïçødé"]
    got = polyhash_arr(strs)
    exp = np.array([ref_hash(s) for s in strs], dtype=np.uint64)
    assert (got == exp).all()


def test_mulmod61_exact():
    from ahrd_ray.functions.hash61 import mulmod61

    rng = np.random.RandomState(3)
    a = rng.randint(0, M, 300).astype(np.uint64)
    b = rng.randint(0, M, 300).astype(np.uint64)
    exp = np.array([(int(x) * int(y)) % M for x, y in zip(a, b)], dtype=np.uint64)
    assert (mulmod61(a, b) == exp).all()


def test_window_hashes_match_rolling():
    from ahrd_ray.functions.hash61 import polyhash_bytes_windows

    data = np.frombuffer(b"rolling hash windows over bytes", dtype=np.uint8)
    w = 7
    got = polyhash_bytes_windows(data, w)
    exp = []
    for i in range(len(data) - w + 1):
        h = 0
        for b in data[i : i + w]:
            h = (h * B + int(b)) % M
        exp.append(h)
    assert (got == np.array(exp, dtype=np.uint64)).all()


def test_shingles_compose_to_gram_string_hashes():
    from ahrd_ray.stages.dedup import shingle_hashes

    text = "the quick brown fox jumps"
    grams = ["the quick brown", "quick brown fox", "brown fox jumps"]
    exp = np.unique(np.array([ref_hash(g) for g in grams], dtype=np.uint64))
    got = shingle_hashes(text, 3)
    assert (got == exp).all()


def test_validate_double_m7():
    """BlastResult.java:91-95: 'e-10' parses as 1e-10."""
    from ahrd_ray.sources.external import validate_double

    vals = np.array(["e-10", "E-5", "1.5e-3", "42", "0.0"], dtype=object)
    out = validate_double(vals)
    assert out[0] == 1e-10 and out[1] == 1e-5
    assert out[2] == 1.5e-3 and out[3] == 42.0 and out[4] == 0.0


def test_yaml_config_roundtrip(tmp_path):
    """S1 (Settings.java:248-376): input.yml -> EngineConfig -> dict."""
    import yaml

    from ahrd_ray.config import DEFAULT_CONFIG, config_to_dict, load_yaml_config

    doc = config_to_dict(DEFAULT_CONFIG)
    doc["input_dir"] = "/root/testdata/sf0.001"
    p = tmp_path / "input.yml"
    p.write_text(yaml.safe_dump(doc, sort_keys=False), encoding="utf-8")
    cfg, raw = load_yaml_config(str(p))
    assert cfg == DEFAULT_CONFIG
    assert raw["input_dir"] == "/root/testdata/sf0.001"


def test_yaml_config_weight_validation(tmp_path):
    """Weights must sum to 1 +- 0.001 (TokenScoreCalculator.java:192-199)."""
    p = tmp_path / "bad.yml"
    p.write_text(
        "token_score_bit_score_weight: 0.9\n"
        "token_score_database_score_weight: 0.3\n"
        "token_score_overlap_score_weight: 0.2\n",
        encoding="utf-8",
    )
    from ahrd_ray.config import load_yaml_config

    with pytest.raises(ValueError, match="sum to 1"):
        load_yaml_config(str(p))


def test_yaml_config_unknown_source_key(tmp_path):
    p = tmp_path / "bad2.yml"
    p.write_text("sources:\n  wide:\n    wieght: 100\n", encoding="utf-8")
    from ahrd_ray.config import load_yaml_config

    with pytest.raises(ValueError, match="unknown keys"):
        load_yaml_config(str(p))


def test_langid_batch_matches_scalar_loop():
    from ahrd_ray.stages.textstats import _LANG_PROFILES, langid_score

    def ref(text: str) -> str:
        low = text.lower()
        best, best_score = "en", -1.0
        for lang in sorted(_LANG_PROFILES):
            score = 0.0
            for i, gram in enumerate(_LANG_PROFILES[lang]):
                score += low.count(gram) * (2.0 if " " in gram else 1.0) / (i + 1.0)
            if score > best_score:
                best, best_score = lang, score
        return best

    for t in ["the cat sat on the mat", "la casa de papel", "", "und das Haus"]:
        assert langid_score(t) == ref(t)


def _stress_catalog(n_cands: int, vocab: int, toks_per_cand: int):
    """Synthetic CatalogArrays with a large vocabulary (sparse-kernel
    stress: memory must not scale with vocab size)."""
    from ahrd_ray.functions.scoring import CatalogArrays

    rng = np.random.RandomState(11)
    offsets = np.arange(n_cands + 1, dtype=np.int64) * toks_per_cand
    codes = rng.randint(0, vocab, n_cands * toks_per_cand).astype(np.int32)
    # make token sets per cand distinct-ish but with some shared classes
    codes[: toks_per_cand * (n_cands // 4)] = np.tile(
        codes[:toks_per_cand], n_cands // 4
    )
    return CatalogArrays(
        cand_id=np.asarray([f"wide|P{i}|B" for i in range(n_cands)], dtype=object),
        cand_short=np.asarray([f"P{i}" for i in range(n_cands)], dtype=object),
        source=np.asarray(["wide"] * n_cands, dtype=object),
        description=np.asarray(["d"] * n_cands, dtype=object),
        cand_len=np.full(n_cands, 40, dtype=np.int64),
        token_offsets=offsets,
        token_codes=codes,
        token_names=np.asarray([f"t{i}" for i in range(vocab)], dtype=object),
        valid=np.ones(n_cands, dtype=bool),
    )


def test_slim_kernel_handles_large_vocab():
    """VERDICT round-1 item #5/#10: a 10^5-token vocabulary must not blow
    memory — the kernel is sparse in (doc, class) pairs, not dense in
    (vocab x docs)."""
    import pandas as pd

    from ahrd_ray.config import EngineConfig
    from ahrd_ray.functions.scoring import score_partition_slim

    vocab = 100_000
    n_cands = 400
    cat = _stress_catalog(n_cands, vocab, toks_per_cand=8)
    rng = np.random.RandomState(5)
    n_rows = 5_000
    df = pd.DataFrame(
        {
            "doc_id": rng.randint(0, 200, n_rows).astype(np.int64),
            "cand_ord": rng.randint(0, n_cands, n_rows).astype(np.int64),
            "match_score": rng.randint(30, 200, n_rows).astype(np.float64),
            "ingest_seq": np.arange(n_rows, dtype=np.int64),
            "src_code": np.zeros(n_rows, dtype=np.int8),
            "ov_q": np.round(rng.uniform(0.1, 0.9, n_rows) * 1048576) / 1048576,
            "e_rank": rng.uniform(0, 1, n_rows),
            "lang": ["en"] * n_rows,
        }
    )
    cfg = EngineConfig()
    out = score_partition_slim(df, cat, cfg)
    assert len(out) == df["doc_id"].nunique()
    assert (out["description_score"] >= out["lexical_score"]).all()


def test_self_join_pairs_bucket_cap():
    """Degenerate buckets beyond MAX_BUCKET_DOCS are dropped (logged), small
    buckets pass through untouched."""
    import pandas as pd

    from ahrd_ray.stages.dedup import _self_join_pairs

    df = pd.DataFrame(
        {
            "key": [1] * 5 + [2] * 2,
            "doc_id": list(range(5)) + [10, 11],
        }
    )
    full = _self_join_pairs(["key"], "doc_id", max_bucket=None)(df)
    assert len(full) == 10 + 1  # C(5,2) + C(2,2)
    capped = _self_join_pairs(["key"], "doc_id", max_bucket=3)(df)
    assert len(capped) == 1  # hot bucket dropped, small one kept
    assert set(map(tuple, capped.values.tolist())) == {(10, 11)}


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

if HAVE_HYPOTHESIS:

    @given(st.lists(st.text(max_size=80), max_size=30))
    @settings(max_examples=60, deadline=None)
    def test_polyhash_arr_property(strs):
        from ahrd_ray.functions.hash61 import polyhash_arr

        got = polyhash_arr(strs)
        exp = np.array([ref_hash(s) for s in strs], dtype=np.uint64)
        assert got.shape == exp.shape and (got == exp).all()

    @given(st.binary(max_size=400), st.integers(min_value=1, max_value=24))
    @settings(max_examples=60, deadline=None)
    def test_window_hash_property(data, window):
        from ahrd_ray.functions.hash61 import polyhash_bytes_windows

        arr = np.frombuffer(data, dtype=np.uint8)
        got = polyhash_bytes_windows(arr, window)
        n = max(0, len(arr) - window + 1)
        assert len(got) == n
        for i in (0, n // 2, n - 1) if n else ():
            h = 0
            for b in arr[i : i + window]:
                h = (h * B + int(b)) % M
            assert int(got[i]) == h

    @given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=120))
    @settings(max_examples=60, deadline=None)
    def test_shingle_property(text):
        from ahrd_ray.stages.dedup import shingle_hashes

        words = text.split(" ")
        if len(words) < 3:
            grams = [" ".join(words)]
        else:
            grams = [" ".join(words[i : i + 3]) for i in range(len(words) - 2)]
        exp = np.unique(np.array([ref_hash(g) for g in grams], dtype=np.uint64))
        got = shingle_hashes(text, 3)
        assert got.shape == exp.shape and (got == exp).all()
