"""Bigram counting semantics (stages/textstats.bigram_counts)."""

import pyarrow as pa
import pytest

from ahrd_ray.stages.textstats import _split_counts


def _bigrams_of(texts):
    batch = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    row, toks = _split_counts(batch)
    adj = row[1:] == row[:-1]
    return list(zip(toks[:-1][adj].tolist(), toks[1:][adj].tolist()))


def test_bigrams_do_not_cross_documents():
    got = _bigrams_of(["x y", "z w"])
    assert ("y", "z") not in got
    assert got == [("x", "y"), ("z", "w")]


def test_bigrams_skip_empty_tokens():
    # the tokenizer splits on punctuation; empties are filtered BEFORE
    # adjacency, matching the oracle's list_filter-then-zip
    got = _bigrams_of(["x,,y"])
    assert got == [("x", "y")]


def test_single_token_doc_yields_none():
    assert _bigrams_of(["x", ""]) == []


@pytest.mark.usefixtures("ray_session")
def test_bigram_counts_end_to_end():
    from ahrd_ray.stages.textstats import bigram_counts

    df = bigram_counts("/root/testdata/sf0.001").to_pandas()
    assert (df["n"] > 0).all()
    assert not df.duplicated(["tok_a", "tok_b"]).any()
    # the word-soup corpus repeats a tiny vocab: the hot bigram count must
    # equal the exact pandas recount on the same corpus
    import pyarrow.parquet as pq

    texts = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["text"]
    )["text"].to_pylist()
    from collections import Counter

    want = Counter()
    for t in texts:
        toks = [x for x in __import__("re").split(r"\s+", t.lower()) if x]
        want.update(zip(toks, toks[1:]))
    got = {(r.tok_a, r.tok_b): r.n for r in df.itertuples()}
    # corpus text is whitespace-separated words only, so the regex tokenizer
    # and the plain split agree here
    assert got == dict(want)


def test_chunk_spans_edges(ray_session, tmp_path):
    """Docs shorter than one chunk, exactly stride-aligned, and empty."""
    import pandas as pd
    import numpy as np

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [
                "a b c",  # 3 tokens -> 1 chunk (n_tokens=3)
                " ".join(f"t{i}" for i in range(48)),  # == stride -> 1 chunk
                " ".join(f"t{i}" for i in range(100)),  # -> chunks at 0,48,96
                "",  # empty -> no chunks
            ],
            "lang": ["en"] * 4,
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)

    from ahrd_ray.stages.textstats import chunk_spans

    got = (
        chunk_spans(str(tmp_path))
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    assert got[got.doc_id == 0].n_tokens.tolist() == [3]
    assert got[got.doc_id == 1].n_tokens.tolist() == [48]
    d2 = got[got.doc_id == 2]
    assert d2.start_tok.tolist() == [0, 48, 96]
    assert d2.n_tokens.tolist() == [64, 52, 4]
    assert d2.first_token.tolist() == ["t0", "t48", "t96"]
    assert d2.last_token.tolist() == ["t63", "t99", "t99"]
    assert (got.doc_id != 3).all()


def test_vocab_ids_contiguous_and_ordered(ray_session, tmp_path):
    """A corpus with many hapax tokens (filtered), count ties across
    different 2-byte prefixes, and multi-count tokens: ids must be the
    exact dense rank by (count desc, token asc)."""
    import pandas as pd
    import numpy as np

    words = []
    # 60 hapax tokens spread over prefixes (dropped by min_count=2)
    words += [f"hapax{i}" for i in range(60)]
    # ties at count 2 across prefixes aa.., ab.., zz..
    for t in ["aardvark", "abacus", "zzyzx", "banana", "bandana"]:
        words += [t, t]
    # high-frequency tokens
    words += ["common"] * 9 + ["shared"] * 9 + ["top"] * 20
    rng = np.random.RandomState(7)
    rng.shuffle(words)
    third = len(words) // 3
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(3, dtype=np.int64),
            "text": [
                " ".join(words[:third]),
                " ".join(words[third : 2 * third]),
                " ".join(words[2 * third :]),
            ],
            "lang": ["en"] * 3,
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)

    from ahrd_ray.stages.textstats import vocab_ids

    got = vocab_ids(str(tmp_path)).to_pandas().sort_values("token_id").reset_index(drop=True)

    flat = pd.Series(words)
    cnt = flat.value_counts()
    kept = cnt[cnt >= 2].reset_index()
    kept.columns = ["token", "n"]
    kept = kept.sort_values(["n", "token"], ascending=[False, True], kind="mergesort")
    want_tokens = kept["token"].tolist()

    assert got["token"].tolist() == want_tokens
    assert got["token_id"].tolist() == list(range(len(want_tokens)))
    assert got["n"].tolist() == kept["n"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_collocations_exact_lift():
    """lift_q20 == exact big-int recount from the raw bigram table, and
    the support filter keeps exactly n >= COLLOC_MIN_N."""
    from collections import Counter

    from ahrd_ray.stages.textstats import COLLOC_MIN_N, bigram_counts, collocations

    bg = bigram_counts("/root/testdata/sf0.001").to_pandas()
    left = Counter()
    right = Counter()
    for r in bg.itertuples():
        left[r.tok_a] += int(r.n)
        right[r.tok_b] += int(r.n)
    n_bg = int(bg["n"].sum())
    want = {
        (r.tok_a, r.tok_b): (n_bg * int(r.n) * (1 << 20))
        // (left[r.tok_a] * right[r.tok_b])
        for r in bg.itertuples()
        if int(r.n) >= COLLOC_MIN_N
    }
    got_df = collocations("/root/testdata/sf0.001").to_pandas()
    got = {(r.tok_a, r.tok_b): int(r.lift_q20) for r in got_df.itertuples()}
    assert got == want
    assert (got_df["n"] >= COLLOC_MIN_N).all()
    assert len(got) > 0


def test_char_stats_exact_values_and_empty_doc_absent():
    """'aaab': n=4, distinct=2, sum_sq=3^2+1=10, top=3; unicode doc counts
    codepoints (not bytes); empty doc emits NO row."""
    import pyarrow as pa

    from ahrd_ray.stages.textstats import char_stats_batch

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(["aaab", "✓✓\n", ""]),
        }
    )
    out = char_stats_batch(t).to_pandas().set_index("doc_id")
    assert list(out.index) == [1, 2]
    assert out.loc[1].tolist() == [4, 2, 10, 3]
    # '✓✓\n' = 3 codepoints, 2 distinct, 2^2+1^2 = 5, top 2
    assert out.loc[2].tolist() == [3, 2, 5, 2]


def test_char_stats_null_text_behaves_like_empty():
    """NULL text emits no row (same as '') instead of crashing the batch
    (ADVICE r3: ''.join(None) / NaN repeat)."""
    import pyarrow as pa

    from ahrd_ray.stages.textstats import char_stats_batch

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": pa.array(["ab", None]),
        }
    )
    out = char_stats_batch(t).to_pandas().set_index("doc_id")
    assert list(out.index) == [1]
    assert out.loc[1].tolist() == [2, 2, 2, 1]


@pytest.mark.usefixtures("ray_session")
def test_split_assign_partitions_corpus_deterministically():
    """Splits cover every doc exactly once, the hash is a pure function of
    doc_id (stable under re-sharding/resume), and per-split token budgets
    match the per-doc tokenizer."""
    import duckdb
    import numpy as np

    from ahrd_ray.stages.textstats import (
        SPLIT_A,
        SPLIT_B,
        SPLIT_P,
        split_assign,
        token_counts,
    )

    sf = "/root/testdata/sf0.001"
    got = split_assign(sf).to_pandas().set_index("split").sort_index()
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{sf}/documents.parquet'"
    ).fetchone()[0]
    assert int(got["n_docs"].sum()) == n_docs

    tc = token_counts(sf).to_pandas()
    doc = tc["doc_id"].to_numpy().astype(np.int64)
    bucket = ((doc % SPLIT_P) * SPLIT_A + SPLIT_B) % 100
    label = np.where(bucket < 80, "train", np.where(bucket < 90, "valid", "test"))
    want = (
        tc.assign(split=label)
        .groupby("split")
        .agg(n_docs=("doc_id", "size"), n_tokens=("n_tokens", "sum"))
        .sort_index()
        .astype("int64")
    )
    assert got[["n_docs", "n_tokens"]].equals(want)


def test_readability_brute_force(ray_session):
    """Arrow re2 readability counts == stdlib-re truth, score recomputed."""
    import re

    import numpy as np
    import pyarrow.parquet as pq

    from ahrd_ray.stages.textstats import readability

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    truth = {}
    for d, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        w = len(re.findall(r"\S+", t))
        s = len(re.findall(r"[.!?]+", t))
        v = len(re.findall(r"[aeiouyAEIOUY]+", t))
        f = 206.835 - 1.015 * (w / max(s, 1)) - 84.6 * (v / max(w, 1))
        truth[int(d)] = (w, s, v, f)

    df = readability("/root/testdata/sf0.001").to_pandas()
    assert len(df) == len(truth)
    for r in df.itertuples():
        w, s, v, f = truth[int(r.doc_id)]
        assert (r.n_words, r.n_sentences, r.n_vowel_groups) == (w, s, v)
        assert np.float64(r.flesch) == np.float64(f), r.doc_id
