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
