"""Span-level dedup, paragraph dedup, and sequence packing semantics
(stages/dedup.substring_spans / paragraph_dedup, textstats.pack_chunks)."""

import numpy as np
import pyarrow as pa
import pytest

from ahrd_ray.functions.hash61 import polyhash_arr
from ahrd_ray.stages.dedup import (
    PARA_WORDS,
    SPAN_GRAM,
    _paragraph_batch,
    positional_shingles,
)


def test_positional_shingles_match_materialized_gram_hashes():
    texts = ["a bb ccc dd", "bb ccc dd e f"]
    rows, pos, g = positional_shingles(texts, 3)
    # every gram hash equals the byte-level hash of the joined gram string
    for r, p, h in zip(rows, pos, g):
        words = texts[r].split(" ")
        gram = " ".join(words[p : p + 3])
        assert int(h) == int(polyhash_arr([gram])[0]), (r, p, gram)
    # positions are 0-based gram starts, per doc
    assert pos[rows == 0].tolist() == [0, 1]
    assert pos[rows == 1].tolist() == [0, 1, 2]


def test_positional_shingles_skip_short_docs():
    rows, pos, g = positional_shingles(["a b", "x y z"], 3)
    assert set(rows.tolist()) == {1}  # doc 0 has no full 3-gram


def test_paragraph_hash_equals_joined_window_hash():
    texts = ["one two three four five", ""]
    batch = pa.table({"doc_id": [7, 8], "text": texts})
    out = _paragraph_batch(batch, 3, 8)
    got = {
        (d, p): s
        for d, p, s in zip(
            out["doc_id"].to_pylist(), out["para_idx"].to_pylist(), out["sh"].to_pylist()
        )
    }
    words = texts[0].split(" ")
    assert got[(7, 0)] == int(polyhash_arr([" ".join(words[0:3])])[0])
    assert got[(7, 1)] == int(polyhash_arr([" ".join(words[3:5])])[0])  # short tail
    assert got[(8, 0)] == int(polyhash_arr([""])[0])  # empty doc = one '' window


@pytest.mark.usefixtures("ray_session")
def test_substring_spans_end_to_end():
    from ahrd_ray.stages.dedup import substring_spans

    df = substring_spans("/root/testdata/sf0.001").to_pandas()
    # a span covers at least one full gram and its gram count matches width
    assert (df["span_end"] - df["span_start"] + 1 >= SPAN_GRAM).all()
    assert (
        df["span_end"] - df["span_start"] + 1 - (SPAN_GRAM - 1) == df["n_grams"]
    ).all()
    # spans within a doc never overlap (maximal islands are disjoint)
    for _, g in df.groupby("doc_id"):
        g = g.sort_values("span_start")
        assert (
            g["span_start"].to_numpy()[1:] > g["span_end"].to_numpy()[:-1] - (SPAN_GRAM - 1)
        ).all()


@pytest.mark.usefixtures("ray_session")
def test_paragraph_dedup_keep_first():
    from ahrd_ray.stages.dedup import paragraph_dedup

    df = paragraph_dedup("/root/testdata/sf0.001").to_pandas()
    import pyarrow.parquet as pq

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    # exact recount: keep iff first occurrence of the window text by (doc, idx)
    seen, want = {}, {}
    for doc_id, text in sorted(zip(docs["doc_id"], docs["text"])):
        words = text.split(" ")
        for k in range(0, len(words), PARA_WORDS):
            key = " ".join(words[k : k + PARA_WORDS])
            idx = k // PARA_WORDS
            want[(doc_id, idx)] = key not in seen
            seen.setdefault(key, (doc_id, idx))
    got = {(r.doc_id, r.para_idx): r.keep for r in df.itertuples()}
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_pack_chunks_is_an_exact_prefix_scan():
    from ahrd_ray.stages.textstats import SEQ_LEN, pack_chunks

    df = pack_chunks("/root/testdata/sf0.001").to_pandas().sort_values("doc_id")
    nt = df["n_tokens"].to_numpy()
    start = df["start_tok"].to_numpy()
    # global exclusive prefix sum in doc_id order, no gaps or overlaps
    assert start[0] == 0
    assert (start[1:] == start[:-1] + nt[:-1]).all()
    assert (df["seq_start"].to_numpy() == start // SEQ_LEN).all()
    assert (df["seq_offset"].to_numpy() == start % SEQ_LEN).all()
    pos = nt > 0
    want_seqs = (start[pos] + nt[pos] - 1) // SEQ_LEN - start[pos] // SEQ_LEN + 1
    assert (df["n_seqs"].to_numpy()[pos] == want_seqs).all()
    assert (df["n_seqs"].to_numpy()[~pos] == 0).all()


@pytest.mark.usefixtures("ray_session")
def test_incremental_dedup_flags_unedited_recrawls():
    import pyarrow.parquet as pq

    from ahrd_ray.stages.dedup import INCR_EDIT_MOD, INCR_ID_OFFSET, incremental_dedup

    sf = "/root/testdata/sf0.001"
    df = incremental_dedup(sf).to_pandas()
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    # old texts are all distinct in the synthetic corpus, so each unedited
    # re-crawl (doc_id % 3 != 0) maps back to exactly its own source page
    first_old = docs.groupby("text")["doc_id"].min()
    keep = docs["doc_id"] % INCR_EDIT_MOD != 0
    want = {
        (d + INCR_ID_OFFSET, int(first_old[t]))
        for d, t in zip(docs["doc_id"][keep], docs["text"][keep])
    }
    assert {(r.doc_id, r.dup_of) for r in df.itertuples()} == want
    assert len(want) > 0


@pytest.mark.usefixtures("ray_session")
def test_paragraph_minhash_pairs_brute_force_verified():
    """Every emitted paragraph pair's jaccard equals the exact shingle-set
    jaccard of the two window texts, is >= the threshold, and the packed
    pid ordering gives (doc_a, para_a) <= (doc_b, para_b) lexicographically."""
    import duckdb

    from ahrd_ray.stages.dedup import (
        PARA_WORDS,
        paragraph_minhash_pairs,
        shingle_explode,
    )

    sf = "/root/testdata/sf0.001"
    got = paragraph_minhash_pairs(sf).to_pandas()
    assert len(got) > 0  # the synthetic corpus has repeated boilerplate
    docs = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{sf}/documents.parquet'"
        ).fetchall()
    )

    def para(doc_id: int, k: int) -> str:
        arr = docs[doc_id].split(" ")
        return " ".join(arr[k * PARA_WORDS : (k + 1) * PARA_WORDS])

    def sh_set(text: str) -> set:
        _rows, sh = shingle_explode(pa.array([text]), 3)
        return set(sh.tolist())

    for r in got.itertuples():
        assert (r.doc_a, r.para_a) < (r.doc_b, r.para_b)
        a = sh_set(para(int(r.doc_a), int(r.para_a)))
        b = sh_set(para(int(r.doc_b), int(r.para_b)))
        want = len(a & b) / len(a | b)
        assert r.jaccard == want and r.jaccard >= 0.5


@pytest.mark.usefixtures("ray_session")
def test_ngram_novelty_brute_force():
    """Novelty counts equal a brute-force first-ownership replay over the
    distinct shingle sets; doc 0 is fully novel, totals conserve."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ahrd_ray.stages.dedup import ngram_novelty, shingle_explode

    sf = "/root/testdata/sf0.001"
    got = (
        ngram_novelty(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    docs = pd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    rows, g = shingle_explode(pa.array(docs["text"]), 3)
    ids = docs["doc_id"].to_numpy()[rows]
    df = pd.DataFrame({"doc_id": ids, "sh": g.astype(np.int64)})
    first = df.groupby("sh")["doc_id"].transform("min")
    truth = (
        pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_ngrams": 1,
                "n_novel": (df["doc_id"] == first).astype(int),
            }
        )
        .groupby("doc_id", as_index=False)
        .sum()
        .astype({"n_ngrams": "int64", "n_novel": "int64"})
    )
    assert int(truth.loc[truth["doc_id"] == 0, "n_novel"].iloc[0]) == int(
        truth.loc[truth["doc_id"] == 0, "n_ngrams"].iloc[0]
    )
    # total novel grams == number of distinct grams corpus-wide
    assert truth["n_novel"].sum() == df["sh"].nunique()
    pd.testing.assert_frame_equal(got, truth[got.columns])
