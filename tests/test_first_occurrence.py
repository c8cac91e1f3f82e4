"""Byte->char-corrected first-occurrence kernel vs scalar str.find truth.

VERDICT r3 item #3: the round-3 kernel fell back to a per-pair Python loop
whenever a batch contained ONE non-ASCII doc.  The kernel now runs
unconditionally with a vectorized continuation-byte correction; this pins it
bit-exact against str.find (1-based, 0 = not found) on mixed
ASCII / CJK / emoji / combining-char haystacks, including sliced arrays.
"""

import numpy as np
import pyarrow as pa

from ahrd_ray.stages.candidates import MentionDetector

DOCS = [
    "plain ascii text with token here",
    "préfix accenté token voilà",
    "日本語のテキスト token 終わり",
    "emoji 🎉🎊 before token and 🚀 after",
    "no match at all in this one",
    "token at start",
    "ends with token",
    "ααα βββ token γγγ",
    "mixed 中文 and ascii token 结束",
    "a🎉token",  # 4-byte emoji directly before the needle
]
TOKENS = ["token", "texte", "終わり", "中文", "🚀"]


def _truth(docs, p_row, p_tid, toks):
    return np.asarray(
        [docs[r].find(toks[t]) + 1 for r, t in zip(p_row, p_tid)], dtype=np.int64
    )


def _all_pairs(n_docs, n_toks):
    p_row = np.repeat(np.arange(n_docs), n_toks)
    p_tid = np.tile(np.arange(n_toks), n_docs)
    return p_row, p_tid


def test_mixed_ascii_cjk_emoji():
    p_row, p_tid = _all_pairs(len(DOCS), len(TOKENS))
    low = pa.array(DOCS, type=pa.string())
    got = MentionDetector._first_occurrence(low, p_row, p_tid, TOKENS)
    np.testing.assert_array_equal(got, _truth(DOCS, p_row, p_tid, TOKENS))


def test_pure_ascii_branch():
    docs = [d for d in DOCS if d.isascii()]
    p_row, p_tid = _all_pairs(len(docs), len(TOKENS))
    low = pa.array(docs, type=pa.string())
    got = MentionDetector._first_occurrence(low, p_row, p_tid, TOKENS)
    np.testing.assert_array_equal(got, _truth(docs, p_row, p_tid, TOKENS))


def test_sliced_and_large_string_arrays():
    # array offset != 0 exercises the buffer-window arithmetic
    p_row, p_tid = _all_pairs(len(DOCS) - 2, len(TOKENS))
    sliced = pa.array(["pad 🎉 row"] * 2 + DOCS[2:], type=pa.string()).slice(2)
    got = MentionDetector._first_occurrence(sliced, p_row, p_tid, TOKENS)
    np.testing.assert_array_equal(got, _truth(DOCS[2:], p_row, p_tid, TOKENS))

    p_row, p_tid = _all_pairs(len(DOCS), len(TOKENS))
    large = pa.array(DOCS, type=pa.large_string())
    got = MentionDetector._first_occurrence(large, p_row, p_tid, TOKENS)
    np.testing.assert_array_equal(got, _truth(DOCS, p_row, p_tid, TOKENS))


def test_chunked_input():
    p_row, p_tid = _all_pairs(len(DOCS), len(TOKENS))
    chunked = pa.chunked_array(
        [pa.array(DOCS[:4], type=pa.string()), pa.array(DOCS[4:], type=pa.string())]
    )
    got = MentionDetector._first_occurrence(chunked, p_row, p_tid, TOKENS)
    np.testing.assert_array_equal(got, _truth(DOCS, p_row, p_tid, TOKENS))
