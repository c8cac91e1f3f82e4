"""Small-file compaction (state/compact): planning, lossless-ness, resume."""

import os

import numpy as np
import pandas as pd
import pytest

from ahrd_ray.state.compact import compact_parquet_dir, plan_groups


def test_plan_groups_greedy_first_fit():
    paths = [f"f{i}" for i in range(5)]
    sizes = [40, 40, 40, 100, 10]
    # name order: f0(40) f1(40) f2(40) f3(100) f4(10), target 100
    got = plan_groups(paths, sizes, target_bytes=100)
    assert got == [["f0", "f1"], ["f2"], ["f3"], ["f4"]]
    # oversized single file still forms its own group
    assert plan_groups(["a"], [999], 10) == [["a"]]
    assert plan_groups([], [], 10) == []


@pytest.mark.usefixtures("ray_session")
def test_compact_lossless_and_resumable(tmp_path):
    import pyarrow.parquet as pq

    src = tmp_path / "raw"
    dst = tmp_path / "compact"
    os.makedirs(src)
    rng = np.random.RandomState(3)
    total = 0
    for i in range(9):
        n = int(rng.randint(10, 50))
        total += n
        pd.DataFrame(
            {"k": np.arange(n, dtype=np.int64) + 1000 * i, "v": rng.rand(n)}
        ).to_parquet(src / f"in-{i}.parquet", index=False)

    m1 = compact_parquet_dir(str(src), str(dst), target_bytes=6000)
    assert m1["files_in"] == 9
    assert m1["files_out"] < 9
    assert m1["rows"] == total
    a = pq.read_table(str(src)).to_pandas().sort_values(["k"]).reset_index(drop=True)
    b = pq.read_table(str(dst)).to_pandas().sort_values(["k"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # second run with outputs present: every group skips (per-group resume)
    m2 = compact_parquet_dir(str(src), str(dst), target_bytes=6000)
    assert m2["skipped"] == m2["files_out"] == m1["files_out"]
    assert m2["rows"] == total


@pytest.mark.usefixtures("ray_session")
def test_jsonl_sink_losslessness_hard_content(tmp_path):
    """JSONL round-trip survives quotes, newlines, unicode and commas in
    text — the content classes that broke the round-2 CSV sink."""
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "lang": ["en", "de", "fr", "en"],
            "text": [
                'say "hi", ok?',
                "line one\nline two\ttabbed",
                "café — naïve 中文",
                "",
            ],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)

    from ahrd_ray.stages.export import jsonl_roundtrip_docs

    got = (
        jsonl_roundtrip_docs(str(tmp_path), scratch=str(tmp_path / "out"))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["doc_id", "lang", "text"]], docs)
