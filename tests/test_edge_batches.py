"""Regression tests for empty-block / hostile-payload edge cases.

Over-parallelized reads legitimately emit zero-row blocks at small scales,
and real web text contains the exotic line separators ``str.splitlines``
splits on — every partial / serializer must survive both.
"""

import numpy as np
import pandas as pd
import pyarrow as pa

from ahrd_ray.sources.formats import DOC_SCHEMA
from ahrd_ray.stages.export import _split_json_lines
from ahrd_ray.stages.webstats import extract_anchor_targets


def _pages_batch(htmls: list[bytes]) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array(range(len(htmls)), type=pa.int64()),
            "html": pa.array(htmls, type=pa.binary()),
        }
    )


def test_anchor_targets_drop_pages_without_anchors():
    with_anchor = b'<a rel="o1" href="https://h0.example.org/p/7">x</a>'
    none = b"<html><body>no links here</body></html>"
    t = extract_anchor_targets(_pages_batch([with_anchor, none]))
    assert t.dtype == np.int64
    assert t.tolist() == [7]


def test_anchor_targets_empty_batch():
    t = extract_anchor_targets(_pages_batch([]))
    assert t.size == 0


def test_split_json_lines_exotic_separators():
    df = pd.DataFrame({"k": [1, 2], "s": ["a b", "c\x85d\x0b\x0c "]})
    payload = df.to_json(orient="records", lines=True, force_ascii=False)
    lines = _split_json_lines(payload)
    assert len(lines) == 2  # splitlines() would shear these records
    import json

    assert [json.loads(ln)["s"] for ln in lines] == list(df["s"])


def test_doc_schema_empty_table_types():
    t = DOC_SCHEMA.empty_table()
    assert t.schema.field("doc_id").type == pa.int64()
    assert t.schema.field("n_chars").type == pa.int64()
    assert t.schema.field("text").type == pa.string()
