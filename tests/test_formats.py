"""JSONL / CSV source roundtrips (sources/formats)."""

import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_jsonl_documents_roundtrip():
    from ahrd_ray.sources.formats import read_documents_jsonl

    got = read_documents_jsonl(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    want = want[got.columns.tolist()].sort_values("doc_id").reset_index(drop=True)
    assert got.equals(want)


@pytest.mark.usefixtures("ray_session")
def test_csv_events_roundtrip_typed():
    from ahrd_ray.sources.formats import EVENT_SCHEMA, read_events_csv

    ds = read_events_csv(SF)
    got = ds.to_pandas().sort_values("event_id").reset_index(drop=True)
    want = pq.read_table(f"{SF}/events.parquet").to_pandas()
    want = want[list(EVENT_SCHEMA)].sort_values("event_id").reset_index(drop=True)
    # doubles and timestamps must survive the text roundtrip bit-exact
    assert got.equals(want)
