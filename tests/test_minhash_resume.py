"""Partition-granular resume for the minhash near-dup pipeline (VERDICT r4
item 6): the banded-signature scan checkpoints per input shard, a run
killed mid-band recomputes ONLY the unfinished shards, and the
checkpointed output equals the direct pipeline bit-for-bit."""

import os
import shutil

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _norm(ds):
    return (
        ds.to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


def test_cocitation_kill_and_resume(ray_session, tmp_path):
    from ahrd_ray.stages.graph import cocitation_pairs, cocitation_pairs_checkpointed
    from ahrd_ray.state.checkpoint import stage_metrics

    t = pq.read_table(f"{SF}/documents.parquet")
    paths = []
    for k in range(4):
        p = str(tmp_path / f"documents_{k}.parquet")
        pq.write_table(t.slice(k * 125, 125), p)
        paths.append(p)

    root = str(tmp_path / "ckpt")
    got = _norm(cocitation_pairs_checkpointed(SF, root, doc_paths=paths, num_shards=4))
    want = _norm(cocitation_pairs(SF))
    assert got.equals(want) and len(want) > 0

    metrics = stage_metrics(root, "entity_links")
    assert len(metrics) >= 2 and all(m["complete"] for m in metrics)

    stage = os.path.join(root, "stage=entity_links")
    parts = sorted(d for d in os.listdir(stage) if d.startswith("part="))
    shutil.rmtree(os.path.join(stage, parts[0]))
    got2 = _norm(cocitation_pairs_checkpointed(SF, root, doc_paths=paths, num_shards=4))
    assert got2.equals(want)
    assert os.path.isfile(os.path.join(stage, parts[0], "manifest.json"))


def test_minhash_kill_and_resume(ray_session, tmp_path):
    from ahrd_ray.stages.dedup import minhash_lsh_pairs, minhash_lsh_pairs_checkpointed
    from ahrd_ray.state.checkpoint import stage_metrics

    # the 100-TB corpus is many parquet files; one shard = a file group
    t = pq.read_table(f"{SF}/documents.parquet")
    paths = []
    for k in range(4):
        p = str(tmp_path / f"documents_{k}.parquet")
        pq.write_table(t.slice(k * 125, 125), p)
        paths.append(p)

    root = str(tmp_path / "ckpt")
    got = _norm(
        minhash_lsh_pairs_checkpointed(SF, root, doc_paths=paths, num_shards=4)
    )
    want = _norm(minhash_lsh_pairs(SF))
    assert got.equals(want)

    metrics = stage_metrics(root, "minhash_banded")
    # stable (hash-of-path) sharding may leave a shard empty; >= 2 real
    # partitions is what the kill-one-resume scenario needs
    assert len(metrics) >= 2 and all(m["complete"] for m in metrics)
    # every doc contributes N_BANDS banded rows
    from ahrd_ray.stages.dedup import N_BANDS

    assert sum(m["total_rows"] for m in metrics) == 500 * N_BANDS

    # simulate a run killed mid-band: partition 1 lost, the rest finished
    stage = os.path.join(root, "stage=minhash_banded")
    parts = sorted(d for d in os.listdir(stage) if d.startswith("part="))
    lost = os.path.join(stage, parts[1])
    shutil.rmtree(lost)
    mtimes = {
        p: os.path.getmtime(os.path.join(stage, p, "manifest.json"))
        for p in parts
        if p != parts[1]
    }

    got2 = _norm(
        minhash_lsh_pairs_checkpointed(SF, root, doc_paths=paths, num_shards=4)
    )
    assert got2.equals(want)
    # finished shards were NOT recomputed; the lost one was rebuilt
    for p, mt in mtimes.items():
        assert os.path.getmtime(os.path.join(stage, p, "manifest.json")) == mt
    assert os.path.isfile(os.path.join(lost, "manifest.json"))
