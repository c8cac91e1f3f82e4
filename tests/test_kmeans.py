"""Deterministic grid k-means (stages/simsearch.kmeans_embeddings)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from ahrd_ray.stages.simsearch import (
    EMB_QUANT,
    KMEANS_ITERS,
    KMEANS_K,
    _truncdiv,
    quantize_vec,
)

SF = "/root/testdata/sf0.001"


def test_truncdiv_matches_sql_semantics():
    a = np.array([-7, 7, -8, 8, 0, -1], dtype=np.int64)
    b = np.array([2, 2, 4, 4, 3, 3], dtype=np.int64)
    assert _truncdiv(a, b).tolist() == [-3, 3, -2, 2, 0, 0]


def _reference_kmeans(ids, m, k=KMEANS_K, iters=KMEANS_ITERS):
    """Single-process Lloyd on the same grid rules."""
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    units = np.floor(m * EMB_QUANT + 0.5).astype(np.int64)
    cent_u = units[ids < k][np.argsort(ids[ids < k])].copy()
    for it in range(iters):
        cent = cent_u / EMB_QUANT
        d = ((m[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        cl = d.argmin(axis=1)
        if it == iters - 1:
            return dict(zip(ids.tolist(), cl.tolist()))
        for c in range(k):
            sel = cl == c
            if sel.any():
                cent_u[c] = _truncdiv(
                    units[sel].sum(axis=0), np.int64(sel.sum())
                )
    raise AssertionError


@pytest.mark.usefixtures("ray_session")
def test_kmeans_matches_single_process_reference():
    from ahrd_ray.stages.simsearch import kmeans_embeddings

    got = kmeans_embeddings(SF).to_pandas()
    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    m = quantize_vec(
        t["embedding"].combine_chunks().flatten().to_numpy().reshape(len(ids), -1)
    )
    want = _reference_kmeans(ids, m)
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[r.vec_id] == r.cluster
    # every cluster id in range, all k seeds assigned to themselves-ish sane
    assert got.cluster.between(0, KMEANS_K - 1).all()
