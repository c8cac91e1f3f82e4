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


@pytest.mark.usefixtures("ray_session")
def test_pq_topk_recall_and_exactness():
    """PQ codes round-trip: brute-force ADC over the full corpus equals
    the pipeline's distributed result; PQ top-1 recall vs exact cosine
    stays useful (the compression is lossy by design, the ORDERING
    machinery is what must be exact)."""
    import numpy as np
    import pandas as pd

    from ahrd_ray.stages.simsearch import (
        EMB_QUANT,
        PQ_M,
        _pq_codebooks,
        _pq_encode,
        pq_topk,
        query_matrix,
    )

    sf = "/root/testdata/sf0.001"
    got = (
        pq_topk(sf)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    ids = emb["vec_id"].to_numpy()
    m = np.vstack([np.asarray(v, np.float64) for v in emb["embedding"]])
    units = np.round(np.floor(m * EMB_QUANT + 0.5)).astype(np.int64)
    books = _pq_codebooks(sf)
    codes = _pq_encode(units, books)
    q_ids, q_m = query_matrix(sf)
    q_units = np.round(q_m * EMB_QUANT).astype(np.int64)
    d = units.shape[1] // PQ_M
    qs = q_units.reshape(len(q_ids), PQ_M, d)
    lut = (
        (qs * qs).sum(axis=2)[:, :, None]
        - 2 * np.einsum("nmd,mkd->nmk", qs, books)
        + (books * books).sum(axis=2)[None, :, :]
    )
    rows = []
    for j, q in enumerate(q_ids):
        adc = np.zeros(len(ids), dtype=np.int64)
        for mi in range(PQ_M):
            adc += lut[j, mi, codes[:, mi]]
        order = np.lexsort((ids, adc))
        order = order[ids[order] != q][:5]
        for r, i in enumerate(order, 1):
            rows.append((int(q), int(ids[i]), r, int(adc[i])))
    truth = pd.DataFrame(
        rows, columns=["query_id", "neighbor_id", "rank", "adc_units"]
    ).sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, truth[got.columns])
    # sanity: codes use more than one centroid per subspace
    assert all(len(np.unique(codes[:, mi])) > 1 for mi in range(PQ_M))


@pytest.mark.usefixtures("ray_session")
def test_centroid_assign_brute_force():
    """Assignments equal a brute-force numpy replay (grid-quantized
    centroids, trunc division, exact int distances); the classifier is
    non-trivial (predictions use more than one label; a decent fraction
    recovers the true label — prototypes carry signal)."""
    import numpy as np
    import pandas as pd

    from ahrd_ray.stages.simsearch import EMB_QUANT, _truncdiv, centroid_assign

    sf = "/root/testdata/sf0.001"
    got = (
        centroid_assign(sf).to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    m = np.vstack([np.asarray(v, np.float64) for v in emb["embedding"]])
    units = np.floor(m * EMB_QUANT + 0.5).astype(np.int64)
    labels = np.sort(emb["label"].unique())
    cents = np.vstack(
        [
            _truncdiv(
                units[emb["label"].to_numpy() == lab].sum(axis=0),
                np.full(units.shape[1], (emb["label"] == lab).sum(), dtype=np.int64),
            )
            for lab in labels
        ]
    )
    d = ((units[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    best = d.argmin(axis=1)
    truth = pd.DataFrame(
        {
            "vec_id": emb["vec_id"].to_numpy(),
            "pred_label": labels[best].astype(np.int64),
            "dist_units": d[np.arange(len(emb)), best].astype(np.int64),
        }
    ).sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, truth[got.columns])
    assert got["pred_label"].nunique() > 1
    acc = (got["pred_label"].to_numpy() ==
           emb.sort_values("vec_id")["label"].to_numpy()).mean()
    assert acc > 1.5 / len(labels)  # beats chance with margin
