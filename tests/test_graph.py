"""Co-occurrence edge building + integer-unit PageRank (stages/graph)."""

import numpy as np
import pytest

from ahrd_ray.stages.graph import PR_UNIT, _pairs_within_docs, _segment_sums

SF = "/root/testdata/sf0.001"


def _ref_pairs(doc, cand):
    from collections import defaultdict
    from itertools import combinations

    by_doc = defaultdict(list)
    for d, c in zip(doc, cand):
        by_doc[d].append(c)
    out = []
    for d in by_doc:
        out += [tuple(sorted(p)) for p in combinations(sorted(by_doc[d]), 2)]
    return sorted(out)


def test_pairs_within_docs_matches_itertools():
    rng = np.random.default_rng(7)
    doc = rng.integers(0, 40, size=500)
    # distinct cand per (doc) as post-dedup guarantees: build via unique rows
    cand = rng.integers(0, 60, size=500)
    uniq = {(d, c) for d, c in zip(doc, cand)}
    doc = np.array([d for d, _ in uniq], dtype=np.int64)
    cand = np.array([c for _, c in uniq], dtype=np.int64)
    a, b = _pairs_within_docs(doc, cand)
    got = sorted(zip(a.tolist(), b.tolist()))
    assert got == _ref_pairs(doc, cand)
    assert (a < b).all()


def test_pairs_within_docs_degenerate():
    e = np.empty(0, dtype=np.int64)
    a, b = _pairs_within_docs(e, e)
    assert len(a) == 0
    # singleton docs produce no pairs
    a, b = _pairs_within_docs(np.array([1, 2, 3]), np.array([9, 8, 7]))
    assert len(a) == 0


def test_segment_sums_exact_int64():
    dst = np.array([3, 1, 3, 1, 3], dtype=np.int64)
    c = np.array([2**52, 5, 2**52, 7, 1], dtype=np.int64)
    nodes, totals = _segment_sums(dst, c)
    assert nodes.tolist() == [1, 3]
    assert totals.tolist() == [12, 2**53 + 1]
    assert totals.dtype == np.int64


@pytest.mark.usefixtures("ray_session")
def test_pagerank_mass_and_determinism():
    from ahrd_ray.stages.graph import cooccurrence_edges, pagerank

    t = pagerank(SF)
    ranks = t["rank_units"].to_numpy()
    nodes = t["node"].to_numpy()
    assert len(nodes) == len(set(nodes.tolist()))
    # teleport floor: every in-graph node keeps at least the 0.15*U term
    assert (ranks >= (15 * PR_UNIT) // 100).all()
    # integer mass is conserved up to floor-division loss: total <= N * U
    assert ranks.sum() <= len(ranks) * PR_UNIT
    # deterministic across runs (integer arithmetic, order-independent sums)
    t2 = pagerank(SF)
    assert t.sort_by("node").equals(t2.sort_by("node"))
    # edge list is canonical: a < b, positive weights
    e = cooccurrence_edges(SF).to_pandas()
    assert (e.cand_a < e.cand_b).all()
    assert (e.n_docs > 0).all()


def test_fact_support_invariants():
    """Provenance aggregate: mentions >= supporting docs, ts range is the
    doc_id range in seconds from the page epoch (sources/synth.py:221)."""
    import pandas as pd

    from ahrd_ray.stages.graph import fact_support

    df = fact_support(SF).to_pandas()
    assert len(df) > 0
    assert (df["n_mentions"] >= df["n_docs"]).all()
    assert (df["n_docs"] >= 1).all()
    epoch = pd.Timestamp("2025-01-01")
    assert (df["first_seen"] >= epoch).all()
    assert (df["last_seen"] >= df["first_seen"]).all()


def test_entity_resolve_vote_is_group_max():
    """The canonical member carries the maximum support among its group
    (re-derived independently from the deduped candidate stream)."""
    import pandas as pd

    from ahrd_ray.stages.graph import entity_resolve, fact_support

    win = entity_resolve(SF).to_pandas()
    assert len(win) > 0
    assert win["cand_short"].is_unique
    assert (win["n_entities"] >= 1).all()
    assert (win["total_links"] >= win["n_entities"]).all()
    # every group's winner support must be >= any member's links-weighted
    # minimum; spot-check internal consistency: support_units > 0
    assert (win["support_units"] > 0).all()


def test_triangle_count_matches_bruteforce():
    """Degree-ordered wedge enumeration == brute-force set-intersection
    count on the sf0.001 co-occurrence graph."""
    from collections import defaultdict

    from ahrd_ray.stages.graph import cooccurrence_edges, triangle_count

    edges = cooccurrence_edges(SF).to_pandas()
    adj = defaultdict(set)
    for a, b in zip(edges["cand_a"], edges["cand_b"]):
        adj[a].add(b)  # a < b by construction
    adj = dict(adj)
    empty: set = set()
    brute = sum(
        len(adj[a] & adj.get(b, empty)) for a in adj for b in adj[a]
    )  # for each edge (a,b), common higher neighbors c -> (a<b<c) once
    got = triangle_count(SF).to_pandas()
    assert int(got["n_triangles"].iloc[0]) == brute


def test_lev_le1_unit():
    from ahrd_ray.stages.graph import _lev_le1

    assert _lev_le1("abc", "abc") == 0
    assert _lev_le1("abc", "abd") == 1  # substitution
    assert _lev_le1("abc", "ab") == 1  # deletion
    assert _lev_le1("abc", "xabc") == 1  # insertion (front)
    assert _lev_le1("abc", "abcd") == 1  # insertion (back)
    assert _lev_le1("abc", "adc ") == 2
    assert _lev_le1("abc", "xbd") == 2
    assert _lev_le1("abc", "acb") == 2  # transposition is distance 2


def test_alias_pairs_matches_bruteforce():
    """Deletion-variant blocking + verify == brute-force O(n^2) distance
    scan over the sf0.001 catalog ids."""
    import ray as _ray

    from ahrd_ray.pipelines import kg
    from ahrd_ray.stages.graph import _lev_le1, alias_pairs

    ids = kg.cached_context(SF).bundle.arrays.cand_id
    brute = {
        (i, j)
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if _lev_le1(ids[i], ids[j]) <= 1
    }
    got = alias_pairs(SF).to_pandas()
    assert set(zip(got["cand_a"], got["cand_b"])) == brute


def test_link_pred_matches_bruteforce():
    """kNN-graph common-neighbor/Jaccard prediction == brute force on the
    sf0.001 co-occurrence graph (cap, symmetrize, wedge, anti-join, q20)."""
    from collections import defaultdict

    from ahrd_ray.stages.graph import (
        LINKPRED_NEIGHBOR_CAP,
        LINKPRED_TOP_N,
        cooccurrence_edges,
        link_pred,
    )

    edges = cooccurrence_edges(SF).to_pandas()
    nbrs = defaultdict(list)
    for a, b, w in zip(edges["cand_a"], edges["cand_b"], edges["n_docs"]):
        nbrs[a].append((-w, b))
        nbrs[b].append((-w, a))
    knn = set()
    for node, lst in nbrs.items():
        for _, nb in sorted(lst)[:LINKPRED_NEIGHBOR_CAP]:
            knn.add((min(node, nb), max(node, nb)))
    adj = defaultdict(set)
    for a, b in knn:
        adj[a].add(b)
        adj[b].add(a)
    rows = []
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            if (a, b) in knn:
                continue
            cn = len(adj[a] & adj[b])
            if cn:
                q20 = (cn * (1 << 20)) // (len(adj[a]) + len(adj[b]) - cn)
                rows.append((q20, cn, -a, -b))
    rows.sort(reverse=True)
    want = [(-na, -nb, cn, q) for q, cn, na, nb in rows[:LINKPRED_TOP_N]]
    got = link_pred(SF).to_pandas()
    got_rows = list(
        zip(got["cand_a"], got["cand_b"], got["common_n"], got["jaccard_q20"])
    )
    assert got_rows == want
    assert len(got_rows) > 0  # non-trivial at test scale by design


def test_clustering_coeff_matches_bruteforce():
    """Per-node triangle counts + q20 coefficient == brute force on the
    sf0.001 kNN graph; values must be non-trivially varied."""
    from collections import defaultdict

    from ahrd_ray.stages.graph import (
        LINKPRED_NEIGHBOR_CAP,
        clustering_coeff,
        cooccurrence_edges,
    )

    edges = cooccurrence_edges(SF).to_pandas()
    nbrs = defaultdict(list)
    for a, b, w in zip(edges["cand_a"], edges["cand_b"], edges["n_docs"]):
        nbrs[a].append((-w, b))
        nbrs[b].append((-w, a))
    knn = set()
    for node, lst in nbrs.items():
        for _, nb in sorted(lst)[:LINKPRED_NEIGHBOR_CAP]:
            knn.add((min(node, nb), max(node, nb)))
    adj = defaultdict(set)
    for a, b in knn:
        adj[a].add(b)
        adj[b].add(a)
    want = {}
    for v, ns in adj.items():
        if len(ns) < 2:
            continue
        sn = sorted(ns)
        t = sum(
            1
            for i, x in enumerate(sn)
            for y in sn[i + 1 :]
            if (min(x, y), max(x, y)) in knn
        )
        want[v] = (t, (2 * t * (1 << 20)) // (len(ns) * (len(ns) - 1)))
    got = clustering_coeff(SF).to_pandas()
    got_map = {
        int(r.node): (int(r.n_triangles), int(r.cc_q20)) for r in got.itertuples()
    }
    assert got_map == want
    ccs = {v for _, v in want.values()}
    assert len(ccs) > 1  # informative, not clique-saturated


def test_annotation_closure_invariants():
    """Every doc keeps its nation node and gains exactly its region when
    doc_id % 7 == 0 docs already carried it — propagation is a superset of
    the assignment and the two-level closure adds one region per doc."""
    from ahrd_ray.stages.taxonomy import annotation_closure, doc_nodes

    assigned = doc_nodes(SF).to_pandas()
    closed = annotation_closure(SF).to_pandas()
    a_set = set(zip(assigned["doc_id"], assigned["node_id"]))
    c_set = set(zip(closed["doc_id"], closed["node_id"]))
    assert a_set <= c_set
    # two-level DAG: closure = assignment + the nation's region per doc
    import pandas as pd

    per_doc = closed.groupby("doc_id")["node_id"].apply(set)
    for doc_id, nodes in per_doc.items():
        regions = {n for n in nodes if n.startswith("R")}
        nations = {n for n in nodes if n.startswith("N")}
        assert len(nations) == 1 and len(regions) == 1


def test_edge_timespan_consistent_with_edges():
    """with_span=True returns the same pair set + counts as the plain edge
    list, with sane first/last observation docs."""
    from ahrd_ray.stages.graph import cooccurrence_edges

    plain = cooccurrence_edges(SF).to_pandas()
    span = cooccurrence_edges(SF, with_span=True).to_pandas()
    key = ["cand_a", "cand_b"]
    p = plain.sort_values(key).reset_index(drop=True)
    s = span.sort_values(key).reset_index(drop=True)
    assert (p[key + ["n_docs"]].values == s[key + ["n_docs"]].values).all()
    assert (s["first_doc"] <= s["last_doc"]).all()
    one = s[s["n_docs"] == 1]
    assert (one["first_doc"] == one["last_doc"]).all()


def test_neg_samples_matches_bruteforce():
    """Hash-corrupted tails == pure-python recount; every kept row is a
    true negative."""
    from ahrd_ray.pipelines import kg
    from ahrd_ray.stages.graph import (
        NEG_PER_POS,
        _NEG_C1,
        _NEG_C2,
        _NEG_C3,
        cooccurrence_edges,
        neg_samples,
    )

    edges = cooccurrence_edges(SF).to_pandas()
    n_nodes = kg.cached_context(SF).bundle.n
    edge_set = set(zip(edges["cand_a"], edges["cand_b"]))
    want = set()
    for a, b in edge_set:
        for j in range(NEG_PER_POS):
            h = (int(a) * _NEG_C1 + int(b) * _NEG_C2 + (j + 1) * _NEG_C3) % (1 << 64)
            neg = h % n_nodes
            if neg in (a, b):
                continue
            if (min(a, neg), max(a, neg)) in edge_set:
                continue
            want.add((a, b, j, neg))
    got_df = neg_samples(SF).to_pandas()
    got = set(
        zip(got_df["cand_a"], got_df["pos_b"], got_df["j"], got_df["neg_b"])
    )
    assert got == want
    assert len(got) > 0


def test_evidence_snippets_cover_mention():
    """Each snippet embeds its mention span verbatim, is bounded by the
    context window, and there is at most one row per doc."""
    import pyarrow.parquet as pq

    from ahrd_ray.stages.graph import EVIDENCE_CTX, evidence_snippets

    got = evidence_snippets(SF).to_pandas()
    texts = dict(
        zip(
            *(
                pq.read_table(
                    f"{SF}/documents.parquet", columns=["doc_id", "text"]
                )
                .to_pandas()[c]
                for c in ("doc_id", "text")
            )
        )
    )
    assert not got["doc_id"].duplicated().any()
    assert len(got) > 0
    for r in got.itertuples():
        text = texts[r.doc_id]
        mention = text[r.span_start - 1 : r.span_end - 1]
        assert mention and mention in r.snippet
        assert len(r.snippet) <= (r.span_end - r.span_start) + 2 * EVIDENCE_CTX
        want = text[
            max(0, r.span_start - 1 - EVIDENCE_CTX) : r.span_end - 1 + EVIDENCE_CTX
        ]
        assert r.snippet == want


@pytest.mark.usefixtures("ray_session")
def test_cocitation_matches_bruteforce():
    """Doc co-citation pairs == brute-force projection of the capped link
    stream (the oracle's ccands relation), threshold applied."""
    from collections import defaultdict
    from itertools import combinations

    from ahrd_ray.stages.graph import (
        COCITE_MIN_SHARED,
        cocitation_pairs,
        doc_entity_links,
    )

    links = doc_entity_links(SF).to_pandas()
    ents_by_doc = defaultdict(set)
    for d, c in zip(links["doc_id"], links["cand_ord"]):
        ents_by_doc[int(d)].add(int(c))
    expected = {}
    docs = sorted(ents_by_doc)
    inv = defaultdict(set)
    for d, es in ents_by_doc.items():
        for e in es:
            inv[e].add(d)
    counts = defaultdict(int)
    for e, ds in inv.items():
        for a, b in combinations(sorted(ds), 2):
            counts[(a, b)] += 1
    expected = {p: n for p, n in counts.items() if n >= COCITE_MIN_SHARED}

    got = cocitation_pairs(SF).to_pandas()
    got_map = {
        (int(a), int(b)): int(n)
        for a, b, n in zip(got["doc_a"], got["doc_b"], got["n_shared"])
    }
    assert got_map == expected
    assert (got["doc_a"] < got["doc_b"]).all()


@pytest.mark.usefixtures("ray_session")
def test_kcore_is_fixpoint_and_matches_bruteforce():
    """kg_kcore == driver brute-force peel of the co-citation graph; every
    survivor's in-core degree >= k (the fixpoint property)."""
    from ahrd_ray.stages.graph import KCORE_K, cocitation_pairs, kcore_nodes

    pairs = cocitation_pairs(SF).to_pandas()
    a = pairs["doc_a"].to_numpy()
    b = pairs["doc_b"].to_numpy()
    n = int(max(a.max(), b.max())) + 1
    alive = np.zeros(n, dtype=bool)
    alive[a] = True
    alive[b] = True
    while True:
        deg = np.zeros(n, dtype=np.int64)
        m = alive[a] & alive[b]
        np.add.at(deg, a[m], 1)
        np.add.at(deg, b[m], 1)
        new = alive & (deg >= KCORE_K)
        if (new == alive).all():
            break
        alive = new

    got = kcore_nodes(SF).to_pandas().sort_values("node").reset_index(drop=True)
    assert got["node"].tolist() == np.flatnonzero(alive).tolist()
    assert got.set_index("node")["core_deg"].to_dict() == {
        int(v): int(deg[v]) for v in np.flatnonzero(alive)
    }
    assert (got["core_deg"] >= KCORE_K).all()
    assert len(got) > 0  # the chosen k leaves a non-empty core at sf0.001


@pytest.mark.usefixtures("ray_session")
def test_attr_vote_matches_bruteforce():
    """Neighbor-vote predictions == brute-force majority over the kNN
    graph; predicted nodes are exactly the unlabeled nodes with >= 1
    labeled neighbor."""
    from collections import Counter, defaultdict

    from ahrd_ray.pipelines import kg
    from ahrd_ray.stages.graph import attr_vote, knn_edges

    ctx = kg.cached_context(SF)
    shorts = ctx.bundle.arrays.cand_short
    amap = {
        int(o): sorted(ctx.attrs[s])
        for o, s in enumerate(shorts)
        if s in ctx.attrs and ctx.attrs[s]
    }
    edges = knn_edges(SF).to_pandas()
    nbrs = defaultdict(set)
    for a, b in zip(edges["cand_a"], edges["cand_b"]):
        nbrs[int(a)].add(int(b))
        nbrs[int(b)].add(int(a))
    expected = {}
    for u, vs in nbrs.items():
        if u in amap:
            continue
        c = Counter()
        for v in vs:
            for attr in amap.get(v, ()):
                c[attr] += 1
        if c:
            best = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            expected[u] = best
    got = attr_vote(SF).to_pandas()
    got_map = {
        int(n): (a, int(v))
        for n, a, v in zip(got["node"], got["pred_attr"], got["votes"])
    }
    assert got_map == expected
    assert len(got_map) > 0


@pytest.mark.usefixtures("ray_session")
def test_ppr_mass_concentrates_on_seeds():
    """Seeded PageRank: every positive-rank node is graph-connected; seed
    nodes hold strictly more total rank than equally-sized non-seed sets
    (teleport restricted to seeds), and non-seed rank comes only from
    propagation."""
    from ahrd_ray.stages.graph import PPR_SEED_MOD, personalized_pagerank

    t = personalized_pagerank(SF)
    nodes = np.asarray(t["node"])
    ranks = np.asarray(t["rank_units"])
    seeds = nodes % PPR_SEED_MOD == 0
    assert seeds.any() and (~seeds).any()
    assert ranks[seeds].mean() > ranks[~seeds].mean()
    assert (ranks >= 0).all()


@pytest.mark.usefixtures("ray_session")
def test_bfs_reach_depth_cap_and_min_dist_on_path_graph():
    """bounded_bfs on a 7-node path 0-1-2-3-4-5-6 seeded at {0}: dists are
    the hop counts, capped at depth 3 (nodes 4..6 unreachable within the
    bound; 4 would be dist 4)."""
    import pandas as pd
    import ray.data
    import pyarrow as pa

    from ahrd_ray.stages.graph import bounded_bfs

    a = np.arange(6, dtype=np.int64)
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(np.concatenate([a, a + 1]), type=pa.int64()),
                "dst": pa.array(np.concatenate([a + 1, a]), type=pa.int64()),
            }
        )
    ).map_batches(lambda df: df, batch_format="pandas")
    out = (
        bounded_bfs(edges, np.array([0], dtype=np.int64), depth=3)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert out["node"].tolist() == [0, 1, 2, 3]
    assert out["dist"].tolist() == [0, 1, 2, 3]


@pytest.mark.usefixtures("ray_session")
def test_bfs_reach_multi_seed_min_and_early_exit():
    """Two seeds on the same path: every node takes the NEAREST seed's
    distance (min fold); a disconnected node never appears.  depth larger
    than the eccentricity exercises the drained-frontier early exit."""
    import pyarrow as pa
    import ray.data

    from ahrd_ray.stages.graph import bounded_bfs

    a = np.arange(4, dtype=np.int64)  # path 0-1-2-3-4, plus isolated 9
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(np.concatenate([a, a + 1]), type=pa.int64()),
                "dst": pa.array(np.concatenate([a + 1, a]), type=pa.int64()),
            }
        )
    ).map_batches(lambda df: df, batch_format="pandas")
    out = (
        bounded_bfs(edges, np.array([0, 4], dtype=np.int64), depth=3)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert out["node"].tolist() == [0, 1, 2, 3, 4]
    # node 2 is 2 hops from both seeds; 1 and 3 are 1 hop from the nearer
    assert out["dist"].tolist() == [0, 1, 2, 1, 0]


@pytest.mark.usefixtures("ray_session")
def test_bfs_reach_matches_duckdb_oracle_at_sf0001():
    import duckdb
    import pandas as pd

    from ahrd_ray.config import DEFAULT_CONFIG
    from ahrd_ray.pipelines.oracle import sql_bfs_reach
    from ahrd_ray.stages.graph import bfs_reach

    got = bfs_reach(SF).to_pandas().sort_values("node").reset_index(drop=True)
    con = duckdb.connect()
    for t in ["documents", "part", "orders", "lineitem"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    want = (
        con.execute(sql_bfs_reach(DEFAULT_CONFIG))
        .df()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(
        got[want.columns].astype("int64"), want.astype("int64")
    )


@pytest.mark.usefixtures("ray_session")
def test_degree_hist_bins_partition_the_degree_table():
    """Histogram counts must equal a brute-force bin of entity_degree,
    with power-of-two bin edges (frexp binning, incl. exact 2^k edges)."""
    from ahrd_ray.stages.graph import degree_hist, entity_degree

    deg = entity_degree(SF).to_pandas()
    hist = degree_hist(SF).to_pandas().set_index("bin_lo")["n_nodes"]
    d = deg["degree"].to_numpy()
    want = {}
    for v in d:
        lo = 1 << (int(v).bit_length() - 1)
        want[lo] = want.get(lo, 0) + 1
    assert hist.to_dict() == want
    assert hist.sum() == len(deg)


@pytest.mark.usefixtures("ray_session")
def test_mention_coverage_invariants_and_oracle():
    """Union coverage is bounded by the doc length, every doc appears
    exactly once, and the dual-chain DuckDB islands fold agrees exactly."""
    import duckdb
    import pandas as pd

    from ahrd_ray.config import DEFAULT_CONFIG
    from ahrd_ray.pipelines.oracle import sql_mention_coverage
    from ahrd_ray.stages.graph import mention_coverage

    got = (
        mention_coverage(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got["doc_id"].is_unique and len(got) == 500
    assert (got["covered_chars"] <= got["n_chars"]).all()
    assert (got["covered_chars"] >= 0).all()
    # docs with mentions must cover at least one char per span-island
    m = got["n_spans"] > 0
    assert (got.loc[m, "covered_chars"] > 0).all()
    con = duckdb.connect()
    for t in ["documents", "part", "orders", "lineitem"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    want = (
        con.execute(sql_mention_coverage(DEFAULT_CONFIG))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[want.columns].astype("int64"), want.astype("int64")
    )


@pytest.mark.usefixtures("ray_session")
def test_pmi_edges_lift_invariants():
    """lift = (n_ab*N)/(n_a*n_b) over the capped co-occurrence universe:
    marginals bound the joint (n_ab <= min(n_a, n_b)), every edge keeps
    cand_a < cand_b, and recomputing the division from the emitted integer
    columns reproduces the emitted double bit-exactly."""
    import duckdb

    from ahrd_ray.stages.graph import pmi_edges

    df = pmi_edges(SF).to_pandas()
    assert len(df) > 0
    assert (df.cand_a < df.cand_b).all()
    assert (df.n_docs <= np.minimum(df.n_a, df.n_b)).all()
    assert (df.n_a > 0).all() and (df.n_b > 0).all()
    n_total = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/documents.parquet'"
    ).fetchone()[0]
    recomputed = (df.n_docs.to_numpy() * np.int64(n_total)).astype(
        np.float64
    ) / (df.n_a.to_numpy() * df.n_b.to_numpy())
    assert (recomputed == df.lift.to_numpy()).all()


@pytest.mark.usefixtures("ray_session")
def test_edge_support_sums_to_three_times_triangles():
    """Every triangle contributes one support unit to each of its three
    edges, so sum(support) == 3 * n_triangles; support-0 edges survive the
    fold (they are the weak-tie signal the operator exists for)."""
    from ahrd_ray.stages.graph import edge_support, triangle_count

    sup = edge_support(SF).to_pandas()
    tri = int(triangle_count(SF).to_pandas()["n_triangles"].iloc[0])
    assert (sup.cand_a < sup.cand_b).all()
    assert int(sup.support.sum()) == 3 * tri
    assert (sup.support >= 0).all() and (sup.n_docs >= 1).all()


@pytest.mark.usefixtures("ray_session")
def test_walk_corpus_steps_follow_edges_deterministically():
    """Every walk has steps+1 rows per start; each hop lands on a graph
    neighbor of the previous node; re-deriving the hash-ranked choice from
    a locally-built adjacency reproduces the walk bit-exactly."""
    from ahrd_ray.stages.graph import (
        WALK_A,
        WALK_B,
        WALK_STEPS,
        cooccurrence_edges,
        walk_corpus,
    )

    w = walk_corpus(SF).to_pandas()
    e = cooccurrence_edges(SF).to_pandas()
    nbrs: dict = {}
    for a, b in zip(e.cand_a, e.cand_b):
        nbrs.setdefault(int(a), []).append(int(b))
        nbrs.setdefault(int(b), []).append(int(a))
    nbrs = {u: sorted(vs) for u, vs in nbrs.items()}

    per_start = w.groupby("start").size()
    assert (per_start == WALK_STEPS + 1).all()
    assert set(per_start.index) == set(nbrs)

    w = w.sort_values(["start", "step"]).reset_index(drop=True)
    for start, grp in w.groupby("start"):
        node = int(start)
        for t, row in enumerate(grp.itertuples()):
            assert row.step == t
            if t == 0:
                assert row.node == start
            else:
                ns = nbrs[node]
                want = ns[(int(start) * WALK_A + t * WALK_B + node) % len(ns)]
                assert row.node == want
            node = int(row.node)


@pytest.mark.usefixtures("ray_session")
def test_walk_pairs_match_brute_force_window():
    """Skip-gram pairs equal the brute-force window expansion of the walk
    corpus: for every walk, each ordered pair within WALK_WINDOW positions,
    counted across walks."""
    from collections import Counter

    from ahrd_ray.stages.graph import WALK_WINDOW, walk_corpus, walk_pairs

    walks = walk_corpus(SF).to_pandas().sort_values(["start", "step"])
    want: Counter = Counter()
    for _, grp in walks.groupby("start"):
        seq = grp["node"].tolist()
        for i in range(len(seq)):
            for j in range(len(seq)):
                if i != j and abs(i - j) <= WALK_WINDOW:
                    want[(seq[i], seq[j])] += 1
    got = walk_pairs(SF).to_pandas()
    got_map = {
        (int(r.center), int(r.context)): int(r.cnt) for r in got.itertuples()
    }
    assert got_map == dict(want)


@pytest.mark.usefixtures("ray_session")
def test_hits_matches_brute_force_bipartite_round():
    """hits_scores == the numpy brute force over the same capped link
    relation: a1 = per-entity link counts, h1 = per-doc sum(a1) // HITS_DIV,
    auth = per-entity sum(h1)."""
    from ahrd_ray.stages.graph import HITS_DIV, doc_entity_links, hits_scores

    links = doc_entity_links(SF).to_pandas()[["doc_id", "cand_ord"]]
    a1 = links.groupby("cand_ord").size().astype(np.int64)
    links["a"] = a1.reindex(links["cand_ord"]).to_numpy()
    h1 = (links.groupby("doc_id")["a"].sum() // HITS_DIV).astype(np.int64)
    links["h"] = h1.reindex(links["doc_id"]).to_numpy()
    want = (
        links.groupby("cand_ord")
        .agg(link_docs=("a", "size"), auth_units=("h", "sum"))
        .reset_index()
        .rename(columns={"cand_ord": "node"})
        .astype({"node": "int64", "link_docs": "int64", "auth_units": "int64"})
        .sort_values("node")
        .reset_index(drop=True)
    )
    got = (
        hits_scores(SF)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)[["node", "link_docs", "auth_units"]]
    )
    assert got.equals(want)
    # authority re-ranks vs raw counts: both columns positive, and the
    # scaling division keeps magnitudes bounded
    assert (got.link_docs > 0).all() and (got.auth_units >= 0).all()


@pytest.mark.usefixtures("ray_session")
def test_ra_scores_match_brute_force_and_exclude_edges():
    """ra_scores == brute-force Resource-Allocation over the symmetrized
    kNN edge set: for each non-adjacent pair, sum over shared neighbors z
    of RA_UNIT // deg(z); top-N under the documented deterministic order."""
    from collections import defaultdict

    from ahrd_ray.stages.graph import (
        LINKPRED_TOP_N,
        RA_UNIT,
        knn_edges,
        ra_scores,
    )

    knn = knn_edges(SF).to_pandas()
    nbrs: dict[int, set[int]] = defaultdict(set)
    for r in knn.itertuples():
        nbrs[int(r.cand_a)].add(int(r.cand_b))
        nbrs[int(r.cand_b)].add(int(r.cand_a))
    deg = {v: len(s) for v, s in nbrs.items()}
    edge_set = {(int(r.cand_a), int(r.cand_b)) for r in knn.itertuples()}
    scores: dict[tuple[int, int], list[int]] = {}
    for z, s in nbrs.items():
        ss = sorted(s)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                p = (ss[i], ss[j])
                if p in edge_set:
                    continue
                cn, ra = scores.get(p, (0, 0))
                scores[p] = (cn + 1, ra + RA_UNIT // deg[z])
    rows = [
        (-ra, -cn, a, b, cn, ra) for (a, b), (cn, ra) in scores.items()
    ]
    rows.sort()
    want = [(a, b, cn, ra) for _, _, a, b, cn, ra in rows[:LINKPRED_TOP_N]]
    got = ra_scores(SF).to_pandas()
    got_rows = [
        (int(r.cand_a), int(r.cand_b), int(r.common_n), int(r.ra_units))
        for r in got.itertuples()
    ]
    assert got_rows == want
    assert all((a, b) not in edge_set for a, b, _, _ in got_rows)


@pytest.mark.usefixtures("ray_session")
def test_cooc_window_is_a_strict_discriminating_subset():
    """Windowed edges are a strict subset of the full co-occurrence edge
    set (same capped universe, extra proximity predicate), every emitted
    min_gap respects the window, and per-pair n_docs never exceeds the
    unwindowed doc count."""
    from ahrd_ray.stages.graph import (
        COOC_WINDOW,
        cooc_window_edges,
        cooccurrence_edges,
    )

    w = cooc_window_edges(SF).to_pandas()
    full = cooccurrence_edges(SF).to_pandas()
    assert 0 < len(w) < len(full)  # the predicate demonstrably filters
    assert (w["min_gap"] <= COOC_WINDOW).all() and (w["min_gap"] >= 0).all()
    m = w.merge(full, on=["cand_a", "cand_b"], how="left")
    assert m["n_docs_y"].notna().all()  # subset
    assert (m["n_docs_x"] <= m["n_docs_y"]).all()


@pytest.mark.usefixtures("ray_session")
def test_assortativity_brute_force():
    """Sufficient-statistics strength assortativity == a pandas recompute
    straight from the edge list (numpy float64, same fixed-order ops)."""
    import pandas as pd

    from ahrd_ray.stages.graph import assortativity, cooccurrence_edges

    edges = cooccurrence_edges(SF).to_pandas()
    both = pd.concat(
        [
            edges.rename(columns={"cand_a": "a", "cand_b": "b"}),
            edges.rename(columns={"cand_a": "b", "cand_b": "a"}),
        ]
    )
    strength = both.groupby("a")["n_docs"].sum()
    dx = strength.reindex(both["a"]).to_numpy(dtype=np.int64)
    dy = strength.reindex(both["b"]).to_numpy(dtype=np.int64)
    m = len(both)
    sx, sxx, sxy = int(dx.sum()), int((dx * dx).sum()), int((dx * dy).sum())
    want = float(m * sxy - sx * sx) / float(m * sxx - sx * sx)

    row = assortativity(SF).to_pandas().iloc[0]
    assert int(row["m"]) == m and int(row["sx"]) == sx
    assert int(row["sxx"]) == sxx and int(row["sxy"]) == sxy
    assert row["assortativity"] == want
    assert -1.0 <= row["assortativity"] <= 1.0


@pytest.mark.usefixtures("ray_session")
def test_edge_growth_reconciles_with_timespan():
    """Decile growth buckets == a pandas recompute from the with_span
    edge list, and bucket counts sum to the edge count."""
    import pyarrow.parquet as pq

    from ahrd_ray.stages.graph import GROWTH_BUCKETS, cooccurrence_edges, edge_growth

    edges = cooccurrence_edges(SF, with_span=True).to_pandas()
    mx = int(
        pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])["doc_id"]
        .to_numpy()
        .max()
    )
    want = (
        (edges["first_doc"].to_numpy() * GROWTH_BUCKETS) // (mx + 1)
    )
    import collections

    truth = collections.Counter(want.tolist())
    got = edge_growth(SF).to_pandas()
    assert {int(r.bucket): int(r.n_edges) for r in got.itertuples()} == dict(truth)
    assert int(got["n_edges"].sum()) == len(edges)


@pytest.mark.usefixtures("ray_session")
def test_entity_cards_reconcile_with_components():
    """Each card field == the standalone component query's value for the
    same entity (the composition adds no drift), ids resolve."""
    from ahrd_ray.stages.graph import entity_cards, entity_degree, fact_support

    cards = entity_cards(SF).to_pandas().set_index("cand_ord").sort_index()
    fs = fact_support(SF).to_pandas().set_index("cand_ord").sort_index()
    deg = entity_degree(SF).to_pandas().set_index("node").sort_index()

    assert (cards["support_docs"] == fs["n_docs"]).all()
    assert (cards["n_mentions"] == fs["n_mentions"]).all()
    common = cards.index.intersection(deg.index)
    assert (cards.loc[common, "degree"] == deg.loc[common, "degree"]).all()
    assert (cards.loc[common, "w_docs"] == deg.loc[common, "w_docs"]).all()
    assert cards["cand_id"].notna().all()
    # best neighbor's identity resolves through the same catalog
    nb = cards.dropna(subset=["best_neighbor"])
    assert nb["best_neighbor_id"].notna().all()
