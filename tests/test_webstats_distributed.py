"""Distributed host-graph branch == driver branch (VERDICT r4 item 1).

The host analytics (`host_pagerank`, `host_harmonic`) branch on
``host_driver_max()``: dim-sized graphs iterate on driver-collected numpy
state; larger graphs keep the edge table distributed (weighted edge sweeps /
frontier BFS) with only O(|hosts|) driver vectors.  These tests prove the
distributed branch RUNS and produces bit-identical results:

* directly, on a synthetic 500-host link table (>> the test threshold);
* through the public path, with the threshold env-overridden below the
  synthetic corpus's LINK_HOST_MOD=97 hosts so `host_pagerank(sf_dir)` /
  `host_harmonic(sf_dir)` take the distributed branch on real pipeline
  input and must match the driver-branch result.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def synth_links(n_hosts: int = 500) -> pa.Table:
    """Deterministic aggregated host link table: host i links to
    (i*7 + 13*j) % n for j=1..3, weight 1 + (i + j) % 5.  Includes
    dangling targets (hosts with no outlinks) once n is prime-ish."""
    src, dst, w = [], [], []
    for i in range(0, n_hosts, 2):  # odd hosts have NO outlinks (dangling)
        for j in range(1, 4):
            src.append(f"h{i:04d}.example.org")
            dst.append(f"h{(i * 7 + 13 * j) % n_hosts:04d}.example.org")
            w.append(1 + (i + j) % 5)
    return pa.table(
        {
            "src_host": pa.array(src, type=pa.string()),
            "dst_host": pa.array(dst, type=pa.string()),
            "n_links": pa.array(w, type=pa.int64()),
        }
    )


def test_pagerank_branches_agree_synthetic(ray_session):
    import ray.data

    from ahrd_ray.stages import webstats as wb

    t = synth_links(500)
    links = ray.data.from_arrow(t).repartition(8)
    hosts = wb._distinct_hosts(links)
    assert len(hosts) == 500 and list(hosts) == sorted(hosts)

    r_driver = wb._host_pagerank_driver(t.to_pandas(), hosts, iters=5)
    r_dist = wb._host_pagerank_distributed(links, hosts, iters=5)
    np.testing.assert_array_equal(r_driver, r_dist)
    # sanity: dangling hosts (odd ids) hold exactly the teleport mass
    from ahrd_ray.stages.graph import PR_DAMP_DEN, PR_DAMP_NUM, PR_UNIT

    teleport = (PR_DAMP_DEN - PR_DAMP_NUM) * PR_UNIT // PR_DAMP_DEN
    assert (r_dist >= teleport).all()


def test_harmonic_branches_agree_synthetic(ray_session):
    import ray.data

    from ahrd_ray.stages import webstats as wb

    t = synth_links(120)
    links = ray.data.from_arrow(t).repartition(8)
    hosts = wb._distinct_hosts(links)

    # hops=4 is the production default (HC_HOPS)
    u_driver = wb._host_harmonic_driver(t.to_pandas(), hosts, hops=4)
    u_dist = wb._host_harmonic_distributed(links, hosts, hops=4)
    np.testing.assert_array_equal(u_driver, u_dist)
    assert u_driver.sum() > 0  # the fixture graph is actually connected


def test_public_path_takes_distributed_branch(ray_session, monkeypatch):
    """LINK_HOST_MOD(=97) >> threshold(=10): the public entry points run
    the distributed branch on real pipeline input and must match the
    driver branch bit-for-bit."""
    from ahrd_ray.stages import webstats as wb

    baseline_pr = wb.host_pagerank(SF).to_pandas().sort_values("host")
    baseline_hc = wb.host_harmonic(SF, hops=2).to_pandas().sort_values("host")

    monkeypatch.setenv("AHRD_HOST_DRIVER_MAX", "10")
    assert wb.host_driver_max() == 10
    dist_pr = wb.host_pagerank(SF).to_pandas().sort_values("host")
    dist_hc = wb.host_harmonic(SF, hops=2).to_pandas().sort_values("host")

    pd.testing.assert_frame_equal(
        baseline_pr.reset_index(drop=True), dist_pr.reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        baseline_hc.reset_index(drop=True), dist_hc.reset_index(drop=True)
    )


def test_distinct_hosts_empty(ray_session):
    import ray.data

    from ahrd_ray.stages import webstats as wb

    empty = ray.data.from_arrow(synth_links(10).slice(0, 0))
    assert len(wb._distinct_hosts(empty)) == 0


def test_scc_kernel_known_graph(ray_session):
    """Hand-built digraph with two cycles joined by a one-way bridge: the
    peeling assigns exactly the two cycles as components plus singletons."""
    import ray.data

    from ahrd_ray.stages import webstats as wb

    # a->b->c->a (cycle), c->d (bridge), d->e->f->d (cycle), g isolated-ish
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
             ("d", "e"), ("e", "f"), ("f", "d"), ("g", "a")]
    t = pa.table(
        {
            "src_host": pa.array([s for s, _ in edges]),
            "dst_host": pa.array([d for _, d in edges]),
            "n_links": pa.array([1] * len(edges), type=pa.int64()),
        }
    )
    hosts = wb._distinct_hosts(ray.data.from_arrow(t))
    scc = wb._scc_driver(t.to_pandas(), hosts)
    root_of = {h: hosts[r] for h, r in zip(hosts, scc)}
    assert root_of["a"] == root_of["b"] == root_of["c"] == "a"
    assert root_of["d"] == root_of["e"] == root_of["f"] == "d"
    assert root_of["g"] == "g"
    # distributed branch: bit-identical on the same table
    scc_dist = wb._scc_distributed(ray.data.from_arrow(t), hosts)
    np.testing.assert_array_equal(scc, scc_dist)


def test_scc_public_path_distributed_matches(ray_session, monkeypatch):
    from ahrd_ray.stages import webstats as wb

    base = wb.host_scc(SF).to_pandas().sort_values("host").reset_index(drop=True)
    monkeypatch.setenv("AHRD_HOST_DRIVER_MAX", "10")
    dist = wb.host_scc(SF).to_pandas().sort_values("host").reset_index(drop=True)
    pd.testing.assert_frame_equal(base, dist)
    # the quadratic-residue fold produces one giant SCC + singletons
    assert base["scc_size"].max() > 1
    assert (base["scc_size"] == 1).any()
