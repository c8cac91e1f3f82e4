"""URL canonicalization + crawl-log dedup (webstats)."""

import pyarrow as pa

from ahrd_ray.stages.webstats import canonical_url_of, normalize_urls, raw_url_of

SF = "/root/testdata/sf0.001"


def test_normalizer_rules():
    cases = {
        # host/scheme case + default port
        "HTTPS://Example.COM:443/a": "https://example.com/a",
        "http://X.y:80/": "http://x.y/",
        # non-default port kept
        "http://x.y:8080/a/": "http://x.y:8080/a",
        # tracking params dropped, order of the rest preserved
        "https://h/p?fbclid=1&b=2&utm_x=3&a=4": "https://h/p?b=2&a=4",
        # all params dropped -> no '?'
        "https://h/p?utm_source=x&gclid=9": "https://h/p",
        # fragment stripped; missing path -> '/'
        "https://h#frag": "https://h/",
        # root trailing slash kept (root IS '/')
        "https://h/?utm_a=1": "https://h/",
    }
    got = normalize_urls(pa.array(list(cases))).to_pylist()
    assert got == list(cases.values())


def test_variants_normalize_to_canonical():
    raws, want = [], []
    for d in range(50):
        for v in range(1 + d % 3):
            raws.append(raw_url_of(d, "en", v))
            want.append(canonical_url_of(d, "en"))
    assert normalize_urls(pa.array(raws)).to_pylist() == want


def test_url_dedup_counts(ray_session):
    from ahrd_ray.stages.webstats import url_dedup

    df = url_dedup(SF).to_pandas()
    # one row per page; fetch count = 1 + doc_id % 3
    assert len(df) == 500
    assert int(df["n_fetches"].sum()) == sum(1 + d % 3 for d in range(500))
    # earliest fetch is variant 0 == the page's own warc_ts (no v*1h offset;
    # doc_id-second offsets stay below one hour at this sf)
    assert df["first_ts"].dt.hour.eq(0).all()


def test_host_links_brute_force(ray_session):
    """Engine regex extraction over real html bytes == re.findall truth."""
    import re
    from collections import Counter

    from ahrd_ray.functions.textx import synthesize_html
    from ahrd_ray.sources import spec
    from ahrd_ray.stages.webstats import host_links

    # brute force: parse every page's anchors with the stdlib regex engine
    want: Counter = Counter()
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"])
    for d, t, l in zip(*(docs[c].to_pylist() for c in ("doc_id", "text", "lang"))):
        html = synthesize_html(int(d), t, l).decode("utf-8")
        (src,) = re.findall(r'rel="canonical" href="https://([^/"]+)/', html)
        for dst in re.findall(r'<a rel="o\d+" href="https://([^/"]+)/', html):
            want[(src, dst)] += 1

    df = host_links(SF).to_pandas()
    got = {(r.src_host, r.dst_host): int(r.n_links) for r in df.itertuples()}
    assert got == dict(want)
    # every page contributes exactly LINK_K links
    assert sum(got.values()) == len(docs) * spec.LINK_K


def test_html_link_structure_outside_article():
    """Outlinks must not perturb the byte-identical text invariant."""
    from ahrd_ray.functions.textx import extract_text, synthesize_html

    text = 'a <b>bold</b> claim & "quotes" é中'
    assert extract_text(synthesize_html(42, text, "en")) == text


def test_host_pagerank_properties(ray_session):
    """Mass conservation + dominance sanity on the integer power iteration."""
    import numpy as np

    from ahrd_ray.stages.graph import PR_UNIT
    from ahrd_ray.stages.webstats import host_links, host_pagerank

    df = host_pagerank(SF).to_pandas()
    links = host_links(SF).to_pandas()
    hosts = set(links["src_host"]) | set(links["dst_host"])
    assert set(df["host"]) == hosts
    # teleport floor: every host keeps at least the (1-d) mass
    assert (df["rank_units"] >= (100 - 85) * PR_UNIT // 100).all()
    # total mass stays within the unit budget (floor-div losses only shrink)
    assert df["rank_units"].sum() <= len(hosts) * PR_UNIT
    # the most-linked-to host outranks the median host
    indeg = links.groupby("dst_host")["n_links"].sum()
    top = indeg.idxmax()
    r = df.set_index("host")["rank_units"]
    assert r[top] > np.median(r.to_numpy())


def test_host_quality_recount(ray_session):
    """Host aggregation == brute-force per-doc quality regrouped by host."""
    import numpy as np
    import pyarrow.parquet as pq

    from ahrd_ray.config import QUANT
    from ahrd_ray.sources import spec
    from ahrd_ray.stages.textstats import quality_scores
    from ahrd_ray.stages.webstats import host_quality

    per_doc = quality_scores(SF).to_pandas()
    per_doc["host"] = [spec.link_host(int(d)) for d in per_doc["doc_id"]]
    per_doc["u"] = np.floor(per_doc["quality"].to_numpy() * QUANT + 0.5).astype(
        np.int64
    )
    want = per_doc.groupby("host").agg(n_docs=("u", "size"), u=("u", "sum"))

    got = host_quality(SF).to_pandas().set_index("host").sort_index()
    want = want.sort_index()
    assert (got["n_docs"].to_numpy() == want["n_docs"].to_numpy()).all()
    assert np.array_equal(
        got["sum_quality"].to_numpy(), want["u"].to_numpy() / QUANT
    )
    assert int(got["n_docs"].sum()) == len(
        pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    )


def test_host_harmonic_brute_force(ray_session):
    """Matrix-power distances == per-source python BFS, unit arithmetic."""
    from collections import deque

    from ahrd_ray.stages.webstats import HC_HOPS, HC_UNIT, host_harmonic, host_links

    links = host_links(SF).to_pandas()
    adj: dict = {}
    for r in links.itertuples():
        adj.setdefault(r.src_host, set()).add(r.dst_host)
    hosts = sorted(set(links["src_host"]) | set(links["dst_host"]))

    want = {h: 0 for h in hosts}
    for src in hosts:
        dist = {src: 0}
        q = deque([src])
        while q:
            u = q.popleft()
            if dist[u] >= HC_HOPS:
                continue
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        for v, d in dist.items():
            if v != src:
                want[v] += HC_UNIT // d

    got = host_harmonic(SF).to_pandas()
    assert {r.host: int(r.harmonic_units) for r in got.itertuples()} == want


def test_page_inlinks_brute_force(ray_session):
    """Engine anchor-target parse + distributed count == stdlib-regex truth."""
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    from ahrd_ray.functions.textx import synthesize_html
    from ahrd_ray.stages.webstats import page_inlinks

    want: Counter = Counter()
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"])
    for d, t, l in zip(*(docs[c].to_pylist() for c in ("doc_id", "text", "lang"))):
        html = synthesize_html(int(d), t, l).decode("utf-8")
        for tgt in re.findall(r'<a rel="o\d+" href="https://[^/"]+/p/(\d+)"', html):
            want[int(tgt)] += 1

    df = page_inlinks(SF).to_pandas()
    got = {int(r.page_id): int(r.n_inlinks) for r in df.itertuples()}
    assert got == dict(want)


def test_redirect_resolve_brute_force(ray_session):
    """Pointer-doubling resolution == a per-doc Python walk over
    spec.redirect_target, hop cap and dangling/absent stops included."""
    import pyarrow.parquet as pq

    from ahrd_ray.sources import spec
    from ahrd_ray.stages.webstats import REDIRECT_HOPS, redirect_resolve

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    corpus = set(docs["doc_id"].to_pylist())

    def walk(d: int) -> tuple[int, int]:
        p, h = d, 0
        while h < REDIRECT_HOPS:
            nxt = spec.redirect_target(p)
            if nxt is None or nxt not in corpus:
                break
            p, h = nxt, h + 1
        return p, h

    df = redirect_resolve(SF).to_pandas()
    assert len(df) == len(corpus)
    for r in df.itertuples():
        assert (int(r.final_id), int(r.hops)) == walk(int(r.doc_id)), r.doc_id
    # the synthetic chain spec exercises every stop class at any sf
    assert (df["hops"] == 0).any() and (df["hops"] == REDIRECT_HOPS).any()
    assert df["hops"].between(1, REDIRECT_HOPS - 1).any()


def test_crawl_schedule_brute_force(ray_session):
    """Map-side partial top-K + host-hash finalize == a pandas recompute
    from the host_pagerank table and the staleness arithmetic."""
    import numpy as np
    import pyarrow.parquet as pq

    from ahrd_ray.sources import spec
    from ahrd_ray.stages.webstats import (
        CRAWL_REF_TS,
        CRAWL_TOP_K,
        crawl_schedule,
        host_pagerank,
    )

    pr = host_pagerank(SF).to_pandas().set_index("host")["rank_units"]
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    ids = docs["doc_id"].to_numpy()
    epoch = np.datetime64("2025-01-01T00:00:00", "us").astype(np.int64)
    age = np.maximum(
        (int(CRAWL_REF_TS.astype(np.int64)) - (epoch + ids * 1_000_000)) // 1_000_000,
        1,
    )
    import pandas as pd

    hosts = pd.Series([f"h{d % spec.LINK_HOST_MOD}.example.org" for d in ids])
    want = (
        pd.DataFrame(
            {
                "host": hosts,
                "doc_id": ids,
                "priority_units": pr.reindex(hosts).to_numpy(np.int64) * age,
            }
        )
        .sort_values(["host", "priority_units", "doc_id"], ascending=[True, False, True])
        .groupby("host", as_index=False)
        .head(CRAWL_TOP_K)
        .reset_index(drop=True)
    )
    got = (
        crawl_schedule(SF)
        .to_pandas()
        .sort_values(["host", "priority_units", "doc_id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_host_dup_rate_consistency(ray_session):
    """Host rollup == a pandas recompute from paragraph_dedup's own flags;
    ratios are the exact dup/window quotients and dups are present."""
    import pandas as pd

    from ahrd_ray.sources import spec
    from ahrd_ray.stages.dedup import paragraph_dedup
    from ahrd_ray.stages.webstats import host_dup_rate

    flags = paragraph_dedup(SF).to_pandas()
    flags["host"] = "h" + (flags["doc_id"] % spec.LINK_HOST_MOD).astype(str) + ".example.org"
    want = flags.groupby("host").agg(
        n_windows=("keep", "size"), n_dups=("keep", lambda k: int((~k).sum()))
    )

    got = host_dup_rate(SF).to_pandas().set_index("host").sort_index()
    want = want.sort_index()
    assert (got["n_windows"] == want["n_windows"]).all()
    assert (got["n_dups"] == want["n_dups"]).all()
    assert (
        got["dup_ratio"]
        == got["n_dups"].to_numpy(float) / got["n_windows"].to_numpy(float)
    ).all()
    assert got["n_dups"].sum() > 0  # fixture genuinely repeats paragraphs


def test_anchor_text_index_brute_force(ray_session):
    """Engine (href target + inner text) parse == stdlib-regex truth."""
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    from ahrd_ray.functions.textx import synthesize_html
    from ahrd_ray.stages.webstats import anchor_text_index

    want: Counter = Counter()
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"])
    for d, t, l in zip(*(docs[c].to_pylist() for c in ("doc_id", "text", "lang"))):
        html = synthesize_html(int(d), t, l).decode("utf-8")
        for tgt, txt in re.findall(
            r'<a rel="o\d+" href="https://[^/"]+/p/(\d+)">([^<]*)</a>', html
        ):
            want[(int(tgt), txt)] += 1

    df = anchor_text_index(SF).to_pandas()
    got = {(int(r.page_id), r.anchor_text): int(r.n) for r in df.itertuples()}
    assert got == dict(want)


def test_sitemap_xml_escaping_and_index(tmp_path):
    """Locs with literal '&' round-trip through XML entity escaping; the
    shard is discovered through the <sitemapindex>, not a directory
    listing; lastmod parses as a W3C datetime."""
    import numpy as np
    import pyarrow as pa

    from ahrd_ray.stages import webstats as wb

    shard = tmp_path / "sitemap-000000000000.xml"
    shard.write_text(
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        "  <url><loc>https://h/p?a=1&amp;b=2</loc>"
        "<lastmod>2025-03-04T05:06:07+00:00</lastmod>"
        "<priority>0.7</priority></url>\n"
        "  <url><loc>https://h/q</loc></url>\n"
        "</urlset>\n"
    )
    idx = tmp_path / "sitemap-index.xml"
    idx.write_text(
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        f"  <sitemap><loc>file://{shard}</loc></sitemap>\n"
        "</sitemapindex>\n"
    )
    assert wb.parse_sitemap_index(str(idx)) == [str(shard)]
    t = wb.parse_sitemap_shard(str(shard))
    assert t["url"].to_pylist() == ["https://h/p?a=1&b=2", "https://h/q"]
    assert t["priority_milli"].to_pylist() == [700, 500]  # 500 = protocol default
    assert t["lastmod"][0].as_py() == np.datetime64("2025-03-04T05:06:07").item()
    assert t["lastmod"][1].as_py() is None or str(t["lastmod"][1]) in ("NaT",)


def test_host_reciprocity_brute_force(ray_session):
    """Per-host neighbor/reciprocal counts equal a brute-force set replay
    over the parsed link table; both one-way and mutual pairs exist."""
    import pandas as pd

    from ahrd_ray.stages import webstats as wb

    sf = "/root/testdata/sf0.001"
    got = (
        wb.host_reciprocity(sf)
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    links = wb.host_links(sf).to_pandas()
    edges = {
        (s, d)
        for s, d in zip(links["src_host"], links["dst_host"])
        if s != d
    }
    rows = []
    for h in sorted({s for s, _ in edges}):
        nbrs = {d for s, d in edges if s == h}
        rec = sum(1 for d in nbrs if (d, h) in edges)
        rows.append((h, len(nbrs), rec))
    truth = pd.DataFrame(rows, columns=["host", "n_neighbors", "n_reciprocal"])
    assert (truth["n_reciprocal"] > 0).any()
    assert (truth["n_reciprocal"] < truth["n_neighbors"]).any()
    pd.testing.assert_frame_equal(
        got, truth.astype({"n_neighbors": "int64", "n_reciprocal": "int64"})
    )
