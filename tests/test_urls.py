"""URL canonicalization + URL-keyed dedup (stages/urls.py)."""

import pyarrow as pa
import ray.data

from pdfextract_ray.stages.urls import (canonical_url, canonicalize_batch,
                                        url_dedup)


def test_canonical_url_normalizations():
    assert canonical_url("HTTP://WWW.Example.COM:80/A/b/") \
        == "http://example.com/A/b"
    assert canonical_url("https://example.com:443/x") \
        == "https://example.com/x"
    assert canonical_url("https://example.com:8443/x") \
        == "https://example.com:8443/x"          # non-default port kept
    assert canonical_url("http://example.com") == "http://example.com/"
    assert canonical_url("http://example.com/a#frag") \
        == "http://example.com/a"
    # path case is preserved (paths are case-sensitive), host is not
    assert canonical_url("http://EXAMPLE.com/CaseSensitive") \
        == "http://example.com/CaseSensitive"


def test_canonical_url_query_handling():
    assert canonical_url("http://e.com/p?b=2&a=1") == "http://e.com/p?a=1&b=2"
    assert canonical_url(
        "http://e.com/p?utm_source=tw&id=5&fbclid=xyz&UTM_campaign=c") \
        == "http://e.com/p?id=5"
    # blank values survive; non-tracking order-only differences collapse
    assert canonical_url("http://e.com/p?a=&z=1") \
        == canonical_url("http://e.com/p?z=1&a=")


def test_canonical_url_edge_cases_total_and_idempotent():
    cases = ["", "   ", "not a url", "relative/path?x=1",
             "http://user:pw@Host.com:80/a/",
             "http://www.co/x",        # www.<tld> — too short to strip
             "https://sub.www.example.com/x",   # www not a prefix label
             "http://e.com/a//b/", "ftp://E.com:21/f",
             "http://[::1]:8080/x", "http://e.com/%7Euser/"]
    for u in cases:
        c = canonical_url(u)
        assert isinstance(c, str)
        assert canonical_url(c) == c, u        # idempotent
    assert canonical_url("not a url") == "not a url"
    assert canonical_url("http://www.co/x") == "http://www.co/x"
    assert canonical_url("http://user:pw@Host.com:80/a/") \
        == "http://user:pw@host.com/a"


def test_canonicalize_batch_appends_column():
    t = pa.table({"url": ["http://A.com/", "bad url"]})
    out = canonicalize_batch(t)
    assert out["canonical_url"].to_pylist() == ["http://a.com/", "bad url"]


def test_url_dedup_keeps_min_id_per_canonical_key(ray_session):
    rows = [
        (1, "http://www.example.com/article?utm_source=a"),
        (2, "HTTP://example.com:80/article"),          # same page as 1
        (3, "http://example.com/article?page=2"),      # different page
        (4, "http://other.org/x/"),
        (5, "http://other.org/x"),                     # same as 4
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "url": pa.array([r[1] for r in rows], pa.string())}))
    out = url_dedup(ds).to_pandas().sort_values("doc_id")
    assert out.keep.tolist() == [True, False, True, True, False]
    # canonical keys actually collide where expected
    assert out.canonical_url.iloc[0] == out.canonical_url.iloc[1]
    assert out.canonical_url.iloc[3] == out.canonical_url.iloc[4]


def test_cli_dedup_urls(ray_session, tmp_path):
    import glob
    import os

    import pyarrow.parquet as pq

    from pdfextract_ray.__main__ import main

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "url": ["http://www.site.com/p?utm_source=x",
                "http://site.com/p", "http://site.com/q"],
    })
    src = str(tmp_path / "docs.parquet")
    pq.write_table(tbl, src)
    out = str(tmp_path / "keys")
    assert main(["dedup-urls", src, "--out", out]) == 0
    t = pq.read_table(glob.glob(os.path.join(out, "*.parquet"))) \
        .sort_by("doc_id")
    assert t.column("keep").to_pylist() == [True, False, True]


def test_url_dedup_filter_broadcast_and_antijoin_paths(ray_session):
    """Both drop-removal paths (broadcast pc.is_in and the left_anti
    fallback, forced via max_broadcast=0) keep the same rows: the
    lexicographic-min url per canonical key, payload intact."""
    t = pa.table({
        "url": ["http://a.com/x", "http://A.com/x/",
                "http://a.com/y", "http://www.a.com/x?utm_source=s"],
        "html": ["<p>1</p>", "<p>2</p>", "<p>3</p>", "<p>4</p>"],
    })
    docs = ray.data.from_arrow(t)
    from pdfextract_ray.stages.urls import url_dedup_filter
    kept_b = url_dedup_filter(docs).to_pandas().sort_values("url")
    kept_j = url_dedup_filter(docs, max_broadcast=0).to_pandas() \
        .sort_values("url")
    # canonical key http://a.com/x has three variants; min original
    # url "http://A.com/x/" survives (uppercase < lowercase in ASCII)
    assert kept_b.url.tolist() == ["http://A.com/x/", "http://a.com/y"]
    assert kept_b.url.tolist() == kept_j.url.tolist()
    assert kept_b.html.tolist() == kept_j.html.tolist()


def test_url_dedup_filter_no_dups_is_identity(ray_session):
    t = pa.table({"url": ["http://a.com/1", "http://a.com/2"],
                  "html": ["x", "y"]})
    docs = ray.data.from_arrow(t)
    from pdfextract_ray.stages.urls import url_dedup_filter
    out = url_dedup_filter(docs).to_pandas()
    assert len(out) == 2


def test_canonical_url_fuzz_total_idempotent():
    """Property: canonical_url never raises and is idempotent on
    arbitrary URL-shaped garbage (the dedup key must be total — a
    crawler's url field contains anything)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    frag = st.text(
        alphabet="abcXYZ019.:/?#[]@!$&'()*+,;=%~ \té中-_",
        max_size=12)
    urlish = st.builds(
        lambda scheme, host, rest: scheme + host + rest,
        st.sampled_from(["", "http://", "HTTPS://", "ftp://", "//",
                         "mailto:", "http:", "https://user:pw@"]),
        frag, frag)

    @settings(max_examples=300, deadline=None)
    @given(urlish)
    def prop(u):
        c = canonical_url(u)
        assert isinstance(c, str)
        assert canonical_url(c) == c

    prop()


def test_urlless_rows_never_dedup_against_each_other(ray_session):
    """Null/empty/unparseable urls canonicalize to "" — those rows
    share NOTHING and must all be kept by both the id-keyed dedup and
    the value-keyed filter (review finding: they previously collapsed
    into one "" group, and None urls crashed the filter's sorted())."""
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "url": pa.array([None, None, "", "http://a.com/x",
                         "http://a.com/x/"], pa.string()),
        "html": ["a", "b", "c", "d", "e"],
    })
    docs = ray.data.from_arrow(t)
    out = url_dedup(docs.select_columns(["doc_id", "url"])) \
        .to_pandas().sort_values("doc_id")
    assert out.keep.tolist() == [True, True, True, True, False]
    from pdfextract_ray.stages.urls import url_dedup_filter
    kept = url_dedup_filter(docs).to_pandas()
    assert sorted(kept.doc_id) == [1, 2, 3, 4]   # only the variant drops


def test_identical_raw_urls_are_filter_contract_boundary(ray_session):
    """Byte-identical raw urls: the value-keyed filter keeps both (its
    documented boundary — downstream exact dedup removes them), while
    the id-keyed url_dedup collapses them."""
    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "url": ["http://a.com/x", "http://a.com/x"],
        "html": ["same", "same"],
    })
    docs = ray.data.from_arrow(t)
    from pdfextract_ray.stages.urls import url_dedup_filter
    assert len(url_dedup_filter(docs).to_pandas()) == 2
    out = url_dedup(docs.select_columns(["doc_id", "url"])).to_pandas()
    assert sorted(out.keep.tolist()) == [False, True]
