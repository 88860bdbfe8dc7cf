"""Registrable-domain extraction + per-domain caps (stages/domains.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data
from hypothesis import given, settings
from hypothesis import strategies as st

from pdfextract_ray.stages.domains import (domain_batch, domain_cap,
                                           domain_cap_filter, domain_counts,
                                           registrable_domain)


def test_registrable_domain_basics():
    assert registrable_domain("http://www.example.com/a") == "example.com"
    assert registrable_domain("https://news.bbc.co.uk/x?y=1") == "bbc.co.uk"
    assert registrable_domain("http://a.b.c.example.org/") == "example.org"
    assert registrable_domain("http://foo.blogspot.co.uk/p") \
        == "blogspot.co.uk"
    assert registrable_domain("http://shop.example.com.au/") \
        == "example.com.au"
    # bare hosts (no scheme) parse as hosts, not paths
    assert registrable_domain("example.com") == "example.com"
    assert registrable_domain("deep.sub.example.com/path") == "example.com"
    assert registrable_domain("localhost") == "localhost"
    assert registrable_domain("example.com:8080/x") == "example.com"


def test_registrable_domain_ip_literals_and_garbage():
    assert registrable_domain("http://192.168.1.10/x") == "192.168.1.10"
    assert registrable_domain("http://[::1]:8080/x") == "[::1]"
    assert registrable_domain("") == ""
    assert registrable_domain(None) == ""
    assert registrable_domain("   ") == ""
    # 999.1.2.3 is not an IPv4 literal; label rules apply
    assert registrable_domain("http://999.1.2.3/") == "2.3"


def test_registrable_domain_consecutive_dots_and_whitespace():
    # review-found idempotence breaks: empty labels ("a..b" → ".b")
    # and exotic whitespace urlsplit preserves inside a netloc
    assert registrable_domain("a..b") == "a.b"
    assert registrable_domain("example..com") == "example.com"
    assert registrable_domain("http://a..b/x") == "a.b"
    assert registrable_domain(".b") == "b"
    assert registrable_domain("...") == ""
    assert registrable_domain("0\x0c:") == "0"


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=40))
def test_registrable_domain_total_and_idempotent(u):
    d = registrable_domain(u)
    assert isinstance(d, str)
    assert registrable_domain(d) == d


def test_domain_batch_appends_column():
    t = pa.table({"url": ["http://a.example.com/x", None, "junk::"]})
    out = domain_batch(t)
    assert out["domain"].to_pylist()[0] == "example.com"
    assert out["domain"].to_pylist()[1] == ""


def _corpus():
    # 3 domains with 4/2/1 pages + one url-less row
    rows = [
        (1, "http://a.example.com/1", 0.9),
        (2, "http://example.com/2", 0.5),
        (3, "http://www.example.com/3", 0.7),
        (4, "http://b.example.com/4", 0.7),
        (5, "http://bbc.co.uk/a", 0.1),
        (6, "http://news.bbc.co.uk/b", 0.8),
        (7, "http://solo.org/only", 0.2),
        (8, None, 0.0),
    ]
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "url": pa.array([r[1] for r in rows], pa.string()),
        "quality": pa.array([r[2] for r in rows], pa.float64()),
        "text": pa.array(["t%d" % r[0] for r in rows], pa.string()),
    })


def test_domain_cap_by_id(ray_session):
    ds = ray.data.from_arrow(_corpus())
    out = domain_cap(ds, cap=2).to_pandas().set_index("doc_id")
    # example.com: ids 1,2,3,4 -> keep 1,2; bbc.co.uk: 5,6 -> both;
    # solo.org: 7; url-less id 8 always keeps
    assert out.loc[1, "keep"] and out.loc[2, "keep"]
    assert not out.loc[3, "keep"] and not out.loc[4, "keep"]
    assert out.loc[5, "keep"] and out.loc[6, "keep"]
    assert out.loc[7, "keep"] and out.loc[8, "keep"]
    assert out.loc[1, "domain"] == "example.com"
    assert out.loc[8, "domain"] == ""


def test_domain_cap_by_quality_with_deterministic_ties(ray_session):
    ds = ray.data.from_arrow(_corpus())
    out = domain_cap(ds, cap=2, quality_col="quality") \
        .to_pandas().set_index("doc_id")
    # example.com by quality: 1 (.9), then tie .7 between 3 and 4 ->
    # lower id (3) wins; 2 (.5) and 4 (.7 loser) drop
    assert out.loc[1, "keep"] and out.loc[3, "keep"]
    assert not out.loc[2, "keep"] and not out.loc[4, "keep"]


def test_domain_cap_filter_matches_verdicts(ray_session):
    ds = ray.data.from_arrow(_corpus())
    kept = domain_cap_filter(ds, cap=1, quality_col="quality").to_pandas()
    verd = domain_cap(ds, cap=1, quality_col="quality").to_pandas()
    expect = set(verd.loc[verd["keep"], "doc_id"])
    assert set(kept["doc_id"]) == expect
    # full row payload survives the filter
    assert set(kept.columns) == {"doc_id", "url", "quality", "text"}


def test_domain_cap_filter_forced_join_tier_equal(ray_session):
    ds = ray.data.from_arrow(_corpus())
    broad = domain_cap_filter(ds, cap=1, max_broadcast=2_000_000)
    joined = domain_cap_filter(ds, cap=1, max_broadcast=0)
    assert sorted(broad.to_pandas()["doc_id"]) \
        == sorted(joined.to_pandas()["doc_id"])


def test_domain_cap_brute_force_parity(ray_session):
    # random corpus vs a plain-pandas reference implementation
    rng = np.random.RandomState(7)
    n = 400
    hosts = ["x%d.example.com" % (i % 9) for i in range(6)] + \
        ["a.co.uk", "b.co.uk", "solo.net"]
    urls = ["http://%s/p%d" % (hosts[rng.randint(len(hosts))], i)
            for i in range(n)]
    q = np.round(rng.rand(n), 3)
    t = pa.table({"doc_id": pa.array(np.arange(n), pa.int64()),
                  "url": pa.array(urls, pa.string()),
                  "quality": pa.array(q, pa.float64())})
    got = domain_cap(ray.data.from_arrow(t), cap=3,
                     quality_col="quality").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    df = pd.DataFrame({"doc_id": np.arange(n),
                       "domain": [registrable_domain(u) for u in urls],
                       "q": q})
    df = df.sort_values(["domain", "q", "doc_id"],
                        ascending=[True, False, True], kind="mergesort")
    expect_keep = (df.groupby("domain", sort=False).cumcount() < 3) \
        | (df["domain"] == "")
    expect = df.assign(keep=expect_keep).sort_values("doc_id")
    assert list(got["keep"]) == list(expect["keep"])
    assert list(got["domain"]) == list(expect["domain"])


def test_domain_counts(ray_session):
    ds = ray.data.from_arrow(_corpus())
    out = domain_counts(ds).to_pandas().set_index("domain")["n_pages"]
    assert out["example.com"] == 4
    assert out["bbc.co.uk"] == 2
    assert out["solo.org"] == 1
    assert out[""] == 1


def test_domain_cap_rejects_bad_cap(ray_session):
    with pytest.raises(ValueError):
        domain_cap(ray.data.from_arrow(_corpus()), cap=0)


def test_domain_cap_filter_by_url(ray_session):
    from pdfextract_ray.stages.domains import domain_cap_filter_by_url
    t = pa.table({
        "url": ["http://a.ex.com/1", "http://a.ex.com/1",  # same url 2x
                "http://b.ex.com/2", "http://c.ex.com/3",
                "http://solo.org/x", None],
        "text": ["p1", "p1b", "p2", "p3", "p4", "p5"],
    })
    out = domain_cap_filter_by_url(ray.data.from_arrow(t), cap=2) \
        .to_pandas()
    # ex.com distinct urls sorted: a/1, b/2, c/3 -> cap 2 drops c/3;
    # byte-identical a/1 rows survive together; null url never capped
    assert sorted(out["text"]) == ["p1", "p1b", "p2", "p4", "p5"]
    # forced join tier agrees
    joined = domain_cap_filter_by_url(ray.data.from_arrow(t), cap=2,
                                      max_broadcast=0).to_pandas()
    assert sorted(joined["text"]) == sorted(out["text"])
    # no-drop fast path returns the input unchanged
    full = domain_cap_filter_by_url(ray.data.from_arrow(t), cap=10) \
        .to_pandas()
    assert len(full) == len(t)
