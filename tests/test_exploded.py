"""Explode/reassemble roundtrip: the page-parallel pipeline must equal
the fused single-pass pipeline byte-for-byte (FIXTURES.md §5)."""

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def corpus_path(ray_session, tiny_corpus, tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus_exp")
    pq.write_table(tiny_corpus, str(d / "part-0.parquet"))
    return str(d)


def test_exploded_equals_fused(ray_session, corpus_path):
    from pdfextract_ray.pipelines.exploded import extract_exploded
    from pdfextract_ray.pipelines.extract_pipeline import (extract_dataset,
                                                           read_corpus)
    fused = extract_dataset(read_corpus(corpus_path), concurrency=2,
                            skew_threshold=None).to_pandas()
    expl = extract_exploded(read_corpus(corpus_path), concurrency=2).to_pandas()

    fused = fused.sort_values("url").reset_index(drop=True)
    expl = expl.sort_values("url").reset_index(drop=True)
    assert len(fused) == len(expl)
    assert list(fused["url"]) == list(expl["url"])
    assert list(fused["text"]) == list(expl["text"])
    assert list(fused["title"].fillna("")) == list(expl["title"].fillna(""))
    assert list(fused["n_refs"]) == list(expl["n_refs"])
    assert list(fused["n_pages"]) == list(expl["n_pages"])
    assert list(fused["n_tokens"]) == list(expl["n_tokens"])
    for a, b in zip(fused["references"], expl["references"]):
        assert [(r["content"], r["order"]) for r in a] == \
               [(r["content"], r["order"]) for r in b]


def test_exploded_handles_empty_and_null_html(ray_session):
    import pyarrow as pa
    import ray.data
    from datetime import datetime
    from pdfextract_ray.pipelines.exploded import extract_exploded

    ts = datetime(2024, 1, 1)
    rows = [
        {"url": "ok", "warc_ts": ts, "html": b"<p>hello world</p>", "lang": "en"},
        {"url": "empty", "warc_ts": ts, "html": b"", "lang": "en"},
        {"url": "null", "warc_ts": ts, "html": None, "lang": "en"},
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = extract_exploded(ds, concurrency=2).to_pandas().set_index("url")
    assert out.loc["ok", "text"] == "hello world"
    assert out.loc["empty", "text"] == ""
    assert out.loc["null", "text"] == ""
    assert len(out) == 3
