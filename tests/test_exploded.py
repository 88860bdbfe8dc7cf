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


def test_exploded_residue_path_equals_fused(ray_session, corpus_path):
    """Force every document through the page-parallel residue path
    (page_threshold=0, tiny page batches) — not the in-stage fused
    fast path — and verify the reassembly shuffle still reproduces the
    fused pipeline byte-for-byte."""
    from pdfextract_ray.pipelines.exploded import extract_exploded
    from pdfextract_ray.pipelines.extract_pipeline import (extract_dataset,
                                                           read_corpus)
    fused = extract_dataset(read_corpus(corpus_path), concurrency=2,
                            skew_threshold=None).to_pandas()
    expl = extract_exploded(read_corpus(corpus_path), concurrency=2,
                            page_threshold=0, page_batch_size=2).to_pandas()
    fused = fused.sort_values("url").reset_index(drop=True)
    expl = expl.sort_values("url").reset_index(drop=True)
    assert list(fused["url"]) == list(expl["url"])
    assert list(fused["text"]) == list(expl["text"])
    assert list(fused["n_pages"]) == list(expl["n_pages"])
    for a, b in zip(fused["references"], expl["references"]):
        assert [(r["content"], r["order"]) for r in a] == \
               [(r["content"], r["order"]) for r in b]


def test_exploded_mixed_threshold_equals_fused(ray_session, corpus_path):
    """page_threshold=3 sends short docs through the in-stage fused
    path and longer ones through the page-parallel residue path in the
    SAME run — the mixed boundary must still equal the fused output."""
    from pdfextract_ray.pipelines.exploded import extract_exploded
    from pdfextract_ray.pipelines.extract_pipeline import (extract_dataset,
                                                           read_corpus)
    fused = extract_dataset(read_corpus(corpus_path), concurrency=2,
                            skew_threshold=None).to_pandas()
    thr = int(fused["n_pages"].median())  # guarantees both routes fire
    expl = extract_exploded(read_corpus(corpus_path), concurrency=2,
                            page_threshold=thr).to_pandas()
    fused = fused.sort_values("url").reset_index(drop=True)
    expl = expl.sort_values("url").reset_index(drop=True)
    assert list(fused["url"]) == list(expl["url"])
    assert list(fused["text"]) == list(expl["text"])
    assert list(fused["n_pages"]) == list(expl["n_pages"])
    # both routes must be exercised by the fixture corpus
    assert (expl["n_pages"] <= thr).any() and (expl["n_pages"] > thr).any()


def test_exploded_handles_empty_and_null_html(ray_session):
    """Empty html extracts to empty text; NULL html is a poisoned row
    and yields an error row — the same contract as the fused pipeline's
    ExtractDocs (it used to silently extract to "", a variant-parity
    gap)."""
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
    assert out.loc["ok", "error"] is None
    assert out.loc["empty", "text"] == ""
    assert out.loc["empty", "error"] is None
    assert out.loc["null", "text"] is None
    assert out.loc["null", "error"] is not None
    assert len(out) == 3


def test_exploded_error_isolation_matches_fused(ray_session):
    """A poisoned document yields an error row (never a failed block) in
    the exploded path too, with the SAME row the fused pipeline emits —
    through both the in-stage fused route and the page-parallel route
    (a layout failure is caught before any page explodes)."""
    import pyarrow as pa
    import ray.data
    from datetime import datetime
    from pdfextract_ray.pipelines.exploded import extract_exploded
    from pdfextract_ray.pipelines.extract_pipeline import extract_dataset

    ts = datetime(2024, 1, 1)
    rows = [
        {"url": "u1", "warc_ts": ts, "html": b"<p>fine</p>", "lang": "en"},
        {"url": "u2", "warc_ts": ts, "html": None, "lang": "en"},  # poison
    ]
    t = pa.Table.from_pylist(rows)
    fused = extract_dataset(ray.data.from_arrow(t), concurrency=1,
                            skew_threshold=None).to_pandas().set_index("url")
    for thr in (64, 0):
        out = extract_exploded(ray.data.from_arrow(t), concurrency=2,
                               page_threshold=thr).to_pandas().set_index("url")
        assert len(out) == 2, thr
        assert out.loc["u1", "text"] == "fine"
        assert out.loc["u1", "error"] is None
        assert out.loc["u2", "text"] is None
        assert out.loc["u2", "error"] == fused.loc["u2", "error"]
        assert out.loc["u2", "n_pages"] == 0 and out.loc["u2", "n_refs"] == 0


def test_residue_page_error_folds_to_document_error():
    """A page-kernel failure inside the residue path poisons only its
    document: process_residue_pages records the page error, and
    assemble_group folds it to ONE error row for that url (no raise,
    other urls unaffected). Pure-local test, no Ray."""
    import pyarrow as pa
    from pdfextract_ray.pipelines.exploded import (WORKER_SCHEMA,
                                                   assemble_group,
                                                   process_residue_pages)
    from pdfextract_ray.kernel.layout import tokenize

    good_lines = tokenize("<p>hello world</p>")
    # content=None makes the chunk stage raise (AttributeError) — a
    # stand-in for any unexpected kernel failure on one page
    bad_line = dict(good_lines[0])
    bad_line["content"] = None

    def page_row(url, page, lines):
        row = {name: None for name in WORKER_SCHEMA.names}
        row.update(url_shard=0, url=url, lang="en", page=page,
                   assembled=False, lines=lines)
        return row

    batch = pa.Table.from_pylist(
        [page_row("bad", 1, good_lines), page_row("bad", 2, [bad_line]),
         page_row("good", 1, good_lines)], schema=WORKER_SCHEMA)
    out = assemble_group(process_residue_pages(batch)).to_pandas() \
        .set_index("url")
    assert len(out) == 2
    assert out.loc["good", "error"] is None
    assert out.loc["good", "text"] == "hello world"
    assert out.loc["bad", "error"] is not None
    assert out.loc["bad", "text"] is None and out.loc["bad", "n_pages"] == 0


def test_adaptive_router_equals_fused(ray_session, corpus_path):
    """Hybrid skew router: small docs fused, oversized exploded; union
    equals the pure-fused output row-for-row."""
    import pandas as pd
    from pdfextract_ray.pipelines.exploded import EXPLODED_COLUMNS, extract_adaptive
    from pdfextract_ray.pipelines.extract_pipeline import extract_dataset, read_corpus

    # threshold in the middle of the corpus size distribution → both
    # branches exercised
    import pyarrow.parquet as pq
    import pyarrow.compute as pc
    import glob
    sizes = sorted(len(h) for h in pq.read_table(
        glob.glob(corpus_path + "/*.parquet"))["html"].to_pylist())
    thr = sizes[len(sizes) // 2]

    got = extract_adaptive(read_corpus(corpus_path), threshold_bytes=thr) \
        .to_pandas().sort_values("url").reset_index(drop=True)
    # both branches non-empty
    assert 0 < sum(1 for s in sizes if s <= thr) < len(sizes)

    exp = extract_dataset(read_corpus(corpus_path), with_spans=False) \
        .to_pandas()[EXPLODED_COLUMNS].sort_values("url").reset_index(drop=True)
    assert list(got["url"]) == list(exp["url"])
    for col in ["title", "text", "n_pages", "n_tokens", "n_refs"]:
        pd.testing.assert_series_equal(got[col], exp[col], check_names=False)
    assert all(list(a) == list(b) for a, b in zip(got["references"],
                                                  exp["references"]))


def test_adaptive_pushdown_equals_fused(ray_session, corpus_path):
    """One-read pushdown router (html_size predicate at the parquet
    scan) equals the pure-fused output row-for-row."""
    import glob
    import pandas as pd
    import pyarrow.parquet as pq
    from pdfextract_ray.pipelines.exploded import (EXPLODED_COLUMNS,
                                                   extract_adaptive_pushdown)
    from pdfextract_ray.pipelines.extract_pipeline import (extract_dataset,
                                                           read_corpus)

    tbl = pq.read_table(glob.glob(corpus_path + "/*.parquet"))
    sizes = sorted(tbl["html_size"].to_pylist())
    assert sizes == sorted(len(h) for h in tbl["html"].to_pylist())
    thr = sizes[len(sizes) // 2]  # both branches exercised

    got = extract_adaptive_pushdown(corpus_path, threshold_bytes=thr) \
        .to_pandas().sort_values("url").reset_index(drop=True)
    assert 0 < sum(1 for s in sizes if s <= thr) < len(sizes)

    exp = extract_dataset(read_corpus(corpus_path), with_spans=False) \
        .to_pandas()[EXPLODED_COLUMNS].sort_values("url").reset_index(drop=True)
    assert list(got["url"]) == list(exp["url"])
    for col in ["title", "text", "n_pages", "n_tokens", "n_refs"]:
        pd.testing.assert_series_equal(got[col], exp[col], check_names=False)
    assert all(list(a) == list(b) for a, b in zip(got["references"],
                                                  exp["references"]))


def test_adaptive_pushdown_null_sizes_not_dropped(ray_session, tiny_corpus,
                                                  tmp_path_factory):
    """Rows with NULL html_size must route to the fused branch, not
    vanish (a pushdown predicate is null on BOTH sides for them)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pdfextract_ray.pipelines.exploded import extract_adaptive_pushdown

    t = tiny_corpus
    n = t.num_rows
    sizes = t["html_size"].to_pylist()
    nulled = [None if i % 3 == 0 else s for i, s in enumerate(sizes)]
    t = t.set_column(t.schema.get_field_index("html_size"), "html_size",
                     pa.array(nulled, pa.int64()))
    d = tmp_path_factory.mktemp("corpus_nullsz")
    pq.write_table(t, str(d / "part-0.parquet"))

    thr = sorted(s for s in nulled if s is not None)[n // 3]
    out = extract_adaptive_pushdown(str(d), threshold_bytes=thr).to_pandas()
    assert len(out) == n
    assert sorted(out["url"]) == sorted(t["url"].to_pylist())


def test_derive_size_threshold_covers_quantile(ray_session, corpus_path):
    """Derived threshold is a power of two bounding >= q of the corpus,
    and the default (p99) leaves a non-empty heavy tail on skewed data."""
    import glob
    import pyarrow.parquet as pq
    from pdfextract_ray.pipelines.exploded import derive_size_threshold

    sizes = pq.read_table(glob.glob(corpus_path + "/*.parquet"),
                          columns=["html_size"])["html_size"].to_pylist()
    for q in (0.5, 0.9, 0.99):
        thr = derive_size_threshold(corpus_path, quantile=q)
        assert thr & (thr - 1) == 0  # power of two
        frac = sum(1 for s in sizes if s <= thr) / len(sizes)
        assert frac >= q
        # the next-smaller bucket would NOT cover q (tightness)
        frac_below = sum(1 for s in sizes if s <= thr // 2) / len(sizes)
        assert frac_below < q


def test_exploded_duplicate_url_contract_raises(ray_session, tiny_corpus):
    """Duplicate urls among OVERSIZED docs would silently merge into one
    reassembled document — assemble_group must fail loud instead."""
    import pyarrow as pa
    import ray.data
    import pytest as _pytest
    from pdfextract_ray.pipelines.exploded import extract_exploded

    t = tiny_corpus.slice(0, 4)
    dup = pa.concat_tables([t, t.slice(0, 1)])  # url[0] twice
    ds = ray.data.from_arrow(dup)
    with _pytest.raises(Exception, match="contract violated"):
        # page_threshold=0 forces the residue path for every doc
        extract_exploded(ds, concurrency=2, page_threshold=0).materialize()


def _read_dir_sorted(path):
    import glob
    import pandas as pd
    frames = [pq.read_table(f).to_pandas()
              for f in sorted(glob.glob(path + "/**/*.parquet",
                                        recursive=True))]
    frames = [f for f in frames if len(f)]
    df = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()
    return df.sort_values("url").reset_index(drop=True)


@pytest.mark.parametrize("threshold,batch", [(64, 64), (0, 2), (3, 2)])
def test_exploded_to_dir_equals_fused(ray_session, corpus_path, tmp_path,
                                      threshold, batch):
    """The streaming actor-side-sink variant (finished rows written
    inside the routed stage, no materialize barrier) must produce the
    same row set as the fused pipeline, across all-finished (64),
    all-residue (0) and mixed (3) routing."""
    from pdfextract_ray.pipelines.exploded import extract_exploded_to_dir
    from pdfextract_ray.pipelines.extract_pipeline import (extract_dataset,
                                                           read_corpus)
    fused = extract_dataset(read_corpus(corpus_path), concurrency=2,
                            skew_threshold=None).to_pandas()
    out = str(tmp_path / ("sink_%d" % threshold))
    extract_exploded_to_dir(read_corpus(corpus_path), out, concurrency=2,
                            page_threshold=threshold, page_batch_size=batch)
    got = _read_dir_sorted(out)
    fused = fused.sort_values("url").reset_index(drop=True)
    assert list(fused["url"]) == list(got["url"])
    assert list(fused["text"]) == list(got["text"])
    assert list(fused["title"].fillna("")) == list(got["title"].fillna(""))
    assert list(fused["n_pages"]) == list(got["n_pages"])
    assert list(fused["n_tokens"]) == list(got["n_tokens"])
    for a, b in zip(fused["references"], got["references"]):
        assert [(r["content"], r["order"]) for r in a] == \
               [(r["content"], r["order"]) for r in b]


def test_exploded_to_dir_sink_idempotent_name(ray_session, corpus_path,
                                              tmp_path):
    """A retried batch must REPLACE its own part file (deterministic
    content-keyed name), not append a duplicate."""
    import glob
    from pdfextract_ray.pipelines.exploded import extract_exploded_to_dir
    from pdfextract_ray.pipelines.extract_pipeline import read_corpus

    out = str(tmp_path / "sink_idem")
    extract_exploded_to_dir(read_corpus(corpus_path), out, concurrency=2)
    first = _read_dir_sorted(out)
    n_files = len(glob.glob(out + "/finished-*.parquet"))
    # run again into the same dir: every finished part file must be
    # rewritten in place (same names), no growth
    extract_exploded_to_dir(read_corpus(corpus_path), out, concurrency=2)
    again = _read_dir_sorted(out)
    assert len(glob.glob(out + "/finished-*.parquet")) == n_files
    assert list(first["url"]) == list(again["url"])


def test_exploded_to_dir_rerun_clears_stale_finished(ray_session,
                                                     corpus_path, tmp_path):
    """Rerun-equals-recompute: a rerun over a SHRUNK corpus must not
    leave the removed documents' finished part files behind (names are
    content-keyed, so a changed block composition can't overwrite them
    — they must be cleared at run start)."""
    import ray
    from pdfextract_ray.pipelines.exploded import extract_exploded_to_dir
    from pdfextract_ray.pipelines.extract_pipeline import read_corpus

    out = str(tmp_path / "sink_shrink")
    extract_exploded_to_dir(read_corpus(corpus_path), out, concurrency=2)
    full = _read_dir_sorted(out)
    keep = sorted(full["url"])[: len(full) // 2]
    shrunk = read_corpus(corpus_path).filter(lambda r: r["url"] in set(keep))
    extract_exploded_to_dir(shrunk, out, concurrency=2)
    again = _read_dir_sorted(out)
    assert sorted(again["url"]) == keep  # no stale rows from run 1
