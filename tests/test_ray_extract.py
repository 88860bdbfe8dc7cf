"""Ray pipeline ≡ pure kernel: the distributed path must be byte-identical
per url to the single-process kernel (FIXTURES.md §5 parallelism
invariance), plus resume-equals-fresh and skew-branch equivalence."""

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdfextract_ray.kernel.document import run_document


@pytest.fixture(scope="module")
def corpus_path(ray_session, tiny_corpus, tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    # write as 4 files so shard grouping has something to split
    n = tiny_corpus.num_rows
    for i in range(4):
        pq.write_table(tiny_corpus.slice(i * n // 4, n // 4),
                       str(d / ("part-%d.parquet" % i)))
    return str(d)


def _kernel_results(tiny_corpus, gazetteer):
    out = {}
    for i in range(tiny_corpus.num_rows):
        url = tiny_corpus.column("url")[i].as_py()
        out[url] = run_document(tiny_corpus.column("html")[i].as_py(),
                                gazetteer=gazetteer)
    return out


def test_ray_matches_kernel(ray_session, corpus_path, tiny_corpus, gazetteer):
    from pdfextract_ray.pipelines.extract_pipeline import extract_dataset, read_corpus
    out = extract_dataset(read_corpus(corpus_path), concurrency=2,
                          batch_size=4).to_pandas()
    kern = _kernel_results(tiny_corpus, gazetteer)
    assert len(out) == len(kern)
    for _, row in out.iterrows():
        k = kern[row["url"]]
        assert row["text"] == k.text, row["url"]
        assert (row["title"] if row["title"] is not None else None) == k.title
        got_refs = [(r["content"], r["order"]) for r in row["references"]]
        exp_refs = [(r["content"], r.get("order")) for r in k.references]
        assert got_refs == exp_refs
        assert row["error"] is None


def test_skew_branch_equivalence(ray_session, corpus_path):
    """Routing rows through the oversized branch must not change results."""
    from pdfextract_ray.pipelines.extract_pipeline import extract_dataset, read_corpus
    a = extract_dataset(read_corpus(corpus_path), concurrency=2,
                        skew_threshold=None).to_pandas()
    # threshold below every row size → everything goes down the big branch
    b = extract_dataset(read_corpus(corpus_path), concurrency=2,
                        skew_threshold=10).to_pandas()
    a = a.sort_values("url").reset_index(drop=True)
    b = b.sort_values("url").reset_index(drop=True)
    assert list(a["text"]) == list(b["text"])
    assert list(a["n_refs"]) == list(b["n_refs"])


def test_resume_equals_fresh(ray_session, corpus_path, tmp_path):
    from pdfextract_ray.pipelines.extract_pipeline import run_extract
    fresh = str(tmp_path / "fresh")
    resumed = str(tmp_path / "resumed")

    s1 = run_extract(corpus_path, fresh, num_shards=4, concurrency=2)
    assert s1["rows"] == 48 and s1["errors"] == 0

    # simulate a crash: run only shard 0+1 by pre-marking 2 and 3 done,
    # then unmark and resume
    s2a = run_extract(corpus_path, resumed, num_shards=2, concurrency=2)
    assert s2a["shards_skipped"] == 0
    # delete shard 1 and its manifest → resume recomputes only shard 1
    shutil.rmtree(os.path.join(resumed, "shard=0001"))
    os.remove(os.path.join(resumed, "_manifests", "shard-0001.json"))
    s2b = run_extract(corpus_path, resumed, num_shards=2, concurrency=2)
    assert s2b["shards_skipped"] == 1

    def load(d):
        files = sorted(glob.glob(os.path.join(d, "shard=*", "*.parquet")))
        t = pq.read_table(files, columns=["url", "text", "n_refs"])
        return t.to_pandas().sort_values("url").reset_index(drop=True)

    fa, fb = load(fresh), load(resumed)
    assert list(fa["text"]) == list(fb["text"])
    assert list(fa["n_refs"]) == list(fb["n_refs"])


def test_resume_discards_partial_shard(ray_session, corpus_path, tmp_path):
    """A crash between data write and manifest write must not duplicate
    rows on resume: the manifest-less shard dir is discarded."""
    from pdfextract_ray.pipelines.extract_pipeline import run_extract
    out = str(tmp_path / "out")
    run_extract(corpus_path, out, num_shards=2, concurrency=2)
    # simulate crash: manifest for shard 0 missing, data present
    os.remove(os.path.join(out, "_manifests", "shard-0000.json"))
    s = run_extract(corpus_path, out, num_shards=2, concurrency=2)
    assert s["shards_skipped"] == 1
    files = sorted(glob.glob(os.path.join(out, "shard=*", "*.parquet")))
    t = pq.read_table(files, columns=["url"])
    urls = t.column("url").to_pylist()
    assert len(urls) == 48 and len(set(urls)) == 48  # no duplicates


def test_error_isolation(ray_session, gazetteer):
    """A poisoned row yields an error column, not a failed block."""
    import ray.data
    from pdfextract_ray.pipelines.extract_pipeline import extract_dataset

    from datetime import datetime
    ts = datetime(2024, 1, 1)
    rows = [
        {"url": "u1", "warc_ts": ts, "html": b"<p>fine</p>", "lang": "en"},
        {"url": "u2", "warc_ts": ts, "html": None, "lang": "en"},  # poison
    ]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    out = extract_dataset(ds, concurrency=1, skew_threshold=None).to_pandas()
    out = out.set_index("url")
    assert out.loc["u1", "error"] is None
    assert out.loc["u2", "error"] is not None
    assert out.loc["u1", "text"] == "fine"


def test_parallel_shards_equals_sequential(ray_session, corpus_path, tmp_path):
    from pdfextract_ray.pipelines.extract_pipeline import run_extract
    seq = str(tmp_path / "seq")
    par = str(tmp_path / "par")
    run_extract(corpus_path, seq, num_shards=4, concurrency=2)
    s = run_extract(corpus_path, par, num_shards=4, parallel_shards=2,
                    concurrency=1)
    assert s["rows"] == 48 and s["errors"] == 0

    def load(d):
        files = sorted(glob.glob(os.path.join(d, "shard=*", "*.parquet")))
        return pq.read_table(files, columns=["url", "text"]).to_pandas() \
            .sort_values("url").reset_index(drop=True)

    a, b = load(seq), load(par)
    assert list(a["text"]) == list(b["text"])


def test_dedup_by_url_idempotent_reruns(ray_session, corpus_path):
    """Overlapping crawls (the corpus unioned with itself) collapse to
    one row per url."""
    from pdfextract_ray.pipelines.extract_pipeline import (dedup_by_url,
                                                           extract_dataset,
                                                           read_corpus)
    ds = read_corpus(corpus_path).union(read_corpus(corpus_path))
    out = extract_dataset(ds, concurrency=2, with_spans=False,
                          skew_threshold=None)
    deduped = dedup_by_url(out).to_pandas()
    assert len(deduped) == 48
    assert deduped["url"].is_unique


def test_empty_input_shard_completes_and_resumes(ray_session, tiny_corpus, tmp_path):
    """A shard whose input file is EMPTY writes zero rows; Ray's parquet
    sink then deletes the shard dir it created. The run must still write
    a rows=0 manifest (not crash in the metrics read-back) and a resumed
    run must skip the empty shard like any other."""
    from pdfextract_ray.pipelines.extract_pipeline import run_extract
    d = tmp_path / "corpus"
    d.mkdir()
    pq.write_table(tiny_corpus.slice(0, 8), str(d / "part-0.parquet"))
    pq.write_table(tiny_corpus.slice(0, 0), str(d / "part-1.parquet"))
    out = str(tmp_path / "out")
    s = run_extract(str(d), out, num_shards=2, concurrency=1)
    assert s["rows"] == 8 and s["errors"] == 0
    from pdfextract_ray.state import manifest as mf
    man = mf.read_manifests(out)
    assert set(man) == {0, 1}
    assert sorted(m["rows"] for m in man.values()) == [0, 8]
    s2 = run_extract(str(d), out, num_shards=2, concurrency=1)
    assert s2["shards_skipped"] == 2 and s2["rows"] == 0


def test_null_url_error_isolation(ray_session, gazetteer):
    """A null-url row (malformed parquet input — readers guard JSONL/WARC
    but parquet arrives raw) yields an error row, never a failed block,
    on BOTH extraction paths."""
    import pyarrow as pa
    import ray.data
    from pdfextract_ray.pipelines.exploded import extract_exploded
    from pdfextract_ray.pipelines.extract_pipeline import extract_dataset

    from datetime import datetime
    ts = datetime(2024, 1, 1)
    rows = [
        {"url": "u1", "warc_ts": ts, "html": b"<p>fine</p>", "lang": "en"},
        {"url": None, "warc_ts": ts, "html": b"<p>lost</p>", "lang": "en"},
    ]
    t = pa.Table.from_pylist(rows)

    out = extract_dataset(ray.data.from_arrow(t), concurrency=1,
                          skew_threshold=None).to_pandas()
    assert len(out) == 2
    ok = out[out["url"] == "u1"].iloc[0]
    bad = out[out["url"].isna()].iloc[0]
    assert ok["error"] is None and ok["text"] == "fine"
    assert "null url" in bad["error"]

    out2 = extract_exploded(ray.data.from_arrow(t),
                            concurrency=1).to_pandas()
    assert len(out2) == 2
    ok2 = out2[out2["url"] == "u1"].iloc[0]
    bad2 = out2[out2["url"].isna()].iloc[0]
    assert ok2["error"] is None and ok2["text"] == "fine"
    assert "null url" in bad2["error"]


def test_dedup_by_url_null_urls_not_collapsed(ray_session):
    """Distinct null-url rows survive dedup (no shared-null-key collapse);
    byte-identical null rows are true duplicates and do collapse."""
    import pyarrow as pa
    import ray.data
    from datetime import datetime
    from pdfextract_ray.pipelines.extract_pipeline import dedup_by_url

    ts = datetime(2024, 1, 1)
    rows = [
        {"url": "u1", "warc_ts": ts, "html": b"a", "lang": "en"},
        {"url": "u1", "warc_ts": ts, "html": b"dup", "lang": "en"},
        {"url": None, "warc_ts": ts, "html": b"b", "lang": "en"},
        {"url": None, "warc_ts": ts, "html": b"c", "lang": "en"},
        {"url": None, "warc_ts": ts, "html": b"c", "lang": "en"},  # true dup
    ]
    out = dedup_by_url(
        ray.data.from_arrow(pa.Table.from_pylist(rows))).to_pandas()
    assert sorted(out.columns) == ["html", "lang", "url", "warc_ts"]
    assert len(out[out["url"] == "u1"]) == 1
    nulls = out[out["url"].isna()]
    assert sorted(nulls["html"]) == [b"b", b"c"]


def test_resume_refuses_changed_shard_assignment(ray_session, corpus_path,
                                                 tmp_path):
    """Resuming with a different --shards re-slices the file list; shard
    indices would no longer cover the same files (silent data loss).
    The manifest records each shard's file list; a mismatch must refuse,
    not skip."""
    import pytest
    from pdfextract_ray.pipelines.extract_pipeline import run_extract
    out = str(tmp_path / "mismatch")
    run_extract(corpus_path, out, num_shards=4, concurrency=2)
    with pytest.raises(ValueError, match="resume mismatch"):
        run_extract(corpus_path, out, num_shards=2, concurrency=2)


def test_resume_reruns_shard_with_truncated_manifest(ray_session,
                                                     corpus_path, tmp_path):
    """A 0-byte/unparseable manifest (crash between rename and data
    durability) must mean NOT done — the shard re-runs instead of being
    skipped forever, and stats/read_manifests never crash on it."""
    from pdfextract_ray.pipelines.extract_pipeline import run_extract
    from pdfextract_ray.state import manifest as mf
    out = str(tmp_path / "trunc")
    run_extract(corpus_path, out, num_shards=2, concurrency=2)
    # truncate shard 1's manifest and delete its (possibly partial) data
    open(os.path.join(out, "_manifests", "shard-0001.json"), "w").close()
    shutil.rmtree(os.path.join(out, "shard=0001"))
    assert mf.done_shards(out) == {0}
    # stray backup file must not crash either walker
    open(os.path.join(out, "_manifests", "shard-0001-bak.json"), "w").close()
    assert set(mf.read_manifests(out)) == {0}
    s = run_extract(corpus_path, out, num_shards=2, concurrency=2)
    assert s["shards_skipped"] == 1  # shard 0 skipped, shard 1 re-ran
    assert mf.done_shards(out) == {0, 1}
