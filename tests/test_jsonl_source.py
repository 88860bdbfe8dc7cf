"""JSONL web-text ingestion: round-trip vs parquet-sourced extraction."""

import json

import pytest

from pdfextract_ray.sources.readers import read_jsonl_corpus

CORPUS_COLS = ["url", "warc_ts", "html", "text", "lang", "html_size"]


def _write_jsonl(path, rows):
    with open(path, "w", encoding="utf-8") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


@pytest.fixture(scope="module")
def jsonl_corpus(ray_session, tiny_corpus, tmp_path_factory):
    d = tmp_path_factory.mktemp("jsonl_corpus")
    rows = tiny_corpus.slice(0, 8).to_pylist()
    _write_jsonl(str(d / "dump.jsonl"), [{
        "url": r["url"],
        "warc_ts": int(r["warc_ts"].timestamp() * 1_000_000),
        "html": r["html"].decode("utf-8"),
        "text": r["text"],
        "lang": r["lang"],
    } for r in rows])
    return str(d / "dump.jsonl")


def test_jsonl_schema_and_roundtrip(ray_session, tiny_corpus, jsonl_corpus):
    got = read_jsonl_corpus(jsonl_corpus).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    want = tiny_corpus.slice(0, 8).select(CORPUS_COLS) \
        .sort_by("url").to_pandas()
    assert list(got.columns) == CORPUS_COLS
    for col in ("url", "html", "text", "lang", "html_size", "warc_ts"):
        assert got[col].tolist() == want[col].tolist(), col


def test_jsonl_extraction_equals_parquet(ray_session, tiny_corpus, jsonl_corpus):
    from pdfextract_ray.pipelines.extract_pipeline import extract_dataset
    import ray.data

    via_jsonl = extract_dataset(read_jsonl_corpus(jsonl_corpus)) \
        .to_pandas().sort_values("url").reset_index(drop=True)
    via_table = extract_dataset(ray.data.from_arrow(tiny_corpus.slice(0, 8))) \
        .to_pandas().sort_values("url").reset_index(drop=True)
    assert via_jsonl["text"].tolist() == via_table["text"].tolist()
    assert via_jsonl["title"].tolist() == via_table["title"].tolist()


def test_jsonl_text_only_and_remap(ray_session, tmp_path):
    p = str(tmp_path / "textonly.jsonl")
    _write_jsonl(p, [{"uri": "u://%d" % i, "content": "hello world %d" % i,
                      "timestamp": "2026-01-02T03:04:05"} for i in range(5)])
    t = read_jsonl_corpus(p, url_field="uri", text_field="content",
                          ts_field="timestamp").to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert list(t.columns) == CORPUS_COLS
    assert t["html"].map(len).eq(0).all() and t["html_size"].eq(0).all()
    assert t["lang"].eq("und").all()
    assert str(t["warc_ts"].iloc[0]) == "2026-01-02 03:04:05"
    assert t["text"].iloc[3] == "hello world 3"


def test_jsonl_null_url_dropped_null_html_filled(ray_session, tmp_path):
    # rows with a null url can't be partitioned/deduped → dropped (logged);
    # rows missing html parse as null → normalized to b"" (a null html
    # would reach url_partition/extraction as None)
    p = str(tmp_path / "sparse.jsonl")
    _write_jsonl(p, [
        {"url": "u://0", "html": "<p>a</p>", "text": "a"},
        {"url": None, "html": "<p>ghost</p>", "text": "ghost"},
        {"url": "u://2", "text": "no html field"},
    ])
    t = read_jsonl_corpus(p).to_pandas().sort_values("url").reset_index(drop=True)
    assert t["url"].tolist() == ["u://0", "u://2"]
    assert t["html"].tolist() == [b"<p>a</p>", b""]
    assert t["html_size"].tolist() == [8, 0]


def test_jsonl_missing_url_raises(ray_session, tmp_path):
    p = str(tmp_path / "nourl.jsonl")
    _write_jsonl(p, [{"text": "orphan"}])
    with pytest.raises(Exception):
        read_jsonl_corpus(p).to_pandas()


def test_cli_extract_jsonl(ray_session, jsonl_corpus, tmp_path, capsys):
    import glob
    import os

    import pyarrow.parquet as pq

    from pdfextract_ray.__main__ import main
    out = str(tmp_path / "out")
    assert main(["extract", jsonl_corpus, "--jsonl", "--out", out]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["ok"] is True
    t = pq.read_table(glob.glob(os.path.join(out, "*.parquet")))
    assert t.num_rows == 8 and "text" in t.schema.names
