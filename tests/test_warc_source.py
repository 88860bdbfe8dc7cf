"""WARC ingestion: record grammar, gzip, tolerance, extraction parity."""

import gzip

import pytest

from pdfextract_ray.sources.readers import parse_warc_records, read_warc_corpus

CORPUS_COLS = ["url", "warc_ts", "html", "text", "lang", "html_size"]


def _record(wtype: bytes, payload: bytes, url: bytes | None = None,
            date: bytes = b"2024-01-01T00:00:00Z") -> bytes:
    head = [b"WARC/1.0",
            b"WARC-Type: " + wtype,
            b"WARC-Date: " + date,
            b"Content-Length: " + str(len(payload)).encode()]
    if url is not None:
        head.append(b"WARC-Target-URI: " + url)
    return b"\r\n".join(head) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _response(url: str, html: bytes,
              date: bytes = b"2024-01-01T00:00:00Z") -> bytes:
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html)
    return _record(b"response", http, url.encode(), date)


def _warc_bytes(rows) -> bytes:
    out = [_record(b"warcinfo", b"software: test\r\n")]
    for r in rows:
        out.append(_record(b"request", b"GET / HTTP/1.1\r\n\r\n",
                           r["url"].encode()))
        out.append(_response(r["url"], r["html"]))
    return b"".join(out)


def test_parse_warc_records_grammar():
    rows = [{"url": "http://a/1", "html": b"<p>one</p>"},
            {"url": "http://b/2", "html": b"<p>two</p>"}]
    got = list(parse_warc_records(_warc_bytes(rows)))
    assert [(u, h) for u, _, h in got] == \
        [("http://a/1", b"<p>one</p>"), ("http://b/2", b"<p>two</p>")]
    # WARC-Date parsed to epoch micros (2024-01-01T00:00:00Z)
    assert got[0][1] == 1_704_067_200_000_000


def test_parse_warc_tolerates_corruption():
    ok = _response("http://a/1", b"<p>ok</p>")
    # truncated tail record: header promises more bytes than exist
    truncated = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 999\r\n\r\nxx"
    assert [u for u, _, _ in parse_warc_records(ok + truncated)] == ["http://a/1"]
    # response whose payload is not HTTP → skipped, later records kept
    nonhttp = _record(b"response", b"garbage", b"http://bad")
    buf = nonhttp + _response("http://good", b"<p>g</p>")
    assert [u for u, _, _ in parse_warc_records(buf)] == ["http://good"]
    # bracketed URI (WARC 1.0 style) unwrapped
    bracketed = _record(b"response",
                        b"HTTP/1.1 200 OK\r\n\r\n<p>b</p>", b"<http://br/x>")
    assert next(parse_warc_records(bracketed))[0] == "http://br/x"
    assert list(parse_warc_records(b"")) == []
    assert list(parse_warc_records(b"not a warc")) == []


@pytest.fixture(scope="module")
def warc_corpus(ray_session, tiny_corpus, tmp_path_factory):
    d = tmp_path_factory.mktemp("warc_corpus")
    rows = tiny_corpus.slice(0, 8).to_pylist()
    recs = [{"url": r["url"], "html": r["html"]} for r in rows]
    (d / "seg-0.warc").write_bytes(_warc_bytes(recs[:4]))
    (d / "seg-1.warc.gz").write_bytes(gzip.compress(_warc_bytes(recs[4:])))
    return str(d)


def test_warc_schema_and_roundtrip(ray_session, tiny_corpus, warc_corpus):
    got = read_warc_corpus(warc_corpus).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    want = tiny_corpus.slice(0, 8).select(CORPUS_COLS).sort_by("url").to_pandas()
    assert list(got.columns) == CORPUS_COLS
    assert got["url"].tolist() == want["url"].tolist()
    assert got["html"].tolist() == want["html"].tolist()
    assert got["html_size"].tolist() == want["html_size"].tolist()
    assert got["lang"].eq("und").all() and got["text"].eq("").all()
    assert str(got["warc_ts"].iloc[0]) == "2024-01-01 00:00:00"


def test_warc_extraction_equals_table(ray_session, tiny_corpus, warc_corpus):
    import ray.data

    from pdfextract_ray.pipelines.extract_pipeline import extract_dataset

    via_warc = extract_dataset(read_warc_corpus(warc_corpus)) \
        .to_pandas().sort_values("url").reset_index(drop=True)
    via_table = extract_dataset(ray.data.from_arrow(tiny_corpus.slice(0, 8))) \
        .to_pandas().sort_values("url").reset_index(drop=True)
    assert via_warc["text"].tolist() == via_table["text"].tolist()
    assert via_warc["title"].tolist() == via_table["title"].tolist()


def test_cli_extract_warc(ray_session, warc_corpus, tmp_path, capsys):
    import glob
    import json
    import os

    import pyarrow.parquet as pq

    from pdfextract_ray.__main__ import main
    out = str(tmp_path / "out")
    assert main(["extract", warc_corpus, "--warc", "--out", out]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["ok"] is True
    t = pq.read_table(glob.glob(os.path.join(out, "*.parquet")))
    assert t.num_rows == 8 and "text" in t.schema.names


def test_parse_warc_resyncs_after_corrupt_record(caplog):
    """A corrupt record must skip ITSELF, not silently truncate the
    rest of the segment — the parser resyncs at the next CRLFCRLF+WARC/
    boundary and logs the byte offset (observable truncation)."""
    import logging

    ok1 = _response("http://a/1", b"<p>one</p>")
    bad_clen = (b"WARC/1.0\r\nWARC-Type: response\r\n"
                b"Content-Length: oops\r\n\r\npayload")
    garbage = b"\x00\xffnot a warc header block"
    ok2 = _response("http://b/2", b"<p>two</p>")

    with caplog.at_level(logging.WARNING,
                         logger="pdfextract_ray.sources.readers"):
        got = list(parse_warc_records(
            bad_clen + b"\r\n\r\n" + ok1 + garbage + b"\r\n\r\n" + ok2))
    assert [u for u, _, _ in got] == ["http://a/1", "http://b/2"]
    msgs = [r.message for r in caplog.records]
    assert any("Content-Length" in m for m in msgs)
    assert any("framing" in m for m in msgs)
    assert all("byte" in m for m in msgs)  # offsets observable


def test_parse_warc_truncated_tail_logged(caplog):
    import logging

    ok = _response("http://a/1", b"<p>ok</p>")
    truncated = (b"WARC/1.0\r\nWARC-Type: response\r\n"
                 b"Content-Length: 999\r\n\r\nxx")
    with caplog.at_level(logging.WARNING,
                         logger="pdfextract_ray.sources.readers"):
        got = list(parse_warc_records(ok + truncated))
    assert [u for u, _, _ in got] == ["http://a/1"]
    assert any("truncated tail" in r.message for r in caplog.records)


def test_parse_warc_fuzz_never_raises_and_recovers():
    """Property: for ANY byte junk injected at a record boundary, the
    parser (a) never raises, (b) yields no phantom records, and (c)
    recovers every intact record after the junk whenever the junk
    cannot be mistaken for a record boundary."""
    from hypothesis import given, settings, strategies as st

    urls = ["http://site/%d" % i for i in range(4)]
    recs = [_response(u, ("<p>doc %s</p>" % u).encode()) for u in urls]

    junk = st.binary(min_size=1, max_size=64)
    pos = st.integers(min_value=0, max_value=len(recs))

    @settings(max_examples=200, deadline=None)
    @given(junk=junk, pos=pos)
    def prop(junk, pos):
        buf = b"".join(recs[:pos]) + junk + b"".join(recs[pos:])
        got = [u for u, _, _ in parse_warc_records(buf)]  # must not raise
        assert set(got) <= set(urls)
        # records before the junk are always intact
        assert got[:pos] == urls[:pos]
        # if the junk can't fake or break a boundary, the parser resyncs
        # and recovers every LATER record; the one record the junk is
        # glued onto (its header is corrupted — there is no boundary
        # between junk and it) is correctly sacrificed
        clean = (b"WARC/" not in junk and b"\r\n\r\n" not in junk
                 and not junk.endswith(b"\r\n") and not junk.endswith(b"\r"))
        if clean:
            assert got == urls[:pos] + urls[pos + 1:]

    prop()


def test_parse_warc_skips_non_html_content_type():
    """The module contract says non-HTML payloads are skipped: a
    response record declaring image/jpeg must not become a corpus row;
    text/html, text/plain and no-Content-Type records must."""
    from pdfextract_ray.sources.readers import parse_warc_records

    def rec(url, ctype, body=b"<p>x</p>"):
        http = b"HTTP/1.1 200 OK\r\n"
        if ctype is not None:
            http += b"Content-Type: " + ctype + b"\r\n"
        http += b"\r\n" + body
        head = (b"WARC/1.0\r\nWARC-Type: response\r\n"
                b"WARC-Target-URI: " + url + b"\r\n"
                b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n")
        return head + http + b"\r\n\r\n"

    buf = (rec(b"http://a/", b"text/html; charset=utf-8")
           + rec(b"http://b/", b"image/jpeg", b"\xff\xd8\xff")
           + rec(b"http://c/", b"application/pdf", b"%PDF-1.4")
           + rec(b"http://d/", None)
           + rec(b"http://e/", b"text/plain", b"hello")
           + rec(b"http://f/", b"application/xhtml+xml"))
    urls = [u for u, _, _ in parse_warc_records(buf)]
    assert urls == ["http://a/", "http://d/", "http://e/", "http://f/"]
