"""PII detection + masking (stages/pii.py): pattern semantics, the
redaction chain, cross-engine (Arrow RE2 vs DuckDB RE2) parity, CLI."""

import glob
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from pdfextract_ray.stages.pii import (EMAIL_RE, EMAIL_TOKEN, IP_TOKEN,
                                       IPV4_RE, PHONE_RE, PHONE_TOKEN,
                                       pii_stats, pii_stats_batch,
                                       redact_batch, redact_pii)


def _t(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_email_pattern_scope():
    t = _t(["a@b.cd", "john.doe+x@mail.example.co.uk", "not@an@email",
            "no at sign", "user@localhost", "a@b.c"])
    n = pii_stats_batch(t)["n_emails"].to_pylist()
    # "not@an@email": "an@email" has no dot-TLD → only 0 matches;
    # "user@localhost" has no TLD dot; "a@b.c" TLD needs 2+ alpha
    assert n == [1, 1, 0, 0, 0, 0]


def test_ipv4_pattern_range_checked():
    t = _t(["10.0.0.1", "255.255.255.255", "999.1.2.3", "256.1.1.1",
            "v1.2.3.4", "1.2.3.4.5"])
    n = pii_stats_batch(t)["n_ips"].to_pylist()
    # 999./256. octets never match; "v1.2.3.4" has no left word
    # boundary; a dotted 5-tuple matches its first four octets ('.'
    # after the 4th IS a word boundary) — documented ambiguity
    assert n == [1, 1, 0, 0, 0, 1]


def test_phone_pattern_requires_separators():
    t = _t(["555-867-5309", "(212) 555 0198", "+1 646.555.1234",
            "4155550198", "12345-678-9012x"])
    n = pii_stats_batch(t)["n_phones"].to_pylist()
    # bare 10-digit runs are ids, not phones (documented scope)
    assert n[:4] == [1, 1, 1, 0]


def test_phone_pattern_never_starts_mid_digit_run():
    # review-found over-match: without a leading boundary the pattern
    # matched '345-678-9012' INSIDE a serial number and masked its tail
    t = _t(["serial 12345-678-9012 intact", "call 1 555-867-5309 ok"])
    out = redact_batch(t)
    assert out["text"].to_pylist()[0] == "serial 12345-678-9012 intact"
    assert out["n_redactions"].to_pylist()[0] == 0
    assert PHONE_TOKEN in out["text"].to_pylist()[1]


def test_redact_masks_and_counts():
    t = _t(["mail a@b.cd from 10.0.0.1 or dial 555-867-5309",
            "clean text", None])
    out = redact_batch(t)
    texts = out["text"].to_pylist()
    assert EMAIL_TOKEN in texts[0] and IP_TOKEN in texts[0] \
        and PHONE_TOKEN in texts[0]
    assert "a@b.cd" not in texts[0] and "10.0.0.1" not in texts[0]
    assert texts[1] == "clean text"
    assert texts[2] is None
    n = out["n_redactions"].to_pylist()
    assert n[0] == 3 and n[1] == 0 and n[2] is None
    # schema: text rewritten in place, other columns preserved
    assert out.column_names == ["doc_id", "text", "n_redactions"]


def test_redacted_text_has_no_remaining_pii():
    t = _t(["a@b.cd 10.0.0.1 555-867-5309 x@y.org (212) 555 0198"])
    out = redact_batch(t)
    assert pii_stats_batch(
        out.select(["doc_id", "text"]))["n_emails"].to_pylist() == [0]
    s = out["text"].to_pylist()[0]
    assert s.count(EMAIL_TOKEN) == 2 and s.count(PHONE_TOKEN) == 2


_PII_SNIPPETS = ["bob@corp.example.com", "192.168.0.17", "555-123-4567",
                 "(415) 555 9876", "+1 212.555.0000", "q@a.io"]


@settings(max_examples=150, deadline=None)
@given(st.lists(
    st.one_of(st.sampled_from(_PII_SNIPPETS),
              st.text(alphabet=st.characters(min_codepoint=32,
                                             max_codepoint=126),
                      max_size=20)),
    max_size=8))
def test_counts_match_duckdb_re2(parts):
    """The SAME pattern strings must count identically in Arrow and
    DuckDB (both RE2) — this is the property the doc_quality oracle's
    hash-exactness rests on."""
    text = " ".join(parts)
    t = _t([text])
    got = pii_stats_batch(t).to_pandas()
    want = duckdb.sql("""
        SELECT CAST(0 AS BIGINT) AS doc_id,
               len(regexp_extract_all('%s', '%s')) AS n_emails,
               len(regexp_extract_all('%s', '%s')) AS n_phones,
               len(regexp_extract_all('%s', '%s')) AS n_ips
    """ % (text.replace("'", "''"), EMAIL_RE,
           text.replace("'", "''"), PHONE_RE,
           text.replace("'", "''"), IPV4_RE)).fetchdf()
    assert got.equals(want), (text, got, want)


def test_dataset_wrappers(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_t(["a@b.cd here", "none"]))
    stats = pii_stats(ds).to_pandas().sort_values("doc_id")
    assert list(stats["n_emails"]) == [1, 0]
    red = redact_pii(ds).to_pandas().sort_values("doc_id")
    assert EMAIL_TOKEN in red["text"].iloc[0]


def test_cli_redact_pii(ray_session, tmp_path):
    from pdfextract_ray.__main__ import main

    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "body": ["write to a@b.cd or 10.1.1.1", "nothing"],
    }), src)
    out = str(tmp_path / "red")
    assert main(["redact-pii", src, "--id-col", "id", "--text-col",
                 "body", "--out", out]) == 0
    t = pq.read_table(glob.glob(os.path.join(out, "*.parquet"))) \
        .sort_by("doc_id")
    assert t.column("n_redactions").to_pylist() == [2, 0]
    assert EMAIL_TOKEN in t.column("text").to_pylist()[0]
    outs = str(tmp_path / "stats")
    assert main(["redact-pii", src, "--id-col", "id", "--text-col",
                 "body", "--stats-only", "--out", outs]) == 0
    s = pq.read_table(glob.glob(os.path.join(outs, "*.parquet"))) \
        .sort_by("doc_id")
    assert s.column_names == ["doc_id", "n_emails", "n_phones", "n_ips"]
    assert s.column("n_emails").to_pylist() == [1, 0]
    assert s.column("n_ips").to_pylist() == [1, 0]
