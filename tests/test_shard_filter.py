"""shuffle-export (deterministic training shards) + filter (predicate
pushdown export) — library and CLI."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from pdfextract_ray.stages.shard import assign_shards, mix64, shuffle_export


def test_mix64_bijective_and_uniform():
    ids = np.arange(50_000, dtype=np.uint64)
    h = mix64(ids, seed=7)
    # bijection on the sampled domain: no collisions
    assert len(np.unique(h)) == len(ids)
    # shard balance: 8 shards over 50k ids, every shard within 5% of
    # expected (binomial std here is ~0.4%, so 5% is ~12 sigma)
    counts = np.bincount((h % np.uint64(8)).astype(int), minlength=8)
    assert counts.min() > 50_000 / 8 * 0.95
    assert counts.max() < 50_000 / 8 * 1.05
    # seed changes the permutation
    h2 = mix64(ids, seed=8)
    assert (h != h2).mean() > 0.99


def test_mix64_negative_ids_ok():
    ids = np.array([-1, -2**62, 0, 2**62], dtype=np.int64).view(np.uint64)
    h = mix64(ids, seed=3)
    assert len(np.unique(h)) == 4


def _docs_table(n=3000, seed=0):
    rng = np.random.RandomState(seed)
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "lang": pa.array(rng.choice(["en", "de", "fr"], n, p=[.6, .3, .1]),
                         pa.string()),
        "n_tokens": pa.array(rng.randint(10, 500, n), pa.int64()),
    })


def test_assign_shards_deterministic_and_balanced(ray_session):
    import ray.data

    tbl = _docs_table()
    ds = ray.data.from_arrow(tbl)
    out1 = assign_shards(ds, 6, seed=42).to_pandas().sort_values("doc_id")
    out2 = assign_shards(ray.data.from_arrow(tbl), 6, seed=42) \
        .to_pandas().sort_values("doc_id")
    assert (out1.shard.values == out2.shard.values).all()
    assert (out1.order_key.values == out2.order_key.values).all()
    assert out1.shard.between(0, 5).all()
    counts = out1.shard.value_counts()
    assert counts.min() > 3000 / 6 * 0.8 and counts.max() < 3000 / 6 * 1.2
    # a different seed moves most rows
    out3 = assign_shards(ray.data.from_arrow(tbl), 6, seed=43).to_pandas() \
        .sort_values("doc_id")
    assert (out1.shard.values != out3.shard.values).mean() > 0.5
    # order_key is a total order (bijective hash, distinct ids)
    assert out1.order_key.is_unique


def test_assign_shards_null_id_raises(ray_session):
    import ray.data

    tbl = pa.table({"doc_id": pa.array([1, None], pa.int64())})
    with pytest.raises(Exception, match="null"):
        assign_shards(ray.data.from_arrow(tbl), 2, seed=0).materialize()


def test_assign_shards_rejects_existing_assignment(ray_session):
    import ray.data

    tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "shard": pa.array([0, 0], pa.int32())})
    with pytest.raises(Exception, match="already has"):
        assign_shards(ray.data.from_arrow(tbl), 2, seed=0).materialize()


def test_cli_shuffle_export_rejects_reexport(ray_session, tmp_path):
    """Re-exporting a previous export's output (it carries order_key)
    must be an argparse error, not silent duplicate columns."""
    from pdfextract_ray.__main__ import main

    src = str(tmp_path / "docs.parquet")
    pq.write_table(_docs_table(50), src)
    out = str(tmp_path / "out")
    assert main(["shuffle-export", src, "--out", out, "--shards", "2"]) == 0
    with pytest.raises(SystemExit):
        main(["shuffle-export", out, "--out", str(tmp_path / "again"),
              "--shards", "4"])
    with pytest.raises(SystemExit):
        main(["shuffle-export", out, "--out", str(tmp_path / "again"),
              "--shards", "4", "--columns", "lang,order_key"])
    # excluding the stale assignment columns via --columns works
    assert main(["shuffle-export", out, "--out",
                 str(tmp_path / "again"), "--shards", "4",
                 "--columns", "lang"]) == 0


def test_cli_shuffle_export_empty_input_schema(ray_session, tmp_path):
    """The empty-export fallback file carries the SAME schema a hive
    read of a non-empty export produces (incl. the shard key)."""
    from pdfextract_ray.__main__ import main

    src = str(tmp_path / "docs.parquet")
    pq.write_table(_docs_table(0), src)
    out = str(tmp_path / "out")
    assert main(["shuffle-export", src, "--out", out,
                 "--shards", "3"]) == 0
    back = pads.dataset(out).to_table()
    assert back.num_rows == 0
    assert sorted(back.column_names) == ["doc_id", "lang", "n_tokens",
                                         "order_key", "shard"]


def test_shuffle_export_layout_and_roundtrip(ray_session, tmp_path):
    import ray.data

    tbl = _docs_table(800)
    out = str(tmp_path / "shards")
    shuffle_export(ray.data.from_arrow(tbl), out, 4, seed=9)
    dirs = sorted(os.listdir(out))
    assert dirs == ["shard=0", "shard=1", "shard=2", "shard=3"]
    back = pads.dataset(out, partitioning="hive").to_table()
    df = back.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(df) == 800 and df.doc_id.is_unique
    assert sorted(df.doc_id) == list(range(800))
    # membership matches a fresh assignment (rerun reproducibility)
    fresh = assign_shards(ray.data.from_arrow(tbl), 4, seed=9).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert (df.shard.astype(int).values == fresh.shard.values).all()


def test_cli_shuffle_export(ray_session, tmp_path):
    from pdfextract_ray.__main__ import main

    src = str(tmp_path / "docs.parquet")
    pq.write_table(_docs_table(500), src)
    out = str(tmp_path / "out")
    assert main(["shuffle-export", src, "--out", out, "--shards", "3",
                 "--seed", "5", "--columns", "lang"]) == 0
    back = pads.dataset(out, partitioning="hive").to_table()
    assert sorted(back.column_names) == ["doc_id", "lang", "order_key",
                                         "shard"]
    assert back.num_rows == 500
    # same seed → identical membership on rerun
    out2 = str(tmp_path / "out2")
    assert main(["shuffle-export", src, "--out", out2, "--shards", "3",
                 "--seed", "5", "--columns", "lang"]) == 0
    a = back.to_pandas().sort_values("doc_id")
    b = pads.dataset(out2, partitioning="hive").to_table().to_pandas() \
        .sort_values("doc_id")
    assert (a.shard.astype(int).values == b.shard.astype(int).values).all()


# ---------------------------------------------------------------- filter

def test_parse_predicate_ops():
    import pyarrow.compute as pc

    from pdfextract_ray.stages.filters import parse_predicate

    tbl = pa.table({
        "lang": pa.array(["en", "de", None, "fr", "en"]),
        "n": pa.array([5, 10, 15, 20, 25], pa.int64()),
        "ok": pa.array([True, False, True, None, False]),
    })
    cases = {
        "lang == 'en'": [0, 4],
        "lang != 'en'": [1, 3],
        "n >= 15 and lang is not null": [3, 4],
        "lang is null": [2],
        "lang in ('de', 'fr')": [1, 3],
        "lang not in ('de', 'fr') and n < 25": [0],
        "not (n < 15 or n > 20)": [2, 3],
        "ok == true": [0, 2],
        "n > 7 or lang == 'en'": [0, 1, 2, 3, 4],
    }
    for where, expect in cases.items():
        expr, used = parse_predicate(where)
        got = tbl.filter(expr)["n"].to_pylist()
        assert got == [tbl["n"][i].as_py() for i in expect], where
    _, used = parse_predicate("lang == 'en' and n < 3")
    assert used == ["lang", "n"]


def test_parse_predicate_matches():
    from pdfextract_ray.stages.filters import (PredicateError,
                                               parse_predicate)

    tbl = pa.table({
        "url": pa.array(["http://a.com/tag/x", "http://b.com/page",
                         None, "http://c.com/search?q=1"]),
        "n": pa.array([0, 1, 2, 3], pa.int64()),
    })
    cases = {
        r"url matches '/tag/'": [0],
        r"url matches '/tag/|/search\?'": [0, 3],
        # NULL matches neither polarity (nulls drop both ways)
        r"url not matches '/tag/'": [1, 3],
        r"url matches 'TAG'": [],
        r"not (url matches '/tag/')": [1, 3],
    }
    for where, expect in cases.items():
        expr, _ = parse_predicate(where)
        assert tbl.filter(expr)["n"].to_pylist() == expect, where
    # a bad pattern is a parse-time error, not a scan-task failure
    with pytest.raises(PredicateError, match="invalid regex"):
        parse_predicate("url matches '('")
    with pytest.raises(PredicateError, match="quoted regex"):
        parse_predicate("url matches 5")


def test_matches_backslashes_reach_re2_raw():
    """Review-found: the general string unescape turned '\\.pdf' into
    '.pdf' (which matches 'xpdf'); regex literals keep backslashes."""
    from pdfextract_ray.stages.filters import parse_predicate

    tbl = pa.table({
        "url": pa.array(["report.pdf", "xpdf", "file9", "filez"]),
        "n": pa.array([0, 1, 2, 3], pa.int64()),
    })
    cases = {
        r"url matches '\.pdf'": [0],        # escaped dot is literal
        r"url matches 'file\d'": [2],       # \d is a digit class
        r"url matches 'file[9z]'": [2, 3],
    }
    for where, expect in cases.items():
        expr, _ = parse_predicate(where)
        assert tbl.filter(expr)["n"].to_pylist() == expect, where


def test_column_named_matches_still_usable():
    from pdfextract_ray.stages.filters import parse_predicate

    tbl = pa.table({"matches": pa.array([True, False, True]),
                    "n": pa.array([0, 1, 2], pa.int64())})
    expr, used = parse_predicate("matches == true")
    assert tbl.filter(expr)["n"].to_pylist() == [0, 2]
    assert used == ["matches"]


def test_filter_read_matches_type_check(ray_session, tmp_path):
    from pdfextract_ray.stages.filters import PredicateError, filter_read

    src = str(tmp_path / "docs.parquet")
    pq.write_table(_docs_table(20), src)
    # regex on an int column is a clean CLI-level error, not an
    # ArrowNotImplementedError from inside a scan task
    with pytest.raises(PredicateError, match="string column"):
        filter_read(src, "doc_id matches '1'")
    assert filter_read(src, "lang matches '^e'").count() > 0


def test_cli_filter_matches_regex_duckdb_parity(ray_session, tmp_path):
    import duckdb

    from pdfextract_ray.__main__ import main

    n = 300
    urls = ["http://site%d.com/%s" % (i, ["page", "tag/x", "search?q=1"]
            [i % 3]) for i in range(n)]
    tbl = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                    "url": pa.array(urls, pa.string())})
    src = str(tmp_path / "docs.parquet")
    pq.write_table(tbl, src)
    out = str(tmp_path / "kept")
    assert main(["filter", src, "--where",
                 r"url not matches '/tag/|/search\?'",
                 "--out", out]) == 0
    got = sorted(pads.dataset(out).to_table()["doc_id"].to_pylist())
    want = sorted(duckdb.sql(
        r"SELECT doc_id FROM read_parquet('%s') "
        r"WHERE NOT regexp_matches(url, '/tag/|/search\?')" % src
    ).fetchdf()["doc_id"])
    assert got == list(want)


def test_parse_predicate_errors():
    from pdfextract_ray.stages.filters import PredicateError, parse_predicate

    for bad in ["lang ==", "== 'en'", "lang = 'en'", "lang == 'en' extra",
                "lang in ()", "(lang == 'en'", "lang is 'en'",
                "lang @ 3", ""]:
        with pytest.raises(PredicateError):
            parse_predicate(bad)


def test_parse_predicate_fuzz_total():
    """The parser's only failure mode is PredicateError — arbitrary
    input never escapes as a KeyError/IndexError/etc."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pdfextract_ray.stages.filters import PredicateError, parse_predicate

    @given(st.text(
        alphabet=st.sampled_from(list("abn_ ()'\",.<>=!0123456789"
                                      "andorinotisnull")), max_size=40))
    @settings(max_examples=300, deadline=None)
    def run(s):
        try:
            parse_predicate(s)
        except PredicateError:
            pass

    run()


def test_filter_read_validates_columns(ray_session, tmp_path):
    from pdfextract_ray.stages.filters import PredicateError, filter_read

    src = str(tmp_path / "docs.parquet")
    pq.write_table(_docs_table(50), src)
    with pytest.raises(PredicateError, match="nope"):
        filter_read(src, "nope == 1")
    with pytest.raises(PredicateError, match="projection"):
        filter_read(src, "n_tokens > 1", columns=["missing"])


def test_cli_filter_matches_duckdb(ray_session, tmp_path):
    import duckdb

    from pdfextract_ray.__main__ import main

    src = str(tmp_path / "docs.parquet")
    pq.write_table(_docs_table(2000), src)
    out = str(tmp_path / "filtered")
    where = "lang == 'en' and n_tokens >= 100 and n_tokens < 400"
    assert main(["filter", src, "--where", where,
                 "--columns", "doc_id,n_tokens", "--out", out]) == 0
    got = pq.read_table(glob.glob(os.path.join(out, "*.parquet"))) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = duckdb.sql(
        "SELECT doc_id, n_tokens FROM read_parquet('%s') WHERE lang = 'en' "
        "AND n_tokens >= 100 AND n_tokens < 400 ORDER BY doc_id" % src
    ).df()
    assert got.columns.tolist() == ["doc_id", "n_tokens"]
    assert (got.values == want.values).all()


def test_cli_filter_empty_result_writes_schema(ray_session, tmp_path):
    from pdfextract_ray.__main__ import main

    src = str(tmp_path / "docs.parquet")
    pq.write_table(_docs_table(100), src)
    out = str(tmp_path / "empty")
    assert main(["filter", src, "--where", "n_tokens > 1000000",
                 "--out", out]) == 0
    back = pads.dataset(out).to_table()
    assert back.num_rows == 0
    assert sorted(back.column_names) == ["doc_id", "lang", "n_tokens"]
