"""SoftDeDup weights (stages/assemble.soft_dedup_weights): semantics,
DuckDB window-count parity, forced join tier, CLI."""

import glob
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from pdfextract_ray.stages.assemble import soft_dedup_weights


def _t(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def _run(tbl, **kw):
    return soft_dedup_weights(ray.data.from_arrow(tbl), **kw) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_weights_and_copies(ray_session):
    tbl = _t(["same text", "same text", "same text",
              "unique one", "pair", "pair", None, None])
    out = _run(tbl)
    # NULL text is absent content, not duplicate content: the two
    # None rows are never grouped (n_copies 1, weight 1.0)
    assert list(out["n_copies"]) == [3, 3, 3, 1, 2, 2, 1, 1]
    assert list(out["weight"]) == [1 / 3, 1 / 3, 1 / 3, 1.0,
                                   0.5, 0.5, 1.0, 1.0]
    # total mass: 1 per distinct text + 1 per null row
    assert abs(out["weight"].sum() - 5.0) < 1e-12


def test_null_text_not_grouped_with_empty_string(ray_session):
    """Empty-STRING docs are genuine byte-exact duplicates of each
    other; NULL docs are not grouped with them (or each other) even
    though both hash the same underlying empty bytes."""
    tbl = _t(["", "", None, None, ""])
    out = _run(tbl)
    assert list(out["n_copies"]) == [3, 3, 1, 1, 3]
    assert list(out["weight"]) == [1 / 3, 1 / 3, 1.0, 1.0, 1 / 3]
    # the forced join tier agrees
    j = _run(tbl, max_broadcast=0)
    assert list(j["n_copies"]) == [3, 3, 1, 1, 3]


def test_all_unique_fast_path(ray_session):
    tbl = _t(["a%d" % i for i in range(10)])
    out = _run(tbl)
    assert (out["n_copies"] == 1).all()
    assert (out["weight"] == 1.0).all()


def test_matches_duckdb_window_count(ray_session):
    rng = np.random.RandomState(7)
    texts = ["doc body %d" % rng.randint(40) for _ in range(200)]
    tbl = _t(texts)
    got = _run(tbl)
    con = duckdb.connect()
    con.register("docs", tbl)
    want = con.sql("""
        SELECT doc_id, COUNT(*) OVER (PARTITION BY text) AS n_copies,
               1.0 / COUNT(*) OVER (PARTITION BY text) AS weight
        FROM docs ORDER BY doc_id""").fetchdf()
    assert list(got["n_copies"]) == list(want["n_copies"])
    assert np.allclose(got["weight"], want["weight"])


def test_forced_join_tier_equals_broadcast(ray_session):
    texts = ["dup" if i % 4 == 0 else "u%d" % i for i in range(40)]
    a = _run(_t(texts))
    b = _run(_t(texts), max_broadcast=0)
    assert list(a["n_copies"]) == list(b["n_copies"])
    assert list(a["weight"]) == list(b["weight"])


def test_cli_soft_dedup(ray_session, tmp_path):
    from pdfextract_ray.__main__ import main

    src = str(tmp_path / "docs.parquet")
    pq.write_table(_t(["x", "x", "y"]), src)
    out = str(tmp_path / "w")
    assert main(["soft-dedup", src, "--out", out]) == 0
    t = pq.read_table(glob.glob(os.path.join(out, "*.parquet"))) \
        .sort_by("doc_id")
    assert t.column_names == ["doc_id", "n_copies", "weight"]
    assert t.column("weight").to_pylist() == [0.5, 0.5, 1.0]
