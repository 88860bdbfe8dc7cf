"""Guards on the driver contract: every oracle parses in DuckDB, every
query is callable, metrics agree with manifests."""

import duckdb
import pytest


def _entry_module():
    import importlib
    import __ray_entry__
    return importlib.reload(__ray_entry__)


def test_oracles_are_valid_sql():
    e = _entry_module()
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql("CREATE VIEW %s AS SELECT * FROM "
                "read_parquet('/root/testdata/sf0.001/%s.parquet')" % (t, t))
    for name, sql in oracles.items():
        con.sql("EXPLAIN " + sql)  # raises on any syntax/binder error


def test_all_queries_are_callables():
    e = _entry_module()
    for name, fn in e.queries().items():
        assert callable(fn), name


def test_metrics_match_manifests(ray_session):
    from pdfextract_ray.pipelines.queries import ensure_extracted, q_extraction_metrics
    from pdfextract_ray.state.manifest import read_manifests

    sf = "/root/testdata/sf0.001"
    out_dir = ensure_extracted(sf)
    metrics = q_extraction_metrics(sf).to_pandas()
    manifests = read_manifests(out_dir)
    per_shard = metrics.groupby("shard")["rows"].sum().to_dict()
    for shard, m in manifests.items():
        assert per_shard.get(shard, 0) == m["rows"], shard
    assert metrics["rows"].sum() == sum(m["rows"] for m in manifests.values())
    assert (metrics["errors"] == 0).all()
