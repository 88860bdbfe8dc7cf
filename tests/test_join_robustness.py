"""Regression tests for the centralized pre-join coalesce helper.

Round-3's one driver failure (`dedup_minhash_verified`) was a Ray 2.49
hash-join crash: chaining two ``Dataset.join``s over a SPARSE input
(~25 rows) with ``num_partitions=16`` makes the first join emit mostly
schema-less EMPTY blocks, which the second join's FieldRef resolution
rejects (``ArrowInvalid: No match or multiple matches for key field
reference``). The fix is `relational.coalesce_for_join` applied at
every derived join input — INCLUDING the join→join boundary. These
tests chain two joins over ≤25-row data at the driver-scale partition
count and assert exact results.
"""

import pyarrow as pa
import pytest


def _sparse_ds(ray, n=25, key="a"):
    # groupby-derived (not a scan), so blocks mimic production lineage:
    # a tiny aggregate scattered over a range-sorted shuffle
    import ray.data
    ds = ray.data.from_arrow(pa.table({
        key: pa.array(list(range(n)), pa.int64()),
        "v": pa.array([i * 10 for i in range(n)], pa.int64()),
    }))
    from ray.data.aggregate import Min
    return ds.groupby(key).aggregate(Min("v", alias_name="v"))


def test_chained_joins_sparse_16_partitions(ray_session):
    """Two chained hash joins, 25 rows, num_partitions=16 (the driver's
    join_partitions() at num_cpus=32) — the exact round-3 crash shape."""
    import ray.data
    from pdfextract_ray.pipelines.relational import coalesce_for_join

    n = 25
    left = coalesce_for_join(_sparse_ds(ray_session, n, "a"))
    dim1 = ray.data.from_arrow(pa.table({
        "a_key": pa.array(list(range(n)), pa.int64()),
        "name1": pa.array([f"x{i}" for i in range(n)], pa.string()),
    }))
    j1 = left.join(dim1, join_type="inner", num_partitions=16,
                   on=("a",), right_on=("a_key",))
    # the join→join boundary: without coalesce_for_join here Ray 2.49
    # crashes with "No match ... for key field reference" (round 3)
    j1 = coalesce_for_join(j1)
    dim2 = ray.data.from_arrow(pa.table({
        "b_key": pa.array(list(range(n)), pa.int64()),
        "name2": pa.array([f"y{i}" for i in range(n)], pa.string()),
    }))
    j2 = j1.join(dim2, join_type="inner", num_partitions=16,
                 on=("a",), right_on=("b_key",))
    out = j2.to_pandas().sort_values("a").reset_index(drop=True)
    assert len(out) == n
    assert out["name1"].tolist() == [f"x{i}" for i in range(n)]
    assert out["name2"].tolist() == [f"y{i}" for i in range(n)]
    assert out["v"].tolist() == [i * 10 for i in range(n)]


def test_left_anti_sparse_right(ray_session):
    """left_anti with a nearly-empty coalesced right side (the
    curate_corpus_neardup shape)."""
    import ray.data
    from pdfextract_ray.pipelines.relational import coalesce_for_join

    left = coalesce_for_join(_sparse_ds(ray_session, 20, "doc_id"), n=8)
    right = coalesce_for_join(ray.data.from_arrow(pa.table({
        "drop_id": pa.array([3, 7], pa.int64())})))
    out = left.join(right, join_type="left_anti", num_partitions=16,
                    on=("doc_id",), right_on=("drop_id",)).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [i for i in range(20)
                                              if i not in (3, 7)]


def test_coalesce_handles_rows_fewer_than_n(ray_session):
    """repartition(n) with rows < n yields schema-ful empties that the
    join must accept (the helper's guarantee)."""
    import ray.data
    from pdfextract_ray.pipelines.relational import coalesce_for_join

    tiny = coalesce_for_join(_sparse_ds(ray_session, 3, "a"), n=8)
    dim = ray.data.from_arrow(pa.table({
        "a_key": pa.array([0, 1, 2], pa.int64()),
        "nm": pa.array(["p", "q", "r"], pa.string()),
    }))
    out = tiny.join(dim, join_type="inner", num_partitions=16,
                    on=("a",), right_on=("a_key",)).to_pandas()
    assert sorted(out["nm"].tolist()) == ["p", "q", "r"]
