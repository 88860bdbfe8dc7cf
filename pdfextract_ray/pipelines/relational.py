"""Relational pipelines over the TPC-H-ish testdata tables.

These exercise the engine's distributed aggregate / join / top-k /
window shapes with exact DuckDB oracles (see pipelines/queries.py).
Pattern used throughout (ray_guide "Aggregation at scale"):

- **partial pre-aggregation** inside ``map_batches`` (one row per key
  per batch) before the ``groupby`` — the shuffle moves partials, not
  rows;
- **broadcast joins** for small dimension tables — ``ray.put`` once,
  dict lookup per batch — instead of an all-to-all shuffle join;
- float aggregate outputs grid-snapped (see :func:`grid_round`) because
  summation order differs between engines.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Max, Sum


SCALE = 10000.0


def to_ticks(col):
    """Per-ROW exact integerization: every money/value column in the
    testdata is exact at 4 decimals, so round(x*1e4) recovers the true
    integer tick count from the same double in ANY engine — and int64
    sums are order-independent and bit-exact. (Rounding the float SUM
    instead is not robust: cross-engine summation noise grows with
    n·|sum|·eps and overwhelms any fixed grid for billion-scale totals.)
    SQL equivalent: ``SUM(CAST(round(x * 10000, 0) AS BIGINT))``."""
    return pc.cast(pc.round(pc.multiply(col, pa.scalar(SCALE))), pa.int64())


def from_ticks(col):
    return pc.divide(pc.cast(col, pa.float64()), pa.scalar(SCALE))


def grid_round(col, scale: float = 10000.0):
    """Snap a SINGLE float value (no cross-engine summation involved) to
    a 1/scale grid; see to_ticks for aggregates."""
    return pc.divide(pc.round(pc.multiply(col, pa.scalar(scale))), pa.scalar(scale))


def _pq(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, name + ".parquet")


def _read(sf_dir: str, name: str, columns=None, **kw):
    """Pruned driver-table read with hashable (metadata-free) schemas:
    the driver parquet embeds b'pandas' schema metadata and
    pa.Schema.__hash__ raises on any metadata, so Ray's unify_schemas
    would warn per-worker in every all-to-all over such blocks; the
    schema= override (one local footer read) strips it at the source."""
    import pyarrow.parquet as pq
    path = _pq(sf_dir, name)
    schema = pq.read_schema(path).remove_metadata()
    if columns is not None:  # prune to match the scanner's batches
        schema = pa.schema([schema.field(c) for c in columns])
    return ray.data.read_parquet(path, schema=schema, columns=columns, **kw)


def join_partitions() -> int:
    """Hash-join partition count derived from cluster size (same class
    of knob as the label-propagation shard mask): one partition per two
    cores, floor 8 — a fixed count would serialize the build/probe at
    cluster scale."""
    ncpu = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    return max(8, ncpu // 2)


def coalesce_for_join(ds: "ray.data.Dataset", n: int | None = None
                      ) -> "ray.data.Dataset":
    """Normalize a DERIVED dataset (groupby / map_groups / join output)
    immediately before it feeds a ``Dataset.join`` input.

    Ray 2.49's hash-join operator crashes with ``ArrowInvalid: No match
    or multiple matches for key field reference FieldRef.Name(..)``
    when an input contains SCHEMA-LESS empty blocks — which sparse
    upstreams routinely emit: a groupby's range sort over tiny data, or
    a previous join whose hash partitions (``join_partitions()`` >>
    rows) were mostly empty. It also logs per-worker "Failed to hash
    the schemas" warnings when block schemas carry unhashable
    ``b'pandas'`` metadata. This helper fixes both: strip the metadata,
    then ``repartition(n)`` (even row split — every output block keeps
    a schema, empty or not) and materialize so the join sees a small,
    schema-ful block list.

    Apply this to EVERY derived input of EVERY ``Dataset.join``,
    INCLUDING join→join chains (round 3's one driver crash was exactly
    a missed join-to-join boundary). Direct parquet scans are exempt —
    scanner blocks always carry the file schema.

    ``n`` defaults to ``max(2, join_partitions() // 4)``: a handful of
    blocks at test scale, cluster-proportional on a real cluster so a
    large residue side is not serialized through two blocks.
    """
    if n is None:
        n = max(2, join_partitions() // 4)
    return ds.map_batches(strip_schema_metadata, batch_size=None,
                          batch_format="pyarrow").repartition(n).materialize()


def anti_filter(docs, drops, key: str,
                max_broadcast: int = 2_000_000):
    """Remove from ``docs`` every row whose ``key`` value appears in
    the single-column drop-list dataset ``drops`` — the shared two-tier
    applier every removal op uses (url dedup, domain caps, span/para
    drop-sets):

    - **broadcast tier** (drop list fits ``max_broadcast`` rows): the
      values are ``ray.put`` ONCE and each payload batch filters with
      ``pc.is_in`` — no join operator, no corpus repartition, the
      payload never shuffles;
    - **distributed tier** (beyond the bound — at web scale a drop set
      can be 20-50% of the corpus): a hash-partitioned ``left_anti``
      join on ``key``; only the DERIVED drop side gets
      :func:`coalesce_for_join` (coalescing the payload would
      materialize the whole corpus — scanner-backed blocks always
      carry a schema).

    NULL ``key`` cells never match a drop value (``pc.is_in`` yields
    false for null against a null-free value set), so null-keyed rows
    always survive — the same contract at both tiers."""
    drops = drops.materialize()
    n = drops.count()
    if n == 0:
        return docs
    if n <= max_broadcast:
        sch = drops.schema()
        typ = dict(zip(sch.names, sch.types))[key]
        if not isinstance(typ, pa.DataType):
            typ = None  # pandas-block schema (numpy dtype): let
            # Arrow infer from the values (int64 / string in practice)
        dropped = drops.to_pandas()
        # Ray 2.49: to_pandas on an all-empty dataset drops the
        # columns (n > 0 here, but a renamed/projected upstream can
        # still surprise — fail loud rather than silently keep all)
        vals = pa.array(sorted(dropped[key].tolist()), type=typ)
        drop_ref = ray.put(vals)

        def keep_batch(t: pa.Table) -> pa.Table:
            return t.filter(pc.invert(
                pc.is_in(t[key], value_set=ray.get(drop_ref))))

        return docs.map_batches(keep_batch, batch_format="pyarrow")
    return docs.join(
        coalesce_for_join(drops), join_type="left_anti",
        on=(key,), num_partitions=join_partitions())


def strip_schema_metadata(t: pa.Table) -> pa.Table:
    """Drop table-level schema metadata (batch fn for map_batches).

    ``pyarrow.Schema.__hash__`` raises on ANY metadata (unhashable
    dict) — Ray's ``unify_schemas`` then falls back with a per-worker
    "Failed to hash the schemas" warning, and hash joins reject the
    blocks. Pandas-origin blocks re-attach ``b'pandas'`` metadata, so
    re-normalize right before any groupby/join over them. (The single
    shared copy of this helper — queries.py imports it.)"""
    return t.replace_schema_metadata(None)



def q1_pricing(sf_dir: str) -> "ray.data.Dataset":
    """TPC-H Q1 shape: grouped pricing summary over lineitem."""
    ds = _read(sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"],
    )
    cutoff = pa.scalar(__import__("datetime").datetime(1998, 9, 2))

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        disc_price = pc.multiply(t["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0), t["l_discount"]))
        g = pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "qty": to_ticks(t["l_quantity"]),
            "base": to_ticks(t["l_extendedprice"]),
            "disc_price": to_ticks(disc_price),
            "n": pa.array([1] * t.num_rows, pa.int64()),
        })
        return (g.group_by(["l_returnflag", "l_linestatus"])
                 .aggregate([("qty", "sum"), ("base", "sum"),
                             ("disc_price", "sum"), ("n", "sum")])
                 .rename_columns(["l_returnflag", "l_linestatus",
                                  "qty", "base", "disc_price", "n"]))

    # coalesce tiny partials before the groupby (see orders_by_status)
    partials = ds.map_batches(partial, batch_format="pyarrow").repartition(2)
    rolled = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("qty", alias_name="sum_qty"),
        Sum("base", alias_name="sum_base_price"),
        Sum("disc_price", alias_name="sum_disc_price"),
        Sum("n", alias_name="count_order"),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "sum_qty": from_ticks(t["sum_qty"]),
            "sum_base_price": from_ticks(t["sum_base_price"]),
            "sum_disc_price": from_ticks(t["sum_disc_price"]),
            "count_order": t["count_order"],
        })

    return rolled.map_batches(finish, batch_format="pyarrow")


def nation_revenue(sf_dir: str) -> "ray.data.Dataset":
    """orders ⋈ customer ⋈ nation → revenue by nation.

    customer is NOT a dimension (it scales with SF — tens of millions
    of rows at 100×), so it is hash-joined, never broadcast: orders
    pre-aggregate per custkey inside map_batches, the per-customer
    partials join customer on the hash-partitioned ``Dataset.join``,
    and only the 25-row nation table is broadcast for the final
    nationkey → name projection."""
    import pyarrow.parquet as pq

    nat = pq.read_table(_pq(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    # true dimension (fixed 25 rows): broadcast ONCE as key/name arrays
    # for a vectorized pc.index_in + take projection per batch
    nat_ref = ray.put((nat["n_nationkey"].combine_chunks(),
                       nat["n_name"].combine_chunks()))

    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({
            "o_custkey": t["o_custkey"],
            "revenue": to_ticks(t["o_totalprice"]),
            "n": pa.array([1] * t.num_rows, pa.int64()),
        })
        return (g.group_by("o_custkey")
                 .aggregate([("revenue", "sum"), ("n", "sum")])
                 .rename_columns(["o_custkey", "revenue", "n"]))

    per_cust = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("o_custkey").aggregate(
            Sum("revenue", alias_name="revenue"), Sum("n", alias_name="n"))

    customer = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    # per_cust is groupby-derived → pre-join coalesce (customer is a
    # direct scan: exempt, scanner blocks always carry schemas)
    joined = coalesce_for_join(per_cust, n=join_partitions()).join(
        customer, join_type="inner", num_partitions=join_partitions(),
        on=("o_custkey",), right_on=("c_custkey",))

    def to_nation(t: pa.Table, _ref=nat_ref) -> pa.Table:
        keys, names = ray.get(_ref)
        pos = pc.index_in(t["c_nationkey"], value_set=keys)
        g = pa.table({
            "n_name": names.take(pos),
            "revenue": t["revenue"],
            "n": t["n"],
        })
        return (g.group_by("n_name")
                 .aggregate([("revenue", "sum"), ("n", "sum")])
                 .rename_columns(["n_name", "revenue", "n"]))

    rolled = joined.map_batches(to_nation, batch_format="pyarrow") \
               .repartition(2) \
               .groupby("n_name").aggregate(
                   Sum("revenue", alias_name="revenue"),
                   Sum("n", alias_name="n_orders"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": t["n_name"],
            "revenue": from_ticks(t["revenue"]),
            "n_orders": t["n_orders"],
        })

    return rolled.map_batches(finish, batch_format="pyarrow")


def top_docs(sf_dir: str, k: int = 20) -> "ray.data.Dataset":
    """Top-k by n_chars (deterministic tie-break on doc_id)."""
    ds = _read(sf_dir, "documents",
               columns=["doc_id", "n_chars", "source"])
    # per-block partial top-k, then global sort+limit on the residue
    def partial_topk(t: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(t, k,
                                   [("n_chars", "descending"), ("doc_id", "ascending")])
        return t.take(idx)

    return (ds.map_batches(partial_topk, batch_format="pyarrow")
              .sort(["n_chars", "doc_id"], descending=[True, False])
              .limit(k))


def events_hourly(sf_dir: str) -> "ray.data.Dataset":
    """Tumbling 1-hour window per event_type: count + value sum."""
    ds = _read(sf_dir, "events",
               columns=["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        g = pa.table({
            "event_type": t["event_type"],
            "hour": hour,
            "value": to_ticks(t["value"]),
            "n": pa.array([1] * t.num_rows, pa.int64()),
        })
        return (g.group_by(["event_type", "hour"])
                 .aggregate([("value", "sum"), ("n", "sum")])
                 .rename_columns(["event_type", "hour", "value", "n"]))

    rolled = ds.map_batches(partial, batch_format="pyarrow") \
               .repartition(2) \
               .groupby(["event_type", "hour"]).aggregate(
                   Sum("value", alias_name="sum_value"),
                   Sum("n", alias_name="n_events"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "hour": t["hour"],
            "sum_value": from_ticks(t["sum_value"]),
            "n_events": t["n_events"],
        })

    return rolled.map_batches(finish, batch_format="pyarrow")


def events_sessionize(sf_dir: str, gap_minutes: int = 30) -> "ray.data.Dataset":
    """Session windows per user (30-min inactivity gap): the
    streaming-shaped operator expressed as a keyed groupby —
    ``groupby(user_id).map_groups`` over ts-sorted groups (ray_guide
    "Streaming-shaped workloads"). Oracle: SQL gap-and-island with
    lag() + a cumulative sum.

    Output: (user_id, session_start, n_events, sum_value) — one row per
    session. Ordering assumption: none across rows; ts sorting happens
    inside each group.
    """
    import pandas as pd

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "value"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        g = g.assign(ticks=(g["value"] * 10000.0).round().astype("int64"))
        new_session = (g["ts"].diff() > gap).cumsum()
        out = g.groupby(new_session).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "first"),
            n_events=("ts", "size"),
            sum_value=("ticks", "sum"),
        ).reset_index(drop=True)
        out["n_events"] = out["n_events"].astype("int64")
        out["sum_value"] = out["sum_value"] / 10000.0
        return out

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


def part_brand_stats(sf_dir: str) -> "ray.data.Dataset":
    """Grouped avg/min/max with deterministic cross-engine floats."""
    from ray.data.aggregate import Max, Min, Sum
    ds = _read(sf_dir, "part",
               columns=["p_brand", "p_retailprice", "p_size"])
    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({"p_brand": t["p_brand"],
                      "price_ticks": to_ticks(t["p_retailprice"]),
                      "p_size": t["p_size"],
                      "n": pa.array([1] * t.num_rows, pa.int64())})
        return (g.group_by("p_brand")
                 .aggregate([("n", "sum"), ("price_ticks", "sum"),
                             ("p_size", "min"), ("p_size", "max")])
                 .rename_columns(["p_brand", "n", "price_ticks",
                                  "size_min", "size_max"]))

    # partial pre-agg per batch; coalesce tiny partials (see orders_by_status)
    rolled = ds.map_batches(partial, batch_format="pyarrow") \
        .repartition(2) \
        .groupby("p_brand").aggregate(
            Sum("n", alias_name="n_parts"),
            Sum("price_ticks", alias_name="price_sum"),
            Min("size_min", alias_name="min_size"),
            Max("size_max", alias_name="max_size"),
    )

    def finish(t: pa.Table) -> pa.Table:
        avg = pc.divide(pc.cast(t["price_sum"], pa.float64()),
                        pc.multiply(pc.cast(t["n_parts"], pa.float64()),
                                    pa.scalar(SCALE)))
        return pa.table({
            "p_brand": t["p_brand"],
            "n_parts": t["n_parts"],
            "avg_price": avg,
            "min_size": t["min_size"],
            "max_size": t["max_size"],
        })

    return rolled.map_batches(finish, batch_format="pyarrow")


def distinct_event_types(sf_dir: str) -> "ray.data.Dataset":
    """Distinct values (Dataset.unique shape, kept as sorted rows).
    Partial per-batch counts shuffle one row per type per batch instead
    of every event row."""
    ds = _read(sf_dir, "events", columns=["event_type"])
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({"event_type": t["event_type"],
                      "n": pa.array([1] * t.num_rows, pa.int64())})
        return g.group_by("event_type").aggregate([("n", "sum")]) \
                .rename_columns(["event_type", "n"])

    return ds.map_batches(partial, batch_format="pyarrow") \
        .repartition(2) \
        .groupby("event_type").aggregate(Sum("n", alias_name="n"))


def order_lineitem_join(sf_dir: str) -> "ray.data.Dataset":
    """Large ⋈ large: per-order revenue. The small side is REDUCED before
    the join (partial pre-agg of lineitem per orderkey inside
    map_batches, then a groupby over partials), so the hash join
    (``Dataset.join``, hash-partitioned) moves one row per order per
    side instead of every lineitem. Portable fallback at scale: bucket
    both sides by hash(key) % B and join per bucket in map_groups
    (ray_guide "Joins and lookups")."""
    from ray.data.aggregate import Sum

    items = _read(sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        g = pa.table({"l_orderkey": t["l_orderkey"], "rev": to_ticks(rev),
                      "n": pa.array([1] * t.num_rows, pa.int64())})
        return (g.group_by("l_orderkey")
                 .aggregate([("rev", "sum"), ("n", "sum")])
                 .rename_columns(["l_orderkey", "rev", "n"]))

    per_order = items.map_batches(partial, batch_format="pyarrow") \
        .groupby("l_orderkey").aggregate(
            Sum("rev", alias_name="revenue"), Sum("n", alias_name="n_items"))

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderstatus"])
    joined = orders.join(coalesce_for_join(per_order, n=join_partitions()),
                         join_type="inner", num_partitions=join_partitions(),
                         on=("o_orderkey",), right_on=("l_orderkey",))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_orderstatus": t["o_orderstatus"],
            "n_items": t["n_items"],
            "revenue": from_ticks(t["revenue"]),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


def doc_length_histogram(sf_dir: str, bucket: int = 50) -> "ray.data.Dataset":
    """Histogram of document lengths (bucketed count — the profile/
    histogram aggregate shape, partial pre-agg per batch)."""
    from ray.data.aggregate import Sum
    ds = _read(sf_dir, "documents", columns=["n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        b = pc.multiply(pc.floor(pc.divide(pc.cast(t["n_chars"], pa.float64()),
                                           pa.scalar(float(bucket)))),
                        pa.scalar(float(bucket)))
        g = pa.table({"bucket": pc.cast(b, pa.int64()),
                      "n": pa.array([1] * t.num_rows, pa.int64())})
        return g.group_by("bucket").aggregate([("n", "sum")]) \
                .rename_columns(["bucket", "n"])

    return ds.map_batches(partial, batch_format="pyarrow") \
        .repartition(2) \
        .groupby("bucket").aggregate(Sum("n", alias_name="n_docs"))


def sample_docs(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic 1-in-8 (12.5%) sample (hash-bucket filter —
    reproducible across runs and partitionings, unlike RNG sampling;
    SQL-matched: ``doc_id & 7 = 0``)."""
    ds = _read(sf_dir, "documents",
               columns=["doc_id", "lang", "n_chars"])

    def pick(t: pa.Table) -> pa.Table:
        keep = pc.equal(pc.bit_wise_and(t["doc_id"], pa.scalar(7, pa.int64())),
                        pa.scalar(0, pa.int64()))
        return t.filter(keep)

    return ds.map_batches(pick, batch_format="pyarrow")


def union_extremes(sf_dir: str) -> "ray.data.Dataset":
    """Union of two filtered streams (shortest + longest docs)."""
    cols = ["doc_id", "n_chars"]
    a = _read(sf_dir, "documents", columns=cols) \
        .map_batches(lambda t: t.filter(pc.less(t["n_chars"], 150)),
                     batch_format="pyarrow")
    b = _read(sf_dir, "documents", columns=cols) \
        .map_batches(lambda t: t.filter(pc.greater(t["n_chars"], 450)),
                     batch_format="pyarrow")
    return a.union(b)


def orders_by_status(sf_dir: str) -> "ray.data.Dataset":
    ds = _read(sf_dir, "orders",
               columns=["o_orderstatus", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({"o_orderstatus": t["o_orderstatus"],
                      "total_ticks": to_ticks(t["o_totalprice"]),
                      "o_totalprice": t["o_totalprice"],
                      "n": pa.array([1] * t.num_rows, pa.int64())})
        return (g.group_by("o_orderstatus")
                 .aggregate([("n", "sum"), ("total_ticks", "sum"),
                             ("o_totalprice", "max")])
                 .rename_columns(["o_orderstatus", "n", "total_ticks",
                                  "o_totalprice"]))

    # partial pre-agg (one row per status per batch), then coalesce the
    # tiny partial set so the final groupby's range partitions aren't
    # mostly empty (empty blocks lose their schema — Ray 2.49 warning)
    rolled = ds.map_batches(partial, batch_format="pyarrow") \
        .repartition(2) \
        .groupby("o_orderstatus").aggregate(
            Sum("n", alias_name="n_orders"),
            Sum("total_ticks", alias_name="total"),
            Max("o_totalprice", alias_name="max_price"),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderstatus": t["o_orderstatus"],
            "n_orders": t["n_orders"],
            "total": from_ticks(t["total"]),
            "max_price": t["max_price"],
        })

    return rolled.map_batches(finish, batch_format="pyarrow")


def events_rolling(sf_dir: str, window: int = 3) -> "ray.data.Dataset":
    """Per-user rolling-window aggregate (sum of the last ``window``
    event values, ordered by (ts, event_id)): the windowed-aggregate
    shape — one shuffle keyed by user_id, then a vectorized pandas
    rolling sum inside each group. Tick-integer sums keep the floats
    bit-exact vs the SQL window-frame oracle."""
    import pandas as pd

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "user_id": pd.Series(dtype="int64"),
                                 "ts": pd.Series(dtype="datetime64[us]"),
                                 "rolling_sum": pd.Series(dtype="float64")})
        g = g.sort_values(["ts", "event_id"])
        ticks = (g["value"] * SCALE).round().astype("int64")
        rs = ticks.rolling(window, min_periods=1).sum().astype("int64") / SCALE
        return pd.DataFrame({"event_id": g["event_id"], "user_id": g["user_id"],
                             "ts": g["ts"], "rolling_sum": rs})

    return ds.groupby("user_id").map_groups(roll, batch_format="pandas")


def events_asof_join(sf_dir: str) -> "ray.data.Dataset":
    """As-of join: each purchase event matched to the latest view event
    of the same user at ts <= purchase ts (inner). Ray Data lacks an
    as-of join operator; the composition is one shuffle keyed by
    user_id over BOTH filtered streams (a union — the same shuffle
    key co-locates them), then a sorted ``pandas.merge_asof`` inside
    each group. View-side (user, ts) ties are pre-folded to
    max(event_id) for determinism."""
    import numpy as np
    import pandas as pd

    ds = _read(sf_dir, "events",
        columns=["event_id", "user_id", "ts", "event_type"])

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["event_type"],
                                 value_set=pa.array(["purchase", "view"])))

    _EMPTY = pd.DataFrame({"purchase_id": pd.Series(dtype="int64"),
                           "user_id": pd.Series(dtype="int64"),
                           "ts": pd.Series(dtype="datetime64[us]"),
                           "view_ts": pd.Series(dtype="datetime64[us]"),
                           "view_id": pd.Series(dtype="int64")})

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["event_type"] == "purchase"]
        v = g[g["event_type"] == "view"]
        if not len(p) or not len(v):
            return _EMPTY.copy()
        p = p[["event_id", "user_id", "ts"]] \
            .rename(columns={"event_id": "purchase_id"}).sort_values("ts")
        v = v.groupby("ts", as_index=False)["event_id"].max() \
            .rename(columns={"ts": "view_ts", "event_id": "view_id"}) \
            .sort_values("view_ts")
        m = pd.merge_asof(p, v, left_on="ts", right_on="view_ts",
                          direction="backward")
        m = m[m["view_id"].notna()]
        if not len(m):
            return _EMPTY.copy()
        m["view_id"] = m["view_id"].astype("int64")
        return m[["purchase_id", "user_id", "ts", "view_ts", "view_id"]]

    return ds.map_batches(keep, batch_format="pyarrow") \
        .groupby("user_id").map_groups(asof, batch_format="pandas")


# static value tiers for the broadcast range join (small side)
VALUE_TIERS = (("low", 0.0, 25.0), ("mid", 25.0, 75.0), ("high", 75.0, 1e18))


def events_range_join(sf_dir: str) -> "ray.data.Dataset":
    """Range join against a small static tier table: the small side is
    broadcast as sorted bin edges and resolved per batch with one
    vectorized ``np.searchsorted`` — never a shuffle join. Partial
    pre-agg per batch, then a tiny 3-group rollup."""
    import numpy as np
    from ray.data.aggregate import Sum

    names = [t[0] for t in VALUE_TIERS]
    edges = np.array([t[1] for t in VALUE_TIERS][1:])  # interior lower bounds

    ds = _read(sf_dir, "events", columns=["value"])

    def partial(t: pa.Table) -> pa.Table:
        # keep only rows inside the tier table's covered range, matching
        # the oracle's inner-join semantics (value >= lo AND value < hi):
        # out-of-range values must drop, not fall into the edge tiers
        lo, hi = VALUE_TIERS[0][1], VALUE_TIERS[-1][2]
        t = t.filter(pc.and_(pc.greater_equal(t["value"], pa.scalar(lo)),
                             pc.less(t["value"], pa.scalar(hi))))
        vals = t["value"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(edges, vals, side="right")
        g = pa.table({
            "tier": pa.array([names[i] for i in idx], pa.string()),
            "value": to_ticks(t["value"]),
            "n": pa.array([1] * t.num_rows, pa.int64()),
        })
        return g.group_by("tier").aggregate([("value", "sum"), ("n", "sum")]) \
                .rename_columns(["tier", "value", "n"])

    rolled = ds.map_batches(partial, batch_format="pyarrow") \
        .repartition(2) \
        .groupby("tier").aggregate(Sum("value", alias_name="sum_value"),
                                   Sum("n", alias_name="n_events"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"tier": t["tier"],
                         "sum_value": from_ticks(t["sum_value"]),
                         "n_events": t["n_events"]})

    return rolled.map_batches(finish, batch_format="pyarrow")


def top_docs_per_lang(sf_dir: str, k: int = 3) -> "ray.data.Dataset":
    """Grouped top-k (rank window shape): the k longest docs per
    language, deterministic (n_chars desc, doc_id asc) tie-break.
    One shuffle keyed by lang; per-group vectorized nlargest."""
    import pandas as pd

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "lang", "n_chars"])

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"lang": pd.Series(dtype="object"),
                                 "doc_id": pd.Series(dtype="int64"),
                                 "n_chars": pd.Series(dtype="int64"),
                                 "rank": pd.Series(dtype="int64")})
        g = g.sort_values(["n_chars", "doc_id"],
                          ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = g.index + 1
        return g[["lang", "doc_id", "n_chars", "rank"]]

    return ds.groupby("lang").map_groups(topk, batch_format="pandas")


def supplier_balance_by_region(sf_dir: str) -> "ray.data.Dataset":
    """supplier ⋈ nation ⋈ region via one composed broadcast dict
    (both dimensions are tiny) → account-balance rollup per region."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Max, Sum

    nat = pq.read_table(_pq(sf_dir, "nation"),
                        columns=["n_nationkey", "n_regionkey"])
    reg = pq.read_table(_pq(sf_dir, "region"),
                        columns=["r_regionkey", "r_name"])
    # compose nation→region name once on the driver (25 rows), then
    # broadcast the key/name ARRAYS for a vectorized index_in + take
    rpos = pc.index_in(nat["n_regionkey"], value_set=reg["r_regionkey"].combine_chunks())
    lookup_ref = ray.put((nat["n_nationkey"].combine_chunks(),
                          reg["r_name"].combine_chunks().take(rpos.combine_chunks())))

    ds = _read(sf_dir, "supplier",
               columns=["s_nationkey", "s_acctbal"])

    def partial(t: pa.Table, _ref=lookup_ref) -> pa.Table:
        keys, names = ray.get(_ref)
        pos = pc.index_in(t["s_nationkey"], value_set=keys)
        g = pa.table({"r_name": names.take(pos),
                      "bal": to_ticks(t["s_acctbal"]),
                      "bal_max": t["s_acctbal"],
                      "n": pa.array([1] * t.num_rows, pa.int64())})
        return (g.group_by("r_name")
                 .aggregate([("bal", "sum"), ("bal_max", "max"), ("n", "sum")])
                 .rename_columns(["r_name", "bal", "bal_max", "n"]))

    rolled = ds.map_batches(partial, batch_format="pyarrow") \
        .repartition(2) \
        .groupby("r_name").aggregate(
            Sum("bal", alias_name="total_bal"),
            Max("bal_max", alias_name="max_bal"),
            Sum("n", alias_name="n_suppliers"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"r_name": t["r_name"],
                         "total_bal": from_ticks(t["total_bal"]),
                         "max_bal": t["max_bal"],
                         "n_suppliers": t["n_suppliers"]})

    return rolled.map_batches(finish, batch_format="pyarrow")


def q3_shipping(sf_dir: str, segment: str = "BUILDING",
                cutoff: str = "1998-03-15", k: int = 10) -> "ray.data.Dataset":
    """TPC-H Q3 shape: top-k unshipped-order revenue for one market
    segment. customer is filtered AT THE READ (pushdown) and broadcast
    as a key set; lineitem revenue pre-aggregates per order before the
    one hash join with the filtered orders; final top-k is partial
    select_k per block then a tiny sort+limit."""
    import datetime
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    cut = datetime.datetime.fromisoformat(cutoff)

    cust = pq.read_table(_pq(sf_dir, "customer"), columns=["c_custkey"],
                         filters=[("c_mktsegment", "=", segment)])
    # broadcast the key column as an Arrow array (one segment's keys —
    # bounded; pc.is_in against it is vectorized, no per-row Python)
    cust_ref = ray.put(cust["c_custkey"].combine_chunks())

    orders = _read(sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def keep_orders(t: pa.Table, _ref=cust_ref) -> pa.Table:
        keys = ray.get(_ref)
        t = t.filter(pc.less(t["o_orderdate"], pa.scalar(cut)))
        mask = pc.is_in(t["o_custkey"], value_set=keys)
        return t.filter(mask).select(["o_orderkey", "o_orderdate"])

    cand_orders = orders.map_batches(keep_orders, batch_format="pyarrow")

    items = _read(sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], pa.scalar(cut)))
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        g = pa.table({"l_orderkey": t["l_orderkey"], "rev": to_ticks(rev)})
        return g.group_by("l_orderkey").aggregate([("rev", "sum")]) \
                .rename_columns(["l_orderkey", "rev"])

    per_order = items.map_batches(partial, batch_format="pyarrow") \
        .groupby("l_orderkey").aggregate(Sum("rev", alias_name="rev"))

    joined = cand_orders.join(coalesce_for_join(per_order, n=join_partitions()),
                              join_type="inner", num_partitions=join_partitions(),
                              on=("o_orderkey",), right_on=("l_orderkey",))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "revenue": from_ticks(t["rev"]),
            "o_orderdate": t["o_orderdate"],
        })

    out = joined.map_batches(finish, batch_format="pyarrow")

    def partial_topk(t: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            t, k, [("revenue", "descending"), ("o_orderkey", "ascending")])
        return t.take(idx)

    return out.map_batches(partial_topk, batch_format="pyarrow") \
        .sort(["revenue", "o_orderkey"], descending=[True, False]).limit(k)


def value_percentiles(sf_dir: str) -> "ray.data.Dataset":
    """Per-event-type discrete percentiles (p50/p90/p99) of value:
    the quantile-aggregate shape. One shuffle keyed by event_type;
    exact discrete quantiles per group (lower interpolation — index
    ceil(q*n)-1 of the sorted values — matching DuckDB
    quantile_disc exactly, no float interpolation to drift)."""
    import math
    import pandas as pd

    ds = _read(sf_dir, "events",
               columns=["event_type", "value"])

    def pcts(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"event_type": pd.Series(dtype="object"),
                                 "p50": pd.Series(dtype="float64"),
                                 "p90": pd.Series(dtype="float64"),
                                 "p99": pd.Series(dtype="float64"),
                                 "n": pd.Series(dtype="int64")})
        vals = g["value"].sort_values().to_numpy()
        n = len(vals)

        def disc(q: float) -> float:
            return float(vals[max(0, math.ceil(q * n) - 1)])

        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                             "p50": [disc(0.5)], "p90": [disc(0.9)],
                             "p99": [disc(0.99)], "n": [n]})

    return ds.groupby("event_type").map_groups(pcts, batch_format="pandas")


def events_lead_lag(sf_dir: str) -> "ray.data.Dataset":
    """Lead/lag window projection per user: each event with the
    previous event's value and the gap to the next event in seconds.
    One shuffle keyed by user_id; vectorized pandas shift per group."""
    import pandas as pd

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])

    def proj(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "user_id": pd.Series(dtype="int64"),
                                 "prev_value": pd.Series(dtype="float64"),
                                 "next_gap_sec": pd.Series(dtype="float64")})
        g = g.sort_values(["ts", "event_id"])
        prev_value = g["value"].shift(1)
        next_gap = (g["ts"].shift(-1) - g["ts"]).dt.total_seconds()
        return pd.DataFrame({"event_id": g["event_id"],
                             "user_id": g["user_id"],
                             "prev_value": prev_value,
                             "next_gap_sec": next_gap})

    return ds.groupby("user_id").map_groups(proj, batch_format="pandas")
