"""Windowed / as-of / range-join operator tests (sf0.001 events).

Each new operator is checked against a local pandas/duckdb
re-derivation of its semantics — independent of the driver's oracle
harness (which re-checks the same SQL at sf0.01).
"""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_df():
    return duckdb.sql(
        "SELECT * FROM read_parquet('%s/events.parquet')" % SF).df()


def test_events_rolling_matches_window_frame(ray_session, events_df):
    from pdfextract_ray.pipelines.relational import events_rolling
    got = events_rolling(SF).to_pandas().sort_values("event_id") \
        .reset_index(drop=True)
    assert len(got) == len(events_df)

    df = events_df.sort_values(["user_id", "ts", "event_id"]).copy()
    df["ticks"] = (df["value"] * 10000.0).round().astype("int64")
    df["expect"] = df.groupby("user_id")["ticks"] \
        .transform(lambda s: s.rolling(3, min_periods=1).sum()) \
        .astype("int64") / 10000.0
    exp = df.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_series_equal(got["rolling_sum"], exp["expect"],
                                   check_names=False)


def test_events_asof_join_semantics(ray_session, events_df):
    from pdfextract_ray.pipelines.relational import events_asof_join
    got = events_asof_join(SF).to_pandas() \
        .sort_values("purchase_id").reset_index(drop=True)

    # every matched view is the LATEST view of that user at ts <= purchase ts
    views = events_df[events_df["event_type"] == "view"]
    by_user = {u: g.sort_values("ts") for u, g in views.groupby("user_id")}
    assert len(got) > 0
    for row in got.itertuples():
        g = by_user[row.user_id]
        eligible = g[g["ts"] <= row.ts]
        assert len(eligible)
        best_ts = eligible["ts"].max()
        assert row.view_ts == best_ts
        assert row.view_id == eligible[eligible["ts"] == best_ts]["event_id"].max()

    # purchases with no prior view are dropped (inner join)
    purchases = events_df[events_df["event_type"] == "purchase"]
    n_matchable = sum(
        (u in by_user) and (by_user[u]["ts"] <= t).any()
        for u, t in zip(purchases["user_id"], purchases["ts"]))
    assert len(got) == n_matchable


def test_events_range_join_totals(ray_session, events_df):
    from pdfextract_ray.pipelines.relational import events_range_join
    got = events_range_join(SF).to_pandas().set_index("tier")
    assert int(got["n_events"].sum()) == len(events_df)
    lo = events_df[events_df["value"] < 25.0]
    mid = events_df[(events_df["value"] >= 25.0) & (events_df["value"] < 75.0)]
    assert int(got.loc["low", "n_events"]) == len(lo)
    assert int(got.loc["mid", "n_events"]) == len(mid)
    ticks = (lo["value"] * 10000.0).round().astype("int64").sum()
    assert got.loc["low", "sum_value"] == ticks / 10000.0


def test_top_docs_per_lang_grouped_topk(ray_session):
    from pdfextract_ray.pipelines.relational import top_docs_per_lang
    import duckdb
    got = top_docs_per_lang(SF).to_pandas() \
        .sort_values(["lang", "rank"]).reset_index(drop=True)
    docs = duckdb.sql(
        "SELECT * FROM read_parquet('%s/documents.parquet')" % SF).df()
    for lang, g in got.groupby("lang"):
        exp = docs[docs["lang"] == lang] \
            .sort_values(["n_chars", "doc_id"], ascending=[False, True]).head(3)
        assert list(g.sort_values("rank")["doc_id"]) == list(exp["doc_id"])
        assert list(g["rank"]) == list(range(1, len(g) + 1))
