"""Run every queries() entry and compare against its DuckDB oracle.

Mimics the driver's check: row count + schema + order-insensitive
value hash (columns sorted by name, rows sorted by all columns).

Usage: python3 tools/check_oracles.py [sf_dir] [query ...]

ACCEPTANCE GATE (round-3 lesson): verification that doesn't replicate
the driver's Ray config is not verification — the round-3 red row
(`dedup_minhash_verified`) only crashed at `join_partitions()` values
implied by num_cpus=32. This tool therefore inits Ray with the
driver's EXACT config (num_cpus=32, overridable via RAY_GRAFT_CPUS)
and the release check runs it on sf0.01.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = df[c].dtype
        if dt == object:
            df[c] = df[c].astype(str)
        elif str(dt).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
        elif pd.api.types.is_integer_dtype(dt):
            df[c] = df[c].astype("int64")
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def value_hash(df: pd.DataFrame) -> str:
    import hashlib
    return hashlib.md5(
        pd.util.hash_pandas_object(canon(df), index=False).values.tobytes()
    ).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        # replicate the DRIVER's config: num_cpus changes
        # join_partitions() and shard masks, which changes which code
        # paths execute (round-3 crash was invisible at num_cpus=8)
        ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()

    unknown = only - set(qs)
    if unknown:
        print("ERROR unknown query name(s) in --only args: %s"
              % ", ".join(sorted(unknown)))
        print("      (a typo here silently skips the check it was "
              "meant to run)")
        return 2

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql("CREATE VIEW %s AS SELECT * FROM read_parquet('%s/%s.parquet')"
                % (t, sf_dir, t))

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as exc:
            print("FAIL  %-22s raised %s: %s" % (name, type(exc).__name__, exc))
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print("ROWS  %-22s rows=%-7d cols=%s  (%.1fs, rows-only)"
                  % (name, len(mine), list(mine.columns)[:6], dt))
            continue
        oracle = con.sql(oracles[name]).df()
        ok_rows = len(mine) == len(oracle)
        ok_schema = sorted(mine.columns) == sorted(oracle.columns)
        ok_hash = ok_rows and ok_schema and value_hash(mine) == value_hash(oracle)
        status = "OK   " if (ok_rows and ok_schema and ok_hash) else "FAIL "
        if status.startswith("FAIL"):
            failures += 1
        print("%s %-22s rows=%d/%d schema=%s hash=%s (%.1fs)"
              % (status, name, len(mine), len(oracle), ok_schema, ok_hash, dt))
        if not ok_hash and ok_rows and ok_schema:
            a, b = canon(mine), canon(oracle)
            neq = (a != b).any(axis=1)
            if neq.any():
                i = neq.idxmax()
                print("   first diff row %d:\n    mine:   %s\n    oracle: %s"
                      % (i, a.loc[i].to_dict(), b.loc[i].to_dict()))
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
