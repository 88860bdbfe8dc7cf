"""Flagship pipeline: corpus parquet → extracted text/refs/spans parquet.

Ray-Data-first shape (SURVEY.md §7):

    read_parquet(shard files, pruned columns)
      → [optional skew split: oversized html rows routed to batch_size=1]
      → map_batches(ExtractDocs, concurrency=actor pool)   # the hot stage
      → write_parquet(out/shard=NNNN/)
      → read-back pruned counters → partial agg → per-partition metrics
      → atomic shard manifest                               # resume unit

Design notes for 10^12-doc scale:

- **Resume shard = input-file group.** Membership is decided by which
  parquet fragments a shard owns, so a resumed run re-reads ONLY
  unfinished shards (no read amplification, no per-url anti-join).
  Within a shard, work is fully streaming with backpressure.
- **Skew**: rows whose ``html`` exceeds ``skew_threshold`` bytes are
  re-blocked into singleton batches by a generator ``size_router`` in
  the SAME pass (no second read), so one 20 MB page never stalls a
  64-row batch (north rule: "skew-aware splitting of oversized rows
  before the hot tokenize/classify stage").
- **Metrics** aggregate per ``partition_id`` (crc32(url) hash space)
  from a column-pruned read-back of the freshly written shard —
  touching 4 int columns, not the text — then a tiny groupby over
  per-batch partials (pre-aggregation before the shuffle).
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from pdfextract_ray.settings import DEFAULT_SETTINGS, Settings
from pdfextract_ray.stages.extract import ExtractDocs
from pdfextract_ray.state import manifest as mf

CORPUS_COLUMNS = ["url", "warc_ts", "html", "lang"]
DEFAULT_BATCH_SIZE = 64
DEFAULT_SKEW_THRESHOLD = 256 * 1024  # bytes of html


def corpus_files(corpus_path: str) -> list[str]:
    if os.path.isfile(corpus_path):
        return [corpus_path]
    return sorted(
        os.path.join(corpus_path, f)
        for f in os.listdir(corpus_path)
        if f.endswith(".parquet")
    )


def read_corpus(paths: list[str] | str) -> "ray.data.Dataset":
    """Column-pruned corpus read (never load the naive ``text`` column)."""
    return ray.data.read_parquet(paths, columns=CORPUS_COLUMNS)


def extract_dataset(ds: "ray.data.Dataset", settings: Settings = DEFAULT_SETTINGS,
                    num_partitions: int = 64, concurrency: int | tuple | None = None,
                    batch_size: int = DEFAULT_BATCH_SIZE, with_spans: bool = True,
                    skew_threshold: int | None = DEFAULT_SKEW_THRESHOLD,
                    ) -> "ray.data.Dataset":
    """Attach the extraction stage (actor pool) to a corpus Dataset."""
    import ray
    ncpu = int(ray.cluster_resources().get("CPU", 4))
    # Pool sizing (measured on 32 CPUs, 20k docs): a FIXED pool at ~3/4 of
    # the cluster beats autoscaling-from-1 by 2.6x (the autoscaler ramps
    # too slowly for a compute-bound stage), while a pool reserving EVERY
    # CPU starves the read stage and serializes — keep >= 2 cores free.
    if concurrency is None:
        # keep the pool FRACTION constant across cluster sizes (3/4) so
        # scaling comparisons compare like with like
        small = max(1, min(ncpu * 3 // 4, ncpu - 1))
        concurrency = (small, small)
    elif isinstance(concurrency, int):
        concurrency = (concurrency, concurrency)
    kwargs = dict(
        batch_format="pyarrow",
        fn_constructor_kwargs=dict(settings=settings, num_partitions=num_partitions,
                                   with_spans=with_spans),
        num_cpus=1,
        concurrency=concurrency,
    )

    if not skew_threshold:
        return ds.map_batches(ExtractDocs, batch_size=batch_size, **kwargs)

    thr = skew_threshold
    bs = batch_size

    def size_router(t: pa.Table):
        """Single-pass skew split: re-block rows by size class. Small rows
        go out in ``batch_size``-row tables; each oversized row becomes
        its own singleton table, so one giant page never rides in (and
        stalls) a 64-row batch. The yielded tables flow to ExtractDocs
        with batch_size=None (batch == block), i.e. no recoalescing —
        and the input is read exactly ONCE (a filter-into-two-branches
        union would read it twice)."""
        sizes = pc.fill_null(pc.binary_length(t["html"]), 0)
        mask = pc.greater(sizes, thr)
        big = t.filter(mask)
        small = t.filter(pc.invert(mask))
        for i in range(0, small.num_rows, bs):
            yield small.slice(i, bs)
        for i in range(big.num_rows):
            yield big.slice(i, 1)

    return ds.map_batches(size_router, batch_format="pyarrow") \
             .map_batches(ExtractDocs, batch_size=None, **kwargs)


def dedup_by_url(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Exact per-url dedup: keep the first row per url (idempotent
    re-runs over overlapping crawls — SURVEY.md §2.6). Hash-partitioned
    groupby; only (url, row) pairs of colliding urls concentrate.

    Null-url rows (malformed input) have NO identity to dedup on: each
    gets a content-hash sentinel key, so distinct malformed rows are
    never collapsed as if duplicates of one another, and — unlike
    grouping them under the shared null key — they don't concentrate
    into one group (0.1% nulls at 10^12 docs would be a one-worker
    mega-group). Byte-identical null rows DO collapse (indistinguishable
    true duplicates). The key column duplicates ``url`` through the
    shuffle; html dominates the moved bytes, so the overhead is noise."""
    import pandas as pd

    def add_key(t: pa.Table) -> pa.Table:
        urls = t["url"]
        if urls.null_count == 0:
            key = urls
        else:  # rare path: per-row content hash for the null rows only
            from pdfextract_ray.state.manifest import canonical_table_md5
            vals = urls.to_pylist()
            key_vals = []
            for i, u in enumerate(vals):
                if u is not None:
                    key_vals.append(u)
                    continue
                # the helper rebuilds the row with fresh buffers, so
                # identical rows at different block positions collapse
                key_vals.append("\x00" + canonical_table_md5(t.slice(i, 1)))
            key = pa.array(key_vals, pa.string())
        return t.append_column("_dedup_key", key)

    def first(g: pd.DataFrame) -> pd.DataFrame:
        # drop the key here rather than via Dataset.drop_columns — that
        # operator rejects complex list<struct> columns (span rows)
        return g.head(1).drop(columns="_dedup_key")

    return (ds.map_batches(add_key, batch_format="pyarrow")
              .groupby("_dedup_key")
              .map_groups(first, batch_format="pandas"))


def _shard_metrics(shard_dir: str) -> list[dict]:
    """Per-partition lineage counters from a pruned read-back."""
    cols = ["partition_id", "n_refs", "n_tokens", "n_pages", "error"]
    ds = ray.data.read_parquet(shard_dir, columns=cols)

    def partial(t: pa.Table) -> pa.Table:
        err = pc.cast(pc.is_valid(t["error"]), pa.int64())
        g = pa.table({
            "partition_id": t["partition_id"],
            "rows": pa.array([1] * t.num_rows, pa.int64()),
            "refs": pc.cast(t["n_refs"], pa.int64()),
            "tokens": t["n_tokens"],
            "pages": pc.cast(t["n_pages"], pa.int64()),
            "errors": err,
        })
        return g.group_by("partition_id").aggregate(
            [("rows", "sum"), ("refs", "sum"), ("tokens", "sum"),
             ("pages", "sum"), ("errors", "sum")]
        ).rename_columns(["partition_id", "rows", "refs", "tokens", "pages", "errors"])

    # per-batch partials are tiny (≤ num_partitions rows per block); the
    # final merge happens on the driver — pre-aggregation replaces the
    # all-to-all a bare groupby().aggregate() would shuffle
    partials = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (partials.groupby("partition_id", as_index=False).sum()
           .sort_values("partition_id"))
    return out.to_dict(orient="records")


def run_extract(corpus_path: str, out_dir: str, *,
                settings: Settings = DEFAULT_SETTINGS,
                num_shards: int = 4, num_partitions: int = 64,
                resume: bool = True, with_spans: bool = True,
                concurrency: int | tuple | None = None,
                batch_size: int = DEFAULT_BATCH_SIZE,
                skew_threshold: int | None = DEFAULT_SKEW_THRESHOLD,
                compute_metrics: bool = True,
                parallel_shards: int = 1) -> dict:
    """Run (or resume) the extraction job. Returns run stats.

    ``parallel_shards`` overlaps shard pipelines (each is an independent
    Ray Data execution): useful when shards are small relative to
    pipeline spin-up (small corpora / many shards). At real scale one
    shard saturates the cluster, so 1 keeps failure domains separate.
    """
    files = corpus_files(corpus_path)
    if not files:
        raise FileNotFoundError("no parquet files under %s" % corpus_path)
    num_shards = min(num_shards, len(files))
    shards = {s: files[s::num_shards] for s in range(num_shards)}

    done: set[int] = set()
    if resume:
        # A manifest filename is not enough to skip a shard: the
        # shard→file assignment must MATCH this run's. Resuming with a
        # different --shards or a changed corpus silently re-slices the
        # file list, so skipped indices would no longer cover the same
        # files (data loss) and kept shard dirs would overlap re-run
        # ones (duplication). Any mismatch is refused outright — resume
        # into the same config, or use a fresh --out.
        for s, payload in mf.read_manifests(out_dir).items():
            want = [os.path.basename(f) for f in shards.get(s, [])]
            have = payload.get("files")
            if s < num_shards and have == want:
                done.add(s)
            else:
                raise ValueError(
                    "resume mismatch for shard %d under %s: the manifest "
                    "records files %r but this run assigns %r (different "
                    "--shards or a changed corpus). Rerun with the "
                    "original configuration or a fresh --out."
                    % (s, out_dir, have, want))
    os.makedirs(out_dir, exist_ok=True)

    stats = {"shards_total": num_shards, "shards_skipped": 0, "rows": 0,
             "errors": 0, "wall_sec": 0.0}
    t0 = time.time()

    if parallel_shards > 1 and concurrency is None:
        # split the actor budget across concurrently running shards
        import ray
        ncpu = int(ray.cluster_resources().get("CPU", 4))
        per = max(1, (ncpu * 3 // 4) // parallel_shards)
        concurrency = (per, per)

    def run_shard(shard: int, shard_files: list[str]) -> tuple[int, int]:
        sdir_existing = mf.shard_data_dir(out_dir, shard)
        if os.path.isdir(sdir_existing):
            # crashed mid-write: data without a manifest is partial —
            # re-appending into it would duplicate rows on resume
            import shutil
            shutil.rmtree(sdir_existing)
        ds = read_corpus(shard_files)
        out = extract_dataset(ds, settings, num_partitions=num_partitions,
                              concurrency=concurrency, batch_size=batch_size,
                              with_spans=with_spans, skew_threshold=skew_threshold)
        sdir = mf.shard_data_dir(out_dir, shard)
        out.write_parquet(sdir)

        # Ray's parquet sink DELETES the directory it created when zero
        # rows were written (an empty input file makes an empty shard) —
        # a manifest with rows=0 must still land so resume skips the shard
        if not os.path.isdir(sdir):
            metrics = []
        elif compute_metrics:
            metrics = _shard_metrics(sdir)
        else:
            metrics = []
        rows = int(sum(m["rows"] for m in metrics))
        errors = int(sum(m["errors"] for m in metrics))
        mf.write_shard_metrics(out_dir, shard, metrics)
        mf.write_shard_manifest(out_dir, shard, {
            "shard": shard,
            "files": [os.path.basename(f) for f in shard_files],
            "rows": rows,
            "errors": errors,
            "partitions": len(metrics),
        })
        return rows, errors

    todo = [(s, f) for s, f in shards.items() if s not in done]
    stats["shards_skipped"] = num_shards - len(todo)
    if parallel_shards > 1 and len(todo) > 1:
        from concurrent.futures import ThreadPoolExecutor
        # Ray's read path lazy-imports fsspec.implementations.http per
        # call and only catches ModuleNotFoundError; when aiohttp is
        # absent, concurrent failed imports across shard threads surface
        # as plain ImportError and crash the read. Pre-seed a stub module
        # whose sentinel class never matches a real filesystem.
        try:
            import fsspec.implementations.http  # noqa: F401
        except ImportError:
            import sys as _sys
            import types as _types
            _stub = _types.ModuleType("fsspec.implementations.http")
            _stub.HTTPFileSystem = type("HTTPFileSystem", (), {})
            _sys.modules["fsspec.implementations.http"] = _stub
        with ThreadPoolExecutor(max_workers=parallel_shards) as pool:
            for rows, errors in pool.map(lambda sf: run_shard(*sf), todo):
                stats["rows"] += rows
                stats["errors"] += errors
    else:
        for shard, shard_files in todo:
            rows, errors = run_shard(shard, shard_files)
            stats["rows"] += rows
            stats["errors"] += errors
    stats["wall_sec"] = time.time() - t0
    stats["docs_per_sec"] = round(stats["rows"] / stats["wall_sec"], 1) \
        if stats["wall_sec"] > 0 and stats["rows"] else 0.0
    mf._atomic_write_json(os.path.join(out_dir, "_RUN.json"), stats)
    return stats
