"""Page-exploded extraction variant: the skew-proof scale path.

For pathological corpora (single documents of hundreds of pages /
hundreds of MB) even a singleton batch stalls one actor for the whole
document. This variant parallelizes WITHIN documents
(SURVEY.md §4.2 "Stragglers / skew"):

    corpus → map_batches(ExplodeAssemble)    # finished docs + mega-doc pages
           → map_batches(process_residue)    # mega-doc pages in parallel
           → groupby("url_shard").map_groups(assemble)  # residue reassembly
           → extraction rows

The first stage routes per document, IN-PROCESS (one read, no branch
datasets): a document with at most ``page_threshold`` pages runs the
full fused kernel chain right there — tokenize → per-page stages →
document stages stay on Python dicts, no serialization round-trip —
and emits one finished row. Only documents LARGER than the threshold
(the reason this pipeline exists) emit one row per page carrying that
page's lines as a typed Arrow ``list<struct>`` payload, so the page
stages fan out across the pool and the reassembly shuffle stitches
them back in page order. Measured: Arrow⇄dict conversion of line/page
payloads costs more than the page kernel itself (0.50s vs 0.31s per
200 sf0.01 docs), so paying it only for oversized documents makes the
normal-corpus exploded cost ≈ the fused pipeline, while a mega-doc
corpus gets the page-parallel path unchanged.

Residue payloads are ARROW-NATIVE ``list<struct>`` columns (typed line
rows into the page stage; typed region/zone/column/text-part rows out
of it) — zero-copy through the object store and the reassembly
shuffle, no opaque pickle blobs. The page/region dicts the kernel
consumes are rebuilt at the consuming stage boundary with
``to_pylist`` (field sets verified exhaustively regular in tests).

The reassembly sorts by page inside the group, so the output is
byte-identical to the fused single-pass pipeline (property-tested:
explode/reassemble roundtrip, FIXTURES.md §5; tests force
``page_threshold=0`` to push every document through the residue path).

Cost: one all-to-all shuffle keyed by url over finished rows plus
mega-doc page results; with a realistic threshold the moved bytes are
≈ the output itself, not the per-page intermediates.
"""

from __future__ import annotations

import zlib

import pyarrow as pa

from pdfextract_ray.kernel.document import (assemble_document, layout_pages,
                                            process_page)
from pdfextract_ray.kernel.names import load_gazetteer
from pdfextract_ray.settings import DEFAULT_SETTINGS, Settings
from pdfextract_ray.stages.extract import REF_TYPE


NUM_URL_SHARDS = 1024

# typed page payloads (schemas verified regular across the corpus in
# tests/test_exploded.py)
LAYOUT_LINE_T = pa.struct([
    ("x", pa.float64()), ("y", pa.float64()),
    ("width", pa.float64()), ("height", pa.float64()),
    ("line_height", pa.float64()), ("content", pa.string()),
    ("page", pa.int64()), ("font", pa.string()),
    ("page_width", pa.float64()), ("page_height", pa.float64()),
    ("char_w", pa.float64()), ("n_glyphs", pa.int64()),
    ("last_alnum_w", pa.float64()),
])
INNER_LINE_T = pa.struct([
    ("content", pa.string()), ("spacing", pa.float64()),
    ("x_offset", pa.float64()), ("y_offset", pa.float64()),
])
REGION_T = pa.struct([
    ("x", pa.float64()), ("y", pa.float64()),
    ("width", pa.float64()), ("height", pa.float64()),
    ("font", pa.string()), ("line_height", pa.float64()),
    ("page", pa.int64()),
    ("page_width", pa.float64()), ("page_height", pa.float64()),
    ("lines", pa.list_(INNER_LINE_T)),
])
COLUMN_T = pa.struct([
    ("x", pa.float64()), ("y", pa.float64()),
    ("width", pa.float64()), ("height", pa.float64()),
    ("page", pa.int64()),
    ("page_width", pa.float64()), ("page_height", pa.float64()),
])
ZONE_T = pa.struct([
    ("zone", pa.string()),
    ("x", pa.float64()), ("y", pa.float64()),
    ("width", pa.float64()), ("height", pa.float64()),
    ("page", pa.int64()),
])


# union schema of the two first-stage outputs (``assembled``
# discriminates): finished-document rows, and mega-doc page rows whose
# ``lines`` payload the residue stage turns into page results
WORKER_SCHEMA = pa.schema([
    ("url_shard", pa.int32()), ("url", pa.string()),
    ("lang", pa.string()), ("page", pa.int32()),
    ("assembled", pa.bool_()),
    # raw mega-doc page payload (assembled == false, first stage only)
    ("lines", pa.list_(LAYOUT_LINE_T)),
    # page-result payload (assembled == false, after process_residue_pages)
    ("n_glyphs", pa.int64()), ("n_chunks", pa.int64()),
    ("regions", pa.list_(REGION_T)), ("columns", pa.list_(COLUMN_T)),
    ("zones", pa.list_(ZONE_T)), ("text_parts", pa.list_(pa.string())),
    # finished-document payload (assembled == true)
    ("title", pa.string()), ("text", pa.string()),
    ("references", REF_TYPE),
    ("n_pages", pa.int64()), ("n_tokens", pa.int64()),
    ("n_refs", pa.int64()),
    # per-row failure isolation, same contract as the fused pipeline's
    # ExtractDocs: a poisoned document yields an error row, never a
    # failed block (on page rows: that PAGE's kernel error, folded to a
    # document error at reassembly)
    ("error", pa.string()),
])


class ExplodeAssemble:
    """Actor-pool first stage: per-document in-process router.

    Documents with at most ``page_threshold`` pages run the entire
    fused kernel chain here (tokenize → per-page → document stages, all
    on Python dicts — no Arrow round-trip) and emit one finished row.
    Oversized documents emit one row per page carrying the page's lines
    as a typed ``list<struct>``, to be processed page-parallel
    downstream. ``page_threshold=0`` forces everything through the
    page-parallel path (tests use this)."""

    def __init__(self, settings: Settings | None = None,
                 page_threshold: int = 64) -> None:
        self.settings = settings or DEFAULT_SETTINGS
        self.gazetteer = load_gazetteer()
        self.page_threshold = page_threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {name: [] for name in WORKER_SCHEMA.names}

        def emit(**kw) -> None:
            for name in WORKER_SCHEMA.names:
                cols[name].append(kw.get(name))

        for url, lang, html in zip(batch["url"].to_pylist(),
                                   batch["lang"].to_pylist(),
                                   batch["html"].to_pylist()):
            if url is None:
                # null key: can't shard or reassemble by url — an error
                # row in shard 0, same isolation contract as ExtractDocs
                emit(url_shard=0, url=None, lang=lang, assembled=True,
                     references=[], n_pages=0, n_tokens=0, n_refs=0,
                     error="ValueError: null url")
                continue
            shard = zlib.crc32(url.encode("utf-8")) % NUM_URL_SHARDS
            try:
                # null html raises (TypeError) exactly like the fused
                # path's run_document — the error row keeps the variants
                # row-identical on poisoned input
                page_map = layout_pages(html)
                if len(page_map) <= self.page_threshold:
                    res = assemble_document(
                        [process_page(pl, self.settings)
                         for pl in page_map.values()],
                        self.settings, self.gazetteer)
                    emit(url_shard=shard, url=url, lang=lang, assembled=True,
                         title=res.title, text=res.text,
                         references=[{"content": r["content"],
                                      "order": r.get("order")}
                                     for r in res.references],
                         n_pages=res.n_pages, n_tokens=res.n_tokens,
                         n_refs=len(res.references))
                    continue
            except Exception as exc:  # per-row isolation, as ExtractDocs
                emit(url_shard=shard, url=url, lang=lang, assembled=True,
                     references=[], n_pages=0, n_tokens=0, n_refs=0,
                     error="%s: %s" % (type(exc).__name__, exc))
                continue
            for page_no, lines in page_map.items():
                emit(url_shard=shard, url=url, lang=lang, page=page_no,
                     assembled=False, lines=lines)
        return pa.table({name: pa.array(cols[name], WORKER_SCHEMA.field(name).type)
                         for name in WORKER_SCHEMA.names})


def process_residue_pages(batch: pa.Table,
                          settings: Settings = DEFAULT_SETTINGS) -> pa.Table:
    """Stateless task stage: run the per-page kernel on mega-doc page
    rows; finished-document rows pass through zero-copy untouched."""
    import pyarrow.compute as pc

    mask = batch["assembled"]
    done = batch.filter(mask).drop_columns(["lines"])
    todo = batch.filter(pc.invert(mask))
    if not todo.num_rows:  # the lines payload ends here either way
        return done
    n_glyphs, n_chunks = [], []
    regions, columns, zones, text_parts, errors = [], [], [], [], []
    for lines in todo["lines"].to_pylist():
        try:
            pr = process_page(lines, settings)
        except Exception as exc:  # page-level isolation; folded to a
            # document error row at reassembly (first failing page wins,
            # matching the fused path's first-raise message)
            n_glyphs.append(0)
            n_chunks.append(0)
            regions.append([])
            columns.append([])
            zones.append([])
            text_parts.append([])
            errors.append("%s: %s" % (type(exc).__name__, exc))
            continue
        n_glyphs.append(pr["n_glyphs"])
        n_chunks.append(pr["n_chunks"])
        regions.append(pr["regions"])
        columns.append(pr["columns"])
        zones.append(pr["zones"])
        text_parts.append(pr["text_parts"])
        errors.append(None)
    built = {
        "n_glyphs": pa.array(n_glyphs, pa.int64()),
        "n_chunks": pa.array(n_chunks, pa.int64()),
        "regions": pa.array(regions, pa.list_(REGION_T)),
        "columns": pa.array(columns, pa.list_(COLUMN_T)),
        "zones": pa.array(zones, pa.list_(ZONE_T)),
        "text_parts": pa.array(text_parts, pa.list_(pa.string())),
        "error": pa.array(errors, pa.string()),
    }
    todo = pa.table({name: built.get(name, todo[name])
                     for name in done.schema.names})
    return pa.concat_tables([done, todo]) if done.num_rows else todo


_GAZETTEER: dict | None = None


def _gazetteer() -> dict:
    # per-worker-process lazy singleton (map_groups runs as tasks, not an
    # actor pool; the load is amortized across a worker's lifetime)
    global _GAZETTEER
    if _GAZETTEER is None:
        _GAZETTEER = load_gazetteer()
    return _GAZETTEER


ASSEMBLE_SCHEMA = pa.schema([
    ("url", pa.string()), ("lang", pa.string()),
    ("title", pa.string()), ("text", pa.string()),
    ("references", REF_TYPE),
    ("n_pages", pa.int64()), ("n_tokens", pa.int64()),
    ("n_refs", pa.int64()), ("error", pa.string()),
])


def assemble_group(t: pa.Table, settings: Settings = DEFAULT_SETTINGS) -> pa.Table:
    """Reassemble one url shard (groupby(url_shard) group, consumed as
    ARROW — finished rows from :class:`ExplodeAssemble` pass through as
    a zero-copy filter+projection, never touching pandas/Python). Only
    the mega-doc page residue is converted to Python dicts and run
    through the document-scoped stages here. Returns a TYPED table —
    inference would type an all-empty ``references`` block as
    ``list<null>``, which cannot unify with ``list<struct>`` blocks at
    write time."""
    import pyarrow.compute as pc

    if not t.num_rows:  # typed empty: Ray may call map_groups on empty blocks
        return ASSEMBLE_SCHEMA.empty_table()
    mask = t["assembled"]
    done = t.filter(mask).select(ASSEMBLE_SCHEMA.names)
    residue = t.filter(pc.invert(mask))
    if not residue.num_rows:
        return done

    gaz = _gazetteer()
    rows: dict[str, list] = {"url": [], "lang": [], "title": [], "text": [],
                             "references": [], "n_pages": [], "n_tokens": [],
                             "n_refs": [], "error": []}

    def emit_error(url: str, msg: str) -> None:
        rows["url"].append(url)
        rows["lang"].append(langs[url])
        rows["title"].append(None)
        rows["text"].append(None)
        rows["references"].append([])
        rows["n_pages"].append(0)
        rows["n_tokens"].append(0)
        rows["n_refs"].append(0)
        rows["error"].append(msg)

    by_url: dict[str, list[dict]] = {}
    langs: dict[str, str] = {}
    for r in residue.to_pylist():
        by_url.setdefault(r["url"], []).append(r)
        langs[r["url"]] = r["lang"]
    for url in sorted(by_url):
        pages = sorted(by_url[url], key=lambda r: r["page"])
        # a failed page poisons its DOCUMENT only: fold to one error row
        # (first failing page in page order — the same message the fused
        # path's first-raise would carry)
        page_err = next((r["error"] for r in pages if r["error"]), None)
        if page_err is not None:
            emit_error(url, page_err)
            continue
        # cheap guard for the unique-url input contract (see
        # extract_exploded docstring): a duplicate (url, page) pair can
        # only come from duplicate urls among OVERSIZED docs, which
        # would silently merge two documents into one here — fail loud
        # instead of corrupting.
        page_nums = [r["page"] for r in pages]
        if len(set(page_nums)) != len(page_nums):
            raise ValueError(
                "extract_exploded input contract violated: duplicate "
                f"url {url!r} among oversized documents (duplicate "
                "(url, page) residue rows). url is the reassembly key "
                "— run dedup_by_url on the corpus first.")
        page_results = [
            {"n_glyphs": r["n_glyphs"], "n_chunks": r["n_chunks"],
             "regions": r["regions"] or [], "columns": r["columns"] or [],
             "zones": r["zones"] or [], "text_parts": r["text_parts"] or []}
            for r in pages]
        try:
            res = assemble_document(page_results, settings, gaz)
        except Exception as exc:  # document-stage isolation, as ExtractDocs
            emit_error(url, "%s: %s" % (type(exc).__name__, exc))
            continue
        rows["url"].append(url)
        rows["lang"].append(langs[url])
        rows["title"].append(res.title)
        rows["text"].append(res.text)
        rows["references"].append([{"content": r["content"], "order": r.get("order")}
                                   for r in res.references])
        rows["n_pages"].append(res.n_pages)
        rows["n_tokens"].append(res.n_tokens)
        rows["n_refs"].append(len(res.references))
        rows["error"].append(None)
    built = pa.table(
        {name: pa.array(rows[name], ASSEMBLE_SCHEMA.field(name).type)
         for name in ASSEMBLE_SCHEMA.names})
    return pa.concat_tables([done, built]) if done.num_rows else built


def _split_finished(t: pa.Table) -> pa.Table:
    """Finished-document rows of a routed block, in the output schema.

    Fast path: routed blocks are overwhelmingly all-finished (residue
    is the rare mega-doc tail by design), and ``Table.filter`` gathers
    (copies) even under an all-true mask — skip it and take the
    zero-copy projection when the block has no residue rows."""
    import pyarrow.compute as pc

    mask = t["assembled"]
    if not pc.all(mask).as_py():  # vacuously true on empty blocks
        t = t.filter(mask)
    sel = t.select(ASSEMBLE_SCHEMA.names)
    # column types always match ASSEMBLE_SCHEMA (both derive from
    # WORKER_SCHEMA); cast only to normalize schema metadata drift
    return sel if sel.schema == ASSEMBLE_SCHEMA else sel.cast(ASSEMBLE_SCHEMA)


def _split_residue(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    mask = t["assembled"]
    if not pc.any(mask).as_py():  # all-residue block: nothing to drop
        return t
    return t.filter(pc.invert(mask))


def extract_exploded(ds, settings: Settings = DEFAULT_SETTINGS,
                     concurrency: int | tuple | None = None,
                     shuffle_partitions: int | None = None,
                     page_batch_size: int = 64,
                     page_threshold: int = 64):
    """Attach the exploded pipeline to a corpus Dataset.

    ``page_threshold``: documents with at most this many pages are
    extracted entirely inside the first stage (fused kernel chain, no
    Arrow round-trip, no shuffle participation); larger documents
    explode into per-page rows for the page-parallel path. 0 forces
    every document through the page-parallel path (tests use this).

    Input contract: urls must be unique (run
    :func:`~pdfextract_ray.pipelines.extract_pipeline.dedup_by_url`
    first for overlapping crawls, as the job path does) — url is the
    reassembly key, so two OVERSIZED rows sharing a url would
    reassemble into one document here, whereas the fused pipeline
    keeps one output row per input row.

    ``shuffle_partitions`` coalesces blocks before the reassembly
    groupby: the range sort's map×reduce object count is quadratic in
    block count (with heavy page payloads this was worth 3x, 23s → 8s
    at sf0.1/32cpu; with the light post-routing payload 8 vs 32 is
    within host noise). Default: one partition per CPU-pool slot,
    min 8.

    ``page_batch_size`` bounds a residue page batch in pages.

    Topology (round 4): finished rows route AROUND the reassembly
    shuffle entirely. The routed stream is materialized ONCE (block
    refs stay in the object store, spillable — and the old chain's
    repartition+sort barriers held the same bytes there anyway; a
    Dataset consumed by two branches without the materialize would
    re-execute the kernel per branch), then split by the ``assembled``
    flag with zero-copy filters: finished rows go straight to the
    output union, and ONLY true mega-doc pages pay the page stage and
    the two all-to-alls. Steady-state cost vs the fused pipeline:
    kernel CPU 1.0x (in-stage router, no Arrow⇄dict round-trip for
    small docs), shuffle bytes ≈ the mega-doc residue only (was: the
    entire output, the r3 1.4-1.6x wall gap). The trade: route and
    residue stages no longer overlap — irrelevant when residue is the
    rare path by design (page_threshold=0 test runs accept it).
    Corpora with a size column should use
    :func:`extract_adaptive_pushdown`, which routes at the scanner.
    When the endpoint is a parquet directory anyway, use
    :func:`extract_exploded_to_dir` — its actor-side sink removes this
    variant's materialize barrier (measured 1.09x fused vs 1.47x at
    sf0.1/32cpu)."""
    import ray
    ncpu = int(ray.cluster_resources().get("CPU", 4))
    if concurrency is None:
        n = max(1, min(ncpu * 3 // 4, ncpu - 2))
        concurrency = (n, n)
    if shuffle_partitions is None:
        shuffle_partitions = max(8, ncpu // 4)
    routed = ds.map_batches(
        ExplodeAssemble, batch_format="pyarrow",
        fn_constructor_kwargs=dict(settings=settings,
                                   page_threshold=page_threshold),
        concurrency=concurrency, num_cpus=1,
    ).materialize()

    finished_of, residue_of = _split_finished, _split_residue

    finished = routed.map_batches(finished_of, batch_format="pyarrow")
    processed = routed.map_batches(residue_of, batch_format="pyarrow") \
        .map_batches(
            process_residue_pages, batch_format="pyarrow",
            batch_size=page_batch_size, fn_kwargs=dict(settings=settings),
    )
    reassembled = processed.repartition(shuffle_partitions) \
        .groupby("url_shard").map_groups(
            assemble_group, batch_format="pyarrow",
            fn_kwargs=dict(settings=settings),
    )
    return finished.union(reassembled)


class ExplodeAssembleSink(ExplodeAssemble):
    """Routed stage with an actor-side sink: finished rows are written
    to partitioned parquet directly from ``__call__`` (tmp + rename, so
    readers never see a partial file) and only mega-doc page residue
    flows downstream. This removes the Dataset-returning variant's
    materialize barrier — the finished-row write overlaps extraction
    exactly like the fused pipeline's streaming sink."""

    def __init__(self, out_dir: str, settings: Settings | None = None,
                 page_threshold: int = 64) -> None:
        super().__init__(settings=settings, page_threshold=page_threshold)
        import os
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import os

        import pyarrow.parquet as pq

        t = super().__call__(batch)
        done = _split_finished(t)
        if done.num_rows:
            # deterministic name: batches are per-block (deterministic
            # composition across task retries) and the first url is
            # unique under the pipeline's unique-url input contract, so
            # a retried batch REPLACES its own file instead of
            # duplicating rows (at-least-once actor task semantics).
            # md5, not crc32: 32-bit names birthday-collide across
            # DIFFERENT blocks at ~100k blocks (silent row loss at
            # exactly the corpus sizes this path targets).
            import hashlib
            key_src = next((u for u in done["url"].to_pylist()
                            if u is not None), None)
            if key_src is None:
                # pathological all-null-url block (malformed rows only):
                # content-address it — identical such blocks dedupe to
                # one file, distinct ones keep distinct names (the
                # helper rebuilds rows so slicing can't break the
                # content-keyed retry idempotence)
                from pdfextract_ray.state.manifest import canonical_table_md5
                key = canonical_table_md5(done)
            else:
                key = hashlib.md5(key_src.encode("utf-8")).hexdigest()
            name = "finished-%s-%d.parquet" % (key, done.num_rows)
            tmp = os.path.join(self.out_dir,
                               ".%s.%d.tmp" % (name, os.getpid()))
            pq.write_table(done, tmp)
            os.replace(tmp, os.path.join(self.out_dir, name))
        return _split_residue(t)


def extract_exploded_to_dir(ds, out_dir: str,
                            settings: Settings = DEFAULT_SETTINGS,
                            concurrency: int | tuple | None = None,
                            shuffle_partitions: int | None = None,
                            page_batch_size: int = 64,
                            page_threshold: int = 64) -> None:
    """Streaming exploded extraction straight to ``out_dir`` parquet.

    The Dataset-returning :func:`extract_exploded` has a wall-time
    floor of (extraction barrier + unoverlapped output write): a
    Dataset consumed by two branches must be materialized, so the sink
    cannot start until the last document is routed (measured 1.47x
    fused at sf0.1/32cpu, of which ~10.3s is the barrier and ~6.3s the
    post-barrier filter+write). This variant writes finished rows from
    INSIDE the routed stage (atomic per-batch part files), so the
    common-path write overlaps extraction with no barrier, and only
    true mega-doc page residue pays the page stage, the reassembly
    all-to-alls, and a second (tiny) parquet write into the same
    directory. Output rows equal ``extract_exploded``'s (file and row
    order differ; both are unordered sets, like any parquet sink).

    Same unique-url input contract as :func:`extract_exploded`."""
    import os

    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 4))
    if concurrency is None:
        n = max(1, min(ncpu * 3 // 4, ncpu - 2))
        concurrency = (n, n)
    if shuffle_partitions is None:
        shuffle_partitions = max(8, ncpu // 4)
    residue = ds.map_batches(
        ExplodeAssembleSink, batch_format="pyarrow",
        fn_constructor_kwargs=dict(out_dir=out_dir, settings=settings,
                                   page_threshold=page_threshold),
        concurrency=concurrency, num_cpus=1,
    ).map_batches(
        process_residue_pages, batch_format="pyarrow",
        batch_size=page_batch_size, fn_kwargs=dict(settings=settings),
    )
    reassembled = residue.repartition(shuffle_partitions) \
        .groupby("url_shard").map_groups(
            assemble_group, batch_format="pyarrow",
            fn_kwargs=dict(settings=settings),
    )
    # consuming the residue branch drives the whole stream (the routed
    # stage's finished-row writes happen as its blocks execute). The
    # residue gets its OWN subdirectory: Ray's parquet sink deletes a
    # directory it created when the write turns out empty (the common
    # no-residue case), which would take the finished part files with
    # it if they shared the path. read_parquet(out_dir) discovers both
    # levels. This sink's contract is rerun-equals-recompute, so clear
    # BOTH prior outputs first: Ray's residue sink appends run-unique
    # names (a rerun would duplicate mega-doc rows), and the finished
    # part names are content-keyed per block — any change to the corpus
    # or block composition changes the names, so files from a previous
    # run would otherwise survive as stale rows (silent duplication).
    # Within-run retry idempotence is untouched: retried tasks still
    # REPLACE their own deterministic names during the run.
    import glob as _glob
    import shutil
    shutil.rmtree(os.path.join(out_dir, "residue"), ignore_errors=True)
    for stale in _glob.glob(os.path.join(out_dir, "finished-*.parquet")) \
            + _glob.glob(os.path.join(out_dir, ".finished-*.tmp")):
        try:
            os.remove(stale)
        except OSError:
            pass
    reassembled.write_parquet(os.path.join(out_dir, "residue"))


EXPLODED_COLUMNS = ["url", "lang", "title", "text", "references",
                    "n_pages", "n_tokens", "n_refs", "error"]


def derive_size_threshold(paths, quantile: float = 0.99) -> int:
    """Routing threshold from the corpus's OWN size distribution: the
    smallest power-of-two byte bound covering ≥ ``quantile`` of rows,
    so the exploded branch always gets exactly the heavy tail at any
    corpus scale (a fixed constant is either never hit on a small
    corpus or routes half of a heavy one).

    Distributed and driver-safe: a pruned single-column read feeds a
    per-block log2 histogram (64 counters), rolled up with a 64-key
    groupby — only the 64-row histogram ever reaches the driver, never
    the column. NULL ``html_size`` rows are excluded here and routed to
    the fused branch by :func:`extract_adaptive_pushdown`."""
    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(paths, columns=["html_size"])

    def hist(t: pa.Table) -> pa.Table:
        sz = t["html_size"].to_numpy(zero_copy_only=False).astype("float64")
        sz = sz[~np.isnan(sz)]
        counts = np.zeros(64, np.int64)
        if sz.size:
            idx = np.ceil(np.log2(np.maximum(sz, 1.0))).astype(np.int64)
            np.add.at(counts, np.clip(idx, 0, 63), 1)
        return pa.table({"b": pa.array(np.arange(64), pa.int64()),
                         "n": pa.array(counts, pa.int64())})

    rows = ds.map_batches(hist, batch_format="pyarrow") \
        .groupby("b").aggregate(Sum("n", alias_name="n")).take_all()
    counts = np.zeros(64, np.int64)
    for r in rows:
        counts[int(r["b"])] = int(r["n"])
    total = int(counts.sum())
    if total == 0:
        return 64 * 1024  # size column empty/all-null: documented default
    cum = np.cumsum(counts)
    bucket = int(np.searchsorted(cum, quantile * total))
    return int(2 ** min(bucket, 62))


def extract_adaptive_pushdown(paths, settings: Settings = DEFAULT_SETTINGS,
                              threshold_bytes: int | None = None,
                              concurrency: tuple | None = None):
    """One-read skew router over a corpus that carries an ``html_size``
    metadata column (the synthetic corpus does; Common-Crawl indexes
    do too): each branch is a ``read_parquet`` with a pushdown
    predicate on ``html_size``, so the Arrow scanner drops non-matching
    rows during the scan — each row's html bytes enter the pipeline
    exactly once, and row-group min/max stats prune the (mostly empty)
    mega-doc side. Prefer this over :func:`extract_adaptive` whenever
    the input is parquet with a size column; fall back to the
    Dataset-based router only for in-memory corpora.

    ``threshold_bytes=None`` (default) derives the routing bound from
    the corpus itself (:func:`derive_size_threshold` p99) instead of a
    magic constant. Rows with a NULL ``html_size`` route to the fused
    branch — a pushdown predicate evaluates to null for them on BOTH
    sides, which would silently drop the row from both branches."""
    import pyarrow.compute as pc
    import ray
    from pdfextract_ray.pipelines.extract_pipeline import CORPUS_COLUMNS

    if threshold_bytes is None:
        threshold_bytes = derive_size_threshold(paths)
    size = pc.field("html_size")
    small = ray.data.read_parquet(
        paths, columns=CORPUS_COLUMNS,
        filter=size.is_null() | (size <= threshold_bytes))
    big = ray.data.read_parquet(
        paths, columns=CORPUS_COLUMNS,
        filter=size > threshold_bytes)
    return _adaptive_union(small, big, settings, concurrency)


def extract_adaptive(ds, settings: Settings = DEFAULT_SETTINGS,
                     threshold_bytes: int = 64 * 1024,
                     concurrency: tuple | None = None):
    """Skew router: documents at or under ``threshold_bytes`` of HTML go
    through the FUSED per-document pipeline (no shuffle); oversized
    documents go through the page-exploded path so a mega-document
    parallelizes across the pool instead of stalling one actor. Byte
    size is the routing proxy (pages scale with bytes) so the route
    decision is a vectorized filter — no double layout pass, no
    mid-pipeline materialize. Outputs union to one Dataset with
    identical schema/rows as either pure path.

    Cost model: this Dataset-based variant reads/filters the corpus
    TWICE (binary length is not a parquet-pushdown predicate). Parquet
    corpora carrying an ``html_size`` column should use
    :func:`extract_adaptive_pushdown` instead — the scanner-level
    predicate makes each row enter the pipeline once. For in-memory /
    size-column-less corpora at scale, prefer :func:`extract_exploded`
    with a page threshold: since its first stage routes per document
    in-process it IS a one-read adaptive pipeline, trading this
    variant's second input scan (html is 3-10x the output text) for
    one all-to-all over the output rows — the cheaper side at corpus
    scale. This variant remains for pipelines that want the fused
    branch to bypass the output shuffle entirely."""
    import pyarrow.compute as pc

    def _small(t: pa.Table) -> pa.Table:
        return t.filter(pc.less_equal(
            pc.binary_length(pc.fill_null(t["html"], b"")), threshold_bytes))

    def _big(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(
            pc.binary_length(pc.fill_null(t["html"], b"")), threshold_bytes))

    return _adaptive_union(ds.map_batches(_small, batch_format="pyarrow"),
                           ds.map_batches(_big, batch_format="pyarrow"),
                           settings, concurrency)


def _adaptive_union(small_ds, big_ds, settings: Settings,
                    concurrency: tuple | None):
    """Fused pipeline over ``small_ds`` ∪ exploded pipeline over
    ``big_ds``, normalized to one schema.

    Two actor pools run CONCURRENTLY (one per branch). Two fixed
    pools each sized to the whole cluster would reserve every CPU and
    deadlock the stream (round-1 pitfall). The FUSED branch carries
    ~all rows under a realistic threshold, so it gets a FIXED pool
    (autoscaling-from-1 ramps 2.6x too slowly for compute-bound
    stages — measured round 1); the exploded branch idles unless
    mega-docs appear, so it autoscales from 1 and stays small."""
    import ray
    from pdfextract_ray.pipelines.extract_pipeline import extract_dataset

    ncpu = int(ray.cluster_resources().get("CPU", 4))
    if concurrency is None:
        fused_n = max(1, min(ncpu * 3 // 4, ncpu - 3))
        fused_conc = (fused_n, fused_n)
        expl_conc = (1, max(1, ncpu // 8))
    else:
        fused_conc = expl_conc = concurrency

    target = pa.schema([
        ("url", pa.string()), ("lang", pa.string()),
        ("title", pa.string()), ("text", pa.string()),
        ("references", REF_TYPE),
        ("n_pages", pa.int32()), ("n_tokens", pa.int64()),
        ("n_refs", pa.int32()), ("error", pa.string()),
    ])

    def _norm(t: pa.Table) -> pa.Table:
        return t.select(target.names).cast(target)

    fused = extract_dataset(small_ds,
                            settings=settings, with_spans=False,
                            concurrency=fused_conc) \
        .select_columns(EXPLODED_COLUMNS) \
        .map_batches(_norm, batch_format="pyarrow")
    exploded = extract_exploded(big_ds,
                                settings=settings, concurrency=expl_conc) \
        .select_columns(EXPLODED_COLUMNS) \
        .map_batches(_norm, batch_format="pyarrow")
    return fused.union(exploded)
