"""Page-exploded extraction variant: the skew-proof scale path.

For pathological corpora (single documents of hundreds of pages /
hundreds of MB) even a singleton batch stalls one actor for the whole
document. This variant parallelizes WITHIN documents
(SURVEY.md §4.2 "Stragglers / skew"):

    corpus → map_batches(tokenize+explode)   # one row per (url, page)
           → map_batches(PageWorker)         # per-page stages in parallel
           → groupby("url_shard").map_groups(assemble)  # reassembly shuffle
           → extraction rows

Payloads are ARROW-NATIVE ``list<struct>`` columns end-to-end (typed
line rows into the page worker; typed region/zone/column/text-part
rows out of it) — zero-copy through the object store and the
reassembly shuffle, no opaque pickle blobs. The page/region dicts the
kernel consumes are rebuilt at the consuming stage boundary with
``to_pylist`` (field sets verified exhaustively regular in tests).

The reassembly sorts by page inside the group, so the output is
byte-identical to the fused single-pass pipeline (property-tested:
explode/reassemble roundtrip, FIXTURES.md §5).

Cost: one all-to-all shuffle keyed by url. Use the fused
``extract_pipeline`` by default; switch to this when the corpus has
mega-documents (or route only oversized rows here and union).
"""

from __future__ import annotations

import zlib

import pandas as pd
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


def explode_batch(batch: pa.Table) -> pa.Table:
    """corpus rows → one row per (url, page) carrying that page's lines
    as a typed ``list<struct>`` (a document with no pages emits one
    marker row with a NULL lines list so it still reaches reassembly).

    ``n_pages_total`` carries the document's page count on every page
    row so any later stage can decide locally whether it holds ALL of a
    document's pages (the batch-local assembly fast path in
    :class:`PageWorker`) without a shuffle.

    ``url_shard`` groups ~NUM_URL_SHARDS Ray-level reassembly groups
    instead of one per url — same rationale as the LSH shard key: Ray's
    per-group overhead dwarfs the work for millions of small groups;
    the per-url grouping happens vectorized inside the shard group."""
    urls, langs, pages, totals, payloads, shards = [], [], [], [], [], []
    for url, lang, html in zip(batch["url"].to_pylist(),
                               batch["lang"].to_pylist(),
                               batch["html"].to_pylist()):
        page_map = layout_pages(html if html is not None else b"")
        shard = zlib.crc32(url.encode("utf-8")) % NUM_URL_SHARDS
        if not page_map:
            urls.append(url)
            langs.append(lang)
            pages.append(0)
            totals.append(0)
            payloads.append(None)
            shards.append(shard)
            continue
        for page_no, lines in page_map.items():
            urls.append(url)
            langs.append(lang)
            pages.append(page_no)
            totals.append(len(page_map))
            payloads.append(lines)
            shards.append(shard)
    return pa.table({
        "url_shard": pa.array(shards, pa.int32()),
        "url": pa.array(urls, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "page": pa.array(pages, pa.int32()),
        "n_pages_total": pa.array(totals, pa.int32()),
        "lines": pa.array(payloads, pa.list_(LAYOUT_LINE_T)),
    })


WORKER_SCHEMA = pa.schema([
    ("url_shard", pa.int32()), ("url", pa.string()),
    ("lang", pa.string()), ("page", pa.int32()),
    ("assembled", pa.bool_()),
    # page-residue payload (assembled == false)
    ("n_glyphs", pa.int64()), ("n_chunks", pa.int64()),
    ("regions", pa.list_(REGION_T)), ("columns", pa.list_(COLUMN_T)),
    ("zones", pa.list_(ZONE_T)), ("text_parts", pa.list_(pa.string())),
    # finished-document payload (assembled == true)
    ("title", pa.string()), ("text", pa.string()),
    ("references", REF_TYPE),
    ("n_pages", pa.int64()), ("n_tokens", pa.int64()),
    ("n_refs", pa.int64()),
])


class PageWorker:
    """Actor-pool per-page stage with a batch-local assembly combiner.

    Typed line rows in; out is a UNION of finished documents and
    residual page rows (``assembled`` flag discriminates):

    - a url whose pages ALL sit in this batch (checked against the
      carried ``n_pages_total`` — no global knowledge needed) is
      assembled HERE: per-page stages then the document-scoped stages,
      emitting one finished row. This is the common case (explode keeps
      a document's pages contiguous, so a small doc straddles a batch
      boundary only when it happens to sit on one).
    - pages of documents that straddle batch/block/task boundaries —
      including every mega-document, the reason this pipeline exists —
      are emitted as typed page-result rows for the reassembly shuffle.

    Scale effect: the downstream all-to-all moves final document rows
    (title/text/references) plus a boundary residue of page payloads,
    instead of EVERY page's regions/zones/text-parts (several times the
    final text size). Group work in the reduce collapses to a
    pass-through for finished rows."""

    def __init__(self, settings: Settings | None = None) -> None:
        self.settings = settings or DEFAULT_SETTINGS
        self.gazetteer = load_gazetteer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {name: [] for name in WORKER_SCHEMA.names}

        def emit(**kw) -> None:
            for name in WORKER_SCHEMA.names:
                cols[name].append(kw.get(name))

        # group the batch's rows by url in first-seen order
        by_url: dict[str, list[int]] = {}
        urls = batch["url"].to_pylist()
        for i, url in enumerate(urls):
            by_url.setdefault(url, []).append(i)
        shards = batch["url_shard"].to_pylist()
        langs = batch["lang"].to_pylist()
        pages = batch["page"].to_pylist()
        totals = batch["n_pages_total"].to_pylist()
        lines_col = batch["lines"].to_pylist()

        for url, idxs in by_url.items():
            i0 = idxs[0]
            results = [(pages[i], process_page(lines_col[i], self.settings))
                       for i in idxs if lines_col[i] is not None]
            if len(results) == totals[i0]:
                # every page is local: run document-scoped stages now
                results.sort(key=lambda pr: pr[0])
                res = assemble_document([pr for _, pr in results],
                                        self.settings, self.gazetteer)
                emit(url_shard=shards[i0], url=url, lang=langs[i0],
                     assembled=True, title=res.title, text=res.text,
                     references=[{"content": r["content"], "order": r.get("order")}
                                 for r in res.references],
                     n_pages=res.n_pages, n_tokens=res.n_tokens,
                     n_refs=len(res.references))
                continue
            # a no-pages marker url always assembles above (0 == 0), so
            # residue rows are real pages only
            for i, (page_no, pr) in zip(
                    (i for i in idxs if lines_col[i] is not None), results):
                emit(url_shard=shards[i], url=url, lang=langs[i],
                     page=page_no, assembled=False,
                     n_glyphs=pr["n_glyphs"], n_chunks=pr["n_chunks"],
                     regions=pr["regions"], columns=pr["columns"],
                     zones=pr["zones"], text_parts=pr["text_parts"])
        return pa.table({name: pa.array(cols[name], WORKER_SCHEMA.field(name).type)
                         for name in WORKER_SCHEMA.names})


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
    ("n_refs", pa.int64()),
])


def assemble_group(df: pd.DataFrame, settings: Settings = DEFAULT_SETTINGS) -> pa.Table:
    """Reassemble one url shard (groupby(url_shard) group; per-url
    grouping happens here in pandas). Rows the :class:`PageWorker`
    already assembled pass straight through; only the boundary/mega-doc
    page residue runs the document-scoped stages here. Returns a TYPED
    Arrow table — pandas inference would type an all-empty
    ``references`` block as ``list<null>``, which cannot unify with
    ``list<struct>`` blocks at write time."""
    if not len(df):  # typed empty: Ray may call map_groups on empty blocks
        return ASSEMBLE_SCHEMA.empty_table()
    rows: dict[str, list] = {"url": [], "lang": [], "title": [], "text": [],
                             "references": [], "n_pages": [], "n_tokens": [],
                             "n_refs": []}
    done = df[df["assembled"]]
    for url, lang, title, text, refs, np_, nt, nr in zip(
            done["url"], done["lang"], done["title"], done["text"],
            done["references"], done["n_pages"], done["n_tokens"],
            done["n_refs"]):
        rows["url"].append(url)
        rows["lang"].append(lang)
        rows["title"].append(title)
        rows["text"].append(text)
        rows["references"].append(
            [] if refs is None else [dict(r) for r in refs])
        rows["n_pages"].append(int(np_))
        rows["n_tokens"].append(int(nt))
        rows["n_refs"].append(int(nr))

    residue = df[~df["assembled"]]
    gaz = _gazetteer() if len(residue) else None
    for url, g in residue.groupby("url", sort=True):
        g = g.sort_values("page")
        page_results = [
            {"n_glyphs": int(ng), "n_chunks": int(nc),
             "regions": _to_dicts(regs), "columns": _to_dicts(cols),
             "zones": _to_dicts(zns), "text_parts": list(tp)}
            for ng, nc, regs, cols, zns, tp in zip(
                g["n_glyphs"], g["n_chunks"], g["regions"], g["columns"],
                g["zones"], g["text_parts"])]
        res = assemble_document(page_results, settings, gaz)
        rows["url"].append(url)
        rows["lang"].append(g["lang"].iloc[0])
        rows["title"].append(res.title)
        rows["text"].append(res.text)
        rows["references"].append([{"content": r["content"], "order": r.get("order")}
                                   for r in res.references])
        rows["n_pages"].append(res.n_pages)
        rows["n_tokens"].append(res.n_tokens)
        rows["n_refs"].append(len(res.references))
    return pa.table(
        {name: pa.array(rows[name], ASSEMBLE_SCHEMA.field(name).type)
         for name in ASSEMBLE_SCHEMA.names})


def _to_dicts(objs) -> list[dict]:
    """Normalize a struct-list cell (the Arrow→pandas round-trip
    surfaces numpy arrays for list values) to plain list-of-dict with
    plain-list nested 'lines' — the kernel relies on list/dict
    semantics (truthiness, extend)."""
    if objs is None:
        return []
    out = []
    for o in objs:
        d = dict(o)
        if "lines" in d and d["lines"] is not None:
            d["lines"] = [dict(l) for l in d["lines"]]
        out.append(d)
    return out


def extract_exploded(ds, settings: Settings = DEFAULT_SETTINGS,
                     concurrency: int | tuple | None = None,
                     shuffle_partitions: int | None = None,
                     page_batch_size: int = 64):
    """Attach the exploded pipeline to a corpus Dataset.

    ``shuffle_partitions`` coalesces the page-result blocks before the
    reassembly groupby: the range sort's task count is quadratic in
    block count, and Arrow ``take`` on nested ``list<struct>`` columns
    is row-wise — fewer, larger blocks cut the shuffle wall time ~3x
    (measured 23s → 8s at sf0.1/32cpu). Default: one partition per
    CPU-pool slot, min 8.

    ``page_batch_size`` bounds a PageWorker batch in pages; it is also
    the local-assembly window — documents no larger than a batch
    usually finish inside the worker and skip the shuffle entirely
    (tests shrink it to force the residue path)."""
    import ray
    ncpu = int(ray.cluster_resources().get("CPU", 4))
    if concurrency is None:
        n = max(1, min(ncpu * 3 // 4, ncpu - 2))
        concurrency = (n, n)
    if shuffle_partitions is None:
        shuffle_partitions = max(8, ncpu // 4)
    pages = ds.map_batches(explode_batch, batch_format="pyarrow")
    processed = pages.map_batches(
        PageWorker, batch_format="pyarrow", batch_size=page_batch_size,
        fn_constructor_kwargs=dict(settings=settings),
        concurrency=concurrency, num_cpus=1,
    )
    return processed.repartition(shuffle_partitions) \
        .groupby("url_shard").map_groups(
            assemble_group, batch_format="pandas",
            fn_kwargs=dict(settings=settings),
    )


EXPLODED_COLUMNS = ["url", "lang", "title", "text", "references",
                    "n_pages", "n_tokens", "n_refs"]


def extract_adaptive_pushdown(paths, settings: Settings = DEFAULT_SETTINGS,
                              threshold_bytes: int = 64 * 1024,
                              concurrency: tuple | None = None):
    """One-read skew router over a corpus that carries an ``html_size``
    metadata column (the synthetic corpus does; Common-Crawl indexes
    do too): each branch is a ``read_parquet`` with a pushdown
    predicate on ``html_size``, so the Arrow scanner drops non-matching
    rows during the scan — each row's html bytes enter the pipeline
    exactly once, and row-group min/max stats prune the (mostly empty)
    mega-doc side. Prefer this over :func:`extract_adaptive` whenever
    the input is parquet with a size column; fall back to the
    Dataset-based router only for in-memory corpora."""
    import pyarrow.compute as pc
    import ray
    from pdfextract_ray.pipelines.extract_pipeline import CORPUS_COLUMNS

    small = ray.data.read_parquet(
        paths, columns=CORPUS_COLUMNS,
        filter=pc.field("html_size") <= threshold_bytes)
    big = ray.data.read_parquet(
        paths, columns=CORPUS_COLUMNS,
        filter=pc.field("html_size") > threshold_bytes)
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
    predicate makes each row enter the pipeline once."""
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
        ("n_refs", pa.int32()),
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
