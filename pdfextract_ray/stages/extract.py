"""The extraction stage: an actor-pool ``map_batches`` callable.

``ExtractDocs`` is the Ray-side wrapper around the per-document kernel
(:func:`pdfextract_ray.kernel.run_document`). It is a callable CLASS so
``map_batches(ExtractDocs, concurrency=N)`` runs it as an actor pool:
the gazetteer (the analogue of the reference's process-global SQLite
handle, ``names.rb:18``) and frozen settings load ONCE per actor in
``__init__``, never per batch.

Batches are zero-copy Arrow in / Arrow out. Per-row failures are
isolated into an ``error`` column (the corpus-scale analogue of the
reference harness's per-file rescue, ``test/catalog:134-136``) so one
poisoned page cannot fail a 100-TB job's block.

``partition_id`` is a deterministic hash of ``url`` (crc32 % P): the
single partitioning key reused across output layout, lineage metrics,
and checkpoint-resume (SURVEY.md §7.3).
"""

from __future__ import annotations

import zlib

import pyarrow as pa

from pdfextract_ray.kernel.document import run_document
from pdfextract_ray.kernel.names import load_gazetteer
from pdfextract_ray.settings import DEFAULT_SETTINGS, Settings

REF_TYPE = pa.list_(pa.struct([("content", pa.string()), ("order", pa.int64())]))
SPAN_TYPE = pa.list_(pa.struct([
    ("kind", pa.string()), ("page", pa.int32()),
    ("x", pa.float64()), ("y", pa.float64()),
    ("width", pa.float64()), ("height", pa.float64()),
]))

EXTRACT_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("lang", pa.string()),
    ("partition_id", pa.int32()),
    ("title", pa.string()),
    ("text", pa.string()),
    ("references", REF_TYPE),
    ("spans", SPAN_TYPE),
    ("n_pages", pa.int32()),
    ("n_tokens", pa.int64()),
    ("n_regions", pa.int32()),
    ("n_sections", pa.int32()),
    ("n_refs", pa.int32()),
    ("error", pa.string()),
])


def url_partition(url: str | None, num_partitions: int) -> int:
    """Deterministic partition assignment (stable across runs/processes)."""
    if url is None:  # malformed row (null key) — lands in partition 0
        return 0
    return zlib.crc32(url.encode("utf-8")) % num_partitions


class ExtractDocs:
    """Actor-pool callable: corpus batch → extraction batch."""

    def __init__(self, settings: Settings | None = None,
                 num_partitions: int = 64, with_spans: bool = True) -> None:
        self.settings = settings or DEFAULT_SETTINGS
        self.gazetteer = load_gazetteer()
        self.num_partitions = num_partitions
        self.with_spans = with_spans

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()

        titles: list[str | None] = []
        texts: list[str | None] = []
        refs: list[list | None] = []
        spans: list[list | None] = []
        n_pages: list[int] = []
        n_tokens: list[int] = []
        n_regions: list[int] = []
        n_sections: list[int] = []
        n_refs: list[int] = []
        errors: list[str | None] = []

        for u, html in zip(urls, htmls):
            try:
                if u is None:
                    # null key: the row can't be deduped / checkpointed /
                    # reassembled by url — an error row, never a crash
                    raise ValueError("null url")
                r = run_document(html, self.settings, self.gazetteer)
                titles.append(r.title)
                texts.append(r.text)
                refs.append([{"content": x["content"], "order": x.get("order")}
                             for x in r.references])
                if self.with_spans:
                    row_spans = [
                        {"kind": "region", "page": reg["page"], "x": reg["x"],
                         "y": reg["y"], "width": reg["width"], "height": reg["height"]}
                        for reg in r.regions
                    ] + [
                        {"kind": z["zone"], "page": z["page"], "x": z["x"],
                         "y": z["y"], "width": z["width"], "height": z["height"]}
                        for z in r.zones
                    ]
                else:
                    row_spans = []
                spans.append(row_spans)
                n_pages.append(r.n_pages)
                n_tokens.append(r.n_tokens)
                n_regions.append(len(r.regions))
                n_sections.append(len(r.sections))
                n_refs.append(len(r.references))
                errors.append(None)
            except Exception as exc:  # per-row isolation; never fail the block
                titles.append(None)
                texts.append(None)
                refs.append([])
                spans.append([])
                n_pages.append(0)
                n_tokens.append(0)
                n_regions.append(0)
                n_sections.append(0)
                n_refs.append(0)
                errors.append("%s: %s" % (type(exc).__name__, exc))

        P = self.num_partitions
        return pa.Table.from_arrays(
            [
                batch.column("url"),
                batch.column("warc_ts"),
                batch.column("lang"),
                pa.array([url_partition(u, P) for u in urls], pa.int32()),
                pa.array(titles, pa.string()),
                pa.array(texts, pa.string()),
                pa.array(refs, REF_TYPE),
                pa.array(spans, SPAN_TYPE),
                pa.array(n_pages, pa.int32()),
                pa.array(n_tokens, pa.int64()),
                pa.array(n_regions, pa.int32()),
                pa.array(n_sections, pa.int32()),
                pa.array(n_refs, pa.int32()),
                pa.array(errors, pa.string()),
            ],
            schema=EXTRACT_SCHEMA,
        )
