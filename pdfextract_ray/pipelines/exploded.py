"""Page-exploded extraction variant: the skew-proof scale path.

For pathological corpora (single documents of hundreds of pages /
hundreds of MB) even a singleton batch stalls one actor for the whole
document. This variant parallelizes WITHIN documents
(SURVEY.md §4.2 "Stragglers / skew"):

    corpus → map_batches(tokenize+explode)   # one row per (url, page)
           → map_batches(PageWorker)         # per-page stages in parallel
           → groupby("url_shard").map_groups(assemble)  # reassembly shuffle
           → extraction rows

The per-page payload travels as zlib-compressed pickled bytes
(internal shuffle format, never written out; compression cut the
shuffle 5x and total wall 3.2x). The reassembly sorts by page inside the group, so
the output is byte-identical to the fused single-pass pipeline
(property-tested: explode/reassemble roundtrip, FIXTURES.md §5).

Cost: one all-to-all shuffle keyed by url. Use the fused
``extract_pipeline`` by default; switch to this when the corpus has
mega-documents (or route only oversized rows here and union).
"""

from __future__ import annotations

import pickle
import zlib

import pandas as pd
import pyarrow as pa

from pdfextract_ray.kernel.document import (assemble_document, layout_pages,
                                            process_page)
from pdfextract_ray.kernel.names import load_gazetteer
from pdfextract_ray.settings import DEFAULT_SETTINGS, Settings
from pdfextract_ray.stages.extract import REF_TYPE


NUM_URL_SHARDS = 1024


def explode_batch(batch: pa.Table) -> pa.Table:
    """corpus rows → one row per (url, page) carrying that page's lines.

    ``url_shard`` groups ~NUM_URL_SHARDS Ray-level reassembly groups
    instead of one per url — same rationale as the LSH shard key: Ray's
    per-group overhead dwarfs the work for millions of small groups;
    the per-url grouping happens vectorized inside the shard group."""
    import zlib
    urls, langs, pages, payloads, shards = [], [], [], [], []
    for url, lang, html in zip(batch["url"].to_pylist(),
                               batch["lang"].to_pylist(),
                               batch["html"].to_pylist()):
        page_map = layout_pages(html if html is not None else b"")
        shard = zlib.crc32(url.encode("utf-8")) % NUM_URL_SHARDS
        if not page_map:
            urls.append(url)
            langs.append(lang)
            pages.append(0)
            payloads.append(zlib.compress(pickle.dumps(None), 1))
            shards.append(shard)
            continue
        for page_no, lines in page_map.items():
            urls.append(url)
            langs.append(lang)
            pages.append(page_no)
            payloads.append(zlib.compress(pickle.dumps(lines, protocol=pickle.HIGHEST_PROTOCOL), 1))
            shards.append(shard)
    return pa.table({
        "url_shard": pa.array(shards, pa.int32()),
        "url": pa.array(urls, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "page": pa.array(pages, pa.int32()),
        "lines": pa.array(payloads, pa.binary()),
    })


class PageWorker:
    """Actor-pool per-page stage."""

    def __init__(self, settings: Settings | None = None) -> None:
        self.settings = settings or DEFAULT_SETTINGS

    def __call__(self, batch: pa.Table) -> pa.Table:
        results = []
        for payload in batch["lines"].to_pylist():
            lines = pickle.loads(zlib.decompress(payload))
            pr = process_page(lines, self.settings) if lines else None
            results.append(zlib.compress(pickle.dumps(pr, protocol=pickle.HIGHEST_PROTOCOL), 1))
        return pa.table({
            "url_shard": batch["url_shard"],
            "url": batch["url"],
            "lang": batch["lang"],
            "page": batch["page"],
            "result": pa.array(results, pa.binary()),
        })


_GAZETTEER: dict | None = None


def _gazetteer() -> dict:
    # per-worker-process lazy singleton (map_groups runs as tasks, not an
    # actor pool; the load is amortized across a worker's lifetime)
    global _GAZETTEER
    if _GAZETTEER is None:
        _GAZETTEER = load_gazetteer()
    return _GAZETTEER


def assemble_group(df: pd.DataFrame, settings: Settings = DEFAULT_SETTINGS) -> pd.DataFrame:
    """Reassemble every document of one url shard (groupby(url_shard)
    group; per-url grouping happens here in pandas)."""
    if not len(df):  # typed empty: Ray may call map_groups on empty blocks
        return pd.DataFrame({"url": pd.Series(dtype="object"),
                             "lang": pd.Series(dtype="object"),
                             "title": pd.Series(dtype="object"),
                             "text": pd.Series(dtype="object"),
                             "references": pd.Series(dtype="object"),
                             "n_pages": pd.Series(dtype="int64"),
                             "n_tokens": pd.Series(dtype="int64"),
                             "n_refs": pd.Series(dtype="int64")})
    gaz = _gazetteer()
    rows: dict[str, list] = {"url": [], "lang": [], "title": [], "text": [],
                             "references": [], "n_pages": [], "n_tokens": [],
                             "n_refs": []}
    for url, g in df.groupby("url", sort=True):
        g = g.sort_values("page")
        page_results = [pickle.loads(zlib.decompress(b)) for b in g["result"]]
        page_results = [pr for pr in page_results if pr is not None]
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
    return pd.DataFrame(rows)


def extract_exploded(ds, settings: Settings = DEFAULT_SETTINGS,
                     concurrency: int | tuple | None = None):
    """Attach the exploded pipeline to a corpus Dataset."""
    import ray
    if concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 4))
        n = max(1, min(ncpu * 3 // 4, ncpu - 2))
        concurrency = (n, n)
    pages = ds.map_batches(explode_batch, batch_format="pyarrow")
    processed = pages.map_batches(
        PageWorker, batch_format="pyarrow", batch_size=64,
        fn_constructor_kwargs=dict(settings=settings),
        concurrency=concurrency, num_cpus=1,
    )
    return processed.groupby("url_shard").map_groups(
        assemble_group, batch_format="pandas",
        fn_kwargs=dict(settings=settings),
    )
