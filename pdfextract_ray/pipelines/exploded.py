"""Page-exploded extraction variant: the skew-proof scale path.

For pathological corpora (single documents of hundreds of pages /
hundreds of MB) even a singleton batch stalls one actor for the whole
document. This variant parallelizes WITHIN documents
(SURVEY.md §4.2 "Stragglers / skew"):

    corpus → map_batches(tokenize+explode)   # one row per (url, page)
           → map_batches(PageWorker)         # per-page stages in parallel
           → groupby("url").map_groups(assemble)   # reassembly shuffle
           → extraction rows

The per-page payload travels as pickled bytes (internal shuffle format,
never written out). The reassembly sorts by page inside the group, so
the output is byte-identical to the fused single-pass pipeline
(property-tested: explode/reassemble roundtrip, FIXTURES.md §5).

Cost: one all-to-all shuffle keyed by url. Use the fused
``extract_pipeline`` by default; switch to this when the corpus has
mega-documents (or route only oversized rows here and union).
"""

from __future__ import annotations

import pickle

import pandas as pd
import pyarrow as pa

from pdfextract_ray.kernel.document import (assemble_document, layout_pages,
                                            process_page)
from pdfextract_ray.kernel.names import load_gazetteer
from pdfextract_ray.settings import DEFAULT_SETTINGS, Settings
from pdfextract_ray.stages.extract import REF_TYPE


def explode_batch(batch: pa.Table) -> pa.Table:
    """corpus rows → one row per (url, page) carrying that page's lines."""
    urls, langs, pages, payloads = [], [], [], []
    for url, lang, html in zip(batch["url"].to_pylist(),
                               batch["lang"].to_pylist(),
                               batch["html"].to_pylist()):
        page_map = layout_pages(html if html is not None else b"")
        if not page_map:
            urls.append(url)
            langs.append(lang)
            pages.append(0)
            payloads.append(pickle.dumps(None))
            continue
        for page_no, lines in page_map.items():
            urls.append(url)
            langs.append(lang)
            pages.append(page_no)
            payloads.append(pickle.dumps(lines, protocol=pickle.HIGHEST_PROTOCOL))
    return pa.table({
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
            lines = pickle.loads(payload)
            pr = process_page(lines, self.settings) if lines else None
            results.append(pickle.dumps(pr, protocol=pickle.HIGHEST_PROTOCOL))
        return pa.table({
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
    """groupby(url).map_groups fn: reassemble one document."""
    df = df.sort_values("page")
    page_results = [pickle.loads(b) for b in df["result"]]
    page_results = [pr for pr in page_results if pr is not None]
    res = assemble_document(page_results, settings, _gazetteer())
    return pd.DataFrame({
        "url": [df["url"].iloc[0]],
        "lang": [df["lang"].iloc[0]],
        "title": [res.title],
        "text": [res.text],
        "references": [[{"content": r["content"], "order": r.get("order")}
                        for r in res.references]],
        "n_pages": [res.n_pages],
        "n_tokens": [res.n_tokens],
        "n_refs": [len(res.references)],
    })


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
    return processed.groupby("url").map_groups(
        assemble_group, batch_format="pandas",
        fn_kwargs=dict(settings=settings),
    )
