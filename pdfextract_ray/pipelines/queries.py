"""Query registry: every operator as a (Ray pipeline, DuckDB oracle) pair.

``QUERIES[name](sf_dir)`` returns a Dataset / pandas / Arrow result;
``ORACLES[name]`` is equivalent ANSI SQL over the same parquet tables
(pre-registered DuckDB views: region nation customer supplier part
orders lineitem events documents embeddings). Column names match
exactly between both sides (the driver hashes values under sorted
column names). Non-SQL-expressible pipelines (extraction goldens,
hyperplane LSH, media decode) have no oracle → rows-only check; even
the MinHash-LSH clustering pipeline has an exact SQL mirror
(``_DEDUP_MINHASH_SQL``: crc32 via an inlined table, wraparound
minhash via HUGEINT, recursive-CTE components).

Float columns: per-row int/int divisions are bit-identical across
engines (same IEEE operands) and are left exact; money/value SUMS are
integerized per row (4-decimal ticks — see relational.to_ticks) so the
int64 aggregation is order-independent and bit-exact in both engines;
single-value floats (cosines) are grid-snapped at 1e-6.
"""

from __future__ import annotations

import functools
import os

import pyarrow as pa

from pdfextract_ray.pipelines.relational import (coalesce_for_join,
                                                 join_partitions)
from pdfextract_ray.stages.textstats import stopwords_sql_list

EXTRACT_CACHE_ROOT = "/tmp/pdfx_extract"


def _pq(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, name + ".parquet")


# the driver's testdata parquet embeds b'pandas' schema metadata;
# reads strip it via the schema= override (_clean_schema below), and
# this shared batch fn (one copy, relational.py) re-normalizes
# pandas-origin blocks right before hash joins / groupbys
from pdfextract_ray.pipelines.relational import \
    strip_schema_metadata as _strip_schema_metadata


def _clean_schema(path: str, columns=None):
    """Metadata-free (hashable) read schema, pruned to ``columns`` so it
    matches the scanner's pruned batches; one local footer read."""
    import pyarrow.parquet as pq
    schema = pq.read_schema(path).remove_metadata()
    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])
    return schema


def _read(sf_dir: str, name: str, columns=None):
    import ray.data
    path = _pq(sf_dir, name)
    return ray.data.read_parquet(path, schema=_clean_schema(path, columns),
                                 columns=columns)


def _read_balanced(sf_dir: str, name: str, columns=None):
    """Pruned read that guarantees enough blocks to parallelize the
    first map stage. Parquet readers can't split below row-group
    granularity, so a table written as one row group yields ONE block
    and serializes whatever map follows (measured: the minhash banding
    kernel is ~1 CPU-s at sf0.1 but ran as a single task). When the
    footer says the input is under-partitioned relative to the cluster
    (fewer row groups than CPUs), coalesce-split it with a repartition
    of the PRUNED columns; on a real multi-file / multi-row-group
    corpus the condition is false and this is exactly ``_read``."""
    import pyarrow.parquet as pq
    import ray
    import ray.data

    ds = ray.data.read_parquet(_pq(sf_dir, name),
                               schema=_clean_schema(_pq(sf_dir, name), columns),
                               columns=columns)
    try:
        n_groups = pq.ParquetFile(_pq(sf_dir, name)).metadata.num_row_groups
        cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
    except Exception:
        return ds
    if n_groups < cpus:
        ds = ds.repartition(cpus * 2)
    return ds


# ------------------------------------------------------------------ corpus

def ensure_extracted(sf_dir: str) -> str:
    """Run (or resume) the flagship extraction for an sf dir; cached."""
    from pdfextract_ray.pipelines.extract_pipeline import run_extract
    from pdfextract_ray.sources.corpus import ensure_corpus

    corpus = ensure_corpus(sf_dir)
    # key the extract cache by the CORPUS cache key (which embeds a
    # fingerprint of the source table): a regenerated or relocated
    # documents.parquet gets a fresh extraction dir instead of
    # colliding with a stale one (the resume guard would refuse it)
    out_dir = os.path.join(EXTRACT_CACHE_ROOT, os.path.basename(corpus))
    run_extract(corpus, out_dir, num_shards=4, resume=True)
    return out_dir


def _read_extracted(sf_dir: str, columns=None):
    import glob
    import ray.data
    out_dir = ensure_extracted(sf_dir)
    files = sorted(glob.glob(os.path.join(out_dir, "shard=*", "*.parquet")))
    return ray.data.read_parquet(files, columns=columns)


def q_extract_flagship(sf_dir: str):
    """Flagship: corpus → extraction (live pipeline, no cache)."""
    from pdfextract_ray.pipelines.extract_pipeline import extract_dataset, read_corpus
    from pdfextract_ray.sources.corpus import ensure_corpus

    corpus = ensure_corpus(sf_dir)
    out = extract_dataset(read_corpus(corpus), with_spans=False)
    return out.select_columns(["url", "title", "text", "n_pages", "n_regions",
                               "n_sections", "n_refs", "n_tokens", "error"])


def q_extract_exploded(sf_dir: str):
    """Page-exploded variant (flat_map pages → per-page actors →
    groupby(url) reassembly); equals the fused pipeline byte-for-byte."""
    from pdfextract_ray.pipelines.exploded import extract_exploded
    from pdfextract_ray.pipelines.extract_pipeline import read_corpus
    from pdfextract_ray.sources.corpus import ensure_corpus

    corpus = ensure_corpus(sf_dir)
    return extract_exploded(read_corpus(corpus))


def q_extract_adaptive(sf_dir: str):
    """Hybrid skew router: small docs through the fused pipeline,
    oversized docs through the page-exploded path; union of both.
    One-read routing: each branch is a ``read_parquet`` with a pushdown
    predicate on the corpus's ``html_size`` metadata column, so a row's
    html bytes enter the pipeline exactly once. The threshold is
    derived from the corpus's own size distribution (p99 via a
    distributed log2 histogram — see ``derive_size_threshold``), so
    the exploded branch gets exactly the heavy tail at ANY scale —
    both branches exercise even on the test corpus, with no magic
    constant baked into the registered query."""
    from pdfextract_ray.pipelines.exploded import extract_adaptive_pushdown
    from pdfextract_ray.sources.corpus import ensure_corpus

    corpus = ensure_corpus(sf_dir)
    return extract_adaptive_pushdown(corpus)


def q_extract_references(sf_dir: str):
    """Exploded citation rows from the cached extraction output.

    Fully vectorized explode of the ``list<struct>`` column:
    ``pc.list_parent_indices`` fans the parent urls out and
    ``pc.list_flatten`` + ``pc.struct_field`` project the child
    fields — no per-row Python loop (this explode feeds three query
    paths: extract_references, resolved_references, bibtex)."""
    import pyarrow.compute as pc
    ds = _read_extracted(sf_dir, columns=["url", "references"])

    def explode(t: pa.Table) -> pa.Table:
        refs = t["references"].combine_chunks()
        parents = pc.list_parent_indices(refs)
        flat = pc.list_flatten(refs)
        return pa.table({
            "url": pc.take(t["url"].combine_chunks(), parents),
            "ref_order": pc.struct_field(flat, "order"),
            "ref_content": pc.struct_field(flat, "content"),
        })

    return ds.map_batches(explode, batch_format="pyarrow")


def q_extract_titles(sf_dir: str):
    return _read_extracted(sf_dir, columns=["url", "title", "n_pages", "n_refs"])


def q_extract_xml(sf_dir: str):
    """XmlView projection over the cached extraction output."""
    from pdfextract_ray.views import render_xml_batch
    return _read_extracted(sf_dir, columns=["url", "title", "references",
                                            "spans", "n_pages"]) \
        .map_batches(render_xml_batch, batch_format="pyarrow") \
        .select_columns(["url", "xml"])


def q_extract_xml_spatials(sf_dir: str):
    """Full XmlView render (per-spatial-type, xml_view.rb analogue) of
    every corpus doc: all five types, default precision/lines."""
    from pdfextract_ray.pipelines.extract_pipeline import read_corpus
    from pdfextract_ray.sources.corpus import ensure_corpus
    from pdfextract_ray.views import ALL_SPATIAL_TYPES, XmlSpatials

    corpus = ensure_corpus(sf_dir)
    return read_corpus(corpus).map_batches(
        XmlSpatials, batch_format="pyarrow", batch_size=32,
        concurrency=(1, 4),
        fn_constructor_kwargs=dict(types=ALL_SPATIAL_TYPES))


def q_extract_mark_svg(sf_dir: str):
    """PdfView "mark" visual overlay: per-doc SVG with one translucent
    rectangle per region/zone span (pdf_view.rb analogue)."""
    from pdfextract_ray.views import render_mark_batch
    return _read_extracted(sf_dir, columns=["url", "spans"]) \
        .map_batches(render_mark_batch, batch_format="pyarrow")


def q_resolved_references(sf_dir: str):
    """Mock-resolver enrichment over exploded refs (I/O-pool shape)."""
    from pdfextract_ray.stages.resolve import ResolveReferences
    return q_extract_references(sf_dir).map_batches(
        ResolveReferences, batch_format="pyarrow",
        concurrency=(1, 4), num_cpus=0.25,
    ).select_columns(["url", "ref_order", "doi", "score", "resolved_by"])


def q_bibtex(sf_dir: str):
    """BibView analogue: BibTeX entries for resolved refs (score >= 1)."""
    import pyarrow.compute as pc
    from pdfextract_ray.stages.resolve import ResolveReferences, render_bibtex_batch
    ds = q_extract_references(sf_dir).map_batches(
        ResolveReferences, batch_format="pyarrow",
        concurrency=(1, 4), num_cpus=0.25,
    ).map_batches(render_bibtex_batch, batch_format="pyarrow")
    return ds.map_batches(
        lambda t: t.filter(pc.is_valid(t["bibtex"])), batch_format="pyarrow"
    ).select_columns(["url", "ref_order", "bibtex"])


def q_references_pipeline(sf_dir: str):
    """The reference's full citation chain in ONE pass: exploded
    reference rows → mock-resolver enrichment (I/O-pool shape,
    fractional-CPU actors) → BibTeX render. One row per citation with
    the split content, the resolution result, and the rendered BibTeX
    (null when score < 1 — the BibView cut).

    Merges the three per-step driver queries (``extract_references``,
    ``resolved_references``, ``bibtex``) into a single registry entry:
    each step's columns pin that step's output, and the resolve pass
    runs once instead of twice (resolved_references and bibtex each
    re-ran it)."""
    from pdfextract_ray.stages.resolve import ResolveReferences, render_bibtex_batch
    return q_extract_references(sf_dir).map_batches(
        ResolveReferences, batch_format="pyarrow",
        concurrency=(1, 4), num_cpus=0.25,
    ).map_batches(render_bibtex_batch, batch_format="pyarrow") \
     .select_columns(["url", "ref_order", "ref_content", "doi", "score",
                      "resolved_by", "bibtex"])


def q_extract_views(sf_dir: str):
    """Every render sink in one pass per doc: (url, title, xml, svg)
    via :class:`pdfextract_ray.views.ExtractViews` — the title pick,
    the FULL per-type XmlView render (all five spatial types, default
    precision/lines) and the PdfView "mark" SVG overlay share one
    kernel extraction. Merges ``extract_titles`` +
    ``extract_xml_spatials`` + ``extract_mark_svg``."""
    from pdfextract_ray.pipelines.extract_pipeline import read_corpus
    from pdfextract_ray.sources.corpus import ensure_corpus
    from pdfextract_ray.views import ALL_SPATIAL_TYPES, ExtractViews

    corpus = ensure_corpus(sf_dir)
    return read_corpus(corpus).map_batches(
        ExtractViews, batch_format="pyarrow", batch_size=32,
        concurrency=(1, 4),
        fn_constructor_kwargs=dict(types=ALL_SPATIAL_TYPES))


def q_extraction_metrics(sf_dir: str):
    """Per-partition lineage counters of the flagship run (the north
    rule's audit surface): one row per (shard, partition_id) with
    rows/refs/tokens/pages/errors, read from the job's _metrics
    manifests."""
    import json
    out_dir = ensure_extracted(sf_dir)
    from pdfextract_ray.state.manifest import metrics_dir
    rows = []
    mdir = metrics_dir(out_dir)
    for name in sorted(os.listdir(mdir)):
        if not name.endswith(".json"):
            continue
        shard = int(name[6:-5])
        with open(os.path.join(mdir, name), encoding="utf-8") as f:
            payload = json.load(f)
        for p in payload.get("partitions", []):
            rows.append({"shard": shard, **{k: int(v) for k, v in p.items()}})
    import pandas as pd
    return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)


def q_extract_accuracy(sf_dir: str):
    """Accuracy scoreboard: extracted-reference counts vs the golden
    catalog (reference ``test/catalog:144-176`` ``stats`` analogue).

    The reference's ``stats`` command diffs ``parse_xml_citations``
    counts against the catalog's ground-truth citations per DOI and
    reports the all-matched success rate (``diff_list`` =
    ``|left.count - right.count|``, catalog:53-55). Here the catalog is
    ``tests/golden/summary.json`` (48 docs with frozen reference
    lists, the ``accept`` analogue) and the diff histogram is computed
    distributed: extraction output → pushdown-pruned (url, n_refs)
    read → per-batch diff vs the broadcast 48-entry catalog →
    ``groupby(diff).count()``.

    Like the reference's catalog pins specific PDF files, this catalog
    pins its own corpus (sf0.001-derived), so the harness always scores
    against the catalog corpus regardless of ``sf_dir``. Output: one
    row per distinct ``ref_count_diff`` with ``n_docs``, plus the
    all-matched count is ``n_docs`` where diff = 0 (at golden parity:
    exactly one row, (0, 48)).
    """
    import json
    import pyarrow.compute as pc

    golden = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "tests", "golden", "summary.json")
    with open(golden, encoding="utf-8") as f:
        catalog = json.load(f)
    # tiny fixed-size side (48 urls) — closure broadcast, not a shuffle
    expected = {url: len(rec["references"]) for url, rec in catalog.items()}

    ds = _read_extracted("/root/testdata/sf0.001", columns=["url", "n_refs"])
    url_set = pa.array(sorted(expected), pa.string())

    def diff_batch(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["url"], value_set=url_set))
        diffs = [abs(int(n) - expected[u])
                 for u, n in zip(t["url"].to_pylist(), t["n_refs"].to_pylist())]
        return pa.table({"ref_count_diff": pa.array(diffs, pa.int64())})

    hist = (ds.map_batches(diff_batch, batch_format="pyarrow")
              .groupby("ref_count_diff").count())
    import pandas as pd
    out = hist.to_pandas().rename(columns={"count()": "n_docs"})
    return out.sort_values("ref_count_diff", ignore_index=True)


def q_curate_corpus(sf_dir: str):
    """Composed training-data curation: extraction → quality filter
    (has title, has refs, non-trivial text) → exact dedup on extracted
    text (hash groupby keep-min-url) → curated rows. The end-to-end
    shape a corpus-curation user runs daily."""
    ds = _read_extracted(sf_dir, columns=["url", "title", "text", "lang",
                                          "n_refs", "n_tokens", "error"])
    return curate_exact(ds)


def curate_exact(ds):
    """Quality filter → exact text dedup (min-url per hash) over any
    Dataset with (url, title, text, lang, n_refs, n_tokens). The
    exact-only sibling of :func:`curate_neardup` (CLI ``curate
    --exact-only``)."""
    import hashlib
    import zlib
    import pandas as pd
    import pyarrow.compute as pc

    def keep_quality(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t["title"]),
                     pc.and_(pc.greater(t["n_refs"], 0),
                             pc.greater(pc.utf8_length(
                                 pc.fill_null(t["text"], "")), 200)))
        return t.filter(pc.fill_null(ok, False))

    def hash_project(t: pa.Table) -> pa.Table:
        """Hash the text, DROP it, and add a shard key: the dedup
        shuffle moves only (shard, hash, small metadata), never text.
        The shard key groups ~256 Ray-level groups (millions of
        mostly-singleton text_hash groups would pay Ray's per-group
        overhead; the per-hash argmin runs vectorized inside the
        shard — same pattern as stages/dedup.minhash_bands_batch)."""
        hashes = [hashlib.md5((x or "").encode()).hexdigest()
                  for x in t["text"].to_pylist()]
        shards = [zlib.crc32(h.encode()) & 0xFF for h in hashes]
        return pa.table({
            "shard": pa.array(shards, pa.int32()),
            "text_hash": pa.array(hashes, pa.string()),
            "url": t["url"], "lang": t["lang"], "title": t["title"],
            "n_refs": t["n_refs"], "n_tokens": t["n_tokens"],
        })

    filtered = ds.map_batches(keep_quality, batch_format="pyarrow") \
                 .map_batches(hash_project, batch_format="pyarrow")

    def keep_min_url(df: pd.DataFrame) -> pd.DataFrame:
        """Per shard: the min-url row of every text_hash, carrying all
        output columns through the aggregation — no driver keep-set."""
        if not len(df):
            return pd.DataFrame({"shard": pd.Series(dtype="int32"),
                                 "text_hash": pd.Series(dtype="object"),
                                 "url": pd.Series(dtype="object"),
                                 "lang": pd.Series(dtype="object"),
                                 "title": pd.Series(dtype="object"),
                                 "n_refs": pd.Series(dtype="int64"),
                                 "n_tokens": pd.Series(dtype="int64")})
        return df.sort_values(["text_hash", "url"]) \
                 .drop_duplicates("text_hash", keep="first")

    return filtered.groupby("shard") \
        .map_groups(keep_min_url, batch_format="pandas") \
        .select_columns(["url", "lang", "title", "n_refs", "n_tokens"])


def q_curate_corpus_neardup(sf_dir: str):
    """The full curation flagship: extraction → quality filter → exact
    dedup (min-url per text hash) → MinHash-LSH near-dup clustering
    (distributed label propagation) → cluster representatives only.
    The end-to-end composition a 100-TB webtext curation job runs."""
    ds = _read_extracted(sf_dir, columns=["url", "title", "text", "lang",
                                          "n_refs", "n_tokens", "error"])
    return curate_neardup(ds)


def q_curate_corpus_annotated(sf_dir: str):
    """The curation flagship as ONE annotated table: every exact-dedup
    winner with its near-dup verdict (``is_representative``). The
    registry's single curation entry — the r3 ``curate_corpus`` output
    is this table's rows, ``curate_corpus_neardup``'s output is its
    ``is_representative`` rows (regression-tested equal); both stages
    stay driver-evidenced inside the 50-entry snapshot cap."""
    ds = _read_extracted(sf_dir, columns=["url", "title", "text", "lang",
                                          "n_refs", "n_tokens", "error"])
    return curate_annotated(ds)


def curate_neardup(ds):
    """Quality filter → exact dedup → near-dup clustering → reps, over
    any Dataset with (url, title, text, lang, n_refs, n_tokens).

    No shuffle in this composition ever moves raw text, and no
    corpus-derived collection ever lands on the driver:

    - the one full-text pass (``hash_id_project``) computes BOTH the
      exact-dedup md5 and the 512-byte MinHash signature, then DROPS
      text — the exact-dedup groupby moves (hash, sig, metadata) only;
    - LSH banding runs from the carried signature
      (``bands_from_sig_batch``), no re-read of winners;
    - near-dup non-representatives are removed map-side when their id
      list fits an explicit bound (ints only, ``ray.put`` once,
      ``pc.is_in`` filter — no join operator, no corpus repartition);
      above the bound (at web scale the drop set can be 20-50% of the
      corpus) the plan stays a distributed hash-partitioned
      ``left_anti`` join on doc_id."""
    exact, pairs = _curate_exact_pairs(ds)
    out_cols = ["url", "lang", "title", "n_refs", "n_tokens"]
    dropped = _neardup_drop_ids(pairs)
    if dropped is None or dropped.count() == 0:
        return exact.select_columns(out_cols)
    drop_ref = _drop_ids_ref(dropped)
    if drop_ref is not None:
        import pyarrow.compute as pc
        import ray

        def anti(t: pa.Table) -> pa.Table:
            mask = pc.invert(pc.is_in(t["doc_id"],
                                      value_set=ray.get(drop_ref)))
            return t.filter(mask).select(out_cols)

        return exact.map_batches(anti, batch_format="pyarrow")
    # distributed anti-join: winners minus near-dup non-representatives,
    # hash-partitioned on doc_id — nothing lands on the driver. The
    # left side is map_groups-derived, so it gets the same pre-join
    # coalesce (cluster-proportional n: exact is corpus-sized).
    reps = coalesce_for_join(exact, n=join_partitions()).join(
        dropped, join_type="left_anti", num_partitions=join_partitions(),
        on=("doc_id",), right_on=("drop_id",))
    return reps.select_columns(out_cols)


def curate_annotated(ds):
    """One-table curation: the exact-dedup keep-set ANNOTATED with the
    near-dup clustering verdict (``is_representative``) instead of
    filtered by it — every row of this table is an exact-stage winner;
    the rows with ``is_representative`` are exactly
    :func:`curate_neardup`'s output. Same tiers as curate_neardup (the
    map-side pass flags instead of filtering; the distributed fallback
    is a ``left_outer`` join instead of ``left_anti``); one table
    encodes both stages' keep-sets."""
    import pyarrow.compute as pc

    exact, pairs = _curate_exact_pairs(ds)
    out_cols = ["url", "lang", "title", "n_refs", "n_tokens"]
    dropped = _neardup_drop_ids(pairs)
    if dropped is None or dropped.count() == 0:
        return exact.select_columns(out_cols).map_batches(
            lambda t: t.append_column(
                "is_representative",
                pa.array([True] * len(t), pa.bool_())),
            batch_format="pyarrow")
    drop_ref = _drop_ids_ref(dropped)
    if drop_ref is not None:
        import ray

        def flag_mapside(t: pa.Table) -> pa.Table:
            rep = pc.invert(pc.is_in(t["doc_id"],
                                     value_set=ray.get(drop_ref)))
            return t.select(out_cols).append_column(
                "is_representative", rep)

        return exact.map_batches(flag_mapside, batch_format="pyarrow")
    # the right side needs a NON-KEY payload column: Ray 2.49's
    # left_outer join omits the right KEY column from its output
    # entirely (even on matched rows), so null-testing drop_id can
    # never see a match — a marker column survives the join instead
    marked = coalesce_for_join(dropped.map_batches(
        lambda t: t.append_column(
            "_dropped", pa.array([True] * len(t), pa.bool_())),
        batch_format="pyarrow"))
    annotated = coalesce_for_join(exact, n=join_partitions()).join(
        marked, join_type="left_outer", num_partitions=join_partitions(),
        on=("doc_id",), right_on=("drop_id",))

    def flag(t: pa.Table) -> pa.Table:
        # a block from an empty right partition can still arrive
        # without the marker column at all — no match, representative
        rep = pc.is_null(t["_dropped"]) \
            if "_dropped" in t.column_names \
            else pa.array([True] * len(t), pa.bool_())
        return t.select(out_cols).append_column("is_representative", rep)

    return annotated.map_batches(flag, batch_format="pyarrow")


def _curate_exact_pairs(ds):
    """Shared front of the curation pipeline: quality filter → one
    full-text pass (md5 + doc id + MinHash signature, text dropped) →
    exact dedup (min-url per hash) → LSH band pairs. Returns the
    materialized (exact, pairs) datasets."""
    import hashlib
    import zlib
    import pandas as pd
    import pyarrow.compute as pc
    from pdfextract_ray.stages.dedup import (bands_from_sig_batch,
                                             default_shard_mask,
                                             minhash_signature,
                                             shard_pairs_group)

    def keep_quality(t: pa.Table) -> pa.Table:
        ok = pc.and_(pc.is_valid(t["title"]),
                     pc.and_(pc.greater(t["n_refs"], 0),
                             pc.greater(pc.utf8_length(
                                 pc.fill_null(t["text"], "")), 200)))
        return t.filter(pc.fill_null(ok, False))

    def hash_id_project(t: pa.Table) -> pa.Table:
        """ONE pass over the text: exact-dedup md5, stable 63-bit doc
        id from url, and the MinHash signature — then text is dropped
        so no later shuffle carries it."""
        hashes, ids, sigs = [], [], []
        for url, text in zip(t["url"].to_pylist(), t["text"].to_pylist()):
            text = text or ""
            hashes.append(hashlib.md5(text.encode()).hexdigest())
            ids.append(int.from_bytes(
                hashlib.md5(url.encode()).digest()[:8], "big") >> 1)
            sigs.append(minhash_signature(text).astype("<u8").tobytes())
        shards = [zlib.crc32(h.encode()) & 0xFF for h in hashes]
        return pa.table({
            "shard": pa.array(shards, pa.int32()),
            "text_hash": pa.array(hashes, pa.string()),
            "doc_id": pa.array(ids, pa.int64()),
            "sig": pa.array(sigs, pa.binary()),
            "url": t["url"], "lang": t["lang"], "title": t["title"],
            "n_refs": t["n_refs"], "n_tokens": t["n_tokens"],
        })

    filtered = ds.map_batches(keep_quality, batch_format="pyarrow") \
                 .map_batches(hash_id_project, batch_format="pyarrow")

    def keep_min_url(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({c: pd.Series(dtype=dt) for c, dt in [
                ("shard", "int32"), ("text_hash", "object"),
                ("doc_id", "int64"), ("sig", "object"), ("url", "object"),
                ("lang", "object"), ("title", "object"),
                ("n_refs", "int64"), ("n_tokens", "int64")]})
        return df.sort_values(["text_hash", "url"]) \
                 .drop_duplicates("text_hash", keep="first")

    exact = filtered.groupby("shard") \
        .map_groups(keep_min_url, batch_format="pandas") \
        .map_batches(_strip_schema_metadata, batch_size=None,
                     batch_format="pyarrow") \
        .materialize()

    bands = exact.select_columns(["doc_id", "sig"]) \
        .map_batches(functools.partial(bands_from_sig_batch,
                                       shard_mask=default_shard_mask()),
                     batch_format="pyarrow")
    pairs = bands.groupby("shard") \
        .map_groups(shard_pairs_group, batch_format="pandas").materialize()
    return exact, pairs


def _neardup_drop_ids(pairs):
    """Near-dup pair stream → Dataset of ``drop_id`` (the non-
    representative member ids), or None when no pairs exist. Shared by
    the anti-join (:func:`curate_neardup`) and the annotating left
    join (:func:`curate_annotated`)."""
    import pyarrow.compute as pc
    from pdfextract_ray.stages.dedup import label_propagation_components

    if pairs.count() == 0:
        return None
    labels = label_propagation_components(pairs)
    # coalesce_for_join compacts the label stream's many tiny blocks:
    # Ray 2.49's hash join rejects schema-less EMPTY blocks on the
    # right side ("No match for key field reference")
    return coalesce_for_join(labels.map_batches(
        lambda t: pa.table({"drop_id": pc.cast(
            t["node"].combine_chunks() if hasattr(t["node"], "combine_chunks")
            else t["node"], pa.int64())}).filter(
            pc.not_equal(t["node"], t["label"])),
        batch_format="pyarrow"))


_BROADCAST_DROP_LIMIT = 2_000_000


def _drop_ids_ref(dropped):
    """ObjectRef of the sorted drop-id int64 array when the drop set
    fits ``_BROADCAST_DROP_LIMIT`` (ids only — 16 MB at the bound —
    the same explicit-bound precedent as ``_pair_text_join``), else
    None → caller uses the distributed join tier."""
    import numpy as np
    import ray

    if dropped.count() > _BROADCAST_DROP_LIMIT:
        return None
    df = dropped.to_pandas()
    if "drop_id" not in df.columns:   # all-empty-block collect
        return ray.put(pa.array([], pa.int64()))
    ids = np.sort(df["drop_id"].to_numpy(dtype=np.int64))
    return ray.put(pa.array(ids, pa.int64()))


# ----------------------------------------------------------- text analysis

def q_doc_stats(sf_dir: str):
    """Per-doc scalar stats + the whole-document normalized-text md5
    (the r3 ``doc_fingerprint`` column, folded in so the fingerprint
    keeps its hash-verified driver row inside the 50-entry cap while
    freeing a slot for ``paragraph_dedup``): one pruned read, both
    kernels over the same batch."""
    from pdfextract_ray.stages.textstats import doc_stats_batch, fingerprint_batch

    def stats_and_fp(t: pa.Table) -> pa.Table:
        return doc_stats_batch(t).append_column(
            "fingerprint", fingerprint_batch(t)["fingerprint"])

    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(stats_and_fp, batch_format="pyarrow")


_DOC_STATS_SQL = r"""
WITH w AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'), x -> x <> '') AS words
  FROM documents
)
SELECT doc_id,
  length(regexp_replace(text, '[^A-Z0-9\-\[\],."''()]', '', 'g'))
    / CAST(length(text) AS DOUBLE)                                  AS letter_ratio,
  len(words)                                                        AS word_count,
  CASE WHEN len(words) = 0 THEN 0.0
       ELSE len(list_filter(words, x -> regexp_matches(x, '[^\d]\d{4}[^\d]')))
            / CAST(len(words) AS DOUBLE) END                        AS year_ratio,
  length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS token_count,
  md5(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))    AS fingerprint
FROM w
"""


def q_doc_fingerprint(sf_dir: str):
    from pdfextract_ray.stages.textstats import fingerprint_batch
    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(fingerprint_batch, batch_format="pyarrow")


_DOC_FP_SQL = r"""
SELECT doc_id, md5(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g')) AS fingerprint
FROM documents
"""


def q_doc_rolling_fp(sf_dir: str):
    """Rolling-hash (winnowing) fingerprints — robust to small edits,
    unlike the whole-document md5 of q_doc_fingerprint. Non-SQL."""
    from pdfextract_ray.stages.textstats import rolling_fp_batch
    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(rolling_fp_batch, batch_format="pyarrow")


# SQL mirror of stages/textstats.rolling_fingerprint: the 4 smallest
# polynomial rolling hashes over 16-byte windows of the normalized text
# (maintaining the k smallest with strict-less replacement equals the
# sorted-multiset head). ascii(char)==byte because the corpus is ASCII
# (checked); docs are all >= 16 chars so the Ray path's NUL padding
# branch never fires at test scale.
_ROLLING_Q = (1 << 61) - 1
_ROLLING_FP_SQL = (r"""
WITH n AS (
  SELECT doc_id, regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g') AS s FROM documents
),
hs AS (
  SELECT doc_id,
    list_sort(list_transform(range(1, length(s) - 14),
      i -> CAST(list_sum(list_transform(range(0, 16),
             t -> CAST(ascii(array_extract(s, i + t)) AS HUGEINT)
                  * (CASE t {POWCASE} END)))
           % 2305843009213693951 AS BIGINT))) AS hlist
  FROM n
)
SELECT doc_id,
  array_to_string(list_transform(hlist[1:4], v -> printf('%016x', v)), '-') AS rolling_fp
FROM hs
""").replace("{POWCASE}", " ".join(
    "WHEN %d THEN CAST(%d AS HUGEINT)" % (t, pow(257, 15 - t, _ROLLING_Q))
    for t in range(16)))


def q_decontaminate(sf_dir: str, eval_mod: int = 37):
    """Benchmark decontamination scan (the GPT-3/C4-style training-data
    step: flag documents overlapping an evaluation suite before
    training). Eval set = ``doc_id % eval_mod == 0`` — the deterministic
    stand-in for a benchmark suite, which in production is external,
    bounded input (MBs), never corpus-sized. Two-pass broadcast plan
    (same shape as ``vocab_coverage``'s top-V): pass 1 unions the eval
    docs' DISTINCT word-3-gram crc32 shingles (the corpus-wide shingle
    contract, ``stages.dedup._shingle_hashes``) and broadcasts the
    sorted array ONCE via ``ray.put``; pass 2 is an actor-pool
    vectorized membership scan per non-eval doc. Integer outputs, so
    the oracle hash has no float exposure."""
    import numpy as np
    import ray
    from pdfextract_ray.stages.dedup import DecontaminateScan, eval_shingle_batch

    docs = _read_balanced(sf_dir, "documents", ["doc_id", "text"])
    ev = docs.map_batches(
        functools.partial(eval_shingle_batch, eval_mod=eval_mod),
        batch_format="pyarrow").to_pandas()
    # benchmark-sized by construction (never corpus-sized) — bounded
    # driver collection, like vocab_coverage's V rows
    eval_sorted = np.unique(ev["h32"].to_numpy(dtype=np.int64))
    eval_ref = ray.put(eval_sorted)

    return docs.map_batches(
        DecontaminateScan, fn_constructor_args=(eval_ref, eval_mod),
        batch_format="pyarrow", concurrency=(1, 8), batch_size=256)


def q_paragraph_dedup(sf_dir: str):
    """Cross-document paragraph-level exact-dedup stats (the C4-style
    span dedup unit: the corpus has no sentence punctuation, so a
    "paragraph" is each non-overlapping 16-word window —
    ``stages.dedup.paragraph_hashes``). Per doc: how many of its spans
    occur >= 2 times ANYWHERE in the corpus (within-doc repeats
    included).

    Distributed plan: explode (doc, span-crc32) sharded by hash (a
    shard group sees every occurrence of its hashes — one
    driver-derived mask), per-shard global-duplicate verdict
    pre-aggregated to (doc, n, n_dup) partials, then a doc-keyed
    groupby Sum over three-int rows. The only shuffles move (hash) and
    (doc_id, two ints) — never text; same completeness premise as the
    All-Pairs machinery above."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum
    from pdfextract_ray.stages.dedup import (default_shard_mask,
                                             paragraph_explode_batch,
                                             paragraph_flags_shard)

    mask = default_shard_mask()
    exploded = _read_balanced(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(functools.partial(paragraph_explode_batch,
                                       shard_mask=mask),
                     batch_format="pyarrow")
    # NOTE on the Ray 2.49 "RefBundle with a different schema" warnings
    # this stage's sparse shard groups can log: they are cosmetic
    # (empty internal blocks), and coalescing them away is NOT free —
    # measured at sf0.1/32cpu: no repartition 3.2 s, repartition(16)
    # 3.9 s, repartition(2) 12 s (collapsed downstream parallelism).
    # The 22% tax buys nothing but clean logs, so the partials feed the
    # doc groupby directly.
    partials = exploded.groupby("shard") \
        .map_groups(paragraph_flags_shard, batch_format="pandas")
    summed = partials.groupby("doc_id").aggregate(
        Sum("n_paras", alias_name="n_paras"),
        Sum("n_dup_paras", alias_name="n_dup_paras"))

    def finish(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n_paras"], pa.float64())
        d = pc.cast(t["n_dup_paras"], pa.float64())
        # ONE division per row on identical IEEE operands — bit-equal
        # to the oracle's CAST(...)/... (see module docstring)
        return t.append_column("dup_frac", pc.divide(d, n))

    return summed.map_batches(finish, batch_format="pyarrow")


def q_doc_quality(sf_dir: str):
    """Quality signals + PII-density counts in ONE pass over the text
    column. The PII patterns are the RE2 strings from
    :mod:`pdfextract_ray.stages.pii` — the SAME strings the oracle SQL
    interpolates (DuckDB embeds RE2 too), which is what makes the
    counts hash-verifiable rather than rows-only."""
    from pdfextract_ray.stages.pii import pii_stats_batch
    from pdfextract_ray.stages.textstats import quality_batch

    def batch(t: pa.Table) -> pa.Table:
        q = quality_batch(t)
        p = pii_stats_batch(t)
        for name in ("n_emails", "n_phones", "n_ips"):
            q = q.append_column(name, p[name])
        return q

    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(batch, batch_format="pyarrow")


def _doc_quality_sql() -> str:
    from pdfextract_ray.stages.pii import EMAIL_RE, IPV4_RE, PHONE_RE
    return r"""
WITH w AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+'), x -> x <> '') AS words
  FROM documents
)
SELECT doc_id,
  len(words) AS n_words,
  CASE WHEN len(words) = 0 THEN 0.0
       ELSE len(list_filter(words, x -> list_contains(%s, x)))
            / CAST(len(words) AS DOUBLE) END AS stopword_ratio,
  length(regexp_replace(text, '[^,.;:!?''"()\[\]-]', '', 'g'))
    / CAST(length(text) AS DOUBLE) AS punct_ratio,
  CASE WHEN len(words) = 0 THEN 0.0
       ELSE list_sum(list_transform(words, x -> length(x)))
            / CAST(len(words) AS DOUBLE) END AS mean_word_len,
  len(regexp_extract_all(text, '%s')) AS n_emails,
  len(regexp_extract_all(text, '%s')) AS n_phones,
  len(regexp_extract_all(text, '%s')) AS n_ips
FROM w
""" % (stopwords_sql_list(), EMAIL_RE, PHONE_RE, IPV4_RE)


_DOC_QUALITY_SQL = _doc_quality_sql()


def q_top_bigrams(sf_dir: str, k: int = 50):
    """Global top-k word bigrams (partial Counter per batch → groupby
    sum → sort+limit)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum
    from pdfextract_ray.stages.textstats import bigram_partials_batch

    summed = _read_balanced(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(bigram_partials_batch, batch_format="pyarrow") \
        .groupby("bigram").aggregate(Sum("n", alias_name="n"))

    # per-block partial top-k so the final sort sees only
    # k x n_blocks rows, never the full distinct-bigram table
    # (same shape as relational.top_docs)
    def partial_topk(t: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            t, k, [("n", "descending"), ("bigram", "ascending")])
        return t.take(idx)

    return summed.map_batches(partial_topk, batch_format="pyarrow") \
        .sort(["n", "bigram"], descending=[True, False]).limit(k)


_TOP_BIGRAMS_SQL = r"""
WITH w AS (
  SELECT list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+'), x -> x <> '') AS words
  FROM documents
),
b AS (
  SELECT unnest(list_transform(range(1, len(words)),
                               i -> words[i] || ' ' || words[i + 1])) AS bigram
  FROM w
)
SELECT bigram, count(*) AS n FROM b
GROUP BY bigram ORDER BY n DESC, bigram LIMIT 50
"""


def q_lang_counts(sf_dir: str):
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({"lang": t["lang"], "n_chars": t["n_chars"],
                      "n": pa.array([1] * t.num_rows, pa.int64())})
        return g.group_by("lang") \
                .aggregate([("n", "sum"), ("n_chars", "sum")]) \
                .rename_columns(["lang", "n", "n_chars"])

    # partial pre-agg per batch; coalesce tiny partials before the groupby
    return _read(sf_dir, "documents", ["lang", "n_chars"]) \
        .map_batches(partial, batch_format="pyarrow").repartition(2) \
        .groupby("lang").aggregate(Sum("n", alias_name="n_docs"),
                                   Sum("n_chars", alias_name="total_chars"))


_LANG_COUNTS_SQL = """
SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang
"""


def q_lang_id(sf_dir: str):
    from pdfextract_ray.stages.textstats import LangId
    return _read(sf_dir, "documents", ["doc_id", "text", "lang"]) \
        .map_batches(LangId, batch_format="pyarrow", concurrency=(1, 4),
                     batch_size=1024)


# SQL mirror of stages/textstats.LangId: per-language marker-word hit
# counts; argmax with FIRST-lang-wins tie-break (the Python dict
# iteration order en,de,fr,es + strict '>' update). round() halfway
# cases cannot occur: hits/nw has denominator <= nw << 2e6.
# Tokenizer parity note: the Ray path splits with Arrow's
# ascii_split_whitespace and this oracle splits with the IDENTICAL
# explicit RE2 class [ \t\n\v\f\r] — pinned on BOTH sides so
# hash-parity holds for ANY corpus, including exotic Unicode
# separators (NBSP/NEL/U+3000/\x1c stay inside tokens in both
# engines; property-tested in test_textstats.py). `\s+` was not used
# because RE2 \s excludes \v, and utf8_split_whitespace was dropped
# because pyarrow 16.1's Unicode split showed heap-state-dependent
# misses on bidi-class separators.
_LANG_ID_SQL = r"""
WITH w AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+'), x -> x <> '') AS words
  FROM documents
),
h AS (
  SELECT doc_id, lang, len(words) AS nw,
    len(list_filter(words, x -> list_contains(['the','and','of','is','with','for'], x))) AS h_en,
    len(list_filter(words, x -> list_contains(['der','die','das','und','ist','nicht'], x))) AS h_de,
    len(list_filter(words, x -> list_contains(['le','la','les','et','est','une'], x))) AS h_fr,
    len(list_filter(words, x -> list_contains(['el','la','los','y','es','una'], x))) AS h_es
  FROM w
),
m AS (SELECT *, greatest(h_en, h_de, h_fr, h_es) AS hm FROM h)
SELECT doc_id, lang,
  CASE WHEN nw = 0 OR hm = 0 THEN 'und'
       WHEN h_en = hm THEN 'en' WHEN h_de = hm THEN 'de'
       WHEN h_fr = hm THEN 'fr' ELSE 'es' END AS pred_lang,
  CASE WHEN nw = 0 THEN 0.0 ELSE round(hm / CAST(nw AS DOUBLE), 6) END AS marker_ratio
FROM m
"""


def q_lang_segments(sf_dir: str):
    """CCNet-style per-LINE language segmentation (Wenzek et al.
    2020), aggregated per document: line counts per language under the
    pinned marker heuristic + the majority language and its line
    fraction. Fully vectorized two-level flatten (doc → lines →
    words), zero shuffle; the oracle mirrors the whole computation
    (unnest → per-line verdict CASE → per-doc counts →
    greatest/CASE majority, tie order en,de,fr,es,und both sides)."""
    from pdfextract_ray.stages.langlines import lang_segments
    return lang_segments(_read(sf_dir, "documents", ["doc_id", "text"]))


# SQL mirror of stages/langlines.LangLines — same tokenizer class and
# tie semantics as _LANG_ID_SQL, applied per line; null text = ''.
_LANG_SEGMENTS_SQL = r"""
WITH l AS (
  SELECT doc_id, unnest(regexp_split_to_array(coalesce(text, ''), '\n')) AS line
  FROM documents
),
w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(line), '[ \t\n\x0B\f\r]+'), x -> x <> '') AS words
  FROM l
),
h AS (
  SELECT doc_id,
    len(list_filter(words, x -> list_contains(['the','and','of','is','with','for'], x))) AS h_en,
    len(list_filter(words, x -> list_contains(['der','die','das','und','ist','nicht'], x))) AS h_de,
    len(list_filter(words, x -> list_contains(['le','la','les','et','est','une'], x))) AS h_fr,
    len(list_filter(words, x -> list_contains(['el','la','los','y','es','una'], x))) AS h_es
  FROM w
),
v AS (
  SELECT doc_id,
    CASE WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'und'
         WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
         WHEN h_de = greatest(h_en, h_de, h_fr, h_es) THEN 'de'
         WHEN h_fr = greatest(h_en, h_de, h_fr, h_es) THEN 'fr'
         ELSE 'es' END AS verdict
  FROM h
),
c AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
    CAST(count(*) FILTER (verdict = 'en') AS BIGINT) AS n_en,
    CAST(count(*) FILTER (verdict = 'de') AS BIGINT) AS n_de,
    CAST(count(*) FILTER (verdict = 'fr') AS BIGINT) AS n_fr,
    CAST(count(*) FILTER (verdict = 'es') AS BIGINT) AS n_es,
    CAST(count(*) FILTER (verdict = 'und') AS BIGINT) AS n_und
  FROM v GROUP BY doc_id
)
SELECT doc_id, n_lines, n_en, n_de, n_fr, n_es, n_und,
  CASE WHEN n_en = m THEN 'en' WHEN n_de = m THEN 'de'
       WHEN n_fr = m THEN 'fr' WHEN n_es = m THEN 'es'
       ELSE 'und' END AS majority_lang,
  round(m / CAST(n_lines AS DOUBLE), 6) AS majority_frac
FROM (SELECT *, greatest(n_en, n_de, n_fr, n_es, n_und) AS m FROM c)
"""


def q_doc_repetition(sf_dir: str):
    """Gopher/C4-style repetition quality filter signals."""
    from pdfextract_ray.stages.textstats import repetition_batch
    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(repetition_batch, batch_format="pyarrow")


# trigram join with ' ' is unambiguous: tokens cannot contain the
# split class. range(a,b) is half-open; 1-based list indexing makes
# words[i..i+2] for i in [1, nw-2] exactly the nw-2 trigrams.
_DOC_REPETITION_SQL = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+'), x -> x <> '') AS words
  FROM documents
),
t AS (
  SELECT doc_id, words, len(words) AS nw, len(list_distinct(words)) AS nd,
    CASE WHEN len(words) >= 3 THEN
      list_transform(range(1, len(words) - 1),
                     i -> words[i] || ' ' || words[i + 1] || ' ' || words[i + 2])
    ELSE CAST([] AS VARCHAR[]) END AS tris
  FROM w
)
SELECT doc_id, nw AS n_words,
  CASE WHEN nw = 0 THEN 0.0 ELSE nd / CAST(nw AS DOUBLE) END AS distinct_ratio,
  CASE WHEN nw = 0 THEN 0.0 ELSE
    list_max(list_transform(list_distinct(words),
                            u -> len(list_filter(words, x -> x = u))))
    / CAST(nw AS DOUBLE) END AS top_word_ratio,
  CASE WHEN len(tris) = 0 THEN 0.0 ELSE
    (len(tris) - len(list_distinct(tris))) / CAST(len(tris) AS DOUBLE) END AS dup_trigram_ratio
FROM t
"""


def q_pii_scan(sf_dir: str):
    """PII indicator scan (emails / IPv4 / phone shapes) — the detect
    step of a redaction pipeline; one vectorized RE2 pass per pattern."""
    from pdfextract_ray.stages.textstats import pii_scan_batch
    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(pii_scan_batch, batch_format="pyarrow")


def _pii_sql() -> str:
    from pdfextract_ray.stages.textstats import PII_PATTERNS
    cols = ",\n  ".join(
        "length(regexp_extract_all(text, '%s')) AS %s" % (pat.replace("'", "''"), name)
        for name, pat in PII_PATTERNS.items())
    return "SELECT doc_id,\n  %s\nFROM documents" % cols


def q_source_stats(sf_dir: str):
    """Per-source (domain analogue) corpus stats: doc count, total
    chars, mean length, language spread. Two-level aggregation: a
    per-batch (source, lang) pre-agg shrinks the shuffle to one row
    per key pair per batch, and the language spread falls out of the
    second groupby as a row count — no COUNT DISTINCT shuffle."""
    from ray.data.aggregate import Count, Sum

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({"source": t["source"], "lang": t["lang"],
                      "n_chars": t["n_chars"],
                      "n": pa.array([1] * t.num_rows, pa.int64())})
        return g.group_by(["source", "lang"]) \
                .aggregate([("n", "sum"), ("n_chars", "sum")]) \
                .rename_columns(["source", "lang", "n", "n_chars"])

    per_pair = _read(sf_dir, "documents", ["source", "lang", "n_chars"]) \
        .map_batches(partial, batch_format="pyarrow").repartition(2) \
        .groupby(["source", "lang"]) \
        .aggregate(Sum("n", alias_name="n"),
                   Sum("n_chars", alias_name="n_chars"))

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        total = pc.cast(t["total_chars"], pa.float64())
        n = pc.cast(t["n_docs"], pa.float64())
        return t.append_column("avg_chars", pc.divide(total, n))

    return coalesce_for_join(per_pair).groupby("source") \
        .aggregate(Sum("n", alias_name="n_docs"),
                   Sum("n_chars", alias_name="total_chars"),
                   Count(alias_name="n_langs")) \
        .map_batches(finish, batch_format="pyarrow")


_SOURCE_STATS_SQL = """
SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
       count(DISTINCT lang) AS n_langs,
       CAST(sum(n_chars) AS BIGINT) / CAST(count(*) AS DOUBLE) AS avg_chars
FROM documents GROUP BY source
"""


_VOCAB_TOP_V = 10


def q_vocab_coverage(sf_dir: str, top_v: int = _VOCAB_TOP_V):
    """Two-pass vocab-coverage quality score: pass 1 derives the
    corpus top-V vocabulary (distributed unigram count, partial top-k
    per block, tiny final sort); pass 2 broadcasts it once via
    ``ray.put`` and scores every doc's in-vocab token fraction.

    V=10 is corpus-size independent (the top-10 words of any natural
    corpus are its function words — the score measures function-word
    density, not corpus memorization), unlike a size-tuned threshold;
    for a broader in-distribution proxy use ``doc_lm_score``, whose
    V=30k unigram table is the production-scale variant."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum
    from pdfextract_ray.stages.textstats import (VocabCoverage,
                                                 unigram_partials_batch)

    summed = _read_balanced(sf_dir, "documents", ["text"]) \
        .map_batches(unigram_partials_batch, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("n", alias_name="n"))

    def partial_topk(t: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            t, top_v, [("n", "descending"), ("word", "ascending")])
        return t.take(idx)

    top = summed.map_batches(partial_topk, batch_format="pyarrow") \
        .sort(["n", "word"], descending=[True, False]).limit(top_v)
    vocab = [r["word"] for r in top.take(top_v)]  # tiny (V rows) by design
    vocab_ref = ray.put(vocab)

    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(VocabCoverage, fn_constructor_args=(vocab_ref,),
                     batch_format="pyarrow", concurrency=(1, 4),
                     batch_size=1024)


_VOCAB_COVERAGE_SQL = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+'), x -> x <> '') AS words
  FROM documents
),
u AS (SELECT doc_id, unnest(words) AS word FROM w),
topv AS (SELECT word FROM u GROUP BY word ORDER BY count(*) DESC, word LIMIT %d),
hits AS (
  SELECT doc_id, count(*) AS h FROM u
  WHERE word IN (SELECT word FROM topv) GROUP BY doc_id
)
SELECT w.doc_id, len(words) AS n_words,
  CASE WHEN len(words) = 0 THEN 0.0 ELSE
    coalesce(h, 0) / CAST(len(words) AS DOUBLE) END AS coverage
FROM w LEFT JOIN hits ON w.doc_id = hits.doc_id
""" % _VOCAB_TOP_V


_LM_TOP_V = 30_000


def q_doc_lm_score(sf_dir: str, top_v: int = _LM_TOP_V):
    """CCNet-style unigram LM scoring (the technique behind CCNet's
    perplexity bucketing, Wenzek et al. 2020): pass 1 derives the
    corpus top-V unigram distribution (distributed count, partial
    top-k per block, V rows + one scalar to the driver); pass 2
    broadcasts the integer micro-nat cost table once via ``ray.put``
    and scores every document's in-vocab negative log-likelihood.
    All outputs are int64 (the only float op, ``ln``, runs once per
    VOCAB WORD on a double identical in both engines), so the oracle
    hash is deterministic — no float-aggregation-order exposure."""
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum
    from pdfextract_ray.stages.textstats import (LmScore,
                                                 lm_micronats_from_counts,
                                                 unigram_partials_batch)

    counts = _read_balanced(sf_dir, "documents", ["text"]) \
        .map_batches(unigram_partials_batch, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("n", alias_name="n")) \
        .materialize()  # consumed twice: total + top-V (vocab-sized, not corpus-sized)
    total = counts.aggregate(Sum("n", alias_name="total"))["total"]

    def partial_topk(t: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            t, top_v, [("n", "descending"), ("word", "ascending")])
        return t.take(idx)

    top = counts.map_batches(partial_topk, batch_format="pyarrow") \
        .sort(["n", "word"], descending=[True, False]).limit(top_v) \
        .take_all()  # V rows by construction — the broadcast table
    words = [r["word"] for r in top]
    mn = lm_micronats_from_counts([r["n"] for r in top], int(total))
    vocab_ref = ray.put((words, mn))

    return _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(LmScore, fn_constructor_args=(vocab_ref,),
                     batch_format="pyarrow", concurrency=(1, 4),
                     batch_size=1024)


# Mirror of LmScore + lm_micronats_from_counts: identical expression
# shape — n / CAST(total AS DOUBLE), floor(-ln(p)*1e6 + 0.5) — so the
# per-word micro-nat ints match unless the engines' ln() differ by
# enough to cross a .5 boundary (one double per vocab word; gated by
# tools/check_oracles.py before the driver ever sees it).
_DOC_LM_SCORE_SQL = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+'), x -> x <> '') AS words
  FROM documents
),
u AS (SELECT doc_id, unnest(words) AS word FROM w),
cnt AS (SELECT word, count(*) AS n FROM u GROUP BY word),
tot AS (SELECT sum(n) AS total FROM cnt),
vocab AS (
  SELECT word,
         CAST(floor(-ln(n / CAST(total AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS mn
  FROM (SELECT word, n FROM cnt ORDER BY n DESC, word LIMIT %d), tot
),
agg AS (
  SELECT u.doc_id,
         count(*) FILTER (WHERE v.mn IS NULL) AS n_oov,
         CAST(coalesce(sum(v.mn), 0) AS BIGINT) AS lm_micronats
  FROM u LEFT JOIN vocab v ON u.word = v.word
  GROUP BY u.doc_id
)
SELECT w.doc_id, len(words) AS n_words,
       CAST(coalesce(n_oov, 0) AS BIGINT) AS n_oov,
       coalesce(lm_micronats, 0) AS lm_micronats
FROM w LEFT JOIN agg ON w.doc_id = agg.doc_id
""" % _LM_TOP_V


def q_lm_buckets(sf_dir: str, sample_limit: int = 2000):
    """CCNet perplexity bucketing (Wenzek et al. 2020): split the
    corpus into head / middle / tail by per-token LM cost. The score
    is ``lm_micronats / n_scored`` (ONE double division of the same
    two ints in both engines — bit-identical, the repo's standard
    float-safety trick); tertile thresholds come from a BOUNDED
    deterministic sample (docs with id < ``sample_limit``, the CCNet
    convention of training thresholds on a sample — corpus-sized
    driver collects never happen), using the ``quantile_disc`` rule
    (sorted index ceil(q*n)−1) that value_percentiles already mirrors.
    Docs with zero in-vocab tokens bucket as 'unscored'; if the sample
    has no scored docs every scored doc falls to 'tail' (the SQL
    CASE's NULL-threshold behavior, mirrored exactly). Output is ints
    + strings only — no float column reaches the oracle hash."""
    import math

    import pyarrow.compute as pc

    scores = q_doc_lm_score(sf_dir).materialize()  # two consumers

    # bounded driver-side sample → tertile thresholds
    sample = scores.map_batches(
        lambda t: t.filter(pc.less(t["doc_id"], sample_limit)),
        batch_format="pyarrow").take_all()
    svals = sorted(
        r["lm_micronats"] / float(r["n_words"] - r["n_oov"])
        for r in sample if r["n_words"] - r["n_oov"] > 0)
    if svals:
        n = len(svals)
        t1 = svals[max(0, math.ceil(n / 3.0) - 1)]
        t2 = svals[max(0, math.ceil(2.0 * n / 3.0) - 1)]
    else:
        t1 = t2 = None

    def bucket(t: pa.Table) -> pa.Table:
        n_scored = pc.subtract(t["n_words"], t["n_oov"])
        ns = n_scored.to_pylist()
        mns = t["lm_micronats"].to_pylist()
        out = []
        for nsc, mn in zip(ns, mns):
            if not nsc:
                out.append("unscored")
                continue
            s = mn / float(nsc)
            if t1 is not None and s <= t1:
                out.append("head")
            elif t2 is not None and s <= t2:
                out.append("middle")
            else:
                out.append("tail")
        return pa.table({
            "doc_id": t["doc_id"],
            "n_scored": pc.cast(n_scored, pa.int64()),
            "lm_micronats": t["lm_micronats"],
            "ppl_bucket": pa.array(out, pa.string()),
        })

    return scores.map_batches(bucket, batch_format="pyarrow")


# Mirror of q_lm_buckets over the shared _DOC_LM_SCORE_SQL core: same
# single-division double score, thresholds via quantile_disc on the
# same id-bounded sample, the same <= tie rule, and the same
# NULL-threshold fallthrough to 'tail'.
_LM_BUCKETS_SQL = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+'), x -> x <> '') AS words
  FROM documents
),
u AS (SELECT doc_id, unnest(words) AS word FROM w),
cnt AS (SELECT word, count(*) AS n FROM u GROUP BY word),
tot AS (SELECT sum(n) AS total FROM cnt),
vocab AS (
  SELECT word,
         CAST(floor(-ln(n / CAST(total AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS mn
  FROM (SELECT word, n FROM cnt ORDER BY n DESC, word LIMIT %d), tot
),
agg AS (
  SELECT u.doc_id,
         count(*) FILTER (WHERE v.mn IS NULL) AS n_oov,
         CAST(coalesce(sum(v.mn), 0) AS BIGINT) AS lm_micronats
  FROM u LEFT JOIN vocab v ON u.word = v.word
  GROUP BY u.doc_id
),
s AS (
  SELECT w.doc_id,
         CAST(len(words) - coalesce(n_oov, 0) AS BIGINT) AS n_scored,
         coalesce(lm_micronats, 0) AS lm_micronats,
         CASE WHEN len(words) - coalesce(n_oov, 0) > 0
              THEN coalesce(lm_micronats, 0)
                   / CAST(len(words) - coalesce(n_oov, 0) AS DOUBLE)
         END AS score
  FROM w LEFT JOIN agg ON w.doc_id = agg.doc_id
),
th AS (
  SELECT quantile_disc(score, 1.0/3) AS t1,
         quantile_disc(score, 2.0/3) AS t2
  FROM s WHERE doc_id < 2000 AND score IS NOT NULL
)
SELECT doc_id, n_scored, lm_micronats,
  CASE WHEN score IS NULL THEN 'unscored'
       WHEN score <= t1 THEN 'head'
       WHEN score <= t2 THEN 'middle'
       ELSE 'tail' END AS ppl_bucket
FROM s, th
""" % _LM_TOP_V


# deterministic per-language sampling rates (permille of the 97-slot
# Knuth-hash ring): downsample the dominant language, keep the rest —
# the standard corpus-rebalancing step of a multilingual training mix.
_STRATA_RATES = {"en": 19, "default": 78}
_STRATA_MULT = 2654435761  # Knuth multiplicative hash constant


def q_stratified_sample(sf_dir: str):
    """Deterministic stratified sampling: keep a doc iff its hashed
    doc_id lands under its language's rate. Pure per-row arithmetic —
    embarrassingly parallel, no shuffle, reproducible across runs and
    engines (doc_id * const stays far below 2^63 at any realistic
    per-shard id range; at 100 TB ids would be hashed bytes, same
    construction)."""
    import numpy as np

    def sample(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        slot = (ids * _STRATA_MULT) % 97  # int64-safe below ~3.5e9 ids
        rate = np.where(
            t["lang"].combine_chunks().to_numpy(zero_copy_only=False) == "en",
            _STRATA_RATES["en"], _STRATA_RATES["default"])
        return t.filter(pa.array(slot < rate))

    return _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"]) \
        .map_batches(sample, batch_format="pyarrow")


_STRATIFIED_SAMPLE_SQL = """
SELECT doc_id, lang, n_chars FROM documents
WHERE (doc_id * %d) %% 97 < CASE WHEN lang = 'en' THEN %d ELSE %d END
""" % (_STRATA_MULT, _STRATA_RATES["en"], _STRATA_RATES["default"])


# SQL mirror of stages/dedup.simhash64 + band bucketing + Hamming
# verify: md5(word) first 8 bytes LITTLE-ENDIAN (reversed hex pairs →
# UBIGINT, matching struct.unpack('<Q')), per-bit ±1 vote, 4×16-bit
# band join, bit_count(xor) <= 3. Band buckets at test scale are far
# below the Ray path's max_bucket=50 truncation, so the pair sets are
# identical.
_DEDUP_SIMHASH_SQL = (r"""
WITH words AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+'),
                                    x -> x <> '')) AS w
  FROM documents
),
hw AS (
  SELECT doc_id, CAST('0x' || {rev} AS UBIGINT) AS wh
  FROM (SELECT doc_id, md5(w) AS h FROM words)
),
bits AS (
  SELECT doc_id, j.j AS j,
         sum(CASE WHEN (wh >> j.j) & 1 = 1 THEN 1 ELSE -1 END) AS acc
  FROM hw CROSS JOIN (SELECT unnest(range(64)) AS j) j
  GROUP BY doc_id, j.j
),
sh AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN acc > 0 THEN (CAST(1 AS UBIGINT) << j) ELSE 0 END)
              AS UBIGINT) AS sim
  FROM bits GROUP BY doc_id
),
bands AS (
  SELECT doc_id, sim, b.b AS band_id,
         CAST((sim >> (16 * b.b)) & 65535 AS INTEGER) AS band_key
  FROM sh CROSS JOIN (SELECT unnest(range(4)) AS b) b
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
         bit_count(xor(x.sim, y.sim)) AS hamming
  FROM bands x JOIN bands y
    ON x.band_id = y.band_id AND x.band_key = y.band_key
   AND x.doc_id < y.doc_id
)
SELECT a, b, CAST(hamming AS BIGINT) AS hamming FROM cand WHERE hamming <= 3
""").replace("{rev}", "||".join(
    "substr(h, %d, 2)" % i for i in (15, 13, 11, 9, 7, 5, 3, 1)))


# SQL mirror of the FULL dedup_minhash pipeline (stages/dedup.py):
# word-3-shingle crc32 sets (crc32 is not a DuckDB builtin — inlined
# 256-entry table folded with list_reduce, byte-exact vs zlib.crc32),
# 64-permutation MinHash with numpy's uint64 WRAPAROUND semantics
# replicated via HUGEINT mod 2^64, 16-band LSH bucketing (band key =
# crc32 of the 32 little-endian signature bytes), within-bucket
# signature-agreement estimate >= 0.5, and min-label connected
# components as a recursive CTE. Band buckets at test scale are far
# below the Ray path's max_bucket=50 truncation, so the pair sets are
# identical (same caveat as the SimHash oracle).
def _crc32_table_sql() -> str:
    tbl = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = (0xEDB88320 ^ (c >> 1)) if (c & 1) else (c >> 1)
        tbl.append(c)
    return "[" + ",".join(map(str, tbl)) + "]"


# zlib.crc32 of string column `s` given the inlined table `tbl`
# (shared by the shingle prefix and the paragraph-window oracle)
_CRC_EXPR_SQL = """xor(list_reduce(
      list_prepend(CAST(4294967295 AS UBIGINT),
                   list_transform(range(1, length(s)+1),
                                  i -> CAST(ascii(s[i]) AS UBIGINT))),
      (acc, byte) -> xor(acc >> 8, tbl[1 + CAST(xor(acc, byte) & 255 AS INTEGER)])),
    CAST(4294967295 AS UBIGINT))"""


def _perm_sql() -> tuple[str, str]:
    from pdfextract_ray.stages.dedup import _PERM_A, _PERM_B
    return ("[" + ",".join(str(int(a)) for a in _PERM_A) + "]",
            "[" + ",".join(str(int(b)) for b in _PERM_B) + "]")


def _shingle_cte_prefix() -> str:
    """WITH-clause prefix ending at ``h``: documents → word-3-shingle
    crc32 sets, one row per (doc_id, DISTINCT h32) — the exact mirror
    of ``stages.dedup._shingle_hashes``. Shared by the minhash oracles
    and the exact set-similarity (dedup_ngram_jaccard) oracle."""
    return (r"""
WITH RECURSIVE
t(tbl) AS (SELECT {TBL}::UBIGINT[]),
w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+'), x -> x <> '') AS words
  FROM documents
),
shg AS (
  SELECT doc_id,
    CASE WHEN len(words) = 0 THEN ['']
         WHEN len(words) < 3 THEN [array_to_string(words, ' ')]
         ELSE list_transform(range(1, len(words) - 1),
                             i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
    END AS shingles
  FROM w
),
e AS (SELECT doc_id, unnest(shingles) AS s FROM shg),
h AS (SELECT DISTINCT doc_id, CAST({CRC_STR} AS HUGEINT) AS h32 FROM e, t)
""").replace("{TBL}", _crc32_table_sql()).replace("{CRC_STR}", _CRC_EXPR_SQL)


# decontaminate oracle: the shingle CTE (`h` — DISTINCT (doc_id, h32))
# split into the eval side (doc_id % 37 = 0) and the corpus side;
# n_contaminated = |shingles(doc) ∩ shingles(eval union)|.
def _build_decontaminate_sql() -> str:
    return _shingle_cte_prefix() + r"""
, ev AS (SELECT DISTINCT h32 FROM h WHERE doc_id % 37 = 0)
SELECT doc_id,
       count(*) AS n_shingles,
       CAST(sum(CASE WHEN h32 IN (SELECT h32 FROM ev) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_contaminated,
       (sum(CASE WHEN h32 IN (SELECT h32 FROM ev) THEN 1 ELSE 0 END) > 0)
           AS is_contaminated
FROM h WHERE doc_id % 37 <> 0
GROUP BY doc_id
"""


# paragraph_dedup oracle: non-overlapping 16-word windows (1-based
# inclusive DuckDB list slices, clamped), crc32 per window via the
# inlined table, global occurrence counts, per-doc rollup. Mirrors
# stages.dedup.paragraph_hashes exactly (same pinned ASCII split +
# lower()).
def _build_paragraph_dedup_sql() -> str:
    return (r"""
WITH t(tbl) AS (SELECT {TBL}::UBIGINT[]),
w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[ \t\n\x0B\f\r]+'), x -> x <> '') AS words
  FROM documents
),
p AS (
  SELECT doc_id,
         unnest(list_transform(range(0, CAST(ceil(len(words) / 16.0) AS INTEGER)),
                               i -> array_to_string(words[i*16+1 : (i+1)*16], ' '))) AS s
  FROM w WHERE len(words) > 0
),
ph AS (SELECT doc_id, CAST({CRC_STR} AS BIGINT) AS h FROM p, t),
c AS (SELECT h, count(*) AS cnt FROM ph GROUP BY h)
SELECT ph.doc_id,
       count(*) AS n_paras,
       CAST(sum(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_paras,
       CAST(sum(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS dup_frac
FROM ph JOIN c ON ph.h = c.h
GROUP BY ph.doc_id
""").replace("{TBL}", _crc32_table_sql()).replace("{CRC_STR}", _CRC_EXPR_SQL)


def _minhash_cte_prefix() -> str:
    """Shared WITH-clause prefix: the shingle prefix (``h``) → wraparound
    minhash signatures (sig) → LSH bands → candidate pairs with
    signature-agreement estimate (cand) → pairs (est >= 0.5).
    Used by both the dedup_minhash and dedup_minhash_verified oracles."""
    band_bytes = ("flatten(list_transform(range(0, 4), "
                  "r -> list_transform(range(0, 8), "
                  "j -> (sv[1 + 4*bb.b + r] >> (8*j)) & 255)))")
    crc_bytes = ("""xor(list_reduce(
      list_prepend(CAST(4294967295 AS UBIGINT), {bl}),
      (acc, byte) -> xor(acc >> 8, tbl[1 + CAST(xor(acc, byte) & 255 AS INTEGER)])),
    CAST(4294967295 AS UBIGINT))""").replace("{bl}", band_bytes)
    a_sql, b_sql = _perm_sql()
    return _shingle_cte_prefix() + (r"""
, pa(a) AS (SELECT {A}::HUGEINT[]),
pb(b) AS (SELECT {B}::HUGEINT[]),
sigrow AS (
  SELECT doc_id, i.i AS perm,
         CAST(min(((a[1 + i.i] * h32) % 18446744073709551616 + b[1 + i.i])
                  % 18446744073709551616 % 2305843009213693951) AS UBIGINT) AS v
  FROM h, pa, pb, (SELECT unnest(range(64)) AS i) i
  GROUP BY doc_id, i.i
),
sig AS (SELECT doc_id, list(v ORDER BY perm) AS sv FROM sigrow GROUP BY doc_id),
bands AS (
  SELECT doc_id, sv, bb.b AS band_id, {CRC_BYTES} AS band_hash
  FROM sig, t, (SELECT unnest(range(16)) AS b) bb
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
         len(list_filter(range(1, 65), i -> x.sv[i] = y.sv[i])) / 64.0 AS est
  FROM bands x JOIN bands y
    ON x.band_id = y.band_id AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id
),
pairs AS (SELECT a, b FROM cand WHERE est >= 0.5)
""").replace("{A}", a_sql).replace("{B}", b_sql) \
    .replace("{CRC_BYTES}", crc_bytes)


_DEDUP_MINHASH_SQL = _minhash_cte_prefix() + r"""
, nodes AS (SELECT a AS node FROM pairs UNION SELECT b FROM pairs),
edges AS (SELECT a AS x, b AS y FROM pairs UNION SELECT b AS x, a AS y FROM pairs),
reach(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT edges.y, reach.label FROM reach JOIN edges ON reach.node = edges.x
)
SELECT CAST(node AS BIGINT) AS doc_id, CAST(min(label) AS BIGINT) AS rep_id
FROM reach GROUP BY node ORDER BY doc_id
"""

# dedup_minhash_verified: same candidate pairs, verified with the EXACT
# shingle-set Jaccard |∩|/|∪| — the h CTE already holds each doc's
# distinct shingle crc32s, so intersection/union sizes are two joins.
# The division is int/double of identical operands in both engines
# (bit-identical, no grid snap needed).
_DEDUP_MINHASH_VERIFIED_SQL = _minhash_cte_prefix() + r"""
, na AS (SELECT doc_id, count(*) AS n FROM h GROUP BY doc_id),
inter AS (
  SELECT p.a, p.b, count(*) AS ni
  FROM pairs p
  JOIN h ha ON ha.doc_id = p.a
  JOIN h hb ON hb.doc_id = p.b AND hb.h32 = ha.h32
  GROUP BY p.a, p.b
),
jac AS (
  SELECT p.a, p.b,
         COALESCE(i.ni, 0) / CAST(x.n + y.n - COALESCE(i.ni, 0) AS DOUBLE) AS jaccard
  FROM pairs p
  JOIN na x ON x.doc_id = p.a
  JOIN na y ON y.doc_id = p.b
  LEFT JOIN inter i ON i.a = p.a AND i.b = p.b
)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b, jaccard
FROM jac WHERE jaccard >= 0.4 ORDER BY a, b
"""


# ------------------------------------------------------------------- dedup

def q_dedup_exact(sf_dir: str):
    """Exact dedup: hash-partitioned keep-first (min doc_id per hash)."""
    from ray.data.aggregate import Min
    import hashlib

    def hash_batch(t: pa.Table) -> pa.Table:
        hashes = [hashlib.md5(x.encode("utf-8")).hexdigest()
                  for x in t["text"].to_pylist()]
        return pa.table({"text_hash": pa.array(hashes, pa.string()),
                         "doc_id": t["doc_id"]})

    return _read_balanced(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(hash_batch, batch_format="pyarrow") \
        .groupby("text_hash").aggregate(Min("doc_id", alias_name="doc_id"))


_DEDUP_EXACT_SQL = """
SELECT md5(text) AS text_hash, min(doc_id) AS doc_id
FROM documents GROUP BY md5(text)
"""


def q_dedup_minhash(sf_dir: str):
    """MinHash-LSH near-dup clusters, distributed end-to-end: bands →
    shard-group pair residue → min-label propagation
    (``stages/dedup.label_propagation_components``, union-find
    equivalence pytest-verified) → (doc_id, rep_id). No pair set ever
    lands on the driver — at web scale the pair residue of a
    boilerplate-heavy corpus exceeds driver memory. Oracled: the FULL
    pipeline (crc32 shingles → wraparound minhash → banded LSH →
    agreement-verified pairs → connected components) has an exact
    DuckDB mirror (``_DEDUP_MINHASH_SQL``)."""
    from pdfextract_ray.stages.dedup import (default_shard_mask,
                                             label_propagation_components,
                                             minhash_bands_batch, pc_cast,
                                             shard_pairs_group)
    # mask derived ONCE on the driver: a bucket's rows must land in one
    # shard group, so every task must use the SAME mask — in-task
    # derivation could disagree if the visible cluster size changes
    # mid-run (autoscaling / node registration)
    mask = default_shard_mask()
    bands = _read_balanced(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(functools.partial(minhash_bands_batch, shard_mask=mask),
                     batch_format="pyarrow")
    pairs = bands.groupby("shard") \
        .map_groups(shard_pairs_group, batch_format="pandas") \
        .materialize()  # small post-LSH residue; distributed blocks
    if pairs.count() == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "rep_id": pa.array([], pa.int64())})
    labels = label_propagation_components(pairs)
    return labels.map_batches(
        lambda t: pa.table({"doc_id": pc_cast(t["node"]),
                            "rep_id": pc_cast(t["label"])}),
        batch_format="pyarrow").sort("doc_id")


def q_dedup_simhash(sf_dir: str):
    """SimHash low-Hamming pairs as a Dataset end-to-end: band bucketing
    → within-bucket verify → DISTRIBUTED pair dedupe (the same (a, b)
    pair surfaces from up to 4 bands: a groupby-Min aggregate folds the
    duplicates — hamming is identical across bands — instead of a
    driver-side drop_duplicates)."""
    from ray.data.aggregate import Min
    from pdfextract_ray.stages.dedup import (default_shard_mask, simhash_batch,
                                             simhash_shard_group)
    mask = default_shard_mask()  # driver-derived once; see q_dedup_minhash
    bands = _read_balanced(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(functools.partial(simhash_batch, shard_mask=mask),
                     batch_format="pyarrow")
    pairs = bands.groupby("shard") \
        .map_groups(simhash_shard_group, batch_format="pandas") \
        .materialize()
    if pairs.count() == 0:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "hamming": pa.array([], pa.int64())})
    return pairs.groupby(["a", "b"]) \
        .aggregate(Min("hamming", alias_name="hamming")) \
        .sort(["a", "b"])


# Above this many candidate pairs the id-broadcast verify path would
# put >~32 MB of ids on the driver; fall back to the fully distributed
# plan (ids are 16 B/pair; text NEVER lands on the driver either way).
_BROADCAST_PAIR_LIMIT = 2_000_000
# map-side tier: below this many UNIQUE candidate docs the shingle
# table (~1.6 KB/doc → ≤160 MB) is held as plasma refs and indexed
# inside each verify actor — no Dataset.join at all (each Ray 2.49
# join operator costs ~1-2 s fixed, and the pair-verify path has two)
_BROADCAST_DOC_LIMIT = 100_000


def _pair_text_join(pairs, sf_dir: str, n_pairs: int):
    """Attach precomputed shingle sets ``sh_a``/``sh_b`` (packed uint64
    bytes, ``dedup.shingle_bytes``) to candidate id pairs ``(a, b)``
    (duplicates folded) for exact verification. Shipping the shingle
    set instead of raw text means each doc is crc32-shingled ONCE here
    rather than once per candidate pair in the verify — and the verify
    becomes a C-speed sorted-array intersect.

    Three tiers by candidate size, each with the same output schema:

    1. ``len(unique docs) <= _BROADCAST_DOC_LIMIT``: map-side join —
       the candidate shingle table stays in plasma (``to_arrow_refs``;
       the driver holds refs only), each verify actor indexes it once,
       pairs stream through with ZERO Dataset.joins (each Ray 2.49
       join operator costs ~1-2 s fixed and this path had two).
    2. ``n_pairs <= _BROADCAST_PAIR_LIMIT``: broadcast-pruned joins —
       the deduplicated id pairs (16 bytes each) come to the driver,
       the candidate-id set is ``ray.put`` ONCE, every documents batch
       drops non-candidate rows BEFORE candidate-sized hash joins
       (measured at sf0.1/32cpu: 43 s of Aggregate + two corpus-wide
       joins became ~6 s).
    3. Above the pair limit: fully distributed — groupby pair-dedupe
       and two corpus-wide hash joins (the round-3 design; the whole
       corpus is shingled in the prune map — at that pair density most
       docs are candidates anyway).

    Ids may land on the driver under an explicit bound; document text
    never does, and the shingle payload at most reaches actor heaps
    under the tier-1 doc bound."""
    import numpy as np
    import pyarrow.compute as pc
    import ray
    import ray.data

    from pdfextract_ray.stages.dedup import shingle_bytes

    def _project(t: pa.Table, k: str, sn: str) -> pa.Table:
        sh = [shingle_bytes(x or "") for x in t["text"].to_pylist()]
        return pa.table({k: t["doc_id"],
                         sn: pa.array(sh, pa.binary())})

    if n_pairs <= _BROADCAST_PAIR_LIMIT:
        df = pairs.select_columns(["a", "b"]).to_pandas() \
                  .drop_duplicates(["a", "b"]).sort_values(["a", "b"])
        uniq_ids = np.unique(np.concatenate(
            [df["a"].to_numpy(), df["b"].to_numpy()]))
        ids_ref = ray.put(uniq_ids)

        def prune(t: pa.Table) -> pa.Table:
            ids = pa.array(ray.get(ids_ref), pa.int64())
            return _project(
                t.filter(pc.is_in(t["doc_id"], value_set=ids)),
                "key", "sh")

        # ONE scan + ONE shingling of the candidate docs, reused by
        # both join sides (candidate-sized, so the materialize is
        # bounded by the pair universe)
        base = _read(sf_dir, "documents", ["doc_id", "text"]) \
            .map_batches(prune, batch_format="pyarrow").materialize()

        if len(uniq_ids) <= _BROADCAST_DOC_LIMIT:
            # map-side tier: the shingle table stays in plasma
            # (to_arrow_refs — the DRIVER holds only refs, never the
            # corpus-derived payload); each verify actor indexes it
            # once in __init__ and the pairs stream through with zero
            # joins. Output schema identical to the join tiers.
            refs = base.to_arrow_refs()

            class _AttachShingles:
                def __init__(self, refs):
                    self.sh: dict = {}
                    for tbl in ray.get(list(refs)):
                        self.sh.update(zip(tbl["key"].to_pylist(),
                                           tbl["sh"].to_pylist()))

                def __call__(self, t: pa.Table) -> pa.Table:
                    sh_a = [self.sh.get(a, b"")
                            for a in t["a"].to_pylist()]
                    sh_b = [self.sh.get(b, b"")
                            for b in t["b"].to_pylist()]
                    return pa.table({
                        "a": t["a"], "b": t["b"],
                        "sh_a": pa.array(sh_a, pa.binary()),
                        "sh_b": pa.array(sh_b, pa.binary()),
                    })

            return ray.data.from_pandas(df).map_batches(
                _AttachShingles, fn_constructor_args=(refs,),
                batch_format="pyarrow", concurrency=(1, 4),
                batch_size=8192)

        def _docs(key: str, sh_name: str):
            return base.map_batches(
                lambda t, k=key, sn=sh_name: pa.table(
                    {k: t["key"], sn: t["sh"]}),
                batch_format="pyarrow")

        pairs_ds = coalesce_for_join(ray.data.from_pandas(df))
        nparts = 4  # candidate-sized join, not corpus-sized
    else:
        from ray.data.aggregate import Min

        def _docs(key: str, sh_name: str):
            return _read(sf_dir, "documents", ["doc_id", "text"]) \
                .map_batches(
                    lambda t, k=key, sn=sh_name: _project(t, k, sn),
                    batch_format="pyarrow")

        pairs_ds = coalesce_for_join(
            pairs.groupby(["a", "b"]).aggregate(Min("a", alias_name="_k")))
        nparts = join_partitions()

    with_a = pairs_ds.join(_docs("a_key", "sh_a"), join_type="inner",
                           num_partitions=nparts, on=("a",),
                           right_on=("a_key",))
    # join→join boundary MUST re-coalesce: sparse first-join output
    # emits schema-less EMPTY blocks that crash the second join's
    # FieldRef resolution under Ray 2.49 (the round-3 red row)
    with_a = coalesce_for_join(with_a)
    return with_a.join(_docs("b_key", "sh_b"), join_type="inner",
                       num_partitions=nparts, on=("b",),
                       right_on=("b_key",))


def q_dedup_minhash_verified(sf_dir: str, threshold: float = 0.4):
    """MinHash-LSH candidates verified with EXACT n-gram Jaccard — the
    estimate→verify pattern for production dedup, fully distributed:
    the candidate pairs are joined against the documents table on
    ``a`` then ``b`` (``_pair_text_join``: broadcast-pruned joins for
    bounded candidate sets, corpus-wide hash joins above the bound)
    and the exact Jaccard is computed inside the joined batches. No
    document text ever lands on the driver."""
    import pyarrow.compute as pc
    from pdfextract_ray.stages.dedup import (default_shard_mask,
                                             minhash_bands_batch,
                                             ngram_jaccard_packed,
                                             shard_pairs_group)

    mask = default_shard_mask()  # driver-derived once; see q_dedup_minhash
    bands = _read_balanced(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(functools.partial(minhash_bands_batch, shard_mask=mask),
                     batch_format="pyarrow")
    pairs = bands.groupby("shard") \
        .map_groups(shard_pairs_group, batch_format="pandas") \
        .materialize()  # post-LSH residue stays as distributed blocks
    n_pairs = pairs.count()
    if n_pairs == 0:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    with_ab = _pair_text_join(pairs, sf_dir, n_pairs)

    def verify(t: pa.Table) -> pa.Table:
        # raw |∩|/|∪| division, NOT rounded: both engines divide the
        # same two ints, so the IEEE result is bit-identical and the
        # oracle hash matches without a grid snap
        jac = [ngram_jaccard_packed(sa, sb)
               for sa, sb in zip(t["sh_a"].to_pylist(),
                                 t["sh_b"].to_pylist())]
        out = pa.table({"a": t["a"], "b": t["b"],
                        "jaccard": pa.array(jac, pa.float64())})
        return out.filter(pc.greater_equal(out["jaccard"], threshold))

    return with_ab.map_batches(verify, batch_format="pyarrow")


def q_dedup_ngram_jaccard(sf_dir: str, t_num: int = 4, t_den: int = 5):
    """EXACT n-gram-Jaccard near-dup pairs (J >= t_num/t_den, default
    0.8) via a prefix-filter set-similarity self-join — the All-Pairs /
    PPJoin family (Bayardo et al. WWW'07), no MinHash estimation
    anywhere. The oracle is the brute-force DEFINITION (every doc pair's
    exact shingle-set Jaccard in DuckDB), so a green hash proves the
    prefix filter dropped no qualifying pair.

    Distributed end-to-end (see ``stages/dedup.py``'s All-Pairs block
    for the theorem and the shuffle-by-shuffle plan): the exploded
    (doc, shingle) index STREAMS into the frequency-attach groupby —
    the per-token frequency is computed inside that same shard group,
    so no second consumer and no materialize barrier. Every shuffle key
    is masked into shard groups under ONE driver-derived mask, and the
    final verify is the same pairs⋈documents⋈documents hash-join
    pattern as ``dedup_minhash_verified``."""
    import pyarrow.compute as pc
    from pdfextract_ray.stages.dedup import (default_shard_mask,
                                             ngram_jaccard_packed,
                                             prefix_pairs_shard,
                                             prefix_tokens_shard,
                                             shingle_explode_batch,
                                             token_freq_shard)

    threshold = t_num / t_den
    # mask derived ONCE on the driver: token_freq_shard's completeness
    # premise (all rows of one h32 in one shard group) requires every
    # explode task to agree on the same mask
    mask = default_shard_mask()
    exploded = _read_balanced(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(functools.partial(shingle_explode_batch, shard_mask=mask),
                     batch_format="pyarrow")
    with_freq = exploded.groupby("shard") \
        .map_groups(functools.partial(token_freq_shard, shard_mask=mask),
                    batch_format="pandas")
    prefixes = with_freq.groupby("dshard") \
        .map_groups(functools.partial(prefix_tokens_shard,
                                      t_num=t_num, t_den=t_den,
                                      shard_mask=mask),
                    batch_format="pandas")
    pairs = prefixes.groupby("tshard") \
        .map_groups(functools.partial(prefix_pairs_shard,
                                      t_num=t_num, t_den=t_den),
                    batch_format="pandas") \
        .materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    # the same pair can arrive from several shared prefix tokens —
    # _pair_text_join folds duplicates and attaches both texts
    with_ab = _pair_text_join(pairs, sf_dir, n_pairs)

    def verify(t: pa.Table) -> pa.Table:
        # raw |∩|/|∪| int division — bit-identical to the oracle's
        jac = [ngram_jaccard_packed(sa, sb)
               for sa, sb in zip(t["sh_a"].to_pylist(),
                                 t["sh_b"].to_pylist())]
        out = pa.table({"a": t["a"], "b": t["b"],
                        "jaccard": pa.array(jac, pa.float64())})
        return out.filter(pc.greater_equal(out["jaccard"], threshold))

    return with_ab.map_batches(verify, batch_format="pyarrow")


# dedup_ngram_jaccard oracle: the brute-force definition — every doc
# pair's exact shingle-set Jaccard from the shared h CTE, thresholded.
# No mirror of the prefix-filter mechanics: a hash match proves the
# distributed algorithm found exactly the defined pair set.
_DEDUP_NGRAM_JACCARD_SQL = _shingle_cte_prefix() + r"""
, na AS (SELECT doc_id, count(*) AS n FROM h GROUP BY doc_id),
inter AS (
  SELECT ha.doc_id AS a, hb.doc_id AS b, count(*) AS ni
  FROM h ha JOIN h hb ON ha.h32 = hb.h32 AND ha.doc_id < hb.doc_id
  GROUP BY 1, 2
)
SELECT CAST(i.a AS BIGINT) AS a, CAST(i.b AS BIGINT) AS b,
       i.ni / CAST(x.n + y.n - i.ni AS DOUBLE) AS jaccard
FROM inter i
JOIN na x ON x.doc_id = i.a
JOIN na y ON y.doc_id = i.b
WHERE i.ni / CAST(x.n + y.n - i.ni AS DOUBLE) >= 0.8
ORDER BY a, b
"""


# -------------------------------------------------------------- similarity

def q_knn_cosine(sf_dir: str):
    import pyarrow.parquet as pq
    import ray
    from pdfextract_ray.stages.similarity import TopKPartial, topk_merge_group

    # pushdown-filtered read: only the 10 query rows leave storage
    # (row-group pruning + predicate), never the full embeddings table
    q_tbl = pq.read_table(_pq(sf_dir, "embeddings"),
                          columns=["vec_id", "embedding"],
                          filters=[("vec_id", "<", 10)])
    import numpy as np
    qmat = np.stack(q_tbl["embedding"].combine_chunks().to_numpy(zero_copy_only=False))
    queries_ref = ray.put((q_tbl["vec_id"].to_pylist(), qmat))

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    partials = ds.map_batches(TopKPartial, batch_format="pyarrow",
                              fn_constructor_kwargs=dict(queries_ref=queries_ref, k=5),
                              concurrency=(1, 4))
    # coalesce the tiny partial set (n_queries x k x n_blocks rows)
    # before the merge groupby: the groupby's range sort otherwise
    # scatters ~50 rows over dozens of mostly-EMPTY partitions, which
    # emit schema-less blocks (Ray 2.49 'different schema' warnings)
    return partials.repartition(2).groupby("query_id") \
        .map_groups(topk_merge_group, batch_format="pandas")


_KNN_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
s AS (SELECT q.query_id, e.vec_id,
             list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
                                    CAST(e.embedding AS DOUBLE[])) AS c
      FROM q CROSS JOIN embeddings e),
r AS (SELECT query_id, vec_id, c,
             row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS rank
      FROM s)
SELECT query_id, vec_id, round(c * 1000000, 0) / 1000000.0 AS cosine,
       CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 5
"""


def q_knn_ivf(sf_dir: str, nlist: int | None = None,
              nprobe: int | None = None):
    """IVF approximate top-k: train a seeded coarse quantizer on a
    sample, assign cells, probe nprobe cells per query. Approximate by
    design (recall < 1 vs knn_cosine) but deterministic.

    ``nlist`` defaults to ``derive_nlist(N)`` (~sqrt of the corpus
    size, from parquet METADATA only — no data read) and ``nprobe`` to
    the measured-recall scan fraction of it, so the same query stays
    sublinear at 10^12 vectors instead of freezing 16 cells."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray
    from pdfextract_ray.stages.ivf import (IvfTopKPartial, assign_cells_batch,
                                           derive_nlist, derive_nprobe,
                                           train_centroids)
    from pdfextract_ray.stages.similarity import topk_merge_group

    if nlist is None:
        n_vecs = pq.ParquetFile(_pq(sf_dir, "embeddings")) \
            .metadata.num_rows
        nlist = derive_nlist(n_vecs)
    if nprobe is None:
        nprobe = derive_nprobe(nlist)
    # deterministic training sample = vec_id < max(256, 4*nlist) (ids
    # are dense from 0; at scale substitute any pushdown-expressible
    # deterministic sample, e.g. hash(vec_id) % p == 0).
    # Pushdown-filtered reads only — the embeddings table never
    # reaches the driver whole.
    s_tbl = pq.read_table(_pq(sf_dir, "embeddings"),
                          columns=["vec_id", "embedding"],
                          filters=[("vec_id", "<", max(256, 4 * nlist))])
    s_order = np.argsort(np.asarray(s_tbl["vec_id"].to_pylist()))
    s_col = s_tbl["embedding"].combine_chunks()
    sample = np.stack([np.asarray(s_col[int(i)].as_py()) for i in s_order])
    centroids_ref = ray.put(train_centroids(sample, nlist=nlist))

    q_tbl = pq.read_table(_pq(sf_dir, "embeddings"),
                          columns=["vec_id", "embedding"],
                          filters=[("vec_id", "<", 10)])
    q_order = np.argsort(np.asarray(q_tbl["vec_id"].to_pylist()))
    q_col = q_tbl["embedding"].combine_chunks()
    qmat = np.stack([np.asarray(q_col[int(i)].as_py()) for i in q_order])
    queries_ref = ray.put(([int(q_tbl["vec_id"][int(i)].as_py()) for i in q_order],
                           qmat))

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    assigned = ds.map_batches(assign_cells_batch, batch_format="pyarrow",
                              fn_kwargs=dict(centroids_ref=centroids_ref))
    partials = assigned.map_batches(
        IvfTopKPartial, batch_format="pyarrow",
        # scan fraction 3/8 of cells: uniform-random embeddings are
        # the adversarial case for IVF (no cluster structure),
        # measured recall@5 0.58 at 4/16 -> ~0.7+ at 6/16
        fn_constructor_kwargs=dict(queries_ref=queries_ref,
                                   centroids_ref=centroids_ref, k=5,
                                   nprobe=nprobe),
        concurrency=(1, 4))
    # coalesce tiny partials before the merge groupby (see q_knn_cosine)
    return partials.repartition(2).groupby("query_id") \
        .map_groups(topk_merge_group, batch_format="pandas")


def q_knn_ivf_recall(sf_dir: str):
    """Self-evaluating ANN quality: recall@5 of the IVF approximate
    top-k against the exact brute-force top-k, per query vector plus a
    macro average row (query_id = -1). Both sides are tiny per-query
    top-k results, so the comparison is a driver-side set intersection
    over 50 rows — the expensive work stays distributed."""
    exact = q_knn_cosine(sf_dir).to_pandas()
    approx = q_knn_ivf(sf_dir).to_pandas()
    ex = exact.groupby("query_id")["vec_id"].apply(set)
    ap = approx.groupby("query_id")["vec_id"].apply(set)
    qids = sorted(ex.index)
    recalls = [len(ex[q] & ap.get(q, set())) / max(1, len(ex[q]))
               for q in qids]
    return pa.table({
        "query_id": pa.array(qids + [-1], pa.int64()),
        "recall_at_5": pa.array(recalls + [sum(recalls) / len(recalls)],
                                pa.float64()),
    })


def q_knn_text_ivf_recall(sf_dir: str):
    """END-TO-END text→embedding→ANN (round-4 verdict item): embed the
    DOCUMENTS table with the deterministic hashing-trick 3-gram
    embedder (``stages/embed.py``), run brute-force exact cosine top-k
    AND derived-nlist IVF top-k over the derived vectors, and report
    per-query recall@5 plus the macro average (query_id = -1) — the
    whole vector stack running with no embeddings table at all.

    Distributed shape: the corpus is embedded ONCE into a (vec_id,
    embedding) Dataset consumed by both arms; queries/centroid-sample
    are pushdown-filtered document reads embedded driver-side (bounded:
    10 + 4*nlist rows). A pinned recall floor lives in
    tests/test_embed.py."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray
    from pdfextract_ray.stages.embed import embed_docs, embed_text
    from pdfextract_ray.stages.ivf import (IvfTopKPartial, assign_cells_batch,
                                           derive_nlist, derive_nprobe,
                                           train_centroids)
    from pdfextract_ray.stages.similarity import (TopKPartial,
                                                  topk_merge_group)

    n_docs = pq.ParquetFile(_pq(sf_dir, "documents")).metadata.num_rows
    nlist = derive_nlist(n_docs)
    nprobe = derive_nprobe(nlist)

    # bounded driver-side embeds: the 10 query docs + the centroid
    # training sample (pushdown-filtered reads, never the full corpus)
    s_tbl = pq.read_table(_pq(sf_dir, "documents"),
                          columns=["doc_id", "text"],
                          filters=[("doc_id", "<", max(256, 4 * nlist))]) \
        .sort_by("doc_id")
    sample = np.stack([embed_text(s) for s in s_tbl["text"].to_pylist()])
    centroids_ref = ray.put(train_centroids(sample, nlist=nlist))
    q_ids = [int(v) for v in s_tbl["doc_id"].to_pylist()[:10]]
    qmat = sample[:10]
    queries_ref = ray.put((q_ids, qmat))

    # embed the corpus ONCE; both arms consume the same Dataset
    vecs = embed_docs(_read_balanced(sf_dir, "documents",
                                     ["doc_id", "text"])).materialize()

    exact = vecs.map_batches(
        TopKPartial, batch_format="pyarrow",
        fn_constructor_kwargs=dict(queries_ref=queries_ref, k=5),
        concurrency=(1, 4)) \
        .repartition(2).groupby("query_id") \
        .map_groups(topk_merge_group, batch_format="pandas").to_pandas()

    assigned = vecs.map_batches(assign_cells_batch, batch_format="pyarrow",
                                fn_kwargs=dict(centroids_ref=centroids_ref))
    approx = assigned.map_batches(
        IvfTopKPartial, batch_format="pyarrow",
        fn_constructor_kwargs=dict(queries_ref=queries_ref,
                                   centroids_ref=centroids_ref, k=5,
                                   nprobe=nprobe),
        concurrency=(1, 4)) \
        .repartition(2).groupby("query_id") \
        .map_groups(topk_merge_group, batch_format="pandas").to_pandas()

    ex = exact.groupby("query_id")["vec_id"].apply(set)
    ap = approx.groupby("query_id")["vec_id"].apply(set)
    qids = sorted(ex.index)
    recalls = [len(ex[q] & ap.get(q, set())) / max(1, len(ex[q]))
               for q in qids]
    return pa.table({
        "query_id": pa.array(qids + [-1], pa.int64()),
        "recall_at_5": pa.array(recalls + [sum(recalls) / len(recalls)],
                                pa.float64()),
    })


def q_embedding_near_dup(sf_dir: str):
    """Near-duplicate vector pairs via multi-table hyperplane LSH.

    The driver's embeddings are uniform-random (max pairwise cosine
    ≈ 0.48 — no true near-dups), so the corpus is deterministically
    AUGMENTED with slightly perturbed copies of the 20 lowest vec_ids
    (id + 1_000_000; noise seeded per id). The query must recover
    exactly those planted pairs — a self-verifying recall check."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data
    from ray.data.aggregate import Min
    from pdfextract_ray.stages.similarity import (cosine_pairs_group,
                                                  hyperplane_bucket_batch)

    # pushdown-filtered read of just the 20 rows to perturb (ids are
    # dense from 0) — not a whole-table driver read
    base = pq.read_table(_pq(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"],
                         filters=[("vec_id", "<", 20)])
    emb = base["embedding"].combine_chunks()
    pert_ids, pert_vecs = [], []
    for i, vid in enumerate(base["vec_id"].to_pylist()):
        rng = np.random.RandomState(vid + 99)
        v = np.asarray(emb[i].as_py(), dtype=np.float32)
        pert_vecs.append((v + rng.standard_normal(v.shape).astype(np.float32)
                          * 0.01).tolist())
        pert_ids.append(vid + 1_000_000)
    planted = pa.table({
        "vec_id": pa.array(pert_ids, pa.int64()),
        "embedding": pa.array(pert_vecs, base.schema.field("embedding").type),
    })

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"]) \
        .union(ray.data.from_arrow(planted))
    buckets = ds.map_batches(lambda t: hyperplane_bucket_batch(t, dim=64),
                             batch_format="pyarrow")
    pairs = buckets.groupby(["table_id", "bucket"]).map_groups(
        cosine_pairs_group, batch_format="pandas").materialize()
    if pairs.count() == 0:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    # distributed dedupe (same pair from multiple LSH tables; cosine is
    # identical across tables so a Min aggregate folds duplicates);
    # repartition first: most LSH buckets are singletons, so the
    # map_groups output is riddled with schema-less empty blocks that
    # otherwise trip Ray 2.49's "different schema" warnings
    return pairs.repartition(join_partitions()).groupby(["a", "b"]) \
        .aggregate(Min("cosine", alias_name="cosine")) \
        .sort(["a", "b"])


def q_semantic_sample(sf_dir: str):
    """SemDeDup-style cluster-balanced subset verdicts over the
    documents table (``stages/semsample.py``: hashing-trick embed →
    seeded k-means cells (~sqrt N) → within-cell greedy cosine prune →
    per-cell cap; Abbas et al. 2023). Rows-only: k-means is not
    SQL-expressible; semantics are pinned by tests/test_semsample.py
    (cap, prune collapse, determinism, verdict≡apply)."""
    import pyarrow.parquet as pq
    from pdfextract_ray.stages.ivf import derive_nlist
    from pdfextract_ray.stages.semsample import semantic_sample_verdicts

    n = pq.ParquetFile(_pq(sf_dir, "documents")).metadata.num_rows
    return semantic_sample_verdicts(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        cap_per_cell=8, n_cells=derive_nlist(n), dedup_cos=0.95) \
        .sort("doc_id")


def q_doc_token_stats(sf_dir: str):
    """Per-document REAL token counts: n_ws_tokens (the pinned
    ASCII-whitespace word count) next to n_bpe_tokens under the frozen
    from-scratch byte-level BPE table (``stages/bpe.py`` — Sennrich et
    al. 2016 over UTF-8 bytes; deterministic, data/bpe_merges.txt).
    Rows-only (BPE is not SQL-expressible); the encoder itself is
    property-tested against the definitional replay encoder, and
    ``pack --bpe`` budgets in these counts."""
    from pdfextract_ray.stages.bpe import token_counts_bpe
    from pdfextract_ray.stages.textstats import ascii_words

    def ws(t: pa.Table) -> pa.Table:
        ns = [len(ascii_words(s)) if s else 0
              for s in t["text"].to_pylist()]
        return t.append_column("n_ws_tokens", pa.array(ns, pa.int64()))

    docs = _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(ws, batch_format="pyarrow")
    return token_counts_bpe(docs, out_col="n_bpe_tokens",
                            keep_cols=["n_ws_tokens"]) \
        .sort("doc_id")


# -------------------------------------------------------------- multimodal

def q_multimodal_pipeline(sf_dir: str):
    """The three media ops fused in ONE actor pass per payload
    (:class:`~pdfextract_ray.stages.multimodal.MultimodalSuite`):
    decode (real BMP/PNG/WAV codecs) + nearest-neighbor resize
    (re-encoded bytes pinned by md5) + sample-accurate PCM frame
    windows (pinned by count + md5 over concatenated frames). One row
    per media, nulls where a stage doesn't apply to the modality.
    Merges ``multimodal_decode`` + ``multimodal_resize`` +
    ``multimodal_frames`` into one registry entry."""
    from pdfextract_ray.stages.multimodal import MultimodalSuite, synth_real_media_batch
    media = _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(synth_real_media_batch, batch_format="pyarrow")
    return media.map_batches(MultimodalSuite, batch_format="pyarrow",
                             batch_size=64, concurrency=(1, 4))


def q_multimodal_decode(sf_dir: str):
    """REAL decode path: BMP/WAV payloads decoded by the pure-Python
    codecs (PIL would be picked up if importable)."""
    from pdfextract_ray.stages.multimodal import DecodeMedia, synth_real_media_batch
    media = _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(synth_real_media_batch, batch_format="pyarrow")
    return media.map_batches(DecodeMedia, batch_format="pyarrow",
                             batch_size=64, concurrency=(1, 4)) \
        .select_columns(["media_id", "kind", "width", "height", "decoded"])


def q_multimodal_resize(sf_dir: str):
    """REAL nearest-neighbor BMP resize (decode -> subsample -> re-encode)."""
    from pdfextract_ray.stages.multimodal import ResizeImages, synth_real_media_batch
    media = _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(synth_real_media_batch, batch_format="pyarrow")
    return media.map_batches(ResizeImages, batch_format="pyarrow",
                             batch_size=64, concurrency=(1, 4)) \
        .select_columns(["media_id", "kind", "width", "height"])


def q_multimodal_frames(sf_dir: str):
    """REAL sample-accurate WAV frame windows from decoded PCM."""
    from pdfextract_ray.stages.multimodal import SampleFrames, synth_real_media_batch
    media = _read(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(synth_real_media_batch, batch_format="pyarrow")
    frames = media.map_batches(SampleFrames, batch_format="pyarrow",
                               batch_size=64, concurrency=(1, 4))
    import pyarrow.compute as pc

    def digest(t: pa.Table) -> pa.Table:
        import hashlib as hl
        return pa.table({
            "media_id": t["media_id"],
            "frame_index": t["frame_index"],
            "frame_md5": pa.array([hl.md5(b).hexdigest() for b in
                                   t["frame"].to_pylist()], pa.string()),
        })
    return frames.map_batches(digest, batch_format="pyarrow")


# -------------------------------------------------------------- relational

_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       SUM(CAST(round(l_quantity * 10000, 0) AS BIGINT)) / 10000.0                        AS sum_qty,
       SUM(CAST(round(l_extendedprice * 10000, 0) AS BIGINT)) / 10000.0                   AS sum_base_price,
       SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 10000.0 AS sum_disc_price,
       count(*)                                          AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

_NATION_REVENUE_SQL = """
SELECT n_name, SUM(CAST(round(o_totalprice * 10000, 0) AS BIGINT)) / 10000.0 AS revenue, count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""

_TOP_DOCS_SQL = """
SELECT doc_id, n_chars, source FROM documents
ORDER BY n_chars DESC, doc_id LIMIT 20
"""

_EVENTS_HOURLY_SQL = """
SELECT event_type, date_trunc('hour', ts) AS hour,
       SUM(CAST(round(value * 10000, 0) AS BIGINT)) / 10000.0 AS sum_value, count(*) AS n_events
FROM events GROUP BY 1, 2
"""

_ORDERS_BY_STATUS_SQL = """
SELECT o_orderstatus, count(*) AS n_orders,
       SUM(CAST(round(o_totalprice * 10000, 0) AS BIGINT)) / 10000.0 AS total, max(o_totalprice) AS max_price
FROM orders GROUP BY 1
"""

_EVENTS_SESSIONIZE_SQL = """
WITH d AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
  FROM events
),
s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM d
)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
       SUM(CAST(round(value * 10000, 0) AS BIGINT)) / 10000.0 AS sum_value
FROM s GROUP BY user_id, sid
"""

_PART_BRAND_SQL = """
SELECT p_brand, count(*) AS n_parts,
       SUM(CAST(round(p_retailprice * 10000, 0) AS BIGINT)) / (count(*) * 10000.0) AS avg_price,
       min(p_size) AS min_size, max(p_size) AS max_size
FROM part GROUP BY p_brand
"""

_DISTINCT_EVENT_TYPES_SQL = """
SELECT event_type, count(*) AS n FROM events GROUP BY event_type
"""

_ORDER_LINEITEM_JOIN_SQL = """
SELECT o_orderkey, o_orderstatus, count(*) AS n_items,
       SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 10000.0 AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderkey, o_orderstatus
"""

_DOC_LENGTH_HIST_SQL = """
SELECT (n_chars // 50) * 50 AS bucket, count(*) AS n_docs
FROM documents GROUP BY 1
"""

_SAMPLE_DOCS_SQL = """
SELECT doc_id, lang, n_chars FROM documents WHERE (doc_id & 7) = 0
"""

_UNION_EXTREMES_SQL = """
SELECT doc_id, n_chars FROM documents WHERE n_chars < 150
UNION ALL
SELECT doc_id, n_chars FROM documents WHERE n_chars > 450
"""

_Q3_SQL = """
SELECT o_orderkey,
       SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) / 10000.0 AS revenue,
       o_orderdate
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""

_VALUE_PERCENTILES_SQL = """
SELECT event_type,
       quantile_disc(value, 0.5)  AS p50,
       quantile_disc(value, 0.9)  AS p90,
       quantile_disc(value, 0.99) AS p99,
       count(*) AS n
FROM events GROUP BY event_type
"""

_TOP_DOCS_PER_LANG_SQL = """
WITH r AS (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id) AS rank
  FROM documents
)
SELECT lang, doc_id, n_chars, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 3
"""

_SUPPLIER_BALANCE_SQL = """
SELECT r_name,
       SUM(CAST(round(s_acctbal * 10000, 0) AS BIGINT)) / 10000.0 AS total_bal,
       max(s_acctbal) AS max_bal, count(*) AS n_suppliers
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""

_EVENTS_ROLLING_SQL = """
SELECT event_id, user_id, ts,
  SUM(CAST(round(value * 10000, 0) AS BIGINT)) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) / 10000.0 AS rolling_sum
FROM events
"""

_EVENTS_LEAD_LAG_SQL = """
SELECT event_id, user_id,
  lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
  CAST(date_diff('microsecond', ts,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
       AS DOUBLE) / 1000000.0 AS next_gap_sec
FROM events
"""

_EVENTS_ASOF_SQL = """
WITH v AS (
  SELECT user_id, ts AS view_ts, max(event_id) AS view_id
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
),
p AS (
  SELECT event_id AS purchase_id, user_id, ts
  FROM events WHERE event_type = 'purchase'
)
SELECT p.purchase_id, p.user_id, p.ts, v.view_ts, v.view_id
FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ts >= v.view_ts
"""

_EVENTS_RANGE_JOIN_SQL = """
WITH tiers(tier, lo, hi) AS (
  VALUES ('low', 0.0, 25.0), ('mid', 25.0, 75.0), ('high', 75.0, 1e18)
)
SELECT t.tier,
       SUM(CAST(round(e.value * 10000, 0) AS BIGINT)) / 10000.0 AS sum_value,
       count(*) AS n_events
FROM events e JOIN tiers t ON e.value >= t.lo AND e.value < t.hi
GROUP BY t.tier
"""


def build_queries() -> dict:
    """Query registry: EXACTLY 50 entries (the driver snapshot caps at
    50), oracled entries first, so every capability keeps a driver row.

    Registry delta vs round 3 (merges, not drops — each merged query
    is the natural composition of its parts and is regression-tested
    equal to them; the standalone functions stay importable and
    pytest-covered):

    - ``references_pipeline`` = extract_references → resolved_references
      → bibtex (one resolve pass; per-step columns pin each step);
    - ``extract_views``       = extract_titles + extract_xml_spatials +
      extract_mark_svg (one kernel pass per doc → title/xml/svg cols);
    - ``multimodal_pipeline`` = multimodal_decode + multimodal_resize +
      multimodal_frames (one actor pass; per-stage md5-pinned cols);
    - ``curate_corpus``       = r3 curate_corpus (this table's rows) +
      curate_corpus_neardup (its ``is_representative`` rows).

    Two slot swaps fund two NEW oracled training-data operators:
    ``doc_fingerprint``'s md5 folded into ``doc_stats`` (still
    hash-verified, as a column) and ``sample_docs`` retired (the
    sampling class stays oracled via ``stratified_sample``; the
    function remains importable) — freeing slots for ``decontaminate``
    (benchmark n-gram-overlap scan) and ``paragraph_dedup``
    (cross-document span-level exact dedup), both hash-oracled.

    ``extract_xml`` (superseded by the full per-type render inside
    ``extract_views``) and ``knn_ivf`` (superseded by the
    self-evaluating ``knn_ivf_recall``) stay importable +
    pytest-covered but are not registered."""
    from pdfextract_ray.pipelines import relational as rel
    return {
        # ---- oracled (39): hash-checked against DuckDB by the driver
        "doc_stats": q_doc_stats,
        "doc_rolling_fp": q_doc_rolling_fp,
        "doc_quality": q_doc_quality,
        "lang_counts": q_lang_counts,
        "top_bigrams": q_top_bigrams,
        "lang_id": q_lang_id,
        "dedup_exact": q_dedup_exact,
        "dedup_simhash": q_dedup_simhash,
        "knn_cosine": q_knn_cosine,
        "q1_pricing": rel.q1_pricing,
        "nation_revenue": rel.nation_revenue,
        "order_lineitem_join": rel.order_lineitem_join,
        "q3_shipping": rel.q3_shipping,
        "top_docs": rel.top_docs,
        "events_hourly": rel.events_hourly,
        "events_sessionize": rel.events_sessionize,
        "events_rolling": rel.events_rolling,
        "events_asof_join": rel.events_asof_join,
        "events_lead_lag": rel.events_lead_lag,
        "events_range_join": rel.events_range_join,
        "top_docs_per_lang": rel.top_docs_per_lang,
        "supplier_balance_by_region": rel.supplier_balance_by_region,
        "value_percentiles": rel.value_percentiles,
        "part_brand_stats": rel.part_brand_stats,
        "distinct_event_types": rel.distinct_event_types,
        "doc_length_histogram": rel.doc_length_histogram,
        "union_extremes": rel.union_extremes,
        "orders_by_status": rel.orders_by_status,
        "dedup_minhash": q_dedup_minhash,
        "dedup_minhash_verified": q_dedup_minhash_verified,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "doc_repetition": q_doc_repetition,
        "pii_scan": q_pii_scan,
        "source_stats": q_source_stats,
        "vocab_coverage": q_vocab_coverage,
        "stratified_sample": q_stratified_sample,
        "doc_lm_score": q_doc_lm_score,
        "decontaminate": q_decontaminate,
        "paragraph_dedup": q_paragraph_dedup,
        "lang_segments": q_lang_segments,
        "lm_buckets": q_lm_buckets,
        # ---- rows-only (11): non-SQL-expressible pipelines — all
        # inside the 50-entry driver snapshot (39 oracled + 11 = 50)
        "extract_flagship": q_extract_flagship,
        "extract_exploded": q_extract_exploded,
        "extract_adaptive": q_extract_adaptive,
        "references_pipeline": q_references_pipeline,
        "extract_accuracy": q_extract_accuracy,
        "curate_corpus": q_curate_corpus_annotated,
        "extraction_metrics": q_extraction_metrics,
        "knn_ivf_recall": q_knn_ivf_recall,
        "embedding_near_dup": q_embedding_near_dup,
        "extract_views": q_extract_views,
        "multimodal_pipeline": q_multimodal_pipeline,
        "doc_token_stats": q_doc_token_stats,
        "knn_text_ivf_recall": q_knn_text_ivf_recall,
        "semantic_sample": q_semantic_sample,
    }


def build_oracles() -> dict:
    return {
        "doc_stats": _DOC_STATS_SQL,
        "doc_quality": _DOC_QUALITY_SQL,
        "lang_counts": _LANG_COUNTS_SQL,
        "top_bigrams": _TOP_BIGRAMS_SQL,
        "dedup_exact": _DEDUP_EXACT_SQL,
        "lang_id": _LANG_ID_SQL,
        "lang_segments": _LANG_SEGMENTS_SQL,
        "lm_buckets": _LM_BUCKETS_SQL,
        "dedup_simhash": _DEDUP_SIMHASH_SQL,
        "knn_cosine": _KNN_SQL,
        "q1_pricing": _Q1_SQL,
        "nation_revenue": _NATION_REVENUE_SQL,
        "order_lineitem_join": _ORDER_LINEITEM_JOIN_SQL,
        "q3_shipping": _Q3_SQL,
        "top_docs": _TOP_DOCS_SQL,
        "events_hourly": _EVENTS_HOURLY_SQL,
        "events_sessionize": _EVENTS_SESSIONIZE_SQL,
        "events_rolling": _EVENTS_ROLLING_SQL,
        "events_asof_join": _EVENTS_ASOF_SQL,
        "events_lead_lag": _EVENTS_LEAD_LAG_SQL,
        "events_range_join": _EVENTS_RANGE_JOIN_SQL,
        "top_docs_per_lang": _TOP_DOCS_PER_LANG_SQL,
        "supplier_balance_by_region": _SUPPLIER_BALANCE_SQL,
        "value_percentiles": _VALUE_PERCENTILES_SQL,
        "doc_rolling_fp": _ROLLING_FP_SQL,
        "part_brand_stats": _PART_BRAND_SQL,
        "distinct_event_types": _DISTINCT_EVENT_TYPES_SQL,
        "doc_length_histogram": _DOC_LENGTH_HIST_SQL,
        "union_extremes": _UNION_EXTREMES_SQL,
        "orders_by_status": _ORDERS_BY_STATUS_SQL,
        "dedup_minhash": _DEDUP_MINHASH_SQL,
        "dedup_minhash_verified": _DEDUP_MINHASH_VERIFIED_SQL,
        "dedup_ngram_jaccard": _DEDUP_NGRAM_JACCARD_SQL,
        "doc_repetition": _DOC_REPETITION_SQL,
        "pii_scan": _pii_sql(),
        "source_stats": _SOURCE_STATS_SQL,
        "vocab_coverage": _VOCAB_COVERAGE_SQL,
        "stratified_sample": _STRATIFIED_SAMPLE_SQL,
        "doc_lm_score": _DOC_LM_SCORE_SQL,
        "decontaminate": _build_decontaminate_sql(),
        "paragraph_dedup": _build_paragraph_dedup_sql(),
    }
