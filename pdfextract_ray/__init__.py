"""pdfextract_ray — a Ray-Data-native main-content extraction engine.

A from-scratch reimplementation of the data-processing capabilities of
CrossRef/pdfextract (the reference at /root/reference, Ruby) re-expressed
Ray-Data-first: ``ray.data.Dataset`` over Parquet shards of
Common-Crawl-style web pages ``(url, warc_ts, html:binary, text, lang)``,
``map_batches`` over zero-copy Arrow batches, actor pools for stateful
stages, partitioned/manifested output for checkpoint-resume, and
per-partition lineage metrics.

Layers
------
- ``kernel/``    pure-Python per-document algorithms (no Ray import) —
  the reference's live path (chunks→regions→margins→zones→columns→
  titles→sections→references) replicated semantically, plus the
  deterministic HTML layout front-end that stands in for the PDF
  content-stream interpreter.
- ``sources/``   corpus readers + the deterministic synthetic corpus.
- ``stages/``    Ray Data batch transforms / actor-pool stages.
- ``pipelines/`` end-to-end pipelines (extraction, relational, dedup).
- ``state/``     checkpoint manifests, resume logic.
"""

__version__ = "0.1.0"


def _mute_schema_hash_noise() -> None:
    """Drop Ray Data's per-worker "Failed to hash the schemas" warning.

    pyarrow cannot hash a Schema that carries key-value metadata
    (``hash(schema)`` raises ``unhashable type: 'dict'``), and every
    pandas-written parquet — including the driver's testdata — embeds
    a ``pandas`` metadata blob, so Ray's schema-dedup fast path logs
    this once per worker on every read. Purely cosmetic (Ray falls
    back to full unification); filter just that message."""
    import logging

    class _Filter(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            return not record.getMessage().startswith(
                "Failed to hash the schemas")

    logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow").addFilter(_Filter())


_mute_schema_hash_noise()
