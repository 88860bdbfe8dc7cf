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
