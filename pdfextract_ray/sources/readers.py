"""Alternate corpus ingestion paths.

- :func:`read_html_files` — raw-file ingestion (the analogue of the
  reference's per-PDF-file reader, ``pdf.rb:164-174`` /
  ``bin/pdf-extract``'s per-file loop): a directory of ``.html`` files
  becomes a corpus-schema Dataset via ``ray.data.read_binary_files``.
- :func:`corpus_from_table` — wrap an in-memory Arrow table.
"""

from __future__ import annotations

import pyarrow as pa

_EPOCH_US = 1_704_067_200_000_000


def read_html_files(path: str, lang: str = "und"):
    """Directory (or glob) of raw HTML files → corpus-schema Dataset."""
    import ray.data

    ds = ray.data.read_binary_files(path, include_paths=True)

    def to_corpus(t: pa.Table) -> pa.Table:
        paths = t["path"].to_pylist()
        return pa.table({
            "url": pa.array(["file://" + p for p in paths], pa.string()),
            "warc_ts": pa.array([_EPOCH_US] * len(paths), pa.timestamp("us")),
            "html": t["bytes"],
            "text": pa.array([""] * len(paths), pa.string()),
            "lang": pa.array([lang] * len(paths), pa.string()),
        })

    return ds.map_batches(to_corpus, batch_format="pyarrow")


def corpus_from_table(table: pa.Table):
    import ray.data
    return ray.data.from_arrow(table)
