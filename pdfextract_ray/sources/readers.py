"""Alternate corpus ingestion paths.

- :func:`read_html_files` — raw-file ingestion (the analogue of the
  reference's per-PDF-file reader, ``pdf.rb:164-174`` /
  ``bin/pdf-extract``'s per-file loop): a directory of ``.html`` files
  becomes a corpus-schema Dataset via ``ray.data.read_binary_files``.
- :func:`read_jsonl_corpus` — JSONL ingestion (the common wire format
  for web-text dumps: one JSON object per line with url/html/text
  fields), normalized to the corpus schema with vectorized casts.
- :func:`corpus_from_table` — wrap an in-memory Arrow table.

All readers emit the full corpus schema including ``html_size`` so the
one-read adaptive skew router (``exploded.py``) works on any source.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

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
            "html_size": pc.binary_length(t["bytes"]).cast(pa.int64()),
        })

    return ds.map_batches(to_corpus, batch_format="pyarrow")


def read_jsonl_corpus(path: str, *, url_field: str = "url",
                      html_field: str = "html", text_field: str = "text",
                      lang_field: str = "lang", ts_field: str = "warc_ts",
                      default_lang: str = "und"):
    """JSONL web-text dump → corpus-schema Dataset.

    One JSON object per line; ``url`` is required, everything else is
    optional and defaulted (text-only dumps get ``html=b""`` and still
    feed every ``documents``-style query; HTML dumps feed extraction).
    Field names are remappable for foreign dumps (e.g.
    ``ts_field="timestamp"``). Timestamps accept int64 epoch-us or an
    ISO-8601 string. Normalization is per-batch vectorized Arrow casts —
    the string→binary cast for ``html`` is zero-copy.
    """
    import ray.data

    ds = ray.data.read_json(path)

    def to_corpus(t: pa.Table) -> pa.Table:
        n = t.num_rows
        names = set(t.schema.names)
        if url_field not in names:
            raise ValueError(f"JSONL corpus is missing the '{url_field}' field")
        url = t[url_field].cast(pa.string())

        if html_field in names:
            col = t[html_field]
            html = col.cast(pa.binary()) if not pa.types.is_binary(col.type) \
                else col.combine_chunks()
        else:
            html = pa.array([b""] * n, pa.binary())

        if text_field in names:
            text = pc.fill_null(t[text_field].cast(pa.string()), "")
        else:
            text = pa.array([""] * n, pa.string())

        if lang_field in names:
            lang = pc.fill_null(t[lang_field].cast(pa.string()), default_lang)
        else:
            lang = pa.array([default_lang] * n, pa.string())

        if ts_field in names:
            # int64 epoch-us, ISO-8601 strings and native timestamps all cast
            ts = t[ts_field].cast(pa.timestamp("us"))
        else:
            ts = pa.array([_EPOCH_US] * n, pa.timestamp("us"))

        return pa.table({
            "url": url,
            "warc_ts": ts,
            "html": html,
            "text": text,
            "lang": lang,
            "html_size": pc.binary_length(html).cast(pa.int64()),
        })

    return ds.map_batches(to_corpus, batch_format="pyarrow")


def corpus_from_table(table: pa.Table):
    import ray.data
    return ray.data.from_arrow(table)
