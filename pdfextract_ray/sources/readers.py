"""Alternate corpus ingestion paths.

- :func:`read_html_files` — raw-file ingestion (the analogue of the
  reference's per-PDF-file reader, ``pdf.rb:164-174`` /
  ``bin/pdf-extract``'s per-file loop): a directory of ``.html`` files
  becomes a corpus-schema Dataset via ``ray.data.read_binary_files``.
- :func:`read_jsonl_corpus` — JSONL ingestion (the common wire format
  for web-text dumps: one JSON object per line with url/html/text
  fields), normalized to the corpus schema with vectorized casts.
- :func:`read_warc_corpus` — WARC ingestion (ISO 28500, the archival
  wire format 100-TB web crawls actually arrive in): ``response``
  records become corpus rows; ``warcinfo``/``request``/``metadata``
  records and non-HTML payloads are skipped.
- :func:`corpus_from_table` — wrap an in-memory Arrow table.

All readers emit the full corpus schema including ``html_size`` so the
one-read adaptive skew router (``exploded.py``) works on any source.
"""

from __future__ import annotations

import logging

import pyarrow as pa
import pyarrow.compute as pc

_LOG = logging.getLogger(__name__)

_EPOCH_US = 1_704_067_200_000_000


def _warc_resync(buf: bytes, pos: int, n: int, why: str) -> int:
    """Scan forward from ``pos`` for the next ``CRLFCRLF WARC/`` record
    boundary so a single corrupt record skips ITSELF, not the rest of
    the segment; logs the byte offset so truncation is observable."""
    nxt = buf.find(b"\r\n\r\nWARC/", pos)
    if nxt < 0:
        _LOG.warning("WARC: %s at byte %d; no further record boundary — "
                     "dropping the remaining %d bytes", why, pos, n - pos)
        return n
    _LOG.warning("WARC: %s at byte %d; resynced at byte %d "
                 "(skipped %d bytes)", why, pos, nxt + 4, nxt + 4 - pos)
    return nxt + 4


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
        # a null url cannot be partitioned/deduped — drop the row, but
        # never silently: log the count and offset context
        n_null_url = url.null_count
        if n_null_url:
            _LOG.warning("JSONL corpus: dropping %d row(s) with null '%s'",
                         n_null_url, url_field)
            keep = pc.is_valid(url)
            t = t.filter(keep)
            url = url.filter(keep)
            n = t.num_rows

        if html_field in names:
            col = t[html_field]
            html = col.cast(pa.binary()) if not pa.types.is_binary(col.type) \
                else col.combine_chunks()
            # rows missing the field parse as null — normalize to b"" so
            # downstream html_size/extraction see an empty doc, not None
            if html.null_count:
                html = pc.fill_null(html, b"")
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


def parse_warc_records(buf: bytes):
    """Yield ``(url, epoch_us, html_bytes)`` for each HTML ``response``
    record in one WARC file's bytes (ISO 28500 record grammar: a
    ``WARC/1.x`` header block, CRLFCRLF, ``Content-Length`` payload
    bytes, CRLFCRLF boundary).

    Pure function (no Ray) so the parser is unit-testable. Tolerant by
    design — a truncated tail record, a non-numeric Content-Length or a
    payload without an HTTP header block ends/skips that record instead
    of raising, because at crawl scale a single corrupt record must
    never kill a whole shard task (same per-record error isolation as
    the extraction stage, readers analogue of ``pdf.rb:164-174``'s
    per-file rescue).
    """
    pos = 0
    n = len(buf)
    while pos < n:
        # skip inter-record CRLFs
        while buf.startswith(b"\r\n", pos):
            pos += 2
        if pos >= n:
            return
        hdr_end = buf.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            return
        head = buf[pos:hdr_end]
        if not head.startswith(b"WARC/"):
            # lost framing — never silent: log the offset, then try to
            # resync at the next record boundary so one corrupt record
            # doesn't silently truncate the rest of the segment
            pos = _warc_resync(buf, pos, n, "lost WARC framing")
            continue
        headers = {}
        for line in head.split(b"\r\n")[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get(b"content-length", b""))
        except ValueError:
            pos = _warc_resync(buf, hdr_end + 4, n,
                               "unparseable Content-Length")
            continue
        body_start = hdr_end + 4
        body_end = body_start + clen
        if body_end > n:
            _LOG.warning(
                "WARC: truncated tail record at byte %d (need %d bytes, "
                "have %d) — dropping it", pos, clen, n - body_start)
            return
        payload = buf[body_start:body_end]
        pos = body_end

        if headers.get(b"warc-type") == b"response":
            url = headers.get(b"warc-target-uri", b"").decode(
                "utf-8", errors="replace").strip("<>")
            ts = _parse_warc_date(headers.get(b"warc-date"))
            html = _http_body(payload)
            if url and html is not None:
                yield url, ts, html


def _parse_warc_date(raw: bytes | None) -> int:
    """WARC-Date (ISO 8601 ``YYYY-MM-DDThh:mm:ssZ``) → epoch micros."""
    if not raw:
        return _EPOCH_US
    from datetime import datetime, timezone
    try:
        dt = datetime.fromisoformat(
            raw.decode("ascii").replace("Z", "+00:00"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp() * 1_000_000)
    except ValueError:
        return _EPOCH_US


def _http_body(payload: bytes) -> bytes | None:
    """HTTP response payload → entity body (None = skip the record:
    not parseable HTTP, or a declared non-HTML Content-Type — crawls
    interleave images/PDF/JS responses in the same segment; a missing
    Content-Type is given the benefit of the doubt)."""
    if not payload.startswith(b"HTTP/"):
        return None
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return None
    for line in payload[:sep].split(b"\r\n")[1:]:
        k, s, v = line.partition(b":")
        if s and k.strip().lower() == b"content-type":
            ct = v.strip().lower()
            if ct and b"html" not in ct and not ct.startswith(b"text/"):
                return None
            break
    return payload[sep + 4:]


def read_warc_corpus(path: str):
    """WARC file(s) → corpus-schema Dataset.

    One ``read_binary_files`` task per ``.warc`` / ``.warc.gz`` file —
    the same unit of parallelism Common-Crawl-style jobs use (crawls
    ship as many ~1 GB segment files, so file-level fan-out saturates a
    cluster without any splitting logic; a task holds one decompressed
    segment in heap, so keep segments to the conventional ~1 GB).
    Record parsing is necessarily a per-record byte scan, but it runs
    inside the parallel tasks, not on the driver. ``text`` is left empty
    (extraction fills it); ``lang`` is ``und`` (WARC has no language
    header).
    """
    import gzip

    import ray.data

    ds = ray.data.read_binary_files(path)

    def to_corpus(t: pa.Table) -> pa.Table:
        urls, tss, htmls = [], [], []
        for buf in t["bytes"].to_pylist():
            # gzip magic only — read_binary_files already auto-decompresses
            # *.gz by extension, so bytes may arrive pre-decompressed;
            # multi-member streams (per-record gzip) decompress fully
            if buf[:2] == b"\x1f\x8b":
                buf = gzip.decompress(buf)
            for url, ts, html in parse_warc_records(buf):
                urls.append(url)
                tss.append(ts)
                htmls.append(html)
        html_arr = pa.array(htmls, pa.binary())
        nrows = len(urls)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": html_arr,
            "text": pa.array([""] * nrows, pa.string()),
            "lang": pa.array(["und"] * nrows, pa.string()),
            "html_size": pc.binary_length(html_arr).cast(pa.int64()),
        })

    return ds.map_batches(to_corpus, batch_format="pyarrow")


def corpus_from_table(table: pa.Table):
    import ray.data
    return ray.data.from_arrow(table)
