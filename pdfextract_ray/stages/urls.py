"""URL canonicalization + URL-keyed dedup.

Web-corpus curation pipelines (CCNet, C4, RefinedWeb) dedup by URL
before touching content: two crawls of ``HTTP://WWW.Example.com:80/a/``
and ``http://example.com/a?utm_source=x`` are the same page, and a
URL-key dedup costs one tiny-string shuffle instead of a content
hash over the text. The canonical form here is the usual curation
union of RFC 3986 §6 syntax-based normalization (case of scheme/host,
default ports, empty path → "/") with the lossy-but-standard corpus
conventions (drop fragments, drop tracking params, sort the query,
strip "www.", strip a trailing slash) — each convention is a keyword
so a stricter pipeline can turn it off.

All pure stdlib ``urllib.parse``; malformed URLs canonicalize to
themselves (stripped) rather than raising — a single bad row must
never kill a shard.
"""

from __future__ import annotations

import pyarrow as pa
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

# the usual click-tracking / session params dropped by corpus dedup
# (any utm_* plus these exact names)
TRACKING_PARAMS = frozenset({
    "gclid", "fbclid", "msclkid", "dclid", "igshid", "mc_cid", "mc_eid",
    "ref", "ref_src", "ref_url", "spm", "yclid", "wbraid", "gbraid",
    "_ga", "_gl", "s_kwcid", "mkt_tok",
})

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}


def canonical_url(url: str, *, strip_www: bool = True,
                  strip_tracking: bool = True,
                  sort_query: bool = True,
                  strip_fragment: bool = True,
                  strip_trailing_slash: bool = True) -> str:
    """Canonical dedup key for ``url``. Deterministic, idempotent
    (canonical_url(canonical_url(u)) == canonical_url(u) — tested),
    and total: anything unsplittable comes back ``.strip()``-ed."""
    u = (url or "").strip()
    if not u:
        return ""
    try:
        parts = urlsplit(u)
        if not parts.scheme and not parts.netloc:
            return u  # not an absolute URL; leave relative keys alone
        scheme = parts.scheme.lower()
        host = (parts.hostname or "").lower()
        # .port is LAZY and raises on garbage authorities urlsplit
        # itself accepted (e.g. "http://::") — hence the wide try
        port = parts.port
    except ValueError:
        return u
    if not parts.netloc and parts.path.startswith("//"):
        # urlunsplit cannot round-trip this shape: with an empty
        # authority it emits scheme:'//...'path, whose leading slashes
        # reparse as a HOST ("http:////0" → "http://0") — a known
        # stdlib round-trip hazard; bail to identity for garbage input
        return u
    if strip_www and host.startswith("www.") and host.count(".") >= 2:
        host = host[4:]
    if ":" in host:  # urlsplit strips the brackets off IPv6 literals
        host = "[%s]" % host
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
        netloc = "%s:%d" % (host, port)
    if parts.username:  # userinfo is load-bearing when present
        cred = parts.username + \
            (":" + parts.password if parts.password else "")
        netloc = cred + "@" + netloc
    path = parts.path
    if netloc and not path:
        path = "/"   # RFC 3986 §6.2.3: empty path ≡ "/" only WITH an
        # authority; "mailto:" must not become "mailto:/"
    if strip_trailing_slash:
        # fixpoint: trailing slashes and trailing whitespace interleave
        # ("/a/ /" → "/a/ " → "/a/" → "/a"), and a non-fixpoint result
        # breaks idempotence because the next pass's outer .strip()
        # sees the dangling whitespace first (hypothesis-found)
        prev = None
        while path != prev:
            prev = path
            if len(path) > 1 and path.endswith("/"):
                path = path.rstrip("/") or "/"
            if path != "/":
                path = path.rstrip()
        if netloc and not path:
            path = "/"
    query = parts.query
    if query and (strip_tracking or sort_query):
        pairs = parse_qsl(query, keep_blank_values=True)
        if strip_tracking:
            pairs = [(k, v) for k, v in pairs
                     if k.lower() not in TRACKING_PARAMS
                     and not k.lower().startswith("utm_")]
        if sort_query:
            pairs.sort()
        query = urlencode(pairs)
    fragment = "" if strip_fragment else parts.fragment
    return urlunsplit((scheme, netloc, path, query, fragment))


def canonicalize_batch(t: pa.Table, url_col: str = "url",
                       out_col: str = "canonical_url",
                       **kw) -> pa.Table:
    """Append the canonical form of ``url_col`` as ``out_col``.
    Per-row Python is inherent here — urlsplit has no Arrow kernel —
    but the work is a few string ops per row, far below the md5 the
    exact-dedup stage already pays."""
    canon = [canonical_url(u, **kw) for u in t[url_col].to_pylist()]
    return t.append_column(out_col, pa.array(canon, pa.string()))


def url_dedup(docs, id_col: str = "doc_id", url_col: str = "url",
              shard_mask: int | None = None, **kw):
    """URL-keyed exact dedup: (id, url, canonical_url, keep) with
    ``keep`` = min id per canonical key. ONE shuffle, moving only
    (canonical_url, id, shard) — never document content — which is why
    this runs FIRST in a curation pipeline: every duplicate it removes
    is text the content-dedup stages never have to hash or shuffle.

    Groups are hash SHARDS (crc32(canonical_url) & cluster-derived
    mask), not raw URLs: a shard group holds every occurrence of its
    keys, so min-per-key is exact, while the group count stays bounded
    (per-unique-URL groups would mean one Python map_groups call per
    page on a web-scale corpus)."""
    import functools
    import zlib

    import pandas as pd

    from pdfextract_ray.stages.dedup import _mask

    mask = _mask(shard_mask)

    def canon_shard(t: pa.Table) -> pa.Table:
        t = canonicalize_batch(t, url_col=url_col, **kw)
        shards = [zlib.crc32(c.encode("utf-8")) & mask
                  for c in t["canonical_url"].to_pylist()]
        return t.append_column("shard", pa.array(shards, pa.int64()))

    def keep_shard(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                id_col: pd.Series(dtype="int64"),
                url_col: pd.Series(dtype="object"),
                "canonical_url": pd.Series(dtype="object"),
                "keep": pd.Series(dtype="bool")})
        keep = df[id_col] == df.groupby("canonical_url")[id_col] \
            .transform("min")
        # an empty canonical key means the row HAS no URL (null/""/
        # unparseable) — those rows share nothing and must never dedup
        # against each other
        keep = keep | (df["canonical_url"] == "")
        out = df[[id_col, url_col, "canonical_url"]].copy()
        out["keep"] = keep.to_numpy()
        return out

    return docs.select_columns([id_col, url_col]) \
        .map_batches(canon_shard, batch_format="pyarrow") \
        .groupby("shard").map_groups(keep_shard, batch_format="pandas")


def url_drop_list(docs, url_col: str = "url",
                  shard_mask: int | None = None, **kw):
    """(url,) rows of the DROP minority: every url that is NOT the
    lexicographic-min original url of its canonical key. Only
    (canonical_url, url, shard) strings+ints move — never page
    content — and the output is as small as the URL-duplication
    rate."""
    import functools
    import zlib

    import pandas as pd

    from pdfextract_ray.stages.dedup import _mask

    mask = _mask(shard_mask)

    def canon_shard(t: pa.Table) -> pa.Table:
        urls = t[url_col].to_pylist()
        canon = [canonical_url(u, **kw) for u in urls]
        return pa.table({
            url_col: pa.array(urls, pa.string()),
            "canonical_url": pa.array(canon, pa.string()),
            "shard": pa.array([zlib.crc32(c.encode("utf-8")) & mask
                               for c in canon], pa.int64()),
        })

    def drops_shard(df: pd.DataFrame) -> pd.DataFrame:
        # url-less rows (empty canonical key: null/""/unparseable) are
        # never duplicates of each other — excluded BEFORE the min so
        # a None url can neither crash the string min nor reach the
        # caller's sorted() drop list
        df = df[df["canonical_url"] != ""]
        if len(df) == 0:
            return pd.DataFrame({url_col: pd.Series(dtype="object")})
        keep = df[url_col] == df.groupby("canonical_url")[url_col] \
            .transform("min")
        return df.loc[~keep.to_numpy(), [url_col]]

    return docs.select_columns([url_col]) \
        .map_batches(canon_shard, batch_format="pyarrow") \
        .groupby("shard").map_groups(drops_shard, batch_format="pandas")


def url_dedup_filter(docs, url_col: str = "url",
                     max_broadcast: int = 2_000_000,
                     shard_mask: int | None = None, **kw):
    """Remove same-canonical-URL VARIANT rows from ``docs`` (keeping
    the lexicographic-min original url per key) WITHOUT ever shuffling
    the row payload when the duplicate rate is sane: the drop list —
    the duplicate minority — is broadcast as a ``pc.is_in`` filter
    when it fits ``max_broadcast`` urls, and only beyond that does the
    payload pay a distributed ``left_anti`` join. The pre-extraction
    stage of a curation pipeline: every page this removes is HTML the
    extractor never parses.

    Contract boundaries (both by design): rows whose RAW urls are
    byte-identical (exact recrawls) all share the min url, so a
    url-value filter cannot drop one of N — downstream exact content
    dedup removes those (in ``curate`` it always runs); and url-less
    rows (null/""/unparseable → empty canonical key) are never treated
    as duplicates of each other. Use :func:`url_dedup` (id-keyed) when
    identical-URL rows must also collapse."""
    from pdfextract_ray.pipelines.relational import anti_filter

    drops = url_drop_list(docs, url_col=url_col,
                          shard_mask=shard_mask, **kw)
    return anti_filter(docs, drops, url_col, max_broadcast=max_broadcast)
