"""Registrable-domain extraction + per-domain page caps.

Web-curation pipelines cap how many pages any single site may
contribute (RefinedWeb caps URLs per domain; Gopher reports domain
composition; C4 derivatives drop the head of the domain distribution)
because a handful of mega-hosts (blogspot mirrors, e-commerce
catalogues, link farms) otherwise dominate the token budget. The unit
is the REGISTRABLE domain — "foo.blogspot.co.uk" groups under
"blogspot.co.uk"'s registrant, not "co.uk" — which the Public Suffix
List defines. A full PSL snapshot is ~10k rules and version-churns;
this module uses the standard offline approximation: registrable =
last two labels, or last three when the last two are a well-known
second-level public suffix ("co.uk", "com.au", ...). The suffix set
covers the high-traffic ccTLD conventions; unknown two-label suffixes
degrade to grouping slightly COARSER (more aggressive capping), never
finer, which is the safe direction for a cap.

Scale shape (the part that matters at 10^12 rows): domain extraction
is stateless per-row string work; the cap decision shuffles only
``(domain-hash shard, domain, id, rank-key)`` — never page content —
through ONE groupby, exactly like :mod:`urls`' dedup; and the filter
applies the verdict either as a broadcast ``pc.is_in`` drop list
(bounded) or a distributed ``left_anti`` join (unbounded), the same
two-tier pattern every removal op in this package uses.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

# Well-known second-level public suffixes (offline PSL approximation;
# public knowledge — the ccTLD registry conventions). When the last
# TWO labels of a host are in this set, the registrable domain keeps
# THREE labels ("foo.co.uk"), else two ("foo.com").
SECOND_LEVEL_SUFFIXES = frozenset({
    # United Kingdom
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "sch.uk", "me.uk",
    "ltd.uk", "plc.uk", "nhs.uk",
    # Australia / New Zealand
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au", "asn.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    # Japan
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp",
    "lg.jp", "gr.jp",
    # Korea, China, Taiwan, Hong Kong, Singapore, India
    "co.kr", "or.kr", "ne.kr", "go.kr", "ac.kr", "re.kr",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.tw", "org.tw", "net.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.hk", "org.hk", "net.hk", "edu.hk", "gov.hk",
    "com.sg", "org.sg", "net.sg", "edu.sg", "gov.sg",
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in",
    "ac.in", "edu.in", "res.in", "gov.in", "nic.in",
    # Brazil, Mexico, Argentina
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.mx", "org.mx", "net.mx", "edu.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar", "gov.ar",
    # South Africa, Israel, Turkey, Russia-conventions
    "co.za", "org.za", "net.za", "gov.za", "ac.za", "web.za",
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "bel.tr",
    "com.ru", "net.ru", "org.ru", "pp.ru", "msk.ru", "spb.ru",
    # Ukraine, Poland, misc Europe
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    "co.at", "or.at", "ac.at", "gv.at",
    "com.es", "org.es", "nom.es", "gob.es", "edu.es",
    "com.pt", "org.pt", "edu.pt", "gov.pt",
    "com.gr", "org.gr", "net.gr", "edu.gr", "gov.gr",
    # Indonesia, Malaysia, Philippines, Thailand, Vietnam
    "co.id", "or.id", "ac.id", "go.id", "web.id", "sch.id",
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    "co.th", "or.th", "ac.th", "go.th", "in.th",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    # Egypt, Nigeria, Kenya, Saudi, UAE
    "com.eg", "org.eg", "net.eg", "edu.eg", "gov.eg",
    "com.ng", "org.ng", "net.ng", "edu.ng", "gov.ng",
    "co.ke", "or.ke", "ne.ke", "ac.ke", "go.ke",
    "com.sa", "org.sa", "net.sa", "edu.sa", "gov.sa",
    "ac.ae", "co.ae", "org.ae", "net.ae", "gov.ae",
    # generic conventions a few registries reuse
    "co.com", "us.com", "eu.com", "uk.com", "gb.com", "de.com",
})


def registrable_domain(url: str) -> str:
    """The registrable domain of ``url`` (or of a bare host), lowercase.

    Total and idempotent: IP literals (v4/v6) and single-label hosts
    come back whole; anything without a parseable host comes back
    ``""``. ``registrable_domain(registrable_domain(u))`` is a fixed
    point because a bare domain parses as a host (no scheme → treated
    as a host, not a path).
    """
    u = (url or "").strip()
    if not u:
        return ""
    from urllib.parse import urlsplit
    try:
        parts = urlsplit(u if "//" in u or ":" in u.split("/", 1)[0]
                         else "//" + u)
        host = (parts.hostname or "").lower()
    except ValueError:
        return ""
    if not host:
        # "example.com/path" with no scheme lands in .path; retry as
        # authority-only
        try:
            host = (urlsplit("//" + u).hostname or "").lower()
        except ValueError:
            return ""
    if not host:
        return ""
    # IP literals: never split into labels (.hostname strips the
    # brackets off IPv6 — re-add them so the result reparses as a host)
    if ":" in host:
        return "[%s]" % host.strip().strip("[]")
    # Normalize per LABEL: strip the exotic whitespace urlsplit
    # preserves inside a netloc (\x0c, stray spaces) and drop labels
    # that are empty ("a..b" → "a.b", ". 0" → "0"). Stripping whole-
    # host only is NOT a fixed point (removing dots can expose new
    # edge whitespace and vice versa); per-label it is, because a
    # second pass re-splits into already-clean labels.
    labels = [lb for lb in (x.strip() for x in host.split(".")) if lb]
    if not labels:
        return ""
    host = ".".join(labels)
    if _is_ipv4(host):
        return host
    if len(labels) <= 2:
        return host
    tail2 = ".".join(labels[-2:])
    if tail2 in SECOND_LEVEL_SUFFIXES:
        return ".".join(labels[-3:])
    return tail2


def _is_ipv4(host: str) -> bool:
    parts = host.split(".")
    if len(parts) != 4:
        return False
    return all(p.isdigit() and len(p) <= 3 and int(p) <= 255
               for p in parts)


def domain_batch(t: pa.Table, url_col: str = "url",
                 out_col: str = "domain") -> pa.Table:
    """Append the registrable domain of ``url_col`` as ``out_col``.
    Per-row Python is inherent (urlsplit has no Arrow kernel); the
    work is a handful of string ops per row."""
    doms = [registrable_domain(u) for u in t[url_col].to_pylist()]
    return t.append_column(out_col, pa.array(doms, pa.string()))


def domain_counts(docs, url_col: str = "url"):
    """(domain, n_pages) — the domain composition histogram curation
    reports lead with. Partial-aggregated per batch before the
    groupby, so the shuffle moves one row per (block, distinct
    domain), not per page."""
    import ray.data

    def partial(t: pa.Table) -> pa.Table:
        doms = [registrable_domain(u) for u in t[url_col].to_pylist()]
        s = pd.Series(doms, dtype="object").value_counts()
        return pa.table({"domain": pa.array(s.index, pa.string()),
                         "n_pages": pa.array(s.to_numpy(), pa.int64())})

    return (docs.select_columns([url_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("domain")
            .sum("n_pages")
            .map_batches(lambda t: t.rename_columns(["domain", "n_pages"]),
                         batch_format="pyarrow"))


def domain_cap(docs, cap: int, id_col: str = "doc_id",
               url_col: str = "url", quality_col: str | None = None,
               shard_mask: int | None = None):
    """Per-domain cap verdicts: (id, domain, keep) with ``keep`` true
    for at most ``cap`` rows per registrable domain — the best-quality
    rows when ``quality_col`` is given (ties and the no-quality case
    break by ascending id, so the verdict is deterministic). Rows
    without a parseable host (domain == "") are never capped: they
    share no site, so they all keep.

    ONE shuffle, moving (shard, domain, id[, quality]) — never text.
    Domains are grouped into cluster-derived hash shards (one
    map_groups task per shard, not per domain — a per-domain group
    would be one Python call per site at web scale); min-rank-per-key
    inside a shard is exact because a shard holds every row of its
    domains."""
    import zlib

    from pdfextract_ray.stages.dedup import _mask

    if cap < 1:
        raise ValueError("cap must be >= 1, got %d" % cap)
    mask = _mask(shard_mask)
    cols = [id_col, url_col] + ([quality_col] if quality_col else [])

    def shard_batch(t: pa.Table) -> pa.Table:
        doms = [registrable_domain(u) for u in t[url_col].to_pylist()]
        arrs = {
            "shard": pa.array([zlib.crc32(d.encode("utf-8")) & mask
                               for d in doms], pa.int64()),
            "domain": pa.array(doms, pa.string()),
            id_col: t[id_col],
        }
        if quality_col:
            arrs["q"] = t[quality_col]
        return pa.table(arrs)

    def verdict_shard(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                id_col: pd.Series(dtype="int64"),
                "domain": pd.Series(dtype="object"),
                "keep": pd.Series(dtype="bool")})
        if "q" in df.columns:
            df = df.sort_values(["domain", "q", id_col],
                                ascending=[True, False, True],
                                kind="mergesort")
        else:
            df = df.sort_values(["domain", id_col], kind="mergesort")
        rank = df.groupby("domain", sort=False).cumcount()
        keep = (rank < cap) | (df["domain"] == "")
        out = df[[id_col, "domain"]].copy()
        out["keep"] = keep.to_numpy()
        return out

    return (docs.select_columns(cols)
            .map_batches(shard_batch, batch_format="pyarrow")
            .groupby("shard")
            .map_groups(verdict_shard, batch_format="pandas"))


def domain_cap_filter_by_url(docs, cap: int, url_col: str = "url",
                             max_broadcast: int = 2_000_000,
                             shard_mask: int | None = None):
    """URL-value-keyed per-domain cap for tables WITHOUT an integer id
    (e.g. the raw page corpus before extraction): keep at most ``cap``
    DISTINCT urls per registrable domain — the lexicographically
    smallest, so the verdict is deterministic — and drop the rest.

    Contract boundaries (same as :func:`urls.url_dedup_filter`): rows
    sharing a byte-identical url are ONE distinct url — they survive
    or drop together (downstream exact content dedup owns exact
    recrawls); url-less / unparseable rows (domain == "") are never
    capped. The drop list is the over-cap MINORITY of distinct urls:
    broadcast ``pc.is_in`` below ``max_broadcast``, distributed
    ``left_anti`` join above."""
    import zlib

    from pdfextract_ray.stages.dedup import _mask

    if cap < 1:
        raise ValueError("cap must be >= 1, got %d" % cap)
    mask = _mask(shard_mask)

    def shard_batch(t: pa.Table) -> pa.Table:
        urls = t[url_col].to_pylist()
        doms = [registrable_domain(u) for u in urls]
        return pa.table({
            "shard": pa.array([zlib.crc32(d.encode("utf-8")) & mask
                               for d in doms], pa.int64()),
            "domain": pa.array(doms, pa.string()),
            url_col: pa.array([u if u is not None else "" for u in urls],
                              pa.string()),
        })

    def drops_shard(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["domain"] != ""]
        if len(df) == 0:
            return pd.DataFrame({url_col: pd.Series(dtype="object")})
        # cap counts DISTINCT urls (byte-identical rows are one page
        # for quota purposes); rank ascending for determinism
        d = df[["domain", url_col]].drop_duplicates() \
            .sort_values(["domain", url_col], kind="mergesort")
        rank = d.groupby("domain", sort=False).cumcount()
        return d.loc[(rank >= cap).to_numpy(), [url_col]]

    from pdfextract_ray.pipelines.relational import anti_filter

    drops = docs.select_columns([url_col]) \
        .map_batches(shard_batch, batch_format="pyarrow") \
        .groupby("shard").map_groups(drops_shard, batch_format="pandas")
    return anti_filter(docs, drops, url_col, max_broadcast=max_broadcast)


def domain_cap_filter(docs, cap: int, id_col: str = "doc_id",
                      url_col: str = "url",
                      quality_col: str | None = None,
                      max_broadcast: int = 2_000_000,
                      shard_mask: int | None = None):
    """Remove over-cap rows from ``docs``. The drop list (ids of
    keep=false rows — the over-cap MINORITY) broadcasts as a
    ``pc.is_in`` filter when it fits ``max_broadcast`` ids; beyond
    that the payload pays a distributed ``left_anti`` join keyed on
    ``id_col``. Either way the corpus text crosses no shuffle when
    the drop rate is sane."""
    import pyarrow.compute as pc

    from pdfextract_ray.pipelines.relational import anti_filter

    verdicts = domain_cap(docs, cap, id_col=id_col, url_col=url_col,
                          quality_col=quality_col,
                          shard_mask=shard_mask)

    def drops_batch(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(t["keep"])).select([id_col])

    drops = verdicts.map_batches(drops_batch, batch_format="pyarrow")
    return anti_filter(docs, drops, id_col, max_broadcast=max_broadcast)
