"""Deterministic synthetic Common-Crawl-style corpus.

Builds the north-rule input table ``(url:string, warc_ts:timestamp[us],
html:binary, text:string, lang:string)`` (BASELINE.json input_hint) from
the driver's ``documents`` table — one web page per document row, fully
deterministic in ``doc_id`` (per-row seeded RNG, so any subset of rows
generates identically regardless of partitioning or order).

Page construction mirrors FIXTURES.md §1: repeated header/footer site
chrome per page, an ``<h1>`` title block, multi-column body paragraphs,
and (for most docs) a trailing references section in one of the
reference's three splittable styles — numbered delimiters
(``references.rb:80-153``), hanging-indent margins (``:66-71``), or
line-spacing gaps (``:73-78``) — plus docs with no references at all.
~1% of docs are 20× oversized to exercise skew handling. The ``text``
column is the naive full text INCLUDING boilerplate — the pipeline must
beat it by stripping header/footer zones.

Generation itself runs as a Ray ``map_batches`` stage over the
``documents`` parquet (see :func:`corpus_batch`); ``ensure_corpus``
materializes and caches the corpus parquet per scale factor.
"""

from __future__ import annotations

import os
import random

import pyarrow as pa

_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

_SURNAMES = [
    "Smith", "Johnson", "Garcia", "Miller", "Davis", "Martinez", "Lopez",
    "Wilson", "Anderson", "Taylor", "Thomas", "Moore", "Jackson", "Harris",
    "Thompson", "Sanchez", "Clark", "Lewis", "Robinson", "Walker", "Young",
    "King", "Wright", "Scott", "Torres", "Nguyen", "Hill", "Adams", "Baker",
    "Nelson", "Campbell", "Mitchell", "Roberts", "Turner", "Phillips",
    "Parker", "Evans", "Edwards", "Collins", "Stewart", "Morris", "Murphy",
    "Cook", "Rogers", "Morgan", "Peterson", "Cooper", "Reed", "Bailey",
    "Bell", "Kelly", "Howard", "Ward", "Cox", "Richardson", "Watson",
    "Brooks", "Wood", "Bennett", "Gray", "Hughes", "Price", "Myers",
    "Long", "Ross", "Foster", "Powell", "Jenkins", "Perry", "Russell",
    "Schmidt", "Fischer", "Weber", "Meyer", "Wagner", "Zhang", "Wang",
    "Chen", "Liu", "Tanaka", "Suzuki", "Singh", "Kumar", "Sharma",
    "Ivanov", "Silva", "Santos", "Rossi", "Dubois", "Hansen", "Jensen",
    "Nielsen", "Andersson", "Virtanen", "Novak", "Nagy", "Yilmaz",
]

_JOURNALS = [
    "Journal of Synthetic Data Processing", "Annals of Stream Computing",
    "Transactions on Columnar Systems", "Distributed Query Letters",
    "Review of Batch Analytics", "Archive of Vectorized Methods",
    "Proceedings of the Shuffle Symposium", "Parallel Pipeline Quarterly",
]

_TITLE_FILLER = [
    "analysis", "of", "scalable", "methods", "for", "adaptive", "systems",
    "on", "modern", "hardware", "with", "applications", "to", "large",
    "corpora", "and", "streaming", "workloads",
]


def _make_reference(rng: random.Random) -> str:
    """One citation string: authors, title, journal, volume, pages, year."""
    n_auth = rng.randint(1, 3)
    authors = ", ".join(
        f"{rng.choice(_SURNAMES)} {chr(65 + rng.randrange(26))}." for _ in range(n_auth)
    )
    n_tw = rng.randint(5, 9)
    tw = [rng.choice(_TITLE_FILLER) for _ in range(n_tw)]
    title = " ".join([tw[0].capitalize()] + tw[1:])
    journal = rng.choice(_JOURNALS)
    vol = rng.randint(2, 48)
    p0 = rng.randint(10, 830)
    p1 = p0 + rng.randint(3, 40)
    year = rng.randint(1970, 2024)
    return f"{authors} {title}. {journal} {vol}, pp. {p0}-{p1} ({year})."


def _paragraphs(words: list[str], target_words: int, rng: random.Random) -> list[str]:
    """Cycle the document's words into paragraphs totalling ~target_words."""
    if not words:
        words = ["empty"]
    paras = []
    i = 0
    remaining = target_words
    while remaining > 0:
        n = min(remaining, rng.randint(35, 75))
        chunk = [words[(i + k) % len(words)] for k in range(n)]
        paras.append(" ".join(chunk) + ".")
        i += n
        remaining -= n
    return paras


def synth_page(doc_id: int, text: str, lang: str, source: str) -> dict:
    """Deterministically build one corpus row from one document row."""
    rng = random.Random(doc_id * 1_000_003 + 42)
    words = text.split()

    # title: leading words of the doc, Title Case
    n_title = rng.randint(4, 8)
    title_words = [w.capitalize() for w in (words[:n_title] or ["untitled"])]
    title = " ".join(title_words)

    n_cols = rng.choice([1, 2, 2, 3])
    style = rng.choice(["delim", "delim", "dotted", "margin", "spacing", "none"])
    oversized = (doc_id % 101) == 100
    target = rng.randint(350, 1400) * (20 if oversized else 1)
    paras = _paragraphs(words, target, rng)

    parts = [
        "<html><head><title>%s</title>" % title,
        '<meta charset="utf-8"><style>body{margin:0}</style></head>',
        '<body data-columns="%d">' % n_cols,
        "<header>%s.example.org digital library archive vol %d</header>"
        % (source, 1 + doc_id % 40),
        "<footer>copyright example press all rights reserved issn %04d-%04d</footer>"
        % (1000 + doc_id % 9000, 1000 + (doc_id * 7) % 9000),
    ]
    if rng.random() > 0.08:
        parts.append("<h1>%s</h1>" % title)
    for p in paras:
        parts.append("<p>%s</p>" % p)

    refs: list[str] = []
    if style != "none":
        refs = [_make_reference(rng) for _ in range(rng.randint(5, 9))]
        parts.append('<section class="references"><h2>References</h2>')
        if style == "delim":
            body = " ".join("[%d] %s" % (i + 1, r) for i, r in enumerate(refs))
            parts.append("<p>%s</p>" % body)
        elif style == "dotted":
            body = " ".join("%d. %s" % (i + 1, r) for i, r in enumerate(refs))
            parts.append("<p>%s</p>" % body)
        elif style == "margin":
            for r in refs:
                parts.append('<p class="hang">%s</p>' % r)
        else:  # spacing
            for r in refs:
                parts.append('<p class="tight">%s</p>' % r)
        parts.append("</section>")
    parts.append("</body></html>")

    html = "".join(parts)
    naive_text = " ".join(
        [title] + paras + refs
        + ["%s.example.org digital library archive" % source,
           "copyright example press all rights reserved"]
    )
    return {
        "url": "https://%s.example.org/doc/%08d" % (source, doc_id),
        "warc_ts": _EPOCH_US + doc_id * 7_000_000,
        "html": html.encode("utf-8"),
        "text": naive_text,
        "lang": lang,
    }


def corpus_batch(batch: pa.Table, repeat: int = 1) -> pa.Table:
    """Ray ``map_batches`` stage: documents rows → corpus rows.

    ``repeat`` fans each document out into ``repeat`` distinct pages
    (distinct seeds/urls) — the bench-scale knob from FIXTURES.md §1."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    sources = batch.column("source").to_pylist()
    rows = [synth_page(d * repeat + j, t, l, s)
            for d, t, l, s in zip(doc_ids, texts, langs, sources)
            for j in range(repeat)]
    return pa.Table.from_pydict(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
            # size metadata column (Common-Crawl index practice): lets
            # the adaptive skew router route with a parquet pushdown
            # predicate instead of loading html bytes to measure them
            "html_size": pa.array([len(r["html"]) for r in rows], pa.int64()),
        }
    )


def corpus_table_local(sf_dir: str, limit: int | None = None,
                       repeat: int = 1) -> pa.Table:
    """Ray-free corpus generation (tests / goldens): first ``limit`` docs."""
    import pyarrow.parquet as pq

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text", "lang", "source"])
    if limit is not None:
        docs = docs.slice(0, limit)
    return corpus_batch(docs, repeat=repeat)


def ensure_corpus(sf_dir: str, cache_root: str = "/tmp/pdfx_corpus",
                  repeat: int = 1) -> str:
    """Materialize (once) and return the corpus parquet directory for an
    sf dir. Generation is a Ray Data pipeline: read documents → map_batches
    → write_parquet; cached under a per-sf directory with a _SUCCESS marker
    (atomic rename so concurrent callers see either nothing or all of it).
    """
    import ray.data

    # cache key = basename + a fingerprint of the SOURCE table (abs
    # path, size, mtime): basename alone would serve /data/b/sf0.001 a
    # corpus generated from /data/a/sf0.001, or stale pages after the
    # documents parquet is regenerated in place — silently, under
    # benchmarks and tests
    import hashlib
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    fp = hashlib.md5(("%s|%d|%d" % (os.path.abspath(src), st.st_size,
                                    st.st_mtime_ns)).encode()).hexdigest()[:10]
    key = "%s-v2-%s" % (os.path.basename(os.path.normpath(sf_dir)), fp)
    if repeat != 1:
        key = "%s-x%d" % (key, repeat)
    out_dir = os.path.join(cache_root, key)
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir

    tmp_dir = out_dir + ".tmp.%d" % os.getpid()
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang", "source"],
    )
    ds.map_batches(corpus_batch, batch_format="pyarrow",
                   fn_kwargs=dict(repeat=repeat)).write_parquet(tmp_dir)
    with open(os.path.join(tmp_dir, "_SUCCESS"), "w") as f:
        f.write("ok")
    try:
        os.rename(tmp_dir, out_dir)
    except OSError:
        # lost the race — another process finished first; use theirs
        import shutil
        shutil.rmtree(tmp_dir, ignore_errors=True)
    return out_dir
