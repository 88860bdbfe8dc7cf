"""CLI multiplexer — the ``bin/pdf-extract`` analogue.

Commands (bin/pdf-extract:29-50 has extract / extract-bib / mark /
settings; mapped to the Ray engine):

  python -m pdfextract_ray extract <corpus> --out DIR [--xml] [--exploded]
  python -m pdfextract_ray extract-bib <corpus> --out DIR
  python -m pdfextract_ray spans <corpus> --out DIR        # mark analogue: bbox parquet
  python -m pdfextract_ray curate <corpus> --out DIR       # dedup'd training corpus
  python -m pdfextract_ray dedup-paragraphs <table> --out DIR  # C4 span removal
  python -m pdfextract_ray settings                        # list tunables

<corpus> is a parquet file/dir of corpus-schema rows, or a directory of
raw .html files (--html-dir). Settings override via repeated
``--set key:value`` (float-coerced like the reference, pdf.rb:29-36)
or ``--config file.json`` (bin/pdf-extract:98-110).

Designed for ``ray job submit -- python -m pdfextract_ray extract ...``
on a cluster; standalone it initialises a local Ray session itself.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys


def _load_settings(args):
    from pdfextract_ray.settings import DEFAULT_SETTINGS
    overrides = {}
    if args.config:
        with open(args.config, encoding="utf-8") as f:
            overrides.update(json.load(f))
    for kv in args.set or []:
        key, _, val = kv.partition(":")
        overrides[key.strip()] = val.strip()
    return DEFAULT_SETTINGS.with_overrides(overrides)


def _has_size_column(corpus_path) -> bool:
    """True when the parquet corpus carries the html_size metadata
    column (enables one-read pushdown routing for --adaptive)."""
    try:
        import pyarrow.dataset as pads
        return "html_size" in pads.dataset(corpus_path).schema.names
    except Exception:
        return False


def _ensure_written(out: str, schema) -> None:
    """Ray's parquet sink DELETES a directory it created when the write
    turns out empty (documented trap). An empty result is a legitimate
    outcome for `filter`/`shuffle-export`, so materialize the contract:
    if the sink removed the dir, write one empty file with the result
    schema."""
    if os.path.isdir(out):
        return
    import pyarrow.parquet as pq
    os.makedirs(out, exist_ok=True)
    pq.write_table(schema.empty_table(), os.path.join(out, "empty.parquet"))


def _corpus_ds(args):
    if args.html_dir:
        from pdfextract_ray.sources.readers import read_html_files
        return read_html_files(args.corpus)
    if getattr(args, "jsonl", False):
        from pdfextract_ray.sources.readers import read_jsonl_corpus
        return read_jsonl_corpus(args.corpus)
    if getattr(args, "warc", False):
        from pdfextract_ray.sources.readers import read_warc_corpus
        return read_warc_corpus(args.corpus)
    from pdfextract_ray.pipelines.extract_pipeline import read_corpus
    return read_corpus(args.corpus)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="pdfextract_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("corpus")
        sp.add_argument("--out", required=True)
        sp.add_argument("--set", action="append", metavar="KEY:VALUE")
        sp.add_argument("--config")
        sp.add_argument("--jsonl", action="store_true",
                        help="corpus is a JSONL web-text dump (one JSON "
                             "object per line with url/html/text fields)")
        sp.add_argument("--warc", action="store_true",
                        help="corpus is WARC file(s) (.warc / .warc.gz); "
                             "HTML response records become documents")
        sp.add_argument("--html-dir", action="store_true",
                        help="corpus is a directory of raw .html files")
        sp.add_argument("--num-cpus", type=int, default=None)
        sp.add_argument("--shards", type=int, default=4)
        sp.add_argument("--parallel-shards", type=int, default=1)
        sp.add_argument("--no-resume", action="store_true")
        sp.add_argument("--exploded", action="store_true",
                        help="page-exploded variant for mega-documents")
        sp.add_argument("--page-threshold", type=int, default=64,
                        help="with --exploded: docs with at most this many "
                             "pages extract fused in-stage; larger docs go "
                             "page-parallel (default 64)")
        sp.add_argument("--adaptive", action="store_true",
                        help="size-routed hybrid: small docs fused, "
                             "oversized docs page-exploded. Parquet corpora "
                             "with an html_size column route via pushdown "
                             "(each row read once); without one the corpus "
                             "is scanned twice (once per branch)")
        sp.add_argument("--adaptive-threshold", type=int, default=None,
                        help="html byte size above which a doc routes to "
                             "the exploded path (default: derived p99 of "
                             "the corpus html_size distribution on the "
                             "pushdown path, 64KiB on the two-scan path)")

    sp_e = sub.add_parser("extract", help="extraction → parquet (+ optional xml)")
    common(sp_e)
    sp_e.add_argument("--xml", action="store_true")

    sp_b = sub.add_parser("extract-bib", help="extraction → resolved refs → bibtex")
    common(sp_b)

    sp_s = sub.add_parser("spans", help="bbox spans parquet (mark analogue)")
    common(sp_s)
    sp_s.add_argument("--svg", action="store_true",
                      help="also render the PdfView 'mark' SVG overlay column")

    sp_x = sub.add_parser(
        "xml", help="full XmlView render of requested spatial types")
    common(sp_x)
    sp_x.add_argument("--spatials", default="regions",
                      help="comma list of titles,regions,zones,sections,"
                           "references (xml_view.rb per-type rendering)")
    sp_x.add_argument("--precision", type=int, default=2,
                      help="numeric attribute rounding (:round)")
    sp_x.add_argument("--no-lines", action="store_true",
                      help="inline text content instead of <line> children")
    sp_x.add_argument("--outline", action="store_true",
                      help="attributes only, no text content")

    sp_c = sub.add_parser(
        "curate", help="training-data curation: extract → quality filter → "
                       "exact dedup → near-dup clustering → representatives")
    common(sp_c)
    sp_c.add_argument("--extracted", action="store_true",
                      help="corpus is already-extracted parquet (url, title, "
                           "text, lang, n_refs, n_tokens columns); skips the "
                           "extraction stage and reads only those columns")
    sp_c.add_argument("--exact-only", action="store_true",
                      help="exact text dedup only (skip MinHash-LSH "
                           "near-dup clustering)")
    sp_c.add_argument("--url-dedup", action="store_true",
                      help="first drop same-canonical-URL duplicate "
                           "pages (case/port/fragment/tracking-param "
                           "normalization), before extraction — pages "
                           "removed here are never parsed")
    sp_c.add_argument("--domain-cap", type=int, default=None,
                      metavar="N",
                      help="keep at most N distinct urls per "
                           "registrable domain (lexicographically "
                           "smallest; applied before extraction, after "
                           "--url-dedup when both are given)")
    sp_c.add_argument("--checkpoint-dir", default=None, metavar="DIR",
                      help="stage-level resume: persist each stage's "
                           "output (prep = extract/url-dedup/domain-"
                           "cap; curate = dedup+representatives) with "
                           "an atomic manifest; a rerun with the same "
                           "DIR skips completed stages (a DIR recorded "
                           "for different arguments is refused)")

    sub.add_parser("settings", help="list tunables")

    sp_p = sub.add_parser(
        "dedup-paragraphs",
        help="C4-style span removal over a (id, text) parquet table: "
             "delete every 16-word window except its global first "
             "occurrence; writes (doc_id, clean_text, n_paras, "
             "n_removed) parquet")
    sp_p.add_argument("table", help="parquet file/dir with an integer "
                                    "id column and a text column")
    sp_p.add_argument("--out", required=True)
    sp_p.add_argument("--id-col", default="doc_id",
                      help="integer document id column (default doc_id)")
    sp_p.add_argument("--text-col", default="text")
    sp_p.add_argument("--num-cpus", type=int, default=None)

    sp_d = sub.add_parser(
        "decontaminate",
        help="flag corpus documents overlapping an EXTERNAL eval suite "
             "(word-3-gram overlap; the production form of the "
             "registered `decontaminate` query)")
    sp_d.add_argument("table", help="corpus parquet file/dir with "
                                    "integer id + text columns")
    sp_d.add_argument("--eval", required=True, dest="eval_table",
                      help="benchmark-suite parquet file/dir (text "
                           "column; benchmark-sized input)")
    sp_d.add_argument("--out", required=True)
    sp_d.add_argument("--id-col", default="doc_id")
    sp_d.add_argument("--text-col", default="text")
    sp_d.add_argument("--num-cpus", type=int, default=None)

    sp_sp = sub.add_parser(
        "dedup-spans",
        help="substring-level exact dedup over a (id, text) parquet "
             "table: SLIDING 16-word windows (stride 1 — catches "
             "duplicated runs that straddle the non-overlapping "
             "dedup-paragraphs unit), delete every duplicated span "
             "except its global first occurrence; writes (doc_id, "
             "clean_text, n_words, n_removed) parquet")
    sp_sp.add_argument("table", help="parquet file/dir with an integer "
                                     "id column and a text column")
    sp_sp.add_argument("--out", required=True)
    sp_sp.add_argument("--id-col", default="doc_id",
                       help="integer document id column (default doc_id)")
    sp_sp.add_argument("--text-col", default="text")
    sp_sp.add_argument("--window", type=int, default=16,
                       help="words per sliding window (default 16)")
    sp_sp.add_argument("--stride", type=int, default=1,
                       help="window stride; >1 is a 1/stride-recall "
                            "sampled scan (default 1 = exact)")
    sp_sp.add_argument("--stats-only", action="store_true",
                       help="write per-doc duplicate-span stats instead "
                            "of rebuilding cleaned text")
    sp_sp.add_argument("--num-cpus", type=int, default=None)

    sp_i = sub.add_parser(
        "dedup-incremental",
        help="flag a NEW delivery's documents that already exist in an "
             "OLD corpus via a broadcast Bloom filter (one streaming "
             "pass per side, no corpus re-shuffle); writes (doc_id, "
             "md5, bloom_positive, dup_vs_old, first_in_new, keep)")
    sp_i.add_argument("table", help="NEW delivery parquet file/dir with "
                                    "an integer id column and a text column")
    sp_i.add_argument("--against", required=True,
                      help="EXISTING corpus parquet file/dir (same "
                           "columns), or a hash snapshot written with "
                           "--write-hashes (pass --hashes)")
    sp_i.add_argument("--hashes", action="store_true",
                      help="--against is a precomputed (doc_id, md5, "
                           "h64) hash snapshot, not raw documents")
    sp_i.add_argument("--write-hashes",
                      help="also write the OLD side's hash snapshot "
                           "here for reuse by the next delivery")
    sp_i.add_argument("--fp-rate", type=float, default=0.01,
                      help="Bloom false-positive target (default 0.01)")
    sp_i.add_argument("--no-verify", action="store_true",
                      help="skip the exact verify pass: dup_vs_old "
                           "becomes the raw Bloom verdict (over-flags "
                           "at the FP rate, never under-flags)")
    sp_i.add_argument("--out", required=True)
    sp_i.add_argument("--id-col", default="doc_id",
                      help="integer document id column (default doc_id)")
    sp_i.add_argument("--text-col", default="text")
    sp_i.add_argument("--num-cpus", type=int, default=None)

    sp_ni = sub.add_parser(
        "neardup-incremental",
        help="flag a NEW delivery's documents that are NEAR-duplicates "
             "(MinHash-estimated Jaccard >= --threshold) of an OLD "
             "corpus; banded LSH join of the delivery against the "
             "corpus (or a reusable signature snapshot) — new-vs-new "
             "pairs are out of scope (run dedup_minhash within the "
             "delivery for those); writes (doc_id, near_dup_of_old, "
             "matched_old_id, est_jaccard, keep)")
    sp_ni.add_argument("table", help="NEW delivery parquet file/dir with "
                                     "an integer id column and a text "
                                     "column")
    sp_ni.add_argument("--against", required=True,
                       help="EXISTING corpus parquet file/dir (same "
                            "columns), or a signature snapshot written "
                            "with --write-sigs (pass --sigs)")
    sp_ni.add_argument("--sigs", action="store_true",
                       help="--against is a precomputed (doc_id, sig) "
                            "MinHash snapshot, not raw documents")
    sp_ni.add_argument("--write-sigs",
                       help="bootstrap: convert a raw-document "
                            "--against corpus into its (doc_id, sig) "
                            "snapshot here (incompatible with --sigs, "
                            "which is already a snapshot)")
    sp_ni.add_argument("--write-new-sigs",
                       help="also write the DELIVERY's own signature "
                            "snapshot here; append/point it into the "
                            "snapshot dir so the NEXT delivery dedups "
                            "against old+this one without re-shingling "
                            "either. NOTE: by default the snapshot "
                            "covers EVERY delivery row, including docs "
                            "this run flags keep=false (they were "
                            "seen, so future deliveries still dedup "
                            "against them); --kept-sigs-only writes "
                            "only the keep=true rows instead")
    sp_ni.add_argument("--kept-sigs-only", action="store_true",
                       help="with --write-new-sigs: filter the written "
                            "snapshot to docs this run KEPT, so the "
                            "snapshot mirrors what actually entered "
                            "the corpus (rejected docs are not dedup "
                            "anchors for future deliveries)")
    sp_ni.add_argument("--threshold", type=float, default=0.5,
                       help="estimated-Jaccard cut (default 0.5)")
    sp_ni.add_argument("--out", required=True)
    sp_ni.add_argument("--id-col", default="doc_id")
    sp_ni.add_argument("--text-col", default="text")
    sp_ni.add_argument("--num-cpus", type=int, default=None)

    sp_u = sub.add_parser(
        "dedup-urls",
        help="URL-keyed exact dedup over a (id, url) parquet table: "
             "canonicalize (case/port/fragment/tracking-param/www/"
             "trailing-slash normalization) and keep the min id per "
             "canonical URL; writes (id, url, canonical_url, keep)")
    sp_u.add_argument("table", help="parquet file/dir with an integer "
                                    "id column and a url column")
    sp_u.add_argument("--out", required=True)
    sp_u.add_argument("--id-col", default="doc_id",
                      help="integer document id column (default doc_id)")
    sp_u.add_argument("--url-col", default="url")
    sp_u.add_argument("--keep-tracking", action="store_true",
                      help="do not strip utm_*/click-id query params")
    sp_u.add_argument("--keep-www", action="store_true",
                      help="do not strip a leading www. host label")
    sp_u.add_argument("--num-cpus", type=int, default=None)

    sp_dc = sub.add_parser(
        "domain-cap",
        help="cap pages per registrable domain (RefinedWeb-style): "
             "keep at most --cap rows per domain — the best by "
             "--quality-col when given, else the lowest ids — and "
             "write the surviving rows (all columns)")
    sp_dc.add_argument("table", help="parquet file/dir with an integer "
                                     "id column and a url column")
    sp_dc.add_argument("--out", required=True)
    sp_dc.add_argument("--cap", type=int, required=True,
                       help="max pages kept per registrable domain")
    sp_dc.add_argument("--id-col", default="doc_id")
    sp_dc.add_argument("--url-col", default="url")
    sp_dc.add_argument("--quality-col", default=None,
                       help="numeric column; higher is kept first "
                            "(default: keep lowest ids)")
    sp_dc.add_argument("--verdicts-only", action="store_true",
                       help="write (id, domain, keep) verdicts instead "
                            "of the filtered corpus")
    sp_dc.add_argument("--num-cpus", type=int, default=None)

    sp_ds = sub.add_parser(
        "domain-stats",
        help="pages per registrable domain, descending — the corpus "
             "composition histogram (writes (domain, n_pages))")
    sp_ds.add_argument("table", help="parquet file/dir with a url column")
    sp_ds.add_argument("--url-col", default="url")
    sp_ds.add_argument("--out", required=True)
    sp_ds.add_argument("--num-cpus", type=int, default=None)

    sp_ss = sub.add_parser(
        "semantic-sample",
        help="SemDeDup-style cluster-balanced subsetting: embed every "
             "doc (hashing-trick), coarse k-means cells (~sqrt N), "
             "keep at most CAP docs per semantic cell (farthest-from-"
             "centroid first — dense boilerplate blobs downsample, "
             "sparse regions survive); writes (doc_id, cell, dist, "
             "keep) verdicts, or the filtered corpus with --apply")
    sp_ss.add_argument("table", help="parquet file/dir with an integer "
                                     "id column and a text column")
    sp_ss.add_argument("--cap-per-cell", type=int, required=True)
    sp_ss.add_argument("--dedup-cos", type=float, default=None,
                       metavar="T",
                       help="SemDeDup within-cell prune: greedily drop "
                            "docs within cosine T of an already-kept "
                            "doc before the cap (e.g. 0.9; the "
                            "near-identical-boilerplate collapse)")
    sp_ss.add_argument("--cells", type=int, default=None,
                       help="semantic cell count (default ~sqrt of the "
                            "corpus row count)")
    sp_ss.add_argument("--apply", action="store_true",
                       help="write the filtered corpus (all columns) "
                            "instead of the verdict table")
    sp_ss.add_argument("--out", required=True)
    sp_ss.add_argument("--id-col", default="doc_id")
    sp_ss.add_argument("--text-col", default="text")
    sp_ss.add_argument("--num-cpus", type=int, default=None)

    sp_ll = sub.add_parser(
        "lang-lines",
        help="CCNet-style per-LINE language segmentation: per doc, "
             "line counts per language (pinned marker heuristic) + "
             "majority language and its line fraction; with "
             "--keep-majority, instead rewrite each doc's text to "
             "only its majority-language lines (idempotent)")
    sp_ll.add_argument("table", help="parquet file/dir with an integer "
                                     "id column and a text column")
    sp_ll.add_argument("--out", required=True)
    sp_ll.add_argument("--keep-majority", action="store_true",
                       help="write the cleaned corpus (all columns, "
                            "minority-language lines removed) instead "
                            "of the per-doc report")
    sp_ll.add_argument("--id-col", default="doc_id")
    sp_ll.add_argument("--text-col", default="text")
    sp_ll.add_argument("--num-cpus", type=int, default=None)

    sp_tq = sub.add_parser(
        "train-quality",
        help="train the from-scratch logistic-regression quality "
             "classifier on a BOUNDED labeled sample (deterministic "
             "seeded SGD; features standardized by train-set mean/std) "
             "and write the model JSON. Default labels distill the "
             "Gopher rule cascade (teacher->student); pass --labels "
             "for a (doc_id, label) parquet of human/teacher marks")
    sp_tq.add_argument("table", help="parquet file/dir with an integer "
                                     "id column and a text column")
    sp_tq.add_argument("--out", required=True, help="model JSON path")
    sp_tq.add_argument("--sample", type=int, default=4096,
                       help="train on rows with id < SAMPLE (pushdown-"
                            "filtered read; dense ids — the bounded "
                            "driver-side train set)")
    sp_tq.add_argument("--labels", default=None,
                       help="optional (doc_id, label) parquet; default "
                            "distills gopher keep verdicts")
    sp_tq.add_argument("--label-col", default="label")
    sp_tq.add_argument("--epochs", type=int, default=40)
    sp_tq.add_argument("--seed", type=int, default=20260820)
    sp_tq.add_argument("--id-col", default="doc_id")
    sp_tq.add_argument("--text-col", default="text")
    sp_tq.add_argument("--num-cpus", type=int, default=None)

    sp_sq = sub.add_parser(
        "score-quality",
        help="score every document with a trained quality model "
             "(actor pool, model loaded once per actor); writes "
             "(doc_id, quality_score, pred_keep)")
    sp_sq.add_argument("table")
    sp_sq.add_argument("--model", required=True, help="model JSON from "
                                                      "train-quality")
    sp_sq.add_argument("--out", required=True)
    sp_sq.add_argument("--threshold", type=float, default=0.5)
    sp_sq.add_argument("--id-col", default="doc_id")
    sp_sq.add_argument("--text-col", default="text")
    sp_sq.add_argument("--num-cpus", type=int, default=None)

    sp_em = sub.add_parser(
        "embed",
        help="deterministic hashing-trick 3-gram text embeddings: "
             "writes (vec_id, embedding list<float>) matching the "
             "embeddings-table contract, so knn/IVF/LSH-near-dup run "
             "directly on the output (no model, no RNG — a pure "
             "function of the text bytes)")
    sp_em.add_argument("table", help="parquet file/dir with an integer "
                                     "id column and a text column")
    sp_em.add_argument("--out", required=True)
    sp_em.add_argument("--dim", type=int, default=64)
    sp_em.add_argument("--id-col", default="doc_id")
    sp_em.add_argument("--text-col", default="text")
    sp_em.add_argument("--num-cpus", type=int, default=None)

    sp_sw = sub.add_parser(
        "soft-dedup",
        help="SoftDeDup sampling weights instead of removal: every "
             "document gets weight = 1/n_copies over its byte-exact "
             "text duplicate set (unique docs weight 1.0), so "
             "weighted sampling sees each distinct text with equal "
             "total mass; NULL-text docs are excluded from grouping "
             "and always get weight 1.0 (absent content is not "
             "duplicate content); writes (doc_id, n_copies, weight)")
    sp_sw.add_argument("table", help="parquet file/dir with an integer "
                                     "id column and a text column")
    sp_sw.add_argument("--out", required=True)
    sp_sw.add_argument("--id-col", default="doc_id")
    sp_sw.add_argument("--text-col", default="text")
    sp_sw.add_argument("--num-cpus", type=int, default=None)

    sp_dl = sub.add_parser(
        "dedup-lines",
        help="cross-document LINE dedup (CCNet boilerplate removal): "
             "remove every line whose whitespace/case-normalized form "
             "occurs >= --min-count times across the corpus (keeps "
             "the global first copy; --drop-all removes every copy); "
             "catches nav/footer lines too short for the 16-word "
             "window ops; writes (doc_id, clean_text, n_lines, "
             "n_removed)")
    sp_dl.add_argument("table", help="parquet file/dir with an integer "
                                     "id column and a text column")
    sp_dl.add_argument("--out", required=True)
    sp_dl.add_argument("--min-count", type=int, default=2,
                       help="occurrences across the corpus at which a "
                            "line counts as duplicate (default 2)")
    sp_dl.add_argument("--drop-all", action="store_true",
                       help="remove ALL copies of a duplicate line "
                            "(default keeps the global first)")
    sp_dl.add_argument("--id-col", default="doc_id")
    sp_dl.add_argument("--text-col", default="text")
    sp_dl.add_argument("--num-cpus", type=int, default=None)

    sp_bl = sub.add_parser(
        "blocklist-filter",
        help="drop pages containing any phrase from a user-supplied "
             "blocklist file (C4 bad-words gate; word-boundary, "
             "case-insensitive, one vectorized RE2 alternation scan); "
             "--annotate writes (id, n_blocked_terms, keep) instead")
    sp_bl.add_argument("table", help="parquet file/dir with an integer "
                                     "id column and a text column")
    sp_bl.add_argument("--words", required=True,
                       help="newline-delimited phrase file (the list "
                            "is a policy input; none is bundled)")
    sp_bl.add_argument("--out", required=True)
    sp_bl.add_argument("--annotate", action="store_true",
                       help="write verdicts instead of the filtered "
                            "corpus")
    sp_bl.add_argument("--id-col", default="doc_id")
    sp_bl.add_argument("--text-col", default="text")
    sp_bl.add_argument("--num-cpus", type=int, default=None)

    sp_go = sub.add_parser(
        "gopher-filter",
        help="Gopher quality rules (word count 50-100k, mean word "
             "length 3-10, symbol ratio, bullet/ellipsis line "
             "fractions, alphabetic-word fraction, stop-word "
             "presence): keep only passing pages, or --annotate to "
             "write per-rule verdicts instead (compose with the "
             "doc_repetition operator for the full Gopher gate)")
    sp_go.add_argument("table", help="parquet file/dir with an integer "
                                     "id column and a text column")
    sp_go.add_argument("--out", required=True)
    sp_go.add_argument("--annotate", action="store_true",
                       help="write (id, rule columns, keep) verdicts "
                            "instead of the filtered corpus")
    sp_go.add_argument("--id-col", default="doc_id")
    sp_go.add_argument("--text-col", default="text")
    sp_go.add_argument("--num-cpus", type=int, default=None)

    sp_cl = sub.add_parser(
        "clean-lines",
        help="C4-style line cleaning: keep only lines ending in "
             "terminal punctuation with >= --min-words words and no "
             "'javascript' marker; appends n_lines/n_lines_kept/"
             "n_sentences and a page keep verdict (>= --min-sentences "
             "sentences, no 'lorem ipsum'/'{'); --drop-pages filters "
             "to kept pages instead of annotating")
    sp_cl.add_argument("table", help="parquet file/dir with an integer "
                                     "id column and a text column")
    sp_cl.add_argument("--out", required=True)
    sp_cl.add_argument("--min-words", type=int, default=3,
                       help="minimum words per kept line (default 3)")
    sp_cl.add_argument("--min-sentences", type=int, default=5,
                       help="minimum sentences per kept page "
                            "(default 5)")
    sp_cl.add_argument("--drop-pages", action="store_true",
                       help="drop pages failing the page heuristics "
                            "instead of carrying a keep column")
    sp_cl.add_argument("--id-col", default="doc_id")
    sp_cl.add_argument("--text-col", default="text")
    sp_cl.add_argument("--num-cpus", type=int, default=None)

    sp_pii = sub.add_parser(
        "redact-pii",
        help="mask emails / phone numbers / IPv4 addresses in the text "
             "column with |||EMAIL_ADDRESS|||-style sentinel tokens "
             "(Dolma-style PII scrub); appends n_redactions. "
             "--stats-only writes per-doc counts instead of rewriting")
    sp_pii.add_argument("table", help="parquet file/dir with an integer "
                                      "id column and a text column")
    sp_pii.add_argument("--out", required=True)
    sp_pii.add_argument("--stats-only", action="store_true",
                        help="write (doc_id, n_emails, n_phones, n_ips) "
                             "instead of the redacted corpus")
    sp_pii.add_argument("--id-col", default="doc_id")
    sp_pii.add_argument("--text-col", default="text")
    sp_pii.add_argument("--num-cpus", type=int, default=None)

    sp_ct = sub.add_parser(
        "clean-text",
        help="pre-tokenizer text hygiene over a (id, text) parquet "
             "table: Unicode NFC/NFKC, control/zero-width/bidi-isolate "
             "stripping, optional whitespace collapse; rewrites the "
             "text column and appends n_removed_chars")
    sp_ct.add_argument("table", help="parquet file/dir with an integer "
                                     "id column and a text column")
    sp_ct.add_argument("--out", required=True)
    sp_ct.add_argument("--id-col", default="doc_id")
    sp_ct.add_argument("--text-col", default="text")
    sp_ct.add_argument("--nfkc", action="store_true",
                       help="NFKC instead of NFC (also folds "
                            "compatibility forms: ligatures, width "
                            "variants, superscripts)")
    sp_ct.add_argument("--collapse-whitespace", action="store_true",
                       help="runs of whitespace become one space "
                            "(erases line structure)")
    sp_ct.add_argument("--num-cpus", type=int, default=None)

    sp_m = sub.add_parser(
        "sample-mixture",
        help="sample a corpus to a target source mixture with maximum "
             "retention (deterministic per id); writes the input "
             "columns + keep")
    sp_m.add_argument("table", help="parquet file/dir with integer id "
                                    "and source columns")
    sp_m.add_argument("--target", action="append", required=True,
                      metavar="SOURCE=WEIGHT",
                      help="e.g. --target web=3 --target books=1 "
                           "(weights are normalized; sources without "
                           "a target are excluded)")
    sp_m.add_argument("--out", required=True)
    sp_m.add_argument("--id-col", default="doc_id")
    sp_m.add_argument("--source-col", default="source")
    sp_m.add_argument("--num-cpus", type=int, default=None)

    sp_pk = sub.add_parser(
        "pack",
        help="greedy-pack documents into ~budget-token training "
             "groups; writes (doc_id, n_tokens, pack_id, pack_tokens, "
             "oversized)")
    sp_pk.add_argument("table", help="parquet file/dir with integer id "
                                     "and token-count columns")
    sp_pk.add_argument("--budget", type=int, required=True,
                       help="tokens per pack")
    sp_pk.add_argument("--out", required=True)
    sp_pk.add_argument("--id-col", default="doc_id")
    sp_pk.add_argument("--tokens-col", default="n_tokens")
    sp_pk.add_argument("--bpe", action="store_true",
                       help="ignore --tokens-col and budget in REAL "
                            "tokenizer tokens: count each doc's text "
                            "with the frozen byte-level BPE table "
                            "(data/bpe_merges.txt) before packing")
    sp_pk.add_argument("--text-col", default="text",
                       help="text column for --bpe counting")
    sp_pk.add_argument("--num-cpus", type=int, default=None)

    sp_tk = sub.add_parser(
        "token-stats",
        help="per-document token counts: n_ws_tokens (ASCII-whitespace "
             "words, the package tokenizer contract) and n_bpe_tokens "
             "(frozen from-scratch byte-level BPE, "
             "data/bpe_merges.txt); writes (doc_id, n_ws_tokens, "
             "n_bpe_tokens)")
    sp_tk.add_argument("table", help="parquet file/dir with an integer "
                                     "id column and a text column")
    sp_tk.add_argument("--out", required=True)
    sp_tk.add_argument("--id-col", default="doc_id")
    sp_tk.add_argument("--text-col", default="text")
    sp_tk.add_argument("--merges", default=None,
                       help="alternate merges table (default: the "
                            "frozen bundled one)")
    sp_tk.add_argument("--num-cpus", type=int, default=None)

    sp_sh = sub.add_parser(
        "shuffle-export",
        help="deterministic pseudo-random scatter of a corpus into a "
             "fixed number of training shards (out/shard=K/...); "
             "stateless per-row hash of (id, seed) — no all-to-all; "
             "carries order_key for reproducible within-shard order")
    sp_sh.add_argument("table", help="parquet file/dir with an integer "
                                     "id column")
    sp_sh.add_argument("--out", required=True)
    sp_sh.add_argument("--shards", type=int, required=True,
                       help="number of output shard directories")
    sp_sh.add_argument("--seed", type=int, default=0,
                       help="shuffle seed (same seed → same shard "
                            "membership and order keys)")
    sp_sh.add_argument("--id-col", default="doc_id")
    sp_sh.add_argument("--columns", default=None,
                       help="comma-separated projection (default: all "
                            "columns)")
    sp_sh.add_argument("--num-cpus", type=int, default=None)

    sp_f = sub.add_parser(
        "filter",
        help="predicate + projection pushdown export: rows matching "
             "--where, only --columns, filtered in the parquet scanner "
             "(row-group stats prune whole groups)")
    sp_f.add_argument("table", help="parquet file/dir")
    sp_f.add_argument("--where", required=True,
                      help="e.g. \"lang == 'en' and n_tokens >= 100\" "
                           "or \"url not matches '/tag/|/search'\"; "
                           "ops: == != < <= > >=, in (..), is [not] "
                           "null, [not] matches 'regex' (RE2), "
                           "and/or/not, parentheses")
    sp_f.add_argument("--columns", default=None,
                      help="comma-separated projection (default: all "
                           "columns)")
    sp_f.add_argument("--out", required=True)
    sp_f.add_argument("--num-cpus", type=int, default=None)

    sp_q = sub.add_parser(
        "query", help="run a registered corpus query by name over a "
                      "table directory (see `query --list`)")
    sp_q.add_argument("name", nargs="?",
                      help="query name from the registry")
    sp_q.add_argument("--list", action="store_true", dest="list_queries",
                      help="list available query names and exit")
    sp_q.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                      help="directory holding the parquet tables "
                           "(documents, embeddings, orders, ...)")
    sp_q.add_argument("--out", help="write the result as parquet here "
                                    "(default: print rows as JSON lines)")
    sp_q.add_argument("--limit", type=int, default=20,
                      help="max rows to print without --out (default 20)")
    sp_q.add_argument("--num-cpus", type=int, default=None)

    args = p.parse_args(argv)

    if args.cmd == "curate" and args.domain_cap is not None \
            and args.domain_cap < 1:
        p.error("--domain-cap must be >= 1")

    if args.cmd == "settings":
        from pdfextract_ray.settings import DEFAULT_SETTINGS
        for f in dataclasses.fields(DEFAULT_SETTINGS):
            print("%-22s %s" % (f.name, f.default))
        return 0

    if args.cmd == "train-quality":
        import numpy as np
        import pyarrow.dataset as pads
        import pyarrow.parquet as _pq
        schema = pads.dataset(args.table).schema
        for col in (args.id_col, args.text_col):
            if col not in schema.names:
                p.error("column %r not in %s (has: %s)"
                        % (col, args.table, ", ".join(schema.names)))
        from pdfextract_ray.stages.classifier import (features_row,
                                                      gopher_labels,
                                                      save_model,
                                                      train_logreg)
        tbl = _pq.read_table(
            args.table, columns=[args.id_col, args.text_col],
            filters=[(args.id_col, "<", args.sample)]).sort_by(args.id_col)
        texts = tbl[args.text_col].to_pylist()
        if not texts:
            p.error("empty training sample (ids < %d)" % args.sample)
        if args.labels:
            lab_t = _pq.read_table(
                args.labels, columns=[args.id_col, args.label_col],
                filters=[(args.id_col, "<", args.sample)])
            lut = dict(zip(lab_t[args.id_col].to_pylist(),
                           lab_t[args.label_col].to_pylist()))
            keep_rows = [i for i, d in
                         enumerate(tbl[args.id_col].to_pylist())
                         if d in lut]
            if not keep_rows:
                p.error("--labels has no ids overlapping the sample")
            y = np.asarray([float(lut[tbl[args.id_col][i].as_py()])
                            for i in keep_rows])
            texts = [texts[i] for i in keep_rows]
        else:
            y = gopher_labels(texts)
        X = np.asarray([features_row(s) for s in texts])
        model = train_logreg(X, y, epochs=args.epochs, seed=args.seed)
        Z = (X - np.asarray(model["mean"])) / np.asarray(model["std"])
        pred = 1 / (1 + np.exp(-(Z @ np.asarray(model["weights"])
                                 + model["bias"]))) >= 0.5
        acc = float((pred == (y >= 0.5)).mean())
        save_model(model, args.out)
        print(json.dumps({"out": args.out, "ok": True, "n_train": len(y),
                          "pos_frac": round(float(y.mean()), 4),
                          "train_acc": round(acc, 4)}))
        return 0

    if args.cmd == "score-quality":
        import pyarrow.dataset as pads
        schema = pads.dataset(args.table).schema
        for col in (args.id_col, args.text_col):
            if col not in schema.names:
                p.error("column %r not in %s (has: %s)"
                        % (col, args.table, ", ".join(schema.names)))
        from pdfextract_ray.stages.classifier import (load_model,
                                                      score_quality)
        try:
            model = load_model(args.model)
        except (OSError, ValueError, KeyError) as e:
            p.error("bad --model %s: %s" % (args.model, e))
        import ray
        owns = not ray.is_initialized()
        if owns:
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        try:
            import ray.data
            ds = ray.data.read_parquet(
                args.table, columns=[args.id_col, args.text_col])
            score_quality(ds, model, id_col=args.id_col,
                          text_col=args.text_col,
                          threshold=args.threshold) \
                .write_parquet(args.out)
            print(json.dumps({"out": args.out, "ok": True}))
            return 0
        finally:
            if owns:
                ray.shutdown()

    if args.cmd == "semantic-sample":
        import pyarrow.dataset as pads
        import pyarrow.parquet as _pq
        schema = pads.dataset(args.table).schema
        for col in (args.id_col, args.text_col):
            if col not in schema.names:
                p.error("column %r not in %s (has: %s)"
                        % (col, args.table, ", ".join(schema.names)))
        if args.cap_per_cell < 1:
            p.error("--cap-per-cell must be >= 1")
        from pdfextract_ray.stages.ivf import derive_nlist
        from pdfextract_ray.stages.semsample import (
            semantic_sample_filter, semantic_sample_verdicts)
        import ray
        owns = not ray.is_initialized()
        if owns:
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        try:
            import ray.data
            n_cells = args.cells
            if n_cells is None and os.path.isfile(args.table):
                # metadata-only count: avoid the Dataset count pass
                n_cells = derive_nlist(
                    _pq.ParquetFile(args.table).metadata.num_rows)
            if args.apply:
                ds = ray.data.read_parquet(args.table)
                out_ds = semantic_sample_filter(
                    ds, args.cap_per_cell, n_cells=n_cells,
                    id_col=args.id_col, text_col=args.text_col,
                    dedup_cos=args.dedup_cos)
            else:
                ds = ray.data.read_parquet(
                    args.table, columns=[args.id_col, args.text_col])
                out_ds = semantic_sample_verdicts(
                    ds, args.cap_per_cell, n_cells=n_cells,
                    id_col=args.id_col, text_col=args.text_col,
                    dedup_cos=args.dedup_cos)
            out_ds.write_parquet(args.out)
            if args.apply:
                _ensure_written(args.out, schema)
            print(json.dumps({"out": args.out, "ok": True}))
            return 0
        finally:
            if owns:
                ray.shutdown()

    if args.cmd == "lang-lines":
        import pyarrow.dataset as pads
        schema = pads.dataset(args.table).schema
        for col in (args.id_col, args.text_col):
            if col not in schema.names:
                p.error("column %r not in %s (has: %s)"
                        % (col, args.table, ", ".join(schema.names)))
        from pdfextract_ray.stages.langlines import (keep_majority_lines,
                                                     lang_segments)
        import ray
        owns = not ray.is_initialized()
        if owns:
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        try:
            import ray.data
            if args.keep_majority:
                ds = ray.data.read_parquet(args.table)
                out_ds = keep_majority_lines(ds, id_col=args.id_col,
                                             text_col=args.text_col)
            else:
                ds = ray.data.read_parquet(
                    args.table, columns=[args.id_col, args.text_col])
                out_ds = lang_segments(ds, id_col=args.id_col,
                                       text_col=args.text_col)
            out_ds.write_parquet(args.out)
            print(json.dumps({"out": args.out, "ok": True}))
            return 0
        finally:
            if owns:
                ray.shutdown()

    if args.cmd in ("sample-mixture", "pack", "token-stats", "embed"):
        import pyarrow.dataset as pads
        schema = pads.dataset(args.table).schema
        if args.cmd == "sample-mixture":
            other = args.source_col
        elif args.cmd in ("token-stats", "embed") or (args.cmd == "pack"
                                                      and args.bpe):
            other = args.text_col
        else:
            other = args.tokens_col
        for col in (args.id_col, other):
            if col not in schema.names:
                p.error("column %r not in %s (has: %s)"
                        % (col, args.table, ", ".join(schema.names)))
        targets = {}
        if args.cmd == "sample-mixture":
            for spec in args.target:
                if "=" not in spec:
                    p.error("--target needs SOURCE=WEIGHT, got %r" % spec)
                k, v = spec.split("=", 1)
                try:
                    targets[k] = float(v)
                except ValueError:
                    p.error("--target weight %r is not a number" % v)
        import ray
        owns = not ray.is_initialized()
        if owns:
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        try:
            import ray.data
            if args.cmd == "sample-mixture":
                # the documented output is "the input columns + keep",
                # so no column pruning here (pack's contract is its
                # own 5-column table — it stays pruned)
                ds = ray.data.read_parquet(args.table)
                from pdfextract_ray.stages.assemble import mixture_sample
                out_ds = mixture_sample(ds, targets, id_col=args.id_col,
                                        source_col=args.source_col)
            elif args.cmd == "embed":
                from pdfextract_ray.stages.embed import embed_docs
                ds = ray.data.read_parquet(
                    args.table, columns=[args.id_col, args.text_col])
                out_ds = embed_docs(ds, dim=args.dim, id_col=args.id_col,
                                    text_col=args.text_col)
            elif args.cmd == "token-stats":
                from pdfextract_ray.stages.bpe import token_counts_bpe
                from pdfextract_ray.stages.textstats import ascii_words
                ds = ray.data.read_parquet(
                    args.table, columns=[args.id_col, args.text_col])

                def _ws(t, id_col=args.id_col, text_col=args.text_col):
                    import pyarrow as _pa
                    ns = [len(ascii_words(s)) if s else 0
                          for s in t[text_col].to_pylist()]
                    return t.select([id_col, text_col]).append_column(
                        "n_ws_tokens", _pa.array(ns, _pa.int64()))

                with_ws = ds.map_batches(_ws, batch_format="pyarrow")
                out_ds = token_counts_bpe(
                    with_ws, id_col=args.id_col, text_col=args.text_col,
                    merges_path=args.merges, out_col="n_bpe_tokens",
                    keep_cols=["n_ws_tokens"])
            elif args.cmd == "pack" and args.bpe:
                from pdfextract_ray.stages.assemble import pack_documents
                from pdfextract_ray.stages.bpe import token_counts_bpe
                ds = ray.data.read_parquet(
                    args.table, columns=[args.id_col, args.text_col])
                counts = token_counts_bpe(ds, id_col=args.id_col,
                                          text_col=args.text_col,
                                          out_col="n_tokens")
                out_ds = pack_documents(counts, args.budget,
                                        id_col=args.id_col,
                                        tokens_col="n_tokens")
            else:
                from pdfextract_ray.stages.assemble import pack_documents
                ds = ray.data.read_parquet(
                    args.table, columns=[args.id_col, other])
                out_ds = pack_documents(ds, args.budget,
                                        id_col=args.id_col,
                                        tokens_col=args.tokens_col)
            out_ds.write_parquet(args.out)
            print(json.dumps({"out": args.out, "ok": True}))
            return 0
        finally:
            if owns:
                ray.shutdown()

    if args.cmd == "shuffle-export":
        import pyarrow as pa
        import pyarrow.dataset as pads
        schema = pads.dataset(args.table).schema
        if args.id_col not in schema.names:
            p.error("column %r not in %s (has: %s)"
                    % (args.id_col, args.table, ", ".join(schema.names)))
        if not pa.types.is_integer(schema.field(args.id_col).type):
            p.error("--id-col %r must be an integer column (got %s)"
                    % (args.id_col, schema.field(args.id_col).type))
        if args.shards < 1:
            p.error("--shards must be >= 1")
        clash = [c for c in ("shard", "order_key") if c in schema.names]
        if clash and not args.columns:
            p.error("input already has column(s) %s (a previous "
                    "shuffle-export?); re-sharding would duplicate "
                    "them — pass --columns without these"
                    % ", ".join(clash))
        cols = None
        if args.columns:
            cols = [c.strip() for c in args.columns.split(",") if c.strip()]
            bad = [c for c in cols if c not in schema.names]
            if bad:
                p.error("--columns %s not in %s" % (", ".join(bad),
                                                    args.table))
            clash = [c for c in ("shard", "order_key") if c in cols]
            if clash:
                p.error("--columns must not include the assignment "
                        "column(s) %s" % ", ".join(clash))
            if args.id_col not in cols:
                cols = [args.id_col] + cols
        import ray
        owns = not ray.is_initialized()
        if owns:
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        try:
            import ray.data
            from pdfextract_ray.stages.shard import shuffle_export
            ds = ray.data.read_parquet(args.table, columns=cols)
            shuffle_export(ds, args.out, args.shards, seed=args.seed,
                           id_col=args.id_col)
            import pyarrow as pa
            base = schema if cols is None else pa.schema(
                [schema.field(c) for c in cols])
            # the empty fallback must match a hive read of a non-empty
            # export: data columns + order_key + the shard partition key
            _ensure_written(args.out, base.append(
                pa.field("order_key", pa.int64())).append(
                pa.field("shard", pa.int32())))
            print(json.dumps({"out": args.out, "shards": args.shards,
                              "seed": args.seed, "ok": True}))
            return 0
        finally:
            if owns:
                ray.shutdown()

    if args.cmd == "filter":
        from pdfextract_ray.stages.filters import PredicateError, filter_read
        cols = None
        if args.columns:
            cols = [c.strip() for c in args.columns.split(",") if c.strip()]
        import ray
        owns = not ray.is_initialized()
        if owns:
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        try:
            try:
                ds = filter_read(args.table, args.where, columns=cols)
            except PredicateError as e:
                p.error(str(e))
            ds.write_parquet(args.out)
            import pyarrow as pa
            import pyarrow.dataset as pads
            schema = pads.dataset(args.table).schema
            _ensure_written(args.out, schema if cols is None else pa.schema(
                [schema.field(c) for c in cols]))
            print(json.dumps({"out": args.out, "ok": True}))
            return 0
        finally:
            if owns:
                ray.shutdown()

    if args.cmd == "dedup-urls":
        import pyarrow.dataset as pads
        schema = pads.dataset(args.table).schema
        for col in (args.id_col, args.url_col):
            if col not in schema.names:
                p.error("column %r not in %s (has: %s)"
                        % (col, args.table, ", ".join(schema.names)))
        import pyarrow as pa
        if not pa.types.is_integer(schema.field(args.id_col).type):
            p.error("--id-col %r must be an integer column (got %s)"
                    % (args.id_col, schema.field(args.id_col).type))
        import ray
        owns = not ray.is_initialized()
        if owns:
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        try:
            import ray.data
            from pdfextract_ray.stages.urls import url_dedup
            ds = ray.data.read_parquet(
                args.table, columns=[args.id_col, args.url_col])
            out_ds = url_dedup(ds, id_col=args.id_col,
                               url_col=args.url_col,
                               strip_tracking=not args.keep_tracking,
                               strip_www=not args.keep_www)
            out_ds.write_parquet(args.out)
            print(json.dumps({"out": args.out, "ok": True}))
            return 0
        finally:
            if owns:
                ray.shutdown()

    if args.cmd in ("domain-cap", "domain-stats"):
        import pyarrow.dataset as pads
        schema = pads.dataset(args.table).schema
        need = [args.url_col] if args.cmd == "domain-stats" else \
            [args.id_col, args.url_col] + \
            ([args.quality_col] if args.quality_col else [])
        for col in need:
            if col not in schema.names:
                p.error("column %r not in %s (has: %s)"
                        % (col, args.table, ", ".join(schema.names)))
        import pyarrow as pa
        if args.cmd == "domain-cap":
            if not pa.types.is_integer(schema.field(args.id_col).type):
                p.error("--id-col %r must be an integer column (got %s)"
                        % (args.id_col, schema.field(args.id_col).type))
            if args.cap < 1:
                p.error("--cap must be >= 1")
        import ray
        owns = not ray.is_initialized()
        if owns:
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        try:
            import ray.data
            from pdfextract_ray.stages import domains
            if args.cmd == "domain-stats":
                ds = ray.data.read_parquet(args.table,
                                           columns=[args.url_col])
                out_ds = domains.domain_counts(ds, url_col=args.url_col) \
                    .sort("n_pages", descending=True)
                out_ds.write_parquet(args.out)
                _ensure_written(args.out, pa.schema(
                    [pa.field("domain", pa.string()),
                     pa.field("n_pages", pa.int64())]))
            elif args.verdicts_only:
                ds = ray.data.read_parquet(
                    args.table, columns=[args.id_col, args.url_col] +
                    ([args.quality_col] if args.quality_col else []))
                domains.domain_cap(
                    ds, args.cap, id_col=args.id_col,
                    url_col=args.url_col,
                    quality_col=args.quality_col).write_parquet(args.out)
                _ensure_written(args.out, pa.schema(
                    [schema.field(args.id_col),
                     pa.field("domain", pa.string()),
                     pa.field("keep", pa.bool_())]))
            else:
                ds = ray.data.read_parquet(args.table)
                domains.domain_cap_filter(
                    ds, args.cap, id_col=args.id_col,
                    url_col=args.url_col,
                    quality_col=args.quality_col).write_parquet(args.out)
                _ensure_written(args.out, schema)
            print(json.dumps({"out": args.out, "ok": True}))
            return 0
        finally:
            if owns:
                ray.shutdown()

    if args.cmd in ("dedup-paragraphs", "decontaminate", "dedup-spans",
                    "dedup-incremental", "neardup-incremental",
                    "clean-text", "redact-pii", "clean-lines",
                    "gopher-filter", "blocklist-filter",
                    "dedup-lines", "soft-dedup"):
        if args.cmd == "dedup-lines" and args.min_count < 2:
            p.error("--min-count must be >= 2 (a line occurring once "
                    "is not a duplicate)")
        import pyarrow.dataset as pads
        schema = pads.dataset(args.table).schema
        for col in (args.id_col, args.text_col):
            if col not in schema.names:
                p.error("column %r not in %s (has: %s)"
                        % (col, args.table, ", ".join(schema.names)))
        import pyarrow as pa
        if not pa.types.is_integer(schema.field(args.id_col).type):
            p.error("--id-col %r must be an integer column (got %s)"
                    % (args.id_col, schema.field(args.id_col).type))
        import ray
        owns = not ray.is_initialized()
        if owns:
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        try:
            import ray.data
            ds = ray.data.read_parquet(
                args.table, columns=[args.id_col, args.text_col])
            if args.id_col != "doc_id" or args.text_col != "text":
                ds = ds.rename_columns({args.id_col: "doc_id",
                                        args.text_col: "text"})
            if args.cmd == "dedup-paragraphs":
                from pdfextract_ray.stages.dedup import \
                    remove_duplicate_paragraphs
                out_ds = remove_duplicate_paragraphs(ds)
            elif args.cmd == "clean-text":
                from pdfextract_ray.stages.clean import clean_documents
                out_ds = clean_documents(
                    ds, form="NFKC" if args.nfkc else "NFC",
                    collapse_whitespace=args.collapse_whitespace)
            elif args.cmd == "redact-pii":
                from pdfextract_ray.stages.pii import pii_stats, redact_pii
                out_ds = (pii_stats(ds) if args.stats_only
                          else redact_pii(ds))
            elif args.cmd == "clean-lines":
                from pdfextract_ray.stages.lines import clean_lines
                out_ds = clean_lines(
                    ds, min_words=args.min_words,
                    min_sentences=args.min_sentences,
                    drop_pages=args.drop_pages)
            elif args.cmd == "gopher-filter":
                from pdfextract_ray.stages.gopher import gopher_filter
                out_ds = gopher_filter(ds, annotate=args.annotate)
            elif args.cmd == "dedup-lines":
                from pdfextract_ray.stages.linededup import \
                    remove_duplicate_lines
                out_ds = remove_duplicate_lines(
                    ds, min_count=args.min_count,
                    keep_first=not args.drop_all)
            elif args.cmd == "soft-dedup":
                from pdfextract_ray.stages.assemble import \
                    soft_dedup_weights
                out_ds = soft_dedup_weights(ds)
            elif args.cmd == "blocklist-filter":
                from pdfextract_ray.stages.blocklist import \
                    blocklist_filter
                try:
                    with open(args.words, encoding="utf-8") as f:
                        phrases = [ln.strip() for ln in f
                                   if ln.strip()]
                except OSError as e:
                    p.error("cannot read --words %s: %s"
                            % (args.words, e))
                if not phrases:
                    p.error("--words file %s has no phrases"
                            % args.words)
                out_ds = blocklist_filter(ds, phrases,
                                          annotate=args.annotate)
            elif args.cmd == "dedup-spans":
                from pdfextract_ray.stages.spans import (
                    duplicate_span_stats, remove_duplicate_spans)
                fn = duplicate_span_stats if args.stats_only \
                    else remove_duplicate_spans
                out_ds = fn(ds, window=args.window, stride=args.stride)
            elif args.cmd == "dedup-incremental":
                from pdfextract_ray.stages import bloom
                if args.hashes:
                    old_hashes = ray.data.read_parquet(
                        args.against, columns=["md5", "h64"])
                    old_docs = None
                else:
                    against_schema = pads.dataset(args.against).schema
                    for col in (args.id_col, args.text_col):
                        if col not in against_schema.names:
                            p.error("column %r not in --against %s "
                                    "(has: %s)" % (col, args.against,
                                    ", ".join(against_schema.names)))
                    old_docs = ray.data.read_parquet(
                        args.against, columns=[args.id_col, args.text_col])
                    if args.id_col != "doc_id" or args.text_col != "text":
                        old_docs = old_docs.rename_columns(
                            {args.id_col: "doc_id", args.text_col: "text"})
                    old_hashes = None
                if args.write_hashes:
                    if old_hashes is None:
                        old_hashes = bloom.hash_docs(old_docs).materialize()
                        old_docs = None
                    old_hashes.write_parquet(args.write_hashes)
                out_ds = bloom.dedup_incremental(
                    ds, old_docs=old_docs, old_hashes=old_hashes,
                    fp_rate=args.fp_rate, verify=not args.no_verify)
            elif args.cmd == "neardup-incremental":
                from pdfextract_ray.stages import neardup
                if args.sigs:
                    old_sigs = ray.data.read_parquet(
                        args.against, columns=["doc_id", "sig"])
                    old_docs = None
                else:
                    against_schema = pads.dataset(args.against).schema
                    for col in (args.id_col, args.text_col):
                        if col not in against_schema.names:
                            p.error("column %r not in --against %s "
                                    "(has: %s)" % (col, args.against,
                                    ", ".join(against_schema.names)))
                    old_docs = ray.data.read_parquet(
                        args.against, columns=[args.id_col, args.text_col])
                    if args.id_col != "doc_id" or args.text_col != "text":
                        old_docs = old_docs.rename_columns(
                            {args.id_col: "doc_id", args.text_col: "text"})
                    old_sigs = None
                if args.write_sigs:
                    if args.sigs:
                        p.error("--write-sigs with --sigs would just "
                                "copy the existing snapshot; it "
                                "converts a raw-document --against")
                    old_sigs = neardup.signatures(old_docs) \
                        .materialize()
                    old_docs = None
                    old_sigs.write_parquet(args.write_sigs)
                if args.kept_sigs_only and not args.write_new_sigs:
                    p.error("--kept-sigs-only requires --write-new-sigs")
                new_sigs = None
                if args.write_new_sigs:
                    # shingle the delivery ONCE: the written snapshot
                    # also feeds this run's banding
                    new_sigs = neardup.signatures(ds).materialize()
                    if not args.kept_sigs_only:
                        new_sigs.write_parquet(args.write_new_sigs)
                out_ds = neardup.neardup_incremental(
                    new_docs=None if new_sigs is not None else ds,
                    old_docs=old_docs, old_sigs=old_sigs,
                    new_sigs=new_sigs, threshold=args.threshold)
                if args.write_new_sigs and args.kept_sigs_only:
                    # verdict-filtered snapshot: only docs that entered
                    # the corpus become dedup anchors for future runs
                    import pyarrow.compute as _pc
                    from pdfextract_ray.pipelines.relational import \
                        anti_filter
                    out_ds = out_ds.materialize()
                    drops = out_ds.map_batches(
                        lambda t: t.filter(_pc.invert(t["keep"]))
                        .select(["doc_id"]),
                        batch_format="pyarrow")
                    anti_filter(new_sigs, drops, "doc_id") \
                        .write_parquet(args.write_new_sigs)
            else:
                from pdfextract_ray.stages.dedup import decontaminate_corpus
                ev_schema = pads.dataset(args.eval_table).schema
                if "text" not in ev_schema.names:
                    p.error("--eval table %s has no text column (has: %s)"
                            % (args.eval_table, ", ".join(ev_schema.names)))
                ev = ray.data.read_parquet(args.eval_table,
                                           columns=["text"])
                out_ds = decontaminate_corpus(ds, ev)
            out_ds.write_parquet(args.out)
            print(json.dumps({"out": args.out, "ok": True}))
            return 0
        finally:
            if owns:
                ray.shutdown()

    if args.cmd == "query":
        from pdfextract_ray.pipelines.queries import build_queries
        qs = build_queries()
        if args.list_queries or not args.name:
            for n in qs:
                print(n)
            return 0
        if args.name not in qs:
            p.error("unknown query %r (see `query --list`)" % args.name)

        import ray
        owns = not ray.is_initialized()
        if owns:
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, logging_level="ERROR")
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        try:
            res = qs[args.name](args.sf_dir)
            if hasattr(res, "write_parquet"):           # ray.data.Dataset
                if args.out:
                    res.write_parquet(args.out)
                    print(json.dumps({"out": args.out, "ok": True}))
                else:
                    for row in res.take(args.limit):
                        print(json.dumps(row, default=str))
            else:                                        # DataFrame / Table
                import pandas as pd
                import pyarrow as pa
                import pyarrow.parquet as pq
                tbl = pa.Table.from_pandas(res) \
                    if isinstance(res, pd.DataFrame) else res
                if args.out:
                    os.makedirs(args.out, exist_ok=True)
                    pq.write_table(tbl,
                                   os.path.join(args.out, "part-0.parquet"))
                    print(json.dumps({"out": args.out, "ok": True}))
                else:
                    for row in tbl.slice(0, args.limit).to_pylist():
                        print(json.dumps(row, default=str))
            return 0
        finally:
            if owns:
                ray.shutdown()

    import ray
    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    settings = _load_settings(args)
    try:
        if args.cmd == "extract" and not args.html_dir \
                and not getattr(args, "jsonl", False) \
                and not getattr(args, "warc", False) and not args.exploded \
                and not args.adaptive and not args.xml:
            # (--jsonl runs the plain pipeline below: the resumable
            # shard-manifest job shards by parquet file group)
            # full resumable job with manifests + metrics
            from pdfextract_ray.pipelines.extract_pipeline import run_extract
            stats = run_extract(args.corpus, args.out, settings=settings,
                                num_shards=args.shards, resume=not args.no_resume,
                                parallel_shards=args.parallel_shards)
            print(json.dumps(stats))
            return 0

        from pdfextract_ray.registry import default_registry
        reg = default_registry()
        ctx = {"settings": settings}
        if args.cmd == "extract":
            # flag-combination contract: a requested output must never
            # be silently dropped
            if args.xml and (args.exploded or args.adaptive):
                raise SystemExit(
                    "--xml is only supported on the plain extract path "
                    "(the exploded/adaptive routers emit the extraction "
                    "schema); drop --xml or run without --exploded/--adaptive")
            if args.exploded and args.adaptive:
                raise SystemExit(
                    "--exploded and --adaptive are mutually exclusive "
                    "(adaptive already routes mega-docs to the exploded path)")
        ds = None if (args.cmd == "curate" and args.extracted) \
            or (args.cmd == "extract" and args.adaptive
                and not args.html_dir and _has_size_column(args.corpus)) \
            else _corpus_ds(args)  # pushdown builds its own filtered reads
        if args.cmd == "extract":
            if args.adaptive:
                from pdfextract_ray.pipelines.exploded import (
                    extract_adaptive, extract_adaptive_pushdown)
                if ds is None:
                    out = extract_adaptive_pushdown(
                        args.corpus, settings=settings,
                        threshold_bytes=args.adaptive_threshold)
                else:
                    out = extract_adaptive(
                        ds, settings=settings,
                        threshold_bytes=64 * 1024
                        if args.adaptive_threshold is None
                        else args.adaptive_threshold)
            elif args.exploded:
                # streaming actor-side sink: finished rows are written
                # during extraction (no materialize barrier, measured
                # 1.09x fused vs the Dataset-returning variant's 1.47x);
                # mega-doc residue lands in <out>/residue/
                from pdfextract_ray.pipelines.exploded import \
                    extract_exploded_to_dir
                extract_exploded_to_dir(ds, args.out, settings=settings,
                                        page_threshold=args.page_threshold)
                out = None  # already written; fall through to the ok line
            else:
                out = reg.build(ds, ["xml"] if args.xml else ["extract"], ctx)
            if out is not None:
                out.write_parquet(args.out)
        elif args.cmd == "extract-bib":
            reg.build(ds, ["bibtex"], ctx).write_parquet(args.out)
        elif args.cmd == "spans":
            out = reg.build(ds, ["extract"], ctx) \
                .select_columns(["url", "spans"])
            if args.svg:
                from pdfextract_ray.views import render_mark_batch
                out = out.map_batches(render_mark_batch, batch_format="pyarrow")
            out.write_parquet(args.out)
        elif args.cmd == "curate":
            from pdfextract_ray.pipelines.queries import (curate_exact,
                                                          curate_neardup)
            from pdfextract_ray.state.stagecheck import StagedRun
            cols = ["url", "title", "text", "lang", "n_refs", "n_tokens"]
            run = StagedRun(args.checkpoint_dir, {
                "cmd": "curate", "corpus": args.corpus,
                "extracted": bool(args.extracted),
                "exact_only": bool(args.exact_only),
                "url_dedup": bool(args.url_dedup),
                "domain_cap": args.domain_cap,
                # extraction settings shape the prep stage's output —
                # a resume under different --set overrides must refuse,
                # not silently replay stale extractions
                "settings": dataclasses.asdict(settings),
            })

            def build_prep():
                if args.extracted:
                    import glob
                    import ray.data
                    paths = args.corpus
                    if os.path.isdir(paths):
                        # tolerate run metadata (_RUN.json, manifests)
                        # next to the shard parquet of an extract-job
                        # output dir
                        found = sorted(glob.glob(
                            os.path.join(paths, "**", "*.parquet"),
                            recursive=True))
                        if found:
                            paths = found
                    cds = ray.data.read_parquet(paths, columns=cols)
                    src = cds
                else:
                    from pdfextract_ray.pipelines.extract_pipeline import \
                        extract_dataset
                    src = ds
                if args.url_dedup:
                    from pdfextract_ray.stages.urls import url_dedup_filter
                    src = url_dedup_filter(src)
                if args.domain_cap is not None:
                    from pdfextract_ray.stages.domains import \
                        domain_cap_filter_by_url
                    src = domain_cap_filter_by_url(src, args.domain_cap)
                if not args.extracted:
                    src = extract_dataset(src, settings=settings,
                                          with_spans=False) \
                        .select_columns(cols)
                return src

            cds = run.stage("prep", build_prep)
            curate = curate_exact if args.exact_only else curate_neardup
            run.stage("curate", lambda: curate(cds)).write_parquet(args.out)
        elif args.cmd == "xml":
            from pdfextract_ray.views import ALL_SPATIAL_TYPES, XmlSpatials
            types = tuple(t.strip() for t in args.spatials.split(",") if t.strip())
            bad = set(types) - set(ALL_SPATIAL_TYPES)
            if bad:
                p.error("unknown spatial types: %s" % ", ".join(sorted(bad)))
            out = ds.map_batches(
                XmlSpatials, batch_format="pyarrow", batch_size=32,
                concurrency=(1, 4),
                fn_constructor_kwargs=dict(
                    types=types, precision=args.precision,
                    lines=not args.no_lines, outline=args.outline,
                    settings=settings))
            out.write_parquet(args.out)
        print(json.dumps({"out": args.out, "ok": True}))
        return 0
    finally:
        if owns_session:
            ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
