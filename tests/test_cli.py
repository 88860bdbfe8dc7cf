"""CLI multiplexer drives (in-process; reuses the session Ray)."""

import glob
import json
import os

import pyarrow.parquet as pq
import pytest

from pdfextract_ray.__main__ import main


@pytest.fixture(scope="module")
def cli_corpus(ray_session, tiny_corpus, tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_corpus")
    pq.write_table(tiny_corpus.slice(0, 8), str(d / "part-0.parquet"))
    return str(d)


def test_cli_extract_job(cli_corpus, tmp_path, capsys):
    out = str(tmp_path / "out")
    assert main(["extract", cli_corpus, "--out", out, "--shards", "2"]) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["rows"] == 8 and stats["errors"] == 0
    assert os.path.exists(os.path.join(out, "_RUN.json"))
    assert len(glob.glob(os.path.join(out, "shard=*", "*.parquet"))) > 0


def test_cli_settings_override(cli_corpus, tmp_path, capsys):
    out = str(tmp_path / "xml")
    rc = main(["extract", cli_corpus, "--out", out, "--xml",
               "--set", "reference_flex:0.3"])
    assert rc == 0
    t = pq.read_table(glob.glob(os.path.join(out, "*.parquet")))
    assert "xml" in t.schema.names
    assert t.column("xml")[0].as_py().startswith("<pdf>")


def test_cli_spans(cli_corpus, tmp_path, capsys):
    out = str(tmp_path / "spans")
    assert main(["spans", cli_corpus, "--out", out]) == 0
    t = pq.read_table(glob.glob(os.path.join(out, "*.parquet")))
    assert t.schema.names == ["url", "spans"]
    assert len(t.column("spans")[0].as_py()) > 0


def test_cli_settings_listing(capsys):
    assert main(["settings"]) == 0
    out = capsys.readouterr().out
    assert "reference_flex" in out and "char_slop" in out


def test_cli_exploded_variant(cli_corpus, tmp_path, capsys):
    out = str(tmp_path / "exploded")
    assert main(["extract", cli_corpus, "--out", out, "--exploded"]) == 0
    t = pq.read_table(glob.glob(os.path.join(out, "*.parquet")))
    assert t.num_rows == 8
    assert "text" in t.schema.names


def test_cli_html_dir(ray_session, tiny_corpus, tmp_path, capsys):
    d = tmp_path / "html"
    d.mkdir()
    for i in range(3):
        (d / ("doc%d.html" % i)).write_bytes(tiny_corpus.column("html")[i].as_py())
    out = str(tmp_path / "out")
    assert main(["extract", str(d), "--html-dir", "--out", out]) == 0
    t = pq.read_table(glob.glob(os.path.join(out, "*.parquet")))
    assert t.num_rows == 3
    assert all(u.startswith("file://") for u in t.column("url").to_pylist())


def test_cli_adaptive_variant(cli_corpus, tmp_path):
    from pdfextract_ray.__main__ import main
    out = str(tmp_path / "adaptive_out")
    rc = main(["extract", cli_corpus, "--out", out,
               "--adaptive", "--adaptive-threshold", "7000"])
    assert rc == 0
    import glob
    t = pq.read_table(glob.glob(out + "/*.parquet"))
    assert t.num_rows == 8
    assert "text" in t.schema.names


def test_cli_curate(cli_corpus, tmp_path):
    out = str(tmp_path / "curated")
    assert main(["curate", cli_corpus, "--out", out]) == 0
    t = pq.read_table(glob.glob(os.path.join(out, "*.parquet")))
    assert t.schema.names == ["url", "lang", "title", "n_refs", "n_tokens"]
    assert 0 < t.num_rows <= 8


def test_cli_curate_extracted_equals_inline(cli_corpus, tmp_path):
    """curate --extracted over an extract-job output dir (with _RUN.json
    and manifests present) equals the inline extract→curate path."""
    ext = str(tmp_path / "ext")
    assert main(["extract", cli_corpus, "--out", ext, "--shards", "1"]) == 0
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    assert main(["curate", ext, "--extracted", "--exact-only",
                 "--out", out_a]) == 0
    assert main(["curate", cli_corpus, "--exact-only", "--out", out_b]) == 0
    ta = pq.read_table(glob.glob(os.path.join(out_a, "*.parquet")))
    tb = pq.read_table(glob.glob(os.path.join(out_b, "*.parquet")))
    assert ta.sort_by("url").to_pydict() == tb.sort_by("url").to_pydict()


def test_cli_curate_checkpoint_resume_equals_fresh(cli_corpus, tmp_path):
    """--checkpoint-dir: (1) a checkpointed run equals a fresh
    uncheckpointed one; (2) a rerun with the same DIR SKIPS completed
    stages (stage parquet untouched byte-for-byte, by mtime) and still
    writes identical final output — resume-equals-fresh for the
    composed curation recipe; (3) a DIR recorded for different
    arguments is refused."""
    fresh = str(tmp_path / "fresh")
    assert main(["curate", cli_corpus, "--exact-only",
                 "--out", fresh]) == 0
    ckpt = str(tmp_path / "ckpt")
    out1 = str(tmp_path / "o1")
    assert main(["curate", cli_corpus, "--exact-only",
                 "--checkpoint-dir", ckpt, "--out", out1]) == 0
    tf = pq.read_table(glob.glob(os.path.join(fresh, "*.parquet")))
    t1 = pq.read_table(glob.glob(os.path.join(out1, "*.parquet")))
    assert tf.sort_by("url").to_pydict() == t1.sort_by("url").to_pydict()
    # both stages checkpointed + manifested
    stage_files = sorted(glob.glob(os.path.join(ckpt, "stage-*", "*.parquet")))
    assert stage_files
    assert os.path.exists(os.path.join(ckpt, "_manifests",
                                       "stage-prep.json"))
    assert os.path.exists(os.path.join(ckpt, "_manifests",
                                       "stage-curate.json"))
    mtimes = {f: os.path.getmtime(f) for f in stage_files}

    # simulate a crash after the stages completed but before the final
    # write: rerun with the same checkpoint dir into a new --out
    out2 = str(tmp_path / "o2")
    assert main(["curate", cli_corpus, "--exact-only",
                 "--checkpoint-dir", ckpt, "--out", out2]) == 0
    t2 = pq.read_table(glob.glob(os.path.join(out2, "*.parquet")))
    assert tf.sort_by("url").to_pydict() == t2.sort_by("url").to_pydict()
    # completed stages were replayed from checkpoint, not recomputed
    assert {f: os.path.getmtime(f)
            for f in sorted(glob.glob(
                os.path.join(ckpt, "stage-*", "*.parquet")))} == mtimes

    # a checkpoint dir recorded for DIFFERENT args is refused
    with pytest.raises(SystemExit):
        main(["curate", cli_corpus, "--checkpoint-dir", ckpt,
              "--out", str(tmp_path / "o3")])


def test_cli_query_list(capsys):
    assert main(["query", "--list"]) == 0
    names = capsys.readouterr().out.split()
    assert "q1_pricing" in names and "dedup_minhash" in names
    assert len(names) >= 50


def test_cli_query_print_and_out(ray_session, tmp_path, capsys):
    assert main(["query", "lang_counts",
                 "--sf-dir", "/root/testdata/sf0.001"]) == 0
    rows = [json.loads(l) for l in
            capsys.readouterr().out.strip().splitlines()]
    assert rows and "lang" in rows[0]
    out = str(tmp_path / "q")
    assert main(["query", "q1_pricing", "--sf-dir", "/root/testdata/sf0.001",
                 "--out", out]) == 0
    capsys.readouterr()
    t = pq.read_table(glob.glob(os.path.join(out, "*.parquet")))
    assert t.num_rows > 0


def test_cli_query_unknown_name(capsys):
    with pytest.raises(SystemExit):
        main(["query", "no_such_query"])


def test_cli_dedup_paragraphs(tmp_path):
    """dedup-paragraphs over a (doc_id, text) parquet: the second
    occurrence of a planted shared window is removed."""
    import pyarrow as pa

    shared = " ".join("w%d" % i for i in range(16))
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": [shared + " unique one tail", shared + " other tail words",
                 "entirely distinct filler content here"],
    })
    src = str(tmp_path / "docs.parquet")
    pq.write_table(tbl, src)
    out = str(tmp_path / "clean")
    assert main(["dedup-paragraphs", src, "--out", out]) == 0
    t = pq.read_table(glob.glob(os.path.join(out, "*.parquet"))) \
        .sort_by("doc_id")
    assert t.column("n_removed").to_pylist() == [0, 1, 0]
    assert t.column("clean_text")[1].as_py() == "other tail words"


def test_cli_dedup_paragraphs_rejects_non_integer_id(tmp_path):
    import pyarrow as pa
    import pytest

    tbl = pa.table({"url": ["a", "b"], "text": ["x y", "p q"]})
    src = str(tmp_path / "docs.parquet")
    pq.write_table(tbl, src)
    with pytest.raises(SystemExit):
        main(["dedup-paragraphs", src, "--id-col", "url",
              "--out", str(tmp_path / "o")])


def test_cli_decontaminate_external_eval(tmp_path):
    """decontaminate --eval: a corpus doc copying an eval doc is
    flagged; an unrelated one is not; eval rows are a separate table
    so every corpus row is scanned."""
    import pyarrow as pa

    ev_text = " ".join("e%d" % i for i in range(30))
    corpus = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": [ev_text + " plus a tail", "totally unrelated words here"],
    })
    evals = pa.table({"text": [ev_text]})
    src = str(tmp_path / "corpus.parquet")
    evp = str(tmp_path / "eval.parquet")
    pq.write_table(corpus, src)
    pq.write_table(evals, evp)
    out = str(tmp_path / "flags")
    assert main(["decontaminate", src, "--eval", evp, "--out", out]) == 0
    t = pq.read_table(glob.glob(os.path.join(out, "*.parquet"))) \
        .sort_by("doc_id")
    assert t.num_rows == 2                      # EVERY corpus row scanned
    assert t.column("is_contaminated").to_pylist() == [True, False]
    assert t.column("n_contaminated")[0].as_py() > 0


def test_cli_dedup_spans(ray_session, tmp_path):
    """dedup-spans: a 20-word run copied at a paragraph-boundary-
    straddling offset is cut from the second doc but kept in the
    first; --stats-only writes detection rows instead."""
    import pyarrow as pa

    run = " ".join("d%d" % i for i in range(20))
    filler = " ".join("f%d" % i for i in range(9))
    other = " ".join("g%d" % i for i in range(11))
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": [filler + " " + run, other + " " + run + " coda",
                 "independent text body here"],
    })
    src = str(tmp_path / "docs.parquet")
    pq.write_table(tbl, src)
    out = str(tmp_path / "clean")
    assert main(["dedup-spans", src, "--out", out]) == 0
    t = pq.read_table(glob.glob(os.path.join(out, "*.parquet"))) \
        .sort_by("doc_id")
    assert t.column("n_removed").to_pylist() == [0, 20, 0]
    assert t.column("clean_text")[1].as_py() == other + " coda"

    stats_out = str(tmp_path / "stats")
    assert main(["dedup-spans", src, "--stats-only",
                 "--out", stats_out]) == 0
    s = pq.read_table(glob.glob(os.path.join(stats_out, "*.parquet"))) \
        .sort_by("doc_id")
    assert s.column("doc_id").to_pylist() == [1, 2]
    assert all(v >= 20 for v in s.column("dup_words").to_pylist())


def test_cli_dedup_incremental_with_snapshot_reuse(ray_session, tmp_path):
    """dedup-incremental: new-vs-old flags, hash-snapshot write on the
    first delivery and --hashes reuse on the second."""
    import pyarrow as pa

    old = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["corpus doc one", "corpus doc two", "corpus doc three"],
    })
    new = pa.table({
        "doc_id": pa.array([10, 11, 12], pa.int64()),
        "text": ["corpus doc two", "fresh doc alpha", "fresh doc alpha"],
    })
    old_p = str(tmp_path / "old.parquet")
    new_p = str(tmp_path / "new.parquet")
    pq.write_table(old, old_p)
    pq.write_table(new, new_p)
    out1 = str(tmp_path / "delivery1")
    snap = str(tmp_path / "old_hashes")
    assert main(["dedup-incremental", new_p, "--against", old_p,
                 "--write-hashes", snap, "--out", out1]) == 0
    t = pq.read_table(glob.glob(os.path.join(out1, "*.parquet"))) \
        .sort_by("doc_id")
    assert t.column("dup_vs_old").to_pylist() == [True, False, False]
    assert t.column("keep").to_pylist() == [False, True, False]

    out2 = str(tmp_path / "delivery2")
    assert main(["dedup-incremental", new_p, "--against", snap,
                 "--hashes", "--out", out2]) == 0
    t2 = pq.read_table(glob.glob(os.path.join(out2, "*.parquet"))) \
        .sort_by("doc_id")
    assert t2.column("keep").to_pylist() == t.column("keep").to_pylist()


def test_cli_neardup_incremental_with_sig_snapshot(ray_session, tmp_path):
    """neardup-incremental: near-dup (not exact) flags vs old corpus,
    sig-snapshot write on the first delivery and --sigs reuse."""
    import pyarrow as pa

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon " * 3)
    old = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": [base, "totally different short text here"],
    })
    near = base.replace("gamma", "zzz", 2)
    new = pa.table({
        "doc_id": pa.array([10, 11], pa.int64()),
        "text": [near, "fresh unrelated words entirely disjoint tokens"],
    })
    old_p = str(tmp_path / "old.parquet")
    new_p = str(tmp_path / "new.parquet")
    pq.write_table(old, old_p)
    pq.write_table(new, new_p)
    out1 = str(tmp_path / "d1")
    snap = str(tmp_path / "sigs")
    assert main(["neardup-incremental", new_p, "--against", old_p,
                 "--write-sigs", snap, "--out", out1]) == 0
    t = pq.read_table(glob.glob(os.path.join(out1, "*.parquet"))) \
        .sort_by("doc_id")
    assert t.column("near_dup_of_old").to_pylist() == [True, False]
    assert t.column("matched_old_id").to_pylist()[0] == 1
    assert t.column("keep").to_pylist() == [False, True]

    out2 = str(tmp_path / "d2")
    assert main(["neardup-incremental", new_p, "--against", snap,
                 "--sigs", "--out", out2]) == 0
    t2 = pq.read_table(glob.glob(os.path.join(out2, "*.parquet"))) \
        .sort_by("doc_id")
    assert t2.column("keep").to_pylist() == t.column("keep").to_pylist()


def test_cli_neardup_snapshot_composes_across_deliveries(ray_session,
                                                         tmp_path):
    """--write-new-sigs: delivery 1's OWN signatures land in the
    snapshot dir, so delivery 2 near-dups against old + delivery 1
    (the review found --write-sigs alone — which snapshots the OLD
    side — could never achieve the documented compose workflow)."""
    import pyarrow as pa

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon " * 3)
    d1_text = base.replace("alpha", "qqq", 3)  # unrelated to old
    old = pa.table({"doc_id": pa.array([1], pa.int64()),
                    "text": ["totally different short text here"]})
    d1 = pa.table({"doc_id": pa.array([10], pa.int64()),
                   "text": [d1_text]})
    d2 = pa.table({"doc_id": pa.array([20, 21], pa.int64()),
                   "text": [d1_text.replace("gamma", "zzz", 2),
                            "fresh unrelated words entirely disjoint"]})
    old_p = str(tmp_path / "old.parquet")
    d1_p = str(tmp_path / "d1.parquet")
    d2_p = str(tmp_path / "d2.parquet")
    pq.write_table(old, old_p)
    pq.write_table(d1, d1_p)
    pq.write_table(d2, d2_p)
    snap = str(tmp_path / "snap")
    # delivery 1: bootstrap the old snapshot AND append d1's own sigs
    assert main(["neardup-incremental", d1_p, "--against", old_p,
                 "--write-sigs", os.path.join(snap, "old"),
                 "--write-new-sigs", os.path.join(snap, "d1"),
                 "--out", str(tmp_path / "o1")]) == 0
    d1_sigs = pq.read_table(
        glob.glob(os.path.join(snap, "d1", "*.parquet")))
    assert d1_sigs.column("doc_id").to_pylist() == [10]  # DELIVERY ids
    # delivery 2 vs the composed snapshot: doc 20 must match d1's 10
    assert main(["neardup-incremental", d2_p, "--against", snap,
                 "--sigs", "--out", str(tmp_path / "o2")]) == 0
    t = pq.read_table(glob.glob(os.path.join(
        str(tmp_path / "o2"), "*.parquet"))).sort_by("doc_id")
    assert t.column("near_dup_of_old").to_pylist() == [True, False]
    assert t.column("matched_old_id").to_pylist()[0] == 10
    # --write-sigs only converts a RAW --against (with --sigs it would
    # just copy the snapshot)
    with pytest.raises(SystemExit):
        main(["neardup-incremental", d2_p, "--against", snap, "--sigs",
              "--write-sigs", str(tmp_path / "dup"),
              "--out", str(tmp_path / "o3")])


def test_cli_neardup_kept_sigs_only(ray_session, tmp_path):
    """--kept-sigs-only: the delivery snapshot is filtered to the
    run's keep=true verdicts, so rejected docs never become dedup
    anchors for future deliveries (default mode writes every row —
    both behaviors spelled out in the flag help)."""
    import pyarrow as pa

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon " * 3)
    old = pa.table({"doc_id": pa.array([1], pa.int64()),
                    "text": [base]})
    # doc 10 near-dups the old corpus (rejected); doc 11 is fresh
    new = pa.table({"doc_id": pa.array([10, 11], pa.int64()),
                    "text": [base.replace("gamma", "zzz", 1),
                             "fresh unrelated words entirely disjoint"]})
    old_p = str(tmp_path / "old.parquet")
    new_p = str(tmp_path / "new.parquet")
    pq.write_table(old, old_p)
    pq.write_table(new, new_p)
    snap = str(tmp_path / "kept")
    assert main(["neardup-incremental", new_p, "--against", old_p,
                 "--write-new-sigs", snap, "--kept-sigs-only",
                 "--out", str(tmp_path / "o1")]) == 0
    t = pq.read_table(glob.glob(os.path.join(
        str(tmp_path / "o1"), "*.parquet"))).sort_by("doc_id")
    assert t.column("keep").to_pylist() == [False, True]
    sigs = pq.read_table(glob.glob(os.path.join(snap, "*.parquet")))
    assert sigs.column("doc_id").to_pylist() == [11]  # kept rows only
    # --kept-sigs-only without --write-new-sigs is a usage error
    with pytest.raises(SystemExit):
        main(["neardup-incremental", new_p, "--against", old_p,
              "--kept-sigs-only", "--out", str(tmp_path / "o4")])


def test_cli_domain_cap_and_stats(ray_session, tmp_path):
    import pyarrow as pa

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "url": ["http://a.example.com/1", "http://example.com/2",
                "http://b.example.com/3", "http://bbc.co.uk/x",
                "http://news.bbc.co.uk/y"],
        "quality": pa.array([0.1, 0.9, 0.5, 0.2, 0.8], pa.float64()),
        "text": ["t1", "t2", "t3", "t4", "t5"],
    })
    src = str(tmp_path / "docs.parquet")
    pq.write_table(t, src)

    out = str(tmp_path / "capped")
    assert main(["domain-cap", src, "--cap", "1",
                 "--quality-col", "quality", "--out", out]) == 0
    kept = pq.read_table(glob.glob(os.path.join(out, "*.parquet"))) \
        .sort_by("doc_id")
    # example.com best quality = id 2; bbc.co.uk best = id 5
    assert kept.column("doc_id").to_pylist() == [2, 5]
    assert kept.column("text").to_pylist() == ["t2", "t5"]

    vout = str(tmp_path / "verdicts")
    assert main(["domain-cap", src, "--cap", "1", "--quality-col",
                 "quality", "--verdicts-only", "--out", vout]) == 0
    v = pq.read_table(glob.glob(os.path.join(vout, "*.parquet"))) \
        .sort_by("doc_id")
    assert v.column("keep").to_pylist() == [False, True, False,
                                            False, True]

    sout = str(tmp_path / "stats")
    assert main(["domain-stats", src, "--out", sout]) == 0
    s = pq.read_table(glob.glob(os.path.join(sout, "*.parquet")))
    d = dict(zip(s.column("domain").to_pylist(),
                 s.column("n_pages").to_pylist()))
    assert d == {"example.com": 3, "bbc.co.uk": 2}


def test_cli_curate_domain_cap(cli_corpus, tmp_path):
    # synthetic corpus urls are https://<source>.example.org/... — ONE
    # registrable domain, so --domain-cap 3 keeps exactly 3 distinct
    # urls before extraction
    out = str(tmp_path / "capped")
    assert main(["curate", cli_corpus, "--exact-only", "--domain-cap",
                 "3", "--out", out]) == 0
    t = pq.read_table(glob.glob(os.path.join(out, "*.parquet")))
    assert 0 < t.num_rows <= 3
    with pytest.raises(SystemExit):
        main(["curate", cli_corpus, "--domain-cap", "0",
              "--out", str(tmp_path / "bad")])
