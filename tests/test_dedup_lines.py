"""Cross-document line dedup (stages/linededup.py): semantics,
brute-force mirror, forced tiers, CLI."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data
from hypothesis import given, settings
from hypothesis import strategies as st

from pdfextract_ray.stages.linededup import (line_key_hashes,
                                             remove_duplicate_lines)
from pdfextract_ray.stages.textstats import ascii_words

FOOTER = "Copyright 2020 Example Corp All Rights Reserved"


def _t(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(texts, pa.string())})


def _run(texts, **kw):
    out = remove_duplicate_lines(ray.data.from_arrow(_t(texts)), **kw) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    return out


def test_keep_first_cross_doc(ray_session):
    docs = ["Unique body one.\n" + FOOTER,
            "Unique body two.\n" + FOOTER,
            "Unique body three.\n" + FOOTER]
    out = _run(docs)
    # doc 0 (global first) keeps the footer; the rest lose it
    assert out.loc[0, "clean_text"] == docs[0]
    assert out.loc[1, "clean_text"] == "Unique body two."
    assert out.loc[2, "clean_text"] == "Unique body three."
    assert list(out["n_removed"]) == [0, 1, 1]


def test_drop_all_and_min_count(ray_session):
    docs = ["Unique body one.\n" + FOOTER,
            "Unique body two.\n" + FOOTER]
    out = _run(docs, keep_first=False)
    assert list(out["n_removed"]) == [1, 1]   # even the first copy
    # min_count=3: two occurrences are below the bar — nothing drops
    out3 = _run(docs, min_count=3)
    assert list(out3["n_removed"]) == [0, 0]


def test_key_normalization_and_whitespace_lines(ray_session):
    a = "Body A here now.\n  " + FOOTER.upper() + "  "
    b = "Body B here now.\n" + FOOTER.lower()
    out = _run([a, b])
    # case/whitespace variants are the SAME key; kept copy is
    # byte-identical to its original form
    assert out.loc[0, "clean_text"] == a
    assert out.loc[1, "clean_text"] == "Body B here now."
    # whitespace-only lines are structure: never keyed, never removed
    c = "One real line here.\n\n   \nAnother real line there."
    outc = _run([c, "unrelated text entirely."])
    assert outc.loc[0, "clean_text"] == c


def test_within_doc_repeats_count(ray_session):
    doc = "Repeated chorus line.\nVerse one text.\nRepeated chorus line."
    out = _run([doc, "other doc body."])
    assert out.loc[0, "clean_text"] == \
        "Repeated chorus line.\nVerse one text."
    assert out.loc[0, "n_removed"] == 1


def test_no_duplicates_passthrough(ray_session):
    docs = ["All unique alpha.", "All unique beta.\nSecond line."]
    out = _run(docs)
    assert list(out["clean_text"]) == docs
    assert list(out["n_removed"]) == [0, 0]


def test_forced_join_tier_equals_mapside(ray_session, monkeypatch):
    import pdfextract_ray.stages.dedup as d  # the shared tier tail

    docs = ["Unique body %d.\n%s" % (i, FOOTER) for i in range(6)]
    a = _run(docs)
    monkeypatch.setattr(d, "mapside_fits", lambda *_: False)
    b = _run(docs)
    for col in ("doc_id", "clean_text", "n_lines", "n_removed"):
        assert list(a[col]) == list(b[col]), col


def _brute(texts, min_count=2, keep_first=True):
    occ = {}
    for di, text in enumerate(texts):
        for i, line in enumerate(text.split("\n")):
            w = ascii_words(line.lower())
            if w:
                occ.setdefault(" ".join(w), []).append((di, i))
    drops = set()
    for key, places in occ.items():
        if len(places) >= min_count:
            drops.update(places if not keep_first else places[1:])
    out = []
    for di, text in enumerate(texts):
        lines = text.split("\n")
        out.append("\n".join(ln for i, ln in enumerate(lines)
                             if (di, i) not in drops))
    return out


@settings(max_examples=25, deadline=None)
@given(st.lists(
    st.lists(st.sampled_from(
        [FOOTER, "menu home about contact", "some unique words %d",
         "   ", ""]),
        max_size=5),
    min_size=1, max_size=4), st.booleans())
def test_matches_brute_force(ray_session, docs_lines, keep_first):
    texts = ["\n".join(ln % (di * 10 + li) if "%d" in ln else ln
                       for li, ln in enumerate(lines))
             for di, lines in enumerate(docs_lines)]
    got = _run(texts, keep_first=keep_first)
    want = _brute(texts, keep_first=keep_first)
    assert list(got["clean_text"]) == want


def test_min_count_validation(ray_session):
    with pytest.raises(ValueError, match="min_count"):
        remove_duplicate_lines(ray.data.from_arrow(_t(["x"])),
                               min_count=1)


def test_cli_dedup_lines(ray_session, tmp_path):
    from pdfextract_ray.__main__ import main

    src = str(tmp_path / "docs.parquet")
    pq.write_table(_t(["Body one stands alone.\n" + FOOTER,
                       "Body two stands alone.\n" + FOOTER]), src)
    out = str(tmp_path / "clean")
    assert main(["dedup-lines", src, "--out", out]) == 0
    t = pq.read_table(glob.glob(os.path.join(out, "*.parquet"))) \
        .sort_by("doc_id")
    assert t.column("n_removed").to_pylist() == [0, 1]
    outa = str(tmp_path / "all")
    assert main(["dedup-lines", src, "--drop-all", "--out", outa]) == 0
    t2 = pq.read_table(glob.glob(os.path.join(outa, "*.parquet")))
    assert sorted(t2.column("n_removed").to_pylist()) == [1, 1]
