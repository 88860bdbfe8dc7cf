"""Blocklist page filter (stages/blocklist.py): boundary semantics,
case folding, phrases, CLI."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdfextract_ray.stages.blocklist import (blocklist_filter,
                                             blocklist_verdicts_batch,
                                             compile_blocklist)


def _t(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def _n(texts, phrases):
    pat = compile_blocklist(phrases)
    return blocklist_verdicts_batch(
        _t(texts), pat)["n_blocked_terms"].to_pylist()


def test_word_boundary_matching():
    # an entry never fires inside a longer word
    assert _n(["the class has assets", "a donkey is an ass here"],
              ["ass"]) == [0, 1]
    assert _n(["scrapple is fine", "bad apple pie"], ["apple"]) == [0, 1]


def test_case_insensitive_and_phrases():
    assert _n(["BUY Cheap PILLS now"], ["cheap pills"]) == [1]
    assert _n(["cheap and pills apart"], ["cheap pills"]) == [0]
    # longest-first: the specific phrase wins where both could start
    assert _n(["bad actor on stage"], ["bad", "bad actor"]) == [1]


def test_counts_and_nulls():
    pat = compile_blocklist(["spam"])
    out = blocklist_verdicts_batch(_t(["spam spam spam", "clean", None]),
                                   pat)
    assert out["n_blocked_terms"].to_pylist() == [3, 0, 0]
    assert out["keep"].to_pylist() == [False, True, True]


def test_empty_blocklist_raises():
    with pytest.raises(ValueError, match="empty"):
        compile_blocklist(["", "   "])


def test_regex_metachars_are_literal():
    assert _n(["price is $9.99 today", "price is $9X99 today"],
              ["$9.99"]) == [1, 0]


def test_dataset_filter(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_t(["all clean here", "free spam inside"]))
    kept = blocklist_filter(ds, ["spam"]).to_pandas()
    assert list(kept["doc_id"]) == [0]
    ann = blocklist_filter(ds, ["spam"], annotate=True).to_pandas() \
        .sort_values("doc_id")
    assert list(ann["keep"]) == [True, False]


def test_cli_blocklist_filter(ray_session, tmp_path):
    from pdfextract_ray.__main__ import main

    src = str(tmp_path / "docs.parquet")
    pq.write_table(_t(["good text", "has spam word"]), src)
    words = str(tmp_path / "words.txt")
    with open(words, "w") as f:
        f.write("spam\n\ncheap pills\n")
    out = str(tmp_path / "keep")
    assert main(["blocklist-filter", src, "--words", words,
                 "--out", out]) == 0
    t = pq.read_table(glob.glob(os.path.join(out, "*.parquet")))
    assert t.column("doc_id").to_pylist() == [0]
    # empty words file is an argparse error
    empty = str(tmp_path / "empty.txt")
    open(empty, "w").close()
    with pytest.raises(SystemExit):
        main(["blocklist-filter", src, "--words", empty,
              "--out", str(tmp_path / "x")])
