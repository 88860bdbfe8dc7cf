"""C4-style line cleaning (stages/lines.py): line rules, page
heuristics, idempotence, brute-force mirror, CLI."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from pdfextract_ray.stages.lines import (TERMINALS, clean_lines,
                                         clean_lines_batch)
from pdfextract_ray.stages.textstats import ascii_words


def _t(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


GOOD = "This line is perfectly fine and ends well."


def test_line_rules():
    doc = "\n".join([
        GOOD,                                   # kept
        "No terminal punctuation here",         # dropped: no terminal
        "Too short.",                           # dropped: < 3 words
        "Enable javascript to view this page.",  # dropped: marker
        'He said "stop right there!"',          # kept: ends in quote
        "   Indented but still a fine line.  ",  # kept: rstrip-ed check
        "",                                     # dropped: empty
    ])
    out = clean_lines_batch(_t([doc]))
    kept = out["text"].to_pylist()[0].split("\n")
    assert kept == [GOOD, 'He said "stop right there!"',
                    "   Indented but still a fine line.  "]
    assert out["n_lines"].to_pylist() == [7]
    assert out["n_lines_kept"].to_pylist() == [3]


def test_page_heuristics():
    five = "\n".join([GOOD] * 5)            # 5 sentences → keep
    four = "\n".join([GOOD] * 4)            # 4 → drop
    lorem = five + "\nwe use Lorem Ipsum filler"   # banned (any case)
    brace = five.replace("well", "well {")  # "{" anywhere → drop
    out = clean_lines_batch(_t([five, four, lorem, brace, None]))
    assert out["keep"].to_pylist() == [True, False, False, False, False]
    assert out["n_sentences"].to_pylist()[0] == 5
    assert out["text"].to_pylist()[4] is None


def test_multi_punct_line_counts_multiple_sentences():
    doc = "One sentence. Two sentences! Three sentences? All one line."
    out = clean_lines_batch(_t([doc]), min_sentences=4)
    assert out["n_sentences"].to_pylist() == [4]
    assert out["keep"].to_pylist() == [True]


def _brute(text, min_words=3, min_sentences=5):
    """Independent restatement of the documented semantics."""
    kept = []
    for line in text.split("\n"):
        s = line.rstrip()
        if not s or s[-1] not in TERMINALS:
            continue
        if "javascript" in line.lower():
            continue
        if len(ascii_words(line)) < min_words:
            continue
        kept.append(line)
    cleaned = "\n".join(kept)
    n_sent = sum(cleaned.count(c) for c in ".!?")
    low = text.lower()
    keep = (n_sent >= min_sentences and "lorem ipsum" not in low
            and "{" not in low)
    return cleaned, keep


_LINE_BITS = st.lists(
    st.one_of(st.just(GOOD), st.just("short."), st.just("no end"),
              st.just("Click here to enable JavaScript now."),
              st.text(alphabet=st.characters(min_codepoint=32,
                                             max_codepoint=126),
                      max_size=30)),
    max_size=8)


@settings(max_examples=150, deadline=None)
@given(_LINE_BITS)
def test_matches_brute_force(parts):
    text = "\n".join(parts)
    out = clean_lines_batch(_t([text]))
    cleaned, keep = _brute(text)
    assert out["text"].to_pylist()[0] == cleaned
    assert out["keep"].to_pylist()[0] == keep


@settings(max_examples=100, deadline=None)
@given(_LINE_BITS)
def test_drop_pages_idempotent(ray_session, parts):
    import ray.data

    ds = ray.data.from_arrow(_t(["\n".join(parts), "\n".join([GOOD] * 6)]))
    once = clean_lines(ds, drop_pages=True).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    again = clean_lines(
        ray.data.from_arrow(pa.Table.from_pandas(
            once[["doc_id", "text"]], preserve_index=False)),
        drop_pages=True).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(once["doc_id"]) == list(again["doc_id"])
    assert list(once["text"]) == list(again["text"])


def test_cli_clean_lines(ray_session, tmp_path):
    from pdfextract_ray.__main__ import main

    src = str(tmp_path / "docs.parquet")
    pq.write_table(_t(["\n".join([GOOD] * 6 + ["drop me"]),
                       "too few sentences."]), src)
    out = str(tmp_path / "ann")
    assert main(["clean-lines", src, "--out", out]) == 0
    t = pq.read_table(glob.glob(os.path.join(out, "*.parquet"))) \
        .sort_by("doc_id")
    assert t.column("keep").to_pylist() == [True, False]
    assert "drop me" not in t.column("text").to_pylist()[0]
    outd = str(tmp_path / "drop")
    assert main(["clean-lines", src, "--out", outd,
                 "--drop-pages"]) == 0
    t2 = pq.read_table(glob.glob(os.path.join(outd, "*.parquet")))
    assert t2.num_rows == 1 and "keep" not in t2.column_names
