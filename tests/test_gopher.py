"""Gopher quality rules (stages/gopher.py): per-rule matrix,
brute-force mirror, CLI both modes."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from pdfextract_ray.stages.gopher import (BULLETS, MIN_STOPWORDS,
                                          STOPWORDS, gopher_filter,
                                          gopher_rules_batch)
from pdfextract_ray.stages.textstats import ascii_words

# a document that passes every rule: 60 common words with stop words
GOOD = ("the quick brown fox jumps over that lazy dog and runs to "
        "the old stone house with great speed every single day " * 3)


def _t(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def _verdict(text, col):
    return gopher_rules_batch(_t([text]))[col].to_pylist()[0]


def test_good_doc_passes_all():
    out = gopher_rules_batch(_t([GOOD]))
    for c in out.column_names[1:]:
        assert out[c].to_pylist() == [True], c


def test_word_count_bounds():
    assert not _verdict("too short with the and", "word_count_ok")
    assert _verdict(GOOD, "word_count_ok")


def test_mean_word_len_bounds():
    short = " ".join(["a b c d"] * 30)          # mean 1 < 3
    assert not _verdict(short, "mean_word_len_ok")
    longw = " ".join(["pneumonoultramicroscopic"] * 60)  # mean > 10
    assert not _verdict(longw, "mean_word_len_ok")


def test_symbol_ratio():
    assert not _verdict(GOOD + " #" * 20, "symbol_ratio_ok")
    assert not _verdict(GOOD + " ..." * 20, "symbol_ratio_ok")
    assert _verdict(GOOD + " #", "symbol_ratio_ok")


def test_symbol_ratio_is_per_symbol_type():
    """Rae et al. 2021 threshold EACH symbol type at 0.1 ('either'):
    ~0.065 hash + ~0.065 ellipsis passes even though the combined
    ratio exceeds 0.1; ~0.12 of one type alone fails."""
    n = len(ascii_words(GOOD.lower()))
    both = GOOD + " #" * int(0.06 * n) + " ..." * int(0.06 * n)
    assert _verdict(both, "symbol_ratio_ok")
    one = GOOD + " #" * int(0.13 * n)
    assert not _verdict(one, "symbol_ratio_ok")


def test_bullet_and_ellipsis_line_fractions():
    bullets = "\n".join("• item %d here" % i for i in range(10))
    assert not _verdict(bullets, "bullet_frac_ok")
    ell = "\n".join("trailing off now..." for _ in range(10))
    assert not _verdict(ell, "ellipsis_frac_ok")
    assert _verdict(GOOD, "bullet_frac_ok")
    assert _verdict(GOOD, "ellipsis_frac_ok")


def test_alpha_fraction_and_stopwords():
    nums = " ".join(str(i) for i in range(100))
    assert not _verdict(nums, "alpha_frac_ok")
    nostop = " ".join(["zebra motor cable"] * 30)
    assert not _verdict(nostop, "stopwords_ok")


def test_null_text_fails_everything():
    out = gopher_rules_batch(_t([None]))
    for c in out.column_names[1:]:
        assert out[c].to_pylist() == [False], c


def _brute_keep(text):
    if text is None:
        return False
    words = ascii_words(text.lower())
    if not (50 <= len(words) <= 100_000):
        return False
    if not words:
        return False
    ml = sum(map(len, words)) / len(words)
    if not (3.0 <= ml <= 10.0):
        return False
    import re
    # per-symbol-type thresholds (Rae et al. 2021: "either")
    if len(re.findall(r"#", text)) / len(words) > 0.1:
        return False
    if len(re.findall(r"…|\.\.\.", text)) / len(words) > 0.1:
        return False
    lines = text.split("\n")
    if sum(1 for ln in lines
           if ln.lstrip().startswith(BULLETS)) / len(lines) >= 0.9:
        return False
    if sum(1 for ln in lines if ln.rstrip().endswith(("...", "…"))) \
            / len(lines) >= 0.3:
        return False
    if sum(1 for w in words if any(c.isalpha() for c in w)) \
            / len(words) < 0.8:
        return False
    return len(STOPWORDS.intersection(words)) >= MIN_STOPWORDS


@settings(max_examples=150, deadline=None)
@given(st.lists(
    st.one_of(st.just(GOOD), st.just("• bullet"), st.just("end..."),
              st.just("# # # #"), st.just("12345 67890"),
              st.text(alphabet=st.characters(min_codepoint=32,
                                             max_codepoint=126),
                      max_size=40)),
    max_size=6))
def test_matches_brute_force(parts):
    text = "\n".join(parts)
    got = gopher_rules_batch(_t([text]))["keep"].to_pylist()[0]
    assert got == _brute_keep(text), text


def test_dataset_filter_and_annotate(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_t([GOOD, "tiny doc."]))
    kept = gopher_filter(ds).to_pandas()
    assert list(kept["doc_id"]) == [0]
    ann = gopher_filter(ds, annotate=True).to_pandas() \
        .sort_values("doc_id")
    assert list(ann["keep"]) == [True, False]
    assert "text" not in ann.columns


def test_cli_gopher_filter(ray_session, tmp_path):
    from pdfextract_ray.__main__ import main

    src = str(tmp_path / "docs.parquet")
    pq.write_table(_t([GOOD, "tiny doc."]), src)
    out = str(tmp_path / "keep")
    assert main(["gopher-filter", src, "--out", out]) == 0
    t = pq.read_table(glob.glob(os.path.join(out, "*.parquet")))
    assert t.num_rows == 1 and t.column("doc_id").to_pylist() == [0]
    outa = str(tmp_path / "ann")
    assert main(["gopher-filter", src, "--annotate", "--out",
                 outa]) == 0
    a = pq.read_table(glob.glob(os.path.join(outa, "*.parquet"))) \
        .sort_by("doc_id")
    assert a.column("keep").to_pylist() == [True, False]
    assert "word_count_ok" in a.column_names
