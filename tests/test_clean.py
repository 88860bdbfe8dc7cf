"""Text normalization (stages/clean.py)."""

import pyarrow as pa
import ray.data

from pdfextract_ray.stages.clean import (clean_batch, clean_documents,
                                         clean_text)


def test_clean_text_strips_and_normalizes():
    # C1 + zero-widths + BOM + bidi isolates vanish; \t \n survive
    s = "a\x00b​c﻿d⁦e⁩f\tg\nh\x85i"
    assert clean_text(s) == "abcdef\tg\nhi"
    # CRLF → LF via the C0 table (no \r survivors)
    assert clean_text("x\r\ny") == "x\ny"
    # NFC composes decomposed accents
    assert clean_text("café") == "café"
    # NFKC additionally folds compatibility forms
    assert clean_text("ﬁle ａ", form="NFKC") == "file a"
    assert clean_text("ﬁle", form="NFC") == "ﬁle"
    # whitespace collapse is opt-in
    assert clean_text("a  b\n\nc") == "a  b\n\nc"
    assert clean_text("  a  b\n\nc ", collapse_whitespace=True) == "a b c"
    assert clean_text("") == "" and clean_text(None) == ""


def test_clean_text_zwsp_blocked_composition_idempotence():
    # the case the second normalize exists for: ZWSP between base and
    # combining mark — after stripping, NFC must re-compose, or
    # cleaning twice differs from cleaning once
    s = "e​́"
    once = clean_text(s)
    assert once == "é"
    assert clean_text(once) == once


def test_clean_text_fuzz_idempotent():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=40), st.booleans(), st.sampled_from(["NFC", "NFKC"]))
    def prop(s, collapse, form):
        once = clean_text(s, form=form, collapse_whitespace=collapse)
        again = clean_text(once, form=form, collapse_whitespace=collapse)
        assert again == once

    prop()


def test_clean_batch_and_dataset(ray_session):
    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["ok text", "bad\x00​text"],
    })
    out = clean_batch(t)
    assert out["text"].to_pylist() == ["ok text", "badtext"]
    assert out["n_removed_chars"].to_pylist() == [0, 2]
    ds = clean_documents(ray.data.from_arrow(t)).to_pandas()
    assert ds.n_removed_chars.tolist() == [0, 2]


def test_cli_clean_text(ray_session, tmp_path):
    import glob
    import os

    import pyarrow.parquet as pq

    from pdfextract_ray.__main__ import main

    tbl = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": ["x​y\x00z"],
    })
    src = str(tmp_path / "docs.parquet")
    pq.write_table(tbl, src)
    out = str(tmp_path / "clean")
    assert main(["clean-text", src, "--out", out]) == 0
    t = pq.read_table(glob.glob(os.path.join(out, "*.parquet")))
    assert t.column("text").to_pylist() == ["xyz"]
    assert t.column("n_removed_chars").to_pylist() == [2]
