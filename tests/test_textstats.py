"""Text-analysis stage tests: batch kernels vs direct DuckDB SQL on the
same rows (engine-level parity without Ray)."""

import duckdb
import pyarrow as pa

from pdfextract_ray.stages import textstats as T

ROWS = pa.table({
    "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
    "text": [
        "The quick brown fox, born (1987), JUMPED over 12 lazy dogs.",
        "plain lowercase words only",
        "A.B. [1] ref-like text 'quoted' (x2004y)",
        "   leading and trailing   ",
    ],
})


def _sql(expr_sql: str):
    con = duckdb.connect()
    con.register("documents", ROWS)
    return con.sql(expr_sql).df()


def test_doc_stats_matches_duckdb():
    from pdfextract_ray.pipelines.queries import _DOC_STATS_SQL
    mine = T.doc_stats_batch(ROWS).to_pandas().sort_values("doc_id").reset_index(drop=True)
    oracle = _sql(_DOC_STATS_SQL).sort_values("doc_id").reset_index(drop=True)
    for col in ["letter_ratio", "word_count", "year_ratio", "token_count"]:
        assert list(mine[col]) == list(oracle[col]), col


def test_fingerprint_matches_duckdb():
    from pdfextract_ray.pipelines.queries import _DOC_FP_SQL
    mine = T.fingerprint_batch(ROWS).to_pandas().sort_values("doc_id")
    oracle = _sql(_DOC_FP_SQL).sort_values("doc_id")
    assert list(mine["fingerprint"]) == list(oracle["fingerprint"])


def test_quality_matches_duckdb():
    from pdfextract_ray.pipelines.queries import _DOC_QUALITY_SQL
    mine = T.quality_batch(ROWS).to_pandas().sort_values("doc_id").reset_index(drop=True)
    oracle = _sql(_DOC_QUALITY_SQL).sort_values("doc_id").reset_index(drop=True)
    for col in ["n_words", "stopword_ratio", "punct_ratio", "mean_word_len"]:
        assert list(mine[col]) == list(oracle[col]), col


def test_lang_id_markers():
    batch = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "lang": ["en", "de"],
        "text": ["the cat and the dog is here", "der hund und die katze ist da"],
    })
    out = T.LangId()(batch).to_pandas()
    assert list(out["pred_lang"]) == ["en", "de"]


def test_multimodal_decode_stub():
    from pdfextract_ray.stages.multimodal import DecodeMedia, synth_media_batch
    docs = pa.table({"doc_id": pa.array([2, 3], pa.int64()),
                     "text": ["image doc", "audio doc"]})
    media = synth_media_batch(docs)
    out = DecodeMedia()(media).to_pandas()
    assert list(out["kind"]) == ["image", "audio"]
    assert all(out["decoded"])
    assert out["width"].iloc[0] == 16 + 2 % 64
    # deterministic features
    out2 = DecodeMedia()(media).to_pandas()
    assert list(out["features"].iloc[0]) == list(out2["features"].iloc[0])
    # garbage payload doesn't decode but doesn't raise
    bad = pa.table({"media_id": pa.array([9], pa.int64()), "kind": ["image"],
                    "payload": pa.array([b"notamedia"], pa.binary())})
    outb = DecodeMedia()(bad).to_pandas()
    assert not outb["decoded"].iloc[0] or outb["width"].iloc[0] == 0


def test_multimodal_resize_and_frames():
    from pdfextract_ray.stages.multimodal import (ResizeImages, SampleFrames,
                                                  synth_media_batch)
    docs = pa.table({"doc_id": pa.array([2, 3], pa.int64()),
                     "text": ["image doc", "audio doc"]})
    media = synth_media_batch(docs)
    rs = ResizeImages(max_dim=16)(media).to_pandas()
    img = rs[rs["kind"] == "image"].iloc[0]
    assert max(img["width"], img["height"]) == 16
    assert img["payload"][:4] == b"PXIM"  # header preserved

    fr = SampleFrames(n_frames=3)(media).to_pandas()
    assert set(fr["kind"]) == {"audio"}  # images not frame-sampled
    assert list(fr["frame_index"]) == [0, 1, 2]
    assert all(len(f) == 32 for f in fr["frame"])


def test_rolling_fingerprint_robust_to_small_edits():
    from pdfextract_ray.stages.textstats import rolling_fingerprint
    a = ("the quick brown fox jumps over the lazy dog and keeps running "
         "through the long meadow towards the river bank")
    b = a.replace("lazy", "hazy")   # one-word edit
    c = "completely different text about columnar shuffle execution"
    fa, fb, fc = (rolling_fingerprint(x) for x in (a, b, c))
    assert fa == rolling_fingerprint(a)                 # deterministic
    shared_ab = len(set(fa.split("-")) & set(fb.split("-")))
    shared_ac = len(set(fa.split("-")) & set(fc.split("-")))
    assert shared_ab >= 2           # small edit keeps most min-hashes
    assert shared_ac == 0
    # short/empty inputs don't raise
    assert rolling_fingerprint("") and rolling_fingerprint("ab")


def test_lang_id_vectorized_equals_scalar_property():
    """ADVICE r3: the vectorized tokenizer must honor LangId's pinned
    contract — ASCII-whitespace splitting, simple-case lowering — on
    arbitrary Unicode content, not just the clean corpus. The scalar
    reference below IS that contract (re.split on the exact ASCII
    class the oracle SQL uses); exotic Unicode separators (NBSP, NEL,
    \\x1c-\\x1f, U+3000) must stay INSIDE tokens, identically to the
    DuckDB oracle's RE2 class. This property test is also what caught
    pyarrow 16.1's heap-state-dependent utf8_split_whitespace misses,
    which is why LangId uses ascii_split_whitespace."""
    import re
    import pyarrow.compute as pc
    from hypothesis import given, settings as hsettings, strategies as st

    token_re = re.compile("[ \t\n\v\f\r]+")

    def scalar_lang_id(texts):
        langs = list(T._LANG_MARKERS)
        preds, scores = [], []
        for text in texts:
            # the contract tokenizer: ASCII class split, then Arrow's
            # (simple-mapping, utf8proc) lowercase per token
            toks = [t for t in token_re.split(text or "") if t]
            words = pc.utf8_lower(pa.array(toks, pa.string())).to_pylist() \
                if toks else []
            hits = {k: sum(1 for w in words if w in v)
                    for k, v in T._LANG_MARKERS.items()}
            best = max(hits.values()) if words else 0
            if not words or best == 0:
                preds.append("und")
            else:
                preds.append(next(k for k in langs if hits[k] == best))
            scores.append(round(best / len(words), 6) if words else 0.0)
        return preds, scores

    seps = st.sampled_from([" ", "\t", "\n", "\v", "\f", "\r", "  ",
                            " \t", "\n\n"])
    word = st.one_of(
        st.sampled_from(["the", "and", "der", "und", "le", "la", "el",
                         "es", "THE", "Und", "\u0130st", "\u017ft",
                         "\xdf", "x", "a\xa0b", "c\x1cd", "e\x85f",
                         "g\u3000h"]),
        st.text(min_size=1, max_size=6).filter(
            lambda s: not token_re.search(s)))
    doc = st.lists(st.tuples(word, seps), min_size=0, max_size=12).map(
        lambda ps: "".join(w + s for w, s in ps))

    @hsettings(max_examples=200, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=8))
    def check(texts):
        batch = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "text": pa.array(texts, pa.string()),
        })
        out = T.LangId()(batch)
        preds, scores = scalar_lang_id(texts)
        assert out["pred_lang"].to_pylist() == preds
        assert out["marker_ratio"].to_pylist() == scores

    check()


def test_lang_id_special_casing_sides_with_oracle():
    """The one known case-mapping divergence (U+0130 İ): Python's full
    lowercase is 'i'+combining-dot, but Arrow AND DuckDB simple-map to
    'i' — so the vectorized path keeps the hash-equality contract with
    the DuckDB oracle exactly where the scalar loop would break it."""
    import duckdb
    batch = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "lang": ["de"],
        "text": ["der hund İST da"],
    })
    out = T.LangId()(batch).to_pandas()
    duck = duckdb.sql(
        r"""SELECT len(list_filter(
                list_filter(regexp_split_to_array(lower('der hund İST da'), '\s+'),
                            x -> x <> ''),
                x -> list_contains(['der','die','das','und','ist','nicht'], x)))
        """).fetchone()[0]
    assert duck == 2                       # oracle counts 'ist'
    assert out["marker_ratio"][0] == 0.5   # 2 of 4 — matches oracle
    assert out["pred_lang"][0] == "de"


def test_ascii_words_contract_fuzz():
    """The pinned tokenizer: ascii_words ≡ the explicit-class regex
    split on EVERY input (the str.split() fast path may only fire when
    equal), and ≡ DuckDB's regexp_split_to_array with the same class —
    including NBSP / \\x1c / \\x85 / \\v inputs where Python's Unicode
    split and RE2 '\\s' disagree."""
    import random

    import duckdb

    from pdfextract_ray.stages.textstats import ASCII_WS_RE, ascii_words

    def exact(s):
        return [w for w in ASCII_WS_RE.split(s) if w]

    rng = random.Random(99)
    alphabet = list("ab1.") + [" ", "\t", "\n", "\v", "\f", "\r",
                               "\x1c", "\x1d", "\x85", "\xa0", " "]
    cases = ["", " ", "a\xa0b", "a\x1cb", "\va\v", "a  b"]
    cases += ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
              for _ in range(300)]
    con = duckdb.connect()
    for s in cases:
        got = ascii_words(s)
        assert got == exact(s), repr(s)
        sql = con.execute(
            "SELECT list_filter(regexp_split_to_array(?, "
            "'[ \t\n\x0B\f\r]+'), x -> x <> '')", [s]).fetchone()[0]
        assert got == sql, repr(s)
