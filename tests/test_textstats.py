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


REP_ROWS = pa.table({
    "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
    "text": [
        "spam spam spam spam spam spam",          # one word repeated
        "a b c a b c a b c",                       # repeated trigram
        "all distinct words here now",             # no repetition
        "x y",                                     # < 3 words (no trigrams)
        "   ",                                     # zero words
    ],
})


def test_repetition_matches_duckdb():
    from pdfextract_ray.pipelines.queries import _DOC_REPETITION_SQL
    con = duckdb.connect()
    con.register("documents", REP_ROWS)
    mine = T.repetition_batch(REP_ROWS).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    oracle = con.sql(_DOC_REPETITION_SQL).df() \
        .sort_values("doc_id").reset_index(drop=True)
    for col in ["n_words", "distinct_ratio", "top_word_ratio",
                "dup_trigram_ratio"]:
        assert list(mine[col]) == list(oracle[col]), col
    # spot values: doc 1 is all one word; doc 2 has 7 trigrams, 3 distinct
    m = mine.set_index("doc_id")
    assert m.loc[1, "top_word_ratio"] == 1.0
    assert m.loc[1, "distinct_ratio"] == 1.0 / 6.0
    assert m.loc[2, "dup_trigram_ratio"] == 4.0 / 7.0
    assert m.loc[3, "dup_trigram_ratio"] == 0.0
    assert m.loc[4, "dup_trigram_ratio"] == 0.0
    assert m.loc[5, "n_words"] == 0


PII_ROWS = pa.table({
    "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
    "text": [
        "contact alice@example.com or bob.smith+x@sub.domain.org today",
        "server at 10.0.0.1, backup 192.168.001.255; port 1.2.3.4.5",
        "call 555-123-4567 or 555.123.4567 x89",
        "no pii in this document at all 1234",
        "mixed a@b.co 8.8.8.8 911-555-0000",
    ],
})


def test_pii_scan_matches_duckdb():
    """Cross-engine parity of the RE2 PII patterns (pyarrow
    count_substring_regex vs DuckDB regexp_extract_all) on docs that
    actually contain PII — the corpus itself is PII-free, so the
    driver's oracle green alone would be a weak (all-zero) check."""
    from pdfextract_ray.pipelines.queries import _pii_sql
    con = duckdb.connect()
    con.register("documents", PII_ROWS)
    mine = T.pii_scan_batch(PII_ROWS).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    oracle = con.sql(_pii_sql()).df() \
        .sort_values("doc_id").reset_index(drop=True)
    for col in ["n_emails", "n_ipv4", "n_phones"]:
        assert list(mine[col]) == list(oracle[col]), col
    m = mine.set_index("doc_id")
    assert m.loc[1, "n_emails"] == 2
    assert m.loc[2, "n_ipv4"] >= 2
    assert m.loc[3, "n_phones"] == 2
    assert (m.loc[4] == 0).all()


def test_vocab_coverage_matches_duckdb():
    """VocabCoverage batch kernel vs the full two-pass SQL (the SQL
    derives top-V itself; the Python side derives it with the same
    (count desc, word asc) tie-break)."""
    from collections import Counter

    from pdfextract_ray.pipelines.queries import (_VOCAB_COVERAGE_SQL,
                                                  _VOCAB_TOP_V)
    rows = pa.table({
        "doc_id": pa.array(list(range(1, 7)), pa.int64()),
        "text": [
            "the cat sat on the mat",
            "the dog ate the cat food",
            "zebra xylophone quartz jumble vortex",
            "the the the rare rare word",
            "on on on cat dog mat food sat ate word",
            "",
        ],
    })
    counts: Counter = Counter()
    for t in rows["text"].to_pylist():
        counts.update(T.ascii_words(t.lower()))
    vocab = [w for w, _ in sorted(counts.items(),
                                  key=lambda kv: (-kv[1], kv[0]))][:_VOCAB_TOP_V]
    mine = T.VocabCoverage(vocab)(rows).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", rows)
    oracle = con.sql(_VOCAB_COVERAGE_SQL).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(mine["n_words"]) == list(oracle["n_words"])
    assert list(mine["coverage"]) == list(oracle["coverage"])
    m = mine.set_index("doc_id")
    assert m.loc[3, "coverage"] == 0.0        # all out-of-vocab
    assert m.loc[6, "coverage"] == 0.0        # empty doc
    assert 0.0 < m.loc[1, "coverage"] <= 1.0


def test_stratified_sample_formula_matches_duckdb():
    from pdfextract_ray.pipelines.queries import (_STRATA_MULT,
                                                  _STRATA_RATES,
                                                  _STRATIFIED_SAMPLE_SQL)
    rows = pa.table({
        "doc_id": pa.array(list(range(0, 400)), pa.int64()),
        "lang": [["en", "de", "fr", "zh"][i % 4] for i in range(400)],
        "n_chars": pa.array([i * 3 for i in range(400)], pa.int64()),
    })
    kept = {
        i for i in range(400)
        if (i * _STRATA_MULT) % 97 < (_STRATA_RATES["en"] if i % 4 == 0
                                      else _STRATA_RATES["default"])
    }
    con = duckdb.connect()
    con.register("documents", rows)
    oracle = set(con.sql(_STRATIFIED_SAMPLE_SQL).df()["doc_id"])
    assert oracle == kept
    # en stratum is downsampled relative to the rest
    en_rate = len([i for i in kept if i % 4 == 0]) / 100
    other_rate = len([i for i in kept if i % 4 != 0]) / 300
    assert en_rate < other_rate


def test_repetition_and_coverage_fuzz_parity():
    """Hypothesis fuzz: repetition_batch and VocabCoverage match their
    DuckDB mirrors on random docs over an adversarial alphabet (exotic
    whitespace included — the known cross-engine failure class is
    tokenizer divergence, see the ascii_words contract)."""
    from collections import Counter

    from hypothesis import given, settings as hsettings, strategies as st

    from pdfextract_ray.pipelines.queries import (_DOC_REPETITION_SQL,
                                                  _VOCAB_COVERAGE_SQL,
                                                  _VOCAB_TOP_V)

    word = st.text(alphabet="abc1.\xa0\x1c", min_size=1, max_size=4)
    sep = st.sampled_from([" ", "\t", "\n", "\v", "\f", "\r", "  "])
    doc = st.lists(st.tuples(word, sep), min_size=0, max_size=25) \
        .map(lambda ps: "".join(w + s for w, s in ps))

    @hsettings(max_examples=60, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=6))
    def check(texts):
        rows = pa.table({
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": texts,
        })
        con = duckdb.connect()
        con.register("documents", rows)

        mine = T.repetition_batch(rows).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        oracle = con.sql(_DOC_REPETITION_SQL).df() \
            .sort_values("doc_id").reset_index(drop=True)
        for col in ["n_words", "distinct_ratio", "top_word_ratio",
                    "dup_trigram_ratio"]:
            assert list(mine[col]) == list(oracle[col]), (col, texts)

        counts: Counter = Counter()
        for t in texts:
            counts.update(T.ascii_words(t.lower()))
        vocab = [w for w, _ in sorted(counts.items(),
                                      key=lambda kv: (-kv[1], kv[0]))][:_VOCAB_TOP_V]
        cov = T.VocabCoverage(vocab)(rows).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        cov_oracle = con.sql(_VOCAB_COVERAGE_SQL).df() \
            .sort_values("doc_id").reset_index(drop=True)
        assert list(cov["n_words"]) == list(cov_oracle["n_words"]), texts
        assert list(cov["coverage"]) == list(cov_oracle["coverage"]), texts

    check()


def test_lm_score_matches_duckdb_including_oov():
    """LmScore vs the full two-pass SQL mirror, with the top-V cap
    small enough that real OOV tokens occur (V=3 over a larger
    vocabulary)."""
    from collections import Counter

    from pdfextract_ray.stages.textstats import (LmScore,
                                                 lm_micronats_from_counts)
    rows = pa.table({
        "doc_id": pa.array(list(range(1, 6)), pa.int64()),
        "text": [
            "the cat and the dog and the cat",
            "the rare xylophone",
            "cat dog cat dog and",
            "",
            "unseen words only here",
        ],
    })
    counts: Counter = Counter()
    for t in rows["text"].to_pylist():
        counts.update(T.ascii_words(t.lower()))
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    words = [w for w, _ in top]
    mn = lm_micronats_from_counts([n for _, n in top], sum(counts.values()))
    mine = LmScore((words, mn))(rows).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    from pdfextract_ray.pipelines.queries import _DOC_LM_SCORE_SQL
    sql = _DOC_LM_SCORE_SQL.replace("LIMIT 30000", "LIMIT 3")
    con = duckdb.connect()
    con.register("documents", rows)
    oracle = con.sql(sql).df().sort_values("doc_id").reset_index(drop=True)
    for col in ["n_words", "n_oov", "lm_micronats"]:
        assert list(mine[col]) == list(oracle[col]), col
    m = mine.set_index("doc_id")
    assert m.loc[4, "n_words"] == 0 and m.loc[4, "lm_micronats"] == 0
    assert m.loc[5, "n_oov"] == m.loc[5, "n_words"]   # fully OOV
    assert m.loc[1, "lm_micronats"] > 0


def test_lm_buckets_semantics(ray_session):
    """CCNet perplexity buckets: every head-doc score <= every
    tail-doc score (with middle between), unscored == zero in-vocab
    tokens, and the full output is deterministic."""
    from pdfextract_ray.pipelines.queries import q_lm_buckets
    sf = "/root/testdata/sf0.001"
    out = q_lm_buckets(sf).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert set(out["ppl_bucket"]) <= {"head", "middle", "tail",
                                      "unscored"}
    scored = out[out.ppl_bucket != "unscored"].copy()
    assert len(scored) > 0
    scored["score"] = scored.lm_micronats / scored.n_scored
    hs = scored[scored.ppl_bucket == "head"]["score"]
    ms = scored[scored.ppl_bucket == "middle"]["score"]
    ts = scored[scored.ppl_bucket == "tail"]["score"]
    if len(hs) and len(ms):
        assert hs.max() <= ms.min()
    if len(ms) and len(ts):
        assert ms.max() <= ts.min()
    assert (out[out.ppl_bucket == "unscored"].n_scored == 0).all()
    out2 = q_lm_buckets(sf).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert out.equals(out2)
