"""Overlapping-window duplicate-span detection/removal (stages/spans.py).

The brute-force mirror below recomputes the module's documented
semantics from first principles (global window-hash counts, global
first = min (doc_id, widx), coverage masks) and the distributed plans
must match it row-for-row — including a boundary-straddling duplicate
the non-overlapping paragraph unit provably misses."""

import numpy as np
import pyarrow as pa
import ray.data

from pdfextract_ray.stages import spans as S
from pdfextract_ray.stages.textstats import ascii_words

WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu xi omicron pi rho sigma tau upsilon").split()


def _doc(n_words: int, seed: int) -> str:
    rng = np.random.RandomState(seed)
    return " ".join(WORDS[i] for i in rng.randint(0, len(WORDS), n_words))


def _corpus():
    """Planted corpus: a 20-word span copied into the MIDDLE of two
    other docs (straddling their 16-word paragraph boundaries), one
    within-doc repeat, one whole-doc exact dup pair, fresh filler."""
    span = " ".join(f"dup{i}" for i in range(20))
    docs = {
        0: _doc(60, 0) + " " + span + " " + _doc(40, 1),
        1: _doc(51, 2) + " " + span + " " + _doc(33, 3),   # cross-doc copy
        2: _doc(80, 4),
        3: "short exact twin body",
        4: "short exact twin body",                         # whole-doc dup
        5: _doc(30, 5) + " " + span + " tail " + span,      # within-doc too
        6: _doc(45, 6),
    }
    return docs


def _brute(docs: dict[int, str], window: int):
    """(dup_occurrences {(doc,widx):keep}, remove_masks {doc: bool[n]})"""
    occ: list[tuple[int, int, int]] = []   # (doc, widx, h) ordered
    for doc_id in sorted(docs):
        occ.extend((doc_id, w, h) for w, h in
                   S.span_window_hashes(docs[doc_id], window))
    from collections import Counter
    counts = Counter(h for _, _, h in occ)
    firsts = {}
    for doc_id, w, h in sorted(occ):
        if counts[h] >= 2 and h not in firsts:
            firsts[h] = (doc_id, w)
    dup = {(d, w): int(firsts[h] == (d, w))
           for d, w, h in occ if counts[h] >= 2}
    masks = {}
    for doc_id in sorted(docs):
        n = len(ascii_words(docs[doc_id].lower()))
        drop = np.zeros(n, bool)
        keep = np.zeros(n, bool)
        for (d, w), k in dup.items():
            if d != doc_id:
                continue
            (keep if k else drop)[w:min(w + window, n)] = True
        masks[doc_id] = drop & ~keep
    return dup, masks


def _ds(docs):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(sorted(docs), pa.int64()),
        "text": pa.array([docs[k] for k in sorted(docs)], pa.string()),
    }))


def test_window_hashes_short_doc_and_stride():
    assert S.span_window_hashes("", 16) == []
    one = S.span_window_hashes("a b c", 16)
    assert len(one) == 1 and one[0][0] == 0
    n = 40
    text = " ".join(f"w{i}" for i in range(n))
    assert len(S.span_window_hashes(text, 16, stride=1)) == n - 16 + 1
    assert [w for w, _ in S.span_window_hashes(text, 16, stride=8)] \
        == [0, 8, 16, 24]


def test_detection_matches_brute_force(ray_session):
    docs = _corpus()
    window = 16
    dup, masks = _brute(docs, window)
    stats = S.duplicate_span_stats(_ds(docs), window=window,
                                   shard_mask=63).to_pandas() \
        .set_index("doc_id").sort_index()
    # docs with any duplicated occurrence
    expect_docs = sorted({d for d, _ in dup})
    assert list(stats.index) == expect_docs
    # per-doc covered words = merged union of ALL duplicated windows
    for doc_id in expect_docs:
        widxs = np.array([w for (d, w) in dup if d == doc_id])
        spans = S._merge_intervals(widxs, window)
        assert stats.loc[doc_id, "n_dup_spans"] == len(spans)
        assert stats.loc[doc_id, "dup_words"] == sum(e - s for s, e in spans)
    # the planted cross-doc copy was found in docs 0, 1 and 5
    assert {0, 1, 5}.issubset(set(expect_docs))


def test_removal_matches_brute_force(ray_session):
    docs = _corpus()
    window = 16
    _, masks = _brute(docs, window)
    out = S.remove_duplicate_spans(_ds(docs), window=window,
                                   shard_mask=63).to_pandas() \
        .set_index("doc_id").sort_index()
    assert list(out.index) == sorted(docs)
    for doc_id, text in docs.items():
        words = ascii_words(text)
        expect = " ".join(w for w, r in zip(words, masks[doc_id])
                          if not r)
        assert out.loc[doc_id, "clean_text"] == expect, doc_id
        assert out.loc[doc_id, "n_removed"] == int(masks[doc_id].sum())
    # the canonical first copy (doc 0) keeps the span; the cross-doc
    # copy in doc 1 loses at least its 20 copied words (boundary
    # windows can coincide too: the 20-word test vocab makes a
    # filler+span straddle window match across docs with prob 1/20,
    # and it does here — widx 50, one extra word)
    assert "dup0" in out.loc[0, "clean_text"]
    assert out.loc[1, "n_removed"] >= 20
    # idempotence: cleaning the cleaned corpus removes nothing — every
    # surviving span occurrence is the global first of its hashes
    again = {int(r.Index): r.clean_text for r in out.itertuples()}
    out2 = S.remove_duplicate_spans(_ds(again), window=window,
                                    shard_mask=63).to_pandas()
    assert (out2["n_removed"].to_numpy() == 0).all()


def test_removal_no_duplicates_passthrough(ray_session):
    docs = {i: _doc(40 + i, 100 + i) for i in range(5)}
    out = S.remove_duplicate_spans(_ds(docs), window=16,
                                   shard_mask=63).to_pandas() \
        .sort_values("doc_id")
    assert (out["n_removed"] == 0).all()
    for doc_id, text in docs.items():
        row = out[out.doc_id == doc_id].iloc[0]
        assert row.clean_text == " ".join(ascii_words(text))


def test_boundary_straddling_dup_invisible_to_paragraph_unit(ray_session):
    """The raison d'être: a 20-word copy offset so it never aligns
    with a non-overlapping 16-word window in either doc — the C4
    paragraph unit sees 0 duplicated windows, the sliding unit must
    still find the full span."""
    from pdfextract_ray.stages import dedup as D
    span = " ".join(f"uniq{i}" for i in range(20))
    docs = {0: _doc(19, 7) + " " + span + " " + _doc(25, 8),
            1: _doc(23, 9) + " " + span + " " + _doc(21, 10)}
    para_hashes = [D.paragraph_hashes(docs[0]), D.paragraph_hashes(docs[1])]
    assert not set(para_hashes[0]) & set(para_hashes[1])  # blind
    stats = S.duplicate_span_stats(_ds(docs), window=16,
                                   shard_mask=63).to_pandas()
    assert set(stats["doc_id"]) == {0, 1}
    assert (stats["dup_words"] >= 20).all()


def test_stride_catches_phase_aligned_runs(ray_session):
    """stride s catches runs of >= window + s - 1 words whose copies
    are phase-aligned (start offsets congruent mod s) — here starts
    40 and 0, both ≡ 0 (mod 8). Arbitrary-phase copies are a ~1/s
    sample (documented recall dial), hence the aligned construction."""
    span = " ".join(f"s{i}" for i in range(23))   # 23 >= 16 + 8 - 1
    docs = {0: _doc(40, 11) + " " + span,
            1: span + " " + _doc(32, 12)}
    stats = S.duplicate_span_stats(_ds(docs), window=16, stride=8,
                                   shard_mask=63).to_pandas()
    assert set(stats["doc_id"]) == {0, 1}


def test_removal_matches_brute_force_randomized(ray_session):
    """Property sweep: 5 random corpora (random doc counts/lengths,
    randomly planted cross-doc and within-doc copies at random
    offsets, random window sizes) — the distributed removal must equal
    the brute-force semantics on every one."""
    for trial in range(5):
        rng = np.random.RandomState(1000 + trial)
        window = int(rng.choice([8, 16, 24]))
        n_docs = int(rng.randint(4, 10))
        docs = {}
        for d in range(n_docs):
            docs[d] = _doc(int(rng.randint(5, 120)), seed=2000 + 10 * trial + d)
        # plant a copied run into 2-3 docs at random offsets
        run_len = window + int(rng.randint(0, 20))
        run = " ".join(f"t{trial}r{i}" for i in range(run_len))
        for d in rng.choice(n_docs, size=int(rng.randint(2, 4)),
                            replace=False):
            words = docs[int(d)].split()
            pos = int(rng.randint(0, len(words) + 1))
            docs[int(d)] = " ".join(words[:pos] + [run] + words[pos:])
        dup, masks = _brute(docs, window)
        out = S.remove_duplicate_spans(_ds(docs), window=window,
                                       shard_mask=31).to_pandas() \
            .set_index("doc_id").sort_index()
        for doc_id, text in docs.items():
            words = ascii_words(text)
            expect = " ".join(w for w, r in zip(words, masks[doc_id])
                              if not r)
            assert out.loc[doc_id, "clean_text"] == expect, \
                (trial, doc_id)
            assert out.loc[doc_id, "n_removed"] == \
                int(masks[doc_id].sum()), (trial, doc_id)


def test_removal_join_tier_equals_mapside(ray_session, monkeypatch):
    """Forcing the left_outer-join tier (zero _MAPSIDE_DOC_LIMIT) must
    produce exactly the map-side tier's output — both removal ops."""
    from pdfextract_ray.stages import dedup as D
    docs = _corpus()
    a = S.remove_duplicate_spans(_ds(docs), shard_mask=63).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    monkeypatch.setattr(D, "_MAPSIDE_DOC_LIMIT", 0)
    b = S.remove_duplicate_spans(_ds(docs), shard_mask=63).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    texts = {0: "shared window " + " ".join(f"p{i}" for i in range(16)),
             1: " ".join(f"p{i}" for i in range(16)) + " unique tail"}
    pd_docs = _ds(texts)
    monkeypatch.setattr(D, "_MAPSIDE_DOC_LIMIT", 500_000)
    pa_ = D.remove_duplicate_paragraphs(pd_docs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    monkeypatch.setattr(D, "_MAPSIDE_DOC_LIMIT", 0)
    pb = D.remove_duplicate_paragraphs(pd_docs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert pa_.equals(pb)
