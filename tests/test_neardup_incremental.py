"""Incremental MinHash near-dup vs a corpus snapshot (stages/neardup.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from pdfextract_ray.stages.neardup import (neardup_incremental,
                                           neardup_matches, signatures)

_WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
          "lambda mu nu xi omicron pi rho sigma tau upsilon").split()


def _doc(rng, n=60):
    return " ".join(_WORDS[rng.randint(len(_WORDS))] for _ in range(n))


def _perturb(text, rng, k=2):
    """Change k words — a near-duplicate, not an exact one."""
    words = text.split()
    for _ in range(k):
        words[rng.randint(len(words))] = "zzz%d" % rng.randint(10)
    return " ".join(words)


@pytest.fixture(scope="module")
def corpora():
    rng = np.random.RandomState(42)
    old_texts = [_doc(rng) for _ in range(30)]
    old = pa.table({
        "doc_id": pa.array(np.arange(30), pa.int64()),
        "text": pa.array(old_texts, pa.string())})
    # new delivery: ids 100.. — 5 near-dups of old docs 0..4, 10 fresh,
    # plus a new-vs-new near-dup pair (ids 115/116) that must NOT flag
    fresh = [_doc(rng) for _ in range(10)]
    nn = _doc(rng)
    new_texts = [_perturb(old_texts[i], rng) for i in range(5)] + \
        fresh + [nn, _perturb(nn, rng)]
    new = pa.table({
        "doc_id": pa.array(np.arange(100, 100 + len(new_texts)), pa.int64()),
        "text": pa.array(new_texts, pa.string())})
    return old, new


def test_matches_find_planted_neardups(ray_session, corpora):
    old, new = corpora
    m = neardup_matches(ray.data.from_arrow(new),
                        old_docs=ray.data.from_arrow(old)) \
        .to_pandas().set_index("new_id")
    for i in range(5):
        assert 100 + i in m.index, i
        assert m.loc[100 + i, "old_id"] == i
        assert m.loc[100 + i, "est_jaccard"] >= 0.5
    # fresh docs and the new-vs-new pair never match the snapshot
    assert not set(m.index) & set(range(105, 117))


def test_verdicts_cover_every_delivery_row(ray_session, corpora):
    old, new = corpora
    v = neardup_incremental(ray.data.from_arrow(new),
                            old_docs=ray.data.from_arrow(old)) \
        .to_pandas().set_index("doc_id")
    assert len(v) == len(new)
    assert set(v.index[v["near_dup_of_old"]]) == set(range(100, 105))
    assert v["keep"].equals(~v["near_dup_of_old"])
    assert v.loc[101, "matched_old_id"] == 1
    assert v.loc[110, "matched_old_id"] is None \
        or np.isnan(v.loc[110, "matched_old_id"])


def test_signature_snapshot_path_equals_recompute(ray_session, corpora,
                                                  tmp_path):
    old, new = corpora
    sig_dir = str(tmp_path / "sigs")
    signatures(ray.data.from_arrow(old)).write_parquet(sig_dir)
    via_docs = neardup_incremental(
        ray.data.from_arrow(new), old_docs=ray.data.from_arrow(old)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    via_sigs = neardup_incremental(
        ray.data.from_arrow(new),
        old_sigs=ray.data.read_parquet(sig_dir)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert via_docs.equals(via_sigs)


def test_new_sigs_path_equals_new_docs(ray_session, corpora):
    """A precomputed DELIVERY snapshot (new_sigs) yields the identical
    verdict table to banding the raw delivery text."""
    old, new = corpora
    via_docs = neardup_incremental(
        new_docs=ray.data.from_arrow(new),
        old_docs=ray.data.from_arrow(old)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    via_sigs = neardup_incremental(
        new_sigs=signatures(ray.data.from_arrow(new)),
        old_docs=ray.data.from_arrow(old)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert via_docs.equals(via_sigs)


def test_neither_new_side_raises(ray_session, corpora):
    old, _ = corpora
    with pytest.raises(ValueError, match="new_docs or new_sigs"):
        neardup_matches(old_docs=ray.data.from_arrow(old))


def test_forced_join_tier_equals_broadcast(ray_session, corpora):
    old, new = corpora
    broad = neardup_incremental(ray.data.from_arrow(new),
                                old_docs=ray.data.from_arrow(old)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    joined = neardup_incremental(ray.data.from_arrow(new),
                                 old_docs=ray.data.from_arrow(old),
                                 max_broadcast=0) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(broad["doc_id"]) == list(joined["doc_id"])
    assert list(broad["near_dup_of_old"]) == list(joined["near_dup_of_old"])
    assert list(broad["keep"]) == list(joined["keep"])


def test_no_matches_at_impossible_threshold(ray_session, corpora):
    old, new = corpora
    v = neardup_incremental(ray.data.from_arrow(new),
                            old_docs=ray.data.from_arrow(old),
                            threshold=1.01).to_pandas()
    assert len(v) == len(new)
    assert not v["near_dup_of_old"].any()
    assert v["keep"].all()


def test_exact_copy_estimates_one(ray_session, corpora):
    old, _ = corpora
    copy = pa.table({"doc_id": pa.array([500], pa.int64()),
                     "text": pa.array([old["text"][3].as_py()],
                                      pa.string())})
    m = neardup_matches(ray.data.from_arrow(copy),
                        old_docs=ray.data.from_arrow(old)).to_pandas()
    assert len(m) == 1
    assert m.iloc[0]["old_id"] == 3
    assert m.iloc[0]["est_jaccard"] == 1.0
