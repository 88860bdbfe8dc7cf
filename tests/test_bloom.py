"""Incremental Bloom-filter dedup (stages/bloom.py).

Covers: parameter sizing, probe-bit mechanics, the no-false-negative
guarantee (every planted duplicate is bloom-positive), exact-verify
parity with a brute-force old∪new hash comparison, the unverified
(FP-rate-bounded) mode, and the precomputed-hash-snapshot path."""

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from pdfextract_ray.stages import bloom as B


def _table(rows):
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string())})


def test_bloom_params_monotone_and_bounded():
    m1, k1 = B.bloom_params(1_000, 0.01)
    m2, k2 = B.bloom_params(1_000_000, 0.01)
    assert m2 > m1 and m1 >= 8192
    assert (m1 & (m1 - 1)) == 0 and (m2 & (m2 - 1)) == 0
    assert 1 <= k1 <= 16 and 1 <= k2 <= 16
    # tighter fp -> more bits
    m3, _ = B.bloom_params(1_000_000, 0.0001)
    assert m3 > m2
    # cap: astronomically large n never exceeds the broadcast bound
    m4, _ = B.bloom_params(10**12, 0.01)
    assert m4 <= B._M_BITS_CAP


def test_probe_set_and_test_roundtrip():
    m_bits, k = 1 << 16, 7
    rng = np.random.RandomState(7)
    h = rng.randint(0, 2**63, size=200, dtype=np.int64).view(np.uint64)
    bitmap = np.zeros(m_bits // 8, np.uint8)
    B._set_bits(bitmap, B.probe_positions(h[:100], m_bits, k))
    hit = B._test_bits(bitmap, B.probe_positions(h, m_bits, k))
    assert hit[:100].all()            # inserted keys always hit
    assert not hit[100:].all()        # fresh keys mostly miss


def test_incremental_dedup_exact(ray_session):
    old_rows = [(i, f"existing corpus document {i}") for i in range(400)]
    new_rows = [(1000 + i, f"fresh delivery document {i}")
                for i in range(100)]
    new_rows += [(2000 + i, f"existing corpus document {i * 3}")
                 for i in range(30)]                       # dups of old
    new_rows += [(3000 + i, f"delivery twin {i // 3}") for i in range(9)]
    old, new = ray.data.from_arrow(_table(old_rows)), \
        ray.data.from_arrow(_table(new_rows))

    res = B.dedup_incremental(new, old_docs=old, fp_rate=0.01) \
        .to_pandas().sort_values("doc_id")
    # brute force
    old_md5 = {hashlib.md5(t.encode()).hexdigest() for _, t in old_rows}
    first = {}
    for i, t in sorted(new_rows):
        first.setdefault(hashlib.md5(t.encode()).hexdigest(), i)
    for r in res.itertuples():
        md5 = hashlib.md5(dict(new_rows)[r.doc_id].encode()).hexdigest()
        assert r.md5 == md5
        assert r.dup_vs_old == (md5 in old_md5), r.doc_id
        assert r.first_in_new == (first[md5] == r.doc_id), r.doc_id
        assert r.keep == (not r.dup_vs_old and r.first_in_new)
        if md5 in old_md5:            # no false negatives, ever
            assert r.bloom_positive
    assert res.keep.sum() == 100 + 3  # fresh + one per twin triple


def test_unverified_mode_overflags_only(ray_session):
    """verify=False: dup_vs_old == bloom_positive — may over-flag at
    the FP rate but never under-flags a true duplicate."""
    old = ray.data.from_arrow(_table(
        [(i, f"base doc {i}") for i in range(200)]))
    new = ray.data.from_arrow(_table(
        [(500 + i, f"base doc {i}") for i in range(50)] +
        [(900 + i, f"novel doc {i}") for i in range(50)]))
    res = B.dedup_incremental(new, old_docs=old, verify=False).to_pandas()
    assert (res.dup_vs_old == res.bloom_positive).all()
    assert res[res.doc_id < 900].dup_vs_old.all()


def test_hash_snapshot_path_equivalent(ray_session):
    """Passing a precomputed (md5, h64) snapshot must give the same
    verdicts as hashing old_docs on the fly — the production path that
    avoids re-hashing 100 TB per delivery."""
    old = ray.data.from_arrow(_table(
        [(i, f"snapshot doc {i}") for i in range(150)]))
    new = ray.data.from_arrow(_table(
        [(700 + i, f"snapshot doc {i * 2}") for i in range(40)] +
        [(800 + i, f"unseen doc {i}") for i in range(40)]))
    snap = B.hash_docs(old).materialize()
    a = B.dedup_incremental(new, old_hashes=snap).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = B.dedup_incremental(new, old_docs=old).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    assert a.dup_vs_old.sum() == 40


def test_observed_fp_rate_bounded(ray_session):
    """With n sized for 1% FP, 2000 fresh probes should see a small
    positive count (loose 5x bound — deterministic corpus, no flake)."""
    old = ray.data.from_arrow(_table(
        [(i, f"fp base {i}") for i in range(2000)]))
    new = ray.data.from_arrow(_table(
        [(10_000 + i, f"fp probe {i}") for i in range(2000)]))
    res = B.dedup_incremental(new, old_docs=old, fp_rate=0.01,
                              verify=True).to_pandas()
    assert res.bloom_positive.sum() <= 100   # ~20 expected at 1%
    assert not res.dup_vs_old.any()          # verify clears every FP
    assert res.keep.all()


def test_empty_sides_are_safe(ray_session):
    """Empty OLD corpus (first-ever delivery) and empty NEW delivery
    both work — Ray 2.49 drops schema/columns on all-empty datasets in
    several places, each guarded."""
    empty = ray.data.from_arrow(_table([]))
    new = ray.data.from_arrow(_table([(1, "first ever doc")]))
    res = B.dedup_incremental(new, old_docs=empty).to_pandas()
    assert res.keep.tolist() == [True]
    assert not res.dup_vs_old.any()

    old = ray.data.from_arrow(_table([(1, "existing doc")]))
    res2 = B.dedup_incremental(empty, old_docs=old).to_pandas()
    assert len(res2) == 0


def test_incremental_dedup_randomized_sweep(ray_session):
    """Property sweep: 4 random old/new corpus pairs (random sizes,
    random planted overlap and internal-dup rates, random fp targets)
    — verdicts must match the brute-force set comparison on every
    one, and bloom positives must superset the true duplicates."""
    for trial in range(4):
        rng = np.random.RandomState(3000 + trial)
        n_old = int(rng.randint(50, 400))
        n_new = int(rng.randint(20, 200))
        n_dup = int(rng.randint(0, min(n_old, n_new)))
        fp = float(rng.choice([0.001, 0.01, 0.05]))
        old_rows = [(i, f"t{trial} old {i}") for i in range(n_old)]
        new_rows = [(10_000 + i, f"t{trial} new {i}")
                    for i in range(n_new - n_dup)]
        picks = rng.choice(n_old, size=n_dup, replace=False)
        new_rows += [(20_000 + j, f"t{trial} old {int(p)}")
                     for j, p in enumerate(picks)]
        old = ray.data.from_arrow(_table(old_rows))
        new = ray.data.from_arrow(_table(new_rows))
        res = B.dedup_incremental(new, old_docs=old, fp_rate=fp) \
            .to_pandas()
        old_md5 = {hashlib.md5(t.encode()).hexdigest()
                   for _, t in old_rows}
        text_of = dict(new_rows)
        for r in res.itertuples():
            md5 = hashlib.md5(text_of[r.doc_id].encode()).hexdigest()
            assert r.dup_vs_old == (md5 in old_md5), (trial, r.doc_id)
            if md5 in old_md5:
                assert r.bloom_positive, (trial, r.doc_id)
        assert res.dup_vs_old.sum() == n_dup, trial
