"""Exact set-similarity self-join (dedup_ngram_jaccard): the
prefix-filter candidate generation must be COMPLETE (the theorem says
two sets with J >= t share a prefix token under any global total
order), and the end-to-end Ray pipeline must equal the brute-force
DuckDB definition.
"""

import random
import zlib

import duckdb
import numpy as np
import pandas as pd
import pytest

from pdfextract_ray.stages.dedup import (_shingle_hashes, prefix_pairs_shard,
                                         prefix_tokens_shard,
                                         shingle_explode_batch,
                                         token_freq_shard)

T_NUM, T_DEN = 4, 5  # t = 0.8, the registered query's threshold


def _local_allpairs(sets: dict[int, set[int]], t_num: int, t_den: int):
    """Drive the three shard stages locally (single shard) over explicit
    shingle-hash sets; return the candidate pair set BEFORE verify."""
    rows = [(d, h) for d, hs in sets.items() for h in hs]
    df = pd.DataFrame({"doc_id": [r[0] for r in rows],
                       "h32": [r[1] for r in rows]})
    with_freq = token_freq_shard(df, shard_mask=0)
    prefixes = prefix_tokens_shard(with_freq, t_num, t_den, shard_mask=0)
    pairs = prefix_pairs_shard(prefixes, t_num, t_den)
    return set(zip(pairs["a"].tolist(), pairs["b"].tolist()))


def _brute_pairs(sets: dict[int, set[int]], t_num: int, t_den: int):
    out = set()
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            sa, sb = sets[a], sets[b]
            u = len(sa | sb)
            if u and len(sa & sb) * t_den >= t_num * u:
                out.add((a, b))
    return out


def test_prefix_filter_complete_random_sets():
    """Candidates ⊇ qualifying pairs on adversarial random universes
    (skewed token frequencies, heavy overlaps, singleton sets)."""
    rng = random.Random(20240817)
    for trial in range(60):
        n_docs = rng.randint(2, 16)
        universe = list(range(rng.randint(3, 40)))
        sets = {}
        for d in range(n_docs):
            k = rng.randint(1, len(universe))
            sets[d] = set(rng.sample(universe, k))
        # plant a pair of exact copies and a superset pair
        sets[n_docs] = set(sets[0])
        sets[n_docs + 1] = set(sets[0]) | {max(universe) + 1}
        cand = _local_allpairs(sets, T_NUM, T_DEN)
        want = _brute_pairs(sets, T_NUM, T_DEN)
        missing = want - cand
        assert not missing, (trial, missing, sets)


def test_hot_token_group_pruned_by_positional_filter():
    """VERDICT r4 adversarial case: >=5k docs sharing one prefix-hot
    token but otherwise dissimilar. The shared hot token lands in every
    doc's prefix (all its other non-rare tokens tie at the same
    frequency), forming one 5000-doc posting group; without the PPJoin
    positional filter that group emits ~12.5M candidate pairs. With it,
    the remaining-token bound (ub = 1 + min(n_a-i-1, n_b-j-1) = 8) is
    below alpha = ceil(0.8*20/1.8) = 9, so the whole group prunes to
    zero — while planted qualifying near-dup pairs are still found
    (completeness), and generation is chunked so the group never
    allocates a quadratic triangle."""
    HOT = [10_000 + i for i in range(8)]   # in every doc -> freq 5000
    sets: dict[int, set[int]] = {}
    for d in range(5000):
        # 2 unique rare tokens + the 8 shared hot tokens -> n = 10
        sets[d] = {20_000 + 2 * d, 20_000 + 2 * d + 1} | set(HOT)
    # plant 5 qualifying near-dup pairs: share one rare token
    # (J = 9/11 ~ 0.818 >= 0.8)
    planted = set()
    for k in range(5):
        a, b = 5000 + 2 * k, 5000 + 2 * k + 1
        shared_rare = 40_000 + 3 * k
        sets[a] = {shared_rare, 40_000 + 3 * k + 1} | set(HOT)
        sets[b] = {shared_rare, 40_000 + 3 * k + 2} | set(HOT)
        planted.add((a, b))
    cand = _local_allpairs(sets, T_NUM, T_DEN)
    assert planted <= cand, planted - cand
    # the 5000-doc hot group contributed nothing: only the planted
    # rare-token groups (plus at most a handful of stragglers) survive
    assert len(cand) <= 20, len(cand)


def test_positional_filter_never_drops_qualifying_pair_dense():
    """Dense randomized completeness sweep aimed at the positional
    filter specifically: universes small enough that docs share many
    tokens at varied positions."""
    rng = random.Random(99)
    for trial in range(40):
        universe = list(range(rng.randint(4, 12)))
        sets = {d: set(rng.sample(universe,
                                  rng.randint(1, len(universe))))
                for d in range(rng.randint(3, 12))}
        cand = _local_allpairs(sets, T_NUM, T_DEN)
        want = _brute_pairs(sets, T_NUM, T_DEN)
        assert want <= cand, (trial, want - cand, sets)


def test_prefix_length_exact_integer_ceil():
    """p = n - ceil(t*n) + 1 with integer math: for t=0.8 the prefix of
    an n-set must still catch a pair at exactly J = t."""
    # two sets sharing exactly 8 of 10 union tokens: J = 8/12... build
    # J exactly 0.8: |∩|=8, |∪|=10 → each set has 9 tokens (8 shared +1)
    a = set(range(8)) | {100}
    b = set(range(8)) | {200}
    assert len(a & b) / len(a | b) == 0.8
    cand = _local_allpairs({1: a, 2: b}, T_NUM, T_DEN)
    assert (1, 2) in cand


def test_length_filter_never_drops_qualifying_pair():
    """den*min >= num*max is necessary for J >= t (J <= min/max)."""
    rng = random.Random(7)
    for _ in range(200):
        na, nb = rng.randint(1, 50), rng.randint(1, 50)
        ni = rng.randint(0, min(na, nb))
        j = ni / (na + nb - ni)
        if j >= T_NUM / T_DEN:
            assert T_DEN * min(na, nb) >= T_NUM * max(na, nb)


def test_explode_batch_distinct_and_sharded():
    import pyarrow as pa
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": ["a b c a b c", ""]})
    out = shingle_explode_batch(t, shard_mask=3)
    df = out.to_pandas()
    # doc 1: shingles {"a b c", "b c a", "c a b"} → 3 distinct hashes
    assert len(df[df.doc_id == 1]) == 3
    # empty text → the single crc32("") = 0 shingle
    assert df[df.doc_id == 2]["h32"].tolist() == [0]
    assert (df["shard"] == (df["h32"] & 3)).all()
    # hashes match the minhash path's shingle space
    assert set(df[df.doc_id == 1]["h32"]) == set(
        int(v) for v in _shingle_hashes("a b c a b c"))


@pytest.mark.usefixtures("ray_session")
def test_ray_ngram_jaccard_equals_bruteforce_oracle():
    """End-to-end at sf0.001: the distributed prefix-filter join finds
    exactly the pairs the brute-force SQL definition does."""
    from pdfextract_ray.pipelines.queries import (_DEDUP_NGRAM_JACCARD_SQL,
                                                  q_dedup_ngram_jaccard)
    sf = "/root/testdata/sf0.001"
    res = q_dedup_ngram_jaccard(sf)
    got = (res.to_pandas() if hasattr(res, "to_pandas") else res)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "read_parquet('%s/documents.parquet')" % sf)
    want = con.sql(_DEDUP_NGRAM_JACCARD_SQL).df()
    got = got.sort_values(["a", "b"]).reset_index(drop=True)
    want = want.sort_values(["a", "b"]).reset_index(drop=True)
    assert len(got) == len(want) and len(want) > 0
    assert got["a"].tolist() == want["a"].tolist()
    assert got["b"].tolist() == want["b"].tolist()
    assert got["jaccard"].tolist() == want["jaccard"].tolist()  # bit-exact


@pytest.mark.usefixtures("ray_session")
def test_pair_text_join_distributed_fallback_equals_broadcast(monkeypatch):
    """Above _BROADCAST_PAIR_LIMIT the verify falls back to the fully
    distributed plan (groupby dedupe + corpus-wide hash joins). Force
    that path by zeroing the limit and require the same verified rows —
    the fallback must never rot unexercised."""
    from pdfextract_ray.pipelines import queries as Q
    sf = "/root/testdata/sf0.001"
    small = Q.q_dedup_ngram_jaccard(sf).to_pandas()
    monkeypatch.setattr(Q, "_BROADCAST_PAIR_LIMIT", 0)
    big = Q.q_dedup_ngram_jaccard(sf).to_pandas()
    small = small.sort_values(["a", "b"]).reset_index(drop=True)
    big = big.sort_values(["a", "b"]).reset_index(drop=True)
    assert len(small) == len(big) > 0
    assert small["a"].tolist() == big["a"].tolist()
    assert small["b"].tolist() == big["b"].tolist()
    assert small["jaccard"].tolist() == big["jaccard"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_pair_join_tier2_equals_mapside_tier1(monkeypatch):
    """Zeroing _BROADCAST_DOC_LIMIT forces the broadcast-pruned JOIN
    tier; its verified rows must equal the default map-side tier's —
    all three tiers of _pair_text_join stay exercised (tier 3 has its
    own fallback test above)."""
    from pdfextract_ray.pipelines import queries as Q
    sf = "/root/testdata/sf0.001"
    mapside = Q.q_dedup_ngram_jaccard(sf).to_pandas()
    monkeypatch.setattr(Q, "_BROADCAST_DOC_LIMIT", 0)
    joined = Q.q_dedup_ngram_jaccard(sf).to_pandas()
    mapside = mapside.sort_values(["a", "b"]).reset_index(drop=True)
    joined = joined.sort_values(["a", "b"]).reset_index(drop=True)
    assert len(mapside) == len(joined) > 0
    assert mapside["a"].tolist() == joined["a"].tolist()
    assert mapside["b"].tolist() == joined["b"].tolist()
    assert mapside["jaccard"].tolist() == joined["jaccard"].tolist()
