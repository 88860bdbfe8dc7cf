"""Dedup operator tests with planted duplicates."""

import numpy as np
import pyarrow as pa
import pytest

from pdfextract_ray.stages import dedup as D

BASE = ("the quick brown fox jumps over the lazy dog while carrying a "
        "large bundle of synthetic training data for the pipeline")
NEAR = ("the quick brown fox jumps over the lazy dog while carrying a "
        "large bundle of synthetic training data for the engine")
OTHER = ("completely different content about distributed columnar "
         "execution engines and their shuffle strategies at scale")


def test_minhash_identical_docs_estimate_one():
    a = D.minhash_signature(BASE)
    b = D.minhash_signature(BASE)
    assert np.array_equal(a, b)


def test_minhash_near_vs_far():
    a = D.minhash_signature(BASE)
    b = D.minhash_signature(NEAR)
    c = D.minhash_signature(OTHER)
    est_ab = (a == b).mean()
    est_ac = (a == c).mean()
    assert est_ab > 0.5
    assert est_ac < 0.2


def test_ngram_jaccard():
    assert D.ngram_jaccard(BASE, BASE) == 1.0
    assert 0.0 < D.ngram_jaccard(BASE, NEAR) < 1.0
    assert D.ngram_jaccard(BASE, OTHER) < 0.05
    assert D.ngram_jaccard("", "") == 1.0


def test_bands_and_bucket_pairs():
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": [BASE, BASE, OTHER]})
    bands = D.minhash_bands_batch(t)
    assert bands.num_rows == 3 * D.NUM_BANDS
    df = bands.to_pandas()
    # identical docs collide in every band; collect pairs across buckets
    pairs = (
        df.groupby(["band_id", "band_hash"], group_keys=False)
        .apply(D.bucket_pairs_group)
        .drop_duplicates(["a", "b"])
    )
    assert [(1, 2)] == list(zip(pairs["a"], pairs["b"]))
    assert pairs["est_jaccard"].iloc[0] == 1.0


def test_connected_components():
    import pandas as pd
    pairs = pd.DataFrame({"a": [1, 2, 10], "b": [2, 3, 11]})
    comp = D.connected_components(pairs)
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10


def test_simhash_near_duplicates_low_hamming():
    ha = D.simhash64(BASE)
    hb = D.simhash64(NEAR)
    hc = D.simhash64(OTHER)
    ham = lambda x, y: bin(x ^ y).count("1")
    assert ham(ha, hb) <= 10
    assert ham(ha, hc) > 10
    assert D.simhash64(BASE) == ha  # deterministic


def test_label_propagation_matches_union_find(ray_session):
    import pandas as pd
    import ray.data
    pairs = pd.DataFrame({"a": [1, 2, 10, 20, 21], "b": [2, 3, 11, 21, 22]})
    ds = ray.data.from_pandas(pairs)
    labels = D.label_propagation_components(ds).to_pandas()
    got = dict(zip(labels["node"], labels["label"]))
    comp = D.connected_components(pairs)
    assert got == comp
    assert got[3] == 1 and got[11] == 10 and got[22] == 20


def test_ray_minhash_pipeline_plants(ray_session):
    """End-to-end over a Ray Dataset with planted dup clusters."""
    import ray.data
    rows = [{"doc_id": i, "text": OTHER + " doc %d" % i} for i in range(20)]
    rows += [{"doc_id": 100, "text": BASE}, {"doc_id": 101, "text": BASE},
             {"doc_id": 102, "text": BASE + " extra"}]
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    bands = ds.map_batches(D.minhash_bands_batch, batch_format="pyarrow")
    pairs = bands.groupby("shard") \
        .map_groups(D.shard_pairs_group, batch_format="pandas").to_pandas()
    pairs = pairs.drop_duplicates(["a", "b"])
    comp = D.connected_components(pairs)
    assert comp.get(100) == 100 and comp.get(101) == 100
    # 102 is near-dup of BASE; should join the same cluster
    assert comp.get(102) == 100


def test_curate_neardup_drops_planted_near_duplicates(ray_session):
    """End-to-end curation composition: exact dupes fold to min url,
    near-dupes (one word changed) cluster and keep one representative."""
    import pyarrow as pa
    import ray.data
    from pdfextract_ray.pipelines.queries import curate_neardup

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon ") * 4
    near = base.replace("sigma", "sigmoid")
    other = ("one two three four five six seven eight nine ten eleven "
             "twelve thirteen fourteen fifteen sixteen seventeen ") * 4
    rows = {
        "url": ["http://a/1", "http://a/2", "http://b/1", "http://c/1"],
        "title": ["T1", "T2", "T3", "T4"],
        "text": [base, base, near, other],   # a/2 exact dup; b/1 near dup
        "lang": ["en"] * 4,
        "n_refs": [1, 1, 1, 1],
        "n_tokens": [100] * 4,
        "error": [None] * 4,
    }
    ds = ray.data.from_arrow(pa.table(rows))
    out = curate_neardup(ds).to_pandas()
    # exact dup a/2 folds into a/1 (min url per text hash); a/1 and b/1
    # form one near-dup cluster keeping its min-hash-id member as
    # representative; c/1 is unrelated and kept
    import hashlib
    rep = min(["http://a/1", "http://b/1"],
              key=lambda u: int.from_bytes(
                  hashlib.md5(u.encode()).digest()[:8], "big") >> 1)
    assert sorted(out["url"]) == sorted([rep, "http://c/1"])


def test_curate_neardup_join_tier_equals_mapside(ray_session, monkeypatch):
    """Forcing the distributed anti/outer-join tier (negative
    _BROADCAST_DROP_LIMIT) must equal the default map-side id filter —
    for both the filtering and the annotating curation variants."""
    import pyarrow as pa
    import ray.data
    from pdfextract_ray.pipelines import queries as Q

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon ") * 4
    near = base.replace("sigma", "sigmoid")
    other = ("one two three four five six seven eight nine ten eleven "
             "twelve thirteen fourteen fifteen sixteen seventeen ") * 4
    rows = {
        "url": ["http://a/1", "http://a/2", "http://b/1", "http://c/1"],
        "title": ["T1", "T2", "T3", "T4"],
        "text": [base, base, near, other],
        "lang": ["en"] * 4,
        "n_refs": [1, 1, 1, 1],
        "n_tokens": [100] * 4,
        "error": [None] * 4,
    }
    ds = ray.data.from_arrow(pa.table(rows))
    a = Q.curate_neardup(ds).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    aa = Q.curate_annotated(ds).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    monkeypatch.setattr(Q, "_BROADCAST_DROP_LIMIT", -1)
    b = Q.curate_neardup(ds).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    bb = Q.curate_annotated(ds).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    assert a.equals(b) and len(a) > 0
    assert aa.equals(bb) and aa.is_representative.sum() == len(a)


def test_simhash_chunked_pairs_equal_brute(monkeypatch):
    """The chunked exact triangle == the brute-force definition on
    clustered hashes — INCLUDING with _PAIR_CHUNK forced tiny so the
    multi-chunk loop actually executes (the suite's corpora never
    exceed one chunk naturally)."""
    import random

    import numpy as np
    import pandas as pd

    import pdfextract_ray.stages.dedup as dd

    rng = random.Random(424242)
    nprng = np.random.RandomState(31337)
    for chunk in (None, 7):   # natural, then forced multi-chunk
        if chunk is not None:
            monkeypatch.setattr(dd, "_PAIR_CHUNK", chunk)
        for trial in range(30):
            n = rng.randint(2, 120)
            bases = nprng.randint(0, 2**63, size=rng.randint(1, 4),
                                  dtype=np.int64).astype(np.uint64)
            hs = []
            for _ in range(n):
                b = int(bases[rng.randrange(len(bases))])
                for _ in range(rng.randint(0, 6)):
                    b ^= 1 << rng.randrange(64)
                hs.append(b)
            ids = list(range(0, 2 * n, 2))
            df = pd.DataFrame({
                "doc_id": ids,
                "simhash": [h - (1 << 64) if h >= (1 << 63) else h
                            for h in hs]})
            got = set(zip(*[dd.simhash_pairs_group(df)[c]
                            for c in ("a", "b")]))
            want = {(ids[i], ids[j])
                    for i in range(n) for j in range(i + 1, n)
                    if bin(hs[i] ^ hs[j]).count("1") <= 3}
            assert got == want, (chunk, trial)


def test_prefix_pairs_chunked_equals_unchunked(monkeypatch):
    """_window_pairs with a tiny _PAIR_CHUNK emits the same candidate
    set as the natural single-chunk run."""
    import random

    import pandas as pd

    import pdfextract_ray.stages.dedup as dd

    rng = random.Random(5150)
    rows = []
    for doc in range(40):
        n = rng.randint(1, 30)
        for pos in range(max(1, n - (4 * n + 4) // 5 + 1)):
            rows.append((rng.randrange(12), doc, n, pos))
    df = pd.DataFrame(rows, columns=["h32", "doc_id", "n", "pos"])
    base = dd.prefix_pairs_shard(df, 4, 5)
    base_set = set(zip(base["a"], base["b"]))
    monkeypatch.setattr(dd, "_PAIR_CHUNK", 3)
    tiny = dd.prefix_pairs_shard(df, 4, 5)
    assert set(zip(tiny["a"], tiny["b"])) == base_set
    assert len(base_set) > 0
