"""Mixture sampling + token packing (stages/assemble.py)."""

import numpy as np
import pyarrow as pa
import ray.data

from pdfextract_ray.stages import assemble as A


def test_mixture_rates_max_retention():
    counts = {"web": 1000, "books": 1000}
    rates = A.mixture_rates(counts, {"web": 3, "books": 1})
    # binding source web is fully used; books downsampled to hold 25%
    assert rates["web"] == 1.0
    assert abs(rates["books"] - 1 / 3) < 1e-12
    # a source without a target is excluded outright
    rates2 = A.mixture_rates({"web": 10, "spam": 99}, {"web": 1.0})
    assert rates2 == {"web": 1.0, "spam": 0.0}
    # a targeted source with zero rows doesn't break the others
    rates3 = A.mixture_rates({"web": 100}, {"web": 1, "books": 1})
    assert rates3["web"] == 1.0
    assert A.mixture_rates({}, {"web": 1.0}) == {}


def test_mixture_sample_hits_target_and_is_deterministic(ray_session):
    n = 6000
    rng = np.random.RandomState(3)
    srcs = rng.choice(["web", "books", "code"], size=n,
                      p=[0.70, 0.20, 0.10])
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "source": pa.array(srcs, pa.string())}))
    targets = {"web": 0.5, "books": 0.3, "code": 0.2}
    out = A.mixture_sample(docs, targets).to_pandas()
    kept = out[out.keep]
    got = kept.source.value_counts(normalize=True)
    # code (~600 docs for a 20% share) binds: expect ~3000 kept
    assert len(kept) > 2000
    for s, p in targets.items():
        assert abs(got[s] - p) < 0.05, (s, got[s])
    out2 = A.mixture_sample(docs, targets).to_pandas()
    assert out.sort_values("doc_id").keep.tolist() == \
        out2.sort_values("doc_id").keep.tolist()


def test_pack_batch_invariants():
    rng = np.random.RandomState(11)
    toks = rng.randint(50, 3000, size=500).astype(np.int64)
    toks[7] = 10_000                       # oversized singleton
    t = pa.table({"doc_id": pa.array(range(500), pa.int64()),
                  "n_tokens": pa.array(toks, pa.int64())})
    out = A.pack_batch(t, budget=8192)
    assert sorted(out["doc_id"].to_pylist()) == list(range(500))
    import collections
    by_pack = collections.defaultdict(list)
    for d, tk, pid, ptk, ov in zip(*[out[c].to_pylist() for c in
                                     out.column_names]):
        by_pack[pid].append((d, tk, ptk, ov))
    for pid, members in by_pack.items():
        total = sum(tk for _, tk, _, _ in members)
        assert all(ptk == total for _, _, ptk, _ in members)
        assert pid == min(d for d, _, _, _ in members)
        if total > 8192:                   # only oversized singletons
            assert len(members) == 1 and members[0][3]
    # FFD on uniform(50,3000) should fill packs well
    full = [sum(tk for _, tk, _, _ in m) for m in by_pack.values()]
    assert np.mean([f for f in full if f <= 8192]) > 0.7 * 8192


def test_pack_documents_streams_and_covers(ray_session):
    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"])

    def with_tokens(t: pa.Table) -> pa.Table:
        toks = [len((x or "").split()) for x in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "n_tokens": pa.array(toks, pa.int64())})

    sized = docs.map_batches(with_tokens, batch_format="pyarrow")
    out = A.pack_documents(sized, budget=4096).to_pandas()
    assert len(out) == 500                     # every doc exactly once
    assert out.doc_id.is_unique
    ok = out[~out.oversized]
    assert (ok.groupby("pack_id").n_tokens.sum() <= 4096).all()
    # pack_id is globally unique across batches (min doc_id of pack)
    assert (out.groupby("pack_id").doc_id.min()
            == out.groupby("pack_id").pack_id.first()).all()


def test_cli_sample_mixture_and_pack(ray_session, tmp_path):
    import glob
    import os

    import pyarrow.parquet as pq

    from pdfextract_ray.__main__ import main

    n = 400
    rng = np.random.RandomState(5)
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "source": pa.array(rng.choice(["web", "code"], n, p=[0.8, 0.2]),
                           pa.string()),
        "n_tokens": pa.array(rng.randint(50, 900, n), pa.int64()),
    })
    src = str(tmp_path / "docs.parquet")
    pq.write_table(tbl, src)

    out_m = str(tmp_path / "mix")
    assert main(["sample-mixture", src, "--target", "web=1",
                 "--target", "code=1", "--out", out_m]) == 0
    m = pq.read_table(glob.glob(os.path.join(out_m, "*.parquet")))
    kept = m.to_pandas().query("keep")
    frac_web = (kept.source == "web").mean()
    assert abs(frac_web - 0.5) < 0.1

    out_p = str(tmp_path / "packs")
    assert main(["pack", src, "--budget", "2048", "--out", out_p]) == 0
    t = pq.read_table(glob.glob(os.path.join(out_p, "*.parquet"))) \
        .to_pandas()
    assert len(t) == n and t.doc_id.is_unique
    assert (t[~t.oversized].groupby("pack_id").n_tokens.sum()
            <= 2048).all()


def test_pack_exact_budget_doc_is_not_oversized():
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "n_tokens": pa.array([2048, 2049, 100], pa.int64())})
    out = A.pack_batch(t, budget=2048).to_pandas().set_index("doc_id")
    assert not out.loc[1, "oversized"]          # == budget: perfect fill
    assert out.loc[2, "oversized"]              # strictly over
    assert out.loc[1, "pack_tokens"] == 2048
