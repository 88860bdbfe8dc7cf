"""End-to-end training-data curation recipe — every assembly stage
composed over one corpus, Dataset-to-Dataset (the 100-TB pipeline
story; also pins the inter-stage schema contracts so a column rename
in any stage fails HERE, not in a user's pipeline):

  raw (doc_id, url, text, source)
    → clean-text            (text hygiene)
    → redact-pii            (mask scrub; audited no-op here)
    → clean-lines / gopher  (C4 + Gopher quality verdicts)
    → url dedup filter      (drop same-canonical-URL pages)
    → domain cap            (per-registrable-domain page quota)
    → exact dedup keep-set  (Bloom incremental, self-bootstrap)
    → near-dup vs snapshot  (MinHash LSH against the old corpus)
    → duplicate-span removal (substring-level clean)
    → decontamination scan  (external eval suite)
    → mixture sample        (target source proportions)
    → token packing         (training shards)
    → shard assignment      (seeded scatter for the export)
"""

import numpy as np
import pyarrow as pa
import ray.data

from pdfextract_ray.stages.assemble import mixture_sample, pack_documents
from pdfextract_ray.stages.bloom import dedup_incremental
from pdfextract_ray.stages.clean import clean_documents
from pdfextract_ray.stages.dedup import decontaminate_corpus
from pdfextract_ray.stages.spans import remove_duplicate_spans
from pdfextract_ray.stages.urls import url_dedup_filter

VOCAB = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lam mu nu xi omicron pi rho sigma tau upsilon").split()


def _text(n, seed):
    rng = np.random.RandomState(seed)
    return " ".join(VOCAB[i] for i in rng.randint(0, len(VOCAB), n))


def test_full_curation_recipe(ray_session):
    span = " ".join(f"c{i}" for i in range(24))
    eval_text = " ".join(f"e{i}" for i in range(30))
    rows = []
    for i in range(40):
        rows.append((i, "http://site%d.com/p" % i,
                     _text(60 + i % 7, i), "web"))
    # URL-variant dup of doc 0 (same page, tracking param)
    rows.append((100, "http://site0.com/p?utm_source=x",
                 _text(60, 0), "web"))
    # exact-text dup of doc 1 at a different URL
    rows.append((101, "http://mirror.org/1", _text(61, 1), "web"))
    # two docs sharing a 24-word span
    rows.append((102, "http://b.org/x", _text(30, 900) + " " + span, "books"))
    rows.append((103, "http://b.org/y", span + " " + _text(25, 901), "books"))
    # a doc contaminated with the eval suite + control chars
    rows.append((104, "http://b.org/z",
                 eval_text + "\x00" + _text(20, 902), "books"))
    # a near-duplicate (2 words changed) of a doc in the OLD corpus
    # snapshot — the incremental near-dup stage must catch it
    old_text = _text(70, 777)
    near = old_text.split()
    near[5], near[40] = "qqq1", "qqq2"
    rows.append((105, "http://fresh.io/nd", " ".join(near), "web"))
    for i in range(10):
        rows.append((200 + i, "http://code.net/%d" % i,
                     _text(40, 950 + i), "code"))
    # one genuinely high-quality English page: the ONLY doc that
    # passes the C4 line rules AND the Gopher gate below
    good = ("The old stone house stands near the river and the trees. "
            "It has been there for many years with little change. "
            "People walk past it every day and admire the view. "
            "That quiet road leads to the market in the town. "
            "Everyone agrees that the place has a calm beauty. "
            "The seasons come and go but the walls have stayed strong.")
    rows.append((300, "http://prose.example/good", good, "web"))

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "url": pa.array([r[1] for r in rows], pa.string()),
        "text": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
    }))

    # 1. hygiene: control chars vanish, other columns ride through
    cleaned = clean_documents(docs)
    # 1b. PII scrub composes in the same pass shape; nothing planted,
    #     so it must be an audited no-op (then drop the audit column)
    from pdfextract_ray.stages.pii import redact_pii
    scrubbed = redact_pii(cleaned).materialize()
    assert (scrubbed.to_pandas()["n_redactions"] == 0).all()
    cleaned = scrubbed.map_batches(
        lambda t: t.drop_columns(["n_redactions"]),
        batch_format="pyarrow")
    # 1c. quality verdict stages: only the planted prose page passes
    #     the C4 line rules and the Gopher gate (run as annotators
    #     here — the synthetic corpus would otherwise empty out)
    from pdfextract_ray.stages.gopher import gopher_filter
    from pdfextract_ray.stages.lines import clean_lines
    lv = clean_lines(cleaned).to_pandas().set_index("doc_id")
    assert bool(lv.loc[300, "keep"])
    assert not lv.drop(index=300)["keep"].any()
    gv = gopher_filter(cleaned, annotate=True).to_pandas() \
        .set_index("doc_id")
    assert bool(gv.loc[300, "keep"])
    assert not gv.drop(index=300)["keep"].any()
    # 1d. trainable quality scorer: distill the gopher verdicts above
    #     into the from-scratch logistic regression (driver-side
    #     seeded SGD) and score the SAME corpus distributed — the
    #     planted prose page must out-score every word-soup page
    from pdfextract_ray.stages.classifier import (features_row,
                                                  score_quality,
                                                  train_logreg)
    cdf = cleaned.to_pandas().sort_values("doc_id")
    Xq = np.asarray([features_row(s) for s in cdf["text"]])
    yq = gv.loc[cdf["doc_id"]]["keep"].to_numpy().astype(float)
    model = train_logreg(Xq, yq)
    scored = score_quality(cleaned, model).to_pandas() \
        .set_index("doc_id")
    assert scored.loc[300, "quality_score"] == scored["quality_score"].max()
    # 1e. per-line language segmentation composes in the same pass
    #     shape; every corpus doc here is single-line, so keep-majority
    #     must be a text-preserving no-op (idempotence base case)
    from pdfextract_ray.stages.langlines import keep_majority_lines
    seg = keep_majority_lines(cleaned).materialize()
    a = seg.to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = cleaned.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(a["text"]) == list(b["text"])
    assert list(a.columns) == list(b.columns)
    # 1f. SemDeDup verdicts over the corpus: every doc gets a verdict
    #     row and no semantic cell exceeds its cap
    from pdfextract_ray.stages.semsample import semantic_sample_verdicts
    sv = semantic_sample_verdicts(cleaned, cap_per_cell=10, n_cells=16,
                                  dedup_cos=0.95).to_pandas()
    assert len(sv) == cleaned.count()
    assert (sv[sv.keep].groupby("cell").size() <= 10).all()
    # 2. URL dedup: the utm variant of doc 0 drops (min-url keeps 0's)
    by_url = url_dedup_filter(cleaned)
    # 2b. per-domain quota: code.net has 10 pages; cap 5 keeps the
    #     lexicographically smallest urls /0../4 (b.org's 3 pages and
    #     every single-page site are untouched)
    from pdfextract_ray.stages.domains import domain_cap_filter_by_url
    capped = domain_cap_filter_by_url(by_url, cap=5)
    capped_ids = set(capped.to_pandas()["doc_id"])
    assert set(range(200, 205)) <= capped_ids
    assert not capped_ids & set(range(205, 210))
    assert {102, 103, 104, 105} <= capped_ids
    by_url = capped
    # 3. exact dedup via the incremental op bootstrapped on itself:
    #    keep = first_in_new flags within one corpus (old side empty)
    empty = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    by_url = by_url.materialize()
    verdicts = dedup_incremental(by_url, old_docs=empty).to_pandas()
    keep_ids = set(verdicts[verdicts.keep].doc_id)
    assert 101 not in keep_ids and 1 in keep_ids   # exact dup dropped
    assert 100 not in set(verdicts.doc_id)         # url dup never scanned
    import pyarrow.compute as pc
    import ray as _ray
    keep_ref = _ray.put(pa.array(sorted(keep_ids), pa.int64()))

    def keep_batch(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["doc_id"],
                                 value_set=_ray.get(keep_ref)))

    exact = by_url.map_batches(keep_batch, batch_format="pyarrow")
    # 3b. near-dup vs the OLD corpus snapshot: doc 105 (2 words off a
    #     snapshot doc) drops; everything else survives
    from pdfextract_ray.stages.neardup import neardup_incremental
    old_snap = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([9000], pa.int64()),
        "text": pa.array([old_text], pa.string())}))
    exact = exact.materialize()
    nd = neardup_incremental(exact, old_docs=old_snap).to_pandas()
    nd_drop = set(nd.loc[nd["near_dup_of_old"], "doc_id"])
    assert nd_drop == {105}
    nd_ref = _ray.put(pa.array(sorted(nd_drop), pa.int64()))
    exact = exact.map_batches(
        lambda t: t.filter(pc.invert(pc.is_in(
            t["doc_id"], value_set=_ray.get(nd_ref)))),
        batch_format="pyarrow")
    # 4. substring-level span removal (16-word windows inside the
    #    24-word shared run) — doc 102 (first) keeps it, 103 loses it
    despanned = remove_duplicate_spans(
        exact.select_columns(["doc_id", "text"]), shard_mask=31)
    span_out = despanned.to_pandas().set_index("doc_id")
    assert span_out.loc[103, "n_removed"] >= 24
    assert span_out.loc[102, "n_removed"] == 0
    # 5. decontamination against an external eval suite
    eval_ds = ray.data.from_arrow(pa.table({
        "text": pa.array([eval_text], pa.string())}))
    clean_texts = despanned.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"],
                            "text": t["clean_text"]}),
        batch_format="pyarrow").materialize()
    contam = decontaminate_corpus(clean_texts, eval_ds).to_pandas()
    bad = set(contam[contam.is_contaminated].doc_id)
    assert bad == {104}
    bad_ref = _ray.put(pa.array(sorted(bad), pa.int64()))
    survivors = clean_texts.map_batches(
        lambda t: t.filter(pc.invert(pc.is_in(
            t["doc_id"], value_set=_ray.get(bad_ref)))),
        batch_format="pyarrow")
    # 6. mixture to 50/30/20 web/books/code — needs source back;
    #    a (doc_id → source) broadcast is test-sized here
    src_of = {r[0]: r[3] for r in rows}
    with_src = survivors.map_batches(
        lambda t: t.append_column("source", pa.array(
            [src_of[d] for d in t["doc_id"].to_pylist()], pa.string())),
        batch_format="pyarrow")
    mixed = mixture_sample(with_src,
                           {"web": 0.5, "books": 0.3, "code": 0.2})
    sampled = mixed.to_pandas()
    assert sampled.keep.any()
    # 7. token packing of the kept docs
    kept = mixed.map_batches(lambda t: t.filter(t["keep"]),
                             batch_format="pyarrow")
    sized = kept.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array([len(x.split())
                                  for x in t["text"].to_pylist()],
                                 pa.int64())}),
        batch_format="pyarrow")
    packs = pack_documents(sized, budget=256).to_pandas()
    assert len(packs) == int(sampled.keep.sum())
    assert (packs[~packs.oversized].groupby("pack_id")
            .n_tokens.sum() <= 256).all()
    # 8. deterministic shard assignment for the training export
    from pdfextract_ray.stages.shard import assign_shards
    sharded = assign_shards(kept, shards=3, seed=11).to_pandas()
    assert len(sharded) == len(packs)
    assert sharded.shard.between(0, 2).all()
    assert sharded.order_key.is_unique
