"""Semantic diversity sampling (stages/semsample.py): cap semantics,
determinism, planted-dense-cluster behavior, verdict/apply agreement,
CLI both modes."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from pdfextract_ray.stages.semsample import (semantic_sample_filter,
                                             semantic_sample_verdicts)

BLOB = ("the quick brown fox jumps over the lazy dog again and again "
        "with the same boilerplate text on every mirrored page " * 3)


def _corpus():
    """60 near-identical boilerplate docs (one dense semantic blob) +
    20 distinct docs (sparse cells)."""
    rng = np.random.RandomState(3)
    texts = []
    for i in range(60):
        texts.append(BLOB + " mirror %d" % i)
    vocab = ("zebra quantum banjo glacier orchid nebula walrus aqueduct "
             "pylon ember").split()
    for i in range(20):
        texts.append(" ".join(rng.choice(vocab, 30)) + " unique %d" % i)
    return pa.table({"doc_id": pa.array(range(80), pa.int64()),
                     "text": pa.array(texts, pa.string())})


@pytest.mark.usefixtures("ray_session")
def test_cap_and_dense_blob_downsampled():
    t = _corpus()
    v = semantic_sample_verdicts(ray.data.from_arrow(t), cap_per_cell=5,
                                 n_cells=16, dedup_cos=0.9).to_pandas()
    assert len(v) == 80
    # per-cell cap respected
    per_cell = v[v.keep].groupby("cell").size()
    assert (per_cell <= 5).all()
    # the near-identical boilerplate blob collapses hard under the
    # SemDeDup prune (cos >= 0.9 to a kept doc -> dropped), even
    # though k-means spreads it over several cells
    blob_kept = v[(v.doc_id < 60) & v.keep]
    assert len(blob_kept) <= 16
    # distinct docs survive at a much higher rate than the blob
    uniq_rate = v[(v.doc_id >= 60) & v.keep].shape[0] / 20
    blob_rate = blob_kept.shape[0] / 60
    assert uniq_rate > 2 * blob_rate
    # deterministic
    v2 = semantic_sample_verdicts(ray.data.from_arrow(t), cap_per_cell=5,
                                  n_cells=16, dedup_cos=0.9).to_pandas()
    a = v.sort_values("doc_id").reset_index(drop=True)
    b = v2.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


@pytest.mark.usefixtures("ray_session")
def test_apply_equals_verdicts():
    t = _corpus()
    v = semantic_sample_verdicts(ray.data.from_arrow(t), cap_per_cell=5,
                                 n_cells=16, dedup_cos=0.9).to_pandas()
    kept_ids = set(v[v.keep].doc_id)
    out = semantic_sample_filter(ray.data.from_arrow(t), cap_per_cell=5,
                                 n_cells=16, dedup_cos=0.9).to_pandas()
    assert set(out.doc_id) == kept_ids
    assert list(out.columns) == ["doc_id", "text"]


@pytest.mark.usefixtures("ray_session")
def test_cli_semantic_sample(tmp_path):
    from pdfextract_ray.__main__ import main

    src = str(tmp_path / "docs.parquet")
    pq.write_table(_corpus(), src)
    vd = str(tmp_path / "verdicts")
    assert main(["semantic-sample", src, "--cap-per-cell", "5",
                 "--cells", "16", "--dedup-cos", "0.9",
                 "--out", vd]) == 0
    tv = pq.read_table(glob.glob(os.path.join(vd, "*.parquet")))
    assert sorted(tv.column_names) == ["cell", "dist", "doc_id", "keep"]
    assert tv.num_rows == 80

    ap = str(tmp_path / "applied")
    assert main(["semantic-sample", src, "--cap-per-cell", "5",
                 "--cells", "16", "--dedup-cos", "0.9",
                 "--apply", "--out", ap]) == 0
    ta = pq.read_table(glob.glob(os.path.join(ap, "*.parquet")))
    kept = set(tv.to_pandas().query("keep").doc_id)
    assert set(ta.column("doc_id").to_pylist()) == kept
    # bad cap is a usage error
    with pytest.raises(SystemExit):
        main(["semantic-sample", src, "--cap-per-cell", "0",
              "--out", str(tmp_path / "x")])

@pytest.mark.usefixtures("ray_session")
def test_verdicts_invariant_to_block_layout():
    """Keep verdicts are a pure function of the corpus, not of Ray's
    block boundaries: a heavily repartitioned input yields identical
    verdicts (embedding is per-doc; the cell groupby sees whole
    cells either way)."""
    t = _corpus()
    a = semantic_sample_verdicts(ray.data.from_arrow(t), cap_per_cell=5,
                                 n_cells=16, dedup_cos=0.9).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = semantic_sample_verdicts(
        ray.data.from_arrow(t).repartition(13), cap_per_cell=5,
        n_cells=16, dedup_cos=0.9).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
