"""Trainable quality classifier (stages/classifier.py): deterministic
SGD, teacher-label distillation, actor scoring stage, CLI."""

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pdfextract_ray.stages.classifier import (FEATURES, Z_CLIP,
                                              QualityScorer, features_row,
                                              gopher_labels, load_model,
                                              save_model, score_quality,
                                              train_logreg)


def _scores(m, X):
    Z = np.clip((X - np.asarray(m["mean"])) / np.asarray(m["std"]),
                -Z_CLIP, Z_CLIP)
    return 1 / (1 + np.exp(-(Z @ np.asarray(m["weights"]) + m["bias"])))

GOOD = ("The old stone house stands near the river and the trees. "
        "It has been there for many years with little change. "
        "People walk past it every day and admire the quiet view. "
        "That road leads to the market in the old town. " * 2)
JUNK = "#### 1234 5678 !!!! 9999 $$$ 0000 ## 1111 2222 %% " * 8


def _corpus(n=80):
    rng = np.random.RandomState(7)
    texts, labels = [], []
    for i in range(n):
        if i % 2 == 0:
            # prose-like: shuffle sentences, stays high quality
            texts.append(GOOD + " extra words number %d here" % i)
            labels.append(1.0)
        else:
            texts.append(JUNK + "%d" % rng.randint(10))
            labels.append(0.0)
    return texts, np.asarray(labels)


def test_train_deterministic():
    texts, y = _corpus()
    X = np.asarray([features_row(s) for s in texts])
    m1 = train_logreg(X, y)
    m2 = train_logreg(X.copy(), y.copy())
    assert m1 == m2
    assert m1["features"] == list(FEATURES)


def test_learns_separable_quality():
    texts, y = _corpus()
    X = np.asarray([features_row(s) for s in texts])
    m = train_logreg(X, y)
    p = _scores(m, X)
    acc = ((p >= 0.5) == (y >= 0.5)).mean()
    assert acc >= 0.95, acc
    # and generalizes the obvious direction on unseen probes
    pg, pj = _scores(m, np.asarray([features_row(GOOD),
                                    features_row(JUNK)]))
    assert pg > pj


def test_gopher_teacher_labels_distill():
    """Distilling the rule cascade: gopher labels on the same corpus
    give a model that agrees with the teacher on the clear cases."""
    texts, _ = _corpus()
    y = gopher_labels(texts)
    assert 0 < y.mean() < 1  # both classes present
    X = np.asarray([features_row(s) for s in texts])
    m = train_logreg(X, y)
    p = _scores(m, X)
    assert (((p >= 0.5) == (y >= 0.5)).mean()) >= 0.9


def test_save_load_roundtrip_and_feature_guard(tmp_path):
    texts, y = _corpus(20)
    X = np.asarray([features_row(s) for s in texts])
    m = train_logreg(X, y, epochs=2)
    path = tmp_path / "m.json"
    save_model(m, path)
    assert load_model(path) == m
    bad = dict(m, features=["wrong"])
    bad_path = tmp_path / "bad.json"
    with open(bad_path, "w") as f:
        json.dump(bad, f)
    with pytest.raises(ValueError):
        load_model(bad_path)


def test_features_row_contracts():
    assert features_row(None) == [0.0] * len(FEATURES)
    assert features_row("") == [0.0] * len(FEATURES)
    v = features_row("The cat sat.")
    assert len(v) == len(FEATURES) and v[0] > 0


@pytest.mark.usefixtures("ray_session")
def test_ray_scoring_stage_matches_driver():
    import ray.data
    texts, y = _corpus(40)
    X = np.asarray([features_row(s) for s in texts])
    model = train_logreg(X, y)
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = score_quality(ray.data.from_arrow(t), model).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want = _scores(model, X)
    assert np.allclose(out["quality_score"], np.round(want, 9))
    assert (out["pred_keep"].to_numpy() == (want >= 0.5)).all()


@pytest.mark.usefixtures("ray_session")
def test_cli_train_then_score(tmp_path):
    from pdfextract_ray.__main__ import main

    texts, _ = _corpus(60)
    src = str(tmp_path / "docs.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}), src)
    model_p = str(tmp_path / "model.json")
    assert main(["train-quality", src, "--out", model_p]) == 0
    m = load_model(model_p)
    assert m["features"] == list(FEATURES)

    out = str(tmp_path / "scored")
    assert main(["score-quality", src, "--model", model_p,
                 "--out", out]) == 0
    t = pq.read_table(glob.glob(os.path.join(out, "*.parquet"))) \
        .sort_by("doc_id")
    assert t.column_names == ["doc_id", "quality_score", "pred_keep"]
    assert len(t) == len(texts)
    df = t.to_pandas()
    # teacher agreement on the clear planted cases
    y = gopher_labels(texts)
    assert ((df["pred_keep"].to_numpy() == (y >= 0.5)).mean()) >= 0.9

    # custom labels path: inverted labels flip the learned direction
    lab_p = str(tmp_path / "labels.parquet")
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "label": pa.array([1.0 - v for v in y], pa.float64())}), lab_p)
    model2_p = str(tmp_path / "model2.json")
    assert main(["train-quality", src, "--out", model2_p,
                 "--labels", lab_p]) == 0
    m2 = load_model(model2_p)
    # inverted teacher -> inverted ordering of the two clear probes
    pg, pj = _scores(m2, np.asarray([features_row(GOOD),
                                     features_row(JUNK)]))
    assert pj > pg
    # and the scoring stage loads from a path too
    enc = QualityScorer(model_path=model2_p)
    out2 = enc(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array([GOOD, JUNK], pa.string())})).to_pandas()
    assert bool(out2.loc[1, "pred_keep"]) and not bool(out2.loc[0, "pred_keep"])