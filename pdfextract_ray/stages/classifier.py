"""Trainable document-quality classifier: from-scratch logistic
regression over the engine's quality feature family.

The reference's training loop (``/root/reference/tasks/train.rb``:
compute per-line language ratios, report mean and standard deviation
to hand-tune ideals) is a driver-side statistics pass; this module is
its done-right analogue for corpus curation: the same per-document
feature family, standardized by training-set mean/std (train.rb's
``avgs``/``std_deviations``, kept as model state instead of printed),
feeding a seeded deterministic SGD logistic regression — public
algorithm, numpy only, no sklearn.

Division of labour at 100 TB:

- **training is driver-side over a BOUNDED labeled sample** — labels
  are the scarce resource (human marks or a teacher model's verdicts,
  thousands of rows), so the train set always fits the driver; a
  seeded in-memory SGD is deterministic by construction, which a
  distributed gradient reduce is NOT (float tree-merge order);
- **scoring is the distributed part**: :class:`QualityScorer` is an
  actor-pool ``map_batches`` stage — weights/mean/std land in
  ``__init__`` once per actor, ``__call__`` is one matrix multiply
  per batch.

The bundled label source is the Gopher keep verdict (the
``train-quality`` CLI default; pass ``--labels`` for a (doc_id,
label) parquet): distilling a rule cascade into a linear
scorer is exactly the fineweb-edu-style "teacher labels → fast
student filter" loop, and makes the whole pipeline self-contained —
swap in human labels by passing any (doc_id, label) parquet.

Feature contract (FEATURES order is part of the model format):
log1p(n_words), mean_word_len, stopword_frac, alpha_word_frac,
punct_char_frac, digit_char_frac, upper_char_frac — all cheap
vectorizable per-doc scalars from the shared tokenizer contract.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from pdfextract_ray.stages.gopher import STOPWORDS
from pdfextract_ray.stages.textstats import ascii_words

FEATURES = ("log_n_words", "mean_word_len", "stopword_frac",
            "alpha_word_frac", "punct_char_frac", "digit_char_frac",
            "upper_char_frac")

_PUNCT = set(".,;:!?'\"()[]{}-")
Z_CLIP = 8.0


def features_row(text: str | None) -> list[float]:
    """One doc's feature vector (the per-row kernel; null text → all
    zeros, which the standardizer then centers like any other row)."""
    if not text:
        return [0.0] * len(FEATURES)
    words = ascii_words(text.lower())
    n_w = len(words)
    n_c = len(text)
    if n_w == 0:
        return [0.0] * len(FEATURES)
    mean_len = sum(len(w) for w in words) / n_w
    stop = sum(1 for w in words if w in STOPWORDS) / n_w
    alpha = sum(1 for w in words
                if any(c.isalpha() for c in w)) / n_w
    punct = sum(1 for c in text if c in _PUNCT) / n_c
    digit = sum(1 for c in text if c.isdigit()) / n_c
    upper = sum(1 for c in text if c.isupper()) / n_c
    return [float(np.log1p(n_w)), mean_len, stop, alpha, punct,
            digit, upper]


def features_batch(t: pa.Table, id_col: str = "doc_id",
                   text_col: str = "text") -> pa.Table:
    rows = [features_row(s) for s in t[text_col].to_pylist()]
    mat = np.asarray(rows, dtype=np.float64).reshape(-1, len(FEATURES))
    cols = {id_col: t[id_col]}
    for j, name in enumerate(FEATURES):
        cols[name] = pa.array(mat[:, j], pa.float64())
    return pa.table(cols)


# ------------------------------------------------------------- training

def train_logreg(X: np.ndarray, y: np.ndarray, epochs: int = 40,
                 lr: float = 0.5, l2: float = 1e-4,
                 seed: int = 20260820) -> dict:
    """Seeded deterministic mini-batch SGD logistic regression.

    Standardizes features by the training set's mean/std (stored in
    the model — train.rb's avgs/std_deviations as state), then runs
    ``epochs`` passes in a seeded shuffle order with batch size 64 and
    a 1/sqrt(t) step decay. Returns a JSON-serializable model dict."""
    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    mu = X.mean(axis=0)
    sd = X.std(axis=0)
    # floor, don't just zero-guard: a feature that is NEAR-constant in
    # the training sample (std ~1e-13) would otherwise blow up to
    # astronomic z-scores on any out-of-sample value and drown every
    # other feature; the clip below bounds the damage symmetrically
    sd[sd < 1e-6] = 1.0
    Z = np.clip((X - mu) / sd, -Z_CLIP, Z_CLIP)
    n, d = Z.shape
    w = np.zeros(d)
    b = 0.0
    rng = np.random.RandomState(seed)
    t = 0
    for _ in range(epochs):
        order = rng.permutation(n)
        for start in range(0, n, 64):
            idx = order[start:start + 64]
            zb, yb = Z[idx], y[idx]
            p = 1.0 / (1.0 + np.exp(-(zb @ w + b)))
            g = p - yb
            step = lr / np.sqrt(1.0 + t)
            w -= step * (zb.T @ g / len(idx) + l2 * w)
            b -= step * float(g.mean())
            t += 1
    return {"features": list(FEATURES), "mean": mu.tolist(),
            "std": sd.tolist(), "weights": w.tolist(), "bias": b,
            "seed": seed, "epochs": epochs}


def save_model(model: dict, path) -> None:
    with open(path, "w") as f:
        json.dump(model, f, indent=1, sort_keys=True)


def load_model(path) -> dict:
    with open(path) as f:
        model = json.load(f)
    if tuple(model.get("features", ())) != FEATURES:
        raise ValueError("model feature list %r does not match this "
                         "build's FEATURES %r"
                         % (model.get("features"), list(FEATURES)))
    return model


# -------------------------------------------------------------- scoring

class QualityScorer:
    """Actor-pool scoring stage: model state in ``__init__`` (once per
    actor — from a ``ray.put`` ref or a path), one matmul + sigmoid
    per batch in ``__call__``. Emits (id, quality_score, pred_keep);
    ``threshold`` sets the keep cut (default 0.5)."""

    def __init__(self, model_ref=None, model_path=None,
                 id_col: str = "doc_id", text_col: str = "text",
                 threshold: float = 0.5):
        if model_ref is not None:
            import ray
            model = ray.get(model_ref)
        elif model_path is not None:
            model = load_model(model_path)
        else:
            raise ValueError("need model_ref or model_path")
        self.mu = np.asarray(model["mean"], dtype=np.float64)
        self.sd = np.asarray(model["std"], dtype=np.float64)
        self.w = np.asarray(model["weights"], dtype=np.float64)
        self.b = float(model["bias"])
        self.id_col, self.text_col = id_col, text_col
        self.threshold = threshold

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = [features_row(s) for s in t[self.text_col].to_pylist()]
        X = np.asarray(rows, dtype=np.float64).reshape(-1, len(FEATURES))
        Z = np.clip((X - self.mu) / self.sd, -Z_CLIP, Z_CLIP)
        p = 1.0 / (1.0 + np.exp(-(Z @ self.w + self.b)))
        return pa.table({
            self.id_col: t[self.id_col],
            "quality_score": pa.array(np.round(p, 9), pa.float64()),
            "pred_keep": pa.array(p >= self.threshold, pa.bool_()),
        })


def score_quality(docs, model: dict, id_col: str = "doc_id",
                  text_col: str = "text", threshold: float = 0.5,
                  concurrency=(1, 8)):
    """(id, quality_score, pred_keep) Dataset — the model broadcasts
    ONCE via ray.put; each actor reads it in ``__init__``."""
    import ray
    model_ref = ray.put(model)
    return docs.select_columns([id_col, text_col]).map_batches(
        QualityScorer,
        fn_constructor_kwargs={"model_ref": model_ref, "id_col": id_col,
                               "text_col": text_col,
                               "threshold": threshold},
        batch_format="pyarrow", concurrency=concurrency)


def gopher_labels(texts) -> np.ndarray:
    """Teacher labels from the Gopher rule cascade (keep=1)."""
    from pdfextract_ray.stages.gopher import gopher_rules_batch
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    return np.asarray(gopher_rules_batch(t)["keep"].to_pylist(),
                      dtype=np.float64)
