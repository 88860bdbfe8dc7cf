"""Optional SVM section classifier (libsvm c_svc/RBF inference).

The reference ships a 2-class RBF model over 5 section features and a
``Score.reference?`` predicate (``references/score.rb:11-26``, features
1..5 = letter_ratio, name_ratio, year_ratio, cap_ratio, lateness), but
the call site is DISABLED in the live path ("TODO Enable classification
once we have a reasonable model", ``references/references.rb:210-211``)
— so this stage is optional and off by default, matching the reference.

This is a from-scratch numpy implementation of libsvm's c_svc decision
function (public libsvm model format): f(x) = Σ coef_i·K(sv_i, x) − rho,
K(u,v) = exp(−γ‖u−v‖²); 2-class prediction = label[0] if f(x) > 0 else
label[1]. The model file is NOT copied from the reference (its binary
blob is absent anyway); tests train nothing — they pin inference against
hand-computed decision values on a tiny synthetic model.

As a Ray stage: ``SvmSectionScorer`` is an actor-pool callable that
loads the model once per actor (the analogue of the process-global
``@@reference_model``, score.rb:11).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

FEATURES = ("letter_ratio", "name_ratio", "year_ratio", "cap_ratio", "lateness")


class LibsvmModel:
    """Minimal parser + decision function for libsvm c_svc models."""

    def __init__(self, gamma: float, rho: float, labels: tuple[int, int],
                 coefs: np.ndarray, svs: np.ndarray) -> None:
        self.gamma = gamma
        self.rho = rho
        self.labels = labels
        self.coefs = coefs          # (n_sv,)
        self.svs = svs              # (n_sv, dim)

    @classmethod
    def parse(cls, text: str, dim: int = len(FEATURES)) -> "LibsvmModel":
        header: dict[str, str] = {}
        lines = text.strip().splitlines()
        i = 0
        while i < len(lines) and lines[i].strip() != "SV":
            key, _, val = lines[i].partition(" ")
            header[key.strip()] = val.strip()
            i += 1
        if header.get("svm_type") != "c_svc" or header.get("kernel_type") != "rbf":
            raise ValueError("only c_svc/rbf models supported")
        gamma = float(header["gamma"])
        rho = float(header["rho"].split()[0])
        labels = tuple(int(x) for x in header["label"].split())[:2]
        coefs, svs = [], []
        for line in lines[i + 1:]:
            parts = line.split()
            if not parts:
                continue
            coefs.append(float(parts[0]))
            vec = np.zeros(dim)
            for kv in parts[1:]:
                idx, _, val = kv.partition(":")
                vec[int(idx) - 1] = float(val)
            svs.append(vec)
        return cls(gamma, rho, labels, np.array(coefs), np.stack(svs))

    def decision(self, x: np.ndarray) -> np.ndarray:
        """x: (n, dim) → decision values (n,)."""
        d2 = ((x[:, None, :] - self.svs[None, :, :]) ** 2).sum(axis=2)
        k = np.exp(-self.gamma * d2)
        return k @ self.coefs - self.rho

    def predict(self, x: np.ndarray) -> np.ndarray:
        d = self.decision(x)
        return np.where(d > 0, self.labels[0], self.labels[1])


class SvmSectionScorer:
    """Actor-pool stage: section-feature rows → +svm_decision, +is_reference."""

    def __init__(self, model_text: str) -> None:
        self.model = LibsvmModel.parse(model_text)

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = np.stack([batch[f].to_numpy(zero_copy_only=False).astype(np.float64)
                      for f in FEATURES], axis=1)
        x = np.nan_to_num(x, nan=0.0)
        d = self.model.decision(x)
        pred = self.model.predict(x)
        # score.rb:25 — reference? == (predict > 0)
        return batch.append_column("svm_decision", pa.array(np.round(d, 9))) \
                    .append_column("is_reference", pa.array(pred > 0))
