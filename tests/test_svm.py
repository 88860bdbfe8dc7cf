"""libsvm c_svc/RBF inference pinned against hand-computed values."""

import math

import numpy as np
import pyarrow as pa

from pdfextract_ray.stages.svm import FEATURES, LibsvmModel, SvmSectionScorer

MODEL = """svm_type c_svc
kernel_type rbf
gamma 0.5
nr_class 2
total_sv 2
rho 0.1
label 1 0
nr_sv 1 1
SV
0.8 1:1.0 2:0.0 3:0.0 4:0.0 5:0.0
-0.6 1:0.0 2:1.0 3:0.0 4:0.0 5:0.0
"""


def test_parse_and_decision_hand_computed():
    m = LibsvmModel.parse(MODEL)
    assert m.gamma == 0.5 and m.rho == 0.1 and m.labels == (1, 0)
    x = np.zeros((1, 5))
    # K(sv1,0) = exp(-0.5*1) for both SVs
    expect = 0.8 * math.exp(-0.5) - 0.6 * math.exp(-0.5) - 0.1
    got = m.decision(x)[0]
    assert abs(got - expect) < 1e-12
    # near sv1 → positive class (label 1)
    x2 = np.array([[1.0, 0, 0, 0, 0]])
    assert m.predict(x2)[0] == 1
    # near sv2 → negative coef dominates → label 0
    x3 = np.array([[0.0, 1.0, 0, 0, 0]])
    assert m.predict(x3)[0] == 0


def test_scorer_stage_over_batch():
    batch = pa.table({
        "letter_ratio": [1.0, 0.0],
        "name_ratio": [0.0, 1.0],
        "year_ratio": [0.0, 0.0],
        "cap_ratio": [0.0, 0.0],
        "lateness": [0.0, float("nan")],  # NaN features default to 0
    })
    out = SvmSectionScorer(MODEL)(batch).to_pandas()
    assert list(out["is_reference"]) == [True, False]
    assert "svm_decision" in out
