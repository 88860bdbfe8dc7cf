"""StagedRun (state/stagecheck.py) unit semantics: skip-on-manifest,
crashed-partial re-run, truncated-manifest re-run, no-op mode."""

import json
import os

import pyarrow as pa
import pytest

from pdfextract_ray.state.stagecheck import StagedRun, _stage_dir, \
    _stage_manifest


def _tbl(vals):
    return pa.table({"x": pa.array(vals, pa.int64())})


@pytest.mark.usefixtures("ray_session")
def test_stage_runs_once_then_replays(tmp_path):
    import ray.data
    ckpt = str(tmp_path / "c")
    calls = []

    def fn():
        calls.append(1)
        return ray.data.from_arrow(_tbl([1, 2, 3]))

    r1 = StagedRun(ckpt, {"a": 1})
    out1 = r1.stage("s", fn).to_pandas()
    assert calls == [1] and sorted(out1["x"]) == [1, 2, 3]
    with open(_stage_manifest(ckpt, "s")) as f:
        assert json.load(f)["rows"] == 3

    r2 = StagedRun(ckpt, {"a": 1})
    out2 = r2.stage("s", fn).to_pandas()
    assert calls == [1]            # NOT re-run
    assert r2.resumed == ["s"]
    assert sorted(out2["x"]) == [1, 2, 3]


@pytest.mark.usefixtures("ray_session")
def test_crashed_partial_and_truncated_manifest_rerun(tmp_path):
    import ray.data
    ckpt = str(tmp_path / "c")
    run = StagedRun(ckpt, {})
    run.stage("s", lambda: ray.data.from_arrow(_tbl([7])))

    # truncated manifest -> stage re-runs (and data dir is rebuilt)
    with open(_stage_manifest(ckpt, "s"), "w") as f:
        f.write("{not json")
    calls = []

    def fn2():
        calls.append(1)
        return ray.data.from_arrow(_tbl([8, 9]))

    out = StagedRun(ckpt, {}).stage("s", fn2).to_pandas()
    assert calls == [1] and sorted(out["x"]) == [8, 9]

    # data without manifest (crash between write and manifest) -> rerun
    os.remove(_stage_manifest(ckpt, "s"))
    assert os.path.isdir(_stage_dir(ckpt, "s"))
    out2 = StagedRun(ckpt, {}).stage("s", fn2).to_pandas()
    assert calls == [1, 1] and sorted(out2["x"]) == [8, 9]


def test_none_dir_is_passthrough():
    run = StagedRun(None, {"whatever": True})
    assert run.stage("s", lambda: 42) == 42


def test_fingerprint_mismatch_refused(tmp_path):
    ckpt = str(tmp_path / "c")
    StagedRun(ckpt, {"a": 1})
    with pytest.raises(SystemExit):
        StagedRun(ckpt, {"a": 2})