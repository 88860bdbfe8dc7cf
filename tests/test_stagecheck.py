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


@pytest.mark.usefixtures("ray_session")
def test_empty_stage_output_survives(tmp_path):
    """Ray's parquet sink deletes an empty output dir; the stage must
    still checkpoint (one schema-ful empty file) and replay as empty."""
    import ray.data
    ckpt = str(tmp_path / "c")

    import pyarrow.compute as pc

    def empty_fn():
        # arrow-level filter: schema survives the empty result
        return ray.data.from_arrow(_tbl([1, 2])).map_batches(
            lambda t: t.filter(pc.greater(t["x"], 99)),
            batch_format="pyarrow")

    out = StagedRun(ckpt, {}).stage("s", empty_fn).to_pandas()
    assert len(out) == 0
    with open(_stage_manifest(ckpt, "s")) as f:
        assert json.load(f)["rows"] == 0
    # replay (no recompute) still yields the empty result; the schema
    # is durable in the placeholder parquet (checked there — Ray 2.49
    # to_pandas() on an all-empty dataset drops columns, the known trap)
    out2 = StagedRun(ckpt, {}).stage(
        "s", lambda: (_ for _ in ()).throw(AssertionError("re-ran"))
    ).to_pandas()
    assert len(out2) == 0
    import glob

    import pyarrow.parquet as pq
    files = glob.glob(os.path.join(_stage_dir(ckpt, "s"), "*.parquet"))
    assert files and "x" in pq.read_schema(files[0]).names

    # row-based empty whose schema is unknowable: still checkpoints
    # (zero-column placeholder) and replays as 0 rows
    def empty_rows():
        return ray.data.from_arrow(_tbl([1, 2])).filter(
            lambda r: r["x"] > 99)

    out3 = StagedRun(ckpt, {}).stage("t", empty_rows).to_pandas()
    assert len(out3) == 0
    out4 = StagedRun(ckpt, {}).stage(
        "t", lambda: (_ for _ in ()).throw(AssertionError("re-ran"))
    ).to_pandas()
    assert len(out4) == 0


def test_none_dir_is_passthrough():
    run = StagedRun(None, {"whatever": True})
    assert run.stage("s", lambda: 42) == 42


def test_fingerprint_mismatch_refused(tmp_path):
    ckpt = str(tmp_path / "c")
    StagedRun(ckpt, {"a": 1})
    with pytest.raises(SystemExit):
        StagedRun(ckpt, {"a": 2})