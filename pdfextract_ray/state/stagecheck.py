"""Stage-level checkpoint runner for multi-stage curation CLIs.

``run_extract`` already has per-SHARD manifests (state/manifest.py);
this is the same durability contract one level up, for pipelines
composed of several expensive stages (extract → filter → dedup →
representatives) that previously re-ran from scratch on any failure
(round-4 verdict item #5).

Layout, mirroring the shard-manifest design:

    ckpt_dir/
      _RUN.json                    run fingerprint (args + input), written
                                   first; a resume with a DIFFERENT
                                   fingerprint is refused outright —
                                   silently mixing outputs of two
                                   configurations is corruption
      stage-<name>/*.parquet       one directory per completed stage
                                   (dash, not "=": a hive-style name
                                   would be parsed as a partition key
                                   on read-back and inject a bogus
                                   column)
      _manifests/stage-<name>.json written atomically (tmp+fsync+rename)
                                   AFTER the stage's parquet is durable

Semantics:

- a stage with a valid manifest is SKIPPED: its parquet is read back
  lazily (``ray.data.read_parquet``) and fed to the next stage — no
  recompute, clean lineage;
- a stage directory WITHOUT a manifest is a crashed partial write: it
  is deleted and the stage re-runs (data-without-manifest is the same
  poison as in run_extract);
- resume-equals-fresh is the contract a test pins: interrupting after
  any stage and rerunning yields byte-identical final output.

Scale note: checkpoint parquet doubles as the stage boundary's
spill-to-storage — on a real cluster point ``ckpt_dir`` at shared
storage and a re-submitted ``ray job`` resumes where the last one
died. The manifest read cost is O(#stages), trivial.
"""

from __future__ import annotations

import json
import os
import shutil

from pdfextract_ray.state.manifest import _atomic_write_json

_RUN_NAME = "_RUN.json"


def _stage_dir(ckpt_dir: str, name: str) -> str:
    return os.path.join(ckpt_dir, "stage-%s" % name)


def _stage_manifest(ckpt_dir: str, name: str) -> str:
    return os.path.join(ckpt_dir, "_manifests", "stage-%s.json" % name)


class StagedRun:
    """Checkpointed execution of named Dataset→Dataset stages.

    >>> run = StagedRun("/ckpt", {"cmd": "curate", "corpus": "..."})
    >>> ds = run.stage("prep", lambda: build_prep())
    >>> out = run.stage("curate", lambda: curate(ds))

    With ``ckpt_dir=None`` every stage just runs (no checkpointing) —
    the zero-cost default path for CLIs."""

    def __init__(self, ckpt_dir: str | None, fingerprint: dict):
        self.ckpt_dir = ckpt_dir
        self.resumed: list[str] = []
        if ckpt_dir is None:
            return
        os.makedirs(ckpt_dir, exist_ok=True)
        run_path = os.path.join(ckpt_dir, _RUN_NAME)
        fp = json.loads(json.dumps(fingerprint, sort_keys=True))
        if os.path.exists(run_path):
            with open(run_path, encoding="utf-8") as f:
                old = json.load(f)
            if old != fp:
                raise SystemExit(
                    "checkpoint dir %s belongs to a different run "
                    "configuration:\n  recorded: %s\n  current:  %s\n"
                    "use a fresh --checkpoint-dir (mixing configurations "
                    "would silently corrupt the output)"
                    % (ckpt_dir, json.dumps(old, sort_keys=True),
                       json.dumps(fp, sort_keys=True)))
        else:
            _atomic_write_json(run_path, fp)

    def stage(self, name: str, fn):
        """Return the stage's Dataset: replayed from checkpoint when a
        valid manifest exists, else computed via ``fn()``, persisted,
        manifested, and read back."""
        import ray.data

        if self.ckpt_dir is None:
            return fn()
        sdir = _stage_dir(self.ckpt_dir, name)
        mpath = _stage_manifest(self.ckpt_dir, name)
        if os.path.exists(mpath):
            try:
                with open(mpath, encoding="utf-8") as f:
                    json.load(f)
                self.resumed.append(name)
                return ray.data.read_parquet(sdir)
            except json.JSONDecodeError:
                pass  # truncated manifest: treat as crashed, re-run
        if os.path.isdir(sdir):
            # data without a manifest = crashed partial write
            shutil.rmtree(sdir)
        ds = fn()
        ds.write_parquet(sdir)
        if not os.path.isdir(sdir):
            # Ray's parquet sink DELETES a directory it created when
            # the write turns out empty (same trap _ensure_written
            # covers): materialize the stage contract with one empty
            # schema-ful file so the replay read works
            import pyarrow as pa
            import pyarrow.parquet as pq
            sch = ds.schema(fetch_if_missing=True)
            if sch is None:
                # schema unknowable (consumed row-based empty):
                # zero-column placeholder — replay still yields 0 rows
                base = pa.schema([])
            else:
                base = getattr(sch, "base_schema", None)
                if not isinstance(base, pa.Schema):
                    # Ray Schema .types can be numpy dtypes (see
                    # relational.anti_filter note) — convert each
                    fields = []
                    for nm, tp in zip(sch.names, sch.types):
                        if not isinstance(tp, pa.DataType):
                            tp = pa.from_numpy_dtype(tp)
                        fields.append(pa.field(nm, tp))
                    base = pa.schema(fields)
            os.makedirs(sdir, exist_ok=True)
            pq.write_table(base.empty_table(),
                           os.path.join(sdir, "empty.parquet"))
        os.makedirs(os.path.dirname(mpath), exist_ok=True)
        # count from the durable files, not the (consumed) dataset
        rows = ray.data.read_parquet(sdir).count()
        _atomic_write_json(mpath, {"stage": name, "rows": int(rows)})
        return ray.data.read_parquet(sdir)
