"""Per-shard checkpoint manifests for resumable corpus runs.

Output layout (SURVEY.md §4.2 "Checkpoint / resume"):

    out_dir/
      shard=0007/*.parquet        one directory per resume shard
      _manifests/shard-0007.json  written AFTER the shard's data is
                                  durable (atomic tmp+rename)
      _metrics/shard-0007.json    per-partition lineage metrics

A shard is a contiguous range of ``partition_id`` values (the crc32(url)
hash space), so membership is computable from the input row alone — a
resumed run filters input rows by done-shard membership inside
``map_batches`` with a broadcast frozenset (an anti-join whose small
side is at most the shard count; no shuffle).

At 10^12-doc scale the shard count bounds both the resume granularity
and the manifest read cost; it is a knob, not a constant.
"""

from __future__ import annotations

import json
import os


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifests")


def metrics_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_metrics")


def shard_data_dir(out_dir: str, shard: int) -> str:
    return os.path.join(out_dir, "shard=%04d" % shard)


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp.%d" % os.getpid()
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
        # fsync BEFORE the rename: os.replace orders the directory
        # entry, not the file data — a crash could otherwise leave a
        # durable name pointing at truncated bytes, permanently marking
        # an incomplete shard as done
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def write_shard_manifest(out_dir: str, shard: int, payload: dict) -> None:
    d = manifest_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    _atomic_write_json(os.path.join(d, "shard-%04d.json" % shard), payload)


def write_shard_metrics(out_dir: str, shard: int, payload: dict | list) -> None:
    d = metrics_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    _atomic_write_json(os.path.join(d, "shard-%04d.json" % shard),
                       payload if isinstance(payload, dict) else {"partitions": payload})


def done_shards(out_dir: str) -> set[int]:
    """Shard ids with a VALID manifest. Filename alone is not proof of
    completion — an unparseable/truncated manifest (crash between data
    write and a non-durable rename on old kernels, manual tampering)
    means the shard must re-run, not be skipped forever."""
    return set(read_manifests(out_dir))


def read_manifests(out_dir: str) -> dict[int, dict]:
    """Parse every valid shard manifest; tolerate strays the same way
    done_shards does (a shard-0001-bak.json backup or a 0-byte file is
    skipped, never a crash — the two walkers must agree)."""
    d = manifest_dir(out_dir)
    out = {}
    if not os.path.isdir(d):
        return out
    for name in sorted(os.listdir(d)):
        if name.startswith("shard-") and name.endswith(".json"):
            try:
                shard = int(name[6:-5])
                with open(os.path.join(d, name), encoding="utf-8") as f:
                    out[shard] = json.load(f)
            except (ValueError, json.JSONDecodeError):
                continue
    return out


def canonical_table_md5(table) -> str:
    """Content hash of an Arrow table's ROWS, stable across slicing and
    retries: serializing a SLICED table via IPC keeps the original
    buffer offsets, so byte-identical rows arriving at different block
    positions would hash differently — rebuild with fresh zero-based
    buffers first. Used for content-keyed output names (retry
    idempotence) and null-key dedup sentinels."""
    import hashlib

    import pyarrow as pa

    canon = pa.Table.from_pylist(table.to_pylist(), schema=table.schema)
    buf = pa.BufferOutputStream()
    with pa.ipc.new_stream(buf, canon.schema) as w:
        w.write_table(canon)
    return hashlib.md5(buf.getvalue().to_pybytes()).hexdigest()
