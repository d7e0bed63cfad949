"""Stage-boundary checkpoint manifests with per-partition lineage + counters.

The reference reruns everything from scratch (no checkpointing at all —
SURVEY.md §4); the north rule requires the opposite: every stage writes
partitioned Parquet plus a manifest of completed partitions so a
re-submitted job skips finished work.

Design: output root contains one directory per stage
(``<root>/<stage>/bucket=<k>/``) and a ``<root>/MANIFEST.json``
(atomically replaced via temp-file rename) recording, per stage and
per bucket: row count, input lineage (source paths + bucket id), and
completion flag.  Resume = read manifest, process only missing
buckets; writes go to a temp dir then rename, so partially-written
buckets are never marked complete.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile


class Manifest:
    def __init__(self, root: str):
        self.root = root
        self.path = os.path.join(root, "MANIFEST.json")
        self.data: dict = {"stages": {}}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.data = json.load(f)

    def stage(self, name: str) -> dict:
        return self.data["stages"].setdefault(name, {"buckets": {}, "counters": {}})

    def done_buckets(self, stage: str) -> set[int]:
        return {int(k) for k, v in self.stage(stage)["buckets"].items() if v.get("complete")}

    def mark_bucket(self, stage: str, bucket: int, rows: int, lineage: dict | None = None) -> None:
        self.stage(stage)["buckets"][str(bucket)] = {
            "complete": True,
            "rows": rows,
            "lineage": lineage or {},
        }
        self._flush()

    def add_counter(self, stage: str, name: str, value: float) -> None:
        counters = self.stage(stage)["counters"]
        counters[name] = counters.get(name, 0) + value
        self._flush()

    def stage_complete(self, stage: str, n_buckets: int) -> bool:
        return len(self.done_buckets(stage)) >= n_buckets

    def _flush(self) -> None:
        os.makedirs(self.root, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self.root, prefix=".manifest-")
        with os.fdopen(fd, "w") as f:
            json.dump(self.data, f, indent=2, sort_keys=True)
        os.replace(tmp, self.path)


def bucket_dir(root: str, stage: str, bucket: int) -> str:
    return os.path.join(root, stage, f"bucket={bucket}")


def write_bucket_atomic(table, root: str, stage: str, bucket: int) -> int:
    """Write one bucket's Arrow table to parquet via temp-dir rename; returns rows."""
    import pyarrow.parquet as pq

    final = bucket_dir(root, stage, bucket)
    parent = os.path.dirname(final)
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=parent, prefix=f".bucket-{bucket}-")
    pq.write_table(table, os.path.join(tmp, "part-0.parquet"))
    if os.path.exists(final):
        shutil.rmtree(final)
    os.replace(tmp, final)
    return table.num_rows
