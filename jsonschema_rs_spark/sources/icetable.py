"""Iceberg-style table adapter.

In production the engine reads real Iceberg via
``spark.read.format("iceberg")`` and uses snapshot ids + partition
metadata from the catalog. This sandbox has no Iceberg jars (verified:
pyspark 4.1.2 bundles none), so IceTable emulates the three properties
the engine actually depends on, over a plain parquet directory:

- **partitioned layout**: one subdirectory per partition value
  (``part_id=<v>/``, Hive-style, partition-pruned by Spark's reader)
- **snapshot manifest**: an append-only ``_snapshots.json`` log; each
  snapshot lists the partitions visible at that point (Iceberg's
  snapshot → manifest-list indirection, flattened)
- **time travel / incremental reads**: ``read(snapshot_id)`` sees only
  the partitions of that snapshot; ``added_between(a, b)`` yields the
  partitions appended after snapshot ``a`` — the unit of incremental
  (re)validation

The checkpoint/resume machinery (plans/runs.py) is written against this
interface only, so swapping in real Iceberg is a constructor change.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PART_COL = "part_id"


class IceTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    # -- manifest ----------------------------------------------------------

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.path, "_snapshots.json")

    def _load_manifest(self) -> list[dict]:
        if not os.path.exists(self._manifest_path):
            return []
        with open(self._manifest_path) as f:
            return json.load(f)

    def _save_manifest(self, snaps: list[dict]) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snaps, f, indent=1)
        os.replace(tmp, tmp[:-4])  # atomic swap (see _commit_lock for
        # the read-modify-write fence; real Iceberg commits are CAS)

    class _commit_lock:
        """Advisory lock fencing the manifest read-modify-write:
        without it two concurrent append_partitions calls both read the
        same snapshot list and the second os.replace silently drops the
        first writer's snapshot (its data files would be on disk but
        invisible to every read). O_EXCL create + bounded retry; real
        Iceberg uses a compare-and-swap commit instead."""

        def __init__(self, path: str):
            self._p = path + ".lock"

        def __enter__(self):
            for _ in range(600):  # ~60 s
                try:
                    self._fd = os.open(self._p,
                                       os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                    return self
                except FileExistsError:
                    time.sleep(0.1)
            raise TimeoutError(f"manifest lock busy: {self._p}")

        def __exit__(self, *exc):
            os.close(self._fd)
            os.unlink(self._p)

    # -- writes ------------------------------------------------------------

    def append_partitions(self, df: DataFrame, part_expr) -> int:
        """Append rows under their partition value; returns new snapshot
        id. part_expr: Column (or name) giving each row's partition."""
        out = df.withColumn(PART_COL, F.col(part_expr)
                            if isinstance(part_expr, str) else part_expr)
        # manifest values use SPARK's string rendering (cast), not
        # Python str(): str(True)='True' vs the directory/read-back
        # rendering 'true' made boolean partitions permanently
        # invisible to read() — review find. NULL partition values are
        # refused up front (they land in Hive's default-partition dir
        # and no equality filter can address them).
        new_parts = [r["p"] for r in
                     out.select(F.col(PART_COL).cast("string").alias("p"))
                     .distinct().collect()]
        if any(p is None for p in new_parts):
            raise ValueError(
                "append_partitions: NULL partition values are not "
                "supported (unaddressable by partition-pruned reads)")
        # NOTE: the distinct-collect above and the write below evaluate
        # `df` twice — a NON-DETERMINISTIC part_expr could write
        # partitions the manifest never lists; keep partition
        # expressions deterministic (real Iceberg derives its manifest
        # from the committed data files instead)
        out.write.mode("append").partitionBy(PART_COL).parquet(
            os.path.join(self.path, "data"))
        with self._commit_lock(self._manifest_path):
            snaps = self._load_manifest()
            prev = snaps[-1]["partitions"] if snaps else []
            snap_id = (snaps[-1]["snapshot_id"] + 1) if snaps else 1
            snaps.append({
                "snapshot_id": snap_id,
                "ts": time.time(),
                "partitions": sorted(set(prev) | set(new_parts)),
                # informational only (added_between recomputes by set
                # difference so it works across snapshot RANGES)
                "added": sorted(set(new_parts) - set(prev)),
            })
            self._save_manifest(snaps)
        return snap_id

    # -- reads -------------------------------------------------------------

    def current_snapshot(self) -> int | None:
        snaps = self._load_manifest()
        return snaps[-1]["snapshot_id"] if snaps else None

    def partitions(self, snapshot_id: int | None = None) -> list[str]:
        snaps = self._load_manifest()
        if not snaps:
            return []
        if snapshot_id is None:
            return snaps[-1]["partitions"]
        for s in snaps:
            if s["snapshot_id"] == snapshot_id:
                return s["partitions"]
        raise ValueError(f"unknown snapshot {snapshot_id}")

    def added_between(self, after: int | None,
                      until: int | None = None) -> list[str]:
        """Partitions appended after snapshot `after` (exclusive) up to
        `until` (inclusive) — the incremental work list."""
        base = set(self.partitions(after)) if after is not None else set()
        return sorted(set(self.partitions(until)) - base)

    def read(self, snapshot_id: int | None = None,
             partitions: list[str] | None = None) -> DataFrame:
        """Partition-pruned read: the filter on the partition column is
        pushed to the file listing (PartitionFilters in .explain), so a
        resume touching 3 of 10k partitions reads 3 partitions' files.

        ISOLATION NOTE: snapshot scoping is PARTITION-level — rows
        appended into an already-listed partition by a LATER snapshot
        are visible to reads pinned to the earlier snapshot (this
        emulation has no per-file manifests; real Iceberg pins the
        exact file set per snapshot)."""
        df = self.spark.read.parquet(os.path.join(self.path, "data"))
        parts = partitions if partitions is not None \
            else self.partitions(snapshot_id)
        return df.where(F.col(PART_COL).cast("string").isin(parts))
