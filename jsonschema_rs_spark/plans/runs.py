"""Checkpointed validation runs with per-partition lineage + metrics
(north rule / SURVEY.md §2.9 "Checkpoint/resume").

A run validates an IceTable snapshot partition-by-partition:

- the **metrics table** (`_validation_runs/` parquet) IS the checkpoint:
  one row per (run_id, partition) with pass/fail counts, per-keyword
  violation counts, input-file lineage, and wall time — written only
  after that chunk of partitions completed
- **resume** = anti-join the snapshot's partition list against already-
  recorded (run_id, partition) rows and process only the remainder
- partitions are processed in **chunks**: each chunk is ONE Spark job
  over a partition-pruned scan (not one job per partition — at 10^12
  rows / 10k partitions, per-partition jobs would drown in scheduling
  overhead; chunking keeps checkpoint granularity without losing
  whole-cluster parallelism inside a chunk)
- violations are appended to a violations table in the same pass's
  second action (verbose plans share the scan via Spark's FileScan
  cache; at cluster scale the violations sink is an Iceberg append)

The reference has no storage/run concept — this is the table-scale
extension the north rule adds on top of its per-document semantics.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jsonschema_rs_spark.plans.plan import CompiledSchema
from jsonschema_rs_spark.sources.icetable import PART_COL, IceTable

METRICS_SCHEMA_DDL = (
    "run_id string, snapshot_id bigint, part_id string, n_rows bigint, "
    "n_valid bigint, n_invalid bigint, violation_keywords map<string,bigint>, "
    "input_files array<string>, started double, finished double"
)


class ValidationRunner:
    def __init__(self, table: IceTable, plan: CompiledSchema,
                 runs_path: str, violations_path: str | None = None,
                 chunk_size: int = 64):
        self.table = table
        self.plan = plan
        self.runs_path = runs_path
        self.violations_path = violations_path
        self.chunk_size = chunk_size
        self.spark = table.spark

    # -- checkpoint state --------------------------------------------------

    def _read_metrics(self) -> DataFrame:
        # probe by READING, not os.path.exists: the checkpoint lives on
        # whatever filesystem the path names (hdfs://, s3a://) where
        # os.path is always False — which silently disabled resume on
        # exactly the cluster deployments this module targets — and a
        # half-written first chunk (_temporary only) must read as
        # "no checkpoint yet", not crash the resume (review finds)
        try:
            return self.spark.read.parquet(self.runs_path)
        except Exception:
            return self.spark.createDataFrame([], METRICS_SCHEMA_DDL)

    def completed_partitions(self, run_id: str) -> set[str]:
        df = self._read_metrics()
        return {r["part_id"] for r in
                df.where(F.col("run_id") == run_id)
                .select("part_id").distinct().collect()}

    def metrics(self) -> DataFrame:
        return self._read_metrics()

    # -- the run -----------------------------------------------------------

    def run(self, run_id: str | None = None,
            snapshot_id: int | None = None,
            resume: bool = True) -> dict:
        """Validate every partition of the snapshot not yet recorded for
        run_id. Returns {"run_id", "processed", "skipped"}."""
        run_id = run_id or uuid.uuid4().hex[:12]
        snapshot_id = snapshot_id if snapshot_id is not None \
            else self.table.current_snapshot()
        all_parts = self.table.partitions(snapshot_id)
        done = self.completed_partitions(run_id) if resume else set()
        pending = [p for p in all_parts if p not in done]

        for i in range(0, len(pending), self.chunk_size):
            chunk = pending[i:i + self.chunk_size]
            self._process_chunk(run_id, snapshot_id, chunk)

        return {"run_id": run_id, "processed": len(pending),
                "skipped": len(done)}

    def _process_chunk(self, run_id: str, snapshot_id: int,
                       parts: list[str]) -> None:
        t0 = time.time()
        df = self.table.read(partitions=parts)
        if self.violations_path:
            # dynamic partition overwrite → a chunk that crashed after
            # writing violations but before its metrics checkpoint is
            # simply overwritten on retry (exactly-once per partition).
            # Set on the WRITER, not the session conf: a session-level
            # mutation would silently change overwrite semantics for
            # unrelated writes later in the same Spark session.
            self.plan.violations(df, id_cols=[PART_COL]) \
                .withColumn("run_id", F.lit(run_id)) \
                .write.mode("overwrite") \
                .option("partitionOverwriteMode", "dynamic") \
                .partitionBy("run_id", PART_COL) \
                .parquet(self.violations_path)
        # metrics LAST: a chunk is checkpointed only once fully done
        self._append_metrics(run_id, snapshot_id, df, t0)

    def _append_metrics(self, run_id: str, snapshot_id: int,
                        df: DataFrame, t0: float) -> None:
        # counts/lineage and the keyword histogram need DIFFERENT
        # groupings, so validate ONCE into a persisted slim projection —
        # (part, valid, file, keyword array), a few short strings per
        # row regardless of document size — and aggregate twice from it
        # (same shape as streaming/validate.py's metrics). The previous
        # single-agg collect_list+flatten gathered EVERY keyword
        # occurrence of a partition into one aggregated array (unbounded
        # per-partition state at 10^12-row scale) and re-scanned that
        # array once per distinct keyword.
        v = self.plan.with_validation(df, mode="verbose")
        slim = v.select(
            F.col(PART_COL).cast("string").alias(PART_COL),
            "valid", F.input_file_name().alias("__file"),
            F.when(~F.col("valid"),
                   F.transform(F.col("errors"),
                               lambda e: e["keyword"])).alias("__kws"))
        slim = slim.persist()
        try:
            counts = (
                slim.groupBy(PART_COL)
                .agg(
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum(F.col("valid").cast("long")).alias("n_valid"),
                    F.sum((~F.col("valid")).cast("long")).alias("n_invalid"),
                    F.collect_set("__file").alias("input_files"),
                ))
            # keyword histogram via explode + two-level agg: the shuffle
            # carries (part, keyword, count) triples — map-side combined,
            # bounded by the schema's keyword vocabulary, never row-scale
            kws = (
                slim.where(~F.col("valid"))
                .select(PART_COL, F.explode("__kws").alias("__k"))
                .groupBy(PART_COL, "__k")
                .agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
                .groupBy(PART_COL)
                .agg(F.map_from_entries(
                    F.collect_list(F.struct(F.col("__k").alias("key"),
                                            F.col("__c").alias("value"))))
                     .alias("violation_keywords")))
            per_part = (
                counts.join(kws, PART_COL, "left")
                # all-valid partitions have no kws row: empty map, not
                # null (the metrics contract's map column is consumed by
                # map_keys/element_at-style readers)
                .withColumn(
                    "violation_keywords",
                    F.coalesce("violation_keywords",
                               F.create_map().cast("map<string,bigint>")))
            )
            # run the validation NOW and collect the tiny result
            # (<= chunk_size rows), so `finished` covers the actual
            # work — F.lit(time.time()) at plan-build time recorded
            # only driver-side plan construction (review find)
            rows = per_part.collect()
            finished = time.time()
            out = self.spark.createDataFrame(
                [(run_id, int(snapshot_id), r[PART_COL], r["n_rows"],
                  r["n_valid"], r["n_invalid"],
                  dict(r["violation_keywords"]), list(r["input_files"]),
                  t0, finished) for r in rows],
                METRICS_SCHEMA_DDL)
            out.write.mode("append").parquet(self.runs_path)
        finally:
            slim.unpersist()
