"""SparkSession factory.

local[N] for dev/tests; the same configs are what we'd set cluster-side
(AQE, skew join, Arrow) — shuffle partitions scale with parallelism.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "jsonschema_rs_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    cores=None -> $SPARK_GRAFT_CPUS or all local cores. On a real cluster
    this factory is bypassed (spark-submit provides the session); every
    config below is still correct there.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        # ~2x task slots is a good local default; on a 1000-executor
        # cluster this would be set to ~2-3x total cores instead.
        shuffle_partitions = max(2 * cores, 8)

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # InferFiltersFromGenerate synthesizes `size(gen) > 0` for every
        # explode and PUSHES it through projections to the scan with the
        # generator's whole expression tree INLINED — for HOF-built
        # arrays (shingles, band keys) the interpreted tokenize pipeline
        # then re-runs once per element_at reference inside the filter
        # (measured: 5000-doc shingle explode 38s -> 1s at sf0.1). The
        # rule only helps when empty arrays are common; ours never are.
        .config("spark.sql.optimizer.excludedRules",
                "org.apache.spark.sql.catalyst.optimizer."
                "InferFiltersFromGenerate")
        # NOT bigger-is-better: a 48g heap made 32-thread runs 10-30x
        # slower — G1 grows/uncommits regions between jobs and all task
        # threads then page-fault simultaneously, serializing on the
        # kernel's mmap lock (94% system time). A right-sized steady heap
        # keeps faults out of the hot path. On a real cluster this is the
        # same guidance: moderate executor heaps (8-16g), more executors.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Every PySpark API call otherwise walks the Python stack AND
        # makes an extra JVM round-trip to record the user call site for
        # error enrichment; schema compilation issues thousands of
        # Column calls, so this costs whole seconds of driver time per
        # compiled plan (measured ~15% of output-tree build). Debug
        # enrichment belongs in dev sessions, not the production path.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
