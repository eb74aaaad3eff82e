"""End-to-end training-corpus curation: the composition a 100 TB
pipeline actually runs, built entirely from this package's operators.

    quality gate  → exact dedup → MinHash-LSH near-dedup → survivors

Stage discipline (each stage is shuffle-minimal):
1. quality gate: one projection (staged text features), a filter — no
   shuffle, filter pushed to the scan where possible
2. exact dedup: groupBy(fingerprint) keep-min-id — map-side combine
3. near-dedup: LSH band buckets → candidate pairs → exact-Jaccard verify
   → GREEDY drop (the larger id of each confirmed pair is removed).
   Greedy-drop is deliberately not connected-components: CC needs
   iterative joins; greedy is one pass, removes a superset of a minimal
   cover, and is the standard production tradeoff for near-dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jsonschema_rs_spark.operators import dedup as dd
from jsonschema_rs_spark.operators import text_analysis as ta


def curate(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
           quality_threshold: float = 0.7,
           num_hashes: int | str = 16, bands: int = 8,
           jaccard_threshold: float = 0.6,
           strategy: str = "greedy",
           stage_dir: str | None = None) -> DataFrame:
    """Returns the surviving rows of `docs` (original columns).

    strategy='greedy': drop the larger id of each confirmed pair (one
    pass). strategy='cc': connected components over the pair graph, keep
    the minimum id per cluster (a few extra tiny shuffles; never
    over-deletes chains a-b, b-c).

    num_hashes="auto" derives the LSH banding from jaccard_threshold
    (dedup.adaptive_minhash_banding); `bands` is then ignored.

    stage_dir: when set, the exact-dedup survivors are MATERIALIZED to
    `<stage_dir>/exact` as parquet and re-read — the near-dedup stages
    (signatures, band keys, both verify-join sides, the final
    anti-join) otherwise recompute the gate + feature lineage from the
    source scan per use (~20 source scans in this composition). Lazy
    recomputation is the right default at test scale; at 100 TB a
    persisted stage boundary is how production pipelines run this, and
    the stage output doubles as a resume point. Identical results
    either way (pinned by test)."""
    from pyspark.sql import Window

    feats = ta.with_text_features(docs, text_col)
    # project the gate's working columns away BEFORE the dedup
    # exchange: only the original columns (plus fp) survive the gate,
    # so the fp shuffle — and the optional stage write — never carry
    # the feature columns the rest of the pipeline doesn't read
    gated = feats.where(F.col("quality") >= quality_threshold) \
        .select(*docs.columns, "fp")

    # exact dedup: keep the smallest id per normalized fingerprint.
    # Keyed window (partitionBy fp), not agg+self-join: both plans
    # exchange the full gated rows by fp once (SMJ sorts by fp exactly
    # like the window does), but the agg+join form pays a SECOND
    # (fp, min_id) exchange on top — the window form drops it (same
    # argument as dedup.exact_duplicate_rows)
    w = Window.partitionBy("fp")
    exact = (gated.withColumn("__keep", F.min(id_col).over(w))
             .where(F.col(id_col) == F.col("__keep"))
             .drop("__keep", "fp"))
    if stage_dir is not None:
        path = stage_dir.rstrip("/") + "/exact"
        exact.write.mode("overwrite").parquet(path)
        exact = docs.sparkSession.read.parquet(path)

    # near-dedup on the exact-deduped survivors
    pairs = dd.minhash_near_duplicates(
        exact, text_col, id_col, num_hashes=num_hashes, bands=bands,
        threshold=jaccard_threshold)
    if strategy == "cc":
        comps = dd.connected_components(pairs)
        drop = comps.where(F.col("id") != F.col("component")) \
            .select(F.col("id").alias(id_col))
    else:
        drop = pairs.select(F.col("id_b").alias(id_col)).dropDuplicates()
    # drop-list size is data-dependent (could be 30%+ of a crawl) — leave
    # the broadcast decision to AQE's runtime statistics
    out = exact.join(drop, id_col, "left_anti")
    return out.select(*docs.columns)
