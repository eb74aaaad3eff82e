"""Streaming distribution-drift checks.

Extends the batch drift family (operators/table_checks.py: KS exact,
chi-square two-sample) to Structured Streaming: per event-time window,
a goodness-of-fit chi-square of the window's category counts against a
FIXED reference distribution (the "training distribution" in a
validation pipeline; derive it once with `reference_proportions`).

Plan shape: ONE stateful windowed aggregation — the reference
categories are compile-time literals, so per-category counts are
conditional sums inside the same agg (no chained stateful operators,
no second shuffle) — and the chi-square statistic is a stateless
projection above it. State per window is k+1 longs; the watermark
closes windows, so state is bounded by (windows in flight) x (k+1).

The same function works on a batch DataFrame (identical plan minus the
watermark), which is how the tests pin stream == batch == oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["reference_proportions", "chi_square_drift_stream"]


def reference_proportions(df: DataFrame, column: str) -> dict:
    """category -> proportion from a reference sample (one groupBy).
    Driver-side result is one row per CATEGORY — tiny by construction."""
    rows = (df.groupBy(F.col(column).alias("cat"))
            .agg(F.count(F.lit(1)).alias("n")).collect())
    total = sum(r["n"] for r in rows)
    return {r["cat"]: r["n"] / total for r in rows}


def chi_square_drift_stream(df: DataFrame, column: str, ts_col: str,
                            ref_probs: dict, window: str = "1 hour",
                            watermark: str | None = "2 hours",
                            min_expected: float = 1.0) -> DataFrame:
    """Per-window goodness-of-fit chi-square vs `ref_probs`.

    Returns (window_start, window_end, n, chi2, dof, n_unexpected):
      chi2         sum over reference categories of (n_c - N*p_c)^2 /
                   (N*p_c), terms with expected < min_expected dropped
                   (same guard as the batch check)
      dof          k - 1 (k = len(ref_probs))
      n_unexpected rows whose category is NOT in the reference — novel
                   categories are drift the statistic alone can't see
                   (their expected count is 0), so they are surfaced
                   separately instead of silently folded in.

    Numeric columns should be pre-bucketed (F.width_bucket / F.floor)
    so categories are bounded; the KS analog on a stream IS chi-square
    over fixed bins, since exact rank-based KS needs a total order over
    the (unbounded) window population.
    """
    if not ref_probs:
        raise ValueError("ref_probs must contain at least one category")
    c = F.col(column)
    cats = list(ref_probs)
    # withWatermark requires TIMESTAMP (not TIMESTAMP_NTZ); the cast is
    # session-TZ (UTC in get_spark) so window boundaries are identical
    # on the batch path, which stays uncast-consistent by casting too
    src = df.withColumn("__ts", F.col(ts_col).cast("timestamp"))
    if watermark is not None and df.isStreaming:
        src = src.withWatermark("__ts", watermark)
    aggs = [
        F.sum(F.when(c.eqNullSafe(F.lit(cat)), 1).otherwise(0))
        .alias(f"__n_{i}")
        for i, cat in enumerate(cats)
    ]
    aggs.append(F.count(F.lit(1)).alias("__n"))
    win = src.groupBy(F.window("__ts", window).alias("w")).agg(*aggs)
    n = F.col("__n").cast("double")
    chi2 = F.lit(0.0)
    known = F.lit(0).cast("long")
    for i, cat in enumerate(cats):
        exp = n * F.lit(float(ref_probs[cat]))
        obs = F.col(f"__n_{i}").cast("double")
        chi2 = chi2 + F.when(exp >= F.lit(min_expected),
                             (obs - exp) ** 2 / exp).otherwise(0.0)
        known = known + F.col(f"__n_{i}")
    return win.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        F.col("__n").alias("n"),
        F.round(chi2, 6).alias("chi2"),
        F.lit(len(cats) - 1).cast("long").alias("dof"),
        (F.col("__n") - known).alias("n_unexpected"),
    )
