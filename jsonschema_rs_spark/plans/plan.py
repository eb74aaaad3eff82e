"""CompiledSchema: the executable validation plan.

Mirrors the reference Validator's action surface (is_valid / validate /
iter_errors / evaluate — crates/jsonschema/src/validator.rs:110-164,
365-378) as DataFrame transforms:

    with_validation(df)  -> df + valid (+ errors)       ≈ is_valid / iter_errors
    violations(df)       -> exploded violation rows     ≈ iter_errors
    summary(df)          -> per-partition pass/fail agg ≈ evaluate().flag() rollup

Two context weights like the reference (flag mode skips all error-path
bookkeeping — validator.rs:106-109): mode='flag' compiles a boolean-only
plan; mode='verbose' compiles the error-collecting plan and derives
`valid` from it. Everything is a single projection over one scan — no
shuffle, embarrassingly parallel, which is what makes throughput scale
linearly with executors at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jsonschema_rs_spark.compiler.nodes import ERR_ARRAY_DDL, Node
from jsonschema_rs_spark.errors import ValidationOptions


class CompiledSchema:
    def __init__(self, node: Node, options: ValidationOptions,
                 column: str | None = None):
        self.node = node
        self.options = options
        self.column = column

    # -- core column builders ------------------------------------------------

    def _target(self, df: DataFrame) -> Column:
        if self.column is not None:
            return F.col(self.column)
        # Root object = the row itself. Catalyst's SimplifyExtractValueOps
        # rewrites struct(cols...).getField(c) back to the bare column, so
        # this costs nothing at runtime and keeps one code path.
        return F.struct(*[F.col(c).alias(c) for c in df.columns])

    def valid_column(self, df: DataFrame) -> Column:
        return self.node.valid(self._target(df))

    def _msg_ctx(self):
        """Masked_with analog on the typed path (error.rs:496-516):
        mask → placeholder head; message_values → the failing value's
        JSON rendering leads the message (reference instance() parity:
        strings quoted/escaped — to_json via a 1-element array, the
        brackets stripped). Default: static templates."""
        from contextlib import nullcontext

        from jsonschema_rs_spark.compiler.nodes import (
            masked_message, message_decorator)
        o = self.options
        if o.mask is None and not o.message_values:
            return nullcontext()

        def _json_repr(c):
            arr = F.to_json(F.array(c))
            return arr.substr(F.lit(2), F.length(arr) - F.lit(2))

        return message_decorator(
            lambda col, template: masked_message(
                template, col, mask=o.mask,
                value_repr=_json_repr if o.mask is None else None))

    def errors_column(self, df: DataFrame) -> Column:
        root = F.lit("")
        with self._msg_ctx():
            return self.node.errors(self._target(df), root)

    # -- actions ---------------------------------------------------------------

    def with_validation(self, df: DataFrame, mode: str = "flag") -> DataFrame:
        """Append `valid` (flag) or `errors` + `valid` (verbose).

        Verbose gates the error-collection expression behind the cheap
        boolean plan — the reference's two-context-weight design
        (validator.rs:106-109) as a Column conditional: valid rows (the
        vast majority at production quality bars) never pay for error
        construction."""
        if mode == "flag":
            return df.withColumn("valid", self.valid_column(df))
        if mode == "verbose":
            out = df.withColumn("valid", self.valid_column(df))
            errs = F.when(F.col("valid"),
                          F.expr(f"CAST(array() AS {ERR_ARRAY_DDL})")) \
                .otherwise(self.errors_column(df))
            return out.withColumn("errors", errs)
        raise ValueError(f"unknown mode {mode!r}")

    def violations(self, df: DataFrame, id_cols: list[str] | None = None) -> DataFrame:
        """One row per violation: (id_cols..., instance_path, schema_path,
        keyword, message). ≈ iter_errors exploded."""
        id_cols = id_cols if id_cols is not None else df.columns[:1]
        v = self.with_validation(df, mode="verbose")
        e = v.filter(~F.col("valid")).select(
            *id_cols, F.explode("errors").alias("err")
        )
        return e.select(
            *id_cols,
            F.col("err.instance_path").alias("instance_path"),
            F.col("err.schema_path").alias("schema_path"),
            F.col("err.keyword").alias("keyword"),
            F.col("err.message").alias("message"),
        )

    def summary(self, df: DataFrame, by_partition: bool = True) -> DataFrame:
        """Per-partition (or global) pass/fail rollup — the checkpointable
        metrics row per unit of work (SURVEY.md §2.9)."""
        v = self.with_validation(df, mode="flag")
        keys = [F.spark_partition_id().alias("partition_id")] if by_partition else []
        g = v.groupBy(*keys) if keys else v.groupBy()
        n_valid = F.coalesce(F.sum(F.col("valid").cast("long")), F.lit(0))
        return g.agg(
            F.count(F.lit(1)).alias("n_rows"),
            n_valid.alias("n_valid"),
            (F.count(F.lit(1)) - n_valid).alias("n_invalid"),
        )

    def hierarchy(self, df: DataFrame) -> DataFrame:
        """Hierarchical violation rollup — the table-scale analog of the
        reference's hierarchical structured output (evaluation.rs:416):
        one row per schema-location PREFIX with the violation count
        aggregated over its whole subtree, so `/properties/spans` carries
        the sum of everything under it. Output:
        (schema_prefix, depth, n_violations), depth = segment count.

        Pure Column plan: explode errors → explode each path's prefixes
        → groupBy prefix (shuffle carries (prefix, partial count) only).
        """
        v = self.with_validation(df, mode="verbose")
        parts = F.split(F.col("err.schema_path"), "/")
        prefixes = F.when(F.size(parts) >= 2, F.transform(
            F.sequence(F.lit(2), F.greatest(F.size(parts), F.lit(2))),
            lambda i: F.struct(
                F.array_join(F.slice(parts, 1, i), "/").alias("prefix"),
                (i - 1).cast("int").alias("depth")))) \
            .otherwise(F.expr(
                "CAST(array() AS array<struct<prefix:string,depth:int>>)"))
        return (
            v.select(F.explode("errors").alias("err"))
            .select(F.explode(prefixes).alias("p"))
            .groupBy(F.col("p.prefix").alias("schema_prefix"),
                     F.col("p.depth").alias("depth"))
            .agg(F.count(F.lit(1)).alias("n_violations"))
        )

    def keyword_summary(self, df: DataFrame) -> DataFrame:
        """Violation counts per (keyword, schema_path) — drift-friendly."""
        v = self.with_validation(df, mode="verbose")
        return (
            v.select(F.explode("errors").alias("err"))
            .groupBy(F.col("err.keyword").alias("keyword"),
                     F.col("err.schema_path").alias("schema_path"))
            .agg(F.count(F.lit(1)).alias("n_violations"))
        )
