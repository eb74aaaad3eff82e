"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: compile the interleaved-document spec and
                 validate the derived spans table at sf0.001 (per-row
                 verdict + error count, one scan, no shuffle).
queries()      — one entry per implemented operator (SURVEY.md §2 +
                 training-pipeline extensions); impls in
                 jsonschema_rs_spark/queries.py.
oracle_sql()   — DuckDB-equivalent SQL per query; impls in
                 jsonschema_rs_spark/oracles.py. Queries without an entry
                 (minhash_pairs, mm_features) get rows-only checks:
                 banded-LSH pair generation and mapInPandas feature
                 extraction are not ANSI-SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: spec → Column-expression plan → verdicts over the
    interleaved spans table derived from sf0.001 documents."""
    from jsonschema_rs_spark.compiler.compiler import compile_schema
    from jsonschema_rs_spark.docspec import default_options
    from jsonschema_rs_spark.queries import SPANS_SCHEMA, derived_spans_df

    schema = dict(SPANS_SCHEMA)
    schema["x-strictlyIncreasing"] = "offset"
    df = derived_spans_df(spark, "/root/testdata/sf0.001")
    plan = compile_schema(schema, df.schema, options=default_options(),
                          column="spans")
    v = plan.with_validation(df, mode="verbose")
    return v.select("doc_id", "valid", F.size("errors").alias("n_errors"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from jsonschema_rs_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from jsonschema_rs_spark.oracles import ORACLES

    return dict(ORACLES)
