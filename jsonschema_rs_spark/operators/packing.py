"""Sequence packing for training-data preparation.

Assigns documents to fixed token-budget packs the way large-scale LLM
pipelines do it — concatenate in a deterministic order, then chunk the
token stream: a document belongs to the pack where its starting offset
falls (`pack_id = start_offset div budget`). This is deliberately NOT
exact greedy bin-packing (greedy needs a sequential scan with resets —
inherently serial per shard); concatenate-then-chunk is order-stable,
resumable, one window aggregation, and what actually feeds
fixed-context pretraining.

Scale shape: ONE shuffle on the shard key + a per-shard ordered window
(prefix sum of token counts). Shard by a bounded-cardinality key whose
groups fit a task's sort buffer (date, source, language); parallelism =
shards. Token counts are JVM-side Column expressions
(text_analysis.ws_token_count / bpe_token_count).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from jsonschema_rs_spark.operators.text_analysis import ws_token_count

__all__ = ["pack_sequences"]


def pack_sequences(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", budget: int = 2048,
                   shard_col: str | None = None,
                   token_counter=ws_token_count) -> DataFrame:
    """(id, shard?, n_tokens, start_offset, pack_id) per document.

    `start_offset` is the exclusive prefix sum of `n_tokens` in `id_col`
    order within the shard; `pack_id = start_offset div budget` (exact
    integer division — no double rounding at 10^12-token prefix sums).
    Documents longer than `budget` simply span packs, like the token
    stream they model. Deterministic for a fixed (shard, id) order.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    n_tok: Column = token_counter(F.col(text_col))
    keys = [F.col(shard_col)] if shard_col else []
    w = (Window.partitionBy(*keys).orderBy(F.col(id_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out_cols = [F.col(id_col)]
    if shard_col:
        out_cols.append(F.col(shard_col))
    staged = df.select(*out_cols, n_tok.cast("long").alias("n_tokens"))
    cum = staged.withColumn(
        "start_offset",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long"))
    return cum.withColumn(
        "pack_id", F.expr(f"start_offset div {int(budget)}"))
