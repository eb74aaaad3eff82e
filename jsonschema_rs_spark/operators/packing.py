"""Sequence packing for training-data preparation.

Assigns documents to fixed token-budget packs the way large-scale LLM
pipelines do it — concatenate in a deterministic order, then chunk the
token stream: a document belongs to the pack where its starting offset
falls (`pack_id = start_offset div budget`). This is deliberately NOT
exact greedy bin-packing (greedy needs a sequential scan with resets —
inherently serial per shard); concatenate-then-chunk is order-stable,
resumable, one window aggregation, and what actually feeds
fixed-context pretraining. It remains the SCALE DEFAULT.

`pack_sequences_greedy` is the no-spanning variant for pipelines that
forbid a document crossing a pack boundary (e.g. example-level packing
with attention separators): first-fit-in-order per shard, a sequential
scan implemented as applyInPandas — serial WITHIN a shard by nature,
parallel across shards, so the shard key bounds both correctness
(groups must fit a task) and parallelism exactly like the window in
the chunk path.

Scale shape (both): ONE shuffle on the shard key + per-shard ordered
work. Shard by a bounded-cardinality key whose groups fit a task's
sort buffer (date, source, language); parallelism = shards. Token
counts are JVM-side Column expressions
(text_analysis.ws_token_count / bpe_token_count).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from jsonschema_rs_spark.operators.text_analysis import ws_token_count

__all__ = ["pack_sequences", "pack_sequences_greedy"]


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
    # NULL text counts 0 tokens: a NULL n_tokens nulled the prefix sum
    # and silently dropped the document from every pack (review find);
    # the DuckDB oracle coalesces identically
    n_tok: Column = F.coalesce(token_counter(F.col(text_col)), F.lit(0))
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


def pack_sequences_greedy(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id", budget: int = 2048,
                          shard_col: str | None = None,
                          token_counter=ws_token_count) -> DataFrame:
    """(id, shard?, n_tokens, pack_id) — first-fit-in-order packing
    with NO document spanning: a document goes into the current pack if
    it fits the remaining budget, else opens the next pack. Documents
    longer than `budget` get a pack of their own (never split — the
    no-spanning contract), exactly the boundary behavior a
    separator-token pipeline needs.

    The per-shard scan is inherently sequential, so it runs as ONE
    applyInPandas over the shard groups (Arrow-batched; token counts
    are computed JVM-side BEFORE the crossing, so Python sees only
    (id, n_tokens) scalars). Deterministic for a fixed (shard, id)
    order. pack_ids are per-shard, 0-based, like pack_sequences.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    # NULL text counts 0 tokens — without the coalesce a NULL reached
    # the pandas fold as NaN, making `used` NaN and disabling the
    # budget check for the REST OF THE SHARD (every later document
    # landed in one pack; review find)
    n_tok: Column = F.coalesce(token_counter(F.col(text_col)), F.lit(0))
    out_cols = [F.col(id_col)]
    if shard_col:
        out_cols.append(F.col(shard_col))
    staged = df.select(*out_cols, n_tok.cast("long").alias("n_tokens"))
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in staged.schema.fields
    ) + ", pack_id long"

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort")
        packs, cur, used = [], 0, 0
        for n in pdf["n_tokens"]:
            if used > 0 and used + n > budget:
                cur += 1
                used = 0
            packs.append(cur)
            used += n
        pdf = pdf.copy()
        pdf["pack_id"] = packs
        return pdf

    if shard_col:
        return staged.groupBy(shard_col).applyInPandas(fit, out_schema)
    # single logical shard: still distributed-safe (one group), but the
    # scan is serial — pass shard_col for parallelism at scale. A real
    # constant column (not groupBy(lit): integer literals parse as
    # ordinals) that the pandas side drops again.
    return staged.withColumn("__g", F.lit(0)).groupBy("__g").applyInPandas(
        lambda pdf: fit(pdf.drop(columns="__g")), out_schema)
