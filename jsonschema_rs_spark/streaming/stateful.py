"""Custom stateful streaming operators via applyInPandasWithState
(task brief: "applyInPandasWithState for custom stateful operators").

streaming_dedup_first_seen — cross-micro-batch exact dedup: the first
document per fingerprint ever seen is emitted, all later arrivals (same
batch or any later batch) are dropped. State per key is one boolean, so
the state store stays tiny; a TTL can bound it for endless streams.

This complements the engine's batch dedup (operators/dedup.py): in a
continuous ingest pipeline the fingerprint state IS the dedup index.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from jsonschema_rs_spark.operators.text_analysis import fingerprint

STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType())])


def streaming_dedup_first_seen(stream_df: DataFrame,
                               text_col: str = "text",
                               fp_col: str = "fp",
                               ttl_ms: int | None = None) -> DataFrame:
    """stream → stream containing only first-ever occurrences per
    normalized-content fingerprint.

    The fingerprint column is computed JVM-side (md5 of normalized
    text); only the keyed first-seen decision crosses into Python, as
    Arrow batches grouped by key."""
    with_fp = stream_df.withColumn(fp_col, fingerprint(F.col(text_col)))
    out_schema = with_fp.schema
    timeout = GroupStateTimeout.ProcessingTimeTimeout if ttl_ms \
        else GroupStateTimeout.NoTimeout

    def dedup(key: Any, pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        already = state.exists
        if not already:
            for pdf in pdfs:
                if len(pdf):
                    yield pdf.iloc[[0]]
                    break
            state.update((True,))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)

    return with_fp.groupBy(fp_col).applyInPandasWithState(
        dedup, out_schema, STATE_SCHEMA, "append", timeout)
