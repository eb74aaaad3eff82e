"""Multimodal (image/audio/video) column handling.

Design (north rule / SURVEY.md input_hint): media lives in the table as an
opaque `binary` column plus a typed metadata struct — the Spark-side
plumbing (schema, partition sizing, Arrow batch shape, UDF signatures) is
real and tested; the actual codec calls are STUBBED because no image/audio
libraries exist in this container. Each stub is clearly marked and gated
behind an import-try so dropping in Pillow/librosa on a real cluster
activates the real path with no plan changes.

Scale notes: media bytes dominate row size, so
- decode/feature steps run via mapInPandas (Arrow batches, streaming
  iterator — never materializes a partition in memory)
- spark.sql.files.maxPartitionBytes should be LOWERED for media tables
  (e.g. 32 MB) so one task's Arrow batches fit comfortably in executor
  memory; see session.get_spark(extra_conf=...)
- metadata-only queries never touch the bytes: keep `media_meta` in a
  separate (parquet/Iceberg) column so column pruning skips the blob
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_DDL = ("struct<media_type:string,width:int,height:int,"
                  "duration_ms:int,codec:string>")

MEDIA_SCHEMA = T.StructType([
    T.StructField("asset_id", T.StringType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("content", T.BinaryType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("asset_id", T.StringType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.IntegerType()),
    # md5 (not sha1): reproducible by ANY engine incl. the DuckDB oracle
    T.StructField("content_md5", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.IntegerType()),
    T.StructField("frame_count", T.IntegerType()),
])


def synthetic_media_df(spark, n_assets: int = 1000, seed: int = 42,
                       payload_bytes: int = 256) -> DataFrame:
    """Deterministic fake media table (asset_id, media_type, content) —
    content bytes derived from the asset id (scale-free, same at any
    parallelism), standing in for real blobs in tests."""
    base = spark.range(n_assets)
    k = F.col("id")
    # 32 hex chars decode to 16 BYTES: // 16 sizes payloads at the
    # requested byte count (// 32 produced half; review find)
    content = F.to_binary(
        F.repeat(F.md5(F.concat(F.lit(seed), k.cast("string"))),
                 max(1, payload_bytes // 16)), F.lit("hex"))
    return base.select(
        F.concat(F.lit("asset-"),
                 F.substring(F.md5(k.cast("string")), 1, 8)).alias("asset_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.pmod(k, F.lit(3)) + 1).cast("int")).alias("media_type"),
        content.alias("content"),
    )


def _decode_image_stub(data: bytes) -> tuple:
    """STUB — real impl: PIL.Image.open(io.BytesIO(data)).size.
    Deterministic fake: dimensions derived from a content hash so tests
    have stable expectations. NULL content and undecodable bytes yield
    (None, None) — a corrupt blob must not kill the task 4 times and
    abort the whole job (review find: `except ImportError` did not
    cover UnidentifiedImageError/OSError once Pillow is installed)."""
    if data is None:
        return None, None
    try:
        from PIL import Image  # pragma: no cover - not in this container
        import io
        try:
            with Image.open(io.BytesIO(data)) as im:
                return im.width, im.height
        except Exception:
            return None, None
    except ImportError:
        h = int(hashlib.md5(data).hexdigest()[:8], 16)
        return 64 + h % 1024, 64 + (h >> 10) % 1024


def _decode_av_stub(data: bytes) -> tuple:
    """STUB — real impl: soundfile/av probe. Fake (duration_ms, frames);
    NULL content yields (None, None)."""
    if data is None:
        return None, None
    h = int(hashlib.md5(data).hexdigest()[8:16], 16)
    dur = 500 + h % 600_000
    return dur, max(1, dur // 40)


def extract_media_features(df: DataFrame,
                           content_col: str = "content") -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one out.

    The iterator signature keeps memory bounded: Spark streams batches of
    spark.sql.execution.arrow.maxRecordsPerBatch rows through Python; we
    never hold a whole partition.
    """
    cols = df.columns

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf[content_col].map(
                    lambda b: len(b) if b is not None else 0).astype("int32"),
                "content_md5": pdf[content_col].map(
                    lambda b: hashlib.md5(b).hexdigest() if b is not None
                    else None),
            })
            dims = [
                _decode_image_stub(b) if mt == "image" else (None, None)
                for b, mt in zip(pdf[content_col], pdf["media_type"])
            ]
            av = [
                _decode_av_stub(b) if mt in ("audio", "video") else (None, None)
                for b, mt in zip(pdf[content_col], pdf["media_type"])
            ]
            out["width"] = pd.array([d[0] for d in dims], dtype="Int32")
            out["height"] = pd.array([d[1] for d in dims], dtype="Int32")
            out["duration_ms"] = pd.array([a[0] for a in av], dtype="Int32")
            out["frame_count"] = pd.array([a[1] for a in av], dtype="Int32")
            yield out

    assert "asset_id" in cols and "media_type" in cols
    return df.mapInPandas(extract, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLUMBING: emits (asset_id, frame_idx, ts_ms)
    rows from metadata only — the decode of the actual frame bytes is the
    stubbed step. Pure Column expressions: sequence + explode, no Python.
    """
    # filter to videos BEFORE feature extraction: the md5/decodes over
    # every non-video blob were pure waste for a metadata-only plan
    # (review find)
    feats = extract_media_features(
        df.where(F.col("media_type") == "video"))
    return feats.where(F.col("duration_ms").isNotNull()).select(
        "asset_id",
        F.posexplode(
            # last sampled ts stays INSIDE the stream: a frame at
            # ts == duration_ms does not exist (review find)
            F.sequence(F.lit(0),
                       ((F.col("duration_ms") - 1) / every_ms).cast("int"))
        ).alias("frame_idx", "ts_s"),
    ).select("asset_id", "frame_idx",
             (F.col("ts_s") * every_ms).cast("int").alias("ts_ms"))
