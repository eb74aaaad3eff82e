"""Deterministic synthetic data: the interleaved text+media documents table.

Shape per BASELINE.json input_hint:
    doc_id : string
    spans  : array<struct<kind string, text string, media_ref string, offset int>>

Everything is derived from `id` via xxhash64 — NO driver-side RNG state —
so the same (n_rows, seed) produces bit-identical rows at any parallelism
or partition count. That property is what makes the generator (and the
scaling benchmark built on it) valid evidence at cluster scale: local[8]
and local[32] see literally the same table.

~5% of rows carry one deliberate violation, stratified over 10 classes
(FIXTURES.md §1): missing kind, wrong-type kind, enum violation, bad
media_ref pattern, empty text, non-monotone offsets, duplicate span,
empty spans, dangling media_ref (referential, schema-clean), duplicate
doc_id (uniqueness, schema-clean).

Skew: ~30% of media references hit 16 hot assets (exercises salting /
AQE-skew paths in referential checks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

N_HOT_ASSETS = 16
DEFAULT_N_ASSETS = 100_000
_WORDS = (
    "the quick brown fox jumps over lazy dog spark schema span validate "
    "interleaved media document offset kind text asset unicode \U0001d11e "
    "ref batch arrow column predicate shuffle partition skew broadcast "
).split(" ")
_LOREM = " ".join(_WORDS * 40)  # long enough base string to substring from


def _h(seed: int, *cols: Column) -> Column:
    """Deterministic 64-bit sub-stream: xxhash64(salt, ...)."""
    return F.xxhash64(F.lit(seed), *cols)


def _pmod(c: Column, m: int) -> Column:
    return F.pmod(c, F.lit(m))


def _u01(c: Column) -> Column:
    """hash → uniform (0,1]."""
    return (_pmod(c, 1_000_000_00) + 1) / 1_000_000_00.0


def asset_id_expr(k: Column) -> Column:
    """asset index -> asset_id; shared by fact and dim generation so the
    referential-integrity ground truth is exact by construction."""
    return F.concat(F.lit("asset-"), F.substring(F.md5(k.cast("string")), 1, 8))


def media_assets_df(spark: SparkSession, n_assets: int = DEFAULT_N_ASSETS,
                    seed: int = 42) -> DataFrame:
    base = spark.range(n_assets)
    k = F.col("id")
    df = base.select(
        asset_id_expr(k).alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (_pmod(k, 3) + 1).cast("int"),
        ).alias("media_type"),
        _pmod(_h(seed + 7, k), 10_000_000).alias("bytes"),
    )
    # md5-prefix collisions are ~1 in 4e9 per pair; dedupe so asset_id is a
    # true primary key
    return df.dropDuplicates(["asset_id"])


def documents_df(spark: SparkSession, n_rows: int, seed: int = 42,
                 n_assets: int = DEFAULT_N_ASSETS,
                 violation_pct: int = 5,
                 text_len_shift: int = 0,
                 zipf_exponent: float = 0.8,
                 partitions: int | None = None) -> DataFrame:
    """The interleaved documents table, generated scale-free in Spark."""
    base = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)
    rid = F.col("id")

    # violation class: 0..9 for ~violation_pct% of rows, else -1 (clean)
    vsel = _pmod(_h(seed + 1, rid), 1000)
    vclass = F.when(vsel < int(violation_pct * 10), _pmod(vsel, 10)) \
        .otherwise(F.lit(-1))

    # span count: Zipf-ish tail, clipped to [1, 24]; violation class 7 -> 0
    u = _u01(_h(seed + 2, rid))
    n_spans = F.least(F.lit(24), F.greatest(F.lit(1),
                      F.floor(F.pow(u, F.lit(-zipf_exponent))).cast("int")))
    n_spans = F.when(vclass == 7, F.lit(0)) \
        .when((vclass == 5) | (vclass == 6), F.greatest(n_spans, F.lit(2))) \
        .otherwise(n_spans)

    # doc_id: "doc-" + 12 digits; class 9 pairs share the even partner's id
    did_num = F.when(vclass == 9, rid - _pmod(rid, 2)).otherwise(rid)
    doc_id = F.concat(F.lit("doc-"), F.lpad(did_num.cast("string"), 12, "0"))

    def span(i: Column) -> Column:
        h = _h(seed + 3, rid, i)
        kind_idx = _pmod(h, 10)
        kind = (
            F.when(kind_idx <= 5, F.lit("text"))
            .when(kind_idx == 6, F.lit("image"))
            .when(kind_idx == 7, F.lit("audio"))
            .when(kind_idx == 8, F.lit("video"))
            .otherwise(F.lit("ref"))
        )
        # first span of violation rows is forced to a known-bad shape
        first = i == 0
        kind = (
            F.when(first & (vclass == 0), F.lit(None).cast("string"))
            .when(first & (vclass == 1), F.lit("42"))
            .when(first & (vclass == 2), F.lit("gif"))
            .when(first & (vclass == 3), F.lit("image"))
            .when(first & (vclass == 4), F.lit("text"))
            .otherwise(kind)
        )
        is_text = F.coalesce(kind == "text", F.lit(True))  # null kind: text-ish
        tlen = (1 + _pmod(_h(seed + 4, rid, i), 40) + F.lit(text_len_shift)).cast("int")
        text = F.when(
            first & (vclass == 4), F.lit("")
        ).otherwise(F.substring(F.lit(_LOREM), (_pmod(h, 200) + 1).cast("int"), tlen))

        # media_ref: 30% of refs to 16 hot assets (skew), else uniform
        hot = _pmod(_h(seed + 5, rid, i), 10) < 3
        k = F.when(hot, _pmod(_h(seed + 6, rid, i), N_HOT_ASSETS)).otherwise(
            N_HOT_ASSETS + _pmod(_h(seed + 6, rid, i), n_assets - N_HOT_ASSETS)
        )
        media_ref = asset_id_expr(k)
        media_ref = (
            F.when(first & (vclass == 3), F.lit("BAD_REF!!"))
            .when(first & (vclass == 8), F.lit("asset-zzzzzzzz"))
            .otherwise(media_ref)
        )

        offset = (i * 16 + _pmod(_h(seed + 8, rid, i), 16)).cast("int")
        offset = F.when(vclass == 5, F.lit(0)).otherwise(offset)  # non-monotone

        return F.struct(
            kind.alias("kind"),
            F.when(is_text, text).otherwise(F.lit(None).cast("string")).alias("text"),
            F.when(~is_text, media_ref).otherwise(F.lit(None).cast("string"))
            .alias("media_ref"),
            offset.alias("offset"),
        )

    spans = F.transform(F.sequence(F.lit(0), n_spans - 1), span)
    spans = F.when(n_spans == 0, F.expr(
        "CAST(array() AS array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>)")).otherwise(spans)
    # duplicate-span violation: overwrite span[1] with span[0]
    spans = F.when(
        (vclass == 6) & (F.size(spans) >= 2),
        F.concat(
            F.slice(spans, 1, 1), F.slice(spans, 1, 1),
            F.slice(spans, 3, F.greatest(F.size(spans) - 2, F.lit(0))),
        ),
    ).otherwise(spans)

    return base.select(
        doc_id.alias("doc_id"),
        spans.alias("spans"),
        vclass.cast("int").alias("_vclass"),  # ground-truth label for tests
    )


def documents_ref_df(spark: SparkSession, n_rows: int,
                     seed: int = 43) -> DataFrame:
    """Drift-check reference snapshot: shifted text-length and span-count
    distributions (FIXTURES.md §3) — KS/chi-square should fire on the
    shifted columns and stay quiet on unshifted ones."""
    return documents_df(spark, n_rows, seed=seed, text_len_shift=6,
                        zipf_exponent=1.1)
