"""The engine's headline queries over the driver testdata tables, each
paired with an ANSI-SQL oracle (DuckDB) in __spark_entry__.py.

Every query here exercises a distinct slice of SURVEY.md §2:
validation keywords (via compile_schema → Column-expression plans),
table-level checks (§2.9), and the training-data pipeline operators
(dedup / similarity / text analysis / multimodal).

Float discipline: every floating-point output column is rounded (6 dp)
on BOTH sides so the driver's value-hash comparison is stable.
Hash discipline: md5 only — reproducible in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jsonschema_rs_spark.compiler.compiler import compile_schema
from jsonschema_rs_spark.operators import dedup as dd
from jsonschema_rs_spark.operators import multimodal as mm
from jsonschema_rs_spark.operators import similarity as sim
from jsonschema_rs_spark.operators import table_checks as tc
from jsonschema_rs_spark.operators import text_analysis as ta


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _read_wide(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read + ensure enough partitions to use every core: a small table
    stored as ONE parquet file otherwise pins expression-heavy operators
    (shingling, simhash, mapInPandas) to a single task. The repartition
    shuffles only the small table; at 100 TB the input has thousands of
    splits and this is a no-op."""
    df = _read(spark, sf_dir, name)
    target = spark.sparkContext.defaultParallelism
    # file count bounds the scan's split count for small files; cheaper
    # probe than df.rdd.getNumPartitions() (which forces RDD conversion)
    if len(df.inputFiles()) < target:
        df = df.repartition(target)
    return df


# ---------------------------------------------------------------------------
# validation: scalar keywords over real tables
# ---------------------------------------------------------------------------

EVENTS_SCHEMA = {
    "type": "object",
    "required": ["event_type", "ts"],
    "properties": {
        "event_type": {"enum": ["click", "view", "signup", "purchase"]},
        "value": {"type": "number", "minimum": 0, "maximum": 150},
        "user_id": {"type": "integer", "minimum": 0},
        "props": {"type": "string", "pattern": "^\\{.*\\}$",
                  "minLength": 2, "maxLength": 64},
    },
}


def val_events_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    plan = compile_schema(EVENTS_SCHEMA, ev.schema)
    return plan.with_validation(ev).select("event_id", "valid")


def val_events_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    plan = compile_schema(EVENTS_SCHEMA, ev.schema)
    return plan.violations(ev, id_cols=["event_id"]) \
        .select("event_id", "keyword")


DOCS_SCHEMA = {
    "type": "object",
    "required": ["doc_id", "text"],
    "properties": {
        "lang": {"enum": ["en", "es", "de", "fr"]},
        "source": {"type": "string", "pattern": "^src[0-4]$"},
        "n_chars": {"type": "integer", "minimum": 50, "maximum": 500},
        "text": {"type": "string", "minLength": 20},
    },
}


def val_docs_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    plan = compile_schema(DOCS_SCHEMA, docs.schema)
    return plan.with_validation(docs).select("doc_id", "valid")


def val_docs_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    plan = compile_schema(DOCS_SCHEMA, docs.schema)
    return plan.summary(docs, by_partition=False)


LINEITEM_SCHEMA = {
    "type": "object",
    "properties": {
        "l_quantity": {"type": "number", "multipleOf": 5},
        "l_discount": {"type": "number", "minimum": 0,
                       "exclusiveMaximum": 0.08},
        "l_returnflag": {"enum": ["A", "N"]},
    },
}


def val_lineitem_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    plan = compile_schema(LINEITEM_SCHEMA, li.schema)
    v = plan.with_validation(li)
    return v.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("valid").cast("long")).alias("n_valid"),
    )


PROPS_JSON_SCHEMA = {
    "type": "object",
    "required": ["k"],
    "properties": {"k": {"type": "integer", "minimum": 0, "maximum": 50}},
}


def val_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-JSON path: validate the events.props JSON-string column
    through the VariantType compiler (per-row JSON type semantics)."""
    from jsonschema_rs_spark.compiler.variant import compile_json_schema

    ev = _read(spark, sf_dir, "events")
    plan = compile_json_schema(PROPS_JSON_SCHEMA)
    return plan.with_validation(ev, "props", mode="flag") \
        .select("event_id", "valid")


# typed-path composition keywords ($ref / oneOf / not / if-then / const)
# over a real table — driver-oracle coverage for the keywords the suite
# queries exercise only on the variant path
EVENTS_COMPOSED_SCHEMA = {
    "type": "object",
    "$defs": {"nonneg": {"minimum": 0}},
    "properties": {
        "value": {"$ref": "#/$defs/nonneg"},
        "user_id": {"oneOf": [{"maximum": 100}, {"minimum": 900}]},
        "event_type": {"not": {"const": "error"}},
        "props": {"anyOf": [{"const": "{}"}, {"minLength": 10}]},
    },
    "if": {"properties": {"event_type": {"const": "purchase"}},
           "required": ["event_type"]},
    "then": {"properties": {"value": {"exclusiveMinimum": 0}}},
}


def val_events_composed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    plan = compile_schema(EVENTS_COMPOSED_SCHEMA, ev.schema)
    return plan.with_validation(ev).select("event_id", "valid")


def val_docs_unique_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-path uniqueItems + minItems over a derived array<string>."""
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select("doc_id",
                       F.split(F.col("text"), " ").alias("toks"))
    plan = compile_schema({"type": "array", "uniqueItems": True,
                           "minItems": 1}, toks.schema, column="toks")
    return plan.with_validation(toks).select("doc_id", "valid")


def val_spans_unevaluated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-path unevaluatedProperties with allOf coverage over the
    interleaved spans structs: media_ref is NOT declared by any
    applicator, so any span carrying one is an unevaluated property."""
    df = derived_spans_df(spark, sf_dir)
    schema = {
        "type": "array",
        "items": {"type": "object",
                  "allOf": [{"properties": {"kind": {}, "text": {}}}],
                  "properties": {"offset": {}},
                  "unevaluatedProperties": False},
    }
    plan = compile_schema(schema, df.schema, column="spans")
    return plan.with_validation(df).select("doc_id", "valid")


# ---------------------------------------------------------------------------
# validation: derived interleaved spans (array applicators — the north-rule
# document shape, derived deterministically from documents.text so the
# DuckDB oracle can re-derive the identical table)
# ---------------------------------------------------------------------------

SPANS_SCHEMA = {
    "type": "array",
    "minItems": 1,
    "maxItems": 500,
    "items": {
        "type": "object",
        "required": ["kind", "offset"],
        "properties": {
            "kind": {"enum": ["text", "image"]},
            "text": {"type": "string", "minLength": 1, "maxLength": 6},
            "offset": {"type": "integer", "minimum": 0},
        },
    },
    "contains": {
        "type": "object",
        "properties": {"kind": {"const": "image"}},
        "required": ["kind"],
    },
}


def derived_spans_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text → interleaved spans: token i becomes a span; every
    5th span is an 'image' with a media_ref derived from the token's md5.
    EXACTLY mirrored by SQL in the oracle (split on single space, 0-based
    index arithmetic)."""
    docs = _read(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    spans = F.transform(toks, lambda t, i: F.struct(
        F.when(i % 5 == 4, F.lit("image")).otherwise(F.lit("text"))
        .alias("kind"),
        t.alias("text"),
        F.when(i % 5 == 4,
               F.concat(F.lit("asset-"), F.substring(F.md5(t), 1, 8)))
        .otherwise(F.lit(None).cast("string")).alias("media_ref"),
        (i * 10).cast("int").alias("offset"),
    ))
    return docs.select("doc_id", spans.alias("spans"))


def val_spans_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = derived_spans_df(spark, sf_dir)
    plan = compile_schema(SPANS_SCHEMA, df.schema, column="spans")
    return plan.with_validation(df).select("doc_id", "valid")


def val_spans_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = derived_spans_df(spark, sf_dir)
    plan = compile_schema(SPANS_SCHEMA, df.schema, column="spans")
    return (plan.violations(df, id_cols=["doc_id"])
            .groupBy("keyword").agg(F.count(F.lit(1)).alias("n_violations")))


# ---------------------------------------------------------------------------
# table-level checks (§2.9)
# ---------------------------------------------------------------------------


def stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    s = tc.column_stats(docs, ["doc_id", "text", "lang", "source", "n_chars"],
                        exact_distinct=True)
    return s.select("column", "n_rows", "n_nulls",
                    F.round("null_rate", 6).alias("null_rate"),
                    "n_distinct", "min_value", "max_value")


def val_docs_keyword_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Violation counts per keyword (≈ evaluate().list() rollup)."""
    docs = _read(spark, sf_dir, "documents")
    plan = compile_schema(DOCS_SCHEMA, docs.schema)
    return (plan.violations(docs, id_cols=["doc_id"])
            .groupBy("keyword").agg(F.count(F.lit(1)).alias("n_violations")))


def val_docs_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical violation rollup (≈ evaluate().hierarchical(),
    evaluation.rs:416): per schema-location prefix, violations summed
    over the subtree."""
    docs = _read(spark, sf_dir, "documents")
    plan = compile_schema(DOCS_SCHEMA, docs.schema)
    return plan.hierarchy(docs)


OUTPUT_UNITS_SCHEMA = {
    "type": "object",
    "properties": {
        "doc_id": {"type": "integer", "minimum": 0},
        "text": {"type": "string", "minLength": 100},
        "lang": {"enum": ["en", "de", "fr", "es"]},
        "n_chars": {"type": "integer", "minimum": 100},
    },
    "required": ["doc_id", "text", "lang"],
}


def output_units_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Output v1 LIST format over the documents table
    (compiler/output.py; evaluation.rs:252 list()): each row serializes
    to JSON, evaluates to the flat unit list, and reports per-doc unit
    counts — (doc_id, n_units, n_valid_units, valid). The DuckDB oracle
    recomputes every unit's existence and validity from first
    principles, so the whole unit tree (root/type/required/properties +
    three-or-two units per present property) is value-checked per row.
    """
    from jsonschema_rs_spark.compiler.variant import compile_json_schema
    docs = _read_wide(spark, sf_dir, "documents")
    plan = compile_json_schema(OUTPUT_UNITS_SCHEMA)
    j = docs.select("doc_id", F.to_json(F.struct(
        "doc_id", "text", "lang", "n_chars")).alias("j"))
    out = plan.with_output(j, "j", format="list")
    parsed = F.from_json(
        "output",
        "struct<valid:boolean, details:array<struct<valid:boolean>>>")
    return (out.withColumn("p", parsed)
            .select("doc_id",
                    F.size("p.details").alias("n_units"),
                    F.size(F.filter("p.details", lambda d: d["valid"]))
                    .alias("n_valid_units"),
                    F.col("p.valid").alias("valid")))


OUTPUT_UNITS_EXT_SCHEMA = {
    "not": {"required": ["media_ref"]},
    "if": {"properties": {"text": {"minLength": 100}}},
    "then": {"properties": {"n_chars": {"minimum": 100}}},
    "else": {"properties": {"lang": {"enum": ["en", "de"]}}},
    "dependentSchemas": {"source": {"required": ["text"]}},
    "propertyNames": {"pattern": "^[a-z_]+$"},
    "patternProperties": {"^(lang|source)$": {"type": "string"}},
    "unevaluatedProperties": {"type": ["integer", "string"]},
}


def output_units_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output v1 LIST format exercising the round-3 unit families:
    nested not / if-then-else / dependentSchemas branch trees, per-name
    propertyNames and patternProperties subtrees, and per-uncovered-name
    unevaluatedProperties subtrees with the validity-conditioned
    coverage walk (evaluation.rs hierarchical semantics). The DuckDB
    oracle recomputes every unit's existence + validity from first
    principles: 33 units when len(text)>=100 (then-branch active,
    only doc_id unevaluated) vs 37 otherwise (else-branch active,
    doc_id/text/n_chars unevaluated)."""
    from jsonschema_rs_spark.compiler.variant import compile_json_schema
    docs = _read_wide(spark, sf_dir, "documents")
    plan = compile_json_schema(OUTPUT_UNITS_EXT_SCHEMA)
    j = docs.select("doc_id", F.to_json(F.struct(
        "doc_id", "text", "lang", "source", "n_chars")).alias("j"))
    out = plan.with_output(j, "j", format="list")
    parsed = F.from_json(
        "output",
        "struct<valid:boolean, details:array<struct<valid:boolean>>>")
    return (out.withColumn("p", parsed)
            .select("doc_id",
                    F.size("p.details").alias("n_units"),
                    F.size(F.filter("p.details", lambda d: d["valid"]))
                    .alias("n_valid_units"),
                    F.col("p.valid").alias("valid")))


def uniq_ratio_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders")
    r = tc.assert_unique_ratio(orders, ["o_custkey"])
    return r.select("n_rows", "n_keys", "n_dup_keys",
                    F.round("dup_row_ratio", 6).alias("dup_row_ratio"))


def uniq_orders_custkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders")
    return tc.uniqueness_violations(orders, ["o_custkey"], salt_buckets=8) \
        .select(F.col("o_custkey"), F.col("n_dup"))


def ri_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders")
    cust = _read(spark, sf_dir, "customer")
    bad = tc.referential_violations(orders, "o_custkey", cust, "c_custkey")
    return bad.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_dangling"))


def ri_events_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    cust = _read(spark, sf_dir, "customer")
    bad = tc.referential_violations(ev, "user_id", cust, "c_custkey")
    return bad.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_dangling"))


def ks_events_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS via the RANGE-PARTITIONED plan (the scale
    default): per-partition windows + broadcast prefix offsets, never a
    single-partition global sort. ks_statistic_exact (global window) is
    demoted to a small-scale test oracle (test_table_checks).

    r5: the SKETCH path is certified here too — the in-plan
    quantile-point variant (ks_statistic_sketch_inplan, the math the
    100 TB approxQuantile summary converges to) runs alongside and the
    documented |D_sketch − D_exact| ≤ 2/k bound is asserted as a
    column, recomputed identically by the DuckDB oracle."""
    ev = _read(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "click")
    b = ev.where(F.col("event_type") == "error")
    k = tc.KS_SKETCH_K  # shared with the oracle SQL template
    both = tc.ks_exact_and_sketch(a, b, "value", k=k)
    # compare the 6dp-rounded stats (the cross-engine-stable renderings
    # the oracle hashes) with a 2-ulp-of-rounding slack on the bound
    ks_r = F.round("ks_stat", 6)
    sk_r = F.round("ks_sketch", 6)
    return both.select(
        "n_a", "n_b",
        ks_r.alias("ks_stat"),
        sk_r.alias("ks_sketch"),
        (F.abs(ks_r - sk_r) <= F.lit(2.0 / k + 2e-6)).alias("within_bound"))


def chisq_events_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    # split point as a broadcast scalar — one tiny agg joined into the
    # plan instead of a driver .first() round-trip (integer floor-division
    # on both sides; duckdb CAST rounds half-even)
    mid = F.broadcast(
        ev.agg(F.floor(F.max("event_id") / 2).cast("long").alias("__mid")))
    with_mid = ev.crossJoin(mid)
    a = with_mid.where(F.col("event_id") <= F.col("__mid"))
    b = with_mid.where(F.col("event_id") > F.col("__mid"))
    r = tc.chi_square_drift(a, b, "event_type")
    return r.select(F.round("chi2", 6).alias("chi2"), "dof", "n_obs", "n_ref")


def drift_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch path of the streaming drift operator: 6-hour event-time
    windows of events.event_type, goodness-of-fit chi-square vs the
    table's own global distribution (reference_proportions — one
    groupBy, category-count sized)."""
    from jsonschema_rs_spark.streaming.drift import (
        chi_square_drift_stream, reference_proportions)

    ev = _read(spark, sf_dir, "events")
    probs = reference_proportions(ev, "event_type")
    out = chi_square_drift_stream(ev, "event_type", "ts", probs,
                                  window="6 hours")
    return out.select(F.col("window_start").alias("ws"), "n", "chi2",
                      "dof", "n_unexpected")


def hist_orders_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _read(spark, sf_dir, "orders")
    return tc.numeric_histogram(orders, "o_totalprice", n_buckets=10,
                                lo=0.0, hi=500_000.0)


# ---------------------------------------------------------------------------
# text analysis / dedup
# ---------------------------------------------------------------------------


def text_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read_wide(spark, sf_dir, "documents")
    out = ta.with_text_features(docs)  # staged: each regex runs once
    return out.select(
        "doc_id", "n_tokens_ws", "n_tokens_bpe", "lang_pred",
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("quality", 6).alias("quality"),
        "fp",
    )


def fp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read_wide(spark, sf_dir, "documents")
    return (docs.select(ta.fingerprint(F.col("text")).alias("fp"))
            .groupBy("fp").agg(F.count(F.lit(1)).alias("n_docs")))


def minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read_wide(spark, sf_dir, "documents")
    staged = dd.with_minhash(docs, "text", "sig_arr", num_hashes=8, n=3)
    return staged.select(
        "doc_id",
        F.array_join(F.transform(F.col("sig_arr"),
                                 lambda x: x.cast("string")), ",").alias("sig"))


def simhash_vals(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read_wide(spark, sf_dir, "documents")
    return dd.with_simhash(docs, "text").select("doc_id", "simhash")


def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs via the pigeonhole-banded hamming
    join. With max_hamming < chunks the pigeonhole guarantees FULL
    recall, so the all-pairs DuckDB oracle is an equality check on the
    result, not a recall bound."""
    docs = _read_wide(spark, sf_dir, "documents")
    return dd.simhash_near_duplicates(docs, "text", "doc_id",
                                      max_hamming=3, chunks=4)


def minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-duplicate pairs with threshold-adaptive banding
    (dedup.adaptive_minhash_banding: (22 hashes, 11 bands, r=2) at
    threshold 0.5); the DuckDB oracle re-derives the identical pipeline
    at the same derived banding."""
    docs = _read_wide(spark, sf_dir, "documents")
    return dd.minhash_near_duplicates(docs, num_hashes="auto",
                                      threshold=0.5)


def cc_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster labels: connected components via alternating
    large-star/small-star contraction (dedup._connected_components_star,
    Kiveris et al. SoCC'14 — the O(log n)-rounds 100 TB path,
    diameter-independent) over the same threshold-adaptive MinHash
    near-dup pairs as minhash_pairs. The DuckDB oracle computes the
    min-label fixpoint exactly via a recursive transitive-closure CTE,
    so a green row certifies the distributed star fixpoint equals the
    true components. (The propagate path is differential-tested against
    star and a union-find in pytest; `auto` runs propagate and falls
    back to star on non-convergence.)"""
    docs = _read_wide(spark, sf_dir, "documents")
    pairs = dd.minhash_near_duplicates(docs, num_hashes="auto",
                                       threshold=0.5)
    return dd.connected_components(pairs, algorithm="star")


def pack_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (concatenate-then-chunk) of documents into
    512-token packs, sharded by language — one shuffle + one per-shard
    ordered window (operators/packing.py)."""
    from jsonschema_rs_spark.operators.packing import pack_sequences

    docs = _read(spark, sf_dir, "documents")
    return pack_sequences(docs, "text", "doc_id", budget=512,
                          shard_col="lang")


def jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram-Jaccard near-duplicate pairs with the stopword-
    shingle skew guard at its production default: a shingle shared by k
    docs yields k^2 candidate pairs, so hot shingles are dropped before
    the co-occurrence self-join (measured 76s -> 4s at sf0.1; the guard
    is deterministic, so the DuckDB oracle mirrors it exactly). At
    100 TB this runs AFTER LSH candidate generation
    (minhash_near_duplicates), not standalone."""
    docs = _read_wide(spark, sf_dir, "documents")
    return dd.ngram_jaccard_pairs(docs, "text", "doc_id", n=3,
                                  threshold=0.5, max_shingle_freq=1000)


def curate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full curation pipeline: quality gate → exact dedup → MinHash-LSH
    near-dedup → surviving doc_ids. Banding is threshold-adaptive
    ((39 hashes, 13 bands, r=3) at Jaccard 0.6), mirrored exactly by
    the DuckDB oracle. The exact-dedup boundary is MATERIALIZED to a
    pid-scoped /tmp stage (the 100 TB production shape — the lazy
    composition re-reads the source scan ~20×; A/B at sf0.1:
    11.6 s lazy → 8.1 s staged, identical survivors). The stage write
    runs eagerly inside curate(); mode=overwrite makes re-runs safe,
    and the pid scope keeps concurrent processes apart."""
    import hashlib
    import os

    from jsonschema_rs_spark.operators.curate import curate

    docs = _read_wide(spark, sf_dir, "documents")
    stage = (f"/tmp/jrs_curate_stage_{os.getpid()}_"
             f"{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}")
    return curate(docs, quality_threshold=0.7, num_hashes="auto",
                  jaccard_threshold=0.6,
                  stage_dir=stage).select("doc_id")


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


def sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return sim.brute_force_topk(emb, q, k=5)


def ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return sim.ann_topk_lsh(emb, q, k=5, n_planes=8, dim=64)


def ann_lsh_mp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN (n_probe=8, max_flip_bits=2): each query
    probes its own bucket plus the 7 lowest-score perturbation-set
    flips (similarity.probe_buckets, Lv et al. VLDB'07). The DuckDB
    oracle re-derives the probe SEQUENCE itself — margins, rank,
    subset scores, XOR masks — so a green row certifies the walk,
    not just the cosine re-rank. Recall on this data: 0.32 (hamming-1
    ceiling) → 0.42 at bits=2/n_probe=64; see test_round4_fixes."""
    emb = _read(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return sim.ann_topk_lsh(emb, q, k=5, n_planes=8, dim=64,
                            n_probe=8, max_flip_bits=2)


def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN: hash-seeded coarse quantizer (deterministic, so the
    DuckDB oracle re-derives the identical index), n_probe inverted
    lists re-ranked exactly."""
    emb = _read(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return sim.ivf_topk(emb, q, k=5, n_centroids=16, n_probe=4)


def ndcos_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH path (the scale default — linear shuffle, no crossJoin);
    the DuckDB oracle stays the exact O(N^2) self-join, so a green row
    also certifies the LSH recall on this data."""
    emb = _read(spark, sf_dir, "embeddings")
    return sim.near_duplicates_by_cosine(emb, threshold=0.5, exact=False)


# ---------------------------------------------------------------------------
# windowed rollup + multimodal
# ---------------------------------------------------------------------------


def rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "sum_value")
    )


def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media blobs derived deterministically from documents.text (utf-8
    bytes of the md5 hex, so the DuckDB oracle can recompute every
    feature of the deterministic stub formula); the decode itself stays
    the stubbed step (multimodal.py)."""
    docs = _read_wide(spark, sf_dir, "documents")
    media = docs.select(
        F.concat(F.lit("asset-"),
                 F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8))
        .alias("asset_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int"))
        .alias("media_type"),
        F.to_binary(F.md5(F.col("text")), F.lit("utf-8")).alias("content"),
    )
    return mm.extract_media_features(media)


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def _suite_queries():
    from jsonschema_rs_spark.suite import suite_queries

    return suite_queries()


# Registry ORDER is load-bearing: the driver's correctness harness
# reports the first 50 entries, so the similarity/dedup pipeline plans
# (rewritten round 3, truncated out of CORRECTNESS_r03) lead, the
# vendored-suite block (consolidated 21 -> 9 merged families, suite.py
# MERGED_FAMILIES) closes. 50 entries total — exactly at the cap.
QUERIES = {
    # similarity / dedup / pipeline (the 10 r3-truncated queries first)
    "ndcos_pairs": ndcos_pairs,
    "ann_ivf": ann_ivf,
    "minhash_pairs": minhash_pairs,
    "cc_groups": cc_groups,
    "jaccard_pairs": jaccard_pairs,
    "pack_docs": pack_docs,
    "curate_docs": curate_docs,
    "sim_topk": sim_topk,
    "ann_lsh": ann_lsh,
    "ann_lsh_mp": ann_lsh_mp,
    "rollup_events": rollup_events,
    "mm_features": mm_features,
    # dedup signatures / text analysis
    "simhash_pairs": simhash_pairs,
    "simhash_vals": simhash_vals,
    "minhash_sigs": minhash_sigs,
    "fp_counts": fp_counts,
    "text_features": text_features,
    # table-level checks
    "stats_documents": stats_documents,
    "uniq_orders_custkey": uniq_orders_custkey,
    "uniq_ratio_orders": uniq_ratio_orders,
    "ri_orders_customer": ri_orders_customer,
    "ri_events_customer": ri_events_customer,
    "ks_events_value": ks_events_value,
    "chisq_events_halves": chisq_events_halves,
    "drift_windows": drift_windows,
    "hist_orders_total": hist_orders_total,
    # validation over real tables
    "val_events_flag": val_events_flag,
    "val_events_violations": val_events_violations,
    "val_docs_flag": val_docs_flag,
    "val_docs_summary": val_docs_summary,
    "val_lineitem_flag": val_lineitem_flag,
    "val_json_props": val_json_props,
    "val_spans_flag": val_spans_flag,
    "val_spans_violations": val_spans_violations,
    "val_events_composed": val_events_composed,
    "val_docs_unique_tokens": val_docs_unique_tokens,
    "val_spans_unevaluated": val_spans_unevaluated,
    "val_docs_keyword_summary": val_docs_keyword_summary,
    "val_docs_hierarchy": val_docs_hierarchy,
    "output_units_docs": output_units_docs,
    "output_units_ext": output_units_ext,
    # vendored-suite verdict parity (merged families)
    **_suite_queries(),
}
