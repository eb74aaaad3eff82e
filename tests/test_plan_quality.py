"""Physical-plan assertions: the properties that make this engine work at
100 TB are checked here so they can't silently regress —

- validation is ONE projection over the scan: no Exchange (shuffle), no
  Python (BatchEvalPython/ArrowEvalPython) in the plan
- filters reach the parquet scan (PushedFilters) and column pruning
  reaches ReadSchema
- referential checks broadcast small dims (BroadcastHashJoin) and
  shuffle big ones (SortMergeJoin)
- staged operators evaluate their expensive subexpression exactly once
  (projection barriers survive optimization)
"""

import pytest
from pyspark.sql import functions as F

from jsonschema_rs_spark import compile_schema
from jsonschema_rs_spark.docspec import DOC_SPEC_FULL, default_options
from jsonschema_rs_spark.operators import table_checks as tc


def physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark, tmp_path_factory):
    from jsonschema_rs_spark.datagen import documents_df
    p = str(tmp_path_factory.mktemp("plans") / "docs")
    documents_df(spark, 1000).drop("_vclass").write.parquet(p)
    return spark.read.parquet(p)


def test_validation_no_shuffle_no_python(spark, docs):
    plan = compile_schema(DOC_SPEC_FULL, docs.schema, default_options())
    for mode in ("flag", "verbose"):
        p = physical(plan.with_validation(docs, mode))
        assert "Exchange" not in p
        assert "EvalPython" not in p  # no row-wise or arrow Python eval


def test_filter_pushdown_reaches_scan(spark, docs):
    plan = compile_schema(DOC_SPEC_FULL, docs.schema, default_options())
    v = plan.with_validation(docs).where(F.col("doc_id") > "doc-5")
    p = physical(v)
    assert "PushedFilters: [" in p
    assert "GreaterThan(doc_id" in p or "doc_id" in p.split(
        "PushedFilters")[1][:200]


def test_column_pruning(spark, docs):
    sub = docs.select("doc_id")
    p = physical(sub)
    scan = p.split("ReadSchema:")[1][:200]
    assert "spans" not in scan  # 95% of bytes skipped for id-only reads


def test_referential_broadcast_vs_shuffle(spark):
    fact = spark.range(10_000).select(
        (F.col("id") % 100).cast("string").alias("ref"))
    dim = spark.range(100).select(F.col("id").cast("string").alias("key"))
    bcast = tc.referential_violations(fact, "ref", dim, "key", dim_rows=100)
    assert "BroadcastHashJoin" in physical(bcast)
    # big-dim path: with auto-broadcast off (as it would be for a dim that
    # truly exceeds the threshold) the anti-join becomes a shuffle join,
    # and the fact side is pre-shrunk to DISTINCT keys
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        shuf = tc.referential_violations(fact, "ref", dim, "key",
                                         dim_rows=10**9, broadcast_limit=10)
        p = physical(shuf)
        assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
        assert "LeftAnti" in p
        assert p.count("HashAggregate") >= 2  # distinct fact keys first
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_uniqueness_partial_aggregation(spark):
    df = spark.range(1000).select((F.col("id") % 7).alias("k"))
    p = physical(tc.uniqueness_violations(df, ["k"]))
    # map-side partial agg before the exchange: two HashAggregates
    assert p.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning(k" in p


def test_column_stats_single_scan(spark, docs):
    s = tc.column_stats(docs, ["doc_id"])
    p = physical(s)
    assert p.count("FileScan") == 1  # ONE pass for all the stats


def test_minhash_staging_survives_optimizer(spark, docs):
    from jsonschema_rs_spark.operators.dedup import with_minhash
    flat = docs.select("doc_id", F.lit("a b c d e f g").alias("text"))
    out = with_minhash(flat, "text", "sig", num_hashes=16)
    o = optimized(out)
    # base md5 computed once, not once per hash seed
    assert o.count("md5") == 1
    # normalize pipeline (2 regexp_replace) not duplicated per seed
    assert o.count("regexp_replace") <= 4


def test_text_features_staging(spark, docs):
    from jsonschema_rs_spark.operators.text_analysis import with_text_features
    flat = docs.select("doc_id", F.lit("some text here").alias("text"))
    o = optimized(with_text_features(flat))
    # each marker-regex scan appears once (5 langs/stopword sets + bpe +
    # punct + digit ≈ 8 regexp scans; quality/ratios REUSE them)
    assert o.count("regexp_count") <= 8


def test_json_variant_single_parse(spark):
    from jsonschema_rs_spark.compiler.variant import compile_json_schema
    df = spark.createDataFrame([('{"a":1}',)], "j string")
    plan = compile_json_schema({
        "type": "object", "required": ["a"],
        "properties": {"a": {"type": "integer", "minimum": 0}}})
    import re
    o = optimized(plan.with_validation(df, "j"))
    # the parse is staged into __v exactly once, not re-run per rule
    assert len(re.findall(r"(?i)parse_?json", o)) == 1
    assert "__v#" in o


def test_whole_stage_codegen_on_scalar_validation(spark):
    ev = spark.range(100).select(
        F.col("id").alias("user_id"),
        F.lit("click").alias("event_type"),
        (F.col("id") % 100).cast("double").alias("value"))
    schema = {"type": "object", "required": ["event_type"],
              "properties": {"value": {"minimum": 0, "maximum": 50},
                             "event_type": {"enum": ["click", "view"]}}}
    plan = compile_schema(schema, ev.schema)
    p = physical(plan.with_validation(ev))
    # '*(n)' prefix marks whole-stage-codegen'd operators in toString()
    assert "*(1) Project" in p or "*(1) Range" in p


def test_hierarchy_single_scan_one_shuffle(spark, docs):
    from jsonschema_rs_spark.docspec import DOC_SPEC_FULL, default_options
    plan = compile_schema(DOC_SPEC_FULL, docs.schema, default_options())
    p = physical(plan.hierarchy(docs))
    assert p.count("FileScan") == 1
    # one aggregation shuffle of (prefix, partial count) — plus AQE's
    # possible coalesce, but never a second scan-sized exchange
    assert p.count("Exchange hashpartitioning") == 1


def test_ivf_no_cartesian_and_broadcast_centroids(spark):
    from jsonschema_rs_spark.operators import similarity as sim
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.limit(4).select(F.col("vec_id").alias("query_id"), "embedding")
    p = physical(sim.ivf_topk(emb, q, k=3, n_centroids=8, n_probe=2))
    assert "CartesianProduct" not in p           # only broadcast NLJ
    assert "BroadcastNestedLoopJoin" in p        # tiny centroid table


def test_ivf_assignment_shuffles_scalars_not_vectors(spark):
    """VERDICT r2 #2: the centroid-assignment exchange must carry only
    (id, centroid_id, sim) scalars with a map-side partial max_by — not
    n_centroids copies of every embedding under a per-id Window rank."""
    from jsonschema_rs_spark.operators import similarity as sim
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = sim.ivf_centroids(emb, n_centroids=8)
    p = physical(sim._assign_to_centroid(cents=cents, corpus=emb,
                                         id_col="vec_id",
                                         vec_col="embedding"))
    # no per-id rank (the centroid SEEDING's tiny global row_number over
    # n_centroids rows is fine; a window partitioned by vec_id is not)
    assert "windowspecdefinition(vec_id" not in p
    assert "partial_max_by" in p                 # map-side combine
    # the aggregation exchange's input is the partial aggregate (Sort-
    # Aggregate: struct-ordered max_by isn't hash-aggregable), whose
    # output schema is scalars only — no array column rides the shuffle
    agg_lines = [ln for ln in p.splitlines()
                 if "Aggregate(" in ln and "max_by" in ln]
    assert agg_lines and all("embedding" not in ln and "__v" not in ln
                             for ln in agg_lines)


def test_banded_cosine_single_pass_signature(spark):
    """VERDICT r2 #1: the banded-LSH signature must be ONE vectorized
    pass (Arrow-batched matmul), not one interpreted zip_with+aggregate
    traversal per plane (48 with the defaults)."""
    from jsonschema_rs_spark.operators import similarity as sim
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    p = physical(sim.near_duplicates_by_cosine(emb, threshold=0.5))
    # the signature matmul runs once per self-join side (no common-
    # subexpression reuse across join sides in Spark), and the pair
    # verify runs exactly ONCE — the threshold filter must not duplicate
    # the Arrow round-trip (pair_cosine_udf is asNondeterministic to
    # stop Catalyst pushing the filter through the projection)
    assert p.count("pair_cos") == 1
    assert p.count("ArrowEvalPython") == 3
    # and no per-plane interpreted HOF traversals of the vector
    assert "zip_with" not in p and "aggregate(" not in p
    assert "CartesianProduct" not in p


def test_explode_does_not_inline_generator_into_scan_filter(spark, docs):
    """InferFiltersFromGenerate synthesizes `size(gen) > 0` and pushes it
    to the scan with the whole HOF shingle pipeline inlined — the
    interpreted tokenizer then re-runs per element_at reference
    (measured 38s vs 1s for a 5000-doc explode at sf0.1). get_spark
    excludes the rule; this pins it."""
    from jsonschema_rs_spark.operators.dedup import with_shingles
    flat = docs.select("doc_id", F.lit("a b c d e f g").alias("text"))
    sh = with_shingles(flat, "text", "__sh").select(F.explode("__sh"))
    o = optimized(sh)
    # without the exclusion the inferred filter inlines the tokenize
    # regexes ~5x; with it the pipeline appears exactly twice (the two
    # staged regexp_replace calls)
    assert o.count("regexp_replace") <= 2, o


def test_gather_verify_ships_ids_only(spark):
    """Broadcast-gather verify: candidate pairs reach the Arrow boundary
    as bare ids — no vector-attach joins after candidate generation (the
    join path has 3 joins: bucket self-join + 2 vector attaches; the
    gather path keeps only the bucket self-join)."""
    from jsonschema_rs_spark.operators import similarity as sim
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pg = physical(sim.near_duplicates_by_cosine(emb, threshold=0.5,
                                                broadcast_verify=True))
    pj = physical(sim.near_duplicates_by_cosine(emb, threshold=0.5,
                                                broadcast_verify=False))
    assert pg.count("Join") == 1 and pj.count("Join") == 3
    # verify runs once on both paths
    assert pg.count("pair_cos") == 1 and pj.count("pair_cos") == 1


def test_precision_modes_plan_shape(spark):
    """on_precision_loss='ignore' (default) keeps the variant validation
    plan Python-free; 'annotate'/'fail' stage the degradation pUDF ONCE
    (one ArrowEvalPython) however many consumers read it — valid, errors
    and the annotate column must share the staged __pdeg, not re-cross."""
    from jsonschema_rs_spark.compiler.variant import compile_json_schema
    from jsonschema_rs_spark.errors import ValidationOptions
    df = spark.createDataFrame([('{"a":1}',)], "j string")
    schema = {"type": "object",
              "properties": {"a": {"type": "integer", "minimum": 0}}}

    default_plan = physical(
        compile_json_schema(schema).with_validation(df, "j"))
    assert "EvalPython" not in default_plan

    for mode in ("annotate", "fail"):
        plan = compile_json_schema(
            schema, ValidationOptions(on_precision_loss=mode))
        p = physical(plan.with_validation(df, "j", mode="verbose"))
        assert p.count("ArrowEvalPython") == 1, (mode, p)
