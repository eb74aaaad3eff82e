"""Round-2 fix regressions (VERDICT.md "What's wrong" + ADVICE.md):

- range-partitioned KS is the default and its plan has no unpartitioned
  window over row-scale data
- LSH hot buckets produce (star) pairs instead of silently dropping, and
  the drop metric is surfaced
- banded-LSH cosine near-dup matches the exact path on small data
- referential_violations returns the same shape on both join strategies
- variant uniqueItems does not collide values of different JSON types
- chi_square_drift merges NULL categories across sides (null-safe join)
"""

import pytest
from pyspark.sql import functions as F

from jsonschema_rs_spark.operators import dedup as dd
from jsonschema_rs_spark.operators import similarity as sim
from jsonschema_rs_spark.operators import table_checks as tc


def physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# -- KS ---------------------------------------------------------------------


def test_ks_scalable_matches_exact_and_no_global_window(spark):
    a = spark.range(900).select(((F.col("id") * 37) % 101)
                                .cast("double").alias("x"))
    b = spark.range(700).select(((F.col("id") * 17) % 89)
                                .cast("double").alias("x"))
    exact = tc.ks_statistic_exact(a, b, "x").first()
    scal = tc.ks_statistic_exact_scalable(a, b, "x").first()
    assert scal["n_a"] == exact["n_a"] and scal["n_b"] == exact["n_b"]
    assert scal["ks_stat"] == pytest.approx(exact["ks_stat"], abs=1e-12)
    # every Window in the scalable plan is scoped to a range partition —
    # the global-window single-task sort can't silently come back
    p = physical(tc.ks_statistic_exact_scalable(a, b, "x"))
    for line in p.splitlines():
        if "windowspecdefinition" in line:
            assert "__part" in line, f"unpartitioned window: {line}"


def test_ks_query_uses_scalable_plan(spark):
    """Every window over DATA-sized input must be partitioned by the
    range bucket (__part). The one exception is the sketch branch's
    point-CDF window, which is over the rank-selected quantile points —
    ≤2k rows by construction, marked by its __qpt order column."""
    from jsonschema_rs_spark.queries import ks_events_value
    p = physical(ks_events_value(spark, "/root/testdata/sf0.001"))
    for line in p.splitlines():
        if "windowspecdefinition" in line:
            assert "__part" in line or "__qpt" in line, line


# -- LSH hot buckets --------------------------------------------------------


@pytest.fixture(scope="module")
def hot_docs(spark):
    """1000 byte-identical docs (one degenerate LSH bucket) + 3 distinct."""
    same = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate text repeated everywhere").alias("text"))
    other = spark.createDataFrame(
        [(2001, "completely different text about apples and pears"),
         (2002, "completely different text about apples and plums"),
         (2003, "unrelated third document mentioning zebras only")],
        "doc_id long, text string")
    return same.unionAll(other)


def test_hot_bucket_emits_star_pairs_not_silence(spark, hot_docs):
    pairs = dd.minhash_lsh_candidates(hot_docs, num_hashes=16, bands=4,
                                      max_bucket=50)
    got = pairs.collect()
    ids_in_pairs = {r["id_a"] for r in got} | {r["id_b"] for r in got}
    # every one of the 1000 identical docs is linked (star around min id)
    assert set(range(1000)) <= ids_in_pairs
    # star pairs: linear (k-1 per band), not k*(k-1)/2 ≈ 500k
    n_hot = sum(1 for r in got if r["id_a"] < 1000 and r["id_b"] < 1000)
    assert n_hot == 999
    # representative is the min id
    assert all(r["id_a"] == 0 for r in got
               if r["id_a"] < 1000 and r["id_b"] < 1000)


def test_hot_bucket_pairs_survive_verify_and_cc(spark, hot_docs):
    ver = dd.minhash_near_duplicates(hot_docs, num_hashes=16, bands=4,
                                     threshold=0.9)
    # identical text → jaccard 1 → all 999 star pairs survive the verify
    hot = ver.where((F.col("id_a") < 1000) & (F.col("id_b") < 1000))
    assert hot.count() == 999
    comps = dd.connected_components(hot)
    assert comps.select("component").distinct().count() == 1


def test_lsh_bucket_metrics_surfaces_oversized(spark, hot_docs):
    m = dd.lsh_bucket_metrics(hot_docs, num_hashes=16, bands=4,
                              max_bucket=50).first()
    assert m["n_oversized"] >= 1
    assert m["max_bucket_size"] == 1000
    assert m["n_ids_in_oversized"] >= 1000


def test_small_buckets_unchanged_by_cap_fix(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta"),
         (3, "totally different words here now")],
        "doc_id long, text string")
    pairs = dd.minhash_lsh_candidates(docs, num_hashes=16, bands=4)
    assert [(r["id_a"], r["id_b"]) for r in pairs.collect()] == [(1, 2)]


# -- banded cosine LSH ------------------------------------------------------


def test_banded_cosine_lsh_matches_exact(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    exact = {(r["id_a"], r["id_b"], r["sim"]) for r in
             sim.near_duplicates_by_cosine(emb, threshold=0.5,
                                           exact=True).collect()}
    lsh = {(r["id_a"], r["id_b"], r["sim"]) for r in
           sim.near_duplicates_by_cosine(emb, threshold=0.5,
                                         exact=False).collect()}
    assert lsh == exact


def test_banded_cosine_lsh_no_cartesian(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    p = physical(sim.near_duplicates_by_cosine(emb, threshold=0.5))
    assert "CartesianProduct" not in p


# -- referential shape ------------------------------------------------------


def test_referential_same_shape_both_strategies(spark):
    fact = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y"), (4, "ok")], "id long, ref string")
    dim = spark.createDataFrame([("ok",)], "key string")
    bcast = tc.referential_violations(fact, "ref", dim, "key", dim_rows=1)
    shuf = tc.referential_violations(fact, "ref", dim, "key",
                                     dim_rows=10**9, broadcast_limit=10)
    b = sorted((r["id"], r["ref"]) for r in bcast.collect())
    s = sorted((r["id"], r["ref"]) for r in shuf.collect())
    # both: EVERY dangling fact row (so groupBy(key).count() gives true
    # occurrence counts on either path)
    assert b == s == [(1, "x"), (2, "x"), (3, "y")]


# -- variant uniqueItems typed equality -------------------------------------


@pytest.mark.parametrize("doc,valid", [
    ('[true, "true"]', True),          # boolean vs string
    ('[[1], "[1]"]', True),            # array vs its JSON text
    ('[{"a":1}, "{\\"a\\":1}"]', True),  # object vs its JSON text
    ('[1, 1.0]', False),               # numeric equality across types
    ('[null, "null"]', True),
    ('[1, "1"]', True),                # number vs string
    ('[true, 1]', True),               # draft 2020-12: true != 1
    ('[[1,2],[1,2]]', False),
])
def test_unique_items_type_classes(spark, doc, valid):
    from jsonschema_rs_spark.compiler.variant import compile_json_schema
    plan = compile_json_schema({"type": "array", "uniqueItems": True})
    df = spark.createDataFrame([(doc,)], "j string")
    got = plan.with_validation(df, "j").first()["valid"]
    assert got == valid, doc


# -- chi-square null category -----------------------------------------------


def test_chi_square_null_category_merges(spark):
    a = spark.createDataFrame([("x",), ("x",), (None,), (None,)],
                              "c string")
    b = spark.createDataFrame([("x",), (None,), (None,), (None,)],
                              "c string")
    r = tc.chi_square_drift(a, b, "c").first()
    # two categories (x, NULL) → dof = 1; a naive join would report dof=2
    # with an inflated chi2
    assert r["dof"] == 1
    assert r["n_obs"] == 4 and r["n_ref"] == 4
