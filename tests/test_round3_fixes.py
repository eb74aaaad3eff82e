"""Round-3 regression tests: VERDICT r2 perf prescriptions and ADVICE r2
bug fixes stay fixed.

- banded-cosine signature is single-pass and n_planes is honored
  (ADVICE r2: n_planes silently ignored by the LSH path)
- SimHash single-traversal vote accumulator matches a pure-Python
  reference bit-for-bit
- IVF scalar assignment (max_by) gives the same nearest-centroid result
  as the old window-rank formulation
"""

import hashlib

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from jsonschema_rs_spark.operators import dedup as dd
from jsonschema_rs_spark.operators import similarity as sim


# -- n_planes / bands contract ---------------------------------------------


def test_n_planes_derives_banding(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .select("vec_id", "embedding")
    # n_planes=6, r=3 → 2 bands: recall must still find the identical pair
    two = emb.limit(1).select(F.lit(900000).alias("vec_id"), "embedding") \
        .union(emb.limit(1).select(F.lit(900001), "embedding"))
    df = emb.union(two)
    got = sim.near_duplicates_by_cosine(df, threshold=0.999, n_planes=6)
    assert (900000, 900001) in {(r["id_a"], r["id_b"])
                                for r in got.collect()}


def test_n_planes_bands_conflict_raises(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError, match="inconsistent banding"):
        sim.near_duplicates_by_cosine(emb, n_planes=12, bands=16,
                                      planes_per_band=3)
    # consistent spelling of the same banding is fine
    sim.near_duplicates_by_cosine(emb, n_planes=48, bands=16,
                                  planes_per_band=3)


def test_signature_udf_matches_per_plane_buckets(spark):
    """The vectorized matmul signature must reproduce lsh_bucket()'s
    per-band packed sign bits exactly (same planes, same bit order)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .limit(50)
    bands, r = 4, 3
    planes = sim.hyperplane_signs(bands * r, 64)
    udf = sim.banded_signature_udf(planes, r)
    per_band = [
        sim.lsh_bucket(F.col("embedding"), planes[b * r:(b + 1) * r])
        for b in range(bands)
    ]
    rows = emb.select(udf(F.col("embedding")).alias("sig"),
                      F.array(*per_band).alias("ref")).collect()
    assert rows and all(list(x["sig"]) == list(x["ref"]) for x in rows)


# -- SimHash single-traversal ----------------------------------------------


def _simhash_py(text: str, bits: int = 32) -> int:
    toks = text.lower().split()
    votes = [0] * bits
    for t in toks:
        h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
        for j in range(bits):
            votes[j] += 1 if (h >> j) & 1 else -1
    return sum(1 << j for j in range(bits) if votes[j] > 0)


def test_simhash_single_traversal_matches_python(spark):
    texts = ["the quick brown fox jumps over the lazy dog",
             "pack my box with five dozen liquor jugs",
             "single",
             "a a a a b"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = {r["doc_id"]: r["simhash"]
           for r in dd.with_simhash(df, "text").collect()}
    for i, t in enumerate(texts):
        assert got[i] == _simhash_py(t), t


def test_simhash_one_aggregate_in_plan(spark):
    """VERDICT r2 #7: 1 vote aggregate over the token-hash array, not 32."""
    df = spark.createDataFrame([(1, "hello world")],
                               "doc_id long, text string")
    plan = dd.with_simhash(df, "text")._jdf.queryExecution() \
        .optimizedPlan().toString()
    # the staged token-hash array is traversed by exactly two aggregates
    # (vote accumulation + sign pack), not bits=32 of them
    assert plan.count("aggregate(") <= 2


# -- IVF scalar assignment parity ------------------------------------------


def test_ivf_assignment_matches_window_rank(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = sim.ivf_centroids(emb, n_centroids=8)
    new = {r["vec_id"]: r["centroid_id"]
           for r in sim._assign_to_centroid(emb, cents, "vec_id",
                                            "embedding").collect()}
    # old formulation, inline: rank by (sim desc, centroid_id asc)
    scored = emb.select("vec_id", F.col("embedding").alias("__v"),
                        sim.norm(F.col("embedding")).alias("__n")) \
        .crossJoin(F.broadcast(
            cents.select("centroid_id", F.col("cvec").alias("__c"),
                         sim.norm(F.col("cvec")).alias("__cn"))))
    s = sim.dot(F.col("__v"), F.col("__c")) / (F.col("__n") * F.col("__cn"))
    w = Window.partitionBy("vec_id").orderBy(F.col("__sim").desc(),
                                             F.col("centroid_id"))
    old = {r["vec_id"]: r["centroid_id"]
           for r in scored.withColumn("__sim", F.round(s, 9))
           .withColumn("__r", F.row_number().over(w))
           .where(F.col("__r") == 1).select("vec_id", "centroid_id")
           .collect()}
    assert new == old
