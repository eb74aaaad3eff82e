"""Table-level checks (SURVEY.md §2.9): stats, uniqueness, referential
integrity, KS / chi-square drift — verified against hand-computed values
and numpy-computed oracles on small constructed frames."""

import math

import pytest
from pyspark.sql import functions as F

from jsonschema_rs_spark.operators import table_checks as tc


@pytest.fixture(scope="module")
def small(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, None, 30.0), (4, "a", None)],
        "id long, s string, x double")


def test_column_stats_exact(small):
    rows = {r["column"]: r for r in
            tc.column_stats(small, exact_distinct=True).collect()}
    assert rows["id"]["n_rows"] == 4
    assert rows["s"]["n_nulls"] == 1
    assert rows["s"]["null_rate"] == pytest.approx(0.25)
    assert rows["s"]["n_distinct"] == 2
    assert rows["x"]["min_value"] == "10.0"
    assert rows["x"]["max_value"] == "30.0"


def test_column_stats_approx_close(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 1000).alias("k"))
    r = {x["column"]: x for x in tc.column_stats(df).collect()}["k"]
    assert abs(r["n_distinct"] - 1000) / 1000 < 0.1


def test_numeric_histogram(spark):
    df = spark.range(100).select(F.col("id").cast("double").alias("v"))
    h = tc.numeric_histogram(df, "v", n_buckets=4, lo=0.0, hi=100.0)
    got = {r["bucket"]: r["n"] for r in h.collect()}
    # width_bucket: [0,25) -> 1 ... 25 values per bucket
    assert got[1] == 25 and got[2] == 25 and got[3] == 25
    assert got[4] + got.get(5, 0) == 25  # 100.0 not present; 99 in bucket 4


def test_uniqueness_violations(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), ("c",), ("c",), ("c",)], "k string")
    got = {r["k"]: r["n_dup"] for r in
           tc.uniqueness_violations(df, ["k"]).collect()}
    assert got == {"a": 2, "c": 3}
    # salted two-phase gives identical answer
    got_salted = {r["k"]: r["n_dup"] for r in
                  tc.uniqueness_violations(df, ["k"], salt_buckets=8).collect()}
    assert got_salted == got


def test_assert_unique_ratio(spark):
    df = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    r = tc.assert_unique_ratio(df, ["k"]).first()
    assert r["n_rows"] == 3 and r["n_keys"] == 2 and r["n_dup_keys"] == 1
    assert r["dup_row_ratio"] == pytest.approx(2 / 3)


def test_referential_violations_broadcast_and_shuffle(spark):
    fact = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "zz"), (4, "y")], "id long, ref string")
    dim = spark.createDataFrame([("x",), ("y",)], "key string")
    # broadcast path
    bad = tc.referential_violations(fact, "ref", dim, "key", dim_rows=2)
    assert [r["ref"] for r in bad.collect()] == ["zz"]
    # forced shuffle path (distinct fact keys)
    bad2 = tc.referential_violations(fact, "ref", dim, "key",
                                     dim_rows=10**9, broadcast_limit=10)
    assert [r["ref"] for r in bad2.collect()] == ["zz"]


def test_ks_exact_matches_numpy(spark):
    import numpy as np
    rng = np.random.RandomState(7)
    xa = rng.normal(0, 1, 300).tolist()
    xb = rng.normal(0.5, 1, 200).tolist()
    a = spark.createDataFrame([(float(v),) for v in xa], "v double")
    b = spark.createDataFrame([(float(v),) for v in xb], "v double")
    row = tc.ks_statistic_exact(a, b, "v").first()
    # numpy oracle: exact two-sample KS
    allv = np.sort(np.unique(np.concatenate([xa, xb])))
    fa = np.searchsorted(np.sort(xa), allv, side="right") / len(xa)
    fb = np.searchsorted(np.sort(xb), allv, side="right") / len(xb)
    expected = float(np.max(np.abs(fa - fb)))
    assert row["ks_stat"] == pytest.approx(expected, abs=1e-12)
    assert row["n_a"] == 300 and row["n_b"] == 200
    p = tc.ks_pvalue(row["ks_stat"], 300, 200)
    assert p < 0.01  # the 0.5-sigma shift must be detected


def test_ks_sketch_close_to_exact(spark):
    import numpy as np
    rng = np.random.RandomState(8)
    a = spark.createDataFrame(
        [(float(v),) for v in rng.normal(0, 1, 2000)], "v double")
    b = spark.createDataFrame(
        [(float(v),) for v in rng.normal(1, 1, 2000)], "v double")
    exact = tc.ks_statistic_exact(a, b, "v").first()["ks_stat"]
    approx = tc.ks_statistic_sketch(a, b, "v", k=200)["ks_stat"]
    assert abs(approx - exact) < 0.05


def test_ks_sketch_inplan_within_documented_bound(spark):
    """The in-plan quantile-point KS (the oracle-certified sketch math)
    stays within |D_sketch − D_exact| ≤ 2/k of the exact statistic, and
    equals the python bisect formulation on the same rank-selected
    points."""
    import numpy as np
    rng = np.random.RandomState(9)
    xa = rng.normal(0, 1, 1500)
    xb = rng.normal(0.4, 1.2, 900)
    a = spark.createDataFrame([(float(v),) for v in xa], "v double")
    b = spark.createDataFrame([(float(v),) for v in xb], "v double")
    k = 50
    exact = tc.ks_statistic_exact(a, b, "v").first()["ks_stat"]
    row = tc.ks_statistic_sketch_inplan(a, b, "v", k=k).first()
    assert row["k_a"] == k and row["k_b"] == k
    assert abs(row["ks_sketch"] - exact) <= 2.0 / k

    # python oracle on the same deterministic point rule
    def points(x):
        s = np.sort(x)
        n = len(s)
        return [s[rn - 1] for rn in range(1, n + 1)
                if (rn * k) // n > ((rn - 1) * k) // n]

    pa, pb = points(xa), points(xb)
    import bisect
    ev = sorted(set(pa) | set(pb))
    d = max(abs(bisect.bisect_right(pa, x) / len(pa)
                - bisect.bisect_right(pb, x) / len(pb)) for x in ev)
    assert row["ks_sketch"] == pytest.approx(d, abs=1e-12)


def test_ks_sketch_inplan_small_and_empty_sides(spark):
    a = spark.createDataFrame([(float(i),) for i in range(7)], "v double")
    empty = spark.createDataFrame([], "v double")
    # n < k: every order statistic is a point; identical sides → D = 0
    row = tc.ks_statistic_sketch_inplan(a, a, "v", k=50).first()
    assert row["k_a"] == 7 and row["ks_sketch"] == 0.0
    # one empty side: in-plan guard (try_divide) → null gaps → 0.0
    row = tc.ks_statistic_sketch_inplan(a, empty, "v", k=50).first()
    assert row["k_b"] == 0 and row["ks_sketch"] == 0.0


def test_chi_square_identical_distributions(spark):
    df = spark.createDataFrame([(i % 5,) for i in range(500)], "c long")
    r = tc.chi_square_drift(df, df, "c").first()
    assert r["chi2"] == pytest.approx(0.0, abs=1e-9)
    assert tc.chi2_pvalue(r["chi2"], r["dof"]) == pytest.approx(1.0)


def test_chi_square_detects_shift(spark):
    a = spark.createDataFrame([("x",)] * 90 + [("y",)] * 10, "c string")
    b = spark.createDataFrame([("x",)] * 50 + [("y",)] * 50, "c string")
    r = tc.chi_square_drift(a, b, "c").first()
    # hand-computed 2x2 chi-square: rows (90,10),(50,50); expected (70,30)
    # → 2*(400/70) + 2*(400/30) = 8000/210 ≈ 38.095238
    assert r["chi2"] == pytest.approx(8000 / 210, rel=1e-9)
    assert r["dof"] == 1
    assert tc.chi2_pvalue(r["chi2"], r["dof"]) < 1e-8


def test_chi2_pvalue_known_values():
    # classic table values
    assert tc.chi2_pvalue(3.841, 1) == pytest.approx(0.05, abs=1e-3)
    assert tc.chi2_pvalue(9.488, 4) == pytest.approx(0.05, abs=1e-3)
    assert tc.chi2_pvalue(0.0, 3) == 1.0


def test_ks_pvalue_limits():
    assert tc.ks_pvalue(0.0, 100, 100) == pytest.approx(1.0, abs=0.01)
    assert tc.ks_pvalue(0.9, 100, 100) < 1e-10


def test_drift_fires_on_shifted_snapshot(spark):
    """FIXTURES.md §3: documents_ref_df shifts text-length and span-count
    distributions — KS must fire on the shifted stats and stay quiet
    comparing a snapshot against itself."""
    from jsonschema_rs_spark.datagen import documents_df, documents_ref_df

    cur = documents_df(spark, 4000).drop("_vclass")
    ref = documents_ref_df(spark, 4000).drop("_vclass")
    feat = lambda df: df.selectExpr(
        "size(spans) as n_spans",
        "aggregate(transform(spans, s -> coalesce(length(s.text), 0)), "
        "0, (a, x) -> a + x) as text_len")

    shifted = tc.ks_statistic_exact(feat(cur), feat(ref), "text_len").first()
    p_shift = tc.ks_pvalue(shifted["ks_stat"], shifted["n_a"], shifted["n_b"])
    assert p_shift < 1e-6  # fires

    same = tc.ks_statistic_exact(feat(cur), feat(cur), "text_len").first()
    assert same["ks_stat"] == pytest.approx(0.0, abs=1e-12)  # quiet

    chi = tc.chi_square_drift(feat(cur), feat(ref), "n_spans").first()
    assert tc.chi2_pvalue(chi["chi2"], chi["dof"]) < 1e-3  # zipf shift


def test_ks_exact_scalable_matches_window_version(spark):
    import numpy as np
    rng = np.random.RandomState(11)
    # include heavy ties to stress range-boundary handling
    xa = np.concatenate([rng.normal(0, 1, 500),
                         np.repeat(0.5, 200)]).tolist()
    xb = np.concatenate([rng.normal(0.3, 1, 400),
                         np.repeat(0.5, 100)]).tolist()
    a = spark.createDataFrame([(float(v),) for v in xa], "v double")
    b = spark.createDataFrame([(float(v),) for v in xb], "v double")
    ref = tc.ks_statistic_exact(a, b, "v").first()
    got = tc.ks_statistic_exact_scalable(a, b, "v").first()
    assert got["n_a"] == ref["n_a"] and got["n_b"] == ref["n_b"]
    assert got["ks_stat"] == pytest.approx(ref["ks_stat"], abs=1e-12)
    # and no single-partition window in the physical plan
    p = tc.ks_statistic_exact_scalable(a, b, "v") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Window" in p


def test_ks_empty_side_guards(spark):
    """One (or both) empty samples must yield ks 0.0 on EVERY KS path —
    not an ANSI DIVIDE_BY_ZERO (window version), ZeroDivisionError
    (sketch), or NULL stat."""
    a = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "v double")
    empty = spark.createDataFrame([], "v double")
    for lhs, rhs in ((a, empty), (empty, a), (empty, empty)):
        r1 = tc.ks_statistic_exact(lhs, rhs, "v").first()
        r2 = tc.ks_statistic_exact_scalable(lhs, rhs, "v").first()
        assert r1["ks_stat"] == 0.0 and r2["ks_stat"] == 0.0
        assert (r1["n_a"], r1["n_b"]) == (r2["n_a"], r2["n_b"])
        assert tc.ks_statistic_sketch(lhs, rhs, "v", k=10)["ks_stat"] == 0.0


def test_numeric_histogram_empty_and_allnull(spark):
    empty = spark.createDataFrame([], "v double")
    assert tc.numeric_histogram(empty, "v").count() == 0
    nulls = spark.createDataFrame([(None,), (None,)], "v double")
    assert tc.numeric_histogram(nulls, "v").count() == 0


def test_numeric_histogram_scan_derived_max_in_top_bucket(spark):
    """With scan-derived bounds the data maximum must land in the top
    NOMINAL bucket, not width_bucket's exclusive-upper overflow n+1.
    An explicit hi keeps true overflow visible in n+1."""
    df = spark.createDataFrame([(float(v),) for v in range(1, 11)],
                               "v double")
    got = {r["bucket"]: r["n"] for r in
           tc.numeric_histogram(df, "v", n_buckets=5).collect()}
    assert max(got) == 5 and sum(got.values()) == 10
    got_exp = {r["bucket"]: r["n"] for r in
               tc.numeric_histogram(df, "v", n_buckets=5, lo=1.0,
                                    hi=10.0).collect()}
    assert got_exp.get(6) == 1  # v=10.0 == explicit hi -> overflow
