"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline metric (BASELINE.json): documents validated/sec on the synthetic
interleaved text+media table (deterministic datagen — identical input at
any parallelism), flag-mode validation = one scan, zero shuffle.

Each query is forced end-to-end with the noop sink (evaluates every
column; df.count() would let Catalyst prune the projection and measure
nothing).

Scaling evidence (north rule: ≥0.8 efficiency N→4N executors) is produced
by scaling_bench.py (separate JVMs per parallelism level); set
SPARK_GRAFT_SCALING=1 to inline it here.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# docs for the flagship validation throughput measurement (generated —
# the 10^12-doc-shaped interleaved table, small deterministic slice)
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "2000000"))

BENCH_QUERIES = [
    "val_events_flag", "val_docs_flag", "val_lineitem_flag",
    "val_spans_flag", "val_events_violations", "val_json_props",
    "val_events_composed", "val_docs_hierarchy", "val_spans_unevaluated",
    "stats_documents", "uniq_orders_custkey", "ri_orders_customer",
    "ks_events_value", "chisq_events_halves", "drift_windows",
    "hist_orders_total",
    "text_features", "fp_counts", "pack_docs", "minhash_sigs",
    "simhash_vals",
    "simhash_pairs",
    "minhash_pairs", "cc_groups", "jaccard_pairs", "curate_docs",
    "sim_topk", "ann_lsh", "ann_lsh_mp", "ann_ivf",
    "ndcos_pairs", "rollup_events", "mm_features", "output_units_docs",
    "output_units_ext",
]


def noop_write(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def materialize_docs(spark, n_docs: int, path: str | None = None,
                     files: int = 256) -> str:
    """Generate the deterministic interleaved table once and persist it as
    parquet with `files` splits, so the measured job is scan+validate (the
    real 100 TB shape) and both parallelism levels in the scaling bench
    see plenty of input splits."""
    from jsonschema_rs_spark.datagen import documents_df

    path = path or f"/tmp/jrs_bench_docs_{n_docs}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        docs = documents_df(spark, n_docs).drop("_vclass")
        docs.repartition(files).write.mode("overwrite").parquet(path)
    return path


def validate_flagship(spark, n_docs: int) -> float:
    """Flag-mode validation (scan → one codegen'd Project → noop sink) of
    the persisted interleaved table; returns elapsed seconds."""
    from jsonschema_rs_spark import compile_schema
    from jsonschema_rs_spark.docspec import DOC_SPEC_FULL, default_options

    docs = spark.read.parquet(materialize_docs(spark, n_docs))
    plan = compile_schema(DOC_SPEC_FULL, docs.schema, default_options())
    v = plan.with_validation(docs, mode="flag")
    t0 = time.perf_counter()
    noop_write(v)
    return time.perf_counter() - t0


def skew_checks(spark, n_docs: int) -> dict:
    """Skew-handling evidence on the generated table: the datagen plants
    duplicate doc_ids (~0.5% of rows) and routes ~30% of media refs to 16
    hot assets. Times the salted uniqueness check and the broadcast
    referential check at bench scale."""
    from pyspark.sql import functions as F

    from jsonschema_rs_spark.datagen import media_assets_df
    from jsonschema_rs_spark.operators import table_checks as tc

    docs = spark.read.parquet(materialize_docs(spark, n_docs))
    t0 = time.perf_counter()
    n_dup = tc.uniqueness_violations(docs, ["doc_id"], salt_buckets=32) \
        .count()
    t_uniq = time.perf_counter() - t0
    refs = docs.select(F.explode("spans").alias("s")) \
        .select(F.col("s.media_ref").alias("media_ref")) \
        .where(F.col("media_ref").isNotNull())
    assets = media_assets_df(spark)
    t0 = time.perf_counter()
    n_dangling = tc.referential_violations(
        refs, "media_ref", assets, "asset_id",
        dim_rows=100_000).count()
    t_ri = time.perf_counter() - t0
    return {"uniq_salted_sec": round(t_uniq, 3), "n_dup_doc_ids": n_dup,
            "ri_broadcast_sec": round(t_ri, 3), "n_dangling_refs": n_dangling}


def verdict_parity(spark, n: int) -> dict:
    """Per-row verdict parity vs the Python `jsonschema` oracle on a
    deterministic sample — the report's violation-parity evidence
    (SURVEY.md §7 M6). Sampled because the pure-Python oracle does
    ~10k docs/s/core; the engine's verdicts are what's being audited."""
    from jsonschema_rs_spark import compile_schema
    from jsonschema_rs_spark.datagen import documents_df
    from jsonschema_rs_spark.docspec import (DOC_SPEC_FULL, DOC_SPEC_JSON,
                                             default_options)
    from jsonschema_rs_spark.oracle import clean, oracle_verdicts

    docs = documents_df(spark, n).drop("_vclass")
    plan = compile_schema(DOC_SPEC_FULL, docs.schema, default_options())
    rows = plan.with_validation(docs, mode="flag").collect()
    # oracle sees the JSON-Schema-expressible spec (custom span-order
    # keyword excluded) + the order invariant re-checked in Python
    instances = [clean(r.asDict(recursive=True)) for r in rows]
    for inst in instances:
        inst.pop("valid", None)
    want = oracle_verdicts(instances, DOC_SPEC_JSON)
    for i, inst in enumerate(instances):
        offs = [s.get("offset") for s in inst.get("spans", [])]
        if any(b is None or a is None or b <= a
               for a, b in zip(offs, offs[1:])):
            want[i] = False
    got = [r["valid"] for r in rows]
    matches = sum(g == w for g, w in zip(got, want))
    return {"n": n, "matches": matches, "match_rate": round(matches / n, 6)}


def main() -> None:
    from jsonschema_rs_spark.queries import QUERIES
    from jsonschema_rs_spark.session import get_spark

    spark = get_spark(app_name="bench", cores=CPUS,
                      shuffle_partitions=2 * CPUS)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]

    # warm the JVM/codegen once so per-query numbers are steady-state
    validate_flagship(spark, 10_000)
    # spin up the Python/Arrow worker pool once: the first pandas_udf /
    # mapInPandas job otherwise pays a fork+import storm (measured 9s vs
    # 2s warm for mm_features) that would be booked to whichever Arrow
    # query runs first
    from pyspark.sql import functions as F

    @F.pandas_udf("double")
    def _warm_arrow(x):
        return x

    spark.range(200_000).select(
        _warm_arrow(F.col("id").cast("double"))).write.format("noop") \
        .mode("overwrite").save()

    # 3 passes per query, min AND median reported (ADVICE r3: min alone
    # is a best-case estimator — fine for noise rejection on this noisy
    # co-tenant box, but consumers must see the spread). `queries` stays
    # the min for round-over-round continuity; `queries_median` carries
    # the typical-case number.
    import statistics

    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            noop_write(fn(spark, SF_DIR))
            samples.append(time.perf_counter() - t0)
        timings[name] = round(min(samples), 4)
        medians[name] = round(statistics.median(samples), 4)

    # flagship LAST: the N_DOCS-row job pressures the heap/page cache and
    # would otherwise inflate the small queries' numbers
    # best of 4: C2 JIT reaches steady state on the wide codegen'd
    # Project only after ~3 full passes (measured 0.65M → 1.75M docs/s
    # across runs 0→3 in one session); earlier runs pay compilation +
    # heap-regrowth page faults (see session.py heap note,
    # BENCH_SCALING.md for fresh-JVM numbers)
    # 6 passes, min wins: this box shows intermittent multi-second host
    # stalls (measured same-session spread 2.2s..111s on identical
    # passes); the min is the only estimator that reflects the engine
    # rather than the co-tenant weather
    flag_samples = [validate_flagship(spark, N_DOCS) for _ in range(6)]
    t_flag = min(flag_samples)
    t_flag_med = statistics.median(flag_samples)
    timings["validate_interleaved"] = round(t_flag, 4)
    medians["validate_interleaved"] = round(t_flag_med, 4)
    parity = verdict_parity(spark, 5000)

    skew = skew_checks(spark, N_DOCS)

    total = round(sum(timings.values()), 4)
    # the driver's artifact capture keeps only the TAIL of stdout, so
    # the printed line must stay compact or its head (metric/value) is
    # lost (exactly what happened to BENCH_r04.json: "parsed": null).
    # Headline = required keys + best-of per-query secs; everything
    # else (medians, flagship samples, parity detail, estimator notes)
    # goes to BENCH_DETAIL.json next to this script.
    headline = {
        "metric": "suite wall-clock; docs_per_sec = flag-mode "
                  "validation best-of-6",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "docs_per_sec": round(N_DOCS / t_flag),
        "docs_per_sec_median": round(N_DOCS / t_flag_med),
        "n_docs": N_DOCS,
        "cpus": CPUS,
        "parity": parity["match_rate"],
        "detail": "BENCH_DETAIL.json",
    }
    detail = dict(headline)
    detail.pop("detail")  # no self-reference in the detail artifact
    detail.update({
        # full-precision timings here (the headline rounds to 3dp for
        # stdout compactness; this file IS the full record)
        "queries": {k: round(v, 6) for k, v in timings.items()},
        "queries_median": medians,
        # labeled estimators (ADVICE r3): best-of-N rejects this box's
        # co-tenant stalls; median shows what a typical pass costs
        "docs_per_sec_estimator": "best-of-6",
        "flagship_samples_sec": [round(s, 4) for s in flag_samples],
        "verdict_parity": parity,
        "skew_checks": skew,
    })

    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        import scaling_bench
        detail["scaling"] = scaling_bench.measure(N_DOCS)

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1)
        f.write("\n")
    print(json.dumps(headline, separators=(",", ":")))


if __name__ == "__main__":
    main()
