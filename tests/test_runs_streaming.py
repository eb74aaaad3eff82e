"""Checkpoint/resume runs (IceTable + ValidationRunner) and Structured
Streaming validation — the north-rule M5/M6 slices."""

import os

import pytest
from pyspark.sql import functions as F

from jsonschema_rs_spark import compile_schema
from jsonschema_rs_spark.datagen import documents_df
from jsonschema_rs_spark.docspec import DOC_SPEC_FULL, default_options
from jsonschema_rs_spark.plans.runs import ValidationRunner
from jsonschema_rs_spark.sources.icetable import IceTable
from jsonschema_rs_spark.streaming import validate as sv


@pytest.fixture()
def table(spark, tmp_path):
    t = IceTable(spark, str(tmp_path / "ice"))
    docs = documents_df(spark, 2000).drop("_vclass")
    t.append_partitions(docs, F.pmod(F.xxhash64("doc_id"), F.lit(4))
                        .cast("string"))
    return t


def _plan(spark, table):
    df = table.read()
    sub = df.drop("part_id")
    return compile_schema(DOC_SPEC_FULL, sub.schema, default_options())


def test_icetable_snapshots(spark, table):
    assert table.current_snapshot() == 1
    assert sorted(table.partitions()) == ["0", "1", "2", "3"]
    more = documents_df(spark, 100, seed=77).drop("_vclass")
    sid = table.append_partitions(more, F.lit("9"))
    assert sid == 2
    assert "9" in table.partitions()
    assert table.added_between(1, 2) == ["9"]
    assert table.partitions(1) == ["0", "1", "2", "3"]  # time travel
    assert table.read(snapshot_id=1).count() == 2000
    assert table.read(partitions=["9"]).count() == 100


def test_partition_pruning(spark, table):
    plan_str = table.read(partitions=["2"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan_str


def test_run_metrics_and_lineage(spark, table, tmp_path):
    plan = _plan(spark, table)
    runner = ValidationRunner(table, plan, str(tmp_path / "runs"),
                              violations_path=str(tmp_path / "viol"))
    out = runner.run(run_id="r1")
    assert out == {"run_id": "r1", "processed": 4, "skipped": 0}
    m = runner.metrics().orderBy("part_id").collect()
    assert [r["part_id"] for r in m] == ["0", "1", "2", "3"]
    assert sum(r["n_rows"] for r in m) == 2000
    for r in m:
        assert r["n_rows"] == r["n_valid"] + r["n_invalid"]
        assert r["run_id"] == "r1" and r["snapshot_id"] == 1
        assert len(r["input_files"]) >= 1  # lineage
        assert r["finished"] >= r["started"]
        if r["n_invalid"]:
            assert sum(r["violation_keywords"].values()) > 0
        else:
            # all-valid partition: empty map, not null (metrics contract)
            assert r["violation_keywords"] == {}
    # violations landed with run_id + partition ids
    viol = spark.read.parquet(str(tmp_path / "viol"))
    assert viol.where(F.col("run_id") == "r1").count() > 0
    assert set(viol.columns) >= {"part_id", "keyword", "run_id"}
    # the metrics keyword histogram counts the same error unit the
    # violations table materializes: totals must agree exactly
    per_kw = {r["keyword"]: r["n"] for r in
              viol.where(F.col("run_id") == "r1")
              .groupBy("keyword").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    agg_kw: dict = {}
    for r in m:
        for k, n in r["violation_keywords"].items():
            agg_kw[k] = agg_kw.get(k, 0) + n
    assert agg_kw == per_kw


def test_run_resume_skips_completed(spark, table, tmp_path):
    plan = _plan(spark, table)
    runner = ValidationRunner(table, plan, str(tmp_path / "runs"),
                              chunk_size=1)
    runner._process_chunk("r2", 1, ["0", "1"])  # simulate partial run
    out = runner.run(run_id="r2")
    assert out["skipped"] == 2 and out["processed"] == 2
    m = runner.metrics().where(F.col("run_id") == "r2")
    # exactly one metrics row per partition — no double-processing
    assert m.groupBy("part_id").count().where("count > 1").count() == 0
    # second resume: nothing left
    out2 = runner.run(run_id="r2")
    assert out2["processed"] == 0 and out2["skipped"] == 4


def test_run_incremental_snapshot(spark, table, tmp_path):
    plan = _plan(spark, table)
    runner = ValidationRunner(table, plan, str(tmp_path / "runs"))
    runner.run(run_id="r3", snapshot_id=1)
    more = documents_df(spark, 100, seed=78).drop("_vclass")
    table.append_partitions(more, F.lit("7"))
    out = runner.run(run_id="r3")  # resume over new snapshot
    assert out["processed"] == 1  # only the new partition
    got = {r["part_id"]: r["n_rows"] for r in runner.metrics()
           .where(F.col("run_id") == "r3").collect()}
    assert got["7"] == 100


# -- streaming --------------------------------------------------------------


@pytest.fixture()
def stream_src(spark, tmp_path):
    docs = documents_df(spark, 1000).drop("_vclass")
    path = str(tmp_path / "src")
    docs.repartition(4).write.parquet(path)
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path), docs


def test_streaming_matches_batch(spark, stream_src, tmp_path):
    stream, docs = stream_src
    plan = compile_schema(DOC_SPEC_FULL, docs.schema, default_options())
    out = sv.validate_stream(stream, plan, mode="flag")
    assert out.isStreaming
    q = (out.groupBy("valid").count()
         .writeStream.format("memory").queryName("t_sm")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["valid"]: r["count"]
           for r in spark.sql("select * from t_sm").collect()}
    expect = {r["valid"]: r["count"] for r in
              plan.with_validation(docs, "flag").groupBy("valid")
              .count().collect()}
    assert got == expect


def test_streaming_metrics_sink(spark, stream_src, tmp_path):
    stream, docs = stream_src
    plan = compile_schema(DOC_SPEC_FULL, docs.schema, default_options())
    runs = str(tmp_path / "runs")
    q = sv.run_to_metrics(stream, plan, runs, "sr1",
                          str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    m = spark.read.parquet(runs).collect()
    assert sum(r["n_rows"] for r in m) == 1000
    assert all(r["run_id"] == "sr1" for r in m)
    assert all(r["part_id"].startswith("batch-") for r in m)
    total_invalid = sum(r["n_invalid"] for r in m)
    expect_invalid = plan.with_validation(docs, "flag") \
        .where(~F.col("valid")).count()
    assert total_invalid == expect_invalid


def test_violations_exactly_once_on_retry(spark, table, tmp_path):
    plan = _plan(spark, table)
    runner = ValidationRunner(table, plan, str(tmp_path / "runs"),
                              violations_path=str(tmp_path / "viol"),
                              chunk_size=2)
    # simulate a crash after violations write but before metrics: process
    # the same chunk twice — dynamic overwrite must not duplicate rows
    runner._process_chunk("rx", 1, ["0", "1"])
    n1 = spark.read.parquet(str(tmp_path / "viol")).count()
    runner._process_chunk("rx", 1, ["0", "1"])
    n2 = spark.read.parquet(str(tmp_path / "viol")).count()
    assert n1 == n2 > 0


def test_violation_counts_stream_matches_batch(spark, tmp_path):
    from jsonschema_rs_spark import compile_schema
    from jsonschema_rs_spark.queries import EVENTS_SCHEMA
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "evsrc")
    ev.repartition(3).write.parquet(src)
    plan = compile_schema(EVENTS_SCHEMA, ev.schema)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = sv.violation_counts_stream(stream, plan, "ts", window="1 hour",
                                     watermark="2 hours")
    q = (out.writeStream.format("memory").queryName("t_vcs")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["window_start"], r["keyword"]): r["n_violations"]
           for r in spark.sql("select * from t_vcs").collect()}
    batch = (plan.with_validation(ev, "verbose")
             .select(F.window("ts", "1 hour").alias("w"),
                     F.explode("errors").alias("err"))
             .groupBy(F.col("w.start").alias("ws"),
                      F.col("err.keyword").alias("keyword"))
             .agg(F.count(F.lit(1)).alias("n")))
    want = {(r["ws"], r["keyword"]): r["n"] for r in batch.collect()}
    # append mode emits only watermark-closed windows; every emitted
    # window must match the batch result, and most windows close
    assert got
    assert all(want.get(k) == v for k, v in got.items())
    assert len(got) >= len(want) - 3


def test_streaming_stateful_dedup_across_batches(spark, tmp_path):
    """applyInPandasWithState first-seen dedup: duplicates are dropped
    both within a micro-batch and ACROSS micro-batches (state store)."""
    from jsonschema_rs_spark.streaming.stateful import \
        streaming_dedup_first_seen

    src = str(tmp_path / "src")
    os.makedirs(src)
    b1 = [("d1", "the quick brown fox jumps over the lazy dog"),
          ("d2", "the quick brown fox jumps over the lazy dog"),  # in-batch dup
          ("d3", "a different document entirely about spark")]
    b2 = [("d4", "THE QUICK BROWN FOX jumps over the lazy dog!"),  # cross-batch dup (normalized)
          ("d5", "yet another unique piece of text content")]
    schema = "doc_id string, text string"
    spark.createDataFrame(b1, schema).coalesce(1) \
        .write.parquet(src + "/f1")
    spark.createDataFrame(b2, schema).coalesce(1) \
        .write.parquet(src + "/f2")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(src + "/f*"))
    out = streaming_dedup_first_seen(stream)
    q = (out.writeStream.format("memory").queryName("t_sd")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    kept = sorted(r["doc_id"] for r in
                  spark.sql("select doc_id from t_sd").collect())
    # one survivor per distinct fingerprint; d2 (in-batch) and d4
    # (cross-batch, normalized dup of d1) are dropped
    assert kept == ["d1", "d3", "d5"]


def test_streaming_violation_sessions(spark, tmp_path):
    """Event-time gap sessions over INVALID rows: a later violation for
    the same key beyond the gap closes and emits the prior session."""
    from jsonschema_rs_spark import compile_schema
    from jsonschema_rs_spark.streaming.stateful import violation_sessions

    src = str(tmp_path / "sess_src")
    os.makedirs(src)
    schema = "user string, value double, ts timestamp"
    base = "2024-01-01 00:0{m}:{s:02d}"

    def t(m, s):
        from datetime import datetime
        return datetime(2024, 1, 1, 0, m, s)

    # u1: burst of 3 violations within 10s, then one 5 min later
    # (closes the burst); u2: valid rows only (never enters state)
    b1 = [("u1", -1.0, t(0, 1)), ("u1", -2.0, t(0, 5)),
          ("u1", -3.0, t(0, 9)), ("u2", 5.0, t(0, 2))]
    b2 = [("u1", -4.0, t(5, 0)), ("u2", 7.0, t(5, 1))]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(src + "/f1")
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(src + "/f2")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src + "/f*"))
    plan = compile_schema(
        {"type": "object", "properties": {"value": {"minimum": 0}}},
        spark.createDataFrame([], schema).schema)
    out = violation_sessions(stream, plan, "user", "ts", gap_s=60.0)
    q = (out.writeStream.format("memory").queryName("t_sess")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    rows = spark.sql("select * from t_sess").collect()
    # exactly one CLOSED session: u1's 3-violation burst (u1's later
    # violation stays open in state; u2 never violated)
    assert len(rows) == 1
    r = rows[0]
    assert r["key"] == "u1" and r["n_violations"] == 3
    assert r["session_end"] - r["session_start"] == 8.0


def test_streaming_violation_sessions_late_events(spark, tmp_path):
    """Cross-batch out-of-order events: an in-gap late event extends the
    open session BACKWARD (session_start = min); a late event more than
    gap before it becomes its own immediately-emitted session — it used
    to be silently merged, reporting a session_start after one of its
    counted violations."""
    from datetime import datetime

    from jsonschema_rs_spark import compile_schema
    from jsonschema_rs_spark.streaming.stateful import violation_sessions

    src = str(tmp_path / "sess_late_src")
    os.makedirs(src)
    schema = "user string, value double, ts timestamp"

    def t(m, s):
        return datetime(2024, 1, 1, 0, m, s)

    # batch 1 opens u1's session at 05:00; batch 2 delivers a late
    # in-gap event (04:30, extends backward) and a far-late one (00:10,
    # own session), then a far-future one (20:00) that closes the
    # extended session
    b1 = [("u1", -1.0, t(5, 0))]
    b2 = [("u1", -2.0, t(4, 30)), ("u1", -3.0, t(0, 10)),
          ("u1", -4.0, t(20, 0))]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(src + "/f1")
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(src + "/f2")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src + "/f*"))
    plan = compile_schema(
        {"type": "object", "properties": {"value": {"minimum": 0}}},
        spark.createDataFrame([], schema).schema)
    out = violation_sessions(stream, plan, "user", "ts", gap_s=60.0)
    q = (out.writeStream.format("memory").queryName("t_sess_late")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    rows = sorted(spark.sql("select * from t_sess_late").collect(),
                  key=lambda r: r["session_start"])
    assert len(rows) == 2
    lone, burst = rows
    assert lone["n_violations"] == 1
    assert lone["session_start"] == lone["session_end"]
    assert burst["n_violations"] == 2          # 05:00 + late 04:30
    assert burst["session_end"] - burst["session_start"] == 30.0
    assert burst["session_start"] - lone["session_start"] == 260.0


def test_chi_square_drift_stream_matches_batch_and_oracle(spark, tmp_path):
    """Stream == batch == hand-computed chi-square per window; novel
    categories surface in n_unexpected, not the statistic."""
    from collections import Counter, defaultdict

    from jsonschema_rs_spark.streaming.drift import (
        chi_square_drift_stream, reference_proportions)

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .select("ts", "event_type")
    ref_probs = reference_proportions(ev, "event_type")
    assert abs(sum(ref_probs.values()) - 1.0) < 1e-9

    # drop one category from the reference so n_unexpected is exercised
    dropped, probs = max(ref_probs), dict(ref_probs)
    p = probs.pop(dropped)
    probs = {k: v / (1 - p) for k, v in probs.items()}

    src = str(tmp_path / "drift_src")
    ev.repartition(3).write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = chi_square_drift_stream(stream, "event_type", "ts", probs,
                                  window="6 hours", watermark="12 hours")
    q = (out.writeStream.format("memory").queryName("t_drift")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["window_start"]: r for r in
           spark.sql("select * from t_drift").collect()}
    assert got, "stream produced no windows"

    # batch path: same function, batch input
    batch = {r["window_start"]: r for r in
             chi_square_drift_stream(ev, "event_type", "ts", probs,
                                     window="6 hours").collect()}
    assert set(got) == set(batch)
    for ws, g in got.items():
        b = batch[ws]
        assert (g["n"], g["chi2"], g["dof"], g["n_unexpected"]) == \
            (b["n"], b["chi2"], b["dof"], b["n_unexpected"]), ws

    # oracle: recompute per window in pure Python
    rows = ev.collect()
    win = defaultdict(Counter)
    for r in rows:
        ts = r["ts"]
        bucket = ts.replace(hour=(ts.hour // 6) * 6, minute=0, second=0,
                            microsecond=0)
        win[bucket][r["event_type"]] += 1
    for ws, g in got.items():
        counts = win[ws]
        n = sum(counts.values())
        chi2 = 0.0
        for cat, pc in probs.items():
            exp = n * pc
            if exp >= 1.0:
                chi2 += (counts.get(cat, 0) - exp) ** 2 / exp
        assert g["n"] == n, ws
        assert abs(g["chi2"] - round(chi2, 6)) < 1e-6, ws
        assert g["n_unexpected"] == counts.get(dropped, 0), ws
        assert g["dof"] == len(probs) - 1


def test_streaming_violation_sessions_late_events_merge(spark, tmp_path):
    """Two far-late events within gap_s of EACH OTHER must merge into
    one closed session — the per-event fold used to emit every far-late
    event as its own singleton (code-review r5)."""
    from datetime import datetime

    from jsonschema_rs_spark import compile_schema
    from jsonschema_rs_spark.streaming.stateful import violation_sessions

    src = str(tmp_path / "sess_late_merge_src")
    os.makedirs(src)
    schema = "user string, value double, ts timestamp"

    def t(m, s):
        return datetime(2024, 1, 1, 0, m, s)

    # batch 1 opens the session at 16:40; batch 2 delivers two far-late
    # events 30 s apart (01:40, 02:10) — one merged session — and a
    # far-future event (40:00) that closes the open one
    b1 = [("u1", -1.0, t(16, 40))]
    b2 = [("u1", -2.0, t(1, 40)), ("u1", -3.0, t(2, 10)),
          ("u1", -4.0, t(40, 0))]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(src + "/f1")
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(src + "/f2")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src + "/f*"))
    plan = compile_schema(
        {"type": "object", "properties": {"value": {"minimum": 0}}},
        spark.createDataFrame([], schema).schema)
    out = violation_sessions(stream, plan, "user", "ts", gap_s=60.0)
    q = (out.writeStream.format("memory").queryName("t_sess_late_merge")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    rows = sorted(spark.sql("select * from t_sess_late_merge").collect(),
                  key=lambda r: r["session_start"])
    assert len(rows) == 2
    late, opened = rows
    assert late["n_violations"] == 2               # 01:40 + 02:10 merged
    assert late["session_end"] - late["session_start"] == 30.0
    assert opened["n_violations"] == 1             # the 16:40 session
    assert opened["session_start"] == opened["session_end"]


def test_icetable_boolean_partitions_resumable(spark, tmp_path):
    """Manifest values use Spark's string rendering: a BOOLEAN
    partition column used to store str(True)='True' while the
    directory read-back renders 'true', making those partitions
    permanently invisible to read() (review find)."""
    from jsonschema_rs_spark.sources.icetable import IceTable

    t = IceTable(spark, str(tmp_path / "tbl"))
    df = spark.createDataFrame([(1, True), (2, False)], "v long, flag boolean")
    snap = t.append_partitions(df, "flag")
    parts = t.partitions(snap)
    assert parts == ["false", "true"]
    assert t.read(partitions=["true"]).count() == 1
    assert t.read(snapshot_id=snap).count() == 2
    # NULL partition values are refused up front
    import pytest as _pytest
    dfn = spark.createDataFrame([(3, None)], "v long, flag boolean")
    with _pytest.raises(ValueError, match="NULL partition"):
        t.append_partitions(dfn, "flag")


def test_runner_checkpoint_probe_by_reading(spark, tmp_path):
    """completed_partitions()/metrics() probe the checkpoint by READING
    it (hdfs/s3a paths where os.path.exists is always False used to
    silently disable resume; an empty/garbage runs dir must read as
    'no checkpoint', not crash) — review find."""
    from jsonschema_rs_spark import compile_schema
    from jsonschema_rs_spark.errors import ValidationOptions

    t = IceTable(spark, str(tmp_path / "tbl"))
    df = spark.createDataFrame([("a", 1)], "doc_id string, v long")
    t.append_partitions(df, F.lit("p0"))
    plan = compile_schema({"type": "object"}, t.read().schema,
                          ValidationOptions())
    runs_dir = tmp_path / "runs"
    runs_dir.mkdir()  # exists but EMPTY: unreadable as parquet
    r = ValidationRunner(t, plan, str(runs_dir))
    assert r.completed_partitions("rid") == set()
    assert r.metrics().count() == 0
    out = r.run(run_id="rid")
    assert out["processed"] == 1
    m = r.metrics().collect()
    assert len(m) == 1 and m[0]["finished"] >= m[0]["started"]
    # second run resumes fully
    assert r.run(run_id="rid")["skipped"] == 1
