"""Auto-tuned $ref unroll depth (ValidationOptions.max_ref_depth=None).

The reference detects $ref cycles at runtime (validator.rs:34-52); this
engine depth-unrolls at compile time instead, and the unrolled boolean
plan of a recursive schema can outgrow Janino's 64KB-per-method limit —
Spark then logs an ERROR and silently drops the WHOLE stage to the
interpreter. Auto mode ascends from a cheap probe depth and keeps the
deepest unroll that still codegens, deciding the calibrated ambiguous
band with a one-row ground-truth probe (variant.py CompiledJsonSchema).
"""

import json

import pytest
from pyspark.sql import functions as F

from jsonschema_rs_spark.errors import ValidationOptions
from jsonschema_rs_spark.compiler.variant import (CompiledJsonSchema,
                                                  compile_json_schema)

LIST_SCHEMA = {"$ref": "#/$defs/node", "$defs": {"node": {
    "type": "object", "required": ["v"],
    "properties": {"v": {"type": "integer"},
                   "next": {"$ref": "#/$defs/node"}}}}}
TREE_SCHEMA = {"$ref": "#/$defs/t", "$defs": {"t": {
    "type": "object", "required": ["name"],
    "properties": {"name": {"type": "string", "pattern": "^[a-z]+$"},
                   "left": {"$ref": "#/$defs/t"},
                   "right": {"$ref": "#/$defs/t"}}}}}


def _deep_list(n, bad_tail=False):
    doc = {"v": 1}
    cur = doc
    for i in range(2, n + 1):
        cur["next"] = {"v": i}
        cur = cur["next"]
    if bad_tail:
        cur["v"] = "oops"
    return json.dumps(doc)


def test_non_recursive_schema_keeps_default_depth(spark):
    plan = compile_json_schema({"properties": {
        "n": {"$ref": "#/$defs/pos"}}, "$defs": {"pos": {"minimum": 0}}})
    assert plan.ref_depth == 8
    # and a ref CHAIN that never re-enters any target is not a cycle
    chain = compile_json_schema({"$ref": "#/$defs/a", "$defs": {
        "a": {"$ref": "#/$defs/b"}, "b": {"$ref": "#/$defs/c"},
        "c": {"type": "integer", "minimum": 3}}})
    assert chain.ref_depth == 8


def test_recursive_schema_tunes_below_default(spark):
    plan = compile_json_schema(LIST_SCHEMA)
    assert 1 <= plan.ref_depth < 8
    tree = compile_json_schema(TREE_SCHEMA)
    assert 1 <= tree.ref_depth < plan.ref_depth + 2  # branching tunes lower


def test_explicit_depth_honored_verbatim(spark):
    plan = compile_json_schema(LIST_SCHEMA,
                               ValidationOptions(max_ref_depth=8))
    assert plan.ref_depth == 8
    shallow = compile_json_schema(LIST_SCHEMA,
                                  ValidationOptions(max_ref_depth=2))
    assert shallow.ref_depth == 2


def test_tuned_plan_codegens_clean_and_validates(spark):
    """Ground truth: with codegen fallback DISABLED the tuned plan must
    execute (the untuned depth-8 plan of this schema provably cannot —
    the calibration in variant.py), and verdicts must be right for docs
    within the tuned depth."""
    plan = compile_json_schema(LIST_SCHEMA)
    df = spark.createDataFrame(
        [(_deep_list(3),), (_deep_list(3, bad_tail=True),)],
        "doc string")
    prev = spark.conf.get("spark.sql.codegen.fallback")
    try:
        spark.conf.set("spark.sql.codegen.fallback", "false")
        out = df.select(
            plan.valid_column(F.col("doc")).alias("ok")).collect()
    finally:
        spark.conf.set("spark.sql.codegen.fallback", prev)
    assert [r.ok for r in out] == [True, False]


def test_untuned_default_depth_blows_codegen(spark):
    """Keeps the calibration honest: if Spark/Janino ever stops failing
    on the depth-8 list plan, the thresholds should be revisited (and
    this guard retired)."""
    plan = compile_json_schema(LIST_SCHEMA,
                               ValidationOptions(max_ref_depth=8))
    df = spark.createDataFrame([(_deep_list(3),)], "doc string")
    prev_fb = spark.conf.get("spark.sql.codegen.fallback")
    prev_fm = spark.conf.get("spark.sql.codegen.factoryMode")
    try:
        spark.conf.set("spark.sql.codegen.fallback", "false")
        spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
        with pytest.raises(Exception):
            df.select(plan.valid_column(F.col("doc")).alias("ok")) \
                .collect()
    finally:
        spark.conf.set("spark.sql.codegen.fallback", prev_fb)
        spark.conf.set("spark.sql.codegen.factoryMode", prev_fm)


def test_beyond_depth_documents_stay_permissive(spark):
    """Documented deviation carried from the fixed-depth design: nodes
    deeper than the unroll validate as `true` (module docstring)."""
    plan = compile_json_schema(LIST_SCHEMA)
    deep_bad = _deep_list(plan.ref_depth + 3, bad_tail=True)
    df = spark.createDataFrame([(deep_bad,)], "doc string")
    assert df.select(
        plan.valid_column(F.col("doc")).alias("ok")).first().ok is True


def test_depth_memo_skips_second_tuning(spark, monkeypatch):
    """Recompiling the same schema must reuse the memoized depth — the
    in-band ground-truth probe costs ~9 s of Janino time and should be
    paid once per (schema, plan-shaping options) per process."""
    from jsonschema_rs_spark.compiler import variant as V
    first = compile_json_schema(TREE_SCHEMA)  # seeds the memo

    def boom(make_col):
        raise AssertionError("probe re-ran despite memo")

    monkeypatch.setattr(V, "_codegen_probe", boom)
    second = compile_json_schema(TREE_SCHEMA)
    assert second.ref_depth == first.ref_depth
    # options that change the compiled plan's shape miss the memo
    # (draft-4 integer semantics compile different type predicates) —
    # restore the probe first so the tuner can do its real work
    monkeypatch.undo()
    other = compile_json_schema(
        TREE_SCHEMA, ValidationOptions(draft4_integer=True))
    assert 1 <= other.ref_depth < 8


def test_probe_restores_session_confs(spark):
    before = (spark.conf.get("spark.sql.codegen.fallback"),
              spark.conf.get("spark.sql.codegen.factoryMode"))
    compile_json_schema(TREE_SCHEMA)  # tree lands in the probe band
    after = (spark.conf.get("spark.sql.codegen.fallback"),
             spark.conf.get("spark.sql.codegen.factoryMode"))
    assert before == after
