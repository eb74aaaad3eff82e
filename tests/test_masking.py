"""Error masking + value-embedding messages — the masked_with analog
(reference error.rs:496-516 masked/masked_with; jsonschema-py mask=
kwarg lib.rs:739-750, tests-py/test_masking.py mirrored here).

Engine default: static message templates that never embed instance
values (default-safe). options.message_values=True embeds the failing
value's JSON text reference-style; options.mask="..." replaces it with
the placeholder.
"""

import json

from pyspark.sql import functions as F

from jsonschema_rs_spark import compile_schema
from jsonschema_rs_spark.compiler.variant import compile_json_schema
from jsonschema_rs_spark.errors import ValidationOptions


def messages(spark, schema, doc, opts=None):
    plan = compile_json_schema(schema, opts)
    df = spark.createDataFrame([(json.dumps(doc),)], "j string")
    rows = df.select(F.explode(plan.errors_column(F.col("j")))
                     .alias("e")).select("e.message").collect()
    return [r["message"] for r in rows]


def test_custom_masking(spark):
    msgs = messages(spark, {"maxLength": 5}, "sensitive data",
                    ValidationOptions(mask="[REDACTED]"))
    assert msgs and all(m.startswith("[REDACTED]") for m in msgs)
    assert all("sensitive data" not in m for m in msgs)


def test_no_masking_static_default(spark):
    """Default messages are static templates — they contain neither the
    value nor a placeholder (default-safe, stronger than the
    reference's default)."""
    msgs = messages(spark, {"maxLength": 5}, "sensitive data")
    assert msgs and all("sensitive data" not in m for m in msgs)
    assert all("[" not in m or "REDACTED" not in m for m in msgs)


def test_message_values_embed_value(spark):
    msgs = messages(spark, {"maxLength": 5}, "sensitive data",
                    ValidationOptions(message_values=True))
    assert any('"sensitive data"' in m for m in msgs)


def test_masking_with_nested_data(spark):
    schema = {"type": "object",
              "properties": {"credentials": {
                  "type": "object",
                  "properties": {"password": {"type": "string",
                                              "minLength": 8}}}}}
    opts = ValidationOptions(mask="[SECRET]")
    msgs = messages(spark, schema,
                    {"credentials": {"password": "123"}}, opts)
    assert any("[SECRET]" in m for m in msgs)
    assert all("123" not in m for m in msgs)


def test_masking_with_array(spark):
    msgs = messages(spark, {"items": {"type": "string"}}, [123, 456],
                    ValidationOptions(mask="[HIDDEN]"))
    assert msgs and all("123" not in m and "456" not in m for m in msgs)
    assert any("[HIDDEN]" in m for m in msgs)


def test_message_values_nested_embeds_leaf_value(spark):
    schema = {"properties": {"a": {"type": "integer"}}}
    msgs = messages(spark, schema, {"a": "oops"},
                    ValidationOptions(message_values=True))
    assert any('"oops"' in m for m in msgs)


def test_typed_path_masking(spark):
    df = spark.createDataFrame([(1, "sensitive-value")],
                               "id long, s string")
    schema = {"type": "object",
              "properties": {"s": {"maxLength": 3}}}
    plan = compile_schema(schema, df.schema,
                          ValidationOptions(mask="[X]"))
    rows = plan.violations(df, ["id"]).collect()
    assert rows and all("[X]" in r["message"] for r in rows)
    assert all("sensitive-value" not in r["message"] for r in rows)
    # and value-embedding on the typed path
    plan2 = compile_schema(schema, df.schema,
                           ValidationOptions(message_values=True))
    rows2 = plan2.violations(df, ["id"]).collect()
    assert any("sensitive-value" in r["message"] for r in rows2)


def test_mask_does_not_change_verdicts(spark):
    schema = {"properties": {"a": {"minimum": 5}}, "required": ["a"]}
    docs = [{"a": 3}, {"a": 7}, {}]
    for opts in (None, ValidationOptions(mask="[M]"),
                 ValidationOptions(message_values=True)):
        plan = compile_json_schema(schema, opts)
        df = spark.createDataFrame([(json.dumps(d),) for d in docs],
                                   "j string")
        got = [r["valid"] for r in
               plan.with_validation(df, "j").select("valid").collect()]
        assert got == [False, True, False]
