"""Dynamic-JSON validation (VariantType path) — differential-tested
against the Python `jsonschema` oracle (draft 2020-12), the same
official-suite semantics the reference passes (SURVEY.md §5)."""

import json

import pytest
from pyspark.sql import functions as F

from jsonschema_rs_spark.compiler.variant import compile_json_schema

DOCS = [
    '{"name": "ok", "age": 30, "tags": ["a", "b"]}',
    '{"name": "x", "age": -1}',
    '{"age": 5}',
    '{"name": 42, "age": 5}',
    '{"name": "ok", "age": 5.5}',
    '{"name": "ok", "age": 5.0}',
    '{"name": "ok", "age": 5, "tags": []}',
    '{"name": "ok", "age": 5, "tags": ["a", "a"]}',
    '{"name": "ok", "age": 5, "tags": [1, 1.0]}',
    '{"name": "ok", "age": 5, "extra": true}',
    '{"name": "ok", "age": 5, "tags": ["' + "x" * 40 + '"]}',
    '[]', '"str"', '3', 'true', 'null', '{}',
    '{"name": "", "age": 0}',
]

SCHEMA = {
    "type": "object",
    "required": ["name"],
    "properties": {
        "name": {"type": "string", "minLength": 1, "maxLength": 10},
        "age": {"type": "integer", "minimum": 0, "maximum": 150},
        "tags": {"type": "array", "items": {"type": "string",
                                            "maxLength": 20},
                 "minItems": 1, "uniqueItems": True},
    },
    "additionalProperties": False,
}


def spark_verdicts(spark, docs, schema):
    df = spark.createDataFrame([(d,) for d in docs], "j string")
    plan = compile_json_schema(schema)
    rows = plan.with_validation(df, "j", mode="flag").collect()
    return [r["valid"] for r in rows]


def oracle_verdicts(docs, schema):
    import jsonschema
    v = jsonschema.Draft202012Validator(schema)
    return [v.is_valid(json.loads(d)) for d in docs]


def assert_parity(spark, docs, schema):
    got = spark_verdicts(spark, docs, schema)
    want = oracle_verdicts(docs, schema)
    mismatches = [(d, g, w) for d, g, w in zip(docs, got, want) if g != w]
    assert not mismatches, mismatches


def test_object_schema_parity(spark):
    assert_parity(spark, DOCS, SCHEMA)


def test_type_keyword_parity(spark):
    docs = ['1', '1.5', '1.0', '"s"', 'true', 'null', '[]', '{}', '-2',
            '0.0', '1e3', '1.2e-1']
    for t in ["integer", "number", "string", "boolean", "null", "array",
              "object"]:
        assert_parity(spark, docs, {"type": t})
    assert_parity(spark, docs, {"type": ["integer", "string"]})


def test_const_enum_parity(spark):
    docs = ['1', '1.0', '2', '"a"', '[1, 2]', '[1.0, 2.0]', '{"k": 1}',
            '{"k": 1.0}', '{"k": 2}', '{}', 'null', 'true']
    assert_parity(spark, docs, {"const": 1})
    assert_parity(spark, docs, {"const": [1, 2]})
    assert_parity(spark, docs, {"const": {"k": 1}})
    assert_parity(spark, docs, {"enum": [1, "a", [1, 2], {"k": 1}, None]})


def test_numeric_keywords_parity(spark):
    docs = ['0', '5', '10', '10.0', '10.5', '-3', '"x"', '15', '20']
    assert_parity(spark, docs, {"minimum": 5})
    assert_parity(spark, docs, {"exclusiveMaximum": 10})
    assert_parity(spark, docs, {"multipleOf": 5})
    assert_parity(spark, docs, {"multipleOf": 2.5})


def test_composition_parity(spark):
    docs = ['1', '"a"', '5', '15', '"abc"', 'true', '{"a": 1}', '[]']
    assert_parity(spark, docs, {"anyOf": [{"type": "string"},
                                          {"minimum": 10}]})
    assert_parity(spark, docs, {"allOf": [{"type": "integer"},
                                          {"minimum": 2}]})
    assert_parity(spark, docs, {"oneOf": [{"type": "integer"},
                                          {"minimum": 10}]})
    assert_parity(spark, docs, {"not": {"type": "string"}})
    assert_parity(spark, docs, {
        "if": {"type": "integer"},
        "then": {"minimum": 3},
        "else": {"type": "string"}})


def test_object_keywords_parity(spark):
    docs = ['{"a": 1}', '{"a": 1, "b": 2}', '{"a": 1, "b": 2, "c": 3}',
            '{"ab": "x"}', '{"zz": []}', '{}',
            '{"a": null}', '{"num1": 1, "num2": "x"}']
    assert_parity(spark, docs, {"minProperties": 1, "maxProperties": 2})
    assert_parity(spark, docs, {"propertyNames": {"maxLength": 1}})
    assert_parity(spark, docs, {"patternProperties":
                                {"^num": {"type": "integer"}}})
    assert_parity(spark, docs, {"dependentRequired": {"a": ["b"]}})
    assert_parity(spark, docs, {"required": ["a"]})
    assert_parity(spark, docs, {
        "properties": {"a": {"type": "integer"}},
        "patternProperties": {"^b": {"type": "integer"}},
        "additionalProperties": False})


def test_array_keywords_parity(spark):
    docs = ['[]', '[1]', '[1, 2, 3]', '["a", 1]', '[1, 1]', '[1, 1.0]',
            '[[1], [1]]', '[{"a": 1}, {"a": 1}]', '[1, "1"]',
            '["a", "b", "c", "d"]', '[2, 4, 9]']
    assert_parity(spark, docs, {"items": {"type": "integer"}})
    assert_parity(spark, docs, {"prefixItems": [{"type": "integer"},
                                                {"type": "integer"}]})
    assert_parity(spark, docs, {"prefixItems": [{"type": "integer"}],
                                "items": False})
    assert_parity(spark, docs, {"contains": {"type": "string"},
                                "minContains": 2})
    assert_parity(spark, docs, {"uniqueItems": True})
    assert_parity(spark, docs, {"minItems": 1, "maxItems": 3})


def test_ref_parity(spark):
    schema = {
        "$defs": {"positive": {"type": "integer", "minimum": 1}},
        "type": "object",
        "properties": {"n": {"$ref": "#/$defs/positive"}},
    }
    docs = ['{"n": 5}', '{"n": 0}', '{"n": "x"}', '{}']
    assert_parity(spark, docs, schema)


def test_recursive_ref_bounded(spark):
    # linked list: {"v": int, "next": <list or absent>}
    schema = {
        "type": "object",
        "required": ["v"],
        "properties": {"v": {"type": "integer"},
                       "next": {"$ref": "#"}},
    }
    docs = ['{"v": 1}', '{"v": 1, "next": {"v": 2}}',
            '{"v": 1, "next": {"v": "bad"}}',
            '{"v": 1, "next": {"v": 2, "next": {"v": 3}}}']
    assert_parity(spark, docs, schema)


def test_invalid_json_is_invalid(spark):
    df = spark.createDataFrame([("{broken",), ("{}",), (None,)], "j string")
    plan = compile_json_schema({"type": "object"})
    rows = plan.with_validation(df, "j", mode="verbose").collect()
    assert [r["valid"] for r in rows] == [False, True, True]
    assert rows[0]["errors"][0]["keyword"] == "json"


def test_verbose_errors_structure(spark):
    df = spark.createDataFrame(
        [('{"name": 42, "age": -5}',)], "j string")
    plan = compile_json_schema(SCHEMA)
    r = plan.with_validation(df, "j", mode="verbose").first()
    kws = {e["keyword"] for e in r["errors"]}
    assert "properties" in kws or "type" in kws
    assert not r["valid"]


def test_events_props_column(spark):
    """The real dynamic column in the testdata: events.props JSON."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = compile_json_schema({
        "type": "object", "required": ["k"],
        "properties": {"k": {"type": "integer", "minimum": 0,
                             "maximum": 50}}})
    v = plan.with_validation(ev, "props", mode="flag")
    counts = {r["valid"]: r["count"]
              for r in v.groupBy("valid").count().collect()}
    # k ranges 0..99 in the synthetic data → both verdicts present
    assert counts.get(True, 0) > 0 and counts.get(False, 0) > 0
    # differential check against the oracle
    import jsonschema
    ov = jsonschema.Draft202012Validator({
        "type": "object", "required": ["k"],
        "properties": {"k": {"type": "integer", "minimum": 0,
                             "maximum": 50}}})
    rows = v.select("props", "valid").collect()
    for r in rows:
        assert r["valid"] == ov.is_valid(json.loads(r["props"]))


def test_unevaluated_properties_parity(spark):
    docs = ['{"a": 1}', '{"a": 1, "b": 2}', '{"a": 1, "z": 9}',
            '{"b": "s"}', '{}', '{"a": 1, "b": 2, "c": 3}',
            '{"num1": 5}', '{"num1": 5, "other": 1}']
    assert_parity(spark, docs, {
        "properties": {"a": {"type": "integer"}},
        "unevaluatedProperties": False})
    assert_parity(spark, docs, {
        "properties": {"a": {"type": "integer"}},
        "unevaluatedProperties": {"type": "integer"}})
    assert_parity(spark, docs, {
        "allOf": [{"properties": {"a": {}}},
                  {"properties": {"b": {}}}],
        "unevaluatedProperties": False})
    assert_parity(spark, docs, {
        "anyOf": [{"required": ["a"], "properties": {"a": {}, "b": {}}},
                  {"required": ["num1"], "properties": {"num1": {}}}],
        "unevaluatedProperties": False})
    assert_parity(spark, docs, {
        "if": {"required": ["a"]},
        "then": {"properties": {"a": {}, "b": {}}},
        "else": {"properties": {"b": {}}},
        "unevaluatedProperties": False})
    assert_parity(spark, docs, {
        "patternProperties": {"^num": {}},
        "unevaluatedProperties": False})


def test_unevaluated_items_parity(spark):
    docs = ['[]', '[1]', '[1, 2]', '[1, "s"]', '["s", 1]',
            '[1, 2, 3, 4]', '["a", "b"]']
    assert_parity(spark, docs, {
        "prefixItems": [{"type": "integer"}],
        "unevaluatedItems": False})
    assert_parity(spark, docs, {
        "prefixItems": [{"type": "integer"}],
        "unevaluatedItems": {"type": "string"}})
    assert_parity(spark, docs, {
        "contains": {"type": "string"},
        "unevaluatedItems": False})
    assert_parity(spark, docs, {
        "allOf": [{"prefixItems": [{}, {}]}],
        "unevaluatedItems": False})
    assert_parity(spark, docs, {
        "anyOf": [{"items": {"type": "integer"}},
                  {"prefixItems": [{"type": "string"}]}],
        "unevaluatedItems": False})


def test_dependent_schemas_parity(spark):
    docs = ['{"credit": "1234", "billing": "x"}', '{"credit": "1234"}',
            '{"name": "n"}', '{}', '{"credit": 5, "billing": "x"}']
    assert_parity(spark, docs, {
        "dependentSchemas": {
            "credit": {"required": ["billing"],
                       "properties": {"credit": {"type": "string"}}}}})


def test_format_keyword_variant(spark):
    from jsonschema_rs_spark.errors import ValidationOptions
    docs = ['"2024-01-15"', '"2024-13-40"', '"not a date"', '5', 'null',
            '"550e8400-e29b-41d4-a716-446655440000"']
    df = spark.createDataFrame([(d,) for d in docs], "j string")
    plan = compile_json_schema({"format": "date"},
                               ValidationOptions(validate_formats=True))
    got = [r["valid"] for r in plan.with_validation(df, "j").collect()]
    # non-strings (5, null) pass; the uuid string is not a date
    assert got == [True, False, False, True, True, False]
    plan2 = compile_json_schema({"format": "uuid"},
                                ValidationOptions(validate_formats=True))
    got2 = [r["valid"] for r in plan2.with_validation(df, "j").collect()]
    assert got2 == [False, False, False, True, True, True]


def test_contains_annotations(spark):
    """Matched-index annotations for contains sites (contains.rs:60-105
    evaluate(): annotations = array of matching indices)."""
    from jsonschema_rs_spark.compiler.variant import compile_json_schema
    plan = compile_json_schema(
        {"type": "array", "contains": {"type": "integer", "minimum": 5}})
    df = spark.createDataFrame(
        [(1, "[1, 5, 2, 9]"), (2, "[1, 2]"), (3, "[]"), (4, '"s"')],
        "id long, j string")
    out = {r["id"]: r["annotations"]
           for r in plan.with_contains_annotations(df, "j").collect()}
    assert out[1]["/contains"] == [1, 3]
    assert out[2]["/contains"] == []
    assert out[3]["/contains"] == []
    assert out[4]["/contains"] == []  # non-array: empty annotation


def test_contains_annotations_no_sites(spark):
    from jsonschema_rs_spark.compiler.variant import compile_json_schema
    plan = compile_json_schema({"type": "object"})
    df = spark.createDataFrame([(1, "{}")], "id long, j string")
    r = plan.with_contains_annotations(df, "j").first()
    assert r["annotations"] == {}
