"""Per-keyword behavior on typed columns (SURVEY.md §2.1-§2.2)."""

import pytest
from pyspark.sql import functions as F

from jsonschema_rs_spark import compile_schema, ValidationOptions
from jsonschema_rs_spark.errors import SchemaError


def verdicts(spark, rows, ddl, schema, options=None, column=None):
    df = spark.createDataFrame(rows, ddl)
    plan = compile_schema(schema, df.schema, options=options, column=column)
    return [r.valid for r in plan.with_validation(df).select("valid").collect()]


def test_minimum_maximum(spark):
    s = {"properties": {"n": {"minimum": 0, "maximum": 10}}}
    assert verdicts(spark, [(5,), (0,), (10,), (-1,), (11,), (None,)],
                    "n int", s) == [True, True, True, False, False, True]


def test_exclusive_bounds(spark):
    s = {"properties": {"n": {"exclusiveMinimum": 0, "exclusiveMaximum": 10}}}
    assert verdicts(spark, [(5,), (0,), (10,)], "n int", s) == [True, False, False]


def test_draft4_exclusive_bool(spark):
    s = {"properties": {"n": {"minimum": 0, "exclusiveMinimum": True}}}
    assert verdicts(spark, [(0,), (1,)], "n int", s) == [False, True]


def test_multiple_of_int(spark):
    s = {"properties": {"n": {"multipleOf": 3}}}
    assert verdicts(spark, [(9,), (10,), (0,), (-6,)], "n int", s) == \
        [True, False, True, True]


def test_multiple_of_float(spark):
    s = {"properties": {"x": {"multipleOf": 0.1}}}
    # 0.1 steps: parity with the reference's exact-fraction kernel on the
    # representative cases (ext/numeric.rs:62-110)
    assert verdicts(spark, [(0.3,), (1.0,), (0.25,), (19.9,)], "x double", s) == \
        [True, True, False, True]


def test_integer_type_on_double(spark):
    s = {"properties": {"x": {"type": "integer"}}}
    assert verdicts(spark, [(1.0,), (1.5,), (None,)], "x double", s) == \
        [True, False, True]


def test_type_mismatch_static(spark):
    s = {"properties": {"x": {"type": "string"}}}
    assert verdicts(spark, [(1,), (None,)], "x int", s) == [False, True]


def test_const_and_enum(spark):
    s = {"properties": {"k": {"const": "a"}, "e": {"enum": ["x", "y"]}}}
    assert verdicts(spark, [("a", "x"), ("b", "x"), ("a", "z")],
                    "k string, e string", s) == [True, False, False]


def test_enum_numeric_cross_type(spark):
    # 1 == 1.0 numeric equality (reference: ext/cmp.rs:46-107)
    s = {"properties": {"n": {"enum": [1, 2.5]}}}
    assert verdicts(spark, [(1.0,), (2.5,), (1.1,)], "n double", s) == \
        [True, True, False]


def test_min_max_length_unicode(spark):
    # astral-plane char counts as ONE character (keywords/min_length.rs:46)
    s = {"properties": {"t": {"minLength": 2, "maxLength": 3}}}
    assert verdicts(spark, [("ab",), ("a",), ("abcd",), ("\U0001D11Eé",)],
                    "t string", s) == [True, False, False, True]


def test_pattern_unanchored_search(spark):
    s = {"properties": {"t": {"pattern": "b+c"}}}
    assert verdicts(spark, [("abbc",), ("ac",)], "t string", s) == [True, False]


def test_pattern_dollar_is_absolute_end(spark):
    # Java $ would match before a trailing \n; ECMA $ must not
    s = {"properties": {"t": {"pattern": "^abc$"}}}
    assert verdicts(spark, [("abc",), ("abc\n",)], "t string", s) == [True, False]


def test_pattern_prefix_fast_path(spark):
    s = {"properties": {"t": {"pattern": "^doc-"}}}
    assert verdicts(spark, [("doc-1",), ("xdoc-1",)], "t string", s) == \
        [True, False]


def test_required(spark):
    s = {"required": ["a", "b"]}
    assert verdicts(spark, [("x", "y"), ("x", None), (None, None)],
                    "a string, b string", s) == [True, False, False]


def test_required_statically_missing_column(spark):
    s = {"required": ["zzz"]}
    assert verdicts(spark, [("x",)], "a string", s) == [False]


def test_dependent_required(spark):
    s = {"dependentRequired": {"a": ["b"]}}
    assert verdicts(spark, [("x", "y"), ("x", None), (None, None)],
                    "a string, b string", s) == [True, False, True]


def test_meta_validation_rejects_garbage(spark):
    with pytest.raises(SchemaError):
        compile_schema({"minLength": -1}, spark.createDataFrame([("a",)], "t string").schema)
    with pytest.raises(SchemaError):
        compile_schema({"type": "strnig"}, spark.createDataFrame([("a",)], "t string").schema)
    with pytest.raises(SchemaError):
        compile_schema({"multipleOf": 0}, spark.createDataFrame([(1,)], "n int").schema)


def test_single_column_mode(spark):
    df = spark.createDataFrame([("alpha",), ("x",)], "name string")
    plan = compile_schema({"type": "string", "minLength": 3}, df.schema,
                          column="name")
    assert [r.valid for r in plan.with_validation(df).collect()] == [True, False]


def test_formats_opt_in(spark):
    rows = [("2024-02-29",), ("2023-02-29",), ("not-a-date",)]
    s = {"properties": {"d": {"format": "date"}}}
    # default: annotation only
    assert verdicts(spark, rows, "d string", s) == [True, True, True]
    opts = ValidationOptions(validate_formats=True)
    assert verdicts(spark, rows, "d string", s, options=opts) == \
        [True, False, False]


def test_format_uuid_ipv4(spark):
    opts = ValidationOptions(validate_formats=True)
    s = {"properties": {"u": {"format": "uuid"}, "i": {"format": "ipv4"}}}
    rows = [("123e4567-e89b-12d3-a456-426614174000", "192.168.0.1"),
            ("123e4567-e89b-12d3-a456-42661417400", "256.1.1.1")]
    assert verdicts(spark, rows, "u string, i string", s, options=opts) == \
        [True, False]


def test_content_encoding_base64(spark):
    s = {"properties": {"b": {"contentEncoding": "base64"}}}
    rows = [("aGVsbG8=",), ("not base64!!",)]
    assert verdicts(spark, rows, "b string", s) == [True, False]


def test_draft4_integer_typed(spark):
    from jsonschema_rs_spark.errors import ValidationOptions
    df = spark.createDataFrame([(1, 1.0), (2, 1.5), (3, 3.0)],
                               "id long, x double")
    schema = {"properties": {"x": {"type": "integer"}}}
    from jsonschema_rs_spark import compile_schema
    modern = compile_schema(schema, df.schema)
    got = {r["id"]: r["valid"]
           for r in modern.with_validation(df).collect()}
    assert got == {1: True, 2: False, 3: True}  # zero fraction IS integer
    d4 = compile_schema(schema, df.schema,
                        ValidationOptions(draft4_integer=True))
    got = {r["id"]: r["valid"] for r in d4.with_validation(df).collect()}
    assert got == {1: False, 2: False, 3: False}  # a float never is
    # integral dtype unaffected
    di = spark.createDataFrame([(1, 5)], "id long, x long")
    d4i = compile_schema(schema, di.schema,
                         ValidationOptions(draft4_integer=True))
    assert d4i.with_validation(di).first()["valid"] is True
