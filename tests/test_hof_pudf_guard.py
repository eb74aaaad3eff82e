"""pUDF-backed corner paths inside higher-order-function lambdas.

Spark rejects Python UDFs under lambda functions
(UNSUPPORTED_FEATURE.LAMBDA_FUNCTION_WITH_PYTHON_UDF). Found by the
random-schema fuzz: {"items": {"multipleOf": 2.5}} crashed at plan
build because the multipleOf Fraction fallback embeds a pandas UDF.
The variant compiler now tracks lambda-embedded compiles
(VariantCompileContext.hof_depth, sticky for the subtree) and compiles
pure-Column forms there; pUDF formats fall back or raise SchemaError.
"""

import json

import pytest
from pyspark.sql import functions as F

from jsonschema_rs_spark.errors import SchemaError, ValidationOptions
from jsonschema_rs_spark.compiler.variant import compile_json_schema


def _verdicts(spark, plan, values):
    df = spark.createDataFrame([(json.dumps(v),) for v in values],
                               "j string")
    return [r["valid"] for r in
            plan.with_validation(df, "j", mode="flag").collect()]


@pytest.mark.parametrize("schema", [
    {"items": {"multipleOf": 2.5}},
    {"contains": {"multipleOf": 2.5}, "minContains": 1},
    {"patternProperties": {"^n": {"multipleOf": 0.5}}},
    {"additionalProperties": {"multipleOf": 2.5}},
    {"items": {"properties": {"a": {"multipleOf": 2.5}}}},  # sticky
    {"properties": {"a": {}}, "unevaluatedProperties": {"multipleOf": 2.5}},
])
def test_multiple_of_inside_hof_compiles_and_validates(spark, schema):
    plan = compile_json_schema(schema)
    vals = [[5.0, 2.5], [4.0], [], {"n1": 2.5}, {"n1": 3.0},
            {"a": 7.5}, {"a": 7.6}, 3, "x"]
    got = _verdicts(spark, plan, vals)
    import jsonschema
    oracle = jsonschema.Draft202012Validator(schema)
    assert got == [oracle.is_valid(v) for v in vals]


def test_top_level_multiple_of_keeps_fraction_fallback(spark):
    """The exactness upgrade must survive OUTSIDE lambdas: 5e-324 is the
    known Java-17 non-shortest rendering the pUDF fallback exists for."""
    plan = compile_json_schema({"multipleOf": 1e-323})
    got = _verdicts(spark, plan, [5e-324 * 2])
    assert got == [True]


def test_huge_int_divisor_inside_hof(spark):
    """Integer divisors beyond 2^53 inside a lambda take the pure
    decimal/fmod ladder (no pUDF); integer-lexical values stay exact."""
    big = 2 ** 60
    plan = compile_json_schema({"items": {"multipleOf": big}})
    got = _verdicts(spark, plan, [[2 ** 61], [2 ** 61 + 1], [0], []])
    assert got == [True, False, True, True]


def test_format_regex_inside_hof_downgrades(spark):
    """format: regex has no Column equivalent; under items it becomes
    annotation-only instead of crashing (2020-12 allows annotation)."""
    plan = compile_json_schema(
        {"items": {"format": "regex", "type": "string"}},
        ValidationOptions(validate_formats=True))
    got = _verdicts(spark, plan, [["a("], [1]])
    assert got == [True, False]  # type still asserts; regex check waived


def test_custom_format_inside_hof_raises_schema_error(spark):
    with pytest.raises(SchemaError):
        compile_json_schema(
            {"items": {"format": "vowels"}},
            ValidationOptions(validate_formats=True,
                              custom_formats={"vowels": lambda s: True}))


def test_custom_content_encoding_inside_hof_raises(spark):
    with pytest.raises(SchemaError):
        compile_json_schema(
            {"items": {"contentEncoding": "rot13"}},
            ValidationOptions(
                custom_content_encodings={"rot13": lambda s: True}))


# --------------------------------------------------------------------------
# TYPED-path mirrors (CompileContext.hof_depth): found by the typed
# random-schema fuzz — {"spans": {"items": {"properties": {"offset":
# {"multipleOf": 2.5}}}}} crashed at plan build exactly like the variant
# case, because keywords.build_multiple_of embedded the Fraction pUDF
# inside the array items F.forall lambda.
# --------------------------------------------------------------------------


def _typed_verdicts(spark, schema, rows, ddl):
    from jsonschema_rs_spark import compile_schema

    df = spark.createDataFrame(rows, ddl)
    plan = compile_schema(schema, df.schema)
    return [r["valid"] for r in plan.with_validation(df).collect()]


def test_typed_multiple_of_inside_array_items(spark):
    schema = {"properties": {"xs": {"items": {"multipleOf": 2.5}}}}
    got = _typed_verdicts(
        spark, schema,
        [([5.0, 2.5],), ([4.0],), ([],)], "xs array<double>")
    assert got == [True, False, True]


def test_typed_multiple_of_inside_contains(spark):
    schema = {"properties": {"xs": {
        "contains": {"multipleOf": 2.5}, "minContains": 2}}}
    got = _typed_verdicts(
        spark, schema,
        [([5.0, 2.5],), ([5.0, 4.0],)], "xs array<double>")
    assert got == [True, False]


def test_typed_multiple_of_inside_map_values(spark):
    schema = {"properties": {"m": {
        "additionalProperties": {"multipleOf": 2.5}}}}
    got = _typed_verdicts(
        spark, schema,
        [({"a": 5.0},), ({"a": 4.0},)], "m map<string,double>")
    assert got == [True, False]


def test_typed_multiple_of_inside_unevaluated_items(spark):
    schema = {"properties": {"xs": {
        "prefixItems": [{"type": "number"}],
        "unevaluatedItems": {"multipleOf": 2.5}}}}
    got = _typed_verdicts(
        spark, schema,
        [([1.0, 5.0],), ([1.0, 4.0],), ([1.0],)], "xs array<double>")
    assert got == [True, False, True]


def test_typed_huge_divisor_inside_items_no_crash(spark):
    # odd part beyond 2^63 under a lambda: fmod-on-rounded-divisor
    # deviation path — must compile and keep 0 a multiple
    big = 10 ** 25 + 1
    schema = {"properties": {"xs": {"items": {"multipleOf": big}}}}
    got = _typed_verdicts(
        spark, schema, [([0.0],), ([],)], "xs array<double>")
    assert got == [True, True]


def test_typed_top_level_keeps_fraction_fallback(spark):
    # outside lambdas the typed float path still routes long-rendering
    # corners through the exact Fraction pUDF
    schema = {"properties": {"x": {"multipleOf": 1e-323}}}
    got = _typed_verdicts(spark, schema, [(5e-324 * 2,)], "x double")
    assert got == [True]


def test_typed_custom_format_inside_items_raises_schema_error(spark):
    from jsonschema_rs_spark import compile_schema
    from pyspark.sql import types as T

    dt = T.StructType([T.StructField(
        "xs", T.ArrayType(T.StringType()))])
    with pytest.raises(SchemaError):
        compile_schema(
            {"properties": {"xs": {"items": {"format": "vowels"}}}},
            dt,
            ValidationOptions(validate_formats=True,
                              custom_formats={"vowels": lambda s: True}))
