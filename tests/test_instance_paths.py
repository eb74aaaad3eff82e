"""Instance-path / schema-path golden pins — the analog of the
reference's draft7_instance_paths.json expectations (suite.rs:209-270):
violations() output is checked VALUE-level against hand-pinned
(instance_path, schema_path, keyword) tuples, not just counts."""

import pytest
from pyspark.sql import functions as F

from jsonschema_rs_spark import compile_schema


def viols(spark, df, schema, id_col, **kw):
    plan = compile_schema(schema, df.schema, **kw)
    return sorted(
        (r[id_col], r["instance_path"], r["schema_path"], r["keyword"])
        for r in plan.violations(df, [id_col]).collect())


def test_scalar_paths(spark):
    df = spark.createDataFrame(
        [(1, 5, "ok"), (2, -1, "ok"), (3, 5, "x")],
        "id long, n long, s string")
    schema = {"type": "object",
              "properties": {"n": {"minimum": 0},
                             "s": {"minLength": 2}}}
    got = viols(spark, df, schema, "id")
    assert got == [
        (2, "/n", "/properties/n/minimum", "minimum"),
        (3, "/s", "/properties/s/minLength", "minLength"),
    ]


def test_array_item_paths(spark):
    df = spark.createDataFrame(
        [(1, ["ab", "cd"]), (2, ["ab", "x", "y"]), (3, [])],
        "id long, xs array<string>")
    schema = {"type": "object",
              "properties": {"xs": {"type": "array", "minItems": 1,
                                    "items": {"minLength": 2}}}}
    got = viols(spark, df, schema, "id")
    assert got == [
        (2, "/xs/1", "/properties/xs/items/minLength", "minLength"),
        (2, "/xs/2", "/properties/xs/items/minLength", "minLength"),
        (3, "/xs", "/properties/xs/minItems", "minItems"),
    ]


def test_nested_struct_paths(spark):
    df = spark.createDataFrame(
        [(1, [{"kind": "text", "offset": 0}]),
         (2, [{"kind": "bad", "offset": 0},
              {"kind": "text", "offset": -1}])],
        "id long, spans array<struct<kind:string,offset:int>>")
    schema = {
        "type": "array",
        "items": {"type": "object",
                  "properties": {"kind": {"enum": ["text", "image"]},
                                 "offset": {"minimum": 0}}},
    }
    got = viols(spark, df, schema, "id", column="spans")
    # column-scoped validation: instance paths are relative to the
    # validated column (root-object specs like DOC_SPEC_FULL prepend the
    # property name instead)
    assert got == [
        (2, "/0/kind", "/items/properties/kind/enum", "enum"),
        (2, "/1/offset", "/items/properties/offset/minimum", "minimum"),
    ]


def test_required_paths(spark):
    df = spark.createDataFrame([(1, None), (2, "x")], "id long, s string")
    schema = {"type": "object", "required": ["s"]}
    got = viols(spark, df, schema, "id")
    assert got == [(1, "", "/required", "required")]


def test_variant_object_paths(spark):
    from jsonschema_rs_spark.compiler.variant import compile_json_schema
    plan = compile_json_schema(
        {"type": "object",
         "properties": {"a": {"type": "integer"},
                        "b": {"properties": {"c": {"minimum": 0}}}}})
    df = spark.createDataFrame(
        [(1, '{"a": "x"}'), (2, '{"b": {"c": -1}}'), (3, '{"a": 1}'),
         (4, 'not json')],
        "id long, j string")
    v = plan.with_validation(df, "j", mode="verbose")
    got = sorted(
        (r["id"], r["err"]["instance_path"], r["err"]["schema_path"],
         r["err"]["keyword"])
        for r in v.where(~F.col("valid"))
        .select("id", F.explode("errors").alias("err")).collect())
    assert got == [
        (1, "/a", "/properties/a/type", "type"),
        (2, "/b/c", "/properties/b/properties/c/minimum", "minimum"),
        (4, "", "", "json"),
    ]


def test_ref_paths_follow_the_reference_site(spark):
    df = spark.createDataFrame([(1, -5)], "id long, n long")
    schema = {"properties": {"n": {"$ref": "#/$defs/pos"}},
              "$defs": {"pos": {"minimum": 0}}}
    got = viols(spark, df, schema, "id")
    # the $ref hop is recorded in the schema path (compile-time unroll)
    assert got == [(1, "/n", "/properties/n/$ref/minimum", "minimum")]
