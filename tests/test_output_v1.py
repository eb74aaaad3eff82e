"""Structured Output v1 (compiler/output.py): golden-pinned nested
hierarchical trees and flat list output, matching the reference's
documented Evaluation shapes (evaluation.rs:252 list, :416 hierarchical,
:458 iter_annotations; output-extra/v1-extra/content/list-hierarchical
analog). Error MESSAGE text is this engine's static templates (the spec
does not pin message text); everything else — unit structure,
evaluationPath/schemaLocation/instanceLocation, annotations,
droppedAnnotations — is compared exactly.
"""

import json

import pytest
from pyspark.sql import functions as F

from jsonschema_rs_spark.compiler.output import OutputPlan
from jsonschema_rs_spark.compiler.variant import compile_json_schema


def run(spark, schema, data, fmt="hierarchical"):
    plan = OutputPlan(schema)
    df = spark.createDataFrame([(json.dumps(data),)], "j string")
    col = plan.hierarchical_column(F.col("j")) if fmt == "hierarchical" \
        else plan.list_column(F.col("j"))
    return json.loads(df.select(col.alias("o")).first()["o"])


def normalize(u):
    """Sort details recursively and replace error messages with their
    keyword keys (message text is engine-specific)."""
    if isinstance(u, dict):
        out = {k: normalize(v) for k, v in u.items() if k != "errors"}
        if "errors" in u:
            out["errors"] = sorted(u["errors"].keys())
        if "details" in out:
            out["details"] = sorted(
                out["details"],
                key=lambda d: (d.get("evaluationPath", ""),
                               d.get("instanceLocation", "")))
        if "annotations" in out and isinstance(out["annotations"], list):
            out["annotations"] = sorted(out["annotations"])
        return out
    if isinstance(u, list):
        return [normalize(x) for x in u]
    return u


def test_hierarchical_doc_example(spark):
    """evaluation.rs:416 doc example, matched node-for-node."""
    schema = {"type": "array",
              "prefixItems": [{"type": "string"}],
              "items": {"type": "integer"}}
    got = normalize(run(spark, schema, ["hello", "oops"]))
    want = normalize({
        "valid": False, "evaluationPath": "", "schemaLocation": "",
        "instanceLocation": "",
        "details": [
            {"valid": True, "evaluationPath": "/type",
             "instanceLocation": "", "schemaLocation": "/type"},
            {"valid": False, "evaluationPath": "/items",
             "instanceLocation": "", "schemaLocation": "/items",
             "droppedAnnotations": True,
             "details": [
                 {"valid": False, "evaluationPath": "/items",
                  "instanceLocation": "/1", "schemaLocation": "/items",
                  "details": [
                      {"valid": False, "evaluationPath": "/items/type",
                       "instanceLocation": "/1",
                       "schemaLocation": "/items/type",
                       "errors": {"type": "x"}}]}]},
            {"valid": True, "evaluationPath": "/prefixItems",
             "instanceLocation": "", "schemaLocation": "/prefixItems",
             "annotations": 0,
             "details": [
                 {"valid": True, "evaluationPath": "/prefixItems/0",
                  "instanceLocation": "/0",
                  "schemaLocation": "/prefixItems/0",
                  "details": [
                      {"valid": True,
                       "evaluationPath": "/prefixItems/0/type",
                       "instanceLocation": "/0",
                       "schemaLocation": "/prefixItems/0/type"}]}]},
        ]})
    assert got == want


def test_list_output_flattens_same_units(spark):
    schema = {"type": "array",
              "prefixItems": [{"type": "string"}],
              "items": {"type": "integer"}}
    got = run(spark, schema, ["hello", "oops"], fmt="list")
    assert got["valid"] is False
    paths = sorted((d["evaluationPath"], d["instanceLocation"])
                   for d in got["details"])
    assert paths == [("", ""), ("/items", ""), ("/items", "/1"),
                     ("/items/type", "/1"), ("/prefixItems", ""),
                     ("/prefixItems/0", "/0"),
                     ("/prefixItems/0/type", "/0"), ("/type", "")]
    # list units never nest
    assert all("details" not in d for d in got["details"])


def test_properties_annotations_and_id_locations(spark):
    """output-extra list-hierarchical/0 analog: property annotations,
    boolean property schemas, $id-absolute schemaLocations, $ref jump."""
    schema = {
        "$id": "https://example.com/out.json",
        "type": "object",
        "$defs": {"integer": {"type": "integer"}},
        "properties": {
            "passes": True,
            "fails": False,
            "refs": {"$ref": "#/$defs/integer"},
        },
    }
    got = run(spark, schema, {"passes": "value"})
    assert got["valid"] is True
    assert got["schemaLocation"] == "https://example.com/out.json#"
    props = next(d for d in got["details"]
                 if d["evaluationPath"] == "/properties")
    assert props["annotations"] == ["passes"]
    assert props["schemaLocation"] \
        == "https://example.com/out.json#/properties"
    inner = props["details"]
    assert [d["evaluationPath"] for d in inner] == ["/properties/passes"]
    assert inner[0]["instanceLocation"] == "/passes"

    # failing boolean property → droppedAnnotations + error unit
    got2 = run(spark, schema, {"fails": "value"})
    assert got2["valid"] is False
    props2 = next(d for d in got2["details"]
                  if d["evaluationPath"] == "/properties")
    assert props2["droppedAnnotations"] is True
    unit = props2["details"][0]
    assert unit["evaluationPath"] == "/properties/fails"
    assert unit["valid"] is False and "errors" in unit

    # $ref: evaluationPath goes through /$ref, schemaLocation jumps
    got3 = run(spark, schema, {"refs": "not-an-int"})
    props3 = next(d for d in got3["details"]
                  if d["evaluationPath"] == "/properties")
    refu = props3["details"][0]
    assert refu["evaluationPath"] == "/properties/refs"
    ref_target = refu["details"][0]
    assert ref_target["evaluationPath"] == "/properties/refs/$ref"
    assert ref_target["schemaLocation"] \
        == "https://example.com/out.json#/$defs/integer"
    leaf = ref_target["details"][0]
    assert leaf["evaluationPath"] == "/properties/refs/$ref/type"
    assert leaf["valid"] is False


def test_allof_branch_units(spark):
    schema = {"allOf": [{"type": "integer"}, {"minimum": 5}]}
    got = run(spark, schema, 3)
    assert got["valid"] is False
    allof = next(d for d in got["details"]
                 if d["evaluationPath"] == "/allOf")
    assert allof["valid"] is False
    eps = sorted(d["evaluationPath"] for d in allof["details"])
    assert eps == ["/allOf/0", "/allOf/1"]
    b0 = next(d for d in allof["details"]
              if d["evaluationPath"] == "/allOf/0")
    assert b0["valid"] is True
    b1 = next(d for d in allof["details"]
              if d["evaluationPath"] == "/allOf/1")
    assert b1["valid"] is False


def test_contains_annotation_indices(spark):
    schema = {"contains": {"type": "integer"}}
    got = run(spark, schema, ["a", 1, "b", 2])
    cu = next(d for d in got["details"]
              if d["evaluationPath"] == "/contains")
    assert cu["valid"] is True and cu["annotations"] == [1, 3]


def test_with_output_api(spark):
    plan = compile_json_schema({"type": "integer"})
    df = spark.createDataFrame([("1",), ('"s"',)], "j string")
    out = plan.with_output(df, "j", format="hierarchical")
    rows = [json.loads(r["output"]) for r in out.collect()]
    assert rows[0]["valid"] is True and rows[1]["valid"] is False
    lst = plan.with_output(df, "j", format="list").collect()
    assert json.loads(lst[1]["output"])["details"][1]["errors"]
    with pytest.raises(ValueError, match="unknown output format"):
        plan.with_output(df, "j", format="basic")


def test_output_plan_no_shuffle_no_python(spark):
    plan = OutputPlan({"type": "object",
                       "properties": {"a": {"type": "integer"}},
                       "required": ["a"]})
    df = spark.createDataFrame([('{"a":1}',)], "j string")
    p = df.select(plan.hierarchical_column(F.col("j")).alias("o")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_pattern_properties_per_name_subtrees(spark):
    """Each property matching a pattern gets its own child unit subtree:
    evaluationPath carries the PATTERN (schema traversal), the
    instanceLocation the property name (evaluation.rs hierarchical
    semantics for patternProperties applications)."""
    schema = {"type": "object",
              "properties": {"name": {"type": "string"}},
              "patternProperties": {"^x-": {"type": "integer"}},
              "additionalProperties": {"type": "boolean"}}
    got = run(spark, schema,
              {"name": "a", "x-one": 1, "x-bad": "no", "extra": True})
    pp = next(d for d in got["details"]
              if d["evaluationPath"] == "/patternProperties")
    assert pp["valid"] is False
    assert pp["droppedAnnotations"] is True
    kids = {c["instanceLocation"]: c["valid"] for c in pp["details"]}
    assert kids == {"/x-one": True, "/x-bad": False}
    bad = next(c for c in pp["details"]
               if c["instanceLocation"] == "/x-bad")
    leaf = bad["details"][0]
    assert leaf["evaluationPath"] == "/patternProperties/^x-/type"
    assert leaf["schemaLocation"] == "/patternProperties/^x-/type"
    assert "type" in leaf["errors"]

    ap = next(d for d in got["details"]
              if d["evaluationPath"] == "/additionalProperties")
    assert ap["valid"] is True
    assert ap["annotations"] == ["extra"]
    assert [c["instanceLocation"] for c in ap["details"]] == ["/extra"]


def test_pattern_properties_annotations_valid(spark):
    schema = {"patternProperties": {"^x-": {"type": "integer"}}}
    got = run(spark, schema, {"x-a": 1, "x-b": 2, "other": "s"})
    pp = next(d for d in got["details"]
              if d["evaluationPath"] == "/patternProperties")
    assert pp["valid"] is True
    assert sorted(pp["annotations"]) == ["x-a", "x-b"]
    assert {c["instanceLocation"] for c in pp["details"]} \
        == {"/x-a", "/x-b"}


def test_additional_properties_false_per_name(spark):
    schema = {"properties": {"a": {}}, "additionalProperties": False}
    got = run(spark, schema, {"a": 1, "b": 2})
    ap = next(d for d in got["details"]
              if d["evaluationPath"] == "/additionalProperties")
    assert ap["valid"] is False
    kid = ap["details"][0]
    assert kid["instanceLocation"] == "/b" and kid["valid"] is False
    assert "false" in kid["errors"]


def test_per_name_subtree_escaping(spark):
    """Names containing /, ~, quotes, and backslashes are JSON-Pointer
    escaped in instanceLocation and JSON-escaped in the output string."""
    schema = {"patternProperties": {"": {"type": "integer"}}}
    got = run(spark, schema, {'a/b"q\\r~s': 3})
    pp = next(d for d in got["details"]
              if d["evaluationPath"] == "/patternProperties")
    assert pp["details"][0]["instanceLocation"] == '/a~1b"q\\r~0s'
    assert got["valid"] is True


def test_per_name_subtrees_in_list_format(spark):
    schema = {"patternProperties": {"^x-": {"type": "integer"}},
              "additionalProperties": {"type": "boolean"}}
    plan = OutputPlan(schema)
    df = spark.createDataFrame(
        [(json.dumps({"x-a": 1, "zzz": "bad"}),)], "j string")
    out = json.loads(
        df.select(plan.list_column(F.col("j")).alias("o")).first()["o"])
    assert out["valid"] is False
    locs = {(d["evaluationPath"], d["instanceLocation"])
            for d in out["details"]}
    assert ("/patternProperties/^x-", "/x-a") in locs
    assert ("/additionalProperties", "/zzz") in locs
    assert ("/additionalProperties/type", "/zzz") in locs


def test_unevaluated_properties_per_name_subtrees(spark):
    """Keys not claimed by properties / a VALID allOf branch get their
    own child unit subtree under /unevaluatedProperties; the unit's
    validity is keyword-accurate (not whole-schema validity)."""
    schema = {"properties": {"a": {"type": "integer"}},
              "allOf": [{"properties": {"b": {"type": "string"}}}],
              "unevaluatedProperties": {"type": "boolean"}}
    got = run(spark, schema, {"a": 1, "b": "s", "c": True, "d": 2})
    up = next(d for d in got["details"]
              if d["evaluationPath"] == "/unevaluatedProperties")
    assert up["valid"] is False          # d=2 is not a boolean
    assert up["droppedAnnotations"] is True
    kids = {c["instanceLocation"]: c["valid"] for c in up["details"]}
    assert kids == {"/c": True, "/d": False}
    bad = next(c for c in up["details"]
               if c["instanceLocation"] == "/d")
    leaf = bad["details"][0]
    assert leaf["evaluationPath"] == "/unevaluatedProperties/type"


def test_unevaluated_properties_annotations_and_failed_branch(spark):
    """A FAILED in-place branch does not claim its keys (2020-12
    validity-conditioned coverage), so they fall to
    unevaluatedProperties — whose annotation lists them when valid."""
    schema = {"anyOf": [{"properties": {"x": {"type": "integer"}},
                         "required": ["x"]},
                        {"required": ["y"]}],
              "unevaluatedProperties": {"type": "integer"}}
    # branch 1 fails (x missing) -> y unclaimed by coverage of branch 1;
    # branch 2 valid but covers nothing
    got = run(spark, schema, {"y": 7})
    up = next(d for d in got["details"]
              if d["evaluationPath"] == "/unevaluatedProperties")
    assert up["valid"] is True
    assert up["annotations"] == ["y"]
    assert [c["instanceLocation"] for c in up["details"]] == ["/y"]


def test_unevaluated_properties_keyword_accurate_validity(spark):
    """Sibling keyword fails but unevaluatedProperties itself passes:
    the unit must be valid (old aggregate form inherited the failure)."""
    schema = {"properties": {"a": {"type": "integer"}},
              "unevaluatedProperties": False}
    got = run(spark, schema, {"a": "not-an-int"})
    up = next(d for d in got["details"]
              if d["evaluationPath"] == "/unevaluatedProperties")
    assert up["valid"] is True
    assert got["valid"] is False


def test_unevaluated_items_per_index_subtrees(spark):
    schema = {"prefixItems": [{"type": "integer"}],
              "unevaluatedItems": {"type": "string"}}
    got = run(spark, schema, [1, "ok", 3])
    ui = next(d for d in got["details"]
              if d["evaluationPath"] == "/unevaluatedItems")
    assert ui["valid"] is False          # index 2 is not a string
    kids = {c["instanceLocation"]: c["valid"] for c in ui["details"]}
    assert kids == {"/1": True, "/2": False}
    leaf = next(c for c in ui["details"]
                if c["instanceLocation"] == "/2")["details"][0]
    assert leaf["evaluationPath"] == "/unevaluatedItems/type"


def test_unevaluated_items_contains_coverage(spark):
    """Elements matched by `contains` are evaluated, so only the rest
    reach unevaluatedItems."""
    schema = {"contains": {"type": "integer"},
              "unevaluatedItems": {"type": "boolean"}}
    got = run(spark, schema, [1, True, 2, False])
    ui = next(d for d in got["details"]
              if d["evaluationPath"] == "/unevaluatedItems")
    assert ui["valid"] is True
    assert ui["annotations"] is True
    assert {c["instanceLocation"] for c in ui["details"]} \
        == {"/1", "/3"}


def test_unevaluated_in_list_format(spark):
    schema = {"properties": {"a": {}},
              "unevaluatedProperties": {"type": "integer"}}
    plan = OutputPlan(schema)
    df = spark.createDataFrame(
        [(json.dumps({"a": 1, "z": "bad"}),)], "j string")
    out = json.loads(
        df.select(plan.list_column(F.col("j")).alias("o")).first()["o"])
    assert out["valid"] is False
    locs = {(d["evaluationPath"], d["instanceLocation"])
            for d in out["details"]}
    assert ("/unevaluatedProperties", "/z") in locs
    assert ("/unevaluatedProperties/type", "/z") in locs


def test_not_nested_branch_tree(spark):
    schema = {"not": {"type": "integer"}}
    got = run(spark, schema, 5)
    nu = next(d for d in got["details"]
              if d["evaluationPath"] == "/not")
    assert nu["valid"] is False and "not" in nu["errors"]
    kid = nu["details"][0]
    assert kid["evaluationPath"] == "/not" and kid["valid"] is True
    leaf = kid["details"][0]
    assert leaf["evaluationPath"] == "/not/type" and leaf["valid"] is True
    # passing case: child subtree shows the failed subschema
    got = run(spark, schema, "s")
    nu = next(d for d in got["details"]
              if d["evaluationPath"] == "/not")
    assert nu["valid"] is True
    assert nu["details"][0]["valid"] is False


def test_if_then_else_branch_trees(spark):
    schema = {"if": {"type": "integer"},
              "then": {"minimum": 10},
              "else": {"type": "string"}}
    got = run(spark, schema, 5)           # if passes, then fails
    eps = {d["evaluationPath"]: d["valid"] for d in got["details"]}
    assert eps["/if"] is True and eps["/then"] is False
    assert "/else" not in eps
    assert got["valid"] is False
    got = run(spark, schema, True)        # if fails, else fails
    eps = {d["evaluationPath"]: d["valid"] for d in got["details"]}
    assert eps["/if"] is False            # reported, but not a parent error
    assert eps["/else"] is False and "/then" not in eps
    assert got["valid"] is False
    got = run(spark, schema, "ok")        # if fails, else passes
    eps = {d["evaluationPath"]: d["valid"] for d in got["details"]}
    assert eps["/if"] is False and eps["/else"] is True
    assert got["valid"] is True


def test_dependent_schemas_branch_trees(spark):
    schema = {"dependentSchemas": {
        "credit": {"required": ["billing"]},
        "other": {"required": ["nope"]}}}
    got = run(spark, schema, {"credit": 1})
    eps = {d["evaluationPath"]: d for d in got["details"]}
    ds = eps["/dependentSchemas/credit"]
    assert ds["valid"] is False
    leaf = ds["details"][0]
    assert leaf["evaluationPath"] == "/dependentSchemas/credit/required"
    assert "/dependentSchemas/other" not in eps   # trigger absent
    assert got["valid"] is False


def test_property_names_per_name_subtrees(spark):
    schema = {"propertyNames": {"maxLength": 2}}
    got = run(spark, schema, {"ok": 1, "toolong": 2})
    pn = next(d for d in got["details"]
              if d["evaluationPath"] == "/propertyNames")
    assert pn["valid"] is False and "propertyNames" in pn["errors"]
    kids = [c["valid"] for c in pn["details"]]
    assert sorted(kids) == [False, True]
    bad = next(c for c in pn["details"] if not c["valid"])
    leaf = bad["details"][0]
    assert leaf["evaluationPath"] == "/propertyNames/maxLength"
    assert leaf["instanceLocation"] == ""   # names are not addressable
    # all names pass
    got = run(spark, schema, {"a": 1, "b": 2})
    pn = next(d for d in got["details"]
              if d["evaluationPath"] == "/propertyNames")
    assert pn["valid"] is True and len(pn["details"]) == 2
