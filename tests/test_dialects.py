"""Multi-draft dialect gating (compiler/dialects.py; reference
keywords/mod.rs:254-510 get_for_draft, referencing
specification/mod.rs:54 $schema detection).

Live differential: the same schema compiled under each draft dialect
must agree with the matching python-jsonschema Draft*Validator on every
instance — per-draft keyword applicability, $ref-sibling exclusivity,
and draft-4 numeric legacy forms all covered.
"""

import json

import jsonschema
import pytest

from jsonschema_rs_spark.compiler.dialects import Dialect, detect_dialect
from jsonschema_rs_spark.compiler.variant import compile_json_schema
from jsonschema_rs_spark.errors import ValidationOptions

ORACLES = {
    "4": jsonschema.Draft4Validator,
    "6": jsonschema.Draft6Validator,
    "7": jsonschema.Draft7Validator,
    "2019-09": jsonschema.Draft201909Validator,
    "2020-12": jsonschema.Draft202012Validator,
}

# schemas mixing keywords from several drafts — applicability differs
# per dialect, which is exactly what the differential certifies
SCHEMAS = [
    {"const": 3},
    {"contains": {"type": "integer"}, "minContains": 2},
    {"propertyNames": {"maxLength": 2}},
    {"exclusiveMinimum": 5},
    {"if": {"type": "integer"}, "then": {"minimum": 5},
     "else": {"type": "string"}},
    {"prefixItems": [{"type": "integer"}], "items": {"type": "string"}},
    {"dependentRequired": {"a": ["b"]}},
    {"dependentSchemas": {"a": {"required": ["b"]}}},
    {"properties": {"a": {"type": "integer"}},
     "unevaluatedProperties": False},
    {"$defs": {"t": {"type": "integer"}}, "$ref": "#/$defs/t",
     "minimum": 100},
    {"definitions": {"t": {"type": "integer"}},
     "$ref": "#/definitions/t", "maxLength": 1},
]

INSTANCES = [3, 4, 5, 6, 200, "s", "abc", True, None, [],
             [1], [1, 2], [1, "s"], ["s"], {}, {"a": 1},
             {"a": 1, "b": 2}, {"a": 1, "extra": "x"}, {"ab": 1},
             {"abc": 1}]


@pytest.mark.parametrize("draft", list(ORACLES))
def test_dialect_differential(spark, draft):
    plans, oracle_classes = [], []
    for schema in SCHEMAS:
        plans.append(compile_json_schema(
            schema, ValidationOptions(dialect=draft)))
        oracle_classes.append(ORACLES[draft](schema))
    rows = [(si, json.dumps(inst))
            for si in range(len(SCHEMAS)) for inst in INSTANCES]
    df = spark.createDataFrame(rows, "sid int, doc string")
    from pyspark.sql import functions as F
    valid = F.lit(None).cast("boolean")
    for si, plan in enumerate(plans):
        valid = F.when(F.col("sid") == si,
                       plan.valid_column(F.col("doc"))).otherwise(valid)
    got = [r["v"] for r in
           df.select(valid.alias("v")).collect()]
    want, labels = [], []
    for si in range(len(SCHEMAS)):
        for inst in INSTANCES:
            want.append(bool(oracle_classes[si].is_valid(inst)))
            labels.append((draft, SCHEMAS[si], inst))
    mismatches = [(lbl, g, w)
                  for lbl, g, w in zip(labels, got, want) if g != w]
    assert not mismatches, mismatches[:5]


def test_schema_uri_detection():
    assert detect_dialect(
        {"$schema": "http://json-schema.org/draft-04/schema#"}).name == "4"
    assert detect_dialect(
        {"$schema": "http://json-schema.org/draft-07/schema#"}).name == "7"
    assert detect_dialect(
        {"$schema": "https://json-schema.org/draft/2019-09/schema"}
    ).name == "2019-09"
    assert detect_dialect(
        {"$schema": "https://json-schema.org/draft/2020-12/schema"}
    ).name == "2020-12"
    # unknown metaschema / absent $schema → permissive superset
    assert detect_dialect({"$schema": "https://example.com/meta"}).name \
        == "permissive"
    assert detect_dialect({"type": "integer"}).name == "permissive"
    # explicit option wins over $schema
    assert detect_dialect(
        {"$schema": "http://json-schema.org/draft-07/schema#"},
        explicit="4").name == "4"


def test_unknown_dialect_rejected():
    with pytest.raises(ValueError, match="unknown dialect"):
        Dialect("5")


def test_draft4_typed_integer(spark):
    """Draft-4 dialect implies 1.0 ∉ integer on the TYPED path (the
    variant path's JSON parser normalizes the lexical form away —
    documented deviation)."""
    from jsonschema_rs_spark import compile_schema
    df = spark.createDataFrame([(1, 1.0), (2, 1.5)], "id long, x double")
    plan = compile_schema({"type": "object",
                           "properties": {"x": {"type": "integer"}}},
                          df.schema, ValidationOptions(dialect="4"))
    got = {r["id"]: r["valid"] for r in plan.with_validation(df).collect()}
    assert got == {1: False, 2: False}
    plan12 = compile_schema({"type": "object",
                             "properties": {"x": {"type": "integer"}}},
                            df.schema)
    got12 = {r["id"]: r["valid"]
             for r in plan12.with_validation(df).collect()}
    assert got12 == {1: True, 2: False}


def test_unevaluated_coverage_is_dialect_gated(spark):
    """A keyword the active draft ignores must annotate NOTHING for
    unevaluated* coverage (dialect fuzz find, r5): under 2019-09,
    prefixItems and $dynamicRef are unknown keywords — they used to be
    correctly dropped as assertions but still marked positions evaluated
    in the coverage walk, making the engine more permissive than
    python-jsonschema's Draft201909Validator."""
    import json

    from jsonschema_rs_spark import compile_json_schema
    d19 = "https://json-schema.org/draft/2019-09/schema"

    def check(schema, docs):
        plan = compile_json_schema(schema)
        df = spark.createDataFrame([(json.dumps(d),) for d in docs],
                                   "j string")
        return [r["valid"] for r in
                plan.with_validation(df, "j", mode="flag").collect()]

    # prefixItems ignored under 2019-09: no assertion AND no coverage
    s = {"$schema": d19, "allOf": [{"prefixItems": [True]}],
         "unevaluatedItems": False}
    assert check(s, [[1]]) == [False]
    # ... but still full coverage under 2020-12
    s12 = dict(s, **{"$schema":
                     "https://json-schema.org/draft/2020-12/schema"})
    assert check(s12, [[1]]) == [True]

    # $dynamicRef ignored under 2019-09: the referenced subtree's items
    # annotation must not leak into coverage
    s = {"$schema": d19,
         "$defs": {"d": {"$dynamicAnchor": "a",
                         "items": {"type": "string"}}},
         "allOf": [{"$dynamicRef": "#a"}], "unevaluatedItems": False}
    assert check(s, [[1], ["x"]]) == [False, False]

    # same interplay for object keys: properties behind a 2019-09
    # $dynamicRef must not exempt keys from unevaluatedProperties
    s = {"$schema": d19,
         "$defs": {"d": {"$dynamicAnchor": "a",
                         "properties": {"x": True}}},
         "allOf": [{"$dynamicRef": "#a"}], "unevaluatedProperties": False}
    assert check(s, [{"x": 1}, {}]) == [False, True]
