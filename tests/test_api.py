"""Module-level API parity tests — mirrors jsonschema-py usage
(crates/jsonschema-py/tests-py/test_jsonschema.py patterns over
lib.rs:1189-1905): is_valid / validate / iter_errors / evaluate /
validator_for / Draft*Validator / meta."""

import pytest

import jsonschema_rs_spark as jrs

SCHEMA = {"type": "object", "required": ["name"],
          "properties": {"name": {"type": "string", "minLength": 2},
                         "age": {"type": "integer", "minimum": 0}}}


def test_is_valid(spark):
    assert jrs.is_valid(SCHEMA, {"name": "Ada", "age": 3}) is True
    assert jrs.is_valid(SCHEMA, {"name": "X"}) is False
    assert jrs.is_valid({"minimum": 5}, 7) is True
    assert jrs.is_valid({"minimum": 5}, 3) is False


def test_validate_raises_first_error(spark):
    jrs.validate(SCHEMA, {"name": "Ada"})  # no raise
    with pytest.raises(jrs.ValidationError) as ei:
        jrs.validate(SCHEMA, {"age": -1})
    err = ei.value
    assert err.instance_path in ("", "/age")
    assert err.keyword in ("required", "minimum")


def test_iter_errors_yields_all(spark):
    errs = list(jrs.iter_errors(SCHEMA, {"name": "X", "age": -2}))
    assert {e.keyword for e in errs} == {"minLength", "minimum"}
    assert {e.instance_path for e in errs} == {"/name", "/age"}
    assert all(isinstance(e, jrs.ValidationError) for e in errs)
    assert list(jrs.iter_errors(SCHEMA, {"name": "Ada"})) == []


def test_evaluate_flag_list_hierarchical(spark):
    assert jrs.evaluate(SCHEMA, {"name": "Ada"}) == {"valid": True}
    lst = jrs.evaluate(SCHEMA, {"name": "X"}, output_format="list")
    assert lst["valid"] is False
    assert any(u["evaluationPath"] == "/properties/name/minLength"
               for u in lst["details"])
    hier = jrs.evaluate(SCHEMA, {"name": "Ada"},
                        output_format="hierarchical")
    assert hier["valid"] is True and "details" in hier


def test_validator_for_compiles_dataset_validator(spark):
    v = jrs.validator_for(SCHEMA)
    df = spark.createDataFrame([('{"name": "Ada"}',), ('{"age": 1}',)],
                               "doc string")
    got = [r["valid"] for r in
           v.with_validation(df, "doc").select("valid").collect()]
    assert got == [True, False]


def test_draft_validators_change_semantics(spark):
    # draft-7 asserts format by default; 2020-12 does not
    schema = {"format": "ipv4"}
    assert jrs.Draft7Validator(schema) is not None
    assert jrs.is_valid(schema, "999.0.0.1", draft=7) is False
    assert jrs.is_valid(schema, "999.0.0.1", draft=202012) is True
    # draft-4: exclusiveMaximum is a boolean modifier
    d4 = {"maximum": 10, "exclusiveMaximum": True}
    assert jrs.is_valid(d4, 10, draft=4) is False
    with pytest.raises(jrs.SchemaError):
        jrs.is_valid(SCHEMA, {}, draft=5)


def test_registry_resources_kwarg(spark):
    schema = {"$ref": "https://example.com/item"}
    registry = {"https://example.com/item": {"type": "integer"}}
    assert jrs.is_valid(schema, 3, registry=registry) is True
    assert jrs.is_valid(schema, "s", registry=registry) is False


def test_mask_kwarg(spark):
    errs = list(jrs.iter_errors({"type": "integer"}, "secret-value",
                                mask="[REDACTED]"))
    assert errs and all("secret-value" not in e.message for e in errs)
    assert any("[REDACTED]" in e.message for e in errs)


def test_meta_namespace():
    assert jrs.meta.is_valid({"type": "string"}) is True
    assert jrs.meta.is_valid({"type": "nope"}) is False
    jrs.meta.validate({"type": "string"})
    with pytest.raises(jrs.SchemaError):
        jrs.meta.validate({"type": "nope"})


def test_ignore_unknown_formats(spark):
    # reference format.rs:1355-1365: unknown format + assertion on +
    # ignore off -> compile error with the pinned message
    schema = {"format": "custom", "type": "string"}
    assert jrs.is_valid(schema, "x", validate_formats=True) is True
    with pytest.raises(jrs.SchemaError, match="Unknown format: 'custom'"):
        jrs.validator_for(schema, validate_formats=True,
                          ignore_unknown_formats=False)
    # a registered custom format checker makes the name known
    v = jrs.validator_for(schema, validate_formats=True,
                          ignore_unknown_formats=False,
                          formats={"custom": lambda s: s.startswith("c")})
    df = spark.createDataFrame([('"cat"',), ('"dog"',)], "doc string")
    from pyspark.sql import functions as F
    got = [r[0] for r in
           df.select(v.valid_column(F.col("doc"))).collect()]
    assert got == [True, False]


def test_registry_class_with_retriever():
    from jsonschema_rs_spark import Registry, is_valid

    reg = Registry({"https://e.com/t.json": {"type": "integer"}},
                   retriever=lambda uri: {"minimum": 5})
    assert is_valid({"$ref": "https://e.com/t.json"}, 7, registry=reg)
    # URI outside the bundle falls through to the registry's retriever
    assert is_valid({"$ref": "https://e.com/other.json"}, 7, registry=reg)
    assert not is_valid({"$ref": "https://e.com/other.json"}, 3,
                        registry=reg)
    # plain dicts still work as registry=
    assert is_valid({"$ref": "https://e.com/t.json"}, 7,
                    registry={"https://e.com/t.json": {"type": "integer"}})


def test_evaluation_class_views():
    from jsonschema_rs_spark import Evaluation

    ev = Evaluation({"type": "object", "required": ["a"],
                     "properties": {"a": {"type": "integer"}}},
                    {"a": "nope"})
    assert ev.valid is False
    assert ev.flag() == {"valid": False}
    lst = ev.list()
    assert lst["valid"] is False and lst["details"]
    assert ev.errors(), "failing evaluation must expose error units"
    h = ev.hierarchical()
    assert h["valid"] is False

    ok = Evaluation({"properties": {"a": {"type": "integer"}}}, {"a": 1})
    assert ok.valid is True
    assert ok.annotations(), "properties must annotate evaluated names"


def test_validation_error_kind(spark):
    """ValidationError.kind — typed kinds with schema-derived payloads
    (jsonschema-py __init__.pyi:215-334)."""
    from jsonschema_rs_spark import ValidationErrorKind, api

    schema = {"type": "object",
              "properties": {"a": {"maximum": 5}, "b": {"enum": [1, 2]},
                             "c": {"type": "string"},
                             "d": {"multipleOf": 2.5},
                             "e": {"pattern": "^x"},
                             "f": {"const": "k"},
                             "g": {"minLength": 3}},
              "required": ["z"]}
    inst = {"a": 9, "b": 3, "c": 1, "d": 3, "e": "y", "f": "q", "g": "ab"}
    kinds = {e.keyword: e.kind for e in api.iter_errors(schema, inst)}

    assert isinstance(kinds["maximum"], ValidationErrorKind.Maximum)
    assert kinds["maximum"].limit == 5 and kinds["maximum"].value == 5
    assert kinds["enum"].options == [1, 2]
    assert kinds["type"].types == ["string"]
    assert kinds["multipleOf"].multiple_of == 2.5
    assert kinds["pattern"].pattern == "^x"
    assert kinds["const"].expected_value == "k"
    assert kinds["minLength"].limit == 3
    assert kinds["required"].property == "z"
    assert kinds["required"].name == "required"
    assert kinds["maximum"].as_dict() == {"limit": 5}

    # unknown/custom keywords degrade to Custom, never raise
    errs = list(api.iter_errors({"not": {"const": 1}}, 1))
    assert isinstance(errs[0].kind,
                      (ValidationErrorKind.Not, ValidationErrorKind.Custom))


def test_validation_error_instance_field(spark):
    """ValidationError.instance — the failing sub-instance resolved
    from instance_path (jsonschema-py __init__.pyi:327-334)."""
    from jsonschema_rs_spark import api
    errs = {e.keyword: e for e in api.iter_errors(
        {"properties": {"a": {"maximum": 5},
                        "arr": {"items": {"type": "string"}}}},
        {"a": 9, "arr": ["ok", 7]})}
    assert errs["maximum"].instance == 9
    # the engine reports items failures at the ARRAY level (documented
    # error-cardinality shape), so the sub-instance is the array
    assert errs["items"].instance == ["ok", 7]
    assert errs["maximum"].verbose_message == errs["maximum"].message
