"""$vocabulary support: meta-schema-declared vocabulary sets gate keyword
applicability in 2019-09+ dialects.

Mirrors the reference's Vocabulary/VocabularySet
(jsonschema-referencing/src/vocabularies.rs:12-143), the registry's
find_vocabularies custom-meta-schema lookup (registry.rs:526-553), the
per-keyword has_vocabulary gates (keywords/mod.rs:254-510), and its
custom-meta-schema tests (lib.rs:3155-3196 simple_schema_with_unknown_draft,
lib.rs:3341 custom_meta_schema_with_fragment_finds_vocabularies).
"""

import pytest

from jsonschema_rs_spark.compiler.dialects import (
    Dialect, detect_dialect, resolve_vocabularies)
from jsonschema_rs_spark.compiler.variant import compile_json_schema
from jsonschema_rs_spark.errors import ValidationOptions

META_URI = "http://custom.example.com/schema"
V2020 = "https://json-schema.org/draft/2020-12/vocab"
V2019 = "https://json-schema.org/draft/2019-09/vocab"


def _meta(vocabs, base="https://json-schema.org/draft/2020-12/schema"):
    return {"$schema": base, "$id": META_URI,
            "$vocabulary": {u: True for u in vocabs}}


def _opts(meta, **kw):
    return ValidationOptions(resources={META_URI: meta}, **kw)


def _valid(spark, schema, opts, instances):
    import json as _json
    from pyspark.sql import functions as F
    plan = compile_json_schema(schema, opts)
    df = spark.createDataFrame(
        [(i, _json.dumps(inst)) for i, inst in enumerate(instances)],
        "i int, doc string")
    rows = df.select("i", plan.valid_column(F.col("doc")).alias("v")) \
        .orderBy("i").collect()
    return [r["v"] for r in rows]


def test_detect_follows_custom_metaschema_chain():
    meta = _meta([f"{V2020}/core", f"{V2020}/validation"])
    d = detect_dialect({"$schema": META_URI, "type": "string"},
                       resources={META_URI: meta})
    assert d.name == "2020-12"
    assert d.vocabularies == frozenset(["core", "validation"])
    # applicator keywords are now annotations; validation keywords apply
    assert "properties" in d.dropped and "allOf" in d.dropped
    assert "type" not in d.dropped and "minimum" not in d.dropped


def test_unregistered_metaschema_stays_permissive():
    d = detect_dialect({"$schema": META_URI})
    assert d.name == "permissive" and d.vocabularies is None


def test_standard_metaschema_gets_default_vocabularies():
    d = detect_dialect(
        {"$schema": "https://json-schema.org/draft/2020-12/schema"})
    assert d.name == "2020-12" and d.vocabularies is None
    assert "properties" not in d.dropped


def test_self_referential_metaschema_is_unknown_draft_bucket():
    # a meta-schema whose $schema is itself (like the real 2020-12 meta):
    # reference Draft::Unknown ≈ 2020-12 defaults + its own $vocabulary
    # (registry.rs:550-553)
    meta = {"$schema": META_URI, "$id": META_URI,
            "$vocabulary": {f"{V2020}/core": True,
                            f"{V2020}/applicator": True}}
    d = detect_dialect({"$schema": META_URI},
                       resources={META_URI: meta})
    assert d.name == "2020-12"
    assert d.vocabularies == frozenset(["core", "applicator"])
    assert "minimum" in d.dropped and "properties" not in d.dropped


def test_core_cannot_be_disabled():
    # $vocabulary omitting core still keeps $ref & friends working
    # (compiler.rs:662-667: Core is always on)
    meta = _meta([f"{V2020}/validation"])
    vocab = resolve_vocabularies({"$schema": META_URI},
                                 {META_URI: meta})
    assert "core" in vocab


def test_vocabularies_ignored_below_2019():
    d = Dialect("7").bind_vocabularies(frozenset(["core"]))
    assert d.vocabularies is None
    assert "properties" not in d.dropped


def test_custom_vocabulary_uri_kept_verbatim():
    meta = _meta([f"{V2020}/core", "https://example.com/vocab/mine"])
    vocab = resolve_vocabularies({"$schema": META_URI},
                                 {META_URI: meta})
    assert "https://example.com/vocab/mine" in vocab


def test_2019_unevaluated_rides_applicator():
    # 2019-09: unevaluated* belong to applicator (keywords/mod.rs:466);
    # 2020-12: their own vocabulary (mod.rs:473)
    v = frozenset(["core", "applicator", "validation"])
    d19 = Dialect("2019-09").bind_vocabularies(v)
    assert "unevaluatedProperties" not in d19.dropped
    d20 = Dialect("2020-12").bind_vocabularies(v)
    assert "unevaluatedProperties" in d20.dropped


def test_reference_simple_schema_with_unknown_draft(spark):
    # lib.rs:3155-3196 verbatim scenario: custom meta-schema with
    # core+applicator+validation; type/properties keep asserting
    meta = _meta([f"{V2020}/core", f"{V2020}/applicator",
                  f"{V2020}/validation"])
    schema = {"$schema": META_URI, "type": "object",
              "properties": {"name": {"type": "string"}}}
    got = _valid(spark, schema, _opts(meta),
                 [{"name": "test"}, {"name": 123}, "not an object"])
    assert got == [True, False, False]


def test_validation_vocab_disabled_drops_type(spark):
    meta = _meta([f"{V2020}/core", f"{V2020}/applicator"])
    schema = {"$schema": META_URI, "type": "object",
              "properties": {"name": {"type": "string"}},
              "minProperties": 5}
    # applicator still asserts (properties/name/type... but the nested
    # `type` is ALSO validation-gated → annotation), validation gated off
    got = _valid(spark, schema, _opts(meta),
                 [{"name": 123}, "not an object", {"name": "ok"}])
    assert got == [True, True, True]


def test_unevaluated_vocab_disabled(spark):
    meta = _meta([f"{V2020}/core", f"{V2020}/applicator",
                  f"{V2020}/validation"])
    schema = {"$schema": META_URI,
              "properties": {"a": {"type": "integer"}},
              "unevaluatedProperties": False}
    got = _valid(spark, schema, _opts(meta),
                 [{"a": 1, "extra": "x"}, {"a": "s"}])
    assert got == [True, False]


def test_format_assertion_vocabulary_enables_formats(spark):
    # 2020-12 §7.2.1: format-assertion vocabulary in the meta-schema →
    # format asserts without validate_formats=True
    meta = _meta([f"{V2020}/core", f"{V2020}/validation",
                  f"{V2020}/format-assertion"])
    schema = {"$schema": META_URI, "format": "ipv4"}
    got = _valid(spark, schema, _opts(meta),
                 ["127.0.0.1", "999.0.0.1", 5])
    assert got == [True, False, True]
    # explicit validate_formats=False still wins
    got = _valid(spark, schema, _opts(meta, validate_formats=False),
                 ["999.0.0.1"])
    assert got == [True]


def test_format_vocab_absent_never_asserts(spark):
    meta = _meta([f"{V2020}/core", f"{V2020}/validation"])
    schema = {"$schema": META_URI, "format": "ipv4"}
    # even forcing validate_formats=True: the keyword is not in the
    # dialect at all (keywords/mod.rs:284-288 FormatAnnotation gate)
    got = _valid(spark, schema, _opts(meta, validate_formats=True),
                 ["999.0.0.1"])
    assert got == [True]


def test_2019_custom_metaschema_format_vocab(spark):
    meta = _meta([f"{V2019}/core", f"{V2019}/validation",
                  f"{V2019}/format"],
                 base="https://json-schema.org/draft/2019-09/schema")
    schema = {"$schema": META_URI, "format": "ipv4"}
    d = detect_dialect(schema, resources={META_URI: meta})
    assert d.name == "2019-09"
    assert "format" not in d.dropped
    got = _valid(spark, schema,
                 _opts(meta, validate_formats=True), ["999.0.0.1"])
    assert got == [False]


def test_draft_based_format_default(spark):
    # reference compiler.rs:271-276: drafts 4/6/7 validate formats by
    # default; 2019-09/2020-12 annotate by default
    schema = {"format": "ipv4"}
    bad = ["999.0.0.1"]
    assert _valid(spark, schema,
                  ValidationOptions(dialect="7"), bad) == [False]
    assert _valid(spark, schema,
                  ValidationOptions(dialect="4"), bad) == [False]
    assert _valid(spark, schema,
                  ValidationOptions(dialect="2020-12"), bad) == [True]
    assert _valid(spark, schema,
                  ValidationOptions(), bad) == [True]  # permissive
    # explicit override beats the draft default in both directions
    assert _valid(spark, schema,
                  ValidationOptions(dialect="7", validate_formats=False),
                  bad) == [True]
    assert _valid(spark, schema,
                  ValidationOptions(dialect="2020-12",
                                    validate_formats=True), bad) == [False]


def test_typed_path_vocabulary_gating(spark):
    # same gating on the TYPED-column compiler
    from jsonschema_rs_spark import compile_schema
    from pyspark.sql.types import (IntegerType, StructField, StructType)
    meta = _meta([f"{V2020}/core", f"{V2020}/applicator"])
    schema = {"$schema": META_URI,
              "properties": {"n": {"minimum": 100}},
              "required": ["n"]}
    st = StructType([StructField("n", IntegerType())])
    plan = compile_schema(schema, st, _opts(meta))
    df = spark.createDataFrame([(1,), (None,)], st)
    # minimum and required are validation-vocab → annotations here
    assert [r["valid"] for r in
            plan.with_validation(df).select("valid").collect()] \
        == [True, True]


def test_typed_path_draft7_format_default(spark):
    from jsonschema_rs_spark import compile_schema
    from pyspark.sql.types import StringType, StructField, StructType
    st = StructType([StructField("ip", StringType())])
    plan = compile_schema(
        {"properties": {"ip": {"format": "ipv4"}}}, st,
        ValidationOptions(dialect="7"))
    df = spark.createDataFrame([("999.0.0.1",), ("10.0.0.1",)], st)
    assert [r["valid"] for r in
            plan.with_validation(df).select("valid").collect()] \
        == [False, True]
