"""Randomized TYPED-path differential fuzz: random JSON-Schema specs over
the interleaved documents table's typed shape (doc_id string, spans
array<struct<kind,text,media_ref,offset>>), compiled through the
typed-column compiler (compiler/keywords.py) and compared row-by-row
against python-jsonschema Draft 2020-12 on the cleaned instances.

The variant compiler already has a random-SCHEMA fuzz
(test_fuzz_differential.test_fuzz_random_schema); this is the same
discipline for the typed path, which the fixed DOC_SPEC differential
(test_documents_oracle) exercises with only one schema shape.
"""

import json
import random

import pytest

from jsonschema_rs_spark import compile_schema
from jsonschema_rs_spark.datagen import documents_df
from jsonschema_rs_spark.oracle import clean, oracle_verdicts

N_DOCS = 400

KINDS = ["text", "image", "audio", "video"]


def gen_doc_schema(rng: random.Random) -> dict:
    span_props: dict = {}
    if rng.random() < 0.7:
        span_props["kind"] = rng.choice([
            {"enum": rng.sample(KINDS, rng.randint(1, 3))},
            {"type": "string", "minLength": rng.randint(1, 5)},
            {"const": rng.choice(KINDS)},
            {"type": "string", "pattern": rng.choice(
                ["^te", "a", "(image|audio)", "o$"])},
        ])
    if rng.random() < 0.6:
        span_props["text"] = rng.choice([
            {"type": "string", "maxLength": rng.randint(0, 60)},
            {"type": "string", "pattern": rng.choice(
                ["^[a-z]", "ipsum", "[0-9]$", "\\."])},
            {"minLength": rng.randint(0, 10)},
        ])
    if rng.random() < 0.6:
        span_props["offset"] = rng.choice([
            {"type": "integer", "minimum": rng.randint(0, 100)},
            {"multipleOf": rng.choice([1, 2, 3, 5, 2.5])},
            {"maximum": rng.randint(0, 5000)},
            {"exclusiveMaximum": rng.randint(1, 3000)},
            {"not": {"const": rng.randint(0, 50)}},
        ])
    if rng.random() < 0.4:
        span_props["media_ref"] = rng.choice([
            {"type": "string", "pattern": "^asset-"},
            {"minLength": rng.randint(0, 14)},
            {"anyOf": [{"pattern": "0"}, {"maxLength": rng.randint(5, 13)}]},
        ])
    item: dict = {"type": "object", "properties": span_props}
    if rng.random() < 0.4:
        item["required"] = rng.sample(
            ["kind", "offset", "text", "media_ref"], rng.randint(1, 2))
    if rng.random() < 0.3:
        item["if"] = {"properties": {"kind": {"const": "text"}},
                      "required": ["kind"]}
        item["then"] = {"required": ["text"]}
        if rng.random() < 0.5:
            item["else"] = {"required": ["media_ref"]}
    if rng.random() < 0.2:
        item["minProperties"] = rng.randint(0, 3)
    spans: dict = {"type": "array", "items": item}
    if rng.random() < 0.5:
        spans["minItems"] = rng.randint(0, 4)
    if rng.random() < 0.5:
        spans["maxItems"] = rng.randint(2, 32)
    if rng.random() < 0.3:
        spans["uniqueItems"] = True
    if rng.random() < 0.3:
        spans["contains"] = {
            "properties": {"kind": {"const": rng.choice(KINDS)}},
            "required": ["kind"]}
        if rng.random() < 0.5:
            spans["minContains"] = rng.randint(1, 3)
        if rng.random() < 0.3:
            spans["maxContains"] = rng.randint(3, 10)
    if rng.random() < 0.2:
        spans["prefixItems"] = [
            {"properties": {"kind": {"enum": rng.sample(
                KINDS, rng.randint(2, 4))}}}]
    schema: dict = {
        "type": "object",
        "properties": {
            "doc_id": rng.choice([
                {"type": "string", "pattern": "^doc-[0-9]{12}$"},
                {"type": "string", "minLength": rng.randint(0, 16)},
                {"pattern": rng.choice(["0$", "^doc", "42"])},
            ]),
            "spans": spans,
        },
    }
    if rng.random() < 0.5:
        schema["required"] = ["doc_id", "spans"]
    if rng.random() < 0.25:
        schema["anyOf"] = [
            {"properties": {"spans": {"minItems": rng.randint(1, 3)}}},
            {"properties": {"doc_id": {"pattern": "[02468]$"}}},
        ]
    if rng.random() < 0.2:
        schema["not"] = {"properties": {
            "spans": {"maxItems": rng.randint(0, 1)}}}
    return schema


@pytest.fixture(scope="module")
def doc_rows(spark):
    # violation_pct high so structural edge cases (0 spans, missing text,
    # bad offsets, dup spans) appear often enough to matter per-seed
    df = documents_df(spark, N_DOCS, violation_pct=30).drop("_vclass") \
        .select("doc_id", "spans").orderBy("doc_id")
    return df.cache(), [clean(r) for r in df.collect()]


@pytest.mark.parametrize("seed", range(25))
def test_fuzz_typed_schema(spark, doc_rows, seed):
    rng = random.Random(31000 + seed)
    schema = gen_doc_schema(rng)
    df, instances = doc_rows
    plan = compile_schema(schema, df.schema)
    got = [r["valid"] for r in
           plan.with_validation(df).orderBy("doc_id").collect()]
    want = oracle_verdicts(instances, schema)
    mism = [(instances[i]["doc_id"], got[i], want[i])
            for i in range(len(got)) if got[i] != want[i]]
    assert not mism, (
        f"schema={json.dumps(schema)} {len(mism)} mismatches, "
        f"first 5: {mism[:5]}")
