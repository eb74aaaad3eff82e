"""Vendored draft-2020-12 suite vectors (SURVEY.md §5: the official
JSON-Schema-Test-Suite submodule is absent from the reference snapshot,
so a curated corpus in the SAME shape — [{description, schema, tests:
[{data, valid}]}] — is vendored here).

Triple check per case:
1. the vendored `valid` expectation is itself validated against the
   Python `jsonschema` oracle (so a wrong vector fails loudly),
2. the variant (dynamic JSON) path reproduces every verdict,
3. all (schema, doc) pairs run as ONE Spark job per schema (no
   per-example actions).
"""

import json
import os

import pytest

from jsonschema_rs_spark.compiler.variant import compile_json_schema

VECTORS = json.load(open(os.path.join(os.path.dirname(__file__),
                                      "vectors_2020_12.json")))


@pytest.mark.parametrize(
    "case", VECTORS, ids=[v["description"][:48] for v in VECTORS])
def test_vector(spark, case):
    import jsonschema

    schema, tests = case["schema"], case["tests"]
    oracle = jsonschema.Draft202012Validator(schema)
    for t in tests:
        assert oracle.is_valid(t["data"]) == t["valid"], \
            f"vendored expectation wrong: {t}"

    docs = [json.dumps(t["data"]) for t in tests]
    df = spark.createDataFrame([(d,) for d in docs], "j string")
    plan = compile_json_schema(schema)
    got = [r["valid"] for r in
           plan.with_validation(df, "j", mode="flag").collect()]
    want = [t["valid"] for t in tests]
    bad = [(docs[i], got[i], want[i])
           for i in range(len(tests)) if got[i] != want[i]]
    assert not bad, bad
