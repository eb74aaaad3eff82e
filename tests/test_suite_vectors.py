"""Vendored draft-2020-12 suite vectors (SURVEY.md §5: the official
JSON-Schema-Test-Suite submodule is absent from the reference snapshot,
so a curated corpus in the SAME shape — built + validated by
scripts/build_vectors.py — is vendored in the package).

Triple check per case:
1. the vendored `valid` expectation is re-validated against the Python
   `jsonschema` oracle (per-group draft class; groups the library can't
   oracle — formats, content assertions — carry oracle:false and are
   pinned by the driver VALUES oracle instead),
2. the variant (dynamic JSON) path reproduces every verdict,
3. all (schema, doc) pairs run as ONE Spark job per schema (no
   per-example actions).

The same corpus also backs the per-family DRIVER queries
(jsonschema_rs_spark/suite.py → suite_<family> in queries()).
"""

import json

import pytest

from jsonschema_rs_spark.compiler.variant import compile_json_schema
from jsonschema_rs_spark.errors import ValidationOptions
from jsonschema_rs_spark.suite import families, load_vectors

VECTORS = load_vectors()


def test_corpus_size():
    assert len(VECTORS) >= 100
    assert sum(len(v["tests"]) for v in VECTORS) >= 400
    assert len(families()) == 21  # r3 added draft4/6/7/2019 + vocabulary


@pytest.mark.parametrize(
    "case", VECTORS,
    ids=[f'{v["family"]}:{v["description"][:40]}' for v in VECTORS])
def test_vector(spark, case):
    import jsonschema

    schema, tests = case["schema"], case["tests"]
    if case.get("oracle") == "fraction":
        # reference-kernel multipleOf semantics python-jsonschema can't
        # mirror: re-derive expectations from the Fraction mirror
        from jsonschema_rs_spark.functions.numerics import (
            exact_multiple_of_fraction,
        )

        m = schema["multipleOf"]
        for t in tests:
            assert exact_multiple_of_fraction(float(t["data"]), m) == \
                t["valid"], f"vendored expectation wrong: {t}"
    elif case.get("oracle") is not False:
        classes = {"2020-12": jsonschema.Draft202012Validator,
                   "2019-09": jsonschema.Draft201909Validator,
                   "7": jsonschema.Draft7Validator,
                   "6": jsonschema.Draft6Validator,
                   "4": jsonschema.Draft4Validator}
        cls = classes[case.get("draft", "2020-12")]
        if case.get("format_checker"):
            # groups relying on the draft≤7 format-by-default rule:
            # python-jsonschema needs the checker passed explicitly
            oracle = cls(schema, format_checker=cls.FORMAT_CHECKER)
        else:
            oracle = cls(schema)
        for t in tests:
            assert oracle.is_valid(t["data"]) == t["valid"], \
                f"vendored expectation wrong: {t}"

    docs = [json.dumps(t["data"]) for t in tests]
    df = spark.createDataFrame([(d,) for d in docs], "j string")
    from jsonschema_rs_spark.suite import options_from_group
    plan = compile_json_schema(schema, options_from_group(case))
    got = [r["valid"] for r in
           plan.with_validation(df, "j", mode="flag").collect()]
    want = [t["valid"] for t in tests]
    bad = [(docs[i], got[i], want[i])
           for i in range(len(tests)) if got[i] != want[i]]
    assert not bad, bad
