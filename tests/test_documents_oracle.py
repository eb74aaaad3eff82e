"""Differential test: engine verdicts vs the Python `jsonschema` oracle on
the deterministic interleaved documents table (FIXTURES.md §1).

Both implementations pass the official JSON-Schema test-suite semantics
(the oracle literally, the reference by its own suite runs — SURVEY.md §5),
so per-row agreement here reproduces the reference's verdicts.
"""

import pyspark.sql.functions as F
import pytest

from jsonschema_rs_spark import compile_schema
from jsonschema_rs_spark.datagen import documents_df
from jsonschema_rs_spark.docspec import (DOC_SPEC_FULL, DOC_SPEC_JSON,
                                         default_options)
from jsonschema_rs_spark.oracle import clean, oracle_verdicts

N = 1500


@pytest.fixture(scope="module")
def docs(spark):
    return documents_df(spark, N).cache()


def test_verdicts_match_oracle(spark, docs):
    data = docs.drop("_vclass")
    plan = compile_schema(DOC_SPEC_JSON, data.schema)
    got = plan.with_validation(data).select("doc_id", "spans", "valid") \
        .orderBy("doc_id").collect()
    instances = [clean(r) for r in got]
    for inst in instances:
        inst.pop("valid")
    expected = oracle_verdicts(instances, DOC_SPEC_JSON)
    mism = [(g.doc_id, g.valid, e) for g, e in zip(got, expected)
            if g.valid != e]
    assert not mism, f"{len(mism)} verdict mismatches, first 5: {mism[:5]}"


def test_violation_classes_detected(spark, docs):
    data = docs.drop("_vclass")
    plan = compile_schema(DOC_SPEC_FULL, data.schema, default_options())
    v = plan.with_validation(data, "verbose")
    j = v.alias("v").join(docs.select("doc_id", "_vclass")
                          .dropDuplicates(["doc_id"]).alias("g"), "doc_id")
    rows = j.select("_vclass", "valid", "errors").collect()
    expected_kw = {
        0: "required", 1: "enum", 2: "enum", 3: "pattern", 4: "minLength",
        5: "x-strictlyIncreasing", 6: "uniqueItems", 7: "minItems",
    }
    for r in rows:
        kws = {e.keyword for e in r.errors}
        if r._vclass in expected_kw:
            assert not r.valid
            assert expected_kw[r._vclass] in kws, (r._vclass, kws)
        elif r._vclass in (8, 9):
            # schema-clean: these are table-level (referential / uniqueness)
            assert r.valid, (r._vclass, kws)


def test_x_strictly_increasing_matches_python(spark, docs):
    rows = docs.select("doc_id", "spans").orderBy("doc_id").collect()
    plan = compile_schema(
        {"properties": {"spans": {"x-strictlyIncreasing": "offset"}}},
        docs.drop("_vclass").schema, default_options())
    got = plan.with_validation(docs.drop("_vclass")).orderBy("doc_id") \
        .select("valid").collect()
    for r, g in zip(rows, got):
        offs = [s.offset for s in (r.spans or [])]
        expect = all(b > a for a, b in zip(offs, offs[1:]))
        assert g.valid == expect, r.doc_id


def test_generator_deterministic_across_parallelism(spark):
    a = documents_df(spark, 500, partitions=2).orderBy("doc_id").collect()
    b = documents_df(spark, 500, partitions=16).orderBy("doc_id").collect()
    assert a == b
