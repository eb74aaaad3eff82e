"""Offline extended fuzz sweeps — the out-of-band companion to the
committed seed ranges in tests/test_fuzz_differential.py (variant
random-schema, seeds 9000+i) and tests/test_fuzz_typed.py (typed
random-schema, seeds 31000+i). The committed tests pin small fast
ranges; this script runs arbitrary ranges in one SparkSession so
hundreds of seeds cost minutes, and prints every mismatching seed with
the schema and the first differing instances. Bad seeds found here get
minimized and folded into the committed tests (see ROUND_NOTES).

Usage:
  python scripts/fuzz_sweep.py variant 40 240      # seeds 9000+40..9000+239
  python scripts/fuzz_sweep.py typed 25 200        # seeds 31000+25..
"""

from __future__ import annotations

import json
import random
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def sweep_variant(start: int, end: int) -> int:
    from test_fuzz_differential import (gen_schema, gen_value,
                                        oracle_validator)

    from jsonschema_rs_spark.compiler.variant import compile_json_schema
    from jsonschema_rs_spark.session import get_spark

    spark = get_spark()
    bad = 0
    corners = [1, 1.0, True, [1, 1.0], [1, True], {"a": 1}, [], {}, "",
               2 ** 53 + 1, 5e-324, -5e-324, [5e-324, 0], 10 ** 25,
               -1.0, 1e-16]
    for seed in range(start, end):
        rng = random.Random(9000 + seed)
        schema = gen_schema(rng)
        values = [gen_value(rng) for _ in range(150)] + corners
        docs = [json.dumps(v) for v in values]
        try:
            oracle = oracle_validator(schema)
            want = [oracle.is_valid(v) for v in values]
            df = spark.createDataFrame([(d,) for d in docs], "j string")
            plan = compile_json_schema(schema)
            got = [r["valid"] for r in
                   plan.with_validation(df, "j", mode="flag").collect()]
        except Exception as exc:  # noqa: BLE001 — report and continue
            print(f"SEED {seed} ERROR {type(exc).__name__}: {exc}\n"
                  f"  schema={json.dumps(schema)}", flush=True)
            bad += 1
            continue
        mism = [(docs[i], got[i], want[i])
                for i in range(len(values)) if got[i] != want[i]]
        if mism:
            bad += 1
            print(f"SEED {seed} {len(mism)} MISMATCHES\n"
                  f"  schema={json.dumps(schema)}\n"
                  f"  first: {mism[:3]}", flush=True)
        if seed % 25 == 0:
            print(f"... seed {seed} done ({bad} bad so far)", flush=True)
    return bad


def sweep_typed(start: int, end: int) -> int:
    from test_fuzz_typed import N_DOCS, gen_doc_schema

    from jsonschema_rs_spark import compile_schema
    from jsonschema_rs_spark.datagen import documents_df
    from jsonschema_rs_spark.oracle import clean, oracle_verdicts
    from jsonschema_rs_spark.session import get_spark

    spark = get_spark()
    df = documents_df(spark, N_DOCS, violation_pct=30).drop("_vclass") \
        .select("doc_id", "spans").orderBy("doc_id").cache()
    instances = [clean(r) for r in df.collect()]
    bad = 0
    for seed in range(start, end):
        rng = random.Random(31000 + seed)
        schema = gen_doc_schema(rng)
        try:
            plan = compile_schema(schema, df.schema)
            got = [r["valid"] for r in
                   plan.with_validation(df).orderBy("doc_id").collect()]
            want = oracle_verdicts(instances, schema)
        except Exception as exc:  # noqa: BLE001
            print(f"SEED {seed} ERROR {type(exc).__name__}: {exc}\n"
                  f"  schema={json.dumps(schema)}", flush=True)
            bad += 1
            continue
        mism = [(instances[i]["doc_id"], got[i], want[i])
                for i in range(len(got)) if got[i] != want[i]]
        if mism:
            bad += 1
            print(f"SEED {seed} {len(mism)} MISMATCHES\n"
                  f"  schema={json.dumps(schema)}\n"
                  f"  first: {mism[:5]}", flush=True)
        if seed % 25 == 0:
            print(f"... seed {seed} done ({bad} bad so far)", flush=True)
    return bad




def sweep_recursive(start: int, end: int) -> int:
    """Extended range of tests/test_fuzz_differential.py::
    test_fuzz_recursive_depth_modes — random self-recursive schemas,
    instances beyond a small unroll; 'exact' mode must equal
    python-jsonschema everywhere, 'annotate' may only diverge on rows
    it flags."""
    from test_fuzz_differential import (build_recursive_doc,
                                        gen_recursive_schema,
                                        oracle_validator)

    from jsonschema_rs_spark.compiler.variant import compile_json_schema
    from jsonschema_rs_spark.errors import ValidationOptions
    from jsonschema_rs_spark.session import get_spark

    spark = get_spark()
    bad = 0
    for seed in range(start, end):
        rng = random.Random(31000 + seed)
        edge, schema = gen_recursive_schema(rng)
        docs_py = [build_recursive_doc(rng, edge, rng.randint(0, 8))
                   for _ in range(60)]
        docs = [json.dumps(d) for d in docs_py]
        try:
            oracle = oracle_validator(schema)
            want = [oracle.is_valid(d) for d in docs_py]
            df = spark.createDataFrame([(d,) for d in docs], "j string")
            unroll = rng.randint(1, 3)
            plan_x = compile_json_schema(schema, ValidationOptions(
                max_ref_depth=unroll, on_depth_exhausted="exact"))
            got = [r["valid"] for r in
                   plan_x.with_validation(df, "j").collect()]
            plan_a = compile_json_schema(schema, ValidationOptions(
                max_ref_depth=unroll, on_depth_exhausted="annotate"))
            rows = plan_a.with_validation(df, "j").collect()
        except Exception as exc:  # noqa: BLE001
            print(f"SEED {seed} ERROR {type(exc).__name__}: {exc}\n"
                  f"  schema={json.dumps(schema)}", flush=True)
            bad += 1
            continue
        mism = [(docs[i], got[i], want[i]) for i in range(len(docs))
                if got[i] != want[i]]
        unsound = [(docs[i], rows[i]["valid"], want[i])
                   for i in range(len(docs))
                   if rows[i]["valid"] != want[i]
                   and not rows[i]["depth_exhausted"]]
        if mism or unsound:
            bad += 1
            print(f"SEED {seed} exact={len(mism)} "
                  f"annotate-unsound={len(unsound)}\n"
                  f"  schema={json.dumps(schema)}\n"
                  f"  first: {(mism or unsound)[:3]}", flush=True)
        if seed % 25 == 0:
            print(f"... seed {seed} done ({bad} bad so far)", flush=True)
    return bad


def sweep_dialect(start: int, end: int) -> int:
    """Random 2020-12-grammar schemas compiled under EVERY dialect vs
    the matching python Draft validators (multipleOf patched to the
    exact kernel, as in oracle_validator) — cross-checks per-draft
    keyword-set parity (a draft-4 oracle IGNORING prefixItems must
    agree with the dialect compiler dropping it)."""
    import math

    import jsonschema
    from test_fuzz_differential import gen_schema, gen_value

    from jsonschema_rs_spark.compiler.variant import compile_json_schema
    from jsonschema_rs_spark.errors import ValidationOptions
    from jsonschema_rs_spark.functions.numerics import (
        exact_multiple_of_fraction,
    )
    from jsonschema_rs_spark.session import get_spark

    def exact_multiple_of(validator, db, instance, schema_):
        if isinstance(instance, bool) or \
                not isinstance(instance, (int, float)):
            return
        dbf = float(db)
        if dbf.is_integer() and abs(dbf) < 2 ** 53 and dbf == int(dbf):
            if isinstance(instance, int):
                failed = instance % int(dbf) != 0
            elif not math.isfinite(instance):
                failed = True
            else:
                failed = math.fmod(instance, dbf) != 0.0
        else:
            failed = not exact_multiple_of_fraction(float(instance), db)
        if failed:
            yield jsonschema.exceptions.ValidationError(
                f"{instance} is not a multiple of {db}")

    classes = {"4": jsonschema.Draft4Validator,
               "6": jsonschema.Draft6Validator,
               "7": jsonschema.Draft7Validator,
               "2019-09": jsonschema.Draft201909Validator,
               "2020-12": jsonschema.Draft202012Validator}
    patched = {d: jsonschema.validators.extend(
        c, {"multipleOf": exact_multiple_of}) for d, c in classes.items()}

    spark = get_spark()
    bad = 0
    for seed in range(start, end):
        rng = random.Random(9000 + seed)
        schema = gen_schema(rng)
        values = [gen_value(rng) for _ in range(120)]
        values += [1, 1.0, -3.0, 100.0, 1.5, [1.0, 2], {"a": 2.0},
                   {"a": 5, "b": 4.0}, 2 ** 53 + 1]
        docs = [json.dumps(v) for v in values]
        df = spark.createDataFrame([(d,) for d in docs], "j string")
        for draft in classes:
            try:
                want = [patched[draft](schema).is_valid(v)
                        for v in values]
                plan = compile_json_schema(
                    schema, ValidationOptions(dialect=draft))
                got = [r["valid"] for r in plan.with_validation(
                    df, "j", mode="flag").collect()]
            except Exception as exc:  # noqa: BLE001
                print(f"SEED {seed} draft {draft} ERROR "
                      f"{type(exc).__name__}: {exc}\n"
                      f"  schema={json.dumps(schema)}", flush=True)
                bad += 1
                continue
            mism = [(docs[i], got[i], want[i])
                    for i in range(len(values)) if got[i] != want[i]]
            if mism:
                bad += 1
                print(f"SEED {seed} draft {draft} {len(mism)} MISMATCHES\n"
                      f"  schema={json.dumps(schema)}\n"
                      f"  first: {mism[:3]}", flush=True)
        if seed % 10 == 0:
            print(f"... seed {seed} done ({bad} bad so far)", flush=True)
    return bad


def main():
    path = sys.argv[1]
    start, end = int(sys.argv[2]), int(sys.argv[3])
    fn = {"variant": sweep_variant, "typed": sweep_typed,
          "dialect": sweep_dialect, "recursive": sweep_recursive}[path]
    bad = fn(start, end)
    print(f"{path} sweep [{start},{end}): {bad} bad seeds")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
