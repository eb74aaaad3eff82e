"""Fuzz-style differential testing of the dynamic-JSON validator.

Mirrors the reference's fuzz targets (fuzz/fuzz_targets/validation.rs):
seeded random JSON documents x a corpus of keyword-combination schemas,
every verdict compared against the Python `jsonschema` oracle in one
Spark job per schema (per-example Spark actions would be 1000x slower).
"""

import json
import random

import pytest

from jsonschema_rs_spark.compiler.variant import compile_json_schema


def gen_value(rng: random.Random, depth: int = 0):
    kinds = ["int", "float", "str", "bool", "null"]
    if depth < 3:
        kinds += ["arr", "obj", "arr", "obj"]
    k = rng.choice(kinds)
    if k == "int":
        return rng.choice([0, 1, -1, 5, 7, 10, 42, 100, -100,
                           2 ** 53, 2 ** 53 + 1, -(2 ** 53) - 1,
                           # 24-38 digit class: exact only via the
                           # decimal(38,0) view (r5 review find)
                           10 ** 30, 10 ** 30 + 1, -(10 ** 30)])
    if k == "float":
        return rng.choice([0.0, 1.0, 2.5, -1.5, 10.0, 3.14, 1e3,
                           1e100, -1e100, 0.1, 0.3, 1e-3, 2.5e300,
                           -0.0, 4.9e-324,
                           # integral floats at/beyond 2^53: exact-int
                           # ladder on both compilers (r5 review find)
                           1e16, 9007199254740994.0, 1e30])
    if k == "str":
        n = rng.randint(0, 12)
        return "".join(rng.choice("abcXYZ019 _-") for _ in range(n))
    if k == "bool":
        return rng.random() < 0.5
    if k == "null":
        return None
    if k == "arr":
        return [gen_value(rng, depth + 1) for _ in range(rng.randint(0, 4))]
    # r5: non-ASCII keys (accented BMP, CJK, Greek, and an astral
    # crab) so patternProperties/propertyNames interplays see the
    # code-point corners
    keys = ["a", "b", "c", "num1", "x-y", "Z", "",
            "é", "名前", "Ωx", "🦀x"]
    return {rng.choice(keys): gen_value(rng, depth + 1)
            for _ in range(rng.randint(0, 4))}


SCHEMAS = [
    {"type": "integer", "minimum": 0, "maximum": 50},
    {"type": ["string", "number"], "minLength": 2, "multipleOf": 2.5},
    {"enum": [1, 1.5, "abc", [1, 2], {"a": 1}, None, True]},
    {"const": {"a": [1, 2.0]}},
    {"type": "object", "required": ["a"],
     "properties": {"a": {"type": "integer", "exclusiveMinimum": 0},
                    "b": {"type": "array", "items": {"type": "string"}}},
     "additionalProperties": False},
    {"type": "object", "patternProperties": {"^num": {"type": "number"}},
     "propertyNames": {"maxLength": 4}, "minProperties": 1},
    {"type": "array", "prefixItems": [{"type": "integer"}],
     "items": {"type": "string", "pattern": "^[a-z]"},
     "minItems": 1, "maxItems": 3, "uniqueItems": True},
    {"type": "array", "contains": {"type": "integer", "minimum": 5},
     "minContains": 1, "maxContains": 2},
    {"anyOf": [{"type": "string", "minLength": 3},
               {"type": "integer", "multipleOf": 5}]},
    {"oneOf": [{"type": "number", "minimum": 0},
               {"type": "number", "maximum": 10}]},
    {"not": {"type": ["object", "array"]}},
    {"if": {"type": "object", "required": ["a"]},
     "then": {"properties": {"a": {"type": "integer"}}},
     "else": {"type": "array"}},
    {"properties": {"a": {}}, "unevaluatedProperties": {"type": "string"}},
    {"$defs": {"leaf": {"type": ["integer", "string"]}},
     "type": "object",
     "properties": {"v": {"$ref": "#/$defs/leaf"}},
     "dependentRequired": {"v": ["a"]},
     "additionalProperties": {"type": "integer"}},
    {"allOf": [{"minProperties": 1}, {"propertyNames": {"minLength": 1}}],
     "unevaluatedProperties": False,
     "properties": {"a": {"type": "integer"}}},
    # big-int (>2^53) exactness: const/enum/bounds must not collapse to
    # double equality (reference ext/numeric.rs:12-60)
    {"anyOf": [{"const": 2 ** 53 + 1},
               {"type": "integer", "minimum": 2 ** 53 + 1}]},
    {"enum": [2 ** 53, -(2 ** 53) - 1, "big"]},
    # interaction stress
    {"patternProperties": {"^a": {"type": "integer"}},
     "propertyNames": {"pattern": "^[a-zA-Z_-]*$"},
     "additionalProperties": {"type": ["boolean", "null"]}},
    {"contains": {"type": "object", "minProperties": 1},
     "unevaluatedItems": {"type": ["integer", "string"]},
     "prefixItems": [{"type": ["array", "object", "null"]}]},
    {"$defs": {"n": {"$anchor": "num", "type": "number",
                     "exclusiveMaximum": 100}},
     "items": {"anyOf": [{"$ref": "#num"}, {"type": "string"}]},
     "minItems": 1},
    {"if": {"type": "array"}, "then": {"contains": {"const": 1}},
     "else": {"if": {"type": "object"},
              "then": {"required": ["a"]},
              "else": {"type": ["string", "number", "boolean", "null"]}}},
    {"not": {"anyOf": [{"type": "object", "maxProperties": 1},
                       {"type": "array", "maxItems": 1}]}},
    {"dependentSchemas": {"a": {"properties": {"b": {"const": 1}}}},
     "unevaluatedProperties": {"type": ["integer", "boolean"]},
     "properties": {"a": True}},
]

N_DOCS = 300


def oracle_validator(schema):
    """python-jsonschema with multipleOf swapped for the EXACT check:
    the library's float-division test is approximate (says 2^53+1 IS a
    multiple of 2.5, and 0.3 is NOT a multiple of 0.1); the reference's
    fraction kernel and this engine decide by exact rational arithmetic
    over the operands' shortest-decimal forms (ext/numeric.rs:62-86),
    which is also what the official suite requires (0.0075 multipleOf
    0.0001 is valid). Integer divisors: exact int mod for int instances
    (BigInt branch, ext/numeric.rs:95-117), IEEE fmod (exact) for float
    instances."""
    import math

    import jsonschema

    from jsonschema_rs_spark.functions.numerics import (
        exact_multiple_of_fraction,
    )

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

    cls = jsonschema.validators.extend(
        jsonschema.Draft202012Validator,
        {"multipleOf": exact_multiple_of})
    return cls(schema)


@pytest.mark.parametrize("schema_idx", range(len(SCHEMAS)))
def test_fuzz_schema(spark, schema_idx):
    schema = SCHEMAS[schema_idx]
    rng = random.Random(1000 + schema_idx)
    values = [gen_value(rng) for _ in range(N_DOCS)]
    docs = [json.dumps(v) for v in values]

    oracle = oracle_validator(schema)
    want = [oracle.is_valid(v) for v in values]

    df = spark.createDataFrame([(d,) for d in docs], "j string")
    plan = compile_json_schema(schema)
    got = [r["valid"] for r in
           plan.with_validation(df, "j", mode="flag").collect()]

    mismatches = [(docs[i], got[i], want[i])
                  for i in range(N_DOCS) if got[i] != want[i]]
    assert not mismatches, f"{len(mismatches)} mismatches: {mismatches[:5]}"


# -- per-draft dialect fuzz (r4): the same random documents under
# ALL FIVE dialects, verdicts vs the matching python-jsonschema Draft
# validator. Exercises draft-4 lexical-integer (`_is_integer_strict`),
# draft-4 boolean exclusive* folding, and per-draft keyword
# applicability on arbitrary nested values. Schemas avoid keywords
# whose draft-4/6 semantics python-jsonschema models differently from
# the vendored pins (none known — but multipleOf uses integer divisors
# only, so the library's float-division check is exact here).

DIALECT_SCHEMAS = [
    {"type": "integer", "minimum": 0},
    {"type": ["integer", "string"], "maxLength": 4},
    {"properties": {"a": {"type": "integer"},
                    "b": {"type": "number", "multipleOf": 2}},
     "required": ["a"]},
    {"type": "array", "items": {"type": "integer"}, "minItems": 1},
    {"minimum": 5, "exclusiveMinimum": True},   # draft-4 boolean form
    {"anyOf": [{"type": "integer", "multipleOf": 5},
               {"type": "string", "minLength": 2}]},
    {"not": {"type": "integer"}},
]

_DRAFTS = ["4", "6", "7", "2019-09", "2020-12"]


@pytest.mark.parametrize("draft", _DRAFTS)
@pytest.mark.parametrize("schema_idx", range(len(DIALECT_SCHEMAS)))
def test_fuzz_dialect(spark, draft, schema_idx):
    import jsonschema

    from jsonschema_rs_spark.errors import ValidationOptions

    schema = DIALECT_SCHEMAS[schema_idx]
    if draft != "4" and "exclusiveMinimum" in schema \
            and isinstance(schema["exclusiveMinimum"], bool):
        pytest.skip("boolean exclusiveMinimum is draft-4 only")
    classes = {"4": jsonschema.Draft4Validator,
               "6": jsonschema.Draft6Validator,
               "7": jsonschema.Draft7Validator,
               "2019-09": jsonschema.Draft201909Validator,
               "2020-12": jsonschema.Draft202012Validator}
    rng = random.Random(7000 + schema_idx)
    values = [gen_value(rng) for _ in range(200)]
    # salt with the lexical-integer corners the generator rarely emits
    values += [1, 1.0, -3.0, 100.0, 1.5, [1.0, 2], {"a": 2.0},
               {"a": 5, "b": 4.0}, 2 ** 53 + 1]
    oracle = classes[draft](schema)
    want = [oracle.is_valid(v) for v in values]

    docs = [json.dumps(v) for v in values]
    df = spark.createDataFrame([(d,) for d in docs], "j string")
    plan = compile_json_schema(schema, ValidationOptions(dialect=draft))
    got = [r["valid"] for r in
           plan.with_validation(df, "j", mode="flag").collect()]
    mismatches = [(docs[i], got[i], want[i])
                  for i in range(len(values)) if got[i] != want[i]]
    assert not mismatches, f"{len(mismatches)} mismatches: {mismatches[:5]}"


# -- random-SCHEMA differential (r4 continuation): the document fuzz
# above randomizes INSTANCES over a fixed schema corpus; this grid also
# randomizes the SCHEMAS from a keyword grammar (seeded, so failures
# reproduce), verdicts vs the exactness-patched python-jsonschema
# oracle. Grammar sticks to 2020-12 keywords whose oracle semantics are
# unambiguous; multipleOf draws binary-exact divisors plus 2.5/0.5
# (the patched oracle decides those exactly too).

_GS_NAMES = ["a", "b", "c", "num1", "x-y", "Z", ""]
# r5: names/patterns over non-ASCII keys. No \w/\b (Java defaults them
# ASCII-only where Python is unicode-aware); explicit classes and
# code-point quantifiers translate identically through regex/ecma.py.
_GS_UNI_NAMES = ["é", "名前", "Ωx", "🦀x", "aé", "名"]
_GS_UNI_PATTERNS = ["^[a-zé名前Ω]+$", "^名", "é$", "^[^🦀]*$",
                    "^.{0,2}$"]
_GS_PATTERNS = ["^[a-z]+$", "^a", "[0-9]$", "^[a-zA-Z_ -]*$"]
_GS_TYPES = ["null", "boolean", "string", "number", "integer",
             "object", "array"]


def gen_schema(rng: random.Random, depth: int = 0) -> dict:
    """One random schema: 1-3 keyword groups merged into a dict.
    Applicator groups recurse (bounded depth); leaves are scalar
    assertions. Conflicting merges (e.g. const+enum) are legal
    schemas — just restrictive — so no de-conflict pass is needed."""
    leaf_groups = ["type", "types", "bounds", "length", "enum", "const",
                   "multiple", "pattern", "nprops", "nitems"]
    deep_groups = ["props", "addprops", "items", "prefix", "contains",
                   "allof", "anyof", "oneof", "not", "ite", "depreq",
                   "depschemas", "propnames", "unique",
                   # r4 grammar growth: the coverage-walk keywords
                   "unevalprops", "unevalitems",
                   # r5 grammar growth: the remaining untouched
                   # interplays (r4 VERDICT item 8)
                   "containsuneval", "dynref", "uniprops"]
    pool = leaf_groups if depth >= 2 else leaf_groups + deep_groups * 2
    if depth == 0:
        # $defs/$ref probes the depth-unroll + registry machinery; only
        # at the root because "#/$defs/d" is a root-based JSON pointer
        pool = pool + ["defsref"] * 2
    out: dict = {}
    sub = lambda: gen_schema(rng, depth + 1)  # noqa: E731
    for _ in range(rng.randint(1, 3 if depth == 0 else 2)):
        g = rng.choice(pool)
        if g == "type":
            out["type"] = rng.choice(_GS_TYPES)
        elif g == "types":
            out["type"] = rng.sample(_GS_TYPES, rng.randint(2, 3))
        elif g == "bounds":
            lo = rng.choice([-10, 0, 1, 5, 2 ** 53,
                             1e16, 10 ** 30])
            key = rng.choice(["minimum", "exclusiveMinimum"])
            out[key] = lo
            if rng.random() < 0.5:
                out[rng.choice(["maximum", "exclusiveMaximum"])] = \
                    lo + rng.choice([0, 10, 100])
        elif g == "length":
            out["minLength"] = rng.randint(0, 3)
            if rng.random() < 0.5:
                out["maxLength"] = out["minLength"] + rng.randint(0, 6)
        elif g == "enum":
            out["enum"] = [gen_value(rng, 2) for _ in range(
                rng.randint(1, 4))]
        elif g == "const":
            out["const"] = gen_value(rng, 2)
        elif g == "multiple":
            out["multipleOf"] = rng.choice([2, 3, 5, 2.5, 0.5])
        elif g == "pattern":
            out["pattern"] = rng.choice(_GS_PATTERNS)
        elif g == "nprops":
            out["minProperties"] = rng.randint(0, 2)
            if rng.random() < 0.5:
                out["maxProperties"] = out["minProperties"] + \
                    rng.randint(0, 3)
        elif g == "nitems":
            out["minItems"] = rng.randint(0, 2)
            if rng.random() < 0.5:
                out["maxItems"] = out["minItems"] + rng.randint(0, 3)
        elif g == "props":
            names = rng.sample(_GS_NAMES, rng.randint(1, 3))
            out["properties"] = {n: sub() for n in names}
            if rng.random() < 0.5:
                out["required"] = rng.sample(names,
                                             rng.randint(1, len(names)))
        elif g == "addprops":
            out["additionalProperties"] = \
                rng.choice([False, True, sub()])
        elif g == "items":
            out["items"] = sub()
        elif g == "prefix":
            out["prefixItems"] = [sub() for _ in range(rng.randint(1, 2))]
        elif g == "contains":
            out["contains"] = sub()
            if rng.random() < 0.5:
                out["minContains"] = rng.randint(0, 2)
            if rng.random() < 0.3:
                out["maxContains"] = rng.randint(1, 3)
        elif g in ("allof", "anyof", "oneof"):
            kw = {"allof": "allOf", "anyof": "anyOf",
                  "oneof": "oneOf"}[g]
            # extend, not assign — defsref/unevalprops may already have
            # planted an allOf branch this merge round
            out[kw] = out.get(kw, []) + \
                [sub() for _ in range(rng.randint(1, 3))]
        elif g == "not":
            out["not"] = sub()
        elif g == "ite":
            out["if"] = sub()
            if rng.random() < 0.8:
                out["then"] = sub()
            if rng.random() < 0.8:
                out["else"] = sub()
        elif g == "depreq":
            out["dependentRequired"] = {
                rng.choice(_GS_NAMES): rng.sample(_GS_NAMES, 2)}
        elif g == "depschemas":
            out["dependentSchemas"] = {rng.choice(_GS_NAMES): sub()}
        elif g == "propnames":
            out["propertyNames"] = rng.choice(
                [{"minLength": 1}, {"maxLength": 4},
                 {"pattern": rng.choice(_GS_PATTERNS)}])
        elif g == "unique":
            out["uniqueItems"] = True
        elif g == "defsref":
            # setdefault-merge: dynref may have planted $defs already
            out.setdefault("$defs", {})["d"] = sub()
            out["allOf"] = out.get("allOf", []) + [{"$ref": "#/$defs/d"}]
        elif g == "unevalprops":
            # evaluated names come from a SIBLING allOf branch, so the
            # in-place coverage walk (compiler/unevaluated.py) is what
            # decides which properties remain unevaluated
            names = rng.sample(_GS_NAMES, rng.randint(1, 2))
            out["allOf"] = out.get("allOf", []) + [
                {"properties": {n: True for n in names}}]
            out["unevaluatedProperties"] = rng.choice([False, sub()])
        elif g == "unevalitems":
            out["prefixItems"] = [sub()]
            out["unevaluatedItems"] = rng.choice([False, sub()])
        elif g == "containsuneval":
            # contains-MATCHED indexes are evaluated in 2020-12, so
            # unevaluatedItems must skip exactly the matched set (plus
            # any prefixItems) — the annotation-driven coverage walk,
            # conditioned on whether contains itself succeeded
            out["contains"] = sub()
            if rng.random() < 0.5:
                out["minContains"] = rng.randint(0, 2)
            if rng.random() < 0.5:
                out["prefixItems"] = [sub()]
            out["unevaluatedItems"] = rng.choice([False, sub()])
        elif g == "dynref":
            # single-resource $dynamicAnchor + $dynamicRef — the shape
            # python-jsonschema resolves correctly (no sibling-branch
            # rebinds, where the library leaks dynamic scope) — pulled
            # in through an allOf branch so unevaluated* has to see
            # evaluated names THROUGH the dynamic reference. The anchor
            # name is UNIQUE per site: the whole generated document is
            # one resource (no $id), and 2020-12 core §8.2.2 forbids
            # defining an anchor name twice in a resource — the first
            # sweep's same-name nests were ill-formed schemas whose
            # resolution is undefined (7/1100 seeds diverged there,
            # engine outermost-first vs the library's last-registered)
            name = f"it{rng.randint(0, 10 ** 6)}"
            out.setdefault("$defs", {})[f"dyn_{name}"] = \
                dict({"$dynamicAnchor": name}, **sub())
            out["allOf"] = out.get("allOf", []) + \
                [{"$dynamicRef": f"#{name}"}]
            if rng.random() < 0.5:
                out["unevaluatedProperties"] = rng.choice([False, sub()])
        elif g == "uniprops":
            # patternProperties x propertyNames under non-ASCII keys:
            # code-point quantifiers, astral class members, CJK/Greek
            # literals — Java (rlike) and Python (oracle) must agree
            out["patternProperties"] = {
                rng.choice(_GS_UNI_PATTERNS): sub()}
            out["propertyNames"] = rng.choice(
                [{"pattern": rng.choice(_GS_UNI_PATTERNS)},
                 {"minLength": 1}, {"maxLength": 3}])
            if rng.random() < 0.4:
                out["properties"] = {rng.choice(_GS_UNI_NAMES): sub()}
    return out


@pytest.mark.parametrize("seed", range(60))
def test_fuzz_random_schema(spark, seed):
    rng = random.Random(9000 + seed)
    schema = gen_schema(rng)
    values = [gen_value(rng) for _ in range(150)]
    values += [1, 1.0, True, [1, 1.0], [1, True], {"a": 1}, [], {}, "",
               2 ** 53 + 1,
               # corners that found real bugs in the extended sweeps:
               # subnormals through the decimal view / pmod, BigInt
               # beyond the (38,15) range
               5e-324, -5e-324, [5e-324, 0], 10 ** 25, -1.0, 1e-16,
               # r5 exact-compare corners: 24-38-digit ints and the
               # double that equals 1e16
               10 ** 30, 10 ** 30 + 1, 9999999999999999, 1e16,
               [10 ** 30, 10 ** 30 + 1]]
    docs = [json.dumps(v) for v in values]
    oracle = oracle_validator(schema)
    want = [oracle.is_valid(v) for v in values]
    df = spark.createDataFrame([(d,) for d in docs], "j string")
    plan = compile_json_schema(schema)
    got = [r["valid"] for r in
           plan.with_validation(df, "j", mode="flag").collect()]
    mismatches = [(docs[i], got[i], want[i])
                  for i in range(len(values)) if got[i] != want[i]]
    assert not mismatches, \
        f"schema={json.dumps(schema)} {len(mismatches)} " \
        f"mismatches: {mismatches[:5]}"


def gen_recursive_schema(rng: random.Random):
    """Random SELF-RECURSIVE schema: a node with random leaf assertions
    on 'v' plus a recursion edge back to #/$defs/node through a random
    applicator shape (direct property / items / anyOf branch / if-then
    / additionalProperties). Exercises the depth-unroll, the
    navigation-only exhaustion probe, and — in 'exact' mode — the
    gate completeness that decides which rows reach the runtime-
    recursive kernel."""
    leaf = gen_schema(rng, 2)
    ref = {"$ref": "#/$defs/node"}
    edge = rng.choice(["next", "kids", "anyof", "ite", "addprops"])
    node: dict = {"type": "object", "required": ["v"],
                  "properties": {"v": leaf}}
    if edge == "next":
        node["properties"]["next"] = ref
    elif edge == "kids":
        node["properties"]["kids"] = {"type": "array", "items": ref}
    elif edge == "anyof":
        node["properties"]["next"] = {"anyOf": [{"type": "integer"},
                                                ref]}
    elif edge == "ite":
        node["properties"]["next"] = {"if": {"type": "object"},
                                      "then": ref}
    else:
        node["additionalProperties"] = ref
    return edge, {"$defs": {"node": node}, "$ref": "#/$defs/node"}


def build_recursive_doc(rng: random.Random, edge: str, depth: int):
    vpool = [0, 1, 5, -3, "x", "abcd", 2.5, True, None, [], {}, [1, 2]]

    def one_node():
        d = {"v": rng.choice(vpool)}
        if rng.random() < 0.12:
            del d["v"]  # deep 'required' violations
        return d

    doc = one_node()
    for _ in range(depth):
        child = doc
        doc = one_node()
        if edge in ("next", "ite"):
            doc["next"] = child
        elif edge == "anyof":
            doc["next"] = child if rng.random() < 0.85 \
                else rng.choice([3, "s"])
        elif edge == "kids":
            kids = [child]
            if rng.random() < 0.3:
                kids.append(one_node())
            doc["kids"] = kids
        else:
            doc["n"] = child  # any non-'v' key routes through addprops
    return doc


@pytest.mark.parametrize("seed", range(25))
def test_fuzz_recursive_depth_modes(spark, seed):
    """Differential over random recursive schemas with instances far
    beyond a deliberately small unroll:
    - on_depth_exhausted='exact' must equal python-jsonschema on EVERY
      document (if the exhaustion gate ever misses a deep row, the
      plan's vacuous-true leaks through and this catches it);
    - 'annotate' may only diverge from the oracle on rows it flags
      (soundness of the depth_exhausted signal)."""
    from jsonschema_rs_spark.errors import ValidationOptions

    rng = random.Random(31000 + seed)
    edge, schema = gen_recursive_schema(rng)
    docs_py = [build_recursive_doc(rng, edge, rng.randint(0, 8))
               for _ in range(60)]
    docs = [json.dumps(d) for d in docs_py]
    oracle = oracle_validator(schema)
    want = [oracle.is_valid(d) for d in docs_py]
    df = spark.createDataFrame([(d,) for d in docs], "j string")
    unroll = rng.randint(1, 3)

    plan_exact = compile_json_schema(schema, ValidationOptions(
        max_ref_depth=unroll, on_depth_exhausted="exact"))
    got = [r["valid"] for r in
           plan_exact.with_validation(df, "j").collect()]
    mm = [(docs[i], got[i], want[i]) for i in range(len(docs))
          if got[i] != want[i]]
    assert not mm, f"exact mode, schema={json.dumps(schema)} " \
                   f"unroll={unroll}: {mm[:5]}"

    plan_ann = compile_json_schema(schema, ValidationOptions(
        max_ref_depth=unroll, on_depth_exhausted="annotate"))
    rows = plan_ann.with_validation(df, "j").collect()
    unsound = [(docs[i], rows[i]["valid"], want[i])
               for i in range(len(docs))
               if rows[i]["valid"] != want[i]
               and not rows[i]["depth_exhausted"]]
    assert not unsound, f"annotate mode unflagged divergence, " \
                        f"schema={json.dumps(schema)}: {unsound[:5]}"


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_output_vs_flag_consistency(spark, seed):
    """Self-consistency of the Output v1 compiler against the boolean
    compiler on random schemas: the list format's top-level `valid`
    must equal with_validation's verdict for every document. This fuzz
    found two real crashes in its first run: a bare element_at on
    prefixItems over a shorter array (ANSI INVALID_ARRAY_INDEX) and
    pUDF-backed keywords compiled into the output tree's HOF lambdas
    (items + multipleOf 2.5)."""
    from pyspark.sql import functions as F

    rng = random.Random(17000 + seed)
    schema = gen_schema(rng)
    values = [gen_value(rng) for _ in range(40)] + [1, 1.0, {}, [], "",
                                                    None]
    docs = [json.dumps(v) for v in values]
    df = spark.createDataFrame([(d,) for d in docs], "j string")
    plan = compile_json_schema(schema)
    flag = plan.with_validation(df, "j", mode="flag").select("j", "valid")
    out = plan.with_output(df, "j", format="list").select(
        "j", F.get_json_object("output", "$.valid").alias("ov"))
    rows = flag.join(out, "j").collect()
    mm = [(r["j"], r["valid"], r["ov"]) for r in rows
          if str(bool(r["valid"])).lower() != r["ov"]]
    assert not mm, f"schema={json.dumps(schema)} {mm[:5]}"


def test_output_empty_array_prefix_items(spark):
    """Regression: Output v1 on prefixItems with a SHORTER/empty array
    crashed at runtime under ANSI mode (bare element_at)."""
    from pyspark.sql import functions as F

    schema = {"prefixItems": [{"type": "integer"}, {"type": "string"}]}
    plan = compile_json_schema(schema)
    df = spark.createDataFrame(
        [("[]",), ("[1]",), ('[1, "a"]',), ('["x"]',), ("5",)],
        "j string")
    out = plan.with_output(df, "j", format="list").select(
        F.get_json_object("output", "$.valid").alias("ov")).collect()
    assert [r["ov"] for r in out] == ["true", "true", "true", "false",
                                      "true"]


def test_output_pudf_keyword_inside_array(spark):
    """Regression: items+multipleOf 2.5 (and contains/unevaluated*)
    compiled a pandas UDF into the output tree's transform lambdas."""
    from pyspark.sql import functions as F

    for schema in ({"items": {"multipleOf": 2.5}},
                   {"contains": {"multipleOf": 2.5}},
                   {"properties": {"a": True},
                    "unevaluatedProperties": {"multipleOf": 2.5}}):
        plan = compile_json_schema(schema)
        df = spark.createDataFrame(
            [("[5.0]",), ("[4.0]",), ('{"a": 1, "b": 7.5}',)], "j string")
        flag = [r["valid"] for r in
                plan.with_validation(df, "j", mode="flag").collect()]
        out = [r["ov"] for r in plan.with_output(df, "j", format="list")
               .select(F.get_json_object("output", "$.valid")
                       .alias("ov")).collect()]
        assert [str(bool(b)).lower() for b in flag] == out, schema
