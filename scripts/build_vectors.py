"""Build the vendored draft-2020-12 suite-vector corpus.

Writes jsonschema_rs_spark/spec/vectors_2020_12.json: a curated corpus in
the official JSON-Schema-Test-Suite shape ([{description, family, schema,
tests: [{data, valid}]}] — the suite submodule is absent from the
reference snapshot, so the corpus is authored here and VALIDATED inline
against python-jsonschema before writing; groups python-jsonschema can't
oracle (format checkers needing absent packages, content assertions,
known float-division approximations) carry "oracle": false and are
hand-verified + pinned by the engine's own driver oracle.

Per-group keys:
  family   — driver-query grouping (suite_<family> in queries())
  draft    — python oracle class ("2020-12" default, "2019-09", "7")
  options  — ValidationOptions kwargs for the engine (e.g. formats on)
  oracle   — false to skip the python-jsonschema sanity check

Usage: python scripts/build_vectors.py
"""

from __future__ import annotations

import json
import os
import sys

BIG = 2 ** 53 + 1

V = []


def g(family: str, description: str, schema, tests, **extra):
    V.append({"description": description, "family": family,
              "schema": schema,
              "tests": [{"data": d, "valid": v} for d, v in tests],
              **extra})


# ---------------------------------------------------------------------------
# type
# ---------------------------------------------------------------------------

g("type", "type integer accepts zero-fraction floats",
  {"type": "integer"},
  [(1, True), (1.0, True), (1.5, False), ("1", False), (True, False),
   (None, False), (-0.0, True), (1e10, True)])
g("type", "type list is a union",
  {"type": ["integer", "string"]},
  [(1, True), ("s", True), (1.5, False), (None, False), ([], False),
   ({}, False), (True, False)])
g("type", "type null",
  {"type": "null"},
  [(None, True), (0, False), (False, False), ("", False)])
g("type", "type boolean is not 0/1",
  {"type": "boolean"},
  [(True, True), (False, True), (0, False), (1, False), ("true", False)])
g("type", "type number",
  {"type": "number"},
  [(1, True), (1.5, True), ("1", False), (True, False), (None, False)])
g("type", "type object",
  {"type": "object"},
  [({}, True), ({"a": 1}, True), ([], False), (None, False),
   ("{}", False)])
g("type", "type array",
  {"type": "array"},
  [([], True), ([1, "a"], True), ({}, False), ("[]", False)])

# ---------------------------------------------------------------------------
# const
# ---------------------------------------------------------------------------

g("const", "const with numeric cross-type equality",
  {"const": 2},
  [(2, True), (2.0, True), (2.00001, False), ("2", False)])
g("const", "const null",
  {"const": None},
  [(None, True), (0, False), (False, False), ("", False)])
g("const", "const false is not 0",
  {"const": False},
  [(False, True), (0, False), (None, False), ("", False)])
g("const", "const empty string",
  {"const": ""},
  [("", True), (" ", False), (0, False), (None, False)])
g("const", "const array with numeric members",
  {"const": [1, 2.0]},
  [([1, 2], True), ([1.0, 2], True), ([2, 1], False), ([1], False),
   ([1, 2, 3], False), ({}, False), (1, False)])
g("const", "const nested object",
  {"const": {"a": [True], "b": "x"}},
  [({"a": [True], "b": "x"}, True), ({"b": "x", "a": [True]}, True),
   ({"a": [True]}, False), ({"a": [1], "b": "x"}, False),
   ({"a": [True], "b": "x", "c": 1}, False)])
g("const", "const big integer is exact beyond 2^53",
  {"const": BIG},
  [(BIG, True), (BIG - 1, False), (BIG + 1, False), (float(BIG), False)])
g("const", "const zero equals negative zero",
  {"const": 0},
  [(0, True), (-0.0, True), (0.0, True), (1, False)])

# ---------------------------------------------------------------------------
# enum
# ---------------------------------------------------------------------------

g("enum", "enum with heterogeneous members",
  {"enum": [6, "foo", [], True, {"foo": 12}]},
  [(6, True), (6.0, True), ("foo", True), ([], True), ({"foo": 12}, True),
   ({"foo": 12, "bar": 1}, False), ([6], False), (False, False)])
g("enum", "enum of scalars",
  {"enum": [None, True, 0]},
  [(None, True), (True, True), (0, True), (0.0, True), (False, False),
   ("0", False), (1, False)])
g("enum", "enum big integers exact",
  {"enum": [2 ** 53, BIG]},
  [(2 ** 53, True), (BIG, True), (2 ** 53 - 1, False), (BIG + 1, False)])
g("enum", "enum composites",
  {"enum": [[], {}, [1, "a"]]},
  [([], True), ({}, True), ([1, "a"], True), ([{}], False),
   ([1], False), ({"a": 1}, False)])

# ---------------------------------------------------------------------------
# numeric
# ---------------------------------------------------------------------------

g("numeric", "minimum excludes non-numbers",
  {"minimum": 1.1},
  [(1.1, True), (1.0, False), ("x", True), ([], True)])
g("numeric", "multipleOf with decimal divisor",
  {"multipleOf": 0.0001},
  [(0.0075, True), (0.00751, False)])
g("numeric", "exclusive bounds",
  {"exclusiveMinimum": 1, "exclusiveMaximum": 3},
  [(1, False), (2, True), (3, False), (2.999, True)])
g("numeric", "minimum at integer boundary",
  {"minimum": 3},
  [(3, True), (3.0, True), (2.9, False), (2, False), (4, True)])
g("numeric", "maximum with float limit",
  {"maximum": 3.0},
  [(3, True), (3.0001, False), (-10, True), (True, True)])
g("numeric", "multipleOf integer divisor",
  {"multipleOf": 2},
  [(4, True), (4.0, True), (5, False), (4.5, False), (0, True),
   (-6, True), ("x", True)])
g("numeric", "multipleOf 1.5",
  {"multipleOf": 1.5},
  [(0, True), (4.5, True), (35, False), (-3.0, True)])
g("numeric", "big-int minimum is exact beyond 2^53",
  {"minimum": BIG},
  [(BIG, True), (BIG - 1, False), (BIG + 2, True)])
g("numeric", "combined bounds window",
  {"minimum": 0, "maximum": 10, "multipleOf": 5},
  [(0, True), (5, True), (10, True), (15, False), (-5, False),
   (3, False)])

# ---------------------------------------------------------------------------
# string
# ---------------------------------------------------------------------------

g("string", "length counts characters",
  {"minLength": 2, "maxLength": 3},
  [("ab", True), ("a", False), ("abcd", False), (100, True)])
g("string", "pattern is unanchored search",
  {"pattern": "a+b"},
  [("xxaab", True), ("b", False), (5, True)])
g("string", "length counts code points not bytes",
  {"minLength": 2},
  [("éa", True), ("é", False), ("中文", True)])
g("string", "anchored pattern",
  {"pattern": "^ab$"},
  [("ab", True), ("xab", False), ("abx", False)])
g("string", "pattern with digit class",
  {"pattern": "^[0-9]{3}-[0-9]{2}$"},
  [("123-45", True), ("12-345", False), ("abc-de", False)])
g("string", "pattern with escaped dot",
  {"pattern": "^a\\.b$"},
  [("a.b", True), ("axb", False)])
g("string", "zero minLength accepts empty",
  {"minLength": 0, "maxLength": 0},
  [("", True), ("a", False)])

# ---------------------------------------------------------------------------
# object
# ---------------------------------------------------------------------------

g("object", "required and properties interplay",
  {"type": "object", "required": ["foo"],
   "properties": {"foo": {"type": "integer"}, "bar": {"type": "string"}}},
  [({"foo": 1}, True), ({"foo": 1, "bar": "b"}, True),
   ({"bar": "b"}, False), ({"foo": "no"}, False), ({"foo": None}, False),
   ([], False)])
g("object", "required sees present-but-null members",
  {"required": ["a"]},
  [({"a": None}, True), ({}, False), ({"b": 1}, False)])
g("object", "additionalProperties false with patternProperties",
  {"properties": {"foo": {}}, "patternProperties": {"^v": {}},
   "additionalProperties": False},
  [({"foo": 1}, True), ({"foo": 1, "vroom": 2}, True),
   ({"foo": 1, "bar": 2}, False)])
g("object", "additionalProperties schema form",
  {"properties": {"foo": {}}, "additionalProperties": {"type": "boolean"}},
  [({"foo": 1}, True), ({"foo": 1, "bar": True}, True),
   ({"foo": 1, "bar": 1}, False)])
g("object", "propertyNames",
  {"propertyNames": {"maxLength": 3}},
  [({"foo": {}, "bar": {}}, True), ({"foobar": {}}, False),
   ([1, 2], True)])
g("object", "min/maxProperties",
  {"minProperties": 1, "maxProperties": 2},
  [({}, False), ({"a": 1}, True), ({"a": 1, "b": 2, "c": 3}, False)])
g("object", "nested object/array recursion",
  {"type": "object",
   "properties": {"xs": {"type": "array",
                         "items": {"type": "object", "required": ["k"],
                                   "properties": {"k": {"enum": ["a", "b"]}}}}}},
  [({"xs": [{"k": "a"}, {"k": "b"}]}, True), ({"xs": [{"k": "c"}]}, False),
   ({"xs": [{}]}, False), ({"xs": []}, True)])
g("object", "multiple required keys",
  {"required": ["a", "b", "c"]},
  [({"a": 1, "b": 2, "c": 3}, True), ({"a": 1, "b": 2}, False),
   ({}, False), (5, True)])
g("object", "overlapping patternProperties all apply",
  {"patternProperties": {"^a": {"type": "integer"},
                         "a$": {"minimum": 10}}},
  [({"aba": 12}, True), ({"aba": 5}, False), ({"aba": "x"}, False),
   ({"ab": 1}, True), ({"ba": 20}, True), ({"ba": 1}, False)])
g("object", "propertyNames pattern",
  {"propertyNames": {"pattern": "^[a-z]+$"}},
  [({"abc": 1}, True), ({"Abc": 1}, False), ({"a1": 1}, False),
   ({}, True)])
g("object", "maxProperties zero forces empty object",
  {"maxProperties": 0},
  [({}, True), ({"a": 1}, False), ([1, 2, 3], True)])
g("object", "deep property chain",
  {"properties": {"a": {"properties": {"b": {"properties": {
      "c": {"type": "integer"}}, "required": ["c"]}}}},
  },
  [({"a": {"b": {"c": 1}}}, True), ({"a": {"b": {"c": "x"}}}, False),
   ({"a": {"b": 1}}, True), ({"a": {"b": {}}}, False), ({}, True)])

# ---------------------------------------------------------------------------
# dependent
# ---------------------------------------------------------------------------

g("dependent", "dependentRequired",
  {"dependentRequired": {"bar": ["foo"]}},
  [({"bar": 2, "foo": 1}, True), ({"bar": 2}, False), ({"foo": 1}, True),
   ({}, True)])
g("dependent", "dependentSchemas",
  {"dependentSchemas": {"bar": {"properties": {"foo": {"type": "integer"}},
                                "required": ["foo"]}}},
  [({"foo": 1, "bar": 2}, True), ({"bar": 2}, False),
   ({"foo": "s", "bar": 2}, False), ({"foo": "s"}, True)])
g("dependent", "draft-7 dependencies array form",
  {"dependencies": {"bar": ["foo"]}},
  [({"bar": 2, "foo": 1}, True), ({"bar": 2}, False), ({}, True),
   ([1], True)], draft="7")
g("dependent", "draft-7 dependencies schema form",
  {"dependencies": {"bar": {"required": ["foo"]}}},
  [({"bar": 2, "foo": 1}, True), ({"bar": 2}, False), ({"foo": 1}, True)],
  draft="7")
g("dependent", "dependentRequired multiple triggers",
  {"dependentRequired": {"a": ["b"], "b": ["c"]}},
  [({"a": 1, "b": 2, "c": 3}, True), ({"a": 1, "b": 2}, False),
   ({"b": 2, "c": 3}, True), ({"c": 3}, True)])

# ---------------------------------------------------------------------------
# array
# ---------------------------------------------------------------------------

g("array", "items applies to all elements",
  {"items": {"type": "integer"}},
  [([1, 2, 3], True), ([1, "x"], False), ([], True), ({"a": 1}, True)])
g("array", "prefixItems with items for the rest",
  {"prefixItems": [{"type": "integer"}, {"type": "string"}],
   "items": {"type": "boolean"}},
  [([1, "a", True, False], True), ([1, "a", 1], False), ([1], True),
   (["a"], False)])
g("array", "items false forbids beyond prefix",
  {"prefixItems": [{"type": "integer"}], "items": False},
  [([1], True), ([], True), ([1, 2], False), ("x", True)])
g("array", "items false alone forbids all items",
  {"items": False},
  [([], True), ([1], False)])
g("array", "prefixItems longer than instance",
  {"prefixItems": [{"type": "integer"}, {"type": "string"},
                   {"type": "boolean"}]},
  [([1], True), ([1, "a"], True), ([1, "a", True], True),
   (["a"], False), ([1, 2], False)])
g("array", "min/maxItems window",
  {"minItems": 1, "maxItems": 3},
  [([1], True), ([], False), ([1, 2, 3, 4], False), ([1, 2], True)])
g("array", "nested arrays",
  {"items": {"type": "array", "items": {"type": "integer"}}},
  [([[1], [2, 3]], True), ([[1], ["x"]], False), ([[]], True),
   ([1], False)])
g("array", "draft-7 array-form items with additionalItems",
  {"items": [{"type": "integer"}, {"type": "string"}],
   "additionalItems": {"type": "boolean"}},
  [([1, "a", True], True), ([1, "a", 1], False), ([1], True),
   (["a"], False)], draft="7")

# ---------------------------------------------------------------------------
# contains
# ---------------------------------------------------------------------------

g("contains", "contains with min/maxContains",
  {"contains": {"minimum": 5}, "minContains": 2, "maxContains": 3},
  [([5, 6], True), ([5], False), ([5, 6, 7, 8], False),
   ([1, 5, 1, 6], True)])
g("contains", "minContains zero makes contains vacuous",
  {"contains": {"minimum": 5}, "minContains": 0},
  [([], True), ([1], True)])
g("contains", "contains true needs a non-empty array",
  {"contains": True},
  [([1], True), ([], False), ([None], True), ({}, True)])
g("contains", "maxContains without minContains",
  {"contains": {"type": "string"}, "maxContains": 1},
  [(["a"], True), (["a", "b"], False), ([1, "a", 2], True),
   ([1, 2], False)])
g("contains", "contains on typed elements",
  {"contains": {"type": "object", "required": ["k"]}},
  [([{"k": 1}], True), ([{}, {"k": 1}], True), ([{}, 1], False),
   ([], False)])

# ---------------------------------------------------------------------------
# unique
# ---------------------------------------------------------------------------

g("unique", "uniqueItems with numeric cross-type equality",
  {"uniqueItems": True},
  [([1, 2], True), ([1, 1.0], False), ([[1], [1]], False),
   ([{"a": 1}, {"a": 1}], False), ([{"a": 1}, {"a": 2}], True),
   (["1", 1], True), ([True, 1], True), ([None, None], False)])
g("unique", "uniqueItems false allows duplicates",
  {"uniqueItems": False},
  [([1, 1], True), (["a", "a"], True)])
g("unique", "uniqueItems type classes never collide",
  {"uniqueItems": True},
  [([True, "true"], True), ([None, "null"], True), ([0, False], True),
   ([[1], "[1]"], True), ([[], {}], True), ([[1, 2], [1, 2]], False),
   (["a", "a"], False)])
g("unique", "uniqueItems big integers",
  {"uniqueItems": True},
  [([2 ** 53, BIG], True), ([BIG, BIG], False)])

# ---------------------------------------------------------------------------
# combinator
# ---------------------------------------------------------------------------

g("combinator", "allOf combines constraints",
  {"allOf": [{"minimum": 2}, {"maximum": 5}]},
  [(3, True), (1, False), (6, False)])
g("combinator", "anyOf short-circuit semantics",
  {"anyOf": [{"type": "string"}, {"minimum": 10}]},
  [("s", True), (12, True), (3, False), ([], True)])
g("combinator", "oneOf exactly one",
  {"oneOf": [{"type": "integer"}, {"minimum": 2}]},
  [(1, True), (2.5, True), (3, False), (1.5, False)])
g("combinator", "not",
  {"not": {"type": "integer"}},
  [("x", True), (1, False), (1.5, True)])
g("combinator", "if-then-else",
  {"if": {"exclusiveMaximum": 0}, "then": {"minimum": -10},
   "else": {"multipleOf": 2}},
  [(-1, True), (-100, False), (4, True), (3, False)])
g("combinator", "boolean schemas in applicators",
  {"properties": {"yes": True, "no": False}},
  [({"yes": 1}, True), ({"no": 1}, False), ({}, True)])
g("combinator", "allOf with object fragments",
  {"allOf": [{"properties": {"a": {"type": "integer"}}},
             {"required": ["a"]}]},
  [({"a": 1}, True), ({"a": "x"}, False), ({}, False)])
g("combinator", "oneOf none match",
  {"oneOf": [{"type": "string"}, {"type": "boolean"}]},
  [(1, False), ("s", True), (True, True), (None, False)])
g("combinator", "not true rejects everything",
  {"not": True},
  [(1, False), (None, False), ({}, False)])
g("combinator", "not false accepts everything",
  {"not": False},
  [(1, True), (None, True), ({}, True)])
g("combinator", "if without then/else is annotation-only",
  {"if": {"type": "integer"}},
  [(1, True), ("x", True)])
g("combinator", "then without if is ignored",
  {"then": {"minimum": 100}},
  [(1, True), (200, True)])
g("combinator", "nested conditionals in properties",
  {"properties": {"kind": {"enum": ["a", "b"]}},
   "if": {"properties": {"kind": {"const": "a"}}, "required": ["kind"]},
   "then": {"required": ["size"]},
   "else": {"required": ["name"]}},
  [({"kind": "a", "size": 1}, True), ({"kind": "a"}, False),
   ({"kind": "b", "name": "x"}, True), ({"kind": "b"}, False),
   ({"kind": "c", "name": "x"}, False)])

# ---------------------------------------------------------------------------
# unevaluated
# ---------------------------------------------------------------------------

g("unevaluated", "unevaluatedProperties with nested applicators",
  {"allOf": [{"properties": {"a": {}}}], "properties": {"b": {}},
   "unevaluatedProperties": False},
  [({"a": 1, "b": 2}, True), ({"a": 1, "c": 3}, False)])
g("unevaluated", "unevaluatedItems beyond contains matches",
  {"contains": {"type": "string"}, "unevaluatedItems": False},
  [(["a", "b"], True), (["a", 1], False), ([1], False)])
g("unevaluated", "anyOf branches only cover when valid",
  {"anyOf": [{"required": ["a"], "properties": {"a": {}}},
             {"required": ["b"], "properties": {"b": {}}}],
   "unevaluatedProperties": False},
  [({"a": 1}, True), ({"b": 1}, True), ({"a": 1, "b": 2}, True),
   ({"a": 1, "c": 2}, False)])
g("unevaluated", "unevaluatedItems with prefixItems",
  {"prefixItems": [{"type": "integer"}],
   "unevaluatedItems": {"type": "string"}},
  [([1, "a"], True), ([1, 2], False), ([1], True), ([], True)])
g("unevaluated", "unevaluatedProperties schema form",
  {"properties": {"a": {}}, "unevaluatedProperties": {"type": "integer"}},
  [({"a": "x", "b": 1}, True), ({"a": "x", "b": "y"}, False),
   ({"a": "x"}, True)])
g("unevaluated", "ref contributes coverage",
  {"$ref": "#/$defs/base", "unevaluatedProperties": False,
   "$defs": {"base": {"properties": {"a": {}}}}},
  [({"a": 1}, True), ({"b": 1}, False), ({}, True)])
g("unevaluated", "if-then coverage is branch-dependent",
  {"if": {"required": ["a"]},
   "then": {"properties": {"x": {}}},
   "else": {"properties": {"y": {}}},
   "properties": {"a": {}},
   "unevaluatedProperties": False},
  [({"a": 1, "x": 2}, True), ({"a": 1, "y": 2}, False),
   ({"y": 2}, True), ({"x": 2}, False)])

# ---------------------------------------------------------------------------
# ref
# ---------------------------------------------------------------------------

g("ref", "$ref to $defs",
  {"$defs": {"pos": {"minimum": 0}},
   "properties": {"n": {"$ref": "#/$defs/pos"}}},
  [({"n": 1}, True), ({"n": -1}, False)])
g("ref", "$anchor resolution",
  {"$defs": {"pi": {"$anchor": "positiveInt", "type": "integer",
                    "minimum": 1}},
   "properties": {"count": {"$ref": "#positiveInt"}}},
  [({"count": 3}, True), ({"count": 0}, False), ({"count": "x"}, False),
   ({}, True)])
g("ref", "$id embedded resource",
  {"$id": "https://example.com/main.json",
   "properties": {"addr": {"$ref": "address.json"}},
   "$defs": {"address": {"$id": "address.json", "type": "object",
                         "required": ["street"],
                         "properties": {"street": {"type": "string",
                                                   "minLength": 2}}}}},
  [({"addr": {"street": "elm"}}, True), ({"addr": {"street": "e"}}, False),
   ({"addr": {}}, False), ({"addr": 5}, False)])
g("ref", "$ref with sibling keywords both apply",
  {"$ref": "#/$defs/t", "minimum": 5, "$defs": {"t": {"type": "integer"}}},
  [(6, True), (4, False), (5.5, False), ("x", False)])
g("ref", "recursive list via $defs self-ref",
  {"$ref": "#/$defs/node",
   "$defs": {"node": {"type": "object", "required": ["v"],
                      "properties": {"v": {"type": "integer"},
                                     "next": {"$ref": "#/$defs/node"}}}}},
  [({"v": 1}, True), ({"v": 1, "next": {"v": 2}}, True),
   ({"v": 1, "next": {"v": "x"}}, False), ({"v": 1, "next": {}}, False)])
def _chain(depth, bad_at=None):
    doc = None
    for i in reversed(range(depth)):
        v = "oops" if bad_at == i else i
        doc = {"v": v, **({"next": doc} if doc is not None else {})}
    return doc


# NOTE: tests/test_round5_fixes.py carries its own copy of this chain
# fixture (CHAIN_SCHEMA/_chain, json-string-valued) — deliberate
# independence, but keep the node shape in sync when editing
_CHAIN_SCHEMA = {"$ref": "#/$defs/node",
                 "$defs": {"node": {
                     "type": "object", "required": ["v"],
                     "properties": {"v": {"type": "integer"},
                                    "next": {"$ref": "#/$defs/node"}}}}}

g("ref", "depth exhaustion: deep violations caught under fail mode",
  _CHAIN_SCHEMA,
  # unroll=3 checks nodes 1-3; node 4+ is beyond. fail mode rejects any
  # present beyond-unroll content, so deep violations (python-jsonschema
  # agrees: invalid) can no longer pass vacuously-true
  [(_chain(2), True), (_chain(3), True),
   (_chain(3, bad_at=2), False),
   (_chain(8, bad_at=7), False), (_chain(8, bad_at=3), False)],
  options={"max_ref_depth": 3, "on_depth_exhausted": "fail"})
g("ref", "depth exhaustion: fail mode conservatively rejects deep-valid",
  _CHAIN_SCHEMA,
  # python-jsonschema recurses to the real depth and calls this valid;
  # fail mode trades that for never silently accepting unchecked
  # content — a deliberate, documented divergence (hence oracle: false;
  # hand-verified and pinned by the engine's own driver oracle)
  [(_chain(8), False), (_chain(4), False), (_chain(3), True)],
  options={"max_ref_depth": 3, "on_depth_exhausted": "fail"},
  oracle=False)
g("ref", "depth exhaustion: exact mode matches runtime recursion",
  _CHAIN_SCHEMA,
  # exact mode re-validates beyond-unroll rows with the runtime-
  # recursive kernel, so deep violations are CAUGHT and deep-valid
  # chains stay VALID — full agreement with python-jsonschema (which
  # recurses to the real depth), unlike fail's conservative rejection
  [(_chain(2), True), (_chain(3), True), (_chain(3, bad_at=2), False),
   (_chain(8), True), (_chain(8, bad_at=7), False),
   (_chain(8, bad_at=3), False), (_chain(12), True),
   (_chain(12, bad_at=11), False)],
  options={"max_ref_depth": 3, "on_depth_exhausted": "exact"})

g("ref", "$dynamicRef recursive tree",
  {"$id": "https://example.com/tree", "$dynamicAnchor": "node",
   "type": "object", "required": ["data"],
   "properties": {"data": {"type": "integer"},
                  "children": {"type": "array",
                               "items": {"$dynamicRef": "#node"}}}},
  [({"data": 1}, True), ({"data": 1, "children": [{"data": 2}]}, True),
   ({"data": 1, "children": [{}]}, False), ({"children": []}, False)])
g("ref", "$recursiveRef 2019-09",
  {"$recursiveAnchor": True, "type": "object",
   "properties": {"name": {"type": "string"},
                  "child": {"$recursiveRef": "#"}}},
  [({"name": "a"}, True), ({"name": "a", "child": {"name": "b"}}, True),
   ({"name": "a", "child": {"name": 3}}, False)], draft="2019-09")

# ---------------------------------------------------------------------------
# format (engine options turn assertion on; python oracle via
# FormatChecker where its checker exists without extra packages)
# ---------------------------------------------------------------------------

FMT = {"options": {"validate_formats": True}, "oracle": False}

g("format", "format date",
  {"type": "string", "format": "date"},
  [("2024-02-29", True), ("2023-02-29", False), ("2024-13-01", False),
   ("24-01-01", False), ("2024-01-01", True)], **FMT)
g("format", "format date-time",
  {"type": "string", "format": "date-time"},
  [("2024-01-01T10:00:00Z", True), ("2024-01-01t10:00:00z", True),
   ("2024-01-01T10:00:00+05:30", True), ("2024-01-01 10:00:00Z", False),
   ("2024-01-01T25:00:00Z", False), ("not-a-date", False)], **FMT)
g("format", "format uuid",
  {"type": "string", "format": "uuid"},
  [("2eb8aa08-aa98-11ea-b4aa-73b441d16380", True),
   ("2eb8aa08-aa98-11ea-b4aa-73b441d1638", False),
   ("2eb8aa08aa9811eab4aa73b441d16380", False)], **FMT)
g("format", "format ipv4",
  {"type": "string", "format": "ipv4"},
  [("192.168.0.1", True), ("256.1.1.1", False), ("1.1.1", False),
   ("01.1.1.1", False)], **FMT)
g("format", "format email",
  {"type": "string", "format": "email"},
  [("a@b.com", True), ("not-an-email", False), ("a @b.com", False)],
  **FMT)
g("format", "format json-pointer",
  {"type": "string", "format": "json-pointer"},
  [("/a/b", True), ("", True), ("/a~1b", True), ("a/b", False),
   ("/a~2", False)], **FMT)
g("format", "format duration",
  {"type": "string", "format": "duration"},
  [("P1Y2M3DT4H5M6S", True), ("P4W", True), ("P", False), ("P1YT", False),
   ("1Y", False)], **FMT)
g("format", "format regex goes through the pandas UDF",
  {"type": "string", "format": "regex"},
  [("^a[bc]+$", True), ("a(b", False), ("", True)], **FMT)
g("format", "unknown format is annotation-only",
  {"type": "string", "format": "no-such-format"},
  [("anything", True)], **FMT)

# ---------------------------------------------------------------------------
# content (assertions like draft-7; python-jsonschema never asserts
# content*, so these pin engine behavior only)
# ---------------------------------------------------------------------------

g("content", "contentEncoding base64",
  {"contentEncoding": "base64"},
  [("aGVsbG8=", True), ("aGVsbG8", False), ("ab==", False), (5, True)],
  oracle=False)
g("content", "contentEncoding base64url",
  {"contentEncoding": "base64url"},
  [("a-_Q", True), ("a+/Q", False)], oracle=False)
g("content", "contentEncoding base32",
  {"contentEncoding": "base32"},
  [("MZXW6===", True), ("mzxw6===", False), ("MZXW6", False)],
  oracle=False)
g("content", "contentEncoding base16",
  {"contentEncoding": "base16"},
  [("48656C6C6F", True), ("48656c6c6f", True), ("489", False)],
  oracle=False)
g("content", "base64 + application/json",
  {"contentEncoding": "base64", "contentMediaType": "application/json"},
  [("eyJhIjogMX0=", True), ("bm90IGpzb24=", False)], oracle=False)

# ---------------------------------------------------------------------------
# depth round: interaction and edge cases per family
# ---------------------------------------------------------------------------

g("type", "huge zero-fraction float is an integer",
  {"type": "integer"},
  [(1e100, True), (1.23e4, True), (1.23e-4, False)])
g("const", "const unicode string",
  {"const": "héllo 中"},
  [("héllo 中", True), ("hello 中", False), ("héllo中", False)])
g("const", "const float with many places",
  {"const": 3.141592653589793},
  [(3.141592653589793, True), (3.14159265358979, False)])
g("enum", "enum distinguishes 0 / false / -0.0",
  {"enum": [0]},
  [(0, True), (-0.0, True), (False, False), (None, False)])
g("enum", "enum nested depth 2",
  {"enum": [[[1], [2]], {"a": {"b": 1}}]},
  [([[1], [2]], True), ({"a": {"b": 1}}, True), ([[1], [3]], False),
   ({"a": {"b": 2}}, False)])
g("numeric", "multipleOf with big-int instance and int divisor",
  {"multipleOf": 2},
  [(2 ** 53, True), (BIG, False), (BIG + 1, True)])
g("numeric", "exclusive float boundary",
  {"exclusiveMinimum": 2.5},
  [(2.5, False), (2.5000001, True), (2.49, False), ("x", True)])
g("numeric", "multipleOf large divisor",
  {"multipleOf": 1000000},
  [(3000000, True), (3000001, False), (0, True)])
g("string", "astral-plane char counts once",
  {"maxLength": 1},
  [("💩", True), ("💩a", False), ("", True)])
g("string", "pattern alternation and quantifiers",
  {"pattern": "^(ab|cd){2,3}$"},
  [("abab", True), ("abcdab", True), ("ab", False), ("ababababab", False)])
g("object", "properties with additionalProperties schema both apply",
  {"properties": {"a": {"type": "integer"}},
   "additionalProperties": {"type": "string"}},
  [({"a": 1, "b": "x"}, True), ({"a": "x"}, False), ({"b": 1}, False),
   ({}, True)])
g("object", "empty required accepts everything",
  {"required": []},
  [({}, True), ({"a": 1}, True), (5, True)])
g("object", "propertyNames with enum",
  {"propertyNames": {"enum": ["a", "b"]}},
  [({"a": 1, "b": 2}, True), ({"c": 1}, False), ({}, True)])
g("object", "patternProperties with additionalProperties schema",
  {"patternProperties": {"^n_": {"type": "integer"}},
   "additionalProperties": {"type": "boolean"}},
  [({"n_x": 1, "flag": True}, True), ({"n_x": "s"}, False),
   ({"flag": 1}, False)])
g("dependent", "dependentSchemas false forbids the trigger",
  {"dependentSchemas": {"debt": False}},
  [({"debt": 1}, False), ({"credit": 1}, True), ({}, True)])
g("dependent", "draft-7 dependencies mixed forms",
  {"dependencies": {"a": ["b"], "c": {"minProperties": 2}}},
  [({"a": 1, "b": 2}, True), ({"a": 1}, False), ({"c": 1}, False),
   ({"c": 1, "d": 2}, True)], draft="7")
g("array", "contains and items interact",
  {"items": {"type": "integer"}, "contains": {"minimum": 10}},
  [([1, 12], True), ([1, 2], False), ([12, "x"], False), ([], False)])
g("array", "minItems zero accepts empty",
  {"minItems": 0, "items": {"type": "string"}},
  [([], True), (["a"], True), ([1], False)])
g("contains", "contains objects with required",
  {"contains": {"type": "object", "required": ["k"],
                "properties": {"k": {"const": "hit"}}}},
  [([{"k": "hit"}], True), ([{"k": "miss"}], False),
   ([1, {"k": "hit"}, "x"], True), ([{}], False)])
g("contains", "nested contains (array of arrays)",
  {"contains": {"type": "array", "contains": {"const": 1}}},
  [([[2, 1]], True), ([[2], [3]], False), ([[1], [2]], True),
   ([1], False)])
g("unique", "uniqueItems nested arrays depth 2",
  {"uniqueItems": True},
  [([[[1]], [[2]]], True), ([[[1]], [[1]]], False)])
g("unique", "uniqueItems mixed int/float forms",
  {"uniqueItems": True},
  [([2, 2.0], False), ([2, 2.5], True), ([0.5, 0.5], False)])
g("unique", "uniqueItems case-sensitive strings",
  {"uniqueItems": True},
  [(["a", "A"], True), (["a", "a"], False)])
g("combinator", "anyOf of objects with required",
  {"anyOf": [{"required": ["a"]}, {"required": ["b"]}]},
  [({"a": 1}, True), ({"b": 1}, True), ({"c": 1}, False), (5, True)])
g("combinator", "oneOf overlapping ranges boundary",
  {"oneOf": [{"minimum": 0, "maximum": 10},
             {"minimum": 5, "maximum": 15}]},
  [(3, True), (12, True), (7, False), (20, False), ("x", False)])
g("combinator", "nested allOf(anyOf)",
  {"allOf": [{"anyOf": [{"type": "integer"}, {"type": "string"}]},
             {"anyOf": [{"type": "integer", "minimum": 5},
                        {"const": "ok"}]}]},
  [(7, True), (1, False), ("ok", True), ("abc", False), (None, False)])
g("combinator", "if/then chained via allOf",
  {"allOf": [
      {"if": {"required": ["a"]}, "then": {"required": ["b"]}},
      {"if": {"required": ["c"]}, "then": {"required": ["d"]}}]},
  [({"a": 1, "b": 2}, True), ({"a": 1}, False),
   ({"c": 1, "d": 2}, True), ({"a": 1, "b": 2, "c": 3}, False),
   ({}, True)])
g("unevaluated", "unevaluatedProperties true is annotation-like",
  {"properties": {"a": {}}, "unevaluatedProperties": True},
  [({"a": 1, "b": 2}, True), ({}, True)])
g("unevaluated", "prefixItems + contains + unevaluatedItems",
  {"prefixItems": [{"type": "integer"}],
   "contains": {"type": "string"},
   "unevaluatedItems": False},
  [([1, "a"], True), ([1, "a", 2], False), ([1], False),
   (["a", "b"], False)])  # prefix item 0 must be an integer
g("unevaluated", "oneOf branch coverage",
  {"oneOf": [{"required": ["a"], "properties": {"a": {}}},
             {"required": ["b"], "properties": {"b": {}}}],
   "unevaluatedProperties": False},
  [({"a": 1}, True), ({"b": 1}, True), ({"a": 1, "c": 2}, False)])
g("ref", "$ref chain a->b->c",
  {"$ref": "#/$defs/a",
   "$defs": {"a": {"$ref": "#/$defs/b"},
             "b": {"$ref": "#/$defs/c"},
             "c": {"type": "integer", "minimum": 3}}},
  [(5, True), (1, False), ("x", False)])
g("ref", "$ref inside prefixItems element",
  {"prefixItems": [{"$ref": "#/$defs/s"}],
   "$defs": {"s": {"type": "string", "minLength": 2}}},
  [(["ab", 9], True), (["a"], False), ([1], False), ([], True)])
g("ref", "same anchor name in two embedded resources",
  {"$id": "https://example.com/root",
   "properties": {
       "x": {"$ref": "one#item"},
       "y": {"$ref": "two#item"}},
   "$defs": {
       "r1": {"$id": "one",
              "$defs": {"i": {"$anchor": "item", "type": "integer"}}},
       "r2": {"$id": "two",
              "$defs": {"i": {"$anchor": "item", "type": "string"}}}}},
  [({"x": 1, "y": "s"}, True), ({"x": "s"}, False), ({"y": 1}, False)])
g("ref", "$defs nested in $defs",
  {"$ref": "#/$defs/outer/$defs/inner",
   "$defs": {"outer": {"$defs": {"inner": {"const": 42}}}}},
  [(42, True), (41, False)])
g("format", "format time",
  {"type": "string", "format": "time"},
  [("12:00:00Z", True), ("23:59:60Z", True), ("12:00:00+01:00", True),
   ("12:00:00", False), ("24:00:00Z", False)], **FMT)
g("format", "format time leap second offset-exact (r3)",
  {"type": "string", "format": "time"},
  [("23:59:60Z", True),            # UTC 23:59 — the only legal slot
   ("15:59:60-08:00", True),       # 15:59 + 8:00 = 23:59 UTC
   ("23:59:60+01:00", False),      # 22:59 UTC
   ("00:29:60+00:30", True),       # -1 min mod 1440 = 23:59 UTC
   ("23:29:60-00:30", True),       # 23:59 UTC
   ("12:00:60Z", False),
   ("23:59:60.5Z", True)], **FMT)
g("format", "format date-time leap second offset-exact (r3)",
  {"type": "string", "format": "date-time"},
  [("1998-12-31T23:59:60Z", True),
   ("1998-12-31T15:59:60-08:00", True),
   ("1998-12-31T23:59:60+01:00", False)], **FMT)
g("format", "format ipv6",
  {"type": "string", "format": "ipv6"},
  [("::1", True), ("1:2:3:4:5:6:7:8", True), ("12345::", False),
   ("1:2:3:4:5:6:7:8:9", False), ("fe80::1", True)], **FMT)
g("format", "format ipv6 exact grammar (r3)",
  {"type": "string", "format": "ipv6"},
  [("::", True), ("::ffff:192.168.0.1", True),
   ("1:2:3:4:5:6:1.2.3.4", True), ("1:2:3:4:5:6::8", True),
   ("1:2:3:4:5:6:7::8", False),      # 8 groups + :: over-run
   ("1::2::3", False), (":1:2:3", False),
   ("fe80::1%eth0", False),          # zone-id not part of the format
   ("::ffff:1.2.3.444", False), ("1.2.3.4", False)], **FMT)
g("format", "format uri",
  {"type": "string", "format": "uri"},
  [("https://example.com/a?b=c", True), ("mailto:x@y.z", True),
   ("not a uri", False), ("//missing.scheme", False)], **FMT)
g("format", "format uri exact RFC 3986 grammar (r3)",
  {"type": "string", "format": "uri"},
  [("ldap://[2001:db8::7]/c=GB?objectClass?one", True),
   ("urn:oasis:names:specification:docbook:dtd:xml:4.1.2", True),
   ("http://[fe80::1%25eth0]/", True),       # RFC 6874 zone-id
   ("http://[v1.fe80::a+en1]/", True),       # IPvFuture
   ("tel:+1-816-555-1212", True),
   ("http://example.com/?q=a%20b", True),
   ("1http://foo", False),                   # scheme starts with digit
   ("http://example.com/path%GGbad", False), # bad pct-encoding
   ("bar,baz:foo", False),                   # ',' not legal in scheme
   ("http://2001:db8::7/no-brackets", False)], **FMT)  # port not digits
g("format", "format uri-reference exact (r3)",
  {"type": "string", "format": "uri-reference"},
  [("//foo.bar/", True), ("/abc", True), ("abc", True), ("", True),
   ("#frag", True), ("?q=1", True),
   ("bar,baz:foo", False),       # ':' in first relative segment
   ("\\\\WINDOWS\\share", False)], **FMT)
g("format", "format iri exact RFC 3987 grammar (r3)",
  {"type": "string", "format": "iri"},
  [("http://ƒøø.ßår/?∂éœ=πîx", True), ("http://à.example.com/", True),
   ("https://example.com/plain", True),
   ("http://example.com/ space", False),
   ("//nöscheme.example", False)], **FMT)
g("format", "format iri-reference exact (r3)",
  {"type": "string", "format": "iri-reference"},
  [("//ƒøø.ßår/", True), ("/äbc", True), ("?∂=1", True),
   ("bär,baz:foo", False)], **FMT)
g("format", "format hostname",
  {"type": "string", "format": "hostname"},
  [("example.com", True), ("a-b.c-d.e", True), ("-bad.com", False),
   ("a..b", False)], **FMT)
g("format", "format relative-json-pointer",
  {"type": "string", "format": "relative-json-pointer"},
  [("0", True), ("1/foo", True), ("0#", True), ("-1", False),
   ("#/", False)], **FMT)
# round-4 reference-exact hostname (format.rs:548-646 is_valid_hostname):
# R-LDH rule, no trailing dot, punycode labels must decode
g("format", "format hostname reference-exact (r4)",
  {"type": "string", "format": "hostname"},
  [("ex--ample.com", False), ("example.com.", False),
   ("xn--kln-sna.de", True), ("xn--example.com", False),
   ("XN--aa---o47jg78q", False), ("localhost", True)], **FMT)
# round-4 RFC 5321 email (format.rs:510-545 over the email_address
# crate, default EmailOptions): quoted local parts, bracketed IP
# literals (must parse as an IP), dot-atom dot rules, hostname-checked
# domains
g("format", "format email rfc5321 (r4)",
  {"type": "string", "format": "email"},
  [("missing@domain", True), ("email@[127.0.0.1]", True),
   ("email@[IPv6:2001:db8::1]", True), ("email@[999.0.0.1]", False),
   ('"john doe"@example.com', True), ("a..b@example.com", False),
   (".a@example.com", False), ("user@example.com.", False),
   ("user@ex--ample.com", False), ("Name <u@example.com>", False),
   ("user@xn--kln-sna.de", True), ("user@xn--example.com", False)],
  **FMT)
g("format", "format idn-hostname uts46 (r4)",
  {"type": "string", "format": "idn-hostname"},
  [("köln.de", True), ("München.de", True), ("xn--kln-sna.de", True),
   ("example.com.", False), ("xn--example.com", False),
   ("exa mple.com", False)], **FMT)
g("format", "format email with required-TLD EmailOptions (r4)",
  {"type": "string", "format": "email"},
  [("simon@localhost", False), ("user@example.com", True)],
  options={"validate_formats": True,
           "email_options": {"require_tld": True}}, oracle=False)
g("format", "format email without domain literals (r4)",
  {"type": "string", "format": "email"},
  [("email@[127.0.0.1]", False), ("user@example.com", True)],
  options={"validate_formats": True,
           "email_options": {"allow_domain_literal": False}},
  oracle=False)
g("format", "format email with display text (r4)",
  {"type": "string", "format": "email"},
  [("Name <user@example.com>", True), ("Name <not-an-email>", False),
   ("user@example.com", True)],
  options={"validate_formats": True,
           "email_options": {"allow_display_text": True}}, oracle=False)
g("format", "format idn-email (r4)",
  {"type": "string", "format": "idn-email"},
  [("用户@example.com", True), ("user@münchen.de", True),
   ("user@exa mple.com", False), ("not-an-email", False),
   ("user@münchen..de", False)], **FMT)
# round-5 email micro-corners (COVERAGE §2.2 closed): the email_address
# crate (0.2.9) counts LENGTHS IN OCTETS — str::len is bytes, and
# LOCAL_PART_MAX_LENGTH = 64 is checked on the raw local slice, so the
# quotes and EACH octet of an escape pair count ("\a" is 2); there is NO
# separate total-address cap (display text is stripped before parsing
# and 64+1+DOMAIN_MAX_LENGTH(254) implies <= 319 for the addr-spec, the
# named-host path tighter still at is_valid_hostname's 253).
# python-jsonschema's email checker is shape-only, so these pin the
# engine's own crate-parity semantics (oracle: false)
_D253 = ".".join(["d" * 49] * 5) + ".com"          # exactly 253 octets
assert len(_D253) == 253
g("format", "format email octet-counted lengths (r5)",
  {"type": "string", "format": "email"},
  [('"' + r"\a" * 31 + '"@example.com', True),    # 64 octets incl. quotes
   ('"' + r"\a" * 32 + '"@example.com', False),   # 66 octets: escape=2 each
   ('"' + "a" * 62 + '"@example.com', True),      # unescaped: exactly 64
   ('"' + "a" * 63 + '"@example.com', False),     # 65-octet local
   ("a" * 64 + "@example.com", True),             # dot-atom at the cap
   ("a" * 65 + "@example.com", False),
   ("a@" + _D253, True),                          # 253-octet domain: cap
   ("a@x" + _D253, False)],                       # 254: past hostname's 253
  **FMT)
g("format", "format idn-email octet-counted local (r5)",
  {"type": "string", "format": "idn-email"},
  # ö is 2 octets in UTF-8: 33 of them = 66 octets > 64 even though the
  # unit count (33) is well under the old unit-based gate
  [("ö" * 32 + "@example.com", True),             # 64 octets: at the cap
   ("ö" * 33 + "@example.com", False),            # 66 octets
   ("用" * 21 + "@example.com", True),             # 63 octets (3 each)
   ("用" * 22 + "@example.com", False)],           # 66 octets
  **FMT)
g("format", "format email display-name phrase grammar (r5)",
  {"type": "string", "format": "email"},
  # RFC 5322 phrase: space-separated atext/obs-dot words and quoted
  # strings; the old [^<>]* shape accepted unquoted specials
  [("Simon <simon@example.com>", True),
   ("John Q. Public <jqp@example.com>", True),
   ('"Quoted, Name" <q@example.com>', True),
   ("<simon@example.com>", True),                 # bare angle-addr
   ("Name, Comma <u@example.com>", False),        # unquoted specials
   ("Semi;colon <u@example.com>", False),
   ("Col:on <u@example.com>", False),
   ("Par(en) <u@example.com>", False),
   ("Simon <simon@example.com> ", False),         # trailing junk
   # display text is stripped BEFORE the crate parses the addr-spec, so
   # its length is unbounded (no 320-ish whole-string cap exists)
   ("Name " * 60 + "Tail <u@example.com>", True)],
  options={"validate_formats": True,
           "email_options": {"allow_display_text": True}}, oracle=False)

# ---------------------------------------------------------------------------
# generated family: every keyword × the canonical instance set
# (expectations COMPUTED from python-jsonschema at build time, then
# re-checked by validate() like everything else — covers the keyword
# vacuity matrix: which instance types each keyword ignores)
# ---------------------------------------------------------------------------

CANONICAL_INSTANCES = [None, True, False, 0, 5, 2.5, -1, "", "abc",
                       [], [1, "a"], {}, {"a": 1}, [1, 1], {"a": None}]

CANONICAL_SCHEMAS = [
    {"type": "string"}, {"type": ["integer", "null"]},
    {"const": 5}, {"enum": [0, "abc", []]},
    {"minimum": 1}, {"maximum": 1}, {"exclusiveMinimum": 0},
    {"exclusiveMaximum": 0}, {"multipleOf": 5},
    {"minLength": 1}, {"maxLength": 2}, {"pattern": "^a"},
    {"required": ["a"]}, {"properties": {"a": {"type": "integer"}}},
    {"additionalProperties": False}, {"propertyNames": {"minLength": 2}},
    {"minProperties": 1}, {"maxProperties": 0},
    {"dependentRequired": {"a": ["b"]}},
    {"dependentSchemas": {"a": {"minProperties": 2}}},
    {"items": {"type": "integer"}}, {"prefixItems": [{"const": 1}]},
    {"contains": {"type": "integer"}}, {"minContains": 2,
                                        "contains": {"type": "integer"}},
    {"minItems": 1}, {"maxItems": 1}, {"uniqueItems": True},
    {"allOf": [{"minItems": 1}, {"maxItems": 1}]},
    {"anyOf": [{"type": "null"}, {"minimum": 3}]},
    {"oneOf": [{"type": "boolean"}, {"const": True}]},
    {"not": {"type": "object"}},
    {"if": {"type": "array"}, "then": {"minItems": 1},
     "else": {"type": ["number", "boolean", "null", "string"]}},
    {"unevaluatedProperties": False},
    {"unevaluatedItems": False},
    {"properties": {"a": {}}, "unevaluatedProperties": False},
    {"$ref": "#/$defs/t", "$defs": {"t": {"type": ["array", "object"]}}},
]


def build_canonical():
    import jsonschema

    for i, schema in enumerate(CANONICAL_SCHEMAS):
        v = jsonschema.Draft202012Validator(schema)
        kw = next(k for k in schema if not k.startswith("$")) \
            if any(not k.startswith("$") for k in schema) else "$ref"
        g("canonical", f"canonical matrix {i}: {kw}", schema,
          [(inst, v.is_valid(inst)) for inst in CANONICAL_INSTANCES])


build_canonical()

# ---------------------------------------------------------------------------
# draft dialects: per-draft keyword applicability (dialects.py; reference
# keywords/mod.rs:254-510 get_for_draft). Each family compiles under the
# group's draft DIALECT in suite.py, and every expectation is validated
# against the matching python-jsonschema Draft*Validator below — so a
# keyword wrongly asserted (or wrongly ignored) in a draft fails both the
# build and the driver oracle.
# ---------------------------------------------------------------------------

g("draft7", "post-draft-7 keywords are annotations in draft 7",
  {"prefixItems": [{"type": "integer"}],
   "dependentRequired": {"a": ["b"]},
   "minContains": 2},
  [(["s"], True), ({"a": 1}, True), ([1, "s"], True)], draft="7")
g("draft7", "draft-7 unevaluatedProperties is ignored",
  {"properties": {"a": {"type": "integer"}},
   "unevaluatedProperties": False},
  [({"a": 1, "extra": "x"}, True), ({"a": "s"}, False)], draft="7")
g("draft7", "draft-7 $ref siblings are ignored",
  {"definitions": {"t": {"type": "integer"}},
   "$ref": "#/definitions/t", "minimum": 100},
  [(5, True), ("s", False), (200, True)], draft="7")
g("draft7", "draft-7 if/then/else still applies",
  {"if": {"type": "integer"}, "then": {"minimum": 5},
   "else": {"type": "string"}},
  [(3, False), (7, True), ("s", True), ([], False)], draft="7")
g("draft7", "draft-7 const and contains still apply",
  {"const": 3},
  [(3, True), (4, False)], draft="7")
g("draft7", "draft-7 contains asserts without minContains gating",
  {"contains": {"type": "integer"}, "minContains": 3},
  [([1], True), (["s"], False), ([], False)], draft="7")
g("draft7", "draft-7 dependentSchemas is ignored (dependencies is not)",
  {"dependentSchemas": {"a": {"required": ["b"]}},
   "dependencies": {"c": ["d"]}},
  [({"a": 1}, True), ({"c": 1}, False), ({"c": 1, "d": 2}, True)],
  draft="7")

g("draft6", "draft-6 gains const/contains/propertyNames",
  {"contains": {"const": 5}, "propertyNames": {"maxLength": 2}},
  [([1, 5], True), ([1, 2], False), ({"ab": 1}, True),
   ({"abc": 1}, False)], draft="6")
g("draft6", "draft-6 numeric exclusiveMinimum applies",
  {"exclusiveMinimum": 5},
  [(5, False), (6, True), ("s", True)], draft="6")
g("draft6", "if/then is an annotation in draft 6",
  {"if": {"type": "integer"}, "then": {"minimum": 5}},
  [(3, True), (7, True)], draft="6")
g("draft6", "draft-6 $ref siblings are ignored",
  {"definitions": {"t": {"type": "string"}},
   "$ref": "#/definitions/t", "maxLength": 1},
  [("long-string", True), (3, False)], draft="6")

g("draft4", "const/contains/propertyNames are annotations in draft 4",
  {"const": 3, "contains": {"type": "integer"},
   "propertyNames": {"maxLength": 1}},
  [(4, True), (["s"], True), ({"long": 1}, True)], draft="4")
g("draft4", "draft-4 numeric exclusiveMinimum is an annotation",
  {"exclusiveMinimum": 5},
  [(3, True), (5, True)], draft="4")
g("draft4", "draft-4 boolean exclusiveMinimum tightens minimum",
  {"minimum": 5, "exclusiveMinimum": True},
  [(5, False), (6, True)], draft="4")
g("draft4", "draft-4 boolean exclusiveMaximum tightens maximum",
  {"maximum": 5, "exclusiveMaximum": True},
  [(5, False), (4, True)], draft="4")
g("draft4", "draft-4 dependencies and array items still apply",
  {"dependencies": {"a": ["b"]},
   "items": [{"type": "integer"}], "additionalItems": False},
  [({"a": 1}, False), ({"a": 1, "b": 2}, True), ([1], True),
   ([1, 2], False), (["s"], False)], draft="4")
g("draft4", "draft-4 id-scoped refs (fragment-only id is an anchor)",
  {"id": "http://example.com/r.json",
   "definitions": {"t": {"id": "#leaf", "type": "integer"}},
   "$ref": "#leaf"},
  [(3, True), ("s", False)], draft="4")
g("draft4", "if/then is an annotation in draft 4",
  {"if": {"type": "integer"}, "then": {"minimum": 5}},
  [(3, True)], draft="4")

g("draft7", "draft-7 validates formats BY DEFAULT "
  "(reference compiler.rs:271-276 validates_formats_by_default)",
  {"format": "ipv4"},
  [("10.0.0.1", True), ("999.0.0.1", False), (5, True)],
  draft="7", format_checker=True)
g("draft6", "draft-6 validates formats by default",
  {"properties": {"ts": {"format": "date-time"}}},
  [({"ts": "2020-01-01T00:00:00Z"}, True), ({"ts": "nope"}, False)],
  draft="6", format_checker=True)
g("draft4", "draft-4 validates formats by default",
  {"format": "email"},
  [("a@example.com", True), ("not-an-email", False)],
  draft="4", format_checker=True)
g("draft2019", "2019-09 format is an annotation by default",
  {"format": "ipv4"},
  [("999.0.0.1", True)], draft="2019-09")

g("draft2019", "prefixItems and $dynamicRef are annotations in 2019-09",
  {"prefixItems": [{"type": "integer"}]},
  [(["s"], True)], draft="2019-09")
g("draft2019", "2019-09 $ref composes with siblings",
  {"$defs": {"t": {"type": "integer"}},
   "$ref": "#/$defs/t", "minimum": 100},
  [(5, False), (200, True), ("s", False)], draft="2019-09")
g("draft2019", "2019-09 dependentRequired/minContains apply",
  {"dependentRequired": {"a": ["b"]},
   "contains": {"type": "integer"}, "minContains": 2},
  [({"a": 1}, False), ({"a": 1, "b": 2}, True), ([1], False),
   ([1, 2], True)], draft="2019-09")
g("draft2019", "2019-09 unevaluatedProperties applies",
  {"properties": {"a": {"type": "integer"}},
   "unevaluatedProperties": False},
  [({"a": 1, "extra": "x"}, False), ({"a": 1}, True)],
  draft="2019-09")

# ---------------------------------------------------------------------------
# $vocabulary: meta-schema-declared vocabulary sets gate keyword
# applicability (dialects.py bind_vocabularies; reference
# vocabularies.rs:12-143, registry.rs:526-553 find_vocabularies,
# keywords/mod.rs has_vocabulary gates). python-jsonschema does NOT
# implement vocabulary gating (verified: it asserts validation keywords
# under a validation-free meta-schema), so these expectations are pinned
# from the REFERENCE's own tests (lib.rs:3155-3196
# simple_schema_with_unknown_draft) + spec §8.1; oracle=False skips the
# python check, and tests/test_vocabulary.py covers the same cases in
# pytest.
# ---------------------------------------------------------------------------

_VMETA = "http://custom.example.com/schema"
_V2020 = "https://json-schema.org/draft/2020-12/vocab"


def _vocab_meta(*names):
    return {"$schema": "https://json-schema.org/draft/2020-12/schema",
            "$id": _VMETA,
            "$vocabulary": {f"{_V2020}/{n}": True for n in names}}


g("vocabulary", "reference lib.rs:3155-3196: core+applicator+validation "
  "meta-schema keeps type/properties asserting",
  {"$schema": _VMETA, "type": "object",
   "properties": {"name": {"type": "string"}}},
  [({"name": "test"}, True), ({"name": 123}, False),
   ("not an object", False)],
  options={"resources": {_VMETA: _vocab_meta(
      "core", "applicator", "validation")}}, oracle=False)
g("vocabulary", "validation vocabulary disabled: type/minProperties "
  "become annotations, applicator still walks",
  {"$schema": _VMETA, "type": "object", "minProperties": 5,
   "properties": {"name": {"type": "string"}}},
  [({"name": 123}, True), ("not an object", True), ({}, True)],
  options={"resources": {_VMETA: _vocab_meta("core", "applicator")}},
  oracle=False)
g("vocabulary", "unevaluated vocabulary disabled: "
  "unevaluatedProperties is an annotation",
  {"$schema": _VMETA, "properties": {"a": {"type": "integer"}},
   "unevaluatedProperties": False},
  [({"a": 1, "extra": "x"}, True), ({"a": "s"}, False)],
  options={"resources": {_VMETA: _vocab_meta(
      "core", "applicator", "validation")}}, oracle=False)
g("vocabulary", "format-assertion vocabulary: format asserts without "
  "validate_formats (2020-12 §7.2.1)",
  {"$schema": _VMETA, "format": "ipv4"},
  [("10.0.0.1", True), ("999.0.0.1", False), (5, True)],
  options={"resources": {_VMETA: _vocab_meta(
      "core", "validation", "format-assertion")}}, oracle=False)
g("vocabulary", "format vocabularies absent: format never asserts even "
  "with validate_formats=True (keywords/mod.rs:284-288)",
  {"$schema": _VMETA, "format": "ipv4"},
  [("999.0.0.1", True)],
  options={"resources": {_VMETA: _vocab_meta("core", "validation")},
           "validate_formats": True}, oracle=False)

# ---------------------------------------------------------------------------
# round 3: exact rational multipleOf kernel (functions/numerics.py;
# reference BigFraction-over-shortest-decimal semantics,
# ext/numeric.rs:62-86). python-jsonschema's float-division check
# disagrees below scale 15 (it calls 3e-15 NOT a multiple of 1e-15), so
# these carry oracle="fraction": validate() re-checks them against the
# engine's driver-side Fraction mirror instead.
# ---------------------------------------------------------------------------

g("numeric", "multipleOf decides by the 16th+ significant digit",
  {"multipleOf": 1e-15},
  [(2.0000000000000004e-15, False), (3e-15, True), (2.5e-15, False),
   (5e-324, False), (0, True), (1e-15, True)], oracle="fraction")
g("numeric", "multipleOf tiny fractional divisor exactness",
  {"multipleOf": 3.5e-7},
  [(7e-7, True), (8e-7, False), (1.05e-6, True), (-7e-7, True)],
  oracle="fraction")
g("numeric", "negative values are multiples by magnitude",
  {"multipleOf": 0.0001},
  [(-0.0002, True), (-0.00025, False), (1e300, True)],
  oracle="fraction")
g("numeric", "multipleOf huge-int instance keeps exact integer mod",
  {"multipleOf": 3},
  [(3 * BIG, True), (3 * BIG + 1, False)])

# ---------------------------------------------------------------------------
# round 4: integer exactness beyond int64 (ADVICE r3: u64-class JSON
# integers used to fall to IEEE fmod on the rounded double; now the
# variant decimal(38,15) view decides them exactly) and divisors beyond
# LONG/double literals (SchemaError-free compile, exact verdicts via
# the Fraction fallback). python-jsonschema's pure-Python int arithmetic
# is exact here, so these use the standard oracle.
# ---------------------------------------------------------------------------

g("numeric", "multipleOf u64-beyond-int64 instance decides exactly",
  {"multipleOf": 5},
  [(18446744073709551615, True), (18446744073709551616, False),
   (18446744073709551620, True), (0, True)])
g("numeric", "multipleOf divisor beyond int64",
  {"multipleOf": 18446744073709551615},
  [(18446744073709551615, True), (36893488147419103230, True),
   (5, False), (0, True)])
g("numeric", "multipleOf huge power-of-ten divisor",
  {"multipleOf": 10 ** 40},
  [(10 ** 40, True), (3 * 10 ** 40, True), (7, False), (0, True)])
# Java 17 renders this double as 6.7825399896329052E18 (17 digits, NOT
# shortest; significand divisible by 3) while the true shortest form
# 6.782539989632905e18 is not divisible — the r4 Fraction fallback must
# side-step the JVM rendering to match the reference's Ryu-based kernel
g("numeric", "multipleOf non-shortest JVM rendering corner",
  {"multipleOf": 0.3},
  [(6.782539989632905e+18, False), (0.6, True), (1e30, False),
   (0.8999999999999999, False)], oracle="fraction")
# float-LEXICAL instances keep IEEE-fmod-on-binary semantics for
# integer divisors (is_multiple_of_integer, ext/numeric.rs:121-124:
# serde parses 1e30 to f64 and the reference judges the binary value —
# fmod(1e30, 5) = 1 — NOT the decimal literal); python-jsonschema's
# float % int agrees, so the standard oracle applies
g("numeric", "multipleOf integer divisor over huge float instance",
  {"multipleOf": 5},
  [(1e30, False), (2e30, False), (2e19, True), (15.0, True)])

# ---------------------------------------------------------------------------
# round 3: depth for the thinner dialect families
# ---------------------------------------------------------------------------

g("draft6", "draft-6 contains ignores minContains/maxContains",
  {"contains": {"type": "integer"}, "minContains": 2, "maxContains": 2},
  [([1], True), ([1, 2, 3], True), (["s"], False)], draft="6")
g("draft6", "draft-6 boolean subschemas",
  {"properties": {"a": False}, "patternProperties": {"^b": True}},
  [({"a": 1}, False), ({"b1": 1}, True), ({}, True)], draft="6")
g("draft6", "draft-6 dependencies schema form",
  {"dependencies": {"a": {"required": ["b"]}}},
  [({"a": 1}, False), ({"a": 1, "b": 2}, True), ({"b": 2}, True)],
  draft="6")

g("draft2019", "2019-09 $recursiveRef recurses from the dynamic root",
  {"$recursiveAnchor": True, "type": "object",
   "properties": {"v": {"type": "integer"},
                  "child": {"$recursiveRef": "#"}},
   "additionalProperties": False},
  [({"v": 1}, True), ({"child": {"v": 2}}, True),
   ({"child": {"v": "s"}}, False), ({"x": 1}, False)],
  draft="2019-09")
g("draft2019", "2019-09 array-form items with unevaluatedItems",
  {"items": [{"type": "integer"}], "unevaluatedItems": False},
  [([1], True), ([1, 2], False), ([], True)], draft="2019-09")
g("draft2019", "2019-09 maxContains bounds matches",
  {"contains": {"type": "integer"}, "maxContains": 2},
  [([1, 2], True), ([1, 2, 3], False), (["s", 1], True)],
  draft="2019-09")

g("draft7", "draft-7 array-form items with additionalItems schema",
  {"items": [{"type": "integer"}, {"type": "string"}],
   "additionalItems": {"type": "boolean"}},
  [([1, "a", True], True), ([1, "a", 3], False), ([1], True)],
  draft="7")
g("draft7", "draft-7 $comment and unknown keywords are ignored",
  {"$comment": "note", "prefixItems": [{"type": "integer"}],
   "dependentRequired": {"a": ["b"]}},
  [(["s"], True), ({"a": 1}, True)], draft="7")

g("draft4", "draft-4 multipleOf fractional works",
  {"multipleOf": 0.5},
  [(1.5, True), (1.25, False), (-2.5, True)], draft="4")
g("draft4", "draft-4 enum with heterogeneous values",
  {"enum": [1, "a", [2], {"b": 3}, None]},
  [(1, True), ([2], True), ({"b": 3}, True), (2, False)], draft="4")

# round 4: draft-4 keeps the LEXICAL integer rule — 1.0 is NOT an
# integer (legacy type_draft_4.rs:91-155); drafts >= 6 accept any
# zero-fraction number. The variant parser preserves the lexical class
# (integer forms -> int types; fraction forms -> scale-carrying
# DECIMAL; exponent forms -> DOUBLE), which _is_integer_strict uses.
g("draft4", "draft-4 integer excludes 1.0",
  {"type": "integer"},
  [(1, True), (1.0, False), (-3, True), (-3.0, False), (1.5, False),
   (100, True), (18446744073709551615, True), (True, False),
   ("1", False)], draft="4")
g("draft4", "draft-4 integer in a property and type list",
  {"properties": {"n": {"type": ["integer", "string"]}}},
  [({"n": 2}, True), ({"n": 2.0}, False), ({"n": "x"}, True),
   ({"n": 2.5}, False)], draft="4")
g("draft6", "draft-6 integer accepts 1.0 (zero-fraction rule)",
  {"type": "integer"},
  [(1.0, True), (1.5, False), (1, True)], draft="6")

# ---------------------------------------------------------------------------
# validate + write
# ---------------------------------------------------------------------------


def validate():
    import jsonschema

    classes = {"2020-12": jsonschema.Draft202012Validator,
               "2019-09": jsonschema.Draft201909Validator,
               "7": jsonschema.Draft7Validator,
               "6": jsonschema.Draft6Validator,
               "4": jsonschema.Draft4Validator}
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from jsonschema_rs_spark.functions.numerics import (
        exact_multiple_of_fraction,
    )

    n_checked = 0
    for grp in V:
        if grp.get("oracle") == "fraction":
            # reference-kernel semantics python-jsonschema can't mirror:
            # re-derive every expectation from the engine's driver-side
            # Fraction mirror (independently tested vs the JVM kernel)
            m = grp["schema"]["multipleOf"]
            for t in grp["tests"]:
                got = exact_multiple_of_fraction(float(t["data"]), m)
                assert got == t["valid"], \
                    (grp["description"], t, "fraction oracle says", got)
                n_checked += 1
            continue
        if grp.get("oracle") is False:
            continue
        cls = classes[grp.get("draft", "2020-12")]
        if grp.get("format_checker"):
            # draft≤7 groups relying on the draft-based format default:
            # python-jsonschema needs the checker passed explicitly
            v = cls(grp["schema"], format_checker=cls.FORMAT_CHECKER)
        else:
            v = cls(grp["schema"])
        for t in grp["tests"]:
            got = v.is_valid(t["data"])
            assert got == t["valid"], \
                (grp["description"], t, "oracle says", got)
            n_checked += 1
    return n_checked


def main():
    n = validate()
    out = os.path.join(os.path.dirname(__file__), "..",
                       "jsonschema_rs_spark", "spec",
                       "vectors_2020_12.json")
    with open(out, "w") as f:
        json.dump(V, f, indent=1)
        f.write("\n")
    total = sum(len(grp["tests"]) for grp in V)
    fams = {}
    for grp in V:
        fams[grp["family"]] = fams.get(grp["family"], 0) + len(grp["tests"])
    print(f"{len(V)} groups, {total} cases ({n} oracle-checked): {fams}")


if __name__ == "__main__":
    sys.exit(main())
