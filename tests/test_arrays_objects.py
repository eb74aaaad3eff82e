"""Array applicators over span-like columns and object/composition keywords
(SURVEY.md §2.3-§2.5)."""

from pyspark.sql import functions as F

from jsonschema_rs_spark import compile_schema, ValidationOptions


def verdicts(spark, rows, ddl, schema, options=None):
    df = spark.createDataFrame(rows, ddl)
    plan = compile_schema(schema, df.schema, options=options)
    return [r.valid for r in plan.with_validation(df).select("valid").collect()]


ARR = "a array<int>"


def test_min_max_items(spark):
    s = {"properties": {"a": {"minItems": 1, "maxItems": 3}}}
    assert verdicts(spark, [([1],), ([],), ([1, 2, 3, 4],), (None,)], ARR, s) == \
        [True, False, False, True]


def test_unique_items(spark):
    s = {"properties": {"a": {"uniqueItems": True}}}
    assert verdicts(spark, [([1, 2],), ([1, 1],), ([],)], ARR, s) == \
        [True, False, True]


def test_unique_items_structs(spark):
    ddl = "a array<struct<k:string,v:int>>"
    s = {"properties": {"a": {"uniqueItems": True}}}
    rows = [([("x", 1), ("x", 2)],), ([("x", 1), ("x", 1)],)]
    assert verdicts(spark, rows, ddl, s) == [True, False]


def test_items_subschema(spark):
    s = {"properties": {"a": {"items": {"minimum": 0}}}}
    assert verdicts(spark, [([1, 2],), ([1, -2],), ([],)], ARR, s) == \
        [True, False, True]


def test_items_error_paths_carry_index(spark):
    df = spark.createDataFrame([("r1", [1, -2, -3])], "id string, a array<int>")
    plan = compile_schema({"properties": {"a": {"items": {"minimum": 0}}}},
                          df.schema)
    v = plan.violations(df, ["id"]).collect()
    assert sorted(r.instance_path for r in v) == ["/a/1", "/a/2"]


def test_prefix_items_and_rest(spark):
    s = {"properties": {"a": {
        "prefixItems": [{"const": 0}, {"minimum": 10}],
        "items": {"maximum": 5},
    }}}
    rows = [([0, 11, 1],), ([1, 11],), ([0, 2],), ([0, 11, 9],), ([0],)]
    assert verdicts(spark, rows, ARR, s) == [True, False, False, False, True]


def test_additional_items_false_draft7_form(spark):
    s = {"properties": {"a": {"items": [{"minimum": 0}], "additionalItems": False}}}
    assert verdicts(spark, [([1],), ([1, 2],), ([],)], ARR, s) == \
        [True, False, True]


def test_contains_min_max(spark):
    s = {"properties": {"a": {"contains": {"minimum": 10}}}}
    assert verdicts(spark, [([1, 11],), ([1, 2],)], ARR, s) == [True, False]
    s2 = {"properties": {"a": {"contains": {"minimum": 10},
                               "minContains": 2, "maxContains": 3}}}
    assert verdicts(spark, [([11, 12],), ([11],), ([11, 12, 13, 14],)], ARR, s2) == \
        [True, False, False]


def test_min_contains_zero_always_valid(spark):
    s = {"properties": {"a": {"contains": {"minimum": 10}, "minContains": 0}}}
    assert verdicts(spark, [([1],), ([],)], ARR, s) == [True, True]


def test_nested_struct_properties(spark):
    ddl = "o struct<name:string, n:int>"
    s = {"properties": {"o": {
        "required": ["name"],
        "properties": {"name": {"minLength": 2}, "n": {"minimum": 0}},
    }}}
    rows = [(("ab", 1),), (("a", 1),), ((None, 1),), (("ab", -1),), (None,)]
    assert verdicts(spark, rows, ddl, s) == [True, False, False, False, True]


def test_array_of_structs_spans_shape(spark):
    ddl = ("spans array<struct<kind:string,text:string,"
           "media_ref:string,offset:int>>")
    s = {"properties": {"spans": {"items": {
        "required": ["kind", "offset"],
        "properties": {"kind": {"enum": ["text", "image"]},
                       "offset": {"minimum": 0}},
        "allOf": [{
            "if": {"properties": {"kind": {"const": "text"}},
                   "required": ["kind"]},
            "then": {"required": ["text"]},
            "else": {"required": ["media_ref"]},
        }],
    }}}}
    ok = [("text", "hi", None, 0), ("image", None, "a-1", 5)]
    bad_enum = [("gif", None, "a-1", 0)]
    bad_text_missing = [("text", None, None, 0)]
    bad_media_missing = [("image", None, None, 0)]
    assert verdicts(spark, [(ok,), (bad_enum,), (bad_text_missing,),
                            (bad_media_missing,)], ddl, s) == \
        [True, False, False, False]


def test_all_any_one_not(spark):
    s = {"properties": {"n": {
        "allOf": [{"minimum": 0}, {"maximum": 100}],
        "anyOf": [{"multipleOf": 3}, {"multipleOf": 5}],
        "not": {"const": 15},
    }}}
    assert verdicts(spark, [(9,), (7,), (15,), (-3,)], "n int", s) == \
        [True, False, False, False]


def test_one_of_exactly_one(spark):
    s = {"properties": {"n": {"oneOf": [{"multipleOf": 3}, {"multipleOf": 5}]}}}
    assert verdicts(spark, [(9,), (25,), (15,), (7,)], "n int", s) == \
        [True, True, False, False]


def test_if_then_else(spark):
    s = {"properties": {"o": {
        "if": {"properties": {"k": {"const": "a"}}, "required": ["k"]},
        "then": {"properties": {"n": {"minimum": 10}}},
        "else": {"properties": {"n": {"maximum": 5}}},
    }}}
    ddl = "o struct<k:string,n:int>"
    rows = [(("a", 11),), (("a", 5),), (("b", 3),), (("b", 7),)]
    assert verdicts(spark, rows, ddl, s) == [True, False, True, False]


def test_local_ref_defs(spark):
    s = {
        "$defs": {"positive": {"minimum": 1}},
        "properties": {"n": {"$ref": "#/$defs/positive"}},
    }
    assert verdicts(spark, [(2,), (0,)], "n int", s) == [True, False]


def test_recursive_ref_bounded_by_dtype(spark):
    # recursive schema over a finite dtype terminates at compile time
    ddl = "t struct<v:int, child:struct<v:int>>"
    s = {
        "$defs": {"node": {
            "properties": {"v": {"minimum": 0},
                           "child": {"$ref": "#/$defs/node"}},
        }},
        "properties": {"t": {"$ref": "#/$defs/node"}},
    }
    rows = [((1, (2,)),), ((1, (-2,)),), ((-1, None),)]
    assert verdicts(spark, rows, ddl, s) == [True, False, False]


def test_boolean_schemas(spark):
    assert verdicts(spark, [(1,)], "n int", {"properties": {"n": True}}) == [True]
    assert verdicts(spark, [(1,), (None,)], "n int",
                    {"properties": {"n": False}}) == [False, True]


def test_map_column_object_keywords(spark):
    ddl = "m map<string,int>"
    s = {"properties": {"m": {
        "required": ["a"],
        "properties": {"a": {"minimum": 0}},
        "minProperties": 1,
        "maxProperties": 3,
        "additionalProperties": {"maximum": 100},
    }}}
    rows = [({"a": 1},), ({"b": 1},), ({"a": -1},),
            ({"a": 1, "b": 500},), ({"a": 1, "b": 2, "c": 3, "d": 4},)]
    assert verdicts(spark, rows, ddl, s) == [True, False, False, False, False]


def test_map_pattern_properties_and_names(spark):
    ddl = "m map<string,int>"
    s = {"properties": {"m": {
        "patternProperties": {"^n_": {"minimum": 0}},
        "propertyNames": {"maxLength": 5},
    }}}
    rows = [({"n_a": 1, "x": -5},), ({"n_a": -1},), ({"toolongname": 1},)]
    assert verdicts(spark, rows, ddl, s) == [True, False, False]


def test_unevaluated_properties_struct(spark):
    df = spark.createDataFrame([(1, "x"), (2, None), (None, "y")],
                               "a long, b string")
    from jsonschema_rs_spark import compile_schema
    plan = compile_schema({"properties": {"a": {"type": "integer"}},
                           "unevaluatedProperties": False}, df.schema)
    got = [r["valid"] for r in plan.with_validation(df).collect()]
    # b present → unevaluated → invalid; b absent (null) → fine
    assert got == [False, True, False]
    # branch coverage: anyOf branch claiming 'b' only counts when valid
    plan2 = compile_schema({
        "properties": {"a": {}},
        "anyOf": [{"required": ["b"], "properties": {"b": {}}},
                  {"required": ["a"]}],
        "unevaluatedProperties": False}, df.schema)
    got2 = [r["valid"] for r in plan2.with_validation(df).collect()]
    assert got2 == [True, True, True]
    plan3 = compile_schema({
        "properties": {"a": {}},
        "unevaluatedProperties": {"type": "integer"}}, df.schema)
    got3 = [r["valid"] for r in plan3.with_validation(df).collect()]
    assert got3 == [False, True, False]  # b is a string, not integer


def test_unevaluated_items_typed_array(spark):
    df = spark.createDataFrame(
        [([1, 2],), ([1],), ([],), ([5, 6, 7],)], "xs array<long>")
    from jsonschema_rs_spark import compile_schema
    plan = compile_schema({"prefixItems": [{"type": "integer"}],
                           "unevaluatedItems": False},
                          df.schema, column="xs")
    got = [r["valid"] for r in plan.with_validation(df).collect()]
    assert got == [False, True, True, False]
    plan2 = compile_schema({"prefixItems": [{}],
                            "unevaluatedItems": {"minimum": 6}},
                           df.schema, column="xs")
    got2 = [r["valid"] for r in plan2.with_validation(df).collect()]
    assert got2 == [False, True, True, True]
    # contains-matched items count as evaluated
    plan3 = compile_schema({"contains": {"minimum": 5},
                            "unevaluatedItems": False},
                           df.schema, column="xs")
    got3 = [r["valid"] for r in plan3.with_validation(df).collect()]
    assert got3 == [False, False, False, True]


def test_unevaluated_properties_map(spark):
    df = spark.createDataFrame(
        [({"a": 1, "b": 2},), ({"a": 1},), ({"z": 9},)],
        "m map<string,long>")
    from jsonschema_rs_spark import compile_schema
    plan = compile_schema({"properties": {"a": {}},
                           "unevaluatedProperties": False},
                          df.schema, column="m")
    got = [r["valid"] for r in plan.with_validation(df).collect()]
    assert got == [False, True, False]
