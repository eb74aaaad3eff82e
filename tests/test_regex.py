from jsonschema_rs_spark.regex.ecma import ecma_to_java, literal_prefix


def test_dollar_anchor_rewritten():
    assert ecma_to_java("abc$") == r"abc\z"


def test_caret_start():
    assert ecma_to_java("^abc") == r"\Aabc"


def test_class_untouched():
    assert ecma_to_java("[a$^]") == "[a$^]"


def test_escapes_passthrough():
    assert ecma_to_java(r"\$\d+\cA") == r"\$\d+\cA"


def test_literal_prefix_detected():
    assert literal_prefix("^doc-") == "doc-"
    assert literal_prefix("^doc-.*") == "doc-"
    assert literal_prefix(r"^a\.b") == "a.b"


def test_literal_prefix_rejected():
    assert literal_prefix("doc-") is None
    assert literal_prefix("^doc[0-9]") is None
    assert literal_prefix(r"^\d") is None


# -- PatternOptions (options.rs:647-876 with_pattern_options analog) ---------


def test_nonlinear_construct_scanner():
    from jsonschema_rs_spark.regex.ecma import nonlinear_construct as nc
    assert nc("(?=a)b") is not None
    assert nc("a(?!b)") is not None
    assert nc("(?<=a)b") is not None
    assert nc("(?<!a)b") is not None
    assert nc(r"(a)\1") is not None
    assert nc(r"(?<x>a)\k<x>") is not None
    # non-capturing / named groups and class contents are fine
    assert nc("(?:a)(?<name>b)") is None
    assert nc(r"[\1]") is None
    assert nc("^ab?c*$") is None
    assert nc(r"a\.b") is None


def test_pattern_options_linear_rejects_fancy_constructs(spark):
    """PatternOptions.regex(): lookaround/backrefs are BUILD errors,
    like the regex crate under with_pattern_options (options.rs:850)."""
    import pytest as _pytest

    from jsonschema_rs_spark import PatternOptions, validator_for
    from jsonschema_rs_spark.errors import SchemaError, ValidationOptions

    po = PatternOptions.regex()
    for pat in ["(?=a)b", "a(?!b)", "(?<=a)b", r"(a)\1"]:
        with _pytest.raises(SchemaError, match="linear-time"):
            validator_for({"pattern": pat}, pattern_options=po)
    # plain patterns still compile and validate under the linear engine
    v = validator_for({"type": "string", "pattern": "^a+b"},
                      pattern_options=po)
    import pyspark.sql.functions as F
    df = spark.createDataFrame([('"aab"',), ('"xb"',)], "j string")
    got = [r["ok"] for r in
           df.select(v.valid_column(F.col("j")).alias("ok")).collect()]
    assert got == [True, False]

    # typed path honors it too (patternProperties / pattern share the
    # same per-context regex gate)
    from jsonschema_rs_spark import compile_schema
    sch = {"properties": {"name": {"pattern": r"(x)\1"}}}
    sdf = spark.createDataFrame([("xx",)], "name string")
    with _pytest.raises(SchemaError, match="linear-time"):
        compile_schema(sch, sdf.schema,
                       ValidationOptions(pattern_options=po))
    # default engine (fancy_regex analog) accepts them everywhere
    compile_schema(sch, sdf.schema, ValidationOptions())
    validator_for({"pattern": "(?=a)b"})


def test_pattern_options_builders():
    from jsonschema_rs_spark import PatternOptions
    assert PatternOptions.fancy_regex().engine == "backtracking"
    assert PatternOptions.regex().engine == "linear"
    po = PatternOptions.fancy_regex().with_backtrack_limit(10_000) \
        .with_size_limit(1 << 20).with_dfa_size_limit(1 << 21)
    assert (po.backtrack_limit, po.size_limit, po.dfa_size_limit) == \
        (10_000, 1 << 20, 1 << 21)
