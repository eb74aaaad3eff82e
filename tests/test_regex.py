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
