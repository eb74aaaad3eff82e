"""contentEncoding (RFC 4648 family, canonical like the reference's
data_encoding crate — content_encoding.rs:27-79) + custom content
encodings/media types (options.rs:138-243)."""

import base64

import pytest

from jsonschema_rs_spark.compiler.variant import compile_json_schema
from jsonschema_rs_spark.errors import ValidationOptions


def vcheck(spark, schema, cases, options=None):
    plan = compile_json_schema(schema, options)
    df = spark.createDataFrame([(doc,) for doc, _ in cases], "j string")
    got = [r["valid"]
           for r in plan.with_validation(df, "j").select("valid").collect()]
    assert got == [v for _, v in cases], \
        list(zip([d for d, _ in cases], got, [v for _, v in cases]))


def j(s: str) -> str:
    return '"%s"' % s


@pytest.mark.parametrize("enc,ok,bad", [
    ("base64",
     ["aGVsbG8=", "aQ==", "", "Zm9vYmFy"],
     ["aGVsbG8", "ab==", "a===", "####", "aGVsbG8==", "=Zm9v"]),
    ("base64url",
     ["aGVsbG8=", "a-_Q", "", "aQ=="],
     ["a+/Q", "ab==", "abc"]),
    ("base32",
     ["MZXW6YTB", "MZXW6===", "ME======", "", "MZXQ===="],
     ["MZXW6@==", "MZXW6", "M=======", "MF======", "mzxw6==="]),
    ("base32hex",
     ["CPNMUOJ1", "CPNMU===", "C4======", ""],
     ["CPNMUOJW", "CPNMU", "C5======"]),
    ("base16",
     ["48656C6C6F", "48656c6c6f", "", "00fF"],
     ["489", "XZ", "0x48"]),
])
def test_content_encoding(spark, enc, ok, bad):
    schema = {"contentEncoding": enc}
    cases = [(j(s), True) for s in ok] + [(j(s), False) for s in bad]
    # non-strings pass (content keywords only apply to strings)
    cases += [("5", True), ("null", True), ("[1]", True)]
    vcheck(spark, schema, cases)


def test_base64_reference_roundtrip(spark):
    # every canonical encoding of random bytes must validate
    blobs = [bytes(range(n)) for n in range(0, 16)]
    cases = [(j(base64.b64encode(b).decode()), True) for b in blobs]
    cases += [(j(base64.urlsafe_b64encode(b).decode()), True)
              for b in blobs]
    vcheck(spark, {"contentEncoding": "base64"}, cases[:16])
    vcheck(spark, {"contentEncoding": "base64url"}, cases[16:])


def test_b32_roundtrip(spark):
    blobs = [b"", b"f", b"fo", b"foo", b"foob", b"fooba", b"foobar"]
    vcheck(spark, {"contentEncoding": "base32"},
           [(j(base64.b32encode(b).decode()), True) for b in blobs])
    vcheck(spark, {"contentEncoding": "base32hex"},
           [(j(base64.b32hexencode(b).decode()), True) for b in blobs])


@pytest.mark.parametrize("enc,payload", [
    ("base64", lambda s: base64.b64encode(s).decode()),
    ("base64url", lambda s: base64.urlsafe_b64encode(s).decode()),
    ("base16", lambda s: s.hex()),
    ("base32", lambda s: base64.b32encode(s).decode()),
    ("base32hex", lambda s: base64.b32hexencode(s).decode()),
])
def test_media_type_json_through_encoding(spark, enc, payload):
    schema = {"contentEncoding": enc, "contentMediaType": "application/json"}
    vcheck(spark, schema, [
        (j(payload(b'{"a": 1}')), True),
        (j(payload(b'not json')), False),
    ])


def test_media_type_json_plain(spark):
    vcheck(spark, {"contentMediaType": "application/json"}, [
        (j("{}"), True),
        ('"{\\"a\\": 1}"', True),
        ('"nope"', False),
        ("7", True),  # non-strings pass
    ])


def test_custom_content_encoding(spark):
    opts = ValidationOptions(custom_content_encodings={
        "rot13": lambda s: s.isalpha() or s == ""})
    vcheck(spark, {"contentEncoding": "rot13"}, [
        (j("hello"), True), (j("hell0"), False), (j(""), True),
    ], opts)


def test_custom_content_media_type(spark):
    opts = ValidationOptions(custom_content_media_types={
        "application/yaml": lambda s: ":" in s})
    vcheck(spark, {"contentMediaType": "application/yaml"}, [
        (j("a: 1"), True), (j("nope"), False),
    ], opts)
    # custom media type through a decodable encoding sees DECODED text
    opts2 = ValidationOptions(custom_content_media_types={
        "application/yaml": lambda s: ":" in s})
    enc = base64.b64encode(b"a: 1").decode()
    vcheck(spark, {"contentEncoding": "base64",
                   "contentMediaType": "application/yaml"},
           [(j(enc), True)], opts2)


def test_unknown_encoding_is_annotation(spark):
    vcheck(spark, {"contentEncoding": "quoted-printable"},
           [(j("anything=XX"), True)])
