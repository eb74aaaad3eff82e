"""RFC-exactness differentials for formats where a reference validator
is installed: date/date-time/time vs rfc3339-validator, idn-hostname vs
the idna package (both import-gated — skipped cleanly if absent)."""

import pytest
from pyspark.sql import functions as F

from jsonschema_rs_spark.functions.formats import _COLUMN_FORMATS, format_rule


def col_check(spark, fmt, values):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    pred = _COLUMN_FORMATS[fmt]
    rows = df.select("s", F.coalesce(pred(F.col("s")),
                                     F.lit(False)).alias("ok")).collect()
    return {r["s"]: r["ok"] for r in rows}


DATETIMES = [
    "2024-01-01T10:00:00Z", "2024-01-01t10:00:00z",
    "2024-01-01T10:00:00+05:30", "2024-02-29T00:00:00Z",
    "2023-02-29T00:00:00Z", "2024-13-01T00:00:00Z",
    "2024-01-32T00:00:00Z", "2024-01-01T24:00:00Z",
    "2024-01-01T23:59:60Z", "2024-01-01 10:00:00Z",
    "2024-01-01T10:00:00", "2024-01-01T10:00:00.123456Z",
    "2024-01-01T10:00:00+0530", "24-01-01T10:00:00Z",
    "2024-1-01T10:00:00Z", "2024-01-01T10:00:00-00:00",
]

DATES = ["2024-02-29", "2023-02-29", "2024-12-31", "2024-00-10",
         "2024-13-01", "2024-01-32", "2024-1-1", "20240101", ""]

TIMES = ["10:00:00Z", "23:59:60Z", "10:00:00+01:00", "10:00:00",
         "24:00:00Z", "10:60:00Z", "10:00:61Z", "1:00:00Z",
         "10:00:00.5Z", "10:00:00+24:00"]


def test_datetime_vs_rfc3339(spark):
    rfc = pytest.importorskip("rfc3339_validator")
    got = col_check(spark, "date-time", DATETIMES)
    for s in DATETIMES:
        want = rfc.validate_rfc3339(s)
        # rfc3339_validator is STRICTER than RFC 3339 in two spots where
        # the engine follows the RFC (and the reference, format.rs):
        # lowercase t/z separators are explicitly allowed by the RFC,
        # and :60 leap seconds are part of the time-second grammar
        # (official suite: "valid leap second, UTC" is valid)
        if got[s] and not want and (s != s.upper() or ":60" in s):
            continue
        assert got[s] == want, (s, got[s], want)


def test_date_shapes(spark):
    got = col_check(spark, "date", DATES)
    want = {"2024-02-29": True, "2023-02-29": False, "2024-12-31": True,
            "2024-00-10": False, "2024-13-01": False, "2024-01-32": False,
            "2024-1-1": False, "20240101": False, "": False}
    assert got == want


def test_time_shapes(spark):
    got = col_check(spark, "time", TIMES)
    want = {"10:00:00Z": True, "23:59:60Z": True, "10:00:00+01:00": True,
            "10:00:00": False, "24:00:00Z": False, "10:60:00Z": False,
            "10:00:61Z": False, "1:00:00Z": False, "10:00:00.5Z": True,
            "10:00:00+24:00": False}
    assert got == want


def test_idn_hostname_exact(spark):
    pytest.importorskip("idna")
    from jsonschema_rs_spark.errors import ValidationOptions

    class Ctx:
        options = ValidationOptions(validate_formats=True)

    rule = format_rule("idn-hostname", Ctx(), "")
    cases = {
        "example.com": True,
        "köln.de": True,
        "xn--kln-sna.de": True,          # valid A-label
        "xn--a": False,                  # invalid punycode
        "-leading.example": False,
        "a" * 64 + ".com": False,        # label > 63 octets
        "": False,
    }
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    got = {r["s"]: r["ok"] for r in df.select(
        "s", F.coalesce(rule.pred(F.col("s")),
                        F.lit(False)).alias("ok")).collect()}
    assert got == cases, got


def _ref_time_valid(s):
    """Pure-Python reimplementation of the reference's leap-second rule
    (format.rs:412-432, 491): `:60` seconds are valid only when the
    time-of-day converted to UTC is 23:59."""
    import re
    m = re.match(r"^(\d{2}):(\d{2}):(\d{2})(\.\d+)?"
                 r"([Zz]|[+-]\d{2}:\d{2})$", s)
    if not m:
        return False
    hh, mm, ss = int(m[1]), int(m[2]), int(m[3])
    if hh > 23 or mm > 59 or ss > 60:
        return False
    tz = m[5]
    if tz in ("Z", "z"):
        off = 0
    else:
        ohh, omm = int(tz[1:3]), int(tz[4:6])
        if ohh > 23 or omm > 59:
            return False
        off = (1 if tz[0] == "+" else -1) * (ohh * 60 + omm)
    if ss == 60:
        return (hh * 60 + mm - off) % 1440 == 23 * 60 + 59
    return True


LEAP_TIMES = [
    "23:59:60Z", "23:59:60z", "12:00:60Z", "23:59:60.5Z",
    "15:59:60-08:00", "23:59:60+01:00", "00:29:60+00:30",
    "23:29:60-00:30", "22:59:60-01:00", "23:59:60-00:00",
    "00:00:60Z", "23:59:59+01:00",
]


def test_time_leap_second_offset_exact(spark):
    got = col_check(spark, "time", LEAP_TIMES)
    for s in LEAP_TIMES:
        assert got[s] == _ref_time_valid(s), (s, got[s])


def test_datetime_leap_second_offset_exact(spark):
    dts = ["1998-12-31T" + s for s in LEAP_TIMES]
    got = col_check(spark, "date-time", dts)
    for s, t in zip(dts, LEAP_TIMES):
        assert got[s] == _ref_time_valid(t), (s, got[s])
