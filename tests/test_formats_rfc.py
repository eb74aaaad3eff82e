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
        "München.de": True,              # UTS46 case mapping (r4 fix)
        "xn--kln-sna.de": True,          # valid A-label
        "xn--a": False,                  # invalid punycode
        "-leading.example": False,
        "a" * 64 + ".com": False,        # label > 63 octets
        "example.com.": False,           # trailing dot (DnsLength rule)
        "١۲٣.example.com": False,        # mixed arabic-indic digits
        "۱۲۳.example.com": True,         # uniform ext arabic-indic
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


# -- hostname (reference-exact, format.rs:548-646) ---------------------------


def _rule_check(spark, name, cases, options=None):
    from jsonschema_rs_spark.errors import ValidationOptions
    opts = ValidationOptions(validate_formats=True) \
        if options is None else options

    class Ctx:
        pass
    ctx = Ctx()
    ctx.options = opts
    rule = format_rule(name, ctx, "")
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    return {r["s"]: r["ok"] for r in df.select(
        "s", F.coalesce(rule.pred(F.col("s")),
                        F.lit(False)).alias("ok")).collect()}


def test_hostname_reference_vectors(spark):
    """format.rs:1478-1530 test vectors: R-LDH rule, trailing dot,
    length limits, punycode decode (idna-gated subset)."""
    cases = {
        "example.com": True,
        "a-b.c-d.e": True,
        "localhost": True,
        "ex--ample.com": False,          # hyphen at 3rd & 4th position
        "-example.com": False,           # leading hyphen
        "example-.com": False,           # trailing hyphen
        "example.com.": False,           # trailing dot
        "example..com": False,           # consecutive dots
        "exa mple.com": False,           # contains space
        "": False,
        ".": False,
        ("a" * 63 + ".") * 3 + "a" * 61: True,   # 253 chars exactly
        ("a" * 63 + ".") * 3 + "a" * 62: False,  # 254 chars
        "a" * 249 + ".com": False,       # 253 chars but label > 63
        "a" * 63 + ".com": True,
        "a" * 64 + ".com": False,        # label > 63
        "XN--aa---o47jg78q": False,      # uppercase punycode prefix
    }
    got = _rule_check(spark, "hostname", cases)
    assert got == cases, {k: (got[k], v) for k, v in cases.items()
                          if got[k] != v}


def test_hostname_punycode_decode(spark):
    """xn-- labels decode + unicode-label validity via the idna pUDF
    (format.rs punycode vectors, 1478-1520)."""
    pytest.importorskip("idna")
    cases = {
        "xn--bcher-kva.com": True,       # bücher
        "xn--ll-0ea": True,              # middle dot, valid context
        "xn--11b2ezcw70k": True,         # ZWJ after virama
        "xn--example.com": False,        # invalid punycode
        "xn--x": False,                  # too short
        "xn--vek": False,                # katakana middle dot alone
        "xn--l-fda": False,              # middle dot nothing preceding
        "xn--l-gda": False,              # middle dot nothing following
        "xn--02b508i": False,            # ZWJ not preceded by virama
        "xn--a-2hc5h": False,            # hebrew geresh not after hebrew
        "xn--bcher-.com": False,         # trailing hyphen
        "xn--hello-zed": False,          # starts with nonspacing mark
    }
    got = _rule_check(spark, "hostname", cases)
    assert got == cases, {k: (got[k], v) for k, v in cases.items()
                          if got[k] != v}


# -- email / idn-email (format.rs:510-545, 1571-1750 + EmailOptions) ---------


def _email_opts(eo=None):
    from jsonschema_rs_spark.errors import ValidationOptions
    return ValidationOptions(validate_formats=True, email_options=eo)


def test_email_default_reference_vectors(spark):
    """format.rs email_options_backward_compatibility +
    email_options_domain_literal defaults + RFC 5321 structure."""
    cases = {
        "user@example.com": True,
        "missing@domain": True,            # single-segment OK by default
        "not-an-email": False,
        "a @b.com": False,
        "email@[127.0.0.1]": True,         # literal valid by default
        "email@[IPv6:2001:db8::1]": True,
        "email@[999.0.0.1]": False,        # literal must PARSE as an IP
        "email@[2001:db8::1]": False,      # v6 literal needs IPv6: tag
        "Name <user@example.com>": False,  # display text off by default
        '"john doe"@example.com': True,    # quoted local part
        '"a@b"@example.com': True,         # quoted @
        "a..b@example.com": False,         # dot-atom: no double dots
        ".a@example.com": False,
        "a.@example.com": False,
        "a@b@c.com": False,
        "user@-bad.com": False,
        "user@example.com.": False,        # trailing dot
        "user@ex--ample.com": False,       # R-LDH in email domain too
        "a" * 64 + "@example.com": True,   # local exactly 64
        "a" * 65 + "@example.com": False,  # local over 64
    }
    got = _rule_check(spark, "email", cases, options=_email_opts())
    assert got == cases, {k: (got[k], v) for k, v in cases.items()
                          if got[k] != v}


def test_email_options_reference_tests(spark):
    """The five EmailOptions reference tests (format.rs:1626-1750)."""
    from jsonschema_rs_spark.errors import EmailOptions

    # with_required_tld
    got = _rule_check(spark, "email",
                      {"simon@localhost": False, "user@example.com": True},
                      options=_email_opts(EmailOptions().with_required_tld()))
    assert got == {"simon@localhost": False, "user@example.com": True}

    # with_no_minimum_sub_domains
    got = _rule_check(
        spark, "email",
        {"simon@localhost": True, "user@example.com": True},
        options=_email_opts(EmailOptions().with_no_minimum_sub_domains()))
    assert got == {"simon@localhost": True, "user@example.com": True}

    # with_minimum_sub_domains(3)
    got = _rule_check(
        spark, "email",
        {"user@example.com": False, "user@sub.example.com": True},
        options=_email_opts(EmailOptions().with_minimum_sub_domains(3)))
    assert got == {"user@example.com": False, "user@sub.example.com": True}

    # without_domain_literal
    got = _rule_check(
        spark, "email",
        {"email@[127.0.0.1]": False, "email@[IPv6:2001:db8::1]": False,
         "user@example.com": True},
        options=_email_opts(EmailOptions().without_domain_literal()))
    assert got == {"email@[127.0.0.1]": False,
                   "email@[IPv6:2001:db8::1]": False,
                   "user@example.com": True}

    # with_display_text
    got = _rule_check(
        spark, "email",
        {"Name <user@example.com>": True, "user@example.com": True,
         "Name <not-an-email>": False},
        options=_email_opts(EmailOptions().with_display_text()))
    assert got == {"Name <user@example.com>": True,
                   "user@example.com": True,
                   "Name <not-an-email>": False}


def test_email_display_phrase_containing_at(spark):
    """The local-part octet gate must anchor on the addr-spec, not the
    first '@' in the string: a quoted display word containing '@' used
    to hijack the extraction (the regex captured display text), causing
    both false accepts (an oversized quoted local went unmeasured) and
    false rejects (display octets counted as the local)."""
    from jsonschema_rs_spark.errors import EmailOptions
    opts = _email_opts(EmailOptions().with_display_text())
    cases = {
        # '@' inside the quoted display word, 1-octet real local
        '"x@y" <q@example.com>': True,
        '"ab' + "x" * 60 + '@cd" <q@example.com>': True,
        # quoted local at/over the 64-octet boundary behind such a phrase
        '"x@y" <"' + "a" * 62 + '"@example.com>': True,    # 64 octets
        '"x@y" <"' + "a" * 63 + '"@example.com>': False,   # 65 octets
    }
    got = _rule_check(spark, "email", cases, options=opts)
    assert got == cases, {k: (got[k], v) for k, v in cases.items()
                          if got[k] != v}


def test_email_punycode_domain(spark):
    """email domains ride the same punycode decode as `hostname`
    (format.rs:540-541 is_valid_email -> is_valid_hostname)."""
    pytest.importorskip("idna")
    cases = {
        "user@xn--kln-sna.de": True,
        "user@xn--example.com": False,
    }
    got = _rule_check(spark, "email", cases, options=_email_opts())
    assert got == cases, got


def test_idn_email(spark):
    """idn-email: UTF-8 local parts + IDN domains
    (format.rs:544-545 is_valid_idn_email -> is_valid_idn_hostname)."""
    pytest.importorskip("idna")
    cases = {
        "user@example.com": True,
        "用户@example.com": True,
        "user@münchen.de": True,
        "user@xn--kln-sna.de": True,
        "théo@example.com": True,
        "user@exa mple.com": False,
        "not-an-email": False,
        "user@@x.com": False,
        "user@münchen..de": False,
        "email@[127.0.0.1]": True,       # literals allowed here too
    }
    got = _rule_check(spark, "idn-email", cases, options=_email_opts())
    assert got == cases, {k: (got[k], v) for k, v in cases.items()
                          if got[k] != v}


def test_email_require_tld_kwarg(spark):
    """jsonschema-py constructor parity: EmailOptions(require_tld=True)
    behaves like with_required_tld (__init__.pyi EmailOptions)."""
    from jsonschema_rs_spark.errors import EmailOptions
    got = _rule_check(
        spark, "email",
        {"simon@localhost": False, "user@example.com": True},
        options=_email_opts(EmailOptions(require_tld=True)))
    assert got == {"simon@localhost": False, "user@example.com": True}
