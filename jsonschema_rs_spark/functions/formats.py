"""`format` / content keyword validators.

The reference implements 18 built-in formats in Rust (dispatch at
crates/jsonschema/src/keywords/format.rs:1218-1238); here the cheap ones
are pure Column expressions (regex + try-casts, JVM-side, codegen'd) —
including the offset-exact leap-second rule for time/date-time
(format.rs:412-432: `:60` only at UTC 23:59) — and only the checks a
regex genuinely can't express consult a batched Arrow pandas UDF: IDN
hostnames (full IDNA via idna), punycode DECODE of xn-- labels in
hostname / email domains (format.rs:621-646), and `format: regex`.
Formats assert only when options.validate_formats=True, matching the
2020-12 default (compiler.rs:271-276).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jsonschema_rs_spark.compiler.nodes import Rule

# RFC 3339 full-date/time building blocks (reference: format.rs:315-508 does
# this by hand; we regex-gate the shape then try-cast for calendar validity)
_DATE_RE = r"^\d{4}-\d{2}-\d{2}\z"
_TIME_RE = (
    r"^(([01]\d|2[0-3]):[0-5]\d:([0-5]\d|60)(\.\d+)?)"
    r"([Zz]|[+-]([01]\d|2[0-3]):[0-5]\d)\z"
)
_DATETIME_RE = (
    r"^\d{4}-\d{2}-\d{2}[Tt]"
    r"([01]\d|2[0-3]):[0-5]\d:([0-5]\d|60)(\.\d+)?"
    r"([Zz]|[+-]([01]\d|2[0-3]):[0-5]\d)\z"
)
_UUID_RE = r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\z"
_IPV4_RE = r"^((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\z"
# RFC 1123 hostname label, reference-exact shape (format.rs:548-646
# is_valid_hostname validate_label): 1-63 LDH chars, no leading/trailing
# hyphen, and the RFC 5891 R-LDH rule — hyphens at positions 3-4 only
# for a (lowercase) `xn--` punycode label. The negative lookahead is
# restricted to LDH chars so it can never span a `.` separator.
_HOST_LABEL = (
    r"(?:xn--[A-Za-z0-9-]{0,58}[A-Za-z0-9]"
    r"|(?![A-Za-z0-9-]{2}--)[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?)"
)
# whole hostname: 1-253 chars, NO trailing dot (format.rs:598 rejects
# it), every label valid. xn-- labels are shape-only here; the punycode
# DECODE check (format.rs:621-646) is the pUDF refinement in format_rule.
_HOSTNAME_RE = (
    r"^(?=[A-Za-z0-9.-]{1,253}\z)"
    + _HOST_LABEL + r"(?:\." + _HOST_LABEL + r")*\z"
)
_JSON_POINTER_RE = r"^(/([^/~]|~[01])*)*\z"
_REL_JSON_POINTER_RE = r"^(0|[1-9]\d*)(#|(/([^/~]|~[01])*)*)\z"
_DURATION_RE = (
    r"^P(\d+W|(\d+Y)?(\d+M)?(\d+D)?(T(\d+H)?(\d+M)?(\d+(\.\d+)?S)?)?)\z"
)
def _build_uri_regexes():
    """Full RFC 3986 (URI) / RFC 3987 (IRI) grammars as regexes — both
    are regular languages, so the EXACT check stays a JVM-side `rlike`
    (codegen'd, no Python). Mirrors the reference's parser-backed
    is_valid_uri / is_valid_iri (format.rs:896-976) including the
    complete IPv6address ABNF and RFC 6874 zone-ids in URI hosts.

    IRI = URI grammar with `ucschar` added to unreserved positions and
    `iprivate` allowed in the query (RFC 3987 §2.2)."""
    ucs = ("\\x{A0}-\\x{D7FF}\\x{F900}-\\x{FDCF}\\x{FDF0}-\\x{FFEF}"
           "\\x{10000}-\\x{1FFFD}\\x{20000}-\\x{2FFFD}"
           "\\x{30000}-\\x{3FFFD}\\x{40000}-\\x{4FFFD}"
           "\\x{50000}-\\x{5FFFD}\\x{60000}-\\x{6FFFD}"
           "\\x{70000}-\\x{7FFFD}\\x{80000}-\\x{8FFFD}"
           "\\x{90000}-\\x{9FFFD}\\x{A0000}-\\x{AFFFD}"
           "\\x{B0000}-\\x{BFFFD}\\x{C0000}-\\x{CFFFD}"
           "\\x{D0000}-\\x{DFFFD}\\x{E1000}-\\x{EFFFD}")
    iprivate = "\\x{E000}-\\x{F8FF}\\x{F0000}-\\x{FFFFD}\\x{100000}-\\x{10FFFD}"

    h16 = "[0-9A-Fa-f]{1,4}"
    v4 = (r"((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
          r"(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)")
    ls32 = f"({h16}:{h16}|{v4})"
    v6 = "|".join([
        f"({h16}:){{6}}{ls32}",
        f"::({h16}:){{5}}{ls32}",
        f"({h16})?::({h16}:){{4}}{ls32}",
        f"(({h16}:){{0,1}}{h16})?::({h16}:){{3}}{ls32}",
        f"(({h16}:){{0,2}}{h16})?::({h16}:){{2}}{ls32}",
        f"(({h16}:){{0,3}}{h16})?::{h16}:{ls32}",
        f"(({h16}:){{0,4}}{h16})?::{ls32}",
        f"(({h16}:){{0,5}}{h16})?::{h16}",
        f"(({h16}:){{0,6}}{h16})?::",
    ])
    vfuture = r"[Vv][0-9A-Fa-f]+\.[A-Za-z0-9._~!$&'()*+,;=:-]+"

    scheme = "[A-Za-z][A-Za-z0-9+.-]*"
    out = {}
    for name, extra_unres, extra_q in (("uri", "", ""),
                                       ("iri", ucs, iprivate)):
        unres = f"[A-Za-z0-9._~{extra_unres}-]"
        pct = "%[0-9A-Fa-f]{2}"
        sub = r"[!$&'()*+,;=]"
        # RFC 6874: optional %25-escaped zone id on an IPv6 literal
        zone = f"(%25({unres}|{pct})+)?"
        ip_lit = f"\\[(({v6}){zone}|{vfuture})\\]"
        reg_name = f"({unres}|{pct}|{sub})*"
        userinfo = f"({unres}|{pct}|{sub}|:)*"
        host = f"({ip_lit}|{v4}|{reg_name})"
        authority = f"({userinfo}@)?{host}(:\\d*)?"
        pchar = f"({unres}|{pct}|{sub}|[:@])"
        pchar_nc = f"({unres}|{pct}|{sub}|@)"   # no-colon (path-noscheme)
        seg = f"{pchar}*"
        seg_nz = f"{pchar}+"
        seg_nz_nc = f"{pchar_nc}+"
        # hier-part: //authority path-abempty / path-absolute /
        #            path-rootless / path-empty
        hier = (f"(//{authority}(/{seg})*"
                f"|/({seg_nz}(/{seg})*)?"
                f"|{seg_nz}(/{seg})*"
                f"|)")
        # relative-part: like hier-part but the first segment of a
        # relative path must not contain ":" (path-noscheme)
        rel = (f"(//{authority}(/{seg})*"
               f"|/({seg_nz}(/{seg})*)?"
               f"|{seg_nz_nc}(/{seg})*"
               f"|)")
        qchar = f"({pchar}|[/?]" \
            + (f"|[{extra_q}]" if extra_q else "") + ")"
        fchar = f"({pchar}|[/?])"
        tail = f"(\\?{qchar}*)?(#{fchar}*)?\\z"
        out[name] = f"^{scheme}:{hier}{tail}"
        out[name + "-ref"] = f"^({scheme}:{hier}|{rel}){tail}"
    out["ipv6"] = f"^({v6})\\z"
    return out


_URI_GRAMMAR = _build_uri_regexes()
_URI_RE = _URI_GRAMMAR["uri"]
_URI_REF_RE = _URI_GRAMMAR["uri-ref"]
_IRI_RE = _URI_GRAMMAR["iri"]
_IRI_REF_RE = _URI_GRAMMAR["iri-ref"]
_URI_TEMPLATE_RE = r"^([^\x00-\x20\x7f\"'%<>\\^`{|}]|%[0-9A-Fa-f]{2}|\{[+#./;?&=,!@|]?((\w|%[0-9A-Fa-f]{2})(\.?(\w|%[0-9A-Fa-f]{2}))*(:[1-9]\d{0,3}|\*)?)(,((\w|%[0-9A-Fa-f]{2})(\.?(\w|%[0-9A-Fa-f]{2}))*(:[1-9]\d{0,3}|\*)?))*\})*\z"


def _date_valid(c: Column) -> Column:
    # shape + real-calendar check: try_to_timestamp is NULL on Feb-30 etc.
    # (ANSI-safe: never throws)
    return c.rlike(_DATE_RE) & F.try_to_timestamp(c, F.lit("yyyy-MM-dd")).isNotNull()


def _leap_second_ok(c: Column, time_start: int) -> Column:
    """RFC 3339 / format.rs:412-432,491: a `:60` second is valid only
    when the time-of-day converted to UTC is 23:59. `time_start` is the
    1-based position of HH in the string (1 for `time`, 12 for
    `date-time` — the offset always terminates the string as `Z`/`z` or
    `±HH:MM`, which the shape regex has already guaranteed)."""
    ss = F.substring(c, time_start + 6, 2)
    hh = F.substring(c, time_start, 2).cast("int")
    mm = F.substring(c, time_start + 3, 2).cast("int")
    tz = F.substring(c, -6, 6)
    is_z = F.upper(F.substring(c, -1, 1)) == "Z"
    off_min = F.when(is_z, F.lit(0)).otherwise(
        F.when(F.substring(tz, 1, 1) == "+", F.lit(1)).otherwise(F.lit(-1))
        * (F.substring(tz, 2, 2).cast("int") * 60
           + F.substring(tz, 5, 2).cast("int")))
    utc = F.pmod(hh * 60 + mm - off_min, F.lit(1440))
    return (ss != "60") | (utc == 23 * 60 + 59)


def _time_valid(c: Column) -> Column:
    return c.rlike(_TIME_RE) & _leap_second_ok(c, 1)


def _datetime_valid(c: Column) -> Column:
    shape = c.rlike(_DATETIME_RE)
    # calendar-validity of the date part (try_to_timestamp is NULL on
    # Feb-30 etc.) + offset-exact leap-second rule on the time part
    date_ok = F.try_to_timestamp(F.substring(c, 1, 10),
                                 F.lit("yyyy-MM-dd")).isNotNull()
    return shape & date_ok & _leap_second_ok(c, 12)


def _ipv6_valid(c: Column) -> Column:
    # EXACT RFC 4291/3986 IPv6address grammar (r3): all nine ABNF
    # alternatives incl. IPv4-mapped tails ("::ffff:1.2.3.4"); group
    # over-runs like "1:2:3:4:5:6:7::8" and zone-ids ("fe80::1%eth0")
    # are rejected, matching the reference's std-parser behavior
    return c.rlike(_URI_GRAMMAR["ipv6"])


# -- email / idn-email (format.rs:510-545 is_valid_email_impl over the
# email_address crate, + EmailOptions, options.rs:926-1113) ------------------

# RFC 5321 atext; idn-email additionally allows any non-ASCII code point
# in atext positions (RFC 6531 SMTPUTF8 — the crate's UTF-8 local parts)
_EMAIL_ATEXT = r"[A-Za-z0-9!#$%&'*+/=?^_`{|}~\-]"
_EMAIL_ATEXT_IDN = r"(?:" + _EMAIL_ATEXT + r"|[^\x00-\x7F])"
# unanchored IPv4 / IPv6 bodies for bracketed domain literals — the
# reference strips the brackets and requires a clean std-parser IP
# (format.rs:524-533)
_IPV4_BODY = _IPV4_RE[1:-2]  # strip "^" head and "\\z" tail
# approximate unicode hostname label for the idn-email Column shape
# (exact IDNA rules live in the idna pUDF refinement, like idn-hostname)
_IDN_LABEL = r"(?:(?!-)[^\x00-\x20\x7F@.<>\[\]\\\"]{1,63}(?<!-))"


def _addr_spec_re(idn: bool, opts, display: bool) -> str:
    """One addr-spec regex for the given EmailOptions: local = dot-atom
    (with an @-within-64 length gate) | quoted-string (RFC 5321
    QtextSMTP / quoted-pairSMTP; octet-length gated separately in
    _email_shape — a repetition bound here would count escape PAIRS as
    one), domain = reference hostname with >= minimum_sub_domains
    labels | bracketed IPv4/IPv6 literal. With display=True the
    addr-spec is wrapped as `phrase <addr>` where phrase is the RFC
    5322 display-name grammar (space-separated atext/obs-dot words and
    quoted strings — the email_address crate's display handling; the
    old `[^<>]*` accepted unquoted specials like `,;:()`), with the
    display-name itself optional (name-addr allows a bare angle-addr)."""
    tail = r">\z" if display else r"\z"
    dchar = r"[^@>]" if display else r"[^@]"
    atext = _EMAIL_ATEXT_IDN if idn else _EMAIL_ATEXT
    dot_atom = r"(?=[^@]{1,64}@)" + atext + r"+(?:\." + atext + r"+)*"
    quoted = r"\"(?:[ !#-\[\]-~]|\\[ -~])+\""
    local = "(?:" + dot_atom + "|" + quoted + ")"
    label = _IDN_LABEL if idn else _HOST_LABEL
    n = max(1, int(getattr(opts, "effective_minimum_sub_domains", 0) or 0))
    host = (r"(?=" + dchar + r"{1,253}" + tail + r")"
            + label + r"(?:\." + label + r"){" + str(n - 1) + r",}")
    alts = [host]
    if getattr(opts, "allow_domain_literal", True):
        alts.append(r"\[" + _IPV4_BODY + r"\]")
        # strip the "^(" head and ")\z" tail of the anchored grammar
        alts.append(r"\[IPv6:" + _URI_GRAMMAR["ipv6"][1:-2] + r"\]")
    addr = local + "@" + "(?:" + "|".join(alts) + ")"
    if display:
        word = r"(?:(?:" + atext + r"|\.)+|" + quoted + r")"
        phrase = r"(?:" + word + r"(?:[ \t]+" + word + r")*[ \t]*)?"
        return r"^" + phrase + r"<" + addr + r">\z"
    return r"^" + addr + r"\z"


# local part of the addr-spec wherever it sits (start of string, or
# after the display-name's '<'): quoted-string first so embedded dots/
# specials don't split it, else the run up to the '@'. Anchored on the
# FINAL '@domain' (domains cannot contain '@'), so a display phrase
# containing '@' (e.g. `"x@y" <a@b.com>`) never wins the extraction —
# an unanchored first-match regex captured display text there.
_EMAIL_LOCAL_EXTRACT = r'(?:^|[<\s])("(?:[^"\\]|\\.)*"|[^@<>\s]+)@[^@]*\z'


def _email_shape(c: Column, idn: bool, opts) -> Column:
    ok = c.rlike(_addr_spec_re(idn, opts, display=False))
    if getattr(opts, "allow_display_text", False):
        ok = ok | c.rlike(_addr_spec_re(idn, opts, display=True))
    # email_address-crate length gates count OCTETS (str::len is bytes):
    # LOCAL_PART_MAX_LENGTH = 64 includes the quotes, each escape octet,
    # and every UTF-8 continuation octet — unit-counting regex bounds
    # can't see any of those, so gate the extracted local separately.
    # No whole-string gate: the crate strips display text BEFORE parsing
    # (a display name's length is unbounded) and never checks total
    # address length — 64 + 1 + DOMAIN_MAX_LENGTH(254) caps the
    # addr-spec at 319 implicitly (the named-host path is tighter still:
    # is_valid_hostname's 253, the {1,253} lookahead in the regex)
    local = F.regexp_extract(c, _EMAIL_LOCAL_EXTRACT, 1)
    return ok & (F.octet_length(local) <= 64)


def _email_domain(c: Column) -> Column:
    """The named-host domain of an addr-spec (empty string for bracketed
    literals), tolerant of a trailing `>` from display-text forms."""
    return F.regexp_extract(c, r"@([^@\[\]<>]+)>?\z", 1)


def _punycode_labels_udf():
    """xn-- labels must DECODE to a valid unicode label (reference
    is_valid_hostname's punycode branch, format.rs:621-646). idna's
    A-label machinery reproduces the reference's hand-rolled
    validate_unicode_label rules — all 18 of format.rs's punycode test
    vectors match (pinned in tests/test_formats_rfc.py)."""
    def ok(v):
        import idna

        for label in v.split("."):
            if label.startswith("xn--"):
                try:
                    idna.decode(label, std3_rules=True)
                except (idna.IDNAError, UnicodeError):
                    return False
        return True

    return _str_pred_pandas_udf(ok)


_COLUMN_FORMATS = {
    "date": _date_valid,
    "date-time": _datetime_valid,
    "time": _time_valid,
    "uuid": lambda c: c.rlike(_UUID_RE),
    "ipv4": lambda c: c.rlike(_IPV4_RE),
    "ipv6": _ipv6_valid,
    "hostname": lambda c: c.rlike(_HOSTNAME_RE),
    # (email/idn-email are NOT here: format_rule's dedicated branch
    # returns for every path — entries in this dict would be dead)
    "json-pointer": lambda c: c.rlike(_JSON_POINTER_RE),
    "relative-json-pointer": lambda c: c.rlike(_REL_JSON_POINTER_RE),
    "duration": lambda c: c.rlike(_DURATION_RE) & (c != "P") & ~c.endswith("T"),
    # exact RFC 3986/3987 grammars (see _build_uri_regexes)
    "uri": lambda c: c.rlike(_URI_RE),
    "uri-reference": lambda c: c.rlike(_URI_REF_RE),
    "iri": lambda c: c.rlike(_IRI_RE),
    "iri-reference": lambda c: c.rlike(_IRI_REF_RE),
    "uri-template": lambda c: c.rlike(_URI_TEMPLATE_RE),
    # structural approximation (labels 1-63, no leading/trailing hyphen,
    # no trailing dot); the exact IDNA check is the pUDF in format_rule
    "idn-hostname": lambda c: c.rlike(
        r"^(?=.{1,253}\z)" + _IDN_LABEL + r"(?:\." + _IDN_LABEL + r")*\z"),
}


def _regex_format_udf():
    """`format: regex` needs a regex-compile check — not expressible as a
    Column; one shared Arrow-batched pandas UDF (never per-row Python)."""
    def ok(v):
        import re

        try:
            re.compile(v)
            return True
        except re.error:
            return False

    return _str_pred_pandas_udf(ok)


def _idn_hostname_udf():
    """RFC 5890 IDN hostname via the `idna` package (import-gated at
    compile time; callers fall back to the approximate Column check when
    the package is absent). Mirrors the reference's UTS46 pipeline
    (format.rs:778-800: Uts46::to_ascii with STD3 deny list +
    DnsLength::Verify, non-transitional): uts46=True applies the same
    case/width mapping ("München.de" is valid, r4 fix — uts46=False
    rejected mixed-case U-labels the reference maps), and a trailing
    dot is rejected outright (DnsLength::Verify refuses the empty root
    label; "example.com." is in the reference's invalid vector list —
    the former strip-then-check accepted it). Accepts both U-labels
    (köln.de) and A-labels (xn--kln-sna.de); rejects bad punycode, bidi
    violations, and oversized labels — the corners a regex can't
    express."""
    def ok(v):
        import idna

        if v == "" or v.endswith("."):
            return False
        try:
            idna.encode(v, uts46=True, std3_rules=True,
                        transitional=False)
            return True
        except (idna.IDNAError, UnicodeError):
            return False

    return _str_pred_pandas_udf(ok)


def format_rule(name: str, ctx, sp: str) -> Rule | None:
    # Spark forbids Python UDFs inside higher-order-function lambdas
    # (UNSUPPORTED_FEATURE.LAMBDA_FUNCTION_WITH_PYTHON_UDF), so the
    # pUDF-backed formats downgrade when this format sits under an
    # array/map applicator on the variant path (ctx.hof_depth — see
    # VariantCompileContext): custom formats raise a clear SchemaError
    # instead of an opaque AnalysisException; regex (no Column
    # equivalent exists for "compiles as a regex") and idn-hostname
    # fall back to their approximate Column checks.
    in_hof = getattr(ctx, "hof_depth", 0) > 0
    if name in ctx.options.custom_formats:
        if in_hof:
            from jsonschema_rs_spark.errors import SchemaError
            raise SchemaError(
                f"custom format {name!r} (a Python callable) cannot be "
                "evaluated inside array/object applicators on the "
                "dynamic-JSON path — Spark does not allow Python UDFs "
                "in higher-order-function lambdas", sp + "/format")
        fn = ctx.options.custom_formats[name]
        # custom format: a Python str->bool callable batched through Arrow
        _custom = _str_pred_pandas_udf(fn)
        return Rule("format", sp + "/format", f"invalid {name!r} format",
                    lambda c: _custom(c), priority=10)
    if name == "regex":
        if not in_hof:
            udf = _regex_format_udf()
            return Rule("format", sp + "/format", "invalid regex",
                        lambda c: udf(c), priority=10)
        if not ctx.options.ignore_unknown_formats:
            from jsonschema_rs_spark.errors import SchemaError
            raise SchemaError(
                "format 'regex' needs a regex-compile check (a pandas "
                "UDF), which Spark forbids inside array/object "
                "applicator lambdas on the dynamic-JSON path; set "
                "ignore_unknown_formats=True to downgrade it to an "
                "annotation there", sp + "/format")
        return None  # annotation-only downgrade inside HOFs
    if name == "idn-hostname" and not in_hof:
        try:
            import idna  # noqa: F401 — compile-time availability probe
            udf = _idn_hostname_udf()
            return Rule("format", sp + "/format", "invalid idn-hostname",
                        lambda c: udf(c), priority=10)
        except ImportError:
            pass  # approximate Column fallback below
    if name == "hostname" and not in_hof:
        # punycode refinement (format.rs:621-646): xn-- labels must
        # decode to a valid unicode label. Spark does not short-circuit
        # boolean OR around Python UDFs, so the pUDF column is gated with
        # F.when: rows WITHOUT an xn-- label feed NULL into the batch
        # (the predicate maps None -> True without running the decoder)
        # and only rows containing xn-- pay for the punycode decode.
        try:
            import idna  # noqa: F401

            puny = _punycode_labels_udf()
            return Rule(
                "format", sp + "/format", "invalid 'hostname' format",
                lambda c: c.rlike(_HOSTNAME_RE)
                & puny(F.when(c.contains("xn--"), c)), priority=10)
        except ImportError:
            pass  # shape-only Column fallback below
    if name in ("email", "idn-email"):
        idn = name == "idn-email"
        opts = ctx.options.email_options  # None = reference defaults
        if in_hof:
            # pure-Column shape inside HOF lambdas (no pUDF allowed)
            return Rule(
                "format", sp + "/format", f"invalid {name!r} format",
                lambda c, idn=idn, opts=opts: _email_shape(c, idn, opts),
                priority=10)
        try:
            import idna  # noqa: F401

            # reference parity: email domains go through the same
            # hostname (punycode) / idn-hostname checks as the
            # standalone formats (format.rs:540-545); bracketed
            # literals extract as "" and skip the refinement
            dom_udf = _idn_hostname_udf() if idn else _punycode_labels_udf()

            def check(c, idn=idn, opts=opts, dom_udf=dom_udf):
                dom = _email_domain(c)
                # gate the pUDF input with F.when (None -> True inside
                # the predicate): Spark does not short-circuit | around
                # Python UDFs, so an ungated dom_udf(dom) would pay the
                # Arrow round trip on EVERY row
                refine = dom_udf(F.when(F.length(dom) > 0, dom)) \
                    if idn else \
                    dom_udf(F.when(dom.contains("xn--"), dom))
                return _email_shape(c, idn, opts) & refine

            return Rule("format", sp + "/format",
                        f"invalid {name!r} format", check, priority=10)
        except ImportError:
            return Rule(
                "format", sp + "/format", f"invalid {name!r} format",
                lambda c, idn=idn, opts=opts: _email_shape(c, idn, opts),
                priority=10)
    builder = _COLUMN_FORMATS.get(name)
    if builder is None:
        if not ctx.options.ignore_unknown_formats:
            # reference should_ignore_unknown_formats(false)
            # (options.rs:434-440; format.rs:1355-1365 pins the message)
            from jsonschema_rs_spark.errors import SchemaError
            raise SchemaError(
                f"Unknown format: {name!r}. Adjust configuration to "
                "ignore unrecognized formats", sp + "/format")
        return None  # unknown format = annotation (2020-12 semantics)
    return Rule("format", sp + "/format", f"invalid {name!r} format",
                builder, priority=10)


# RFC 4648 canonical-form regexes (content_encoding.rs:27-79 mirrors —
# the reference's data_encoding crate is STRICT: canonical padding AND
# zero trailing bits, so the final partial group's last symbol is
# constrained to the values whose unused low bits are 0).
_B64_LAST2 = "[AQgw]"              # 2 pad chars: low 4 bits zero
_B64_LAST3 = "[AEIMQUYcgkosw048]"  # 1 pad char: low 2 bits zero
_B64_RE = (r"^([A-Za-z0-9+/]{4})*"
           r"([A-Za-z0-9+/]" + _B64_LAST2 + r"==|"
           r"[A-Za-z0-9+/]{2}" + _B64_LAST3 + r"=)?\z")
_B64URL_RE = (r"^([A-Za-z0-9_-]{4})*"
              r"([A-Za-z0-9_-]" + _B64_LAST2 + r"==|"
              r"[A-Za-z0-9_-]{2}" + _B64_LAST3 + r"=)?\z")
_B32_RE = (r"^([A-Z2-7]{8})*"
           r"([A-Z2-7][AEIMQUY4]={6}|"
           r"[A-Z2-7]{3}[AQ]={4}|"
           r"[A-Z2-7]{4}[ACEGIKMOQSUWY246]={3}|"
           r"[A-Z2-7]{6}[AIQY]=)?\z")
_B32HEX_RE = (r"^([0-9A-V]{8})*"
              r"([0-9A-V][048CGKOS]={6}|"
              r"[0-9A-V]{3}[0G]={4}|"
              r"[0-9A-V]{4}[02468ACEGIKMOQSU]={3}|"
              r"[0-9A-V]{6}[08GO]=)?\z")
_B16_RE = r"^([0-9A-Fa-f][0-9A-Fa-f])*\z"  # case-insensitive per the reference

_CONTENT_ENCODINGS = {
    "base64": lambda c: c.rlike(_B64_RE),
    "base64url": lambda c: c.rlike(_B64URL_RE),
    "base32": lambda c: c.rlike(_B32_RE),
    "base32hex": lambda c: c.rlike(_B32HEX_RE),
    "base16": lambda c: c.rlike(_B16_RE),
}

# encoding → Column expr producing the decoded BINARY (NULL on failure);
# base32 variants have no JVM decoder, so media-type checks on them fall
# back to an Arrow pandas UDF
_CONTENT_DECODERS = {
    "base64": lambda c: F.try_to_binary(c, F.lit("base64")),
    "base64url": lambda c: F.try_to_binary(
        F.translate(c, "-_", "+/"), F.lit("base64")),
    "base16": lambda c: F.try_to_binary(c, F.lit("hex")),
    None: lambda c: c.cast("binary"),
}


def _str_pred_pandas_udf(per_value):
    """bool-per-string predicate as an Arrow-batched pandas UDF.
    Annotations are attached as REAL types (the module's
    `from __future__ import annotations` would stringify inline hints,
    which pyspark's type-hint inference can't resolve)."""
    import pandas as pd

    def _check(s):
        return s.map(lambda v: True if v is None else bool(per_value(v)))

    _check.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf(_check, T.BooleanType())


def _b32_decode_json_udf(hex_alphabet: bool):
    def ok(v):
        import base64
        import json

        try:
            raw = base64.b32hexdecode(v) if hex_alphabet \
                else base64.b32decode(v)
            json.loads(raw.decode("utf-8"))
            return True
        except Exception:
            return False

    return _str_pred_pandas_udf(ok)



def content_rules(schema: dict, ctx, sp: str) -> list[Rule]:
    rules: list[Rule] = []
    enc = schema.get("contentEncoding")
    mt = schema.get("contentMediaType")
    # see format_rule: no Python UDF may sit inside a HOF lambda, so
    # custom (Python-callable) content checks raise a clear SchemaError
    # under array/map applicators, and the base32 JSON-decode check
    # (no JVM base32 decoder exists) downgrades to annotation-only
    # there — its contentEncoding shape rule still asserts
    in_hof = getattr(ctx, "hof_depth", 0) > 0

    if enc in ctx.options.custom_content_encodings:
        if in_hof:
            from jsonschema_rs_spark.errors import SchemaError
            raise SchemaError(
                f"custom contentEncoding {enc!r} (a Python callable) "
                "cannot be evaluated inside array/object applicators on "
                "the dynamic-JSON path", sp + "/contentEncoding")
        udf = _str_pred_pandas_udf(
            ctx.options.custom_content_encodings[enc])
        rules.append(Rule(
            "contentEncoding", sp + "/contentEncoding",
            f"not valid {enc}", lambda c, udf=udf: udf(c), priority=15))
    elif enc in _CONTENT_ENCODINGS:
        pred = _CONTENT_ENCODINGS[enc]
        rules.append(Rule(
            "contentEncoding", sp + "/contentEncoding",
            f"not valid {enc}", pred, priority=15))
    # unknown encoding = annotation only (2020-12 semantics)

    if mt is None:
        return rules
    if mt in ctx.options.custom_content_media_types:
        if in_hof:
            from jsonschema_rs_spark.errors import SchemaError
            raise SchemaError(
                f"custom contentMediaType {mt!r} (a Python callable) "
                "cannot be evaluated inside array/object applicators on "
                "the dynamic-JSON path", sp + "/contentMediaType")
        # custom media-type check runs on the DECODED text when the
        # encoding has a JVM decoder; on the raw string only when there
        # is NO encoding to undo (an undecodable encoding would feed
        # the callable encoded text — annotation-only instead)
        fn = ctx.options.custom_content_media_types[mt]
        udf = _str_pred_pandas_udf(fn)
        dec = _CONTENT_DECODERS.get(enc)
        if dec is not None:
            rules.append(Rule(
                "contentMediaType", sp + "/contentMediaType",
                f"decoded content is not {mt}",
                lambda c, udf=udf, dec=dec:
                udf(dec(c).cast("string")), priority=16))
        elif enc is None:
            rules.append(Rule(
                "contentMediaType", sp + "/contentMediaType",
                f"content is not {mt}",
                lambda c, udf=udf: udf(c), priority=16))
    elif mt == "application/json":
        if enc in ("base32", "base32hex"):
            if not in_hof:
                udf = _b32_decode_json_udf(enc == "base32hex")
                rules.append(Rule(
                    "contentMediaType", sp + "/contentMediaType",
                    "decoded content is not JSON",
                    lambda c, udf=udf: udf(c), priority=16))
            # in_hof: annotation-only downgrade (documented above)
        elif enc is None or enc in _CONTENT_DECODERS:
            dec = _CONTENT_DECODERS.get(enc, _CONTENT_DECODERS[None])
            rules.append(Rule(
                "contentMediaType", sp + "/contentMediaType",
                "decoded content is not JSON",
                lambda c, dec=dec:
                F.try_parse_json(dec(c).cast("string")).isNotNull(),
                priority=16))
        # else: custom/unknown contentEncoding with no JVM decoder —
        # asserting JSON on the still-ENCODED text would reject rows
        # valid under both keywords (review find); annotation-only,
        # like unknown media types
    # unknown media type = annotation only
    return rules
