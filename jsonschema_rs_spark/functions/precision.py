"""Parse-time numeric precision-loss detection for the Variant path.

Spark's variant parser (``F.try_parse_json``) stores a JSON number
token exactly as DECIMAL when the token has no exponent marker, its
BigDecimal precision (unscaled-digit count, leading zeros stripped) is
<= 38, and its scale (digits after the dot) is <= 38; every other
number — any exponent form (even ``1e2``), >38-digit integers,
>38-digit fractions — is downgraded to DOUBLE, the same f64 downgrade
serde_json applies without its ``arbitrary_precision`` feature. The
reference crate opts INTO arbitrary precision (lib.rs:769-792
BigInt/BigFraction; ext/numeric.rs:89-110), so a >38-digit integer the
reference validates exactly is, on this engine, validated against its
nearest double.

This module makes that documented parse-level limit OBSERVABLE per row
(``ValidationOptions.on_precision_loss`` — the same observability
treatment round 5 gave recursive-$ref depth exhaustion): a document is
*precision-degraded* iff it contains at least one number token whose
exact decimal value differs from the double the variant parser stores
for it. Note the double-but-exact forms are NOT flagged: ``1e2``,
``2.5e1``, or a 41-digit rendering of 1.0 all store the exact value.

The storage-class rule above is pinned empirically against
``try_parse_json``/``schema_of_variant`` in
tests/test_round5_fixes.py::test_variant_numeric_storage_classes.

Cost discipline: rows reach the Arrow pUDF only when a JVM-side regex
prefilter marks them as candidates — an exponent marker or a 39+ run of
digit/dot characters anywhere in the raw text, a strict superset of
every degradable token and absent from virtually all real documents.
Because Spark does not short-circuit boolean operators around Python
UDFs, the gate NULLs the pUDF *input* for non-candidates (the same
fix ADVICE r4 prescribed for the punycode gate) instead of wrapping
the pUDF output in ``F.when``.
"""

from __future__ import annotations

import json
import math
from decimal import Decimal
from fractions import Fraction

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["precision_degraded_column", "token_precision_degraded",
           "exact_verdict_column", "exact_kernel_verdict_column"]

# Superset prefilter (JVM rlike, codegen'd): an exponent-marked number
# form, or 39+ consecutive digit/dot chars. Every degradable token
# matches: exponent forms directly; >38-digit integers and >38-scale
# fractions both contain a 39+ contiguous [0-9.] run.
_CANDIDATE_RE = "[0-9][eE][+-]?[0-9]|[0-9.]{39,}"


def token_precision_degraded(tok: str) -> bool:
    """True iff the variant parser's stored value for this JSON number
    token differs from the token's exact decimal value."""
    t = tok[1:] if tok[:1] in "+-" else tok
    if "e" not in t and "E" not in t:
        ip, _, fp = t.partition(".")
        unscaled = (ip + fp).lstrip("0")
        if len(unscaled or "0") <= 38 and len(fp) <= 38:
            return False  # stored as DECIMAL — always exact
    # stored as DOUBLE: degraded iff the exact decimal is not
    # double-representable (or overflows to ±inf)
    try:
        d = float(tok)
    except (OverflowError, ValueError):
        return True
    if math.isinf(d):
        return True
    return Fraction(d) != Fraction(Decimal(tok))


def _doc_degraded(text: str) -> bool:
    toks: list[str] = []

    def _keep(tok: str):
        toks.append(tok)
        return 0

    try:
        # parse_int/parse_float receive the RAW lexical token — exactly
        # the information the variant binary no longer carries
        json.loads(text, parse_int=_keep, parse_float=_keep,
                   parse_constant=lambda _t: 0)
    except RecursionError:
        # nested beyond even the raised limit (_raise_recursion_limit
        # runs before any call): degradation can't be DISPROVEN, and the
        # JVM prefilter already guaranteed a candidate token is present
        # — conservative True, never a silent not-degraded (the 'fail'
        # mode's contract). Deterministic: the limit is raised at batch
        # start, not as a side effect of building the first validator.
        return True
    except Exception:  # noqa: BLE001 — malformed JSON is the 'json'
        return False   # keyword's problem, not a precision signal
    return any(token_precision_degraded(t) for t in toks)


def _raise_recursion_limit() -> None:
    """Python burns ~10 frames per nesting level in json parse and
    python-jsonschema validation; raise the interpreter default (1000)
    once per worker so deep documents get real answers instead of
    RecursionError at ~100 levels. Called at the START of every pUDF
    batch in this module so detection never depends on whether some
    other row built a validator first."""
    import sys
    if sys.getrecursionlimit() < _KERNEL_RECURSION_LIMIT:
        sys.setrecursionlimit(_KERNEL_RECURSION_LIMIT)


_UDF_CACHE: list = []


def _degraded_udf():
    # created lazily: pandas_udf's DDL return type needs an active
    # SparkContext, which doesn't exist at import time
    if not _UDF_CACHE:
        @F.pandas_udf("boolean")
        def degraded(texts: pd.Series) -> pd.Series:
            _raise_recursion_limit()
            return texts.map(
                lambda t: False if t is None else _doc_degraded(t))
        _UDF_CACHE.append(degraded)
    return _UDF_CACHE[0]


def precision_degraded_column(json_col: Column) -> Column:
    """Boolean Column: this JSON document contains >=1 number token the
    variant parser stores inexactly. NULL and prefilter-miss rows are
    False; only candidate rows carry real text across the Arrow
    boundary."""
    gated = F.when(json_col.rlike(_CANDIDATE_RE), json_col)
    return F.coalesce(_degraded_udf()(gated), F.lit(False))


# -- on_precision_loss="exact": exact-arithmetic re-validation ---------------
#
# The third treatment of the parse-level precision limit: instead of
# annotating (observability) or rejecting (conservative), DEGRADED rows
# are re-validated with exact arithmetic and their verdict REPLACES the
# double-view plan verdict — the engine analog of the reference's
# arbitrary-precision feature domain (lib.rs:769-792 BigInt/BigFraction;
# ext/numeric.rs:89-110), which validates beyond-double-precision
# numbers exactly where serde_json's default would round them.
#
# Kernel: the locally installed python-jsonschema (the same library the
# suite's 1,353 vendored cases are revalidated against — the repo's
# standing ground-truth oracle), fed an instance parsed from the RAW
# text with exact numerics:
#   - integer-form tokens -> Python int (arbitrary precision, exact)
#   - fraction/exponent-form tokens -> Decimal (exact); under drafts
#     >= 6 an integral Decimal becomes int so `type: integer` keeps its
#     zero-fractional-part semantics, while draft 4 keeps the Decimal
#     (fraction form is NOT an integer — 1.0 ∉ integer, matching
#     keywords/legacy/type_draft_4.rs and the engine's variant path)
#   - schema floats are rewritten to the Decimal of their SHORTEST-
#     DECIMAL rendering (Decimal(repr(x)) — see _exactify_schema), so
#     `const: 0.1` means one-tenth and Decimal-vs-float mixed
#     arithmetic (a TypeError in multipleOf's `instance % dB`) can
#     never occur.
#
# Cost discipline is unchanged: one pUDF whose input is NULLed by the
# same JVM regex prefilter, returning BOOL (exact verdict) for degraded
# rows and NULL for everything else, so the plan-side verdict is just
# coalesce(exact, plan_valid) with a single Arrow crossing.
#
# Scope (enforced with SchemaError at compile): options carrying
# engine-side custom Python semantics (custom_keywords, custom_formats,
# custom content encodings/media types) or the multipleOf reference
# quirk are refused in exact mode — the kernel decides by spec
# semantics and must not silently drop a custom assertion for exactly
# the rows the mode exists to get right.

_DRAFT_VALIDATOR_ATTR = {
    "4": "Draft4Validator", "6": "Draft6Validator", "7": "Draft7Validator",
    "2019-09": "Draft201909Validator", "2020-12": "Draft202012Validator",
    # the engine's PERMISSIVE superset dialect validates unknown
    # metaschemas with 2020-12 semantics (its reference analog buckets
    # Unknown ≈ 2020-12, compiler.rs); same here
    "permissive": "Draft202012Validator",
}


def _exactify_schema(node):
    """Recursively replace every float in the schema document with the
    Decimal of its SHORTEST-DECIMAL rendering (``Decimal(repr(x))`` —
    round-trips to the same float, so value-preserving in the literal
    sense): the schema author who wrote ``0.1`` meant one-tenth, which
    is also the reference's multipleOf semantics (BigFraction over
    shortest-decimal forms, ext/numeric.rs:62-86) and what makes
    ``const: 0.1`` match an instance token ``0.1`` parsed exactly.
    The earlier binary-expansion rewrite (``Decimal(0.1)`` =
    0.1000…0625) failed both: a degraded row with an unrelated
    ``const: 0.1`` field flipped invalid, and ``0.0075 multipleOf
    0.0001`` — valid per the official suite and this engine's rational
    kernel — failed in the exact kernel. Replacing floats with Decimal
    also keeps instance-Decimal vs schema-operand arithmetic
    TypeError-free (multipleOf's ``instance % dB``)."""
    if isinstance(node, float):
        return Decimal(repr(node))
    if isinstance(node, dict):
        return {k: _exactify_schema(v) for k, v in node.items()}
    if isinstance(node, list):
        return [_exactify_schema(v) for v in node]
    return node


def _build_exact_validator(schema, dialect_name: str, assert_formats: bool,
                           resources: dict, retriever, base_uri):
    import jsonschema

    cls = getattr(jsonschema, _DRAFT_VALIDATOR_ATTR[dialect_name])
    kwargs = {}
    if assert_formats:
        kwargs["format_checker"] = cls.FORMAT_CHECKER
    if resources or retriever is not None:
        import referencing
        import referencing.jsonschema  # noqa: F401 — registers dialects

        spec = referencing.jsonschema.specification_with(
            cls.META_SCHEMA.get("$schema",
                                "https://json-schema.org/draft/2020-12/"
                                "schema"))

        def _as_resource(doc):
            return referencing.Resource.from_contents(
                doc, default_specification=spec)

        # resource documents and retriever results are schema documents
        # too: exactify them exactly like the root, or floats reached
        # via $ref would keep binary-float semantics (wrong `const`
        # verdicts) and multipleOf would TypeError on Decimal % float
        reg = referencing.Registry(
            retrieve=(lambda uri: _as_resource(
                _exactify_schema(retriever(uri))))
            if retriever is not None else None)
        for uri, doc in (resources or {}).items():
            reg = reg.with_resource(uri, _as_resource(_exactify_schema(doc)))
        kwargs["registry"] = reg
    root = _exactify_schema(schema)
    if base_uri and isinstance(root, dict) and "$id" not in root:
        root = {**root, "$id": base_uri}
    return cls(root, **kwargs)


def _parse_exact(text: str, draft4_numbers: bool):
    def pf(tok: str):
        d = Decimal(tok)
        if not draft4_numbers and d == d.to_integral_value():
            return int(d)
        return d

    return json.loads(text, parse_float=pf)


# raised lazily inside the kernel UDF: python-jsonschema burns ~10
# frames per nesting level, so the interpreter default (1000) caps the
# kernel near ~100 levels — far below what the depth-exact mode exists
# to handle. (Reference parity note: serde_json itself refuses to parse
# >128 nesting levels without disable_recursion_limit, so documents in
# this regime are beyond the reference's own default domain.)
_KERNEL_RECURSION_LIMIT = 20_000


def _kernel_udf(schema, dialect_name: str, assert_formats: bool,
                draft4_numbers: bool, resources: dict, retriever,
                base_uri, require_degraded: bool):
    """The ONE exact-kernel pandas UDF (shared by both exact modes so
    fixes can't drift apart): NULL input → NULL; with require_degraded,
    rows whose numbers are all exactly stored → NULL (precision mode's
    in-UDF recheck under its superset prefilter); otherwise the
    python-jsonschema verdict on the exactly-parsed instance.
    RecursionError — from parse or validation, past the raised limit —
    is a kernel CAPACITY edge, not invalid JSON: conservatively False
    (never silently vacuous-true). Other parse failures stay NULL: the
    gate implies the variant parser accepted the text, but the two
    parsers' accepted grammars aren't bit-identical, and such rows
    belong to the plan's own 'json'-keyword verdict."""
    cell: list = []

    @F.pandas_udf("boolean")
    def kernel(texts: pd.Series) -> pd.Series:
        # raised BEFORE any _doc_degraded call so the degradation
        # recheck gives the same answer regardless of row order /
        # worker reuse (it used to ride on the first validator build)
        _raise_recursion_limit()

        def one(t):
            if t is None:
                return None
            if require_degraded and not _doc_degraded(t):
                return None
            if not cell:
                cell.append(_build_exact_validator(
                    schema, dialect_name, assert_formats, resources,
                    retriever, base_uri))
            try:
                inst = _parse_exact(t, draft4_numbers)
            except RecursionError:
                return False
            except Exception:  # noqa: BLE001 — grammar mismatch vs the
                return None    # variant parser: the 'json' keyword's row
            try:
                return bool(cell[0].is_valid(inst))
            except RecursionError:
                return False

        return pd.Series([one(t) for t in texts], dtype="object")

    return kernel


def exact_verdict_column(json_col: Column, schema, dialect_name: str,
                         assert_formats: bool, draft4_numbers: bool,
                         resources: dict | None = None, retriever=None,
                         base_uri=None,
                         parsed: Column | None = None) -> Column:
    """Nullable-boolean Column: the EXACT-arithmetic verdict for rows
    whose numbers the variant parser stores inexactly; NULL for every
    clean row (coalesce with the plan verdict downstream). Prefilter
    keeps non-candidate rows off the Arrow path entirely.

    `parsed` is the already-staged try_parse_json(json_col) when the
    caller has one. The gate requires it NOT NULL: the two parsers'
    accepted grammars differ (Python's json accepts Infinity/NaN,
    e.g. the output of json.dumps(float('inf'))), and a document the
    VARIANT parser rejects must keep the plan's invalid-JSON verdict —
    the exact kernel only ever overrides verdicts about numbers the
    engine parsed but stored lossily."""
    kernel = _kernel_udf(schema, dialect_name, assert_formats,
                         draft4_numbers, dict(resources or {}),
                         retriever, base_uri, require_degraded=True)
    if parsed is None:
        parsed = F.try_parse_json(json_col)
    gated = F.when(json_col.rlike(_CANDIDATE_RE) & parsed.isNotNull(),
                   json_col)
    return kernel(gated)


def exact_kernel_verdict_column(json_col: Column, gate: Column, schema,
                                dialect_name: str, assert_formats: bool,
                                draft4_numbers: bool,
                                resources: dict | None = None,
                                retriever=None, base_uri=None) -> Column:
    """Nullable-boolean Column: the exact-kernel verdict for rows where
    `gate` is true; NULL for every other row (coalesce with the plan
    verdict downstream). The same kernel as ``exact_verdict_column``
    but with a caller-supplied JVM-side gate and no in-UDF degradation
    recheck — used by ``on_depth_exhausted='exact'``, whose gate is the
    compiled depth-exhaustion signal: the kernel recurses at RUNTIME
    with no unroll limit (the analog of the reference's validator
    recursion, validator.rs:34-52), so its verdict is depth-faithful;
    it also parses numerics exactly, so a gated row can never regress
    to a lossy double view. Documents so deep they exhaust even the
    raised kernel recursion limit are conservatively rejected (see
    _kernel_udf)."""
    kernel = _kernel_udf(schema, dialect_name, assert_formats,
                         draft4_numbers, dict(resources or {}),
                         retriever, base_uri, require_degraded=False)
    return kernel(F.when(gate, json_col))
