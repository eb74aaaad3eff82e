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

__all__ = ["precision_degraded_column", "token_precision_degraded"]

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
    except Exception:  # noqa: BLE001 — malformed JSON is the 'json'
        return False   # keyword's problem, not a precision signal
    return any(token_precision_degraded(t) for t in toks)


_UDF_CACHE: list = []


def _degraded_udf():
    # created lazily: pandas_udf's DDL return type needs an active
    # SparkContext, which doesn't exist at import time
    if not _UDF_CACHE:
        @F.pandas_udf("boolean")
        def degraded(texts: pd.Series) -> pd.Series:
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
