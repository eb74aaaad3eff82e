"""Exact rational multipleOf kernel — pure Column expressions, no UDF.

The reference decides ``multipleOf`` for non-integer divisors with an
exact fraction check over the operands' shortest-decimal forms
(ext/numeric.rs:62-86: ``BigFraction::from(value_f64) /
BigFraction::from(multiple)`` must have denominator 1; the fraction
crate builds the rational from the float's decimal rendering, which is
why the official suite's "0.0075 is a multiple of 0.0001" holds even
though the binary doubles' exact ratio is not an integer).

This module reproduces that kernel entirely JVM-side, inside
whole-stage codegen:

* ``CAST(double AS STRING)`` is the JVM's shortest-decimal rendering
  (Java ``Double.toString``: plain for 1e-3 <= |v| < 1e7, scientific
  outside, always a fraction dot) — parse it into an integer significand
  ``s`` (<= 18 digits, fits LONG) and a power-of-ten exponent ``e`` so
  that |v| = s * 10^e.
* the divisor is a compile-time literal: normalize ``Decimal(str(m))``
  to ``t * 10^f`` and factor ``t = t' * 2^a * 5^b`` with gcd(t',10)=1.
* v is a multiple of m  <=>  (s/t) * 10^(e-f) is an integer. Because
  10 is invertible mod t', the power of ten is irrelevant to the t'
  part, so the test decomposes into three LONG-arithmetic conditions:
      s % t' == 0
      v2(s) + (e-f) >= a      (enough factors of 2)
      v5(s) + (e-f) >= b      (enough factors of 5)
  v2 via the bit trick popcount((s & -s) - 1); v5 via a bounded
  power-table lookup (s < 10^18 never holds more than 5^25).

Known deviations (documented in COVERAGE.md):

* Java 17's Double.toString occasionally emits one more digit than the
  Ryu-shortest form the Rust fraction crate uses (e.g. the denormal
  5e-324 renders as "4.9E-324"). Since round 4 such rows are ROUTED
  AROUND the JVM rendering: values whose rendering exceeds the
  15-significant-digit safe zone, or that live in/near the subnormal
  range, go through an Arrow-batched Fraction fallback that uses
  Python's repr (true shortest decimal, Ryu-equivalent) — the codegen
  kernel is unchanged for normal values, and the Python side sees NULL
  for every hot-path row. Disable with fraction_fallback=False to keep
  the plan pure-codegen (restoring the documented deviation).
* The reference fast-bails ``value < multiple -> false``
  (ext/numeric.rs:71), which rejects every NEGATIVE value for a
  positive non-integer divisor (-0.02 would not be a multiple of 0.01).
  That contradicts the spec ("division ... results in an integer") and
  python-jsonschema; this engine deliberately validates negatives by
  |value|.
"""

from __future__ import annotations

from decimal import Decimal
from fractions import Fraction

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["exact_multiple_of_double", "exact_multiple_of_fraction",
           "fraction_multiple_of_udf"]

_POW5 = [5 ** j for j in range(1, 27)]  # 5^26 = 1.49e18 still fits LONG


def _divisor_parts(m) -> tuple[int, int, int, int, int]:
    """Literal divisor m -> (t_prime, a, b, f) with
    Decimal(str(m)) = t * 10^f, t = t' * 2^a * 5^b, gcd(t', 10) = 1."""
    dm = Decimal(str(m)).normalize()
    sign, digits, exp = dm.as_tuple()
    if sign or not dm:
        # zero check included: t=0 would make the factor loops below
        # spin forever (compile callers meta-validate multipleOf > 0
        # first, so this is a direct-caller guard)
        raise ValueError("multipleOf divisor must be positive")
    t = int("".join(map(str, digits)))
    f = int(exp)
    a = 0
    while t % 2 == 0:
        t //= 2
        a += 1
    b = 0
    while t % 5 == 0:
        t //= 5
        b += 1
    return t, a, b, f


def exact_multiple_of_double(d: Column, m,
                             fraction_fallback: bool = True) -> Column:
    """True iff the shortest-decimal rational of double ``d`` is an
    exact multiple of literal divisor ``m`` (non-integer decimal).

    NULL yields NULL (callers gate nulls); NaN/Infinity yield False.

    fraction_fallback (default True) routes rows whose JVM rendering
    falls outside the 15-significant-digit safe zone — or sits in/near
    the subnormal range, where Java 17's pre-Ryu Double.toString is
    known to emit a non-shortest form (e.g. 5e-324 -> "4.9E-324") —
    through an Arrow-batched Fraction kernel keyed on Python's repr
    (true shortest decimal). Hot-path rows cross the Arrow boundary as
    NULL, so Python does no work for them; the codegen kernel decides
    every normal value exactly as before. Set False for a pure-codegen
    plan with the documented corner deviation.
    """
    t_prime, a, b, f = _divisor_parts(m)

    astr = F.abs(d).cast("string")
    mant = F.split_part(astr, F.lit("E"), F.lit(1))
    has_e = astr.contains("E")
    expp = F.when(has_e,
                  F.split_part(astr, F.lit("E"), F.lit(2)).cast("int")) \
            .otherwise(F.lit(0))
    intpart = F.split_part(mant, F.lit("."), F.lit(1))
    fracpart = F.split_part(mant, F.lit("."), F.lit(2))
    s = F.concat(intpart, fracpart).try_cast("long")
    e = expp - F.length(fracpart)

    k = e - F.lit(f)
    ok_odd = F.pmod(s, F.lit(t_prime)) == 0 if t_prime > 1 \
        else F.lit(True)

    need2 = F.lit(a) - k
    # v2(s) >= n  <=>  s & (2^n - 1) == 0; the lookup index is clamped —
    # the need2 > 62 branch already decided False (s < 10^18 < 2^63)
    pow2 = F.array(*[F.lit(2 ** j) for j in range(1, 63)])
    mask2 = F.element_at(pow2, F.greatest(
        F.least(need2, F.lit(62)), F.lit(1)).cast("int")) - 1
    ok2 = (need2 <= 0) | ((need2 <= 62) & (s.bitwiseAND(mask2) == 0))

    need5 = F.lit(b) - k
    pow5 = F.array(*[F.lit(p) for p in _POW5])
    div5 = F.element_at(pow5, F.greatest(
        F.least(need5, F.lit(26)), F.lit(1)).cast("int"))
    ok5 = (need5 <= 0) | ((need5 <= 26) & (F.pmod(s, div5) == 0))

    # s.isNotNull() also rejects NaN/Infinity, whose renderings have no
    # digits to parse (and t'=1, a=b=0 divisors never consult s)
    kernel = s.isNotNull() & ok_odd & ok2 & ok5
    if fraction_fallback:
        # significant digits of the rendering (leading/trailing zeros
        # stripped); > 15 means the JVM form may not be shortest
        sig = F.length(F.regexp_replace(
            F.concat(intpart, fracpart), "^0+|0+$", ""))
        needs = s.isNotNull() & (d != 0) & \
            ((sig > 15) | (F.abs(d) < F.lit(1e-305)))
        frac = fraction_multiple_of_udf(m)(
            F.when(needs, d).otherwise(F.lit(None).cast("double")))
        kernel = F.when(needs, frac).otherwise(kernel)
    # zero is a multiple of anything; NaN/Infinity parse to NULL -> False
    res = F.when(d == 0, F.lit(True)).otherwise(
        F.coalesce(kernel, F.lit(False)))
    return F.when(d.isNull(), F.lit(None).cast("boolean")).otherwise(res)


def fraction_multiple_of_udf(m):
    """Arrow-batched exact-Fraction multipleOf for the rare rows the
    codegen kernel can't decide (non-shortest JVM renderings; integer
    divisors too large for LONG/decimal literals). The caller masks
    hot-path rows to NULL before the Arrow crossing, so the Python loop
    touches only the flagged rows; NULL (NaN after Arrow) returns NULL.
    Python's repr is the shortest-decimal rendering (Ryu-equivalent),
    matching the reference's fraction-crate construction
    (ext/numeric.rs:62-86) on exactly the corners Java 17 misses."""
    md = Fraction(Decimal(str(m)))

    @F.pandas_udf("boolean")
    def frac_mult(vs: pd.Series) -> pd.Series:
        def one(x):
            if x is None or x != x:  # masked row (NULL arrives as NaN)
                return None
            if x in (float("inf"), float("-inf")):
                return False
            if x == 0:
                return True
            q = Fraction(Decimal(repr(abs(float(x))))) / md
            return q.denominator == 1

        return pd.Series([one(x) for x in vs], dtype=object)

    return frac_mult


def exact_multiple_of_fraction(value: float, m) -> bool:
    """Driver-side oracle of the same semantics (shortest-decimal
    rationals via repr/str), for tests and DuckDB VALUES oracles."""
    if value == 0:
        return True
    if value != value or value in (float("inf"), float("-inf")):
        return False
    q = Fraction(Decimal(repr(abs(float(value))))) / \
        Fraction(Decimal(str(m)))
    return q.denominator == 1
