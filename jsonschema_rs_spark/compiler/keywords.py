"""Keyword compilation: one builder per JSON Schema keyword.

Operator inventory mirrors the reference's keywords/ directory
(dispatch table at crates/jsonschema/src/keywords/mod.rs:254-510); each
builder maps a keyword onto the idiomatic Spark construct catalogued in
SURVEY.md §2 (Column predicates, higher-order functions over arrays,
struct field access). Rule priorities follow the reference's fail-fast
static cost ordering (keywords/mod.rs:184-252).

All builders compile AGAINST A SPARK DTYPE: because columns are typed,
type-applicability checks that the reference performs per instance
(JsonTypeSet bitsets, types.rs:90-216) resolve here at compile time —
a string keyword on a numeric column compiles to nothing, exactly as a
string keyword passes on a non-string instance.
"""

from __future__ import annotations

import json
import math
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jsonschema_rs_spark.compiler.nodes import (
    Node,
    Rule,
    concat_errors,
    empty_errors,
)
from jsonschema_rs_spark.errors import SchemaError
from jsonschema_rs_spark.regex.ecma import ecma_to_java, literal_prefix

INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
FRACTIONAL = (T.FloatType, T.DoubleType, T.DecimalType)


def is_numeric(dt: T.DataType) -> bool:
    return isinstance(dt, INTEGRAL + FRACTIONAL)


def static_json_types(dt: T.DataType) -> set[str]:
    """JSON types a NON-NULL value of this Spark dtype can take."""
    if isinstance(dt, T.StringType):
        return {"string"}
    if isinstance(dt, T.BooleanType):
        return {"boolean"}
    if isinstance(dt, INTEGRAL):
        return {"integer", "number"}
    if isinstance(dt, FRACTIONAL):
        # a float with zero fraction IS an integer in >=draft6
        # (reference: types.rs:186-204); decided at runtime
        return {"number", "integer"}
    if isinstance(dt, T.ArrayType):
        return {"array"}
    if isinstance(dt, (T.StructType, T.MapType)):
        return {"object"}
    if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType, T.BinaryType)):
        return {"string"}
    return set()


def _is_bignum(value: Any) -> bool:
    """Integer literal beyond int64 — py4j renders it as a digit string
    Long.parseLong rejects, so F.lit/isin NumberFormatException at
    compile. Every such literal routes through an exact-domain check
    (_value_matches_dtype) + a dtype-native re-expression
    (_plain_scalar) instead."""
    return (isinstance(value, int) and not isinstance(value, bool)
            and not (-2 ** 63 <= value < 2 ** 63))


def _plain_scalar(value: Any, dt: T.DataType) -> Any:
    """Re-express a scalar so py4j can ship it exactly for this dtype.
    Only called after _value_matches_dtype verified the dtype's exact
    domain contains the value (so float(value)/Decimal(value) are
    value-preserving here, never rounding)."""
    if _is_bignum(value):
        if isinstance(dt, T.DecimalType):
            from decimal import Decimal
            return Decimal(value)
        return float(value)
    if isinstance(value, float) and math.isfinite(value) \
            and abs(value) >= 2 ** 53 \
            and isinstance(dt, (INTEGRAL, T.DecimalType)):
        # ship the float's exact integer so the compare stays in the
        # column's exact domain (see _value_matches_dtype)
        mi = int(value)
        if isinstance(dt, T.DecimalType):
            from decimal import Decimal
            return Decimal(mi)
        return mi
    return value


def _contains_map(dt: T.DataType) -> bool:
    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.StructType):
        return any(_contains_map(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return _contains_map(dt.elementType)
    return False


def _orderable(c: Column, dt: T.DataType) -> Column:
    """Recursively rewrite a value into an ORDERABLE/comparable shape:
    maps become key-sorted entry arrays (keys are unique, so the sort is
    total without comparing values). Spark refuses `=`/array_distinct
    on MAP types outright, so const/enum/uniqueItems on dtypes
    containing maps go through this rewrite; order-insensitive map
    equality matches JSON object semantics. Identity for map-free
    dtypes (callers skip it via _contains_map)."""
    if isinstance(dt, T.MapType):
        return F.array_sort(F.transform(
            F.map_entries(c),
            lambda e: F.struct(
                e["key"].alias("key"),
                _orderable(e["value"], dt.valueType).alias("value"))))
    if isinstance(dt, T.StructType):
        return F.when(c.isNull(), F.lit(None)).otherwise(F.struct(
            *[_orderable(c[f.name], f.dataType).alias(f.name)
              for f in dt.fields]))
    if isinstance(dt, T.ArrayType):
        return F.transform(c, lambda e: _orderable(e, dt.elementType))
    return c


def lit_for(value: Any, dt: T.DataType) -> Column:
    """Build a deep literal Column of the given dtype from a JSON value."""
    if value is None:
        return F.lit(None).cast(dt)
    if isinstance(dt, T.StructType):
        if not isinstance(value, dict):
            return F.lit(None).cast(dt)
        return F.struct(
            *[lit_for(value.get(f.name), f.dataType).alias(f.name) for f in dt.fields]
        )
    if isinstance(dt, T.ArrayType):
        if not isinstance(value, list):
            return F.lit(None).cast(dt)
        if not value:
            return F.expr("array()").cast(dt)
        return F.array(*[lit_for(v, dt.elementType) for v in value])
    if isinstance(dt, T.MapType):
        if not isinstance(value, dict):
            return F.lit(None).cast(dt)
        kv: list[Column] = []
        for k, v in value.items():
            kv.append(F.lit(k))
            kv.append(lit_for(v, dt.valueType))
        return F.create_map(*kv) if kv else F.expr("map()").cast(dt)
    return F.lit(_plain_scalar(value, dt))


def _value_matches_dtype(value: Any, dt: T.DataType) -> bool:
    """Could a non-null column of dtype `dt` ever deep-equal `value`?"""
    if value is None:
        return False
    if isinstance(value, bool):
        return isinstance(dt, T.BooleanType)
    if isinstance(value, (int, float)):
        if not is_numeric(dt):
            return False
        if isinstance(value, float) and math.isfinite(value) \
                and abs(value) >= 2 ** 53 \
                and isinstance(dt, (INTEGRAL, T.DecimalType)):
            # a FLOAT literal at/beyond 2^53 is an integer; an exact-
            # domain column equals it iff the domain contains that exact
            # integer (promoting the column to double wrongly matched
            # const 1e16 against the long 9999999999999999)
            mi = int(value)
            if isinstance(dt, INTEGRAL):
                return -2 ** 63 <= mi < 2 ** 63
            return len(str(abs(mi))) <= dt.precision - dt.scale
        if _is_bignum(value):
            # typed columns carry EXACT values, so a beyond-int64
            # integer literal can only ever equal a value of a dtype
            # whose exact domain contains it (reference ext/numeric.rs
            # exact cross-type compare; serde's BigInt domain)
            if isinstance(dt, INTEGRAL):
                return False
            if isinstance(dt, T.DecimalType):
                return len(str(abs(value))) <= dt.precision - dt.scale
            try:
                f = float(value)
            except OverflowError:
                return False
            if isinstance(dt, T.FloatType):
                import struct
                try:
                    f = struct.unpack("f", struct.pack("f", f))[0]
                except OverflowError:  # beyond float32 range
                    return False
            return f == value  # Python cross-type compare is exact
        return True
    if isinstance(value, str):
        return isinstance(dt, (T.StringType, T.DateType, T.TimestampType,
                               T.TimestampNTZType))
    if isinstance(value, list):
        return isinstance(dt, T.ArrayType) and all(
            _value_matches_dtype(v, dt.elementType) for v in value
        )
    if isinstance(value, dict):
        if isinstance(dt, T.MapType):
            return all(_value_matches_dtype(v, dt.valueType) for v in value.values())
        if isinstance(dt, T.StructType):
            names = {f.name for f in dt.fields}
            return set(value).issubset(names)
        return False
    return False


# --------------------------------------------------------------------------
# scalar assertions (§2.1)
# --------------------------------------------------------------------------


def build_type(schema: dict, dt: T.DataType, ctx, sp: str) -> list[Rule]:
    tv = schema["type"]
    allowed = {tv} if isinstance(tv, str) else set(tv)
    bad = allowed - {"null", "boolean", "string", "array", "object", "number", "integer"}
    if bad:
        raise SchemaError(f"unknown type(s) {sorted(bad)}", sp + "/type")
    static = static_json_types(dt)
    if not static:  # exotic dtype — cannot assert, treat as annotation
        return []
    msg = f"expected type {sorted(allowed)}"
    # draft-4 integer (keywords/legacy/type_draft_4.rs:91-155): a float
    # is NEVER an integer, regardless of zero fraction — so a FRACTIONAL
    # dtype can only satisfy "integer" via "number" also being allowed.
    # (>=draft6: zero-fraction float IS an integer, checked at runtime.
    # The variant path cannot honor draft-4 here: Spark normalizes the
    # lexical form away — '1.0' parses to DECIMAL(1,0) — so the option
    # is typed-path-only; see errors.py.)
    d4 = getattr(ctx.options, "draft4_integer", False)
    if static <= allowed:
        # (for FRACTIONAL, static ⊆ allowed implies "number" ∈ allowed,
        # so no runtime integer check can be needed here)
        return []
    if static & allowed:
        if isinstance(dt, FRACTIONAL) and "integer" in allowed \
                and "number" not in allowed:
            if d4:
                return [Rule("type", sp + "/type", msg,
                             lambda c: F.lit(False), priority=1)]
            if isinstance(dt, T.DecimalType):
                # native decimal mod is exact; the double detour rounded
                # fractional parts away at |x| >= 2^53 (review find:
                # decimal(38,2) 10000000000000000.25 passed `integer`)
                pred = (lambda c: (c % F.lit(1)) == F.lit(0))
                return [Rule("type", sp + "/type", msg, pred, priority=1)]
            # pmod-1, not floor: floor(double) is LONG and overflows to
            # NULL at |x| >= 2^63 (1e100 IS a zero-fraction integer)
            # % not pmod: pmod's +divisor step rounds tiny negatives to 0
            pred = (lambda c: (c.cast("double") % F.lit(1.0)) == 0)
            return [Rule("type", sp + "/type", msg, pred, priority=1)]
        return []  # e.g. integral dtype, allowed contains integer or number
    # statically impossible: every non-null value fails
    return [Rule("type", sp + "/type", msg, lambda c: F.lit(False), priority=1)]


def build_const(schema: dict, dt: T.DataType, ctx, sp: str) -> list[Rule]:
    value = schema["const"]
    msg = "const mismatch"
    if not _value_matches_dtype(value, dt):
        return [Rule("const", sp + "/const", msg, lambda c: F.lit(False), priority=2)]
    lit = lit_for(value, dt)
    if _contains_map(dt):
        # Spark rejects `=` on MAP types (INVALID_ORDERING_TYPE) —
        # compare the key-sorted orderable rewrite instead
        return [Rule("const", sp + "/const", msg,
                     lambda c, lit=lit, dt=dt:
                     _orderable(c, dt) == _orderable(lit, dt),
                     priority=2)]
    return [Rule("const", sp + "/const", msg, lambda c, lit=lit: c == lit, priority=2)]


def build_enum(schema: dict, dt: T.DataType, ctx, sp: str) -> list[Rule]:
    values = schema["enum"]
    if not isinstance(values, list):
        raise SchemaError("enum must be an array", sp + "/enum")
    # type-bitset fast reject at compile time (reference: enum_.rs:62-71)
    compatible = [v for v in values if _value_matches_dtype(v, dt)]
    msg = "value not in enum"
    if not compatible:
        return [Rule("enum", sp + "/enum", msg, lambda c: F.lit(False), priority=2)]
    scalars = all(isinstance(v, (str, int, float, bool)) for v in compatible)
    if scalars and not isinstance(dt, (T.ArrayType, T.StructType, T.MapType)):
        shippable = [_plain_scalar(v, dt) for v in compatible]
        return [Rule("enum", sp + "/enum", msg,
                     lambda c, vals=shippable: c.isin(vals), priority=2)]
    lits = [lit_for(v, dt) for v in compatible]
    if _contains_map(dt):
        def pred(c: Column) -> Column:
            co = _orderable(c, dt)
            out = co == _orderable(lits[0], dt)
            for l in lits[1:]:
                out = out | (co == _orderable(l, dt))
            return out

        return [Rule("enum", sp + "/enum", msg, pred, priority=2)]

    def pred(c: Column) -> Column:
        out = c == lits[0]
        for l in lits[1:]:
            out = out | (c == l)
        return out

    return [Rule("enum", sp + "/enum", msg, pred, priority=2)]


def _num_rule(keyword: str, sp: str, msg: str, fn) -> Rule:
    return Rule(keyword, f"{sp}/{keyword}", msg, fn, priority=3)


def _big_bound_pred(dt: T.DataType, m: int, kind: str):
    """Exact ordering predicate `c <kind> m` (kind in ge/gt/le/lt) for a
    beyond-int64 integer bound over a numeric typed column — F.lit(m)
    used to NumberFormatException at compile. Integral and decimal
    columns have bounded exact domains, so an out-of-domain bound
    collapses statically and an in-domain decimal bound ships as a
    decimal literal; float/double columns use a rounding-direction-
    adjusted double compare: by round-to-nearest no double lies strictly
    between float(m) and m, so e.g. `d >= m` ⇔ `d > float(m)` whenever
    float(m) < m (saturating to ±inf past double range: `minimum:
    10**400` admits only +inf)."""
    admits_large = kind in ("ge", "gt")
    if isinstance(dt, INTEGRAL) or isinstance(dt, T.DecimalType):
        if isinstance(dt, T.DecimalType):
            digits = len(str(abs(m)))
            if digits <= dt.precision - dt.scale:
                from decimal import Decimal
                lit = F.lit(Decimal(m))
                return {"ge": lambda c: c >= lit, "gt": lambda c: c > lit,
                        "le": lambda c: c <= lit,
                        "lt": lambda c: c < lit}[kind]
        verdict = (m < 0) == admits_large
        return lambda c, v=verdict: F.lit(v)
    from jsonschema_rs_spark.compiler.variant import _schema_double
    fm = _schema_double(m)
    if fm == m:  # exactly double-representable: plain compare
        lit = F.lit(fm)
        return {"ge": lambda c: c >= lit, "gt": lambda c: c > lit,
                "le": lambda c: c <= lit, "lt": lambda c: c < lit}[kind]
    lit = F.lit(fm)
    if fm < m:
        return {"ge": lambda c: c > lit, "gt": lambda c: c > lit,
                "le": lambda c: c <= lit, "lt": lambda c: c <= lit}[kind]
    return {"ge": lambda c: c >= lit, "gt": lambda c: c >= lit,
            "le": lambda c: c < lit, "lt": lambda c: c < lit}[kind]


def build_bounds(schema: dict, dt: T.DataType, ctx, sp: str) -> list[Rule]:
    if not is_numeric(dt):
        return []

    def _pred(kind: str, m):
        if _is_bignum(m):
            return _big_bound_pred(dt, m, kind)
        if isinstance(m, float) and math.isfinite(m) \
                and not m.is_integer() \
                and isinstance(dt, (INTEGRAL, T.DecimalType)):
            # non-integer FLOAT bound on an exact-domain column: the
            # plain double compare promoted the column to double and
            # rounded high-precision values before comparing (review
            # find: decimal(38,19) 0.3000000000000000004 passed
            # maximum 0.3). The column's grid has step 10^-scale, and
            # no grid value lies strictly between floor/ceil of the
            # bound's EXACT binary value at that scale — so quantize
            # the bound with the right direction and compare exactly.
            from decimal import (ROUND_CEILING, ROUND_FLOOR, Decimal,
                                 localcontext)
            scale = dt.scale if isinstance(dt, T.DecimalType) else 0
            with localcontext() as lc:
                lc.prec = 1200  # binary expansions reach ~767 digits
                E = Decimal(m)
                q = Decimal(1).scaleb(-scale)
                ceil_e = E.quantize(q, rounding=ROUND_CEILING)
                floor_e = E.quantize(q, rounding=ROUND_FLOOR)
            digits = max(len(ceil_e.as_tuple().digits),
                         len(floor_e.as_tuple().digits))
            if digits <= 38:
                on_grid = ceil_e == floor_e

                def L(d):
                    return F.lit(int(d)) if isinstance(dt, INTEGRAL) \
                        else F.lit(d)

                if kind == "ge":
                    return lambda c, l=L(ceil_e): c >= l
                if kind == "gt":
                    return (lambda c, l=L(ceil_e): c > l) if on_grid \
                        else (lambda c, l=L(ceil_e): c >= l)
                if kind == "le":
                    return lambda c, l=L(floor_e): c <= l
                if kind == "lt":
                    return (lambda c, l=L(floor_e): c < l) if on_grid \
                        else (lambda c, l=L(floor_e): c <= l)
            # bound too wide for a decimal literal at this scale: the
            # double compare is only wrong within its rounding shell
        if isinstance(m, float) and m.is_integer() \
                and abs(m) >= 2 ** 53 \
                and isinstance(dt, (INTEGRAL, T.DecimalType)):
            # FLOAT literal at/beyond 2^53 on an exact-domain column:
            # every finite double there is an integer, and promoting the
            # column to double loses exactness (`minimum: 1e16` wrongly
            # admitted the long 9999999999999999 — the reference
            # compares the f64 against the exact value,
            # ext/numeric.rs). Compare against the literal's exact
            # integer instead; beyond int64 the big-bound ladder
            # handles domain collapse / decimal literals.
            mi = int(m)
            if _is_bignum(mi):
                return _big_bound_pred(dt, mi, kind)
            lit = F.lit(mi)
            return {"ge": lambda c: c >= lit, "gt": lambda c: c > lit,
                    "le": lambda c: c <= lit,
                    "lt": lambda c: c < lit}[kind]
        return {"ge": lambda c: c >= F.lit(m), "gt": lambda c: c > F.lit(m),
                "le": lambda c: c <= F.lit(m),
                "lt": lambda c: c < F.lit(m)}[kind]

    rules = []
    if "minimum" in schema:
        m = schema["minimum"]
        rules.append(_num_rule("minimum", sp, f"value < {m}", _pred("ge", m)))
    if "maximum" in schema:
        m = schema["maximum"]
        rules.append(_num_rule("maximum", sp, f"value > {m}", _pred("le", m)))
    em = schema.get("exclusiveMinimum")
    if isinstance(em, (int, float)) and not isinstance(em, bool):
        rules.append(_num_rule("exclusiveMinimum", sp, f"value <= {em}",
                               _pred("gt", em)))
    ex = schema.get("exclusiveMaximum")
    if isinstance(ex, (int, float)) and not isinstance(ex, bool):
        rules.append(_num_rule("exclusiveMaximum", sp, f"value >= {ex}",
                               _pred("lt", ex)))
    # draft-4 boolean form: exclusiveMinimum: true modifies minimum
    if schema.get("exclusiveMinimum") is True and "minimum" in schema:
        m = schema["minimum"]
        rules = [r for r in rules if r.keyword != "minimum"]
        rules.append(_num_rule("minimum", sp, f"value <= {m}",
                               _pred("gt", m)))
    if schema.get("exclusiveMaximum") is True and "maximum" in schema:
        m = schema["maximum"]
        rules = [r for r in rules if r.keyword != "maximum"]
        rules.append(_num_rule("maximum", sp, f"value >= {m}",
                               _pred("lt", m)))
    return rules


def build_multiple_of(schema: dict, dt: T.DataType, ctx, sp: str) -> list[Rule]:
    rules = _build_multiple_of_rules(schema, dt, ctx, sp)
    m = schema["multipleOf"]
    if (rules
            and getattr(ctx.options, "multiple_of_semantics",
                        "spec") == "reference"
            and isinstance(m, float) and not m.is_integer()):
        # reference-quirk mode (ext/numeric.rs:62-86
        # is_multiple_of_float): a positive FRACTIONAL divisor fast-
        # bails `value < multiple -> false`, which rejects every
        # negative value. Spec semantics (the default) judge by exact
        # rational divisibility like python-jsonschema; this opt-in
        # pins migration parity with the reference crate instead.
        # Equivalent closed form: exact-multiple AND value >= 0 (zero
        # passes both ways; 0 < value < multiple is already non-
        # multiple under the exact kernel).
        for r in rules:
            r.pred = (lambda p: lambda c: p(c) & (c >= 0))(r.pred)
    return rules


def _build_multiple_of_rules(schema: dict, dt: T.DataType, ctx,
                             sp: str) -> list[Rule]:
    if not is_numeric(dt):
        return []
    m = schema["multipleOf"]
    if not isinstance(m, (int, float)) or isinstance(m, bool) or m <= 0:
        raise SchemaError("multipleOf must be a positive number", sp + "/multipleOf")
    msg = f"not a multiple of {m}"
    # divisors whose decimal form the JVM can't hold as a literal
    # (integers beyond LONG, odd parts beyond LONG, magnitudes beyond
    # double) must not surface as raw OverflowError/IllegalArgument at
    # compile (ADVICE r3) — probe once here and route them below
    try:
        from jsonschema_rs_spark.functions.numerics import _divisor_parts

        t_prime = _divisor_parts(m)[0]
    except (ValueError, ArithmeticError) as e:
        raise SchemaError(f"invalid multipleOf divisor {m!r}: {e}",
                          sp + "/multipleOf") from e
    if isinstance(dt, INTEGRAL) and isinstance(m, int):
        if m < 2 ** 63:
            return [_num_rule("multipleOf", sp, msg,
                              lambda c, m=m: c % F.lit(m) == 0)]
        # divisor exceeds every int64: only 0 is a multiple (the
        # reference's BigInt validator reaches the same verdicts,
        # ext/numeric.rs:95-117)
        return [_num_rule("multipleOf", sp, msg, lambda c: c == 0)]
    if isinstance(m, float) and m.is_integer() and isinstance(dt, INTEGRAL):
        mi = int(m)
        if mi < 2 ** 63:
            return [_num_rule("multipleOf", sp, msg,
                              lambda c, mi=mi: c % F.lit(mi) == 0)]
        return [_num_rule("multipleOf", sp, msg, lambda c: c == 0)]
    if isinstance(m, float) and not m.is_integer() and math.isfinite(m) \
            and isinstance(dt, INTEGRAL):
        # exact, no double detour (c.cast('double') rounded |c| >= 2^53
        # before the kernel ran — review find): with the divisor's
        # shortest-decimal form t·10^-f, an integer c is a multiple iff
        # t | c·10^f iff t2 | c where t2 = t / gcd(t, 10^f) (the 2s and
        # 5s cancel into 10^f; what remains is coprime to it) — one
        # plain long mod
        from decimal import Decimal
        md = Decimal(repr(m))
        f = max(0, -md.as_tuple().exponent)
        t = int(md.scaleb(f))
        t2 = t // math.gcd(t, 10 ** f)
        if t2 >= 2 ** 63:  # unreachable for shortest-decimal doubles
            return [_num_rule("multipleOf", sp, msg, lambda c: c == 0)]
        return [_num_rule("multipleOf", sp, msg,
                          lambda c, t2=t2: c % F.lit(t2) == 0)]
    if (not isinstance(m, int) or abs(m) < 2 ** 53) \
            and float(m).is_integer() and not isinstance(dt, T.DecimalType):
        # integer divisor over a float/double column: IEEE fmod of
        # doubles is EXACT (no rounding step), so plain double pmod
        # decides multiple-ness correctly for every double value — no
        # BigDecimal cost (measured 1.6x on val_lineitem_flag).
        # Decimal columns keep the decimal path below (exact natively);
        # int divisors at/above 2^53 would silently round in float(m)
        # (ADVICE r2) so they fall through to the exact paths below.
        mf = float(m)
        return [_num_rule("multipleOf", sp, msg,
                          lambda c, mf=mf:
                          (c.cast("double") % F.lit(mf)) == 0)]
    if isinstance(dt, T.DecimalType):
        # decimal-typed columns: native decimal pmod is already exact
        # rational arithmetic at the column's scale
        from decimal import Decimal

        mdec = Decimal(str(m))
        if mdec.adjusted() >= 38:
            # divisor magnitude exceeds every decimal(38,*) value:
            # only 0 is a multiple (a literal this wide cannot be lit())
            return [_num_rule("multipleOf", sp, msg, lambda c: c == 0)]
        return [_num_rule("multipleOf", sp, msg,
                          lambda c, mdec=mdec:
                          F.pmod(c, F.lit(mdec)) == F.lit(0))]
    in_hof = getattr(ctx, "hof_depth", 0) > 0
    if isinstance(m, int) and t_prime >= 2 ** 63:
        # huge integer divisor whose odd part exceeds LONG (e.g. a
        # 100-digit prime, or 10**400): the codegen kernel can't embed
        # t' — exact Fraction verdicts via the Arrow-batched fallback
        if in_hof:
            # no Python UDF inside HOF lambdas: decide by fmod on the
            # ROUNDED divisor, or False past double range — documented
            # corner deviation (nested huge divisors only), mirroring
            # the variant path's in_hof branch
            try:
                mf = float(m)
                return [_num_rule("multipleOf", sp, msg,
                                  lambda c, mf=mf:
                                  (c.cast("double") % F.lit(mf)) == 0)]
            except OverflowError:
                return [_num_rule("multipleOf", sp, msg,
                                  lambda c: F.lit(False))]
        from jsonschema_rs_spark.functions.numerics import (
            fraction_multiple_of_udf,
        )

        def frac_pred(c, m=m):
            d = c.cast("double")
            ok = fraction_multiple_of_udf(m)(d)
            return F.when(d.isNull(), F.lit(None).cast("boolean")) \
                .otherwise(F.coalesce(ok, F.lit(False)))

        return [_num_rule("multipleOf", sp, msg, frac_pred)]
    # float path: bit-exact parity with the reference's BigFraction
    # kernel (ext/numeric.rs:62-86) — exact rational divisibility of the
    # value's shortest-decimal form, fully JVM-side (functions/numerics)
    # except the rare non-shortest-rendering rows, which take the
    # Fraction fallback inside exact_multiple_of_double (disabled inside
    # HOF lambdas where a pandas UDF is illegal — documented corner
    # deviation for >15-sig-digit renderings nested in arrays/maps)
    from jsonschema_rs_spark.functions.numerics import (
        exact_multiple_of_double,
    )

    return [_num_rule("multipleOf", sp, msg,
                      lambda c, m=m, ff=not in_hof:
                      exact_multiple_of_double(c.cast("double"), m,
                                               fraction_fallback=ff))]


# --------------------------------------------------------------------------
# string assertions (§2.2)
# --------------------------------------------------------------------------


def build_string_rules(schema: dict, dt: T.DataType, ctx, sp: str) -> list[Rule]:
    if not isinstance(dt, T.StringType):
        return []
    rules = []
    if "minLength" in schema:
        n = schema["minLength"]
        # F.length counts Unicode code points (UTF8String.numChars), matching
        # the reference's bytecount::num_chars (keywords/min_length.rs:46)
        rules.append(Rule("minLength", sp + "/minLength", f"shorter than {n}",
                          lambda c, n=n: F.length(c) >= F.lit(n), priority=4))
    if "maxLength" in schema:
        n = schema["maxLength"]
        rules.append(Rule("maxLength", sp + "/maxLength", f"longer than {n}",
                          lambda c, n=n: F.length(c) <= F.lit(n), priority=4))
    if "pattern" in schema:
        pat = schema["pattern"]
        prefix = literal_prefix(pat)
        msg = f"does not match pattern {pat!r}" if ctx.options.mask is None else \
            f"does not match pattern {ctx.options.mask}"
        if prefix is not None and pat == "^" + prefix:
            # anchored-literal fast path (reference: pattern.rs:16)
            rules.append(Rule("pattern", sp + "/pattern", msg,
                              lambda c, prefix=prefix: c.startswith(prefix), priority=6))
        else:
            jpat = ctx.regex(pat)
            rules.append(Rule("pattern", sp + "/pattern", msg,
                              lambda c, jpat=jpat: c.rlike(jpat), priority=6))
    # validate_formats=None → draft-based default: 4/6/7 assert format
    # (reference compiler.rs:271-276 validates_formats_by_default)
    _vf = ctx.options.validate_formats
    if _vf is None:
        _vf = ctx.dialect.formats_assert_by_default
    if "format" in schema and _vf:
        from jsonschema_rs_spark.functions.formats import format_rule

        r = format_rule(schema["format"], ctx, sp)
        if r is not None:
            rules.append(r)
    if "contentEncoding" in schema or "contentMediaType" in schema:
        from jsonschema_rs_spark.functions.formats import content_rules

        rules.extend(content_rules(schema, ctx, sp))
    return rules


# --------------------------------------------------------------------------
# array applicators (§2.4) — the spans column path
# --------------------------------------------------------------------------


def build_array_rules(schema: dict, dt: T.DataType, ctx, sp: str,
                      compile_node) -> list[Rule]:
    if not isinstance(dt, T.ArrayType):
        return []
    et = dt.elementType
    rules: list[Rule] = []
    if "minItems" in schema:
        n = schema["minItems"]
        rules.append(Rule("minItems", sp + "/minItems", f"fewer than {n} items",
                          lambda c, n=n: F.size(c) >= F.lit(n), priority=5))
    if "maxItems" in schema:
        n = schema["maxItems"]
        rules.append(Rule("maxItems", sp + "/maxItems", f"more than {n} items",
                          lambda c, n=n: F.size(c) <= F.lit(n), priority=5))
    if schema.get("uniqueItems") is True:
        # deep struct equality is native in Spark; array_distinct hashes —
        # the reference's adaptive pairwise/hash strategy (unique_items.rs:67)
        # is subsumed by the JVM kernel. Map-bearing element types go
        # through the key-sorted orderable rewrite (array_distinct
        # refuses MAP ordering; JSON object equality is key-order-
        # insensitive anyway)
        if _contains_map(et):
            rules.append(Rule(
                "uniqueItems", sp + "/uniqueItems", "duplicate items",
                lambda c, et=et: F.size(c) == F.size(F.array_distinct(
                    F.transform(c, lambda e: _orderable(e, et)))),
                priority=20))
        else:
            rules.append(Rule(
                "uniqueItems", sp + "/uniqueItems", "duplicate items",
                lambda c: F.size(c) == F.size(F.array_distinct(c)),
                priority=20))

    items = schema.get("items")
    prefix_schemas = None
    rest_schema = None
    if isinstance(items, list):  # draft 4-7 positional form
        prefix_schemas = items
        rest_schema = schema.get("additionalItems")
        prefix_kw = "items"  # report paths under the REAL keyword
    else:
        prefix_schemas = schema.get("prefixItems")
        rest_schema = items
        prefix_kw = "prefixItems"
        if rest_schema is None and "additionalItems" in schema and prefix_schemas:
            rest_schema = schema["additionalItems"]

    nprefix = len(prefix_schemas) if prefix_schemas else 0

    if prefix_schemas:
        subnodes = [
            compile_node(s, et, ctx, f"{sp}/{prefix_kw}/{i}")
            for i, s in enumerate(prefix_schemas)
        ]

        def prefix_pred(c: Column) -> Column:
            out = F.lit(True)
            for i, sub in enumerate(subnodes):
                el = F.element_at(c, i + 1)
                out = out & F.when(F.size(c) > i, sub.valid(el)).otherwise(True)
            return out

        def prefix_errors(c: Column, p: Column) -> Column:
            parts = []
            for i, sub in enumerate(subnodes):
                el = F.element_at(c, i + 1)
                parts.append(
                    F.when(
                        F.size(c) > i,
                        sub.errors(el, F.concat(p, F.lit(f"/{i}"))),
                    ).otherwise(empty_errors())
                )
            return concat_errors(parts)

        rules.append(Rule(prefix_kw, f"{sp}/{prefix_kw}",
                          "prefix item invalid",
                          prefix_pred, errors_fn=prefix_errors,
                          priority=30))

    if rest_schema is not None and rest_schema is not True:
        if rest_schema is False:
            kw = "items" if not isinstance(items, list) else "additionalItems"
            rules.append(Rule(kw, f"{sp}/{kw}", f"more than {nprefix} items allowed",
                              lambda c, nprefix=nprefix: F.size(c) <= F.lit(nprefix), priority=5))
        else:
            # the subnode's Columns render inside F.forall/F.transform
            # lambdas — no Python UDF may be embedded there
            with ctx.in_hof():
                sub = compile_node(rest_schema, et, ctx, sp + "/items")
            if sub.rules:
                if nprefix == 0:
                    def items_pred(c: Column) -> Column:
                        return F.forall(c, lambda x: sub.valid(x))

                    def items_errors(c: Column, p: Column) -> Column:
                        return F.flatten(
                            # index-aware transform: error paths carry the
                            # element position, built only on failure
                            # (lazy paths — reference paths.rs:35)
                            _transform_idx(
                                c,
                                lambda x, i: sub.errors(
                                    x, F.concat(p, F.lit("/"), i.cast("string"))
                                ),
                            )
                        )
                else:
                    def items_pred(c: Column) -> Column:
                        rest = F.slice(
                            c, nprefix + 1,
                            F.greatest(F.size(c) - nprefix, F.lit(0)),
                        )
                        return F.forall(rest, lambda x: sub.valid(x))

                    def items_errors(c: Column, p: Column) -> Column:
                        rest = F.slice(
                            c, nprefix + 1,
                            F.greatest(F.size(c) - nprefix, F.lit(0)),
                        )
                        return F.flatten(
                            _transform_idx(
                                rest,
                                lambda x, i: sub.errors(
                                    x,
                                    F.concat(p, F.lit("/"),
                                             (i + nprefix).cast("string")),
                                ),
                            )
                        )

                rules.append(Rule("items", sp + "/items", "item invalid",
                                  items_pred, errors_fn=items_errors, priority=30))

    if "contains" in schema or "minContains" in schema or "maxContains" in schema:
        with ctx.in_hof():  # applied per element in F.filter/F.exists
            csub = compile_node(schema.get("contains", True), et, ctx,
                                sp + "/contains")
        min_c = schema.get("minContains", 1)
        max_c = schema.get("maxContains")

        def match_count(c: Column) -> Column:
            return F.size(F.filter(c, lambda x: csub.valid(x)))

        if "contains" in schema:
            if min_c == 1 and max_c is None:
                rules.append(Rule("contains", sp + "/contains",
                                  "no item matches contains",
                                  lambda c, csub=csub: F.exists(c, lambda x: csub.valid(x)),
                                  priority=25))
            else:
                if min_c > 0:
                    rules.append(Rule("minContains", sp + "/minContains",
                                      f"fewer than {min_c} matching items",
                                      lambda c, min_c=min_c: match_count(c) >= F.lit(min_c),
                                      priority=25))
                if max_c is not None:
                    rules.append(Rule("maxContains", sp + "/maxContains",
                                      f"more than {max_c} matching items",
                                      lambda c, max_c=max_c: match_count(c) <= F.lit(max_c),
                                      priority=25))
    return rules


def _transform_idx(c: Column, fn) -> Column:
    return F.transform(c, lambda x, i: fn(x, i))


# --------------------------------------------------------------------------
# object applicators (§2.3): struct columns (static) and map columns (dynamic)
# --------------------------------------------------------------------------


def build_object_rules(schema: dict, dt: T.DataType, ctx, sp: str,
                       compile_node) -> list[Rule]:
    if isinstance(dt, T.StructType):
        return _struct_object_rules(schema, dt, ctx, sp, compile_node)
    if isinstance(dt, T.MapType):
        return _map_object_rules(schema, dt, ctx, sp, compile_node)
    return []


def _struct_object_rules(schema: dict, dt: T.StructType, ctx, sp: str,
                         compile_node) -> list[Rule]:
    rules: list[Rule] = []
    fields = {f.name: f.dataType for f in dt.fields}

    req = schema.get("required")
    if req:
        missing_static = [k for k in req if k not in fields]
        for k in req:
            if k in fields:
                rules.append(Rule(
                    "required", sp + "/required",
                    f"missing required property {k!r}",
                    (lambda c, k=k: c.getField(k).isNotNull()),
                    priority=7,
                    value_message=f"{json.dumps(k)} is a required property",
                    headless=True,
                ))
        for k in missing_static:
            rules.append(Rule("required", sp + "/required",
                              f"missing required property {k!r}",
                              lambda c: F.lit(False), priority=7,
                              value_message=f"{json.dumps(k)} "
                                            "is a required property",
                              headless=True))

    props = schema.get("properties", {})
    for name, sub in props.items():
        if name not in fields:
            continue  # absent property: subschema vacuously satisfied
        subnode = compile_node(sub, fields[name], ctx, f"{sp}/properties/{name}")
        if not subnode.rules:
            continue
        rules.append(Rule(
            "properties", f"{sp}/properties/{name}", f"property {name!r} invalid",
            (lambda c, n=name, s=subnode: s.valid(c.getField(n))),
            errors_fn=(lambda c, p, n=name, s=subnode:
                       s.errors(c.getField(n), F.concat(p, F.lit("/" + n)))),
            priority=40,
        ))

    for dep_kw in ("dependentRequired", "dependencies"):
        deps = schema.get(dep_kw)
        if not isinstance(deps, dict):
            continue
        for key, need in deps.items():
            if key not in fields:
                continue
            if isinstance(need, list):  # dependentRequired / array-form
                needed = [k for k in need if k in fields]
                absent = [k for k in need if k not in fields]

                def dep_pred(c: Column, key=key, needed=needed, absent=absent):
                    present = c.getField(key).isNotNull()
                    ok = F.lit(not absent)
                    for k in needed:
                        ok = ok & c.getField(k).isNotNull()
                    return F.when(present, ok).otherwise(True)

                rules.append(Rule(dep_kw, f"{sp}/{dep_kw}/{key}",
                                  f"dependency of {key!r} not satisfied",
                                  dep_pred, priority=45))
            elif isinstance(need, (dict, bool)):  # dependentSchemas / schema-form
                subnode = compile_node(need, dt, ctx, f"{sp}/{dep_kw}/{key}")
                rules.append(Rule(
                    dep_kw, f"{sp}/{dep_kw}/{key}",
                    f"dependent schema of {key!r} failed",
                    (lambda c, key=key, s=subnode:
                     F.when(c.getField(key).isNotNull(), s.valid(c)).otherwise(True)),
                    priority=60,
                ))

    dsch = schema.get("dependentSchemas")
    if isinstance(dsch, dict):
        for key, sub in dsch.items():
            if key not in fields:
                continue
            subnode = compile_node(sub, dt, ctx, f"{sp}/dependentSchemas/{key}")
            rules.append(Rule(
                "dependentSchemas", f"{sp}/dependentSchemas/{key}",
                f"dependent schema of {key!r} failed",
                (lambda c, key=key, s=subnode:
                 F.when(c.getField(key).isNotNull(), s.valid(c)).otherwise(True)),
                errors_fn=(lambda c, p, key=key, s=subnode:
                           F.when(c.getField(key).isNotNull(),
                                  s.errors(c, p)).otherwise(empty_errors())),
                priority=60,
            ))

    mn, mx = schema.get("minProperties"), schema.get("maxProperties")
    if mn is not None or mx is not None:
        def present_count(c: Column) -> Column:
            cnt = F.lit(0)
            for name in fields:
                cnt = cnt + c.getField(name).isNotNull().cast("int")
            return cnt

        if mn is not None:
            rules.append(Rule("minProperties", sp + "/minProperties",
                              f"fewer than {mn} properties",
                              lambda c, mn=mn: present_count(c) >= F.lit(mn), priority=8))
        if mx is not None:
            rules.append(Rule("maxProperties", sp + "/maxProperties",
                              f"more than {mx} properties",
                              lambda c, mx=mx: present_count(c) <= F.lit(mx), priority=8))

    # additionalProperties: a struct schema is closed — keys beyond the
    # dtype cannot exist, so `false` is statically satisfied for declared-
    # only data; patternProperties on struct: apply to matching field names
    pp = schema.get("patternProperties")
    if isinstance(pp, dict):
        # ctx.regex = the same ECMA→Java translation the map path and
        # string `pattern` use: raw re.compile crashed on valid ECMA
        # syntax (named groups) and matched with Python semantics
        # (review find). Name-vs-pattern decisions ride a constant
        # rlike over the literal field name — Catalyst folds it, so
        # the runtime plan is unchanged where the match is decidable.
        pp_java = {pat: ctx.regex(pat) for pat in pp}
        for pat, sub in pp.items():
            jp = pp_java[pat]
            for name in fields:
                subnode = compile_node(sub, fields[name], ctx,
                                       f"{sp}/patternProperties/{pat}")
                if not subnode.rules:
                    continue
                m = F.lit(name).rlike(jp)
                rules.append(Rule(
                    "patternProperties", f"{sp}/patternProperties/{pat}",
                    f"property {name!r} invalid",
                    (lambda c, n=name, s=subnode, m=m:
                     F.when(m, s.valid(c.getField(n))).otherwise(True)),
                    errors_fn=(lambda c, p, n=name, s=subnode, m=m:
                               F.when(m, s.errors(
                                   c.getField(n),
                                   F.concat(p, F.lit("/" + n))))
                               .otherwise(empty_errors())),
                    priority=41,
                ))

    ap = schema.get("additionalProperties")
    if ap is not None and ap is not True and ap is not False:
        # schema form: applies to struct fields not named in properties
        # and not matched by patternProperties (matches decided by the
        # same translated Java patterns as above, constant-folded)
        known = set(props)
        ap_java = [ctx.regex(p) for p in (pp or {})]
        for name in fields:
            if name in known:
                continue
            subnode = compile_node(ap, fields[name], ctx,
                                   sp + "/additionalProperties")
            if not subnode.rules:
                continue
            extra = F.lit(True)
            for jp in ap_java:
                extra = extra & ~F.lit(name).rlike(jp)
            rules.append(Rule(
                "additionalProperties", sp + "/additionalProperties",
                f"additional property {name!r} invalid",
                (lambda c, n=name, s=subnode, extra=extra:
                 F.when(extra, s.valid(c.getField(n))).otherwise(True)),
                errors_fn=(lambda c, p, n=name, s=subnode, extra=extra:
                           F.when(extra, s.errors(
                               c.getField(n),
                               F.concat(p, F.lit("/" + n))))
                           .otherwise(empty_errors())),
                priority=42,
            ))

    pn = schema.get("propertyNames")
    if pn is not None and pn is not True:
        # struct field names are compile-time constants — but evaluate
        # them with the REAL compiled subschema over a literal Column
        # (Catalyst constant-folds it), not a hand-rolled static
        # evaluator: the old _check_name_static mis-handled type LISTS
        # (every name failed) and silently PASSED any keyword it did
        # not model (not/anyOf/minProperties/...) — review find
        namenode = compile_node(pn if pn is not False else {"not": {}},
                                T.StringType(), ctx,
                                sp + "/propertyNames")
        for name in fields:
            cond = F.coalesce(namenode.valid(F.lit(name)), F.lit(False))
            rules.append(Rule(
                "propertyNames", sp + "/propertyNames",
                f"property name {name!r} invalid",
                # only fails when the property is actually present
                (lambda c, n=name, cond=cond:
                 c.getField(n).isNull() | cond),
                priority=9,
            ))
    return rules


def _map_object_rules(schema: dict, dt: T.MapType, ctx, sp: str,
                      compile_node) -> list[Rule]:
    rules: list[Rule] = []
    vt = dt.valueType

    req = schema.get("required")
    if req:
        for k in req:
            rules.append(Rule("required", sp + "/required",
                              f"missing required property {k!r}",
                              (lambda c, k=k: F.map_contains_key(c, F.lit(k))),
                              priority=7,
                              value_message=f"{json.dumps(k)} "
                                            "is a required property",
                              headless=True))

    props = schema.get("properties", {})
    known = list(props)
    for name, sub in props.items():
        subnode = compile_node(sub, vt, ctx, f"{sp}/properties/{name}")
        if not subnode.rules:
            continue
        rules.append(Rule(
            "properties", f"{sp}/properties/{name}", f"property {name!r} invalid",
            (lambda c, n=name, s=subnode: s.valid(c.getItem(n))),
            errors_fn=(lambda c, p, n=name, s=subnode:
                       s.errors(c.getItem(n), F.concat(p, F.lit("/" + n)))),
            priority=40,
        ))

    pp = schema.get("patternProperties") or {}
    pat_java = {pat: ctx.regex(pat) for pat in pp}
    for pat, sub in pp.items():
        with ctx.in_hof():  # applied per map entry inside F.forall
            subnode = compile_node(sub, vt, ctx,
                                   f"{sp}/patternProperties/{pat}")
        if not subnode.rules:
            continue
        jp = pat_java[pat]
        rules.append(Rule(
            "patternProperties", f"{sp}/patternProperties/{pat}",
            f"pattern property {pat!r} invalid",
            (lambda c, jp=jp, s=subnode: F.forall(
                F.map_entries(c),
                lambda e: F.when(e.getField("key").rlike(jp),
                                 s.valid(e.getField("value"))).otherwise(True))),
            priority=41,
        ))

    ap = schema.get("additionalProperties")
    if ap is not None and ap is not True:
        def is_additional(k: Column) -> Column:
            cond = ~k.isin(known) if known else F.lit(True)
            for jp in pat_java.values():
                cond = cond & ~k.rlike(jp)
            return cond

        if ap is False:
            rules.append(Rule(
                "additionalProperties", sp + "/additionalProperties",
                "additional properties not allowed",
                (lambda c: F.forall(F.map_keys(c),
                                    lambda k: ~is_additional(k))),
                priority=42,
            ))
        else:
            with ctx.in_hof():  # applied per map entry inside F.forall
                subnode = compile_node(ap, vt, ctx,
                                       sp + "/additionalProperties")
            rules.append(Rule(
                "additionalProperties", sp + "/additionalProperties",
                "additional property invalid",
                (lambda c, s=subnode: F.forall(
                    F.map_entries(c),
                    lambda e: F.when(is_additional(e.getField("key")),
                                     s.valid(e.getField("value"))).otherwise(True))),
                priority=42,
            ))

    pn = schema.get("propertyNames")
    if pn is not None and pn is not True:
        with ctx.in_hof():  # applied per key inside F.forall
            namenode = compile_node(pn if pn is not False else {"not": {}},
                                    T.StringType(), ctx,
                                    sp + "/propertyNames")
        rules.append(Rule(
            "propertyNames", sp + "/propertyNames", "property name invalid",
            (lambda c, s=namenode: F.forall(F.map_keys(c), lambda k: s.valid(k))),
            priority=9,
        ))

    mn, mx = schema.get("minProperties"), schema.get("maxProperties")
    if mn is not None:
        rules.append(Rule("minProperties", sp + "/minProperties",
                          f"fewer than {mn} properties",
                          lambda c, mn=mn: F.size(F.map_keys(c)) >= F.lit(mn), priority=8))
    if mx is not None:
        rules.append(Rule("maxProperties", sp + "/maxProperties",
                          f"more than {mx} properties",
                          lambda c, mx=mx: F.size(F.map_keys(c)) <= F.lit(mx), priority=8))

    deps = schema.get("dependentRequired")
    if isinstance(deps, dict):
        for key, need in deps.items():
            def dep_pred(c: Column, key=key, need=need):
                ok = F.lit(True)
                for k in need:
                    ok = ok & F.map_contains_key(c, F.lit(k))
                return F.when(F.map_contains_key(c, F.lit(key)), ok).otherwise(True)

            rules.append(Rule("dependentRequired", f"{sp}/dependentRequired/{key}",
                              f"dependency of {key!r} not satisfied",
                              dep_pred, priority=45))

    # draft-4-7 `dependencies` (both forms) and `dependentSchemas` —
    # the struct path handles these; maps silently ignored them
    # (review find: false negatives on map columns)
    for dep_kw in ("dependencies", "dependentSchemas"):
        deps = schema.get(dep_kw)
        if not isinstance(deps, dict):
            continue
        for key, need in deps.items():
            if dep_kw == "dependencies" and isinstance(need, list):
                def adep_pred(c: Column, key=key, need=tuple(need)):
                    ok = F.lit(True)
                    for k in need:
                        ok = ok & F.map_contains_key(c, F.lit(k))
                    return F.when(F.map_contains_key(c, F.lit(key)),
                                  ok).otherwise(True)

                rules.append(Rule(dep_kw, f"{sp}/{dep_kw}/{key}",
                                  f"dependency of {key!r} not satisfied",
                                  adep_pred, priority=45))
            elif isinstance(need, (dict, bool)):
                subnode = compile_node(need, dt, ctx, f"{sp}/{dep_kw}/{key}")
                rules.append(Rule(
                    dep_kw, f"{sp}/{dep_kw}/{key}",
                    f"dependent schema of {key!r} failed",
                    (lambda c, key=key, s=subnode:
                     F.when(F.map_contains_key(c, F.lit(key)),
                            s.valid(c)).otherwise(True)),
                    errors_fn=(lambda c, p, key=key, s=subnode:
                               F.when(F.map_contains_key(c, F.lit(key)),
                                      s.errors(c, p))
                               .otherwise(empty_errors())),
                    priority=60,
                ))
    return rules


# --------------------------------------------------------------------------
# composition (§2.5)
# --------------------------------------------------------------------------


def build_composition(schema: dict, dt: T.DataType, ctx, sp: str,
                      compile_node) -> list[Rule]:
    rules: list[Rule] = []

    if "allOf" in schema:
        subs = [compile_node(s, dt, ctx, f"{sp}/allOf/{i}")
                for i, s in enumerate(schema["allOf"])]

        def all_pred(c: Column, subs=subs) -> Column:
            out = F.lit(True)
            for s in subs:
                out = out & s.valid(c)
            return out

        def all_errors(c: Column, p: Column, subs=subs) -> Column:
            return concat_errors([s.errors(c, p) for s in subs])

        rules.append(Rule("allOf", sp + "/allOf", "allOf failed", all_pred,
                          errors_fn=all_errors, priority=70))

    if "anyOf" in schema:
        subs = [compile_node(s, dt, ctx, f"{sp}/anyOf/{i}")
                for i, s in enumerate(schema["anyOf"])]

        def any_pred(c: Column, subs=subs) -> Column:
            out = F.lit(False)
            for s in subs:
                out = out | s.valid(c)
            return out

        rules.append(Rule("anyOf", sp + "/anyOf",
                          "value matches none of the anyOf subschemas",
                          any_pred, priority=71))

    if "oneOf" in schema:
        subs = [compile_node(s, dt, ctx, f"{sp}/oneOf/{i}")
                for i, s in enumerate(schema["oneOf"])]

        def one_pred(c: Column, subs=subs) -> Column:
            cnt = F.lit(0)
            for s in subs:
                cnt = cnt + s.valid(c).cast("int")
            return cnt == 1

        rules.append(Rule("oneOf", sp + "/oneOf",
                          "value must match exactly one oneOf subschema",
                          one_pred, priority=72))

    if "not" in schema:
        sub = compile_node(schema["not"], dt, ctx, sp + "/not")
        rules.append(Rule("not", sp + "/not", "value matches forbidden schema",
                          lambda c, sub=sub: ~sub.valid(c), priority=73))

    if "if" in schema and ("then" in schema or "else" in schema):
        if_node = compile_node(schema["if"], dt, ctx, sp + "/if")
        then_node = compile_node(schema.get("then", True), dt, ctx, sp + "/then")
        else_node = compile_node(schema.get("else", True), dt, ctx, sp + "/else")

        def ite_pred(c: Column) -> Column:
            return F.when(if_node.valid(c), then_node.valid(c)) \
                .otherwise(else_node.valid(c))

        def ite_errors(c: Column, p: Column) -> Column:
            return F.when(if_node.valid(c), then_node.errors(c, p)) \
                .otherwise(else_node.errors(c, p))

        rules.append(Rule("if", sp + "/if", "conditional schema failed",
                          ite_pred, errors_fn=ite_errors, priority=74))
    return rules
