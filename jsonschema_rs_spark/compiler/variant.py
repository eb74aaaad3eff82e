"""Dynamic-JSON validation over Spark 4 VariantType.

The typed-column compiler (compiler.py) covers tables whose schema is
known; THIS module covers the reference's original data model — an
arbitrary JSON document per row (crates/jsonschema/src/lib.rs: one
serde_json::Value per validate call) — without ever leaving the JVM:

    json string --try_parse_json--> variant
    type dispatch   = schema_of_variant(v)        (per-row type string)
    object recursion= try_variant_get(v,'$','map<string,variant>') + HOFs
    array recursion = try_variant_get(v,'$','array<variant>') + HOFs
    scalars         = try_variant_get(v,'$','double'/'string'/'boolean')

Per-row JSON type semantics match draft 2020-12 (types.rs:186-204):
integer ⊇ any number with zero fraction; 1 == 1.0 for const/enum/
uniqueItems (ext/cmp.rs:46-107 equal_numbers).

Reuses the Rule/Node machinery, so flag mode / verbose errors /
violations() all work unchanged. Depth: recursion is compile-time
unrolling; `$ref` cycles are bounded by options.max_ref_depth (beyond
the bound the sub-schema is treated as `true`, documented deviation —
the reference detects runtime cycles instead, validator.rs:34-52).
max_ref_depth=None (the default) AUTO-TUNES the unroll: recursive
schemas keep the deepest plan that stays inside whole-stage codegen
(CompiledJsonSchema._autotune_depth), so Janino's 64KB method limit
never silently drops the stage to the interpreter.
"""

from __future__ import annotations

import json
import math
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jsonschema_rs_spark.compiler.nodes import (Node, Rule, concat_errors,
                                                empty_errors, one_error)
from jsonschema_rs_spark.errors import SchemaError, ValidationOptions
from jsonschema_rs_spark.regex.ecma import ecma_to_java
from jsonschema_rs_spark.spec.model import meta_validate

_NUMERIC_PREFIXES = ("BIGINT", "DECIMAL", "DOUBLE", "FLOAT", "INT",
                     "SMALLINT", "TINYINT")


# -- per-variant type predicates -------------------------------------------

# staged-type substitution: while with_validation builds its expression
# tree, the TOP-LEVEL variant column's type string is materialized once
# as a staged column (`__vt`) and every _vtype(v) on that exact Column
# object resolves to it instead of re-evaluating schema_of_variant per
# rule (VERDICT r1: the heaviest validation query re-ran it inside every
# type predicate). Sub-values inside HOF lambdas are fresh Column
# objects and fall through to the direct call.
_VT_LOCAL = __import__("threading").local()


def _vt_stage() -> list:
    # thread-local: concurrent plan builds on one driver (e.g. parallel
    # query compilation in tests) must not see each other's stack
    if not hasattr(_VT_LOCAL, "stack"):
        _VT_LOCAL.stack = []
    return _VT_LOCAL.stack


def _vtype(v: Column) -> Column:
    for col, vt in _vt_stage():
        if v is col:
            return vt
    return F.schema_of_variant(v)


def _is_string(v: Column) -> Column:
    return _vtype(v) == "STRING"


def _is_boolean(v: Column) -> Column:
    return _vtype(v) == "BOOLEAN"


def _is_null(v: Column) -> Column:
    return _vtype(v) == "VOID"


def _is_object(v: Column) -> Column:
    return _vtype(v).startswith("OBJECT")


def _is_array(v: Column) -> Column:
    return _vtype(v).startswith("ARRAY")


def _is_number(v: Column) -> Column:
    t = _vtype(v)
    out = F.lit(False)
    for p in _NUMERIC_PREFIXES:
        out = out | t.startswith(p)
    return out


def _as_double(v: Column) -> Column:
    return F.try_variant_get(v, "$", "double")


def _schema_double(value) -> float:
    """Schema-side numeric literal as the nearest double, saturating to
    ±inf instead of raising when an int exceeds double range (10**400
    in a schema used to OverflowError at compile). Saturation is the
    right double-space meaning: `minimum: 10**400` admits nothing
    finite, `const: 10**400` matches only rows the parser stored as
    +inf — serde_json's own non-arbitrary_precision reading."""
    try:
        return float(value)
    except OverflowError:
        return math.inf if value > 0 else -math.inf


def _as_decimal(v: Column) -> Column:
    """Exact numeric view: decimal(38,15) covers every int64 and every
    double whose shortest decimal form fits 23 integer + 15 fraction
    digits (Spark's double→decimal cast goes through the shortest
    decimal representation, i.e. the number the JSON literal denoted).
    NULL when out of range → callers fall back to the double path."""
    return F.try_variant_get(v, "$", "decimal(38,15)")


def _as_string(v: Column) -> Column:
    return F.try_variant_get(v, "$", "string")


def _as_map(v: Column) -> Column:
    return F.try_variant_get(v, "$", "map<string,variant>")


def _as_array(v: Column) -> Column:
    return F.try_variant_get(v, "$", "array<variant>")


def _is_integer_strict(v: Column) -> Column:
    """draft-4 integer: lexical JSON integers only — 1.0 is NOT an
    integer (reference legacy type_draft_4.rs:91-155; drafts >= 6
    switched to the zero-fraction rule below). The variant parser keeps
    the lexical class: integer forms land in the int types, or in
    scale-0 DECIMAL beyond int64 ("18446744073709551615"); fraction
    forms land in DECIMAL with their own scale (normalized, so "1.0" ->
    DECIMAL(1,0) stays inside int64 and is rejected by the magnitude
    test); exponent forms land in DOUBLE. Residual corner (documented
    in COVERAGE.md): an integer-valued fraction form beyond int64
    ("...615.0") is indistinguishable from its integer form after parse
    and is accepted."""
    t = _vtype(v)
    ints = t.rlike("^(TINYINT|SMALLINT|INT|BIGINT)$")
    dec = F.try_variant_get(v, "$", "decimal(38,0)")
    big = (t.rlike("^DECIMAL\\(\\d+,\\s*0\\)$") & dec.isNotNull()
           & (F.abs(dec) > F.lit(2 ** 63 - 1).cast("decimal(38,0)")))
    return ints | big


def _is_integer(v: Column) -> Column:
    # draft 2020-12: integer == number with zero fraction
    # (types.rs:186-204). Remainder-1, NOT floor (Spark's floor(double)
    # returns LONG and overflows to NULL at |x| >= 2^63, wrongly
    # rejecting huge zero-fraction floats like 1e100) and NOT pmod
    # (pmod's ((a%b)+b)%b addition step ROUNDS tiny negatives away:
    # pmod(-5e-324, 1.0) = 0, classifying a negative subnormal as an
    # integer — random-schema fuzz find; plain % keeps the dividend's
    # magnitude exactly, like the reference's f64 fract check).
    d = _as_double(v)
    return _is_number(v) & ((d % F.lit(1.0)) == 0)


_TYPE_PREDS = {
    "null": _is_null,
    "boolean": _is_boolean,
    "string": _is_string,
    "number": _is_number,
    "integer": _is_integer,
    "object": _is_object,
    "array": _is_array,
}


def _canonical(v: Column) -> Column:
    """Canonical scalar-aware serialization for equality: numbers via
    double (so 1 == 1.0) under one 'n:' tag; every other value under a
    tag derived from its JSON type class (first 3 chars of
    schema_of_variant: STR/BOO/ARR/OBJ/VOI), so boolean true never
    collides with the string "true" nor an array with its JSON text
    (draft 2020-12 typed equality, reference ext/cmp.rs). Composite
    equality is serialization-based — exact for identical documents,
    which is the uniqueItems case that matters. The decimal view is
    used only when it ROUND-TRIPS to the value's double (decimal(38,15)
    rounds sub-1e-15 magnitudes to zero — without the guard, 5e-324
    canonicalized identically to 0; found by the random-schema fuzz);
    int-lexical values beyond 2^53 still take the decimal string (their
    exact decimal casts back to the same rounded double), preserving
    2^53 != 2^53+1."""
    dec, dd = _as_decimal(v), _as_double(v)
    dec0 = F.try_variant_get(v, "$", "decimal(38,0)")
    # integer-lexical values with 24-38 digits (where decimal(38,15) is
    # NULL) take the exact decimal(38,0) string: without this arm 10**30
    # and 10**30+1 canonicalized to the same rounded-double key and
    # uniqueItems wrongly rejected them as duplicates. Same documented
    # tradeoff as the >2^53 decimal-string rule above it: exact
    # distinctness within the decimal storage class; a value-equal
    # EXPONENT-form twin (stored DOUBLE) keys separately (COVERAGE
    # corner — the reference's f64 view would collapse them)
    num = F.when(dec.isNotNull() & (dec.cast("double") == dd),
                 dec.cast("string")) \
        .when(_is_integer_strict(v) & dec0.isNotNull(),
              dec0.cast("string")) \
        .otherwise(dd.cast("string"))
    return F.when(_is_number(v), F.concat(F.lit("n:"), num)) \
        .otherwise(F.concat(F.substring(_vtype(v), 1, 3), F.lit(":"),
                            F.coalesce(_as_string(v), F.lit("\x00"))))


# -- const / enum: compile the literal into a structural predicate ---------


def _const_pred(value: Any, v: Column) -> Column:
    if value is None:
        return _is_null(v)
    if isinstance(value, bool):
        return _is_boolean(v) & (F.try_variant_get(v, "$", "boolean")
                                 == F.lit(value))
    if isinstance(value, (int, float)):
        if isinstance(value, float) and math.isfinite(value) \
                and abs(value) >= 2 ** 53:
            # every finite double at/beyond 2^53 is an integer; route
            # through the exact-int ladder so big exactly-stored integer
            # instances are compared exactly (a plain double compare
            # wrongly matched 9999999999999999 against const 1e16 —
            # reference ext/numeric.rs exact cross-type compare)
            value = int(value)
        if isinstance(value, int):
            # decimal-first: exact for every int64 INSTANCE too (a 2^53+1
            # instance must not collapse onto a 2^53 literal via the
            # double path — reference ext/numeric.rs:12-60 exact
            # cross-type compare); double fallback for instances outside
            # decimal(38,15) range (equality with an int literal is then
            # decided correctly by magnitude) AND for values whose
            # decimal view does not round-trip to their double —
            # decimal(38,15) rounds sub-1e-15 magnitudes to 0, which
            # made `const 0` match 5e-324 (random-schema fuzz find).
            # Int-lexical instances beyond 2^53 still round-trip (their
            # exact decimal casts back to the same rounded double), so
            # the exact compare is preserved where it matters
            from decimal import Decimal
            if len(str(abs(value))) > 38:
                # literal exceeds decimal(38,0): any instance equal to
                # it is itself stored as a lossy double (the storage
                # rule functions/precision.py pins), so the compare
                # lives in double space — serde_json's
                # non-arbitrary_precision reading; on_precision_loss
                # 'annotate'/'fail'/'exact' observe or overrule the
                # degraded rows. Used to ArithmeticException at compile
                # (DECIMAL_PRECISION_EXCEEDS_MAX_PRECISION).
                return _is_number(v) & (_as_double(v)
                                        == F.lit(_schema_double(value)))
            d = _as_decimal(v)
            dd = _as_double(v)
            dec0 = F.try_variant_get(v, "$", "decimal(38,0)")
            # residual arm = DOUBLE-stored instances (exponent forms,
            # >38-digit renderings): their exact value IS the double,
            # and a double can equal this int literal only when the
            # literal is double-representable — otherwise statically
            # False (fuzz find: instance 1e30 wrongly matched
            # enum/const 10**30)
            dbl_eq = dd == F.lit(float(value)) \
                if float(value) == value else F.lit(False)
            # integer-lexical instances beyond decimal(38,15)'s 23
            # integer digits compare via decimal(38,0) — without that
            # arm a 24-38-digit instance double-collapsed onto nearby
            # consts (10**30 wrongly matched const 10**30+1)
            return _is_number(v) & F.when(
                d.isNotNull() & (d.cast("double") == dd),
                d == F.lit(Decimal(value))) \
                .when(_is_integer_strict(v) & dec0.isNotNull(),
                      dec0 == F.lit(Decimal(value))) \
                .otherwise(dbl_eq)
        return _is_number(v) & (_as_double(v) == F.lit(float(value)))
    if isinstance(value, str):
        return _is_string(v) & (_as_string(v) == F.lit(value))
    if isinstance(value, list):
        a = _as_array(v)
        p = _is_array(v) & (F.size(a) == len(value))
        for i, item in enumerate(value):
            p = p & F.coalesce(_const_pred(item, F.try_element_at(a, F.lit(i + 1))),
                               F.lit(False))
        return p
    if isinstance(value, dict):
        m = _as_map(v)
        p = _is_object(v) & (F.size(F.map_keys(m)) == len(value))
        for k, item in value.items():
            p = p & F.coalesce(_const_pred(item, F.try_element_at(m, F.lit(k))),
                               F.lit(False))
        return p
    raise SchemaError(f"unsupported const {type(value)}")


# -- the compiler -----------------------------------------------------------


class VariantCompileContext:
    def __init__(self, root: Any, options: ValidationOptions,
                 ref_depth_limit: int | None = None,
                 depth_strict: bool = False):
        from jsonschema_rs_spark.compiler.dialects import detect_dialect
        from jsonschema_rs_spark.compiler.registry import RefRegistry
        from jsonschema_rs_spark.errors import resolved_ref_depth

        self.root = root
        self.options = options
        # effective unroll bound for THIS compile: CompiledJsonSchema's
        # auto-tuner passes progressively smaller limits when the default
        # depth would push the plan out of whole-stage codegen
        self.ref_depth_limit = (ref_depth_limit if ref_depth_limit
                                is not None else resolved_ref_depth(options))
        # set when a $ref/$dynamicRef/$recursiveRef re-enters a schema it
        # is already inside (i.e. the unroll actually recursed) — the
        # auto-tuner only measures plans where depth matters at all
        self.saw_ref_cycle = False
        # set when a $ref site actually HIT the unroll bound (i.e. the
        # compiled plan has at least one position where beyond-unroll
        # content exists unchecked) + the schema paths of those sites —
        # drives on_depth_exhausted (options) observability
        self.saw_depth_exhaustion = False
        self.exhausted_sites: list[str] = []
        # True while compiling the STRICT twin of an "annotate"-mode
        # plan: exhausted sites compile to a failing rule instead of
        # being skipped ("fail" mode compiles its ONLY tree this way)
        self.depth_strict = depth_strict or \
            options.on_depth_exhausted == "fail"
        # >0 while compiling a subschema whose predicate executes INSIDE
        # a higher-order-function lambda (items/contains/
        # patternProperties/additionalProperties/propertyNames/
        # unevaluated* and their coverage walks). Spark rejects Python
        # UDFs under lambda functions
        # (UNSUPPORTED_FEATURE.LAMBDA_FUNCTION_WITH_PYTHON_UDF), so
        # pUDF-backed corner paths (the multipleOf Fraction fallback)
        # must compile to their pure-Column form here. STICKY for the
        # whole subtree: a multipleOf nested under items→properties
        # still sits inside the items lambda
        self.hof_depth = 0
        self.dialect = detect_dialect(root, options.dialect,
                                      options.resources)
        self._ref_depth: dict[str, int] = {}
        # compile-time dynamic scope: the sequence of schema-resource
        # base URIs entered along the CURRENT compile path. Because refs
        # are depth-unrolled, every compiled path knows its exact scope,
        # so $dynamicRef resolves per-branch — two same-named
        # $dynamicAnchors on sibling branches each win on their own
        # branch (reference resolver.rs:117, ref_.rs:293; fixes the r2
        # static outermost-anchor approximation's documented divergence)
        self._dyn_scope: list[str] = []
        self.registry = RefRegistry(root, options.resources,
                                    legacy_id=self.dialect.legacy_id,
                                    retriever=options.retriever,
                                    base_uri=options.base_uri)
        # (schema_path, contains-Node) sites collected during compile —
        # drives the contains match-index annotations
        # (reference contains.rs:60-105 evaluate())
        self.contains_sites: list[tuple[str, Node]] = []

    def in_hof(self):
        """Context manager marking the enclosed compiles as
        lambda-embedded (see hof_depth)."""
        from contextlib import contextmanager

        @contextmanager
        def _cm():
            self.hof_depth += 1
            try:
                yield
            finally:
                self.hof_depth -= 1
        return _cm()

    def regex(self, pattern: str) -> str:
        from jsonschema_rs_spark.compiler.compiler import \
            _check_pattern_engine
        _check_pattern_engine(pattern, self.options)
        return ecma_to_java(pattern)

    def resolve_ref(self, ref: str, referrer: Any = None) -> Any:
        """$id/$anchor-aware resolution (registry.py); `referrer` is the
        schema object containing the $ref — its position decides the
        base URI the reference resolves against."""
        return self.registry.resolve(ref, referrer
                                     if referrer is not None else self.root)

    def resolve_dynamic_scoped(self, ref: str, referrer: Any) -> Any:
        """`$dynamicRef` with the 2020-12 dynamic-scope search over the
        current compile path (registry.resolve_dynamic_in_scope)."""
        return self.registry.resolve_dynamic_in_scope(
            ref, referrer, self._dyn_scope)


def compile_variant(schema: Any, ctx: VariantCompileContext,
                    sp: str = "") -> Node:
    if schema is True or schema == {}:
        return Node([])
    if schema is False:
        return Node([Rule("false", sp, "schema is false",
                          lambda c: F.lit(False), priority=0)])
    if not isinstance(schema, dict):
        raise SchemaError("schema must be bool or object", sp)

    # dialect gating: drop keywords this draft doesn't define ($ref
    # siblings in exclusive-$ref drafts, post-draft keywords in older
    # ones — dialects.py). Refs keep resolving against the ORIGINAL node
    # (its identity keys the registry's base-URI scope).
    orig = schema
    schema = ctx.dialect.effective(schema)

    # dynamic-scope maintenance: entering a node whose base URI differs
    # from the top of the scope = entering a new schema resource
    base = ctx.registry.base_of(orig)
    pushed_scope = not ctx._dyn_scope or ctx._dyn_scope[-1] != base
    if pushed_scope:
        ctx._dyn_scope.append(base)
    try:
        return _compile_variant_body(orig, schema, ctx, sp)
    finally:
        if pushed_scope:
            ctx._dyn_scope.pop()


def _compile_variant_body(orig: Any, schema: dict,
                          ctx: VariantCompileContext, sp: str) -> Node:
    rules: list[Rule] = []
    add = rules.append

    for kw, resolver in (("$ref", lambda r: ctx.resolve_ref(r, orig)),
                         ("$dynamicRef",
                          lambda r: ctx.resolve_dynamic_scoped(r, orig)),
                         ("$recursiveRef",
                          lambda r: ctx.registry.resolve_recursive())):
        if kw in schema:
            ref = schema[kw]
            depth = ctx._ref_depth.get(kw + ":" + ref, 0)
            if depth >= 1:
                ctx.saw_ref_cycle = True
            if depth < ctx.ref_depth_limit:
                ctx._ref_depth[kw + ":" + ref] = depth + 1
                try:
                    sub = compile_variant(resolver(ref), ctx, sp + "/" + kw)
                    rules.extend(sub.rules)
                finally:
                    ctx._ref_depth[kw + ":" + ref] = depth
            else:
                # unroll bound reached: record the exhausted site; in a
                # strict compile a PRESENT value here fails (the rule's
                # central null guard keeps shallower documents valid),
                # so depth exhaustion is observable instead of silently
                # vacuous-true (the reference keeps checking at runtime,
                # validator.rs:34-52 — this is the compiled-plan analog)
                ctx.saw_depth_exhaustion = True
                if not sp.startswith("/__cov"):
                    # coverage-walk recompiles would otherwise report
                    # the same site again under the synthetic '/__cov'
                    # path (the flag above still records that the PLAN
                    # exhausts — only the user-facing site list is
                    # deduped)
                    ctx.exhausted_sites.append(sp + "/" + kw)
                if ctx.depth_strict:
                    add(Rule(kw, sp + "/" + kw,
                             "maximum evaluation depth exceeded",
                             lambda c: F.lit(False), priority=0))

    if "type" in schema:
        ts = schema["type"]
        ts = [ts] if isinstance(ts, str) else ts
        for t in ts:
            if t not in _TYPE_PREDS:
                raise SchemaError(f"unknown type {t!r}", sp + "/type")
        # draft-4 keeps the lexical integer rule (1.0 ∉ integer)
        strict_int = ctx.dialect.draft4_numbers

        def type_pred(v: Column, ts=tuple(ts),
                      strict_int=strict_int) -> Column:
            out = F.lit(False)
            for t in ts:
                if t == "integer" and strict_int:
                    out = out | _is_integer_strict(v)
                else:
                    out = out | _TYPE_PREDS[t](v)
            return out

        add(Rule("type", sp + "/type", f"not of type {ts}", type_pred,
                 priority=1))

    if "const" in schema:
        c = schema["const"]
        add(Rule("const", sp + "/const", "not equal to const",
                 lambda v, c=c: _const_pred(c, v), priority=2))
    if "enum" in schema:
        vals = schema["enum"]

        def enum_pred(v: Column, vals=tuple(vals)) -> Column:
            out = F.lit(False)
            for val in vals:
                out = out | F.coalesce(_const_pred(val, v), F.lit(False))
            return out

        add(Rule("enum", sp + "/enum", "value not in enum", enum_pred,
                 priority=2))

    # numeric keywords: non-numbers pass (minmax.rs semantics).
    # draft-4 BOOLEAN form first (bool is an int subclass — without this
    # normalization `exclusiveMinimum: true` would be read as limit 1.0):
    # exclusiveMinimum/Maximum: true tightens the paired minimum/maximum
    # (legacy draft-4 semantics, as on the typed path); false is a no-op.
    if isinstance(schema.get("exclusiveMinimum"), bool) \
            or isinstance(schema.get("exclusiveMaximum"), bool):
        schema = dict(schema)
        if schema.get("exclusiveMinimum") is True and "minimum" in schema:
            schema["exclusiveMinimum"] = schema.pop("minimum")
        elif isinstance(schema.get("exclusiveMinimum"), bool):
            schema.pop("exclusiveMinimum")
        if schema.get("exclusiveMaximum") is True and "maximum" in schema:
            schema["exclusiveMaximum"] = schema.pop("maximum")
        elif isinstance(schema.get("exclusiveMaximum"), bool):
            schema.pop("exclusiveMaximum")
    for kw, op in [("minimum", lambda d, lim: d >= lim),
                   ("maximum", lambda d, lim: d <= lim),
                   ("exclusiveMinimum", lambda d, lim: d > lim),
                   ("exclusiveMaximum", lambda d, lim: d < lim)]:
        if kw in schema:
            lim_raw = schema[kw]
            # exact-compare eligibility: an int literal, or a FLOAT
            # literal at/beyond 2^53 (every finite double there is an
            # integer, and the reference compares the f64 exactly
            # against the instance's integer value — a plain double
            # compare wrongly equated 9999999999999999 with 1e16)
            lim_int = None
            if isinstance(lim_raw, int) and not isinstance(lim_raw, bool):
                lim_int = lim_raw
            elif isinstance(lim_raw, float) and math.isfinite(lim_raw) \
                    and abs(lim_raw) >= 2 ** 53:
                lim_int = int(lim_raw)
            if lim_int is not None and abs(lim_int) >= 2 ** 53 \
                    and len(str(abs(lim_int))) <= 38:
                # big-int limit ladder: integer-lexical instances compare
                # via decimal(38,0) (exact to 38 digits — decimal(38,15)
                # caps at 23 integer digits, which silently double-
                # compared 24-38 digit instances), fraction-form
                # instances via decimal(38,15), double compare (monotone,
                # safe far from the boundary) for the rest. >38-digit
                # limits skip to the double branch — every instance near
                # such a boundary is itself double-stored, and
                # F.lit(Decimal(10**39)) used to ArithmeticException at
                # compile
                from decimal import Decimal
                ld = Decimal(lim_int)
                # double-fallback op with the rounding-direction
                # adjustment (same rule as keywords._big_bound_pred):
                # by round-to-nearest no double lies strictly between
                # float(L) and L, so when float(L) != L the exact
                # compare of a double-stored instance against L is a
                # strictness flip on float(L) — without it, a double
                # equal to float(L) on the wrong side of L passed
                fl = float(lim_int)
                if fl == lim_int:
                    dop = op
                elif fl < lim_int:
                    dop = {"minimum": lambda d, l: d > l,
                           "exclusiveMinimum": lambda d, l: d > l,
                           "maximum": lambda d, l: d <= l,
                           "exclusiveMaximum": lambda d, l: d <= l}[kw]
                else:
                    dop = {"minimum": lambda d, l: d >= l,
                           "exclusiveMinimum": lambda d, l: d >= l,
                           "maximum": lambda d, l: d < l,
                           "exclusiveMaximum": lambda d, l: d < l}[kw]

                def num_pred(v: Column, op=op, dop=dop, ld=ld,
                             lim=fl) -> Column:
                    dv = _as_decimal(v)
                    dec0 = F.try_variant_get(v, "$", "decimal(38,0)")
                    return ~_is_number(v) | F.when(
                        _is_integer_strict(v) & dec0.isNotNull(),
                        op(dec0, F.lit(ld))) \
                        .when(dv.isNotNull(), op(dv, F.lit(ld))) \
                        .otherwise(dop(_as_double(v), F.lit(lim)))
            else:
                lim = _schema_double(lim_raw)

                def num_pred(v: Column, op=op, lim=lim) -> Column:
                    return ~_is_number(v) | op(_as_double(v), F.lit(lim))

            add(Rule(kw, f"{sp}/{kw}", f"violates {kw} {schema[kw]}",
                     num_pred, priority=3))
    if "multipleOf" in schema:
        mraw = schema["multipleOf"]

        _mo_quirk = (getattr(ctx.options, "multiple_of_semantics",
                             "spec") == "reference"
                     and isinstance(mraw, float)
                     and not mraw.is_integer())

        def mult_pred(v: Column, mraw=mraw,
                      in_hof=ctx.hof_depth > 0,
                      quirk=_mo_quirk) -> Column:
            # EXACT path (reference BigFraction kernel,
            # ext/numeric.rs:62-86): exact rational divisibility of the
            # value's shortest-decimal form — a JSON number's decimal
            # meaning — so 0.0075 IS a multiple of 0.0001 while
            # 2.0000000000000004e-15 is NOT a multiple of 1e-15. Integer
            # divisors take a three-tier ladder mirroring
            # is_multiple_of_integer (ext/numeric.rs:94-124):
            #   1. int64 variants → exact long mod (i64/u64 branch)
            #   2. INTEGER-LEXICAL values beyond int64 — scale-0
            #      DECIMAL variants, e.g. u64-class and BigInt-class
            #      JSON integers (ADVICE r3: these used to fall to
            #      fmod on the ROUNDED double) → exact decimal pmod
            #      (the reference's u64/BigInt arbitrary-precision
            #      branches)
            #   3. float-lexical residue → IEEE fmod on the binary
            #      double, exactly like the reference's
            #      `value_f64 % multiple == 0` (1e30 multipleOf 5 is
            #      FALSE: serde parses 1e30 to f64 and the reference
            #      judges the binary value, not the decimal literal)
            from jsonschema_rs_spark.functions.numerics import (
                exact_multiple_of_double,
            )

            d = _as_double(v)
            mi = None
            if isinstance(mraw, int):
                mi = mraw
            elif float(mraw).is_integer() and abs(mraw) < 2 ** 53:
                mi = int(mraw)
            if mi is not None:
                from decimal import Decimal

                # integer-lexical class beyond int64 (scale-0 DECIMAL;
                # same type probe as _is_integer_strict) — the values
                # serde would hold as u64/BigInt. decimal(38,0), NOT the
                # (38,15) view: 15 fraction digits leave only 23 integer
                # digits, so 10^25 came back NULL and fell to lossy
                # double fmod (random-schema fuzz find); scale 0 covers
                # the full 38-digit BigInt range the variant preserves
                dec0 = F.try_variant_get(v, "$", "decimal(38,0)")
                int_lex = _vtype(v).rlike("^DECIMAL\\(\\d+,\\s*0\\)$")
                ok = None
                long_decided = None
                if mi < 2 ** 63:
                    # integral-and-fits-int64 gate: the long must cast
                    # back to the value's own double. NOT a decimal
                    # compare — decimal(38,15) rounds sub-1e-15 doubles
                    # to 0, which routed 5e-324 through pmod(0, m)==0
                    # and called it a multiple (random-schema fuzz find)
                    vl = F.try_variant_get(v, "$", "long")
                    long_decided = vl.isNotNull() & (vl.cast("double") == d)
                    ok = F.when(long_decided,
                                F.pmod(vl, F.lit(mi)) == 0)
                if mi < 10 ** 38:  # literal fits decimal(38,0)
                    dec_ok = F.pmod(dec0, F.lit(Decimal(mi))) == F.lit(0)
                    cond = int_lex & dec0.isNotNull()
                    ok = ok.when(cond, dec_ok) if ok is not None \
                        else F.when(cond, dec_ok)
                if mi < 2 ** 53:
                    # float-lexical residue: binary fmod (exact on the
                    # double operands) = reference is_multiple_of_integer
                    fmod_ok = (d % F.lit(float(mi))) == 0
                elif in_hof:
                    # inside a HOF lambda no Python UDF may appear
                    # (Spark UNSUPPORTED_FEATURE.LAMBDA_FUNCTION_WITH_
                    # PYTHON_UDF), so the huge-divisor residue decides
                    # by fmod on the ROUNDED divisor (double), or False
                    # when the divisor exceeds double range — documented
                    # corner deviation, nested-array huge divisors only
                    try:
                        fmod_ok = (d % F.lit(float(mi))) == 0
                    except OverflowError:
                        fmod_ok = F.lit(False)
                else:
                    # divisor itself doesn't round-trip through double:
                    # residual rows decide via the exact Arrow-batched
                    # Fraction kernel; decided rows cross as NULL so
                    # Python does no work for them
                    from jsonschema_rs_spark.functions.numerics import (
                        fraction_multiple_of_udf,
                    )

                    undecided = ~int_lex | dec0.isNull()
                    if long_decided is not None:
                        # rows the long tier already decided (fraction-
                        # form integrals like "4.0") must not cross to
                        # Python either — the `when` chain would discard
                        # the kernel's answer but the UDF still runs
                        undecided = undecided & ~long_decided
                    mask = d if ok is None else \
                        F.when(undecided, d).otherwise(
                            F.lit(None).cast("double"))
                    fmod_ok = F.coalesce(
                        fraction_multiple_of_udf(mi)(mask), F.lit(False))
                ok = ok.otherwise(fmod_ok) if ok is not None else fmod_ok
            else:
                # fraction_fallback embeds a pandas UDF for >15-sig-digit
                # JVM renderings; inside a HOF lambda that is illegal, so
                # the pure-codegen kernel stands alone there (documented
                # corner deviation for nested values like 5e-324)
                ok = exact_multiple_of_double(
                    d, mraw, fraction_fallback=not in_hof)
            if quirk:
                # reference-quirk mode (ext/numeric.rs:62-86): positive
                # fractional divisors reject every negative value —
                # see keywords.build_multiple_of for the rationale
                ok = ok & (d >= 0)
            return ~_is_number(v) | F.coalesce(ok, F.lit(False))

        add(Rule("multipleOf", sp + "/multipleOf", "not a multiple",
                 mult_pred, priority=3))

    # string keywords: non-strings pass
    if "minLength" in schema:
        n = int(schema["minLength"])
        add(Rule("minLength", sp + "/minLength", "too short",
                 lambda v, n=n: ~_is_string(v) | (F.length(_as_string(v)) >= n),
                 priority=4))
    if "maxLength" in schema:
        n = int(schema["maxLength"])
        add(Rule("maxLength", sp + "/maxLength", "too long",
                 lambda v, n=n: ~_is_string(v) | (F.length(_as_string(v)) <= n),
                 priority=4))
    if "pattern" in schema:
        pat = ctx.regex(schema["pattern"])
        add(Rule("pattern", sp + "/pattern", "does not match pattern",
                 lambda v, pat=pat: ~_is_string(v) | _as_string(v).rlike(pat),
                 priority=6))

    # format / content keywords reuse the typed-path validators, applied
    # to the extracted string (non-strings pass, format.rs semantics)
    # validate_formats=None → draft-based default: 4/6/7 assert format
    # (reference compiler.rs:271-276 validates_formats_by_default)
    _vf = ctx.options.validate_formats
    if _vf is None:
        _vf = ctx.dialect.formats_assert_by_default
    if "format" in schema and _vf:
        from jsonschema_rs_spark.functions.formats import format_rule
        base = format_rule(schema["format"], ctx, sp)
        if base is not None:
            add(Rule("format", sp + "/format", base.message,
                     lambda v, base=base: ~_is_string(v)
                     | F.coalesce(base.pred(_as_string(v)), F.lit(False)),
                     priority=7))
    if "contentEncoding" in schema or "contentMediaType" in schema:
        from jsonschema_rs_spark.functions.formats import content_rules
        for base in content_rules(schema, ctx, sp):
            add(Rule(base.keyword, base.schema_path, base.message,
                     lambda v, base=base: ~_is_string(v)
                     | F.coalesce(base.pred(_as_string(v)), F.lit(False)),
                     priority=16))

    rules += _object_rules(schema, ctx, sp)
    rules += _array_rules(schema, ctx, sp)
    rules += _composition_rules(schema, ctx, sp)
    rules += _unevaluated_rules(schema, ctx, sp)
    from jsonschema_rs_spark.compiler.nodes import apply_reference_messages
    apply_reference_messages(rules, schema)
    return Node(rules)


def _object_rules(schema: dict, ctx, sp: str) -> list[Rule]:
    rules: list[Rule] = []

    if "required" in schema:
        import json as _json

        # one rule PER NAME — reference error-cardinality parity (the
        # reference emits one Required error per missing property,
        # keywords/required.rs) with the reference message under
        # message_values; verdict identical to the old aggregate rule
        for nm in schema["required"]:
            def req_pred(v: Column, nm=nm) -> Column:
                return ~_is_object(v) | \
                    F.try_element_at(_as_map(v), F.lit(nm)).isNotNull()

            rules.append(Rule(
                "required", sp + "/required",
                f"missing required property {nm!r}", req_pred, priority=5,
                value_message=f"{_json.dumps(nm)} is a required property",
                headless=True))

    if "properties" in schema:
        for k, sub in schema["properties"].items():
            node = compile_variant(sub, ctx, f"{sp}/properties/{k}")
            if not node.rules:
                continue

            def prop_pred(v: Column, node=node, k=k) -> Column:
                # element_at → SQL NULL when absent; Rule's null guard in
                # node.valid treats each sub-rule's null as pass, so wrap:
                val = F.try_element_at(_as_map(v), F.lit(k))
                return ~_is_object(v) | F.when(val.isNull(), F.lit(True)) \
                    .otherwise(node.valid(val))

            def prop_errs(v: Column, path: Column, node=node, k=k) -> Column:
                val = F.try_element_at(_as_map(v), F.lit(k))
                sub_path = F.concat(path, F.lit("/" + k))
                return F.when(~_is_object(v) | val.isNull(), empty_errors()) \
                    .otherwise(node.errors(val, sub_path))

            rules.append(Rule("properties", f"{sp}/properties/{k}",
                              f"property {k!r} invalid", prop_pred,
                              errors_fn=prop_errs, priority=10))

    if "patternProperties" in schema:
        for pat, sub in schema["patternProperties"].items():
            jpat = ctx.regex(pat)
            with ctx.in_hof():
                node = compile_variant(
                    sub, ctx, f"{sp}/patternProperties/{pat}")

            def pp_pred(v: Column, node=node, jpat=jpat) -> Column:
                m = _as_map(v)
                return ~_is_object(v) | F.forall(
                    F.map_entries(m),
                    lambda e: F.when(e["key"].rlike(jpat),
                                     node.valid(e["value"]))
                    .otherwise(F.lit(True)))

            rules.append(Rule("patternProperties",
                              f"{sp}/patternProperties/{pat}",
                              f"patternProperties {pat!r} invalid", pp_pred,
                              priority=11))

    if "additionalProperties" in schema:
        ap = schema["additionalProperties"]
        known = tuple(schema.get("properties", {}).keys())
        pats = tuple(ctx.regex(p)
                     for p in schema.get("patternProperties", {}).keys())

        def matched(k: Column) -> Column:
            out = k.isin(*known) if known else F.lit(False)
            for p in pats:
                out = out | k.rlike(p)
            return out

        if ap is False:
            def ap_pred(v: Column) -> Column:
                return ~_is_object(v) | F.forall(F.map_keys(_as_map(v)),
                                                 matched)

            rules.append(Rule("additionalProperties",
                              sp + "/additionalProperties",
                              "additional properties not allowed", ap_pred,
                              priority=12))
        elif isinstance(ap, dict) and ap != {}:
            with ctx.in_hof():
                node = compile_variant(ap, ctx,
                                       sp + "/additionalProperties")

            def ap_schema_pred(v: Column, node=node) -> Column:
                return ~_is_object(v) | F.forall(
                    F.map_entries(_as_map(v)),
                    lambda e: F.when(matched(e["key"]), F.lit(True))
                    .otherwise(node.valid(e["value"])))

            rules.append(Rule("additionalProperties",
                              sp + "/additionalProperties",
                              "additional property invalid", ap_schema_pred,
                              priority=12))

    if "propertyNames" in schema:
        with ctx.in_hof():
            node = compile_variant(schema["propertyNames"], ctx,
                                   sp + "/propertyNames")

        def pn_pred(v: Column, node=node) -> Column:
            # lift each key (plain string) into a variant so the compiled
            # sub-node applies: to_json(array(k)) gives '["<escaped>"]'
            return ~_is_object(v) | F.forall(
                F.map_keys(_as_map(v)),
                lambda k: node.valid(F.try_element_at(
                    _as_array(F.try_parse_json(F.to_json(F.array(k)))), F.lit(1))))

        rules.append(Rule("propertyNames", sp + "/propertyNames",
                          "property name invalid", pn_pred, priority=12))

    if "minProperties" in schema:
        n = int(schema["minProperties"])
        rules.append(Rule(
            "minProperties", sp + "/minProperties", "too few properties",
            lambda v, n=n: ~_is_object(v)
            | (F.size(F.map_keys(_as_map(v))) >= n), priority=5))
    if "maxProperties" in schema:
        n = int(schema["maxProperties"])
        rules.append(Rule(
            "maxProperties", sp + "/maxProperties", "too many properties",
            lambda v, n=n: ~_is_object(v)
            | (F.size(F.map_keys(_as_map(v))) <= n), priority=5))

    if "dependentSchemas" in schema:
        for dk, sub in schema["dependentSchemas"].items():
            node = compile_variant(sub, ctx, f"{sp}/dependentSchemas/{dk}")

            def ds_pred(v: Column, dk=dk, node=node) -> Column:
                present = F.try_element_at(_as_map(v), F.lit(dk)).isNotNull()
                return ~_is_object(v) | ~present \
                    | F.coalesce(node.valid(v), F.lit(False))

            rules.append(Rule("dependentSchemas",
                              f"{sp}/dependentSchemas/{dk}",
                              f"dependentSchemas for {dk!r} failed", ds_pred,
                              priority=20))

    if "dependencies" in schema:
        # draft 4-7 combined form: array value = dependentRequired,
        # schema value = dependentSchemas (keywords.py:487 typed analog)
        for dk, dep in schema["dependencies"].items():
            if isinstance(dep, list):
                def dep_arr_pred(v: Column, dk=dk,
                                 needs=tuple(dep)) -> Column:
                    m = _as_map(v)
                    present = F.try_element_at(m, F.lit(dk)).isNotNull()
                    out = F.lit(True)
                    for nm in needs:
                        out = out & F.try_element_at(m,
                                                     F.lit(nm)).isNotNull()
                    return ~_is_object(v) | ~present | out

                rules.append(Rule("dependencies",
                                  f"{sp}/dependencies/{dk}",
                                  f"dependencies for {dk!r} unmet",
                                  dep_arr_pred, priority=6))
            else:
                node = compile_variant(dep, ctx, f"{sp}/dependencies/{dk}")

                def dep_sch_pred(v: Column, dk=dk, node=node) -> Column:
                    present = F.try_element_at(_as_map(v),
                                               F.lit(dk)).isNotNull()
                    return ~_is_object(v) | ~present \
                        | F.coalesce(node.valid(v), F.lit(False))

                rules.append(Rule("dependencies",
                                  f"{sp}/dependencies/{dk}",
                                  f"dependencies schema for {dk!r} failed",
                                  dep_sch_pred, priority=20))

    if "dependentRequired" in schema:
        for k, needs in schema["dependentRequired"].items():
            def dep_pred(v: Column, k=k, needs=tuple(needs)) -> Column:
                m = _as_map(v)
                present = F.try_element_at(m, F.lit(k)).isNotNull()
                out = F.lit(True)
                for nm in needs:
                    out = out & F.try_element_at(m, F.lit(nm)).isNotNull()
                return ~_is_object(v) | ~present | out

            rules.append(Rule("dependentRequired",
                              f"{sp}/dependentRequired/{k}",
                              f"dependentRequired for {k!r} unmet", dep_pred,
                              priority=6))
    return rules


def _array_rules(schema: dict, ctx, sp: str) -> list[Rule]:
    rules: list[Rule] = []

    # draft 4-7 array-form `items` + `additionalItems` normalize to the
    # 2020-12 prefixItems/items shape (keywords.py:315-358 typed analog)
    if isinstance(schema.get("items"), list):
        schema = dict(schema)
        schema["prefixItems"] = schema["items"]
        if "additionalItems" in schema:
            schema["items"] = schema["additionalItems"]
        else:
            del schema["items"]

    if "minItems" in schema:
        n = int(schema["minItems"])
        rules.append(Rule("minItems", sp + "/minItems", "too few items",
                          lambda v, n=n: ~_is_array(v)
                          | (F.size(_as_array(v)) >= n), priority=5))
    if "maxItems" in schema:
        n = int(schema["maxItems"])
        rules.append(Rule("maxItems", sp + "/maxItems", "too many items",
                          lambda v, n=n: ~_is_array(v)
                          | (F.size(_as_array(v)) <= n), priority=5))

    prefix = schema.get("prefixItems")
    if prefix:
        for i, sub in enumerate(prefix):
            node = compile_variant(sub, ctx, f"{sp}/prefixItems/{i}")
            if not node.rules:
                continue

            def pi_pred(v: Column, node=node, i=i) -> Column:
                el = F.try_element_at(_as_array(v), F.lit(i + 1))
                return ~_is_array(v) | F.when(el.isNull(), F.lit(True)) \
                    .otherwise(node.valid(el))

            rules.append(Rule("prefixItems", f"{sp}/prefixItems/{i}",
                              f"prefix item {i} invalid", pi_pred,
                              priority=13))

    if "items" in schema:
        sub = schema["items"]
        start = len(prefix) if prefix else 0
        if sub is False:
            rules.append(Rule(
                "items", sp + "/items", "no items beyond prefix allowed",
                lambda v, start=start: ~_is_array(v)
                | (F.size(_as_array(v)) <= start), priority=13))
        else:
            with ctx.in_hof():
                node = compile_variant(sub, ctx, sp + "/items")
            if node.rules:
                def items_pred(v: Column, node=node, start=start) -> Column:
                    a = _as_array(v)
                    tail = F.slice(a, start + 1,
                                   F.greatest(F.size(a) - start, F.lit(0))) \
                        if start else a
                    return ~_is_array(v) | F.forall(tail, node.valid)

                rules.append(Rule("items", sp + "/items", "item invalid",
                                  items_pred, priority=13))

    if "contains" in schema:
        with ctx.in_hof():
            node = compile_variant(schema["contains"], ctx,
                                   sp + "/contains")
        if not sp.startswith("/__cov"):
            # coverage-walk compiles (_key_coverage/_index_coverage pass
            # sp="/__cov") re-compile contains sub-schemas purely to
            # read their annotations; registering those phantom sites
            # duplicated map keys in with_contains_annotations (runtime
            # 'duplicate map key' under the default dedup policy) and
            # emitted bogus '/__cov/...' annotation entries
            ctx.contains_sites.append((sp + "/contains", node))
        lo = int(schema.get("minContains", 1))
        hi = schema.get("maxContains")

        def contains_pred(v: Column, node=node, lo=lo, hi=hi) -> Column:
            n = F.size(F.filter(_as_array(v),
                                lambda x: F.coalesce(node.valid(x),
                                                     F.lit(False))))
            ok = n >= lo
            if hi is not None:
                ok = ok & (n <= int(hi))
            return ~_is_array(v) | ok

        rules.append(Rule("contains", sp + "/contains",
                          "contains count out of bounds", contains_pred,
                          priority=14))

    if schema.get("uniqueItems") is True:
        def uniq_pred(v: Column) -> Column:
            canon = F.transform(_as_array(v), _canonical)
            return ~_is_array(v) | (F.size(F.array_distinct(canon))
                                    == F.size(canon))

        rules.append(Rule("uniqueItems", sp + "/uniqueItems",
                          "items not unique", uniq_pred, priority=15))
    return rules


# -- unevaluatedProperties / unevaluatedItems -------------------------------
#
# The reference walks sibling and in-place-applicator schemas at compile
# time and tracks evaluation dynamically at runtime
# (keywords/unevaluated_properties.rs:223-554, unevaluated_items.rs:218-509).
# Here the same dynamic semantics compile to Column logic: a key/index is
# "evaluated" by an applicator branch only when that branch VALIDATES the
# instance — `branch.valid(v) & branch_coverage(key)` — so annotations
# from failed branches don't count, exactly per 2020-12.


def _key_coverage(schema: Any, ctx):
    """fn(v, key) -> Column: key is evaluated by this schema's property
    applicators (dynamic, validity-conditioned for in-place branches)."""
    if not isinstance(schema, dict):
        return lambda v, k: F.lit(False)
    # coverage must see the DIALECT-EFFECTIVE node: a keyword the active
    # draft ignores ($dynamicRef under 2019-09, ...) asserts nothing AND
    # annotates nothing — without this gate it still marked keys
    # evaluated (dialect fuzz find). `orig` stays the ref referrer (the
    # registry's base-URI map is keyed by object identity).
    orig = schema
    schema = ctx.dialect.effective(schema)
    parts = []
    names = tuple(schema.get("properties", {}).keys())
    if names:
        parts.append(lambda v, k, names=names: k.isin(*names))
    for p in schema.get("patternProperties", {}):
        jp = ctx.regex(p)
        parts.append(lambda v, k, jp=jp: k.rlike(jp))
    if "additionalProperties" in schema or "unevaluatedProperties" in schema:
        # either one (any form, even `false`) claims every key
        parts.append(lambda v, k: F.lit(True))
    for kw in ("allOf", "anyOf", "oneOf"):
        for sub in schema.get(kw, []) or []:
            node = compile_variant(sub, ctx, "/__cov")
            cov = _key_coverage(sub, ctx)
            parts.append(
                lambda v, k, node=node, cov=cov:
                F.coalesce(node.valid(v), F.lit(False)) & cov(v, k))
    if "$ref" in schema:
        ref = schema["$ref"]
        depth = ctx._ref_depth.get("cov:" + ref, 0)
        if depth >= 1:
            ctx.saw_ref_cycle = True
        if depth < ctx.ref_depth_limit:
            ctx._ref_depth["cov:" + ref] = depth + 1
            try:
                cov = _key_coverage(ctx.resolve_ref(ref, orig), ctx)
                parts.append(cov)
            finally:
                ctx._ref_depth["cov:" + ref] = depth
    if "$dynamicRef" in schema:
        ref = schema["$dynamicRef"]
        depth = ctx._ref_depth.get("covd:" + ref, 0)
        if depth >= 1:
            ctx.saw_ref_cycle = True
        if depth < ctx.ref_depth_limit:
            ctx._ref_depth["covd:" + ref] = depth + 1
            try:
                parts.append(_key_coverage(
                    ctx.registry.resolve_dynamic(ref, orig), ctx))
            finally:
                ctx._ref_depth["covd:" + ref] = depth
    if "$recursiveRef" in schema:
        depth = ctx._ref_depth.get("covr:#", 0)
        if depth >= 1:
            ctx.saw_ref_cycle = True
        if depth < ctx.ref_depth_limit:
            ctx._ref_depth["covr:#"] = depth + 1
            try:
                parts.append(_key_coverage(
                    ctx.registry.resolve_recursive(), ctx))
            finally:
                ctx._ref_depth["covr:#"] = depth
    if "if" in schema:
        if_node = compile_variant(schema["if"], ctx, "/__cov")
        if_cov = _key_coverage(schema["if"], ctx)
        then_cov = _key_coverage(schema.get("then", {}), ctx)
        else_cov = _key_coverage(schema.get("else", {}), ctx)

        def ite_cov(v, k):
            ok = F.coalesce(if_node.valid(v), F.lit(False))
            return F.when(ok, if_cov(v, k) | then_cov(v, k)) \
                .otherwise(else_cov(v, k))

        parts.append(ite_cov)
    if "dependentSchemas" in schema:
        for dk, sub in schema["dependentSchemas"].items():
            cov = _key_coverage(sub, ctx)
            parts.append(
                lambda v, k, dk=dk, cov=cov:
                F.try_element_at(_as_map(v), F.lit(dk)).isNotNull()
                & cov(v, k))

    def combined(v: Column, k: Column) -> Column:
        out = F.lit(False)
        for p in parts:
            out = out | F.coalesce(p(v, k), F.lit(False))
        return out

    return combined


def _index_coverage(schema: Any, ctx):
    """fn(v, idx0, el) -> Column: array element (0-based idx) is evaluated
    by this schema's array applicators."""
    if not isinstance(schema, dict):
        return lambda v, i, el: F.lit(False)
    # dialect-effective view for keyword reads; orig stays the ref
    # referrer (see _key_coverage)
    orig = schema
    schema = ctx.dialect.effective(schema)
    # draft 4-7 array-form `items` covers only its listed indices; the
    # rest are evaluated only if `additionalItems` is present (mirrors
    # the _array_rules normalization — without this, [1, 2] against
    # {"items": [int], "unevaluatedItems": false} wrongly passed)
    if isinstance(schema.get("items"), list):
        schema = dict(schema)
        schema["prefixItems"] = schema["items"]
        if "additionalItems" in schema:
            schema["items"] = schema["additionalItems"]
        else:
            del schema["items"]
    parts = []
    prefix = schema.get("prefixItems")
    if prefix:
        n = len(prefix)
        parts.append(lambda v, i, el, n=n: i < n)
    if "items" in schema or "unevaluatedItems" in schema \
            or "additionalItems" in schema:
        parts.append(lambda v, i, el: F.lit(True))
    if "contains" in schema:
        cnode = compile_variant(schema["contains"], ctx, "/__cov")
        parts.append(lambda v, i, el, cnode=cnode:
                     F.coalesce(cnode.valid(el), F.lit(False)))
    for kw in ("allOf", "anyOf", "oneOf"):
        for sub in schema.get(kw, []) or []:
            node = compile_variant(sub, ctx, "/__cov")
            cov = _index_coverage(sub, ctx)
            parts.append(
                lambda v, i, el, node=node, cov=cov:
                F.coalesce(node.valid(v), F.lit(False)) & cov(v, i, el))
    if "$ref" in schema:
        ref = schema["$ref"]
        depth = ctx._ref_depth.get("icov:" + ref, 0)
        if depth >= 1:
            ctx.saw_ref_cycle = True
        if depth < ctx.ref_depth_limit:
            ctx._ref_depth["icov:" + ref] = depth + 1
            try:
                parts.append(_index_coverage(ctx.resolve_ref(ref, orig),
                                             ctx))
            finally:
                ctx._ref_depth["icov:" + ref] = depth
    if "$dynamicRef" in schema:
        ref = schema["$dynamicRef"]
        depth = ctx._ref_depth.get("icovd:" + ref, 0)
        if depth >= 1:
            ctx.saw_ref_cycle = True
        if depth < ctx.ref_depth_limit:
            ctx._ref_depth["icovd:" + ref] = depth + 1
            try:
                parts.append(_index_coverage(
                    ctx.registry.resolve_dynamic(ref, orig), ctx))
            finally:
                ctx._ref_depth["icovd:" + ref] = depth
    if "$recursiveRef" in schema:
        depth = ctx._ref_depth.get("icovr:#", 0)
        if depth >= 1:
            ctx.saw_ref_cycle = True
        if depth < ctx.ref_depth_limit:
            ctx._ref_depth["icovr:#"] = depth + 1
            try:
                parts.append(_index_coverage(
                    ctx.registry.resolve_recursive(), ctx))
            finally:
                ctx._ref_depth["icovr:#"] = depth
    if "if" in schema:
        if_node = compile_variant(schema["if"], ctx, "/__cov")
        if_cov = _index_coverage(schema["if"], ctx)
        then_cov = _index_coverage(schema.get("then", {}), ctx)
        else_cov = _index_coverage(schema.get("else", {}), ctx)

        def ite_cov(v, i, el):
            ok = F.coalesce(if_node.valid(v), F.lit(False))
            return F.when(ok, if_cov(v, i, el) | then_cov(v, i, el)) \
                .otherwise(else_cov(v, i, el))

        parts.append(ite_cov)

    def combined(v: Column, i: Column, el: Column) -> Column:
        out = F.lit(False)
        for p in parts:
            out = out | F.coalesce(p(v, i, el), F.lit(False))
        return out

    return combined


def _unevaluated_rules(schema: dict, ctx, sp: str) -> list[Rule]:
    rules: list[Rule] = []
    if "unevaluatedProperties" in schema:
        up = schema["unevaluatedProperties"]
        sibling = dict(schema)
        sibling.pop("unevaluatedProperties")
        with ctx.in_hof():
            cov = _key_coverage(sibling, ctx)
            node = None if up is False else compile_variant(
                up, ctx, sp + "/unevaluatedProperties")

        def up_pred(v: Column, cov=cov, node=node) -> Column:
            def entry_ok(e):
                ok = cov(v, e["key"])
                if node is not None:
                    ok = ok | F.coalesce(node.valid(e["value"]), F.lit(False))
                return ok
            return ~_is_object(v) | F.forall(F.map_entries(_as_map(v)),
                                             entry_ok)

        rules.append(Rule("unevaluatedProperties",
                          sp + "/unevaluatedProperties",
                          "unevaluated properties present", up_pred,
                          priority=30))
    if "unevaluatedItems" in schema:
        ui = schema["unevaluatedItems"]
        sibling = dict(schema)
        sibling.pop("unevaluatedItems")
        with ctx.in_hof():
            icov = _index_coverage(sibling, ctx)
            node = None if ui is False else compile_variant(
                ui, ctx, sp + "/unevaluatedItems")

        def ui_pred(v: Column, icov=icov, node=node) -> Column:
            def el_ok(el, i):
                ok = icov(v, i, el)
                if node is not None:
                    ok = ok | F.coalesce(node.valid(el), F.lit(False))
                return ok
            checks = F.transform(_as_array(v), el_ok)
            return ~_is_array(v) | F.forall(checks, lambda b: b)

        rules.append(Rule("unevaluatedItems", sp + "/unevaluatedItems",
                          "unevaluated items present", ui_pred,
                          priority=30))
    return rules


def _composition_rules(schema: dict, ctx, sp: str) -> list[Rule]:
    rules: list[Rule] = []

    if "allOf" in schema:
        nodes = [compile_variant(s, ctx, f"{sp}/allOf/{i}")
                 for i, s in enumerate(schema["allOf"])]

        def all_pred(v: Column, nodes=tuple(nodes)) -> Column:
            out = F.lit(True)
            for nd in nodes:
                out = out & F.coalesce(nd.valid(v), F.lit(False))
            return out

        def all_errs(v: Column, path: Column, nodes=tuple(nodes)) -> Column:
            return concat_errors([nd.errors(v, path) for nd in nodes])

        rules.append(Rule("allOf", sp + "/allOf", "allOf failed", all_pred,
                          errors_fn=all_errs, priority=20))
    if "anyOf" in schema:
        nodes = [compile_variant(s, ctx, f"{sp}/anyOf/{i}")
                 for i, s in enumerate(schema["anyOf"])]

        def any_pred(v: Column, nodes=tuple(nodes)) -> Column:
            out = F.lit(False)
            for nd in nodes:
                out = out | F.coalesce(nd.valid(v), F.lit(False))
            return out

        rules.append(Rule("anyOf", sp + "/anyOf", "no anyOf branch matched",
                          any_pred, priority=21))
    if "oneOf" in schema:
        nodes = [compile_variant(s, ctx, f"{sp}/oneOf/{i}")
                 for i, s in enumerate(schema["oneOf"])]

        def one_pred(v: Column, nodes=tuple(nodes)) -> Column:
            total = F.lit(0)
            for nd in nodes:
                total = total + F.coalesce(nd.valid(v), F.lit(False)) \
                    .cast("int")
            return total == 1

        rules.append(Rule("oneOf", sp + "/oneOf",
                          "not exactly one oneOf branch", one_pred,
                          priority=21))
    if "not" in schema:
        node = compile_variant(schema["not"], ctx, sp + "/not")
        rules.append(Rule("not", sp + "/not", "must not match",
                          lambda v, node=node:
                          ~F.coalesce(node.valid(v), F.lit(False)),
                          priority=21))
    if "if" in schema:
        if_node = compile_variant(schema["if"], ctx, sp + "/if")
        then_node = compile_variant(schema.get("then", True), ctx,
                                    sp + "/then")
        else_node = compile_variant(schema.get("else", True), ctx,
                                    sp + "/else")

        def ite_pred(v: Column) -> Column:
            return F.when(F.coalesce(if_node.valid(v), F.lit(False)),
                          F.coalesce(then_node.valid(v), F.lit(True))) \
                .otherwise(F.coalesce(else_node.valid(v), F.lit(True)))

        rules.append(Rule("if", sp + "/if", "conditional failed", ite_pred,
                          priority=22))
    return rules


# -- public API -------------------------------------------------------------


# auto-tuned depth memo: a recursive schema whose size lands in the
# calibrated ambiguous band pays a ~9 s Janino ground-truth probe per
# compile; the suite (and any caller re-compiling the same schema per
# query) should pay it once. Keyed by the schema's canonical JSON plus
# every option that can change the compiled plan's SHAPE; schemas with
# out-of-band compile inputs (resources / retriever / custom keyword
# callables) are not cached.
_DEPTH_MEMO: dict = {}


def _depth_memo_key(schema: Any, options: ValidationOptions):
    if (options.resources or options.retriever is not None
            or options.custom_keywords or options.custom_formats
            or options.custom_content_encodings
            or options.custom_content_media_types):
        return None
    try:
        key = (json.dumps(schema, sort_keys=True), options.dialect,
               options.draft4_integer, options.validate_formats,
               options.ignore_unknown_formats, options.base_uri,
               # these change generated regex/pUDF/rule plan shape, so
               # they must key the cached unroll depth (the options are
               # frozen dataclasses, hashable — but a caller MAY pass a
               # plain dict, which the format readers tolerate, so probe
               # hashability here and skip the memo rather than crash
               # at the lookup)
               options.email_options, options.pattern_options,
               options.on_depth_exhausted, options.multiple_of_semantics)
        hash(key)
        return key
    except (TypeError, ValueError):
        return None


def _codegen_probe(make_col) -> bool | None:
    """Ground truth for the auto-tuner's ambiguous band: run the
    candidate boolean plan over ONE local row with
    spark.sql.codegen.fallback=false, so a Janino >64KB method failure
    surfaces as an exception instead of a silent interpreted fallback.
    Returns True (codegen clean), False (codegen failed), None (no
    active session to probe with). The two codegen confs are set and
    restored around a single driver-local collect; a concurrent query
    on the same session inside that window would also hard-fail on a
    codegen problem — acceptable for this compile-time-only path."""
    from pyspark.sql import SparkSession
    spark = SparkSession.getActiveSession()
    if spark is None:
        return None
    conf = spark.conf
    keys = ("spark.sql.codegen.fallback", "spark.sql.codegen.factoryMode")
    prev = {}
    for k in keys:
        try:
            prev[k] = conf.get(k)
        except Exception:
            prev[k] = None
    try:
        conf.set("spark.sql.codegen.fallback", "false")
        conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
        df = spark.createDataFrame([("{}",)], "doc string")
        df.select(make_col(F.col("doc")).alias("v")).collect()
        return True
    except Exception:
        return False
    finally:
        for k in keys:
            try:
                if prev[k] is None:
                    conf.unset(k)
                else:
                    conf.set(k, prev[k])
            except Exception:
                pass


_PROBE_IDENTITY_KWS = ("$id", "$anchor", "$dynamicAnchor",
                       "$recursiveAnchor", "$schema")
_PROBE_REF_KWS = ("$ref", "$dynamicRef", "$recursiveRef")


def _probe_keeps(s: Any) -> bool:
    """True when a subtree must survive the probe transform: it contains
    a ref, or resolution identity ($id/anchors) that some ref elsewhere
    may target, or definitions that could hold either."""
    if isinstance(s, dict):
        if any(k in s for k in _PROBE_REF_KWS) \
                or any(k in s for k in _PROBE_IDENTITY_KWS[:4]):
            return True
        return any(_probe_keeps(v) for v in s.values())
    if isinstance(s, list):
        return any(_probe_keeps(v) for v in s)
    return False


# pointer steps whose paths the probe transform preserves VERBATIM:
# keyword + name for the maps, bare keyword for propertyNames. Every
# other applicator (allOf/N, items, then, additionalProperties, ...) is
# folded/reindexed into a synthesized allOf, so a JSON-pointer ref
# through one would resolve inside the probe — possibly cleanly — to
# the WRONG subtree.
_PROBE_SAFE_STEP = {"$defs", "definitions", "properties",
                    "patternProperties"}


def _probe_safe_fragment(frag: str) -> bool:
    """True when a ref fragment keeps its meaning under the probe
    transform: anchors / $dynamicRef names are position-independent;
    JSON pointers only while every step walks path-preserved keywords."""
    if not frag or not frag.startswith("/"):
        return True  # root, plain anchor, or dynamic-anchor name
    parts = [p.replace("~1", "/").replace("~0", "~")
             for p in frag.split("/")[1:]]
    i = 0
    while i < len(parts):
        kw = parts[i]
        if kw == "propertyNames":
            i += 1
        elif kw in _PROBE_SAFE_STEP and i + 1 < len(parts):
            i += 2
        else:
            return False
    return True


def _probe_refs_safe(doc: Any) -> bool:
    """Scan a schema document for ref fragments the probe transform
    cannot preserve (positional JSON pointers). Conservative: ref-shaped
    keys inside non-schema values (enum/const payloads) count too —
    a false positive only costs the faithful-twin fallback."""
    if isinstance(doc, dict):
        for k, v in doc.items():
            if k in _PROBE_REF_KWS and isinstance(v, str):
                frag = v.split("#", 1)[1] if "#" in v else ""
                if not _probe_safe_fragment(frag):
                    return False
            if not _probe_refs_safe(v):
                return False
        return True
    if isinstance(doc, list):
        return all(_probe_refs_safe(v) for v in doc)
    return True


def _collect_ref_targets(docs) -> frozenset:
    """Every SAFE pointer-fragment target in the given schema documents,
    as tuples of unescaped steps — the probe transform must keep these
    positions resolvable even when the targeted subtree is assertion-
    only (it would otherwise prune it, and the unresolvable $ref in the
    probe would force the full faithful-twin fallback, doubling
    _measured_size for common '$ref to a plain type def' schemas).
    Conservative superset: fragments are collected across ALL documents
    without tracking which document each ref resolves into — an extra
    empty spine in the probe is harmless."""
    out = set()

    def walk(d):
        if isinstance(d, dict):
            for k, v in d.items():
                if k in _PROBE_REF_KWS and isinstance(v, str) \
                        and "#" in v:
                    frag = v.split("#", 1)[1]
                    if frag.startswith("/") and _probe_safe_fragment(frag):
                        out.add(tuple(
                            p.replace("~1", "/").replace("~0", "~")
                            for p in frag.split("/")[1:]))
                walk(v)
        elif isinstance(d, list):
            for v in d:
                walk(v)

    for doc in docs:
        walk(doc)
    return frozenset(out)


def _target_spine(path, targets):
    """Minimal schema skeleton ({} leaves) reaching every ref target at
    or under `path`, or None when no target touches it. Safe fragments
    alternate map-keyword/name steps (plus bare propertyNames), so the
    skeleton is just nested dicts."""
    node: dict = {}
    hit = False
    for tg in targets:
        if tg == path:
            hit = True
        elif len(tg) > len(path) and tg[:len(path)] == path:
            hit = True
            cur = node
            rest = tg[len(path):]
            i = 0
            while i < len(rest):
                if rest[i] == "propertyNames":
                    cur = cur.setdefault("propertyNames", {})
                    i += 1
                else:
                    cur = cur.setdefault(rest[i], {}) \
                             .setdefault(rest[i + 1], {})
                    i += 2
    return node if hit else None


def _probe_schema(s: Any, targets: frozenset = frozenset(), path=()):
    """Strip a schema down to its NAVIGATION structure toward $ref
    sites: applicators that locate sub-instances are kept (with
    transformed sub-schemas), every assertion keyword is dropped, and
    branch applicators (anyOf/oneOf/not/if-then-else) are folded into
    allOf so the probe reaches EVERY position any branch could evaluate
    (a deliberate over-approximation). Compiled with depth_strict=True,
    the probe's valid(v) is False exactly when a present value sits at a
    position beyond the compiled unroll — the depth_exhausted signal —
    while staying a small fraction of the real tree's size, so the
    auto-tuned unroll depth is unaffected in practice. Returns None for
    subtrees that can never reach a ref (pruned). `targets`/`path` keep
    pointer-ref DESTINATIONS resolvable: an assertion-only subtree that
    some ref targets survives as a minimal {}-leaf spine instead of
    being pruned (path=None marks positions reindexed by the transform,
    which no safe fragment can address)."""
    if not isinstance(s, dict):
        return None
    if not _probe_keeps(s):
        return None
    out: dict = {}
    for kw in _PROBE_IDENTITY_KWS + _PROBE_REF_KWS:
        if kw in s:
            out[kw] = s[kw]
    for kw in ("$defs", "definitions", "properties", "patternProperties"):
        if isinstance(s.get(kw), dict):
            kept = {}
            for k, v in s[kw].items():
                cp = path + (kw, k) if path is not None else None
                t = _probe_schema(v, targets, cp)
                if t is None and cp is not None:
                    t = _target_spine(cp, targets)
                if t is not None:
                    kept[k] = t
            if kept:
                out[kw] = kept
    if isinstance(s.get("propertyNames"), dict):
        cp = path + ("propertyNames",) if path is not None else None
        t = _probe_schema(s["propertyNames"], targets, cp)
        if t is None and cp is not None:
            t = _target_spine(cp, targets)
        if t is not None:
            out["propertyNames"] = t
    # every array-element applicator probes ALL elements (positional /
    # existential semantics widened to universal — over-approximation)
    elems = []
    for kw in ("items", "additionalItems", "contains",
               "unevaluatedItems"):
        v = s.get(kw)
        if isinstance(v, dict):
            t = _probe_schema(v, targets, None)
            if t is not None:
                elems.append(t)
        elif isinstance(v, list):  # items array form
            for e in v:
                t = _probe_schema(e, targets, None)
                if t is not None:
                    elems.append(t)
    for e in s.get("prefixItems", []) if isinstance(
            s.get("prefixItems"), list) else []:
        t = _probe_schema(e, targets, None)
        if t is not None:
            elems.append(t)
    branches = []
    if elems:
        branches.append({"items": elems[0] if len(elems) == 1
                         else {"allOf": elems}})
    # additional/unevaluated object values probe ALL values: isolated in
    # their own allOf branch so no properties siblings exempt keys
    for kw in ("additionalProperties", "unevaluatedProperties"):
        if isinstance(s.get(kw), dict):
            t = _probe_schema(s[kw], targets, None)
            if t is not None:
                branches.append({"additionalProperties": t})
    # in-place branch applicators: union of all branches
    for kw in ("allOf", "anyOf", "oneOf"):
        for sub in s.get(kw, []) if isinstance(s.get(kw), list) else []:
            t = _probe_schema(sub, targets, None)
            if t is not None:
                branches.append(t)
    for kw in ("not", "if", "then", "else"):
        if isinstance(s.get(kw), dict):
            t = _probe_schema(s[kw], targets, None)
            if t is not None:
                branches.append(t)
    for kw in ("dependentSchemas", "dependencies"):
        if isinstance(s.get(kw), dict):
            for sub in s[kw].values():
                if isinstance(sub, dict):
                    t = _probe_schema(sub, targets, None)
                    if t is not None:
                        branches.append(t)
    if branches:
        out["allOf"] = branches
    if list(out) == ["allOf"] and len(branches) == 1:
        return branches[0]  # collapse the trivial single-branch wrapper
    return out or None


class CompiledJsonSchema:
    """Validator for a JSON-string column. Unparseable JSON is invalid
    (keyword 'json'), mirroring the reference CLI's behavior on malformed
    instance documents."""

    # Codegen auto-tune thresholds (chars of the boolean plan's JVM
    # expression toString). Calibrated in-repo with
    # spark.sql.codegen.fallback=false on two recursive shapes (linked
    # list, binary tree with pattern): every plan <= 16.1k chars
    # codegen'd clean, every plan >= 23.6k blew Janino's 64KB method
    # limit; the band between is decided by a ground-truth one-row probe
    # (tests/test_ref_depth_autotune.py re-runs the calibration).
    _CODEGEN_SAFE_CHARS = 16_200
    _CODEGEN_HARD_CHARS = 23_000
    # cycle-detection depth for auto mode: recursion, if present at
    # all, re-enters by the second unroll, and a NON-recursive schema
    # compiles to the identical plan under any limit — so the cheap
    # probe compile doubles as the final plan when no cycle exists
    _PROBE_DEPTH = 2

    def __init__(self, schema: Any,
                 options: ValidationOptions | None = None):
        options = options or ValidationOptions()
        if options.custom_keywords:
            # custom keywords are TYPED-path extensions: their factories
            # are called with (value, spark_dtype, ctx, sp) and build
            # Column rules against a concrete dtype. This path has no
            # dtype to offer — the factories were previously SKIPPED
            # silently, validating instances that violate the custom
            # assertion (review find). Refuse loudly instead.
            raise SchemaError(
                "custom keywords require the typed compiler "
                "(compile_schema over a typed DataFrame); the "
                "dynamic-JSON path cannot apply Column-factory "
                "keywords: " + ", ".join(sorted(options.custom_keywords)))
        if options.on_depth_exhausted not in ("annotate", "fail",
                                              "ignore", "exact"):
            raise SchemaError("on_depth_exhausted must be 'annotate', "
                              "'fail', 'exact' or 'ignore'")
        if options.on_precision_loss not in ("annotate", "fail",
                                             "ignore", "exact"):
            raise SchemaError("on_precision_loss must be 'annotate', "
                              "'fail', 'exact' or 'ignore'")
        exact_modes = [n for n, v in (
            ("on_precision_loss", options.on_precision_loss),
            ("on_depth_exhausted", options.on_depth_exhausted))
            if v == "exact"]
        if exact_modes:
            # the exact kernel decides degraded rows by spec semantics;
            # refuse option combos whose engine-side custom Python
            # assertions it cannot honor (silently dropping one for
            # exactly the rows this mode exists to get right would be
            # worse than the double view)
            unsupported = [n for n, v in (
                ("custom_keywords", options.custom_keywords),
                ("custom_formats", options.custom_formats),
                ("custom_content_encodings",
                 options.custom_content_encodings),
                ("custom_content_media_types",
                 options.custom_content_media_types)) if v]
            if options.multiple_of_semantics == "reference":
                unsupported.append("multiple_of_semantics='reference'")
            if unsupported:
                raise SchemaError(
                    "/".join(f"{m}='exact'" for m in exact_modes)
                    + " does not support " + ", ".join(unsupported)
                    + "; use 'annotate' or 'fail' with these options")
        meta_validate(schema)
        self.schema = schema
        self.options = options
        # "annotate" mode carries a NAVIGATION-ONLY probe tree
        # (_probe_schema: assertions stripped, branches folded, exhausted
        # $ref sites fail for present values) so with_validation can emit
        # depth_exhausted = NOT probe.valid — "a present value sits at a
        # position beyond the compiled unroll". The probe is a small
        # fraction of the real tree, but the auto-tuner still measures /
        # ground-truth-probes the COMBINED plan (see _measured_size).
        self._node_strict: Node | None = None
        self._probe_is_reach = True
        # "exact" needs the same probe twin as "annotate": it is the
        # JVM-side gate deciding which rows cross to the runtime-
        # recursive kernel
        self._dual = options.on_depth_exhausted in ("annotate", "exact")
        from jsonschema_rs_spark.errors import resolved_ref_depth
        start = resolved_ref_depth(options)
        if options.max_ref_depth is not None:
            # explicit integer: honored verbatim, codegen or not
            ctx = VariantCompileContext(schema, options)
            self.node = compile_variant(schema, ctx, "")
            self.ref_depth = start
        else:
            # AUTO: compile once at the cheap probe depth; if the
            # unroll never actually recursed the plan is identical at
            # every depth and we are done (ref_depth reported as the
            # nominal default). If it recursed, ascend the ladder while
            # the boolean plan stays inside whole-stage codegen —
            # Janino hard-fails methods past 64KB and Spark then falls
            # back to the interpreter for the WHOLE stage (an ERROR log
            # + a several-x slowdown at scale). Unroll depth beyond the
            # instance's real nesting adds nothing, so trading depth
            # for codegen is the right default. Ascending (not
            # descending) matters: a branching recursion's compile cost
            # is exponential in depth, so the deep compiles must never
            # happen when a shallow depth already exceeds the budget.
            memo_key = _depth_memo_key(schema, options)
            cached = _DEPTH_MEMO.get(memo_key) if memo_key else None
            if cached is not None:
                ctx = VariantCompileContext(schema, options,
                                            ref_depth_limit=cached)
                self.node = compile_variant(schema, ctx, "")
                self.ref_depth = cached
            else:
                ctx = VariantCompileContext(
                    schema, options, ref_depth_limit=self._PROBE_DEPTH)
                self.node = compile_variant(schema, ctx, "")
                self.ref_depth = start if not ctx.saw_ref_cycle \
                    else self._PROBE_DEPTH
                cyc = ctx.saw_ref_cycle
                self._depth_measured = False
                if cyc:
                    self._refresh_strict_twin(ctx)
                    ctx = self._autotune_depth(schema, options, start) \
                        or ctx
                if memo_key is not None and (not cyc
                                             or self._depth_measured):
                    # a cyclic schema whose depth could NOT be measured
                    # (no JVM — e.g. Connect) keeps the conservative
                    # probe depth for THIS plan but must not poison the
                    # process-wide memo: a later compile with a live
                    # session should auto-tune normally
                    _DEPTH_MEMO[memo_key] = self.ref_depth
        self._contains_sites = list(ctx.contains_sites)
        # depth-exhaustion observability (options.on_depth_exhausted):
        # schemas that never exhaust (every non-recursive schema, and
        # recursive ones on no path past the unroll) carry no twin —
        # identical plan and output schema as before round 5.
        self.exhausted_sites = list(ctx.exhausted_sites)
        if ctx.saw_depth_exhaustion and self._dual \
                and self._node_strict is None:
            self._refresh_strict_twin(ctx)

    def _refresh_strict_twin(self, ctx) -> None:
        """(Re)compile the depth probe to match self.node's depth, or
        drop it when the current plan has no exhausted sites / the mode
        doesn't want one. Preferred: the navigation-only probe schema
        (tiny). Fallback when the transform can't compile (e.g. a ref
        targets an anchor inside an assertion subtree the transform
        doesn't walk): the full strict twin of the real schema — bigger,
        but always compilable."""
        if not (self._dual and ctx.saw_depth_exhaustion):
            self._node_strict = None
            return
        from dataclasses import replace
        opts = self.options
        # ref targets collected across root + resource docs: a probed
        # document must keep the positions refs POINT AT resolvable,
        # wherever the pointing ref lives (superset is harmless)
        targets = _collect_ref_targets(
            [self.schema, *(opts.resources or {}).values()])
        if opts.resources or opts.retriever is not None:
            res = {}
            for u, doc in (opts.resources or {}).items():
                res[u] = _probe_schema(doc, targets) or {}
            kw = {"resources": res}
            if opts.retriever is not None:
                orig_r = opts.retriever

                def _probe_retrieve(uri, orig_r=orig_r, targets=targets):
                    doc = orig_r(uri)
                    if not _probe_refs_safe(doc):
                        raise SchemaError(
                            "positional $ref pointer in retrieved "
                            "document — probe paths unreliable")
                    return _probe_schema(
                        doc, targets | _collect_ref_targets([doc])) or {}

                kw["retriever"] = _probe_retrieve
            opts = replace(opts, **kw)
        try:
            # positional JSON-pointer refs (#/allOf/0, #/items, ...)
            # can resolve cleanly inside the restructured probe to the
            # WRONG subtree; detect them up front and take the
            # always-faithful twin instead
            if not _probe_refs_safe(self.schema) or any(
                    not _probe_refs_safe(doc)
                    for doc in (self.options.resources or {}).values()):
                raise SchemaError(
                    "positional $ref pointer — probe paths unreliable")
            probe = _probe_schema(self.schema, targets)
            if probe is None:
                raise SchemaError("probe pruned to nothing")
            pctx = VariantCompileContext(probe, opts,
                                         ref_depth_limit=self.ref_depth,
                                         depth_strict=True)
            node = compile_variant(probe, pctx, "")
            if not pctx.saw_depth_exhaustion:
                # the transform lost the exhausting path (e.g. a ref
                # under a keyword it doesn't walk) — probe would be
                # silently signal-free; use the always-faithful twin
                raise SchemaError("probe lost the exhausted site")
            self._node_strict = node
            # reachability semantics: ¬probe.valid = "present value at
            # a beyond-unroll position"
            self._probe_is_reach = True
        except Exception:
            if self.options.on_depth_exhausted == "exact":
                # the twin-fallback signal (lenient != strict) is
                # DISAGREEMENT-based, not presence-based: under
                # polarity-inverting compositions (oneOf/not over
                # recursive branches) both trees can agree on a wrong
                # verdict and the kernel would never be consulted —
                # silently breaking exact mode's full-oracle contract.
                # Refuse instead of under-gating; annotate keeps the
                # fallback (its twin semantics are documented as
                # disagreement-based).
                raise SchemaError(
                    "on_depth_exhausted='exact' needs the reachability "
                    "probe, which this schema defeats (positional $ref "
                    "pointer like '#/allOf/0', or a ref under a keyword "
                    "the probe transform doesn't walk). Rewrite such "
                    "refs through $defs/$anchor, or use "
                    "on_depth_exhausted='annotate'/'fail'.")
            sctx = VariantCompileContext(self.schema, self.options,
                                         ref_depth_limit=self.ref_depth,
                                         depth_strict=True)
            self._node_strict = compile_variant(self.schema, sctx, "")
            # twin semantics: (lenient != strict) = "the verdict is not
            # determined by the checked portion"
            self._probe_is_reach = False

    def _measured_size(self) -> int | None:
        try:
            probe = F.try_parse_json(F.lit("{}"))
            size = len(self.node.valid(probe)._jc.toString())
            if self._node_strict is not None:
                # the runtime plan evaluates BOTH trees (valid +
                # depth_exhausted), so the codegen budget must too
                size += len(self._node_strict.valid(probe)._jc.toString())
            return size
        except Exception:
            return None  # no JVM to measure against (e.g. Connect) —
            # keep the current depth; runtime fallback still works

    def _autotune_depth(self, schema: Any, options: ValidationOptions,
                        start: int) -> "VariantCompileContext | None":
        """Ascend from _PROBE_DEPTH toward `start`, keeping the deepest
        plan that stays inside codegen (by the calibrated size proxy;
        the ambiguous band is decided by a one-row ground-truth probe).
        self.node/self.ref_depth always hold the currently-accepted
        plan; returns the ctx of the last recompile (None = the
        _PROBE_DEPTH ctx from __init__ stands)."""
        tuned = None
        # (node, depth probe, probe kind, depth, ctx) of the last
        # known-good plan
        accepted = None
        depth = self.ref_depth
        while True:
            size = self._measured_size()
            if size is None:
                return tuned
            self._depth_measured = True
            if size <= self._CODEGEN_SAFE_CHARS:
                ok = True
            elif size >= self._CODEGEN_HARD_CHARS:
                ok = False
            else:
                ok = _codegen_probe(self._probe_column) is not False
            if ok:
                if depth >= start:
                    return tuned
                accepted = (self.node, self._node_strict,
                            getattr(self, "_probe_is_reach", True),
                            depth, tuned)
                depth += 1
            else:
                if accepted is not None:
                    (self.node, self._node_strict, self._probe_is_reach,
                     self.ref_depth, tuned) = accepted
                    return tuned
                if depth <= 1:
                    return tuned
                depth -= 1
            tuned = VariantCompileContext(schema, options,
                                          ref_depth_limit=depth)
            self.node = compile_variant(schema, tuned, "")
            self.ref_depth = depth
            self._refresh_strict_twin(tuned)

    def _probe_column(self, json_col: Column) -> Column:
        """The column the ground-truth codegen probe compiles: the full
        runtime surface — valid alone, or (valid, depth_exhausted) as a
        struct when the plan carries the strict twin (a bare struct
        output keeps both children in codegen; only struct(...).field
        gets simplified away)."""
        if self._node_strict is None:
            return self.valid_column(json_col)
        return F.struct(self.valid_column(json_col).alias("v"),
                        self.depth_exhausted_column(json_col).alias("d"))

    def _msg_ctx(self):
        """Message-decorator scope: masked_with analog (error.rs:496-516;
        jsonschema-py mask= lib.rs:739-750). mask → placeholder head;
        message_values → the failing value's JSON text leads the message
        (to_json over the variant). Default: static templates."""
        from contextlib import nullcontext

        from jsonschema_rs_spark.compiler.nodes import (
            masked_message, message_decorator)
        o = self.options
        if o.mask is None and not o.message_values:
            return nullcontext()
        return message_decorator(
            lambda col, template: masked_message(
                template, col, mask=o.mask,
                value_repr=(lambda c: F.to_json(c))
                if o.mask is None else None))

    def valid_column(self, json_col: Column) -> Column:
        v = F.try_parse_json(json_col)
        base = F.when(json_col.isNull(), F.lit(True)) \
            .when(v.isNull(), F.lit(False)) \
            .otherwise(F.coalesce(self.node.valid(v), F.lit(False)))
        if self.options.on_depth_exhausted == "exact" \
                and self._node_strict is not None:
            # rows with content beyond the unroll take the runtime-
            # recursive kernel's verdict (NULL for every in-unroll row
            # — one gated Arrow crossing); precision policy composes
            # AFTER so its conservative contract still holds
            base = F.coalesce(
                self._deep_verdict_col(json_col, v, base), base)
        if self.options.on_precision_loss == "fail":
            # conservative: a row whose numbers the variant parser
            # stored inexactly is never silently validated against the
            # lossy doubles (functions/precision.py)
            from jsonschema_rs_spark.functions.precision import (
                precision_degraded_column)
            base = base & ~precision_degraded_column(json_col)
        elif self.options.on_precision_loss == "exact":
            # degraded rows take the exact-arithmetic verdict (NULL for
            # every clean row — one gated Arrow crossing)
            base = F.coalesce(self._exact_verdict_col(json_col, v), base)
        return base

    def _deep_verdict_col(self, json_col: Column, v: Column,
                          lenient_valid: Column) -> Column:
        """on_depth_exhausted='exact': nullable-bool verdict from the
        runtime-recursive exact kernel for rows whose content goes
        beyond the compiled unroll; NULL for every in-unroll row
        (coalesce with the plan verdict downstream). The gate is the
        same JVM-side depth-exhaustion signal "annotate" exposes, so
        in-unroll rows never leave the Column plan; gated rows are
        re-validated by python-jsonschema, which recurses at runtime
        with no depth limit — the engine analog of the reference's
        validator recursion (validator.rs:34-52). The kernel also
        parses numerics exactly, so a deep row can never regress to
        the lossy double view. NOTE: each call builds its own gated
        UDF — composing valid_column + errors_column by hand pays two
        crossings on deep rows; with_validation() stages the verdict
        once (__dexact) and both consumers read the staged column."""
        from jsonschema_rs_spark.compiler.dialects import detect_dialect
        from jsonschema_rs_spark.functions.precision import (
            exact_kernel_verdict_column)
        o = self.options
        d = detect_dialect(self.schema, o.dialect, o.resources)
        vf = o.validate_formats
        gate = json_col.isNotNull() & v.isNotNull() \
            & self._depth_signal(v, lenient_valid)
        return exact_kernel_verdict_column(
            json_col, gate, self.schema, d.name,
            assert_formats=d.formats_assert_by_default if vf is None
            else bool(vf),
            draft4_numbers=d.draft4_numbers or o.draft4_integer,
            resources=o.resources, retriever=o.retriever,
            base_uri=o.base_uri)

    def _exact_verdict_col(self, json_col: Column,
                           parsed: Column | None = None) -> Column:
        """on_precision_loss='exact': nullable-bool exact verdict for
        degraded rows (functions/precision.py exact_verdict_column);
        NULL for clean rows so callers coalesce with the plan verdict.
        `parsed` = the staged try_parse_json column when available —
        the gate requires the VARIANT parser accepted the text, so the
        kernel never overrides an invalid-JSON verdict (Python's json
        accepts Infinity/NaN, the variant parser does not)."""
        from jsonschema_rs_spark.compiler.dialects import detect_dialect
        from jsonschema_rs_spark.functions.precision import (
            exact_verdict_column)
        o = self.options
        d = detect_dialect(self.schema, o.dialect, o.resources)
        vf = o.validate_formats
        return exact_verdict_column(
            json_col, self.schema, d.name,
            assert_formats=d.formats_assert_by_default if vf is None
            else bool(vf),
            draft4_numbers=d.draft4_numbers or o.draft4_integer,
            resources=o.resources, retriever=o.retriever,
            base_uri=o.base_uri, parsed=parsed)

    def precision_degraded_column(self, json_col: Column) -> Column:
        """True when the document contains >=1 number token the variant
        parser stores inexactly (so this row's verdict may diverge from
        an exact-arithmetic validator like the reference's BigInt/
        BigFraction path). Available in every on_precision_loss mode;
        with_validation() appends it automatically under "annotate"."""
        from jsonschema_rs_spark.functions.precision import (
            precision_degraded_column)
        return precision_degraded_column(json_col)

    def depth_exhausted_column(self, json_col: Column) -> Column:
        """True when the document has content the compiled plan did not
        check: a present value at a position beyond the unroll
        (reachability probe), or — on the strict-twin fallback — when
        the lenient and strict verdicts disagree. Only meaningful in
        "annotate" mode on schemas with exhausted $ref sites; False
        otherwise (including every document shallower than the unroll —
        the failing rule's null guard keeps those agreeing)."""
        if self._node_strict is None:
            return F.lit(False)
        v = F.try_parse_json(json_col)
        return F.when(json_col.isNull() | v.isNull(), F.lit(False)) \
            .otherwise(self._depth_signal(
                v, F.coalesce(self.node.valid(v), F.lit(False))))

    def _depth_signal(self, v: Column, lenient_valid: Column) -> Column:
        probe = F.coalesce(self._node_strict.valid(v), F.lit(False))
        if self._probe_is_reach:
            return ~probe
        return lenient_valid != probe

    _PRECISION_MSG = ("number exceeds the variant parser's exact "
                      "precision (stored as a lossy double)")
    _EXACT_MSG = ("exact-arithmetic validation failed (document contains "
                  "numbers beyond the variant parser's exact precision; "
                  "verdict from the exact kernel)")
    _DEPTH_EXACT_MSG = ("content beyond the compiled unroll depth failed "
                        "validation (verdict from the runtime-recursive "
                        "exact kernel)")

    def _precision_error_tail(self, json_col: Column, v: Column) -> Column:
        """Extra error array appended under on_precision_loss='fail':
        one 'number' row for parseable-but-degraded documents."""
        from jsonschema_rs_spark.functions.precision import (
            precision_degraded_column)
        return F.when(
            json_col.isNotNull() & v.isNotNull()
            & precision_degraded_column(json_col),
            one_error(F.lit(""), "", "number", self._PRECISION_MSG)) \
            .otherwise(empty_errors())

    def errors_column(self, json_col: Column) -> Column:
        v = F.try_parse_json(json_col)
        with self._msg_ctx():
            errs = F.when(json_col.isNull(), empty_errors()) \
                .when(v.isNull(),
                      one_error(F.lit(""), "", "json",
                                "invalid JSON document")) \
                .otherwise(self.node.errors(v, F.lit("")))
        if self.options.on_depth_exhausted == "exact" \
                and self._node_strict is not None:
            # deep rows take the kernel's verdict: kernel-valid → no
            # errors; kernel-invalid → the plan's (possibly empty)
            # detail plus one distinguished '$ref' row. Precision
            # policy composes AFTER so its tail survives on deep rows.
            plan_valid = F.when(json_col.isNull(), F.lit(True)) \
                .when(v.isNull(), F.lit(False)) \
                .otherwise(F.coalesce(self.node.valid(v), F.lit(False)))
            deep = self._deep_verdict_col(json_col, v, plan_valid)
            errs = F.when(
                deep.isNotNull(),
                F.when(deep, empty_errors()).otherwise(F.concat(
                    errs, one_error(F.lit(""), "", "$ref",
                                    self._DEPTH_EXACT_MSG)))) \
                .otherwise(errs)
        if self.options.on_precision_loss == "fail":
            errs = F.concat(errs, self._precision_error_tail(json_col, v))
        elif self.options.on_precision_loss == "exact":
            # exact-valid rows report NO errors (the double-view rows
            # are overruled); exact-invalid rows get the double-view
            # detail plus one distinguished 'number' row
            exact = self._exact_verdict_col(json_col, v)
            errs = F.when(
                exact.isNotNull(),
                F.when(exact, empty_errors()).otherwise(F.concat(
                    errs, one_error(F.lit(""), "", "number",
                                    self._EXACT_MSG)))) \
                .otherwise(errs)
        return errs

    def with_validation(self, df: DataFrame, json_col: str,
                        mode: str = "flag") -> DataFrame:
        # stage the parsed variant AND its type string once (projection
        # barriers): every rule references the staged columns instead of
        # re-running the parse / schema_of_variant — same staging
        # discipline as the dedup/text operators
        if mode not in ("flag", "verbose"):
            raise ValueError(f"unknown mode {mode!r}")
        staged = df.withColumn("__v", F.try_parse_json(F.col(json_col))) \
            .withColumn("__vt", F.schema_of_variant(F.col("__v")))
        jc, v = F.col(json_col), F.col("__v")
        opl = self.options.on_precision_loss
        temps = ["__v", "__vt", "__bvalid"]
        if opl == "exact":
            # staged once: nullable exact verdict (NULL = clean row);
            # feeds `valid` and the verbose error tail in one crossing
            staged = staged.withColumn(
                "__pexact", self._exact_verdict_col(jc, v))
            temps.append("__pexact")
        elif opl != "ignore":
            # staged once: the pUDF prefilter/verdict feeds `valid`
            # (fail), `errors` (fail) and/or the annotate column without
            # re-crossing to Python per consumer
            from jsonschema_rs_spark.functions.precision import (
                precision_degraded_column)
            staged = staged.withColumn(
                "__pdeg", precision_degraded_column(jc))
            temps.append("__pdeg")
        _vt_stage().append((v, F.col("__vt")))

        def _depth_col(valid_col):
            # annotate-mode observability over the staged variant; the
            # already-computed schema-only `__bvalid` column feeds the
            # strict-twin fallback so only the probe tree is added to
            # the plan (and a precision-failed row can never masquerade
            # as depth-exhausted)
            return F.when(jc.isNull() | v.isNull(), F.lit(False)) \
                .otherwise(self._depth_signal(v, valid_col))

        try:
            # schema-only verdict; on_precision_loss='fail' tightens the
            # public `valid` but depth observability keeps reading the
            # schema-only column
            bvalid = F.when(jc.isNull(), F.lit(True)) \
                .when(v.isNull(), F.lit(False)) \
                .otherwise(F.coalesce(self.node.valid(v), F.lit(False)))
            has_deep = self.options.on_depth_exhausted == "exact" \
                and self._node_strict is not None
            core = F.col("__bvalid")
            if has_deep:
                # staged once: nullable kernel verdict for beyond-unroll
                # rows (NULL = in-unroll); feeds `valid` and the verbose
                # error tail in one crossing
                core = F.coalesce(F.col("__dexact"), core)
                temps.append("__dexact")
            if opl == "fail":
                final_valid = core & ~F.col("__pdeg")
            elif opl == "exact":
                final_valid = F.coalesce(F.col("__pexact"), core)
            else:
                final_valid = core
            out = staged.withColumn("__bvalid", bvalid)
            if has_deep:
                out = out.withColumn(
                    "__dexact",
                    self._deep_verdict_col(jc, v, F.col("__bvalid")))
            out = out.withColumn("valid", final_valid)
            if mode == "verbose":
                # two context weights (validator.rs:106-109): the boolean
                # plan decides validity; error construction only runs on
                # failing rows
                with self._msg_ctx():
                    body = self.node.errors(v, F.lit(""))
                    if opl == "fail":
                        body = F.concat(body, F.when(
                            F.col("__pdeg"),
                            one_error(F.lit(""), "", "number",
                                      self._PRECISION_MSG))
                            .otherwise(empty_errors()))
                    elif opl == "exact":
                        # only exact-INVALID rows reach `body` (valid
                        # rows short-circuit to empty above); append
                        # the distinguished exact-kernel row for them
                        body = F.concat(body, F.when(
                            F.col("__pexact").isNotNull()
                            & ~F.col("__pexact"),
                            one_error(F.lit(""), "", "number",
                                      self._EXACT_MSG))
                            .otherwise(empty_errors()))
                    if has_deep:
                        # only kernel-INVALID deep rows reach `body`
                        # (kernel-valid rows short-circuit to empty);
                        # append the distinguished '$ref' kernel row
                        body = F.concat(body, F.when(
                            F.col("__dexact").isNotNull()
                            & ~F.col("__dexact"),
                            one_error(F.lit(""), "", "$ref",
                                      self._DEPTH_EXACT_MSG))
                            .otherwise(empty_errors()))
                    errs = F.when(F.col("valid"), empty_errors()) \
                        .when(v.isNull(),
                              one_error(F.lit(""), "", "json",
                                        "invalid JSON document")) \
                        .otherwise(body)
                out = out.withColumn("errors", errs)
            if self._node_strict is not None:
                out = out.withColumn(
                    "depth_exhausted", _depth_col(F.col("__bvalid")))
            if opl == "annotate":
                out = out.withColumn(
                    "precision_degraded", F.col("__pdeg"))
            elif opl == "exact":
                # same observability column: True = this row's verdict
                # came from the exact kernel rather than the plan
                out = out.withColumn(
                    "precision_degraded", F.col("__pexact").isNotNull())
            return out.drop(*temps)
        finally:
            _vt_stage().pop()


    def with_output(self, df: DataFrame, json_col: str,
                    format: str = "hierarchical",
                    out_col: str = "output") -> DataFrame:
        """Append the Structured Output v1 serialization (JSON string)
        per row: format='hierarchical' → the nested unit tree,
        'list' → {"valid":…, "details":[flat units]} — the analog of
        evaluation.rs hierarchical() :416 / list() :252. One projection,
        no shuffle (compiler/output.py)."""
        from jsonschema_rs_spark.compiler.output import OutputPlan
        if format not in ("hierarchical", "list"):
            raise ValueError(f"unknown output format {format!r}")
        plan = OutputPlan(self.schema, self.options)
        # stage the parse in its own projection: the unit tree references
        # the instance many times inside interpreted HOF lambdas, which
        # re-evaluate an embedded try_parse_json per reference (2x at
        # sf0.1); CollapseProject keeps the barrier because the staged
        # column is non-cheap and multiply-referenced
        tmp = f"__jrs_out_variant_{out_col}"
        staged = df.withColumn(tmp, F.try_parse_json(F.col(json_col)))
        col = plan.hierarchical_column_from_variant(F.col(tmp)) \
            if format == "hierarchical" \
            else plan.list_column_from_variant(F.col(tmp))
        return staged.withColumn(out_col, col).drop(tmp)

    def with_contains_annotations(self, df: DataFrame,
                                  json_col: str) -> DataFrame:
        """Append `annotations`: map<schema_path, array<int>> of the
        0-based indices each top-level `contains` site matched — the
        analog of the reference's contains annotations
        (contains.rs:60-105: EvaluationResult::Valid { annotations:
        indices }). Nested (per-sub-instance) annotation trees are out
        of scope; top-level contains covers the span/array shapes the
        engine validates. Non-arrays annotate an empty list, mirroring
        the reference's empty-annotation branch."""
        if not self._contains_sites:
            return df.withColumn(
                "annotations",
                F.expr("CAST(map() AS map<string,array<int>>)"))
        v = F.try_parse_json(F.col(json_col))

        def match_idx(node):
            # closure factory, not a default-arg lambda: PySpark derives
            # HOF arity from the Python signature
            return lambda x, i: F.when(
                F.coalesce(node.valid(x), F.lit(False)), i) \
                .otherwise(F.lit(-1))

        entries = []
        for sp_, node in self._contains_sites:
            arr = _as_array(v)
            idx = F.filter(F.transform(arr, match_idx(node)),
                           lambda i: i >= 0)
            entries.append(F.lit(sp_))
            entries.append(F.when(_is_array(v), idx.cast("array<int>"))
                           .otherwise(F.expr("CAST(array() AS array<int>)")))
        return df.withColumn("annotations", F.create_map(*entries))


def compile_json_schema(schema: Any,
                        options: ValidationOptions | None = None
                        ) -> CompiledJsonSchema:
    return CompiledJsonSchema(schema, options)
