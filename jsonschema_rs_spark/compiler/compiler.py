"""Schema → Column-expression-plan compiler.

The analog of the reference's build pipeline (crates/jsonschema/src/
compiler.rs:671-723): meta-validate the schema, resolve $ref targets from
an in-memory registry, then recursively compile each keyword into a Rule
(Column-expression builder) — all on the driver; executors only ever see
the finished Catalyst plan. Recursive $refs are depth-bounded by the Spark
dtype itself: each structural keyword consumes dtype depth, and a $ref
cycle that consumes none is rejected like the reference's circular-ref
detection (compiler.rs:323-338).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import types as T

from jsonschema_rs_spark.compiler import keywords as K
from jsonschema_rs_spark.compiler.nodes import Node, Rule
from jsonschema_rs_spark.errors import SchemaError, ValidationOptions
from jsonschema_rs_spark.regex.ecma import ecma_to_java, \
    nonlinear_construct
from jsonschema_rs_spark.spec.model import meta_validate


def _check_pattern_engine(pattern: str, options: ValidationOptions) -> None:
    """PatternOptions.regex() (linear engine): reject lookaround /
    backreference patterns at compile time, mirroring the regex crate's
    build errors under the reference's with_pattern_options
    (options.rs:647-876). Default (backtracking) allows everything the
    JVM engine supports."""
    po = options.pattern_options
    if po is None or po.engine != "linear":
        return
    bad = nonlinear_construct(pattern)
    if bad is not None:
        raise SchemaError(
            f"pattern {pattern!r} uses {bad}, which the linear-time "
            "regex engine (PatternOptions.regex()) does not support",
            "pattern")


class CompileContext:
    def __init__(self, root_schema: Any, options: ValidationOptions):
        from jsonschema_rs_spark.compiler.dialects import detect_dialect
        from jsonschema_rs_spark.compiler.registry import RefRegistry

        self.root = root_schema
        self.dialect = detect_dialect(root_schema, options.dialect,
                                      options.resources)
        if self.dialect.draft4_numbers and not options.draft4_integer:
            # draft-4 dialect implies draft-4 integer semantics on the
            # typed path (keywords/legacy/type_draft_4.rs:91-155)
            import dataclasses
            options = dataclasses.replace(options, draft4_integer=True)
        self.options = options
        self._regex_cache: dict[str, str] = {}
        # >0 while compiling a subschema that will be embedded in a
        # Spark higher-order-function lambda (array items / map values):
        # no Python UDF may appear there (Spark UNSUPPORTED_FEATURE.
        # LAMBDA_FUNCTION_WITH_PYTHON_UDF) — same discipline as
        # VariantCompileContext.hof_depth
        self.hof_depth = 0
        # compile-path dynamic scope for $dynamicRef (see variant.py /
        # registry.resolve_dynamic_in_scope)
        self._dyn_scope: list[str] = []
        # active (ref_pointer, dtype) pairs — structural-progress cycle guard
        self._active_refs: set[tuple[str, str]] = set()
        self.registry = RefRegistry(root_schema, options.resources,
                                    legacy_id=self.dialect.legacy_id,
                                    retriever=options.retriever,
                                    base_uri=options.base_uri)

    def in_hof(self):
        """Context manager marking the enclosed compile as HOF-lambda-
        embedded (see hof_depth)."""
        import contextlib

        @contextlib.contextmanager
        def _guard():
            self.hof_depth += 1
            try:
                yield
            finally:
                self.hof_depth -= 1

        return _guard()

    def regex(self, ecma_pattern: str) -> str:
        """ECMA→Java translation with a compile-once cache, mirroring the
        reference's pattern cache (compiler.rs:514-594). Under
        PatternOptions.regex() (linear engine), lookaround/backreference
        patterns are BUILD errors like the regex crate's
        (options.rs:850-876)."""
        if ecma_pattern not in self._regex_cache:
            _check_pattern_engine(ecma_pattern, self.options)
            self._regex_cache[ecma_pattern] = ecma_to_java(ecma_pattern)
        return self._regex_cache[ecma_pattern]

    def resolve_ref(self, ref: str, referrer: Any = None) -> Any:
        """$id/$anchor-aware in-document resolution (registry.py)."""
        return self.registry.resolve(ref, referrer
                                     if referrer is not None else self.root)


def compile_node(schema: Any, dt: T.DataType, ctx: CompileContext,
                 sp: str = "") -> Node:
    """Compile one (sub)schema against a Spark dtype into a Node."""
    if schema is True or schema == {}:
        return Node([])
    if schema is False:
        from pyspark.sql import functions as F

        return Node([Rule("false", sp, "schema is false: nothing is valid",
                          lambda c: F.lit(False), priority=0)])
    if not isinstance(schema, dict):
        raise SchemaError(f"schema must be bool or object, got {type(schema)}", sp)

    # dialect gating (dialects.py): inapplicable keywords are dropped,
    # $ref siblings removed in exclusive-$ref drafts; refs resolve
    # against the ORIGINAL node (identity keys the base-URI scope)
    orig = schema
    schema = ctx.dialect.effective(schema)

    base = ctx.registry.base_of(orig)
    pushed_scope = not ctx._dyn_scope or ctx._dyn_scope[-1] != base
    if pushed_scope:
        ctx._dyn_scope.append(base)
    try:
        return _compile_node_body(orig, schema, dt, ctx, sp)
    finally:
        if pushed_scope:
            ctx._dyn_scope.pop()


def _compile_node_body(orig: Any, schema: dict, dt: T.DataType,
                       ctx: CompileContext, sp: str) -> Node:
    rules: list[Rule] = []

    for kw, resolver in (("$ref", lambda r: ctx.resolve_ref(r, orig)),
                         ("$dynamicRef",
                          lambda r: ctx.registry.resolve_dynamic_in_scope(
                              r, orig, ctx._dyn_scope)),
                         ("$recursiveRef",
                          lambda r: ctx.registry.resolve_recursive())):
        if kw not in schema:
            continue
        ref = schema[kw]
        key = (kw + ":" + ref, dt.simpleString())
        if key in ctx._active_refs:
            # cycle without structural progress: infinitely-recursive schema
            # over a finite dtype — vacuously satisfiable; stop unrolling
            pass
        else:
            ctx._active_refs.add(key)
            try:
                target = resolver(ref)
                sub = compile_node(target, dt, ctx, sp + "/" + kw)
                rules.extend(sub.rules)
            finally:
                ctx._active_refs.discard(key)

    if "type" in schema:
        rules += K.build_type(schema, dt, ctx, sp)
    if "const" in schema:
        rules += K.build_const(schema, dt, ctx, sp)
    if "enum" in schema:
        rules += K.build_enum(schema, dt, ctx, sp)
    rules += K.build_bounds(schema, dt, ctx, sp)
    if "multipleOf" in schema:
        rules += K.build_multiple_of(schema, dt, ctx, sp)
    rules += K.build_string_rules(schema, dt, ctx, sp)
    rules += K.build_array_rules(schema, dt, ctx, sp, compile_node)
    rules += K.build_object_rules(schema, dt, ctx, sp, compile_node)
    rules += K.build_composition(schema, dt, ctx, sp, compile_node)
    from jsonschema_rs_spark.compiler.unevaluated import \
        build_unevaluated_rules
    rules += build_unevaluated_rules(schema, dt, ctx, sp, compile_node,
                                    referrer=orig)

    # custom keywords (reference: keywords/custom.rs, options.rs:482)
    for name, factory in ctx.options.custom_keywords.items():
        if name in schema:
            rule = factory(schema[name], dt, ctx, sp)
            if rule is not None:
                rules.append(rule)

    from jsonschema_rs_spark.compiler.nodes import apply_reference_messages
    apply_reference_messages(rules, schema)
    return Node(rules)


def compile_schema(schema: Any, spark_schema: T.DataType | T.StructType,
                   options: ValidationOptions | None = None,
                   column: str | None = None) -> "CompiledSchema":
    """Compile `schema` for a DataFrame of `spark_schema`.

    column=None: the schema describes the whole row (root object whose
    properties are the DataFrame's columns). column='c': the schema
    describes that single column.
    """
    from jsonschema_rs_spark.plans.plan import CompiledSchema

    options = options or ValidationOptions()
    meta_validate(schema)
    ctx = CompileContext(schema, options)
    if column is not None:
        if not isinstance(spark_schema, T.StructType):
            raise SchemaError("spark_schema must be a StructType")
        dt = dict((f.name, f.dataType) for f in spark_schema.fields)[column]
        node = compile_node(schema, dt, ctx, "")
        return CompiledSchema(node, options, column=column)
    node = compile_node(schema, spark_schema, ctx, "")
    return CompiledSchema(node, options, column=None)
