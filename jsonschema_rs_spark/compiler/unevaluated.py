"""unevaluatedProperties / unevaluatedItems for the TYPED compiler.

Mirror of the variant-path implementation (compiler/variant.py) against
typed columns, and of the reference's compile-time walk + runtime
evaluation tracking (keywords/unevaluated_properties.rs:223-554,
unevaluated_items.rs:218-509):

- struct columns: field names are static, so coverage by `properties` /
  `patternProperties` is decided per field with CONSTANT-folded
  expressions (patterns through the same ECMA->Java translation the
  validator matches with — Python `re` diverged on named groups and
  `$`); only in-place-applicator coverage (valid-branch-conditioned)
  remains a runtime Column condition
- map columns: keys are dynamic → forall over map entries with runtime
  name matching
- arrays: index coverage from prefixItems / items / contains matches /
  applicator branches

The walks follow the same reach rules as the variant coverage walks:
the DIALECT-EFFECTIVE view of every node (a keyword the active draft
ignores annotates nothing), $ref/$dynamicRef/$recursiveRef targets
(cycle-guarded via ctx._active_refs, like compile_node), if/then/else
conditioned on the `if` verdict, and dependentSchemas conditioned on
key presence. Refs resolve against the ORIGINAL schema object — a
fresh sibling dict would lose the object-identity key into the
registry's base-URI map under nested $id resources.

"Evaluated" follows 2020-12 annotation semantics: a branch's
properties/items only count where the branch VALIDATES the instance.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jsonschema_rs_spark.compiler.nodes import Rule

# fn(instance_col, key_name: str) -> Column  (static-key form, structs)
# fn(instance_col, key_col: Column) -> Column (dynamic-key form, maps)


_REF_RESOLVERS = (
    ("$ref", lambda ctx, r, orig: ctx.resolve_ref(r, orig)),
    ("$dynamicRef",
     lambda ctx, r, orig: ctx.registry.resolve_dynamic_in_scope(
         r, orig, ctx._dyn_scope)),
    ("$recursiveRef",
     lambda ctx, r, orig: ctx.registry.resolve_recursive()),
)


def _ref_targets(schema: dict, orig: Any, ctx, tag: str):
    """Yield (guard_key, target) for each ref keyword present, skipping
    active cycles (same discipline as compile_node's _active_refs) and
    unresolvable refs (the validator itself raises on those first)."""
    for kw, resolver in _REF_RESOLVERS:
        ref = schema.get(kw)
        if not isinstance(ref, str):
            continue
        key = (tag + ":" + kw + ":" + ref, "")
        if key in ctx._active_refs:
            continue
        try:
            target = resolver(ctx, ref, orig)
        except Exception:
            continue
        yield key, target


def struct_key_coverage(schema: Any, dt: T.StructType, ctx, compile_node,
                        referrer: Any = None
                        ) -> Callable[[Column, str], Column]:
    """Coverage for a STATIC field name: returns a Column condition (often
    a literal) under which `name` counts as evaluated."""
    if not isinstance(schema, dict):
        return lambda c, name: F.lit(False)
    orig = referrer if referrer is not None else schema
    schema = ctx.dialect.effective(schema)

    props = tuple(schema.get("properties", {}) or {})
    pats = tuple(ctx.regex(p)
                 for p in (schema.get("patternProperties", {}) or {}))
    blanket = "additionalProperties" in schema \
        or "unevaluatedProperties" in schema

    branch_parts = []  # (node, coverage) for in-place applicators
    for kw in ("allOf", "anyOf", "oneOf"):
        for sub in schema.get(kw, []) or []:
            node = compile_node(sub, dt, ctx, "/__cov")
            cov = struct_key_coverage(sub, dt, ctx, compile_node)
            branch_parts.append((node, cov))
    ref_covs = []
    for key, target in _ref_targets(schema, orig, ctx, "covS"):
        ctx._active_refs.add(key)
        try:
            ref_covs.append(struct_key_coverage(target, dt, ctx,
                                                compile_node))
        finally:
            ctx._active_refs.discard(key)
    ite = None
    if "if" in schema:
        ite = (
            compile_node(schema["if"], dt, ctx, "/__cov"),
            struct_key_coverage(schema["if"], dt, ctx, compile_node),
            struct_key_coverage(schema.get("then", {}), dt, ctx,
                                compile_node),
            struct_key_coverage(schema.get("else", {}), dt, ctx,
                                compile_node),
        )
    deps = []
    if "dependentSchemas" in schema:
        for dk, sub in schema["dependentSchemas"].items():
            deps.append((dk, struct_key_coverage(sub, dt, ctx,
                                                 compile_node)))

    def covered(c: Column, name: str) -> Column:
        # patterns matched with the VALIDATOR's Java semantics via a
        # constant-folded rlike on the literal name (Python re silently
        # diverged: (?<g>...) raised re.error -> "no match")
        out = F.lit(blanket or name in props)
        for jp in pats:
            out = out | F.lit(name).rlike(jp)
        for node, cov in branch_parts:
            out = out | (F.coalesce(node.valid(c), F.lit(False))
                         & cov(c, name))
        for rc in ref_covs:
            out = out | rc(c, name)
        if ite is not None:
            if_node, if_cov, then_cov, else_cov = ite
            ok = F.coalesce(if_node.valid(c), F.lit(False))
            out = out | F.when(ok, if_cov(c, name) | then_cov(c, name)) \
                .otherwise(else_cov(c, name))
        for dk, cov in deps:
            present = c.getField(dk).isNotNull() \
                if dk in [f.name for f in dt.fields] else F.lit(False)
            out = out | (present & cov(c, name))
        return out

    return covered


def map_key_coverage(schema: Any, dt: T.MapType, ctx, compile_node,
                     referrer: Any = None
                     ) -> Callable[[Column, Column], Column]:
    if not isinstance(schema, dict):
        return lambda c, k: F.lit(False)
    orig = referrer if referrer is not None else schema
    schema = ctx.dialect.effective(schema)
    names = tuple(schema.get("properties", {}).keys())
    pats = tuple(ctx.regex(p) for p in schema.get("patternProperties", {}))
    blanket = "additionalProperties" in schema \
        or "unevaluatedProperties" in schema
    branch_parts = []
    ref_covs = []
    ite = None
    deps = []
    with ctx.in_hof():  # covered() renders inside F.forall lambdas
        for kw in ("allOf", "anyOf", "oneOf"):
            for sub in schema.get(kw, []) or []:
                node = compile_node(sub, dt, ctx, "/__cov")
                cov = map_key_coverage(sub, dt, ctx, compile_node)
                branch_parts.append((node, cov))
        for key, target in _ref_targets(schema, orig, ctx, "covM"):
            ctx._active_refs.add(key)
            try:
                ref_covs.append(map_key_coverage(target, dt, ctx,
                                                 compile_node))
            finally:
                ctx._active_refs.discard(key)
        if "if" in schema:
            ite = (
                compile_node(schema["if"], dt, ctx, "/__cov"),
                map_key_coverage(schema["if"], dt, ctx, compile_node),
                map_key_coverage(schema.get("then", {}), dt, ctx,
                                 compile_node),
                map_key_coverage(schema.get("else", {}), dt, ctx,
                                 compile_node),
            )
        if "dependentSchemas" in schema:
            for dk, sub in schema["dependentSchemas"].items():
                deps.append((dk, map_key_coverage(sub, dt, ctx,
                                                  compile_node)))

    def covered(c: Column, k: Column) -> Column:
        out = F.lit(True) if blanket else (
            k.isin(*names) if names else F.lit(False))
        for p in pats:
            out = out | k.rlike(p)
        for node, cov in branch_parts:
            out = out | (F.coalesce(node.valid(c), F.lit(False)) & cov(c, k))
        for rc in ref_covs:
            out = out | rc(c, k)
        if ite is not None:
            if_node, if_cov, then_cov, else_cov = ite
            ok = F.coalesce(if_node.valid(c), F.lit(False))
            out = out | F.when(ok, if_cov(c, k) | then_cov(c, k)) \
                .otherwise(else_cov(c, k))
        for dk, cov in deps:
            out = out | (F.map_contains_key(c, F.lit(dk)) & cov(c, k))
        return out

    return covered


def index_coverage(schema: Any, dt: T.ArrayType, ctx, compile_node,
                   referrer: Any = None
                   ) -> Callable[[Column, Column, Column], Column]:
    """fn(array_col, idx0, el) -> Column."""
    if not isinstance(schema, dict):
        return lambda c, i, el: F.lit(False)
    orig = referrer if referrer is not None else schema
    schema = ctx.dialect.effective(schema)
    items = schema.get("items")
    if isinstance(items, list):  # draft 4-7 positional form
        nprefix = len(items)
        has_rest = "additionalItems" in schema
    else:
        nprefix = len(schema.get("prefixItems", []) or [])
        has_rest = items is not None
    blanket = has_rest or "unevaluatedItems" in schema
    branch_parts = []
    ref_covs = []
    ite = None
    with ctx.in_hof():  # covered() renders inside F.transform lambdas
        cnode = compile_node(schema["contains"], dt.elementType, ctx,
                             "/__cov") if "contains" in schema else None
        for kw in ("allOf", "anyOf", "oneOf"):
            for sub in schema.get(kw, []) or []:
                node = compile_node(sub, dt, ctx, "/__cov")
                cov = index_coverage(sub, dt, ctx, compile_node)
                branch_parts.append((node, cov))
        for key, target in _ref_targets(schema, orig, ctx, "covI"):
            ctx._active_refs.add(key)
            try:
                ref_covs.append(index_coverage(target, dt, ctx,
                                               compile_node))
            finally:
                ctx._active_refs.discard(key)
        if "if" in schema:
            ite = (
                compile_node(schema["if"], dt, ctx, "/__cov"),
                index_coverage(schema["if"], dt, ctx, compile_node),
                index_coverage(schema.get("then", {}), dt, ctx,
                               compile_node),
                index_coverage(schema.get("else", {}), dt, ctx,
                               compile_node),
            )

    def covered(c: Column, i: Column, el: Column) -> Column:
        out = F.lit(True) if blanket else (
            (i < nprefix) if nprefix else F.lit(False))
        if cnode is not None:
            out = out | F.coalesce(cnode.valid(el), F.lit(False))
        for node, cov in branch_parts:
            out = out | (F.coalesce(node.valid(c), F.lit(False))
                         & cov(c, i, el))
        for rc in ref_covs:
            out = out | rc(c, i, el)
        if ite is not None:
            if_node, if_cov, then_cov, else_cov = ite
            ok = F.coalesce(if_node.valid(c), F.lit(False))
            out = out | F.when(ok, if_cov(c, i, el) | then_cov(c, i, el)) \
                .otherwise(else_cov(c, i, el))
        return out

    return covered


def build_unevaluated_rules(schema: dict, dt: T.DataType, ctx, sp: str,
                            compile_node, referrer: Any = None) -> list[Rule]:
    rules: list[Rule] = []

    def _sibling(drop: str) -> dict:
        # base the walk on the ORIGINAL node when the caller provides
        # it (object identity keys the registry's base-URI map); the
        # walk re-applies dialect gating itself
        src = referrer if isinstance(referrer, dict) else schema
        return {k: v for k, v in src.items() if k != drop}

    if "unevaluatedProperties" in schema:
        up = schema["unevaluatedProperties"]
        sibling = _sibling("unevaluatedProperties")
        if isinstance(dt, T.StructType):
            cov = struct_key_coverage(sibling, dt, ctx, compile_node,
                                      referrer=referrer)
            up_nodes = {} if up is False else {
                f.name: compile_node(up, f.dataType, ctx,
                                     sp + "/unevaluatedProperties")
                for f in dt.fields}

            def up_pred(c: Column, dt=dt, cov=cov, up=up,
                        up_nodes=up_nodes) -> Column:
                out = F.lit(True)
                for f in dt.fields:
                    ok = c.getField(f.name).isNull() | cov(c, f.name)
                    if up is not False:
                        ok = ok | F.coalesce(
                            up_nodes[f.name].valid(c.getField(f.name)),
                            F.lit(False))
                    out = out & ok
                return out

            rules.append(Rule("unevaluatedProperties",
                              sp + "/unevaluatedProperties",
                              "unevaluated properties present", up_pred,
                              priority=40))
        elif isinstance(dt, T.MapType):
            cov = map_key_coverage(sibling, dt, ctx, compile_node,
                                   referrer=referrer)
            with ctx.in_hof():  # applied per entry inside F.forall
                node = None if up is False else compile_node(
                    up, dt.valueType, ctx, sp + "/unevaluatedProperties")

            def up_pred_m(c: Column, cov=cov, node=node) -> Column:
                def entry_ok(e):
                    ok = cov(c, e["key"])
                    if node is not None:
                        ok = ok | F.coalesce(node.valid(e["value"]),
                                             F.lit(False))
                    return ok
                return F.forall(F.map_entries(c), entry_ok)

            rules.append(Rule("unevaluatedProperties",
                              sp + "/unevaluatedProperties",
                              "unevaluated properties present", up_pred_m,
                              priority=40))

    if "unevaluatedItems" in schema and isinstance(dt, T.ArrayType):
        ui = schema["unevaluatedItems"]
        sibling = _sibling("unevaluatedItems")
        icov = index_coverage(sibling, dt, ctx, compile_node,
                              referrer=referrer)
        with ctx.in_hof():  # applied per element inside F.transform
            node = None if ui is False else compile_node(
                ui, dt.elementType, ctx, sp + "/unevaluatedItems")

        def ui_pred(c: Column, icov=icov, node=node) -> Column:
            def el_ok(el, i):
                ok = icov(c, i, el)
                if node is not None:
                    ok = ok | F.coalesce(node.valid(el), F.lit(False))
                return ok
            return F.forall(F.transform(c, el_ok), lambda b: b)

        rules.append(Rule("unevaluatedItems", sp + "/unevaluatedItems",
                          "unevaluated items present", ui_pred,
                          priority=40))
    return rules
