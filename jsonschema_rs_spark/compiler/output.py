"""Structured Output v1: `list` and `hierarchical` formats with
annotations — the analog of the reference's Evaluation tree
(crates/jsonschema/src/evaluation.rs:209-526: list() :252,
hierarchical() :416, iter_annotations() :458) re-expressed as ONE Column
expression producing the serialized output JSON per row.

Design: the schema's structure is known at compile time, so the nested
unit tree has STATIC depth — each evaluation unit is a compile-time JSON
template (evaluationPath / schemaLocation literals) whose dynamic parts
(valid, instanceLocation, annotations, details for array elements) are
Column expressions concatenated into the template. Arrays use
`transform` to emit one child-unit JSON per element, so row size stays
proportional to the instance. No UDF, no shuffle: the whole output is
one projection, embarrassingly parallel at any scale.

Unit semantics matched to the reference:
- every keyword evaluated gets a unit; subschema roots get a unit whose
  `details` are their keyword units
- annotations on success: `properties` → matched property names,
  `prefixItems` → largest applied index (or true for the whole array),
  `items` → true when it applied to ≥1 element, `contains` → matched
  indices; an invalid unit that would have annotated emits
  `droppedAnnotations: true` instead (evaluation.rs droppedAnnotations)
- `$ref` adds `/$ref` to the evaluationPath while the schemaLocation
  jumps to the target's canonical `base#pointer` (registry.location_of)
- failing ASSERTION units carry `errors: {keyword: message}` — static
  engine templates by default (masking-safe; the spec does not pin
  message text); under `options.message_values` the catalog keywords
  render reference-parity messages (error.rs:1330-1560 Display impl,
  e.g. `"oops" is not of type "integer"` — the documented
  evaluation.rs example trees diff cleanly including messages)

`patternProperties` / `additionalProperties` / `unevaluatedProperties`
emit per-matching-name subtrees (the property NAME is dynamic, so the
child units are built inside a `transform` over `map_entries` with the
name escaped JSON-Pointer-then-JSON on the Column side; the subschema's
unit tree is still one compile-time expression), and `unevaluatedItems`
emits per-unevaluated-index subtrees; both unevaluated* units use the
validator's own dynamic validity-conditioned coverage walk, so their
validity is keyword-accurate. `propertyNames` emits one child subtree
per property name (the name lifted to a string instance, as the
reference does — property_names.rs:26); `not` nests its subschema's
tree and inverts validity; `if`/`then`/`else` and `dependentSchemas`
nest their branch trees, conditioned on the `if` outcome / trigger-key
presence. Remaining deviation: without `message_values`, error messages
are engine templates (the spec does not pin message text).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from jsonschema_rs_spark.compiler.variant import (
    VariantCompileContext,
    _as_array,
    _as_map,
    _index_coverage,
    _is_array,
    _is_object,
    _key_coverage,
    compile_variant,
)
from jsonschema_rs_spark.errors import (ValidationOptions,
                                        resolved_ref_depth)

# assertion keywords compiled as single-keyword micro-schemas; the listed
# companions ride along (their semantics are coupled)
_ASSERTIONS: list[tuple[str, tuple[str, ...]]] = [
    ("type", ()),
    ("const", ()),
    ("enum", ()),
    ("minimum", ("exclusiveMinimum",)),
    ("maximum", ("exclusiveMaximum",)),
    ("exclusiveMinimum", ("minimum",)),
    ("exclusiveMaximum", ("maximum",)),
    ("multipleOf", ()),
    ("minLength", ()),
    ("maxLength", ()),
    ("pattern", ()),
    ("format", ()),
    ("required", ()),
    ("minProperties", ()),
    ("maxProperties", ()),
    ("minItems", ()),
    ("maxItems", ()),
    ("uniqueItems", ()),
    ("dependentRequired", ()),
    ("contentEncoding", ()),
    ("contentMediaType", ()),
]



def _j(s: str) -> str:
    """JSON-escape a compile-time string WITHOUT the surrounding quotes."""
    return json.dumps(s)[1:-1]


def _jbool(c: Column) -> Column:
    return F.when(c, F.lit("true")).otherwise(F.lit("false"))


def _jquote(k: Column) -> Column:
    """A string Column as a QUOTED JSON string literal with FULL JSON
    escaping — backslash, quote, AND control characters (the
    hand-rolled replaces missed those: a property name holding a
    newline produced unparseable output JSON; review find).
    to_json(array(k)) renders ["..."] with proper escaping; strip the
    brackets to keep the quoted literal."""
    j = F.to_json(F.array(k))
    return F.substr(j, F.lit(2), F.length(j) - F.lit(2))


def _name_token(k: Column) -> Column:
    """A dynamic property-name Column escaped for embedding in the
    output JSON: JSON-Pointer escape (~ → ~0, / → ~1) for the pointer
    token, then full JSON-string escaping, UNQUOTED (callers embed it
    inside larger string literals)."""
    c = F.replace(k, F.lit("~"), F.lit("~0"))
    c = F.replace(c, F.lit("/"), F.lit("~1"))
    q = _jquote(c)
    return F.substr(q, F.lit(2), F.length(q) - F.lit(2))


def _jname(k: Column) -> Column:
    """A dynamic property-name Column as a quoted JSON string literal
    (for annotations lists): full JSON escaping, no pointer escape."""
    return _jquote(k)


class OutputPlan:
    """Compiles a JSON Schema into `list` / `hierarchical` Output v1
    JSON-string Columns over a JSON-string instance column."""

    def __init__(self, schema: Any,
                 options: ValidationOptions | None = None):
        self.options = options or ValidationOptions()
        self.ctx = VariantCompileContext(schema, self.options)
        self.schema = schema
        root_loc = self.ctx.registry.location_of(schema)
        self._root_loc = root_loc if root_loc is not None else ""
        # Build only the side the caller asked for: every skipped Column
        # node is a py4j round-trip saved on the driver — for a mid-size
        # schema the full both-sides tree costs whole SECONDS of driver
        # time before the first task launches (measured: 7.1 s both →
        # ~3.5 s one side at OUTPUT_UNITS_SCHEMA). The unbuilt side is
        # returned as None and never touched.
        self._want_hier = True
        self._want_flat = True
        self._empty_arr: Column | None = None

    # -- public -------------------------------------------------------------

    def hierarchical_column(self, json_col: Column) -> Column:
        return self.hierarchical_column_from_variant(
            F.try_parse_json(json_col))

    def hierarchical_column_from_variant(self, v: Column) -> Column:
        """Like hierarchical_column but over an ALREADY-PARSED variant
        Column. Prefer staging the parse through its own projection
        (with_output does) — the unit tree references the instance many
        times inside interpreted HOF lambdas, which re-evaluate an
        embedded try_parse_json per reference (measured 2x at sf0.1)."""
        self._want_hier, self._want_flat = True, False
        hier, _, _ = self._build(v)
        return hier

    def list_column(self, json_col: Column) -> Column:
        return self.list_column_from_variant(F.try_parse_json(json_col))

    def list_column_from_variant(self, v: Column) -> Column:
        """list_column over an already-parsed variant Column (see
        hierarchical_column_from_variant for why)."""
        self._want_hier, self._want_flat = False, True
        _, units, valid = self._build(v)
        return F.concat(F.lit('{"valid":'), _jbool(valid),
                        F.lit(',"details":['),
                        F.array_join(units, ","), F.lit("]}"))

    def _empty(self) -> Column:
        if self._empty_arr is None:
            self._empty_arr = F.expr("CAST(array() AS array<string>)")
        return self._empty_arr

    # -- unit assembly ------------------------------------------------------

    def _build(self, v: Column):
        return self._schema_unit(self.schema, "", v, F.lit(""))

    def _valid_of(self, schema: Any, sp: str, v: Column) -> Column:
        node = compile_variant(schema, self.ctx, sp)
        return F.coalesce(node.valid(v), F.lit(False)) \
            if node.rules else F.lit(True)

    def _loc(self, schema: Any, fallback_ep: str) -> str:
        loc = self.ctx.registry.location_of(schema)
        if loc is not None:
            return loc
        base = self._root_loc
        return (base + fallback_ep) if base.endswith("#") or base == "" \
            else base + fallback_ep

    def _unit(self, valid: Column, ep: str, sl: str, ip: Column,
              annotations: Column | None = None,
              annotates: bool = False,
              errors: Column | None = None,
              details: Column | None = None) -> Column:
        """One evaluation unit as a JSON string Column. `annotations` is
        a pre-serialized JSON Column shown only when valid (an invalid
        annotating unit emits droppedAnnotations instead). `details` is
        a pre-joined comma-separated children string (empty → omitted).
        """
        parts: list[Column] = [
            F.lit('{"valid":'), _jbool(valid),
            F.lit(f',"evaluationPath":"{_j(ep)}"'
                  f',"schemaLocation":"{_j(sl)}"'
                  f',"instanceLocation":"'), ip, F.lit('"'),
        ]
        if annotations is not None:
            parts.append(F.when(
                valid & annotations.isNotNull(),
                F.concat(F.lit(',"annotations":'), annotations))
                .when(~valid, F.lit(',"droppedAnnotations":true'))
                .otherwise(F.lit("")))
        elif annotates:
            parts.append(F.when(valid, F.lit(""))
                         .otherwise(F.lit(',"droppedAnnotations":true')))
        if errors is not None:
            parts.append(F.when(valid, F.lit(""))
                         .otherwise(F.concat(F.lit(',"errors":{'), errors,
                                             F.lit("}"))))
        if details is not None:
            d = F.coalesce(details, F.lit(""))
            parts.append(F.when(d == "", F.lit(""))
                         .otherwise(F.concat(F.lit(',"details":['),
                                             d, F.lit("]"))))
        parts.append(F.lit("}"))
        return F.concat(*parts)

    def _schema_unit(self, schema: Any, ep: str, v: Column,
                     ip: Column):
        """(hierarchical_json, flat_units array<string>, valid) for one
        subschema applied to value `v` at instance location `ip`."""
        sl = self._loc(schema, ep)
        if schema is True or schema == {}:
            u = self._unit(F.lit(True), ep, sl, ip)
            return (u if self._want_hier else None,
                    F.array(u) if self._want_flat else None, F.lit(True))
        if schema is False:
            err = F.lit('"false":"schema is false: nothing is valid"')
            u = self._unit(F.lit(False), ep, sl, ip, errors=err)
            return (u if self._want_hier else None,
                    F.array(u) if self._want_flat else None, F.lit(False))

        eff = self.ctx.dialect.effective(schema)
        valid = self._valid_of(schema, ep, v)

        child_hier: list[Column] = []     # children's hierarchical JSON
        child_flat: list[Column] = []     # children's flat unit arrays

        def emit(h: Column | None, flat: Column | None):
            if self._want_hier:
                child_hier.append(h)
            if self._want_flat:
                child_flat.append(flat)

        # $ref / $dynamicRef / $recursiveRef: one unit whose location
        # jumps to the target
        for kw in ("$ref", "$dynamicRef", "$recursiveRef"):
            if kw not in eff:
                continue
            ref = eff[kw]
            key = kw + ":" + str(ref)
            depth = self.ctx._ref_depth.get(key, 0)
            if depth >= min(resolved_ref_depth(self.options), 3):
                continue  # output tree is depth-capped like the compiler
            self.ctx._ref_depth[key] = depth + 1
            try:
                if kw == "$ref":
                    target = self.ctx.resolve_ref(ref, schema)
                elif kw == "$dynamicRef":
                    target = self.ctx.registry.resolve_dynamic(ref, schema)
                else:
                    target = self.ctx.registry.resolve_recursive()
                h, fl, _ = self._schema_unit(target, f"{ep}/{kw}", v, ip)
                emit(h, fl)
            finally:
                self.ctx._ref_depth[key] = depth

        # plain assertions: micro-schema per keyword (+ coupled partners)
        for kw, partners in _ASSERTIONS:
            if kw not in eff:
                continue
            if kw in ("exclusiveMinimum", "exclusiveMaximum") \
                    and isinstance(eff[kw], bool):
                continue  # draft-4 bool form folds into minimum/maximum
            micro = {kw: eff[kw]}
            for p in partners:
                if p in eff and isinstance(eff[p], bool):
                    # draft-4 boolean form modifies the partner keyword;
                    # NUMERIC-form partners are independent assertions
                    # with units of their own — folding them conflated
                    # verdicts (minimum:3 + exclusiveMinimum:5 against
                    # 4 blamed 'minimum'; review find)
                    micro[p] = eff[p]
            kv = self._valid_of(micro, f"{ep}/{kw}", v)
            err = None
            if self.options.message_values:
                # reference-parity messages (error.rs:1330-1560): the
                # instance's JSON rendering heads the catalog tail,
                # escaped for embedding in the unit's JSON envelope
                from jsonschema_rs_spark.compiler.nodes import (
                    reference_message,
                )
                rm = reference_message(kw, eff)
                if rm is not None:
                    tail, headless = rm
                    if headless:
                        err = F.lit(f'"{_j(kw)}":"{_j(tail)}"')
                    else:
                        head = F.regexp_replace(
                            F.regexp_replace(F.to_json(v), "\\\\", "\\\\\\\\"),
                            '"', '\\\\"')
                        err = F.concat(F.lit(f'"{_j(kw)}":"'), head,
                                       F.lit(f' {_j(tail)}"'))
            if err is None:
                err = F.lit(f'"{_j(kw)}":"{_j(f"violates {kw}")}"')
            u = self._unit(kv, f"{ep}/{kw}", sl + f"/{kw}", ip, errors=err)
            emit(u, F.array(u) if self._want_flat else None)

        # not: child subtree = the subschema evaluated in place; the
        # `not` unit inverts its validity
        if "not" in eff:
            h, fl, sv = self._schema_unit(eff["not"], f"{ep}/not", v, ip)
            kv = ~sv
            err = F.lit('"not":"violates not"')
            u = None
            if self._want_hier:
                u = self._unit(kv, f"{ep}/not", sl + "/not", ip,
                               errors=err, details=h)
            fl_all = None
            if self._want_flat:
                flat_self = self._unit(kv, f"{ep}/not", sl + "/not", ip,
                                       errors=err)
                fl_all = F.concat(F.array(flat_self), fl)
            emit(u, fl_all)

        # if / then / else: the `if` unit always appears (its validity is
        # the subschema's — a failing `if` is not an error for the
        # parent); `then` appears only when `if` passed, `else` only when
        # it failed
        if "if" in eff:
            if_h, if_fl, if_ok = self._schema_unit(
                eff["if"], f"{ep}/if", v, ip)
            emit(if_h, if_fl)
            for bkw, active in (("then", if_ok), ("else", ~if_ok)):
                if bkw not in eff:
                    continue
                h, fl, sv = self._schema_unit(
                    eff[bkw], f"{ep}/{bkw}", v, ip)
                if self._want_hier:
                    h = F.when(active, h).otherwise(F.lit(None))
                if self._want_flat:
                    fl = F.when(active, fl).otherwise(self._empty())
                emit(h, fl)

        # dependentSchemas: per-trigger-key subtree, applied in place
        # only when the key is present
        if "dependentSchemas" in eff \
                and isinstance(eff["dependentSchemas"], dict):
            for dk, sub in eff["dependentSchemas"].items():
                dke = dk.replace("~", "~0").replace("/", "~1")
                present = _is_object(v) & F.try_element_at(
                    _as_map(v), F.lit(dk)).isNotNull()
                h, fl, sv = self._schema_unit(
                    sub, f"{ep}/dependentSchemas/{dke}", v, ip)
                if self._want_hier:
                    h = F.when(present, h).otherwise(F.lit(None))
                if self._want_flat:
                    fl = F.when(present, fl).otherwise(self._empty())
                emit(h, fl)

        # propertyNames: per-name child subtrees — the subschema applies
        # to each property NAME lifted to a string instance (the
        # reference wraps the name the same way, property_names.rs:26-47;
        # instanceLocation stays the parent object, names are not
        # addressable by JSON Pointer)
        if "propertyNames" in eff:
            pn = eff["propertyNames"]
            m = _as_map(v)
            keys = F.map_keys(m)
            ep_kw = f"{ep}/propertyNames"
            sl_kw = sl + "/propertyNames"
            with self.ctx.in_hof():  # applied per key inside transform
                pn_node = None if isinstance(pn, bool) \
                    else compile_variant(pn, self.ctx, ep_kw)

            def _lift(k):
                # plain string key -> variant (established pn_pred idiom)
                return F.try_element_at(
                    _as_array(F.try_parse_json(F.to_json(F.array(k)))),
                    F.lit(1))

            def _name_ok(k):
                if pn is False:
                    return F.lit(False)
                if pn is True or pn_node is None or not pn_node.rules:
                    return F.lit(True)
                return F.coalesce(pn_node.valid(_lift(k)), F.lit(False))

            kv = ~_is_object(v) | F.forall(keys, _name_ok)
            if self._want_hier:
                def pn_hb(pn=pn, ep_kw=ep_kw):
                    def build(k):
                        h, _, _ = self._schema_unit_dyn(
                            pn, ep_kw, _lift(k), ip)
                        return h
                    return build
                pn_hier = F.transform(keys, pn_hb())
            if self._want_flat:
                def pn_fb(pn=pn, ep_kw=ep_kw):
                    def build(k):
                        _, fl, _ = self._schema_unit_dyn(
                            pn, ep_kw, _lift(k), ip)
                        return fl
                    return build
                pn_flat = F.flatten(F.transform(keys, pn_fb()))
            err = F.lit('"propertyNames":"violates propertyNames"')
            u = None
            if self._want_hier:
                u = self._unit(kv, ep_kw, sl_kw, ip, errors=err,
                               details=F.when(
                                   _is_object(v),
                                   F.array_join(pn_hier, ","))
                               .otherwise(F.lit("")))
            fl_all = None
            if self._want_flat:
                flat_self = self._unit(kv, ep_kw, sl_kw, ip, errors=err)
                kids = F.when(_is_object(v), pn_flat) \
                    .otherwise(self._empty())
                fl_all = F.concat(F.array(flat_self), kids)
            emit(u, fl_all)

        # properties: per-present-property subschema units + annotation
        if "properties" in eff and isinstance(eff["properties"], dict):
            props = eff["properties"]
            m = _as_map(v)
            present = [(name, sub) for name, sub in props.items()]
            sub_valid_all = F.lit(True)
            ann_items: list[Column] = []
            prop_hier: list[Column] = []
            prop_flat: list[Column] = []
            for name, sub in present:
                pv = F.try_element_at(m, F.lit(name))
                has = _is_object(v) & pv.isNotNull()
                ne = name.replace("~", "~0").replace("/", "~1")
                h, fl, sv = self._schema_unit(
                    sub, f"{ep}/properties/{ne}", pv,
                    # pointer-escape THEN json-escape: a name holding
                    # '/' or '~' must emit '~1'/'~0' in the pointer
                    # (review find: '/a/b' pointed into a nested member)
                    F.concat(ip, F.lit("/" + _j(ne))))
                if self._want_hier:
                    prop_hier.append(F.when(has, h).otherwise(F.lit(None)))
                if self._want_flat:
                    prop_flat.append(F.when(has, fl)
                                     .otherwise(self._empty()))
                sub_valid_all = sub_valid_all & (~has | sv)
                ann_items.append(F.when(has, F.lit(json.dumps(name)))
                                 .otherwise(F.lit(None)))
            pvalid = ~_is_object(v) | sub_valid_all
            ann = F.when(_is_object(v),
                         F.concat(F.lit("["),
                                  F.concat_ws(",", *ann_items),
                                  F.lit("]")))
            u = None
            if self._want_hier:
                u = self._unit(pvalid, f"{ep}/properties",
                               sl + "/properties", ip,
                               annotations=ann,
                               details=F.concat_ws(",", *prop_hier))
            fl_all = None
            if self._want_flat:
                flat_self = self._unit(pvalid, f"{ep}/properties",
                                       sl + "/properties", ip,
                                       annotations=ann)
                fl_all = F.concat(F.array(flat_self), *prop_flat) \
                    if prop_flat else F.array(flat_self)
            emit(u, fl_all)

        # patternProperties: per (pattern × matching property) child
        # subtrees. The property NAME is dynamic, so children are built
        # inside a transform over map_entries; the subschema's unit tree
        # is still ONE compile-time expression. evaluationPath carries
        # the PATTERN (schema traversal), instanceLocation the name.
        if "patternProperties" in eff \
                and isinstance(eff["patternProperties"], dict) \
                and eff["patternProperties"]:
            m = _as_map(v)
            entries = F.map_entries(m)
            jpats = tuple(self.ctx.regex(p)
                          for p in eff["patternProperties"])
            kv = self._valid_of(
                {"patternProperties": eff["patternProperties"]},
                f"{ep}/patternProperties", v)
            pat_hier: list[Column] = []
            pat_flat: list[Column] = []
            for pat, sub in eff["patternProperties"].items():
                jpat = self.ctx.regex(pat)
                pe = pat.replace("~", "~0").replace("/", "~1")
                ep_kw = f"{ep}/patternProperties/{pe}"
                if self._want_hier:
                    def hb(sub=sub, ep_kw=ep_kw, jpat=jpat):
                        def build(e):
                            h, _, _ = self._schema_unit_dyn(
                                sub, ep_kw, e["value"],
                                F.concat(ip, F.lit("/"),
                                         _name_token(e["key"])))
                            return F.when(e["key"].rlike(jpat), h) \
                                .otherwise(F.lit(None))
                        return build
                    pat_hier.append(F.filter(F.transform(entries, hb()),
                                             lambda x: x.isNotNull()))
                if self._want_flat:
                    def fb(sub=sub, ep_kw=ep_kw, jpat=jpat):
                        def build(e):
                            _, fl, _ = self._schema_unit_dyn(
                                sub, ep_kw, e["value"],
                                F.concat(ip, F.lit("/"),
                                         _name_token(e["key"])))
                            return F.when(e["key"].rlike(jpat), fl) \
                                .otherwise(self._empty())
                        return build
                    pat_flat.append(F.flatten(F.transform(entries, fb())))

            def _any_pat(k):
                out = F.lit(False)
                for jp in jpats:
                    out = out | k.rlike(jp)
                return out

            mnames = F.filter(F.map_keys(m), _any_pat)
            ann = F.when(_is_object(v),
                         F.concat(F.lit("["),
                                  F.array_join(
                                      F.transform(mnames, _jname), ","),
                                  F.lit("]")))
            err = F.lit('"patternProperties":'
                        '"violates patternProperties"')
            u = None
            if self._want_hier:
                details = F.when(
                    _is_object(v),
                    F.array_join(F.concat(*pat_hier), ",")) \
                    .otherwise(F.lit(""))
                u = self._unit(kv, f"{ep}/patternProperties",
                               sl + "/patternProperties", ip,
                               annotations=ann, errors=err,
                               details=details)
            fl_all = None
            if self._want_flat:
                flat_self = self._unit(kv, f"{ep}/patternProperties",
                                       sl + "/patternProperties", ip,
                                       annotations=ann, errors=err)
                kids = F.when(_is_object(v), F.concat(*pat_flat)) \
                    .otherwise(self._empty())
                fl_all = F.concat(F.array(flat_self), kids)
            emit(u, fl_all)

        # additionalProperties: per-extra-property child subtrees (names
        # not claimed by `properties` or any patternProperties pattern)
        if "additionalProperties" in eff and (
                isinstance(eff["additionalProperties"], (dict, bool))):
            ap = eff["additionalProperties"]
            m = _as_map(v)
            entries = F.map_entries(m)
            known = tuple((eff["properties"] or {}).keys()) \
                if isinstance(eff.get("properties"), dict) else ()
            ap_jpats = tuple(self.ctx.regex(p)
                             for p in eff["patternProperties"]) \
                if isinstance(eff.get("patternProperties"), dict) else ()

            def _is_extra(k):
                claimed = k.isin(*known) if known else F.lit(False)
                for jp in ap_jpats:
                    claimed = claimed | k.rlike(jp)
                return ~claimed

            with self.ctx.in_hof():  # applied per entry in transform
                sub_node = None if isinstance(ap, bool) \
                    else compile_variant(ap, self.ctx,
                                         f"{ep}/additionalProperties")

            def _entry_ok(e):
                if ap is False:
                    ok = F.lit(False)
                elif ap is True or sub_node is None \
                        or not sub_node.rules:
                    ok = F.lit(True)
                else:
                    ok = F.coalesce(sub_node.valid(e["value"]),
                                    F.lit(False))
                return F.when(_is_extra(e["key"]), ok) \
                    .otherwise(F.lit(True))

            kv = ~_is_object(v) | F.forall(entries, _entry_ok)
            ep_kw = f"{ep}/additionalProperties"
            sl_kw = sl + "/additionalProperties"
            if self._want_hier:
                def ap_hb(ap=ap, ep_kw=ep_kw):
                    def build(e):
                        h, _, _ = self._schema_unit_dyn(
                            ap, ep_kw, e["value"],
                            F.concat(ip, F.lit("/"),
                                     _name_token(e["key"])))
                        return F.when(_is_extra(e["key"]), h) \
                            .otherwise(F.lit(None))
                    return build
                ap_hier = F.filter(F.transform(entries, ap_hb()),
                                   lambda x: x.isNotNull())
            if self._want_flat:
                def ap_fb(ap=ap, ep_kw=ep_kw):
                    def build(e):
                        _, fl, _ = self._schema_unit_dyn(
                            ap, ep_kw, e["value"],
                            F.concat(ip, F.lit("/"),
                                     _name_token(e["key"])))
                        return F.when(_is_extra(e["key"]), fl) \
                            .otherwise(self._empty())
                    return build
                ap_flat = F.flatten(F.transform(entries, ap_fb()))
            extra_names = F.filter(F.map_keys(m), _is_extra)
            ann = F.when(_is_object(v),
                         F.concat(F.lit("["),
                                  F.array_join(
                                      F.transform(extra_names, _jname),
                                      ","),
                                  F.lit("]")))
            err = F.lit('"additionalProperties":'
                        '"violates additionalProperties"')
            u = None
            if self._want_hier:
                u = self._unit(kv, ep_kw, sl_kw, ip,
                               annotations=ann, errors=err,
                               details=F.when(
                                   _is_object(v),
                                   F.array_join(ap_hier, ","))
                               .otherwise(F.lit("")))
            fl_all = None
            if self._want_flat:
                flat_self = self._unit(kv, ep_kw, sl_kw, ip,
                                       annotations=ann, errors=err)
                kids = F.when(_is_object(v), ap_flat) \
                    .otherwise(self._empty())
                fl_all = F.concat(F.array(flat_self), kids)
            emit(u, fl_all)

        # unevaluatedProperties: per-UNEVALUATED-name child subtrees.
        # Coverage is the same dynamic validity-conditioned walk the
        # validator uses (_key_coverage over the sibling schema), so the
        # unit's validity is keyword-accurate (it no longer inherits
        # whole-schema validity as the old aggregate form did).
        if "unevaluatedProperties" in eff:
            up = eff["unevaluatedProperties"]
            sibling = dict(eff)
            sibling.pop("unevaluatedProperties")
            with self.ctx.in_hof():  # coverage walk + per-name
                # subtrees run inside map-entry transform lambdas
                cov = _key_coverage(sibling, self.ctx)
                up_node = None if isinstance(up, bool) \
                    else compile_variant(
                        up, self.ctx, f"{ep}/unevaluatedProperties")
            m = _as_map(v)
            entries = F.map_entries(m)
            ep_kw = f"{ep}/unevaluatedProperties"
            sl_kw = sl + "/unevaluatedProperties"

            def _is_uncov(k):
                return ~F.coalesce(cov(v, k), F.lit(False))

            def _up_entry_ok(e):
                if up is False:
                    ok = F.lit(False)
                elif up is True or up_node is None or not up_node.rules:
                    ok = F.lit(True)
                else:
                    ok = F.coalesce(up_node.valid(e["value"]),
                                    F.lit(False))
                return F.when(_is_uncov(e["key"]), ok) \
                    .otherwise(F.lit(True))

            kv = ~_is_object(v) | F.forall(entries, _up_entry_ok)
            if self._want_hier:
                def up_hb(up=up, ep_kw=ep_kw):
                    def build(e):
                        h, _, _ = self._schema_unit_dyn(
                            up, ep_kw, e["value"],
                            F.concat(ip, F.lit("/"),
                                     _name_token(e["key"])))
                        return F.when(_is_uncov(e["key"]), h) \
                            .otherwise(F.lit(None))
                    return build
                up_hier = F.filter(F.transform(entries, up_hb()),
                                   lambda x: x.isNotNull())
            if self._want_flat:
                def up_fb(up=up, ep_kw=ep_kw):
                    def build(e):
                        _, fl, _ = self._schema_unit_dyn(
                            up, ep_kw, e["value"],
                            F.concat(ip, F.lit("/"),
                                     _name_token(e["key"])))
                        return F.when(_is_uncov(e["key"]), fl) \
                            .otherwise(self._empty())
                    return build
                up_flat = F.flatten(F.transform(entries, up_fb()))
            uncov_names = F.filter(F.map_keys(m), _is_uncov)
            ann = F.when(_is_object(v),
                         F.concat(F.lit("["),
                                  F.array_join(
                                      F.transform(uncov_names, _jname),
                                      ","),
                                  F.lit("]")))
            err = F.lit('"unevaluatedProperties":'
                        '"violates unevaluatedProperties"')
            u = None
            if self._want_hier:
                u = self._unit(kv, ep_kw, sl_kw, ip,
                               annotations=ann, errors=err,
                               details=F.when(
                                   _is_object(v),
                                   F.array_join(up_hier, ","))
                               .otherwise(F.lit("")))
            fl_all = None
            if self._want_flat:
                flat_self = self._unit(kv, ep_kw, sl_kw, ip,
                                       annotations=ann, errors=err)
                kids = F.when(_is_object(v), up_flat) \
                    .otherwise(self._empty())
                fl_all = F.concat(F.array(flat_self), kids)
            emit(u, fl_all)

        # prefixItems / array-form items: per-index units + annotation
        prefix = None
        if "prefixItems" in eff and isinstance(eff["prefixItems"], list):
            prefix = ("prefixItems", eff["prefixItems"])
        elif "items" in eff and isinstance(eff["items"], list):
            prefix = ("items", eff["items"])
        n_prefix = len(prefix[1]) if prefix else 0
        if prefix:
            kw, subs = prefix
            arr = _as_array(v)
            idx_hier, idx_flat = [], []
            pa_valid = F.lit(True)
            for i, sub in enumerate(subs):
                has = _is_array(v) & (F.size(arr) > i)
                # try_element_at, NOT element_at: ANSI mode throws
                # INVALID_ARRAY_INDEX_IN_ELEMENT_AT on a shorter array
                # even though `has` gates the unit — subexpressions of
                # the unit template evaluate outside the CASE's lazy
                # branches (output-vs-flag consistency fuzz find)
                ev = F.try_element_at(arr, F.lit(i + 1))
                h, fl, sv = self._schema_unit(
                    sub, f"{ep}/{kw}/{i}", ev,
                    F.concat(ip, F.lit(f"/{i}")))
                if self._want_hier:
                    idx_hier.append(F.when(has, h).otherwise(F.lit(None)))
                if self._want_flat:
                    idx_flat.append(F.when(has, fl)
                                    .otherwise(self._empty()))
                pa_valid = pa_valid & (~has | sv)
            pvalid = ~_is_array(v) | pa_valid
            ann = F.when(_is_array(v),
                         F.when(F.size(arr) <= n_prefix, F.lit("true"))
                         .otherwise(F.lit(str(n_prefix - 1))))
            u = None
            if self._want_hier:
                u = self._unit(pvalid, f"{ep}/{kw}", sl + f"/{kw}", ip,
                               annotations=ann,
                               details=F.concat_ws(",", *idx_hier))
            fl_all = None
            if self._want_flat:
                flat_self = self._unit(pvalid, f"{ep}/{kw}",
                                       sl + f"/{kw}", ip, annotations=ann)
                fl_all = F.concat(F.array(flat_self), *idx_flat) \
                    if idx_flat else F.array(flat_self)
            emit(u, fl_all)

        # items (schema form) / draft 4-7 additionalItems: per-element
        # units beyond the prefix (additionalItems previously emitted NO
        # unit, so a failure it caused appeared nowhere in the tree —
        # review find)
        rest_kw = None
        if "items" in eff and not isinstance(eff["items"], (list,)):
            rest_kw, rest_sub = "items", eff["items"]
        elif prefix and prefix[0] == "items" \
                and "additionalItems" in eff \
                and eff["additionalItems"] is not True:
            rest_kw, rest_sub = "additionalItems", eff["additionalItems"]
        if rest_kw is not None:
            sub = rest_sub
            if sub is not True:
                arr = _as_array(v)
                with self.ctx.in_hof():  # applied per element in transform
                    items_node = compile_variant(sub, self.ctx,
                                                 f"{ep}/{rest_kw}")

                def elem_builder(sub=sub, ep=ep, rest_kw=rest_kw):
                    def build(x: Column, i: Column):
                        h, _, _ = self._schema_unit_dyn(
                            sub, f"{ep}/{rest_kw}", x,
                            F.concat(ip, F.lit("/"), i.cast("string")))
                        return F.when(i >= n_prefix, h) \
                            .otherwise(F.lit(None))
                    return build

                def elem_flat_builder(sub=sub, ep=ep,
                                      rest_kw=rest_kw):
                    def build(x: Column, i: Column):
                        _, fl, _ = self._schema_unit_dyn(
                            sub, f"{ep}/{rest_kw}", x,
                            F.concat(ip, F.lit("/"), i.cast("string")))
                        return F.when(i >= n_prefix, fl).otherwise(
                            self._empty())
                    return build

                def elem_valid(node=items_node):
                    def build(x: Column, i: Column):
                        ok = F.coalesce(node.valid(x), F.lit(False)) \
                            if node.rules else F.lit(True)
                        return F.when(i < n_prefix, F.lit(True)) \
                            .otherwise(ok)
                    return build

                ivalid = ~_is_array(v) | F.forall(
                    F.transform(arr, elem_valid()), lambda b: b)
                applied = _is_array(v) & (F.size(arr) > n_prefix)
                ann = F.lit("true")
                u = None
                if self._want_hier:
                    hier_elems = F.filter(
                        F.transform(arr, elem_builder()),
                        lambda x: x.isNotNull())
                    u = self._unit(
                        ivalid, f"{ep}/{rest_kw}", sl + "/" + rest_kw, ip,
                        annotations=F.when(applied, ann),
                        annotates=True,
                        details=F.when(_is_array(v),
                                       F.array_join(hier_elems, ","))
                        .otherwise(F.lit("")))
                fl_all = None
                if self._want_flat:
                    flat_self = self._unit(
                        ivalid, f"{ep}/{rest_kw}", sl + "/" + rest_kw, ip,
                        annotations=F.when(applied, ann), annotates=True)
                    flat_elems = F.when(
                        _is_array(v),
                        F.flatten(F.transform(arr, elem_flat_builder()))) \
                        .otherwise(self._empty())
                    fl_all = F.concat(F.array(flat_self), flat_elems)
                emit(u, fl_all)

        # contains (+minContains/maxContains): annotation = match indices
        if "contains" in eff:
            micro = {k: eff[k] for k in
                     ("contains", "minContains", "maxContains")
                     if k in eff}
            cv = self._valid_of(micro, f"{ep}/contains", v)
            with self.ctx.in_hof():  # match walk runs inside transform
                sub_node = compile_variant(eff["contains"], self.ctx,
                                           f"{ep}/contains")

            def midx(x: Column, i: Column):
                ok = F.coalesce(sub_node.valid(x), F.lit(False)) \
                    if sub_node.rules else F.lit(True)
                return F.when(ok, i).otherwise(F.lit(None))

            idxs = F.filter(F.transform(_as_array(v), midx),
                            lambda x: x.isNotNull())
            ann = F.concat(
                F.lit("["),
                F.array_join(F.transform(idxs,
                                         lambda i: i.cast("string")), ","),
                F.lit("]"))
            u = self._unit(cv, f"{ep}/contains", sl + "/contains", ip,
                           annotations=F.when(_is_array(v), ann)
                           .otherwise(F.lit("[]")),
                           errors=F.lit('"contains":"violates contains"'))
            emit(u, F.array(u) if self._want_flat else None)

        # unevaluatedItems: per-UNEVALUATED-index child subtrees, with
        # the validator's own dynamic index coverage (_index_coverage
        # over the sibling schema — prefixItems/items/contains plus
        # validity-conditioned in-place applicators).
        if "unevaluatedItems" in eff:
            ui = eff["unevaluatedItems"]
            sibling = dict(eff)
            sibling.pop("unevaluatedItems")
            with self.ctx.in_hof():  # coverage walk + per-index
                # subtrees run inside transform lambdas
                icov = _index_coverage(sibling, self.ctx)
                ui_node = None if isinstance(ui, bool) \
                    else compile_variant(ui, self.ctx,
                                         f"{ep}/unevaluatedItems")
            arr = _as_array(v)
            ep_kw = f"{ep}/unevaluatedItems"
            sl_kw = sl + "/unevaluatedItems"

            def _idx_uncov(x, i):
                return ~F.coalesce(icov(v, i, x), F.lit(False))

            def _ui_elem_ok(x, i):
                if ui is False:
                    ok = F.lit(False)
                elif ui is True or ui_node is None or not ui_node.rules:
                    ok = F.lit(True)
                else:
                    ok = F.coalesce(ui_node.valid(x), F.lit(False))
                return F.when(_idx_uncov(x, i), ok).otherwise(F.lit(True))

            kv = ~_is_array(v) | F.forall(
                F.transform(arr, _ui_elem_ok), lambda b: b)
            applied = _is_array(v) & F.exists(
                F.transform(arr, _idx_uncov), lambda b: b)
            if self._want_hier:
                def ui_hb(ui=ui, ep_kw=ep_kw):
                    def build(x, i):
                        h, _, _ = self._schema_unit_dyn(
                            ui, ep_kw, x,
                            F.concat(ip, F.lit("/"), i.cast("string")))
                        return F.when(_idx_uncov(x, i), h) \
                            .otherwise(F.lit(None))
                    return build
                ui_hier = F.filter(F.transform(arr, ui_hb()),
                                   lambda x: x.isNotNull())
            if self._want_flat:
                def ui_fb(ui=ui, ep_kw=ep_kw):
                    def build(x, i):
                        _, fl, _ = self._schema_unit_dyn(
                            ui, ep_kw, x,
                            F.concat(ip, F.lit("/"), i.cast("string")))
                        return F.when(_idx_uncov(x, i), fl) \
                            .otherwise(self._empty())
                    return build
                ui_flat = F.flatten(F.transform(arr, ui_fb()))
            err = F.lit('"unevaluatedItems":'
                        '"violates unevaluatedItems"')
            u = None
            if self._want_hier:
                u = self._unit(kv, ep_kw, sl_kw, ip,
                               annotations=F.when(applied, F.lit("true")),
                               annotates=True, errors=err,
                               details=F.when(
                                   _is_array(v),
                                   F.array_join(ui_hier, ","))
                               .otherwise(F.lit("")))
            fl_all = None
            if self._want_flat:
                flat_self = self._unit(kv, ep_kw, sl_kw, ip,
                                       annotations=F.when(applied,
                                                          F.lit("true")),
                                       annotates=True, errors=err)
                kids = F.when(_is_array(v), ui_flat) \
                    .otherwise(self._empty())
                fl_all = F.concat(F.array(flat_self), kids)
            emit(u, fl_all)

        # combinators: branch subschema units
        for kw in ("allOf", "anyOf", "oneOf"):
            if kw not in eff or not isinstance(eff[kw], list):
                continue
            branch_valid = []
            b_hier, b_flat = [], []
            for i, sub in enumerate(eff[kw]):
                h, fl, sv = self._schema_unit(sub, f"{ep}/{kw}/{i}", v, ip)
                if self._want_hier:
                    b_hier.append(h)
                if self._want_flat:
                    b_flat.append(fl)
                branch_valid.append(sv)
            if kw == "allOf":
                kv = F.lit(True)
                for b in branch_valid:
                    kv = kv & b
            elif kw == "anyOf":
                kv = F.lit(False)
                for b in branch_valid:
                    kv = kv | b
            else:
                total = F.lit(0)
                for b in branch_valid:
                    total = total + b.cast("int")
                kv = total == 1
            u = None
            if self._want_hier:
                u = self._unit(kv, f"{ep}/{kw}", sl + f"/{kw}", ip,
                               errors=F.lit(f'"{kw}":"violates {kw}"'),
                               details=F.concat_ws(",", *b_hier))
            fl_all = None
            if self._want_flat:
                flat_self = self._unit(kv, f"{ep}/{kw}", sl + f"/{kw}",
                                       ip,
                                       errors=F.lit(
                                           f'"{kw}":"violates {kw}"'))
                fl_all = F.concat(F.array(flat_self), *b_flat)
            emit(u, fl_all)

        root_u = None
        if self._want_hier:
            details = F.concat_ws(",", *child_hier) if child_hier \
                else F.lit("")
            root_u = self._unit(valid, ep, sl, ip, details=details)
        flat = None
        if self._want_flat:
            flat_self = self._unit(valid, ep, sl, ip)
            flat = F.concat(F.array(flat_self), *child_flat) \
                if child_flat else F.array(flat_self)
        return root_u, flat, valid

    def _schema_unit_dyn(self, schema: Any, ep: str, v: Column,
                         ip: Column):
        """Variant of _schema_unit for subtrees built INSIDE a HOF
        lambda (array elements, per-name property subtrees): Spark
        forbids Python UDFs under lambda functions, so every keyword
        compile in the subtree must take its pure-Column form
        (VariantCompileContext.hof_depth — the same discipline as the
        boolean compiler's lambda-embedded sites; output-vs-flag
        consistency fuzz find: items+multipleOf 2.5 crashed here)."""
        self.ctx.hof_depth += 1
        try:
            return self._schema_unit(schema, ep, v, ip)
        finally:
            self.ctx.hof_depth -= 1


def evaluate_output(schema: Any, options: ValidationOptions | None = None
                    ) -> OutputPlan:
    return OutputPlan(schema, options)
