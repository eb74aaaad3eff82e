"""Draft dialects: `$schema` auto-detection + per-draft keyword
applicability.

The analog of the reference's per-draft keyword registry
(crates/jsonschema/src/keywords/mod.rs:254-510 `get_for_draft`) and its
`$schema`-based draft detection
(crates/jsonschema-referencing/src/specification/mod.rs:54). A keyword
that a draft does not define is an ANNOTATION in that draft — it must be
ignored, not asserted: a draft-7 document using `prefixItems` or
`dependentRequired` gets no constraint from them, and a draft-4 document
ignores `const`/`contains`/`if`.

Dialect resolution order (CompiledJsonSchema / compile_schema):
1. `ValidationOptions.dialect` if set ("4" | "6" | "7" | "2019-09" |
   "2020-12" | "permissive"),
2. else the root schema's `$schema` URI if it names a known draft,
3. else PERMISSIVE — the engine's historical default: the 2020-12
   keyword set PLUS legacy compat (draft-4 boolean exclusive*, draft-7
   array-form items/additionalItems/dependencies, $recursiveRef, content
   assertions) all active at once. Permissive is a deliberate superset
   for schema corpora of mixed provenance; declare `$schema` (or pass
   `dialect=`) for spec-exact applicability.

Semantics gated per draft (matching get_for_draft):
- `$ref` exclusivity: in drafts 4-7 every sibling of `$ref` is ignored
  (validation-wise); 2019-09+ compose `$ref` with siblings.
- draft-4 numerics: boolean-form exclusiveMinimum/Maximum only (numeric
  form ignored), and `1.0` is NOT an integer (typed path; the variant
  path's JSON parser normalizes the lexical form — documented deviation).
- draft-4 uses `id` as the base-URI keyword (registry legacy_id).
- content assertions (`contentEncoding`/`contentMediaType`): drafts 6-7
  assert (content::compile_* registered for Draft6|Draft7 only);
  2019-09/2020-12 treat them as annotations. PERMISSIVE keeps asserting
  them (engine superset, COVERAGE.md).
- `$recursiveRef` is 2019-09 only; `$dynamicRef`/`prefixItems` are
  2020-12 only; `unevaluated*`/`dependent*`/`minContains`/`maxContains`
  are 2019-09+; `const`/`contains`/`propertyNames` are draft-6+;
  `if`/`then`/`else` are draft-7+.
"""

from __future__ import annotations

from typing import Any

PERMISSIVE = "permissive"
DRAFT4 = "4"
DRAFT6 = "6"
DRAFT7 = "7"
DRAFT201909 = "2019-09"
DRAFT202012 = "2020-12"

_KNOWN = (DRAFT4, DRAFT6, DRAFT7, DRAFT201909, DRAFT202012, PERMISSIVE)

# $schema URI (scheme-insensitive, optional trailing # ) → dialect
_SCHEMA_URIS = {
    "json-schema.org/draft-04/schema": DRAFT4,
    "json-schema.org/draft-06/schema": DRAFT6,
    "json-schema.org/draft-07/schema": DRAFT7,
    "json-schema.org/draft/2019-09/schema": DRAFT201909,
    "json-schema.org/draft/2020-12/schema": DRAFT202012,
}

# keywords introduced at each draft (relative to the engine's superset)
_D6_PLUS = frozenset(["const", "contains", "propertyNames"])
_D7_PLUS = frozenset(["if", "then", "else"])
_D2019_PLUS = frozenset([
    "dependentRequired", "dependentSchemas", "unevaluatedItems",
    "unevaluatedProperties", "minContains", "maxContains",
])
_D2020_PLUS = frozenset(["prefixItems", "$dynamicRef"])
_CONTENT = frozenset(["contentEncoding", "contentMediaType",
                      "contentSchema"])

# per-dialect: assertion keywords to IGNORE (annotation semantics)
_DROPPED: dict[str, frozenset[str]] = {
    PERMISSIVE: frozenset(),
    DRAFT4: _D6_PLUS | _D7_PLUS | _D2019_PLUS | _D2020_PLUS | _CONTENT
    | frozenset(["$recursiveRef"]),
    DRAFT6: _D7_PLUS | _D2019_PLUS | _D2020_PLUS
    | frozenset(["$recursiveRef"]),
    DRAFT7: _D2019_PLUS | _D2020_PLUS | frozenset(["$recursiveRef"]),
    DRAFT201909: _D2020_PLUS | _CONTENT,
    DRAFT202012: _CONTENT | frozenset(["$recursiveRef"]),
}

# structural keys that survive $ref-exclusivity filtering: they carry no
# assertions but anchor resolution / future walks depend on them
_REF_SIBLING_KEEP = frozenset(["$ref", "$id", "id", "$schema", "$defs",
                               "definitions", "$anchor", "$comment"])


class Dialect:
    def __init__(self, name: str):
        if name not in _KNOWN:
            raise ValueError(f"unknown dialect {name!r}; one of {_KNOWN}")
        self.name = name
        self.dropped = _DROPPED[name]
        self.ref_exclusive = name in (DRAFT4, DRAFT6, DRAFT7)
        self.draft4_numbers = name == DRAFT4
        self.legacy_id = name == DRAFT4

    def effective(self, schema: Any) -> Any:
        """The validation-effective view of one schema node under this
        dialect: inapplicable keywords removed, `$ref` siblings removed
        in exclusive-$ref drafts. Returns the SAME object when nothing
        changes (identity matters: the registry's base-URI map is keyed
        by object id). Reference resolution must always use the ORIGINAL
        node as referrer."""
        if self.name == PERMISSIVE or not isinstance(schema, dict):
            return schema
        if self.ref_exclusive and "$ref" in schema and len(schema) > 1:
            return {k: v for k, v in schema.items()
                    if k in _REF_SIBLING_KEEP}
        drop = self.dropped.intersection(schema)
        if self.draft4_numbers:
            # draft-4 knows only the BOOLEAN exclusive forms (handled by
            # the minimum/maximum normalization); numeric forms are
            # post-draft-4 keywords → ignored
            extra = [k for k in ("exclusiveMinimum", "exclusiveMaximum")
                     if not isinstance(schema.get(k, False), bool)]
            if extra:
                drop = set(drop) | set(extra)
        if not drop:
            return schema
        return {k: v for k, v in schema.items() if k not in drop}


def detect_dialect(schema: Any, explicit: str | None = None) -> Dialect:
    """Resolve the active dialect: explicit option > root `$schema` URI >
    PERMISSIVE. Unknown `$schema` URIs fall back to PERMISSIVE (the
    reference maps unknown metaschemas to its Unknown≈2020-12 bucket;
    the engine's permissive superset is its 2020-12-plus-compat
    equivalent)."""
    if explicit is not None:
        return Dialect(explicit)
    if isinstance(schema, dict) and isinstance(schema.get("$schema"), str):
        uri = schema["$schema"].split("://", 1)[-1].rstrip("#")
        d = _SCHEMA_URIS.get(uri)
        if d is not None:
            return Dialect(d)
    return Dialect(PERMISSIVE)
