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

# ---------------------------------------------------------------------------
# $vocabulary (2019-09+): keyword applicability further gated by the
# vocabulary set the META-SCHEMA declares. Analog of the reference's
# Vocabulary enum + VocabularySet
# (jsonschema-referencing/src/vocabularies.rs:12-143), its
# registry.find_vocabularies (registry.rs:526-553: custom meta-schema in
# the registry → its `$vocabulary` keys; standard/unknown → draft
# defaults) and the per-keyword has_vocabulary gates in
# keywords/mod.rs:254-510. Core can never be disabled
# (compiler.rs:662-667), and drafts <2019-09 ignore $vocabulary entirely.

# vocabulary URI (scheme-insensitive) → canonical short name
_VOCAB_URIS = {
    "json-schema.org/draft/2020-12/vocab/core": "core",
    "json-schema.org/draft/2020-12/vocab/applicator": "applicator",
    "json-schema.org/draft/2020-12/vocab/unevaluated": "unevaluated",
    "json-schema.org/draft/2020-12/vocab/validation": "validation",
    "json-schema.org/draft/2020-12/vocab/meta-data": "meta-data",
    "json-schema.org/draft/2020-12/vocab/format-annotation":
        "format-annotation",
    "json-schema.org/draft/2020-12/vocab/format-assertion":
        "format-assertion",
    "json-schema.org/draft/2020-12/vocab/content": "content",
    "json-schema.org/draft/2019-09/vocab/core": "core",
    "json-schema.org/draft/2019-09/vocab/applicator": "applicator",
    "json-schema.org/draft/2019-09/vocab/validation": "validation",
    "json-schema.org/draft/2019-09/vocab/meta-data": "meta-data",
    "json-schema.org/draft/2019-09/vocab/format": "format",
    "json-schema.org/draft/2019-09/vocab/content": "content",
}

_VOCAB_APPLICATOR = frozenset([
    "additionalItems", "additionalProperties", "allOf", "anyOf",
    "dependencies", "items", "not", "oneOf", "patternProperties",
    "properties", "contains", "propertyNames", "if", "then", "else",
    "dependentSchemas", "prefixItems",
])
_VOCAB_VALIDATION = frozenset([
    "type", "enum", "const", "multipleOf", "maximum", "exclusiveMaximum",
    "minimum", "exclusiveMinimum", "maxLength", "minLength", "pattern",
    "maxItems", "minItems", "uniqueItems", "maxContains", "minContains",
    "maxProperties", "minProperties", "required", "dependentRequired",
])
_VOCAB_UNEVALUATED = frozenset(["unevaluatedItems",
                                "unevaluatedProperties"])


def _keyword_vocabulary(name: str, keyword: str) -> str | None:
    """Vocabulary owning `keyword` under dialect `name`, or None for
    core/ungated keywords (mirrors keywords/mod.rs gate conditions:
    unevaluated* sit in `applicator` in 2019-09 but their own
    `unevaluated` vocabulary in 2020-12; `format` is vocab `format` in
    2019-09 and `format-annotation` in 2020-12)."""
    if keyword in _VOCAB_VALIDATION:
        return "validation"
    if keyword in _VOCAB_UNEVALUATED:
        return "applicator" if name == DRAFT201909 else "unevaluated"
    if keyword in _VOCAB_APPLICATOR:
        return "applicator"
    if keyword == "format":
        return "format" if name == DRAFT201909 else "format-annotation"
    return None


def resolve_vocabularies(schema: Any,
                         resources: dict | None) -> frozenset | None:
    """The vocabulary set the root schema's meta-schema declares, or None
    for "all defaults" (standard meta-schema, meta-schema without
    `$vocabulary`, or meta-schema not provided). Reference:
    registry.find_vocabularies (registry.rs:526-553) — a custom
    meta-schema is looked up among registered resources and its
    `$vocabulary` keys are parsed (vocabularies.rs FromStr); unknown
    meta-schemas fall back to draft defaults. "core" is force-included
    (compiler.rs:663: Vocabulary::Core is always on)."""
    if not isinstance(schema, dict):
        return None
    meta_uri = schema.get("$schema")
    if not isinstance(meta_uri, str):
        return None
    if meta_uri.split("://", 1)[-1].rstrip("#") in _SCHEMA_URIS:
        return None  # standard meta-schema → draft defaults
    meta = None
    for key in (meta_uri, meta_uri.rstrip("#")):
        if resources and key in resources:
            meta = resources[key]
            break
    if not isinstance(meta, dict):
        return None  # unregistered meta-schema → defaults (registry.rs:550)
    vocab = meta.get("$vocabulary")
    if not isinstance(vocab, dict):
        return None
    names = {"core"}
    for vuri in vocab:
        key = vuri.split("://", 1)[-1].rstrip("#")
        # unknown vocabulary URIs are kept verbatim (Vocabulary::Custom)
        names.add(_VOCAB_URIS.get(key, vuri))
    return frozenset(names)


class Dialect:
    def __init__(self, name: str):
        if name not in _KNOWN:
            raise ValueError(f"unknown dialect {name!r}; one of {_KNOWN}")
        self.name = name
        self.dropped = _DROPPED[name]
        self.ref_exclusive = name in (DRAFT4, DRAFT6, DRAFT7)
        self.draft4_numbers = name == DRAFT4
        self.legacy_id = name == DRAFT4
        # reference compiler.rs:271-276 validates_formats_by_default:
        # drafts 4/6/7 assert `format` unless the user says otherwise
        self.formats_assert_by_default = name in (DRAFT4, DRAFT6, DRAFT7)
        self.vocabularies: frozenset | None = None  # None = draft defaults

    def bind_vocabularies(self, vocab: frozenset | None) -> "Dialect":
        """Restrict keyword applicability to the meta-schema's declared
        `$vocabulary` set (2019-09+ only — drafts <2019-09 have no
        vocabulary concept, compiler.rs:662-667). A keyword whose owning
        vocabulary is absent becomes an annotation: present in the
        schema, never asserted (keywords/mod.rs has_vocabulary gates)."""
        if vocab is None or self.name not in (DRAFT201909, DRAFT202012):
            return self
        self.vocabularies = vocab
        if self.name == DRAFT202012 and "format-assertion" in vocab:
            # 2020-12 §7.2.1: a meta-schema that enables the
            # format-assertion vocabulary makes `format` an assertion by
            # default (overridable via validate_formats=False)
            self.formats_assert_by_default = True
        gated = _VOCAB_APPLICATOR | _VOCAB_VALIDATION | _VOCAB_UNEVALUATED
        off = set(
            kw for kw in gated
            if _keyword_vocabulary(self.name, kw) not in vocab)
        if self.name == DRAFT201909:
            if "format" not in vocab:
                off.add("format")
        elif ("format-annotation" not in vocab
              and "format-assertion" not in vocab):
            off.add("format")
        off = frozenset(off)
        self.dropped = self.dropped | off
        return self

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


def detect_dialect(schema: Any, explicit: str | None = None,
                   resources: dict | None = None) -> Dialect:
    """Resolve the active dialect: explicit option > root `$schema` URI >
    PERMISSIVE. A custom `$schema` URI registered in `resources` is
    followed through ITS `$schema` chain (bounded) — the reference
    resolves a custom meta-schema's draft the same way
    (registry.rs:526-553) — and the custom meta-schema's `$vocabulary`
    then gates keyword applicability (bind_vocabularies). Unknown,
    unregistered `$schema` URIs fall back to PERMISSIVE (the reference
    maps unknown metaschemas to its Unknown≈2020-12 bucket; the engine's
    permissive superset is its 2020-12-plus-compat equivalent)."""
    if explicit is not None:
        return Dialect(explicit)
    node, hops = schema, 0
    while isinstance(node, dict) and isinstance(node.get("$schema"), str) \
            and hops < 8:
        meta_uri = node["$schema"]
        d = _SCHEMA_URIS.get(meta_uri.split("://", 1)[-1].rstrip("#"))
        if d is not None:
            dialect = Dialect(d)
            if node is not schema:
                # draft came from a custom meta-schema: apply its
                # $vocabulary restrictions to the instance schema
                dialect.bind_vocabularies(
                    resolve_vocabularies(schema, resources))
            return dialect
        nxt = None
        for key in (meta_uri, meta_uri.rstrip("#")):
            if resources and key in resources:
                nxt = resources[key]
                break
        if nxt is None or nxt is node:
            if nxt is node:
                # self-referential custom meta-schema: the reference's
                # Draft::Unknown bucket → 2020-12 semantics with the
                # meta-schema's own $vocabulary (registry.rs:550-553)
                return Dialect(DRAFT202012).bind_vocabularies(
                    resolve_vocabularies(schema, resources))
            break
        node, hops = nxt, hops + 1
    if hops > 0:
        # chain entered a REGISTERED custom meta-schema but never named a
        # standard draft: Unknown ≈ 2020-12 (registry.rs:550-551)
        return Dialect(DRAFT202012).bind_vocabularies(
            resolve_vocabularies(schema, resources))
    return Dialect(PERMISSIVE)
