"""Meta-validation of constraint specs before compilation.

The reference validates every schema against its meta-schema before
compiling (crates/jsonschema/src/compiler.rs:714-717, 805-823). We do the
same with a hand-rolled structural check over the keyword subset we
compile — raising SchemaError with a schema path, like the reference's
early rejection of garbage schemas.
"""

from __future__ import annotations

from typing import Any

from jsonschema_rs_spark.errors import SchemaError

_JSON_TYPES = {"null", "boolean", "string", "array", "object", "number", "integer"}

_NUMERIC_KW = ("minimum", "maximum", "multipleOf")
_NONNEG_INT_KW = ("minLength", "maxLength", "minItems", "maxItems",
                  "minProperties", "maxProperties", "minContains", "maxContains")
_SCHEMA_KW = ("items", "contains", "additionalProperties", "propertyNames",
              "not", "if", "then", "else", "additionalItems", "unevaluatedItems",
              "unevaluatedProperties")
_SCHEMA_LIST_KW = ("allOf", "anyOf", "oneOf", "prefixItems")
_SCHEMA_MAP_KW = ("properties", "patternProperties", "$defs", "definitions",
                  "dependentSchemas")


def _is_num(v: Any) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def meta_validate(schema: Any, path: str = "") -> None:
    if schema is True or schema is False:
        return
    if not isinstance(schema, dict):
        raise SchemaError("schema must be a boolean or an object", path)

    if "type" in schema:
        tv = schema["type"]
        types = [tv] if isinstance(tv, str) else tv
        if not isinstance(types, list) or not all(
            isinstance(t, str) and t in _JSON_TYPES for t in types
        ):
            raise SchemaError(f"invalid type value {tv!r}", path + "/type")

    for kw in _NUMERIC_KW:
        if kw in schema and not _is_num(schema[kw]):
            raise SchemaError(f"{kw} must be a number", f"{path}/{kw}")
    if "multipleOf" in schema and schema["multipleOf"] <= 0:
        raise SchemaError("multipleOf must be > 0", path + "/multipleOf")
    for kw in ("exclusiveMinimum", "exclusiveMaximum"):
        if kw in schema and not (_is_num(schema[kw]) or isinstance(schema[kw], bool)):
            raise SchemaError(f"{kw} must be a number (or draft-4 bool)",
                              f"{path}/{kw}")
    for kw in _NONNEG_INT_KW:
        if kw in schema:
            v = schema[kw]
            if not isinstance(v, int) or isinstance(v, bool) or v < 0:
                raise SchemaError(f"{kw} must be a non-negative integer",
                                  f"{path}/{kw}")

    if "enum" in schema and not isinstance(schema["enum"], list):
        raise SchemaError("enum must be an array", path + "/enum")
    if "required" in schema:
        req = schema["required"]
        if not isinstance(req, list) or not all(isinstance(k, str) for k in req):
            raise SchemaError("required must be an array of strings",
                              path + "/required")
    if "pattern" in schema and not isinstance(schema["pattern"], str):
        raise SchemaError("pattern must be a string", path + "/pattern")
    if "uniqueItems" in schema and not isinstance(schema["uniqueItems"], bool):
        raise SchemaError("uniqueItems must be a boolean", path + "/uniqueItems")

    for kw in _SCHEMA_KW:
        if kw in schema and not (kw == "items" and isinstance(schema[kw], list)):
            meta_validate(schema[kw], f"{path}/{kw}")
    if isinstance(schema.get("items"), list):
        for i, s in enumerate(schema["items"]):
            meta_validate(s, f"{path}/items/{i}")
    for kw in _SCHEMA_LIST_KW:
        if kw in schema:
            if not isinstance(schema[kw], list) or not schema[kw]:
                raise SchemaError(f"{kw} must be a non-empty array", f"{path}/{kw}")
            for i, s in enumerate(schema[kw]):
                meta_validate(s, f"{path}/{kw}/{i}")
    for kw in _SCHEMA_MAP_KW:
        if kw in schema:
            if not isinstance(schema[kw], dict):
                raise SchemaError(f"{kw} must be an object", f"{path}/{kw}")
            for k, s in schema[kw].items():
                meta_validate(s, f"{path}/{kw}/{k}")

    deps = schema.get("dependencies")
    if deps is not None:
        if not isinstance(deps, dict):
            raise SchemaError("dependencies must be an object", path + "/dependencies")
        for k, v in deps.items():
            if isinstance(v, list):
                if not all(isinstance(s, str) for s in v):
                    raise SchemaError("array-form dependency must list strings",
                                      f"{path}/dependencies/{k}")
            else:
                meta_validate(v, f"{path}/dependencies/{k}")
    dr = schema.get("dependentRequired")
    if dr is not None:
        if not isinstance(dr, dict) or not all(
            isinstance(v, list) and all(isinstance(s, str) for s in v)
            for v in dr.values()
        ):
            raise SchemaError("dependentRequired must map to string arrays",
                              path + "/dependentRequired")
    for kw in ("$ref", "$dynamicRef", "$recursiveRef", "$id", "$anchor",
               "$dynamicAnchor"):
        if kw in schema and not isinstance(schema[kw], str):
            raise SchemaError(f"{kw} must be a string", f"{path}/{kw}")
    if "$recursiveAnchor" in schema \
            and not isinstance(schema["$recursiveAnchor"], bool):
        raise SchemaError("$recursiveAnchor must be a boolean",
                          path + "/$recursiveAnchor")
