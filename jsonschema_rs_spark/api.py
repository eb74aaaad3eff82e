"""Module-level convenience API — parity with jsonschema-py's surface
(crates/jsonschema-py/src/lib.rs: is_valid :1189, validate :1244,
iter_errors :1294, evaluate :1400, validator_for :1469, per-draft
Validator subclasses :1697-1905, meta.is_valid/validate :1977-2040,
python/jsonschema_rs/__init__.pyi).

These helpers exist so a reference user's single-instance calls run
unchanged; the DATASET path (CompiledJsonSchema.with_validation over a
DataFrame) is the engine's real surface. Single-instance calls reuse one
SparkSession and run a 1-row job — correct, not fast; that is the same
trade the reference makes in reverse (its per-instance calls are fast,
its dataset scans are the user's loop).

Reference-kwarg mapping: draft= (int 4/6/7/201909/202012) →
ValidationOptions.dialect; validate_formats= → same tri-state;
mask= → options.mask; registry= (Registry or dict) →
options.resources (+ its retriever); retriever= → options.retriever (a
compile-time URI→document callable — the engine performs no network
I/O itself); formats= → options.custom_formats; keywords= →
options.custom_keywords.
"""

from __future__ import annotations

import json
import re
from typing import Any, Iterator

from jsonschema_rs_spark.errors import (EmailOptions, HttpOptions,
                                        PatternOptions, ReferencingError,
                                        SchemaError, ValidationOptions)

_DRAFT_INTS = {4: "4", 6: "6", 7: "7",
               201909: "2019-09", 202012: "2020-12"}


# -- typing-surface parity (jsonschema-py __init__.pyi:1-75) -----------------
# These exist so reference users' imports and annotations keep working;
# they carry no runtime behavior of their own.

from decimal import Decimal as _Decimal  # noqa: E402
from typing import (Callable, List, Protocol,  # noqa: E402
                    TypeAlias, TypedDict, Union)

JSONType: TypeAlias = \
    "dict[str, Any] | list | str | int | float | _Decimal | bool | None"
JSONPrimitive: TypeAlias = "str | int | float | _Decimal | bool | None"


class KeywordValidator(Protocol):
    """Protocol shape of jsonschema-py's custom keyword validators
    (__init__.pyi:10-33) — TYPING PARITY ONLY. This engine's custom
    keywords are Column-native factories with a DIFFERENT contract:
    callable(value, spark_dtype, ctx, schema_path) -> Rule | None,
    applied by the TYPED compiler (compile_schema); see
    docspec.strictly_increasing_factory for the worked example. The
    dynamic-JSON path refuses keywords= outright rather than silently
    skipping them."""

    def __init__(self, parent_schema: dict, value: Any,
                 schema_path: list) -> None: ...

    def validate(self, instance: Any) -> None: ...


class RetrieverProtocol(Protocol):
    """Protocol for the retriever= callable (URI -> schema document)."""

    def __call__(self, uri: str) -> Any: ...


class EvaluationAnnotation(TypedDict):
    schemaLocation: str
    absoluteKeywordLocation: "str | None"
    instanceLocation: str
    annotations: Any


class EvaluationErrorEntry(TypedDict):
    schemaLocation: str
    absoluteKeywordLocation: "str | None"
    instanceLocation: str
    error: str


class FlagOutput(TypedDict):
    """JSON Schema Output v1 — Flag format."""

    valid: bool


class OutputUnit(TypedDict, total=False):
    """A single output unit in list/hierarchical formats."""

    valid: bool
    evaluationPath: str
    schemaLocation: str
    instanceLocation: str
    errors: "dict[str, str]"
    annotations: Any
    droppedAnnotations: Any
    details: List["OutputUnit"]


class ListOutput(TypedDict):
    """JSON Schema Output v1 — List format."""

    valid: bool
    details: List[OutputUnit]


class _KindBase:
    """Shared name/value/as_dict surface of every kind instance
    (jsonschema-py __init__.pyi:215-222)."""

    _kw = ""  # the JSON Schema keyword, set per subclass

    def __init__(self, **payload):
        for k, v in payload.items():
            setattr(self, k, v)
        self._payload = payload

    @property
    def name(self) -> str:
        """The JSON Schema keyword that triggered this error."""
        return self._kw

    @property
    def value(self):
        vals = list(self._payload.values())
        return vals[0] if len(vals) == 1 else (self._payload or None)

    def as_dict(self) -> dict:
        return dict(self._payload)

    def __repr__(self):
        inner = ", ".join(f"{k}={v!r}" for k, v in self._payload.items())
        return f"ValidationErrorKind.{type(self).__name__}({inner})"


class ValidationErrorKind:
    """Typed error kinds — jsonschema-py `ValidationErrorKind`
    (__init__.pyi:215-334; error.rs ValidationErrorKind variants).
    `ValidationError.kind` is an instance of one of the inner classes;
    payloads that are schema-derived (limits, enum options, patterns,
    formats, expected consts, types, multiples) are reconstructed by
    resolving the error's schema_path pointer into the schema. Payloads
    only knowable from the failing instance (anyOf/oneOf sub-contexts,
    unevaluated* index/name lists beyond the error's own instance_path)
    are approximated from the error row or left empty — a documented
    difference from the in-process reference, which holds the instance
    while building the error."""


def _def_kind(name, kw):
    cls = type(name, (_KindBase,), {"_kw": kw})
    setattr(ValidationErrorKind, name, cls)
    return cls


for _n, _k in [
    ("AdditionalItems", "additionalItems"),
    ("AdditionalProperties", "additionalProperties"),
    ("AnyOf", "anyOf"), ("Constant", "const"), ("Contains", "contains"),
    ("ContentEncoding", "contentEncoding"),
    ("ContentMediaType", "contentMediaType"), ("Custom", "custom"),
    ("Enum", "enum"), ("ExclusiveMaximum", "exclusiveMaximum"),
    ("ExclusiveMinimum", "exclusiveMinimum"),
    ("FalseSchema", "false schema"), ("Format", "format"),
    ("MaxItems", "maxItems"), ("Maximum", "maximum"),
    ("MaxLength", "maxLength"), ("MaxProperties", "maxProperties"),
    ("MinItems", "minItems"), ("Minimum", "minimum"),
    ("MinLength", "minLength"), ("MinProperties", "minProperties"),
    ("MultipleOf", "multipleOf"), ("Not", "not"),
    ("OneOfMultipleValid", "oneOf"), ("OneOfNotValid", "oneOf"),
    ("Pattern", "pattern"), ("PropertyNames", "propertyNames"),
    ("Required", "required"), ("Type", "type"),
    ("UnevaluatedItems", "unevaluatedItems"),
    ("UnevaluatedProperties", "unevaluatedProperties"),
    ("UniqueItems", "uniqueItems"),
]:
    _def_kind(_n, _k)


def _ptr_value(schema, pointer: str):
    """Resolve a JSON-pointer-style schema_path into `schema`.
    Empty tokens address EMPTY-STRING keys (RFC 6901) — only the
    split artifact of a leading '/' is dropped; a same-document
    '$ref' segment ('#/...') is followed so errors under a ref still
    reconstruct schema-derived kinds (both review finds)."""
    node = schema
    segs = pointer.split("/")
    if segs and segs[0] == "":
        segs = segs[1:]
    for seg in segs:
        seg = seg.replace("~1", "/").replace("~0", "~")
        if isinstance(node, dict) and seg == "$ref" \
                and isinstance(node.get("$ref"), str) \
                and node["$ref"].startswith("#/"):
            node = _ptr_value(schema, node["$ref"][1:])
            continue
        if isinstance(node, list):
            node = node[int(seg)]
        elif isinstance(node, dict):
            node = node[seg]
        else:
            raise KeyError(seg)
    return node


# keyword -> (kind class name, payload attr) for schema-derived payloads
_SCHEMA_KINDS = {
    "maximum": ("Maximum", "limit"),
    "minimum": ("Minimum", "limit"),
    "exclusiveMaximum": ("ExclusiveMaximum", "limit"),
    "exclusiveMinimum": ("ExclusiveMinimum", "limit"),
    "maxLength": ("MaxLength", "limit"),
    "minLength": ("MinLength", "limit"),
    "maxItems": ("MaxItems", "limit"),
    "minItems": ("MinItems", "limit"),
    "maxProperties": ("MaxProperties", "limit"),
    "minProperties": ("MinProperties", "limit"),
    "multipleOf": ("MultipleOf", "multiple_of"),
    "enum": ("Enum", "options"),
    "const": ("Constant", "expected_value"),
    "pattern": ("Pattern", "pattern"),
    "format": ("Format", "format"),
    "contentEncoding": ("ContentEncoding", "content_encoding"),
    "contentMediaType": ("ContentMediaType", "content_media_type"),
    "not": ("Not", "schema"),
}
_BARE_KINDS = {"contains": "Contains", "uniqueItems": "UniqueItems",
               "anyOf": "AnyOf", "oneOf": "OneOfNotValid",
               "propertyNames": "PropertyNames"}


def _kind_for(schema, keyword: str, schema_path: str, instance_path: str,
              message: str):
    """Best-effort typed kind for an error row (see
    ValidationErrorKind docstring for the approximation contract)."""
    try:
        if keyword in _SCHEMA_KINDS:
            cls_name, attr = _SCHEMA_KINDS[keyword]
            val = _ptr_value(schema, schema_path)
            return getattr(ValidationErrorKind, cls_name)(**{attr: val})
        if keyword == "type":
            val = _ptr_value(schema, schema_path)
            return ValidationErrorKind.Type(
                types=val if isinstance(val, list) else [val])
        if keyword == "required":
            # Anchor on the two known message templates so a property
            # name containing an apostrophe ("it's") is captured whole;
            # the quoted form is a repr/json.dumps literal, so decode it
            # instead of splitting on quotes. None when neither matches.
            prop = None
            m = re.match(r"^missing required property (.+)$", message)
            if m is None:
                m = re.match(r"^(.+) is a required property$", message)
            if m is not None:
                try:
                    import ast
                    prop = ast.literal_eval(m.group(1))
                    if isinstance(prop, str):
                        # json.dumps escapes astral chars as surrogate
                        # PAIRS (𝄞); literal_eval keeps them
                        # as two lone surrogates — recombine so the
                        # property matches the schema's actual name
                        prop = prop.encode(
                            "utf-16", "surrogatepass").decode("utf-16")
                except (ValueError, SyntaxError, UnicodeDecodeError):
                    prop = None
            return ValidationErrorKind.Required(
                property=prop if isinstance(prop, str) else None)
        if keyword in ("additionalProperties", "unevaluatedProperties"):
            cls = ValidationErrorKind.AdditionalProperties \
                if keyword == "additionalProperties" \
                else ValidationErrorKind.UnevaluatedProperties
            name = instance_path.rsplit("/", 1)[-1] if instance_path else ""
            name = name.replace("~1", "/").replace("~0", "~")
            return cls(unexpected=[name] if name else [])
        if keyword == "unevaluatedItems":
            idx = instance_path.rsplit("/", 1)[-1]
            return ValidationErrorKind.UnevaluatedItems(
                unexpected=[int(idx)] if idx.isdigit() else [])
        if keyword in _BARE_KINDS:
            return getattr(ValidationErrorKind, _BARE_KINDS[keyword])()
    except Exception:  # noqa: BLE001 — payload resolution is best-effort
        pass
    return ValidationErrorKind.Custom(keyword=keyword, message=message)


class ValidationError(ValueError):
    """First validation failure, reference-style (jsonschema-py
    ValidationError: message + instance_path + schema_path + typed
    `kind` + the failing sub-`instance`; verbose_message aliases
    message — the engine's messages are single-line)."""

    def __init__(self, message: str, instance_path: str = "",
                 schema_path: str = "", keyword: str = "",
                 kind=None, instance=None):
        super().__init__(message)
        self.message = message
        self.verbose_message = message
        self.instance_path = instance_path
        self.schema_path = schema_path
        self.keyword = keyword
        self.kind = kind
        self.instance = instance


class Registry:
    """jsonschema-py `Registry` analog (lib.rs registry class;
    referencing::Registry): bundled external resources plus an optional
    compile-time retriever for URIs outside the bundle. Accepts a dict
    {uri: schema} or an iterable of (uri, schema) pairs."""

    def __init__(self, resources=None, retriever=None):
        self.resources = dict(resources or {})
        self.retriever = retriever


def _options(draft=None, validate_formats=None, mask=None, registry=None,
             formats=None, keywords=None, ignore_unknown_formats=True,
             retriever=None, base_uri=None, email_options=None,
             pattern_options=None, http_options=None,
             base: ValidationOptions | None = None) -> ValidationOptions:
    if http_options is not None:
        # accepted for signature parity (jsonschema-py validator_for's
        # http_options=, lib.rs:991), rejected with the supported
        # alternatives: this engine performs no network I/O
        raise SchemaError(
            "http_options is not supported: this engine performs no "
            "network I/O (documented non-goal). Supply external schema "
            "documents via registry=/resources= or a retriever= callable.")
    if base is not None:
        return base
    dialect = None
    if draft is not None:
        if draft not in _DRAFT_INTS:
            raise SchemaError(f"unknown draft {draft!r}; expected one of "
                              f"{sorted(_DRAFT_INTS)}")
        dialect = _DRAFT_INTS[draft]
    if isinstance(registry, Registry):
        retriever = retriever or registry.retriever
        registry = registry.resources
    return ValidationOptions(
        dialect=dialect, validate_formats=validate_formats, mask=mask,
        resources=dict(registry or {}),
        custom_formats=dict(formats or {}),
        custom_keywords=dict(keywords or {}),
        ignore_unknown_formats=ignore_unknown_formats,
        retriever=retriever, base_uri=base_uri,
        email_options=email_options, pattern_options=pattern_options)


def FancyRegexOptions(backtrack_limit=None, size_limit=None,
                      dfa_size_limit=None) -> PatternOptions:
    """jsonschema-py constructor parity (__init__.pyi FancyRegexOptions):
    the backtracking engine with advisory limits."""
    return PatternOptions(engine="backtracking",
                          backtrack_limit=backtrack_limit,
                          size_limit=size_limit,
                          dfa_size_limit=dfa_size_limit)


def RegexOptions(size_limit=None, dfa_size_limit=None) -> PatternOptions:
    """jsonschema-py constructor parity (__init__.pyi RegexOptions): the
    linear-time engine — lookaround/backref patterns fail compilation."""
    return PatternOptions(engine="linear", size_limit=size_limit,
                          dfa_size_limit=dfa_size_limit)


# both factories return PatternOptions, so the reference's
# `PatternOptionsType = Union[FancyRegexOptions, RegexOptions]` alias
# (__init__.pyi:118) collapses to the one concrete type here
PatternOptionsType: TypeAlias = PatternOptions


def validator_for(schema: Any, **kwargs):
    """Compile `schema` into a dataset-ready validator (reference
    validator_for, lib.rs:1469). Returns a CompiledJsonSchema whose
    with_validation/valid_column/errors_column run over DataFrames; the
    single-instance helpers below also hang off it."""
    from jsonschema_rs_spark.compiler.variant import CompiledJsonSchema

    return CompiledJsonSchema(schema, _options(**kwargs))


def Draft4Validator(schema: Any, **kw):
    return validator_for(schema, draft=4, **kw)


def Draft6Validator(schema: Any, **kw):
    return validator_for(schema, draft=6, **kw)


def Draft7Validator(schema: Any, **kw):
    return validator_for(schema, draft=7, **kw)


def Draft201909Validator(schema: Any, **kw):
    return validator_for(schema, draft=201909, **kw)


def Draft202012Validator(schema: Any, **kw):
    return validator_for(schema, draft=202012, **kw)


# -- single-instance execution ----------------------------------------------

def _session():
    from jsonschema_rs_spark.session import get_spark

    return get_spark(app_name="jsonschema_rs_spark_api")


def _one_row(compiled, instance: Any):
    """Run the compiled plan over ONE instance; returns (valid, errors)."""
    from pyspark.sql import functions as F

    df = _session().createDataFrame(
        [(json.dumps(instance),)], "doc string")
    row = df.select(
        compiled.valid_column(F.col("doc")).alias("valid"),
        compiled.errors_column(F.col("doc")).alias("errors")).first()
    return bool(row["valid"]), list(row["errors"])


def is_valid(schema: Any, instance: Any, **kwargs) -> bool:
    """Reference is_valid (lib.rs:1189)."""
    compiled = validator_for(schema, **kwargs)
    valid, _ = _one_row(compiled, instance)
    return valid


def validate(schema: Any, instance: Any, **kwargs) -> None:
    """Reference validate (lib.rs:1244): raise ValidationError on the
    first failure, return None when valid."""
    for err in iter_errors(schema, instance, **kwargs):
        raise err


def iter_errors(schema: Any, instance: Any,
                **kwargs) -> Iterator[ValidationError]:
    """Reference iter_errors (lib.rs:1294)."""
    compiled = validator_for(schema, **kwargs)
    _, errors = _one_row(compiled, instance)
    for e in errors:
        try:
            sub = _ptr_value(instance, e["instance_path"])
        except Exception:  # noqa: BLE001 — e.g. a missing-property path
            sub = None
        yield ValidationError(
            e["message"], e["instance_path"], e["schema_path"],
            e["keyword"],
            kind=_kind_for(schema, e["keyword"], e["schema_path"],
                           e["instance_path"], e["message"]),
            instance=sub)


def evaluate(schema: Any, instance: Any, output_format: str = "flag",
             **kwargs) -> dict:
    """Reference evaluate (lib.rs:1400) + Evaluation.flag/list/
    hierarchical (lib.rs:176): returns the Output v1 payload as a dict."""
    from pyspark.sql import functions as F

    from jsonschema_rs_spark.compiler.output import OutputPlan

    opts = _options(**kwargs)
    if output_format == "flag":
        from jsonschema_rs_spark.compiler.variant import CompiledJsonSchema
        valid, _ = _one_row(CompiledJsonSchema(schema, opts), instance)
        return {"valid": valid}
    if output_format not in ("list", "hierarchical"):
        raise ValueError(f"unknown output format {output_format!r}")
    plan = OutputPlan(schema, opts)
    col = (plan.list_column(F.col("doc")) if output_format == "list"
           else plan.hierarchical_column(F.col("doc")))
    df = _session().createDataFrame([(json.dumps(instance),)],
                                    "doc string")
    return json.loads(df.select(col.alias("o")).first()["o"])


class Evaluation:
    """Reference `Evaluation` analog (lib.rs PyEvaluation :181-230):
    one evaluation of `instance` against `schema`, viewable as Output v1
    flag / list / hierarchical, with annotations() and errors()
    extracted from the list format's units. Views are computed lazily
    and cached (one 1-row Spark job per requested format)."""

    def __init__(self, schema: Any, instance: Any, **kwargs):
        self._schema, self._instance = schema, instance
        self._kwargs = kwargs
        self._cache: dict = {}

    def _get(self, fmt: str) -> dict:
        if fmt not in self._cache:
            self._cache[fmt] = evaluate(self._schema, self._instance,
                                        output_format=fmt, **self._kwargs)
        return self._cache[fmt]

    @property
    def valid(self) -> bool:
        return self.flag()["valid"]

    def flag(self) -> dict:
        return self._get("flag")

    def list(self) -> dict:
        return self._get("list")

    def hierarchical(self) -> dict:
        return self._get("hierarchical")

    def annotations(self) -> list:
        return [u for u in self.list().get("details", [])
                if "annotations" in u]

    def errors(self) -> list:
        return [u for u in self.list().get("details", [])
                if u.get("errors")]


# -- meta (schema-against-metaschema) ----------------------------------------

class meta:
    """Analog of the reference's `meta` submodule (lib.rs:1977-2040)."""

    @staticmethod
    def is_valid(schema: Any) -> bool:
        try:
            meta.validate(schema)
            return True
        except SchemaError:
            return False

    @staticmethod
    def validate(schema: Any) -> None:
        from jsonschema_rs_spark.spec.model import meta_validate

        meta_validate(schema)


__all__ = [
    "EmailOptions",
    "HttpOptions",
    "ReferencingError",
    "PatternOptions",
    "PatternOptionsType",
    "FancyRegexOptions",
    "RegexOptions",
    "JSONType", "JSONPrimitive",
    "KeywordValidator", "RetrieverProtocol",
    "EvaluationAnnotation", "EvaluationErrorEntry",
    "FlagOutput", "OutputUnit", "ListOutput",
    "Registry", "Evaluation", "ValidationError", "ValidationErrorKind",
    "validator_for",
    "is_valid", "validate", "iter_errors", "evaluate", "meta",
    "Draft4Validator", "Draft6Validator", "Draft7Validator",
    "Draft201909Validator", "Draft202012Validator",
]
