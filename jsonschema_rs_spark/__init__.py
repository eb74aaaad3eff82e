"""jsonschema_rs_spark — a from-scratch PySpark-native schema + constraint
validation engine with the capabilities of the `jsonschema-rs` reference
(studied at /root/reference; see SURVEY.md), re-expressed Spark-first.

Not a port: schemas compile to trees of `pyspark.sql.Column` expressions
(whole-stage-codegen'd, JVM-side) over typed columns, with vectorized
pandas/Arrow UDFs only for dynamic-JSON payloads and RFC-precise formats.
Table-level extensions (uniqueness, referential integrity, KS/chi-square
drift, single-scan column stats) are plain DataFrame aggregations/joins.

Public API (mirrors the reference's `validator_for` / `is_valid` /
`iter_errors` / `evaluate` surface — crates/jsonschema/src/validator.rs:272,
crates/jsonschema-py/python/jsonschema_rs/__init__.pyi):

    plan = compile_schema(schema_dict, df.schema, options=ValidationOptions())
    df2  = plan.with_validation(df)        # + valid boolean, errors array
    bad  = plan.violations(df)             # exploded violation rows
    summ = plan.summary(df)                # per-partition pass/fail
"""

from jsonschema_rs_spark.errors import (EmailOptions, HttpOptions,
                                        PatternOptions, ReferencingError,
                                        SchemaError, ValidationOptions)
from jsonschema_rs_spark.compiler.compiler import compile_schema
from jsonschema_rs_spark.compiler.variant import (CompiledJsonSchema,
                                                  compile_json_schema)
from jsonschema_rs_spark.plans.plan import CompiledSchema
from jsonschema_rs_spark.session import get_spark
from jsonschema_rs_spark.api import (Evaluation, FancyRegexOptions,
                                     Registry, RegexOptions,
                                     ValidationError,
                                     ValidationErrorKind, validator_for,
                                     is_valid, validate, iter_errors,
                                     evaluate, meta,
                                     Draft4Validator, Draft6Validator,
                                     Draft7Validator, Draft201909Validator,
                                     Draft202012Validator,
                                     JSONType, JSONPrimitive,
                                     KeywordValidator, RetrieverProtocol,
                                     EvaluationAnnotation,
                                     EvaluationErrorEntry,
                                     FlagOutput, OutputUnit, ListOutput,
                                     PatternOptionsType)

__all__ = [
    "compile_schema",
    "compile_json_schema",
    "CompiledSchema",
    "CompiledJsonSchema",
    "SchemaError",
    "ReferencingError",
    "ValidationOptions",
    "EmailOptions",
    "PatternOptions",
    "FancyRegexOptions",
    "RegexOptions",
    "get_spark",
    # jsonschema-py-parity module surface (api.py)
    "Evaluation",
    "Registry",
    "ValidationError",
    "ValidationErrorKind",
    "validator_for",
    "is_valid",
    "validate",
    "iter_errors",
    "evaluate",
    "meta",
    "Draft4Validator",
    "Draft6Validator",
    "Draft7Validator",
    "Draft201909Validator",
    "Draft202012Validator",
    # typing-surface parity (jsonschema-py __init__.pyi:1-118)
    "HttpOptions",
    "PatternOptionsType",
    "JSONType",
    "JSONPrimitive",
    "KeywordValidator",
    "RetrieverProtocol",
    "EvaluationAnnotation",
    "EvaluationErrorEntry",
    "FlagOutput",
    "OutputUnit",
    "ListOutput",
]

__version__ = "0.1.0"
