"""The flagship document spec for the interleaved text+media table,
plus the engine's custom-keyword example (x-strictlyIncreasing).

DOC_SPEC_JSON is pure JSON Schema (2020-12 subset) so the Python
`jsonschema` oracle can evaluate the identical spec per row.
DOC_SPEC_FULL adds the engine extension enforcing the north-rule span
ORDER invariant (offsets strictly increasing), which plain JSON Schema
cannot express — registered exactly like the reference's custom keywords
(crates/jsonschema/src/keywords/custom.rs, options.rs:482).
"""

from __future__ import annotations

import copy

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jsonschema_rs_spark.compiler.nodes import Rule
from jsonschema_rs_spark.errors import ValidationOptions

SPAN_KINDS = ["text", "image", "audio", "video", "ref"]

DOC_SPEC_JSON: dict = {
    "$id": "https://example.com/interleaved-document",
    "type": "object",
    "required": ["doc_id", "spans"],
    "properties": {
        "doc_id": {"type": "string", "pattern": "^doc-[0-9]{12}$"},
        "spans": {
            "type": "array",
            "minItems": 1,
            "maxItems": 64,
            "uniqueItems": True,
            "items": {
                "type": "object",
                "required": ["kind", "offset"],
                "properties": {
                    "kind": {"enum": SPAN_KINDS},
                    "text": {"type": "string", "minLength": 1, "maxLength": 10000},
                    "media_ref": {"type": "string",
                                  "pattern": "^asset-[a-z0-9]{8}$"},
                    "offset": {"type": "integer", "minimum": 0},
                },
                "allOf": [
                    {
                        "if": {"properties": {"kind": {"const": "text"}},
                               "required": ["kind"]},
                        "then": {"required": ["text"]},
                        "else": {"required": ["media_ref"]},
                    }
                ],
            },
        },
    },
}

DOC_SPEC_FULL: dict = copy.deepcopy(DOC_SPEC_JSON)
DOC_SPEC_FULL["properties"]["spans"]["x-strictlyIncreasing"] = "offset"


def strictly_increasing_factory(value, dt: T.DataType, ctx, sp: str) -> Rule | None:
    """Custom keyword: array elements' `value` field strictly increases.

    Pure higher-order-function expression — adjacent-pair comparison via
    zip_with over two slices; no shuffle, no Python on executors.
    """
    if not isinstance(dt, T.ArrayType):
        return None
    field = value

    def pred(c: Column) -> Column:
        n = F.size(c)
        a = F.slice(c, 1, F.greatest(n - 1, F.lit(0)))
        b = F.slice(c, 2, F.greatest(n - 1, F.lit(0)))
        return F.forall(
            F.zip_with(a, b,
                       lambda x, y: F.coalesce(
                           y.getField(field) > x.getField(field), F.lit(False))),
            lambda ok: ok,
        )

    return Rule("x-strictlyIncreasing", sp + "/x-strictlyIncreasing",
                f"span field {field!r} not strictly increasing", pred,
                priority=22)


def default_options(validate_formats: bool = False) -> ValidationOptions:
    return ValidationOptions(
        validate_formats=validate_formats,
        custom_keywords={"x-strictlyIncreasing": strictly_increasing_factory},
    )
