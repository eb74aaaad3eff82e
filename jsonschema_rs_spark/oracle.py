"""Bridge to the differential oracle (Python `jsonschema`).

Rows are rendered to JSON instances with nulls OMITTED — matching Spark
to_json's default null handling and the engine's null-as-absent
convention — so the oracle validates exactly the instance the engine saw.
"""

from __future__ import annotations

import datetime
from typing import Any


def clean(value: Any) -> Any:
    """Recursively drop None entries; Row/dict/list → plain JSON values."""
    if hasattr(value, "asDict"):
        value = value.asDict(recursive=False)
    if isinstance(value, dict):
        return {k: clean(v) for k, v in value.items() if v is not None}
    if isinstance(value, (list, tuple)):
        return [clean(v) for v in value]
    if isinstance(value, (datetime.date, datetime.datetime)):
        return value.isoformat()
    return value


def oracle_verdicts(instances: list[dict], schema: dict) -> list[bool]:
    """Validate each instance with the locally installed `jsonschema`
    (draft 2020-12) — the same official-suite semantics the reference
    passes (SURVEY.md §5)."""
    import jsonschema

    validator = jsonschema.Draft202012Validator(schema)
    return [validator.is_valid(inst) for inst in instances]


def oracle_error_keywords(instance: dict, schema: dict) -> set[str]:
    import jsonschema

    validator = jsonschema.Draft202012Validator(schema)
    out: set[str] = set()

    def walk(errs):
        for e in errs:
            if e.context:
                walk(e.context)
            out.add(e.validator)

    walk(validator.iter_errors(instance))
    return out
