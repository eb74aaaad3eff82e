"""Compiled-plan node model.

The reference compiles a schema once into an immutable SchemaNode tree of
keyword validators (crates/jsonschema/src/node.rs:19-69); we compile once
into a tree of *Column-expression builders*. A node's `valid(col)` /
`errors(col, path)` are pure functions Column -> Column, so they compose
inside higher-order-function lambdas (F.transform / F.forall) for array
recursion — the Spark analog of the reference's per-instance tree walk.

Null convention: SQL NULL = "absent" (rows rendered to JSON with nulls
omitted — Spark to_json's default — so the differential oracle sees the
same instance). Keywords therefore skip null values; presence is enforced
by `required` alone.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

ERR_FIELDS = "instance_path:string,schema_path:string,keyword:string,message:string"
ERR_ARRAY_DDL = f"array<struct<{ERR_FIELDS}>>"


def empty_errors() -> Column:
    return F.expr(f"CAST(array() AS {ERR_ARRAY_DDL})")


# message-decorator stack (reference masked_with analog, error.rs:496-516
# + jsonschema-py mask= kwarg lib.rs:739-750): a plan that wants
# value-embedding or masked messages pushes a decorator
# (failing_value_col, template) -> message Column while it builds error
# columns. Default (empty stack) keeps the engine's static templates,
# which never embed instance values — the default-safe behavior.
_MSG_DECORATORS: list = []


class message_decorator:
    """Context manager installing a message decorator for the duration
    of error-column construction (build-time only — the stack does not
    exist at executor time)."""

    def __init__(self, fn):
        self.fn = fn

    def __enter__(self):
        _MSG_DECORATORS.append(self.fn)
        return self

    def __exit__(self, *exc):
        _MSG_DECORATORS.pop()
        return False


def masked_message(template: str, col: Column, *,
                   mask: str | None, value_repr=None) -> Column:
    """Reference-style message head: '<value-or-placeholder> <template>'.
    mask set → the literal placeholder (never touches the data);
    otherwise `value_repr(col)` (e.g. to_json) embeds the failing value.
    """
    if mask is not None:
        return F.lit(f"{mask} {template}")
    if value_repr is None:
        return F.lit(template)
    return F.concat(F.coalesce(value_repr(col), F.lit("null")),
                    F.lit(f" {template}"))


# reference-parity message catalog (error.rs:1330-1560 Display impl):
# TAILS that follow the embedded instance head under message_values /
# mask mode. Entries marked headless are complete messages (the
# reference embeds no instance for them). Values/limits render as
# compact JSON, matching serde_json Display.
def reference_message(keyword: str, schema: dict):
    """(message, headless) for the value-embedding mode, or None when
    the engine's static template should be kept. `schema` is the node's
    schema dict (the keyword's operands come from it)."""
    import json as _json

    def j(x):
        return _json.dumps(x, separators=(",", ":"))

    def plural(n, one, many):
        return one if n == 1 else many

    if keyword not in schema:
        return None
    val = schema[keyword]
    if keyword == "type":
        if isinstance(val, str):
            return (f'is not of type "{val}"', False)
        return ("is not of types " + ", ".join(f'"{t}"' for t in val), False)
    if keyword == "enum":
        opts = [j(o) for o in val]
        if len(opts) == 1:
            body = opts[0]
        elif len(opts) <= 3:
            body = ", ".join(opts[:-1]) + " or " + opts[-1]
        else:
            body = ", ".join(opts[:3]) + \
                f" or {len(val) - 3} other candidates"
        return ("is not one of " + body, False)
    if keyword == "const":
        return (f"{j(val)} was expected", True)
    if keyword == "minimum":
        return (f"is less than the minimum of {j(val)}", False)
    if keyword == "maximum":
        return (f"is greater than the maximum of {j(val)}", False)
    if keyword == "exclusiveMinimum" and not isinstance(val, bool):
        return (f"is less than or equal to the minimum of {j(val)}", False)
    if keyword == "exclusiveMaximum" and not isinstance(val, bool):
        return (f"is greater than or equal to the maximum of {j(val)}",
                False)
    if keyword == "multipleOf":
        return (f"is not a multiple of {j(val)}", False)
    if keyword == "minLength":
        return (f"is shorter than {val} "
                f"{plural(val, 'character', 'characters')}", False)
    if keyword == "maxLength":
        return (f"is longer than {val} "
                f"{plural(val, 'character', 'characters')}", False)
    if keyword == "minItems":
        return (f"has less than {val} {plural(val, 'item', 'items')}",
                False)
    if keyword == "maxItems":
        return (f"has more than {val} {plural(val, 'item', 'items')}",
                False)
    if keyword == "minProperties":
        return (f"has less than {val} "
                f"{plural(val, 'property', 'properties')}", False)
    if keyword == "maxProperties":
        return (f"has more than {val} "
                f"{plural(val, 'property', 'properties')}", False)
    if keyword == "pattern":
        return (f'does not match "{val}"', False)
    if keyword == "uniqueItems" and val is True:
        return ("has non-unique elements", False)
    return None


def apply_reference_messages(rules, schema: dict) -> None:
    """Attach reference-parity value messages to freshly built rules.
    Called once per compiled node; rules hoisted from $ref subschemas
    already carry their own value_message (set by the sub-assembly), so
    only untouched rules are decorated. `required` is per-property and
    set at its builders, not here."""
    for r in rules:
        if r.value_message is None and r.errors_fn is None:
            rm = reference_message(r.keyword, schema)
            if rm is not None:
                r.value_message, r.headless = rm


def one_error(path: Column, schema_path: str, keyword: str,
              message, value_col: Column | None = None) -> Column:
    if isinstance(message, str):
        msg = F.lit(message)
        if _MSG_DECORATORS and value_col is not None:
            msg = _MSG_DECORATORS[-1](value_col, message)
    else:
        msg = message
    return F.array(
        F.struct(
            path.alias("instance_path"),
            F.lit(schema_path).alias("schema_path"),
            F.lit(keyword).alias("keyword"),
            msg.alias("message"),
        )
    )


def concat_errors(parts: list[Column]) -> Column:
    parts = [p for p in parts if p is not None]
    if not parts:
        return empty_errors()
    if len(parts) == 1:
        return parts[0]
    return F.concat(*parts)


@dataclass
class Rule:
    """One keyword validator.

    pred(col) must be null-safe for NON-null col; the null guard for col
    itself is applied centrally. errors_fn, when set, produces the full
    (possibly nested) error array for this keyword; otherwise a single
    static-message error is emitted on failure.
    """

    keyword: str
    schema_path: str
    message: str
    pred: Callable[[Column], Column]
    errors_fn: Optional[Callable[[Column, Column], Column]] = None
    # static cost priority for fail-fast AND ordering; mirrors
    # keywords/mod.rs:184-252 (lower = cheaper = evaluated first)
    priority: int = 100
    # reference-parity message for the value-embedding / masked modes
    # (reference_message catalog); headless = the message is complete
    # (the reference embeds no instance head for const/required)
    value_message: Optional[str] = None
    headless: bool = False

    def valid_col(self, col: Column) -> Column:
        return F.when(col.isNull(), F.lit(True)).otherwise(
            F.coalesce(self.pred(col), F.lit(False))
        )

    def errors_col(self, col: Column, path: Column) -> Column:
        if self.errors_fn is not None:
            return F.when(col.isNull(), empty_errors()).otherwise(
                self.errors_fn(col, path)
            )
        # a value-head decorator active → reference-parity template
        if _MSG_DECORATORS and self.value_message is not None:
            msg, vcol = self.value_message, \
                (None if self.headless else col)
        else:
            msg, vcol = self.message, col
        return F.when(self.valid_col(col), empty_errors()).otherwise(
            one_error(path, self.schema_path, self.keyword, msg,
                      value_col=vcol)
        )


@dataclass
class Node:
    """A compiled (sub)schema: an ordered list of keyword rules."""

    rules: list[Rule] = field(default_factory=list)

    def sorted_rules(self) -> list[Rule]:
        return sorted(self.rules, key=lambda r: r.priority)

    def valid(self, col: Column) -> Column:
        rules = self.sorted_rules()
        if not rules:
            return F.lit(True)
        out = rules[0].valid_col(col)
        for r in rules[1:]:
            out = out & r.valid_col(col)
        return out

    def errors(self, col: Column, path: Column) -> Column:
        if not self.rules:
            return empty_errors()
        return concat_errors([r.errors_col(col, path) for r in self.sorted_rules()])
