"""Suite-vector driver queries: one query per keyword family, each with a
DuckDB VALUES oracle.

The vendored corpus (spec/vectors_2020_12.json, built + python-jsonschema-
validated by scripts/build_vectors.py) is the engine's analog of the
reference's generated official-suite tests (crates/jsonschema-testsuite,
suite.rs:11-24 runs everything). Each family becomes a driver CORRECTNESS
entry: the Spark side compiles every schema in the family through the
VARIANT (dynamic JSON) compiler and validates all of its instances in one
job; the oracle side is the vendored `valid` expectations as a VALUES
list — expectations that the pytest suite independently re-validates
against python-jsonschema, so a wrong pin fails loudly in two places.

Scale note: the corpus is driver-embedded (hundreds of rows) — the point
is verdict parity per keyword, not throughput; the 10^12-row paths are
the table queries in queries.py.
"""

from __future__ import annotations

import functools as _functools

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jsonschema_rs_spark.errors import ValidationOptions

_VECTORS_PATH = os.path.join(os.path.dirname(__file__), "spec",
                             "vectors_2020_12.json")


@_functools.lru_cache(maxsize=4)
def load_vectors() -> list[dict[str, Any]]:
    with open(_VECTORS_PATH) as f:
        return json.load(f)


def families() -> list[str]:
    seen: dict[str, None] = {}
    for grp in load_vectors():
        seen.setdefault(grp["family"], None)
    return list(seen)


# Driver-query consolidation (round-4): the correctness harness reports
# the first 50 registered queries, so the 21 raw families are merged
# into 9 driver queries — keyword-kindred families share one vid space
# (vids run family-by-family in MERGED_FAMILIES order, so a red row
# still localizes to one vector). Draft-gated families stay separate
# from the 2020-12 block; `vocabulary` is 2019-09 machinery and rides
# with draft2019. pytest still runs every group individually
# (test_suite_vectors parametrizes over the RAW corpus).
MERGED_FAMILIES: dict[str, list[str]] = {
    "scalars": ["type", "const", "enum", "numeric", "string"],
    "applicators": ["object", "dependent", "array", "contains", "unique"],
    "combinators": ["combinator", "unevaluated"],
    "refs_content": ["ref", "content"],
    "format": ["format"],
    "canonical": ["canonical"],
    "draft4": ["draft4"],
    "draft67": ["draft6", "draft7"],
    "draft2019": ["draft2019", "vocabulary"],
}


def _member_families(name: str) -> list[str]:
    return MERGED_FAMILIES.get(name, [name])


def options_from_group(grp: dict) -> ValidationOptions:
    """ValidationOptions for a vector group: the group's JSON `options`
    dict, with JSON-able forms of the dataclass options (email_options /
    pattern_options as kwarg dicts) inflated, and a draft pin compiling
    under that DIALECT so per-draft keyword applicability is what the
    vendored expectations certify. Shared by the driver suite queries
    and tests/test_suite_vectors.py."""
    opts_kw = dict(grp.get("options", {}))
    if isinstance(opts_kw.get("email_options"), dict):
        from jsonschema_rs_spark.errors import EmailOptions
        opts_kw["email_options"] = EmailOptions(**opts_kw["email_options"])
    if isinstance(opts_kw.get("pattern_options"), dict):
        from jsonschema_rs_spark.errors import PatternOptions
        opts_kw["pattern_options"] = PatternOptions(
            **opts_kw["pattern_options"])
    if "dialect" not in opts_kw and "draft" in grp:
        opts_kw["dialect"] = grp["draft"]
    return ValidationOptions(**opts_kw)


def _family_rows(family: str):
    """[(vid, schema_idx, doc_json, expected)] + the compiled plans.
    `family` may be a merged name (MERGED_FAMILIES) or a raw one."""
    from jsonschema_rs_spark.compiler.variant import compile_json_schema

    members = _member_families(family)
    groups = [grp for fam in members
              for grp in load_vectors() if grp["family"] == fam]
    plans, rows, vid = [], [], 0
    for si, grp in enumerate(groups):
        opts = options_from_group(grp)
        plans.append(compile_json_schema(grp["schema"], opts))
        for t in grp["tests"]:
            rows.append((vid, si, json.dumps(t["data"]), bool(t["valid"])))
            vid += 1
    return rows, plans


def suite_query(family: str):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        from functools import reduce

        rows, plans = _family_rows(family)
        # one union branch per schema, each a small codegen'd Project of
        # that schema's full compiled Column plan over its own rows — a
        # merged family holds ~50 plans, and chaining them into ONE
        # CaseWhen expression blows past Janino's 64KB method limit
        # (whole-stage codegen falls back to the interpreter); the union
        # keeps every branch inside codegen and is still one job
        parts = []
        for si, plan in enumerate(plans):
            rs = [(r[0], r[2]) for r in rows if r[1] == si]
            pdf = spark.createDataFrame(rs, "vid long, doc string")
            parts.append(pdf.select(
                "vid", plan.valid_column(F.col("doc")).alias("valid")))
        return reduce(DataFrame.unionAll, parts)

    q.__name__ = f"suite_{family}"
    q.__doc__ = (f"Vendored suite vectors, family {family!r}: verdict "
                 "parity against the corpus expectations "
                 "(reference suite.rs:11-24).")
    return q


def _family_expectations(family: str):
    """(vid, expected) pairs — the oracle side never compiles plans.
    Group iteration order matches _family_rows exactly (merged names
    expand member-by-member), so vids line up by construction."""
    members = _member_families(family)
    groups = [grp for fam in members
              for grp in load_vectors() if grp["family"] == fam]
    rows, vid = [], 0
    for grp in groups:
        for t in grp["tests"]:
            rows.append((vid, bool(t["valid"])))
            vid += 1
    return rows


def suite_oracle(family: str) -> str:
    vals = ", ".join(f"({vid}, {'true' if exp else 'false'})"
                     for vid, exp in _family_expectations(family))
    return (f"SELECT CAST(vid AS BIGINT) AS vid, valid "
            f"FROM (VALUES {vals}) AS t(vid, valid)")


def suite_queries() -> dict:
    return {f"suite_{name}": suite_query(name) for name in MERGED_FAMILIES}


def suite_oracles() -> dict:
    return {f"suite_{name}": suite_oracle(name) for name in MERGED_FAMILIES}
