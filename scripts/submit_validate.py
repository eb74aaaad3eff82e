"""spark-submit entrypoint: checkpointed validation of a partitioned
table against a JSON Schema file, resumable (north rule M5/M6).

    spark-submit --py-files dist/jsonschema_rs_spark.zip \
        scripts/submit_validate.py \
        --table /path/to/icetable --schema schema.json \
        --runs /path/to/_validation_runs --run-id nightly-2026-08-17 \
        [--violations /path/to/_violations] [--chunk-size 64]

On a cluster the session comes from spark-submit; the same code runs
unchanged on local[N]. Re-running with the same --run-id resumes: only
partitions without metrics rows are (re)validated.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# under spark-submit the --py-files zip provides the package; when run as
# a plain `python scripts/submit_validate.py` fall back to the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--schema", required=True)
    ap.add_argument("--runs", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--violations", default=None)
    ap.add_argument("--chunk-size", type=int, default=64)
    ap.add_argument("--snapshot-id", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from jsonschema_rs_spark import compile_schema
    from jsonschema_rs_spark.docspec import default_options
    from jsonschema_rs_spark.plans.runs import ValidationRunner
    from jsonschema_rs_spark.sources.icetable import IceTable

    spark = SparkSession.builder.appName("validate").getOrCreate()
    with open(args.schema) as f:
        schema = json.load(f)

    table = IceTable(spark, args.table)
    sample = table.read().drop("part_id")
    plan = compile_schema(schema, sample.schema, default_options())
    runner = ValidationRunner(table, plan, args.runs,
                              violations_path=args.violations,
                              chunk_size=args.chunk_size)
    out = runner.run(run_id=args.run_id, snapshot_id=args.snapshot_id)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
