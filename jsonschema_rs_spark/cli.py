"""Command-line interface — the Spark-first analog of the reference's
`jsonschema-cli` (crates/jsonschema-cli/src/main.rs:26-111 flag surface,
:407-500 instance validation, :365-405 schema meta-validation).

    python -m jsonschema_rs_spark.cli SCHEMA.json -i a.json -i b.json \
        [--draft {4,6,7,2019,2020}] [--assert-format|--no-assert-format] \
        [--output {text,flag,list,hierarchical}] [--errors-only]

Parity with the reference CLI:
  * schema positional + repeated `-i/--instance` files (main.rs:28-34)
  * `--draft` names 4/6/7/2019/2020 (main.rs:135-146)
  * `--assert-format` / `--no-assert-format` tri-state (main.rs:45-60;
    None = draft default, compiler.rs:271-276)
  * `--output text|flag|list|hierarchical`, NDJSON records shaped
    `{"output","schema","instance","payload"}` (main.rs:448-478)
  * `--errors-only` suppresses valid records (main.rs:76)
  * no instances -> meta-validate the schema itself (main.rs:365-405)
  * exit code 0 iff everything validated (main.rs:520+)

Spark-first difference: the reference validates one file at a time in a
loop; here ALL instance files become one single-job DataFrame (filename,
json) and the compiled plan validates them together — the same plan a
cluster run uses on a billion-row table. `--dataset` is the scale
entry-point the reference CLI lacks: validate a whole parquet/NDJSON
dataset and write NDJSON records or a parquet result.

Network retrievers (`--timeout`, `--cacert`, ...) are a documented
non-goal (offline `resources` registries only), so those flags are not
reproduced.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F


_DRAFTS = {"4": "4", "6": "6", "7": "7",
           "2019": "2019-09", "2020": "2020-12"}


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="jsonschema-rs-spark",
        description="Validate JSON instances (or a whole dataset) "
                    "against a JSON Schema, on Spark.")
    p.add_argument("schema", nargs="?",
                   help="the JSON Schema to validate with (JSON file)")
    p.add_argument("-i", "--instance", action="append", dest="instances",
                   metavar="FILE",
                   help="a JSON instance file (repeatable)")
    p.add_argument("-d", "--draft", choices=sorted(_DRAFTS),
                   help="enforce a specific JSON Schema draft")
    fmt = p.add_mutually_exclusive_group()
    fmt.add_argument("--assert-format", action="store_true", default=None,
                     help="turn ON format validation")
    fmt.add_argument("--no-assert-format", action="store_true",
                     default=None, help="turn OFF format validation")
    p.add_argument("--output", default="text",
                   choices=["text", "flag", "list", "hierarchical"],
                   help="output style (all structured modes emit NDJSON)")
    p.add_argument("--errors-only", action="store_true",
                   help="only show validation errors")
    p.add_argument("--mask", metavar="PLACEHOLDER",
                   help="mask instance values in error messages "
                        "(reference mask= kwarg)")
    p.add_argument("-v", "--version", action="store_true",
                   help="show version and exit")
    # ----- Spark-scale extensions (not in the reference CLI) -----
    p.add_argument("--dataset", metavar="PATH",
                   help="validate every row of a parquet/NDJSON dataset "
                        "instead of -i files")
    p.add_argument("--json-column", default=None, metavar="COL",
                   help="dataset column holding the JSON document "
                        "(default: whole row as a struct)")
    p.add_argument("--id-column", default=None, metavar="COL",
                   help="dataset column naming each record in output")
    p.add_argument("--out", metavar="PATH",
                   help="write dataset results as parquet instead of "
                        "printing NDJSON (prints a summary line)")
    p.add_argument("--limit", type=int, default=20,
                   help="max NDJSON records printed in --dataset mode "
                        "without --out (default 20)")
    p.add_argument("--cores", type=int, default=None,
                   help="local[N] parallelism (default: all cores)")
    return p


def _options(args):
    from jsonschema_rs_spark.errors import ValidationOptions

    assert_format = None
    if args.assert_format:
        assert_format = True
    elif args.no_assert_format:
        assert_format = False
    return ValidationOptions(
        dialect=_DRAFTS[args.draft] if args.draft else None,
        validate_formats=assert_format,
        mask=args.mask)


def _read_text(path: str) -> str:
    with open(path, "r", encoding="utf-8") as f:
        return f.read()


def _load_schema(path: str):
    text = _read_text(path)
    if path.endswith((".yaml", ".yml")):
        raise SystemExit(f"YAML schemas need PyYAML: {path}")
    return json.loads(text)


def _instance_json_text(path: str) -> str:
    """File -> JSON text. YAML instances are converted to JSON when
    PyYAML is importable (reference main.rs:222-250 read_json_or_yaml);
    the library is optional in this environment."""
    text = _read_text(path)
    if path.endswith((".yaml", ".yml")):
        try:
            import yaml  # type: ignore[import-not-found]
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise SystemExit(
                f"YAML instance {path} needs PyYAML (not installed)"
            ) from exc
        return json.dumps(yaml.safe_load(text))
    return text


def _static_schema_check(node, root, ctx, depth: int = 0) -> None:
    """Driver-side structural pass: every reachable $ref resolves
    (ref depth bounded so recursive schemas terminate). Pattern
    translation runs too, but Java-compilability itself is only
    checkable on the JVM — instance/dataset modes cover it."""
    if depth > 16 or not isinstance(node, (dict, list)):
        return
    if isinstance(node, list):
        for v in node:
            _static_schema_check(v, root, ctx, depth)
        return
    ref = node.get("$ref")
    if isinstance(ref, str):
        target = ctx.resolve_ref(ref, node)  # raises SchemaError
        _static_schema_check(target, root, ctx, depth + 1)
    if isinstance(node.get("pattern"), str):
        ctx.regex(node["pattern"])
    if isinstance(node.get("patternProperties"), dict):
        for pat in node["patternProperties"]:
            ctx.regex(pat)
    for k, v in node.items():
        if k not in ("$ref", "enum", "const"):
            _static_schema_check(v, root, ctx, depth)


def _validate_schema_only(schema_path: str, args, out) -> bool:
    """No -i files: meta-validate the schema itself AND check it
    compiles (ref main.rs:365-405 validate_schema_meta: meta::validate,
    then options().build())."""
    from jsonschema_rs_spark.compiler.variant import VariantCompileContext
    from jsonschema_rs_spark.errors import SchemaError
    from jsonschema_rs_spark.spec.model import meta_validate

    schema = _load_schema(schema_path)
    err = None
    try:
        meta_validate(schema)
        # also check every reachable $ref resolves (the reference
        # builds the full validator after meta-validation,
        # main.rs:330-340; a broken '#/nowhere' ref used to pass —
        # review find). The walk is driver-side and needs no Spark
        # session; PATTERN compilability is a JVM property and is
        # checked when instances/--dataset are provided.
        ctx = VariantCompileContext(schema, _options(args))
        _static_schema_check(schema, schema, ctx)
    except SchemaError as e:
        err = e

    if args.output == "text":
        if err is not None:
            print(f"Schema is invalid. Error: {err}", file=out)
        elif not args.errors_only:
            print("Schema is valid", file=out)
        return err is None

    valid = err is None
    if args.errors_only and valid:
        return True
    if args.output == "flag":
        payload = {"valid": valid}
    else:
        # engine-shaped meta-validation unit (the reference nests the
        # full meta-schema evaluation; our meta-validator reports the
        # first offending schema location)
        details = [] if valid else [{
            "valid": False,
            "evaluationPath": getattr(err, "path", "") or "",
            "instanceLocation": getattr(err, "path", "") or "",
            "errors": {"meta": str(err)},
        }]
        payload = {"valid": valid, "details": details}
    print(json.dumps({"output": args.output, "schema": schema_path,
                      "payload": payload}), file=out)
    return valid


def _get_session(args):
    from jsonschema_rs_spark.session import get_spark

    return get_spark(app_name="jsonschema-rs-spark-cli", cores=args.cores)


def _validate_files(schema_path: str, args, out) -> bool:
    """-i mode: ONE DataFrame of (instance, json) rows, one Spark job for
    all files (the reference loops files through the same validator,
    main.rs:432-478 — semantics identical, execution batched)."""
    from jsonschema_rs_spark.compiler.output import OutputPlan
    from jsonschema_rs_spark.compiler.variant import CompiledJsonSchema
    from jsonschema_rs_spark.errors import SchemaError

    schema = _load_schema(schema_path)
    opts = _options(args)
    try:
        compiled = CompiledJsonSchema(schema, opts)
    except SchemaError as e:
        # invalid schema: reference falls back to schema validation
        # output and fails (main.rs:481-496)
        if args.output == "text":
            print(f"Schema is invalid. Error: {e}", file=out)
        else:
            _validate_schema_only(schema_path, args, out)
        return False

    spark = _get_session(args)
    rows = [(p, _instance_json_text(p)) for p in args.instances]
    df = spark.createDataFrame(rows, "instance string, doc string")

    cols = [F.col("instance"),
            compiled.valid_column(F.col("doc")).alias("valid")]
    if args.output == "text":
        cols.append(compiled.errors_column(F.col("doc")).alias("errors"))
    elif args.output in ("list", "hierarchical"):
        plan = OutputPlan(schema, opts)
        col = (plan.list_column(F.col("doc")) if args.output == "list"
               else plan.hierarchical_column(F.col("doc")))
        cols.append(col.alias("payload"))

    by_file = {r["instance"]: r for r in df.select(*cols).collect()}
    success = True
    for path in args.instances:  # input order, like the reference loop
        r = by_file[path]
        if not r["valid"]:
            success = False
        if args.errors_only and r["valid"]:
            continue
        if args.output == "text":
            if r["valid"]:
                print(f"{path} - VALID", file=out)
            else:
                print(f"{path} - INVALID. Errors:", file=out)
                for i, e in enumerate(r["errors"], 1):
                    print(f"{i}. {e['message']} (at instance path "
                          f"'{e['instance_path']}', keyword "
                          f"{e['keyword']})", file=out)
        else:
            payload = ({"valid": bool(r["valid"])}
                       if args.output == "flag"
                       else json.loads(r["payload"]))
            print(json.dumps({"output": args.output,
                              "schema": schema_path,
                              "instance": path,
                              "payload": payload}), file=out)
    return success


def _validate_dataset(schema_path: str, args, out) -> bool:
    """--dataset mode (Spark-scale extension): validate every row of a
    parquet / NDJSON dataset with the same compiled plan. The whole
    computation is one distributed job; nothing funnels through the
    driver except the printed sample / summary."""
    from jsonschema_rs_spark.compiler.output import OutputPlan
    from jsonschema_rs_spark.compiler.variant import CompiledJsonSchema
    from jsonschema_rs_spark.errors import SchemaError

    schema = _load_schema(schema_path)
    opts = _options(args)
    try:
        compiled = CompiledJsonSchema(schema, opts)
    except SchemaError as e:
        # same formatted failure as the -i path (review find: this
        # mode leaked a raw traceback for an uncompilable schema)
        print(f"Schema is invalid. Error: {e}", file=out)
        return False
    spark = _get_session(args)

    path = args.dataset
    if path.endswith((".json", ".ndjson", ".jsonl")):
        # whole-line documents: keep each line as raw JSON text
        df = spark.read.text(path).withColumnRenamed("value", "__doc")
    else:
        df = spark.read.parquet(path)
        if args.json_column:
            df = df.withColumn("__doc", F.col(args.json_column))
        else:
            # whole row as a JSON object (struct -> json)
            df = df.withColumn(
                "__doc", F.to_json(F.struct(*[F.col(c)
                                              for c in df.columns])))

    id_col = (F.col(args.id_column) if args.id_column
              else F.monotonically_increasing_id().cast("string"))
    result = df.select(
        id_col.alias("instance"),
        compiled.valid_column(F.col("__doc")).alias("valid"),
        *([] if args.output in ("text", "flag") else [
            (OutputPlan(schema, opts).list_column(F.col("__doc"))
             if args.output == "list"
             else OutputPlan(schema, opts).hierarchical_column(
                 F.col("__doc"))).alias("payload")]))
    if args.errors_only:
        result = result.filter(~F.col("valid"))

    if args.out:
        result.write.mode("overwrite").parquet(args.out)
        agg = spark.read.parquet(args.out).agg(
            F.count("*").alias("n"),
            F.sum(F.col("valid").cast("long")).alias("n_valid")).first()
        n, n_valid = agg["n"], agg["n_valid"] or 0
        print(json.dumps({"dataset": path, "records": n,
                          "valid": n_valid, "invalid": n - n_valid,
                          "out": args.out}), file=out)
        return (n - n_valid) == 0 or args.errors_only

    result = result.persist()  # two actions (count + sample) — one
    # compute of the validation plan instead of two full scans
    n_invalid = result.filter(~F.col("valid")).count()
    for r in result.limit(args.limit).collect():
        rec = {"output": args.output, "schema": schema_path,
               "instance": r["instance"],
               "payload": ({"valid": bool(r["valid"])}
                           if args.output in ("text", "flag")
                           else json.loads(r["payload"]))}
        print(json.dumps(rec), file=out)
    print(json.dumps({"dataset": path, "invalid": n_invalid}), file=out)
    return n_invalid == 0


def main(argv: list[str] | None = None, out=None) -> int:
    args = _build_parser().parse_args(argv)
    out = out or sys.stdout
    if args.version:
        from jsonschema_rs_spark import __version__
        print(f"Version: {__version__}", file=out)
        return 0
    if not args.schema:
        print("error: schema path is required", file=sys.stderr)
        return 2
    if args.dataset:
        ok = _validate_dataset(args.schema, args, out)
    elif args.instances:
        ok = _validate_files(args.schema, args, out)
    else:
        ok = _validate_schema_only(args.schema, args, out)
    return 0 if ok else 1


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
