"""CLI parity tests — the Spark analog of the reference's
crates/jsonschema-cli (main.rs:26-111 flags, :407-500 instance loop,
:365-405 schema meta-validation). Each test drives
jsonschema_rs_spark.cli.main() in-process with an io.StringIO sink."""

import io
import json

import pytest

from jsonschema_rs_spark.cli import main

SCHEMA = {
    "$schema": "http://json-schema.org/draft-07/schema#",
    "type": "object",
    "required": ["name"],
    "properties": {
        "name": {"type": "string", "minLength": 2},
        "email": {"format": "email"},
        "age": {"type": "integer", "minimum": 0},
    },
}


@pytest.fixture(scope="module")
def paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    schema = d / "schema.json"
    schema.write_text(json.dumps(SCHEMA))
    good = d / "good.json"
    good.write_text('{"name": "Ada", "email": "a@example.com", "age": 3}')
    bad = d / "bad.json"
    bad.write_text('{"name": "X", "email": "nope", "age": -1}')
    return {"schema": str(schema), "good": str(good), "bad": str(bad),
            "dir": d}


def _run(argv):
    out = io.StringIO()
    code = main(argv, out=out)
    return code, out.getvalue().splitlines()


def test_text_mode_valid_and_invalid(spark, paths):
    code, lines = _run([paths["schema"], "-i", paths["good"],
                        "-i", paths["bad"], "--cores", "8"])
    assert code == 1  # any invalid instance -> exit 1 (main.rs:520+)
    assert lines[0] == f"{paths['good']} - VALID"
    assert lines[1] == f"{paths['bad']} - INVALID. Errors:"
    # draft-7 asserts format by default (compiler.rs:271-276): the bad
    # email must be among the numbered errors
    body = "\n".join(lines[2:])
    assert "minLength" in body and "format" in body and "minimum" in body
    assert lines[2].startswith("1. ")


def test_text_mode_errors_only(spark, paths):
    code, lines = _run([paths["schema"], "-i", paths["good"],
                        "--errors-only", "--cores", "8"])
    assert code == 0 and lines == []


def test_no_assert_format_flag(spark, paths):
    # --no-assert-format turns format assertion OFF even in draft-7
    code, lines = _run([paths["schema"], "-i", paths["bad"],
                        "--no-assert-format", "--cores", "8"])
    assert code == 1
    assert "format" not in "\n".join(lines)


def test_flag_output_records(spark, paths):
    code, lines = _run([paths["schema"], "-i", paths["good"],
                        "-i", paths["bad"], "--output", "flag",
                        "--cores", "8"])
    assert code == 1
    recs = [json.loads(ln) for ln in lines]
    # record shape mirrors main.rs:469-476
    assert recs[0] == {"output": "flag", "schema": paths["schema"],
                       "instance": paths["good"],
                       "payload": {"valid": True}}
    assert recs[1]["payload"] == {"valid": False}


def test_list_output_payload_units(spark, paths):
    code, lines = _run([paths["schema"], "-i", paths["bad"],
                        "--output", "list", "--cores", "8"])
    assert code == 1
    payload = json.loads(lines[0])["payload"]
    assert payload["valid"] is False
    eps = {u["evaluationPath"] for u in payload["details"]}
    assert "/properties/name/minLength" in eps


def test_hierarchical_output(spark, paths):
    code, lines = _run([paths["schema"], "-i", paths["good"],
                        "--output", "hierarchical", "--cores", "8"])
    assert code == 0
    payload = json.loads(lines[0])["payload"]
    assert payload["valid"] is True and "details" in payload


def test_schema_only_valid(paths):
    code, lines = _run([paths["schema"]])
    assert code == 0 and lines == ["Schema is valid"]


def test_schema_only_invalid(paths):
    p = paths["dir"] / "broken.json"
    p.write_text(json.dumps({"type": "nope"}))
    code, lines = _run([str(p)])
    assert code == 1 and lines[0].startswith("Schema is invalid. Error:")
    code, lines = _run([str(p), "--output", "flag"])
    rec = json.loads(lines[0])
    assert code == 1 and rec["payload"] == {"valid": False}


def test_draft_override_changes_semantics(spark, paths):
    # under 2020-12 the draft-7 schema's `format` is annotation-only
    code, _ = _run([paths["schema"], "-i", paths["good"],
                    "--draft", "2020", "--cores", "8"])
    assert code == 0
    p = paths["dir"] / "only_email_bad.json"
    p.write_text('{"name": "Ada", "email": "nope"}')
    code7, _ = _run([paths["schema"], "-i", str(p), "--cores", "8"])
    code20, _ = _run([paths["schema"], "-i", str(p),
                      "--draft", "2020", "--cores", "8"])
    assert code7 == 1 and code20 == 0


def test_dataset_mode(spark, paths):
    ds = str(paths["dir"] / "ds.parquet")
    rows = [("r%d" % i,
             json.dumps({"name": "ok" * max(1, i % 3), "age": i - 2}))
            for i in range(6)]
    spark.createDataFrame(rows, "id string, payload string") \
        .write.mode("overwrite").parquet(ds)
    code, lines = _run([paths["schema"], "--dataset", ds,
                        "--json-column", "payload", "--id-column", "id",
                        "--output", "flag", "--cores", "8"])
    assert code == 1
    summary = json.loads(lines[-1])
    assert summary == {"dataset": ds, "invalid": 2}
    flags = {json.loads(ln)["instance"]: json.loads(ln)["payload"]["valid"]
             for ln in lines[:-1]}
    assert flags["r0"] is False and flags["r2"] is True

    out_p = str(paths["dir"] / "out.parquet")
    code, lines = _run([paths["schema"], "--dataset", ds,
                        "--json-column", "payload", "--id-column", "id",
                        "--out", out_p, "--errors-only", "--cores", "8"])
    assert code == 0
    summary = json.loads(lines[-1])
    assert summary["records"] == 2 and summary["invalid"] == 2
    got = {r["instance"] for r in spark.read.parquet(out_p).collect()}
    assert got == {"r0", "r1"}


def test_version():
    code, lines = _run(["--version"])
    assert code == 0 and lines[0].startswith("Version: ")
