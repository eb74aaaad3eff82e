"""Round-4 regression tests: VERDICT r3 prescriptions and ADVICE r3
bug fixes stay fixed.

- near_duplicates_by_cosine defaults to threshold-adaptive banding
  (VERDICT r3 "What's wrong" #1) and keeps full recall on the testdata
- MinHash banding derivation (adaptive_minhash_banding) satisfies the
  1-(1-j^r)^b recall bound and is monotone in threshold
- duplicate-id rejection is uniform across BOTH verify transports
  (ADVICE r3: it used to raise only on the broadcast-gather path)
- the gather-broadcast registry holds weakrefs (ADVICE r3: strong refs
  leaked two broadcasts per call and blocked ContextCleaner)
- variant multipleOf decides u64/BigInt-class (integer-lexical) values
  exactly via the decimal view (ADVICE r3 medium), while float-lexical
  values keep the reference's binary-fmod semantics
- multipleOf divisors beyond LONG/double literals compile to correct
  plans instead of raising raw OverflowError (ADVICE r3)
- draft-4 lexical integer rule on the variant path (1.0 not an integer,
  exponent forms are doubles) — VERDICT r3 missing #2
"""

import math

import pytest
from pyspark.sql import functions as F

from jsonschema_rs_spark.operators import dedup as dd
from jsonschema_rs_spark.operators import similarity as sim


# -- adaptive banding is the default ----------------------------------------


def test_default_banding_is_adaptive(spark):
    """No bands/n_planes → adaptive_banding(threshold); recall on the
    sf0.001 embeddings must equal the exact O(N^2) result."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = {(r["id_a"], r["id_b"])
           for r in sim.near_duplicates_by_cosine(
               emb, threshold=0.5).collect()}
    want = {(r["id_a"], r["id_b"])
            for r in sim.near_duplicates_by_cosine(
                emb, threshold=0.5, exact=True).collect()}
    assert got == want


def test_default_banding_selectivity(spark):
    """The derived banding at threshold 0.5 must have a wider AND than
    the old fixed (16, 3) default — the selectivity fix itself."""
    b, r = sim.adaptive_banding(0.5)
    assert r > 3
    # boundary recall bound the derivation promises
    p = 1.0 - math.acos(0.5) / math.pi
    assert 1.0 - (1.0 - p ** r) ** b >= 0.995


# -- MinHash adaptive banding ------------------------------------------------


def test_adaptive_minhash_banding_bounds():
    for th in (0.3, 0.5, 0.6, 0.7, 0.8, 0.9):
        num_hashes, bands = dd.adaptive_minhash_banding(th)
        r = num_hashes // bands
        assert num_hashes == bands * r
        assert num_hashes <= 64
        # the recall bound the derivation promises, at the boundary
        assert 1.0 - (1.0 - th ** r) ** bands >= 0.95
    # higher threshold → wider AND (more selective)
    assert (dd.adaptive_minhash_banding(0.9)[0] //
            dd.adaptive_minhash_banding(0.9)[1]) > \
           (dd.adaptive_minhash_banding(0.5)[0] //
            dd.adaptive_minhash_banding(0.5)[1])
    with pytest.raises(ValueError, match="target_recall"):
        dd.adaptive_minhash_banding(0.5, target_recall=0)
    with pytest.raises(ValueError, match="threshold"):
        dd.adaptive_minhash_banding(0.0)


def test_minhash_auto_banding_finds_near_dups(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .limit(60)
    base = docs.limit(1).select(F.col("text")).first()["text"]
    near = base + " extra"
    extra = spark.createDataFrame(
        [(900000, base), (900001, near)], "doc_id long, text string")
    df = docs.select("doc_id", "text").union(extra)
    pairs = dd.minhash_near_duplicates(df, num_hashes="auto",
                                       threshold=0.5, log_metrics=True)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (900000, 900001) in got


# -- uniform duplicate-id rejection ------------------------------------------


def test_duplicate_ids_raise_on_both_paths(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .limit(20)
    dup = emb.union(emb.limit(1))  # one duplicated vec_id
    # auto decision (would pick broadcast at this size)
    with pytest.raises(ValueError, match="duplicate"):
        sim.near_duplicates_by_cosine(dup, threshold=0.9)
    # force the JOIN transport through the same auto decision job by
    # shrinking the byte cap to zero — same input, same error
    with pytest.raises(ValueError, match="duplicate"):
        sim.near_duplicates_by_cosine(dup, threshold=0.9,
                                      broadcast_verify_max_bytes=0)


# -- weakref broadcast registry ----------------------------------------------


def test_gather_broadcasts_weakref_release(spark):
    """The registry must NOT keep the Python Broadcast wrappers alive
    (ADVICE r3: strong refs leaked two per call and blocked
    ContextCleaner). Once the UDF is serialized into the plan, the JVM
    side holds its own broadcast refs — the Python wrappers are free to
    die immediately, execution still works, and release() is a no-op
    rather than a leak-recovery requirement."""
    import gc

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .limit(30)
    sim._GATHER_BROADCASTS.clear()
    out = sim.near_duplicates_by_cosine(emb, threshold=0.9,
                                        broadcast_verify=True)
    out.count()  # executes fine regardless of wrapper lifetime
    assert len(sim._GATHER_BROADCASTS) == 2
    refs = list(sim._GATHER_BROADCASTS)
    del out
    gc.collect()
    # weakrefs: every wrapper is reclaimable by GC → no leak
    assert all(ref() is None for ref in refs)
    assert sim.release_gather_broadcasts() == 0
    assert not sim._GATHER_BROADCASTS


# -- numeric exactness (variant path) ----------------------------------------


def _verdicts(spark, schema, docs, dialect=None):
    import json

    from jsonschema_rs_spark.compiler.variant import compile_json_schema
    from jsonschema_rs_spark.errors import ValidationOptions

    opts = ValidationOptions(dialect=dialect) if dialect \
        else ValidationOptions()
    plan = compile_json_schema(schema, opts)
    df = spark.createDataFrame(
        [(d if isinstance(d, str) else json.dumps(d),) for d in docs],
        "j string")
    return [r["valid"] for r in
            plan.with_validation(df, "j", mode="flag").collect()]


def test_variant_multiple_of_u64_exact(spark):
    """ADVICE r3 medium: INTEGER-LEXICAL values beyond int64 decide via
    the exact decimal view (the reference's u64/BigInt branches), while
    float-lexical values keep IEEE fmod on the binary double
    (is_multiple_of_integer: serde parses 1e30 to f64, fmod(1e30,5)=1)."""
    got = _verdicts(spark, {"multipleOf": 5},
                    ["18446744073709551615",      # ends in 5 → multiple
                     "18446744073709551616",      # 2^64 → mod 5 = 1
                     "18446744073709551620",
                     "1e30",                      # f64 binary: NOT a multiple
                     "2e19",                      # f64 binary: IS a multiple
                     "7", "0",
                     # BigInt class past the old (38,15) view's 23
                     # integer digits (random-schema fuzz find: 10^25
                     # fell to lossy double fmod); decimal(38,0) now
                     # decides the full 38-digit range exactly
                     str(10 ** 25), str(10 ** 25 + 1),
                     str(10 ** 37), str(10 ** 37 + 3)])
    assert got == [True, False, True, False, True, False, True,
                   True, False, True, False]


def test_variant_multiple_of_huge_divisors(spark):
    got = _verdicts(spark, {"multipleOf": 18446744073709551615},
                    ["18446744073709551615", "36893488147419103230",
                     "5", "0"])
    assert got == [True, True, False, True]
    got = _verdicts(spark, {"multipleOf": 10 ** 40},
                    [str(10 ** 40), str(3 * 10 ** 40), "7", "0"])
    assert got == [True, True, False, True]


def test_typed_multiple_of_huge_divisors(spark):
    """Typed-path compile must not surface OverflowError/lit failures
    for divisors beyond LONG/double (ADVICE r3); verdicts stay exact."""
    from jsonschema_rs_spark.compiler.compiler import compile_schema

    df = spark.createDataFrame(
        [(0, 0.0), (5, 5.0), (2 ** 62, float(2 ** 62))],
        "i long, d double")
    # int column, divisor beyond every int64: only 0 is a multiple
    plan = compile_schema({"properties": {"i": {"multipleOf": 2 ** 64}}},
                          df.schema)
    got = [r["valid"] for r in plan.with_validation(df).collect()]
    assert got == [True, False, False]
    # double column, divisor with a >2^63 odd part → Fraction fallback
    big_odd = 2 ** 64 + 1  # odd, exceeds LONG
    plan = compile_schema({"properties": {"d": {"multipleOf": big_odd}}},
                          df.schema)
    got = [r["valid"] for r in plan.with_validation(df).collect()]
    assert got == [True, False, False]
    # divisor far beyond double range still compiles (c == 0 branch on
    # INTEGRAL; kernel a/b powers on double)
    plan = compile_schema({"properties": {"i": {"multipleOf": 10 ** 400},
                                          "d": {"multipleOf": 10 ** 400}}},
                          df.schema)
    got = [r["valid"] for r in plan.with_validation(df).collect()]
    assert got == [True, False, False]


def test_invalid_divisor_raises_schema_error(spark):
    from jsonschema_rs_spark.compiler.compiler import compile_schema
    from jsonschema_rs_spark.errors import SchemaError

    df = spark.createDataFrame([(1.0,)], "d double")
    with pytest.raises(SchemaError):
        compile_schema({"properties": {"d": {"multipleOf": float("nan")}}},
                       df.schema)


# -- multi-probe LSH ANN -------------------------------------------------------


def test_probe_buckets_match_python_mirror(spark):
    """probe_buckets = own bucket + XOR-flips of the smallest-|margin|
    planes, verified against a pure-Python recomputation."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .limit(40)
    planes = sim.hyperplane_signs(6, 64)
    got = emb.select("vec_id",
                     sim.probe_buckets(F.col("embedding"), planes, 4)
                     .alias("pb"),
                     F.col("embedding")).collect()
    for r in got:
        v = r["embedding"]
        dots = [sum(float(x) * s for x, s in zip(v, plane))
                for plane in planes]
        base = sum(1 << i for i, d in enumerate(dots) if d > 0)
        order = sorted(range(len(planes)), key=lambda i: (abs(dots[i]), i))
        want = [base] + [base ^ (1 << i) for i in order[:3]]
        assert list(r["pb"]) == want, (r["vec_id"], list(r["pb"]), want)


def test_multi_probe_improves_recall(spark):
    """Recall vs brute force is monotone in n_probe, and n_probe=1
    reproduces the single-bucket plan's results exactly."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding")
    truth = {(r["query_id"], r["neighbor_id"])
             for r in sim.brute_force_topk(emb, q, k=5).collect()}

    def recall(n_probe):
        got = {(r["query_id"], r["neighbor_id"])
               for r in sim.ann_topk_lsh(emb, q, k=5, n_planes=8,
                                         n_probe=n_probe).collect()}
        return len(got & truth) / len(truth)

    r1, r4, r8 = recall(1), recall(4), recall(8)
    assert r1 <= r4 <= r8
    assert r8 > r1  # probing must actually add candidates on this data
    # deterministic data + md5 planes → stable values (0.22/0.26/0.32
    # measured); the floor guards against a silently broken probe walk
    assert r8 >= 0.3


def test_multibit_probe_buckets_match_python_mirror(spark):
    """max_flip_bits>1 = the Lv et al. perturbation-set walk: subsets
    of up to max_flip_bits of the smallest-|margin| rank positions,
    probed in ascending sum-of-margins order (ties broken by XOR
    mask). Verified bucket-for-bucket against a pure-Python
    recomputation including the ordering."""
    import itertools
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .limit(40)
    planes = sim.hyperplane_signs(6, 64)
    n_probe, bits, ranks = 8, 2, min(len(planes), sim._PROBE_RANKS)
    got = emb.select("vec_id",
                     sim.probe_buckets(F.col("embedding"), planes,
                                       n_probe, max_flip_bits=bits)
                     .alias("pb"),
                     F.col("embedding")).collect()
    for r in got:
        v = r["embedding"]
        dots = [sum(float(x) * s for x, s in zip(v, plane))
                for plane in planes]
        base = sum(1 << i for i, d in enumerate(dots) if d > 0)
        order = sorted(range(len(planes)), key=lambda i: (abs(dots[i]), i))
        cands = []
        for nb in range(1, bits + 1):
            pool = range(len(planes)) if nb == 1 else range(ranks)
            for subset in itertools.combinations(pool, nb):
                score = sum(abs(dots[order[p]]) for p in subset)
                mask = 0
                for p in subset:
                    mask ^= 1 << order[p]
                cands.append((score, mask))
        cands.sort()
        want = [base] + [base ^ m for _, m in cands[:n_probe - 1]]
        assert list(r["pb"]) == want, (r["vec_id"], list(r["pb"]), want)


def test_multibit_probe_extends_recall_past_hamming1(spark):
    """At a probe budget that exhausts every candidate pool
    (n_probe=64 > 1 + 8 singletons + 15 pairs + 20 triples), the
    probed bucket SETS nest across max_flip_bits by construction
    (singletons always draw from all ranks), so recall is structurally
    monotone — and must be strictly better than the saturated
    single-bit walk (which caps at the hamming-1 neighborhood's
    n_planes+1 = 9 buckets)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding")
    truth = {(r["query_id"], r["neighbor_id"])
             for r in sim.brute_force_topk(emb, q, k=5).collect()}

    def recall(n_probe, bits):
        got = {(r["query_id"], r["neighbor_id"])
               for r in sim.ann_topk_lsh(emb, q, k=5, n_planes=8,
                                         n_probe=n_probe,
                                         max_flip_bits=bits).collect()}
        return len(got & truth) / len(truth)

    deep = 64  # full enumeration at every bits level
    r1, r2, r3 = recall(deep, 1), recall(deep, 2), recall(deep, 3)
    assert r1 <= r2 <= r3
    assert r2 > r1  # the walk past hamming-1 must add real neighbors


def test_ann_lsh_mp_matches_duckdb_oracle(spark):
    """The new multi-probe driver query vs its DuckDB oracle, value
    for value at sf0.001 (the driver gate re-runs this at sf0.01):
    the oracle re-derives the whole perturbation walk in SQL, so this
    pins Spark/DuckDB agreement on margins, ranking, subset scores,
    XOR masks, probe slicing, AND the re-rank."""
    import duckdb

    from jsonschema_rs_spark.oracles import ORACLES
    from jsonschema_rs_spark.queries import ann_lsh_mp

    sdf = ann_lsh_mp(spark, "/root/testdata/sf0.001")
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.sql("CREATE VIEW embeddings AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/embeddings.parquet')")
    orows = sorted(tuple(r) for r in con.sql(ORACLES["ann_lsh_mp"])
                   .fetchall())
    assert srows == orows and srows


# -- curate stage materialization ---------------------------------------------


def test_curate_stage_dir_same_results(spark, tmp_path):
    """stage_dir materializes the exact-dedup boundary (parquet write +
    re-read) without changing the surviving set; without it the
    near-dedup stages recompute the gate lineage from the source scan."""
    from jsonschema_rs_spark.operators.curate import curate

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    lazy = {r["doc_id"] for r in
            curate(docs, num_hashes="auto").select("doc_id").collect()}
    staged = {r["doc_id"] for r in
              curate(docs, num_hashes="auto",
                     stage_dir=str(tmp_path / "stages"))
              .select("doc_id").collect()}
    assert lazy == staged and lazy
    import os
    assert os.path.exists(str(tmp_path / "stages" / "exact"))


# -- greedy (no-spanning) sequence packing ------------------------------------


def test_pack_sequences_greedy_boundaries(spark):
    """First-fit-in-order with NO document spanning: a doc that doesn't
    fit the remaining budget opens the next pack; oversized docs get a
    pack of their own; per-shard scans are independent."""
    from jsonschema_rs_spark.operators.packing import (
        pack_sequences, pack_sequences_greedy)

    lens = [3, 4, 2, 10, 1, 6, 5, 9]
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de", ("w " * n).strip())
         for i, n in enumerate(lens)],
        "doc_id long, lang string, text string")
    got = {r["doc_id"]: r["pack_id"]
           for r in pack_sequences_greedy(df, budget=8).collect()}
    # [3,4]=7 | [2] + oversize-10 own pack | [1,6]=7 | [5] | [9]
    assert got == {0: 0, 1: 0, 2: 1, 3: 2, 4: 3, 5: 3, 6: 4, 7: 5}
    # no pack exceeds the budget except single-oversized-doc packs
    from collections import defaultdict
    per_pack = defaultdict(list)
    for i, n in enumerate(lens):
        per_pack[got[i]].append(n)
    for docs in per_pack.values():
        assert sum(docs) <= 8 or len(docs) == 1
    # sharded: independent scans per shard, same contract
    sharded = pack_sequences_greedy(df, budget=8, shard_col="lang")
    rows = {(r["lang"], r["doc_id"]): r["pack_id"]
            for r in sharded.collect()}
    assert rows[("en", 0)] == rows[("en", 2)] == rows[("en", 4)] == 0
    assert rows[("de", 3)] == 1 and rows[("de", 7)] == 3
    # contrast with the chunk path: spanning allowed, same shuffle shape
    chunk = {r["doc_id"]: r["pack_id"]
             for r in pack_sequences(df, budget=8).collect()}
    assert chunk[3] == 1  # doc 3 STARTS inside pack 1 (offset 9 div 8)


# -- reference-parity messages (VERDICT r3 next-round #6) ---------------------


def _var_messages(spark, schema, doc):
    import json

    from jsonschema_rs_spark.compiler.variant import compile_json_schema
    from jsonschema_rs_spark.errors import ValidationOptions

    plan = compile_json_schema(schema, ValidationOptions(message_values=True))
    df = spark.createDataFrame([(json.dumps(doc),)], "j string")
    rows = df.select(F.explode(plan.errors_column(F.col("j")))
                     .alias("e")).select("e.keyword", "e.message").collect()
    return {r["keyword"]: r["message"] for r in rows}


def test_reference_message_catalog_variant(spark):
    """Messages under message_values render the reference's exact
    templates (error.rs:1330-1560 Display impl), golden-pinned."""
    got = _var_messages(
        spark,
        {"properties": {
            "t": {"type": "integer"},
            "ts": {"type": ["integer", "string"]},
            "e": {"enum": [1, 2, 3]},
            "big_e": {"enum": [1, 2, 3, 4, 5]},
            "mn": {"minimum": 5},
            "mx": {"maximum": 3},
            "xn": {"exclusiveMinimum": 5},
            "xx": {"exclusiveMaximum": 3},
            "ml": {"minLength": 8},
            "xl": {"maxLength": 1},
            "mi": {"minItems": 2},
            "xi": {"maxItems": 1},
            "mo": {"multipleOf": 2},
            "pt": {"pattern": "^a+$"},
            "uq": {"uniqueItems": True},
            "ct": {"const": "fixed"}},
         "required": ["gone"]},
        {"t": "oops", "ts": 1.5, "e": 9, "big_e": 9, "mn": 1, "mx": 7,
         "xn": 5, "xx": 3, "ml": "abc", "xl": "abc", "mi": [1],
         "xi": [1, 2], "mo": 7, "pt": "bbb", "uq": [1, 1], "ct": "other"})
    # one golden string per keyword, straight from error.rs
    assert got["type"] in ('"oops" is not of type "integer"',
                           'is not of types "integer", "string"',
                           '1.5 is not of types "integer", "string"')
    assert got["enum"] in ("9 is not one of 1, 2 or 3",
                           "9 is not one of 1, 2, 3 or 2 other candidates")
    assert got["minimum"] == "1 is less than the minimum of 5"
    assert got["maximum"] == "7 is greater than the maximum of 3"
    assert got["exclusiveMinimum"] == \
        "5 is less than or equal to the minimum of 5"
    assert got["exclusiveMaximum"] == \
        "3 is greater than or equal to the maximum of 3"
    assert got["minLength"] == '"abc" is shorter than 8 characters'
    assert got["maxLength"] == '"abc" is longer than 1 character'
    assert got["minItems"] == "[1] has less than 2 items"
    assert got["maxItems"] == "[1,2] has more than 1 item"
    assert got["multipleOf"] == "7 is not a multiple of 2"
    assert got["pattern"] == '"bbb" does not match "^a+$"'
    assert got["uniqueItems"] == "[1,1] has non-unique elements"
    assert got["const"] == '"fixed" was expected'


def test_reference_message_catalog_typed(spark):
    from jsonschema_rs_spark.compiler.compiler import compile_schema
    from jsonschema_rs_spark.errors import ValidationOptions

    df = spark.createDataFrame([(1, "long-string", 2, None)],
                               "id long, s string, n long, miss string")
    schema = {"properties": {"s": {"maxLength": 3},
                             "n": {"minimum": 5}},
              "required": ["miss"]}
    plan = compile_schema(schema, df.schema,
                          ValidationOptions(message_values=True))
    rows = plan.violations(df, ["id"]).collect()
    msgs = {r["keyword"]: r["message"] for r in rows}
    assert msgs["maxLength"] == '"long-string" is longer than 3 characters'
    assert msgs["minimum"] == "2 is less than the minimum of 5"
    assert msgs["required"] == '"miss" is a required property'


def test_output_units_documented_example_messages(spark):
    """The documented evaluation.rs example tree (evaluation.rs:270-310)
    diffs cleanly including messages: the /items/type unit for instance
    [1, "oops"] carries errors {"type": "\"oops\" is not of type
    \"integer\""} under message_values."""
    import json

    from jsonschema_rs_spark.compiler.variant import compile_json_schema
    from jsonschema_rs_spark.errors import ValidationOptions

    schema = {"type": "array",
              "prefixItems": [{"type": "number"}],
              "items": {"type": "integer"}}
    plan = compile_json_schema(schema,
                               ValidationOptions(message_values=True))
    df = spark.createDataFrame([(json.dumps([1, "oops"]),)], "j string")
    out = plan.with_output(df, "j", format="list").collect()[0]["output"]
    tree = json.loads(out)
    assert tree["valid"] is False
    units = {(u["evaluationPath"], u["instanceLocation"]): u
             for u in tree["details"]}
    u = units[("/items/type", "/1")]
    assert u["valid"] is False
    assert u["errors"] == {"type": '"oops" is not of type "integer"'}


# -- draft-4 lexical integer --------------------------------------------------


def test_draft4_integer_excludes_fraction_forms(spark):
    docs = ["1", "1.0", "-3", "-3.0", "1.5", "100",
            "18446744073709551615", "1e2", "1.0e0", "true", "\"1\""]
    got4 = _verdicts(spark, {"type": "integer"}, docs, dialect="4")
    assert got4 == [True, False, True, False, False, True,
                    True, False, False, False, False]
    # drafts >= 6 keep the zero-fraction rule on the SAME docs
    got2020 = _verdicts(spark, {"type": "integer"}, docs)
    assert got2020 == [True, True, True, True, False, True,
                       True, True, True, False, False]


def test_candidate_accumulator_counts_verified_pairs(spark):
    """Both verify transports count candidate rows into the attached
    accumulator as a byproduct — observability without an extra job."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for bc in (True, False):
        out = sim.near_duplicates_by_cosine(emb, threshold=0.5,
                                            broadcast_verify=bc)
        out.count()
        # every deduped candidate pair crossed the verify UDF exactly
        # once (no retries on local runs)
        n = out.candidate_accumulator.value
        assert n > 0
        # candidates >= surviving pairs
        assert n >= out.count()


# -- sub-1e-15 doubles must not collapse through the decimal view --------------
# (random-schema fuzz finds: decimal(38,15) rounds 5e-324 to 0, which
# leaked through three consumers — uniqueItems canonicalization, the
# multipleOf integral gate, and integer const/enum equality)


def test_subnormal_not_equal_zero_in_unique_const_multiple(spark):
    import json

    import jsonschema

    from jsonschema_rs_spark.compiler.variant import compile_json_schema

    cases = [
        ({"uniqueItems": True}, [[0, 5e-324], [0, 0.0], [5e-324, 1e-323]]),
        ({"multipleOf": 3}, [5e-324, 0, 3, 1e-323]),
        ({"multipleOf": 2}, [5e-324, 1e-323, 4]),
        ({"const": 0}, [5e-324, 0, 0.0, -0.0]),
        ({"enum": [0, 1]}, [5e-324, 0.0, 1.0, 1e-20]),
        # the exact >2^53 compare the decimal view exists for must survive
        ({"const": 2 ** 53 + 1}, [2 ** 53, 2 ** 53 + 1]),
    ]
    for schema, vals in cases:
        oracle = jsonschema.Draft202012Validator(schema)
        want = [oracle.is_valid(v) for v in vals]
        df = spark.createDataFrame(
            [(json.dumps(v),) for v in vals], "j string")
        plan = compile_json_schema(schema)
        got = [r["valid"] for r in
               plan.with_validation(df, "j", mode="flag").collect()]
        assert got == want, (schema, list(zip(vals, got, want)))


def test_negative_subnormal_pmod_semantics(spark):
    """pmod's ((a%b)+b)%b addition step rounds tiny negatives away:
    pmod(-5e-324, 1.0) = 0 classified a negative subnormal as an
    integer, and pmod(-5e-324, 2.0) = 0 called it a multiple of 2
    (random-schema fuzz find). The engine now uses the plain remainder
    (dividend-sign fmod), matching the reference's f64 arithmetic."""
    import json

    from test_fuzz_differential import oracle_validator

    from jsonschema_rs_spark.compiler.variant import compile_json_schema

    for schema in ({"type": "integer"}, {"multipleOf": 2},
                   {"multipleOf": 3}, {"multipleOf": 2.5}):
        vals = [-5e-324, 5e-324, -6, -6.0, -7.5, 0, -0.0, 6]
        # the EXACTNESS-PATCHED oracle: the plain library's
        # division-based multipleOf underflows on subnormals
        # (5e-324 / 2.5 rounds to 0.0 → "a multiple"), while the
        # reference's fraction kernel and this engine decide exactly
        oracle = oracle_validator(schema)
        want = [oracle.is_valid(v) for v in vals]
        df = spark.createDataFrame(
            [(json.dumps(v),) for v in vals], "j string")
        plan = compile_json_schema(schema)
        got = [r["valid"] for r in
               plan.with_validation(df, "j", mode="flag").collect()]
        assert got == want, (schema, list(zip(vals, got, want)))


def test_negative_subnormal_typed_path(spark):
    """Same pmod hazard on the TYPED compiler's integer/multipleOf
    predicates over a double column."""
    from jsonschema_rs_spark.compiler.compiler import compile_schema

    df = spark.createDataFrame(
        [(-5e-324,), (5e-324,), (-6.0,), (6.0,), (0.0,)], "x double")
    spec = {"type": "object",
            "properties": {"x": {"type": "integer", "multipleOf": 2}}}
    plan = compile_schema(spec, df.schema)
    got = [r["valid"] for r in plan.with_validation(df).collect()]
    assert got == [False, False, True, True, True]


def test_probe_pudf_matches_column_and_mirror(spark):
    """The Arrow pUDF probe walk (the ann_topk_lsh default — the
    equivalent Column expression costs seconds of Janino codegen) is
    value-identical to BOTH the pure-Column probe_buckets and the
    shared Python reference, including multi-bit perturbation sets."""
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").limit(40)
    planes = sim.hyperplane_signs(8, 64)
    for n_probe, bits in [(4, 1), (8, 2), (16, 3)]:
        rows = emb.select(
            "vec_id", "embedding",
            sim.probe_buckets(F.col("embedding"), planes, n_probe,
                              max_flip_bits=bits).alias("col_pb"),
            sim.probe_buckets_udf(planes, n_probe, bits)(
                F.col("embedding")).alias("udf_pb")).collect()
        for r in rows:
            want = sim._probe_walk_py(r["embedding"], planes,
                                      n_probe, bits)
            assert list(r["col_pb"]) == want, (n_probe, bits, r["vec_id"])
            assert list(r["udf_pb"]) == want, (n_probe, bits, r["vec_id"])


def test_ann_lsh_mp_pudf_equals_column_plan(spark):
    """Full ann_topk_lsh results agree between probe_impl variants."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding")
    kw = dict(k=5, n_planes=8, dim=64, n_probe=8, max_flip_bits=2)
    a = sorted(map(tuple, sim.ann_topk_lsh(
        emb, q, probe_impl="pudf", **kw).collect()))
    b = sorted(map(tuple, sim.ann_topk_lsh(
        emb, q, probe_impl="column", **kw).collect()))
    assert a == b
