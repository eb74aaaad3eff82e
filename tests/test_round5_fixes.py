"""Round-5 regression tests: ADVICE r4 items stay fixed.

- EmailOptions.with_no_minimum_sub_domains() undoes a constructor-set
  require_tld=True (last-call-wins, like the reference's consuming
  builders — options.rs EmailOptionsBuilder)
- FancyRegexOptions / RegexOptions are importable from the package
  top level (jsonschema-py exposes them top-level)
- Required-kind property extraction survives apostrophes in the
  property name and unknown templates (no silent truncation)
- the variant unroll-depth memo key includes email_options and
  pattern_options (different options must not share a cached depth)
"""

import json

import pytest

import jsonschema_rs_spark as jrs
from jsonschema_rs_spark import EmailOptions
from jsonschema_rs_spark.errors import ValidationOptions
from jsonschema_rs_spark.compiler.variant import _depth_memo_key


def test_email_options_no_minimum_undoes_require_tld():
    opts = EmailOptions(require_tld=True).with_no_minimum_sub_domains()
    assert opts.effective_minimum_sub_domains == 0
    # and the other direction still holds
    assert EmailOptions().with_required_tld() \
        .effective_minimum_sub_domains == 2
    # chaining order is last-call-wins both ways
    assert EmailOptions().with_no_minimum_sub_domains() \
        .with_required_tld().effective_minimum_sub_domains == 2
    # an explicit minimum replaces require_tld too (the crate has ONE
    # underlying field; with_required_tld IS with_minimum_sub_domains(2))
    assert EmailOptions(require_tld=True) \
        .with_minimum_sub_domains(1).effective_minimum_sub_domains == 1
    # jsonschema-py binding parity: minimum_sub_domains is applied AFTER
    # require_tld (lib.rs:974-982), so the kwarg combination resolves to
    # the explicit minimum
    assert EmailOptions(require_tld=True, minimum_sub_domains=1) \
        .effective_minimum_sub_domains == 1
    assert EmailOptions(require_tld=True) \
        .effective_minimum_sub_domains == 2


def test_regex_options_top_level_reexports():
    assert "FancyRegexOptions" in jrs.__all__
    assert "RegexOptions" in jrs.__all__
    po = jrs.FancyRegexOptions(backtrack_limit=10_000)
    assert po.engine == "backtracking"
    po2 = jrs.RegexOptions()
    assert po2.engine == "linear"


@pytest.mark.parametrize("message,want", [
    ("missing required property 'z'", "z"),
    ("missing required property \"it's\"", "it's"),
    ('"z" is a required property', "z"),
    ("\"it's\" is a required property", "it's"),
    # astral-plane name: json.dumps escapes it as a surrogate PAIR;
    # literal_eval alone yields two lone surrogates, which must be
    # recombined to match the schema's actual property name
    (__import__("json").dumps("\U0001D11E") + " is a required property",
     "\U0001D11E"),
    ("something unrelated", None),
])
def test_required_kind_property_extraction(message, want):
    from jsonschema_rs_spark.api import _kind_for
    kind = _kind_for({"required": ["z"]}, "required",
                     "/required", "", message)
    assert kind.property == want


# -- recursive-$ref depth exhaustion is observable (VERDICT r4 #1) ----------


# NOTE: scripts/build_vectors.py carries its own copy of this chain
# fixture (_CHAIN_SCHEMA/_chain, dict-valued) for the vendored corpus —
# deliberate independence, but keep the node shape in sync when editing
CHAIN_SCHEMA = {"$ref": "#/$defs/node",
                "$defs": {"node": {
                    "type": "object", "required": ["v"],
                    "properties": {"v": {"type": "integer"},
                                   "next": {"$ref": "#/$defs/node"}}}}}


def _chain(depth, bad_at=None):
    import json
    doc = None
    for i in reversed(range(depth)):
        v = "oops" if bad_at == i else i
        doc = {"v": v, **({"next": doc} if doc is not None else {})}
    return json.dumps(doc)


def _depth_plan(mode, depth=3):
    from jsonschema_rs_spark import compile_json_schema
    return compile_json_schema(CHAIN_SCHEMA, ValidationOptions(
        max_ref_depth=depth, on_depth_exhausted=mode))


def test_depth_annotate_flags_unchecked_content(spark):
    """Default mode: validity keeps the spec's vacuous-true, but every
    row whose content goes beyond the unroll carries
    depth_exhausted=true — checked-true and vacuous-true are now
    distinguishable per row."""
    plan = _depth_plan("annotate")
    df = spark.createDataFrame(
        [("within", _chain(3)), ("beyond_ok", _chain(8)),
         ("beyond_bad", _chain(8, bad_at=7)),
         ("checked_bad", _chain(2, bad_at=1))],
        "name string, doc string")
    got = {r["name"]: (r["valid"], r["depth_exhausted"])
           for r in plan.with_validation(df, "doc").collect()}
    assert got == {"within": (True, False),
                   "beyond_ok": (True, True),
                   "beyond_bad": (True, True),
                   "checked_bad": (False, False)}


def test_depth_fail_rejects_beyond_unroll(spark):
    plan = _depth_plan("fail")
    df = spark.createDataFrame(
        [("within", _chain(3)), ("beyond_ok", _chain(8))],
        "name string, doc string")
    out = plan.with_validation(df, "doc", mode="verbose")
    assert "depth_exhausted" not in out.columns  # fail mode: one tree
    got = {r["name"]: r for r in out.collect()}
    assert got["within"]["valid"] is True
    assert got["beyond_ok"]["valid"] is False
    errs = got["beyond_ok"]["errors"]
    assert any(e["keyword"] == "$ref"
               and e["message"] == "maximum evaluation depth exceeded"
               for e in errs)


def test_depth_ignore_keeps_r4_behavior(spark):
    plan = _depth_plan("ignore")
    assert plan._node_strict is None
    df = spark.createDataFrame([("x", _chain(8, bad_at=7))],
                               "name string, doc string")
    out = plan.with_validation(df, "doc")
    assert "depth_exhausted" not in out.columns
    assert out.collect()[0]["valid"] is True


def test_depth_probe_safe_fragment_classifier():
    from jsonschema_rs_spark.compiler.variant import _probe_safe_fragment
    # path-preserved: maps + names, propertyNames, anchors, root
    for frag in ("", "/$defs/node", "/properties/a/properties/b",
                 "/definitions/x", "/patternProperties/^a/$defs/y",
                 "/propertyNames/$defs/z", "anchor-name"):
        assert _probe_safe_fragment(frag), frag
    # reindexed/folded by the probe transform: positional applicators
    for frag in ("/allOf/0", "/items", "/prefixItems/1", "/then",
                 "/not", "/properties/a/anyOf/1", "/additionalProperties",
                 "/dependentSchemas/k", "/$defs"):
        assert not _probe_safe_fragment(frag), frag


def test_depth_positional_ref_forces_faithful_twin(spark):
    """A $ref through a positionally-reindexed keyword (#/allOf/0) must
    not use the navigation probe: the probe transform folds applicators
    into a synthesized allOf, so such a pointer can resolve CLEANLY to
    the wrong subtree (here #/allOf/0 would hit the folded items
    wrapper). The compiler detects the pointer up front and takes the
    always-faithful strict twin; exhaustion semantics stay exact."""
    import json

    from jsonschema_rs_spark import compile_json_schema
    schema = {
        "$defs": {"node": {
            "type": "object", "required": ["v"],
            "properties": {"v": {"type": "integer"},
                           "next": {"$ref": "#/$defs/node"}}}},
        "items": {"$ref": "#/$defs/node"},
        "allOf": [{"properties": {"tag": {"$ref": "#/$defs/node"}}}],
        "properties": {"alt": {"$ref": "#/allOf/0"}},
    }
    plan = compile_json_schema(schema, ValidationOptions(
        max_ref_depth=3, on_depth_exhausted="annotate"))
    assert plan._node_strict is not None
    assert plan._probe_is_reach is False  # twin, not the probe

    def nest(d, bad=False):
        doc = {"v": "x" if bad else 0}
        for i in range(d):
            doc = {"v": i, "next": doc}
        return doc

    df = spark.createDataFrame(
        [("within", json.dumps({"alt": {"tag": nest(1)}})),
         ("beyond", json.dumps({"alt": {"tag": nest(10)}})),
         ("checked_bad", json.dumps({"alt": {"tag": {"v": "x"}}}))],
        "name string, doc string")
    got = {r["name"]: (r["valid"], r["depth_exhausted"])
           for r in plan.with_validation(df, "doc").collect()}
    assert got["within"] == (True, False)
    assert got["beyond"][0] is True and got["beyond"][1] is True
    assert got["checked_bad"][0] is False


def test_depth_nonrecursive_schema_is_unchanged(spark):
    """No exhausted sites → no probe tree, no extra column: identical
    plan and output schema as before round 5 (zero cost on the hot
    path)."""
    from jsonschema_rs_spark import compile_json_schema
    plan = compile_json_schema({"properties": {"n": {"type": "integer"}}})
    assert plan._node_strict is None
    df = spark.createDataFrame([('{"n": 1}',)], "doc string")
    assert "depth_exhausted" not in plan.with_validation(df, "doc").columns


def test_depth_probe_is_small_and_reachability(spark):
    """The navigation-only probe must stay a fraction of the real tree
    so it never drags the auto-tuned unroll down. (The spark fixture is
    required even though no DataFrame is built: ._jc Column
    construction needs a live JVM/SparkContext.)"""
    from pyspark.sql import functions as F
    plan = _depth_plan("annotate")
    assert plan._probe_is_reach
    pr = F.try_parse_json(F.lit("{}"))
    lenient = len(plan.node.valid(pr)._jc.toString())
    probe = len(plan._node_strict.valid(pr)._jc.toString())
    assert probe < lenient / 2


def test_depth_annotate_auto_depth_not_reduced(spark):
    """The probe must not shrink the auto-tuned unroll vs ignore mode."""
    from jsonschema_rs_spark import compile_json_schema
    d_ign = compile_json_schema(
        CHAIN_SCHEMA, ValidationOptions(on_depth_exhausted="ignore"))
    d_ann = compile_json_schema(
        CHAIN_SCHEMA, ValidationOptions(on_depth_exhausted="annotate"))
    assert d_ann.ref_depth == d_ign.ref_depth


def test_probe_schema_transform_prunes_and_keeps():
    from jsonschema_rs_spark.compiler.variant import _probe_schema
    # ref-free subtrees prune away entirely
    assert _probe_schema({"type": "object",
                          "properties": {"a": {"type": "string"}}}) is None
    # navigation to refs survives; assertions are dropped; anchors kept
    p = _probe_schema({
        "type": "object", "required": ["a"],
        "properties": {"a": {"$ref": "#/$defs/t"}, "b": {"minimum": 3}},
        "$defs": {"t": {"$anchor": "t", "type": "integer"}}})
    assert p == {"$defs": {"t": {"$anchor": "t"}},
                 "properties": {"a": {"$ref": "#/$defs/t"}}}
    # branch applicators fold into allOf; contains widens to items
    p2 = _probe_schema({"anyOf": [{"contains": {"$ref": "#/x"}},
                                  {"const": 3}]})
    assert p2 == {"items": {"$ref": "#/x"}}


def test_depth_invalid_mode_rejected():
    from jsonschema_rs_spark import SchemaError, compile_json_schema
    with pytest.raises(SchemaError):
        compile_json_schema({"type": "object"},
                            ValidationOptions(on_depth_exhausted="bogus"))


# -- on_depth_exhausted="exact": runtime-recursive kernel verdicts ----------


def test_depth_exact_recovers_true_verdicts(spark):
    """'exact' mode closes the depth gap entirely: a violation BEYOND
    the compiled unroll is caught (annotate only flags it; ignore
    accepts it silently), while deep-valid rows stay valid (fail mode
    would reject them). In-unroll rows keep plan verdicts."""
    plan = _depth_plan("exact")
    df = spark.createDataFrame(
        [("within", _chain(3)), ("beyond_ok", _chain(8)),
         ("beyond_bad", _chain(8, bad_at=7)),
         ("checked_bad", _chain(2, bad_at=1))],
        "name string, doc string")
    out = plan.with_validation(df, "doc")
    got = {r["name"]: (r["valid"], r["depth_exhausted"])
           for r in out.collect()}
    assert got == {"within": (True, False),
                   "beyond_ok": (True, True),
                   "beyond_bad": (False, True),
                   "checked_bad": (False, False)}


def test_depth_exact_verbose_distinguished_error(spark):
    plan = _depth_plan("exact")
    df = spark.createDataFrame(
        [("beyond_ok", _chain(8)), ("beyond_bad", _chain(8, bad_at=7))],
        "name string, doc string")
    got = {r["name"]: r
           for r in plan.with_validation(df, "doc",
                                         mode="verbose").collect()}
    assert got["beyond_ok"]["valid"] is True
    assert list(got["beyond_ok"]["errors"]) == []
    assert got["beyond_bad"]["valid"] is False
    assert any(e["keyword"] == "$ref"
               and "runtime-recursive" in e["message"]
               for e in got["beyond_bad"]["errors"])


def test_depth_exact_errors_column_single_instance(spark):
    """valid_column/errors_column (the single-instance API path) honor
    the kernel verdict too."""
    import jsonschema_rs_spark as jrs
    opts = ValidationOptions(max_ref_depth=3, on_depth_exhausted="exact")
    deep_bad = json.loads(_chain(8, bad_at=7))
    deep_ok = json.loads(_chain(8))
    assert jrs.is_valid(CHAIN_SCHEMA, deep_ok, base=opts) is True
    assert jrs.is_valid(CHAIN_SCHEMA, deep_bad, base=opts) is False
    errs = jrs.iter_errors(CHAIN_SCHEMA, deep_bad, base=opts)
    assert any(e.keyword == "$ref" for e in errs)


def test_depth_exact_refuses_twin_fallback_schemas(spark):
    """Positional $ref pointers defeat the reachability probe; the
    annotate fallback's (lenient != strict) gate is disagreement-based
    and can under-fire under polarity-inverting compositions, so
    'exact' REFUSES such schemas at compile instead of silently
    breaking its full-oracle contract (annotate still compiles them
    with the documented twin semantics)."""
    from jsonschema_rs_spark import SchemaError, compile_json_schema
    schema = {
        "$defs": {"node": {
            "type": "object", "required": ["v"],
            "properties": {"v": {"type": "integer"},
                           "next": {"$ref": "#/$defs/node"}}}},
        "items": {"$ref": "#/$defs/node"},
        "allOf": [{"properties": {"tag": {"$ref": "#/$defs/node"}}}],
        "properties": {"alt": {"$ref": "#/allOf/0"}},
    }
    with pytest.raises(SchemaError, match="reachability probe"):
        compile_json_schema(schema, ValidationOptions(
            max_ref_depth=3, on_depth_exhausted="exact"))
    # the same schema still compiles under annotate (twin fallback)
    plan = compile_json_schema(schema, ValidationOptions(
        max_ref_depth=3, on_depth_exhausted="annotate"))
    assert plan._probe_is_reach is False


def test_depth_exact_refuses_custom_python_semantics():
    from jsonschema_rs_spark import SchemaError, compile_json_schema
    # blanket variant-path refusal (typed-compiler contract) fires
    # before the exact-mode-specific scope rule
    with pytest.raises(SchemaError, match="typed compiler"):
        compile_json_schema(CHAIN_SCHEMA, ValidationOptions(
            on_depth_exhausted="exact",
            custom_keywords={"x-k": lambda col: col.isNotNull()}))
    with pytest.raises(SchemaError, match="does not support"):
        compile_json_schema(CHAIN_SCHEMA, ValidationOptions(
            on_depth_exhausted="exact",
            multiple_of_semantics="reference"))


def test_depth_exact_nonrecursive_schema_zero_cost(spark):
    """No exhausted sites -> no twin, no kernel, no extra column."""
    from jsonschema_rs_spark import compile_json_schema
    plan = compile_json_schema({"properties": {"n": {"type": "integer"}}},
                               ValidationOptions(
                                   on_depth_exhausted="exact"))
    assert plan._node_strict is None
    df = spark.createDataFrame([('{"n": 1}',)], "doc string")
    out = plan.with_validation(df, "doc")
    assert "depth_exhausted" not in out.columns
    assert out.collect()[0]["valid"] is True


def test_depth_exact_composes_with_precision_fail(spark):
    """Precision 'fail' keeps its conservative contract on deep rows:
    a deep row containing an inexactly-stored number is rejected even
    when the kernel would validate it, and its verbose errors carry
    the 'number' tail."""
    from jsonschema_rs_spark import compile_json_schema
    schema = {"$ref": "#/$defs/node",
              "$defs": {"node": {
                  "type": "object", "required": ["v"],
                  "properties": {"v": {"type": "number"},
                                 "next": {"$ref": "#/$defs/node"}}}}}
    plan = compile_json_schema(schema, ValidationOptions(
        max_ref_depth=3, on_depth_exhausted="exact",
        on_precision_loss="fail"))
    big = "1" * 45  # 45-digit integer -> stored as a lossy double
    deep_clean = _chain(8)
    deep_degraded = deep_clean.replace('"v": 0', f'"v": {big}', 1)
    assert '"v": ' + big in deep_degraded
    df = spark.createDataFrame(
        [("deep_clean", deep_clean), ("deep_degraded", deep_degraded)],
        "name string, doc string")
    got = {r["name"]: r
           for r in plan.with_validation(df, "doc",
                                         mode="verbose").collect()}
    assert got["deep_clean"]["valid"] is True
    assert got["deep_degraded"]["valid"] is False
    assert any(e["keyword"] == "number"
               for e in got["deep_degraded"]["errors"])


def test_depth_exact_dynamic_ref_recursion(spark):
    """$dynamicRef recursion under 'exact': the probe gate fires on
    beyond-unroll content and the kernel (python-jsonschema resolves
    $dynamicAnchor natively) decides the true verdict."""
    from jsonschema_rs_spark import compile_json_schema
    schema = {"$id": "https://example.com/tree",
              "$dynamicAnchor": "node",
              "type": "object", "required": ["data"],
              "properties": {"data": {"type": "integer"},
                             "children": {"type": "array",
                                          "items": {"$dynamicRef":
                                                    "#node"}}}}

    def tree(depth, bad=False):
        doc = {"data": "x" if bad else 0}
        for i in range(depth):
            doc = {"data": i, "children": [doc]}
        return json.dumps(doc)

    plan = compile_json_schema(schema, ValidationOptions(
        max_ref_depth=2, on_depth_exhausted="exact"))
    df = spark.createDataFrame(
        [("ok8", tree(8)), ("bad8", tree(8, bad=True)),
         ("bad1", tree(1, bad=True))],
        "name string, doc string")
    got = {r["name"]: (r["valid"], r["depth_exhausted"])
           for r in plan.with_validation(df, "doc").collect()}
    assert got == {"ok8": (True, True), "bad8": (False, True),
                   "bad1": (False, False)}


def test_depth_exact_kernel_format_is_python_semantics(spark):
    """Pinned exact-kernel format corner (ROUND_NOTES Known
    deviations): gated rows are re-validated by python-jsonschema,
    whose FormatChecker has NO hostname checker registered in this
    environment (format skipped => lax), while the in-unroll plan
    applies the engine's reference-exact R-LDH hostname grammar. The
    divergence applies only to rows the gate routes to the kernel."""
    from jsonschema_rs_spark import compile_json_schema
    schema = {"$ref": "#/$defs/node", "$defs": {"node": {
        "type": "object", "required": ["v"],
        "properties": {"v": {"type": "string", "format": "hostname"},
                       "next": {"$ref": "#/$defs/node"}}}}}
    plan = compile_json_schema(schema, ValidationOptions(
        max_ref_depth=2, on_depth_exhausted="exact",
        validate_formats=True))

    def chain(depth, deepest_host):
        doc = {"v": deepest_host}
        for _ in range(depth):
            doc = {"v": "ok", "next": doc}
        return json.dumps(doc)

    df = spark.createDataFrame(
        [("shallow_bad", chain(0, "-bad-")),
         ("deep_bad", chain(6, "-bad-")),
         ("deep_ok", chain(6, "ok"))],
        "name string, doc string")
    got = {r["name"]: r["valid"]
           for r in plan.with_validation(df, "doc").collect()}
    assert got["shallow_bad"] is False   # engine grammar, in-unroll
    assert got["deep_ok"] is True
    # kernel semantics on the gated row = whatever python-jsonschema's
    # FormatChecker says in THIS environment (no fqdn package -> no
    # hostname checker -> format skipped -> valid; with fqdn installed
    # the kernel checks it) — the pinned point is that gated rows get
    # python-jsonschema format semantics, not the engine grammar
    import jsonschema
    fc = jsonschema.Draft202012Validator.FORMAT_CHECKER
    assert got["deep_bad"] is bool(fc.conforms("-bad-", "hostname"))


def test_depth_exact_external_resources(spark):
    """Recursion through a registry resource under 'exact': the probe
    transforms the resource documents too, and the kernel resolves the
    same URIs through a referencing.Registry."""
    from jsonschema_rs_spark import compile_json_schema
    node = {"type": "object", "required": ["v"],
            "properties": {"v": {"type": "integer"},
                           "next": {"$ref": "https://ex.com/node"}}}
    plan = compile_json_schema(
        {"$ref": "https://ex.com/node"},
        ValidationOptions(max_ref_depth=2, on_depth_exhausted="exact",
                          resources={"https://ex.com/node": node}))

    def chain(d, bad=False):
        doc = {"v": "x" if bad else 0}
        for i in range(d):
            doc = {"v": i, "next": doc}
        return json.dumps(doc)

    df = spark.createDataFrame(
        [("ok", chain(7)), ("bad", chain(7, bad=True))],
        "n string, doc string")
    got = {r["n"]: (r["valid"], r["depth_exhausted"])
           for r in plan.with_validation(df, "doc").collect()}
    assert got == {"ok": (True, True), "bad": (False, True)}


def test_precision_exact_schema_float_shortest_decimal(spark):
    """r5 review fix: schema floats in the exact kernel mean their
    SHORTEST-DECIMAL literal (Decimal('0.1')), not the binary
    expansion Decimal(0.1)=0.1000…0625 — a degraded row with an
    unrelated `const: 0.1` field must keep matching, and
    `0.0075 multipleOf 0.0001` (valid per the official suite and the
    engine's rational kernel) must stay valid inside the kernel."""
    from jsonschema_rs_spark import compile_json_schema
    schema = {"type": "object",
              "properties": {"a": {"const": 0.1},
                             "m": {"multipleOf": 0.0001},
                             "big": {"type": "integer"}}}
    plan = compile_json_schema(schema, ValidationOptions(
        on_precision_loss="exact"))
    big = "9" * 45  # forces the row through the kernel
    df = spark.createDataFrame(
        [("deg_ok", f'{{"a": 0.1, "m": 0.0075, "big": {big}}}'),
         ("deg_bad_const", f'{{"a": 0.2, "big": {big}}}'),
         ("deg_bad_mult", f'{{"m": 0.00015, "big": {big}}}')],
        "name string, doc string")
    got = {r["name"]: (r["valid"], r["precision_degraded"])
           for r in plan.with_validation(df, "doc").collect()}
    assert got == {"deg_ok": (True, True),
                   "deg_bad_const": (False, True),
                   "deg_bad_mult": (False, True)}


def test_depth_exact_never_vacuous_true_at_any_depth(spark):
    """Capacity behavior near and past the variant parser's own
    nesting ceiling (~1000 levels): at depth 800 the kernel decides
    the true verdict; at depth 2000 the variant parser itself returns
    NULL, the row fails the 'json' keyword, and the kernel is never
    consulted — in no regime can a deep violation come back
    vacuously valid."""
    def chain_str(depth, bad_at=None):
        # iterative rendering: json.dumps itself recurses one frame
        # per level and would die at the driver's default limit
        parts = ['{"v": ' + ('"oops"' if bad_at == i else str(i))
                 for i in range(depth)]
        return ', "next": '.join(parts) + "}" * depth

    assert chain_str(2) == '{"v": 0, "next": {"v": 1}}'
    plan = _depth_plan("exact", depth=2)
    df = spark.createDataFrame(
        [("d800_ok", chain_str(800)),
         ("d800_bad", chain_str(800, bad_at=799)),
         ("d2000", chain_str(2000))],
        "name string, doc string")
    got = {r["name"]: r["valid"]
           for r in plan.with_validation(df, "doc").collect()}
    assert got == {"d800_ok": True, "d800_bad": False, "d2000": False}


def test_depth_exact_auto_depth_not_reduced(spark):
    """Like annotate, the exact twin must not shrink the auto-tuned
    unroll vs ignore mode."""
    from jsonschema_rs_spark import compile_json_schema
    d_ign = compile_json_schema(
        CHAIN_SCHEMA, ValidationOptions(on_depth_exhausted="ignore"))
    d_ex = compile_json_schema(
        CHAIN_SCHEMA, ValidationOptions(on_depth_exhausted="exact"))
    assert d_ex.ref_depth == d_ign.ref_depth
    # and past the AUTO-tuned unroll the kernel still catches the
    # violation end-to-end
    deep = d_ign.ref_depth + 4
    df = spark.createDataFrame(
        [("bad", _chain(deep, bad_at=deep - 1)), ("ok", _chain(deep))],
        "name string, doc string")
    got = {r["name"]: r["valid"]
           for r in d_ex.with_validation(df, "doc").collect()}
    assert got == {"bad": False, "ok": True}


def test_depth_memo_key_covers_email_and_pattern_options():
    schema = {"type": "string", "format": "email"}
    base = ValidationOptions()
    with_email = ValidationOptions(
        email_options=EmailOptions(require_tld=True))
    k1 = _depth_memo_key(schema, base)
    k2 = _depth_memo_key(schema, with_email)
    assert k1 is not None and k2 is not None and k1 != k2


# -- draft-4 big-fraction-form residual: verified parser-level (r4 #7) -------


def test_draft4_big_fraction_form_normalized(spark):
    """VERDICT r4 asked to probe 'the preserved decimal scale (scale>0 =>
    fraction form)' for fraction forms beyond int64. The probe does not
    exist: Spark's variant parser normalizes trailing fractional zeros,
    so the integer and fraction lexical forms parse to IDENTICAL
    variants (same type string, same bytes). This pins the evidence —
    if a future Spark preserves the scale, this test fails and the
    residual becomes fixable in _is_integer_strict."""
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [("18446744073709551615", "18446744073709551615.0")],
        "a string, b string")
    r = df.select(
        F.schema_of_variant(F.try_parse_json("a")).alias("ta"),
        F.schema_of_variant(F.try_parse_json("b")).alias("tb"),
        (F.try_parse_json("a").cast("string")
         == F.try_parse_json("b").cast("string")).alias("same_render"),
    ).collect()[0]
    assert r["ta"] == r["tb"] == "DECIMAL(20,0)"
    assert r["same_render"]
    # and within int64 the lexical class IS preserved (the r4 fix):
    r2 = df.select(
        F.schema_of_variant(F.try_parse_json(F.lit("7"))).alias("i"),
        F.schema_of_variant(F.try_parse_json(F.lit("7.0"))).alias("f"),
    ).collect()[0]
    assert r2["i"] == "BIGINT" and r2["f"] == "DECIMAL(1,0)"


# -- r5 code-review fixes: they stay fixed ------------------------------------


def test_depth_memo_key_tolerates_dict_options():
    """A plain-dict email_options/pattern_options is tolerated end-to-end
    (the format readers use getattr with defaults), so the memo key must
    skip the cache for unhashable options rather than crash at the
    _DEPTH_MEMO lookup."""
    assert _depth_memo_key(
        {"type": "string", "format": "email"},
        ValidationOptions(email_options={"require_tld": True})) is None
    # hashable frozen-dataclass options still key the memo
    assert _depth_memo_key(
        {"type": "string", "format": "email"},
        ValidationOptions(email_options=EmailOptions())) is not None


def test_depth_probe_keeps_referenced_assertion_only_defs():
    """A plain $ref to an assertion-only def must not force the
    faithful-twin fallback: the probe keeps the targeted position as a
    {}-leaf spine (including targets NESTED inside pruned subtrees), so
    the tiny navigation probe stays compilable and the auto-tuned unroll
    depth is unaffected."""
    from jsonschema_rs_spark import compile_json_schema
    from jsonschema_rs_spark.compiler.variant import (
        _collect_ref_targets, _probe_schema)
    schema = {
        "$defs": {
            "id": {"type": "string"},                    # assertion-only
            "leafbag": {"properties": {"deep": {"minimum": 3}}},
            "node": {"type": "object", "required": ["v"],
                     "properties": {"v": {"type": "integer"},
                                    "next": {"$ref": "#/$defs/node"}}}},
        "properties": {"a": {"$ref": "#/$defs/id"},
                       "b": {"$ref": "#/$defs/leafbag/properties/deep"},
                       "root": {"$ref": "#/$defs/node"}},
    }
    targets = _collect_ref_targets([schema])
    assert ("$defs", "id") in targets
    assert ("$defs", "leafbag", "properties", "deep") in targets
    probe = _probe_schema(schema, targets)
    assert probe["$defs"]["id"] == {}
    assert probe["$defs"]["leafbag"] == {"properties": {"deep": {}}}
    plan = compile_json_schema(schema, ValidationOptions(
        max_ref_depth=3, on_depth_exhausted="annotate"))
    assert plan._node_strict is not None
    assert plan._probe_is_reach is True  # probe, not the faithful twin


def test_histogram_explicit_lo_scanned_hi_allnull(spark):
    """Explicit lo + scanned hi over an all-null column returns an empty
    histogram (the r5 guard covered only the lo-scanned side)."""
    import jsonschema_rs_spark.operators.table_checks as tc
    nulls = spark.createDataFrame([(None,), (None,)], "v double")
    assert tc.numeric_histogram(nulls, "v", lo=0.0).count() == 0
    assert tc.numeric_histogram(nulls, "v", hi=10.0).count() == 0


def test_histogram_nan_excluded_from_bounds_and_counts(spark):
    """NaN compares greater than every double in Spark, so one NaN row
    used to make the scanned hi = NaN and width_bucket dumped EVERY row
    into a single bucket. NaN rows are now excluded like nulls — from
    the bounds scan AND from the bucket counts."""
    import math

    import jsonschema_rs_spark.operators.table_checks as tc
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (4.0,), (float("nan"),), (None,)],
        "v double")
    rows = {r["bucket"]: r["n"]
            for r in tc.numeric_histogram(df, "v", n_buckets=3).collect()}
    # bounds from the non-NaN values (1..4): three equal buckets of 1,
    # the scan-derived max clamped into the top bucket; NaN/null dropped
    assert rows == {1: 1, 2: 1, 3: 2}
    assert sum(rows.values()) == 4
    # all-NaN column behaves like all-null: empty histogram
    nans = spark.createDataFrame([(float("nan"),)] * 2, "v double")
    assert tc.numeric_histogram(nans, "v").count() == 0
    assert not any(math.isnan(k or 0) for k in rows)


def test_ks_oracle_k_matches_spark_constant():
    """The KS oracle SQL is formatted from the SAME k constant the Spark
    plan uses — tuning table_checks.KS_SKETCH_K can't silently diverge
    the oracle's rank selection or its 2/k bound."""
    from jsonschema_rs_spark import oracles
    from jsonschema_rs_spark.operators.table_checks import KS_SKETCH_K
    assert f"* {KS_SKETCH_K}) // n" in oracles.KS_EVENTS_VALUE
    assert f"2.0 / {KS_SKETCH_K}" in oracles.KS_EVENTS_VALUE
    assert "{k}" not in oracles.KS_EVENTS_VALUE


# ---------------------------------------------------------------------------
# on_precision_loss: observable numeric precision degradation (the r4
# VERDICT's "What's missing" #2 — >38-digit/exponent number tokens are
# stored as lossy doubles by the variant parser; the reference validates
# them with arbitrary precision, lib.rs:769-792 / ext/numeric.rs:89-110)
# ---------------------------------------------------------------------------

from jsonschema_rs_spark.functions.precision import (  # noqa: E402
    token_precision_degraded)


@pytest.mark.parametrize("tok,want", [
    ("1" * 38, False),            # 38-digit int -> DECIMAL(38,0), exact
    ("1" * 39, True),             # 39 digits -> DOUBLE, inexact
    ("-" + "1" * 39, True),
    (str(2 ** 100), False),       # 31 digits -> DECIMAL(31,0), exact
    ("1e2", False),               # DOUBLE but exactly 100.0
    ("2.5e1", False),             # DOUBLE but exactly 25.0
    ("1e39", True),               # DOUBLE, 10^39 not representable
    ("1.5", False),
    ("0." + "1" * 38, False),     # DECIMAL(38,38)
    ("0." + "1" * 39, True),      # scale 39 -> DOUBLE, inexact
    ("1." + "0" * 40, False),     # DOUBLE but exactly 1.0
    ("0." + "0" * 40 + "1", True),  # scale 41 -> DOUBLE, 1e-41 inexact
    ("1" + "0" * 309, True),      # overflows double to inf
    ("18446744073709551615", False),  # u64 max -> DECIMAL(20,0)
])
def test_token_precision_degraded(tok, want):
    assert token_precision_degraded(tok) is want


def test_variant_numeric_storage_classes(spark):
    """Pin the storage rule functions/precision.py encodes: DOUBLE iff
    exponent marker, BigDecimal precision > 38, or scale > 38 —
    otherwise exact DECIMAL. If a Spark upgrade changes this rule the
    predicate must be recalibrated."""
    from pyspark.sql import functions as F
    toks = ["1" * 38, "1" * 39, "1e2", "0." + "1" * 38, "0." + "1" * 39,
            "1." + "0" * 40, "0." + "0" * 40 + "1", str(2 ** 100)]
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    got = {r["tok"]: r["vt"] for r in df.select(
        "tok",
        F.schema_of_variant(F.try_parse_json(F.col("tok"))).alias("vt"))
        .collect()}
    assert got["1" * 38] == "DECIMAL(38,0)"
    assert got["1" * 39] == "DOUBLE"
    assert got["1e2"] == "DOUBLE"
    assert got["0." + "1" * 38] == "DECIMAL(38,38)"
    assert got["0." + "1" * 39] == "DOUBLE"
    assert got["1." + "0" * 40] == "DOUBLE"
    assert got["0." + "0" * 40 + "1"] == "DOUBLE"
    assert got[str(2 ** 100)] == "DECIMAL(31,0)"


def test_precision_annotate_mode(spark):
    from pyspark.sql import functions as F  # noqa: F401
    from jsonschema_rs_spark.compiler.variant import CompiledJsonSchema
    comp = CompiledJsonSchema(
        {"type": "object"},
        ValidationOptions(on_precision_loss="annotate"))
    rows = [
        ('{"a": ' + "1" * 39 + '}', True),    # 39-digit int
        ('{"a": 1.5}', False),
        ('{"a": 1e2}', False),                # double but exact
        ('{"a": "' + "1" * 50 + '"}', False),  # digits inside a STRING
        ('{"a": ' + "9" * 38 + '}', False),   # 38 digits exact
        (None, False),
        ("not json", False),                  # json keyword's problem
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], "doc string")
    out = comp.with_validation(df, "doc", mode="flag")
    assert "precision_degraded" in out.columns
    got = [bool(r["precision_degraded"]) for r in out.collect()]
    assert got == [w for _, w in rows]
    # default mode appends nothing — the r4 output schema is unchanged
    comp_default = CompiledJsonSchema({"type": "object"})
    assert "precision_degraded" not in \
        comp_default.with_validation(df, "doc").columns


def test_precision_fail_mode_flag_and_verbose(spark):
    from jsonschema_rs_spark.compiler.variant import CompiledJsonSchema
    comp = CompiledJsonSchema(
        {"type": "object"}, ValidationOptions(on_precision_loss="fail"))
    deg = '{"a": ' + "1" * 39 + '}'
    ok = '{"a": 1}'
    df = spark.createDataFrame([(deg,), (ok,)], "doc string")
    flags = {r["doc"]: bool(r["valid"])
             for r in comp.with_validation(df, "doc").collect()}
    assert flags == {deg: False, ok: True}
    verbose = {r["doc"]: r for r in
               comp.with_validation(df, "doc", mode="verbose").collect()}
    errs = [e["keyword"] for e in verbose[deg]["errors"]]
    assert errs == ["number"]
    assert "exact precision" in verbose[deg]["errors"][0]["message"]
    assert verbose[ok]["errors"] == []
    # fail mode does NOT add the annotate column
    assert "precision_degraded" not in \
        comp.with_validation(df, "doc").columns


def test_precision_fail_single_instance_api(spark):
    big = 10 ** 38  # json.dumps renders 39 digits -> degraded
    assert jrs.is_valid({"type": "integer"}, big)  # default: ignore
    opts = ValidationOptions(on_precision_loss="fail")
    assert not jrs.is_valid({"type": "integer"}, big, base=opts)
    errs = list(jrs.iter_errors({"type": "integer"}, big, base=opts))
    assert [e.keyword for e in errs] == ["number"]
    # exact-decimal numbers are untouched by fail mode
    assert jrs.is_valid({"type": "integer"}, 2 ** 100, base=opts)


def test_precision_invalid_mode_rejected():
    from jsonschema_rs_spark.compiler.variant import CompiledJsonSchema
    from jsonschema_rs_spark.errors import SchemaError
    with pytest.raises(SchemaError):
        CompiledJsonSchema(
            {}, ValidationOptions(on_precision_loss="loudly"))


def test_precision_annotation_catches_numeric_divergence(spark):
    """Sufficiency of the precision_degraded signal: on every case where
    this engine's double-based verdict DIVERGES from an exact-arithmetic
    oracle (python-jsonschema over instances parsed with arbitrary-
    precision ints), the annotation is True — and clean documents never
    flag. This is the property the signal exists to provide: a consumer
    filtering on ~precision_degraded reads only verdicts the reference's
    BigInt path would agree with."""
    import json as _json

    import jsonschema as pyjs

    big = 10 ** 38  # 39 digits -> stored as a lossy double
    cases = [
        # (schema, json text) — mixes divergent and agreeing rows
        ({"const": float(big)}, str(big)),              # DIVERGES
        ({"uniqueItems": True}, f"[{big},{big + 1}]"),  # DIVERGES
        ({"uniqueItems": True}, "[1,2]"),
        ({"const": 100.0}, "1e2"),
        ({"type": "integer"}, str(2 ** 100)),           # exact decimal
        ({"multipleOf": 3}, "21"),
        ({"multipleOf": 3}, "22"),
    ]
    from jsonschema_rs_spark.compiler.variant import CompiledJsonSchema
    diverged = 0
    for schema, text in cases:
        comp = CompiledJsonSchema(
            schema, ValidationOptions(on_precision_loss="annotate"))
        df = spark.createDataFrame([(text,)], "doc string")
        row = comp.with_validation(df, "doc").first()
        exact = pyjs.Draft202012Validator(schema).is_valid(
            _json.loads(text, parse_int=int))
        if bool(row["valid"]) != exact:
            diverged += 1
            assert bool(row["precision_degraded"]), \
                f"divergence not annotated: {schema} over {text}"
        if not bool(row["precision_degraded"]):
            assert bool(row["valid"]) == exact, \
                f"clean row diverged silently: {schema} over {text}"
    assert diverged >= 2  # the two engineered divergences really diverge


def test_typing_surface_parity_importable():
    """Every typing/option name the reference's __init__.pyi exposes is
    importable top-level here (pyi:1-118): the migration surface is
    import-compatible, and http_options= fails loudly with the
    supported alternatives instead of being silently ignored."""
    from jsonschema_rs_spark import (  # noqa: F401
        EvaluationAnnotation, EvaluationErrorEntry, FlagOutput,
        HttpOptions, JSONPrimitive, JSONType, KeywordValidator,
        ListOutput, OutputUnit, PatternOptionsType, RetrieverProtocol)
    from jsonschema_rs_spark.errors import SchemaError
    assert HttpOptions().tls_verify is True
    with pytest.raises(SchemaError, match="retriever"):
        jrs.validator_for({}, http_options=HttpOptions())
    # None stays accepted (the reference's default)
    jrs.validator_for({}, http_options=None)
    missing = [n for n in jrs.__all__ if not hasattr(jrs, n)]
    assert missing == []


# ---------------------------------------------------------------------------
# Schema-side beyond-limit numeric literals (pre-existing compile crash:
# const/enum/minimum/maximum with a >38-digit integer raised
# DECIMAL_PRECISION_EXCEEDS_MAX_PRECISION on the variant path and
# NumberFormatException/OverflowError on the typed path)
# ---------------------------------------------------------------------------

BIG = 10 ** 39          # > decimal(38,0), not double-representable
HUGE = 10 ** 400        # > double range


def test_variant_big_schema_literals_compile_and_judge(spark):
    """Variant path: >38-digit schema literals compile and judge in
    double space (serde_json's non-arbitrary_precision reading; the
    instance itself is double-stored at that magnitude, the storage rule
    functions/precision.py pins). 10**400-class literals saturate to
    ±inf instead of OverflowError."""
    from jsonschema_rs_spark.compiler.variant import CompiledJsonSchema
    docs = ["5", str(BIG), str(BIG + 1), "1e40", str(HUGE)]
    df = spark.createDataFrame([(d,) for d in docs], "doc string")

    def run(schema):
        comp = CompiledJsonSchema(schema, ValidationOptions())
        return [bool(r["valid"])
                for r in comp.with_validation(df, "doc").collect()]

    # double-space: BIG and BIG+1 collapse onto the same double (the
    # documented parse-level limit on_precision_loss observes)
    assert run({"minimum": BIG}) == [False, True, True, True, True]
    assert run({"maximum": BIG}) == [True, True, True, False, False]
    assert run({"enum": [BIG, 5]}) == [True, True, True, False, False]
    assert run({"const": BIG}) == [False, True, True, False, False]
    # beyond double range -> only the rows the parser stored as +inf
    assert run({"minimum": HUGE}) == [False, False, False, False, True]
    assert run({"const": HUGE}) == [False, False, False, False, True]
    assert run({"exclusiveMaximum": HUGE}) == [True, True, True, True,
                                               False]


def test_variant_big_literal_exact_mode_overrules(spark):
    """on_precision_loss='exact' restores exact verdicts over the
    double-space compile: BIG is a multiple of 2 / equals const BIG,
    BIG+1 is not / does not."""
    from jsonschema_rs_spark.compiler.variant import CompiledJsonSchema
    df = spark.createDataFrame(
        [(str(BIG),), (str(BIG + 1),), ("6",), ("7",)], "doc string")
    comp = CompiledJsonSchema(
        {"multipleOf": 2}, ValidationOptions(on_precision_loss="exact"))
    out = comp.with_validation(df, "doc", mode="verbose").collect()
    assert [bool(r["valid"]) for r in out] == [True, False, True, False]
    assert [bool(r["precision_degraded"]) for r in out] == \
        [True, True, False, False]
    # exact-invalid rows carry the distinguished 'number' error row
    kws = [e["keyword"] for e in out[1]["errors"]]
    assert "number" in kws
    assert out[0]["errors"] == []  # exact-VALID degraded row: no errors
    comp2 = CompiledJsonSchema(
        {"const": BIG}, ValidationOptions(on_precision_loss="exact"))
    got = [bool(r["valid"])
           for r in comp2.with_validation(df, "doc").collect()]
    assert got == [True, False, False, False]


def test_precision_exact_mode_rejects_custom_semantics():
    from jsonschema_rs_spark.compiler.variant import CompiledJsonSchema
    from jsonschema_rs_spark.errors import SchemaError
    # custom keywords are refused on the variant path in EVERY mode now
    # (they are typed-compiler Column factories and were silently
    # skipped before) — the blanket refusal supersedes the exact-mode-
    # specific one
    with pytest.raises(SchemaError, match="typed compiler"):
        CompiledJsonSchema({}, ValidationOptions(
            on_precision_loss="exact",
            custom_keywords={"x-k": lambda *a: None}))
    with pytest.raises(SchemaError, match="reference"):
        CompiledJsonSchema({}, ValidationOptions(
            on_precision_loss="exact",
            multiple_of_semantics="reference"))


def test_typed_big_schema_literals_exact_domain(spark):
    """Typed path: typed columns carry EXACT values, so beyond-int64
    literals judge by the dtype's exact domain — statically for
    integrals, via a decimal literal for in-range decimals, and via a
    rounding-direction-adjusted double compare for float/double columns
    (no double lies strictly between float(m) and m)."""
    import pyspark.sql.types as T
    from decimal import Decimal
    from jsonschema_rs_spark.compiler.compiler import compile_schema

    rep = 2 ** 100  # exactly double-representable bignum
    df = spark.createDataFrame(
        [(5, 1e40, Decimal(10) ** 30),
         (9223372036854775807, float(rep), Decimal(2 ** 100))],
        T.StructType([T.StructField("a", T.LongType()),
                      T.StructField("b", T.DoubleType()),
                      T.StructField("c", T.DecimalType(38, 0))]))

    def run(props):
        comp = compile_schema({"type": "object", "properties": props},
                              df.schema, ValidationOptions())
        return [bool(r["valid"])
                for r in comp.with_validation(df).collect()]

    # integral column: domain < 2^63 -> static verdicts
    assert run({"a": {"minimum": BIG}}) == [False, False]
    assert run({"a": {"maximum": BIG}}) == [True, True]
    assert run({"a": {"const": BIG}}) == [False, False]
    assert run({"a": {"minimum": -BIG}}) == [True, True]
    # double column: adjusted double compare; float(BIG) < BIG so the
    # boundary double itself must NOT satisfy minimum=BIG
    assert run({"b": {"minimum": BIG}}) == [True, False]
    assert run({"b": {"maximum": BIG}}) == [False, True]
    assert run({"b": {"exclusiveMaximum": HUGE}}) == [True, True]
    assert run({"b": {"minimum": HUGE}}) == [False, False]
    # exact-representability decides const/enum on doubles
    assert run({"b": {"const": rep}}) == [False, True]
    assert run({"b": {"const": rep + 1}}) == [False, False]
    assert run({"b": {"enum": [rep, 5]}}) == [False, True]
    # decimal(38,0) column: in-domain bignum -> exact decimal compare
    assert run({"c": {"const": 2 ** 100}}) == [False, True]
    assert run({"c": {"minimum": 10 ** 30}}) == [True, True]
    assert run({"c": {"minimum": 2 ** 100}}) == [False, True]
    assert run({"c": {"minimum": BIG}}) == [False, False]
    assert run({"c": {"maximum": BIG}}) == [True, True]


def test_typed_boundary_double_adjusted_compare(spark):
    """The adjusted compare is exact at the boundary: float(10**39)
    is strictly below 10**39, so it fails minimum=10**39 but passes
    maximum=10**39 — a plain double compare would get the former
    wrong."""
    from jsonschema_rs_spark.compiler.compiler import compile_schema
    fm = float(BIG)
    assert fm != BIG  # precondition: not exactly representable
    df = spark.createDataFrame([(fm,)], "b double")
    for kw, want in [("minimum", fm > BIG), ("maximum", fm < BIG),
                     ("exclusiveMinimum", fm > BIG),
                     ("exclusiveMaximum", fm < BIG)]:
        comp = compile_schema(
            {"type": "object", "properties": {"b": {kw: BIG}}},
            df.schema, ValidationOptions())
        got = bool(comp.with_validation(df).first()["valid"])
        assert got is want, (kw, got, want)


def test_precision_exact_exactifies_resources_and_retriever(spark):
    """Schema floats reached via $ref (resources= or retriever=) get the
    same shortest-decimal exactification as the root: `const: 0.1` in a
    referenced resource matches an exactly-parsed 0.1, and multipleOf
    there is Decimal-vs-Decimal (not a Decimal % float TypeError that
    crashed the task)."""
    from jsonschema_rs_spark.compiler.variant import CompiledJsonSchema
    res = {"https://x.test/s": {
        "properties": {"a": {"const": 0.1}, "b": {"multipleOf": 0.1}}}}
    # degraded row (1e999 -> double inf) routed to the kernel; a/b obey
    # the referenced sub-schemas exactly
    good = '{"a": 0.1, "b": 0.3, "big": 1e999}'
    bad = '{"a": 0.2, "b": 0.3, "big": 1e999}'
    df = spark.createDataFrame([(good,), (bad,)], "doc string")
    for opts in (ValidationOptions(on_precision_loss="exact",
                                   resources=res),
                 ValidationOptions(on_precision_loss="exact",
                                   retriever=lambda uri: res[uri])):
        comp = CompiledJsonSchema({"$ref": "https://x.test/s"}, opts)
        got = [bool(r["valid"])
               for r in comp.with_validation(df, "doc").collect()]
        assert got == [True, False], opts


def test_precision_exact_keeps_invalid_json_verdict(spark):
    """The exact kernel never overrides the plan's invalid-JSON verdict:
    Python's json accepts Infinity/NaN (e.g. json.dumps(float('inf'))
    output) but the variant parser rejects them — the gate requires
    try_parse_json to have ACCEPTED the text."""
    from jsonschema_rs_spark.compiler.variant import CompiledJsonSchema
    df = spark.createDataFrame(
        [('{"a": Infinity, "b": 1e999}',), ('{"b": 1e999}',)],
        "doc string")
    comp = CompiledJsonSchema({"type": "object"},
                              ValidationOptions(on_precision_loss="exact"))
    out = comp.with_validation(df, "doc", mode="verbose").collect()
    assert [bool(r["valid"]) for r in out] == [False, True]
    assert [e["keyword"] for e in out[0]["errors"]] == ["json"]
    # single-Column surfaces agree
    from pyspark.sql import functions as F
    assert [bool(r["v"]) for r in df.select(
        comp.valid_column(F.col("doc")).alias("v")).collect()] \
        == [False, True]


def test_doc_degraded_deep_nesting_conservative():
    """Degradation detection on deeply nested documents: the raised
    recursion limit (applied at pUDF batch start, not as a validator-
    build side effect) gives real answers to ~2000 levels, and beyond
    even the raised limit the answer is conservative True (never a
    silent not-degraded that 'fail' mode would wave through)."""
    from jsonschema_rs_spark.functions.precision import (
        _KERNEL_RECURSION_LIMIT, _doc_degraded, _raise_recursion_limit)
    _raise_recursion_limit()
    import sys
    assert sys.getrecursionlimit() >= _KERNEL_RECURSION_LIMIT
    # parseable under the raised limit: accurate per-token answers
    assert _doc_degraded("[" * 1500 + "1e999" + "]" * 1500) is True
    assert _doc_degraded("[" * 1500 + "1e2" + "]" * 1500) is False
    # beyond even the raised limit: conservative True
    deep = "[" * 40000 + "1" + "]" * 40000
    assert _doc_degraded(deep) is True


def test_variant_big_int_exact_compare_24_to_38_digits(spark):
    """decimal(38,15) covers only 23 integer digits; 24-38-digit
    integer instances must still compare EXACTLY (via the decimal(38,0)
    view) against big int literals — they used to fall to the rounded
    double, equating 10**30 with 10**30+1 (review find)."""
    from jsonschema_rs_spark.compiler.variant import CompiledJsonSchema

    def run(schema, docs):
        df = spark.createDataFrame([(d,) for d in docs], "doc string")
        comp = CompiledJsonSchema(schema, ValidationOptions())
        return [bool(r["valid"])
                for r in comp.with_validation(df, "doc").collect()]

    for k in (24, 30, 37):
        B = 10 ** k
        docs = [str(B - 1), str(B), str(B + 1)]
        assert run({"minimum": B + 1}, docs) == [False, False, True], k
        assert run({"maximum": B - 1}, docs) == [True, False, False], k
        assert run({"const": B}, docs) == [False, True, False], k
        assert run({"enum": [B, 5]}, docs) == [False, True, False], k
        # uniqueItems: distinct 24-38-digit ints are NOT duplicates
        assert run({"uniqueItems": True},
                   [f"[{B}, {B + 1}]", f"[{B}, {B}]"]) == [True, False], k


def test_float_literal_beyond_2_53_exact_compare(spark):
    """A FLOAT schema literal at/beyond 2^53 is an integer; both
    compilers must compare it exactly instead of promoting the instance
    to double (minimum/const 1e16 wrongly admitted/matched
    9999999999999999 — review find; reference ext/numeric.rs exact
    cross-type compare)."""
    import jsonschema

    from jsonschema_rs_spark.compiler.compiler import compile_schema
    from jsonschema_rs_spark.compiler.variant import CompiledJsonSchema

    lo, hi = 9999999999999999, 10000000000000000  # float(lo) == 1e16
    assert float(lo) == 1e16

    # variant path
    dfv = spark.createDataFrame([(str(lo),), (str(hi),)], "doc string")
    for schema, want in [({"minimum": 1e16}, [False, True]),
                         ({"exclusiveMaximum": 1e16}, [True, False]),
                         ({"const": 1e16}, [False, True]),
                         ({"enum": [1e16]}, [False, True])]:
        comp = CompiledJsonSchema(schema, ValidationOptions())
        got = [bool(r["valid"])
               for r in comp.with_validation(dfv, "doc").collect()]
        py = [jsonschema.Draft202012Validator(schema).is_valid(x)
              for x in (lo, hi)]
        assert got == want == py, schema

    # typed path (long column)
    dft = spark.createDataFrame([(lo,), (hi,)], "a long")
    for kw, want in [("minimum", [False, True]),
                     ("exclusiveMaximum", [True, False]),
                     ("const", [False, True])]:
        comp = compile_schema(
            {"type": "object", "properties": {"a": {kw: 1e16}}},
            dft.schema, ValidationOptions())
        got = [bool(r["valid"]) for r in comp.with_validation(dft).collect()]
        assert got == want, kw


def test_coverage_walk_no_phantom_contains_sites(spark):
    """Coverage-walk recompiles (unevaluated* reading through allOf/if)
    must not register phantom '/__cov/contains' annotation sites: they
    duplicated map keys in with_contains_annotations (runtime
    'duplicate map key') and polluted exhausted-site lists (review
    find)."""
    from jsonschema_rs_spark.compiler.variant import CompiledJsonSchema
    comp = CompiledJsonSchema(
        {"allOf": [{"contains": {"type": "integer"}}],
         "unevaluatedItems": False, "unevaluatedProperties": False},
        ValidationOptions())
    assert [sp for sp, _ in comp._contains_sites] == ["/allOf/0/contains"]
    df = spark.createDataFrame([('[1, "x"]',), ("{}",)], "doc string")
    out = comp.with_contains_annotations(df, "doc").collect()
    assert dict(out[0]["annotations"]) == {"/allOf/0/contains": [0]}


def test_depth_memo_not_poisoned_without_measurement(spark):
    """A cyclic schema compiled where the plan size cannot be measured
    (no JVM, e.g. Connect) must not write its conservative probe depth
    into the process-wide memo — a later measurable compile would
    silently inherit unroll depth 2 (review find)."""
    from jsonschema_rs_spark.compiler import variant as V
    schema = {"$defs": {"n": {"properties": {
        "v": {"type": "integer"},
        "next": {"$ref": "#/$defs/n"}}}},
        "$ref": "#/$defs/n"}
    # unique memo key for this test via a distinct option combo
    opts = ValidationOptions(ignore_unknown_formats=False)
    key = V._depth_memo_key(schema, opts)
    assert key is not None
    V._DEPTH_MEMO.pop(key, None)
    orig = V.CompiledJsonSchema._measured_size
    try:
        V.CompiledJsonSchema._measured_size = lambda self: None
        comp = V.CompiledJsonSchema(schema, opts)
        assert comp.ref_depth == V.CompiledJsonSchema._PROBE_DEPTH
        assert key not in V._DEPTH_MEMO  # no poisoned entry
    finally:
        V.CompiledJsonSchema._measured_size = orig
    comp2 = V.CompiledJsonSchema(schema, opts)
    assert comp2.ref_depth > V.CompiledJsonSchema._PROBE_DEPTH
    assert V._DEPTH_MEMO.get(key) == comp2.ref_depth


def test_double_instance_vs_nonrepresentable_int_literal(spark):
    """A DOUBLE-stored instance's exact value IS the double, so it can
    equal an int literal only when the literal is double-representable
    (fuzz find at the grown numeric grammar: '1e+30' wrongly matched
    enum/const 10**30), and ordering against float(L) needs the
    rounding-direction flip when float(L) != L (keywords._big_bound_pred
    already had it; the variant double-fallback did not)."""
    import jsonschema

    from jsonschema_rs_spark.compiler.variant import CompiledJsonSchema

    def run(schema, docs):
        df = spark.createDataFrame([(d,) for d in docs], "doc string")
        comp = CompiledJsonSchema(schema, ValidationOptions())
        return [bool(r["valid"])
                for r in comp.with_validation(df, "doc").collect()]

    B = 10 ** 30  # NOT double-representable
    assert float(B) != B
    assert run({"enum": [B]}, ["1e+30"]) == [False]
    assert run({"const": B}, ["1e+30"]) == [False]
    R = 2 ** 80  # double-representable 25-digit int
    assert float(R) == R
    assert run({"const": R}, ["1.2089258196146292e+24"]) == [True]

    # direction flip: L = 2^53 + 5, float(L) = 2^53 + 4 < L; the
    # double-stored instance equal to float(L) is exactly 2^53+4 < L
    L = 2 ** 53 + 5
    assert float(L) < L
    doc = "9.007199254740996e15"  # == float(L) == 2^53 + 4
    got = run({"minimum": L}, [doc])
    py = jsonschema.Draft202012Validator({"minimum": L}).is_valid(
        json.loads(doc))
    assert got == [py] == [False]
    assert run({"exclusiveMaximum": L}, [doc]) == [True]


def test_typed_map_const_enum_and_unique(spark):
    """Map-bearing dtypes: Spark rejects `=`/array_distinct on MAP
    (INVALID_ORDERING_TYPE) — const/enum/uniqueItems go through the
    key-sorted orderable rewrite (review find: AnalysisException on
    legal schemas), with key-order-insensitive object equality."""
    from pyspark.sql import types as T

    from jsonschema_rs_spark.compiler.compiler import compile_schema

    def wrap(inner):
        return {"type": "object", "properties": {"a": inner}}

    def run(schema, df):
        comp = compile_schema(schema, df.schema, ValidationOptions())
        return [bool(r["valid"])
                for r in comp.with_validation(df).collect()]

    mdf = spark.createDataFrame(
        [({"a": 1},), ({"b": 2},), ({"a": 1, "b": 2},), ({"b": 2, "a": 1},)],
        T.StructType([T.StructField(
            "a", T.MapType(T.StringType(), T.LongType()))]))
    assert run(wrap({"const": {"a": 1}}), mdf) == [True, False, False, False]
    assert run(wrap({"const": {"a": 1, "b": 2}}), mdf) == \
        [False, False, True, True]  # key order is irrelevant
    assert run(wrap({"enum": [{"a": 1}, {"b": 2}]}), mdf) == \
        [True, True, False, False]
    adf = spark.createDataFrame(
        [([{"a": 1}, {"a": 1}],), ([{"a": 1}, {"b": 2}],)],
        T.StructType([T.StructField(
            "a", T.ArrayType(T.MapType(T.StringType(), T.LongType())))]))
    assert run(wrap({"uniqueItems": True}), adf) == [False, True]


def test_typed_map_dependencies_and_dependent_schemas(spark):
    """Map columns honor dependencies (both forms) and dependentSchemas
    like the struct path (review find: silently ignored)."""
    from pyspark.sql import types as T

    from jsonschema_rs_spark.compiler.compiler import compile_schema

    def wrap(inner):
        return {"type": "object", "properties": {"a": inner}}

    mdf = spark.createDataFrame(
        [({"a": 1},), ({"b": 2},), ({"a": 1, "b": 2},)],
        T.StructType([T.StructField(
            "a", T.MapType(T.StringType(), T.LongType()))]))
    for schema in (wrap({"dependentSchemas": {"a": {"required": ["b"]}}}),
                   wrap({"dependencies": {"a": {"required": ["b"]}}}),
                   wrap({"dependencies": {"a": ["b"]}})):
        comp = compile_schema(schema, mdf.schema, ValidationOptions())
        got = [bool(r["valid"])
               for r in comp.with_validation(mdf).collect()]
        assert got == [False, True, True], schema


def test_typed_struct_property_names_real_compile(spark):
    """Struct propertyNames now evaluates field names with the REAL
    compiled subschema (constant-folded), not a partial static
    evaluator that mis-handled type lists and silently passed
    unmodeled keywords (review find)."""
    from pyspark.sql import types as T

    from jsonschema_rs_spark.compiler.compiler import compile_schema

    sdf = spark.createDataFrame(
        [((1,),)],
        T.StructType([T.StructField("a", T.StructType(
            [T.StructField("x", T.LongType())]))]))

    def run(inner):
        comp = compile_schema(
            {"type": "object", "properties": {"a": inner}},
            sdf.schema, ValidationOptions())
        return [bool(r["valid"])
                for r in comp.with_validation(sdf).collect()]

    assert run({"propertyNames": {"type": ["string"]}}) == [True]
    assert run({"propertyNames": {"not": {"const": "x"}}}) == [False]
    assert run({"propertyNames": {"anyOf": [{"const": "x"}]}}) == [True]
    assert run({"propertyNames": {"minLength": 2}}) == [False]


def test_typed_exact_numeric_review_fixes(spark):
    """Typed-path exact numerics from the review sweep: fractional
    multipleOf on longs (no double detour), type:integer on decimals,
    direction-quantized fractional bounds on exact-domain columns, and
    draft items array-form schema paths."""
    from decimal import Decimal

    from pyspark.sql import types as T

    from jsonschema_rs_spark.compiler.compiler import compile_schema

    def wrap(inner):
        return {"type": "object", "properties": {"a": inner}}

    def run(schema, df):
        comp = compile_schema(schema, df.schema, ValidationOptions())
        return [bool(r["valid"])
                for r in comp.with_validation(df).collect()]

    # 9007199254740993 * 10 is divisible by 3; the double cast rounded
    # it to ...992 first and said no
    ldf = spark.createDataFrame([(9007199254740993,),
                                 (9007199254740994,)], "a long")
    assert run(wrap({"multipleOf": 0.3}), ldf) == [True, False]
    assert run(wrap({"multipleOf": 0.5}), ldf) == [True, True]

    ddf = spark.createDataFrame(
        [(Decimal("10000000000000000.25"),), (Decimal("3.00"),)],
        T.StructType([T.StructField("a", T.DecimalType(38, 2))]))
    assert run(wrap({"type": "integer"}), ddf) == [False, True]

    hdf = spark.createDataFrame(
        [(Decimal("0.3000000000000000004"),),
         (Decimal("0.2999999999999999999"),),
         (Decimal("0.2999999999999999888"),)],
        T.StructType([T.StructField("a", T.DecimalType(38, 19))]))
    # exact binary 0.3 = 0.299999999999999988897...: verdicts pinned
    # against python-jsonschema's Decimal-vs-float exact compare
    assert run(wrap({"maximum": 0.3}), hdf) == [False, False, True]
    assert run(wrap({"minimum": 0.3}), hdf) == [True, True, False]

    idf = spark.createDataFrame(
        [([1],)],
        T.StructType([T.StructField("a", T.ArrayType(T.LongType()))]))
    comp = compile_schema(wrap({"items": [{"type": "string"}]}),
                          idf.schema, ValidationOptions())
    errs = comp.with_validation(idf, mode="verbose").collect()[0]["errors"]
    assert [e["schema_path"] for e in errs] == \
        ["/properties/a/items/0/type"]


def test_typed_struct_patterns_use_ecma_translation(spark):
    """Struct patternProperties/additionalProperties go through the
    same ECMA->Java translation as the map path: ECMA named groups
    compile (raw re.compile crashed), and name matching uses Java
    semantics via constant-folded rlike (review find)."""
    from pyspark.sql import types as T

    from jsonschema_rs_spark.compiler.compiler import compile_schema

    sdf = spark.createDataFrame(
        [((1, "y"),)],
        T.StructType([T.StructField("a", T.StructType(
            [T.StructField("x", T.LongType()),
             T.StructField("s", T.StringType())]))]))

    def run(inner):
        comp = compile_schema(
            {"type": "object", "properties": {"a": inner}},
            sdf.schema, ValidationOptions())
        return [bool(r["valid"])
                for r in comp.with_validation(sdf).collect()]

    # ECMA named group — used to raise re.error at compile
    assert run({"patternProperties": {"(?<g>x)": {"type": "integer"}}}) \
        == [True]
    assert run({"patternProperties": {"(?<g>x)": {"type": "string"}}}) \
        == [False]
    # additionalProperties exemption decided by the translated pattern
    assert run({"patternProperties": {"^x$": {"type": "integer"}},
                "additionalProperties": {"type": "string"}}) == [True]
    assert run({"patternProperties": {"^s$": {"type": "string"}},
                "additionalProperties": {"type": "string"}}) == [False]


def test_zero_norm_embeddings_null_not_crash(spark):
    """A zero-norm embedding (failed/padded vector) must not abort the
    job with ANSI DIVIDE_BY_ZERO, and all cosine paths must agree:
    similarity involving it is NULL — failing thresholds and ranking
    after real sims (NaN would sort ABOVE every number in Spark and
    win top-k; review find)."""
    from jsonschema_rs_spark.operators import similarity as sim

    rows = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.0] * 4), (3, [0.0] * 4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # exact path: zero pairs dropped, real pair kept — no exception
    exact = sim.near_duplicates_by_cosine(df, threshold=0.9, dim=4,
                                          exact=True).collect()
    assert [(r["id_a"], r["id_b"]) for r in exact] == [(0, 1)]
    # LSH path (both verify transports route through _batch_cosine)
    for bv in (True, False):
        lsh = sim.near_duplicates_by_cosine(
            df, threshold=0.9, n_planes=9, dim=4,
            broadcast_verify=bv).collect()
        assert [(r["id_a"], r["id_b"]) for r in lsh] == [(0, 1)], bv
    # brute-force top-k: zero-norm corpus rows rank LAST (NULL sim)
    q = spark.createDataFrame([(100, [1.0, 0.0, 0.0, 0.0])],
                              "query_id long, embedding array<double>")
    top = sim.brute_force_topk(df, q, k=2).collect()
    assert [r["neighbor_id"] for r in top] == [0, 1]
    assert all(r["sim"] is not None for r in top)


def test_near_dup_exact_rejects_duplicate_ids(spark):
    """The exact/oracle path enforces the same unique-id contract as
    both LSH verify transports (review find: it silently emitted
    duplicate pairs)."""
    import pytest as _pytest

    from jsonschema_rs_spark.operators import similarity as sim

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id long, embedding array<double>")
    with _pytest.raises(ValueError, match="duplicate"):
        sim.near_duplicates_by_cosine(df, threshold=0.5, dim=2,
                                      exact=True).collect()


def test_lsh_flat_buckets_hot_bucket_star(spark):
    """minhash_lsh_candidates' flat membership pipeline (no per-bucket
    id arrays — the collect_set form materialized every member of a
    hot bucket into one row; review find): identical duplicate text
    over max_bucket forces the star path, and every member still
    reaches the min-id representative."""
    from jsonschema_rs_spark.operators import dedup as dd

    rows = [(f"d{i:03d}", "identical boilerplate text here") for i in range(12)]
    rows += [("x1", "some unique text one"), ("x2", "totally other words")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    pairs = dd.minhash_lsh_candidates(df, "text", "doc_id",
                                      num_hashes=16, bands=4,
                                      max_bucket=5).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # star pairs: representative d000 to every other duplicate
    expect = {("d000", f"d{i:03d}") for i in range(1, 12)}
    assert expect <= got
    # no pair may touch the unrelated docs
    assert not any("x1" in p or "x2" in p for p in got)
    # and the metrics see exactly one oversized bucket key space
    m = dd.lsh_bucket_metrics(df, "text", "doc_id", num_hashes=16,
                              bands=4, max_bucket=5).first()
    assert m["n_oversized"] >= 1
    assert m["max_bucket_size"] == 12


def test_dedup_exact_preserves_user_fp_column(spark):
    """dedup_exact keeps a caller's own 'fp' column intact (it used to
    overwrite then drop it; review find)."""
    from jsonschema_rs_spark.operators import dedup as dd

    df = spark.createDataFrame(
        [("a", "same text", "userfp1"), ("b", "same text", "userfp2"),
         ("c", "other text", "userfp3")],
        "doc_id string, text string, fp string")
    out = dd.dedup_exact(df, "text", "doc_id").collect()
    assert sorted(r["doc_id"] for r in out) == ["a", "c"]
    assert {r["fp"] for r in out} == {"userfp1", "userfp3"}


def test_format_anchors_reject_trailing_newline(spark):
    """Java `$` matches BEFORE one trailing line terminator, so every
    anchored rlike format accepted values with a trailing newline the
    reference parsers reject (review find, JVM-verified); anchors are
    now \\z. Also pins the ANSI CAST crash path: a newline-shifted time
    string no longer reaches the leap-second substring casts."""
    from jsonschema_rs_spark.compiler.variant import CompiledJsonSchema

    cases = [("ipv4", "1.2.3.4"), ("hostname", "example.com"),
             ("date", "2020-01-01"), ("time", "12:34:56+07:00"),
             ("date-time", "2020-01-01T12:34:56Z"),
             ("uuid", "123e4567-e89b-12d3-a456-426614174000"),
             ("uri", "https://example.com/a"),
             ("duration", "P1DT2H"),
             # (json-pointer is absent: RFC 6901 ALLOWS control chars
             # in reference tokens, so "/a/b\n" is genuinely valid)
             ("email", "user@example.com"),
             ("ipv6", "2001:db8::1")]
    for fmt, good in cases:
        comp = CompiledJsonSchema(
            {"format": fmt}, ValidationOptions(validate_formats=True))
        df = spark.createDataFrame(
            [(json.dumps(good),), (json.dumps(good + "\n"),),
             (json.dumps(good + "\r\n"),)], "doc string")
        got = [bool(r["valid"])
               for r in comp.with_validation(df, "doc").collect()]
        assert got == [True, False, False], fmt
    # content encodings too
    comp = CompiledJsonSchema({"contentEncoding": "base64"},
                              ValidationOptions())
    df = spark.createDataFrame([('"QQ=="',), ('"QQ==\\n"',)], "doc string")
    got = [bool(r["valid"])
           for r in comp.with_validation(df, "doc").collect()]
    assert got == [True, False]


def test_content_media_type_undecodable_encoding_annotation_only(spark):
    """application/json over an encoding the JVM cannot decode (custom
    or unknown) must not assert JSON on the still-ENCODED text (review
    find): annotation-only, so a row valid under both keywords stays
    valid."""
    from jsonschema_rs_spark.compiler.variant import CompiledJsonSchema

    qp = "=7B=22a=22=3A1=7D"  # quoted-printable-ish of {"a":1}

    def check_qp(v):
        return v.startswith("=7B")

    comp = CompiledJsonSchema(
        {"contentEncoding": "qp", "contentMediaType": "application/json"},
        ValidationOptions(custom_content_encodings={"qp": check_qp}))
    df = spark.createDataFrame([(json.dumps(qp),)], "doc string")
    assert [bool(r["valid"])
            for r in comp.with_validation(df, "doc").collect()] == [True]
    # the encoding assertion itself still fires
    df2 = spark.createDataFrame([(json.dumps("plain"),)], "doc string")
    assert [bool(r["valid"])
            for r in comp.with_validation(df2, "doc").collect()] == [False]


def test_format_regex_in_hof_clear_error():
    """format:'regex' inside a HOF applicator with
    ignore_unknown_formats=False raises a SchemaError naming the REAL
    constraint (no pandas UDF inside HOF lambdas), not a bogus
    'Unknown format' (review find)."""
    import pytest as _pytest

    from jsonschema_rs_spark.compiler.variant import CompiledJsonSchema
    from jsonschema_rs_spark.errors import SchemaError

    with _pytest.raises(SchemaError, match="array/object applicator"):
        CompiledJsonSchema(
            {"items": {"format": "regex"}},
            ValidationOptions(validate_formats=True,
                              ignore_unknown_formats=False))


def test_typed_unevaluated_coverage_through_refs(spark):
    """Typed unevaluated* coverage walks follow $ref (and honor dialect
    gating) like the variant walks (review find: a map column with
    properties behind a $ref was falsely rejected, and 2019-09 let a
    2020-12-only prefixItems claim index coverage)."""
    from pyspark.sql import types as T

    from jsonschema_rs_spark.compiler.compiler import compile_schema

    mdf = spark.createDataFrame(
        [({"a": 1},), ({"z": 1},)],
        T.StructType([T.StructField(
            "m", T.MapType(T.StringType(), T.LongType()))]))
    sch = {"type": "object", "properties": {"m": {
        "$ref": "#/$defs/base", "unevaluatedProperties": False}},
        "$defs": {"base": {"properties": {"a": True}}}}
    comp = compile_schema(sch, mdf.schema, ValidationOptions())
    assert [bool(r["valid"])
            for r in comp.with_validation(mdf).collect()] == [True, False]

    # struct + pattern with ECMA named group reaches Java semantics
    sdf = spark.createDataFrame(
        [((1,),)], T.StructType([T.StructField("s", T.StructType(
            [T.StructField("ab", T.LongType())]))]))
    sch2 = {"type": "object", "properties": {"s": {
        "patternProperties": {"(?<g>ab)": True},
        "unevaluatedProperties": False}}}
    comp2 = compile_schema(sch2, sdf.schema, ValidationOptions())
    assert [bool(r["valid"])
            for r in comp2.with_validation(sdf).collect()] == [True]

    # 2019-09 ignores prefixItems -> index 0 IS unevaluated
    adf = spark.createDataFrame(
        [([1],)], T.StructType([T.StructField(
            "a", T.ArrayType(T.LongType()))]))
    sch3 = {"type": "object", "properties": {"a": {
        "allOf": [{"prefixItems": [{"type": "integer"}]}],
        "unevaluatedItems": False}}}
    comp3 = compile_schema(sch3, adf.schema,
                           ValidationOptions(dialect="2019-09"))
    assert [bool(r["valid"])
            for r in comp3.with_validation(adf).collect()] == [False]


def test_output_units_review_fixes(spark):
    """Output v1 fidelity from the review sweep: numeric exclusive
    bounds get INDEPENDENT units (minimum:3 + exclusiveMinimum:5 vs 4
    used to blame 'minimum'); instanceLocation pointer-escapes property
    names; dynamic names with control characters stay valid JSON; and
    draft-4-7 additionalItems emits a unit for its failures."""
    from jsonschema_rs_spark.compiler.variant import CompiledJsonSchema

    def units(schema, doc, opts=None):
        comp = CompiledJsonSchema(schema, opts or ValidationOptions())
        df = spark.createDataFrame([(doc,)], "doc string")
        out = comp.with_output(df, "doc", format="list").collect()[0]
        return json.loads(out["output"])

    o = units({"minimum": 3, "exclusiveMinimum": 5}, "4")
    per = {u["evaluationPath"]: u["valid"] for u in o["details"]}
    assert per["/minimum"] is True
    assert per["/exclusiveMinimum"] is False

    o2 = units({"properties": {"a/b": {"type": "integer"}}},
               '{"a/b": "x"}')
    locs = {u["instanceLocation"] for u in o2["details"]}
    assert "/a~1b" in locs and "/a/b" not in locs

    o3 = units({"additionalProperties": {"type": "integer"}},
               json.dumps({"a\nb": 1}))  # parses = valid output JSON
    assert o3["valid"] is True

    o4 = units({"items": [{"type": "integer"}],
                "additionalItems": {"type": "string"}}, "[1, 2]",
               ValidationOptions(dialect="7"))
    per4 = {u["evaluationPath"]: u["valid"] for u in o4["details"]}
    assert o4["valid"] is False
    assert per4["/additionalItems"] is False
    assert per4["/items/0"] is True


def test_api_review_fixes(spark):
    """api/cli review sweep: the dynamic-JSON path REFUSES keywords=
    (the Column-factory contract needs a dtype; they were silently
    skipped, validating violating instances); error kinds reconstruct
    through same-document $ref; unexpected-property names unescape
    pointer tokens."""
    import pytest as _pytest

    import jsonschema_rs_spark as jrs
    from jsonschema_rs_spark.errors import SchemaError

    with _pytest.raises(SchemaError, match="typed compiler"):
        jrs.is_valid({"type": "array", "x-k": 1}, [1],
                     keywords={"x-k": lambda *a: None})

    errs = list(jrs.iter_errors(
        {"properties": {"a": {"$ref": "#/$defs/lim"}},
         "$defs": {"lim": {"minimum": 3}}}, {"a": 1}))
    assert errs and errs[0].kind.__class__.__name__ == "Minimum"
    assert errs[0].kind.limit == 3

    # unescape check goes through _ptr_value-level units; the
    # engine's additionalProperties error carries a root path here, so
    # exercise the unescape on the kind helper directly
    from jsonschema_rs_spark.api import _kind_for
    kind = _kind_for({"additionalProperties": False},
                     "additionalProperties", "/additionalProperties",
                     "/a~1b", "additional properties not allowed")
    assert kind.unexpected == ["a/b"]


def test_cli_schema_only_catches_broken_refs(tmp_path, capsys):
    """Schema-only mode reports invalid for unresolvable refs like the
    reference CLI (it used to print 'Schema is valid' — review find;
    pattern compilability is JVM-only and stays an instance-mode
    check)."""
    import json as _json

    from jsonschema_rs_spark.cli import main

    p = tmp_path / "s.json"
    p.write_text(_json.dumps({"$ref": "#/nowhere"}))
    rc = main([str(p)])
    assert rc == 1
    assert "Schema is invalid" in capsys.readouterr().out
    good = tmp_path / "g.json"
    good.write_text(_json.dumps({"type": "object"}))
    assert main([str(good)]) == 0
