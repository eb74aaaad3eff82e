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
    ("something unrelated", None),
])
def test_required_kind_property_extraction(message, want):
    from jsonschema_rs_spark.api import _kind_for
    kind = _kind_for({"required": ["z"]}, "required",
                     "/required", "", message)
    assert kind.property == want


def test_depth_memo_key_covers_email_and_pattern_options():
    schema = {"type": "string", "format": "email"}
    base = ValidationOptions()
    with_email = ValidationOptions(
        email_options=EmailOptions(require_tld=True))
    k1 = _depth_memo_key(schema, base)
    k2 = _depth_memo_key(schema, with_email)
    assert k1 is not None and k2 is not None and k1 != k2
