"""Error types and validation options.

Mirrors the reference's ValidationOptions (crates/jsonschema/src/options.rs:21-39)
and SchemaError-style compile failures (crates/jsonschema/src/error.rs).
The executor regex engine is always java.util.regex, but PatternOptions
still offers the reference's engine CHOICE as a compile-time contract:
the linear-engine variant rejects the constructs the regex crate can't
build (lookaround/backrefs), so accepted schemas run linear-time on any
engine. Draft selection covers 4/6/7/2019-09/2020-12 via `dialect`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

# unroll depth used when ValidationOptions.max_ref_depth is None (auto)
DEFAULT_REF_DEPTH = 8


def resolved_ref_depth(options: "ValidationOptions") -> int:
    """The unroll depth a compile starts from (auto → DEFAULT_REF_DEPTH)."""
    d = options.max_ref_depth
    return DEFAULT_REF_DEPTH if d is None else d


class SchemaError(ValueError):
    """Raised when a schema/spec fails meta-validation or compilation.

    Analog of the reference rejecting invalid schemas before compilation
    (crates/jsonschema/src/compiler.rs:714-717, 805-823).
    """

    def __init__(self, message: str, schema_path: str = ""):
        super().__init__(f"{schema_path or '<root>'}: {message}")
        self.schema_path = schema_path
        self.message = message


class ReferencingError(SchemaError):
    """$ref-resolution failure — the jsonschema-py `ReferencingError`
    analog (__init__.pyi:212-213; the referencing crate's Error
    surfaced through validator builds). Subclasses SchemaError so
    existing compile-failure handling is unchanged; `message` carries
    the unresolved-URI detail."""


@dataclass(frozen=True)
class HttpOptions:
    """Import/signature parity with the reference's HttpOptions
    (jsonschema-py __init__.pyi:101-116; http.rs) — configuration for
    the HTTP client the reference uses to fetch remote $refs. This
    engine performs NO network I/O (a documented non-goal: external
    documents are supplied via `resources=` or a `retriever=`
    callable), so passing an HttpOptions to validator_for raises a
    SchemaError naming those alternatives instead of silently ignoring
    the requested behavior."""

    timeout: "float | None" = None
    connect_timeout: "float | None" = None
    tls_verify: bool = True
    ca_cert: "str | None" = None


@dataclass(frozen=True)
class EmailOptions:
    """`format: email` / `format: idn-email` knobs — the analog of the
    reference's EmailOptions over the email_address crate
    (options.rs:926-1113; format.rs:510-545 is_valid_email_impl).

    Defaults mirror EmailAddress::from_str (the no-options reference
    path, pinned by format.rs's email_options_backward_compatibility
    test): single-segment domains like `user@localhost` are valid,
    domain literals `user@[127.0.0.1]` / `user@[IPv6:2001:db8::1]` are
    valid when the bracketed address parses as an IP (the reference
    post-checks the literal with the std parser), and display text
    `Name <user@example.com>` is rejected.

    The reference's builder methods map to constructor args or the
    chainable helpers below (each returns a NEW instance, dataclass-
    frozen like the reference's consuming builders)."""

    # minimum dot-separated domain segments (with_minimum_sub_domains);
    # 0 = no minimum (with_no_minimum_sub_domains); 2 = require a TLD
    # (with_required_tld). None = unset — require_tld decides. An
    # explicit value ALWAYS wins over require_tld: the crate has one
    # underlying field (require_tld is just min=2) and the py binding
    # applies minimum_sub_domains AFTER require_tld (lib.rs:974-982).
    minimum_sub_domains: Optional[int] = None
    # accept bracketed IP domains (with_domain_literal /
    # without_domain_literal)
    allow_domain_literal: bool = True
    # accept `Display Name <addr>` (with_display_text); reference
    # default: off
    allow_display_text: bool = False
    # jsonschema-py constructor parity (__init__.pyi EmailOptions:
    # require_tld=False): equivalent to minimum_sub_domains >= 2
    require_tld: bool = False

    @property
    def effective_minimum_sub_domains(self) -> int:
        if self.minimum_sub_domains is not None:
            return int(self.minimum_sub_domains)
        return 2 if self.require_tld else 0

    def with_minimum_sub_domains(self, n: int) -> "EmailOptions":
        # Last-call-wins like the reference's consuming builder: the
        # crate's single underlying field means an explicit minimum
        # replaces a prior with_required_tld()/require_tld=True.
        from dataclasses import replace
        return replace(self, minimum_sub_domains=int(n),
                       require_tld=False)

    def with_no_minimum_sub_domains(self) -> "EmailOptions":
        return self.with_minimum_sub_domains(0)

    def with_required_tld(self) -> "EmailOptions":
        # the crate's with_required_tld IS with_minimum_sub_domains(2)
        from dataclasses import replace
        return replace(self, minimum_sub_domains=2, require_tld=True)

    def with_domain_literal(self) -> "EmailOptions":
        from dataclasses import replace
        return replace(self, allow_domain_literal=True)

    def without_domain_literal(self) -> "EmailOptions":
        from dataclasses import replace
        return replace(self, allow_domain_literal=False)

    def with_display_text(self) -> "EmailOptions":
        from dataclasses import replace
        return replace(self, allow_display_text=True)

    def without_display_text(self) -> "EmailOptions":
        from dataclasses import replace
        return replace(self, allow_display_text=False)


@dataclass(frozen=True)
class PatternOptions:
    """`pattern` / `patternProperties` regex-engine choice — the analog
    of the reference's PatternOptions (options.rs:647-876).

    The reference picks between fancy-regex (backtracking: lookaround +
    backreferences, bounded by backtrack_limit) and the regex crate
    (linear-time DFA: those constructs are BUILD errors). On Spark the
    executor engine is always java.util.regex (backtracking, lookaround
    + backrefs supported natively), so:

    - engine="backtracking" (default, the fancy_regex() analog): every
      translated ECMA construct is allowed.
    - engine="linear" (the regex() analog): schemas whose patterns use
      lookaround or backreferences fail compilation with SchemaError —
      the same patterns the regex crate rejects at build time
      (options.rs:850-876) — guaranteeing every accepted pattern runs
      in linear time on any engine.

    backtrack_limit / size_limit / dfa_size_limit are accepted for API
    compatibility but are advisory no-ops: java.util.regex exposes no
    runtime resource knobs, and the reference's limits bound resource
    usage, not match semantics."""

    engine: str = "backtracking"
    backtrack_limit: int | None = None
    size_limit: int | None = None
    dfa_size_limit: int | None = None

    @staticmethod
    def fancy_regex() -> "PatternOptions":
        return PatternOptions(engine="backtracking")

    @staticmethod
    def regex() -> "PatternOptions":
        return PatternOptions(engine="linear")

    def with_backtrack_limit(self, n: int) -> "PatternOptions":
        from dataclasses import replace
        return replace(self, backtrack_limit=int(n))

    def with_size_limit(self, n: int) -> "PatternOptions":
        from dataclasses import replace
        return replace(self, size_limit=int(n))

    def with_dfa_size_limit(self, n: int) -> "PatternOptions":
        from dataclasses import replace
        return replace(self, dfa_size_limit=int(n))


@dataclass
class ValidationOptions:
    """Compile-time switches.

    - validate_formats: None (default) = the reference's draft-based
      default (compiler.rs:271-276 validates_formats_by_default): drafts
      4/6/7 ASSERT `format`, 2019-09/2020-12/permissive treat it as an
      annotation. True/False force it on/off regardless of draft.
    - mask: replace instance values in messages with a placeholder, like
      the reference's masked error messages (error.rs:496+). Our default
      messages never embed instance values, so masking is the default-safe
      behavior; mask=None keeps static messages.
    - max_ref_depth: recursive $ref schemas are depth-unrolled at compile
      time (Spark expressions cannot recurse); documents have bounded depth.
      None (the default) = AUTO: unroll at DEFAULT_REF_DEPTH (8), then, if
      the compiled expression would exceed whole-stage-codegen method
      limits (Janino's 64 KB → interpreter fallback), re-unroll at the
      deepest smaller depth that stays inside codegen (variant.py
      CompiledJsonSchema). An explicit integer is always honored verbatim,
      codegen fallback or not.
    - draft4_integer: draft-4 `1.0 is not an integer` semantics
      (keywords/legacy/type_draft_4.rs:91-155). Default: 2020-12 (float with
      zero fraction IS an integer). TYPED PATH ONLY: the variant path
      cannot honor it because Spark's JSON parser normalizes the lexical
      form away ('1.0' parses to DECIMAL(1,0), indistinguishable from
      '1').
    """

    validate_formats: bool | None = None
    # JSON Schema draft dialect: "4" | "6" | "7" | "2019-09" | "2020-12"
    # | "permissive" | None. None → auto-detect from the root `$schema`
    # URI, falling back to "permissive" (the historical default: the
    # 2020-12 keyword set plus legacy compat forms all active). See
    # compiler/dialects.py (reference keywords/mod.rs:254-510
    # get_for_draft; referencing specification/mod.rs:54 detection).
    dialect: str | None = None
    mask: str | None = None
    # reference-style messages that EMBED the failing instance value
    # ('"oops" is not of type...', error.rs message rendering). Default
    # False: static templates that never touch the data. mask (above)
    # takes precedence: with mask set, messages lead with the placeholder
    # instead of the value — the masked_with analog (error.rs:496-516).
    message_values: bool = False
    max_ref_depth: int | None = None
    # what happens when an instance reaches BEYOND the compiled unroll
    # depth of a recursive $ref (the engine's one structural deviation
    # from the reference's runtime cycle handling, validator.rs:34-52):
    # - "annotate" (default): validity keeps the spec's vacuous-true for
    #   the unchecked tail, but the plan carries a second, strict
    #   valid tree and with_validation() appends a `depth_exhausted`
    #   boolean = (lenient verdict != strict verdict), i.e. "this row's
    #   pass/fail verdict is NOT determined by the checked portion of
    #   the document". Schemas that never exhaust (including every
    #   non-recursive schema) compile exactly as before and append
    #   nothing.
    # - "fail": beyond-unroll content fails its sub-schema — a present
    #   value at an exhausted site emits a '$ref' error row
    #   "maximum evaluation depth exceeded" and flags the row invalid
    #   (conservative: never silently accepts unchecked content; note
    #   that under `not`/`oneOf` the polarity inverts like any failing
    #   sub-schema would).
    # - "ignore": the pre-round-5 behavior (silent vacuous-true).
    # - "exact": beyond-unroll rows are RE-VALIDATED by the runtime-
    #   recursive exact kernel (python-jsonschema — the suite's
    #   standing oracle; it recurses at runtime with no depth limit,
    #   the analog of the reference's validator recursion,
    #   validator.rs:34-52) and the kernel verdict replaces the plan's
    #   vacuous-true. The gate is the same JVM-side exhaustion signal
    #   "annotate" exposes, so in-unroll rows never leave the Column
    #   plan; one extra gated Arrow crossing, only on schemas that can
    #   exhaust. Kernel-invalid rows carry a distinguished '$ref'
    #   error row. Refused (SchemaError) with custom_keywords/
    #   custom_formats/custom content handlers/the multipleOf
    #   reference quirk — same scope rule as on_precision_loss='exact'.
    on_depth_exhausted: str = "annotate"
    # what happens when a document contains a NUMBER token the variant
    # parser stores inexactly (any exponent form or >38-digit/-scale
    # literal becomes a DOUBLE; the reference crate validates such
    # numbers with arbitrary precision — lib.rs:769-792,
    # ext/numeric.rs:89-110 — so verdicts on those rows may diverge):
    # - "ignore" (default): pre-existing behavior — the number is
    #   validated as its nearest double, like serde_json without
    #   arbitrary_precision.
    # - "annotate": with_validation() appends a `precision_degraded`
    #   boolean (True = this row contains >=1 inexactly-stored number,
    #   i.e. its verdict may not match an exact-arithmetic validator).
    # - "fail": degraded rows are flagged invalid with a 'number' error
    #   row — conservative: never silently validates against a lossy
    #   value. Variant (JSON-string) path only; typed columns carry
    #   their own exact types. functions/precision.py has the storage
    #   rule, pinned against try_parse_json in test_round5_fixes.
    # - "exact": degraded rows are RE-VALIDATED with exact arithmetic
    #   (raw-token parse: arbitrary-precision ints, Decimal fractions;
    #   python-jsonschema kernel — the suite's standing oracle) and the
    #   exact verdict replaces the plan's double-view verdict: the
    #   engine analog of the reference's BigInt/BigFraction feature
    #   domain (lib.rs:769-792, ext/numeric.rs:89-110). One extra
    #   JVM-prefiltered Arrow crossing; clean rows stay on the pure
    #   Column plan. Refused (SchemaError) with custom_keywords/
    #   custom_formats/custom content handlers/the multipleOf reference
    #   quirk — the kernel decides by spec semantics and must not drop
    #   a custom assertion on exactly the rows the mode exists to fix.
    on_precision_loss: str = "ignore"
    draft4_integer: bool = False
    # UNUSED since round 3: multipleOf is decided by the exact rational
    # kernel (functions/numerics.py) on every path; kept so existing
    # callers constructing options with this field don't break
    float_multiple_rel_tol: float = 1e-9
    # "spec" (default): multipleOf judges negative values by exact
    # rational divisibility, like python-jsonschema and the written
    # spec. "reference": pin migration parity with the reference
    # crate's float validator, which fast-bails `value < multiple ->
    # false` for positive FRACTIONAL divisors and so rejects every
    # negative value (ext/numeric.rs:62-86 is_multiple_of_float) —
    # a deliberate, documented reference quirk.
    multiple_of_semantics: str = "spec"
    custom_keywords: dict = field(default_factory=dict)
    custom_formats: dict = field(default_factory=dict)
    # str -> bool callables keyed by encoding/media-type name, batched
    # through Arrow pandas UDFs — the analog of the reference's
    # with_content_encoding / with_content_media_type
    # (options.rs:138-243); custom entries override the built-ins
    custom_content_encodings: dict = field(default_factory=dict)
    custom_content_media_types: dict = field(default_factory=dict)
    # absolute URI -> schema document: extra documents $ref can target —
    # the OFFLINE analog of the reference's referencing::Registry /
    # with_retriever (retriever.rs). No network is ever touched; a URI
    # not present here (or embedded via $id) fails compilation.
    resources: dict = field(default_factory=dict)
    # callable (absolute URI) -> schema document, consulted at COMPILE
    # time for URIs not in `resources` — the direct analog of the
    # reference's Retriever trait (retriever.rs; jsonschema-py
    # `retriever=` kwarg). The engine itself never performs I/O: the
    # callable decides where documents come from (a dict, a file tree,
    # an artifact store...). Raising (or returning a non-schema) turns
    # into a SchemaError naming the URI. Retrieved documents register
    # like resources: their $ids, anchors and nested resources all walk.
    retriever: object = None
    # external base URI that a RELATIVE root `$id` (and every relative
    # `$ref`/`$id` below it) resolves against — the with_base_uri analog
    # (options.rs:273-299) for schemas loaded without an inherent base
    # URL. None (default): the root's own `$id` (or "") is the base.
    base_uri: str | None = None
    # `format: email` / `format: idn-email` behavior — the with_email_options
    # analog (options.rs:671-693). None = EmailOptions() defaults (the
    # reference's no-options EmailAddress::from_str path — same semantics).
    email_options: "EmailOptions | None" = None
    # regex-engine choice for `pattern`/`patternProperties` — the
    # with_pattern_options analog (options.rs:647-876). None =
    # backtracking (the fancy_regex default). PatternOptions.regex()
    # rejects lookaround/backreferences at compile time.
    pattern_options: "PatternOptions | None" = None
    # False -> an asserted `format` name with no built-in or custom
    # checker is a COMPILE error (reference should_ignore_unknown_formats,
    # options.rs:434-440). True (default, like the reference): unknown
    # formats are annotations.
    ignore_unknown_formats: bool = True
