"""ECMA-262 regex → Java regex translation, with a literal-prefix fast path.

JSON Schema `pattern` / `patternProperties` use ECMA-262 semantics in
*search* (unanchored) mode. Spark's `rlike` is Java-regex search — close,
but a few constructs differ. The reference does the analogous ECMA→Rust
translation in crates/jsonschema/src/ecma.rs:11-60 and an anchored-literal
prefix specialization in keywords/pattern.rs:16 (PrefixPatternValidator);
we translate to Java and detect the same `^literal` prefix so the plan can
use `startswith` (codegen'd string compare) instead of a regex.

Differences handled:
- `$` in ECMA (no flags) matches ONLY at end of input; Java `$` also
  matches before a trailing line terminator → rewrite bare `$` to `\\z`.
- `^` likewise → `\\A` (Java default `^` is begin-of-input, but keeping it
  explicit is harmless and protects against MULTILINE embedding).
- `\\cX` control escapes exist in both Java and ECMA — passed through.
- `\\d \\w \\s` are ASCII-only in both (Java without UNICODE_CHARACTER_CLASS).
- ECMA allows an unescaped `/` and `]` outside classes — both fine in Java.
- Lookahead/lookbehind/backrefs are supported by Java natively (the
  reference needs fancy-regex for those: options.rs:769-875).

Not translated (documented gaps, exceedingly rare in schemas): `\\uXXXX`
surrogate-pair quirks.
"""

from __future__ import annotations


def ecma_to_java(pattern: str) -> str:
    """Translate an ECMA-262 pattern to an equivalent Java regex."""
    out: list[str] = []
    i = 0
    in_class = False
    n = len(pattern)
    while i < n:
        ch = pattern[i]
        if ch == "\\" and i + 1 < n:
            out.append(pattern[i : i + 2])
            i += 2
            continue
        if in_class:
            if ch == "]":
                in_class = False
            out.append(ch)
            i += 1
            continue
        if ch == "[":
            in_class = True
            out.append(ch)
        elif ch == "$":
            out.append(r"\z")
        elif ch == "^":
            # begin-of-input anchor (identical default behavior; explicit \A
            # only when at pattern start — mid-pattern ^ inside groups keeps
            # its meaning and Java treats it the same without MULTILINE)
            out.append(r"\A" if i == 0 else "^")
        else:
            out.append(ch)
        i += 1
    return "".join(out)


_META = set(".^$*+?()[]{}|\\")


def literal_prefix(pattern: str) -> str | None:
    """If `pattern` is `^<literal>` (optionally followed by nothing or `.*`),
    return the literal so callers can use startswith. Else None.

    Mirrors CompiledPattern::Prefix (reference: src/properties.rs:17-24).
    """
    if not pattern.startswith("^"):
        return None
    body = pattern[1:]
    if body.endswith(".*"):
        body = body[:-2]
    lit: list[str] = []
    i = 0
    while i < len(body):
        ch = body[i]
        if ch == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            if nxt in _META:  # escaped metachar is a literal char
                lit.append(nxt)
                i += 2
                continue
            return None  # \d, \w, ... — not a literal
        if ch in _META:
            return None
        lit.append(ch)
        i += 1
    return "".join(lit) if lit else None


def nonlinear_construct(pattern: str) -> str | None:
    """The first lookaround / backreference construct in `pattern`, or
    None when the pattern is expressible in a linear-time engine.

    Mirrors what the reference's regex-crate engine rejects at BUILD
    time under PatternOptions::regex() (options.rs:850-876): look-ahead
    `(?=` `(?!`, look-behind `(?<=` `(?<!`, numbered backreferences
    `\\1`..`\\9`, and named backreferences `\\k<name>`. Escapes and
    character classes are skipped the same way ecma_to_java scans."""
    i, n = 0, len(pattern)
    in_class = False
    while i < n:
        ch = pattern[i]
        if ch == "\\" and i + 1 < n:
            nxt = pattern[i + 1]
            if not in_class and nxt.isdigit() and nxt != "0":
                return f"\\{nxt} (backreference)"
            if not in_class and nxt == "k" and i + 2 < n \
                    and pattern[i + 2] == "<":
                return "\\k<...> (named backreference)"
            i += 2
            continue
        if in_class:
            if ch == "]":
                in_class = False
            i += 1
            continue
        if ch == "[":
            in_class = True
        elif ch == "(" and pattern.startswith("(?", i):
            head = pattern[i:i + 4]
            if head.startswith("(?=") or head.startswith("(?!"):
                return head[:3] + " (lookahead)"
            if head.startswith("(?<=") or head.startswith("(?<!"):
                return head + " (lookbehind)"
        i += 1
    return None
