"""Text-analysis operators for training-data pipelines.

All pure Column expressions (JVM-side, whole-stage codegen) — no Python on
the executors. Each operator is deliberately expressible in ANSI SQL so the
DuckDB oracle can verify it bit-for-bit (see __spark_entry__.py).

Operators:
- tokenization / token counts (whitespace + a BPE-ish word/punct regex)
- language ID (stopword-marker n-gram heuristic over a fixed marker table)
- quality scoring (length / punctuation / stopword / repetition ratios)
- document fingerprinting (normalized-token hash; basis for exact dedup)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: word pieces OR single non-space-non-word chars —
# close to the GPT-2 pre-tokenizer's effect at the granularity that matters
# for counting.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny per-language marker lexicons (function words). The heuristic scores
# each language by marker occurrences per token and picks the argmax —
# deterministic, SQL-expressible, and good enough to route documents; a
# real pipeline would swap in fastText via mapInPandas (see multimodal.py
# for the gated-dependency pattern).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "los", "las", "es", "y"],
    "fr": ["le", "la", "les", "et", "est", "des"],
    "de": ["der", "die", "das", "und", "ist"],
}

STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def ws_token_count(text: Column) -> Column:
    """Whitespace token count; 0 for empty/blank strings."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish pre-tokens (regexp_count is JVM-side)."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE))


def _marker_hits(text_lower: Column, markers: list[str]) -> Column:
    # \b word-boundary counts per marker, summed. regexp_count compiles
    # the pattern once per task.
    pattern = r"\b(" + "|".join(markers) + r")\b"
    return F.regexp_count(text_lower, F.lit(pattern))


def lang_id(text: Column, min_hits: int = 1) -> Column:
    """Argmax language over marker-hit counts; 'und' when no language
    reaches min_hits. Ties break by language-code order (deterministic)."""
    low = F.lower(text)
    scored = [
        F.struct(
            _marker_hits(low, m).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, m in sorted(LANG_MARKERS.items())
    ]
    # array_max over structs orders by first field (hits) then lang — to
    # make ties pick the FIRST language alphabetically we invert: take max
    # of (hits, reversed-lang) … simpler: sort desc by hits asc by lang via
    # a single reduce with explicit comparison.
    best = F.aggregate(
        F.array(*scored),
        F.struct(F.lit(-1).alias("hits"), F.lit("und").alias("lang")),
        lambda acc, x: F.when(x["hits"] > acc["hits"], x).otherwise(acc),
    )
    return F.when(best["hits"] >= min_hits, best["lang"]).otherwise(F.lit("und"))


def quality_features(text: Column) -> dict[str, Column]:
    """Per-document quality features, each a single Column expression."""
    n_chars = F.length(text)
    n_tokens = ws_token_count(text)
    n_punct = F.regexp_count(text, F.lit(r"[^\w\s]"))
    n_digits = F.regexp_count(text, F.lit(r"[0-9]"))
    n_stop = _marker_hits(F.lower(text), STOPWORDS)
    safe_tok = F.greatest(n_tokens, F.lit(1))
    safe_chr = F.greatest(n_chars, F.lit(1))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": (n_chars - (n_tokens - 1)) / safe_tok,
        "punct_ratio": n_punct / safe_chr,
        "digit_ratio": n_digits / safe_chr,
        "stopword_ratio": n_stop / safe_tok,
    }


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality score — a linear gate stack like public
    web-corpus filters (C4/Gopher rules): penalize too-short docs, high
    punctuation/digit density, and stopword-free (non-linguistic) text."""
    f = quality_features(text)
    score = (
        F.lit(1.0)
        - F.when(f["n_tokens"] < 5, 0.4).otherwise(0.0)
        - F.when(f["punct_ratio"] > 0.2, 0.2).otherwise(0.0)
        - F.when(f["digit_ratio"] > 0.3, 0.2).otherwise(0.0)
        - F.when(f["stopword_ratio"] < 0.05, 0.2).otherwise(0.0)
    )
    # NULL text scores 0.0, not a vacuous 1.0 (every penalty gate's
    # NULL comparison fell into .otherwise(0.0), so null documents
    # sailed through quality filters as perfect — review find); the
    # DuckDB oracle template carries the same clause
    return F.when(text.isNull(), F.lit(0.0)) \
        .otherwise(F.greatest(score, F.lit(0.0)))


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, strip punctuation,
    collapse whitespace."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[^a-z0-9\s]", " ")
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return t


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of the normalized text. md5 (not xxhash64)
    so external systems — and the DuckDB oracle — reproduce it exactly."""
    return F.md5(normalize_text(text))


def sorted_token_fingerprint(text: Column) -> Column:
    """Order-insensitive fingerprint (bag-of-words): md5 over the SORTED
    normalized tokens — catches shuffled near-duplicates."""
    toks = F.split(normalize_text(text), " ")
    return F.md5(F.array_join(F.array_sort(toks), " "))


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """documents table → + token counts, lang, quality, fingerprint.

    STAGED: base counts (regex scans, token splits, marker hits) are
    materialized in one projection, derived features (ratios, argmax
    lang, quality gates) reference them in a second — each regex runs
    exactly once per row instead of once per consuming feature
    (projection staging is the CSE mechanism that works with Spark's
    interpreted expressions; Catalyst won't collapse projections when it
    would duplicate expensive expressions)."""
    t = F.col(text_col)
    low = F.lower(t)
    langs = sorted(LANG_MARKERS)
    staged = df.select(
        "*",
        F.length(t).alias("__n_chars"),
        ws_token_count(t).alias("__n_tok"),
        bpe_token_count(t).alias("__n_bpe"),
        F.regexp_count(t, F.lit(r"[^\w\s]")).alias("__n_punct"),
        F.regexp_count(t, F.lit(r"[0-9]")).alias("__n_digit"),
        _marker_hits(low, STOPWORDS).alias("__n_stop"),
        *[_marker_hits(low, LANG_MARKERS[lang]).alias(f"__h_{lang}")
          for lang in langs],
        normalize_text(t).alias("__norm"),
    )
    hits = [F.col(f"__h_{lang}") for lang in langs]
    m = F.greatest(*hits)
    lang_pred = F.when(m < 1, F.lit("und"))
    for lang, h in zip(langs, hits):
        lang_pred = lang_pred.when(h == m, F.lit(lang))
    # NULL text (all hits NULL -> every branch NULL) classifies 'und'
    # like lang_id() does, instead of a silent NULL (review find)
    lang_pred = lang_pred.otherwise(F.lit("und"))
    safe_tok = F.greatest(F.col("__n_tok"), F.lit(1))
    safe_chr = F.greatest(F.col("__n_chars"), F.lit(1))
    punct_ratio = F.col("__n_punct") / safe_chr
    digit_ratio = F.col("__n_digit") / safe_chr
    stop_ratio = F.col("__n_stop") / safe_tok
    quality = F.when(t.isNull(), F.lit(0.0)).otherwise(F.greatest(
        F.lit(1.0)
        - F.when(F.col("__n_tok") < 5, 0.4).otherwise(0.0)
        - F.when(punct_ratio > 0.2, 0.2).otherwise(0.0)
        - F.when(digit_ratio > 0.3, 0.2).otherwise(0.0)
        - F.when(stop_ratio < 0.05, 0.2).otherwise(0.0),
        F.lit(0.0)))
    out = staged.select(
        *df.columns,
        F.col("__n_tok").alias("n_tokens_ws"),
        F.col("__n_bpe").alias("n_tokens_bpe"),
        lang_pred.alias("lang_pred"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        quality.alias("quality"),
        F.md5(F.col("__norm")).alias("fp"),
    )
    return out
