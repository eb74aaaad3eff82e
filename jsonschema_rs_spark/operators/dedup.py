"""Deduplication operators for training-data pipelines at 100 TB scale.

Five families, all shuffle-disciplined:

- exact: md5-fingerprint groupBy (map-side combine; shuffle carries
  (hash, count) pairs only)
- n-gram Jaccard: shingle-explode + self-join on shingle, Jaccard from
  co-occurrence counts — exact but O(pairs sharing a shingle); used to
  VERIFY candidates, not to generate them at scale
- MinHash + LSH: per-doc signature (one projection, no shuffle), banded
  bucket keys, groupBy band → candidate pairs (shuffle carries only
  (band_key, doc_id)); hot buckets capped explicitly (skew guard)
- SimHash: 32-bit sign-of-weighted-sum signature as one projection;
  near-dups = pairs within hamming distance h via bucket-join on
  signature chunks (pigeonhole)
- embedding cosine: see similarity.py (near_duplicates_by_cosine)

Hash discipline: md5 everywhere (not xxhash64) so signatures are
reproducible by ANY engine — the DuckDB oracle in __spark_entry__.py
re-derives identical signatures from SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jsonschema_rs_spark.operators.text_analysis import normalize_text

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_duplicate_groups(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id",
                           normalized: bool = True) -> DataFrame:
    """Groups of byte-identical (or normalized-identical) documents:
    (fp, n_docs, doc_ids sorted). collect_list is safe here because group
    size is bounded by duplication multiplicity, not table size; at true
    scale emit (fp, doc_id, is_keeper) instead via a window min."""
    t = F.col(text_col)
    fp = F.md5(normalize_text(t) if normalized else t)
    return (
        df.select(fp.alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.array_sort(F.collect_list(id_col)).alias("doc_ids"))
        .where(F.col("n_docs") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep one representative per fingerprint (min id): scalable form —
    a window-free two-phase agg, shuffle carries (fp, min_id) only."""
    fp = F.md5(normalize_text(F.col(text_col)))
    keepers = (
        df.select(fp.alias("fp"), F.col(id_col).alias("__id"))
        .groupBy("fp").agg(F.min("__id").alias("__keep"))
    )
    return (
        df.withColumn("fp", fp)
        .join(keepers, "fp", "inner")
        .where(F.col(id_col) == F.col("__keep"))
        .drop("__keep", "fp")
    )


# ---------------------------------------------------------------------------
# shingles
# ---------------------------------------------------------------------------


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams of the normalized text (array<string>).
    Documents with fewer than n tokens yield a single shingle of the whole
    text so they can still collide with exact near-copies."""
    toks = F.split(normalize_text(text), " ")
    k = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.array_distinct(grams)


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact pairwise over shingle co-occurrence)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.8,
                        max_shingle_freq: int = 1000) -> DataFrame:
    """All pairs (a < b) with Jaccard(shingles_a, shingles_b) >= threshold.

    Plan: explode distinct shingles → drop shingles shared by more than
    max_shingle_freq docs (stopword-shingle skew guard: a shingle in k docs
    produces k^2 pairs) → self-join on shingle → count common → Jaccard
    from |A|+|B|-common. Exact; cost bounded by co-occurrence, so at 100 TB
    this runs AFTER MinHash-LSH candidate generation, not instead of it.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.size(word_shingles(F.col(text_col), n)).alias("n_sh"),
        F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
    )
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("f"))
    sh = sh.join(F.broadcast(freq.where(F.col("f") > max_shingle_freq)
                             .select("shingle")), "shingle", "left_anti")
    a = sh.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"),
                  "shingle")
    b = sh.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"),
                  "shingle")
    common = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    return (
        common.select("id_a", "id_b",
                      F.round(jac, 6).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(text: Column, num_hashes: int = 16, n: int = 3) -> Column:
    """array<string> of per-seed minima: sig[i] = min over shingles of
    md5(i || '|' || shingle). Min over md5 hex strings is a valid uniform
    min-hash (lexicographic order on a uniform 128-bit hash). One
    projection, no shuffle, reproducible in any engine with md5."""
    sh = word_shingles(text, n)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(i.cast("string"),
                                                     F.lit("|"), s)))
        ),
    )


def lsh_band_keys(sig: Column, bands: int, rows_per_band: int) -> Column:
    """array<string> of band bucket keys: md5(band_idx || joined rows)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.md5(F.concat(
            b.cast("string"), F.lit("#"),
            F.array_join(F.slice(sig, b * rows_per_band + 1, rows_per_band),
                         ","))),
    )


def minhash_lsh_candidates(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id",
                           num_hashes: int = 16, bands: int = 4,
                           n: int = 3,
                           max_bucket: int = 500) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    (sig → band keys) is one projection; explode(band keys) shuffles only
    (band_key, doc_id); groupBy band_key with a size cap bounds the skew
    of degenerate buckets (e.g. empty docs). Pairs are emitted from the
    collected bucket — bucket sizes are tiny by construction (cap logged
    at call sites). Probability a pair with Jaccard j collides:
    1 - (1 - j^r)^b with r = num_hashes/bands.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signature(F.col(text_col), num_hashes, n)
    keys = lsh_band_keys(sig, bands, rows_per_band)
    exploded = df.select(F.col(id_col).alias("id"),
                         F.explode(keys).alias("band_key"))
    buckets = (
        exploded.groupBy("band_key")
        .agg(F.array_sort(F.collect_set("id")).alias("ids"))
        .where((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
    )
    # pairs within bucket: posexplode twice via index sequences
    pairs = buckets.select(
        F.explode(
            F.flatten(F.transform(
                F.sequence(F.lit(1), F.size("ids") - 1),
                lambda i: F.transform(
                    F.sequence(i + 1, F.size("ids")),
                    lambda j: F.struct(
                        F.element_at(F.col("ids"), i).alias("id_a"),
                        F.element_at(F.col("ids"), j).alias("id_b"),
                    ),
                ),
            ))
        ).alias("p")
    ).select("p.id_a", "p.id_b").dropDuplicates()
    return pairs


def minhash_near_duplicates(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id",
                            num_hashes: int = 16, bands: int = 4,
                            n: int = 3, threshold: float = 0.7) -> DataFrame:
    """LSH candidates verified by exact Jaccard (the standard two-stage
    pipeline: cheap recall then exact precision on the tiny candidate set).
    """
    cand = minhash_lsh_candidates(df, text_col, id_col, num_hashes, bands, n)
    sides = df.select(F.col(id_col).alias("id"),
                      word_shingles(F.col(text_col), n).alias("sh"))
    a = sides.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sides.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    j = (
        cand.join(a, "id_a").join(b, "id_b")
        .select(
            "id_a", "id_b",
            (F.size(F.array_intersect("sh_a", "sh_b")) /
             F.size(F.array_union("sh_a", "sh_b"))).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return j.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


def simhash(text: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash signature as a bigint: bit j is the sign of the sum over
    tokens of (token_hash bit j ? +1 : -1). Token hash = first 8 hex chars
    of md5 (32 bits) — engine-portable. One projection, no shuffle."""
    toks = F.split(normalize_text(text), " ")
    th = F.transform(toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8),
                                            16, 10).cast("long"))
    def bit_vote(j: int) -> Column:
        votes = F.aggregate(
            th, F.lit(0).cast("long"),
            lambda acc, h: acc + F.when(
                F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        return F.when(votes > 0, F.lit(2 ** j).cast("long")).otherwise(F.lit(0).cast("long"))

    out = F.lit(0).cast("long")
    for j in range(bits):
        out = out + bit_vote(j)
    return out


def simhash_near_duplicates(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id",
                            max_hamming: int = 3,
                            chunks: int = 4) -> DataFrame:
    """Pairs within hamming distance max_hamming of their 32-bit simhash.

    Pigeonhole: split the signature into `chunks` pieces; any pair within
    distance < chunks must agree on >=1 chunk → bucket-join on (chunk_idx,
    chunk_value), verify hamming exactly with bit_count(xor). Shuffle
    carries (chunk_key, id, sig) — linear in input.
    """
    assert max_hamming < chunks, "pigeonhole needs max_hamming < chunks"
    bits_per = SIMHASH_BITS // chunks
    s = df.select(F.col(id_col).alias("id"),
                  simhash(F.col(text_col)).alias("sig"))
    chunked = s.select(
        "id", "sig",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("ci"),
                F.shiftright(F.col("sig"), i * bits_per)
                .bitwiseAND(F.lit((1 << bits_per) - 1)).alias("cv"),
            ) for i in range(chunks)
        ])).alias("c"),
    ).select("id", "sig", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))
    a = chunked.select(F.col("ci"), F.col("cv"),
                       F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    b = chunked.select(F.col("ci"), F.col("cv"),
                       F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    pairs = (
        a.join(b, ["ci", "cv"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
                .alias("hamming"))
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("hamming") <= max_hamming)
    )
    return pairs
