"""Training-data pipeline operators: dedup (exact / MinHash-LSH / SimHash /
n-gram Jaccard), similarity search (brute-force + LSH ANN), text analysis,
multimodal plumbing. Planted duplicates and numpy cosine oracles make the
assertions exact."""

import math

import pytest
from pyspark.sql import functions as F

from jsonschema_rs_spark.operators import dedup as dd
from jsonschema_rs_spark.operators import multimodal as mm
from jsonschema_rs_spark.operators import similarity as sim
from jsonschema_rs_spark.operators import text_analysis as ta

DOCS = [
    ("d1", "The quick brown fox jumps over the lazy dog near the old river bank"),
    ("d2", "The quick brown fox jumps over the lazy dog near the old river bank"),  # exact dup of d1
    ("d3", "The quick brown fox jumps over the lazy dog near the new river bank"),  # near dup (1 token)
    ("d4", "Completely different content about spark dataframes and shuffle behavior"),
    ("d5", "el perro corre por la calle y la casa es grande pero el gato duerme"),
    ("d6", "THE QUICK BROWN FOX jumps over the lazy dog near the old river bank!"),  # normalized dup of d1
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


# -- text analysis ----------------------------------------------------------


def test_token_counts(spark):
    df = spark.createDataFrame([("a b  c",), ("",), ("  ",), ("don't stop!",)],
                               "t string")
    got = df.select(ta.ws_token_count(F.col("t")).alias("ws"),
                    ta.bpe_token_count(F.col("t")).alias("bpe")).collect()
    assert [r["ws"] for r in got] == [3, 0, 0, 2]
    # don't stop! → don ' t stop !
    assert got[3]["bpe"] == 5


def test_lang_id(docs):
    got = {r["doc_id"]: r["lang"] for r in docs.select(
        "doc_id", ta.lang_id(F.col("text")).alias("lang")).collect()}
    assert got["d1"] == "en"
    assert got["d5"] == "es"


def test_quality_score_monotone(spark):
    df = spark.createDataFrame(
        [("good", "the cat sat on the mat and it was good"),
         ("short", "hi"),
         ("nums", "12 34 56 78 90 11 22 33 44 55")], "k string, t string")
    got = {r["k"]: r["q"] for r in df.select(
        "k", ta.quality_score(F.col("t")).alias("q")).collect()}
    assert got["good"] == 1.0
    assert got["short"] < got["good"]
    assert got["nums"] < got["good"]


def test_fingerprint_normalization(docs):
    got = {r["doc_id"]: r["fp"] for r in docs.select(
        "doc_id", ta.fingerprint(F.col("text")).alias("fp")).collect()}
    assert got["d1"] == got["d2"] == got["d6"]
    assert got["d1"] != got["d3"]


def test_sorted_token_fingerprint(spark):
    df = spark.createDataFrame([("b a c",), ("c b a",), ("a b d",)], "t string")
    fps = [r["fp"] for r in df.select(
        ta.sorted_token_fingerprint(F.col("t")).alias("fp")).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_with_text_features_schema(docs):
    out = ta.with_text_features(docs)
    for c in ["n_tokens_ws", "n_tokens_bpe", "lang_pred", "quality", "fp"]:
        assert c in out.columns
    assert out.count() == len(DOCS)


# -- dedup ------------------------------------------------------------------


def test_exact_duplicate_groups(docs):
    groups = dd.exact_duplicate_groups(docs).collect()
    assert len(groups) == 1
    assert groups[0]["doc_ids"] == ["d1", "d2", "d6"]


def test_exact_duplicate_rows_flat_form(docs):
    """The scale form agrees with the grouped form member-for-member
    and marks exactly the min-id member as keeper."""
    rows = dd.exact_duplicate_rows(docs).collect()
    by_fp = {}
    for r in rows:
        by_fp.setdefault(r["fp"], []).append(r)
    assert len(by_fp) == 1
    members = sorted(r["doc_id"] for r in rows)
    assert members == ["d1", "d2", "d6"]
    assert all(r["n_docs"] == 3 for r in rows)
    keepers = [r["doc_id"] for r in rows if r["is_keeper"]]
    assert keepers == ["d1"]


def test_dedup_exact_keeps_one(docs):
    kept = sorted(r["doc_id"] for r in dd.dedup_exact(docs).collect())
    assert kept == ["d1", "d3", "d4", "d5"]


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("x y",)], "t string")
    got = df.select(dd.word_shingles(F.col("t"), 3).alias("s")).collect()
    assert got[0]["s"] == ["a b c", "b c d"]
    assert got[1]["s"] == ["x y"]  # shorter than n → whole text


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in dd.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert ("d1", "d2") in pairs and pairs[("d1", "d2")] == 1.0
    assert ("d1", "d3") in pairs and 0.5 <= pairs[("d1", "d3")] < 1.0
    assert not any("d4" in p for p in pairs)


def test_minhash_near_duplicates(docs):
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in dd.minhash_near_duplicates(
               docs, num_hashes=16, bands=8, threshold=0.5).collect()}
    assert ("d1", "d2") in got
    assert ("d1", "d6") in got  # normalized dup
    assert ("d1", "d3") in got  # near dup caught by some band
    assert not any("d4" in k or "d5" in k for k in got)


def test_minhash_signature_deterministic(docs):
    s1 = docs.select(dd.minhash_signature(F.col("text"), 8).alias("s")).collect()
    s2 = docs.select(dd.minhash_signature(F.col("text"), 8).alias("s")).collect()
    assert s1 == s2
    # identical docs → identical signatures
    by_id = dict(zip([d[0] for d in DOCS], [r["s"] for r in s1]))
    assert by_id["d1"] == by_id["d2"] == by_id["d6"]


def test_simhash_properties(docs):
    got = {r["doc_id"]: r["sh"] for r in docs.select(
        "doc_id", dd.simhash(F.col("text")).alias("sh")).collect()}
    assert got["d1"] == got["d2"] == got["d6"]
    assert 0 <= got["d1"] < 2 ** 32
    # near-dup differs in few bits; unrelated differs in many
    def ham(a, b):
        return bin(a ^ b).count("1")
    assert ham(got["d1"], got["d3"]) <= 6
    assert ham(got["d1"], got["d5"]) > 6


def test_simhash_near_duplicates(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in
             dd.simhash_near_duplicates(docs, max_hamming=3).collect()}
    assert ("d1", "d2") in pairs and ("d1", "d6") in pairs


# -- similarity -------------------------------------------------------------


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_brute_force_topk_matches_numpy(emb):
    import numpy as np
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    got = sim.brute_force_topk(emb, q, k=5).collect()
    data = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    for qid in [0, 1, 2]:
        qv = data[qid]
        sims = {}
        for vid, v in data.items():
            sims[vid] = float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v)))
        expect = sorted(sims, key=lambda vid: (-round(sims[vid], 6), vid))[:5]
        mine = [r["neighbor_id"] for r in sorted(
            (x for x in got if x["query_id"] == qid), key=lambda r: r["rank"])]
        assert mine == expect
        # self is always rank 1 with sim 1.0
        assert mine[0] == qid


def test_ann_lsh_subset_of_bucket_and_ranked(emb):
    q = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding")
    got = sim.ann_topk_lsh(emb, q, k=5, n_planes=6)
    rows = got.collect()
    # every query finds at least itself (same vector → same bucket)
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        best = min(rs, key=lambda r: r["rank"])
        assert best["neighbor_id"] == qid and best["sim"] == 1.0
    assert set(by_q) == {0, 1, 2, 3}


def test_near_duplicates_by_cosine_exact_vs_lsh(spark):
    # planted near-dup pair + noise
    import numpy as np
    rng = np.random.RandomState(3)
    base = rng.normal(0, 1, 16)
    rows = [(0, base.tolist()), (1, (base + 0.01).tolist())] + [
        (i, rng.normal(0, 1, 16).tolist()) for i in range(2, 40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = sim.near_duplicates_by_cosine(df, threshold=0.99, dim=16,
                                          exact=True).collect()
    assert [(r["id_a"], r["id_b"]) for r in exact] == [(0, 1)]
    lsh = sim.near_duplicates_by_cosine(df, threshold=0.99, n_planes=8,
                                        dim=16).collect()
    assert [(r["id_a"], r["id_b"]) for r in lsh] == [(0, 1)]


def test_hyperplane_determinism():
    assert sim.hyperplane_signs(3, 8) == sim.hyperplane_signs(3, 8)
    flat = [x for row in sim.hyperplane_signs(4, 64) for x in row]
    assert set(flat) == {-1, 1}
    assert 0.3 < flat.count(1) / len(flat) < 0.7


# -- multimodal -------------------------------------------------------------


def test_media_features(spark):
    media = mm.synthetic_media_df(spark, 30)
    feats = mm.extract_media_features(media)
    rows = feats.collect()
    assert len(rows) == 30
    for r in rows:
        assert r["n_bytes"] > 0 and len(r["content_md5"]) == 32
        if r["media_type"] == "image":
            assert r["width"] is not None and r["height"] is not None
            assert r["duration_ms"] is None
        else:
            assert r["duration_ms"] is not None and r["frame_count"] >= 1
            assert r["width"] is None
    # deterministic across runs
    assert sorted(map(tuple, rows)) == sorted(map(tuple, feats.collect()))


def test_frame_sample_plan(spark):
    media = mm.synthetic_media_df(spark, 30)
    frames = mm.frame_sample_plan(media, every_ms=60_000)
    rows = frames.collect()
    assert all(r["ts_ms"] == r["frame_idx"] * 60_000 for r in rows)
    n_videos = media.where(F.col("media_type") == "video").count()
    assert len({r["asset_id"] for r in rows}) == n_videos


def test_curate_pipeline(spark):
    from jsonschema_rs_spark.operators.curate import curate
    rows = [
        ("d1", "the cat sat on the mat and the dog slept by the door today"),
        ("d2", "the cat sat on the mat and the dog slept by the door today"),  # exact dup
        ("d3", "the cat sat on the mat and the dog slept by the gate today"),  # near dup
        ("d4", "a completely different story about the spark engine and its many shuffles"),
        ("d5", "xx"),  # fails quality gate (too short)
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = sorted(r["doc_id"] for r in curate(
        df, quality_threshold=0.7, num_hashes=16, bands=8,
        jaccard_threshold=0.5).collect())
    assert out == ["d1", "d4"]


def test_connected_components(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 9), (9, 10), (3, 4)],
        "id_a long, id_b long")
    got = {r["id"]: r["component"]
           for r in dd.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 8: 8, 9: 8, 10: 8}


def test_curate_cc_keeps_one_per_cluster(spark):
    from jsonschema_rs_spark.operators.curate import curate
    # chain a~b, b~c where a!~c directly: greedy drops b and c (both
    # appear as id_b); cc keeps exactly one per cluster too — here both
    # agree, but cc must not drop the cluster minimum
    rows = [
        ("a1", "the gray cat sat on the soft mat by the old door frame one"),
        ("a2", "the gray cat sat on the soft mat by the old door frame two"),
        ("a3", "the gray cat sat on the soft mat by the old door frame ten"),
        ("zz", "a totally unrelated string of words about query planning"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = sorted(r["doc_id"] for r in curate(
        df, quality_threshold=0.5, jaccard_threshold=0.5,
        strategy="cc").collect())
    assert out == ["a1", "zz"]


def test_connected_components_star_matches_propagate(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 9), (9, 10), (3, 4)],
        "id_a long, id_b long")
    prop = {r["id"]: r["component"]
            for r in dd.connected_components(pairs).collect()}
    star = {r["id"]: r["component"]
            for r in dd.connected_components(
                pairs, algorithm="star").collect()}
    assert star == prop == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5,
                            8: 8, 9: 8, 10: 8}


def test_connected_components_star_long_chain(spark):
    # a 120-node path has diameter 119: min-label propagation needs ~119
    # rounds (far past the default budget — it must WARN, not silently
    # return split labels unflagged), while star contraction converges
    # within its default 20 (needs ~log2(n)) and labels the whole chain 0
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(119)], "id_a long, id_b long")
    star = {r["id"]: r["component"]
            for r in dd.connected_components(
                pairs, algorithm="star").collect()}
    assert star == {i: 0 for i in range(120)}
    prop = {r["id"]: r["component"]
            for r in dd.connected_components(
                pairs, max_iterations=5, algorithm="propagate").collect()}
    assert prop != star  # propagation genuinely can't finish in 5 rounds
    # default "auto" must NOT hand back those split labels: it detects
    # the blown budget and reruns via star contraction
    auto = {r["id"]: r["component"]
            for r in dd.connected_components(
                pairs, max_iterations=5).collect()}
    assert auto == star
    # max_iterations=1 never even reaches the convergence CHECK (it
    # runs from round 2) — that must count as unconverged too, not
    # silently return round-1 labels
    auto1 = {r["id"]: r["component"]
             for r in dd.connected_components(
                 pairs, max_iterations=1).collect()}
    assert auto1 == star


def test_connected_components_star_random_vs_union_find(spark):
    import random
    rng = random.Random(7)
    n = 60
    edges = sorted({tuple(sorted(rng.sample(range(n), 2)))
                    for _ in range(45)})
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    touched = {v for e in edges for v in e}
    want = {v: min(u for u in touched if find(u) == find(v))
            for v in touched}
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    star = {r["id"]: r["component"]
            for r in dd.connected_components(
                pairs, algorithm="star").collect()}
    assert star == want


# -- IVF ANN ----------------------------------------------------------------


def test_ivf_topk_recall_and_determinism(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    from pyspark.sql import functions as F
    q = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding")
    exact = sim.brute_force_topk(emb, q, k=5)
    ivf = sim.ivf_topk(emb, q, k=5, n_centroids=16, n_probe=4)
    got = {(r["query_id"], r["neighbor_id"]) for r in ivf.collect()}
    want = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    # approximate: probing 4/16 lists must still recover most true
    # neighbors (including each query itself, which shares its list)
    recall = len(got & want) / len(want)
    assert recall >= 0.5, recall
    assert len(got) == 40  # 8 queries x k
    # deterministic: second run identical (hash-seeded quantizer, no RNG)
    again = {(r["query_id"], r["neighbor_id"])
             for r in sim.ivf_topk(emb, q, k=5, n_centroids=16,
                                   n_probe=4).collect()}
    assert again == got


def test_ivf_lloyd_refinement_runs(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cents = sim.ivf_centroids(emb, n_centroids=8, lloyd_iters=2)
    rows = cents.collect()
    assert len(rows) == 8
    assert all(len(r["cvec"]) == 64 for r in rows)
    # full-probe IVF with refined centroids degenerates to exact search
    from pyspark.sql import functions as F
    q = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding")
    full = sim.ivf_topk(emb, q, k=3, n_centroids=8, n_probe=8,
                        lloyd_iters=1)
    exact = sim.brute_force_topk(emb, q, k=3)
    assert {(r["query_id"], r["neighbor_id"]) for r in full.collect()} \
        == {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}


def test_adaptive_banding_selection():
    """Selection math: boundary recall >= target, b <= max_bands, and
    r maximal (the next r would need more than max_bands bands)."""
    import math
    for th in (0.5, 0.8, 0.9, 0.95):
        b, r = sim.adaptive_banding(th)
        p = 1 - math.acos(th) / math.pi
        recall = 1 - (1 - p ** r) ** b
        assert recall >= 0.995, (th, b, r, recall)
        assert b <= 64
        if r < 16:  # next r must not fit (r is maximal)
            need = math.ceil(math.log(0.005) / math.log(1 - p ** (r + 1)))
            assert need > 64, (th, r, need)
    # higher threshold -> wider ANDs (more selective)
    assert sim.adaptive_banding(0.9)[1] > sim.adaptive_banding(0.5)[1]
    with pytest.raises(ValueError):
        sim.adaptive_banding(0.5, target_recall=1.5)


def test_near_duplicates_auto_banding(spark):
    import numpy as np
    rng = np.random.RandomState(7)
    base = rng.normal(0, 1, 16)
    rows = [(0, base.tolist()), (1, (base + 0.01).tolist())] + [
        (i, rng.normal(0, 1, 16).tolist()) for i in range(2, 40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = sim.near_duplicates_by_cosine(df, threshold=0.95, dim=16,
                                        bands="auto").collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(0, 1)]
    with pytest.raises(ValueError):
        sim.near_duplicates_by_cosine(df, threshold=0.95, dim=16,
                                      bands="auto", n_planes=12)


def test_pack_sequences_chunk_semantics(spark):
    from jsonschema_rs_spark.operators.packing import pack_sequences
    rows = [
        # shard a: 3+4=7 tokens before doc 3 starts -> doc 3 starts in
        # pack 0 (offset 7 < 10), doc 4 starts at 7+6=13 -> pack 1
        (1, "a", "t1 t2 t3"),
        (2, "a", "t t t t"),
        (3, "a", "x x x x x x"),
        (4, "a", "y"),
        # shard b: a doc longer than the budget spans packs; the next
        # doc starts at its end offset
        (5, "b", " ".join(["w"] * 25)),
        (6, "b", "z z"),
        # empty text = 0 tokens
        (7, "b", "   "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["start_offset"], r["pack_id"])
           for r in pack_sequences(df, budget=10,
                                   shard_col="lang").collect()}
    assert got[1] == (3, 0, 0)
    assert got[2] == (4, 3, 0)
    assert got[3] == (6, 7, 0)
    assert got[4] == (1, 13, 1)
    assert got[5] == (25, 0, 0)
    assert got[6] == (2, 25, 2)
    assert got[7] == (0, 27, 2)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        pack_sequences(df, budget=0)


def test_null_text_robustness(spark):
    """NULL text across the pipeline operators (review sweep): quality
    scores 0.0 (not a vacuous 1.0 that sailed through filters),
    lang_pred classifies 'und' like lang_id, and both packing variants
    count 0 tokens instead of dropping the doc (chunk path) or
    poisoning the rest of the shard with NaN (greedy path)."""
    from jsonschema_rs_spark.operators import text_analysis as ta
    from jsonschema_rs_spark.operators.packing import (
        pack_sequences, pack_sequences_greedy)

    df = spark.createDataFrame(
        [("a", "the quick brown fox jumps over the lazy dog today"),
         ("b", None), ("c", "another perfectly normal document for the "
                            "test with enough stopwords in it")],
        "doc_id string, text string")
    feats = {r["doc_id"]: r for r in
             ta.with_text_features(df).collect()}
    assert feats["b"]["quality"] == 0.0
    assert feats["b"]["lang_pred"] == "und"
    assert feats["a"]["quality"] > 0.5

    packed = {r["doc_id"]: r for r in
              pack_sequences(df, budget=8).collect()}
    assert packed["b"]["n_tokens"] == 0
    assert packed["b"]["pack_id"] is not None

    greedy = {r["doc_id"]: r
              for r in pack_sequences_greedy(df, budget=8).collect()}
    # the null doc fits wherever the cursor is; later docs still pack
    assert all(r["pack_id"] is not None for r in greedy.values())
    assert greedy["c"]["pack_id"] >= greedy["a"]["pack_id"]


def test_media_features_null_content(spark):
    """NULL content rows yield NULL features instead of a TypeError
    that kills the task (review find)."""
    from jsonschema_rs_spark.operators.multimodal import (
        extract_media_features)

    df = spark.createDataFrame(
        [("a1", "image", bytearray(b"xx")), ("a2", "image", None),
         ("a3", "video", None)],
        "asset_id string, media_type string, content binary")
    rows = {r["asset_id"]: r for r in extract_media_features(df).collect()}
    assert rows["a2"]["width"] is None and rows["a2"]["content_md5"] is None
    assert rows["a3"]["duration_ms"] is None
    assert rows["a1"]["width"] is not None


def test_chi_square_dof_counts_contributing_categories(spark):
    """Suppressed (below min_expected) categories no longer inflate
    dof, and empty inputs return (0.0, 0) not (NULL, -1) — review
    find."""
    from jsonschema_rs_spark.operators.table_checks import chi_square_drift

    o = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 50 + [("rare",)],
        "cat string")
    r = spark.createDataFrame([("a",)] * 50 + [("b",)] * 50, "cat string")
    row = chi_square_drift(o, r, "cat", min_expected=2.0).first()
    assert row["dof"] == 1  # a, b contribute; 'rare' suppressed
    empty = spark.createDataFrame([], "cat string")
    row2 = chi_square_drift(empty, empty, "cat").first()
    assert row2["chi2"] == 0.0 and row2["dof"] == 0
