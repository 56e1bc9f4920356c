"""Training-pipeline operators: dedup, similarity, text stats, media."""

import pytest
from pyspark.sql import functions as F

from board_game_scraper_spark.operators.dedup import (
    dedup_keep_first,
    exact_dedup,
    minhash_signatures,
    near_dup_pairs,
    simhash,
)
from board_game_scraper_spark.operators.similarity import (
    cosine_topk,
    hyperplane_buckets,
    ivf_topk,
    make_centroids,
)
from board_game_scraper_spark.operators.textstats import (
    fingerprint,
    language_id,
    quality_score,
    token_count,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank"),
    (3, "quick brown fox jumps over the lazy dog near the river bank today"),
    (4, "der schnelle braune fuchs springt über den faulen hund im wald"),
    (5, "completely different text about spark engines and distributed joins"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "id long, text string").cache()


def test_exact_dedup(docs):
    got = exact_dedup(docs, "id", "text").collect()
    dup_groups = [r for r in got if r["n_dups"] > 1]
    assert len(dup_groups) == 1
    assert dup_groups[0]["keep_id"] == 1 and dup_groups[0]["n_dups"] == 2


def test_simhash_near_texts_close(docs):
    got = {r["id"]: r["simhash"] for r in simhash(docs, "id", "text").collect()}
    assert got[1] == got[2]  # identical text → identical hash
    # near-identical (doc 3) differs in few bits from doc 1
    ham_13 = bin(got[1] ^ got[3]).count("1")
    ham_15 = bin(got[1] ^ got[5]).count("1")
    assert ham_13 < ham_15


def test_minhash_near_dup_pairs(docs):
    pairs = {(r["a"], r["b"]): r["jaccard"]
             for r in near_dup_pairs(docs, "id", "text",
                                     threshold=0.4).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert all(a < b for a, b in pairs)
    assert (1, 5) not in pairs and (4, 5) not in pairs


def test_dedup_keep_first(docs):
    kept = {r["id"] for r in
            dedup_keep_first(docs, "id", "text", threshold=0.9).collect()}
    assert 1 in kept and 2 not in kept  # exact dup of 1 removed
    assert 4 in kept and 5 in kept


@pytest.fixture(scope="module")
def vectors(spark):
    import math
    rows = []
    for i in range(60):
        angle = (i % 12) / 12 * math.pi
        rows.append((i, [math.cos(angle), math.sin(angle),
                         (i % 5) / 10.0, 1.0]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()


def test_cosine_topk_exact(spark, vectors):
    import numpy as np

    q = vectors.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec"))
    top = cosine_topk(vectors.where("vec_id != 0"), q, k=5).collect()
    assert len(top) == 5
    cos = [r["cosine"] for r in top]
    assert cos == sorted(cos, reverse=True)
    # numpy oracle
    rows = {r["vec_id"]: np.array(r["embedding"])
            for r in vectors.collect()}
    qv = rows[0]
    sims = {
        i: round(float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv))), 4)
        for i, v in rows.items() if i != 0
    }
    expected = sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["vec_id"], r["cosine"]) for r in top] == expected


def test_ivf_topk_superset_of_probe(spark, vectors):
    q = vectors.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec"))
    others = vectors.where("vec_id != 0")
    cents = make_centroids(others, nlist=3)
    assert cents.count() == 3
    ann = ivf_topk(others, q, cents, k=5, nprobe=3).collect()
    exact = cosine_topk(others, q, k=5).collect()
    # nprobe == nlist → scans everything → identical to exact
    assert [(r["vec_id"], r["cosine"]) for r in ann] == [
        (r["vec_id"], r["cosine"]) for r in exact]


def test_ivf_persisted_index_matches_inline(spark, vectors, tmp_path):
    """The production path (ivf_build once → partition-pruned
    ivf_topk_indexed per query) returns exactly what the inline
    (re-assigning) variant returns, and the probe plan carries a static
    list_id partition filter — no full-corpus re-scan per query."""
    from board_game_scraper_spark.operators.similarity import (
        ivf_build, ivf_topk_indexed,
    )

    q = vectors.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec"))
    others = vectors.where("vec_id != 0")
    cents = make_centroids(others, nlist=3)
    idx = tmp_path / "ivf"
    ivf_build(others, cents, idx)
    got = ivf_topk_indexed(spark, idx, q, cents, k=5, nprobe=2)
    inline = ivf_topk(others, q, cents, k=5, nprobe=2)
    assert [(r["vec_id"], r["cosine"]) for r in got.collect()] == [
        (r["vec_id"], r["cosine"]) for r in inline.collect()]
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan


def test_hyperplane_buckets_deterministic(spark, vectors):
    a = {(r["vec_id"], r["bucket"])
         for r in hyperplane_buckets(vectors).collect()}
    b = {(r["vec_id"], r["bucket"])
         for r in hyperplane_buckets(vectors).collect()}
    assert a == b  # same planes every run (hash-derived, seeded)
    # equal vectors land in the same bucket
    dup = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 1.0]), (200, [1.0, 0.0, 0.0, 1.0]),
         (300, [-1.0, 0.5, 0.2, -1.0])],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r["bucket"]
           for r in hyperplane_buckets(dup).collect()}
    assert got[100] == got[200]
    assert got[100] != got[300]  # opposite vector flips every plane


def test_language_id(docs):
    got = {r["id"]: r["lang"] for r in
           language_id(docs, "id", "text").collect()}
    assert got[1] == "en" and got[4] == "de"


def test_quality_and_tokens(docs):
    q = {r["id"]: r for r in quality_score(docs, "id", "text").collect()}
    assert 0 < q[1]["quality"] <= 1
    assert q[1]["stopword_ratio"] > q[4]["stopword_ratio"]  # en stopwords
    t = {r["id"]: r for r in token_count(docs, "id", "text").collect()}
    assert t[1]["ws_tokens"] == 13
    assert t[1]["bpe_tokens"] >= t[1]["ws_tokens"]


def test_fingerprint_stability(docs):
    fp = {r["id"]: r["fingerprint"] for r in
          fingerprint(docs, "id", "text").collect()}
    assert fp[1] == fp[2]  # identical docs → identical fingerprint
    assert fp[1] != fp[5]


def test_media_feature_plumbing(spark):
    from board_game_scraper_spark.functions.media import (
        extract_features,
        media_from_documents,
    )
    from board_game_scraper_spark import schemas

    docs = spark.createDataFrame(
        [("d1", [{"kind": "text", "text": "t", "media_ref": None,
                  "offset": 0},
                 {"kind": "image", "text": None,
                  "media_ref": "img://1", "offset": 1}])],
        schemas.DOCUMENTS,
    )
    media = media_from_documents(docs)
    rows = media.collect()
    assert len(rows) == 1 and rows[0]["media_ref"] == "img://1"
    feats = extract_features(media, dim=8).collect()
    assert feats[0]["feat_dim"] == 8
    # deterministic fake decoder → stable features
    feats2 = extract_features(media, dim=8).collect()
    assert feats[0]["feature"] == feats2[0]["feature"]


def test_media_stub_raises(spark):
    from board_game_scraper_spark.functions.media import (
        media_from_documents,
        resize_images,
    )
    from board_game_scraper_spark import schemas

    docs = spark.createDataFrame(
        [("d1", [{"kind": "image", "text": None,
                  "media_ref": "img://1", "offset": 0}])],
        schemas.DOCUMENTS,
    )
    with pytest.raises(Exception, match="not available in this sandbox"):
        resize_images(media_from_documents(docs), 64, 64).collect()
