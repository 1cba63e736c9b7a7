"""Training-data operator tests on hand-built corpora with known answers."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
        (3, "completely different text about spark engines here"),
        (4, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
        (5, "THE  quick   Brown fox jumps over the lazy dog"),  # normalized dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(docs):
    from amundsendatabuilder_spark.operators.dedup import exact_duplicates
    groups = exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0]["dup_count"] == 3  # 1, 4, 5 (whitespace+case normalized)
    assert groups[0]["keep_id"] == 1


def test_ngram_jaccard(docs):
    from amundsendatabuilder_spark.operators.dedup import ngram_jaccard_pairs
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(1, 4)] == 1.0
    assert (1, 2) in pairs and pairs[(1, 2)] < 1.0
    assert not any(3 in p for p in pairs)


def test_minhash_lsh_finds_near_dups(docs):
    from amundsendatabuilder_spark.operators.dedup import minhash_lsh_pairs
    pairs = {(r["doc_a"], r["doc_b"])
             for r in minhash_lsh_pairs(docs, max_bucket_size=10**9).collect()}
    assert (1, 4) in pairs           # identical docs always collide
    assert not any(3 in p for p in pairs)


def test_simhash_identical_docs_same_sig(docs):
    from amundsendatabuilder_spark.operators.dedup import simhash_signatures
    sigs = {r["doc_id"]: r["simhash"]
            for r in simhash_signatures(docs).collect()}
    assert sigs[1] == sigs[4]
    assert sigs[1] != sigs[3]
    assert 0 <= sigs[1] < 2 ** 16


def test_embedding_near_duplicates(spark):
    from amundsendatabuilder_spark.operators.dedup import embedding_near_duplicates
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.999, 0.01, 0.0]), (3, [0.0, 1.0, 0.0])],
        "vec_id long, embedding array<double>")
    pairs = {(r["id_a"], r["id_b"]) for r in
             embedding_near_duplicates(emb, threshold=0.95).collect()}
    assert pairs == {(1, 2)}


def test_brute_force_topk_ordering(spark):
    from amundsendatabuilder_spark.operators.similarity import brute_force_topk
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]), (4, [1.0, 0.01])],
        "vec_id long, embedding array<double>")
    out = brute_force_topk(emb, emb.where(F.col("vec_id") == 1), k=2).collect()
    ranked = [(r["rank"], r["neighbor_id"]) for r in out]
    assert ranked == [(1, 4), (2, 2)]


def test_ivf_topk_runs(spark):
    from amundsendatabuilder_spark.operators.similarity import ivf_topk
    import random
    rng = random.Random(7)
    emb = spark.createDataFrame(
        [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(64)],
        "vec_id long, embedding array<double>")
    out = ivf_topk(emb, emb.where(F.col("vec_id") < 2), k=3, nlist=4, nprobe=2)
    rows = out.collect()
    assert {r["query_id"] for r in rows} == {0, 1}
    assert all(r["rank"] <= 3 for r in rows)


def test_language_id_and_quality(spark):
    from amundsendatabuilder_spark.operators.textops import language_id, quality_metrics
    docs = spark.createDataFrame(
        [(1, "the cat and the dog of a house"),
         (2, "el gato y la casa de que")],
        "doc_id long, text string")
    langs = {r["doc_id"]: r["predicted_lang"] for r in language_id(docs).collect()}
    assert langs == {1: "en", 2: "es"}
    q = {r["doc_id"]: r for r in quality_metrics(docs).collect()}
    assert q[1]["n_tokens"] == 8
    assert 0.0 <= q[1]["quality"] <= 1.0


def test_multimodal_plumbing(spark):
    from amundsendatabuilder_spark.operators.multimodal import (
        decode_image_features, frame_sample_plan, synthetic_media)
    media = synthetic_media(spark, n=9)
    feats = decode_image_features(media).collect()
    assert len(feats) == 3  # every third row is an image
    assert all(f["width"] >= 64 and f["phash"] for f in feats)
    # deterministic: same payload -> same features
    feats2 = decode_image_features(synthetic_media(spark, n=9)).collect()
    assert sorted(map(str, feats)) == sorted(map(str, feats2))
    frames = frame_sample_plan(media, every_ms=1000).collect()
    assert len(frames) == 3 * 6  # 3 videos x (0..5000 step 1000)
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        decode_image_features(media, strict=True)
