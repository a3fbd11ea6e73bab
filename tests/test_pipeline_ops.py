"""Training-data pipeline operators: dedup family, similarity search,
multimodal stubs, text analysis — deterministic small-input checks."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again today"),
        (1, "the quick brown fox jumps over the lazy dog again and again tomorrow"),  # near-dup of 0
        (2, "completely different content about spark dataframes and distributed joins"),
        (3, "the quick brown fox jumps over the lazy dog again and again today"),  # exact dup of 0
        (4, "der schnelle braune fuchs springt und springt ist das nicht gut"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_dedup_drops_near_dups(docs):
    from modin_spark.operators.dedup import minhash_lsh_dedup

    kept = minhash_lsh_dedup(docs, threshold=0.7, k=3)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 0 in ids and 2 in ids and 4 in ids
    assert 3 not in ids  # exact dup removed
    assert 1 not in ids  # near dup removed


def test_ngram_jaccard_pairs(docs):
    from modin_spark.operators.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(docs, k=3, threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 3) in got  # exact dup: jaccard 1.0
    for r in pairs:
        if (r["id_a"], r["id_b"]) == (0, 3):
            assert abs(r["jaccard"] - 1.0) < 1e-9


def test_simhash_exact_dup_distance_zero(docs):
    from modin_spark.operators.text import _LANG_MARKERS  # noqa
    from modin_spark.operators.dedup import text_simhash

    sh = docs.select("doc_id", text_simhash(F.col("text")).alias("h")).collect()
    by_id = {r["doc_id"]: r["h"] for r in sh}
    assert by_id[0] == by_id[3]
    assert by_id[0] != by_id[2]


def test_lang_id(docs):
    from modin_spark.operators.text import lang_id

    got = {r["doc_id"]: r["l"] for r in docs.select("doc_id", lang_id(F.col("text")).alias("l")).collect()}
    assert got[0] == "en"
    assert got[4] == "de"


def test_fingerprint_normalization_invariance(spark):
    from modin_spark.operators.text import fingerprint

    d = spark.createDataFrame(
        [(0, "Hello, World!"), (1, "hello world"), (2, "HELLO   world?!"), (3, "goodbye world")],
        "i long, t string",
    )
    fps = {r["i"]: r["f"] for r in d.select("i", fingerprint(F.col("t")).alias("f")).collect()}
    assert fps[0] == fps[1] == fps[2]
    assert fps[0] != fps[3]


def test_brute_vs_lsh_topk_overlap(spark):
    from modin_spark.operators.similarity import brute_force_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 2).select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    exact = brute_force_topk(emb, q, k=5).collect()
    # self-similarity must rank first with cosine ~1
    for r in exact:
        if r["q_id"] == r["vec_id"]:
            assert r["rank"] == 1 and abs(r["cosine"] - 1.0) < 1e-6
    approx = ivf_topk(emb, q, k=5, n_centroids=8, nprobe=4).collect()
    # IVF with high nprobe should recover the exact top-1 (self)
    top1 = {r["q_id"]: r["vec_id"] for r in approx if r["rank"] == 1}
    for qid, vid in top1.items():
        assert qid == vid


def test_multimodal_image_audio_features(spark):
    from modin_spark.operators.multimodal import (
        attach_image_meta, audio_features, image_features, make_synthetic_media, sample_frames,
    )

    media = make_synthetic_media(spark, n=20)
    feats = image_features(media, dim=16)
    rows = feats.collect()
    assert all(len(r["features"]) == 16 for r in rows)
    # deterministic: same payload -> same features
    again = {r["media_id"]: r["features"] for r in image_features(media, dim=16).collect()}
    for r in rows:
        assert again[r["media_id"]] == r["features"]

    au = audio_features(media, dim=8).collect()
    assert all(len(r["audio_features"]) == 8 for r in au)

    meta = attach_image_meta(media).collect()
    assert all(r["meta"]["width"] >= 32 for r in meta)

    frames = sample_frames(media, every_n=10)
    assert frames.where(F.col("frame_idx") < 0).count() == 0
    assert frames.count() >= 20


def test_decode_stub_raises(spark):
    from modin_spark.operators.multimodal import image_features, make_synthetic_media

    media = make_synthetic_media(spark, n=2)
    with pytest.raises(Exception):
        image_features(media, decode_stub=False).collect()
