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


# ---------------------------------------------------------------------------
# planted-duplicate recall/precision fixtures (VERDICT r1 item 7)
# ---------------------------------------------------------------------------

def _planted_corpus(n_base=60, n_dups=12, seed=9):
    """Random word docs + planted near-dups (a few words swapped => shingle
    Jaccard ~0.85-0.95). Returns (rows, true_pairs)."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i:03d}" for i in range(300)]
    rows, true_pairs = [], set()
    did = 0
    for _ in range(n_base):
        words = list(rng.choice(vocab, 40))
        rows.append((did, " ".join(words)))
        did += 1
    for b in range(n_dups):
        src_id, src_text = rows[b * 3]
        words = src_text.split()
        # perturb 1 of 40 words -> <=5 of 36 shingles change -> J >= ~0.76
        idx = rng.choice(len(words), 1, replace=False)
        for i in idx:
            words[i] = str(rng.choice(vocab))
        rows.append((did, " ".join(words)))
        true_pairs.add((src_id, did))
        did += 1
    return rows, true_pairs


def _exact_jaccard(a: str, b: str, k=5):
    sh = lambda t: {" ".join(t.split()[i:i + k]) for i in range(len(t.split()) - k + 1)}
    A, B = sh(a), sh(b)
    return len(A & B) / len(A | B)


def test_minhash_planted_recall_precision(spark):
    from modin_spark.operators.dedup import ngram_jaccard_pairs

    rows, _ = _planted_corpus()
    texts = dict(rows)
    # ground truth: ALL pairs with exact shingle-Jaccard >= 0.6 (python)
    truth = {
        (a, b)
        for i, (a, ta) in enumerate(rows)
        for (b, tb) in rows[i + 1:]
        if _exact_jaccard(ta, tb) >= 0.6
    }
    assert len(truth) >= 8, f"fixture should plant >=8 true pairs, got {len(truth)}"
    df = spark.createDataFrame(rows, "doc_id long, text string")
    found = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(df, "doc_id", "text", k=5, threshold=0.6).collect()
    }
    recall = len(found & truth) / len(truth)
    assert recall >= 0.9, f"minhash-LSH recall {recall} < 0.9 (found {len(found)}, truth {len(truth)})"
    # precision of the exact-verified pairs must be perfect
    for a, b in found:
        assert _exact_jaccard(texts[a], texts[b]) >= 0.6
    assert len(found - truth) == 0


def test_simhash_planted_recall(spark):
    from modin_spark.operators.dedup import simhash_dedup

    # SimHash targets NEAR-IDENTICAL docs: long documents with a tiny edit
    # (1 word of 200 => ~5 of 196 shingles change => hamming <= 3, inside the
    # 4x16-bit band guarantee). Short/heavily-edited docs are MinHash's job.
    rng = np.random.default_rng(21)
    vocab = [f"w{i:03d}" for i in range(300)]
    rows = []
    for i in range(30):
        rows.append((i, " ".join(rng.choice(vocab, 200))))
    base = len(rows)
    planted = 6
    for i in range(planted):
        words = rows[i * 2][1].split()
        words[5] = "zzz"
        rows.append((base + i, " ".join(words)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # ground truth from the signatures themselves: every pair within the
    # hamming threshold MUST be found (pigeonhole over the 4x16-bit bands
    # guarantees a shared band at distance <= 3 — recall 1.0, not heuristic)
    from modin_spark.operators.dedup import text_simhash

    h = {r.doc_id: r.h for r in df.select("doc_id", text_simhash(F.col("text")).alias("h")).collect()}
    within = {
        (a, b)
        for ai, a in enumerate(sorted(h))
        for b in sorted(h)[ai + 1:]
        if bin(h[a] ^ h[b]).count("1") <= 3
    }
    assert len(within) >= 3, f"fixture should plant >=3 in-threshold pairs, got {len(within)}"
    kept = simhash_dedup(df, hamming_threshold=3).count()
    dropped = len(rows) - kept
    assert dropped == len({b for _, b in within}), (
        f"simhash dropped {dropped}, expected {len({b for _, b in within})} (pairs={within})"
    )


def test_ann_recall_at_5(spark):
    import __spark_entry__ as entry

    qs = entry.queries()
    sf = "/root/testdata/sf0.001"
    lsh = qs["emb_lsh_recall"](spark, sf).collect()[0]
    assert lsh.recall_at_5 >= 0.9, f"LSH recall@5 {lsh.recall_at_5}"
    ivf = qs["emb_ivf_recall"](spark, sf).collect()[0]
    assert ivf.recall_at_5 >= 0.9, f"IVF recall@5 {ivf.recall_at_5}"


def test_minhash_bucket_cap(spark):
    """Hot-bucket skew guard: a mega-bucket (many identical docs) switches
    to STAR expansion against the bucket min — linear pair count, the
    cluster still fully linked to its representative — while under-cap
    buckets expand all pairs."""
    from modin_spark.operators.dedup import minhash_candidate_pairs, minhash_lsh_dedup

    rows = [(i, "exact same boilerplate text repeated many times over") for i in range(30)]
    rows += [(100, "something completely different about spark plans"),
             (101, "something completely different about spark plans")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # cap below the 30-dup clique: its buckets star-expand (29 pairs, all
    # anchored at doc 0); the small under-cap pair still expands all-pairs
    capped = minhash_candidate_pairs(df, "doc_id", "text", threshold=0.8, max_bucket_size=10)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (100, 101) in got
    clique = {(a, b) for a, b in got if a < 100 and b < 100}
    assert clique == {(0, j) for j in range(1, 30)}, clique
    # keep-min therefore collapses the whole mega-cluster to its min id
    kept = minhash_lsh_dedup(df, threshold=0.8, max_bucket_size=10)
    survivors = sorted(r.doc_id for r in kept.select("doc_id").collect())
    assert survivors == [0, 100]
    # uncapped finds the full clique
    full = minhash_candidate_pairs(df, "doc_id", "text", threshold=0.8, max_bucket_size=None)
    assert full.where("id_a < 100").count() == 29 * 30 // 2


def test_simhash_bucket_cap_star(spark):
    """SimHash hot-bucket guard: identical docs share every band key, so a
    mega-cluster over the cap star-expands and still collapses to one doc."""
    from modin_spark.operators.dedup import simhash_dedup

    rows = [(i, "exact same boilerplate legal footer clause shared on every page") for i in range(40)]
    rows += [(100, "a completely unrelated document about catalyst plans"),
             (101, "a completely unrelated document about catalyst plans")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = simhash_dedup(df, hamming_threshold=3, max_bucket_size=10)
    survivors = sorted(r.doc_id for r in kept.select("doc_id").collect())
    assert survivors == [0, 100]


def test_embedding_cosine_bucket_cap_star(spark):
    """Embedding-cosine hot-bucket guard: a mass-duplicated vector over the
    cap star-expands and keep-min leaves exactly one copy."""
    from modin_spark.operators.dedup import embedding_cosine_dedup

    rng = np.random.default_rng(5)
    hot = rng.normal(size=16)
    hot = (hot / np.linalg.norm(hot)).tolist()
    rows = [(i, hot) for i in range(40)]
    for j in range(5):
        v = rng.normal(size=16)
        rows.append((100 + j, (v / np.linalg.norm(v)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = embedding_cosine_dedup(df, threshold=0.99, max_bucket_size=10)
    survivors = sorted(r.vec_id for r in kept.select("vec_id").collect())
    assert survivors[0] == 0 and all(s >= 100 for s in survivors[1:]), survivors


def test_kmeans_centroids_improve_quantization(spark):
    """Distributed Lloyd iterations must (a) be deterministic and (b) not
    worsen the spherical quantization objective vs the sampled init."""
    import numpy as np

    from modin_spark.operators.similarity import kmeans_centroids

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(4, 16))
    rows = []
    for i in range(400):
        c = centers[i % 4]
        v = c + 0.15 * rng.normal(size=16)
        rows.append((i, (v / np.linalg.norm(v)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def objective(C):
        M = np.stack([np.asarray(r.embedding) for r in df.collect()])
        return float(np.max(M @ C.T, axis=1).mean())

    C0 = kmeans_centroids(df, "embedding", 4, iters=0)
    C2 = kmeans_centroids(df, "embedding", 4, iters=2)
    C2b = kmeans_centroids(df, "embedding", 4, iters=2)
    assert np.allclose(C2, C2b), "k-means must be deterministic for a fixed seed"
    assert objective(C2) >= objective(C0) - 1e-9, (objective(C0), objective(C2))


def test_duplicate_components_vs_min_id(spark):
    """CC keeps exactly one doc per component; min-id keeps extra survivors
    that are linked only through a common larger node."""
    from modin_spark.operators.dedup import _dedup_keep_min, duplicate_components

    docs = spark.createDataFrame([(i, f"d{i}") for i in range(1, 8)], "doc_id long, text string")
    # components: {1,2,3} (via common node 3), {4,5}, {6}, {7}
    pairs = spark.createDataFrame([(1, 3), (2, 3), (4, 5)], "id_a long, id_b long")

    labels = {r.v: r.l for r in duplicate_components(pairs).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}

    kept_min = sorted(r.doc_id for r in _dedup_keep_min(docs, "doc_id", pairs).collect())
    assert kept_min == [1, 2, 4, 6, 7]  # 2 survives: only paired with larger 3
    kept_cc = sorted(r.doc_id for r in _dedup_keep_min(docs, "doc_id", pairs, connected_components=True).collect())
    assert kept_cc == [1, 4, 6, 7]


def test_duplicate_components_path_graph(spark):
    """A diameter-4 path converges to a single min label."""
    from modin_spark.operators.dedup import duplicate_components

    pairs = spark.createDataFrame([(10, 20), (20, 30), (30, 40), (40, 50)], "id_a long, id_b long")
    labels = {r.v: r.l for r in duplicate_components(pairs).collect()}
    assert set(labels.values()) == {10}


def test_pii_scrub(spark):
    from modin_spark.operators.text import pii_scrub

    df = spark.createDataFrame(
        [
            (1, "reach me at bob@example.org or 555-123-4567"),
            (2, "server 10.0.0.1 holds ssn 123-45-6789"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert out[1]["email_hits"] == 1 and out[1]["phone_hits"] == 1
    assert out[2]["ipv4_hits"] == 1 and out[2]["ssn_hits"] == 1
    assert "[PII]" in out[1]["text_scrubbed"] and "bob@" not in out[1]["text_scrubbed"]
    assert out[3]["text_scrubbed"] == "nothing sensitive here"


def test_repetition_stats(spark):
    from modin_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [(1, "spam spam spam spam"), (2, "all words here differ"), (3, "a\nb\na\nb")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert out[1]["unique_word_ratio"] == 0.25
    assert out[2]["unique_word_ratio"] == 1.0
    assert abs(out[3]["dup_line_frac"] - 0.5) < 1e-12


def test_paragraph_dedup(spark):
    from modin_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [
            (1, "alpha beta\n\nCOMMON FOOTER\n\nalpha beta"),
            (2, "gamma delta\n\nCOMMON FOOTER"),
            (3, "COMMON  footer"),  # normalizes to the footer -> dropped
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in paragraph_dedup(df).collect()}
    assert out[1] == "alpha beta\n\nCOMMON FOOTER"  # within-doc dup + footer kept at first site
    assert out[2] == "gamma delta"
    assert 3 not in out  # everything it had was seen earlier


# ---------------------------------------------------------------------------
# corpus-construction operators
# ---------------------------------------------------------------------------

def test_word_ngrams_matches_python(spark):
    from modin_spark.operators.corpus import word_ngrams

    texts = ["the quick Brown  fox", "a b", "single", "", "x y z w v"]
    d = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got = {r["i"]: r["ng"] for r in d.select("i", word_ngrams(F.col("text"), 3).alias("ng")).collect()}
    for i, t in enumerate(texts):
        words = t.lower().split()
        want = [" ".join(words[j:j + 3]) for j in range(len(words) - 2)]
        assert got[i] == want, (t, got[i], want)


def test_decontaminate_removes_overlap(spark):
    from modin_spark.operators.corpus import decontaminate

    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta"),
         (2, "one two three four five six seven"),
         (3, "unrelated words entirely here today now yes")],
        "doc_id long, text string")
    ev = spark.createDataFrame(
        [(100, "prefix alpha beta gamma delta epsilon zeta suffix")],
        "doc_id long, text string")
    kept = sorted(r.doc_id for r in decontaminate(train, ev, n=6).collect())
    assert kept == [2, 3]


def test_pack_sequences_layout(spark):
    from modin_spark.operators.corpus import pack_sequences

    rows = [(i, 100 + (i % 7) * 50) for i in range(200)]
    d = spark.createDataFrame(rows, "doc_id long, tokens long")
    out = pack_sequences(d, "doc_id", "tokens", 512).orderBy("doc_id").collect()
    off = 0
    for r, (i, tk) in zip(out, rows):
        assert r.offset == off, (i, r.offset, off)
        assert r.first_bin == off // 512
        assert r.last_bin == (off + tk - 1) // 512
        assert r.straddles == (r.first_bin != r.last_bin)
        off += tk


def test_hash_frac_filter_fraction_and_determinism(spark):
    from modin_spark.operators.corpus import hash_frac_filter

    d = spark.range(20000)
    kept = d.where(hash_frac_filter(F.col("id"), 0.25)).count()
    assert abs(kept / 20000 - 0.25) < 0.02
    kept2 = d.repartition(7).where(hash_frac_filter(F.col("id"), 0.25)).count()
    assert kept == kept2  # pure per-row function: partitioning-independent


def test_domain_cap(spark):
    from modin_spark.operators.corpus import domain_cap

    d = spark.createDataFrame(
        [(i, "dom%d" % (i % 3)) for i in range(100)], "k long, dom string")
    out = domain_cap(d, "dom", 5, "k")
    counts = {r["dom"]: r["n"] for r in out.groupBy("dom").agg(F.count("*").alias("n")).collect()}
    assert all(v == 5 for v in counts.values()) and len(counts) == 3
    # deterministic survivors
    a = sorted(r.k for r in out.collect())
    b = sorted(r.k for r in domain_cap(d.repartition(11), "dom", 5, "k").collect())
    assert a == b


def test_topk_ngrams_counts(spark):
    from modin_spark.operators.corpus import topk_ngrams

    d = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x y")], "doc_id long, text string")
    top = [(r.ngram, r.cnt) for r in topk_ngrams(d, "text", n=2, k=3).collect()]
    assert top[0] == ("a b", 3)  # "a b" appears twice in doc1 ("a b","b a","a b","b c") + once doc2
    assert top == sorted(top, key=lambda t: (-t[1], t[0]))


def test_label_centroids_match_numpy(spark):
    from modin_spark.operators.corpus import label_centroids

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = label_centroids(emb).toPandas()
    pdf = emb.toPandas()
    for lbl, grp in pdf.groupby("label"):
        want = np.mean(np.stack(grp["embedding"].to_numpy()), axis=0)
        sub = got[got["label"] == lbl].sort_values("pos")["c"].to_numpy()
        assert np.allclose(sub, want, atol=1e-9)


def test_classifier_score_matches_numpy(spark):
    from modin_spark.operators.corpus import classifier_score

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    w = [((i * 37) % 13 - 6) / 10.0 for i in range(64)]
    got = classifier_score(emb, w, bias=0.1).select("vec_id", "score").toPandas().set_index("vec_id")
    pdf = emb.toPandas().set_index("vec_id")
    want = 1 / (1 + np.exp(-(np.stack(pdf["embedding"].map(np.asarray)) @ np.array(w) + 0.1)))
    assert np.allclose(got.loc[pdf.index, "score"].to_numpy(), want, atol=1e-12)


def test_classifier_score_no_shuffle(spark):
    from modin_spark import plans
    from modin_spark.operators.corpus import classifier_score

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = classifier_score(emb, [0.1] * 64)
    assert "Exchange" not in plans.physical_plan(out)  # map-only pass


def test_mixture_sample_semantics_and_plan(spark):
    """Token-budgeted mixing: a domain whose target exceeds its pool keeps
    everything, unweighted domains drop, and the corpus side of the plan
    joins BROADCAST (the only hash exchange is the k-row domain aggregate)."""
    from modin_spark import plans
    from modin_spark.operators.corpus import mixture_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    w = {"src0": 0.5, "src1": 5.0}  # src1 target >> pool -> rate 1
    out = mixture_sample(docs, "source", w, total_tokens=2000, key_col="doc_id")
    pdf = out.toPandas()
    n_src1 = docs.where("source = 'src1'").count()
    assert (pdf.source == "src1").sum() == n_src1          # rate-1 domain complete
    assert set(pdf.source) <= {"src0", "src1"}             # unweighted dropped
    assert 0 < (pdf.source == "src0").sum() < docs.where("source = 'src0'").count()
    plan = plans.physical_plan(out)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    import re
    # the only hash exchange is the k-row domain-token aggregate (AQE can
    # print its query stage twice); the corpus side never shuffles
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2, plan


# ---------------------------------------------------------------------------
# REAL stdlib-only media decode (r7): PNG (zlib inflate + unfilter) and WAV
# (stdlib wave) back decode_stub=False
# ---------------------------------------------------------------------------

def test_real_png_decode_features(spark):
    import numpy as np

    from modin_spark.operators.multimodal import image_features, make_synthetic_media

    media = make_synthetic_media(spark, n=8, kind="png")
    rows = {r["media_id"]: r["features"] for r in image_features(media, dim=16, decode_stub=False).collect()}
    for i, f in rows.items():
        assert f[0] == 16.0 and f[1] == 16.0 and f[2] == 1.0  # width/height/channels
        exp_mean = float(((i * 31 + np.arange(256)) % 256).mean())
        assert abs(f[3] - exp_mean) < 1e-4
        assert abs(sum(f[5:13]) - 1.0) < 1e-5  # luma histogram density sums to 1


def test_real_png_resize(spark):
    from modin_spark.operators.media_codecs import decode_png
    from modin_spark.operators.multimodal import make_synthetic_media, resize_images

    media = make_synthetic_media(spark, n=3, kind="png")
    out = resize_images(media, size=(8, 4), decode_stub=False).collect()
    for r in out:
        assert r["meta"]["width"] == 8 and r["meta"]["height"] == 4
        arr = decode_png(bytes(r["payload"]))  # re-encoded payload is a real PNG
        assert arr.shape == (4, 8, 1)


def test_real_wav_decode_features(spark):
    from modin_spark.operators.multimodal import audio_features, make_synthetic_media

    media = make_synthetic_media(spark, n=4, kind="wav")
    rows = {r["media_id"]: r["audio_features"] for r in audio_features(media, dim=8, decode_stub=False).collect()}
    for i, f in rows.items():
        assert abs(f[0] - 0.25) < 1e-6          # duration: 2000 frames @ 8kHz
        assert abs(f[1] - 0.3536) < 2e-3        # rms of a 0.5-amplitude sine
        assert 0.0 < f[2] < 0.5                 # zero-crossing rate


def test_real_image_meta_from_png_header(spark):
    from modin_spark.operators.multimodal import attach_image_meta, make_synthetic_media

    media = make_synthetic_media(spark, n=3, kind="png")
    meta = attach_image_meta(media).collect()
    assert all(r["meta"]["format"] == "png" and r["meta"]["width"] == 16 and r["meta"]["height"] == 16 for r in meta)
    raw = make_synthetic_media(spark, n=3, kind="raw")
    meta2 = attach_image_meta(raw).collect()
    assert all(r["meta"]["format"] == "unknown" and r["meta"]["width"] >= 32 for r in meta2)


def test_normalize_text(spark):
    from modin_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [
            (1, "hello\x00 world\x07  with   runs\t\tand tabs "),
            (2, "already clean"),
            (3, "line\nbreaks\tsurvive"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in normalize_text(df).collect()}
    assert out[1]["text_norm"] == "hello world with runs and tabs"
    assert out[1]["changed"] == 1
    assert out[2]["text_norm"] == "already clean" and out[2]["changed"] == 0
    # \n survives the control strip, \t collapses into the space run
    assert "\n" in out[3]["text_norm"]
