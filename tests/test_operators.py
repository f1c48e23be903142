"""Operator tests: dedup (exact/MinHash/SimHash/Jaccard), similarity
(bruteforce/LSH/IVF), text analysis, multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from dlt_iceberg_spark.operators import (
    cosine_topk_bruteforce,
    exact_dedup,
    embedding_near_duplicates,
    hyperplane_lsh_topk,
    ivf_topk,
    language_id,
    minhash_lsh_dedup,
    minhash_signatures,
    quality_score,
    rolling_fingerprint,
    simhash,
    token_jaccard_pairs,
    token_stats,
)
from dlt_iceberg_spark.operators.multimodal import (
    attach_media_metadata,
    decode_image_features,
    sample_frames,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy dog near the river bend today"),  # near dup of 1
    (4, "completely different content about spark distributed query engines and shuffles"),
    (5, "der schnelle braune fuchs springt und das ist ein test nicht wahr"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(docs):
    out = exact_dedup(docs, ["text"], "doc_id")
    groups = {r.canonical_id: r for r in out.collect()}
    assert groups[1].n_copies == 2 and groups[1].ids == [1, 2]
    assert out.count() == 4  # 5 docs, one exact pair


def test_minhash_signature_properties(docs):
    sig = minhash_signatures(docs, "text", "doc_id", n_hashes=32)
    rows = {r.doc_id: r.signature for r in sig.collect()}
    assert len(rows[1]) == 32
    assert rows[1] == rows[2]  # identical text -> identical signature
    sim_13 = sum(a == b for a, b in zip(rows[1], rows[3])) / 32
    sim_14 = sum(a == b for a, b in zip(rows[1], rows[4])) / 32
    assert sim_13 > 0.5 > sim_14  # near-dup >> unrelated


def test_minhash_lsh_dedup_clusters(docs):
    out = minhash_lsh_dedup(docs, "text", "doc_id", n_hashes=64, bands=16, threshold=0.5)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[2].canonical_id == 1 and rows[2].is_duplicate
    assert rows[3].canonical_id == 1 and rows[3].is_duplicate
    assert not rows[4].is_duplicate and rows[4].canonical_id == 4
    assert not rows[1].is_duplicate  # canonical member of its own cluster


def test_simhash_near_dup_is_close(docs):
    rows = {r.doc_id: r.simhash for r in simhash(docs, "text", "doc_id").collect()}
    assert rows[1] == rows[2]
    ham_13 = bin((rows[1] ^ rows[3]) & ((1 << 64) - 1)).count("1")
    ham_14 = bin((rows[1] ^ rows[4]) & ((1 << 64) - 1)).count("1")
    assert ham_13 < ham_14


def test_token_jaccard_pairs(docs):
    out = {(r.a, r.b): r.jaccard for r in token_jaccard_pairs(docs, "text", "doc_id", 0.5).collect()}
    assert out[(1, 2)] == 1.0
    assert (1, 3) in out and out[(1, 3)] > 0.7
    assert (1, 4) not in out


# ---- similarity -----------------------------------------------------------

@pytest.fixture(scope="module")
def emb(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal((10, 8))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    rows.append((100, [float(x) for x in base[0] + 0.01 * rng.standard_normal(8)]))  # near-dup of 0
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_bruteforce_topk_exact(emb):
    q = emb.filter(F.col("vec_id") == 0)
    out = cosine_topk_bruteforce(q, emb, k=3).collect()
    assert [r.rank for r in out] == [1, 2, 3]
    assert out[0].neighbor_id == 100 and out[0].cosine > 0.99


def test_lsh_topk_finds_near_dup(emb):
    q = emb.filter(F.col("vec_id") == 0)
    out = hyperplane_lsh_topk(q, emb, dim=8, k=3, n_planes=4, n_tables=6).collect()
    assert out and out[0].neighbor_id == 100  # recall of the strong neighbor


def test_ivf_topk_finds_near_dup(emb):
    q = emb.filter(F.col("vec_id") == 0)
    out = ivf_topk(q, emb, k=3, n_centroids=3, nprobe=2).collect()
    assert out and out[0].neighbor_id == 100


def test_embedding_near_duplicates(emb):
    pairs = embedding_near_duplicates(emb, threshold=0.99, n_planes=4, n_tables=6).collect()
    assert any((p.a, p.b) == (0, 100) for p in pairs)


# ---- text -----------------------------------------------------------------

def test_token_stats(spark):
    df = spark.createDataFrame([(1, "hello world, foo-bar!")], "id long, text string")
    row = token_stats(df).collect()[0]
    assert row.n_tokens_ws == 3
    assert row.n_tokens_bpe == 7  # hello world , foo - bar !
    assert row.n_chars == 21


def test_quality_score_bands(spark):
    good = "the quick brown fox jumps over a lazy dog and runs to the hills again"
    bad = "x" * 500
    df = spark.createDataFrame([(1, good), (2, bad)], "id long, text string")
    rows = {r.id: r for r in quality_score(df).collect()}
    assert rows[1].quality_score == 1.0
    assert rows[2].quality_score <= 0.25


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog sat in a warm corner of the house"),
            (2, "der hund und die katze das ist nicht ein problem"),
            (3, "el perro y la casa es una historia que los vecinos cuentan"),
            (4, "zzz qqq xxx"),
        ],
        "id long, text string",
    )
    rows = {r.id: r for r in language_id(df).collect()}
    assert rows[1].lang_pred == "en"
    assert rows[2].lang_pred == "de"
    assert rows[3].lang_pred == "es"
    assert rows[4].lang_pred == "und"


def test_rolling_fingerprint_stable_under_distant_edit(spark):
    base = " ".join(f"tok{i}" for i in range(200))
    edited = base + " tail-edit"
    df = spark.createDataFrame([(1, base), (2, edited), (3, "small")], "id long, text string")
    rows = {r.id: r for r in rolling_fingerprint(df).collect()}
    assert rows[1].n_anchors > 0
    # winnowed anchor sets overlap heavily; identical prefix keeps most anchors
    assert rows[1].fingerprint != rows[3].fingerprint


# ---- multimodal -----------------------------------------------------------

def test_media_metadata_and_fake_decode(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"fake-image-bytes-1")), (2, bytearray(b"fake-image-bytes-2"))],
        "doc_id long, payload binary",
    )
    tagged = attach_media_metadata(df, "payload", "image", "image/png")
    row = tagged.collect()[0]
    assert row.media_meta.modality == "image"
    assert row.payload_bytes == 18 and len(row.payload_sha) == 64

    feats = decode_image_features(df, fake=True)
    rows = {r.doc_id: r for r in feats.collect()}
    assert len(rows[1].feature) == 16
    assert rows[1].feature != rows[2].feature
    # deterministic: rerun yields identical features
    rows2 = {r.doc_id: r for r in decode_image_features(df, fake=True).collect()}
    assert rows[1].feature == rows2[1].feature


def test_real_decode_is_stubbed(spark):
    df = spark.createDataFrame([(1, bytearray(b"x"))], "doc_id long, payload binary")
    with pytest.raises(Exception, match="NotImplementedError|real image decode"):
        decode_image_features(df, fake=False).collect()


def test_sample_frames_plumbing(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"v" * 5000))], "doc_id long, payload binary"
    )
    out = sample_frames(df, every_n_bytes=1024, max_frames=3).collect()
    assert [r.byte_offset for r in out] == [0, 1024, 2048]


def test_simhash_near_dup_pairs(docs):
    from dlt_iceberg_spark.operators.dedup import simhash_near_dup_pairs

    # exact dup (1,2): hamming 0 must always pair; unrelated docs must not
    out = {(r.a, r.b): r.hamming for r in simhash_near_dup_pairs(docs, "text", "doc_id", max_hamming=6).collect()}
    assert out.get((1, 2)) == 0
    assert (1, 4) not in out and (4, 5) not in out
