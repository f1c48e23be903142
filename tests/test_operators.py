"""Operator tests: dedup (exact/MinHash/SimHash/Jaccard), similarity
(bruteforce/LSH/IVF), text analysis, multimodal plumbing."""

import math

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


import importlib.util as _ilu

_HAS_PIL = _ilu.find_spec("PIL") is not None


@pytest.mark.skipif(_HAS_PIL, reason="Pillow installed: fake=False decodes for real")
def test_real_decode_raises_without_codec(spark):
    """Without Pillow the real route must raise a message naming BOTH
    routes (install Pillow / use fake=True) — never silently stub."""
    df = spark.createDataFrame([(1, bytearray(b"x"))], "doc_id long, payload binary")
    with pytest.raises(Exception, match="real image decode.*Pillow"):
        decode_image_features(df, fake=False).collect()
    with pytest.raises(Exception, match="fake=True"):
        decode_image_features(df, fake=False).collect()


@pytest.mark.skipif(not _HAS_PIL, reason="Pillow not installed in this container")
def test_real_codec_path_with_pillow(spark):
    """Autodetected real path (runs wherever Pillow exists): decode a real
    PNG into 16 grayscale intensities and resize it; corrupt payloads get
    decode_ok=False instead of failing the job."""
    import io as _io

    from PIL import Image

    buf = _io.BytesIO()
    Image.new("L", (8, 8), color=200).save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(b"not-an-image"))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in decode_image_features(df, fake=False).collect()}
    assert rows[1].decode_ok and len(rows[1].feature) == 16
    assert all(abs(v - 200 / 255.0) < 1e-6 for v in rows[1].feature)
    assert not rows[2].decode_ok and rows[2].feature == [0.0] * 16

    from dlt_iceberg_spark.operators.multimodal import resize_images

    out = {r.doc_id: r for r in resize_images(df, 4, 2, fake=False).collect()}
    assert len(bytes(out[1].resized)) == 8 and all(b == 200 for b in bytes(out[1].resized))
    assert bytes(out[2].resized) == bytes(8)


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


# ---- accuracy contracts for the approximate/verified paths ----------------

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_real(spark):
    from dlt_iceberg_spark.io import load_table

    return load_table(spark, SF_DIR, "embeddings")


def _recall_at_k(approx_rows, exact_rows, k):
    from collections import defaultdict

    approx, exact = defaultdict(set), defaultdict(set)
    for r in approx_rows:
        approx[r.query_id].add(r.neighbor_id)
    for r in exact_rows:
        if r.rank <= k:
            exact[r.query_id].add(r.neighbor_id)
    hits = total = 0
    for q, truth in exact.items():
        hits += len(truth & approx[q])
        total += len(truth)
    return hits / total


def test_ivf_recall_vs_bruteforce(emb_real):
    """ann_ivf is registered rows-only (k-means not SQL-replayable); THIS is
    its accuracy contract: recall@5 vs the oracle-verified exact brute force."""
    q = emb_real.filter(F.col("vec_id") < 8)
    exact = cosine_topk_bruteforce(q, emb_real, k=5).collect()
    # the fixture embeddings are near-random (the hardest case for ANN:
    # neighbors barely stand out), so probe half the lists; random baseline
    # for recall@5 over 500 vectors is ~1%
    approx = ivf_topk(q, emb_real, k=5, n_centroids=16, nprobe=8).collect()
    assert _recall_at_k(approx, exact, 5) >= 0.8


def test_pq_recall_vs_bruteforce(emb_real):
    """ann_pq rows-only justification: ADC ranking must agree with exact
    cosine ranking well above the ~1% random baseline (PQ is lossy by
    design, and the near-random fixture embeddings are its worst case)."""
    from dlt_iceberg_spark.operators.quantization import pq_encode, pq_topk, pq_train

    q = emb_real.filter(F.col("vec_id") < 8)
    exact = cosine_topk_bruteforce(q, emb_real, k=5).collect()
    books = pq_train(emb_real, m_subspaces=16, k_codes=16)
    codes = pq_encode(emb_real, books)
    approx = pq_topk(q, codes, books, k=5).collect()
    assert _recall_at_k(approx, exact, 5) >= 0.3


def test_blas_kernel_row_budget_guard(emb_real):
    from dlt_iceberg_spark.operators.similarity import all_pairs_cosine_blas

    with pytest.raises(ValueError, match="max_rows"):
        all_pairs_cosine_blas(emb_real, threshold=0.9, max_rows=10)


def test_blocked_all_pairs_matches_blas(emb_real):
    """The distributed blocked kernel must produce exactly the broadcast-BLAS
    kernel's pair set (both exact algorithms)."""
    from dlt_iceberg_spark.operators.similarity import (
        all_pairs_cosine_blas,
        all_pairs_cosine_blocked,
    )

    blas = {
        (r.a, r.b): round(r.cosine, 9)
        for r in all_pairs_cosine_blas(emb_real, threshold=0.3).collect()
    }
    blocked = {
        (r.a, r.b): round(r.cosine, 9)
        for r in all_pairs_cosine_blocked(emb_real, threshold=0.3, block_rows=64).collect()
    }
    assert blas == blocked and len(blas) > 0


def test_minhash_verified_pairs_exact(spark):
    """LSH-candidates + exact verify must equal brute-force token Jaccard on
    the full fixture corpus (deterministic recall at bands=32, rows=2)."""
    from dlt_iceberg_spark.io import load_table
    from dlt_iceberg_spark.operators.dedup import minhash_verified_pairs

    d = load_table(spark, SF_DIR, "documents")
    exact = {
        (r.a, r.b): round(r.jaccard, 9)
        for r in token_jaccard_pairs(d, "text", "doc_id", 0.8).collect()
    }
    lsh = {
        (r.a, r.b): round(r.jaccard, 9)
        for r in minhash_verified_pairs(
            d, "text", "doc_id", n_hashes=64, bands=32, shingle_k=1, threshold=0.8
        ).collect()
    }
    assert lsh == exact and len(exact) > 100


def test_token_set_similarity_join_bitmask_exact(spark):
    """The small-universe bitmask path (fixture vocab ≈ 31 tokens ≤ 64) must
    equal brute-force token Jaccard on the full fixture corpus — with no
    probabilistic caveat at all (no hashing in the pipeline)."""
    from dlt_iceberg_spark.io import load_table
    from dlt_iceberg_spark.operators.dedup import token_set_similarity_join

    d = load_table(spark, SF_DIR, "documents")
    exact = {
        (r.a, r.b): round(r.jaccard, 9)
        for r in token_jaccard_pairs(d, "text", "doc_id", 0.8).collect()
    }
    got = {
        (r.a, r.b): round(r.jaccard, 9)
        for r in token_set_similarity_join(d, "text", "doc_id", 0.8).collect()
    }
    assert got == exact and len(exact) > 100


def test_token_set_similarity_join_large_vocab_path(spark):
    """Vocabularies above the bitmask budget must route to the classed LSH
    path and still match brute force (here: >64 distinct tokens)."""
    from dlt_iceberg_spark.operators.dedup import token_set_similarity_join

    rows = []
    for i in range(40):
        base = [f"tok{i}_{j}" for j in range(10)]
        rows.append((2 * i, " ".join(base)))
        rows.append((2 * i + 1, " ".join(base[:9] + [f"alt{i}"])))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {
        (r.a, r.b): round(r.jaccard, 9)
        for r in token_jaccard_pairs(df, "text", "doc_id", 0.8).collect()
    }
    got = {
        (r.a, r.b): round(r.jaccard, 9)
        for r in token_set_similarity_join(df, "text", "doc_id", 0.8).collect()
    }
    assert got == exact and len(exact) == 40  # each base/alt pair: j = 9/11 ≈ 0.818


def test_substring_dup_stats(spark):
    """Window accounting: duplicated spans need >= 2 DISTINCT docs; docs
    shorter than the window have zero windows; within-doc repeats alone
    don't count."""
    from dlt_iceberg_spark.operators.dedup import substring_dup_stats

    shared = "one two three four five six seven eight nine ten"
    rows = [
        (1, shared + " alpha beta"),          # 3 windows, first shared with doc 2
        (2, shared),                          # 1 window, shared with doc 1
        (3, "short doc"),                     # < 10 tokens: no windows
        (4, "a b c d e f g h i j a b c d e f g h i j"),  # self-repeat only
    ]
    out = {
        r.doc_id: r
        for r in substring_dup_stats(
            spark.createDataFrame(rows, "doc_id long, text string"), "text", "doc_id", 10
        ).collect()
    }
    assert out[1].n_windows == 3 and out[1].n_dup_windows == 1
    assert out[2].n_windows == 1 and out[2].n_dup_windows == 1
    assert out[3].n_windows == 0 and out[3].dup_fraction == 0.0
    assert out[4].n_windows == 11 and out[4].n_dup_windows == 0
    assert abs(out[1].dup_fraction - 1 / 3) < 1e-9


def test_simhash_md5_mode_matches_xx_structure(docs):
    """hash_mode only changes the token hash function, not the simhash
    semantics: exact dups still collide, near dups still beat unrelated."""
    rows = {r.doc_id: r.simhash for r in simhash(docs, "text", "doc_id", hash_mode="md5").collect()}
    assert rows[1] == rows[2]
    ham_13 = bin((rows[1] ^ rows[3]) & ((1 << 64) - 1)).count("1")
    ham_14 = bin((rows[1] ^ rows[4]) & ((1 << 64) - 1)).count("1")
    assert ham_13 < ham_14
    # md5 mode uses 60-bit token hashes -> bits 60..63 always clear
    assert all(v >= 0 and v < (1 << 60) for v in rows.values())


def test_rolling_fingerprint_md5_mode(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l m n o p"), (2, "a b c d e f g h i j k l m n o p")],
        "doc_id long, text string",
    )
    out = rolling_fingerprint(df, "text", hash_mode="md5").collect()
    assert out[0].fingerprint == out[1].fingerprint
    assert isinstance(out[0].fingerprint, str) and len(out[0].fingerprint) == 32


def test_ivfpq_recall_vs_bruteforce(emb_real):
    """IVF-PQ composite (FAISS index shape): recall@5 must clearly beat the
    ~1% random baseline on the near-random fixture (bounded below PQ alone
    since probing only shrinks the candidate set)."""
    from dlt_iceberg_spark.operators.quantization import ivfpq_topk

    q = emb_real.filter(F.col("vec_id") < 8)
    exact = cosine_topk_bruteforce(q, emb_real, k=5).collect()
    approx = ivfpq_topk(
        q, emb_real, k=5, n_centroids=16, nprobe=8, m_subspaces=16, k_codes=16
    ).collect()
    assert _recall_at_k(approx, exact, 5) >= 0.2
    # every returned neighbor must come from a probed list (no leakage)
    assert all(r.rank <= 5 for r in approx)


def test_repetition_stats(spark):
    from dlt_iceberg_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "w x y z"), (3, "solo")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert rows[1].distinct_token_ratio == 0.5
    assert rows[1].top_token_ratio == 0.75
    assert abs(rows[1].dup_bigram_ratio - (1 - 2 / 3)) < 1e-9
    assert rows[2].distinct_token_ratio == 1.0
    assert rows[2].top_token_ratio == 0.25
    assert rows[2].dup_bigram_ratio == 0.0
    assert rows[3].top_token_ratio == 1.0 and rows[3].dup_bigram_ratio == 0.0


def test_semantic_dedup_sound_and_cluster_complete(emb_real):
    """semantic_dedup is registered rows-only (k-means not SQL-replayable);
    THIS is its accuracy contract against the exact pair set (which IS
    oracle-verified as embedding_near_dup):

    - soundness: every flagged duplicate has a genuine cosine-≥-threshold
      partner in the corpus;
    - within-cluster completeness: every exact pair whose endpoints share a
      cluster is caught (the only misses SemDeDup allows are cross-cluster,
      the paper's documented trade).
    """
    from dlt_iceberg_spark.operators.similarity import (
        all_pairs_cosine_blocked,
        semantic_dedup,
    )

    thr = 0.4
    out = semantic_dedup(emb_real, "embedding", "vec_id", n_clusters=8, threshold=thr)
    rows = {r.vec_id: r for r in out.collect()}
    exact_pairs = {
        (r.a, r.b)
        for r in all_pairs_cosine_blocked(emb_real, threshold=thr, block_rows=128).collect()
    }
    partners = {}
    for a, b in exact_pairs:
        partners.setdefault(a, set()).add(b)
        partners.setdefault(b, set()).add(a)

    assert len(rows) == emb_real.count()
    dup_count = 0
    for r in rows.values():
        if r.is_duplicate:
            dup_count += 1
            # canonical really is a ≥-threshold partner, smaller id
            assert r.canonical_id in partners.get(r.vec_id, set())
            assert r.canonical_id < r.vec_id
        else:
            assert r.canonical_id == r.vec_id
    assert dup_count > 0  # the fixture corpus does contain near-dups

    for a, b in exact_pairs:
        if rows[a].cluster == rows[b].cluster:
            hi = max(a, b)
            assert rows[hi].is_duplicate and rows[hi].canonical_id <= min(a, b)

    # deterministic: same centroids (seeded, hash-gated sample), same output
    again = {
        r.vec_id: (r.cluster, r.canonical_id, r.is_duplicate)
        for r in semantic_dedup(
            emb_real, "embedding", "vec_id", n_clusters=8, threshold=thr
        ).collect()
    }
    assert again == {k: (r.cluster, r.canonical_id, r.is_duplicate) for k, r in rows.items()}


def test_semantic_dedup_cluster_cap_matches_uncapped(emb_real):
    """Oversized clusters must never materialize whole in one task: with
    n_clusters=1 EVERY row lands in one cluster, and a max_cluster_rows far
    below the corpus forces the block-pair path (per-task rows hard-capped
    at max_cluster_rows).  The capped answer must be IDENTICAL to the
    uncapped whole-cluster answer — both implement the same star rule."""
    from dlt_iceberg_spark.operators.similarity import semantic_dedup

    thr = 0.4
    n = emb_real.count()
    uncapped = {
        r.vec_id: (r.cluster, r.canonical_id, r.is_duplicate)
        for r in semantic_dedup(
            emb_real, "embedding", "vec_id", n_clusters=1, threshold=thr,
            max_cluster_rows=10**9,
        ).collect()
    }
    capped_df = semantic_dedup(
        emb_real, "embedding", "vec_id", n_clusters=1, threshold=thr,
        max_cluster_rows=32,
    )
    capped = {
        r.vec_id: (r.cluster, r.canonical_id, r.is_duplicate)
        for r in capped_df.collect()
    }
    assert n > 32  # the degenerate cluster genuinely exceeds the cap
    assert capped == uncapped
    assert sum(1 for v in capped.values() if v[2]) > 0  # fixture has dups


def test_semantic_dedup_auto_cluster_count(emb_real):
    """n_clusters=None scales the cluster count with the corpus instead of
    a fixed 16 — tiny corpus clamps to the floor of 16 clusters."""
    from dlt_iceberg_spark.operators.similarity import semantic_dedup

    out = semantic_dedup(
        emb_real, "embedding", "vec_id", n_clusters=None, threshold=0.4,
        target_cluster_rows=8,
    )
    n_clusters_seen = out.select("cluster").distinct().count()
    assert 1 < n_clusters_seen <= 66  # 500/8+1 = 63 clusters requested, clamped ≥16
    assert out.count() == emb_real.count()


def test_char_ngram_jaccard_pairs(docs):
    from dlt_iceberg_spark.operators.dedup import char_ngram_jaccard_pairs

    out = {
        (r.a, r.b): r.jaccard
        for r in char_ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5).collect()
    }
    assert out[(1, 2)] == 1.0  # identical text -> identical trigram set
    assert (1, 3) in out and out[(1, 3)] > 0.7  # one-word edit stays close
    assert (1, 4) not in out  # unrelated content


def _inc_corpus_rows():
    # realistic vocabulary (500 distinct words) so LSH banding actually
    # prunes: deterministic docs of 20 words each, stride-based so token
    # sets overlap little between unrelated docs
    rows = []
    for i in range(40):
        words = [f"w{(i * 37 + 7 * j) % 500}" for j in range(20)]
        rows.append((i, " ".join(words)))
    return rows


@pytest.mark.slow
def test_batch_vs_corpus_dedup_strategies_agree(spark):
    from dlt_iceberg_spark.operators.dedup import (
        batch_vs_corpus_dedup,
        build_dedup_index,
    )

    corpus = spark.createDataFrame(_inc_corpus_rows(), "doc_id long, text string")
    # batch: one exact copy of doc 3, one near-dup of doc 5 (one word
    # swapped: jaccard 19/21 ≈ 0.905), two novel docs
    near = _inc_corpus_rows()[5][1].replace("w192 ", "w9999 ", 1)
    batch = spark.createDataFrame(
        [
            (100, _inc_corpus_rows()[3][1]),
            (101, near),
            (102, " ".join(f"n{j}" for j in range(20))),
            (103, " ".join(f"m{j}" for j in range(20))),
        ],
        "doc_id long, text string",
    )
    idx = build_dedup_index(corpus, "text", "doc_id").localCheckpoint(eager=True)
    lsh = sorted(
        (r.corpus_id, r.batch_id, round(r.jaccard, 9))
        for r in batch_vs_corpus_dedup(batch, idx, "text", "doc_id", strategy="lsh").collect()
    )
    allp = sorted(
        (r.corpus_id, r.batch_id, round(r.jaccard, 9))
        for r in batch_vs_corpus_dedup(
            batch, idx, "text", "doc_id", strategy="allpairs"
        ).collect()
    )
    # the banding path retrieves exactly the all-pairs-verified pair set
    assert lsh == allp
    # vocabulary here exceeds 64 tokens -> 'bitmask' falls back to allpairs
    # and 'auto' picks lsh; all agree
    bm = sorted(
        (r.corpus_id, r.batch_id, round(r.jaccard, 9))
        for r in batch_vs_corpus_dedup(
            batch, idx, "text", "doc_id", strategy="bitmask"
        ).collect()
    )
    auto = sorted(
        (r.corpus_id, r.batch_id, round(r.jaccard, 9))
        for r in batch_vs_corpus_dedup(
            batch, idx, "text", "doc_id", strategy="auto"
        ).collect()
    )
    assert bm == allp and auto == allp
    pairs = dict(((a, b), j) for a, b, j in allp)
    assert pairs[(3, 100)] == 1.0  # exact copy via the class-key path
    assert abs(pairs[(5, 101)] - 19 / 21) < 1e-9  # near-dup via banding
    batch_ids = {b for _, b, _ in allp}
    assert 102 not in batch_ids and 103 not in batch_ids  # novel docs clean

    with pytest.raises(ValueError):
        batch_vs_corpus_dedup(batch, idx, "text", "doc_id", strategy="bogus")


def test_build_dedup_index_collapses_exact_dups(spark):
    from dlt_iceberg_spark.operators.dedup import build_dedup_index

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "c b a"), (4, "x y z")],
        "doc_id long, text string",
    )
    idx = {tuple(r.ids): r for r in build_dedup_index(df, "text", "doc_id").collect()}
    # same token SET (order-independent) -> one class with all members
    assert (1, 2, 3) in idx and (4,) in idx
    sig = idx[(1, 2, 3)].signature
    assert len(sig) == 64 and len(idx[(4,)].signature) == 64
    assert sig != idx[(4,)].signature


@pytest.mark.slow
def test_batch_vs_corpus_dedup_bitmask_small_vocab(spark):
    from dlt_iceberg_spark.operators.dedup import (
        batch_vs_corpus_dedup,
        build_dedup_index,
    )

    # ≤64-token vocabulary: 'auto' must route to the exact bitmask path and
    # agree with allpairs
    corpus = spark.createDataFrame(
        [(i, " ".join(f"v{(i + j) % 30}" for j in range(10))) for i in range(25)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(100, " ".join(f"v{(3 + j) % 30}" for j in range(10))),  # exact dup of doc 3
         (101, " ".join(f"v{(7 + j) % 30}" for j in range(9)) + " v999")],  # near doc 7
        "doc_id long, text string",
    )
    idx = build_dedup_index(corpus, "text", "doc_id").localCheckpoint(eager=True)
    out = {}
    for strat in ("auto", "bitmask", "allpairs"):
        out[strat] = sorted(
            (r.corpus_id, r.batch_id, round(r.jaccard, 9))
            for r in batch_vs_corpus_dedup(
                batch, idx, "text", "doc_id", threshold=0.8, strategy=strat
            ).collect()
        )
    assert out["auto"] == out["bitmask"] == out["allpairs"]
    pairs = dict(((a, b), j) for a, b, j in out["auto"])
    assert pairs[(3, 100)] == 1.0
    assert abs(pairs[(7, 101)] - 9 / 11) < 1e-9


def test_audio_windows_framing(spark):
    from dlt_iceberg_spark.operators.multimodal import audio_windows

    df = spark.createDataFrame(
        [(1, b"x" * 300), (2, b"y" * 50), (3, b"z" * 5000)],
        "doc_id long, payload binary",
    )
    out = sorted(
        (r.doc_id, r.window_idx, r.start_byte, r.window_len)
        for r in audio_windows(
            df, window_bytes=128, hop_bytes=64, max_windows=10
        ).collect()
    )
    by_doc = {}
    for d, i, s, l in out:
        by_doc.setdefault(d, []).append((i, s, l))
    # 300 bytes, w=128 h=64: full windows at 0,64,128 -> floor((300-128)/64)+1 = 3
    assert by_doc[1] == [(0, 0, 128), (1, 64, 128), (2, 128, 128)]
    # shorter than one window: a single truncated window
    assert by_doc[2] == [(0, 0, 50)]
    # long payload capped at max_windows
    assert len(by_doc[3]) == 10 and by_doc[3][-1] == (9, 576, 128)


def test_resize_images_plumbing(spark):
    from dlt_iceberg_spark.operators.multimodal import resize_images

    df = spark.createDataFrame(
        [(1, b"abcdefgh"), (2, b"xy")], "doc_id long, payload binary"
    )
    out = {r.doc_id: r for r in resize_images(df, 2, 2, fake=True).collect()}
    # every output has exactly width*height bytes
    assert all(len(r.resized) == 4 for r in out.values())
    assert (out[1].width, out[1].height, out[1].orig_bytes) == (2, 2, 8)
    # downscale strides the source; upscale cycles it
    assert bytes(out[1].resized) == b"aceg"  # indices (i*8)//4 = 0,2,4,6
    assert bytes(out[2].resized) == b"xxyy"  # indices (i*2)//4 = 0,0,1,1

    if not _HAS_PIL:  # with Pillow present, fake=False resizes for real
        with pytest.raises(Exception, match="real image resize.*Pillow"):
            resize_images(df, 2, 2, fake=False).collect()


@pytest.mark.slow
def test_dsir_prefers_target_like_documents(spark):
    """DSIR semantic contract (operators/dsir.py, Xie et al. 2023): docs
    sharing the target corpus' n-gram distribution must outscore docs from
    a disjoint vocabulary, and the selection must be retry-deterministic."""
    from dlt_iceberg_spark.operators.dsir import dsir_select

    target_vocab = [f"sci{i}" for i in range(30)]
    web_vocab = [f"spam{i}" for i in range(30)]
    rows = []
    for i in range(40):
        v = target_vocab if i < 20 else web_vocab
        words = [v[(i * 7 + 3 * j) % 30] for j in range(25)]
        rows.append((i, " ".join(words)))
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [(100 + i, " ".join(target_vocab[(i + j) % 30] for j in range(25)))
         for i in range(10)],
        "doc_id long, text string",
    )

    picked = dsir_select(corpus, target, keep_n=20, noise=0.0).collect()
    assert len(picked) == 20
    # hard top-k with no noise: exactly the target-vocabulary half wins
    assert {r.doc_id for r in picked} == set(range(20))
    # and the separation is wide: every kept score beats every dropped one
    all_scores = {
        r.doc_id: r.log_importance
        for r in dsir_select(corpus, target, keep_n=40, noise=0.0).collect()
    }
    assert min(all_scores[i] for i in range(20)) > max(
        all_scores[i] for i in range(20, 40)
    )

    # with Gumbel noise the pick is still deterministic across reruns
    a = {(r.doc_id, r.rank) for r in dsir_select(corpus, target, keep_n=10).collect()}
    b = {(r.doc_id, r.rank) for r in dsir_select(corpus, target, keep_n=10).collect()}
    assert a == b
    # and a different seed reshuffles (noise actually applied)
    c = {(r.doc_id, r.rank) for r in dsir_select(corpus, target, keep_n=10, seed="other").collect()}
    assert {x for x, _ in a} != {x for x, _ in c} or a != c


def test_dsir_feature_plan_is_mapside(spark):
    """hashed_ngram_features must be expression work + ONE aggregation —
    no join, no extra exchange beyond the (id,bucket) groupBy."""
    from dlt_iceberg_spark.operators.dsir import hashed_ngram_features
    from dlt_iceberg_spark.plans import exchange_count

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    feats = hashed_ngram_features(df)
    assert exchange_count(feats) <= 1


@pytest.mark.slow
def test_dsir_and_lm_persist_reused_lineage(spark, tmp_path):
    """VERDICT r4 task 4: the feature/score tables that feed two consumers
    must be persisted — the physical plan reads an InMemoryRelation (one
    extraction pass) instead of duplicating the tokenize/explode/hash
    lineage, and results are unchanged."""
    from dlt_iceberg_spark.operators.dsir import dsir_select
    from dlt_iceberg_spark.operators.lm import perplexity_filter

    corpus = spark.createDataFrame(
        [(i, " ".join(f"w{(i + j) % 9}" for j in range(12))) for i in range(30)],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(100, " ".join(f"w{j % 9}" for j in range(12)))], "doc_id long, text string"
    )
    sel = dsir_select(corpus, target, keep_n=5, noise=0.0, persist_features=True)
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan
    assert len(sel.collect()) == 5

    filt = perplexity_filter(corpus, target, buckets=2, persist_scores=True)
    plan = filt._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan
    assert filt.count() == 30
    # size-adaptive default: a tiny corpus skips the persist, results equal
    a = sorted(map(tuple, perplexity_filter(corpus, target, buckets=2).collect()))
    b = sorted(map(tuple, filt.collect()))
    assert a == b

    # train_bigram_lm gates its model persist the same way (VERDICT r5 #2:
    # it used to pin DISK_ONLY unconditionally — at toy scale the
    # materialization costs more than recomputation).  The gate reads
    # Catalyst's plan-size stat, which is unknown (= huge, persist — the
    # safe direction) for createDataFrame plans, so exercise the default
    # through a parquet-backed target whose size is real.
    from dlt_iceberg_spark.operators.lm import train_bigram_lm

    target.write.parquet(str(tmp_path / "lm_target"))
    small = spark.read.parquet(str(tmp_path / "lm_target"))
    bg, _, _ = train_bigram_lm(small)  # tiny target: no persist
    assert not bg.storageLevel.useDisk and not bg.storageLevel.useMemory
    bg2, _, _ = train_bigram_lm(target, persist_model=True)
    assert bg2.storageLevel.useDisk
    bg2.unpersist()


def test_lm_perplexity_separates_target_like_docs(spark):
    """Bigram-LM filter (operators/lm.py): documents drawn from the target
    distribution must have higher mean log-prob than disjoint-vocabulary
    documents, short docs are absent, and buckets are equal-frequency."""
    from dlt_iceberg_spark.operators.lm import (
        lm_score,
        perplexity_filter,
        train_bigram_lm,
    )

    target_rows = [
        (100 + i, " ".join(f"w{(i + j) % 12}" for j in range(30))) for i in range(8)
    ]
    target = spark.createDataFrame(target_rows, "doc_id long, text string")
    corpus = spark.createDataFrame(
        [
            (1, " ".join(f"w{j % 12}" for j in range(20))),       # in-distribution
            (2, " ".join(f"z{j}" for j in range(20))),            # out-of-distribution
            (3, "solo"),                                          # unscoreable (1 token)
        ],
        "doc_id long, text string",
    )
    bigrams, contexts, vocab = train_bigram_lm(target)
    assert vocab == 12
    rows = {r.doc_id: r for r in lm_score(corpus, bigrams, contexts, vocab).collect()}
    assert set(rows) == {1, 2}  # doc 3 has nothing to score
    assert rows[1].n_scored == 19 and rows[2].n_scored == 19
    assert rows[1].logp_mean > rows[2].logp_mean
    # OOV context floor: every pair of doc 2 is unseen -> exactly ln(1/V)
    import math

    assert abs(rows[2].logp_mean - math.log(0.5 / (0.5 * 12))) < 1e-9

    buckets = {
        r.doc_id: r.ppl_bucket
        for r in perplexity_filter(corpus, target, buckets=2).collect()
    }
    assert buckets[1] == 1 and buckets[2] == 2  # head vs tail


@pytest.mark.slow
def test_persisted_dedup_index_lifecycle(spark, tmp_path):
    """The incremental-dedup index as a PERSISTED LakeTable (the production
    shape): write once, probe each arriving batch, append only novel
    classes — re-appending the same batch is a no-op, later batches match
    classes added by earlier ones, and probing the maintained table equals
    probing a freshly rebuilt index."""
    from dlt_iceberg_spark.lake.table import LakeTable
    from dlt_iceberg_spark.operators.dedup import (
        append_novel_classes,
        batch_vs_corpus_dedup,
        build_dedup_index,
        write_dedup_index,
    )

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "delta epsilon zeta"),
            (3, "eta theta iota"),
            (4, "eta theta iota"),  # exact dup of 3 -> same class
        ],
        "doc_id long, text string",
    )
    t = LakeTable(spark, str(tmp_path / "idx"))
    write_dedup_index(t, corpus, "text", "doc_id")
    n0 = t.read().count()
    assert n0 == 3  # three token-set classes

    batch1 = spark.createDataFrame(
        [(10, "alpha beta gamma"), (11, "kappa lambda mu")],
        "doc_id long, text string",
    )
    pairs1 = {
        (r.corpus_id, r.batch_id, r.jaccard)
        for r in batch_vs_corpus_dedup(batch1, t.read(), "text", "doc_id").collect()
    }
    assert (1, 10, 1.0) in pairs1  # identical content found
    v1 = append_novel_classes(t, batch1, "text", "doc_id").version
    assert t.read().count() == n0 + 1  # only doc 11's class is novel
    # idempotent: same batch again appends nothing, commits nothing
    assert append_novel_classes(t, batch1, "text", "doc_id").version == v1
    assert t.read().count() == n0 + 1

    # a later batch matches the class batch1 added (canonical id = 11)
    batch2 = spark.createDataFrame(
        [(20, "kappa lambda mu"), (21, "nu xi omicron")],
        "doc_id long, text string",
    )
    maintained = {
        (r.corpus_id, r.batch_id)
        for r in batch_vs_corpus_dedup(batch2, t.read(), "text", "doc_id").collect()
    }
    assert (11, 20) in maintained
    # equivalence with a from-scratch rebuild over the same canonical docs
    rebuilt_corpus = corpus.unionByName(
        spark.createDataFrame([(11, "kappa lambda mu")], "doc_id long, text string")
    )
    fresh = {
        (r.corpus_id, r.batch_id)
        for r in batch_vs_corpus_dedup(
            batch2, build_dedup_index(rebuilt_corpus, "text", "doc_id"), "text", "doc_id"
        ).collect()
    }
    assert maintained == fresh
    # the stored table is a real table: snapshot history + ck stats
    assert [s.operation for s in t.snapshots()][:2] == ["create", "append"]
    assert all("ck" in f.stats for f in t.snapshot().files)


def test_gopher_rules_full_matrix(spark):
    """Each Gopher rule family flags its crafted offender and passes clean
    text; formulas follow the documented conventions exactly."""
    from dlt_iceberg_spark.operators.text import gopher_rules

    clean_words = ("the data pipeline reads and writes files that have been "
                   "stored with care because every stage of processing must "
                   "remain stable and fast for users across many regions of "
                   "the world while keeping costs low and quality high so "
                   "that teams can trust results every single day without any fail")
    docs = [
        (1, clean_words),                                     # passes all
        (2, "short text"),                                    # word count < 50
        (3, "#### " * 60),                                    # symbol ratio + alpha
        (4, "\n".join(["- bullet item " + str(i) for i in range(10)])),  # bullets
        (5, "\n".join(["same line"] * 8 + ["unique line"])),  # dup lines
        (6, "spam phrase " * 40),                             # top-2gram + rep
        (7, " ".join("w%d" % i for i in range(60))),          # no req stopwords
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r.doc_id: r for r in gopher_rules(df).collect()}

    assert rows[1].gopher_keep
    assert rows[1].n_words == 50 and rows[1].req_stopword_count >= 2

    assert not rows[2].gopher_keep and rows[2].n_words == 2

    assert rows[3].symbol_word_ratio > 0.1 and rows[3].alpha_word_frac < 0.8
    assert not rows[3].gopher_keep

    assert rows[4].bullet_line_frac == 1.0 and not rows[4].gopher_keep

    assert abs(rows[5].dup_line_frac - (1 - 2 / 9)) < 1e-9
    assert rows[5].dup_line_char_frac > 0.2 and not rows[5].gopher_keep

    # "spam phrase spam phrase ..." -> the top bigram covers most chars
    assert rows[6].top_2gram_char_frac > 0.2
    assert rows[6].dup_5gram_char_frac > 0.15
    assert not rows[6].gopher_keep

    assert rows[7].req_stopword_count == 0 and not rows[7].gopher_keep

    # single-line docs: line/paragraph features are well-defined zeros
    assert rows[1].dup_line_frac == 0.0 and rows[1].dup_para_char_frac == 0.0


def test_c4_rules_line_and_page_filters(spark):
    """C4 §2.2: terminal-punctuation + ≥5-word + javascript line rules,
    curly-brace / lorem-ipsum / three-line page rules, and the cleaned
    re-joined text."""
    from dlt_iceberg_spark.operators.text import c4_rules

    good = "\n".join(
        [
            "this line has enough words and ends well.",
            "does this second line also qualify for keeping?",
            'the third line is quoted so it ends with a mark"',
            "short line.",                       # < 5 words -> dropped
            "no terminal punctuation here at all",  # no punct -> dropped
            "this page uses javascript for everything.",  # js -> dropped
        ]
    )
    docs = [
        (1, good),
        (2, good + "\nalso { a brace somewhere."),
        (3, good.replace("quoted", "Lorem Ipsum")),
        (4, "one fine sentence stands alone here today."),  # < 3 kept lines
    ]
    rows = {r.doc_id: r for r in c4_rules(
        spark.createDataFrame(docs, "doc_id long, text string")).collect()}

    assert rows[1].n_lines_total == 6 and rows[1].n_lines_kept == 3
    assert rows[1].c4_keep
    assert rows[1].cleaned_text.count("\n") == 2
    assert "javascript" not in rows[1].cleaned_text
    assert "short line." not in rows[1].cleaned_text

    assert rows[2].has_curly and not rows[2].c4_keep
    assert rows[3].has_lorem_ipsum and not rows[3].c4_keep
    assert rows[4].n_lines_kept == 1 and not rows[4].c4_keep


def test_gopher_oracle_keeps_zero_gram_documents(spark, tmp_path):
    """ADVICE r5: a document with fewer than 2 whitespace tokens produces no
    n-gram rows, so the oracle's gp CTE has no row for it — an inner join
    dropped such docs while the operator emits them with zeroed fractions.
    Pin Spark-vs-DuckDB parity on a fixture that contains empty, 1-token,
    and normal documents."""
    import duckdb
    import pandas as pd

    from dlt_iceberg_spark.queries import REGISTRY

    docs = [
        (1, ""),                                  # zero tokens
        (2, "word"),                              # one token: no bigrams
        (3, "  \n \n  "),                         # whitespace only
        (4, "the quick brown fox jumps over the lazy dog again and again"),
    ]
    pd.DataFrame(docs, columns=["doc_id", "text"]).to_parquet(
        str(tmp_path / "documents.parquet")
    )

    spec = REGISTRY["text_gopher_rules"]
    got = spec.fn(spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    want = con.execute(spec.oracle).fetchdf()

    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(by=list(df.columns), ignore_index=True)

    got, want = norm(got), norm(want)
    assert len(got) == len(want) == 4          # no doc dropped on either side
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=False, rtol=0, atol=1e-9
    )


def test_dedup_lines_removes_cross_doc_boilerplate(spark):
    """RefinedWeb line dedup: a footer shared by >=2 docs disappears from
    all of them, order is preserved, unique lines survive, and a doc made
    entirely of boilerplate keeps its row with empty text."""
    from dlt_iceberg_spark.operators.text import dedup_lines

    footer = "subscribe to our newsletter today."
    docs = [
        (1, "unique first line.\n" + footer + "\nunique last line."),
        (2, footer + "\nanother unique thought."),
        (3, footer),  # all-boilerplate doc
        (4, "wholly original document."),
    ]
    rows = {r.doc_id: r for r in dedup_lines(
        spark.createDataFrame(docs, "doc_id long, text string")).collect()}

    assert rows[1].text == "unique first line.\nunique last line."
    assert (rows[1].n_kept, rows[1].n_removed) == (2, 1)
    assert rows[2].text == "another unique thought."
    assert rows[3].text == "" and rows[3].n_kept == 0 and rows[3].n_removed == 1
    assert rows[4].text == "wholly original document."
    assert set(rows) == {1, 2, 3, 4}  # no doc silently dropped


def test_dedup_lines_threshold_counts_distinct_docs(spark):
    """A line repeated WITHIN one doc is not boilerplate (frequency counts
    distinct documents, not occurrences) — and min_docs=3 keeps a 2-doc
    line."""
    from dlt_iceberg_spark.operators.text import dedup_lines

    rep = "internally repeated line."
    docs = [(1, rep + "\n" + rep), (2, "shared.\nmine."), (3, "shared.\nyours.")]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    rows = {r.doc_id: r for r in dedup_lines(df, min_docs=2).collect()}
    assert rows[1].text == rep + "\n" + rep  # within-doc repeat kept
    assert rows[2].text == "mine." and rows[3].text == "yours."

    rows3 = {r.doc_id: r for r in dedup_lines(df, min_docs=3).collect()}
    assert rows3[2].text == "shared.\nmine."  # 2-doc line below threshold


def test_tfidf_top_terms_ranks_rare_terms_first(spark):
    """A term unique to one doc outranks a corpus-wide term regardless of
    raw tf; ties rank by term ascending; k truncates."""
    from dlt_iceberg_spark.operators.features import tfidf_top_terms

    docs = [
        (1, "common rare"),
        (2, "common other"),
        (3, "common other"),
    ]
    out = tfidf_top_terms(
        spark.createDataFrame(docs, "doc_id long, text string"), k=2
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    d1 = sorted(by_doc[1], key=lambda r: r.rank)
    # equal tf=1: 'rare' (df=1 -> idf=ln(4/2)+1) beats 'common' (df=3 ->
    # idf=ln(4/4)+1=1, the smoothed floor)
    assert d1[0].term == "rare" and d1[1].term == "common"
    assert abs(d1[0].tfidf - (math.log(4 / 2) + 1)) < 1e-12
    assert abs(d1[1].tfidf - 1.0) < 1e-12
    # docs 2/3 tie 'common' vs 'other' on tf; both idf>0 -> 'other' (df=2)
    # beats 'common' (df=3), then term ascending for equal scores
    assert [r.term for r in sorted(by_doc[2], key=lambda r: r.rank)] == [
        "other", "common",
    ]
    assert all(len(v) <= 2 for v in by_doc.values())


def test_nb_classifier_learns_separable_labels(spark):
    """Multinomial NB with add-one smoothing: disjoint vocabularies are
    perfectly separable, scores match a hand computation, and an unseen
    token at scoring time doesn't crash (smoothing identity)."""
    from dlt_iceberg_spark.operators.features import nb_classify, nb_score, nb_train

    docs = [
        (1, "apple banana apple", "fruit"),
        (2, "banana apple banana", "fruit"),
        (3, "iron copper iron", "metal"),
        (4, "copper iron copper", "metal"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, label string")
    out = nb_classify(df, label_col="label").collect()
    assert all(r.match == 1 for r in out)

    # hand computation for doc 1 under class 'fruit':
    # c(apple,fruit)=3 c(banana,fruit)=3, C_fruit=6, V=4, prior=1/2
    # score = ln(.5) - 3*ln(6+4) + 2*ln(3+1) + 1*ln(3+1)
    expected = math.log(0.5) - 3 * math.log(10) + 3 * math.log(4)
    got = {r.doc_id: r.score for r in out}
    assert abs(got[1] - expected) < 1e-9

    tw, cc = nb_train(df, label_col="label")
    novel = spark.createDataFrame(
        [(9, "apple zzz-unseen-token")], "doc_id long, text string"
    )
    pred = nb_score(novel, tw, cc).collect()
    assert pred[0].predicted == "fruit"  # evidence from 'apple' alone


def test_nb_classify_persist_input_parity(spark):
    """The persist_input fast path (engaged above PERSIST_MIN_INPUT_BYTES
    in production) must be a pure execution hint: row-identical output to
    the default path.  Pinned after r11 removed the shared-token-base
    restructure — persist_input now only pins the INPUT, never reshapes
    the plan (OPTIMIZATION_r11.md, 'the persist lesson')."""
    from dlt_iceberg_spark.operators.features import nb_classify

    docs = [
        (1, "apple banana apple", "fruit"),
        (2, "banana apple banana", "fruit"),
        (3, "iron copper iron", "metal"),
        (4, "copper iron copper", "metal"),
        (5, None, "metal"),  # null text: must drop out identically in both paths
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, label string")
    key = lambda r: r.doc_id  # noqa: E731
    base = sorted(nb_classify(df, label_col="label").collect(), key=key)
    fast = sorted(
        nb_classify(df, label_col="label", persist_input=True).collect(), key=key
    )
    assert [r.asDict() for r in base] == [r.asDict() for r in fast]
    df.unpersist()


def test_knn_classify_majority_and_ties(spark):
    """kNN label vote: majority wins; on a vote tie the label owning the
    closest neighbor wins (best-cosine tie-break)."""
    from dlt_iceberg_spark.operators.similarity import knn_classify

    # axis-aligned corpus: 2 'x'-ish vectors, 1 'y'-ish vector near the x axis
    labeled = spark.createDataFrame(
        [
            (10, [1.0, 0.0], "x"),
            (11, [0.9, 0.1], "x"),
            (12, [0.0, 1.0], "y"),
        ],
        "vec_id long, embedding array<double>, label string",
    )
    q = spark.createDataFrame(
        [(1, [1.0, 0.05])], "vec_id long, embedding array<double>"
    )
    got = knn_classify(q, labeled, k=3).collect()
    assert got[0].predicted == "x" and got[0].votes == 2

    # one-per-class corpus at k=2 -> one vote each; 'x' owns the nearest
    # neighbor -> wins the best-cosine tie-break
    got2 = knn_classify(
        q, labeled.filter(F.col("vec_id") != 11), k=2
    ).collect()
    assert got2[0].predicted == "x" and got2[0].votes == 1


def test_remove_duplicate_spans_keeps_first_occurrence(spark):
    from dlt_iceberg_spark.operators.dedup import remove_duplicate_spans

    boiler = "a b c d e f g h i j"  # the only shared 10-token window
    df = spark.createDataFrame(
        [
            (2, boiler + " dos zwei tail"),
            (1, boiler + " uno eins tail"),
            (3, "entirely different words that never repeat anywhere else here now"),
            (4, "tiny"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in remove_duplicate_spans(df, "text", "doc_id").collect()}
    # global keeper is the MIN (doc_id, pos): doc 1 keeps the span
    assert out[1].text == boiler + " uno eins tail"
    assert out[1].n_removed_tokens == 0
    assert out[2].text == "dos zwei tail" and out[2].n_removed_tokens == 10
    assert out[3].n_removed_tokens == 0
    assert out[4].text == "tiny" and out[4].n_tokens == 1  # < window: untouched


def test_remove_duplicate_spans_overlapping_windows_merge(spark):
    from dlt_iceberg_spark.operators.dedup import remove_duplicate_spans

    # 11 shared tokens -> two overlapping duplicated windows in doc 2;
    # their union (all 11 tokens) must be removed, not double-counted
    shared = "a b c d e f g h i j k"
    df = spark.createDataFrame(
        [(1, shared + " one"), (2, shared + " two")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in remove_duplicate_spans(df, "text", "doc_id").collect()}
    assert out[1].n_removed_tokens == 0
    assert out[2].n_removed_tokens == 11 and out[2].text == "two"


def test_remove_duplicate_spans_within_one_document(spark):
    from dlt_iceberg_spark.operators.dedup import remove_duplicate_spans

    span = "p q r s t u v w x y"
    df = spark.createDataFrame(
        [(1, span + " mid " + span)], "doc_id long, text string"
    )
    out = remove_duplicate_spans(df, "text", "doc_id").collect()[0]
    # the second in-document occurrence is removed, the first kept
    assert out.text == span + " mid"
    assert out.n_removed_tokens == 10


def test_bm25_rank_formula_and_ordering(spark):
    import math

    from dlt_iceberg_spark.operators.features import bm25_rank

    docs = spark.createDataFrame(
        [
            (1, "cat dog"),          # dl=2: one 'cat'
            (2, "cat cat cat dog"),  # dl=4: tf=3 but longer
            (3, "dog dog"),          # no query term -> absent
            (4, "cat"),              # dl=1: shortest match
        ],
        "doc_id int, text string",
    )
    out = {r.doc_id: r.score for r in bm25_rank(docs, ["cat"]).collect()}
    assert set(out) == {1, 2, 4}
    # hand-computed: N=4, df=3, idf=ln((4-3+0.5)/(3+0.5)+1); avgdl=9/4
    idf = math.log((4 - 3 + 0.5) / (3 + 0.5) + 1)

    def s(tf, dl):
        return idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 2.25))

    for doc, (tf, dl) in {1: (1, 2), 2: (3, 4), 4: (1, 1)}.items():
        assert abs(out[doc] - s(tf, dl)) < 1e-12
    # shortest doc with the term outranks the longer one at equal tf
    assert out[4] > out[1]


def test_bm25_rank_topk_and_empty_query(spark):
    import pytest as _pytest

    from dlt_iceberg_spark.operators.features import bm25_rank

    docs = spark.createDataFrame(
        [(i, "cat " * (i + 1)) for i in range(10)], "doc_id int, text string"
    )
    top3 = bm25_rank(docs, ["cat"], k=3).collect()
    assert len(top3) == 3
    # saturating tf: more repetitions still rank higher at equal dl growth?
    # not necessarily — just pin determinism: re-run yields the same ids
    again = bm25_rank(docs, ["cat"], k=3).collect()
    assert [r.doc_id for r in top3] == [r.doc_id for r in again]
    with _pytest.raises(ValueError, match="non-empty"):
        bm25_rank(docs, [])


def test_text_operators_reject_reserved_staging_columns(spark):
    """The expression-dedup staging columns (_t, _bg, _qs_toks, _g2..,
    _lid_*) must never silently clobber a user column of the same name
    (ADVICE r11): the operator raises instead."""
    import pytest as _pytest

    from dlt_iceberg_spark.operators.text import (
        gopher_rules,
        language_id,
        quality_score,
        repetition_stats,
        rolling_fingerprint,
    )

    base = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    for op, clash in (
        (quality_score, "_qs_toks"),
        (repetition_stats, "_t"),
        (repetition_stats, "_bg"),
        (gopher_rules, "_g5"),
        (gopher_rules, "_lines"),
        (language_id, "_lid_toks"),
        (rolling_fingerprint, "_th"),
    ):
        df = base.withColumn(clash, F.lit(1))
        with _pytest.raises(ValueError, match="reserved"):
            op(df)
    # clean inputs still work
    assert quality_score(base).count() == 1


def test_dsir_bucket_totals_match_feature_aggregate(spark):
    """r12: hashed_ngram_bucket_totals (the shuffle-light model-fit form)
    must be row-identical to aggregating hashed_ngram_features — including
    empty/whitespace/null docs and single-token docs (no bigrams)."""
    from dlt_iceberg_spark.operators.dsir import (
        hashed_ngram_bucket_totals,
        hashed_ngram_features,
    )

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha"),
            (2, "alpha"),
            (3, ""),
            (4, None),
            (5, "   "),
            (6, "beta gamma beta gamma beta"),
        ],
        "doc_id long, text string",
    )
    via_feats = {
        (r.bucket, r.c)
        for r in hashed_ngram_features(df, n_buckets=16)
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("c"))
        .collect()
    }
    direct = {
        (r.bucket, r.cnt)
        for r in hashed_ngram_bucket_totals(df, n_buckets=16).collect()
    }
    assert direct == via_feats and direct


def test_tfidf_doc_freq_counts_docs_not_occurrences(spark):
    """r12: the map-side array_distinct doc-frequency branch must count each
    doc once per term regardless of in-doc repetition, and ignore empty
    tokens/docs — pinned against the closed-form smoothed IDF."""
    from dlt_iceberg_spark.operators.features import tfidf_top_terms

    df = spark.createDataFrame(
        [(1, "x x x y"), (2, "x  y"), (3, "z"), (4, "")],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(df, k=10).collect()
    n = 4  # n_docs counts the empty doc too (countDistinct over df)
    by = {(r.doc_id, r.term): r for r in out}
    # doc_freq: x -> 2 docs, y -> 2 docs, z -> 1 doc
    assert math.isclose(
        by[(1, "x")].tfidf, 3 * (math.log((n + 1) / (2 + 1)) + 1.0), rel_tol=1e-12
    )
    assert math.isclose(
        by[(3, "z")].tfidf, 1 * (math.log((n + 1) / (1 + 1)) + 1.0), rel_tol=1e-12
    )
    assert (4, "") not in by and all(r.term != "" for r in out)


def test_lm_contexts_match_bigram_rollup_both_persist_modes(spark):
    """r12: the unpersisted path counts contexts straight off the pair
    stream; it must equal the persisted path's Σ_w c(prev, w) rollup."""
    from dlt_iceberg_spark.operators.lm import train_bigram_lm

    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a"), (3, ""), (4, "b c")],
        "doc_id long, text string",
    )
    bg_p, ctx_p, v_p = train_bigram_lm(df, persist_model=True)
    bg_n, ctx_n, v_n = train_bigram_lm(df, persist_model=False)
    try:
        assert v_p == v_n
        rows_p = {(r.prev, r.c_total) for r in ctx_p.collect()}
        rows_n = {(r.prev, r.c_total) for r in ctx_n.collect()}
        assert rows_p == rows_n and rows_p
    finally:
        bg_p.unpersist()


def test_connected_components_empty_and_single_edge(spark):
    """r12: the round-0 convergence probe is skipped (any edge provably
    changes a label in round 0) — the empty-edge case must still terminate
    with empty labels, and a single edge must form one component."""
    from dlt_iceberg_spark.operators.graph import connected_components

    empty = spark.createDataFrame([], "a long, b long")
    assert connected_components(empty).collect() == []
    one = spark.createDataFrame([(9, 5)], "a long, b long")
    rows = {(r.node, r.component) for r in connected_components(one).collect()}
    assert rows == {(5, 5), (9, 5)}


def test_bm25_map_side_features_edge_cases(spark):
    """r12: bm25_rank's per-doc (dl, tf_i) are now map-side array
    expressions — pin N/avgdl/df support against null/empty/whitespace
    docs (must be excluded exactly like the old explode form) and
    multi-term tf against hand-computed scores."""
    import math

    from dlt_iceberg_spark.operators.features import bm25_rank

    docs = spark.createDataFrame(
        [
            (1, "cat dog cat"),   # dl=3, tf(cat)=2, tf(dog)=1
            (2, "dog"),           # dl=1, tf(dog)=1
            (3, ""),              # no tokens -> excluded from N/avgdl
            (4, None),            # null -> excluded
            (5, "   "),           # whitespace -> excluded
            (6, "fish"),          # dl=1, no query terms -> absent from output
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.score for r in bm25_rank(docs, ["cat", "dog"]).collect()}
    assert set(out) == {1, 2}
    n, avgdl = 3, (3 + 1 + 1) / 3  # docs 1, 2, 6 only
    df_cat, df_dog = 1, 2

    def part(tf, dl, dfq):
        idf = math.log((n - dfq + 0.5) / (dfq + 0.5) + 1)
        return idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))

    assert abs(out[1] - (part(2, 3, df_cat) + part(1, 3, df_dog))) < 1e-12
    assert abs(out[2] - part(1, 1, df_dog)) < 1e-12
