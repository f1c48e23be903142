"""Chunking + sequence-packing operator tests."""

import pytest
from pyspark.sql import functions as F

from dlt_iceberg_spark.operators.packing import pack_sequences
from dlt_iceberg_spark.operators.text import chunk_documents


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_short_doc_is_single_chunk(spark):
    d = _docs(spark, [(1, "a b c")])
    out = chunk_documents(d, chunk_tokens=8, stride=4).collect()
    assert len(out) == 1
    assert out[0].chunk_id == 0 and out[0].chunk_text == "a b c"
    assert out[0].n_chunk_tokens == 3


def test_chunk_windows_cover_all_tokens_with_overlap(spark):
    words = [f"w{i}" for i in range(100)]
    d = _docs(spark, [(1, " ".join(words))])
    out = sorted(chunk_documents(d, chunk_tokens=16, stride=12).collect(),
                 key=lambda r: r.chunk_id)
    # starts at 0,12,24,...,84 -> 1 + ceil((100-16)/12) = 8 chunks
    assert len(out) == 8
    seen = set()
    for r in out:
        toks = r.chunk_text.split(" ")
        assert len(toks) <= 16 and r.n_chunk_tokens == len(toks)
        assert toks == words[r.chunk_id * 12 : r.chunk_id * 12 + 16]
        seen.update(toks)
    assert seen == set(words)  # no token dropped
    # consecutive chunks overlap by chunk-stride tokens
    assert out[0].chunk_text.split(" ")[12:] == out[1].chunk_text.split(" ")[:4]


def test_chunk_exact_boundary(spark):
    # n - chunk divisible by stride: last window ends exactly at n
    d = _docs(spark, [(1, " ".join(f"w{i}" for i in range(40)))])
    out = chunk_documents(d, chunk_tokens=16, stride=12).collect()
    assert len(out) == 3  # starts 0,12,24 -> covers 40
    assert max(r.chunk_id for r in out) == 2


def test_chunk_validation(spark):
    d = _docs(spark, [(1, "x")])
    with pytest.raises(ValueError, match="stride > chunk_tokens"):
        chunk_documents(d, chunk_tokens=4, stride=5)
    with pytest.raises(ValueError):
        chunk_documents(d, chunk_tokens=0)


def test_pack_respects_budget_and_determinism(spark):
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 190 + 10).alias("n_tok")
    )
    packed = pack_sequences(df, "n_tok", budget=1000).persist()
    stats = packed.groupBy("pack_id").agg(
        F.sum("n_tok").alias("tot"), F.max("n_tok").alias("mx")
    )
    # each pack closes at most one doc past the budget
    assert stats.filter(F.col("tot") >= 1000 + F.col("mx")).count() == 0
    # mean utilization is high (density loss from group split is small)
    full = stats.filter("tot >= 900").count()
    assert full >= stats.count() * 0.5
    # deterministic under repartitioning
    a = sorted((r.doc_id, r.pack_id) for r in packed.collect())
    b = sorted(
        (r.doc_id, r.pack_id)
        for r in pack_sequences(df.repartition(7), "n_tok", budget=1000).collect()
    )
    assert a == b


def test_pack_oversized_doc_gets_own_progression(spark):
    df = spark.createDataFrame([(1, 50), (2, 5000), (3, 60)], "doc_id long, n_tok long")
    packed = {r.doc_id: r.pack_id for r in pack_sequences(df, "n_tok", budget=100, groups=1).collect()}
    # the 5000-token doc pushes later docs into far-away packs, never merged
    assert len(set(packed.values())) >= 2
    with pytest.raises(ValueError):
        pack_sequences(df, "n_tok", budget=0)


# -- contamination + PII redaction ------------------------------------------


def test_contamination_detects_exact_ngram_overlap(spark):
    from dlt_iceberg_spark.operators.text import contamination_check

    probes = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    docs = _docs(spark, [
        (1, "intro text then the quick brown fox jumps right here"),   # 5-gram hit
        (2, "completely unrelated content with no overlap at all ok"),  # clean
        (3, "short"),                                                   # < k tokens, clean
    ])
    hits = {r.doc_id: r.n_hits for r in contamination_check(docs, probes, shingle_k=5).collect()}
    assert 1 in hits and hits[1] >= 1
    assert 2 not in hits and 3 not in hits


def test_redact_pii_scrubs_and_counts(spark):
    from dlt_iceberg_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [(1, "mail a.b-c@x.org or call +1 (555) 123-4567 from 192.168.0.1 twice a.b-c@x.org")],
        "doc_id long, text string",
    )
    r = redact_pii(df).collect()[0]
    assert r.n_email == 2 and r.n_phone == 1 and r.n_ipv4 == 1
    assert "<EMAIL>" in r.text_redacted and "<PHONE>" in r.text_redacted
    assert "x.org" not in r.text_redacted and "555" not in r.text_redacted
    assert "192.168.0.1" not in r.text_redacted


def test_chunk_documents_giant_doc_is_linear(spark):
    """Document-length canary: a 50k-token doc must chunk in seconds, not
    minutes — guards against re-tokenizing the text per chunk (capturing
    the split() expression inside the transform lambda is O(n²/stride))."""
    import time

    giant = " ".join(f"t{i}" for i in range(50_000))
    df = spark.createDataFrame([(1, giant)], "doc_id long, text string")
    t0 = time.perf_counter()
    out = chunk_documents(df, chunk_tokens=64, stride=48)
    n = out.count()
    assert n == 1 + (50_000 - 64 + 48 - 1) // 48
    # generous bound: the quadratic form took >60s here, the linear ~1s
    assert time.perf_counter() - t0 < 30
