"""PQ tests: codebook shape, encode determinism, ADC recall of a strong
near-duplicate, and compression of the stored representation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from dlt_iceberg_spark.operators.quantization import pq_encode, pq_topk, pq_train


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(11)
    base = rng.standard_normal((50, 16))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    rows.append((500, [float(x) for x in base[0] + 0.01 * rng.standard_normal(16)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_train_shapes(emb):
    books = pq_train(emb, m_subspaces=4, k_codes=8)
    assert len(books) == 4
    assert all(len(b) == 8 and len(b[0]) == 4 for b in books)


def test_train_rejects_bad_split(emb):
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(emb, m_subspaces=5)


def test_encode_deterministic_and_compact(emb):
    books = pq_train(emb, m_subspaces=4, k_codes=8)
    enc1 = {r.vec_id: r.pq_code for r in pq_encode(emb, books).collect()}
    enc2 = {r.vec_id: r.pq_code for r in pq_encode(emb, books).collect()}
    assert enc1 == enc2
    assert all(len(c) == 4 and all(0 <= x < 8 for x in c) for c in enc1.values())
    # identical-direction vectors encode identically
    assert "embedding" not in pq_encode(emb, books).columns


def test_adc_recall_of_near_duplicate(emb):
    books = pq_train(emb, m_subspaces=4, k_codes=16)
    codes = pq_encode(emb, books)
    q = emb.filter(F.col("vec_id") == 0)
    out = pq_topk(q, codes, books, k=3).collect()
    assert [r.rank for r in out] == [1, 2, 3]
    # the planted near-dup of vector 0 must be retrieved at rank 1
    assert out[0].neighbor_id == 500
    assert out[0].adc_dist <= out[1].adc_dist


def test_sq_roundtrip_accuracy_and_determinism(emb):
    """SQ8: exact min/max training, encode/decode error bounded by half a
    step per dimension, repeat runs bit-identical (no sampling)."""
    from dlt_iceberg_spark.operators.quantization import sq_encode, sq_train

    mins, maxs = sq_train(emb)
    mins2, maxs2 = sq_train(emb)
    assert mins == mins2 and maxs == maxs2  # deterministic, no sampling
    codes = sq_encode(emb, mins, maxs, keep_vec=True)
    rows = codes.collect()
    for r in rows:
        assert all(0 <= c <= 255 for c in r.sq_code)
        for j, (v, c) in enumerate(zip(r.embedding, r.sq_code)):
            scale = (maxs[j] - mins[j]) / 255.0 if maxs[j] > mins[j] else 1.0
            decoded = mins[j] + c * scale
            assert abs(decoded - v) <= scale / 2 + 1e-9


def test_sq_topk_matches_bruteforce_closely(emb):
    """Quantized ranking vs exact: recall@5 must be high (int8 over these
    spreads loses little), and the scoring plan contains NO Python — no
    BatchEvalPython / ArrowEvalPython / mapInPandas nodes."""
    from dlt_iceberg_spark.operators.quantization import (
        sq_encode,
        sq_topk,
        sq_train,
    )
    from dlt_iceberg_spark.operators.similarity import cosine_topk_bruteforce

    mins, maxs = sq_train(emb)
    codes = sq_encode(emb, mins, maxs)
    q = emb.filter("vec_id < 5")
    got = sq_topk(q, codes, mins, maxs, k=5)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "InPandas" not in plan
    exact = cosine_topk_bruteforce(q, emb, k=5)
    g = {(r.query_id, r.neighbor_id) for r in got.collect()}
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    recall = len(g & e) / len(e)
    assert recall >= 0.9, recall
