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
