"""End-to-end training-corpus pipeline over the driver fixtures.

Run: python examples/corpus_pipeline.py [sf_dir]

documents.parquet → quality filter → PII scrub → contamination check →
exact + near dedup → reproducible sample → train/val/test split →
chunk → pack → deterministic shards.  Every stage is a production
operator from dlt_iceberg_spark.operators; nothing here collects data
to the driver except the printed summaries.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dlt_iceberg_spark.io import load_table
from dlt_iceberg_spark.operators import (
    chunk_documents,
    deterministic_sample,
    exact_dedup,
    hash_split,
    minhash_lsh_dedup,
    pack_sequences,
    quality_score,
    shuffle_shards,
)
from dlt_iceberg_spark.operators.text import contamination_check, redact_pii
from dlt_iceberg_spark.session import get_spark


def main(sf_dir: str) -> None:
    spark = get_spark("corpus_pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. quality filter (C4/Gopher-style blend)
    kept = quality_score(docs).filter(F.col("quality_score") >= 0.75)
    n1 = kept.count()

    # 2. PII scrub (map-side regexp chain)
    scrubbed = redact_pii(kept).withColumn("text", F.col("text_redacted"))

    # 3. benchmark contamination: drop docs overlapping the probe set
    probes = docs.filter(F.col("doc_id") < 20)
    dirty = contamination_check(scrubbed.filter(F.col("doc_id") >= 20), probes)
    clean = scrubbed.join(dirty.select("doc_id"), "doc_id", "left_anti")
    n3 = clean.count()

    # 4. dedup: exact canonical ids, then MinHash+LSH near-dup clusters
    exact = exact_dedup(clean, ["text"], "doc_id")
    canon_ids = exact.select(F.col("canonical_id").alias("doc_id"))
    uniq = clean.join(canon_ids, "doc_id", "left_semi")
    near = minhash_lsh_dedup(uniq, "text", "doc_id", threshold=0.7)
    survivors = uniq.join(
        near.filter(~F.col("is_duplicate")).select("doc_id"), "doc_id", "left_semi"
    )
    n4 = survivors.count()

    # 5. reproducible 80% sample + train/val/test split
    sampled = deterministic_sample(survivors, "doc_id", 0.8)
    # NOTE the salt: the sample above gated on the same key, and reusing
    # the same hash would funnel every survivor into "train"
    split = hash_split(sampled, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="split")
    split_counts = {
        r.split: r.n
        for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()
    }

    # 6. chunk the training split into context windows, pack, and shard
    train = split.filter("split = 'train'")
    chunks = chunk_documents(train, chunk_tokens=64, stride=48)
    chunk_rows = chunks.withColumn(
        "chunk_key",  # packing needs a UNIQUE id; chunk_id restarts per doc
        F.concat_ws("#", F.col("doc_id"), F.col("chunk_id")),
    ).withColumnRenamed("n_chunk_tokens", "n_tok")
    packed = pack_sequences(chunk_rows, "n_tok", budget=512, id_col="chunk_key")
    sharded = shuffle_shards(packed, "doc_id", n_shards=8, seed="epoch0")
    n_chunks = chunks.count()
    n_packs = packed.select("pack_id").distinct().count()
    shard_counts = sorted(
        (r.shard, r.n)
        for r in sharded.groupBy("shard").agg(F.count("*").alias("n")).collect()
    )

    print(f"docs: {n0} -> quality {n1} -> decontaminated {n3} -> deduped {n4}")
    print(f"splits: {split_counts}")
    print(f"train chunks: {n_chunks} packed into {n_packs} ~512-token packs")
    print(f"shards (8, deterministic): {shard_counts}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
