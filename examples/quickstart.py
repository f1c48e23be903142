"""End-to-end quickstart: pipeline loads → merge → query → streaming → maintenance.

Run: python examples/quickstart.py [warehouse_dir]

Walks the full engine surface the way the reference's examples do
(incremental CSV loads; upsert merges), plus
the Spark-native extensions: streaming ingestion and table maintenance.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Row
from pyspark.sql import functions as F

from dlt_iceberg_spark.lake import Pipeline, Resource, compact_table, expire_snapshots
from dlt_iceberg_spark.session import get_spark


def main(warehouse: str) -> None:
    spark = get_spark("quickstart")
    spark.sparkContext.setLogLevel("ERROR")
    pipe = Pipeline(spark, warehouse, dataset_name="shop")

    # -- load 1: append two tables ----------------------------------------
    customers = [
        Row(id=1, name="ada", segment="B2B"),
        Row(id=2, name="grace", segment="B2C"),
    ]
    orders = [
        Row(order_id=10, customer_id=1, amount=120.0),
        Row(order_id=11, customer_id=2, amount=7.5),
    ]
    info = pipe.run(
        Resource(producer=customers, name="customers", write_disposition="append"),
        Resource(producer=orders, name="orders", write_disposition="append"),
    )
    print(f"load 1: {info.load_id} -> {info.tables}")

    # -- load 2: merge/upsert (same PK updates, new PK inserts) ------------
    updates = [
        Row(order_id=11, customer_id=2, amount=9.9),   # price correction
        Row(order_id=12, customer_id=1, amount=55.0),  # new order
    ]
    pipe.run(
        Resource(
            producer=updates,
            name="orders",
            write_disposition={"disposition": "merge", "strategy": "upsert"},
            primary_key=["order_id"],
        )
    )

    # -- query the dataset (SQL over loaded tables) ------------------------
    df = pipe.dataset().query(
        """
        SELECT c.segment, count(*) AS n_orders, sum(o.amount) AS revenue
        FROM orders o JOIN customers c ON c.id = o.customer_id
        GROUP BY c.segment ORDER BY revenue DESC
        """
    )
    print("revenue by segment:")
    for r in df.collect():
        print(f"  {r.segment}: {r.n_orders} orders, {r.revenue:.2f}")

    # -- schema evolution: a new nullable column just works ----------------
    pipe.run(
        Resource(
            producer=[Row(order_id=13, customer_id=2, amount=3.0, channel="web")],
            name="orders",
            write_disposition={"disposition": "merge", "strategy": "upsert"},
            primary_key=["order_id"],
        )
    )
    evolved = pipe.dataset().query("SELECT order_id, channel FROM orders ORDER BY order_id")
    print("after evolution:", [(r.order_id, r.channel) for r in evolved.collect()])

    # -- streaming: micro-batches through the same disposition path --------
    import glob

    from dlt_iceberg_spark.lake import LakeWriter, TableSpec
    from dlt_iceberg_spark.streaming import stream_write

    stage = tempfile.mkdtemp(prefix="quickstart_stream_")
    inp, ckpt = f"{stage}/in", f"{stage}/ckpt"
    spark.createDataFrame(
        [Row(click_id=i, page=f"/p{i % 3}") for i in range(100)]
    ).coalesce(1).write.parquet(f"{stage}/tmp")
    import shutil

    os.makedirs(inp)
    shutil.copy(glob.glob(f"{stage}/tmp/part-*.parquet")[0], f"{inp}/b0.parquet")
    q = stream_write(
        spark.readStream.schema("click_id long, page string").parquet(inp),
        LakeWriter(pipe.catalog, "shop"),
        TableSpec(name="clicks", write_disposition="append"),
        ckpt,
        query_name="clicks",
    )
    q.awaitTermination(60)
    print("streamed clicks:", pipe.dataset().query("SELECT count(*) AS n FROM clicks").collect()[0].n)

    # -- maintenance: compact the small files the loads produced -----------
    table = pipe.catalog.load_table("shop", "orders")
    res = compact_table(table, target_file_bytes=1 << 20)
    print(f"compaction: rewrote {res.rewritten_files} files -> {res.output_files}")
    expired = expire_snapshots(table)  # default 7d retention: no-op here
    print(f"expired: {expired}")

    print("row count:", table.read().count())

    # -- write-audit-publish: stage a load on a branch, audit, publish ------
    from dlt_iceberg_spark.lake.pipeline import Pipeline as _P

    wap = _P(spark, warehouse, dataset_name="shop", branch="audit")
    wap.run(
        Resource(
            producer=[Row(order_id=99, customer_id=1, amount=9.99, channel="app")],
            name="orders",
            write_disposition="append",
        ),
        load_id="staged-load",
    )
    audit_n = wap.dataset().query("SELECT count(*) AS n FROM orders").collect()[0].n
    main_n = wap.dataset("main").query("SELECT count(*) AS n FROM orders").collect()[0].n
    print(f"WAP audit: branch sees {audit_n} rows, main still {main_n}")
    wap.publish(["orders"])
    print("published:", pipe.dataset().query("SELECT count(*) AS n FROM orders").collect()[0].n)

    # -- position deletes (MoR) + CDC changelog -----------------------------
    v_before = table.snapshot().version
    table.position_delete_where([("order_id", "=", 99)])
    table = pipe.catalog.load_table("shop", "orders")
    print("after position delete:", table.read().count(), "rows (no data file rewritten)")
    changes = table.read_changes(v_before, net_changes=True)
    print("changelog:", [(r.order_id, r._change_type) for r in changes.collect()])

    # -- row-level UPDATE (MoR) + checkpointed changelog consumption --------
    from dlt_iceberg_spark.lake import ChangelogFeed

    table.update_where([("channel", "=", "web")], {"amount": F.col("amount") * 1.1})
    table = pipe.catalog.load_table("shop", "orders")
    feed = ChangelogFeed(table, name="quickstart")
    drained = feed.process(lambda df: print(
        "feed batch:", sorted((r.order_id, r._change_type) for r in df.collect())
    ))
    print("feed drained", drained, "batch(es); caught up:", feed.poll() is None)

    # -- predicate-pruned scan: manifest min/max skips files ----------------
    probe = table.read(where=[("order_id", "<=", 11)])
    print(f"pruned scan touched {len(probe.inputFiles())} file(s), rows={probe.count()}")

    # -- reproducible sampling for training-data prep -----------------------
    from dlt_iceberg_spark.operators.sampling import deterministic_sample, hash_split

    clicks = pipe.dataset()["clicks"].dataframe()
    sampled = deterministic_sample(clicks, "click_id", 0.25)
    splits = hash_split(clicks, "click_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    print("25% sample:", sampled.count(), "of", clicks.count())
    print("splits:", {r.split: r.n for r in splits.groupBy("split").agg(F.count("*").alias("n")).collect()})

    # -- bucket partitioning: point lookups open ~1/N of the files ----------
    pipe.run(
        Resource(
            producer=[Row(user_id=i, plan=f"p{i % 3}") for i in range(64)],
            name="users",
            write_disposition="append",
            column_hints={"user_id": {"partition": True, "x-partition-transform": "bucket[8]"}},
        )
    )
    users = pipe.catalog.load_table("shop", "users")
    snap = users.snapshot()
    _, hit = users._select_files(snap, [("user_id", "=", 7)])
    print(
        f"bucket[8] point lookup: planned {len(hit)} of {snap.n_files} files "
        f"(min/max could not prune a hashed key; the transform rewrite did)"
    )

    # -- Iceberg interop: export with column bounds, re-register, still prunes
    meta_path = users.export_iceberg_metadata(avro_manifests=True)
    twin = pipe.catalog.register_iceberg_table("shop_interop", "users_twin", meta_path)
    tsnap = twin.snapshot()
    _, thit = twin._select_files(tsnap, [("user_id", "=", 7)])
    print(
        f"interop twin: {twin.read().count()} rows re-read via avro metadata; "
        f"point lookup plans {len(thit)} of {tsnap.n_files} files (bounds survived)"
    )

    # -- persisted incremental-dedup index ----------------------------------
    from dlt_iceberg_spark.lake.table import LakeTable
    from dlt_iceberg_spark.operators.dedup import (
        append_novel_classes,
        batch_vs_corpus_dedup,
        write_dedup_index,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")], "doc_id long, text string"
    )
    idx_table = LakeTable(spark, os.path.join(warehouse, "shop", "_dedup_index"))
    write_dedup_index(idx_table, docs, "text", "doc_id")
    batch = spark.createDataFrame(
        [(10, "alpha beta gamma"), (11, "brand new content")], "doc_id long, text string"
    )
    dups = batch_vs_corpus_dedup(batch, idx_table.read(), "text", "doc_id").collect()
    append_novel_classes(idx_table, batch, "text", "doc_id")
    print(
        f"incremental dedup: batch dups {sorted((r.corpus_id, r.batch_id) for r in dups)}; "
        f"index grew to {idx_table.read().count()} classes (novel only)"
    )

    # -- metadata-only rename + streaming tail ------------------------------
    users.rename_column("plan", "tier")
    assert users.read(where=[("tier", "=", "p1")]).count() > 0  # old files bridge
    from dlt_iceberg_spark.streaming.source import read_stream

    tail = (
        read_stream(spark, users.location, from_beginning=True)
        .writeStream.format("memory")
        .queryName("users_tail")
        .trigger(availableNow=True)
        .start()
    )
    tail.awaitTermination(120)
    n = spark.sql("select count(*) c from users_tail").collect()[0].c
    print(
        f"rename_column('plan','tier') touched zero data files; streaming "
        f"tail replayed {n} rows under the new name"
    )

    # -- multi-table transaction + incremental rollup -----------------------
    from dlt_iceberg_spark.lake.rollup import IncrementalRollup
    from dlt_iceberg_spark.lake.writer import TableSpec

    txn = pipe.catalog.transaction("shop")
    txn.write(
        TableSpec(name="fact_sales", write_disposition="append", primary_key=["sale_id"]),
        spark.createDataFrame(
            [(1, "us", 10.0), (2, "eu", 20.0), (3, "us", 5.0)],
            "sale_id long, region string, amount double",
        ),
    )
    txn.write(
        TableSpec(name="sales_meta", write_disposition="append"),
        spark.createDataFrame([("batch-1", 3)], "batch string, n long"),
    )
    res = txn.commit()
    fact = pipe.catalog.load_table("shop", "fact_sales")
    ru = IncrementalRollup(
        pipe.catalog, "shop", "sales_by_region", fact,
        keys=["region"], aggs={"total": ("sum", "amount"), "n": ("count",)},
    )
    ru.refresh()
    fact.update_where([("region", "=", "us")], {"amount": 100.0})
    ru.source = pipe.catalog.load_table("shop", "fact_sales")
    ru.refresh()  # folds only the changelog slice, never rescans the fact
    rolled = {r.region: (r.total, r.n) for r in ru.read().collect()}
    print(
        f"txn {res['txn']} published {sorted(res['tables'])} atomically; "
        f"CDC rollup after update_where: {rolled}"
    )

    # -- write-time expectations: quarantine the rejects --------------------
    from dlt_iceberg_spark.lake.writer import LakeWriter

    qwriter = LakeWriter(pipe.catalog, "shop")
    qwriter.write(
        TableSpec(
            name="sensor_readings",
            write_disposition="append",
            expectations={"in_range": "reading BETWEEN 0 AND 100"},
            on_violation="quarantine",
        ),
        spark.createDataFrame(
            [(1, 42.0), (2, 250.0), (3, 7.5)], "sensor_id long, reading double"
        ),
    )
    kept = pipe.catalog.load_table("shop", "sensor_readings").read().count()
    rejects = pipe.catalog.load_table(
        "shop", "sensor_readings__quarantine"
    ).read().collect()
    print(
        f"expectations: kept {kept} rows; quarantined "
        f"{[(r.sensor_id, r._violated_expectations) for r in rejects]}"
    )

    # -- incrementally-maintained JOIN view (delta-join IVM) ----------------
    from dlt_iceberg_spark.lake.matview import IncrementalJoinView

    qwriter.write(
        TableSpec(name="regions", write_disposition="append", primary_key=["region"]),
        spark.createDataFrame(
            [("us", "americas"), ("eu", "emea")], "region string, theatre string"
        ),
    )
    mv = IncrementalJoinView(
        pipe.catalog, "shop", "sales_regions",
        pipe.catalog.load_table("shop", "fact_sales"),
        pipe.catalog.load_table("shop", "regions"),
        on=["region"], left_pk=["sale_id"], right_pk=["region"],
    )
    mv.refresh()
    pipe.catalog.load_table("shop", "regions").update_where(
        [("region", "=", "eu")], {"theatre": "europe"}
    )
    mv.right = pipe.catalog.load_table("shop", "regions")
    mv.refresh()  # folds both changelogs; never re-runs the join
    pairs = sorted(
        (r.sale_id, r.theatre) for r in mv.read().collect()
    )
    print(f"join view after right-side update: {pairs}")

    # -- partition-grouped metadata aggregates (zero data scans) ------------
    from dlt_iceberg_spark.lake.dataset import Dataset

    per_region = Dataset(pipe.catalog, "shop").aggregate(
        "fact_sales", ["amount"], group_by="region"
    )
    print(f"rows/min/max per region, from manifests alone: {per_region}")

    # -- chained views: a view maintained over another view's CDC -----------
    qwriter.write(
        TableSpec(name="theatres", write_disposition="append", primary_key=["theatre"]),
        spark.createDataFrame(
            [("americas", "NA"), ("europe", "EMEA"), ("emea", "EMEA")],
            "theatre string, org string",
        ),
    )
    mv2 = IncrementalJoinView(
        pipe.catalog, "shop", "sales_orgs",
        pipe.catalog.load_table("shop", "sales_regions"),
        pipe.catalog.load_table("shop", "theatres"),
        on=["theatre"], left_pk=["sale_id", "region"], right_pk=["theatre"],
    )
    mv2.refresh()
    print(
        "chained view (sales -> regions -> orgs): "
        f"{sorted((r.sale_id, r.org) for r in mv2.read().collect())}"
    )

    # -- NDV statistics: write-time sketches, ANALYZE, overlap --------------
    from dlt_iceberg_spark.lake.maintenance import compute_table_stats

    qwriter.write(
        TableSpec(name="sales_eu", write_disposition="append",
                  ndv_sketch_columns=["region"]),
        spark.createDataFrame(
            [(10, "eu"), (11, "eu"), (12, "uk")], "sale_id int, region string"
        ),
    )
    fact = pipe.catalog.load_table("shop", "fact_sales")
    # the earlier update_where left merge-on-read masks: NDV metadata
    # REFUSES under them (a mask could hide a distinct value) — fold the
    # deletes, then ANALYZE backfills sketches without rewriting data
    assert fact.approx_distinct(["region"]) is None
    fact.fold_deletes()
    compute_table_stats(fact, ["region"])
    ndv = fact.approx_distinct(["region"])
    ovl = Dataset(pipe.catalog, "shop").overlap("fact_sales", "sales_eu", "region")
    print(
        f"NDV(region) from manifests alone: {ndv['region']} | "
        f"region overlap fact vs eu (zero scans): jaccard="
        f"{ovl['jaccard']:.3f} exact={ovl['exact']}"
    )

    # -- zero-copy clone: dev sandbox without copying a byte ----------------
    clone = pipe.catalog.clone_table("shop", "fact_sales", "dev", "fact_sandbox")
    qwriter_dev = LakeWriter(pipe.catalog, "dev")
    qwriter_dev.write(
        TableSpec(name="fact_sandbox", write_disposition="append"),
        spark.createDataFrame(
            [(99, "apac", 7.0)], "sale_id long, region string, amount double"
        ),
    )
    clone = pipe.catalog.load_table("dev", "fact_sandbox")
    src_n = pipe.catalog.load_table("shop", "fact_sales").read().count()
    print(
        f"clone diverged copy-on-write: sandbox={clone.read().count()} rows, "
        f"source untouched at {src_n}"
    )

    # -- clone-aware retention: expiring the source can't break the clone --
    from datetime import timedelta

    res = expire_snapshots(
        pipe.catalog.load_table("shop", "fact_sales"),
        older_than=timedelta(seconds=0),
        keep_last=1,
    )
    print(
        f"source expiry pinned {res['clone_pinned_files']} file(s) for the "
        f"live clone; sandbox still reads {clone.read().count()} rows"
    )

    # -- persisted IVF vector index: build once, append per load -----------
    from dlt_iceberg_spark.operators.vector_index import (
        append_vectors,
        build_vector_index,
        ivf_topk_persisted,
    )

    vecs = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 10) for j in range(8)]) for i in range(64)],
        "vec_id long, embedding array<double>",
    )
    idx = build_vector_index(
        pipe.catalog, "ann", "emb_idx", vecs, n_centroids=4
    )
    append_vectors(
        idx,
        spark.createDataFrame(
            [(100 + i, [float(i + j) for j in range(8)]) for i in range(8)],
            "vec_id long, embedding array<double>",
        ),
    )
    hits = ivf_topk_persisted(vecs.filter("vec_id = 0"), idx, k=3, nprobe=2)
    print(
        "persisted IVF index: top-3 for vec 0 ->",
        [(r.neighbor_id, round(r.cosine, 3)) for r in hits.collect()],
    )

    # -- takedown + rebuild: the rest of the index lifecycle ---------------
    from dlt_iceberg_spark.operators.vector_index import (
        delete_vectors,
        index_stats,
        rebuild_vector_index,
    )

    delete_vectors(idx, spark.createDataFrame([(5,), (101,)], "vec_id long"))
    rebuild_vector_index(idx, n_centroids=8)  # one atomic replace
    print(
        "after takedown + rebuild:",
        {k: index_stats(idx)[k] for k in ("lists", "rows", "skew")},
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="quickstart_wh_"))
