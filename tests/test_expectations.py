"""Write-time data-quality expectations (Delta Live Tables shape):
per-row SQL contracts with fail / drop / quarantine enforcement, applied
before casting so rejects keep their original values.
"""

import pytest

from dlt_iceberg_spark.errors import ExpectationViolationError, is_retryable
from dlt_iceberg_spark.lake.catalog import LakeCatalog
from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec


def _df(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, None, 20.0), (3, "c", -5.0), (4, "d", 7.0)],
        "id long, name string, amount double",
    )

EXPECT = {"name_present": "name IS NOT NULL", "amount_positive": "amount > 0"}


def test_fail_mode_aborts_with_counts_and_never_retries(spark, warehouse):
    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    with pytest.raises(ExpectationViolationError, match="name_present.*1") as ei:
        writer.write(
            TableSpec(name="t", write_disposition="append", expectations=EXPECT),
            _df(spark),
            load_id="l0",
        )
    assert "amount_positive" in str(ei.value)
    assert not is_retryable(ei.value)  # client error: fail fast, no backoff
    # nothing landed
    assert not catalog.table_exists("ds", "t") or (
        catalog.load_table("ds", "t").read().count() == 0
    )


def test_fail_mode_passes_clean_batches(spark, warehouse):
    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    clean = _df(spark).filter("name IS NOT NULL AND amount > 0")
    writer.write(
        TableSpec(name="t", write_disposition="append", expectations=EXPECT),
        clean,
        load_id="l0",
    )
    assert catalog.load_table("ds", "t").read().count() == 2


def test_drop_mode_filters_violations(spark, warehouse):
    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    writer.write(
        TableSpec(
            name="t", write_disposition="append",
            expectations=EXPECT, on_violation="drop",
        ),
        _df(spark),
        load_id="l0",
    )
    assert sorted(
        r.id for r in catalog.load_table("ds", "t").read().collect()
    ) == [1, 4]


def test_quarantine_mode_diverts_rejects_with_reasons(spark, warehouse):
    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    writer.write(
        TableSpec(
            name="t", write_disposition="append",
            expectations=EXPECT, on_violation="quarantine",
        ),
        _df(spark),
        load_id="l0",
    )
    assert sorted(
        r.id for r in catalog.load_table("ds", "t").read().collect()
    ) == [1, 4]
    q = {
        r.id: sorted(r._violated_expectations)
        for r in catalog.load_table("ds", "t__quarantine").read().collect()
    }
    assert q == {2: ["name_present"], 3: ["amount_positive"]}


def test_null_predicate_result_counts_as_violation(spark, warehouse):
    # amount IS NULL makes `amount > 0` NULL -> violation, not a pass
    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 1.0)], "id long, name string, amount double"
    )
    writer.write(
        TableSpec(
            name="t", write_disposition="append",
            expectations={"amount_positive": "amount > 0"},
            on_violation="drop",
        ),
        df,
        load_id="l0",
    )
    assert [r.id for r in catalog.load_table("ds", "t").read().collect()] == [2]


def test_expectations_compose_with_merge_and_transactions(spark, warehouse):
    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    spec = TableSpec(
        name="t",
        write_disposition={"disposition": "merge", "strategy": "upsert"},
        primary_key=["id"],
        expectations={"amount_positive": "amount > 0"},
        on_violation="quarantine",
    )
    writer.write(spec, _df(spark).filter("id IN (1, 4)"), load_id="l0")
    txn = catalog.transaction("ds")
    txn.write(
        spec,
        spark.createDataFrame(
            [(1, "a", 99.0), (5, "e", -1.0)], "id long, name string, amount double"
        ),
        load_id="l1",
    )
    # staged: main unchanged, quarantine staged on the SAME branch
    assert {r.id: r.amount for r in catalog.load_table("ds", "t").read().collect()}[1] == 10.0
    txn.commit()
    vals = {r.id: r.amount for r in catalog.load_table("ds", "t").read().collect()}
    assert vals == {1: 99.0, 4: 7.0}
    q = [r.id for r in catalog.load_table("ds", "t__quarantine").read().collect()]
    assert q == [5]


def test_invalid_on_violation_rejected(spark, warehouse):
    writer = LakeWriter(LakeCatalog(spark, warehouse), "ds")
    with pytest.raises(ValueError, match="on_violation"):
        writer.write(
            TableSpec(
                name="t", write_disposition="append",
                expectations={"x": "id > 0"}, on_violation="explode",
            ),
            _df(spark),
        )


def test_pipeline_resource_expectations_fail_transactional_load(spark, warehouse):
    """A failing contract on ONE resource publishes NOTHING of a
    transactional multi-resource load."""
    from dlt_iceberg_spark.lake.pipeline import Pipeline, Resource

    p = Pipeline(spark, warehouse, dataset_name="ds")
    good = Resource(
        lambda: spark.createDataFrame([(1, 5.0)], "id long, amount double"),
        "clean", "append", ["id"],
    )
    bad = Resource(
        lambda: spark.createDataFrame([(2, -1.0)], "id long, amount double"),
        "dirty", "append", ["id"],
        expectations={"amount_positive": "amount > 0"},
    )
    with pytest.raises(ExpectationViolationError):
        p.run(good, bad, load_id="l0", transactional=True)
    with pytest.raises(Exception):
        p.catalog.load_table("ds", "clean").read()
    assert not p.state.load_recorded("l0")
    # quarantine mode lands both, rejects included, in one atomic cut
    bad_q = Resource(
        lambda: spark.createDataFrame(
            [(2, -1.0), (3, 4.0)], "id long, amount double"
        ),
        "dirty", "append", ["id"],
        expectations={"amount_positive": "amount > 0"},
        on_violation="quarantine",
    )
    info = p.run(good, bad_q, load_id="l1", transactional=True)
    assert sorted(info.tables) == ["clean", "dirty"]
    assert [r.id for r in p.catalog.load_table("ds", "dirty").read().collect()] == [3]
    assert [r.id for r in p.catalog.load_table("ds", "dirty__quarantine").read().collect()] == [2]


def test_expectations_apply_inside_streaming_writes(spark, warehouse, tmp_path):
    """stream_write reuses the disposition path, so data contracts hold
    per micro-batch with zero extra wiring: rejects quarantine, clean
    rows land."""
    from dlt_iceberg_spark.streaming.micro_batch import stream_write

    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    src_dir = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, "a", 5.0), (2, None, 6.0), (3, "c", -2.0)],
        "id long, name string, amount double",
    ).write.parquet(src_dir)
    stream = spark.readStream.schema("id long, name string, amount double").parquet(src_dir)
    q = stream_write(
        stream,
        writer,
        TableSpec(
            name="t", write_disposition="append",
            expectations=EXPECT, on_violation="quarantine",
        ),
        str(tmp_path / "ckpt"),
        query_name="exp_stream",
    )
    q.awaitTermination(120)
    assert sorted(r.id for r in catalog.load_table("ds", "t").read().collect()) == [1]
    assert sorted(
        r.id for r in catalog.load_table("ds", "t__quarantine").read().collect()
    ) == [2, 3]
