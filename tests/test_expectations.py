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


# -- aggregate-level contracts (batch_expectations) -----------------------


def test_batch_expectations_fail_aborts_whole_batch(spark, warehouse):
    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    with pytest.raises(ExpectationViolationError, match="enough_rows") as ei:
        writer.write(
            TableSpec(
                name="t", write_disposition="append",
                batch_expectations={"enough_rows": "count(*) >= 1000"},
            ),
            _df(spark),
            load_id="l0",
        )
    assert not is_retryable(ei.value)
    # nothing landed
    from dlt_iceberg_spark.errors import TableNotFoundError
    with pytest.raises((FileNotFoundError, TableNotFoundError)):
        catalog.load_table("ds", "t")


def test_batch_expectations_pass_and_null_fraction_contract(spark, warehouse):
    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    writer.write(
        TableSpec(
            name="t", write_disposition="append",
            batch_expectations={
                "enough_rows": "count(*) >= 4",
                "pk_mostly_nonnull": "sum(cast(id IS NULL AS int)) / count(*) < 0.5",
            },
        ),
        _df(spark),
        load_id="l0",
    )
    assert catalog.load_table("ds", "t").read().count() == 4


def test_batch_expectations_warn_mode_logs_and_lands(spark, warehouse, caplog):
    import logging

    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    with caplog.at_level(logging.WARNING, logger="dlt_iceberg_spark"):
        writer.write(
            TableSpec(
                name="t", write_disposition="append",
                batch_expectations={"enough_rows": "count(*) >= 1000"},
                on_batch_violation="warn",
            ),
            _df(spark),
            load_id="l0",
        )
    assert any("enough_rows" in r.message for r in caplog.records)
    assert catalog.load_table("ds", "t").read().count() == 4


def test_batch_expectations_evaluate_after_row_routing(spark, warehouse):
    """Aggregate contracts gate what LANDS: with quarantine routing, the
    count runs over the clean rows, not the raw batch."""
    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    spec = TableSpec(
        name="t", write_disposition="append",
        expectations=EXPECT, on_violation="quarantine",
        batch_expectations={"enough_clean": "count(*) >= 3"},
    )
    # raw batch has 4 rows but only 2 clean ones -> the contract fails;
    # the quarantine write happens before the gate by design, so rejects
    # stay inspectable even when the clean batch aborts.
    with pytest.raises(ExpectationViolationError, match="enough_clean"):
        writer.write(spec, _df(spark), load_id="l0")
    from dlt_iceberg_spark.errors import TableNotFoundError
    with pytest.raises((FileNotFoundError, TableNotFoundError)):
        catalog.load_table("ds", "t")
    # passing contract at the clean-row level lands both sides
    spec2 = TableSpec(
        name="t", write_disposition="append",
        expectations=EXPECT, on_violation="quarantine",
        batch_expectations={"enough_clean": "count(*) >= 2"},
    )
    writer.write(spec2, _df(spark), load_id="l1")
    assert catalog.load_table("ds", "t").read().count() == 2


def test_batch_expectations_empty_batch_null_aggregate_violates(spark, warehouse):
    writer = LakeWriter(LakeCatalog(spark, warehouse), "ds")
    empty = _df(spark).filter("id > 100")
    with pytest.raises(ExpectationViolationError, match="avg_positive"):
        writer.write(
            TableSpec(
                name="t", write_disposition="append",
                batch_expectations={"avg_positive": "avg(amount) > 0"},
            ),
            empty,
        )


def test_batch_expectations_invalid_mode_rejected(spark, warehouse):
    writer = LakeWriter(LakeCatalog(spark, warehouse), "ds")
    with pytest.raises(ValueError, match="on_batch_violation"):
        writer.write(
            TableSpec(
                name="t", write_disposition="append",
                batch_expectations={"x": "count(*) > 0"},
                on_batch_violation="drop",
            ),
            _df(spark),
        )


def test_batch_expectations_compose_with_transactions(spark, warehouse):
    """A failing aggregate contract inside a transaction aborts the txn
    write; nothing publishes on commit of the surviving tables only."""
    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    writer.write(
        TableSpec(name="t", write_disposition="append"), _df(spark), load_id="l0"
    )
    txn = catalog.transaction("ds")
    with pytest.raises(ExpectationViolationError):
        txn.write(
            TableSpec(
                name="t", write_disposition="append",
                batch_expectations={"enough_rows": "count(*) >= 1000"},
            ),
            _df(spark),
            load_id="l1",
        )
    txn.rollback()
    assert catalog.load_table("ds", "t").read().count() == 4
