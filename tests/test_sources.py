"""Source tests: CSV/JSON file scans, record fetch with split/retry,
distributed fetch fan-out, and source→pipeline integration."""

import pytest

from dlt_iceberg_spark.lake.pipeline import Pipeline, Resource
from dlt_iceberg_spark.sources import (
    csv_source,
    distributed_fetch,
    fetch_with_split,
    flatten_record,
    json_source,
    records_source,
)
from dlt_iceberg_spark.sources.records import RangeTooLarge


@pytest.fixture()
def csv_file(tmp_path):
    f = tmp_path / "events.csv"
    f.write_text("event_id,user_id,value\n1,10,100\n2,20,200\n")
    return str(f)


def test_csv_source_with_casts(spark, csv_file):
    df = csv_source(
        spark, csv_file, casts={"event_id": "long", "user_id": "long", "value": "long"}
    )
    rows = {r.event_id: r for r in df.collect()}
    assert rows[1].value == 100 and rows[2].user_id == 20
    assert dict(df.dtypes)["event_id"] == "bigint"


def test_csv_source_with_schema(spark, csv_file):
    df = csv_source(spark, csv_file, schema="event_id long, user_id long, value long")
    assert df.schema.simpleString() == "struct<event_id:bigint,user_id:bigint,value:bigint>"
    assert df.count() == 2


def test_json_source(spark, tmp_path):
    f = tmp_path / "rows.jsonl"
    f.write_text('{"id": 1, "name": "a"}\n{"id": 2, "name": "b"}\n')
    df = json_source(spark, str(f), schema="id long, name string")
    assert {(r.id, r.name) for r in df.collect()} == {(1, "a"), (2, "b")}


def test_fetch_with_split_and_retry():
    calls = []

    def fetch(start, end):
        calls.append((start, end))
        if end - start > 3:
            raise RangeTooLarge()
        yield from ({"k": i} for i in range(start, end))

    def split(start, end):
        mid = (start + end) // 2
        return [(start, mid), (mid, end)]

    got = list(fetch_with_split(fetch, 0, 6, split))
    assert [r["k"] for r in got] == [0, 1, 2, 3, 4, 5]
    assert (0, 6) in calls and (0, 3) in calls and (3, 6) in calls


def test_fetch_with_split_transient_retry():
    attempts = {"n": 0}

    def fetch(start, end):
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise ConnectionError("transient")
        yield {"ok": True}

    got = list(fetch_with_split(fetch, 0, 1, lambda s, e: [], backoff_base=0.0))
    assert got == [{"ok": True}] and attempts["n"] == 3


def test_flatten_record():
    rec = {"id": "q1", "properties": {"mag": 5.1, "place": "X"}, "geometry": {"coordinates": [1.0, 2.0, 3.0]}}
    flat = flatten_record(
        rec,
        {
            "id": ("id",),
            "mag": ("properties", "mag"),
            "lon": ("geometry", "coordinates", 0),
            "depth": ("geometry", "coordinates", 2),
            "missing": ("properties", "nope"),
        },
    )
    assert flat == {"id": "q1", "mag": 5.1, "lon": 1.0, "depth": 3.0, "missing": None}


def test_records_source_and_pipeline(spark, warehouse):
    recs = [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]
    df = records_source(spark, recs, schema="id long, v string")
    pipe = Pipeline(spark, warehouse)
    info = pipe.run(Resource(producer=df, name="recs"))
    assert info.tables == ["recs"]
    assert pipe.dataset().query("SELECT count(*) AS n FROM recs").collect()[0].n == 2


def test_distributed_fetch(spark):
    parts = [{"start": 0, "end": 3}, {"start": 3, "end": 5}, {"start": 5, "end": 9}]

    def fetch(part):
        for i in range(part["start"], part["end"]):
            yield {"k": i, "sq": i * i}

    df = distributed_fetch(spark, parts, fetch, schema="k long, sq long")
    rows = {r.k: r.sq for r in df.collect()}
    assert rows == {i: i * i for i in range(9)}
    # one task per partition descriptor
    assert df.rdd.getNumPartitions() == 3
