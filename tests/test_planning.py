"""Distributed scan planning: the Spark-job planner (lake/planning.py) must
return exactly the file set driver-side planning returns, across column
types, every predicate op, and missing/unbounded-stats edge cases — and the
two read() plan modes must produce identical data."""

import datetime
import os

import pytest
from pyspark.sql import types as T

from dlt_iceberg_spark.lake.manifest import DataFile, write_chunked
from dlt_iceberg_spark.lake.planning import plan_candidates
from dlt_iceberg_spark.lake.table import LakeTable, _file_may_match

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("name", T.StringType()),
        T.StructField("d", T.DateType()),
    ]
)

N = 3000


def _synthetic_files():
    out = []
    for i in range(N):
        stats = {
            "id": [i * 10, i * 10 + 9],
            "score": [i / 100.0, i / 100.0 + 0.5],
            "name": [f"u{i:05d}", f"u{i:05d}z"],
            "d": [
                f"2024-{(i % 12) + 1:02d}-01",
                f"2024-{(i % 12) + 1:02d}-28",
            ],
        }
        if i % 7 == 0:
            del stats["score"]  # missing stats -> file must survive score probes
        if i % 11 == 0:
            stats["id"] = [None, None]  # unbounded -> survives id probes
        out.append(
            DataFile(
                path=f"data/f{i:05d}.parquet",
                rows=10,
                bytes=100,
                stats=stats,
                partition={"p": i % 3},
                sequence=1,
            )
        )
    return out


@pytest.fixture(scope="module")
def manifest_set(spark, tmp_path_factory):
    loc = str(tmp_path_factory.mktemp("plan") / "t")
    os.makedirs(os.path.join(loc, "metadata"), exist_ok=True)
    files = _synthetic_files()
    refs = write_chunked(loc, files)
    assert len(refs) == 1  # below chunk size; ref-level prune tested elsewhere
    return spark, loc, files, refs


PREDICATES = [
    [("id", ">=", 25000)],
    [("id", "=", 123)],
    [("id", "<", 50)],
    [("id", "!=", 5)],
    [("id", ">", 29990)],
    [("score", ">", 14.0)],
    [("score", "<=", 0.4)],
    [("name", "<=", "u00100")],
    [("name", "=", "u00042")],
    [("d", ">=", "2024-11-01")],
    [("d", "=", "2024-03-15")],
    [("id", ">=", 10000), ("id", "<", 10500)],  # conjunction
    [("id", "in", [5, 12345, 29999])],
    [("name", "in", ["u00042z", "u02000"])],
    [("id", ">=", 0), ("score", ">", 29.0), ("name", ">", "u02900")],
]


@pytest.mark.parametrize("where", PREDICATES, ids=[str(w) for w in PREDICATES])
def test_spark_planner_matches_driver_planner(manifest_set, where):
    spark, loc, files, refs = manifest_set
    driver = sorted(
        f.path
        for f in files
        if all(_file_may_match(f, c, op, v) for c, op, v in where)
    )
    dist = sorted(
        f.path for f in plan_candidates(spark, loc, SCHEMA, refs, where)
    )
    assert dist == driver
    # sanity: the probes actually prune (otherwise this test proves
    # nothing) — except !=, which by design only skips single-valued files
    if not any(op == "!=" for _, op, _ in where):
        assert len(driver) < N


def test_spark_planner_keeps_missing_and_unbounded_stats(manifest_set):
    spark, loc, files, refs = manifest_set
    got = {f.path for f in plan_candidates(spark, loc, SCHEMA, refs, [("score", ">", 1e9)])}
    # only files WITHOUT score stats may survive an impossible probe
    assert got == {f.path for f in files if "score" not in f.stats}
    got = {f.path for f in plan_candidates(spark, loc, SCHEMA, refs, [("id", "=", -1)])}
    assert got == {f.path for f in files if f.stats["id"][0] is None}


def test_read_plan_modes_agree_end_to_end(spark, tmp_path):
    loc = str(tmp_path / "t")
    t = LakeTable(spark, loc)
    rows = [(i, f"n{i % 5}", datetime.date(2024, 1 + i % 12, 3)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, name string, d date").repartition(8, "id")
    t.commit(t.stage_dataframe(df), df.schema, "create", None)
    for where in (
        [("id", ">=", 150)],
        [("name", "=", "n3")],
        [("name", "in", ["n1", "n3"])],
        [("d", "<", datetime.date(2024, 4, 1))],  # date-object probe normalizes
    ):
        a = sorted(t.read(where=where, plan_mode="driver").collect())
        b = sorted(t.read(where=where, plan_mode="spark").collect())
        assert a == b and len(a) > 0


def test_read_rejects_unknown_plan_mode(spark, tmp_path):
    loc = str(tmp_path / "t2")
    t = LakeTable(spark, loc)
    df = spark.range(5).withColumnRenamed("id", "k")
    t.commit(t.stage_dataframe(df), df.schema, "create", None)
    with pytest.raises(ValueError, match="plan_mode"):
        t.read(where=[("k", "=", 1)], plan_mode="bogus")
