"""CDC streaming source (``read_stream(..., changes=True)``) — the
streaming twin of ``LakeTable.read_changes``, which serves as its batch
ORACLE throughout: for any mutation history, draining the change stream
from the beginning must produce exactly the batch changelog's multiset
of images.
"""

import random

import pytest
from pyspark.sql import functions as F

from dlt_iceberg_spark.lake.catalog import LakeCatalog
from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec
from dlt_iceberg_spark.streaming.source import read_stream

_QN = [0]


def _drain(spark, sdf):
    _QN[0] += 1
    name = f"cdc_sink_{_QN[0]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}")


def _images(df):
    cols = sorted(df.columns)
    out = {}
    for r in df.select(*cols).collect():
        t = tuple(r)
        out[t] = out.get(t, 0) + 1
    return out


def _mk(spark, warehouse):
    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    writer.write(
        TableSpec(name="t", write_disposition="append", primary_key=["id"]),
        spark.createDataFrame(
            [(i, f"g{i % 3}", float(i)) for i in range(10)],
            "id long, grp string, amt double",
        ),
        load_id="l0",
    )
    return catalog, writer


def _check_against_batch_oracle(spark, catalog, from_version=None):
    t = catalog.load_table("ds", "t")
    batch = t.read_changes(from_version)
    opts = (
        {"from_beginning": True}
        if from_version is None
        else {"starting_version": from_version}
    )
    stream = _drain(spark, read_stream(spark, t.location, changes=True, **opts))
    assert _images(stream) == _images(batch)
    return stream


def test_appends_stream_as_insert_images(spark, warehouse):
    catalog, writer = _mk(spark, warehouse)
    writer.write(
        TableSpec(name="t", write_disposition="append", primary_key=["id"]),
        spark.createDataFrame([(100, "gX", 1.5)], "id long, grp string, amt double"),
        load_id="l1",
    )
    out = _check_against_batch_oracle(spark, catalog)
    assert set(out.select("_change_type").distinct().toPandas()["_change_type"]) == {
        "insert"
    }
    assert out.count() == 11


def test_update_where_streams_delete_insert_pairs(spark, warehouse):
    catalog, writer = _mk(spark, warehouse)
    catalog.load_table("ds", "t").update_where([("grp", "=", "g1")], {"amt": 99.0})
    out = _check_against_batch_oracle(spark, catalog)
    pairs = out.filter(F.col("_change_type") == "delete").collect()
    assert {r.grp for r in pairs} == {"g1"}  # old images of touched rows only


def test_position_delete_streams_old_images(spark, warehouse):
    catalog, writer = _mk(spark, warehouse)
    catalog.load_table("ds", "t").position_delete_where([("id", "<", 3)])
    out = _check_against_batch_oracle(spark, catalog)
    dels = out.filter(F.col("_change_type") == "delete").collect()
    assert sorted(r.id for r in dels) == [0, 1, 2]


def test_upsert_merge_streams_full_image_resolution(spark, warehouse):
    catalog, writer = _mk(spark, warehouse)
    writer.write(
        TableSpec(
            name="t",
            write_disposition={"disposition": "merge", "strategy": "upsert"},
            primary_key=["id"],
        ),
        spark.createDataFrame(
            [(0, "g0", 1000.0), (55, "gN", 5.0)], "id long, grp string, amt double"
        ),
        load_id="l1",
    )
    _check_against_batch_oracle(spark, catalog)


def test_hard_delete_streams_delete_images(spark, warehouse):
    catalog, writer = _mk(spark, warehouse)
    writer.write(
        TableSpec(
            name="t",
            write_disposition={"disposition": "merge", "strategy": "upsert"},
            primary_key=["id"],
            hard_delete_column="_del",
        ),
        spark.createDataFrame(
            [(4, "g1", 4.0, True)], "id long, grp string, amt double, _del boolean"
        ),
        load_id="l1",
    )
    _check_against_batch_oracle(spark, catalog)


def test_compaction_contributes_nothing(spark, warehouse):
    from dlt_iceberg_spark.lake.maintenance import compact_table

    catalog, writer = _mk(spark, warehouse)
    writer.write(
        TableSpec(name="t", write_disposition="append", primary_key=["id"]),
        spark.createDataFrame([(100, "gX", 1.0)], "id long, grp string, amt double"),
        load_id="l1",
    )
    v_before = catalog.load_table("ds", "t").current_version()
    compact_table(catalog.load_table("ds", "t"))
    out = _drain(
        spark,
        read_stream(
            spark,
            catalog.load_table("ds", "t").location,
            changes=True,
            starting_version=v_before,
        ),
    )
    assert out.count() == 0


def test_starting_version_slices_like_batch(spark, warehouse):
    catalog, writer = _mk(spark, warehouse)
    v0 = catalog.load_table("ds", "t").current_version()
    catalog.load_table("ds", "t").update_where([("id", "=", 7)], {"amt": -1.0})
    writer.write(
        TableSpec(name="t", write_disposition="append", primary_key=["id"]),
        spark.createDataFrame([(200, "gZ", 2.0)], "id long, grp string, amt double"),
        load_id="l1",
    )
    _check_against_batch_oracle(spark, catalog, from_version=v0)


def test_property_random_histories_match_batch_oracle(spark, warehouse):
    """Seeded random mutation histories (append / update_where /
    position-delete / upsert / hard-delete / compaction / replace) — the drained
    CDC stream must equal read_changes(None) image-for-image."""
    rng = random.Random(1234)
    catalog, writer = _mk(spark, warehouse)
    next_id = [1000]
    for step in range(8):
        op = rng.choice(
            ["append", "update", "posdel", "upsert", "harddel", "compact", "replace"]
        )
        t = catalog.load_table("ds", "t")
        if op == "append":
            rows = [
                (next_id[0] + i, f"g{rng.randint(0, 3)}", float(rng.randint(0, 50)))
                for i in range(rng.randint(1, 4))
            ]
            next_id[0] += len(rows)
            writer.write(
                TableSpec(name="t", write_disposition="append", primary_key=["id"]),
                spark.createDataFrame(rows, "id long, grp string, amt double"),
                load_id=f"s{step}",
            )
        elif op == "update":
            t.update_where(
                [("grp", "=", f"g{rng.randint(0, 3)}")],
                {"amt": float(rng.randint(100, 200))},
            )
        elif op == "posdel":
            t.position_delete_where([("id", "<", rng.randint(1, 6))])
        elif op == "upsert":
            existing = [r.id for r in t.read().select("id").limit(5).collect()]
            rows = [(i, "gU", 7.0) for i in existing[:2]] + [
                (next_id[0], "gU", 8.0)
            ]
            next_id[0] += 1
            writer.write(
                TableSpec(
                    name="t",
                    write_disposition={"disposition": "merge", "strategy": "upsert"},
                    primary_key=["id"],
                ),
                spark.createDataFrame(rows, "id long, grp string, amt double"),
                load_id=f"s{step}",
            )
        elif op == "harddel":
            victim = [r.id for r in t.read().select("id").limit(1).collect()]
            if victim:
                writer.write(
                    TableSpec(
                        name="t",
                        write_disposition={"disposition": "merge", "strategy": "upsert"},
                        primary_key=["id"],
                        hard_delete_column="_del",
                    ),
                    spark.createDataFrame(
                        [(victim[0], "x", 0.0, True)],
                        "id long, grp string, amt double, _del boolean",
                    ),
                    load_id=f"s{step}",
                )
        elif op == "compact":
            from dlt_iceberg_spark.lake.maintenance import compact_table

            compact_table(t)
        else:  # replace: full rewrite -> delete images for every live row
            rows = [
                (next_id[0] + i, "gR", float(i)) for i in range(rng.randint(2, 5))
            ]
            next_id[0] += len(rows)
            writer.write(
                TableSpec(name="t", write_disposition="replace"),
                spark.createDataFrame(rows, "id long, grp string, amt double"),
                load_id=f"s{step}",
            )
    _check_against_batch_oracle(spark, catalog)


def test_cdc_layout_ops_stay_in_sync_with_table_constant():
    """The streaming planner's layout-only op list must equal the batch
    changelog's (source.py promises this equality in a comment)."""
    from dlt_iceberg_spark.lake.table import LakeTable
    from dlt_iceberg_spark.streaming.source import _CDC_LAYOUT_ONLY_OPS

    assert set(_CDC_LAYOUT_ONLY_OPS) == set(LakeTable._LAYOUT_ONLY_OPS)


def test_stream_mirror_replicates_and_catches_up(spark, warehouse, tmp_path):
    """stream_mirror: CDC stream -> per-epoch merge apply.  The mirror
    equals the source after the first drain, catches up after further
    mutations using the SAME checkpoint (only new changes applied), and
    propagates hard deletes."""
    from dlt_iceberg_spark.streaming.mirror import stream_mirror

    catalog, writer = _mk(spark, warehouse)
    src = catalog.load_table("ds", "t")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = stream_mirror(
            spark, src.location, writer, "t_mirror", ["id"], ckpt,
            query_name="mirror_test",
        )
        q.awaitTermination(180)

    def snap(table):
        return {
            (r.id, r.grp, r.amt)
            for r in catalog.load_table("ds", table).read()
            .select("id", "grp", "amt").collect()
        }

    drain()
    assert snap("t_mirror") == snap("t")

    # mutate the source: update + delete + append, then catch up
    src.update_where([("grp", "=", "g1")], {"amt": 77.0})
    src = catalog.load_table("ds", "t")
    src.position_delete_where([("id", "=", 0)])
    writer.write(
        TableSpec(name="t", write_disposition="append", primary_key=["id"]),
        spark.createDataFrame([(50, "gZ", 5.0)], "id long, grp string, amt double"),
        load_id="l9",
    )
    drain()
    assert snap("t_mirror") == snap("t")
    assert (0, "g0", 0.0) not in snap("t_mirror")  # delete propagated
