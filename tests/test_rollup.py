"""IncrementalRollup: CDC-maintained GROUP BY tables.

The invariant everything here checks: after any sequence of source
appends / row-level updates / hard deletes and rollup refreshes, the
rollup table equals the direct aggregate of the source's current state —
while each refresh reads only the changelog slice, never the source.
"""

import pytest
from pyspark.sql import functions as F

from dlt_iceberg_spark.lake.catalog import LakeCatalog
from dlt_iceberg_spark.lake.rollup import IncrementalRollup
from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec


def _mk_source(spark, warehouse, rows):
    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    writer.write(
        TableSpec(name="fact", write_disposition="append", primary_key=["id"]),
        spark.createDataFrame(rows, "id long, grp string, amt double"),
        load_id="l0",
    )
    return catalog, writer, catalog.load_table("ds", "fact")


def _direct(src):
    return {
        (r.grp): (r.s, r.n)
        for r in src.read()
        .groupBy("grp")
        .agg(F.sum("amt").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }


def _rolled(ru):
    return {r.grp: (r.total, r.n) for r in ru.read().collect()}


def test_rollup_tracks_appends_updates_deletes(spark, warehouse):
    catalog, writer, src = _mk_source(
        spark, warehouse, [(i, f"g{i % 3}", float(i)) for i in range(12)]
    )
    ru = IncrementalRollup(
        catalog, "ds", "fact_by_grp", src,
        keys=["grp"],
        aggs={"total": ("sum", "amt"), "n": ("count",)},
    )
    assert ru.refresh()["groups_touched"] == -1  # initial build
    assert _rolled(ru) == _direct(src)

    # append a batch touching one group + a new group
    writer.write(
        TableSpec(name="fact", write_disposition="append", primary_key=["id"]),
        spark.createDataFrame(
            [(100, "g0", 5.0), (101, "gNEW", 2.5)], "id long, grp string, amt double"
        ),
        load_id="l1",
    )
    src = catalog.load_table("ds", "fact")
    r = ru.refresh()
    assert r["groups_touched"] == 2
    assert _rolled(ru) == _direct(src)

    # row-level UPDATE through the format (position deletes + new images)
    src.update_where([("grp", "=", "g1")], {"amt": 100.0})
    src = catalog.load_table("ds", "fact")
    ru.refresh()
    assert _rolled(ru) == _direct(src)

    # CoW upsert rewrite: unchanged-row delete+insert pairs must cancel
    writer.write(
        TableSpec(
            name="fact",
            write_disposition={"disposition": "merge", "strategy": "upsert"},
            primary_key=["id"],
        ),
        spark.createDataFrame([(0, "g0", 1000.0)], "id long, grp string, amt double"),
        load_id="l2",
    )
    src = catalog.load_table("ds", "fact")
    ru.refresh()
    assert _rolled(ru) == _direct(src)


def test_rollup_group_vanishes_and_reappears(spark, warehouse):
    catalog, writer, src = _mk_source(
        spark, warehouse, [(1, "a", 1.0), (2, "b", 2.0)]
    )
    ru = IncrementalRollup(
        catalog, "ds", "r", src, keys=["grp"],
        aggs={"total": ("sum", "amt"), "n": ("count",)},
    )
    ru.refresh()
    # hard-delete every 'b' row -> the group must LEAVE the rollup
    writer.write(
        TableSpec(
            name="fact",
            write_disposition={"disposition": "merge", "strategy": "upsert"},
            primary_key=["id"],
            hard_delete_column="_del",
        ),
        spark.createDataFrame(
            [(2, "b", 2.0, True)], "id long, grp string, amt double, _del boolean"
        ),
        load_id="l1",
    )
    src = catalog.load_table("ds", "fact")
    ru.refresh()
    assert _rolled(ru) == {"a": (1.0, 1)}
    # reappear with fresh values
    writer.write(
        TableSpec(name="fact", write_disposition="append", primary_key=["id"]),
        spark.createDataFrame([(3, "b", 9.0)], "id long, grp string, amt double"),
        load_id="l2",
    )
    src = catalog.load_table("ds", "fact")
    ru.refresh()
    assert _rolled(ru) == _direct(src) == {"a": (1.0, 1), "b": (9.0, 1)}


def test_rollup_refresh_is_idempotent_noop(spark, warehouse):
    catalog, writer, src = _mk_source(spark, warehouse, [(1, "a", 1.0)])
    ru = IncrementalRollup(
        catalog, "ds", "r", src, keys=["grp"], aggs={"n": ("count",)}
    )
    ru.refresh()
    tgt = catalog.load_table("ds", "r")
    v = tgt.current_version()
    # no source change -> no rollup commit, cursor unchanged
    assert ru.refresh()["groups_touched"] == 0
    assert catalog.load_table("ds", "r").current_version() == v


def test_rollup_cursor_rides_the_data_commit(spark, warehouse):
    """Crash-replay: the cursor is the load-id marker in the SAME snapshot
    as the folded delta, so re-running refresh never double-applies."""
    catalog, writer, src = _mk_source(spark, warehouse, [(1, "a", 1.0)])
    ru = IncrementalRollup(
        catalog, "ds", "r", src, keys=["grp"],
        aggs={"total": ("sum", "amt")},
    )
    ru.refresh()
    writer.write(
        TableSpec(name="fact", write_disposition="append", primary_key=["id"]),
        spark.createDataFrame([(2, "a", 4.0)], "id long, grp string, amt double"),
        load_id="l1",
    )
    src = catalog.load_table("ds", "fact")
    ru.refresh()
    assert {r.grp: r.total for r in ru.read().collect()} == {"a": 5.0}
    # replaying refresh (as a crashed driver would) applies nothing
    ru.refresh()
    ru.refresh()
    assert {r.grp: r.total for r in ru.read().collect()} == {"a": 5.0}
    # marker points at the source head
    tgt = catalog.load_table("ds", "r")
    assert tgt.snapshot().summary["load_id"] == f"rollup-src-{src.current_version()}"


def test_rollup_nonnull_count_and_counts_star(spark, warehouse):
    catalog, writer, src = _mk_source(spark, warehouse, [(1, "a", 1.0)])
    writer.write(
        TableSpec(name="fact", write_disposition="append", primary_key=["id"]),
        spark.createDataFrame(
            [(2, "a", None), (3, "a", 3.0)], "id long, grp string, amt double"
        ),
        load_id="l1",
    )
    src = catalog.load_table("ds", "fact")
    ru = IncrementalRollup(
        catalog, "ds", "r", src, keys=["grp"],
        aggs={"n_all": ("count", "*"), "n_amt": ("count", "amt")},
    )
    ru.refresh()
    row = ru.read().collect()[0]
    assert (row.n_all, row.n_amt) == (3, 2)
    src.position_delete_where([("id", "=", 2)])  # the NULL-amt row
    src = catalog.load_table("ds", "fact")
    ru.refresh()
    row = ru.read().collect()[0]
    assert (row.n_all, row.n_amt) == (2, 2)


def test_rollup_refuses_minmax_and_rebuild_recovers(spark, warehouse):
    catalog, writer, src = _mk_source(spark, warehouse, [(1, "a", 1.0)])
    with pytest.raises(ValueError, match="no inverse"):
        IncrementalRollup(
            catalog, "ds", "r", src, keys=["grp"], aggs={"m": ("max", "amt")}
        )
    ru = IncrementalRollup(
        catalog, "ds", "r", src, keys=["grp"], aggs={"total": ("sum", "amt")}
    )
    ru.refresh()
    writer.write(
        TableSpec(name="fact", write_disposition="append", primary_key=["id"]),
        spark.createDataFrame([(2, "b", 2.0)], "id long, grp string, amt double"),
        load_id="l1",
    )
    ru.rebuild()
    assert {r.grp: r.total for r in ru.read().collect()} == {"a": 1.0, "b": 2.0}


def test_rollup_changelog_fold_evaluated_once(spark, warehouse, monkeypatch):
    """The O(changed) changelog fold must run exactly once per refresh —
    not once for the touched-group count and again for the write (VERDICT
    r6 task 2).  Pin: an accumulator ticks per change image flowing out of
    read_changes; after refresh it equals the image count exactly."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from dlt_iceberg_spark.lake import table as table_mod

    catalog, writer, src = _mk_source(
        spark, warehouse, [(i, f"g{i % 3}", float(i)) for i in range(12)]
    )
    ru = IncrementalRollup(
        catalog, "ds", "r", src, keys=["grp"],
        aggs={"total": ("sum", "amt"), "n": ("count",)},
    )
    ru.refresh()
    writer.write(
        TableSpec(name="fact", write_disposition="append", primary_key=["id"]),
        spark.createDataFrame(
            [(100 + i, f"g{i % 2}", 1.0) for i in range(6)],
            "id long, grp string, amt double",
        ),
        load_id="l1",
    )
    src2 = catalog.load_table("ds", "fact")

    acc = spark.sparkContext.accumulator(0)

    @pandas_udf("double")
    def tick(s: pd.Series) -> pd.Series:
        acc.add(len(s))
        return s

    real = table_mod.LakeTable.read_changes

    def counted(self, *a, **kw):
        return real(self, *a, **kw).withColumn("amt", tick(F.col("amt")))

    monkeypatch.setattr(table_mod.LakeTable, "read_changes", counted)
    r = ru.refresh()
    monkeypatch.undo()
    assert r["groups_touched"] == 2
    assert acc.value == 6  # 6 insert images, each scanned exactly once
    assert _rolled(ru) == _direct(src2)


def _direct_minmax(src):
    return {
        r.grp: (r.total, r.lo, r.hi, r.n)
        for r in src.read()
        .groupBy("grp")
        .agg(
            F.sum("amt").alias("total"),
            F.min("amt").alias("lo"),
            F.max("amt").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }


def _rolled_minmax(ru):
    return {r.grp: (r.total, r.lo, r.hi, r.n) for r in ru.read().collect()}


def test_rollup_minmax_requires_rescan_strategy(spark, warehouse):
    catalog, writer, src = _mk_source(spark, warehouse, [(1, "a", 1.0)])
    with pytest.raises(ValueError, match="rescan"):
        IncrementalRollup(
            catalog, "ds", "r", src, keys=["grp"], aggs={"lo": ("min", "amt")}
        )


def test_rollup_minmax_rescan_survives_same_sum_swap(spark, warehouse):
    """The exact case that makes the zero-delta cancellation filter
    unsound for min/max: a rewrite swaps {3,5} for {4,4} — net sums and
    counts are unchanged, but the extremum moved.  Rescan mode must catch
    it."""
    catalog, writer, src = _mk_source(
        spark, warehouse, [(1, "x", 3.0), (2, "x", 5.0), (3, "y", 7.0)]
    )
    ru = IncrementalRollup(
        catalog, "ds", "r", src, keys=["grp"],
        aggs={
            "total": ("sum", "amt"), "lo": ("min", "amt"),
            "hi": ("max", "amt"), "n": ("count",),
        },
        strategy="rescan",
    )
    ru.refresh()
    assert _rolled_minmax(ru)["x"] == (8.0, 3.0, 5.0, 2)
    writer.write(
        TableSpec(
            name="fact",
            write_disposition={"disposition": "merge", "strategy": "upsert"},
            primary_key=["id"],
        ),
        spark.createDataFrame(
            [(1, "x", 4.0), (2, "x", 4.0)], "id long, grp string, amt double"
        ),
        load_id="l1",
    )
    src = catalog.load_table("ds", "fact")
    ru.refresh()
    assert _rolled_minmax(ru) == _direct_minmax(src)
    assert _rolled_minmax(ru)["x"] == (8.0, 4.0, 4.0, 2)


@pytest.mark.slow
def test_rollup_minmax_rescan_matches_full_recompute(spark, warehouse):
    """Property test (VERDICT r6 task 5): across a random mutation history
    of appends / updates / hard deletes / upserts, every refresh leaves
    the rescan-strategy rollup equal to a full recompute of the source —
    including extremum retraction (deleting the current max)."""
    import random

    rng = random.Random(77)
    catalog, writer, src = _mk_source(
        spark, warehouse,
        [(i, f"g{i % 4}", float(rng.randint(0, 50))) for i in range(24)],
    )
    ru = IncrementalRollup(
        catalog, "ds", "r", src, keys=["grp"],
        aggs={
            "total": ("sum", "amt"), "lo": ("min", "amt"),
            "hi": ("max", "amt"), "n": ("count",),
        },
        strategy="rescan",
    )
    ru.refresh()
    assert _rolled_minmax(ru) == _direct_minmax(src)
    next_id = 100
    for step in range(5):
        op = ["append", "update", "delete_max", "swap"][step % 4]
        live = src.read().collect()
        if op == "append":
            rows = [
                (next_id + j, f"g{rng.randrange(5)}", float(rng.randint(0, 50)))
                for j in range(4)
            ]
            next_id += 4
            writer.write(
                TableSpec(name="fact", write_disposition="append", primary_key=["id"]),
                spark.createDataFrame(rows, "id long, grp string, amt double"),
                load_id=f"s{step}",
            )
        elif op == "update":
            grp = rng.choice([r.grp for r in live])
            src.update_where([("grp", "=", grp)], {"amt": float(rng.randint(0, 50))})
        elif op == "delete_max":
            top = max(live, key=lambda r: r.amt)  # retract the extremum
            writer.write(
                TableSpec(
                    name="fact",
                    write_disposition={"disposition": "merge", "strategy": "upsert"},
                    primary_key=["id"],
                    hard_delete_column="_del",
                ),
                spark.createDataFrame(
                    [(top.id, top.grp, top.amt, True)],
                    "id long, grp string, amt double, _del boolean",
                ),
                load_id=f"s{step}",
            )
        else:  # swap: rewrite one row's amt via upsert
            victim = rng.choice(live)
            writer.write(
                TableSpec(
                    name="fact",
                    write_disposition={"disposition": "merge", "strategy": "upsert"},
                    primary_key=["id"],
                ),
                spark.createDataFrame(
                    [(victim.id, victim.grp, float(rng.randint(0, 50)))],
                    "id long, grp string, amt double",
                ),
                load_id=f"s{step}",
            )
        src = catalog.load_table("ds", "fact")
        ru.refresh()
        assert _rolled_minmax(ru) == _direct_minmax(src), f"step {step} ({op})"


def test_rollup_minmax_rescan_prunes_to_touched_keys(spark, warehouse, monkeypatch):
    """With a collectable touched-key set, the rescan scan must carry a
    per-key IN `where` so manifest stats can file-prune it."""
    from dlt_iceberg_spark.lake import table as table_mod

    catalog, writer, src = _mk_source(
        spark, warehouse, [(i, f"g{i % 3}", float(i)) for i in range(9)]
    )
    ru = IncrementalRollup(
        catalog, "ds", "r", src, keys=["grp"],
        aggs={"hi": ("max", "amt")}, strategy="rescan",
    )
    ru.refresh()
    writer.write(
        TableSpec(name="fact", write_disposition="append", primary_key=["id"]),
        spark.createDataFrame([(100, "g1", 99.0)], "id long, grp string, amt double"),
        load_id="l1",
    )
    src = catalog.load_table("ds", "fact")
    seen = []
    real = table_mod.LakeTable.read

    def spying(self, *a, **kw):
        if kw.get("where") is not None:
            seen.append(kw["where"])
        return real(self, *a, **kw)

    monkeypatch.setattr(table_mod.LakeTable, "read", spying)
    ru.refresh()
    monkeypatch.undo()
    assert [("grp", "in", ["g1"])] in seen
    assert _rolled_minmax_hi(ru) == {"g1": 99.0, "g0": 6.0, "g2": 8.0}


def _rolled_minmax_hi(ru):
    return {r.grp: r.hi for r in ru.read().collect()}


def test_rollup_refresh_inside_transaction_publishes_one_cut(spark, warehouse):
    """refresh(transaction=txn) stages the fold on the transaction's
    branch, READING the staged fact state — fact mutation and rollup
    advance in one atomic publish, so main never shows the fact table
    ahead of its summary."""
    catalog, writer, src = _mk_source(
        spark, warehouse, [(i, f"g{i % 2}", float(i)) for i in range(8)]
    )
    ru = IncrementalRollup(
        catalog, "ds", "fact_by_grp", src,
        keys=["grp"], aggs={"total": ("sum", "amt"), "n": ("count",)},
    )
    ru.refresh()
    before = _rolled(ru)

    txn = catalog.transaction("ds")
    txn.table("fact").update_where([("grp", "=", "g0")], {"amt": 50.0})
    r = ru.refresh(transaction=txn)
    assert r["groups_touched"] >= 1
    # pre-commit: main still shows the OLD cut on both tables
    assert _rolled(ru) == before
    assert _rolled(ru) == _direct(catalog.load_table("ds", "fact"))
    res = txn.commit()
    assert sorted(res["tables"]) == ["fact", "fact_by_grp"]
    # post-commit: both advanced to the same cut
    src = catalog.load_table("ds", "fact")
    assert _rolled(ru) == _direct(src)
    assert {v for v in _rolled(ru)} == {"g0", "g1"}
    # marker names the committed fact head: replay refresh is a no-op
    assert ru.refresh()["groups_touched"] == 0


def test_rollup_avg_maintained_exactly_under_deletes(spark, warehouse):
    """("avg", col) decomposes into hidden sum + non-null count and is
    derived at read — so deletes and NULLs retract it exactly like SQL
    AVG recomputed from scratch."""
    catalog, writer, src = _mk_source(
        spark, warehouse, [(1, "a", 2.0), (2, "a", 4.0), (3, "b", 9.0)]
    )
    writer.write(
        TableSpec(name="fact", write_disposition="append", primary_key=["id"]),
        spark.createDataFrame([(4, "a", None)], "id long, grp string, amt double"),
        load_id="l1",
    )
    src = catalog.load_table("ds", "fact")
    ru = IncrementalRollup(
        catalog, "ds", "r", src, keys=["grp"],
        aggs={"mean_amt": ("avg", "amt"), "n": ("count",)},
    )
    ru.refresh()
    got = {r.grp: (r.mean_amt, r.n) for r in ru.read().collect()}
    assert got == {"a": (3.0, 3), "b": (9.0, 1)}  # NULL excluded from avg
    assert set(ru.read().columns) == {"grp", "mean_amt", "n"}
    # delete one 'a' value -> mean shifts to the survivor's value
    src.position_delete_where([("id", "=", 2)])
    ru.source = catalog.load_table("ds", "fact")
    ru.refresh()
    got = {r.grp: (r.mean_amt, r.n) for r in ru.read().collect()}
    assert got == {"a": (2.0, 2), "b": (9.0, 1)}
    # delete the LAST non-null 'a' value -> avg goes NULL, count stays
    src = catalog.load_table("ds", "fact")
    src.position_delete_where([("id", "=", 1)])
    ru.source = catalog.load_table("ds", "fact")
    ru.refresh()
    got = {r.grp: (r.mean_amt, r.n) for r in ru.read().collect()}
    assert got == {"a": (None, 1), "b": (9.0, 1)}


@pytest.mark.slow
def test_rollup_count_distinct_rescan(spark, warehouse):
    """count_distinct rides the same touched-group rescan as min/max —
    exact under inserts, updates, and retraction of the last occurrence
    of a value."""
    catalog, writer, src = _mk_source(
        spark, warehouse,
        [(1, "a", 1.0), (2, "a", 1.0), (3, "a", 2.0), (4, "b", 5.0)],
    )
    ru = IncrementalRollup(
        catalog, "ds", "r", src, keys=["grp"],
        aggs={"nd": ("count_distinct", "amt"), "n": ("count",)},
        strategy="rescan",
    )
    ru.refresh()
    got = {r.grp: (r.nd, r.n) for r in ru.read().collect()}
    assert got == {"a": (2, 3), "b": (1, 1)}
    # delete ONE of the two amt=1.0 rows: distinct count must NOT drop
    src.position_delete_where([("id", "=", 2)])
    ru.source = catalog.load_table("ds", "fact")
    ru.refresh()
    got = {r.grp: (r.nd, r.n) for r in ru.read().collect()}
    assert got == {"a": (2, 2), "b": (1, 1)}
    # delete the LAST amt=1.0 row: now it drops
    src = catalog.load_table("ds", "fact")
    src.position_delete_where([("id", "=", 1)])
    ru.source = catalog.load_table("ds", "fact")
    ru.refresh()
    got = {r.grp: (r.nd, r.n) for r in ru.read().collect()}
    assert got == {"a": (1, 1), "b": (1, 1)}
