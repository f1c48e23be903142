"""IncrementalJoinView: CDC-maintained materialized joins.

The invariant: after any sequence of appends / updates / deletes on
EITHER side and view refreshes, the view equals the direct inner join of
both sources' current states — while each refresh reads the changelogs
plus key-pruned slices of the opposite sides, never a full re-join.
"""

import pytest
from pyspark.sql import functions as F

from dlt_iceberg_spark.lake.catalog import LakeCatalog
from dlt_iceberg_spark.lake.matview import IncrementalJoinView
from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec


def _mk_sources(spark, warehouse, orders, customers):
    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    writer.write(
        TableSpec(name="orders", write_disposition="append", primary_key=["o_id"]),
        spark.createDataFrame(orders, "o_id long, cust long, amt double"),
        load_id="o0",
    )
    writer.write(
        TableSpec(name="cust", write_disposition="append", primary_key=["c_id"]),
        spark.createDataFrame(customers, "c_id long, cust long, seg string"),
        load_id="c0",
    )
    return catalog, writer


def _view(catalog):
    return IncrementalJoinView(
        catalog, "ds", "order_cust",
        catalog.load_table("ds", "orders"),
        catalog.load_table("ds", "cust"),
        on=["cust"],
        left_pk=["o_id"],
        right_pk=["c_id"],
    )


def _direct(catalog):
    o = catalog.load_table("ds", "orders").read()
    c = catalog.load_table("ds", "cust").read()
    return {
        (r.o_id, r.c_id): (r.cust, r.amt, r.seg)
        for r in o.join(c, on="cust", how="inner").collect()
    }


def _rolled(mv):
    return {
        (r.o_id, r.c_id): (r.cust, r.amt, r.seg) for r in mv.read().collect()
    }


@pytest.mark.slow
def test_join_view_tracks_both_sides(spark, warehouse):
    catalog, writer = _mk_sources(
        spark, warehouse,
        orders=[(i, i % 3, float(i)) for i in range(9)],
        customers=[(100 + g, g, f"seg{g}") for g in range(4)],  # g=3 unmatched
    )
    mv = _view(catalog)
    assert mv.refresh()["pairs_touched"] == -1
    assert _rolled(mv) == _direct(catalog)

    # LEFT side: append orders for an existing and an unmatched customer
    writer.write(
        TableSpec(name="orders", write_disposition="append", primary_key=["o_id"]),
        spark.createDataFrame(
            [(50, 1, 5.5), (51, 9, 6.5)], "o_id long, cust long, amt double"
        ),
        load_id="o1",
    )
    mv.left = catalog.load_table("ds", "orders")
    r = mv.refresh()
    assert r["pairs_touched"] == 1  # only cust=1 joins
    assert _rolled(mv) == _direct(catalog)

    # RIGHT side: append the customer that makes o_id=51 join
    writer.write(
        TableSpec(name="cust", write_disposition="append", primary_key=["c_id"]),
        spark.createDataFrame([(109, 9, "seg9")], "c_id long, cust long, seg string"),
        load_id="c1",
    )
    mv.right = catalog.load_table("ds", "cust")
    mv.refresh()
    assert _rolled(mv) == _direct(catalog)
    assert (51, 109) in _rolled(mv)

    # LEFT update: amounts move, view payload follows
    mv.left.update_where([("cust", "=", 0)], {"amt": 99.0})
    mv.left = catalog.load_table("ds", "orders")
    mv.refresh()
    assert _rolled(mv) == _direct(catalog)

    # RIGHT delete: customer leaves -> all their pairs leave the view
    writer.write(
        TableSpec(
            name="cust",
            write_disposition={"disposition": "merge", "strategy": "upsert"},
            primary_key=["c_id"],
            hard_delete_column="_del",
        ),
        spark.createDataFrame(
            [(101, 1, "seg1", True)], "c_id long, cust long, seg string, _del boolean"
        ),
        load_id="c2",
    )
    mv.right = catalog.load_table("ds", "cust")
    mv.refresh()
    direct = _direct(catalog)
    assert _rolled(mv) == direct
    assert not any(c == 101 for (_, c) in _rolled(mv))


@pytest.mark.slow
def test_join_view_both_sides_change_in_one_refresh(spark, warehouse):
    """The IVM cross-term case: the same pair's A-row AND B-row change in
    a single refresh window — stale half-updated images must cancel in
    the signed content fold, leaving exactly the new pair."""
    catalog, writer = _mk_sources(
        spark, warehouse,
        orders=[(1, 7, 10.0), (2, 8, 20.0)],
        customers=[(70, 7, "old7"), (80, 8, "old8")],
    )
    mv = _view(catalog)
    mv.refresh()
    # mutate BOTH sides before refreshing once
    lt = catalog.load_table("ds", "orders")
    lt.update_where([("o_id", "=", 1)], {"amt": 11.0})
    rt = catalog.load_table("ds", "cust")
    rt.update_where([("c_id", "=", 70)], {"seg": "new7"})
    mv.left = catalog.load_table("ds", "orders")
    mv.right = catalog.load_table("ds", "cust")
    mv.refresh()
    got = _rolled(mv)
    assert got == _direct(catalog)
    assert got[(1, 70)] == (7, 11.0, "new7")  # fully-new image, no stale mix


def test_join_view_idempotent_and_cursor_rides_commit(spark, warehouse):
    catalog, writer = _mk_sources(
        spark, warehouse,
        orders=[(1, 5, 1.0)], customers=[(50, 5, "s")],
    )
    mv = _view(catalog)
    mv.refresh()
    v = catalog.load_table("ds", "order_cust").current_version()
    assert mv.refresh()["pairs_touched"] == 0
    assert catalog.load_table("ds", "order_cust").current_version() == v
    # marker names both source heads
    lid = catalog.load_table("ds", "order_cust").snapshot().summary["load_id"]
    assert lid == (
        f"mjoin-a{mv.left.current_version()}-b{mv.right.current_version()}"
    )


@pytest.mark.slow
def test_join_view_random_history_matches_full_join(spark, warehouse):
    """Property: across random mutations on both sides, every refresh
    leaves the view equal to the recomputed inner join."""
    import random

    rng = random.Random(31)
    catalog, writer = _mk_sources(
        spark, warehouse,
        orders=[(i, rng.randrange(5), float(rng.randint(1, 50))) for i in range(12)],
        customers=[(100 + g, g, f"s{g}") for g in range(6)],
    )
    mv = _view(catalog)
    mv.refresh()
    next_o = 100
    for step in range(5):
        op = ["o_append", "o_update", "c_update", "o_delete", "c_append"][step]
        if op == "o_append":
            writer.write(
                TableSpec(name="orders", write_disposition="append", primary_key=["o_id"]),
                spark.createDataFrame(
                    [(next_o + j, rng.randrange(7), float(j)) for j in range(3)],
                    "o_id long, cust long, amt double",
                ),
                load_id=f"s{step}",
            )
            next_o += 3
        elif op == "o_update":
            catalog.load_table("ds", "orders").update_where(
                [("cust", "=", rng.randrange(5))], {"amt": 777.0}
            )
        elif op == "c_update":
            catalog.load_table("ds", "cust").update_where(
                [("cust", "=", rng.randrange(5))], {"seg": f"upd{step}"}
            )
        elif op == "o_delete":
            victim = rng.choice(
                [r.o_id for r in catalog.load_table("ds", "orders").read().collect()]
            )
            catalog.load_table("ds", "orders").position_delete_where(
                [("o_id", "=", victim)]
            )
        else:
            writer.write(
                TableSpec(name="cust", write_disposition="append", primary_key=["c_id"]),
                spark.createDataFrame(
                    [(200 + step, 6, f"late{step}")], "c_id long, cust long, seg string"
                ),
                load_id=f"s{step}",
            )
        mv.left = catalog.load_table("ds", "orders")
        mv.right = catalog.load_table("ds", "cust")
        mv.refresh()
        assert _rolled(mv) == _direct(catalog), f"step {step} ({op})"


def test_join_view_prunes_opposite_side_by_key_range(spark, warehouse, monkeypatch):
    from dlt_iceberg_spark.lake import table as table_mod

    catalog, writer = _mk_sources(
        spark, warehouse,
        orders=[(i, i % 4, float(i)) for i in range(8)],
        customers=[(100 + g, g, f"s{g}") for g in range(4)],
    )
    mv = _view(catalog)
    mv.refresh()
    writer.write(
        TableSpec(name="orders", write_disposition="append", primary_key=["o_id"]),
        spark.createDataFrame([(99, 2, 9.0)], "o_id long, cust long, amt double"),
        load_id="o1",
    )
    mv.left = catalog.load_table("ds", "orders")
    seen = []
    real = table_mod.LakeTable.read

    def spying(self, *a, **kw):
        if kw.get("where") is not None:
            seen.append(kw["where"])
        return real(self, *a, **kw)

    monkeypatch.setattr(table_mod.LakeTable, "read", spying)
    mv.refresh()
    monkeypatch.undo()
    assert [("cust", "in", [2])] in seen
    assert _rolled(mv) == _direct(catalog)


def test_join_view_refuses_outer_and_collisions(spark, warehouse):
    catalog, writer = _mk_sources(
        spark, warehouse, orders=[(1, 0, 1.0)], customers=[(100, 0, "s")],
    )
    with pytest.raises(NotImplementedError, match="inner / left / right / full"):
        IncrementalJoinView(
            catalog, "ds", "v",
            catalog.load_table("ds", "orders"),
            catalog.load_table("ds", "cust"),
            on=["cust"], left_pk=["o_id"], right_pk=["c_id"], how="cross",
        )
    # column collision outside join keys
    writer.write(
        TableSpec(name="cust2", write_disposition="append", primary_key=["c_id"]),
        catalog.load_table("ds", "cust").read().withColumn("amt", F.lit(0.0)),
        load_id="cc",
    )
    mv = IncrementalJoinView(
        catalog, "ds", "v2",
        catalog.load_table("ds", "orders"),
        catalog.load_table("ds", "cust2"),
        on=["cust"], left_pk=["o_id"], right_pk=["c_id"],
    )
    with pytest.raises(ValueError, match="collision"):
        mv.refresh()


def test_join_view_refresh_inside_transaction_one_cut(spark, warehouse):
    """refresh(transaction=txn): source mutation and the join fold stage
    on the txn branch and publish as one atomic cut — main never shows a
    source ahead of the view."""
    catalog, writer = _mk_sources(
        spark, warehouse,
        orders=[(1, 5, 1.0), (2, 6, 2.0)],
        customers=[(50, 5, "a"), (60, 6, "b")],
    )
    mv = _view(catalog)
    mv.refresh()
    before = _rolled(mv)

    txn = catalog.transaction("ds")
    txn.table("orders").update_where([("cust", "=", 5)], {"amt": 42.0})
    mv.left = catalog.load_table("ds", "orders")
    r = mv.refresh(transaction=txn)
    assert r["pairs_touched"] >= 1
    # pre-commit: main shows the old cut on both
    assert _rolled(mv) == before
    res = txn.commit()
    assert sorted(res["tables"]) == ["order_cust", "orders"]
    assert _rolled(mv) == _direct(catalog)
    assert _rolled(mv)[(1, 50)][1] == 42.0
    assert mv.refresh()["pairs_touched"] == 0  # cursor rode the cut


@pytest.mark.slow
def test_rollup_composes_over_join_view(spark, warehouse):
    """CDC chains: fact tables -> IncrementalJoinView -> IncrementalRollup.
    The view is an ordinary LakeTable whose maintenance merges emit a
    changelog, so a rollup maintained FROM the view stays equal to the
    direct aggregate of the direct join after every propagated refresh."""
    from dlt_iceberg_spark.lake.rollup import IncrementalRollup

    catalog, writer = _mk_sources(
        spark, warehouse,
        orders=[(i, i % 3, float(i + 1)) for i in range(9)],
        customers=[(100 + g, g, f"s{g}") for g in range(3)],
    )
    mv = _view(catalog)
    mv.refresh()
    ru = IncrementalRollup(
        catalog, "ds", "by_seg",
        catalog.load_table("ds", "order_cust"),
        keys=["seg"],
        aggs={"total": ("sum", "amt"), "n": ("count",)},
    )
    ru.refresh()

    def _direct_agg():
        o = catalog.load_table("ds", "orders").read()
        c = catalog.load_table("ds", "cust").read()
        return {
            r.seg: (r.total, r.n)
            for r in o.join(c, on="cust", how="inner")
            .groupBy("seg")
            .agg(F.sum("amt").alias("total"), F.count(F.lit(1)).alias("n"))
            .collect()
        }

    assert {r.seg: (r.total, r.n) for r in ru.read().collect()} == _direct_agg()
    # mutate the base fact; propagate view -> rollup
    catalog.load_table("ds", "orders").update_where(
        [("cust", "=", 1)], {"amt": 100.0}
    )
    mv.left = catalog.load_table("ds", "orders")
    mv.refresh()
    ru.source = catalog.load_table("ds", "order_cust")
    ru.refresh()
    assert {r.seg: (r.total, r.n) for r in ru.read().collect()} == _direct_agg()
    # delete a customer; their orders leave the join, the rollup retracts
    writer.write(
        TableSpec(
            name="cust",
            write_disposition={"disposition": "merge", "strategy": "upsert"},
            primary_key=["c_id"],
            hard_delete_column="_del",
        ),
        spark.createDataFrame(
            [(102, 2, "s2", True)], "c_id long, cust long, seg string, _del boolean"
        ),
        load_id="c9",
    )
    mv.right = catalog.load_table("ds", "cust")
    mv.refresh()
    ru.source = catalog.load_table("ds", "order_cust")
    ru.refresh()
    got = {r.seg: (r.total, r.n) for r in ru.read().collect()}
    assert got == _direct_agg()
    assert "s2" not in got


# -- left outer joins ------------------------------------------------------


def _left_view(catalog):
    return IncrementalJoinView(
        catalog, "ds", "order_cust_l",
        catalog.load_table("ds", "orders"),
        catalog.load_table("ds", "cust"),
        on=["cust"], left_pk=["o_id"], right_pk=["c_id"], how="left",
    )


def _direct_left(catalog):
    o = catalog.load_table("ds", "orders").read()
    c = catalog.load_table("ds", "cust").read()
    return {
        (r.o_id, r.c_id): (r.amt, r.seg)
        for r in o.join(c, on="cust", how="left").collect()
    }


def _rolled_left(mv):
    return {(r.o_id, r.c_id): (r.amt, r.seg) for r in mv.read().collect()}


def test_left_join_view_null_extension_flips_both_ways(spark, warehouse):
    """A left row with no match shows null-extended; when its key's FIRST
    B-row arrives it flips to matched; when the key's LAST B-row leaves
    it flips back — the match-count zero-crossing machinery."""
    catalog, writer = _mk_sources(
        spark, warehouse,
        orders=[(1, 5, 1.0), (2, 9, 2.0)],   # cust=9 has no customer row
        customers=[(50, 5, "a")],
    )
    mv = _left_view(catalog)
    assert mv.refresh()["pairs_touched"] == -1
    got = _rolled_left(mv)
    assert got == _direct_left(catalog)
    assert got[(2, None)] == (2.0, None)  # null-extended

    # first B-row for cust=9 arrives -> flips to matched
    writer.write(
        TableSpec(name="cust", write_disposition="append", primary_key=["c_id"]),
        spark.createDataFrame([(90, 9, "z")], "c_id long, cust long, seg string"),
        load_id="c1",
    )
    mv.right = catalog.load_table("ds", "cust")
    mv.refresh()
    got = _rolled_left(mv)
    assert got == _direct_left(catalog)
    assert (2, 90) in got and (2, None) not in got

    # the key's last B-row leaves -> flips back to null-extended
    writer.write(
        TableSpec(
            name="cust",
            write_disposition={"disposition": "merge", "strategy": "upsert"},
            primary_key=["c_id"],
            hard_delete_column="_del",
        ),
        spark.createDataFrame(
            [(90, 9, "z", True)], "c_id long, cust long, seg string, _del boolean"
        ),
        load_id="c2",
    )
    mv.right = catalog.load_table("ds", "cust")
    mv.refresh()
    got = _rolled_left(mv)
    assert got == _direct_left(catalog)
    assert got[(2, None)] == (2.0, None)


def test_left_join_view_delta_left_rows_route_by_match(spark, warehouse):
    catalog, writer = _mk_sources(
        spark, warehouse,
        orders=[(1, 5, 1.0)],
        customers=[(50, 5, "a")],
    )
    mv = _left_view(catalog)
    mv.refresh()
    # new left rows: one matched key, one unmatched key
    writer.write(
        TableSpec(name="orders", write_disposition="append", primary_key=["o_id"]),
        spark.createDataFrame(
            [(2, 5, 2.0), (3, 77, 3.0)], "o_id long, cust long, amt double"
        ),
        load_id="o1",
    )
    mv.left = catalog.load_table("ds", "orders")
    mv.refresh()
    got = _rolled_left(mv)
    assert got == _direct_left(catalog)
    assert (2, 50) in got and got[(3, None)] == (3.0, None)
    # deleting the unmatched left row removes it from the view entirely
    catalog.load_table("ds", "orders").position_delete_where([("o_id", "=", 3)])
    mv.left = catalog.load_table("ds", "orders")
    mv.refresh()
    got = _rolled_left(mv)
    assert got == _direct_left(catalog)
    assert (3, None) not in got


@pytest.mark.slow
def test_left_join_view_random_history_matches_full_left_join(spark, warehouse):
    import random

    rng = random.Random(13)
    catalog, writer = _mk_sources(
        spark, warehouse,
        orders=[(i, rng.randrange(7), float(rng.randint(1, 50))) for i in range(10)],
        customers=[(100 + g, g, f"s{g}") for g in range(4)],  # keys 4-6 unmatched
    )
    mv = _left_view(catalog)
    mv.refresh()
    assert _rolled_left(mv) == _direct_left(catalog)
    next_o, next_c = 100, 300
    for step in range(6):
        op = ["o_append", "c_append", "o_update", "c_delete", "o_delete",
              "c_update"][step]
        if op == "o_append":
            writer.write(
                TableSpec(name="orders", write_disposition="append", primary_key=["o_id"]),
                spark.createDataFrame(
                    [(next_o + j, rng.randrange(8), float(j)) for j in range(3)],
                    "o_id long, cust long, amt double",
                ),
                load_id=f"s{step}",
            )
            next_o += 3
        elif op == "c_append":
            writer.write(
                TableSpec(name="cust", write_disposition="append", primary_key=["c_id"]),
                spark.createDataFrame(
                    [(next_c, rng.randrange(8), f"n{step}")],
                    "c_id long, cust long, seg string",
                ),
                load_id=f"s{step}",
            )
            next_c += 1
        elif op == "o_update":
            catalog.load_table("ds", "orders").update_where(
                [("cust", "=", rng.randrange(7))], {"amt": 555.0}
            )
        elif op == "c_delete":
            live = catalog.load_table("ds", "cust").read().collect()
            victim = rng.choice(live)
            writer.write(
                TableSpec(
                    name="cust",
                    write_disposition={"disposition": "merge", "strategy": "upsert"},
                    primary_key=["c_id"],
                    hard_delete_column="_del",
                ),
                spark.createDataFrame(
                    [(victim.c_id, victim.cust, victim.seg, True)],
                    "c_id long, cust long, seg string, _del boolean",
                ),
                load_id=f"s{step}",
            )
        elif op == "o_delete":
            live = [r.o_id for r in catalog.load_table("ds", "orders").read().collect()]
            catalog.load_table("ds", "orders").position_delete_where(
                [("o_id", "=", rng.choice(live))]
            )
        else:
            catalog.load_table("ds", "cust").update_where(
                [("cust", "=", rng.randrange(7))], {"seg": f"u{step}"}
            )
        mv.left = catalog.load_table("ds", "orders")
        mv.right = catalog.load_table("ds", "cust")
        mv.refresh()
        assert _rolled_left(mv) == _direct_left(catalog), f"step {step} ({op})"


def test_left_join_view_halves_publish_atomically(spark, warehouse):
    """Without a caller transaction, a left refresh opens its own — the
    matched and unmatched tables advance in one cut (both carry the same
    mjoin marker after every refresh)."""
    catalog, writer = _mk_sources(
        spark, warehouse,
        orders=[(1, 5, 1.0), (2, 9, 2.0)],
        customers=[(50, 5, "a")],
    )
    mv = _left_view(catalog)
    mv.refresh()
    writer.write(
        TableSpec(name="cust", write_disposition="append", primary_key=["c_id"]),
        spark.createDataFrame([(90, 9, "z")], "c_id long, cust long, seg string"),
        load_id="c1",
    )
    mv.right = catalog.load_table("ds", "cust")
    mv.refresh()
    m_lid = catalog.load_table("ds", "order_cust_l").snapshot().summary["load_id"]
    u_lid = catalog.load_table("ds", "order_cust_l__unmatched").snapshot().summary["load_id"]
    assert m_lid == u_lid  # same cut
    assert mv.refresh()["pairs_touched"] == 0  # replay no-op


# -- right / full outer joins ----------------------------------------------


def _full_view(catalog, how):
    return IncrementalJoinView(
        catalog, "ds", f"oc_{how}",
        catalog.load_table("ds", "orders"),
        catalog.load_table("ds", "cust"),
        on=["cust"], left_pk=["o_id"], right_pk=["c_id"], how=how,
    )


def _direct_how(catalog, how):
    o = catalog.load_table("ds", "orders").read()
    c = catalog.load_table("ds", "cust").read()
    return {
        (r.o_id, r.c_id): (r.amt, r.seg)
        for r in o.join(c, on="cust", how=how).collect()
    }


def _rolled_how(mv):
    return {(r.o_id, r.c_id): (r.amt, r.seg) for r in mv.read().collect()}


def test_right_join_view_tracks_unmatched_customers(spark, warehouse):
    catalog, writer = _mk_sources(
        spark, warehouse,
        orders=[(1, 5, 1.0)],
        customers=[(50, 5, "a"), (60, 6, "lonely")],  # cust 6 unmatched
    )
    mv = _full_view(catalog, "right")
    mv.refresh()
    got = _rolled_how(mv)
    assert got == _direct_how(catalog, "right")
    assert got[(None, 60)] == (None, "lonely")
    # first order for cust 6 arrives -> customer flips to matched
    writer.write(
        TableSpec(name="orders", write_disposition="append", primary_key=["o_id"]),
        spark.createDataFrame([(2, 6, 9.0)], "o_id long, cust long, amt double"),
        load_id="o1",
    )
    mv.left = catalog.load_table("ds", "orders")
    mv.refresh()
    got = _rolled_how(mv)
    assert got == _direct_how(catalog, "right")
    assert (2, 60) in got and (None, 60) not in got
    # the order is deleted again -> customer flips back
    catalog.load_table("ds", "orders").position_delete_where([("o_id", "=", 2)])
    mv.left = catalog.load_table("ds", "orders")
    mv.refresh()
    got = _rolled_how(mv)
    assert got == _direct_how(catalog, "right")
    assert got[(None, 60)] == (None, "lonely")


@pytest.mark.slow
def test_full_join_view_random_history_matches_full_outer(spark, warehouse):
    import random

    rng = random.Random(97)
    catalog, writer = _mk_sources(
        spark, warehouse,
        orders=[(i, rng.randrange(7), float(rng.randint(1, 50))) for i in range(8)],
        customers=[(100 + g, g, f"s{g}") for g in range(2, 6)],  # partial overlap
    )
    mv = _full_view(catalog, "full")
    mv.refresh()
    assert _rolled_how(mv) == _direct_how(catalog, "full")
    next_o, next_c = 100, 300
    for step in range(6):
        op = ["o_append", "c_delete", "c_append", "o_delete", "o_update",
              "c_update"][step]
        if op == "o_append":
            writer.write(
                TableSpec(name="orders", write_disposition="append", primary_key=["o_id"]),
                spark.createDataFrame(
                    [(next_o + j, rng.randrange(8), float(j)) for j in range(3)],
                    "o_id long, cust long, amt double",
                ),
                load_id=f"s{step}",
            )
            next_o += 3
        elif op == "c_append":
            writer.write(
                TableSpec(name="cust", write_disposition="append", primary_key=["c_id"]),
                spark.createDataFrame(
                    [(next_c, rng.randrange(8), f"n{step}")],
                    "c_id long, cust long, seg string",
                ),
                load_id=f"s{step}",
            )
            next_c += 1
        elif op == "c_delete":
            live = catalog.load_table("ds", "cust").read().collect()
            victim = rng.choice(live)
            writer.write(
                TableSpec(
                    name="cust",
                    write_disposition={"disposition": "merge", "strategy": "upsert"},
                    primary_key=["c_id"],
                    hard_delete_column="_del",
                ),
                spark.createDataFrame(
                    [(victim.c_id, victim.cust, victim.seg, True)],
                    "c_id long, cust long, seg string, _del boolean",
                ),
                load_id=f"s{step}",
            )
        elif op == "o_delete":
            live = [r.o_id for r in catalog.load_table("ds", "orders").read().collect()]
            catalog.load_table("ds", "orders").position_delete_where(
                [("o_id", "=", rng.choice(live))]
            )
        elif op == "o_update":
            catalog.load_table("ds", "orders").update_where(
                [("cust", "=", rng.randrange(7))], {"amt": 888.0}
            )
        else:
            catalog.load_table("ds", "cust").update_where(
                [("cust", "=", rng.randrange(7))], {"seg": f"u{step}"}
            )
        mv.left = catalog.load_table("ds", "orders")
        mv.right = catalog.load_table("ds", "cust")
        mv.refresh()
        assert _rolled_how(mv) == _direct_how(catalog, "full"), f"step {step} ({op})"


def test_full_join_three_halves_one_cut(spark, warehouse):
    catalog, writer = _mk_sources(
        spark, warehouse,
        orders=[(1, 5, 1.0), (2, 9, 2.0)],
        customers=[(50, 5, "a"), (60, 6, "b")],
    )
    mv = _full_view(catalog, "full")
    mv.refresh()
    # one refresh touching all three halves: new order (matched), customer
    # delete (pairs -> left-unmatched), new lonely customer (right-unmatched)
    writer.write(
        TableSpec(name="orders", write_disposition="append", primary_key=["o_id"]),
        spark.createDataFrame([(3, 6, 3.0)], "o_id long, cust long, amt double"),
        load_id="o1",
    )
    writer.write(
        TableSpec(
            name="cust",
            write_disposition={"disposition": "merge", "strategy": "upsert"},
            primary_key=["c_id"],
            hard_delete_column="_del",
        ),
        spark.createDataFrame(
            [(50, 5, "a", True)], "c_id long, cust long, seg string, _del boolean"
        ),
        load_id="c1",
    )
    writer.write(
        TableSpec(name="cust", write_disposition="append", primary_key=["c_id"]),
        spark.createDataFrame([(70, 7, "c")], "c_id long, cust long, seg string"),
        load_id="c2",
    )
    mv.left = catalog.load_table("ds", "orders")
    mv.right = catalog.load_table("ds", "cust")
    mv.refresh()
    assert _rolled_how(mv) == _direct_how(catalog, "full")
    lids = {
        t: catalog.load_table("ds", t).snapshot().summary["load_id"]
        for t in ("oc_full", "oc_full__unmatched", "oc_full__unmatched_right")
    }
    assert len(set(lids.values())) == 1  # all three halves share one cut
    assert mv.refresh()["pairs_touched"] == 0


def test_outer_rebuild_halves_publish_atomically(spark, warehouse):
    """ADVICE r7: rebuild() on an outer view must honor the same
    atomicity contract as refresh() — without a caller transaction it
    opens its own, so the matched and unmatched replaces land as ONE cut
    (same marker), and results equal a direct full join."""
    catalog, writer = _mk_sources(
        spark, warehouse,
        orders=[(1, 5, 1.0), (2, 9, 2.0)],
        customers=[(50, 5, "a"), (60, 6, "lonely")],
    )
    mv = _full_view(catalog, "full")
    mv.refresh()
    # diverge the sources, then rebuild from scratch
    writer.write(
        TableSpec(name="orders", write_disposition="append", primary_key=["o_id"]),
        spark.createDataFrame([(3, 6, 3.0)], "o_id long, cust long, amt double"),
        load_id="o1",
    )
    mv.left = catalog.load_table("ds", "orders")
    r = mv.rebuild()
    assert r["pairs_touched"] == -1
    assert _rolled_how(mv) == _direct_how(catalog, "full")
    lids = {
        catalog.load_table("ds", t).snapshot().summary["load_id"]
        for t in ("oc_full", "oc_full__unmatched", "oc_full__unmatched_right")
    }
    assert len(lids) == 1  # one cut
    # a failure mid-rebuild publishes NOTHING (transaction rolls back)
    import dlt_iceberg_spark.lake.transaction as txn_mod

    before = {
        t: catalog.load_table("ds", t).current_version()
        for t in ("oc_full", "oc_full__unmatched", "oc_full__unmatched_right")
    }
    real = txn_mod.CatalogTransaction.write
    calls = []

    def failing(self, *a, **kw):
        calls.append(1)
        if len(calls) == 2:
            raise RuntimeError("boom mid-rebuild")
        return real(self, *a, **kw)

    txn_mod.CatalogTransaction.write = failing
    try:
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="boom"):
            mv.rebuild()
    finally:
        txn_mod.CatalogTransaction.write = real
    after = {
        t: catalog.load_table("ds", t).current_version()
        for t in ("oc_full", "oc_full__unmatched", "oc_full__unmatched_right")
    }
    assert after == before  # no torn halves
    # and the view still rebuilds cleanly afterwards
    assert _rolled_how(mv) == _direct_how(catalog, "full")


# -- select=[...] column projection (VERDICT r7 task 7) ----------------------


@pytest.mark.slow
def test_join_view_select_projection_random_history(spark, warehouse):
    """Property: a projected LEFT view equals the projected direct left
    join across random mutations — and updates that touch only
    UNPROJECTED columns fold to nothing (pairs_touched == 0, no view
    rewrite)."""
    import random

    rng = random.Random(7)
    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    writer.write(
        TableSpec(name="orders", write_disposition="append", primary_key=["o_id"]),
        spark.createDataFrame(
            [(i, rng.randrange(5), float(i), f"n{i}") for i in range(12)],
            "o_id long, cust long, amt double, note string",
        ),
        load_id="o0",
    )
    writer.write(
        TableSpec(name="cust", write_disposition="append", primary_key=["c_id"]),
        spark.createDataFrame(
            [(100 + g, g, f"s{g}") for g in range(6)],
            "c_id long, cust long, seg string",
        ),
        load_id="c0",
    )
    mv = IncrementalJoinView(
        catalog, "ds", "oc_proj",
        catalog.load_table("ds", "orders"),
        catalog.load_table("ds", "cust"),
        on=["cust"], left_pk=["o_id"], right_pk=["c_id"], how="left",
        select=["o_id", "cust", "amt", "c_id"],  # drops note + seg
    )
    mv.refresh()

    def direct():
        o = catalog.load_table("ds", "orders").read()
        c = catalog.load_table("ds", "cust").read()
        return {
            (r.o_id, r.c_id): (r.cust, r.amt)
            for r in o.join(c, on="cust", how="left").collect()
        }

    def rolled():
        return {(r.o_id, r.c_id): (r.cust, r.amt) for r in mv.read().collect()}

    # the stored tables carry ONLY the projected columns
    assert set(catalog.load_table("ds", "oc_proj").read().columns) == {
        "o_id", "cust", "amt", "c_id"
    }
    assert set(
        catalog.load_table("ds", "oc_proj__unmatched").read().columns
    ) == {"o_id", "cust", "amt"}
    assert rolled() == direct()

    # an update touching ONLY the unprojected left column folds away
    catalog.load_table("ds", "orders").update_where(
        [("o_id", "=", 3)], {"note": "changed"}
    )
    mv.left = catalog.load_table("ds", "orders")
    assert mv.refresh()["pairs_touched"] == 0
    assert rolled() == direct()
    # same for the unprojected right column
    catalog.load_table("ds", "cust").update_where(
        [("c_id", "=", 101)], {"seg": "changed"}
    )
    mv.right = catalog.load_table("ds", "cust")
    assert mv.refresh()["pairs_touched"] == 0
    assert rolled() == direct()

    # random mutations keep the projected invariant
    next_o = 100
    for step in range(4):
        op = ["o_append", "o_update", "o_delete", "c_append"][step]
        if op == "o_append":
            writer.write(
                TableSpec(name="orders", write_disposition="append", primary_key=["o_id"]),
                spark.createDataFrame(
                    [(next_o + j, rng.randrange(7), float(j), "x") for j in range(3)],
                    "o_id long, cust long, amt double, note string",
                ),
                load_id=f"s{step}",
            )
            next_o += 3
        elif op == "o_update":
            catalog.load_table("ds", "orders").update_where(
                [("cust", "=", rng.randrange(5))], {"amt": 777.0}
            )
        elif op == "o_delete":
            victim = rng.choice(
                [r.o_id for r in catalog.load_table("ds", "orders").read().collect()]
            )
            catalog.load_table("ds", "orders").position_delete_where(
                [("o_id", "=", victim)]
            )
        else:
            writer.write(
                TableSpec(name="cust", write_disposition="append", primary_key=["c_id"]),
                spark.createDataFrame(
                    [(200 + step, 6, f"late{step}")],
                    "c_id long, cust long, seg string",
                ),
                load_id=f"s{step}",
            )
        mv.left = catalog.load_table("ds", "orders")
        mv.right = catalog.load_table("ds", "cust")
        mv.refresh()
        assert rolled() == direct(), f"step {step} ({op})"
    # rebuild under projection reproduces the same state
    mv.rebuild()
    assert rolled() == direct()


def test_join_view_select_validation(spark, warehouse):
    catalog, _ = _mk_sources(
        spark, warehouse, orders=[(1, 0, 1.0)], customers=[(100, 0, "s")],
    )
    with pytest.raises(ValueError, match="must include the join keys"):
        IncrementalJoinView(
            catalog, "ds", "v",
            catalog.load_table("ds", "orders"),
            catalog.load_table("ds", "cust"),
            on=["cust"], left_pk=["o_id"], right_pk=["c_id"],
            select=["cust", "amt", "c_id"],  # missing o_id
        )
    mv = IncrementalJoinView(
        catalog, "ds", "v",
        catalog.load_table("ds", "orders"),
        catalog.load_table("ds", "cust"),
        on=["cust"], left_pk=["o_id"], right_pk=["c_id"],
        select=["o_id", "cust", "c_id", "nope"],
    )
    with pytest.raises(ValueError, match="neither side"):
        mv.refresh()


# -- chained views: IVM over IVM (view2's left source is view1's table) ------


@pytest.mark.slow
def test_chained_join_views_compose(spark, warehouse):
    """A second IncrementalJoinView maintained over the FIRST view's
    target table (its merge commits produce ordinary CDC) equals the
    recomputed three-way join after every mutation round — IVM composes
    because the view target is a first-class LakeTable with a changelog."""
    import random

    rng = random.Random(5)
    catalog = LakeCatalog(spark, warehouse)
    writer = LakeWriter(catalog, "ds")
    writer.write(
        TableSpec(name="orders", write_disposition="append", primary_key=["o_id"]),
        spark.createDataFrame(
            [(i, rng.randrange(5), float(i)) for i in range(12)],
            "o_id long, cust long, amt double",
        ),
        load_id="o0",
    )
    writer.write(
        TableSpec(name="cust", write_disposition="append", primary_key=["c_id"]),
        spark.createDataFrame(
            [(100 + g, g, g % 3) for g in range(6)],
            "c_id long, cust long, nk long",
        ),
        load_id="c0",
    )
    writer.write(
        TableSpec(name="nation", write_disposition="append", primary_key=["nk"]),
        spark.createDataFrame(
            [(k, f"N{k}") for k in range(3)], "nk long, nname string"
        ),
        load_id="n0",
    )
    mv1 = IncrementalJoinView(
        catalog, "ds", "oc",
        catalog.load_table("ds", "orders"),
        catalog.load_table("ds", "cust"),
        on=["cust"], left_pk=["o_id"], right_pk=["c_id"],
    )
    mv1.refresh()
    mv2 = IncrementalJoinView(
        catalog, "ds", "ocn",
        catalog.load_table("ds", "oc"),
        catalog.load_table("ds", "nation"),
        on=["nk"], left_pk=["o_id", "c_id"], right_pk=["nk"],
    )
    mv2.refresh()

    def direct():
        o = catalog.load_table("ds", "orders").read()
        c = catalog.load_table("ds", "cust").read()
        n = catalog.load_table("ds", "nation").read()
        rows = (
            o.join(c, on="cust").join(n, on="nk").collect()
        )
        return {(r.o_id, r.c_id): (r.amt, r.nk, r.nname) for r in rows}

    def rolled():
        return {
            (r.o_id, r.c_id): (r.amt, r.nk, r.nname)
            for r in mv2.read().collect()
        }

    assert rolled() == direct()

    def _refresh_chain():
        mv1.left = catalog.load_table("ds", "orders")
        mv1.right = catalog.load_table("ds", "cust")
        mv1.refresh()
        mv2.left = catalog.load_table("ds", "oc")
        mv2.refresh()

    # base-table mutations flow through BOTH views
    catalog.load_table("ds", "orders").update_where(
        [("cust", "=", 2)], {"amt": 777.0}
    )
    _refresh_chain()
    assert rolled() == direct()

    # customer re-keys to another nation: view1 rows rewrite, view2 follows
    catalog.load_table("ds", "cust").update_where([("c_id", "=", 101)], {"nk": 2})
    _refresh_chain()
    assert rolled() == direct()

    # nation-side update hits view2's right delta path
    catalog.load_table("ds", "nation").update_where([("nk", "=", 0)], {"nname": "ZERO"})
    mv2.right = catalog.load_table("ds", "nation")
    mv2.refresh()
    assert rolled() == direct()

    # order delete cascades: view1 emits delete images, view2 folds them
    catalog.load_table("ds", "orders").position_delete_where([("o_id", "=", 3)])
    _refresh_chain()
    assert rolled() == direct()

    # replay is a no-op end to end
    assert mv1.refresh()["pairs_touched"] == 0
    assert mv2.refresh()["pairs_touched"] == 0


@pytest.mark.slow
def test_full_join_view_with_projection(spark, warehouse):
    """select=[...] composes with the FULL outer matrix: both unmatched
    halves store only projected side columns, zero-crossing flips still
    fire, and the view equals the projected direct full join."""
    catalog, writer = _mk_sources(
        spark, warehouse,
        orders=[(1, 5, 1.0), (2, 9, 2.0)],
        customers=[(50, 5, "a"), (60, 6, "lonely")],
    )
    mv = IncrementalJoinView(
        catalog, "ds", "oc_fp",
        catalog.load_table("ds", "orders"),
        catalog.load_table("ds", "cust"),
        on=["cust"], left_pk=["o_id"], right_pk=["c_id"], how="full",
        select=["o_id", "cust", "amt", "c_id"],  # drops seg
    )
    mv.refresh()

    def direct():
        o = catalog.load_table("ds", "orders").read()
        c = catalog.load_table("ds", "cust").read()
        return {
            (r.o_id, r.c_id): (r.cust, r.amt)
            for r in o.join(c, on="cust", how="full").collect()
        }

    def rolled():
        return {(r.o_id, r.c_id): (r.cust, r.amt) for r in mv.read().collect()}

    assert rolled() == direct()
    assert set(
        catalog.load_table("ds", "oc_fp__unmatched_right").read().columns
    ) == {"c_id", "cust"}
    # customer 9 appears: order 2 flips OUT of the left-unmatched half
    writer.write(
        TableSpec(name="cust", write_disposition="append", primary_key=["c_id"]),
        spark.createDataFrame([(90, 9, "z")], "c_id long, cust long, seg string"),
        load_id="c1",
    )
    mv.right = catalog.load_table("ds", "cust")
    mv.refresh()
    assert rolled() == direct()
    # order for the lonely customer: c_id 60 flips out of the right half
    writer.write(
        TableSpec(name="orders", write_disposition="append", primary_key=["o_id"]),
        spark.createDataFrame([(3, 6, 3.0)], "o_id long, cust long, amt double"),
        load_id="o1",
    )
    mv.left = catalog.load_table("ds", "orders")
    mv.refresh()
    assert rolled() == direct()
    # a seg-only (unprojected) update folds to nothing
    catalog.load_table("ds", "cust").update_where([("c_id", "=", 50)], {"seg": "upd"})
    mv.right = catalog.load_table("ds", "cust")
    assert mv.refresh()["pairs_touched"] == 0
    assert rolled() == direct()


def test_projection_drift_between_refreshes_is_refused(spark, warehouse):
    """Changing select between refreshes would silently corrupt the view
    (the merge would null-fill or drop columns); the refresh refuses and
    points at rebuild(), which applies the new projection."""
    catalog, writer = _mk_sources(
        spark, warehouse, orders=[(1, 0, 1.0)], customers=[(100, 0, "s")],
    )

    def _mv(select):
        return IncrementalJoinView(
            catalog, "ds", "v_drift",
            catalog.load_table("ds", "orders"),
            catalog.load_table("ds", "cust"),
            on=["cust"], left_pk=["o_id"], right_pk=["c_id"], select=select,
        )

    _mv(["o_id", "cust", "amt", "c_id"]).refresh()
    writer.write(
        TableSpec(name="orders", write_disposition="append", primary_key=["o_id"]),
        spark.createDataFrame([(2, 0, 2.0)], "o_id long, cust long, amt double"),
        load_id="o1",
    )
    drifted = _mv(["o_id", "cust", "c_id", "seg"])  # swapped amt for seg
    with pytest.raises(ValueError, match="rebuild"):
        drifted.refresh()
    # rebuild() applies the new projection and refresh works again
    drifted.rebuild()
    assert set(catalog.load_table("ds", "v_drift").read().columns) == {
        "o_id", "cust", "c_id", "seg"
    }
    assert drifted.refresh()["pairs_touched"] == 0
