"""Pipeline-level E2E: run → dataset query → state restore → sparse reload
(reference tests/test_class_based_atomic.py, test_dataset.py,
test_state_sync_e2e.py; FIXTURES.md F3/F6/F7)."""

import pytest
from pyspark.sql import Row

from dlt_iceberg_spark.lake.pipeline import Pipeline, Resource


@pytest.fixture()
def pipeline(spark, warehouse):
    return Pipeline(spark, warehouse, dataset_name="ds", pipeline_name="p")


def test_run_and_query(spark, pipeline):
    """F6: dataset SQL surface — join + SUM + GROUP BY + ORDER BY."""
    customers = Resource(
        producer=spark.createDataFrame(
            [(1, "Alice"), (2, "Bob")], "customer_id long, name string"
        ),
        name="customers",
    )
    orders = Resource(
        producer=spark.createDataFrame(
            [(1, 1, 50.0), (2, 1, 25.0), (3, 2, 75.0)],
            "order_id long, customer_id long, amount double",
        ),
        name="orders",
    )
    info = pipeline.run(customers, orders)
    assert sorted(info.tables) == ["customers", "orders"]
    rel = pipeline.dataset().query(
        """
        SELECT c.name, SUM(o.amount) AS total
        FROM customers c JOIN orders o ON c.customer_id = o.customer_id
        GROUP BY c.name ORDER BY c.name
        """
    )
    assert rel.fetchall() == [("Alice", 75.0), ("Bob", 75.0)]
    # .df() / .arrow() verbs
    assert list(pipeline.dataset()["customers"].df().columns) == ["customer_id", "name"]
    assert pipeline.dataset()["orders"].arrow().num_rows == 3


def test_rerun_same_load_id_is_noop(spark, pipeline):
    r = Resource(producer=spark.createDataFrame([(1,)], "x long"), name="t")
    info1 = pipeline.run(r, load_id="L1")
    info2 = pipeline.run(r, load_id="L1")
    assert not info1.already_loaded and info2.already_loaded
    assert pipeline.dataset()["t"].dataframe().count() == 1


def test_two_runs_two_snapshots(spark, pipeline):
    """F3: 2 sequential appends (50+30) → 2 write snapshots, 80 rows."""
    mk = lambda n: Resource(producer=spark.range(n).toDF("x"), name="events")
    pipeline.run(mk(50))
    pipeline.run(mk(30))
    table = pipeline.catalog.load_table("ds", "events")
    assert [s.operation for s in table.snapshots()] == ["create", "append", "append"]
    assert table.read().count() == 80
    # ledger has one status=0 row per load
    loads = pipeline.catalog.load_table("ds", "_dlt_loads").read().collect()
    assert len(loads) == 2 and all(r.status == 0 for r in loads)


def test_sparse_second_run_null_fills(spark, pipeline):
    """F7: run1 [a,b,c,d]; fresh run2 [a,b,c] → old rows keep d, new rows NULL,
    schema still has d."""
    full = Resource(
        producer=spark.createDataFrame(
            [Row(a=1, b=10, c="x", d="keep")], "a long, b long, c string, d string"
        ),
        name="test_table",
    )
    sparse = Resource(
        producer=spark.createDataFrame([Row(a=2, b=20, c="y")], "a long, b long, c string"),
        name="test_table",
    )
    pipeline.run(full)
    pipeline.run(sparse)
    rows = {r.a: r for r in pipeline.dataset()["test_table"].dataframe().collect()}
    assert rows[1].d == "keep" and rows[2].d is None
    schema = pipeline.catalog.load_table("ds", "test_table").schema()
    assert "d" in schema.fieldNames()


def test_schema_registry_and_state_restore(spark, pipeline):
    r = Resource(producer=spark.createDataFrame([(1, "a")], "id long, v string"), name="t")
    info = pipeline.run(r)
    newest = pipeline.state.get_newest_schema("ds")
    assert newest is not None and newest.version_hash == info.schema_version_hash
    assert '"t"' in newest.schema
    # second run with same schema keeps version (idempotent by hash)
    info2 = pipeline.run(r)
    assert info2.schema_version_hash == info.schema_version_hash
    assert pipeline.catalog.load_table("ds", "_dlt_version").read().count() == 1


def test_truncate_tables_on_refresh(spark, warehouse):
    from pyspark.sql import Row
    from dlt_iceberg_spark.lake.pipeline import Pipeline, Resource

    pipe = Pipeline(spark, warehouse)
    pipe.run(Resource(producer=[Row(id=1)], name="keepme"),
             Resource(producer=[Row(id=1)], name="fresh"))
    pipe.run(Resource(producer=[Row(id=2)], name="keepme"),
             Resource(producer=[Row(id=2)], name="fresh"),
             truncate_tables=["fresh"])
    ds = pipe.dataset()
    # appended table accumulated; truncated table recreated from scratch
    assert ds.query("SELECT count(*) AS n FROM keepme").collect()[0].n == 2
    assert [r.id for r in ds.query("SELECT id FROM fresh").collect()] == [2]
    # truncated table history restarts (create + append only)
    t = pipe.catalog.load_table("main", "fresh")
    assert [s.operation for s in t.snapshots()] == ["create", "append"]


def test_wap_branch_pipeline(spark, warehouse):
    """Write-audit-publish: a branch pipeline's loads stay invisible to main
    until publish; the audit happens on the branch's own dataset view."""
    from dlt_iceberg_spark.lake.pipeline import Pipeline, Resource

    main_pipe = Pipeline(spark, warehouse, dataset_name="ds")
    ev = Resource(
        producer=spark.createDataFrame([(1, "ok"), (2, "ok")], "id long, status string"),
        name="events",
    )
    main_pipe.run(ev, load_id="base")

    wap = Pipeline(spark, warehouse, dataset_name="ds", branch="audit")
    more = Resource(
        producer=spark.createDataFrame([(3, "new"), (4, "new")], "id long, status string"),
        name="events",
    )
    wap.run(more, load_id="staged")

    # main unchanged; branch dataset sees both loads (the audit step)
    assert main_pipe.dataset().query("SELECT count(*) AS n FROM events").fetchall() == [(2,)]
    assert wap.dataset().query("SELECT count(*) AS n FROM events").fetchall() == [(4,)]
    assert wap.dataset("main").query("SELECT count(*) AS n FROM events").fetchall() == [(2,)]

    published = wap.publish()
    assert "events" in published
    assert main_pipe.dataset().query("SELECT count(*) AS n FROM events").fetchall() == [(4,)]

    with pytest.raises(ValueError, match="nothing to publish"):
        main_pipe.publish()


def test_wap_branch_creates_table_visible_on_main_but_empty(spark, warehouse):
    """A WAP pipeline creating a NEW table: the empty create lands on main
    (discoverable), the data stays on the branch until publish."""
    from dlt_iceberg_spark.lake.pipeline import Pipeline, Resource

    wap = Pipeline(spark, warehouse, dataset_name="ds", branch="audit")
    r = Resource(
        producer=spark.createDataFrame([(1,), (2,)], "id long"), name="fresh"
    )
    wap.run(r, load_id="l0")
    main_ds = Pipeline(spark, warehouse, dataset_name="ds").dataset()
    assert main_ds.query("SELECT count(*) AS n FROM fresh").fetchall() == [(0,)]
    wap.publish(["fresh"])
    assert main_ds.query("SELECT count(*) AS n FROM fresh").fetchall() == [(2,)]


def test_query_time_travel_pins(spark, warehouse):
    """SQL-surface time travel: `at` pins named tables to a version or tag
    for one query, without touching the current views."""
    from dlt_iceberg_spark.lake.pipeline import Pipeline, Resource

    pipe = Pipeline(spark, warehouse, dataset_name="ds")
    pipe.run(
        Resource(
            producer=spark.createDataFrame([(1,), (2,)], "id long"), name="t"
        ),
        load_id="l0",
    )
    table = pipe.catalog.load_table("ds", "t")
    v0 = table.current_version()
    table.create_tag("launch")
    pipe.run(
        Resource(
            producer=spark.createDataFrame([(3,), (4,)], "id long"), name="t"
        ),
        load_id="l1",
    )

    ds = pipe.dataset()
    assert ds.query("SELECT count(*) AS n FROM t").fetchall() == [(4,)]
    assert ds.query("SELECT count(*) AS n FROM t", at={"t": v0}).fetchall() == [(2,)]
    assert ds.query("SELECT count(*) AS n FROM t", at={"t": "launch"}).fetchall() == [(2,)]
    # pin is per-query, not sticky
    assert ds.query("SELECT count(*) AS n FROM t").fetchall() == [(4,)]
# ---- user-facing factory parity with the reference entry points
# (destination.py:439-473, tests/test_smoke.py, test_capabilities.py) -------

from dlt_iceberg_spark import iceberg_rest
from dlt_iceberg_spark import pipeline as make_pipeline


def test_destination_is_callable_and_capabilities():
    dest = iceberg_rest(warehouse="/tmp/wh", namespace="prod")
    caps = dest.capabilities()
    assert caps["loader_file_format"] == "parquet"
    assert caps["naming_convention"] == "snake_case"
    assert caps["supported_merge_strategies"] == ["delete-insert", "upsert"]


def test_destination_builds_catalog_config():
    dest = iceberg_rest(
        warehouse="file:///tmp/wh",
        namespace="prod",
        catalog_uri="https://rest.example/catalog",
        credential="id:secret",
        oauth2_server_uri="https://auth.example/token",
    )
    assert dest.warehouse == "/tmp/wh"  # file:// stripped for the local engine
    conf = dest.catalog_config.to_spark_conf()
    assert conf["spark.sql.catalog.lake.uri"] == "https://rest.example/catalog"
    assert conf["spark.sql.catalog.lake.credential"] == "id:secret"
    with pytest.raises(TypeError, match="unknown catalog options"):
        iceberg_rest(warehouse="/tmp/wh", catalog_uri="x", bogus=1)


def test_pipeline_factory_end_to_end(spark, tmp_path):
    dest = iceberg_rest(warehouse=str(tmp_path / "wh"), namespace="prod")
    p = make_pipeline("loads", destination=dest, spark=spark)
    p.run(Resource([{"id": 1, "name": "alice"}, {"id": 2, "name": "bob"}], "users"))
    assert p.dataset().query("SELECT count(*) AS n FROM users").fetchall() == [(2,)]
    assert p.dataset_name == "prod"


def test_pipeline_run_refreshes_derived_assets_in_the_same_cut(spark, warehouse):
    """run(derived=[rollup]) under transactional=True: the fact load and
    its rollup refresh publish as ONE atomic cut; replays are no-ops."""
    from dlt_iceberg_spark.lake.pipeline import Pipeline, Resource
    from dlt_iceberg_spark.lake.rollup import IncrementalRollup
    from pyspark.sql import functions as F

    p = Pipeline(spark, warehouse, dataset_name="ds")
    batch1 = spark.createDataFrame(
        [(1, "a", 2.0), (2, "b", 3.0)], "id long, grp string, amt double"
    )
    res = Resource(batch1, "fact", "append", ["id"])
    p.run(res, load_id="l0")
    ru = IncrementalRollup(
        p.catalog, "ds", "fact_by_grp", p.catalog.load_table("ds", "fact"),
        keys=["grp"], aggs={"total": ("sum", "amt")},
    )
    ru.refresh()  # initial build

    batch2 = spark.createDataFrame([(3, "a", 10.0)], "id long, grp string, amt double")
    res2 = Resource(
        batch2,
        "fact",
        {"disposition": "merge", "strategy": "upsert"},
        ["id"],
    )
    ru.source = p.catalog.load_table("ds", "fact")
    info = p.run(res2, load_id="l1", transactional=True, derived=[ru])
    assert sorted(info.tables) == ["fact", "fact_by_grp"]
    got = {r.grp: r.total for r in ru.read().collect()}
    assert got == {"a": 12.0, "b": 3.0}
    # direct equality with the published fact state
    direct = {
        r.grp: r.s
        for r in p.catalog.load_table("ds", "fact")
        .read().groupBy("grp").agg(F.sum("amt").alias("s")).collect()
    }
    assert got == direct
    # replay: ledger no-op, rollup cursor unmoved
    info2 = p.run(res2, load_id="l1", transactional=True, derived=[ru])
    assert info2.already_loaded
    assert {r.grp: r.total for r in ru.read().collect()} == got


def test_wap_pipeline_refuses_derived(spark, tmp_path):
    """ADVICE r7: run(derived=...) on a branch (WAP) pipeline would land
    resources on the branch while the derived asset refreshes against
    main — a silent no-op reported as written.  Refused loudly instead."""
    import pytest

    from dlt_iceberg_spark.lake.pipeline import Pipeline, Resource

    p = Pipeline(
        spark, "p", str(tmp_path / "wh"), "ds", branch="audit"
    )

    class _FakeDerived:
        name = "d"

        def refresh(self, transaction=None):
            raise AssertionError("must never be called")

    with pytest.raises(ValueError, match="branch \\(WAP\\) pipeline"):
        p.run(
            Resource("t", lambda s: s.range(3)),
            derived=[_FakeDerived()],
        )


@pytest.mark.slow
def test_pipeline_derived_chain_views_and_rollup_one_cut(spark, warehouse):
    """The full derived-model chain — facts -> join view -> chained view
    -> rollup — refreshes inside ONE transactional load: all four tables
    publish as one cut, equal recomputation, and a failure anywhere in
    the chain publishes NOTHING."""
    import pytest
    from pyspark.sql import functions as F

    from dlt_iceberg_spark.lake.matview import IncrementalJoinView
    from dlt_iceberg_spark.lake.pipeline import Pipeline, Resource
    from dlt_iceberg_spark.lake.rollup import IncrementalRollup

    p = Pipeline(spark, warehouse, dataset_name="ds")
    p.run(
        Resource(
            spark.createDataFrame(
                [(i, i % 3, float(i)) for i in range(9)],
                "o_id long, cust long, amt double",
            ),
            "orders", "append", ["o_id"],
        ),
        Resource(
            spark.createDataFrame(
                [(100 + g, g, g % 2) for g in range(3)],
                "c_id long, cust long, nk long",
            ),
            "cust", "append", ["c_id"],
        ),
        Resource(
            spark.createDataFrame([(0, "N0"), (1, "N1")], "nk long, nname string"),
            "nation", "append", ["nk"],
        ),
        load_id="base",
    )
    mv1 = IncrementalJoinView(
        p.catalog, "ds", "oc",
        p.catalog.load_table("ds", "orders"),
        p.catalog.load_table("ds", "cust"),
        on=["cust"], left_pk=["o_id"], right_pk=["c_id"],
    )
    mv1.refresh()
    mv2 = IncrementalJoinView(
        p.catalog, "ds", "ocn",
        p.catalog.load_table("ds", "oc"),
        p.catalog.load_table("ds", "nation"),
        on=["nk"], left_pk=["o_id", "c_id"], right_pk=["nk"],
    )
    mv2.refresh()
    ru = IncrementalRollup(
        p.catalog, "ds", "rev_by_nation",
        p.catalog.load_table("ds", "ocn"),
        keys=["nname"], aggs={"total": ("sum", "amt")},
    )
    ru.refresh()

    def direct():
        o = p.catalog.load_table("ds", "orders").read()
        c = p.catalog.load_table("ds", "cust").read()
        n = p.catalog.load_table("ds", "nation").read()
        return {
            r.nname: r.total
            for r in o.join(c, on="cust").join(n, on="nk")
            .groupBy("nname").agg(F.sum("amt").alias("total")).collect()
        }

    assert {r.nname: r.total for r in ru.read().collect()} == direct()

    # one transactional load: fact upsert + the whole chain, one cut
    batch = spark.createDataFrame(
        [(3, 1, 99.0), (50, 2, 7.0)], "o_id long, cust long, amt double"
    )
    mv1.left = p.catalog.load_table("ds", "orders")
    info = p.run(
        Resource(batch, "orders", {"disposition": "merge", "strategy": "upsert"}, ["o_id"]),
        load_id="l9", transactional=True, derived=[mv1, mv2, ru],
    )
    assert sorted(info.tables) == ["oc", "ocn", "orders", "rev_by_nation"]
    assert {r.nname: r.total for r in ru.read().collect()} == direct()
    # replay: ledger no-op end to end
    info2 = p.run(
        Resource(batch, "orders", {"disposition": "merge", "strategy": "upsert"}, ["o_id"]),
        load_id="l9", transactional=True, derived=[mv1, mv2, ru],
    )
    assert info2.already_loaded

    # a failure ANYWHERE in the chain publishes nothing
    before = {
        t: p.catalog.load_table("ds", t).current_version()
        for t in ("orders", "oc", "ocn", "rev_by_nation")
    }

    class _Boom:
        name = "boom"

        def refresh(self, transaction=None):
            raise RuntimeError("mid-chain failure")

    batch2 = spark.createDataFrame([(60, 0, 1.0)], "o_id long, cust long, amt double")
    mv1.left = p.catalog.load_table("ds", "orders")
    with pytest.raises(RuntimeError, match="mid-chain"):
        p.run(
            Resource(batch2, "orders", "append", ["o_id"]),
            load_id="l10", transactional=True, derived=[mv1, _Boom(), ru],
        )
    after = {
        t: p.catalog.load_table("ds", t).current_version()
        for t in ("orders", "oc", "ocn", "rev_by_nation")
    }
    assert after == before
    assert {r.nname: r.total for r in ru.read().collect()} == direct()
