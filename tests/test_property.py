"""Property-based tests (hypothesis): the custom join operators must agree
with reference implementations (pandas merge_asof, brute-force inequality
join) on arbitrary inputs — not just the handwritten cases."""

import datetime

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dlt_iceberg_spark.operators.asof import asof_join
from dlt_iceberg_spark.operators.range_join import interval_join

BASE = datetime.datetime(2024, 1, 1)


def _ts_minutes(m):
    return BASE + datetime.timedelta(minutes=m)


rows_left = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 500)), min_size=1, max_size=30
)
rows_right = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 500), st.floats(0, 100, allow_nan=False)),
    min_size=0,
    max_size=30,
)


@pytest.mark.usefixtures("spark")
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=rows_left, right=rows_right)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    # unique (key, ts) per side: both engines break exact ties arbitrarily
    left = list({(k, m): None for k, m in left})
    right = list({(k, m): v for k, m, v in right}.items())
    ldf = spark.createDataFrame(
        [(k, _ts_minutes(m)) for (k, m) in left], "key long, ts timestamp_ntz"
    )
    rdf = spark.createDataFrame(
        [(k, _ts_minutes(m), v) for ((k, m), v) in right],
        "key long, ts timestamp_ntz, price double",
    )
    got = {
        (r.key, r.ts): r.price_right
        for r in asof_join(ldf, rdf, on="ts", by="key").collect()
    }

    lpd = pd.DataFrame([(k, _ts_minutes(m)) for (k, m) in left], columns=["key", "ts"]).sort_values("ts")
    rpd = pd.DataFrame(
        [(k, _ts_minutes(m), v) for ((k, m), v) in right], columns=["key", "ts", "price"]
    ).sort_values("ts")
    if len(rpd):
        merged = pd.merge_asof(lpd, rpd, on="ts", by="key", direction="backward")
    else:
        merged = lpd.assign(price=float("nan"))
    expected = {
        (row.key, row.ts.to_pydatetime()): (None if pd.isna(row.price) else row.price)
        for row in merged.itertuples()
    }
    assert got == expected


intervals = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 200), st.integers(0, 100)),
    min_size=0,
    max_size=20,
)
points = st.lists(st.tuples(st.integers(0, 2), st.integers(0, 300)), min_size=1, max_size=30)


@pytest.mark.usefixtures("spark")
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(pts=points, ivs=intervals)
def test_interval_join_matches_bruteforce(spark, pts, ivs):
    pts = sorted(set(pts))
    ivs = sorted({(k, s, s + d) for k, s, d in ivs})
    pdf = spark.createDataFrame(
        [(i, k, _ts_minutes(m)) for i, (k, m) in enumerate(pts)],
        "pid long, key long, ts timestamp_ntz",
    )
    idf = spark.createDataFrame(
        [(j, k, _ts_minutes(s), _ts_minutes(e)) for j, (k, s, e) in enumerate(ivs)],
        "iid long, key long, w_start timestamp_ntz, w_end timestamp_ntz",
    )
    got = {
        (r.pid, r.iid)
        for r in interval_join(
            pdf, idf, point_ts="ts", start_col="w_start", end_col="w_end",
            by="key", bucket_seconds=600,
        ).collect()
    }
    expected = {
        (i, j)
        for i, (pk, pm) in enumerate(pts)
        for j, (ik, s, e) in enumerate(ivs)
        if pk == ik and s <= pm <= e
    }
    assert got == expected


dup_groups = st.lists(st.integers(1, 3), min_size=1, max_size=4)


@pytest.mark.usefixtures("spark")
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(sizes=dup_groups)
def test_minhash_lsh_clusters_exact_duplicates(spark, sizes):
    """Exact copies share identical signatures, so they MUST share a band
    bucket and cluster together; disjoint-vocabulary docs must not."""
    from dlt_iceberg_spark.operators.dedup import minhash_lsh_dedup

    rows, doc_id, groups = [], 0, []
    for g, size in enumerate(sizes):
        text = " ".join(f"tok{g}x{i}" for i in range(12))
        ids = []
        for _ in range(size):
            rows.append((doc_id, text))
            ids.append(doc_id)
            doc_id += 1
        groups.append(ids)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = minhash_lsh_dedup(
        df, "text", "doc_id", n_hashes=32, bands=8, threshold=0.9
    ).collect()
    assert len(out) == doc_id
    canon = {r.doc_id: r.canonical_id for r in out}
    dup = {r.doc_id: r.is_duplicate for r in out}
    for ids in groups:
        assert {canon[i] for i in ids} == {min(ids)}
        assert not dup[min(ids)] and all(dup[i] for i in ids[1:])
    # no cross-group merges: every group keeps its own canonical
    assert len({canon[ids[0]] for ids in groups}) == len(groups)


@pytest.mark.usefixtures("spark")
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(sizes=dup_groups)
def test_simhash_identical_docs_identical_hash(spark, sizes):
    from dlt_iceberg_spark.operators.dedup import simhash

    rows, doc_id, groups = [], 0, []
    for g, size in enumerate(sizes):
        text = " ".join(f"word{g}y{i}" for i in range(10))
        ids = []
        for _ in range(size):
            rows.append((doc_id, text))
            ids.append(doc_id)
            doc_id += 1
        groups.append(ids)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = {r.doc_id: r.simhash for r in simhash(df, "text", "doc_id").collect()}
    per_group = [{sh[i] for i in ids} for ids in groups]
    assert all(len(s) == 1 for s in per_group)  # identical text -> identical hash
    assert len({s.pop() for s in per_group}) == len(groups)  # distinct vocab -> distinct


# ---------------------------------------------------------------------------
# Merge-on-read: random op sequences agree with a driver-side model
# ---------------------------------------------------------------------------

_mor_batches = st.lists(
    st.tuples(
        st.sampled_from(["mor", "cow", "hard_delete", "append", "fold"]),
        st.dictionaries(st.integers(0, 9), st.integers(0, 99), min_size=1, max_size=5),
    ),
    min_size=1,
    max_size=5,
)


@pytest.mark.usefixtures("spark")
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(ops=_mor_batches)
def test_mor_sequences_match_model(spark, ops):
    import tempfile
    import uuid

    from dlt_iceberg_spark.lake.catalog import LakeCatalog
    from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec

    wh = tempfile.mkdtemp(prefix=f"mor_prop_{uuid.uuid4().hex[:6]}_")
    catalog = LakeCatalog(spark, wh)
    writer = LakeWriter(catalog, "m")

    def spec(mode, strategy="upsert"):
        return TableSpec(
            name="t",
            write_disposition={"disposition": "merge", "strategy": strategy},
            primary_key=["id"],
            merge_mode=mode,
        )

    # seed rows so the first op always has a target
    writer.write(
        TableSpec(name="t", write_disposition="append"),
        spark.createDataFrame([(i, -1) for i in range(5)], "id long, val long"),
        load_id="seed",
    )
    model: list[tuple[int, int]] = [(i, -1) for i in range(5)]

    for n, (kind, batch) in enumerate(ops):
        rows = sorted(batch.items())
        if kind == "fold":
            catalog.load_table("m", "t").fold_deletes()
            continue
        if kind == "append":
            df = spark.createDataFrame(rows, "id long, val long")
            writer.write(TableSpec(name="t", write_disposition="append"), df, load_id=f"l{n}")
            model += rows
            continue
        if kind == "hard_delete":
            df = spark.createDataFrame(
                [(i, v, "now") for i, v in rows], "id long, val long, _dlt_deleted_at string"
            )
            writer.write(spec("mor"), df, load_id=f"l{n}")
            dead = {i for i, _ in rows}
            model = [r for r in model if r[0] not in dead]
            continue
        df = spark.createDataFrame(rows, "id long, val long")
        writer.write(spec(kind), df, load_id=f"l{n}")
        keys = {i for i, _ in rows}
        model = [r for r in model if r[0] not in keys] + rows

    got = sorted((r.id, r.val) for r in catalog.load_table("m", "t").read().collect())
    assert got == sorted(model)
