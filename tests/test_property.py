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
        st.sampled_from(
            ["mor", "cow", "hard_delete", "append", "fold", "pos_delete", "update"]
        ),
        st.dictionaries(st.integers(0, 9), st.integers(0, 99), min_size=1, max_size=5),
    ),
    min_size=1,
    max_size=5,
)


@pytest.mark.usefixtures("spark")
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(ops=_mor_batches)
@pytest.mark.slow
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
    #: (snapshot version, model state) after each op — time-travel goldens
    history: list[tuple[int, list[tuple[int, int]]]] = []

    def record():
        history.append(
            (catalog.load_table("m", "t").current_version(), list(model))
        )

    record()
    for n, (kind, batch) in enumerate(ops):
        record()
        rows = sorted(batch.items())
        if kind == "fold":
            catalog.load_table("m", "t").fold_deletes()
            continue
        if kind == "append":
            df = spark.createDataFrame(rows, "id long, val long")
            writer.write(TableSpec(name="t", write_disposition="append"), df, load_id=f"l{n}")
            model += rows
            continue
        if kind == "pos_delete":
            ids = sorted({i for i, _ in rows})
            t = catalog.load_table("m", "t")
            t.position_delete_where([("id", "in", ids)])
            model = [r for r in model if r[0] not in set(ids)]
            continue
        if kind == "update":
            from pyspark.sql import functions as F

            ids = sorted({i for i, _ in rows})
            t = catalog.load_table("m", "t")
            t.update_where([("id", "in", ids)], {"val": F.col("val") + 1000})
            model = [
                (i, v + 1000) if i in set(ids) else (i, v) for i, v in model
            ]
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

    record()
    table = catalog.load_table("m", "t")
    got = sorted((r.id, r.val) for r in table.read().collect())
    assert got == sorted(model)
    # time-travel invariant: every recorded version replays its model state
    # exactly, through whatever MoR masks were outstanding at that version
    for v, state in history[-3:]:
        tt = sorted(
            (r.id, r.val)
            for r in table.read(snapshot_version=v).collect()
        )
        assert tt == sorted(state), f"time travel to v{v} diverged"
    # changelog invariant: the NET changelog from creation is exactly the
    # live table as inserts — every op flavor's images must reconcile
    net = table.read_changes(None, net_changes=True).collect()
    assert sorted((r.id, r.val) for r in net) == sorted(model)
    assert {r._change_type for r in net} <= {"insert"}


# ---- manifest pruning: conservative correctness on arbitrary inputs -------

file_strategy = st.lists(
    st.tuples(
        st.one_of(st.none(), st.tuples(st.integers(-50, 50), st.integers(0, 30))),
        st.one_of(st.none(), st.tuples(st.integers(-50, 50), st.integers(0, 30))),
    ),
    min_size=0,
    max_size=40,
)
probe_strategy = st.dictionaries(
    st.sampled_from(["k1", "k2"]),
    st.tuples(
        st.one_of(st.none(), st.integers(-60, 60)),
        st.one_of(st.none(), st.integers(-60, 60)),
    ),
    min_size=1,
    max_size=2,
)


@given(files=file_strategy, probes=probe_strategy)
@settings(max_examples=200, deadline=None)
def test_prune_split_is_conservative_and_complete(tmp_path_factory, files, probes):
    """For ANY stats layout and probe set: (1) no file that could match all
    probes is ever pruned; (2) touched + kept partitions the table; (3) a
    manifest skipped unread contains no matching file.  Checked against a
    brute-force row-level evaluator."""
    from dlt_iceberg_spark.lake.manifest import DataFile, write_manifest
    from dlt_iceberg_spark.lake.table import LakeTable, Snapshot
    from pyspark.sql import types as T

    entries = []
    for i, (r1, r2) in enumerate(files):
        stats = {}
        if r1 is not None:
            stats["k1"] = [r1[0], r1[0] + r1[1]]
        if r2 is not None:
            stats["k2"] = [r2[0], r2[0] + r2[1]]
        entries.append(DataFile(path=f"data/f{i}.parquet", rows=1, bytes=1, stats=stats, sequence=0))

    def brute_may_match(f):
        # conservative semantics: overlap on every probed column unless the
        # file's stats PROVE disjointness
        for col, (lo, hi) in probes.items():
            st_ = f.stats.get(col)
            if st_ is None:
                continue
            if lo is not None and st_[1] < lo:
                return False
            if hi is not None and st_[0] > hi:
                return False
        return True

    loc = str(tmp_path_factory.mktemp("prop") / "t")
    import os as _os

    _os.makedirs(loc, exist_ok=True)
    # split entries across two manifests + some inline files
    third = len(entries) // 3
    refs = []
    if entries[:third]:
        refs.append(write_manifest(loc, entries[:third]))
    if entries[third : 2 * third]:
        refs.append(write_manifest(loc, entries[third : 2 * third]))
    snap = Snapshot(
        version=0,
        schema=T.StructType([T.StructField("k1", T.LongType()), T.StructField("k2", T.LongType())]),
        operation="create",
        parent=None,
        timestamp="2026-01-01T00:00:00+00:00",
        manifests=refs,
        inline_files=entries[2 * third :],
        location=loc,
    )
    table = LakeTable.__new__(LakeTable)  # prune_split touches no session
    table.location = loc
    from dlt_iceberg_spark.lake.fileio import LocalFileIO

    table._io = LocalFileIO()
    touched, kept_refs, kept_files = table.prune_split(snap, probes)

    touched_paths = {f.path for f in touched}
    expected = {f.path for f in entries if brute_may_match(f)}
    assert touched_paths == expected  # conservative AND tight at file level

    # partition property: every file accounted for exactly once
    kept_ref_count = sum(r.n_files for r in kept_refs)
    assert len(touched) + len(kept_files) + kept_ref_count == len(entries)
    # skipped manifests truly contain no matching file
    from dlt_iceberg_spark.lake.manifest import read_manifest

    for ref in kept_refs:
        for f in read_manifest(loc, ref):
            assert not brute_may_match(f)


# ---- connected components vs union-find model ------------------------------

edge_lists = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 40)),
    min_size=1,
    max_size=60,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=edge_lists)
@pytest.mark.slow
def test_connected_components_matches_union_find(spark, edges):
    """Pointer-doubling min-label propagation must equal a plain
    union-find on arbitrary random graphs (self-loops, duplicates,
    disconnected nodes, long chains)."""
    from dlt_iceberg_spark.operators.graph import connected_components

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    expected = {n: find(n) for n in parent}
    # canonicalize to min-of-component (find() roots already min-biased,
    # but path order can leave a non-min root; normalize via group-min)
    comp_min: dict[int, int] = {}
    for n, r in expected.items():
        comp_min[r] = min(comp_min.get(r, n), n)
    expected = {n: comp_min[find(n)] for n in parent}

    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        r.node: r.component
        for r in connected_components(df, max_iterations=30).collect()
    }
    assert got == expected


@pytest.mark.usefixtures("spark")
@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(ops=_mor_batches)
@pytest.mark.slow
def test_mirror_tracks_random_op_sequences(spark, ops):
    """CDC replication invariant: after ANY op interleaving, draining the
    changelog feed into a mirror table reproduces the source exactly."""
    import tempfile
    import uuid

    from dlt_iceberg_spark.lake.catalog import LakeCatalog
    from dlt_iceberg_spark.lake.feed import ChangelogFeed
    from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec

    wh = tempfile.mkdtemp(prefix=f"mir_prop_{uuid.uuid4().hex[:6]}_")
    catalog = LakeCatalog(spark, wh)
    writer = LakeWriter(catalog, "m")
    mirror_writer = LakeWriter(catalog, "mir")

    def spec(mode, strategy="upsert"):
        return TableSpec(
            name="t",
            write_disposition={"disposition": "merge", "strategy": strategy},
            primary_key=["id"],
            merge_mode=mode,
        )

    writer.write(
        TableSpec(name="t", write_disposition="append"),
        spark.createDataFrame([(i, -1) for i in range(5)], "id long, val long"),
        load_id="seed",
    )
    for n, (kind, batch) in enumerate(ops):
        rows = sorted(batch.items())
        if kind == "fold":
            catalog.load_table("m", "t").fold_deletes()
        elif kind == "append":
            # fresh ids per batch: duplicate-PK sources make a PK-keyed
            # mirror ambiguous, which is a property of the data, not a bug
            writer.write(
                TableSpec(name="t", write_disposition="append"),
                spark.createDataFrame(
                    [(100 * (n + 1) + i, v) for i, v in rows], "id long, val long"
                ),
                load_id=f"l{n}",
            )
        elif kind == "pos_delete":
            catalog.load_table("m", "t").position_delete_where(
                [("id", "in", sorted({i for i, _ in rows}))]
            )
        elif kind == "update":
            from pyspark.sql import functions as F

            catalog.load_table("m", "t").update_where(
                [("id", "in", sorted({i for i, _ in rows}))],
                {"val": F.col("val") + 1000},
            )
        elif kind == "hard_delete":
            writer.write(
                spec("mor"),
                spark.createDataFrame(
                    [(i, v, "now") for i, v in rows],
                    "id long, val long, _dlt_deleted_at string",
                ),
                load_id=f"l{n}",
            )
        else:
            writer.write(
                spec(kind),
                spark.createDataFrame(rows, "id long, val long"),
                load_id=f"l{n}",
            )

    table = catalog.load_table("m", "t")
    ChangelogFeed(table, name="p").mirror_into(mirror_writer, "t2", ["id"])
    src = sorted((r.id, r.val) for r in table.read().collect())
    dst = sorted(
        (r.id, r.val) for r in catalog.load_table("mir", "t2").read().collect()
    )
    assert dst == src


# ---- transform-aware partition pruning vs brute force ----------------------

_SPECIAL_TEXT = st.text(
    alphabet=st.sampled_from(list("ab /=%#:+.\t") + ["é", "ß"]),
    min_size=0,
    max_size=6,
)
_part_rows = st.lists(
    st.tuples(st.integers(0, 10**6), _SPECIAL_TEXT), min_size=1, max_size=25
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=_part_rows,
    transform=st.sampled_from(
        [("bucket", 4, "id"), ("truncate", 2, "s"), ("identity", None, "s"),
         ("bucket", 3, "s")]
    ),
)
def test_partition_rewrite_reads_are_exact(spark, tmp_path_factory, rows, transform):
    """For ANY data (hive-hostile characters, empty strings, duplicate
    keys) and ANY transform spec: a pruned `read(where=)` must return
    exactly the brute-force filter result — the rewrite may only SKIP
    files that provably hold no match, never drop a matching row.  Guards
    the hive-layout edge cases (empty string and null both fold into
    __HIVE_DEFAULT_PARTITION__, URL-escaped specials round-tripping)."""
    from dlt_iceberg_spark.lake.table import LakeTable
    from dlt_iceberg_spark.partition import PartitionField, partition_columns

    t_name, param, col = transform
    rows = list({r[0]: r for r in rows}.values())  # unique ids
    loc = str(tmp_path_factory.mktemp("pprop") / "t")
    df = spark.createDataFrame(rows, "id long, s string")
    spec = [PartitionField(column=col, transform=t_name, param=param)]
    table = LakeTable(spark, loc)
    staged = table.stage_dataframe(df, partition_exprs=partition_columns(spec))
    table.commit(staged, df.schema, "create", None, partition_spec=[vars(p) for p in spec])
    snap = table.snapshot()

    # probe a value present in the data, one absent, and (when probing the
    # string column) the empty string — the hive default-partition case
    present = rows[0][0] if col == "id" else rows[0][1]
    absents = [10**9] if col == "id" else ["zz-absent"]
    probes = [present] + absents + ([""] if col == "s" else [])
    for v in probes:
        got = sorted((r.id, r.s) for r in table.read(where=[(col, "=", v)]).collect())
        want = sorted((i, s_) for i, s_ in rows if (i if col == "id" else s_) == v)
        assert got == want, (t_name, param, v, got, want)
    # IN probe across both present values
    vals = sorted({r[0] for r in rows})[:3] if col == "id" else sorted({r[1] for r in rows})[:3]
    got = sorted((r.id, r.s) for r in table.read(where=[(col, "in", vals)]).collect())
    want = sorted((i, s_) for i, s_ in rows if (i if col == "id" else s_) in vals)
    assert got == want


# ---- gopher_rules vs pure-Python model -------------------------------------

_gopher_texts = st.lists(
    st.text(
        alphabet=st.sampled_from(list("ab the… #.*-\n") + ["…"]),
        min_size=0,
        max_size=80,
    ),
    min_size=1,
    max_size=8,
)


def _py_gopher(text: str) -> dict:
    """Reference model of operators/text.py::gopher_rules formulas."""
    import re

    t = [x for x in re.split(r"\s+", text) if x != ""]
    lines = [x for x in text.split("\n") if x != ""]
    tc = max(len(text), 1)
    nw = max(len(t), 1)

    def dup_chars(arr):
        from collections import Counter

        c = Counter(arr)
        return sum(len(x) * n for x, n in c.items() if n >= 2)

    def grams(n):
        return [" ".join(t[i : i + n]) for i in range(len(t) - n + 1)] if len(t) >= n else []

    def top_chars(arr):
        from collections import Counter

        c = Counter(arr)
        return max((n * len(x) for x, n in c.items()), default=0)

    sym = (
        text.count("#")
        + (len(text) - len(text.replace("...", ""))) / 3
        + text.count("…")
    )
    return {
        "n_words": len(t),
        "mean_word_len": sum(len(x) for x in t) / nw,
        "symbol_word_ratio": sym / nw,
        "alpha_word_frac": sum(1 for x in t if re.search("[A-Za-z]", x)) / nw,
        "dup_line_frac": (1.0 - len(set(lines)) / max(len(lines), 1)) if lines else 1.0 - 0 / 1,
        "dup_line_char_frac": dup_chars(lines) / tc,
        "top_2gram_char_frac": top_chars(grams(2)) / tc,
        "top_3gram_char_frac": top_chars(grams(3)) / tc,
        "dup_5gram_char_frac": dup_chars(grams(5)) / tc,
        "dup_10gram_char_frac": dup_chars(grams(10)) / tc,
    }


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=_gopher_texts)
def test_gopher_rules_match_python_model(spark, texts):
    """Every Gopher formula must equal the straightforward Python
    computation on arbitrary text (unicode ellipsis, newlines, empties,
    symbol runs) — guards the sorted-run/zip-with HOF implementations."""
    from dlt_iceberg_spark.operators.text import gopher_rules

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    rows = {r.doc_id: r for r in gopher_rules(df).collect()}
    for i, text in enumerate(texts):
        want = _py_gopher(text)
        got = rows[i]
        for feat, w in want.items():
            g = getattr(got, feat)
            assert abs(g - w) < 1e-9, (feat, text, g, w)


# ---------------------------------------------------------------------------
# Schema DDL: random rename/drop/add/write interleavings agree with a model
# ---------------------------------------------------------------------------

_ddl_ops = st.lists(
    st.tuples(
        st.sampled_from(["rename", "drop", "add", "append", "upsert"]),
        st.dictionaries(st.integers(0, 9), st.integers(0, 99), min_size=1, max_size=4),
    ),
    min_size=1,
    max_size=8,
)


@pytest.mark.usefixtures("spark")
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(ops=_ddl_ops)
@pytest.mark.slow
def test_schema_ddl_sequences_match_model(spark, ops):
    """Random interleavings of rename_column / drop_column / add_column /
    append / CoW upsert must agree with a driver-side dict model at every
    step — the property that the per-file ``names`` bridge, the field-id
    stability, and the drop/re-add resurrection guard compose under ANY
    history, not just the unit-test scripts."""
    import tempfile
    import uuid

    from dlt_iceberg_spark.lake.catalog import LakeCatalog
    from dlt_iceberg_spark.lake.writer import LakeWriter, TableSpec

    wh = tempfile.mkdtemp(prefix=f"ddl_prop_{uuid.uuid4().hex[:6]}_")
    catalog = LakeCatalog(spark, wh)
    writer = LakeWriter(catalog, "m")
    writer.write(
        TableSpec(name="t", write_disposition="append"),
        spark.createDataFrame([(i, -1) for i in range(5)], "id long, c0 long"),
        load_id="seed",
    )
    # model: {id: {col: value}}; data_col = the current name of the value
    # column lineage (renames move it); extra cols from re-adds start null
    cols = ["id", "c0"]
    model: dict[int, dict] = {i: {"id": i, "c0": -1} for i in range(5)}
    next_col = 1
    defaults: dict[str, int] = {}  # col -> initial/write default

    def check():
        t = catalog.load_table("m", "t")
        got = sorted(
            tuple(r[c] for c in cols) for r in t.read().select(*cols).collect()
        )
        want = sorted(
            tuple(row.get(c) for c in cols) for row in model.values()
        )
        assert got == want, f"cols={cols}\ngot={got}\nwant={want}"

    for n, (kind, batch) in enumerate(ops):
        t = catalog.load_table("m", "t")
        rows = sorted(batch.items())
        data_cols = [c for c in cols if c != "id"]
        if kind == "rename" and data_cols:
            old = data_cols[0]
            new = f"c{next_col}"
            next_col += 1
            t.rename_column(old, new)
            cols[cols.index(old)] = new
            if old in defaults:
                defaults[new] = defaults.pop(old)
            for row in model.values():
                row[new] = row.pop(old, None)
        elif kind == "drop" and len(data_cols) > 1:
            victim = data_cols[-1]
            t.drop_column(victim)
            cols.remove(victim)
            defaults.pop(victim, None)
            for row in model.values():
                row.pop(victim, None)
        elif kind == "add":
            # alternate fresh names and re-adds of previously-seen names
            name = f"c{next_col}" if n % 2 == 0 else "c0"
            if name in cols:
                name = f"c{next_col}"
            if name in (t.snapshot().field_ids or {}) and name in cols:
                continue
            # every third add carries an Iceberg-v3 default: existing rows
            # must read it (initial-default), later sparse batches land it
            # (write-default) — composed with renames/drops/re-adds
            dflt = 7 + n if n % 3 == 0 else None
            t.add_column(name, "long", default=dflt)
            if name not in cols:
                cols.append(name)
            next_col += 1
            if dflt is not None:
                defaults[name] = dflt
            else:
                defaults.pop(name, None)
            for row in model.values():
                row[name] = dflt
        elif kind == "append" and data_cols:
            vcol = data_cols[0]
            df = spark.createDataFrame(rows, f"id long, {vcol} long")
            writer.write(
                TableSpec(name="t", write_disposition="append"), df, load_id=f"l{n}"
            )
            for i, v in rows:
                model[max(model, default=0) + 1000 + i] = {
                    **{c: defaults.get(c) for c in cols}, "id": i, vcol: v,
                }
        elif kind == "upsert" and data_cols:
            vcol = data_cols[0]
            df = spark.createDataFrame(rows, f"id long, {vcol} long")
            writer.write(
                TableSpec(
                    name="t",
                    write_disposition={"disposition": "merge", "strategy": "upsert"},
                    primary_key=["id"],
                ),
                df,
                load_id=f"l{n}",
            )
            # upsert collapses every model row with the key (appends may
            # have duplicated ids) into one updated row
            for i, v in rows:
                hit = [k for k, row in model.items() if row["id"] == i]
                for k in hit:
                    del model[k]
                model[i] = {**{c: defaults.get(c) for c in cols}, "id": i, vcol: v}
        check()
