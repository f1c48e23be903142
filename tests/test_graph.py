"""Connected-components tests: chains, multiple components, convergence."""

from dlt_iceberg_spark.operators.graph import connected_components, dedup_clusters


def test_chain_collapses_to_min(spark):
    # 1-2, 2-3, 3-4 form one component; 10-11 another
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], "a long, b long"
    )
    comp = {r.node: r.component for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_long_path_needs_multiple_rounds(spark):
    n = 30  # path 0-1-2-...-29: diameter forces many propagation rounds
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "a long, b long")
    comp = {r.node: r.component for r in connected_components(edges, max_iterations=40).collect()}
    assert set(comp.values()) == {0} and len(comp) == n


def test_pointer_doubling_converges_in_log_rounds(spark):
    # Pointer doubling halves the label-path each round: a diameter-29 path
    # must converge well within 7 rounds (plain min-label propagation needs
    # ~29).  Each saved round is two saved all-data shuffles at scale.
    n = 30
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "a long, b long")
    comp = {r.node: r.component for r in connected_components(edges, max_iterations=7).collect()}
    assert set(comp.values()) == {0} and len(comp) == n


def test_dedup_clusters_assigns_all_rows(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(1, 2), (2, 5)], "a long, b long")
    out = {r.doc_id: (r.canonical_id, r.is_duplicate) for r in
           dedup_clusters(docs, pairs, "doc_id").collect()}
    assert out[1] == (1, False) and out[2] == (1, True) and out[5] == (1, True)
    assert out[0] == (0, False) and out[3] == (3, False) and out[4] == (4, False)
