"""Connected components — transitive closure for dedup clustering.

MinHash/SimHash/Jaccard emit near-dup *pairs*; grouping "A≈B, B≈C ⇒
{A,B,C}" needs the connected components of the pair graph.  Implemented as
distributed min-label propagation with pointer doubling: every node starts
labeled with itself; each round, each node takes the min label in its
neighborhood (one hop) and then jumps through its own label
(``label(label(x))``), halving the remaining label-path length — so a
path-shaped component of diameter d converges in O(log d) rounds instead of
d.  At 100 TB every saved round is two saved all-data shuffles, and the
worst-case (long chains of pairwise near-dups) is exactly where plain
propagation degrades.  Each round is executor-side joins/groupBy with
``localCheckpoint`` to truncate the iterative lineage (the standard Spark
iterative-algorithm hygiene — without it the plan doubles per round).

Correctness invariant: a node's label is always the id of a node reachable
from it (neighbor labels are reachable via the edge; ``label(label(x))`` is
reachable by transitivity), labels only decrease, and a fixed point forces
``label(x) == label(y)`` across every edge (edges are symmetrized), i.e.
one label per component — necessarily the component's min id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iterations: int = 20,
    checkpoint_every: int = 1,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``; component =
    min node id reachable over undirected edges.

    Each round is checkpointed eagerly by default: the convergence check and
    the next round then both read materialized labels instead of re-running
    the whole lineage (one job per round instead of a growing replay)."""
    und = (
        edges.select(F.col(src).alias("x"), F.col(dst).alias("y"))
        .unionByName(edges.select(F.col(dst).alias("x"), F.col(src).alias("y")))
        .distinct()
        .persist()
    )
    labels = (
        und.select(F.col("x").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for i in range(max_iterations):
        nbr_min = (
            und.join(labels, und.y == labels.node)
            .groupBy(F.col("x").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        stepped = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.col("component").alias("_old"),
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
            )
        )
        # pointer doubling: follow the label one more hop through the freshly
        # stepped labels — component ← label(component).  This is what turns
        # diameter-many rounds into log-many on chain-shaped components.
        # Skipped in round 0: shallow graphs (the common near-dup case)
        # converge in two plain rounds, and the jump join would be a pure
        # extra shuffle there; deep chains still contract exponentially
        # from round 1 on.
        if i > 0:
            parent = stepped.select(
                F.col("node").alias("_pnode"), F.col("component").alias("_pcomp")
            )
            updated = (
                stepped.join(parent, stepped.component == parent._pnode, "left")
                .select(
                    "node",
                    F.least(
                        F.col("component"), F.coalesce("_pcomp", F.col("component"))
                    ).alias("component"),
                    (
                        F.least(
                            F.col("component"),
                            F.coalesce("_pcomp", F.col("component")),
                        )
                        < F.col("_old")
                    ).alias("_changed"),
                )
            )
        else:
            updated = stepped.select(
                "node",
                "component",
                (F.col("component") < F.col("_old")).alias("_changed"),
            )
        if (i + 1) % checkpoint_every == 0:
            updated = updated.localCheckpoint()
        # Round 0 always changes a label when any edge exists (the larger
        # endpoint of any edge sees a smaller neighbor label), and with no
        # edges the label table is empty and round 1's probe exits for
        # free — so the round-0 convergence probe is a provably wasted
        # full-scan job; skip it (guide §1.2: don't compute what you
        # throw away).
        if i > 0:
            n_changed = updated.filter(F.col("_changed")).limit(1).count()
        else:
            n_changed = 1
        labels = updated.drop("_changed")
        if n_changed == 0:
            break
    und.unpersist()
    return labels


def dedup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "a",
    dst: str = "b",
) -> DataFrame:
    """Full transitive dedup assignment: every row of ``df`` gets
    (canonical_id, is_duplicate), canonical = min id of its component;
    rows without near-dup edges are their own canonical."""
    comp = connected_components(pairs, src, dst)
    return (
        df.select(F.col(id_col))
        .join(comp, df[id_col] == comp.node, "left")
        .select(
            F.col(id_col),
            F.coalesce("component", F.col(id_col)).alias("canonical_id"),
            (F.coalesce("component", F.col(id_col)) != F.col(id_col)).alias("is_duplicate"),
        )
    )
