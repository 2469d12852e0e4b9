"""Connected components over a pair list (near-duplicate clustering).

The dedup operators (dedup.py) emit PAIRS (doc_a ~ doc_b above a similarity
threshold); collapsing a corpus needs CLUSTERS — the transitive closure of
those pairs — so that each group keeps exactly one representative. The
reference has no graph surface at all; Spark has none built in either, so
this is an iterative DataFrame composition:

    label(n) := min(label(n), min over neighbors' labels)   until fixpoint

Each round is one join + one aggregate on the (symmetrized) edge list; the
fixpoint assigns every node the minimum node id of its component — a UNIQUE
result, independent of execution order, which is what makes the recursive-CTE
oracle comparison exact.

Scale notes (100 TB): min-label propagation converges in O(component
diameter) rounds; near-dup graphs are overwhelmingly tiny star-shaped
clusters, so a handful of rounds suffice. For adversarial long-chain graphs
switch to the large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond"), which is O(log n) rounds of the same
join+min shape. Lineage is cut with localCheckpoint every round — without it
the plan doubles per iteration and the driver, not the data, becomes the
bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 50,
) -> DataFrame:
    """Label each node of the undirected graph with its component's min id.

    Returns (node, component). Nodes appearing in no edge are absent (they
    are singleton components by definition; callers union them in if the
    full partition of the corpus is wanted).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    sym = sym.localCheckpoint(eager=True)
    # size the iteration to the PAIR graph, not the corpus: near-dup edge
    # lists are orders of magnitude smaller than their corpus, and a tiny
    # fixpoint loop on full-width shuffles pays per-round scheduling for
    # nothing. ~50k edges per partition keeps big graphs parallel.
    n_parts = max(1, min(sym.rdd.getNumPartitions(), sym.count() // 50_000 + 1))
    sym = sym.repartition(n_parts, "b").localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr = sym.join(labels, sym.b == labels.node).select(
            F.col("a").alias("node"), "label"
        )
        new = (
            labels.union(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))
