"""PageRank — iterative link analysis with engine-exact arithmetic.

Web-corpus pipelines rank crawl frontiers and weight domains by link
authority (the original CommonCrawl/C4-era quality prior). PageRank is the
canonical ITERATIVE numeric algorithm — the family (power iteration, label
propagation, ALS) that naive DataFrame code gets wrong twice: unbounded
lineage across iterations, and float accumulation whose result depends on
partitioning (sum order), which would make distributed runs unreproducible
and any cross-engine check impossible.

Both are handled the way this engine handles them everywhere else:

- **Determinism**: each edge contribution is computed in double (single
  IEEE ops — identical on every engine) then ROUNDED to ``dp`` decimals
  and summed as ``DECIMAL(38, dp)`` — an exact, order- and
  partitioning-independent accumulation. The whole 10-iteration fixpoint
  is therefore bit-replayable by a chained-CTE SQL oracle (the same trick
  as the decimal revenue sums and the md5 hash family).
- **Lineage**: each iteration materializes via an eager localCheckpoint
  (same policy as graph.connected_components) so the plan never grows
  beyond one iteration; on a real cluster swap for reliable
  ``checkpoint()`` every few iterations.

Scale shape per iteration: one join of the edge list with the (node, rank)
relation on src (co-partitionable: both sides hash on the node id — at
100 TB pre-bucket the edge list by src so this join is shuffle-free), one
groupBy(dst) with map-side partial sums of decimals. Dangling nodes keep
the simplified semantics (their mass is not redistributed) — matching the
oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DP = 12
_DEC = f"decimal(38,{DP})"


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
    shuffle_partitions: int | None = None,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """(node, rank) after ``iterations`` damped power iterations.

    ``edges`` is the directed link relation; nodes = src ∪ dst. Returns
    ranks as DECIMAL(38,12)-backed doubles rounded to 12 dp.

    ``seeds`` (a 1-column (node) relation) switches to PERSONALIZED
    PageRank: the teleport mass (1−d) lands only on the seed set (1/|S|
    each) instead of uniformly, and the walk starts there — ranks become
    proximity-to-the-seeds, the "more like these" expansion query (seed
    domains → related domains in a crawl frontier). Nodes unreachable
    from the seeds rank exactly 0. The seed relation is dimension-sized
    by nature and broadcasts into the per-node base term; everything else
    (decimal accumulation, per-iteration checkpoint, co-partitionable
    join) is unchanged, so the personalized fixpoint is just as
    bit-replayable by the chained-CTE oracle.

    ``shuffle_partitions`` temporarily scopes
    ``spark.sql.shuffle.partitions`` around the ITERATION LOOP only (each
    iteration materializes eagerly, so the setting is consumed here, not
    leaked to the caller's plan): an iterative algorithm pays per-task
    scheduling overhead `iterations` times, so partitions should be sized
    to the node relation, not the session default — same sizing note as
    the streaming drains' `_stream_shuffle`. The result is bit-identical
    either way (decimal accumulation); only wall-clock changes.
    """
    spark = edges.sparkSession
    conf_key = "spark.sql.shuffle.partitions"
    old_sp = spark.conf.get(conf_key)
    if shuffle_partitions is not None:
        spark.conf.set(conf_key, str(shuffle_partitions))
    try:
        return _pagerank_loop(edges, src, dst, iterations, damping, seeds)
    finally:
        spark.conf.set(conf_key, old_sp)


def _pagerank_loop(
    edges: DataFrame,
    src: str,
    dst: str,
    iterations: int,
    damping: float,
    seeds: DataFrame | None = None,
) -> DataFrame:
    # loop-invariant relations persist for the whole fixpoint: without this
    # every iteration re-derives edges/nodes/degrees from the source scan —
    # `iterations`× the ingest cost for zero benefit
    edges = edges.persist()
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionAll(edges.select(F.col(dst).alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # one tiny job; N is a scalar of the algorithm
    out_deg = edges.groupBy(src).agg(F.count("*").alias("outdeg"))
    if seeds is None:
        base_col = F.lit(round((1.0 - damping) / n, DP)).cast(_DEC)
        nodes_base = nodes.withColumn("base", base_col)
        ranks = nodes.select(
            "node", F.lit(round(1.0 / n, DP)).cast(_DEC).alias("rank")
        ).localCheckpoint(eager=True)
    else:
        # Intersect seeds with the node set BEFORE counting: a seed id absent
        # from the graph would otherwise inflate ns while the left join drops
        # it, leaking teleport mass (ranks no longer sum to 1). An empty
        # effective seed set has no defined teleport vector — raise, don't
        # divide by zero.
        seed_flags = (
            seeds.select(
                F.col(seeds.columns[0]).alias("node"), F.lit(True).alias("_seed")
            )
            .distinct()
            .join(nodes, "node", "left_semi")
        )
        ns = seed_flags.count()
        if ns == 0:
            raise ValueError(
                "personalized pagerank: no seed id is present in the graph's "
                "node set — teleport vector would be empty"
            )
        flagged = nodes.join(F.broadcast(seed_flags), "node", "left")
        nodes_base = flagged.select(
            "node",
            F.when(
                F.col("_seed").isNotNull(),
                F.lit(round((1.0 - damping) / ns, DP)).cast(_DEC),
            )
            .otherwise(F.lit(0).cast(_DEC))
            .alias("base"),
        )
        ranks = flagged.select(
            "node",
            F.when(
                F.col("_seed").isNotNull(),
                F.lit(round(1.0 / ns, DP)).cast(_DEC),
            )
            .otherwise(F.lit(0).cast(_DEC))
            .alias("rank"),
        ).localCheckpoint(eager=True)
    nodes_base = nodes_base.localCheckpoint(eager=True)
    e = edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
    d = out_deg.select(F.col(src).alias("d_src"), "outdeg").persist()
    for _ in range(iterations):
        contrib = (
            e.join(ranks, e.e_src == ranks.node)
            .join(d, e.e_src == d.d_src)
            .select(
                F.col("e_dst").alias("node"),
                # double path: rank·damping/outdeg is a short chain of single
                # IEEE ops, identical on every engine; the round+decimal cast
                # makes the SUM exact and order-independent
                F.round(
                    F.col("rank").cast("double") * F.lit(damping) / F.col("outdeg"),
                    DP,
                )
                .cast(_DEC)
                .alias("c"),
            )
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("m"))
        ranks = (
            nodes_base.join(summed, "node", "left")
            .select(
                "node",
                (
                    F.col("base")
                    + F.coalesce(F.col("m"), F.lit(0).cast(_DEC))
                )
                .cast(_DEC)
                .alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    # final ranks are checkpointed (independent of the caches) — release
    for df in (edges, nodes, d):
        df.unpersist()
    return ranks.select("node", F.col("rank").cast("double").alias("rank"))
