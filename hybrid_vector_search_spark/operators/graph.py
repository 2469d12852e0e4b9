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
    # checkpoint the input once — the symmetrization below references it
    # twice, which would re-evaluate the upstream pair pipeline twice
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint(
        eager=True
    )
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


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round: every strictly-larger neighbor of u reattaches to
    min(N(u) ∪ {u}). Deterministic, shrinks tall structures toward minima."""
    sym = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    mins = sym.groupBy("a").agg(F.min("b").alias("mb"))
    return (
        sym.join(mins, "a")
        .where(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.least(F.col("a"), F.col("mb")).alias("b"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: orient edges larger→smaller; every small neighbor of
    u (and u itself) reattaches to u's minimum small neighbor."""
    o = (
        e.select(F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    mins = o.groupBy("a").agg(F.min("b").alias("mb"))
    return (
        o.join(mins, "a")
        .select(F.col("b").alias("a"), F.col("mb").alias("b"))
        .union(mins.select(F.col("a"), F.col("mb").alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 50,
) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14).

    Same contract as :func:`connected_components` — (node, component) with
    component = min node id — but converges in O(log n) rounds regardless of
    component DIAMETER, where min-label propagation needs O(diameter) rounds.
    This is the adversarial-100 TB fallback the min-label docstring promises:
    a long near-dup chain (each doc similar to the next) costs min-label a
    round per link; here each large-star halves path lengths.

    Each round is two join+min aggregations over the current edge list —
    the identical shuffle shape as one min-label round — iterated until the
    edge list reaches a fixpoint (a forest of stars rooted at component
    minima).
    """
    # checkpoint the INPUT once: nodes and the working edge list both derive
    # from it, and without this each derivation re-evaluates the upstream
    # pipeline (for the near-dup use the shingle+jaccard pair build is ~2 s
    # at sf0.1 — it dominated this operator's bench row, not the rounds)
    raw = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint(
        eager=True
    )
    # remember every node BEFORE dropping self-loops (a pure self-loop node is
    # its own singleton component; roots also drop out of `a` at convergence)
    nodes = (
        raw.select(F.col("a").alias("node"))
        .union(raw.select(F.col("b").alias("node")))
        .distinct()
    )
    e = (
        raw.where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # convergence = set equality of consecutive (distinct) edge lists. Carry
    # the previous round's count forward so each round costs ONE action (the
    # checkpoint of `new` yields its count for free via rdd.count on the
    # materialized blocks); the subset probe (except → empty) runs only when
    # the counts already agree — i.e. once, at the convergent round.
    prev_count = e.count()
    for _ in range(max_iter):
        new = _small_star(_large_star(e)).localCheckpoint(eager=True)
        new_count = new.count()
        same = (
            new_count == prev_count
            and new.exceptAll(e).limit(1).count() == 0
        )
        e, prev_count = new, new_count
        if same:
            break
    # fixpoint edges are (node → component-min); roots map to themselves.
    # min() guards the not-fully-converged max_iter cutoff (then a node may
    # still hold several outgoing edges).
    return (
        nodes.join(e, nodes.node == e.a, "left")
        .select("node", F.coalesce(F.col("b"), F.col("node")).alias("component"))
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    iterations: int = 5,
) -> DataFrame:
    """Synchronous label-propagation communities (Raghavan et al. 2007) with
    deterministic tie-breaks — the community-DETECTION member of the graph
    family (components answers "connected?", PageRank answers "important?",
    LPA answers "which cluster?" on connected-but-heterogeneous graphs,
    e.g. refining a giant near-dup component into template families).

    Semantics: labels init to node ids; each round every node SIMULTANEOUSLY
    adopts the most frequent label among its neighbors, ties broken by the
    SMALLEST label; isolated rounds keep the node's current label. The
    synchronous schedule + total-order tie-break make the result a pure
    function of the graph — partition-invariant and replayable round-by-round
    by a chained-CTE SQL oracle (asynchronous/randomized LPA variants
    converge faster but are irreproducible, the wrong trade here).

    Returns (node, community) after ``iterations`` rounds.

    Scale shape per round (the pagerank.py policy): one join of the
    symmetrized edge list with the label relation on the source endpoint
    (co-partitionable — pre-bucket edges by src at 100 TB), one
    groupBy(node, label) count with map-side partials, one per-node argmax
    window over the (node × distinct neighbor labels) relation — never the
    corpus — and a localCheckpoint to hold plan size constant.
    """
    from pyspark.sql import Window

    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("nbr").orderBy(F.desc("cnt"), F.asc("label"))
    for _ in range(iterations):
        counts = (
            sym.join(labels, sym.a == labels.node)
            .groupBy(F.col("b").alias("nbr"), "label")
            .agg(F.count("*").alias("cnt"))
        )
        winners = (
            counts.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select(F.col("nbr").alias("node"), F.col("label").alias("new_label"))
        )
        labels = (
            labels.join(winners, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
    return labels.select("node", F.col("label").alias("community"))


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle counts via degree-ordered edge orientation (the
    node-iterator++ / MapReduce design of Suri & Vassilvitskii, "Counting
    Triangles and the Curse of the Last Reducer", WWW 2011).

    Every undirected edge is oriented from its lower-total-order endpoint
    to the higher, where the total order is (degree, node id) — so wedges
    are only enumerated AT their lowest-degree vertex. That caps the
    per-node wedge work at O(d_min²) and is precisely what tames power-law
    skew at 100 TB: a celebrity node of degree 10⁷ never enumerates its own
    wedge set, because almost all of its edges orient TOWARD it. The plan
    is two self-joins of the oriented edge list (wedge build + closing-edge
    semi-join) plus one aggregate — all equi-joins on node keys, no
    quadratic blowup beyond the wedge set itself.

    Returns (node, n_triangles) for every node of the symmetrized simple
    graph (self-loops dropped, multi-edges collapsed), counting each
    triangle once per member node.

    Plan shape (r13): the symmetrized edge list, the degree relation and
    the oriented edge list are each referenced several times downstream
    (orientation, both wedge sides, the closing-edge probe, the node
    spine). Left lazy, every reference re-plans and re-executes the whole
    upstream subtree — the static plan for the co-purchase caller carried
    ~600 Exchange nodes (56 rebuilds of the order self-join) before this
    change. They are localCheckpointed instead: |E|- and |V|-sized
    intermediates each computed exactly once (guide §3.3 / §5 — multi-
    referenced intermediates are materialized, lineage truncated; the
    same policy as the iterative fixpoints). The triangle membership
    explode replaces a 3-way union of the triangle relation for the same
    reason. The checkpoints are lazy (eager=False, r14): each still
    materializes exactly once, at the first action, so the jobs run inside
    the caller's timed execution instead of at plan-construction time.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col(src) != F.col(dst)
    )
    sym = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        sym.groupBy("a")
        .agg(F.count("*").alias("deg"))
        .withColumnRenamed("a", "n")
        .localCheckpoint(eager=False)
    )
    # orient by (degree, id): u -> v iff (deg(u), u) < (deg(v), v)
    du = deg.select(F.col("n").alias("a"), F.col("deg").alias("da"))
    dv = deg.select(F.col("n").alias("b"), F.col("deg").alias("db"))
    oriented = (
        sym.join(du, "a")
        .join(dv, "b")
        .where(
            (F.col("da") < F.col("db"))
            | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
        )
        .select("a", "b")
        .localCheckpoint(eager=False)
    )
    # wedges centered at the (low-order) vertex u: u->v, u->w with v < w
    e1 = oriented.select(F.col("a").alias("u"), F.col("b").alias("v"))
    e2 = oriented.select(F.col("a").alias("u"), F.col("b").alias("w"))
    wedges = e1.join(e2, "u").where(F.col("v") < F.col("w"))
    closing = oriented.select(
        F.least("a", "b").alias("v"), F.greatest("a", "b").alias("w")
    ).distinct()
    tris = wedges.join(closing, ["v", "w"])
    per_node = (
        tris.select(
            F.explode(F.array(F.col("u"), F.col("v"), F.col("w"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
    return deg.select(F.col("n").alias("node")).join(per_node, "node", "left").select(
        "node", F.coalesce("n_triangles", F.lit(0)).alias("n_triangles")
    )


def hop_distances(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 6,
) -> DataFrame:
    """Minimum hop count from a seed set over the DIRECTED edge relation —
    frontier BFS as iterative DataFrame joins (the traversal member of the
    iterative family beside components, PageRank/PPR and LPA; the
    crawl-depth / influence-radius question). Returns (node, hops) for
    every node reachable within ``max_hops``; seeds are hops 0.

    Frontier semantics give min-hop for free: a node joins the distance
    relation the FIRST round it is reached and the anti-join bars every
    later (longer) path, so the result is a pure function of the graph —
    no tie-breaks needed, exactly replayable by a recursive-CTE oracle
    (min(hops) over bounded walks). Per round: one join of the FRONTIER
    (not the full distance relation) against the edge list + one anti-join
    + localCheckpoint lineage cut; the convergence probe costs one tiny
    driver action per round, same policy as connected_components. At
    100 TB pre-bucket edges by src — the frontier join is then
    shuffle-free, and the frontier relation is the only thing that moves.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).distinct()
    e = e.localCheckpoint(eager=True)
    dist = (
        seeds.select(F.col(seeds.columns[0]).alias("node"))
        .distinct()
        .withColumn("hops", F.lit(0))
        .localCheckpoint(eager=True)
    )
    frontier = dist
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier.node == e.a)
            .select(F.col("b").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .withColumn("hops", F.lit(h))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return dist


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 12,
) -> DataFrame:
    """(node, degree) of the k-CORE: the maximal subgraph where every node
    keeps degree >= k (Seidman 1983) — on a near-dup pair graph this
    separates DENSE duplicate communities (template farms, mirror sets)
    from incidental pairwise matches, which components cannot do.

    Peeling fixpoint: drop nodes with induced degree < k, recompute, repeat.
    Each round is one symmetric-edge semi-join + one degree aggregate —
    the same shuffle shape as a min-label round; the edge relation only
    SHRINKS, so per-round cost is monotonically decreasing. The fixpoint is
    idempotent (extra rounds are no-ops), which is what lets a fixed-depth
    chained-CTE oracle replay it: any unrolling >= the convergence depth
    produces the identical relation. Input is checkpointed once (the
    upstream pair build must not re-evaluate per round).
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    cur = sym.localCheckpoint(eager=True)
    prev_nodes = -1
    for _ in range(max_iter):
        deg = cur.groupBy("a").agg(F.count("*").alias("deg"))
        keep = deg.where(F.col("deg") >= k).select("a").localCheckpoint(eager=True)
        n = keep.count()
        if n == prev_nodes:
            break
        prev_nodes = n
        cur = (
            cur.join(keep, "a", "left_semi")
            .join(keep.select(F.col("a").alias("b")), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
    return (
        cur.groupBy("a")
        .agg(F.count("*").alias("degree"))
        .where(F.col("degree") >= k)
        .select(F.col("a").alias("node"), "degree")
    )


def katz_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    alpha: float = 0.05,
    iterations: int = 6,
    dp: int = 12,
) -> DataFrame:
    """(node, katz) after ``iterations`` of x ← 1 + α·Aᵀx, x₀ = 1 — Katz
    centrality with β=1 (Katz 1953), the walk-counting authority score that
    (unlike PageRank) rewards ALL inbound walks without degree-normalizing,
    so hub-feeding nodes surface. ``alpha`` must stay below 1/λ_max of the
    adjacency matrix; for bounded-indegree graphs indeg_max·alpha < 1 is a
    sufficient caller-side check.

    Engine-exact arithmetic, same ladder as operators/pagerank.py: each
    edge's contribution α·x(u) is ONE double multiply rounded to ``dp``
    decimals, accumulated as DECIMAL(38,dp) (associative, partition-order-
    proof), +1 in decimal — so the whole fixpoint replays bit-for-bit as a
    chained-CTE SQL oracle. Each iteration eagerly localCheckpoints (plan
    never grows past one step); the edge relation persists for the loop.

    Scale per iteration: one src-keyed join of edges with the (node, x)
    relation and one groupBy(dst) partial-sum — both hash on node ids, so
    pre-bucketing the edge list makes the join shuffle-free at 100 TB.
    """
    dec = f"decimal(38,{dp})"
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).persist()
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .distinct()
        .persist()
    )
    x = nodes.select("node", F.lit(1).cast(dec).alias("x")).localCheckpoint(
        eager=True
    )
    for _ in range(iterations):
        contrib = (
            e.join(x.withColumnRenamed("node", "u"), "u")
            .select(
                "v",
                F.round(F.lit(alpha) * F.col("x").cast("double"), dp)
                .cast(dec)
                .alias("c"),
            )
            .groupBy("v")
            .agg(F.sum("c").alias("s"))
        )
        x = (
            nodes.join(contrib.withColumnRenamed("v", "node"), "node", "left")
            .select(
                "node",
                (
                    F.lit(1).cast(dec)
                    + F.coalesce(F.col("s"), F.lit(0).cast(dec))
                ).alias("x"),
            )
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    nodes.unpersist()
    return x.select("node", F.col("x").cast("double").alias("katz"))


def seed_hop_distances(
    edges: DataFrame,
    seeds: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 6,
) -> DataFrame:
    """(seed, node, hops) — min hop count from EACH seed separately (the
    per-landmark BFS behind landmark/pivot centrality estimates), as
    frontier joins keyed by (seed, node). Unlike hop_distances (which
    collapses the seed set into one multi-source frontier), every seed's
    distance field stays distinct, so per-seed aggregates (harmonic sums,
    eccentricity bounds) are computable downstream.

    Frontier semantics again make the relation a pure function of the
    graph. State and fan-out are |seeds| × reachable-nodes — the reason
    landmark methods SAMPLE seeds at scale; callers pick the landmark set
    size, and each BFS round is one frontier-edge join + one anti-join
    with an eager checkpoint."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).distinct()
    e = e.localCheckpoint(eager=True)
    dist = (
        seeds.select(F.col(seeds.columns[0]).alias("seed"))
        .distinct()
        .select("seed", F.col("seed").alias("node"), F.lit(0).alias("hops"))
        .localCheckpoint(eager=True)
    )
    frontier = dist
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier.node == e.a)
            .select("seed", F.col("b").alias("node"))
            .distinct()
            .join(dist, ["seed", "node"], "left_anti")
            .withColumn("hops", F.lit(h))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return dist


def harmonic_centrality(
    edges: DataFrame,
    landmarks: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 6,
    dp: int = 12,
) -> DataFrame:
    """(node, harmonic) — landmark-estimated harmonic centrality
    (Boldi & Vigna 2014's axiomatically-preferred closeness variant):
    H(v) = Σ_landmarks 1/d(s→v) over the per-seed BFS fields, distance-0
    terms excluded. With landmarks = all nodes this is exact inbound
    harmonic centrality; with a sample it is the standard unbiased-up-to-
    scaling estimate — the only way the question is answerable at 100 TB.

    1/d terms are rounded to ``dp`` decimals and summed as DECIMAL(38,dp)
    (associative), so the score replays exactly from a bounded recursive
    CTE."""
    dec = f"decimal(38,{dp})"
    d = seed_hop_distances(edges, landmarks, src=src, dst=dst, max_hops=max_hops)
    return (
        d.where(F.col("hops") > 0)
        .select(
            "node",
            F.round(F.lit(1.0) / F.col("hops").cast("double"), dp)
            .cast(dec)
            .alias("t"),
        )
        .groupBy("node")
        .agg(F.sum("t").cast("double").alias("harmonic"))
    )


def hits_scores(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    iterations: int = 5,
    dp: int = 12,
) -> DataFrame:
    """(node, hub, authority) after ``iterations`` of HITS (Kleinberg 1999):
    a ← Aᵀh then h ← Aa, each vector max-normalized per half-step. The
    hub/authority split PageRank and Katz lack: a node that POINTS AT the
    good stuff scores as a hub even with zero inbound links — the curation
    signal link-graph quality scoring uses alongside raw authority.

    Engine-exact arithmetic, the Katz ladder twice per iteration: each
    edge contribution is the neighbor's current score (already a
    ``dp``-decimal value) accumulated as DECIMAL(38,dp) — associative and
    partition-order-proof; the max-normalization divides by the exact
    DECIMAL max in ONE double division rounded to ``dp`` decimals. The
    whole fixpoint therefore replays bit-for-bit as 2·iterations chained
    CTEs. Nodes with no inbound (outbound) edges keep authority (hub) 0.

    Scale per half-step: one node-keyed join of the edge list with the
    (node, score) relation and one groupBy partial-sum — identical shape
    to katz_centrality, so pre-bucketing the edge list by node id makes
    both joins shuffle-free; the max is a 1-row broadcast. Plans are cut
    with eager localCheckpoints so the loop never grows the lineage."""
    dec = f"decimal(38,{dp})"
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).persist()
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .distinct()
        .persist()
    )
    h = nodes.select("node", F.lit(1).cast(dec).alias("h")).localCheckpoint(
        eager=True
    )

    def _propagate(scores: DataFrame, score_col: str, edge_from: str,
                   edge_to: str, out_col: str) -> DataFrame:
        raw = (
            e.join(scores.withColumnRenamed("node", edge_from), edge_from)
            .select(F.col(edge_to).alias("node"), F.col(score_col).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        mx = raw.agg(F.max("s").alias("mx"))
        return (
            nodes.join(raw, "node", "left")
            .crossJoin(F.broadcast(mx))
            .select(
                "node",
                F.round(
                    F.coalesce(F.col("s"), F.lit(0).cast(dec)).cast("double")
                    / F.col("mx").cast("double"),
                    dp,
                )
                .cast(dec)
                .alias(out_col),
            )
            .localCheckpoint(eager=True)
        )

    a = None
    for _ in range(iterations):
        a = _propagate(h.select("node", "h"), "h", "u", "v", "a")
        h = _propagate(a.select("node", "a"), "a", "v", "u", "h")
    out = nodes.join(a, "node", "left").join(h, "node", "left").select(
        "node",
        F.coalesce(F.col("h"), F.lit(0).cast(dec)).cast("double").alias("hub"),
        F.coalesce(F.col("a"), F.lit(0).cast(dec)).cast("double").alias("authority"),
    )
    e.unpersist()
    nodes.unpersist()
    return out
