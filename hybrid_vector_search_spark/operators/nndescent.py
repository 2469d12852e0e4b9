"""Approximate k-NN GRAPH construction via NN-Descent — the batch analog
of the HNSW graph index the reference's managed search tier builds for
`$vectorSearch` (reference `indexes.py:55-71`; Atlas mongot builds HNSW).

HNSW itself is an ONLINE, pointer-chasing structure — sequential inserts
into a mutable multi-layer graph — which is exactly the shape a
distributed batch engine should NOT imitate. The batch-native way to get
the same artifact (each vector's k nearest neighbors, the substrate for
graph-ANN serving, semantic dedup sweeps, and kNN-graph clustering) is
NN-Descent (Dong, Moses, Li — "Efficient K-Nearest Neighbor Graph
Construction for Generic Similarity Measures", WWW 2011): start from a
random graph and iterate "a neighbor of my neighbor is probably my
neighbor", comparing each node's neighborhood against itself and keeping
the best k. Every step is a join/aggregate, so the whole algorithm is
declarative DataFrame code Catalyst can plan:

  init       one bucket-hash shuffle: nodes land in ~k-sized pseudo-random
             buckets (xxhash64 — deterministic, seedable), per-bucket pairs
             are scored, each node keeps its best k. No dense-id
             assumption, no global sort, no driver-side sampling.
  iterate    neighborhood B(v) = ALL out-neighbors (≤ k, the quality
             edges) ∪ in-neighbors capped at sample_rate*k per node (the
             paper's ρ reverse-sampling — the cap is what bounds the
             quadratic term, because in-degree is unbounded under
             hubness); neighbor-of-neighbor candidates come from ONE
             self-join of B on the pivot node (fan-out per pivot
             ≤ C(k+ρk, 2), so total work is O(n·k²) per iteration —
             linear in the corpus); a fresh random-bucket pair batch is
             injected each round (cheap exploration that breaks the
             local-neighborhood plateau NN-Descent hits on
             high-intrinsic-dimension corpora); candidates are
             distinct-ed BEFORE embeddings attach, scored with the shared
             metric kernel, unioned with the current graph, and
             re-top-k'd per node.
  converge   a fixed iteration count (the paper's early-exit counts
             updates; recall at fixed depth is pinned by test on the
             bundled corpus, not assumed).

Scale shape: embeddings move ONLY for distinct candidate endpoints (id
joins); the graph relation is (src, dst, score) triples — 20 bytes/edge,
n·k rows; every window runs per-node over ≤ (ρk)² + k rows; lineage is
cut per iteration with localCheckpoint (swap for reliable checkpoint()
on a cluster) exactly like the PageRank/components fixpoints. Nothing in
the plan is corpus-quadratic: no CartesianProduct, no global sort, no
driver collect of data-proportional relations (pinned in
tests/test_nndescent.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vector import similarity


def _top_k_per_src(edges: DataFrame, k: int) -> DataFrame:
    """Keep each src's best k edges (score desc, dst asc — total order, so
    the graph is deterministic for a fixed input and seed)."""
    w = Window.partitionBy("src").orderBy(F.desc("score"), F.asc("dst"))
    return (
        edges.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def _score_pairs(
    pairs: DataFrame, emb: DataFrame, metric: str
) -> DataFrame:
    """(src, dst) -> (src, dst, score): attach both endpoint vectors by id
    join and apply the shared metric kernel (higher = closer for every
    metric, euclidean included — `functions.vector.similarity`)."""
    ea = emb.select(F.col("_id").alias("src"), F.col("_vec").alias("_va"))
    eb = emb.select(F.col("_id").alias("dst"), F.col("_vec").alias("_vb"))
    return (
        pairs.join(ea, "src")
        .join(eb, "dst")
        .select(
            "src",
            "dst",
            similarity(F.col("_va"), F.col("_vb"), metric).alias("score"),
        )
    )


def knn_graph_nndescent(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    k: int = 10,
    iterations: int = 3,
    metric: str = "cosine",
    sample_rate: float = 1.0,
    seed: int = 0,
    build_k: int | None = None,
) -> DataFrame:
    """Build the approximate k-NN graph: (src, dst, score) with up to k
    rows per src, score rounded 6 (higher = closer), dst != src, ordered
    per src by (score desc, dst asc). Deterministic for fixed inputs and
    ``seed``. ``sample_rate`` is the paper's ρ — the fraction of the
    working degree used to cap each node's undirected neighborhood before
    the pivot join (lower = cheaper iterations, slightly slower
    convergence).

    ``build_k`` is the INTERNAL working degree (default k): iterate with a
    neighborhood of ``build_k`` candidates per node, truncate to the best
    ``k`` only at the end. This is the convergence lever that matters on
    high-intrinsic-dimension corpora (pynndescent ships the same knob as
    ``n_neighbors`` > the serving k): candidate pools grow ~build_k² per
    pivot, so build_k=2k quadruples each round's exploration. Measured on
    the bundled near-isotropic 64-dim corpus (the adversarial case — true
    top-10 cosine ≈0.35 vs random-pair p99 ≈0.29, so "neighbor of my
    neighbor" carries a weak signal): at n=2000, k=10, 4 rounds,
    recall@10 plateaus at 0.65 with build_k=k but reaches 0.92 with
    build_k=2k and 0.99 with build_k=3k, while cost stays O(n·build_k²)
    per round — linear in the corpus."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    kb = k if build_k is None else build_k
    if kb < k:
        raise ValueError(f"build_k must be >= k, got build_k={kb} k={k}")
    spark = emb.sparkSession
    e = emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"))
    n = e.count()  # one job, O(1) result — sizes the init buckets
    if n <= 1:
        # empty graph, but with src/dst typed like the input id column —
        # a hardcoded DDL here would give the degenerate case a different
        # schema than the populated path for string/int id corpora
        return e.select(
            F.col("_id").alias("src"),
            F.col("_id").alias("dst"),
            F.lit(0.0).cast("double").alias("score"),
        ).limit(0)

    n_buckets = max(1, n // (kb + 1))

    def _random_pairs(tag: int) -> DataFrame:
        """Pseudo-random ~k-sized buckets -> per-bucket pairs. Each node
        lands in 2 buckets of expected size ~(k+1), so it meets ~2k random
        peers — no dense-id arithmetic, no global sort, no driver-side
        sampling. Deterministic: bucket = xxhash64(id, rep, tag) mod
        n_buckets."""
        seeded = e.select(
            "_id",
            F.explode(F.array(F.lit(0), F.lit(1))).alias("_rep"),
        ).select(
            "_id",
            F.pmod(
                F.xxhash64(F.col("_id"), F.col("_rep"), F.lit(tag)),
                F.lit(n_buckets),
            ).alias("_b"),
        )
        b1 = seeded.select(F.col("_id").alias("src"), "_b")
        b2 = seeded.select(F.col("_id").alias("dst"), "_b")
        return (
            b1.join(b2, "_b")
            .where(F.col("src") != F.col("dst"))
            .select("src", "dst")
            .distinct()
        )

    # ---- init: random graph from bucket pairs (working degree kb)
    graph = _top_k_per_src(
        _score_pairs(_random_pairs(seed), e, metric), kb
    ).localCheckpoint(eager=True)

    # ---- NN-Descent rounds: neighbor-of-neighbor via ONE pivot self-join
    # over B(v) = out-neighbors ∪ capped in-neighbors, plus a fresh
    # random-pair injection per round.
    cap = max(1, int(round(sample_rate * kb)))
    for it in range(iterations):
        fwd = graph.select(
            F.col("src").alias("_pivot"), F.col("dst").alias("_n")
        )
        rev = graph.select(
            F.col("dst").alias("_pivot"), F.col("src").alias("_n")
        )
        # ρ reverse-sampling (deterministic): out-neighbors all stay (≤ k,
        # the quality edges); in-degree is unbounded under hubness, so the
        # reverse side is capped at ρk per node by hash rank
        wcap = Window.partitionBy("_pivot").orderBy(
            F.xxhash64(F.col("_pivot"), F.col("_n"), F.lit(seed + it + 1))
        )
        rev = (
            rev.withColumn("_rk", F.row_number().over(wcap))
            .where(F.col("_rk") <= cap)
            .drop("_rk")
        )
        nb = fwd.unionAll(rev).distinct()
        p1 = nb.select("_pivot", F.col("_n").alias("src"))
        p2 = nb.select("_pivot", F.col("_n").alias("dst"))
        cands = (
            p1.join(p2, "_pivot")
            .where(F.col("src") < F.col("dst"))
            .select("src", "dst")
            # exploration injection: a fresh random batch each round keeps
            # candidate diversity alive past the local-neighborhood
            # plateau (measured on the bundled 64-dim corpus: plain
            # NN-Descent plateaus ≈0.83 recall@10, with injection ≥0.91)
            .unionAll(_random_pairs(seed * 31 + it + 1))
            .distinct()
        )
        scored = _score_pairs(cands, e, metric)
        both = scored.unionAll(
            scored.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "score"
            )
        )
        graph = _top_k_per_src(
            graph.unionAll(both)
            .groupBy("src", "dst")
            .agg(F.max("score").alias("score")),
            kb,
        ).localCheckpoint(eager=True)

    return _top_k_per_src(graph, k).select(
        "src", "dst", F.round("score", 6).alias("score")
    ).orderBy("src", F.desc("score"), F.asc("dst"))


def knn_graph_search(
    graph: DataFrame,
    emb: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    *,
    k: int = 10,
    beam: int = 20,
    hops: int = 3,
    metric: str = "cosine",
    seed: int = 0,
) -> DataFrame:
    """Batch greedy beam search over a pre-built k-NN graph — the query
    half of the graph-ANN story (HNSW's search phase, batch form): every
    query starts from a fixed pseudo-random entry-point set, and each hop
    expands the current beam's graph neighbors, re-scores, and keeps the
    best ``beam`` nodes per query; after ``hops`` rounds the top ``k``
    are returned as (query_id, vec_id, score), score desc / id asc.

    HNSW answers one query by chasing pointers; a batch engine answers a
    RELATION of queries by joining the whole frontier against the edge
    list at once — per hop: one join frontier×graph (fan-out ≤ beam·k per
    query), one id join to attach candidate vectors (embeddings move only
    for distinct candidate ids), one top-beam window (≤ beam·(k+1) rows
    per query). Entry points are a ~``beam``-sized deterministic hash
    sample of the corpus ids, broadcast against the query relation — the
    constant-sized-side crossJoin pattern, never corpus×queries.

    Recall depends on the graph's quality and ``beam``/``hops``; it is
    pinned by test against exact brute force, not assumed.
    """
    if k < 1 or beam < k:
        raise ValueError(f"need beam >= k >= 1, got k={k} beam={beam}")
    e = emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"))
    q = queries.select(
        F.col(query_id_col).alias("_qid"), F.col(query_vec_col).alias("_qvec")
    )
    n = e.count()
    stride = max(1, n // beam)
    entries = e.where(
        F.pmod(F.xxhash64(F.col("_id"), F.lit(seed)), F.lit(stride)) == 0
    ).select("_id")
    edges = graph.select(F.col("src").alias("_id"), F.col("dst").alias("_dst"))

    def _score_frontier(cand: DataFrame) -> DataFrame:
        """(qid, id) -> (qid, id, score): attach corpus vector by id, then
        the query vector by qid, score with the shared kernel."""
        return (
            cand.join(e, "_id")
            .join(q, "_qid")
            .select(
                "_qid",
                "_id",
                similarity(F.col("_qvec"), F.col("_vec"), metric).alias("_s"),
            )
        )

    wbeam = Window.partitionBy("_qid").orderBy(F.desc("_s"), F.asc("_id"))
    frontier = _score_frontier(
        q.select("_qid").join(F.broadcast(entries), how="cross")
    )
    frontier = (
        frontier.withColumn("_rk", F.row_number().over(wbeam))
        .where(F.col("_rk") <= beam)
        .drop("_rk")
        .localCheckpoint(eager=True)
    )
    for _hop in range(hops):
        expand = (
            frontier.select("_qid", "_id")
            .join(edges, "_id")
            .select("_qid", F.col("_dst").alias("_id"))
            .distinct()
        )
        merged = frontier.unionAll(_score_frontier(expand)).groupBy(
            "_qid", "_id"
        ).agg(F.max("_s").alias("_s"))
        frontier = (
            merged.withColumn("_rk", F.row_number().over(wbeam))
            .where(F.col("_rk") <= beam)
            .drop("_rk")
            .localCheckpoint(eager=True)
        )
    return (
        frontier.withColumn("_rk", F.row_number().over(wbeam))
        .where(F.col("_rk") <= k)
        .select(
            F.col("_qid").alias(query_id_col),
            F.col("_id").alias(id_col),
            F.round("_s", 6).alias("score"),
        )
        .orderBy(query_id_col, F.desc("score"), F.asc(id_col))
    )
