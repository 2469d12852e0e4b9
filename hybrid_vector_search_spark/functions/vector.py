"""Vector similarity column expressions.

The reference's similarity math runs inside Atlas ($vectorSearch with
``similarity ∈ {cosine, dotProduct, euclidean}``, reference indexes.py:28-31)
and is surfaced as a score pseudo-column (``{"$meta": "vectorSearchScore"}``,
reference backend/api.py:197). Here scores are ordinary Catalyst columns built
from the higher-order functions ``zip_with`` / ``aggregate`` — JVM-side,
whole-stage-codegen'd, no Python in the loop.

Score rescaling follows the public Atlas contract so the reference's observable
scores are reproduced: cosine/dotProduct → (1 + sim) / 2, euclidean →
1 / (1 + d). All arithmetic is double-precision (input float arrays are cast
up) so the DuckDB oracle — which computes in DOUBLE — agrees to ≥6 decimals.

Scale note: these expressions are the *exact* path, fine at any scale where a
full scan is acceptable (they pipeline inside one codegen stage, no shuffle).
For 100 TB ANN serving, combine with operators.ivf partition pruning, or swap
the kernel for the NumPy matmul Pandas UDF in operators.knn.knn_scores_numpy.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

SIMILARITIES = ("cosine", "dotProduct", "euclidean")


def _as_double(v: Column | list[float]) -> Column:
    if isinstance(v, Column):
        return v.cast("array<double>")
    vals = [float(x) for x in v]
    if vals and all(map(math.isfinite, vals)):
        # ONE parsed expression instead of len(v)+1 py4j constructions: a
        # 64-dim query vector as element-wise F.lit costs ~40ms of driver
        # round-trips PER score expression (~0.2s/plan for cosine), which
        # dominated the ANN search queries' wall time — the JVM-side parse
        # is ~70x cheaper and float repr round-trips doubles exactly.
        return F.expr("array(" + ",".join(f"{x!r}D" for x in vals) + ")")
    return F.array(*[F.lit(x) for x in vals]).cast("array<double>")


def dot(a: Column, b: Column | list[float]) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (no UDF)."""
    a = _as_double(a)
    b = _as_double(b)
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    a = _as_double(a)
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column | list[float]) -> Column:
    # convert once: each list→literal conversion is a driver-side build cost
    a = _as_double(a)
    b = _as_double(b)
    return dot(a, b) / (norm(a) * norm(b))


def euclidean_dist(a: Column, b: Column | list[float]) -> Column:
    a = _as_double(a)
    b = _as_double(b)
    return F.sqrt(
        F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda acc, x: acc + x)
    )


def similarity(a: Column, b: Column | list[float], metric: str = "cosine") -> Column:
    """Raw similarity (higher = closer) for the three reference metrics.

    For euclidean the raw value is the *negated distance* so that
    ``ORDER BY similarity DESC`` ranks nearest-first for every metric.
    """
    if metric == "cosine":
        return cosine(a, b)
    if metric == "dotProduct":
        return dot(a, b)
    if metric == "euclidean":
        return -euclidean_dist(a, b)
    raise ValueError(f"unknown metric {metric!r}; expected one of {SIMILARITIES}")


def atlas_score(a: Column, b: Column | list[float], metric: str = "cosine") -> Column:
    """Similarity rescaled to (0, 1] per the public Atlas vectorSearch contract,
    reproducing the reference's observable ``vectorSearchScore`` values."""
    if metric in ("cosine", "dotProduct"):
        return (F.lit(1.0) + similarity(a, b, metric)) / F.lit(2.0)
    if metric == "euclidean":
        return F.lit(1.0) / (F.lit(1.0) + euclidean_dist(a, b))
    raise ValueError(f"unknown metric {metric!r}; expected one of {SIMILARITIES}")


def sign_bucket(v: Column, bits: int = 8) -> Column:
    """Axis-aligned random-hyperplane bucket id: bit i is set iff v[i] >= 0.

    The degenerate (identity-projection) member of the SimHash/RHP-LSH
    family (Charikar 2002) — a pure Catalyst expression (unrolled per bit;
    `bits` is small by construction), so semantic bucketing of an embedding
    column is a map-only projection the oracle can replay exactly. Use
    `operators.lsh_ann` for the seeded-projection variant; this exists for
    cheap, engine-portable coarse clustering.
    """
    vv = _as_double(v)
    expr = F.lit(0).cast("long")
    for i in range(bits):
        expr = expr + (
            F.when(F.element_at(vv, i + 1) >= 0, F.lit(1 << i))
            .otherwise(F.lit(0))
            .cast("long")
        )
    return expr
