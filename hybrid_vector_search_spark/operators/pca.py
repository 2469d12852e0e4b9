"""PC1 via relational power iteration — embedding anisotropy in one number.

The first principal component's explained-variance share is the standard
embedding-health probe (anisotropic/collapsed embedding spaces score high;
Ethayarajh 2019, Mu & Viswanath 2018): a corpus whose PC1 explains most of
the variance has embeddings collapsing toward a line, and similarity search
over it degrades. Computing it needs exactly two distributed passes —

1. **Covariance relation** (i, j, c): per-dimension means and the full
   Gram accumulate as exact DECIMAL sums of 7-dp-quantized components in
   ONE aggregate each (the lineitem_correlations discipline, here over
   dim² pairs); C_ij = Σv_iv_j/n − μ_iμ_j is one double expression per
   cell. The relation is dim² rows (4096 at dim 64) — driver-free,
   broadcast-sized, and the ONLY thing the iteration touches.
2. **Power iteration** x ← Cx/‖Cx‖ as dim²-row joins: per step each
   product C_ij·x_j is rounded to ``dp`` decimals and summed as
   DECIMAL(38,dp) (associative), the norm is the same quantized ladder,
   and the normalized iterate re-quantizes to ``dp`` — so the whole
   fixpoint is engine-exact and replays as chained CTEs. λ₁ is the final
   iterate's ‖Cx‖ (the Rayleigh limit for a PSD matrix).

Scale: the corpus is touched exactly twice (means pass fused into the Gram
pass's aggregate), shuffling dim² partial sums per partition — never
vectors; the iteration is O(dim²) per step regardless of corpus size. The
embedding dim is assumed executor-tiny (true of every embedding model);
for dim in the thousands, swap the explicit pair explode for a BLAS
``applyInPandas`` Gram kernel per partition — same two-pass shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DP = 12
_DEC = f"decimal(38,{DP})"


def pc1_power_iteration(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    iterations: int = 8,
) -> DataFrame:
    """One row: (dim, n_vectors, lambda1, trace, explained_frac) for the
    dominant covariance eigenvalue of ``vec_col`` after ``iterations``
    power steps."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    pos = df.select(
        F.col(id_col).alias("rid"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "v"),
    ).select(
        "rid", "i", F.round(F.col("v"), 7).cast("decimal(18,7)").alias("v")
    )
    a = pos.select("rid", F.col("i").alias("ia"), F.col("v").alias("va"))
    b = pos.select("rid", F.col("i").alias("jb"), F.col("v").alias("vb"))
    gram = (
        a.join(b, "rid")
        .groupBy(F.col("ia").alias("i"), F.col("jb").alias("j"))
        .agg(F.count("*").alias("n"), F.sum(F.col("va") * F.col("vb")).alias("sp"))
    )
    means = pos.groupBy("i").agg(F.sum("v").alias("s"), F.count("*").alias("nn"))
    mu = means.select(
        "i", (F.col("s").cast("double") / F.col("nn").cast("double")).alias("mu")
    )
    cov = (
        gram.join(F.broadcast(mu), "i")
        .join(
            F.broadcast(mu.select(F.col("i").alias("j"), F.col("mu").alias("mu_j"))),
            "j",
        )
        .select(
            "i",
            "j",
            (
                F.col("sp").cast("double") / F.col("n").cast("double")
                - F.col("mu") * F.col("mu_j")
            ).alias("c"),
        )
        .localCheckpoint(eager=True)
    )
    dims = cov.select(F.col("i")).distinct()
    dim = dims.count()
    trace_df = (
        cov.where(F.col("i") == F.col("j"))
        .agg(
            F.sum(F.round(F.col("c"), DP).cast(_DEC)).cast("double").alias("trace")
        )
        .localCheckpoint(eager=True)
    )
    x = dims.select(
        F.col("i").alias("j"),
        F.lit(round(1.0 / dim**0.5, DP)).cast(_DEC).alias("x"),
    ).localCheckpoint(eager=True)
    nrm_df = None
    for _ in range(iterations):
        y = (
            cov.join(x, "j")
            .groupBy("i")
            .agg(
                F.sum(
                    F.round(F.col("c") * F.col("x").cast("double"), DP).cast(_DEC)
                ).alias("ydec")
            )
            .select("i", F.col("ydec").cast("double").alias("y"))
            .localCheckpoint(eager=True)
        )
        nrm_df = y.agg(
            F.sqrt(
                F.sum(F.round(F.col("y") * F.col("y"), DP).cast(_DEC)).cast("double")
            ).alias("nrm")
        ).localCheckpoint(eager=True)
        x = (
            y.crossJoin(F.broadcast(nrm_df))
            .select(
                F.col("i").alias("j"),
                F.round(F.col("y") / F.col("nrm"), DP).cast(_DEC).alias("x"),
            )
            .localCheckpoint(eager=True)
        )
    n_vectors = df.count()
    return (
        nrm_df.crossJoin(F.broadcast(trace_df))
        .select(
            F.lit(dim).cast("long").alias("dim"),
            F.lit(n_vectors).cast("long").alias("n_vectors"),
            F.round(F.col("nrm"), 6).alias("lambda1"),
            F.round(F.col("trace"), 6).alias("trace"),
            F.round(F.col("nrm") / F.col("trace"), 6).alias("explained_frac"),
        )
    )
