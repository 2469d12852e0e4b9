"""Deterministic sampling and dataset splitting.

Training-data pipelines need REPRODUCIBLE sampling — the same rows selected
on every run, every engine, any partitioning. ``df.sample()`` can't promise
that (seeded per-partition RNG changes with the split layout), so these
operators derive selection from a content hash instead: a row is in the
sample iff a hash of its key lands under the rate. md5-based, so the DuckDB
oracle reproduces selections exactly, and so will any future engine.

- hash_bucket:   stable bucket in [0, buckets) from the key column
- sample:        keep rows whose bucket < rate·buckets (exact, stable)
- stratified_sample: per-stratum rates (e.g. downsample dominant languages)
- dataset_split: train/val/test assignment by hash range — a row's split
  NEVER changes as the corpus grows (critical: no leakage when re-running
  over an extended corpus)

Scale: all of these are stateless per-row expressions on top of the scan —
no shuffle, fully pushdown-compatible, safe at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000


def hash_bucket(key: Column, *, buckets: int = BUCKETS, salt: str = "") -> Column:
    """Stable bucket: first 8 md5 hex chars (32 bits) of salt#key, mod buckets."""
    h = F.md5(F.concat(F.lit(f"{salt}#"), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % buckets


def sample(
    df: DataFrame, key_col: str, rate: float, *, salt: str = "", buckets: int = BUCKETS
) -> DataFrame:
    """Deterministic ~rate sample, stable under reruns and repartitioning."""
    return df.where(hash_bucket(F.col(key_col), buckets=buckets, salt=salt) < int(rate * buckets))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, float],
    *,
    default_rate: float = 0.0,
    salt: str = "",
    buckets: int = BUCKETS,
) -> DataFrame:
    """Per-stratum deterministic rates (e.g. {'en': 0.1, 'de': 1.0})."""
    bucket = hash_bucket(F.col(key_col), buckets=buckets, salt=salt)
    thresh = F.lit(int(default_rate * buckets))
    for value, rate in sorted(rates.items()):
        thresh = F.when(F.col(stratum_col) == value, int(rate * buckets)).otherwise(thresh)
    return df.where(bucket < thresh)


def stratified_sample_exact(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    k: int,
    *,
    salt: str = "",
    method: str = "window",
) -> DataFrame:
    """EXACTLY min(k, |stratum|) rows per stratum, hash-ranked: rank rows
    within each stratum by md5(salt#key) (key as tiebreak) and keep the
    first k. The exact-count companion to the rate-based
    :func:`stratified_sample` — evaluation sets and per-language quota
    draws need "give me 10k per language", not "give me ≈0.1%".

    Deterministic and stable under corpus growth in the same sense as a
    rate: a row's RANK depends on what else is in its stratum, but the
    ORDERING never changes, so adding rows can only push tail rows out —
    never reshuffle the kept prefix arbitrarily.

    ``method`` picks the physical plan; both produce identical rows
    (equivalence pinned in tests/test_sampling.py):
    - ``"window"``: one exchange on stratum + window rank. Right for
      quota-sized k; but the shuffle carries EVERY row of every stratum,
      and a single stratum's rows land on one reducer — wrong when strata
      are huge or skewed.
    - ``"prerank"``: partition-local sort + streaming first-k-per-stratum
      Arrow prune (the knn_join TakeOrdered shape, knn.py:137), THEN the
      window over ≤ partitions·k rows per stratum. The shuffle carries at
      most partitions·k rows per stratum instead of the stratum — the
      100 TB / huge-k / skewed-stratum plan.
    """
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(f"{salt}#"), F.col(key_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(
        F.col("_hrk").asc(), F.col(key_col).asc()
    )
    keyed = df.withColumn("_hrk", h)
    if method == "prerank":
        keyed = _local_first_k_per_stratum(keyed, stratum_col, key_col, k)
    elif method != "window":
        raise ValueError(f"unknown method {method!r}")
    return (
        keyed.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk", "_hrk")
    )


def _local_first_k_per_stratum(
    keyed: DataFrame, stratum_col: str, key_col: str, k: int
) -> DataFrame:
    """Partition-local TakeOrdered: sortWithinPartitions (no exchange) then
    an Arrow pass keeping the first k rows per stratum per partition,
    carrying per-stratum counts across batch boundaries. Output is a
    superset of every stratum's global top-k (each global top-k row is in
    SOME partition's local top-k), so the downstream window is exact."""

    def _prune(batches):
        taken: dict = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            in_batch = pdf.groupby(stratum_col, sort=False).cumcount()
            offset = pdf[stratum_col].map(taken).fillna(0).astype("int64")
            keep = (in_batch + offset) < k
            counts = pdf.loc[keep, stratum_col].value_counts()
            for s, n in counts.items():
                taken[s] = taken.get(s, 0) + int(n)
            if keep.any():
                yield pdf.loc[keep]

    return keyed.sortWithinPartitions(
        stratum_col, F.col("_hrk").asc(), F.col(key_col).asc()
    ).mapInPandas(_prune, keyed.schema)


def weighted_sample_k(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    *,
    salt: str = "",
) -> DataFrame:
    """EXACTLY min(k, n) rows sampled WITHOUT replacement with probability
    proportional to ``weight_col`` — deterministically (same rows every run,
    every engine, any partitioning).

    Algorithm A-ES (Efraimidis & Spirakis 2006): give each row the key
    u^(1/w) for u ~ Uniform(0,1) and keep the k largest. Here u is not
    random but a stable hash — the first 32 bits of md5(salt#key) mapped
    into (0,1) — so selection is a pure function of (key, weight, salt),
    reproducible and md5-replayable by the SQL oracle. Ranked by the
    monotone-equivalent ln(u)/w (descending; avoids pow underflow for huge
    weights), key ascending as tiebreak.

    Scale: the score is a per-row expression on the scan; top-k is
    TakeOrdered (partition-local heads, no global sort) — one pass, no
    shuffle beyond k·partitions rows. Weights must be > 0; null/<=0 weights
    raise at runtime via an assertion column to fail loudly rather than
    silently excluding rows.
    """
    h = F.md5(F.concat(F.lit(f"{salt}#"), F.col(key_col).cast("string")))
    # (hash32 + 1) / (2^32 + 1): strictly inside (0,1) so ln() is finite
    u = (F.conv(F.substring(h, 1, 8), 16, 10).cast("double") + F.lit(1.0)) / F.lit(
        float(2**32 + 1)
    )
    w = F.col(weight_col).cast("double")
    score = F.when(
        w > 0, F.log(u) / w
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"weighted_sample_k: non-positive weight in {weight_col} for key "),
                F.col(key_col).cast("string"),
            )
        ).cast("double")
    )
    return (
        df.withColumn("_wsk", score)
        .orderBy(F.col("_wsk").desc(), F.col(key_col).asc())
        .limit(k)
        .drop("_wsk")
    )


def dataset_split(
    df: DataFrame,
    key_col: str,
    *,
    val_frac: float = 0.1,
    test_frac: float = 0.1,
    salt: str = "split",
    buckets: int = BUCKETS,
    split_col: str = "split",
) -> DataFrame:
    """Adds 'train'/'val'/'test' by fixed hash ranges: [0, val) → val,
    [val, val+test) → test, rest → train. Membership is a pure function of
    the key — growing the corpus never reassigns existing rows."""
    bucket = hash_bucket(F.col(key_col), buckets=buckets, salt=salt)
    v = int(val_frac * buckets)
    t = int(test_frac * buckets)
    split = (
        F.when(bucket < v, F.lit("val"))
        .when(bucket < v + t, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn(split_col, split)


def temperature_mixing(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    *,
    alpha: float = 0.3,
    salt: str = "mix",
    buckets: int = BUCKETS,
) -> DataFrame:
    """Temperature-flattened mixture sampling (the multilingual-corpus
    rebalancing of XLM-R / mT5; Dolma's per-source mixing weights): target
    share of stratum s ∝ (n_s)^alpha, realized WITHOUT upsampling by
    keeping each stratum at rate_s = (n_min / n_s)^(1 - alpha) — the
    smallest stratum keeps everything, dominant strata are flattened toward
    it. alpha=1 keeps the natural mixture, alpha=0 equalizes all strata.

    Selection stays hash-deterministic (same md5-bucket contract as
    :func:`sample`): membership is a pure function of (salt, key, the
    stratum census), so reruns and repartitioning never reshuffle the
    choice. Adds (n_stratum, keep_rate) for observability.

    Scale: one vocab-of-strata-sized census aggregate (map-side partials),
    broadcast back into a map-only filter — the corpus itself never
    shuffles, and the filter composes with scan pushdown of later stages.
    """
    census = df.groupBy(stratum_col).agg(F.count("*").alias("n_stratum"))
    n_min = census.agg(F.min("n_stratum").alias("n_min"))
    rates = census.join(F.broadcast(n_min)).select(
        stratum_col,
        "n_stratum",
        F.pow(F.col("n_min") / F.col("n_stratum"), F.lit(1.0 - alpha)).alias(
            "keep_rate"
        ),
    )
    bucket = hash_bucket(F.col(key_col), buckets=buckets, salt=salt)
    return (
        df.join(F.broadcast(rates), stratum_col)
        .where(bucket < F.floor(F.col("keep_rate") * buckets))
        .withColumn("keep_rate", F.round("keep_rate", 6))
    )
