"""PII detection and redaction over a text column.

A training-data pipeline must strip personally-identifiable information
before a corpus ships; the reference has no such operator (its corpus is
product copy), so this is one of the engine's training-pipeline extensions
(same family as operators.dedup / operators.textstats).

Design: pure sequential ``regexp_replace`` / ``regexp_extract_all`` column
expressions — JVM-side, whole-stage-codegen'd, zero Python, zero shuffle.
Patterns are written in the common Java-regex/RE2 subset so the DuckDB
oracle can run the byte-identical patterns (DuckDB needs the 'g' flag; Spark
replaces globally by default).

Order matters (an SSN is a substring-shape of a phone number with different
grouping): rules apply in REDACTION_RULES order, and any SQL twin must apply
them in the same order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) applied strictly in order. \b and \d are
# supported by both Java regex and RE2.
REDACTION_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
)


def redact_pii(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    out_col: str = "redacted",
) -> DataFrame:
    """Return (id, <counts per rule>, redacted) — counts measured BEFORE any
    replacement mutates the text, then rules applied in order."""
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))).alias(f"n_{name}")
        for name, pat, _ in REDACTION_RULES
    ]
    red = F.col(text_col)
    for _, pat, repl in REDACTION_RULES:
        red = F.regexp_replace(red, pat, repl)
    return df.select(F.col(id_col).alias("id"), *counts, red.alias(out_col))


def pii_doc_flags(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """(id, has_pii) — the cheap filter-stage predicate: a doc has PII iff
    any rule matches. Same patterns, no replacement work."""
    any_hit = None
    for _, pat, _ in REDACTION_RULES:
        hit = F.regexp_like(F.col(text_col), F.lit(pat))
        any_hit = hit if any_hit is None else (any_hit | hit)
    return df.select(F.col(id_col).alias("id"), any_hit.alias("has_pii"))


def k_anonymity_violations(
    df: DataFrame,
    quasi_cols: list[str],
    *,
    k: int,
) -> DataFrame:
    """Quasi-identifier combinations re-identifiable under k-anonymity: the
    groups whose size is < k (Sweeney's criterion — every release cell must
    hide each individual among at least k−1 others). The complement of PII
    REDACTION (operators above): redaction strips direct identifiers;
    k-anonymity audits whether the remaining quasi-identifiers still
    single people out in combination.

    One exact groupBy over the quasi columns (map-side partials), report ∝
    violating combos — at 100 TB the released table aggregates once and
    the audit reads the group-size relation, never the rows. The exact
    count is the point (an HLL estimate could under-count a group of 1
    into invisibility), so this is deliberately NOT sketch-backed.
    Returns the violating combos with their sizes, smallest first."""
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count("*").alias("group_size"))
        .where(F.col("group_size") < k)
        .orderBy("group_size", *quasi_cols)
    )


def l_diversity_violations(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    *,
    l: int,
) -> DataFrame:
    """Quasi-identifier groups whose SENSITIVE attribute shows fewer than
    ``l`` distinct values (Machanavajjhala et al.'s l-diversity) — the
    attack k-anonymity misses: a group can hide k individuals yet leak the
    secret anyway if they all share one sensitive value (homogeneity
    attack). Same one-aggregate shape as the k audit, with an exact
    count-distinct per group; the report carries both the diversity count
    and the group size so the auditor sees k- and l-failures together."""
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.countDistinct(sensitive_col).alias("distinct_sensitive"),
            F.count("*").alias("group_size"),
        )
        .where(F.col("distinct_sensitive") < l)
        .orderBy("distinct_sensitive", "group_size", *quasi_cols)
    )


def t_closeness_violations(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col,
    *,
    t: float,
    round_dp: int = 6,
) -> DataFrame:
    """Quasi-identifier groups whose SENSITIVE-attribute distribution sits
    farther than ``t`` (total-variation distance) from the table-wide one
    (Li, Li & Venkatasubramanian 2007) — the attack l-diversity misses: a
    group can show l distinct sensitive values yet still leak ("every
    balance in this cell is in the top band" is a disclosure even when the
    bands differ). TV = ½·Σ|p_group − p_global| over the sensitive domain,
    the categorical special case of the paper's EMD.

    ``sensitive_col`` may be any Column expression (e.g. a banded
    balance), so numeric secrets audit through their release bands.

    Plan: ONE exact (quasi, sensitive) aggregate over the table; group
    totals, global marginals, and the grand total all derive from that
    cell relation (grouping-sized, never row-sized). Only cells PRESENT in
    a group appear, so the absent-value mass Σ_q|0 − q| telescopes to
    Σ q_absent = 1 − Σ_present q — one more aggregate over the same rows
    (the source_token_js trick). Distances quantize per cell to 9 dp and
    sum as exact DECIMAL, so the report replays in SQL at any
    partitioning. Exact by design, like the k/l audits: a sketch could
    smooth away exactly the skewed cell the audit exists to catch."""
    cells = df.groupBy(*quasi_cols, F.col(sensitive_col).alias("_s") if isinstance(sensitive_col, str) else sensitive_col.alias("_s")).agg(
        F.count("*").alias("o")
    )
    g_tot = cells.groupBy(*quasi_cols).agg(F.sum("o").alias("n_g"))
    glob = cells.groupBy("_s").agg(F.sum("o").alias("c_s"))
    n_tot = glob.agg(F.sum("c_s").alias("n_total"))
    p = F.col("o").cast("double") / F.col("n_g").cast("double")
    q = F.col("c_s").cast("double") / F.col("n_total").cast("double")
    dist = (
        cells.join(glob, "_s")
        .join(g_tot, quasi_cols)
        .crossJoin(F.broadcast(n_tot))
        .groupBy(*quasi_cols)
        .agg(
            F.any_value("n_g").alias("group_size"),
            F.round(
                (
                    F.sum(F.round(F.abs(p - q), 9).cast("decimal(28,12)"))
                    .cast("double")
                    + (
                        F.lit(1.0)
                        - F.sum(F.round(q, 9).cast("decimal(28,12)")).cast("double")
                    )
                )
                / F.lit(2.0),
                round_dp,
            ).alias("tv_distance"),
        )
    )
    return (
        dist.where(F.col("tv_distance") > t)
        .select(*quasi_cols, F.col("group_size").cast("long"), "tv_distance")
        .orderBy(F.desc("tv_distance"), *quasi_cols)
    )
