"""Deduplication operators for large-scale training-data pipelines.

The reference's only dedup-like behavior is skip-existing incrementality
(reference embed.py:95-96); a 100 TB corpus pipeline needs real content
dedup. This module implements the standard family, all as shuffle-conscious
DataFrame programs with engine-portable (md5-based) hashing so the DuckDB
oracle can verify them bit-for-bit:

- exact_dedup            — content-hash groupBy (the only corpus-wide shuffle
                           is on a 32-char hash, not the text)
- minhash_signatures     — MinHash (Broder 1997) over word-shingle sets
- lsh_candidates         — banded LSH self-join: candidate pairs share a band
- jaccard_pairs          — EXACT n-gram Jaccard via inverted-index join
                           (only overlapping pairs materialize — never O(n²))
- minhash_near_dups      — LSH candidates verified with exact Jaccard
- simhash                — SimHash fingerprints (Charikar 2002), tf-weighted
                           bit votes, no row explosion per bit
- embedding_near_dups    — cosine near-duplicate pairs over a vector column

Scale notes:
- Every pairwise operator is driven by an inverted index (shared shingle /
  shared LSH band), so the join fan-out is proportional to actual overlap,
  not n². Hot shingles (stopword-ish n-grams) are the skew risk; AQE skew
  join handles moderate skew, and `max_shingle_df` drops degenerate shingles
  (present in >X docs) exactly like real pipelines drop stopword shingles.
- Shingles are replaced by their md5 before any shuffle: fixed 32-byte keys
  instead of arbitrary-length text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import seeded_md5
from ..functions.text import shingles, tokens
from ..functions.vector import cosine


def normalized_text(c: Column) -> Column:
    """Whitespace/punctuation-insensitive canonical form for exact dedup."""
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Adds (content_hash, is_duplicate): a row is a duplicate iff another
    row with the same normalized content has a smaller id (the keeper)."""
    h = F.md5(normalized_text(F.col(text_col)))
    w = Window.partitionBy("content_hash")
    return (
        df.withColumn("content_hash", h)
        .withColumn(
            "is_duplicate", F.col(id_col) != F.min(id_col).over(w)
        )
    )


def shingle_table(
    df: DataFrame, id_col: str, text_col: str, *, n: int = 3
) -> DataFrame:
    """(id, sh) — md5 of each distinct word n-gram per document."""
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), n)).alias("shingle"),
    ).select("id", F.md5(F.col("shingle")).alias("sh"))


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig_0..sig_{H-1}) — one min-hash per seeded hash family member.

    One explode + one groupBy computing H mins at once (single shuffle,
    map-side partial min). Documents with no shingles are absent.
    """
    sh = shingle_table(df, id_col, text_col, n=shingle_n)
    mins = [
        F.min(seeded_md5(F.col("sh"), i)).alias(f"sig_{i}") for i in range(num_hashes)
    ]
    return sh.groupBy("id").agg(*mins)


def lsh_candidates(
    sigs: DataFrame, *, bands: int, rows_per_band: int
) -> DataFrame:
    """(id_a, id_b) distinct pairs sharing at least one LSH band.

    Band key = md5 of the concatenated signature slice; the self-join runs
    per band key — an equi-join on a 32-char key, shuffle ∝ bucket sizes.
    """
    num_hashes = bands * rows_per_band
    band_keys = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|", *[F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
                )
            )
            for b in range(bands)
        ]
    )
    for b in range(num_hashes):
        if f"sig_{b}" not in sigs.columns:
            raise ValueError(f"signatures missing sig_{b}; need {num_hashes} hashes")
    banded = sigs.select("id", F.posexplode(band_keys).alias("band", "key"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def jaccard_pairs(
    shingle_tbl: DataFrame,
    *,
    min_jaccard: float,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard over shingle sets for every overlapping pair.

    Inverted-index self-join on the shingle hash: intersection counts come
    from grouping the join output by pair; union = |A| + |B| − |A∩B|. Pairs
    with zero overlap never materialize (their Jaccard is 0 < threshold).
    ``max_shingle_df`` drops shingles occurring in more than that many
    documents before the join — the skew guard for stopword-ish shingles.
    """
    sh = shingle_tbl
    if max_shingle_df is not None:
        rare = (
            sh.groupBy("sh").agg(F.count("*").alias("c")).where(F.col("c") <= max_shingle_df)
        )
        sh = sh.join(rare.select("sh"), "sh")
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        )
        .where(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_jaccard: float = 0.7,
    bands: int = 4,
    rows_per_band: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash-LSH candidates verified by exact Jaccard — the standard
    two-phase near-dup pipeline (cheap recall phase, exact precision phase).
    """
    sigs = minhash_signatures(
        df, id_col, text_col, num_hashes=bands * rows_per_band, shingle_n=shingle_n
    )
    cands = lsh_candidates(sigs, bands=bands, rows_per_band=rows_per_band)
    sh = shingle_table(df, id_col, text_col, n=shingle_n)
    exact = jaccard_pairs(sh, min_jaccard=min_jaccard)
    return exact.join(cands, ["id_a", "id_b"], "left_semi")


def simhash(
    df: DataFrame, id_col: str, text_col: str, *, bits: int = 32
) -> DataFrame:
    """(id, simhash) — tf-weighted SimHash fingerprint as a bigint.

    Per (doc, token) the md5 nibbles are decoded once; the per-bit vote
    Σ tf·(2·bit−1) is computed as ``bits`` aggregate expressions in ONE
    groupBy — no per-bit row explosion, single shuffle keyed by doc id.
    """
    if bits % 4 != 0 or bits > 64:
        raise ValueError("bits must be a multiple of 4, ≤ 64")
    tok = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("token")
    )
    tf = tok.groupBy("id", "token").agg(F.count("*").cast("long").alias("tf"))
    h = F.md5(F.col("token"))
    nibbles = [
        (F.instr(F.lit("0123456789abcdef"), F.substring(h, i + 1, 1)) - 1).alias(f"nib_{i}")
        for i in range(bits // 4)
    ]
    tf = tf.select("id", "tf", *nibbles)
    votes = []
    for j in range(bits):
        bit = F.shiftright(F.col(f"nib_{j // 4}"), j % 4).bitwiseAND(F.lit(1))
        votes.append(F.sum(F.col("tf") * (2 * bit - 1)).alias(f"v_{j}"))
    voted = tf.groupBy("id").agg(*votes)
    fp = None
    for j in range(bits):
        term = F.when(F.col(f"v_{j}") > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp + term
    return voted.select("id", fp.alias("simhash"))


def embedding_near_dups(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    threshold: float,
    round_dp: int | None = 6,
) -> DataFrame:
    """(id_a, id_b, cos) pairs with cosine ≥ threshold.

    Exact all-overlapping-pairs scan (self-join on id_a < id_b). This is the
    O(n²) baseline — correct at any threshold, and the verifier for the
    approximate path. At 100 TB scale, run it only WITHIN candidate buckets
    produced by operators.ivf cluster assignment (same code, pre-grouped
    input), which turns n² into Σ bucket².
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    cos = cosine(F.col("va"), F.col("vb"))
    if round_dp is not None:
        cos = F.round(cos, round_dp)
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cos)
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
