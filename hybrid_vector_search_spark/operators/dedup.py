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
    return F.trim(F.regexp_replace(F.lower(c), r"[^\p{L}\p{N}]+", " "))


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
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    kernel: str = "pandas",
    hashed: bool = True,
    with_size: bool = False,
) -> DataFrame:
    """(id, sh) — each distinct word n-gram per document; ``sh`` is the
    gram's md5 by default (compact shuffle keys), or the raw gram text with
    ``hashed=False`` (corpus n-gram statistics).

    ``with_size=True`` additionally carries ``sz`` = the document's distinct
    shingle count on every row (r13 optimization): the Jaccard/containment
    consumers all need per-doc set sizes, and deriving them downstream costs
    a second aggregation pass over the shingle stream (one more shuffle AND
    one more run of this kernel, since the aggregate subtree cannot reuse
    the join subtree's exchange). The kernel already holds each doc's gram
    set, so the count rides along for 8 bytes/row.

    kernel="pandas" (default): tokenize + shingle + md5 inside a mapInPandas
    kernel — hashlib's C md5 and plain Python string ops beat the Catalyst
    higher-order-function interpreter ~5× on this shape (measured at sf0.1).
    Definitions are IDENTICAL to the SQL path (same regex, same md5 hex), so
    the DuckDB oracle match is unaffected.
    kernel="sql": pure-Catalyst baseline (functions.text.shingles), the
    cross-check for the fast path.
    """
    if kernel == "sql":
        arr = shingles(F.col(text_col), n)
        if with_size:
            out = df.select(
                F.col(id_col).alias("id"),
                F.explode(arr).alias("shingle"),
                F.size(arr).cast("long").alias("sz"),
            )
            sh = F.md5(F.col("shingle")) if hashed else F.col("shingle")
            return out.select("id", sh.alias("sh"), "sz")
        out = df.select(
            F.col(id_col).alias("id"),
            F.explode(arr).alias("shingle"),
        )
        sh = F.md5(F.col("shingle")) if hashed else F.col("shingle")
        return out.select("id", sh.alias("sh"))

    import hashlib
    import re
    from typing import Iterator

    import pandas as pd

    split = re.compile(r"[\W_]+")

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-task gram → md5 memo (guide §4.5): Zipfian gram frequencies
        # mean repeated grams across the partition's documents hash once.
        # md5(gram) is a pure function of the gram text, so the emitted
        # rows are bit-identical with or without the memo.
        memo: dict[str, str] = {}

        def gram_md5(g: str) -> str:
            h = memo.get(g)
            if h is None:
                h = hashlib.md5(g.encode("utf-8")).hexdigest()
                memo[g] = h
            return h

        for pdf in batches:
            ids: list = []
            hs: list[str] = []
            szs: list[int] = []
            for i, text in zip(pdf["id"], pdf["t"]):
                toks = [t for t in split.split((text or "").lower()) if t]
                grams = {
                    " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
                }
                for g in grams:
                    ids.append(i)
                    hs.append(gram_md5(g) if hashed else g)
                if with_size:
                    szs.extend([len(grams)] * len(grams))
            data = {"id": pd.Series(ids, dtype=pdf["id"].dtype), "sh": hs}
            if with_size:
                data["sz"] = pd.Series(szs, dtype="int64")
            yield pd.DataFrame(data)

    # fan the CPU-bound kernel across cores (single-split parquet otherwise
    # pins the whole corpus's hashing on one task)
    par = df.sparkSession.sparkContext.defaultParallelism
    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t")).repartition(par)
    schema = "id long, sh string" + (", sz long" if with_size else "")
    return src.mapInPandas(kern, schema)


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 8,
    shingle_n: int = 3,
    kernel: str = "pandas",
) -> DataFrame:
    """(id, sig_0..sig_{H-1}) — one min-hash per seeded hash family member.

    kernel="pandas" (default): the signature is a pure per-document function
    (min over the doc's own shingles), so it runs as a map-only Arrow kernel
    — no shuffle at all. kernel="sql": explode + one groupBy computing H
    mins at once (single shuffle, map-side partial min). Documents with no
    shingles are absent from either. Equality pinned in tests/test_kernels.
    """
    if kernel == "pandas":
        import hashlib
        import re
        from typing import Iterator

        import pandas as pd

        split = re.compile(r"[\W_]+")
        seeds = [f"{i}#".encode() for i in range(num_hashes)]

        def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # per-task gram → (seeded hex digests) memo (guide §4.5, the
            # simhash-kernel pattern): gram frequencies are Zipfian, so a
            # gram repeating across documents in the partition pays its
            # 1 + num_hashes md5 calls once. Values are a deterministic
            # function of the gram text alone — the signature min over
            # memoized rows is bit-identical to the unmemoized kernel
            # (pinned in tests/test_kernels.py).
            memo: dict[str, tuple] = {}

            def gram_sigs(g: str) -> tuple:
                row = memo.get(g)
                if row is None:
                    h = hashlib.md5(g.encode("utf-8")).hexdigest().encode()
                    row = tuple(hashlib.md5(s + h).hexdigest() for s in seeds)
                    memo[g] = row
                return row

            for pdf in batches:
                rows = []
                for i, text in zip(pdf["id"], pdf["t"]):
                    toks = [t for t in split.split((text or "").lower()) if t]
                    grams = {
                        " ".join(toks[j : j + shingle_n])
                        for j in range(len(toks) - shingle_n + 1)
                    }
                    if not grams:
                        continue
                    rows.append((i, *map(min, zip(*map(gram_sigs, grams)))))
                yield pd.DataFrame(
                    rows, columns=["id", *[f"sig_{i}" for i in range(num_hashes)]]
                )

        par = df.sparkSession.sparkContext.defaultParallelism
        src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t")).repartition(par)
        schema = "id long, " + ", ".join(f"sig_{i} string" for i in range(num_hashes))
        return src.mapInPandas(kern, schema)

    sh = shingle_table(df, id_col, text_col, n=shingle_n, kernel="sql")
    mins = [
        F.min(seeded_md5(F.col("sh"), i)).alias(f"sig_{i}") for i in range(num_hashes)
    ]
    return sh.groupBy("id").agg(*mins)


def lsh_candidates(
    sigs: DataFrame, *, bands: int, rows_per_band: int, max_bucket_size: int | None = None
) -> DataFrame:
    """(id_a, id_b) distinct pairs sharing at least one LSH band.

    Band key = md5 of the concatenated signature slice; the self-join runs
    per band key — an equi-join on a 32-char key, shuffle ∝ bucket sizes.

    ``max_bucket_size`` caps the quadratic blowup inside a single (band, key)
    bucket: the self-join emits m·(m−1)/2 pairs per m-member bucket, so a
    degenerate corpus (thousands of byte-identical or boilerplate docs all
    landing in one bucket) turns the candidate phase into O(m²). Buckets
    above the cap keep only their ``max_bucket_size`` smallest ids (rank by
    id inside the bucket — deterministic, and the survivors still pair with
    each other, so the duplicate GROUP is still discovered; dropped members
    are recovered transitively by the exact-verify + connected-components
    stage, which is how production near-dup pipelines bound this). This is
    the band-bucket analog of ``jaccard_pairs``'s ``max_shingle_df`` guard.
    """
    from pyspark.sql import Window

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
    if max_bucket_size is not None:
        # one extra shuffle on the SAME (band, key) the join shuffles on —
        # AQE coalesces the exchange reuse; rank, not count+filter, so the
        # pass is single-window and the survivors are deterministic.
        w = Window.partitionBy("band", "key").orderBy("id")
        banded = (
            banded.withColumn("_rk", F.row_number().over(w))
            .where(F.col("_rk") <= max_bucket_size)
            .drop("_rk")
        )
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

    When the input carries a ``sz`` column (``shingle_table(...,
    with_size=True)``) and no df cap is set, set sizes ride the join rows
    instead of being re-aggregated: the plan drops one groupBy(id) exchange
    and two size joins, and — because the aggregate subtree no longer exists
    — the shingle kernel runs once per side instead of once per side plus
    once for the sizes (r13; output identical, pinned in test_dedup).
    """
    sh = shingle_tbl
    if max_shingle_df is None and "sz" in sh.columns:
        a = sh.select(F.col("id").alias("id_a"), "sh", F.col("sz").alias("sz_a"))
        b = sh.select(F.col("id").alias("id_b"), "sh", F.col("sz").alias("sz_b"))
        inter = (
            a.join(b, ["sh"])
            .where(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b", "sz_a", "sz_b")
            .agg(F.count("*").alias("inter"))
        )
        return (
            inter.withColumn(
                "jaccard",
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
            )
            .where(F.col("jaccard") >= min_jaccard)
            .select("id_a", "id_b", "jaccard")
        )
    if max_shingle_df is not None:
        if "sz" in sh.columns:  # sizes must count post-filter shingles
            sh = sh.drop("sz")
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


def jaccard_pairs_between(
    base_sh: DataFrame,
    new_sh: DataFrame,
    *,
    min_jaccard: float,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Cross-corpus exact Jaccard — the INCREMENTAL dedup primitive: a new
    crawl snapshot is checked against the existing corpus, so the candidate
    space is base×new shared-shingle pairs ONLY — never new×new and never
    the base corpus against itself. At 100 TB the base side dwarfs every
    snapshot; re-pairing it per ingest would re-run the full corpus dedup,
    while this join's fan-out is bounded by the snapshot's shingle overlap.

    Same inverted-index shape as :func:`jaccard_pairs` (shuffles carry
    16-byte shingle hashes + ids, never text); ``max_shingle_df`` closes the
    stopword-shingle quadratic hole with the document frequency computed
    over the UNION of both sides (a shingle hot on either side floods the
    join). Inputs are ``shingle_table`` outputs. Output:
    (id_base, id_new, jaccard).

    As in :func:`jaccard_pairs`, inputs carrying ``sz`` (with no df cap)
    skip the two size re-aggregations — sizes ride the join (r13).
    """
    if (
        max_shingle_df is None
        and "sz" in base_sh.columns
        and "sz" in new_sh.columns
    ):
        a = base_sh.select(
            F.col("id").alias("id_base"), "sh", F.col("sz").alias("sz_base")
        )
        b = new_sh.select(
            F.col("id").alias("id_new"), "sh", F.col("sz").alias("sz_new")
        )
        inter = (
            a.join(b, ["sh"])
            .groupBy("id_base", "id_new", "sz_base", "sz_new")
            .agg(F.count("*").alias("inter"))
        )
        return (
            inter.withColumn(
                "jaccard",
                F.col("inter").cast("double")
                / (F.col("sz_base") + F.col("sz_new") - F.col("inter")).cast("double"),
            )
            .where(F.col("jaccard") >= min_jaccard)
            .select("id_base", "id_new", "jaccard")
        )
    if "sz" in base_sh.columns:
        base_sh = base_sh.drop("sz")
    if "sz" in new_sh.columns:
        new_sh = new_sh.drop("sz")
    if max_shingle_df is not None:
        rare = (
            base_sh.select("sh")
            .unionAll(new_sh.select("sh"))
            .groupBy("sh")
            .agg(F.count("*").alias("c"))
            .where(F.col("c") <= max_shingle_df)
            .select("sh")
        )
        base_sh = base_sh.join(rare, "sh")
        new_sh = new_sh.join(rare, "sh")
    sz_b = base_sh.groupBy("id").agg(F.count("*").alias("sz_base"))
    sz_n = new_sh.groupBy("id").agg(F.count("*").alias("sz_new"))
    a = base_sh.alias("a")
    b = new_sh.alias("b")
    inter = (
        a.join(b, F.col("a.sh") == F.col("b.sh"))
        .groupBy(F.col("a.id").alias("id_base"), F.col("b.id").alias("id_new"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sz_b.withColumnRenamed("id", "id_base"), "id_base")
        .join(sz_n.withColumnRenamed("id", "id_new"), "id_new")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_base") + F.col("sz_new") - F.col("inter")).cast("double"),
        )
        .where(F.col("jaccard") >= min_jaccard)
        .select("id_base", "id_new", "jaccard")
    )


# Chunked MinHash family (grouped_minhash_signatures): one seeded md5 per
# shingle yields FOUR independent 32-bit hash slots (hex digits [0:8], [8:16],
# [16:24], [24:32]) — slot 4k+j = chunk j of md5('k#' || gram). A quarter of
# the md5 calls of one-md5-per-slot, with full minwise mixing (a bounded
# multiply-shift family is NOT enough: with a < 2³⁰ the product never wraps
# the modulus, every slot's min collapses onto the min-x shingle, and
# pairwise estimates inflate — caught by test_estimate_tracks_true_jaccard).
MINHASH_SLOTS_PER_MD5 = 4


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    key_len: int = 24,
    window: int = 3,
    min_jaccard: float = 0.5,
    shingle_n: int = 3,
    round_dp: int = 6,
    passes: int = 1,
) -> DataFrame:
    """Sorted-Neighborhood Method (Hernández & Stolfo 1995) near-dup pass:
    sort by a cheap blocking key (normalized-text prefix), compare each doc
    only to its ``window`` successors in the sorted order, verify candidates
    with exact shingle Jaccard. The third dedup-blocking family next to
    LSH banding (minhash/simhash) and IVF buckets — linear candidate count
    (n·window·passes) with recall concentrated on docs whose *openings*
    match, which is exactly the re-crawl/boilerplate-copy shape.

    ``passes=2`` adds the standard multi-pass recall fix (the SNM analog of
    extra LSH bands): a second, independent sort key — the prefix of the
    REVERSED normalized text, i.e. the document's ending — catches
    near-dups whose openings differ (prepended headlines, bylines).
    Candidates from all passes union (distinct) BEFORE verification, so
    each surviving pair pays the Jaccard check once.

    Distributed ordering without a global window: each pass sorts per
    BUCKET (first character of its key), so each rank window is
    ``partitionBy(bucket)`` — no single-task global sort. Pairs that
    straddle a bucket boundary or differ in every pass's key region are
    still missed (more passes = more recall, same as more bands).
    Returned pairs are exact-verified, so precision is 1 by construction.
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^\p{L}\p{N}]+", " "))
    pass_keys = [norm.substr(1, key_len), F.reverse(norm).substr(1, key_len)]
    if not 1 <= passes <= len(pass_keys):
        raise ValueError(f"passes must be in [1, {len(pass_keys)}], got {passes}")

    def _candidates(key_expr) -> DataFrame:
        keys = df.select(
            F.col(id_col).alias("id"), key_expr.alias("key")
        ).withColumn("b", F.substring("key", 1, 1))
        rank_w = Window.partitionBy("b").orderBy("key", "id")
        ranked = keys.withColumn("rn", F.row_number().over(rank_w))
        offs = F.explode(F.array(*[F.lit(i) for i in range(1, window + 1)])).alias("off")
        left = ranked.select("b", "rn", F.col("id").alias("id_l"), offs)
        right = ranked.select(
            F.col("b").alias("b_r"), F.col("rn").alias("rn_r"), F.col("id").alias("id_r")
        )
        return left.join(
            right,
            (F.col("b") == F.col("b_r")) & (F.col("rn") + F.col("off") == F.col("rn_r")),
        ).select(
            F.least("id_l", "id_r").alias("id_a"),
            F.greatest("id_l", "id_r").alias("id_b"),
        )

    cand = _candidates(pass_keys[0])
    for key_expr in pass_keys[1:passes]:
        cand = cand.unionAll(_candidates(key_expr))
    cand = cand.distinct()
    # set sizes ride the shingle rows (with_size) — no groupBy(id)
    # re-aggregation, no size joins, one fewer shingle-kernel run (r13)
    sh = shingle_table(df, id_col, text_col, n=shingle_n, with_size=True)
    inter = (
        cand.join(
            sh.select(F.col("id").alias("id_a"), "sh", F.col("sz").alias("sa")),
            "id_a",
        )
        .join(
            sh.select(F.col("id").alias("id_b"), "sh", F.col("sz").alias("sb")),
            ["id_b", "sh"],
        )
        .groupBy("id_a", "id_b", "sa", "sb")
        .agg(F.count("*").alias("i"))
    )
    jac = inter.select(
        "id_a",
        "id_b",
        F.round(
            F.col("i").cast("double")
            / (F.col("sa") + F.col("sb") - F.col("i")).cast("double"),
            round_dp,
        ).alias("jaccard"),
    )
    return jac.where(F.col("jaccard") >= min_jaccard)


def grouped_minhash_signatures(
    df: DataFrame,
    group_col: str,
    text_col: str,
    *,
    num_hashes: int = 32,
    shingle_n: int = 3,
    kernel: str = "pandas",
) -> DataFrame:
    """One MinHash signature PER GROUP (e.g. per corpus source): sig_i is the
    min of hash-family member i over the union of all shingles of all texts
    in the group. Groups play the role docs play in `minhash_signatures` —
    the signature summarizes the group's whole shingle set, so two groups'
    signatures estimate the Jaccard overlap of entire sub-corpora
    ("does crawl-2024-06 substantially duplicate crawl-2024-05?") without
    ever materializing a cross-group shingle join.

    Hash family: slot 4k+j is the j-th 8-hex-digit chunk of md5('k#'||gram)
    as a 32-bit integer — num_hashes/4 md5 calls per shingle instead of
    num_hashes, with full minwise mixing (see MINHASH_SLOTS_PER_MD5 note),
    and exact integer arithmetic both engines can replay verbatim.

    kernel="pandas" (default): per-ROW signature mins inside a map-only
    Arrow kernel, then ONE groupBy(group) min-folds the row signatures —
    valid because min over the group's shingle union ≡ min over per-doc
    mins (associativity). kernel="sql": the pure-Catalyst explosion +
    H-min groupBy baseline the kernel is pinned against in tests.

    Either way the groupBy partial-aggregates map-side: the shuffle carries
    at most |groups|·H·partitions longs regardless of corpus size. Per-doc
    `array_distinct` is irrelevant to a min.
    """
    if num_hashes % MINHASH_SLOTS_PER_MD5:
        raise ValueError(f"num_hashes must be a multiple of {MINHASH_SLOTS_PER_MD5}")
    n_seeds = num_hashes // MINHASH_SLOTS_PER_MD5
    mins = [F.min(f"sig_{i}").alias(f"sig_{i}") for i in range(num_hashes)]
    if kernel == "pandas":
        import hashlib
        import re
        from typing import Iterator

        import numpy as np
        import pandas as pd

        split = re.compile(r"[\W_]+")
        seeds = [f"{k}#".encode() for k in range(n_seeds)]

        def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for g, text in zip(pdf["g"], pdf["t"]):
                    toks = [t for t in split.split((text or "").lower()) if t]
                    grams = {
                        " ".join(toks[j : j + shingle_n])
                        for j in range(len(toks) - shingle_n + 1)
                    }
                    if not grams:
                        continue
                    # digest bytes ARE the hex chunks big-endian: one
                    # frombuffer + column-min replaces 4 int-parses and a
                    # compare per (gram, slot) of Python
                    buf = b"".join(
                        hashlib.md5(s + gb).digest()
                        for gb in (gr.encode("utf-8") for gr in grams)
                        for s in seeds
                    )
                    arr = np.frombuffer(buf, dtype=">u4").reshape(len(grams), num_hashes)
                    rows.append((g, *arr.min(axis=0).astype(np.int64).tolist()))
                yield pd.DataFrame(
                    rows, columns=["g", *[f"sig_{i}" for i in range(num_hashes)]]
                )

        par = df.sparkSession.sparkContext.defaultParallelism
        src = df.select(F.col(group_col).alias("g"), F.col(text_col).alias("t")).repartition(par)
        schema = "g string, " + ", ".join(f"sig_{i} long" for i in range(num_hashes))
        return src.mapInPandas(kern, schema).groupBy("g").agg(*mins)

    per_row = df.select(
        F.col(group_col).cast("string").alias("g"),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("gram"),
    )
    sig_cols = []
    for k in range(n_seeds):
        hx = F.md5(F.concat(F.lit(f"{k}#"), F.col("gram")))
        for j in range(MINHASH_SLOTS_PER_MD5):
            sig_cols.append(
                F.conv(F.substring(hx, 8 * j + 1, 8), 16, 10)
                .cast("long")
                .alias(f"sig_{MINHASH_SLOTS_PER_MD5 * k + j}")
            )
    return per_row.select("g", *sig_cols).groupBy("g").agg(*mins)


def signature_jaccard_estimates(
    sig: DataFrame, *, num_hashes: int, round_dp: int = 6
) -> DataFrame:
    """All-pairs Jaccard ESTIMATES from MinHash signatures: the fraction of
    agreeing hash slots (the textbook unbiased estimator). Quadratic in the
    number of SIGNATURES — correct to call only on group-level signatures
    (sources, shards, crawls: tens-to-thousands of rows), never on per-doc
    signatures, where `lsh_candidates` is the sub-quadratic path.

    With num_hashes a power of two, k/num_hashes is exact in both binary and
    decimal, so `round(·, 6)` is the identity in Spark and DuckDB alike and
    the estimate is engine-portable bit-for-bit.
    """
    a, b = sig.alias("a"), sig.alias("b")
    n_agree = sum(
        F.when(F.col(f"a.sig_{i}") == F.col(f"b.sig_{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    return a.join(b, F.col("a.g") < F.col("b.g")).select(
        F.col("a.g").alias("g_a"),
        F.col("b.g").alias("g_b"),
        n_agree.cast("int").alias("n_agree"),
        F.round(n_agree.cast("double") / F.lit(float(num_hashes)), round_dp).alias(
            "est_jaccard"
        ),
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
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """MinHash-LSH candidates verified by exact Jaccard — the standard
    two-phase near-dup pipeline (cheap recall phase, exact precision phase).

    The verify is CANDIDATE-FIRST (r13): exact Jaccard is computed only for
    the pairs LSH surfaced — candidate pairs join the shingle relation, not
    the full inverted-index self-join filtered afterwards. Output-identical
    to the old exact-everything ∩ candidates shape (restricting before or
    after computing per-pair Jaccard commutes; pinned in test_dedup), but
    the work is ∝ candidates × shingles-per-doc instead of ∝ every
    co-shingle pair in the corpus — at 100 TB that is the difference
    between verifying what banding found and re-running the full O(Σ df²)
    join the sketch exists to avoid.

    ``max_bucket_size`` (default 1000) bounds the per-band-bucket self-join
    to ~500k pairs per degenerate bucket — see :func:`lsh_candidates`.
    """
    # signatures: map-only kernel (no shuffle); shingle table feeds only the
    # exact-Jaccard verify
    sigs = minhash_signatures(
        df, id_col, text_col, num_hashes=bands * rows_per_band, shingle_n=shingle_n
    )
    cands = lsh_candidates(
        sigs, bands=bands, rows_per_band=rows_per_band, max_bucket_size=max_bucket_size
    )
    sh = shingle_table(df, id_col, text_col, n=shingle_n, with_size=True)
    a = sh.select(F.col("id").alias("id_a"), "sh", F.col("sz").alias("sz_a"))
    b = sh.select(F.col("id").alias("id_b"), "sh", F.col("sz").alias("sz_b"))
    inter = (
        cands.join(a, "id_a")
        .join(b, ["id_b", "sh"])
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        )
        .where(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(
    df: DataFrame, id_col: str, text_col: str, *, bits: int = 32, kernel: str = "pandas"
) -> DataFrame:
    """(id, simhash) — tf-weighted SimHash fingerprint as a bigint.

    kernel="pandas" (default): SimHash is a pure per-document function, so
    the whole thing — tokenize, tf, md5 nibbles, bit votes — runs as a
    map-only Arrow kernel with ZERO shuffle (the sql path's explode+groupBy
    shuffles every token). NumPy nibble→bit lookup keeps the votes
    vectorized per token.

    kernel="sql": the pure-Catalyst twin — explode to (doc, token, tf), one
    groupBy computing ``bits`` vote sums as aggregate expressions (no
    per-bit row explosion). Equality pinned in tests/test_kernels.py.
    """
    if bits % 4 != 0 or bits > 64:
        raise ValueError("bits must be a multiple of 4, ≤ 64")
    if kernel == "pandas":
        return _simhash_pandas(df, id_col, text_col, bits)
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


def _simhash_pandas(df: DataFrame, id_col: str, text_col: str, bits: int) -> DataFrame:
    import hashlib
    import re
    from collections import Counter
    from typing import Iterator

    import numpy as np
    import pandas as pd

    split = re.compile(r"[\W_]+")
    # nibble value (0-15) → its 4 bits in md5_bit order (bit j of nibble
    # j//4 is (nib >> (j % 4)) & 1)
    nib_bits = np.array([[(v >> b) & 1 for b in range(4)] for v in range(16)], dtype=np.int64)
    n_nibbles = bits // 4
    powers = np.array([1 << j for j in range(bits)], dtype=np.int64)

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-task token → ±1 bit-vector memo (guide §4.5): the vocabulary
        # is Zipfian, so most token instances repeat within a partition —
        # hashing each DISTINCT token once cuts the md5 + nibble-decode
        # work by the corpus's type/token ratio. Values are deterministic
        # functions of the token, so memoization cannot change any vote.
        memo: dict[str, "np.ndarray"] = {}

        def tok_vec(tok: str) -> "np.ndarray":
            vec = memo.get(tok)
            if vec is None:
                h = hashlib.md5(tok.encode("utf-8")).hexdigest()
                nibs = np.fromiter(
                    (int(c, 16) for c in h[:n_nibbles]), dtype=np.int64, count=n_nibbles
                )
                vec = 2 * nib_bits[nibs].reshape(-1)[:bits] - 1
                memo[tok] = vec
            return vec

        for pdf in batches:
            out_ids, fps = [], []
            for i, text in zip(pdf["id"], pdf["t"]):
                toks = [t for t in split.split((text or "").lower()) if t]
                if not toks:
                    continue  # sql twin has no row either (explode of empty)
                votes = np.zeros(bits, dtype=np.int64)
                for tok, tf in Counter(toks).items():
                    votes += tf * tok_vec(tok)
                out_ids.append(i)
                fps.append(int(powers[votes > 0].sum()))
            yield pd.DataFrame({"id": pd.Series(out_ids, dtype="int64"), "simhash": pd.Series(fps, dtype="int64")})

    par = df.sparkSession.sparkContext.defaultParallelism
    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t")).repartition(par)
    return src.mapInPandas(kern, "id long, simhash long")


def embedding_near_dups(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    threshold: float,
    round_dp: int | None = 6,
    kernel: str = "block",
    n_blocks: int | None = None,
    broadcast_limit: int = 200_000,
) -> DataFrame:
    """(id_a, id_b, cos) pairs with cosine ≥ threshold (exact, all pairs).

    kernel="block" (default, the scale path): rows are hashed into B blocks;
    every block pair (bi ≤ bj) becomes one applyInPandas group that computes
    its sub-matrix product with BLAS and emits only pairs over threshold.
    Exact all-pairs — every candidate pair is scored in exactly one group —
    with NO driver-side materialization: the shuffle replicates each row
    ~(B+1)× (B ≈ √(2·parallelism), so single-digit), and group size is
    (n/B)² flops, executor-bounded. This is the blocked all-pairs layout a
    100 TB run needs; to go sub-quadratic, pre-group by IVF cluster
    (operators.ivf) and call this per bucket.

    kernel="numpy": one side L2-normalized into a single NumPy matrix and
    broadcast to every partition; A_batch @ Bᵀ per Arrow batch. Fastest for
    small corpora but materializes the vector side on the driver — guarded
    by ``broadcast_limit`` rows (raises with the blocked recipe beyond it).

    kernel="sql": the pure-Catalyst self-join baseline (higher-order-function
    cosine per pair) — the verifier for the fast paths.
    """
    if kernel == "sql":
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

    from typing import Iterator

    import numpy as np
    import pandas as pd

    if kernel == "block":
        spark = df.sparkSession
        if n_blocks is None:
            par = spark.sparkContext.defaultParallelism
            n_blocks = max(2, int(np.ceil(np.sqrt(2 * par))))
        B = int(n_blocks)
        src = df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            F.pmod(F.hash(F.col(id_col)), F.lit(B)).alias("blk"),
        )
        pairs = spark.createDataFrame(
            [(i, j) for i in range(B) for j in range(i, B)], "bi int, bj int"
        )
        a_part = src.join(F.broadcast(pairs), F.col("blk") == F.col("bi")).select(
            "bi", "bj", "id", "v", F.lit("a").alias("side")
        )
        b_part = src.join(F.broadcast(pairs), F.col("blk") == F.col("bj")).select(
            "bi", "bj", "id", "v", F.lit("b").alias("side")
        )

        def block_kern(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            bi, bj = key
            a_pdf = pdf[pdf["side"] == "a"]
            b_pdf = pdf[pdf["side"] == "b"]
            if not len(a_pdf) or not len(b_pdf):
                return pd.DataFrame({"id_a": [], "id_b": [], "cos": []}).astype(
                    {"id_a": "int64", "id_b": "int64", "cos": "float64"}
                )
            a_ids = a_pdf["id"].to_numpy()
            b_ids = b_pdf["id"].to_numpy()
            a = np.stack([np.asarray(v, dtype=np.float64) for v in a_pdf["v"]])
            b = np.stack([np.asarray(v, dtype=np.float64) for v in b_pdf["v"]])
            a /= np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-300)
            b /= np.maximum(np.linalg.norm(b, axis=1, keepdims=True), 1e-300)
            sims = a @ b.T
            if round_dp is not None:
                sims = np.round(sims, round_dp)
            hit = sims >= threshold
            if bi == bj:
                # same block on both sides: each unordered pair appears in
                # both orders — keep exactly the ascending one
                hit &= a_ids[:, None] < b_ids[None, :]
                ai, bjx = np.nonzero(hit)
                lo, hi = a_ids[ai], b_ids[bjx]
            else:
                # disjoint blocks: each pair appears exactly once — keep it
                # regardless of id order, normalized to (min, max)
                ai, bjx = np.nonzero(hit)
                x, y = a_ids[ai], b_ids[bjx]
                lo, hi = np.minimum(x, y), np.maximum(x, y)
            return pd.DataFrame({"id_a": lo, "id_b": hi, "cos": sims[ai, bjx]})

        return (
            a_part.unionByName(b_part)
            .groupBy("bi", "bj")
            .applyInPandas(block_kern, "id_a long, id_b long, cos double")
        )

    # kernel == "numpy": driver-side broadcast of the vector side — guarded.
    side = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .limit(broadcast_limit + 1)
        .toPandas()
    )
    if len(side) > broadcast_limit:
        raise ValueError(
            f"kernel='numpy' materializes the vector side on the driver and the "
            f"corpus exceeds broadcast_limit={broadcast_limit} rows. Use the "
            f"default kernel='block' (exact, distributed), or pre-group by IVF "
            f"cluster (operators.ivf.build_ivf) and run per bucket."
        )
    b_ids = side["id"].to_numpy()
    b_mat = np.stack([np.asarray(v, dtype=np.float64) for v in side["v"]])
    b_mat /= np.maximum(np.linalg.norm(b_mat, axis=1, keepdims=True), 1e-300)
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((b_ids, b_mat))

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_b, mat_b = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            a_ids = pdf["id"].to_numpy()
            a = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            a /= np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-300)
            sims = a @ mat_b.T
            if round_dp is not None:
                sims = np.round(sims, round_dp)
            ai, bj = np.nonzero((sims >= threshold) & (a_ids[:, None] < ids_b[None, :]))
            yield pd.DataFrame(
                {"id_a": a_ids[ai], "id_b": ids_b[bj], "cos": sims[ai, bj]}
            )

    out_schema = "id_a long, id_b long, cos double"
    return (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .mapInPandas(kern, out_schema)
    )


def embedding_near_dups_ivf(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    threshold: float,
    n_clusters: int = 8,
    nprobe: int = 2,
    seed: int = 42,
    round_dp: int | None = 6,
    kmeans_max_iter: int = 20,
) -> DataFrame:
    """Sub-quadratic embedding near-dup: the scale sibling of the exact
    :func:`embedding_near_dups` (which is O(n²) flops by definition). This
    is the "pre-group by IVF cluster, run per bucket" recipe implemented:

    - KMeans (seeded) fits ``n_clusters`` centroids on the vectors;
    - each row is assigned to its ``nprobe`` nearest centroids (multi-probe
      assignment: a pair is compared iff the two rows SHARE a bucket, so
      boundary pairs survive as long as one of their probes overlaps);
    - each bucket computes its exact all-pairs cosine with the same BLAS
      shape as the block kernel, emitting only pairs over threshold;
    - pairs found in several shared buckets dedup with one tiny distinct
      over (id_a, id_b, cos) — cos is identical wherever the pair appears.

    Cost: Σ_b (|bucket_b|·nprobe/n_clusters-ish)² flops instead of n² —
    sub-quadratic while clusters stay balanced, and each bucket group is
    executor-bounded. Recall < 1 is possible (a pair split across disjoint
    probe sets is missed); it is MEASURED against the exact kernel in
    tests/test_dedup_ivf.py, never assumed — same policy as the ANN paths.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    nprobe = max(1, min(nprobe, n_clusters))
    spark = df.sparkSession
    src = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    feat = src.withColumn("_features", array_to_vector(F.col("v").cast("array<double>")))
    # kmeans_max_iter trades bucket balance for fit time; correctness never
    # depends on it (soundness is re-verified per pair, and nprobe ==
    # n_clusters is exact under ANY centroids), only recall/balance do
    km = KMeans(
        k=n_clusters, seed=seed, maxIter=kmeans_max_iter,
        featuresCol="_features", predictionCol="_c",
    )
    centroids = np.array(
        [np.asarray(c) for c in km.fit(feat).clusterCenters()], dtype=np.float64
    )
    bc = spark.sparkContext.broadcast(centroids)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = bc.value  # (k, dim)
        for pdf in batches:
            if not len(pdf):
                continue
            a = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            # euclidean assignment (KMeans' own geometry): argpartition the
            # nprobe nearest centroids per row
            d2 = ((a[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            near = np.argpartition(d2, nprobe - 1, axis=1)[:, :nprobe]
            out = pdf.loc[pdf.index.repeat(nprobe), ["id", "v"]].reset_index(drop=True)
            out["bucket"] = near.reshape(-1).astype("int64")
            yield out

    # mirror the INPUT element type in the re-emitted vector column: declaring
    # a fixed array<float> here would silently downcast array<double> vectors
    # to float32 before the bucket cosine kernel, breaking the exact-subset
    # contract (cosines would differ from embedding_near_dups at the 6-dp
    # rounding boundary) for double-precision corpora
    elem = src.schema["v"].dataType.elementType.simpleString()
    assigned = src.mapInPandas(assign, f"id long, v array<{elem}>, bucket long")

    def bucket_kern(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy()
        a = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
        a /= np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-300)
        sims = a @ a.T
        if round_dp is not None:
            sims = np.round(sims, round_dp)
        hit = (sims >= threshold) & (ids[:, None] < ids[None, :])
        ai, bj = np.nonzero(hit)
        return pd.DataFrame({"id_a": ids[ai], "id_b": ids[bj], "cos": sims[ai, bj]})

    return (
        assigned.groupBy("bucket")
        .applyInPandas(bucket_kern, "id_a long, id_b long, cos double")
        .distinct()  # pair may surface in up to nprobe shared buckets
    )


def duplicate_spans(
    df: DataFrame, id_col: str, text_col: str, *, n: int = 5
) -> DataFrame:
    """Cross-document duplicated-span profile (exact-substring-dedup proxy,
    the shingle-counting flavor of RefinedWeb/CCNet rather than a suffix
    array — a published, shuffle-friendly approximation).

    For each document: the number of distinct word n-grams it contains, how
    many of those also occur in at least one OTHER document, and the
    duplicated fraction. Downstream policies drop or trim docs whose
    duplicated fraction exceeds a threshold.

    Plan shape: one shingle explosion (md5 keys), then a COUNT window over
    each shingle's partition — one corpus-wide shuffle on 32-char keys — and
    a per-doc aggregate. (The window replaces a groupBy(shingle)+self-join,
    which shuffles the shingle relation twice; measured ~30% faster at
    sf0.1.) At 100 TB the shingle relation is the big mover;
    `shingle_table`'s `max_shingle_df`-style stopword guard applies
    upstream if hot n-grams dominate.
    """
    sh = shingle_table(df, id_col, text_col, n=n)
    w = Window.partitionBy("sh")
    return (
        sh.withColumn("n_docs", F.count("*").over(w))
        .groupBy("id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)).alias("n_shared"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_shingles",
            "n_shared",
            F.round(F.col("n_shared") / F.col("n_shingles"), 6).alias("dup_frac"),
        )
    )


def _span_table(
    df: DataFrame, id_col: str, text_col: str, span_tokens: int, kernel: str
) -> DataFrame:
    """(id, span_idx, s, h) — each document's disjoint ``span_tokens``-token
    spans with their md5. kernel="pandas" (default for span_dedup) tokenizes
    each doc ONCE in an Arrow kernel; the "sql" baseline's higher-order
    expression re-evaluates the tokenizer per span element inside the
    transform lambda (Catalyst doesn't CSE across lambda invocations), which
    is O(spans × tokens) per document — measured ~2× slower at sf0.1.
    Definitions are identical (same regex, same md5), pinned equal in
    tests/test_span_dedup.py."""
    if kernel == "sql":
        toks = tokens(F.col(text_col))
        n_sp = F.ceil(F.size(toks) / F.lit(span_tokens)).cast("int")
        idx = F.when(n_sp >= 1, F.sequence(F.lit(0), n_sp - 1)).otherwise(
            F.array().cast("array<int>")
        )
        spans = F.transform(
            idx,
            lambda i: F.struct(
                i.alias("span_idx"),
                F.array_join(
                    F.slice(toks, i * span_tokens + 1, span_tokens), " "
                ).alias("s"),
            ),
        )
        return (
            df.select(F.col(id_col).alias("id"), F.explode(spans).alias("sp"))
            .select(
                "id",
                F.col("sp.span_idx").alias("span_idx"),
                F.col("sp.s").alias("s"),
            )
            .withColumn("h", F.md5("s"))
        )

    import hashlib
    import re
    from typing import Iterator

    import pandas as pd

    split = re.compile(r"[\W_]+")

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            idxs: list[int] = []
            ss: list[str] = []
            hs: list[str] = []
            for i, text in zip(pdf["id"], pdf["t"]):
                toks = [t for t in split.split((text or "").lower()) if t]
                for j in range(0, len(toks), span_tokens):
                    s = " ".join(toks[j : j + span_tokens])
                    ids.append(i)
                    idxs.append(j // span_tokens)
                    ss.append(s)
                    hs.append(hashlib.md5(s.encode("utf-8")).hexdigest())
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype=pdf["id"].dtype),
                    "span_idx": pd.Series(idxs, dtype="int32"),
                    "s": ss,
                    "h": hs,
                }
            )

    par = df.sparkSession.sparkContext.defaultParallelism
    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t")).repartition(par)
    return src.mapInPandas(kern, "id long, span_idx int, s string, h string")


def span_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    span_tokens: int = 8,
    kernel: str = "pandas",
) -> DataFrame:
    """C4-style duplicate-SPAN removal (Raffel et al. 2020 drop repeated
    three-sentence spans; Dolma's paragraph dedup is the same shape): cut
    each document into disjoint ``span_tokens``-token spans, keep only the
    globally FIRST occurrence of every span (ordered by (id, span_idx)),
    and re-assemble what survives. Unlike :func:`duplicate_spans` (a
    per-doc duplication profile) this is the TRANSFORM — boilerplate that
    recurs across the corpus is deleted from all but one document.

    Output per doc: (id_col, n_spans, n_kept, kept_md5) where kept_md5
    fingerprints the kept spans joined in document order — enough for the
    oracle to hash-check the exact post-removal text without shipping it.

    Plan shape (scale notes): the span relation shuffles ONCE on the span's
    md5 for the first-occurrence election — a groupBy computing min(id,
    span_idx) per hash, which partial-aggregates map-side, so a corpus-hot
    span (the skew risk) collapses to one candidate per input partition
    BEFORE the exchange; the flagging join back on the hash is then
    AQE-skew-splittable. (A row_number window would be one exchange fewer
    but funnels every occurrence of a hot span through a single task's
    sort.) The span relation is rebuilt for each of its two consumers —
    recomputing a map-side Arrow kernel beats persisting span text or
    dragging it through an extra exchange. Re-assembly is one groupBy(id)
    carrying only kept spans.
    """
    sp = _span_table(df, id_col, text_col, span_tokens, kernel)
    firsts = sp.groupBy("h").agg(
        F.min(F.struct("id", "span_idx")).alias("first")
    )
    flagged = sp.join(firsts, "h").withColumn(
        "kept",
        (F.col("id") == F.col("first.id"))
        & (F.col("span_idx") == F.col("first.span_idx")),
    )
    per_doc = flagged.groupBy("id").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.filter(
                        F.array_sort(F.collect_list(F.struct("span_idx", "kept", "s"))),
                        lambda x: x["kept"],
                    ),
                    lambda x: x["s"],
                ),
                " ",
            )
        ).alias("kept_md5"),
    )
    return per_doc.select(
        F.col("id").alias(id_col), "n_spans", "n_kept", "kept_md5"
    )


def canonicalize(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    id_col: str = "doc_id",
    *,
    length_col: str = "n_chars",
    components: DataFrame | None = None,
) -> DataFrame:
    """Near-duplicate cluster canonicalization: given the doc table and the
    verified near-dup pair list (id_a, id_b), label EVERY document with the
    id of its cluster's canonical representative (longest doc wins, ties to
    the smallest id — the keep-best policy real pipelines apply after LSH)
    and whether it is the kept copy.

    Composition: connected components over the pair graph (operators.graph,
    O(log n) rounds), then one window over the clustered docs to elect the
    canonical, then a left join back onto the corpus. The canonical map has
    one row per clustered doc — small relative to the corpus but growing
    with it, so the join carries no broadcast hint: AQE broadcasts it while
    it measures small and shuffles on the id key at scale.

    ``components`` (a precomputed (node, component) relation) skips the
    closure entirely — the materialize-once shape: at 100 TB the component
    fixpoint is a job of its own whose output every downstream consumer
    (canonical election, cluster audits, purge lists) reads as a table,
    instead of each recomputing shingles → pairs → O(log n) join rounds.
    """
    if (pairs is None) == (components is None):
        raise ValueError("pass exactly one of pairs= or components=")
    if components is None:
        from .graph import connected_components

        edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        comp = connected_components(edges)
    else:
        comp = components.select("node", "component")

    clustered = comp.join(
        docs.select(F.col(id_col).alias("node"), F.col(length_col).alias("_len")),
        "node",
    )
    w = Window.partitionBy("component").orderBy(
        F.col("_len").desc(), F.col("node").asc()
    )
    canon = (
        clustered.withColumn("_canon", F.first("node").over(w))
        .select(F.col("node").alias(id_col), F.col("_canon"))
    )
    return (
        docs.select(id_col)
        .join(canon, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("_canon"), F.col(id_col)).alias("canonical_id"),
            (F.coalesce(F.col("_canon"), F.col(id_col)) == F.col(id_col)).alias(
                "is_kept"
            ),
        )
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance, discovered with
    band-bucketing (the fingerprint-side analog of MinHash LSH): the
    ``bits``-bit fingerprint splits into ``bands`` equal slices, and by
    pigeonhole any pair with Hamming distance ≤ bands-1 shares at least one
    identical slice — so with the defaults (4 bands, max_hamming 3) the
    banded join is EXACT, not approximate.

    Plan shape: one map-only fingerprint pass (simhash pandas kernel), a
    bands-way explode of fixed-width slice keys, a self-join on (band, key)
    — the only shuffle, proportional to slice collisions, never n² — then
    an exact popcount filter. Degenerate key skew (constant docs) is the
    same failure mode as lsh_candidates and takes the same bucket-size cap
    upstream if a corpus needs it.
    """
    if bits % bands != 0:
        raise ValueError("bits must divide evenly into bands")
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    fp = simhash(df, id_col, text_col, bits=bits)
    slices = fp.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select(
        "id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    a, b = slices.alias("a"), slices.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("id_a", "id_b", ham.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


def edit_distance_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_edits: int = 16,
    bands: int = 4,
    rows_per_band: int = 2,
    shingle_n: int = 3,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Bounded-edit-distance near-dups: the LSH recall phase of
    :func:`minhash_near_dups` with an exact Levenshtein precision phase —
    the sixth similarity tier (exact / Jaccard / MinHash / SimHash /
    embedding / EDIT DISTANCE), the right one when "duplicate" means
    character-level revisions (typo fixes, boilerplate tweaks) rather than
    token-set overlap.

    The quadratic hole is the verify kernel, not the pair count: plain
    Levenshtein is O(len_a·len_b) PER PAIR, ruinous on book-length
    documents. Spark's thresholded ``levenshtein(a, b, t)`` runs the
    banded DP that early-exits past ``t`` edits — O(max_edits·len), and
    returns -1 above the bound, so the engine never pays for distances it
    will discard. Candidates come pre-bounded by the LSH phase
    (band-bucketed, ``max_bucket_size``-guarded), and only candidate rows
    ever re-join the text column — the corpus text never self-joins.

    Returns (id_a, id_b, edits) with edits ≤ max_edits, id_a < id_b.
    """
    sigs = minhash_signatures(
        df, id_col, text_col, num_hashes=bands * rows_per_band, shingle_n=shingle_n
    )
    cands = lsh_candidates(
        sigs, bands=bands, rows_per_band=rows_per_band, max_bucket_size=max_bucket_size
    )
    ta = df.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("_ta"))
    tb = df.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("_tb"))
    return (
        cands.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.levenshtein("_ta", "_tb", max_edits).alias("edits"),
        )
        .where(F.col("edits") >= 0)
    )


def jaccard_pairs_prefix(
    shingle_tbl: DataFrame,
    *,
    min_jaccard: float,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """:func:`jaccard_pairs` with PREFIX FILTERING (Chaudhuri et al.,
    SSJoin; Bayardo et al., "Scaling Up All Pairs Similarity Search") —
    identical output, provably, with a far smaller inverted-index join.

    Under a global token order, two sets with Jaccard ≥ t MUST share a
    token inside each other's first ``|r| − ⌈t·|r|⌉ + 1`` tokens (if all
    common tokens hid in r's last ⌈t·|r|⌉ − 1 positions, the intersection
    would be < t·|r| ≤ t·max ≤ I — contradiction). So only PREFIX tokens
    are indexed, and ordering the tokens rare-first makes those prefixes
    the set's LOWEST-frequency tokens — the inverted-index fan-out
    collapses to the smallest buckets, which is exactly where the plain
    self-join spends its shuffle. Candidates are then verified with the
    same exact intersection arithmetic, anchored to the candidate pair
    list instead of the full index — shuffles ∝ candidates, never all
    shared-token pairs.

    At t = 0.7 the prefix is ~30% of each set, drawn entirely from rare
    tokens; the stopword-ish high-df shingles that ``max_shingle_df``
    guards against are never indexed at all (they sort last). Equivalence
    to :func:`jaccard_pairs` is pinned in tests and by the shared driver
    oracle (`ngram_jaccard_prefix` hash-matches the plain plan's SQL).

    Precision note: both plans filter the UNROUNDED double division
    ``inter/union >= t``, so the only theoretical gap vs the integer
    prefix lemma is the 1-double-ulp case where the division rounds up
    across t while exact I/U < t and I < ceil(t*max) — unlike the
    6-dp-rounded containment filter closed in r12 (a 5e-7 window), and
    both plans compute the identical division, so they cannot diverge
    from each other on any accepted pair.
    """
    sh = shingle_tbl
    if max_shingle_df is not None:
        rare = (
            sh.groupBy("sh").agg(F.count("*").alias("c")).where(F.col("c") <= max_shingle_df)
        )
        sh = sh.join(rare.select("sh"), "sh")
    # the prefix plan reads the shingle relation from SEVEN subtrees (df
    # ranking, sizes, both prefix sides, both verify sides, final sizes);
    # persist it so the explode runs once — the at-scale analog is the
    # materialized shingle index prefix filtering presumes anyway. A
    # caller-persisted input is respected (pass a cached table to own the
    # lifecycle, as the equality tests do); a table persisted here lives at
    # MEMORY_AND_DISK until the session evicts it.
    if not (sh.storageLevel.useMemory or sh.storageLevel.useDisk):
        sh = sh.persist()
    dfreq = sh.groupBy("sh").agg(F.count("*").alias("df"))
    ranked = sh.join(dfreq, "sh").withColumn(
        "pos",
        F.row_number().over(Window.partitionBy("id").orderBy("df", "sh")),
    )
    sizes = ranked.groupBy("id").agg(F.count("*").alias("sz"))
    prefix = (
        ranked.join(sizes, "id")
        .where(
            F.col("pos")
            <= F.col("sz") - F.ceil(F.lit(min_jaccard) * F.col("sz")) + 1
        )
        .select("id", "sh")
    )
    pa = prefix.join(sizes, "id").select(
        F.col("id").alias("id_a"), "sh", F.col("sz").alias("_za")
    )
    pb = prefix.join(sizes, "id").select(
        F.col("id").alias("id_b"), "sh", F.col("sz").alias("_zb")
    )
    # length filter (All-Pairs): J(a,b) >= t forces t·|a| <= |b| <= |a|/t —
    # applied inside the prefix join so out-of-range pairs never group
    cands = (
        pa.join(pb, "sh")
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.col("_zb") >= F.ceil(F.lit(min_jaccard) * F.col("_za")))
            & (F.col("_zb") <= F.floor(F.col("_za") / F.lit(min_jaccard)))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    # exact verify anchored to the candidate list: intersection counts via
    # two id-joins against the full shingle table
    fa = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("_sa"))
    fb = sh.select(F.col("id").alias("_idb"), F.col("sh").alias("_sb"))
    inter = (
        cands.join(fa, "id_a")
        .join(
            fb,
            (F.col("id_b") == F.col("_idb")) & (F.col("_sa") == F.col("_sb")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    sz = sh.groupBy("id").agg(F.count("*").alias("sz"))
    sa = sz.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sz.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
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


def containment_pairs_prefix(
    shingle_tbl: DataFrame,
    *,
    min_containment: float,
) -> DataFrame:
    """Asymmetric n-gram CONTAINMENT pairs — |A∩B|/|A| and |A∩B|/|B| for
    every unordered pair where EITHER direction ≥ ``min_containment`` —
    with prefix filtering, so the inverted-index join never goes quadratic
    on stopword-ish shingles. Output is provably identical to the naive
    full self-join (grouping all shared-shingle pairs), pinned in
    tests/test_jaccard_prefix.py and by the `ngram_containment_pairs`
    driver oracle.

    The prefix lemma, containment form: a pair qualifies iff
    i ≥ t·min(|A|,|B|) (the easier direction is always the smaller set).
    Under a global shingle order, if |A∩B| ≥ t·|A| then A's first
    |A| − ⌈t·|A|⌉ + 1 shingles must intersect B — if all common shingles
    hid in A's last ⌈t·|A|⌉ − 1 positions, i < t·|A|, contradiction. So
    candidates are the join of the MIN side's prefix against the other
    side's full postings (`_zp <= _zf` keeps only that direction), and
    rare-first ordering makes prefixes the lowest-frequency shingles —
    high-df shingles sort last and are (almost) never indexed. Unlike
    Jaccard there is no upper length bound (a snippet is contained in an
    arbitrarily larger source), which is exactly why this query exists
    beside jaccard_pairs_prefix.

    Candidates are then verified with exact intersection counts anchored
    to the candidate list: shuffles ∝ candidates + postings, never
    all-shared-shingle pairs — the shape that survives a corpus where
    some trigram appears in half the documents.

    The shingle relation is read from several subtrees, so it is persisted
    here UNLESS the caller already persisted it — pass a cached table to
    own the lifecycle (the equality tests do exactly that); otherwise the
    blocks live at MEMORY_AND_DISK until the session evicts them.
    """
    t = float(min_containment)
    sh = shingle_tbl
    if not (sh.storageLevel.useMemory or sh.storageLevel.useDisk):
        sh = sh.persist()
    dfreq = sh.groupBy("sh").agg(F.count("*").alias("df"))
    ranked = sh.join(dfreq, "sh").withColumn(
        "pos",
        F.row_number().over(Window.partitionBy("id").orderBy("df", "sh")),
    )
    sizes = ranked.groupBy("id").agg(F.count("*").alias("sz"))
    prefix = (
        ranked.join(sizes, "id")
        .where(F.col("pos") <= F.col("sz") - F.ceil(F.lit(t) * F.col("sz")) + 1)
        .select("id", "sh")
    )
    pp = prefix.join(sizes, "id").select(
        F.col("id").alias("id_p"), "sh", F.col("sz").alias("_zp")
    )
    ff = sh.join(sizes, "id").select(
        F.col("id").alias("id_f"), "sh", F.col("sz").alias("_zf")
    )
    cands = (
        pp.join(ff, "sh")
        .where(
            (F.col("id_p") != F.col("id_f"))
            # only the min side's prefix generates (ties: either side works,
            # and <= keeps exactly one qualifying direction per tie)
            & (F.col("_zp") <= F.col("_zf"))
        )
        .select(
            F.least("id_p", "id_f").alias("id_a"),
            F.greatest("id_p", "id_f").alias("id_b"),
        )
        .distinct()
    )
    # exact verify anchored to the candidate list
    fa = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("_sa"))
    fb = sh.select(F.col("id").alias("_idb"), F.col("sh").alias("_sb"))
    inter = (
        cands.join(fa, "id_a")
        .join(
            fb,
            (F.col("id_b") == F.col("_idb")) & (F.col("_sa") == F.col("_sb")),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sa"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sb"))
    # Filter on the INTEGER predicate i >= ceil(t*sz) — the exact condition
    # the prefix lemma generates candidates for — never on the 6-dp-rounded
    # ratio: a pair whose exact containment sits within 5e-7 below t (needs
    # ~1e6+ shingles, i.e. the scale this operator targets) would round up
    # past a rounded-ratio filter yet be provably absent from the candidate
    # set. Rounding is projection-only.
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .where(
            (F.col("i") >= F.ceil(F.lit(t) * F.col("sa")))
            | (F.col("i") >= F.ceil(F.lit(t) * F.col("sb")))
        )
        .select(
            "id_a",
            "id_b",
            F.round(F.col("i") / F.col("sa").cast("double"), 6).alias("cont_a_in_b"),
            F.round(F.col("i") / F.col("sb").cast("double"), 6).alias("cont_b_in_a"),
        )
    )
