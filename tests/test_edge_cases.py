"""Degenerate-input behavior: empty corpora, no-term queries, null text —
each must produce a well-formed empty/null result, never an error."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_SMALL


def test_knn_on_empty_corpus(spark):
    from hybrid_vector_search_spark.operators.knn import knn
    from hybrid_vector_search_spark.sources import load_table

    emb = load_table(spark, SF_SMALL, "embeddings").where(F.lit(False))
    assert knn(emb, [0.1] * 64, 5).count() == 0


def test_bm25_query_with_no_known_terms(spark):
    from hybrid_vector_search_spark.operators.bm25 import fulltext
    from hybrid_vector_search_spark.sources import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    out = fulltext(docs, "zzzzqqqq wwwwxxxx", 5, id_col="doc_id", text_col="text")
    assert out.count() == 0  # no matching docs, not an error


def test_bm25_empty_query_string(spark):
    from hybrid_vector_search_spark.operators.bm25 import fulltext
    from hybrid_vector_search_spark.sources import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    assert fulltext(docs, "   ", 5, id_col="doc_id", text_col="text").count() == 0


def test_dedup_on_null_and_empty_text(spark):
    from hybrid_vector_search_spark.operators.dedup import exact_dedup, shingle_table

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "real text here"), (4, "")],
        "doc_id long, text string",
    )
    sh = shingle_table(df, "doc_id", "text")
    assert {r.id for r in sh.collect()} == {3} or sh.count() == 0  # short docs: no 3-grams
    out = {r.doc_id: r.is_duplicate for r in exact_dedup(df, "doc_id", "text").collect()}
    assert out[4] is True and out[2] is False  # two empties dedup together


def test_fusion_single_branch(spark):
    from hybrid_vector_search_spark.operators.fusion import score_fusion

    only = spark.createDataFrame([(1, 0.5)], "id long, score double")
    out = score_fusion({"vector": only}, {"vector": 10.0}).collect()
    assert len(out) == 1 and out[0].score > 0


def test_compact_preserves_values(spark, tmp_path):
    from hybrid_vector_search_spark.sources import load_table
    from hybrid_vector_search_spark.sources.sinks import compact

    src = str(tmp_path / "frag")
    docs = load_table(spark, SF_SMALL, "documents")
    docs.repartition(37).write.parquet(src)  # fragment into many small files
    parts = compact(spark, src, str(tmp_path / "compact"), target_rows_per_file=200)
    out = spark.read.parquet(str(tmp_path / "compact"))
    assert out.count() == docs.count()
    assert parts < 37
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in docs.collect())
    assert a == b


def test_connected_components_empty_edges(spark):
    from hybrid_vector_search_spark.operators.graph import connected_components

    empty = spark.createDataFrame([], "src long, dst long")
    assert connected_components(empty, "src", "dst").count() == 0


def test_binary_stats_empty_and_null_free(spark):
    from pyspark.sql import functions as F

    from hybrid_vector_search_spark.multimodal import binary_stats

    empty = spark.createDataFrame([], "doc_id long, text string").select(
        "doc_id", F.encode("text", "utf-8").alias("content")
    )
    assert binary_stats(empty, "doc_id", "content").count() == 0


def test_rank_fusion_branch_bound_is_takeordered(spark):
    """rank_fusion's global rank window funnels to one partition by nature;
    the max_branch_rows fence must bound what reaches it with a
    TakeOrderedAndProject (per-partition top-N, never a global sort), and
    the bounded ranks must equal the unbounded ranks on the surviving
    prefix."""
    from pyspark.sql import functions as F

    from hybrid_vector_search_spark.operators.fusion import rank_fusion

    n = 500
    a = spark.range(n).select(F.col("id"), (F.col("id") % 97).cast("double").alias("score"))
    b = spark.range(n).select(F.col("id"), (F.col("id") % 89).cast("double").alias("score"))

    bounded = rank_fusion({"a": a, "b": b}, max_branch_rows=50)
    plan = bounded._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan

    unbounded = rank_fusion({"a": a, "b": b}, max_branch_rows=None)
    got = {r.id: r.score for r in bounded.collect()}
    want = {r.id: r.score for r in unbounded.collect()}

    def branch_ranks(df):
        rows = sorted(df.collect(), key=lambda r: (-r.score, r.id))
        return {r.id: i + 1 for i, r in enumerate(rows)}

    ra, rb = branch_ranks(a), branch_ranks(b)
    # truncated-list RRF contract: an id whose rank survives the cut in BOTH
    # branches scores bit-identically to the unbounded ranking (top-N ranks
    # are a prefix of the global ranking); an id past the cut in one branch
    # loses only that branch's term, so bounded ≤ unbounded always
    survivors = [i for i in got if ra.get(i, 99) <= 50 and rb.get(i, 99) <= 50]
    assert survivors, "fixture must produce ids inside both cuts"
    for doc_id in survivors:
        assert abs(want[doc_id] - got[doc_id]) < 1e-9, (doc_id,)
    for doc_id, score in got.items():
        assert score <= want[doc_id] + 1e-9, (doc_id,)


def test_bpe_pretokenizer_cross_engine_on_punctuation(spark, duck):
    """The testdata corpus is plain lowercase words, so drive the BPE-ish
    pre-tokenizer's punctuation/digit/space branches through BOTH engines
    on adversarial strings — Java regex and RE2 must split identically."""
    from hybrid_vector_search_spark.operators.textstats import bpe_token_stats

    rows = [
        (1, " hello, world42  x"),
        (2, "a.b.c---d 1 22 333"),
        (3, "...leading!? punct"),
        (4, "   "),
        (5, ""),
        (6, "MiXeD CaSe{}[]#@ 7z"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted(map(tuple, bpe_token_stats(df, "doc_id", "text").collect()))
    duck.execute("CREATE OR REPLACE TABLE _bpe_fix(doc_id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO _bpe_fix VALUES (?, ?)", rows)
    want = duck.execute(r"""
        WITH p AS (SELECT doc_id, regexp_extract_all(lower(text),
                   ' ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+') AS ps FROM _bpe_fix)
        SELECT doc_id, len(ps)::BIGINT, len(list_distinct(ps))::BIGINT,
               coalesce(list_sum(list_transform(ps, x -> length(x))), 0)::BIGINT,
               round(coalesce(list_sum(list_transform(ps, x -> length(x))), 0)::DOUBLE
                     / greatest(len(ps), 1), 6)
        FROM p ORDER BY doc_id
    """).fetchall()
    assert got == [tuple(r) for r in want]


def test_r5_ops_on_null_and_empty_text(spark):
    """Every r5 text operator must survive null/empty/short text with a
    well-formed result, never an error."""
    from hybrid_vector_search_spark.operators import dedup, textstats, urls

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "one two three four five six seven"), (4, "x")],
        "doc_id long, text string",
    )
    # SNM: null/empty keys group into their own buckets, no crash
    pairs = dedup.sorted_neighborhood_pairs(df, "doc_id", "text").collect()
    assert all(r["jaccard"] >= 0.5 for r in pairs)
    # grouped minhash: docs with no shingles drop out; group of only-empty
    # docs yields no signature row
    sdf = spark.createDataFrame(
        [("a", None), ("a", ""), ("b", "alpha beta gamma delta")],
        "src string, text string",
    )
    sigs = dedup.grouped_minhash_signatures(sdf, "src", "text", num_hashes=8).collect()
    assert {r["g"] for r in sigs} == {"b"}
    # oov: null text keeps the doc at 0 tokens / rate 0.0
    rates = {r["id"]: r for r in textstats.oov_rate(df, "doc_id", "text").collect()}
    assert rates[1]["n_tokens"] == 0 and rates[1]["oov_rate"] == 0.0
    # compression: null → 0 bytes, ratio 0.0
    comp = {r["id"]: r for r in textstats.compression_ratio(df, "doc_id", "text").collect()}
    assert comp[1]["n_bytes"] == 0 and comp[1]["compression_ratio"] == 0.0
    # urls: null text extracts nothing
    assert urls.extract_urls(df.where(F.col("doc_id") == 1), "doc_id", "text").count() == 0


def test_bloom_empty_key_set(spark):
    """An empty Bloom build yields an empty bitmap; every probe is rejected
    (inner join on zero words) — an empty holdout decontaminates nothing."""
    from hybrid_vector_search_spark.operators import bloom

    empty = spark.createDataFrame([], "k string")
    probes = spark.createDataFrame([("a",), ("b",)], "k string")
    bm = bloom.bloom_build(empty, "k", m_bits=1 << 10, k=3)
    assert bm.count() == 0
    assert bloom.bloom_prefilter(probes, "k", bm, m_bits=1 << 10, k=3).count() == 0


def test_r7_operators_handle_empty_and_singleton_inputs(spark):
    """Epoch order, dense ids, triangles, and skyline on empty / 1-row
    inputs: no crashes, exact expected shapes."""
    from pyspark.sql import functions as F

    from hybrid_vector_search_spark.operators.graph import triangle_count
    from hybrid_vector_search_spark.operators.ordering import (
        dense_ids,
        epoch_order,
        shard_manifest,
    )
    from hybrid_vector_search_spark.operators.skyline import pareto_frontier

    empty = spark.createDataFrame([], "doc_id long, text string")
    one = spark.createDataFrame([(7, "solo")], "doc_id long, text string")

    assert epoch_order(empty, "doc_id").count() == 0
    eo = epoch_order(one, "doc_id").collect()
    assert len(eo) == 1 and eo[0].pos == 1

    assert dense_ids(empty, "doc_id").count() == 0
    di = dense_ids(one, "doc_id").collect()
    assert len(di) == 1 and di[0].dense_id == 0

    assert shard_manifest(epoch_order(empty, "doc_id")).count() == 0

    no_edges = spark.createDataFrame([], "src long, dst long")
    assert triangle_count(no_edges).count() == 0
    self_loop_only = spark.createDataFrame([(1, 1)], "src long, dst long")
    assert triangle_count(self_loop_only).count() == 0

    pts_empty = spark.createDataFrame([], "id long, x long, y double")
    assert pareto_frontier(pts_empty, min_col="x", max_col="y").count() == 0
    pts_one = spark.createDataFrame([(1, 5, 0.5)], "id long, x long, y double")
    assert pareto_frontier(pts_one, min_col="x", max_col="y").count() == 1
