"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash).

Engine code lives in ``hybrid_vector_search_spark/``; this module only
composes it into the driver's (spark, sf_dir) -> DataFrame shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hybrid_vector_search_spark.operators import knn as knn_op
from hybrid_vector_search_spark.sources import load_table

SF0001 = "/root/testdata/sf0.001"


def _query_vector_df(spark: SparkSession, sf_dir: str, qid: int = 0) -> DataFrame:
    """Deterministic query vector: the embedding of vec_id == qid."""
    return (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") == qid)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pre-filtered exact cosine top-k ($vectorSearch semantics)."""
    return q_knn_cosine_prefilter(spark, SF0001)


# ---------------------------------------------------------------- KNN mode


def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = load_table(spark, sf_dir, "embeddings")
    q = _query_vector_df(spark, sf_dir)
    out = knn_op.knn_join(
        q, corpus.where(F.col("vec_id") != 0), k=5, metric="cosine"
    )
    return out.select("vec_id", "label", "score").orderBy(F.desc("score"), F.asc("vec_id"))


def q_knn_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = load_table(spark, sf_dir, "embeddings")
    q = _query_vector_df(spark, sf_dir)
    out = knn_op.knn_join(q, corpus.where(F.col("vec_id") != 0), k=5, metric="dotProduct")
    return out.select("vec_id", "label", "score").orderBy(F.desc("score"), F.asc("vec_id"))


def q_knn_euclidean(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = load_table(spark, sf_dir, "embeddings")
    q = _query_vector_df(spark, sf_dir)
    out = knn_op.knn_join(q, corpus.where(F.col("vec_id") != 0), k=5, metric="euclidean")
    return out.select("vec_id", "label", "score").orderBy(F.desc("score"), F.asc("vec_id"))


def q_knn_cosine_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-filter BEFORE top-k (reference backend/api.py:178-180): label
    predicate stands in for the reference's product.available/price filters."""
    corpus = load_table(spark, sf_dir, "embeddings").where(
        (F.col("label") % 2 == 0) & (F.col("vec_id") != 0)
    )
    q = _query_vector_df(spark, sf_dir)
    out = knn_op.knn_join(q, corpus, k=5, metric="cosine")
    return out.select("vec_id", "label", "score").orderBy(F.desc("score"), F.asc("vec_id"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "knn_cosine": q_knn_cosine,
        "knn_dot": q_knn_dot,
        "knn_euclidean": q_knn_euclidean,
        "knn_cosine_prefilter": q_knn_cosine_prefilter,
    }


_KNN_ORACLE = """
WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id, e.label, round({score_expr}, 6) AS score
FROM embeddings e, q
WHERE {where}
ORDER BY score DESC, e.vec_id ASC
LIMIT 5
"""

_COS = "(1.0 + list_dot_product(e.embedding::DOUBLE[], q.qvec::DOUBLE[]) / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * sqrt(list_dot_product(q.qvec::DOUBLE[], q.qvec::DOUBLE[])))) / 2.0"
_DOT = "(1.0 + list_dot_product(e.embedding::DOUBLE[], q.qvec::DOUBLE[])) / 2.0"
_EUC = "1.0 / (1.0 + sqrt(list_dot_product(list_transform(list_zip(e.embedding::DOUBLE[], q.qvec::DOUBLE[]), p -> p[1] - p[2]), list_transform(list_zip(e.embedding::DOUBLE[], q.qvec::DOUBLE[]), p -> p[1] - p[2]))))"


def oracle_sql() -> dict[str, str]:
    return {
        "knn_cosine": _KNN_ORACLE.format(score_expr=_COS, where="e.vec_id <> 0"),
        "knn_dot": _KNN_ORACLE.format(score_expr=_DOT, where="e.vec_id <> 0"),
        "knn_euclidean": _KNN_ORACLE.format(score_expr=_EUC, where="e.vec_id <> 0"),
        "knn_cosine_prefilter": _KNN_ORACLE.format(
            score_expr=_COS, where="e.vec_id <> 0 AND e.label % 2 = 0"
        ),
    }
