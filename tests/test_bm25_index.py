"""BM25 index persistence: saved stats reload to identical scores."""

from __future__ import annotations

from .conftest import SF_SMALL


def test_text_stats_save_load_identical_scores(spark, tmp_path):
    from hybrid_vector_search_spark.operators.bm25 import TextStats, bm25_scores, build_text_stats
    from hybrid_vector_search_spark.sources import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    stats = build_text_stats(docs, "doc_id", "text")
    p = str(tmp_path / "ftindex")
    stats.save(p)
    loaded = TextStats.load(spark, p)

    q = ["spark", "fast", "table"]
    a = sorted(map(tuple, bm25_scores(stats, q).collect()))
    b = sorted(map(tuple, bm25_scores(loaded, q).collect()))
    assert a == b and len(a) > 0
