"""SQL surface: the engine's derived relations as temp views.

The DataFrame builders and ``spark.sql`` compile to the same Catalyst plans;
this module registers the engine's derived relations so a SQL-first user can
query the same semantics directly:

    register_all(spark, sf_dir)
    spark.sql("SELECT * FROM ft_postings WHERE term = 'spark'")
    spark.sql("SELECT * FROM doc_quality ORDER BY quality DESC LIMIT 10")

Views are lazy logical plans — registering costs nothing until queried, and
every registered view still benefits from pushdown/pruning under whatever
filters the SQL adds on top.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators import bm25, dedup, sampling, textstats
from ..sources import load_table, register_views


def register_all(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register base tables + derived engine relations; returns view names."""
    register_views(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")

    stats = bm25.build_text_stats(docs, "doc_id", "text")
    created = {
        "ft_postings": stats.postings,
        "ft_doc_len": stats.doc_len,
        "ft_doc_freq": stats.doc_freq,
        "ft_corpus": stats.corpus,
        "doc_tokens": textstats.token_stats(docs, "doc_id", "text"),
        "doc_quality": textstats.quality_score(docs, "doc_id", "text"),
        "doc_lang": textstats.language_id(docs, "doc_id", "text"),
        "doc_fingerprints": textstats.fingerprints(docs, "doc_id", "text"),
        "doc_shingles": dedup.shingle_table(docs, "doc_id", "text"),
        "doc_splits": sampling.dataset_split(docs, "doc_id"),
    }
    for name, df in created.items():
        df.createOrReplaceTempView(name)
    return sorted(created)


def register_query_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register EVERY driver query as a temp view (q_<name>), making the
    whole engine surface SQL-addressable:

        register_query_views(spark, sf_dir)
        spark.sql("SELECT * FROM q_pricing_summary")
        spark.sql("SELECT * FROM q_dedup_components WHERE component = 7")

    Views stay lazy logical plans; composing further SQL on top re-enters
    Catalyst, so filters still push down into each query's scans."""
    import __spark_entry__ as entry_mod

    names = []
    for name, fn in entry_mod.queries().items():
        fn(spark, sf_dir).createOrReplaceTempView(f"q_{name}")
        names.append(f"q_{name}")
    return sorted(names)
