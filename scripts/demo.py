"""End-to-end demo: the complete reference user journey, Spark-native.

Mirrors the reference's README flow (seed → transform → embed → index →
query) on reference-shaped data, printing each step's result:

    python scripts/demo.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from hybrid_vector_search_spark.api import SearchConfig, SearchEngine
    from hybrid_vector_search_spark.operators.embed import embed_documents
    from hybrid_vector_search_spark.session import get_spark
    from hybrid_vector_search_spark.sources.catalog_gen import (
        flatten_catalogs,
        generate_catalogs,
    )

    spark = get_spark("hvs-demo")

    print("== 1. seed: generate nested catalogs (reference seed.py)")
    catalogs = generate_catalogs(spark, 500, seed=42)
    print(f"   {catalogs.count()} catalogs, schema has nested products array")

    print("== 2. transform: flatten to product_detail (transform-seed.py)")
    flat = flatten_catalogs(catalogs)
    print(f"   {flat.count()} product_detail rows")

    print("== 3. embed: deterministic local embedder (embed.py, offline)")
    corpus = embed_documents(flat, "product.description", "emb_description").cache()
    corpus.count()

    print("== 4. index + serve (indexes.py + backend/api.py)")
    engine = SearchEngine(
        corpus,
        SearchConfig(
            id_col="_id",
            title_col="title",
            emb_col="emb_description",
            available_col="product.available",
            price_col="product.price.amount",
            restaurant_col="restaurantName",
            extra_project=("product",),
        ),
    )

    print("\n-- restaurants endpoint:", engine.restaurants()[:5], "...")

    for payload in [
        {"mode": "vector", "description": "hamburguesa con ingredientes frescos",
         "available": True, "maxPrice": 12.0, "limit": 3},
        {"mode": "fulltext", "title": "menu ejecutivo", "limit": 3},
        {"mode": "hybrid", "description": "pollo crujiente",
         "title": "combo familiar", "limit": 3},
    ]:
        res = engine.search(payload)
        print(f"\n-- {res['mode']} search:")
        for r in res["results"]:
            name = r["product"]["name"] if "product" in r else "?"
            print(f"   {r['score']:.4f}  {name}  @ {r.get('restaurantName')}")


def pipeline_demo() -> None:
    """The training-data story end-to-end at sf0.001: clean -> dedup ->
    decontaminate -> split -> clustered export."""
    import tempfile

    from hybrid_vector_search_spark.functions.zorder import zorder_export
    from hybrid_vector_search_spark.plans import pipeline
    from hybrid_vector_search_spark.session import get_spark
    from hybrid_vector_search_spark.sources import load_table

    spark = get_spark("pipeline-demo")
    sf = "/root/testdata/sf0.001"

    print("== training-data pipeline (sf0.001)")
    clean = pipeline.corpus_clean(spark, sf)
    print("   corpus_clean per-source survivors:")
    for r in clean.collect():
        print(f"     {r}")

    comps = pipeline.dedup_components(spark, sf)
    print(f"   near-dup clusters: {comps.select('component').distinct().count()} "
          f"covering {comps.count()} docs")

    cont = pipeline.decontaminate(spark, sf)
    print(f"   decontamination: {cont.count()} corpus docs share 5-grams with holdout")

    lm = pipeline.unigram_logprob_score(spark, sf)
    row = lm.agg({"mean_neg_logp": "avg"}).first()
    print(f"   LM quality proxy: corpus mean neg-logp = {row[0]:.3f}")

    with tempfile.TemporaryDirectory() as d:
        docs = load_table(spark, sf, "documents")
        zorder_export(docs, f"{d}/zdocs", "doc_id", "n_chars", num_files=4)
        import glob
        print(f"   z-ordered export: {len(glob.glob(d + '/zdocs/part-*.parquet'))} files")


if __name__ == "__main__":
    main()
    pipeline_demo()
