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


if __name__ == "__main__":
    main()
