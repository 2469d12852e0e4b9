"""End-to-end reference scenario on reference-shaped data:
generate nested catalogs → flatten → embed → search in all four modes —
the complete user journey of the reference system
(seed.py → transform-seed.py → embed.py → backend/api.py), Spark-native."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def product_detail(spark):
    from hybrid_vector_search_spark.operators.embed import embed_documents
    from hybrid_vector_search_spark.sources.catalog_gen import (
        flatten_catalogs,
        generate_catalogs,
    )

    catalogs = generate_catalogs(spark, 200, seed=7)
    flat = flatten_catalogs(catalogs)
    return embed_documents(flat, "product.description", "emb_description").cache()


@pytest.fixture(scope="module")
def engine(product_detail):
    from hybrid_vector_search_spark.api import SearchConfig, SearchEngine

    cfg = SearchConfig(
        id_col="_id",
        title_col="title",
        emb_col="emb_description",
        available_col="product.available",
        price_col="product.price.amount",
        restaurant_col="restaurantName",
        extra_project=("product",),
    )
    return SearchEngine(product_detail, cfg)


def test_flatten_shape(spark, product_detail):
    """3-8 products per catalog ⇒ rows in [600, 1600] for 200 catalogs;
    parent fields copied; ids promoted (transform-seed.py:71-94)."""
    n = product_detail.count()
    assert 600 <= n <= 1600
    r = product_detail.head()
    assert r.catalogId is not None and r._id == r.product._id
    assert "products" not in product_detail.columns
    # every (catalog, product) pair distinct
    assert product_detail.select("_id").distinct().count() == n


def test_flatten_fresh_id_fallback(spark):
    """_id precedence (transform-seed.py:83-91): the child's own _id wins;
    a child WITHOUT one gets a fresh unique id."""
    from hybrid_vector_search_spark.operators.flatten import flatten

    df = spark.createDataFrame(
        [("cat1", [("p1", "idA"), ("p2", None)])],
        "_id string, products array<struct<name string, _id string>>",
    )
    rows = flatten(df, "products").collect()
    by_name = {r.product.name: r for r in rows}
    assert by_name["p1"]._id == "idA"
    assert by_name["p2"]._id is not None and by_name["p2"]._id != "idA"
    assert by_name["p2"].catalogId == "cat1"


def test_vector_mode_with_filters(engine):
    res = engine.search(
        {
            "mode": "vector",
            "description": "hamburguesa con ingredientes frescos",
            "available": True,
            "maxPrice": 10.0,
            "limit": 5,
        }
    )
    assert len(res["results"]) == 5
    for r in res["results"]:
        assert r["product"]["available"] is True
        assert r["product"]["price"]["amount"] < 10.0  # STRICT < (api.py:37-38)


def test_fulltext_mode_on_title(engine):
    res = engine.search({"mode": "fulltext", "title": "menu ejecutivo", "limit": 5})
    assert res["results"]
    for r in res["results"]:
        t = r["title"].lower()
        assert "menu" in t or "ejecutivo" in t


def test_hybrid_mode_returns_details(engine):
    res = engine.search(
        {
            "mode": "hybrid",
            "description": "pollo crujiente",
            "title": "combo familiar",
            "limit": 5,
        }
    )
    assert len(res["results"]) == 5
    assert all("score_details" in r for r in res["results"])


def test_restaurants_endpoint_excludes_nulls(engine):
    vals = engine.restaurants()
    assert vals == sorted(vals)
    assert None not in vals and len(vals) > 10


def test_own_description_ranks_first(engine, product_detail):
    row = product_detail.where(F.col("product.price.amount") > 0).head()
    res = engine.search(
        {"mode": "vector", "description": row.product.description, "limit": 3}
    )
    assert res["results"][0]["_id"] == row._id