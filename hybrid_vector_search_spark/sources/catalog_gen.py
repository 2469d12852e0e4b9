"""Deterministic reference-shaped catalog generator (SURVEY.md §2.1 S6).

Reproduces the reference's synthetic data model (seed.py:99-173) without
Faker: nested restaurant catalogs with a ``products`` array (3-8 products,
price/available/areas/sizes/isPromoFlex), doubly-nested ``availability``, and
the same enums/distributions, driven by a seeded PRNG so every run (and both
engines) sees identical data. Used by tests to exercise the full reference
pipeline end-to-end: generate → flatten (transform-seed.py) → embed
(embed.py) → search (backend/api.py).

Generation happens driver-side (the reference generates 1000 docs client-side
too, seed.py:202) and becomes a DataFrame via createDataFrame; at real scale
you'd generate distributed with ``spark.range(n).mapInPandas`` — same row
builder, seeded per id.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

COUNTRY = [("PE", "PE-id"), ("CL", None), ("CO", None), ("MX", None)]
AREA_CODES = ["MOP", "AUT", "CURB", "EALM"]
AREA_TYPES = ["PICKUP", "DELIVERY", "DRIVE_THRU", "EAT_IN"]
TITLE_BASES = ["Menu Ejecutivo", "Combo Familiar", "Pack Desayuno", "Oferta Especial", "Menu Infantil"]
TITLE_DESCRIPTORS = ["Flex", "Premium", "Clasico", "Ligero", "Doble"]
TITLE_PERIODS = ["Desayuno", "Almuerzo", "Cena", "Merienda", "Todo el dia"]
PRODUCT_NAMES = [
    "Hamburguesa clasica", "Pollo crujiente", "Ensalada fresca", "Papas grandes",
    "Bebida helada", "Postre de chocolate", "Sandwich mixto", "Cafe americano",
    "Wrap de pollo", "Nuggets x10",
]
SIZES = ["LARGE", "MEDIUM", "SMALL", "NONE"]
DAYS = ["SUNDAY", "MONDAY", "TUESDAY", "WEDNESDAY", "THURSDAY", "FRIDAY", "SATURDAY"]
CITIES = [f"CITY {i:02d}" for i in range(60)]

PRODUCT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("imageUrl", T.StringType()),
        T.StructField(
            "price",
            T.StructType(
                [
                    T.StructField("amount", T.DoubleType()),
                    T.StructField("formatted", T.StringType()),
                ]
            ),
        ),
        T.StructField("available", T.BooleanType()),
        T.StructField("areas", T.ArrayType(T.StringType())),
        T.StructField("combo", T.BooleanType()),
        T.StructField("_id", T.StringType()),
        T.StructField(
            "sizes",
            T.ArrayType(
                T.StructType(
                    [T.StructField("id", T.StringType()), T.StructField("code", T.StringType())]
                )
            ),
        ),
        T.StructField("isPromoFlex", T.BooleanType()),
    ]
)

CATALOG_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StringType(), False),
        T.StructField("id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("countryCode", T.StringType()),
        T.StructField("areaCode", T.StringType()),
        T.StructField("areaType", T.StringType()),
        T.StructField("restaurantName", T.StringType()),
        T.StructField("restaurantCode", T.StringType()),
        T.StructField(
            "availability",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("dayOfWeek", T.StringType()),
                        T.StructField(
                            "timePeriods",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("startTime", T.StringType()),
                                        T.StructField("endTime", T.StringType()),
                                    ]
                                )
                            ),
                        ),
                    ]
                )
            ),
        ),
        T.StructField("products", T.ArrayType(PRODUCT_SCHEMA)),
        T.StructField("__v", T.IntegerType()),
    ]
)


def _hex24(rng: random.Random) -> str:
    return "".join(rng.choice("0123456789abcdef") for _ in range(24))


def _product(rng: random.Random) -> tuple:
    name = rng.choice(PRODUCT_NAMES)
    desc = f"{name} con ingredientes {rng.choice(['frescos', 'locales', 'premium', 'caseros'])} numero {rng.randint(1, 999)}"
    amount = round(rng.uniform(2.5, 25.0), 2)
    sizes = None
    if rng.random() < 0.6:
        k = rng.randint(2, 4)
        sizes = [(s, f"{rng.randint(10000, 99999)}") for s in rng.sample(SIZES, k)]
    promo = rng.random() < 0.4 and rng.random() < 0.5
    return (
        f"{rng.randint(10000, 99999)}",
        name,
        desc,
        f"https://cdn.example.com/p/{rng.randint(1, 9999)}.jpg",
        (amount, f"S/{str(amount).replace('.', ',')}"),
        rng.random() < 0.5,
        rng.sample(AREA_CODES, rng.randint(1, 4)),
        rng.random() < 0.5,
        _hex24(rng),
        sizes,
        promo if rng.random() < 0.4 else None,
    )


def generate_catalogs(spark: SparkSession, n: int = 1000, *, seed: int = 42) -> DataFrame:
    rng = random.Random(seed)
    rows = []
    for _ in range(n):
        cc, _cid = rng.choice(COUNTRY)
        at = rng.choice(AREA_TYPES)
        avail = [
            (d, [(f"{rng.randint(6, 11):02d}:00", f"{rng.randint(18, 23):02d}:00")])
            for d in DAYS
        ]
        rows.append(
            (
                _hex24(rng),
                f"{cc}-{at}-{rng.randint(100000, 999999)}",
                f"{rng.choice(TITLE_BASES)} {rng.choice(TITLE_DESCRIPTORS)} ({rng.choice(TITLE_PERIODS)})",
                cc,
                rng.choice(AREA_CODES),
                at,
                rng.choice(CITIES) if rng.random() > 0.02 else None,  # some NULLs (P5)
                "".join(rng.choice("ABCDEFGHIJKLMNOPQRSTUVWXYZ") for _ in range(3)),
                avail,
                [_product(rng) for _ in range(rng.randint(3, 8))],
                0,
            )
        )
    return spark.createDataFrame(rows, CATALOG_SCHEMA)


def flatten_catalogs(catalogs: DataFrame) -> DataFrame:
    """transform-seed.py semantics: explode products, copy parent fields
    (minus the excluded set), promote ids (SURVEY.md §2.9 N1)."""
    from ..operators.flatten import flatten

    return flatten(
        catalogs,
        "products",
        parent_id_col="_id",
        parent_id_out="catalogId",
        child_alias="product",
        child_id_field="_id",
        output_id_col="_id",
        exclude=("description_embeddings", "image_embeddings"),  # vestigial fields
    )
