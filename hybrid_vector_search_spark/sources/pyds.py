"""Partition-parallel synthetic catalog source (Spark 4 Python DataSource).

`catalog_gen.generate_catalogs` builds rows on the DRIVER (fine for
fixture-sized n, and its docstring says so). This module is the scale path
for S6: the same reference-shaped nested catalogs as a REGISTERED Spark
data source —

    spark.dataSource.register(SyntheticCatalogs)
    spark.read.format("synthetic_catalogs").option("n", 10_000_000).load()

— where each input partition generates only its row range on an executor.
Nothing ever materializes on the driver, so n scales to whatever the
cluster can hold, and the source composes with every downstream operator
like any other relation.

Determinism contract (pinned in tests/test_pyds.py): row i is a pure
function of (seed, i) — a per-row `random.Random((seed, i))` — so the
dataset is IDENTICAL for any partition count (driver-side generation
consumes one sequential RNG, which can't be split; that's exactly why it
can't distribute). Same vocabulary and row shape as catalog_gen, same
CATALOG_SCHEMA.
"""

from __future__ import annotations

import random
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .catalog_gen import (
    AREA_CODES,
    AREA_TYPES,
    CATALOG_SCHEMA,
    CITIES,
    COUNTRY,
    DAYS,
    TITLE_BASES,
    TITLE_DESCRIPTORS,
    TITLE_PERIODS,
    _hex24,
    _product,
)

DEFAULT_ROWS_PER_PARTITION = 5000


def catalog_row(seed: int, i: int) -> tuple:
    """Row i of the dataset — pure function of (seed, i)."""
    rng = random.Random(f"{seed}#{i}")  # str seed: well-mixed, version-stable
    cc, _cid = rng.choice(COUNTRY)
    at = rng.choice(AREA_TYPES)
    avail = [
        (d, [(f"{rng.randint(6, 11):02d}:00", f"{rng.randint(18, 23):02d}:00")])
        for d in DAYS
    ]
    return (
        _hex24(rng),
        f"{cc}-{at}-{rng.randint(100000, 999999)}",
        f"{rng.choice(TITLE_BASES)} {rng.choice(TITLE_DESCRIPTORS)} ({rng.choice(TITLE_PERIODS)})",
        cc,
        rng.choice(AREA_CODES),
        at,
        rng.choice(CITIES) if rng.random() > 0.02 else None,
        "".join(rng.choice("ABCDEFGHIJKLMNOPQRSTUVWXYZ") for _ in range(3)),
        avail,
        [_product(rng) for _ in range(rng.randint(3, 8))],
        0,
    )


class _Range(InputPartition):
    def __init__(self, seed: int, start: int, end: int):
        self.seed, self.start, self.end = seed, start, end


class _CatalogReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.seed = int(options.get("seed", 42))
        self.rows_per_partition = int(
            options.get("rows_per_partition", DEFAULT_ROWS_PER_PARTITION)
        )

    def partitions(self) -> list[_Range]:
        step = max(1, self.rows_per_partition)
        return [
            _Range(self.seed, lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ] or [_Range(self.seed, 0, 0)]

    def read(self, partition: _Range) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield catalog_row(partition.seed, i)


class SyntheticCatalogs(DataSource):
    """format name: ``synthetic_catalogs`` (options: n, seed,
    rows_per_partition)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_catalogs"

    def schema(self):
        return CATALOG_SCHEMA

    def reader(self, schema) -> _CatalogReader:
        return _CatalogReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticCatalogs)
