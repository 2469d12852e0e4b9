"""Sink semantics: bulk write, overwrite-replace, incremental column update
(the reference's insert_many / drop / skip-existing $set, SURVEY.md §2.1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_SMALL


def test_bulk_write_and_overwrite(spark, tmp_path):
    from hybrid_vector_search_spark.sources import load_table
    from hybrid_vector_search_spark.sources.sinks import bulk_write

    docs = load_table(spark, SF_SMALL, "documents")
    p = str(tmp_path / "docs")
    bulk_write(docs, p, mode="overwrite", max_records_per_file=100)
    assert spark.read.parquet(p).count() == docs.count()
    bulk_write(docs.limit(10), p, mode="overwrite")  # S5 drop-and-replace
    assert spark.read.parquet(p).count() == 10


def test_incremental_update_skips_existing(spark, tmp_path):
    """Rows with a non-null value keep it bit-for-bit; only NULLs computed —
    the reference's --skip-existing embedding backfill."""
    from hybrid_vector_search_spark.sources.sinks import incremental_update

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    spark.createDataFrame(
        [(1, "aa", None), (2, "bb", 99.0), (3, "cc", None)],
        "id long, text string, feat double",
    ).write.parquet(src)

    got = incremental_update(
        spark, src, out, lambda df: F.length("text").cast("double"), "feat"
    )
    vals = {r.id: r.feat for r in got.collect()}
    assert vals == {1: 2.0, 2: 99.0, 3: 2.0}


def test_cli_search_inclusive_bounds(spark):
    from hybrid_vector_search_spark.api import SearchConfig, SearchEngine
    from hybrid_vector_search_spark.operators.embed import embed_documents
    from hybrid_vector_search_spark.sources import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    corpus = embed_documents(docs, "text", "emb")
    eng = SearchEngine(
        corpus,
        SearchConfig(
            id_col="doc_id",
            title_col="text",
            emb_col="emb",
            price_col="n_chars",
            extra_project=("n_chars",),
        ),
    )
    lo = int(docs.agg(F.min("n_chars")).head()[0])
    res = eng.cli_search("spark fast", k=10, min_price=lo, max_price=lo)
    assert res and all(r["n_chars"] == lo for r in res)  # inclusive both ends

def test_sorted_export_total_order(spark, tmp_path):
    """Each exported file is internally sorted AND file key-ranges are
    disjoint — i.e. the file set forms a global total order."""
    import glob

    from hybrid_vector_search_spark.sources import load_table
    from hybrid_vector_search_spark.sources.sinks import sorted_export

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    out = str(tmp_path / "sorted_docs")
    sorted_export(docs, out, ["n_chars", "doc_id"], num_files=8)

    import pandas as pd

    ranges = []
    for f in sorted(glob.glob(f"{out}/part-*.parquet")):
        pdf = pd.read_parquet(f)[["n_chars", "doc_id"]]
        if pdf.empty:
            continue
        keys = list(pdf.itertuples(index=False, name=None))
        assert keys == sorted(keys), f"file {f} not internally sorted"
        ranges.append((keys[0], keys[-1]))
    ranges.sort()
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b, "file key-ranges overlap"
    # nothing lost
    total = sum(
        len(pd.read_parquet(f)) for f in glob.glob(f"{out}/part-*.parquet")
    )
    assert total == docs.count()


def test_jsonl_roundtrip_lossless(spark, tmp_path):
    """parquet -> JSONL -> DataFrame preserves schema and every value
    (explicit-schema read: no inference pass)."""
    from hybrid_vector_search_spark.sources import load_table
    from hybrid_vector_search_spark.sources.formats import read_jsonl, write_jsonl

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out)
    back = read_jsonl(spark, out, docs.schema)
    assert back.schema == docs.schema
    a = sorted(map(tuple, docs.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_permissive_jsonl_captures_corrupt_lines(spark, tmp_path):
    """Malformed JSONL lines land in _corrupt_record verbatim instead of
    being silently dropped — ingest accounting must reconcile."""
    from pyspark.sql import types as T

    from hybrid_vector_search_spark.sources.formats import (
        CORRUPT_COL,
        read_jsonl_permissive,
    )

    p = tmp_path / "dump.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "good"}\n'
        "{broken json here}\n"
        '{"doc_id": 2, "text": "also good"}\n'
        "not json at all\n"
    )
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    df = read_jsonl_permissive(spark, str(p), schema).cache()
    try:
        assert df.count() == 4
        good = df.where(F.col(CORRUPT_COL).isNull())
        bad = df.where(F.col(CORRUPT_COL).isNotNull())
        assert {r["doc_id"] for r in good.collect()} == {1, 2}
        assert {r[CORRUPT_COL] for r in bad.collect()} == {
            "{broken json here}",
            "not json at all",
        }
    finally:
        df.unpersist()


def test_csv_roundtrip_and_corrupt_capture(spark, tmp_path):
    from pyspark.sql import types as T

    from hybrid_vector_search_spark.sources.formats import (
        CORRUPT_COL,
        read_csv,
        write_csv,
    )

    src = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", -2.0)], "id long, name string, score double"
    )
    out = tmp_path / "csv_out"
    write_csv(src, str(out))
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    back_rows = read_csv(spark, str(out), schema).collect()
    assert sorted(
        (r["id"], r["name"], r["score"]) for r in back_rows
    ) == [(1, "alpha", 1.5), (2, "beta", -2.0)]
    assert all(r[CORRUPT_COL] is None for r in back_rows)
    # malformed row (bad type arity) is captured, not dropped
    p = tmp_path / "manual.csv"
    p.write_text("id,name,score\n1,ok,2.5\nnot-a-long,broken,row,extra\n")
    # CSV's corrupt-column restriction is stricter than JSON's (even count()
    # trips it pre-materialization) — collect once, assert in Python
    rows = read_csv(spark, str(p), schema).collect()
    assert len(rows) == 2
    assert sum(1 for r in rows if r[CORRUPT_COL] is not None) == 1
