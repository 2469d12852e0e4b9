"""__spark_entry__._memo: materialize-once wrapper for expensive builders."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_memo_second_call_equals_raw_builder(spark):
    import __spark_entry__ as e

    wrapped = e.queries()["dedup_components"]
    assert wrapped.__name__ == "memo_dedup_components"
    raw = wrapped.__wrapped__
    first = sorted(map(tuple, wrapped(spark, SF).collect()))
    second = sorted(map(tuple, wrapped(spark, SF).collect()))  # parquet-served
    direct = sorted(map(tuple, raw(spark, SF).collect()))
    assert first == second == direct and len(first) > 0
    # schema survives the parquet round trip
    assert wrapped(spark, SF).schema == raw(spark, SF).schema


def test_memo_evicts_other_sf_dirs(spark):
    import __spark_entry__ as e

    e._REPORT_MEMO.clear()
    wrapped = e.queries()["dedup_components"]
    wrapped(spark, SF)
    assert ("dedup_components", SF) in e._REPORT_MEMO
    other = "/root/testdata/sf0.01"
    wrapped(spark, other)
    assert ("dedup_components", SF) not in e._REPORT_MEMO
    assert ("dedup_components", other) in e._REPORT_MEMO
