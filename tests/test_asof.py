"""As-of join semantics: ties match, unmatched stay NULL, latest-wins."""

from __future__ import annotations

import datetime as dt


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    from hybrid_vector_search_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T10:00:00")),  # before any right → NULL
            (2, 10, _ts("2024-01-01T12:00:00")),  # tie with right @12 → matches
            (3, 10, _ts("2024-01-01T15:00:00")),  # after 12 and 14 → 14
            (4, 20, _ts("2024-01-01T12:00:00")),  # other key, no right → NULL
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T12:00:00"), "a"),
            (10, _ts("2024-01-01T14:00:00"), "b"),
        ],
        "user_id long, ts timestamp, tag string",
    )
    out = {
        r.event_id: (r.asof_ts, r.asof_tag)
        for r in asof_join(
            left, right, on="user_id", value_cols=["tag"]
        ).collect()
    }
    assert out[1] == (None, None)
    assert out[2] == (_ts("2024-01-01T12:00:00"), "a")
    assert out[3] == (_ts("2024-01-01T14:00:00"), "b")
    assert out[4] == (None, None)
