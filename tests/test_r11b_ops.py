"""Round-11 late-session operators: hand-computed adversarial fixtures.

The sf0.01 parity gate proves Spark == DuckDB; these pin the SEMANTICS
both engines could get wrong together, on corpora small enough that
every output cell is hand-derivable:

- text_tfidf_top_terms: integer idf = (N*1e6) div df, stopword/min-len
  exclusion, score ties broken by term asc within a language.
- events_rolling_distinct_users: trailing-window INCLUSIVE lower bound
  (day exactly 6 days back counts), days past the window drop out, and
  the report spine is activity days only.
- events_ewma_smoothed: exact 8-tap kernel dot product (power-of-two
  weights), <8-event users excluded, (ts, event_id) tie ordering.
"""

from datetime import datetime, timedelta

from pravega_spark.queries.relational import (
    events_ewma_smoothed,
    events_rolling_distinct_users,
)
from pravega_spark.queries.text import text_tfidf_top_terms


def _write_documents(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, ts, u, "view", v, "{}") for i, ts, u, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_tfidf_integer_scoring_and_ties(spark, tmp_path):
    # N=4 docs. df: apple=2, banana=2, cherry=1, cat=1, dog=1.
    # idf = (4 * 1e6) div df -> apple/banana 2e6, cherry/cat/dog 4e6.
    # "the" is a stopword, "ab" is under min length 3 -> both ignored.
    sf = _write_documents(
        spark,
        tmp_path,
        [
            (1, "en", "apple apple banana the"),
            (2, "en", "apple cherry ab"),
            (3, "fr", "banana banana banana"),
            (4, "en", "dog cat"),
        ],
    )
    rows = [tuple(r) for r in text_tfidf_top_terms(spark, sf).collect()]
    # en scores: apple 3*2e6=6e6; cat/cherry/dog 4e6 each (term-asc tie);
    # banana 1*2e6=2e6. fr: banana 3*2e6=6e6.
    assert rows == [
        ("en", 1, "apple", 6_000_000, 2),
        ("en", 2, "cat", 4_000_000, 1),
        ("en", 3, "cherry", 4_000_000, 1),
        ("en", 4, "dog", 4_000_000, 1),
        ("en", 5, "banana", 2_000_000, 2),
        ("fr", 1, "banana", 6_000_000, 2),
    ]


def test_rolling_distinct_window_boundaries(spark, tmp_path):
    d0 = datetime(2024, 3, 1, 10, 0, 0)

    def day(k, hour=10):
        return d0 + timedelta(days=k, hours=hour - 10)

    # u1: D0 (x2 events), D1. u2: D1. u4: D2. u3: D8.
    # D8's trailing window is [D2, D8] -- D2 is EXACTLY 6 days back and
    # must count (inclusive bound); D1/D0 must not.
    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, day(0), 1, 1.0),
            (2, day(0, 11), 1, 1.0),
            (3, day(1), 1, 1.0),
            (4, day(1), 2, 1.0),
            (5, day(2), 4, 1.0),
            (6, day(8), 3, 1.0),
        ],
    )
    def mid(k):  # output grain is the truncated day (midnight)
        return datetime(2024, 3, 1) + timedelta(days=k)

    rows = [tuple(r) for r in events_rolling_distinct_users(spark, sf).collect()]
    assert rows == [
        (mid(0), 1, 2),
        (mid(1), 2, 4),
        (mid(2), 3, 5),
        (mid(8), 2, 2),  # u4@D2 (boundary) + u3; events D2+D8
    ]


def test_ewma_exact_kernel_and_ordering(spark, tmp_path):
    t0 = datetime(2024, 3, 1, 12, 0, 0)

    def ts(m):
        return t0 + timedelta(minutes=m)

    rows = []
    # u1: 9 events valued 1..9; events 8 and 9 share a timestamp so the
    # (ts, event_id) tie order is load-bearing: swapped order would give
    # 8*.5 + 9*.25 = 6.25 for the head terms instead of 4.5 + 2 = 6.5.
    for k in range(1, 8):
        rows.append((k, ts(k), 1, float(k)))
    rows.append((8, ts(8), 1, 8.0))
    rows.append((9, ts(8), 1, 9.0))
    # u2: 7 events -> excluded (needs all 8 taps)
    for k in range(7):
        rows.append((100 + k, ts(k), 2, 5.0))
    # u3: exactly 8 constant events -> weights sum to exactly 1
    for k in range(8):
        rows.append((200 + k, ts(k), 3, 2.0))
    sf = _write_events(spark, tmp_path, rows)
    out = {r.user_id: r for r in events_ewma_smoothed(spark, sf).collect()}
    assert set(out) == {1, 3}
    # 9*.5 + 8*.25 + 7*.125 + 6*.0625 + 5*.03125 + 4*.015625
    #   + 3*.0078125 + 2*.0078125 = 8.0078125 (exact in binary)
    assert out[1].ewma_value == 8.0078125
    assert out[1].n_events == 9
    assert out[1].last_value == 9.0
    assert out[3].ewma_value == 2.0
    assert out[3].last_ts == ts(7)
