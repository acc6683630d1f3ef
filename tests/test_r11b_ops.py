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


# ---------------------------------------------------------------- CMS
def test_countmin_matches_independent_replica(spark, tmp_path):
    """Pure-Python Count-Min replica (same md5 cell formula, independent
    code path) must agree with the Spark sketch on every estimate, and
    the one-sided error bound est >= exact must hold."""
    import hashlib
    from pravega_spark.queries.relational import events_countmin_heavy_hitters

    t0 = datetime(2024, 3, 1)
    rows, eid = [], 0
    # 8 items: type t, users 0..7 -> item "t:<u>", counts 1..8
    for u in range(8):
        for _ in range(u + 1):
            eid += 1
            rows.append((eid, t0, u, float(u)))
    df = spark.createDataFrame(
        [(i, ts, u, "t", v, "{}") for i, ts, u, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    exact = {f"t:{u}": u + 1 for u in range(8)}
    cells: dict = {}
    def col(r, item):
        return int(hashlib.md5(f"cm{r}:{item}".encode()).hexdigest()[:8], 16) % 64
    for item, n in exact.items():
        for r in range(4):
            cells[(r, col(r, item))] = cells.get((r, col(r, item)), 0) + n
    expect = {
        item: min(cells[(r, col(r, item))] for r in range(4)) for item in exact
    }
    out = {r.item: r for r in events_countmin_heavy_hitters(spark, str(tmp_path)).collect()}
    assert set(out) == set(exact)  # 8 items, top-10 covers all
    for item, r in out.items():
        assert r.exact_n == exact[item]
        assert r.est_n == expect[item], (item, r.est_n, expect[item])
        assert r.est_n >= r.exact_n
        assert r.overcount == r.est_n - r.exact_n


# ------------------------------------------------------------ anomaly
def test_robust_z_disc_median_and_zero_mad(spark, tmp_path):
    from pravega_spark.queries.relational import events_anomaly_robust_z

    t0 = datetime(2024, 3, 1)
    rows, eid = [], 0
    # type "a": values 1..9 + 100 -> disc median = 5 (5th of 10),
    # adev sorted [0,1,1,2,2,3,3,4,4,95] -> MAD = 2 (5th),
    # threshold 8.8956 -> only the outlier flags
    for v in list(range(1, 10)) + [100]:
        eid += 1
        rows.append((eid, t0, 1, "a", float(v)))
    # type "b": constant -> MAD 0, threshold 0, adev 0 NOT > 0 -> none
    for _ in range(5):
        eid += 1
        rows.append((eid, t0, 2, "b", 7.0))
    # type "c": even count [1,2,3,10] -> disc picks the LOWER middle
    # (first value with cume_dist >= 0.5): med=2, adev [0,1,1,8],
    # MAD=1, threshold 4.4478 -> the 10 flags
    for v in [1.0, 2.0, 3.0, 10.0]:
        eid += 1
        rows.append((eid, t0, 3, "c", v))
    df = spark.createDataFrame(
        [(i, ts, u, t, v, "{}") for i, ts, u, t, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r.event_type: r for r in events_anomaly_robust_z(spark, str(tmp_path)).collect()}
    assert (out["a"].med, out["a"].mad, out["a"].n_anomalies) == (5.0, 2.0, 1)
    assert (out["b"].med, out["b"].mad, out["b"].n_anomalies) == (7.0, 0.0, 0)
    assert (out["c"].med, out["c"].mad, out["c"].n_anomalies) == (2.0, 1.0, 1)
    assert out["a"].anomaly_rate == 0.1


# ----------------------------------------------------------- pagerank
def test_pagerank_hand_computed_with_dangling(spark, tmp_path):
    """3-nation graph A->{B,C}, B->A; C dangling (no out-edges). All
    expected ranks hand-derived with the integer fixed-point recurrence
    (SCALE=1e12, ppm shares, 0.85 damping, 3 iterations)."""
    from pravega_spark.queries.relational import nation_trade_pagerank

    def w(name, schema, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / f"{name}.parquet"))

    w("nation", "n_nationkey long, n_name string", [(0, "A"), (1, "B"), (2, "C")])
    w("supplier", "s_suppkey long, s_nationkey long", [(10, 0), (11, 1)])
    w("customer", "c_custkey long, c_nationkey long", [(20, 1), (21, 0), (22, 2)])
    w("orders", "o_orderkey long, o_custkey long", [(30, 20), (31, 21), (32, 22)])
    # edges: s10(A)->o30(c20,B); s10(A)->o32(c22,C); s11(B)->o31(c21,A)
    w("lineitem", "l_suppkey long, l_orderkey long", [(10, 30), (10, 32), (11, 31)])

    out = nation_trade_pagerank(spark, str(tmp_path)).collect()
    # hand-derived: r0=333333333333, base=49999999999
    # iter1: A=333333333332, B=C=191666666665
    # iter2: A=212916666664, B=C=191666666665
    # iter3: A=212916666664, B=C=140489583331
    assert [(r.nation, r.rank_scaled) for r in out] == [
        ("A", 212916666664),
        ("B", 140489583331),
        ("C", 140489583331),
    ]
    assert out[0].rank_share == 0.212917


# ------------------------------------------------------------- binning
def test_deciles_position_binning_with_duplicates(spark, tmp_path):
    """ntile over (value, event_id): 10 values into 10 bins of 1; with
    duplicate values the event_id tiebreak makes the assignment
    deterministic — the dup pair lands in adjacent bins, each bin's
    lo == hi == the value."""
    from pravega_spark.queries.relational import events_value_deciles

    t0 = datetime(2024, 3, 1)
    vals = [1.0, 2.0, 3.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0]
    rows = [(i + 1, t0, 1, "a", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        [(i, ts, u, t, v, "{}") for i, ts, u, t, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = events_value_deciles(spark, str(tmp_path)).collect()
    assert [r.bin for r in out] == list(range(1, 11))
    assert all(r.n == 1 for r in out)
    assert [r.lo for r in out] == sorted(vals)
    assert all(r.lo == r.hi for r in out)


# --------------------------------------------------------- transitions
def test_type_transitions_hand_computed(spark, tmp_path):
    """u1: a->b->a->b (3 transitions), u2: b->b (1). No cross-user
    pairs. p_ppm is floor((n*1e6)/row_total)."""
    from pravega_spark.queries.relational import events_type_transitions

    t0 = datetime(2024, 3, 1)

    def ts(m):
        return t0 + timedelta(minutes=m)

    rows = [
        (1, ts(0), 1, "a"), (2, ts(1), 1, "b"),
        (3, ts(2), 1, "a"), (4, ts(3), 1, "b"),
        (5, ts(0), 2, "b"), (6, ts(1), 2, "b"),
    ]
    df = spark.createDataFrame(
        [(i, t, u, e, 0.0, "{}") for i, t, u, e in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = [tuple(r) for r in events_type_transitions(spark, str(tmp_path)).collect()]
    # a: a->b x2 (row total 2 -> 1e6); b: b->a x1, b->b x1 (total 2 -> 5e5 each)
    assert out == [
        ("a", "b", 2, 1_000_000),
        ("b", "a", 1, 500_000),
        ("b", "b", 1, 500_000),
    ]


# -------------------------------------------------------------- drift
def test_drift_tvd_hand_computed(spark, tmp_path):
    """20 events, values 1..20 in time order -> deciles are value pairs
    {1,2},{3,4},...; the discrete median ts splits 10/10, so bins 1-5
    are all period a (share 200000 ppm each) and bins 6-10 all period b
    -> TVD = (5*2e5 + 5*2e5)/2 = 1e6 ppm (total drift). A second type
    with values interleaved in time has zero drift."""
    from pravega_spark.queries.relational import events_drift_tvd

    t0 = datetime(2024, 3, 1)
    rows = []
    # type "trend": value increases with time -> total drift
    for k in range(20):
        rows.append((k + 1, t0 + timedelta(hours=k), 1, "trend", float(k + 1)))
    # type "flat": same value distribution in both halves -> zero drift
    # (values 1..10 in hours 0..9, then 1..10 again in hours 10..19)
    for k in range(20):
        rows.append((100 + k, t0 + timedelta(hours=k), 2, "flat", float(k % 10 + 1)))
    df = spark.createDataFrame(
        [(i, ts, u, t, v, "{}") for i, ts, u, t, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r.event_type: r for r in events_drift_tvd(spark, str(tmp_path)).collect()}
    assert (out["trend"].n_first_half, out["trend"].n_second_half) == (10, 10)
    assert out["trend"].tvd_ppm == 1_000_000
    assert out["flat"].tvd_ppm == 0


# --------------------------------------------------------------- gini
def test_source_gini_hand_computed(spark, tmp_path):
    """en: sources with weights 1,1,1,1 -> gini 0 (after the (n+1)
    correction: (2*(1+2+3+4) - 5*4)*1e6 // (4*4) = 0). fr: weights
    [1, 9]: (2*(1*1 + 2*9) - 3*10)*1e6 // (2*10) = (38-30)*1e6//20
    = 400000."""
    from pravega_spark.queries.text import corpus_source_gini

    rows = []
    for i, src in enumerate(["s1", "s2", "s3", "s4"]):
        rows.append((i + 1, "en", "x", src, 1))
    rows.append((10, "fr", "x", "a", 1))
    rows.append((11, "fr", "x", "b", 9))
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, text string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.lang: r for r in corpus_source_gini(spark, str(tmp_path)).collect()}
    assert (out["en"].n_sources, out["en"].total_chars, out["en"].gini_ppm) == (4, 4, 0)
    assert (out["fr"].n_sources, out["fr"].total_chars, out["fr"].gini_ppm) == (2, 10, 400_000)


def test_drift_tvd_empty_second_half_is_total_drift(spark, tmp_path):
    """A single-event type (median == max ts) has an empty second half;
    the contract is tvd_ppm = 1e6, not NULL from the 0-div."""
    from pravega_spark.queries.relational import events_drift_tvd

    t0 = datetime(2024, 3, 1)
    rows = [(1, t0, 1, "solo", 5.0)]
    # a normal type alongside, so the query isn't trivially one group
    for k in range(10):
        rows.append((10 + k, t0 + timedelta(hours=k), 2, "norm", float(k)))
    df = spark.createDataFrame(
        [(i, ts, u, t, v, "{}") for i, ts, u, t, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r.event_type: r for r in events_drift_tvd(spark, str(tmp_path)).collect()}
    assert (out["solo"].n_first_half, out["solo"].n_second_half) == (1, 0)
    assert out["solo"].tvd_ppm == 1_000_000
    assert out["norm"].tvd_ppm is not None


def test_source_gini_all_zero_weights(spark, tmp_path):
    """A language whose docs all have n_chars = 0 gets gini 0 by
    contract (raw integer div would be NULL)."""
    from pravega_spark.queries.text import corpus_source_gini

    rows = [
        (1, "zz", "x", "s1", 0),
        (2, "zz", "x", "s2", 0),
        (3, "en", "x", "s1", 10),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, text string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.lang: r for r in corpus_source_gini(spark, str(tmp_path)).collect()}
    assert (out["zz"].n_sources, out["zz"].total_chars, out["zz"].gini_ppm) == (2, 0, 0)
    assert out["en"].gini_ppm == 0  # single source is also gini 0


def test_countmin_merged_days_equals_global(spark, tmp_path):
    """Per-day sketches merged cell-wise must equal the global sketch
    (Count-Min mergeability) — python replica builds BOTH and asserts
    they agree with the operator, across items spanning multiple days."""
    import hashlib
    from pravega_spark.queries.relational import (
        events_countmin_heavy_hitters,
        events_countmin_merged_days,
    )

    t0 = datetime(2024, 3, 1)
    rows, eid = [], 0
    # 6 items; items 0-2 appear on 2 days, 3-5 on 1 day
    for u in range(6):
        for d in range(2 if u < 3 else 1):
            for _ in range(u + 1):
                eid += 1
                rows.append((eid, t0 + timedelta(days=d), u, float(u)))
    df = spark.createDataFrame(
        [(i, ts, u, "t", v, "{}") for i, ts, u, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    def col(r, item):
        return int(hashlib.md5(f"cm{r}:{item}".encode()).hexdigest()[:8], 16) % 64

    exact, per_day = {}, {0: {}, 1: {}}
    for eid_, ts, u, v in rows:
        item = f"t:{u}"
        exact[item] = exact.get(item, 0) + 1
        d = (ts - t0).days
        per_day[d][item] = per_day[d].get(item, 0) + 1
    # global cells vs merged per-day cells
    g_cells, m_cells = {}, {}
    for item, n in exact.items():
        for r in range(4):
            g_cells[(r, col(r, item))] = g_cells.get((r, col(r, item)), 0) + n
    for d, cnts in per_day.items():
        for item, n in cnts.items():
            for r in range(4):
                m_cells[(r, col(r, item))] = m_cells.get((r, col(r, item)), 0) + n
    assert g_cells == m_cells  # the mergeability law itself

    out = {r.item: r for r in events_countmin_merged_days(spark, str(tmp_path)).collect()}
    plain = {r.item: r for r in events_countmin_heavy_hitters(spark, str(tmp_path)).collect()}
    assert set(out) == set(exact)
    for item, r in out.items():
        assert r.exact_n == exact[item]
        assert r.est_n == min(g_cells[(rr, col(rr, item))] for rr in range(4))
        assert r.est_n == plain[item].est_n  # merged == direct, in-engine
        assert r.n_days == (2 if int(item.split(":")[1]) < 3 else 1)


def test_gap_fill_locf_hand_computed(spark, tmp_path):
    """u1 active on D0 (two events summing 1.5) and D3 (2.25): spine is
    4 days, gaps D1/D2 carry 1.5 forward -> filled_total 6.75. u2 has a
    single active day -> nothing filled."""
    from pravega_spark.queries.relational import events_gap_fill_locf

    t0 = datetime(2024, 3, 1, 9, 0, 0)
    rows = [
        (1, t0, 1, 0.75),
        (2, t0 + timedelta(hours=2), 1, 0.75),
        (3, t0 + timedelta(days=3), 1, 2.25),
        (4, t0, 2, 5.0),
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = {r.user_id: tuple(r)[1:] for r in events_gap_fill_locf(spark, sf).collect()}
    assert out[1] == (4, 2, 2, 6.75)
    assert out[2] == (1, 1, 0, 5.0)


def test_pq_cells_matches_independent_replica(spark, tmp_path):
    """Seeded random 64-d vectors; a pure-Python PQ replica (rounded
    per-label centroids -> per-subspace rounded L2 argmin with
    codeword-asc ties -> cell census) must agree with the operator."""
    import random
    from collections import Counter, defaultdict
    from pravega_spark.queries.similarity import similarity_pq_cells

    rng = random.Random(7)
    rows = []
    for vid in range(20):
        vec = [round(rng.uniform(-1, 1), 1) for _ in range(64)]
        rows.append((vid, vec, vid % 3))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    # replica: centroids = round(avg, 6) per (label, pos) on the FLOAT
    # values Spark reads back (fp32 storage), then rounded L2 argmin
    by_label = defaultdict(list)
    import struct as _s
    f32 = lambda x: _s.unpack("f", _s.pack("f", x))[0]
    for vid, vec, lab in rows:
        by_label[lab].append([f32(x) for x in vec])
    cents = {
        lab: [round(sum(v[p] for v in vs) / len(vs), 6) for p in range(64)]
        for lab, vs in by_label.items()
    }
    census = Counter()
    cell_labels = defaultdict(set)
    for vid, vec, lab in rows:
        fv = [f32(x) for x in vec]
        code = []
        for s in range(4):
            lo = s * 16
            best = min(
                (round(sum((fv[lo + i] - c[lo + i]) ** 2 for i in range(16)), 6), cl)
                for cl, c in cents.items()
            )
            code.append(best[1])
        census[tuple(code)] += 1
        cell_labels[tuple(code)].add(lab)
    got = {
        (r.c0, r.c1, r.c2, r.c3): (r.n_vectors, r.n_labels)
        for r in similarity_pq_cells(spark, str(tmp_path)).collect()
    }
    want = {k: (n, len(cell_labels[k])) for k, n in census.items()}
    # operator returns top-20 cells; 20 vectors -> at most 20 cells
    assert got == want


def test_rfm_segments_hand_computed(spark, tmp_path):
    """5 customers with monotone R/F/M -> each owns one quintile, so
    customer k lands in segment kkk and avg_spend is their own spend."""
    from pravega_spark.queries.relational import orders_rfm_segments

    d0 = datetime(1995, 6, 1)
    rows, ok = [], 0
    for c in range(1, 6):
        for i in range(c):  # c orders
            ok += 1
            rows.append((ok, c, d0 + timedelta(days=30 * c + i), 100.0 * c + i))
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp, o_totalprice double"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {r.segment: r for r in orders_rfm_segments(spark, str(tmp_path)).collect()}
    assert sorted(out) == [111, 222, 333, 444, 555]
    for c in range(1, 6):
        r = out[c * 111]
        assert r.n_customers == 1
        assert r.total_orders == c
        # spend = sum over i of (100c + i) = 100c*c + c(c-1)/2
        assert r.total_spend == 100.0 * c * c + c * (c - 1) / 2


def test_cohort_ltv_triangle_hand_computed(spark, tmp_path):
    """u1 cohort W0: purchase 10 @W0, view @W1 (active, zero value),
    purchase 5 @W2 -> cum 10/10/15. u2 cohort W1: purchase 20."""
    from pravega_spark.queries.relational import events_cohort_ltv

    w0 = datetime(2024, 3, 4)  # a Monday

    def wk(k, d=0):
        return w0 + timedelta(weeks=k, days=d)

    rows = [
        (1, wk(0), 1, "purchase", 10.0),
        (2, wk(1, 2), 1, "view", 999.0),  # non-purchase value ignored
        (3, wk(2), 1, "purchase", 5.0),
        (4, wk(1), 2, "purchase", 20.0),
    ]
    df = spark.createDataFrame(
        [(i, ts, u, t, v, "{}") for i, ts, u, t, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = [tuple(r) for r in events_cohort_ltv(spark, str(tmp_path)).collect()]
    assert out == [
        (wk(0), 0, 1, 10.0, 10.0),
        (wk(0), 1, 1, 0.0, 10.0),
        (wk(0), 2, 1, 5.0, 15.0),
        (wk(1), 0, 1, 20.0, 20.0),
    ]


def test_path_trigrams_hand_computed(spark, tmp_path):
    """u1: a,b,c,a -> trigrams (a,b,c),(b,c,a); u2 has only 2 events ->
    none. Shares are exact halves."""
    from pravega_spark.queries.relational import events_path_trigrams

    t0 = datetime(2024, 3, 1)
    rows = [
        (1, t0, 1, "a"), (2, t0 + timedelta(minutes=1), 1, "b"),
        (3, t0 + timedelta(minutes=2), 1, "c"), (4, t0 + timedelta(minutes=3), 1, "a"),
        (5, t0, 2, "a"), (6, t0 + timedelta(minutes=1), 2, "a"),
    ]
    df = spark.createDataFrame(
        [(i, ts, u, t, 0.0, "{}") for i, ts, u, t in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = [tuple(r) for r in events_path_trigrams(spark, str(tmp_path)).collect()]
    assert out == [
        ("a", "b", "c", 1, 500_000),
        ("b", "c", "a", 1, 500_000),
    ]


def test_basket_lift_hand_computed(spark, tmp_path):
    """Baskets {A,B},{A,B},{A,C},{B} (first order holds two A-parts to
    exercise the distinct collapse). lift is the DOCUMENTED floor-div
    chain: AB = div(div(2e6,3)*4,3) = 888888; AC = div(div(1e6,3)*4,1)
    = 1333332 -> AC ranks above AB despite lower support."""
    from pravega_spark.queries.relational import lineitem_basket_lift

    def w(name, schema, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / f"{name}.parquet"))

    w("part", "p_partkey long, p_brand string",
      [(1, "A"), (2, "A"), (3, "B"), (4, "C")])
    w("lineitem", "l_orderkey long, l_partkey long",
      [(10, 1), (10, 2), (10, 3),     # o1: A,A,B -> {A,B}
       (11, 1), (11, 3),               # o2: {A,B}
       (12, 2), (12, 4),               # o3: {A,C}
       (13, 3)])                       # o4: {B}
    out = [tuple(r) for r in lineitem_basket_lift(spark, str(tmp_path)).collect()]
    assert out == [
        ("A", "C", 1, 250_000, 1_333_332),
        ("A", "B", 2, 500_000, 888_888),
    ]


def test_rake_keywords_hand_computed(spark, tmp_path):
    """Stopword-delimited phrases with exact RAKE integer scores:
    'deep' freq 3 / deg 6, 'learning' 2/4, 'models' 1/2 -> all
    wscore 2e6; single-word phrase 'cat' counts toward word stats
    but is excluded from the output grain."""
    from pravega_spark.queries.text import text_rake_keywords

    sf = _write_documents(
        spark,
        tmp_path,
        [
            (1, "en", "deep learning of deep models"),
            (2, "en", "deep learning"),
            (3, "en", "cat the cat dog"),
        ],
    )
    out = [tuple(r) for r in text_rake_keywords(spark, sf).collect()]
    assert out == [
        ("deep learning", 2, 4_000_000),
        ("deep models", 1, 4_000_000),
        ("cat dog", 1, 3_500_000),
    ]


def test_leadtime_profile_hand_computed(spark, tmp_path):
    """One nation, lead times [1..9, 40] days: disc p50=5, p90=9,
    p99=40, SLA30 = 9/10 = 900000 ppm."""
    from pravega_spark.queries.relational import lineitem_leadtime_profile

    d0 = datetime(1995, 6, 1)

    def w(name, schema, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / f"{name}.parquet"))

    w("nation", "n_nationkey long, n_name string", [(0, "A")])
    w("supplier", "s_suppkey long, s_nationkey long", [(1, 0)])
    leads = list(range(1, 10)) + [40]
    w("orders", "o_orderkey long, o_orderdate timestamp",
      [(10 + i, d0) for i in range(len(leads))])
    w("lineitem", "l_orderkey long, l_suppkey long, l_shipdate timestamp",
      [(10 + i, 1, d0 + timedelta(days=d)) for i, d in enumerate(leads)])
    out = lineitem_leadtime_profile(spark, str(tmp_path)).collect()
    assert [tuple(r) for r in out] == [("A", 10, 5, 9, 40, 900_000)]


def test_inter_arrival_hand_computed(spark, tmp_path):
    """u1 type a at 0s, 30s, 90s, 390s -> gaps [30, 60, 300]: p50=60
    (disc, 2nd of 3), p90=300, burst = 1/3 = 333333 ppm. Cross-user
    and cross-type gaps must NOT mix (u2's early event would otherwise
    create a negative or tiny gap)."""
    from pravega_spark.queries.relational import events_inter_arrival

    t0 = datetime(2024, 3, 1)
    rows = [
        (1, t0, 1, "a"), (2, t0 + timedelta(seconds=30), 1, "a"),
        (3, t0 + timedelta(seconds=90), 1, "a"), (4, t0 + timedelta(seconds=390), 1, "a"),
        (5, t0 + timedelta(seconds=10), 2, "a"),  # single event: no gap
        (6, t0, 1, "b"), (7, t0 + timedelta(seconds=5), 1, "b"),
    ]
    df = spark.createDataFrame(
        [(i, ts, u, t, 0.0, "{}") for i, ts, u, t in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r.event_type: tuple(r)[1:] for r in events_inter_arrival(spark, str(tmp_path)).collect()}
    assert out["a"] == (3, 60, 300, 333_333)
    assert out["b"] == (1, 5, 5, 1_000_000)


def test_seasonality_index_hand_computed(spark, tmp_path):
    """Below the $7B branch point the EXACT formula runs: revenue
    3e6/1e6 dollars -> indices exactly 9e6 and 3e6 ppm. A tiny corpus
    (300/100 dollars total) — which the naive floor-div chain NULLed
    (review finding) — now gets the same exact values."""
    from pravega_spark.queries.relational import orders_seasonality_index

    for scale in (1.0, 10_000.0):
        rows = [
            (1, datetime(1995, 1, 15), 300.0 * scale),
            (2, datetime(1995, 2, 15), 100.0 * scale),
        ]
        df = spark.createDataFrame(
            rows, "o_orderkey long, o_orderdate timestamp, o_totalprice double"
        )
        d = tmp_path / f"s{int(scale)}"
        d.mkdir()
        df.coalesce(1).write.mode("overwrite").parquet(str(d / "orders.parquet"))
        out = {
            r.month: (r.n_orders, r.index_ppm)
            for r in orders_seasonality_index(spark, str(d)).collect()
        }
        # month1 = 3/4 of revenue -> 0.75 * 12e6 = 9e6; month2 -> 3e6
        assert out[1] == (1, 9_000_000), scale
        assert out[2] == (1, 3_000_000), scale


def test_ttl_dedup_contract_probes(spark, tmp_path):
    """The dropDuplicatesWithinWatermark contract the oracle replays,
    pinned on the probe fixture that derived it: (1) state eviction
    LAGS — keys whose expiry passed the fresh watermark but not the
    lagged one still dedup; (2) an evicted key re-emits; (3) a dropped
    duplicate does NOT refresh expiry; (4) the late filter uses the
    previous batch's published watermark."""
    import os
    import shutil

    t0 = datetime(2024, 3, 1)

    def ts(h, m=0):
        return t0 + timedelta(hours=h, minutes=m)

    # delay 1h. kD expiry 9:15 sits between wm_pub(1)=9:00 and the
    # fresh 9:30; kB's early state is evicted before batch 2.
    rows = {
        0: [("kD", ts(8, 15)), ("kB", ts(0)), ("kA", ts(10))],
        1: [("kC", ts(10, 30)), ("kB", ts(9, 45))],  # kB deduped (lag: wm(0)=-inf keeps ALL b0 state)
        2: [("kD", ts(9, 50)), ("kB", ts(10, 0)), ("kY", ts(8, 30)),
            ("kZ", ts(9, 0))],  # EXACTLY at wm(1): boundary is inclusive-drop
    }
    in_dir = str(tmp_path / "input")
    os.makedirs(in_dir)
    for i, rs in rows.items():
        tmp = str(tmp_path / f"t{i}")
        spark.createDataFrame(rs, "key string, ts timestamp").coalesce(1).write.parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = f"{in_dir}/b{i}.parquet"
        shutil.move(os.path.join(tmp, part), dst)
        os.utime(dst, (1_000_000_000 + i * 1000,) * 2)
    stream = (
        spark.readStream.schema("key string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["key"])
        .writeStream.format("memory")
        .queryName("ttl_probe")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = sorted((r.key, r.ts) for r in spark.table("ttl_probe").collect())
    spark.catalog.dropTempView("ttl_probe")
    assert emitted == [
        ("kA", ts(10)),       # b0
        ("kB", ts(0)),        # b0; the b1 dup is dropped (lagged state)
        ("kB", ts(10, 0)),    # b2 RE-EMIT: evicted at end of b1 (wm 9:00)
        ("kC", ts(10, 30)),   # b1 first-seen
        ("kD", ts(8, 15)),    # b0; the b2 dup at 9:50 is DROPPED because
                              # expiry 9:15 > lagged wm 9:00 (fresh wm was
                              # 9:30 — eviction lags one batch)
    ]
    # kY@8:30 < wm(1)=9:00 -> late-dropped (batch-2 filter uses the
    # PREVIOUS batch's published watermark, not the fresh 9:30 — else
    # kD@9:50... 9:15-keys would differ); kD@9:50 absent (dedup);
    # kZ@9:00 EXACTLY at the lagged watermark is ALSO dropped — the
    # boundary is inclusive (ts <= wm), which the oracle's strict
    # `ts > wm` keep-filter mirrors (review repro finding).
    keys = [k for k, _ in emitted]
    assert "kY" not in keys
    assert "kZ" not in keys
    assert keys.count("kD") == 1
