"""Round-11 new operators: hand-computed adversarial fixtures.

The sf0.01 parity gate proves Spark == DuckDB; these tests pin the
SEMANTICS both could get wrong together, on corpora crafted so every
output cell is hand-derivable:

- corpus_duplicate_spans: island merging — adjacent-but-disjoint
  duplicated windows (gap exactly k) merge into ONE contiguous span,
  while the same two regions separated by unique text stay TWO spans;
  cross-boundary shingles that occur once stay unflagged.
- corpus_leakage_safe_split: a duplicate member whose OWN doc_id hashes
  to a different split must follow its representative's split (the
  leakage guard is hash-of-rep, not hash-of-doc).
- similarity_kmeans_refine: an exact cosine tie between two centroids
  assigns to the smaller cluster id (the documented tie-break that the
  oracle's row_number ordering mirrors).
"""

import hashlib

import pytest

from pravega_spark.queries.similarity import similarity_kmeans_refine
from pravega_spark.queries.text import (
    corpus_duplicate_spans,
    corpus_leakage_safe_split,
)


def _write_documents(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _toks(prefix, lo, hi):
    return " ".join(f"{prefix}{i}" for i in range(lo, hi))


def test_duplicate_spans_island_semantics(spark, tmp_path):
    # namespaces: a* shared by docs 1/2 (two regions), b*/c* unique
    # middles, r* shared by docs 3/4, d* unique middle, e* short doc
    r1_a, mid_b, r2_a = _toks("a", 0, 10), _toks("b", 0, 10), _toks("a", 20, 30)
    r1_r, mid_c, r2_r = _toks("r", 0, 10), _toks("c", 0, 10), _toks("r", 20, 30)
    rows = [
        # doc1/doc2: share tokens 1-10 and 21-30; doc1's middle (b*) and
        # doc2's middle (c*) unique -> flagged starts {1,2,3} and
        # {21,22,23} in BOTH docs, gap 18 > 8 -> 2 spans of 10 each
        (1, "en", f"{r1_a} {mid_b} {r2_a}"),
        (2, "en", f"{r1_a} {mid_c} {r2_a}"),
        # doc3: the SAME two shared regions back-to-back (20 tokens) ->
        # flagged starts {1,2,3} and {11,12,13}; 11 - 3 = 8 = k -> ONE
        # merged span of 20 (coverage is contiguous). Its cross-boundary
        # 8-grams (starts 4..10) occur nowhere else -> unflagged.
        (3, "en", f"{r1_r} {r2_r}"),
        # doc4: same regions separated by unique middle (d*) -> 2 spans
        (4, "en", f"{r1_r} {_toks('d', 0, 10)} {r2_r}"),
        # doc5: under 8 tokens -> counted, zero coverage
        (5, "en", _toks("e", 0, 5)),
    ]
    sf = _write_documents(spark, tmp_path, rows)
    [row] = corpus_duplicate_spans(spark, sf).collect()
    assert row.lang == "en"
    assert row.n_docs == 5
    assert row.n_affected == 4
    assert row.total_tokens == 30 + 30 + 20 + 30 + 5
    # docs 1,2,4: 2 spans x 10 tokens; doc3: 1 span x 20 tokens
    assert row.covered_tokens == 20 + 20 + 20 + 20
    assert row.n_spans == 2 + 2 + 1 + 2
    assert row.max_span == 20
    assert row.covered_frac == round(80 / 115, 6)


def _hv(rep: int) -> int:
    return int(hashlib.md5(str(rep).encode()).hexdigest()[:2], 16)


def _split(rep: int) -> str:
    hv = _hv(rep)
    return "train" if hv < 204 else ("val" if hv < 230 else "test")


def test_leakage_split_follows_representative(spark, tmp_path):
    # ids 3 and 17 share text T1: rep = 3 -> 'test' (md5('3')[:2] = 0xec
    # = 236), while 17 ALONE would be 'train' (0x70 = 112) — the
    # adversarial member that must follow its representative.
    assert _split(3) == "test" and _split(17) == "train"
    # id 10 (%10 == 0) gains a verbatim fixture copy at 1000010; the
    # pair forms a 2-member cluster under rep 10's split ('val', 0xd3).
    assert _split(10) == "val"
    t1 = _toks("x", 0, 12)
    t2 = _toks("y", 0, 7)
    sf = _write_documents(
        spark, tmp_path, [(3, "en", t1), (17, "en", t1), (10, "en", t2)]
    )
    rows = {
        (r.split, r.lang): r for r in corpus_leakage_safe_split(spark, sf).collect()
    }
    assert set(rows) == {("test", "en"), ("val", "en")}  # no 'train' row
    test_row = rows[("test", "en")]
    assert test_row.n_docs == 2 and test_row.n_clusters == 1
    assert test_row.n_dup_members == 2
    assert test_row.total_tokens == 24
    val_row = rows[("val", "en")]
    assert val_row.n_docs == 2 and val_row.n_clusters == 1
    assert val_row.n_dup_members == 2
    assert val_row.total_tokens == 14


def test_semantic_dedup_chain_drops_and_multiplicity(spark, tmp_path):
    """a<b<c at 0deg/60deg/120deg: cos(a,b)=cos(b,c)=0.5 >= 0.35 but
    cos(a,c)=-0.5 — the greedy-by-id rule drops BOTH b and c (b's
    dropper is a, c's is b even though b is itself dropped), the
    documented over-drop vs connected-component dedup. Exact copies of
    a (ids 3,4) collapse onto its rep and ride as multiplicity."""
    from pravega_spark.queries.similarity import similarity_semantic_dedup

    s3 = 0.8660254
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.5, s3], 0),
        (2, [-0.5, s3], 0),
        (3, [1.0, 0.0], 0),
        (4, [1.0, 0.0], 0),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    [row] = similarity_semantic_dedup(spark, str(tmp_path)).collect()
    assert row.cluster == 0
    assert row.n_vectors == 5 and row.n_reps == 3
    assert row.n_dropped_reps == 2  # b via a, c via (already-dropped) b
    assert row.n_dropped_vectors == 2


def _write_interval_fixture(spark, tmp_path) -> str:
    """ONE fixture for both interval-overlap tests (so the twins can't
    drift onto different data). Hand-computed sessions (end = last
    event + 30 min):
      err u1 [10:00,10:30]   err u4 [11:30,12:15]   err u7 [10:50,11:20]
      pur u2 [10:30,11:00]   pur u3 [09:50,10:20]   pur u5 [12:10,12:40]
      pur u6 [20:00,20:30]   pur u8 [10:45,11:15]
    Overlaps: u2×u1 boundary touch (0 s) + u2×u7 600 s; u3×u1 1200 s;
    u5×u4 300 s; u8×u7 1500 s — u8 and u7 share BOTH cells {10, 11},
    so the ownership rule is genuinely load-bearing (without it this
    pair double-counts); u6 is scaffold-only."""
    from datetime import datetime as dt

    d = lambda h, m: dt(2024, 3, 1, h, m)  # noqa: E731
    rows = [
        (1, d(10, 0), 1, "error"),
        (2, d(10, 30), 2, "purchase"),
        (3, d(9, 50), 3, "purchase"),
        (4, d(11, 30), 4, "error"),
        (5, d(11, 45), 4, "error"),
        (6, d(12, 10), 5, "purchase"),
        (7, d(20, 0), 6, "purchase"),
        # two-common-cell pair: err u7 [10:50,11:20] x pur u8
        # [10:45,11:15] both explode to cells {10, 11}
        (8, d(10, 50), 7, "error"),
        (9, d(10, 45), 8, "purchase"),
    ]
    df = spark.createDataFrame(
        [(i, ts, u, t, 0.0, "{}") for i, ts, u, t in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_interval_overlap_grid_edges(spark, tmp_path):
    """Grid-decomposition edge cases, hand-computed: an exact boundary
    touch (a.end == b.start) counts with overlap 0; a pair whose
    intervals share TWO 1-hour cells pairs exactly ONCE (the ownership
    rule — deleting the ownership filter fails this test); a session
    with no overlap still scaffolds into n_sessions."""
    from pravega_spark.queries.relational import events_interval_overlap

    src = _write_interval_fixture(spark, tmp_path)
    [row] = events_interval_overlap(spark, src).collect()
    assert row.n_sessions == 5
    assert row.n_overlapped == 4
    assert row.n_pairs == 5
    assert row.avg_overlap_s == round((0 + 600 + 1200 + 300 + 1500) / 5, 6)


def test_interval_overlap_sweepline_equals_grid(spark, tmp_path):
    """The linear sweep-line twin must reproduce the pair-materializing
    grid version frame-exact — on the shared hand fixture (boundary
    touch, two-common-cell pair, scaffold-only sessions all stress the
    prefix algebra's strict/inclusive sides) AND on real sf0.001
    data."""
    from pravega_spark.queries.relational import (
        events_interval_overlap,
        events_interval_overlap_sweepline,
    )

    fixture = _write_interval_fixture(spark, tmp_path)
    for src in (fixture, "/root/testdata/sf0.001"):
        grid = events_interval_overlap(spark, src).collect()
        sweep = events_interval_overlap_sweepline(spark, src).collect()
        assert sweep == grid, src


def test_interval_overlap_sweepline_property(spark, tmp_path):
    """Randomized adversarial check of the sweep-line prefix algebra:
    5 seeded random fixtures biased toward TIES (timestamps drawn from
    a coarse 10-minute grid, so boundary-touch, equal-start,
    equal-end, and probe-collides-with-data cases all occur), each
    asserted sweepline == grid frame-exact. Catches strict/inclusive
    mistakes the hand fixture under-determines; seeds are fixed so a
    failure reproduces."""
    import random
    from datetime import datetime as dt, timedelta

    from pravega_spark.queries.relational import (
        events_interval_overlap,
        events_interval_overlap_sweepline,
    )

    base = dt(2024, 3, 1)
    for seed in range(5):
        rng = random.Random(1000 + seed)
        rows = []
        eid = 0
        for user in range(1, 13):
            etype = "error" if user % 2 else "purchase"
            for _ in range(rng.randint(1, 4)):
                eid += 1
                # coarse 10-min grid over 8 hours => dense ties
                ts = base + timedelta(minutes=10 * rng.randint(0, 48))
                rows.append((eid, ts, user, etype, 0.0, "{}"))
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        dest = tmp_path / f"s{seed}"
        dest.mkdir()
        df.coalesce(1).write.mode("overwrite").parquet(
            str(dest / "events.parquet")
        )
        grid = events_interval_overlap(spark, str(dest)).collect()
        sweep = events_interval_overlap_sweepline(spark, str(dest)).collect()
        assert sweep == grid, f"seed {seed}: {sweep} != {grid}"


def test_cdc_scd2_change_capture(spark, tmp_path):
    """SCD2 semantics, hand-computed on one user walking
    bronze->silver->(silver, no change row)->gold->bronze over a
    rolling 3-purchase sum: equal consecutive tiers emit NO period,
    valid_to is the NEXT change's ts (not the next purchase's), the
    last period per user is current, and closed durations average per
    (day, tier)."""
    from datetime import datetime as dt

    from pravega_spark.queries.relational import events_cdc_scd2_history

    h = lambda hh: dt(2024, 3, 1, hh, 0)  # noqa: E731
    rows = [
        # u1 rolling sums: 50 B | 130 S | 140 S(no change) | 390 G |
        # 315 G | 306 G | 7 B(current)
        (1, h(10), 1, 50.0),
        (2, h(11), 1, 80.0),
        (3, h(12), 1, 10.0),
        (4, h(13), 1, 300.0),
        (5, h(14), 1, 5.0),
        (6, h(15), 1, 1.0),
        (7, h(16), 1, 1.0),
        # u2: single purchase 120 -> silver, current
        (8, h(12), 2, 120.0),
    ]
    df = spark.createDataFrame(
        [(i, ts, u, "purchase", v, "{}") for i, ts, u, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r.tier: r for r in events_cdc_scd2_history(spark, str(tmp_path)).collect()
    }
    assert set(out) == {"bronze", "silver", "gold"}
    b, s, g = out["bronze"], out["silver"], out["gold"]
    # bronze: [10,11) closed + [16,None) current
    assert (b.n_periods, b.n_users, b.n_current, b.avg_closed_s) == (2, 1, 1, 3600.0)
    # silver: u1 [11,13) closed + u2 current
    assert (s.n_periods, s.n_users, s.n_current, s.avg_closed_s) == (2, 2, 1, 7200.0)
    # gold: [13,16) closed — the 14:00/15:00 same-tier rows emit nothing
    assert (g.n_periods, g.n_users, g.n_current, g.avg_closed_s) == (1, 1, 0, 10800.0)


def test_scd2_point_in_time_boundaries(spark, tmp_path):
    """Point-in-time join boundary semantics, hand-computed on the
    SCD2 fixture user (bronze@10 -> silver@11 -> gold@13 -> bronze@16):
    a view BEFORE the first period reads 'none'; a view at EXACTLY a
    change's ts reads the NEW tier (inclusive valid_from); a view
    mid-period reads that period; a view after the last change reads
    the open current period; a user with no purchases is always
    'none'."""
    from datetime import datetime as dt

    from pravega_spark.queries.relational import events_scd2_point_in_time

    h = lambda hh, m=0: dt(2024, 3, 1, hh, m)  # noqa: E731
    purchases = [
        (1, h(10), 1, "purchase", 50.0),
        (2, h(11), 1, "purchase", 80.0),
        (3, h(12), 1, "purchase", 10.0),
        (4, h(13), 1, "purchase", 300.0),
        (5, h(14), 1, "purchase", 5.0),
        (6, h(15), 1, "purchase", 1.0),
        (7, h(16), 1, "purchase", 1.0),
    ]
    views = [
        (10, h(9), 1, "view", 0.0),    # before first period -> none
        (11, h(11), 1, "view", 0.0),   # exact change ts -> NEW tier (silver)
        (12, h(13, 30), 1, "view", 0.0),  # mid gold period
        (13, h(17), 1, "view", 0.0),   # after last change -> current bronze
        (14, h(12), 3, "view", 0.0),   # user with no purchases -> none
    ]
    df = spark.createDataFrame(
        [(i, ts, u, t, v, "{}") for i, ts, u, t, v in purchases + views],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r.tier: (r.n_views, r.n_viewers)
        for r in events_scd2_point_in_time(spark, str(tmp_path)).collect()
    }
    assert out == {
        "none": (2, 2),
        "silver": (1, 1),
        "gold": (1, 1),
        "bronze": (1, 1),
    }


def test_scd2_point_in_time_random_vs_bruteforce(spark, tmp_path):
    """Randomized adversarial check of the union-window temporal join
    against an INDEPENDENT Python brute-force range join (periods
    derived the textbook way, each view matched by from <= ts < to).
    Timestamps ride a coarse grid so view-ts == change-ts collisions
    occur; seeds fixed for reproducibility."""
    import random
    from collections import defaultdict
    from datetime import datetime as dt, timedelta

    from pravega_spark.queries.relational import events_scd2_point_in_time

    base = dt(2024, 3, 1)
    for seed in range(3):
        rng = random.Random(2000 + seed)
        rows = []
        eid = 0
        for user in range(1, 9):
            for _ in range(rng.randint(0, 6)):
                eid += 1
                ts = base + timedelta(minutes=30 * rng.randint(0, 20))
                rows.append((eid, ts, user, "purchase", round(rng.uniform(1, 200), 2)))
            for _ in range(rng.randint(0, 4)):
                eid += 1
                ts = base + timedelta(minutes=30 * rng.randint(0, 20))
                rows.append((eid, ts, user, "view", 0.0))
        df = spark.createDataFrame(
            [(i, ts, u, t, v, "{}") for i, ts, u, t, v in rows],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        dest = tmp_path / f"p{seed}"
        dest.mkdir()
        df.coalesce(1).write.mode("overwrite").parquet(str(dest / "events.parquet"))

        # independent brute force
        purchases = defaultdict(list)
        views = []
        for i, ts, u, t, v in rows:
            if t == "purchase":
                purchases[u].append((ts, i, v))
            else:
                views.append((u, ts))
        periods = defaultdict(list)  # user -> [(from, to|None, tier)]
        for u, ps in purchases.items():
            ps.sort()
            tiers = []
            for idx in range(len(ps)):
                cum = round(sum(v for _, _, v in ps[max(0, idx - 2): idx + 1]), 2)
                tiers.append(
                    "gold" if cum >= 220 else "silver" if cum >= 100 else "bronze"
                )
            changes = [
                (ps[i][0], tiers[i])
                for i in range(len(ps))
                if i == 0 or tiers[i] != tiers[i - 1]
            ]
            for i, (ts, tier) in enumerate(changes):
                to = changes[i + 1][0] if i + 1 < len(changes) else None
                periods[u].append((ts, to, tier))
        agg = defaultdict(lambda: [0, set()])
        for u, ts in views:
            tier = "none"
            for frm, to, t in periods.get(u, []):
                if ts >= frm and (to is None or ts < to):
                    tier = t
                    break
            key = (ts.replace(hour=0, minute=0), tier)
            agg[key][0] += 1
            agg[key][1].add(u)
        expected = sorted(
            (d, t, n, len(us)) for (d, t), (n, us) in agg.items()
        )
        got = sorted(
            (r.day, r.tier, r.n_views, r.n_viewers)
            for r in events_scd2_point_in_time(spark, str(dest)).collect()
        )
        assert got == expected, f"seed {seed}"


def test_weighted_pps_sample_hand_computed(spark, tmp_path):
    """Systematic PPS selection, hand-computed (K=20): lang 'xx' has
    W=200 over 4 docs => stride=10; every doc's weight interval
    crosses a boundary so all are picked, including the w=151 giant
    exactly ONCE (PPS-with-certainty); lang 'yy' W=20 over 10 equal
    docs (w=2 each) => stride=1 < w, all picked; lang 'zz' (W=221,
    stride=12) has one tiny doc among giants whose interval (120,121]
    crosses no multiple of 12 => NOT picked."""
    from pravega_spark.queries.text import corpus_weighted_sample

    rows = []
    did = 0
    # xx: n_chars+1 weights 151, 20, 19, 10 -> W=200, stride=10
    for w in (151, 20, 19, 10):
        rows.append((did, "t", "xx", "s", w - 1)); did += 1
    # yy: ten docs of weight 2 -> W=20, stride=1
    for _ in range(10):
        rows.append((did, "t", "yy", "s", 1)); did += 1
    # zz: 120 + 1 + 100 -> W=221, stride=ceil(221/20)=12;
    # doc2's interval (120,121] contains no multiple of 12 -> skipped
    for w in (120, 1, 100):
        rows.append((did, "t", "zz", "s", w - 1)); did += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {r.lang: r for r in corpus_weighted_sample(spark, str(tmp_path)).collect()}
    assert out["xx"].n_sampled == 4 and out["xx"].w_sampled == 200
    assert out["yy"].n_sampled == 10
    assert out["zz"].n_sampled == 2
    assert out["zz"].w_sampled == 220  # giant docs picked, the w=1 doc not
    # fingerprint pins WHICH zz docs: ids 14 and 16, not the tiny 15
    assert out["zz"].id_fingerprint == 14 + 16


def test_kmeans_tie_breaks_to_smaller_cluster(spark, tmp_path):
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [1.0, 0.0], 0),
        (2, [0.0, 1.0], 1),
        (3, [0.0, 1.0], 1),
        # exact cosine tie vs both INIT centroids (0.707107 after the
        # 6-dp round); labeled 1, must land in cluster 0 (smaller id).
        # vec 5 counterbalances vec 4's pull on label 1's init centroid
        # (avg of [0,1],[0,1],[1,1],[-1,1] = [0, .75] — on-axis, so the
        # tie is exact); its own assignment stays cluster 1 throughout.
        (4, [1.0, 1.0], 1),
        (5, [-1.0, 1.0], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    out = {r.cluster: r for r in similarity_kmeans_refine(spark, str(tmp_path)).collect()}
    assert set(out) == {0, 1}
    assert out[0].n_members == 3 and out[0].n_moved == 1
    assert out[1].n_members == 3 and out[1].n_moved == 0
