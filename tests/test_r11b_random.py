"""Randomized brute-force equivalence for the late-r11 operators.

Each test generates small random inputs (seeded, deterministic) and
compares the Spark operator against an INDEPENDENT pure-Python
re-derivation of the contract — integer math throughout, so equality
is exact, not approximate. This catches semantics the hand fixtures
under-determine (tie handling, empty groups, boundary inclusion).
"""

import random
from collections import Counter, defaultdict
from datetime import datetime, timedelta

SEEDS = (11, 47)


def _write_events(spark, path, rows):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(path / "events.parquet"))
    return str(path)


def _rand_events(rng, n_users=8, n_days=15, n_events=120):
    t0 = datetime(2024, 3, 1)
    rows = []
    for eid in range(1, n_events + 1):
        ts = t0 + timedelta(
            days=rng.randint(0, n_days - 1), minutes=rng.randint(0, 1439)
        )
        rows.append(
            (
                eid,
                ts,
                rng.randint(1, n_users),
                rng.choice(["a", "b", "c"]),
                float(rng.randint(0, 50)),
                "{}",
            )
        )
    return rows


def test_rolling_distinct_random_vs_bruteforce(spark, tmp_path):
    from pravega_spark.queries.relational import events_rolling_distinct_users

    for seed in SEEDS:
        rng = random.Random(seed)
        rows = _rand_events(rng)
        d = tmp_path / f"s{seed}"
        d.mkdir()
        sf = _write_events(spark, d, rows)
        days = sorted({ts.date() for _, ts, *_ in rows})
        got = {
            r.day.date(): (r.rolling_users, r.rolling_events)
            for r in events_rolling_distinct_users(spark, sf).collect()
        }
        assert set(got) == set(days)
        for day in days:
            lo = day - timedelta(days=6)
            users = {u for _, ts, u, *_ in rows if lo <= ts.date() <= day}
            n_ev = sum(1 for _, ts, *_ in rows if lo <= ts.date() <= day)
            assert got[day] == (len(users), n_ev), (seed, day)


def test_type_transitions_random_vs_bruteforce(spark, tmp_path):
    from pravega_spark.queries.relational import events_type_transitions

    for seed in SEEDS:
        rng = random.Random(seed)
        rows = _rand_events(rng)
        d = tmp_path / f"s{seed}"
        d.mkdir()
        sf = _write_events(spark, d, rows)
        seqs = defaultdict(list)
        for eid, ts, u, t, v, _ in rows:
            seqs[u].append((ts, eid, t))
        counts = Counter()
        for u, evs in seqs.items():
            evs.sort()
            for (_, _, f), (_, _, t) in zip(evs, evs[1:]):
                counts[(f, t)] += 1
        row_tot = Counter()
        for (f, _), n in counts.items():
            row_tot[f] += n
        got = {
            (r.from_type, r.to_type): (r.n, r.p_ppm)
            for r in events_type_transitions(spark, sf).collect()
        }
        want = {
            k: (n, (n * 1_000_000) // row_tot[k[0]]) for k, n in counts.items()
        }
        assert got == want, seed


def test_drift_tvd_random_vs_bruteforce(spark, tmp_path):
    from pravega_spark.queries.relational import events_drift_tvd

    for seed in SEEDS:
        rng = random.Random(seed)
        rows = _rand_events(rng)
        d = tmp_path / f"s{seed}"
        d.mkdir()
        sf = _write_events(spark, d, rows)
        by_t = defaultdict(list)
        for eid, ts, u, t, v, _ in rows:
            by_t[t].append((ts, eid, v))
        want = {}
        for t, evs in by_t.items():
            n = len(evs)
            # discrete median of ts: first value with cume_dist >= 0.5
            ts_sorted = sorted(ts for ts, _, _ in evs)
            split = ts_sorted[-((-n) // 2) - 1]  # ceil(n/2)-th, 0-indexed
            # decile bins over (value, event_id) order: ntile semantics
            order = sorted(evs, key=lambda x: (x[2], x[1]))
            bins = defaultdict(lambda: [0, 0])
            big = n % 10
            size_big, size_small = n // 10 + 1, n // 10
            idx = 0
            for b in range(1, 11):
                sz = size_big if b <= big else size_small
                for _ in range(sz):
                    ts_i = order[idx][0]
                    bins[b][0 if ts_i <= split else 1] += 1
                    idx += 1
            t_a = sum(v[0] for v in bins.values())
            t_b = sum(v[1] for v in bins.values())
            if t_b == 0:  # empty second half => total drift by contract
                tvd = 1_000_000
            else:
                tvd = (
                    sum(
                        abs(
                            (v[0] * 1_000_000) // t_a - (v[1] * 1_000_000) // t_b
                        )
                        for v in bins.values()
                    )
                    // 2
                )
            want[t] = (t_a, t_b, tvd)
        got = {
            r.event_type: (r.n_first_half, r.n_second_half, r.tvd_ppm)
            for r in events_drift_tvd(spark, sf).collect()
        }
        assert got == want, seed


def test_tfidf_random_vs_bruteforce(spark, tmp_path):
    from pravega_spark.queries.text import STOPWORDS, text_tfidf_top_terms

    vocab = ["alpha", "beta", "gamma", "delta", "eps", "the", "of", "ab"]
    for seed in SEEDS:
        rng = random.Random(seed)
        docs = []
        for i in range(1, 13):
            lang = rng.choice(["en", "fr"])
            words = [rng.choice(vocab) for _ in range(rng.randint(3, 12))]
            docs.append((i, lang, " ".join(words)))
        d = tmp_path / f"s{seed}"
        d.mkdir()
        spark.createDataFrame(
            docs, "doc_id long, lang string, text string"
        ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))

        n = len(docs)
        tf = Counter()
        for i, lang, text in docs:
            for w in text.split():
                if len(w) >= 3 and w not in STOPWORDS:
                    tf[(i, lang, w)] += 1
        df_ = Counter(term for (_, _, term) in tf)
        score = Counter()
        dfo = {}
        for (i, lang, term), c in tf.items():
            score[(lang, term)] += c * ((n * 1_000_000) // df_[term])
            dfo[(lang, term)] = df_[term]
        want = []
        by_lang = defaultdict(list)
        for (lang, term), s in score.items():
            by_lang[lang].append((-s, term))
        for lang in sorted(by_lang):
            for rank, (neg_s, term) in enumerate(sorted(by_lang[lang])[:5], 1):
                want.append((lang, rank, term, -neg_s, dfo[(lang, term)]))
        got = [tuple(r) for r in text_tfidf_top_terms(spark, str(d)).collect()]
        assert got == want, seed


def test_source_gini_random_vs_bruteforce(spark, tmp_path):
    from pravega_spark.queries.text import corpus_source_gini

    for seed in SEEDS:
        rng = random.Random(seed)
        docs = []
        for i in range(1, 30):
            docs.append(
                (
                    i,
                    rng.choice(["en", "fr"]),
                    "x",
                    f"s{rng.randint(1, 6)}",
                    rng.randint(1, 500),
                )
            )
        d = tmp_path / f"s{seed}"
        d.mkdir()
        spark.createDataFrame(
            docs, "doc_id long, lang string, text string, source string, n_chars long"
        ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
        agg = Counter()
        for _, lang, _, src, nc in docs:
            agg[(lang, src)] += nc
        want = {}
        by_lang = defaultdict(list)
        for (lang, src), w in agg.items():
            by_lang[lang].append((w, src))
        for lang, ws in by_lang.items():
            ws.sort()
            nn = len(ws)
            sw = sum(w for w, _ in ws)
            siw = sum(i * w for i, (w, _) in enumerate(ws, 1))
            gini = ((2 * siw - (nn + 1) * sw) * 1_000_000) // (nn * sw)
            want[lang] = (nn, sw, gini)
        got = {
            r.lang: (r.n_sources, r.total_chars, r.gini_ppm)
            for r in corpus_source_gini(spark, str(d)).collect()
        }
        assert got == want, seed


def test_pagerank_random_vs_integer_replica(spark, tmp_path):
    """Random small trade graphs vs an independent integer replica of
    the fixed-point recurrence (including dangling nations and nations
    with no in-edges)."""
    from pravega_spark.queries.relational import nation_trade_pagerank

    for seed in SEEDS:
        rng = random.Random(seed)
        nations = [(k, f"N{k}") for k in range(5)]
        suppliers = [(10 + i, rng.randint(0, 3)) for i in range(6)]  # nation 4 dangling
        customers = [(20 + i, rng.randint(0, 4)) for i in range(6)]
        orders = [(30 + i, 20 + rng.randint(0, 5)) for i in range(10)]
        lineitems = [
            (10 + rng.randint(0, 5), 30 + rng.randint(0, 9)) for _ in range(40)
        ]
        d = tmp_path / f"s{seed}"
        d.mkdir()

        def w(name, schema, rows):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(str(d / f"{name}.parquet"))

        w("nation", "n_nationkey long, n_name string", nations)
        w("supplier", "s_suppkey long, s_nationkey long", suppliers)
        w("customer", "c_custkey long, c_nationkey long", customers)
        w("orders", "o_orderkey long, o_custkey long", orders)
        w("lineitem", "l_suppkey long, l_orderkey long", lineitems)

        snat = dict(suppliers)
        cnat = dict(customers)
        ocust = dict(orders)
        name = dict(nations)
        edges = Counter()
        for sk, ok in lineitems:
            edges[(name[snat[sk]], name[cnat[ocust[ok]]])] += 1
        outw = Counter()
        for (s, _), n in edges.items():
            outw[s] += n
        ppm = {e: (n * 1_000_000) // outw[e[0]] for e, n in edges.items()}
        nv = len(nations)
        SCALE = 10**12
        base = (15 * (SCALE // nv)) // 100
        rank = {name[k]: SCALE // nv for k, _ in nations}
        for _ in range(3):
            contrib = Counter()
            for (s, t), p in ppm.items():
                contrib[t] += (rank[s] * p) // 1_000_000
            rank = {v: base + (85 * contrib[v]) // 100 for v in rank}
        got = {r.nation: r.rank_scaled for r in nation_trade_pagerank(spark, str(d)).collect()}
        assert got == rank, seed


def test_path_trigrams_random_vs_bruteforce(spark, tmp_path):
    from pravega_spark.queries.relational import events_path_trigrams

    for seed in SEEDS:
        rng = random.Random(seed)
        rows = _rand_events(rng, n_users=5, n_days=3, n_events=60)
        d = tmp_path / f"s{seed}"
        d.mkdir()
        sf = _write_events(spark, d, rows)
        seqs = defaultdict(list)
        for eid, ts, u, t, v, _ in rows:
            seqs[u].append((ts, eid, t))
        counts = Counter()
        for u, evs in seqs.items():
            evs.sort()
            types = [t for _, _, t in evs]
            for i in range(len(types) - 2):
                counts[tuple(types[i : i + 3])] += 1
        total = sum(counts.values())
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        want = [
            (t1, t2, t3, n, (n * 1_000_000) // total)
            for (t1, t2, t3), n in ranked
        ]
        got = [tuple(r) for r in events_path_trigrams(spark, sf).collect()]
        assert got == want, seed


def test_basket_lift_random_vs_bruteforce(spark, tmp_path):
    from pravega_spark.queries.relational import lineitem_basket_lift

    for seed in SEEDS:
        rng = random.Random(seed)
        parts = [(pk, f"B{rng.randint(1, 5)}") for pk in range(1, 13)]
        lis = [
            (ok, rng.randint(1, 12))
            for ok in range(1, 16)
            for _ in range(rng.randint(1, 5))
        ]
        d = tmp_path / f"s{seed}"
        d.mkdir()
        spark.createDataFrame(parts, "p_partkey long, p_brand string").coalesce(
            1
        ).write.mode("overwrite").parquet(str(d / "part.parquet"))
        spark.createDataFrame(lis, "l_orderkey long, l_partkey long").coalesce(
            1
        ).write.mode("overwrite").parquet(str(d / "lineitem.parquet"))
        pb = dict(parts)
        baskets = defaultdict(set)
        for ok, pk in lis:
            baskets[ok].add(pb[pk])
        n_orders = len(baskets)
        brand_n = Counter()
        pair_n = Counter()
        for bs in baskets.values():
            for b in bs:
                brand_n[b] += 1
            bl = sorted(bs)
            for i in range(len(bl)):
                for j in range(i + 1, len(bl)):
                    pair_n[(bl[i], bl[j])] += 1
        scored = []
        for (a, b), n_ab in pair_n.items():
            support = (n_ab * 1_000_000) // n_orders
            lift = (((n_ab * 1_000_000) // brand_n[a]) * n_orders) // brand_n[b]
            scored.append((a, b, n_ab, support, lift))
        want = sorted(scored, key=lambda r: (-r[4], r[0], r[1]))[:15]
        got = [tuple(r) for r in lineitem_basket_lift(spark, str(d)).collect()]
        assert got == want, seed


def test_rake_random_vs_bruteforce(spark, tmp_path):
    from pravega_spark.queries.text import STOPWORDS, text_rake_keywords

    vocab = ["alpha", "beta", "gamma", "delta", "the", "of", "in", "and"]
    for seed in SEEDS:
        rng = random.Random(seed)
        docs = [
            (i, "en", " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 14))))
            for i in range(1, 10)
        ]
        d = tmp_path / f"s{seed}"
        d.mkdir()
        spark.createDataFrame(
            docs, "doc_id long, lang string, text string"
        ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))

        # replica: phrases = maximal non-stopword runs
        phrases = []  # (doc, pid, [words])
        for did, _, text in docs:
            run, pid = [], 0
            for tok in text.split():
                if tok in STOPWORDS:
                    if run:
                        phrases.append((did, pid, run))
                    run, pid = [], pid + 1
                else:
                    run = run + [tok]
            if run:
                phrases.append((did, pid, run))
        freq, deg = Counter(), Counter()
        for _, _, ws in phrases:
            for w in ws:
                freq[w] += 1
                deg[w] += len(ws)
        wscore = {w: (deg[w] * 1_000_000) // freq[w] for w in freq}
        agg = {}
        for _, _, ws in phrases:
            if not (2 <= len(ws) <= 4):
                continue
            ph = " ".join(ws)
            sc = sum(wscore[w] for w in ws)
            n, _ = agg.get(ph, (0, 0))
            agg[ph] = (n + 1, sc)
        want = sorted(
            [(ph, n, sc) for ph, (n, sc) in agg.items()],
            key=lambda r: (-r[2], r[0]),
        )[:10]
        got = [tuple(r) for r in text_rake_keywords(spark, str(d)).collect()]
        assert got == want, seed


def test_inter_arrival_random_vs_bruteforce(spark, tmp_path):
    from pravega_spark.queries.relational import events_inter_arrival

    for seed in SEEDS:
        rng = random.Random(seed)
        rows = _rand_events(rng, n_users=4, n_days=2, n_events=50)
        d = tmp_path / f"s{seed}"
        d.mkdir()
        sf = _write_events(spark, d, rows)
        seqs = defaultdict(list)
        for eid, ts, u, t, v, _ in rows:
            seqs[(u, t)].append((ts, eid))
        gaps = defaultdict(list)
        for (u, t), evs in seqs.items():
            evs.sort()
            for (a, _), (b, _) in zip(evs, evs[1:]):
                gaps[t].append(int((b - a).total_seconds()))

        def disc(xs, q):
            xs = sorted(xs)
            import math
            return xs[max(0, math.ceil(q * len(xs)) - 1)]

        want = {
            t: (
                len(g),
                disc(g, 0.5),
                disc(g, 0.9),
                (sum(1 for x in g if x < 60) * 1_000_000) // len(g),
            )
            for t, g in gaps.items()
        }
        got = {
            r.event_type: (r.n_gaps, r.p50_s, r.p90_s, r.burst_ppm)
            for r in events_inter_arrival(spark, sf).collect()
        }
        assert got == want, seed
