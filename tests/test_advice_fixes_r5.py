"""Round-5 regression tests: ADVICE r4 fixes + VERDICT r4 item 6.

1. tables.py: nanosAsLong timestamp detection is footer-derived (any
   timestamp column, not a hardcoded name list), with the name-list
   fallback only when the footer is unreadable.
2. bucketed.py: the bucketed-copy table name folds source file
   size+mtime in, so a regenerated source at the same path can never be
   served stale from a surviving catalog entry.
3. store.py: HOT_MAX_EST_BYTES=0 disables the WHOLE hot tier, including
   the unknown-stats probe branch for Python-source micro-batches.
4. serializers.py: python_avro_codec UDFs pass null rows through as
   null instead of crashing the whole query.
5. (VERDICT item 6) the private-API Catalyst stats estimate returns
   finite sizes for parquet-backed frames, and a small batch actually
   engages _write_hot_batch — a PySpark bump that breaks the stats API
   fails HERE, loudly, instead of silently degrading to distributed.
"""

import os
import shutil

from pyspark.sql import functions as F

import pravega_spark.store as store_mod
from pravega_spark.config import ScalingPolicy, StreamConfiguration
from pravega_spark.sources.bucketed import _source_fingerprint
from pravega_spark.sources.tables import _TS_COLS, _footer_ts_cols

SF_DIR = "/root/testdata/sf0.001"


# -- 1. footer-derived timestamp detection ------------------------------


def test_footer_ts_cols_detects_events_ts():
    cols = _footer_ts_cols(os.path.join(SF_DIR, "events.parquet"))
    assert "ts" in cols
    # value columns must never be misread as timestamps
    assert "user_id" not in cols and "value" not in cols


def test_footer_ts_cols_orders_lineitem():
    assert "o_orderdate" in _footer_ts_cols(os.path.join(SF_DIR, "orders.parquet"))
    assert "l_shipdate" in _footer_ts_cols(os.path.join(SF_DIR, "lineitem.parquet"))


def test_footer_ts_cols_falls_back_on_unreadable():
    assert _footer_ts_cols("/nonexistent/nowhere.parquet") == frozenset(_TS_COLS)


# -- 2. bucketed-copy freshness -----------------------------------------


def test_bucketed_fingerprint_tracks_source_mtime(tmp_path):
    src = tmp_path / "sf" / "lineitem.parquet"
    src.parent.mkdir()
    shutil.copyfile(os.path.join(SF_DIR, "lineitem.parquet"), src)
    fp1 = _source_fingerprint(str(tmp_path / "sf"), "lineitem")
    os.utime(src, ns=(1, 1))  # same bytes, different mtime -> new copy
    fp2 = _source_fingerprint(str(tmp_path / "sf"), "lineitem")
    assert fp1 != fp2
    # stable when nothing changed
    assert fp2 == _source_fingerprint(str(tmp_path / "sf"), "lineitem")


# -- 3/5. hot-tier routing ----------------------------------------------


def _mk_stream(store):
    store.create_scope("s")
    store.create_stream("s", "ev", StreamConfiguration(scaling=ScalingPolicy.fixed(2)))


def _spy_tiers(store, monkeypatch):
    calls = {"hot": 0, "dist": 0}
    orig_hot, orig_dist = store._write_hot_batch, store._write_distributed_batch

    def hot(*a, **k):
        calls["hot"] += 1
        return orig_hot(*a, **k)

    def dist(*a, **k):
        calls["dist"] += 1
        return orig_dist(*a, **k)

    monkeypatch.setattr(store, "_write_hot_batch", hot)
    monkeypatch.setattr(store, "_write_distributed_batch", dist)
    return calls


def test_estimate_bytes_finite_for_parquet_frame(spark):
    """The Catalyst stats probe (private JVM API) must yield a real,
    finite estimate for parquet-backed frames. If a PySpark bump moves
    the API, _estimate_bytes falls back to the unknown sentinel and this
    assertion fires — the silent-degradation failure mode VERDICT r4
    flagged."""
    from pravega_spark.sources import load_table

    df = load_table(spark, SF_DIR, "events").limit(100)
    est = store_mod.StreamStore._estimate_bytes(df)
    assert 0 < est < store_mod._UNKNOWN_EST_BYTES


def test_small_batch_takes_hot_tier(spark, store, monkeypatch):
    _mk_stream(store)
    calls = _spy_tiers(store, monkeypatch)
    from pravega_spark.sources import load_table

    small = load_table(spark, SF_DIR, "events").limit(50)
    store.write_events("s", "ev", small, routing_key_col="user_id")
    assert calls == {"hot": 1, "dist": 0}
    assert store.read("s", "ev").count() == 50


def test_hot_disabled_gates_probe_branch(spark, store, monkeypatch):
    """HOT_MAX_EST_BYTES=0 documents 'hot tier off'; the unknown-stats
    probe branch must honor it too (ADVICE r4), not sneak micro-batches
    back onto the driver."""
    _mk_stream(store)
    calls = _spy_tiers(store, monkeypatch)
    monkeypatch.setattr(store_mod, "HOT_MAX_EST_BYTES", 0)
    # simulate a Python-source micro-batch: stats unknown
    monkeypatch.setattr(
        store_mod.StreamStore,
        "_estimate_bytes",
        staticmethod(lambda df: store_mod._UNKNOWN_EST_BYTES),
    )
    from pravega_spark.sources import load_table

    small = load_table(spark, SF_DIR, "events").limit(10)
    store.write_events("s", "ev", small, routing_key_col="user_id")
    assert calls["hot"] == 0 and calls["dist"] == 1
    assert store.read("s", "ev").count() == 10


def test_unknown_stats_small_batch_probes_to_hot(spark, store, monkeypatch):
    """With the tier enabled, an unknown-stats micro-batch that fits
    HOT_MAX_ROWS routes hot via the bounded probe collect."""
    _mk_stream(store)
    calls = _spy_tiers(store, monkeypatch)
    monkeypatch.setattr(
        store_mod.StreamStore,
        "_estimate_bytes",
        staticmethod(lambda df: store_mod._UNKNOWN_EST_BYTES),
    )
    from pravega_spark.sources import load_table

    small = load_table(spark, SF_DIR, "events").limit(10)
    store.write_events("s", "ev", small, routing_key_col="user_id")
    assert calls == {"hot": 1, "dist": 0}


# -- 4. avro codec null rows --------------------------------------------


def test_python_avro_codec_null_rows(spark):
    from pravega_spark.functions.serializers import python_avro_codec

    schema = (
        '{"type":"record","name":"E","fields":'
        '[{"name":"a","type":"long"},{"name":"b","type":"string"}]}'
    )
    ser, de = python_avro_codec(schema)
    df = spark.createDataFrame([(1, "x"), (None, None)], "a long, b string")
    enc = df.select(ser(F.struct("a", "b")).alias("payload"))
    rows = enc.collect()
    payloads = [r["payload"] for r in rows]
    assert sum(p is None for p in payloads) == 1  # null row -> null payload
    assert sum(p is not None for p in payloads) == 1
    dec = enc.select(de("payload").alias("rec")).select("rec.a", "rec.b").collect()
    got = {(r["a"], r["b"]) for r in dec}
    assert got == {(1, "x"), (None, None)}


def test_row_count_hint_skips_probe_for_oversized(spark, store, monkeypatch):
    """An exact above-cap row-count hint routes straight to the
    distributed tier — no discarded bounded collect (the r4 'double
    scan' nit)."""
    from pyspark.sql import DataFrame

    from pravega_spark.sources import load_table

    _mk_stream(store)
    monkeypatch.setattr(
        store_mod.StreamStore,
        "_estimate_bytes",
        staticmethod(lambda df: store_mod._UNKNOWN_EST_BYTES),
    )
    monkeypatch.setattr(store_mod, "HOT_MAX_ROWS", 10)
    calls = {"toArrow": 0}
    orig = DataFrame.toArrow

    def counting(self):
        calls["toArrow"] += 1
        return orig(self)

    monkeypatch.setattr(DataFrame, "toArrow", counting)
    small = load_table(spark, SF_DIR, "events").limit(30)
    store.write_events("s", "ev", small, routing_key_col="user_id", row_count_hint=30)
    assert calls["toArrow"] == 0, "oversized hint must skip the probe collect"
    assert store.read("s", "ev").count() == 30


def test_bucketed_copy_reregisters_across_sessions(spark, tmp_path):
    """A complete bucketed copy left on disk by a previous session must
    re-attach via DDL (metadata-only) in a new session — same bucketed
    no-shuffle plan, no rewrite. Simulated in-process by dropping the
    catalog entry while keeping the files, which is exactly the state a
    fresh session sees."""
    import os
    import time

    from pravega_spark.sources.bucketed import _source_fingerprint, bucketed_table
    from pravega_spark.sources.bucketing import is_shuffle_free_join

    sf_dir = "/root/testdata/sf0.001"
    li = bucketed_table(spark, sf_dir, "lineitem")
    od = bucketed_table(spark, sf_dir, "orders")
    li.count(), od.count()

    # forget the catalog entries but keep the files (= new session)
    for name in ("lineitem", "orders"):
        from pravega_spark.sources.bucketed import BUCKETS

        tbl = f"pvs_{name}_b{BUCKETS}_{_source_fingerprint(sf_dir, name)}"
        wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        loc = os.path.join(wh.removeprefix("file:"), tbl)
        assert os.path.isfile(os.path.join(loc, "_SUCCESS"))
        # drop metadata only: external-table DROP leaves files, but these
        # were created managed — snapshot and restore the files instead
        import shutil

        shutil.copytree(loc, str(tmp_path / tbl))
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        if not os.path.isdir(loc):
            shutil.copytree(str(tmp_path / tbl), loc)

    def _file_state(name):
        from pravega_spark.sources.bucketed import BUCKETS

        tbl = f"pvs_{name}_b{BUCKETS}_{_source_fingerprint(sf_dir, name)}"
        wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        loc = os.path.join(wh.removeprefix("file:"), tbl)
        return {
            f: os.stat(os.path.join(loc, f)).st_mtime_ns
            for f in os.listdir(loc)
            if f.endswith(".parquet")
        }

    before = {n: _file_state(n) for n in ("lineitem", "orders")}
    t0 = time.time()
    li2 = bucketed_table(spark, sf_dir, "lineitem")
    od2 = bucketed_table(spark, sf_dir, "orders")
    attach_s = time.time() - t0
    assert attach_s < 5, f"re-attach took {attach_s:.1f}s — rebuilt?"
    # the REAL pin: re-attach must reuse the exact files, not rewrite
    # them (a silent fall-through to rebuild passes the wall-clock check
    # at this SF but changes every file)
    assert {n: _file_state(n) for n in ("lineitem", "orders")} == before
    j = li2.join(od2, li2.l_orderkey == od2.o_orderkey)
    assert is_shuffle_free_join(j)
    assert li2.count() == li.count() and od2.count() == od.count()
