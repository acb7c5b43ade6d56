"""Streaming ops: batch/stream parity over the events table."""

import pytest
from pyspark.sql import functions as F

from drone_spark.streaming.windows import (
    dedup_stream, hourly_counts, read_events_stream, run_available_now,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_batch(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet").cache()


@pytest.fixture(scope="module")
def events_dir(spark, events_batch, tmp_path_factory):
    # streaming file sources need a directory, not a single parquet file
    d = str(tmp_path_factory.mktemp("events_stream") / "events")
    events_batch.write.parquet(d)
    return d


def test_hourly_counts_stream_matches_batch(spark, events_batch, events_dir):
    stream = read_events_stream(spark, events_dir)
    got = run_available_now(hourly_counts(stream), "t_hourly", mode="complete")
    exp = (
        events_batch.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
    )
    assert got.count() == exp.count()
    diff = got.select("hour", "event_type", "n_events").exceptAll(
        exp.select("hour", "event_type", "n_events")
    )
    assert diff.count() == 0


def test_stream_dedup(spark, events_batch, tmp_path):
    # duplicate the whole input: dedup must return exactly the originals
    dup_dir = str(tmp_path / "dup")
    events_batch.unionAll(events_batch).repartition(4).write.parquet(dup_dir)
    stream = read_events_stream(spark, dup_dir)
    got = run_available_now(dedup_stream(stream), "t_dedup", mode="append")
    assert got.count() == events_batch.count()
    assert got.select("event_id").distinct().count() == events_batch.count()


def test_edges_stream_matches_batch(spark, small_pages, tmp_path):
    """Streaming crawl ingestion parity: the streamed (extract →
    watermark-deduped) edge set over a static pages directory equals
    the batch edges_from_pages distinct edge set."""
    from drone_spark.extraction import edges_from_pages
    from drone_spark.streaming.ingest import edges_stream, read_pages_stream

    d = str(tmp_path / "pages")
    small_pages.write.parquet(d)
    got = run_available_now(
        edges_stream(read_pages_stream(spark, d)), "t_edges_stream"
    ).select("src", "dst")
    exp = edges_from_pages(small_pages).select("src", "dst")
    assert got.count() == exp.count()
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_edges_stream_dedups_recrawl(spark, small_pages, tmp_path):
    """A page re-crawled within the watermark horizon re-emits its
    out-links; the edge stream must pass each (src, dst) exactly once."""
    from drone_spark.extraction import edges_from_pages
    from drone_spark.streaming.ingest import edges_stream, read_pages_stream

    recrawl = small_pages.withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 HOUR")
    )
    d = str(tmp_path / "pages_recrawl")
    small_pages.unionByName(recrawl).repartition(4).write.parquet(d)
    got = run_available_now(
        edges_stream(read_pages_stream(spark, d)), "t_edges_recrawl"
    )
    assert got.count() == edges_from_pages(small_pages).count()
    assert got.select("src", "dst").distinct().count() == got.count()


def _ev(spark, rows):
    """events rows: (event_id, ts_str, user_id, value)."""
    from drone_spark.streaming.windows import EVENTS_SCHEMA

    df = spark.createDataFrame(
        [(i, ts, u, "click", v, "{}") for (i, ts, u, v) in rows],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    assert df.schema == spark.createDataFrame([], EVENTS_SCHEMA).schema
    return df


def test_sessionize_fixture(spark):
    """Known session boundaries: 30-min gap splits, ≤30-min keeps."""
    from drone_spark.streaming.windows import sessionize

    rows = [
        # user 1: two events 10 min apart -> one session
        (1, "2024-01-01 10:00:00", 1, 1.50),
        (2, "2024-01-01 10:10:00", 1, 2.25),
        # 31-min gap -> new session, single event
        (3, "2024-01-01 10:41:00", 1, 4.00),
        # user 2: exactly 30-min gap is NOT a split (gap > threshold splits)
        (4, "2024-01-01 09:00:00", 2, 1.00),
        (5, "2024-01-01 09:30:00", 2, 1.00),
    ]
    got = {
        (r.user_id, str(r.session_start)): (r.n_events, r.sum_value_c, r.duration_s)
        for r in sessionize(_ev(spark, rows)).collect()
    }
    assert got == {
        (1, "2024-01-01 10:00:00"): (2, 375, 600),
        (1, "2024-01-01 10:41:00"): (1, 400, 0),
        (2, "2024-01-01 09:00:00"): (2, 200, 1800),
    }


def test_sessionize_stream_matches_batch(spark, events_batch, events_dir):
    """session_window streaming plan == gaps-and-islands batch plan on
    (user, start, n, sum); stream duration ≥ batch duration only via the
    gap-subtraction identity (equal when sessions are gap-closed)."""
    from drone_spark.streaming.windows import sessionize, sessionize_stream

    stream = read_events_stream(spark, events_dir)
    got = run_available_now(
        sessionize_stream(stream, gap_minutes=30), "t_sess", mode="complete"
    ).select("user_id", "session_start", "n_events", "sum_value_c", "duration_s")
    exp = sessionize(events_batch, gap_minutes=30).select(
        "user_id", "session_start", "n_events", "sum_value_c", "duration_s"
    )
    assert got.count() == exp.count()
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_sessionize_stateful_matches_batch_closed_sessions(
    spark, events_batch, events_dir
):
    """applyInPandasWithState sessionization == batch gaps-and-islands
    for every session the final watermark closed; nothing extra, and
    every emitted row is exactly a batch row."""
    from drone_spark.streaming.stateful import closed_by, sessionize_stateful
    from drone_spark.streaming.windows import sessionize

    stream = read_events_stream(spark, events_dir)
    got = run_available_now(
        sessionize_stateful(stream, gap_minutes=30), "t_sess_stateful",
        mode="append",
    ).cache()
    batch = sessionize(events_batch, gap_minutes=30).cache()

    # every emitted session is a batch session (exact values)
    assert got.exceptAll(batch).count() == 0

    # and everything provably closed by the final watermark was emitted
    max_us = events_batch.agg(
        F.max(F.unix_micros(F.col("ts").cast("timestamp")))
    ).collect()[0][0]
    final_wm_us = max_us - 2 * 3600 * 1_000_000
    must_have = closed_by(batch, final_wm_us, gap_minutes=30)
    missing = must_have.exceptAll(got).count()
    assert missing == 0, f"{missing} watermark-closed sessions not emitted"
    got.unpersist()
    batch.unpersist()


def test_sessionize_stateful_fixture_withholds_open_session(spark, tmp_path):
    """Deterministic emission check: closed sessions emit exactly the
    batch values; the session the watermark hasn't passed stays in
    state (a far-future event drives the watermark past the others)."""
    from drone_spark.streaming.stateful import sessionize_stateful

    rows = [
        (1, "2024-01-01 10:00:00", 1, 1.50),
        (2, "2024-01-01 10:10:00", 1, 2.25),
        (3, "2024-01-01 10:41:00", 1, 4.00),
        (4, "2024-01-01 09:00:00", 2, 1.00),
        (5, "2024-01-01 09:30:00", 2, 1.00),
        (6, "2024-01-02 23:00:00", 3, 9.99),  # watermark driver
    ]
    d = str(tmp_path / "ev")
    _ev(spark, rows).write.parquet(d)
    got = run_available_now(
        sessionize_stateful(read_events_stream(spark, d)), "t_sf_fix",
        mode="append",
    )
    out = {
        (r.user_id, str(r.session_start)): (r.n_events, r.sum_value_c, r.duration_s)
        for r in got.collect()
    }
    assert out == {
        (1, "2024-01-01 10:00:00"): (2, 375, 600),
        (1, "2024-01-01 10:41:00"): (1, 400, 0),
        (2, "2024-01-01 09:00:00"): (2, 200, 1800),
    }


def test_sessionize_random_events_vs_python_oracle(spark):
    """2,000 random-gap events over 50 users (one Spark job ≈ hundreds
    of independent session cases) vs a pure-Python gaps-and-islands
    fold, exact on every column."""
    import random

    from drone_spark.streaming.windows import sessionize

    rng = random.Random(99)
    base = 1_700_000_000  # epoch seconds
    rows = []
    t = {u: base + rng.randrange(3600) for u in range(50)}
    for i in range(2000):
        u = rng.randrange(50)
        # gaps cluster around the 30-min boundary to stress the edge
        t[u] += rng.choice([5, 60, 600, 1799, 1800, 1801, 3600, 7200])
        rows.append((i, t[u], u, round(rng.uniform(0, 99.99), 2)))
    df = spark.createDataFrame(
        [(i, ts, u, "e", v, "{}") for (i, ts, u, v) in rows],
        "event_id long, ts long, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.timestamp_seconds("ts").cast("timestamp_ntz"))
    got = {
        (r.user_id, r.session_start.timestamp() if hasattr(r.session_start, "timestamp") else r.session_start):
        (r.n_events, r.sum_value_c, r.duration_s)
        for r in sessionize(df, gap_minutes=30).collect()
    }
    # python oracle
    per_user: dict[int, list[tuple[int, float]]] = {}
    for i, ts, u, v in rows:
        per_user.setdefault(u, []).append((ts, v))
    exp = {}
    for u, evs in per_user.items():
        evs.sort()
        start, last, n, cents = None, None, 0, 0
        for ts, v in evs:
            if start is None or ts - last > 1800:
                if start is not None:
                    exp[(u, float(start))] = (n, cents, last - start)
                start, n, cents = ts, 0, 0
            n += 1
            cents += round(v * 100)
            last = ts
        exp[(u, float(start))] = (n, cents, last - start)
    # keys: spark session_start tz handling — compare via sorted tuples
    assert len(got) == len(exp)
    def norm(d):
        return sorted((u, s, *vals) for (u, s), vals in d.items())
    assert norm(got) == norm(exp)


def test_sessionize_stateful_half_cent_parity(spark, tmp_path):
    """ADVICE r3 #1: values like 1.115 round differently under float
    multiply + banker's rounding (111) than under the batch path's
    decimal(18,2) HALF_UP cast (112). Cents are now computed JVM-side
    before the state boundary, so both paths agree on the boundary
    cases the old fixtures never exercised."""
    from drone_spark.streaming.stateful import sessionize_stateful
    from drone_spark.streaming.windows import sessionize

    rows = [
        (1, "2024-01-01 10:00:00", 1, 1.115),
        (2, "2024-01-01 10:05:00", 1, 2.675),
        (3, "2024-01-01 10:10:00", 1, 0.005),
        (4, "2024-01-02 23:00:00", 9, 1.00),  # watermark driver
    ]
    d = str(tmp_path / "ev")
    _ev(spark, rows).write.parquet(d)
    ev = spark.read.parquet(d)

    batch = {
        (r.user_id, str(r.session_start)): r.sum_value_c
        for r in sessionize(ev).collect()
    }
    got = {
        (r.user_id, str(r.session_start)): r.sum_value_c
        for r in run_available_now(
            sessionize_stateful(read_events_stream(spark, d)),
            "t_sf_halfcent", mode="append",
        ).collect()
    }
    key = (1, "2024-01-01 10:00:00")
    assert got[key] == batch[key]
    # the decimal HALF_UP values, not the float-banker ones (380)
    assert batch[key] == 112 + 268 + 1


def test_session_paths_hand_computed(spark):
    """u1 session: v,c,p,v (paths v>c>p, c>p>v); a >30 min gap starts a
    new u1 session with v,c,p again; u2 has a 2-event session (no
    trigram). Expect v>c>p ×2 ranked first, c>p>v ×1 second."""
    from datetime import datetime

    from drone_spark.streaming.windows import session_paths

    def t(mi, s=0):
        return datetime(2024, 1, 1, 10 + mi // 60, mi % 60, s)

    rows = [
        (1, 1, t(0), "v"), (2, 1, t(1), "c"), (3, 1, t(2), "p"),
        (4, 1, t(3), "v"),
        (5, 1, t(60), "v"), (6, 1, t(61), "c"), (7, 1, t(62), "p"),
        (8, 2, t(0), "v"), (9, 2, t(1), "c"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = [tuple(r) for r in session_paths(ev, gap_minutes=30, n=3,
                                           k=10).collect()]
    assert got == [("v>c>p", 2, 1), ("c>p>v", 1, 2)]


def test_session_paths_matches_duckdb_twin(spark):
    import duckdb
    from datetime import datetime, timedelta

    from drone_spark.streaming.windows import session_paths, session_paths_sql

    base = datetime(2024, 1, 1)
    types = ["view", "click", "purchase", "error"]
    rows = [
        (i, i % 7, base + timedelta(minutes=(i * 13) % 300,
                                    microseconds=i * 137),
         types[(i * 5) % 4])
        for i in range(120)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = sorted(map(tuple, session_paths(ev, gap_minutes=30, n=3,
                                          k=10).collect()))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events(event_id BIGINT, user_id BIGINT, "
        "ts TIMESTAMP, event_type VARCHAR)"
    )
    con.executemany("INSERT INTO events VALUES (?, ?, ?, ?)", rows)
    want = sorted(map(tuple, con.execute(
        session_paths_sql(gap_minutes=30, n=3, k=10)).fetchall()))
    assert got == want


def test_near_dup_stream_matches_incremental_batch(spark, tmp_path):
    """Streamed new docs vs a static corpus index produce exactly the
    batch incremental op's pairs (exactly-once through foreachBatch)."""
    from drone_spark.ops.dedup import minhash_lsh_pairs_incremental
    from drone_spark.streaming.ingest import near_dup_stream

    text_a = "the quick brown fox jumps over the lazy dog again and again"
    text_b = "completely different content about distributed graph engines"
    old = spark.createDataFrame(
        [(1, text_a), (2, text_b)], "doc_id long, text string"
    )
    new_rows = [(100, text_a), (101, "novel text nothing shared here at all")]
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    src = str(tmp_path / "src")
    new.coalesce(1).write.parquet(src)
    sink = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    near_dup_stream(stream, old, sink, ck, threshold=0.7)
    got = sorted(
        (r["a"], r["b"]) for r in spark.read.parquet(sink).collect()
    )
    want = sorted(
        (r["a"], r["b"])
        for r in minhash_lsh_pairs_incremental(old, new, threshold=0.7).collect()
    )
    assert got == want == [(1, 100)]


def test_interval_pairs_stream_matches_batch(spark, events_batch, events_dir):
    """Stream-stream interval join ≡ the same join run as a batch —
    every (purchase, prior-hour event) pair, no more, no fewer."""
    from drone_spark.streaming.windows import interval_pairs_stream

    stream = read_events_stream(spark, events_dir)
    got = run_available_now(
        interval_pairs_stream(stream), "t_ssjoin", mode="append"
    )
    p = events_batch.where(F.col("event_type") == "purchase").select(
        F.col("event_id"), F.col("user_id"), F.col("ts").alias("p_ts")
    )
    b = events_batch.where(F.col("event_type") != "purchase").select(
        F.col("event_id").alias("touch_event_id"),
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
    )
    exp = p.join(
        b,
        F.expr(
            "user_id = b_user AND b_ts BETWEEN p_ts - INTERVAL 60 MINUTES"
            " AND p_ts"
        ),
    ).select("event_id", "touch_event_id")
    assert got.count() == exp.count() > 0
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0
