"""Behavioral analytics over the events table — funnel conversion and
cohort retention, the two canonical product-analytics queries — plus
redirect-chain resolution for the crawl frontier (pointer doubling).

All outputs are integer/exact (counts, epoch-week buckets), so every
query hash-matches its DuckDB oracle bit-for-bit. Pure DataFrame
codegen — no Python on any path; one partial-agg shuffle per stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel(
    events: DataFrame,
    stages: list[str],
    horizon_s: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered first-touch funnel: (stage_idx, stage, n_users) — how
    many users reach stage i having cleared stages 0..i−1 IN ORDER.

    A user clears stage 0 at their earliest stages[0] event, and
    stage i at the earliest stages[i] event STRICTLY after their
    stage-(i−1) clear (strict ordering makes the result independent
    of any total-order tie-break between equal timestamps).
    ``horizon_s`` additionally requires every clear to land within
    that many seconds of the stage-0 clear — the standard "converted
    within N days" form.

    Plan shape at 100 TB: each stage is one stage-filtered partial-agg
    groupBy(user) joined to the (|users|-row) running clear table —
    the raw event table is scanned once per stage with the type filter
    pushed to the scan; no window over raw events, no self-join of the
    event table against itself. The per-level clear tables are
    persisted so the final union of per-stage counts doesn't recompute
    the walk."""
    if not stages:
        raise ValueError("funnel requires at least one stage")
    clears = (
        events.where(F.col(type_col) == stages[0])
        .groupBy(F.col(user_col).alias("u"))
        .agg(F.min(ts_col).alias("c"))
        .withColumn("c0", F.col("c"))
    )
    levels = []
    for i, stage in enumerate(stages):
        if i > 0:
            nxt = (
                events.where(F.col(type_col) == stage)
                .select(F.col(user_col).alias("u"), F.col(ts_col).alias("t"))
                .join(clears.select("u", "c", "c0"), "u")
                .where(F.col("t") > F.col("c"))
            )
            if horizon_s is not None:
                nxt = nxt.where(
                    F.col("t") <= F.col("c0") + F.expr(f"INTERVAL {horizon_s} SECOND")
                )
            clears = nxt.groupBy("u", "c0").agg(F.min("t").alias("c"))
        clears = clears.persist()
        levels.append(
            clears.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i).cast("long").alias("stage_idx"),
                F.lit(stage).alias("stage"),
                F.col("n_users").cast("long"),
            )
        )
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionAll(lv)
    return out


def funnel_sql(
    stages: list[str],
    horizon_s: int | None = None,
    table: str = "events",
) -> str:
    """DuckDB twin of :func:`funnel`."""
    ctes = [
        (
            "c0 AS (SELECT user_id AS u, MIN(ts) AS c, MIN(ts) AS first "
            f"FROM {table} WHERE event_type = '{stages[0]}' GROUP BY user_id)"
        )
    ]
    for i, stage in enumerate(stages[1:], start=1):
        hz = (
            f" AND e.ts <= p.first + INTERVAL '{horizon_s} seconds'"
            if horizon_s is not None else ""
        )
        ctes.append(
            f"c{i} AS (SELECT e.user_id AS u, MIN(e.ts) AS c, p.first "
            f"FROM {table} e JOIN c{i-1} p ON p.u = e.user_id "
            f"WHERE e.event_type = '{stage}' AND e.ts > p.c{hz} "
            "GROUP BY e.user_id, p.first)"
        )
    selects = " UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS stage_idx, '{s}' AS stage, "
        f"CAST((SELECT COUNT(*) FROM c{i}) AS BIGINT) AS n_users"
        for i, s in enumerate(stages)
    )
    return "WITH " + ", ".join(ctes) + " " + selects


WEEK_S = 7 * 24 * 3600


def retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_weeks: int | None = None,
) -> DataFrame:
    """Weekly cohort retention: (cohort_week, week_offset, n_users) —
    users whose FIRST event falls in epoch-week w (cohort) and who are
    active again (any event) in week w+offset. offset 0 row = cohort
    size. Epoch weeks are ⌊epoch_seconds / 604800⌋ — exact integers,
    timezone-free, identical across engines.

    Plan: one partial-agg min per user (cohort), one distinct over
    (user, week) — both corpus-wide shuffles a 100 TB pipeline pays
    anyway — then a user-keyed join and a tiny (weeks²) final agg."""
    # NTZ columns cast through TIMESTAMP first (session tz is pinned
    # to UTC in session.py, so NTZ values are read as UTC — the same
    # convention DuckDB's epoch() applies to naive timestamps)
    uw = events.select(
        F.col(user_col).alias("u"),
        F.floor(
            F.col(ts_col).cast("timestamp").cast("long") / WEEK_S
        ).cast("long").alias("wk"),
    )
    cohort = uw.groupBy("u").agg(F.min("wk").alias("cw"))
    act = uw.distinct()
    out = (
        act.join(cohort, "u")
        .select("cw", (F.col("wk") - F.col("cw")).alias("off"))
    )
    if max_weeks is not None:
        out = out.where(F.col("off") <= max_weeks)
    return out.groupBy(
        F.col("cw").alias("cohort_week"), F.col("off").alias("week_offset")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_users"))


def retention_sql(max_weeks: int | None = None, table: str = "events") -> str:
    """DuckDB twin of :func:`retention`."""
    cap = f"WHERE wk - cw <= {max_weeks} " if max_weeks is not None else ""
    return (
        "WITH uw AS (SELECT DISTINCT user_id AS u, "
        # FLOOR(epoch) first: DuckDB's epoch(ts) is a DOUBLE with
        # fractional seconds, Spark's ts.cast(long) truncates — match
        # the truncation before the week division
        f"CAST(FLOOR(epoch(ts)) AS BIGINT) // {WEEK_S} AS wk "
        f"FROM {table}), "
        "cohort AS (SELECT u, MIN(wk) AS cw FROM uw GROUP BY u) "
        "SELECT cw AS cohort_week, wk - cw AS week_offset, "
        "CAST(COUNT(*) AS BIGINT) AS n_users "
        f"FROM uw JOIN cohort USING (u) {cap}"
        "GROUP BY cw, wk - cw"
    )


def resolve_redirects(redirects: DataFrame, max_hops: int = 16) -> DataFrame:
    """Redirect/rel=canonical chain resolution by pointer doubling:
    (src, final, hops, resolved) — ``final`` is the node reached after
    following min(chain length, ``max_hops``) redirects from ``src``;
    ``resolved`` is true iff final has no outgoing redirect (chains
    into cycles, or longer than the cap, report resolved = false).
    ``max_hops`` is rounded up to the next power of two — doubling
    follows exactly 2^k hops, so the cap is honest.

    Input must be a function graph (≤1 outgoing per src); duplicate
    srcs are collapsed to the smallest dst for determinism.

    The Spark-first superstep shape: pointer doubling needs only
    ⌈log₂ H⌉ self-joins of the (src, cur) state — 16-hop chains cost
    4 shuffles, not 16 — and every join is state⋈state keyed on the
    same column, so a bucketed state table co-locates them. The
    DuckDB twin walks hop-by-hop with a recursive CTE; both reach the
    identical fixpoint."""
    import math

    k = max(1, math.ceil(math.log2(max_hops)))
    nxt = (
        redirects.select("src", "dst")
        .groupBy("src")
        .agg(F.min("dst").alias("dst"))
        .persist()
    )
    # state: src → (cur, hops, done); done once cur has no outgoing edge
    state = nxt.select(
        "src", F.col("dst").alias("cur"), F.lit(1).cast("long").alias("hops")
    )
    for _ in range(k):
        jump = (
            state.alias("s")
            .join(
                state.select(
                    F.col("src").alias("cur"),
                    F.col("cur").alias("cur2"),
                    F.col("hops").alias("hops2"),
                ),
                "cur",
                "left",
            )
        )
        state = jump.select(
            "src",
            F.coalesce("cur2", "cur").alias("cur"),
            (F.col("hops") + F.coalesce("hops2", F.lit(0))).alias("hops"),
        )
    has_out = nxt.select(F.col("src").alias("cur"), F.lit(1).alias("_o"))
    return (
        state.join(has_out, "cur", "left")
        .select(
            "src",
            F.col("cur").alias("final"),
            F.col("hops").cast("long").alias("hops"),
            F.col("_o").isNull().alias("resolved"),
        )
    )


def resolve_redirects_sql(redirects_cte: str, max_hops: int = 16) -> str:
    """DuckDB twin of :func:`resolve_redirects`. ``redirects_cte`` must
    define a CTE named ``redirects(src, dst)`` (pre-deduped or not —
    the twin collapses duplicate srcs to min dst the same way)."""
    import math

    h = 2 ** max(1, math.ceil(math.log2(max_hops)))
    return (
        f"WITH RECURSIVE {redirects_cte}, "
        "nxt AS (SELECT src, MIN(dst) AS dst FROM redirects GROUP BY src), "
        "walk AS ("
        "SELECT src AS u, dst AS cur, 1 AS hops FROM nxt "
        "UNION ALL "
        "SELECT w.u, n.dst, w.hops + 1 FROM walk w "
        f"JOIN nxt n ON n.src = w.cur WHERE w.hops < {h}), "
        "last AS (SELECT u, cur, hops FROM ("
        "SELECT u, cur, hops, ROW_NUMBER() OVER (PARTITION BY u "
        "ORDER BY hops DESC) AS rn FROM walk) WHERE rn = 1) "
        "SELECT l.u AS src, l.cur AS final, CAST(l.hops AS BIGINT) AS hops, "
        "n.src IS NULL AS resolved "
        "FROM last l LEFT JOIN nxt n ON n.src = l.cur"
    )


HOUR_S = 3600


def trending(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    min_prev: int = 1,
) -> DataFrame:
    """Hour-over-hour trend per event type: (event_type, epoch_hour,
    n_events, prev_n, trend_ppm) with trend_ppm = ⌊10⁶·n / prev_n⌋
    against the immediately PRECEDING hour (gap hours yield NULL
    prev_n/trend_ppm — a burst after silence is "new", not an ∞
    ratio). The spike/trending-topics primitive every crawl/feed
    pipeline runs.

    Epoch hours are ⌊epoch_seconds / 3600⌋ — exact integers, timezone-
    free (the retention convention). The lag is a window function over
    (type, hour): at scale that's one shuffle by type — same key as
    the count agg, so AQE coalesces them; no driver-side state.

    ``min_prev`` suppresses ratios over tiny bases (prev_n < min_prev
    → NULL trend_ppm) — a 1-event hour "trending" 50× is noise."""
    hourly = (
        events.select(
            F.col(type_col).alias("event_type"),
            F.floor(
                F.col(ts_col).cast("timestamp").cast("long") / HOUR_S
            ).cast("long").alias("epoch_hour"),
        )
        .groupBy("event_type", "epoch_hour")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("epoch_hour")
    prev = F.when(
        F.lag("epoch_hour").over(w) == F.col("epoch_hour") - 1,
        F.lag("n_events").over(w),
    )
    return hourly.select(
        "event_type",
        "epoch_hour",
        "n_events",
        prev.cast("long").alias("prev_n"),
        F.when(
            prev >= min_prev, F.expr("1000000 * n_events")
        ).alias("_num"),
        prev.alias("_den"),
    ).select(
        "event_type",
        "epoch_hour",
        "n_events",
        "prev_n",
        F.expr("_num div _den").cast("long").alias("trend_ppm"),
    )


def trending_sql(
    table: str = "events", min_prev: int = 1
) -> str:
    """DuckDB twin of :func:`trending`."""
    return (
        "WITH hourly AS (SELECT event_type, "
        f"CAST(FLOOR(epoch(ts)) AS BIGINT) // {HOUR_S} AS epoch_hour, "
        "CAST(COUNT(*) AS BIGINT) AS n_events FROM "
        f"{table} GROUP BY event_type, epoch_hour), "
        "lagged AS (SELECT event_type, epoch_hour, n_events, "
        "CASE WHEN LAG(epoch_hour) OVER w = epoch_hour - 1 "
        "THEN LAG(n_events) OVER w END AS prev_n FROM hourly "
        "WINDOW w AS (PARTITION BY event_type ORDER BY epoch_hour)) "
        "SELECT event_type, epoch_hour, n_events, "
        "CAST(prev_n AS BIGINT) AS prev_n, "
        f"CAST(CASE WHEN prev_n >= {min_prev} THEN"
        " (1000000 * n_events) // prev_n END AS BIGINT) AS trend_ppm "
        "FROM lagged"
    )


def bot_flags(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_per_minute: int = 10,
) -> DataFrame:
    """Rate-based automation screening — the crawl-log/abuse primitive
    (robotic clients burst far above human event rates; cf. Heritrix /
    server-log analytics practice): per user, how bursty is the
    busiest minute, and how dense is activity across active minutes.

    Result: (user_id, n_events, active_minutes, max_minute_events,
    rate_ppm, is_bot) where active_minutes counts distinct epoch
    minutes with ≥1 event, rate_ppm = ⌊10⁶·n_events/active_minutes⌋
    (mean events per ACTIVE minute — idle gaps don't dilute it, so a
    returning bot can't hide behind a long lifetime), and is_bot = 1
    iff max_minute_events ≥ ``max_per_minute``. All-integer output
    (epoch-minute buckets, ppm quotients — the trending/retention
    conventions) so the DuckDB twin hash-matches bit-for-bit.

    Plan: one partial-agg count by (user, minute), one agg by user —
    two shuffles on uniform keys, no windows, no Python."""
    per_min = (
        events.select(
            F.col(user_col).alias("user_id"),
            F.floor(F.col(ts_col).cast("timestamp").cast("long") / 60)
            .cast("long")
            .alias("epoch_min"),
        )
        .groupBy("user_id", "epoch_min")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return (
        per_min.groupBy("user_id")
        .agg(
            F.sum("n").cast("long").alias("n_events"),
            F.count(F.lit(1)).cast("long").alias("active_minutes"),
            F.max("n").cast("long").alias("max_minute_events"),
        )
        .select(
            "user_id",
            "n_events",
            "active_minutes",
            "max_minute_events",
            F.expr("(1000000 * n_events) div active_minutes")
            .cast("long")
            .alias("rate_ppm"),
            (F.col("max_minute_events") >= max_per_minute)
            .cast("long")
            .alias("is_bot"),
        )
    )


def bot_flags_sql(table: str = "events", max_per_minute: int = 10) -> str:
    """DuckDB twin of :func:`bot_flags`."""
    return (
        "WITH per_min AS (SELECT user_id, "
        "CAST(FLOOR(epoch(ts)) AS BIGINT) // 60 AS epoch_min, "
        "CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM {table} GROUP BY user_id, epoch_min) "
        "SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_events, "
        "CAST(COUNT(*) AS BIGINT) AS active_minutes, "
        "CAST(MAX(n) AS BIGINT) AS max_minute_events, "
        "CAST((1000000 * SUM(n)) // COUNT(*) AS BIGINT) AS rate_ppm, "
        f"CAST(CASE WHEN MAX(n) >= {max_per_minute} THEN 1 ELSE 0 END "
        "AS BIGINT) AS is_bot "
        "FROM per_min GROUP BY user_id"
    )


def km_survival(
    events: DataFrame,
    start_type: str = "signup",
    event_type: str = "purchase",
) -> DataFrame:
    """Kaplan–Meier survival curve of time-to-conversion in ppm fixed
    point — the product-limit estimator (Kaplan & Meier 1958) over the
    signup→purchase funnel, with users who never convert right-censored
    at the end of the observation window.

    Integer contract: durations are whole days
    ((unix(t1) − unix(t0)) DIV 86400 — Spark's unix_timestamp and
    DuckDB's date_diff('second') both count floored-second boundaries),
    and each KM step multiplies the running ppm survival by
    (n_t − d_t) DIV n_t in int64 — the DuckDB twin replays the same
    recurrence as a recursive CTE.

    Scale note: the per-time risk/death table is VALUE-space bounded
    (distinct event days, not users), like kmeans' k·d centroid
    traffic — only that tiny table reaches the driver for the
    sequential product; the per-user scan/aggregation is fully
    distributed. Returns (t_days, n_risk, n_events, surv_ppm) at event
    times."""
    st = (
        events.where(F.col("event_type") == start_type)
        .groupBy("user_id")
        .agg(F.min("ts").alias("st"))
    )
    pt = (
        events.where(F.col("event_type") == event_type)
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    t_end = events.agg(F.max("ts").alias("te"))
    obs = (
        st.join(pt, "user_id", "left")
        .crossJoin(F.broadcast(t_end))
        .select(
            "user_id",
            F.when(
                F.col("pt").isNotNull() & (F.col("pt") >= F.col("st")),
                F.expr("(unix_timestamp(pt) - unix_timestamp(st)) DIV 86400"),
            ).alias("dur"),
            F.expr("(unix_timestamp(te) - unix_timestamp(st)) DIV 86400").alias(
                "cens"
            ),
        )
        .select(
            "user_id",
            F.coalesce("dur", F.col("cens")).alias("obs"),
            F.col("dur").isNotNull().cast("int").alias("ev"),
        )
    )
    deaths = (
        obs.where(F.col("ev") == 1)
        .groupBy(F.col("obs").alias("t"))
        .agg(F.count(F.lit(1)).alias("d"))
    )
    at_risk = (
        deaths.select("t")
        .join(obs, F.expr("obs >= t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tnd = sorted(
        (r["t"], r["n"], r["d"])
        for r in deaths.join(at_risk, "t").collect()
    )
    rows, s = [], 1_000_000
    for t, n, d in tnd:
        s = s * (n - d) // n
        rows.append((int(t), int(n), int(d), int(s)))
    spark = events.sparkSession
    return spark.createDataFrame(
        rows, "t_days long, n_risk long, n_events long, surv_ppm long"
    )


def km_survival_sql(
    events_table: str = "events",
    start_type: str = "signup",
    event_type: str = "purchase",
) -> str:
    """DuckDB twin of :func:`km_survival` (recursive-CTE product)."""
    return (
        "WITH RECURSIVE "
        f"st AS (SELECT user_id, MIN(ts) AS st FROM {events_table} "
        f"WHERE event_type = '{start_type}' GROUP BY user_id), "
        f"pt AS (SELECT user_id, MIN(ts) AS pt FROM {events_table} "
        f"WHERE event_type = '{event_type}' GROUP BY user_id), "
        f"te AS (SELECT MAX(ts) AS te FROM {events_table}), "
        "obs0 AS (SELECT st.user_id, "
        "CASE WHEN pt.pt IS NOT NULL AND pt.pt >= st.st THEN "
        "date_diff('second', st.st, pt.pt) // 86400 END AS dur, "
        "date_diff('second', st.st, te.te) // 86400 AS cens "
        "FROM st LEFT JOIN pt ON st.user_id = pt.user_id, te), "
        "obs AS (SELECT user_id, COALESCE(dur, cens) AS obs, "
        "CASE WHEN dur IS NOT NULL THEN 1 ELSE 0 END AS ev FROM obs0), "
        "deaths AS (SELECT obs AS t, COUNT(*) AS d FROM obs "
        "WHERE ev = 1 GROUP BY obs), "
        "atrisk AS (SELECT d.t, COUNT(*) AS n FROM deaths d "
        "JOIN obs o ON o.obs >= d.t GROUP BY d.t), "
        "ev AS (SELECT deaths.t, atrisk.n, deaths.d, "
        "ROW_NUMBER() OVER (ORDER BY deaths.t) AS i "
        "FROM deaths JOIN atrisk ON deaths.t = atrisk.t), "
        "km(i, t, n, d, s) AS ("
        "SELECT i, t, n, d, (1000000 * (n - d)) // n FROM ev WHERE i = 1 "
        "UNION ALL SELECT e.i, e.t, e.n, e.d, (k.s * (e.n - e.d)) // e.n "
        "FROM km k JOIN ev e ON e.i = k.i + 1) "
        "SELECT CAST(t AS BIGINT) AS t_days, CAST(n AS BIGINT) AS n_risk, "
        "CAST(d AS BIGINT) AS n_events, CAST(s AS BIGINT) AS surv_ppm "
        "FROM km"
    )


def attribution(
    events: DataFrame,
    gap_minutes: int = 30,
    conv_type: str = "purchase",
) -> DataFrame:
    """Marketing-style conversion attribution over gaps-and-islands
    sessions: every ``conv_type`` event's value is credited to a
    *channel* under two models — **first_touch** (the first event_type
    of the session, 'direct' if the conversion opens the session) and
    **last_touch** (the event_type immediately preceding the
    conversion, 'direct' if none). The companion to funnel()/
    retention(): which upstream behavior "caused" the purchase.

    Result: (channel, model, conversions, revenue_cents) — long form,
    one row per channel × {first_touch, last_touch}. Exact integers:
    revenue in cents via the decimal cast (same contract as
    streaming/windows.sessionize), session boundaries in int64
    microseconds so both engines agree on sub-second gaps.

    Scale shape: both analytic windows are PARTITION BY user_id — one
    hash exchange total, reused by the sid window and the lag/first
    windows (same key); the final rollup is a partial-agg groupBy over
    ≤ |event_types|·2 rows. No Python anywhere.
    """
    from pyspark.sql import Window

    from ..streaming.windows import _us

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.when(
            F.lag("ts").over(w).isNull()
            | (_us("ts") - _us(F.lag("ts").over(w)) > gap_us),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_sess"),
    )
    sess = flagged.withColumn(
        "sid", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    ws = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    attributed = sess.select(
        "event_type",
        "value",
        F.when(F.row_number().over(ws) == 1, F.lit("direct"))
        .otherwise(F.first("event_type").over(ws))
        .alias("first_touch"),
        F.coalesce(F.lag("event_type").over(ws), F.lit("direct")).alias(
            "last_touch"
        ),
    ).where(F.col("event_type") == conv_type)
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    conv = attributed.select(
        "first_touch", "last_touch", cents.alias("cents")
    )
    ft = conv.groupBy(F.col("first_touch").alias("channel")).agg(
        F.count(F.lit(1)).cast("long").alias("conversions"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    ).withColumn("model", F.lit("first_touch"))
    lt = conv.groupBy(F.col("last_touch").alias("channel")).agg(
        F.count(F.lit(1)).cast("long").alias("conversions"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    ).withColumn("model", F.lit("last_touch"))
    return ft.unionByName(lt).select(
        "channel", "model", "conversions", "revenue_cents"
    )


def attribution_sql(
    gap_minutes: int = 30,
    conv_type: str = "purchase",
    table: str = "events",
) -> str:
    """DuckDB twin of :func:`attribution`."""
    gap_us = gap_minutes * 60 * 1_000_000
    return (
        "WITH flagged AS (SELECT user_id, ts, event_id, event_type, value, "
        "CASE WHEN LAG(ts) OVER w IS NULL OR "
        f"epoch_us(ts) - epoch_us(LAG(ts) OVER w) > {gap_us} "
        "THEN 1 ELSE 0 END AS new_sess "
        f"FROM {table} WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "sess AS (SELECT *, SUM(new_sess) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING) AS sid FROM flagged), "
        "attributed AS (SELECT event_type, value, "
        "CASE WHEN ROW_NUMBER() OVER ws = 1 THEN 'direct' "
        "ELSE FIRST_VALUE(event_type) OVER ws END AS first_touch, "
        "COALESCE(LAG(event_type) OVER ws, 'direct') AS last_touch "
        "FROM sess WINDOW ws AS "
        "(PARTITION BY user_id, sid ORDER BY ts, event_id)), "
        "conv AS (SELECT first_touch, last_touch, "
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents "
        f"FROM attributed WHERE event_type = '{conv_type}') "
        "SELECT first_touch AS channel, 'first_touch' AS model, "
        "CAST(COUNT(*) AS BIGINT) AS conversions, "
        "CAST(SUM(cents) AS BIGINT) AS revenue_cents "
        "FROM conv GROUP BY first_touch "
        "UNION ALL "
        "SELECT last_touch AS channel, 'last_touch' AS model, "
        "CAST(COUNT(*) AS BIGINT) AS conversions, "
        "CAST(SUM(cents) AS BIGINT) AS revenue_cents "
        "FROM conv GROUP BY last_touch"
    )


def bursts(
    events: DataFrame,
    lookback: int = 24,
    min_window: int = 12,
    z2_times_10: int = 90,
) -> DataFrame:
    """Burst detection on the hourly event-rate series: an hour is a
    burst when its count sits more than z standard deviations above
    the trailing ``lookback``-hour mean (per event_type). The
    rate-anomaly complement to `trending` (which ranks hour-over-hour
    RATIOS; bursts gate on variance, so a noisy-but-stable series
    never fires).

    Exact-integer contract: with n = trailing-window size, s = Σcnt,
    ss = Σcnt², the test  z² > T  is equivalent to
        (n·x − s)² · 10  >  T·10 · (n·ss − s²)
    — all BIGINT products, no mean/stddev floats ever materialize, so
    the oracle hash-matches bit-for-bit (``z2_times_10`` is z²·10;
    default 90 = z > 3). One-sided: only x above the mean fires.

    Scale shape: one groupBy to hourly counts (partial-agg), one
    window PARTITION BY event_type — state per partition is 24 ints.

    Result: (event_type, hour, cnt) for flagged hours; hour is epoch
    hours (ts is naive/NTZ — both engines bucket the wall-clock)."""
    from pyspark.sql import Window

    from ..streaming.windows import _us

    hourly = (
        events.select(
            "event_type",
            (_us("ts") / F.lit(3_600_000_000)).cast("long").alias("hour"),
        )
        .groupBy("event_type", "hour")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-lookback, -1)
    )
    stats = hourly.select(
        "event_type",
        "hour",
        "cnt",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("cnt").over(w).alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).over(w).alias("ss"),
    )
    nx_s = F.col("n") * F.col("cnt") - F.col("s")
    var_n2 = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    return stats.where(
        (F.col("n") >= min_window)
        & (nx_s > 0)
        & (nx_s * nx_s * 10 > F.lit(z2_times_10) * var_n2)
    ).select("event_type", "hour", F.col("cnt").cast("long").alias("cnt"))


def bursts_sql(
    lookback: int = 24,
    min_window: int = 12,
    z2_times_10: int = 90,
    table: str = "events",
) -> str:
    """DuckDB twin of :func:`bursts`. The µs shift in Spark's NTZ→LTZ
    cast is a whole number of hours only when the session tz offset
    is; both harnesses run UTC (offset 0), matching epoch_us//3.6e9."""
    return (
        "WITH hourly AS (SELECT event_type, "
        "epoch_us(ts) // 3600000000 AS hour, "
        f"CAST(COUNT(*) AS BIGINT) AS cnt FROM {table} "
        "GROUP BY event_type, epoch_us(ts) // 3600000000), "
        "stats AS (SELECT event_type, hour, cnt, "
        "COUNT(*) OVER w AS n, SUM(cnt) OVER w AS s, "
        "SUM(cnt * cnt) OVER w AS ss FROM hourly WINDOW w AS "
        "(PARTITION BY event_type ORDER BY hour "
        f"ROWS BETWEEN {lookback} PRECEDING AND 1 PRECEDING)) "
        "SELECT event_type, hour, cnt FROM stats "
        f"WHERE n >= {min_window} AND n * cnt - s > 0 "
        f"AND (n * cnt - s) * (n * cnt - s) * 10 > {z2_times_10} * (n * ss - s * s)"
    )


def interarrival_regularity(
    events: DataFrame, min_gaps: int = 10
) -> DataFrame:
    """Per-user inter-arrival-time regularity: the squared coefficient
    of variation of the gaps between a user's consecutive events. A
    Poisson (human) arrival process has CV² ≈ 1; schedulers and bots
    sit near 0 (metronome) and bursty scripted crawls far above 1 —
    the timing-shape complement to `bot_flags` (which thresholds raw
    per-minute rates).

    Exact-integer contract: gaps in whole MINUTES (µs div 6·10⁷ — the
    shift in the NTZ cast cancels in differences), and with n gaps,
    s = Σgap, ss = Σgap²:  cv2_ppm = ⌊10⁶·(n·ss − s²) / s²⌋ — the
    same no-floats variance identity as `bursts`. Minute resolution
    keeps 10⁶·n·ss inside int64 even for a user whose whole history is
    one multi-month gap (seconds overflow there: 10⁶·n·(3·10⁶ s)²
    > 2⁶³).

    One user-partitioned window + one partial-agg groupBy.
    Result: (user_id, n_gaps, mean_gap_min, cv2_ppm), users with
    ≥ ``min_gaps`` gaps and a nonzero gap sum."""
    from pyspark.sql import Window

    from ..streaming.windows import _us

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        events.select(
            "user_id",
            ((_us("ts") - _us(F.lag("ts").over(w))) / F.lit(60_000_000))
            .cast("long")
            .alias("gap_m"),
        )
        .where(F.col("gap_m").isNotNull())
    )
    agg = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("gap_m").alias("s"),
        F.sum(F.col("gap_m") * F.col("gap_m")).alias("ss"),
    )
    return agg.where((F.col("n") >= min_gaps) & (F.col("s") > 0)).select(
        "user_id",
        F.col("n").cast("long").alias("n_gaps"),
        F.expr("s div n").cast("long").alias("mean_gap_min"),
        F.expr("(1000000 * (n * ss - s * s)) div (s * s)")
        .cast("long")
        .alias("cv2_ppm"),
    )


def interarrival_regularity_sql(
    min_gaps: int = 10, table: str = "events"
) -> str:
    """DuckDB twin of :func:`interarrival_regularity`."""
    return (
        "WITH gaps AS (SELECT user_id, "
        "(epoch_us(ts) - epoch_us(LAG(ts) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id))) // 60000000 AS gap_m "
        f"FROM {table}), "
        "agg AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(gap_m) AS BIGINT) AS s, "
        "CAST(SUM(gap_m * gap_m) AS BIGINT) AS ss "
        "FROM gaps WHERE gap_m IS NOT NULL GROUP BY user_id) "
        "SELECT user_id, n AS n_gaps, s // n AS mean_gap_min, "
        "CAST((1000000 * (n * ss - s * s)) // (s * s) AS BIGINT) AS cv2_ppm "
        f"FROM agg WHERE n >= {min_gaps} AND s > 0"
    )


def dwell_times(
    events: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """Per-event-type dwell times: how long a user stays on an event
    before their NEXT in-session action (the session's last event has
    no dwell). The engagement read UX/ranking teams pull from
    clickstreams — 'error' pages with near-zero dwell and long-dwell
    'view's mean opposite things to a quality model.

    Session boundaries reuse the gaps-and-islands µs contract
    (sessionize); dwells are whole seconds (µs div 10⁶). Percentiles
    are EXACT discrete order statistics — value at rank ⌈q·n⌉ under
    (dwell, deterministic tie order) — computed with one
    type-partitioned rank window, never percentile_approx (whose
    sketch is not cross-engine reproducible).

    Result: (event_type, n, mean_dwell_s, p50_s, p90_s)."""
    from pyspark.sql import Window

    from ..streaming.windows import _us

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("ts").over(w).isNull()
            | (_us("ts") - _us(F.lag("ts").over(w)) > gap_us),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_sess"),
    )
    sess = flagged.withColumn(
        "sid", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    ws = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    dwells = (
        sess.withColumn("nxt", F.lead("ts").over(ws))
        .where(F.col("nxt").isNotNull())
        .select(
            "event_type",
            ((_us("nxt") - _us("ts")) / F.lit(1_000_000))
            .cast("long")
            .alias("dwell_s"),
        )
    )
    wr = Window.partitionBy("event_type").orderBy("dwell_s")
    ranked = dwells.withColumn("rn", F.row_number().over(wr))
    agg = dwells.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("dwell_s").alias("s")
    )
    p50 = (
        ranked.join(agg, "event_type")
        .where(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("dwell_s").alias("p50_s"))
    )
    p90 = (
        ranked.join(agg, "event_type")
        .where(F.col("rn") == F.expr("(9 * n + 9) div 10"))
        .select("event_type", F.col("dwell_s").alias("p90_s"))
    )
    return (
        agg.join(p50, "event_type")
        .join(p90, "event_type")
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.expr("s div n").cast("long").alias("mean_dwell_s"),
            F.col("p50_s").cast("long"),
            F.col("p90_s").cast("long"),
        )
    )


def dwell_times_sql(gap_minutes: int = 30, table: str = "events") -> str:
    """DuckDB twin of :func:`dwell_times`."""
    gap_us = gap_minutes * 60 * 1_000_000
    return (
        "WITH flagged AS (SELECT user_id, ts, event_id, event_type, "
        "CASE WHEN LAG(ts) OVER w IS NULL OR "
        f"epoch_us(ts) - epoch_us(LAG(ts) OVER w) > {gap_us} "
        "THEN 1 ELSE 0 END AS new_sess "
        f"FROM {table} WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "sess AS (SELECT *, SUM(new_sess) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING) AS sid FROM flagged), "
        "dwells AS (SELECT event_type, "
        "(epoch_us(nxt) - epoch_us(ts)) // 1000000 AS dwell_s FROM "
        "(SELECT event_type, ts, LEAD(ts) OVER "
        "(PARTITION BY user_id, sid ORDER BY ts, event_id) AS nxt FROM sess) "
        "WHERE nxt IS NOT NULL), "
        "ranked AS (SELECT event_type, dwell_s, ROW_NUMBER() OVER "
        "(PARTITION BY event_type ORDER BY dwell_s) AS rn FROM dwells), "
        "agg AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(dwell_s) AS BIGINT) AS s FROM dwells GROUP BY event_type), "
        "p50 AS (SELECT r.event_type, r.dwell_s AS p50_s FROM ranked r "
        "JOIN agg a ON a.event_type = r.event_type "
        "WHERE r.rn = (a.n + 1) // 2), "
        "p90 AS (SELECT r.event_type, r.dwell_s AS p90_s FROM ranked r "
        "JOIN agg a ON a.event_type = r.event_type "
        "WHERE r.rn = (9 * a.n + 9) // 10) "
        "SELECT a.event_type, a.n, s // n AS mean_dwell_s, "
        "CAST(p50.p50_s AS BIGINT) AS p50_s, "
        "CAST(p90.p90_s AS BIGINT) AS p90_s "
        "FROM agg a JOIN p50 ON p50.event_type = a.event_type "
        "JOIN p90 ON p90.event_type = a.event_type"
    )


def conversion_lag(
    events: DataFrame,
    from_type: str = "signup",
    to_type: str = "purchase",
) -> DataFrame:
    """Histogram of the lag from each user's FIRST ``from_type`` event
    to their first ``to_type`` event at or after it, in whole hours —
    the time-to-convert distribution behind funnel()'s horizon knob.
    Only converting users appear.

    Two type-filtered partial-agg mins + one user-keyed join + one
    histogram groupBy — no window over raw events, fully parallel
    (the reason this emits a histogram, not global percentiles: a
    corpus-wide exact percentile needs a total order; the histogram
    is the scale-safe form and percentiles read off its prefix sums).
    Lags in integer µs → hours via one exact div.

    Result: (lag_hours, n_users)."""
    from ..streaming.windows import _us

    first_from = (
        events.where(F.col("event_type") == from_type)
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_from"))
    )
    first_to = (
        events.where(F.col("event_type") == to_type)
        .select("user_id", "ts")
        .join(first_from, "user_id")
        .where(F.col("ts") >= F.col("t_from"))
        .groupBy("user_id", "t_from")
        .agg(F.min("ts").alias("t_to"))
    )
    return (
        first_to.select(
            ((_us("t_to") - _us("t_from")) / F.lit(3_600_000_000))
            .cast("long")
            .alias("lag_hours")
        )
        .groupBy("lag_hours")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def conversion_lag_sql(
    from_type: str = "signup",
    to_type: str = "purchase",
    table: str = "events",
) -> str:
    """DuckDB twin of :func:`conversion_lag`."""
    return (
        "WITH ff AS (SELECT user_id, MIN(ts) AS t_from "
        f"FROM {table} WHERE event_type = '{from_type}' GROUP BY user_id), "
        "ft AS (SELECT e.user_id, ff.t_from, MIN(e.ts) AS t_to "
        f"FROM {table} e JOIN ff ON ff.user_id = e.user_id "
        f"WHERE e.event_type = '{to_type}' AND e.ts >= ff.t_from "
        "GROUP BY e.user_id, ff.t_from) "
        "SELECT (epoch_us(t_to) - epoch_us(t_from)) // 3600000000 "
        "AS lag_hours, CAST(COUNT(*) AS BIGINT) AS n_users "
        "FROM ft GROUP BY lag_hours"
    )


def basket_lift(
    events: DataFrame, gap_minutes: int = 30, min_pair: int = 5
) -> DataFrame:
    """Market-basket lift of event-type pairs WITHIN sessions: for
    types a < b, lift = P(a,b in same session)/(P(a)·P(b)) in ppm of
    1.0 — the whole-session co-presence signal (event_transitions
    reads only ADJACENT steps; lift catches "users who error also
    purchase, eventually"). Sessions are the gaps-and-islands µs
    contract.

    Exact integers: with S sessions, n_a/n_b sessions containing each
    type, n_ab containing both — lift_ppm = ⌊10⁶·n_ab·S / (n_a·n_b)⌋.
    Distinct-per-session first, so hot sessions can't blow the pair
    join: pairs per session ≤ C(|event_types|,2), a constant.

    Result: (a, b, n_ab, lift_ppm), pairs with n_ab ≥ min_pair."""
    from pyspark.sql import Window

    from ..streaming.windows import _us

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            F.lag("ts").over(w).isNull()
            | (_us("ts") - _us(F.lag("ts").over(w)) > gap_us),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_sess"),
    )
    sess = flagged.withColumn(
        "sid",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    st = sess.select("user_id", "sid", "event_type").distinct()
    n_sessions = st.select("user_id", "sid").distinct().count()
    singles = st.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = st.select("user_id", "sid", F.col("event_type").alias("a"))
    b = st.select("user_id", "sid", F.col("event_type").alias("b"))
    pairs = (
        a.join(b, ["user_id", "sid"])
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_pair)
    )
    na = singles.select(F.col("event_type").alias("a"), F.col("n").alias("na"))
    nb = singles.select(F.col("event_type").alias("b"), F.col("n").alias("nb"))
    return (
        pairs.join(na, "a")
        .join(nb, "b")
        .select(
            "a",
            "b",
            F.col("n_ab").cast("long").alias("n_ab"),
            (
                (F.lit(1_000_000) * F.col("n_ab") * F.lit(n_sessions))
                .cast("long")
                / (F.col("na") * F.col("nb"))
            )
            .cast("long")
            .alias("lift_ppm"),
        )
    )


def basket_lift_sql(
    gap_minutes: int = 30, min_pair: int = 5, table: str = "events"
) -> str:
    """DuckDB twin of :func:`basket_lift`."""
    gap_us = gap_minutes * 60 * 1_000_000
    return (
        "WITH flagged AS (SELECT user_id, ts, event_id, event_type, "
        "CASE WHEN LAG(ts) OVER w IS NULL OR "
        f"epoch_us(ts) - epoch_us(LAG(ts) OVER w) > {gap_us} "
        "THEN 1 ELSE 0 END AS new_sess "
        f"FROM {table} WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "sess AS (SELECT *, SUM(new_sess) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING) AS sid FROM flagged), "
        "st AS (SELECT DISTINCT user_id, sid, event_type FROM sess), "
        "ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS s FROM "
        "(SELECT DISTINCT user_id, sid FROM st)), "
        "singles AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM st GROUP BY event_type), "
        "pairs AS (SELECT a.event_type AS a, b.event_type AS b, "
        "CAST(COUNT(*) AS BIGINT) AS n_ab FROM st a JOIN st b "
        "ON a.user_id = b.user_id AND a.sid = b.sid "
        "AND a.event_type < b.event_type "
        f"GROUP BY 1, 2 HAVING COUNT(*) >= {min_pair}) "
        "SELECT p.a, p.b, p.n_ab, "
        "CAST(CAST(1000000 * p.n_ab * ns.s AS BIGINT) "
        "// (na.n * nb.n) AS BIGINT) AS lift_ppm "
        "FROM pairs p JOIN singles na ON na.event_type = p.a "
        "JOIN singles nb ON nb.event_type = p.b, ns"
    )


def user_type_entropy(events: DataFrame, min_events: int = 20) -> DataFrame:
    """Per-user Shannon entropy of the event-type mix in micro-nats
    (the surprisal/host_entropy integer-floor convention): H =
    Σ_t n_t·⌊10⁶·ln(N/n_t)⌋ DIV N. Single-type users read 0
    (scripted/bot-like); diverse organic users read near ln(#types).
    The behavioral-diversity axis next to rate (bot_flags) and timing
    (interarrival_regularity).

    One (user, type) partial-agg + one per-user weighted mean — two
    shuffles, no windows. Result: (user_id, n_events, entropy_micro)
    for users with ≥ min_events."""
    ut = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_t")
    )
    tot = ut.groupBy("user_id").agg(F.sum("n_t").alias("n"))
    scored = ut.join(tot, "user_id").select(
        "user_id",
        "n_t",
        "n",
        F.floor(
            F.lit(1_000_000)
            * F.log(F.col("n").cast("double") / F.col("n_t"))
        )
        .cast("long")
        .alias("s_micro"),
    )
    return (
        scored.groupBy("user_id")
        .agg(
            F.max("n").cast("long").alias("n_events"),
            F.expr("sum(n_t * s_micro) DIV max(n)")
            .cast("long")
            .alias("entropy_micro"),
        )
        .where(F.col("n_events") >= min_events)
    )


def user_type_entropy_sql(min_events: int = 20, table: str = "events") -> str:
    """DuckDB twin of :func:`user_type_entropy`."""
    return (
        "WITH ut AS (SELECT user_id, event_type, "
        f"CAST(COUNT(*) AS BIGINT) AS n_t FROM {table} "
        "GROUP BY user_id, event_type), "
        "tot AS (SELECT user_id, CAST(SUM(n_t) AS BIGINT) AS n "
        "FROM ut GROUP BY user_id), "
        "scored AS (SELECT ut.user_id, ut.n_t, t.n, "
        "CAST(FLOOR(1000000 * LN(CAST(t.n AS DOUBLE) / ut.n_t)) AS BIGINT) "
        "AS s_micro FROM ut JOIN tot t ON t.user_id = ut.user_id) "
        "SELECT user_id, CAST(MAX(n) AS BIGINT) AS n_events, "
        "CAST(SUM(n_t * s_micro) // MAX(n) AS BIGINT) AS entropy_micro "
        f"FROM scored GROUP BY user_id HAVING MAX(n) >= {min_events}"
    )


def value_outliers(
    events: DataFrame, k_times_10: int = 50
) -> DataFrame:
    """Robust per-event-type value outliers by the median/MAD rule:
    flag events whose |value − median| exceeds (k_times_10/10)·MAD,
    with median and MAD as EXACT discrete order statistics (rank
    ⌈n/2⌉ under deterministic tie order — the dwell_times percentile
    idiom, never percentile_approx). The z-score variant (`bursts`)
    breaks on heavy-tailed revenue; median/MAD is the standard robust
    gate for transaction anomalies.

    Integer cents end-to-end; the comparison is 10·|x−med| > k·MAD so
    the half-steps stay integral. Two type-partitioned rank windows
    (median of values, then median of deviations) + one broadcast
    join back. Result: (event_id, event_type, cents, median_c, mad_c)
    for flagged events."""
    from pyspark.sql import Window

    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    base = events.select("event_id", "event_type", cents.alias("c"))
    wv = Window.partitionBy("event_type").orderBy("c", "event_id")
    nn = base.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    med = (
        base.withColumn("rn", F.row_number().over(wv))
        .join(nn, "event_type")
        .where(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("c").alias("median_c"))
    )
    dev = base.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "c",
        "median_c",
        F.abs(F.col("c") - F.col("median_c")).alias("d"),
    )
    wd = Window.partitionBy("event_type").orderBy("d", "event_id")
    mad = (
        dev.withColumn("rn", F.row_number().over(wd))
        .join(nn, "event_type")
        .where(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("d").alias("mad_c"))
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .where(F.col("d") * 10 > F.lit(k_times_10) * F.col("mad_c"))
        .select(
            "event_id",
            "event_type",
            F.col("c").alias("cents"),
            "median_c",
            "mad_c",
        )
    )


def value_outliers_sql(k_times_10: int = 50, table: str = "events") -> str:
    """DuckDB twin of :func:`value_outliers`."""
    return (
        "WITH base AS (SELECT event_id, event_type, "
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c "
        f"FROM {table}), "
        "nn AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM base GROUP BY event_type), "
        "medr AS (SELECT event_type, c, ROW_NUMBER() OVER "
        "(PARTITION BY event_type ORDER BY c, event_id) AS rn FROM base), "
        "med AS (SELECT m.event_type, m.c AS median_c FROM medr m "
        "JOIN nn ON nn.event_type = m.event_type WHERE m.rn = (nn.n + 1) // 2), "
        "dev AS (SELECT b.event_id, b.event_type, b.c, med.median_c, "
        "ABS(b.c - med.median_c) AS d FROM base b "
        "JOIN med ON med.event_type = b.event_type), "
        "madr AS (SELECT event_type, d, ROW_NUMBER() OVER "
        "(PARTITION BY event_type ORDER BY d, event_id) AS rn FROM dev), "
        "mad AS (SELECT m.event_type, m.d AS mad_c FROM madr m "
        "JOIN nn ON nn.event_type = m.event_type WHERE m.rn = (nn.n + 1) // 2) "
        "SELECT dev.event_id, dev.event_type, dev.c AS cents, "
        "dev.median_c, mad.mad_c FROM dev "
        "JOIN mad ON mad.event_type = dev.event_type "
        f"WHERE dev.d * 10 > {k_times_10} * mad.mad_c"
    )


def rfm_segments(events: DataFrame) -> DataFrame:
    """RFM (recency / frequency / monetary) quintile segmentation —
    the canonical user-value banding for a behavioral corpus. Per
    user: recency_days = whole days between the user's last event and
    the corpus's last event, frequency = event count, monetary_cents
    = exact integer cents (the value_outliers cents convention). Each
    dimension is ranked corpus-wide under a deterministic total order
    (dimension, then user_id) and banded into quintiles by the
    pr_deciles formula q = 5 − (5·(rank−1)) DIV n, so the best-ranked
    users read 5 — NTILE is deliberately avoided because its
    big-buckets-first split disagrees between engines when n mod 5 ≠ 0.

    One events→user partial agg, then three histogram-prefix ordinal
    ranks (fusion.ordinal_rank — no single-partition global window;
    at 10⁹-user scale the continuous monetary histogram swaps the
    broadcast prefix for a range-partitioned one, the documented
    ordinal_rank scale path). Result: (user_id, recency_days,
    frequency, monetary_cents, r, f, m, rfm)."""
    from drone_spark.ops.fusion import ordinal_rank

    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    per_user = events.select(
        "user_id",
        F.col("ts").cast("timestamp").cast("long").alias("ep"),
        cents.alias("c"),
    ).groupBy("user_id").agg(
        F.max("ep").alias("last_ep"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum("c").cast("long").alias("monetary_cents"),
    )
    gmax = per_user.agg(F.max("last_ep").alias("gmax"))
    base = per_user.crossJoin(F.broadcast(gmax)).select(
        "user_id",
        F.expr("(gmax - last_ep) DIV 86400").alias("recency_days"),
        "frequency",
        "monetary_cents",
    )
    n = base.count()

    def quintile(df, score_col, out_col):
        ranked = ordinal_rank(
            df.select("user_id", F.col(score_col).alias("score")),
            "score",
            "user_id",
            rank_col="rk",
        )
        return ranked.select(
            "user_id",
            F.expr(f"5 - (5 * (rk - 1)) DIV {n}")
            .cast("long")
            .alias(out_col),
        )

    # recency: smaller days = better → rank on the negated value
    r = quintile(
        base.select("user_id", (-F.col("recency_days")).alias("neg")),
        "neg",
        "r",
    )
    f_ = quintile(base, "frequency", "f")
    m = quintile(base, "monetary_cents", "m")
    return (
        base.join(r, "user_id")
        .join(f_, "user_id")
        .join(m, "user_id")
        .select(
            "user_id",
            "recency_days",
            "frequency",
            "monetary_cents",
            "r",
            "f",
            "m",
            (F.col("r") * 100 + F.col("f") * 10 + F.col("m"))
            .cast("long")
            .alias("rfm"),
        )
    )


def rfm_segments_sql(table: str = "events") -> str:
    """DuckDB twin of :func:`rfm_segments` (ROW_NUMBER with the same
    (dimension, user_id) total order stands in for ordinal_rank)."""
    return (
        "WITH pu AS (SELECT user_id, "
        "MAX(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS last_ep, "
        "CAST(COUNT(*) AS BIGINT) AS frequency, "
        "CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) "
        "AS BIGINT) AS monetary_cents FROM "
        f"{table} GROUP BY user_id), "
        "base AS (SELECT user_id, "
        "((SELECT MAX(last_ep) FROM pu) - last_ep) // 86400 "
        "AS recency_days, frequency, monetary_cents FROM pu), "
        "nn AS (SELECT COUNT(*) AS n FROM base), "
        "rr AS (SELECT user_id, 5 - (5 * (ROW_NUMBER() OVER "
        "(ORDER BY recency_days ASC, user_id ASC) - 1)) // nn.n AS r "
        "FROM base, nn), "
        "ff AS (SELECT user_id, 5 - (5 * (ROW_NUMBER() OVER "
        "(ORDER BY frequency DESC, user_id ASC) - 1)) // nn.n AS f "
        "FROM base, nn), "
        "mm AS (SELECT user_id, 5 - (5 * (ROW_NUMBER() OVER "
        "(ORDER BY monetary_cents DESC, user_id ASC) - 1)) // nn.n AS m "
        "FROM base, nn) "
        "SELECT b.user_id, CAST(b.recency_days AS BIGINT) AS recency_days, "
        "b.frequency, b.monetary_cents, CAST(rr.r AS BIGINT) AS r, "
        "CAST(ff.f AS BIGINT) AS f, CAST(mm.m AS BIGINT) AS m, "
        "CAST(rr.r * 100 + ff.f * 10 + mm.m AS BIGINT) AS rfm "
        "FROM base b JOIN rr ON rr.user_id = b.user_id "
        "JOIN ff ON ff.user_id = b.user_id "
        "JOIN mm ON mm.user_id = b.user_id"
    )


def markov_stationary(events: DataFrame, iters: int = 20) -> DataFrame:
    """Stationary distribution of the per-user event-type Markov
    chain — the long-run share of each event type if users kept
    clicking forever, the behavioral twin of PageRank's stationary
    view of the link graph (and the summary event_transitions' raw
    matrix feeds).

    Transitions: consecutive event pairs per user under the
    deterministic (ts, event_id) order, row-normalized to ppm
    integers p(a→b) = 10⁶·n_ab DIV n_a. The distribution starts
    uniform (10⁶ DIV k per type) and takes ``iters`` integer power
    steps d'(b) = Σ_a d(a)·p(a,b) DIV 10⁶, renormalized to ppm after
    every step — all-integer arithmetic, so the Spark run and the
    DuckDB oracle (the same unrolled iterations) agree bit-for-bit.

    Scale shape: ONE user-keyed exchange builds the pair counts (lag
    window over events, the sessionize exchange); the chain itself is
    k×k where k = #distinct event types — bounded by the SCHEMA, not
    the corpus — so the power steps run on the collected k²-row ppm
    matrix driver-side in exact integer arithmetic (the only collect
    is O(k²), corpus-size-independent — the same scalar-metrics-read
    exemption the superstep engine uses). One Spark job instead of
    20 chained broadcast-join jobs. Result: (event_type,
    stationary_ppm)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id",
            "ts",
            "event_id",
            F.col("event_type").alias("b"),
            F.lag("event_type").over(w).alias("a"),
        )
        .where(F.col("a").isNotNull())
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    totals = pairs.groupBy("a").agg(F.sum("n_ab").alias("n_a"))
    trans = pairs.join(totals, "a").select(
        "a",
        "b",
        F.expr("(1000000 * n_ab) DIV n_a").cast("long").alias("p_ppm"),
    )

    mat = trans.collect()  # O(k^2) rows, k = #event types (schema-bound)
    out_edges: dict[str, list[tuple[str, int]]] = {}
    for r in mat:
        out_edges.setdefault(r["a"], []).append((r["b"], r["p_ppm"]))
    k = len(out_edges)
    dist = {a: 1_000_000 // max(k, 1) for a in out_edges}
    for _ in range(iters):
        # key set per step = targets reachable from the current keys
        # (matches the oracle's join: sink-only types enter, source-only
        # types without inbound mass drop out)
        raw: dict[str, int] = {}
        for a, m in dist.items():
            for b, ppm in out_edges.get(a, ()):
                raw[b] = raw.get(b, 0) + m * ppm
        raw = {b: v // 1_000_000 for b, v in raw.items()}
        tot = sum(raw.values())
        dist = {b: (1_000_000 * v) // tot for b, v in raw.items()}
    spark = events.sparkSession
    return spark.createDataFrame(
        sorted(dist.items()),
        "event_type string, stationary_ppm long",
    )


def markov_stationary_sql(iters: int = 20, table: str = "events") -> str:
    """DuckDB twin of :func:`markov_stationary` — the identical
    integer power steps unrolled as chained CTEs (recursive CTEs with
    aggregation in the recursive term are not portable; unrolling
    keeps the oracle dialect-neutral). The base CTEs are MATERIALIZED:
    DuckDB otherwise inlines ``trans`` into every unrolled step and
    re-opens the events parquet ~20×, blowing the fd limit."""
    head = (
        "WITH pairs AS MATERIALIZED (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_ab "
        "FROM (SELECT user_id, event_type AS b, LAG(event_type) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS a "
        f"FROM {table}) WHERE a IS NOT NULL GROUP BY a, b), "
        "totals AS (SELECT a, CAST(SUM(n_ab) AS BIGINT) AS n_a "
        "FROM pairs GROUP BY a), "
        "trans AS MATERIALIZED (SELECT p.a, p.b, "
        "CAST((1000000 * p.n_ab) // t.n_a AS BIGINT) AS p_ppm "
        "FROM pairs p JOIN totals t ON t.a = p.a), "
        "kk AS (SELECT COUNT(DISTINCT a) AS k FROM trans), "
        "d0 AS (SELECT DISTINCT a AS event_type, "
        "CAST(1000000 // kk.k AS BIGINT) AS m FROM trans, kk)"
    )
    steps = []
    prev = "d0"
    for i in range(1, iters + 1):
        steps.append(
            f"s{i} AS (SELECT t.b AS event_type, "
            f"CAST(SUM(d.m * t.p_ppm) // 1000000 AS BIGINT) AS m_raw "
            f"FROM {prev} d JOIN trans t ON t.a = d.event_type "
            f"GROUP BY t.b), "
            # SUM(...) OVER () not a scalar subquery: the subquery form
            # references s{i} twice, and CTE inlining then doubles the
            # plan per step -> 2^iters blowup in the unrolled oracle.
            f"d{i} AS (SELECT event_type, CAST((1000000 * m_raw) // "
            f"SUM(m_raw) OVER () AS BIGINT) AS m FROM s{i})"
        )
        prev = f"d{i}"
    return (
        head
        + ", "
        + ", ".join(steps)
        + f" SELECT event_type, CAST(m AS BIGINT) AS stationary_ppm "
        f"FROM {prev}"
    )


def cusum_changepoints(events: DataFrame) -> DataFrame:
    """One-sided CUSUM over each event type's daily volume — the
    standard streaming change detector ("did traffic for this type
    step up, and when"). Deviations are zero-meaned exactly in
    integers by cross-multiplying: dev_d = D·n_d − T where D = #days
    and T = total events of the type, so Σ dev = 0 without division.

    The textbook recursion S_d = max(0, S_{d-1} + dev_d) is not a
    plain window aggregate, but it has the closed form
    S_d = R_d − min(0, min_{j≤d} R_j) with R the running sum of dev —
    two window functions, both available and integer-exact in Spark
    and DuckDB, so the whole detector is one events scan + one
    per-type window (no UDF, no iteration). At 100 TB the partition
    key is event_type (bounded cardinality ×: re-key by (type, shard)
    and merge if a single type's day count ever outgrew a partition —
    days are ≤ a few thousand, so it never does).

    Result: (event_type, day, n_events, cusum_scaled) where
    cusum_scaled is in D·events units (divide by D for events)."""
    from pyspark.sql import Window

    daily = (
        events.groupBy(
            "event_type", F.to_date("ts").cast("string").alias("day")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    per_type = Window.partitionBy("event_type")
    seq = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_dev = daily.select(
        "event_type",
        "day",
        "n_events",
        (
            F.count(F.lit(1)).over(per_type) * F.col("n_events")
            - F.sum("n_events").over(per_type)
        ).alias("dev"),
    )
    runs = with_dev.select(
        "event_type",
        "day",
        "n_events",
        F.sum("dev").over(seq).alias("r"),
    )
    return runs.select(
        "event_type",
        "day",
        "n_events",
        (F.col("r") - F.least(F.lit(0), F.min("r").over(seq)))
        .cast("long")
        .alias("cusum_scaled"),
    )


def cusum_changepoints_sql(table: str = "events") -> str:
    """DuckDB twin of :func:`cusum_changepoints`."""
    return (
        "WITH daily AS (SELECT event_type, "
        "CAST(CAST(ts AS DATE) AS VARCHAR) AS day, "
        f"CAST(COUNT(*) AS BIGINT) AS n_events FROM {table} "
        "GROUP BY 1, 2), "
        "dev AS (SELECT event_type, day, n_events, "
        "COUNT(*) OVER (PARTITION BY event_type) * n_events - "
        "SUM(n_events) OVER (PARTITION BY event_type) AS dev "
        "FROM daily), "
        "runs AS (SELECT event_type, day, n_events, "
        "SUM(dev) OVER w AS r FROM dev "
        "WINDOW w AS (PARTITION BY event_type ORDER BY day "
        "ROWS UNBOUNDED PRECEDING)) "
        "SELECT event_type, day, n_events, "
        "CAST(r - LEAST(0, MIN(r) OVER w) AS BIGINT) AS cusum_scaled "
        "FROM runs "
        "WINDOW w AS (PARTITION BY event_type ORDER BY day "
        "ROWS UNBOUNDED PRECEDING)"
    )


def asof_last_touch(
    events: DataFrame,
    probe_type: str = "purchase",
    build_type: str = "click",
) -> DataFrame:
    """As-of join INSIDE one keyed stream: for every probe event (a
    purchase), the most recent build event (a click) by the same user
    at-or-before it — the temporal operator Spark has no built-in for
    (pandas calls it merge_asof; kdb calls it aj).

    Implemented as the scalable union+window form, not a range join:
    tag both sides, union, ONE shuffle on user_id, sort by
    (ts, side, event_id) inside each user, and carry the last
    non-null build row forward with last(..., ignorenulls). Cost is a
    single exchange + sort of probe+build rows — no per-key join
    blowup, no range-join quadratic corner, and hot users are bounded
    by their own row count (contrast the naive per-probe backward
    scan, O(probe·build) per user). At 100 TB this is the same plan
    shape as sessionization: key exchange + in-partition sort.

    Ties: a build at exactly probe.ts counts (side orders build
    first); among equal-ts builds the largest event_id wins.

    Result: (event_id, user_id, touch_event_id, gap_us) — nullable
    touch columns when the user has no prior build event."""
    from pyspark.sql import Window

    from ..streaming.windows import _us

    tagged = events.where(
        F.col("event_type").isin(probe_type, build_type)
    ).select(
        "event_id",
        "user_id",
        "ts",
        _us("ts").alias("ts_us"),
        (F.col("event_type") == probe_type).cast("int").alias("side"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn(
        "touch",
        F.last(
            F.when(
                F.col("side") == 0,
                F.struct(
                    F.col("ts_us").alias("bts"),
                    F.col("event_id").alias("bid"),
                ),
            ),
            ignorenulls=True,
        ).over(w),
    )
    return carried.where(F.col("side") == 1).select(
        "event_id",
        "user_id",
        F.col("touch.bid").alias("touch_event_id"),
        (F.col("ts_us") - F.col("touch.bts")).cast("long").alias("gap_us"),
    )


def asof_last_touch_sql(
    probe_type: str = "purchase",
    build_type: str = "click",
    table: str = "events",
) -> str:
    """DuckDB twin of :func:`asof_last_touch` — deliberately a
    DIFFERENT formulation (per-probe LATERAL backward scan) so the
    oracle does not share the union+window algorithm it checks."""
    return (
        f"SELECT p.event_id, p.user_id, b.bid AS touch_event_id, "
        "b.gap_us FROM "
        f"(SELECT * FROM {table} WHERE event_type = '{probe_type}') p "
        "LEFT JOIN LATERAL (SELECT c.event_id AS bid, "
        "epoch_us(p.ts) - epoch_us(c.ts) AS gap_us "
        f"FROM {table} c WHERE c.event_type = '{build_type}' "
        "AND c.user_id = p.user_id AND c.ts <= p.ts "
        "ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) b ON TRUE"
    )


def interval_join_counts(
    events: DataFrame,
    probe_type: str = "purchase",
    window_minutes: int = 60,
) -> DataFrame:
    """Bucketed interval join: for every probe event, how many OTHER
    events (any non-probe type) the same user produced in the
    preceding `window_minutes`, and their total value in cents.

    A naive range join (user equi-key + BETWEEN) degenerates to a
    per-user nested loop. Bucketing bounds it: both sides get a
    time-bucket key of width = the window, the probe side is expanded
    to the (at most 2) buckets its window overlaps, the join is a
    plain equi-join on (user_id, bucket), and the exact µs range
    predicate filters inside matched buckets. Fan-out is ≤ 2× probe
    rows by construction at any scale; all arithmetic is integer µs.

    Result: (event_id, n_prior, value_c) with zeros for probes whose
    window is empty."""
    from ..streaming.windows import _us

    win_us = window_minutes * 60 * 1_000_000
    probes = events.where(F.col("event_type") == probe_type).select(
        "event_id", "user_id", _us("ts").alias("p_us")
    )
    builds = events.where(F.col("event_type") != probe_type).select(
        F.col("user_id").alias("b_user"),
        _us("ts").alias("b_us"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("v_c"),
        (_us("ts") / F.lit(win_us)).cast("long").alias("bucket"),
    )
    expanded = probes.select(
        "event_id",
        "user_id",
        "p_us",
        F.explode(
            F.array(
                (F.col("p_us") / win_us).cast("long") - 1,
                (F.col("p_us") / win_us).cast("long"),
            )
        ).alias("bucket"),
    )
    matched = (
        expanded.join(
            builds,
            (F.col("user_id") == F.col("b_user"))
            & (expanded["bucket"] == builds["bucket"]),
        )
        .where(
            (F.col("b_us") >= F.col("p_us") - win_us)
            & (F.col("b_us") <= F.col("p_us"))
        )
        .groupBy("event_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_prior"),
            F.sum("v_c").cast("long").alias("value_c"),
        )
    )
    return (
        probes.join(matched, "event_id", "left")
        .select(
            "event_id",
            F.coalesce("n_prior", F.lit(0)).cast("long").alias("n_prior"),
            F.coalesce("value_c", F.lit(0)).cast("long").alias("value_c"),
        )
    )


def interval_join_counts_sql(
    probe_type: str = "purchase",
    window_minutes: int = 60,
    table: str = "events",
) -> str:
    """DuckDB twin of :func:`interval_join_counts` — the naive
    BETWEEN range join the bucketed plan must agree with."""
    win_us = window_minutes * 60 * 1_000_000
    return (
        "SELECT p.event_id, CAST(COUNT(c.user_id) AS BIGINT) AS n_prior, "
        "CAST(COALESCE(SUM(CAST(CAST(c.value AS DECIMAL(18,2)) * 100 "
        "AS BIGINT)), 0) AS BIGINT) AS value_c "
        f"FROM (SELECT * FROM {table} WHERE event_type = '{probe_type}') p "
        f"LEFT JOIN (SELECT * FROM {table} "
        f"WHERE event_type <> '{probe_type}') c "
        "ON c.user_id = p.user_id "
        f"AND epoch_us(c.ts) >= epoch_us(p.ts) - {win_us} "
        "AND epoch_us(c.ts) <= epoch_us(p.ts) "
        "GROUP BY p.event_id"
    )


def rolling_distinct_users(events: DataFrame, days: int = 7) -> DataFrame:
    """Trailing-`days` distinct active users per day (the rolling
    WAU/MAU denominator), EXACT. COUNT(DISTINCT) cannot ride a
    sliding window frame, so the scalable form is dedupe-then-spread:
    collapse events to distinct (user, day) pairs first (the only
    big shuffle), spread each pair to the ≤`days` target days it
    covers (a constant-factor explode of already-deduped rows — at
    100 TB this is ×7 on the SMALL deduped table, not on raw events),
    dedupe (user, target_day), and count per day. Days outside the
    observed range are clipped by a broadcast semi-join on real days.

    Result: (day, users_w) — day as string, exact distinct count."""
    pairs = events.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    observed = pairs.select("day").distinct()
    spread = (
        pairs.select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(days - 1))).alias("off"),
            "day",
        )
        .select("user_id", F.date_add(F.col("day"), F.col("off")).alias("day"))
        .distinct()
    )
    return (
        spread.join(F.broadcast(observed), "day", "left_semi")
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("users_w"))
        .select(F.col("day").cast("string").alias("day"), "users_w")
    )


def rolling_distinct_users_sql(days: int = 7, table: str = "events") -> str:
    """DuckDB twin of :func:`rolling_distinct_users` — direct range
    join + COUNT(DISTINCT), the O(days·pairs) formulation the spread
    plan must match."""
    return (
        "WITH pairs AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day "
        f"FROM {table}), "
        "days AS (SELECT DISTINCT day FROM pairs) "
        "SELECT CAST(d.day AS VARCHAR) AS day, "
        "CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS users_w "
        f"FROM days d JOIN pairs p ON p.day BETWEEN d.day - {days - 1} "
        "AND d.day GROUP BY 1"
    )


def autocorr_daily(events: DataFrame, max_lag: int = 7) -> DataFrame:
    """Autocorrelation of total daily event volume at lags 1..max_lag,
    in EXACT integer arithmetic: with D days and T total events, the
    zero-meaned deviation is dev_d = D·n_d − T (Σ dev = 0 without a
    float division, same trick as cusum_changepoints); the lag-L
    statistic is the integer pair (num_L = Σ_d dev_d·dev_{d+L},
    den = Σ_d dev_d²) — the caller divides for the float r_L, the
    engine never does, so both engines agree bit-for-bit.

    The daily rollup is the only real shuffle; the lag self-join runs
    on the D-row daily table (bounded by calendar length, never by
    data volume — at 100 TB D is still a few thousand).

    Result: (lag, n_pairs, num, den) — all BIGINT."""
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    totals = daily.agg(
        F.count(F.lit(1)).cast("long").alias("d_days"),
        F.sum("n").cast("long").alias("t_total"),
    )
    dev = daily.crossJoin(F.broadcast(totals)).select(
        "day",
        (F.col("d_days") * F.col("n") - F.col("t_total")).alias("dev"),
    )
    den = dev.agg(F.sum(F.col("dev") * F.col("dev")).cast("long").alias("den"))
    lags = (
        dev.sparkSession.range(1, max_lag + 1)
        .select(F.col("id").cast("int").alias("lag"))
    )
    a = dev.select(F.col("day").alias("d0"), F.col("dev").alias("dev0"))
    b = dev.select(F.col("day").alias("d1"), F.col("dev").alias("dev1"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("d1") == F.date_add(F.col("d0"), F.col("lag")))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("dev0") * F.col("dev1")).cast("long").alias("num"),
        )
    )
    return pairs.crossJoin(F.broadcast(den)).select(
        "lag", "n_pairs", "num", F.col("den").cast("long").alias("den")
    )


def autocorr_daily_sql(max_lag: int = 7, table: str = "events") -> str:
    """DuckDB twin of :func:`autocorr_daily`."""
    return (
        "WITH daily AS (SELECT CAST(ts AS DATE) AS day, "
        f"CAST(COUNT(*) AS BIGINT) AS n FROM {table} GROUP BY 1), "
        "dev AS (SELECT day, "
        "(SELECT COUNT(*) FROM daily) * n - (SELECT SUM(n) FROM daily) "
        "AS dev FROM daily), "
        "den AS (SELECT CAST(SUM(dev * dev) AS BIGINT) AS den FROM dev), "
        f"lags AS (SELECT CAST(UNNEST(generate_series(1, {max_lag})) "
        "AS INT) AS lag) "
        "SELECT l.lag, CAST(COUNT(*) AS BIGINT) AS n_pairs, "
        "CAST(SUM(a.dev * b.dev) AS BIGINT) AS num, "
        "CAST(den.den AS BIGINT) AS den "
        "FROM lags l JOIN dev a ON TRUE "
        "JOIN dev b ON b.day = a.day + l.lag, den "
        "GROUP BY l.lag, den.den"
    )




def frequent_triples(
    events: DataFrame, min_triple: int = 5
) -> DataFrame:
    """Frequent 3-itemsets of event types within DAILY user baskets
    (the apriori step above basket_lift's session pairs — sessions in
    this corpus are too short to co-contain three types, so the
    basket here is the (user, day) grain): for types a < b < c, how
    many baskets contain all three, and the support in ppm of all
    baskets.

    The classic apriori prune (candidates from frequent pairs) exists
    to bound the candidate space when items are unbounded; here the
    per-basket item domain is distinct event TYPES, so after the
    per-basket distinct the three-way self-join is bounded by
    C(|types|, 3) rows per basket — a constant — and the prune would
    only add a pass. The distinct-first step is what makes this safe
    at 100 TB (hot baskets contribute the same ≤C(k,3) triples as
    cold ones); for unbounded item domains filter through the pair
    support table first.

    Result: (a, b, c, n_abc, support_ppm), triples with
    n_abc ≥ min_triple."""
    st = events.select(
        "user_id",
        F.to_date("ts").alias("day"),
        "event_type",
    ).distinct()
    n_baskets = st.select("user_id", "day").distinct().count()
    a = st.select("user_id", "day", F.col("event_type").alias("a"))
    b = st.select("user_id", "day", F.col("event_type").alias("b"))
    c = st.select("user_id", "day", F.col("event_type").alias("c"))
    return (
        a.join(b, ["user_id", "day"])
        .where(F.col("a") < F.col("b"))
        .join(c, ["user_id", "day"])
        .where(F.col("b") < F.col("c"))
        .groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("n_abc"))
        .where(F.col("n_abc") >= min_triple)
        .select(
            "a",
            "b",
            "c",
            "n_abc",
            F.expr(f"(1000000 * n_abc) div {n_baskets}")
            .cast("long")
            .alias("support_ppm"),
        )
    )


def frequent_triples_sql(min_triple: int = 5, table: str = "events") -> str:
    """DuckDB twin of :func:`frequent_triples`."""
    return (
        "WITH st AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, "
        f"event_type FROM {table}), "
        "ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS s FROM "
        "(SELECT DISTINCT user_id, day FROM st)), "
        "triples AS (SELECT a.event_type AS a, b.event_type AS b, "
        "c.event_type AS c, CAST(COUNT(*) AS BIGINT) AS n_abc "
        "FROM st a JOIN st b ON a.user_id = b.user_id AND a.day = b.day "
        "AND a.event_type < b.event_type "
        "JOIN st c ON a.user_id = c.user_id AND a.day = c.day "
        "AND b.event_type < c.event_type "
        f"GROUP BY 1, 2, 3 HAVING COUNT(*) >= {min_triple}) "
        "SELECT t.a, t.b, t.c, t.n_abc, "
        "CAST(1000000 * t.n_abc // ns.s AS BIGINT) AS support_ppm "
        "FROM triples t, ns"
    )


def cohort_ltv(events: DataFrame, conv_type: str = "purchase") -> DataFrame:
    """Value-weighted cohort matrix (retention's revenue twin): users
    are cohorted by the epoch-week of their FIRST event of any type;
    each cell is purchases made `week_offset` weeks later — purchase
    count, distinct buyers, and revenue in integer cents. The running
    row-sum over offsets is the cohort's lifetime value curve.

    Plan shape is retention's: one min-per-user agg, one user-keyed
    join, final agg is weeks² rows.

    Result: (cohort_week, week_offset, n_purchases, n_buyers,
    revenue_c)."""
    uw = events.select(
        F.col("user_id").alias("u"),
        F.floor(F.col("ts").cast("timestamp").cast("long") / WEEK_S)
        .cast("long")
        .alias("wk"),
        "event_type",
        "value",
    )
    cohort = uw.groupBy("u").agg(F.min("wk").alias("cw"))
    buys = uw.where(F.col("event_type") == conv_type)
    return (
        buys.join(cohort, "u")
        .groupBy(
            F.col("cw").alias("cohort_week"),
            (F.col("wk") - F.col("cw")).alias("week_offset"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.countDistinct("u").cast("long").alias("n_buyers"),
            F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("long"))
            .cast("long")
            .alias("revenue_c"),
        )
    )


def cohort_ltv_sql(conv_type: str = "purchase", table: str = "events") -> str:
    """DuckDB twin of :func:`cohort_ltv`."""
    return (
        "WITH uw AS (SELECT user_id AS u, "
        f"CAST(FLOOR(epoch(ts)) AS BIGINT) // {WEEK_S} AS wk, "
        f"event_type, value FROM {table}), "
        "cohort AS (SELECT u, MIN(wk) AS cw FROM uw GROUP BY u) "
        "SELECT c.cw AS cohort_week, b.wk - c.cw AS week_offset, "
        "CAST(COUNT(*) AS BIGINT) AS n_purchases, "
        "CAST(COUNT(DISTINCT b.u) AS BIGINT) AS n_buyers, "
        "CAST(SUM(CAST(CAST(b.value AS DECIMAL(18,2)) * 100 AS BIGINT)) "
        "AS BIGINT) AS revenue_c "
        f"FROM uw b JOIN cohort c ON b.u = c.u "
        f"WHERE b.event_type = '{conv_type}' "
        "GROUP BY 1, 2"
    )


def theilsen_trend(events: DataFrame) -> DataFrame:
    """Theil–Sen robust trend of total daily event volume: the median
    of all pairwise slopes (n_j − n_i)/(j − i) over day indices — the
    estimator that shrugs off the outlier days that wreck an OLS
    slope (launch spikes, outages). Slopes are floored to ppm-per-day
    BEFORE the median so the median picks among exact integers; the
    median itself is the deterministic lower-median by
    (slope, i, j) order.

    The pair join runs on the daily rollup (D rows, calendar-bounded)
    — D² pairs of a few-thousand-row table, never data-volume-bound,
    same argument as autocorr_daily.

    Result: one row (n_days, n_pairs, median_slope_ppm)."""
    from pyspark.sql import Window

    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    idx = daily.select(
        F.row_number()
        .over(Window.orderBy("day"))
        .cast("long")
        .alias("i"),
        "n",
    )
    a = idx.select(F.col("i").alias("ia"), F.col("n").alias("na"))
    b = idx.select(F.col("i").alias("ib"), F.col("n").alias("nb"))
    slopes = (
        a.join(b, F.col("ia") < F.col("ib"))
        .select(
            "ia",
            "ib",
            F.floor(
                F.lit(1_000_000.0)
                * (F.col("nb") - F.col("na"))
                / (F.col("ib") - F.col("ia"))
            )
            .cast("long")
            .alias("s"),
        )
    )
    w = Window.orderBy("s", "ia", "ib")
    n_days = idx.count()
    n_pairs = n_days * (n_days - 1) // 2
    mid = (n_pairs + 1) // 2
    return (
        slopes.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == mid)
        .select(
            F.lit(n_days).cast("long").alias("n_days"),
            F.lit(n_pairs).cast("long").alias("n_pairs"),
            F.col("s").alias("median_slope_ppm"),
        )
    )


def theilsen_trend_sql(table: str = "events") -> str:
    """DuckDB twin of :func:`theilsen_trend`."""
    return (
        "WITH daily AS (SELECT CAST(ts AS DATE) AS day, "
        f"CAST(COUNT(*) AS BIGINT) AS n FROM {table} GROUP BY 1), "
        "idx AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) "
        "AS i, n FROM daily), "
        "slopes AS (SELECT a.i AS ia, b.i AS ib, "
        "CAST(FLOOR(1000000.0 * (b.n - a.n) / (b.i - a.i)) AS BIGINT) AS s "
        "FROM idx a JOIN idx b ON a.i < b.i), "
        "meta AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM idx), "
        "ranked AS (SELECT s, ROW_NUMBER() OVER (ORDER BY s, ia, ib) AS r "
        "FROM slopes) "
        "SELECT meta.n_days, "
        "CAST(meta.n_days * (meta.n_days - 1) // 2 AS BIGINT) AS n_pairs, "
        "ranked.s AS median_slope_ppm FROM ranked, meta "
        "WHERE ranked.r = (meta.n_days * (meta.n_days - 1) // 2 + 1) // 2"
    )


def bounce_rate(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily bounce rate — the canonical web-analytics KPI the
    sessionizer exists to serve: a session is a maximal run of a
    user's events with gaps ≤ ``gap_minutes``; a BOUNCE is a
    single-event session. Sessions are attributed to the DAY OF THEIR
    FIRST EVENT (a midnight-spanning session counts once, on its
    start day).

    Plan: the dwell_times session derivation — one user-keyed window
    (lag + running sum of gap breaks), then two hash aggregates; all
    integer, so the twin matches bit-for-bit. Result: (day,
    n_sessions, n_bounces, bounce_ppm) with bounce_ppm =
    ⌊10⁶·bounces/sessions⌋."""
    from pyspark.sql import Window

    from ..streaming.windows import _us

    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_us = gap_minutes * 60 * 1_000_000
    brk = (
        F.when(
            _us(ts_col) - _us(F.lag(F.col(ts_col)).over(w)) > gap_us, 1
        )
        .otherwise(0)
    )
    sess = events.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("t"),
        F.sum(brk).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("sid"),
    )
    per = sess.groupBy("u", "sid").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("t").alias("t0"),
    )
    daily = per.groupBy(
        F.to_date("t0").cast("string").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum((F.col("n_events") == 1).cast("long"))
        .cast("long")
        .alias("n_bounces"),
    )
    return daily.select(
        "day",
        "n_sessions",
        "n_bounces",
        F.floor(F.lit(1_000_000) * F.col("n_bounces") / F.col("n_sessions"))
        .cast("long")
        .alias("bounce_ppm"),
    )


def bounce_rate_sql(gap_minutes: int = 30, table: str = "events") -> str:
    """DuckDB twin of :func:`bounce_rate`."""
    gap = gap_minutes * 60 * 1_000_000
    return (
        f"WITH marked AS (SELECT user_id AS u, ts AS t, "
        f"CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER "
        f"(PARTITION BY user_id ORDER BY ts)) > {gap} THEN 1 ELSE 0 END "
        f"AS brk FROM {table}), "
        "sess AS (SELECT u, t, SUM(brk) OVER (PARTITION BY u ORDER BY t "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid "
        "FROM marked), "
        "per AS (SELECT u, sid, COUNT(*) AS n_events, MIN(t) AS t0 "
        "FROM sess GROUP BY u, sid), "
        "daily AS (SELECT CAST(CAST(t0 AS DATE) AS VARCHAR) AS day, "
        "CAST(COUNT(*) AS BIGINT) AS n_sessions, "
        "CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_bounces FROM per GROUP BY 1) "
        "SELECT day, n_sessions, n_bounces, "
        "CAST(FLOOR(1000000 * n_bounces / n_sessions) AS BIGINT) "
        "AS bounce_ppm FROM daily"
    )


def event_conditional_entropy(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Conditional entropy H(next | current) of the per-user event
    stream — the predictability scalar over the same transition counts
    the Markov matrix exposes: H = Σ_{ij} (c_ij/N)·ln(r_i/c_ij) with
    r_i the row sum. Low H = rigid funnels (or bots replaying a
    script); H near ln(#states) = memoryless traffic. Exact integer
    counts in, one ln per OBSERVED pair (≤ states² terms, a tiny
    broadcastable table), result rounds to 6. Result: one row
    (n_transitions, n_pairs, cond_entropy)."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col)
    pairs = (
        events.select(
            F.col(user_col).alias("u"),
            F.col(type_col).alias("nxt"),
            F.lag(type_col).over(w).alias("cur"),
        )
        .where(F.col("cur").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rows = pairs.groupBy("cur").agg(F.sum("c").alias("r"))
    return (
        pairs.join(rows, "cur")
        .agg(
            F.sum("c").cast("long").alias("n_transitions"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(
                F.sum(
                    F.col("c")
                    * F.log(F.col("r").cast("double") / F.col("c"))
                )
                / F.sum("c"),
                6,
            ).alias("cond_entropy"),
        )
    )


def event_conditional_entropy_sql(table: str = "events") -> str:
    """DuckDB twin of :func:`event_conditional_entropy`."""
    return (
        f"WITH lagged AS (SELECT user_id AS u, event_type AS nxt, "
        f"LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS cur "
        f"FROM {table}), "
        "pairs AS (SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS c "
        "FROM lagged WHERE cur IS NOT NULL GROUP BY cur, nxt), "
        "rows_ AS (SELECT cur, SUM(c) AS r FROM pairs GROUP BY cur) "
        "SELECT CAST(SUM(c) AS BIGINT) AS n_transitions, "
        "CAST(COUNT(*) AS BIGINT) AS n_pairs, "
        "ROUND(SUM(c * LN(CAST(r AS DOUBLE) / c)) / SUM(c), 6) "
        "AS cond_entropy "
        "FROM pairs JOIN rows_ USING (cur)"
    )
