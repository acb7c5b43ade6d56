"""Round-5 continuation ops, batch 6: RAKE keyphrases, host h-index,
inter-arrival CV² — hand oracles."""

import datetime

from pyspark.sql import functions as F

from drone_spark.ops.corpusstats import rake_phrases
from drone_spark.ops.events import interarrival_regularity


# ----------------------------------------------------------------- rake
def test_rake_segments_and_scores(spark):
    """'red apple' bounded by stopwords in two docs: freq(red)=2,
    deg(red)=4 (two 2-word phrases) → wscore 2e6 each word → phrase
    4e6 ppm; the singleton word 'pear' (below min_occ) drops."""
    docs = spark.createDataFrame(
        [
            (1, "the red apple is a pear"),
            (2, "red apple and more"),
        ],
        "doc_id long, text string",
    )
    out = {r["phrase"]: (r["n_occ"], r["score_ppm"])
           for r in rake_phrases(docs, min_occ=2).collect()}
    assert out == {"red apple": (2, 4_000_000)}


def test_rake_max_len_filters_runs(spark):
    """A 5-word stopword-free run is dropped under max_len=4."""
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon") for i in (1, 2)],
        "doc_id long, text string",
    )
    assert rake_phrases(docs, min_occ=2, max_len=4).collect() == []
    out = rake_phrases(docs, min_occ=2, max_len=5).collect()
    assert out[0]["phrase"] == "alpha beta gamma delta epsilon"


# -------------------------------------------------------------- h-index
def test_host_h_index_hand_oracle(spark):
    """Via the registered query shape: page indegs 5,3,3,1 → h=3;
    indegs 1,1 → h=1. Computed inline with the same formula."""
    from pyspark.sql import Window

    indeg = spark.createDataFrame(
        [(1, 5, 10), (2, 3, 10), (3, 3, 10), (4, 1, 10),
         (5, 1, 20), (6, 1, 20)],
        "page long, indeg long, host long",
    )
    w = Window.partitionBy("host").orderBy(F.desc("indeg"), "page")
    got = {
        r["host"]: r["h_index"]
        for r in indeg.withColumn("rank", F.row_number().over(w))
        .select("host", F.least(F.col("rank").cast("long"), F.col("indeg")).alias("m"))
        .groupBy("host")
        .agg(F.max("m").cast("long").alias("h_index"))
        .collect()
    }
    assert got == {10: 3, 20: 1}


# --------------------------------------------------------- interarrival
def test_interarrival_metronome_vs_bursty(spark):
    """User 1 fires exactly every 10 minutes → cv²=0. User 2
    alternates 1-minute and 19-minute gaps (mean 10, var 81) →
    cv2_ppm = ⌊1e6·81/100⌋ = 810000."""
    rows, eid = [], 0
    t0 = datetime.datetime(2024, 1, 1)
    for i in range(13):
        rows.append((eid, 1, t0 + datetime.timedelta(minutes=10 * i),
                     "click", 0.0))
        eid += 1
    t = t0
    rows.append((eid, 2, t, "click", 0.0)); eid += 1
    for i in range(12):
        t = t + datetime.timedelta(minutes=1 if i % 2 == 0 else 19)
        rows.append((eid, 2, t, "click", 0.0)); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
        "event_type string, value double"
    )
    out = {r["user_id"]: (r["n_gaps"], r["mean_gap_min"], r["cv2_ppm"])
           for r in interarrival_regularity(ev, min_gaps=10).collect()}
    assert out[1] == (12, 10, 0)
    assert out[2] == (12, 10, 810_000)


def test_interarrival_min_gaps_gate(spark):
    rows = [(i, 1, datetime.datetime(2024, 1, 1, 0, i), "click", 0.0)
            for i in range(5)]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
        "event_type string, value double"
    )
    assert interarrival_regularity(ev, min_gaps=10).collect() == []
