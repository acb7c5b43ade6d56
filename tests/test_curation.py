"""Composed curation verdict vs hand-computed bitmasks and the DuckDB
twin (the exact comparison the driver's correctness gate performs)."""

import duckdb
import pandas as pd

from drone_spark.ops.curation import (
    R_LANG,
    R_LOW_QUALITY,
    R_REPETITIVE,
    R_TOO_SHORT,
    curation_verdict,
    curation_verdict_sql,
)

DOCS = [
    # clean english doc: kept
    (1, "the cat and the dog went to the market in town and it was fine "
        "for everyone that day"),
    # too short AND not english
    (2, "der hund"),
    # repetitive: one token dominates
    (3, "the " + "spam " * 40 + "and of to in is that it was for"),
    # punct- and digit-heavy -> low quality, english markers present
    (4, "the ,,,,,,,,,, ;;;;;;;;;; !!!!!!!!!! ?????????? 1111111111 "
        "2222222222 and of to is that was"),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_verdict_bitmask(spark):
    got = {
        r["doc_id"]: (r["reasons"], r["keep"])
        for r in curation_verdict(_docs_df(spark)).collect()
    }
    assert got[1] == (0, 1)
    assert got[2][0] & R_TOO_SHORT
    assert got[2][0] & R_LANG
    assert got[2][1] == 0
    assert got[3][0] & R_REPETITIVE
    assert got[4][0] & R_LOW_QUALITY


def test_budget_sample_matches_global_cumsum(spark):
    import hashlib

    from drone_spark.ops.curation import budget_sample

    docs = [(i, "tok " * (i % 7 + 1)) for i in range(200)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["cum_toks"], r["kept"])
        for r in budget_sample(df, budget_tokens=300).collect()
    }
    order = sorted(range(200), key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    cum, want = 0, {}
    for i in order:
        cum += i % 7 + 1
        want[i] = (cum, 1 if cum <= 300 else 0)
    assert got == want
    # layout independence: a different partitioning yields identical rows
    got2 = {
        r["doc_id"]: (r["cum_toks"], r["kept"])
        for r in budget_sample(df.repartition(13), budget_tokens=300).collect()
    }
    assert got2 == want


def test_budget_sample_empty_corpus(spark):
    from drone_spark.ops.curation import budget_sample

    df = spark.createDataFrame([], "doc_id long, text string")
    out = budget_sample(df, budget_tokens=10)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "n_toks", "cum_toks", "kept",
    ]


def test_verdict_matches_duckdb_twin(spark):
    sdf = curation_verdict(_docs_df(spark)).toPandas()
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(DOCS, columns=["doc_id", "text"]),
    )
    ddf = con.execute(curation_verdict_sql()).fetchdf()
    cols = ["doc_id", "n_toks", "quality", "lang_pred", "reasons", "keep"]
    s = sdf[cols].sort_values("doc_id").reset_index(drop=True)
    d = ddf[cols].sort_values("doc_id").reset_index(drop=True)
    assert s.astype(str).equals(d.astype(str))


# ------------------------------------------------------ source scorecard
def test_source_scorecard_hand_case(spark):
    """Source A: two identical docs (both dup-flagged) + one unique;
    source B: one doc duplicating A's text corpus-wide (cross-source
    dup charged to BOTH sides)."""
    from drone_spark.ops.curation import source_scorecard

    t = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, t, "A"),
            (2, t, "A"),
            (3, "completely different words forty one two three four five six", "A"),
            (4, t, "B"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {r["source"]: r for r in source_scorecard(docs).collect()}
    a, b = rows["A"], rows["B"]
    assert a["n_docs"] == 3 and a["n_dup_docs"] == 2
    assert b["n_docs"] == 1 and b["n_dup_docs"] == 1
    # doc 3 has no language markers → 'und'; A is 2×en + 1×und
    assert a["top_lang"] == "en" and a["top_lang_share_ppm"] == 666666
    assert b["top_lang"] == "en" and b["top_lang_share_ppm"] == 1000000
    # quality: all docs ≥10 tokens, no punct/digits → 100
    assert a["mean_quality"] == 100 and b["mean_quality"] == 100


def test_source_scorecard_sql_twin(spark):
    from drone_spark.ops.curation import (
        source_scorecard, source_scorecard_sql,
    )

    texts = [
        (i, ("word%d " % (i % 5)) * (3 + i % 9) + ("1, 2! " * (i % 3)),
         "s%d" % (i % 4))
        for i in range(40)
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string, source string")
    got = sorted(tuple(r) for r in source_scorecard(docs).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR, source VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", texts)
    want = sorted(tuple(r) for r in con.execute(source_scorecard_sql()).fetchall())
    assert got == want
