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
