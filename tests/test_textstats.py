"""Text analysis ops over the driver-provided documents table."""

import pytest
from pyspark.sql import functions as F

from drone_spark.ops.textstats import (
    fingerprint, lang_id, quality_score, text_stats, token_count,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_token_count_matches_python(spark, docs):
    rows = (
        docs.select("doc_id", "text", token_count("text").alias("n"))
        .limit(50)
        .collect()
    )
    for r in rows:
        assert r["n"] == len(r["text"].split()), r["text"][:50]


def test_token_count_empty(spark):
    df = spark.createDataFrame([(1, ""), (2, "   "), (3, "a b")], "doc_id long, text string")
    got = {r["doc_id"]: r["n"] for r in df.select("doc_id", token_count("text").alias("n")).collect()}
    assert got == {1: 0, 2: 0, 3: 2}


def test_text_stats_sane(docs):
    s = text_stats(docs)
    assert s.count() == docs.count()
    bad = s.where(
        (F.col("n_chars") < 0)
        | (F.col("n_punct") > F.col("n_chars"))
        | (F.col("n_tokens") > F.col("n_chars") + 1)
    )
    assert bad.count() == 0


def test_quality_score_range(docs):
    q = quality_score(docs)
    assert q.where((F.col("quality") < 0) | (F.col("quality") > 100)).count() == 0


def test_fingerprint_stable_under_whitespace(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, " hello\tworld ")],
        "doc_id long, text string",
    )
    fps = [r["fingerprint"] for r in fingerprint(df).collect()]
    assert len(set(fps)) == 1


def test_lang_id_on_clear_text(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat and it was the best of the day"),
            (2, "der Hund und die Katze ist nicht ein Problem"),
            (3, "el perro y la casa de los amigos en un lugar"),
            (4, "xyzzy qwerty"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in lang_id(df).collect()}
    assert got == {1: "en", 2: "de", 3: "es", 4: "und"}


def test_vocab_topk_matches_python_and_plan(spark, docs):
    """Top-k vocabulary matches a pure-Python counter, and the plan
    uses distributed TakeOrdered top-k, not a global vocabulary sort."""
    from collections import Counter

    from drone_spark.ops.textstats import vocab_topk

    got = vocab_topk(docs, k=20).collect()
    pdf = docs.toPandas()
    c = Counter()
    for t in pdf["text"]:
        c.update(w for w in " ".join(t.lower().strip().split()).split(" ") if w)
    exp = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r["token"], r["n"]) for r in sorted(got, key=lambda r: r["rank"])] == exp
    plan = vocab_topk(docs, k=20)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_bm25_ranking_properties(spark):
    """Rare-term idf outweighs common; matching more query terms wins;
    scores match a hand-rolled python computation exactly."""
    import math

    from drone_spark.ops.textstats import bm25_topk

    corpus = [
        (1, "spark shuffle join"),          # rare 'shuffle' + 'join'
        (2, "join join join table"),        # only common 'join', high tf
        (3, "table scan filter"),           # no query terms
        (4, "spark shuffle shuffle"),       # rare term, high tf
        (5, "join table"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = [
        (r.doc_id, r.score)
        for r in bm25_topk(docs, ["shuffle", "join"], k=5).collect()
    ]
    # python oracle
    toks = {d: t.split() for d, t in corpus}
    n = len(corpus)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {
        q: sum(1 for v in toks.values() if q in v) for q in ("shuffle", "join")
    }
    exp = {}
    for d, v in toks.items():
        s = 0.0
        for q in ("shuffle", "join"):
            tf = v.count(q)
            if not tf:
                continue
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * len(v) / avgdl))
        if s:
            exp[d] = round(s, 6)
    assert dict(got) == exp
    ranked = [d for d, _ in got]
    assert ranked[0] == 1  # both terms beats either alone
    assert exp[4] > exp[2]  # rare-term doc beats common-term-only doc


def test_build_postings_positions(spark):
    """Hand-checked tf and 0-based position lists (phrase-query
    primitive): repeated tokens accumulate sorted positions."""
    from drone_spark.ops.textstats import build_postings

    docs = spark.createDataFrame(
        [(1, "a b a  c a"), (2, "c b")], "doc_id long, text string"
    )
    got = {
        (r.token, r.doc_id): (r.tf, list(r.positions))
        for r in build_postings(docs).collect()
    }
    assert got == {
        ("a", 1): (3, [0, 2, 4]),
        ("b", 1): (1, [1]),
        ("c", 1): (1, [3]),
        ("c", 2): (1, [0]),
        ("b", 2): (1, [1]),
    }


def test_phrase_docs_fixture(spark):
    """Consecutive-position semantics: doc 1 has 'a b' twice and
    'a b c' once; doc 2 has both tokens but never adjacent."""
    from drone_spark.ops.textstats import phrase_docs

    docs = spark.createDataFrame(
        [(1, "a b c x a b"), (2, "a x b a")], "doc_id long, text string"
    )
    two = {
        (r.doc_id): r.n_occurrences
        for r in phrase_docs(docs, ["a", "b"]).collect()
    }
    assert two == {1: 2}
    three = {
        (r.doc_id): r.n_occurrences
        for r in phrase_docs(docs, ["a", "b", "c"]).collect()
    }
    assert three == {1: 1}


def test_bm25_from_postings_matches_direct(spark):
    """Index-served BM25 ≡ direct BM25 on a corpus with repeated and
    query-absent tokens (VERDICT r3 item 3: serve retrieval from the
    materialized index)."""
    from drone_spark.ops.textstats import (
        bm25_from_postings, bm25_topk, build_postings,
    )

    docs = spark.createDataFrame(
        [
            (1, "hash join hash build probe"),
            (2, "sort merge join stream"),
            (3, "hash hash hash aggregate"),
            (4, "filter project scan"),
        ],
        "doc_id long, text string",
    )
    direct = [tuple(r) for r in bm25_topk(docs, ["hash", "join"], k=4).collect()]
    served = [
        tuple(r)
        for r in bm25_from_postings(
            build_postings(docs), ["hash", "join"], k=4
        ).collect()
    ]
    assert direct == served
    assert direct[0][0] in (1, 3)  # hash-heavy docs rank first


def test_phrase_from_postings_matches_direct(spark):
    from drone_spark.ops.textstats import (
        build_postings, phrase_docs, phrase_docs_from_postings,
    )

    docs = spark.createDataFrame(
        [(1, "a b c x a b"), (2, "a x b a")], "doc_id long, text string"
    )
    direct = {
        r.doc_id: r.n_occurrences
        for r in phrase_docs(docs, ["a", "b"]).collect()
    }
    served = {
        r.doc_id: r.n_occurrences
        for r in phrase_docs_from_postings(
            build_postings(docs), ["a", "b"]
        ).collect()
    }
    assert direct == served == {1: 2}


def test_bm25_empty_corpus_raises(spark):
    """ADVICE r3: empty / all-empty-text corpora must fail loudly, not
    with a bare TypeError from F.lit(None)."""
    import pytest

    from drone_spark.ops.textstats import bm25_topk

    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="n_docs == 0"):
        bm25_topk(empty, ["a"])
    blank = spark.createDataFrame(
        [(1, "   "), (2, "")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="avgdl"):
        bm25_topk(blank, ["a"])


def test_repetition_stats_matches_python(spark):
    import re
    from collections import Counter

    from drone_spark.ops.textstats import repetition_stats

    corpus = [
        (1, "the cat sat on the mat the cat sat again"),
        (2, "a a a a a a"),
        (3, "all tokens unique here today friend"),
        (4, ""),
        (5, "  spaced\t\tout   text  spaced out text "),
        (6, "x y x y x y x y"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_toks"], r["top_tok_bp"], r["dup2_bp"], r["dup3_bp"])
        for r in repetition_stats(docs).collect()
    }
    for doc_id, text in corpus:
        nt = re.sub(r"\s+", " ", text.strip().lower())
        toks = nt.split(" ") if nt else []
        g2 = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        g3 = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        want = (
            len(toks),
            Counter(toks).most_common(1)[0][1] * 10000 // len(toks) if toks else 0,
            (len(g2) - len(set(g2))) * 10000 // len(g2) if g2 else 0,
            (len(g3) - len(set(g3))) * 10000 // len(g3) if g3 else 0,
        )
        assert got[doc_id] == want, (doc_id, got[doc_id], want)


def test_repetition_stats_plan_is_pythonless(spark):
    from drone_spark.ops.textstats import repetition_stats

    docs = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    plan = (
        repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_repetition_stats_sql_twin_duckdb(spark):
    import duckdb

    from drone_spark.ops.textstats import repetition_stats, repetition_stats_sql

    corpus = [
        (1, "the cat sat on the mat the cat sat"),
        (2, "b b b b"),
        (3, ""),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = sorted(map(tuple, repetition_stats(docs).collect()))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?)", corpus)
    want = sorted(map(tuple, con.execute(repetition_stats_sql()).fetchall()))
    assert got == want


def test_boilerplate_stats_matches_python(spark):
    from drone_spark.ops.textstats import boilerplate_stats

    footer = "copyright example corp all rights reserved"
    corpus = [
        (1, "alpha beta gamma delta " + footer),
        (2, "epsilon zeta eta theta " + footer),
        (3, "iota kappa lambda mu " + footer),
        (4, "unique words only here no shared shingles at all"),
        (5, "x"),  # too short for a 4-gram
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_shingles"], r["boiler_bp"])
        for r in boilerplate_stats(docs, n=4, min_df=3).collect()
    }

    def shingles(text):
        toks = text.split()
        return {" ".join(toks[i : i + 4]) for i in range(len(toks) - 3)}

    from collections import Counter

    df = Counter(sh for _, t in corpus for sh in shingles(t))
    for doc_id, text in corpus:
        sh = shingles(text)
        boiler = sum(1 for s in sh if df[s] >= 3)
        want = (len(sh), boiler * 10000 // len(sh) if sh else 0)
        assert got[doc_id] == want, (doc_id, got[doc_id], want)
    # the shared footer is boilerplate: docs 1-3 have nonzero coverage
    assert all(got[i][1] > 0 for i in (1, 2, 3))
    assert got[4][1] == 0 and got[5] == (0, 0)


def test_boilerplate_sql_twin_duckdb(spark):
    import duckdb

    from drone_spark.ops.textstats import boilerplate_stats, boilerplate_stats_sql

    corpus = [
        (1, "one two three four five"),
        (2, "one two three four six"),
        (3, "one two three four seven"),
        (4, ""),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = sorted(map(tuple, boilerplate_stats(docs, n=4, min_df=3).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", corpus)
    want = sorted(map(tuple, con.execute(boilerplate_stats_sql()).fetchall()))
    assert got == want


def test_tfidf_topk_exact_fixed_point(spark):
    """doc 1 'apple banana apple', doc 2 'banana cherry':
    df(apple)=1 df(banana)=2 df(cherry)=1 →
    doc1: apple 2e12 > banana 5e11; doc2: cherry 1e12 > banana 5e11."""
    from drone_spark.ops.textstats import tfidf_topk

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry")],
        "doc_id long, text string",
    )
    got = {(r["doc_id"], r["rank"]): (r["token"], r["score_fx"])
           for r in tfidf_topk(docs, k=2).collect()}
    assert got == {
        (1, 1): ("apple", 2_000_000_000_000),
        (1, 2): ("banana", 500_000_000_000),
        (2, 1): ("cherry", 1_000_000_000_000),
        (2, 2): ("banana", 500_000_000_000),
    }


def test_tfidf_topk_matches_duckdb_twin(spark):
    import duckdb

    from drone_spark.ops.textstats import tfidf_topk, tfidf_topk_sql

    corpus = [
        (1, "the quick brown fox"),
        (2, "the quick red fox"),
        (3, "THE  LAZY   dog"),
        (4, ""),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = sorted(map(tuple, tfidf_topk(docs, k=3).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", corpus)
    want = sorted(map(tuple, con.execute(tfidf_topk_sql(k=3)).fetchall()))
    assert got == want


def test_bigram_novelty_exact(spark):
    """d1 'a b c', d2 'a b d', d3 'x': df('a b')=2, others 1 →
    both d1 and d2 have 1 rare of 2 bigrams = 500000 ppm; d3 0/0/0."""
    from drone_spark.ops.textstats import bigram_novelty

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d"), (3, "x")], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["n_bigrams"], r["n_rare"], r["rare_ppm"])
           for r in bigram_novelty(docs, rare_df=1).collect()}
    assert got == {1: (2, 1, 500000), 2: (2, 1, 500000), 3: (0, 0, 0)}


def test_bigram_novelty_repeated_bigram_counts_df_once(spark):
    """A doc repeating its own bigram must not deflate its novelty:
    df is over DISTINCT docs, but n counts every occurrence."""
    import duckdb

    from drone_spark.ops.textstats import bigram_novelty, bigram_novelty_sql

    corpus = [(1, "a b a b"), (2, "c d")]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["n_rare"], r["rare_ppm"])
           for r in bigram_novelty(docs).collect()}
    # d1 bigrams: 'a b'×2, 'b a'×1 → all df=1 → 3/3 rare
    assert got[1] == (3, 3, 1000000)
    assert got[2] == (1, 1, 1000000)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", corpus)
    want = {r[0]: (r[1], r[2], r[3])
            for r in con.execute(bigram_novelty_sql()).fetchall()}
    assert got == want


def test_winnow_guarantee_shared_run_shares_a_fingerprint(spark):
    """Winnowing's coverage guarantee: two docs sharing ≥ w+k−1 = 6
    consecutive tokens must share ≥1 fingerprint; and selection
    density is ~2/(w+1) of positions, bounded above by 1 per window."""
    from drone_spark.ops.textstats import winnow_fingerprints

    shared = "one two three four five six"
    docs = spark.createDataFrame(
        [(1, f"aa bb cc {shared} dd ee"),
         (2, f"xx {shared} yy zz qq rr")],
        "doc_id long, text string",
    )
    fp = winnow_fingerprints(docs, k=3, w=4).collect()
    f1 = {r["fp"] for r in fp if r["doc_id"] == 1}
    f2 = {r["fp"] for r in fp if r["doc_id"] == 2}
    assert f1 & f2
    # short doc (< k+w-1 tokens) emits nothing
    short = spark.createDataFrame([(9, "a b c d e")], "doc_id long, text string")
    assert winnow_fingerprints(short, k=3, w=4).count() == 0


def test_winnow_matches_duckdb_twin_and_layout(spark):
    import duckdb

    from drone_spark.ops.textstats import (
        winnow_fingerprints,
        winnow_fingerprints_sql,
    )

    corpus = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "pack my box with five dozen liquor jugs right now"),
        (3, "the quick brown fox naps under the lazy dog today"),
        (4, "tiny"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = sorted(map(tuple, winnow_fingerprints(docs, k=3, w=4).collect()))
    assert got == sorted(map(tuple, winnow_fingerprints(
        docs.repartition(5), k=3, w=4).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", corpus)
    want = sorted(map(tuple, con.execute(
        winnow_fingerprints_sql(k=3, w=4)).fetchall()))
    assert got == want


def test_cooccurrence_lift_exact(spark):
    """Raw events: (a,b)×4, (a,c)×2, (d,b)×2 → N=8.
    lift(a,b) = 8·4/(6·6) = 0.888… → 888888 ppm;
    lift(a,c) = 8·2/(6·2) = 4/3 → 1333333; lift(d,b) = 8·2/(2·6) →
    1333333. Pre-aggregated path must agree."""
    from drone_spark.ops.textstats import cooccurrence_lift

    ev = ([("a", "b")] * 4 + [("a", "c")] * 2 + [("d", "b")] * 2)
    raw = spark.createDataFrame(ev, "x string, y string")
    got = {(r["a"], r["b"]): (r["n_ab"], r["lift_ppm"])
           for r in cooccurrence_lift(raw, "x", "y", min_count=2).collect()}
    assert got == {
        ("a", "b"): (4, 888888),
        ("a", "c"): (2, 1333333),
        ("d", "b"): (2, 1333333),
    }
    pre = raw.groupBy("x", "y").count()
    got2 = {(r["a"], r["b"]): (r["n_ab"], r["lift_ppm"])
            for r in cooccurrence_lift(pre, "x", "y", min_count=2,
                                       count_col="count").collect()}
    assert got2 == got
