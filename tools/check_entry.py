"""Emulate the driver's correctness gate: run each __spark_entry__
query on Spark and its oracle_sql on DuckDB at the given sf dir;
compare row count, column names, and an order-insensitive value hash.

Usage: python tools/check_entry.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from drone_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def value_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x01".join(norm_cell(r[i]) for i in order) for r in rows
    )
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def _type_name(v):
    return type(v).__name__


def type_mismatches(srows, scols, drows, dcols):
    """Per-column Python *type* comparison — the round-1 driver failures
    were value-identical but type-widened (DuckDB HUGEINT/DECIMAL(38,2)
    vs Spark BIGINT/DECIMAL(28,2)), which some harness normalizers
    stringify differently (e.g. float64 '150.0' vs Decimal '150.00').
    Returns [(col, spark_types, duck_types), ...] for columns whose
    non-null type sets differ."""
    sidx = {c: i for i, c in enumerate(scols)}
    didx = {c: i for i, c in enumerate(dcols)}
    out = []
    for c in sorted(set(scols) & set(dcols)):
        st = {_type_name(r[sidx[c]]) for r in srows if r[sidx[c]] is not None}
        dt = {_type_name(r[didx[c]]) for r in drows if r[didx[c]] is not None}
        if st != dt:
            out.append((c, sorted(st), sorted(dt)))
    return out


def driver_canon_error(sdf, con, sql):
    """Emulate the driver's canonicalizer: pandas ``sort_values`` over
    ALL columns of both result frames. Multi-column lexsort factorizes
    each column through a hash table, so any unhashable cell (list /
    dict / ndarray) raises — exactly the r3 ``postings`` failure
    (TypeError: unhashable type: 'list') the hash-on-str gate below
    missed. Returns an error string, or None if both frames sort."""
    try:
        spdf = sdf.toPandas()
        spdf.sort_values(by=list(spdf.columns), ignore_index=True)
        ddf = con.execute(sql).df()
        ddf.sort_values(by=list(ddf.columns), ignore_index=True)
    except Exception as e:  # noqa: BLE001 — any crash = driver red row
        return f"{type(e).__name__}: {str(e)[:140]}"
    return None


def pandas_kind_mismatches(sdf, con, sql):
    """Emulate a pandas-based harness: Spark .toPandas() vs DuckDB
    .df() — compare per-column dtype *kinds* (int/float/object/M...).
    DuckDB narrows DECIMAL→float64 and HUGEINT→float64 here while Spark
    yields object(Decimal)/int64, so any kind gap predicts a driver
    hash mismatch even when fetchall() values agree."""
    spdf = sdf.toPandas()
    ddf = con.execute(sql).df()
    out = []
    for c in sorted(set(spdf.columns) & set(ddf.columns)):
        sk, dk = spdf[c].dtype.kind, ddf[c].dtype.kind
        if sk != dk:
            out.append((c, str(spdf[c].dtype), str(ddf[c].dtype)))
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check-entry", cores=8, shuffle_partitions=8,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            # persist: the dtype-kind check re-reads via toPandas —
            # without the cache that re-executes the whole pipeline
            sdf = fn(spark, sf_dir).persist()
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"{name:24s} SPARK-ERROR {type(e).__name__}: {str(e)[:160]}")
            failures.append(name)
            try:  # don't leak partial cache blocks into later queries
                sdf.unpersist()
            except Exception:
                pass
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(srows)} rows, {t_spark:.1f}s (no oracle)")
            if len(srows) == 0 and name != "simhash_dedup":
                print(f"  WARNING: 0 rows")
            sdf.unpersist()
            continue
        try:
            # materialize the oracle once — the dtype-kind check below
            # re-reads it as a DataFrame; recursive-CTE oracles are too
            # expensive to run twice
            con.execute("CREATE OR REPLACE TEMP TABLE _oracle AS " + oracles[name])
            res = con.execute("SELECT * FROM _oracle")
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"{name:24s} DUCKDB-ERROR {type(e).__name__}: {str(e)[:160]}")
            failures.append(name)
            sdf.unpersist()
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        ok_hash = value_hash(srows, scols) == value_hash(drows, dcols)
        tmis = type_mismatches(srows, scols, drows, dcols)
        kmis = pandas_kind_mismatches(sdf, con, "SELECT * FROM _oracle")
        cerr = driver_canon_error(sdf, con, "SELECT * FROM _oracle")
        sdf.unpersist()
        ok_types = not tmis and not kmis
        ok_canon = cerr is None
        status = (
            "OK"
            if (ok_cols and ok_count and ok_hash and ok_types and ok_canon)
            else "MISMATCH"
        )
        print(
            f"{name:24s} {status}  rows {len(srows)}/{len(drows)} "
            f"cols={'OK' if ok_cols else f'{scols} vs {dcols}'} "
            f"hash={'OK' if ok_hash else 'FAIL'} "
            f"types={'OK' if ok_types else 'FAIL'}  {t_spark:.1f}s"
        )
        for c, st, dt in tmis:
            print(f"   TYPE  {c}: spark={st} duck={dt}")
        for c, sd, dd in kmis:
            print(f"   DTYPE {c}: spark_pandas={sd} duck_pandas={dd}")
        if cerr:
            print(f"   CANON driver-canonicalizer crash: {cerr}")
        if status != "OK":
            failures.append(name)
            if not ok_hash and ok_count and ok_cols:
                # show a sample diff
                s_set = {tuple(norm_cell(c) for c in r) for r in srows}
                d_set = {tuple(norm_cell(c) for c in r) for r in drows}
                print("   spark-only:", list(s_set - d_set)[:3])
                print("   duck-only :", list(d_set - s_set)[:3])
    print("FAILURES:", failures if failures else "none")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
