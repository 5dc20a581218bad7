"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at a given sf, compare
row count, column names, and values (order-insensitive; floats to 1e-9
relative or exact string match reported separately).

Usage: python tools/check_queries.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

# repo-root import regardless of cwd (the gate must run from anywhere)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df, float_dp=9):
    """pandas DataFrame -> sorted list of value tuples with canonical types."""
    cols = sorted(df.columns)
    rows = []
    for t in df[cols].itertuples(index=False):
        row = []
        for v in t:
            if v is None:
                row.append("NULL")
            elif isinstance(v, float):
                if math.isnan(v):
                    row.append("NaN")
                else:
                    row.append(f"{v:.{float_dp}g}")
            elif isinstance(v, (list, tuple)) or str(type(v)).find("ndarray") >= 0:
                row.append("[" + ",".join(str(x) for x in v) + "]")
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return cols, sorted(rows)


def main():
    import argparse

    ap = argparse.ArgumentParser(
        description="type-strict value-hash gate: every registry query vs "
        "its DuckDB oracle"
    )
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("name_filter", nargs="?", default="")
    args = ap.parse_args()
    sf_dir, name_filter = args.sf_dir, args.name_filter

    # the FULL registry (curated driver catalog + LOCAL_ONLY variants): the
    # local gate is the coverage backstop for entries the <=50-row driver
    # catalog cannot carry
    from ontology_mapping_spark import queries as _q
    from ontology_mapping_spark.session import get_spark

    spark = get_spark(
        "check_queries",
        parallelism=8,
        shuffle_partitions=16,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, osql = _q.registry(), _q.oracles()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if name_filter and name_filter not in name:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: SPARK ERROR {str(ex).splitlines()[0][:120]}")
            n_fail += 1
            continue
        if name not in osql:
            print(f"ROWS {name}: {len(got)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            want = con.execute(osql[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: DUCKDB ERROR {str(ex).splitlines()[0][:120]}")
            n_fail += 1
            continue
        gc, gv = canon(got)
        wc, wv = canon(want)
        status = []
        if len(gv) != len(wv):
            status.append(f"rowcount {len(gv)} != {len(wv)}")
        if gc != wc:
            status.append(f"schema {gc} != {wc}")
        # type-strict check mirroring the driver's value hash: a BIGINT
        # column vs a VARCHAR column stringifies identically here but
        # hash-diverges at the driver (round-1 sibling_2hop_join lesson)
        if gc == wc:
            gk = [got[c].dtype.kind for c in gc]
            wk = [want[c].dtype.kind for c in wc]
            norm = lambda ks: ["i" if k in "iu" else k for k in ks]
            if norm(gk) != norm(wk):
                status.append(f"dtype kinds {gk} != {wk} (driver hash would diverge)")
        if not status and gv != wv:
            diff = [i for i, (a, b) in enumerate(zip(gv, wv)) if a != b][:3]
            examples = [(gv[i], wv[i]) for i in diff]
            status.append(f"values differ, e.g. {examples}")
        if status:
            print(f"FAIL {name}: {'; '.join(status)}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(gv)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    import __spark_entry__ as _e

    print(
        f"\n{n_pass} pass, {n_fail} fail "
        f"(registry {len(_q.registry())} queries; driver catalog "
        f"{len(_e.queries())} with {len(_e.oracle_sql())} oracles)"
    )
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
