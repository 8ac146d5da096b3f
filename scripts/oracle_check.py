#!/usr/bin/env python3
"""Run every __spark_entry__ query against its DuckDB oracle the way
the driver does (row count + schema + order-insensitive values).

Usage: python scripts/oracle_check.py [sf_dir] [query ...]
"""

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rdf_rdfa_spark.pipeline.session import get_spark  # noqa: E402


def norm(df: pd.DataFrame) -> set:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(
            lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
        )
    return set(
        map(tuple, df.astype(object).where(pd.notna(df), None)
            .itertuples(index=False, name=None))
    )


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark(cores=8, app_name="oracle-check")
    import __spark_entry__ as E

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        path = os.path.join(sf, t + ".parquet")
        if os.path.isdir(path):
            # spark-written table = a directory of part files
            path = os.path.join(path, "*.parquet")
        elif not os.path.exists(path):
            continue
        con.sql("CREATE VIEW %s AS SELECT * FROM '%s'" % (t, path))

    oracles = E.oracle_sql()
    failures = 0
    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception as e:
            print("%-24s ERROR(spark) %s: %s" % (name, type(e).__name__, str(e)[:200]))
            failures += 1
            continue
        if name not in oracles:
            print("%-24s rows-only: %d rows, cols=%s"
                  % (name, len(sdf), list(sdf.columns)))
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print("%-24s ERROR(duckdb) %s: %s" % (name, type(e).__name__, str(e)[:200]))
            failures += 1
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print("%-24s SCHEMA MISMATCH %s vs %s"
                  % (name, sorted(sdf.columns), sorted(odf.columns)))
            failures += 1
            continue
        ss, oo = norm(sdf), norm(odf)
        if ss == oo:
            print("%-24s OK  rows=%d" % (name, len(sdf)))
        else:
            failures += 1
            print("%-24s MISMATCH spark=%d oracle=%d" % (name, len(sdf), len(odf)))
            for x in sorted(ss - oo, key=str)[:3]:
                print("   spark-only:", x)
            for x in sorted(oo - ss, key=str)[:3]:
                print("   oracle-only:", x)
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
