"""Local mirror of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare
row-count + schema(column names) + order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


# ---------------------------------------------------------------------------
# Pandas oracles for queries whose math is not SQL-expressible.
# As of round 3 every battery query has a DuckDB SQL oracle (the former
# pandas-oracled four became SQL-recomputable: S2 encode and the UTM
# Snyder series were ported to SQL, minhash pairs are checked against
# exact all-pairs Jaccard, and the simhash battery query switched to the
# md5 hash family which DuckDB can replay end-to-end). This registry
# remains for any future query whose math cannot reach SQL.
# ---------------------------------------------------------------------------

PANDAS_ORACLES: dict = {}


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from geeflow_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"[SPARK-FAIL] {name}: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            if name in PANDAS_ORACLES:
                exp = PANDAS_ORACLES[name](sf_dir)
                g, e = canon(got), canon(exp)
                if list(g.columns) == list(e.columns) and g.equals(e):
                    print(f"[OK-PANDAS ] {name}: {len(g)} rows")
                else:
                    print(f"[PANDAS-DIFF] {name}: spark {len(g)} rows "
                          f"{list(g.columns)} vs oracle {len(e)} rows "
                          f"{list(e.columns)}")
                    failures.append(name)
            else:
                print(f"[ROWS-ONLY ] {name}: {len(got)} rows, "
                      f"cols={sorted(got.columns)}")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"[SQL-FAIL  ] {name}: {e}")
            failures.append(name)
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"[SCHEMA    ] {name}: spark={list(g.columns)} "
                  f"oracle={list(e.columns)}")
            failures.append(name)
            continue
        if len(g) != len(e):
            print(f"[ROWCOUNT  ] {name}: spark={len(g)} oracle={len(e)}")
            failures.append(name)
            continue
        if not g.equals(e):
            neq = (g != e).any(axis=1)
            print(f"[VALUES    ] {name}: {neq.sum()}/{len(g)} rows differ")
            print("  spark:", g[neq].head(3).to_dict("records"))
            print("  oracle:", e[neq].head(3).to_dict("records"))
            failures.append(name)
            continue
        print(f"[OK        ] {name}: {len(g)} rows")

    # entry smoke
    if not only:
        n = entrymod.entry(spark).count()
        print(f"[ENTRY     ] rows={n}")

    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
