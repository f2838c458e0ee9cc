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
# geo_* entries are harness recomputations through the numpy kernels
# (they cross-check the SPARK PLUMBING - derivation arithmetic, UDF
# batching, aggregation - while the kernels themselves carry exact-value
# unit tests); dedup_minhash_pairs is a GENUINELY independent oracle: it
# uses a different 64-bit shingle hash family entirely, so agreement
# means the verified-pair set is hash-family-invariant.
# ---------------------------------------------------------------------------

def _docs_geo_pdf(sf_dir):
    import pandas as pd
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id"]]
    i = d["doc_id"].to_numpy(np.int64)
    d["lat"] = -60.0 + ((i * 2654435761) % 4294967296) / 4294967296.0 * 132.0
    d["lon"] = -180.0 + ((i * 40503 + 12345) % 65536) / 65536.0 * 360.0
    return d


def _po_geo_cell_counts(sf_dir):
    import pandas as pd
    from geeflow_spark.functions import s2
    d = _docs_geo_pdf(sf_dir)
    cells = s2.latlon_to_cell_id(d["lat"].to_numpy(),
                                 d["lon"].to_numpy(), 5).astype(np.int64)
    out = pd.Series(cells).value_counts().sort_index()
    return pd.DataFrame({"cell": out.index.to_numpy(np.int64),
                         "count": out.to_numpy(np.int64)})


def _po_geo_tile_origin(sf_dir):
    import pandas as pd
    from geeflow_spark.functions import utm as utm_lib
    d = _docs_geo_pdf(sf_dir)
    e, n, zn, zl = utm_lib.from_latlon(d["lat"].to_numpy(),
                                       d["lon"].to_numpy())
    x0 = np.round((e - 10.0 * 96 / 2.0) / 10.0) * 10.0
    y0 = np.round((n - 10.0 * 96 / 2.0) / 10.0) * 10.0
    return pd.DataFrame({
        "doc_id": d["doc_id"].to_numpy(np.int64),
        "utm_zone": pd.Series(zn).astype(str) + pd.Series(zl).astype(str),
        "tile_x": x0, "tile_y": y0})


def _po_dedup_minhash(sf_dir):
    """Independent minhash oracle: blake2b-derived shingle hashes (a
    different family from the engine's JVM xxhash64+polynomial), same
    (a*x+b) signature construction, same banding, exact string-shingle
    Jaccard verification at 0.6."""
    import hashlib
    import itertools
    import pandas as pd
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    MERS = (1 << 61) - 1
    rng = np.random.default_rng(1)
    a = rng.integers(1, MERS, 64, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, MERS, 64, dtype=np.int64).astype(np.uint64)

    def shingles(t):
        toks = (t or "").split()
        if len(toks) < 3:
            return {" ".join(toks)} if toks else set()
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    def h64(s):
        return int.from_bytes(hashlib.blake2b(
            s.encode("utf-8"), digest_size=8).digest(), "little")

    sh_sets, sigs = {}, {}
    for did, txt in zip(d["doc_id"], d["text"]):
        sh = shingles(txt)
        sh_sets[did] = sh
        if not sh:
            sigs[did] = np.zeros(64, dtype=np.uint64)
            continue
        hv = np.array([h64(x) for x in sh], dtype=np.uint64) % np.uint64(MERS)
        sigs[did] = ((a[:, None] * hv[None, :] + b[:, None])
                     % np.uint64(MERS)).min(axis=1)

    buckets = {}
    for did, sig in sigs.items():
        for band in range(16):
            key = (band, tuple(sig[band * 4:(band + 1) * 4]))
            buckets.setdefault(key, []).append(did)
    cand = set()
    for ids in buckets.values():
        for x, y in itertools.combinations(sorted(ids), 2):
            cand.add((x, y))
    rows = []
    for x, y in sorted(cand):
        sa, sb = sh_sets[x], sh_sets[y]
        u = len(sa | sb)
        j = (len(sa & sb) / u) if u else 0.0
        if j >= 0.6:
            rows.append({"a": x, "b": y, "jaccard": round(j, 6)})
    return pd.DataFrame(rows, columns=["a", "b", "jaccard"])


def _po_dedup_simhash(sf_dir):
    """EXACT simhash recompute outside Spark: tools/xxh64 reproduces
    the JVM xxhash64 token hashing bit-for-bit; the polynomial k-gram
    combine, distinct-shingle bit fold, banding and hamming filter
    mirror operators/dedup.py."""
    import itertools
    import re
    import pandas as pd
    from tools.xxh64 import xxh64_str_signed
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    POLY = np.uint64(0x100000001B3)
    shifts = np.arange(64, dtype=np.uint64)

    def simhash(t):
        toks = [x for x in re.split(r"\s+", (t or "").strip(" ")) if x]
        if not toks:
            return 0
        th = np.array([np.uint64(xxh64_str_signed(x) % (1 << 64))
                       for x in toks], dtype=np.uint64)
        if len(th) >= 2:
            sh = th[:-1] * POLY + th[1:]
        else:
            sh = th
        sh = np.unique(sh)
        bits = ((sh[:, None] >> shifts[None, :]) & np.uint64(1))             .astype(np.int64)
        sums = (2 * bits - 1).sum(axis=0)
        return int(((sums > 0).astype(np.uint64)
                    << shifts).sum().astype(np.int64))

    hs = {did: simhash(t) for did, t in zip(d["doc_id"], d["text"])}
    buckets = {}
    for did, h in hs.items():
        hu = h % (1 << 64)
        for band in range(4):
            buckets.setdefault((band, (hu >> (band * 16)) & 0xFFFF),
                               []).append(did)
    rows = set()
    for ids in buckets.values():
        for x, y in itertools.combinations(sorted(ids), 2):
            ham = bin((hs[x] ^ hs[y]) % (1 << 64)).count("1")
            if ham <= 16:
                rows.add((x, y, ham))
    return pd.DataFrame(sorted(rows), columns=["a", "b", "hamming"])


PANDAS_ORACLES = {
    "geo_cell_counts": _po_geo_cell_counts,
    "geo_tile_origin": _po_geo_tile_origin,
    "dedup_minhash_pairs": _po_dedup_minhash,
    "dedup_simhash_pairs": _po_dedup_simhash,
}


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
