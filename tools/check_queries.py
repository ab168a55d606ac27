"""Driver-mimic: run every queries() entry in Spark and its oracle_sql() in
DuckDB at sf0.01, compare row count, column names, and values (exact for
non-floats, exact-after-canonicalization for floats). Usage:

    python tools/check_queries.py [name ...] [--sf DIR]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype(np.float64)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype(np.int64)
    df = df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)
    return df


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(got.columns) != sorted(exp.columns):
        return [f"schema: spark={sorted(got.columns)} oracle={sorted(exp.columns)}"]
    if len(got) != len(exp):
        errs.append(f"rowcount: spark={len(got)} oracle={len(exp)}")
        return errs
    g, e = canon(got), canon(exp)
    for c in g.columns:
        gv, ev = g[c].to_numpy(), e[c].to_numpy()
        if gv.dtype.kind == "f":
            both_nan = pd.isna(gv) & pd.isna(ev)
            neq = ~both_nan & ~(gv == ev)
            if neq.any():
                i = int(np.nonzero(neq)[0][0])
                mx = np.nanmax(np.abs(np.where(both_nan, 0, gv - ev)))
                errs.append(f"col {c}: {int(neq.sum())} diffs, first@{i}: {gv[i]!r} vs {ev[i]!r}, maxabs={mx:.3g}")
        else:
            neq = ~(pd.isna(gv) & pd.isna(ev)) & ~(pd.Series(gv).fillna("∅").to_numpy() == pd.Series(ev).fillna("∅").to_numpy())
            if neq.any():
                i = int(np.nonzero(neq)[0][0])
                errs.append(f"col {c}: {int(neq.sum())} diffs, first@{i}: {gv[i]!r} vs {ev[i]!r}")
    return errs


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = "/root/testdata/sf0.01"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]

    import __spark_entry__ as entrymod
    from pyramids_spark.session import get_spark

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args or list(qs)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    spark = get_spark("check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    n_pass = n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            got = qs[name](spark, sf).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {type(ex).__name__}: {str(ex)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(got)} rows  [{time.time()-t0:.1f}s]")
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {str(ex)[:300]}")
            n_fail += 1
            continue
        errs = compare(name, got, exp)
        if errs:
            n_fail += 1
            print(f"FAIL {name} ({len(got)} vs {len(exp)} rows)  [{time.time()-t0:.1f}s]")
            for e in errs[:4]:
                print(f"   - {e}")
        else:
            n_pass += 1
            print(f"PASS {name}: {len(got)} rows  [{time.time()-t0:.1f}s]")
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
