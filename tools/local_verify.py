#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each parquet dir
under OUT_DIR, run the matching oracle SQL from oracle_sql.json in DuckDB
over the sf tables, and compare rows/schema/values (columns sorted by
name, exact equality)."""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        spark_df = duckdb.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
        if name not in oracle:
            print(f"{name:28s} rows={len(spark_df):6d}  (rows-only, no oracle)")
            continue
        try:
            oracle_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"{name:28s} ORACLE SQL ERROR: {e}")
            fails += 1
            continue
        s = spark_df[sorted(spark_df.columns)]
        o = oracle_df[sorted(oracle_df.columns)]
        problems = []
        # Emulate the driver comparator, which row-sorts with
        # pandas sort_values before hashing: unhashable cell types
        # (numpy arrays etc.) crash it there, so surface that here.
        try:
            s = s.sort_values(list(s.columns)).reset_index(drop=True)
            o = o.sort_values(list(o.columns)).reset_index(drop=True)
        except Exception as e:
            problems.append(f"driver sort_values would crash: {e}")
        if list(s.columns) != list(o.columns):
            problems.append(f"schema cols {list(s.columns)} vs {list(o.columns)}")
        elif len(s) != len(o):
            problems.append(f"rows {len(s)} vs {len(o)}")
        else:
            for c in s.columns:
                sv, ov = s[c], o[c]
                if sv.dtype != ov.dtype:
                    problems.append(f"dtype[{c}] {sv.dtype} vs {ov.dtype}")
                try:
                    if sv.dtype == object:
                        eq = all(
                            (a == b) if not hasattr(a, "__len__") or isinstance(a, str)
                            else (len(a) == len(b) and (pd.Series(a) == pd.Series(b)).all())
                            for a, b in zip(sv, ov))
                    else:
                        eq = sv.equals(ov)
                    if not eq:
                        idx = next(i for i in range(len(sv))
                                   if not _cell_eq(sv.iloc[i], ov.iloc[i]))
                        problems.append(
                            f"values[{c}] first diff at row {idx}: "
                            f"{sv.iloc[idx]!r} vs {ov.iloc[idx]!r}")
                except Exception as e:
                    problems.append(f"compare[{c}] error: {e}")
        if problems:
            fails += 1
            print(f"{name:28s} FAIL: {'; '.join(problems[:3])}")
        else:
            print(f"{name:28s} OK    rows={len(s)}")
    return fails


def _cell_eq(a, b):
    if isinstance(a, str) or not hasattr(a, "__len__"):
        return a == b
    return len(a) == len(b) and (pd.Series(a) == pd.Series(b)).all()


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
