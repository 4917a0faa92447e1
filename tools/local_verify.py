#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each parquet dir
under OUT_DIR, run the matching oracle SQL from oracle_sql.json in DuckDB
over the sf tables, and compare rows/schema/hash the way the driver does.

Driver-faithful dtype semantics (the r8 lesson): the Spark side is read
with pandas.read_parquet (pyarrow types — decimal128 becomes an `object`
column of decimal.Decimal), while the oracle side is materialized via
DuckDB's .df() (DECIMAL becomes float64). The two sides are then
row-sorted and hashed with pd.util.hash_pandas_object — so equal VALUES
with different dtypes fail the hash, exactly as in the driver. Reading
the Spark side through DuckDB (the pre-r9 behavior of this tool) erased
that difference and masked the class of bug."""
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
        parts = sorted(glob.glob(f"{qdir}/*.parquet"))
        spark_df = pd.concat([pd.read_parquet(p) for p in parts],
                             ignore_index=True) if parts else pd.DataFrame()
        if name not in oracle:
            print(f"{name:28s} rows={len(spark_df):6d}  (rows-only, no oracle)")
            continue
        try:
            oracle_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"{name:28s} ORACLE SQL ERROR: {e}")
            fails += 1
            continue
        s = _norm_datetimes(spark_df[sorted(spark_df.columns)])
        o = _norm_datetimes(oracle_df[sorted(oracle_df.columns)])
        problems = []
        # The driver row-sorts with pandas sort_values before hashing:
        # unhashable cell types (numpy arrays etc.) crash it there, so
        # surface that here rather than working around it — the repo
        # convention is that no query outputs an array-typed column.
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
            # The driver verdict: hash_pandas_object over the row-sorted
            # frame. dtype differences (Decimal-object vs float64,
            # int32 vs int64) change the hash even when values are equal.
            try:
                hs = pd.util.hash_pandas_object(s, index=False)
                ho = pd.util.hash_pandas_object(o, index=False)
                if not (hs.values == ho.values).all():
                    problems.append("hash mismatch")
                    problems.extend(_diagnose(s, o))
            except Exception as e:
                problems.append(f"driver hash would crash: {e}")
                problems.extend(_diagnose(s, o))
        if problems:
            fails += 1
            print(f"{name:28s} FAIL: {'; '.join(problems[:4])}")
        else:
            print(f"{name:28s} OK    rows={len(s)}")
    return fails


def _norm_datetimes(df: pd.DataFrame) -> pd.DataFrame:
    """Coerce datetime-like columns to datetime64[ns] on BOTH sides.

    The driver's pandas/duckdb versions materialize dates and
    timestamps with the SAME dtype on both sides (r8 evidence: every
    timestamp-bearing query hash-matched), but local lib versions can
    differ (pyarrow -> ns, duckdb .df() -> us; DATE -> object date vs
    datetime64). Resolution differences are version artifacts, not
    value differences, so normalize them — while leaving Decimal
    `object` columns UNTOUCHED (Decimal-vs-float64 is the real driver
    mismatch class this tool exists to catch)."""
    out = df.copy()
    for c in out.columns:
        dt = out[c].dtype
        if str(dt).startswith("datetime64") and str(dt) != "datetime64[ns]":
            out[c] = out[c].astype("datetime64[ns]")
        elif dt == object:
            import datetime
            head = [v for v in out[c].head(50) if v is not None]
            if head and all(isinstance(v, datetime.date)
                            and not isinstance(v, datetime.datetime)
                            for v in head):
                out[c] = pd.to_datetime(out[c])
    return out


def _diagnose(s: pd.DataFrame, o: pd.DataFrame):
    """Explain a hash mismatch: per-column dtype and first value diff."""
    problems = []
    for c in s.columns:
        sv, ov = s[c], o[c]
        if sv.dtype != ov.dtype:
            problems.append(f"dtype[{c}] {sv.dtype} vs {ov.dtype}")
        try:
            idx = next((i for i in range(len(sv))
                        if not _cell_eq(sv.iloc[i], ov.iloc[i])), None)
            if idx is not None:
                problems.append(
                    f"values[{c}] first diff at row {idx}: "
                    f"{sv.iloc[idx]!r} vs {ov.iloc[idx]!r}")
        except Exception as e:
            problems.append(f"compare[{c}] error: {e}")
    return problems


def _cell_eq(a, b):
    if isinstance(a, (str, bytes)) or not hasattr(a, "__len__"):
        try:
            return bool(a == b)
        except Exception:
            return False
    return len(a) == len(b) and all(_cell_eq(x, y) for x, y in zip(a, b))


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
