#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [name,name,...]

The optional third arg restricts checking to the named queries (matches
Verify's SPARK_GRAFT_ONLY filter for single-query iteration).

Reads each <verifyOutDir>/<name>/ parquet (Spark result) VIA PYARROW —
the same reader the driver uses — runs the matching SQL from
oracle_sql.json in DuckDB with views over the sfDir tables, sorts
columns by name, and compares row-by-row with small float tolerance
reporting plus an exact-hash verdict like the driver.

Why pyarrow and not DuckDB for the Spark side: the driver reads the
Spark parquet with pyarrow (decimal128 -> Python Decimal objects,
rendering 'Decimal(...)' -> '106140089767') while DuckDB's .df()
converts DECIMAL to float64 ('106140089767.0'). Pushing BOTH sides
through DuckDB masked exactly that rendering class and let round 4's
q83 red row ship while this replica said PASS.
"""
import glob
import json
import sys

import duckdb
import pandas as pd
import pyarrow.parquet as pq


def read_spark_result(path):
    """Read a Spark parquet output dir the way the driver does: pyarrow."""
    files = sorted(glob.glob(f"{path}/*.parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    tables = [pq.read_table(f) for f in files]
    import pyarrow as pa
    return pa.concat_tables(tables).to_pandas()

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df):
    df = df[sorted(df.columns)]
    return df


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    if only:
        names = set(only.split(","))
        oracle = {k: v for k, v in oracle.items() if k in names}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = read_spark_result(f"{out_dir}/{name}")
            ora_df = con.sql(sql).df()
            s, o = canon(spark_df), canon(ora_df)
            status = []
            if list(s.columns) != list(o.columns):
                status.append(f"SCHEMA cols {list(s.columns)} vs {list(o.columns)}")
            elif len(s) != len(o):
                status.append(f"ROWS {len(s)} vs {len(o)}")
            else:
                import pandas as pd
                s2 = s.reset_index(drop=True)
                o2 = o.reset_index(drop=True)
                # exact-string hash like the driver
                h_s = pd.util.hash_pandas_object(
                    s2.astype(str), index=False).sum()
                h_o = pd.util.hash_pandas_object(
                    o2.astype(str), index=False).sum()
                if h_s != h_o:
                    diff_cols = []
                    for c in s2.columns:
                        if not s2[c].astype(str).equals(o2[c].astype(str)):
                            diff_cols.append(c)
                    status.append(f"HASH diff cols={diff_cols}")
                    for c in diff_cols[:2]:
                        neq = s2[c].astype(str) != o2[c].astype(str)
                        idx = neq[neq].index[:3]
                        for i in idx:
                            status.append(
                                f"   [{c}] row{i}: spark={s2[c][i]!r} oracle={o2[c][i]!r}")
            if status:
                n_fail += 1
                print(f"FAIL {name}: " + "; ".join(status[:6]))
            else:
                n_pass += 1
                print(f"PASS {name} ({len(s)} rows)")
        except Exception as e:
            n_fail += 1
            print(f"ERROR {name}: {e}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
