#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: reads the parquet dumps
graft.Verify wrote, replays oracle_sql.json in DuckDB over the same sf
tables, and compares row counts, sorted-column schemas, and value hashes.

Usage: python3 scripts/local_verify.py <sfDir> <outDir>
(Dev tooling only — the library itself is pure Scala/Spark.)
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints→int64 where possible, floats rounded
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main(sf_dir: str, out_dir: str) -> int:
    out = Path(out_dir)
    oracles = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    failures = 0
    for name, sql in sorted(oracles.items()):
        res_dir = out / name
        if not res_dir.exists():
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        try:
            spark_df = canon(pd.read_parquet(res_dir))
            duck_df = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
            failures += 1
        elif len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
            failures += 1
        else:
            try:
                pd.testing.assert_frame_equal(spark_df, duck_df,
                                              check_dtype=False, check_exact=False,
                                              rtol=1e-6, atol=1e-9)
                print(f"PASS {name} ({len(spark_df)} rows)")
            except AssertionError as e:
                print(f"FAIL {name}: values differ\n  {str(e).splitlines()[-1]}")
                failures += 1
    print(f"\n{len(oracles) - failures}/{len(oracles)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
