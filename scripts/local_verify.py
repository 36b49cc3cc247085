#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: reads the parquet dumps
graft.Verify wrote, replays oracle_sql.json in DuckDB over the same sf
tables, and compares row counts, sorted-column schemas, and VALUE HASHES.

Driver-faithful by construction: values are canonicalized to strings and
md5-hashed, with NO cross-dtype leniency — an int64 4289959914387 vs a
float64 4289959914387.0 (the exact seam DuckDB's HUGEINT->pandas float64
conversion opened in round 11's x_reconcile_checksum) is a FAIL here, as
it is at the driver. Floats are rounded to 6 decimals before formatting
(both sides identically), everything else must match digit-for-digit.

Usage: python3 scripts/local_verify.py <sfDir> <outDir>
       python3 scripts/local_verify.py --selftest
(Dev tooling only — the library itself is pure Scala/Spark.)
"""
import hashlib
import json
import math
import sys
from pathlib import Path

import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _fmt(v) -> str:
    """Canonical string for one cell. Deliberately dtype-sensitive for
    int-vs-float (repr of 1.0 is '1.0', of 1 is '1') — that asymmetry is
    the driver behavior the old assert_frame_equal(check_dtype=False)
    harness papered over."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "\x00NULL"
        return repr(round(v, 6) + 0.0)  # -0.0 → 0.0: IEEE-equal, same text
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_fmt(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_fmt(x)}" for k, x in sorted(v.items())) + "}"
    if v is pd.NaT:
        return "\x00NULL"
    return str(v)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sorted-column, sorted-row frame of canonical STRINGS."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_integer_dtype(s):
            s = s.astype("int64").map(str)
        elif pd.api.types.is_float_dtype(s):
            s = s.map(_fmt)
        elif pd.api.types.is_bool_dtype(s):
            s = s.map(lambda b: "true" if b else "false")
        elif pd.api.types.is_datetime64_any_dtype(s):
            s = pd.to_datetime(s).dt.tz_localize(None).astype("datetime64[us]").map(_fmt)
        else:
            s = s.map(_fmt)
        out[c] = s.fillna("\x00NULL")
    cdf = pd.DataFrame(out, index=df.index)
    if len(cdf.columns):
        cdf = cdf.sort_values(by=list(cdf.columns), ignore_index=True)
    return cdf


def frame_hash(cdf: pd.DataFrame) -> str:
    h = hashlib.md5()
    h.update(("|".join(cdf.columns) + "\n").encode())
    for row in cdf.itertuples(index=False):
        h.update(("\x01".join(row) + "\n").encode())
    return h.hexdigest()


def first_diff(a: pd.DataFrame, b: pd.DataFrame) -> str:
    for i in range(len(a)):
        for c in a.columns:
            if a[c].iat[i] != b[c].iat[i]:
                return f"row {i} col {c}: spark={a[c].iat[i]!r} oracle={b[c].iat[i]!r}"
    return "(hash differs but no cell diff found?)"


def selftest() -> int:
    # the r11 regression class: equal values, int64 vs float64 → MUST fail
    a = canon(pd.DataFrame({"k": ["a"], "checksum": pd.array([4289959914387], dtype="int64")}))
    b = canon(pd.DataFrame({"k": ["a"], "checksum": [4289959914387.0]}))
    assert frame_hash(a) != frame_hash(b), "dtype seam NOT caught"
    # doubles differing below 6dp (same side of the rounding boundary)
    # → must pass; note this is ROUNDING as at the driver, not a
    # tolerance band — boundary-straddling values fail on both
    c = canon(pd.DataFrame({"x": [0.1234561999]}))
    d = canon(pd.DataFrame({"x": [0.1234562001]}))
    assert frame_hash(c) == frame_hash(d), "6dp rounding not applied"
    # row order must not matter
    e = canon(pd.DataFrame({"x": [2, 1]}))
    f = canon(pd.DataFrame({"x": [1, 2]}))
    assert frame_hash(e) == frame_hash(f), "row order leaked into hash"
    print("selftest OK: dtype seam caught, 6dp tolerance kept, order-free")
    return 0


def main(sf_dir: str, out_dir: str) -> int:
    import duckdb
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
        elif frame_hash(spark_df) != frame_hash(duck_df):
            print(f"FAIL {name}: hash differs — {first_diff(spark_df, duck_df)}")
            failures += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
    print(f"\n{len(oracles) - failures}/{len(oracles)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    if sys.argv[1:] == ["--selftest"]:
        sys.exit(selftest())
    sys.exit(main(sys.argv[1], sys.argv[2]))
