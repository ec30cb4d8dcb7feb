#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json query in DuckDB against the parquet tables in
sfDir, loads the corresponding Spark result parquet from verifyOutDir,
sorts columns by name and rows by all values, and reports exact-match /
approx-match / mismatch per query.  (Dev aid only — NOT part of the
shipped library; the real gate is driver-side.)
"""
import json, os, sys, glob, math
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # timestamps → ISO strings for stable compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    try:
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    except Exception:
        df = df.iloc[sorted(range(len(df)), key=lambda i: str(df.iloc[i].tolist()))].reset_index(drop=True)
    return df

def values_equal(a, b):
    if a is None and b is None: return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b): return True
        return a == b
    return a == b

def approx_equal(a, b, tol=1e-6):
    try:
        if isinstance(a, (int, float)) and isinstance(b, (int, float)):
            if isinstance(a, float) and isinstance(b, float) and math.isnan(a) and math.isnan(b):
                return True
            return abs(float(a) - float(b)) <= tol * max(1.0, abs(float(a)), abs(float(b)))
    except Exception:
        pass
    return values_equal(a, b)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single-file tables; scaled corpora are
        # Spark-written directories of part files — register either
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        sel = "*"
        if t == "events":
            # driver testdata ships ts as TIMESTAMP(NANOS); Spark-written
            # scaled corpora keep raw int64 nanos — normalize to the same
            # micros-truncated timestamp Tables.events exposes
            ts_type = con.execute(
                f"SELECT column_type FROM (DESCRIBE SELECT ts FROM read_parquet('{path}'))").fetchone()[0]
            if ts_type == "BIGINT":
                sel = "* REPLACE (make_timestamp(ts // 1000) AS ts)"
        con.execute(f"CREATE VIEW {t} AS SELECT {sel} FROM read_parquet('{path}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_exact = n_approx = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}"); n_fail += 1; continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL  {name}: no spark output"); n_fail += 1; continue
        got = canon(pd.concat([pd.read_parquet(f) for f in files], ignore_index=True))
        got = canon(got)
        if list(got.columns) != list(want.columns):
            print(f"FAIL  {name}: columns {list(got.columns)} != {list(want.columns)}"); n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL  {name}: rows {len(got)} != {len(want)}"); n_fail += 1; continue
        exact = all(values_equal(a, b) for ra, rb in zip(got.itertuples(index=False), want.itertuples(index=False)) for a, b in zip(ra, rb))
        if exact:
            print(f"OK    {name}: exact ({len(got)} rows)"); n_exact += 1; continue
        approx = all(approx_equal(a, b) for ra, rb in zip(got.itertuples(index=False), want.itertuples(index=False)) for a, b in zip(ra, rb))
        if approx:
            print(f"WARN  {name}: approx-only match ({len(got)} rows) — hash gate may fail")
            n_approx += 1
        else:
            print(f"FAIL  {name}: value mismatch"); n_fail += 1
            merged = got.compare(want) if got.shape == want.shape else None
            if merged is not None and len(merged):
                print(merged.head(5).to_string())
    print(f"\n{n_exact} exact, {n_approx} approx, {n_fail} fail")
    return 1 if (n_fail or n_approx) else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
