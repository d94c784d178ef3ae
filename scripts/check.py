#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <verify_outdir> <sf_dir>

Loads each <outdir>/<name> parquet (Spark result), runs the matching SQL
from oracle_sql.json in DuckDB against the sf_dir parquet tables, sorts
columns by name, and compares row-by-row.
"""
import json, sys, math, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{outdir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"[MISS] {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"[ERR ] {name}: {e}")
            n_fail += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        # The driver sorts rows by every column before hashing — replicate so
        # unsortable columns (arrays) and order-insensitive diffs fail here too.
        try:
            got = got.sort_values(list(got.columns)).reset_index(drop=True)
            want = want.sort_values(list(want.columns)).reset_index(drop=True)
        except Exception as e:
            print(f"[FAIL] {name}: driver-style row sort failed: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"[FAIL] {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"[FAIL] {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        bad = 0
        for i in range(len(got)):
            for c in got.columns:
                a, b = norm(got[c].iloc[i]), norm(want[c].iloc[i])
                if a != b:
                    if bad < 3:
                        print(f"[FAIL] {name} row {i} col {c}: spark={a!r} duck={b!r}")
                    bad += 1
        if bad:
            print(f"[FAIL] {name}: {bad} cell mismatches")
            n_fail += 1
        else:
            print(f"[ ok ] {name}: {len(got)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
