#!/usr/bin/env python3
"""Replicate a testdata SF directory N-fold with consistent key offsets.

Usage: python3 scripts/make_scale.py /root/testdata/sf0.1 /tmp/sf1 10

Each replica offsets every key/id column by replica_index * (max+1) so
joins stay consistent (orders still match their customers, etc.).
events.ts round-trips through pyarrow to preserve TIMESTAMP(NANOS) —
DuckDB COPY would silently downcast it to microseconds, which changes
what Spark reads under nanosAsLong.
"""
import sys, os
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

src, out, F = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(out, exist_ok=True)
con = duckdb.connect()

plans = {
    'lineitem':   ['l_orderkey'],
    'orders':     ['o_orderkey', 'o_custkey'],
    'customer':   ['c_custkey'],
    'documents':  ['doc_id'],
    'embeddings': ['vec_id'],
}
copy_only = ['region', 'nation', 'supplier', 'part']

for tb, keys in plans.items():
    cols = [r[0] for r in
            con.sql(f"describe select * from '{src}/{tb}.parquet'").fetchall()]
    maxes = {k: con.sql(
        f"select max({k})+1 from '{src}/{tb}.parquet'").fetchone()[0]
        for k in keys}
    sel = ", ".join(
        (f"{c} + i.range * {maxes[c]} AS {c}" if c in maxes else c)
        for c in cols)
    con.sql(f"""COPY (SELECT {sel} FROM '{src}/{tb}.parquet', range({F}) i)
                TO '{out}/{tb}.parquet' (FORMAT PARQUET)""")

for tb in copy_only:
    con.sql(f"COPY (SELECT * FROM '{src}/{tb}.parquet') "
            f"TO '{out}/{tb}.parquet' (FORMAT PARQUET)")

# events via pyarrow: keep timestamp[ns]
t = pq.read_table(f'{src}/events.parquet')
maxe = pa.compute.max(t['event_id']).as_py() + 1
maxu = pa.compute.max(t['user_id']).as_py() + 1
parts = [pa.table({
    'event_id': pa.compute.add(t['event_id'], i * maxe),
    'ts': t['ts'],
    'user_id': pa.compute.add(t['user_id'], i * maxu),
    'event_type': t['event_type'],
    'value': t['value'],
    'props': t['props']}) for i in range(F)]
pq.write_table(pa.concat_tables(parts), f'{out}/events.parquet')
print(f"wrote {out} at {F}x")
