#!/usr/bin/env python3
"""Generate a local ~sf1 dataset (10x sf0.1) for scale-slope measurement.

Replicates each sf0.1 table 10x with copy-disjoint key spaces so
referential integrity holds (copy i shifts every key by i * key-range of
its referenced table). Graph-shaped queries then see 10 disjoint copies
of the sf0.1 graph (same diameter -> per-round-bounded loops should hold
flat round counts), and scan/join queries see 10x the rows.

Document text is alphabet-rotated per copy (rot-i over a-z) so dedup /
winnowing / suffix queries get DISTINCT content per copy -- plain copies
would multiply near-dup PAIRS quadratically (100x, not 10x) and poison
the slope; rotation preserves per-doc length/repetition structure while
keeping gram spaces disjoint. Embedding vectors get a deterministic
per-copy component nudge for the same reason (identical copies would
give every vector 10 zero-distance neighbours).

Output: /root/repo/target/sf1/*.parquet (gitignored scratch).
"""
import duckdb
import os
import sys

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/target/sf1"
COPIES = 10

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"

def gen(table, sql):
    con.execute(f"COPY ({sql}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{table}.parquet')").fetchone()[0]
    print(f"{table}: {n} rows")

# fixed dims: copied as-is (25 nations / 5 regions at every TPC-H SF)
for t in ("region", "nation"):
    gen(t, f"SELECT * FROM {src(t)}")

# key ranges of sf0.1 (max key + 1), read once
R = {t: con.execute(f"SELECT max({k}) + 1 FROM {src(t)}").fetchone()[0]
     for t, k in [("customer", "c_custkey"), ("supplier", "s_suppkey"),
                  ("part", "p_partkey"), ("orders", "o_orderkey"),
                  ("events", "event_id"), ("documents", "doc_id"),
                  ("embeddings", "vec_id")]}
UIDR = con.execute(f"SELECT max(user_id) + 1 FROM {src('events')}").fetchone()[0]

copies = "(SELECT unnest(range(0, %d)) AS i)" % COPIES

gen("customer", f"""
  SELECT c_custkey + i * {R['customer']} AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment
  FROM {src('customer')}, {copies}""")

gen("supplier", f"""
  SELECT s_suppkey + i * {R['supplier']} AS s_suppkey, s_name, s_nationkey,
         s_acctbal
  FROM {src('supplier')}, {copies}""")

gen("part", f"""
  SELECT p_partkey + i * {R['part']} AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice
  FROM {src('part')}, {copies}""")

gen("orders", f"""
  SELECT o_orderkey + i * {R['orders']} AS o_orderkey,
         o_custkey + i * {R['customer']} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {src('orders')}, {copies}""")

gen("lineitem", f"""
  SELECT l_orderkey + i * {R['orders']} AS l_orderkey,
         l_partkey + i * {R['part']} AS l_partkey,
         l_suppkey + i * {R['supplier']} AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM {src('lineitem')}, {copies}""")

gen("events", f"""
  SELECT event_id + i * {R['events']} AS event_id, ts,
         user_id + i * {UIDR} AS user_id, event_type, value, props
  FROM {src('events')}, {copies}""")

# rot-i alphabet per copy keeps copies' gram spaces disjoint
ROT = ("CASE WHEN i = 0 THEN text ELSE translate(text, "
       "'abcdefghijklmnopqrstuvwxyz', "
       "substr(repeat('abcdefghijklmnopqrstuvwxyz', 2), i + 1, 26)) END")
gen("documents", f"""
  SELECT doc_id + i * {R['documents']} AS doc_id, {ROT} AS text, lang,
         source, n_chars
  FROM {src('documents')}, {copies}""")

# deterministic per-copy nudge: component j += i * 1e-3 * ((j % 7) - 3)
gen("embeddings", f"""
  SELECT vec_id + i * {R['embeddings']} AS vec_id,
         CAST(list_transform(list_zip(embedding,
                range(1, len(embedding) + 1)),
              z -> z[1] + i * 0.001 * ((z[2] % 7) - 3)) AS FLOAT[])
           AS embedding,
         label
  FROM {src('embeddings')}, {copies}""")

print("done ->", DST)
